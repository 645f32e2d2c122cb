"""Operator layer: melt, greedy selection, dedup, similarity, text stats."""
