"""Scalar/aggregate function layer: mutual information, hashing, text."""
