"""Tiny numpy reference implementation of greedy mRMR (the test oracle).

Independent of the Spark engine: exact contingency counting, natural-log
MI, score = relevance − mean(MI vs selected), argmax with
lowest-index tie-break. ≤50 lines per SURVEY §5.
"""

from __future__ import annotations

import numpy as np


def mi(a: np.ndarray, b: np.ndarray) -> float:
    n = len(a)
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    nb = bi.max() + 1
    na = ai.max() + 1
    joint = np.bincount(ai * nb + bi, minlength=na * nb).astype(float) / n
    pa = np.bincount(ai, minlength=na).astype(float) / n
    pb = np.bincount(bi, minlength=nb).astype(float) / n
    outer = np.outer(pa, pb).ravel()
    mask = joint > 0
    return float(np.sum(joint[mask] * np.log(joint[mask] / outer[mask])))


def greedy_mrmr(X: np.ndarray, y: np.ndarray, k: int) -> list[tuple[int, float]]:
    """X: (n_instances, n_features); returns [(feature_idx, score)]."""
    m = X.shape[1]
    k = min(k, m)
    rel = np.array([mi(X[:, j], y) for j in range(m)])
    selected: list[tuple[int, float]] = []
    sel: list[int] = []
    for _ in range(k):
        best = None
        for j in range(m):
            if j in sel:
                continue
            red = np.mean([mi(X[:, j], X[:, s]) for s in sel]) if sel else 0.0
            s = rel[j] - red
            if best is None or s > best[1]:
                best = (j, float(s))
        selected.append(best)
        sel.append(best[0])
    return selected
