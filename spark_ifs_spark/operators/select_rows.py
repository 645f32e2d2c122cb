"""Greedy forward mRMR selection, alternate encoding (features = rows).

Functional parity with ``IterativeFeatureSelection.selectRows``
(``/root/reference/src/main/scala/ifs/ml/feature/IterativeFeatureSelection.scala:151-185``):
each DataFrame row is one feature's full instance-vector; the instance
labels arrive as a driver-side array and are broadcast once (``IFS:158``).

Architecture differences from the reference (all scale wins, see SURVEY §4
"known perf hazards"):

- **1 job per round, not 3.** The reference runs ``takeOrdered`` + a
  winner-fetch ``count`` + ``first`` (``IFS:172-178``); we fold the winner's
  vector into the top-1 row itself. The top-1 is a ``max(struct(score,
  -id, features))`` hash aggregate — a partial+final aggregation with NO
  sort and NO range-partitioner sampling pass, so the per-round cost is
  one scan regardless of candidate count (an ``orderBy().limit(1)`` plan
  would sample + range-shuffle millions of candidate rows at scale).
- **Incremental redundancy state.** The reference re-broadcasts ALL
  selected vectors and recomputes every MI(cand, s) each round
  (``IFS:163,167``). mRMR's redundancy term is a running mean, so we keep a
  persisted ``red_sum`` column and each round add only MI(cand, newest
  winner): O(1) vector broadcasts and MI evaluations per candidate per
  round instead of O(k). (Only possible for scores whose redundancy is
  incremental — :class:`~spark_ifs_spark.operators.scores.MrmrRowScore` is;
  generic :class:`RowScore` plug-ins take the non-incremental path.)
- **Relevance computed once.** MI(cand, label) never changes across
  rounds; the reference recomputes it every round inside ``RowMRMR``
  (``RowWiseScore.scala:55``).
- **Persisted loop state.** The reference never caches the alternate-path
  input, recomputing the scan+assembly lineage for every action (§3.2).

MI per candidate runs in an Arrow-batched pandas UDF (numpy ``bincount``
contingency — one Python call per ~10k-row batch, not per row). This is
the one place the engine leaves the JVM, and it is the textbook case for
it: per-row vector math over wide arrays that Catalyst cannot vectorize.
Duplicate-id detection: pre-flight count-vs-distinct check (the reference
errors lazily at winner-fetch, ``IFS:176``).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from spark_ifs_spark.operators.scores import MrmrRowScore, RowScore, mi_vec, mi_vec_sparse


def _snapshot_state(state: DataFrame, path: str) -> DataFrame:
    """Parquet round-trip lineage truncation for the selection loop (the
    ``graph.py`` connected-components pattern): without it, round ``r``'s
    recovery lineage spans all ``r`` prior rounds' UDF stages, so on a
    real cluster one lost executor late in a k=100 run recomputes the
    whole chain. After the swap the state's lineage is one parquet scan.
    The caller unpersists the old state; the snapshot files live until
    the loop's ``finally`` removes the work dir (selections are plain
    Python by then — nothing lazy escapes)."""
    state.write.mode("overwrite").parquet(path)
    fresh = state.sparkSession.read.parquet(path).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    state.unpersist()
    return fresh


def _argbest(scored: DataFrame, higher: bool):
    """Collect the single best ``(id, score, features)`` row as one
    partial+final hash aggregate (no sort, no sampling pass).

    Struct comparison is lexicographic, so ``max(struct(score, -id, …))``
    maximizes score with ties going to the LOWEST id (deterministic —
    documented deviation from the reference's driver-hash-order ties);
    ``min(struct(score, id, …))`` is the minimizing mirror. ``features``
    rides along in the struct and is never compared because ids are
    unique.
    """
    if higher:
        packed = F.max(F.struct(F.col("score"), (-F.col("id")).alias("nid"), F.col("features")))
        w = scored.agg(packed.alias("w")).select("w.*").first()
        return -float(w["nid"]), float(w["score"]), w["features"]
    packed = F.min(F.struct(F.col("score"), F.col("id"), F.col("features")))
    w = scored.agg(packed.alias("w")).select("w.*").first()
    return float(w["id"]), float(w["score"]), w["features"]


def _mi_against_udf(other: np.ndarray):
    """pandas UDF computing MI(features, broadcast vector) per row."""

    def _mi(batch: pd.Series) -> pd.Series:
        return batch.map(lambda v: mi_vec(np.asarray(v, dtype=np.float64), other))

    return F.pandas_udf(_mi, DoubleType())


def select_rows(
    df: DataFrame,
    num: int,
    labels_row: Sequence[float],
    id_col: str = "id",
    features_col: str = "features",
    score: RowScore | None = None,
    incore_cell_budget: int = 5_000_000,
    snapshot_every: int | None = None,
    work_dir: str | None = None,
) -> list[tuple[float, float]]:
    """Greedily select ``min(num, df.count())`` feature rows.

    Returns ``[(feature_id, score)]`` in selection order. ``feature_id`` is
    surfaced as float for parity with the reference, which smuggles the id
    through ``LabeledPoint.label: Double`` (``IFS:149,160``).

    Cost-based strategy mirror of ``select_columns``: when the whole
    matrix is ``≤ incore_cell_budget`` cells (tens of MB — small-side
    regime) it is collected once and the same greedy recurrence runs on
    numpy; past the budget the per-round distributed plan below runs.

    ``snapshot_every=N`` bounds recovery cost for deep (large-k) runs:
    every N rounds the loop state takes a parquet round-trip
    (:func:`_snapshot_state`), so a lost executor replays at most N
    rounds of lineage instead of all of them. Rounds between snapshots
    stay one job each (plan-tested). Snapshots land in ``work_dir`` (a
    temp dir by default, removed when the loop returns).
    """
    if num <= 0:
        raise ValueError("num must be > 0")
    if len(labels_row) == 0:
        raise ValueError("labels_row must be non-empty")
    score = score or MrmrRowScore()
    label_arr = np.asarray(labels_row, dtype=np.float64)

    base = df.select(
        F.col(id_col).cast("double").alias("id"),
        F.col(features_col).alias("features"),
    )
    n_rows, n_distinct = base.agg(
        F.count("id").alias("n"), F.count_distinct("id").alias("d")
    ).first()
    if n_rows != n_distinct:
        raise ValueError("duplicate feature ids in alternate-encoding input")
    num = min(num, int(n_rows))

    if int(n_rows) * len(labels_row) <= incore_cell_budget:
        return _select_rows_incore(base, num, label_arr, score)

    # exact type, not isinstance: a subclass overriding score() must NOT
    # be silently replaced by the hard-coded incremental mRMR recurrence
    incremental = type(score) is MrmrRowScore
    if not incremental:
        return _select_rows_generic(base, num, label_arr, score)

    # state: (id, features, relevance, red_sum); relevance fixed, red_sum
    # grows by MI(cand, newest winner) each round.
    state = base.withColumn(
        "relevance", _mi_against_udf(label_arr)(F.col("features"))
    ).withColumn("red_sum", F.lit(0.0))
    state = state.persist(StorageLevel.MEMORY_AND_DISK)

    selected: list[tuple[float, float]] = []
    snap_base = None
    try:
        for rnd in range(num):
            k = len(selected)
            score_col = F.col("relevance") - (
                F.col("red_sum") / F.lit(k) if k > 0 else F.lit(0.0)
            )
            win_id, win_score, win_features = _argbest(
                state.withColumn("score", score_col), higher=True
            )
            selected.append((win_id, win_score))
            if rnd == num - 1:
                break
            win_vec = np.asarray(win_features, dtype=np.float64)
            new_state = (
                state.filter(F.col("id") != win_id)
                .withColumn(
                    "red_sum",
                    F.col("red_sum") + _mi_against_udf(win_vec)(F.col("features")),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_state.count()  # materialize before dropping the parent
            state.unpersist()
            state = new_state
            if snapshot_every and (rnd + 1) % snapshot_every == 0:
                if snap_base is None:
                    snap_base = work_dir or tempfile.mkdtemp(prefix="spark_ifs_sel_")
                state = _snapshot_state(state, f"{snap_base}/r{rnd + 1}")
        return selected
    finally:
        state.unpersist()
        if snap_base is not None and work_dir is None:
            shutil.rmtree(snap_base, ignore_errors=True)


def _mi_sparse_against_udf(n: int, other_idx: np.ndarray, other_val: np.ndarray):
    """pandas UDF computing MI(sparse row, broadcast sparse vector)."""

    def _mi(idx_s: pd.Series, val_s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                mi_vec_sparse(
                    n,
                    np.asarray(i, dtype=np.int64),
                    np.asarray(v, dtype=np.float64),
                    other_idx,
                    other_val,
                )
                for i, v in zip(idx_s, val_s)
            ]
        )

    return F.pandas_udf(_mi, DoubleType())


def select_rows_sparse(
    df: DataFrame,
    num: int,
    labels_row: Sequence[float],
    id_col: str = "id",
    n_col: str = "n",
    indices_col: str = "indices",
    values_col: str = "values",
    incore_cell_budget: int = 5_000_000,
    snapshot_every: int | None = None,
    work_dir: str | None = None,
) -> list[tuple[float, float]]:
    """:func:`select_rows` for SPARSE feature rows — identical selections
    (same :func:`mi_vec_sparse` ≡ :func:`mi_vec` math, same lowest-id
    tie-break, same incremental recurrence), but vectors stay in
    (sorted-indices, nonzero-values) form end-to-end: never densified in
    the DataFrame, in Arrow transfer, or in the kernel. Each redundancy
    round moves and scores O(nnz) per candidate instead of O(n) — at a
    1% density, 100× less shuffle/broadcast volume than the dense path.

    Input columns: ``id_col`` (unique), ``n_col`` (common vector length),
    ``indices_col``/``values_col`` (ascending indices, nonzero values —
    see :func:`~spark_ifs_spark.ml._schema.features_as_sparse`).
    mRMR-only (:class:`MrmrRowScore`): generic :class:`RowScore` plug-ins
    receive dense arrays by contract, so they go through
    :func:`select_rows`.

    In-core gate mirrors :func:`select_rows` but budgets on STORED cells
    (``sum(nnz)``), the actual memory footprint of the sparse matrix.
    """
    if num <= 0:
        raise ValueError("num must be > 0")
    if len(labels_row) == 0:
        raise ValueError("labels_row must be non-empty")
    label_arr = np.asarray(labels_row, dtype=np.float64)
    lab_idx = np.flatnonzero(label_arr)
    lab_val = label_arr[lab_idx]

    base = df.select(
        F.col(id_col).cast("double").alias("id"),
        F.col(n_col).cast("int").alias("n"),
        F.col(indices_col).alias("indices"),
        F.col(values_col).alias("values"),
    )
    agg = base.agg(
        F.count("id").alias("rows"),
        F.count_distinct("id").alias("d"),
        F.count_distinct("n").alias("dn"),
        F.min("n").alias("n"),
        F.sum(F.size("values")).alias("nnz"),
    ).first()
    if agg["rows"] != agg["d"]:
        raise ValueError("duplicate feature ids in alternate-encoding input")
    if agg["dn"] != 1:
        raise ValueError("feature rows disagree on vector length n")
    n = int(agg["n"])
    if n != len(labels_row):
        raise ValueError(
            f"labels_row length {len(labels_row)} != feature vector length {n}"
        )
    num = min(num, int(agg["rows"]))

    if int(agg["nnz"]) <= incore_cell_budget:
        rows = [
            (
                float(r["id"]),
                np.asarray(r["indices"], dtype=np.int64),
                np.asarray(r["values"], dtype=np.float64),
            )
            for r in base.collect()
        ]
        rows.sort(key=lambda t: t[0])
        relevance = {rid: mi_vec_sparse(n, i, v, lab_idx, lab_val) for rid, i, v in rows}
        red_sum: dict[float, float] = {rid: 0.0 for rid, _, _ in rows}
        triplets = {rid: (i, v) for rid, i, v in rows}
        selected: list[tuple[float, float]] = []
        sel_set: set[float] = set()
        for _ in range(num):
            best: tuple[float, float] | None = None
            for rid, _, _ in rows:
                if rid in sel_set:
                    continue
                k = len(selected)
                s = relevance[rid] - (red_sum[rid] / k if k else 0.0)
                if best is None or s > best[1] or (s == best[1] and rid < best[0]):
                    best = (rid, s)
            assert best is not None
            selected.append(best)
            sel_set.add(best[0])
            wi, wv = triplets[best[0]]
            for rid, i, v in rows:
                if rid not in sel_set:
                    red_sum[rid] += mi_vec_sparse(n, i, v, wi, wv)
        return selected

    state = base.withColumn(
        "relevance",
        _mi_sparse_against_udf(n, lab_idx, lab_val)(F.col("indices"), F.col("values")),
    ).withColumn("red_sum", F.lit(0.0))
    state = state.persist(StorageLevel.MEMORY_AND_DISK)

    selected = []
    snap_base = None
    try:
        for rnd in range(num):
            k = len(selected)
            score_col = F.col("relevance") - (
                F.col("red_sum") / F.lit(k) if k > 0 else F.lit(0.0)
            )
            packed = F.max(
                F.struct(
                    F.col("score"),
                    (-F.col("id")).alias("nid"),
                    F.col("indices"),
                    F.col("values"),
                )
            )
            w = (
                state.withColumn("score", score_col)
                .agg(packed.alias("w"))
                .select("w.*")
                .first()
            )
            win_id, win_score = -float(w["nid"]), float(w["score"])
            selected.append((win_id, win_score))
            if rnd == num - 1:
                break
            wi = np.asarray(w["indices"], dtype=np.int64)
            wv = np.asarray(w["values"], dtype=np.float64)
            new_state = (
                state.filter(F.col("id") != win_id)
                .withColumn(
                    "red_sum",
                    F.col("red_sum")
                    + _mi_sparse_against_udf(n, wi, wv)(F.col("indices"), F.col("values")),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_state.count()  # materialize before dropping the parent
            state.unpersist()
            state = new_state
            if snapshot_every and (rnd + 1) % snapshot_every == 0:
                if snap_base is None:
                    snap_base = work_dir or tempfile.mkdtemp(prefix="spark_ifs_sel_")
                state = _snapshot_state(state, f"{snap_base}/r{rnd + 1}")
        return selected
    finally:
        state.unpersist()
        if snap_base is not None and work_dir is None:
            shutil.rmtree(snap_base, ignore_errors=True)


def _select_rows_incore(
    base: DataFrame, num: int, label_arr: np.ndarray, score: RowScore
) -> list[tuple[float, float]]:
    """In-core strategy: collect the (budget-gated) feature rows once and
    run the greedy recurrence on numpy — relevance cached, redundancy
    incremental for :class:`MrmrRowScore`, generic ``score.score`` for
    plug-ins. Same math (:func:`mi_vec`) and same lowest-id tie-break as
    the distributed paths."""
    rows = [
        (float(r["id"]), np.asarray(r["features"], dtype=np.float64))
        for r in base.collect()
    ]
    rows.sort(key=lambda t: t[0])
    incremental = type(score) is MrmrRowScore  # exact type; see select_rows
    relevance = {rid: mi_vec(v, label_arr) for rid, v in rows} if incremental else {}
    red_sum: dict[float, float] = {rid: 0.0 for rid, _ in rows}
    vecs = dict(rows)
    selected: list[tuple[float, float]] = []
    sel_vecs: list[np.ndarray] = []
    sel_set: set[float] = set()
    for _ in range(num):
        best: tuple[float, float] | None = None
        for rid, v in rows:
            if rid in sel_set:
                continue
            if incremental:
                k = len(selected)
                s = relevance[rid] - (red_sum[rid] / k if k else 0.0)
            else:
                s = score.score(v, label_arr, sel_vecs)
            if (
                best is None
                or (s > best[1] if score.higher_is_better else s < best[1])
                or (s == best[1] and rid < best[0])
            ):
                best = (rid, s)
        assert best is not None
        selected.append(best)
        sel_set.add(best[0])
        sel_vecs.append(vecs[best[0]])
        if incremental:
            win_vec = vecs[best[0]]
            for rid, v in rows:
                if rid not in sel_set:
                    red_sum[rid] += mi_vec(v, win_vec)
    return selected


def _select_rows_generic(
    base: DataFrame, num: int, label_arr: np.ndarray, score: RowScore
) -> list[tuple[float, float]]:
    """Non-incremental path for arbitrary :class:`RowScore` plug-ins:
    mirrors the reference shape (re-score all candidates against the full
    selected set each round) but still one job per round."""
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        selected: list[tuple[float, float]] = []
        sel_vecs: list[np.ndarray] = []
        for _ in range(num):
            sel_snapshot = [v.copy() for v in sel_vecs]
            lab = label_arr

            def _score(batch: pd.Series) -> pd.Series:
                return batch.map(
                    lambda v: score.score(np.asarray(v, dtype=np.float64), lab, sel_snapshot)
                )

            score_udf = F.pandas_udf(_score, DoubleType())
            sel_ids = [s[0] for s in selected]
            scored = base.filter(
                ~F.col("id").isin(sel_ids) if sel_ids else F.lit(True)
            ).withColumn("score", score_udf(F.col("features")))
            win_id, win_score, win_features = _argbest(scored, score.higher_is_better)
            selected.append((win_id, win_score))
            sel_vecs.append(np.asarray(win_features, dtype=np.float64))
        return selected
    finally:
        base.unpersist()
