"""Streaming sketch maintenance — the maintained-index family over
unbounded streams, all under the SAME pointer-commit consistency
design as ``streaming/profile.py`` / ``streaming/ann.py``:

- :func:`streaming_cms` — Count-Min grid (frequency, OVERcounts);
  state ``depth × width`` cells, merge = cell addition, parity =
  exact equality.
- :func:`streaming_rank_sketch` — bottom-k-by-hash rank sketch
  (quantiles); state k rows, merge = KMV bottom-k, parity = exact
  equality.
- :func:`streaming_hll` — portable HLL register files (distinct
  counts); state keys × 2^p cells, merge = bucket-max (idempotent:
  even double-counted rows are harmless), parity = exact equality.
- :func:`streaming_mg` — Misra-Gries counters (frequency,
  UNDERcounts); state ≤ k·P counters, merge = counter addition,
  parity = the undercount LAW (MG is not a pure function of the
  multiset; stated honestly, pinned by pytest).

The original module narrative, kept because the design generalizes to
every member above: fold an arriving token/key stream into a persisted
CMS grid — frequency estimation over an unbounded key space whose
maintained state is ``depth × width`` cells.

Why this is the cleanest possible maintained index: a Count-Min grid
is mergeable by plain CELL ADDITION (``operators/sketches.py`` — the
partial aggregate already IS the merge), so the APPEND step never
reads accumulated state at all: each micro-batch writes only its own
``depth × width``-bounded grid partial into ``cells/batch=<id>``, and
the READ step sums the committed partials. The estimate for any probe
term over a 100 TB stream is maintained by touching only the arriving
tokens, with reads over (batches × depth × width) rows — which
``compact_cms`` periodically folds back to one grid.

Consistency contract (identical to the sibling modules):

- ``current.json`` is the only commit point (atomic ``os.replace``),
  carrying the live version directory, the append high-watermark, and
  the hash parameters (mismatched depth/width/seed is a hard error —
  grids under different hash families must never add).
- per-batch directories are written ``mode("overwrite")`` — a replayed
  batch rewrites the same bytes, idempotent by construction; the
  ``batch_id <= last_batch_id`` skip is valid under the same
  checkpoint (cross-checkpoint scope caveat as in ``streaming/ann.py``).
- readers partition-prune to ``batch <= watermark``, so a crash
  between data write and pointer update leaves an invisible orphan.
- ``compact_cms`` folds the partials into a ``batch=-1`` base inside a
  new version directory (cell addition IS the compaction) and swings
  the pointer atomically; the old version is removed after the commit.

Estimates from the maintained grid are identical to a one-shot
``cms_build`` over the concatenated stream — exact mergeability, so
batch ≡ stream parity is EQUALITY, pinned with replay / crash-window /
compaction tests in ``tests/test_streaming_sketch.py``. No oracle
entry — streaming-only surface (the package convention).

No counterpart in the reference; extension operator.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ifs_spark.streaming._pointer import (  # noqa: F401
    _commit_state,
    _pointer_path,
    _read_state,
)

_CELLS_SCHEMA = "r int, bucket long, c long, batch int"


def streaming_cms(
    stream: DataFrame,
    col: str,
    index_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 101,
):
    """Maintain a Count-Min grid over a string-key stream. Append-only:
    each batch writes its own ``depth × width``-bounded grid partial;
    nothing reads the accumulated state. Returns the StreamingQuery."""
    from spark_ifs_spark.operators.sketches import cms_build

    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {"depth": depth, "width": width, "seed": seed}

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"cms at {index_path} was built with {state['params']}, "
                    f"appender configured with {params} — grids under "
                    "different hash families must not add; rebuild or match"
                )
            if batch_id <= state["last_batch_id"]:
                return  # same-checkpoint replay — already absorbed
        # An empty batch adds nothing to any cell: never write an empty
        # partial or churn the pointer for it (the watermark advances
        # lazily with the next non-empty batch) — otherwise idle streams
        # grow read-side batch fan-in until compaction for no content.
        if batch.isEmpty():
            return
        if state is None:
            state = {
                "version": 0,
                "dir": "cms-v0",
                "last_batch_id": -1,
                "params": params,
            }
        cells = cms_build(batch, col, depth=depth, width=width, seed=seed)
        cells.write.mode("overwrite").parquet(
            os.path.join(root, state["dir"], "cells", f"batch={batch_id}")
        )
        state["last_batch_id"] = batch_id
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_cms(spark: SparkSession, index_path: str) -> DataFrame:
    """``(r, bucket, c)`` — the live grid, summed from one consistent
    (version, watermark) snapshot of the committed batch partials.
    Bounded by ``depth × width`` cells regardless of stream size."""
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed cms at {index_path}")
    path = os.path.join(index_path.rstrip("/"), state["dir"], "cells")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _CELLS_SCHEMA).select(
            "r", "bucket", "c"
        )
    return (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_index_estimate(
    spark: SparkSession, index_path: str, terms: list[str]
) -> DataFrame:
    """``(term, est)`` — point estimates for a probe list against the
    maintained grid, with the grid's own committed hash parameters (so
    a caller cannot probe with mismatched arithmetic)."""
    from spark_ifs_spark.operators.sketches import cms_estimate

    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed cms at {index_path}")
    p = state["params"]
    return cms_estimate(
        read_cms(spark, index_path), terms,
        depth=p["depth"], width=p["width"], seed=p["seed"],
    )


def compact_cms(spark: SparkSession, index_path: str) -> None:
    """Fold the committed batch partials into a single ``batch=-1``
    base inside a NEW version directory and commit it atomically —
    cell addition IS the compaction, so the folded grid is exactly the
    pre-compaction read. Crash-safe like the sibling modules: the
    pointer names only complete versions; orphans are swept here."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed cms at {index_path}")
    for d in os.listdir(root):
        if d.startswith("cms-v") and d != state["dir"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    live = read_cms(spark, index_path).localCheckpoint(eager=True)
    new_version = state["version"] + 1
    new_dir = f"cms-v{new_version}"
    live.write.mode("overwrite").parquet(
        os.path.join(root, new_dir, "cells", "batch=-1")
    )
    old = state["dir"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "dir": new_dir,
            "last_batch_id": state["last_batch_id"],
            "params": state["params"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)


_RANK_SCHEMA = "h long, v long, batch int"


def streaming_rank_sketch(
    stream: DataFrame,
    key_col: str,
    val_col: str,
    index_path: str,
    checkpoint: str,
    k: int = 512,
):
    """Maintain a bottom-k-by-hash rank sketch
    (:func:`~spark_ifs_spark.operators.sketches.rank_sketch`) over a
    keyed value stream — quantile estimation whose maintained state is
    ``k`` rows regardless of stream size, under the same pointer-commit
    contract as :func:`streaming_cms`. Append-only like the CMS: each
    micro-batch writes its OWN k-bounded bottom-k partial (the batch's
    sketch), never reading accumulated state; the KMV merge law — the k
    smallest hashes of a union are contained in the union of each
    part's k smallest — makes the read-side fold EXACTLY the one-shot
    sketch of the concatenated stream, so batch ≡ stream parity is
    equality (pinned in ``tests/test_streaming_sketch.py``). Returns
    the StreamingQuery."""
    from spark_ifs_spark.operators.sketches import rank_sketch

    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {"k": k}

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"rank sketch at {index_path} was built with "
                    f"{state['params']}, appender configured with {params} — "
                    "sketches under different k must not fold; rebuild or match"
                )
            if batch_id <= state["last_batch_id"]:
                return  # same-checkpoint replay — already absorbed
        if batch.isEmpty():
            return  # nothing to sketch: no empty partial, no pointer churn
        if state is None:
            state = {
                "version": 0,
                "dir": "rks-v0",
                "last_batch_id": -1,
                "params": params,
            }
        part = rank_sketch(batch, key_col, val_col, k=k)
        part.write.mode("overwrite").parquet(
            os.path.join(root, state["dir"], "rows", f"batch={batch_id}")
        )
        state["last_batch_id"] = batch_id
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rank_sketch(spark: SparkSession, index_path: str) -> DataFrame:
    """``(h, v)`` — the live rank sketch: bottom-k over one consistent
    (version, watermark) snapshot of the committed k-bounded partials.
    The fold window runs over ≤ batches·k rows (``compact_rank_sketch``
    folds that back to k), never the stream."""
    from spark_ifs_spark.operators.topk import topk_per_key

    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed rank sketch at {index_path}")
    path = os.path.join(index_path.rstrip("/"), state["dir"], "rows")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _RANK_SCHEMA).select("h", "v")
    rows = (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .select(F.lit(0).alias("_g"), "h", "v")
    )
    return topk_per_key(
        rows, ["_g"], "h", k=state["params"]["k"], descending=False
    ).select("h", "v")


def compact_rank_sketch(spark: SparkSession, index_path: str) -> None:
    """Fold the committed partials into a single ``batch=-1`` base in a
    NEW version directory and swing the pointer atomically — the KMV
    merge is exact, so the folded sketch equals the pre-compaction
    read. Crash-safe like the sibling modules."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed rank sketch at {index_path}")
    for d in os.listdir(root):
        if d.startswith("rks-v") and d != state["dir"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    live = read_rank_sketch(spark, index_path).localCheckpoint(eager=True)
    new_version = state["version"] + 1
    new_dir = f"rks-v{new_version}"
    live.write.mode("overwrite").parquet(
        os.path.join(root, new_dir, "rows", "batch=-1")
    )
    old = state["dir"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "dir": new_dir,
            "last_batch_id": state["last_batch_id"],
            "params": state["params"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)


def streaming_hll(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    index_path: str,
    checkpoint: str,
    p: int = 9,
):
    """Maintain per-key portable-HLL register files over a keyed value
    stream — incremental distinct counting whose maintained state is
    ``keys × 2^p`` register cells: each micro-batch writes its OWN
    register-file partial (:func:`~spark_ifs_spark.operators.sketches.
    hll_registers`), never reading accumulated state; registers merge
    by bucket-MAX (associative, commutative, idempotent), so the
    read-side fold is EXACTLY the one-shot register file of the
    concatenated stream — batch ≡ stream parity is equality, like the
    CMS grid and the rank sketch (idempotence even makes double-counted
    rows harmless, the property neither of those has). Same
    pointer-commit contract as the sibling indexes. Returns the
    StreamingQuery."""
    from spark_ifs_spark.operators.sketches import hll_registers

    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {"p": p, "keys": list(key_cols), "value": value_col}

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"hll at {index_path} was built with {state['params']}, "
                    f"appender configured with {params} — register files "
                    "under different p/keys must not merge; rebuild or match"
                )
            if batch_id <= state["last_batch_id"]:
                return  # same-checkpoint replay — already absorbed
        if batch.isEmpty():
            return  # no empty partial, no pointer churn
        if state is None:
            state = {
                "version": 0,
                "dir": "hll-v0",
                "last_batch_id": -1,
                "params": params,
            }
        part = hll_registers(batch, list(key_cols), value_col, p=p)
        part.write.mode("overwrite").parquet(
            os.path.join(root, state["dir"], "regs", f"batch={batch_id}")
        )
        state["last_batch_id"] = batch_id
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_registers(spark: SparkSession, index_path: str) -> DataFrame:
    """``(key…, _b, _M)`` — the live register file: bucket-max over one
    consistent (version, watermark) snapshot of the committed partials.
    Bounded by keys × 2^p cells (× batch fan-in until ``compact_hll``)."""
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed hll at {index_path}")
    keys = state["params"]["keys"]
    path = os.path.join(index_path.rstrip("/"), state["dir"], "regs")
    return (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .groupBy(*keys, "_b")
        .agg(F.max("_M").alias("_M"))
    )


def hll_index_estimate(spark: SparkSession, index_path: str) -> DataFrame:
    """``(key…, est_distinct)`` served straight from the maintained
    register file, with the index's own committed p."""
    from spark_ifs_spark.operators.sketches import hll_estimate

    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed hll at {index_path}")
    return hll_estimate(
        read_hll_registers(spark, index_path),
        state["params"]["keys"],
        p=state["params"]["p"],
    )


def compact_hll(spark: SparkSession, index_path: str) -> None:
    """Fold the committed partials into a single ``batch=-1`` base in a
    NEW version directory — bucket-max IS the compaction, so the folded
    register file equals the pre-compaction read. Crash-safe like the
    sibling modules."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed hll at {index_path}")
    for d in os.listdir(root):
        if d.startswith("hll-v") and d != state["dir"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    live = read_hll_registers(spark, index_path).localCheckpoint(eager=True)
    new_version = state["version"] + 1
    new_dir = f"hll-v{new_version}"
    live.write.mode("overwrite").parquet(
        os.path.join(root, new_dir, "regs", "batch=-1")
    )
    old = state["dir"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "dir": new_dir,
            "last_batch_id": state["last_batch_id"],
            "params": state["params"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)


def streaming_mg(
    stream: DataFrame,
    col: str,
    index_path: str,
    checkpoint: str,
    k: int = 64,
):
    """Maintain a Misra-Gries frequency summary over a key stream —
    the UNDERcount member of the maintained-sketch family (CMS
    overcounts, the rank sketch samples): each micro-batch writes its
    own k·P-bounded MG summary partial
    (:func:`~spark_ifs_spark.operators.sketches.mg_summary`) plus its
    row count; the read side folds partials by counter ADDITION (the
    mergeable-summaries law). Stream length accumulates in the pointer
    (``n_rows``), so heavy-hitter shortlists come straight off the
    index with the exact slack bound.

    Parity contract, stated honestly: unlike the CMS grid and the rank
    sketch, an MG summary is NOT a pure function of the multiset —
    its sub-bound content depends on partition/batch boundaries — so
    batch ≡ stream parity here is the LAW, not row equality: the
    folded read obeys ``c(x) − n/(k+1) ≤ c_low(x) ≤ c(x)`` for the
    concatenated stream (per-batch deficits ≤ n_b/(k+1) telescope),
    pinned by the undercount-law pytest. Returns the StreamingQuery."""
    from spark_ifs_spark.operators.sketches import mg_summary

    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {"k": k}

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"mg summary at {index_path} was built with "
                    f"{state['params']}, appender configured with {params} — "
                    "summaries under different k must not add; rebuild or match"
                )
            if batch_id <= state["last_batch_id"]:
                return  # same-checkpoint replay — already absorbed
        if batch.isEmpty():
            return  # no empty partial, no pointer churn
        if state is None:
            state = {
                "version": 0,
                "dir": "mg-v0",
                "last_batch_id": -1,
                "params": params,
                "n_rows": 0,
            }
        rows = batch.select(F.col(col)).localCheckpoint(eager=True)
        n_b = rows.count()
        part = mg_summary(rows, col, k=k)
        part.write.mode("overwrite").parquet(
            os.path.join(root, state["dir"], "counters", f"batch={batch_id}")
        )
        # replay rewrites the same bytes AND must not double-count n:
        # n_rows advances only with the watermark, in the same commit
        state["last_batch_id"] = batch_id
        state["n_rows"] = state["n_rows"] + n_b
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_mg(spark: SparkSession, index_path: str) -> DataFrame:
    """``(term, c_low)`` — the live folded summary: counter addition
    over one consistent (version, watermark) snapshot of the committed
    partials. Bounded by batches·k·P rows (``compact_mg`` folds that
    back to k)."""
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed mg summary at {index_path}")
    path = os.path.join(index_path.rstrip("/"), state["dir"], "counters")
    if not os.path.isdir(path):
        return spark.createDataFrame([], "term string, c_low long").select(
            "term", "c_low"
        )
    return (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .groupBy("term")
        .agg(F.sum("c_low").alias("c_low"))
    )


def mg_index_candidates(
    spark: SparkSession, index_path: str, phi_ppm: int
) -> DataFrame:
    """``(term, c_low)`` — the heavy-hitter SHORTLIST served straight
    from the maintained summary: keys whose folded counter clears
    ``thresh − ceil(n/(k+1))``, with n and k from the pointer itself.
    No false negatives (the MG undercount law); callers exact-verify
    against their key relation, as :func:`~spark_ifs_spark.operators.
    sketches.mg_heavy_hitters` does in batch. Requires
    ``k+1 > 1e6/phi_ppm`` (else the slack swallows the threshold)."""
    if not 1 <= phi_ppm <= 1_000_000:
        raise ValueError(f"phi_ppm must be in [1, 1e6], got {phi_ppm}")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed mg summary at {index_path}")
    k = state["params"]["k"]
    if (k + 1) * phi_ppm <= 1_000_000:
        raise ValueError(
            f"k+1 = {k + 1} counters cannot guarantee φ = {phi_ppm} ppm"
        )
    n = state["n_rows"]
    thresh = -(-n * phi_ppm // 1_000_000)
    slack = -(-n // (k + 1))
    return read_mg(spark, index_path).filter(
        F.col("c_low") >= F.lit(max(thresh - slack, 1))
    )


def compact_mg(spark: SparkSession, index_path: str) -> None:
    """Fold the committed partials into a single ``batch=-1`` base of
    ≤ k counters in a NEW version directory: counter addition then the
    canonical compress (subtract the (k+1)-th largest, drop
    non-positives). NOT value-preserving — compression spends more of
    the deficit budget — but LAW-preserving: the total deficit stays
    ≤ n/(k+1) (the mergeable-summaries theorem), which is the only
    property readers rely on. Crash-safe like the sibling modules."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed mg summary at {index_path}")
    for d in os.listdir(root):
        if d.startswith("mg-v") and d != state["dir"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    k = state["params"]["k"]
    live = read_mg(spark, index_path).collect()  # ≤ batches·k·P rows
    counters = {r["term"]: r["c_low"] for r in live}
    if len(counters) > k:
        pivot = sorted(counters.values(), reverse=True)[k]
        counters = {t: c - pivot for t, c in counters.items() if c > pivot}
    folded = spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(counters.items())],
        "term string, c_low long",
    )
    new_version = state["version"] + 1
    new_dir = f"mg-v{new_version}"
    folded.write.mode("overwrite").parquet(
        os.path.join(root, new_dir, "counters", "batch=-1")
    )
    old = state["dir"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "dir": new_dir,
            "last_batch_id": state["last_batch_id"],
            "params": state["params"],
            "n_rows": state["n_rows"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)


def rank_sketch_index_quantiles(
    spark: SparkSession, index_path: str, qs_pct
) -> DataFrame:
    """``(q_pct, v_est, n_sketch)`` — quantile estimates served
    straight from the maintained sketch (k-bounded work, no stream
    access), with the index's own committed k."""
    from spark_ifs_spark.operators.sketches import rank_sketch_quantiles

    return rank_sketch_quantiles(read_rank_sketch(spark, index_path), qs_pct)


def cms_index_heavy_cells(
    spark: SparkSession, index_path: str, phi_ppm: int
) -> DataFrame:
    """``(r, bucket, c, n_total)`` — the maintained grid's hot cells at
    threshold ``phi_ppm``: the shortlist stage of
    :func:`~spark_ifs_spark.operators.sketches.cms_heavy_hitters`
    served straight from the index, no corpus access at all. The
    stream length is recovered FROM the grid — every update increments
    exactly one cell per depth row, so each row's cell sum is the
    total count (row 0 is used); the threshold is the same
    decimal-ceil arithmetic as the batch operator, overflow-safe past
    int64. Because CMS never undercounts, a candidate key is heavy
    only if ALL its cells are hot — callers verify the shortlist
    against their key relation exactly as the batch two-pass does."""
    if not 1 <= phi_ppm <= 1_000_000:
        raise ValueError(f"phi_ppm must be in [1, 1e6], got {phi_ppm}")
    grid = read_cms(spark, index_path)
    total = (
        grid.where(F.col("r") == 0)
        .agg(F.sum("c").alias("n_total"))
        .select(
            "n_total",
            F.expr(
                f"CAST((CAST(n_total AS DECIMAL(38,0)) * {phi_ppm} + 999999)"
                " DIV 1000000 AS BIGINT)"
            ).alias("thresh"),
        )
    )
    return (
        grid.crossJoin(F.broadcast(total))
        .filter(F.col("c") >= F.col("thresh"))
        .select("r", "bucket", "c", "n_total")
    )


def streaming_kmv(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    index_path: str,
    checkpoint: str,
    k: int = 128,
):
    """Maintain per-key K-Minimum-Values distinct sketches
    (:func:`~spark_ifs_spark.operators.sketches.kmv_sketch`) over a
    keyed value stream — the one sketch in the maintained family that
    had no streaming index (CMS, rank, HLL, MG do). Each micro-batch
    writes its OWN k-bounded-per-key partial (the batch's sketch),
    never reading accumulated state; the KMV merge law — the k
    smallest distinct hashes of a union are contained in the union of
    each part's k smallest — makes the read-side fold EXACTLY the
    one-shot sketch of the concatenated stream, so batch ≡ stream
    parity is row equality (like the rank sketch; the hash-distinct
    additionally makes replayed VALUES harmless — only a replayed
    BATCH pointer needs the watermark guard). Same pointer-commit
    contract as the sibling indexes. Returns the StreamingQuery."""
    from spark_ifs_spark.operators.sketches import kmv_sketch

    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {"k": k, "keys": list(key_cols), "value": value_col}

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"kmv at {index_path} was built with {state['params']}, "
                    f"appender configured with {params} — sketches under "
                    "different k/keys must not fold; rebuild or match"
                )
            if batch_id <= state["last_batch_id"]:
                return  # same-checkpoint replay — already absorbed
        if batch.isEmpty():
            return  # no empty partial, no pointer churn
        if state is None:
            state = {
                "version": 0,
                "dir": "kmv-v0",
                "last_batch_id": -1,
                "params": params,
            }
        part = kmv_sketch(batch, list(key_cols), value_col, k=k).select(
            *key_cols, "h"
        )
        part.write.mode("overwrite").parquet(
            os.path.join(root, state["dir"], "rows", f"batch={batch_id}")
        )
        state["last_batch_id"] = batch_id
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv(spark: SparkSession, index_path: str) -> DataFrame:
    """``(key…, h)`` — the live per-key sketch: hash-distinct then
    bottom-k over one consistent (version, watermark) snapshot of the
    committed partials. The fold runs over ≤ batches·keys·k rows
    (``compact_kmv`` folds that back to keys·k), never the stream."""
    from spark_ifs_spark.operators.topk import salted_topk_per_key

    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed kmv at {index_path}")
    keys = state["params"]["keys"]
    path = os.path.join(index_path.rstrip("/"), state["dir"], "rows")
    rows = (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .select(*keys, "h")
        .distinct()  # the same hash may survive in several partials
    )
    return salted_topk_per_key(
        rows, keys, "h", k=state["params"]["k"], descending=False
    ).select(*keys, "h")


def kmv_index_estimate(spark: SparkSession, index_path: str) -> DataFrame:
    """``(key…, n_sketch, kth_h, est_distinct)`` served straight from
    the maintained sketch with the index's own committed k — the KMV
    mirror of :func:`hll_index_estimate`."""
    from spark_ifs_spark.operators.sketches import kmv_estimate

    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed kmv at {index_path}")
    return kmv_estimate(
        read_kmv(spark, index_path),
        state["params"]["keys"],
        k=state["params"]["k"],
    )


def compact_kmv(spark: SparkSession, index_path: str) -> None:
    """Fold the committed partials into a single ``batch=-1`` base in a
    NEW version directory and swing the pointer atomically — the KMV
    merge is exact, so the folded sketch equals the pre-compaction
    read. Crash-safe like the sibling modules."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed kmv at {index_path}")
    for d in os.listdir(root):
        if d.startswith("kmv-v") and d != state["dir"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    live = read_kmv(spark, index_path).localCheckpoint(eager=True)
    new_version = state["version"] + 1
    new_dir = f"kmv-v{new_version}"
    live.write.mode("overwrite").parquet(
        os.path.join(root, new_dir, "rows", "batch=-1")
    )
    old = state["dir"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "dir": new_dir,
            "last_batch_id": state["last_batch_id"],
            "params": state["params"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)
