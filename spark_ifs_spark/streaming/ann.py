"""Incremental / streaming ANN index maintenance: fold arriving
embedding vectors into the IVF-partitioned corpus layout
(``sources/sinks.py:write_ivf_corpus``) without rebuilding it.

Posture — the same ``foreachBatch`` state-is-the-store design as
``streaming/events.py:streaming_hll``:

- every micro-batch is cell-assigned MAP-SIDE against the current
  centroids (:func:`~spark_ifs_spark.operators.similarity.ivf_cell_expr`
  — ``num_centroids`` dot products per row, no join, no shuffle) and
  APPENDED to the cell-partitioned parquet corpus; probes keep pruning
  to the probed cells (``PartitionFilters``), including the rows that
  arrived a second ago;
- every ``refresh_every`` batches the centroids are retrained from the
  full accumulated corpus and the corpus is re-tagged + compacted in a
  two-phase (tmp → rename) swap, so drift between the centroid field
  and the data distribution is bounded and a crash mid-refresh never
  leaves a torn index;
- replayed batches (at-least-once delivery) are ABSORBED via a
  committed batch-id high-watermark — an append sink is not naturally
  idempotent the way the HLL register max is, so idempotence is made
  explicit.

At 100 TB: appends touch only the partitions the batch's vectors land
in; the refresh is the only corpus-wide pass and is deliberately
periodic (amortized), exactly how production IVF services (FAISS
OnDisk / Milvus segment compaction) schedule re-clustering. No oracle
entry — streaming-only surface (the package convention); batch ≡
stream parity is pinned by ``tests/test_streaming_ann.py`` instead:
after the final refresh the streamed index is row- and cell-identical
to a one-shot ``write_ivf_corpus`` of the same vectors.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ifs_spark.operators.similarity import (
    as_double_array,
    ivf_cell_expr,
    ivf_centroids,
)


def _paths(index_path: str) -> tuple[str, str, str]:
    root = index_path.rstrip("/")
    return f"{root}/corpus", f"{root}/centroids.json", f"{root}/watermark.json"


def read_centroids(index_path: str) -> list[tuple[int, list[float]]] | None:
    _, cpath, _ = _paths(index_path)
    if not os.path.exists(cpath):
        return None
    with open(cpath) as f:
        return [(int(c), [float(x) for x in v]) for c, v in json.load(f)]


def _write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic on POSIX


def streaming_ivf_index(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    checkpoint: str,
    num_centroids: int = 16,
    refresh_every: int = 4,
):
    """Maintain an IVF-partitioned ANN index over a vector stream.

    Returns the StreamingQuery. ``refresh_every=0`` disables retraining
    (append-only against the first batch's centroids).
    """
    spark = stream.sparkSession
    corpus_path, cents_path, wm_path = _paths(index_path)
    os.makedirs(index_path, exist_ok=True)

    def _watermark() -> int:
        if not os.path.exists(wm_path):
            return -1
        with open(wm_path) as f:
            return int(json.load(f)["batch_id"])

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _watermark():
            return  # replayed batch already committed — absorb
        rows = batch.select(
            F.col(id_col).alias("id"), as_double_array(vec_col).alias("vec")
        )
        cents = read_centroids(index_path)
        if cents is None:
            cents = ivf_centroids(rows, "id", "vec", num_centroids)
            _write_json(cents_path, cents)
        tagged = rows.withColumn("cell", ivf_cell_expr(cents, "vec"))
        tagged.write.mode("append").partitionBy("cell").parquet(corpus_path)
        if refresh_every and (batch_id + 1) % refresh_every == 0:
            refresh_ivf_index(spark, index_path, num_centroids)
        _write_json(wm_path, {"batch_id": batch_id})

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def refresh_ivf_index(
    spark: SparkSession, index_path: str, num_centroids: int
) -> None:
    """Retrain centroids on the accumulated corpus and re-tag + compact
    it, two-phase: the new layout is fully written to a tmp dir before
    the swap, so every instant has a complete committed index."""
    corpus_path, cents_path, _ = _paths(index_path)
    corpus = spark.read.parquet(corpus_path).select("id", "vec")
    # materialize before overwrite: the plan reads files the swap replaces
    corpus = corpus.localCheckpoint(eager=True)
    cents = ivf_centroids(corpus, "id", "vec", num_centroids)
    tagged = corpus.withColumn("cell", ivf_cell_expr(cents, "vec"))
    tmp = corpus_path + ".tmp"
    tagged.write.mode("overwrite").partitionBy("cell").parquet(tmp)
    old = corpus_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(corpus_path, old)
    os.rename(tmp, corpus_path)
    shutil.rmtree(old, ignore_errors=True)
    _write_json(cents_path, cents)


def probe_ivf_index(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    probe: int = 4,
) -> DataFrame:
    """Top-``k`` by cosine among the ``probe`` nearest cells — the read
    side of the streamed index. Cell pruning happens at the SCAN
    (partition pruning on the ``cell`` directory column: probing
    ``probe`` of ``C`` cells reads ``probe/C`` of the data)."""
    import math

    from spark_ifs_spark.operators.similarity import cosine

    cents = read_centroids(index_path)
    if cents is None:
        raise FileNotFoundError(f"no centroids at {index_path}")
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    by_sim = sorted(
        cents,
        key=lambda cv: (
            -sum(q * x for q, x in zip(query_vec, cv[1]))
            / (math.sqrt(sum(x * x for x in cv[1])) or 1.0),
            cv[0],
        ),
    )
    cells = [cid for cid, _ in by_sim[:probe]]
    corpus_path, _, _ = _paths(index_path)
    corpus = spark.read.parquet(corpus_path).where(F.col("cell").isin(cells))
    q = F.array(*[F.lit(float(x) / qn) for x in query_vec])
    scored = corpus.select(
        "id", cosine(F.col("vec"), q).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k)
