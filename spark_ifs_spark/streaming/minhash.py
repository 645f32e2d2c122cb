"""Streaming incremental MinHash-LSH dedup: fold arriving documents
into a maintained band-postings index and emit verified near-duplicate
pairs per micro-batch — the streaming side of
``operators/dedup.py:minhash_lsh_pairs_against`` (the batch
new×corpus operator), under the SAME pointer-commit consistency design
as ``streaming/ann.py``:

- ``current.json`` is the only commit point (atomic ``os.replace``),
  carrying the live corpus version directory, the append
  high-watermark, and the MinHash parameters (a reader/appender always
  sees a complete, mutually-consistent index; mismatched parameters
  are a hard error, not silent wrong candidates).
- the index stores DIGESTS, never bodies: per-document band keys
  (``bands/batch=<id>``: id, band, bkey), shingle digests
  (``shingles/batch=<id>``: id, h — needed to verify candidates with
  EXACT Jaccard) and shingle-set sizes (``sizes/batch=<id>``). Every
  per-batch directory is written with ``mode("overwrite")`` — a
  replayed batch rewrites the same bytes, idempotent by construction.
- appends read the corpus THROUGH the watermark (``batch <=
  last_batch_id`` partition filter), so an orphan directory from a
  crash between the data write and the pointer update is invisible
  until its own commit — the replay recomputes the same pairs against
  the same corpus prefix.
- the CORPUS IS NEVER SELF-JOINED: each batch pays new-batch
  signatures + one new×(corpus ∪ new) band-collision join; detected
  pairs accumulate under ``pairs/batch=<id>`` (same overwrite
  idempotence). Union over batches equals the batch operator's
  all-pairs result at the same parameters (pinned by
  ``tests/test_streaming_minhash.py``).
- ``compact_minhash_index`` rewrites the accumulated postings into a
  new version directory (``batch=-1``) and commits pointer + unchanged
  watermark in one replace; old version deleted only after the commit,
  orphans swept on the next compaction — the segment-compaction shape.
  At 100 TB the compacted bands would additionally be written bucketed
  on ``(band, bkey)`` (``sinks.write_bucketed``) so the per-batch
  collision join is exchange-free on the corpus side.

Replay scope: the ``batch_id <= last_batch_id`` skip is valid under
the SAME checkpoint (or an identical feed), exactly as documented in
``streaming/ann.py``. No oracle entry — streaming-only surface (the
package convention); parity, replay, crash windows and compaction are
pytest-pinned.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ifs_spark.functions.hashing import md5_int60
from spark_ifs_spark.operators.dedup import _lsh_bands, word_shingles


from spark_ifs_spark.streaming._pointer import (  # noqa: F401
    _commit_state,
    _pointer_path,
    _read_state,
)


_EMPTY = {
    "bands": "id long, band int, bkey long, batch int",
    "shingles": "id long, h long, batch int",
    "sizes": "id long, n_sh long, batch int",
}


def _read_corpus(
    spark: SparkSession, root: str, corpus: str, rel: str, watermark: int
) -> DataFrame:
    """Committed prefix of a stored relation: partition-pruned to
    ``batch <= watermark`` so orphan (uncommitted) batch directories
    are invisible."""
    path = os.path.join(root, corpus, rel)
    if not os.path.isdir(path):
        return spark.createDataFrame([], _EMPTY[rel])
    return spark.read.parquet(path).where(F.col("batch") <= watermark)


def streaming_minhash_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    checkpoint: str,
    n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    seed: int = 42,
):
    """Maintain the MinHash index over a document stream; per batch,
    write verified near-dup pairs (``pairs/batch=<id>``: id_a, id_b,
    jaccard — id_a < id_b) of the batch against everything committed
    before it plus itself. Returns the StreamingQuery."""
    spark = stream.sparkSession
    root = index_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    params = {
        "n": n,
        "num_hashes": num_hashes,
        "rows_per_band": rows_per_band,
        "threshold": threshold,
        "seed": seed,
    }

    def _append(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(index_path)
        if state is not None:
            if state["params"] != params:
                raise ValueError(
                    f"index at {index_path} was built with {state['params']}, "
                    f"appender configured with {params} — candidates would be "
                    "silently wrong; rebuild or match parameters"
                )
            if batch_id <= state["last_batch_id"]:
                # same-checkpoint replay skip — see streaming/ann.py for
                # the cross-checkpoint scope caveat
                return
        if state is None:
            if batch.isEmpty():
                return
            state = {
                "version": 0,
                "corpus": "corpus-v0",
                "last_batch_id": -1,
                "params": params,
            }
        wm = state["last_batch_id"]
        docs = batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        shingles = word_shingles(docs, "id", "text", n)
        sh_new = shingles.select("id", md5_int60(F.col("sh")).alias("h")).persist()
        bands_new = _lsh_bands(shingles, num_hashes, rows_per_band, seed).persist()
        # unpersist in finally — a failed parquet write must not leak
        # the cached blocks for the session's life (same leak class as
        # the r7 unigram _finish fix)
        try:
            sizes_new = sh_new.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

            corpus_bands = _read_corpus(spark, root, state["corpus"], "bands", wm)
            corpus_sh = _read_corpus(spark, root, state["corpus"], "shingles", wm)
            corpus_sizes = _read_corpus(spark, root, state["corpus"], "sizes", wm)

            right_bands = corpus_bands.select("id", "band", "bkey").unionByName(
                bands_new.select("id", "band", "bkey")
            )
            a, b = bands_new.alias("a"), right_bands.alias("b")
            cand = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a.id") != F.col("b.id")),
                )
                .select(
                    F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                )
                .distinct()
            )
            all_sh = corpus_sh.select("id", "h").unionByName(sh_new)
            all_sizes = corpus_sizes.select("id", "n_sh").unionByName(sizes_new)
            da = all_sh.select(F.col("id").alias("id_a"), "h")
            db = all_sh.select(F.col("id").alias("_idb"), F.col("h").alias("h2"))
            inter = (
                cand.join(da, "id_a")
                .join(db, (F.col("id_b") == F.col("_idb")) & (F.col("h") == F.col("h2")))
                .groupBy("id_a", "id_b")
                .agg(F.count(F.lit(1)).alias("i"))
            )
            na = all_sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
            nb = all_sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
            pairs = (
                inter.join(na, "id_a")
                .join(nb, "id_b")
                .withColumn(
                    "jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
                )
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard")
            )

            cdir = os.path.join(root, state["corpus"])
            # per-batch directory + overwrite = replay idempotence; pairs
            # first, pointer last — a crash leaves only invisible orphans
            pairs.write.mode("overwrite").parquet(
                os.path.join(root, "pairs", f"batch={batch_id}")
            )
            # the batch partition value comes from the DIRECTORY NAME —
            # never duplicated as a data column
            bands_new.write.mode("overwrite").parquet(
                os.path.join(cdir, "bands", f"batch={batch_id}")
            )
            sh_new.write.mode("overwrite").parquet(
                os.path.join(cdir, "shingles", f"batch={batch_id}")
            )
            sizes_new.write.mode("overwrite").parquet(
                os.path.join(cdir, "sizes", f"batch={batch_id}")
            )
        finally:
            sh_new.unpersist()
            bands_new.unpersist()
        state["last_batch_id"] = batch_id
        _commit_state(index_path, state)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_minhash_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite the committed postings compacted into a new version
    directory (``batch=-1``) and swing the pointer in one atomic
    replace; watermark unchanged. Crash-safe at every instant — the
    pointer always names a complete version; orphan versions are swept
    here."""
    root = index_path.rstrip("/")
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed index at {index_path}")
    for d in os.listdir(root):
        if d.startswith("corpus-v") and d != state["corpus"]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    wm = state["last_batch_id"]
    new_version = state["version"] + 1
    new_dir = os.path.join(root, f"corpus-v{new_version}")
    for rel in ("bands", "shingles", "sizes"):
        df = _read_corpus(spark, root, state["corpus"], rel, wm)
        df.drop("batch").write.mode("overwrite").parquet(
            os.path.join(new_dir, rel, "batch=-1")
        )
    old = state["corpus"]
    _commit_state(
        index_path,
        {
            "version": new_version,
            "corpus": f"corpus-v{new_version}",
            "last_batch_id": wm,
            "params": state["params"],
        },
    )
    shutil.rmtree(os.path.join(root, old), ignore_errors=True)


def read_pairs(spark: SparkSession, index_path: str) -> DataFrame:
    """All committed near-dup pairs (``batch <= watermark`` — orphan
    pair directories from a crashed append are invisible)."""
    state = _read_state(index_path)
    if state is None:
        raise FileNotFoundError(f"no committed index at {index_path}")
    path = os.path.join(index_path.rstrip("/"), "pairs")
    return (
        spark.read.parquet(path)
        .where(F.col("batch") <= state["last_batch_id"])
        .select("id_a", "id_b", "jaccard")
    )
