"""Sketch operators: Count-Min frequency estimation over unbounded key
spaces.

Exact per-key counts (``groupBy(key).count()``) shuffle and hold one
cell per DISTINCT key — fine for vocabularies, fatal for web-scale key
spaces (URLs, n-grams, user ids at 100 TB). A Count-Min Sketch folds the
stream into a ``depth × width`` integer grid regardless of cardinality:
update = +1 at ``(r, h_r(x) mod width)`` for each of ``depth`` seeded
hash rows; point estimate = min over rows (always an OVERestimate —
collisions only add). Error: ``est ≤ true + ε·N`` with ``ε = e/width``
at confidence ``1 − e^(−depth)``.

Spark shape: the sketch build is ONE map-side-combined aggregate whose
key space is ``depth·width`` cells — corpus-size-independent shuffle,
the same posture as ``kmeans_step``. Per-partition grids fold locally
before the exchange; merging sketches across partitions/streams is cell
addition, which the partial aggregate already IS.

Hashing is the portable md5/universal-hash family
(``functions/hashing.py``), so the DuckDB oracle reproduces the grid
bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ifs_spark.functions.hashing import (
    MINHASH_P,
    md5_int60,
    minhash_params,
    universal_hash,
)


def _py_int60(s: str) -> int:
    """Driver-side twin of ``md5_int60`` (first 15 md5 hex digits)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 101,
) -> DataFrame:
    """``(r, bucket, c)`` — Count-Min Sketch of a string column.

    One map-side array expression fans each value to its ``depth``
    (row, bucket) cells; ONE hash aggregate counts them. The shuffle
    carries at most ``depth·width`` cells per partition no matter the
    corpus size.
    """
    params = minhash_params(depth, seed)
    h = md5_int60(F.col(col))
    cells = F.array(
        *[universal_hash(h, a, b) % F.lit(width) for a, b in params]
    )
    return (
        df.select(F.posexplode(cells).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    spark_cms: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
    seed: int = 101,
) -> DataFrame:
    """``(term, est)`` — point estimates for a probe list: min over the
    sketch rows of the probed cell counts.

    The probes' cells are computed driver-side with the identical hash
    arithmetic (``depth·len(terms)`` literal rows); the sketch — a
    bounded ``depth·width`` grid by construction — is BROADCAST into
    the left join, so neither side ever shuffles. A probe term whose
    cells were never touched estimates 0 via the left join.
    """
    spark = spark_cms.sparkSession
    params = minhash_params(depth, seed)
    probe_rows = []
    for t in terms:
        h = _py_int60(t)
        for r, (a, b) in enumerate(params):
            probe_rows.append((t, r, (a * (h % MINHASH_P) + b) % MINHASH_P % width))
    probes = spark.createDataFrame(probe_rows, ["term", "r", "bucket"])
    return (
        probes.join(F.broadcast(spark_cms), ["r", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
