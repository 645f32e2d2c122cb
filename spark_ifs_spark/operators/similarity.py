"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine is the exactness baseline; the LSH-bucketed variant is
the 100 TB path (candidates only from colliding hyperplane-sign buckets).
Dot products stay JVM-side via ``F.zip_with`` + ``F.aggregate`` — no
Python in the hot loop.
"""

from __future__ import annotations

import math
import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(col: str | Column) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Top-k rows by cosine similarity to a single query vector:
    ``(id, cos)`` ordered desc, id-asc tie-break.

    The query is embedded as a literal array (broadcast by the plan); the
    scan is one map-side projection + a TakeOrdered — no shuffle of the
    corpus. This is the flagship ANN baseline: exact, one pass.
    """
    qn = math.sqrt(sum(x * x for x in query))
    qarr = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col).alias("id"),
        (_dot(as_double_array(vec_col), qarr) / (_norm(as_double_array(vec_col)) * F.lit(qn))).alias("cos"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col("id").isin(*[int(i) for i in exclude_ids]))
    return scored.orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k)


def cosine_top_pairs(
    df: DataFrame, id_col: str, vec_col: str, k: int = 20
) -> DataFrame:
    """Top-k most-similar pairs (a<b) by cosine: ``(id_a, id_b, cos)``.

    All-pairs via self-join — exact but O(n²): the verification baseline
    for the LSH variant below, and the right tool only when n is small
    (e.g. within-bucket reranking). Normalization is computed once per
    side before the join so the join condition stays a pure dot product.
    """
    normed = df.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v0")
    ).select("id", F.col("v0"), _norm(F.col("v0")).alias("nrm"))
    normed = normed.select(
        "id", F.transform("v0", lambda x: x / F.col("nrm")).alias("v")
    )
    a, b = normed.alias("a"), normed.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _dot(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """``(id, bucket)`` — sign-of-projection LSH over random hyperplanes.

    Vectors with high cosine land in the same bucket with probability
    ``(1 − θ/π)^num_planes``. The scale path for ANN: bucket (one
    map-side pass), then exact cosine only within buckets. Hyperplanes
    are seeded literals — no fitting, reproducible across engines.
    """
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    v = as_double_array(vec_col)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, parr) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, j)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket,
    then exact cosine. Same output schema as :func:`cosine_topk`."""
    dim = len(query)
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    qbucket = 0
    for j, plane in enumerate(planes):
        if sum(p * q for p, q in zip(plane, query)) >= 0:
            qbucket |= 1 << j
    buckets = hyperplane_lsh_buckets(df, id_col, vec_col, dim, num_planes, seed)
    in_bucket = buckets.filter(F.col("bucket") == qbucket).select("id")
    candidates = df.join(
        F.broadcast(in_bucket), df[id_col] == in_bucket["id"], "leftsemi"
    )
    return cosine_topk(candidates, id_col, vec_col, query, k)
