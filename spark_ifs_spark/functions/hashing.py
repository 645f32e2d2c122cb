"""Engine-portable deterministic hashing.

Everything the dedup/fingerprint operators hash must produce IDENTICAL
values in Spark and in the DuckDB oracle, so we avoid engine-native hash
functions (Spark's ``hash`` is murmur3, DuckDB's ``hash`` is its own) and
build on md5, which both implement per RFC 1321:

    int60(x)      = first 15 hex digits of md5(x) as a 60-bit integer
    minhash_i(S)  = min_{x∈S} (a_i·(int60(x) mod P) + b_i) mod P

P = 2^31 − 1 (Mersenne prime): keeps every product below 2^62, so the
arithmetic never overflows a signed 64-bit integer in either engine.

The SQL-text builders live next to the column builders so the two sides
cannot drift.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the universal-hash family (2^31 − 1, prime)
MINHASH_P = 2_147_483_647

#: band-key mixing base
BAND_B = 1_000_003


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i ∈ [1, P), b_i ∈ [0, P)."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P)) for _ in range(num_hashes)]


# -- Spark column builders ---------------------------------------------------

def md5_int60(col: Column) -> Column:
    """String column → 60-bit integer via md5 (portable across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def universal_hash(x: Column, a: int, b: int) -> Column:
    """(a·(x mod P) + b) mod P over a non-negative long column."""
    return (F.lit(a) * (x % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def band_key(minh: Column, idx_in_band: Column) -> Column:
    """Summand mixing a min-hash into its band's key:
    ``(minh · B^idx mod P)``; band key = SUM of summands mod P."""
    power = (
        F.when(idx_in_band == 0, F.lit(1))
        .when(idx_in_band == 1, F.lit(BAND_B % MINHASH_P))
        .when(idx_in_band == 2, F.lit(pow(BAND_B, 2, MINHASH_P)))
        .otherwise(F.lit(pow(BAND_B, 3, MINHASH_P)))
    )
    return (minh * power) % F.lit(MINHASH_P)


# -- SQL-text builders (DuckDB oracle side; identical formulas) --------------

def sql_md5_int60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_universal_hash(expr: str, a: int, b: int) -> str:
    return f"(({a} * ({expr} % {MINHASH_P}) + {b}) % {MINHASH_P})"


def sql_band_power(idx: int) -> int:
    return pow(BAND_B, idx, MINHASH_P)


def md5_int60_py(s: str) -> int:
    """Driver-side Python twin of :func:`md5_int60` — same first 15 md5
    hex digits as a 60-bit int (used to pre-compute partition-pruning
    bucket literals for index lookups)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# LSH parameter planners (pure math, no Spark): pick the cheapest
# (bands, rows) / (tables, planes) meeting a recall floor at the
# operating threshold. The s-curves are the standard MMDS ch.3 forms.


def minhash_recall(jaccard: float, bands: int, rows: int) -> float:
    """P(candidate) for a pair at the given Jaccard under banded
    MinHash-LSH: ``1 − (1 − j^rows)^bands``."""
    return 1.0 - (1.0 - jaccard**rows) ** bands


def plan_minhash_lsh(
    threshold: float,
    target_recall: float = 0.95,
    max_hashes: int = 512,
    low: float | None = None,
    max_low_prob: float = 0.05,
) -> tuple[int, int]:
    """Cheapest ``(num_hashes, rows_per_band)`` for
    :func:`~spark_ifs_spark.operators.dedup.minhash_lsh_pairs` such that
    recall at ``threshold`` is ≥ ``target_recall`` AND the candidate
    probability at the dissimilar point ``low`` (default ``threshold/2``)
    is ≤ ``max_low_prob`` — the second constraint is what makes the
    planner useful at scale: signature cost is ``num_hashes`` rows per
    doc, but the dominant cost is VERIFICATION, which scales with how
    much sub-threshold mass the s-curve admits (an unconstrained
    min-hashes plan degenerates to rows=1 and admits most of the
    corpus). Among qualifying plans, minimize total hashes, then prefer
    the steeper curve. Raises if no plan satisfies both within
    ``max_hashes``."""
    import math

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    best: tuple[int, int, float] | None = None  # (hashes, rows, fp_low)
    low = threshold / 2 if low is None else low
    for rows in range(1, 65):
        # smallest band count meeting the recall floor at this steepness
        p = threshold**rows
        if 1.0 - p == 1.0:  # p underflows the float: curve unusable
            break
        need = math.log(1.0 - target_recall) / math.log(1.0 - p) if p < 1.0 else 1.0
        bands = max(1, math.ceil(need))
        hashes = bands * rows
        if hashes > max_hashes:
            continue
        fp = minhash_recall(low, bands, rows)
        if fp > max_low_prob:
            continue
        if (
            best is None
            or hashes < best[0]
            or (hashes == best[0] and fp < best[2])
        ):
            best = (hashes, rows, fp)
    if best is None:
        raise ValueError(
            f"no (bands, rows) plan reaches recall {target_recall} at "
            f"threshold {threshold} with P(cand at {low}) <= {max_low_prob} "
            f"within {max_hashes} hashes"
        )
    return best[0], best[1]


def hyperplane_recall(cosine: float, tables: int, planes: int) -> float:
    """P(candidate) for a pair at the given cosine under multi-table
    sign-LSH: per-table collision ``(1 − θ/π)^planes`` with
    ``θ = acos(cosine)``, across ``tables`` independent tables."""
    import math

    p = (1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi) ** planes
    return 1.0 - (1.0 - p) ** tables


def plan_hyperplane_lsh(
    cosine: float,
    target_recall: float = 0.95,
    max_bits: int = 512,
    low: float = 0.2,
    max_low_prob: float = 0.05,
) -> tuple[int, int]:
    """Cheapest ``(num_planes, num_tables)`` for
    :func:`~spark_ifs_spark.operators.similarity.cosine_lsh_pairs` such
    that recall at the operating ``cosine`` is ≥ ``target_recall`` AND
    the candidate probability at the dissimilar cosine ``low`` is ≤
    ``max_low_prob`` (verification cost dominates at scale; see
    :func:`plan_minhash_lsh`). Minimize total bits
    (``planes × tables`` = signature rows per vector), then prefer MORE
    planes (narrower buckets). Raises if no plan satisfies both within
    ``max_bits``."""
    import math

    if not -1.0 < cosine <= 1.0:
        raise ValueError("cosine must be in (-1, 1]")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    theta = math.acos(max(-1.0, min(1.0, cosine)))
    best: tuple[int, int, int] | None = None  # (bits, planes, tables)
    for planes in range(1, 33):
        p = (1.0 - theta / math.pi) ** planes
        if 1.0 - p == 1.0:
            break
        need = math.log(1.0 - target_recall) / math.log(1.0 - p) if p < 1.0 else 1.0
        tables = max(1, math.ceil(need))
        bits = planes * tables
        if bits > max_bits:
            continue
        if hyperplane_recall(low, tables, planes) > max_low_prob:
            continue
        if best is None or bits < best[0] or (bits == best[0] and planes > best[1]):
            best = (bits, planes, tables)
    if best is None:
        raise ValueError(
            f"no (planes, tables) plan reaches recall {target_recall} at "
            f"cosine {cosine} with P(cand at {low}) <= {max_low_prob} "
            f"within {max_bits} bits"
        )
    return best[1], best[2]
