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
