"""Bradley-Terry preference ratings — the aggregation step of
preference-data curation (RLHF / RLAIF reward-data pipelines, LMSYS
-style leaderboards): given pairwise match outcomes between items,
fit the Bradley-Terry model p(i beats j) = p_i / (p_i + p_j) by the
MM algorithm (Hunter 2004, Annals of Statistics):

    p_i  <-  W_i / sum_{j != i}  n_ij / (p_i + p_j)

iterated from the uniform start and renormalized each round.

Scale shape: deriving the match/win relation from raw data is the
corpus-scale pass (one join + one bounded aggregate — items², not
rows); the MM solve itself runs on that items-bounded relation
driver-side (the broadcast-small-side rule: RLHF item sets are models
/ sources / policies — hundreds, not billions).

Cross-engine exactness: every per-item denominator is summed in
ascending-opponent order and the normalizer in ascending-item order
(a left fold over a SORTED list — DuckDB `list_sum(list(x ORDER BY
j))`, Python `sum` over the sorted list), so both engines execute the
identical IEEE-754 operation sequence and the fixed-point iterates
are bit-equal; the published rating is an integer ppm floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MM iterations — enough for ~ppm-stable ratings on hundreds of items
BT_ITERS = 8


def bt_ratings_from_matches(
    matches: list[tuple[str, str, int]], iters: int = BT_ITERS
) -> dict[str, float]:
    """MM fit on a (winner, loser, n) match list. Deterministic: all
    reductions run in sorted-key order (see module docstring)."""
    items = sorted({i for w, l, _ in matches for i in (w, l)})
    wins = {i: 0 for i in items}
    n_ij: dict[tuple[str, str], int] = {}
    for w, l, n in matches:
        wins[w] += n
        n_ij[(w, l)] = n_ij.get((w, l), 0) + n
        n_ij[(l, w)] = n_ij.get((l, w), 0) + n
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        new = {}
        for i in items:
            denom = sum(
                n_ij[(i, j)] / (p[i] + p[j])
                for j in items
                if j != i and (i, j) in n_ij
            )
            new[i] = (wins[i] / denom) if denom > 0.0 else 0.0
        s = sum(new[i] for i in items)
        p = {i: (new[i] / s if s > 0.0 else 0.0) for i in items}
    return p


def source_bt_ratings(
    df: DataFrame,
    id_col: str,
    key_col: str,
    size_col: str,
    stride: int = 7919,
    iters: int = BT_ITERS,
) -> DataFrame:
    """``(key, n_wins, n_matches, rating_ppm)`` — Bradley-Terry ratings
    of ``key_col`` groups from deterministic document matches: doc ``i``
    plays doc ``(i + stride) mod N`` (a fixed coprime stride visits
    every doc exactly twice — once as home, once as away), the larger
    ``size_col`` wins (ties: lower id), same-key matches are discarded.
    Requires contiguous 0-based ids (the synthetic-fixture contract;
    the tables here satisfy it) — with a real preference dataset, feed
    its (winner, loser) pairs to :func:`bt_ratings_from_matches`
    directly. When ``stride`` is a multiple of ``n_total`` the stride
    bumps by one so no document pairs with itself.
    """
    n_total = df.count()
    if n_total > 0 and stride % n_total == 0:
        # (i + stride) % n == i exactly when n divides stride — every
        # doc would pair with itself. stride+1 is then never divisible
        # by n (for n >= 2: stride+1 ≡ 1 mod n) and keeps the
        # visit-everyone-twice property (mirrored in the oracle SQL).
        stride = stride + 1
    a = df.select(
        F.col(id_col).alias("ia"),
        F.col(key_col).alias("ka"),
        F.col(size_col).alias("sa"),
    )
    b = df.select(
        F.col(id_col).alias("ib"),
        F.col(key_col).alias("kb"),
        F.col(size_col).alias("sb"),
    )
    pairs = a.join(b, (F.col("ia") + stride) % n_total == F.col("ib")).where(
        F.col("ka") != F.col("kb")
    )
    a_wins = (F.col("sa") > F.col("sb")) | (
        (F.col("sa") == F.col("sb")) & (F.col("ia") < F.col("ib"))
    )
    outcomes = pairs.select(
        F.when(a_wins, F.col("ka")).otherwise(F.col("kb")).alias("w"),
        F.when(a_wins, F.col("kb")).otherwise(F.col("ka")).alias("l"),
    ).groupBy("w", "l").agg(F.count(F.lit(1)).alias("n"))

    rows = [(r["w"], r["l"], r["n"]) for r in outcomes.collect()]  # items²-bounded
    p = bt_ratings_from_matches(rows, iters)
    wins = {k: 0 for k in p}
    total = {k: 0 for k in p}
    for w, l, n in rows:
        wins[w] += n
        total[w] += n
        total[l] += n
    import math

    out = [
        (k, wins[k], total[k], math.floor(round(p[k], 9) * 1e6))
        for k in sorted(p)
    ]
    return df.sparkSession.createDataFrame(
        out, "key string, n_wins long, n_matches long, rating_ppm long"
    )


#: MM iterations for the Plackett-Luce fit — same budget as BT_ITERS
PL_ITERS = 8


def pl_ratings_from_rankings(
    rankings: list[tuple[tuple[str, ...], int]], iters: int = PL_ITERS
) -> dict[str, float]:
    """Plackett-Luce MM fit (Hunter 2004 §5 — the k-way generalization
    of Bradley-Terry) on a list of ``(ordered_items, n)`` rankings,
    best first:

        w_i  <-  W_i / D_i
        W_i  =  #(non-last appearances of i)
        D_i  =  sum over (ranking, position p) with i in the suffix
                from p of  n / (sum of w over that suffix)

    renormalized each round. Deterministic bit-exact cross-engine:
    rankings iterate in sorted order, suffix sums are ascending-
    position left folds, every accumulation is a left fold in
    (ranking, position) order — the identical IEEE sequence DuckDB's
    ``list_sum(list(x ORDER BY ...))`` executes (the BT convention).
    """
    items = sorted({k for r, _ in rankings for k in r})
    wins = {i: 0 for i in items}
    for r, n in rankings:
        for k in r[:-1]:
            wins[k] += n
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        terms: dict[str, list[float]] = {i: [] for i in items}
        for r, n in sorted(rankings):
            for pos in range(len(r) - 1):
                suf = r[pos:]
                s = 0.0
                for k in suf:
                    s = s + p[k]
                t = n / s
                for k in suf:
                    terms[k].append(t)
        new = {}
        for i in items:
            d = 0.0
            for t in terms[i]:
                d = d + t
            new[i] = (wins[i] / d) if d > 0.0 else 0.0
        z = 0.0
        for i in items:
            z = z + new[i]
        p = {i: (new[i] / z if z > 0.0 else 0.0) for i in items}
    return p


def source_pl_ratings(
    df: DataFrame,
    id_col: str,
    key_col: str,
    size_col: str,
    stride1: int = 7919,
    stride2: int = 104729,
    iters: int = PL_ITERS,
) -> DataFrame:
    """``(key, n_first, n_matches, rating_ppm)`` — Plackett-Luce
    ratings of ``key_col`` groups from deterministic THREE-WAY
    document matches: doc ``i`` plays docs ``(i + e1) mod N`` and
    ``(i + e2) mod N``, ranked by ``size_col`` DESC (ties: lower id
    ranks higher); matches whose three keys are not pairwise distinct
    are discarded. Effective strides ``e1 = 1 + (stride1 % (N-1))``
    and ``e2`` (bumped once on collision) are always in ``[1, N-1]``,
    so no participant repeats within a match; requires contiguous
    0-based ids and ``N >= 3`` (the synthetic-fixture contract — with
    real ranked preference data feed
    :func:`pl_ratings_from_rankings` directly).

    Scale shape: the corpus pass is two stride equi-joins + ONE
    keys³-bounded aggregate of ranking-type counts; the MM solve runs
    on that bounded relation driver-side, bit-exact (sorted folds),
    published as integer ppm.
    """
    import math

    n_total = df.count()
    spark = df.sparkSession
    schema = "key string, n_first long, n_matches long, rating_ppm long"
    if n_total < 3:
        return spark.createDataFrame([], schema)
    e1 = 1 + (stride1 % (n_total - 1))
    e2 = 1 + ((stride2 + e1) % (n_total - 1))
    if e2 == e1:
        e2 = 1 + (e2 % (n_total - 1))
    a = df.select(
        F.col(id_col).alias("ia"),
        F.col(key_col).alias("ka"),
        F.col(size_col).alias("za"),
    )
    b = df.select(
        F.col(id_col).alias("ib"),
        F.col(key_col).alias("kb"),
        F.col(size_col).alias("zb"),
    )
    c = df.select(
        F.col(id_col).alias("ic"),
        F.col(key_col).alias("kc"),
        F.col(size_col).alias("zc"),
    )
    tri = (
        a.join(b, (F.col("ia") + e1) % n_total == F.col("ib"))
        .join(c, (F.col("ia") + e2) % n_total == F.col("ic"))
        .where(
            (F.col("ka") != F.col("kb"))
            & (F.col("ka") != F.col("kc"))
            & (F.col("kb") != F.col("kc"))
        )
    )
    ranked = F.sort_array(
        F.array(
            F.struct((-F.col("za")).alias("ns"), F.col("ia").alias("id"), F.col("ka").alias("k")),
            F.struct((-F.col("zb")).alias("ns"), F.col("ib").alias("id"), F.col("kb").alias("k")),
            F.struct((-F.col("zc")).alias("ns"), F.col("ic").alias("id"), F.col("kc").alias("k")),
        )
    )
    counts = (
        tri.select(ranked.alias("r"))
        .select(
            F.col("r")[0]["k"].alias("a"),
            F.col("r")[1]["k"].alias("b"),
            F.col("r")[2]["k"].alias("c"),
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = [((r["a"], r["b"], r["c"]), int(r["n"])) for r in counts.collect()]
    p = pl_ratings_from_rankings(rows, iters)
    first = {k: 0 for k in p}
    total = {k: 0 for k in p}
    for (x, y, z), n in rows:
        first[x] += n
        for k in (x, y, z):
            total[k] += n
    out = [
        (k, first[k], total[k], math.floor(round(p[k], 9) * 1e6))
        for k in sorted(p)
    ]
    return spark.createDataFrame(out, schema)
