"""Bradley-Terry preference ratings (operators/ratings.py)."""

from __future__ import annotations

from spark_ifs_spark.operators.ratings import (
    bt_ratings_from_matches,
    source_bt_ratings,
)


def test_bt_two_player_closed_form():
    """2 items: the MM fixed point is p_a/(p_a+p_b) = wins_a/total —
    ratings proportional to win counts."""
    p = bt_ratings_from_matches([("a", "b", 3), ("b", "a", 1)], iters=50)
    assert abs(p["a"] / (p["a"] + p["b"]) - 0.75) < 1e-9
    assert abs(p["a"] + p["b"] - 1.0) < 1e-12


def test_bt_transitive_ordering():
    """a>b>c in matches -> ratings strictly ordered."""
    m = [("a", "b", 8), ("b", "a", 2), ("b", "c", 8), ("c", "b", 2),
         ("a", "c", 9), ("c", "a", 1)]
    p = bt_ratings_from_matches(m)
    assert p["a"] > p["b"] > p["c"] > 0


def test_bt_zero_win_item():
    p = bt_ratings_from_matches([("a", "b", 5)])
    assert p["b"] == 0.0 and p["a"] == 1.0


def test_source_bt_ratings_schema_and_consistency(spark, sf_dir):
    from spark_ifs_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = source_bt_ratings(docs, "doc_id", "source", "n_chars").collect()
    assert len(out) == 20
    total_ppm = sum(r["rating_ppm"] for r in out)
    assert 0.999e6 <= total_ppm <= 1.0e6  # normalized, floored
    # every doc plays home+away minus same-source matches
    assert all(r["n_wins"] <= r["n_matches"] for r in out)
    # higher win RATE should broadly mean higher rating at the extremes
    by_rating = sorted(out, key=lambda r: r["rating_ppm"])
    lo, hi = by_rating[0], by_rating[-1]
    assert hi["n_wins"] / hi["n_matches"] > lo["n_wins"] / lo["n_matches"]


def test_source_bt_stride_multiple_of_count_self_pair_guard(spark):
    """stride % n_total == 0 would pair every doc with itself; the
    bumped stride keeps matches non-empty and self-pair-free."""
    rows = [(i, "s" + str(i % 3), 10 + i) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # stride == n (n divides stride) and stride == 2n (the case the
    # old n % stride guard missed) must both bump
    for stride in (7, 14):
        out = source_bt_ratings(
            df, "doc_id", "source", "n_chars", stride=stride
        ).collect()
        assert len(out) == 3
        assert sum(r["n_matches"] for r in out) > 0


def test_pl_reduces_to_bt_on_pairwise_rankings():
    """Plackett-Luce on 2-way rankings IS Bradley-Terry (Hunter 2004):
    the MM updates coincide, so ratings agree to float-fold noise."""
    from spark_ifs_spark.operators.ratings import (
        bt_ratings_from_matches,
        pl_ratings_from_rankings,
    )

    matches = [("x", "y", 7), ("y", "x", 3), ("x", "z", 5), ("z", "y", 2)]
    bt = bt_ratings_from_matches(matches)
    pl = pl_ratings_from_rankings([((w, l), n) for w, l, n in matches])
    assert set(bt) == set(pl)
    for k in bt:
        assert abs(bt[k] - pl[k]) < 1e-9


def test_pl_first_ranked_dominates():
    from spark_ifs_spark.operators.ratings import pl_ratings_from_rankings

    p = pl_ratings_from_rankings(
        [(("a", "b", "c"), 6), (("a", "c", "b"), 4), (("b", "a", "c"), 1)]
    )
    assert p["a"] > p["b"] > p["c"]
    assert abs(sum(p.values()) - 1.0) < 1e-12


def test_source_pl_ratings_fixture(spark):
    from spark_ifs_spark.operators.ratings import source_pl_ratings

    rows = [(i, "s" + str(i % 3), 10 + (i * 7) % 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # strides chosen so the effective strides are distinct and nonzero
    # mod 3 (the key cardinality) — see the PL_STRIDE2 fixture note
    out = source_pl_ratings(
        df, "doc_id", "source", "n_chars", stride1=3, stride2=6
    ).collect()
    assert len(out) == 3
    assert all(r["n_first"] <= r["n_matches"] for r in out)
    assert sum(r["n_first"] for r in out) > 0
    # ratings normalize to ~1e6 ppm
    assert abs(sum(r["rating_ppm"] for r in out) - 1_000_000) < 10


def test_source_pl_ratings_degenerate_sizes(spark):
    from spark_ifs_spark.operators.ratings import source_pl_ratings

    # n < 3 -> empty relation, no crash
    df = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 2)], "doc_id long, source string, n_chars long"
    )
    assert source_pl_ratings(df, "doc_id", "source", "n_chars").count() == 0
