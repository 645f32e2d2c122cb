"""As-of join unit tests: hand-built frames covering match, no-match,
equal-timestamp inclusivity, and multi-key isolation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from spark_ifs_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # before any right -> null
            (2, "u1", _ts("2024-01-01T12:00:00")),  # matches r10 (equal ts, inclusive)
            (3, "u1", _ts("2024-01-01T15:00:00")),  # matches r11 (most recent)
            (4, "u2", _ts("2024-01-01T15:00:00")),  # other key -> r20 only
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T12:00:00"), 10),
            ("u1", _ts("2024-01-01T14:00:00"), 11),
            ("u1", _ts("2024-01-01T16:00:00"), 12),  # after every left -> never used
            ("u2", _ts("2024-01-01T09:00:00"), 20),
        ],
        "user_id string, ts timestamp, ref long",
    )
    out = asof_join(left, right, ["user_id"], "ts", ["ref"])
    got = {r["event_id"]: r["ref"] for r in out.collect()}
    assert got == {1: None, 2: 10, 3: 11, 4: 20}


def test_asof_join_rejects_column_collision(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "u", _ts("2024-01-01T00:00:00"))],
                               "ref long, user_id string, ts timestamp")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(df, df, ["user_id"], "ts", ["ref"])


def test_asof_join_single_shuffle(spark):
    """The plan must contain exactly one Exchange (the window partition)."""
    from spark_ifs_spark.plans import count_exchanges

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = left.select("user_id", "ts", F.col("event_id").alias("ref"))
    out = asof_join(left, right, ["user_id"], "ts", ["ref"])
    assert count_exchanges(out) == 1


def test_interval_overlap_join_exact_and_no_dup(spark):
    """Binned range join must equal the brute-force overlap predicate
    exactly — each qualifying pair ONCE (later-start-bin attribution,
    no distinct), including touch-at-boundary and spans-many-bins
    intervals."""
    import itertools

    from spark_ifs_spark.operators.asof import interval_overlap_join

    A = [(1, 0, 10), (2, 5, 6), (3, 100, 250), (4, 30, 30)]
    B = [(11, 10, 20), (12, 7, 8), (13, 0, 1000), (14, 31, 40)]
    a = spark.createDataFrame(A, ["aid", "a_start", "a_end"])
    b = spark.createDataFrame(B, ["bid", "b_start", "b_end"])
    for w in (1, 7, 64, 1000):
        got = sorted(
            (r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, "a_start", "a_end", "b_start", "b_end", bin_width=w
            ).collect()
        )
        want = sorted(
            (aid, bid)
            for (aid, s1, e1), (bid, s2, e2) in itertools.product(A, B)
            if s1 <= e2 and s2 <= e1
        )
        assert got == want, (w, got, want)


def test_interval_join_hot_user_skew(spark):
    """Adversarial key skew: ONE user holds 50% of all sessions. The
    binned grid join partitions by TIME BIN, not by user, so the hot
    user's sessions spread across bins like anyone else's: max rows in
    any single bin stays ~rows-per-bin (bounded task input), and the
    result is still exactly the brute-force pair set."""
    from spark_ifs_spark.operators.asof import interval_overlap_join

    W = 100
    rows = []
    # hot user 0: 500 sessions marching through time, each overlapping
    # its neighbor (the realistic hot-key shape: busy, not 500-way
    # simultaneous)
    for i in range(500):
        rows.append((0, i, i * 60, i * 60 + 90))
    # 500 normal users, one session each, same time span
    for u in range(1, 501):
        rows.append((u, 1000 + u, u * 60, u * 60 + 90))
    a = spark.createDataFrame(rows, "user long, sid long, s long, e long")
    b = (
        a.select(
            F.col("user").alias("user_b"),
            F.col("sid").alias("sid_b"),
            F.col("s").alias("s_b"),
            F.col("e").alias("e_b"),
        )
    )
    out = interval_overlap_join(
        a, b, "s", "e", "s_b", "e_b", bin_width=W,
        extra_condition=F.col("sid") < F.col("sid_b"),
    )
    got = {(r["sid"], r["sid_b"]) for r in out.collect()}
    # brute-force ground truth
    pr = [(x, y) for x in rows for y in rows
          if x[1] < y[1] and x[2] <= y[3] and y[2] <= x[3]]
    assert got == {(x[1], y[1]) for x, y in pr}
    # bounded task input: the hot USER does not make a hot BIN — max
    # bin occupancy is within a small factor of the mean
    binned = a.withColumn(
        "_bin",
        F.explode(F.sequence((F.col("s") / W).cast("long"), (F.col("e") / W).cast("long"))),
    )
    counts = [r["c"] for r in binned.groupBy("_bin").agg(F.count("*").alias("c")).collect()]
    assert max(counts) <= 8, counts  # ~1000 rows over ~300 bins, x2 explosion
