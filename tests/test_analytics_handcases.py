"""Hand-pinned cases for the second/third-pass analytics queries.

The DuckDB oracle is a *differential* check — it cannot catch a shared
misconception encoded identically in both the Spark query and its SQL.
These tests pin the semantics of the trickiest shapes against values
worked out by hand on tiny fixtures (written as parquet in the registry's
``{sf_dir}/{table}.parquet`` layout so the registry callables run
unmodified).
"""

from __future__ import annotations

import datetime

import pytest


def _stage(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


TS = datetime.datetime


def test_user_streaks_handcase(spark, tmp_path):
    # user 1: Jan 1,2,3 then 5  -> longest 3; user 2: single day -> 1
    rows = [
        (1, TS(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (2, TS(2024, 1, 2, 11), 1, "view", 1.0, "{}"),
        (3, TS(2024, 1, 2, 12), 1, "click", 1.0, "{}"),  # same day, dedup
        (4, TS(2024, 1, 3, 9), 1, "view", 1.0, "{}"),
        (5, TS(2024, 1, 5, 9), 1, "view", 1.0, "{}"),
        (6, TS(2024, 1, 9, 9), 2, "view", 1.0, "{}"),
    ]
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.registry import q_user_streaks

    got = {r["user_id"]: r["longest_streak"] for r in q_user_streaks(spark, str(tmp_path)).collect()}
    assert got == {1: 3, 2: 1}


def test_weighted_median_handcase(spark, tmp_path):
    # weights: price 10 (w=1), price 20 (w=2), price 30 (w=1); total 4
    # cum at 10 -> 1 (2*1 < 4), at 20 -> 3 (2*3 >= 4) -> median 20
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS(1995, 1, 1)),
        (2, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", TS(1995, 1, 1)),
        (3, 1, 1, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", TS(1995, 1, 1)),
    ]
    sch = ("l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
           "l_returnflag string, l_linestatus string, l_shipdate timestamp")
    _stage(spark, tmp_path, "lineitem", rows, sch)
    from spark_ifs_spark.registry import q_weighted_median_price

    got = q_weighted_median_price(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0]["w_median_price"] == 20.0


def test_user_value_twa_handcase(spark, tmp_path):
    # user 1: value 10 held 1s, value 30 held 3s, final value dropped
    # (no successor duration) -> TWA = (10*1 + 30*3) / 4 = 25.0
    rows = [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, "view", 10.0, "{}"),
        (2, TS(2024, 1, 1, 0, 0, 1), 1, "view", 30.0, "{}"),
        (3, TS(2024, 1, 1, 0, 0, 4), 1, "view", 99.0, "{}"),
    ]
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.registry import q_user_value_twa

    got = q_user_value_twa(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0]["twa_value"] == pytest.approx(25.0, abs=1e-6)


def test_orders_sla_handcase(spark, tmp_path):
    # order 10: both lines in SLA; order 20: one line late -> fails
    orders = [
        (10, 1, "O", 1.0, TS(1995, 1, 1), "1-URGENT"),
        (20, 1, "O", 1.0, TS(1995, 1, 1), "1-URGENT"),
    ]
    _stage(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    lines = [
        (10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(1995, 1, 15)),
        (10, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(1995, 2, 20)),
        (20, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(1995, 1, 2)),
        (20, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(1995, 6, 1)),  # late
    ]
    sch = ("l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
           "l_returnflag string, l_linestatus string, l_shipdate timestamp")
    _stage(spark, tmp_path, "lineitem", lines, sch)
    from spark_ifs_spark.registry import q_orders_sla

    got = q_orders_sla(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_orders"] == 2 and r["sla_ppm"] == 500_000


def test_mad_outliers_handcase(spark, tmp_path):
    # nation 0 balances: 10,10,10,10,1000 -> median 10, adevs 0,0,0,0,990
    # -> MAD 0... degenerate; use 8,10,10,12,1000: median 10,
    # adevs 2,0,0,2,990 -> MAD (lower median of 0,0,2,2,990) = 2
    # outlier rule: adev > 3*1.4826*2 = 8.8956 -> only the 1000
    rows = [
        (1, "s1", 0, 8.0),
        (2, "s2", 0, 10.0),
        (3, "s3", 0, 10.0),
        (4, "s4", 0, 12.0),
        (5, "s5", 0, 1000.0),
    ]
    _stage(spark, tmp_path, "supplier", rows,
           "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    from spark_ifs_spark.registry import q_supplier_mad_outliers

    got = q_supplier_mad_outliers(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["median_bal"] == 10.0 and r["mad"] == 2.0 and r["n_outliers"] == 1


def test_histogram_percentiles_handcase(spark, tmp_path):
    # 100 values uniform 0..100 (bin width 25): p50 interpolates to 50
    rows = [
        (i, TS(2024, 1, 1), 1, "view", float(i), "{}") for i in range(1, 101)
    ]
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.registry import q_events_value_pcts_hist

    got = q_events_value_pcts_hist(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # values 1..100: bins [0,25)x24, [25,50)x25, [50,75)x25, [75,100)x25, {100}x1
    # p50: qt=50, crossing bin [25,50) (cum 49 >= ... no: cum(bin0)=24,
    # cum(bin1)=49 < 50, cum(bin2)=74 >= 50 -> bin [50,75):
    # 50 + 25*(50-49)/25 = 51.0
    assert r["p50"] == pytest.approx(51.0, abs=1e-9)
    # p99: qt=99, cum(bin3)=99 >= 99 and prev 74 < 99 -> 75+25*(99-74)/25 = 100
    assert r["p99"] == pytest.approx(100.0, abs=1e-9)


def test_gini_handcase(spark, tmp_path):
    # two sources, equal mass -> gini 0
    rows = [(1, "aa bb", "en", "s1", 100), (2, "cc dd", "en", "s2", 100)]
    _stage(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    from spark_ifs_spark.registry import q_source_size_gini

    got = q_source_size_gini(spark, str(tmp_path)).collect()[0]
    assert got["n_sources"] == 2 and got["gini"] == pytest.approx(0.0, abs=1e-9)


def test_ab_cuped_handcase(spark, tmp_path):
    """CUPED on a fixture where post spend is exactly 2× pre spend plus
    an arm offset: θ must be ≈2 (perfect covariate), the adjusted means
    recover the arm offset around the pooled mean, and per-arm variance
    reduction is ~100%. Worked by hand: users 0/2 (arm 0) pre 10, 20 →
    post 20, 40; users 1/3 (arm 1) pre 10, 20 → post 30, 50 (offset
    +10). Pooled: x̄ = 15, θ = cov/var = 2 exactly (integer cents).
    Adjusted: arm0 ŷ = {20 − 2·(10−15), 40 − 2·(20−15)} = {30, 30};
    arm1 = {40, 40} — zero within-arm variance after adjustment."""
    pre = TS(2024, 1, 10, 0)
    post = TS(2024, 1, 20, 0)
    rows = []
    eid = 0
    for uid, (xv, yv) in {0: (10.0, 20.0), 2: (20.0, 40.0),
                          1: (10.0, 30.0), 3: (20.0, 50.0)}.items():
        eid += 1
        rows.append((eid, pre, uid, "buy", xv, "{}"))
        eid += 1
        rows.append((eid, post, uid, "buy", yv, "{}"))
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.registry import q_ab_cuped

    got = {r["arm"]: r for r in q_ab_cuped(spark, str(tmp_path)).collect()}
    assert got[0]["n_users"] == 2 and got[1]["n_users"] == 2
    assert got[0]["theta"] == pytest.approx(2.0)
    assert got[0]["mean_post"] == pytest.approx(30.0)
    assert got[1]["mean_post"] == pytest.approx(40.0)
    # perfect covariate: adjusted means equal raw arm means (pre-spend
    # is balanced across arms here) and variance reduction is total
    assert got[0]["mean_post_cuped"] == pytest.approx(30.0)
    assert got[1]["mean_post_cuped"] == pytest.approx(40.0)
    assert got[0]["var_reduction"] == pytest.approx(1.0)
    assert got[1]["var_reduction"] == pytest.approx(1.0)


def test_join_skew_plan_handcase(spark, tmp_path):
    """Salt factors are exact ceilings of cnt/cap and only keys above
    the cap appear: user 1 has 7 events (cap 3 → ceil(7/3) = 3 salts),
    user 2 has 4 (→ 2), user 3 has 3 (= cap, NOT heavy)."""
    rows = []
    eid = 0
    for uid, n in [(1, 7), (2, 4), (3, 3)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, TS(2024, 1, 5, 10), uid, "view", 1.0, "{}"))
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.operators.layout import skew_salt_plan

    ev = spark.read.parquet(str(tmp_path / "events.parquet"))
    got = [
        (r["key"], r["cnt"], r["salt_factor"], r["share_ppm"])
        for r in skew_salt_plan(ev, "user_id", cap=3).collect()
    ]
    # ordered by cnt desc; shares are floor(cnt·1e6/14)
    assert got == [
        (1, 7, 3, 500_000),
        (2, 4, 2, 285_714),
    ]


def test_ab_cuped_null_ts_oracle_mirror(spark, tmp_path):
    """A NULL ts contributes to NEITHER period on either engine (Spark:
    when(pre)/when(~pre) both fall to 0 on NULL; oracle: the y-branch
    is written as NOT(pre) so NULL falls to ELSE 0 too) — the
    differential case the r10 review flagged, pinned here."""
    import duckdb

    rows = [
        (1, TS(2024, 1, 10, 0), 0, "buy", 10.0, "{}"),
        (2, TS(2024, 1, 20, 0), 0, "buy", 20.0, "{}"),
        (3, None, 0, "buy", 99.0, "{}"),  # must count in neither period
        (4, TS(2024, 1, 10, 0), 1, "buy", 10.0, "{}"),
        (5, TS(2024, 1, 20, 0), 1, "buy", 30.0, "{}"),
    ]
    _stage(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    from spark_ifs_spark.registry import ORACLES, q_ab_cuped

    got = q_ab_cuped(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.execute(ORACLES["ab_cuped"]).fetchdf()
    got = got.sort_values("arm").reset_index(drop=True)
    want = want[got.columns.tolist()].sort_values("arm").reset_index(drop=True)
    assert got.astype(str).equals(want.astype(str)), (got, want)
    # and the NULL-ts row really was excluded: arm-0 post mean is 20
    assert float(got.loc[got["arm"] == 0, "mean_post"].iloc[0]) == 20.0


def test_skew_salt_plan_rejects_nonpositive_cap(spark):
    """cap=0 would divide by zero in the ceil expression and cap<0
    would yield negative salt factors — guarded at entry, mirroring
    the n_epochs guard in chunking.py."""
    import pytest as _pytest

    from spark_ifs_spark.operators.layout import skew_salt_plan

    df = spark.createDataFrame([(1,)], "user_id long")
    for bad in (0, -3):
        with _pytest.raises(ValueError, match="cap"):
            skew_salt_plan(df, "user_id", cap=bad)
