"""URL canonicalization + host-dedup composite (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ifs_spark.operators.urls import (
    canonical_url,
    sql_canonical_url,
    url_dedup,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("https://www.Example.com/A/b?q=1#frag", "example.com/a/b"),
    ("http://example.com/a/b/", "example.com/a/b"),
    ("HTTPS://EXAMPLE.COM", "example.com"),
    ("ftp://www.example.com/x", "example.com/x"),
    ("example.com/x///", "example.com/x"),
    ("https://sub.www.example.com/x", "sub.www.example.com/x"),  # only LEADING www.
    ("https://example.com/p?utm=1&ref=2", "example.com/p"),
    ("https://example.com/p#a?b", "example.com/p"),  # fragment stripped first
    ("www.example.com", "example.com"),
    ("https://example.com/", "example.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_sql_canonical_matches_spark(spark):
    """The DuckDB twin applies the SAME patterns in the SAME order."""
    import duckdb

    con = duckdb.connect()
    for raw, want in CASES:
        got = con.execute(f"SELECT {sql_canonical_url('?')}", [raw]).fetchone()[0]
        assert got == want, (raw, got, want)


def test_url_host(spark):
    df = spark.createDataFrame(
        [("example.com/a/b",), ("example.com",), ("",)], "c string"
    )
    got = [r["h"] for r in df.select(url_host("c").alias("h")).collect()]
    assert got == ["example.com", "example.com", ""]


def test_url_dedup_composite(spark):
    rows = [
        # canonical group example.com/a: ids 1,2,3 → keep 1, n_dups 3
        (1, "https://example.com/a"),
        (2, "http://www.example.com/a/"),
        (3, "https://EXAMPLE.com/a?utm=x"),
        # second url on the same host → rank 2
        (4, "https://example.com/b"),
        # third url on the host → capped out at host_cap=2
        (5, "https://example.com/c"),
        # blocked host: never appears
        (6, "https://spam.test/x"),
        # another host, one url
        (7, "https://ok.test/y#z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df, "doc_id", "url", host_cap=2, blocked_hosts=["spam.test"])
    got = {r["doc_id"]: (r["url"], r["host"], r["n_dups"], r["rank"]) for r in out.collect()}
    assert got == {
        1: ("example.com/a", "example.com", 3, 1),
        4: ("example.com/b", "example.com", 1, 2),
        7: ("ok.test/y", "ok.test", 1, 1),
    }


def test_url_dedup_plan_has_broadcast_blocklist(spark):
    """The blocklist must join broadcast (left-anti), never shuffle the
    corpus side on host."""
    df = spark.createDataFrame([(1, "https://a.test/x")], "doc_id long, url string")
    out = url_dedup(df, "doc_id", "url", host_cap=1, blocked_hosts=["b.test"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
