"""C4-style line cleaning: rule semantics, dedup ownership, and the
bodies-never-shuffle join-back shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ifs_spark.operators.c4 import line_dedup, line_filter_stats


def _lines(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ln int, line string")


def test_line_filter_rules_independent(spark):
    rows = [
        (0, 0, "one two three four five six."),     # kept
        (0, 1, "one two three four five six"),      # no terminal punct
        (0, 2, "too short."),                       # < 5 words
        (0, 3, "this page has { code } inside."),   # brace
        (0, 4, "please enable javascript to continue."),  # js
        (0, 5, "read more in our terms of use now."),     # policy
    ]
    out = line_filter_stats(_lines(spark, rows)).collect()[0]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 1
    assert out["n_no_terminal"] == 1
    assert out["n_short"] == 1
    assert out["n_brace"] == 1
    assert out["n_js"] == 1
    assert out["n_policy"] == 1


def test_line_filter_one_line_multiple_violations(spark):
    # a short brace line without terminal punctuation counts in ALL
    # three violation columns (flags are independent, not exclusive)
    rows = [(1, 0, "{ x }")]
    out = line_filter_stats(_lines(spark, rows)).collect()[0]
    assert out["n_kept"] == 0
    assert (out["n_no_terminal"], out["n_short"], out["n_brace"]) == (1, 1, 1)


def _docs(spark, pages):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)],
        "doc_id long, page array<string>",
    )


def test_line_dedup_keeps_first_occurrence(spark):
    dup = "this exact line appears in two documents."
    docs = _docs(
        spark,
        [
            [dup, "unique line number one stays put."],
            ["another unique line stays in place.", dup],
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, "doc_id", F.col("page")).collect()
    }
    assert out[0]["n_kept"] == 2 and out[0]["n_dup_removed"] == 0
    assert out[1]["n_kept"] == 2 and out[1]["n_dup_removed"] == 1
    assert out[0]["clean_md5"] != out[1]["clean_md5"]


def test_line_dedup_intra_document_duplicates(spark):
    dup = "the same line repeated inside one doc."
    docs = _docs(spark, [[dup, dup, dup]])
    out = line_dedup(docs, "doc_id", F.col("page")).collect()[0]
    assert out["n_kept"] == 3
    assert out["n_dup_removed"] == 2  # occurrences 2 and 3 removed


def test_line_dedup_filtered_lines_never_own(spark):
    # a line that fails the C4 rules does not participate in dedup at
    # all: it cannot own, and its copies elsewhere are judged on their
    # own occurrences only
    bad = "no punctuation here so this line is dropped"
    docs = _docs(
        spark,
        [[bad, "a perfectly fine kept line here."], [bad]],
    )
    rows = {r["doc_id"]: r for r in line_dedup(docs, "doc_id", F.col("page")).collect()}
    assert rows[0]["n_kept"] == 1 and rows[0]["n_dup_removed"] == 0
    assert rows[1]["n_kept"] == 0 and rows[1]["n_dup_removed"] == 0


def test_line_dedup_empty_page_hashes_empty_string(spark):
    import hashlib

    docs = _docs(spark, [["all lines fail here"]])
    out = line_dedup(docs, "doc_id", F.col("page")).collect()[0]
    assert out["n_kept"] == 0
    assert out["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_line_dedup_clean_digest_matches_manual(spark):
    import hashlib

    keep1 = "first surviving line of the page."
    keep2 = "second surviving line of the page."
    docs = _docs(spark, [[keep1, "{ dropped }", keep2]])
    out = line_dedup(docs, "doc_id", F.col("page")).collect()[0]
    want = hashlib.md5(f"{keep1}\n{keep2}".encode()).hexdigest()
    assert out["clean_md5"] == want
