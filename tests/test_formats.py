"""ORC round-trip and raw-text corpus ingestion."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_ifs_spark.sources.formats import read_orc, read_text_corpus, write_orc


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(
        spark, path,
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    # ORC scans take predicate pushdown like parquet
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan, plan


def test_read_text_corpus_ids_stable(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.txt").write_text("first doc\nsecond doc\n")
    (d / "b.txt").write_text("third doc\nfirst doc\n")
    out = read_text_corpus(spark, str(d))
    rows = out.collect()
    assert len(rows) == 4
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r)
    # same text in DIFFERENT files -> different ids (provenance-scoped)
    ids_first = {r["doc_id"] for r in by_text["first doc"]}
    assert len(ids_first) == 2
    assert {r["src_file"] for r in by_text["first doc"]} == {"a.txt", "b.txt"}
    # ids are stable across re-reads (no monotonically_increasing_id)
    again = {r["doc_id"] for r in read_text_corpus(spark, str(d)).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_read_text_corpus_feeds_dedup(spark, tmp_path):
    from spark_ifs_spark.operators.dedup import exact_dedup

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "x.txt").write_text("dup line\ndup line\nunique line\n")
    corpus = read_text_corpus(spark, str(d))
    out = exact_dedup(corpus, "doc_id", "text").collect()
    by_dups = {r["n_dups"] for r in out}
    assert by_dups == {2, 1}
