"""Realized packing assignment invariants and parity with the
packing_waste_curve pricing at the same capacity."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from spark_ifs_spark.operators.chunking import pack_assign, packing_waste_curve

L = 64


def _sized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))


def test_pack_assign_bin_invariants_and_waste_parity(spark, sf_dir):
    sized = _sized(spark, sf_dir)
    rows = pack_assign(sized, "doc_id", "n_tok", ctx_len=L).collect()
    curve = {
        r["ctx_len"]: r
        for r in packing_waste_curve(sized, "doc_id", "n_tok").collect()
    }[L]

    bins = defaultdict(list)
    for r in rows:
        assert 1 <= r["seq_len"] <= L
        assert r["truncated"] == (r["n_tok"] > L)
        assert 0 <= r["tok_offset"] and r["tok_offset"] + r["seq_len"] <= L
        bins[r["bin_id"]].append((r["tok_offset"], r["seq_len"]))

    # bins are dense 0..B-1, never overfilled, segments never overlap
    assert sorted(bins) == list(range(len(bins)))
    for segs in bins.values():
        segs.sort()
        assert sum(s for _, s in segs) <= L
        for (o1, s1), (o2, _) in zip(segs, segs[1:]):
            assert o1 + s1 <= o2

    # parity with the pricing query: same docs, same kept-token mass,
    # and the realized bin count is bounded below by the interval
    # lower bound it reports
    assert len(rows) == curve["n_docs"]
    kept = sum(r["seq_len"] for r in rows)
    assert kept == curve["tokens_kept"]
    assert len(bins) >= -(-kept // L)  # >= interval lower bound on kept mass
    # realized utilization of kept tokens (integer ppm, same convention)
    util = kept * 1_000_000 // (len(bins) * L)
    assert util > curve["single_util_ppm"]  # beats pad-to-L by construction here


def test_pack_assign_oversized_and_gappy_ids(spark):
    # gappy ids across bucket boundaries + oversized docs + a hot class
    data = (
        [(i * 5000, 7) for i in range(40)]  # hot class, ids straddle buckets
        + [(999_983, 200), (1_000_003, 64)]  # oversized -> truncated; exact-fit
        + [(1_500_000 + i, i % 3 + 1) for i in range(9)]
    )
    df = spark.createDataFrame(data, "doc_id long, n_tok long")
    rows = pack_assign(df, "doc_id", "n_tok", ctx_len=L, bucket=4096).collect()
    got = {r["doc_id"]: r for r in rows}
    assert len(got) == len(data)
    # oversized doc: truncated into a full single-doc bin at offset 0
    big = got[999_983]
    assert big["truncated"] and big["seq_len"] == L and big["tok_offset"] == 0
    # exact-fit doc also fills one bin alone
    fit = got[1_000_003]
    assert not fit["truncated"] and fit["seq_len"] == L and fit["tok_offset"] == 0
    # hot class: 40 docs of len 7, cap = 64 DIV 7 = 9 -> 5 bins, id order
    hot = sorted((r for r in rows if r["seq_len"] == 7), key=lambda r: r["doc_id"])
    for n, r in enumerate(hot):
        assert r["bin_id"] == hot[0]["bin_id"] + n // 9
        assert r["tok_offset"] == (n % 9) * 7
    # larger classes get smaller bin ids (the "decreasing" order)
    by_cs = sorted(rows, key=lambda r: (-r["seq_len"], r["bin_id"]))
    seen = []
    for r in by_cs:
        if not seen or seen[-1][0] != r["seq_len"]:
            seen.append((r["seq_len"], r["bin_id"]))
    assert [b for _, b in seen] == sorted(b for _, b in seen)
