"""C4-style line-level cleaning (Raffel et al. 2020, the C4 pipeline;
same family as RefinedWeb/Dolma line rules): per-line quality rules
plus cross-document duplicated-line removal.

Line rules (a line is KEPT iff all hold):

- ends in a terminal punctuation mark (``.``),
- has at least ``min_words`` words,
- does not contain ``javascript`` (cookie/JS boilerplate),
- does not contain a curly brace (leaked code/markup),
- does not contain a policy phrase (``terms of use``).

Cross-document line dedup (the line-level analogue of ExactSubstr
removal, ``dedup.substring_removal``): every KEPT line whose md5 digest
occurs more than once in the corpus is removed everywhere except its
first occurrence (lowest ``(doc_id, line_no)``).

Scale shape — bodies never ride an exchange:

- the stats pass is one scan with a map-side line explode + flag
  projection and ONE doc-keyed hash aggregate (partials combine
  map-side);
- dedup shuffles ONLY ``(digest, doc_id, line_no)`` triples: one
  digest-keyed aggregate finds duplicated digests and their owners, a
  digest-keyed join of the same int triples yields per-line removal
  verdicts, and the per-doc removal *index lists* (ints) join back to
  the corpus — the cleaned text is then re-derived map-side from the
  document row with a codegen'd HOF filter, exactly the
  ``substring_removal`` interval-join-back shape
  (``operators/dedup.py:1137``). At 100 TB the removal relation is
  duplicated-lines-bounded while line bodies stay inside their scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: encodes (doc_id, line_no) as one orderable int64 for the owner
#: argmin — valid while documents stay under LN_MOD derived lines
#: (6M words at 6 words/line; raise LN_MOD for longer documents).
LN_MOD = 1_000_000


def c4_kept_expr(dialect: str, var: str, min_words: int = 5) -> str:
    """SQL boolean: does line ``var`` pass the C4 line rules — shared
    between the Spark operators and the DuckDB oracle twins
    (``dialect``: ``"spark"`` / ``"duck"``)."""
    n_words = (
        f"size(split({var}, ' '))"
        if dialect == "spark"
        else f"len(string_split({var}, ' '))"
    )
    return (
        f"right({var}, 1) = '.' AND {n_words} >= {min_words}"
        f" AND NOT contains({var}, 'javascript')"
        f" AND NOT contains({var}, '{{')"
        f" AND NOT contains({var}, 'terms of use')"
    )


def line_filter_stats(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    min_words: int = 5,
) -> DataFrame:
    """``(doc_id, n_lines, n_kept, n_no_terminal, n_short, n_brace,
    n_js, n_policy)`` — per-document counts of each C4 line-rule
    violation (counted independently; one line can violate several)
    plus the lines surviving all of them.

    One map-side flag projection over the lines relation, ONE doc-keyed
    aggregate. No joins, no second pass."""
    ln = F.col(line_col)
    no_term = F.expr(f"right({line_col}, 1)") != "."
    short = F.size(F.split(ln, " ")) < min_words
    brace = ln.contains("{")
    js = ln.contains("javascript")
    policy = ln.contains("terms of use")
    kept = ~no_term & ~short & ~brace & ~js & ~policy

    def _n(c: Column) -> Column:
        return F.sum(c.cast("int")).cast("long")

    return lines.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        _n(kept).alias("n_kept"),
        _n(no_term).alias("n_no_terminal"),
        _n(short).alias("n_short"),
        _n(brace).alias("n_brace"),
        _n(js).alias("n_js"),
        _n(policy).alias("n_policy"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str,
    lines_col: Column,
    min_words: int = 5,
) -> DataFrame:
    """``(doc_id, n_lines, n_kept, n_dup_removed, clean_md5)`` — C4
    line filtering plus cross-document duplicated-line removal.

    ``lines_col`` must be an ``array<string>`` column DERIVED from the
    document row (a deterministic projection of text), so the cleaned
    page can be re-computed map-side at join-back time instead of
    shuffling line bodies. ``n_kept`` counts lines passing the rules
    (before dedup), ``n_dup_removed`` how many of those the global
    dedup then cut, and ``clean_md5`` digests the final page (kept
    lines minus removals, newline-joined, in original order; empty
    page hashes the empty string).
    """
    src = docs.select(F.col(id_col).alias("doc_id"), lines_col.alias("lines"))
    kept_line = c4_kept_expr("spark", "s.line", min_words)
    kept_structs = F.expr(
        f"filter(transform(sequence(0, size(lines) - 1),"
        f" i -> struct(i AS ln, lines[i] AS line)), s -> {kept_line})"
    )

    # duplicated-digest discovery: only (h, doc_id, ln) ints/digests
    # ever shuffle
    pairs = src.select(
        "doc_id", F.posexplode("lines").alias("ln", "line")
    )
    keys = pairs.where(
        F.expr(c4_kept_expr("spark", "line", min_words))
    ).select(
        "doc_id", "ln", F.md5("line").alias("h")
    )
    pos = F.col("doc_id") * LN_MOD + F.col("ln")
    owners = keys.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min(pos).alias("own")
    )
    removals = (
        keys.join(owners.where(F.col("n_occ") > 1), "h")
        .where(pos != F.col("own"))
        .select("doc_id", "ln")
    )
    rem = removals.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("ln")).alias("rem")
    )

    # join-back: removal index lists only; AQE broadcasts the
    # duplicated-lines-bounded side, bodies stay map-side
    joined = src.join(rem, "doc_id", "left")
    rem_arr = F.coalesce(F.col("rem"), F.array().cast("array<int>"))
    cleaned = F.filter(
        kept_structs, lambda s: ~F.array_contains(rem_arr, s["ln"])
    )
    return joined.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.size(kept_structs).alias("n_kept"),
        F.size(rem_arr).alias("n_dup_removed"),
        F.md5(
            F.array_join(F.transform(cleaned, lambda s: s["line"]), "\n")
        ).alias("clean_md5"),
    )
