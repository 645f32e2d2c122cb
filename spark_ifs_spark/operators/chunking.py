"""Document chunking and context-window packing.

The two structural transforms between "a corpus of documents" and "a
stream of fixed-size training sequences":

- **chunk_documents**: overlapping token-window chunks. A pure map-side
  array expression — ``split`` once, then ``transform(sequence(...))``
  slices windows out of the token array — fused into the scan stage,
  zero shuffles (same plan discipline as
  :func:`~spark_ifs_spark.operators.dedup.word_shingles`). At 100 TB
  chunking is a projection, never a join.
- **pack_chunks**: interval assignment of chunks into ~``target_tokens``
  bins (the "sequence packing" step before batching). Packing is
  inherently sequential in its scan order, so the operator packs WITHIN
  a partition key (e.g. language or source shard): each partition's
  running token count is a window cumsum, tasks parallelize across
  keys, and no global sort exists. A global pack of 100 TB through one
  ordering would serialize the job — partition-scoped packing is the
  scale-correct contract, and is what data loaders consume anyway
  (per-shard sequence files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """``(id, [carry_cols...], chunk_idx, n_tokens, chunk)`` overlapping
    token windows.

    Window ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the final window is the
    first one whose start reaches the last token, so every token lands
    in ≥1 chunk and no empty chunks are emitted. Whitespace tokens
    (the package's tokenizer convention — see ``textstats.token_counts``).

    ``carry_cols`` ride through the explode (e.g. the language or shard
    key downstream packing partitions on) — carrying an attribute here
    is free; re-attaching it later means joining a per-row attribute
    back onto the chunk relation, which at corpus scale is a shuffle of
    everything.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    m = F.size(toks)
    # last window start: largest multiple of stride < m  →  floor((m-1)/stride)
    starts = F.sequence(F.lit(0), F.floor((m - 1) / stride).cast("int"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    ex = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in carry_cols],
        F.explode(chunks).alias("c"),
    )
    return ex.select(
        "id",
        *carry_cols,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.toks").alias("n_tokens"),
        F.array_join("c.toks", " ").alias("chunk"),
    )


def pack_chunks(
    chunks: DataFrame,
    partition_cols: Sequence[str],
    size_col: str,
    target_tokens: int,
    order_cols: Sequence[str] = ("id", "chunk_idx"),
) -> DataFrame:
    """Adds ``bin_id``: fixed-boundary interval packing within each
    partition.

    ``bin_id = floor(cum_tokens_before / target_tokens)`` under the
    deterministic ``order_cols`` order — bin ``k`` holds the chunks
    whose cumulative start offset falls in ``[k·target, (k+1)·target)``.
    This is the window-expressible variant of greedy packing (true
    reset-at-target greedy needs a sequential scan): consecutive chunks
    stay adjacent, every bin's content is < ``target + max_chunk``
    tokens, and a bin can undershoot only when a chunk straddles its
    upper boundary (that chunk opens the next bin). Splitting a chunk
    across bins is the tokenizer's job, not the planner's.
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be > 0")
    if isinstance(partition_cols, str):  # bare string iterates per-char
        partition_cols = [partition_cols]
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return chunks.withColumn(
        "bin_id", F.floor(cum_before / F.lit(target_tokens)).cast("long")
    )


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """:func:`chunk_documents` re-expressed as a Spark 4 **Python UDTF**
    with a LATERAL join — the table-function surface (one input row →
    many output rows with per-row Python control flow) that the array-
    expression form can't offer to SQL users. Identical semantics and
    oracle; the DataFrame form remains the hot path (JVM expressions
    beat a Python generator), this is the API-parity variant — pick it
    when the chunker needs real Python (a tokenizer library, sentence
    splitting) rather than whitespace windows.

    Scale shape: the UDTF runs row-at-a-time in a Python worker but
    fully parallel per partition, no shuffle; output cardinality is the
    chunk relation either way.
    """
    from pyspark.sql.functions import udtf

    stride = chunk_tokens - overlap
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class _Chunk:
        def eval(self, text: str):
            if text is None:
                return
            words = [w for w in text.split(" ") if w != ""] or []
            if not words:
                return
            # same window rule as chunk_documents/the oracle: starts
            # 0, stride, 2*stride, ... while the start is in range
            i = idx = 0
            while i < len(words):
                piece = words[i : i + chunk_tokens]
                yield idx, len(piece), " ".join(piece)
                i += stride
                idx += 1

    spark = df.sparkSession
    name = f"sis_chunk_udtf_{chunk_tokens}_{overlap}"
    spark.udtf.register(name, _Chunk)
    df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        f"{name}_src"
    )
    return spark.sql(
        f"SELECT s.id, c.chunk_idx, c.n_tokens, c.chunk "
        f"FROM {name}_src s, LATERAL {name}(s.text) c"
    )
