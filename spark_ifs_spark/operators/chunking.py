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


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket: int = 4096,
) -> DataFrame:
    """Adds ``out_col`` = the EXCLUSIVE prefix sum of ``value_col``
    under ``order_col`` order — without the classic scale killer (an
    unpartitioned window funnels the whole corpus through ONE task).

    ``order_col`` must be UNIQUE per row — ties would make the
    within-bucket window's exclusive frame nondeterministic between
    runs. (The packing caller orders by the unique doc id.)

    Two-level decomposition: rows bucket by ``order_col DIV bucket``
    (deterministic — no dependence on physical partitioning), bucket
    sums roll up into bucket OFFSETS (a window over ``n/bucket`` rows,
    the only non-partitioned step — document the ratio: at 10^11 rows
    and bucket 4096 that is 2.4·10^7 bucket rows, itself bucketable by
    recursion if ever needed), offsets broadcast back, and the
    within-bucket cumsum runs in a ``bucket``-bounded PARTITIONED
    window. Exact, deterministic, and every corpus-sized step is
    partition-parallel.
    """
    b = df.withColumn("_bkt", F.expr(f"{order_col} DIV {bucket}"))
    per = b.groupBy("_bkt").agg(F.sum(value_col).alias("_bs"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = per.select(
        "_bkt", F.coalesce(F.sum("_bs").over(wb), F.lit(0)).alias("_off")
    )
    ww = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(off), "_bkt")
        .withColumn(
            out_col,
            F.col("_off") + F.coalesce(F.sum(value_col).over(ww), F.lit(0)),
        )
        .drop("_bkt", "_off")
    )


PACK_CTX_LENGTHS = [64, 128, 256, 512]


def packing_waste_curve(
    df: DataFrame,
    id_col: str,
    size_col: str,
    ctx_lengths: list[int] = PACK_CTX_LENGTHS,
) -> DataFrame:
    """One row per candidate context length L: the pad-vs-pack
    decision curve for training-sequence assembly.

    - single-sequence regime (one doc per sequence, truncate at L, pad
      to L): ``tokens_kept = Σ min(size, L)``, ``truncated_docs``,
      ``single_util_ppm = tokens_kept·10^6 / (n_docs·L)`` — the
      padding waste everyone underestimates;
    - packed regime (interval packing of the cumulative token stream,
      the ``pack_chunks`` discipline): every bin is exactly L except
      the last, so ``packed_bins = ⌈total/L⌉`` and ``packed_util_ppm =
      total·10^6/(packed_bins·L)``; the cost is ``straddled_docs`` —
      documents crossing a bin boundary (split across sequences),
      counted exactly from the :func:`prefix_sum`.

    All integer arithmetic. Plan: one prefix sum (two-level, see
    :func:`prefix_sum`), a ×|L| map-side expand, one |L|-bounded
    aggregate.
    """
    cum = prefix_sum(
        df.select(F.col(id_col).alias("id"), F.col(size_col).alias("nw")),
        "id",
        "nw",
    )
    ls = F.explode(
        F.array(*[F.lit(int(L)).cast("int") for L in ctx_lengths])
    ).alias("ctx_len")
    e = cum.select("id", "nw", "cum_before", ls)
    L = F.col("ctx_len").cast("long")
    straddle = (
        (F.col("nw") > 0)
        & (
            F.expr("cum_before DIV CAST(ctx_len AS BIGINT)")
            != F.expr("(cum_before + nw - 1) DIV CAST(ctx_len AS BIGINT)")
        )
    ).cast("long")
    agg = e.groupBy("ctx_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").cast("long").alias("total_tokens"),
        F.sum(F.least(F.col("nw").cast("long"), L)).alias("tokens_kept"),
        F.sum((F.col("nw") > L).cast("long")).alias("truncated_docs"),
        F.sum(straddle).alias("straddled_docs"),
    )
    return agg.select(
        "ctx_len",
        "n_docs",
        "total_tokens",
        "tokens_kept",
        "truncated_docs",
        F.expr("(tokens_kept * 1000000) DIV (n_docs * CAST(ctx_len AS BIGINT))")
        .alias("single_util_ppm"),
        F.expr(
            "(total_tokens + CAST(ctx_len AS BIGINT) - 1) DIV CAST(ctx_len AS BIGINT)"
        ).alias("packed_bins"),
        F.expr(
            "(total_tokens * 1000000) DIV "
            "(((total_tokens + CAST(ctx_len AS BIGINT) - 1) DIV CAST(ctx_len AS BIGINT)) "
            "* CAST(ctx_len AS BIGINT))"
        ).alias("packed_util_ppm"),
        "straddled_docs",
    )


PACK_ASSIGN_CTX = 256


def pack_assign(
    df: DataFrame,
    id_col: str,
    size_col: str,
    ctx_len: int = PACK_ASSIGN_CTX,
    bucket: int = 4096,
) -> DataFrame:
    """REALIZED whole-document bin packing: ``(doc_id, n_tok, seq_len,
    bin_id, tok_offset, truncated)`` — the assignment a trainer's data
    loader actually consumes (``packing_waste_curve`` only prices the
    decision; this materializes it).

    First-fit-decreasing is inherently sequential (every placement
    depends on all previous bins' residual space), so the distributed
    form is SIZE-CLASS SHELF PACKING, the closed-form member of the
    harmonic/class-segregated family: documents group by capped exact
    length ``cs = max(min(n_tok, L), 1)`` (oversized docs truncate into
    single-doc bins), a bin holds ``cap = L DIV cs`` same-class
    documents, and the n-th document of a class (id order) sits at bin
    ``n DIV cap``, token offset ``(n mod cap)·cs``. Within a class this
    is OPTIMAL (equal sizes ⇒ no packing can beat ⌈cnt/cap⌉ bins); the
    scheme's total waste vs the interval lower bound is at most one
    underfilled bin per class plus the per-bin remainder ``L mod cs`` —
    both measured, not assumed, by the ``packing_assignment`` query's
    parity checks against ``packing_waste_curve``.

    Scale shape: the per-class row number uses the same two-level
    decomposition as :func:`prefix_sum` — rows bucket by ``id DIV
    bucket``, per-(class, bucket) counts roll up through a
    class-partitioned window over bucket rows (|classes ≤ L| ×
    n/bucket rows, never the corpus), and the within-bucket
    ``row_number`` window is (class, bucket)-bounded. Global bin ids
    come from a |classes|-bounded window (classes sorted by size DESC
    — the "decreasing" in FFD) broadcast back. No corpus-sized window,
    no shuffle wider than the (cs, _bkt) hash — deterministic under
    any physical partitioning.
    """
    L = int(ctx_len)
    b = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(size_col).cast("long").alias("n_tok"),
    ).withColumn(
        "cs", F.greatest(F.least(F.col("n_tok"), F.lit(L).cast("long")), F.lit(1).cast("long"))
    ).withColumn("_bkt", F.expr("doc_id DIV " + str(int(bucket))))
    # per-(class, bucket) counts -> class-partitioned exclusive cumsum
    per = b.groupBy("cs", "_bkt").agg(F.count(F.lit(1)).alias("_bc"))
    wb = (
        Window.partitionBy("cs")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = per.select(
        "cs", "_bkt", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_off")
    )
    ww = Window.partitionBy("cs", "_bkt").orderBy(F.col("doc_id").asc())
    rn = (
        b.join(off, ["cs", "_bkt"])
        .withColumn("rn", F.col("_off") + F.row_number().over(ww) - 1)
        .drop("_bkt", "_off")
    )
    # |classes|-bounded bin numbering: bins of larger classes first
    caps = rn.groupBy("cs").agg(F.count(F.lit(1)).alias("cnt"))
    caps = caps.withColumn("cap", F.expr(f"greatest({L} DIV cs, 1)"))
    wc = (
        Window.orderBy(F.col("cs").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = caps.withColumn(
        "bin0",
        F.coalesce(F.sum(F.expr("(cnt + cap - 1) DIV cap")).over(wc), F.lit(0)),
    ).select("cs", "cap", "bin0")
    return (
        rn.join(F.broadcast(offs), "cs")
        .select(
            "doc_id",
            "n_tok",
            F.col("cs").alias("seq_len"),
            (F.col("bin0") + F.expr("rn DIV cap")).cast("long").alias("bin_id"),
            (F.pmod(F.col("rn"), F.col("cap")) * F.col("cs"))
            .cast("long")
            .alias("tok_offset"),
            (F.col("n_tok") > L).alias("truncated"),
        )
    )


EPOCH_SHUFFLE_BUCKETS = 4096  # 2^12 hash-prefix buckets (h < 2^60)


def epoch_shuffle(
    bins: DataFrame,
    id_col: str,
    n_epochs: int,
    seed: int = 42,
) -> DataFrame:
    """``(epoch, bin_id, position)`` — the deterministic per-epoch
    shuffle manifest a trainer's data loader consumes on top of
    :func:`pack_assign`: for each epoch, a seeded permutation of the
    packed bins, identical across engines, runs and partitionings
    (the ``split_assign`` reproducibility contract extended from
    membership to ORDER).

    The permutation key is the portable md5 rank
    ``h = md5_int60(seed || ':' || epoch || ':' || bin_id)`` (the
    ``functions/hashing.py`` scheme); position = rank of ``(h,
    bin_id)`` within the epoch (the bin_id tiebreak makes the order
    total even under an md5 collision). Epochs never repeat an order
    because the hash input embeds the epoch; the seed reshuffles
    everything.

    Scale shape: a global per-epoch ``row_number`` would be a
    single-task sort at 10⁹+ bins, so the rank is computed with the
    same two-level decomposition as :func:`pack_assign`'s row numbers:
    rows bucket by the hash's top 12 bits (``h DIV 2^48`` — bucket
    order IS hash order, so within-bucket ranks splice exactly),
    per-(epoch, bucket) counts roll up through an epoch-partitioned
    window over ``EPOCH_SHUFFLE_BUCKETS`` rows, and the within-bucket
    ``row_number`` window is (epoch, bucket)-bounded. No corpus-sized
    window; the epoch fan-out is a zero-shuffle ``explode`` projection.

    No counterpart in the reference; extension operator (trainer-facing
    manifest, the ``pack_assign`` follow-on)."""
    from spark_ifs_spark.functions.hashing import md5_int60

    if int(n_epochs) <= 0:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    shift = (1 << 60) // EPOCH_SHUFFLE_BUCKETS  # 2^60 hash space / buckets
    b = (
        bins.select(F.col(id_col).cast("long").alias("bin_id"))
        .distinct()
        .select(
            "bin_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))
            ).alias("epoch"),
        )
    )
    h = md5_int60(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("bin_id").cast("string"),
        )
    )
    hb = b.select("epoch", "bin_id", h.alias("h")).withColumn(
        "_bkt", F.expr(f"h DIV {shift}")
    )
    per = hb.groupBy("epoch", "_bkt").agg(F.count(F.lit(1)).alias("_bc"))
    wb = (
        Window.partitionBy("epoch")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = per.select(
        "epoch", "_bkt", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_off")
    )
    ww = Window.partitionBy("epoch", "_bkt").orderBy(
        F.col("h").asc(), F.col("bin_id").asc()
    )
    return (
        hb.join(off, ["epoch", "_bkt"])
        .select(
            "epoch",
            "bin_id",
            (F.col("_off") + F.row_number().over(ww) - 1)
            .cast("long")
            .alias("position"),
        )
    )


def curriculum_shuffle(
    items: DataFrame,
    id_col: str,
    stage_col: str,
    n_epochs: int,
    seed: int = 42,
) -> DataFrame:
    """``(epoch, item_id, stage, position)`` — the curriculum variant
    of :func:`epoch_shuffle`: a trainer-facing manifest where each
    epoch presents the STAGES in ascending order (easy → hard,
    curriculum learning per Bengio et al. 2009) but shuffles items
    uniformly WITHIN each stage, with a fresh seeded permutation per
    epoch. ``position`` is global within the epoch: every stage-s item
    precedes every stage-(s+1) item, and within a stage the order is
    the portable md5 rank ``md5_int60(seed:epoch:id)`` — identical
    across engines, runs and partitionings (the ``split_assign``
    reproducibility contract).

    Scale shape, inherited from :func:`epoch_shuffle`'s two-level rank
    decomposition with the stage dimension added: items bucket by the
    hash's top 12 bits within (epoch, stage); per-(epoch, stage,
    bucket) counts splice into within-stage ranks through an (epoch,
    stage)-partitioned window over ≤4096 count rows; stage offsets
    come from the per-(epoch, stage) count relation (|stages| rows per
    epoch) cumulated by an epoch-partitioned window. No corpus-sized
    window anywhere; the epoch fan-out is a zero-shuffle ``explode``
    projection. Stages must be small integers (difficulty buckets),
    the |classes|-bounded convention of ``pack_assign``.

    No counterpart in the reference; extension operator."""
    from spark_ifs_spark.functions.hashing import md5_int60

    if int(n_epochs) <= 0:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    shift = (1 << 60) // EPOCH_SHUFFLE_BUCKETS  # 2^60 hash space / buckets
    # dedup on item_id ALONE with a deterministic min-stage pick: a
    # (item_id, stage)-pair distinct would emit two manifest rows per
    # epoch for an item arriving under two stage values, silently
    # breaking the one-position-per-id contract inherited from
    # epoch_shuffle (a no-op when stage is functional in item_id, as in
    # the registry fixture)
    fan = items.groupBy(
        F.col(id_col).cast("long").alias("item_id")
    ).agg(
        F.min(F.col(stage_col).cast("int")).alias("stage")
    ).select(
        "item_id",
        "stage",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))
        ).alias("epoch"),
    )
    h = md5_int60(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("item_id").cast("string"),
        )
    )
    hb = fan.select("epoch", "stage", "item_id", h.alias("h")).withColumn(
        "_bkt", F.expr(f"h DIV {shift}")
    )
    per = hb.groupBy("epoch", "stage", "_bkt").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    wb = (
        Window.partitionBy("epoch", "stage")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = per.select(
        "epoch", "stage", "_bkt",
        F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff"),
    )
    stage_counts = per.groupBy("epoch", "stage").agg(
        F.sum("_bc").alias("_sc")
    )
    ws = (
        Window.partitionBy("epoch")
        .orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    soff = stage_counts.select(
        "epoch", "stage",
        F.coalesce(F.sum("_sc").over(ws), F.lit(0)).alias("_soff"),
    )
    ww = Window.partitionBy("epoch", "stage", "_bkt").orderBy(
        F.col("h").asc(), F.col("item_id").asc()
    )
    return (
        hb.join(boff, ["epoch", "stage", "_bkt"])
        .join(soff, ["epoch", "stage"])
        .select(
            "epoch",
            "item_id",
            "stage",
            (F.col("_soff") + F.col("_boff") + F.row_number().over(ww) - 1)
            .cast("long")
            .alias("position"),
        )
    )


def sft_pack(
    df: DataFrame,
    conv_col: str,
    order_col: str,
    role_col: str,
    tok_col: str,
    ctx_len: int = PACK_ASSIGN_CTX,
    loss_role: str = "assistant",
    quantum: int = 64,
    bucket: int = 4096,
) -> DataFrame:
    """``(conv_id, turn_idx, role, n_tok, seq_id, start_offset,
    clipped, loss_mask)`` — SFT-style multi-turn conversation packing:
    whole conversations pack into fixed-``ctx_len`` training sequences
    with per-turn token offsets and the loss mask a supervised
    fine-tuning loader consumes (train only on ``loss_role`` turns;
    everything else is context).

    Conversations pad up to a ``quantum``-token slot before packing —
    the standard loader move (pad-to-multiple), and what makes the
    size-class shelf scheme effective here: conversation totals are
    near-unique, so EXACT-size classes would be singletons and nothing
    would ever share a sequence; quantized slots collapse them into
    populated classes, at a bounded padding cost of < ``quantum``
    tokens per conversation (visible as gaps in the slot-strided
    ``start_offset``s). ``ctx_len`` must be a multiple of ``quantum``
    so a quantized slot never straddles the sequence boundary.

    Semantics: turns order by ``order_col`` within a conversation
    (pass a total order — e.g. a unique event id; ties would make the
    manifest nondeterministic, so the within-conversation rank uses
    ``order_col`` alone). Conversations place as ATOMIC items via
    :func:`pack_assign` (size-class shelf packing — the closed-form
    distributed FFD), so no sequence ever splits a conversation across
    sequences; a conversation longer than ``ctx_len`` truncates into
    its own sequence and the turns past the budget come back
    ``clipped`` (kept in the manifest for auditability — their
    ``start_offset`` is the nominal cumulative offset — but
    ``loss_mask`` is forced false; a loader drops them). ``loss_mask``
    = (role == loss_role) AND NOT clipped.

    Scale shape: one conversation-partitioned window pair (rank +
    exclusive token cumsum — bounded by the longest conversation, the
    same per-key window class as every doc-keyed operator here), one
    conversation-keyed aggregate for totals, the :func:`pack_assign`
    machinery (no corpus-sized window, |classes|-bounded broadcast),
    and one id-keyed join back to the turns. Everything downstream of
    the window is integer arithmetic both engines replay exactly.

    No counterpart in the reference; extension operator (the SFT-era
    member of the packing family: ``pack_assign`` packs documents,
    this packs role-alternating conversations with mask boundaries).
    """
    if quantum < 1:
        raise ValueError(f"quantum must be >= 1, got {quantum}")
    if ctx_len % quantum != 0:
        raise ValueError(
            f"ctx_len must be a multiple of quantum, got {ctx_len} % {quantum}"
        )
    t = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(order_col).alias("_ord"),
        F.col(role_col).alias("role"),
        F.col(tok_col).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.col("_ord").asc())
    turns = (
        t.withColumn("turn_idx", F.row_number().over(w) - 1)
        .withColumn(
            "cum",
            F.coalesce(
                F.sum("n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .drop("_ord")
    )
    totals = t.groupBy("conv_id").agg(F.sum("n_tok").alias("conv_tok"))
    q = int(quantum)
    slots = totals.withColumn(
        "slot_tok", F.expr(f"((conv_tok + {q - 1}) DIV {q}) * {q}")
    )
    bins = pack_assign(
        slots, "conv_id", "slot_tok", ctx_len=ctx_len, bucket=bucket
    ).select(
        F.col("doc_id").alias("conv_id"), "seq_len", "bin_id", "tok_offset"
    )
    clipped = (F.col("cum") + F.col("n_tok")) > F.col("seq_len")
    return turns.join(bins, "conv_id").select(
        "conv_id",
        "turn_idx",
        "role",
        "n_tok",
        F.col("bin_id").alias("seq_id"),
        (F.col("tok_offset") + F.col("cum")).cast("long").alias("start_offset"),
        clipped.alias("clipped"),
        ((F.col("role") == F.lit(loss_role)) & ~clipped).alias("loss_mask"),
    )
