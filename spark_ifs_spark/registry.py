"""Query registry: every implemented operator as a (Spark callable,
DuckDB oracle SQL) pair over the driver's parquet tables.

This is the correctness gate surface consumed by ``__spark_entry__.py``:
the driver runs each Spark query AND its oracle SQL side-by-side and
compares row count + schema + order-insensitive value hash. Conventions
that make the comparison exact:

- every computed double is ``round(x, 6)`` on BOTH sides (covers ulp-level
  aggregation-order differences); orderings/argmaxes always happen on the
  full-precision values *before* rounding;
- all hashing is md5-based via :mod:`spark_ifs_spark.functions.hashing`
  (identical integer arithmetic in both engines, no engine-native hash);
- quantization of embedding floats is ``floor(x * 8)`` — multiplying by a
  power of two is exact in IEEE-754, so the categorical levels are
  bit-identical across engines;
- timestamps are compared as epoch microseconds / formatted dates
  (driver testdata is µs-grain, verified) — never as raw timestamp
  objects.

The IFS queries mirror the reference semantics on the ``embeddings``
table, which *is* the conventional encoding at scale: ``label`` +
64 feature columns (quantized embedding dims).
"""

from __future__ import annotations

import atexit
import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ifs_spark.functions.hashing import (
    MINHASH_P,
    minhash_params,
    sql_band_power,
    sql_md5_int60,
    sql_universal_hash,
)
from spark_ifs_spark.functions.mi import mi_from_joint_counts
from spark_ifs_spark.operators import dedup, similarity, textstats
from spark_ifs_spark.operators.melt import melt_array
from spark_ifs_spark.operators.select_columns import select_columns
from spark_ifs_spark.operators.select_rows import select_rows
from spark_ifs_spark.operators.multimodal import (
    attach_fake_payloads,
    extract_image_features,
    fake_image_decoder,
)
from spark_ifs_spark.streaming.events import sessionize, windowed_event_counts

# ---------------------------------------------------------------------------
# shared constants (must match between Spark and SQL builders)

QUANT_SCALE = 8          # floor(x * 8) — exact in IEEE-754
MRMR_DIMS = 16           # feature subset for the greedy-selection queries
MRMR_K = 5
EMB_DIMS = 64
NGRAM_N = 3
JACCARD_THRESHOLD = 0.5
NGRAM_MAX_DF = 1000
MINHASH_HASHES = 16
MINHASH_ROWS_PER_BAND = 2
SIMHASH_BITS = 60
ANN_K = 10
TOP_PAIRS_K = 20
IVF_CENTROIDS = 16
IVF_PROBE = 4
EMB_DEDUP_THRESHOLD = 0.4
ANN_LSH_PLANES = 6
ANN_LSH_SEED = 42
# Embedding-pair LSH (dedup_embedding_lsh): P=6 bits × L=40 tables chosen
# empirically — this data's planted near-dups sit at cosine 0.40–0.51,
# where sign-LSH needs generous OR-amplification for recall ≥ 0.9
# (measured 0.970/0.966/0.953 at sf0.001/0.01/0.1, candidate fraction
# ~0.47 — weak pruning is the regime, not the operator; see
# cosine_lsh_pairs docs for the production-threshold s-curve).
EMB_LSH_PLANES = 6
EMB_LSH_TABLES = 40
EMB_LSH_SEED = 31337
PROJ_DIMS = 8
PROJ_SEED = 7
SAMPLE_N = 100
SAMPLE_SEED = 13

#: per-session memo of the staged 2-file streaming source for
#: q_events_user_stats, keyed by (sf_dir, source-file mtime) so an
#: in-session change to the events parquet restages instead of reading
#: stale data. Dirs are removed at interpreter exit (atexit) — the memo
#: exists to make repeat timings measure the stream, not the staging.
_USER_STATS_STAGED: dict[tuple[str, float], str] = {}


@atexit.register
def _cleanup_staged_dirs() -> None:
    import shutil

    for src in _USER_STATS_STAGED.values():
        shutil.rmtree(os.path.dirname(src), ignore_errors=True)
    _USER_STATS_STAGED.clear()


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from spark_ifs_spark.sources.parquet import load_table

    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# IFS core queries

def _quantized_wide(spark: SparkSession, sf_dir: str, dims: int) -> tuple[DataFrame, list[str]]:
    emb = _read(spark, sf_dir, "embeddings")
    cols = [f"f{j}" for j in range(dims)]
    wide = emb.select(
        F.col("label").cast("double").alias("label"),
        F.col("vec_id"),
        *[
            F.floor(F.col("embedding")[j].cast("double") * QUANT_SCALE).cast("double").alias(c)
            for j, c in enumerate(cols)
        ],
    )
    return wide, cols


def q_mi_pair_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    from spark_ifs_spark.functions.mi import joint_counts

    return mi_from_joint_counts(
        joint_counts(li, "l_returnflag", "l_linestatus"), group_cols=[]
    ).select(F.round("mi", 6).alias("mi"))


def sql_mi_pair_lineitem() -> str:
    return """
WITH joint AS (
  SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), tot AS (SELECT sum(c) AS n FROM joint),
ma AS (SELECT a, sum(c) AS ca FROM joint GROUP BY 1),
mb AS (SELECT b, sum(c) AS cb FROM joint GROUP BY 1)
SELECT round(sum((c * 1.0 / n) * ln((c * 1.0 * n) / (ca * 1.0 * cb))), 6) AS mi
FROM joint
CROSS JOIN tot
JOIN ma USING (a)
JOIN mb USING (b)
"""


def q_mi_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(quantized dim j, label) for every embedding dim (round-1
    relevance of `selectColumns`, IFS:46-140 with S=∅)."""
    emb = _read(spark, sf_dir, "embeddings")
    long = emb.select(
        F.col("label").cast("double").alias("lab"),
        F.posexplode(F.col("embedding")).alias("feature", "e"),
    ).select("feature", "lab", F.floor(F.col("e").cast("double") * QUANT_SCALE).alias("q"))
    joint = long.groupBy("feature", "q", "lab").agg(F.count(F.lit(1)).alias("cnt"))
    mi = mi_from_joint_counts(joint, ["feature"], a_col="q", b_col="lab")
    return mi.select("feature", F.round("mi", 6).alias("mi"))


def _sql_emb_long(dims: int) -> str:
    return f"""
long AS (
  SELECT vec_id, i AS col, floor(CAST(embedding[i + 1] AS DOUBLE) * {QUANT_SCALE}) AS val
  FROM embeddings, range({dims}) t(i)
  UNION ALL
  SELECT vec_id, -1 AS col, CAST(label AS DOUBLE) AS val FROM embeddings
)"""


def _sql_pair_mi(dims: int) -> str:
    """CTE text computing mi(ca, cb) for ca in feature dims, cb in dims ∪ {-1}."""
    return f"""
{_sql_emb_long(dims)},
pairs AS (
  SELECT a.col AS ca, b.col AS cb, a.val AS va, b.val AS vb, count(*) AS c
  FROM long a JOIN long b ON a.vec_id = b.vec_id
  WHERE a.col >= 0 AND a.col <> b.col
  GROUP BY 1, 2, 3, 4
),
tot AS (SELECT ca, cb, sum(c) AS n FROM pairs GROUP BY 1, 2),
ma AS (SELECT ca, cb, va, sum(c) AS cna FROM pairs GROUP BY 1, 2, 3),
mb AS (SELECT ca, cb, vb, sum(c) AS cnb FROM pairs GROUP BY 1, 2, 3),
mi AS (
  SELECT p.ca, p.cb,
         sum((p.c * 1.0 / t.n) * ln((p.c * 1.0 * t.n) / (ma.cna * 1.0 * mb.cnb))) AS mi
  FROM pairs p
  JOIN tot t ON t.ca = p.ca AND t.cb = p.cb
  JOIN ma ON ma.ca = p.ca AND ma.cb = p.cb AND ma.va = p.va
  JOIN mb ON mb.ca = p.ca AND mb.cb = p.cb AND mb.vb = p.vb
  GROUP BY 1, 2
)"""


def sql_mi_relevance() -> str:
    return f"""
WITH {_sql_pair_mi(EMB_DIMS)}
SELECT ca AS feature, round(mi, 6) AS mi FROM mi WHERE cb = -1
"""


def q_mi_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise MI matrix over the quantized dims (one explode + one
    hash aggregate — the sufficient statistic any feature-selection run
    draws from): ``(a, b, mi)`` with a<b, label as a=-1."""
    from spark_ifs_spark.operators.select_columns import all_pairs_mi

    wide, cols = _quantized_wide(spark, sf_dir, MRMR_DIMS)
    out = all_pairs_mi(wide, "label", cols)
    return out.select("a", "b", F.round("mi", 6).alias("mi"))


def sql_mi_matrix() -> str:
    return f"""
WITH {_sql_pair_mi(MRMR_DIMS)}
SELECT -1 AS a, ca AS b, round(mi, 6) AS mi FROM mi WHERE cb = -1
UNION ALL
SELECT ca AS a, cb AS b, round(mi, 6) AS mi FROM mi WHERE cb >= 0 AND ca < cb
"""


def q_mrmr_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 winner: argmax relevance (ColumnWiseScore.scala:51)."""
    emb = _read(spark, sf_dir, "embeddings")
    long = emb.select(
        F.col("label").cast("double").alias("lab"),
        F.posexplode(F.col("embedding")).alias("feature", "e"),
    ).select("feature", "lab", F.floor(F.col("e").cast("double") * QUANT_SCALE).alias("q"))
    joint = long.groupBy("feature", "q", "lab").agg(F.count(F.lit(1)).alias("cnt"))
    mi = mi_from_joint_counts(joint, ["feature"], a_col="q", b_col="lab")
    return (
        mi.orderBy(F.col("mi").desc(), F.col("feature").asc())
        .limit(1)
        .select("feature", F.round("mi", 6).alias("score"))
    )


def sql_mrmr_top1() -> str:
    return f"""
WITH {_sql_pair_mi(EMB_DIMS)}
SELECT ca AS feature, round(mi, 6) AS score FROM mi WHERE cb = -1
ORDER BY mi DESC, ca ASC LIMIT 1
"""


def q_mrmr_select_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide, cols = _quantized_wide(spark, sf_dir, MRMR_DIMS)
    sel = select_columns(wide, "label", cols, num=MRMR_K)
    rows = [(r + 1, int(f), round(s, 6)) for r, (f, s) in enumerate(sel)]
    return spark.createDataFrame(rows, "rank int, feature int, score double")


def _sql_unrolled_greedy(score_sql: str) -> str:
    """Unrolled k-round greedy selection over the pairwise-MI matrix.
    ``score_sql`` combines ``r.score`` (relevance) with ``{red}`` (the
    mean-redundancy scalar subquery) into the round score."""
    rounds = []
    prevs = []
    for k in range(1, MRMR_K + 1):
        if k == 1:
            rounds.append("r1 AS (SELECT ca, mi AS score FROM mi WHERE cb = -1)")
        else:
            prev_union = " UNION ALL ".join(f"SELECT ca FROM w{j}" for j in range(1, k))
            red = (
                f"(SELECT avg(m.mi) FROM mi m WHERE m.ca = r.ca "
                f"AND m.cb IN ({prev_union}))"
            )
            rounds.append(
                f"""r{k} AS (
  SELECT r.ca, {score_sql.format(red=red)} AS score
  FROM r1 r WHERE r.ca NOT IN ({prev_union})
)"""
            )
        rounds.append(f"w{k} AS (SELECT ca, score FROM r{k} ORDER BY score DESC, ca ASC LIMIT 1)")
        prevs.append(f"SELECT {k} AS rank, ca AS feature, round(score, 6) AS score FROM w{k}")
    body = ",\n".join(rounds)
    final = "\nUNION ALL\n".join(prevs)
    return f"WITH {_sql_pair_mi(MRMR_DIMS)},\n{body}\n{final}"


def sql_mrmr_select_k5() -> str:
    """Unrolled greedy mRMR (difference form, MID), k=5."""
    return _sql_unrolled_greedy("r.score - {red}")


def q_mrmr_miq_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy selection under the MIQ (quotient) score — exercises the
    pluggable ColumnScore surface (reference trait
    ``ColumnWiseScore.scala:9-23``) with a non-default plug-in."""
    from spark_ifs_spark.operators.scores import MiqColumnScore

    wide, cols = _quantized_wide(spark, sf_dir, MRMR_DIMS)
    sel = select_columns(wide, "label", cols, num=MRMR_K, score=MiqColumnScore())
    rows = [(r + 1, int(f), round(s, 6)) for r, (f, s) in enumerate(sel)]
    return spark.createDataFrame(rows, "rank int, feature int, score double")


def sql_mrmr_miq_k5() -> str:
    return _sql_unrolled_greedy("r.score / greatest({red}, 1e-12)")


def q_row_select_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same selection through the ALTERNATE encoding: quantized dims
    transposed to feature-rows, labels broadcast — must agree with
    q_mrmr_select_k5 (the reference's differential invariant)."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.col("label").cast("double").alias("lab"),
        F.transform(
            F.slice(F.col("embedding"), 1, MRMR_DIMS),
            lambda x: F.floor(x.cast("double") * QUANT_SCALE),
        ).alias("qarr"),
    )
    long = melt_array(q, "qarr", carry_cols=["vec_id"])
    alt = (
        long.groupBy("col")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("vec_id").alias("o"), F.col("value").alias("v")))
            ).alias("s")
        )
        .select(F.col("col").cast("long").alias("id"), F.col("s.v").alias("features"))
    )
    labels = [
        float(r["lab"]) for r in q.select("vec_id", "lab").orderBy("vec_id").collect()
    ]
    sel = select_rows(alt, num=MRMR_K, labels_row=labels)
    rows = [(r + 1, int(f), round(s, 6)) for r, (f, s) in enumerate(sel)]
    return spark.createDataFrame(rows, "rank int, feature int, score double")


# ---------------------------------------------------------------------------
# dedup queries (documents table)

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", ["text"])


def sql_dedup_exact() -> str:
    return "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text"


_SQL_WORDS = """
words AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
)"""

_SQL_SHINGLES = f"""
{_SQL_WORDS},
sh AS (
  SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w || ' ' || c.w AS sh
  FROM words a
  JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN words c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
)"""

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    out = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", NGRAM_N, JACCARD_THRESHOLD, max_df=NGRAM_MAX_DF
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def sql_dedup_ngram_jaccard() -> str:
    # Same semantics as the Spark side: candidate pairs require a shared
    # shingle with DF <= NGRAM_MAX_DF; the Jaccard itself is exact over
    # ALL shingles of the candidate pair.
    return f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM sh x
  JOIN sh y ON x.sh = y.sh AND x.id < y.id
  JOIN dfreq d ON d.sh = x.sh
  WHERE d.df <= {NGRAM_MAX_DF}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.id = c.id_a
  JOIN sh y ON y.id = c.id_b AND y.sh = x.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= {JACCARD_THRESHOLD}
"""


#: fuzzy edit-distance dedup params — band must be >= max distance
EDIT_MAX_DIST = 12
EDIT_LEN_BAND = 12


def q_dedup_fuzzy_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs under length-band blocking — the fuzzy
    dedup complement to token-set Jaccard (catches single-char edits
    Jaccard over-counts and transpositions it misses)."""
    docs = _read(spark, sf_dir, "documents")
    out = dedup.edit_distance_pairs(
        docs, "doc_id", "text",
        max_dist=EDIT_MAX_DIST, len_band=EDIT_LEN_BAND, len_col="n_chars",
    )
    return out.select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))


def sql_dedup_fuzzy_edit() -> str:
    # same blocking semantics: only pairs within the length band are
    # candidates (band >= max_dist makes the block lossless)
    return f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS dist
FROM documents a
JOIN documents b
  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {EDIT_LEN_BAND}
WHERE levenshtein(a.text, b.text) <= {EDIT_MAX_DIST}
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    out = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def sql_dedup_minhash() -> str:
    params = minhash_params(MINHASH_HASHES)
    hash_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    rpb = MINHASH_ROWS_PER_BAND
    powers = ", ".join(f"({j}, {sql_band_power(j)})" for j in range(rpb))
    return f"""
WITH {_SQL_SHINGLES},
shi AS (SELECT id, {sql_md5_int60('sh')} AS x FROM sh),
hp(i, a, b) AS (VALUES {hash_rows}),
pw(j, p) AS (VALUES {powers}),
sig AS (
  SELECT shi.id, hp.i, min((hp.a * (shi.x % {MINHASH_P}) + hp.b) % {MINHASH_P}) AS minh
  FROM shi CROSS JOIN hp
  GROUP BY 1, 2
),
bands AS (
  SELECT id, CAST(floor(i * 1.0 / {rpb}) AS INT) AS band,
         sum((minh * pw.p) % {MINHASH_P}) % {MINHASH_P} AS bkey
  FROM sig JOIN pw ON pw.j = i % {rpb}
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT cand.id_a, cand.id_b, count(*) AS i
  FROM cand
  JOIN sh x ON x.id = cand.id_a
  JOIN sh y ON y.id = cand.id_b AND y.sh = x.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= {JACCARD_THRESHOLD}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=SIMHASH_BITS)


def sql_dedup_simhash() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w FROM documents
),
th AS (SELECT id, {sql_md5_int60('w')} AS h FROM toks),
votes AS (
  SELECT id, b.bit, sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, range({SIMHASH_BITS}) b(bit)
  GROUP BY 1, 2
)
SELECT id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM votes GROUP BY 1
"""


# ---------------------------------------------------------------------------
# similarity queries (embeddings table)

def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (fifth dedup modality): every
    vector pair with cosine ≥ threshold, via the blocked-GEMM all-pairs
    kernel. Exact (not LSH-gated), so the SQL oracle is the literal
    definition."""
    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.cosine_threshold_pairs(
        emb, "vec_id", "embedding", threshold=EMB_DEDUP_THRESHOLD
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def sql_dedup_embedding() -> str:
    return f"""
WITH n AS (
  SELECT vec_id, sqrt(sum(CAST(embedding[i + 1] AS DOUBLE) * CAST(embedding[i + 1] AS DOUBLE))) AS nrm
  FROM embeddings CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1
),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum((CAST(a.embedding[i + 1] AS DOUBLE) / na.nrm) * (CAST(b.embedding[i + 1] AS DOUBLE) / nb.nrm)) AS cos
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
  CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(cos, 6) AS cos FROM scored WHERE cos >= {EMB_DEDUP_THRESHOLD}
"""


def q_dedup_embedding_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same near-dup query through the DISTRIBUTED plan: triangular
    block-matrix GEMM (`similarity.py:_blocked_pairs_kernel`) — no
    driver collect, no broadcast guard, recall-complete by construction,
    so it is graded against the identical exact oracle as
    ``dedup_embedding``. This is the 100 TB path; the broadcast kernel
    is the small-corpus fast path that now falls back to this one."""
    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.cosine_threshold_pairs_blocked(
        emb, "vec_id", "embedding", threshold=EMB_DEDUP_THRESHOLD, num_blocks=4
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs through the LSH-bucketed scale path:
    candidates only from hyperplane-sign bucket collisions (P=6 bits ×
    L=32 OR-amplified tables), exact cosine verify. The oracle embeds
    the SAME seeded hyperplanes as SQL VALUES and replicates the bucket
    gate exactly (the ``sql_ann_topk_lsh`` pattern) — approximate ≠
    unchecked. Recall vs the exact blocked kernel is audited by
    ``dedup_embedding_lsh_recall``."""
    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.cosine_lsh_pairs(
        emb,
        "vec_id",
        "embedding",
        EMB_DIMS,
        threshold=EMB_DEDUP_THRESHOLD,
        num_planes=EMB_LSH_PLANES,
        num_tables=EMB_LSH_TABLES,
        seed=EMB_LSH_SEED,
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def _sql_emb_lsh_cand() -> str:
    """Shared CTE chain replicating the cosine_lsh_pairs candidate gate:
    planes VALUES → per-(vec, plane) projection → per-(vec, table)
    bucket → distinct colliding (id_a < id_b) pairs, named ``cand``."""
    import random as _random

    rng = _random.Random(EMB_LSH_SEED)
    planes = [
        [rng.gauss(0, 1) for _ in range(EMB_DIMS)]
        for _ in range(EMB_LSH_PLANES * EMB_LSH_TABLES)
    ]
    vals = ",".join(
        f"({p},{i},{w!r})"
        for p, plane in enumerate(planes)
        for i, w in enumerate(plane)
    )
    return f"""pl(p, i, w) AS (VALUES {vals}),
proj AS (
  SELECT e.vec_id, pl.p, sum(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.w) AS d
  FROM embeddings e CROSS JOIN pl
  GROUP BY 1, 2
),
bk AS (
  SELECT vec_id, CAST(p // {EMB_LSH_PLANES} AS INT) AS tbl,
         sum(CASE WHEN d >= 0
             THEN (CAST(1 AS BIGINT) << CAST(p % {EMB_LSH_PLANES} AS INT))
             ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
nrms AS (
  SELECT vec_id,
         sqrt(sum(CAST(embedding[i + 1] AS DOUBLE) * CAST(embedding[i + 1] AS DOUBLE))) AS nrm
  FROM embeddings CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1
),
lsh_pairs AS (
  SELECT c.id_a, c.id_b,
         sum(CAST(ea.embedding[i + 1] AS DOUBLE) * CAST(eb.embedding[i + 1] AS DOUBLE))
           / (na.nrm * nb.nrm) AS cos
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  JOIN nrms na ON na.vec_id = c.id_a
  JOIN nrms nb ON nb.vec_id = c.id_b
  CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1, 2, na.nrm, nb.nrm
)"""


def sql_dedup_embedding_lsh() -> str:
    return f"""
WITH {_sql_emb_lsh_cand()}
SELECT id_a, id_b, round(cos, 6) AS cos
FROM lsh_pairs WHERE cos >= {EMB_DEDUP_THRESHOLD}
"""


def q_dedup_embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the LSH-bucketed embedding dedup against the
    exact (recall-complete) blocked-GEMM kernel at the same threshold:
    ``(n_exact, n_lsh, n_hit, recall_ppm)`` — the ``ann_recall_audit``
    pattern. A pytest asserts recall_ppm ≥ 900_000."""
    emb = _read(spark, sf_dir, "embeddings")
    exact = similarity.cosine_threshold_pairs_blocked(
        emb, "vec_id", "embedding", threshold=EMB_DEDUP_THRESHOLD, num_blocks=4
    ).select("id_a", "id_b")
    found = similarity.cosine_lsh_pairs(
        emb,
        "vec_id",
        "embedding",
        EMB_DIMS,
        threshold=EMB_DEDUP_THRESHOLD,
        num_planes=EMB_LSH_PLANES,
        num_tables=EMB_LSH_TABLES,
        seed=EMB_LSH_SEED,
    ).select("id_a", "id_b")
    hits = exact.join(found, ["id_a", "id_b"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_lsh")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_exact",
            "n_lsh",
            "n_hit",
            F.expr("(1000000 * n_hit) div n_exact").alias("recall_ppm"),
        )
    )


def sql_dedup_embedding_lsh_recall() -> str:
    return f"""
WITH {_sql_emb_lsh_cand()},
exact_pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(CAST(a.embedding[i + 1] AS DOUBLE) * CAST(b.embedding[i + 1] AS DOUBLE))
           / (na.nrm * nb.nrm) AS cos
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN nrms na ON na.vec_id = a.vec_id
  JOIN nrms nb ON nb.vec_id = b.vec_id
  CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1, 2, na.nrm, nb.nrm
),
e AS (SELECT id_a, id_b FROM exact_pairs WHERE cos >= {EMB_DEDUP_THRESHOLD}),
f AS (SELECT id_a, id_b FROM lsh_pairs WHERE cos >= {EMB_DEDUP_THRESHOLD}),
h AS (SELECT e.id_a, e.id_b FROM e JOIN f USING (id_a, id_b))
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_exact,
       CAST((SELECT count(*) FROM f) AS BIGINT) AS n_lsh,
       CAST((SELECT count(*) FROM h) AS BIGINT) AS n_hit,
       CAST((1000000 * (SELECT count(*) FROM h)) // (SELECT count(*) FROM e) AS BIGINT) AS recall_ppm
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = similarity.cosine_topk(emb, "vec_id", "embedding", [float(x) for x in qvec], k=ANN_K, exclude_ids=[0])
    return out.select("id", F.round("cos", 6).alias("cos"))


def sql_ann_topk() -> str:
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)) /
         (sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) *
          sqrt(sum(CAST(q.qe[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)))) AS cos
  FROM embeddings e CROSS JOIN q CROSS JOIN range({EMB_DIMS}) t(i)
  WHERE e.vec_id <> 0
  GROUP BY e.vec_id
)
SELECT id, round(cos, 6) AS cos FROM scored ORDER BY cos DESC, id ASC LIMIT {ANN_K}
"""


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate top-k: same query vector as ``ann_topk`` but
    scanning only the ``IVF_PROBE`` nearest of ``IVF_CENTROIDS`` cells.
    The oracle replicates the IVF semantics exactly (same seed centroids,
    same argmax assignment, same probe set), so approximate ≠ unchecked."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = similarity.cosine_topk_ivf(
        emb,
        "vec_id",
        "embedding",
        [float(x) for x in qvec],
        k=ANN_K,
        num_centroids=IVF_CENTROIDS,
        n_probe=IVF_PROBE,
        exclude_ids=[0],
    )
    return out.select("id", F.round("cos", 6).alias("cos"))


def sql_ann_topk_ivf() -> str:
    dot = (
        "sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE)) / "
        "(sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) * "
        "sqrt(sum(CAST(c.ce[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE))))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
vc AS (
  SELECT e.vec_id AS id, c.cid, {dot} AS cos
  FROM embeddings e CROSS JOIN cents c CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM vc
  ) WHERE rn = 1
),
qprobe AS (
  SELECT cid FROM vc WHERE id = 0 ORDER BY cos DESC, cid ASC LIMIT {IVF_PROBE}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)) /
         (sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) *
          sqrt(sum(CAST(q.qe[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)))) AS cos
  FROM embeddings e
  JOIN assign a ON a.id = e.vec_id
  CROSS JOIN q CROSS JOIN range({EMB_DIMS}) t(i)
  WHERE e.vec_id <> 0 AND a.cell IN (SELECT cid FROM qprobe)
  GROUP BY e.vec_id
)
SELECT id, round(cos, 6) AS cos FROM scored ORDER BY cos DESC, id ASC LIMIT {ANN_K}
"""


def q_ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed top-k over LLOYD-TRAINED centroids (one k-means
    iteration from the seed centroids, means rounded to 6dp so both
    engines quantize away summation-order ulps). The oracle replicates
    the ENTIRE training loop in SQL — seed assignment, per-cell means
    with the empty-cell-keeps-seed convention, re-assignment to the
    trained centroids, probe selection — so trained-approximate is as
    hash-checked as exact."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents = similarity.ivf_centroids_kmeans(
        emb, "vec_id", "embedding", IVF_CENTROIDS, iters=1
    )
    cents = [(cid, [round(x, 6) for x in v]) for cid, v in cents]
    out = similarity.cosine_topk_ivf(
        emb,
        "vec_id",
        "embedding",
        [float(x) for x in qvec],
        k=ANN_K,
        n_probe=IVF_PROBE,
        exclude_ids=[0],
        centroids=cents,
    )
    return out.select("id", F.round("cos", 6).alias("cos"))


def sql_ann_topk_ivf_trained() -> str:
    dot = (
        "sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE)) / "
        "(sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) * "
        "sqrt(sum(CAST(c.ce[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE))))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
vc AS (
  SELECT e.vec_id AS id, c.cid, {dot} AS cos
  FROM embeddings e CROSS JOIN cents c CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM vc
  ) WHERE rn = 1
),
means AS (
  SELECT a.cell AS cid, CAST(t.i AS INT) AS dim,
         round(avg(CAST(e.embedding[t.i + 1] AS DOUBLE)), 6) AS m
  FROM embeddings e
  JOIN assign a ON a.id = e.vec_id
  CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1, 2
),
seedd AS (
  SELECT cid, CAST(t.i AS INT) AS dim, round(CAST(ce[t.i + 1] AS DOUBLE), 6) AS m
  FROM cents CROSS JOIN range({EMB_DIMS}) t(i)
),
trained AS (
  SELECT s.cid, s.dim, coalesce(mn.m, s.m) AS m
  FROM seedd s LEFT JOIN means mn ON mn.cid = s.cid AND mn.dim = s.dim
),
vc2 AS (
  SELECT e.vec_id AS id, tr.cid,
         sum(CAST(e.embedding[tr.dim + 1] AS DOUBLE) * tr.m) /
         (sqrt(sum(CAST(e.embedding[tr.dim + 1] AS DOUBLE) * CAST(e.embedding[tr.dim + 1] AS DOUBLE))) *
          sqrt(sum(tr.m * tr.m))) AS cos
  FROM embeddings e CROSS JOIN trained tr
  GROUP BY e.vec_id, tr.cid
),
assign2 AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM vc2
  ) WHERE rn = 1
),
qprobe AS (
  SELECT cid FROM vc2 WHERE id = 0 ORDER BY cos DESC, cid ASC LIMIT {IVF_PROBE}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)) /
         (sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) *
          sqrt(sum(CAST(q.qe[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)))) AS cos
  FROM embeddings e
  JOIN assign2 a ON a.id = e.vec_id
  CROSS JOIN q CROSS JOIN range({EMB_DIMS}) t(i)
  WHERE e.vec_id <> 0 AND a.cell IN (SELECT cid FROM qprobe)
  GROUP BY e.vec_id
)
SELECT id, round(cos, 6) AS cos FROM scored ORDER BY cos DESC, id ASC LIMIT {ANN_K}
"""


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-gated approximate top-k: scan restricted to the
    query's sign-of-projection bucket, exact cosine within it. The
    hyperplanes are seeded Python float literals, so the oracle embeds
    the SAME planes as SQL VALUES and replicates the bucket gate exactly
    (the pattern ``sql_dedup_minhash`` uses for its hash params) —
    approximate ≠ unchecked."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = similarity.cosine_topk_lsh(
        emb,
        "vec_id",
        "embedding",
        [float(x) for x in qvec],
        k=ANN_K,
        num_planes=ANN_LSH_PLANES,
        seed=ANN_LSH_SEED,
        exclude_ids=[0],
    )
    return out.select("id", F.round("cos", 6).alias("cos"))


def sql_ann_topk_lsh() -> str:
    import random

    rng = random.Random(ANN_LSH_SEED)
    planes = [
        [rng.gauss(0, 1) for _ in range(EMB_DIMS)] for _ in range(ANN_LSH_PLANES)
    ]
    vals = ",\n".join(
        f"({j}, {i}, {w!r})"
        for j, plane in enumerate(planes)
        for i, w in enumerate(plane)
    )
    return f"""
WITH pl(j, i, w) AS (VALUES {vals}),
proj AS (
  SELECT e.vec_id, pl.j, sum(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.w) AS d
  FROM embeddings e CROSS JOIN pl
  GROUP BY 1, 2
),
b AS (
  SELECT vec_id,
         sum(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY 1
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)) /
         (sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) *
          sqrt(sum(CAST(q.qe[i + 1] AS DOUBLE) * CAST(q.qe[i + 1] AS DOUBLE)))) AS cos
  FROM embeddings e
  JOIN b ON b.vec_id = e.vec_id
  CROSS JOIN q CROSS JOIN range({EMB_DIMS}) t(i)
  WHERE e.vec_id <> 0
    AND b.bucket = (SELECT bucket FROM b WHERE vec_id = 0)
  GROUP BY e.vec_id
)
SELECT id, round(cos, 6) AS cos FROM scored ORDER BY cos DESC, id ASC LIMIT {ANN_K}
"""


def q_embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.cosine_top_pairs(emb, "vec_id", "embedding", k=TOP_PAIRS_K)
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def sql_embedding_top_pairs() -> str:
    return f"""
WITH n AS (
  SELECT vec_id, sqrt(sum(CAST(embedding[i + 1] AS DOUBLE) * CAST(embedding[i + 1] AS DOUBLE))) AS nrm
  FROM embeddings CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1
),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum((CAST(a.embedding[i + 1] AS DOUBLE) / na.nrm) * (CAST(b.embedding[i + 1] AS DOUBLE) / nb.nrm)) AS cos
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
  CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(cos, 6) AS cos FROM scored
ORDER BY cos DESC, id_a ASC, id_b ASC LIMIT {TOP_PAIRS_K}
"""


# ---------------------------------------------------------------------------
# text analysis queries (documents table)

def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_counts(_read(spark, sf_dir, "documents"), "doc_id", "text")


def sql_text_token_counts() -> str:
    return f"""
SELECT doc_id AS id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{textstats.TOKEN_RE}')) AS n_re_tokens,
       length(text) AS n_chars
FROM documents
"""


def _sql_count_word(word: str) -> str:
    return f"len(regexp_extract_all(' ' || text || ' ', ' {word} '))"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.quality_score(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
    )


def sql_text_quality() -> str:
    stop_sum = " + ".join(_sql_count_word(w) for w in textstats.STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id AS id,
         len(string_split(text, ' ')) AS n_words,
         (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0 / len(string_split(text, ' ')) AS mean_wl,
         ({stop_sum}) * 1.0 / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
)
SELECT id, n_words,
       round(mean_wl, 6) AS mean_word_len,
       round(stop_ratio, 6) AS stopword_ratio,
       round(least(n_words / 50.0, 1.0)
             * (1.0 - least(abs(mean_wl - 5.0) / 5.0, 1.0))
             * least(stop_ratio * 5.0, 1.0), 6) AS quality
FROM base
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_read(spark, sf_dir, "documents"), "doc_id", "text")


def sql_lang_id() -> str:
    langs = sorted(textstats.LANG_MARKERS)
    counts = {
        lang: " + ".join(_sql_count_word(w) for w in textstats.LANG_MARKERS[lang])
        for lang in langs
    }
    cols = ",\n         ".join(f"({counts[lang]}) AS c_{lang}" for lang in langs)
    m = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN c_{lang} = m THEN '{lang}'" for lang in langs)
    return f"""
WITH base AS (
  SELECT doc_id AS id,
         {cols}
  FROM documents
), mx AS (SELECT *, {m} AS m FROM base)
SELECT id, CASE {case} END AS pred_lang FROM mx
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = textstats.repetition_ratio(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "id", "n_tokens", "n_distinct_tokens", F.round("repetition", 6).alias("repetition")
    )


def sql_text_repetition() -> str:
    return """
SELECT doc_id AS id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       round(CASE WHEN len(string_split(text, ' ')) > 0
             THEN (len(string_split(text, ' ')) - len(list_distinct(string_split(text, ' ')))) * 1.0
                  / len(string_split(text, ' '))
             ELSE 0.0 END, 6) AS repetition
FROM documents
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite corpus-cleaning pipeline — the operators composed the
    way a training-data job uses them: exact-dedup on the normalized
    fingerprint (keep lowest doc_id), then quality floor, then length
    floor. Returns surviving ``(id, fp, quality)``. One shuffle (the
    dedup groupBy); every filter is map-side."""
    docs = _read(spark, sf_dir, "documents")
    fp = textstats.fingerprint(docs, "doc_id", "text")
    q = textstats.quality_score(docs, "doc_id", "text")
    keep = fp.groupBy("fp").agg(F.min("id").alias("id"))
    return (
        keep.join(q, "id")
        .filter((F.col("quality") >= 0.1) & (F.col("n_words") >= 10))
        .select("id", "fp", F.round("quality", 6).alias("quality"))
    )


def sql_corpus_clean() -> str:
    # mirrors fingerprint + quality_score + dedup-keep-min + floors
    stop_hits = " + ".join(_sql_count_word(w) for w in textstats.STOPWORDS)
    return f"""
WITH fp AS (
  SELECT doc_id AS id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
keep AS (SELECT fp, min(id) AS id FROM fp GROUP BY fp),
q AS (
  SELECT doc_id AS id,
         len(string_split(text, ' ')) AS n_words,
         (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0 / len(string_split(text, ' ')) AS mean_wl,
         ({stop_hits}) * 1.0 / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
),
scored AS (
  SELECT id, n_words,
         least(n_words / 50.0, 1.0)
         * (1.0 - least(abs(mean_wl - 5.0) / 5.0, 1.0))
         * least(stop_ratio * 5.0, 1.0) AS quality
  FROM q
)
SELECT k.id, k.fp, round(s.quality, 6) AS quality
FROM keep k JOIN scored s ON s.id = k.id
WHERE s.quality >= 0.1 AND s.n_words >= 10
"""


def q_vocab_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 by frequency (token-asc tie-break)."""
    out = textstats.vocab_counts(_read(spark, sf_dir, "documents"), "text")
    return out.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(50)


def sql_vocab_top50() -> str:
    return """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 50
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_read(spark, sf_dir, "documents"), "doc_id", "text")


def sql_doc_fingerprint() -> str:
    return """
SELECT doc_id AS id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# multimodal plumbing query (documents as fake payloads)

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    payloads = attach_fake_payloads(docs, "doc_id", "text")
    return extract_image_features(payloads, "doc_id", "payload", decode_fn=fake_image_decoder)


def sql_multimodal_features() -> str:
    # fake decoder: w = 1 + first_byte % 64, h = 1 + last_byte % 64, c = 3;
    # text is ASCII so bytes == chars; md5(payload) == md5(text)
    return """
SELECT CAST(doc_id AS VARCHAR) AS id,
       1 + ascii(substr(text, 1, 1)) % 64 AS width,
       1 + ascii(substr(text, length(text), 1)) % 64 AS height,
       3 AS channels,
       md5(text) AS feature_hash
FROM documents
"""


# ---------------------------------------------------------------------------
# events queries (batch forms of the streaming transforms)

def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    out = windowed_event_counts(ev, window="1 day")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def sql_events_daily() -> str:
    return """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ifs_spark.functions.timeutil import epoch_us

    ev = _read(spark, sf_dir, "events")
    out = sessionize(ev, gap="30 minutes")
    return out.select(
        "user_id",
        epoch_us(out, "session_start").alias("session_start_us"),
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def sql_events_sessionize() -> str:
    return """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# classic scan/filter/agg (shows pushdown + partial agg; TPC-H Q1 shape)

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_events_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event matched to the user's most recent signup
    event at-or-before it (union + window carry-forward plan, one
    shuffle). Oracle is DuckDB's native ASOF LEFT JOIN — a built-in the
    engine composes from DataFrame ops (SURVEY custom-operator case)."""
    from spark_ifs_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", F.col("event_id").alias("signup_event"))
    )
    out = asof_join(
        ev, signups, by_cols=["user_id"], ts_col="ts", value_cols=["signup_event"]
    )
    return out.select("event_id", "user_id", "signup_event")


def sql_events_asof_signup() -> str:
    return """
SELECT l.event_id, l.user_id, r.event_id AS signup_event
FROM events l
ASOF LEFT JOIN (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'
) r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_events_topk_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe top-3 events by value per event type (two-stage salted
    window — identical results to the single-stage window, bounded task
    input under any key skew)."""
    from spark_ifs_spark.operators.topk import salted_topk_per_key

    ev = _read(spark, sf_dir, "events")
    out = salted_topk_per_key(
        ev, ["event_type"], "value", k=3, tiebreak_cols=["event_id"], buckets=8
    )
    return out.select(
        "event_type", "rank", "event_id", F.round("value", 6).alias("value")
    )


def sql_events_topk_per_type() -> str:
    return """
SELECT event_type, rank, event_id, round(value, 6) AS value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events
)
WHERE rank <= 3
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table join query (TPC-H Q5/Q10 shape): revenue per nation
    from open orders. Join strategy at scale: orders⋈customer shuffles on
    custkey (both large → sort-merge, AQE may re-plan), nation is a
    25-row dim → explicit broadcast. Filter on o_orderstatus pushes to
    the parquet scan."""
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .select("n_name", "n_orders", "revenue")
    )


def q_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join query shape (TPC-H Q4): count orders per priority that
    have at least one large-lot lineitem (quantity > 45). EXISTS becomes
    a leftsemi join — at scale a shuffle-join on orderkey whose build
    side carries only the join key (no lineitem payload ever moves), and
    the quantity filter pushes to the lineitem scan."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select("o_orderpriority", "order_count")
    )


def sql_priority_orders() -> str:
    return """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
"""


def sql_nation_revenue() -> str:
    return """
SELECT n_name,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'O'
GROUP BY n_name
"""


def sql_lineitem_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``)
    driven for real: the events table is re-staged as a 2-file streaming
    source so the state store folds ≥2 micro-batches, then the memory
    sink's per-batch updates are reduced to each user's final state —
    which must equal the plain batch ``GROUP BY`` the oracle runs."""
    import os
    import shutil
    import tempfile
    import uuid

    from spark_ifs_spark.streaming.stateful import running_user_stats

    ev = _read(spark, sf_dir, "events").select("user_id", "value")
    name = f"user_stats_{uuid.uuid4().hex[:8]}"
    # the 2-file staged source is identical across calls in a session —
    # memoize it (repeat timings then measure the stream, not the stage).
    # Keyed on source mtime so in-session data changes restage; stale
    # entries for the same sf_dir are removed eagerly, the rest at exit.
    mtime = os.path.getmtime(_t(sf_dir, "events"))
    key = (sf_dir, mtime)
    src = _USER_STATS_STAGED.get(key)
    if src is None or not os.path.isdir(src):
        for old_key in [k for k in _USER_STATS_STAGED if k[0] == sf_dir]:
            shutil.rmtree(
                os.path.dirname(_USER_STATS_STAGED.pop(old_key)),
                ignore_errors=True,
            )
        src = os.path.join(tempfile.mkdtemp(prefix="sis_stateful_"), "src")
        ev.repartition(2).write.mode("overwrite").parquet(src)
        _USER_STATS_STAGED[key] = src
    d = tempfile.mkdtemp(prefix="sis_stateful_ckpt_")
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # partial state would silently pass the shape checks — fail loud
        # on timeout instead of reading a half-folded table
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("events_user_stats stream did not finish in 600s")
    finally:
        # the memory sink holds the results in the session; the staged
        # source and checkpoint are only needed while the stream runs
        shutil.rmtree(d, ignore_errors=True)
    updates = spark.table(name)
    # n_events is strictly increasing per user across its update rows, so
    # max_by picks the final state deterministically.
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("sum_value", "n_events"), 6).alias("sum_value"),
    )


def sql_events_user_stats() -> str:
    return """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# training-pipeline structural ops: split / quota / scrub / chunk / pack /
# decontaminate / tf-idf

SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
SPLIT_SEED = 42
CAP_PER_SOURCE = 10
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
PACK_TARGET = 256
DECONTAM_N = 4
DECONTAM_EVAL_MOD = 97
TFIDF_K = 3
BM25_QUERY_TERMS = ["spark", "shuffle", "join", "window"]
BM25_K = 10
TFIDF_PAIR_THRESHOLD = 0.5
TFIDF_PAIR_MAX_DF = 200
BIGVOL_QTY = 300
WIDGET_QTY = 60
MKT_REGION = "ASIA"
MKT_SUPP_NATION = "NATION_2"
MKT_PART_TYPE = "PROMO"
HLL_P = 9
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_SEED = 101
CMS_PROBES = ["the", "spark", "join", "window", "batch", "scan", "stream", "zz_absent_zz"]
PMI_K = 30
PMI_MIN_COUNT = 5
LR_FEATURES = ["x0", "x1", "x2"]
LR_ITERS = 2
FUNNEL_STAGES = ["view", "click", "purchase"]
WSAMPLE_N = 50
WSAMPLE_SEED = 17
PAGERANK_ITERS = 2
PAGERANK_DAMPING = 0.85
JOURNEY_GAP_S = 43200
JOURNEY_K = 10


def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (train/val/test) — reported as counts per
    (split, lang) so the oracle compares the full assignment compactly."""
    from spark_ifs_spark.operators.sampling import split_assign

    docs = _read(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id", SPLIT_WEIGHTS, seed=SPLIT_SEED)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def sql_split_counts() -> str:
    from spark_ifs_spark.operators.sampling import sql_split_case

    case = sql_split_case("doc_id", SPLIT_WEIGHTS, SPLIT_SEED)
    return f"""
SELECT {case} AS split, lang, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def q_docs_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: keep the CAP_PER_SOURCE longest docs per source
    (skew-safe two-stage salted window)."""
    from spark_ifs_spark.operators.sampling import cap_per_key

    docs = _read(spark, sf_dir, "documents")
    return cap_per_key(
        docs,
        key_cols=["source"],
        order_col="n_chars",
        cap=CAP_PER_SOURCE,
        tiebreak_cols=["doc_id"],
        descending=True,
    ).select("source", "doc_id", "n_chars", "rank")


def sql_docs_cap_per_source() -> str:
    return f"""
SELECT source, doc_id, n_chars, rank
FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT) AS rank
  FROM documents
)
WHERE rank <= {CAP_PER_SOURCE}
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministic synthetic PII appended
    (the corpus generator emits none), so the redaction path is actually
    exercised: one email and one 10-digit ref per doc."""
    from spark_ifs_spark.operators.textstats import scrub_pii

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com ref "),
            F.col("doc_id") + F.lit(1_000_000_000),
        ).alias("text"),
    )
    out = scrub_pii(docs, "doc_id", "text")
    return out.select(
        "id", F.md5("clean_text").alias("clean_md5"), "n_emails", "n_long_nums"
    )


def sql_scrub_pii() -> str:
    # keep the regexes textually identical to textstats.PII_*_RE
    from spark_ifs_spark.operators.textstats import PII_EMAIL_RE, PII_LONG_NUM_RE

    email = PII_EMAIL_RE.replace("'", "''")
    num = PII_LONG_NUM_RE
    return f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com ref ' || (doc_id + 1000000000) AS text
  FROM documents
), after_email AS (
  SELECT doc_id, text,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM injected
)
SELECT doc_id AS id,
       md5(regexp_replace(t1, '{num}', '<NUM>', 'g')) AS clean_md5,
       CAST(len(regexp_extract_all(text, '{email}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{num}')) AS INT) AS n_long_nums
FROM after_email
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (map-side array expression)."""
    from spark_ifs_spark.operators.chunking import chunk_documents

    docs = _read(spark, sf_dir, "documents")
    out = chunk_documents(docs, "doc_id", "text", CHUNK_TOKENS, CHUNK_OVERLAP)
    return out.select("id", "chunk_idx", "n_tokens", F.md5("chunk").alias("chunk_md5"))


def sql_doc_chunks() -> str:
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id AS id,
       CAST(s.i AS INT) AS chunk_idx,
       CAST(len(t[s.i * {stride} + 1 : s.i * {stride} + {CHUNK_TOKENS}]) AS INT) AS n_tokens,
       md5(array_to_string(t[s.i * {stride} + 1 : s.i * {stride} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM toks, LATERAL (SELECT unnest(generate_series(0, (len(t) - 1) // {stride})) AS i) s
"""


def q_packed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval sequence packing of the chunks into ~PACK_TARGET-token
    bins per language partition; reported per (lang, bin)."""
    from spark_ifs_spark.operators.chunking import chunk_documents, pack_chunks

    docs = _read(spark, sf_dir, "documents")
    # lang rides through the map-side chunker (carry_cols) — joining a
    # per-row attribute back onto the chunk relation would shuffle the
    # whole corpus at scale
    chunks = chunk_documents(
        docs, "doc_id", "text", CHUNK_TOKENS, CHUNK_OVERLAP, carry_cols=["lang"]
    )
    packed = pack_chunks(
        chunks,
        partition_cols=["lang"],
        size_col="n_tokens",
        target_tokens=PACK_TARGET,
        order_cols=["id", "chunk_idx"],
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("sum_tokens")
    )


def sql_packed_bins() -> str:
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
), chunks AS (
  SELECT doc_id AS id, lang, s.i AS chunk_idx,
         len(t[s.i * {stride} + 1 : s.i * {stride} + {CHUNK_TOKENS}]) AS n_tokens
  FROM toks, LATERAL (SELECT unnest(generate_series(0, (len(t) - 1) // {stride})) AS i) s
), packed AS (
  SELECT lang, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {PACK_TARGET}) AS BIGINT) AS bin_id
  FROM chunks
)
SELECT lang, bin_id, count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM packed
GROUP BY 1, 2
"""


def q_decontam_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 word 4-gram with
    the held-out eval subset (doc_id % 97 == 0)."""
    docs = _read(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
    return dedup.contaminated_ids(corpus, eval_set, "doc_id", "text", n=DECONTAM_N)


def sql_decontam_ids() -> str:
    n = DECONTAM_N
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, array_to_string(t[s.i + 1 : s.i + {n}], ' ') AS sh
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - {n})) AS i) s
  WHERE len(t) >= {n}
)
SELECT DISTINCT c.doc_id AS id
FROM sh c
WHERE c.doc_id % {DECONTAM_EVAL_MOD} != 0
  AND EXISTS (
    SELECT 1 FROM sh e
    WHERE e.doc_id % {DECONTAM_EVAL_MOD} = 0 AND e.sh = c.sh
  )
"""


def q_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per document (rank by exact score, THEN round —
    the registry's float-determinism convention)."""
    from spark_ifs_spark.operators.textstats import tfidf_top_terms

    docs = _read(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=TFIDF_K)
    return out.select("id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")


def sql_tfidf_top3() -> str:
    return f"""
WITH tf AS (
  SELECT doc_id AS id, w.term, count(*) AS tf
  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) w
  GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.id, tf.term, tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT id, term, round(tfidf, 6) AS tfidf, rank
FROM (
  SELECT id, term, tfidf,
         CAST(row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term) AS INT) AS rank
  FROM scored
)
WHERE rank <= {TFIDF_K}
"""


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length quantiles (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the same linear-interpolation
    definition — verified value-identical). Scale note: swap in
    ``approx_percentile(col, ..., accuracy)`` past the point where exact
    per-group sort-aggregation is worth it; the plan shape (one grouped
    aggregate) is unchanged."""
    docs = _read(spark, sf_dir, "documents")
    q = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))").alias("q"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return q.select(
        "lang",
        "n_docs",
        F.round(F.col("q")[0], 6).alias("p50"),
        F.round(F.col("q")[1], 6).alias("p90"),
        F.round(F.col("q")[2], 6).alias("p99"),
    )


def sql_doc_length_quantiles() -> str:
    return """
SELECT lang,
       count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents
GROUP BY lang
"""


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration over the embeddings (cosine assignment to the
    IVF seed centroids): per-(cell, dim) population and updated mean."""
    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.kmeans_step(emb, "vec_id", "embedding", IVF_CENTROIDS)
    return out.select("cell", "dim", "n", F.round("mean", 6).alias("mean"))


def sql_kmeans_step() -> str:
    dot = (
        "sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE)) / "
        "(sqrt(sum(CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))) * "
        "sqrt(sum(CAST(c.ce[i + 1] AS DOUBLE) * CAST(c.ce[i + 1] AS DOUBLE))))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
vc AS (
  SELECT e.vec_id AS id, c.cid, {dot} AS cos
  FROM embeddings e CROSS JOIN cents c CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM vc
  ) WHERE rn = 1
)
SELECT a.cell,
       CAST(t.i AS INT) AS dim,
       count(*) AS n,
       round(avg(CAST(e.embedding[i + 1] AS DOUBLE)), 6) AS mean
FROM embeddings e
JOIN assign a ON a.id = e.vec_id
CROSS JOIN range({EMB_DIMS}) t(i)
GROUP BY 1, 2
"""


#: per-source char budgets for the mixture query — staggered so some
#: sources are downsampled and some kept whole at every test sf
MIX_TARGETS = {f"src{i}": 1500 + 1500 * (i % 3) for i in range(20)}
MIX_SEED = 7


def q_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture: downsample every source to its char
    budget, report kept (docs, chars) per source."""
    from spark_ifs_spark.operators.sampling import weighted_mix

    docs = _read(spark, sf_dir, "documents")
    kept = weighted_mix(docs, "doc_id", "source", "n_chars", MIX_TARGETS, MIX_SEED)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


def sql_mix_by_source() -> str:
    from spark_ifs_spark.operators.sampling import SPLIT_BUCKETS, sql_split_bucket

    vals = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGETS.items())
    bucket = sql_split_bucket("d.doc_id", MIX_SEED)
    return f"""
WITH tgt(source, target) AS (VALUES {vals}),
tot AS (SELECT source, sum(n_chars) AS total FROM documents GROUP BY source),
kept AS (
  SELECT d.source, d.n_chars
  FROM documents d JOIN tot USING (source) JOIN tgt USING (source)
  WHERE tot.total <= tgt.target
     OR {bucket} * tot.total < tgt.target * {SPLIT_BUCKETS}
)
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM kept GROUP BY source
"""


def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle X^T X over quantized embeddings (quantization makes
    the float sums bit-stable across engines — same ``floor(x*8)``
    convention as the selectors)."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr("transform(embedding, x -> floor(x * 8) / 8)").alias("qe")
    )
    return similarity.gram_matrix(q, "qe", EMB_DIMS).select(
        "i", "j", F.round("g", 6).alias("g")
    )


def sql_embedding_gram() -> str:
    return f"""
SELECT CAST(i.i AS INT) AS i, CAST(j.j AS INT) AS j,
       round(sum((floor(e.embedding[i.i + 1] * 8) / 8) * (floor(e.embedding[j.j + 1] * 8) / 8)), 6) AS g
FROM embeddings e, range({EMB_DIMS}) i(i), range({EMB_DIMS}) j(j)
WHERE i.i <= j.j
GROUP BY 1, 2
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment. Three-table join with filters on every side — all three
    predicates push to the parquet scans; customer⋈orders and
    ⋈lineitem shuffle on their keys (big-big → sort-merge, AQE
    re-plans); the top-10 is TakeOrdered, never a global sort."""
    cust = _read(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def sql_shipping_priority() -> str:
    return """
SELECT o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-01-01'
  AND l.l_shipdate > DATE '1998-01-01'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    date window. The big-big joins shuffle on their keys; the 25-row
    nation dim broadcasts."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def sql_returned_revenue() -> str:
    return """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def q_pca_power_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PCA power-iteration step y = X^T(Xv) over quantized
    embeddings with v = (1/8, …, 1/8) — dyadic inputs keep every product
    and sum exact in IEEE-754, so both engines agree bit-for-bit."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr("transform(embedding, x -> floor(x * 8) / 8)").alias("qe")
    )
    out = similarity.power_iteration_step(q, "qe", EMB_DIMS, [0.125] * EMB_DIMS)
    return out.select("dim", F.round("y", 6).alias("y"))


def sql_pca_power_step() -> str:
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x * 8) / 8) AS qe
  FROM embeddings
),
d AS (SELECT vec_id, qe, 0.125 * list_sum(qe) AS dot FROM q)
SELECT CAST(i.i AS INT) AS dim, round(sum(d.qe[i.i + 1] * d.dot), 6) AS y
FROM d, range({EMB_DIMS}) i(i)
GROUP BY 1
"""


def q_bpe_pairs_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training counting round: top-50 adjacent token pairs."""
    from spark_ifs_spark.operators.textstats import adjacent_pair_counts

    docs = _read(spark, sf_dir, "documents")
    return adjacent_pair_counts(docs, "text", top_n=50)


def sql_bpe_pairs_top50() -> str:
    return """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
)
SELECT pair, count(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC LIMIT 50
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters: connected components over the minhash-LSH pair
    graph (min-id label). The step that turns pairwise near-dup output
    into "keep one per cluster"."""
    from spark_ifs_spark.operators.graph import connected_components

    docs = _read(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )


def sql_dup_clusters() -> str:
    """Transitive closure via recursive CTE over the same pair relation
    (exact at oracle scale; the Spark side is the O(log n) iterative
    form that survives corpus scale)."""
    return f"""
WITH RECURSIVE pairs AS (
  {sql_dedup_minhash()}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
walk(node, reach) AS (
  SELECT a, b FROM edges
  UNION
  SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
)
SELECT node AS doc_id, least(node, min(reach)) AS cluster
FROM walk GROUP BY node
"""


# ---------------------------------------------------------------------------
# registry

def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: documents with ``doc_id % 10 == 0``
    play the newly-ingested batch, the rest the existing corpus; only
    new×corpus band collisions are verified — the corpus is never
    self-joined (``dedup.minhash_lsh_pairs_against``)."""
    docs = _read(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    out = dedup.minhash_lsh_pairs_against(
        new, corpus, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def sql_dedup_incremental() -> str:
    params = minhash_params(MINHASH_HASHES)
    hash_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    rpb = MINHASH_ROWS_PER_BAND
    powers = ", ".join(f"({j}, {sql_band_power(j)})" for j in range(rpb))
    return f"""
WITH {_SQL_SHINGLES},
shi AS (SELECT id, {sql_md5_int60('sh')} AS x FROM sh),
hp(i, a, b) AS (VALUES {hash_rows}),
pw(j, p) AS (VALUES {powers}),
sig AS (
  SELECT shi.id, hp.i, min((hp.a * (shi.x % {MINHASH_P}) + hp.b) % {MINHASH_P}) AS minh
  FROM shi CROSS JOIN hp
  GROUP BY 1, 2
),
bands AS (
  SELECT id, CAST(floor(i * 1.0 / {rpb}) AS INT) AS band,
         sum((minh * pw.p) % {MINHASH_P}) % {MINHASH_P} AS bkey
  FROM sig JOIN pw ON pw.j = i % {rpb}
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.id % 10 = 0 AND b.id % 10 <> 0
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT cand.id_a, cand.id_b, count(*) AS i
  FROM cand
  JOIN sh x ON x.id = cand.id_a
  JOIN sh y ON y.id = cand.id_b AND y.sh = x.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= {JACCARD_THRESHOLD}
"""


def q_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data pipeline composed end to end, the way
    a real job chains the operators: quality/exact-dup clean
    (``corpus_clean``) ∩ minhash-LSH near-dup *representatives only*
    (``dup_clusters`` + keep-min) → deterministic train/val/test split
    → per-split document and token budgets. One extra shuffle per
    stage boundary; every stage's own plan is the one audited under its
    individual query."""
    clean = q_corpus_clean(spark, sf_dir).select("id")
    clusters = q_dup_clusters(spark, sf_dir)
    reps = clusters.groupBy("cluster").agg(F.min("doc_id").alias("keep_id"))
    losers = (
        clusters.join(reps, "cluster")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    kept = clean.join(
        losers, clean["id"] == losers["doc_id"], "left_anti"
    )
    docs = _read(spark, sf_dir, "documents")
    toks = textstats.token_counts(docs, "doc_id", "text").select(
        "id", "n_ws_tokens"
    )
    from spark_ifs_spark.operators.sampling import split_assign

    assigned = split_assign(
        kept.join(toks, "id"), "id", SPLIT_WEIGHTS, seed=SPLIT_SEED
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws_tokens").alias("n_tokens"),
    )


def sql_pipeline_end_to_end() -> str:
    from spark_ifs_spark.operators.sampling import sql_split_case

    case = sql_split_case("k.id", SPLIT_WEIGHTS, SPLIT_SEED)
    return f"""
WITH clean AS (SELECT id FROM ({sql_corpus_clean()}) t),
clusters AS (SELECT * FROM ({sql_dup_clusters()}) t),
reps AS (SELECT cluster, min(doc_id) AS keep_id FROM clusters GROUP BY cluster),
losers AS (
  SELECT c.doc_id FROM clusters c JOIN reps r ON c.cluster = r.cluster
  WHERE c.doc_id <> r.keep_id
),
kept AS (
  SELECT id FROM clean
  WHERE id NOT IN (SELECT doc_id FROM losers)
),
toks AS (
  SELECT doc_id AS id, len(string_split(text, ' ')) AS n_ws_tokens
  FROM documents
)
SELECT {case} AS split,
       count(*) AS n_docs,
       CAST(sum(t.n_ws_tokens) AS BIGINT) AS n_tokens
FROM kept k JOIN toks t ON k.id = t.id
GROUP BY 1
"""


def q_pipeline_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level lineage for :func:`q_pipeline_end_to_end` — the
    audit trail a real pretraining pipeline publishes next to its output:
    one row per stage ``(stage, n_in, n_out, n_dropped)``, where
    ``01_clean`` and ``02_dedup`` record their drop counts and each
    ``03_split:*`` fans the surviving documents out (dropping nothing).
    Every count is a scalar aggregate (one row each); the final report
    assembles them with cross joins of 1-row relations + a union — no
    driver-side arithmetic, so the audit runs inside the same job as the
    pipeline would at 100 TB."""
    docs = _read(spark, sf_dir, "documents")
    clean = q_corpus_clean(spark, sf_dir).select("id")
    clusters = q_dup_clusters(spark, sf_dir)
    reps = clusters.groupBy("cluster").agg(F.min("doc_id").alias("keep_id"))
    losers = (
        clusters.join(reps, "cluster")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    kept = clean.join(losers, clean["id"] == losers["doc_id"], "left_anti")

    from spark_ifs_spark.operators.sampling import split_assign

    tot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    ncl = clean.agg(F.count(F.lit(1)).alias("n_clean"))
    nk = kept.agg(F.count(F.lit(1)).alias("n_kept"))
    scalars = tot.crossJoin(ncl).crossJoin(nk)
    stage_clean = scalars.select(
        F.lit("01_clean").alias("stage"),
        F.col("n_total").alias("n_in"),
        F.col("n_clean").alias("n_out"),
        (F.col("n_total") - F.col("n_clean")).alias("n_dropped"),
    )
    stage_dedup = scalars.select(
        F.lit("02_dedup").alias("stage"),
        F.col("n_clean").alias("n_in"),
        F.col("n_kept").alias("n_out"),
        (F.col("n_clean") - F.col("n_kept")).alias("n_dropped"),
    )
    splits = (
        split_assign(kept, "id", SPLIT_WEIGHTS, seed=SPLIT_SEED)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_out"))
        .crossJoin(nk)
        .select(
            F.concat(F.lit("03_split:"), F.col("split")).alias("stage"),
            F.col("n_kept").alias("n_in"),
            "n_out",
            F.lit(0).cast("long").alias("n_dropped"),
        )
    )
    return stage_clean.unionAll(stage_dedup).unionAll(splits)


def sql_pipeline_audit() -> str:
    from spark_ifs_spark.operators.sampling import sql_split_case

    case = sql_split_case("k.id", SPLIT_WEIGHTS, SPLIT_SEED)
    return f"""
WITH clean AS (SELECT id FROM ({sql_corpus_clean()}) t),
clusters AS (SELECT * FROM ({sql_dup_clusters()}) t),
reps AS (SELECT cluster, min(doc_id) AS keep_id FROM clusters GROUP BY cluster),
losers AS (
  SELECT c.doc_id FROM clusters c JOIN reps r ON c.cluster = r.cluster
  WHERE c.doc_id <> r.keep_id
),
kept AS (
  SELECT id FROM clean
  WHERE id NOT IN (SELECT doc_id FROM losers)
),
tot AS (SELECT count(*) AS n_total FROM documents),
ncl AS (SELECT count(*) AS n_clean FROM clean),
nk AS (SELECT count(*) AS n_kept FROM kept),
sp AS (SELECT {case} AS split, count(*) AS n_out FROM kept k GROUP BY 1)
SELECT '01_clean' AS stage, n_total AS n_in, n_clean AS n_out,
       n_total - n_clean AS n_dropped
FROM tot, ncl
UNION ALL
SELECT '02_dedup', n_clean, n_kept, n_clean - n_kept FROM ncl, nk
UNION ALL
SELECT '03_split:' || split, n_kept, n_out, CAST(0 AS BIGINT) FROM sp, nk
"""


#: span width for the span-level exact-dedup query
SPAN_WORDS = 8


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style repeated-span removal: every non-first
    occurrence of an 8-word span is cut corpus-wide and documents are
    reassembled from their surviving spans (emptied docs drop)."""
    docs = _read(spark, sf_dir, "documents")
    return dedup.span_dedup(docs, "doc_id", "text", span_words=SPAN_WORDS)


def sql_dedup_spans() -> str:
    w = SPAN_WORDS
    span_of = f"array_to_string(t[(CAST(u.i AS INT)*{w}+1):(CAST(u.i AS INT)*{w}+{w})], ' ')"
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
spans AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos,
         {sql_md5_int60(span_of)} AS h
  FROM toks, unnest(generate_series(0, CAST(ceil(len(t) / {w}.0) AS BIGINT) - 1)) AS u(i)
),
win AS (SELECT h, min([doc_id, CAST(pos AS BIGINT)]) AS wnr FROM spans GROUP BY h),
kp AS (
  SELECT wnr[1] AS doc_id, list_sort(list(CAST(wnr[2] AS INT))) AS kp
  FROM win GROUP BY 1
)
SELECT t.doc_id,
       array_to_string(
         list_transform(kp.kp, p -> array_to_string(t.t[(p*{w}+1):(p*{w}+{w})], ' ')),
         ' ') AS text
FROM toks t JOIN kp ON t.doc_id = kp.doc_id
"""


def q_pca_power_iter2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unnormalized power-iteration steps y = (X^T X)^2 v0 over
    quantized embeddings — the iterated form of ``pca_power_step``
    driven through :func:`similarity.power_iteration` (driver holds only
    the length-d iterate). Dyadic inputs keep every term exact in
    IEEE-754, so skipping the sqrt normalization lets both engines agree
    bit-for-bit across BOTH corpus passes."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr("transform(embedding, x -> floor(x * 8) / 8)").alias("qe")
    )
    y = similarity.power_iteration(
        q, "qe", EMB_DIMS, v0=[0.125] * EMB_DIMS, iters=2, normalize=False
    )
    return spark.createDataFrame(
        [(i, round(val, 6)) for i, val in enumerate(y)], "dim int, y double"
    )


def sql_pca_power_iter2() -> str:
    return f"""
WITH q AS (
  SELECT list_transform(embedding, x -> floor(x * 8) / 8) AS qe
  FROM embeddings
),
d1 AS (SELECT qe, 0.125 * list_sum(qe) AS dot FROM q),
y1 AS (
  SELECT CAST(i.i AS INT) AS dim, sum(qe[i.i + 1] * dot) AS y
  FROM d1, range({EMB_DIMS}) i(i) GROUP BY 1
),
v1 AS (SELECT list(y ORDER BY dim) AS v FROM y1),
d2 AS (
  SELECT qe,
         list_sum(list_transform(generate_series(1, {EMB_DIMS}), j -> qe[j] * v[j])) AS dot
  FROM q, v1
)
SELECT CAST(i.i AS INT) AS dim, round(sum(qe[i.i + 1] * dot), 6) AS y
FROM d2, range({EMB_DIMS}) i(i)
GROUP BY 1
"""


#: merge rounds for the BPE-training query
BPE_MERGES = 5


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer training, 5 merge rounds: corpus folded to a
    word-frequency table once, merges learned over the vocabulary
    relation (see ``operators/bpe.py``)."""
    from spark_ifs_spark.operators import bpe

    docs = _read(spark, sf_dir, "documents")
    return bpe.bpe_train(docs, "text", BPE_MERGES)


def _sql_bpe_round(r: int) -> str:
    """One unrolled BPE merge round: weighted pair counts → argbest →
    run-parity merge (≡ the sequential left-to-right fold; candidates
    can only be consecutive when x == y, and within such a run exactly
    the even offsets merge)."""
    i = "CAST(u.i AS INT)"
    return f"""
pairs{r} AS (
  SELECT s[{i}] AS x, s[{i} + 1] AS y, sum(c) AS n
  FROM syms{r}, unnest(generate_series(1, len(s) - 1)) AS u(i)
  GROUP BY 1, 2
),
win{r} AS (SELECT x, y, n FROM pairs{r} ORDER BY n DESC, x ASC, y ASC LIMIT 1),
pos{r} AS (
  SELECT w, c, s, {i} AS pos,
         ({i} < len(s)
          AND s[{i}] = (SELECT x FROM win{r})
          AND s[{i} + 1] = (SELECT y FROM win{r})) AS cand
  FROM syms{r}, unnest(generate_series(1, len(s))) AS u(i)
),
rs{r} AS (
  SELECT *, max(CASE WHEN NOT cand THEN pos END)
              OVER (PARTITION BY w ORDER BY pos) AS last_nc
  FROM pos{r}
),
m{r} AS (
  SELECT *, cand AND ((pos - coalesce(last_nc, 0) - 1) % 2 = 0) AS merged
  FROM rs{r}
),
k{r} AS (
  SELECT w, c, pos,
         CASE WHEN merged THEN s[pos] || s[pos + 1] ELSE s[pos] END AS sym,
         coalesce(lag(merged) OVER (PARTITION BY w ORDER BY pos), false) AS absorbed
  FROM m{r}
),
syms{r + 1} AS (
  SELECT w, any_value(c) AS c, list(sym ORDER BY pos) AS s
  FROM k{r} WHERE NOT absorbed GROUP BY w
)"""


def sql_bpe_train() -> str:
    rounds = ",".join(_sql_bpe_round(r) for r in range(BPE_MERGES))
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rank, x, y, CAST(n AS BIGINT) AS n FROM win{r}"
        for r in range(BPE_MERGES)
    )
    return f"""
WITH words AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
syms0 AS (SELECT w, c, string_split(w, '') AS s FROM words),
{rounds}
{finals}
"""


def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shape: distinct suppliers per part brand/size, excluding a
    blocklisted supplier set via ANTI-join (`NOT IN` with non-null keys
    ≡ left-anti). Plan: the blocklist aggregates to a handful of rows
    and broadcasts; the distinct-count is a two-level hash aggregate on
    (brand, size, suppkey) — no sort. Brands ~25, so the final key
    space is tiny regardless of lineitem volume."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    supp = _read(spark, sf_dir, "supplier")
    blocked = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(blocked), li["l_suppkey"] == blocked["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


def sql_supplier_diversity() -> str:
    return """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


def q_events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-7-day user activity (count + value sum) — the
    time-range window frame (``RANGE BETWEEN``) every feature-store
    backfill needs. The frame is keyed on ``unix_micros(ts)`` so both
    engines use the identical numeric range; one shuffle on user_id.
    Scale note: a pathologically hot user serializes its partition —
    beyond that, split the frame into (tumbling-window partial sums) +
    (per-event tail correction), which trades one window for two
    bounded aggregations."""
    from pyspark.sql import Window

    from spark_ifs_spark.functions.timeutil import epoch_us

    ev = _read(spark, sf_dir, "events")
    us = epoch_us(ev, "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 6).alias("sum_7d"),
    )


def sql_events_rolling_7d() -> str:
    return """
SELECT event_id, user_id,
       count(*) OVER w AS n_7d,
       round(sum(value) OVER w, 6) AS sum_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
)
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution pairs within 30 minutes per user — the
    batch body of the stream-stream interval join
    (``streaming/events.py:attribute_events``); streaming parity is
    pinned in ``tests/test_streaming.py``."""
    from spark_ifs_spark.streaming.events import attribute_events

    ev = _read(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    return attribute_events(views, clicks, horizon="30 minutes")


def sql_events_attribution() -> str:
    return """
SELECT v.user_id,
       v.event_id AS lead_id,
       c.event_id AS follow_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
"""


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply side of BPE: train 5 merges, then tokenize the corpus
    with them — per-document token counts. Merges are applied once per
    distinct word (vocabulary relation), not per occurrence."""
    from spark_ifs_spark.operators import bpe

    docs = _read(spark, sf_dir, "documents")
    merges = [
        (r["x"], r["y"])
        for r in bpe.bpe_train(docs, "text", BPE_MERGES)
        .orderBy("rank")
        .collect()
    ]
    return bpe.bpe_encode(docs, "doc_id", "text", merges).select(
        F.col("id").alias("doc_id"), "n_tokens"
    )


def sql_bpe_token_counts() -> str:
    rounds = ",".join(_sql_bpe_round(r) for r in range(BPE_MERGES))
    return f"""
WITH words AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
syms0 AS (SELECT w, c, string_split(w, '') AS s FROM words),
{rounds},
wtok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT t.doc_id, CAST(sum(len(v.s)) AS BIGINT) AS n_tokens
FROM wtok t JOIN syms{BPE_MERGES} v ON t.w = v.w
WHERE t.w <> ''
GROUP BY t.doc_id
"""


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped volume between a nation pair by year.
    Plan: the big lineitem/orders join shuffles on orderkey; supplier,
    customer and (twice) the 25-row nation dim broadcast; the date
    filter pushes to the lineitem scan; year() folds into the
    aggregate key."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    nation = _read(spark, sf_dir, "nation")
    sup = (
        _read(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _read(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def sql_nation_trade_volume() -> str:
    return """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/
    quantity brackets. Plan: part broadcasts, the OR-of-ANDs predicate
    evaluates inside one codegen stage after the join, and the whole
    query folds to a single scalar aggregate — one scan of lineitem."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    bracket = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(bracket).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def sql_bracket_revenue() -> str:
    return """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 40)
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over a
    quarter. The 'revenue view' aggregates once; the max is a scalar
    aggregate broadcast back as an equi-filter — NOT a global-sort
    window, which would funnel every supplier through one task at
    scale. Revenue is rounded before the max compare so tie resolution
    is engine-portable."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    sup = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["max_rev"])
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def sql_top_supplier() -> str:
    return """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def q_order_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation over a big-big join —
    per return flag, how many lines belong to urgent-ish vs other
    orders. Plan: the date filter pushes to the lineitem scan, the join
    shuffles on orderkey (sort-merge; AQE re-plans if one side
    collapses), and the CASE counts fold into ONE hash aggregate over a
    3-row key space — never two joins or two passes."""
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1997-01-01"
    )
    orders = _read(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def sql_order_priority_mix() -> str:
    return """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01'
GROUP BY l_returnflag
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — a CASE ratio reduced
    to a single row. Plan: the month filter pushes to the lineitem
    scan; part is a dimension (broadcast under AQE sizing); both sums
    come out of ONE aggregate, and the division happens on the two
    final scalars — no second pass, no self-join."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
    )
    part = _read(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


def sql_promo_revenue() -> str:
    return """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-02-01'
"""


def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in below-average-quantity lines —
    the correlated-scalar-subquery pattern. Plan: Catalyst's rewrite is
    expressed directly — the per-part average is ONE aggregate over the
    (cardinality-bounded) part key space joined back to lineitem; at
    dimension-sized part counts AQE broadcasts it, so lineitem is
    scanned once and never shuffled twice. The threshold comparison is
    computed identically on both engines (exact integer sums under
    double arithmetic), so the boundary cannot drift."""
    li = _read(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def sql_small_order_revenue() -> str:
    return """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
) t USING (l_partkey)
WHERE l.l_quantity < t.threshold
"""


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no URGENT order — a
    scalar-aggregate threshold plus an anti-join against a filtered
    subquery (the priority filter pushes to the orders scan and keeps
    the result non-degenerate on the synthetic data, where every
    customer has *some* order). Plan: the global average is a 1-row
    aggregate broadcast into the filter (Spark's scalar-subquery
    execution, written as a crossJoin of a 1-row frame); the NOT
    EXISTS is a left-anti shuffle join on custkey (big-big safe); the
    final rollup keys on nationkey — bounded."""
    cust = _read(spark, sf_dir, "customer")
    urgent = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def sql_idle_customers() -> str:
    return """
SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


def q_lm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM scoring (the CCNet/Gopher "perplexity
    filter" signal) — see :func:`~spark_ifs_spark.operators.textstats.
    bigram_logprob` for the integer-micronat determinism contract and
    plan shape."""
    docs = _read(spark, sf_dir, "documents")
    return textstats.bigram_logprob(docs, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def sql_lm_bigram_logprob() -> str:
    return """
WITH occ AS (
  SELECT doc_id, t[s.i + 1] || ' ' || t[s.i + 2] AS pair
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(generate_series(0, len(t) - 2)) AS i) s
  WHERE len(t) >= 2
), per_doc AS (
  SELECT doc_id, pair, count(*) AS k FROM occ GROUP BY 1, 2
), pair_counts AS (
  SELECT pair, CAST(sum(k) AS BIGINT) AS c_pair FROM per_doc GROUP BY pair
), left_counts AS (
  SELECT split_part(pair, ' ', 1) AS l, CAST(sum(c_pair) AS BIGINT) AS c_left
  FROM pair_counts GROUP BY 1
), model AS (
  SELECT pair, CAST(floor(ln(c_pair * 1.0 / c_left) * 1e6) AS BIGINT) AS t
  FROM pair_counts JOIN left_counts ON split_part(pair, ' ', 1) = l
)
SELECT per_doc.doc_id,
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       CAST(sum(k * t) AS BIGINT) AS ll_micronats
FROM per_doc JOIN model USING (pair)
GROUP BY per_doc.doc_id
"""


def q_events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: each user's most recent event — see
    :func:`~spark_ifs_spark.operators.topk.compact_latest` for why this
    is one map-combined aggregate and not a window sort."""
    from spark_ifs_spark.functions.timeutil import epoch_us
    from spark_ifs_spark.operators.topk import compact_latest

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    out = compact_latest(ev, ["user_id"], "ts", tiebreak_cols=["event_id"])
    return out.select(
        "user_id",
        "event_id",
        epoch_us(out, "ts").alias("ts_us"),
        "event_type",
        F.round("value", 6).alias("value"),
    )


def sql_events_latest_state() -> str:
    return """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
       round(value, 6) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
)
WHERE rn = 1
"""


def q_events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized value sums — see :func:`~spark_ifs_spark.
    operators.textstats.winsorize_by_key` (bounded quantile aggregate
    broadcast back; corpus never shuffles)."""
    from spark_ifs_spark.operators.textstats import winsorize_by_key

    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    w = winsorize_by_key(ev, "event_type", "value", 0.01, 0.99)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value_clipped"), 4).alias("sum_clipped"),
    )


def sql_events_winsorized() -> str:
    return """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS qlo,
         quantile_cont(value, 0.99) AS qhi
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       round(sum(least(greatest(e.value, q.qlo), q.qhi)), 4) AS sum_clipped
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type
"""


def q_docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the documents table in ONE aggregate
    expression: per column — null count, distinct count, and (numeric)
    min/max. The ingest-gate report a pipeline runs before admitting a
    shard. Plan shape, honestly: the five exact ``countDistinct`` columns
    compile to Catalyst's Expand-based multi-distinct (each input row is
    replicated ~6× and shuffled on the distinct keys), so this is one
    scan but NOT a purely map-side fold. That is the price of exact
    distinct counts the DuckDB oracle can reproduce; at 100 TB swap each
    ``countDistinct`` for ``approx_count_distinct`` (HLL++ sketches fold
    map-side, collapsing the plan to a single partial aggregate — same
    swap documented for dedup digests)."""
    docs = _read(spark, sf_dir, "documents")
    aggs = []
    for c in ["doc_id", "text", "lang", "source", "n_chars"]:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
        ]
    aggs += [
        F.min("n_chars").alias("n_chars_min"),
        F.max("n_chars").alias("n_chars_max"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    return docs.agg(*aggs)


def sql_docs_profile() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    parts = []
    for c in cols:
        parts.append(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}_nulls"
        )
        parts.append(f"count(DISTINCT {c}) AS {c}_distinct")
    parts += [
        "min(n_chars) AS n_chars_min",
        "max(n_chars) AS n_chars_max",
        "count(*) AS n_rows",
    ]
    return "SELECT " + ", ".join(parts) + " FROM documents"


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between the documents table and a derived "next
    version" (drop ``id % 7 == 0``, rewrite ``id % 11 == 0``, append
    re-keyed copies) — one full-outer digest join; see
    :func:`~spark_ifs_spark.operators.dedup.corpus_diff`. Reported as
    bounded per-status counts."""
    from spark_ifs_spark.operators.textstats import fingerprint

    docs = _read(spark, sf_dir, "documents")
    old = fingerprint(docs, "doc_id", "text")
    edited = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # ordered limit → TakeOrdered: deterministic, unlike a bare limit
    appended = (
        docs.orderBy("doc_id")
        .limit(50)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    new = fingerprint(edited.unionByName(appended), "doc_id", "text")
    # fingerprint() aliases the id column to "id"
    return (
        dedup.corpus_diff(old, new, "id", "fp")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_corpus_diff() -> str:
    return """
WITH fp AS (
  SELECT doc_id AS id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         text
  FROM documents
), new_docs AS (
  SELECT id, CASE WHEN id % 11 = 0 THEN text || ' v2' ELSE text END AS text
  FROM fp WHERE id % 7 != 0
  UNION ALL
  SELECT id + 10000000 AS id, text
  FROM (SELECT id, text FROM fp ORDER BY id LIMIT 50)
), new_fp AS (
  SELECT id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM new_docs
)
SELECT CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*) AS n
FROM fp o FULL OUTER JOIN new_fp n USING (id)
GROUP BY 1
"""


def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column with
    an EXPLICIT schema (``from_json`` — schema inference over a 100 TB
    JSON column is a second full scan, same rule as the JSONL source)
    and aggregate on the extracted field. The parse is a scan-fused
    projection; the aggregate keys on event_type — bounded."""
    ev = _read(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high"),
        )
    )


def sql_events_props_json() -> str:
    return """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events GROUP BY event_type
"""


def q_unconverted_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-interval join: views with NO same-user click inside the
    30-minute horizon — attribution's complement (the funnel-drop
    report). Plan: left-anti join with an equi key (user) plus the
    event-time range condition; Spark executes the equi part as a
    hash/sort-merge anti join and evaluates the range residual per
    matched key group — never a cartesian. Rolled up per user, bounded
    output."""
    ev = _read(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    unconv = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") < F.col("v_ts") + F.expr("INTERVAL 30 minutes")),
        "left_anti",
    )
    return unconv.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_unconverted")
    )


def sql_unconverted_views() -> str:
    return """
SELECT v.user_id, count(*) AS n_unconverted
FROM events v
WHERE v.event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events c
    WHERE c.event_type = 'click'
      AND c.user_id = v.user_id
      AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
  )
GROUP BY v.user_id
"""


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in ONE pass: ``ROLLUP(event_type, day)``
    emits (type, day), (type, ·), and (·, ·) aggregation levels from a
    single shuffle — the subtotal report that would otherwise be three
    unioned aggregates scanning the corpus three times. Grouping-set
    expansion happens map-side; the key space stays bounded
    (types × days + types + 1)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sql_events_rollup() -> str:
    return """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): all four aggregation levels —
    (t,w), (t,·), (·,w), (·,·) — from ONE shuffle, completing the
    grouping-sets family next to ROLLUP (which omits (·,w)). Key space
    stays types × 7 + types + 7 + 1."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", F.date_format("ts", "E").alias("weekday"), "value"
        )
        .cube("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sql_events_cube() -> str:
    # DuckDB strftime('%a') gives the same abbreviated weekday names as
    # Spark's 'E' pattern under the C/POSIX default locale
    return """
SELECT event_type, strftime(ts, '%a') AS weekday,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%a'))
"""


def q_docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles via ``ntile(10)`` — the
    length-bucketing step before padding-efficient batch assembly.
    The window orders by the unique (n_chars, doc_id) pair, so bucket
    boundaries are total-order deterministic on both engines; the
    rollup after it is a bounded aggregate."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def sql_docs_length_deciles() -> str:
    return """
SELECT lang, CAST(ntile(10) OVER (
         PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC
       ) AS INT) AS decile, doc_id, n_chars
FROM documents
"""  # outer aggregate below


def sql_docs_length_deciles_full() -> str:
    return f"""
WITH d AS ({sql_docs_length_deciles()})
SELECT lang, decile, count(*) AS n,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM d GROUP BY lang, decile
"""


def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational transpose: one row per day, one value column per
    event type (``df.groupBy().pivot()`` with an EXPLICIT type list —
    the implicit form runs a distinct-scan first and bakes data into
    the plan, which a 100 TB pipeline never wants). Compiles to the
    same single CASE-aggregate pass as the Q12 shape."""
    ev = _read(spark, sf_dir, "events")
    types = ["view", "click", "purchase"]
    return (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "value"
        )
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 4))
    )


def sql_events_type_pivot() -> str:
    arms = ", ".join(
        f"round(sum(CASE WHEN event_type = '{t}' THEN value END), 4) AS \"{t}\""
        for t in ["view", "click", "purchase"]
    )
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, {arms}
FROM events GROUP BY 1
"""


def q_docs_sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-N uniform draw — see :func:`~spark_ifs_spark.
    operators.sampling.sample_exact_n` (hash-ordered TakeOrdered; no
    global sort)."""
    from spark_ifs_spark.operators.sampling import sample_exact_n

    docs = _read(spark, sf_dir, "documents")
    return sample_exact_n(docs, "doc_id", SAMPLE_N, SAMPLE_SEED).select(
        "doc_id", "source", "n_chars"
    )


def sql_docs_sample_n() -> str:
    from spark_ifs_spark.functions.hashing import sql_md5_int60

    keyed = f"concat('{SAMPLE_SEED}:', CAST(doc_id AS VARCHAR))"
    return f"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY {sql_md5_int60(keyed)} ASC, doc_id ASC
LIMIT {SAMPLE_N}
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard — see :func:`~spark_ifs_spark.
    operators.textstats.source_vocab_overlap` for the inverted-index
    plan and the sources²-bounded fan-out argument."""
    docs = _read(spark, sf_dir, "documents")
    return textstats.source_vocab_overlap(docs, "source", "text")


def sql_source_overlap() -> str:
    return """
WITH toks AS (
  SELECT DISTINCT source AS src, w.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) w
  WHERE w.tok <> ''
), sizes AS (
  SELECT src, count(*) AS n FROM toks GROUP BY src
), inter AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common, sa.n AS n_a, sb.n AS n_b,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.src = inter.src_a
JOIN sizes sb ON sb.src = inter.src_b
"""


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Rademacher random projection of the embeddings down to
    ``PROJ_DIMS`` components — see :func:`~spark_ifs_spark.operators.
    similarity.random_project` for the JL argument and the
    exact-in-binary quantization contract."""
    emb = _read(spark, sf_dir, "embeddings")
    return similarity.random_project(
        emb, "vec_id", "embedding", EMB_DIMS, out_dims=PROJ_DIMS, seed=PROJ_SEED
    ).select(F.col("id").alias("vec_id"), "k", "v")


def sql_embedding_project() -> str:
    import random

    rng = random.Random(PROJ_SEED)
    signs = [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(EMB_DIMS)]
        for _ in range(PROJ_DIMS)
    ]
    vals = ",\n".join(
        f"({k}, {i}, {s!r})"
        for k, row in enumerate(signs)
        for i, s in enumerate(row)
    )
    return f"""
WITH sg(k, i, s) AS (VALUES {vals})
SELECT e.vec_id, CAST(sg.k AS INT) AS k,
       sum((floor(CAST(e.embedding[sg.i + 1] AS DOUBLE) * 8) / 8) * sg.s) AS v
FROM embeddings e JOIN sg ON true
GROUP BY e.vec_id, sg.k
"""




# ---------------------------------------------------------------------------
# round-4 additions: remaining TPC-H join shapes + retrieval/quantization/
# contamination operators for the LLM-pipeline surface

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's yearly share of PROMO-part
    revenue sold into one market region — the deepest join tree in the
    registry (6 tables). Plan: part/supplier/nation/region are
    dimensions and broadcast (nation/region doubly so — 25 and 5 rows);
    the one unavoidable big-big shuffle is lineitem⋈orders on the
    orderkey, and AQE re-plans the customer join after the region
    filter collapses it. The share divides two sums from ONE aggregate
    over a 2-row year key space — never two passes."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").filter(F.col("p_type") == MKT_PART_TYPE)
    orders = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _read(spark, sf_dir, "customer")
    sup = _read(spark, sf_dir, "supplier")
    nat = _read(spark, sf_dir, "nation")
    reg = _read(spark, sf_dir, "region").filter(F.col("r_name") == MKT_REGION)
    cnat = nat.alias("cnat")
    snat = nat.alias("snat")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    from_nation = F.col("snat.n_name") == MKT_SUPP_NATION
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cnat.n_nationkey"))
        .join(F.broadcast(reg), F.col("cnat.n_regionkey") == reg["r_regionkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("snat.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(from_nation, rev).otherwise(F.lit(0.0))) / F.sum(rev), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def sql_market_share() -> str:
    return f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN sn.n_name = '{MKT_SUPP_NATION}'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{MKT_PART_TYPE}'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = '{MKT_REGION}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    INCLUDING zero-order customers — the outer-join aggregate family.
    Plan: customer LEFT JOIN filtered orders shuffles both sides on the
    custkey (big-big; AQE handles the skewed no-order key space), the
    per-customer count folds map-side, and the second aggregate is over
    a ~tens-row key space — effectively free. No window, no collect."""
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def sql_custdist() -> str:
    return """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


def q_big_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders whose total line
    quantity exceeds a threshold. Plan: the lineitem aggregate runs
    FIRST (map-side combined on the orderkey, the table's natural
    cluster key) and the HAVING filter collapses it to a handful of
    rows BEFORE any join — so the joins to orders and customer are
    broadcast-sized regardless of corpus scale. Quantities are
    integral doubles in this dataset, so the sums are exact."""
    li = _read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > BIGVOL_QTY)
    )
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy("o_orderkey")
    )


def sql_big_volume_customers() -> str:
    return f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice, b.sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {BIGVOL_QTY}
) b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
"""


def q_widget_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of a named part
    family — nested semi-joins. Plan: the part-name filter broadcasts
    into the lineitem scan (a ~dimension-sized build side), the
    per-(supplier, part) aggregate folds map-side, the HAVING collapses
    it, and supplier is kept via LEFT SEMI — the supplier relation is
    never duplicated by the many qualifying parts per supplier."""
    part = _read(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    li = _read(spark, sf_dir, "lineitem")
    movers = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > WIDGET_QTY)
        .select("l_suppkey")
    )
    sup = _read(spark, sf_dir, "supplier")
    return (
        sup.join(movers, sup["s_suppkey"] == movers["l_suppkey"], "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def sql_widget_part_suppliers() -> str:
    return f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > {WIDGET_QTY}
)
ORDER BY s_suppkey
"""


def q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark contamination: per-corpus-doc fraction (integer
    ppm) of distinct word 4-grams shared with the held-out eval subset
    (doc_id % 97 == 0) — the thresholdable form of ``decontam_ids``."""
    docs = _read(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
    return dedup.contamination_overlap(
        corpus, eval_set, "doc_id", "text", n=DECONTAM_N
    )


def sql_decontam_overlap() -> str:
    n = DECONTAM_N
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[s.i + 1 : s.i + {n}], ' ') AS sh
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - {n})) AS i) s
  WHERE len(t) >= {n}
), ev AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
)
SELECT c.doc_id AS id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(floor(CAST(sum(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  * 1000000 / CAST(count(*) AS BIGINT)) AS BIGINT) AS overlap_ppm
FROM sh c LEFT JOIN ev ON c.sh = ev.sh
WHERE c.doc_id % {DECONTAM_EVAL_MOD} != 0
GROUP BY 1
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed bag-of-words query —
    lexical retrieval with integer-micro exactness (see
    ``textstats.bm25_topk`` for the plan narrative)."""
    docs = _read(spark, sf_dir, "documents")
    return textstats.bm25_topk(
        docs, "doc_id", "text", BM25_QUERY_TERMS, k=BM25_K
    )


def sql_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
), stats AS (
  SELECT count(*) AS n, sum(len(t)) AS total FROM base
), tf AS (
  SELECT id, len(t) AS dl, w.term, count(*) AS tf
  FROM base, LATERAL (SELECT unnest(t) AS term) w
  WHERE w.term IN ({terms})
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.id,
         CAST(floor(
           ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
              / (CAST(tf.tf AS DOUBLE)
                 + 1.2 * (0.25 + (0.75 * CAST(tf.dl AS DOUBLE))
                                  / (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE)))))
           * 1000000.0) AS BIGINT) AS s_micro
  FROM tf CROSS JOIN stats s JOIN dfreq d USING (term)
)
SELECT id, CAST(sum(s_micro) AS BIGINT) AS score_micro
FROM scored GROUP BY 1
ORDER BY score_micro DESC, id ASC LIMIT {BM25_K}
"""


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse all-pairs similarity: doc pairs with tf-idf cosine ≥
    threshold over a DF-pruned vocabulary (inverted-index join, integer
    weights — see ``textstats.tfidf_cosine_pairs``)."""
    docs = _read(spark, sf_dir, "documents")
    return textstats.tfidf_cosine_pairs(
        docs,
        "doc_id",
        "text",
        threshold=TFIDF_PAIR_THRESHOLD,
        max_df=TFIDF_PAIR_MAX_DF,
    )


def sql_tfidf_cosine_pairs() -> str:
    return f"""
WITH tf AS (
  SELECT doc_id AS id, w.term, count(*) AS tf
  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) w
  GROUP BY 1, 2
), n AS (
  SELECT count(*) AS n_docs FROM documents
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), wts AS (
  SELECT tf.id, tf.term, d.df,
         CAST(tf.tf AS BIGINT)
         * CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / d.df) * 1000000.0) AS BIGINT) AS w
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
  WHERE d.df <= {TFIDF_PAIR_MAX_DF}
), wpos AS (
  SELECT * FROM wts WHERE w > 0
), norms AS (
  SELECT id, CAST(sum(w * w) AS BIGINT) AS norm2 FROM wpos GROUP BY 1
), dots AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM wpos a JOIN wpos b ON a.term = b.term AND a.id < b.id
  WHERE a.df >= 2
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cos_sim
FROM dots
JOIN norms na ON na.id = dots.id_a
JOIN norms nb ON nb.id = dots.id_b
WHERE round(CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))), 6)
      >= {TFIDF_PAIR_THRESHOLD}
"""


def q_ann_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN in 8-bit scalar-quantized space: integer dot-product top-10
    against vec_id 0 (see ``similarity.topk_sq8`` — the 4× compression
    stage of a quantized retrieval stack)."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return similarity.topk_sq8(
        emb,
        "vec_id",
        "embedding",
        [float(x) for x in qvec],
        k=ANN_K,
        exclude_ids=[0],
    )


def sql_ann_topk_sq8() -> str:
    return f"""
WITH dims AS (
  SELECT t.i + 1 AS j,
         min(CAST(e.embedding[t.i + 1] AS DOUBLE)) AS mn,
         max(CAST(e.embedding[t.i + 1] AS DOUBLE)) AS mx
  FROM embeddings e CROSS JOIN range({EMB_DIMS}) t(i)
  GROUP BY 1
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), qc AS (
  SELECT d.j,
         CASE WHEN d.mx = d.mn THEN 0
              ELSE least(255, greatest(0, CAST(floor(
                (CAST(q.qe[d.j] AS DOUBLE) - d.mn) * 255.0 / (d.mx - d.mn)) AS BIGINT)))
         END AS c
  FROM dims d CROSS JOIN q
), scored AS (
  SELECT e.vec_id AS id,
         CAST(sum(qc.c * CASE WHEN d.mx = d.mn THEN 0
              ELSE least(255, greatest(0, CAST(floor(
                (CAST(e.embedding[d.j] AS DOUBLE) - d.mn) * 255.0 / (d.mx - d.mn)) AS BIGINT)))
         END) AS BIGINT) AS dot_q
  FROM embeddings e
  CROSS JOIN dims d
  JOIN qc ON qc.j = d.j
  WHERE e.vec_id <> 0 AND qc.c <> 0
  GROUP BY 1
)
SELECT id, dot_q FROM scored ORDER BY dot_q DESC, id ASC LIMIT {ANN_K}
"""


def q_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup: lowercase / strip punctuation /
    collapse whitespace, then group on a 60-bit digest of the canonical
    form (``dedup.exact_dedup_normalized`` — the digest-key shuffle)."""
    docs = _read(spark, sf_dir, "documents")
    return dedup.exact_dedup_normalized(docs, "doc_id", "text")


def sql_dedup_exact_normalized() -> str:
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
        " ' +', ' ', 'g'))"
    )
    return f"""
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups, nd AS norm_digest
FROM (SELECT doc_id, {sql_md5_int60(norm)} AS nd FROM documents)
GROUP BY nd
"""




def q_cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point estimates for a fixed probe vocabulary
    over the corpus token stream — frequency estimation whose shuffle is
    a depth×width grid regardless of corpus cardinality (see
    ``operators/sketches.py``). Estimates overcount, never undercount;
    the absent probe shows the collision floor."""
    from spark_ifs_spark.operators import sketches

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    cms = sketches.cms_build(
        toks, "w", depth=CMS_DEPTH, width=CMS_WIDTH, seed=CMS_SEED
    )
    return sketches.cms_estimate(
        cms, CMS_PROBES, depth=CMS_DEPTH, width=CMS_WIDTH, seed=CMS_SEED
    )


def sql_cms_term_counts() -> str:
    params = minhash_params(CMS_DEPTH, CMS_SEED)
    param_rows = ", ".join(f"({r}, {a}, {b})" for r, (a, b) in enumerate(params))
    probe_rows = ", ".join(f"('{t}')" for t in CMS_PROBES)
    h = sql_md5_int60("w")
    ph = sql_md5_int60("term")
    P = MINHASH_P
    return f"""
WITH params(r, a, b) AS (VALUES {param_rows}),
toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), hs AS (
  SELECT {h} AS h FROM toks
), cms AS (
  SELECT p.r, ((p.a * (hs.h % {P}) + p.b) % {P}) % {CMS_WIDTH} AS bucket,
         count(*) AS c
  FROM hs CROSS JOIN params p
  GROUP BY 1, 2
), probes(term) AS (VALUES {probe_rows}),
ph AS (
  SELECT term, {ph} AS h FROM probes
), pcells AS (
  SELECT term, p.r, ((p.a * (ph.h % {P}) + p.b) % {P}) % {CMS_WIDTH} AS bucket
  FROM ph CROSS JOIN params p
)
SELECT pcells.term, CAST(min(coalesce(cms.c, 0)) AS BIGINT) AS est
FROM pcells LEFT JOIN cms ON cms.r = pcells.r AND cms.bucket = pcells.bucket
GROUP BY 1
"""


def q_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent-token collocations by integer-micro PMI
    (``textstats.pmi_top_pairs`` — phrase mining)."""
    docs = _read(spark, sf_dir, "documents")
    return textstats.pmi_top_pairs(
        docs, "text", k=PMI_K, min_count=PMI_MIN_COUNT
    )


def sql_pmi_top_pairs() -> str:
    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), total AS (
  SELECT CAST(sum(len(t)) AS BIGINT) AS n FROM toks
), uni AS (
  SELECT w.w AS w, CAST(count(*) AS BIGINT) AS c_w
  FROM toks, LATERAL (SELECT unnest(t) AS w) w
  GROUP BY 1
), big AS (
  SELECT t[s.i] || ' ' || t[s.i + 1] AS pair, CAST(count(*) AS BIGINT) AS c_ab
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
  WHERE len(t) >= 2
  GROUP BY 1
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT big.pair, big.c_ab,
       CAST(floor(ln((big.c_ab * total.n) / (ua.c_w * ub.c_w)) * 1000000.0) AS BIGINT) AS pmi_micro
FROM big
CROSS JOIN total
JOIN uni ua ON ua.w = string_split(big.pair, ' ')[1]
JOIN uni ub ON ub.w = string_split(big.pair, ' ')[-1]
ORDER BY pmi_micro DESC, pair ASC
LIMIT {PMI_K}
"""


def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (F.size(F.split(F.col("text"), " ")) / F.lit(100.0)).alias("x2"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def q_quality_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a tiny logistic quality classifier (2 full-batch GD steps,
    integer-micro weights — ``operators/lr.py``) on cheap document
    features, then score every document map-side. The oracle unrolls
    both training iterations and the scoring pass as CTEs."""
    from spark_ifs_spark.operators import lr

    feats = _lr_features(spark, sf_dir)
    w = lr.lr_train(feats, LR_FEATURES, "y", iters=LR_ITERS)
    return lr.lr_score(feats, LR_FEATURES, w, "doc_id")


def sql_quality_lr_score() -> str:
    # margin under weights (wa, wb, wc) — mirrors the Spark fold order:
    # ((0.0 + w0·x0) + w1·x1) + w2·x2
    def margin(pre: str) -> str:
        return (
            f"(0.0 + ({pre}.wa / 1000000.0) * x0"
            f" + ({pre}.wb / 1000000.0) * x1"
            f" + ({pre}.wc / 1000000.0) * x2)"
        )

    sig = lambda m: f"(1.0 / (1.0 + exp(-{m})))"
    g = lambda p_expr, x: (
        f"CAST(sum(CAST(floor(({p_expr} - y) * {x} * 1000000.0) AS BIGINT)) AS BIGINT)"
    )
    m2 = margin("w1")
    ms = margin("w2")
    return f"""
WITH feats AS (
  SELECT doc_id AS id, 1.0 AS x0, n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM feats
), g1 AS (
  SELECT {g("0.5", "x0")} AS ga, {g("0.5", "x1")} AS gb, {g("0.5", "x2")} AS gc
  FROM feats
), w1 AS (
  SELECT 0 - (g1.ga * 1 // (2 * nn.n)) AS wa,
         0 - (g1.gb * 1 // (2 * nn.n)) AS wb,
         0 - (g1.gc * 1 // (2 * nn.n)) AS wc
  FROM g1 CROSS JOIN nn
), g2 AS (
  SELECT {g(sig(m2), "x0")} AS ga, {g(sig(m2), "x1")} AS gb, {g(sig(m2), "x2")} AS gc
  FROM feats CROSS JOIN w1
), w2 AS (
  SELECT w1.wa - (g2.ga * 1 // (2 * nn.n)) AS wa,
         w1.wb - (g2.gb * 1 // (2 * nn.n)) AS wb,
         w1.wc - (g2.gc * 1 // (2 * nn.n)) AS wc
  FROM g2 CROSS JOIN w1 CROSS JOIN nn
)
SELECT id, CAST(floor({sig(ms)} * 1000000.0) AS BIGINT) AS score_micro
FROM feats CROSS JOIN w2
"""




def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage funnel (view → click-after-view →
    purchase-after-click): per-user conditional-min chains, every join
    user-keyed — see ``operators/events_analytics.funnel_counts``."""
    from spark_ifs_spark.operators import events_analytics

    ev = _read(spark, sf_dir, "events")
    return events_analytics.funnel_counts(
        ev, "user_id", "ts", "event_type", FUNNEL_STAGES
    )


def sql_events_funnel() -> str:
    s0, s1, s2 = FUNNEL_STAGES
    return f"""
WITH s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = '{s0}' GROUP BY 1
), s1 AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = '{s1}' AND e.ts > s0.t0
  GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = '{s2}' AND e.ts > s1.t1
  GROUP BY 1
)
SELECT '{s0}' AS stage, CAST(count(*) AS BIGINT) AS users FROM s0
UNION ALL SELECT '{s1}', CAST(count(*) AS BIGINT) FROM s1
UNION ALL SELECT '{s2}', CAST(count(*) AS BIGINT) FROM s2
"""


def q_events_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention grid (first-activity-week × week offset)
    — ``operators/events_analytics.cohort_retention``."""
    from spark_ifs_spark.operators import events_analytics

    ev = _read(spark, sf_dir, "events")
    return events_analytics.cohort_retention(ev, "user_id", "ts")


def sql_events_cohorts() -> str:
    return """
WITH first AS (
  SELECT user_id, min(ts) AS f FROM events GROUP BY 1
), cohort AS (
  SELECT user_id, date_trunc('week', f) AS cw FROM first
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, wk) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM act JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD2 validity intervals per user (one entity-keyed
    window, ties total-ordered by event id) —
    ``operators/events_analytics.scd2_intervals``."""
    from spark_ifs_spark.operators import events_analytics

    ev = _read(spark, sf_dir, "events")
    return events_analytics.scd2_intervals(
        ev, "user_id", "ts", "event_id", ["event_type", "value"]
    )


def sql_events_scd2() -> str:
    return """
SELECT user_id, event_id, event_type, value,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS valid_to_us
FROM events
"""




def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between consecutive
    per-user events (``events_analytics.transition_matrix``) — integer
    ppm conditionals."""
    from spark_ifs_spark.operators import events_analytics

    ev = _read(spark, sf_dir, "events")
    return events_analytics.transition_matrix(
        ev, "user_id", "ts", "event_id", "event_type"
    )


def sql_event_transitions() -> str:
    return """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, c,
       CAST(floor(c * 1000000 / sum(c) OVER (PARTITION BY from_type)) AS BIGINT) AS p_micro
FROM counts
"""


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement (A-ES md5
    keys, probability ∝ document length) —
    ``operators/sampling.weighted_sample_n``."""
    from spark_ifs_spark.operators.sampling import weighted_sample_n

    docs = _read(spark, sf_dir, "documents").withColumn(
        "w", F.col("n_chars") + F.lit(1)
    )
    return weighted_sample_n(docs, "doc_id", "w", WSAMPLE_N, WSAMPLE_SEED).select(
        "doc_id", "source", "n_chars"
    )


def sql_docs_weighted_sample() -> str:
    keyed = f"concat('{WSAMPLE_SEED}:', CAST(doc_id AS VARCHAR))"
    h = sql_md5_int60(keyed)
    denom = float(2**60 + 1)
    return f"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY ln(CAST({h} + 1 AS DOUBLE) / {denom!r}) / CAST(n_chars + 1 AS DOUBLE) DESC,
         doc_id ASC
LIMIT {WSAMPLE_N}
"""




def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: PageRank over the token co-occurrence graph (nodes =
    corpus vocabulary, edges = distinct adjacent-token pairs in both
    directions) — the classic graph-based keyword ranking, and the
    registry's iterative-graph-algorithm exemplar beyond connected
    components (``operators/graph.pagerank``; ranks never visit the
    driver). Unweighted-edge variant; integer-micro ranks."""
    from spark_ifs_spark.operators import graph

    docs = _read(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = F.size(toks)
    # both edge directions emitted in ONE zip_with pass (HOFs are
    # interpreted, so a union of fwd + reversed-fwd would evaluate the
    # pair build twice — measured 3.4x slower); repartition spreads the
    # single-file doc scan across cores before the interpreted explode
    pairs = F.zip_with(
        F.slice(toks, 1, m - 1),
        F.slice(toks, 2, m - 1),
        lambda a, b: F.array(
            F.struct(a.alias("src"), b.alias("dst")),
            F.struct(b.alias("src"), a.alias("dst")),
        ),
    )
    edges = (
        docs.repartition(32)
        .select(F.explode(F.flatten(pairs)).alias("p"))
        .select("p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = docs.select(F.explode(toks).alias("term")).distinct()
    out = graph.pagerank(
        edges, nodes, iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING
    )
    return out.select(F.col("id").alias("term"), "pr_micro")


def sql_textrank_keywords() -> str:
    teleport = int((1.0 - PAGERANK_DAMPING) * 1000000)
    d = PAGERANK_DAMPING
    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), fwd AS (
  SELECT DISTINCT t[s.i] AS src, t[s.i + 1] AS dst
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
  WHERE len(t) >= 2
), edges AS (
  SELECT src, dst FROM fwd WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM fwd WHERE src <> dst
), nodes AS (
  SELECT DISTINCT w.w AS id FROM toks, LATERAL (SELECT unnest(t) AS w) w
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
), r0 AS (
  SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes
), c1 AS (
  SELECT e.dst AS id, CAST(sum(r0.pr // d.deg) AS BIGINT) AS s
  FROM r0 JOIN edges e ON e.src = r0.id JOIN deg d ON d.src = e.src
  GROUP BY 1
), r1 AS (
  SELECT nodes.id,
         CAST({teleport} + floor({d} * CAST(coalesce(c1.s, 0) AS DOUBLE)) AS BIGINT) AS pr
  FROM nodes LEFT JOIN c1 USING (id)
), c2 AS (
  SELECT e.dst AS id, CAST(sum(r1.pr // d.deg) AS BIGINT) AS s
  FROM r1 JOIN edges e ON e.src = r1.id JOIN deg d ON d.src = e.src
  GROUP BY 1
), r2 AS (
  SELECT nodes.id,
         CAST({teleport} + floor({d} * CAST(coalesce(c2.s, 0) AS DOUBLE)) AS BIGINT) AS pr
  FROM nodes LEFT JOIN c2 USING (id)
)
SELECT id AS term, pr AS pr_micro FROM r2
"""




def q_session_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: gap-sessionized (12 h inactivity) per-session
    event sequences, counted corpus-wide
    (``events_analytics.session_journeys`` — batch gap sessionization
    via stacked windows over ONE user-keyed sort, order-embedded
    journey aggregate, TakeOrdered cut)."""
    from spark_ifs_spark.operators import events_analytics

    ev = _read(spark, sf_dir, "events")
    return events_analytics.session_journeys(
        ev, "user_id", "ts", "event_id", "event_type",
        gap_s=JOURNEY_GAP_S, k=JOURNEY_K,
    )


def sql_session_journeys() -> str:
    gap_us = JOURNEY_GAP_S * 1_000_000
    return f"""
WITH base AS (
  SELECT user_id AS u, event_id AS id, event_type AS t, epoch_us(ts) AS us
  FROM events
), flagged AS (
  SELECT u, id, t, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY u ORDER BY us, id) > {gap_us}
              THEN 1 ELSE 0 END AS strt
  FROM base
), sess AS (
  SELECT u, id, t, us,
         sum(strt) OVER (PARTITION BY u ORDER BY us, id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
), j AS (
  SELECT u, sid, string_agg(t, '>' ORDER BY us, id) AS journey
  FROM sess GROUP BY 1, 2
)
SELECT journey, CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1
ORDER BY n DESC, journey ASC
LIMIT {JOURNEY_K}
"""




def q_supplier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped standardization: per-nation population z-score of
    supplier account balance in integer micro-units — the
    feature-engineering complement of per-key winsorization.

    Exactness: ``avg``/``stddev_pop`` are float sums whose
    partition-order ulps cross floor boundaries (observed at sf0.01),
    so z is computed from EXACT integer sufficient statistics over
    balance cents ``b = round(100·acctbal)``:
    ``z = (n·b − S) / sqrt(n·Q − S²)`` with ``S = Σb``, ``Q = Σb²`` —
    algebraically identical to ``(x − μ)/σ_pop``, but the only floats
    are one correctly-rounded sqrt of an exact BIGINT and one division.
    σ = 0 is exactly ``n·Q = S²``; those rows emit NULL, not an error.
    (``n·Q`` bounds: fine through ~10⁶-row groups in cents; at lake
    scale promote the sums to DECIMAL.)

    Plan: one bounded per-nation aggregate broadcast back into a
    scan-fused projection; the supplier relation never shuffles."""
    sup = _read(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    keyed = sup.select("s_suppkey", "s_nationkey", cents.alias("b"))
    stats = keyed.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b").alias("s_"),
        F.sum(F.col("b") * F.col("b")).alias("q"),
    )
    disc = F.col("n") * F.col("q") - F.col("s_") * F.col("s_")
    z = F.when(
        disc > 0,
        F.floor(
            (F.col("n") * F.col("b") - F.col("s_")).cast("double")
            * F.lit(1000000.0)
            / F.sqrt(disc.cast("double"))
        ).cast("long"),
    )
    return (
        keyed.join(F.broadcast(stats), "s_nationkey")
        .select("s_suppkey", "s_nationkey", z.alias("z_micro"))
    )


def sql_supplier_zscore() -> str:
    return """
WITH keyed AS (
  SELECT s_suppkey, s_nationkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS b
  FROM supplier
), stats AS (
  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(b) AS BIGINT) AS s_, CAST(sum(b * b) AS BIGINT) AS q
  FROM keyed GROUP BY 1
)
SELECT k.s_suppkey, k.s_nationkey,
       CASE WHEN st.n * st.q - st.s_ * st.s_ > 0
            THEN CAST(floor(CAST(st.n * k.b - st.s_ AS DOUBLE) * 1000000.0
                            / sqrt(CAST(st.n * st.q - st.s_ * st.s_ AS DOUBLE))) AS BIGINT)
       END AS z_micro
FROM keyed k JOIN stats st USING (s_nationkey)
"""


def q_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order revenue growth: window-over-aggregate —
    the lag/window runs on the BOUNDED monthly relation (months², not
    orders), so the only corpus-scale work is one map-combined monthly
    aggregate. Growth in integer ppm of the prior month (floor), NULL
    for the first month."""
    orders = _read(spark, sf_dir, "orders")
    from pyspark.sql import Window

    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    growth = F.when(
        prev.isNotNull(),
        F.floor((F.col("revenue") - prev) * F.lit(1000000.0) / prev).cast("long"),
    )
    return monthly.select("month", "revenue", growth.alias("growth_ppm")).orderBy(
        "month"
    )


def sql_monthly_growth() -> str:
    return """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       CASE WHEN lag(revenue) OVER (ORDER BY month) IS NOT NULL
            THEN CAST(floor((revenue - lag(revenue) OVER (ORDER BY month)) * 1000000.0
                            / lag(revenue) OVER (ORDER BY month)) AS BIGINT)
       END AS growth_ppm
FROM monthly
ORDER BY month
"""




def q_events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly scoring: each (event_type, day)'s count z-scored
    against that type's full daily history — the monitoring query every
    event pipeline alerts on. Exactness: daily counts are integers, so
    the z-score uses the same exact-integer sufficient-statistic form
    as ``supplier_zscore`` (``(n·x−S)/sqrt(n·Q−S²)``) — no float
    aggregate anywhere. Plan: ONE corpus-scale map-combined aggregate
    to (type, day); everything after runs on the bounded types×days
    relation (per-type stats broadcast back)."""
    ev = _read(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s_"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    disc = F.col("n") * F.col("q") - F.col("s_") * F.col("s_")
    z = F.when(
        disc > 0,
        F.floor(
            (F.col("n") * F.col("c") - F.col("s_")).cast("double")
            * F.lit(1000000.0)
            / F.sqrt(disc.cast("double"))
        ).cast("long"),
    )
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "day", "c", z.alias("z_micro")
    )


def sql_events_daily_anomaly() -> str:
    return """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s_, CAST(sum(c * c) AS BIGINT) AS q
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.c,
       CASE WHEN st.n * st.q - st.s_ * st.s_ > 0
            THEN CAST(floor(CAST(st.n * d.c - st.s_ AS DOUBLE) * 1000000.0
                            / sqrt(CAST(st.n * st.q - st.s_ * st.s_ AS DOUBLE))) AS BIGINT)
       END AS z_micro
FROM daily d JOIN stats st USING (event_type)
"""




def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation, quartiled WITHIN nation: recency
    (last order date), frequency (order count), monetary (total spend)
    each ``ntile(4)``-bucketed per nation — the marketing-analytics
    staple. Partitioning the ntile windows by nation is the scale
    choice, not a semantic accident: a GLOBAL ntile funnels every
    customer through one sorted task, while per-nation windows bound
    each task by the largest nation (salt further or swap to
    ``approx_percentile`` boundaries at extreme skew). Orders fold to
    one row per customer FIRST (map-combined), so the windows run on
    the bounded customer relation. All three orders embed c_custkey, so
    every bucket boundary is total-ordered and engine-reproducible."""
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 4).alias("monetary"),
        )
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
    )
    from pyspark.sql import Window

    def bucket(order_cols):
        return F.ntile(4).over(
            Window.partitionBy("c_nationkey").orderBy(*order_cols)
        )

    return per.select(
        "c_custkey",
        "c_nationkey",
        "frequency",
        "monetary",
        bucket([F.col("last_order").desc(), F.col("c_custkey").asc()]).alias("r_bucket"),
        bucket([F.col("frequency").desc(), F.col("c_custkey").asc()]).alias("f_bucket"),
        bucket([F.col("monetary").desc(), F.col("c_custkey").asc()]).alias("m_bucket"),
    )


def sql_customer_rfm() -> str:
    return """
WITH per AS (
  SELECT o.o_custkey AS c_custkey, c.c_nationkey,
         strftime(max(o.o_orderdate), '%Y-%m-%d') AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(o.o_totalprice), 4) AS monetary
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_custkey, c_nationkey, frequency, monetary,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
            ORDER BY last_order DESC, c_custkey ASC) AS INT) AS r_bucket,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
            ORDER BY frequency DESC, c_custkey ASC) AS INT) AS f_bucket,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
            ORDER BY monetary DESC, c_custkey ASC) AS INT) AS m_bucket
FROM per
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — the pure scan-aggregate.
    Plan: all three predicates push to the parquet scan (min/max row-group
    pruning takes the year filter), ONE partial+final aggregate, zero
    joins; at 100 TB this query is I/O-bound by design and the filter
    pushdown (asserted in test_plans.py) is the whole game."""
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


def sql_forecast_revenue() -> str:
    return """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


#: Q21 late rule — this testdata has no commit/receipt dates, so "late"
#: is shipped > LATE_DAYS after the order date (same plan shape as the
#: reference TPC-H predicate, different column arithmetic).
LATE_DAYS = 150


def q_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order — the exists/not-exists double
    correlated subquery, the hardest relational shape in the TPC-H deck.

    Plan: expressed as one left-semi + one left-anti join instead of
    per-row subqueries, so Catalyst runs them as two shuffle joins
    co-keyed on l_orderkey — the semi ("some OTHER supplier in this
    order") and the anti ("no OTHER supplier was late") reuse the same
    hash partitioning as the late-rows relation they filter, and the
    final count is a bounded groupBy on s_suppkey. Supplier is a
    broadcast dimension. No correlated per-row execution anywhere."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "leftsemi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "leftanti",
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "numwait")
    )


def sql_late_suppliers() -> str:
    return f"""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
),
waiting AS (
  SELECT t.l_orderkey, t.l_suppkey
  FROM late t
  WHERE EXISTS (
      SELECT 1 FROM lineitem x
      WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM late y
      WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey <> t.l_suppkey)
)
SELECT s.s_suppkey AS suppkey, s.s_name, count(*) AS numwait
FROM waiting w JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def q_part_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: unordered part pairs co-occurring in an
    order, counted over orders — the co-occurrence primitive behind
    "bought together", tag co-occurrence, and domain co-citation graphs.
    Plan: see :func:`~spark_ifs_spark.operators.affinity.
    co_occurrence_pairs` — 2 shuffles, no join, pairs expand map-side
    from per-basket sorted item arrays under a hard per-basket cap.
    min_count=2 is the support floor: singleton pairs are noise (and at
    sf0.1 ~97% of the raw pair space), so the result stays a few
    thousand rows at every SF instead of growing with the corpus."""
    from spark_ifs_spark.operators import affinity

    li = _read(spark, sf_dir, "lineitem")
    return affinity.co_occurrence_pairs(li, "l_orderkey", "l_partkey", min_count=2)


def sql_part_pair_counts() -> str:
    # the Spark side's per-basket cap (64 smallest ids) never binds at
    # TPC-H shapes (<= 7 lineitems/order), so the uncapped SQL matches
    return """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, count(*) AS n_baskets
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 2
"""


#: bloom decontamination params — distinct n / eval split from
#: decontam_ids so the two queries exercise different data
BLOOM_DECONTAM_N = 5
BLOOM_EVAL_MOD = 89


def q_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the eval-set-too-
    big-to-broadcast path: a numpy Bloom sketch over eval 5-gram hashes
    is broadcast, kills ~99% of corpus shingles INSIDE the scan stage
    (Arrow-batched pandas predicate), and a shuffle semi-join confirms
    exactly, so false positives never reach the result and the oracle
    is the plain overlap SQL. See :func:`~spark_ifs_spark.operators.
    dedup.contaminated_ids_bloom`."""
    docs = _read(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % BLOOM_EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % BLOOM_EVAL_MOD != 0)
    return dedup.contaminated_ids_bloom(
        corpus, eval_set, "doc_id", "text", n=BLOOM_DECONTAM_N
    )


def sql_decontam_bloom() -> str:
    n = BLOOM_DECONTAM_N
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, array_to_string(t[s.i + 1 : s.i + {n}], ' ') AS sh
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - {n})) AS i) s
  WHERE len(t) >= {n}
)
SELECT DISTINCT c.doc_id AS id
FROM sh c
WHERE c.doc_id % {BLOOM_EVAL_MOD} != 0
  AND EXISTS (
    SELECT 1 FROM sh e
    WHERE e.doc_id % {BLOOM_EVAL_MOD} = 0 AND e.sh = c.sh
  )
"""


#: boilerplate shingle params (3-gram to reuse the _SQL_SHINGLES CTE)
BOILER_MIN_FRAC = 0.05
BOILER_TOP = 50


def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate detection (CCNet-style, shingle-unit): the top
    50 word 3-grams by document frequency among those present in ≥5% of
    documents — template chrome, not content. Deterministic top-k: the
    (df DESC, sh ASC) order is total."""
    from spark_ifs_spark.operators.textstats import shingle_doc_freq

    docs = _read(spark, sf_dir, "documents")
    out = shingle_doc_freq(docs, "doc_id", "text", n=3)
    return (
        out.filter(F.col("frac") >= BOILER_MIN_FRAC)
        .orderBy(F.col("df").desc(), F.col("sh").asc())
        .limit(BOILER_TOP)
        .select("sh", "df", F.round("frac", 6).alias("frac"))
    )


def sql_boilerplate_shingles() -> str:
    return f"""
WITH {_SQL_SHINGLES},
dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
tot AS (SELECT count(*) AS n_docs FROM documents)
SELECT sh, df, round(df * 1.0 / n_docs, 6) AS frac
FROM dfreq, tot
WHERE df * 1.0 / n_docs >= {BOILER_MIN_FRAC}
ORDER BY df DESC, sh ASC
LIMIT {BOILER_TOP}
"""


NOVELTY_MAX_FRAC = 0.05


def q_docs_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct 3-gram
    shingles that are corpus boilerplate (shingle DF > 5% of docs) — the
    document-level score that template filtering thresholds on. See
    :func:`~spark_ifs_spark.operators.textstats.boilerplate_fraction`."""
    from spark_ifs_spark.operators.textstats import boilerplate_fraction

    docs = _read(spark, sf_dir, "documents")
    out = boilerplate_fraction(
        docs, "doc_id", "text", n=3, max_frac=NOVELTY_MAX_FRAC
    )
    return out.select(
        "id", "n_shingles", "n_boiler", F.round("boiler_frac", 6).alias("boiler_frac")
    )


def sql_docs_novelty() -> str:
    return f"""
WITH {_SQL_SHINGLES},
dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
tot AS (SELECT count(*) AS n_docs FROM documents)
SELECT s.id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN d.df > tot.n_docs * {NOVELTY_MAX_FRAC} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN d.df > tot.n_docs * {NOVELTY_MAX_FRAC} THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS boiler_frac
FROM sh s JOIN dfreq d USING (sh), tot
GROUP BY s.id, tot.n_docs
"""


TEMP_MIX_SEED = 7


def q_docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled multilingual mix (α = 0.5, mT5-style):
    downsample each language so kept counts are ∝ sqrt(n_lang), lifting
    low-resource languages; report kept (docs, chars) per language.
    The keep decision is exact 64-bit integer arithmetic (see
    :func:`~spark_ifs_spark.operators.sampling.temperature_mix`), so
    the result is bit-identical across engines and cluster sizes."""
    from spark_ifs_spark.operators.sampling import temperature_mix

    docs = _read(spark, sf_dir, "documents")
    kept = temperature_mix(docs, "doc_id", "lang", TEMP_MIX_SEED)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
    )


def sql_docs_temperature_mix() -> str:
    from spark_ifs_spark.operators.sampling import SPLIT_BUCKETS, sql_split_bucket

    b = sql_split_bucket("d.doc_id", TEMP_MIX_SEED)
    return f"""
WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
mn AS (SELECT min(n) AS nmin FROM n),
kept AS (
  SELECT d.lang, d.n_chars
  FROM documents d JOIN n USING (lang), mn
  WHERE {b} * {b} * n.n < mn.nmin * {SPLIT_BUCKETS * SPLIT_BUCKETS}
)
SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM kept GROUP BY lang
"""


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter bundle: per-doc boolean flags (word
    count, mean word length, stopword presence, top-word repetition)
    plus the conjunction — rule-level drop attribution, the first
    data-quality dashboard a pretraining pipeline needs. See
    :func:`~spark_ifs_spark.operators.textstats.gopher_quality_flags`."""
    from spark_ifs_spark.operators.textstats import gopher_quality_flags

    docs = _read(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, "doc_id", "text")


def sql_gopher_filters() -> str:
    from spark_ifs_spark.operators import textstats as ts

    stop_sum = " + ".join(_sql_count_word(w) for w in ts.STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id AS id,
         len(string_split(text, ' ')) AS n_words,
         (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
           / len(string_split(text, ' ')) AS mwl,
         ({stop_sum}) AS stop_hits
  FROM documents
),
wc AS (
  SELECT doc_id AS id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
),
top AS (SELECT id, max(c) * 1.0 / CAST(sum(c) AS BIGINT) AS top_frac FROM wc GROUP BY 1)
SELECT b.id, b.n_words,
       b.n_words >= {ts.GOPHER_MIN_WORDS} AND b.n_words <= {ts.GOPHER_MAX_WORDS} AS ok_word_count,
       b.mwl >= {ts.GOPHER_MIN_MEAN_WL} AND b.mwl <= {ts.GOPHER_MAX_MEAN_WL} AS ok_mean_word_len,
       b.stop_hits >= {ts.GOPHER_MIN_STOP_HITS} AS ok_stopwords,
       t.top_frac <= {ts.GOPHER_MAX_TOP_WORD_FRAC} AS ok_top_word,
       (b.n_words >= {ts.GOPHER_MIN_WORDS} AND b.n_words <= {ts.GOPHER_MAX_WORDS})
         AND (b.mwl >= {ts.GOPHER_MIN_MEAN_WL} AND b.mwl <= {ts.GOPHER_MAX_MEAN_WL})
         AND b.stop_hits >= {ts.GOPHER_MIN_STOP_HITS}
         AND t.top_frac <= {ts.GOPHER_MAX_TOP_WORD_FRAC} AS pass_all
FROM base b JOIN top t ON b.id = t.id
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: minhash near-dup pairs bucketed by
    the split pair they straddle — the leakage check every eval split
    needs BEFORE training (a near-dup of a test doc inside train
    silently inflates eval). Output is (split_lo, split_hi, n_pairs);
    any row with split_lo != split_hi is leakage.

    Plan: the pair relation (LSH-bucketed, sub-quadratic) is tiny
    relative to the corpus; the split label is a scan-fused hash
    projection (zero extra shuffles), joined twice on the id — at
    100 TB both joins key on doc ids with no skew (pair endpoints are
    near-unique), and the final aggregate is bounded by split² rows."""
    from spark_ifs_spark.operators.sampling import split_assign

    docs = _read(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    sp = split_assign(docs, "doc_id", SPLIT_WEIGHTS, seed=SPLIT_SEED).select(
        "doc_id", "split"
    )
    sa = sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("_sa"))
    sb = sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("_sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("_sa", "_sb").alias("split_lo"),
            F.greatest("_sa", "_sb").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def sql_split_leakage() -> str:
    from spark_ifs_spark.operators.sampling import sql_split_case

    case_a = sql_split_case("p.id_a", SPLIT_WEIGHTS, SPLIT_SEED)
    case_b = sql_split_case("p.id_b", SPLIT_WEIGHTS, SPLIT_SEED)
    return f"""
SELECT least({case_a}, {case_b}) AS split_lo,
       greatest({case_a}, {case_b}) AS split_hi,
       count(*) AS n_pairs
FROM ({sql_dedup_minhash()}) p
GROUP BY 1, 2
"""


def q_cluster_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: (cluster_size, n_clusters) over
    the minhash connected components — the one-line summary of how
    duplication is distributed (many doubletons vs one giant template
    cluster demand different dedup policies). Plan: two bounded
    aggregates over the cluster relation, which is already
    corpus-sublinear (only docs with ≥1 near-dup edge appear)."""
    from spark_ifs_spark.operators.graph import connected_components

    docs = _read(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    cc = connected_components(pairs)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def sql_cluster_size_stats() -> str:
    return f"""
SELECT cluster_size, count(*) AS n_clusters
FROM (
  SELECT cluster, count(*) AS cluster_size
  FROM ({sql_dup_clusters()}) c
  GROUP BY cluster
) s
GROUP BY cluster_size
"""


def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-probed ANN path against the brute-force exact
    top-k, as a first-class query — the audit that keeps "approximate"
    from meaning "unchecked" when cell counts or probe budgets change.
    Plan: both paths run as usual (IVF gates candidates to n_probe
    cells); the overlap count is a broadcast join of two k-row results."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    q = [float(x) for x in qvec]
    exact = similarity.cosine_topk(emb, "vec_id", "embedding", q, k=ANN_K, exclude_ids=[0])
    approx = similarity.cosine_topk_ivf(
        emb, "vec_id", "embedding", q,
        k=ANN_K, num_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE, exclude_ids=[0],
    )
    return (
        exact.select("id")
        .join(approx.select("id"), "id", "inner")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(F.count(F.lit(1)) / F.lit(ANN_K), 6).alias("recall"),
        )
    )


def sql_ann_recall_audit() -> str:
    return f"""
SELECT count(*) AS n_overlap,
       round(count(*) * 1.0 / {ANN_K}, 6) AS recall
FROM ({sql_ann_topk()}) e
JOIN ({sql_ann_topk_ivf()}) a USING (id)
"""


def q_events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: portable-HLL estimate side by side
    with the exact count — the incremental corpus statistic (sketches
    merge by bucket-max; union = merge, no re-scan) with its error
    visible in the result. The HLL is md5-based with exact integer
    register arithmetic, so the DuckDB oracle reproduces the estimate
    bit-for-bit — approximate, but differentially TESTED (unlike
    ``approx_count_distinct``, whose engine-specific HLL++ no oracle
    can check). See :func:`~spark_ifs_spark.operators.sketches.
    hll_distinct`."""
    from spark_ifs_spark.operators.sketches import hll_distinct

    ev = _read(spark, sf_dir, "events")
    est = hll_distinct(ev, ["event_type"], "user_id", p=HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.round("est_distinct", 4).alias("est_distinct"),
        "exact_distinct",
    )


def sql_events_hll_users() -> str:
    from spark_ifs_spark.operators.sketches import sql_hll_distinct

    hll = sql_hll_distinct("events", ["event_type"], "user_id", p=HLL_P)
    return f"""
WITH hll AS ({hll}),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT h.event_type, round(h.est_distinct, 4) AS est_distinct, e.exact_distinct
FROM hll h JOIN exact e USING (event_type)
"""


_PROFILE_SKETCH_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_docs_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``docs_profile`` distinct counts as a TRUE single-pass plan:
    all five columns stack into (col, value) pairs map-side and feed
    ONE portable-HLL aggregate — no Expand multi-distinct (which
    replicates every input row ~6x and shuffles the distinct keys),
    shuffle bounded by 5 × 2^p register cells. This is the plan
    ``q_docs_profile``'s docstring defers to, now with an EXACT oracle
    (the portable HLL estimates identically in DuckDB) instead of the
    unverifiable ``approx_count_distinct``. Output: (col,
    est_distinct) per profiled column."""
    from spark_ifs_spark.operators.sketches import hll_distinct

    docs = _read(spark, sf_dir, "documents")
    stacked = docs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in _PROFILE_SKETCH_COLS
                ]
            )
        ).alias("s")
    ).select("s.col", "s.v").filter(F.col("v").isNotNull())
    out = hll_distinct(stacked, ["col"], "v", p=HLL_P)
    return out.select("col", F.round("est_distinct", 4).alias("est_distinct"))


def sql_docs_profile_sketch() -> str:
    from spark_ifs_spark.operators.sketches import sql_hll_distinct

    stacked = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS v FROM documents WHERE {c} IS NOT NULL"
        for c in _PROFILE_SKETCH_COLS
    )
    hll = sql_hll_distinct("vals", ["col"], "v", p=HLL_P)
    return f"""
WITH vals AS ({stacked})
SELECT col, round(est_distinct, 4) AS est_distinct
FROM ({hll}) t
"""


def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source data-quality dashboard: document count, Gopher
    pass rate (integer ppm — float-aggregate-free), and mean quality
    score per source — the report that decides which crawl sources get
    up/down-weighted in the next mix. Composes ``gopher_quality_flags``
    and ``quality_score`` (each individually oracle-gated) through one
    id-keyed join and one bounded per-source aggregate; the corpus is
    scanned twice (once per operator), each scan map-side."""
    from spark_ifs_spark.operators.textstats import (
        gopher_quality_flags,
        quality_score,
    )

    docs = _read(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, "doc_id", "text").select("id", "pass_all")
    qual = quality_score(docs, "doc_id", "text").select("id", "quality")
    src = docs.select(F.col("doc_id").alias("id"), "source")
    return (
        src.join(flags, "id")
        .join(qual, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.floor(
                F.sum(F.col("pass_all").cast("long"))
                * F.lit(1_000_000)
                / F.count(F.lit(1))
            ).cast("long").alias("pass_ppm"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
        )
    )


def sql_source_quality_report() -> str:
    from spark_ifs_spark.operators import textstats as ts

    stop_sum = " + ".join(_sql_count_word(w) for w in ts.STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id AS id, source,
         len(string_split(text, ' ')) AS n_words,
         (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
           / len(string_split(text, ' ')) AS mwl,
         ({stop_sum}) AS stop_hits
  FROM documents
),
wc AS (
  SELECT doc_id AS id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
),
top AS (SELECT id, max(c) * 1.0 / CAST(sum(c) AS BIGINT) AS top_frac FROM wc GROUP BY 1),
flags AS (
  SELECT b.id, b.source,
         (b.n_words >= {ts.GOPHER_MIN_WORDS} AND b.n_words <= {ts.GOPHER_MAX_WORDS})
           AND (b.mwl >= {ts.GOPHER_MIN_MEAN_WL} AND b.mwl <= {ts.GOPHER_MAX_MEAN_WL})
           AND b.stop_hits >= {ts.GOPHER_MIN_STOP_HITS}
           AND t.top_frac <= {ts.GOPHER_MAX_TOP_WORD_FRAC} AS pass_all,
         least(b.n_words / 50.0, 1.0)
           * (1.0 - least(abs(b.mwl - 5.0) / 5.0, 1.0))
           * least((b.stop_hits * 1.0 / b.n_words) * 5.0, 1.0) AS quality
  FROM base b JOIN top t ON b.id = t.id
)
SELECT source,
       count(*) AS n_docs,
       CAST(floor(sum(CASE WHEN pass_all THEN 1 ELSE 0 END) * 1000000.0
            / count(*)) AS BIGINT) AS pass_ppm,
       round(avg(quality), 6) AS mean_quality
FROM flags
GROUP BY source
"""


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands shape (day_number − row_number() is constant
    within an island), the one classic windowed-SQL pattern the
    registry did not yet cover. Plan: the corpus folds to DISTINCT
    (user, day) first (one hash aggregate, map-combined), so the two
    windows and the two bounded aggregates all run on the
    users × days relation, never on raw events."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("dy")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dy")
    grp = (
        F.datediff(F.col("dy"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w)
    )
    islands = days.select("user_id", grp.alias("grp"))
    return (
        islands.groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("longest_streak"))
    )


def sql_user_streaks() -> str:
    return """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dy FROM events),
g AS (
  SELECT user_id,
         datediff('day', DATE '2024-01-01', dy)
           - row_number() OVER (PARTITION BY user_id ORDER BY dy) AS grp
  FROM d
)
SELECT user_id, max(len) AS longest_streak
FROM (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2) s
GROUP BY user_id
"""


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — exact
    weighted quantile via cumulative integer weights: the first price
    whose running weight reaches half the group total. All comparisons
    are 64-bit integer (`2·cum ≥ total`), and the cumulative window
    orders by the TOTAL key (price, orderkey, linenumber), so the
    crossing row — hence the median value — is engine-reproducible.
    Plan: one per-group sort window over the lineitem projection + one
    bounded aggregate; at scale swap in `approx_percentile` when the
    per-group sort exceeds the shuffle budget (documented trade — this
    is the exact-oracle form)."""
    from pyspark.sql import Window

    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("l_returnflag")
    flagged = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    return (
        flagged.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 4).alias("w_median_price"))
    )


def sql_weighted_median_price() -> str:
    return """
WITH c AS (
  SELECT l_returnflag, l_extendedprice,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, round(min(l_extendedprice), 4) AS w_median_price
FROM c WHERE cw * 2 >= tw
GROUP BY l_returnflag
"""


def q_lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (quantity, extended price) per return
    flag from EXACT integer sufficient statistics: quantity is integral
    (cast long), price quantized to cents (floor(x·100) as long), and
    the five sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    decimal(38,0)/HUGEINT — no float addition anywhere, so the single
    final double expression computes from bit-identical inputs on both
    engines (the `supplier_zscore` convention applied to correlation).
    ONE map-combined aggregate; shuffle is 3 groups × 6 cells."""
    li = _read(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    stats = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") * n - sx * sy
    vx = F.col("sxx").cast("double") * n - sx * sx
    vy = F.col("syy").cast("double") * n - sy * sy
    return stats.select(
        "l_returnflag",
        "n",
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr_qty_price"),
    )


def sql_lineitem_corr() -> str:
    return """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sy,
         sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sxy,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(floor(l_extendedprice * 100) AS BIGINT) * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_qty_price
FROM s
"""


PAIR_LIFT_MIN_COUNT = 3
PAIR_LIFT_TOP = 30


def q_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift for co-ordered part pairs:
    ``lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`` in integer
    MICRO-units (exact 64-bit arithmetic — `n_ab·N·10⁶` tops out near
    2^41 at sf0.1), top 30 by (lift, pair) total order among pairs with
    support ≥ 3. Composes the join-free pair counts with one bounded
    per-item aggregate; the ranking is TakeOrdered, never a global
    sort."""
    from spark_ifs_spark.operators import affinity

    li = _read(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_baskets = items.select("l_orderkey").distinct().count()
    pairs = affinity.co_occurrence_pairs(
        li, "l_orderkey", "l_partkey", min_count=PAIR_LIFT_MIN_COUNT
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    fa = freq.select(F.col("l_partkey").alias("item_a"), F.col("n_item").alias("n_a"))
    fb = freq.select(F.col("l_partkey").alias("item_b"), F.col("n_item").alias("n_b"))
    out = (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.floor(
                F.col("n_baskets") * F.lit(n_baskets) * F.lit(1_000_000)
                / (F.col("n_a") * F.col("n_b"))
            ).cast("long").alias("lift_micro"),
        )
    )
    return out.orderBy(
        F.col("lift_micro").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(PAIR_LIFT_TOP)


def sql_part_pair_lift() -> str:
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
pairs AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, count(*) AS n_baskets
  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PAIR_LIFT_MIN_COUNT}
),
freq AS (SELECT l_partkey, count(*) AS n_item FROM items GROUP BY 1)
SELECT p.item_a, p.item_b, p.n_baskets,
       CAST(floor(p.n_baskets * nb.n * 1000000.0 / (fa.n_item * fb.n_item)) AS BIGINT) AS lift_micro
FROM pairs p
JOIN freq fa ON fa.l_partkey = p.item_a
JOIN freq fb ON fb.l_partkey = p.item_b
CROSS JOIN nb
ORDER BY lift_micro DESC, item_a ASC, item_b ASC
LIMIT {PAIR_LIFT_TOP}
"""


KWIC_TERMS = ["spark", "shuffle"]
KWIC_WINDOW = 2
KWIC_LIMIT = 200


def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context extraction: a ±2-word snippet around every
    occurrence of the query terms — the retrieval-UX primitive (search
    result previews, concordance building). Token-array based, NOT
    regex: Spark's Java regex and DuckDB's RE2 disagree on enough edge
    semantics that the oracle-exact form is array slicing over the same
    whitespace split both engines already share. Map-side per doc (one
    interpreted-HOF position filter + slices); the only shuffle is the
    deterministic (doc, pos) TakeOrdered cut."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = F.size(toks)
    hits = F.filter(
        F.sequence(F.lit(1), m),
        lambda i: F.element_at(toks, i).isin(*KWIC_TERMS),
    )
    lo = F.greatest(F.col("pos") - KWIC_WINDOW, F.lit(1))
    hi = F.least(F.col("pos") + KWIC_WINDOW, F.col("m"))
    return (
        docs.select(
            F.col("doc_id"), m.alias("m"), toks.alias("t"),
            F.explode(hits).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.element_at(F.col("t"), F.col("pos")).alias("term"),
            F.array_join(
                F.slice(F.col("t"), lo, hi - lo + 1), " "
            ).alias("snippet"),
        )
        .orderBy("doc_id", "pos")
        .limit(KWIC_LIMIT)
    )


def sql_kwic_snippets() -> str:
    terms = ", ".join(f"'{t}'" for t in KWIC_TERMS)
    w = KWIC_WINDOW
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hits AS (
  SELECT doc_id, t, s.i AS pos
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
  WHERE t[s.i] IN ({terms})
)
SELECT doc_id, pos, t[pos] AS term,
       array_to_string(t[greatest(pos - {w}, 1):least(pos + {w}, len(t))], ' ') AS snippet
FROM hits
ORDER BY doc_id, pos
LIMIT {KWIC_LIMIT}
"""


def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival statistics: mean and max gap between a
    user's consecutive events of the same type — the workload-cadence
    profile capacity planning reads. Exact integer arithmetic
    throughout: gaps are epoch-microsecond differences, the mean is
    ``floor(Σgap / n)`` — no float aggregation. ONE (user, type)-keyed
    lag window over the events projection, then a bounded per-type
    aggregate."""
    from pyspark.sql import Window

    from spark_ifs_spark.functions.timeutil import epoch_us

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = epoch_us(ev, "ts")
    gaps = (
        ev.select(
            "event_type",
            (us - F.lag(us).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.floor(F.sum("gap_us") / F.count(F.lit(1))).cast("long").alias("mean_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def sql_events_interarrival() -> str:
    return """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       CAST(floor(sum(gap_us) * 1.0 / count(*)) AS BIGINT) AS mean_gap_us,
       max(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


HIST_BIN_WIDTH = 25


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the monitoring
    distribution chart. Bin = floor(value / 25) computed identically in
    both engines (one double division + floor); ONE map-combined
    aggregate, shuffle bounded by types × bins."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.floor(F.col("value") / HIST_BIN_WIDTH).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_events_value_histogram() -> str:
    return f"""
SELECT event_type, CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin, count(*) AS n
FROM events
GROUP BY 1, 2
"""


def q_lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test over the (lang, source) contingency
    table — "is language distribution uniform across crawl sources?",
    the categorical-drift alarm. Reuses the engine's contingency
    discipline (the MI operators' counts-only aggregation): observed
    counts and the two marginals are exact integers from ONE hash
    aggregate over the corpus plus two bounded rollups; the single
    float expression ``Σ (o − e)²/e`` runs over the bounded levels²
    relation. Output: one row (chi2, dof)."""
    docs = _read(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    row = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    col = obs.groupBy("source").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast("double")
    cells = (
        obs.join(F.broadcast(row), "lang")
        .join(F.broadcast(col), "source")
        .crossJoin(F.broadcast(tot))
        .select(((F.col("o").cast("double") - e) * (F.col("o") - e) / e).alias("x"))
    )
    nlang = docs.select("lang").distinct().count()
    nsrc = docs.select("source").distinct().count()
    return cells.agg(
        F.round(F.sum("x"), 6).alias("chi2"),
        F.lit((nlang - 1) * (nsrc - 1)).cast("long").alias("dof"),
    )


def sql_lang_source_chisq() -> str:
    return """
WITH obs AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(o) AS r FROM obs GROUP BY 1),
c AS (SELECT source, sum(o) AS c FROM obs GROUP BY 1),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
dims AS (
  SELECT (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof
  FROM documents
)
SELECT round(sum((obs.o - CAST(r.r AS DOUBLE) * c.c / t.n)
                * (obs.o - CAST(r.r AS DOUBLE) * c.c / t.n)
                / (CAST(r.r AS DOUBLE) * c.c / t.n)), 6) AS chi2,
       CAST(any_value(dims.dof) AS BIGINT) AS dof
FROM obs JOIN r USING (lang) JOIN c USING (source), t, dims
"""


def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each source's token distribution —
    low entropy = templated/repetitive source, the distributional
    quality signal next to the rule-based filters. Computed as
    ``ln N − (Σ c·ln c)/N`` from exact integer token counts (one
    (source, token) hash aggregate, map-combined; the log-sum runs on
    the bounded vocab × sources relation)."""
    docs = _read(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("_clnc"),
        )
        .select(
            "source",
            "n_tokens",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("_clnc") / F.col("n_tokens").cast("double"),
                6,
            ).alias("entropy_nats"),
        )
    )


def sql_source_token_entropy() -> str:
    return """
WITH counts AS (
  SELECT source, w, count(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(ln(CAST(sum(c) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(sum(c) AS DOUBLE), 6) AS entropy_nats
FROM counts
GROUP BY source
"""


def q_user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user — each value weighted
    by how long it was "current" (until the user's next event): the
    billing/sensor aggregation where a plain mean over-counts bursts.
    Exact integer core: values quantize to cents, durations are
    epoch-µs lag differences, and Σ(v_c·Δt) / ΣΔt accumulates as
    decimal(38,0)/HUGEINT products — the one double division happens on
    exact inputs. ONE user-keyed lead window + one bounded aggregate."""
    from pyspark.sql import Window

    from spark_ifs_spark.functions.timeutil import epoch_us

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(ev, "ts")
    spans = (
        ev.select(
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("vc"),
            (F.lead(us).over(w) - us).alias("dt"),
        )
        .filter(F.col("dt").isNotNull())
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.sum((F.col("vc") * F.col("dt")).cast("decimal(38,0)")).alias("_num"),
            F.sum("dt").alias("_den"),
        )
        .select(
            "user_id",
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double") / 100.0, 6
            ).alias("twa_value"),
        )
    )


def sql_user_value_twa() -> str:
    return """
WITH spans AS (
  SELECT user_id,
         CAST(floor(value * 100) AS BIGINT) AS vc,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt
  FROM events
)
SELECT user_id,
       round(CAST(sum(vc * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE) / 100.0, 6)
         AS twa_value
FROM spans WHERE dt IS NOT NULL
GROUP BY user_id
"""


SLA_DAYS = 60


def q_orders_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfilment SLA by priority: the share of orders whose
    EVERY lineitem shipped within 60 days — relational division
    ("for all") folded into one aggregate: ``min(shipped_in_sla)`` per
    order instead of NOT EXISTS probing, then an integer-ppm rollup per
    priority. Two aggregates, both map-combined; the orders⋈lineitem
    join keys on the natural co-partitioned key."""
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            (
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr(f"INTERVAL {SLA_DAYS} DAYS")
            ).cast("int").alias("in_sla"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.min("in_sla").alias("all_in_sla"))
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(
            F.sum("all_in_sla") * F.lit(1_000_000) / F.count(F.lit(1))
        ).cast("long").alias("sla_ppm"),
    )


def sql_orders_sla() -> str:
    return f"""
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         min(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL {SLA_DAYS} DAY
                  THEN 1 ELSE 0 END) AS all_in_sla
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(floor(sum(all_in_sla) * 1000000.0 / count(*)) AS BIGINT) AS sla_ppm
FROM per_order
GROUP BY o_orderpriority
"""


def q_events_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT users per day — the rolling-uniques
    dashboard metric that exact windowing cannot do incrementally
    (distinct doesn't decompose over sliding windows) and the portable
    HLL does by construction: per-day register files build once from
    the corpus, and each day's trailing window is a bucket-max MERGE of
    ≤7 bounded register sets (days × 2^p cells — the corpus is touched
    exactly once). THE use case mergeable sketches exist for, with the
    estimate still exactly reproduced by the DuckDB oracle."""
    from spark_ifs_spark.operators.sketches import hll_estimate, hll_registers

    ev = _read(spark, sf_dir, "events")
    daily = hll_registers(
        ev.select(F.to_date("ts").alias("dy"), "user_id"), ["dy"], "user_id", p=HLL_P
    )
    days = daily.select("dy").distinct()
    win = days.select(F.col("dy").alias("win_day")).join(
        daily,
        (F.col("dy") <= F.col("win_day"))
        & (F.col("dy") >= F.date_sub(F.col("win_day"), 6)),
    )
    merged = win.groupBy("win_day", "_b").agg(F.max("_M").alias("_M"))
    out = hll_estimate(merged, ["win_day"], p=HLL_P)
    return out.select(
        F.date_format("win_day", "yyyy-MM-dd").alias("day"),
        F.round("est_distinct", 4).alias("est_users_7d"),
    )


def sql_events_rolling_7d_users() -> str:
    from spark_ifs_spark.operators.sketches import _hll_alpha

    m = 1 << HLL_P
    wbits = 60 - HLL_P
    K = wbits + 1
    num = _hll_alpha(m) * m * m * float(1 << K)
    from spark_ifs_spark.functions.hashing import sql_md5_int60

    h = sql_md5_int60("CAST(user_id AS VARCHAR)")
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dy, ({h}) % {m} AS b,
         max(CASE WHEN ({h}) // {m} > 0
             THEN {wbits} - length(bin(({h}) // {m})) + 1
             ELSE {K} END) AS M
  FROM events
  GROUP BY 1, 2
),
days AS (SELECT DISTINCT dy AS win_day FROM daily),
merged AS (
  SELECT d.win_day, r.b, max(r.M) AS M
  FROM days d JOIN daily r
    ON r.dy <= d.win_day AND r.dy >= d.win_day - INTERVAL 6 DAY
  GROUP BY 1, 2
),
per_day AS (
  SELECT win_day,
         CAST(sum(1::BIGINT << ({K} - M)) AS BIGINT) AS s_present,
         count(*) AS n_present
  FROM merged GROUP BY 1
),
scored AS (
  SELECT win_day, n_present,
         CAST({num!r} AS DOUBLE)
           / CAST(s_present + ({m} - n_present) * (1::BIGINT << {K}) AS DOUBLE) AS raw
  FROM per_day
)
SELECT strftime(win_day, '%Y-%m-%d') AS day,
       round(CASE WHEN raw <= {2.5 * m!r} AND {m} - n_present > 0
                  THEN CAST({float(m)!r} AS DOUBLE)
                       * ln(CAST({float(m)!r} AS DOUBLE) / CAST({m} - n_present AS DOUBLE))
                  ELSE raw END, 4) AS est_users_7d
FROM scored
"""


def q_events_autocorr7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation of daily event volume — "is there a weekly
    cycle?" — as exact-integer Pearson over the (day, day+7) pairs of
    the BOUNDED daily-counts relation (corpus folds to one count per
    day first; the self-join and the five sufficient sums touch ~30
    rows). Same decimal-exact convention as ``lineitem_corr``."""
    ev = _read(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("dy")).agg(
        F.count(F.lit(1)).alias("x")
    )
    lead = daily.select(
        F.date_sub(F.col("dy"), 7).alias("dy"), F.col("x").alias("y")
    )
    pairs = daily.join(lead, "dy").select("x", "y")
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") * n - sx * sy
    vx = F.col("sxx").cast("double") * n - sx * sx
    vy = F.col("syy").cast("double") * n - sy * sy
    return stats.select(
        "n", F.round(cov / F.sqrt(vx * vy), 6).alias("autocorr_lag7")
    )


def sql_events_autocorr7() -> str:
    return """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dy, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.x, b.x AS y
  FROM daily a JOIN daily b ON b.dy = a.dy + INTERVAL 7 DAY
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs
)
SELECT n,
       round((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS autocorr_lag7
FROM s
"""


def q_source_size_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of corpus mass across sources — the one-number
    concentration alarm ("90% of chars from one crawl host?"). Exact
    integer core over the BOUNDED per-source totals:
    ``G = (2·Σᵢ i·sᵢ / (n·Σs)) − (n+1)/n`` with sizes ranked ascending
    (ties broken by source name — total order, engine-reproducible);
    the corpus itself folds in one map-combined aggregate."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.sum("n_chars").alias("s"))
    w = Window.orderBy("s", "source")
    ranked = sizes.select(
        F.col("s"),
        F.row_number().over(w).alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("s")).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.sum("s").cast("double"))
            - (F.count(F.lit(1)) + 1).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("gini"),
    )


def sql_source_size_gini() -> str:
    return """
WITH sizes AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s, source) AS i FROM sizes
)
SELECT count(*) AS n_sources,
       round(2.0 * CAST(sum(i * s) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * CAST(sum(s) AS DOUBLE))
             - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS gini
FROM ranked
"""


MAD_SCALE = 1.4826
MAD_K = 3.0


def q_supplier_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on supplier balances per nation: MAD
    (median absolute deviation) instead of stddev — one extreme balance
    cannot mask others (the flaw of the z-score form, kept side by side
    as ``supplier_zscore``). Both medians are EXACT lower-medians via
    the same integer cumulative-count crossing as the weighted median
    (total-ordered windows, engine-reproducible); the only float step
    is the final ``|x−med| > 3·1.4826·MAD`` comparison on identical
    doubles. Windows run per nation over the bounded supplier
    relation."""
    from pyspark.sql import Window

    supp = _read(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )

    def lower_median(df, part, val, extra_order, out):
        cum = Window.partitionBy(part).orderBy(val, *extra_order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        tot = Window.partitionBy(part)
        flagged = df.select(
            "*",
            F.count(F.lit(1)).over(cum).alias("_cn"),
            F.count(F.lit(1)).over(tot).alias("_tn"),
        )
        med = (
            flagged.filter(F.col("_cn") * 2 >= F.col("_tn"))
            .groupBy(part)
            .agg(F.min(val).alias(out))
        )
        return df.join(F.broadcast(med), part)

    with_med = lower_median(
        supp, "s_nationkey", "s_acctbal", ["s_suppkey"], "med"
    )
    dev = with_med.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        "med",
        F.abs(F.col("s_acctbal") - F.col("med")).alias("adev"),
    )
    with_mad = lower_median(dev, "s_nationkey", "adev", ["s_suppkey"], "mad")
    return (
        with_mad.groupBy("s_nationkey")
        .agg(
            F.round(F.min("med"), 4).alias("median_bal"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.col("adev") > F.lit(MAD_K * MAD_SCALE) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )


def sql_supplier_mad_outliers() -> str:
    return f"""
WITH c1 AS (
  SELECT s_suppkey, s_nationkey, s_acctbal,
         count(*) OVER (PARTITION BY s_nationkey
                        ORDER BY s_acctbal, s_suppkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         count(*) OVER (PARTITION BY s_nationkey) AS tn
  FROM supplier
),
med AS (
  SELECT s_nationkey, min(s_acctbal) AS med
  FROM c1 WHERE cn * 2 >= tn GROUP BY 1
),
dev AS (
  SELECT s.s_suppkey, s.s_nationkey, s.s_acctbal, m.med,
         abs(s.s_acctbal - m.med) AS adev
  FROM supplier s JOIN med m USING (s_nationkey)
),
c2 AS (
  SELECT *,
         count(*) OVER (PARTITION BY s_nationkey
                        ORDER BY adev, s_suppkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         count(*) OVER (PARTITION BY s_nationkey) AS tn
  FROM dev
),
mad AS (
  SELECT s_nationkey, min(adev) AS mad
  FROM c2 WHERE cn * 2 >= tn GROUP BY 1
)
SELECT d.s_nationkey,
       round(min(d.med), 4) AS median_bal,
       round(min(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN d.adev > {MAD_K * MAD_SCALE} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m USING (s_nationkey)
GROUP BY d.s_nationkey
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the confusion matrix of the
    heuristic language-ID against the labeled ``lang`` column — the
    eval loop every model-assisted pipeline stage needs, run where the
    data lives instead of exporting samples. One map-side prediction
    projection (the ``lang_id`` operator) + one bounded langs² hash
    aggregate."""
    docs = _read(spark, sf_dir, "documents")
    pred = textstats.lang_id(docs, "doc_id", "text")
    truth = docs.select(F.col("doc_id").alias("id"), F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_langid_confusion() -> str:
    return f"""
WITH pred AS ({sql_lang_id()})
SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
FROM documents d JOIN pred p ON p.id = d.doc_id
GROUP BY 1, 2
"""


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency profile: for users who viewed then purchased,
    the exact lower-median and max of the view→purchase delay — the
    "how long does conversion take" companion to the funnel counts.
    Delays are exact epoch-µs differences (first view to first
    purchase per user, min-folded — no window needed); the median is
    the integer cumulative-count crossing over the bounded
    converted-users relation."""
    from pyspark.sql import Window

    from spark_ifs_spark.functions.timeutil import epoch_us

    ev = _read(spark, sf_dir, "events")
    us = epoch_us(ev, "ts")
    firsts = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
            F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_buy"),
        )
        .filter(
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
            & (F.col("first_buy") > F.col("first_view"))
        )
        .select(
            "user_id", (F.col("first_buy") - F.col("first_view")).alias("delay_us")
        )
    )
    cum = Window.orderBy("delay_us", "user_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    flagged = firsts.select(
        "delay_us",
        F.count(F.lit(1)).over(cum).alias("_cn"),
        F.count(F.lit(1)).over(tot).alias("_tn"),
    )
    return flagged.agg(
        F.max("_tn").alias("n_converted"),
        F.min(F.when(F.col("_cn") * 2 >= F.col("_tn"), F.col("delay_us"))).alias(
            "median_delay_us"
        ),
        F.max("delay_us").alias("max_delay_us"),
    )


def sql_funnel_latency() -> str:
    return """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id
),
delays AS (
  SELECT user_id, first_buy - first_view AS delay_us
  FROM firsts
  WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
    AND first_buy > first_view
),
c AS (
  SELECT delay_us,
         count(*) OVER (ORDER BY delay_us, user_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         count(*) OVER () AS tn
  FROM delays
)
SELECT max(tn) AS n_converted,
       min(CASE WHEN cn * 2 >= tn THEN delay_us END) AS median_delay_us,
       max(delay_us) AS max_delay_us
FROM c
"""


IMPUTE_MISSING_MOD = 13


def q_events_imputed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation: values for ``event_id % 13 == 0`` play
    the missing set and are replaced by their event type's exact
    lower-median of the OBSERVED values — the standard repair step
    before feature extraction. Reported as per-type (n_missing,
    imputed_value, observed_mean) so the oracle compares the full
    repair compactly. Median machinery is the integer cumulative-count
    crossing, per type, over the observed relation."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    marked = ev.select(
        "event_type",
        "event_id",
        F.when(F.col("event_id") % IMPUTE_MISSING_MOD == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    observed = marked.filter(F.col("v").isNotNull())
    cum = Window.partitionBy("event_type").orderBy("v", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    med = (
        observed.select(
            "event_type",
            "v",
            F.count(F.lit(1)).over(cum).alias("_cn"),
            F.count(F.lit(1)).over(tot).alias("_tn"),
        )
        .filter(F.col("_cn") * 2 >= F.col("_tn"))
        .groupBy("event_type")
        .agg(F.min("v").alias("imputed_value"))
    )
    stats = marked.groupBy("event_type").agg(
        F.sum(F.col("v").isNull().cast("long")).alias("n_missing"),
        F.round(F.avg("v"), 6).alias("observed_mean"),
    )
    return stats.join(med, "event_type").select(
        "event_type",
        "n_missing",
        F.round("imputed_value", 4).alias("imputed_value"),
        "observed_mean",
    )


def sql_events_imputed() -> str:
    m = IMPUTE_MISSING_MOD
    return f"""
WITH marked AS (
  SELECT event_type, event_id,
         CASE WHEN event_id % {m} = 0 THEN NULL ELSE value END AS v
  FROM events
),
c AS (
  SELECT event_type, v,
         count(*) OVER (PARTITION BY event_type ORDER BY v, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         count(*) OVER (PARTITION BY event_type) AS tn
  FROM marked WHERE v IS NOT NULL
),
med AS (
  SELECT event_type, min(v) AS imputed_value
  FROM c WHERE cn * 2 >= tn GROUP BY 1
),
stats AS (
  SELECT event_type,
         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
         round(avg(v), 6) AS observed_mean
  FROM marked GROUP BY 1
)
SELECT s.event_type, s.n_missing, round(m.imputed_value, 4) AS imputed_value,
       s.observed_mean
FROM stats s JOIN med m USING (event_type)
"""


HIST_QUANTILES = [0.5, 0.95, 0.99]


def q_events_value_pcts_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of event values per type from the fixed-bin
    histogram — the MERGEABLE quantile sketch completing the portable
    sketch family (CMS = frequency, HLL = distinct, histogram CDF =
    quantiles): bin counts add across partitions/batches, state is
    types × bins, and the estimate (linear interpolation inside the
    crossing bin) is deterministic double arithmetic over exact integer
    cumulative counts — identical in both engines, like every sketch
    here. Exactly one bin satisfies ``cum ≥ q·N > cum − n``, so each
    percentile resolves without ties. Bounded-relation window only;
    the corpus folds in one map-combined aggregate. Unlike
    ``approx_percentile`` (engine-specific, unverifiable), this sketch
    has an exact oracle; unlike the exact window quantiles
    (``doc_length_quantiles``), it needs no per-group sort of the
    corpus — the 100 TB trade, made checkable."""
    from pyspark.sql import Window

    w_ = float(HIST_BIN_WIDTH)
    ev = _read(spark, sf_dir, "events")
    bins = (
        ev.select(
            "event_type",
            F.floor(F.col("value") / HIST_BIN_WIDTH).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cumw = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totw = Window.partitionBy("event_type")
    c = bins.select(
        "event_type",
        "bin",
        "n",
        F.sum("n").over(cumw).alias("cum"),
        F.sum("n").over(totw).alias("tot"),
    )

    def pct(q: float):
        qt = F.lit(q) * F.col("tot").cast("double")
        crossing = (F.col("cum").cast("double") >= qt) & (
            (F.col("cum") - F.col("n")).cast("double") < qt
        )
        interp = F.col("bin").cast("double") * w_ + F.lit(w_) * (
            qt - (F.col("cum") - F.col("n")).cast("double")
        ) / F.col("n").cast("double")
        return F.round(F.min(F.when(crossing, interp)), 4).alias(
            f"p{int(q * 100)}"
        )

    return c.groupBy("event_type").agg(*[pct(q) for q in HIST_QUANTILES])


def sql_events_value_pcts_hist() -> str:
    w_ = float(HIST_BIN_WIDTH)
    parts = []
    for q in HIST_QUANTILES:
        qt = f"({q!r} * CAST(tot AS DOUBLE))"
        interp = (
            f"CAST(bin AS DOUBLE) * {w_!r} + {w_!r} * ({qt} - CAST(cum - n AS DOUBLE))"
            f" / CAST(n AS DOUBLE)"
        )
        parts.append(
            f"round(min(CASE WHEN CAST(cum AS DOUBLE) >= {qt}"
            f" AND CAST(cum - n AS DOUBLE) < {qt} THEN {interp} END), 4)"
            f" AS p{int(q * 100)}"
        )
    cols = ",\n       ".join(parts)
    return f"""
WITH bins AS (
  SELECT event_type, CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, n,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
  FROM bins
)
SELECT event_type,
       {cols}
FROM c
GROUP BY event_type
"""


def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based survivor selection: per near-dup cluster, keep the
    HIGHEST-quality member (ties to the lowest id) instead of the
    min-id convention — the policy real pipelines want, since the first
    crawl of a page is rarely its cleanest copy. One ``max_by``-style
    ``max(struct(quality, -id))`` aggregate over the cluster relation
    joined with the (map-side) quality scores; no window, no sort."""
    from spark_ifs_spark.operators.graph import connected_components
    from spark_ifs_spark.operators.textstats import quality_score

    docs = _read(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=NGRAM_N, num_hashes=MINHASH_HASHES,
        rows_per_band=MINHASH_ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    )
    cc = connected_components(pairs)
    qual = quality_score(docs, "doc_id", "text").select("id", "quality")
    best = (
        cc.join(qual, "id")
        .groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("quality").alias("q"), (-F.col("id")).alias("neg_id")
                )
            ).alias("_b"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            F.col("component").alias("cluster"),
            (-F.col("_b.neg_id")).cast("long").alias("keep_id"),
            F.round("_b.q", 6).alias("keep_quality"),
            "cluster_size",
        )
    )
    return best


def sql_cluster_representatives() -> str:
    return f"""
WITH clusters AS (SELECT * FROM ({sql_dup_clusters()}) t),
qual AS (
  SELECT id, least(n_words / 50.0, 1.0)
           * (1.0 - least(abs(mean_wl - 5.0) / 5.0, 1.0))
           * least(stop_ratio * 5.0, 1.0) AS quality
  FROM (
    SELECT doc_id AS id,
           len(string_split(text, ' ')) AS n_words,
           (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
             / len(string_split(text, ' ')) AS mean_wl,
           ({' + '.join(_sql_count_word(w) for w in textstats.STOPWORDS)}) * 1.0
             / len(string_split(text, ' ')) AS stop_ratio
    FROM documents
  ) b
),
j AS (
  SELECT c.cluster, c.doc_id, q.quality
  FROM clusters c JOIN qual q ON q.id = c.doc_id
),
mx AS (
  SELECT cluster, max(quality) AS mq, count(*) AS cluster_size
  FROM j GROUP BY cluster
)
SELECT j.cluster,
       CAST(min(j.doc_id) AS BIGINT) AS keep_id,
       round(any_value(mx.mq), 6) AS keep_quality,
       CAST(any_value(mx.cluster_size) AS BIGINT) AS cluster_size
FROM j JOIN mx ON j.cluster = mx.cluster AND j.quality = mx.mq
GROUP BY j.cluster
"""


#: Benford expected first-digit frequencies, integer ppm (computed once
#: in Python and embedded as literals in BOTH engines)
import math as _math

_BENFORD_PPM = {
    d: int(_math.floor(_math.log10(1 + 1 / d) * 1_000_000)) for d in range(1, 10)
}


def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensics on extended prices: observed first-digit
    frequencies (integer ppm) against the Benford expectation — the
    fabricated-data screen auditors run on financial columns. One
    map-combined digit aggregate (9-row shuffle); the expectation is a
    9-literal lookup, identical in both engines by construction."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") >= 1)
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("long").cast("string"), 1, 1
    )
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("t"))
    exp = F.create_map(
        *[x for d, p in _BENFORD_PPM.items() for x in (F.lit(str(d)), F.lit(p))]
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.floor(F.col("n") * F.lit(1_000_000) / F.col("t")).cast("long").alias(
                "observed_ppm"
            ),
            exp[F.col("digit")].cast("long").alias("benford_ppm"),
        )
    )


def sql_benford_first_digit() -> str:
    cases = " ".join(
        f"WHEN digit = '{d}' THEN {p}" for d, p in _BENFORD_PPM.items()
    )
    return f"""
WITH counts AS (
  SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
         count(*) AS n
  FROM lineitem WHERE l_extendedprice >= 1
  GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
SELECT digit, n,
       CAST(floor(n * 1000000.0 / t.t) AS BIGINT) AS observed_ppm,
       CAST(CASE {cases} END AS BIGINT) AS benford_ppm
FROM counts, t
"""


# Registry order matters: the driver's correctness gate checks a positional
# window of the first 50 entries. Round 3 gated entries 1-50 of the old
# ordering; round 4 rotates every never-yet-gated query to the front —
# positions 1-50 are now EXACTLY the 50 queries without a prior driver
# CORRECTNESS row (24 new in round 4 + the 26 ungated from round 3),
# so after this round every registered query has at least one hard
# driver-side row across r3+r4. Queries added after the window filled
# (session_journeys through events_imputed — the second/third-pass
# round-4 batches) sit last and rotate forward in round 5; they are the
# only never-gated entries remaining. Entries beyond the window stay
# oracle-verified locally by tests/test_entry_oracle.py, which
# replicates the driver's gate per query at sf0.001 (and on demand at
# sf0.01/sf0.1 via SPARK_IFS_TEST_SF_DIR; every query added this round
# was additionally gated green at sf0.01 as it landed).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- new in round 4 (never gated) ---
    "textrank_keywords": q_textrank_keywords,
    "event_transitions": q_event_transitions,
    "docs_weighted_sample": q_docs_weighted_sample,
    "events_funnel": q_events_funnel,
    "events_cohorts": q_events_cohorts,
    "events_scd2": q_events_scd2,
    "cms_term_counts": q_cms_term_counts,
    "pmi_top_pairs": q_pmi_top_pairs,
    "quality_lr_score": q_quality_lr_score,
    "market_share": q_market_share,
    "custdist": q_custdist,
    "big_volume_customers": q_big_volume_customers,
    "widget_part_suppliers": q_widget_part_suppliers,
    "decontam_overlap": q_decontam_overlap,
    "bm25_topk": q_bm25_topk,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "ann_topk_sq8": q_ann_topk_sq8,
    "dedup_exact_normalized": q_dedup_exact_normalized,
    "pipeline_audit": q_pipeline_audit,
    "dedup_fuzzy_edit": q_dedup_fuzzy_edit,
    "ann_topk_ivf_trained": q_ann_topk_ivf_trained,
    "nation_trade_volume": q_nation_trade_volume,
    "bracket_revenue": q_bracket_revenue,
    "top_supplier": q_top_supplier,
    # --- ungated in round 3 (old positions 51-76) ---
    "bpe_pairs_top50": q_bpe_pairs_top50,
    "bpe_train_merges": q_bpe_train,
    "bpe_token_counts": q_bpe_token_counts,
    "embedding_gram": q_embedding_gram,
    "pca_power_step": q_pca_power_step,
    "pca_power_iter2": q_pca_power_iter2,
    "shipping_priority": q_shipping_priority,
    "returned_revenue": q_returned_revenue,
    "order_priority_mix": q_order_priority_mix,
    "promo_revenue": q_promo_revenue,
    "small_order_revenue": q_small_order_revenue,
    "idle_customers": q_idle_customers,
    "lm_bigram_logprob": q_lm_bigram_logprob,
    "embedding_project": q_embedding_project,
    "source_overlap": q_source_overlap,
    "events_latest_state": q_events_latest_state,
    "docs_sample_n": q_docs_sample_n,
    "events_winsorized": q_events_winsorized,
    "docs_profile": q_docs_profile,
    "events_rollup": q_events_rollup,
    "docs_length_deciles": q_docs_length_deciles,
    "events_type_pivot": q_events_type_pivot,
    "corpus_diff": q_corpus_diff,
    "events_props_json": q_events_props_json,
    "unconverted_views": q_unconverted_views,
    "events_cube": q_events_cube,
    # --- gated green in round 3; most load-bearing kept inside the window ---
    "mi_pair_lineitem": q_mi_pair_lineitem,
    "mi_relevance": q_mi_relevance,
    "mi_matrix": q_mi_matrix,
    "mrmr_top1": q_mrmr_top1,
    "mrmr_select_k5": q_mrmr_select_k5,
    "mrmr_miq_k5": q_mrmr_miq_k5,
    "row_select_k5": q_row_select_k5,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_bucketed": q_dedup_embedding_bucketed,
    "dedup_spans": q_dedup_spans,
    "dedup_incremental": q_dedup_incremental,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_lsh": q_ann_topk_lsh,
    "events_daily": q_events_daily,
    "events_sessionize": q_events_sessionize,
    "events_user_stats": q_events_user_stats,
    "pipeline_end_to_end": q_pipeline_end_to_end,
    "dup_clusters": q_dup_clusters,
    "kmeans_step": q_kmeans_step,
    # --- gated green in round 3; beyond the window this round ---
    "embedding_top_pairs": q_embedding_top_pairs,
    "text_token_counts": q_text_token_counts,
    "text_quality": q_text_quality,
    "text_repetition": q_text_repetition,
    "corpus_clean": q_corpus_clean,
    "vocab_top50": q_vocab_top50,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_features": q_multimodal_features,
    "lineitem_pricing": q_lineitem_pricing,
    "nation_revenue": q_nation_revenue,
    "priority_orders": q_priority_orders,
    "events_topk_per_type": q_events_topk_per_type,
    "events_asof_signup": q_events_asof_signup,
    "events_attribution": q_events_attribution,
    "events_rolling_7d": q_events_rolling_7d,
    "supplier_diversity": q_supplier_diversity,
    "split_counts": q_split_counts,
    "docs_cap_per_source": q_docs_cap_per_source,
    "scrub_pii": q_scrub_pii,
    "doc_chunks": q_doc_chunks,
    "packed_bins": q_packed_bins,
    "decontam_ids": q_decontam_ids,
    "tfidf_top3": q_tfidf_top3,
    "doc_length_quantiles": q_doc_length_quantiles,
    "mix_by_source": q_mix_by_source,
    "session_journeys": q_session_journeys,
    "supplier_zscore": q_supplier_zscore,
    "monthly_growth": q_monthly_growth,
    "events_daily_anomaly": q_events_daily_anomaly,
    "customer_rfm": q_customer_rfm,
    # --- added after the round-4 window filled; rotate forward in round 5 ---
    "forecast_revenue": q_forecast_revenue,
    "late_suppliers": q_late_suppliers,
    "part_pair_counts": q_part_pair_counts,
    "decontam_bloom": q_decontam_bloom,
    "boilerplate_shingles": q_boilerplate_shingles,
    "docs_novelty": q_docs_novelty,
    "docs_temperature_mix": q_docs_temperature_mix,
    "gopher_filters": q_gopher_filters,
    "split_leakage": q_split_leakage,
    "cluster_size_stats": q_cluster_size_stats,
    "ann_recall_audit": q_ann_recall_audit,
    "events_hll_users": q_events_hll_users,
    "docs_profile_sketch": q_docs_profile_sketch,
    "source_quality_report": q_source_quality_report,
    "user_streaks": q_user_streaks,
    "weighted_median_price": q_weighted_median_price,
    "lineitem_corr": q_lineitem_corr,
    "part_pair_lift": q_part_pair_lift,
    "kwic_snippets": q_kwic_snippets,
    "events_interarrival": q_events_interarrival,
    "events_value_histogram": q_events_value_histogram,
    "lang_source_chisq": q_lang_source_chisq,
    "source_token_entropy": q_source_token_entropy,
    "user_value_twa": q_user_value_twa,
    "orders_sla": q_orders_sla,
    "events_rolling_7d_users": q_events_rolling_7d_users,
    "events_autocorr7": q_events_autocorr7,
    "source_size_gini": q_source_size_gini,
    "supplier_mad_outliers": q_supplier_mad_outliers,
    "langid_confusion": q_langid_confusion,
    "funnel_latency": q_funnel_latency,
    "events_imputed": q_events_imputed,
    "events_value_pcts_hist": q_events_value_pcts_hist,
    "cluster_representatives": q_cluster_representatives,
    "benford_first_digit": q_benford_first_digit,
    # --- new in round 5 (stay at the END until gated; see rotation note) ---
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_embedding_lsh_recall": q_dedup_embedding_lsh_recall,
}

ORACLES: dict[str, str] = {
    # --- new in round 4 (never gated) ---
    "textrank_keywords": sql_textrank_keywords(),
    "event_transitions": sql_event_transitions(),
    "docs_weighted_sample": sql_docs_weighted_sample(),
    "events_funnel": sql_events_funnel(),
    "events_cohorts": sql_events_cohorts(),
    "events_scd2": sql_events_scd2(),
    "cms_term_counts": sql_cms_term_counts(),
    "pmi_top_pairs": sql_pmi_top_pairs(),
    "quality_lr_score": sql_quality_lr_score(),
    "market_share": sql_market_share(),
    "custdist": sql_custdist(),
    "big_volume_customers": sql_big_volume_customers(),
    "widget_part_suppliers": sql_widget_part_suppliers(),
    "decontam_overlap": sql_decontam_overlap(),
    "bm25_topk": sql_bm25_topk(),
    "tfidf_cosine_pairs": sql_tfidf_cosine_pairs(),
    "ann_topk_sq8": sql_ann_topk_sq8(),
    "dedup_exact_normalized": sql_dedup_exact_normalized(),
    "pipeline_audit": sql_pipeline_audit(),
    "dedup_fuzzy_edit": sql_dedup_fuzzy_edit(),
    "ann_topk_ivf_trained": sql_ann_topk_ivf_trained(),
    "nation_trade_volume": sql_nation_trade_volume(),
    "bracket_revenue": sql_bracket_revenue(),
    "top_supplier": sql_top_supplier(),
    # --- ungated in round 3 (old positions 51-76) ---
    "bpe_pairs_top50": sql_bpe_pairs_top50(),
    "bpe_train_merges": sql_bpe_train(),
    "bpe_token_counts": sql_bpe_token_counts(),
    "embedding_gram": sql_embedding_gram(),
    "pca_power_step": sql_pca_power_step(),
    "pca_power_iter2": sql_pca_power_iter2(),
    "shipping_priority": sql_shipping_priority(),
    "returned_revenue": sql_returned_revenue(),
    "order_priority_mix": sql_order_priority_mix(),
    "promo_revenue": sql_promo_revenue(),
    "small_order_revenue": sql_small_order_revenue(),
    "idle_customers": sql_idle_customers(),
    "lm_bigram_logprob": sql_lm_bigram_logprob(),
    "embedding_project": sql_embedding_project(),
    "source_overlap": sql_source_overlap(),
    "events_latest_state": sql_events_latest_state(),
    "docs_sample_n": sql_docs_sample_n(),
    "events_winsorized": sql_events_winsorized(),
    "docs_profile": sql_docs_profile(),
    "events_rollup": sql_events_rollup(),
    "docs_length_deciles": sql_docs_length_deciles_full(),
    "events_type_pivot": sql_events_type_pivot(),
    "corpus_diff": sql_corpus_diff(),
    "events_props_json": sql_events_props_json(),
    "unconverted_views": sql_unconverted_views(),
    "events_cube": sql_events_cube(),
    # --- gated green in round 3; most load-bearing kept inside the window ---
    "mi_pair_lineitem": sql_mi_pair_lineitem(),
    "mi_relevance": sql_mi_relevance(),
    "mi_matrix": sql_mi_matrix(),
    "mrmr_top1": sql_mrmr_top1(),
    "mrmr_select_k5": sql_mrmr_select_k5(),
    "mrmr_miq_k5": sql_mrmr_miq_k5(),
    "row_select_k5": sql_mrmr_select_k5(),  # alternate encoding ≡ conventional
    "dedup_exact": sql_dedup_exact(),
    "dedup_ngram_jaccard": sql_dedup_ngram_jaccard(),
    "dedup_minhash": sql_dedup_minhash(),
    "dedup_simhash": sql_dedup_simhash(),
    "dedup_embedding": sql_dedup_embedding(),
    "dedup_embedding_bucketed": sql_dedup_embedding(),  # distributed plan ≡ exact oracle
    "dedup_spans": sql_dedup_spans(),
    "dedup_incremental": sql_dedup_incremental(),
    "ann_topk": sql_ann_topk(),
    "ann_topk_ivf": sql_ann_topk_ivf(),
    "ann_topk_lsh": sql_ann_topk_lsh(),
    "events_daily": sql_events_daily(),
    "events_sessionize": sql_events_sessionize(),
    "events_user_stats": sql_events_user_stats(),
    "pipeline_end_to_end": sql_pipeline_end_to_end(),
    "dup_clusters": sql_dup_clusters(),
    "kmeans_step": sql_kmeans_step(),
    # --- gated green in round 3; beyond the window this round ---
    "embedding_top_pairs": sql_embedding_top_pairs(),
    "text_token_counts": sql_text_token_counts(),
    "text_quality": sql_text_quality(),
    "text_repetition": sql_text_repetition(),
    "corpus_clean": sql_corpus_clean(),
    "vocab_top50": sql_vocab_top50(),
    "lang_id": sql_lang_id(),
    "doc_fingerprint": sql_doc_fingerprint(),
    "multimodal_features": sql_multimodal_features(),
    "lineitem_pricing": sql_lineitem_pricing(),
    "nation_revenue": sql_nation_revenue(),
    "priority_orders": sql_priority_orders(),
    "events_topk_per_type": sql_events_topk_per_type(),
    "events_asof_signup": sql_events_asof_signup(),
    "events_attribution": sql_events_attribution(),
    "events_rolling_7d": sql_events_rolling_7d(),
    "supplier_diversity": sql_supplier_diversity(),
    "split_counts": sql_split_counts(),
    "docs_cap_per_source": sql_docs_cap_per_source(),
    "scrub_pii": sql_scrub_pii(),
    "doc_chunks": sql_doc_chunks(),
    "packed_bins": sql_packed_bins(),
    "decontam_ids": sql_decontam_ids(),
    "tfidf_top3": sql_tfidf_top3(),
    "doc_length_quantiles": sql_doc_length_quantiles(),
    "mix_by_source": sql_mix_by_source(),
    "session_journeys": sql_session_journeys(),
    "supplier_zscore": sql_supplier_zscore(),
    "monthly_growth": sql_monthly_growth(),
    "events_daily_anomaly": sql_events_daily_anomaly(),
    "customer_rfm": sql_customer_rfm(),
    # --- added after the round-4 window filled; rotate forward in round 5 ---
    "forecast_revenue": sql_forecast_revenue(),
    "late_suppliers": sql_late_suppliers(),
    "part_pair_counts": sql_part_pair_counts(),
    "decontam_bloom": sql_decontam_bloom(),
    "boilerplate_shingles": sql_boilerplate_shingles(),
    "docs_novelty": sql_docs_novelty(),
    "docs_temperature_mix": sql_docs_temperature_mix(),
    "gopher_filters": sql_gopher_filters(),
    "split_leakage": sql_split_leakage(),
    "cluster_size_stats": sql_cluster_size_stats(),
    "ann_recall_audit": sql_ann_recall_audit(),
    "events_hll_users": sql_events_hll_users(),
    "docs_profile_sketch": sql_docs_profile_sketch(),
    "source_quality_report": sql_source_quality_report(),
    "user_streaks": sql_user_streaks(),
    "weighted_median_price": sql_weighted_median_price(),
    "lineitem_corr": sql_lineitem_corr(),
    "part_pair_lift": sql_part_pair_lift(),
    "kwic_snippets": sql_kwic_snippets(),
    "events_interarrival": sql_events_interarrival(),
    "events_value_histogram": sql_events_value_histogram(),
    "lang_source_chisq": sql_lang_source_chisq(),
    "source_token_entropy": sql_source_token_entropy(),
    "user_value_twa": sql_user_value_twa(),
    "orders_sla": sql_orders_sla(),
    "events_rolling_7d_users": sql_events_rolling_7d_users(),
    "events_autocorr7": sql_events_autocorr7(),
    "source_size_gini": sql_source_size_gini(),
    "supplier_mad_outliers": sql_supplier_mad_outliers(),
    "langid_confusion": sql_langid_confusion(),
    "funnel_latency": sql_funnel_latency(),
    "events_imputed": sql_events_imputed(),
    "events_value_pcts_hist": sql_events_value_pcts_hist(),
    "cluster_representatives": sql_cluster_representatives(),
    "benford_first_digit": sql_benford_first_digit(),
    # --- new in round 5 ---
    "dedup_embedding_lsh": sql_dedup_embedding_lsh(),
    "dedup_embedding_lsh_recall": sql_dedup_embedding_lsh_recall(),
}


# --- round-5 driver-window rotation -----------------------------------------
# The driver's CORRECTNESS gate checks the FIRST 50 entries of QUERIES at
# sf0.01 each round. Rounds 1-4 cumulatively gated 100 of the 140 queries;
# the 40 below (third-pass round-4 additions, session_journeys through
# benford_first_digit) have never had a driver row. Promote them to the
# front, backfilled to 50 with the least-recently-gated (r3) queries, so
# after round 5 EVERY registered query has >=1 green driver CORRECTNESS row.
# New queries added mid-round must go at the END of QUERIES/ORACLES (and are
# gated locally by tests/test_entry_oracle.py) so this window stays stable.
_ROUND5_WINDOW = [
    # 40 never-gated
    "session_journeys", "supplier_zscore", "monthly_growth",
    "events_daily_anomaly", "customer_rfm", "forecast_revenue",
    "late_suppliers", "part_pair_counts", "decontam_bloom",
    "boilerplate_shingles", "docs_novelty", "docs_temperature_mix",
    "gopher_filters", "split_leakage", "cluster_size_stats",
    "ann_recall_audit", "events_hll_users", "docs_profile_sketch",
    "source_quality_report", "user_streaks", "weighted_median_price",
    "lineitem_corr", "part_pair_lift", "kwic_snippets",
    "events_interarrival", "events_value_histogram", "lang_source_chisq",
    "source_token_entropy", "user_value_twa", "orders_sla",
    "events_rolling_7d_users", "events_autocorr7", "source_size_gini",
    "supplier_mad_outliers", "langid_confusion", "funnel_latency",
    "events_imputed", "events_value_pcts_hist", "cluster_representatives",
    "benford_first_digit",
    # 10 backfill: least-recently-gated (last driver row r3)
    "mi_pair_lineitem", "mi_relevance", "mi_matrix", "mrmr_top1",
    "mrmr_select_k5", "mrmr_miq_k5", "row_select_k5", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash",
]


def _rotate_window(d: dict, window: list[str]) -> dict:
    missing = [k for k in window if k not in d]
    if missing:  # fail loud: a renamed query must update the window list
        raise KeyError(f"rotation window names unknown queries: {missing}")
    rest = [k for k in d if k not in set(window)]
    return {k: d[k] for k in [*window, *rest]}


QUERIES = _rotate_window(QUERIES, _ROUND5_WINDOW)
ORACLES = _rotate_window(ORACLES, [k for k in _ROUND5_WINDOW if k in ORACLES])
