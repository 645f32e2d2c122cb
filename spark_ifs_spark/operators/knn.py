"""Approximate kNN-graph construction: IVF-seeded NN-descent.

The bounded-degree kNN graph is the curation primitive that graph-based
dedup, diversity sampling and label propagation all consume. Exact
construction is an n² all-pairs join — the one shape this package never
ships — so the graph is built approximately, NN-DESCENT style (Dong,
Moses & Li, WWW 2011: "Efficient k-nearest neighbor graph construction
for generic similarity measures"): start from cheap locality seeds,
then repeatedly propose each node's *neighbors-of-neighbors* as
candidates and keep the best k. Every round is a BOUNDED self-join on
the current edge list — never all-pairs:

- **seeds**: (a) all pairs within an IVF cell (deterministic seed
  centroids — the ``num_centroids`` smallest ids, the package's
  ``ivf_centroids`` convention from ``similarity.py:590``), the
  locality boost; and (b) a deterministic stand-in for NN-descent's
  random init: a ring over ``row_number`` positions *within hash
  groups* (``id % groups``), so the window is group-bounded — no
  corpus-wide single-task window — and every node starts with ≥
  ``min(k, group_size − 1)`` edges even when alone in its cell.
- **rounds**: ``B = E ∪ top-K(reverse(E))`` (the reverse cap keeps a
  hub's in-degree from exploding the join — ≤ 2K out-edges per node),
  candidates = co-neighbors ``{(x.nb, y.nb) : x.id = y.id}`` ∪ B ∪
  reverse(B), dedup, re-score, keep top-K per node. Per-round work is
  O(n·(2K)²) candidate scorings by construction.
- **working degree**: the descent runs at an internal degree
  ``K = work_degree`` (default ``4·k``) and only the final top-``k``
  edges are emitted. On weakly-clustered data (synthetic embeddings,
  cosine ≈ 0.25 everywhere) neighbor-of-neighbor transitivity at
  degree k is too thin to climb out of the seed neighborhood —
  measured recall@4: 500 nodes (sf0.001) 28% at K = k, 69% at K = 3k,
  92% at K = 4k (3 rounds); 2000 nodes (sf0.1) 55% at K = 4k/3r, 65%
  at 4k/4r, 73% at 5k/3r, 84% at 5k/4r. The registry gates K = 5k,
  3 rounds. The K ≫ k descent is the standard NN-descent practice
  (pynndescent runs at K ≈ 2-4·k for the same reason); cost scales as
  (K/k)² and stays n-linear.

Scoring is the package's integer-state contract (``kmeans_train``,
``grouped_centroid_cosine``): components quantize ``floor(x·scale)``
(scale a power of two — float→double promotion and multiply both
exact), dot and ssq are exact int64 sums (|dot| ≤ d·(scale·max|x|)²,
far inside 2^53 at d = 64), and cosine = ``dot/(√ssq_a·√ssq_b)`` is
IEEE-exact division/sqrt of identical integers — bit-identical across
engines, so the iterative rank-and-keep never diverges from the DuckDB
oracle. Quantization error is part of the approximation and is
*measured*, not assumed: :func:`knn_graph_recall` audits the graph
against exact top-k (same quantized metric) on a deterministic node
sample, the ``minhash_recall_audit`` discipline.

100 TB posture: vectors ship at most once per (node, round) through
hash-joins keyed on node id; candidate relations are (id, nb) pairs —
k²-bounded per node; the only windows are per-node (degree ≤ 2k rows)
and per-hash-group (seed ring). At cluster scale, seed cells come from
``scaled_num_centroids`` (constant cell size ⇒ linear seed cost) and
the quantized-vector relation is cached across rounds; both leave the
per-round plan unchanged.

No counterpart in the reference (jacopocav/spark-ifs has no vector
search surface); extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_ifs_spark.operators.similarity import as_double_array
from spark_ifs_spark.operators.topk import salted_topk_per_key, topk_per_key


def quantized_vectors(
    df: DataFrame, id_col: str, vec_col: str, scale: int = 1024
) -> DataFrame:
    """``(id, qv array<long>, ssq long)`` — the integer-state vector
    relation: ``qv[i] = floor(x_i · scale)``, ``ssq = Σ qv[i]²``."""
    qv = F.transform(
        as_double_array(vec_col), lambda x: F.floor(x * scale).cast("long")
    )
    return (
        df.select(F.col(id_col).alias("id"), qv.alias("qv"))
        .withColumn(
            "ssq",
            F.aggregate(
                F.col("qv"), F.lit(0).cast("long"), lambda a, x: a + x * x
            ),
        )
    )


def _scored(pairs: DataFrame, q: DataFrame) -> DataFrame:
    """``(id, nb, score)`` for a candidate pair relation: exact integer
    dot via ``zip_with`` + ``aggregate`` (JVM codegen, no Python), then
    the IEEE-exact cosine. Vectors ride the two id-keyed hash joins."""
    qa = q.select("id", F.col("qv").alias("_qa"), F.col("ssq").alias("_sa"))
    qb = q.select(
        F.col("id").alias("nb"),
        F.col("qv").alias("_qb"),
        F.col("ssq").alias("_sb"),
    )
    dot = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    score = F.when(
        (F.col("_sa") == 0) | (F.col("_sb") == 0), F.lit(0.0)
    ).otherwise(
        F.col("_dot").cast("double")
        / (F.sqrt(F.col("_sa").cast("double")) * F.sqrt(F.col("_sb").cast("double")))
    )
    return (
        pairs.join(qa, "id")
        .join(qb, "nb")
        .withColumn("_dot", dot)
        .select("id", "nb", score.alias("score"))
    )


def _ring_seed(ids: DataFrame, k: int, groups: int) -> DataFrame:
    """Deterministic random-init stand-in: within each hash group
    (``id % groups``) nodes take the next ``min(k, cnt−1)`` positions
    cyclically. Windows are group-bounded; ``(rn + j) % cnt ≠ rn`` for
    ``1 ≤ j < cnt``, so the ring never self-loops."""
    g = (F.col("id") % groups).alias("g")
    pos = (
        ids.select("id", g)
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("id")) - 1
        )
        .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("g")))
    )
    j = pos.select(
        "id", "g", "rn", "cnt",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    ).filter(F.col("j") < F.col("cnt"))
    tgt = pos.select(
        F.col("id").alias("nb"), F.col("g").alias("g2"), F.col("rn").alias("rn2")
    )
    return j.join(
        tgt,
        (F.col("g") == F.col("g2"))
        & (F.col("rn2") == (F.col("rn") + F.col("j")) % F.col("cnt")),
    ).select("id", "nb")


#: past this many seed cells the crossJoin-expression assignment flips
#: to the broadcast-numpy GEMM kernel — same threshold and same reason
#: as ``similarity.ivf_assign_np`` (SemDeDup): with corpus-scaled cells
#: (nc = n/128) the expression path scores n·nc pairs, which is
#: QUADRATIC in n (measured: 22 s at 20k nodes → 346 s at 200k before
#: this kernel). The kernel computes the SAME argmax exactly (see
#: ``_cell_assign_np``), so results are path-independent (pytest-pinned)
#: and every gate SF (nc = 16) stays on the expression path the oracle
#: mirrors.
NP_ASSIGN_MIN_CENTROIDS = 65


def _cell_assign_np(q: DataFrame, cents_rows: list) -> DataFrame:
    """``(id, cell)`` via broadcast-numpy argmax — EXACT integer-state
    equivalence with the expression path: the quantized components and
    the int64 dot are integer-valued with |dot| ≤ d·(scale·max|x|)²
    < 2^53, so the float64 BLAS GEMM computes them exactly; the
    division by the identical √ssq_c doubles is IEEE-exact; ties
    (equal doubles) fall to ``np.argmax``'s first-occurrence rule over
    cid-ascending columns = the expression path's cid-asc tie-break.
    ``cs == 0`` columns are forced to +0.0 (the expression's literal)."""
    import numpy as np

    cents_rows = sorted(cents_rows, key=lambda r: r[0])
    cids = np.array([r[0] for r in cents_rows], dtype=np.int64)
    C = np.array([r[1] for r in cents_rows], dtype=np.float64)
    cs = np.array([r[2] for r in cents_rows], dtype=np.float64)
    # DIVIDE by √cs exactly as the expression path does — a precomputed
    # reciprocal multiply (dot · fl(1/√cs)) is NOT the same rounding as
    # fl(dot/√cs) and could flip an ulp-near centroid tie between the
    # two paths; cs == 0 divisors are patched to 1 and their columns
    # forced to the expression's literal +0.0 afterwards
    zero = cs == 0.0
    rt = np.sqrt(np.where(zero, 1.0, cs))
    sc = q.sparkSession.sparkContext
    bc = sc.broadcast((cids, C, rt, zero))

    def assign(batches):
        import pandas as pd

        bcids, bC, brt, bzero = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["qv"]), dtype=np.float64)
            s = (X @ bC.T) / brt[None, :]
            if bzero.any():
                s[:, bzero] = 0.0
            best = np.argmax(s, axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cell": bcids[best]}
            )

    return q.select("id", "qv").mapInPandas(assign, "id long, cell long")


def _cell_seed(q: DataFrame, num_centroids: int) -> DataFrame:
    """All (ordered) pairs sharing an IVF cell. Seed centroids are the
    ``num_centroids`` smallest ids (the ``ivf_centroids`` convention);
    assignment is argmax over ``dot/√ssq_c`` (the row norm cancels out
    of the cosine argmax), centroid-id-asc ties — a broadcast join plus
    a per-node k=1 window at gate cell counts, the exact-equivalent
    numpy GEMM kernel past ``NP_ASSIGN_MIN_CENTROIDS`` (the n·nc
    expression scoring is quadratic under corpus-scaled cells). No
    corpus shuffle on either path."""
    cents = (
        q.orderBy("id")
        .limit(num_centroids)
        .select(
            F.col("id").alias("cid"),
            F.col("qv").alias("_cq"),
            F.col("ssq").alias("_cs"),
        )
    )
    if num_centroids >= NP_ASSIGN_MIN_CENTROIDS:
        rows = [(r["cid"], list(r["_cq"]), r["_cs"]) for r in cents.collect()]
        assign = _cell_assign_np(q, rows)
    else:
        dot = F.aggregate(
            F.zip_with("qv", "_cq", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        cscore = F.when(F.col("_cs") == 0, F.lit(0.0)).otherwise(
            F.col("_dot").cast("double") / F.sqrt(F.col("_cs").cast("double"))
        )
        assign = topk_per_key(
            q.crossJoin(F.broadcast(cents))
            .withColumn("_dot", dot)
            .select("id", "cid", cscore.alias("cscore")),
            ["id"], "cscore", k=1, tiebreak_cols=["cid"],
        ).select("id", F.col("cid").alias("cell"))
    a, b = assign.alias("a"), assign.alias("b")
    return a.join(
        b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") != F.col("b.id"))
    ).select(F.col("a.id").alias("id"), F.col("b.id").alias("nb"))


def knn_graph(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    num_centroids: int = 16,
    rounds: int = 3,
    groups: int = 8,
    scale: int = 1024,
    work_degree: int | None = None,
) -> DataFrame:
    """``(id, nb, score, rank)`` — the approximate directed kNN graph:
    top-``k`` neighbors per node, descending at internal degree
    ``work_degree`` (default ``4·k``) for ``rounds`` NN-descent
    refinements over IVF-cell + hash-ring seeds, then emitting the
    final top-``k`` of each node's working list."""
    kk = 4 * k if work_degree is None else work_degree
    # Descent-internal top-ks use the single-window topk_per_key, not
    # the salted two-stage variant: every per-key input here is
    # degree-BOUNDED by construction ((2K)² candidates, ≤ 2K reverse
    # edges, num_centroids assignment rows per id), so skew is
    # impossible and the second window would be pure overhead. The
    # recall audit's truth top-k (per-key input = the whole corpus)
    # stays salted.
    # The quantized-vector relation is read once per scoring join of
    # every round; the edge list feeds 4 downstream relations per round
    # (rev, b×2, co) — without lineage truncation the plan QUADRUPLES
    # per round and Spark re-executes the whole history each iteration
    # (the unigram `_finish` lesson). localCheckpoint materializes both;
    # at cluster scale this is `checkpoint()` to reliable storage and
    # the relations stay O(n·d) / O(n·k).
    q = quantized_vectors(df, id_col, vec_col, scale).localCheckpoint(eager=True)
    ring = _ring_seed(q.select("id"), kk, groups)
    seed = (
        ring.unionByName(ring.select(F.col("nb").alias("id"), F.col("id").alias("nb")))
        .unionByName(_cell_seed(q, num_centroids))
        .distinct()
    )
    e = topk_per_key(
        _scored(seed, q), ["id"], "score", k=kk, tiebreak_cols=["nb"]
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        rev = e.select(F.col("nb").alias("id"), F.col("id").alias("nb"), "score")
        revc = topk_per_key(
            rev, ["id"], "score", k=kk, tiebreak_cols=["nb"]
        ).select("id", "nb")
        # b IS deduped before the co self-join: duplicate b rows square
        # up through the join (measured: dropping this distinct made the
        # round 30% slower, the bigger co relation outweighing the saved
        # shuffle).
        b = e.select("id", "nb").unionByName(revc).distinct()
        x, y = b.alias("x"), b.alias("y")
        co = x.join(
            y, (F.col("x.id") == F.col("y.id")) & (F.col("x.nb") != F.col("y.nb"))
        ).select(F.col("x.nb").alias("id"), F.col("y.nb").alias("nb"))
        cand = (
            co.unionByName(b)
            .unionByName(b.select(F.col("nb").alias("id"), F.col("id").alias("nb")))
            .filter(F.col("id") != F.col("nb"))
            .distinct()
        )
        e = topk_per_key(
            _scored(cand, q), ["id"], "score", k=kk, tiebreak_cols=["nb"]
        ).localCheckpoint(eager=True)
    return e.filter(F.col("rank") <= k).select("id", "nb", "score", "rank")


def knn_graph_recall(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    num_centroids: int = 16,
    rounds: int = 3,
    groups: int = 8,
    scale: int = 1024,
    sample_mod: int = 20,
    work_degree: int | None = None,
) -> DataFrame:
    """One row ``(n_nodes, k, n_sample, hits, possible, recall_ppm)``
    — graph edges vs EXACT top-k (same quantized metric) on the
    deterministic node sample ``id % sample_mod == 0``: the
    ``minhash_recall_audit`` discipline, run on a sample at corpus
    scale. ``possible`` is the truth-set size (= n_sample·k when every
    sampled node has ≥ k others)."""
    edges = knn_graph(
        df, id_col, vec_col, k=k, num_centroids=num_centroids,
        rounds=rounds, groups=groups, scale=scale, work_degree=work_degree,
    ).select("id", "nb")
    q = quantized_vectors(df, id_col, vec_col, scale)
    sq = q.filter((F.col("id") % sample_mod) == 0).select("id")
    # truth scoring goes through the SAME _scored builder as the
    # descent (one definition of the integer-state cosine, not a
    # drifting copy); the truth top-k stays SALTED — its per-key input
    # is the whole corpus, the one unbounded window in this module
    pairs = sq.crossJoin(q.select(F.col("id").alias("nb"))).filter(
        F.col("id") != F.col("nb")
    )
    truth = salted_topk_per_key(
        _scored(pairs, q), ["id"], "score", k=k, tiebreak_cols=["nb"]
    ).select("id", "nb")
    hits = truth.join(edges, ["id", "nb"], "left_semi").agg(
        F.count(F.lit(1)).alias("hits")
    )
    poss = truth.agg(F.count(F.lit(1)).alias("possible"))
    nn = df.agg(F.count(F.lit(1)).alias("n_nodes"))
    ns = sq.agg(F.count(F.lit(1)).alias("n_sample"))
    return (
        nn.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(poss))
        .select(
            "n_nodes",
            F.lit(k).cast("int").alias("k"),
            "n_sample",
            "hits",
            "possible",
            F.when(F.col("possible") == 0, F.lit(1_000_000))
            .otherwise(F.floor(F.col("hits") * 1_000_000 / F.col("possible")))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def knn_graph_components(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    k: int = 4,
    num_centroids: int = 16,
    rounds: int = 3,
    groups: int = 8,
    scale: int = 1024,
    work_degree: int | None = None,
) -> DataFrame:
    """``(id, component)`` — graph-based near-duplicate clusters: the
    connected components of the MUTUAL kNN graph thresholded at
    ``threshold`` (an edge survives iff i lists j AND j lists i among
    their top-k, at cosine ≥ threshold) — the graph consumer the kNN
    index exists for. Mutuality is the standard asymmetric-hub filter:
    a hub that many nodes list (but which lists none of them back)
    contributes no edge, so components stay tight at corpus scale.

    This is the ANN-graph approximation of the exact
    ``cosine_threshold_pairs`` → ``connected_components`` pipeline
    (``dedup_embedding`` + ``dup_clusters`` family): pairs the graph
    missed (recall < 100%, measured by :func:`knn_graph_recall`) are
    missing edges here — approximate by construction, audited, never
    silently all-pairs. Component ids are minimum member ids
    (:func:`~spark_ifs_spark.operators.graph.connected_components`
    contract); only nodes with ≥1 mutual edge appear.
    """
    e = knn_graph(
        df, id_col, vec_col, k=k, num_centroids=num_centroids, rounds=rounds,
        groups=groups, scale=scale, work_degree=work_degree,
    ).filter(F.col("score") >= threshold).select("id", "nb")
    rev = e.select(F.col("nb").alias("id"), F.col("id").alias("nb"))
    mutual = (
        e.join(rev, ["id", "nb"], "left_semi")
        .filter(F.col("id") < F.col("nb"))
        .select(F.col("id").alias("id_a"), F.col("nb").alias("id_b"))
    )
    from spark_ifs_spark.operators.graph import connected_components

    return connected_components(mutual, "id_a", "id_b").select(
        "id", "component"
    )
