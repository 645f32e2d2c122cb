

def test_prefix_sum_two_level_matches_single_window(spark):
    """The bucketed two-level prefix sum equals the naive global-window
    cumsum — including across bucket boundaries, sparse/gappy ids, and
    zero values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.chunking import prefix_sum

    rows = [(i * 3 + (i % 5), (i * 7) % 11) for i in range(500)]  # gappy ids
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum_before"]
        for r in prefix_sum(df, "id", "v", bucket=64).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_packing_curve_regime_tradeoff(spark, sf_dir):
    """Packed utilization dominates single-sequence utilization at
    every context length, and the straddle count is bounded by the
    number of bin boundaries."""
    from pyspark.sql import functions as F

    from spark_ifs_spark.operators.chunking import packing_waste_curve

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    for r in packing_waste_curve(docs, "doc_id", "n_tok").collect():
        assert r["packed_util_ppm"] >= r["single_util_ppm"]
        assert r["straddled_docs"] <= r["packed_bins"]
        assert 0 < r["packed_util_ppm"] <= 1_000_000


def test_epoch_shuffle_is_a_seeded_permutation(spark):
    """Each epoch's positions are exactly 0..n-1 (a permutation),
    epochs order differently, the result is invariant under physical
    repartitioning, and the seed reshuffles."""
    from spark_ifs_spark.operators.chunking import epoch_shuffle

    bins = spark.createDataFrame([(i,) for i in range(97)], "bin_id long")
    out = epoch_shuffle(bins, "bin_id", n_epochs=3, seed=42).collect()
    per = {}
    for r in out:
        per.setdefault(r["epoch"], {})[r["bin_id"]] = r["position"]
    assert set(per) == {0, 1, 2}
    for e, m in per.items():
        assert sorted(m.values()) == list(range(97))
    # epochs are genuinely different orders
    assert per[0] != per[1] and per[1] != per[2]
    # physical-partitioning invariance (the split_assign contract)
    re = {
        (r["epoch"], r["bin_id"]): r["position"]
        for r in epoch_shuffle(
            bins.repartition(7), "bin_id", n_epochs=3, seed=42
        ).collect()
    }
    assert re == {(e, b): p for e, m in per.items() for b, p in m.items()}
    # a different seed permutes differently
    other = {
        r["bin_id"]: r["position"]
        for r in epoch_shuffle(bins, "bin_id", n_epochs=1, seed=7).collect()
    }
    assert other != per[0]


def test_epoch_shuffle_two_level_rank_matches_plain_window(spark):
    """The bucketed two-level rank must equal the naive global
    row_number over (h, bin_id) per epoch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ifs_spark.functions.hashing import md5_int60
    from spark_ifs_spark.operators.chunking import epoch_shuffle

    bins = spark.createDataFrame([(i * 11 + 3,) for i in range(200)], "bin_id long")
    got = {
        (r["epoch"], r["bin_id"]): r["position"]
        for r in epoch_shuffle(bins, "bin_id", n_epochs=2, seed=5).collect()
    }
    h = md5_int60(
        F.concat(F.lit("5:"), F.col("epoch").cast("string"),
                 F.lit(":"), F.col("bin_id").cast("string"))
    )
    naive = (
        bins.select(
            "bin_id",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
        )
        .withColumn("h", h)
        .withColumn(
            "position",
            F.row_number().over(
                Window.partitionBy("epoch").orderBy("h", "bin_id")
            ) - 1,
        )
    )
    want = {
        (r["epoch"], r["bin_id"]): r["position"] for r in naive.collect()
    }
    assert got == want


def test_curriculum_shuffle_stage_blocks_and_permutation(spark):
    """Positions within an epoch are a permutation 0..n-1, every
    stage-s item precedes every stage-(s+1) item (the curriculum
    contract), within-stage order varies by epoch, and the result is
    invariant under physical repartitioning."""
    from spark_ifs_spark.operators.chunking import curriculum_shuffle

    # 90 items over 3 stages (30 each), ids deliberately interleaved
    rows = [(i * 7 + 1, i % 3) for i in range(90)]
    items = spark.createDataFrame(rows, "item_id long, stage int")
    out = curriculum_shuffle(items, "item_id", "stage", n_epochs=2, seed=9).collect()
    per = {}
    for r in out:
        per.setdefault(r["epoch"], []).append((r["position"], r["stage"], r["item_id"]))
    assert set(per) == {0, 1}
    stage_of = dict((i, s) for i, s in rows)
    for e, lst in per.items():
        lst.sort()
        assert [p for p, _, _ in lst] == list(range(90))
        # stage-monotone positions: the sequence of stages along
        # positions is non-decreasing
        stages = [s for _, s, _ in lst]
        assert stages == sorted(stages)
        for _, s, i in lst:
            assert stage_of[i] == s
    # epochs shuffle differently within stages
    assert per[0] != per[1]
    # physical-partitioning invariance
    re = curriculum_shuffle(
        items.repartition(5), "item_id", "stage", n_epochs=2, seed=9
    ).collect()
    assert {(r["epoch"], r["item_id"], r["position"]) for r in re} == {
        (e, i, p) for e, lst in per.items() for p, _, i in lst
    }


def test_curriculum_shuffle_two_level_rank_matches_plain_window(spark):
    """The (epoch, stage, bucket) two-level rank plus stage offsets
    must equal the naive global row_number over (stage, h, id) per
    epoch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ifs_spark.functions.hashing import md5_int60
    from spark_ifs_spark.operators.chunking import curriculum_shuffle

    rows = [(i * 11 + 3, (i * i) % 4) for i in range(180)]
    items = spark.createDataFrame(rows, "item_id long, stage int")
    got = {
        (r["epoch"], r["item_id"]): (r["stage"], r["position"])
        for r in curriculum_shuffle(
            items, "item_id", "stage", n_epochs=2, seed=5
        ).collect()
    }
    h = md5_int60(
        F.concat(F.lit("5:"), F.col("epoch").cast("string"),
                 F.lit(":"), F.col("item_id").cast("string"))
    )
    naive = (
        items.select(
            "item_id", "stage",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
        )
        .withColumn("h", h)
        .withColumn(
            "position",
            F.row_number().over(
                Window.partitionBy("epoch").orderBy("stage", "h", "item_id")
            ) - 1,
        )
    )
    want = {
        (r["epoch"], r["item_id"]): (r["stage"], r["position"])
        for r in naive.collect()
    }
    assert got == want


def test_curriculum_shuffle_conflicting_stage_dedups_to_min(spark):
    """An item arriving under TWO distinct stage values still gets ONE
    manifest row per epoch (the one-position-per-id contract inherited
    from epoch_shuffle), at the deterministic MIN stage — the r10
    review's library-user trap, pinned."""
    from spark_ifs_spark.operators.chunking import curriculum_shuffle

    rows = [(1, 0), (1, 2), (2, 1), (3, 0)]  # item 1 claims stages 0 and 2
    items = spark.createDataFrame(rows, "item_id long, stage int")
    out = curriculum_shuffle(items, "item_id", "stage", n_epochs=2, seed=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["epoch"], []).append((r["item_id"], r["stage"], r["position"]))
    for e, lst in per.items():
        assert sorted(i for i, _, _ in lst) == [1, 2, 3]  # one row per id
        assert dict((i, s) for i, s, _ in lst)[1] == 0  # min stage wins
        assert sorted(p for _, _, p in lst) == [0, 1, 2]


# -- sft_pack -----------------------------------------------------------------

def test_sft_pack_hand_case(spark):
    """Four conversations, quantum 4, ctx 8: conv 1 fills its own slot,
    convs 2+3 co-pack into one sequence at quantized offsets, conv 4
    truncates with its last turn clipped and mask forced false."""
    from spark_ifs_spark.operators.chunking import sft_pack

    rows = [
        (1, 1, "u", 3), (1, 2, "a", 2),
        (2, 1, "u", 2), (2, 2, "a", 1),
        (3, 1, "u", 4),
        (4, 1, "u", 5), (4, 2, "a", 3), (4, 3, "a", 3),
    ]
    df = spark.createDataFrame(rows, ["conv", "ord", "role", "tok"])
    out = sft_pack(df, "conv", "ord", "role", "tok",
                   ctx_len=8, loss_role="a", quantum=4)
    got = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    assert len(got) == 8
    # conv 1: own class-8 slot, first bin
    assert got[(1, 0)]["seq_id"] == got[(1, 1)]["seq_id"] == 0
    assert got[(1, 1)]["start_offset"] == 3
    assert got[(1, 1)]["loss_mask"] and not got[(1, 1)]["clipped"]
    # conv 4: truncated into its own sequence; last turn clipped
    assert got[(4, 0)]["seq_id"] == 1
    assert got[(4, 2)]["start_offset"] == 8
    assert got[(4, 2)]["clipped"] and not got[(4, 2)]["loss_mask"]
    assert got[(4, 1)]["loss_mask"]  # ends exactly at the budget
    # convs 2+3 co-pack: same sequence, slot-strided offsets
    assert got[(2, 0)]["seq_id"] == got[(3, 0)]["seq_id"] == 2
    assert got[(2, 0)]["start_offset"] == 0
    assert got[(3, 0)]["start_offset"] == 4
    assert not got[(3, 0)]["loss_mask"]  # role 'u'


def test_sft_pack_deterministic_under_repartition(spark):
    from spark_ifs_spark.operators.chunking import sft_pack

    rows = [(c, t, "ua"[t % 2], 1 + (c * 7 + t * 3) % 9)
            for c in range(20) for t in range(c % 6 + 1)]
    a = sft_pack(spark.createDataFrame(rows, ["c", "o", "r", "n"]),
                 "c", "o", "r", "n", ctx_len=16, loss_role="a", quantum=4)
    b = sft_pack(
        spark.createDataFrame(rows[::-1], ["c", "o", "r", "n"]).repartition(7),
        "c", "o", "r", "n", ctx_len=16, loss_role="a", quantum=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sft_pack_validates_args(spark):
    import pytest

    from spark_ifs_spark.operators.chunking import sft_pack

    df = spark.createDataFrame([(1, 1, "a", 1)], ["c", "o", "r", "n"])
    with pytest.raises(ValueError):
        sft_pack(df, "c", "o", "r", "n", ctx_len=8, quantum=0)
    with pytest.raises(ValueError):
        sft_pack(df, "c", "o", "r", "n", ctx_len=10, quantum=4)
