"""Event-stream analytics: ordered funnels, cohort retention, SCD2
interval construction.

The product-analytics trio every event warehouse runs daily, expressed
in the shapes that survive 100 TB event tables:

- **funnel**: ordered-stage conversion (view → click-after-view →
  purchase-after-click). Each stage is a user-keyed conditional-min
  aggregate; stages chain through user-level relations (one row per
  user), so after the FIRST aggregate everything downstream is
  user-cardinality, not event-cardinality, and the stage joins
  co-partition on the user key.
- **cohort retention**: users bucketed by first-activity week ×
  activity-week offset. Two event-scale aggregates (first-touch,
  distinct user-week) and one user-keyed join; output is a
  weeks×weeks grid regardless of corpus size.
- **SCD2 intervals**: a changelog becomes validity intervals
  ``[ts, next_ts)`` via ``lead()`` over the entity key — the standard
  changelog→dimension construction. ONE user-keyed window; the open
  interval keeps a NULL end. Ties order by (ts, event_id) so the
  interval chain is total and engine-reproducible.

Timestamps exit as epoch microseconds (``functions/timeutil.epoch_us``)
or formatted week dates — never raw timestamp objects (registry
portability convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_ifs_spark.functions.timeutil import epoch_us


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """``(stage, users)`` — users reaching each funnel stage IN ORDER:
    stage k counts users whose earliest stage-k event falls strictly
    after their earliest qualifying stage-(k−1) event.

    Plan: stage 1 is one conditional-min aggregate over the events scan;
    each later stage joins the (user-cardinality) frontier back to the
    stage-filtered events and takes the conditional min again — the
    event table is scanned once per stage with the stage filter pushed
    down, and every join keys on the user. Output is ``len(stages)``
    rows via an explicit stack, no shuffle after the final aggregate.
    """
    u, t = F.col(user_col), F.col(ts_col)
    frontier = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    stage_counts = [frontier.agg(F.count(F.lit(1)).alias("users"))]
    prev = frontier
    for k, stage in enumerate(stages[1:], start=1):
        ev = df.filter(F.col(type_col) == stage).select(
            u.alias("_u"), t.alias("_t")
        )
        nxt = (
            prev.join(ev, prev[user_col] == F.col("_u"))
            .filter(F.col("_t") > F.col(f"t{k - 1}"))
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"t{k}"))
        )
        stage_counts.append(nxt.agg(F.count(F.lit(1)).alias("users")))
        prev = nxt
    out = None
    for stage, cnt in zip(stages, stage_counts):
        row = cnt.select(F.lit(stage).alias("stage"), "users")
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """``(cohort_week, week_offset, n_users)`` — weekly retention grid:
    for each first-activity-week cohort, how many of its users were
    active ``week_offset`` weeks later (offset 0 = the cohort week
    itself, so it equals cohort size).

    Plan: first-touch is one user-keyed min aggregate; activity is one
    distinct (user, week) aggregate; both co-partition on the user for
    the join, and the final grid aggregate has a bounded
    weeks² key space.
    """
    week = F.date_trunc("week", F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    cohort = first.select(
        F.col(user_col).alias("_u"),
        F.date_trunc("week", F.col("_first_ts")).alias("_cohort_wk"),
    )
    activity = df.select(F.col(user_col).alias("_u"), week.alias("_wk")).distinct()
    joined = activity.join(cohort, "_u")
    offset = (
        (F.datediff(F.col("_wk"), F.col("_cohort_wk")) / F.lit(7)).cast("int")
    )
    return (
        joined.groupBy(
            F.date_format("_cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """``(key, id, payload..., valid_from_us, valid_to_us)`` — each
    changelog row's validity interval: from its timestamp until the
    entity's next change (NULL for the current row). ONE entity-keyed
    window; ties break by the event id so the chain is total.

    Skew note, honestly: ``lead()`` needs the entity's full ordered
    history in one task, so a pathologically hot entity (10^8 updates)
    serializes — unlike :func:`~spark_ifs_spark.operators.topk.
    compact_latest`, which avoids the window because latest-state
    doesn't need order. If hot entities are real, pre-split the key by
    time range ((key, day) window, then stitch each day's last interval
    to the next day's first — one extra bounded join); interval
    construction inherently needs per-entity order, so that stitch is
    the floor, not an artifact of this formulation.
    """
    from_us = epoch_us(df, ts_col)
    base = df.select(
        F.col(key_col),
        F.col(id_col),
        *[F.col(c) for c in payload_cols],
        from_us.alias("valid_from_us"),
    )
    return base.withColumn(
        "valid_to_us",
        F.lead("valid_from_us").over(
            Window.partitionBy(key_col).orderBy(
                F.col("valid_from_us").asc(), F.col(id_col).asc()
            )
        ),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
) -> DataFrame:
    """``(from_type, to_type, c, p_micro)`` — first-order Markov
    transition counts and probabilities between consecutive events of
    the same entity (next-event prediction, anomaly scoring, session
    modeling).

    ``p_micro = floor(c·1e6 / c_from)`` — integer ppm of the row-wise
    conditional, exact on both engines. Plan: ONE entity-keyed window
    builds (type, next_type) pairs (ties total-ordered by the event
    id), one bounded types² aggregate counts them, and the per-from
    totals come from a window over that bounded relation — nothing
    event-scale shuffles twice.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "c",
        F.floor(F.col("c") * F.lit(1000000) / F.sum("c").over(totals)).alias(
            "p_micro"
        ),
    )


def session_journeys(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    gap_s: int = 1800,
    k: int = 10,
) -> DataFrame:
    """``(journey, n)`` — the top-``k`` most frequent per-session event
    sequences ("user journeys": ``view>click>purchase``), sessions cut
    at ``gap_s`` seconds of inactivity.

    Gap sessionization in BATCH (the stream side uses
    ``F.session_window``): a session starts where the gap from the
    previous event exceeds ``gap_s``; the session id is the running sum
    of those start flags — two stacked windows over ONE user-keyed sort
    (Spark evaluates both in a single Exchange+Sort, no second
    shuffle). The journey string is built with an order-embedded
    aggregate — ``array_sort(collect_list(struct(ts_us, id, type)))``
    — so the sequence is total-ordered and engine-reproducible (ties by
    the event id), not dependent on collect order. The journey count
    key space is bounded by distinct sequences, and the cut is
    TakeOrdered (n desc, journey asc).
    """
    us = epoch_us(df, ts_col).alias("_us")
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
        us,
    )
    w = Window.partitionBy("_u").orderBy(F.col("_us").asc(), F.col("_id").asc())
    start = F.when(
        F.col("_us") - F.lag("_us").over(w) > gap_s * 1_000_000, 1
    ).otherwise(F.lit(0))
    sid = F.sum(start).over(
        Window.partitionBy("_u")
        .orderBy(F.col("_us").asc(), F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = base.withColumn("_sid", sid)
    journeys = sessions.groupBy("_u", "_sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_us", "_id", "_t"))
                ),
                lambda x: x["_t"],
            ),
            ">",
        ).alias("journey")
    )
    return (
        journeys.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("journey").asc())
        .limit(k)
    )
