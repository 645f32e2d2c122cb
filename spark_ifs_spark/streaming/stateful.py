"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState``.

The reference engine has no streaming surface (SURVEY §2.8); this is the
LLM-data-pipeline extension's custom stateful operator — the pattern a
training-data pipeline uses for per-entity accumulators that built-in
windowed aggregation can't express (arbitrary Python state transition,
e.g. dedup-within-user, rate limits, drift counters).

Plan shape: one hash-partition shuffle on the grouping key per
micro-batch, then state lives in the state store co-located with the key
partition — the canonical Structured Streaming stateful topology. State
per key is O(1) (two scalars), so state-store size is bounded by
|distinct users|, independent of event volume: the property that matters
at 100 TB/day event rates.

``running_user_stats`` emits, per micro-batch, one updated row per user
seen in that batch (output mode ``update``): the cumulative event count
and value sum so far. The final emission per user therefore equals the
global batch aggregate — which is how the oracle checks it
(``registry.q_events_user_stats`` folds the memory-sink updates with
``max_by`` and compares against a plain ``GROUP BY`` in DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

_PROTOSHIM_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "vendor", "protoshim")
)


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable, vendoring the minimal shim
    (``spark_ifs_spark/vendor/protoshim``) ONLY if the real package is
    absent — a real installation always wins because the first import
    attempt happens before the shim dir is ever added to ``sys.path``.

    Three propagation layers, because the TWS state-server channel
    imports protobuf inside the PYTHON WORKER, not just the driver:
    driver ``sys.path`` (this process), ``PYTHONPATH`` env (workers of
    any JVM launched after this call — conftest calls this before the
    test SparkSession exists), and — when a live session is passed —
    injecting the shim dir into ``sc.environment["PYTHONPATH"]`` so
    workers of the already-running JVM pick it up at python-function
    wrap time (``sc.addPyFile`` does NOT reach the TWS driver worker;
    see the inline comment). Returns True when ``google.protobuf``
    imports.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if _PROTOSHIM_DIR not in sys.path:
            sys.path.insert(0, _PROTOSHIM_DIR)
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if _PROTOSHIM_DIR not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [_PROTOSHIM_DIR] + [p for p in parts if p]
            )
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False
    if spark is not None and _PROTOSHIM_DIR in sys.path:
        # Already-running JVM: python workers take PYTHONPATH from
        # sc.environment at python-function WRAP time, so injecting here
        # (before the TWS plan is constructed) reaches even the TWS
        # driver worker — which addPyFile does NOT (it crashed there:
        # that worker skips the SparkFiles sys.path preamble).
        env = spark.sparkContext.environment
        parts = env.get("PYTHONPATH", "").split(os.pathsep)
        if _PROTOSHIM_DIR not in parts:
            env["PYTHONPATH"] = os.pathsep.join(
                [_PROTOSHIM_DIR] + [p for p in parts if p]
            )
    return True

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_user_stats(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """State transition: fold this batch's rows into the (n, s) state."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += int(len(pdf))
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """``(user_id, n_events, sum_value)`` running totals, one update per
    user per micro-batch. ``events`` must be a streaming DataFrame with
    ``user_id`` and ``value`` columns."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


class _RunningStatsProcessor(StatefulProcessor):
    """``StatefulProcessor`` for :func:`running_user_stats_tws` — same
    (n, s) fold as :func:`_update_user_stats`, expressed against the
    ``transformWithStateInPandas`` handle API."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("agg", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, s = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        self._state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` on the ``transformWithStateInPandas``
    API (Spark 4's successor to ``applyInPandasWithState``): typed named
    state cells, timer support, and per-cell TTL — the surface a
    production pipeline wants for entity accumulators that must expire
    (rate limiters, dedup caches). Semantics here are identical to
    :func:`running_user_stats` (commutative fold, so the final emission
    per user equals the batch ``GROUP BY`` whatever the batch order) —
    parity across BOTH stateful APIs is pinned in
    ``tests/test_streaming.py``.

    Same topology and state bound as the module docstring: one
    key-partition shuffle per micro-batch, O(1) state per user.

    Runtime dependency note: ``transformWithStateInPandas`` talks to
    the JVM state server over a protobuf channel, so it needs
    ``google.protobuf`` importable at EXECUTION time (plan construction
    does not). Where the real package is absent,
    :func:`ensure_protobuf` activates the vendored minimal pure-Python
    runtime (``vendor/protoshim`` — wire-format subset written from the
    public encoding spec), which the JVM round-trip in
    ``test_running_user_stats_tws_parity`` validates end-to-end.
    """
    from pyspark.sql import SparkSession

    if not ensure_protobuf(SparkSession.getActiveSession()):
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf and the "
            "vendored shim failed to activate"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
