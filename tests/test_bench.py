"""Bench harness failure protocol: a crashing query must be isolated
(recorded in ``errors``, other queries still timed) so a partial report
is always published — round 2's bench crashed mid-run and published
nothing, which this pins against."""

from __future__ import annotations

import json


def test_run_queries_isolates_failing_query(spark, sf_dir):
    from bench import run_queries

    def ok(sp, d):
        return sp.range(3)

    def boom(sp, d):
        raise ValueError("forced failure")

    timings, results, errors = run_queries(
        spark, sf_dir, {"ok": ok, "boom": boom, "ok2": ok},
        ["ok", "boom", "ok2"], repeats=1,
    )
    # the failure is captured, not raised; later queries still ran
    assert set(timings) == {"ok", "ok2"}
    assert len(results["ok"]) == 3
    assert list(errors) == ["boom"]
    assert errors["boom"].startswith("ValueError: forced failure")
    # the error payload survives the JSON report round-trip
    assert json.loads(json.dumps({"queries": timings, "errors": errors}))
