"""Per-query profiler for the optimization rounds (guide §1).

For each named query: time the noop-sink computation (min-of-2, same
protocol as bench.py but isolating compute from collect), count the
Spark jobs it launches (job-group scoped), and dump the formatted plan
to plans/<tag>/<name>.txt.  Usage:

    python tools/profile_queries.py [--tag before] [name ...]

With no names, profiles every bench query.  Writes a JSON summary to
/tmp/profile_<tag>.json.  NOT part of the bench contract — a
measurement tool only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    names = args or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from spark_ifs_spark.session import get_spark

    spark = get_spark(
        "sis_profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_ifs_spark.registry import QUERIES

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        sc.setJobGroup(f"prof_{name}", name)
        sc.setJobDescription(name)
        best = float("inf")
        n_jobs_total = 0
        plan = ""
        err = None
        try:
            for rep in range(2):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                t_build = time.perf_counter() - t0
                if rep == 0:
                    try:
                        plan = explain_str(df)
                    except Exception as exc:  # plan capture must not fail profiling
                        plan = f"<explain failed: {exc}>"
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t_exec = time.perf_counter() - t1
                tot = time.perf_counter() - t0
                if tot < best:
                    best = tot
                    out[name] = {
                        "sec": round(tot, 3),
                        "build_sec": round(t_build, 3),
                        "exec_sec": round(t_exec, 3),
                    }
            jobs = tracker.getJobIdsForGroup(f"prof_{name}")
            n_jobs_total = len(jobs)
        except Exception as exc:
            err = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            out[name] = {"err": err}
        if name in out and err is None:
            out[name]["jobs_2reps"] = n_jobs_total
            n_ex = plan.count("Exchange")
            out[name]["exchanges"] = n_ex
            out[name]["py_nodes"] = (
                plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas")
                + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas")
            )
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({name: out[name]}), flush=True)
    total = sum(v.get("sec", 0.0) for v in out.values())
    print(f"TOTAL {total:.1f}s over {len(out)} queries", flush=True)
    with open(f"/tmp/profile_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
