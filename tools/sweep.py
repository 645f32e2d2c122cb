"""Full-registry oracle sweep at an arbitrary SF dir:
``python tools/sweep.py [sf_dir] [start [end]]`` runs EVERY registered
query (or the ORDER slice [start:end)) against its DuckDB oracle —
the scale-assurance pass SCALE.md records per round (gate_local is the
per-query variant; this is the whole-registry loop with a summary
line). Canonicalization is imported from the pytest gate so it cannot
drift.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gate_local import gate

    import __spark_entry__ as m
    from spark_ifs_spark.registry._order import ORDER
    from spark_ifs_spark.session import get_spark

    names = ORDER[
        int(sys.argv[2]) if len(sys.argv) > 2 else 0 :
        int(sys.argv[3]) if len(sys.argv) > 3 else len(ORDER)
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    t0 = time.time()
    for name in names:
        try:
            ok = gate(spark, m, name, sf_dir)
        except Exception as exc:
            print(f"{name} ERR {type(exc).__name__}: {str(exc)[:300]}", flush=True)
            ok = False
        if not ok:
            fails.append(name)
    print(
        f"SWEEP {sf_dir}: {len(names) - len(fails)}/{len(names)} green "
        f"in {time.time() - t0:.0f}s",
        flush=True,
    )
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
