"""Ad-hoc local replica of the driver's correctness gate for a subset
of queries: ``python tools/gate_local.py <query> [<query> ...]``
runs each named query and its DuckDB oracle at sf0.001 AND sf0.01 and
prints MATCH/MISMATCH. The canonicalization and table list are IMPORTED
from ``tests/test_entry_oracle.py`` (the authoritative gate replica), so
this tool can never drift from what the pytest gate accepts. Use while
iterating on a new query; the pytest parametrization remains the
authoritative gate.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_entry_oracle import TABLES, _canon  # noqa: E402


def gate(spark, m, name: str, sf_dir: str) -> bool:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    got = m.queries()[name](spark, sf_dir).toPandas()
    want = con.execute(m.oracle_sql()[name]).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        print(f"{name} {sf_dir} SCHEMA MISMATCH {sorted(got.columns)} vs {sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"{name} {sf_dir} ROWS {len(got)} vs {len(want)}")
        return False
    g, w = _canon(got), _canon(want)
    ok = bool(g.equals(w))
    print(f"{name} {sf_dir} rows={len(got)} {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        d = (g != w).any(axis=1)
        print("spark:\n", g[d].head(4), "\noracle:\n", w[d].head(4))
    return ok


def main() -> int:
    names = sys.argv[1:]
    from spark_ifs_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for n in names:
            ok = gate(spark, m, n, sf) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
