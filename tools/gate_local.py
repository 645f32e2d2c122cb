"""Ad-hoc local replica of the driver's correctness gate for a subset
of queries: ``python tools/gate_local.py <query> [<query> ...]``
runs each named query and its DuckDB oracle at sf0.001 AND sf0.01 and
prints MATCH/MISMATCH (same canonicalization as
``tests/test_entry_oracle.py``). Use while iterating on a new query;
the pytest parametrization remains the authoritative gate."""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)].copy()

    def cc(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.9g}"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(cc)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


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
    g, w = canon(got), canon(want)
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
