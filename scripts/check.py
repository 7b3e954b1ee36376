#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <verify-out-dir> <sf-dir>

Runs every oracle SQL from <verify-out-dir>/oracle_sql.json in DuckDB over
the parquet tables in <sf-dir>, loads the Spark result parquet the Verify
main dumped for the same query name, sorts columns by name (mirroring the
driver's compare), and reports exact / near (float-tolerant) equality.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            want = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        status, detail = compare(got, want)
        if status != "OK":
            failures += 1
        print(f"{status:5s} {name}: {detail}")
    return failures


def compare(got: pd.DataFrame, want: pd.DataFrame):
    if list(got.columns) != list(want.columns):
        return "FAIL", f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return "FAIL", f"row count differs: spark={len(got)} oracle={len(want)}"
    exact = True
    near = True
    bad_col = None
    for c in got.columns:
        a, b = got[c], want[c]
        # The driver hashes value REPRESENTATIONS, so int64 5354 vs a
        # float64 5354.0 (e.g. DuckDB HUGEINT from SUM(int) -> pandas
        # float) is a hash MISMATCH even though == says equal. Compare
        # via repr-strings, never after numeric coercion.
        try:
            col_exact = a.equals(b) or (a.astype(str) == b.astype(str)).all()
        except Exception:  # noqa: BLE001
            col_exact = False
        if not col_exact:
            exact = False
            try:
                import numpy as np
                av, bv = a.astype(float), b.astype(float)
                if not np.allclose(av.fillna(-1e308), bv.fillna(-1e308),
                                   rtol=1e-9, atol=1e-9):
                    near = False
                    bad_col = c
            except Exception:  # noqa: BLE001
                near = False
                bad_col = c
    if exact:
        return "OK", f"{len(got)} rows exact"
    if near:
        return "NEAR", f"{len(got)} rows float-near (hash may still differ!)"
    return "FAIL", f"column '{bad_col}' differs; {len(got)} rows"


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
