#!/usr/bin/env python
"""Local pre-flight of the driver's correctness gate: run every
__spark_entry__ query through Spark AND its DuckDB oracle on the same
parquet, compare row count + sorted-column schema + canonical value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        s = d[c]
        if pd.api.types.is_float_dtype(s):
            d[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            d[c] = s.astype("datetime64[us]")
    d = d.sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256(d.to_csv(index=False, float_format="%.6f").encode()).hexdigest()[:16]
    return len(d), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from epigraphdb_graph_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("check-oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = em.queries(), em.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:28s} SPARK ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_pdf)} rows, cols={sorted(spark_pdf.columns)}")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR {e}")
            continue
        ns, cs, hs = canon(spark_pdf)
        no, co, ho = canon(oracle_pdf)
        ok = (ns, cs, hs) == (no, co, ho)
        status = "OK" if ok else "MISMATCH"
        print(f"{name:28s} {status}  spark=({ns},{hs}) duck=({no},{ho})")
        if not ok:
            if cs != co:
                print(f"    cols: spark={cs} duck={co}")
            failures.append((name, "hash/count mismatch"))
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
