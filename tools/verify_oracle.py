"""Local replica of the driver's correctness gate: runs each catalog
query on Spark and its oracle on DuckDB at a given SF, compares row
count, column names, and order-insensitive values.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """sort columns by name, then rows; normalize values for compare"""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            col_a, col_b = a[c], b[c]
            if col_a.dtype.kind == "f" or col_b.dtype.kind == "f":
                bad = ~(
                    (col_a.isna() & col_b.isna())
                    | ((col_a - col_b).abs() < 1e-9)
                )
                nbad = int(bad.sum())
                if nbad:
                    i = bad.idxmax()
                    problems.append(f"col {c}: {nbad} float diffs e.g. {col_a[i]} vs {col_b[i]}")
            else:
                neq = (col_a.astype(str) != col_b.astype(str))
                nbad = int(neq.sum())
                if nbad:
                    i = neq.idxmax()
                    problems.append(f"col {c}: {nbad} diffs e.g. {col_a[i]!r} vs {col_b[i]!r}")
    return problems


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: verify_oracle.py [SF_DIR] [QUERY ...] [--json OUT.json]")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from syslog_ng_spark.catalog import ORACLES, QUERIES
    from syslog_ng_spark.session import get_session

    only = set(args[1:])
    spark = get_session("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    records: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            records[name] = {"status": "FAIL", "err": f"spark error: {str(e)[:300]}"}
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: {len(spdf)} rows (rows-only, no oracle)")
            records[name] = {"status": "ok", "rows": len(spdf), "rows_only": True}
            n_pass += 1
            continue
        ddf = con.execute(ORACLES[name]).df()
        problems = compare(name, spdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
            records[name] = {"status": "FAIL", "err": "; ".join(problems)[:500]}
        else:
            n_pass += 1
            print(f"ok   {name}: {len(spdf)} rows match")
            records[name] = {"status": "ok", "rows": len(spdf)}
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        # machine-visible full-catalog result (ADVICE r6: the driver's
        # fixed 50-query sample can miss a red gate — this artifact
        # can't; gate.sh writes it every run and it is committed)
        import json

        Path(json_out).write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "queries": records,
                },
                indent=1,
            )
            + "\n"
        )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
