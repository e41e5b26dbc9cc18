"""Local stand-in for the driver's t2 check: run every queries() entry at
sf0.01 and compare with oracle_sql() via DuckDB — row count, sorted column
names, and an order-insensitive value comparison.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except ImportError:
        pass
    return str(v)


def df_to_sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, x) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from rat_strain_loader_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue

        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only check)")
            n_rows_only += 1
            continue

        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")
            ok = False
        if ok:
            _, s_sorted = df_to_sorted_rows(s_cols, s_rows)
            _, d_sorted = df_to_sorted_rows(d_cols, d_rows)
            if s_sorted != d_sorted:
                diffs = [
                    (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
                ]
                print(f"FAIL  {name}: {len(diffs)} differing rows; first: {diffs[:2]}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
