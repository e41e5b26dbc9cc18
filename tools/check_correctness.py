"""Local stand-in for the driver's t2 check: run every queries() entry at
sf0.01 and compare with oracle_sql() via DuckDB — row count, sorted column
names, an order-insensitive EXACT value comparison (no float rounding:
the driver hashes serialized values, so a last-bit double difference or a
Decimal-vs-float representation difference must fail here too), and a
column-type audit (DuckDB relation types must map onto the Spark schema —
catches DuckDB widening sum(BIGINT) to HUGEINT, DECIMAL drift, etc.).

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
    """Exact, type-tagged serialization — as strict as the driver's hash.

    Floats use repr() (round-trip exact, so a 1-ulp engine difference
    fails); Decimals keep their exact decimal string AND a type tag so a
    DECIMAL column can never silently match a DOUBLE/BIGINT one; ints are
    tagged so BIGINT 3 never matches VARCHAR '3'.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, int):
        return f"int:{v}"
    if hasattr(v, "isoformat"):
        return f"ts:{v.isoformat()}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, (list, tuple)):
        return "list:[" + ",".join(str(normalize_cell(x)) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"str:{v}"


def spark_dtype_to_duck(dt: str):
    """Map a Spark simpleString dtype to the DuckDB type(s) an exact
    oracle must produce. Returns None for types we don't audit."""
    dt = dt.strip()
    if dt.startswith("array<") and dt.endswith(">"):
        inner = spark_dtype_to_duck(dt[6:-1])
        return {t + "[]" for t in inner} if inner else None
    if dt.startswith("decimal("):
        return {"DECIMAL" + dt[7:].upper()}
    return {
        "tinyint": {"TINYINT"},
        "smallint": {"SMALLINT"},
        "int": {"INTEGER"},
        "bigint": {"BIGINT"},
        "float": {"FLOAT"},
        "double": {"DOUBLE"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "date": {"DATE"},
        "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
        "timestamp_ntz": {"TIMESTAMP"},
        "binary": {"BLOB"},
    }.get(dt)


def audit_types(spark_dtypes, duck_cols, duck_types):
    """Return list of (col, spark_type, duck_type) mismatches."""
    duck_by_col = dict(zip(duck_cols, (str(t).upper() for t in duck_types)))
    bad = []
    for col, sdt in spark_dtypes:
        expect = spark_dtype_to_duck(sdt)
        got = duck_by_col.get(col)
        if expect is None or got is None:
            continue
        if got not in expect:
            bad.append((col, sdt, got))
    return bad


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
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            ok = False
        type_bad = audit_types(sdf.dtypes, d_cols, d_types)
        if type_bad:
            print(f"FAIL  {name}: oracle type drift {type_bad}")
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
