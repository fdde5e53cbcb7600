"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` in DuckDB, compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracle_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(norm(row[c]) for c in spark_cols) for row in sdf.collect()
        )
        if name not in oracles:
            print(f"{name:24s} rows={len(spark_rows)} (no oracle — rows-only)")
            continue
        res = con.sql(oracles[name])
        duck_cols_raw = res.columns
        duck_df = res.fetchall()
        order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
        duck_cols = sorted(duck_cols_raw)
        duck_rows = sorted(tuple(norm(r[i]) for i in order) for r in duck_df)

        ok_schema = spark_cols == duck_cols
        ok_count = len(spark_rows) == len(duck_rows)
        ok_vals = spark_rows == duck_rows
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status}  rows {len(spark_rows)}/{len(duck_rows)} "
            f"schema={'=' if ok_schema else f'{spark_cols} vs {duck_cols}'}"
        )
        if not ok_vals and ok_schema and ok_count:
            for a, b in zip(spark_rows, duck_rows):
                if a != b:
                    print(f"  first diff:\n   spark {a}\n   duck  {b}")
                    break
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
