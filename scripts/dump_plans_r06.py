"""Dump .explain("formatted") plans for the r06-touched query paths.

Usage: python scripts/dump_plans_r06.py <out_suffix> [name ...]
Writes plans/r06/<query>_<out_suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    os.makedirs("plans/r06", exist_ok=True)
    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # pragma: no cover
            plan = f"ERROR building plan: {ex}"
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(name, "->", f"plans/r06/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
