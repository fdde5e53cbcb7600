"""Synthesize a driver-scale sf1.0 corpus for LOCAL A/B measurement.

The driver generates its own sf1.0 (50k docs) at measurement time and
the copy from earlier in round 6 did not survive the sandbox reboot.
This replicates sf0.1's 5k docs 10x with a varied tail token — the
same recipe bench.py's internal sf1 section uses — so postings size,
vocabulary shape and doc-length distribution match driver scale. For
timing comparisons only; never a correctness fixture.

Usage: python scripts/make_sf1_local.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1.0"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-sf1-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (
        docs.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"),
        )
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
            ).alias("text"),
        )
    )
    # two part files, like the real sf dirs (the build's repartition-to-
    # cores input fix must stay exercised)
    big.repartition(2).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"wrote {n} docs to {out}/documents.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
