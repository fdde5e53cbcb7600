"""Phase-timed repro for the batched-build path: staging / per-batch /
final-refresh wall clocks at a configurable scale, for A/B-ing code
versions (run via spark-submit --py-files with each version's zip).

  spark-submit --master local[8] --driver-memory 16g \
      --py-files /tmp/A.zip scripts/repro_build_phases.py --cpus 8 --mult 400
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--mult", type=int, default=400)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-shards", type=int, default=128)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"wiser-repro-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import PARAMS
    from wiser_spark.config import IndexConfig
    from wiser_spark.plans.build import build_index_mapside_batched

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    source = (
        base.select("doc_id", F.col("text").alias("content"))
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1)))
        )
        .select(
            F.format_string(
                "%012d", F.col("doc_id") * args.mult + F.col("rep")
            ).alias("doc_key"),
            F.concat(
                F.col("content"), F.lit(" rep"), F.col("rep").cast("string")
            ).alias("content"),
        )
    )
    work = tempfile.mkdtemp(prefix=f"wiser_repro_{args.cpus}_")
    gen_dir = os.path.join(work, "gens")
    t0 = time.perf_counter()
    manifest = build_index_mapside_batched(
        spark, source, gen_dir,
        IndexConfig(bm25=PARAMS, n_shards=args.n_shards),
        n_batches=args.batches, order_cols=("doc_key",),
    )
    build_sec = time.perf_counter() - t0
    walls = [
        round(e.wall_s, 2)
        for _, e in sorted(
            (int(n.rsplit("_", 1)[1]), e)
            for n, e in manifest.entries.items()
            if n.startswith("batch_")
        )
    ]
    result = {
        "cpus": args.cpus,
        "n_docs": 5000 * args.mult,
        "build_sec": round(build_sec, 2),
        "sum_batch_walls": round(sum(walls), 2),
        "overhead_sec": round(build_sec - sum(walls), 2),
        "per_batch_sec": walls,
        "docs_per_sec": round(5000 * args.mult / build_sec, 1),
    }
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
