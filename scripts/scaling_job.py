"""One scaling treatment: index build + query suite at a given core count.

Run via spark-submit (the north-rule invocation):
  spark-submit --master local[N] --py-files wiser_spark.zip \
      scripts/scaling_job.py --cpus N --mult 40 --out result.json

The corpus is the sf0.1 documents table replicated --mult times with
dense remapped docIDs (deterministic, identical across treatments), so
both cluster sizes do the exact same work and the only variable is
parallelism.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--mult", type=int, default=40)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--out", default="")
    ap.add_argument("--query-reps", type=int, default=3,
                    help="0 skips the query suite (build-only treatment)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"wiser-scaling-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        # bigger Arrow batches -> fewer per-batch dictionary merges in
        # the map-side encoder
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import BM25_QUERIES, PARAMS
    from wiser_spark.config import IndexConfig
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.segments import SegmentIndex

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    docs = (
        base.select("doc_id", F.col("text").alias("content"))
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))))
        .select(
            (F.col("doc_id") * args.mult + F.col("rep")).alias("doc_id"), "content"
        )
        .repartition(args.n_shards)  # identical layout for every treatment
    )
    from pyspark.storagelevel import StorageLevel

    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()

    index_dir = tempfile.mkdtemp(prefix=f"wiser_scale_{args.cpus}_")
    try:
        t0 = time.perf_counter()
        # map-side zero-shuffle build: the persisted input partitioning
        # IS the sharding; the only shuffle anywhere is the
        # vocabulary-sized dictionary aggregate
        write_index_mapside(
            docs, index_dir, IndexConfig(bm25=PARAMS, n_shards=args.n_shards),
            reuse_partitions=True,
        )
        build_sec = time.perf_counter() - t0

        result = {
            "cpus": args.cpus,
            "n_docs": n_docs,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(n_docs / build_sec, 1),
        }
        if args.query_reps > 0:
            idx = SegmentIndex(spark, index_dir)
            idx.segments = idx.segments.cache()
            idx.segments.count()
            latencies = []
            per_query = {}
            for name, (terms, is_phrase) in BM25_QUERIES.items():
                for rep in range(args.query_reps):
                    t0 = time.perf_counter()
                    idx.search(terms, k=10, is_phrase=is_phrase).collect()
                    dt = time.perf_counter() - t0
                    if rep > 0 or args.query_reps == 1:
                        latencies.append(dt)  # rep 0 = cold, not "warm"
                    if rep == args.query_reps - 1:  # warm number
                        per_query[name] = round(dt, 3)
            latencies.sort()
            result.update({
                "query_p50": round(latencies[len(latencies) // 2], 3),
                "query_p99": round(
                    latencies[max(0, int(len(latencies) * 0.99) - 1)], 3),
                "queries_warm": per_query,
            })
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
