"""Focused per-query microbench (guide §1.4): times each relational and
segment query N times in one warm session and reports min/median —
bench.py's single-sample numbers carry first-run JIT/codegen noise that
this harness removes. Reads the same env contract as bench.py
($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS). Never run by the driver —
bench.py stays the frozen measurement."""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "4"))
    shutil = __import__("shutil")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wiser-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.storagelevel import StorageLevel

    from __spark_entry__ import BM25_QUERIES, PARAMS
    from wiser_spark.config import IndexConfig
    from wiser_spark.operators.docstats import build_docstats, corpus_stats
    from wiser_spark.operators.postings import build_dictionary, build_postings_arrow
    from wiser_spark.operators.segments import SegmentIndex, write_index
    from wiser_spark.operators.topk import bm25_topk, bm25_topk_batch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long"), F.col("text").alias("content")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()

    postings = build_postings_arrow(docs).persist(StorageLevel.MEMORY_AND_DISK)
    docstats = build_docstats(docs).persist(StorageLevel.MEMORY_AND_DISK)
    dictionary = build_dictionary(postings).cache()
    postings.count()
    docstats.count()
    dictionary.count()
    stats = corpus_stats(docstats)

    batch = [
        (i * 10 + j, terms, is_phrase)
        for j in range(3)
        for i, (terms, is_phrase) in enumerate(BM25_QUERIES.values())
    ]

    def timed(fn):
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            out.append(time.perf_counter() - t0)
        return out

    results: dict[str, dict] = {}

    def record(name, samples):
        results[name] = {
            "min": round(min(samples), 3),
            "med": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name:26s} min={min(samples):7.3f} med={statistics.median(samples):7.3f}")

    # warm one of each shape first (JIT / codegen fill)
    for name, (terms, ph) in BM25_QUERIES.items():
        spark.sparkContext.setJobDescription(f"warm {name}")
        bm25_topk(postings, docstats, dictionary, stats, terms, k=10,
                  params=PARAMS, is_phrase=ph).collect()
    for name, (terms, ph) in BM25_QUERIES.items():
        spark.sparkContext.setJobDescription(f"rel {name}")
        record(name, timed(lambda: bm25_topk(
            postings, docstats, dictionary, stats, terms, k=10,
            params=PARAMS, is_phrase=ph).collect()))
    spark.sparkContext.setJobDescription("rel batch21")
    bm25_topk_batch(postings, docstats, dictionary, stats, batch, k=10,
                    params=PARAMS).count()
    record("batch_21_queries", timed(lambda: bm25_topk_batch(
        postings, docstats, dictionary, stats, batch, k=10,
        params=PARAMS).count()))

    # segment path
    index_dir = tempfile.mkdtemp(prefix="wiser_bx_idx_")
    try:
        spark.sparkContext.setJobDescription("index build")
        t0 = time.perf_counter()
        write_index(postings, docstats, dictionary, stats, index_dir,
                    IndexConfig(bm25=PARAMS, n_shards=max(cpus, 4)))
        record("index_build", [time.perf_counter() - t0])
        idx = SegmentIndex(spark, index_dir)
        idx.segments = idx.segments.cache()
        idx.segments.count()
        idx.warmup()
        for name, (terms, ph) in BM25_QUERIES.items():
            idx.search(terms, k=10, is_phrase=ph).collect()  # warm
        for name, (terms, ph) in BM25_QUERIES.items():
            spark.sparkContext.setJobDescription(f"seg {name}")
            record(f"seg_{name}", timed(lambda: idx.search(
                terms, k=10, is_phrase=ph).collect()))
        spark.sparkContext.setJobDescription("seg batch21")
        idx.search_batch(batch, k=10).count()
        record("seg_batch_21_queries", timed(
            lambda: idx.search_batch(batch, k=10).count()))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    payload = {"sf_dir": sf_dir, "cpus": cpus, "reps": reps, "results": results}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({k: v["med"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
