"""Benchmark harness — the driver runs this per round.

Measures, on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with
local[$SPARK_GRAFT_CPUS]:
  * index build (tokenize -> postings -> docstats -> dictionary ->
    segment write) throughput in docs/sec
  * per-query latency of the headline BM25 query set on BOTH paths
    (relational DataFrame plan; segment-decode path)

Prints exactly ONE JSON line to stdout:
  {"metric": "...", "value": <total suite seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wiser-spark-bench")
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
    from wiser_spark.operators.postings import (
        build_dictionary,
        build_postings_arrow,
    )
    from wiser_spark.operators.segments import SegmentIndex, write_index
    from wiser_spark.operators.topk import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long"), F.col("text").alias("content")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()

    timings: dict[str, float] = {}
    index_dir = tempfile.mkdtemp(prefix="wiser_bench_idx_")
    try:
        t0 = time.perf_counter()
        postings = build_postings_arrow(docs).persist(StorageLevel.MEMORY_AND_DISK)
        docstats = build_docstats(docs).persist(StorageLevel.MEMORY_AND_DISK)
        dictionary = build_dictionary(postings)
        stats = corpus_stats(docstats)
        write_index(
            postings, docstats, dictionary, stats, index_dir,
            IndexConfig(bm25=PARAMS, n_shards=max(cpus, 4)),
        )
        build_sec = time.perf_counter() - t0
        timings["index_build"] = round(build_sec, 3)

        # relational-path queries (postings cached, like a warm index)
        postings_c = postings.cache()
        docstats_c = docstats.cache()
        dictionary_c = dictionary.cache()
        postings_c.count()
        docstats_c.count()
        dictionary_c.count()
        for name, (terms, is_phrase) in BM25_QUERIES.items():
            t0 = time.perf_counter()
            bm25_topk(
                postings_c, docstats_c, dictionary_c, stats, terms,
                k=10, params=PARAMS, is_phrase=is_phrase,
            ).collect()
            timings[name] = round(time.perf_counter() - t0, 3)

        # batched query log: all queries in ONE job (the QPS path)
        from wiser_spark.operators.topk import bm25_topk_batch

        batch = [
            (i * 10 + j, terms, is_phrase)
            for j in range(3)
            for i, (terms, is_phrase) in enumerate(BM25_QUERIES.values())
        ]
        t0 = time.perf_counter()
        n_res = bm25_topk_batch(
            postings_c, docstats_c, dictionary_c, stats, batch,
            k=10, params=PARAMS,
        ).count()
        dt = time.perf_counter() - t0
        timings["batch_21_queries"] = round(dt, 3)
        batch_qps = round(len(batch) / dt, 2)
        _ = n_res

        # segment-path queries (cold: read segments from parquet).
        # The driver dictionary cache builds OUTSIDE the per-query
        # timings (the reference pays its .tip mmap at engine load,
        # not on query 1) and is reported as its own line — r03's
        # seg_bm25_single_high "regression" was this cost landing on
        # whichever query ran first.
        idx = SegmentIndex(spark, index_dir)
        idx.segments = idx.segments.cache()
        idx.segments.count()
        t0 = time.perf_counter()
        idx.warmup()
        timings["seg_dict_warmup"] = round(time.perf_counter() - t0, 3)
        for name, (terms, is_phrase) in BM25_QUERIES.items():
            t0 = time.perf_counter()
            idx.search(terms, k=10, is_phrase=is_phrase).collect()
            timings[f"seg_{name}"] = round(time.perf_counter() - t0, 3)

        # the segment BATCH path: whole log, one shard pass (QPS path)
        t0 = time.perf_counter()
        n_res = idx.search_batch(batch, k=10).count()
        dt = time.perf_counter() - t0
        timings["seg_batch_21_queries"] = round(dt, 3)
        seg_batch_qps = round(len(batch) / dt, 2)
        _ = n_res
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    # ---- the SCALE build path (zero-shuffle map-side) at the same SF,
    # reported separately so the classic suite total stays comparable
    # round-over-round
    from wiser_spark.operators.mapside import write_index_mapside

    extras: dict[str, float] = {}
    d2 = tempfile.mkdtemp(prefix="wiser_bench_idx_v2_")
    try:
        t0 = time.perf_counter()
        write_index_mapside(docs, d2, IndexConfig(bm25=PARAMS, n_shards=cpus))
        extras["index_build_mapside"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(d2, ignore_errors=True)

    # ---- sf1.0-equivalent corpus (10x replication, varied tail token):
    # 5k docs is fixed-overhead noise; 50k gives round-over-round signal
    from pyspark.sql import functions as FF

    big = (
        docs.select(
            "doc_id", "content",
            FF.explode(FF.sequence(FF.lit(0), FF.lit(9))).alias("rep"),
        )
        .select(
            (FF.col("doc_id") * 10 + FF.col("rep")).alias("doc_id"),
            FF.concat(
                FF.col("content"), FF.lit(" rep"), FF.col("rep").cast("string")
            ).alias("content"),
        )
        .repartition(cpus)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sf1_n = big.count()
    d3 = tempfile.mkdtemp(prefix="wiser_bench_idx_sf1_")
    sf1: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        write_index_mapside(
            big, d3, IndexConfig(bm25=PARAMS, n_shards=cpus),
            reuse_partitions=True,
        )
        sf1["build"] = round(time.perf_counter() - t0, 3)
        # warm single-query latency distribution over the full 7-query
        # suite x3 (segment cached) — the round-over-round latency
        # signal the BENCH/BASELINE.md table tracks
        idx1 = SegmentIndex(spark, d3)
        idx1.segments = idx1.segments.cache()
        idx1.segments.count()
        t0 = time.perf_counter()
        idx1.warmup()
        sf1["dict_warmup"] = round(time.perf_counter() - t0, 3)
        lat: list[float] = []
        for rep in range(3):
            for qname, (terms, is_phrase) in BM25_QUERIES.items():
                t0 = time.perf_counter()
                idx1.search(terms, k=10, is_phrase=is_phrase).collect()
                dt = time.perf_counter() - t0
                if rep > 0:  # rep 0 pays JIT/cache fill: not "warm"
                    lat.append(dt)
                if rep == 1:  # warm representative (rep 0 pays JIT/cache fill)
                    if qname == "bm25_and2":
                        sf1["and2"] = round(dt, 3)
                    elif qname == "bm25_phrase2":
                        sf1["phrase2"] = round(dt, 3)
        lat.sort()
        sf1["p50"] = round(lat[len(lat) // 2], 3)
        sf1["p99"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3)
    finally:
        shutil.rmtree(d3, ignore_errors=True)

    # kernel-only block-max evidence (no Spark): single-term top-10 over
    # one shard's posting list, full decode vs block-max, at densities a
    # stopword-like code token reaches per shard at 10^12-file scale
    try:
        from scripts.blockmax_bench import one_scale

        bmx = {f"blockmax_speedup_{n//1000}k": one_scale(n, reps=3)["speedup"]
               for n in (10_000, 100_000, 1_000_000)}
    except Exception as ex:  # never let the extra break the headline JSON
        bmx = {"blockmax_bench_err": str(ex)[:120]}

    # absolute-scale evidence (>= 20M docs, the reference's own corpus
    # scale) is produced by scripts/bigscale_bench.py and committed
    # under BENCH/ — too long for the per-round driver run, so the
    # RECORDED numbers are surfaced here, clearly marked as such
    bigscale: dict = {}
    try:
        bs_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH", "bigscale_32_20m.json",
        )
        with open(bs_path) as f:
            bs = json.load(f)
        bigscale = {
            "recorded_from": "BENCH/bigscale_32_20m.json (see BENCH/BASELINE.md)",
            "n_docs": bs["n_docs"],
            "cpus": bs["cpus"],
            "build_docs_per_sec": bs["docs_per_sec_precompact"],
            "build_plus_compact_docs_per_sec": bs["docs_per_sec"],
            "warm_p50_sec": bs["warm_p50_blockmax"],
            "warm_p99_sec": bs["warm_p99_blockmax"],
            "warm_p50_no_blockmax_sec": bs["warm_p50_generic"],
            "warm_p99_no_blockmax_sec": bs["warm_p99_generic"],
            "batch_qps": bs["batch_qps"],
        }
    except (OSError, KeyError, json.JSONDecodeError):
        pass

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "index_build_plus_bm25_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / timings["index_build"], 1),
        "docs_per_sec_mapside": round(
            n_docs / extras["index_build_mapside"], 1
        ),
        # the engine's batched-query throughput = its best batch path
        # (SegmentIndex.search_batch, oracle-verified); the relational
        # per-shape batch is reported alongside for comparison
        "batch_qps": seg_batch_qps,
        "batch_qps_relational": batch_qps,
        "seg_batch_qps": seg_batch_qps,
        "sf1_n_docs": sf1_n,
        "sf1_build_sec": sf1["build"],
        "sf1_docs_per_sec": round(sf1_n / sf1["build"], 1),
        "sf1_query_and2_sec": sf1["and2"],
        "sf1_query_phrase2_sec": sf1["phrase2"],
        "sf1_warm_p50_sec": sf1["p50"],
        "sf1_warm_p99_sec": sf1["p99"],
        "sf1_dict_warmup_sec": sf1["dict_warmup"],
        **bmx,
        **({"bigscale_20m_recorded": bigscale} if bigscale else {}),
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
