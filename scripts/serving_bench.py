"""Serving-layer benchmark — the reference's ``grpc_bench`` analogue
for the HTTP endpoint (S9 rendition, wiser_spark/serving/server.py).

The reference measures its engine THROUGH the RPC layer: unary
latency and streaming-RPC QPS against a loaded engine
(``grpc_bench.cc``, ``grpc_client_impl.h:577-608``).  This script does
the same against the HTTP server: build the v2 map-side index (+
chunked doc store) over the sf documents table, load + warm it the
way ``serve_index`` does, then measure

* unary ``/search`` warm latency p50/p99 over the 7-query log x
  ``--rounds`` (every request a full HTTP round trip);
* ``/stream_search`` QPS for a 21-request stream (3x the log) without
  snippets — the batch fan-in path;
* the same stream WITH snippets (winners point-fetched from the doc
  store through the range-coalesced extent predicate).

Writes one JSON line; ``--out`` records it under BENCH/.

Usage: python scripts/serving_bench.py [--cpus 32] [--sf-dir ...]
       [--rounds 3] [--out BENCH/serving_r05.json]
"""

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def post(url: str, path: str, body: bytes) -> bytes:
    req = urllib.request.Request(url + path, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.read()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--scan-coalesce", type=int, default=None,
                    help="SegmentIndex scan_coalesce for the served index")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{a.cpus}]")
        .appName("wiser-serving-bench")
        .config("spark.sql.shuffle.partitions", str(max(a.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import BM25_QUERIES, PARAMS
    from wiser_spark.config import IndexConfig
    from wiser_spark.operators.docstore import write_doc_store
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.segments import SegmentIndex
    from wiser_spark.serving import SearchServer

    docs = spark.read.parquet(f"{a.sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long"), F.col("text").alias("content")
    )
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="wiser_serving_bench_")
    idx_dir, store_dir = f"{base}/idx", f"{base}/store"
    write_index_mapside(docs, idx_dir,
                        IndexConfig(bm25=PARAMS, n_shards=max(a.cpus // 8, 4)))
    write_doc_store(docs, store_dir)
    with open(f"{store_dir}/meta.json") as f:
        codec = json.load(f)["codec"]

    # serve_index's load flow: cache the segments scan, warm the
    # dictionary — both OUTSIDE the timings (reference: load-time mmap)
    idx = SegmentIndex(spark, idx_dir, scan_coalesce=a.scan_coalesce)
    idx.segments = idx.segments.cache()
    idx.segments.count()
    idx.warmup()
    srv = SearchServer(idx, doc_store_dir=store_dir).start()
    url = f"http://{srv.host}:{srv.port}"

    # unary warm latency: one throwaway pass, then --rounds timed
    log = list(BM25_QUERIES.items())
    for _, (terms, ph) in log:
        post(url, "/search", json.dumps(
            {"terms": terms, "is_phrase": ph, "n_results": 10}
        ).encode())
    lat: list[float] = []
    for _ in range(a.rounds):
        for _, (terms, ph) in log:
            t0 = time.perf_counter()
            post(url, "/search", json.dumps(
                {"terms": terms, "is_phrase": ph, "n_results": 10}
            ).encode())
            lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = statistics.median(lat)
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]

    # streaming QPS: 3x the log on one stream, without then with snippets
    def stream_body(snips: bool) -> bytes:
        reqs = []
        for _ in range(3):
            for _, (terms, ph) in log:
                reqs.append({
                    "terms": terms, "is_phrase": ph, "n_results": 10,
                    "return_snippets": snips, "n_snippet_passages": 3,
                })
        return "\n".join(json.dumps(r) for r in reqs).encode()

    n_stream = 3 * len(log)
    body = stream_body(False)
    post(url, "/stream_search", body)  # warm
    t0 = time.perf_counter()
    out = post(url, "/stream_search", body)
    dt_plain = time.perf_counter() - t0
    assert len(out.splitlines()) == n_stream

    body = stream_body(True)
    post(url, "/stream_search", body)  # warm
    t0 = time.perf_counter()
    out = post(url, "/stream_search", body)
    dt_snips = time.perf_counter() - t0
    replies = [json.loads(ln) for ln in out.splitlines()]
    assert len(replies) == n_stream
    n_snips = sum(
        1 for r in replies for e in r["entries"] if e["snippet"]
    )

    srv.stop()
    result = {
        "metric": "http_serving_latency_and_qps",
        "unit": "sec",
        "sf": a.sf_dir,
        "n_docs": n_docs,
        "cpus": a.cpus,
        "scan_coalesce": a.scan_coalesce,
        "unary_warm_p50_sec": round(p50, 4),
        "unary_warm_p99_sec": round(p99, 4),
        "unary_n": len(lat),
        "stream_n_requests": n_stream,
        "stream_qps": round(n_stream / dt_plain, 2),
        "stream_qps_snippets": round(n_stream / dt_snips, 2),
        "stream_snippet_entries": n_snips,
        "doc_store_codec": codec,
    }
    line = json.dumps(result)
    print(line)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
