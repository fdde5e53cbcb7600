"""ANN recall + balance at realistic scale (round-5 / r04 item 7): a
>= 1M-vector synthetic CLUSTERED corpus, the persisted IVF-flat and
sign-LSH indexes, recall@10 vs exact brute force across an nprobe
sweep, and cell-balance stats — the numbers that pin the nlist/nprobe
guidance in similarity.py (the round-4 measurement ran on the 500-row
toy corpus only).

Run via spark-submit:

  spark-submit --master local[32] --driver-memory 24g \
      scripts/ann_bigscale.py --n 1000000 --out BENCH/ann_1m.json

Corpus: ``--clusters`` unit-sphere centers (RandomState(777+c), the
natural-cluster shape real embedding tables have), each vector =
normalize(center[id % clusters] + sigma * noise) with noise drawn from
RandomState(id) — per-ROW seeding, so the corpus is bit-identical under
any partitioning or core count. No external data.
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--clusters", type=int, default=200)
    ap.add_argument("--sigma", type=float, default=0.35)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobes", default="1,4,8,16")
    ap.add_argument("--lsh-planes", type=int, default=12)
    ap.add_argument("--lsh-tables", type=int, default=4)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--pq-ks", type=int, default=256)
    ap.add_argument("--pq-refine", type=int, default=8)
    ap.add_argument("--pq-nprobes", default="4,8")
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("wiser-ann-bigscale")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # plain-python launch: the JVM starts here, so builder-set
        # driver memory IS honored (unlike under spark-submit) — the
        # 1M-vector cell assignment OOMs the 1g default
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wiser_spark.operators.similarity import (
        measure_ann_recall,
        write_ivf_index,
        write_lsh_index,
    )

    dim, n_clusters, sigma = args.dim, args.clusters, args.sigma
    centers = np.stack(
        [
            np.random.RandomState(777 + c).standard_normal(dim)
            for c in range(n_clusters)
        ]
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            out = np.empty((ids.size, dim), dtype=np.float64)
            for j, i in enumerate(ids):
                noise = np.random.RandomState(int(i) % (2**31)).standard_normal(dim)
                out[j] = centers[int(i) % n_clusters] + sigma * noise
            out /= np.linalg.norm(out, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype(np.float32).tolist() for r in out]}
            )

    work = tempfile.mkdtemp(prefix="wiser_ann_1m_")
    emb_path = f"{work}/embeddings"
    t0 = time.perf_counter()
    spark.range(args.n, numPartitions=args.cpus * 2).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(emb_path)
    gen_sec = time.perf_counter() - t0
    emb = spark.read.parquet(emb_path)

    result: dict = {
        "n_vectors": args.n, "dim": dim, "clusters": n_clusters,
        "sigma": sigma, "cpus": args.cpus, "gen_sec": round(gen_sec, 1),
    }

    # ---------------------------------------------------------- IVF-flat
    ivf_dir = f"{work}/ivf"
    t0 = time.perf_counter()
    write_ivf_index(emb, ivf_dir, n_centroids=args.nlist)
    result["ivf_build_sec"] = round(time.perf_counter() - t0, 1)
    with open(f"{ivf_dir}/ivf.json") as f:
        counts = sorted(json.load(f)["cell_counts"].values())
    import statistics

    result["ivf"] = {
        "nlist": args.nlist,
        "cell_max": counts[-1],
        "cell_median": int(statistics.median(counts)),
        "cell_balance_max_over_median": round(
            counts[-1] / max(statistics.median(counts), 1), 2
        ),
        "nprobe_sweep": {},
    }
    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        t0 = time.perf_counter()
        rec = measure_ann_recall(
            spark, ivf_dir, emb, "ivf", k=10,
            n_queries=args.queries, nprobe=nprobe,
        )
        dt = time.perf_counter() - t0
        # dt covers n_queries exact scans + n_queries probes; time the
        # probe alone for the per-query latency number
        from wiser_spark.operators.similarity import ivf_topk

        qv = [float(v) for v in emb.limit(1).collect()[0]["embedding"]]
        t0 = time.perf_counter()
        ivf_topk(spark, ivf_dir, qv, k=10, nprobe=nprobe).collect()
        probe_sec = time.perf_counter() - t0
        result["ivf"]["nprobe_sweep"][str(nprobe)] = {
            "recall_at_10": rec["recall_at_k"],
            "probe_sec": round(probe_sec, 2),
            "measure_sec": round(dt, 1),
        }
        print(json.dumps({"ivf_nprobe": nprobe, **result["ivf"]["nprobe_sweep"][str(nprobe)]}))

    # ---------------------------------------------------------- IVF-PQ
    from wiser_spark.operators.similarity import (
        ivfpq_topk,
        write_ivf_pq_index,
    )

    def du(path: str) -> int:
        total = 0
        for root, _, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
        return total

    pq_dir = f"{work}/pq"
    t0 = time.perf_counter()
    write_ivf_pq_index(
        emb, pq_dir, n_centroids=args.nlist, m=args.pq_m, ks=args.pq_ks
    )
    result["ivfpq_build_sec"] = round(time.perf_counter() - t0, 1)
    # the memory story, measured: PQ codes vs the flat index's vectors
    # (stored as double by the IVF writer) vs the raw float32 source
    codes_b, cells_b, raw_b = du(f"{pq_dir}/codes"), du(f"{ivf_dir}/cells"), du(emb_path)
    result["ivfpq"] = {
        "m": args.pq_m, "ks": args.pq_ks, "refine": args.pq_refine,
        "codes_bytes": codes_b,
        "ivf_cells_bytes": cells_b,
        "raw_float32_bytes": raw_b,
        "codes_vs_cells": round(cells_b / codes_b, 1),
        "codes_vs_raw": round(raw_b / codes_b, 1),
        "nprobe_sweep": {},
    }
    for nprobe in [int(x) for x in args.pq_nprobes.split(",")]:
        t0 = time.perf_counter()
        rec = measure_ann_recall(
            spark, pq_dir, emb, "ivfpq", k=10,
            n_queries=args.queries, nprobe=nprobe, refine=args.pq_refine,
        )
        dt = time.perf_counter() - t0
        qv = [float(v) for v in emb.limit(1).collect()[0]["embedding"]]
        t0 = time.perf_counter()
        ivfpq_topk(
            spark, pq_dir, emb, qv, k=10, nprobe=nprobe,
            refine=args.pq_refine,
        ).collect()
        probe_sec = time.perf_counter() - t0
        result["ivfpq"]["nprobe_sweep"][str(nprobe)] = {
            "recall_at_10": rec["recall_at_k"],
            "probe_sec": round(probe_sec, 2),
            "measure_sec": round(dt, 1),
        }
        print(json.dumps(
            {"ivfpq_nprobe": nprobe,
             **result["ivfpq"]["nprobe_sweep"][str(nprobe)]}
        ))

    # ---------------------------------------------------------- sign-LSH
    lsh_dir = f"{work}/lsh"
    t0 = time.perf_counter()
    write_lsh_index(
        emb, lsh_dir, n_planes=args.lsh_planes, n_tables=args.lsh_tables
    )
    result["lsh_build_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    rec = measure_ann_recall(
        spark, lsh_dir, emb, "lsh", k=10, n_queries=args.queries
    )
    result["lsh"] = {
        "n_planes": args.lsh_planes, "n_tables": args.lsh_tables,
        "recall_at_10": rec["recall_at_k"],
        "measure_sec": round(time.perf_counter() - t0, 1),
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
