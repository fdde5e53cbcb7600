"""Embedding similarity search over an ``array<float>`` column.

Two paths over the ``embeddings`` table (vec_id, embedding, label):

  brute-force    exact cosine top-k: JVM-side F.zip_with + F.aggregate
                 dot products (no Python, no shuffle beyond the final
                 TakeOrderedAndProject)
  sign-LSH (ANN) deterministic hyperplanes (md5-seeded), vectors bucketed
                 by sign pattern across N_TABLES independent tables
                 (OR-construction for recall). write_lsh_index persists
                 the buckets PARTITIONED BY (tbl, bucket); a query probes
                 its n_tables buckets via partition pruning
                 (lsh_topk_indexed) — never a full scan+rehash.
                 lsh_topk remains the ad-hoc single-table variant for
                 index-less use.

At 100 TB the brute-force path stays linear-per-query but embarrassingly
parallel (no shuffle); the persisted LSH path is an O(bucket) probe with
bits ~ log2(N) so bucket sizes stay bounded as the corpus grows.

A third persisted path, IVF-flat (write_ivf_index / ivf_topk), probes
the nprobe nearest centroid cells through partition pruning; IVF-PQ
(write_ivf_pq_index / ivfpq_topk) additionally PRODUCT-QUANTIZES the
vectors — each stored row is ``m`` one-byte-ish codes instead of a
d x 4-byte float array (64-dim float32 -> 8 codes is 32x smaller), the
difference between "the index fits in cluster memory" and "it doesn't"
at 10^10+ vectors. Codebooks are deterministic spread samples (no
Lloyd iterations), so the ENTIRE pipeline — sampling, encoding, ADC
scoring, refine re-rank — is reproducible bit-for-bit by the DuckDB
oracle and differentially gated, not just recall-measured.

MEASURED GUIDANCE (BENCH/ann_1m.json, BENCH/ann_1m_pq.json — 1M x
32-dim clustered corpus, local[32]):
  * IVF-flat, nlist=1024: recall@10 0.994 at nprobe=1-4, 1.0 at 8;
    cell balance max/median 1.65. nlist ~ sqrt(N) is the sane default.
  * IVF-PQ m=8/ks=256/refine=8: codes table 15.1 MB vs 204 MB flat
    cells (13.5x) and 133 MB raw float32 (8.8x); recall@10 ~0.85,
    plateaued across nprobe — QUANTIZATION-limited, so raise ``refine``
    (clustered pytest corpus: 4 -> 0.887, 8 -> 0.938) or ``m``, not
    nprobe, when chasing recall. Returned scores are exact either way.
  * sign-LSH 12 planes x 4 tables: recall@10 0.21 at 1M — the
    cheap-build/no-centroid path; prefer IVF when recall matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wiser_spark.operators.dedup import md5_long


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector:
    (rank, vec_id, cosine)."""
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scored = embeddings.select(
        "vec_id", cosine_col(emb, q).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5("p<plane>_<j>") -> 60-bit int -> scaled. Reproducible in SQL."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"p{plane}_{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 1_000_000) / 500_000.0 - 1.0)
    return out


def lsh_bucket_col(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(plane_p, v) >= 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(v)).cast("double") for v in plane])
        bucket = bucket + F.when(_dot(emb, pl) >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """ANN top-k: probe only the query's sign-LSH bucket:
    (rank, vec_id, cosine). Approximate — recall measured in tests."""
    dim = len(query_vec)
    planes = [hyperplane(p, dim) for p in range(n_planes)]
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucketed = embeddings.select(
        "vec_id", emb.alias("emb"), lsh_bucket_col(emb, planes).alias("bucket")
    )
    import numpy as np

    qb = 0
    for p, plane in enumerate(planes):
        if float(np.dot(query_vec, plane)) >= 0:
            qb |= 1 << p
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = bucketed.filter(F.col("bucket") == qb).select(
        "vec_id", cosine_col(F.col("emb"), q).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def table_planes(n_planes: int, n_tables: int, dim: int) -> list[list[list[float]]]:
    """Independent hyperplane sets per OR-table: table t uses plane ids
    t*n_planes .. t*n_planes+n_planes-1 (so n_tables=1 reproduces the
    single-table layout). More planes => smaller buckets (bits should
    grow ~log2 N); more tables => recall (a near pair only needs to
    collide in ONE table)."""
    return [
        [hyperplane(t * n_planes + p, dim) for p in range(n_planes)]
        for t in range(n_tables)
    ]


def _bucketed(embeddings: DataFrame, planes_per_table) -> DataFrame:
    """(vec_id, emb, tbl, bucket) — ONE scan computes every table's
    bucket (posexplode of the bucket array), n_tables rows per vector."""
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    buckets = F.array(*[lsh_bucket_col(emb, pl) for pl in planes_per_table])
    return embeddings.select(
        "vec_id", emb.alias("emb"), F.posexplode(buckets).alias("tbl", "bucket")
    )


def write_lsh_index(
    embeddings: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int | None = None,
    recall_queries: int = 0,
) -> None:
    """Persist the multi-table sign-LSH index: parquet PARTITIONED BY
    (tbl, bucket), so a query probes its n_tables buckets through
    partition pruning instead of rescanning and re-hashing every vector.
    This is the scale path the round-1 query-time variant lacked.
    ``recall_queries`` > 0 measures recall@10 vs brute force on that
    many spread-sampled queries and records it in lsh.json. It is
    OPT-IN (default 0): each query costs one exact scan of the table,
    which is fine on a validation sample but not as a surprise default
    on the 100 TB builds these indexes exist for."""
    import json
    import os

    if dim is None:
        dim = int(embeddings.select(F.size("embedding")).first()[0])
    b = _bucketed(embeddings, table_planes(n_planes, n_tables, dim))
    # repartition ON the partition keys before partitionBy: each
    # (tbl, bucket) dir then receives files from ONE task instead of
    # one small file per (task x dir) — at 1M vectors x 8 tables x 2^10
    # buckets the difference is ~1e4 files vs ~1e6 (file-count hygiene
    # the 100 TB build needs; query plans are unchanged)
    b.repartition(F.col("tbl"), F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("tbl", "bucket").parquet(f"{index_dir}/buckets")
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/lsh.json", "w") as f:
        json.dump({"n_planes": n_planes, "n_tables": n_tables, "dim": dim}, f)
    if recall_queries:
        measure_ann_recall(
            embeddings.sparkSession, index_dir, embeddings, "lsh",
            n_queries=recall_queries,
        )


def query_buckets(query_vec: list[float], planes_per_table) -> list[int]:
    """The query's bucket id in each table (driver-side, tiny)."""
    import numpy as np

    out = []
    for planes in planes_per_table:
        qb = 0
        for p, plane in enumerate(planes):
            if float(np.dot(query_vec, plane)) >= 0:
                qb |= 1 << p
        out.append(qb)
    return out


def lsh_topk_indexed(
    spark, index_dir: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """ANN top-k over the PERSISTED index: (rank, vec_id, cosine).

    The (tbl, bucket) filter is a pure partition predicate — the scan
    touches only the n_tables probed buckets (verified by the
    partition-pruning plan audit in tests). Union of tables, distinct
    vec_id, exact cosine on the survivors."""
    import json

    with open(f"{index_dir}/lsh.json") as f:
        meta = json.load(f)
    planes_pt = table_planes(meta["n_planes"], meta["n_tables"], meta["dim"])
    qbs = query_buckets(query_vec, planes_pt)
    probe = None
    for t, qb in enumerate(qbs):
        p = (F.col("tbl") == t) & (F.col("bucket") == qb)
        probe = p if probe is None else probe | p
    cand = (
        spark.read.parquet(f"{index_dir}/buckets")
        .filter(probe)
        .select("vec_id", "emb")
        .dropDuplicates(["vec_id"])
    )
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = cand.select("vec_id", cosine_col(F.col("emb"), q).alias("cosine"))
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


# --------------------------------------------------------------- IVF-flat
def _sample_centroids(
    base: DataFrame, n_centroids: int, centroid_ids: list[int] | None
) -> tuple[list[int], DataFrame]:
    """The deterministic spread-sampled centroid pick + centroid-vector
    frame — ONE definition behind both IVF writers (flat and PQ), so
    their cells — and the DuckDB oracle's — can never drift apart."""
    if centroid_ids is None:
        centroid_ids = [
            int(r["vec_id"])
            for r in base.select("vec_id")
            .orderBy(md5_long(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(n_centroids).collect()
        ]
    cents = base.filter(F.col("vec_id").isin(centroid_ids)).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    return centroid_ids, cents


def _assign_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Max-cosine cell assignment (ties -> lower centroid id), shared by
    both IVF writers. SCALE SHAPE: the N x |C| scored rows carry ONLY
    (vec_id, cid, cos) — never the embedding — and collapse through a
    groupBy MAX of an ordering struct (cos desc, cid asc via negated
    cid), which partial-aggregates map-side: the shuffle moves ~N tiny
    rows, not N x |C| (the round-4 window formulation shuffled the full
    cross product WITH embeddings — a non-starter at 10^6 x 10^3).
    Float comparisons are exact, so assignments — and the DuckDB oracle
    gates — are bit-identical to the window form."""
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid",
        cosine_col(F.col("emb"), F.col("cemb")).alias("cos"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(F.col("cos").alias("c"), (-F.col("cid")).alias("nc"))
        ).alias("m")
    ).select("vec_id", (-F.col("m.nc")).alias("cell"))
    return base.join(best, "vec_id").select("vec_id", "emb", "cell")


def write_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    centroid_ids: list[int] | None = None,
    recall_queries: int = 0,
) -> None:
    """Persist an IVF-flat index: every vector assigned to its nearest
    (max-cosine) centroid CELL, parquet PARTITIONED BY cell.

    Centroids are data vectors chosen by DETERMINISTIC SPREAD SAMPLING:
    the ``n_centroids`` lowest values of md5(vec_id) (ties -> lower
    vec_id) — a uniform pseudo-random sample that is reproducible on
    both engines (the DuckDB oracle computes the identical md5 order),
    unless ``centroid_ids`` is given. Spread sampling matters at scale:
    taking the LOWEST ids (the round-1/2 scheme) picks centroids that
    are spatially correlated whenever ids correlate with content (they
    do, in any appended corpus), leaving most of the corpus max-cosine
    to a handful of centroids — a probed "cell" then IS a large
    fraction of the data and partition pruning prunes nothing. Uniform
    sampling makes E[cell size] = N/n_centroids with concentration on
    clustered data (each natural cluster gets ~ its share of
    centroids); test_ivf_cell_balance pins the max/median skew.
    Per-cell counts are written into ivf.json for operational balance
    checks. No Lloyd iterations — sampled init keeps both engines
    bit-for-bit identical. A query probes the ``nprobe`` nearest cells
    through partition pruning; like the LSH index this turns per-query
    cost from O(N) into O(probed cells). Assignment ties break on the
    lower centroid id (rank over (cosine desc, cid asc)) on both
    engines. ``recall_queries`` > 0 measures recall@10 vs brute force
    on that many spread-sampled queries and records it in ivf.json. It
    is OPT-IN (default 0): each query costs one exact scan of the
    table, which is fine on a validation sample but not as a surprise
    default on the 100 TB builds these indexes exist for."""
    import json
    import os

    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = embeddings.select("vec_id", emb.alias("emb"))
    centroid_ids, cents = _sample_centroids(base, n_centroids, centroid_ids)
    assigned = _assign_cells(base, cents)
    # same file-count hygiene as the LSH writer: one task per cell dir
    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{index_dir}/cells")
    # centroid VECTORS ride in the metadata (|C| rows) so a probe never
    # scans the cells table to find them
    cent_rows = cents.collect()
    # per-cell counts from the WRITTEN files (partition-column agg over
    # parquet metadata — no recompute of the assignment): the balance
    # signal an operator checks before trusting nprobe cost estimates
    spark = embeddings.sparkSession
    cell_counts = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(f"{index_dir}/cells")
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/ivf.json", "w") as f:
        json.dump(
            {
                "centroid_ids": centroid_ids,
                "centroids": {
                    str(r["cid"]): [float(v) for v in r["cemb"]]
                    for r in cent_rows
                },
                "cell_counts": {str(c): n for c, n in sorted(cell_counts.items())},
            },
            f,
        )
    if recall_queries:
        measure_ann_recall(
            spark, index_dir, embeddings, "ivf", n_queries=recall_queries
        )


def ivf_topk(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over the persisted IVF index: probe the nprobe cells
    whose centroids are most cosine-similar to the query (driver-side
    ranking over |centroids| rows), scan ONLY those cells (partition
    pruning), exact cosine on the survivors."""
    import json

    import numpy as np

    with open(f"{index_dir}/ivf.json") as f:
        meta = json.load(f)
    cells = spark.read.parquet(f"{index_dir}/cells")
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        # an all-zero query has no direction: every cosine is 0/0 and
        # the centroid ranking would be NaN-arbitrary (r05 ADVICE) —
        # fail loudly instead of returning an arbitrary ordering
        raise ValueError("query_vec must be non-zero for cosine ranking")
    ranked = sorted(
        meta["centroids"].items(),
        key=lambda kv: (
            -float(np.dot(np.asarray(kv[1]), q))
            / (float(np.linalg.norm(kv[1])) * qn),
            int(kv[0]),
        ),
    )
    probe = [int(cid) for cid, _ in ranked[:nprobe]]
    qcol = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = cells.filter(F.col("cell").isin(probe)).select(
        "vec_id", cosine_col(F.col("emb"), qcol).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


# ------------------------------------------------------------- IVF-PQ
def write_ivf_pq_index(
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    centroid_ids: list[int] | None = None,
    codeword_ids: list[int] | None = None,
    recall_queries: int = 0,
) -> None:
    """Persist an IVF-PQ index: IVF cell assignment exactly as
    ``write_ivf_index`` (same spread-sampled centroids, same tie
    rules), but each stored row is the vector's PRODUCT-QUANTIZATION
    codes — ``m`` small ints — not the embedding. The dimension splits
    into ``m`` equal subspaces; subspace ``s``'s codebook is the
    s-slices of ``ks`` DETERMINISTIC spread-sampled data vectors (the
    ks lowest md5('pq:' || vec_id), ties -> lower vec_id; code j = the
    j-th sample in that order), so no Lloyd iterations and the DuckDB
    oracle reproduces every codeword. A vector's code in subspace s is
    the argmin squared-L2 codeword, computed as
    dot(c,c) - 2*dot(x_s,c) (the x_s^2 term is constant per row) with
    ties -> lower code — the same expression, in the same float64
    arithmetic, on both engines.

    SCALE SHAPE: the assignment shuffles N slim rows (write_ivf_index's
    argmax scheme); the encode is ONE mapInPandas pass over the
    assigned rows with the (m, ks, d/m) codebook broadcast (a few KB) —
    numpy batch argmin, no per-row Python, no extra shuffle. The codes
    table costs N * (8 + 4m) bytes vs N * 4d for raw float32 — 64-dim
    / m=8 is ~10x smaller stored as int32 codes and 32x in-memory as
    uint8 — so a 10^10-vector corpus's index stays cache-resident
    where the flat index would not. Queries score codes against a
    per-query lookup table (ADC) and only the top k*refine candidates
    fetch their exact vectors for re-ranking."""
    import json
    import os

    import numpy as np

    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = embeddings.select("vec_id", emb.alias("emb"))
    dim = len(base.select("emb").first()["emb"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    centroid_ids, cents = _sample_centroids(base, n_centroids, centroid_ids)
    if codeword_ids is None:
        # a DIFFERENT salt than the centroid sample: the same md5 order
        # would make every codeword a centroid, wasting the codebook's
        # coverage on n_centroids points
        codeword_ids = [
            int(r["vec_id"])
            for r in base.select("vec_id")
            .orderBy(
                md5_long(F.concat(F.lit("pq:"),
                                  F.col("vec_id").cast("string"))),
                F.col("vec_id"),
            )
            .limit(ks).collect()
        ]
    # codebook rows collected in SAMPLE ORDER: code j = j-th sample
    cw_rows = {
        int(r["vec_id"]): [float(v) for v in r["emb"]]
        for r in base.filter(F.col("vec_id").isin(codeword_ids)).collect()
    }
    cb = np.asarray(
        [cw_rows[i] for i in codeword_ids], dtype=np.float64
    ).reshape(len(codeword_ids), m, ds).transpose(1, 0, 2)  # (m, ks, ds)
    c2 = np.einsum("mkd,mkd->mk", cb, cb)  # (m, ks) codeword norms^2

    assigned = _assign_cells(base, cents)

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((cb, c2))

    def encode(batches):
        import pandas as pd

        cbv, c2v = bc.value
        mm, kk, dd = cbv.shape
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
            ).reshape(len(pdf), mm, dd)
            # argmin_j dot(c,c) - 2*dot(x_s,c): same expression the
            # oracle evaluates; np.argmin takes the FIRST minimum,
            # which is the lowest code — the tie rule
            dists = c2v[None, :, :] - 2.0 * np.einsum(
                "nmd,mkd->nmk", x, cbv
            )
            codes = np.argmin(dists, axis=2).astype("int32")
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": list(codes),
                    "cell": pdf["cell"],
                }
            )

    coded = assigned.mapInPandas(
        encode, "vec_id long, codes array<int>, cell long"
    )
    coded.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{index_dir}/codes")
    cent_rows = cents.collect()
    cell_counts = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(f"{index_dir}/codes")
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/pq.json", "w") as f:
        json.dump(
            {
                "m": m, "ks": len(codeword_ids), "ds": ds, "dim": dim,
                "centroid_ids": centroid_ids,
                "codeword_ids": codeword_ids,
                "centroids": {
                    str(r["cid"]): [float(v) for v in r["cemb"]]
                    for r in cent_rows
                },
                "codebooks": cb.tolist(),
                "cell_counts": {
                    str(c): n for c, n in sorted(cell_counts.items())
                },
            },
            f,
        )
    if recall_queries:
        measure_ann_recall(
            spark, index_dir, embeddings, "ivfpq", n_queries=recall_queries
        )


def ivfpq_topk(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
) -> DataFrame:
    """ANN top-k over the persisted IVF-PQ index: probe the nprobe
    nearest cells (partition pruning, as ivf_topk), score the probed
    CODES against a per-query ADC lookup table (approx cosine =
    sum_s lut[s][code_s] / (|q| * sqrt(sum_s |codeword|^2)) — one
    numpy take+sum per Arrow batch, never touching raw vectors), keep
    the top ``k * refine`` candidates, then RE-RANK exactly: only
    those candidates join back to the source ``embeddings`` table for
    a true cosine (point lookups via an isin pushdown, <= k*refine
    rows). The output contract matches ivf_topk: (rank, vec_id,
    cosine) with EXACT cosines — PQ approximation affects which
    candidates reach the re-rank (recall), never a returned score."""
    import json

    import numpy as np

    with open(f"{index_dir}/pq.json") as f:
        meta = json.load(f)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        # an all-zero query has no direction: every cosine is 0/0 and
        # the centroid ranking would be NaN-arbitrary (r05 ADVICE) —
        # fail loudly instead of returning an arbitrary ordering
        raise ValueError("query_vec must be non-zero for cosine ranking")
    ranked = sorted(
        meta["centroids"].items(),
        key=lambda kv: (
            -float(np.dot(np.asarray(kv[1]), q))
            / (float(np.linalg.norm(kv[1])) * qn),
            int(kv[0]),
        ),
    )
    probe = [int(cid) for cid, _ in ranked[:nprobe]]
    cb = np.asarray(meta["codebooks"], dtype=np.float64)  # (m, ks, ds)
    mm, kk, dd = cb.shape
    lut_dp = np.einsum("md,mkd->mk", q.reshape(mm, dd), cb)  # (m, ks)
    lut_c2 = np.einsum("mkd,mkd->mk", cb, cb)
    bc = spark.sparkContext.broadcast((lut_dp, lut_c2, qn))

    def adc(batches):
        import pandas as pd

        dp, c2, qnorm = bc.value
        rows = np.arange(dp.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            num = dp[rows[None, :], codes].sum(axis=1)
            den = qnorm * np.sqrt(c2[rows[None, :], codes].sum(axis=1))
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "approx": num / den}
            )

    codes = spark.read.parquet(f"{index_dir}/codes").filter(
        F.col("cell").isin(probe)
    )
    cand = (
        codes.select("vec_id", "codes")
        .mapInPandas(adc, "vec_id long, approx double")
        .orderBy(F.desc("approx"), F.asc("vec_id"))
        .limit(k * refine)
    )
    # candidate ids to the driver (<= k*refine rows), then an isin
    # PREDICATE on the source table — parquet min/max row-group skipping
    # applies, so the re-rank point-reads instead of full-scanning the
    # 10^10-vector table a join's probe side would (cf. fetch_docs'
    # bounded predicate on the doc store)
    cand_ids = [int(r["vec_id"]) for r in cand.select("vec_id").collect()]
    if not cand_ids:
        return spark.createDataFrame(
            [], "rank int, vec_id long, cosine double"
        )
    qcol = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    exact = embeddings.filter(F.col("vec_id").isin(cand_ids)).select(
        "vec_id", cosine_col(emb, qcol).alias("cosine")
    )
    top = exact.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


# ------------------------------------------------------------ recall gate
def measure_ann_recall(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    kind: str,
    k: int = 10,
    n_queries: int = 8,
    nprobe: int = 4,
    refine: int = 8,
) -> dict:
    """Measured recall@k of a persisted ANN index vs EXACT brute force,
    recorded into the index meta (ivf.json / lsh.json) — the number an
    operator reads before trusting the index (round-4 gate; balance
    alone says nothing about answer quality).

    The query set is DETERMINISTIC spread sampling (the ``n_queries``
    lowest md5(vec_id) vectors — same scheme as the IVF centroid pick,
    so the measurement is reproducible). Cost: n_queries exact scans +
    n_queries index probes, a WRITE-TIME maintenance measurement, never
    on the query path; pass recall_queries=0 to the writer to skip it
    on huge builds and measure on a sample table instead."""
    import json
    import os

    qs = (
        embeddings.select("vec_id", "embedding")
        .orderBy(md5_long(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(n_queries)
        .collect()
    )
    hits = total = 0
    for r in qs:
        qv = [float(v) for v in r["embedding"]]
        exact = {
            x["vec_id"] for x in brute_force_topk(embeddings, qv, k=k).collect()
        }
        if kind == "ivf":
            got = {
                x["vec_id"]
                for x in ivf_topk(spark, index_dir, qv, k=k,
                                  nprobe=nprobe).collect()
            }
        elif kind == "lsh":
            got = {
                x["vec_id"]
                for x in lsh_topk_indexed(spark, index_dir, qv, k=k).collect()
            }
        elif kind == "ivfpq":
            # refine matters for PQ: quantization collapses near
            # neighbors onto tied approx scores, so the candidate pool
            # must out-size the ties — measured on the clustered test
            # corpus (m=8, ks=16): refine 4 -> 0.887, 8 -> 0.938 (the
            # nprobe=4 ceiling IVF-flat also hits)
            got = {
                x["vec_id"]
                for x in ivfpq_topk(spark, index_dir, embeddings, qv,
                                    k=k, nprobe=nprobe,
                                    refine=refine).collect()
            }
        else:
            raise ValueError(f"unknown ANN index kind {kind!r}")
        hits += len(exact & got)
        total += len(exact)
    rec = {
        "recall_at_k": round(hits / total, 4) if total else 1.0,
        "k": k,
        "n_queries": len(qs),
    }
    if kind in ("ivf", "ivfpq"):
        rec["nprobe"] = nprobe
    if kind == "ivfpq":
        rec["refine"] = refine
    meta_path = f"{index_dir}/{'pq' if kind == 'ivfpq' else kind}.json"
    with open(meta_path) as f:
        meta = json.load(f)
    meta["recall"] = rec
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return rec


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 8,
    n_tables: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table LSH blocking:
    (vec_a, vec_b, cosine >= threshold). Pairs are compared only within
    a (table, bucket) block — per-block cost is quadratic in the BLOCK
    (n_planes sizes the blocks, grow it with log2 N), and the OR over
    n_tables independent tables recovers the recall that smaller blocks
    cost. Duplicate pair hits across tables collapse BEFORE the cosine
    (distinct on ids, candidate-driven verify)."""
    dim = int(embeddings.select(F.size("embedding")).first()[0])
    b = _bucketed(embeddings, table_planes(n_planes, n_tables, dim))
    ids = b.select("vec_id", "tbl", "bucket")
    left = ids.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    right = ids.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    vecs = b.select("vec_id", "emb").dropDuplicates(["vec_id"])
    return (
        cand.join(vecs.select(F.col("vec_id").alias("vec_a"),
                              F.col("emb").alias("ea")), "vec_a")
        .join(vecs.select(F.col("vec_id").alias("vec_b"),
                          F.col("emb").alias("eb")), "vec_b")
        .select(
            "vec_a", "vec_b", cosine_col(F.col("ea"), F.col("eb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
