"""Dedup / similarity / textstats operators on planted-truth corpora."""

import pytest
from pyspark.sql import functions as F

from wiser_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash,
)
from wiser_spark.operators.similarity import brute_force_topk, lsh_topk
from wiser_spark.operators.textstats import (
    language_id,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Docs with planted exact dups (0=1) and near dups (2~3)."""
    base = "def load_user_row from table scan filter merge join " * 8
    near = base.replace("merge join", "merge sort", 1)
    rows = [
        (0, base), (1, base), (2, base + " extra_tail_token"), (3, near),
        (4, "completely different content about streaming windows and state"),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_exact_dedup(planted):
    out = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup(planted).collect()}
    assert out[0] == 2          # docs 0 and 1 collapse, keeper = min id
    assert sum(out.values()) == 6
    assert len(out) == 5


def test_ngram_jaccard_finds_near_dups(planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_dedup(planted, k=3, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8
    assert (2, 3) in pairs
    assert all(a < b for a, b in pairs)
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_minhash_lsh_matches_exact_jaccard(planted):
    """Verified-LSH output must be a subset of the exact pairs with
    identical jaccard values; on high-sim pairs recall should be total."""
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_dedup(planted, k=3, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_dedup(planted, 32, 8, k=3, threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    high = {p for p, j in exact.items() if j > 0.9}
    assert high <= set(lsh)  # banding can't miss near-identical docs


def test_near_dup_clusters_transitive(spark, planted):
    """Clusters are CONNECTED COMPONENTS: a chain a-b, b-c puts all
    three under min(a,b,c) even if a-c never paired directly."""
    from wiser_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 3), (3, 0), (2, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["keeper_doc_id"]
        for r in near_dup_clusters(planted, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 3: 0, 2: 2, 5: 2, 4: 4}


def test_minhash_lsh_plan_has_no_shingle_join(planted):
    """The scale gate: LSH verification must be candidate-driven — the
    physical plan may join on band keys and doc ids but NEVER on the
    shingle column (that self-join is O(sum df^2) at corpus scale)."""
    df = minhash_lsh_dedup(planted, 32, 8, k=3, threshold=0.5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines, "expected joins in the LSH plan"
    assert not any("shingle" in ln for ln in join_lines), join_lines


def test_simhash_pairs_matches_bruteforce(planted):
    """Banded blocking must find EXACTLY the pairs within the Hamming
    radius (no false negatives below n_bands; popcount verify kills the
    false positives)."""
    from wiser_spark.operators.dedup import simhash_pairs

    h = {r["doc_id"]: r["simhash"] for r in simhash(planted).collect()}
    ids = sorted(h)
    want = {
        (a, b): bin(h[a] ^ h[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(h[a] ^ h[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(planted, max_distance=3).collect()
    }
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 0  # exact dups -> distance 0


def test_simhash_near_dups_close(planted):
    h = {r["doc_id"]: r["simhash"] for r in simhash(planted).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert h[0] == h[1]
    assert ham(h[0], h[2]) <= 6         # near-dup -> close fingerprints
    assert ham(h[0], h[4]) > 10         # unrelated -> far


def test_brute_force_self_top1(spark):
    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(v) for v in rows[17][1]]
    got = brute_force_topk(emb, q, k=3).collect()
    assert got[0]["vec_id"] == 17 or got[0]["cosine"] == 1.0


def test_lsh_recall_vs_brute(spark):
    """Planted cluster: 20 small perturbations of the query among 300
    random vectors. Sign-LSH must recover most of the true top-10 —
    near-identical vectors share sign patterns."""
    import random

    rnd = random.Random(5)
    q = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [(0, q)]
    rows += [
        (i, [v + rnd.uniform(-0.05, 0.05) for v in q]) for i in range(1, 21)
    ]
    rows += [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(21, 300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    brute = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(emb, q, k=10, n_planes=4).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert approx[0] == brute[0] == 0      # the query vector itself
    assert recall >= 0.7                   # clustered neighbors share buckets


def test_lsh_index_partition_pruned_probe(spark, tmp_path):
    """The persisted-index probe must reach the scan as a PARTITION
    filter on (tbl, bucket) — the 100 TB contract is 'read n_tables
    buckets', never 'rescan and rehash every vector'."""
    import random

    from wiser_spark.operators.similarity import (
        lsh_topk_indexed,
        write_lsh_index,
    )

    rnd = random.Random(7)
    q = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [(0, q)]
    rows += [(i, [v + rnd.uniform(-0.05, 0.05) for v in q]) for i in range(1, 21)]
    rows += [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(21, 200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = str(tmp_path / "lsh")
    write_lsh_index(emb, d, n_planes=4, n_tables=3, recall_queries=8)
    out = lsh_topk_indexed(spark, d, q, k=10)
    got = [r["vec_id"] for r in out.collect()]
    assert got[0] == 0  # the query vector itself survives its own bucket
    assert len(set(got) & set(range(21))) >= 7  # clustered recall via OR-tables
    # write-time recall gate: measured recall@10 vs brute force rides
    # in lsh.json. This corpus is 90% UNclustered vectors and the
    # spread-sampled queries land mostly on them — sign-LSH's honest
    # weak regime (random points rarely share all sign bits with their
    # true neighbors), so the recorded number is LOW by design; the
    # gate pins that it is recorded and non-degenerate here, and the
    # >=0.9 clustered-regime floor lives in the IVF-corpus test below.
    import json

    rec = json.load(open(f"{d}/lsh.json"))["recall"]
    assert rec["k"] == 10 and rec["n_queries"] == 8
    assert rec["recall_at_k"] >= 0.35, rec
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any(
        "tbl" in ln and "bucket" in ln for ln in scan
    ), plan[:4000]
    # and no pushed-down full-column filter doing the real work: the
    # bucket predicate must be partition-level (pruning), tested above


def test_ivf_cell_balance_on_clustered_corpus(spark, tmp_path):
    """IVF centroid selection must SPREAD over the corpus. Adversarial
    layout: ids correlate with clusters (ids 0-99 = cluster A, ... — any
    appended corpus looks like this). Lowest-id selection puts every
    centroid in cluster A and the other 300 vectors pile into a few
    giant cells; md5-spread sampling gives each cluster ~ its share of
    centroids and bounded cells. ivf.json carries the per-cell counts."""
    import json
    import random

    from wiser_spark.operators.similarity import write_ivf_index

    rnd = random.Random(11)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = [
        (c * 100 + i,
         [v + rnd.uniform(-0.05, 0.05) for v in centers[c]])
        for c in range(4)
        for i in range(100)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    d_spread = str(tmp_path / "ivf_spread")
    write_ivf_index(emb, d_spread, n_centroids=16, recall_queries=8)
    meta = json.load(open(f"{d_spread}/ivf.json"))
    counts = sorted(int(n) for n in meta["cell_counts"].values())
    assert sum(counts) == 400
    # write-time recall gate: measured recall@10 at nprobe=4 rides in
    # ivf.json, with a floor on this clustered corpus
    rec = meta["recall"]
    assert rec["k"] == 10 and rec["nprobe"] == 4 and rec["n_queries"] == 8
    assert rec["recall_at_k"] >= 0.9, rec
    # LSH on the SAME fully-clustered corpus: every query's neighbors
    # share its cluster -> the OR-tables recover them; floor 0.9
    from wiser_spark.operators.similarity import write_lsh_index

    d_lsh = str(tmp_path / "lsh_clustered")
    write_lsh_index(emb, d_lsh, n_planes=4, n_tables=3,
                    recall_queries=8)
    rec_lsh = json.load(open(f"{d_lsh}/lsh.json"))["recall"]
    assert rec_lsh["recall_at_k"] >= 0.9, rec_lsh
    # every natural cluster got at least one centroid (spread sampling)
    clusters_hit = {cid // 100 for cid in meta["centroid_ids"]}
    assert clusters_hit == {0, 1, 2, 3}, meta["centroid_ids"]

    # the old lowest-id scheme on the same corpus: all centroids in
    # cluster A -> 300 off-cluster vectors pile into a few cells
    d_low = str(tmp_path / "ivf_lowid")
    write_ivf_index(emb, d_low, n_centroids=16,
                    centroid_ids=list(range(16)))
    meta_low = json.load(open(f"{d_low}/ivf.json"))
    counts_low = sorted(int(n) for n in meta_low["cell_counts"].values())
    assert max(counts) < max(counts_low), (counts, counts_low)
    # bounded skew for the spread index: max cell stays within the
    # largest natural cluster's share (no cross-cluster pileup)
    assert max(counts) <= 100, counts


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "def foo(x):\n    return x + 1")], "doc_id long, content string"
    )
    r = token_counts(df).collect()[0]
    assert r["n_code_tokens"] == 6      # def foo x return x 1
    assert r["n_distinct_tokens"] == 5
    assert r["n_ws_tokens"] == 6        # def foo(x): return x + 1


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick fox is in the yard and it is fine"),
            (2, "el perro y la casa de los que en un dia"),
            (3, "der hund und die katze ist von dem haus"),
            (4, "qqq zzz xxx"),
        ],
        "doc_id long, content string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_score_bounds(planted):
    for r in quality_score(planted).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_ivfpq_recall_and_compression_on_clustered_corpus(spark, tmp_path):
    """IVF-PQ on the clustered corpus: measured recall@10 (refine
    re-rank) meets the same 0.9 floor as IVF-flat, scores returned are
    EXACT cosines (the PQ approximation only selects candidates), the
    codes table stores m ints per vector (no embeddings), and encoding
    is deterministic under repartitioning."""
    import json
    import random

    from wiser_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        write_ivf_pq_index,
    )

    rnd = random.Random(11)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = [
        (c * 100 + i,
         [v + rnd.uniform(-0.05, 0.05) for v in centers[c]])
        for c in range(4)
        for i in range(100)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()

    d = str(tmp_path / "ivfpq")
    write_ivf_pq_index(emb, d, n_centroids=16, m=8, ks=16,
                       recall_queries=8)
    meta = json.load(open(f"{d}/pq.json"))
    assert meta["m"] == 8 and meta["ks"] == 16 and meta["ds"] == 2
    # measured at write time (nprobe=4, refine=8): 0.938 — the same
    # nprobe-bounded ceiling the IVF-flat floor sits under
    assert meta["recall"]["recall_at_k"] >= 0.9, meta["recall"]
    assert meta["recall"]["refine"] == 8
    # the index stores codes, not vectors
    codes = spark.read.parquet(f"{d}/codes")
    assert set(codes.columns) == {"vec_id", "codes", "cell"}
    assert codes.count() == 400
    row = codes.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
    # exact scores: the top-1 for a data vector is itself at cosine 1.0
    qv = [float(v) for v in rows[123][1]]
    got = ivfpq_topk(spark, d, emb, qv, k=5, nprobe=4, refine=4).collect()
    assert got[0]["vec_id"] == 123 and got[0]["cosine"] == 1.0
    # returned cosines equal brute-force EXACT cosines for those ids
    exact = {r["vec_id"]: r["cosine"]
             for r in brute_force_topk(emb, qv, k=50).collect()}
    for r in got:
        assert r["cosine"] == exact[r["vec_id"]], r
    # deterministic under a different partitioning
    d2 = str(tmp_path / "ivfpq_repart")
    write_ivf_pq_index(emb.repartition(7), d2, n_centroids=16, m=8, ks=16)
    c1 = {(r["vec_id"], tuple(r["codes"]), r["cell"])
          for r in codes.collect()}
    c2 = {(r["vec_id"], tuple(r["codes"]), r["cell"])
          for r in spark.read.parquet(f"{d2}/codes").collect()}
    assert c1 == c2
