"""Band-bucket skew guard (r06): bounded candidates on giant identical
clusters, result-neutral below the cap, nothing silent."""

from pyspark.sql import functions as F

from wiser_spark.operators.dedup import (
    MAX_BAND_BUCKET,
    minhash_lsh_dedup,
    oversized_band_buckets,
    oversized_simhash_buckets,
    simhash,
    simhash_pairs,
)


def _cluster_corpus(spark, n_identical=40, n_near=6):
    """n_identical byte-identical docs (the giant-bucket pathology the
    guard targets) plus a small near-dup family plus singletons."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n_identical)]
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows += [(1000 + j, base + f" tail{j}") for j in range(n_near)]
    rows += [(2000, "completely different text one"), (2001, "another unrelated doc two")]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_lsh_guard_bounds_identical_cluster(spark):
    docs = _cluster_corpus(spark)
    # the 40-identical cluster lands whole in each of its band buckets
    over = oversized_band_buckets(docs, max_band_bucket=20).collect()
    assert over and all(r["bucket_n"] == 40 for r in over)
    # capped run: no pair of the identical cluster survives candidate
    # generation (every one of its buckets is oversized), near-dup pairs
    # from small buckets are untouched
    capped = minhash_lsh_dedup(docs, threshold=0.5, max_band_bucket=20)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert all(a >= 1000 and b >= 1000 for a, b in got)
    assert got  # the near-dup family still pairs


def test_lsh_guard_neutral_below_cap(spark):
    docs = _cluster_corpus(spark, n_identical=5)
    base = minhash_lsh_dedup(docs, threshold=0.5, max_band_bucket=None)
    guarded = minhash_lsh_dedup(docs, threshold=0.5)  # default cap
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
    assert sorted(map(key, base.collect())) == sorted(
        map(key, guarded.collect())
    )
    assert oversized_band_buckets(docs, max_band_bucket=MAX_BAND_BUCKET).count() == 0


def test_simhash_guard_bounds_and_neutrality(spark):
    docs = _cluster_corpus(spark)
    fp = simhash(docs).cache()
    over = oversized_simhash_buckets(docs, fingerprints=fp, max_band_bucket=20)
    assert over.count() > 0
    capped = simhash_pairs(docs, fingerprints=fp, max_band_bucket=20)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # identical docs (hamming 0) blocked in EVERY band -> excluded
    assert all(not (a < 40 and b < 40) for a, b in got)
    # neutral below the cap: default == uncapped
    base = simhash_pairs(docs, fingerprints=fp, max_band_bucket=None)
    dflt = simhash_pairs(docs, fingerprints=fp)
    key = lambda r: (r["doc_a"], r["doc_b"], r["hamming"])
    assert sorted(map(key, base.collect())) == sorted(map(key, dflt.collect()))
    fp.unpersist()


def test_guard_candidate_count_is_bounded(spark):
    """The point of the guard: candidate volume stays O(cap^2), not
    O(cluster^2) — measured on the candidate-generation subplan."""
    docs = _cluster_corpus(spark, n_identical=60)
    from wiser_spark.operators.dedup import _cap_band_buckets, _minhash_banded

    banded = _minhash_banded(docs, 32, 8, 3, "content")
    raw = (
        banded.alias("a").join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id")).count()
    )
    capped_banded = _cap_band_buckets(banded, 20)
    capped = (
        capped_banded.alias("a").join(capped_banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id")).count()
    )
    assert raw >= 8 * (60 * 59) // 2  # the quadratic blowup exists
    assert capped < raw / 10  # and the guard removes it
