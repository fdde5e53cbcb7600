"""Block-max single-term top-k (the north star's "block-max-WAND-style
scorer"): exact-result guarantee, bag-skip proof, and end-to-end rank
identity through SegmentIndex.search on both index formats."""

import numpy as np
import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.functions.bm25 import tfnorm_cache
from wiser_spark.operators.segments import (
    PACK_SIZE,
    SegmentIndex,
    _topk_blockmax_single,
    build_segments,
    decode_segment_row,
)

PARAMS = BM25Params(0.9, 0.4)
K1 = PARAMS.k1
IDF = 1.37  # arbitrary positive idf for the unit tests


def _mk_row(spark, tfs_by_doc):
    """One term, docIDs 0..n-1 with the given tfs -> one segment row."""
    rows = [("t", i, int(tf)) for i, tf in enumerate(tfs_by_doc)]
    postings = spark.createDataFrame(rows, "term string, doc_id long, tf int")
    return build_segments(postings, n_shards=1).collect()[0].asDict()


def _full_topk(seg, k, cache, codes_for):
    """Reference result: full decode + the generic scoring path's math."""
    ids, tfs, _ = decode_segment_row(seg)
    tf = tfs.astype(np.float64)
    scores = IDF * ((tf * (K1 + 1.0)) / (tf + cache[codes_for(ids)]))
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


@pytest.fixture(scope="module")
def cache():
    return tfnorm_cache(avgdl=37.5, params=PARAMS)


def test_blockmax_exact_vs_full_decode(spark, cache):
    """Varied tfs + varied doc lengths: winners, exact scores and the
    (score desc, doc_id asc) tie order all match the full path."""
    rng = np.random.RandomState(7)
    tfs = rng.randint(1, 9, size=1000)  # many ties -> tie-order matters
    seg = _mk_row(spark, tfs)
    codes_for = lambda ids: (np.asarray(ids) * 53) % 256  # noqa: E731
    for k in (1, 5, 10, 64, 1000, 2000):
        want_ids, want_sc = _full_topk(seg, k, cache, codes_for)
        got_ids, got_sc = _topk_blockmax_single(
            [seg], k, IDF, cache, K1, codes_for, prune_fallback=False
        )
        np.testing.assert_array_equal(got_ids, want_ids)
        np.testing.assert_array_equal(got_sc, want_sc)  # bit-exact floats


def test_blockmax_skips_noncompetitive_bags(spark, cache):
    """With one high-tf bag and k <= its postings, every other bag's
    bound falls below θ — prove they are never READ by corrupting their
    bytes and still getting the exact answer."""
    n = 10 * PACK_SIZE
    tfs = np.ones(n, dtype=np.int64)
    hot = slice(3 * PACK_SIZE, 3 * PACK_SIZE + 16)  # 16 docs inside bag 3
    tfs[hot] = 60
    seg = _mk_row(spark, tfs)
    codes_for = lambda ids: np.full(len(ids), 10, dtype=np.int64)  # noqa: E731
    want_ids, want_sc = _full_topk(seg, 10, cache, codes_for)
    assert set(want_ids) <= set(range(hot.start, hot.stop))
    # poison every bag except bag 3 in both columns
    blob_d, blob_t = bytearray(seg["docids_blob"]), bytearray(seg["tfs_blob"])
    d_offs = list(seg["skip_docid_offs"]) + [len(blob_d)]
    t_offs = list(seg["skip_tf_offs"]) + [len(blob_t)]
    for b in range(10):
        if b == 3:
            continue
        blob_d[d_offs[b]:d_offs[b + 1]] = b"\xff" * (d_offs[b + 1] - d_offs[b])
        blob_t[t_offs[b]:t_offs[b + 1]] = b"\xff" * (t_offs[b + 1] - t_offs[b])
    poisoned = dict(seg)
    poisoned["docids_blob"] = bytes(blob_d)
    poisoned["tfs_blob"] = bytes(blob_t)
    got_ids, got_sc = _topk_blockmax_single(
        [poisoned], 10, IDF, cache, K1, codes_for
    )
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_array_equal(got_sc, want_sc)


def test_blockmax_none_on_legacy_rows(spark, cache):
    """Rows from an index written before skip_max_tfs existed return
    None -> the kernel falls back to the full decode path."""
    seg = _mk_row(spark, np.ones(300, dtype=np.int64))
    legacy = dict(seg)
    legacy["skip_max_tfs"] = None
    codes_for = lambda ids: np.zeros(len(ids), dtype=np.int64)  # noqa: E731
    assert _topk_blockmax_single(
        [legacy], 10, IDF, cache, K1, codes_for
    ) is None
    # multi-generation with ONE legacy row: still total fallback
    assert _topk_blockmax_single(
        [seg, legacy], 10, IDF, cache, K1, codes_for
    ) is None


def test_blockmax_flat_tf_falls_back_to_full_decode(spark, cache):
    """tf=1 everywhere: θ prunes nothing, so the kernel should use the
    vectorized full decode instead of a per-bag loop -> None."""
    seg = _mk_row(spark, np.ones(10 * PACK_SIZE, dtype=np.int64))
    codes_for = lambda ids: np.full(len(ids), 10, dtype=np.int64)  # noqa: E731
    assert _topk_blockmax_single(
        [seg], 10, IDF, cache, K1, codes_for
    ) is None
    # with the escape disabled it still produces the exact answer
    want_ids, want_sc = _full_topk(seg, 10, cache, codes_for)
    got_ids, got_sc = _topk_blockmax_single(
        [seg], 10, IDF, cache, K1, codes_for, prune_fallback=False
    )
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_array_equal(got_sc, want_sc)


@pytest.mark.parametrize("writer", ["relational", "mapside"])
def test_blockmax_end_to_end_rank_identity(spark, tmp_path, monkeypatch,
                                            writer):
    """SegmentIndex.search on a hot single term returns the same rows
    whether the block-max gate fires or not, on both index formats."""
    import wiser_spark.operators.segments as segmod
    from wiser_spark.operators.docstats import build_docstats, corpus_stats
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.postings import (
        build_dictionary,
        build_postings,
    )
    from wiser_spark.operators.segments import write_index

    rng = np.random.RandomState(3)
    rows = [
        (i, " ".join(["hot"] * int(rng.randint(1, 7))
                     + [f"w{j}" for j in rng.randint(0, 40, rng.randint(2, 30))]))
        for i in range(900)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bm25=PARAMS, n_shards=3)
    if writer == "mapside":
        write_index_mapside(docs, d, cfg)
    else:
        postings = build_postings(docs).cache()
        docstats = build_docstats(docs)
        write_index(postings, docstats, build_dictionary(postings),
                    corpus_stats(docstats), d, cfg)
    idx = SegmentIndex(spark, d)
    full = [tuple(r) for r in idx.search(["hot"], k=10).collect()]
    assert len(full) == 10
    monkeypatch.setattr(segmod, "PARTIAL_DECODE_MIN_PAGES", 1)
    fired = segmod.partial_decode_terms(
        [(0, ["hot"], False)], {"hot": 1}, set(), set()
    )
    assert "hot" in fired  # the gate really applies at this scale
    bm = [tuple(r) for r in idx.search(["hot"], k=10).collect()]
    assert bm == full


# ---------------------------------------------------------------- conj
def _mk_term_row(spark, term, doc_tfs):
    """One term over explicit (doc_id, tf) pairs -> one segment row."""
    rows = [(term, int(d), int(tf)) for d, tf in doc_tfs]
    postings = spark.createDataFrame(rows, "term string, doc_id long, tf int")
    return build_segments(postings, n_shards=1).filter(
        f"term = '{term}'"
    ).collect()[0].asDict()


def _full_conj_topk(segs, terms, k, idfs, cache, codes_for):
    """Reference result: full decode of every term, exact AND, generic
    scoring-path math (weights = term multiplicity in the query)."""
    dec = {t: decode_segment_row(segs[t]) for t in set(terms)}
    cand = None
    for t in set(terms):
        ids = dec[t][0]
        cand = ids if cand is None else cand[np.isin(cand, ids)]
    cand = np.sort(cand)
    denom = cache[codes_for(cand)]
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms:  # with multiplicity, like _bm25_scores over terms_l
        ids, tfs, _ = dec[t]
        tf = tfs[np.searchsorted(ids, cand)].astype(np.float64)
        scores += idfs[t] * ((tf * (K1 + 1.0)) / (tf + denom))
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


def test_blockmax_conj_exact_vs_full_decode(spark, cache):
    """Random 2- and 3-term conjunctions with partial overlap: winners,
    bit-exact scores, and tie order all match the full path."""
    from wiser_spark.operators.segments import _topk_blockmax_conj

    rng = np.random.RandomState(11)
    segs = {}
    # overlapping but distinct doc sets; varied tfs force varied bounds
    segs["a"] = _mk_term_row(
        spark, "a", [(d, rng.randint(1, 30)) for d in range(0, 3000, 2)]
    )
    segs["b"] = _mk_term_row(
        spark, "b", [(d, rng.randint(1, 9)) for d in range(0, 3000, 3)]
    )
    segs["c"] = _mk_term_row(
        spark, "c", [(d, rng.randint(1, 5)) for d in range(0, 3000, 5)]
    )
    idfs = {"a": 0.21, "b": 1.9, "c": 3.4}
    codes_for = lambda ids: (np.asarray(ids) * 31) % 256  # noqa: E731
    for terms in (["a", "b"], ["b", "a"], ["a", "b", "c"], ["a", "a"]):
        rows_by_term = {t: [segs[t]] for t in set(terms)}
        for k in (1, 10, 100, 5000):
            want = _full_conj_topk(segs, terms, k, idfs, cache, codes_for)
            got = _topk_blockmax_conj(
                rows_by_term, terms, k, idfs, cache, K1, codes_for, {},
                prune_fallback=False,
            )
            assert got is not None, (terms, k)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])  # bit-exact


def test_blockmax_conj_skips_noncompetitive_bags(spark, cache):
    """Lead term has one high-tf bag; every other lead bag's combined
    bound falls below θ — prove non-selected bags of BOTH terms are
    never read by poisoning their bytes."""
    from wiser_spark.operators.segments import _topk_blockmax_conj

    n = 10 * PACK_SIZE
    lead_tfs = np.ones(n, dtype=np.int64)
    lead_tfs[3 * PACK_SIZE : 3 * PACK_SIZE + 16] = 60
    seg_a = _mk_term_row(spark, "a", list(enumerate(lead_tfs)))
    seg_b = _mk_term_row(spark, "b", [(d, 2) for d in range(n)])
    idfs = {"a": 1.4, "b": 0.8}
    codes_for = lambda ids: np.full(len(ids), 10, dtype=np.int64)  # noqa: E731
    want = _full_conj_topk(
        {"a": seg_a, "b": seg_b}, ["a", "b"], 10, idfs, cache, codes_for
    )
    assert set(want[0]) <= set(range(3 * PACK_SIZE, 3 * PACK_SIZE + 16))

    def poison(seg, keep_bags):
        blob_d = bytearray(seg["docids_blob"])
        blob_t = bytearray(seg["tfs_blob"])
        d_offs = list(seg["skip_docid_offs"]) + [len(blob_d)]
        t_offs = list(seg["skip_tf_offs"]) + [len(blob_t)]
        for b in range(len(seg["skip_predocs"])):
            if b in keep_bags:
                continue
            blob_d[d_offs[b]:d_offs[b + 1]] = b"\xff" * (
                d_offs[b + 1] - d_offs[b])
            blob_t[t_offs[b]:t_offs[b + 1]] = b"\xff" * (
                t_offs[b + 1] - t_offs[b])
        out = dict(seg)
        out["docids_blob"] = bytes(blob_d)
        out["tfs_blob"] = bytes(blob_t)
        return out

    # phase 1 needs k=10 exact scores: the best-bound bag (3) has 128
    # postings, so only bag 3 of the lead and bag 3 of 'b' (same doc
    # range — identical docids) are ever decoded
    pa = poison(seg_a, {3})
    pb = poison(seg_b, {3})
    got = _topk_blockmax_conj(
        {"a": [pa], "b": [pb]}, ["a", "b"], 10, idfs, cache, K1,
        codes_for, {},
    )
    assert got is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_blockmax_conj_other_term_bound_drives_skip(spark, cache):
    """The OTHER term's per-window max tf shapes the combined bound: a
    FLAT-tf lead still prunes when the other term is hot in one region
    — prove it with poisoned bytes on both terms' unselected bags."""
    from wiser_spark.operators.segments import _topk_blockmax_conj

    n = 10 * PACK_SIZE
    seg_a = _mk_term_row(spark, "a", [(d, 1) for d in range(n)])  # flat lead
    b_tfs = np.ones(n, dtype=np.int64)
    b_tfs[384:401] = 50  # inside b's bag 3 == lead bag 3's doc range
    seg_b = _mk_term_row(spark, "b", list(enumerate(b_tfs)))
    idfs = {"a": 1.1, "b": 1.3}
    codes_for = lambda ids: np.full(len(ids), 10, dtype=np.int64)  # noqa: E731
    want = _full_conj_topk(
        {"a": seg_a, "b": seg_b}, ["a", "b"], 10, idfs, cache, codes_for
    )
    assert set(want[0]) <= set(range(384, 401))

    def poison_bags(seg, keep):
        blob_d = bytearray(seg["docids_blob"])
        blob_t = bytearray(seg["tfs_blob"])
        d_offs = list(seg["skip_docid_offs"]) + [len(blob_d)]
        t_offs = list(seg["skip_tf_offs"]) + [len(blob_t)]
        for b in range(len(seg["skip_predocs"])):
            if b in keep:
                continue
            blob_d[d_offs[b]:d_offs[b + 1]] = b"\xff" * (
                d_offs[b + 1] - d_offs[b])
            blob_t[t_offs[b]:t_offs[b + 1]] = b"\xff" * (
                t_offs[b + 1] - t_offs[b])
        out = dict(seg)
        out["docids_blob"] = bytes(blob_d)
        out["tfs_blob"] = bytes(blob_t)
        return out

    pa = poison_bags(seg_a, {3})
    pb = poison_bags(seg_b, {3})
    got = _topk_blockmax_conj(
        {"a": [pa], "b": [pb]}, ["a", "b"], 10, idfs, cache, K1,
        codes_for, {},
    )
    assert got is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_blockmax_conj_fallbacks(spark, cache):
    """None on: legacy rows (no skip_max_tfs), multi-generation terms,
    tiny leads, and flat-tf corpora (budget projection)."""
    from wiser_spark.operators.segments import _topk_blockmax_conj

    idfs = {"a": 1.0, "b": 1.0}
    codes_for = lambda ids: np.full(len(ids), 10, dtype=np.int64)  # noqa: E731
    seg_a = _mk_term_row(spark, "a", [(d, 1) for d in range(6 * PACK_SIZE)])
    seg_b = _mk_term_row(spark, "b", [(d, 1) for d in range(6 * PACK_SIZE)])
    # flat tf: every bound ties -> projection cedes to the full path
    assert _topk_blockmax_conj(
        {"a": [seg_a], "b": [seg_b]}, ["a", "b"], 10, idfs, cache, K1,
        codes_for, {},
    ) is None
    # legacy row
    legacy = dict(seg_b)
    legacy["skip_max_tfs"] = None
    assert _topk_blockmax_conj(
        {"a": [seg_a], "b": [legacy]}, ["a", "b"], 10, idfs, cache, K1,
        codes_for, {},
    ) is None
    # multi-generation term
    assert _topk_blockmax_conj(
        {"a": [seg_a], "b": [seg_b, seg_b]}, ["a", "b"], 10, idfs, cache,
        K1, codes_for, {},
    ) is None
    # tiny lead (< 4 bags)
    tiny = _mk_term_row(spark, "t", [(d, 5) for d in range(40)])
    assert _topk_blockmax_conj(
        {"t": [tiny], "b": [seg_b]}, ["t", "b"], 10, idfs, cache, K1,
        codes_for, {},
    ) is None


@pytest.mark.parametrize("terms", [["hot", "warm"], ["hot", "warm", "def"]])
def test_blockmax_conj_end_to_end_rank_identity(spark, tmp_path,
                                                monkeypatch, terms):
    """SegmentIndex.search on hot conjunctions returns the same rows
    whether the conjunction block-max gate fires or not."""
    import wiser_spark.operators.segments as segmod
    from wiser_spark.operators.mapside import write_index_mapside

    rng = np.random.RandomState(5)
    rows = [
        (i, " ".join(
            ["hot"] * int(rng.randint(1, 8))
            + ["warm"] * int(rng.randint(0, 5))
            + (["def"] if rng.rand() < 0.7 else [])
            + [f"w{j}" for j in rng.randint(0, 50, rng.randint(2, 20))]
        ))
        for i in range(1200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path / "idx")
    write_index_mapside(docs, d, IndexConfig(bm25=PARAMS, n_shards=2))
    idx = SegmentIndex(spark, d)
    full = [tuple(r) for r in idx.search(terms, k=10).collect()]
    assert len(full) == 10
    monkeypatch.setattr(segmod, "PARTIAL_DECODE_MIN_PAGES", 1)
    fired = segmod.partial_decode_terms(
        [(0, terms, False)], {t: 1 for t in terms}, set(), set()
    )
    assert set(fired) == set(terms)
    bm = [tuple(r) for r in idx.search(terms, k=10).collect()]
    assert bm == full
