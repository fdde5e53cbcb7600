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
