"""Segment format: round-trip, skip-offset partial decode, and the
segment-backed query path vs the oracle (the vacuum-vs-qqmem analogue)."""

import numpy as np
import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.functions.packing import decode_column, delta_decode
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import (
    assign_doc_ids,
    build_dictionary,
    build_postings,
)
from wiser_spark.operators.segments import (
    SegmentIndex,
    build_segments,
    decode_segment_row,
    write_index,
)
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

N_DOCS = 150
PARAMS = BM25Params(1.2, 0.75)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    docs = assign_doc_ids(corpus_df(spark, N_DOCS), n_partitions=4)
    postings = build_postings(docs).cache()
    docstats = build_docstats(docs)
    dictionary = build_dictionary(postings)
    stats = corpus_stats(docstats)
    write_index(postings, docstats, dictionary, stats, d,
                IndexConfig(bm25=PARAMS, n_shards=4))
    return d


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine(PARAMS)
    for row in make_corpus(N_DOCS):
        eng.add_document(row["content"])
    return eng


def test_segment_roundtrip_vs_postings(spark, oracle, index_dir):
    segs = spark.read.parquet(f"{index_dir}/segments")
    want = {}
    for term, d, tf, pos in oracle.postings():
        want.setdefault((d % 4, term), []).append((d, tf, tuple(pos)))
    got = {}
    for r in segs.collect():
        row = r.asDict()
        doc_ids, tfs, positions = decode_segment_row(row, with_positions=True)
        got[(row["shard_id"], row["term"])] = [
            (int(d), int(t), tuple(int(x) for x in p))
            for d, t, p in zip(doc_ids, tfs, positions)
        ]
        # docIDs strictly ascending within a segment (reference
        # posting_list_delta.h:412-415 enforces this at insert)
        assert np.all(np.diff(doc_ids) > 0)
    assert got == {k: sorted(v) for k, v in want.items()}


def test_segment_offsets_roundtrip(spark):
    """off_blob round-trips the per-occurrence [s,e) byte spans through
    both write paths (mapside + shuffle-from-arrow-postings), and every
    span extracts its exact token from the lowered content."""
    from wiser_spark.operators.mapside import build_segments_mapside
    from wiser_spark.operators.postings import build_postings_arrow
    from wiser_spark.operators.segments import BLOOM_PREFIXES, DOCLEN_TERM

    docs = assign_doc_ids(corpus_df(spark, 60), n_partitions=2).select(
        "doc_id", "content"
    )
    content = {r["doc_id"]: r["content"].lower() for r in docs.collect()}

    def check(rows):
        n_occ = 0
        for r in rows:
            row = r.asDict()
            if row["term"] == DOCLEN_TERM or row["term"].startswith(BLOOM_PREFIXES):
                continue
            ids, tfs, _, offs = decode_segment_row(
                row, with_positions=True, with_offsets=True
            )
            for d, tf, o in zip(ids, tfs, offs):
                assert len(o) == 2 * tf
                for i in range(int(tf)):
                    s, e = int(o[2 * i]), int(o[2 * i + 1])
                    assert content[int(d)][s:e] == row["term"]
                    n_occ += 1
        return n_occ

    mapside = build_segments_mapside(docs, n_shards=2).collect()
    shuffle = build_segments(
        build_postings_arrow(docs, with_offsets=True), n_shards=2
    ).collect()
    assert check(mapside) == check(shuffle) > 1000


def test_skip_entries_partial_decode(spark):
    """Skip rows every 128 postings allow decoding from a bag boundary."""
    rows = [("t", i * 3, 1 + (i % 5)) for i in range(400)]  # one term, 400 docs
    postings = spark.createDataFrame(rows, "term string, doc_id long, tf int")
    seg = build_segments(postings, n_shards=1).collect()[0].asDict()
    assert len(seg["skip_predocs"]) == 4  # ceil(400/128)
    assert seg["skip_predocs"][0] == 0
    assert seg["skip_predocs"][1] == 127 * 3  # docID preceding bag 1
    # decode bag 2 onward without touching bags 0-1
    off = seg["skip_docid_offs"][2]
    deltas = decode_column(seg["docids_blob"], 400 - 256, offset=int(off))
    docids = np.cumsum(deltas.astype(np.int64)) + seg["skip_predocs"][2]
    np.testing.assert_array_equal(docids, np.arange(256, 400) * 3)


QUERIES = [
    (["return"], False),
    (["return", "import"], False),
    (["def", "self", "return"], False),
    (["return", "zz_absent_zz"], False),
    (["return", "import"], True),
    (["import", "return", "def"], True),
]


@pytest.mark.parametrize("terms,is_phrase", QUERIES)
def test_segment_search_rank_identical_to_oracle(
    spark, oracle, index_dir, terms, is_phrase
):
    idx = SegmentIndex(spark, index_dir)
    got = idx.search(terms, k=10, is_phrase=is_phrase).collect()
    want = oracle.search(terms, k=10, is_phrase=is_phrase)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, score) in zip(got, want):
        assert r["score"] == pytest.approx(score, rel=1e-12)
