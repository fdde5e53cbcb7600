"""Rank identity must hold for BOTH BM25 constant pairs: the reference
code's (1.2, 0.75) — covered across the suite — and the north-star
(0.9, 0.4) pair (BASELINE.json), covered here."""

import pytest

from wiser_spark.config import BM25_NORTH
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import (
    assign_doc_ids,
    build_dictionary,
    build_postings,
)
from wiser_spark.operators.topk import bm25_topk
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

N = 100


@pytest.mark.parametrize(
    "terms,is_phrase",
    [(["return"], False), (["return", "import", "def"], False),
     (["return", "import"], True)],
)
def test_north_params_rank_identity(spark, terms, is_phrase):
    docs = assign_doc_ids(corpus_df(spark, N), n_partitions=4)
    postings = build_postings(docs).cache()
    docstats = build_docstats(docs)
    got = bm25_topk(
        postings, docstats, build_dictionary(postings), corpus_stats(docstats),
        terms, k=10, params=BM25_NORTH, is_phrase=is_phrase,
    ).collect()
    eng = OracleEngine(BM25_NORTH)
    for row in make_corpus(N):
        eng.add_document(row["content"])
    want = eng.search(terms, k=10, is_phrase=is_phrase)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
