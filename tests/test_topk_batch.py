"""Batch query processor == per-query oracle, across mixed shapes."""

import pytest

from wiser_spark.config import BM25Params
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import (
    assign_doc_ids,
    build_dictionary,
    build_postings,
)
from wiser_spark.operators.topk import bm25_topk_batch
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

PARAMS = BM25Params(1.2, 0.75)
N = 110

QUERY_LOG = [
    (0, ["return"], False),
    (1, ["import"], False),
    (2, ["return", "import"], False),
    (3, ["def", "self"], False),
    (4, ["return", "import", "def"], False),
    (5, ["return", "zz_missing_zz"], False),
    (6, ["return", "import"], True),
    (7, ["if", "else"], True),
    (8, ["import", "return", "def"], True),
]


def test_batch_equals_oracle_per_query(spark):
    docs = assign_doc_ids(corpus_df(spark, N), n_partitions=4)
    postings = build_postings(docs).cache()
    docstats = build_docstats(docs)
    got_rows = bm25_topk_batch(
        postings, docstats, build_dictionary(postings), corpus_stats(docstats),
        QUERY_LOG, k=10, params=PARAMS,
    ).collect()
    got: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    eng = OracleEngine(PARAMS)
    for row in make_corpus(N):
        eng.add_document(row["content"])
    for qid, terms, is_phrase in QUERY_LOG:
        want = eng.search(terms, k=10, is_phrase=is_phrase)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], f"query {qid}"
        for (_, s_have), (_, s_want) in zip(have, want):
            assert s_have == pytest.approx(s_want, rel=1e-12)
