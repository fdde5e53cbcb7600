"""Map-side (zero-shuffle) index build == oracle, and == the
shuffle-based v1 path. This is the scale-path differential gate."""

import json

import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.operators.mapside import write_index_mapside
from wiser_spark.operators.postings import assign_doc_ids
from wiser_spark.operators.segments import SegmentIndex
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

N = 130
PARAMS = BM25Params(1.2, 0.75)


@pytest.fixture(scope="module")
def mapside_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mapside_idx"))
    docs = assign_doc_ids(corpus_df(spark, N), n_partitions=4)
    write_index_mapside(docs, d, IndexConfig(bm25=PARAMS, n_shards=5))
    return d


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine(PARAMS)
    for row in make_corpus(N):
        eng.add_document(row["content"])
    return eng


def test_meta_and_dictionary(spark, mapside_dir, oracle):
    meta = json.load(open(f"{mapside_dir}/stats.json"))
    assert meta["n_docs"] == N
    assert meta["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)
    assert meta["doclen_sentinel"] is True
    d = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{mapside_dir}/dictionary").collect()
    }
    assert d["return"] == oracle.df("return")
    assert "" not in d  # sentinel rows excluded from the dictionary


QUERIES = [
    (["return"], False),
    (["return", "import"], False),
    (["def", "self", "return"], False),
    (["return", "zz_absent_zz"], False),
    (["return", "import"], True),
    (["import", "return", "def"], True),
]


@pytest.mark.parametrize("terms,is_phrase", QUERIES)
def test_mapside_search_rank_identical(spark, mapside_dir, oracle, terms, is_phrase):
    idx = SegmentIndex(spark, mapside_dir)
    got = idx.search(terms, k=10, is_phrase=is_phrase).collect()
    want = oracle.search(terms, k=10, is_phrase=is_phrase)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
