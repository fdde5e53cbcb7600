"""Phrase bloom pre-check: result-neutral pruning (reference B15/Q8)."""

import numpy as np
import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.functions.bloom import (
    fold_occurrence_blooms,
    probe,
    token_bloom_bits,
    vocab_bloom_table,
)
from wiser_spark.operators.mapside import write_index_mapside
from wiser_spark.operators.postings import assign_doc_ids
from wiser_spark.operators.segments import SegmentIndex
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

PARAMS = BM25Params(1.2, 0.75)


def test_no_false_negatives_unit():
    """Every token OR'd into a bloom must probe positive."""
    vocab = [f"tok{i}" for i in range(200)]
    table = vocab_bloom_table(vocab)
    occ = table[np.arange(200)]
    starts = np.array([0, 50, 120])
    blooms = fold_occurrence_blooms(occ, starts)
    for j, (lo, hi) in enumerate([(0, 50), (50, 120), (120, 200)]):
        for t in vocab[lo:hi]:
            assert probe(blooms[j : j + 1], token_bloom_bits(t))[0]


@pytest.fixture(scope="module")
def both_indexes(spark, tmp_path_factory):
    docs = assign_doc_ids(corpus_df(spark, 120), n_partitions=4)
    d_on = str(tmp_path_factory.mktemp("idx_bloom_on"))
    d_off = str(tmp_path_factory.mktemp("idx_bloom_off"))
    cfg = IndexConfig(bm25=PARAMS, n_shards=4)
    write_index_mapside(docs, d_on, cfg, with_blooms=True)
    write_index_mapside(docs, d_off, cfg, with_blooms=False)
    return d_on, d_off


@pytest.mark.parametrize(
    "terms",
    [["return", "import"], ["if", "else"], ["import", "return", "def"],
     ["def", "zz_absent"]],
)
def test_bloom_is_result_neutral(spark, both_indexes, terms):
    d_on, d_off = both_indexes
    on = [tuple(r) for r in SegmentIndex(spark, d_on)
          .search(terms, k=10, is_phrase=True).collect()]
    off = [tuple(r) for r in SegmentIndex(spark, d_off)
           .search(terms, k=10, is_phrase=True).collect()]
    assert on == off


def test_bloom_index_matches_oracle(spark, both_indexes):
    eng = OracleEngine(PARAMS)
    for row in make_corpus(120):
        eng.add_document(row["content"])
    idx = SegmentIndex(spark, both_indexes[0])
    got = idx.search(["return", "import"], k=10, is_phrase=True).collect()
    want = eng.search(["return", "import"], k=10, is_phrase=True)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_dictionary_excludes_bloom_and_sentinel_rows(spark, both_indexes):
    d = spark.read.parquet(f"{both_indexes[0]}/dictionary")
    terms = [r["term"] for r in d.collect()]
    assert all(t and not t.startswith(("\x01", "\x02")) for t in terms)


def test_begin_bloom_sided_probe(spark, tmp_path):
    """When the FIRST term's posting list is the larger one, the sided
    rule probes the second term's BEGIN bloom (reference
    query_processing.h:796-807). Non-adjacent co-occurrence still
    pruned; true phrase still found."""
    rows = [(i, "alpha filler words here") for i in range(6)]
    rows.append((6, "alpha gap rare gap alpha"))       # both, never adjacent
    rows.append((7, "lead alpha rare trail"))          # true phrase
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path / "idx")
    write_index_mapside(docs, d, IndexConfig(bm25=PARAMS, n_shards=1))
    idx = SegmentIndex(spark, d)
    # df(alpha)=8 > df(rare)=2 in the single shard => begin side probed
    got = idx.search(["alpha", "rare"], k=10, is_phrase=True).collect()
    assert [r["doc_id"] for r in got] == [7]


def test_nonadjacent_cooccurrence_pruned(spark, tmp_path):
    """Doc contains both terms, never adjacent: the bloom alone excludes
    it (and the result is empty either way)."""
    docs = spark.createDataFrame(
        [(0, "alpha gap beta gap alpha gap beta")], "doc_id long, content string"
    )
    d = str(tmp_path / "idx")
    write_index_mapside(docs, d, IndexConfig(bm25=PARAMS, n_shards=1))
    idx = SegmentIndex(spark, d)
    assert idx.search(["alpha", "beta"], k=10, is_phrase=True).count() == 0
    assert idx.search(["alpha", "gap"], k=10, is_phrase=True).count() == 1
