"""Incremental (streaming) index == batch index on the same ingested
prefix; generations merge transparently at query time."""

import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.operators.segments import SegmentIndex
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import make_corpus
from wiser_spark.streaming.incremental import start_incremental_index

PARAMS = BM25Params(1.2, 0.75)
SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir, index_dir, ckpt = (
        str(base / "in"), str(base / "idx"), str(base / "ckpt")
    )
    rows = make_corpus(90)  # already sorted by (repo, path, commit)
    cfg = IndexConfig(bm25=PARAMS, n_shards=3)

    def ingest(batch_rows):
        df = spark.createDataFrame(batch_rows, SCHEMA)
        df.coalesce(1).write.mode("append").parquet(input_dir)
        q = start_incremental_index(
            spark, input_dir, index_dir, ckpt, SCHEMA, cfg
        )
        q.awaitTermination()

    ingest(rows[:40])   # generation 0
    ingest(rows[40:])   # generation 1 (only new files processed)
    return index_dir, rows


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine(PARAMS)
    for row in make_corpus(90):
        eng.add_document(row["content"])
    return eng


def test_stream_stats_match_batch(spark, streamed, oracle):
    idx = SegmentIndex(spark, streamed[0])
    assert idx.stats.n_docs == 90
    assert idx.stats.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    # two generations actually present (exactly-once, no reprocessing)
    gens = {
        r["generation"]
        for r in idx.segments.select("generation").distinct().collect()
    }
    assert len(gens) == 2


@pytest.mark.parametrize(
    "terms,is_phrase",
    [(["return"], False), (["return", "import"], False), (["if", "else"], True)],
)
def test_stream_query_rank_identical(spark, streamed, oracle, terms, is_phrase):
    idx = SegmentIndex(spark, streamed[0])
    got = idx.search(terms, k=10, is_phrase=is_phrase).collect()
    want = oracle.search(terms, k=10, is_phrase=is_phrase)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
