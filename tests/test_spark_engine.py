"""Differential tests: Spark engine vs the pure-Python oracle.

The model is the reference's own strongest check — its flash engine must
equal its memory engine on the same corpus (``tests_15.cc:158-213``).
Here the Spark DataFrame path must equal OracleEngine: postings,
docstats, dictionary, and top-10 results for single/AND/phrase queries.
"""

import pytest

from wiser_spark.config import BM25Params
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import (
    assign_doc_ids,
    build_dictionary,
    build_postings,
)
from wiser_spark.operators.topk import bm25_topk
from wiser_spark.oracle import OracleEngine
from wiser_spark.sources.corpus import corpus_df, make_corpus

N_DOCS = 120
PARAMS = BM25Params(1.2, 0.75)

QUERIES = [
    (["return"], False),
    (["return", "import"], False),
    (["def", "self", "return"], False),
    (["parse_doc_001"], False),          # almost surely absent
    (["return", "zz_absent_zz"], False),
    (["return", "import"], True),
    (["if", "else"], True),
    (["import", "return", "def"], True),
]


@pytest.fixture(scope="module")
def built(spark):
    docs = assign_doc_ids(corpus_df(spark, N_DOCS), n_partitions=4)
    postings = build_postings(docs).cache()
    docstats = build_docstats(docs).cache()
    dictionary = build_dictionary(postings).cache()
    stats = corpus_stats(docstats)
    return docs, postings, docstats, dictionary, stats


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine(PARAMS)
    for row in make_corpus(N_DOCS):  # same (repo, path, commit) order
        eng.add_document(row["content"])
    return eng


def test_docid_assignment_dense_and_deterministic(spark, built):
    docs = built[0]
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert ids == list(range(N_DOCS))
    # re-running the assignment yields identical (repo, path) -> doc_id
    again = assign_doc_ids(corpus_df(spark, N_DOCS), n_partitions=7)
    a = {(r["repo"], r["path"]): r["doc_id"] for r in docs.collect()}
    b = {(r["repo"], r["path"]): r["doc_id"] for r in again.collect()}
    assert a == b


def test_postings_match_oracle(built, oracle):
    postings = built[1]
    got = {
        (r["term"], r["doc_id"]): (r["tf"], tuple(r["positions"]))
        for r in postings.collect()
    }
    want = {
        (t, d): (tf, tuple(pos)) for t, d, tf, pos in oracle.postings()
    }
    assert got == want


def test_docstats_match_oracle(built, oracle):
    docstats = built[2]
    rows = {r["doc_id"]: r for r in docstats.collect()}
    for d in range(N_DOCS):
        assert rows[d]["doclen"] == oracle.doclens[d]
        assert rows[d]["doclen_char"] == oracle.doclen_chars[d]
    stats = built[4]
    assert stats.n_docs == oracle.n_docs
    assert stats.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


def test_arrow_postings_equal_declarative(spark, built):
    """The shuffle-free mapInPandas posting builder must emit exactly the
    declarative plan's rows (it's the build-path fast lane)."""
    from wiser_spark.operators.postings import build_postings_arrow

    docs = built[0]
    a = {
        (r["term"], r["doc_id"]): (r["tf"], tuple(r["positions"]))
        for r in build_postings_arrow(docs).collect()
    }
    b = {
        (r["term"], r["doc_id"]): (r["tf"], tuple(r["positions"]))
        for r in built[1].collect()
    }
    assert a == b


def test_dictionary_matches_oracle(built, oracle):
    dictionary = built[3]
    got = {r["term"]: r["df"] for r in dictionary.collect()}
    want = {t: oracle.df(t) for t in got}
    assert got == want
    assert oracle.df("return") == got.get("return")


@pytest.mark.parametrize("terms,is_phrase", QUERIES)
def test_topk_rank_identical_to_oracle(built, oracle, terms, is_phrase):
    _, postings, docstats, dictionary, stats = built
    got = bm25_topk(
        postings, docstats, dictionary, stats, terms,
        k=10, params=PARAMS, is_phrase=is_phrase,
    ).collect()
    want = oracle.search(terms, k=10, is_phrase=is_phrase)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
    for r, (_, score) in zip(got, want):
        assert r["score"] == pytest.approx(score, rel=1e-12)


def test_sha256_invariant(spark, built):
    """Per-row content sha256 survives the pipeline (input_hint invariant)."""
    import hashlib

    docstats = built[2]
    got = {r["doc_id"]: r["sha256"] for r in docstats.collect()}
    docs = {r["doc_id"]: r["content"] for r in built[0].collect()}
    for d, content in docs.items():
        assert got[d] == hashlib.sha256(content.encode()).hexdigest()


def test_read_corpus_table_parquet_fallback(spark, tmp_path):
    """read_corpus_table: no Iceberg runtime here, so "auto" lands on
    the parquet path with the exact north-rule schema; lang filter and
    column pruning reach the scan; missing columns fail loudly."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from wiser_spark.sources.table import CORPUS_COLUMNS, read_corpus_table

    src = str(tmp_path / "files")
    corpus_df(spark, 80).withColumn(
        "extra", F.length("content")
    ).write.partitionBy("lang").parquet(src)
    df = read_corpus_table(spark, src)
    assert tuple(df.columns) == CORPUS_COLUMNS  # extra pruned
    assert df.count() == 80
    py = read_corpus_table(spark, src, langs=["py"])
    assert py.count() == py.where("lang = 'py'").count() > 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        py.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()  # lang prunes partitions
    with pytest.raises(ValueError, match="commit"):
        bad = str(tmp_path / "bad")
        corpus_df(spark, 5).drop("commit").write.parquet(bad)
        read_corpus_table(spark, bad)
