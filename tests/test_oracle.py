"""Oracle engine vs the reference's own end-to-end expectations.

The 3-doc fixture replicates reference ``testdata/iter_test_3_docs``
("a", "a b", "a b c") and the assertions of ``tests_15.cc:11-155``
(FIXTURES.md §2).
"""

import math

import pytest

from wiser_spark.config import BM25Params
from wiser_spark.functions.char4 import char4_to_uint_scalar, uint_to_char4_scalar
from wiser_spark.oracle import OracleEngine


@pytest.fixture()
def three_docs():
    eng = OracleEngine()
    for body in ["a", "a b", "a b c"]:
        eng.add_document(body)
    return eng


def test_df(three_docs):
    assert three_docs.df("a") == 3
    assert three_docs.df("b") == 2
    assert three_docs.df("c") == 1
    assert three_docs.df("zzz") == 0


def test_doclens(three_docs):
    assert three_docs.doclens == [1, 2, 3]
    assert three_docs.avgdl == 2.0


def test_single_term(three_docs):
    docs = [d for d, _ in three_docs.search(["a"], k=10)]
    assert sorted(docs) == [0, 1, 2]
    docs_c = [d for d, _ in three_docs.search(["c"], k=10)]
    assert docs_c == [2]


def test_conjunction(three_docs):
    docs = sorted(d for d, _ in three_docs.search(["a", "b"], k=10))
    assert docs == [1, 2]
    docs = sorted(d for d, _ in three_docs.search(["a", "b", "c"], k=10))
    assert docs == [2]


def test_unknown_term_empties_whole_query(three_docs):
    # AND semantics (reference qq_mem_engine.h:345-347)
    assert three_docs.search(["a", "zzz"], k=10) == []
    assert three_docs.search(["zzz"], k=10) == []


def test_phrase(three_docs):
    assert sorted(d for d, _ in three_docs.search(["a", "b"], is_phrase=True)) == [1, 2]
    assert [d for d, _ in three_docs.search(["a", "b", "c"], is_phrase=True)] == [2]
    # "b a" never occurs in order
    assert three_docs.search(["b", "a"], is_phrase=True) == []


def test_phrase_nonadjacent_rejected():
    eng = OracleEngine()
    eng.add_document("x q y")      # x..y not adjacent
    eng.add_document("x y q")      # adjacent
    assert [d for d, _ in eng.search(["x", "y"], is_phrase=True)] == [1]


def test_repeated_term_tf():
    eng = OracleEngine()
    eng.add_document("w w w z")
    (term_rows) = {(t, d): tf for t, d, tf, _ in eng.postings()}
    assert term_rows[("w", 0)] == 3
    assert term_rows[("z", 0)] == 1


def test_bm25_score_manual():
    """Hand-computed BM25 with the lossy length path (k1=1.2, b=0.75)."""
    eng = OracleEngine(BM25Params(1.2, 0.75))
    eng.add_document("apple banana apple")
    eng.add_document("apple cherry")
    res = dict(eng.search(["apple"], k=10))
    n, df = 2, 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    avgdl = 2.5
    for doc_id, tf, doclen in [(0, 2, 3), (1, 1, 2)]:
        lossy_len = char4_to_uint_scalar(uint_to_char4_scalar(doclen))
        tfnorm = (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * lossy_len / avgdl))
        assert res[doc_id] == pytest.approx(idf * tfnorm, rel=1e-12)


def test_topk_truncation_and_tie_order():
    eng = OracleEngine()
    # five identical docs -> identical scores; earliest docIDs must be kept
    for _ in range(5):
        eng.add_document("t t q")
    res = eng.search(["t"], k=3)
    assert [d for d, _ in res] == [0, 1, 2]
    assert len({s for _, s in res}) == 1


def test_lossy_length_is_score_visible():
    """Docs whose true lengths differ but Char4-collide must tie exactly."""
    eng = OracleEngine()
    # lengths 32 and 35 both encode to the same byte (top-4-bit bucket)
    eng.add_document("k " + "f0 " * 30 + "f1")          # 32 words
    eng.add_document("k " + "g0 " * 30 + "g1 g2 g3 g4")  # 35 words
    assert uint_to_char4_scalar(32) == uint_to_char4_scalar(35)
    res = dict(eng.search(["k"], k=10))
    assert res[0] == res[1]
