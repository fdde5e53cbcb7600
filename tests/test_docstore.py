"""Chunked compressed doc store (S7): roundtrip, alignment rule,
pruned point fetch."""

import random

import pytest

from wiser_spark.operators.docstore import (
    KB4,
    fetch_docs,
    should_align,
    write_doc_store,
)


def test_should_align_matches_reference_rule():
    # crossing fewer blocks when aligned -> align (doc_store.h:73-78)
    assert should_align(KB4 - 10, 100)          # 2 blocks -> 1
    assert not should_align(0, 100)             # already at a boundary
    assert not should_align(512, 100)           # fits the current block
    assert should_align(KB4 - 1, 2 * KB4)       # 3 blocks -> 2


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rnd = random.Random(13)
    rows = []
    for i in range(400):
        if i == 7:
            rows.append((i, ""))                       # empty doc
        elif i == 11:
            rows.append((i, "ünïcode — document ✓"))   # non-ASCII
        else:
            # incompressible-ish hex so compressed sizes stay large
            # enough that the alignment rule actually fires
            rows.append(
                (i, "".join(rnd.choice("0123456789abcdef")
                            for _ in range(rnd.randrange(200, 9000))))
            )
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path_factory.mktemp("store") / "ds")
    write_doc_store(docs.repartition(3, "doc_id"), d,
                    extent_bytes=64 * 1024)
    return d, dict(rows)


def test_roundtrip_all_docs(spark, store):
    d, want = store
    got = {r["doc_id"]: r["content"] for r in fetch_docs(spark, d).collect()}
    assert got == want  # byte-for-byte (sha256 invariant by implication)


def test_extent_layout_and_alignment(spark, store):
    d, _ = store
    exts = spark.read.parquet(f"{d}/extents").collect()
    assert len(exts) > 3  # multiple extents at 64 KiB
    n_aligned = 0
    for e in exts:
        assert e["first_doc"] == e["doc_ids"][0]
        assert e["last_doc"] == e["doc_ids"][-1]
        assert list(e["doc_ids"]) == sorted(e["doc_ids"])
        prev_end = 0
        for off_enc, size in zip(e["enc_offs"], e["sizes"]):
            off, aligned = off_enc >> 1, bool(off_enc & 1)
            if aligned:
                assert off % KB4 == 0  # padded to the 4KB boundary
                n_aligned += 1
            # the reference rule decided the flag
            assert aligned == should_align(prev_end, size)
            prev_end = off + size
        assert prev_end == len(e["blob"])
    assert n_aligned > 0  # the rule fired somewhere in this corpus


def test_point_fetch_prunes_extents(spark, store):
    d, want = store
    out = fetch_docs(spark, d, doc_ids=[3, 399])
    rows = {r["doc_id"]: r["content"] for r in out.collect()}
    assert rows == {3: want[3], 399: want[399]}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "first_doc" in plan, plan[:2000]


def test_large_fetch_bounded_predicate(spark, store):
    """A serving-scale fetch (10^4 requested ids) must build a BOUNDED
    predicate — at most MAX_FETCH_RANGES range clauses, not one clause
    per id (ADVICE r03) — and return exactly the requested docs."""
    from wiser_spark.operators.docstore import MAX_FETCH_RANGES

    ids = list(range(0, 400, 3)) + list(range(10_000, 20_000))  # mostly absent
    out = fetch_docs(spark, d := store[0], doc_ids=ids)
    plan = out._jdf.queryExecution().analyzed().toString()
    # clause count ~ occurrences of first_doc in the analyzed filter
    assert plan.count("first_doc") <= MAX_FETCH_RANGES + 2, plan[:2000]
    rows = {r["doc_id"]: r["content"] for r in out.collect()}
    want = {i: store[1][i] for i in range(0, 400, 3)}
    assert rows == want  # absent ids silent, present ids exact
    _ = d


def test_codec_recorded_and_honored(spark, tmp_path):
    """The store records its codec in meta.json; fetch_docs decodes
    with the RECORDED codec (default = lz4 when importable else zlib),
    and an explicit zlib store roundtrips regardless of environment."""
    import json

    from wiser_spark.operators.docstore import default_codec

    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * 20) for i in range(50)],
        "doc_id long, content string",
    )
    d = str(tmp_path / "ds_codec")
    write_doc_store(docs, d, codec="zlib")
    with open(f"{d}/meta.json") as f:
        assert json.load(f)["codec"] == "zlib"
    got = {r["doc_id"]: r["content"] for r in fetch_docs(spark, d).collect()}
    assert got == {i: f"doc body {i} " * 20 for i in range(50)}
    # the default codec is always a working roundtrip in THIS env
    d2 = str(tmp_path / "ds_default")
    write_doc_store(docs, d2)
    with open(f"{d2}/meta.json") as f:
        assert json.load(f)["codec"] == default_codec()
    got2 = {r["doc_id"]: r["content"] for r in fetch_docs(spark, d2).collect()}
    assert got2 == got


def test_empty_fetch_reads_nothing(spark, store):
    """fetch_docs with an explicit empty id list returns an empty frame
    WITHOUT scanning the store (no extent filter could prune it)."""
    d, _ = store
    out = fetch_docs(spark, d, doc_ids=[])
    assert out.count() == 0
    assert out.columns == ["doc_id", "content"]
    # the plan must not touch the extents table at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "extents" not in plan


def test_search_snippets_from_doc_store(spark, tmp_path):
    """The serving flow: search(return_snippets=True,
    doc_store_dir=...) point-fetches the <= k winners from the chunked
    store and produces EXACTLY the snippets the lake-table path gives."""
    from wiser_spark.config import BM25Params, IndexConfig
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.postings import assign_doc_ids
    from wiser_spark.operators.segments import SegmentIndex
    from wiser_spark.sources.corpus import corpus_df

    docs = assign_doc_ids(corpus_df(spark, 120)).select("doc_id", "content")
    idx_dir = str(tmp_path / "idx")
    store_dir = str(tmp_path / "store")
    write_index_mapside(docs, idx_dir,
                        IndexConfig(bm25=BM25Params(0.9, 0.4), n_shards=2))
    write_doc_store(docs, store_dir)
    idx = SegmentIndex(spark, idx_dir)
    via_lake = [tuple(r) for r in idx.search(
        ["return", "import"], k=5, return_snippets=True, docs=docs
    ).collect()]
    via_store = [tuple(r) for r in idx.search(
        ["return", "import"], k=5, return_snippets=True,
        doc_store_dir=store_dir,
    ).collect()]
    assert via_store == via_lake and len(via_store) == 5
    assert all(isinstance(r[3], str) and r[3] for r in via_store)


def test_search_batch_snippets_match_single_path(spark, tmp_path):
    """Batch snippets == per-query search snippets, on BOTH content
    paths (lake table and chunked store), for term AND phrase queries."""
    from wiser_spark.config import BM25Params, IndexConfig
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.postings import assign_doc_ids
    from wiser_spark.operators.segments import SegmentIndex
    from wiser_spark.sources.corpus import corpus_df

    docs = assign_doc_ids(corpus_df(spark, 100)).select("doc_id", "content")
    idx_dir = str(tmp_path / "idx")
    store_dir = str(tmp_path / "store")
    write_index_mapside(docs, idx_dir,
                        IndexConfig(bm25=BM25Params(0.9, 0.4), n_shards=2))
    write_doc_store(docs, store_dir)
    idx = SegmentIndex(spark, idx_dir)
    qlog = [(0, ["return"], False), (1, ["return", "import"], True),
            (2, ["def", "self"], False)]
    want = []
    for qid, terms, ph in qlog:
        for r in idx.search(terms, k=5, is_phrase=ph,
                            return_snippets=True, docs=docs).collect():
            want.append((qid, r["rank"], r["doc_id"], r["score"],
                         r["snippet"]))
    got_lake = [tuple(r) for r in idx.search_batch(
        qlog, k=5, return_snippets=True, docs=docs).collect()]
    got_store = [tuple(r) for r in idx.search_batch(
        qlog, k=5, return_snippets=True, doc_store_dir=store_dir
    ).collect()]
    assert got_lake == sorted(want) == got_store
    assert len(got_lake) == 15 and all(r[4] for r in got_lake)


def test_rewrite_failure_keeps_old_store_meta(spark, tmp_path):
    """Rewriting an EXISTING store flips meta.json only after the new
    extents are durable: a rewrite that fails before writing must leave
    the old meta (codec/align) AND the old extents readable — flipping
    the codec first would make every fetch mis-decode intact data."""
    import json

    from pyspark.sql import functions as F

    from wiser_spark.operators.docstore import fetch_docs, write_doc_store

    d = str(tmp_path / "store")
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("content"),
    )
    write_doc_store(docs, d, align=True)
    with open(f"{d}/meta.json") as f:
        m1 = json.load(f)
    assert m1["align"] is True
    # a rewrite that fails at PLAN time (before any data is touched):
    # missing content column -> analysis error
    with pytest.raises(Exception):
        write_doc_store(docs, d, content_col="nope", align=False)
    with open(f"{d}/meta.json") as f:
        assert json.load(f) == m1  # old meta intact
    got = {r["doc_id"]: r["content"]
           for r in fetch_docs(spark, d, [0, 7]).collect()}
    assert got == {0: "doc 0", 7: "doc 7"}  # old extents intact
    # a SUCCESSFUL rewrite does flip the recorded settings
    write_doc_store(docs, d, align=False)
    with open(f"{d}/meta.json") as f:
        assert json.load(f)["align"] is False


def test_snippet_winner_missing_from_store_keeps_entry(spark, tmp_path):
    """A top-k winner whose content is ABSENT from the docs table /
    store (live index grown past the store, or a partial lake table)
    keeps its reply entry with an empty snippet — ranking must never
    change because content went missing (review r05: the inner join
    silently dropped such winners)."""
    from wiser_spark.config import BM25Params, IndexConfig
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.postings import assign_doc_ids
    from wiser_spark.operators.segments import SegmentIndex
    from wiser_spark.sources.corpus import corpus_df

    docs = assign_doc_ids(corpus_df(spark, 80)).select("doc_id", "content")
    idx_dir = str(tmp_path / "idx")
    store_dir = str(tmp_path / "store")
    write_index_mapside(docs, idx_dir,
                        IndexConfig(bm25=BM25Params(0.9, 0.4), n_shards=2))
    idx = SegmentIndex(spark, idx_dir)
    want = [tuple(r) for r in idx.search(["return"], k=5).collect()]
    drop = want[1][1]  # second winner's doc_id goes missing
    partial = docs.filter(f"doc_id != {drop}")
    write_doc_store(partial, store_dir)
    for src in ({"docs": partial}, {"doc_store_dir": store_dir}):
        got = [tuple(r) for r in idx.search(
            ["return"], k=5, return_snippets=True, **src
        ).collect()]
        assert [(r[0], r[1], r[2]) for r in got] == want
        by_id = {r[1]: r[3] for r in got}
        assert by_id[drop] == ""
        assert all(s for d, s in by_id.items() if d != drop)
    # batch path, both content sources
    got_b = [tuple(r) for r in idx.search_batch(
        [(7, ["return"], False)], k=5, return_snippets=True,
        doc_store_dir=store_dir,
    ).collect()]
    assert [(r[1], r[2], r[3]) for r in got_b] == want
    assert {r[2]: r[4] for r in got_b}[drop] == ""
