"""Incremental (streaming) index == batch index on the same ingested
prefix; generations merge transparently at query time."""

import os

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


def test_compaction_preserves_results(spark, streamed, oracle, tmp_path):
    """Compacting the multi-generation streaming index into one row per
    (shard, term) must leave every query identical and actually merge
    the generations (the reference's qq->vacuum conversion, B18)."""
    from wiser_spark.operators.segments import compact_index

    src, _ = streamed
    out = str(tmp_path / "compacted")
    compact_index(spark, src, out)
    segs = spark.read.parquet(f"{out}/segments")
    per_key = (
        segs.groupBy("shard_id", "term").count()
        .agg({"count": "max"}).collect()[0][0]
    )
    assert per_key == 1  # one generation after the merge
    idx_old = SegmentIndex(spark, src)
    idx_new = SegmentIndex(spark, out)
    for terms, is_phrase in [(["return"], False), (["return", "import"], True)]:
        a = [tuple(r) for r in idx_old.search(terms, 10, is_phrase).collect()]
        b = [tuple(r) for r in idx_new.search(terms, 10, is_phrase).collect()]
        assert a == b and a
        want = oracle.search(terms, k=10, is_phrase=is_phrase)
        assert [r[1] for r in b] == [d for d, _ in want]


def test_replayed_batch_is_noop(spark, tmp_path):
    """At-least-once replay of a committed batch must not duplicate rows
    or shift docIDs (the commit log makes the sink idempotent)."""
    from wiser_spark.streaming.incremental import IncrementalIndexer

    rows = make_corpus(30)
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "idx")
    ix = IncrementalIndexer(d, IndexConfig(bm25=PARAMS, n_shards=2))
    ix.process_batch(df, 0)
    n1 = spark.read.parquet(f"{d}/docstats").count()
    ids1 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{d}/docstats").collect()
    )
    ix.process_batch(df, 0)  # replay
    assert spark.read.parquet(f"{d}/docstats").count() == n1 == 30
    ix.process_batch(spark.createDataFrame(make_corpus(40)[30:], SCHEMA), 1)
    ids2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{d}/docstats").collect()
    )
    # dense continuation: batch 1 starts exactly where batch 0 ended
    assert ids2 == list(range(40)) and ids1 == list(range(30))
    idx = SegmentIndex(spark, d)
    assert idx.stats.n_docs == 40
    assert idx.search(["return"], k=5).count() > 0


def test_staging_leftover_replaced_on_retry(spark, tmp_path):
    """A crash between publish and commit leaves a half-moved generation;
    the retry (same batch_id, same docID offset from the commit log)
    replaces it with identical data."""
    import json
    import os

    from wiser_spark.streaming.incremental import IncrementalIndexer

    rows = make_corpus(20)
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "idx")
    ix = IncrementalIndexer(d, IndexConfig(bm25=PARAMS, n_shards=2))
    ix.process_batch(df, 0)
    # simulate the crash: generation published but commit record lost
    os.remove(f"{d}/commits.json")
    ix.process_batch(df, 0)  # retry
    with open(f"{d}/commits.json") as f:
        assert json.load(f) == {"0": [0, 20]}
    assert spark.read.parquet(f"{d}/docstats").count() == 20
    got = sorted(r["doc_id"] for r in spark.read.parquet(f"{d}/docstats").collect())
    assert got == list(range(20))


@pytest.fixture(scope="module")
def streamed_v2(spark, tmp_path_factory, oracle):
    """Two v2 (map-side) generations ingested via the idempotent sink."""
    from wiser_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path_factory.mktemp("stream_v2") / "idx")
    rows = make_corpus(90)
    ix = IncrementalIndexer(d, IndexConfig(bm25=PARAMS, n_shards=3), fmt="v2")
    ix.process_batch(spark.createDataFrame(rows[:40], SCHEMA), 0)
    ix.process_batch(spark.createDataFrame(rows[40:], SCHEMA), 1)
    return d


def test_stream_v2_multigeneration_queries(spark, streamed_v2, oracle):
    """v2 streaming generations (sentinels + blooms in the segment
    table, no docstats dir) answer rank-identically before compaction."""
    import os

    assert not os.path.exists(f"{streamed_v2}/docstats")
    idx = SegmentIndex(spark, streamed_v2)
    assert idx.stats.n_docs == 90
    assert idx.stats.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert idx.has_sentinel and idx.bloom_cfg is not None
    for terms, ph in [(["return"], False), (["return", "import"], False),
                      (["if", "else"], True)]:
        got = idx.search(terms, k=10, is_phrase=ph).collect()
        want = oracle.search(terms, k=10, is_phrase=ph)
        assert [r["doc_id"] for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, rel=1e-12)


def test_stream_v2_compaction_merges_sentinels_and_blooms(
    spark, streamed_v2, oracle, tmp_path
):
    """compact_index on a v2 streaming index merges plain rows AND the
    sentinel doc-length rows AND both bloom sides into one row per
    (shard, term); the compacted index answers the full suite
    rank-identically, with bloom pruning active again."""
    from wiser_spark.operators.segments import (
        BLOOM_BEGIN_PREFIX,
        BLOOM_PREFIX,
        DOCLEN_TERM,
        compact_index,
    )

    out = str(tmp_path / "compacted_v2")
    compact_index(spark, streamed_v2, out)
    segs = spark.read.parquet(f"{out}/segments")
    per_key = (
        segs.groupBy("shard_id", "term").count()
        .agg({"count": "max"}).collect()[0][0]
    )
    assert per_key == 1  # sentinels, blooms, and terms all merged
    rows = segs.select("term").collect()
    terms = [r["term"] for r in rows]
    assert DOCLEN_TERM in terms
    n_end = sum(t.startswith(BLOOM_PREFIX) for t in terms)
    n_begin = sum(t.startswith(BLOOM_BEGIN_PREFIX) for t in terms)
    n_plain = sum(
        not t.startswith((BLOOM_PREFIX, BLOOM_BEGIN_PREFIX)) and t != DOCLEN_TERM
        for t in terms
    )
    assert n_end == n_begin == n_plain > 0  # both sides survived the merge
    idx = SegmentIndex(spark, out)
    assert idx.stats.n_docs == 90
    for terms_q, ph in [(["return"], False), (["return", "import"], False),
                        (["return", "import"], True), (["if", "else"], True),
                        (["def", "self", "return"], False)]:
        got = idx.search(terms_q, k=10, is_phrase=ph).collect()
        want = oracle.search(terms_q, k=10, is_phrase=ph)
        assert [r["doc_id"] for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, rel=1e-12)


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


def test_resume_with_other_format_refuses(tmp_path):
    """Resuming an existing index with the OTHER fmt would corrupt it
    (v1 generations carry no sentinels / no lensum in the commit log);
    the constructor must refuse loudly."""
    import json

    from wiser_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path / "idx")
    os.makedirs(d)
    with open(f"{d}/stats.json", "w") as f:
        json.dump({"format": "wiser-spark-segment-v1"}, f)
    IncrementalIndexer(d, fmt="v1")  # same format: fine
    with pytest.raises(ValueError, match="cannot resume"):
        IncrementalIndexer(d, fmt="v2")
    with open(f"{d}/stats.json", "w") as f:
        json.dump({"format": "wiser-spark-segment-v2-mapside"}, f)
    IncrementalIndexer(d, fmt="v2")
    with pytest.raises(ValueError, match="cannot resume"):
        IncrementalIndexer(d, fmt="v1")


def test_auto_compaction_tiered_trigger(spark, tmp_path, oracle,
                                        monkeypatch):
    """A 20-generation v2 stream with compact_every=6 compacts
    automatically (generation count never exceeds the tier after a
    commit; merges are SIZE-TIERED — smallest generations first),
    answers the BM25 suite rank-identically to an UNCOMPACTED twin fed
    the same batches, and a torn mid-swap state (journal written,
    swap not applied) self-heals from the READ path."""
    from wiser_spark.streaming.incremental import IncrementalIndexer

    rows = make_corpus(200)
    cfg = IndexConfig(bm25=PARAMS, n_shards=3)
    d_auto = str(tmp_path / "auto")
    d_plain = str(tmp_path / "plain")
    ix_auto = IncrementalIndexer(d_auto, cfg, fmt="v2", compact_every=6)
    ix_plain = IncrementalIndexer(d_plain, cfg, fmt="v2")
    for b in range(20):
        batch = spark.createDataFrame(rows[b * 10 : (b + 1) * 10], SCHEMA)
        ix_auto.process_batch(batch, b)
        ix_plain.process_batch(batch, b)
        assert len(ix_auto._generations()) <= 6
    assert len(ix_plain._generations()) == 20
    idx_a = SegmentIndex(spark, d_auto)
    idx_p = SegmentIndex(spark, d_plain)
    assert idx_a.stats.n_docs == idx_p.stats.n_docs == 200
    assert idx_a.stats.avgdl == pytest.approx(idx_p.stats.avgdl, rel=1e-12)
    suite = [
        (["return"], False), (["return", "import"], False),
        (["def", "self", "return"], False), (["return", "import"], True),
        (["import", "return", "def"], True), (["zz_absent"], False),
    ]
    for terms, ph in suite:
        got_a = [tuple(r) for r in
                 idx_a.search(terms, k=10, is_phrase=ph).collect()]
        got_p = [tuple(r) for r in
                 idx_p.search(terms, k=10, is_phrase=ph).collect()]
        assert got_a == got_p, (terms, ph)
    # torn swap: stage + journal a merge of the two oldest remaining
    # generations, but "crash" before the swap applies (journal on
    # disk, manifest unflipped). READERS need no recovery: the
    # generations manifest still names the consistent pre-flip set, so
    # a plain SegmentIndex load answers identically WITHOUT touching
    # the journal (journal application is writer-only — the r04
    # high-severity reader/writer race is structurally closed). The
    # WRITER's next operation rolls the journal forward.
    import wiser_spark.streaming.incremental as incmod

    gens_before = ix_auto._generations()
    monkeypatch.setattr(incmod, "_apply_compaction_journal",
                        lambda *_: None)
    ix_auto.compact_generations(spark, gens_before[:2])
    monkeypatch.undo()
    assert os.path.exists(f"{d_auto}/compaction.json")  # torn state
    assert ix_auto._generations() == gens_before        # swap not applied
    idx_torn = SegmentIndex(spark, d_auto)  # reader: consistent, no heal
    assert os.path.exists(f"{d_auto}/compaction.json")  # untouched
    got = [tuple(r) for r in
           idx_torn.search(["return", "import"], k=10).collect()]
    want = [tuple(r) for r in
            idx_p.search(["return", "import"], k=10).collect()]
    assert got == want
    # writer-side recovery rolls the swap forward; the merged
    # generation installs under a FRESH id (MERGED_GEN_BASE namespace)
    # and the two merged-away generations leave the manifest
    incmod.recover_compaction(d_auto, sweep=True)
    assert not os.path.exists(f"{d_auto}/compaction.json")
    gens_after = ix_auto._generations()
    assert len(gens_after) == len(gens_before) - 1
    assert max(gens_after) >= incmod.MERGED_GEN_BASE
    idx_healed = SegmentIndex(spark, d_auto)
    got = [tuple(r) for r in
           idx_healed.search(["return", "import"], k=10).collect()]
    assert got == want
