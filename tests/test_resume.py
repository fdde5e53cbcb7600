"""Checkpoint/resume: stages skip when complete, rebuild after a 'kill',
and the resumed index is logically identical (FIXTURES.md §3
``resume_manifest``)."""

import json
import os
import shutil

import pytest

from wiser_spark.config import BM25Params, IndexConfig
from wiser_spark.operators.segments import SegmentIndex
from wiser_spark.plans.build import IndexBuildPipeline
from wiser_spark.sources.corpus import corpus_df

PARAMS = BM25Params(1.2, 0.75)


def _mtimes(work_dir, stage):
    d = os.path.join(work_dir, stage)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(".")
    }


@pytest.fixture(scope="module")
def work_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipeline"))
    pipe = IndexBuildPipeline(
        spark, corpus_df(spark, 80), d,
        IndexConfig(bm25=PARAMS, n_shards=3), source_fingerprint="corpus80-v1",
    )
    pipe.run()
    return d


def _results(spark, work_dir):
    idx = SegmentIndex(spark, work_dir)
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in idx.search(["return", "import"], k=10).collect()
    ]


def test_manifest_written(work_dir):
    with open(os.path.join(work_dir, "manifest.json")) as f:
        m = json.load(f)
    assert set(m) == {"docs", "postings", "docstats", "dictionary", "segments"}
    for stage, e in m.items():
        assert e["status"] == "complete"
        assert e["rows"] > 0 and e["bytes"] > 0
        assert len(e["files"]) >= 1  # per-partition lineage present


def test_rerun_skips_all_stages(spark, work_dir):
    before = {s: _mtimes(work_dir, s) for s in ("docs", "postings", "segments")}
    pipe = IndexBuildPipeline(
        spark, corpus_df(spark, 80), work_dir,
        IndexConfig(bm25=PARAMS, n_shards=3), source_fingerprint="corpus80-v1",
    )
    pipe.run()
    after = {s: _mtimes(work_dir, s) for s in ("docs", "postings", "segments")}
    assert before == after  # nothing rewritten


def test_resume_after_kill_rebuilds_only_downstream(spark, work_dir):
    want = _results(spark, work_dir)
    # simulate a crash mid segment-merge: segments output lost
    shutil.rmtree(os.path.join(work_dir, "segments"))
    mpath = os.path.join(work_dir, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["segments"]["status"] = "pending"
    with open(mpath, "w") as f:
        json.dump(m, f)

    before_docs = _mtimes(work_dir, "docs")
    before_postings = _mtimes(work_dir, "postings")
    IndexBuildPipeline(
        spark, corpus_df(spark, 80), work_dir,
        IndexConfig(bm25=PARAMS, n_shards=3), source_fingerprint="corpus80-v1",
    ).run()
    assert _mtimes(work_dir, "docs") == before_docs        # upstream skipped
    assert _mtimes(work_dir, "postings") == before_postings
    assert _results(spark, work_dir) == want               # identical answers


def test_changed_input_invalidates_chain(spark, work_dir, tmp_path):
    d = str(tmp_path / "p2")
    shutil.copytree(work_dir, d)
    pipe = IndexBuildPipeline(
        spark, corpus_df(spark, 80), d,
        IndexConfig(bm25=PARAMS, n_shards=3),
        source_fingerprint="corpus80-v2-CHANGED",
    )
    before = _mtimes(d, "docs")
    pipe.run()
    assert _mtimes(d, "docs") != before  # fingerprint change forces rebuild
