"""The end-to-end index build pipeline, staged + checkpointed + resumable.

Stages (each writes parquet under work_dir and records a manifest entry;
the distributed analogue of the reference's two-pass build,
``tools/indexer.py:13-38`` -> ``convert_qq_to_vacuum.cc:22-37``):

  docs       read input table -> deterministic dense docIDs
  postings   tokenize + explode + groupBy(term, doc_id)
  docstats   doc lengths (+ lossy byte) + sha256 invariant
  dictionary term -> global df
  segments   shard + encode posting blobs (the "merge" shuffle: the
             reference's single-node qq->vacuum conversion becomes a
             repartition by (shard, term) + partition-local encode)

Re-running skips every stage whose input fingerprint is unchanged, so a
killed build resumes where it stopped. Fingerprints chain: stage N's
input fingerprint includes stage N-1's output fingerprint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from wiser_spark.config import IndexConfig
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import (
    DEFAULT_ORDER,
    assign_doc_ids,
    build_dictionary,
    build_postings,
)
from wiser_spark.operators.segments import build_segments
from wiser_spark.plans.manifest import (
    Manifest,
    StageEntry,
    StageTimer,
    dir_lineage,
    fingerprint,
)


def _source_lineage_fp(source: DataFrame) -> str:
    """Default source fingerprint: input FILE LINEAGE (paths + size +
    mtime) plus the schema — so resuming over changed data with an
    unchanged schema re-runs the docs stage instead of silently serving
    a stale index. For non-file sources (no lineage available) it falls
    back to the schema string; pass an explicit source_fingerprint for
    those if the data can change."""
    entries = [source.schema.simpleString()]
    for uri in sorted(source.inputFiles()):
        path = uri.removeprefix("file:")
        try:
            st = os.stat(path)
            entries.append(f"{uri}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            entries.append(uri)
    return fingerprint(*entries)


class IndexBuildPipeline:
    def __init__(
        self,
        spark: SparkSession,
        source: DataFrame,
        work_dir: str,
        config: IndexConfig | None = None,
        order_cols=DEFAULT_ORDER,
        source_fingerprint: str = "",
        content_col: str = "content",
    ):
        self.spark = spark
        self.source = source
        self.work_dir = work_dir
        self.config = config or IndexConfig()
        self.order_cols = list(order_cols)
        self.content_col = content_col
        self.source_fingerprint = source_fingerprint or _source_lineage_fp(source)
        self.manifest = Manifest(work_dir)

    # ------------------------------------------------------------ stages
    def _out(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def _run_stage(self, stage: str, input_fp: str, write_fn) -> str:
        """Run or skip one stage; returns its output fingerprint."""
        if self.manifest.can_skip(stage, input_fp):
            return self.manifest.fingerprint_of(stage)
        out_dir = self._out(stage)
        with StageTimer() as t:
            write_fn(out_dir)
        rows = self.spark.read.parquet(out_dir).count()  # footer-only count
        files, total_bytes = dir_lineage(out_dir)
        out_fp = fingerprint(stage, input_fp, rows, total_bytes)
        self.manifest.record(
            StageEntry(
                stage=stage, status="complete", input_fingerprint=input_fp,
                output_fingerprint=out_fp, rows=rows, bytes=total_bytes,
                wall_s=t.wall_s, files=files,
            )
        )
        return out_fp

    def run(self) -> Manifest:
        cfg = self.config
        fp0 = fingerprint("docs", self.source_fingerprint, self.order_cols)

        def write_docs(d):
            # a source that already carries doc_id keeps it (the lake
            # assigned ids upstream); otherwise assign deterministically
            out = (
                self.source
                if "doc_id" in self.source.columns
                else assign_doc_ids(self.source, self.order_cols)
            )
            out.write.mode("overwrite").parquet(d)

        fp_docs = self._run_stage("docs", fp0, write_docs)
        docs = self.spark.read.parquet(self._out("docs"))

        fp_post = self._run_stage(
            "postings",
            fingerprint(
                "postings", fp_docs, cfg.with_positions, self.content_col
            ),
            lambda d: build_postings(
                docs, with_positions=cfg.with_positions,
                content_col=self.content_col,
            ).write.mode("overwrite").parquet(d),
        )
        postings = self.spark.read.parquet(self._out("postings"))

        fp_stats = self._run_stage(
            "docstats", fingerprint("docstats", fp_docs, self.content_col),
            lambda d: build_docstats(docs, content_col=self.content_col)
            .write.mode("overwrite").parquet(d),
        )
        docstats = self.spark.read.parquet(self._out("docstats"))

        self._run_stage(
            "dictionary", fingerprint("dictionary", fp_post),
            lambda d: build_dictionary(postings).write.mode("overwrite").parquet(d),
        )

        def write_segments(d):
            build_segments(postings, cfg.n_shards).write.mode(
                "overwrite"
            ).partitionBy("shard_id").parquet(d)

        self._run_stage(
            "segments",
            fingerprint("segments", fp_post, cfg.n_shards),
            write_segments,
        )

        # final queryable-index metadata (consumed by SegmentIndex)
        stats = corpus_stats(docstats)
        meta = {
            "n_docs": stats.n_docs, "avgdl": stats.avgdl,
            "n_shards": cfg.n_shards, "k1": cfg.bm25.k1, "b": cfg.bm25.b,
            "format": "wiser-spark-segment-v1",
        }
        with open(os.path.join(self.work_dir, "stats.json"), "w") as f:
            json.dump(meta, f, indent=1)
        _ = fp_stats
        return self.manifest
