"""Incremental index maintenance via Structured Streaming.

The reference index is append-only by construction (docIDs strictly
increase, deletes/updates don't exist — ``posting_list_delta.h:412-415``),
which maps exactly onto a streaming micro-batch model: each batch of new
documents gets the next dense docID range, its postings become a new
GENERATION of delta segments appended to the segment table (the Lucene
segment-per-flush pattern), and doc stats accumulate. Queries merge all
generations per (shard, term) — SegmentIndex handles that natively.

EXACTLY-ONCE: foreachBatch alone only guarantees at-least-once, so the
sink is made idempotent:

  * a COMMIT LOG (``commits.json``, written atomically via tmp+rename)
    records every committed batch_id together with its docID range;
    a replayed batch_id is skipped outright;
  * each batch's outputs are written to ``_staging/<batch_id>/`` first
    and then renamed into ``<table>/generation=<batch_id>/`` — one
    atomic rename per table. A crash mid-commit leaves at most a
    half-moved generation that the retry REPLACES with byte-identical
    data (docIDs come from the commit log, not from counting rows, so
    the retry is deterministic);
  * the docID offset is the committed ranges' end — never a count of
    possibly-partially-committed files (the round-1 bug where a
    transient read error restarted docIDs at 0 cannot occur: nothing
    here swallows exceptions).

Query-time global stats (N, avgdl, df) shift as documents arrive; the
engine recomputes them from the accumulated docstats/dictionary tables at
query time, so results always reflect the ingested prefix exactly.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from wiser_spark.config import IndexConfig
from wiser_spark.operators.docstats import build_docstats
from wiser_spark.operators.postings import build_postings
from wiser_spark.operators.segments import build_segments, prefetch_pages_col

_TABLES = ("segments", "docstats", "dictionary_deltas")


class IncrementalIndexer:
    """foreachBatch sink: appends one segment generation per micro-batch,
    idempotently (see module docstring)."""

    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        order_cols=("repo", "path", "commit"),
        content_col: str = "content",
        fmt: str = "v1",
        with_blooms: bool = True,
        compact_every: int | None = None,
    ):
        """``fmt="v1"``: shuffle-built generations + docstats table (the
        original streaming layout). ``fmt="v2"``: each generation is
        built with the ZERO-SHUFFLE map-side encoder — sentinel
        doc-length rows and both bloom sides ride inside the segment
        table, no docstats table exists, and ``compact_index`` merges
        the generations (sentinels and blooms included) into the same
        single-generation layout a batch map-side build writes.

        ``compact_every``: the TIERED AUTO-COMPACTION trigger — a
        long-running stream otherwise accumulates one generation per
        micro-batch and every query merges them per (shard, term)
        forever. When the segment table holds MORE than this many
        generations after a commit, they merge in place into one
        (``compact_segments`` — sentinels, both bloom sides, and the
        dictionary deltas included). None (default) disables it."""
        if fmt not in ("v1", "v2"):
            raise ValueError(f"unknown streaming index format: {fmt}")
        # resuming an existing index with the OTHER format would corrupt
        # it silently (v1 generations carry no doc-length sentinels and
        # contribute zero to the v2 avgdl fold) — refuse loudly
        try:
            with open(f"{index_dir}/stats.json") as f:
                existing = json.load(f).get("format", "")
        except (FileNotFoundError, json.JSONDecodeError):
            existing = ""
        if existing and not existing.startswith(f"wiser-spark-segment-{fmt}"):
            raise ValueError(
                f"index at {index_dir!r} has format {existing!r}; "
                f"cannot resume it with fmt={fmt!r}"
            )
        self.index_dir = index_dir
        self.config = config or IndexConfig()
        self.order_cols = list(order_cols)
        self.content_col = content_col
        self.fmt = fmt
        self.with_blooms = with_blooms
        self.compact_every = compact_every

    # ------------------------------------------------------- commit log
    @property
    def _commit_path(self) -> str:
        return f"{self.index_dir}/commits.json"

    def _read_commits(self) -> dict[str, list[int]]:
        """{batch_id(str): [doc_id_start, n_docs]} for committed batches."""
        try:
            with open(self._commit_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _append_commit(
        self, commits: dict, batch_id: int, start: int, n: int,
        lensum: int | None = None,
    ):
        # v1 entries: [start, n]; v2 adds the batch's summed doc length
        # (avgdl bookkeeping — v2 has no docstats table to average over)
        commits[str(batch_id)] = (
            [start, n] if lensum is None else [start, n, lensum]
        )
        tmp = self._commit_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f)
        os.replace(tmp, self._commit_path)  # atomic on POSIX

    # ---------------------------------------------------------- the sink
    def process_batch(
        self, batch: DataFrame, batch_id: int, refresh_meta: bool = True
    ) -> None:
        spark = batch.sparkSession
        os.makedirs(self.index_dir, exist_ok=True)
        self._recover_compaction()
        commits = self._read_commits()
        if str(batch_id) in commits:
            # at-least-once replay of a committed batch: a no-op (but
            # make sure the queryable metadata exists)
            if not os.path.exists(f"{self.index_dir}/stats.json"):
                self._refresh_meta(spark)
            return
        if batch.isEmpty():
            self._append_commit(commits, batch_id, self._next_doc_id(commits), 0)
            return
        offset = self._next_doc_id(commits)
        # dense IDs continue the committed sequence; assignment uses the
        # distributed range-partition scheme (assign_doc_ids), NOT a
        # bare window — a resumable BATCH build feeds whole corpus
        # slices through this sink, and a single-partition
        # row_number() over a 10^9-doc batch is the exact anti-pattern
        # assign_doc_ids exists to avoid. Same deterministic total
        # order on order_cols, so micro-batches get identical ids.
        from wiser_spark.operators.postings import assign_doc_ids

        docs = assign_doc_ids(batch, self.order_cols, checkpoint=True).withColumn(
            "doc_id", (F.col("doc_id") + F.lit(offset)).cast("long")
        )
        n_docs = docs.count()
        staging = f"{self.index_dir}/_staging/{batch_id}"
        lensum = None
        if self.fmt == "v2":
            from wiser_spark.functions.tokenize import doclen_col
            from wiser_spark.operators.mapside import build_segments_mapside
            from wiser_spark.operators.segments import SEGMENT_SCHEMA

            segs = build_segments_mapside(
                docs, self.config.n_shards, self.content_col,
                with_blooms=self.with_blooms,
            )
            segs.write.mode("overwrite").partitionBy("shard_id").parquet(
                f"{staging}/segments"
            )
            # dictionary delta from the STAGED rows (plain term rows
            # only) — no second tokenize pass over the batch
            staged = spark.read.schema(SEGMENT_SCHEMA).parquet(
                f"{staging}/segments"
            )
            from wiser_spark.operators.segments import (
                dictionary_from_segments,
            )

            dictionary_from_segments(staged).select(
                "term", "df", "bytes_docid_tf"
            ).write.mode("overwrite").parquet(f"{staging}/dictionary_deltas")
            # running avgdl bookkeeping rides in the commit log (no
            # docstats table in v2 — sentinels carry per-doc lengths)
            lensum = int(
                docs.agg(
                    F.sum(doclen_col(F.col(self.content_col)).cast("long"))
                ).collect()[0][0]
                or 0
            )
            tables = ("segments", "dictionary_deltas")
        else:
            postings = build_postings(docs, content_col=self.content_col)
            docstats = build_docstats(docs, content_col=self.content_col)
            build_segments(postings, self.config.n_shards).write.mode(
                "overwrite"
            ).partitionBy("shard_id").parquet(f"{staging}/segments")
            docstats.select("doc_id", "doclen", "doclen_char").write.mode(
                "overwrite"
            ).parquet(f"{staging}/docstats")
            postings.groupBy("term").agg(
                F.count("*").cast("int").alias("df")
            ).write.mode("overwrite").parquet(f"{staging}/dictionary_deltas")
            tables = _TABLES

        # atomic per-table publish: generation=<id> partition dirs. A
        # leftover from a crashed attempt of this SAME batch is replaced
        # (it was never committed; the retry produced identical data).
        for table in tables:
            dst = f"{self.index_dir}/{table}/generation={batch_id}"
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.rename(f"{staging}/{table}", dst)
        shutil.rmtree(staging, ignore_errors=True)
        self._append_commit(commits, batch_id, offset, n_docs, lensum)
        # refresh_meta=False defers the vocabulary-sized dictionary fold
        # (the batched build refreshes ONCE after its last batch instead
        # of refolding every accumulated generation per batch) — and
        # likewise defers auto-compaction to the caller's final refresh
        if refresh_meta:
            self._maybe_compact(spark)
            self._refresh_meta(spark)

    # ------------------------------------------------- auto-compaction
    def _generations(self, table: str = "segments") -> list[int]:
        """Committed generation ids present in a table directory."""
        try:
            return sorted(
                int(p.split("=", 1)[1])
                for p in os.listdir(f"{self.index_dir}/{table}")
                if p.startswith("generation=")
            )
        except FileNotFoundError:
            return []

    def _recover_compaction(self) -> None:
        """Heal a compaction interrupted mid-swap. Per-table state
        machine: ``<table>.gc`` holding the pre-swap data exists only
        during the two-rename window — if the live table is present the
        swap completed (drop the backup), if it is missing the swap was
        interrupted (roll the backup forward... i.e. back; the
        compaction simply retriggers later). A PARTIAL multi-table swap
        is query-consistent either way: the dictionary fold and the
        per-(shard, term) merge are both generation-agnostic."""
        for table in _TABLES:
            cur = f"{self.index_dir}/{table}"
            gc = cur + ".gc"
            if os.path.exists(gc):
                if os.path.exists(cur):
                    shutil.rmtree(gc)
                else:
                    os.rename(gc, cur)
        shutil.rmtree(
            f"{self.index_dir}/_staging/compact", ignore_errors=True
        )

    def _maybe_compact(self, spark: SparkSession) -> None:
        if not self.compact_every:
            return
        if len(self._generations()) > self.compact_every:
            self.compact_now(spark)

    def compact_now(self, spark: SparkSession) -> None:
        """Merge every accumulated generation into ONE, in place: the
        streaming analogue of the reference's qq->vacuum conversion
        (B18) run as maintenance. The merged data lands as generation
        <max committed id> (future micro-batch ids are strictly
        larger), each table swaps in atomically with a rollback backup
        (see ``_recover_compaction``), and queries before/after are
        rank-identical (pinned by test_streaming)."""
        from wiser_spark.operators.segments import compact_segments

        gens = self._generations()
        if len(gens) <= 1:
            return
        g = gens[-1]
        staging = f"{self.index_dir}/_staging/compact"
        shutil.rmtree(staging, ignore_errors=True)
        try:
            with open(f"{self.index_dir}/stats.json") as f:
                nbytes = (json.load(f).get("bloom") or {}).get("nbytes")
        except (FileNotFoundError, json.JSONDecodeError):
            nbytes = None
        segs = spark.read.parquet(f"{self.index_dir}/segments")
        compact_segments(segs, nbytes).write.mode("overwrite").partitionBy(
            "shard_id"
        ).parquet(f"{staging}/segments/generation={g}")
        # fold the delta dictionaries too, so _refresh_meta stays a
        # bounded read no matter how long the stream runs (v1 deltas
        # read null bytes_docid_tf -> null, same as the meta fold)
        (
            spark.read.schema("term string, df int, bytes_docid_tf long")
            .parquet(f"{self.index_dir}/dictionary_deltas")
            .groupBy("term")
            .agg(
                F.sum("df").cast("int").alias("df"),
                F.sum("bytes_docid_tf").cast("long").alias("bytes_docid_tf"),
            )
            .write.mode("overwrite")
            .parquet(f"{staging}/dictionary_deltas/generation={g}")
        )
        # docstats (v1) is a flat per-doc table: generations add no
        # query-time merge cost, so it is left as-is
        for table in ("segments", "dictionary_deltas"):
            cur = f"{self.index_dir}/{table}"
            gc = cur + ".gc"
            os.rename(cur, gc)
            os.rename(f"{staging}/{table}", cur)
            shutil.rmtree(gc)
        shutil.rmtree(staging, ignore_errors=True)

    def _next_doc_id(self, commits: dict) -> int:
        """Dense append-only docIDs: the end of the committed ranges."""
        return max((v[0] + v[1] for v in commits.values()), default=0)

    def _refresh_meta(self, spark: SparkSession) -> None:
        if self.fmt == "v2":
            # N and avgdl from the commit log's [start, n, lensum] rows
            commits = self._read_commits()
            n_docs = sum(v[1] for v in commits.values())
            lensum = sum((v[2] if len(v) > 2 else 0) for v in commits.values())
            avgdl = (lensum / n_docs) if n_docs else 1.0
        else:
            stats = spark.read.parquet(f"{self.index_dir}/docstats").agg(
                F.count("*").alias("n"),
                F.avg(F.col("doclen").cast("double")).alias("avgdl"),
            ).collect()[0]
            n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
        # fold delta dictionaries into the queryable table; v1 deltas
        # lack bytes_docid_tf (reads null -> null pages -> full decode)
        (
            spark.read.schema("term string, df int, bytes_docid_tf long")
            .parquet(f"{self.index_dir}/dictionary_deltas")
            .groupBy("term")
            .agg(
                F.sum("df").cast("int").alias("df"),
                F.sum("bytes_docid_tf").cast("long").alias("bytes_docid_tf"),
            )
            .withColumn("prefetch_pages", prefetch_pages_col())
            .write.mode("overwrite")
            .parquet(f"{self.index_dir}/dictionary")
        )
        meta = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_terms": spark.read.parquet(
                f"{self.index_dir}/dictionary"
            ).count(),
            "n_shards": self.config.n_shards,
            "k1": self.config.bm25.k1,
            "b": self.config.bm25.b,
            "format": f"wiser-spark-segment-{self.fmt}"
            + ("-mapside" if self.fmt == "v2" else ""),
            "streaming": True,
        }
        if self.fmt == "v2":
            meta["doclen_sentinel"] = True
            if self.with_blooms:
                from wiser_spark.functions.bloom import bloom_params

                meta["bloom"] = bloom_params()._asdict()
        with open(f"{self.index_dir}/stats.json", "w") as f:
            json.dump(meta, f, indent=1)


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    config: IndexConfig | None = None,
    order_cols=("repo", "path", "commit"),
    content_col: str = "content",
    fmt: str = "v1",
    compact_every: int | None = None,
):
    """File-source streaming build: new parquet files under ``input_dir``
    are ingested exactly-once (Structured Streaming checkpointing + the
    idempotent commit-log sink) into the index at ``index_dir``. Returns
    the StreamingQuery. ``fmt="v2"`` writes zero-shuffle map-side
    generations (sentinels + blooms in the segment table)."""
    indexer = IncrementalIndexer(index_dir, config, order_cols, content_col,
                                 fmt=fmt, compact_every=compact_every)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(indexer.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
