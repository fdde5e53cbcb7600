"""Incremental index maintenance via Structured Streaming.

The reference index is append-only by construction (docIDs strictly
increase, deletes/updates don't exist — ``posting_list_delta.h:412-415``),
which maps exactly onto a streaming micro-batch model: each batch of new
documents gets the next dense docID range, its postings become a new
GENERATION of delta segments appended to the segment table (the Lucene
segment-per-flush pattern), and doc stats accumulate. Queries merge all
generations per (shard, term) — SegmentIndex handles that natively.

Query-time global stats (N, avgdl, df) shift as documents arrive; the
engine recomputes them from the accumulated docstats/dictionary tables at
query time, so results always reflect the ingested prefix exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from wiser_spark.config import IndexConfig
from wiser_spark.operators.docstats import build_docstats
from wiser_spark.operators.postings import build_postings
from wiser_spark.operators.segments import build_segments


class IncrementalIndexer:
    """foreachBatch sink: appends one segment generation per micro-batch."""

    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        order_cols=("repo", "path", "commit"),
        content_col: str = "content",
    ):
        self.index_dir = index_dir
        self.config = config or IndexConfig()
        self.order_cols = list(order_cols)
        self.content_col = content_col

    # -- docID state: next id = rows ingested so far (dense, append-only)
    def _next_doc_id(self, spark: SparkSession) -> int:
        path = f"{self.index_dir}/docstats"
        try:
            return spark.read.parquet(path).count()
        except Exception:
            return 0

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        offset = self._next_doc_id(spark)
        from pyspark.sql import Window

        # batches are micro-sized: a window over the batch is fine; IDs
        # continue the dense sequence from the previous generation
        w = Window.orderBy(*self.order_cols)
        docs = batch.withColumn(
            "doc_id", (F.row_number().over(w) - 1 + offset).cast("long")
        )
        postings = build_postings(docs, content_col=self.content_col)
        docstats = build_docstats(docs, content_col=self.content_col)
        segs = build_segments(postings, self.config.n_shards).withColumn(
            "generation", F.lit(batch_id)
        )
        segs.write.mode("append").partitionBy("shard_id").parquet(
            f"{self.index_dir}/segments"
        )
        docstats.select("doc_id", "doclen", "doclen_char").write.mode(
            "append"
        ).parquet(f"{self.index_dir}/docstats")
        postings.groupBy("term").agg(
            F.count("*").cast("int").alias("df")
        ).withColumn("generation", F.lit(batch_id)).write.mode("append").parquet(
            f"{self.index_dir}/dictionary_deltas"
        )
        self._refresh_meta(spark)

    def _refresh_meta(self, spark: SparkSession) -> None:
        stats = spark.read.parquet(f"{self.index_dir}/docstats").agg(
            F.count("*").alias("n"),
            F.avg(F.col("doclen").cast("double")).alias("avgdl"),
        ).collect()[0]
        # fold delta dictionaries into the queryable (term, df) table
        spark.read.parquet(f"{self.index_dir}/dictionary_deltas").groupBy(
            "term"
        ).agg(F.sum("df").cast("int").alias("df")).write.mode(
            "overwrite"
        ).parquet(f"{self.index_dir}/dictionary")
        meta = {
            "n_docs": int(stats["n"]),
            "avgdl": float(stats["avgdl"]),
            "n_shards": self.config.n_shards,
            "k1": self.config.bm25.k1,
            "b": self.config.bm25.b,
            "format": "wiser-spark-segment-v1",
            "streaming": True,
        }
        os.makedirs(self.index_dir, exist_ok=True)
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
):
    """File-source streaming build: new parquet files under ``input_dir``
    are ingested exactly-once (Structured Streaming checkpointing) into
    the index at ``index_dir``. Returns the StreamingQuery."""
    indexer = IncrementalIndexer(index_dir, config, order_cols, content_col)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(indexer.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
