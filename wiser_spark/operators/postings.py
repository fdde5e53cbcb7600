"""Index build path: docID assignment, postings, dictionary.

All declarative DataFrame ops — tokenization is a JVM regexp expression
(whole-stage codegen), postings come from ``posexplode`` + ``groupBy``.
The reference does this single-threaded per document
(``qq_mem_engine.h:194-215``); here it is a map + one shuffle on
(term, doc_id), the natural distributed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiser_spark.functions.tokenize import tokens_col

DEFAULT_ORDER = ("repo", "path", "commit")


def assign_doc_ids(
    df: DataFrame, order_cols=DEFAULT_ORDER, n_partitions: int | None = None
) -> DataFrame:
    """Dense, deterministic docIDs: global rank over a total order.

    Mirrors the reference's sequential ``NextDocId``
    (``qq_mem_engine.h:444-446``) with a deterministic total order on
    ``order_cols`` so ranks are reproducible under any parallelism.

    SCALE NOTE: a bare ``row_number() over (order by ...)`` collapses to a
    single partition. Instead: range-repartition + local sort (a normal
    distributed sort), count rows per partition (one tiny action), then
    add the per-partition base offset to a partition-local row_number —
    every step is parallel; the driver only sees one int per partition.
    """
    order_cols = list(order_cols)
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    sorted_df = df.repartitionByRange(n_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # persist so the pid->count map and the final pass see the SAME
    # partitioning (range boundaries come from sampling; pinning the
    # materialized layout removes any recompute nondeterminism)
    with_pid = sorted_df.withColumn("_pid", F.spark_partition_id()).persist()
    # one tiny action: n_partitions rows of (pid, count)
    counts = {
        r["_pid"]: r["count"] for r in with_pid.groupBy("_pid").count().collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn(
            "doc_id",
            (F.row_number().over(local) - 1 + offset_map[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )


def build_postings(
    docs: DataFrame, with_positions: bool = True, content_col: str = "content"
) -> DataFrame:
    """(term, doc_id, tf[, positions]) from a docID'd corpus.

    tf = occurrence count of the term in the token list (= number of
    offset pairs in the reference, ``qq_mem_engine.h:212``); positions
    are 0-based token indexes, ascending.
    """
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col(content_col))).alias("pos", "term")
    )
    aggs = [F.count("*").cast("int").alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return toks.groupBy("term", "doc_id").agg(*aggs)


def build_postings_arrow(
    docs: DataFrame, with_positions: bool = True, content_col: str = "content"
) -> DataFrame:
    """Shuffle-free posting construction (the build-path fast lane).

    A document's postings depend only on that document, so grouping by
    (term, doc_id) needs NO shuffle — this tokenizes and groups inside
    one Arrow-batched mapInPandas pass (the reference's offline-analyzer
    stage S3, ``scripts/tokenize_wiki_linedoc.py``, as a vectorized UDF).
    Output is identical to build_postings() (differential-tested); use
    that one when a pure-Catalyst lineage is wanted, this one for bulk
    builds where the 1-row-per-token explode shuffle would dominate.
    """
    import pandas as pd

    from wiser_spark.functions.tokenize import tokenize_series

    schema = (
        "term string, doc_id long, tf int, positions array<int>"
        if with_positions
        else "term string, doc_id long, tf int"
    )

    def run(batches):
        for pdf in batches:
            token_lists = tokenize_series(pdf[content_col])
            terms, ids, tfs, poss = [], [], [], []
            for doc_id, tokens in zip(pdf["doc_id"], token_lists):
                groups: dict[str, list[int]] = {}
                for pos, tok in enumerate(tokens):
                    groups.setdefault(tok, []).append(pos)
                for tok, positions in groups.items():
                    terms.append(tok)
                    ids.append(doc_id)
                    tfs.append(len(positions))
                    if with_positions:
                        poss.append(positions)
            out = {"term": terms, "doc_id": ids, "tf": tfs}
            if with_positions:
                out["positions"] = poss
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema)


def build_dictionary(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term (posting-list size, the
    reference's ``Size()`` used for idf, ``query_processing.h:544-548``)."""
    return postings.groupBy("term").agg(F.count("*").cast("int").alias("df"))
