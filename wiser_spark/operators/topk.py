"""Query processors: single-term / conjunctive / phrase BM25 top-k.

The relational formulation of the reference's read path
(``query_processing.h:956-979`` dispatch; zig-zag intersection
``:742-763, 810-852``; phrase adjusted-position intersect ``:170-382``;
BM25 + strict-`>` heap ``scoring.h`` / ``:588-603``):

* term lookup      -> filter postings on the term (predicate pushed to
                      the scan; with term-bucketed segments this prunes
                      files), broadcast-join the 1-row dictionary slice
* k-way conjunction-> inner joins on doc_id between per-term slices —
                      Catalyst picks sort-merge/broadcast and AQE fixes
                      skew at runtime; the smallest list drives the probe
* phrase predicate -> chained array_intersect of (positions_i - i),
                      match iff non-empty (score stays plain BM25 — a
                      phrase match only gates inclusion,
                      ``query_processing.h:886-895``)
* BM25             -> pure JVM column math on the LOSSY decoded length
* top-k            -> orderBy(score desc, doc_id asc).limit(k), compiled
                      to TakeOrderedAndProject (per-partition heaps + a
                      k-row merge — no global sort), with the same tie
                      bias as the reference heap (earliest docIDs kept)

Any query term absent from the index yields an empty result naturally:
its slice has no rows and the inner join annihilates the query (AND
semantics, reference ``qq_mem_engine.h:345-347``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiser_spark.config import BM25Params
from wiser_spark.operators.docstats import CorpusStats


def _idf_col(n_docs: int, df_col):
    return F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def _tfnorm_col(tf_col, lossy_len_col, avgdl: float, p: BM25Params):
    denom_tail = p.k1 * (1.0 - p.b + (p.b * lossy_len_col.cast("double")) / avgdl)
    return (tf_col.cast("double") * (p.k1 + 1.0)) / (tf_col.cast("double") + denom_tail)


def bm25_topk(
    postings: DataFrame,
    docstats: DataFrame,
    dictionary: DataFrame,
    stats: CorpusStats,
    terms: list[str],
    k: int = 10,
    params: BM25Params | None = None,
    is_phrase: bool = False,
) -> DataFrame:
    """Top-k BM25 answer -> DataFrame (rank, doc_id, score).

    ``postings`` needs (term, doc_id, tf[, positions]); ``docstats`` needs
    (doc_id, doclen_lossy); ``dictionary`` needs (term, df).
    """
    params = params or BM25Params()
    spark = postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")

    joined = None
    for i, term in enumerate(terms):
        cols = [F.col("doc_id"), F.col("tf").alias(f"tf_{i}"), F.col("df").alias(f"df_{i}")]
        if is_phrase:
            cols.append(F.col("positions").alias(f"pos_{i}"))
        slice_i = (
            postings.filter(F.col("term") == term)
            .join(F.broadcast(dictionary.filter(F.col("term") == term)), "term")
            .select(*cols)
        )
        joined = slice_i if joined is None else joined.join(slice_i, "doc_id")

    if is_phrase and len(terms) > 1:
        def _shift_by(col_name: str, amount: int):
            # NB: F.transform treats a 2-arg lambda as (element, index) —
            # capture `amount` in a closure, keep the lambda unary.
            return F.transform(F.col(col_name), lambda x: x - F.lit(amount))

        inter = F.col("pos_0")
        for i in range(1, len(terms)):
            inter = F.array_intersect(inter, _shift_by(f"pos_{i}", i))
        joined = joined.filter(F.size(inter) > 0)

    scored = joined.join(docstats.select("doc_id", "doclen_lossy"), "doc_id")
    score = None
    for i in range(len(terms)):
        contrib = _idf_col(stats.n_docs, F.col(f"df_{i}")) * _tfnorm_col(
            F.col(f"tf_{i}"), F.col("doclen_lossy"), stats.avgdl, params
        )
        score = contrib if score is None else score + contrib

    top = (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    # rank over <= k rows — the single-partition window is k-row tiny
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


def bm25_topk_batch(
    postings: DataFrame,
    docstats: DataFrame,
    dictionary: DataFrame,
    stats: CorpusStats,
    queries: list[tuple[int, list[str], bool]],
    k: int = 10,
    params: BM25Params | None = None,
) -> DataFrame:
    """Answer a WHOLE query log in one job -> (query_id, rank, doc_id,
    score). This is where QPS comes from: per-query Spark jobs pay fixed
    scheduling latency; batching amortizes it into one plan per query
    SHAPE (term count × phrase flag), with the query set broadcast into
    the posting joins and the per-query top-k done by a window
    partitioned on query_id (parallel across queries)."""
    params = params or BM25Params()
    spark = postings.sparkSession
    from pyspark.sql import Window

    out_schema = "query_id int, rank int, doc_id long, score double"
    results = []
    by_shape: dict[tuple[int, bool], list[tuple[int, list[str]]]] = {}
    for qid, terms, is_phrase in queries:
        if terms:
            by_shape.setdefault((len(terms), bool(is_phrase)), []).append(
                (qid, terms)
            )

    for (n, is_phrase), qs in by_shape.items():
        use_phrase = is_phrase and n > 1
        qrows = [(qid, *terms) for qid, terms in qs]
        qdf = spark.createDataFrame(
            qrows, ", ".join(["query_id int"] + [f"t{i} string" for i in range(n)])
        )
        joined = None
        for i in range(n):
            qslice = qdf.select("query_id", F.col(f"t{i}").alias("term"))
            cols = [
                F.col("query_id"), F.col("doc_id"),
                F.col("tf").alias(f"tf_{i}"), F.col("df").alias(f"df_{i}"),
            ]
            if use_phrase:
                cols.append(F.col("positions").alias(f"pos_{i}"))
            slice_i = (
                postings.join(F.broadcast(qslice), "term")
                .join(F.broadcast(dictionary), "term")
                .select(*cols)
            )
            joined = (
                slice_i if joined is None
                else joined.join(slice_i, ["query_id", "doc_id"])
            )
        if use_phrase:
            def _shift_by(col_name: str, amount: int):
                return F.transform(F.col(col_name), lambda x: x - F.lit(amount))

            inter = F.col("pos_0")
            for i in range(1, n):
                inter = F.array_intersect(inter, _shift_by(f"pos_{i}", i))
            joined = joined.filter(F.size(inter) > 0)

        scored = joined.join(docstats.select("doc_id", "doclen_lossy"), "doc_id")
        score = None
        for i in range(n):
            contrib = _idf_col(stats.n_docs, F.col(f"df_{i}")) * _tfnorm_col(
                F.col(f"tf_{i}"), F.col("doclen_lossy"), stats.avgdl, params
            )
            score = contrib if score is None else score + contrib
        # TWO-PHASE top-k (the skew fix): a window partitioned on
        # query_id alone funnels every match of a high-df query through
        # ONE partition's sort. Phase 1 ranks within (query_id, salt) —
        # a hot query spreads over n_salts partitions, each emitting at
        # most k rows — so the phase-2 query_id window sorts <= k*n_salts
        # rows per query instead of the full match set. Same result:
        # the global top-k is contained in the union of per-salt top-k,
        # and both phases share the (score desc, doc_id asc) tie order.
        n_salts = 16
        w_local = Window.partitionBy("query_id", "salt").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        pre = (
            scored.select("query_id", "doc_id", score.alias("score"))
            .withColumn("salt", F.pmod(F.col("doc_id"), F.lit(n_salts)).cast("int"))
            .withColumn("lrank", F.row_number().over(w_local))
            .filter(F.col("lrank") <= k)
        )
        results.append(
            pre.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )

    if not results:
        return spark.createDataFrame([], out_schema)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
