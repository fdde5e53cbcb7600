"""The end-to-end corpus-curation pipeline: the composition a training
run actually consumes — text quality + language ID + near-dup removal
folded into one keep-list.

Each stage is one of the engine's own operators (textstats, dedup),
so everything stays declarative/candidate-driven and the DuckDB oracle
reproduces the exact keep-list (curation_sql.kept_docs_sql)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiser_spark.operators.dedup import minhash_lsh_dedup, near_dup_clusters
from wiser_spark.operators.textstats import language_id, quality_score


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, lang_pred, quality) for every KEPT document:

      * quality >= min_quality (rounded score, same both engines);
      * lang_pred in ``langs`` (None = keep all languages);
      * the document is its near-dup cluster's keeper (min doc_id of
        the MinHash-LSH verified component) — exact duplicates are a
        special case of jaccard 1.0 pairs, so they collapse too.
    """
    q = quality_score(docs, content_col).select("doc_id", "quality")
    lang = language_id(docs, content_col).select("doc_id", "lang_pred")
    pairs = minhash_lsh_dedup(
        docs, num_hashes=num_hashes, bands=bands, k=k,
        threshold=threshold, content_col=content_col,
    )
    keepers = near_dup_clusters(docs, pairs).filter(
        F.col("doc_id") == F.col("keeper_doc_id")
    ).select("doc_id")
    out = (
        q.join(lang, "doc_id")
        .join(keepers, "doc_id")
        .filter(F.col("quality") >= min_quality)
    )
    if langs is not None:
        out = out.filter(F.col("lang_pred").isin(list(langs)))
    return out.select("doc_id", "lang_pred", "quality")
