"""Text analysis for corpus curation: token counts, language ID, quality
scoring, document fingerprinting. All pure Catalyst expressions so the
DuckDB oracles reproduce every value exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiser_spark.functions.tokenize import tokens_col
from wiser_spark.operators.dedup import md5_long

# language marker regexes: deliberately simple word-boundary stopword
# alternations — a deterministic n-gram-style heuristic, not a model
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|un|una|por)\b",
    "fr": r"\b(le|la|les|des|une|est|dans|pour|avec|sur)\b",
    "de": r"\b(der|die|das|und|ist|von|mit|auf|ein|eine)\b",
}
CJK_REGEX = r"[一-鿿]"

STOPWORDS_EN = "the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by"


def token_counts(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_code_tokens, n_distinct_tokens).

    n_ws_tokens: whitespace-delimited chunks (BPE-ish upper bound);
    n_code_tokens: the engine tokenizer's count.
    """
    c = F.col(content_col)
    toks = tokens_col(c)
    return docs.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))).alias(
            "n_ws_tokens"
        ),
        F.size(toks).alias("n_code_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def language_id(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): argmax of marker-regex hit counts,
    CJK wins outright, ties broken by fixed language order, 'und' if no
    marker fires."""
    c = F.lower(F.col(content_col))
    hit_cols = {
        lang: F.regexp_count(c, F.lit(rx)).alias(f"hits_{lang}")
        for lang, rx in LANG_MARKERS.items()
    }
    cjk = F.regexp_count(c, F.lit(CJK_REGEX))
    out = docs.select("doc_id", cjk.alias("hits_cjk"), *hit_cols.values())
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_MARKERS])
    pred = F.when(F.col("hits_cjk") > 0, F.lit("zh"))
    for lang in LANG_MARKERS:  # fixed order = deterministic tie-break
        pred = pred.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        )
    pred = pred.otherwise(F.lit("und"))
    total = sum(F.col(f"hits_{lang}") for lang in LANG_MARKERS) + F.col("hits_cjk")
    return out.select("doc_id", pred.alias("lang_pred"), total.alias("lang_hits"))


def quality_score(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, len_score, punct_ratio, stopword_ratio, mean_token_len,
    quality): deterministic heuristic quality in [0, 1] — length band,
    low punctuation, some stopwords, sane token lengths."""
    c = F.col(content_col)
    n_chars = F.length(c).cast("double")
    toks = tokens_col(c)
    n_toks = F.size(toks).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    ).cast("double")
    n_stop = F.size(
        F.filter(
            F.split(F.lower(c), r"[^a-z0-9_]+"),
            lambda x: x.rlike(f"^({STOPWORDS_EN})$"),
        )
    ).cast("double")
    mean_tok = F.when(
        n_toks > 0,
        F.aggregate(
            toks, F.lit(0.0).cast("double"), lambda a, t: a + F.length(t)
        ) / n_toks,
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / 500.0, F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(0.0)
    tok_len_score = F.when(
        (mean_tok >= 2.0) & (mean_tok <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    quality = (
        0.4 * len_score
        + 0.2 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.2 * tok_len_score
    )
    return docs.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprint_docs(
    docs: DataFrame, k: int = 5, content_col: str = "content"
) -> DataFrame:
    """(doc_id, fingerprint): winnowing-style document fingerprint = the
    MINIMUM 60-bit hash over all token k-grams (k-gram rolling-hash
    family; md5-based so SQL reproduces it). Short docs (< k tokens)
    hash the whole token string."""
    toks = tokens_col(F.col(content_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i + 1, k)
        ),
    )
    gram_hashes = F.transform(grams, lambda g: md5_long(g))
    return docs.select(
        "doc_id", F.array_min(gram_hashes).alias("fingerprint")
    )
