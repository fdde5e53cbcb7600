"""Snippet highlighting for top-k results (reference Q13,
``highlighter.h:297-453``: sentence-broken passages, matched terms
wrapped in <b>...</b>, top n_passages per doc).

Simplified Spark rendition: passages are newline/sentence-broken chunks
of the content; a passage scores by the count of distinct query terms it
contains (the reference scores passages BM25-like — this keeps the same
shape: per-passage score -> top-n passages -> bold the matches). Pure
correctness garnish: never affects ranking, which is why the reference's
own tests treat snippets separately (``tests_15.cc``)."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiser_spark.functions.tokenize import tokenize_text

HIGHLIGHT_SCHEMA = "doc_id long, snippet string"


def _passages(content: str) -> list[str]:
    parts = re.split(r"(?<=[.!?])\s+|\n+", content)
    return [p for p in parts if p.strip()]


def _highlight_one(content: str, terms: set[str], n_passages: int) -> str:
    scored = []
    for i, p in enumerate(_passages(content)):
        hits = sum(1 for t in set(tokenize_text(p)) if t in terms)
        if hits:
            scored.append((-hits, i, p))
    scored.sort()
    chosen = [p for _, _, p in scored[:n_passages]]
    pattern = re.compile(
        r"(?i)\b(" + "|".join(re.escape(t) for t in sorted(terms)) + r")\b"
    )
    return "…".join(pattern.sub(r"<b>\1</b>", p) for p in chosen)


def highlight(
    docs: DataFrame,
    topk: DataFrame,
    terms: list[str],
    n_passages: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, snippet) for every doc in ``topk`` — the join pulls only
    the k result docs' content (broadcast the k-row side), then an Arrow
    batch UDF builds snippets."""
    term_set = {t.lower() for t in terms}
    hits = docs.join(
        F.broadcast(topk.select("doc_id")), "doc_id"
    ).select("doc_id", content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "snippet": [
                        _highlight_one(c, term_set, n_passages)
                        for c in pdf[content_col]
                    ],
                }
            )

    return hits.mapInPandas(run, HIGHLIGHT_SCHEMA)
