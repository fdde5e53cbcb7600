"""Snippet highlighting for top-k results (reference Q13).

Faithful rendition of the reference's unified highlighter
(``highlighter.h:297-453``):

  * the document is broken into sentence passages;
  * each passage scores ``passage_norm(start) * sum_t tf_norm(tf_t,
    passage_len)`` with ``passage_norm(s) = 1 + 1/ln(pivot + s)`` and
    ``tf_norm(f, L) = f / (f + k1*((1-b) + b*L/pivot))``, pivot = 87,
    k1 = 1.2, b = 0.75 (``highlighter.h:437-450``);
  * the top ``n_passages`` passages by score are re-ordered by start
    offset and matched term occurrences are wrapped in <b>...</b>.

Matches come from the index's per-posting OFFSET PAIRS — not from
re-tokenizing the document (``query_processing.h:446-492``: phrase
queries filter offsets by matched positions first). The offsets are byte
spans into the LOWERED content; the token alphabet is ASCII so they map
1:1 onto the original content, which is what gets wrapped.

The standalone ``highlight()`` operator recomputes offsets from the
content (for use without an index); ``SegmentIndex.search(...,
return_snippets=True)`` feeds stored offsets through the same scorer.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference highlighter.h:437-450 (Lucene's average passage length)
PASSAGE_PIVOT = 87.0
PASSAGE_K1 = 1.2
PASSAGE_B = 0.75

HIGHLIGHT_SCHEMA = "doc_id long, snippet string"

_SENT_BREAK = re.compile(r"(?<=[.!?])\s+|\n+")


def passage_spans(content: str) -> list[tuple[int, int]]:
    """Sentence-broken passage [start, end) spans, blanks dropped."""
    spans, start = [], 0
    for m in _SENT_BREAK.finditer(content):
        if m.start() > start:
            spans.append((start, m.start()))
        start = m.end()
    if start < len(content):
        spans.append((start, len(content)))
    return [(s, e) for s, e in spans if content[s:e].strip()]


def _passage_norm(start: int) -> float:
    return 1.0 + 1.0 / math.log(PASSAGE_PIVOT + start)


def _tf_norm(freq: int, passage_len: int) -> float:
    norm = PASSAGE_K1 * (
        (1.0 - PASSAGE_B) + PASSAGE_B * (passage_len / PASSAGE_PIVOT)
    )
    return freq / (freq + norm)


def highlight_doc(
    content: str, per_term_offsets: list[list[int]], n_passages: int = 3
) -> str:
    """Score passages from per-term flat [s,e,...] match offsets; return
    the top-``n_passages`` passages (document order) with every match
    wrapped in <b>...</b>, joined by an ellipsis."""
    passages = passage_spans(content)
    scored = []
    for ps, pe in passages:
        score, hit = 0.0, False
        for offs in per_term_offsets:
            tf = sum(
                1
                for i in range(0, len(offs), 2)
                if ps <= offs[i] and offs[i + 1] <= pe
            )
            if tf:
                score += _tf_norm(tf, pe - ps)
                hit = True
        if hit:
            scored.append((-score * _passage_norm(ps), ps, pe))
    scored.sort()
    chosen = sorted((ps, pe) for _, ps, pe in scored[:n_passages])
    all_pairs = sorted(
        (offs[i], offs[i + 1])
        for offs in per_term_offsets
        for i in range(0, len(offs), 2)
    )
    out = []
    for ps, pe in chosen:
        buf, cur = [], ps
        for s, e in all_pairs:
            if s < ps or e > pe or s < cur:
                continue
            buf.append(content[cur:s])
            buf.append("<b>" + content[s:e] + "</b>")
            cur = e
        buf.append(content[cur:pe])
        out.append("".join(buf))
    return "…".join(out)


def _find_offsets(content: str, terms: list[str]) -> list[list[int]]:
    """Per-term flat [s,e,...] occurrence offsets by re-tokenization —
    the no-index path (token = maximal [a-z0-9_] run, exactly the
    engine tokenizer)."""
    low = content.lower()
    per_term: dict[str, list[int]] = {t: [] for t in terms}
    for m in re.finditer(r"[a-z0-9_]+", low):
        tok = m.group()
        if tok in per_term:
            per_term[tok].extend((m.start(), m.end()))
    return [per_term[t] for t in terms]


def _retokenize_snippet(content: str, terms: list[str], n_passages: int) -> str:
    """Re-tokenization fallback, length-safe: offsets are computed over
    ``content.lower()``, so wrap the ORIGINAL text only when lowering
    preserved length (the overwhelmingly common case) — a
    length-changing case mapping (e.g. 'İ' -> 'i̇') shifts every later
    offset, so display the lowered text the offsets are valid for."""
    low = content.lower()
    offs = _find_offsets(content, terms)
    return highlight_doc(content if len(low) == len(content) else low,
                         offs, n_passages)


def snippet_from_stored_offsets(
    content: str,
    per_term_offsets: list[list[int]],
    terms: list[str],
    n_passages: int = 3,
) -> str:
    """highlight_doc over INDEX-STORED offsets, made total:

    * offsets absent (index built without the offsets column) -> fall
      back to re-tokenization (term queries keep exact snippets; phrase
      offset-filtering degrades to all-occurrence bolding);
    * non-ASCII content -> the stored values are BYTE offsets into the
      lowered UTF-8, so convert them to char offsets and highlight the
      LOWERED text (tokens are lowercase already; ASCII content — the
      normal case — keeps the original text and needs no conversion)."""
    if not any(len(o) for o in per_term_offsets):
        return _retokenize_snippet(content, terms, n_passages)
    if content.isascii():
        return highlight_doc(content, per_term_offsets, n_passages)
    import numpy as np

    low = content.lower()
    lb = np.frombuffer(low.encode("utf-8"), dtype=np.uint8)
    # char index of each byte = count of non-continuation bytes before it
    char_of = np.cumsum((lb & 0xC0) != 0x80) - 1
    char_of = np.append(char_of, len(low))
    last = len(lb)
    conv = [
        [int(char_of[min(int(b), last)]) for b in offs]
        for offs in per_term_offsets
    ]
    # Python str.lower() can diverge from the Arrow utf8_lower used at
    # index time (full vs simple case mappings, e.g. U+0130 'İ' -> 'i̇'
    # grows by one codepoint), shifting every stored byte offset after
    # the divergence. Validate each converted span actually spells its
    # term; any mismatch -> re-tokenize instead of mis-bolding
    for offs, t in zip(conv, terms):
        for i in range(0, len(offs), 2):
            if low[offs[i] : offs[i + 1]] != t:
                return _retokenize_snippet(content, terms, n_passages)
    return highlight_doc(low, conv, n_passages)


def highlight(
    docs: DataFrame,
    topk: DataFrame,
    terms: list[str],
    n_passages: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, snippet) for every doc in ``topk`` — the join pulls only
    the k result docs' content (broadcast the k-row side), then an Arrow
    batch UDF scores passages and wraps matches."""
    terms_l = [t.lower() for t in terms]
    hits = docs.join(
        F.broadcast(topk.select("doc_id")), "doc_id"
    ).select("doc_id", content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "snippet": [
                        highlight_doc(c, _find_offsets(c, terms_l), n_passages)
                        for c in pdf[content_col]
                    ],
                }
            )

    return hits.mapInPandas(run, HIGHLIGHT_SCHEMA)
