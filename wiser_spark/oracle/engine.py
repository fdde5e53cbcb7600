"""Pure-Python (numpy-only) oracle engine.

The analogue of the reference's in-memory ``QqMemEngineDelta``
(reference ``qq_mem_engine.h:268-447``): the Spark engine is
differential-tested against this oracle exactly the way the reference
tests its flash engine against its memory engine
(reference ``tests_15.cc:158-213``).

Implements reference semantics precisely:
  * dense sequential docIDs in insertion order (qq_mem_engine.h:444-446)
  * tf(term, doc) = occurrence count of the term in the doc's token list
    (= number of offset pairs, qq_mem_engine.h:212)
  * doc length = non-empty ' '-split chunks of the RAW body
    (types.cc:38-40), stored LOSSILY as a Char4 byte (doc_length_store.h:110)
  * BM25: ES idf; tfnorm via the 256-entry lossy cache (scoring.h:64-96)
  * AND semantics: any unknown query term => empty result
    (qq_mem_engine.h:345-347)
  * phrase: candidates pass conjunction, then the adjusted-position
    intersection — doc matches iff ∩_i (positions_i − i) is non-empty
    (query_processing.h:170-382); score stays plain BM25 of the doc
    (query_processing.h:886-895)
  * top-k: min-heap with strict-`>` eviction on score only
    (query_processing.h:595-603) — among equal scores the earliest
    (lowest) docIDs are kept; output sorted (score desc, doc_id asc)
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np

from wiser_spark.config import BM25Params
from wiser_spark.functions.bm25 import idf as calc_idf
from wiser_spark.functions.bm25 import tfnorm_cache
from wiser_spark.functions.char4 import uint_to_char4_scalar
from wiser_spark.functions.tokenize import doclen_text, tokenize_text


class OracleEngine:
    def __init__(self, params: BM25Params | None = None):
        self.params = params or BM25Params()
        # term -> {"doc_ids": [int], "tfs": [int], "positions": [[int]]}
        self.index: dict[str, dict] = defaultdict(
            lambda: {"doc_ids": [], "tfs": [], "positions": []}
        )
        self.doclens: list[int] = []
        self.doclen_chars: list[int] = []
        self.next_doc_id = 0

    # ------------------------------------------------------------ build
    def add_document(self, content: str, tokens: list[str] | None = None) -> int:
        doc_id = self.next_doc_id
        self.next_doc_id += 1
        if tokens is None:
            tokens = tokenize_text(content)
        per_term_positions: dict[str, list[int]] = defaultdict(list)
        for pos, tok in enumerate(tokens):
            per_term_positions[tok].append(pos)
        for term, positions in per_term_positions.items():
            pl = self.index[term]
            pl["doc_ids"].append(doc_id)
            pl["tfs"].append(len(positions))
            pl["positions"].append(positions)
        length = doclen_text(content)
        self.doclens.append(length)
        self.doclen_chars.append(uint_to_char4_scalar(length))
        return doc_id

    # ------------------------------------------------------------ stats
    @property
    def n_docs(self) -> int:
        return self.next_doc_id

    @property
    def avgdl(self) -> float:
        """Arithmetic mean of TRUE doc lengths.

        The reference keeps a running mean (doc_length_store.h:108); sum/n
        is the distributed-friendly equivalent (differs at most ~1 ulp).
        This engine defines the fixtures, so both sides of every
        differential test use sum/n.
        """
        return float(np.mean(self.doclens)) if self.doclens else 1.0

    def df(self, term: str) -> int:
        return len(self.index[term]["doc_ids"]) if term in self.index else 0

    def postings(self) -> list[tuple[str, int, int, list[int]]]:
        rows = []
        for term in sorted(self.index):
            pl = self.index[term]
            for d, t, p in zip(pl["doc_ids"], pl["tfs"], pl["positions"]):
                rows.append((term, d, t, p))
        return rows

    # ------------------------------------------------------------ query
    def search(
        self, terms: list[str], k: int = 10, is_phrase: bool = False
    ) -> list[tuple[int, float]]:
        if not terms or any(t not in self.index for t in terms):
            return []  # AND semantics: unknown term => empty
        lists = [self.index[t] for t in terms]
        idfs = [calc_idf(self.n_docs, len(pl["doc_ids"])) for pl in lists]
        cache = tfnorm_cache(self.avgdl, self.params)
        k1 = self.params.k1

        # conjunction: docs present in every posting list
        doc_sets = [dict(zip(pl["doc_ids"], range(len(pl["doc_ids"])))) for pl in lists]
        candidates = sorted(set(doc_sets[0]).intersection(*doc_sets[1:]))

        if is_phrase and len(terms) > 1:
            candidates = [
                d for d in candidates if self._phrase_match(d, lists, doc_sets)
            ]

        # strict-`>` min-heap; key (score, -doc_id) so that among equal
        # scores the LATEST doc sits on top and is evicted first, keeping
        # the earliest docIDs (matching the reference's rejection bias).
        heap: list[tuple[float, int]] = []
        for d in candidates:
            score = 0.0
            c = self.doclen_chars[d]
            for i, pl in enumerate(lists):
                tf = pl["tfs"][doc_sets[i][d]]
                tfnorm = (tf * (k1 + 1.0)) / (tf + cache[c])
                score += float(idfs[i]) * tfnorm
            if len(heap) < k:
                heapq.heappush(heap, (score, -d))
            elif score > heap[0][0]:
                heapq.heapreplace(heap, (score, -d))
        out = [(-nd, s) for s, nd in heap]
        out.sort(key=lambda e: (-e[1], e[0]))
        return out

    @staticmethod
    def _phrase_match(doc_id: int, lists, doc_sets) -> bool:
        adjusted = None
        for i, pl in enumerate(lists):
            pos = np.asarray(pl["positions"][doc_sets[i][doc_id]], dtype=np.int64) - i
            adjusted = pos if adjusted is None else np.intersect1d(adjusted, pos)
            if adjusted.size == 0:
                return False
        return True
