"""Phrase-acceleration bloom filters (reference B15/B16/Q8).

The reference stores, per (term, doc), a bloom filter of the tokens that
FOLLOW the term in that doc (an "end" bloom) and one of the tokens that
precede it ("begin"), probing them before the positional intersect
(``bloom_filter.h:255-472``, probe ``query_processing.h:766-807``).

This rebuild keeps the semantics that matter — NO false negatives, so
the probe is purely pruning and provably result-neutral — with a compact
fixed layout: 64 bits per (term, doc) posting, k=2 md5-derived bit
positions per member token. The sided begin/end choice of the reference
is a cost optimization; the end-bloom chain (its own >2-term fallback,
``query_processing.h:869-884``) is what we implement.
"""

from __future__ import annotations

import hashlib

import numpy as np

BLOOM_BITS = 64


def token_bloom_bits(term: str) -> int:
    """The k=2 bit mask a token sets/probes in a 64-bit bloom."""
    h = hashlib.md5(term.encode()).digest()
    h1 = h[0] % BLOOM_BITS
    h2 = ((h[1] << 8) | h[2]) % BLOOM_BITS
    return (1 << h1) | (1 << h2)


def vocab_bloom_table(uniques) -> np.ndarray:
    """bits mask per vocabulary code (uint64), one md5 per UNIQUE term."""
    return np.fromiter(
        (token_bloom_bits(t) for t in uniques), dtype=np.uint64, count=len(uniques)
    )


def fold_occurrence_blooms(
    occ_bits: np.ndarray, posting_starts: np.ndarray
) -> np.ndarray:
    """OR the per-occurrence next-token masks into per-posting blooms."""
    if occ_bits.size == 0:
        return np.zeros(0, dtype=np.uint64)
    return np.bitwise_or.reduceat(occ_bits, posting_starts)


def probe(blooms: np.ndarray, qbits: int) -> np.ndarray:
    """True where the posting's bloom MAY contain the probed token."""
    q = np.uint64(qbits)
    return (blooms & q) == q
