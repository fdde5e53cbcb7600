"""Micro-bench: block-max single-term top-k vs full decode, kernel-only.

Measures the worker-side cost of answering a single-term top-10 query
over one shard's posting list at realistic per-shard densities (at 10^12
files with doc-range sharding, a stopword-like code token — 'return',
'import' — holds 10^4..10^6 postings per shard). No Spark session: this
times exactly the bytes-to-winners kernel the shard stage runs, so the
ratio is the per-shard CPU saving, independent of scheduling overhead.

Usage: python scripts/blockmax_bench.py [postings-per-shard ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from wiser_spark.config import BM25Params
from wiser_spark.functions.bm25 import tfnorm_cache
from wiser_spark.operators.segments import (
    _encode_term_flat,
    _topk_blockmax_single,
    decode_segment_row,
)

PARAMS = BM25Params(0.9, 0.4)
K = 10
IDF = 2.3


def _topk_full(rows, k, idf_t, cache, k1, codes_for):
    """The generic path's math: full decode + score + lexsort."""
    parts = [decode_segment_row(r)[:2] for r in rows]
    ids = np.concatenate([p[0] for p in parts])
    tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
    scores = idf_t * ((tf * (k1 + 1.0)) / (tf + cache[codes_for(ids)]))
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


def one_scale(n: int, reps: int = 5) -> dict:
    rng = np.random.RandomState(11)
    doc_ids = np.cumsum(rng.randint(1, 4, size=n)).astype(np.int64)
    # Zipf-ish tf: mostly 1-2, rare spikes — the code-token shape
    tfs = np.minimum(1 + rng.zipf(2.2, size=n), 200).astype(np.int64)
    seg = _encode_term_flat(0, "t", doc_ids, tfs, None, None)
    cache = tfnorm_cache(avgdl=40.0, params=PARAMS)
    # realistic doc lengths (around avgdl), char4-coded like the index
    from wiser_spark.functions.char4 import uint_to_char4

    codes = uint_to_char4(
        rng.randint(15, 120, size=int(doc_ids[-1]) + 1)
    ).astype(np.int64)
    codes_for = lambda ids: codes[np.asarray(ids)]  # noqa: E731

    def timed(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_full, want = timed(
        lambda: _topk_full([seg], K, IDF, cache, PARAMS.k1, codes_for)
    )
    t_bm, got = timed(
        lambda: _topk_blockmax_single([seg], K, IDF, cache, PARAMS.k1, codes_for)
    )
    assert got is not None, "prune fallback fired — tf shape too flat"
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    return {
        "postings": n,
        "full_ms": round(t_full * 1e3, 3),
        "blockmax_ms": round(t_bm * 1e3, 3),
        "speedup": round(t_full / t_bm, 2),
    }


if __name__ == "__main__":
    scales = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    for n in scales:
        print(one_scale(n))
