"""Engine-wide constants and configuration.

BM25 constants: the reference hard-codes k1=1.2, b=0.75 (Elasticsearch
defaults, reference ``scoring.h:94-95``); the rebuild's spec (BASELINE.json)
asks for k1=0.9, b=0.4. Both are supported: (k1, b) is a parameter
everywhere, defaulting to the reference-code values so differential tests
against reference semantics are exact. Fixtures record which pair they use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Frame size for bit-packed integer blocks, and the skip interval of the
# per-term skip index — both 128 in the reference flash format
# (reference ``packed_value.h:13``, ``flash_containers.h:10-11``).
PACK_SIZE = 128
SKIP_INTERVAL = 128

# Magic bytes of the on-disk blobs (reference ``types.h:43-51``).
PACKED_FRAME_MAGIC = 0xD6
VINTS_MAGIC = 0x9B
POSTING_LIST_MAGIC = 0xF4

# Tokenizer: lowercase source code, tokens are maximal runs of
# [a-z0-9_].  This single definition is shared by the Spark build path
# (JVM regexp), the pandas-UDF path, the pure-Python oracle, and the
# DuckDB oracle SQL, so all four tokenize identically.
TOKEN_SPLIT_REGEX = "[^a-z0-9_]+"


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 (k1, b). Defaults = reference code constants."""

    k1: float = 1.2
    b: float = 0.75


# The BASELINE.json "north star" pair.
BM25_NORTH = BM25Params(k1=0.9, b=0.4)
# The reference C++ pair (scoring.h:94-95).
BM25_REFERENCE = BM25Params(k1=1.2, b=0.75)


@dataclass(frozen=True)
class IndexConfig:
    """Index build configuration.

    n_shards: number of doc-range shards. Every term's postings are split
    at the SAME doc_id boundaries (doc_id % n_shards keyed by range, see
    operators/segments.py), so conjunctive/phrase intersection is
    shard-local and queries parallelize over shards with a single global
    top-k merge — the distributed analogue of Lucene segments. At 10^12
    files this is the axis that scales out; on local[32] tests use a
    handful of shards.
    """

    bm25: BM25Params = field(default_factory=BM25Params)
    n_shards: int = 4
    top_k: int = 10
    with_positions: bool = True
