"""Chunked compressed doc store (reference S7) — the .fdx/.fdt pair,
Spark-distributed.

The reference compresses each document with LZ4 into a byte stream
(``my.fdt``), optionally 4KB-aligning a doc when unaligned placement
would touch MORE 4KB blocks than aligned placement would
(``doc_store.h:73-78``), and records one encoded offset per doc in
``my.fdx``: ``(offset << 1) | aligned`` (``doc_store.h:277-362``); the
reader mmaps ``.fdt`` and slices per doc (``doc_store.h:365-455``).

This rendition keeps that structure but distributes it: docs pack into
EXTENT rows (~1 MiB of compressed stream each — the mmap-window
analogue, sized so a parquet row stays sane and a fetch reads one
bounded blob), each extent carrying its own fdx arrays:

  (first_doc, last_doc, n_docs, doc_ids, enc_offs, sizes, blob)

``enc_offs[i] = (offset_in_blob << 1) | aligned`` with the reference's
exact ShouldAlign rule; aligned docs are zero-padded to the next 4KB
boundary inside the extent. ``first_doc``/``last_doc`` give parquet
min/max row-group pruning, so fetching k docs reads only the extents
that can hold them — the distributed madvise-random story.

Compression is zlib level 1 (stdlib) standing in for LZ4, which does
not ship in this container; the chunk/offset/alignment layout — the
part that matters for the format — is faithful. The per-row content
sha256 invariant (input-hint contract) is pinned by test + the
``doc_store_roundtrip`` oracle entry.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KB4 = 4 * 1024
EXTENT_BYTES = 1 * 1024 * 1024

STORE_SCHEMA = (
    "first_doc long, last_doc long, n_docs int, "
    "doc_ids array<long>, enc_offs array<long>, sizes array<int>, "
    "blob binary"
)


def should_align(start_off: int, size: int) -> bool:
    """Reference ``ShouldAlign`` (doc_store.h:73-78): align when the
    unaligned placement spans more 4KB blocks than an aligned one."""
    n_aligned = -(-size // KB4)
    n_unaligned = -(-((start_off % KB4) + size) // KB4)
    return n_unaligned > n_aligned


def write_doc_store(
    docs: DataFrame,
    store_dir: str,
    content_col: str = "content",
    align: bool = True,
    extent_bytes: int = EXTENT_BYTES,
) -> None:
    """Pack (doc_id, content) into compressed extents, one pass, no
    shuffle beyond an in-partition sort (any doc-disjoint partitioning
    qualifies; docIDs ascend within each extent)."""
    sel = docs.select(
        F.col("doc_id"), F.col(content_col).alias("content")
    ).sortWithinPartitions("doc_id")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = bytearray()
        ids: list[int] = []
        offs: list[int] = []
        sizes: list[int] = []

        def flush():
            nonlocal cur, ids, offs, sizes
            if not ids:
                return None
            row = pd.DataFrame(
                {
                    "first_doc": [ids[0]],
                    "last_doc": [ids[-1]],
                    "n_docs": [len(ids)],
                    "doc_ids": [list(ids)],
                    "enc_offs": [list(offs)],
                    "sizes": [list(sizes)],
                    "blob": [bytes(cur)],
                }
            )
            cur, ids, offs, sizes = bytearray(), [], [], []
            return row

        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                comp = zlib.compress(
                    content.encode("utf-8") if isinstance(content, str)
                    else bytes(content),
                    1,
                )
                off = len(cur)
                do_align = align and should_align(off, len(comp))
                if do_align:
                    pad = (off // KB4 + 1) * KB4
                    cur.extend(b"\x00" * (pad - off))
                    off = pad
                cur.extend(comp)
                ids.append(int(doc_id))
                offs.append((off << 1) | int(do_align))
                sizes.append(len(comp))
                if len(cur) >= extent_bytes:
                    yield flush()
        row = flush()
        if row is not None:
            yield row

    sel.mapInPandas(pack, STORE_SCHEMA).write.mode("overwrite").parquet(
        f"{store_dir}/extents"
    )


def fetch_docs(
    spark: SparkSession, store_dir: str, doc_ids: list[int] | None = None
) -> DataFrame:
    """(doc_id, content) from the store. With ``doc_ids`` given, only
    extents whose [first_doc, last_doc] range can hold one are read
    (parquet min/max pruning on the range predicate) and only the
    requested docs decompress; with None, the full store streams out
    (the scan/export path)."""
    ext = spark.read.schema(STORE_SCHEMA).parquet(f"{store_dir}/extents")
    wanted = sorted(set(int(d) for d in doc_ids)) if doc_ids is not None else None
    wset = set(wanted) if wanted is not None else None
    if wanted is not None:
        if not wanted:  # explicit empty request: no scan at all
            return spark.createDataFrame([], "doc_id long, content string")
        pred = None
        for d in wanted:
            p = (F.col("first_doc") <= d) & (F.col("last_doc") >= d)
            pred = p if pred is None else pred | p
        ext = ext.filter(pred)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[int] = []
            out_docs: list[str] = []
            for ids, offs, sizes, blob in zip(
                pdf["doc_ids"], pdf["enc_offs"], pdf["sizes"], pdf["blob"]
            ):
                mv = memoryview(blob)
                for i, did in enumerate(ids):
                    if wanted is not None and int(did) not in wset:
                        continue
                    off = int(offs[i]) >> 1
                    comp = mv[off : off + int(sizes[i])]
                    out_ids.append(int(did))
                    out_docs.append(
                        zlib.decompress(comp).decode("utf-8")
                    )
            yield pd.DataFrame({"doc_id": out_ids, "content": out_docs})

    return ext.mapInPandas(unpack, "doc_id long, content string")
