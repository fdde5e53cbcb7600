"""Segment layer: WiSER's on-flash posting format, Spark-distributed.

Layout per (shard, term) row — the Spark rendition of the reference's
``my.vacuum`` posting list + ``my.tip`` term entry (SURVEY.md §2.2
B4-B14):

  docids_blob : docID gaps (delta) -> 128-value bit-packed frames +
                varint tail (reference dumps docid bags first,
                ``flash_engine_dumper.h:557-582``)
  tfs_blob    : raw TFs, same framing, NO delta (``:560``)
  pos_blob    : per-doc delta-encoded positions, one varint run per doc,
                doc boundaries derived from TFs (tf == positions count)
  skip_*      : one entry per 128 postings: preceding docID + byte
                offsets of the frame in each blob (the reference's
                per-128-bag skip rows, ``flash_containers.h:236-308``) —
                enables partial decode from any bag boundary
  df_shard    : postings in this shard; global df lives in the dictionary

SHARDING = the skew story. Every term's postings are split at the SAME
doc boundaries (``doc_id % n_shards``), so a stopword-scale posting list
('return' in 10^12 files) becomes n_shards bounded groups — the shuffle
key (shard_id, term) is implicitly salted by the sharding, no group can
exceed a shard's doc count, and conjunctive/phrase intersection stays
shard-local. Queries fan out over shards and merge a k-row result per
shard (distributed analogue of the reference's single-node zig-zag,
``query_processing.h:810-852``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiser_spark.config import PACK_SIZE, BM25Params, IndexConfig
from wiser_spark.functions.bm25 import tfnorm_cache
from wiser_spark.functions.packing import (
    decode_column,
    delta_decode,
    delta_encode,
    encode_column,
)
from wiser_spark.functions.varint import varint_decode, varint_encode
from wiser_spark.operators.docstats import CorpusStats

SEGMENT_SCHEMA = (
    "shard_id int, term string, df_shard int, "
    "docids_blob binary, tfs_blob binary, pos_blob binary, "
    "skip_predocs array<long>, skip_docid_offs array<long>, "
    "skip_tf_offs array<long>, skip_pos_offs array<long>"
)


# ----------------------------------------------------------------- write
def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (shard, term) group -> one segment row. Pure numpy."""
    pdf = pdf.sort_values("doc_id")
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    docids_blob, docid_offs = encode_column(delta_encode(doc_ids))
    tfs_blob, tf_offs = encode_column(tfs.astype(np.uint64))

    has_pos = "positions" in pdf.columns
    if has_pos:
        pos_parts = []
        pos_byte_offs = np.zeros(len(pdf), dtype=np.int64)
        total = 0
        for i, positions in enumerate(pdf["positions"]):
            enc = varint_encode(delta_encode(np.asarray(positions, dtype=np.int64)))
            pos_byte_offs[i] = total
            total += len(enc)
            pos_parts.append(enc)
        pos_blob = b"".join(pos_parts)
        skip_pos = pos_byte_offs[::PACK_SIZE]
    else:
        pos_blob = b""
        skip_pos = np.zeros(0, dtype=np.int64)

    # skip entry i covers postings [i*128, (i+1)*128): preceding docID
    # (doc before the bag, 0 for the first — reference pre-doc-id rows,
    # flash_containers.h:22-30) + frame byte offsets
    n_bags = (len(pdf) + PACK_SIZE - 1) // PACK_SIZE
    pre = np.zeros(n_bags, dtype=np.int64)
    pre[1:] = doc_ids[PACK_SIZE - 1 :: PACK_SIZE][: n_bags - 1]
    return pd.DataFrame(
        {
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "term": [pdf["term"].iloc[0]],
            "df_shard": [len(pdf)],
            "docids_blob": [docids_blob],
            "tfs_blob": [tfs_blob],
            "pos_blob": [pos_blob],
            "skip_predocs": [pre.tolist()],
            "skip_docid_offs": [docid_offs.tolist()],
            "skip_tf_offs": [tf_offs.tolist()],
            "skip_pos_offs": [skip_pos.tolist()],
        }
    )


def build_segments(postings: DataFrame, n_shards: int) -> DataFrame:
    """postings (term, doc_id, tf[, positions]) -> segment rows."""
    with_shard = postings.withColumn(
        "shard_id", (F.col("doc_id") % n_shards).cast("int")
    )
    return with_shard.groupBy("shard_id", "term").applyInPandas(
        _encode_group, SEGMENT_SCHEMA
    )


def write_index(
    postings: DataFrame,
    docstats: DataFrame,
    dictionary: DataFrame,
    stats: CorpusStats,
    index_dir: str,
    config: IndexConfig | None = None,
) -> None:
    """Persist a queryable index: segments (partitioned by shard, sorted
    by term within files so parquet min/max stats prune term lookups),
    dictionary, doc stats, and a stats/metadata JSON."""
    config = config or IndexConfig()
    segs = build_segments(postings, config.n_shards)
    (
        segs.repartition("shard_id")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{index_dir}/segments")
    )
    dictionary.write.mode("overwrite").parquet(f"{index_dir}/dictionary")
    docstats.select("doc_id", "doclen", "doclen_char").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/docstats")
    meta = {
        "n_docs": stats.n_docs,
        "avgdl": stats.avgdl,
        "n_shards": config.n_shards,
        "k1": config.bm25.k1,
        "b": config.bm25.b,
        "format": "wiser-spark-segment-v1",
    }
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/stats.json", "w") as f:
        json.dump(meta, f, indent=1)


# ------------------------------------------------------------------ read
def decode_segment_row(row: dict, with_positions: bool = False):
    """Segment row -> (doc_ids, tfs[, positions list-of-arrays])."""
    n = int(row["df_shard"])
    doc_ids = delta_decode(decode_column(row["docids_blob"], n)).astype(np.int64)
    tfs = decode_column(row["tfs_blob"], n).astype(np.int64)
    if not with_positions:
        return doc_ids, tfs, None
    all_pos, _ = varint_decode(row["pos_blob"], count=int(tfs.sum()))
    flat = np.cumsum(all_pos.astype(np.int64))
    ends = np.cumsum(tfs)
    starts = ends - tfs
    # undo the cross-doc carry: subtract the running total before each doc
    carry = np.zeros(len(flat), dtype=np.int64)
    carry[starts[1:]] = flat[ends[:-1] - 1]
    flat = flat - np.maximum.accumulate(carry)
    positions = [flat[s:e] for s, e in zip(starts, ends)]
    return doc_ids, tfs, positions


class SegmentIndex:
    """Query engine over a written index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(f"{index_dir}/stats.json") as f:
            self.meta = json.load(f)
        self.params = BM25Params(k1=self.meta["k1"], b=self.meta["b"])
        self.stats = CorpusStats(self.meta["n_docs"], self.meta["avgdl"])
        self.segments = spark.read.parquet(f"{index_dir}/segments")
        # dictionary + docstats are the hot lookup tables of every query
        # (the reference mmaps my.tip / my.doc_length once) — cache them
        self.dictionary = spark.read.parquet(f"{index_dir}/dictionary").cache()
        self.docstats = spark.read.parquet(f"{index_dir}/docstats").cache()

    def search(
        self, terms: list[str], k: int = 10, is_phrase: bool = False
    ) -> DataFrame:
        """Top-k (rank, doc_id, score) — decode + intersect + score runs
        per shard in an Arrow-batched pandas UDF; a k-row result per shard
        is merged by a tiny global top-k (TakeOrderedAndProject)."""
        spark = self.spark
        empty = spark.createDataFrame([], "rank int, doc_id long, score double")
        if not terms:
            return empty
        # global df per query term (broadcast-sized: len(terms) rows)
        df_rows = (
            self.dictionary.filter(F.col("term").isin(list(set(terms)))).collect()
        )
        df_map = {r["term"]: r["df"] for r in df_rows}
        if any(t not in df_map for t in terms):
            return empty  # AND semantics (reference qq_mem_engine.h:345-347)

        n_docs, avgdl = self.stats.n_docs, self.stats.avgdl
        params = self.params
        idfs = {
            t: float(np.log(1.0 + (n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5)))
            for t in set(terms)
        }
        cache = tfnorm_cache(avgdl, params)
        terms_l = list(terms)
        need_pos = is_phrase and len(terms_l) > 1
        k1 = params.k1

        # doclen bytes per shard ride along as a second grouped frame via
        # cogroup (keeps the lossy-length lookup shard-local, no big join)
        n_shards = self.meta["n_shards"]
        doclens = self.docstats.withColumn(
            "shard_id", (F.col("doc_id") % n_shards).cast("int")
        ).select("shard_id", "doc_id", "doclen_char")
        seg = self.segments.filter(F.col("term").isin(terms_l))

        def score_shard(seg_pdf: pd.DataFrame, len_pdf: pd.DataFrame) -> pd.DataFrame:
            out_empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                      "score": pd.Series(dtype="float64")})
            rows = {r["term"]: r for _, r in seg_pdf.iterrows()}
            if any(t not in rows for t in terms_l):
                return out_empty
            decoded = {
                t: decode_segment_row(rows[t], with_positions=need_pos)
                for t in set(terms_l)
            }
            # k-way conjunction, smallest list first (zig-zag analogue)
            cand = None
            for t in sorted(set(terms_l), key=lambda t: decoded[t][0].size):
                ids = decoded[t][0]
                cand = ids if cand is None else cand[np.isin(cand, ids)]
                if cand.size == 0:
                    return out_empty
            if need_pos:
                keep = []
                for d in cand:
                    adj = None
                    ok = True
                    for i, t in enumerate(terms_l):
                        ids, _, plists = decoded[t]
                        j = int(np.searchsorted(ids, d))
                        pos = plists[j] - i
                        adj = pos if adj is None else np.intersect1d(adj, pos)
                        if adj.size == 0:
                            ok = False
                            break
                    if ok:
                        keep.append(d)
                cand = np.asarray(keep, dtype=np.int64)
                if cand.size == 0:
                    return out_empty
            # vectorized BM25 over the shard's candidates
            len_by_doc = len_pdf.set_index("doc_id")["doclen_char"]
            codes = len_by_doc.reindex(cand).to_numpy(dtype=np.int64) & 0xFF
            scores = np.zeros(cand.size, dtype=np.float64)
            for i, t in enumerate(terms_l):
                ids, tfs, _ = decoded[t]
                tf = tfs[np.searchsorted(ids, cand)].astype(np.float64)
                scores += idfs[t] * ((tf * (k1 + 1.0)) / (tf + cache[codes]))
            order = np.lexsort((cand, -scores))[:k]
            return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})

        per_shard = seg.groupBy("shard_id").cogroup(
            doclens.groupBy("shard_id")
        ).applyInPandas(lambda sp, lp: score_shard(sp, lp), "doc_id long, score double")
        top = per_shard.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score"
        )
