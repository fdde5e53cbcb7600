"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the wiser_spark engine's operators over the driver's
``documents`` table (doc_id, text, lang, source, n_chars), mapping
``text`` -> the engine's ``content`` column and using the provided dense
``doc_id`` directly (it already mirrors the reference's sequential docID
assignment). ``oracle_sql()`` returns DuckDB SQL generated from the same
shared spec (wiser_spark/plans/oracle_sql.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiser_spark.config import BM25Params
from wiser_spark.operators.docstats import build_docstats, corpus_stats
from wiser_spark.operators.postings import build_dictionary, build_postings
from wiser_spark.operators.topk import bm25_topk
from wiser_spark.plans import curation_sql as csql
from wiser_spark.plans import oracle_sql as osql

PARAMS = BM25Params(k1=1.2, b=0.75)

# query set over the documents vocabulary: high-df, low-df ('dup', df~5%),
# conjunctive, phrase, and an absent term (AND semantics => empty result)
BM25_QUERIES: dict[str, tuple[list[str], bool]] = {
    "bm25_single_high": (["key"], False),
    "bm25_single_low": (["dup"], False),
    "bm25_and2": (["dup", "key"], False),
    "bm25_and3": (["spark", "window", "sort"], False),
    "bm25_absent": (["key", "zz_no_such_term_zz"], False),
    "bm25_phrase2": (["table", "part"], True),
    "bm25_phrase3": (["batch", "window", "spark"], True),
}


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long"), F.col("text").alias("content")
    )


def _built(spark: SparkSession, sf_dir: str):
    docs = _documents(spark, sf_dir)
    postings = build_postings(docs)
    docstats = build_docstats(docs)
    return docs, postings, docstats


def _q_postings(spark, sf_dir):
    _, postings, _ = _built(spark, sf_dir)
    return postings.select("term", "doc_id", "tf")


def _q_postings_offsets(spark, sf_dir):
    """Per-occurrence offset pairs from the Arrow build path, verified by
    EXTRACTION: substring(lower(content), s+1, e-s) must equal the term
    for every occurrence (the oracle emits the term twice)."""
    from wiser_spark.operators.postings import build_postings_arrow

    docs = _documents(spark, sf_dir)
    p = build_postings_arrow(docs, with_offsets=True)
    idx = F.sequence(F.lit(0), F.size("positions") - 1)
    occ = p.select(
        "doc_id", "term",
        F.explode(
            F.arrays_zip(
                F.col("positions").alias("pos"),
                F.transform(
                    idx, lambda i: F.element_at(F.col("offsets"), i * 2 + 1)
                ).alias("s"),
                F.transform(
                    idx, lambda i: F.element_at(F.col("offsets"), i * 2 + 2)
                ).alias("e"),
            )
        ).alias("z"),
    ).select("doc_id", "term", "z.pos", "z.s", "z.e")
    return occ.join(docs, "doc_id").select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        "term",
        F.expr("substring(lower(content), s + 1, e - s)").alias("extracted"),
    )


def _q_term_dict(spark, sf_dir):
    _, postings, _ = _built(spark, sf_dir)
    return build_dictionary(postings)


def _q_term_prefix(spark, sf_dir):
    """Prefix seek over the term dictionary (the reference's hat-trie
    .tip walk) — served from the v2 map-side index's cached dictionary;
    a cold read prunes parquet row groups via the sorted-by-term layout
    (StringStartsWith pushdown, pinned by pytest)."""
    idx = _mapside_index(spark, sf_dir)
    return idx.term_prefix("s").orderBy("term")


def _q_doc_stats(spark, sf_dir):
    _, _, docstats = _built(spark, sf_dir)
    return docstats.select(
        "doc_id",
        F.col("doclen").cast("int").alias("doclen"),
        F.col("doclen_char").cast("int").alias("doclen_char"),
        F.col("sha256").alias("content_sha256"),
    )


def _q_corpus_stats(spark, sf_dir):
    _, _, docstats = _built(spark, sf_dir)
    return docstats.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("doclen").cast("double")), 6).alias("avgdl"),
    )


def _bm25_query(terms: list[str], is_phrase: bool):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _, postings, docstats = _built(spark, sf_dir)
        postings = postings.cache()
        dictionary = build_dictionary(postings)
        stats = corpus_stats(docstats)
        out = bm25_topk(
            postings, docstats, dictionary, stats, terms,
            k=10, params=PARAMS, is_phrase=is_phrase,
        )
        return out.select("rank", "doc_id", F.round("score", 6).alias("score"))

    return run


def _q_topk_from_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same conjunctive query as bm25_and2, but answered from the binary
    segment format (build index -> write -> reload -> decode -> score),
    proving the wiser posting-format round trip inside the gate."""
    import hashlib
    import tempfile

    from wiser_spark.config import IndexConfig
    from wiser_spark.operators.segments import SegmentIndex, write_index

    _, postings, docstats = _built(spark, sf_dir)
    dictionary = build_dictionary(postings)
    stats = corpus_stats(docstats)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    index_dir = f"{tempfile.gettempdir()}/wiser_entry_idx_{tag}"
    write_index(postings, docstats, dictionary, stats, index_dir,
                IndexConfig(bm25=PARAMS, n_shards=4))
    idx = SegmentIndex(spark, index_dir)
    out = idx.search(["dup", "key"], k=10, is_phrase=False)
    return out.select("rank", "doc_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------- curation operators
_DOCSTORE_CACHE: dict[str, str] = {}


def _q_doc_store_roundtrip(spark, sf_dir):
    """S7 proper: chunked compressed doc store (.fdx/.fdt rendition —
    per-doc compression, encoded offsets with the reference's 4KB
    alignment rule, extent rows with min/max pruning). The gate is the
    input-hint invariant: every stored doc reads back with an
    identical content sha256."""
    import hashlib
    import tempfile

    from wiser_spark.operators.docstore import fetch_docs, write_doc_store

    if sf_dir not in _DOCSTORE_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/wiser_docstore_{tag}"
        write_doc_store(_documents(spark, sf_dir), d)
        _DOCSTORE_CACHE[sf_dir] = d
    out = fetch_docs(spark, _DOCSTORE_CACHE[sf_dir])
    return out.select(
        "doc_id", F.sha2("content", 256).alias("content_sha256")
    )


DOC_STORE_SQL = """
SELECT doc_id, sha256(text) AS content_sha256 FROM documents
"""


def _q_dedup_exact(spark, sf_dir):
    from wiser_spark.operators.dedup import exact_dedup

    return exact_dedup(_documents(spark, sf_dir))


def _q_dedup_ngram_jaccard(spark, sf_dir):
    from wiser_spark.operators.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(_documents(spark, sf_dir), k=3, threshold=0.5)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_dedup_minhash_lsh(spark, sf_dir):
    from wiser_spark.operators.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(
        _documents(spark, sf_dir), num_hashes=32, bands=8, k=3, threshold=0.5
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the verified
    MinHash-LSH pair graph -> (doc_id, keeper_doc_id) keep/drop list."""
    from wiser_spark.operators.dedup import minhash_lsh_dedup, near_dup_clusters

    docs = _documents(spark, sf_dir)
    pairs = minhash_lsh_dedup(docs, num_hashes=32, bands=8, k=3, threshold=0.5)
    return near_dup_clusters(docs, pairs)


def _q_dedup_simhash(spark, sf_dir):
    from wiser_spark.operators.dedup import simhash

    return simhash(_documents(spark, sf_dir))


def _q_dedup_simhash_pairs(spark, sf_dir):
    """Near-dup pairs by SimHash Hamming distance <= 3 (12-bit banded
    blocking for candidates, popcount verification)."""
    from wiser_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_documents(spark, sf_dir), max_distance=3)


def _q_curation_kept_docs(spark, sf_dir):
    """The end-to-end curation keep-list: quality gate + language tag +
    near-dup cluster keepers, all in one composed pipeline."""
    from wiser_spark.operators.curation import curate_corpus

    return curate_corpus(_documents(spark, sf_dir), min_quality=0.5)


def _q_text_token_counts(spark, sf_dir):
    from wiser_spark.operators.textstats import token_counts

    return token_counts(_documents(spark, sf_dir))


def _q_text_language_id(spark, sf_dir):
    from wiser_spark.operators.textstats import language_id

    return language_id(_documents(spark, sf_dir))


def _q_text_quality(spark, sf_dir):
    from wiser_spark.operators.textstats import quality_score

    return quality_score(_documents(spark, sf_dir))


def _q_text_fingerprint(spark, sf_dir):
    from wiser_spark.operators.textstats import fingerprint_docs

    return fingerprint_docs(_documents(spark, sf_dir), k=5)


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vec(spark, sf_dir, vec_id=0):
    row = _embeddings(spark, sf_dir).filter(F.col("vec_id") == vec_id).first()
    return [float(v) for v in row["embedding"]]


def _q_ann_cosine_topk(spark, sf_dir):
    from wiser_spark.operators.similarity import brute_force_topk

    return brute_force_topk(_embeddings(spark, sf_dir), _query_vec(spark, sf_dir), k=10)


def _q_embedding_sim_pairs(spark, sf_dir):
    """Embedding near-dup pairs via multi-table sign-LSH blocking
    (cosine >= 0.3; pairs deduped across tables before the verify)."""
    from wiser_spark.operators.similarity import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(
        _embeddings(spark, sf_dir), threshold=0.3, n_planes=8, n_tables=2
    )
    return out.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


_LSH_IDX_CACHE: dict[str, str] = {}


def _lsh_index(spark, sf_dir, n_planes=8, n_tables=2):
    import hashlib
    import tempfile

    from wiser_spark.operators.similarity import write_lsh_index

    if sf_dir not in _LSH_IDX_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/wiser_lsh_idx_{tag}"
        write_lsh_index(
            _embeddings(spark, sf_dir), d, n_planes=n_planes,
            n_tables=n_tables, recall_queries=8,  # recall@10 in lsh.json
        )
        _LSH_IDX_CACHE[sf_dir] = d
    return _LSH_IDX_CACHE[sf_dir]


_IVF_IDX_CACHE: dict[str, str] = {}


def _q_ann_ivf_topk(spark, sf_dir):
    """ANN top-k over a persisted IVF-flat index: nprobe nearest cells
    scanned via partition pruning, exact cosine on the survivors."""
    import hashlib
    import tempfile

    from wiser_spark.operators.similarity import ivf_topk, write_ivf_index

    if sf_dir not in _IVF_IDX_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/wiser_ivf_idx_{tag}"
        write_ivf_index(
            _embeddings(spark, sf_dir), d, n_centroids=16,
            recall_queries=8,  # recall@10 at nprobe=4 in ivf.json
        )
        _IVF_IDX_CACHE[sf_dir] = d
    return ivf_topk(
        spark, _IVF_IDX_CACHE[sf_dir], _query_vec(spark, sf_dir), k=10, nprobe=4
    )


_IVFPQ_IDX_CACHE: dict[str, str] = {}


def _q_ann_ivfpq_topk(spark, sf_dir):
    """ANN top-k over a persisted IVF-PQ index: stored rows are m=8
    product-quantization codes (not vectors — the 32x memory cut that
    keeps a 10^10-vector index cache-resident), scored per query by an
    ADC lookup table over the nprobe probed cells; the top k*refine
    candidates re-rank with exact cosine against the source table.
    The ENTIRE pipeline (sampled codebooks, argmin encode, ADC, refine)
    is reproduced by the DuckDB oracle — a differential gate, not just
    a recall floor."""
    import hashlib
    import tempfile

    from wiser_spark.operators.similarity import (
        ivfpq_topk,
        write_ivf_pq_index,
    )

    emb = _embeddings(spark, sf_dir)
    if sf_dir not in _IVFPQ_IDX_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/wiser_ivfpq_idx_{tag}"
        write_ivf_pq_index(
            emb, d, n_centroids=16, m=8, ks=16,
            recall_queries=8,  # recall@10 at nprobe=4 in pq.json
        )
        _IVFPQ_IDX_CACHE[sf_dir] = d
    return ivfpq_topk(
        spark, _IVFPQ_IDX_CACHE[sf_dir], emb,
        _query_vec(spark, sf_dir), k=10, nprobe=4, refine=4,
    )


def _q_ann_lsh_topk(spark, sf_dir):
    """ANN top-k over the PERSISTED multi-table LSH index — the probe is
    a (tbl, bucket) partition-pruned scan, not a full rehash."""
    from wiser_spark.operators.similarity import lsh_topk_indexed

    d = _lsh_index(spark, sf_dir)
    return lsh_topk_indexed(spark, d, _query_vec(spark, sf_dir), k=10)


_MAPSIDE_IDX_CACHE: dict[str, str] = {}


def _mapside_index(spark: SparkSession, sf_dir: str):
    """Build (once per process per sf_dir) and open the v2 zero-shuffle
    map-side index over the documents table."""
    import hashlib
    import tempfile

    from wiser_spark.config import IndexConfig
    from wiser_spark.operators.mapside import write_index_mapside
    from wiser_spark.operators.segments import SegmentIndex

    if sf_dir not in _MAPSIDE_IDX_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        index_dir = f"{tempfile.gettempdir()}/wiser_entry_idx_v4_{tag}"
        write_index_mapside(
            _documents(spark, sf_dir), index_dir,
            IndexConfig(bm25=PARAMS, n_shards=4),
        )
        _MAPSIDE_IDX_CACHE[sf_dir] = index_dir
    return SegmentIndex(spark, _MAPSIDE_IDX_CACHE[sf_dir])


def _q_topk_mapside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query as bm25_and2 via the v2 ZERO-SHUFFLE map-side index
    (sentinel doc-length rows; the 100 TB build path)."""
    idx = _mapside_index(spark, sf_dir)
    out = idx.search(["dup", "key"], k=10, is_phrase=False)
    return out.select("rank", "doc_id", F.round("score", 6).alias("score"))


def _q_bm25_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search WITH snippet generation (offset-filtered, BM25-like
    passage scoring) — the ranking columns are oracle-checked; the
    snippet text itself is pinned by pytest goldens (test_highlight)."""
    idx = _mapside_index(spark, sf_dir)
    docs = _documents(spark, sf_dir)
    out = idx.search(
        ["table", "part"], k=10, is_phrase=True,
        return_snippets=True, docs=docs,
    )
    return out.select("rank", "doc_id", F.round("score", 6).alias("score"))


def _q_bm25_snippets_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING flow: same phrase search, snippets point-fetched from
    the chunked doc store (S7) instead of the lake table — the <= k
    winner ids read back through extent-pruned fetch_docs. Ranking
    columns share bm25_snippets' oracle; snippet equality between the
    two content paths is pinned by pytest (test_docstore)."""
    import hashlib
    import tempfile

    from wiser_spark.operators.docstore import write_doc_store

    idx = _mapside_index(spark, sf_dir)
    if sf_dir not in _DOCSTORE_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/wiser_docstore_{tag}"
        write_doc_store(_documents(spark, sf_dir), d)
        _DOCSTORE_CACHE[sf_dir] = d
    out = idx.search(
        ["table", "part"], k=10, is_phrase=True,
        return_snippets=True, doc_store_dir=_DOCSTORE_CACHE[sf_dir],
    )
    return out.select("rank", "doc_id", F.round("score", 6).alias("score"))


def _q_bm25_snippets_inv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet INVARIANTS under a full oracle (round-4 gate): ranking
    columns match the BM25 oracle, and two DuckDB-checkable facts about
    the snippet TEXT are projected as booleans the oracle pins to TRUE:

      * passages_in_content — every '…'-joined passage of the snippet,
        with the <b> tags stripped, is a VERBATIM substring of the
        document content (the highlighter slices content, it never
        paraphrases; reference highlighter.h:297-453);
      * marks_are_terms — every <b>-wrapped span equals one of the
        query terms case-insensitively (matches come from stored
        offset pairs of those terms' postings).

    A regression in passage slicing or offset bookkeeping flips a
    boolean and fails the hash compare."""
    idx = _mapside_index(spark, sf_dir)
    docs = _documents(spark, sf_dir)
    terms = ["dup", "key"]
    out = idx.search(
        terms, k=10, is_phrase=False, return_snippets=True, docs=docs
    )
    joined = out.join(docs.select("doc_id", "content"), "doc_id")
    terms_arr = "array(" + ",".join(f"'{t}'" for t in terms) + ")"
    return joined.select(
        "rank",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.expr(
            "forall(split(snippet, '…'), p -> "
            "contains(content, regexp_replace(p, '<b>|</b>', '')))"
        ).alias("passages_in_content"),
        F.expr(
            "forall(regexp_extract_all(snippet, '<b>(.*?)</b>', 1), "
            f"x -> array_contains({terms_arr}, lower(x)))"
        ).alias("marks_are_terms"),
    )


SNIPPET_DF_TERMS = ["table", "part", "dup", "key", "zz_no_such_term_zz"]


def _q_bm25_doc_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SearchResult.doc_freqs contract (reference types.h:259-346):
    global df per query term, 0 for absent terms, from the segment
    index's dictionary."""
    idx = _mapside_index(spark, sf_dir)
    dfs = idx.doc_freqs(SNIPPET_DF_TERMS)
    return spark.createDataFrame(
        list(zip(SNIPPET_DF_TERMS, dfs)), "term string, df int"
    )


def _q_events_windowed(spark, sf_dir):
    from wiser_spark.streaming.windows import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(events, window="10 minutes")


def _q_events_sliding(spark, sf_dir):
    """SLIDING windows (10 min length, 5 min slide) — each event lands
    in two overlapping epoch-aligned windows."""
    from wiser_spark.streaming.windows import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(events, window="10 minutes", slide="5 minutes")


def _q_events_sessionize(spark, sf_dir):
    from wiser_spark.streaming.windows import sessionize_batch

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_batch(events, gap_minutes=30)


# ------------------------------------------------- multimodal operators
# the documents table has no real media column; the entries treat the
# UTF-8 bytes of `text` as the opaque blob — the plumbing under test
# (binary schema, JVM metadata expressions, Arrow batch UDFs, stride
# sampling) is exactly what a real image/audio column would flow through


def _blobs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), F.col("text").cast("binary").alias("blob")
    )


def _q_multimodal_metadata(spark, sf_dir):
    from wiser_spark.operators.multimodal import binary_metadata

    return binary_metadata(_blobs(spark, sf_dir))


def _q_multimodal_frame_sample(spark, sf_dir):
    from wiser_spark.operators.multimodal import frame_sample_stub

    return frame_sample_stub(_blobs(spark, sf_dir), every_n_bytes=64)


def _q_multimodal_features(spark, sf_dir):
    """Deterministic fake-feature extraction. The fake features are
    md5-byte-derived (feature[i] = float32((md5_byte[i]/255)*2-1)), so
    they ARE SQL-expressible — the entry explodes the vector to
    (id, idx, value double) rows and gets a full DuckDB oracle (exact
    IEEE arithmetic on both engines, no rounding needed)."""
    from wiser_spark.operators.multimodal import extract_features

    out = extract_features(_blobs(spark, sf_dir), dim=16, fake=True)
    return out.select(
        "id", F.posexplode("feature").alias("idx", "v")
    ).select("id", F.col("idx").cast("int"), F.col("v").cast("double").alias("value"))


MULTIMODAL_METADATA_SQL = """
SELECT doc_id AS id, length(text)::INT AS n_bytes,
       lower(hex(substr(text, 1, 8))) AS head_hex,
       sha256(text) AS sha256
FROM documents
"""

# python range(0, max(len,1), 64) semantics: >=1 sample even for empty
MULTIMODAL_FRAME_SAMPLE_SQL = """
SELECT doc_id AS id, i::INT AS sample_idx, (i*64)::BIGINT AS offset,
       sha256(substr(text, (i*64+1)::BIGINT, 64)) AS chunk_sha256
FROM documents, UNNEST(range(0, greatest(ceil(length(text)/64.0)::BIGINT, 1))) t(i)
"""

# feature[i] = float32((md5_byte[i]/255)*2-1): md5 hex nibbles -> byte ->
# the same f64->f32->f64 IEEE chain the engine computes (exact match)
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id AS id, i::INT AS idx,
       CAST(CAST((((strpos('0123456789abcdef', substr(md5(text), 2*i+1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr(md5(text), 2*i+2, 1)) - 1)
         / 255.0) * 2.0 - 1.0 AS FLOAT) AS DOUBLE) AS value
FROM documents, UNNEST(range(0, 16)) t(i)
"""


# a small mixed-shape query log answered in ONE batched job
BATCH_LOG: list[tuple[int, list[str], bool]] = [
    (0, ["key"], False),
    (1, ["dup", "key"], False),
    (2, ["spark", "window", "sort"], False),
    (3, ["table", "part"], True),
]


def _q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wiser_spark.operators.topk import bm25_topk_batch

    _, postings, docstats = _built(spark, sf_dir)
    postings = postings.cache()
    out = bm25_topk_batch(
        postings, docstats, build_dictionary(postings), corpus_stats(docstats),
        BATCH_LOG, k=10, params=PARAMS,
    )
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score")
    )


# the reference-style text query log (quoted line => phrase), parsed by
# the S8 source and answered end-to-end through the segment batch path
QUERY_LOG_TEXT = """key
dup key
spark window sort
"table part"
key zz_no_such_term_zz
"batch window spark"
"""


def _q_bm25_from_querylog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end S8 -> Q12: write the text query log, parse it with the
    query-log source, answer the whole log via search_batch."""
    import hashlib
    import tempfile

    from wiser_spark.sources.querylog import load_query_log

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/wiser_entry_qlog_{tag}.txt"
    with open(path, "w") as f:
        f.write(QUERY_LOG_TEXT)
    queries = [
        (q.query_id, list(q.terms), q.is_phrase) for q in load_query_log(path)
    ]
    idx = _mapside_index(spark, sf_dir)
    out = idx.search_batch(queries, k=10)
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score")
    )


def _querylog_oracle_sql() -> str:
    from wiser_spark.sources.querylog import parse_query_line

    parts = []
    for i, line in enumerate(QUERY_LOG_TEXT.splitlines()):
        terms, is_phrase = parse_query_line(line)
        parts.append(
            f"SELECT {i} AS query_id, * FROM ("
            + osql.bm25_topk_sql(terms, k=10, params=PARAMS, is_phrase=is_phrase)
            + ")"
        )
    return " UNION ALL ".join(parts)


def _q_bm25_batch_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same query log answered by SegmentIndex.search_batch — ONE
    pass over the segment table for the whole log (the QPS path)."""
    idx = _mapside_index(spark, sf_dir)
    out = idx.search_batch(BATCH_LOG, k=10)
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive BM25 top-10 on sf0.001."""
    return _bm25_query(["dup", "key"], False)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {
        "postings": _q_postings,
        "postings_offsets": _q_postings_offsets,
        "term_dict": _q_term_dict,
        "term_prefix": _q_term_prefix,
        "doc_stats": _q_doc_stats,
        "corpus_stats": _q_corpus_stats,
        "topk_from_segments": _q_topk_from_segments,
        "doc_store_roundtrip": _q_doc_store_roundtrip,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "curation_kept_docs": _q_curation_kept_docs,
        "text_token_counts": _q_text_token_counts,
        "text_language_id": _q_text_language_id,
        "text_quality": _q_text_quality,
        "text_fingerprint": _q_text_fingerprint,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_ivfpq_topk": _q_ann_ivfpq_topk,
        "embedding_sim_pairs": _q_embedding_sim_pairs,
        "events_windowed": _q_events_windowed,
        "events_sliding": _q_events_sliding,
        "events_sessionize": _q_events_sessionize,
        "bm25_batch_log": _q_bm25_batch,
        "bm25_batch_segments": _q_bm25_batch_segments,
        "topk_from_segments_mapside": _q_topk_mapside,
        "bm25_snippets": _q_bm25_snippets,
        "bm25_snippets_store": _q_bm25_snippets_store,
        "bm25_snippets_inv": _q_bm25_snippets_inv,
        "bm25_doc_freqs": _q_bm25_doc_freqs,
        "bm25_from_querylog": _q_bm25_from_querylog,
        "multimodal_metadata": _q_multimodal_metadata,
        "multimodal_frame_sample": _q_multimodal_frame_sample,
        "multimodal_features": _q_multimodal_features,
    }
    for name, (terms, is_phrase) in BM25_QUERIES.items():
        out[name] = _bm25_query(terms, is_phrase)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "postings": osql.postings_sql(),
        "postings_offsets": osql.postings_offsets_sql(),
        "term_dict": osql.term_dict_sql(),
        "term_prefix": osql.term_dict_sql()
        + " WHERE term LIKE 's%' ORDER BY term",
        "doc_stats": osql.doc_stats_sql(),
        "corpus_stats": osql.corpus_stats_sql(),
        # the segment path answers the same query as bm25_and2 — one SQL
        # oracle checks both the relational plan and the binary format
        "topk_from_segments": osql.bm25_topk_sql(
            ["dup", "key"], k=10, params=PARAMS, is_phrase=False
        ),
        "doc_store_roundtrip": DOC_STORE_SQL,
        "dedup_exact": csql.exact_dedup_sql(),
        "dedup_ngram_jaccard": csql.ngram_jaccard_sql(k=3, threshold=0.5),
        "dedup_minhash_lsh": csql.minhash_lsh_sql(
            num_hashes=32, bands=8, k=3, threshold=0.5
        ),
        "dedup_clusters": csql.dedup_clusters_sql(
            num_hashes=32, bands=8, k=3, threshold=0.5
        ),
        "dedup_simhash": csql.simhash_sql(),
        "dedup_simhash_pairs": csql.simhash_pairs_sql(max_distance=3),
        "curation_kept_docs": csql.kept_docs_sql(min_quality=0.5),
        "text_token_counts": csql.token_counts_sql(),
        "text_language_id": csql.language_id_sql(),
        "text_quality": csql.quality_score_sql(),
        "text_fingerprint": csql.fingerprint_sql(k=5),
        "ann_cosine_topk": csql.cosine_topk_sql(query_vec_id=0, k=10),
        "ann_lsh_topk": csql.lsh_topk_sql(
            query_vec_id=0, k=10, n_planes=8, n_tables=2
        ),
        "ann_ivf_topk": csql.ivf_topk_sql(
            query_vec_id=0, k=10, n_centroids=16, nprobe=4
        ),
        "ann_ivfpq_topk": csql.ivfpq_topk_sql(
            query_vec_id=0, k=10, n_centroids=16, nprobe=4,
            m=8, ks=16, dim=64, refine=4,
        ),
        "embedding_sim_pairs": csql.embedding_sim_pairs_sql(
            threshold=0.3, n_planes=8, n_tables=2
        ),
        "events_windowed": """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
         AS window_end,
       event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
        # sliding: each event belongs to the 2 epoch-aligned 10-minute
        # windows whose start is within (ts - 10min, ts], stepped by 5min
        "events_sliding": """
WITH exploded AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts)
           - (i * INTERVAL '5 minutes') AS window_start,
         event_type, value, ts
  FROM events, UNNEST(range(0, 2)) t(i)
)
SELECT window_start, window_start + INTERVAL '10 minutes' AS window_end,
       event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM exploded
WHERE ts >= window_start AND ts < window_start + INTERVAL '10 minutes'
GROUP BY 1, 2, 3
""",
        "events_sessionize": """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts))::INT - 1
           AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*)::INT AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, session_id
""",
        "topk_from_segments_mapside": osql.bm25_topk_sql(
            ["dup", "key"], k=10, params=PARAMS, is_phrase=False
        ),
        "bm25_snippets": osql.bm25_topk_sql(
            ["table", "part"], k=10, params=PARAMS, is_phrase=True
        ),
        "bm25_snippets_store": osql.bm25_topk_sql(
            ["table", "part"], k=10, params=PARAMS, is_phrase=True
        ),
        # the snippet invariants hold by construction, so the oracle
        # pins literal TRUE for both booleans — the hash compare then
        # fails iff the engine's projected invariants ever go false
        "bm25_snippets_inv": (
            "SELECT rank, doc_id, score, TRUE AS passages_in_content, "
            "TRUE AS marks_are_terms FROM ("
            + osql.bm25_topk_sql(
                ["dup", "key"], k=10, params=PARAMS, is_phrase=False
            )
            + ")"
        ),
        "bm25_doc_freqs": osql.doc_freqs_sql(SNIPPET_DF_TERMS),
        "bm25_from_querylog": _querylog_oracle_sql(),
        "multimodal_metadata": MULTIMODAL_METADATA_SQL,
        "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_SQL,
        "multimodal_features": MULTIMODAL_FEATURES_SQL,
        "bm25_batch_log": " UNION ALL ".join(
            f"SELECT {qid} AS query_id, * FROM ("
            + osql.bm25_topk_sql(terms, k=10, params=PARAMS, is_phrase=ph)
            + ")"
            for qid, terms, ph in BATCH_LOG
        ),
        "bm25_batch_segments": " UNION ALL ".join(
            f"SELECT {qid} AS query_id, * FROM ("
            + osql.bm25_topk_sql(terms, k=10, params=PARAMS, is_phrase=ph)
            + ")"
            for qid, terms, ph in BATCH_LOG
        ),
    }
    for name, (terms, is_phrase) in BM25_QUERIES.items():
        out[name] = osql.bm25_topk_sql(terms, k=10, params=PARAMS, is_phrase=is_phrase)
    return out
