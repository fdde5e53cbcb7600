"""DuckDB oracles for the corpus-curation operators (dedup, similarity,
textstats). Hash-parity with the Spark side comes from the shared
md5-derived integer hash: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``."""

from __future__ import annotations

from wiser_spark.config import TOKEN_SPLIT_REGEX
from wiser_spark.operators.dedup import (
    HASH_MULT_A,
    HASH_MULT_B,
    MERSENNE_P,
    SIMHASH_BITS,
)
from wiser_spark.operators.textstats import (
    CJK_REGEX,
    LANG_MARKERS,
    STOPWORDS_EN,
)

_TOKS = f"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_REGEX}'),
                     x -> x <> '') AS toks
  FROM documents
)
"""


def _md5l(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def _shingles(k: int = 3) -> str:
    # HASHED shingles, mirroring dedup.shingles(): 60-bit md5 longs so
    # the joins compare 8-byte keys on both engines
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    return f"""
sh AS (
  SELECT DISTINCT doc_id, {_md5l(gram)} AS shingle
  FROM toks, UNNEST(range(1, greatest(len(toks) - {k - 2}, 1))) AS t(i)
)
"""


_JACCARD = """
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def exact_dedup_sql() -> str:
    return (
        "SELECT sha256(text) AS sha256, min(doc_id) AS keeper_doc_id, "
        "count(*) AS n_copies FROM documents GROUP BY sha256(text)"
    )


def ngram_jaccard_sql(
    k: int = 3, threshold: float = 0.5, max_shingle_df: int | None = None
) -> str:
    if max_shingle_df is None:
        from wiser_spark.operators.dedup import MAX_SHINGLE_DF

        max_shingle_df = MAX_SHINGLE_DF
    # same stopword-shingle cap as the Spark side (dedup.MAX_SHINGLE_DF):
    # shingles with df > cap are dropped BEFORE pair generation and sizes
    sh_all = _shingles(k).replace("sh AS", "sh_all AS", 1)
    return f"""
WITH {_TOKS}, {sh_all},
rare AS (
  SELECT shingle FROM sh_all GROUP BY shingle
  HAVING count(*) <= {max_shingle_df}
),
sh AS (SELECT s.doc_id, s.shingle FROM sh_all s SEMI JOIN rare USING (shingle)),
{_JACCARD}
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {threshold!r}
"""


def minhash_lsh_sql(
    num_hashes: int = 32, bands: int = 8, k: int = 3, threshold: float = 0.5
) -> str:
    rows_per_band = num_hashes // bands
    return f"""
WITH {_TOKS}, {_shingles(k)},
hx AS (SELECT DISTINCT doc_id, shingle % {MERSENNE_P} AS x FROM sh),
mh AS (
  SELECT doc_id, i,
         min(((((i + 1) * {HASH_MULT_A}) % {MERSENNE_P}) * x
              + (((i + 1) * {HASH_MULT_B}) % {MERSENNE_P})) % {MERSENNE_P}) AS minhash
  FROM hx, UNNEST(range(0, {num_hashes})) AS t(i)
  GROUP BY doc_id, i
),
banded AS (
  SELECT doc_id, (i // {rows_per_band})::INT AS band,
         string_agg(i || ':' || minhash, '_' ORDER BY i || ':' || minhash) AS key
  FROM mh GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r USING (band, key)
  WHERE l.doc_id < r.doc_id
),
{_JACCARD.strip().rstrip()}
SELECT j.doc_a, j.doc_b, round(j.jaccard, 6) AS jaccard
FROM jac j JOIN cand USING (doc_a, doc_b)
WHERE j.jaccard >= {threshold!r}
"""


def dedup_clusters_sql(
    num_hashes: int = 32, bands: int = 8, k: int = 3, threshold: float = 0.5
) -> str:
    """Connected components over the MinHash-LSH near-dup pairs via a
    recursive min-label closure; keeper = component min doc_id."""
    pairs_q = minhash_lsh_sql(num_hashes, bands, k, threshold).strip()
    return f"""
WITH RECURSIVE p AS ({pairs_q}),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM e JOIN reach r ON e.dst = r.doc_id
)
SELECT doc_id, min(label) AS keeper_doc_id FROM reach GROUP BY doc_id
"""


def simhash_sql() -> str:
    mask = (1 << SIMHASH_BITS) - 1
    return f"""
WITH {_TOKS},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks) GROUP BY 1, 2
),
hx AS (SELECT doc_id, tf, {_md5l("term")} & {mask} AS h FROM tf),
bits AS (
  SELECT doc_id, i AS bit,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM hx, UNNEST(range(0, {SIMHASH_BITS})) AS t(i)
  GROUP BY doc_id, i
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


def simhash_pairs_sql(max_distance: int = 3) -> str:
    """Banded-blocking SimHash near-dup pairs (mirror of
    dedup.simhash_pairs): 4 x 12-bit band keys -> candidate join ->
    popcount verification."""
    from wiser_spark.operators.dedup import SIMHASH_BAND_BITS, SIMHASH_BANDS

    mask = (1 << SIMHASH_BAND_BITS) - 1
    body = simhash_sql().strip()
    return f"""
WITH fp AS ({body}),
banded AS (
  SELECT doc_id, simhash, i AS band,
         (simhash >> ({SIMHASH_BAND_BITS} * i)) & {mask} AS key
  FROM fp, UNNEST(range(0, {SIMHASH_BANDS})) AS t(i)
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, l.simhash AS fp_a,
                  r.doc_id AS doc_b, r.simhash AS fp_b
  FROM banded l JOIN banded r USING (band, key)
  WHERE l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {max_distance}
"""


def token_counts_sql() -> str:
    return f"""
WITH {_TOKS}
SELECT d.doc_id, length(d.text)::INT AS n_chars,
       len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''))::INT
         AS n_ws_tokens,
       len(t.toks)::INT AS n_code_tokens,
       len(list_distinct(t.toks))::INT AS n_distinct_tokens
FROM documents d JOIN toks t USING (doc_id)
"""


def language_id_sql() -> str:
    hits = ", ".join(
        f"len(regexp_extract_all(lower(text), '{rx}')) AS hits_{lang}"
        for lang, rx in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANG_MARKERS) + ")"
    pred = "CASE WHEN hits_cjk > 0 THEN 'zh' "
    for lang in LANG_MARKERS:
        pred += f"WHEN {best} > 0 AND hits_{lang} = {best} THEN '{lang}' "
    pred += "ELSE 'und' END"
    total = " + ".join(f"hits_{lang}" for lang in LANG_MARKERS) + " + hits_cjk"
    return f"""
WITH h AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '{CJK_REGEX}')) AS hits_cjk,
         {hits}
  FROM documents
)
SELECT doc_id, {pred} AS lang_pred, ({total})::INT AS lang_hits FROM h
"""


def quality_score_sql() -> str:
    return f"""
WITH {_TOKS},
base AS (
  SELECT d.doc_id,
         length(d.text)::DOUBLE AS n_chars,
         len(t.toks)::DOUBLE AS n_toks,
         (length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')))::DOUBLE
           AS n_punct,
         len(list_filter(regexp_split_to_array(lower(d.text), '{TOKEN_SPLIT_REGEX}'),
             x -> regexp_full_match(x, '({STOPWORDS_EN})')))::DOUBLE AS n_stop,
         CASE WHEN len(t.toks) > 0
              THEN list_sum(list_transform(t.toks, s -> length(s)))::DOUBLE / len(t.toks)
              ELSE 0.0 END AS mean_tok
  FROM documents d JOIN toks t USING (doc_id)
),
scored AS (
  SELECT doc_id,
         least(n_chars / 500.0, 1.0) AS len_score,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END AS stop_ratio,
         mean_tok
  FROM base
)
SELECT doc_id,
       round(len_score, 6) AS len_score,
       round(punct_ratio, 6) AS punct_ratio,
       round(stop_ratio, 6) AS stopword_ratio,
       round(mean_tok, 6) AS mean_token_len,
       round(0.4 * len_score
             + 0.2 * (1.0 - least(punct_ratio * 4.0, 1.0))
             + 0.2 * least(stop_ratio * 5.0, 1.0)
             + 0.2 * (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0
                           THEN 1.0 ELSE 0.5 END), 6) AS quality
FROM scored
"""


def fingerprint_sql(k: int = 5) -> str:
    return f"""
WITH {_TOKS},
grams AS (
  SELECT doc_id, array_to_string(toks[i:i+{k - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(len(toks) - {k - 2}, 2))) AS t(i)
)
SELECT doc_id, min({_md5l("gram")}) AS fingerprint FROM grams GROUP BY doc_id
"""


def kept_docs_sql(
    min_quality: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
) -> str:
    """The full curation keep-list (mirror of curation.curate_corpus):
    quality gate + language tag + near-dup cluster keepers."""
    q = quality_score_sql().strip()
    lang = language_id_sql().strip()
    c = dedup_clusters_sql(num_hashes, bands, k, threshold).strip()
    return f"""
SELECT q.doc_id, l.lang_pred, q.quality
FROM ({q}) q
JOIN ({lang}) l USING (doc_id)
JOIN ({c}) c USING (doc_id)
WHERE c.keeper_doc_id = q.doc_id AND q.quality >= {min_quality!r}
"""


# ------------------------------------------------------------- embeddings
_COS = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
)


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
scored AS (SELECT e.vec_id, {_COS} AS cosine FROM embeddings e, q)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id)::INT AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM scored ORDER BY cosine DESC, vec_id LIMIT {k}
"""


def _bucket_expr(planes: list[list[float]], rel: str = "e") -> str:
    """Sign-pattern bucket id as SQL; hyperplanes injected as repr'd
    literals — byte-identical doubles to similarity.hyperplane()."""
    return " + ".join(
        f"(CASE WHEN list_dot_product({rel}.embedding::DOUBLE[], ["
        + ", ".join(repr(v) for v in plane)
        + f"]) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )


def _bucketed_cte(n_planes: int, n_tables: int, dim: int) -> str:
    """bucketed(vec_id, embedding, tbl, bucket) — one row per (vector,
    table), mirror of similarity._bucketed()."""
    from wiser_spark.operators.similarity import table_planes

    per_table = " UNION ALL ".join(
        f"SELECT e.vec_id, e.embedding, {t} AS tbl, "
        f"{_bucket_expr(planes)} AS bucket FROM embeddings e"
        for t, planes in enumerate(table_planes(n_planes, n_tables, dim))
    )
    return f"bucketed AS ({per_table})"


def embedding_sim_pairs_sql(
    threshold: float = 0.3, n_planes: int = 8, n_tables: int = 2, dim: int = 64
) -> str:
    """Multi-table same-bucket embedding pairs above a cosine threshold
    (pairs deduped across tables BEFORE the cosine, like the Spark side)."""
    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
WITH {_bucketed_cte(n_planes, n_tables, dim)},
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM bucketed l JOIN bucketed r USING (tbl, bucket)
  WHERE l.vec_id < r.vec_id
)
SELECT c.vec_a, c.vec_b, round({cos}, 6) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE {cos} >= {threshold!r}
"""


def ivf_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> str:
    """IVF-flat oracle: deterministic SPREAD-SAMPLED centroids (lowest
    md5(vec_id) values, ties -> lower vec_id — the same uniform sample
    the engine draws), max-cosine assignment (ties -> lower centroid
    id), probe the nprobe nearest cells, exact cosine top-k over the
    probed cells."""
    cos_bc = (
        "list_dot_product(b.embedding::DOUBLE[], c.cemb::DOUBLE[]) / "
        "(sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(c.cemb::DOUBLE[], c.cemb::DOUBLE[])))"
    )
    cos_cq = (
        "list_dot_product(c.cemb::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(c.cemb::DOUBLE[], c.cemb::DOUBLE[])) * "
        "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings
  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
  LIMIT {n_centroids}
),
assigned AS (
  SELECT b.vec_id, b.embedding, c.cid AS cell
  FROM embeddings b CROSS JOIN cents c
  QUALIFY row_number() OVER (
    PARTITION BY b.vec_id ORDER BY {cos_bc} DESC, c.cid
  ) = 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT c.cid FROM cents c, q
  ORDER BY {cos_cq} DESC, c.cid LIMIT {nprobe}
),
scored AS (
  SELECT a.vec_id, {_COS.replace("e.embedding", "a.embedding")} AS cosine
  FROM assigned a JOIN probe p ON a.cell = p.cid CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id)::INT AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM scored ORDER BY cosine DESC, vec_id LIMIT {k}
"""


def ivfpq_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    refine: int = 4,
) -> str:
    """IVF-PQ oracle — the FULL pipeline differentially, not just the
    re-rank: spread-sampled centroids + cells (as ivf_topk_sql),
    spread-sampled PQ codebooks (the ks lowest md5('pq:' || vec_id),
    code j = j-th in that order; subspace s's codeword = the sample's
    s-slice), per-(vector, subspace) argmin encode with the SAME
    expression the engine evaluates (dot(c,c) - 2*dot(x_s,c), ties ->
    lower code), ADC approximate cosine over the probed cells' codes,
    top k*refine candidates, exact-cosine re-rank."""
    ds = dim // m
    md5pq = "('0x' || substr(md5('pq:' || vec_id::VARCHAR), 1, 15))::BIGINT"
    cos_bc = (
        "list_dot_product(b.embedding::DOUBLE[], c.cemb::DOUBLE[]) / "
        "(sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(c.cemb::DOUBLE[], c.cemb::DOUBLE[])))"
    )
    cos_cq = (
        "list_dot_product(c.cemb::DOUBLE[], q.qv::DOUBLE[]) / "
        "(sqrt(list_dot_product(c.cemb::DOUBLE[], c.cemb::DOUBLE[])) * "
        "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
    )
    xs = (
        f"list_slice(b.embedding::DOUBLE[], cb.sub * {ds} + 1, "
        f"(cb.sub + 1) * {ds})"
    )
    qs = f"list_slice(q.qv::DOUBLE[], cb.sub * {ds} + 1, (cb.sub + 1) * {ds})"
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings
  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
  LIMIT {n_centroids}
),
assigned AS (
  SELECT b.vec_id, c.cid AS cell
  FROM embeddings b CROSS JOIN cents c
  QUALIFY row_number() OVER (
    PARTITION BY b.vec_id ORDER BY {cos_bc} DESC, c.cid
  ) = 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT c.cid FROM cents c, q
  ORDER BY {cos_cq} DESC, c.cid LIMIT {nprobe}
),
cw AS (
  SELECT row_number() OVER (ORDER BY {md5pq}, vec_id) - 1 AS code, embedding
  FROM embeddings
  ORDER BY {md5pq}, vec_id
  LIMIT {ks}
),
cb AS (
  SELECT s.sub, cw.code,
         list_slice(cw.embedding::DOUBLE[], s.sub * {ds} + 1,
                    (s.sub + 1) * {ds}) AS cvec
  FROM cw CROSS JOIN (SELECT unnest(range({m})) AS sub) s
),
codes AS (
  SELECT b.vec_id, cb.sub, cb.code
  FROM embeddings b CROSS JOIN cb
  QUALIFY row_number() OVER (
    PARTITION BY b.vec_id, cb.sub
    ORDER BY list_dot_product(cb.cvec, cb.cvec)
             - 2 * list_dot_product({xs}, cb.cvec) ASC,
             cb.code
  ) = 1
),
lut AS (
  SELECT cb.sub, cb.code,
         list_dot_product({qs}, cb.cvec) AS dp,
         list_dot_product(cb.cvec, cb.cvec) AS c2
  FROM cb CROSS JOIN q
),
qn AS (SELECT sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) AS n FROM q),
approx AS (
  SELECT co.vec_id, sum(l.dp) / (any_value(qn.n) * sqrt(sum(l.c2))) AS approx
  FROM codes co
  JOIN lut l ON co.sub = l.sub AND co.code = l.code
  JOIN assigned a ON a.vec_id = co.vec_id
  JOIN probe p ON a.cell = p.cid
  CROSS JOIN qn
  GROUP BY co.vec_id
),
cand AS (SELECT vec_id FROM approx ORDER BY approx DESC, vec_id
         LIMIT {k * refine}),
scored AS (
  SELECT e.vec_id, {_COS} AS cosine
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id)::INT AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM scored ORDER BY cosine DESC, vec_id LIMIT {k}
"""


def lsh_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
) -> str:
    """Multi-table probe: candidates = vectors sharing the query's
    bucket in ANY table (distinct), then exact cosine top-k."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
{_bucketed_cte(n_planes, n_tables, dim)},
qb AS (SELECT tbl, bucket FROM bucketed WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT DISTINCT b.vec_id
  FROM bucketed b JOIN qb USING (tbl, bucket)
),
scored AS (
  SELECT e.vec_id, {_COS} AS cosine
  FROM embeddings e JOIN cand USING (vec_id), q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id)::INT AS rank,
       vec_id, round(cosine, 6) AS cosine
FROM scored ORDER BY cosine DESC, vec_id LIMIT {k}
"""
