"""ANSI-SQL (DuckDB) oracles mirroring the Spark engine, token for token.

Every numeric expression is written in the SAME operation order as the
Spark side (operators/topk.py, operators/docstats.py) so both systems do
identical IEEE double arithmetic; ``ln`` may differ in the last ulp
between libms, which the final ``round(score, 6)`` absorbs.

The tokenizer, doc length, Char4 lossy encode/decode and BM25 here are
the SQL renditions of the single shared spec (functions/tokenize.py,
functions/char4.py, functions/bm25.py).
"""

from __future__ import annotations

from wiser_spark.config import TOKEN_SPLIT_REGEX, BM25Params

# Shared CTE prefix over the pre-registered `documents` view
# (driver schema: doc_id BIGINT, text, lang, source, n_chars).
_BASE = f"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_REGEX}'),
                     x -> x <> '') AS toks,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS dl
  FROM documents
),
postings AS (
  SELECT term, doc_id, count(*)::INT AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
  GROUP BY term, doc_id
),
dict AS (SELECT term, count(*)::INT AS df FROM postings GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl::DOUBLE) AS avgdl FROM toks),
lenc AS (
  SELECT doc_id, dl,
         CASE WHEN dl < 8 THEN dl
              ELSE ((dl >> (bl - 4)) & 7) | ((bl - 3) << 3) END AS c
  FROM (SELECT doc_id, dl,
               (floor(log2(greatest(dl, 1))) + 1)::BIGINT AS bl FROM toks)
),
ldec AS (
  SELECT doc_id, dl, c,
         CASE WHEN (c >> 3) - 1 < 0 THEN c & 7
              ELSE ((c & 7) | 8) << ((c >> 3) - 1) END AS dl_lossy
  FROM lenc
)
"""


def postings_sql() -> str:
    return f"WITH {_BASE} SELECT term, doc_id, tf FROM postings"


def postings_offsets_sql() -> str:
    """Oracle for the offsets column, SELF-VERIFYING: the Spark side
    extracts each occurrence's substring via its stored [start, end) byte
    span and returns it as ``extracted``; the oracle returns the token
    itself — the hashes match iff every stored offset pair is exact."""
    return f"""
WITH {_BASE},
occ AS (
  SELECT doc_id, unnest(toks) AS term,
         (generate_subscripts(toks, 1) - 1)::INT AS pos
  FROM toks
)
SELECT doc_id, pos, term, term AS extracted FROM occ
"""


def term_dict_sql() -> str:
    return f"WITH {_BASE} SELECT term, df FROM dict"


def doc_stats_sql() -> str:
    return (
        f"WITH {_BASE} "
        "SELECT d.doc_id, d.dl::INT AS doclen, d.c::INT AS doclen_char, "
        "sha256(docs.text) AS content_sha256 "
        "FROM ldec d JOIN documents docs USING (doc_id)"
    )


def corpus_stats_sql() -> str:
    return (
        f"WITH {_BASE} "
        "SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats"
    )


def doc_freqs_sql(terms: list[str]) -> str:
    """df per query term, 0 for terms absent from the corpus — the
    SearchResult.doc_freqs contract."""
    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    return f"""
WITH {_BASE}, q(term) AS (VALUES {vals})
SELECT q.term, coalesce(d.df, 0)::INT AS df
FROM q LEFT JOIN dict d USING (term)
"""


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    params: BM25Params | None = None,
    is_phrase: bool = False,
) -> str:
    """Top-k BM25 as one DuckDB query — the oracle for bm25_topk()."""
    p = params or BM25Params()
    n = len(terms)
    quoted = [t.replace("'", "''") for t in terms]

    cand_from = ", ".join(f"postings p{i}" for i in range(n))
    cand_where = " AND ".join(
        [f"p{i}.term = '{quoted[i]}'" for i in range(n)]
        + [f"p{i}.doc_id = p0.doc_id" for i in range(1, n)]
    )
    tf_cols = ", ".join(f"p{i}.tf AS tf_{i}" for i in range(n))
    cand = f"cand AS (SELECT p0.doc_id, {tf_cols} FROM {cand_from} WHERE {cand_where})"

    phrase_cte = ""
    phrase_filter = ""
    if is_phrase and n > 1:
        pos_from = ", ".join(f"pos q{i}" for i in range(n))
        pos_where = " AND ".join(
            [f"q{i}.term = '{quoted[i]}'" for i in range(n)]
            + [f"q{i}.doc_id = q0.doc_id" for i in range(1, n)]
            + [f"q{i}.pos = q0.pos + {i}" for i in range(1, n)]
        )
        phrase_cte = (
            ", pos AS (SELECT doc_id, unnest(toks) AS term, "
            "generate_subscripts(toks, 1) - 1 AS pos FROM toks), "
            f"pmatch AS (SELECT DISTINCT q0.doc_id FROM {pos_from} WHERE {pos_where})"
        )
        phrase_filter = " AND c.doc_id IN (SELECT doc_id FROM pmatch)"

    # literals repr'd from the same Python floats the Spark side uses
    k1p1, k1, one_minus_b, b = repr(p.k1 + 1.0), repr(p.k1), repr(1.0 - p.b), repr(p.b)
    contribs = []
    for i in range(n):
        idf = (
            f"ln(1.0 + (s.n_docs - d{i}.df + 0.5) / (d{i}.df + 0.5))"
        )
        tfnorm = (
            f"(c.tf_{i}::DOUBLE * {k1p1}) / "
            f"(c.tf_{i}::DOUBLE + {k1} * ({one_minus_b} + ({b} * l.dl_lossy::DOUBLE) / s.avgdl))"
        )
        contribs.append(f"({idf} * {tfnorm})")
    score = " + ".join(contribs)
    dict_from = ", ".join(f"dict d{i}" for i in range(n))
    dict_where = " AND ".join(f"d{i}.term = '{quoted[i]}'" for i in range(n))

    return f"""
WITH {_BASE}, {cand}{phrase_cte},
scored AS (
  SELECT c.doc_id, {score} AS score
  FROM cand c, stats s, ldec l, {dict_from}
  WHERE l.doc_id = c.doc_id AND {dict_where}{phrase_filter}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank,
       doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""
