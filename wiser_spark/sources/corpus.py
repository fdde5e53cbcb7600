"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input-table shape from BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.
Content mixes Zipfian keyword tokens with long-tail identifiers so the
term-df distribution shows the stopword-like skew ('return', 'import')
that the 10^12-scale build must handle. Seeded; byte-stable across runs.
"""

from __future__ import annotations

import hashlib
import random

KEYWORDS = [
    "return", "import", "def", "if", "else", "for", "while", "self",
    "class", "from", "int", "void", "static", "public", "func", "var",
    "const", "struct", "package", "new", "len", "range", "print", "true",
    "false", "none", "null", "try", "except", "raise",
]
LANGS = ["py", "py", "py", "java", "java", "go", "c"]


def _identifier(rng: random.Random) -> str:
    stems = ["get", "set", "load", "parse", "merge", "index", "query", "score"]
    nouns = ["user", "doc", "term", "posting", "shard", "buffer", "node", "row"]
    return (
        f"{rng.choice(stems)}_{rng.choice(nouns)}_{rng.randrange(16**3):03x}"
    )


def make_corpus(
    n_docs: int, seed: int = 42, min_lines: int = 3, max_lines: int = 40
) -> list[dict]:
    """Rows of the input table; deterministic in (n_docs, seed)."""
    rows = []
    for i in range(n_docs):
        rng = random.Random((seed << 20) ^ i)
        repo = f"org{i // 50}/repo{i % 50}"
        path = f"src/pkg{rng.randrange(8)}/mod{i}.{rng.choice(LANGS)}"
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        lang = path.rsplit(".", 1)[1]
        lines = []
        for _ in range(rng.randrange(min_lines, max_lines + 1)):
            n_words = rng.randrange(2, 9)
            words = []
            for _ in range(n_words):
                # Zipf-ish: 60% keyword draws weighted toward the head.
                if rng.random() < 0.6:
                    idx = min(int(rng.expovariate(0.25)), len(KEYWORDS) - 1)
                    words.append(KEYWORDS[idx])
                else:
                    words.append(_identifier(rng))
            indent = "    " * rng.randrange(3)
            lines.append(indent + " ".join(words) + rng.choice(["", ":", ";", "()"]))
        content = "\n".join(lines)
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang,
             "content": content}
        )
    # input tables have no inherent order; sort here only for reproducible
    # fixture files (docID assignment orders by (repo, path, commit) anyway)
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return rows


def corpus_df(spark, n_docs: int, seed: int = 42):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in
         ("repo", "path", "commit", "lang", "content")]
    )
    return spark.createDataFrame(make_corpus(n_docs, seed), schema)
