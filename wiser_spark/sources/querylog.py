"""Query-log source: one query per line; a line wrapped in double quotes
is a phrase query (reference ``query_pool.h:251-315``, IsPhrase
``:308-311``). Terms are space-separated, lowercased with the engine
tokenizer's alphabet."""

from __future__ import annotations

from dataclasses import dataclass

from wiser_spark.functions.tokenize import tokenize_text


@dataclass(frozen=True)
class Query:
    query_id: int
    terms: tuple[str, ...]
    is_phrase: bool


def parse_query_line(line: str) -> tuple[list[str], bool]:
    line = line.strip()
    is_phrase = len(line) >= 2 and line.startswith('"') and line.endswith('"')
    if is_phrase:
        line = line[1:-1]
    return tokenize_text(line), is_phrase


def load_query_log(path: str) -> list[Query]:
    out = []
    with open(path) as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            terms, is_phrase = parse_query_line(line)
            if terms:
                out.append(Query(i, tuple(terms), is_phrase))
    return out


def query_log_df(spark, path: str):
    rows = [
        (q.query_id, list(q.terms), q.is_phrase) for q in load_query_log(path)
    ]
    return spark.createDataFrame(
        rows, "query_id int, terms array<string>, is_phrase boolean"
    )
