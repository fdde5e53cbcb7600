"""The code tokenizer — ONE definition, four consumers.

Tokens are maximal runs of ``[a-z0-9_]`` in the lowercased content
(identifiers, keywords, numbers; punctuation/operators/whitespace all
split). Doc length for BM25 is DIFFERENT from token count: it replicates
the reference's ``BodyLength()`` = number of non-empty chunks of the RAW
body split on the single character ``' '`` (reference ``types.cc:38-40``,
``utils.cc:29-41,163-165``) — newlines/tabs are NOT separators there.

Consumers that must agree exactly (and are tested against each other):
  1. Spark JVM path:   ``tokens_col`` / ``doclen_col`` (pure Catalyst
     expressions — whole-stage codegen, zero Python in the hot path).
  2. Pandas-UDF path:  ``tokenize_series`` (Arrow-vectorized; used where a
     Python kernel needs tokens, e.g. the oracle-parity test).
  3. Pure-Python oracle: ``tokenize_text``.
  4. DuckDB oracle SQL: ``DUCKDB_TOKENS_EXPR`` / ``DUCKDB_DOCLEN_EXPR``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from wiser_spark.config import TOKEN_SPLIT_REGEX

_TOKEN_RE = re.compile(r"[a-z0-9_]+")


# ---------------------------------------------------------------- python
def tokenize_text(content: str) -> list[str]:
    return _TOKEN_RE.findall(content.lower())


def doclen_text(content: str) -> int:
    return sum(1 for chunk in content.split(" ") if chunk)


def tokenize_series(contents):
    """pandas Series[str] -> Series[list[str]] (Arrow-vectorized batch)."""
    return contents.str.lower().str.findall(_TOKEN_RE)


# ----------------------------------------------------------------- spark
def tokens_col(content: Column) -> Column:
    """array<string> of tokens — JVM-side, codegen-friendly."""
    return F.filter(
        F.split(F.lower(content), TOKEN_SPLIT_REGEX), lambda x: x != F.lit("")
    )


def doclen_col(content: Column) -> Column:
    """Reference BodyLength(): non-empty chunks of raw content split on ' '."""
    return F.size(F.filter(F.split(content, " ", -1), lambda x: x != F.lit("")))


# ---------------------------------------------------------------- duckdb
def duckdb_tokens_expr(col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_REGEX}'), "
        "x -> x <> '')"
    )


def duckdb_doclen_expr(col: str) -> str:
    return f"len(list_filter(string_split({col}, ' '), x -> x <> ''))"
