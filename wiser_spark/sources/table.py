"""Input-table reader: the Iceberg table of source-code repositories.

North-rule input shape (BASELINE.json input_hint):
``(repo string, path string, commit string, lang string, content
string)``. In production the table is Iceberg — Catalyst gets snapshot
isolation, hidden-partition pruning and file-level min/max skipping for
free through the DataSourceV2 reader. This sandbox ships no Iceberg
runtime jars, so the reader degrades to the plain parquet directory
with identical downstream semantics (both arrive as a DataFrame; every
operator in this engine is source-agnostic from there).

Reference input analogue: the line-doc file + LineDocParser family
(``src/qq_mem/src/utils.h:48-80``, ``engine_loader.h:84-96``) — here the
lake table IS the doc store (SURVEY §2.1 S1/S2/S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus_table(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    langs: list[str] | None = None,
) -> DataFrame:
    """Load the source-code corpus table.

    ``source``: an Iceberg catalog table name (``cat.db.files``) or a
    filesystem path. ``fmt``: "iceberg" | "parquet" | "auto" (auto
    tries Iceberg first when the session has the runtime on the
    classpath, else parquet). ``langs`` pushes a language filter into
    the scan (partition/file pruning on a lang-partitioned table).

    Raises ValueError if the table is missing any north-rule column;
    extra columns are pruned (column pruning reaches the scan)."""
    df = None
    iceberg_err: Exception | None = None
    if fmt in ("iceberg", "auto"):
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as ex:
            if fmt == "iceberg":
                raise
            iceberg_err = ex
    if df is None:
        try:
            df = spark.read.parquet(source)
        except Exception:
            if iceberg_err is not None:
                # neither read worked: surface the ICEBERG diagnostic
                # (auth, snapshot, typo'd table name) unless it was just
                # the runtime being absent — a parquet-path error would
                # hide the real cause on an Iceberg-enabled cluster
                msg = str(iceberg_err)
                runtime_absent = (
                    "Failed to find data source" in msg
                    or "ClassNotFoundException" in msg
                    or "DATA_SOURCE_NOT_FOUND" in msg
                )
                if not runtime_absent:
                    raise iceberg_err
            raise
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus table {source!r} lacks required columns {missing}; "
            f"need {CORPUS_COLUMNS}"
        )
    df = df.select(*CORPUS_COLUMNS)
    if langs:
        df = df.where(df.lang.isin(langs))
    return df
