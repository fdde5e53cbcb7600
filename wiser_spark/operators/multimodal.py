"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media DECODE is
stubbed because no image/audio library ships in this container — each
decoder raises NotImplementedError unless its library imports, with a
deterministic fake-feature path (`fake=True`) so pipelines exercise the
full distributed flow with stable outputs.

Schema convention for a multimodal table:
  (id long, modality string, blob binary, meta struct<...>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "id long, n_bytes int, head_hex string, sha256 string"
)
FEATURE_SCHEMA = "id long, feature array<float>, feat_dim int"


def binary_metadata(df: DataFrame, id_col: str = "id", blob_col: str = "blob") -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM expressions
    (length / hex prefix / sha2), no Python."""
    b = F.col(blob_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(b).cast("int").alias("n_bytes"),
        F.lower(F.hex(F.substring(b, 1, 8))).alias("head_hex"),
        F.sha2(b, 256).alias("sha256"),
    )


def _fake_features(blobs: pd.Series, dim: int) -> list[list[float]]:
    """Deterministic stand-in for a real encoder: md5-seeded floats."""
    out = []
    for blob in blobs:
        h = hashlib.md5(bytes(blob)).digest()
        seed = int.from_bytes(h[:8], "big") % (2**32)
        rng = np.random.default_rng(seed)
        out.append(rng.uniform(-1.0, 1.0, size=dim).astype(np.float32).tolist())
    return out


def extract_features(
    df: DataFrame,
    dim: int = 16,
    fake: bool = False,
    id_col: str = "id",
    blob_col: str = "blob",
    batch_size_hint: int = 256,
) -> DataFrame:
    """blob -> feature vector via mapInPandas (Arrow batches).

    With fake=False this requires a real decoder (PIL for images) and
    raises NotImplementedError per-batch if the library is absent — the
    distributed plumbing (schema, batching, partition behavior) is
    identical either way, which is what the tests pin down.
    """
    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = _fake_features(pdf["blob"], dim)
            else:
                try:
                    from PIL import Image  # noqa: F401  (absent in container)
                except ImportError as e:
                    raise NotImplementedError(
                        "real media decode needs an image library (PIL); "
                        "run with fake=True for the deterministic stub"
                    ) from e
                raise NotImplementedError("real decoder not wired in this build")
            yield pd.DataFrame(
                {"id": pdf["id"], "feature": feats, "feat_dim": dim}
            )

    return sel.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, every_n_bytes: int = 1024, id_col: str = "id", blob_col: str = "blob"
) -> DataFrame:
    """'Frame sampling' over an opaque stream: cut the blob at fixed
    strides and fingerprint each chunk (the video-keyframe analogue;
    deterministic, media-library-free). Output one row per sample:
    (id, sample_idx, offset, chunk_sha256)."""
    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, hashes = [], [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row["blob"])
                for i, off in enumerate(range(0, max(len(blob), 1), every_n_bytes)):
                    chunk = blob[off : off + every_n_bytes]
                    ids.append(row["id"])
                    idxs.append(i)
                    offs.append(off)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"id": ids, "sample_idx": idxs, "offset": offs,
                 "chunk_sha256": hashes}
            )

    return sel.mapInPandas(
        run, "id long, sample_idx int, offset long, chunk_sha256 string"
    )
