"""Multimodal plumbing: metadata, fake features, frame sampling, and the
NotImplementedError gate for real decoders."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wiser_spark.operators.multimodal import (
    binary_metadata,
    extract_features,
    frame_sample_stub,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (i, "image", (f"FAKEPNG{i:04d}".encode() * (50 + i))) for i in range(20)
    ]
    return spark.createDataFrame(rows, "id long, modality string, blob binary")


def test_binary_metadata(blobs):
    got = {r["id"]: r for r in binary_metadata(blobs).collect()}
    assert got[3]["n_bytes"] == len(b"FAKEPNG0003" * 53)
    assert got[3]["head_hex"] == b"FAKEPNG0".hex()
    assert got[3]["sha256"] == hashlib.sha256(b"FAKEPNG0003" * 53).hexdigest()


def test_fake_features_deterministic(blobs):
    a = {r["id"]: r["feature"] for r in extract_features(blobs, dim=8, fake=True).collect()}
    b = {r["id"]: r["feature"] for r in extract_features(blobs, dim=8, fake=True).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert a[0] != a[1]  # different blobs -> different features


def test_real_decode_raises(blobs):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)) as ei:
        extract_features(blobs, dim=8, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling(blobs):
    out = frame_sample_stub(blobs, every_n_bytes=128).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    row3 = sorted(by_id[3], key=lambda r: r["sample_idx"])
    blob = b"FAKEPNG0003" * 53
    assert len(row3) == (len(blob) + 127) // 128
    assert row3[0]["offset"] == 0 and row3[1]["offset"] == 128
    assert row3[0]["chunk_sha256"] == hashlib.sha256(blob[:128]).hexdigest()
