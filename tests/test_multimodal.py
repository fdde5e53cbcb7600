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


def test_fake_features_are_md5_derived(blobs):
    """The fake path is SQL-expressible by construction:
    feature[i] = float32((md5(blob)_byte[i % 16] / 255) * 2 - 1)."""
    import numpy as np

    got = {r["id"]: r["feature"] for r in
           extract_features(blobs, dim=20, fake=True).collect()}
    blob = b"FAKEPNG0003" * 53
    h = hashlib.md5(blob).digest()
    want = [float(np.float32((h[i % 16] / 255.0) * 2.0 - 1.0)) for i in range(20)]
    assert got[3] == want  # dim 20 cycles the 16 digest bytes


def _ppm(w, h, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes(), px


def _wav(rate, samples):
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + len(data).to_bytes(4, "little"))
    return hdr + data


def test_real_decode_ppm_wav_end_to_end(spark):
    """fake=False over a numpy-decodable corpus: PPM(P6) images and
    PCM16 WAV audio run end-to-end through mapInPandas — no external
    media library, real header parse + frombuffer decode."""
    import numpy as np

    from wiser_spark.operators.multimodal import decode_ppm, decode_wav

    img, px = _ppm(8, 6, seed=7)
    wav = _wav(16000, np.arange(-500, 500, dtype=np.int16))
    w2, h2, px2 = decode_ppm(img)
    assert (w2, h2) == (8, 6) and np.array_equal(px2, px)
    rate, samples = decode_wav(wav)
    assert rate == 16000 and samples.size == 1000 and samples[0] == -500

    rows = [(0, "image", bytearray(img)), (1, "audio", bytearray(wav))]
    df = spark.createDataFrame(rows, "id long, modality string, blob binary")
    got = {r["id"]: r["feature"] for r in
           extract_features(df, dim=16, fake=False).collect()}
    assert len(got) == 2 and all(len(v) == 16 for v in got.values())
    # image features: w/4096, h/4096 lead; channel means follow
    assert abs(got[0][0] - 8 / 4096.0) < 1e-6
    assert abs(got[0][2] - float(px[:, :, 0].mean() / 255.0)) < 1e-4
    # audio features: rate/48000 leads
    assert abs(got[1][0] - 16000 / 48000.0) < 1e-6
    # deterministic across runs
    again = {r["id"]: r["feature"] for r in
             extract_features(df, dim=16, fake=False).collect()}
    assert got == again


def test_real_decode_raises(blobs):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)) as ei:
        extract_features(blobs, dim=8, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_library_decoder_boundary(monkeypatch):
    """The try-import boundary (r04 item 9): with PIL absent a JPEG
    blob raises the explicit NotImplementedError; with a PIL-shaped
    module present the SAME blob decodes through the shared image
    summary — the decoders activate the day the environment provides
    the library, with no code change."""
    import numpy as np

    import wiser_spark.operators.multimodal as mm

    jpeg_blob = b"\xff\xd8\xff\xe0" + b"fake-jpeg-body" * 10
    monkeypatch.setattr(mm, "_PIL", None)
    with pytest.raises(NotImplementedError, match="image/audio library"):
        mm._real_features(jpeg_blob, 16)

    class FakeImg:
        width, height = 4, 2

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            px = np.zeros((2, 4, 3), dtype=np.uint8)
            px[..., 0] = 255  # pure red
            return px.astype(dtype) if dtype else px

    class FakePIL:
        @staticmethod
        def open(f):
            return FakeImg()

    monkeypatch.setattr(mm, "_PIL", FakePIL)
    feats = mm._real_features(jpeg_blob, 16)
    assert len(feats) == 16
    assert feats[0] == pytest.approx(4 / 4096.0)   # width
    assert feats[1] == pytest.approx(2 / 4096.0)   # height
    assert feats[2] == pytest.approx(1.0)          # R mean
    assert feats[3] == pytest.approx(0.0)          # G mean
    # the numpy PPM floor answers identically with or without PIL
    ppm = b"P6\n4 2\n255\n" + bytes(
        np.array([[255, 0, 0]] * 8, dtype=np.uint8)
    )
    with_pil = mm._real_features(ppm, 16)
    monkeypatch.setattr(mm, "_PIL", None)
    assert mm._real_features(ppm, 16) == with_pil == feats


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


def test_float_wav_routes_to_soundfile(monkeypatch):
    """A RIFF/WAVE blob that is NOT PCM16 (IEEE float, fmt=3) falls
    through the pure-numpy decoder to soundfile when the library is
    present, instead of failing the whole Arrow batch; without it the
    explicit ValueError still surfaces."""
    import struct

    import numpy as np

    import wiser_spark.operators.multimodal as mm

    # minimal RIFF/WAVE with fmt=3 (IEEE float) and an empty data chunk
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    monkeypatch.setattr(mm, "_SOUNDFILE", None)
    with pytest.raises(ValueError, match="PCM16"):
        mm._real_features(blob, 16)

    class FakeSF:
        @staticmethod
        def read(f, dtype="float64"):
            return np.linspace(-0.5, 0.5, 80), 8000

    monkeypatch.setattr(mm, "_SOUNDFILE", FakeSF)
    feats = mm._real_features(blob, 16)
    assert len(feats) == 16
    assert feats[0] == pytest.approx(8000 / 48000.0)  # sample rate
    assert feats[1] == pytest.approx(80 / 1e6)        # length
