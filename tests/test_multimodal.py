"""Multimodal plumbing: binary columns + mapInPandas decode/sample
stubs — the Spark-side contract is real even though codecs are faked."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.operators import multimodal


def _media_df(spark):
    rows = [(i, bytes(range(0, 256)) * (i + 1)) for i in range(5)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_attach_media_meta(spark):
    df = multimodal.attach_media_meta(_media_df(spark), "payload", "image", "png")
    row = df.filter("id = 2").first()
    meta = row["payload_meta"]
    assert meta["media_type"] == "image"
    assert meta["format"] == "png"
    assert meta["n_bytes"] == 256 * 3
    assert meta["width"] is None  # unknown until decode


def test_decode_features_deterministic(spark):
    df = _media_df(spark)
    out = {r["id"]: r for r in multimodal.decode_features(df, "id", "payload").collect()}
    assert len(out) == 5
    payload = bytes(range(0, 256)) * 3
    expect_sha = hashlib.sha256(payload).hexdigest()
    assert out[2]["sha256"] == expect_sha
    assert out[2]["n_bytes"] == len(payload)
    assert len(out[2]["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in out[2]["feature"])


def test_decode_strict_raises(spark):
    df = _media_df(spark)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.decode_features(df, "id", "payload", strict=True).collect()


def test_sample_frames_fanout(spark):
    df = _media_df(spark)
    frames = multimodal.sample_frames(df, "id", "payload", every_n=2, frame_size=64)
    got = frames.groupBy("id").count().collect()
    # id=i has 256*(i+1) bytes -> 4*(i+1) frames of 64B -> every 2nd kept
    want = {i: (4 * (i + 1) + 1) // 2 for i in range(5)}
    assert {r["id"]: r["count"] for r in got} == want
    row = frames.filter("id = 0 AND frame_idx = 0").first()
    assert row["frame_bytes"] == bytes(range(0, 64))


def test_winnowing_fingerprints_local_overlap(spark):
    from harmony_energy_data_pipeline_spark.operators.text import winnowing_fingerprints
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical -> identical fingerprint set
            (3, "completely different content about spark shuffles " + base),  # shares a passage
            (4, "zzz qqq xxx unrelated nonsense tokens entirely elsewhere"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text")
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] & by_doc[3], "shared passage must share fingerprints"
    assert not (by_doc[1] & by_doc[4]), "unrelated docs must not collide"


def test_resize_images_shapes(spark):
    from harmony_energy_data_pipeline_spark.operators.multimodal import resize_images
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, "short"), (2, "x" * 10000)], "doc_id long, text string"
    )
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = resize_images(media, "doc_id", "payload", width=16, height=16).collect()
    assert all(len(r["resized"]) == 256 for r in out)
    assert {(r["width"], r["height"]) for r in out} == {(16, 16)}


# ---------------------------------------------------------------------------
# Real PNG codec (stdlib zlib decode/encode)
# ---------------------------------------------------------------------------

def _forward_filter(ftype, line, prev, bpp):
    """Independent forward implementation of the PNG filters (RFC 2083
    §6) — the decoder must invert exactly this."""
    import numpy as np
    out = bytearray()
    for i in range(len(line)):
        x = line[i]
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            f = x
        elif ftype == 1:
            f = (x - a) & 0xFF
        elif ftype == 2:
            f = (x - b) & 0xFF
        elif ftype == 3:
            f = (x - ((a + b) >> 1)) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f = (x - pred) & 0xFF
        out.append(f)
    return bytes(out)


def test_png_roundtrip_all_channels():
    import random as rnd

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    r = rnd.Random(7)
    for ch in (1, 3, 4):
        w, h = 9, 5
        pixels = bytes(r.randrange(256) for _ in range(w * h * ch))
        png = encode_png(w, h, ch, pixels)
        dw, dh, dch, dp = decode_png(png)
        assert (dw, dh, dch) == (w, h, ch)
        assert dp == pixels


def test_png_decoder_inverts_every_filter_type():
    import struct
    import zlib
    import random as rnd

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
    )

    r = rnd.Random(11)
    w, h, ch = 7, 5, 3
    stride = w * ch
    rows = [bytes(r.randrange(256) for _ in range(stride)) for _ in range(h)]
    raw = bytearray()
    prev = bytes(stride)
    for ftype, line in zip([0, 1, 2, 3, 4], rows):
        raw.append(ftype)
        raw += _forward_filter(ftype, line, prev, ch)
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    dw, dh, dch, dp = decode_png(png)
    assert (dw, dh, dch) == (w, h, ch)
    assert dp == b"".join(rows)


def test_real_png_path_through_spark_operators(spark):
    import hashlib
    import random as rnd

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        decode_features,
        decode_png,
        encode_png,
        resize_images,
    )

    r = rnd.Random(3)
    payloads = []
    for i in range(4):
        w, h = 8 + i, 6 + i
        payloads.append((i, encode_png(w, h, 3, bytes(r.randrange(256) for _ in range(w * h * 3)))))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")

    feats = {r_["id"]: r_ for r_ in decode_features(df, "doc_id", "payload").collect()}
    for i, png in payloads:
        row = feats[i]
        assert row["sha256"] == hashlib.sha256(png).hexdigest()
        # real histogram: sums to 1 over the 16 intensity bins
        assert abs(sum(row["feature"]) - 1.0) < 1e-6

    resized = {r_["id"]: r_ for r_ in
               resize_images(df, "doc_id", "payload", width=4, height=3).collect()}
    for i, _png in payloads:
        w2, h2, ch2, px2 = decode_png(bytes(resized[i]["resized"]))
        assert (w2, h2, ch2) == (4, 3, 3)
        assert len(px2) == 4 * 3 * 3


def test_corrupt_png_falls_back_in_lenient_mode(spark):
    """A payload with valid PNG magic but a garbage body must not kill
    the stage when strict=False — it takes the deterministic fallback."""
    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_features,
        resize_images,
    )

    bad = PNG_MAGIC + b"\x00\x01garbage-not-a-chunk-stream"
    df = spark.createDataFrame([(1, bytearray(bad))], "id long, media binary")
    feats = decode_features(df, "id", "media", strict=False).collect()
    assert len(feats) == 1 and feats[0].feature is not None
    resized = resize_images(df, "id", "media", width=4, height=4, strict=False).collect()
    assert len(resized) == 1 and len(resized[0].resized) == 16
    # strict mode still surfaces the corruption
    import pytest as _pytest
    with _pytest.raises(Exception):
        decode_features(df, "id", "media", strict=True).collect()


# ---------------------------------------------------------------------------
# round 4: REAL WAV codec path
# ---------------------------------------------------------------------------

def _wav_bytes(freq=440.0, rate=8000, seconds=0.25, channels=1, amp=0.5):
    import math

    import numpy as np

    from harmony_energy_data_pipeline_spark.operators.multimodal import encode_wav

    n = int(rate * seconds)
    t = np.arange(n) / rate
    mono = (np.sin(2 * math.pi * freq * t) * amp * 32767).astype(np.int16)
    samples = np.stack([mono] * channels, axis=1)
    return encode_wav(rate, samples)


def test_wav_roundtrip():
    import numpy as np

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    payload = _wav_bytes(channels=2)
    rate, nch, width, samples = decode_wav(payload)
    assert (rate, nch, width) == (8000, 2, 2)
    assert samples.shape == (2000, 2)
    again = encode_wav(rate, samples)
    assert decode_wav(again)[3].tolist() == samples.tolist()
    # re-encode is byte-identical for PCM16
    assert again == payload


def test_decode_features_real_wav_rms_envelope(spark):
    """WAV payloads take the REAL path: the feature is the decoded
    PCM's per-segment RMS envelope — a loud sine scores ~amp/sqrt(2)
    in every segment, silence scores 0; the fake hash feature would
    match neither."""
    import numpy as np

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_features,
        encode_wav,
    )

    loud = _wav_bytes(amp=0.5)
    silent = encode_wav(8000, np.zeros((2000, 1), dtype=np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(silent))], "id long, media binary"
    )
    rows = {r["id"]: r for r in decode_features(df, "id", "media").collect()}
    f_loud, f_silent = rows[1]["feature"], rows[2]["feature"]
    assert len(f_loud) == FEATURE_DIM == len(f_silent)
    expected = 0.5 / (2 ** 0.5)
    assert all(abs(v - expected) < 0.02 for v in f_loud), f_loud
    assert all(v == 0.0 for v in f_silent)


def test_decode_features_corrupt_wav_lenient_and_strict(spark):
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.operators.multimodal import (
        decode_features,
    )

    corrupt = b"RIFF\x00\x00\x00\x00WAVEgarbage-not-a-real-container"
    df = spark.createDataFrame([(1, bytearray(corrupt))], "id long, media binary")
    # lenient: falls back to the deterministic fake instead of dying
    out = decode_features(df, "id", "media").collect()
    assert len(out) == 1 and len(out[0]["feature"]) == 16
    # strict: surfaces the decode error
    with _pytest.raises(Exception):
        decode_features(df, "id", "media", strict=True).collect()
