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
