"""Multimodal binary columns: metadata decode, resize, frame sampling,
audio features (plumbing-real, codec-faked; see operators/multimodal.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, f"payload-{i}".encode() * (i + 1)) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, binary_representation binary")


def test_attach_image_meta_fake(spark, media_df):
    out = mm.attach_media_meta(media_df, kind="image", backend="fake")
    rows = {r["doc_id"]: r["media"] for r in out.collect()}
    for i, m in rows.items():
        n = len(f"payload-{i}".encode()) * (i + 1)
        assert m["width"] == 16 + n % 640
        assert m["height"] == 16 + (n * 7) % 480
        assert m["size_bytes"] == n
        assert m["kind"] == "image" and m["channels"] == 3
    # typed metadata is filterable natively
    assert out.filter(F.col("media.width") > 16).count() == len(rows)


def test_real_backend_raises_when_missing(spark, media_df):
    if mm._try_pil() is None:
        with pytest.raises(NotImplementedError):
            mm.attach_media_meta(media_df, kind="image", backend="real")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(media_df, backend="real")
    with pytest.raises(NotImplementedError):
        mm.audio_features(media_df, backend="real")


def test_resize_fake(spark, media_df):
    df = mm.attach_media_meta(media_df, kind="image", backend="fake")
    out = mm.resize_images(df, 32, 24, backend="fake")
    for r in out.collect():
        assert r["media"]["width"] == 32 and r["media"]["height"] == 24
        assert bytes(r["binary_representation"]).endswith(b"32x24")
        assert r["media"]["size_bytes"] == len(bytes(r["binary_representation"]))


def test_sample_frames(spark, media_df):
    df = mm.attach_media_meta(media_df, kind="video", backend="fake")
    frames = mm.sample_frames(df, every_n=2)
    got = frames.groupBy("doc_id").count().collect()
    metas = {r["doc_id"]: (r["media"], bytes(r["binary_representation"])) for r in df.collect()}
    for r in got:
        n = metas[r["doc_id"]][0]["n_frames"]
        assert r["count"] == len(range(0, n, 2))
    # deterministic frame payloads
    one = frames.filter((F.col("doc_id") == 3) & (F.col("frame_idx") == 0)).collect()[0]
    assert bytes(one["frame_binary"]) == hashlib.md5(metas[3][1] + b":0").digest()


def test_audio_features(spark, media_df):
    out = mm.audio_features(media_df, n_features=8)
    for r in out.collect():
        v = r["audio_features"]
        assert len(v) == 8 and all(0.0 <= x <= 1.0 for x in v)
        exp = hashlib.md5(bytes(r["binary_representation"])).digest()
        assert v[0] == exp[0] / 255.0
