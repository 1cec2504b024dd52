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


def test_file_extension_expr_matches_reference_semantics(spark):
    from sycamore_spark.operators.multimodal import file_extension_expr

    cases = [
        ("/data/report.docx", ".docx"),
        ("s3://bucket/key/file.pptx", ".pptx"),
        ("https://host/a/b/deck.odp?version=2#frag", ".odp"),
        ("http://host/plain", ""),
        ("/tmp/archive.tar.gz", ".gz"),   # Path.suffix = LAST extension
        ("/tmp/.bashrc", ""),             # leading-dot name has no suffix
        ("noext", ""),
        ("file:///local/x.rtf", ".rtf"),  # non-s3/http scheme: raw path rule
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "path string")
    got = [r.ext for r in
           df.select("path", file_extension_expr("path").alias("ext"))
             .collect()]
    assert got == [e for _, e in cases]
    # cross-check the rule against the reference's actual implementation
    from pathlib import Path
    from urllib.parse import urlparse

    for p, want in cases:
        u = urlparse(p)
        ref = Path(u.path if u.scheme in ("s3", "http", "https") else p).suffix
        assert ref == want, p


def test_image_page_filename_expr(spark):
    from sycamore_spark.operators.multimodal import image_page_filename_expr

    df = spark.createDataFrame(
        [("/d/q3.final.pdf", 4), ("noext", 1)], "path string, page int"
    )
    got = [r.f for r in df.select(
        image_page_filename_expr("path", "page").alias("f")).collect()]
    assert got == ["q3.final_page_4.png", "_page_1.png"]


def test_crop_box_expr_reference_arithmetic(spark):
    from sycamore_spark.operators.multimodal import crop_box_expr

    df = spark.createDataFrame(
        [([0.1, 0.2, 0.5, 0.8], 1000, 500)],
        "bbox array<double>, w int, h int",
    )
    box = df.select(crop_box_expr("bbox", "w", "h", padding=10).alias("b")) \
            .collect()[0].b
    # reference crop_to_bbox: (x1*W - p, y1*H - p, x2*W + p, y2*H + p)
    assert box == [90.0, 90.0, 510.0, 410.0]


def test_convert_binary_to_pdf_roundtrip_and_gate(spark):
    import pytest

    from pyspark.errors import PythonException

    from sycamore_spark.operators.multimodal import convert_binary_to_pdf

    df = spark.createDataFrame(
        [(1, "/docs/a.docx", bytearray(b"alpha")),
         (2, "s3://b/k/b.odt", bytearray(b"beta"))],
        "doc_id long, path string, binary binary",
    )

    def fake_converter(src, out_dir):
        # real file IO, deterministic output: wrap source bytes as a "PDF"
        from pathlib import Path

        sp = Path(src)
        assert sp.suffix in (".docx", ".odt")  # extension survived the trip
        data = sp.read_bytes()
        (Path(out_dir) / f"{sp.stem}.pdf").write_bytes(
            b"%PDF-1.4\n" + data + b"\n%%EOF"
        )

    out = {r.doc_id: r for r in
           convert_binary_to_pdf(df, converter=fake_converter).collect()}
    assert bytes(out[1].binary) == b"%PDF-1.4\nalpha\n%%EOF"
    assert bytes(out[2].binary) == b"%PDF-1.4\nbeta\n%%EOF"
    assert out[1].filetype == "application/pdf"
    assert out[1].path == "/docs/a.docx"  # original path column untouched

    # default converter is the honest LibreOffice gate (absent here)
    import shutil

    if shutil.which("libreoffice") is None:
        with pytest.raises(PythonException, match="libreoffice"):
            convert_binary_to_pdf(df).collect()
