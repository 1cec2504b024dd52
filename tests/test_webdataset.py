"""WebDataset tar shards (data/webdataset.py): roundtrip fidelity,
deterministic archives, manifest accounting."""

import hashlib
import os

from pyspark.sql import functions as F

from sycamore_spark.data.webdataset import read_webdataset, write_webdataset


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"text for sample {i}", bytes([i % 256, 255 - i % 256])) for i in range(40)],
        "doc_id long, text string, image binary",
    ).withColumn("shard_id", F.pmod(F.col("doc_id"), F.lit(4)))


def test_roundtrip_text_and_binary(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(docs, out, {"text": "txt", "image": "jpg"})
    m = {r.shard: r for r in manifest.collect()}
    assert len(m) == 4 and all(r.n_samples == 10 for r in m.values())
    back = read_webdataset(spark, f"{out}/*.tar")
    rows = back.collect()
    assert len(rows) == 80  # 40 samples x 2 members
    texts = {int(r.key): r.content.decode() for r in rows if r.ext == "txt"}
    imgs = {int(r.key): bytes(r.content) for r in rows if r.ext == "jpg"}
    for r in docs.collect():
        assert texts[r.doc_id] == r.text
        assert imgs[r.doc_id] == bytes(r.image)


def test_archives_are_byte_deterministic(spark, tmp_path):
    docs = _docs(spark)
    h = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_webdataset(docs.repartition(3 if sub == "a" else 7), out, {"text": "txt"})
        digest = {}
        for f in sorted(os.listdir(out)):
            digest[f] = hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        h.append(digest)
    assert h[0] == h[1]


def test_null_members_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "has text", None), (2, None, b"\x01")],
        "doc_id long, text string, image binary",
    ).withColumn("shard_id", F.lit(0))
    out = str(tmp_path / "n")
    write_webdataset(df, out, {"text": "txt", "image": "jpg"})
    back = read_webdataset(spark, f"{out}/*.tar").collect()
    assert {(int(r.key), r.ext) for r in back} == {(1, "txt"), (2, "jpg")}


def test_dotted_keys_rejected_on_write(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError
    from sycamore_spark.data.webdataset import write_webdataset

    docs = spark.createDataFrame(
        [("0", "a.b", "hello")], ["shard_id", "doc_id", "text"]
    )
    with pytest.raises(Exception) as ei:
        write_webdataset(docs, str(tmp_path / "wds"), {"text": "txt"}).collect()
    assert "must not contain" in str(ei.value)


def test_multipart_extensions_group_by_first_dot(spark, tmp_path):
    # externally produced shards use multi-part extensions (seg.png):
    # the WebDataset convention keys on the FIRST dot
    import io
    import tarfile

    from sycamore_spark.data.webdataset import read_webdataset

    path = tmp_path / "ext"
    path.mkdir()
    with tarfile.open(path / "shard-0.tar", "w") as tar:
        for name, payload in [("s1.txt", b"t"), ("s1.seg.png", b"p"), ("s2.txt", b"u")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    rows = read_webdataset(spark, f"{path}/*.tar").collect()
    got = {(r.key, r.ext) for r in rows}
    assert got == {("s1", "txt"), ("s1", "seg.png"), ("s2", "txt")}


def test_write_via_file_uri(spark, tmp_path):
    # the pyarrow-fs path: a file:// URI (the shape hdfs://s3:// take)
    # must write from executor tasks; os.path never sees the URI string
    import os

    from sycamore_spark.data.webdataset import read_webdataset, write_webdataset

    docs = spark.createDataFrame(
        [("0", "a", "x"), ("0", "b", "y"), ("1", "c", "z")],
        ["shard_id", "doc_id", "text"],
    )
    uri = f"file://{tmp_path}/wds-uri"
    m = {r.shard: r.n_samples for r in write_webdataset(docs, uri, {"text": "txt"}).collect()}
    assert m == {"0": 2, "1": 1}
    local = f"{tmp_path}/wds-uri"
    assert sorted(os.listdir(local)) == ["shard-0.tar", "shard-1.tar"]
    back = {(r.key, bytes(r.content)) for r in
            read_webdataset(spark, f"{local}/*.tar").collect()}
    assert back == {("a", b"x"), ("b", b"y"), ("c", b"z")}
