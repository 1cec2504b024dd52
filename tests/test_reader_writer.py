"""DocSetReader/DocSetWriter facades (reference: reader.py, writer.py)."""

import json
import os

import pytest

import sycamore_spark as ss


def test_read_docs_and_write_roundtrip(spark, tmp_path):
    ds = ss.read(spark).docs(
        [{"doc_id": "a", "text_representation": "hello"}, {"doc_id": "b", "text_representation": "hi"}]
    )
    assert ds.count() == 2
    out = str(tmp_path / "out")
    ds.write.parquet(out)
    back = ss.read(spark).materialize(out)
    assert {r["doc_id"] for r in back.take_all()} == {"a", "b"}


def test_read_text_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"file number {i}")
    ds = ss.read(spark).text(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 3
    assert all(r["properties"] is not None for r in rows)


def test_read_binary_with_format_filter(spark, tmp_path):
    (tmp_path / "a.html").write_text("<p>x</p>")
    (tmp_path / "b.txt").write_text("y")
    ds = ss.read(spark).binary(str(tmp_path), binary_format="html")
    rows = ds.take_all()
    assert len(rows) == 1
    assert bytes(rows[0]["binary_representation"]) == b"<p>x</p>"


def test_read_json(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps({"id": i, "body": f"text {i}"}) for i in range(4)))
    ds = ss.read(spark).json(str(p))
    assert ds.count() == 4


def test_write_files_and_duckdb(spark, tmp_path):
    import duckdb

    ds = ss.read(spark).docs(
        [{"doc_id": "a", "text_representation": "alpha"}, {"doc_id": "b", "text_representation": "beta"}]
    )
    fdir = str(tmp_path / "files")
    ds.write.files(fdir)
    written = []
    for root, _dirs, files in os.walk(fdir):
        written += [f for f in files if not f.startswith(("_", "."))]
    assert len(written) >= 1

    db = str(tmp_path / "t.duckdb")
    ds.write.duckdb(db, "docs", str(tmp_path / "stage"))
    con = duckdb.connect(db)
    assert con.sql("select count(*) from docs").fetchone()[0] == 2


def test_read_duckdb(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "src.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE dims AS SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(id, name)")
    con.close()
    ds = ss.read(spark).duckdb(db, "dims")
    assert {tuple(r) for r in ds.take_all()} == {(1, "a"), (2, "b")}
    sql = ss.read(spark).duckdb(db, "SELECT id FROM dims WHERE id > 1")
    assert sql.count() == 1


def test_search_reader_gated(spark):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ss.read(spark).search("opensearch", hosts=["x"])


def test_reader_db_facade(spark, tmp_path):
    """ctx.read.db(...) — the fluent entry point over the read protocol."""
    import sycamore_spark as ss
    from sycamore_spark.connectors import (
        JsonlDirClient,
        JsonlDirClientParams,
        JsonlDirQueryParams,
        JsonlDirReaderClient,
        JsonlDirTargetParams,
        write_db,
    )

    root = str(tmp_path)
    df = spark.range(10).selectExpr("concat('d', id) AS doc_id", "id AS n")
    write_db(
        df, JsonlDirClient, JsonlDirClientParams(root=root),
        JsonlDirTargetParams(name="t"),
        record_fn=lambda row: {"doc_id": row["doc_id"], "n": row["n"]},
    )
    ds = ss.read(spark).db(
        JsonlDirReaderClient,
        JsonlDirClientParams(root=root),
        JsonlDirQueryParams(name="t", query={"range": {"n": {"gte": 7}}}),
        schema="doc_id string, n long",
    )
    assert sorted(r.n for r in ds.to_df().collect()) == [7, 8, 9]


def test_reader_wire_facade(spark):
    import sycamore_spark as ss
    from sycamore_spark.data import wire as W

    df = spark.createDataFrame([("d1", 5)], "doc_id string, n int")
    wired = W.docs_to_wire(df)
    out = (
        ss.read(spark).wire(wired).to_df()
        .selectExpr("from_json(doc_json, 'doc_id string, n int') AS d")
        .select("d.*")
        .collect()
    )
    assert out[0].doc_id == "d1" and out[0].n == 5


def test_compact_table(spark, tmp_path):
    from sycamore_spark.writer import compact_table

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # fragment: 64 partitions of a small table -> 64 tiny files
    spark.range(10000).toDF("id").repartition(64).write.parquet(src)
    import glob
    n_in = len(glob.glob(f"{src}/part-*"))
    assert n_in == 64
    n = compact_table(spark, src, dst, target_mb=128)
    n_out = len(glob.glob(f"{dst}/part-*"))
    assert n == 1 and n_out == 1
    assert spark.read.parquet(dst).count() == 10000


def test_compact_partitioned_table_preserves_layout(spark, tmp_path):
    """ANN-store maintenance: compaction must keep the partitionBy
    directory layout (and with it partition pruning) while collapsing
    each value's micro-batch files to one."""
    import glob

    from sycamore_spark.writer import compact_partitioned_table

    src = str(tmp_path / "pfrag")
    dst = str(tmp_path / "ptidy")
    df = spark.range(4000).selectExpr("id", "CAST(id % 5 AS INT) AS cell_id")
    df.repartition(8).write.partitionBy("cell_id").parquet(src)
    pre = {d: len(glob.glob(f"{d}/*.parquet")) for d in glob.glob(f"{src}/cell_id=*")}
    assert len(pre) == 5 and max(pre.values()) > 1
    compact_partitioned_table(spark, src, dst, "cell_id")
    post = {d.rsplit("=", 1)[1]: len(glob.glob(f"{d}/*.parquet"))
            for d in glob.glob(f"{dst}/cell_id=*")}
    assert sorted(post) == ["0", "1", "2", "3", "4"] and set(post.values()) == {1}
    got = spark.read.parquet(dst)
    assert got.count() == 4000
    assert sorted(r.id for r in got.filter("cell_id = 3").collect()) == \
        sorted(i for i in range(4000) if i % 5 == 3)


def test_compact_partitioned_table_rejects_in_place(spark, tmp_path):
    """r9 ADVICE: mode('overwrite') truncates dst BEFORE the lazy src read
    executes, so an in-place compaction (a natural maintenance-job
    mistake) would destroy the store — reject loudly, data untouched.
    Path aliasing (trailing slash, ../) must not sneak past the guard."""
    import pytest

    from sycamore_spark.writer import compact_partitioned_table

    src = str(tmp_path / "pinplace")
    spark.range(100).selectExpr("id", "CAST(id % 3 AS INT) AS cell_id") \
        .write.partitionBy("cell_id").parquet(src)
    with pytest.raises(ValueError, match="in place"):
        compact_partitioned_table(spark, src, src, "cell_id")
    with pytest.raises(ValueError, match="in place"):
        compact_partitioned_table(spark, src, src + "/", "cell_id")
    with pytest.raises(ValueError, match="in place"):
        compact_partitioned_table(
            spark, src, str(tmp_path / "x" / ".." / "pinplace"), "cell_id"
        )
    assert spark.read.parquet(src).count() == 100  # store intact


def test_compact_partitioned_table_multi_file_salt(spark, tmp_path):
    import glob

    import pytest

    from sycamore_spark.writer import compact_partitioned_table

    src = str(tmp_path / "pfrag2")
    dst = str(tmp_path / "ptidy2")
    spark.range(4000).selectExpr("id", "CAST(id % 3 AS INT) AS cell_id") \
        .repartition(8).write.partitionBy("cell_id").parquet(src)
    with pytest.raises(ValueError, match="salt_col"):
        compact_partitioned_table(spark, src, dst, "cell_id", files_per_partition=2)
    compact_partitioned_table(
        spark, src, dst, "cell_id", files_per_partition=2, salt_col="id"
    )
    post = {d: len(glob.glob(f"{d}/*.parquet")) for d in glob.glob(f"{dst}/cell_id=*")}
    assert len(post) == 3 and all(1 <= n <= 2 for n in post.values())
    assert spark.read.parquet(dst).count() == 4000


def test_compact_table_range_clustered(spark, tmp_path):
    from sycamore_spark.writer import compact_table

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(1000).toDF("id").repartition(16).write.parquet(src)
    compact_table(spark, src, dst, target_mb=128, sort_col="id")
    assert spark.read.parquet(dst).count() == 1000
