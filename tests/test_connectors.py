"""Generic DB-writer protocol (connectors.py; reference
connectors/base_writer.py): batching, retry, target validation."""

import json
import os

import pytest

from sycamore_spark.connectors import (
    JsonlDirClient,
    JsonlDirClientParams,
    JsonlDirTargetParams,
    read_jsonl_dir,
    write_db,
)


def _df(spark, n=25):
    return spark.range(n).selectExpr("id", "concat('doc-', id) AS doc_id")


def test_write_db_roundtrip_and_filter(spark, tmp_path):
    root = str(tmp_path)
    write_db(
        _df(spark).repartition(4),
        JsonlDirClient,
        JsonlDirClientParams(root=root),
        JsonlDirTargetParams(name="t1"),
        # Record seam: rename + filter odd ids out
        record_fn=lambda row: {"key": row["doc_id"]} if row["id"] % 2 == 0 else None,
        batch_size=5,
    )
    recs = read_jsonl_dir(root, "t1")
    assert sorted(r["key"] for r in recs) == sorted(f"doc-{i}" for i in range(0, 25, 2))


def test_write_db_batch_size_bounds_file_sizes(spark, tmp_path):
    root = str(tmp_path)
    write_db(
        _df(spark, 40).coalesce(1),
        JsonlDirClient,
        JsonlDirClientParams(root=root),
        JsonlDirTargetParams(name="t2"),
        record_fn=lambda row: {"id": row["id"]},
        batch_size=16,
    )
    d = os.path.join(root, "t2")
    sizes = sorted(
        sum(1 for _ in open(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.startswith("part-")
    )
    assert sizes == [8, 16, 16]  # 40 rows in one partition -> 16+16+8 batches
    assert len(read_jsonl_dir(root, "t2")) == 40


def test_write_db_target_mismatch_fails_fast(spark, tmp_path):
    root = str(tmp_path)
    params = JsonlDirClientParams(root=root)
    write_db(
        _df(spark, 3),
        JsonlDirClient,
        params,
        JsonlDirTargetParams(name="t3", schema_hint="v1"),
        record_fn=lambda row: {"id": row["id"]},
    )
    with pytest.raises(ValueError, match="mismatching target parameters"):
        write_db(
            _df(spark, 3),
            JsonlDirClient,
            params,
            JsonlDirTargetParams(name="t3", schema_hint="v2"),
            record_fn=lambda row: {"id": row["id"]},
        )


def test_write_db_retries_transient_failures(spark, tmp_path):
    # defined inside the test so cloudpickle ships it by value to executors
    class FlakyJsonlClient(JsonlDirClient):
        """Fails the FIRST attempt of every batch (marker-file state), so
        each batch exercises exactly one retry."""

        def write_many_records(self, records, target):
            import hashlib

            digest = hashlib.md5(
                json.dumps(records, sort_keys=True, default=str).encode()
            ).hexdigest()
            marker = os.path.join(self._dir(target), f"attempted-{digest}")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("1")
                raise ConnectionError("transient store error")
            super().write_many_records(records, target)

    root = str(tmp_path)
    write_db(
        _df(spark, 12).coalesce(2),
        FlakyJsonlClient,
        JsonlDirClientParams(root=root),
        JsonlDirTargetParams(name="t4"),
        record_fn=lambda row: {"id": row["id"]},
        batch_size=4,
        retry_base_sleep=0.01,
    )
    assert sorted(r["id"] for r in read_jsonl_dir(root, "t4")) == list(range(12))


def test_write_db_gives_up_after_max_retries(spark, tmp_path):
    class DownClient(JsonlDirClient):
        def write_many_records(self, records, target):
            raise ConnectionError("store is down")

    with pytest.raises(Exception, match="store is down"):
        write_db(
            _df(spark, 3),
            DownClient,
            JsonlDirClientParams(root=str(tmp_path)),
            JsonlDirTargetParams(name="t5"),
            record_fn=lambda row: {"id": row["id"]},
            max_retries=2,
            retry_base_sleep=0.01,
        )


def test_service_record_mappers(spark, tmp_path):
    """Each reference sink's record shape, exercised through the protocol
    with the file transport standing in for the service client."""
    from sycamore_spark.connectors import (
        opensearch_record,
        pinecone_record,
        qdrant_record,
        weaviate_record,
    )

    rows = [
        {
            "doc_id": "d1",
            "parent_id": None,
            "type": "pdf",
            "text_representation": "hello",
            "embedding": [0.1, 0.2],
            "properties": {"page-count": 3},
            "bbox": None,
            "shingles": [7, 9],
        },
        {"doc_id": None},  # filtered by every mapper
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, parent_id string, type string, text_representation string, "
        "embedding array<double>, properties map<string,int>, bbox array<double>, "
        "shingles array<bigint>",
    )
    root = str(tmp_path)
    for name, mapper in [
        ("os", opensearch_record("idx")),
        ("wv", weaviate_record()),
        ("pc", pinecone_record()),
        ("qd", qdrant_record()),
    ]:
        write_db(
            df,
            JsonlDirClient,
            JsonlDirClientParams(root=root),
            JsonlDirTargetParams(name=name),
            record_fn=mapper,
        )
        recs = read_jsonl_dir(root, name)
        assert len(recs) == 1, name

    os_rec = read_jsonl_dir(root, "os")[0]
    assert os_rec["_index"] == "idx" and os_rec["_id"] == "d1"
    assert os_rec["_source"]["text_representation"] == "hello"
    assert os_rec["_source"]["elements"] == []  # default filled

    wv = read_jsonl_dir(root, "wv")[0]
    assert wv["uuid"] == "d1" and wv["vector"] == {"embedding": [0.1, 0.2]}
    assert wv["properties"]["properties__page_count"] == 3  # flattened + dash fix

    pc = read_jsonl_dir(root, "pc")[0]
    assert pc["id"] == "d1" and pc["metadata"]["shingles"] == ["7", "9"]

    qd = read_jsonl_dir(root, "qd")[0]
    assert qd["payload"]["text_representation"] == "hello"


# ---------------------------------------------------------------------------
# Read-side protocol (read_db; reference connectors/base_reader.py)
# ---------------------------------------------------------------------------

from sycamore_spark.connectors import (  # noqa: E402
    JsonlDirQueryParams,
    JsonlDirReaderClient,
    opensearch_read_record,
    opensearch_record,
    pinecone_read_record,
    pinecone_record,
    qdrant_read_record,
    qdrant_record,
    read_db,
    weaviate_read_record,
    weaviate_record,
)


def test_read_db_roundtrip_with_query_and_shards(spark, tmp_path):
    root = str(tmp_path)
    write_db(
        _df(spark, 50).repartition(4),
        JsonlDirClient,
        JsonlDirClientParams(root=root),
        JsonlDirTargetParams(name="t"),
        record_fn=lambda row: {"doc_id": row["doc_id"], "id": row["id"]},
        batch_size=7,
    )
    # match_all across 4 shards: every record exactly once
    out = read_db(
        spark,
        JsonlDirReaderClient,
        JsonlDirClientParams(root=root),
        JsonlDirQueryParams(name="t"),
        num_shards=4,
        schema="doc_id string, id long",
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(f"doc-{i}" for i in range(50))

    # range query evaluated record-side
    out2 = read_db(
        spark,
        JsonlDirReaderClient,
        JsonlDirClientParams(root=root),
        JsonlDirQueryParams(name="t", query={"range": {"id": {"gte": 10, "lt": 15}}}),
        schema="doc_id string, id long",
    )
    assert sorted(r.id for r in out2.collect()) == [10, 11, 12, 13, 14]

    # term query + fields projection
    out3 = read_db(
        spark,
        JsonlDirReaderClient,
        JsonlDirClientParams(root=root),
        JsonlDirQueryParams(name="t", query={"term": {"doc_id": "doc-3"}}, fields=["id"]),
        schema="id long",
    )
    assert [r.id for r in out3.collect()] == [3]


def test_read_db_missing_target_fails_fast(spark, tmp_path):
    with pytest.raises(ValueError, match="Target is not present"):
        read_db(
            spark,
            JsonlDirReaderClient,
            JsonlDirClientParams(root=str(tmp_path)),
            JsonlDirQueryParams(name="nope"),
        )


def test_service_record_mappers_roundtrip(spark, tmp_path):
    """write mapper -> JsonlDir -> read mapper returns the original doc
    fields for each service envelope shape."""
    root = str(tmp_path)
    doc = {
        "doc_id": "d1",
        "parent_id": "p9",
        "type": "pdf",
        "text_representation": "hello",
        "embedding": [0.1, 0.2],
        "properties": {"page-count": 3},
        "shingles": [7, 9],
        "bbox": None,
        "elements": [],
    }
    df = spark.createDataFrame(
        [
            (
                doc["doc_id"], doc["parent_id"], doc["type"], doc["text_representation"],
                doc["embedding"], doc["properties"], doc["shingles"],
            )
        ],
        "doc_id string, parent_id string, type string, text_representation string, "
        "embedding array<double>, properties map<string,int>, shingles array<long>",
    )
    pairs = [
        ("os", opensearch_record("idx"), opensearch_read_record()),
        ("wv", weaviate_record(), weaviate_read_record()),
        ("pc", pinecone_record(), pinecone_read_record()),
        ("qd", qdrant_record(), qdrant_read_record()),
    ]
    for name, wmap, rmap in pairs:
        write_db(
            df, JsonlDirClient, JsonlDirClientParams(root=root),
            JsonlDirTargetParams(name=name), record_fn=wmap,
        )
        out = read_db(
            spark, JsonlDirReaderClient, JsonlDirClientParams(root=root),
            JsonlDirQueryParams(name=name), record_fn=rmap,
            schema="doc_id string, text_representation string",
        ).collect()
        assert len(out) == 1, name
        assert out[0].doc_id == "d1", name
        assert out[0].text_representation == "hello", name


def test_reconstruct_documents_groups_and_synthesizes(spark):
    from sycamore_spark.connectors import reconstruct_documents

    hits = spark.createDataFrame(
        [
            # doc 1: parent row + 2 elements
            ("1", None, 0.9), ("1e1", "1", 0.8), ("1e2", "1", 0.7),
            # doc 2: elements only -> parent synthesized
            ("2e1", "2", 0.6), ("2e2", "2", 0.95),
            # doc 3: lone parent hit, no elements
            ("3", None, 0.5),
        ],
        "doc_id string, parent_id string, score double",
    )
    out = {r.parent_key: r for r in reconstruct_documents(hits).collect()}
    assert out["1"].n_elements == 2 and out["1"].synthesized == 0
    assert out["2"].n_elements == 2 and out["2"].synthesized == 1
    assert out["2"].best_score == 0.95
    assert out["3"].n_elements == 0 and out["3"].has_parent_row == 1
