"""Generic DB-writer protocol: the reference's ``BaseDBWriter`` contract
(reference: lib/sycamore/sycamore/connectors/base_writer.py — Client /
Record / ClientParams / TargetParams type params, create-idempotent +
compatibility check + write_many_records) re-expressed Spark-first.

Where the reference runs ``write_docs`` inside a Ray MapBatch, here the
write is a ``foreachPartition`` action: ONE client per partition (not per
row), records buffered into micro-batches, each batch retried with
exponential backoff. Target creation + compatibility validation happen once
on the driver BEFORE the distributed action, so a misconfigured index fails
in milliseconds instead of after a cluster-wide write.

Concrete service connectors (OpenSearch/Weaviate/Pinecone/ES/Neo4j/Qdrant,
reference writer.py:45-906) become thin Record mappers + Client adapters on
this protocol; ``JsonlDirClient`` is the bundled file-backed implementation
(no live services exist in this container) and doubles as the protocol's
test vehicle.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from abc import ABC, abstractmethod
from dataclasses import asdict, dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame


@dataclass
class ClientParams:
    """Connection-level config (host/auth/paths); must pickle to executors."""


@dataclass
class TargetParams:
    """Write-target config (index/collection/table shape).

    ``compatible_with`` mirrors the reference's pre-write validation: the
    params the target was created with must match the params the script
    asked for (reference base_writer.py:57-59)."""

    def compatible_with(self, other: "TargetParams") -> bool:
        return self == other


class DBClient(ABC):
    """Adapter over a concrete store. One instance per partition."""

    @classmethod
    @abstractmethod
    def from_client_params(cls, params: ClientParams) -> "DBClient":
        ...

    @abstractmethod
    def create_target_idempotent(self, target: TargetParams) -> None:
        ...

    @abstractmethod
    def get_existing_target_params(self, target: TargetParams) -> TargetParams:
        ...

    @abstractmethod
    def write_many_records(self, records: list[dict], target: TargetParams) -> None:
        ...

    def close(self) -> None:
        pass


RecordFn = Callable[[dict], dict | None]
"""row-dict -> record-dict (or None to filter the row out) — the Record
.from_doc seam (reference base_writer.py:48-52)."""


def write_db(
    df: DataFrame,
    client_cls: type[DBClient],
    client_params: ClientParams,
    target_params: TargetParams,
    record_fn: RecordFn,
    batch_size: int = 500,
    max_retries: int = 3,
    retry_base_sleep: float = 0.2,
) -> None:
    """Distributed protocol write.

    Driver: create target idempotently, verify compatibility (fail fast).
    Executors: one client per partition; rows -> records via ``record_fn``
    (None filters); flush every ``batch_size``; each batch retried
    ``max_retries`` times with exponential backoff before failing the task
    (Spark then retries the task — writes must therefore be idempotent or
    append-only, which is also the reference's implicit contract)."""
    driver_client = client_cls.from_client_params(client_params)
    try:
        driver_client.create_target_idempotent(target_params)
        existing = driver_client.get_existing_target_params(target_params)
        if not target_params.compatible_with(existing):
            raise ValueError(
                "Found mismatching target parameters in script and destination\n"
                f"Script: {target_params}\nDestination: {existing}"
            )
    finally:
        driver_client.close()

    def write_partition(rows) -> None:
        client = client_cls.from_client_params(client_params)
        try:
            buf: list[dict] = []

            def flush() -> None:
                if not buf:
                    return
                err = None
                for attempt in range(max_retries):
                    try:
                        client.write_many_records(list(buf), target_params)
                        buf.clear()
                        return
                    except Exception as e:  # transient store errors
                        err = e
                        time.sleep(retry_base_sleep * (2**attempt))
                raise err

            for row in rows:
                rec = record_fn(row.asDict(recursive=True))
                if rec is None:
                    continue
                buf.append(rec)
                if len(buf) >= batch_size:
                    flush()
            flush()
        finally:
            client.close()

    df.foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# File-backed implementation (and protocol test vehicle)
# ---------------------------------------------------------------------------


@dataclass
class JsonlDirClientParams(ClientParams):
    root: str


@dataclass
class JsonlDirTargetParams(TargetParams):
    name: str
    schema_hint: str = ""


class JsonlDirClient(DBClient):
    """Append-only JSONL-directory store: each ``write_many_records`` call
    lands one uniquely-named part file, so concurrent partition writers and
    Spark task retries never collide. Target params persist in
    ``_target.json`` for the compatibility check."""

    def __init__(self, root: str):
        self.root = root

    @classmethod
    def from_client_params(cls, params: ClientParams) -> "JsonlDirClient":
        assert isinstance(params, JsonlDirClientParams)
        return cls(params.root)

    def _dir(self, target: JsonlDirTargetParams) -> str:
        return os.path.join(self.root, target.name)

    def create_target_idempotent(self, target: TargetParams) -> None:
        assert isinstance(target, JsonlDirTargetParams)
        d = self._dir(target)
        os.makedirs(d, exist_ok=True)
        meta = os.path.join(d, "_target.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump(asdict(target), f)

    def get_existing_target_params(self, target: TargetParams) -> TargetParams:
        assert isinstance(target, JsonlDirTargetParams)
        with open(os.path.join(self._dir(target), "_target.json")) as f:
            return JsonlDirTargetParams(**json.load(f))

    def write_many_records(self, records: list[dict], target: TargetParams) -> None:
        assert isinstance(target, JsonlDirTargetParams)
        part = os.path.join(self._dir(target), f"part-{uuid.uuid4().hex}.jsonl")
        tmp = part + ".tmp"
        with open(tmp, "w") as f:
            for r in records:
                f.write(json.dumps(r, sort_keys=True, default=str) + "\n")
        os.rename(tmp, part)  # atomic publish: readers never see half a batch


def read_jsonl_dir(root: str, name: str) -> list[dict[str, Any]]:
    """Read every record written to a JsonlDir target (test/verification)."""
    out: list[dict[str, Any]] = []
    d = os.path.join(root, name)
    for fn in sorted(os.listdir(d)):
        if fn.startswith("part-") and fn.endswith(".jsonl"):
            with open(os.path.join(d, fn)) as f:
                out.extend(json.loads(line) for line in f)
    return out


# ---------------------------------------------------------------------------
# Record mappers for the reference's service sinks. Each is a plain
# row-dict -> record-dict function usable as ``write_db(..., record_fn=...)``
# — the concrete Client adapter is the only service-specific piece left
# (none can run in this container; JsonlDirClient stands in as transport).
# ---------------------------------------------------------------------------

# reference connectors/common.py:20-30
DEFAULT_RECORD_PROPERTIES: dict[str, Any] = {
    "doc_id": None,
    "type": None,
    "text_representation": None,
    "elements": [],
    "embedding": None,
    "parent_id": None,
    "properties": {},
    "bbox": None,
    "shingles": None,
}


def opensearch_record(index_name: str) -> RecordFn:
    """reference opensearch_writer.py:290-312: {_index, _id, _source} with
    the default record properties filled from the row."""

    def fn(row: dict) -> dict | None:
        if row.get("doc_id") is None:
            return None
        source = {k: row.get(k, v) if row.get(k) is not None else v
                  for k, v in DEFAULT_RECORD_PROPERTIES.items()}
        return {"_index": index_name, "_id": row["doc_id"], "_source": source}

    return fn


elasticsearch_record = opensearch_record  # same bulk-record shape (es_writer)


def weaviate_record(flatten: bool = True) -> RecordFn:
    """reference weaviate_writer.py from_doc: uuid + properties (+vector);
    dotted property keys flattened with '__', '-' replaced by '_'."""

    def fn(row: dict) -> dict | None:
        if row.get("doc_id") is None:
            return None
        props = {
            "properties": row.get("properties"),
            "type": row.get("type"),
            "text_representation": row.get("text_representation"),
            "parent_id": row.get("parent_id"),
            "bbox": row.get("bbox"),
            "shingles": row.get("shingles"),
        }
        props = {k: v for k, v in props.items() if v not in (None, [], {})}
        if flatten and isinstance(props.get("properties"), dict):
            flat = {
                f"properties__{k.replace('-', '_')}": v
                for k, v in props.pop("properties").items()
            }
            props.update(flat)
        rec = {"uuid": row["doc_id"], "properties": props}
        if row.get("embedding") is not None:
            rec["vector"] = {"embedding": row["embedding"]}
        return rec

    return fn


def pinecone_record() -> RecordFn:
    """reference pinecone_writer.py from_doc: parent_id#doc_id composite id,
    embedding as values, metadata with stringified shingles."""

    def fn(row: dict) -> dict | None:
        if row.get("doc_id") is None:
            return None
        rid = (
            f"{row['parent_id']}#{row['doc_id']}" if row.get("parent_id") else row["doc_id"]
        )
        return {
            "id": rid,
            "values": row.get("embedding"),
            "metadata": {
                "type": row.get("type"),
                "text_representation": row.get("text_representation"),
                "bbox": row.get("bbox"),
                "shingles": [str(s) for s in row["shingles"]] if row.get("shingles") else None,
                "properties": row.get("properties"),
            },
        }

    return fn


def qdrant_record() -> RecordFn:
    """reference qdrant_writer.py: point = {id, vector, payload}."""

    def fn(row: dict) -> dict | None:
        if row.get("doc_id") is None:
            return None
        return {
            "id": row["doc_id"],
            "vector": row.get("embedding"),
            "payload": {
                "type": row.get("type"),
                "text_representation": row.get("text_representation"),
                "properties": row.get("properties"),
                "parent_id": row.get("parent_id"),
            },
        }

    return fn


def neo4j_node_record(label: str = "Document") -> RecordFn:
    """reference neo4j_writer.py node shape: label + properties map keyed by
    the doc uuid."""

    def fn(row: dict) -> dict | None:
        if row.get("doc_id") is None:
            return None
        return {
            "label": label,
            "uuid": row["doc_id"],
            "properties": {
                "type": row.get("type"),
                "text_representation": row.get("text_representation"),
                "properties": row.get("properties"),
            },
        }

    return fn
