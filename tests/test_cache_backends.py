"""Cache backends (reference utils/cache.py: DiskCache LRU + file:// URIs,
S3Cache freshness + picklability, NullCache, cache_from_path dispatch) and
the llm_map(..., cache_dir=...) wiring (reference llms/llms.py caches inside
the LLM so every llm_map/extract_entity call benefits)."""

import json
import os
import pickle
import time

import pytest

from sycamore_spark.data.cache import DiskCache, NullCache, S3Cache, cache_from_path
from sycamore_spark.llm import MockLLM, llm_map
from sycamore_spark.llm.client import LLM, CachedLLM


class _FakeS3:
    """Minimal boto3-S3-shaped fake: bucket/key -> bytes, NoSuchKey errors."""

    def __init__(self, store):
        self.store = store

    def get_object(self, Bucket, Key):
        if (Bucket, Key) not in self.store:
            e = Exception("missing")
            e.response = {"Error": {"Code": "NoSuchKey"}}
            raise e
        import io

        return {"Body": io.BytesIO(self.store[(Bucket, Key)])}

    def put_object(self, Body, Bucket, Key):
        self.store[(Bucket, Key)] = Body


def test_disk_cache_roundtrip_and_miss(tmp_path):
    c = DiskCache(str(tmp_path / "c"))
    assert c.get("k1") is None
    c.set("k1", {"a": 1})
    assert c.get("k1") == {"a": 1}
    assert (c.hits, c.misses) == (1, 1)
    # torn/corrupt entry is a miss, not a crash
    with open(tmp_path / "c" / "k1", "w") as f:
        f.write("{torn")
    assert c.get("k1") is None


def test_disk_cache_file_uri_and_pickle(tmp_path):
    # file:/// URI strip (reference cache.py:129-132) + single-slash form
    c = DiskCache("file://" + str(tmp_path / "u"))
    c.set("k", "v")
    assert DiskCache(str(tmp_path / "u")).get("k") == "v"
    c2 = DiskCache("file:" + str(tmp_path / "u"))
    assert c2.get("k") == "v"
    # pickles as (loc, max_ents), not open handles (reference __reduce__)
    c3 = pickle.loads(pickle.dumps(c))
    assert c3.get("k") == "v"


def test_disk_cache_rejects_path_traversal_keys(tmp_path):
    c = DiskCache(str(tmp_path / "c"))
    with pytest.raises(ValueError):
        c.set("../escape", 1)


def test_disk_cache_lru_keeps_newest(tmp_path):
    d = str(tmp_path / "c")
    c = DiskCache(d, max_ents=3)
    for i in range(5):
        c.set(f"k{i}", i)
        os.utime(os.path.join(d, f"k{i}"), (i, i))  # deterministic mtimes
    c.lru()
    assert sorted(os.listdir(d)) == ["k2", "k3", "k4"]
    # a read refreshes mtime, protecting the entry from the next sweep:
    # k2 (read -> mtime now) survives the sweep triggered by set(k5);
    # k3 (oldest untouched) is the one evicted
    c.get("k2")
    c.set("k5", 5)
    names = os.listdir(d)
    assert sorted(names) == ["k2", "k4", "k5"]


def test_s3_cache_with_injected_client():
    store = {}
    c = S3Cache("s3://bucket/prefix", client_factory=lambda: _FakeS3(store))
    assert c.get("k") is None
    c.set("k", {"x": 2})
    assert ("bucket", "prefix/k") in store
    assert c.get("k") == {"x": 2}
    assert (c.hits, c.misses) == (1, 1)
    # entries are the reference's {"value":..., "cached_at":...} JSON shape
    body = json.loads(store[("bucket", "prefix/k")].decode())
    assert body["value"] == {"x": 2} and "cached_at" in body


def test_s3_cache_freshness_window():
    store = {}
    stale = S3Cache("s3://b", freshness_in_seconds=10, client_factory=lambda: _FakeS3(store))
    stale.set("k", "v")
    store[("b", "k")] = json.dumps({"value": "v", "cached_at": time.time() - 100}).encode()
    assert stale.get("k") is None  # expired -> miss
    store[("b", "k")] = json.dumps({"value": "v", "cached_at": time.time()}).encode()
    assert stale.get("k") == "v"


def test_s3_cache_gated_without_boto3_or_factory(monkeypatch):
    import sys

    # simulate a container without the S3 SDK (None in sys.modules makes
    # `import boto3` raise ImportError)
    monkeypatch.setitem(sys.modules, "boto3", None)
    c = S3Cache("s3://bucket/prefix")
    with pytest.raises(NotImplementedError, match="boto3"):
        c.get("k")


def test_s3_cache_pickles_wrapper_not_client():
    c = S3Cache("s3://b/p", freshness_in_seconds=5)
    c2 = pickle.loads(pickle.dumps(c))
    assert c2._s3_path == "s3://b/p" and c2._freshness_in_seconds == 5


def test_null_cache_and_dispatch(tmp_path):
    n = cache_from_path("null://")
    assert isinstance(n, NullCache)
    n.set("k", 1)
    assert n.get("k") is None
    assert cache_from_path(None) is None
    assert isinstance(cache_from_path("s3://b/p"), S3Cache)
    assert isinstance(cache_from_path("s3a://b/p"), S3Cache)
    assert isinstance(cache_from_path(str(tmp_path)), DiskCache)
    assert isinstance(cache_from_path("file://" + str(tmp_path / "x")), DiskCache)
    with pytest.raises(ValueError):
        cache_from_path("relative/and/missing")


def test_cached_llm_over_uri_and_injected_backend(tmp_path):
    # file:// URI path (the s3a://-style-URI case, exercised locally)
    class _Counting(LLM):
        def __init__(self):
            self.calls = 0

        def generate_batch(self, prompts):
            self.calls += 1
            return [f"r:{p}" for p in prompts]

    inner = _Counting()
    uri = "file://" + str(tmp_path / "llmcache")
    c = CachedLLM(inner, uri)
    assert c.generate_batch(["a"]) == ["r:a"]
    assert CachedLLM(_Counting(), uri).generate_batch(["a"]) == ["r:a"]
    assert inner.calls == 1
    # an injected Cache INSTANCE works too (the S3-with-fake-client case)
    store = {}
    s3 = CachedLLM(inner, S3Cache("s3://b/p", client_factory=lambda: _FakeS3(store)))
    assert s3.generate_batch(["b"]) == ["r:b"]
    assert s3.generate_batch(["b"]) == ["r:b"]
    assert inner.calls == 2  # one miss, one hit


def test_llm_map_cache_dir_second_run_zero_inner_calls(spark, tmp_path):
    calls_log = str(tmp_path / "calls.log")
    cache_dir = str(tmp_path / "cache")

    class _Logging(MockLLM):
        # worker processes can't mutate a driver counter; append to a file
        def generate_batch(self, prompts):
            with open(calls_log, "a") as f:
                f.write(f"{len(prompts)}\n")
            return super().generate_batch(prompts)

    df = spark.createDataFrame(
        [(i, f"text {i % 3}") for i in range(12)], "doc_id int, text_representation string"
    )
    out1 = llm_map(
        df, "Summarize: {{ doc.text_representation }}", "reply",
        lambda: _Logging(), cache_dir=cache_dir,
    ).collect()
    assert all(r.reply.startswith("mock:") for r in out1)
    first = sum(int(x) for x in open(calls_log).read().split())
    assert first >= 1
    # second run: every prompt is cached -> zero inner-client calls
    out2 = llm_map(
        df, "Summarize: {{ doc.text_representation }}", "reply",
        lambda: _Logging(), cache_dir=cache_dir,
    ).collect()
    second = sum(int(x) for x in open(calls_log).read().split())
    assert second == first
    assert sorted(r.reply for r in out1) == sorted(r.reply for r in out2)
