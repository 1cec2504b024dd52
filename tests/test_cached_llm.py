"""CachedLLM disk-cache wrapper (reference utils/cache.py DiskCache +
llms/llms.py _llm_cache_get/_llm_cache_set): hit/miss accounting, miss-only
forwarding, order preservation, corruption guard, cross-instance reuse."""

import json
import os

import pytest

from sycamore_spark.llm.client import CachedLLM, LLM


class _Counting(LLM):
    def __init__(self):
        self.calls = []

    def generate_batch(self, prompts):
        self.calls.append(list(prompts))
        return [f"r:{p}" for p in prompts]


def test_cached_llm_miss_then_hit(tmp_path):
    inner = _Counting()
    c = CachedLLM(inner, str(tmp_path / "cache"))
    assert c.generate_batch(["a", "b"]) == ["r:a", "r:b"]
    assert (c.hits, c.misses) == (0, 2)
    assert inner.calls == [["a", "b"]]
    # identical batch: served fully from disk, inner untouched
    assert c.generate_batch(["a", "b"]) == ["r:a", "r:b"]
    assert (c.hits, c.misses) == (2, 2)
    assert inner.calls == [["a", "b"]]


def test_cached_llm_partial_overlap_preserves_order(tmp_path):
    inner = _Counting()
    c = CachedLLM(inner, str(tmp_path / "cache"))
    c.generate_batch(["a", "c"])
    # b and d are the only misses; output order follows the prompt list
    assert c.generate_batch(["b", "a", "d", "c"]) == ["r:b", "r:a", "r:d", "r:c"]
    assert inner.calls == [["a", "c"], ["b", "d"]]


def test_cached_llm_cross_instance_and_model_tag(tmp_path):
    d = str(tmp_path / "cache")
    CachedLLM(_Counting(), d).generate_batch(["a"])
    # a new instance over the same dir hits (the executor-restart case)
    inner = _Counting()
    c2 = CachedLLM(inner, d)
    assert c2.generate_batch(["a"]) == ["r:a"]
    assert inner.calls == []
    # a different model_tag is a different key space: miss
    c3 = CachedLLM(inner, d, model_tag="other")
    assert c3.generate_batch(["a"]) == ["r:a"]
    assert inner.calls == [["a"]]


def test_cached_llm_corruption_guard(tmp_path):
    d = str(tmp_path / "cache")
    inner = _Counting()
    c = CachedLLM(inner, d)
    c.generate_batch(["a"])
    (path,) = [os.path.join(d, f) for f in os.listdir(d)]
    # wrong recorded key -> treated as a miss and rewritten, never served
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"key": "not-the-key", "reply": "stale"}, f)
    assert c.generate_batch(["a"]) == ["r:a"]
    with open(path, encoding="utf-8") as f:
        assert json.load(f)["reply"] == "r:a"
    # non-JSON garbage -> miss, not a crash
    with open(path, "w", encoding="utf-8") as f:
        f.write("{torn")
    assert c.generate_batch(["a"]) == ["r:a"]


def test_cached_llm_short_inner_batch_raises(tmp_path):
    class _Short(LLM):
        def generate_batch(self, prompts):
            return ["only-one"]

    c = CachedLLM(_Short(), str(tmp_path / "cache"))
    with pytest.raises(RuntimeError, match="1 replies"):
        c.generate_batch(["a", "b"])


def test_generate_batch_fresh_heals_poisoned_entries(tmp_path):
    inner = _Counting()
    c = CachedLLM(inner, str(tmp_path / "cache"))
    # poison: cache an entry that (say) a validator would reject
    c._set(c._key("p"), "INVALID")
    assert c.generate_batch(["p"]) == ["INVALID"]  # served verbatim
    # fresh: bypasses the read, re-asks the inner client, overwrites
    assert c.generate_batch_fresh(["p"]) == ["r:p"]
    assert inner.calls == [["p"]]
    c2 = CachedLLM(_Counting(), str(tmp_path / "cache"))
    assert c2.generate_batch(["p"]) == ["r:p"]  # healed entry persists


def test_llm_map_retry_bypasses_cache(spark, tmp_path):
    """A cached reply that fails `validate` must not be re-served on the
    retry: the retry goes to the inner client and the row validates."""
    from sycamore_spark.llm.client import CachedLLM as _C
    from sycamore_spark.llm.map import llm_map

    cache_dir = str(tmp_path / "cache")
    # pre-poison the cache with an invalid completion for the exact prompt
    probe = _C(_Counting(), cache_dir)
    prompt = "score doc-X"
    probe._set(probe._key(prompt), "not-a-number")

    df = spark.createDataFrame([("doc-X",)], "text string")

    def factory():
        class Valid(LLM):
            def generate_batch(self, prompts):
                return ["7" for _ in prompts]

        return Valid()

    out = llm_map(
        df, "score {{ doc.text }}", "score", factory,
        validate=lambda s: s.strip().isdigit(), max_tries=3,
        cache_dir=cache_dir,
    ).collect()
    assert out[0].score == "7"
    # and the healed entry now serves a poison-free second run
    assert probe.generate_batch([prompt]) == ["7"]
