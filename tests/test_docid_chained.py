"""docid scheme (data/docid.py) and ChainedLLM failover (llm/client.py)."""

import pytest

from sycamore_spark.data.docid import (
    deterministic_nanoid36, docid_to_uuid, mkdocid, path_to_sha256_docid, uuid_to_docid,
)


def test_docid_uuid_roundtrip_all_types():
    for code in "dfce":
        d = mkdocid(f"seed-{code}", code=code)
        assert d.startswith(f"aryn:{code}-") and len(d) == 5 + 2 + 23
        uu = docid_to_uuid(d)
        # RFC 9562 v4 layout: version nybble at hex position 12
        assert uu.replace("-", "")[12] == "4"
        assert uuid_to_docid(uu) == d  # type survives via the variant nybble


def test_docid_deterministic_and_passthrough():
    assert mkdocid("x") == mkdocid("x")
    assert mkdocid("x") != mkdocid("y")
    assert docid_to_uuid("not-a-docid") == "not-a-docid"
    assert docid_to_uuid(None) is None
    assert set(deterministic_nanoid36("s")) <= set("0123456789abcdefghijklmnopqrstuvwxyz")


def test_path_sha256_docid_matches_hashlib():
    import hashlib

    p = "s3://bucket/key.pdf"
    assert path_to_sha256_docid(p) == "path-sha256-" + hashlib.sha256(p.encode()).hexdigest()


class _Boom:
    def generate(self, prompt):
        raise RuntimeError("down")

    def generate_batch(self, prompts):
        raise RuntimeError("down")


class _Echo:
    def __init__(self):
        self.calls = 0

    def generate(self, prompt):
        self.calls += 1
        return f"ok:{prompt}"

    def generate_batch(self, prompts):
        self.calls += len(prompts)
        return [f"ok:{p}" for p in prompts]


class _FlakyBatch:
    """Batch endpoint down; per-prompt endpoint works for short prompts."""

    def generate(self, prompt):
        if len(prompt) > 3:
            raise RuntimeError("too long")
        return f"flaky:{prompt}"

    def generate_batch(self, prompts):
        raise RuntimeError("batch down")


def test_chained_llm_failover():
    from sycamore_spark.llm.client import ChainedLLM

    c = ChainedLLM([_Boom(), _Echo()])
    assert c.generate("hi") == "ok:hi"
    assert c.generate_batch(["a", "b"]) == ["ok:a", "ok:b"]


def test_chained_llm_partial_batch_failover():
    from sycamore_spark.llm.client import ChainedLLM

    fallback = _Echo()
    c = ChainedLLM([_FlakyBatch(), fallback])
    out = c.generate_batch(["ab", "longprompt", "cd"])
    assert out == ["flaky:ab", "ok:longprompt", "flaky:cd"]
    assert fallback.calls == 1  # only the failed prompt reached the fallback


def test_chained_llm_all_fail_raises():
    from sycamore_spark.llm.client import ChainedLLM

    with pytest.raises(RuntimeError):
        ChainedLLM([_Boom(), _Boom()]).generate("x")
    with pytest.raises(ValueError):
        ChainedLLM([])


class _ShortBatch:
    """Violates the batch contract: drops the last reply (or returns a
    None hole) instead of raising — the silent-misalignment case."""

    def __init__(self, hole=False):
        self.hole = hole

    def generate(self, prompt):
        raise RuntimeError("per-prompt down")

    def generate_batch(self, prompts):
        out = [f"short:{p}" for p in prompts]
        if self.hole:
            out[0] = None
            return out
        return out[:-1]


def test_chained_llm_short_batch_fails_over_not_misaligns():
    from sycamore_spark.llm.client import ChainedLLM

    # a short reply list must NOT be accepted (it would misalign every
    # later prompt); the chain falls through to the healthy client and the
    # output is same-length, same-order
    c = ChainedLLM([_ShortBatch(), _Echo()])
    assert c.generate_batch(["a", "b", "c"]) == ["ok:a", "ok:b", "ok:c"]
    c = ChainedLLM([_ShortBatch(hole=True), _Echo()])
    assert c.generate_batch(["a", "b"]) == ["ok:a", "ok:b"]
    # no healthy fallback: raise, never return a short/holey list
    with pytest.raises(RuntimeError):
        ChainedLLM([_ShortBatch()]).generate_batch(["a", "b"])
