"""LLM client seam.

Reference parity: the ``LLM`` interface with sync/async/batch modes
(reference: lib/sycamore/sycamore/llms/llms.py) and the deterministic
``MockLLM`` test double (reference: tests/unit/test_docset.py:44-100).

Every LLM-powered operator takes an ``llm_factory`` — a picklable zero-arg
callable constructed on the executor once per task (iterator mapInPandas) —
so real clients (HTTP, rate-limited, async-batched) and the mock share one
seam. Determinism around the seam is what keeps the rest of the pipeline
oracle-checkable (SURVEY.md §7 "known hard spots").
"""

from __future__ import annotations

import hashlib
import re
from abc import ABC, abstractmethod
from collections.abc import Callable


class LLM(ABC):
    """Batch-oriented client: prompts in, completions out, order-preserving."""

    @abstractmethod
    def generate_batch(self, prompts: list[str]) -> list[str]: ...

    def generate(self, prompt: str) -> str:
        return self.generate_batch([prompt])[0]


class MockLLM(LLM):
    """Deterministic fake.

    Rules: list of (regex, reply-or-callable) tried in order against the
    prompt; fallback is a stable digest so outputs are reproducible across
    runs/partitions. Callables get the regex match and must return str.
    """

    def __init__(self, rules: list[tuple[str, str | Callable]] | None = None):
        self.rules = rules or []

    def generate_batch(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            for pat, reply in self.rules:
                m = re.search(pat, p, flags=re.DOTALL)
                if m:
                    out.append(reply(m) if callable(reply) else reply)
                    break
            else:
                out.append("mock:" + hashlib.md5(p.encode()).hexdigest()[:8])
        return out


class ScoringMockLLM(MockLLM):
    """Mock for llm_filter: scores 0-5 by counting occurrences of a keyword
    taken from the question line of the prompt. Deterministic and monotone —
    good enough to test threshold semantics end-to-end."""

    def __init__(self, keyword: str):
        self.keyword = keyword.lower()
        super().__init__()

    def generate_batch(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = re.search(r"Document: (.*)", p, flags=re.DOTALL)
            body = m.group(1) if m else p
            out.append(str(min(5, body.lower().count(self.keyword))))
        return out


class ConcurrentLLM(LLM):
    """Concurrency + rate-limit wrapper around any LLM: fans a batch out
    over a thread pool (async micro-batching — reference LLMMap's
    SYNC/ASYNC/BATCH modes, transforms/base_llm.py and llms/llms.py
    default_mode) under a requests-per-minute token bucket.

    Wrap the inner factory at the task level:
    ``llm_factory=lambda: ConcurrentLLM(RealClient(), max_concurrency=8,
    requests_per_minute=600)`` — each Spark task gets its own pool, so
    cluster-wide concurrency = tasks × max_concurrency; size the rpm budget
    per-task (global_rpm / expected concurrent tasks).
    """

    def __init__(
        self,
        inner: LLM,
        max_concurrency: int = 8,
        requests_per_minute: float | None = None,
        max_retries: int = 3,
        retry_base_sleep: float = 0.5,
    ):
        self.inner = inner
        self.max_concurrency = max_concurrency
        self.rpm = requests_per_minute
        self.max_retries = max_retries
        self.retry_base_sleep = retry_base_sleep
        self._lock = None  # built lazily; locks don't pickle
        # burst capacity = max_concurrency, not a full minute's budget — a
        # freshly-started task must not fire rpm requests instantly
        self._burst = float(max_concurrency)
        self._allowance = min(self._burst, requests_per_minute) if requests_per_minute else None
        self._last = None

    def _throttle(self):
        import threading
        import time

        if self.rpm is None:
            return
        while True:
            with self._lock:
                now = time.monotonic()
                if self._last is None:
                    self._last = now
                self._allowance = min(
                    self._burst, (self._allowance or 0) + (now - self._last) * (self.rpm / 60.0)
                )
                self._last = now
                if self._allowance >= 1:
                    self._allowance -= 1
                    return
                wait = (1 - self._allowance) / (self.rpm / 60.0)
            time.sleep(min(wait, 1.0))

    def _one(self, prompt: str) -> str:
        import time

        err = None
        for attempt in range(self.max_retries):
            self._throttle()
            try:
                return self.inner.generate_batch([prompt])[0]
            except Exception as e:  # transient API errors retry with backoff
                err = e
                time.sleep(self.retry_base_sleep * (2 ** attempt))
        raise err

    def generate_batch(self, prompts: list[str]) -> list[str]:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        if not prompts:
            return []
        # Build the lock once, single-threaded, BEFORE fanning out — lazy
        # creation inside _throttle would race (two pool threads each see
        # None and make different locks, unsynchronizing the token bucket).
        if self._lock is None:
            self._lock = threading.Lock()
        with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
            return list(pool.map(self._one, prompts))


class CachedLLM(LLM):
    """Cache wrapper around any LLM (reference utils/cache.py caches +
    llms/llms.py ``_llm_cache_get``/``_llm_cache_set``): completions keyed
    by sha256 of (model_tag, prompt), stored in a pluggable ``Cache``
    backend (``data/cache.py``: DiskCache / S3Cache / NullCache via the
    reference's ``cache_from_path`` scheme dispatcher — a string here may
    be a plain dir, ``file://...``, ``s3://...``, or ``null://``), with
    the reference's hit/miss counters and its corruption guard (a stored
    entry whose recorded key does not match the lookup is treated as a
    miss and rewritten, not returned).

    ``generate_batch`` serves hits from the cache and forwards ONLY the
    misses to the inner client in one batch, preserving prompt order — on
    a dedup-heavy corpus where templated prompts repeat across documents,
    repeats become cache reads instead of API calls. Disk writes are
    atomic (tmp file + rename) so concurrent Spark tasks sharing a cache
    dir (executor-local disk or a shared FS) never observe torn entries.
    Wrap at the task level like ConcurrentLLM:
    ``llm_factory=lambda: CachedLLM(RealClient(), "/mnt/llm-cache")``.
    """

    def __init__(self, inner: LLM, cache, model_tag: str = "default"):
        from sycamore_spark.data.cache import Cache, cache_from_path

        self.inner = inner
        self.cache: Cache = cache_from_path(cache) if isinstance(cache, str) else cache
        self.model_tag = model_tag
        self.hits = 0
        self.misses = 0

    def _key(self, prompt: str) -> str:
        return hashlib.sha256(
            (self.model_tag + "\x00" + prompt).encode("utf-8")
        ).hexdigest()

    def _get(self, key: str) -> str | None:
        entry = self.cache.get(key + ".json")
        if not isinstance(entry, dict):
            return None
        # reference Cache.get key-validation: never serve a mismatched entry
        if entry.get("key") != key or not isinstance(entry.get("reply"), str):
            return None
        return entry["reply"]

    def _set(self, key: str, reply: str) -> None:
        self.cache.set(key + ".json", {"key": key, "reply": reply})

    def generate_batch(self, prompts: list[str]) -> list[str]:
        keys = [self._key(p) for p in prompts]
        results: list[str | None] = [self._get(k) for k in keys]
        miss_idx = [i for i, r in enumerate(results) if r is None]
        self.hits += len(prompts) - len(miss_idx)
        self.misses += len(miss_idx)
        if miss_idx:
            replies = self.inner.generate_batch([prompts[i] for i in miss_idx])
            if len(replies) != len(miss_idx):
                raise RuntimeError(
                    f"inner generate_batch returned {len(replies)} replies "
                    f"for {len(miss_idx)} prompts"
                )
            for i, r in zip(miss_idx, replies):
                results[i] = r
                self._set(keys[i], r)
        return results  # type: ignore[return-value]

    def generate_batch_fresh(self, prompts: list[str]) -> list[str]:
        """Bypass cache READS and overwrite the stored entries.

        The retry path of validate-gated stages (llm_map max_tries) must
        use this: a cached reply that already failed its validator would
        otherwise be served verbatim on every retry — and persist across
        runs — so the row could never validate. Fresh replies heal the
        cache (the entry is rewritten with whatever the client now says)."""
        keys = [self._key(p) for p in prompts]
        self.misses += len(prompts)
        replies = self.inner.generate_batch(prompts)
        if len(replies) != len(prompts):
            raise RuntimeError(
                f"inner generate_batch returned {len(replies)} replies "
                f"for {len(prompts)} prompts"
            )
        for k, r in zip(keys, replies):
            self._set(k, r)
        return replies


class ChainedLLM(LLM):
    """Failover chain across LLM clients (reference llms/chained_llm.py:12
    ChainedLLM): try each client in order, first success wins — the
    resilience wrapper for rate-limited / flaky providers. Failures are
    per-PROMPT in ``generate_batch``: a batch partially served by the
    primary only retries its failed prompts on the fallbacks, so one bad
    prompt can't force a whole Arrow batch onto the slow provider.
    Raises the LAST error when every client fails (reference behavior)."""

    def __init__(self, chain: list[LLM]):
        if not chain:
            raise ValueError("ChainedLLM needs at least one client")
        self.chain = list(chain)

    def generate(self, prompt: str) -> str:
        last: Exception | None = None
        for llm in self.chain:
            try:
                return llm.generate(prompt)
            except Exception as e:  # noqa: BLE001 - failover by contract
                last = e
        assert last is not None
        raise last

    def generate_batch(self, prompts: list[str]) -> list[str]:
        results: list[str | None] = [None] * len(prompts)
        pending = list(range(len(prompts)))
        last: Exception | None = None
        for llm in self.chain:
            if not pending:
                break
            try:
                replies = llm.generate_batch([prompts[i] for i in pending])
                # order/length contract: Arrow batch stages align replies to
                # prompts positionally, so a short or None-holed batch must
                # fail over, not silently misalign the whole batch
                if len(replies) != len(pending) or any(r is None for r in replies):
                    raise RuntimeError(
                        f"generate_batch returned {len(replies)} replies for "
                        f"{len(pending)} prompts (or a None reply)"
                    )
                for i, r in zip(pending, replies):
                    results[i] = r
                pending = []
            except Exception as e:  # noqa: BLE001
                # batch-level failure: retry per prompt so partial
                # capability still drains what it can
                still = []
                for i in pending:
                    try:
                        results[i] = llm.generate(prompts[i])
                    except Exception as e2:  # noqa: BLE001
                        last = e2
                        still.append(i)
                pending = still
                last = last or e
        if pending:
            assert last is not None
            raise last
        assert all(r is not None for r in results), "generate_batch left unfilled slots"
        return results  # type: ignore[return-value]  # every slot filled, same order
