"""ConcurrentLLM: thread-pool fan-out, retries, rate limiting
(reference: base_llm.py LLM modes)."""

import threading
import time

import pytest

from sycamore_spark.llm.client import LLM, ConcurrentLLM, MockLLM


class SlowLLM(LLM):
    def __init__(self, delay=0.05):
        self.delay = delay
        self.active = 0
        self.peak = 0
        self._lock = threading.Lock()

    def generate_batch(self, prompts):
        with self._lock:
            self.active += 1
            self.peak = max(self.peak, self.active)
        time.sleep(self.delay)
        with self._lock:
            self.active -= 1
        return [p.upper() for p in prompts]


class FlakyLLM(LLM):
    def __init__(self, fail_times=2):
        self.fail_times = fail_times
        self.calls = 0

    def generate_batch(self, prompts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient")
        return ["ok"] * len(prompts)


def test_concurrent_fanout_preserves_order():
    inner = SlowLLM()
    llm = ConcurrentLLM(inner, max_concurrency=8)
    prompts = [f"p{i}" for i in range(16)]
    t0 = time.perf_counter()
    out = llm.generate_batch(prompts)
    wall = time.perf_counter() - t0
    assert out == [p.upper() for p in prompts]
    assert inner.peak > 1            # actually ran concurrently
    assert wall < 16 * inner.delay   # faster than sequential


def test_retries_transient_errors():
    llm = ConcurrentLLM(FlakyLLM(fail_times=2), max_concurrency=1, retry_base_sleep=0.01)
    assert llm.generate_batch(["x"]) == ["ok"]


def test_retries_exhausted_raises():
    llm = ConcurrentLLM(FlakyLLM(fail_times=99), max_concurrency=1, max_retries=2, retry_base_sleep=0.01)
    with pytest.raises(ConnectionError):
        llm.generate_batch(["x"])


def test_rate_limit_throttles():
    # 600 rpm = 10 req/s, burst = max_concurrency = 2: the remaining 3 of 5
    # requests wait ~0.1s each
    llm = ConcurrentLLM(MockLLM(), max_concurrency=2, requests_per_minute=600)
    t0 = time.perf_counter()
    out = llm.generate_batch([f"q{i}" for i in range(5)])
    wall = time.perf_counter() - t0
    assert len(out) == 5
    assert wall >= 0.25
