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
