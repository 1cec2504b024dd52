"""Tokenizer family: driver/UDF-side tokenizers + native count expressions.

Reference parity: ``Tokenizer`` with ``CharacterTokenizer``,
``OpenAITokenizer`` (tiktoken), ``HuggingFaceTokenizer`` (reference:
lib/sycamore/sycamore/functions/tokenizer.py:6-62) — used by merge/split/
mark transforms and LLM batching. tiktoken/transformers are not installed
in this container: those classes keep the exact seam and raise ImportError
at construction; the deterministic tokenizers carry the tests.

Spark-first: counting is what the engine needs at scale, and it stays
native — ``token_count_expr`` (whitespace) and ``bpe_token_estimate`` in
functions/text.py are pure Column expressions; the object tokenizers exist
for per-row logic inside pandas stages (merge/split budgets).
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod

from pyspark.sql import Column
from pyspark.sql import functions as F


class Tokenizer(ABC):
    max_tokens: int | None = None

    @abstractmethod
    def tokenize(self, text: str) -> list:
        ...

    def count(self, text: str) -> int:
        return len(self.tokenize(text or ""))


class CharacterTokenizer(Tokenizer):
    """reference: tokenizer.py CharacterTokenizer — one token per char."""

    def __init__(self, max_tokens: int | None = None):
        self.max_tokens = max_tokens

    def tokenize(self, text: str) -> list:
        return list(text or "")


class WhitespaceTokenizer(Tokenizer):
    def __init__(self, max_tokens: int | None = None):
        self.max_tokens = max_tokens

    def tokenize(self, text: str) -> list:
        return (text or "").split()


class BPERegexTokenizer(Tokenizer):
    """GPT-style pre-tokenization regex — a deterministic, dependency-free
    approximation of BPE token counts (the real merges only split further,
    so this lower-bounds tiktoken within ~15% on English text)."""

    _PAT = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+")

    def __init__(self, max_tokens: int | None = None):
        self.max_tokens = max_tokens

    def tokenize(self, text: str) -> list:
        return self._PAT.findall(text or "")


class OpenAITokenizer(Tokenizer):
    """tiktoken-backed (reference: tokenizer.py OpenAITokenizer). Raises
    ImportError here — the seam stays identical for environments that have
    tiktoken."""

    def __init__(self, model_name: str = "text-embedding-3-small", max_tokens: int | None = None):
        import tiktoken  # noqa: F401 — absent in this container

        self._enc = tiktoken.encoding_for_model(model_name)
        self.max_tokens = max_tokens

    def tokenize(self, text: str) -> list:
        return self._enc.encode(text or "")


class HuggingFaceTokenizer(Tokenizer):
    """transformers-backed (reference: tokenizer.py HuggingFaceTokenizer)."""

    def __init__(self, model_name: str, max_tokens: int | None = None):
        from transformers import AutoTokenizer  # noqa — absent in this container

        self._tok = AutoTokenizer.from_pretrained(model_name)
        self.max_tokens = max_tokens

    def tokenize(self, text: str) -> list:
        return self._tok.encode(text or "")


def token_count_expr(col: Column, kind: str = "whitespace") -> Column:
    """Native token counting for the hot path: whitespace or character."""
    if kind == "character":
        return F.length(F.coalesce(col, F.lit("")))
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


# BPERegexTokenizer._PAT without the `\s+(?!\S)` lookahead branch: RE2-based
# engines (DuckDB, Go) reject lookahead, and for COUNTING the branch is
# irrelevant — it only decides whether a whitespace run's last space attaches
# to the run or the following ` ?`-prefixed token, shifting one boundary
# without changing the number of matches.
BPE_COUNT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_regex_token_count_expr(col: Column) -> Column:
    """Native (JVM-side) BPE-regex token count: the BPERegexTokenizer's
    pre-tokenization as one ``regexp_extract_all`` expression — no Python in
    the hot path, and replayable on any RE2/PCRE engine via
    ``BPE_COUNT_PATTERN``."""
    return F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_COUNT_PATTERN), F.lit(0)))
