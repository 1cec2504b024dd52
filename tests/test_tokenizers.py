"""Tokenizer family (reference: functions/tokenizer.py)."""

import pytest
from pyspark.sql import functions as F

from sycamore_spark.functions.tokenizers import (
    BPERegexTokenizer,
    CharacterTokenizer,
    HuggingFaceTokenizer,
    OpenAITokenizer,
    WhitespaceTokenizer,
    token_count_expr,
)


def test_character_tokenizer():
    t = CharacterTokenizer(max_tokens=10)
    assert t.tokenize("abc") == ["a", "b", "c"]
    assert t.count("") == 0 and t.max_tokens == 10


def test_whitespace_tokenizer():
    assert WhitespaceTokenizer().count("a  b\tc\nd") == 4


def test_bpe_regex_tokenizer():
    t = BPERegexTokenizer()
    toks = t.tokenize("I'll pay $12.50 today")
    assert "'ll" in toks and " pay" in toks
    assert t.count("hello world") == 2


def test_gated_tokenizers_raise():
    with pytest.raises(ImportError):
        OpenAITokenizer()
    with pytest.raises(ImportError):
        HuggingFaceTokenizer("bert-base-uncased")


def test_token_count_expr(spark):
    df = spark.createDataFrame([("a b  c",), ("",), (None,)], "t string")
    got = [r[0] for r in df.select(token_count_expr(F.col("t"))).collect()]
    assert got == [3, 0, 0]
    chars = [r[0] for r in df.select(token_count_expr(F.col("t"), "character")).collect()]
    assert chars == [6, 0, 0]


def test_bpe_count_expr_matches_object_tokenizer(spark):
    """The native (lookahead-free) count expression agrees with the Python
    BPERegexTokenizer on token COUNT — the lookahead branch only moves a
    whitespace boundary, never the number of matches."""
    from sycamore_spark.functions.tokenizers import (
        BPERegexTokenizer,
        bpe_regex_token_count_expr,
    )

    texts = [
        "hello world", "it's a test, isn't it?", "a   b   c", "trailing   ",
        "   leading", "", "x" * 50, "num 123 mix4d !!; --", "tabs\tand\nnewlines \n ",
        "we'll we've we're we'd I'm", "unicode naïve café ßharp",
    ]
    tok = BPERegexTokenizer()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r.i: r.n for r in df.select("i", bpe_regex_token_count_expr(F.col("t")).alias("n")).collect()}
    want = {i: tok.count(t) for i, t in enumerate(texts)}
    assert got == want
