from sycamore_spark.functions.fields import field_expr
from sycamore_spark.functions.filters import match_filter_expr, range_filter_expr
from sycamore_spark.functions.tokenizers import (
    BPERegexTokenizer,
    CharacterTokenizer,
    Tokenizer,
    WhitespaceTokenizer,
    token_count_expr,
)

__all__ = [
    "field_expr", "match_filter_expr", "range_filter_expr",
    "Tokenizer", "CharacterTokenizer", "WhitespaceTokenizer", "BPERegexTokenizer",
    "token_count_expr",
]
