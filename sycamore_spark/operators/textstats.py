"""Text-analysis operators over a documents table: per-doc stats, language
ID, quality scoring, fingerprinting. All native expressions (functions/text.py)
— a single narrow projection per operator, no shuffle, full codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.functions import text as T


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document surface statistics. Returns
    (id, n_tokens, n_chars_obs, mean_word_len, distinct_tokens)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        T.token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars_obs"),
        F.round(T.mean_word_length(c), 6).alias("mean_word_len"),
        F.size(F.array_distinct(T.tokens(c))).alias("distinct_tokens"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic marker-word language classification → (id, lang_pred)."""
    return df.select(F.col(id_col), T.lang_id(F.col(text_col)).alias("lang_pred"))


def quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality features + composite score → (id, stopword_ratio, punct_ratio,
    quality_score)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.round(T.stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(T.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(T.quality_score(c), 6).alias("quality_score"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable md5 fingerprint of normalized text → (id, fingerprint)."""
    return df.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fingerprint"))
