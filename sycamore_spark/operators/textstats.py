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


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (training-data quality rules beyond
    the reference's surface): fraction of tokens inside duplicate bigrams
    and the share of the most frequent bigram. All higher-order-function
    expressions — no shuffle, no Python.

    Returns (id, n_bigrams, distinct_bigrams, dup_bigram_frac,
    top_bigram_frac)."""
    toks = T.tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat(
                F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)
            ),
        )
    )
    # explode + two-level partial-aggregated groupBy: the bigram array is
    # constructed ONCE (HOF lambdas block Spark's common-subexpression
    # elimination, so referencing it from several stat columns recomputes
    # the whole array per column — 20x slower measured), and mode/distinct
    # come from vectorized hash aggregation that scales to arbitrarily
    # long documents. explode_outer keeps 0-bigram docs.
    b = df.select(F.col(id_col), F.explode_outer(bigrams).alias("_bg"))
    per_bigram = b.groupBy(id_col, "_bg").agg(F.count(F.col("_bg")).alias("_c"))
    nb = F.sum("_c")
    distinct_b = F.count(F.when(F.col("_bg").isNotNull(), 1))
    top = F.max("_c")
    return per_bigram.groupBy(id_col).agg(
        nb.cast("int").alias("n_bigrams"),
        distinct_b.cast("int").alias("distinct_bigrams"),
        F.round(
            F.when(nb == 0, 0.0).otherwise((nb - distinct_b) / nb.cast("double")), 6
        ).alias("dup_bigram_frac"),
        F.round(F.when(nb == 0, 0.0).otherwise(top / nb.cast("double")), 6).alias(
            "top_bigram_frac"
        ),
    )


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
    broadcast_probes: bool = True,
) -> DataFrame:
    """Test-set decontamination: flag documents sharing any word n-gram with
    a probe corpus (the standard benchmark-leakage check for training
    data).

    Scale shape: both sides explode to distinct n-grams; the probe n-gram
    set is deduped and (by default) broadcast, so the match is a broadcast
    semi-join per doc-ngram — no quadratic text comparison anywhere. For
    probe sets too big to broadcast, pass broadcast_probes=False for a
    shuffle hash join on the n-gram hash.

    Returns (id, n_ngrams, contaminated_ngrams, contamination_frac)."""
    def grams(col):
        toks = T.tokens(col)
        sz = F.size(toks)
        return F.when(sz < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )

    doc_grams = docs.select(
        F.col(id_col), F.explode_outer(F.array_distinct(grams(F.col(text_col)))).alias("_g")
    )
    probe_grams = probes.select(
        F.explode(F.array_distinct(grams(F.col(probe_text_col)))).alias("_g")
    ).distinct()
    if broadcast_probes:
        probe_grams = F.broadcast(probe_grams)
    hits = doc_grams.join(probe_grams.withColumn("_hit", F.lit(1)), "_g", "left")
    return hits.groupBy(id_col).agg(
        F.count(F.col("_g")).alias("n_ngrams"),
        F.count(F.col("_hit")).alias("contaminated_ngrams"),
        F.round(
            F.when(F.count(F.col("_g")) == 0, 0.0).otherwise(
                F.count(F.col("_hit")) / F.count(F.col("_g")).cast("double")
            ),
            6,
        ).alias("contamination_frac"),
    )
