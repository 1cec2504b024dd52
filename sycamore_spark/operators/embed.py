"""Embedding stages.

Reference parity: ``Embed`` batches texts through SentenceTransformer /
OpenAI / Bedrock models (reference: lib/sycamore/sycamore/transforms/
embed.py:133,201,292,359), doc- or element-level, skipping rows that already
carry an embedding.

Spark-first shape: model-holding embedders run as iterator-style
``mapInPandas`` (model loaded once per task ≈ the reference's actor pools,
base.py:130-140); the default ``HashingEmbedder`` is a fully deterministic,
dependency-free feature hasher computed with *native expressions* — no
Python at all — which is both the test-mode fake and a legitimate
large-scale featurizer (hashing trick).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sycamore_spark.functions import text as T


def hashing_embedding_expr(text_col: Column, dim: int = 64, hash_fn=None) -> Column:
    """Hashing-trick embedding: l2-normalized token-count buckets,
    bucket = hash(token) mod dim (xxhash64 default; pass the md5-based
    ``dedup.md5_hash60`` for a hash replicable in the DuckDB oracle). One
    fold over the token array — entirely JVM-side, zero shuffle,
    deterministic across engines/runs.

    Structure matters: HOF lambdas disable Spark's common-subexpression
    elimination, so (a) each token is hashed ONCE via a pre-pass transform
    (the naive per-bucket comparison hashes every token dim times), and
    (b) normalization happens in the aggregate's finish lambda, where the
    accumulated array is a bound variable — referencing it repeatedly is
    free, unlike referencing the fold expression itself."""
    h = hash_fn or (lambda t: F.xxhash64(t))
    buckets = F.transform(T.tokens(text_col), lambda t: F.pmod(h(t), F.lit(dim)))

    def finish(acc: Column) -> Column:
        norm = F.sqrt(F.aggregate(acc, F.lit(0.0), lambda a, x: a + x * x))
        safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
        return F.transform(acc, lambda v: (v / safe).cast("float"))

    return F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(acc, lambda v, i: v + F.when(b == i, 1.0).otherwise(0.0)),
        finish,
    )


def embed(
    df: DataFrame,
    text_col: str = "text_representation",
    out_col: str = "embedding",
    dim: int = 64,
    model_name: str | None = None,
    batch_size: int = 100,
    skip_existing: bool = True,
    hash_fn=None,
) -> DataFrame:
    """Attach an embedding column.

    - ``model_name=None``: deterministic native hashing embedder
      (``hash_fn`` overrides the token hash, e.g. ``dedup.md5_hash60``
      for an oracle-replicable bucket assignment).
    - otherwise: SentenceTransformer via Arrow-batched mapInPandas (model
      loaded once per task; raises ImportError if the library is absent —
      this container stubs model inference deliberately).
    """
    if model_name is None:
        new = hashing_embedding_expr(F.col(text_col), dim, hash_fn)
        if skip_existing and out_col in df.columns:
            new = F.coalesce(F.col(out_col), new)
        return df.withColumn(out_col, new)

    schema_fields = [f for f in df.schema.fields if f.name != out_col]
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    out_schema = StructType(schema_fields + [StructField(out_col, ArrayType(FloatType()))])

    def run(it: Iterable[pd.DataFrame]):
        from sentence_transformers import SentenceTransformer  # noqa: deferred heavy import

        model = SentenceTransformer(model_name)
        for pdf in it:
            texts = pdf[text_col].fillna("").tolist()
            vecs = model.encode(texts, batch_size=batch_size)
            pdf = pdf.drop(columns=[out_col], errors="ignore")
            pdf[out_col] = [list(map(float, v)) for v in vecs]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def embed_elements(df: DataFrame, dim: int = 64) -> DataFrame:
    """Element-level hashing embeddings via transform() (reference embeds
    per-element when element-level is requested, embed.py)."""
    return df.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e: e.withField("embedding", hashing_embedding_expr(e["text_representation"], dim)),
        ),
    )
