"""Standardizers, text augmentation, and overlap chunking.

Reference parity:
- ``USStateStandardizer`` — word-boundary substring replace of US state
  abbreviations with full names (reference: lib/sycamore/sycamore/
  transforms/standardizer.py:54).
- ``DateTimeStandardizer`` — fuzzy date parse → formatted string plus
  ``day``/``dateTime`` properties, with military-time digit-pair repair
  (standardizer.py:171, fix_military :236).
- ``augment_text`` — rewrite ``text_representation`` from a template or UDF
  (transforms/augment_text.py:10-103; docset.py:370).
- ``TextOverlapChunker`` — token chunks of N with stride N-overlap
  (functions/chunker.py:11-40).

Spark-first notes: state standardization and template augmentation compile
to pure Column expressions (whole-stage codegen, no Python in the hot path).
Chunking is ``sequence``+``transform``+``slice`` higher-order functions over
the token array — also JVM-side. Only fuzzy datetime parsing drops to an
Arrow-batched pandas UDF (dateutil), mirroring the reference's dateparser
dependency; ISO-ish fast paths should use native ``to_timestamp`` upstream.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

US_STATE_ABBREVIATIONS: dict[str, str] = {
    "AK": "Alaska", "AL": "Alabama", "AR": "Arkansas", "AZ": "Arizona",
    "CA": "California", "CO": "Colorado", "CT": "Connecticut",
    "DC": "District of Columbia", "DE": "Delaware", "FL": "Florida",
    "GA": "Georgia", "HI": "Hawaii", "IA": "Iowa", "ID": "Idaho",
    "IL": "Illinois", "IN": "Indiana", "KS": "Kansas", "KY": "Kentucky",
    "LA": "Louisiana", "MA": "Massachusetts", "MD": "Maryland", "ME": "Maine",
    "MI": "Michigan", "MN": "Minnesota", "MO": "Missouri", "MS": "Mississippi",
    "MT": "Montana", "NC": "North Carolina", "ND": "North Dakota",
    "NE": "Nebraska", "NH": "New Hampshire", "NJ": "New Jersey",
    "NM": "New Mexico", "NV": "Nevada", "NY": "New York", "OH": "Ohio",
    "OK": "Oklahoma", "OR": "Oregon", "PA": "Pennsylvania",
    "RI": "Rhode Island", "SC": "South Carolina", "SD": "South Dakota",
    "TN": "Tennessee", "TX": "Texas", "UT": "Utah", "VA": "Virginia",
    "VT": "Vermont", "WA": "Washington", "WI": "Wisconsin",
    "WV": "West Virginia", "WY": "Wyoming",
}


def us_state_expr(col: Column) -> Column:
    """Column expression replacing \\b<ABBREV>\\b with the full state name.

    One alternation regexp pass to find candidates would not allow per-match
    replacement text in Spark, so this chains one ``regexp_replace`` per
    state; Catalyst folds the chain into a single codegen'd stage (51 narrow
    string ops, zero Python)."""
    out = col
    for abbrev, full in US_STATE_ABBREVIATIONS.items():
        out = F.regexp_replace(out, r"\b" + abbrev + r"\b", full)
    return out


def standardize_us_state(df: DataFrame, field: str, out_field: str | None = None) -> DataFrame:
    return df.withColumn(out_field or field, us_state_expr(F.col(field)))


# -- datetime ---------------------------------------------------------------

_CLOCK_RE = re.compile(r"\d:[0-5]\d")
_YEAR_RE = re.compile(r"([12]\d\d\d-)|(/[12]\d\d\d)|(\d/[0-3]?\d/\d)")
_DIGITPAIR_RE = re.compile(r"([0-2]\d)([0-5]\d)(\d\d)?")

DEFAULT_DATETIME_FORMAT = "%B %d, %Y %H:%M:%S%Z"


def fix_military(raw: str) -> str:
    """Rewrite a lone military digit-pair clock (``0800`` → ``08:00``) when
    the string has a year but no :-separated clock (reference semantics,
    standardizer.py:236-270: bail unless exactly one digit-pair and at least
    one year-like token and no regular clock)."""
    raw = raw.strip()
    tokens = raw.split()
    n_clock = sum(1 for t in tokens if _CLOCK_RE.search(t))
    n_year = sum(1 for t in tokens if not _CLOCK_RE.search(t) and _YEAR_RE.search(t))
    n_digits = sum(
        1
        for t in tokens
        if not _CLOCK_RE.search(t) and not _YEAR_RE.search(t) and _DIGITPAIR_RE.fullmatch(t)
    )
    if n_clock > 0 or n_year == 0 or n_digits != 1:
        return raw
    fixed = []
    for t in tokens:
        m = _DIGITPAIR_RE.fullmatch(t)
        if m:
            t = t[: m.start()] + ":".join(g for g in m.groups() if g) + t[m.end():]
        fixed.append(t)
    return " ".join(fixed)


def parse_datetime_fuzzy(raw: str | None) -> Optional[datetime]:
    """Fuzzy parse mirroring the reference fixer (standardizer.py:198-233):
    military repair, strip 'Local', '.'→':', then dateutil parse."""
    if raw is None:
        return None
    from dateutil import parser as duparser

    s = fix_military(raw).replace("Local", "").replace("local", "").replace(".", ":")
    try:
        return duparser.parse(s, fuzzy=True)
    except (ValueError, OverflowError):
        return None


def standardize_datetime(
    df: DataFrame,
    field: str,
    out_field: str | None = None,
    fmt: str = DEFAULT_DATETIME_FORMAT,
    add_day: bool = True,
) -> DataFrame:
    """Fuzzy-parse a date string column; writes the formatted string to
    ``out_field`` (default: in place) plus ``<out>_dateTime`` (timestamp)
    and ``<out>_day`` (date) columns, like the reference's ``dateTime`` /
    ``day`` properties (standardizer.py:272-310)."""
    out = out_field or field

    @pandas_udf("timestamp")
    def parse_udf(s: pd.Series) -> pd.Series:
        return s.map(parse_datetime_fuzzy)

    @pandas_udf("string")
    def fmt_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda d: d.strftime(fmt) if d is not None and not pd.isnull(d) else None)

    df = df.withColumn(f"{out}_dateTime", parse_udf(F.col(field)))
    df = df.withColumn(out, fmt_udf(F.col(f"{out}_dateTime")))
    if add_day:
        df = df.withColumn(f"{out}_day", F.to_date(F.col(f"{out}_dateTime")))
    return df


# -- text augmentation ------------------------------------------------------

_PLACEHOLDER_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_.]*)\}")


def template_expr(template: str) -> Column:
    """Compile ``"A {col} B {other.path}"`` into a native ``concat`` of
    literals and columns — the JVM-side fast path for the reference's Jinja
    augmentor (augment_text.py:54-103). Null columns render as ''. """
    pieces: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        pieces.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    return F.concat(*pieces) if pieces else F.lit("")


def augment_text(
    df: DataFrame,
    template: str | Column | Callable[[dict], str],
    out_field: str = "text_representation",
) -> DataFrame:
    """Rewrite a text column from a template string (native concat), a
    Column expression, or a per-row Python callable (slow path, Arrow
    batches) — the UDF/Jinja augmentor pair (augment_text.py:23-103)."""
    if isinstance(template, Column):
        return df.withColumn(out_field, template)
    if isinstance(template, str):
        return df.withColumn(out_field, template_expr(template))
    fn = template
    schema = df.schema
    if out_field not in df.columns:
        df = df.withColumn(out_field, F.lit(None).cast("string"))
        schema = df.schema

    def run(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_field] = [fn(r) for r in pdf.to_dict("records")]
            yield pdf

    return df.mapInPandas(run, schema=schema)


# -- overlap chunking -------------------------------------------------------

def chunk_tokens_expr(tokens: Column, chunk: int, overlap: int) -> Column:
    """``array<array<string>>`` of ``tokens[a : a+chunk]`` for
    ``a in range(0, n, chunk-overlap)`` — exact reference semantics
    (chunker.py:37-41) as sequence/transform/slice higher-order functions,
    fully JVM-side."""
    if overlap >= chunk:
        raise ValueError("Token overlap count between chunks must be lesser than chunk token count")
    stride = chunk - overlap
    n = F.size(tokens)
    # starts: 0, stride, 2*stride, ... < n — exactly len(range(0, n, stride))
    # chunks; n == 0 → no chunks (sequence(0,-1) would DESCEND, so guard it).
    n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    starts = F.when(n_chunks <= 0, F.array().cast("array<int>")).otherwise(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride)
    )
    return F.transform(starts, lambda a: F.slice(tokens, a + 1, chunk))


def chunk_text_overlap(
    df: DataFrame,
    field: str = "text",
    chunk: int = 1000,
    overlap: int = 100,
    out_field: str = "chunks",
    join: bool = True,
) -> DataFrame:
    """Tokenize (whitespace) then overlap-chunk; ``join=True`` re-joins each
    chunk to a string (array<string> column), else array<array<string>>."""
    toks = F.split(F.trim(F.col(field)), r"\s+")
    chunks = chunk_tokens_expr(toks, chunk, overlap)
    if join:
        chunks = F.transform(chunks, lambda c: F.array_join(c, " "))
    return df.withColumn(out_field, chunks)


def semantic_chunk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 32,
    dim: int = 64,
    threshold_micros: int = 600_000,
    hash_fn=None,
) -> DataFrame:
    """Semantic chunking: split each document where the TOPIC drifts, not
    at a fixed byte count — the chunking strategy that keeps a RAG chunk
    about one thing. The text is cut into fixed blocks of
    ``block_tokens``; each block gets a hashing bag-of-words count vector
    (bucket = hash(token) mod dim); a chunk boundary opens wherever the
    cosine between ADJACENT block vectors drops below the threshold.
    Returns one row per block: (id_col, block, cos_prev_micros, chunk_id)
    — group by (id, chunk_id) downstream to assemble chunk text.

    Exactness: count vectors are small integers, so the dot product and
    norms are exact and the quantized cosine replays bit-for-bit in SQL
    (use ``hash_fn=dedup.md5_hash60`` for the cross-engine hash). Shape:
    one explode + one (id, block, bucket) hash agg + one self-join on the
    NEXT block + one per-doc running sum — no Python, no O(n²); blocks
    join only their immediate neighbor."""
    from pyspark.sql.window import Window

    from sycamore_spark.functions import text as T
    from sycamore_spark.operators.dedup import md5_hash60

    h = hash_fn or md5_hash60
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(T.tokens(F.col(text_col))).alias("_p", "_tok"),
    )
    W = int(block_tokens)
    blocks = toks.select(
        "_id",
        ((F.col("_p") - F.pmod(F.col("_p"), F.lit(W))) / F.lit(W)).cast("long").alias("_b"),
        F.pmod(h(F.col("_tok")), F.lit(dim)).alias("_bk"),
    )
    counts = blocks.groupBy("_id", "_b", "_bk").agg(F.count(F.lit(1)).alias("_c"))
    norms = counts.groupBy("_id", "_b").agg(F.sum(F.col("_c") * F.col("_c")).alias("_nn"))
    nxt = counts.select("_id", (F.col("_b") - 1).alias("_b"), "_bk", F.col("_c").alias("_c2"))
    dots = (
        counts.join(nxt, ["_id", "_b", "_bk"])
        .groupBy("_id", "_b")
        .agg(F.sum(F.col("_c") * F.col("_c2")).alias("_dot"))
    )
    adj = (
        norms.alias("a")
        .join(
            norms.select("_id", (F.col("_b") - 1).alias("_b"), F.col("_nn").alias("_nn2")).alias("n2"),
            ["_id", "_b"],
            "left",
        )
        .join(dots, ["_id", "_b"], "left")
    )
    # cosine between block b and block b+1, attributed to block b+1 as
    # "similarity to previous" — NULL for block 0 (never a boundary test)
    cos = F.floor(
        F.coalesce(F.col("_dot").cast("double"), F.lit(0.0))
        / (F.sqrt(F.col("_nn").cast("double")) * F.sqrt(F.col("_nn2").cast("double")))
        * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    scored = adj.select(
        "_id", (F.col("_b") + 1).alias("_b"), cos.alias("cos_prev_micros")
    ).filter(F.col("cos_prev_micros").isNotNull())
    all_blocks = norms.select("_id", "_b").join(scored, ["_id", "_b"], "left")
    boundary = F.when(
        F.col("cos_prev_micros").isNotNull()
        & (F.col("cos_prev_micros") < F.lit(int(threshold_micros))),
        1,
    ).otherwise(0)
    w = Window.partitionBy("_id").orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    return all_blocks.select(
        F.col("_id").alias(id_col),
        F.col("_b").alias("block"),
        "cos_prev_micros",
        F.sum(boundary).over(w).cast("bigint").alias("chunk_id"),
    )


class UnitConverter:
    """Unit-conversion graph for extracted-property normalization
    (reference utils/derivation.py:8 — same built-in area units:
    SF/SM/acre/hectare). Conversions are edges with a rate; missing pairs
    are derived by composing rates along a breadth-first path, so adding
    one edge to a new unit connects it to every existing one.

    Determinism (beyond the reference): neighbor expansion is SORTED, so
    the chosen path — and therefore the composed float rate — never
    depends on dict insertion order across runs."""

    def __init__(self):
        self._edges: dict[str, dict[str, float]] = {}
        self.add_conversion("SF", "SM", 0.092903)
        self.add_conversion("acre", "SF", 43560.0)
        self.add_conversion("hectare", "SM", 10000.0)
        self.add_conversion("acre", "hectare", 0.404686)

    def add_conversion(self, from_unit: str, to_unit: str, factor: float) -> None:
        self._edges.setdefault(from_unit, {})[to_unit] = factor
        self._edges.setdefault(to_unit, {})[from_unit] = 1.0 / factor

    def find_conversion_rate(self, from_unit: str, to_unit: str) -> float | None:
        if from_unit == to_unit:
            return 1.0
        from collections import deque

        seen = {from_unit}
        q = deque([(from_unit, 1.0)])
        while q:
            unit, rate = q.popleft()
            for nbr in sorted(self._edges.get(unit, {})):
                r = rate * self._edges[unit][nbr]
                if nbr == to_unit:
                    return r
                if nbr not in seen:
                    seen.add(nbr)
                    q.append((nbr, r))
        return None

    def convert_exact(self, value: float, from_unit: str, to_unit: str) -> float | None:
        rate = self.find_conversion_rate(from_unit, to_unit)
        return None if rate is None else value * rate

    @staticmethod
    def rounding_factor(value: float, additional_digits: int = 1) -> float:
        """Precision-of-input rounding factor (reference derivation.py:119-135).

        Derived from ``str(value)``: with a decimal point, one tenth per
        digit after it; without (int inputs), ten per trailing zero —
        computed by the reference's repeated ``/= 10`` / ``*= 10`` (NOT
        ``10**-d``: repeated division accumulates different ulps, e.g.
        0.1/10 != 10.0**-2), reproduced exactly.
        """
        s = str(value)
        factor = 1.0
        if "." in s:
            for i in range(1, len(s) + 1):
                if s[-i] == ".":
                    break
                factor /= 10
        else:
            for i in range(1, len(s) + 1):
                if s[-i] != "0":
                    break
                factor *= 10
        factor /= 10**additional_digits
        return factor

    def convert(
        self, value: float, from_unit: str, to_unit: str, additional_digits: int = 1
    ) -> float | None:
        """Precision-aware conversion (reference derivation.py:145-152):
        the exact product snapped to a grid one digit (``additional_digits``)
        finer than the input's own precision, Python half-even rounding."""
        rate = self.find_conversion_rate(from_unit, to_unit)
        if rate is None:
            return None
        exact = value * rate
        factor = self.rounding_factor(value, additional_digits)
        return factor * round(exact / factor, 0)

    def check(self, from_unit: str, to_unit: str, value1: float, value2: float) -> bool:
        """Consistency probe (reference derivation.py:162-166): converted
        value1 within 5% relative error of value2. Divides by the SIGNED
        value2 — a negative expected value passes unconditionally — which
        is the reference's own arithmetic, reproduced verbatim for parity
        (its unit graph is all-positive areas, so the branch is benign)."""
        converted = self.convert_exact(value1, from_unit, to_unit)
        if converted is None:
            return False
        return value2 != 0 and abs(converted - value2) / value2 < 0.05


def convert_units(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    target_unit: str,
    out_col: str = "converted_micros",
    converter: UnitConverter | None = None,
) -> DataFrame:
    """Column form of ``UnitConverter``: normalize a (value, unit) pair
    column to ``target_unit``, quantized to integer micros. The rate
    CLOSURE is computed once on the driver (the unit graph is tiny by
    nature) and compiled into a CASE expression — pure JVM per row, no
    lookup join. Unknown units yield NULL."""
    conv = converter or UnitConverter()
    units = sorted(conv._edges)
    expr = None
    v = F.col(value_col).cast("double")
    for u in units:
        rate = conv.find_conversion_rate(u, target_unit)
        if rate is None:
            continue
        branch = F.when(
            F.col(unit_col) == u,
            F.floor(v * F.lit(float(rate)) * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        expr = branch if expr is None else expr.when(
            F.col(unit_col) == u,
            F.floor(v * F.lit(float(rate)) * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
    return df.withColumn(out_col, expr if expr is not None else F.lit(None).cast("long"))
