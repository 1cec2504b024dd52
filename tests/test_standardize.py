"""Standardizers / augment_text / overlap chunker (reference:
transforms/standardizer.py, transforms/augment_text.py, functions/chunker.py)."""

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators import standardize as std


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Moved from TX to WA last year", "2024-03-05 14:30:00"),
        (2, "PO Box in CA, near NV border", "March 5, 2024"),
        (3, "No states here, just TEXT", "1/12/2023 0830"),
        (4, "AK", None),
    ]
    return spark.createDataFrame(rows, "id long, text string, when string")


def test_us_state(spark, docs):
    out = {r["id"]: r["text"] for r in std.standardize_us_state(docs, "text").collect()}
    assert out[1] == "Moved from Texas to Washington last year"
    assert out[2] == "PO Box in California, near Nevada border"
    assert out[3] == "No states here, just TEXT"  # TEXT is not \bTX\b
    assert out[4] == "Alaska"


def test_fix_military():
    assert std.fix_military("1/12/2023 0830") == "1/12/2023 08:30"
    assert std.fix_military("1/12/2023 08:30") == "1/12/2023 08:30"
    # no year-ish token → untouched
    assert std.fix_military("0830") == "0830"
    # two digit pairs → ambiguous, untouched
    assert std.fix_military("1/12/2023 0830 0900") == "1/12/2023 0830 0900"


def test_standardize_datetime(spark, docs):
    out = {r["id"]: r for r in std.standardize_datetime(docs, "when", out_field="when_std").collect()}
    assert out[1]["when_std"].startswith("March 05, 2024 14:30:00")
    assert str(out[1]["when_std_day"]) == "2024-03-05"
    assert str(out[2]["when_std_day"]) == "2024-03-05"
    # military clock repaired before parsing
    assert out[3]["when_std_dateTime"].hour == 8
    assert out[4]["when_std"] is None


def test_augment_template(spark, docs):
    out = std.augment_text(docs, "id={id} :: {text}", out_field="aug")
    got = {r["id"]: r["aug"] for r in out.collect()}
    assert got[1] == "id=1 :: Moved from TX to WA last year"
    # template path must stay native (no BatchEvalPython / ArrowEvalPython)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_augment_udf(spark, docs):
    out = std.augment_text(docs, lambda d: f"[{d['id']}] {d['text'][:5]}", out_field="text")
    got = {r["id"]: r["text"] for r in out.collect()}
    assert got[4] == "[4] AK"


def test_chunk_overlap(spark):
    text = " ".join(str(i) for i in range(10))
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = std.chunk_text_overlap(df, "text", chunk=4, overlap=1, join=False).collect()[0]["chunks"]
    # reference semantics: starts at 0,3,6,9
    assert out == [["0", "1", "2", "3"], ["3", "4", "5", "6"], ["6", "7", "8", "9"], ["9"]]


def test_chunk_overlap_invalid():
    with pytest.raises(ValueError):
        std.chunk_tokens_expr(F.col("x"), 4, 4)


def test_chunk_joined(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    out = std.chunk_text_overlap(df, "text", chunk=2, overlap=0).collect()[0]["chunks"]
    assert out == ["a b", "c d", "e"]


def test_chunker_matches_python_reference_randomized(spark):
    """The sequence/transform/slice chunking expression agrees with the
    reference's pure-Python formula (chunker.py:37-41) across 200 random
    (text, chunk, overlap) cases — one Spark job, all cases as rows."""
    import random

    rng = random.Random(7)
    cases = []
    for i in range(200):
        n = rng.randint(0, 40)
        text = " ".join(f"w{rng.randint(0, 9)}" for _ in range(n))
        chunk = rng.randint(2, 12)
        overlap = rng.randint(0, chunk - 1)
        cases.append((i, text, chunk, overlap))

    def expected(text, chunk, overlap):
        # split(trim(x), '\s+') on "" yields [""] in Spark; mirror that
        toks = text.strip().split() if text.strip() else [""]
        return [toks[a : a + chunk] for a in range(0, len(toks), chunk - overlap)]

    # group cases by (chunk, overlap) since the expression is per-config
    from collections import defaultdict

    by_cfg = defaultdict(list)
    for i, text, chunk, overlap in cases:
        by_cfg[(chunk, overlap)].append((i, text))
    for (chunk, overlap), rows in by_cfg.items():
        df = spark.createDataFrame(rows, "id long, text string")
        out = {r["id"]: r["chunks"] for r in std.chunk_text_overlap(
            df, "text", chunk=chunk, overlap=overlap, join=False
        ).collect()}
        for i, text in rows:
            assert out[i] == expected(text, chunk, overlap), (text, chunk, overlap)


def test_unit_converter_composes_rates():
    from sycamore_spark.operators.standardize import UnitConverter

    c = UnitConverter()
    assert c.find_conversion_rate("SF", "SF") == 1.0
    assert abs(c.find_conversion_rate("acre", "SM") - 43560.0 * 0.092903) < 1e-6
    assert c.find_conversion_rate("SF", "parsec") is None
    c.add_conversion("SM", "SC", 10_000.0)  # square... centi-something
    assert abs(c.convert_exact(2.0, "SF", "SC") - 2.0 * 0.092903 * 10_000.0) < 1e-6


def test_convert_units_column(spark):
    from sycamore_spark.operators.standardize import convert_units

    df = spark.createDataFrame(
        [(1, 1000.0, "SF"), (2, 2.0, "acre"), (3, 5.0, "furlong")],
        ["id", "v", "u"],
    )
    out = {r.id: r.converted_micros for r in convert_units(df, "v", "u", "SM").collect()}
    assert out[1] == int(1000.0 * 0.092903 * 1e6 + 0.5)
    assert out[3] is None
    assert out[2] is not None and out[2] > 8_000_000_000  # ~8094 SM in micros
