"""Cross-engine rounding seam (VERDICT r2 #3/#4/#10).

The engines round doubles differently:

- Spark ``F.round(x, 2)`` rounds the SHORTEST DECIMAL REPR of the double
  (BigDecimal.valueOf) HALF_UP: 1.005 -> 1.01.
- DuckDB ``round(x, 2)`` computes ``round(x*100)/100`` in IEEE arithmetic:
  1.005*100 = 100.49999999999999 -> 1.00.
- The double->DECIMAL casts disagree with each other on yet other values
  (123456789.005 casts to .01 in Spark, .00 in DuckDB).

So every oracle-compared money conversion in this repo uses the
engine-agnostic ``floor(x*scale + 0.5)`` — plain IEEE ops evaluated
identically by both engines ON COLUMNS. (DuckDB constant-folds literal
expressions in decimal arithmetic, so these tests must feed values through
columns/params, exactly like the real parquet-backed oracle does.)
"""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# shortest-repr .5-boundary classics + scale extremes
ADVERSARIAL = [
    2.675, 0.125, 0.375, 1.005, 1.015, 2.665, 1234567.565,
    0.005, 0.015, 0.025, 99.995, 0.0, 1e-12, 123456789.005,
    8191.9999999999995, 4096.000000000001,
]


def _duck_col(expr: str, xs: list[float]) -> list:
    """Evaluate ``expr`` over a DOUBLE column (no literal constant-folding)."""
    con = duckdb.connect()
    con.sql("CREATE TABLE t(i INT, x DOUBLE)")
    for i, x in enumerate(xs):
        con.sql("INSERT INTO t VALUES (?, ?)", params=[i, x])
    return [r[0] for r in con.sql(f"SELECT {expr} AS v FROM t ORDER BY i").fetchall()]


def test_spark_round_vs_duckdb_round_diverge(spark):
    """The divergence this repo works around is REAL: round(double, 2)
    disagrees between engines on a shortest-repr boundary value. If this
    test ever fails, the engines converged and the floor workaround can be
    retired."""
    spark_v = spark.createDataFrame([(1.005,)], "x double").select(
        F.round("x", 2).alias("v")
    ).collect()[0].v
    (duck_v,) = _duck_col("round(x, 2)", [1.005])
    assert spark_v == 1.01  # shortest-repr HALF_UP
    assert duck_v == 1.0  # IEEE round(x*100)/100
    assert spark_v != duck_v


def test_spark_vs_duckdb_decimal_cast_diverge(spark):
    """The double->DECIMAL(18,2) casts also disagree (the actual r2
    tpch_q18 failure mechanism): Spark rounds the shortest repr, DuckDB
    does not on this value."""
    spark_v = spark.createDataFrame([(123456789.005,)], "x double").select(
        F.col("x").cast("decimal(18,2)").cast("double").alias("v")
    ).collect()[0].v
    (duck_v,) = _duck_col("(x::DECIMAL(18,2))::DOUBLE", [123456789.005])
    assert spark_v == 123456789.01
    assert duck_v == 123456789.0
    assert spark_v != duck_v


def test_floor_cents_conversion_agrees_on_adversarial_values(spark):
    """floor(x*100 + 0.5) produces bit-identical results in Spark and
    DuckDB on the values where round()/casts diverge."""
    df = spark.createDataFrame(list(enumerate(ADVERSARIAL)), "i int, x double")
    spark_vals = [
        r.v
        for r in df.orderBy("i")
        .select(F.floor(F.col("x") * 100 + F.lit(0.5)).alias("v"))
        .collect()
    ]
    duck_vals = _duck_col("CAST(floor(x * 100 + 0.5) AS BIGINT)", ADVERSARIAL)
    assert spark_vals == duck_vals


def test_floor_money2_conversion_agrees_on_adversarial_values(spark):
    """floor(x*100+0.5)/100.0 (the tpch_q18 o_totalprice shape) is
    bit-identical across engines."""
    df = spark.createDataFrame(list(enumerate(ADVERSARIAL)), "i int, x double")
    spark_vals = [
        r.v
        for r in df.orderBy("i")
        .select((F.floor(F.col("x") * 100 + F.lit(0.5)) / F.lit(100.0)).alias("v"))
        .collect()
    ]
    duck_vals = _duck_col("floor(x * 100 + 0.5) / 100.0", ADVERSARIAL)
    assert spark_vals == duck_vals


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.floats(min_value=0, max_value=1e7, allow_nan=False, allow_infinity=False),
        # target the boundary: k/100 + 0.005 neighborhoods
        st.integers(0, 10_000_000).map(lambda k: k / 100 + 0.005),
        st.integers(0, 10_000_000).map(lambda k: math.nextafter(k / 100 + 0.005, 0)),
        st.integers(0, 10_000_000).map(lambda k: math.nextafter(k / 100 + 0.005, math.inf)),
    )
)
def test_python_floor_model_matches_duckdb(x):
    """Driver-side property: Python's floor(x*100+0.5) (same IEEE ops)
    equals DuckDB's column evaluation — the Python model used to reason
    about the seam is faithful, at hypothesis scale (no Spark job per
    example)."""
    py = math.floor(x * 100 + 0.5)
    con = duckdb.connect()
    con.sql("CREATE TABLE t(x DOUBLE)")
    con.sql("INSERT INTO t VALUES (?)", params=[x])
    duck = con.sql("SELECT CAST(floor(x * 100 + 0.5) AS BIGINT) FROM t").fetchone()[0]
    assert py == duck
