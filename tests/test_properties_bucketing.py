"""Property promotion/demotion + bucketed co-located joins
(operators/properties.py, writer.write_bucketed)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.data.schema2 import SchemaV2
from sycamore_spark.operators.properties import demote_properties, promote_properties
from sycamore_spark.writer import write_bucketed


@pytest.fixture(scope="module")
def props_df(spark):
    rows = [
        (1, json.dumps({"k": "42", "name": "alpha", "extra": "x"})),
        (2, json.dumps({"k": "7", "name": "beta"})),
        (3, None),
    ]
    return spark.createDataFrame(rows, "id long, properties string")


SCHEMA = SchemaV2.model_validate(
    {"properties": [{"name": "k", "type": {"type": "int"}}, {"name": "name", "type": {"type": "string"}}]}
)


def test_promote_typed_columns(spark, props_df):
    out = promote_properties(props_df, SCHEMA)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["k"] == 42 and rows[1]["name"] == "alpha"
    assert rows[3]["k"] is None
    assert dict(out.dtypes)["k"] == "bigint"
    assert out.filter(F.col("k") > 10).count() == 1


def test_promote_drop_promoted_keeps_remainder(spark, props_df):
    out = promote_properties(props_df, SCHEMA, drop_promoted=True)
    r1 = {r["id"]: json.loads(r["properties"] or "{}") for r in out.collect()}
    assert r1[1] == {"extra": "x"}
    assert r1[2] == {}


def test_demote_roundtrip(spark, props_df):
    promoted = promote_properties(props_df, SCHEMA, drop_promoted=True)
    back = demote_properties(promoted, ["k", "name"])
    r = {x["id"]: json.loads(x["properties"] or "{}") for x in back.collect()}
    assert r[1] == {"extra": "x", "k": "42", "name": "alpha"}
    assert "k" not in back.columns


def test_bucketed_join_no_exchange(spark, tmp_path):
    left = spark.createDataFrame([(i, f"l{i}") for i in range(100)], "k long, lv string")
    right = spark.createDataFrame([(i, f"r{i}") for i in range(100)], "k long, rv string")
    try:
        write_bucketed(left, "t_left_bkt", 4, "k", sort_cols=["k"])
        write_bucketed(right, "t_right_bkt", 4, "k", sort_cols=["k"])
        lt, rt = spark.table("t_left_bkt"), spark.table("t_right_bkt")
        joined = lt.join(rt, "k")
        assert joined.count() == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucket layout replaces the shuffle on both sides
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")
