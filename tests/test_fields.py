"""Dotted-path field access (functions/fields.py): typed / JSON-string /
Spark-4 Variant resolution."""


def test_field_expr_variant_branch(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.functions.fields import field_expr, parse_properties_variant

    df = spark.createDataFrame(
        [(1, '{"k": 7, "m": {"x": "deep"}}'), (2, '{"k": 9, "m": {"x": "er"}}')],
        "id long, props string",
    )
    v = parse_properties_variant(df, "props")
    assert dict(v.dtypes)["props"] == "variant"
    got = v.select(
        "id",
        field_expr(v, "props.k").cast("bigint").alias("k"),
        field_expr(v, "props.m.x").alias("x"),
    ).collect()
    js = df.select(
        "id",
        field_expr(df, "props.k").cast("bigint").alias("k"),
        field_expr(df, "props.m.x").alias("x"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, js))
