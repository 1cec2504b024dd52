"""Feature probes (compat.py): clear errors on older Sparks, probed once."""

import pytest

from sycamore_spark import compat


def test_probes_true_on_this_pyspark():
    assert compat.has("variant")
    assert compat.has("stream_dedup_watermark")


def test_forced_off_raises_named_error(spark):
    compat._OVERRIDES["variant"] = False
    try:
        with pytest.raises(compat.UnsupportedSparkFeature, match="variant.*4.0"):
            compat.require("variant")
        # the operator path surfaces the same error, not an AttributeError
        from sycamore_spark.functions.fields import parse_properties_variant

        df = spark.createDataFrame([('{"a": 1}',)], ["properties"])
        with pytest.raises(compat.UnsupportedSparkFeature):
            parse_properties_variant(df)
    finally:
        compat._OVERRIDES.clear()


def test_stream_dedup_gate(spark):
    compat._OVERRIDES["stream_dedup_watermark"] = False
    try:
        from sycamore_spark.streaming.dedup import dedup_stream

        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr("timestamp as ts", "cast(value as string) as text")
        )
        with pytest.raises(compat.UnsupportedSparkFeature, match="3.5"):
            dedup_stream(stream, text_col="text", ts_col="ts")
    finally:
        compat._OVERRIDES.clear()


def test_unknown_feature_is_a_programming_error():
    with pytest.raises(KeyError):
        compat.has("nonexistent")
