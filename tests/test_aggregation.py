"""Custom Aggregation frame (reference: transforms/aggregation.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sycamore_spark.docset import DocSet
from sycamore_spark.operators.aggregation import (
    Aggregation,
    Reduce,
    check_aggregation_laws,
    run_aggregation,
)


def weighted_avg_agg():
    return Aggregation(
        name="wavg",
        zero_factory=lambda: {"num": 0.0, "den": 0.0},
        accumulate_docs=lambda docs: {
            "num": sum(d["price"] * d["qty"] for d in docs),
            "den": sum(d["qty"] for d in docs),
        },
        combine_partials=lambda a, b: {"num": a["num"] + b["num"], "den": a["den"] + b["den"]},
        finalize=lambda p: {"wavg": p["num"] / p["den"] if p["den"] else float("nan")},
    )


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, f"g{i % 3}", float(i), float(i % 5 + 1)) for i in range(100)]
    return spark.createDataFrame(rows, "id long, grp string, price double, qty double").repartition(7)


def expected_wavg(rows, grp=None):
    sel = [r for r in rows if grp is None or r[1] == grp]
    return sum(r[2] * r[3] for r in sel) / sum(r[3] for r in sel)


def test_global_aggregation(spark, df):
    out = run_aggregation(df, weighted_avg_agg(), "wavg double").collect()
    rows = [tuple(r) for r in df.collect()]
    assert len(out) == 1
    assert out[0]["wavg"] == pytest.approx(expected_wavg(rows))


def test_grouped_aggregation(spark, df):
    out = run_aggregation(df, weighted_avg_agg(), "wavg double", group_key="grp")
    got = {r["key"]: r["wavg"] for r in out.collect()}
    rows = [tuple(r) for r in df.collect()]
    assert set(got) == {"g0", "g1", "g2"}
    for g in got:
        assert got[g] == pytest.approx(expected_wavg(rows, g))


def test_docset_aggregate_api(spark, df):
    ds = DocSet(df)
    out = ds.groupby("grp").aggregate(weighted_avg_agg(), out_schema="wavg double")
    assert out.count() == 3
    glob = ds.aggregate(weighted_avg_agg(), "wavg double")
    assert glob.count() == 1


def test_reduce(spark, df):
    # Reduce: concatenate ids in doc_id order per group (order-stable).
    red = Reduce(
        lambda docs: {"ids": ",".join(str(d["id"]) for d in docs)}, sort_key="id"
    )
    # stringified sort keys: "1" < "10" < "2"; mirror that in expectation
    out = run_aggregation(df.filter(F.col("id") < 12), red, "ids string", group_key="grp")
    got = {r["key"]: r["ids"] for r in out.collect()}
    exp: dict[str, str] = {}
    for i in sorted(range(12), key=str):
        g = f"g{i % 3}"
        exp[g] = (exp.get(g, "") + "," if g in exp else "") + str(i)
    assert got == exp


def test_matches_native_agg(spark, df):
    """The frame agrees with the equivalent native Spark aggregation."""
    native = {
        r["grp"]: r["w"]
        for r in df.groupBy("grp")
        .agg((F.sum(F.col("price") * F.col("qty")) / F.sum("qty")).alias("w"))
        .collect()
    }
    custom = {
        r["key"]: r["wavg"]
        for r in run_aggregation(df, weighted_avg_agg(), "wavg double", group_key="grp").collect()
    }
    for g, v in native.items():
        assert custom[g] == pytest.approx(v)


def test_commutativity_probe():
    docs = [{"price": float(i), "qty": float(i % 4 + 1), "id": i} for i in range(20)]
    base = check_aggregation_laws(weighted_avg_agg(), docs, seed=0)
    for seed in range(1, 6):
        assert check_aggregation_laws(weighted_avg_agg(), docs, seed=seed)["wavg"] == pytest.approx(
            base["wavg"]
        )
