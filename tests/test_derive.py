"""Property derivation (operators/derive.py) vs a per-row replica of the
reference's PropertyDerivation/UnitConverter.convert (utils/derivation.py)."""

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators import derive as dv
from sycamore_spark.operators.standardize import UnitConverter


def ref_convert(conv, value, fu, tu, additional_digits=1):
    # reference UnitConverter.convert (derivation.py:119-152), verbatim logic
    rate = conv.find_conversion_rate(fu, tu)
    if rate is None:
        return None
    exact = value * rate
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
    return factor * round(exact / factor, 0)


def test_rounding_factor_matches_reference():
    for v in [2.5, 30.0, 1234.56, 0.01, 490.02, 0.125]:
        assert UnitConverter.rounding_factor(v) == ref_convert_factor(v)
    # int path: trailing zeros multiply (reference's no-dot branch)
    assert UnitConverter.rounding_factor(1500) == pytest.approx(10.0)
    assert UnitConverter.rounding_factor(7) == pytest.approx(0.1)


def ref_convert_factor(value, additional_digits=1):
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


def test_factor_table_reproduces_repeated_division():
    # the table must reproduce the reference's /=10 accumulation bit-exactly
    t = dv.rounding_factor_table()
    for d in range(18):
        f = 1.0
        for _ in range(d):
            f /= 10
        f /= 10
        assert t[d] == f


def test_driver_convert_matches_reference():
    conv = UnitConverter()
    for v in [100.0, 2.5, 0.01, 490.02, 123.45]:
        for fu, tu in [("SF", "SM"), ("acre", "SM"), ("hectare", "SF"), ("SF", "SF")]:
            assert conv.convert(v, fu, tu) == ref_convert(conv, v, fu, tu)
    assert conv.convert(5.0, "SF", "parsec") is None
    assert conv.check("SF", "SM", 100.0, 9.3) is True
    assert conv.check("SF", "SM", 100.0, 20.0) is False
    assert conv.check("SF", "SM", 100.0, 0.0) is False


def test_convert_rounded_expr_matches_driver(spark):
    conv = UnitConverter()
    rate = conv.find_conversion_rate("SF", "SM")
    vals = [100.0, 2.5, 0.01, 490.02, 123.45, 30.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.c
        for r in df.select(
            dv.convert_rounded_expr(F.col("v"), rate).alias("c")
        ).collect()
    ]
    assert got == [conv.convert(v, "SF", "SM") for v in vals]


FIELDS = {"area_sf": "SF", "area_sm": "SM", "area_acre": "acre"}


def ref_group_fill(conv, row, exact):
    # reference fill_missing_units / unit_group (derivation.py:146-188)
    props = dict(row)
    src = {n: None for n in FIELDS}
    ref = next((n for n in FIELDS if props.get(n) is not None), None)
    if ref is None:
        return props, src
    for n in FIELDS:
        if n == ref or props.get(n) is not None:
            continue
        if exact:
            c = conv.convert_exact(props[ref], FIELDS[ref], FIELDS[n])
        else:
            c = ref_convert(conv, props[ref], FIELDS[ref], FIELDS[n])
        if c is not None:
            props[n] = c
            src[n] = ref
    return props, src


@pytest.mark.parametrize("exact", [True, False])
def test_group_fill_matches_reference(spark, exact):
    conv = UnitConverter()
    rows = [
        (100.0, None, None),
        (None, 25.5, None),
        (None, None, 3.25),
        (50.0, 99.0, None),  # two known: only the null fills, from the FIRST
        (None, None, None),
        (10.0, 20.0, 30.0),  # nothing to fill
    ]
    df = spark.createDataFrame(rows, "area_sf double, area_sm double, area_acre double")
    fn = dv.unit_group if exact else dv.fill_missing_units
    out = fn(df, FIELDS).collect()
    for got, row in zip(out, rows):
        props, src = ref_group_fill(
            conv, dict(zip(FIELDS, row)), exact
        )
        for n in FIELDS:
            g = getattr(got, n)
            assert g == pytest.approx(props[n]) if props[n] is not None else g is None
            assert getattr(got, n + "__src") == src[n]


def test_derive_conversion_no_overwrite(spark):
    df = spark.createDataFrame(
        [(100.0, None), (100.0, 42.0), (None, None)], "sf double, sm double"
    )
    out = dv.derive_conversion(df, "sm", "sf", {"sf": "SF", "sm": "SM"}).collect()
    conv = UnitConverter()
    assert out[0].sm == ref_convert(conv, 100.0, "SF", "SM")
    assert out[0].sm__src == "sf"
    assert out[1].sm == 42.0 and out[1].sm__src is None  # never overwrite
    assert out[2].sm is None
    # unit missing from the map -> untouched dataframe
    same = dv.derive_conversion(df, "sm", "sf", {"sf": "SF"})
    assert same.columns == df.columns


def ref_formula(a, b, t, op):
    # reference fill_from_formula solve branches (derivation.py:210-266)
    known = sum(x is not None for x in (a, b, t))
    if known != 2:
        return a, b, t
    if t is None:
        if op == "+":
            t = a + b
        elif op == "-":
            t = a - b
        elif op == "*":
            t = a * b
        elif op == "/":
            t = None if b == 0 else a / b
    elif a is None:
        if op == "+":
            a = t - b
        elif op == "-":
            a = t + b
        elif op == "*":
            a = None if b == 0 else t / b
        elif op == "/":
            a = t * b
    elif b is None:
        if op == "+":
            b = t - a
        elif op == "-":
            b = a - t
        elif op == "*":
            b = None if a == 0 else t / a
        elif op == "/":
            b = None if t == 0 else a / t
    return a, b, t


@pytest.mark.parametrize("op", ["+", "-", "*", "/"])
def test_fill_from_formula_matches_reference(spark, op):
    rows = [
        (6.0, 3.0, None),
        (None, 3.0, 12.0),
        (6.0, None, 12.0),
        (6.0, 0.0, None),   # zero guards
        (None, 0.0, 12.0),
        (0.0, None, 12.0),
        (6.0, None, 0.0),
        (None, None, 12.0),  # known != 2 -> untouched
        (6.0, 3.0, 12.0),    # all known -> untouched
    ]
    df = spark.createDataFrame(rows, "a double, b double, t double")
    out = dv.fill_from_formula(df, f"a {op} b = t").collect()
    for got, (a, b, t) in zip(out, rows):
        ea, eb, et = ref_formula(a, b, t, op)
        assert (got.a, got.b, got.t) == (
            pytest.approx(ea) if ea is not None else None,
            pytest.approx(eb) if eb is not None else None,
            pytest.approx(et) if et is not None else None,
        )


def test_docset_fluent_surface(spark):
    import sycamore_spark as ss

    df = spark.createDataFrame([(100.0, None)], "area_sf double, area_sm double")
    ds = ss.DocSet(df) if hasattr(ss, "DocSet") else None
    if ds is None:
        pytest.skip("no DocSet facade")
    fields = {"area_sf": "SF", "area_sm": "SM"}
    out = ds.fill_missing_units(fields).to_df().collect()[0]
    assert out.area_sm is not None and out.area_sm__src == "area_sf"
    out2 = ds.unit_group(fields).to_df().collect()[0]
    assert out2.area_sm == pytest.approx(100.0 * 0.092903)
    df3 = spark.createDataFrame([(6.0, 3.0, None)], "a double, b double, t double")
    got = ss.DocSet(df3).fill_from_formula("a * b = t").to_df().collect()[0]
    assert got.t == 18.0


def test_parse_formula_reference_order():
    # left side wins when it has an operator; ops probed in +-*/ order
    assert dv.parse_formula("a - b = c") == ("a", "-", "b", "c")
    assert dv.parse_formula("c = a / b") == ("a", "/", "b", "c")
    with pytest.raises(ValueError):
        dv.parse_formula("a = b")


def test_group_fill_non_castable_strings(spark):
    """String columns with garbage values: the reference anchor must be the
    first CASTABLE field (code-review finding: a raw-isNotNull test named
    'N/A' as the anchor while the coalesce picked the next field's value —
    wrong rate, wrong provenance). And per the reference's fill-only-None
    rule, the non-null 'N/A' cell is NOT overwritten with a conversion —
    it surfaces as null through the output double cast, unfilled."""
    conv = UnitConverter()
    df = spark.createDataFrame(
        [("N/A", "100", None)], "area_sf string, area_sm string, area_acre string"
    )
    out = dv.fill_missing_units(df, FIELDS).collect()[0]
    # anchor is area_sm (first castable); only the truly-null acre fills
    assert out.area_sf is None and out.area_sf__src is None
    assert out.area_acre == ref_convert(conv, 100.0, "SM", "acre")
    assert out.area_acre__src == "area_sm"
