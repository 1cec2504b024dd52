"""Property derivation: fill missing extracted properties from unit
conversions, unit groups, and algebraic formulas.

Reference parity (lib/sycamore/sycamore/utils/derivation.py):
- ``PropertyDerivation.derive_conversion`` (:109-126) — fill a missing
  property by unit-converting another, never overwriting.
- ``fill_missing_units`` (:146-157) — first non-null field of a list is
  the reference; every other null field is filled by the *precision-aware
  rounded* conversion (``UnitConverter.convert``, :145-152, via
  ``_derive_all_conversion`` :128-144).
- ``unit_group`` (:159-188) — same fill with ``convert_exact`` and
  per-property source metadata.
- ``fill_from_formula`` (:190-267) — given ``a <op> b = target`` and
  exactly two of the three properties known, solve for the third with the
  reference's operator algebra and division-by-zero guards; any other
  known-count leaves the row untouched.

Spark-first design (100 TB): properties are COLUMNS, so every derivation
compiles to a CASE/coalesce expression — zero shuffle, whole-stage
codegen, no Python in the hot path. Conversion rates are composed on the
driver (the unit graph is tiny by nature) and inlined as literals, exactly
like ``convert_units``. The reference's precision-aware rounding factor
depends on ``str(value)``; columnar form reads the decimal-digit count
from ``CAST(value AS STRING)`` and looks the factor up in a
driver-computed table built with the reference's repeated ``/= 10``
(slightly different doubles from ``10**-d``; see
``UnitConverter.rounding_factor``). Cast-to-string reprs agree between
the JVM, Python, and DuckDB for plain decimals in ~[1e-3, 1e7) — callers
feeding values outside that range should quantize first (scientific
notation thresholds differ per engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .standardize import UnitConverter

_MAX_DECIMALS = 17


def _half_even(c: Column) -> Column:
    """Python ``round(x, 0)`` (half-even) as a double expression — the
    shared ``functions/rounding.py`` helper (one implementation keeps the
    derive and image-crop oracle arithmetic bit-identical)."""
    from sycamore_spark.functions.rounding import round_half_even

    return round_half_even(c, "double")


def rounding_factor_table(additional_digits: int = 1) -> list[float]:
    """factor per digits-after-decimal-point count, d = 0..17.

    Built with the reference's repeated division (derivation.py:119-135)
    so every entry is bit-identical to what the per-row Python computed.
    """
    out = []
    for d in range(_MAX_DECIMALS + 1):
        factor = 1.0
        for _ in range(d):
            factor /= 10
        factor /= 10**additional_digits
        out.append(factor)
    return out


def _rounding_factor_expr(value: Column, additional_digits: int = 1) -> Column:
    """Columnar ``UnitConverter.rounding_factor`` for double inputs.

    Doubles always render with a decimal point in range (``"30.0"``), so
    only the has-dot branch of the reference is reachable; the factor is
    a CASE over the digit count with driver-computed literals.
    """
    s = value.cast("string")
    d = F.length(F.substring_index(s, ".", -1))
    table = rounding_factor_table(additional_digits)
    expr = F.lit(table[_MAX_DECIMALS])
    for i in range(_MAX_DECIMALS - 1, -1, -1):
        expr = F.when(d == F.lit(i), F.lit(table[i])).otherwise(expr)
    return expr


def convert_rounded_expr(
    value: Column, rate: float, additional_digits: int = 1
) -> Column:
    """Precision-aware rounded conversion (``UnitConverter.convert``):
    value*rate snapped to a grid one digit finer than the input's own
    decimal precision, half-even."""
    exact = value * F.lit(float(rate))
    factor = _rounding_factor_expr(value, additional_digits)
    return factor * _half_even(exact / factor)


def derive_conversion(
    df: DataFrame,
    to_col: str,
    from_col: str,
    units: dict[str, str],
    converter: UnitConverter | None = None,
    additional_digits: int = 1,
) -> DataFrame:
    """Fill ``to_col`` where null by rounded-converting ``from_col``.

    Reference ``derive_conversion`` (derivation.py:109-126): existing
    values are never overwritten; both fields must have a unit and the
    units must be connected in the graph, else no-op. Adds
    ``{to_col}__src`` naming the source field for rows actually filled
    (the reference's ``metadata[to] = [from]``).
    """
    conv = converter or UnitConverter()
    if to_col not in units or from_col not in units:
        return df
    rate = conv.find_conversion_rate(units[from_col], units[to_col])
    if rate is None:
        return df
    fill = F.col(to_col).isNull() & F.col(from_col).isNotNull()
    converted = convert_rounded_expr(
        F.col(from_col).cast("double"), rate, additional_digits
    )
    # __src first: it reads the PRE-fill null state of to_col
    return df.withColumn(to_col + "__src", F.when(fill, F.lit(from_col))).withColumn(
        to_col, F.when(fill, converted).otherwise(F.col(to_col))
    )


def _group_fill(
    df: DataFrame,
    fields: dict[str, str],
    conv: UnitConverter,
    convert_expr,
    factor_digits: int | None = None,
) -> DataFrame:
    """Shared fill: first non-null field (in dict order) is the reference;
    every other null field converts from it. One coalesce + one CASE chain
    per field.

    The reference value, its name, and (for the rounded variant) the
    18-branch rounding-factor CASE are let-bound as projected columns —
    inlining them per output column blew janino's 64 KB codegen method
    limit, silently dropping the whole stage to interpreted eval (~6x
    slower; the round-6 wide-literal lesson). ``convert_expr`` receives
    (ref_value_col, rate, factor_col-or-None)."""
    names = list(fields)
    ref_val = F.coalesce(*[F.col(n).try_cast("double") for n in names])
    # first-non-null field name — tested on the CAST value so it names the
    # same field the coalesce picked (a raw-isNotNull test would disagree on
    # a non-castable string like 'N/A': wrong rate applied to another
    # field's value, wrong __src provenance)
    ref_name = F.lit(None).cast("string")
    for n in reversed(names):
        ref_name = F.when(
            F.col(n).try_cast("double").isNotNull(), F.lit(n)
        ).otherwise(ref_name)
    out = df.withColumn("_refv", ref_val).withColumn("_refn", ref_name)
    fac = None
    if factor_digits is not None:
        out = out.withColumn("_fac", _rounding_factor_expr(F.col("_refv"), factor_digits))
        fac = F.col("_fac")
    for n in names:
        branches = F.col(n).try_cast("double")
        filled_src = F.lit(None).cast("string")
        for r in names:
            if r == n:
                continue
            rate = conv.find_conversion_rate(fields[r], fields[n])
            if rate is None:
                continue
            # "missing" = actually null, matching the reference (it only
            # fills properties that are None and never overwrites an
            # existing value — even a non-castable one like 'N/A', which
            # simply becomes null through the output double cast)
            cond = F.col(n).isNull() & (F.col("_refn") == F.lit(r))
            branches = F.when(cond, convert_expr(F.col("_refv"), rate, fac)).otherwise(branches)
            filled_src = F.when(cond, F.lit(r)).otherwise(filled_src)
        out = out.withColumn(n + "__new", branches).withColumn(n + "__src", filled_src)
    for n in names:
        out = out.drop(n).withColumnRenamed(n + "__new", n)
    return out.drop("_refv", "_refn", "_fac")


def fill_missing_units(
    df: DataFrame,
    fields: dict[str, str],
    converter: UnitConverter | None = None,
    additional_digits: int = 1,
) -> DataFrame:
    """Reference ``fill_missing_units`` (derivation.py:146-157), columnar:
    the first double-castable field of the list anchors the row; NULL
    fields are filled with the precision-aware ROUNDED conversion —
    existing non-null values are never overwritten, matching the
    reference's fill-only-None rule. Adds ``{field}__src`` with the
    anchoring field name for filled cells.

    Deliberate columnar deviation: output columns are typed double, so a
    non-null non-castable value (e.g. the string 'N/A') is preserved as a
    *not-filled* cell but surfaces as null through the cast — the
    reference, being schemaless, would keep the literal string."""
    conv = converter or UnitConverter()

    def convert(v, rate, fac):
        exact = v * F.lit(float(rate))
        return fac * _half_even(exact / fac)

    return _group_fill(df, fields, conv, convert, factor_digits=additional_digits)


def unit_group(
    df: DataFrame,
    fields: dict[str, str],
    converter: UnitConverter | None = None,
) -> DataFrame:
    """Reference ``unit_group`` (derivation.py:159-188), columnar: same
    anchor-and-fill as ``fill_missing_units`` but with the EXACT
    conversion (``convert_exact``), plus per-field source metadata."""
    conv = converter or UnitConverter()
    for n, u in fields.items():
        assert u, f"Have a property {n} without units requested for conversion"
    return _group_fill(df, fields, conv, lambda v, rate, fac: v * F.lit(float(rate)))


def parse_formula(formula: str) -> tuple[str, str, str, str]:
    """``a <op> b = target`` → (a, op, b, target).

    The reference's parse (derivation.py:190-203): split on ``=``, the
    side containing an operator is the expression (left wins), operators
    probed in ``+-*/`` order with a single split.
    """
    ops = "+-*/"
    left, right = [p.strip() for p in formula.split("=")]
    if any(op in left for op in ops):
        expr, target = left, right
    else:
        expr, target = right, left
    for op in ops:
        if op in expr:
            a_sym, b_sym = [t.strip() for t in expr.split(op, 1)]
            return a_sym, op, b_sym, target
    raise ValueError("No arithmetic operator found in formula")


def fill_from_formula(df: DataFrame, formula: str) -> DataFrame:
    """Solve ``a <op> b = target`` for the one missing property per row.

    Reference ``fill_from_formula`` (derivation.py:190-267): exactly two
    of the three must be known, else the row is untouched; each solve
    branch carries the reference's division-by-zero guards (an unsolvable
    division also leaves the row untouched)."""
    a_sym, op, b_sym, target = parse_formula(formula)
    a = F.col(a_sym).cast("double")
    b = F.col(b_sym).cast("double")
    t = F.col(target).cast("double")
    known = (
        a.isNotNull().cast("int") + b.isNotNull().cast("int") + t.isNotNull().cast("int")
    )
    solve_t = {
        "+": a + b,
        "-": a - b,
        "*": a * b,
        "/": F.when(b != 0, a / b),
    }[op]
    solve_a = {
        "+": t - b,
        "-": t + b,
        "*": F.when(b != 0, t / b),
        "/": t * b,
    }[op]
    solve_b = {
        "+": t - a,
        "-": a - t,
        "*": F.when(a != 0, t / a),
        "/": F.when(t != 0, a / t),
    }[op]
    two = known == F.lit(2)
    out = df.withColumn(
        target, F.when(two & t.isNull(), solve_t).otherwise(F.col(target))
    )
    out = out.withColumn(
        a_sym, F.when(two & a.isNull(), solve_a).otherwise(F.col(a_sym))
    )
    return out.withColumn(
        b_sym, F.when(two & b.isNull(), solve_b).otherwise(F.col(b_sym))
    )
