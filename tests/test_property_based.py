"""Property-based tests (hypothesis) — the randomized layer the reference
lacks (SURVEY.md §5: 'no property-based/randomized framework'). Driver-side
pure logic only (no SparkSession per example — hypothesis runs hundreds)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from sycamore_spark.data.table import Table, TableCell
from sycamore_spark.llm.extract import extract_json
from sycamore_spark.llm.summarize import _leaf_groups
from sycamore_spark.operators.aggregation import Aggregation, check_aggregation_laws
from sycamore_spark.operators.standardize import fix_military

cell_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=20,
)


@settings(max_examples=200)
@given(
    rows=st.integers(1, 5),
    cols=st.integers(1, 4),
    data=st.data(),
)
def test_table_html_roundtrip(rows, cols, data):
    """A rectangular table of random cell text survives to_html→from_html
    with identical grid content."""
    cells = [
        TableCell(data.draw(cell_text).strip(), [r], [c], is_header=(r == 0))
        for r in range(rows)
        for c in range(cols)
    ]
    t = Table(cells)
    t2 = Table.from_html(t.to_html())
    assert t2.num_rows == t.num_rows and t2.num_cols == t.num_cols
    for a, b in zip(t.cells, t2.cells):
        assert a.rows == b.rows and a.cols == b.cols
        assert b.content == a.content.strip()
        assert a.is_header == b.is_header


@settings(max_examples=200)
@given(
    st.lists(st.text(st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)), max_size=30), max_size=30),
    st.integers(1, 50),
)
def test_leaf_groups_partition_property(texts, budget):
    """_leaf_groups preserves order and content: joining the groups equals
    joining the inputs; no group except singletons exceeds the budget."""
    groups = _leaf_groups(texts, budget)
    assert "\n".join(groups) == "\n".join(t or "" for t in texts)
    for g in groups:
        parts = g.split("\n")
        if len(parts) > 1:
            assert sum(len(p) for p in parts) <= budget + len(parts)


@settings(max_examples=200)
@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(1, 100)), min_size=1, max_size=50))
def test_aggregation_split_invariance(rows):
    """check_aggregation_laws: any split+swap of a sum-style aggregation
    finalizes identically (commutativity/associativity probe)."""
    agg = Aggregation(
        name="s",
        zero_factory=lambda: {"n": 0, "d": 0},
        accumulate_docs=lambda docs: {
            "n": sum(x["a"] * x["w"] for x in docs),
            "d": sum(x["w"] for x in docs),
        },
        combine_partials=lambda p, q: {"n": p["n"] + q["n"], "d": p["d"] + q["d"]},
        finalize=lambda p: {"v": (p["n"], p["d"])},
    )
    docs = [{"a": a, "w": w} for a, w in rows]
    base = check_aggregation_laws(agg, docs, seed=0)
    for seed in range(1, 8):
        assert check_aggregation_laws(agg, docs, seed=seed) == base


@settings(max_examples=300)
@given(st.text(alphabet="0123456789:/ .-", max_size=30))
def test_fix_military_idempotent_and_safe(s):
    """fix_military never raises and is idempotent."""
    once = fix_military(s)
    assert fix_military(once) == once


@settings(max_examples=200)
@given(st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-10**6, 10**6), st.text(max_size=10)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=5), children, max_size=4),
    ),
    max_leaves=10,
))
def test_extract_json_recovers_embedded(value):
    """Any JSON value embedded in prose noise is recovered verbatim (objects
    and arrays; scalars only when the whole string parses)."""
    payload = json.dumps(value)
    assert extract_json(payload) == value
    if isinstance(value, (dict, list)):
        assert extract_json(f"Sure! Here is the answer: {payload} Hope this helps.") == value


@given(
    st.lists(
        st.tuples(
            st.floats(0, 0.9),
            st.floats(0, 0.9),
            st.floats(0.01, 0.1),
            st.floats(0.01, 0.1),
        ),
        min_size=0, max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_xycut_is_total_deterministic_permutation(boxes):
    from sycamore_spark.operators.elements import _xycut

    items = [
        {"i": i, "bbox": [x, y, x + w, y + h]}
        for i, (x, y, w, h) in enumerate(boxes)
    ]
    out = _xycut([dict(e) for e in items])
    # permutation: every element exactly once
    assert sorted(e["i"] for e in out) == list(range(len(items)))
    # deterministic: same input -> same order
    out2 = _xycut([dict(e) for e in items])
    assert [e["i"] for e in out] == [e["i"] for e in out2]


@settings(max_examples=300, deadline=None)
@given(
    value=st.floats(0.001, 1e6, allow_nan=False, allow_infinity=False),
    fu=st.sampled_from(["SF", "SM", "acre", "hectare", "parsec"]),
    tu=st.sampled_from(["SF", "SM", "acre", "hectare", "parsec"]),
    extra=st.integers(0, 3),
)
def test_unit_convert_matches_reference_replica(value, fu, tu, extra):
    """UnitConverter.convert (precision-aware rounding) equals a verbatim
    replica of the reference's derivation.py:119-152 on random inputs —
    including the str(value)-derived factor and half-even round."""
    from sycamore_spark.operators.standardize import UnitConverter

    conv = UnitConverter()
    rate = conv.find_conversion_rate(fu, tu)
    got = conv.convert(value, fu, tu, additional_digits=extra)
    if rate is None:
        assert got is None
        return
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
    factor /= 10**extra
    assert got == factor * round(value * rate / factor, 0)


@settings(max_examples=300, deadline=None)
@given(
    a=st.one_of(st.none(), st.floats(-1e3, 1e3, allow_nan=False)),
    b=st.one_of(st.none(), st.floats(-1e3, 1e3, allow_nan=False)),
    t=st.one_of(st.none(), st.floats(-1e3, 1e3, allow_nan=False)),
    op=st.sampled_from("+-*/"),
)
def test_formula_solve_roundtrip(a, b, t, op):
    """fill_from_formula's solve branches (driver replica of the Spark
    expressions): with exactly two knowns and no zero-guard hit, plugging
    the solved value back satisfies the formula; otherwise untouched."""
    known = sum(x is not None for x in (a, b, t))
    sa, sb, st_ = a, b, t
    if known == 2:
        if t is None:
            if op == "+":
                st_ = a + b
            elif op == "-":
                st_ = a - b
            elif op == "*":
                st_ = a * b
            elif op == "/":
                st_ = None if b == 0 else a / b
        elif a is None:
            if op == "+":
                sa = t - b
            elif op == "-":
                sa = t + b
            elif op == "*":
                sa = None if b == 0 else t / b
            elif op == "/":
                sa = t * b
        elif b is None:
            if op == "+":
                sb = t - a
            elif op == "-":
                sb = a - t
            elif op == "*":
                sb = None if a == 0 else t / a
            elif op == "/":
                sb = None if t == 0 else a / t
    import math

    solved = known == 2 and (sa, sb, st_) != (a, b, t)
    if solved and None not in (sa, sb, st_) and all(
        math.isfinite(x) for x in (sa, sb, st_)
    ):
        lhs = {"+": sa + sb, "-": sa - sb, "*": sa * sb,
               "/": sa / sb if sb != 0 else None}[op]
        # overflow / tiny-divisor cases produce inf on BOTH sides (the
        # operator replays IEEE); the closure property only holds finitely.
        # SUBNORMAL intermediates are likewise excluded: solving a = t*b
        # with b = 5e-324 quantizes to a neighboring denormal and a/b then
        # misses t by O(1) — both engines compute the identical IEEE
        # result (parity holds), the mathematical roundtrip just doesn't.
        subnormal = any(
            x != 0.0 and abs(x) < 2.2250738585072014e-308 for x in (sa, sb, st_)
        )
        if lhs is not None and math.isfinite(lhs) and not subnormal:
            assert abs(lhs - st_) <= 1e-6 * max(1.0, abs(st_))
    if known != 2:
        assert (sa, sb, st_) == (a, b, t)
