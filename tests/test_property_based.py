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
