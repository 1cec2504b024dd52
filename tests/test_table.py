"""Table/TableCell model (reference: data/table.py semantics)."""

import pytest

from sycamore_spark.data.table import Table, TableCell, TABLE_SCHEMA


def simple_table():
    return Table(
        [
            TableCell("h1", [0], [0], is_header=True),
            TableCell("h2", [0], [1], is_header=True),
            TableCell("a", [1], [0]),
            TableCell("b", [1], [1]),
            TableCell("c", [2], [0]),
            TableCell("d", [2], [1]),
        ]
    )


def test_contiguity_validation():
    with pytest.raises(ValueError):
        TableCell("x", [0, 2], [0])
    with pytest.raises(ValueError):
        TableCell("x", [0], [1, 3])


def test_dims_and_sort():
    t = simple_table()
    assert t.num_rows == 3 and t.num_cols == 2
    assert t.cells[0].content == "h1"


def test_to_csv_simple():
    assert simple_table().to_csv() == "h1,h2\na,b\nc,d\n"


def test_spanning_header_and_body():
    # header spans both columns; body cell spans 2 rows in col 0
    t = Table(
        [
            TableCell("H", [0], [0, 1], is_header=True),
            TableCell("x", [1, 2], [0]),
            TableCell("y1", [1], [1]),
            TableCell("y2", [2], [1]),
        ]
    )
    # header duplicated across columns; body span renders only at top-left
    assert t.column_headers() == ["H", "H"]
    assert t.to_csv() == "H,H\nx,y1\n,y2\n"


def test_multirow_header_join():
    t = Table(
        [
            TableCell("grp", [0], [0, 1], is_header=True),
            TableCell("a", [1], [0], is_header=True),
            TableCell("b", [1], [1], is_header=True),
            TableCell("1", [2], [0]),
            TableCell("2", [2], [1]),
        ]
    )
    assert t.column_headers() == ["grp | a", "grp | b"]


def test_from_html_roundtrip():
    html = (
        "<table><caption>Cap</caption><thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></tbody></table>"
    )
    t = Table.from_html(html)
    assert t.caption == "Cap"
    assert t == simple_table() or [c.content for c in t.cells] == ["h1", "h2", "a", "b", "c", "d"]
    assert t.to_csv() == "h1,h2\na,b\nc,d\n"


def test_from_html_spans():
    html = (
        "<table><tr><th rowspan=\"2\">id</th><th colspan=\"2\">name</th></tr>"
        "<tr><th>first</th><th>last</th></tr>"
        "<tr><td>1</td><td>Ada</td><td>Lovelace</td></tr></table>"
    )
    t = Table.from_html(html)
    assert t.num_rows == 3 and t.num_cols == 3
    assert t.column_headers() == ["id", "name | first", "name | last"]
    df = t.to_pandas()
    assert list(df.iloc[0]) == ["1", "Ada", "Lovelace"]


def test_to_html_emits_spans():
    t = Table([TableCell("H", [0], [0, 1], is_header=True), TableCell("x", [1], [0]), TableCell("y", [1], [1])])
    h = t.to_html()
    assert '<th colspan="2">H</th>' in h and "<td>x</td>" in h
    assert Table.from_html(h).to_csv() == t.to_csv()


def test_spark_rows_roundtrip(spark):
    t = simple_table()
    rows = t.to_spark_rows()
    df = spark.createDataFrame([(1, rows)], schema_from(spark))
    back = df.collect()[0]["table"]
    t2 = Table.from_spark_rows([r.asDict() for r in back])
    assert t2 == t


def schema_from(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    return StructType([StructField("id", LongType()), StructField("table", TABLE_SCHEMA)])


# -- ted_score (tree edit distance, reference data/table.py:571-587) --------


def _ref_forest_dist(f1, f2, memo):
    """Independent check implementation: plain recursive ordered-forest edit
    distance with unit costs (exponential; fine for small random tables)."""
    key = (tuple(id(t) for t in f1), tuple(id(t) for t in f2))
    if key in memo:
        return memo[key]
    if not f1 and not f2:
        d = 0
    elif not f1:
        d = sum(t.get_size() for t in f2)
    elif not f2:
        d = sum(t.get_size() for t in f1)
    else:
        a, b = f1[-1], f2[-1]
        d = min(
            _ref_forest_dist(f1[:-1] + a.children, f2, memo) + 1,
            _ref_forest_dist(f1, f2[:-1] + b.children, memo) + 1,
            _ref_forest_dist(f1[:-1], f2[:-1], memo)
            + _ref_forest_dist(a.children, b.children, memo)
            + (0 if a.label() == b.label() else 1),
        )
    memo[key] = d
    return d


def _random_table(rng, max_rows=4, max_cols=3):
    from sycamore_spark.data.table import Table, TableCell

    nrows = rng.randint(1, max_rows)
    ncols = rng.randint(1, max_cols)
    cells = []
    for r in range(nrows):
        c = 0
        while c < ncols:
            span = min(rng.randint(1, 2), ncols - c)
            cells.append(
                TableCell(
                    content=rng.choice(["a", "b", "c", "dd"]),
                    rows=[r],
                    cols=list(range(c, c + span)),
                    is_header=(r == 0 and rng.random() < 0.5),
                )
            )
            c += span
    return Table(cells)


def test_ted_score_identity_and_symmetry():
    from sycamore_spark.data.table import ted_score

    import random

    rng = random.Random(7)
    for _ in range(10):
        t1, t2 = _random_table(rng), _random_table(rng)
        assert ted_score(t1, t1) == 1.0
        s12, s21 = ted_score(t1, t2), ted_score(t2, t1)
        assert abs(s12 - s21) < 1e-12
        assert 0.0 <= s12 <= 1.0


def test_ted_score_one_cell_edit():
    from sycamore_spark.data.table import Table, TableCell, ted_score

    base = [
        TableCell("h1", [0], [0], is_header=True),
        TableCell("h2", [0], [1], is_header=True),
        TableCell("a", [1], [0]),
        TableCell("b", [1], [1]),
    ]
    changed = [TableCell("a", [1], [0]) if False else c for c in base]
    changed = base[:3] + [TableCell("X", [1], [1])]
    # 7 nodes (table + 2 tr + 4 cells); one rename
    assert abs(ted_score(Table(base), Table(changed)) - (1 - 1 / 7)) < 1e-12


def test_ted_score_spanning_and_header_changes():
    from sycamore_spark.data.table import Table, TableCell, ted_score

    spanning = Table(
        [
            TableCell("grp", [0], [0, 1], is_header=True),
            TableCell("x", [1, 2], [0]),
            TableCell("y1", [1], [1]),
            TableCell("y2", [2], [1]),
        ]
    )
    # same grid but the span collapsed to a single column: rename (colspan 2->1)
    collapsed = Table(
        [
            TableCell("grp", [0], [0], is_header=True),
            TableCell("x", [1, 2], [0]),
            TableCell("y1", [1], [1]),
            TableCell("y2", [2], [1]),
        ]
    )
    assert abs(ted_score(spanning, collapsed) - (1 - 1 / 8)) < 1e-12
    # header flip is also exactly one rename (th -> td)
    demoted = Table(
        [
            TableCell("grp", [0], [0, 1], is_header=False),
            TableCell("x", [1, 2], [0]),
            TableCell("y1", [1], [1]),
            TableCell("y2", [2], [1]),
        ]
    )
    assert abs(ted_score(spanning, demoted) - (1 - 1 / 8)) < 1e-12


def test_ted_score_randomized_crosscheck():
    """Zhang-Shasha vs an independent recursive forest-edit-distance
    implementation over 60 random table pairs (the chunker cross-check
    pattern)."""
    import random

    from sycamore_spark.data.table import (
        _tree_edit_distance,
        table_to_tree,
        ted_score,
    )

    rng = random.Random(42)
    for _ in range(60):
        t1, t2 = _random_table(rng), _random_table(rng)
        tt1, tt2 = table_to_tree(t1), table_to_tree(t2)
        zs = _tree_edit_distance(tt1, tt2)
        ref = _ref_forest_dist([tt1], [tt2], {})
        assert zs == ref, (zs, ref)
        expected = 1 - zs / max(tt1.get_size(), tt2.get_size(), 1)
        assert abs(ted_score(t1, t2) - expected) < 1e-12
