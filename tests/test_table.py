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
