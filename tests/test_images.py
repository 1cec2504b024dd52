"""Image-utility operators (operators/images.py) vs a pure-Python replica
of the reference's PIL math (utils/image_utils.py)."""

import base64
import hashlib

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators import images as im
from sycamore_spark.operators.multimodal import fake_image_meta


def _els_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_crop_boxes_matches_reference_math(spark):
    # crop_to_bbox: bbox.x1*width - p, ..., bbox.x2*width + p (ref :26-31)
    df = _els_df(
        spark,
        [(0.1, 0.2, 0.4, 0.7, 613, 793)],
        "x1 double, y1 double, x2 double, y2 double, page_width int, page_height int",
    ).select(F.array("x1", "y1", "x2", "y2").alias("bbox"), "page_width", "page_height")
    row = im.crop_boxes(df, padding=10).collect()[0]
    assert row.crop.x1 == pytest.approx(0.1 * 613 - 10)
    assert row.crop.y1 == pytest.approx(0.2 * 793 - 10)
    assert row.crop.x2 == pytest.approx(0.4 * 613 + 10)
    assert row.crop.y2 == pytest.approx(0.7 * 793 + 10)
    # pixel rect: Pillow rounds each coord half-even then subtracts
    exp = [round(0.1 * 613 - 10), round(0.2 * 793 - 10), round(0.4 * 613 + 10), round(0.7 * 793 + 10)]
    assert [row.crop_px.x0, row.crop_px.y0, row.crop_px.x1, row.crop_px.y1] == exp
    assert row.crop_px.w == exp[2] - exp[0] and row.crop_px.h == exp[3] - exp[1]


def test_round_half_even_ties(spark):
    df = spark.createDataFrame(
        [(0.5,), (1.5,), (2.5,), (-0.5,), (-1.5,), (2.4,), (2.6,)], "v double"
    )
    out = [r.r for r in df.select(im._round_half_even(F.col("v")).alias("r")).collect()]
    assert out == [round(v) for v in [0.5, 1.5, 2.5, -0.5, -1.5, 2.4, 2.6]]


def test_normalize_box_formats(spark):
    # 4-coord relative, 4-coord absolute, 8-coord quad, unrecognized length
    df = spark.createDataFrame(
        [
            ([0.1, 0.2, 0.5, 0.6], 100, 200),
            ([15.0, 30.0, 80.0, 90.0], 100, 200),
            ([0.1, 0.2, 0.5, 0.2, 0.5, 0.6, 0.1, 0.6], 100, 200),
            ([1.0, 2.0, 3.0], 100, 200),
        ],
        "arr array<double>, w int, h int",
    )
    out = df.select(
        im.normalize_box_expr(
            F.col("arr"), F.col("w").cast("double"), F.col("h").cast("double")
        ).alias("b")
    ).collect()
    assert (out[0].b.x1, out[0].b.y1, out[0].b.x2, out[0].b.y2) == (10.0, 40.0, 50.0, 120.0)
    # any coord > 1 -> treated as absolute, no scaling (ref :210-215)
    assert (out[1].b.x1, out[1].b.y1, out[1].b.x2, out[1].b.y2) == (15.0, 30.0, 80.0, 90.0)
    # quad: corners 0 and 2 (ref :129), relative -> scaled
    assert (out[2].b.x1, out[2].b.y1, out[2].b.x2, out[2].b.y2) == (10.0, 40.0, 50.0, 120.0)
    assert out[3].b is None


def test_draw_ops_plan(spark):
    df = spark.createDataFrame(
        [("d1", [[0.1, 0.2, 0.5, 0.6], [20.0, 30.0, 80.0, 90.0]], 200, 400)],
        "doc_id string, boxes array<array<double>>, page_width int, page_height int",
    )
    plan = im.draw_ops(df).orderBy("box_index").collect()
    assert [p.box_index for p in plan] == [0, 1]
    assert plan[0].rect.x1 == pytest.approx(20.0)  # relative scaled
    assert plan[1].rect.x1 == pytest.approx(20.0)  # absolute untouched
    assert plan[0].outline == "blue" and plan[0].line_width == 3
    assert plan[0].label == "0" and plan[1].label == "1"
    # label anchor: (x1 - width/100, y1 - height/100) (ref :222)
    assert plan[0].label_x == pytest.approx(20.0 - 2.0)
    assert plan[0].label_y == pytest.approx(80.0 - 4.0)


def test_render_boxes_fake_is_deterministic(spark):
    df = spark.createDataFrame(
        [("d1", b"pagebytes", [[0.1, 0.2, 0.5, 0.6]], 200, 400)],
        "doc_id string, binary_representation binary, boxes array<array<double>>,"
        " page_width int, page_height int",
    )
    plan = im.draw_ops(df)
    a = im.render_boxes(plan, backend="fake").collect()[0]
    b = im.render_boxes(im.draw_ops(df), backend="fake").collect()[0]
    assert a.rendered == b.rendered and len(a.rendered) == 16
    with pytest.raises(NotImplementedError):
        im.render_boxes(plan, backend="real").collect()


def test_base64_matches_python_b64encode(spark):
    # >57 bytes forces Spark's MIME chunking; stripping must recover b64encode
    payload = bytes(range(256)) * 2
    df = spark.createDataFrame([(payload,)], "b binary")
    out = df.select(
        im.base64_unchunked(F.col("b")).alias("u"),
        im.base64_data_url_expr(F.col("b"), "PNG").alias("url"),
    ).collect()[0]
    expect = base64.b64encode(payload).decode()
    assert out.u == expect
    # exact reference prefix including the stray '/' (ref :74)
    assert out.url == "data:image/png/;base64," + expect


def test_page_image_filename(spark):
    df = spark.createDataFrame(
        [("docs/report.v1.pdf", 3), ("a/b/noext", 1), ("x.pdf", 12)],
        "path string, page int",
    )
    out = [
        r.f
        for r in df.select(
            im.page_image_filename_expr(F.col("path"), F.col("page")).alias("f")
        ).collect()
    ]
    # ".".join(name.split(".")[:-1]) semantics (ref :79): multi-dot keeps
    # interior dots; dot-less yields empty base.
    assert out == ["report.v1_page_3.png", "_page_1.png", "x_page_12.png"]


ELS = (
    "doc_id string, binary_representation binary, elements array<struct<"
    "element_index int, type string, bbox array<double>,"
    " binary_representation binary, properties string>>"
)


def test_extract_element_images_fake_crop(spark):
    payload = b"the page payload"
    el = {"binary_representation": None, "properties": None}
    df = spark.createDataFrame(
        [
            (
                "d1",
                payload,
                [
                    {"element_index": 0, "type": "Image", "bbox": [0.1, 0.2, 0.5, 0.6], **el},
                    {"element_index": 1, "type": "Text", "bbox": [0.0, 0.0, 1.0, 1.0], **el},
                    {"element_index": 2, "type": "Image", "bbox": None, **el},
                ],
            )
        ],
        ELS,
    )
    out = im.extract_element_images(df, backend="fake").collect()[0]
    els = sorted(out.elements, key=lambda e: e.element_index)
    # replicate: W,H from the shared fake codec, md5-hex tiling, numpy slice
    meta = fake_image_meta(payload)
    w, h = meta["width"], meta["height"]
    hx = hashlib.md5(payload).hexdigest().encode()
    buf = (hx * (w * h // 32 + 1))[: w * h]
    x0, y0 = round(0.1 * w), round(0.2 * h)
    x1, y1 = round(0.5 * w), round(0.6 * h)
    expect = b"".join(buf[y * w + x0 : y * w + x1] for y in range(y0, y1))
    assert bytes(els[0].binary_representation) == expect
    assert f'"image_width": {x1 - x0}' in els[0].properties
    # non-image and bbox-less elements pass through untouched
    assert els[1].binary_representation is None and els[1].properties is None
    assert els[2].binary_representation is None and els[2].properties is None
    with pytest.raises(NotImplementedError):
        im.extract_element_images(df, backend="real").collect()


def test_crop_grid_zero_fill_out_of_bounds():
    # PIL fills regions outside the source with zeros (no clamping)
    buf = bytes(range(1, 13))  # 4x3 grid
    out = im._crop_grid(buf, 4, 3, (-1, -1, 2, 2))
    # 3x3 crop anchored at (-1,-1): first row/col zero, rest from grid
    assert out == bytes([0, 0, 0, 0, 1, 2, 0, 5, 6])
    assert im._crop_grid(buf, 4, 3, (2, 2, 2, 5)) == b""  # zero-width


def test_extract_element_images_preserves_existing_properties(spark):
    """The crop must MERGE its size/mode into existing element properties
    (code-review finding: the overwrite destroyed captions)."""
    import json

    from sycamore_spark.data.schema import docs_from_rows
    from sycamore_spark.operators.images import extract_element_images

    df = docs_from_rows(spark, [{
        "doc_id": "d1",
        "binary_representation": b"page-bytes-0123456789" * 10,
        "elements": [{
            "type": "Image", "bbox": [0.1, 0.1, 0.5, 0.5],
            "properties": {"caption": "Fig 3", "source": "p2"},
        }],
    }])
    el = extract_element_images(df).collect()[0].elements[0]
    props = json.loads(el["properties"])
    assert props["caption"] == "Fig 3" and props["source"] == "p2"
    assert props["image_mode"] == "L" and props["image_width"] > 0


def test_draw_ops_preserves_boxless_pages(spark):
    """Pages with no/null boxes survive as one instruction-free row (the
    reference returns the page unmodified; an inner explode dropped them)."""
    from sycamore_spark.operators.images import draw_ops

    df = spark.createDataFrame(
        [("p1", [[0.1, 0.1, 0.5, 0.5]], 100.0, 100.0),
         ("p2", [], 100.0, 100.0),
         ("p3", None, 100.0, 100.0)],
        "page string, boxes array<array<double>>, page_width double, page_height double",
    )
    out = draw_ops(df).collect()
    by_page = {}
    for r in out:
        by_page.setdefault(r.page, []).append(r)
    assert set(by_page) == {"p1", "p2", "p3"}
    assert by_page["p1"][0].rect is not None and by_page["p1"][0].outline == "blue"
    for p in ("p2", "p3"):
        (row,) = by_page[p]
        assert row.rect is None and row.box_index is None and row.outline is None
