"""Image-utility operations: crop geometry, box normalization, draw plans,
base64 data URLs, page-image filenames, and element image extraction.

Reference parity (lib/sycamore/sycamore/utils/image_utils.py):
- ``crop_to_bbox`` (:18-34) — relative bbox × page size ± padding.
- ``image_to_bytes`` / ``base64_data`` / ``base64_data_url`` (:37-74).
- ``image_page_filename_fn`` (:77-81).
- ``_default_coord_fn`` + the relative-coordinate heuristic and label/color
  placement in ``try_draw_boxes`` (:93-137, :210-231).
- ``extract_image_from_element`` / ``extract_images_from_elements``
  (:277-305) — crop each image element's bbox out of its page image.

Spark-first design (100 TB):
- Everything except rasterization is geometry/string math, expressed as
  native Column expressions (zero shuffle, whole-stage codegen, no Python
  in the hot path). The reference does all of this per-row in Python with
  PIL objects; here PIL is only needed to *rasterize*.
- ``try_draw_boxes`` splits into a native **draw plan** (per-box rectangle
  coords, color, label text and label anchor — one row per box, fully
  SQL-expressible) and a gated **renderer** that consumes the plan with
  PIL when available. Debug rendering never blocks the data path.
- Element image extraction is an Arrow-batched ``mapInPandas`` (codec
  loaded once per task). The real decoder (PIL) is absent in this
  container; the fake codec is a *real* raw-buffer crop: the page is a
  deterministic W×H byte grid and cropping is numpy slicing with PIL's
  zero-fill semantics for out-of-bounds regions — the plumbing, batch
  shape, and crop math are all exercised for real.
- Spark's ``base64`` emits RFC-2045 MIME chunking (76-char lines joined
  with CRLF); the reference uses Python ``b64encode`` (:63) which does
  not. The data-URL expression strips the chunking so outputs match the
  reference (and DuckDB's ``to_base64``) byte-for-byte.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .multimodal import _resolve_backend, _try_pil, fake_image_meta

DEFAULT_PADDING = 10  # reference image_utils.py:15


# -- crop geometry -----------------------------------------------------------

def _round_half_even(c: Column) -> Column:
    """Python/Pillow ``round()`` (banker's rounding) as a native expression.

    ``Image.crop`` rounds each float coordinate with ``round()`` before
    slicing pixels; Spark's ``F.round`` is half-up, so exact .5 ties would
    diverge. f = floor(x+0.5); on an exact tie (f-x == 0.5) an odd f steps
    down to the even neighbour.
    """
    from sycamore_spark.functions.rounding import round_half_even

    return round_half_even(c, "long")


def crop_box_expr(
    bbox: Column, width: Column, height: Column, padding: float = DEFAULT_PADDING
) -> Column:
    """Float crop window for a relative bbox on a width×height page.

    Exactly reference ``crop_to_bbox`` (image_utils.py:26-31): scale the
    relative coordinates to pixels and pad all four sides outward. Returns
    struct (x1, y1, x2, y2) of doubles; the window may extend outside the
    page — PIL fills those regions with zeros, it does not clamp.
    """
    p = F.lit(float(padding))
    return F.struct(
        (bbox[0] * width - p).alias("x1"),
        (bbox[1] * height - p).alias("y1"),
        (bbox[2] * width + p).alias("x2"),
        (bbox[3] * height + p).alias("y2"),
    )


def crop_pixel_rect_expr(crop: Column) -> Column:
    """Integer pixel rect PIL's ``Image.crop`` materializes for a float box.

    Pillow rounds each coordinate half-even (``map(int, map(round, box))``)
    and produces a (x1-x0) × (y1-y0) image (zero-filled where the rect
    leaves the source). Returns struct (x0, y0, x1, y1, w, h) of longs.
    """
    x0 = _round_half_even(crop["x1"])
    y0 = _round_half_even(crop["y1"])
    x1 = _round_half_even(crop["x2"])
    y1 = _round_half_even(crop["y2"])
    return F.struct(
        x0.alias("x0"),
        y0.alias("y0"),
        x1.alias("x1"),
        y1.alias("y1"),
        F.greatest(x1 - x0, F.lit(0)).alias("w"),
        F.greatest(y1 - y0, F.lit(0)).alias("h"),
    )


def crop_boxes(
    df: DataFrame,
    bbox_col: str = "bbox",
    width_col: str = "page_width",
    height_col: str = "page_height",
    padding: float = DEFAULT_PADDING,
    out_col: str = "crop",
) -> DataFrame:
    """Attach the padded crop window + pixel rect for each element row.

    Narrow, zero-shuffle: pure arithmetic over (bbox, page dims), safe at
    any scale.
    """
    crop = crop_box_expr(
        F.col(bbox_col), F.col(width_col).cast("double"), F.col(height_col).cast("double"), padding
    )
    return df.withColumn(out_col, crop).withColumn(
        out_col + "_px", crop_pixel_rect_expr(F.col(out_col))
    )


# -- box normalization + draw plan -------------------------------------------

def normalize_box_expr(arr: Column, width: Column, height: Column) -> Column:
    """Normalize a flat coordinate array to an absolute (x1,y1,x2,y2) box.

    Port of ``_default_coord_fn`` (image_utils.py:93-137) for columnar
    inputs — a flat array of 4 (x1,y1,x2,y2) or 8 (four corner pairs
    flattened; corners 0 and 2 are taken, :129) doubles — plus the
    relative-coordinate heuristic of ``try_draw_boxes`` (:210-215): when
    every coordinate is <= 1.0 the box is relative and is scaled by the
    page size. Unrecognized lengths yield NULL (the reference logs and
    skips, :206-208).
    """
    coords = F.when(F.size(arr) == 4, arr).when(
        F.size(arr) == 8, F.array(arr[0], arr[1], arr[4], arr[5])
    )
    rel = F.forall(coords, lambda c: c <= F.lit(1.0))
    pick = lambda i: coords[i].cast("double")  # noqa: E731
    sx = lambda c: F.when(rel, c * width).otherwise(c)  # noqa: E731
    sy = lambda c: F.when(rel, c * height).otherwise(c)  # noqa: E731
    return F.when(
        coords.isNotNull(),
        F.struct(
            sx(pick(0)).alias("x1"),
            sy(pick(1)).alias("y1"),
            sx(pick(2)).alias("x2"),
            sy(pick(3)).alias("y2"),
        ),
    )


def draw_ops(
    df: DataFrame,
    boxes_col: str = "boxes",
    width_col: str = "page_width",
    height_col: str = "page_height",
    color: str = "blue",
    line_width: int = 3,
) -> DataFrame:
    """Native draw plan: one instruction row per box.

    The per-box work of ``try_draw_boxes`` (image_utils.py:203-231) minus
    the rasterization: rectangle coords via ``normalize_box_expr``, outline
    color (default "blue", :144-145), line width 3 (:217), label text =
    the box index (:140-141), and the label anchor at
    (x1 - width/100, y1 - height/100) (:222). Fully SQL-expressible; feed
    the result to ``render_boxes`` to actually draw.
    """
    w = F.col(width_col).cast("double")
    h = F.col(height_col).cast("double")
    # OUTER explode: a page with no (or null) boxes must survive as one
    # instruction-free passthrough row — the reference's try_draw_boxes
    # returns the page unmodified rather than dropping it (an inner
    # explode silently lost box-less pages from the rendered output)
    out = df.select(
        "*", F.posexplode_outer(F.col(boxes_col)).alias("box_index", "_rawbox")
    )
    rect = normalize_box_expr(F.col("_rawbox"), w, h)
    return (
        out.withColumn("rect", rect)
        # keep: valid instructions + the no-boxes passthrough row; an
        # individually unrecognized box is skipped (reference :206-208)
        .filter(F.col("rect").isNotNull() | F.col("box_index").isNull())
        .withColumn("outline", F.when(F.col("rect").isNotNull(), F.lit(color)))
        .withColumn(
            "line_width",
            F.when(F.col("rect").isNotNull(), F.lit(int(line_width))),
        )
        .withColumn("label", F.col("box_index").cast("string"))
        .withColumn("label_x", F.col("rect")["x1"] - w / F.lit(100.0))
        .withColumn("label_y", F.col("rect")["y1"] - h / F.lit(100.0))
        .drop("_rawbox", boxes_col)
    )


def render_boxes(
    plan: DataFrame,
    image_col: str = "binary_representation",
    backend: str = "auto",
) -> DataFrame:
    """Rasterize a draw plan onto page images — the gated PIL seam.

    Real path (PIL present): group the plan per image and draw rectangles +
    labels exactly as ``try_draw_boxes`` does. Fake path: a deterministic
    stand-in payload (md5 of the image bytes and the ordered instruction
    list) that keeps the schema and grouping real for tests. PIL is not in
    this container, so the real branch is honestly gated.
    """
    mode = _resolve_backend(backend, _try_pil())
    if mode == "real":  # pragma: no cover - PIL absent in this container
        raise NotImplementedError("PIL rasterization not available in this container")
    gcols = [c for c in plan.columns if c not in
             {"box_index", "rect", "outline", "line_width", "label", "label_x", "label_y"}]
    agg = plan.groupBy(*gcols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "box_index",
                    F.col("rect")["x1"].alias("x1"),
                    F.col("rect")["y1"].alias("y1"),
                    F.col("rect")["x2"].alias("x2"),
                    F.col("rect")["y2"].alias("y2"),
                    "outline", "label",
                )
            )
        ).alias("_ops")
    )
    rendered = F.to_binary(
        F.md5(F.concat(F.coalesce(F.hex(F.col(image_col)), F.lit("")), F.to_json(F.col("_ops")))),
        F.lit("hex"),
    )
    return agg.withColumn("rendered", rendered).drop("_ops")


# -- encoding / naming glue --------------------------------------------------

def base64_unchunked(col: Column) -> Column:
    """Base64 without MIME line breaks — Python ``b64encode`` semantics.

    Spark's ``base64`` chunks at 76 chars with CRLF (RFC 2045); the
    reference's ``base64_data`` (image_utils.py:63) does not. Stripping
    CRLF recovers the exact unchunked encoding (padding and alphabet are
    identical), matching DuckDB's ``to_base64``.
    """
    return F.replace(F.base64(col), F.lit("\r\n"), F.lit(""))


def base64_data_url_expr(col: Column, format: str = "PNG") -> Column:
    """Image data URL, preserving the reference's exact prefix.

    ``base64_data_url`` (image_utils.py:74) formats
    ``data:image/{fmt}/;base64,...`` — including the stray ``/`` before
    the ``;`` — reproduced verbatim for parity.
    """
    return F.concat(
        F.lit(f"data:image/{format.lower()}/;base64,"), base64_unchunked(col)
    )


def page_image_filename_expr(path: Column, page_number: Column) -> Column:
    """``{basename minus last extension}_page_{n}.png``.

    Port of ``image_page_filename_fn`` (image_utils.py:77-81) including its
    edge case: a dot-less filename yields an empty base (``".".join(
    name.split(".")[0:-1])``).
    """
    name = F.element_at(F.split(path, "/"), -1)
    parts = F.split(name, r"\.")
    base = F.when(F.size(parts) > 1, F.array_join(F.slice(parts, 1, F.size(parts) - 1), ".")) \
        .otherwise(F.lit(""))
    return F.concat(base, F.lit("_page_"), page_number.cast("string"), F.lit(".png"))


# -- element image extraction ------------------------------------------------

def _fake_page_grid(payload: bytes) -> tuple[bytes, int, int]:
    """Deterministic W×H grayscale page: md5-hex chars tiled to W*H bytes.

    Dimensions come from the shared fake codec (``fake_image_meta``) so the
    multimodal metadata path and this crop path agree; the buffer is pure
    ASCII so a DuckDB oracle can rebuild it with repeat/substr.
    """
    meta = fake_image_meta(payload)
    w, h = meta["width"], meta["height"]
    hx = hashlib.md5(payload).hexdigest().encode("ascii")
    n = w * h
    buf = (hx * (n // len(hx) + 1))[:n]
    return buf, w, h


def _crop_grid(buf: bytes, w: int, h: int, rect) -> bytes:
    """Crop a row-major byte grid with PIL semantics (zero-fill outside)."""
    import numpy as np

    x0, y0, x1, y1 = rect
    cw, ch = max(x1 - x0, 0), max(y1 - y0, 0)
    out = np.zeros((ch, cw), dtype=np.uint8)
    if cw and ch:
        grid = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
        sy0, sy1 = max(y0, 0), min(y1, h)
        sx0, sx1 = max(x0, 0), min(x1, w)
        if sy1 > sy0 and sx1 > sx0:
            out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = grid[sy0:sy1, sx0:sx1]
    return out.tobytes()


def extract_element_images(
    df: DataFrame,
    elements_col: str = "elements",
    page_binary_col: str = "binary_representation",
    image_type: str = "Image",
    backend: str = "auto",
) -> DataFrame:
    """Crop each image element's bbox out of its page image.

    Port of ``extract_images_from_elements`` (image_utils.py:291-305):
    elements whose type matches ``image_type`` and that carry a bbox get
    their ``binary_representation`` replaced by the crop (padding=0,
    :282) and their pixel size recorded in ``properties`` (the reference
    sets ``image_size``/``image_mode`` attrs, :285-287); other elements
    pass through untouched.

    Arrow-batched ``mapInPandas``; per-doc work only, no shuffle. The real
    decoder (PIL) is gated; the fake codec crops a deterministic raw byte
    grid with genuine numpy slicing — see module docstring.
    """
    mode = _resolve_backend(backend, _try_pil())
    if mode == "real":  # pragma: no cover - PIL absent in this container
        raise NotImplementedError("PIL image decoding not available in this container")
    schema = df.schema

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out_elements = []
            for payload, els in zip(pdf[page_binary_col], pdf[elements_col]):
                if els is None or payload is None:
                    out_elements.append(els)
                    continue
                buf, w, h = _fake_page_grid(bytes(payload))
                new_els = []
                for el in els:
                    d = dict(el)
                    bbox = d.get("bbox")
                    if d.get("type") == image_type and bbox is not None and len(bbox) == 4:
                        # crop_to_bbox with padding=0 (ref :282) + PIL's
                        # half-even coordinate rounding.
                        import numpy as np

                        fx = [bbox[0] * w, bbox[1] * h, bbox[2] * w, bbox[3] * h]
                        rect = tuple(int(np.round(v)) for v in fx)
                        cropped = _crop_grid(buf, w, h, rect)
                        d["binary_representation"] = cropped
                        # MERGE into existing properties (the reference sets
                        # image_size/image_mode attrs alongside what's there,
                        # :285-287 — overwriting destroyed captions etc.)
                        import json as _json

                        try:
                            props = _json.loads(d.get("properties") or "{}")
                            if not isinstance(props, dict):
                                props = {}
                        except Exception:
                            props = {}
                        props.update({
                            "image_mode": "L",
                            "image_width": max(rect[2] - rect[0], 0),
                            "image_height": max(rect[3] - rect[1], 0),
                        })
                        d["properties"] = _json.dumps(props, sort_keys=True)
                    new_els.append(d)
                out_elements.append(new_els)
            pdf = pdf.copy()
            pdf[elements_col] = out_elements
            yield pdf

    return df.mapInPandas(run, schema=schema)
