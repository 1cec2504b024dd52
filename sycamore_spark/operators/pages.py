"""Page-level document operations (reference utils/pdf_utils.py — the last
reference utility module with unported computation).

The reference couples three separable concerns: (1) page-selection
arithmetic (``flatten_selected_pages``, pdf_utils.py:33-70 — pure), (2)
element bookkeeping (``filter_elements_by_page`` renumbering,
pdf_utils.py:87-97; ``promote_title``, pdf_utils.py:216-231 — pure), and
(3) PDF binary rewriting through pypdf (``select_pdf_pages``,
pdf_utils.py:73-84). Here (1) and (2) are native; (3) is an injectable
``binary_fn`` seam, because pypdf is not in this container — same gating
pattern as the LibreOffice converter in ``multimodal.py``. The IPython
display helpers (``enumerate_images_and_tables``,
``display_page_and_table_properties``) are notebook glue with no engine
semantics and are deliberately not ported.

Scale shape: every operator is a per-row element-array rewrite — one
narrow projection, zero shuffle. ``split_pages`` adds one explode whose
fan-out is pages/num_pages per doc; page selections are driver-side
literals (a handful of ints), never a join.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten_selected_pages(
    selected_pages: list[int | list[int]], page_count: int
) -> tuple[list[int], dict[int, int]]:
    """Expand a page selection — ints and/or [start, end] ranges, 1-indexed
    — into the ordered page list plus a {new: original} remap for positions
    where they differ (reference pdf_utils.py:33-70, including its three
    ValueError conditions: descending range, overlapping pages, out of
    bounds)."""
    page_list: list[int] = []
    present: set[int] = set()
    remapped: dict[int, int] = {}
    for selection in selected_pages:
        if isinstance(selection, int):
            selection = [selection, selection]
        if not (isinstance(selection, list) and len(selection) == 2):
            raise ValueError(
                "Page selection must either be an integer or a 2-element list [integer, integer]"
            )
        start, end = selection
        if end < start:
            raise ValueError("For selected_pages like [a, b] it must be that a <= b.")
        for page_num in range(start, end + 1):
            if page_num in present:
                raise ValueError("selected_pages may not include overlapping pages.")
            if page_num <= 0 or page_num > page_count:
                raise ValueError(
                    f"Invalid page number ({page_num}): for this document,"
                    f"page numbers must be at least 1 and at most {page_count}"
                )
            present.add(page_num)
            page_list.append(page_num)
            if page_num != len(page_list):
                remapped[len(page_list)] = page_num
    return (page_list, remapped)


def _page_map_expr(page_list: list[int]) -> Column:
    """original page -> new 1-indexed position, as a literal map."""
    pairs: list[Column] = []
    for new_idx, orig in enumerate(page_list, start=1):
        pairs += [F.lit(orig), F.lit(new_idx)]
    return F.create_map(*pairs)


def select_pages(
    df: DataFrame,
    page_selection: list[int | list[int]],
    page_count: int | None = None,
    elements_col: str = "elements",
    binary_fn: Callable[[bytes, list[int]], bytes] | None = None,
) -> DataFrame:
    """Keep only the selected pages of each document (reference
    ``select_pages``, pdf_utils.py:99-133): elements outside the selection
    are dropped, surviving elements get their ``page_number`` renumbered to
    the new 1-indexed position, and the ``remapped_pages`` {new: original}
    record lands in the doc properties. ``page_count`` bounds-checks the
    selection like the reference (pass the corpus's page count; None skips
    the bound — absent pages simply select nothing). ``binary_fn(binary,
    page_list) -> binary`` is the pypdf rewrite seam
    (``select_pdf_pages``); without it the binary passes through untouched
    (honestly gated — pypdf is not in this container)."""
    page_list, remapped = flatten_selected_pages(
        page_selection, page_count if page_count is not None else max(
            (p for s in page_selection for p in (s if isinstance(s, list) else [s])),
            default=0,
        )
    )
    pmap = _page_map_expr(page_list)
    els = F.col(elements_col)
    renumbered = F.transform(
        F.filter(els, lambda e: F.element_at(pmap, e["page_number"]).isNotNull()),
        lambda e: e.withField("page_number", F.element_at(pmap, e["page_number"])),
    )
    props = F.from_json(F.coalesce(F.col("properties"), F.lit("{}")), "map<string,string>")
    new_props = F.to_json(F.map_concat(
        F.map_filter(props, lambda k, _: k != F.lit("remapped_pages")),
        F.create_map(
            F.lit("remapped_pages"),
            F.lit(json.dumps({str(k): v for k, v in sorted(remapped.items())})),
        ),
    ))
    out = df.withColumn(elements_col, renumbered).withColumn("properties", new_props)
    if binary_fn is not None and "binary_representation" in df.columns:
        out = _rewrite_binary(out, binary_fn, page_list)
    return out


def _rewrite_binary(df: DataFrame, binary_fn, page_list: list[int]) -> DataFrame:
    import pandas as pd

    def run(it: Iterable["pd.DataFrame"]):
        for pdf in it:
            pdf = pdf.copy()
            pdf["binary_representation"] = [
                binary_fn(bytes(b), page_list) if b is not None else None
                for b in pdf["binary_representation"]
            ]
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def split_pages(
    df: DataFrame,
    num_pages: int = 1,
    elements_col: str = "elements",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into children of ``num_pages`` consecutive pages
    (reference ``split_pdf``, pdf_utils.py:136-181, the FlatMap form):
    child k carries pages [k*num_pages+1, ...], its elements renumbered to
    1-based within the child, with ``_original_id``, ``_split_index`` and
    ``remapped_pages`` properties exactly as the reference writes them.
    The page count comes from the elements (max page_number — the
    reference reads it from the PDF; the binary split itself is the gated
    pypdf seam, so children keep a null binary). One explode, fan-out =
    page_count/num_pages per doc, elements pruned per child natively."""
    els = F.col(elements_col)
    pc = F.coalesce(
        F.array_max(F.transform(els, lambda e: e["page_number"])), F.lit(1)
    )
    n_chunks = F.ceil(pc / F.lit(float(num_pages))).cast("int")
    # children inherit the parent's remaining document columns (the
    # reference's split_pdf copies the Document) — binary stays null (the
    # actual page-split binary is the gated pypdf seam); without the
    # passthrough any downstream DocSet stage reading standard columns
    # (sketch/embed/explode) broke on unresolved columns
    inherit = [
        c for c in df.columns
        if c not in (id_col, "parent_id", elements_col, "properties",
                     "binary_representation")
    ]
    out = df.select(
        F.col(id_col).alias("_orig_id"),
        els.alias("_els"),
        pc.alias("_pc"),
        *[F.col(c) for c in inherit],
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_split_index", "_chunk"),
    )
    start = F.col("_chunk") * num_pages + 1
    end = start + num_pages - 1
    kept = F.transform(
        F.filter(
            F.col("_els"),
            lambda e: e["page_number"].between(start, end),
        ),
        lambda e: e.withField("page_number", e["page_number"] - start + 1),
    )
    # reference remapped_pages: {new: orig} where they differ — for chunk 0
    # new == orig (empty map); for chunk k>0 every kept page remaps; the
    # last chunk is bounded by the page count (flatten_selected_pages gets
    # [[start, min(pc, start+num_pages-1)]] in the reference)
    remap = F.when(F.col("_chunk") == 0, F.lit("{}")).otherwise(
        F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(num_pages), F.col("_pc") - F.col("_chunk") * num_pages),
                    ),
                    lambda i: F.concat(
                        F.lit('"'), i.cast("string"), F.lit('": '),
                        (i + F.col("_chunk") * num_pages).cast("string"),
                    ),
                ),
                ", ",
            ),
            F.lit("}"),
        )
    )
    props = F.to_json(F.map_from_arrays(
        F.array(F.lit("_original_id"), F.lit("_split_index"), F.lit("remapped_pages")),
        F.array(F.col("_orig_id").cast("string"), F.col("_split_index").cast("string"), remap),
    ))
    cols = [
        F.concat(F.col("_orig_id"), F.lit("-pg"), F.col("_split_index")).alias(id_col),
        F.col("_orig_id").alias("parent_id"),
        F.col("_split_index"),
        kept.alias(elements_col),
        props.alias("properties"),
        *[F.col(c) for c in inherit],
    ]
    if "binary_representation" in df.columns:
        cols.append(F.lit(None).cast("binary").alias("binary_representation"))
    return out.select(*cols)


def promote_title(
    df: DataFrame,
    title_candidate_elements: tuple = ("Section-header", "Caption"),
    elements_col: str = "elements",
) -> DataFrame:
    """Promote the largest-font candidate element on page 1 to type "Title"
    (reference ``promote_title``, pdf_utils.py:216-231): documents that
    already have a Title on page 1 are untouched; otherwise the FIRST
    candidate (Section-header/Caption by default) with the strictly
    greatest ``font_size`` property is retyped. Pure element-array rewrite
    — zero shuffle."""
    els = F.col(elements_col)
    is_cand = lambda e: e["type"].isin(*[F.lit(t) for t in title_candidate_elements])  # noqa: E731
    font = lambda e: F.get_json_object(e["properties"], "$.font_size").cast("double")  # noqa: E731
    on_p1 = lambda e: e["page_number"] == 1  # noqa: E731

    # HOF discipline: Spark re-evaluates a lambda's ENTIRE inner expression
    # per element. font() (a JSON parse) is bound once per element into a
    # struct, and has_title/target (full array scans) are let-bound once per
    # ROW via the flatten(transform(array(ctx), ...)) idiom — without the
    # binding the final transform re-scanned the array per element (O(n^2)
    # JSON parses per doc; measured 6.0 -> 0.9 s at sf0.1).
    has_title = F.exists(els, lambda e: on_p1(e) & (e["type"] == F.lit("Title")))
    cand_fonts = F.filter(
        F.transform(els, lambda e: F.struct(
            font(e).alias("f"),
            e["element_index"].alias("i"),
            (on_p1(e) & is_cand(e)).alias("ok"),
        )),
        lambda s: s["ok"] & s["f"].isNotNull() & (s["f"] > 0),
    )
    mx = F.array_max(F.transform(cand_fonts, lambda s: s["f"]))
    # first-wins on strict greater == the minimum element_index at the max
    target = F.array_min(
        F.transform(
            F.filter(cand_fonts, lambda s: s["f"] == mx), lambda s: s["i"]
        )
    )
    ctx = F.struct(has_title.alias("ht"), target.alias("tg"))
    promoted = F.flatten(
        F.transform(
            F.array(ctx),
            lambda c: F.transform(
                els,
                lambda e: F.when(
                    ~c["ht"] & c["tg"].isNotNull() & (e["element_index"] == c["tg"]),
                    e.withField("type", F.lit("Title")),
                ).otherwise(e),
            ),
        )
    )
    return df.withColumn(elements_col, promoted)
