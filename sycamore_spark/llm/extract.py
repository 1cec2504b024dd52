"""LLM schema inference and typed property extraction.

Reference parity: ``LLMSchemaExtractor`` samples docs and asks the LLM for a
schema (reference: lib/sycamore/sycamore/transforms/extract_schema.py:105;
DocSet.infer_schema docset.py:483); ``LLMPropertyExtractor`` extracts typed
properties per doc against a declared schema with validator/retry loops
(extract_schema.py:186; newer transforms/property_extraction/); JSON is
pulled from LLM output tolerantly (utils/extract_json.py).

Spark-first: extraction is one iterator ``mapInPandas`` stage (client built
once per task, Arrow batches), output lands in a JSON string column, and the
typed view is a native ``from_json`` cast to the schema's StructType — so
everything downstream of the LLM seam is pruned/pushed-down/codegen'd by
Catalyst, and with a deterministic mock the whole pipeline stays
oracle-checkable.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from sycamore_spark.data.schema2 import DataType, Property, SchemaV2, to_struct_type
from sycamore_spark.llm.client import LLM


def extract_json(text: str) -> Any:
    """Tolerant JSON recovery from LLM output (reference:
    utils/extract_json.py): try verbatim, then fenced blocks, then the
    first balanced {...} / [...] span."""
    try:
        return json.loads(text)
    except (json.JSONDecodeError, TypeError):
        pass
    fence = re.search(r"```(?:json)?\s*(.*?)```", text or "", flags=re.DOTALL)
    if fence:
        try:
            return json.loads(fence.group(1))
        except json.JSONDecodeError:
            pass
    # balanced-span scan from the EARLIEST opener — an embedded array that
    # contains objects (e.g. "[{}]") must yield the array, not its first {}
    spans = [
        (start, opener, closer)
        for opener, closer in (("{", "}"), ("[", "]"))
        if (start := (text or "").find(opener)) >= 0
    ]
    for start, opener, closer in sorted(spans):
        depth = 0
        in_str = False
        esc = False
        for i in range(start, len(text)):
            c = text[i]
            if in_str:
                # brackets inside JSON string literals don't nest
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == opener:
                depth += 1
            elif c == closer:
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(text[start : i + 1])
                    except json.JSONDecodeError:
                        break
    return None


def schema_prompt(sample_texts: list[str], n_fields: int, instructions: str | None) -> str:
    parts = [
        "Infer a JSON schema describing the documents below.",
        f"Return JSON: {{\"properties\": [{{\"name\": ..., \"type\": one of "
        f"bool|int|float|string|date|datetime|array|object|choice}}]}}. At most {n_fields} fields.",
    ]
    if instructions:
        parts.append(instructions)
    parts.extend(f"Document: {t}" for t in sample_texts)
    return "\n".join(parts)


def infer_schema(
    df: DataFrame,
    llm_factory: Callable[[], LLM],
    text_col: str = "text",
    sample: int = 10,
    n_fields: int = 8,
    instructions: str | None = None,
) -> SchemaV2:
    """Driver-side one-shot schema inference over a bounded sample
    (reference LLMSchemaExtractor batches take(sample) docs into a single
    prompt, extract_schema.py:105-183). The sample is tiny by contract —
    this never scans the full table."""
    texts = [r[0] for r in df.select(text_col).limit(sample).collect()]
    raw = llm_factory().generate(schema_prompt([str(t)[:2000] for t in texts], n_fields, instructions))
    parsed = extract_json(raw) or {}
    props = parsed.get("properties", parsed.get("fields", []))
    named = []
    for p in props[:n_fields]:
        try:
            named.append(
                {"name": p["name"], "type": {"type": p.get("type", "string"), **{
                    k: v for k, v in p.items() if k in ("description", "default", "choices", "item_type")
                }}}
            )
        except (KeyError, TypeError):
            continue
    return SchemaV2.model_validate({"properties": named})


def property_prompt(schema_json: str, text: str) -> str:
    return (
        "Extract the following properties from the document. Return only JSON "
        f"matching this schema:\n{schema_json}\nDocument: {text}"
    )


def _coerce(value: Any, prop: Property) -> Any:
    try:
        if value is None:
            return prop.default
        if prop.type == DataType.INT:
            return int(value)
        if prop.type == DataType.FLOAT:
            return float(value)
        if prop.type == DataType.BOOL:
            return bool(value) if not isinstance(value, str) else value.lower() in ("true", "yes", "1")
        if prop.type in (DataType.STRING, DataType.CHOICE, DataType.CUSTOM):
            return str(value)
    except (ValueError, TypeError):
        return prop.default
    return value


def extract_properties(
    df: DataFrame,
    schema: SchemaV2,
    llm_factory: Callable[[], LLM],
    text_col: str = "text",
    out_col: str = "properties_json",
    max_tries: int = 2,
) -> DataFrame:
    """Per-doc property extraction with validate/retry (the reference's
    retry loop with ``n_retries`` per validator, extract_schema.py:186-388
    and base_llm.py:133-167): rows whose extracted value fails a property's
    validators are re-asked up to ``max_tries`` times with the constraint
    string appended; failures fall back to the property default."""
    schema_json = schema.render()
    props = {p.name: p.type for p in schema.properties}
    out_schema = StructType(list(df.schema.fields)).add(out_col, StringType())
    names = [f.name for f in out_schema.fields]

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()

        def ask(prompts: list[str]) -> list[dict]:
            return [extract_json(r) or {} for r in llm.generate_batch(prompts)]

        for pdf in it:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            results = ask([property_prompt(schema_json, t) for t in texts])
            # validator/retry loop, batched: re-ask only failing rows with
            # the violated constraints appended to the prompt
            for _ in range(max_tries - 1):
                redo = []
                for i, res in enumerate(results):
                    bad = [
                        n for n, p in props.items()
                        if not p.validate_value(_coerce(res.get(n), p))
                    ]
                    if bad:
                        redo.append((i, bad))
                if not redo:
                    break
                fixed = ask([
                    property_prompt(schema_json, texts[i])
                    + "\nConstraints: "
                    + "; ".join(
                        f"{n} {v.constraint_string()}" for n in bad for v in props[n].validators
                    )
                    for i, bad in redo
                ])
                for (i, bad), fix in zip(redo, fixed):
                    for n in bad:
                        if n in fix:
                            results[i][n] = fix[n]
            final = []
            for res in results:
                row = {}
                for n, p in props.items():
                    v = _coerce(res.get(n), p)
                    row[n] = v if p.validate_value(v) else p.default
                final.append(json.dumps(row, default=str))
            pdf = pdf.copy()
            pdf[out_col] = final
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def extract_properties_typed(
    df: DataFrame,
    schema: SchemaV2,
    llm_factory: Callable[[], LLM],
    text_col: str = "text",
    out_col: str = "properties",
    **kwargs,
) -> DataFrame:
    """extract_properties + native ``from_json`` cast to the schema's
    StructType — the typed-column promotion path (SURVEY.md §1.4)."""
    raw = extract_properties(df, schema, llm_factory, text_col=text_col, out_col="__pjson", **kwargs)
    return raw.withColumn(out_col, F.from_json(F.col("__pjson"), to_struct_type(schema))).drop("__pjson")


def infer_schema_per_doc(
    df: DataFrame,
    llm_factory: Callable[[], LLM],
    text_col: str = "text",
    out_col: str = "_schema",
    n_fields: int = 8,
) -> DataFrame:
    """Per-document schema inference (reference
    property_extraction/extract.py:374 SchemaExtract): one LLM schema per
    doc, stored as a JSON array of field names in ``out_col`` — the input to
    the distributed schema-merge aggregations below."""
    from sycamore_spark.llm.map import llm_map

    prompt = (
        "Propose a flat JSON schema (max " + str(n_fields) + " fields) for the "
        "metadata of this document. Reply as JSON: "
        '{"properties": [{"name": ..., "type": ...}]}\n'
        "Document: {{ doc." + text_col + " }}"
    )
    raw = llm_map(df, prompt, "_schema_raw", llm_factory)

    @F.pandas_udf("string")
    def _fields(raws: pd.Series) -> pd.Series:
        out = []
        for r in raws:
            parsed = extract_json(r or "") or {}
            props = parsed.get("properties", parsed.get("fields", []))
            names = []
            for p in props:
                if isinstance(p, dict) and "name" in p:
                    names.append(str(p["name"]))
                elif isinstance(p, str):
                    names.append(p)
            out.append(json.dumps(sorted(set(names))[: n_fields]))
        return pd.Series(out)

    return raw.withColumn(out_col, _fields(F.col("_schema_raw"))).drop("_schema_raw")


def merge_schemas(
    df: DataFrame,
    mode: str = "union",
    schema_col: str = "_schema",
    min_occurrence_ratio: float = 0.5,
) -> DataFrame:
    """Distributed schema merge across the docset (reference
    property_extraction/merge_schemas.py:76-120 — intersection_of_fields /
    union_of_fields / frequency filter, which the reference folds on one
    node): explode per-doc field lists, one groupBy(field) count, then

    - ``union``: every distinct field,
    - ``intersection``: fields present in EVERY doc,
    - ``frequency``: fields present in >= ratio of docs.

    Returns a single row (fields array<string>, sorted) — the merged schema.
    """
    n_docs = df.count()
    fields = df.select(
        F.explode(
            F.array_distinct(  # per-doc dedupe: n counts DOCS containing the field
                F.from_json(F.coalesce(F.col(schema_col), F.lit("[]")), "array<string>")
            )
        ).alias("f")
    )
    counts = fields.groupBy("f").agg(F.count(F.lit(1)).alias("n"))
    if mode == "union":
        keep = counts
    elif mode == "intersection":
        keep = counts.filter(F.col("n") >= n_docs)
    elif mode == "frequency":
        keep = counts.filter(F.col("n") >= min_occurrence_ratio * n_docs)
    else:
        raise ValueError(f"unknown merge_schemas mode {mode!r}")
    return keep.agg(F.sort_array(F.collect_list("f")).alias("fields"))


def attribute_values(
    df: DataFrame,
    value_cols: list[str],
    id_col: str = "doc_id",
    elements_col: str = "elements",
    fuzzy: bool = False,
) -> DataFrame:
    """Property attribution — which element did an extracted value come
    from (reference property_extraction/attribution.py:40
    TextMatchAttributionStrategy): exact substring search in element
    order first; with ``fuzzy=True``, the best difflib window when no
    element contains the value verbatim (the reference uses cydifflib for
    the same ratio). Returns one row per attributed (doc, property):
    (id, prop, element_index, start, end, score_micros) — 1e6 = exact
    match; fuzzy scores are floor(ratio*1e6 + 0.5). Values absent from
    every element (and fuzzy off) produce no row.

    Narrow Arrow-batched pass over each doc's own elements — provenance
    for a trillion extractions is still embarrassingly parallel.
    """
    import difflib

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, prop string, element_index int, "
        "start int, end int, score_micros long"
    )
    cols = [id_col, "prop", "element_index", "start", "end", "score_micros"]

    def gen(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                els = r[elements_col]
                els = list(els) if els is not None else []
                for c in value_cols:
                    v = r[c]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    s = str(v)
                    hit = None
                    for el in els:
                        t = el.get("text_representation") or ""
                        i = t.find(s)
                        if i >= 0:
                            hit = (int(el["element_index"]), i, i + len(s), 1_000_000)
                            break
                    if hit is None and fuzzy and s:
                        best = None
                        for el in els:
                            t = el.get("text_representation") or ""
                            if not t:
                                continue
                            m = difflib.SequenceMatcher(None, t, s)
                            score = int(m.ratio() * 1_000_000 + 0.5)
                            blk = m.find_longest_match(0, len(t), 0, len(s))
                            cand = (score, int(el["element_index"]), blk.a, blk.a + blk.size)
                            # ties resolve to the earliest element
                            if best is None or cand[0] > best[0]:
                                best = cand
                        if best is not None:
                            hit = (best[1], best[2], best[3], best[0])
                    if hit is not None:
                        rows.append((r[id_col], c, *hit))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, out_schema)
