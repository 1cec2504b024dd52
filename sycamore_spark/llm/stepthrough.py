"""Step-through property extraction: element-batch iteration with a
SHRINKING schema per document.

Reference parity (lib/sycamore/sycamore/transforms/property_extraction):
- ``strategy.py:19-52`` step-through strategies — ``OneElementAtATime``,
  ``NPagesAtATime`` (page-number cutoff sweep), ``BatchElements``.
- ``strategy.py:61-63`` ``NoSchemaSplitting`` (plus a fixed-size splitter,
  the useful scale variant of the ``SchemaPartitionStrategy`` seam).
- ``strategy.py:83-186`` ``TakeFirstTrimSchema`` merge semantics: a found
  SCALAR is kept first-wins and TRIMMED from the schema (later batches are
  never asked for it); an ARRAY concatenates existing + new with
  value-dedup + sort and is never trimmed; a BOOL is sticky-true (kept
  false until a batch flips it true, trimmed once true); OBJECT properties
  recurse — the remaining schema keeps only still-unsatisfied subfields
  and drops the object once empty (the reference's zip_traverse walk +
  drop-empty-objects pass); extraction for a document stops early when
  the remaining schema is empty (``completed``).
- ``extract.py:174-215`` the ``Extract`` transform loop — schema parts
  extracted independently, stitched, then missing fields filled with
  None/[] and landed under ``entity``.

Spark-first design (100 TB): the whole loop is data-parallel per document
— ONE Arrow ``mapInPandas`` stage (iterator form: the LLM client is built
once per task, batches stream through), zero shuffles, no driver
involvement. The per-document early-stop means the LLM call count tracks
fields-remaining, not elements x fields: on corpora where the first page
answers everything, one call per document regardless of document length.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructType

from sycamore_spark.data.schema2 import DataType, NamedProperty, Property, SchemaV2
from sycamore_spark.llm.client import LLM
from sycamore_spark.llm.extract import extract_json

# -- step-through strategies (reference strategy.py:19-52) -------------------


def one_element_at_a_time():
    def step(elements: list[dict]) -> Iterable[list[dict]]:
        for el in elements:
            yield [el]

    return step


def n_pages_at_a_time(n: int = 1):
    """Page-number cutoff sweep (reference NPagesAtATime, strategy.py:25-41):
    a batch closes when an element's page reaches first_page_of_batch + n."""

    def step(elements: list[dict]) -> Iterable[list[dict]]:
        if not elements:
            return
        batch: list[dict] = []
        cutoff = (elements[0].get("page_number") or 0) + n
        for el in elements:
            pn = el.get("page_number") or 0
            if pn >= cutoff:
                yield batch
                cutoff = pn + n
                batch = [el]
            else:
                batch.append(el)
        if batch:
            yield batch

    return step


def batch_elements(batch_size: int = 10):
    def step(elements: list[dict]) -> Iterable[list[dict]]:
        for i in range(0, len(elements), batch_size):
            batch = elements[i : i + batch_size]
            if batch:
                yield batch

    return step


# -- schema partition strategies (reference strategy.py:55-63) ---------------


def no_schema_splitting(schema: SchemaV2) -> list[SchemaV2]:
    return [schema]


def fixed_size_schema_partition(max_fields: int):
    """Split the schema into chunks of ``max_fields`` properties — each part
    extracts independently (the reference fans parts out as coroutines;
    here each part is one more pass of the same per-document loop)."""

    def split(schema: SchemaV2) -> list[SchemaV2]:
        props = schema.properties
        return [
            SchemaV2(properties=props[i : i + max_fields])
            for i in range(0, len(props), max_fields)
        ] or [schema]

    return split


# -- TakeFirstTrimSchema (reference strategy.py:83-186) ----------------------


def take_first_trim(
    remaining: list, fields: dict, new: dict
) -> tuple[dict, list, bool]:
    """Merge ``new`` batch output into ``fields`` under the reference's
    take-first-and-trim rules; returns (fields, still_remaining, completed).
    ``remaining`` is the list of NamedProperty still being asked for.

    OBJECT properties recurse (the reference walks the nested schema with
    zip_traverse): subfields merge independently under the same rules, a
    nested object stays in the remaining schema with only its
    still-unsatisfied subfields, and it trims entirely once every subfield
    is satisfied (the reference's drop-empty-objects pass,
    strategy.py:169-180)."""
    still = []
    for np in remaining:
        k, dt = np.name, np.type.type
        nv = new.get(k)
        ev = fields.get(k)
        if dt == DataType.OBJECT:
            sub_new = nv if isinstance(nv, dict) else {}
            sub_fields = ev if isinstance(ev, dict) else {}
            sub_fields, sub_still, _ = take_first_trim(
                list(np.type.properties or []), sub_fields, sub_new
            )
            fields[k] = sub_fields
            if sub_still:
                trimmed = Property(type=DataType.OBJECT, properties=sub_still)
                still.append(NamedProperty(name=k, type=trimmed))
            continue
        if dt == DataType.ARRAY:
            ev = [] if ev is None else ev
            nv = [] if nv is None else (nv if isinstance(nv, list) else [nv])
            merged = ev + [v for v in nv if v is not None]
            # value-dedup + sort (reference dedup_rp_array, strategy.py:188-215):
            # natural order when elements are mutually comparable (so [2, 10]
            # stays numeric, not ["10", "2"]-style string order), str-key only
            # as the mixed-type fallback
            if all(not isinstance(v, (list, dict)) for v in merged):
                uniq = list(set(merged))
                try:
                    fields[k] = sorted(uniq)
                except TypeError:
                    fields[k] = sorted(uniq, key=lambda v: str(v))
            else:
                fields[k] = merged
            still.append(np)  # arrays are never trimmed
        elif dt == DataType.BOOL:
            # Reference strategy.py:111-135: a bool trims only in a merge
            # where the key APPEARS in the new extraction — either already
            # true (keep, trim now) or a false->true flip (take new, trim
            # now). A true whose key is absent from this batch stays in the
            # schema (the reference keeps asking), and a first-sighting
            # value is taken but never trims on its own batch.
            present = k in new
            trim = False
            if ev is not None and present:
                if ev is True:
                    trim = True
                elif ev is False and nv is True:
                    fields[k] = True
                    trim = True
            elif ev is None and present and nv is not None:
                fields[k] = bool(nv)
            if not trim:
                still.append(np)
        else:
            if ev is not None:
                pass  # take-first: existing valid value wins, stays trimmed
            elif nv is not None and np.type.validate_value(nv):
                fields[k] = nv
            if fields.get(k) is None:
                still.append(np)
    return fields, still, len(still) == 0


def _fill_missing(schema: SchemaV2, fields: dict) -> dict:
    """Reference extract.py:189-205 — unfound properties land as None
    (scalars/bools), [] (arrays), or a recursively-filled dict (objects)
    so the output shape is schema-stable."""
    out = {}
    for np in schema.properties:
        v = fields.get(np.name)
        if np.type.type == DataType.OBJECT:
            sub = SchemaV2(properties=list(np.type.properties or []))
            v = _fill_missing(sub, v if isinstance(v, dict) else {})
        elif v is None:
            v = [] if np.type.type == DataType.ARRAY else None
        out[np.name] = v
    return out


def _prop_names(remaining: list, prefix: str = "") -> list[str]:
    """Dotted names of every still-wanted LEAF (nested objects render as
    parent.child so the model sees exactly what remains)."""
    out = []
    for np in remaining:
        if np.type.type == DataType.OBJECT:
            out.extend(_prop_names(list(np.type.properties or []), prefix + np.name + "."))
        else:
            out.append(prefix + np.name)
    return out


def _render_prompt(remaining: list, texts: list[str]) -> str:
    names = ", ".join(_prop_names(remaining))
    return (
        f"Extract a JSON object with fields [{names}] from the text below; "
        "omit fields not present.\nText: " + "\n".join(t or "" for t in texts)
    )


def extract_stepthrough(
    df: DataFrame,
    schema: SchemaV2,
    llm_factory: Callable[[], LLM],
    stepper=None,
    schema_partition=no_schema_splitting,
    elements_col: str = "elements",
    out_col: str = "entity",
    prompt_fn: Callable[[list, list[str]], str] = _render_prompt,
) -> DataFrame:
    """Run the step-through extraction loop per document; adds ``out_col``
    (JSON object string with every schema field present, missing -> null/[])."""
    stepper = stepper or one_element_at_a_time()
    parts = schema_partition(schema)
    out_schema = StructType(list(df.schema.fields)).add(out_col, StringType())

    def run(batches):
        llm = llm_factory()
        for pdf in batches:
            vals = [
                json.dumps(
                    extract_doc(els, parts, stepper, llm, prompt_fn),
                    sort_keys=True,
                )
                for els in pdf[elements_col]
            ]
            yield pdf.assign(**{out_col: pd.Series(vals, index=pdf.index)})

    return df.mapInPandas(run, schema=out_schema)


def extract_doc(els, parts, stepper, llm: LLM, prompt_fn=_render_prompt) -> dict:
    """The per-document loop (pure; reference Extract.extract, extract.py:
    174-215): per schema part, step element batches against the shrinking
    remaining-field list with take-first-trim merging and early-stop, then
    stitch parts and fill missing fields."""
    els = [] if els is None else [
        e if isinstance(e, dict) else e.asDict() for e in els
    ]
    fields: dict = {}
    for part in parts:
        remaining = list(part.properties)
        part_fields: dict = {}
        for batch in stepper(els):
            if not remaining:
                break  # completed: stop asking (early-stop)
            prompt = prompt_fn(remaining, [
                e.get("text_representation") for e in batch
            ])
            raw = llm.generate_batch([prompt])[0]
            try:
                new = extract_json(raw)
            except Exception:
                new = {}
            if not isinstance(new, dict):
                new = {}
            part_fields, remaining, _ = take_first_trim(
                remaining, part_fields, new
            )
        # stitch parts (flat union; reference stitch_together_objects)
        fields.update(_fill_missing(part, part_fields))
    return fields
