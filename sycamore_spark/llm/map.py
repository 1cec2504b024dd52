"""LLM map stages: the custom physical operator this engine actually needs
(everything relational is native Spark).

Reference parity: ``LLMMap``/``LLMMapElements`` with retry + validate loops
(reference: lib/sycamore/sycamore/transforms/base_llm.py:75-178), DocSet APIs
``llm_map`` (docset.py:1124), ``llm_filter`` (docset.py:1204), ``extract_entity``
(docset.py:576), ``summarize`` (transforms/summarize.py), ``summarize_data``
(query/execution/operations.py:74-130).

Execution shape (scale design):
- iterator-style mapInPandas → the client is constructed once per task
  (reference uses Ray actor pools for the same reason, base.py:130-140);
- prompts are rendered and sent in micro-batches of ``batch_size`` — a real
  client would issue them concurrently/async under a rate limiter;
- the validate/retry loop re-prompts only the failing rows, max_tries
  bounded, exactly like base_llm.py:133-167;
- an LLM stage is a pipeline *barrier only per-row*, never a shuffle.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from sycamore_spark.llm.client import LLM

LLMFactory = Callable[[], LLM]


_PLACEHOLDER = None  # compiled lazily; see _render_fallback


def _render_fallback(template: str, row: dict) -> str:
    """jinja2-less rendering of SIMPLE ``{{ name }}`` / ``{{ doc.name }}``
    placeholders. str.format is NOT a substitute (it treats ``{{`` as an
    escaped brace and would silently send the prompt unrendered), so
    anything beyond a plain placeholder raises instead of degrading."""
    global _PLACEHOLDER
    import re

    if _PLACEHOLDER is None:
        _PLACEHOLDER = re.compile(r"\{\{\s*(?:doc\.)?([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")
    out = _PLACEHOLDER.sub(lambda m: str(row.get(m.group(1), "")), template)
    if "{%" in out or "{{" in out:
        raise RuntimeError(
            "jinja2 is unavailable and the prompt template uses syntax beyond "
            "simple {{ field }} placeholders; install jinja2 or simplify the template"
        )
    return out


def _render(template: str, row: dict) -> str:
    try:
        from jinja2 import Template

        return Template(template).render(doc=row, **{k: v for k, v in row.items() if isinstance(k, str)})
    except ImportError:
        return _render_fallback(template, row)


def _cached_factory(
    llm_factory: LLMFactory, cache_dir: str | None, model_tag: str = "default"
) -> LLMFactory:
    """Wrap an llm_factory so every task-level client reads/writes a shared
    completion cache (reference llms/llms.py caches INSIDE the LLM class —
    ``_llm_cache_get``/``_llm_cache_set`` run on every generate — so every
    llm_map/extract_entity call benefits; here the same effect comes from
    wrapping the factory at the seam every LLM stage goes through).
    ``cache_dir`` accepts any ``cache_from_path`` scheme (dir, file://,
    s3://, null://). Returns the factory unchanged when cache_dir is None."""
    if cache_dir is None:
        return llm_factory

    def factory() -> LLM:
        from sycamore_spark.llm.client import CachedLLM

        return CachedLLM(llm_factory(), cache_dir, model_tag)

    return factory


def llm_map(
    df: DataFrame,
    prompt: str,
    output_col: str,
    llm_factory: LLMFactory,
    batch_size: int = 32,
    max_tries: int = 3,
    validate: Callable[[str], bool] | None = None,
    name: str | None = None,
    cache_dir: str | None = None,
) -> DataFrame:
    """Render ``prompt`` (jinja2, row fields in scope as ``doc.*``/names) per
    row, call the LLM in micro-batches, retry rows failing ``validate`` up to
    ``max_tries``, write the completion to ``output_col`` (null if it never
    validates — reference keeps the last response, we keep null so failures
    are filterable).

    ``cache_dir`` (optional) interposes a CachedLLM over the factory so
    repeated prompts — across rows, retries, AND separate runs sharing the
    dir — are served from the completion cache instead of the client.

    Under ``materialize.enable(root)`` the stage auto-checkpoints
    (AutoMaterialize): a rerun with the same prompt/output/schema (+
    ``name``) reuses the stored parquet instead of re-invoking the LLM."""
    from sycamore_spark import materialize as _mat

    llm_factory = _cached_factory(llm_factory, cache_dir)
    if _mat.active() is not None:
        return _mat.checkpoint_stage(
            lambda: _llm_map_build(df, prompt, output_col, llm_factory, batch_size, max_tries, validate),
            df, "llm_map", prompt, output_col, name=name,
        )
    return _llm_map_build(df, prompt, output_col, llm_factory, batch_size, max_tries, validate)


def _llm_map_build(
    df: DataFrame,
    prompt: str,
    output_col: str,
    llm_factory: LLMFactory,
    batch_size: int = 32,
    max_tries: int = 3,
    validate: Callable[[str], bool] | None = None,
) -> DataFrame:
    fields = [f for f in df.schema.fields if f.name != output_col]
    out_schema = StructType(fields + [StructField(output_col, StringType())])

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()
        for pdf in it:
            rows = pdf.to_dict("records")
            results: list[str | None] = [None] * len(rows)
            pending = list(range(len(rows)))
            tries = 0
            while pending and tries < max_tries:
                prompts = [_render(prompt, rows[i]) for i in pending]
                # retries must bypass the completion cache: the prompt is
                # identical, so a cached reply that just failed `validate`
                # would be served again forever (and poison future runs).
                # CachedLLM.generate_batch_fresh re-asks and heals the entry.
                gen = llm.generate_batch
                if tries > 0:
                    gen = getattr(llm, "generate_batch_fresh", gen)
                replies: list[str] = []
                for s in range(0, len(prompts), batch_size):
                    replies.extend(gen(prompts[s:s + batch_size]))
                still = []
                for i, r in zip(pending, replies):
                    if validate is None or validate(r):
                        results[i] = r
                    else:
                        still.append(i)
                pending = still
                tries += 1
            for row, res in zip(rows, results):
                row[output_col] = res
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def llm_filter(
    df: DataFrame,
    question: str,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    threshold: int = 3,
    keep_score: bool = False,
    score_col: str = "_llm_filter_score",
    cache_dir: str | None = None,
) -> DataFrame:
    """LLM scores each doc 0-5 against a question; keep score >= threshold
    (reference: docset.py:1204, transforms/llm_filter.py:113 — the score
    must parse as an int in 0..5, retried otherwise)."""
    prompt = (
        "Score 0-5 how well this document answers the question.\n"
        f"Question: {question}\nDocument: {{{{ doc.{field} }}}}\nAnswer with a single digit."
    )
    scored = llm_map(
        df, prompt, score_col, llm_factory,
        validate=lambda r: r.strip().isdigit() and 0 <= int(r.strip()) <= 5,
        cache_dir=cache_dir,
    )
    out = scored.filter(F.col(score_col).cast("int") >= threshold)
    return out if keep_score else out.drop(score_col)


def extract_entity(
    df: DataFrame,
    entity_name: str,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    prompt: str | None = None,
    cache_dir: str | None = None,
) -> DataFrame:
    """Pull a named entity from each doc into ``properties[entity_name]``
    (reference: docset.py:576, transforms/extract_entity.py:50)."""
    prompt = prompt or (
        f"Extract the {entity_name} from the following text. "
        f"Reply with only the value.\nText: {{{{ doc.{field} }}}}"
    )
    tmp = f"_entity_{entity_name}"
    out = llm_map(df, prompt, tmp, llm_factory, cache_dir=cache_dir)
    props = F.from_json(F.coalesce(F.col("properties"), F.lit("{}")), "map<string,string>")
    merged = F.to_json(F.map_concat(
        F.map_filter(props, lambda k, _: k != F.lit(entity_name)),
        F.create_map(F.lit(entity_name), F.coalesce(F.col(tmp), F.lit(""))),
    ))
    if "properties" in df.columns:
        out = out.withColumn("properties", merged)
    else:
        out = out.withColumnRenamed(tmp, entity_name)
        return out
    return out.drop(tmp)


def summarize_docs(
    df: DataFrame,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    out_col: str = "summary",
    question: str | None = None,
) -> DataFrame:
    """Per-doc one-step summarization (reference:
    transforms/summarize.py:414 OneStepDocumentSummarizer)."""
    q = f" with respect to: {question}" if question else ""
    prompt = f"Summarize the following text{q}.\nText: {{{{ doc.{field} }}}}"
    return llm_map(df, prompt, out_col, llm_factory)


def summarize_data(
    spark,
    df: DataFrame,
    question: str,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    max_rows: int = 100,
) -> DataFrame:
    """Collect up to ``max_rows`` docs and answer the question over them in
    one driver-side LLM call (reference: query/execution/operations.py:74-130
    — deliberately a driver op: the output is a single answer row)."""
    rows = df.select(F.col(field).alias("_t")).limit(max_rows).collect()
    corpus = "\n---\n".join(r["_t"] or "" for r in rows)
    llm = llm_factory()
    answer = llm.generate(f"Question: {question}\nData:\n{corpus}\nAnswer:")
    return spark.createDataFrame([(answer,)], schema=StructType([StructField("answer", StringType())]))


def llm_generate_group(
    df: DataFrame,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    instruction: str = "Form clusters of similar documents",
    num_groups: int = 5,
    sample: int = 50,
) -> list[str]:
    """Phase 1 of LLM clustering (reference docset.llm_generate_group,
    docset.py:1531): sample field values to the driver, ask the LLM for
    group labels, return them as a list."""
    vals = [r["_v"] for r in df.select(F.col(field).alias("_v")).limit(sample).collect()]
    llm = llm_factory()
    reply = llm.generate(
        f"{instruction}. Given these examples, return a JSON array of at most "
        f"{num_groups} group labels.\nExamples:\n" + "\n".join(map(str, vals[:sample]))
    )
    try:
        groups = json.loads(reply)
        assert isinstance(groups, list) and groups
    except Exception:
        groups = [f"group_{i}" for i in range(num_groups)]
    return [str(g) for g in groups]


def llm_clustering(
    df: DataFrame,
    llm_factory: LLMFactory,
    groups: list[str],
    field: str = "text_representation",
    out_col: str = "cluster_label",
) -> DataFrame:
    """Phase 2 (reference docset.llm_clustering, docset.py:1554): assign
    every doc to one of the given group labels — a distributed llm_map with
    membership validation."""
    prompt = (
        "Assign the text to exactly one of these groups: "
        + ", ".join(map(str, groups))
        + f". Reply with only the group name.\nText: {{{{ doc.{field} }}}}"
    )
    return llm_map(df, prompt, out_col, llm_factory,
                   validate=lambda r: r.strip() in {str(g) for g in groups})


def llm_cluster_entity(
    df: DataFrame,
    llm_factory: LLMFactory,
    field: str = "text_representation",
    instruction: str = "Form clusters of similar documents",
    num_groups: int = 5,
    sample: int = 50,
    out_col: str = "cluster_label",
) -> DataFrame:
    """Two-phase LLM clustering (reference: docset.py:1590-1644) — the
    composition of llm_generate_group + llm_clustering."""
    groups = llm_generate_group(df, llm_factory, field, instruction, num_groups, sample)
    return llm_clustering(df, llm_factory, groups, field, out_col)


def llm_filter_elements(
    df: DataFrame,
    question: str,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    text_field: str = "text_representation",
    threshold: int = 3,
    window_tokens: int = 512,
    similarity_sort: bool = True,
    score_col: str = "_llm_filter_score",
    keep_score: bool = False,
) -> DataFrame:
    """Element-window LLM filtering with similarity-ordered early exit
    (reference: transforms/llm_filter.py:113-190 — elements are batched
    into token windows, optionally sorted by similarity to the question,
    and evaluation stops as soon as a window clears the threshold).

    Execution: per Arrow batch, round r sends every still-undecided doc's
    r-th window in ONE LLM batch call; docs whose window scores >=
    threshold drop out of later rounds. With similarity_sort the relevant
    window is usually round 0, so total LLM calls approach one per kept doc
    instead of one per element."""
    out_schema = StructType(list(df.schema.fields)) if not keep_score else StructType(
        list(df.schema.fields)
    ).add(score_col, StringType())
    names = [f.name for f in out_schema.fields]
    q_terms = set(question.lower().split())

    def _sim(text: str) -> float:
        toks = set((text or "").lower().split())
        return len(q_terms & toks) / max(len(q_terms), 1)

    def _windows(elements) -> list[str]:
        els = [] if elements is None else list(elements)
        texts = [
            (e.get(text_field) if isinstance(e, dict) else e[text_field]) or "" for e in els
        ]
        if similarity_sort:
            texts.sort(key=_sim, reverse=True)
        wins, cur, n = [], [], 0
        for t in texts:
            tn = len(t.split())
            if cur and n + tn > window_tokens:
                wins.append("\n".join(cur))
                cur, n = [], 0
            cur.append(t)
            n += tn
        if cur:
            wins.append("\n".join(cur))
        return wins or [""]

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()
        prompt = (
            "Score 0-5 how well the document answers the question. "
            f"Reply with only the number.\nQuestion: {question}\nDocument: "
        )
        for pdf in it:
            windows = [_windows(e) for e in pdf[elements_col]]
            scores = [0] * len(windows)
            decided = [len(w) == 0 for w in windows]
            rnd = 0
            while not all(decided) and rnd < max(len(w) for w in windows):
                idxs = [i for i in range(len(windows)) if not decided[i] and rnd < len(windows[i])]
                if not idxs:
                    break
                replies = llm.generate_batch([prompt + windows[i][rnd] for i in idxs])
                for i, r in zip(idxs, replies):
                    try:
                        s = int(str(r).strip().split()[0])
                    except (ValueError, IndexError):
                        s = 0
                    scores[i] = max(scores[i], s)
                    if s >= threshold or rnd + 1 >= len(windows[i]):
                        decided[i] = True
                rnd += 1
            pdf = pdf.copy()
            if keep_score:
                pdf[score_col] = [str(s) for s in scores]
            mask = pd.Series([s >= threshold for s in scores], index=pdf.index)
            out = pdf[mask]
            if len(out):
                yield out[names]

    return df.mapInPandas(run, schema=out_schema)


def llm_map_elements(
    df: DataFrame,
    prompt: str,
    out_prop: str,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    element_filter: Callable[[dict], bool] | None = None,
    name: str | None = None,
    cache_dir: str | None = None,
) -> DataFrame:
    """Per-element LLM map (reference: docset.llm_map_elements,
    docset.py:1141; transforms/base_llm.py LLMMapElements): render the
    jinja prompt per (matching) element with ``elt``/``doc`` in scope, call
    the LLM batched across ALL elements of the Arrow batch, and write the
    completion into the element's properties JSON under ``out_prop``.
    Non-matching elements pass through untouched. Auto-checkpoints under
    ``materialize.enable`` like llm_map; ``cache_dir`` interposes a
    CachedLLM like llm_map."""
    from sycamore_spark import materialize as _mat

    llm_factory = _cached_factory(llm_factory, cache_dir)
    if _mat.active() is not None:
        return _mat.checkpoint_stage(
            lambda: _llm_map_elements_build(df, prompt, out_prop, llm_factory, elements_col, element_filter),
            df, "llm_map_elements", prompt, out_prop, name=name,
        )
    return _llm_map_elements_build(df, prompt, out_prop, llm_factory, elements_col, element_filter)


def _llm_map_elements_build(
    df: DataFrame,
    prompt: str,
    out_prop: str,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    element_filter: Callable[[dict], bool] | None = None,
) -> DataFrame:
    out_schema = df.schema
    names = df.columns

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()
        for pdf in it:
            rows = pdf.to_dict("records")
            jobs: list[tuple[int, int, str]] = []
            for ri, row in enumerate(rows):
                els = row.get(elements_col)
                els = [] if els is None else [dict(e) for e in els]
                row[elements_col] = els
                for ei, e in enumerate(els):
                    if element_filter is None or element_filter(e):
                        jobs.append((ri, ei, _render(prompt, {**row, "elt": e})))
            replies = llm.generate_batch([p for _, _, p in jobs]) if jobs else []
            for (ri, ei, _p), reply in zip(jobs, replies):
                e = rows[ri][elements_col][ei]
                props = json.loads(e.get("properties") or "{}")
                props[out_prop] = reply
                e["properties"] = json.dumps(props, sort_keys=True)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(run, schema=out_schema)


def summarize_images(
    df: DataFrame,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    image_types: tuple = ("Image", "image"),
) -> DataFrame:
    """LLM image description per image element (reference:
    transforms/summarize_images.py:155) — the prompt carries the element's
    typed metadata; the vision payload itself goes through the client seam
    (mock/deterministic here, multimodal decode stubs apply)."""
    return llm_map_elements(
        df,
        "Describe this image in one sentence. Metadata: {{ elt.properties }} "
        "Context: {{ elt.text_representation }}",
        "summary",
        llm_factory,
        elements_col=elements_col,
        element_filter=lambda e: e.get("type") in image_types,
    )


def extract_table_properties(
    df: DataFrame,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    table_types: tuple = ("table", "Table"),
    out_prop: str = "table_kv",
) -> DataFrame:
    """LLM key-value extraction from table elements (reference:
    transforms/extract_table_properties.py:14): the element's rendered
    table text goes to the LLM, the JSON reply lands under
    properties.table_kv."""
    return llm_map_elements(
        df,
        "Extract key-value pairs from this table as JSON. "
        "Table: {{ elt.text_representation }}",
        out_prop,
        llm_factory,
        elements_col=elements_col,
        element_filter=lambda e: e.get("type") in table_types,
    )


def llm_query(
    df: DataFrame,
    prompt: str,
    llm_factory: LLMFactory,
    output_property: str = "llm_response",
    per_element: bool = True,
    element_type: str | None = None,
    number_of_elements: int | None = None,
    elements_col: str = "elements",
) -> DataFrame:
    """LLMTextQueryAgent (reference: transforms/llm_query.py:28-125;
    docset.llm_query, docset.py:1449):

    - ``per_element=True``: ``prompt + "\\n" + element text`` per (matching)
      element, response under the element's ``properties[output_property]``;
      ``number_of_elements`` caps how many elements are queried per doc.
    - ``per_element=False``: one accumulated prompt per document — the
      prompt plus every (matching, optionally capped) element's text —
      response under the DOC's ``properties[output_property]``.

    Same Arrow-batched shape as llm_map_elements: the LLM client is built
    once per partition and called with one batch across the whole pandas
    batch."""
    if per_element:
        def efilter(e: dict) -> bool:
            if element_type is not None and e.get("type") != element_type:
                return False
            return True

        if number_of_elements is None:
            return llm_map_elements(
                df, prompt + "\n{{ elt.text_representation }}", output_property,
                llm_factory, elements_col=elements_col, element_filter=efilter,
            )
        # capped variant: run the fold manually so the cap is per document
        out_schema = df.schema
        names = df.columns

        def run(it: Iterable[pd.DataFrame]):
            llm = llm_factory()
            for pdf in it:
                rows = pdf.to_dict("records")
                jobs: list[tuple[int, int, str]] = []
                for ri, row in enumerate(rows):
                    els = row.get(elements_col)
                    els = [] if els is None else [dict(e) for e in els]
                    row[elements_col] = els
                    taken = 0
                    for ei, e in enumerate(els):
                        if element_type is not None and e.get("type") != element_type:
                            continue
                        if taken >= number_of_elements:
                            break
                        jobs.append((ri, ei, f"{prompt}\n{e.get('text_representation') or ''}"))
                        taken += 1
                replies = llm.generate_batch([p for _, _, p in jobs]) if jobs else []
                for (ri, ei, _p), reply in zip(jobs, replies):
                    e = rows[ri][elements_col][ei]
                    props = json.loads(e.get("properties") or "{}")
                    props[output_property] = reply
                    e["properties"] = json.dumps(props, sort_keys=True)
                yield pd.DataFrame(rows, columns=names)

        return df.mapInPandas(run, schema=out_schema)

    # document-level: accumulate matching element texts into one prompt
    out_schema = df.schema
    names = df.columns

    def run_doc(it: Iterable[pd.DataFrame]):
        llm = llm_factory()
        for pdf in it:
            rows = pdf.to_dict("records")
            prompts = []
            for row in rows:
                els = row.get(elements_col)
                els = [] if els is None else list(els)
                parts = [prompt]
                taken = 0
                for e in els:
                    if element_type is not None and e.get("type") != element_type:
                        continue
                    if number_of_elements is not None and taken >= number_of_elements:
                        break
                    parts.append(e.get("text_representation") or "")
                    taken += 1
                prompts.append("\n".join(parts))
            replies = llm.generate_batch(prompts) if prompts else []
            for row, reply in zip(rows, replies):
                props = json.loads(row.get("properties") or "{}")
                props[output_property] = reply
                row["properties"] = json.dumps(props, sort_keys=True)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(run_doc, schema=out_schema)
