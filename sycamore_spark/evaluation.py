"""Distributed retrieval-quality evaluation.

The reference ships an evaluation package (``evaluation/`` — QA pipelines,
document-retrieval metrics) that runs driver-side over collected results.
This is its Spark-native counterpart: per-query ranking metrics computed as
one window + one aggregation over a (query, rank, relevance) results table,
so evaluating a million-query sweep is the same plan as evaluating ten.

Cross-engine determinism: every rank-discounted gain is quantized to
integer micros BEFORE the per-query sum (the bm25 pattern — bigint
addition is associative), MRR is emitted as micros of the reciprocal rank,
and NDCG is the IEEE quotient of two exact bigint sums. ``log2`` is
computed as ``ln(rank + 1) / LN2`` with the same inlined double constant
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LN2 = 0.6931471805599453  # inline the same IEEE double on both engines


def retrieval_metrics(
    df: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking metrics over a results table with one row per
    (query, retrieved doc): ``rank_col`` 1-based retrieval rank,
    ``rel_col`` binary or graded relevance.

    Returns per query: ``n_retrieved``, ``n_relevant``, ``hits_at_k``,
    ``mrr_micros`` (floor(1e6 / first-relevant-rank)), ``dcg_micros`` /
    ``idcg_micros`` (rank-discounted gains at k, ideal ordering by
    relevance desc with rank asc tie-break), and ``ndcg`` (0.0 when there
    are no relevant docs).

    Plan shape: one window (ideal ordering) + one hash aggregation on the
    query id. Both scale with queries x k, never with the corpus.
    """
    rel = F.col(rel_col).cast("double")
    rank = F.col(rank_col).cast("double")
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(rank_col).asc()
    )
    irank = F.row_number().over(w).cast("double")
    gain = F.when(
        (F.col(rank_col) <= k) & (rel > 0),
        F.floor(rel * F.lit(1_000_000.0) * F.lit(LN2) / F.log(rank + F.lit(1.0)) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    igain = F.when(
        (irank <= k) & (rel > 0),
        F.floor(rel * F.lit(1_000_000.0) * F.lit(LN2) / F.log(irank + F.lit(1.0)) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    staged = df.select(
        F.col(query_col).alias("_q"),
        F.col(rank_col).alias("_rank"),
        rel.alias("_rel"),
        gain.alias("_gain"),
        igain.alias("_igain"),
    )
    first_rel = F.min(F.when(F.col("_rel") > 0, F.col("_rank")))
    out = staged.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).cast("bigint").alias("n_relevant"),
        F.sum(F.when((F.col("_rel") > 0) & (F.col("_rank") <= k), 1).otherwise(0))
        .cast("bigint").alias("hits_at_k"),
        F.coalesce(
            F.floor(F.lit(1_000_000.0) / first_rel.cast("double") + F.lit(0.5)).cast("long"),
            F.lit(0).cast("long"),
        ).alias("mrr_micros"),
        F.sum("_gain").alias("dcg_micros"),
        F.sum("_igain").alias("idcg_micros"),
    )
    ndcg = F.when(
        F.col("idcg_micros") > 0,
        F.col("dcg_micros").cast("double") / F.col("idcg_micros").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.withColumn("ndcg", ndcg)


def rouge_n_scores(
    df: DataFrame,
    generated_col: str,
    reference_col: str,
    n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ROUGE-N between a generated answer and its reference (the
    reference repo's ``RougeMetrics``, evaluation/metrics/
    generated_answer.py:5 — there the driver-side ``rouge_scorer``
    library; here the published ROUGE-N definition as native
    expressions, distributed over the whole eval set in one narrow map):

        match     = Σ_g min(count_gen(g), count_ref(g))   (clipped n-grams)
        recall    = match / |ref n-grams|
        precision = match / |gen n-grams|
        F1        = 2·P·R / (P + R)

    Returns (id_col, match_n, gen_n, ref_n, recall_micros,
    precision_micros, f1_micros) with NULL scores when a side has no
    n-grams. All counts are exact row-local integers (clipped counts are
    a Counter intersection in one fanned-out Arrow pass — O(len) per row,
    zero shuffle), so the quantized scores replay bit-for-bit in SQL."""
    from sycamore_spark.functions import text as T

    def grams(c):
        toks = T.tokens(c)
        if n == 1:
            return toks
        return F.when(
            F.size(toks) >= n, T.word_shingles(c, k=n)
        ).otherwise(F.array().cast("array<string>"))

    g, r = grams(F.col(generated_col)), grams(F.col(reference_col))
    base = df.select(F.col(id_col), g.alias("_g"), r.alias("_r"))
    # clipped counts per row via one Arrow pass: Counter(g) & Counter(r)
    # is exactly the clipped intersection, O(len) per row with ZERO
    # shuffle — measured faster than both the interpreted HOF fold
    # (O(distinct x len) per row) and an explode+join shape (3 shuffles)
    import pandas as pd
    from collections import Counter

    idt = df.schema[id_col].dataType.simpleString()

    def _clip(it):
        for pdf in it:
            out = {"id": [], "m": [], "ng": [], "nr": []}
            for rid, gg, rr in zip(pdf[id_col], pdf["_g"], pdf["_r"]):
                gg = list(gg) if gg is not None else []
                rr = list(rr) if rr is not None else []
                out["id"].append(rid)
                out["m"].append(sum((Counter(gg) & Counter(rr)).values()))
                out["ng"].append(len(gg))
                out["nr"].append(len(rr))
            yield pd.DataFrame(out)

    from sycamore_spark.functions.partitioning import fan_out

    d = fan_out(base).mapInPandas(_clip, schema=f"id {idt}, m long, ng long, nr long").select(
        F.col("id").alias(id_col),
        F.col("m").alias(f"match_{n}"),
        F.col("ng").alias("gen_n"),
        F.col("nr").alias("ref_n"),
    )
    q = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    rec = F.when(F.col("ref_n") > 0, F.col(f"match_{n}") / F.col("ref_n"))
    prec = F.when(F.col("gen_n") > 0, F.col(f"match_{n}") / F.col("gen_n"))
    f1 = F.when(
        (prec + rec) > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0)))
    return d.select(
        id_col, f"match_{n}", "gen_n", "ref_n",
        q(rec).alias("recall_micros"),
        q(prec).alias("precision_micros"),
        q(f1).alias("f1_micros"),
    )


def _lcs_len(a: list, b: list) -> int:
    """Token-level longest-common-subsequence length, O(len(a)*len(b))
    rolling-row DP. Shared by rouge_l_scores and the Self-Instruct
    instruction_pool_filter (operators/dedup.py)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(prev[j + 1], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l_scores(
    df: DataFrame,
    generated_col: str,
    reference_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ROUGE-L (Lin 2004 §3.1, sentence-level): LCS-based recall /
    precision / F1 — the rouge_scorer default the reference's
    ``RougeMetrics`` family wraps driver-side (evaluation/metrics/
    generated_answer.py:5); here the published definition computed
    distributed:

        lcs_len   = |LCS(gen_tokens, ref_tokens)|
        recall    = lcs_len / |ref|, precision = lcs_len / |gen|
        F1        = 2*P*R / (P + R)

    One fanned-out Arrow pass runs the O(n*m) rolling-row DP per row —
    zero shuffle, like rouge_n_scores' clipped-count pass. Integer
    lcs_len + micro-quantized scores replay bit-for-bit in SQL: the
    oracle runs the SAME DP as a nested list_reduce fold (outer fold
    over gen tokens, inner fold building each DP row). Returns
    (id_col, lcs_len, gen_n, ref_n, recall_micros, precision_micros,
    f1_micros); NULL scores when a side is empty mirror rouge_n."""
    import pandas as pd

    from sycamore_spark.functions import text as T
    from sycamore_spark.functions.partitioning import fan_out

    base = df.select(
        F.col(id_col),
        T.tokens(F.col(generated_col)).alias("_g"),
        T.tokens(F.col(reference_col)).alias("_r"),
    )
    idt = df.schema[id_col].dataType.simpleString()

    def _dp(it):
        for pdf in it:
            out = {"id": [], "l": [], "ng": [], "nr": []}
            for rid, gg, rr in zip(pdf[id_col], pdf["_g"], pdf["_r"]):
                gg = list(gg) if gg is not None else []
                rr = list(rr) if rr is not None else []
                out["id"].append(rid)
                out["l"].append(_lcs_len(gg, rr))
                out["ng"].append(len(gg))
                out["nr"].append(len(rr))
            yield pd.DataFrame(out)

    d = fan_out(base).mapInPandas(
        _dp, schema=f"id {idt}, l long, ng long, nr long"
    ).select(
        F.col("id").alias(id_col),
        F.col("l").alias("lcs_len"),
        F.col("ng").alias("gen_n"),
        F.col("nr").alias("ref_n"),
    )
    q = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    rec = F.when(F.col("ref_n") > 0, F.col("lcs_len") / F.col("ref_n"))
    prec = F.when(F.col("gen_n") > 0, F.col("lcs_len") / F.col("gen_n"))
    f1 = F.when(
        (prec + rec) > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0)))
    return d.select(
        id_col, "lcs_len", "gen_n", "ref_n",
        q(rec).alias("recall_micros"),
        q(prec).alias("precision_micros"),
        q(f1).alias("f1_micros"),
    )


def cer_scores(
    df: DataFrame,
    ref_col: str,
    hyp_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Character error rate per row — the reference's OCR-evaluation
    metric (evaluation/ocr/metrics.py:3, there via the driver-side
    ``jiwer`` library): CER = levenshtein(ref, hyp) / len(ref), all
    JVM-native (``F.levenshtein`` is codepoint-level edit distance).
    Returns (id_col, edit_distance, ref_chars, cer_micros); NULL CER for
    empty references. Oracle caveat recorded at the gate: DuckDB's
    levenshtein is BYTE-level, so the cross-engine hash gate holds on
    ASCII corpora (this testdata is ASCII-pure at every SF); the operator
    itself is codepoint-correct on any input."""
    d = F.levenshtein(F.col(ref_col), F.col(hyp_col))
    n = F.length(F.col(ref_col))
    return df.select(
        F.col(id_col),
        d.cast("bigint").alias("edit_distance"),
        n.cast("bigint").alias("ref_chars"),
        F.when(n > 0, F.floor(d / n * F.lit(1e6) + F.lit(0.5)).cast("long")).alias(
            "cer_micros"
        ),
    )


def wer_scores(
    df: DataFrame,
    ref_col: str,
    hyp_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Word error rate per row (reference OCR metrics' ``wer``):
    WER = word-level edit distance / ref word count. The distance is
    computed with an Arrow-batched numpy DP (unit costs — any correct
    implementation agrees on the DISTANCE, which is what makes the SQL
    replay possible: the oracle relabels each row's tokens as single
    ASCII characters, an injective encoding under which character
    levenshtein IS word levenshtein). Returns (id_col, word_distance,
    ref_words, hyp_words, wer_micros); NULL for empty references.

    MER/WIL (the jiwer extras) are deliberately absent: they need the
    alignment's hit count, which is not unique across minimal-distance
    alignments and therefore not engine-replayable."""
    import numpy as np
    import pandas as pd

    from sycamore_spark.functions import text as T

    idt = df.schema[id_col].dataType.simpleString()
    sel = df.select(
        F.col(id_col),
        T.tokens(F.col(ref_col)).alias("_r"),
        T.tokens(F.col(hyp_col)).alias("_h"),
    )

    def _wer(it):
        for pdf in it:
            out = {"id": [], "d": [], "nr": [], "nh": []}
            for rid, r, h in zip(pdf[id_col], pdf["_r"], pdf["_h"]):
                r = list(r) if r is not None else []
                h_arr = np.array(h if h is not None else [], dtype=object)
                nr, nh = len(r), len(h_arr)
                prev = np.arange(nh + 1, dtype=np.int64)
                jj = np.arange(nh + 1, dtype=np.int64)
                for i in range(1, nr + 1):
                    # vectorized DP row: t[j] = min(del-from-prev, sub);
                    # the left-to-right insert term cur[j-1]+1 is a
                    # prefix-min after subtracting j (classic rewrite:
                    # cur[j] = j + min_{k<=j}(t[k] - k))
                    t = np.minimum(prev[1:] + 1, prev[:-1] + (r[i - 1] != h_arr))
                    head = np.concatenate(([np.int64(i)], t - jj[1:]))
                    prev = np.minimum.accumulate(head) + jj
                out["id"].append(rid)
                out["d"].append(int(prev[nh]))
                out["nr"].append(nr)
                out["nh"].append(nh)
            yield pd.DataFrame(out)

    from sycamore_spark.functions.partitioning import fan_out

    res = fan_out(sel).mapInPandas(_wer, schema=f"id {idt}, d long, nr long, nh long")
    return res.select(
        F.col("id").alias(id_col),
        F.col("d").alias("word_distance"),
        F.col("nr").alias("ref_words"),
        F.col("nh").alias("hyp_words"),
        F.when(
            F.col("nr") > 0,
            F.floor(F.col("d") / F.col("nr") * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("wer_micros"),
    )


# ---------------------------------------------------------------------------
# Subtask decomposition executor (reference evaluation/subtasks.py:13-200)
# ---------------------------------------------------------------------------

def keyword_task_case(task_descriptions: dict, question_col) -> "F.Column":  # type: ignore[name-defined]
    """Deterministic stand-in for the reference's LLM task identifier
    (subtasks.py:47 generates a task id from the question with
    _TaskIdentifierZeroShotGuidancePrompt): first task whose description
    keyword appears (case-insensitive) in the question wins, in dict
    order. Compiled to one CASE expression — the ``convert_units``
    driver-compiled-closure pattern. Swap in ``llm_map`` for the
    LLM-backed route; the downstream stages only see a task-id column."""
    q = F.lower(question_col)
    expr = F.lit(None).cast("string")
    for task_id, desc in reversed(list(task_descriptions.items())):
        kw = str(desc).lower().split()[0] if str(desc).strip() else str(task_id).lower()
        expr = F.when(q.contains(kw.lower()), F.lit(task_id)).otherwise(expr)
    return expr


def expand_formulas(
    questions: DataFrame,
    task_formulas: dict,
    task_col: str = "task_id",
    reqd_col: str | None = "subtasks_reqd",
) -> DataFrame:
    """Fan each task-identified question out to that task's formula
    documents (reference subtasks.py:44-74 _get_formulas): one child row
    per formula carrying the task's instructions; a task with NO formulas
    yields one empty-formula row (reference lines 67-72), so
    instruction-only tasks still flow. Questions where ``reqd_col`` is
    false produce nothing, matching the ``subtasks_reqd`` guard.
    Broadcast join against the (tiny, driver-supplied) formula table —
    the question side stays distributed."""
    rows = []
    for tid, spec in task_formulas.items():
        formulas = list(spec.get("formulas", [])) or [""]
        for i, formula in enumerate(formulas):
            rows.append((str(tid), i, formula, spec.get("instructions", "")))
    ftab = questions.sparkSession.createDataFrame(
        rows, "task_id string, formula_index int, formula string, instructions string"
    ).withColumnRenamed("task_id", task_col)
    out = questions
    if reqd_col is not None:
        out = out.filter(F.col(reqd_col))
    return out.join(F.broadcast(ftab), task_col)


def attach_subtasks(
    formulas: DataFrame,
    subtask_instructions: dict,
    formula_col: str = "formula",
    filters_col: str | None = None,
    out_col: str = "subtask",
    term_col: str = "term",
) -> DataFrame:
    """Expand each formula row into its subtask queries (reference
    subtasks.py:76-93 _get_subtasks): every instruction TERM that occurs
    in the formula text becomes one subtask element whose text is the
    term's instruction template — ``{key}`` placeholders substituted from
    the row's ``filters_col`` map — plus the reference's literal suffix
    'Return only the code <term> alongside the amount found and no
    additional information.'. The term table rides along as an array
    literal (a handful of terms), so matching is a native filter+explode,
    no join, no BNL; substitution is a fold over map_entries."""
    terms_arr = F.array(*[
        F.struct(F.lit(str(term)).alias("t"), F.lit(str(tmpl)).alias("tpl"))
        for term, tmpl in subtask_instructions.items()
    ])
    hit = F.filter(terms_arr, lambda s: F.col(formula_col).contains(s["t"]))
    out = formulas.withColumn("_hit", F.explode(hit))
    tpl = F.col("_hit")["tpl"]
    if filters_col is not None:
        tpl = F.aggregate(
            F.map_entries(F.coalesce(F.col(filters_col), F.expr("map()"))),
            tpl,
            lambda acc, kv: F.replace(
                acc, F.concat(F.lit("{"), kv["key"], F.lit("}")), kv["value"]
            ),
        )
    subtask = F.concat(
        tpl,
        F.lit("Return only the code "),
        F.col("_hit")["t"],
        F.lit(" alongside the amount found and no additional information."),
    )
    return (
        out.withColumn(term_col, F.col("_hit")["t"])
        .withColumn(out_col, subtask)
        .drop("_hit")
    )


# ---------------------------------------------------------------------------
# Evaluation harness (reference evaluation/pipeline.py, evaluate.py,
# datasets.py — the last unported files of the evaluation package)
# ---------------------------------------------------------------------------

def augment_questions_with_subtasks(
    questions: DataFrame,
    subtask_answers: DataFrame,
    term_order: list[str],
    question_id_col: str = "question_id",
    question_col: str = "question",
    reqd_col: str | None = "subtasks_reqd",
) -> DataFrame:
    """Prepend each question's subtask evidence (reference
    evaluation/pipeline.py:79-94 ``_build_opensearch_query``): per formula
    doc, ``" Formula: <formula>; Values: <answer>, <answer>, "`` with the
    answers in the reference's element order — the order terms matched in
    ``attach_subtasks`` (its term-array order == ``term_order``, the
    subtask_instructions key order) — then the task's
    ``" Instructions: <instructions> Use this information to answer the
    following question. "`` suffix, then the original question.

    ``subtask_answers`` is the subtask executor's output with a generated
    ``answer`` per (question, formula_index, term) — the seam where the
    reference fans out to the LLM (``elem.properties["generated_answer"]``).
    Questions with no subtask rows (or ``reqd_col`` false) pass through
    unchanged. Plan: two hash aggregations (formula-level concat, then
    question-level concat) + one left join back to the questions — never a
    driver collect, so a million-question sweep is the same plan."""
    # array_position returns 0 for a term ABSENT from term_order, which
    # would sort that answer before every legitimate term — unknown terms
    # order LAST instead (ties fall back to the struct's answer field)
    raw_pos = F.array_position(
        F.array(*[F.lit(t) for t in term_order]), F.col("term")
    )
    pos = F.when(raw_pos == 0, F.lit(len(term_order) + 1)).otherwise(raw_pos)
    per_formula = (
        subtask_answers.withColumn("_tpos", pos)
        .groupBy(question_id_col, "formula_index", "formula", "instructions")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_tpos"), F.col("answer")))
                    ),
                    lambda s: s["answer"],
                ),
                ", ",
            ).alias("_values")
        )
        .withColumn(
            "_ftext",
            F.when(
                F.length(F.coalesce(F.col("formula"), F.lit(""))) > 0,
                F.concat(
                    F.lit(" Formula: "), F.col("formula"),
                    F.lit("; Values: "), F.col("_values"), F.lit(", "),
                ),
            ).otherwise(F.lit("")),
        )
    )
    per_question = per_formula.groupBy(question_id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("formula_index"), F.col("_ftext")))
                ),
                lambda s: s["_ftext"],
            ),
            "",
        ).alias("_formulas"),
        # all formula rows of a task share one instructions string
        F.first("instructions").alias("_instr"),
    ).select(
        question_id_col,
        F.concat(
            F.col("_formulas"),
            F.lit(" Instructions: "), F.col("_instr"),
            F.lit(" Use this information to answer the following question. "),
        ).alias("_prefix"),
    )
    out = questions.join(per_question, question_id_col, "left")
    gate = F.col("_prefix").isNotNull()
    if reqd_col is not None and reqd_col in questions.columns:
        gate = gate & F.col(reqd_col)
    return out.withColumn(
        question_col,
        F.when(gate, F.concat(F.col("_prefix"), F.col(question_col))).otherwise(
            F.col(question_col)
        ),
    ).drop("_prefix")


def bm25_retriever(k1: float = 1.2, b: float = 0.75):
    """Default retriever for EvaluationPipeline: batch BM25 top-k over the
    corpus (operators/retrieval.py bm25_scores_multi — ONE posting
    aggregation serves every question). The reference's retriever is an
    OpenSearch hybrid query (pipeline.py:96-146); that transport lives
    behind the gated connector protocols. Returns a callable
    (questions, corpus, k) -> (query_id, doc_id, rank)."""

    def retrieve(questions: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
        from sycamore_spark.operators.retrieval import bm25_scores_multi

        scored = bm25_scores_multi(
            corpus, questions,
            id_col="doc_id", text_col="text",
            query_id_col="question_id", query_text_col="question",
            k1=k1, b=b, k=k, keep_rank=True,
        )
        return scored.select(
            F.col("question_id").alias("query_id"),
            F.col("doc_id"),
            F.col("rank"),
        )

    return retrieve


class EvaluationPipeline:
    """QA-dataset evaluation harness (reference evaluation/pipeline.py:15
    ``EvaluationPipeline.execute``): questions -> retrieval -> per-query
    metrics -> aggregated summary. The reference's four stages map to:

    1. ``_build_opensearch_query`` (+ subtask augmentation) -> native
       question DataFrame, optionally pre-processed with
       ``augment_questions_with_subtasks``;
    2. ``OpenSearchQueryExecutor`` -> the injectable ``retriever`` seam
       (default ``bm25_retriever()``; the OpenSearch/hybrid-KNN transport
       is a gated connector, connectors.py);
    3. ``_process_queries`` (document_retrieval_metrics + rouge_metrics)
       -> ``retrieval_metrics`` over the retrieved/truth join, plus
       ``rouge_n_scores`` when an ``answerer`` produces generated answers
       against ``ground_truth_answer``;
    4. ``_aggregate_metrics`` (statistics.mean per metric) -> ONE hash
       aggregation emitting the mean of each metric across queries.

    Everything stays distributed: metrics are per-query rows, the summary
    is a single agg — evaluating a million-query sweep is the same plan as
    ten (the reference collects every doc to the driver, take_all()).
    """

    def __init__(
        self, retriever=None, k: int = 10, rouge_n: int = 1,
        checkpoint_dir: str | None = None,
    ):
        self.retriever = retriever or bm25_retriever()
        self.k = k
        self.rouge_n = rouge_n
        self.checkpoint_dir = checkpoint_dir

    def execute(
        self,
        questions: DataFrame,
        corpus: DataFrame,
        truth: DataFrame | None = None,
        answerer=None,
    ):
        """Run the harness. ``questions``: (question_id, question[,
        ground_truth_answer]). ``corpus``: (doc_id, text). ``truth``:
        (question_id, doc_id) relevant pairs — defaults to the questions'
        ``ground_truth_doc_id`` column. ``answerer``: optional callable
        (retrieved-with-text DataFrame) -> (question_id, generated) used
        for the generated-answer (ROUGE) metrics. Returns (per_query,
        summary) DataFrames.

        The labeled retrieval table (<= k rows per question — question-
        scale, never corpus-scale) is lineage-cut after retrieval: the
        metric, ROUGE, and summary branches all re-read it, and without
        the cut each branch would re-run the corpus-scale retrieval.
        Pass ``checkpoint_dir`` (HDFS/S3A) on a real cluster for a
        durable cut; the local default is executor-volatile."""
        from sycamore_spark.functions.partitioning import lineage_cut

        retrieved = self.retriever(questions, corpus, self.k)
        if truth is None:
            truth = questions.select(
                "question_id", F.col("ground_truth_doc_id").alias("doc_id")
            )
        rel = truth.withColumn("_rel", F.lit(1))
        labeled = retrieved.join(
            rel,
            (retrieved.query_id == rel.question_id) & (retrieved.doc_id == rel.doc_id),
            "left",
        ).select(
            retrieved.query_id.alias("question_id"),
            retrieved.doc_id,
            retrieved.rank,
            F.coalesce(F.col("_rel"), F.lit(0)).alias("rel"),
        )
        labeled = lineage_cut(labeled, self.checkpoint_dir)
        per_query = retrieval_metrics(
            labeled, query_col="question_id", rank_col="rank", rel_col="rel", k=self.k
        )
        rouge_cols = []
        if answerer is not None and "ground_truth_answer" in questions.columns:
            hits_text = labeled.filter(F.col("rank") == 1).join(
                corpus.select("doc_id", "text"), "doc_id"
            ).select("question_id", "rank", "text")
            generated = answerer(hits_text)
            paired = generated.join(
                questions.select("question_id", F.col("ground_truth_answer").alias("_ref")),
                "question_id",
            )
            rscore = rouge_n_scores(
                paired.select("question_id", "generated", "_ref"),
                "generated", "_ref", n=self.rouge_n, id_col="question_id",
            ).select("question_id", "recall_micros", "precision_micros", "f1_micros")
            per_query = per_query.join(rscore, "question_id", "left")
            rouge_cols = ["recall_micros", "precision_micros", "f1_micros"]
        # per_query feeds BOTH the returned frame and the summary aggregate
        # below; without a cut each consumer re-executes the metric windows,
        # the rank-1 corpus text join and the ROUGE Arrow stage. The cut is
        # LAZY (question-scale rows; no extra job — the first consumer
        # materializes it). Values unchanged.
        per_query = lineage_cut(per_query, self.checkpoint_dir, eager=False)
        # reference _aggregate_metrics: mean of each metric over all queries;
        # exact bigint sums divided as IEEE doubles -> engine-replayable
        aggs = [
            F.count(F.lit(1)).alias("n_queries"),
            (F.sum("hits_at_k").cast("double") / F.count(F.lit(1))).alias("mean_hits_at_k"),
            (F.sum("mrr_micros").cast("double") / F.count(F.lit(1))).alias("mean_mrr_micros"),
            # micro-averaged NDCG: one quotient of two exact bigint sums,
            # guarded so an all-irrelevant sweep yields 0.0, not a NULL/inf
            # that differs across engines
            F.when(
                F.sum("idcg_micros") > 0,
                F.sum("dcg_micros").cast("double") / F.sum("idcg_micros").cast("double"),
            ).otherwise(F.lit(0.0)).alias("micro_ndcg"),
        ]
        for c in rouge_cols:
            aggs.append(
                (F.sum(c).cast("double") / F.count(F.when(F.col(c).isNotNull(), 1))).alias(f"mean_{c}")
            )
        summary = per_query.agg(*aggs)
        return per_query, summary


def datapoints_from_json(
    spark,
    gt: dict,
    custom_question_augmentation: str = "{}",
    question_augmentation_filter: str = "",
):
    """Build an evaluation-datapoint DataFrame from a ground-truth JSON
    dict (reference evaluate.py:100-117 ``create_evaluation_datapoint`` +
    evaluate.py:37-53 ``add_filters_to_question``): one row per entry of
    ``gt["data"]`` with the question formatted through
    ``custom_question_augmentation.format(Question, filters[filter_key])``,
    the answer, the filters map, and the flattened SearchContexts as
    ground-truth source documents. The GT file is a driver-side artifact
    (the reference loads it with json.load), so building rows driver-side
    is the honest bound — the RESULT is a distributed DataFrame."""
    rows = []
    for i, dp in enumerate(gt.get("data", [])):
        filters = dict(dp.get("Filters", {}) or {})
        question = dp.get("Question", "")
        if filters or custom_question_augmentation != "{}":
            question = custom_question_augmentation.format(
                question, filters.get(question_augmentation_filter)
            )
        contexts = [
            (
                str(sc.get("document_url", "")),
                (sc.get("page_numbers") or [sc.get("page_number")])[0],
                str(sc.get("text_representation", "")),
            )
            for sc in dp.get("SearchContexts", [])
        ]
        rows.append((i, question, dp.get("Answer"), filters, contexts))
    return spark.createDataFrame(
        rows,
        "question_id int, question string, ground_truth_answer string, "
        "filters map<string,string>, "
        "ground_truth_source_documents array<struct<location:string,page_number:int,text:string>>",
    )


def huggingface_datapoints(spark, dataset, doc_extractor, limit: int = 10000):
    """HuggingFace-dataset loader seam (reference datasets.py:14-46
    ``HuggingFaceScan``/``EvaluationDataSetReader.huggingface``): iterate
    the (streaming or materialized) dataset, map ``doc_extractor`` over
    each raw example, and build the datapoint DataFrame. The ``datasets``
    library is not in this container, so the transport is the INJECTED
    ``dataset`` iterable itself — any iterable of dicts works (tests use a
    plain list); a real HF dataset object satisfies the same protocol.
    ``limit`` bounds driver memory; raise it deliberately for big sweeps
    or pre-shard the dataset."""
    import itertools

    rows = [doc_extractor(ex) for ex in itertools.islice(iter(dataset), limit)]
    if not rows:
        raise ValueError("dataset produced no examples")
    return spark.createDataFrame(rows)


def ann_recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    overall_id: int = -1,
    strict: bool = True,
) -> DataFrame:
    """ANN quality measurement: per-query recall of an approximate result
    set against the exact one (|approx ∩ exact| / |exact|), plus one
    overall row (``query_col`` = ``overall_id``) whose recall is
    total-hits / total-exact — an integer ratio, NOT a mean of per-query
    doubles, so engines agree bit-for-bit regardless of summation order.

    Beyond-reference evaluation-package extension (the reference's
    evaluation/ measures retrieval against labeled docs,
    evaluation/pipeline.py:15; ANN-vs-exact recall is the same harness
    applied to the vector path). Inputs are (query, id) result tables —
    rank columns are ignored, so any of brute_force_topk / ivf_topk /
    pq_topk / ivf_pq_* outputs plug in directly.

    Recall's denominator comes from ``exact``: a query id that appears
    ONLY in ``approx`` has no ground truth and would otherwise vanish from
    the output silently — under ``strict`` (default) that raises at
    execution time, as does an ``overall_id`` colliding with a real query
    id (which would corrupt the per-query/overall distinction). The
    validation is built INTO the returned plan (``assert_true`` over a
    full-outer query-id join, forced by an always-true filter), so it
    costs ZERO extra jobs and never re-executes the inputs' lineage —
    violations surface as a SparkRuntimeException naming the query id
    when the result is computed. ``strict=False`` keeps the documented
    silent-drop behavior.

    Shape: two hash aggs on the (small, top-k-sized) result tables and
    one one-row union — question-scale, corpus-free."""
    a = approx.select(F.col(query_col).alias("_q"), F.col(id_col).alias("_i")).distinct()
    e = exact.select(F.col(query_col).alias("_q"), F.col(id_col).alias("_i")).distinct()
    # ONE full-outer row join + ONE hash agg: each input's lineage executes
    # exactly once (the hits/base two-branch form re-ran `exact` twice, and
    # a strict-mode third branch re-ran `approx` — on lazy ANN inputs each
    # branch re-executes the whole search; bench ann_recall measured it)
    m = a.withColumn("_ina", F.lit(1)).join(
        e.withColumn("_ine", F.lit(1)), ["_q", "_i"], "full"
    )
    per = m.groupBy("_q").agg(
        F.sum(
            F.when(F.col("_ina").isNotNull() & F.col("_ine").isNotNull(), 1).otherwise(0)
        ).alias("n_hits"),
        F.sum("_ine").alias("n_exact"),
    )
    if strict:
        no_orphan = F.assert_true(
            F.col("n_exact").isNotNull(),
            F.concat(
                F.lit(f"ann_recall_at_k: {query_col}="),
                F.col("_q").cast("string"),
                F.lit(
                    " appears in approx but not in exact - it has no ground "
                    "truth; align the query sets or pass strict=False to drop "
                    "deliberately"
                ),
            ),
        )
        no_clash = F.assert_true(
            # null-safe: a NULL query id is a degenerate group, not a
            # collision (plain != would yield NULL and false-trigger)
            ~F.col("_q").eqNullSafe(F.lit(overall_id)),
            F.lit(
                f"ann_recall_at_k: overall_id={overall_id!r} occurs as a real "
                f"{query_col} in the inputs - the overall row would collide; "
                f"pass a distinct overall_id"
            ),
        )
        # assert_true returns NULL on success; the filter forces evaluation
        # (a bare projected-and-dropped column would be pruned by Catalyst)
        per = per.filter(no_orphan.isNull() & no_clash.isNull())
    else:
        per = per.filter(F.col("n_exact").isNotNull())  # documented silent drop
    per = (
        per.select(
            F.col("_q").alias(query_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
        )
        .withColumn(
            "recall", F.col("n_hits").cast("double") / F.col("n_exact").cast("double")
        )
    )
    overall = per.agg(
        F.sum("n_hits").alias("n_hits"), F.sum("n_exact").alias("n_exact")
    ).select(
        F.lit(overall_id).cast(per.schema[query_col].dataType).alias(query_col),
        F.col("n_hits").cast("bigint"),
        F.col("n_exact").cast("bigint"),
        (F.col("n_hits").cast("double") / F.col("n_exact").cast("double")).alias("recall"),
    )
    return per.unionByName(overall)
