"""Evaluation harness glue (reference evaluation/pipeline.py
EvaluationPipeline, evaluate.py create_evaluation_datapoint /
add_filters_to_question, datasets.py HuggingFaceScan)."""

from pyspark.sql import functions as F

from sycamore_spark.evaluation import (
    EvaluationPipeline,
    augment_questions_with_subtasks,
    datapoints_from_json,
    huggingface_datapoints,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (0, "spark engine shuffles data across the cluster"),
            (1, "pandas runs on a single machine"),
            (2, "the spark optimizer is called catalyst"),
            (3, "ducks swim in ponds"),
            (4, "catalyst rewrites query plans for spark"),
        ],
        "doc_id int, text string",
    )


def test_evaluation_pipeline_end_to_end(spark):
    questions = spark.createDataFrame(
        [
            (10, "spark catalyst optimizer", "the spark optimizer is called catalyst", 2),
            (11, "pandas single machine", "pandas runs on a single machine", 1),
        ],
        "question_id int, question string, ground_truth_answer string, ground_truth_doc_id int",
    )

    def answerer(hits_text):
        return hits_text.select("question_id", F.col("text").alias("generated"))

    pipe = EvaluationPipeline(k=3)
    per_query, summary = pipe.execute(questions, _corpus(spark), answerer=answerer)
    rows = {r.question_id: r for r in per_query.collect()}
    assert set(rows) == {10, 11}
    # the ground-truth doc contains every query term -> it is retrieved
    assert rows[10].hits_at_k == 1 and rows[11].hits_at_k == 1
    assert rows[11].mrr_micros == 1_000_000  # doc 1 is the unique term match at rank 1
    # generated answer == the top hit's text; for q11 that IS the reference
    assert rows[11].f1_micros == 1_000_000
    s = summary.collect()[0]
    assert s.n_queries == 2
    assert s.mean_hits_at_k == 1.0
    assert 0 < s.mean_mrr_micros <= 1_000_000


def test_evaluation_pipeline_explicit_truth_and_no_answerer(spark):
    questions = spark.createDataFrame(
        [(1, "spark")], "question_id int, question string"
    )
    truth = spark.createDataFrame(
        [(1, 0), (1, 2), (1, 4)], "question_id int, doc_id int"
    )
    per_query, summary = EvaluationPipeline(k=5).execute(
        questions, _corpus(spark), truth=truth
    )
    r = per_query.collect()[0]
    assert r.n_relevant == 3 and r.n_retrieved == 3  # docs 0,2,4 all contain 'spark'
    assert "f1_micros" not in per_query.columns  # no answerer -> no rouge stage
    assert summary.collect()[0].n_queries == 1


def test_augment_questions_with_subtasks(spark):
    questions = spark.createDataFrame(
        [(1, "What is the total?", True), (2, "Plain question?", False)],
        "question_id int, question string, subtasks_reqd boolean",
    )
    answers = spark.createDataFrame(
        [
            (1, 0, "NET + TAX", "Sum both codes.", "TAX", "tax=5"),
            (1, 0, "NET + TAX", "Sum both codes.", "NET", "net=95"),
        ],
        "question_id int, formula_index int, formula string, instructions string, term string, answer string",
    )
    out = augment_questions_with_subtasks(
        questions, answers, term_order=["NET", "TAX"]
    )
    got = {r.question_id: r.question for r in out.collect()}
    # values follow term_order (NET before TAX), reference pipeline.py:79-94
    assert got[1] == (
        " Formula: NET + TAX; Values: net=95, tax=5,  Instructions: Sum both codes."
        " Use this information to answer the following question. What is the total?"
    )
    assert got[2] == "Plain question?"  # subtasks_reqd false -> untouched


def test_augment_empty_formula_instruction_only(spark):
    # a task with the empty-formula row (subtasks.py:67-72) contributes no
    # "Formula:" text but still delivers its instructions
    questions = spark.createDataFrame(
        [(1, "Q?", True)], "question_id int, question string, subtasks_reqd boolean"
    )
    answers = spark.createDataFrame(
        [(1, 0, "", "Just think.", "X", "unused")],
        "question_id int, formula_index int, formula string, instructions string, term string, answer string",
    )
    got = augment_questions_with_subtasks(questions, answers, term_order=["X"]).collect()[0]
    assert got.question == (
        " Instructions: Just think. Use this information to answer the following question. Q?"
    )


def test_datapoints_from_json(spark):
    gt = {
        "data": [
            {
                "Question": "Total revenue",
                "Answer": "42",
                "Filters": {"company": "Acme"},
                "SearchContexts": [
                    {
                        "document_url": "http://x/report.pdf",
                        "page_numbers": [3],
                        "text_representation": "revenue was 42",
                    }
                ],
            },
            {"Question": "Bare", "Answer": "1"},
        ]
    }
    df = datapoints_from_json(
        spark, gt,
        custom_question_augmentation="{} for company {}",
        question_augmentation_filter="company",
    )
    rows = {r.question_id: r for r in df.collect()}
    assert rows[0].question == "Total revenue for company Acme"
    assert rows[0].ground_truth_answer == "42"
    assert rows[0].filters == {"company": "Acme"}
    assert rows[0].ground_truth_source_documents[0].page_number == 3
    assert rows[1].question == "Bare for company None"


def test_huggingface_datapoints_seam(spark):
    fake_dataset = [{"q": f"question {i}", "a": str(i)} for i in range(7)]

    def extract(ex):
        return {"question": ex["q"], "ground_truth_answer": ex["a"]}

    df = huggingface_datapoints(spark, fake_dataset, extract, limit=5)
    assert df.count() == 5
    assert set(df.columns) == {"question", "ground_truth_answer"}
