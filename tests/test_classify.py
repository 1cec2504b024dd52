"""Naive-Bayes classifier (operators/classify.py): separable-data accuracy,
determinism, and unseen-token fallback."""

from sycamore_spark.operators.classify import nb_classify, nb_train


def _corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, "code", f"def func_{i} return import class lambda x{i}"))
        rows.append((100 + i, "prose", f"the quick brown fox number {i} jumps over dogs"))
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_nb_separable_corpus_perfect_self_accuracy(spark):
    df = _corpus(spark)
    tm, lm = nb_train(df, "label", "text")
    pred = nb_classify(df, tm, lm, "doc_id", "text").withColumnRenamed("label", "pred")
    joined = pred.join(df.select("doc_id", "label"), "doc_id")
    wrong = joined.filter("pred <> label").count()
    assert wrong == 0


def test_nb_deterministic_across_partitioning(spark):
    df = _corpus(spark)
    tm, lm = nb_train(df, "label", "text")
    a = sorted(map(tuple, nb_classify(df, tm, lm, "doc_id", "text").collect()))
    df2 = df.repartition(13)
    tm2, lm2 = nb_train(df2, "label", "text")
    b = sorted(map(tuple, nb_classify(df2, tm2, lm2, "doc_id", "text").collect()))
    assert a == b


def test_nb_unseen_tokens_fall_back_to_prior(spark):
    df = _corpus(spark)
    tm, lm = nb_train(df, "label", "text")
    # a doc of entirely unseen tokens: every label scores prior + tf*default;
    # the skewless corpus has equal priors, so the tie breaks to 'code' (asc)
    new = spark.createDataFrame([(999, "zzz qqq www")], "doc_id long, text string")
    got = nb_classify(new, tm, lm, "doc_id", "text").collect()
    assert len(got) == 1 and got[0].label in ("code", "prose")


def test_nb_scores_pre_argmax(spark):
    """nb_scores returns |labels| rows per doc; nb_classify equals its
    argmax with the (score desc, label asc) tiebreak."""
    from sycamore_spark.operators.classify import nb_classify, nb_scores, nb_train

    train = spark.createDataFrame(
        [(1, "good clean prose text", "pos"), (2, "spam spam buy now", "neg")],
        "doc_id long, text string, lbl string",
    )
    tm, lm = nb_train(train, "lbl", "text")
    docs = spark.createDataFrame(
        [(10, "clean prose"), (11, "buy spam now")], "doc_id long, text string"
    )
    sc = nb_scores(docs, tm, lm)
    rows = sc.collect()
    assert len(rows) == 4  # 2 docs x 2 labels
    best = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, -r.score_micros, r.label)):
        best.setdefault(r.doc_id, r.label)
    pred = {r.doc_id: r.label for r in nb_classify(docs, tm, lm).collect()}
    assert pred == best == {10: "pos", 11: "neg"}
