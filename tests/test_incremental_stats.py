"""Additive-state stats maintenance (operators/incremental.py): the merge
path must be bit-identical to a full recompute."""

from pyspark.sql import functions as F

from sycamore_spark.operators.incremental import corpus_stats, finalize_stats, merge_stats


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'web' ELSE 'books' END AS source",
        "(id % 977) + 1 AS n_chars",
    )


def test_merge_equals_full_recompute_bitwise(spark):
    old, delta = _docs(spark, 0, 5000), _docs(spark, 5000, 6000)
    merged = merge_stats(
        corpus_stats(old, ["source"], "n_chars"),
        corpus_stats(delta, ["source"], "n_chars"),
        ["source"],
    )
    full = corpus_stats(old.unionByName(delta), ["source"], "n_chars")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # merge is re-mergeable: fold a third batch onto the merged state
    third = _docs(spark, 6000, 6500)
    m2 = merge_stats(merged, corpus_stats(third, ["source"], "n_chars"), ["source"])
    f2 = corpus_stats(_docs(spark, 0, 6500), ["source"], "n_chars")
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, f2.collect()))


def test_merge_handles_group_only_in_one_side(spark):
    a = spark.createDataFrame([(1, "web", 10)], "doc_id long, source string, n_chars long")
    b = spark.createDataFrame([(2, "code", 20)], "doc_id long, source string, n_chars long")
    m = merge_stats(
        corpus_stats(a, ["source"], "n_chars"),
        corpus_stats(b, ["source"], "n_chars"),
        ["source"],
    ).collect()
    got = {r.source: (r.n, r.min, r.max) for r in m}
    assert got == {"web": (1, 10, 10), "code": (1, 20, 20)}


def test_finalize_mean_stddev(spark):
    df = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate([2, 4, 4, 4, 5, 5, 7, 9])],
        "doc_id long, source string, n_chars long",
    )
    out = finalize_stats(corpus_stats(df, ["source"], "n_chars")).collect()[0]
    assert out.mean == 5.0 and out.stddev == 2.0  # classic textbook set


def test_streaming_maintenance_batch_boundary_independent(spark, tmp_path):
    from sycamore_spark.streaming.stats import maintain_stats_stream

    docs = _docs(spark, 0, 3000)
    src = str(tmp_path / "src")
    docs.repartition(6).write.parquet(src)
    states = []
    for i, per_trigger in enumerate((1, 6)):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", per_trigger)
            .parquet(src)
        )
        q = maintain_stats_stream(
            stream, ["source"], "n_chars",
            str(tmp_path / f"state{i}"), str(tmp_path / f"ckpt{i}"),
        )
        q.awaitTermination(300)
        states.append(sorted(map(tuple, spark.read.parquet(str(tmp_path / f"state{i}")).collect())))
    assert states[0] == states[1]
    full = sorted(map(tuple, corpus_stats(docs, ["source"], "n_chars").collect()))
    assert states[0] == full
