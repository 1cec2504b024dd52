"""A/B: bm25_scores_multi tf-construction strategies (r7 verdict ask #3).

NEW (r7, shipped): one corpus explode -> all_tf = groupBy(id, tok) over the
FULL corpus vocabulary; dl derived from all_tf. One pass, but the hash-agg
state is corpus-vocabulary-sized.

OLD (r6): semi-join the exploded tokens against the query vocabulary FIRST,
then tf = groupBy(id, tok) over matched tokens only; dl = a SECOND corpus
explode aggregated by id. Two passes, but each agg state is small.

Protocol: warm (min of 2 after a cold run) at sf0.01 and sf0.1, with 2 and
100 queries. Usage: python tools/ab_bm25.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
import sycamore_spark as ss  # noqa: E402


def build(df, queries, variant, k1=1.2, b=0.75):
    toks = df.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("_tok"),
    )
    qterms = queries.select(
        F.col("query_id").alias("_qid"),
        F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col("query"))), r"\s+"))).alias("_tok"),
    )
    wanted = qterms.select("_tok").distinct()
    if variant == "new":  # one explode; full-vocab agg; dl from all_tf
        all_tf = toks.groupBy("_id", "_tok").agg(F.count(F.lit(1)).alias("_tf"))
        dl = all_tf.groupBy("_id").agg(F.sum("_tf").alias("_dl"))
        tf = all_tf.join(wanted, "_tok", "left_semi")
    else:  # old: semi-join first, then tf; dl via a second corpus pass
        tf = toks.join(wanted, "_tok", "left_semi").groupBy("_id", "_tok").agg(
            F.count(F.lit(1)).alias("_tf")
        )
        dl = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl"))
    dfreq = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        qterms.join(tf, "_tok")
        .join(F.broadcast(dfreq), "_tok")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf_norm = (F.col("_tf") * F.lit(k1 + 1.0)) / (
        F.col("_tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
    )
    contrib = F.floor(idf * tf_norm * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    return (
        scored.withColumn("_c", contrib)
        .groupBy("_qid", "_id")
        .agg(F.sum("_c").alias("bm25_micros"))
    )


def make_queries(spark, n):
    # query terms drawn from real document vocabulary so the semi-join
    # keeps a realistic match rate
    words = ["data", "model", "spark", "query", "join", "test", "table",
             "index", "text", "token", "batch", "cache", "shard", "merge",
             "scan", "sort", "group", "count", "read", "write"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(5)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "query_id bigint, query string")


def main():
    spark = ss.init(app_name="ab-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    print("variant,sf,n_queries,warm_sec,rows")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = entry.load_table(spark, sf, "documents").select("doc_id", "text")
        for nq in (2, 100):
            queries = make_queries(spark, nq)
            for variant in ("new", "old"):
                out = build(docs, queries, variant)
                n = out.count()  # cold
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    build(docs, queries, variant).count()
                    times.append(time.perf_counter() - t0)
                print(f"{variant},{sf.rsplit('sf',1)[-1]},{nq},{min(times):.3f},{n}")
    spark.stop()


if __name__ == "__main__":
    main()
