"""tools/plan_audit.py constant-key detection: the r12 isotonic_apply
escape class — a Window/Exchange partitioned by a literal key funnels the
whole input through one task while the plan still looks partitioned."""

import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, "/root/repo/tools")

from plan_audit import audit, constant_key_partitionings  # noqa: E402


def test_constant_key_window_flags(spark):
    # the exact r12 escape shape: the lit-key column crosses a union, so
    # Catalyst can't fold it out of the window spec (a directly-foldable
    # partitionBy(lit(1)) is removed by the optimizer and warns instead)
    a_df = spark.range(100).withColumn("_k", F.lit(1))
    b_df = spark.range(50, 150).withColumn("_k", F.lit(1))
    w = Window.partitionBy("_k").orderBy("id")
    out = a_df.unionByName(b_df).withColumn("r", F.row_number().over(w))
    a = audit("synthetic_const_window", out)
    assert "CONST_KEY" in a["flags"], a
    assert any("hashpartitioning" in h or "windowspec" in h for h in a["const_keys"])


def test_constant_key_repartition_flags(spark):
    out = spark.range(100).repartition(8, F.lit(7))
    a = audit("synthetic_const_exchange", out)
    assert "CONST_KEY" in a["flags"], a


def test_real_key_window_does_not_flag(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 5)
    w = Window.partitionBy("g").orderBy("id")
    out = df.withColumn("r", F.row_number().over(w))
    a = audit("synthetic_real_window", out)
    assert "CONST_KEY" not in a["flags"], a


def test_repartition_one_singlepartition_not_flagged(spark):
    # seed-sized contract folds (isotonic_fit) render as a SinglePartition
    # round-robin exchange, not a literal hash key — deliberately NOT this
    # flag's business (the plan-stats probe warns on those by size)
    out = spark.range(100).repartition(1)
    a = audit("synthetic_rep1", out)
    assert "CONST_KEY" not in a["flags"], a


def test_parser_on_plan_text_directly():
    plan = (
        "(2) Project\nOutput [2]: [id#0L, 1 AS _k#10]\n"
        "(3) Exchange\nArguments: hashpartitioning(_k#10, 200), "
        "ENSURE_REQUIREMENTS, [plan_id=1]\n"
    )
    hits = constant_key_partitionings(plan)
    assert hits == ["hashpartitioning(_k#10)"]
    clean = (
        "(3) Exchange\nArguments: hashpartitioning(g#5L, 200), "
        "ENSURE_REQUIREMENTS, [plan_id=1]\n"
    )
    assert constant_key_partitionings(clean) == []
