"""relational.global_rank — the two-phase (repartitionByRange →
parallel per-bucket window → broadcast offset add) replacement for
unpartitioned Window.orderBy. Differential against the single-task
window on every mode, plus the plan property that justifies it."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from avocado_spark.operators.relational import global_rank


def _df(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") * 37 % 701).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
    )


def _same(a, b, cols):
    return (
        a.select(*cols).exceptAll(b.select(*cols)).count() == 0
        and a.count() == b.count()
    )


def test_matches_global_window_asc(spark):
    df = _df(spark)
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    got = global_rank(df, [F.col("v").asc(), F.col("k").asc()], "r")
    assert _same(exp, got, ["v", "k", "r"])


def test_matches_desc_with_cumsum(spark):
    df = _df(spark)
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    exp = df.withColumn("r", F.row_number().over(w)).withColumn(
        "c",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    got = global_rank(
        df, [F.col("v").desc(), F.col("k").asc()], "r", cumsum_cols={"c": "v"}
    )
    assert _same(exp, got, ["v", "k", "r", "c"])


def test_matches_grouped_window(spark):
    df = _df(spark)
    exp = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("v", "k"))
    )
    got = global_rank(
        df, [F.col("v").asc(), F.col("k").asc()], "r", partition_cols=["g"]
    )
    assert _same(exp, got, ["g", "v", "k", "r"])


def test_degenerate_bucket_counts(spark):
    df = _df(spark, n=7)
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    for buckets in (1, 2, 64):  # fewer rows than buckets, single bucket
        got = global_rank(df, [F.col("v").asc(), F.col("k").asc()], "r", buckets=buckets)
        assert _same(exp, got, ["v", "k", "r"]), buckets


def test_empty_input(spark):
    df = _df(spark).where(F.lit(False))
    assert global_rank(df, [F.col("v").asc(), F.col("k").asc()], "r").count() == 0


def test_plan_is_scale_safe(spark):
    """The whole point: no single-partition exchange, no nested-loop
    join — every stage is parallel."""
    got = global_rank(_df(spark), [F.col("v").asc(), F.col("k").asc()], "r")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_null_order_keys_match_window(spark):
    """NULLs in the order column: repartitionByRange and Window.orderBy
    must agree on NULLS FIRST ascending for the two-phase rank to be a
    drop-in replacement."""
    df = spark.range(2000).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") * 37 % 701).alias("v"),
        F.col("id").alias("k"),
    )
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    got = global_rank(df, [F.col("v").asc(), F.col("k").asc()], "r")
    assert _same(exp, got, ["v", "k", "r"])
