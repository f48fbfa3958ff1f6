"""Compaction planner on REAL parquet fragments (the registry query
uses deterministic pseudo-files so the oracle can replay it; this test
proves the _metadata hidden-column path the planner is built for) plus
the bin-packing invariants and the CMS join-estimate bound."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from avocado_spark.operators.layout import compaction_plan
from avocado_spark.operators.sketches import cms_join_size_estimate
from avocado_spark.session import load_table
from tests.conftest import SF_CORRECT


def test_compaction_plan_on_parquet_metadata(spark):
    """Write a fragmented partitioned dataset, read per-file stats from
    the _metadata hidden columns, and plan merges — every partition's
    plan must cover every file exactly once, and every non-final bin
    must have reached the target."""
    ev = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    root = os.path.join(tempfile.mkdtemp(prefix="avocado_compact_"), "ev")
    # repartition(6) inside each day → ~6 small fragments per partition
    ev.repartition(6).write.partitionBy("day").parquet(root)

    frags = (
        spark.read.parquet(root)
        .select("day", F.col("_metadata.file_name").alias("file_id"))
        .groupBy("day", "file_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    n_files = frags.count()
    assert n_files > 60  # genuinely fragmented

    plan = compaction_plan(frags, "day", "file_id", "n_rows", target_rows=200)
    assert plan.count() == n_files  # every file planned exactly once

    bins = plan.groupBy("day", "bin_id").agg(
        F.sum("n_rows").alias("bin_rows"), F.max("bin_id").alias("b")
    )
    last_bin = plan.groupBy("day").agg(F.max("bin_id").alias("last_bin"))
    non_final = bins.join(last_bin, "day").where(F.col("bin_id") < F.col("last_bin"))
    # next-fit guarantee: every bin that was CLOSED reached the target
    assert non_final.where(F.col("bin_rows") < 200).count() == 0
    # and planning shrank the file count
    assert bins.count() < n_files


def test_cms_join_estimate_upper_bound(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    a = ev.select("user_id")
    b = ev.where(F.col("event_type") == "click").select("user_id")
    exact = a.join(b, "user_id").count()
    [row] = cms_join_size_estimate(ev, b, "user_id").collect()
    assert row["cms_est"] >= exact  # inner product never underestimates
    # and with width 1024 over 150 keys it is not wildly off
    assert row["cms_est"] <= exact * 2
