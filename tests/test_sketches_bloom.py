"""Sketch-family properties the oracle differential can't express:
Bloom no-false-negatives + real pruning, CMS upper-bound guarantee,
HLL merged-vs-rescan agreement, and the plan shapes (map-side probe,
broadcast-only cross joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators import sketches as SK
from avocado_spark.session import load_table
from tests.conftest import SF_CORRECT


def test_bloom_no_false_negatives_and_prunes(spark):
    orders = load_table(spark, SF_CORRECT, "orders")
    cust = load_table(spark, SF_CORRECT, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    small = cust.select(F.col("c_custkey").alias("o_custkey"))
    bloom = SK.bloom_build(small, "o_custkey")
    pruned = SK.bloom_probe(orders, "o_custkey", bloom)

    total = orders.count()
    kept = pruned.count()
    true_matches = orders.join(small, "o_custkey", "left_semi").count()
    # no false negatives: every true match survives the probe
    assert kept >= true_matches
    # the filter actually prunes (BUILDING is ~1/5 of customers; with
    # 2^20 bits over ~300 keys the FP rate is ≈0)
    assert kept < total * 0.5
    # FP rate sanity: kept is within 1% of the true-match count
    assert kept <= true_matches * 1.01 + 10


def test_bloom_pruned_join_is_exact(spark):
    orders = load_table(spark, SF_CORRECT, "orders")
    cust = load_table(spark, SF_CORRECT, "customer").where(
        F.col("c_mktsegment") == "MACHINERY"
    )
    small = cust.select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = orders.join(small, "o_custkey").count()
    viabloom = SK.bloom_pruned_join(orders, small, "o_custkey").count()
    assert plain == viabloom


def test_bloom_probe_is_mapside(spark):
    """The probe must not shuffle the probed table: the only exchange
    in the plan belongs to the single-row sketch build (bit_or agg),
    and the sketch side reaches the probe via broadcast."""
    orders = load_table(spark, SF_CORRECT, "orders")
    small = load_table(spark, SF_CORRECT, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    bloom = SK.bloom_build(small, "o_custkey")
    plan = SK.bloom_probe(orders, "o_custkey", bloom)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row dim pattern
    # no SortMergeJoin / ShuffledHashJoin anywhere — membership is
    # expression-level work on the scan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_cms_upper_bound_property(spark):
    events = load_table(spark, SF_CORRECT, "events")
    cms = SK.cms_build(events, "user_id", depth=4, width=256)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.cms_estimate(exact.select("user_id"), cms, "user_id", depth=4, width=256)
    bad = (
        exact.join(est, "user_id")
        .where(F.col("cms_est") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0  # CMS never underestimates


def test_cms_merge_equals_single_build(spark):
    """Two half-sketches summed cell-wise == one full-data sketch —
    the property that makes daily incremental builds sound."""
    events = load_table(spark, SF_CORRECT, "events")
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    merged = (
        SK.cms_build(a, "user_id")
        .unionByName(SK.cms_build(b, "user_id"))
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = SK.cms_build(events, "user_id")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_hll_bound_holds(spark):
    events = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = SK.hll_group_cardinality(events, "day", "user_id")
    assert out.where(~F.col("est_within_bound")).count() == 0
    # the merged __ALL__ row exists exactly once
    assert out.where(F.col("day") == "__ALL__").count() == 1


def test_bloom_no_false_negatives_property(spark):
    """Hypothesis: for arbitrary bigint key sets (including negatives,
    zero, duplicates, and adversarial clusters around the hash modulus),
    every inserted key must pass the probe — the no-false-negative
    guarantee, independent of the fixture."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from avocado_spark.operators.sketches import bloom_build, bloom_probe

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1,
            max_size=60,
        )
    )
    def run(keys):
        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        bloom = bloom_build(df, "k", num_bits=1 << 14, num_hashes=4)
        kept = bloom_probe(df, "k", bloom, num_bits=1 << 14, num_hashes=4)
        assert kept.distinct().count() == df.distinct().count()

    run()
