"""The approximate-quantile path (approx_percentile, the 100 TB
alternative to exact_group_quantiles) must land within its declared
rank-error bound of the exact rank statistic — evidence the scale path
is wired correctly, not just the oracle-checkable exact path."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.relational import exact_group_quantiles
from avocado_spark.session import load_table
from tests.conftest import SF_CORRECT


def test_approx_percentile_within_rank_error(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    eps = 0.01  # declared relative rank error (accuracy = 1/eps)
    approx = {
        r["event_type"]: (r["q50"], r["q90"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, int(1 / eps)).alias("q50"),
            F.percentile_approx("value", 0.9, int(1 / eps)).alias("q90"),
        )
        .collect()
    }
    # rank-error bound: the approximate quantile q̂ must be the exact
    # value at SOME rank within ±eps·n of the target rank — check by
    # counting how many values fall at or below q̂
    for q, col in ((0.5, 0), (0.9, 1)):
        for et, vals in approx.items():
            grp = ev.where(F.col("event_type") == et)
            n = grp.count()
            at_or_below = grp.where(F.col("value") <= vals[col]).count()
            target = q * n
            assert abs(at_or_below - target) <= 2 * eps * n + 1, (
                et, q, at_or_below, target, n
            )
    # tie the two implementations together: the EXACT q50 must also sit
    # inside the approximate sketch's rank band (same criterion applied
    # to the exact path — if either drifted, this breaks)
    exact = {
        r["event_type"]: r["q50"]
        for r in exact_group_quantiles(
            ev, ["event_type"], "value", "event_id", quantiles=(0.5,)
        ).collect()
    }
    for et, v50 in exact.items():
        grp = ev.where(F.col("event_type") == et)
        n = grp.count()
        at_or_below = grp.where(F.col("value") <= v50).count()
        assert abs(at_or_below - 0.5 * n) <= 2 * eps * n + 1, (et, at_or_below, n)
