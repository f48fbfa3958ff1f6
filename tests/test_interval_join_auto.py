"""interval_join 'auto' strategy: the broadcast-size guard must pick
broadcast for a small left side and fall back to the binned shuffle
join above the row bound (SURVEY §7 driver-memory contract)."""

from __future__ import annotations

from avocado_spark.operators import interval_join as IJ


def _toy(spark, n):
    return spark.range(n).selectExpr(
        "concat('chr', id % 2) AS contig",
        "id * 10 AS start",
        "id * 10 + 15 AS end",
        "id AS v_id",
    )


def test_auto_picks_broadcast_small(spark, monkeypatch):
    left, right = _toy(spark, 50), _toy(spark, 200)
    out = IJ.interval_join(left, right, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_auto_falls_back_binned(spark, monkeypatch):
    monkeypatch.setattr(IJ, "BROADCAST_MAX_ROWS", 10)
    left, right = _toy(spark, 50), _toy(spark, 200)
    out = IJ.interval_join(left, right, strategy="auto")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no explicit broadcast hint on the left: the join rides the
    # shuffle path (AQE may still locally broadcast tiny test data,
    # so assert the hint itself is absent from the optimized plan)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    # results identical between the two strategies
    a = sorted(map(tuple, IJ.interval_join(left, right, strategy="broadcast").collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b
