"""Properties for the Pareto sweep and the partition fingerprint diff
that the oracle differential doesn't cover: the linear sweep equals the
quadratic dominance definition on adversarial inputs (duplicates, ties
along either axis), and the diff classifier is exact on synthetic
mutations."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.relational import (
    pareto_frontier_2d,
    partition_fingerprint_diff,
)


def _brute_frontier(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] >= a[1] and b[2] <= a[2] and (b[1] > a[1] or b[2] < a[2])
            for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_pareto_sweep_matches_brute_force(spark):
    # LCG-derived deterministic points with deliberate collisions on
    # both axes (mod 13 / mod 11 forces duplicate coordinates)
    rows = [(i, (i * 7919 + 3) % 13, (i * 104729 + 5) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = sorted(
        tuple(r) for r in pareto_frontier_2d(df, "x", "y").select("id", "x", "y").collect()
    )
    assert got == _brute_frontier(rows)


def test_pareto_keeps_duplicate_points(spark):
    # two identical optimal points: neither dominates the other (no
    # strict inequality) — both must survive
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 10, 1), (3, 5, 0), (4, 4, 5)], ["id", "x", "y"]
    )
    ids = {r["id"] for r in pareto_frontier_2d(df, "x", "y").collect()}
    assert ids == {1, 2, 3}


def test_partition_diff_classifies_exactly(spark):
    old = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("c", 4, 40)],
        ["part", "id", "v"],
    )
    new = spark.createDataFrame(
        # a unchanged, b value-changed, c removed, d added
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 31), ("d", 5, 50)],
        ["part", "id", "v"],
    )
    h = (F.col("id") * 131 + F.col("v")) % 1_000_000_007
    out = {
        r["part"]: r["status"]
        for r in partition_fingerprint_diff(old, new, "part", h).collect()
    }
    assert out == {"a": "unchanged", "b": "changed", "c": "removed", "d": "added"}


def test_partition_diff_same_count_different_rows_is_changed(spark):
    """A swap that keeps the row count must still flag 'changed' — the
    fingerprint, not the count, catches it."""
    old = spark.createDataFrame([("a", 1, 10), ("a", 2, 20)], ["part", "id", "v"])
    new = spark.createDataFrame([("a", 1, 10), ("a", 2, 21)], ["part", "id", "v"])
    h = (F.col("id") * 131 + F.col("v")) % 1_000_000_007
    [row] = partition_fingerprint_diff(old, new, "part", h).collect()
    assert row["status"] == "changed" and row["old_n"] == row["new_n"] == 2
