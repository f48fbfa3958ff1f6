"""Hand-checked B-cubed clustering-evaluation cases (Bagga & Baldwin
1998): the exact integer milli contract — per-cell truncating
divisions, item-weighted sums — verified against worked arithmetic."""

from __future__ import annotations

from avocado_spark.operators.dedup import bcubed_cluster_eval


def _assign(spark, rows):
    return spark.createDataFrame(rows, "id long, pred long, gold long")


def test_bcubed_perfect_clustering_is_1000(spark):
    rows = [(1, 10, 10), (2, 10, 10), (3, 20, 20)]
    r = bcubed_cluster_eval(_assign(spark, rows)).first()
    assert (r["n_items"], r["precision_milli"], r["recall_milli"], r["f1_milli"]) == (
        3,
        1000,
        1000,
        1000,
    )


def test_bcubed_hand_worked_case(spark):
    """gold {1,2},{3,4,5}; pred {1,2,3},{4,5}:
    cells (p1,g1)=2, (p1,g2)=1, (p2,g2)=2; per-cell milli P =
    666/333/1000, R = 1000/333/666; item-weighted sums are both 3665
    → P = R = F1 = 733 milli."""
    rows = [(1, 1, 1), (2, 1, 1), (3, 1, 2), (4, 2, 2), (5, 2, 2)]
    r = bcubed_cluster_eval(_assign(spark, rows)).first()
    assert (r["precision_milli"], r["recall_milli"], r["f1_milli"]) == (733, 733, 733)


def test_bcubed_megacluster_precision_collapses(spark):
    """One predicted megacluster over 4 singleton golds: precision
    250 milli, recall 1000 — B-cubed punishes the blow-up pairwise
    metrics can mask."""
    rows = [(i, 1, i) for i in range(4)]
    r = bcubed_cluster_eval(_assign(spark, rows)).first()
    assert (r["precision_milli"], r["recall_milli"]) == (250, 1000)
    assert r["f1_milli"] == (2 * 250 * 1000) // 1250
