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


def test_ari_hand_worked_case(spark):
    """Same 5-item case as the B-cubed hand check: P2=4, A2=B2=8,
    n2=20 → RI = 1000·12/20 = 600; ARI = 1000·(160−128)/(320−128) =
    32000 // 192 = 166."""
    from avocado_spark.operators.dedup import adjusted_rand_eval

    rows = [(1, 1, 1), (2, 1, 1), (3, 1, 2), (4, 2, 2), (5, 2, 2)]
    r = adjusted_rand_eval(_assign(spark, rows)).first()
    assert (r["n_items"], r["rand_milli"], r["ari_milli"]) == (5, 600, 166)


def test_ari_perfect_and_degenerate(spark):
    from avocado_spark.operators.dedup import adjusted_rand_eval

    perfect = [(1, 10, 10), (2, 10, 10), (3, 20, 20)]
    r = adjusted_rand_eval(_assign(spark, perfect)).first()
    assert (r["rand_milli"], r["ari_milli"]) == (1000, 1000)
    # all singletons on both sides: RI 1000 (all pairs agree-apart),
    # ARI undefined (chance == observed) -> NULL
    singles = [(i, i, i) for i in range(4)]
    r = adjusted_rand_eval(_assign(spark, singles)).first()
    assert r["rand_milli"] == 1000 and r["ari_milli"] is None


def test_ari_worse_than_chance_is_negative(spark):
    """Anti-correlated clustering scores BELOW 0: 4 items, gold
    {1,2},{3,4}, pred {1,3},{2,4} — zero agreeing together-pairs."""
    from avocado_spark.operators.dedup import adjusted_rand_eval

    rows = [(1, 1, 1), (2, 2, 1), (3, 1, 2), (4, 2, 2)]
    r = adjusted_rand_eval(_assign(spark, rows)).first()
    # P2=0, A2=B2=4, n2=12: num=2(0-16)=-32, den=12*8-32=64 -> -500
    assert r["ari_milli"] == -500
