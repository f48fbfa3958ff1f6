"""Sampled-k-means IVF quantizer: the trained codebook must not lose
recall vs the first-N stand-in on the evaluation sample (the VERDICT
r02 'honest IVF contract' ask), and training must be deterministic
across invocations (differential-oracle contract)."""

from __future__ import annotations

from avocado_spark.queries import get_queries
from tests.conftest import SF_CORRECT


def test_kmeans_recall_at_least_first_n(spark):
    q = get_queries()["ann_ivf_kmeans_recall"]
    rows = q(spark, SF_CORRECT).collect()
    assert rows
    mean_first = sum(r["recall_first_n"] for r in rows) / len(rows)
    mean_kmeans = sum(r["recall_kmeans"] for r in rows) / len(rows)
    assert mean_kmeans >= mean_first, (mean_kmeans, mean_first)


def test_train_centroids_deterministic(spark):
    from avocado_spark.operators.similarity import train_ivf_centroids
    from avocado_spark.session import load_table

    emb = load_table(spark, SF_CORRECT, "embeddings")
    a = {r["c_id"]: r["c_v"] for r in train_ivf_centroids(emb).collect()}
    b = {r["c_id"]: r["c_v"] for r in train_ivf_centroids(emb).collect()}
    assert a == b
    assert len(a) == 8
    # trained centroids moved away from the raw init vectors
    init = {
        r["vec_id"]: [round(x * 1_000_000.0) for x in r["embedding"]]
        for r in emb.where("vec_id < 8").collect()
    }
    moved = sum(1 for c in a if list(a[c]) != [float(x) for x in init[c]])
    assert moved >= 1


def test_multiprobe_beats_single_probe_recall(spark):
    """Multi-probe (bucket + 8 bit-flips) must dominate single-bucket
    SRP recall at equal index size — the point of probing."""
    from pyspark.sql import functions as F

    from avocado_spark.operators import similarity as SIM
    from avocado_spark.session import load_table
    from tests.conftest import SF_CORRECT

    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.where(F.col("vec_id") < 25)
    single = SIM.recall_eval(emb, q, k=5, method="srp").agg(
        F.sum("n_hits"), F.sum("n_exact")
    ).first()
    multi = SIM.recall_eval(emb, q, k=5, method="srp_multi").agg(
        F.sum("n_hits"), F.sum("n_exact")
    ).first()
    r_single = single[0] / single[1]
    r_multi = multi[0] / multi[1]
    assert r_multi >= r_single
    # random near-orthogonal embeddings are LSH's worst case (single-
    # probe lands ~0.02 here); the probes must still lift recall hard
    assert r_multi >= 0.1
