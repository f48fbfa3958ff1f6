"""Sketch-accuracy bounds for the cardinality/frequency scale paths:
approx_count_distinct (HyperLogLog++) must land within its declared
relative-error bound of the exact distinct count, per group and
globally — evidence the 100 TB alternative to exact distinct is wired
with honest error bars, like the approx_percentile rank-error test.

Also bounds the int8 quantized-ANN recall (the memory-scale path) so
a quantizer regression shows up as a recall drop, not silently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.session import load_table
from tests.conftest import SF_CORRECT


def test_hll_distinct_within_declared_rsd(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    rsd = 0.02
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd).alias("approx_d"),
            F.countDistinct("l_orderkey").alias("exact_d"),
        )
        .collect()
    )
    assert got, "no groups"
    for r in got:
        # HLL++ error is probabilistic at the declared rsd; 5 sigma
        # on a fixed dataset is a deterministic regression gate
        assert abs(r.approx_d - r.exact_d) <= 5 * rsd * r.exact_d + 1, (
            r.l_returnflag,
            r.approx_d,
            r.exact_d,
        )
    # global cardinality, tighter default sketch
    g = li.agg(
        F.approx_count_distinct("l_partkey", rsd).alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    ).first()
    assert abs(g.a - g.e) <= 5 * rsd * g.e + 1, g


def test_int8_recall_floor(spark):
    """Quantizing to int8 must keep recall@5 high on the synthetic
    embeddings — a quantizer bug (wrong scale, truncation) craters
    this immediately."""
    from avocado_spark.operators.similarity import recall_eval

    emb = load_table(spark, SF_CORRECT, "embeddings")
    r = recall_eval(emb, emb.where(F.col("vec_id") < 25), k=5, method="int8")
    mean_recall = r.agg(F.avg("recall")).first()[0]
    assert mean_recall >= 0.8, mean_recall


def test_centroids_match_numpy(spark):
    """Fixed-point centroid sums must equal a numpy replay to the
    rounded digit."""
    import numpy as np

    from avocado_spark.operators.similarity import embedding_centroids

    emb = load_table(spark, SF_CORRECT, "embeddings")
    got = {
        (r.label, r.idx): (r.n, r.centroid)
        for r in embedding_centroids(emb).collect()
    }
    pdf = emb.select("label", "embedding").toPandas()
    for label, g in pdf.groupby("label"):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        # Spark rounds half away from zero; np.round is half-to-even
        scaled = mat * 1_000_000
        q = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
        for idx in range(mat.shape[1]):
            n, c = got[(label, idx)]
            assert n == len(g)
            # compare to the unrounded replay: Spark's final 6-dp round
            # is half-away-from-zero, Python's is half-to-even, so an
            # exact .5 boundary differs by one ulp of the 6th digit
            want = q[:, idx].sum() / (len(g) * 1_000_000.0)
            assert abs(c - want) <= 5.000001e-7, (label, idx, c, want)


def test_kmv_estimates_track_exact_counts(spark):
    """KMV estimator property: with k=64 over groups of ~500 distinct
    keys, union and overlap estimates land within ~35% of exact (KMV
    rel-err ≈ 1/sqrt(k-1) ≈ 13%; the bound leaves margin for the small
    fixture). The sketch itself must hold ≤ k rows per group."""
    from pyspark.sql import functions as F

    from avocado_spark.operators.sketches import kmv_pairwise_overlap, kmv_sketch

    df = spark.range(3000).select(
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
        # overlapping key spaces: a = multiples of 3 in [0,3000) mapped
        # to id/2 (~500 distinct even-ish keys), b = id % 800
        F.when(F.col("id") % 3 == 0, (F.col("id") / 2).cast("long"))
        .otherwise(F.col("id") % 800)
        .alias("k"),
    )
    sk = kmv_sketch(df, "g", "k", k=64)
    per = {r["g"]: r["n"] for r in sk.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 64 for v in per.values())
    exact_a = df.where("g = 'a'").select("k").distinct().count()
    exact_b = df.where("g = 'b'").select("k").distinct().count()
    exact_union = df.select("k").distinct().count()
    ov = kmv_pairwise_overlap(df, "g", "k", k=64).collect()
    assert len(ov) == 1
    row = ov[0]
    exact_overlap = exact_a + exact_b - exact_union
    assert abs(row["est_union"] - exact_union) <= 0.35 * exact_union, row
    assert abs(row["est_overlap"] - exact_overlap) <= 0.35 * exact_union, row


def test_log2_hist_rejects_negative_values(spark):
    """Negative inputs must fail loudly: Spark would otherwise wrap
    shiftleft(1, 64) to 1 while DuckDB raises — a silent cross-engine
    divergence (r8 advice)."""
    import pytest

    from avocado_spark.operators.sketches import log2_hist_quantiles

    df = spark.createDataFrame([("a", 5), ("a", -1)], "g string, v long")
    with pytest.raises(Exception, match="non-negative"):
        log2_hist_quantiles(df, ["g"], "v").collect()


def test_log2_hist_zero_is_binned_not_rejected(spark):
    from avocado_spark.operators.sketches import log2_hist_quantiles

    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 7)], "g string, v long"
    )
    row = log2_hist_quantiles(df, ["g"], "v", quantiles=(50,)).collect()[0]
    assert row["n"] == 3 and row["est_p50_c"] == 1  # 0 and 1 share bin 1
