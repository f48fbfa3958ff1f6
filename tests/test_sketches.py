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
