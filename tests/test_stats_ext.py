"""Unit tests for the r10b hypothesis-testing / robust-trend family
(operators/stats.py + components.modularity) — hand-computed known
values and the degenerate cases (zero variance, empty samples, all
ties, one community) that the sf0.01 oracle differential can't probe.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from avocado_spark.operators.components import modularity
from avocado_spark.operators.stats import (
    acf,
    bh_fdr,
    bounded_self_pairs,
    cramers_v,
    jsd_vs_corpus,
    kendall_tau_b,
    theil_sen,
    welch_t,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- Welch


def _welch_reference(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return t, dof


def test_welch_known_values(spark):
    a, b = [1, 2, 3, 4], [2, 4, 6, 8, 10]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    out = welch_t(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
    ).first()
    t_ref, df_ref = _welch_reference(a, b)
    assert (out["n_a"], out["n_b"]) == (4, 5)
    assert out["mean_a"] == pytest.approx(2.5)
    assert out["mean_b"] == pytest.approx(6.0)
    assert out["t_stat"] == pytest.approx(t_ref, abs=1e-6)
    assert out["df_welch"] == pytest.approx(df_ref, abs=1e-3)


def test_welch_undefined_on_tiny_or_constant(spark):
    # one row in A → t undefined → NULL (never an ANSI /0)
    out = welch_t(
        _df(spark, [(1, "a"), (2, "b"), (3, "b")], "v long, g string"),
        "v",
        F.col("g") == "a",
    ).first()
    assert out["t_stat"] is None and out["df_welch"] is None
    # both samples constant → se² = 0 → NULL
    out2 = welch_t(
        _df(
            spark,
            [(5, "a"), (5, "a"), (7, "b"), (7, "b")],
            "v long, g string",
        ),
        "v",
        F.col("g") == "a",
    ).first()
    assert out2["t_stat"] is None


# ---------------------------------------------------------------- Cramér


def test_cramers_v_perfect_association(spark):
    rows = [(0, 0), (0, 0), (1, 1), (1, 1)]
    out = cramers_v(_df(spark, rows, "a long, b long"), "a", "b").first()
    assert out["chi2"] == pytest.approx(4.0)
    assert out["dof"] == 1
    assert out["cramers_v"] == pytest.approx(1.0)


def test_cramers_v_degenerate_single_level(spark):
    rows = [(0, 0), (0, 1)]
    out = cramers_v(_df(spark, rows, "a long, b long"), "a", "b").first()
    assert out["cramers_v"] is None  # min(r,c) < 2 → undefined


# ---------------------------------------------------------------- ACF


def test_acf_alternating_series(spark):
    # x = 0,1,0,1,0,1 → r(1) = −5/6, r(2) = +4/6 (biased-denominator ACF)
    rows = [(t, t % 2) for t in range(6)]
    out = {
        r["lag"]: r
        for r in acf(
            _df(spark, rows, "t long, x long"), "t", "x", [1, 2, 10]
        ).collect()
    }
    assert out[1]["acf_r"] == pytest.approx(-5 / 6, abs=1e-6)
    assert out[2]["acf_r"] == pytest.approx(4 / 6, abs=1e-6)
    # lag beyond the series → no terms → NULL, row still present
    assert out[10]["n_terms"] == 0 and out[10]["acf_r"] is None


def test_acf_constant_series_null(spark):
    rows = [(t, 7) for t in range(5)]
    out = acf(_df(spark, rows, "t long, x long"), "t", "x", [1]).first()
    assert out["acf_r"] is None  # zero variance → undefined


# ---------------------------------------------------------------- pairs


def test_bounded_self_pairs_count_and_cap(spark):
    s = _df(spark, [(i, i * i) for i in range(10)], "t long, y long")
    p = bounded_self_pairs(s, "t", ["y"])
    assert p.count() == 45
    # ordered: left endpoint strictly before right
    assert p.where(F.col("l_t") >= F.col("r_t")).count() == 0
    with pytest.raises(ValueError, match="cap"):
        bounded_self_pairs(s, "t", ["y"], max_points=5)


# ---------------------------------------------------------------- Kendall


def test_kendall_perfect_and_ties(spark):
    out = kendall_tau_b(
        _df(spark, [(0, 1, 1), (1, 2, 2), (2, 3, 3)], "t long, x long, y long"),
        "t",
        "x",
        "y",
    ).first()
    assert out["tau_b"] == pytest.approx(1.0)
    # x = [1,1,2], y = [1,2,3]: nc=2, nd=0, ties_x=1 → τ = 2/√6
    out2 = kendall_tau_b(
        _df(spark, [(0, 1, 1), (1, 1, 2), (2, 2, 3)], "t long, x long, y long"),
        "t",
        "x",
        "y",
    ).first()
    assert (out2["concordant"], out2["discordant"]) == (2, 0)
    assert (out2["ties_x"], out2["ties_y"]) == (1, 0)
    assert out2["tau_b"] == pytest.approx(2 / math.sqrt(6), abs=1e-6)


def test_kendall_all_tied_null(spark):
    out = kendall_tau_b(
        _df(spark, [(0, 1, 5), (1, 1, 5), (2, 1, 5)], "t long, x long, y long"),
        "t",
        "x",
        "y",
    ).first()
    assert out["tau_b"] is None


# ---------------------------------------------------------------- Theil–Sen


def test_theil_sen_exact_line(spark):
    s = _df(spark, [(0, 0), (1, 2), (2, 4)], "d long, y long")
    out = theil_sen(s, "d", "y").first()
    assert out["slope"] == pytest.approx(2.0)
    assert out["intercept"] == pytest.approx(0.0)
    assert (out["n_points"], out["n_pairs"]) == (3, 3)


def test_theil_sen_outlier_robust(spark):
    # y = x except one blowout point; OLS slope would be ~9, Theil–Sen 1
    s = _df(spark, [(0, 0), (1, 1), (2, 2), (3, 30)], "d long, y long")
    out = theil_sen(s, "d", "y").first()
    assert out["slope"] == pytest.approx(1.0)
    assert out["intercept"] == pytest.approx(0.0)


# ---------------------------------------------------------------- BH FDR


def test_bh_fdr_step_up(spark):
    rows = [(1, 0.01), (2, 0.02), (3, 0.5), (4, 0.04)]
    out = {
        r["id"]: r
        for r in bh_fdr(
            _df(spark, rows, "id long, p double"), ["id"], "p"
        ).collect()
    }
    # m=4, α=.05: cutoffs .0125/.025/.0375/.05 → k*=2 (p=.04 > .0375)
    assert out[1]["rejected"] and out[2]["rejected"]
    assert not out[3]["rejected"] and not out[4]["rejected"]
    assert out[1]["p_rank"] == 1 and out[4]["p_rank"] == 3
    assert all(r["m_tests"] == 4 for r in out.values())


def test_bh_fdr_none_rejected(spark):
    rows = [(1, 0.9), (2, 0.8)]
    out = bh_fdr(_df(spark, rows, "id long, p double"), ["id"], "p").collect()
    assert not any(r["rejected"] for r in out)


# ---------------------------------------------------------------- JSD


def test_jsd_single_source_is_zero(spark):
    rows = [("s1", "a", 3), ("s1", "b", 1)]
    out = jsd_vs_corpus(
        _df(spark, rows, "source string, token string, cnt long"),
        "source",
        "token",
        "cnt",
    ).first()
    assert out["jsd_bits"] == pytest.approx(0.0)
    assert out["n_tokens"] == 4 and out["vocab"] == 2


def test_jsd_disjoint_sources(spark):
    # P={a:1}, corpus={a:.5, b:.5} → JSD = 0.311278 bits (closed form)
    rows = [("s1", "a", 1), ("s2", "b", 1)]
    out = {
        r["source"]: r["jsd_bits"]
        for r in jsd_vs_corpus(
            _df(spark, rows, "source string, token string, cnt long"),
            "source",
            "token",
            "cnt",
        ).collect()
    }
    expect = 0.5 * (
        math.log2(1 / 0.75) + 0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(2)
    )
    assert out["s1"] == pytest.approx(expect, abs=1e-6)
    assert out["s2"] == pytest.approx(expect, abs=1e-6)


# ---------------------------------------------------------------- modularity


def _edges(spark, pairs):
    return _df(spark, pairs, "u long, v long")


def test_modularity_two_triangles(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)])
    lab = _df(
        spark,
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "node long, community long",
    )
    out = modularity(e, lab).first()
    assert out["n_edges"] == 6 and out["intra_edges"] == 6
    assert out["n_communities"] == 2
    # Q = (4·6·6 − (6²+6²)) / (4·36) = 0.5
    assert out["modularity"] == pytest.approx(0.5)


def test_modularity_one_community_is_zero(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)])
    lab = _df(
        spark,
        [(n, 1) for n in range(1, 7)],
        "node long, community long",
    )
    out = modularity(e, lab).first()
    assert out["modularity"] == pytest.approx(0.0)


def test_modularity_no_leaked_persists(spark):
    """The tracked-checkpoint discipline: after the result materializes,
    only the 1-row result block remains (released by release_result)."""
    from avocado_spark.operators.components import release_result

    def _ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = _ids()
    e = _edges(spark, [(1, 2), (2, 3)])
    lab = _df(spark, [(1, 1), (2, 1), (3, 1)], "node long, community long")
    stats: dict = {}
    out = modularity(e, lab, stats=stats)
    out.collect()
    leaked = _ids() - before
    assert leaked == stats["residual_rdd_ids"]
    release_result(spark, stats["residual_rdd_ids"])
    assert _ids() - before == set()
