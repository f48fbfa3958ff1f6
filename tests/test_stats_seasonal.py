"""Seasonal Mann–Kendall (Hirsch, Slack & Smith 1982) units — the grouped
sibling of test_stats_ext's mann_kendall cases: per-season S/VAR18
summed, pairs never cross seasons, distinct-(season, t) enforced."""

import math

import pytest


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _phi_2sided(z):
    return 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))


def test_seasonal_mk_hand_computed(spark):
    # season A: (0,1),(7,2),(14,3) strictly increasing -> S_A = 3,
    # VAR18_A = 3*2*11 = 66 (no ties); season B: (1,5),(8,5) all tied
    # -> S_B = 0, VAR18_B = 2*1*9 - 2*1*9 = 0. Totals: S = 3,
    # VAR18 = 66, n = 5, seasons = 2; z = (3-1)/sqrt(66/18) ~ 1.0445.
    from avocado_spark.operators.stats import seasonal_mann_kendall

    s = _df(
        spark,
        [(0, 0, 1), (0, 7, 2), (0, 14, 3), (1, 1, 5), (1, 8, 5)],
        "g long, d long, y long",
    )
    out = seasonal_mann_kendall(s, "g", "d", "y").first()
    assert (out["n_points"], out["n_seasons"]) == (5, 2)
    assert (out["s_stat"], out["var18"]) == (3, 66)
    z = 2.0 / math.sqrt(66.0 / 18.0)
    assert out["p_value"] == pytest.approx(_phi_2sided(z), abs=5e-4)


def test_seasonal_mk_pairs_never_cross_seasons(spark):
    # two seasons, each constant within but very different across:
    # cross-season pairs would make |S| large; within-season S = 0
    from avocado_spark.operators.stats import seasonal_mann_kendall

    rows = [(g, t, 100 * g) for g in (0, 1) for t in (g, g + 7, g + 14)]
    s = _df(spark, rows, "g long, d long, y long")
    out = seasonal_mann_kendall(s, "g", "d", "y").first()
    assert out["s_stat"] == 0
    assert out["var18"] == 0  # all tied within each season
    assert out["p_value"] is None


def test_seasonal_mk_rejects_duplicate_season_t(spark):
    from avocado_spark.operators.stats import seasonal_mann_kendall

    s = _df(
        spark,
        [(0, 0, 1), (0, 0, 2), (0, 7, 3)],
        "g long, d long, y long",
    )
    with pytest.raises(ValueError, match="duplicate \\(season, t\\)"):
        seasonal_mann_kendall(s, "g", "d", "y")


def test_seasonal_mk_single_season_matches_plain_mk(spark):
    # with ONE season the seasonal statistic IS plain Mann-Kendall
    from avocado_spark.operators.stats import mann_kendall, seasonal_mann_kendall

    rows = [(i, v) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    plain = mann_kendall(
        _df(spark, rows, "d long, y long"), "d", "y"
    ).first()
    seas = seasonal_mann_kendall(
        _df(spark, [(0, d, y) for d, y in rows], "g long, d long, y long"),
        "g",
        "d",
        "y",
    ).first()
    assert (seas["s_stat"], seas["var18"]) == (plain["s_stat"], plain["var18"])
    assert seas["p_value"] == plain["p_value"]
    assert seas["n_seasons"] == 1


def test_bounded_group_pairs_cap(spark):
    from avocado_spark.operators.stats import bounded_group_pairs

    s = _df(spark, [(0, i, i) for i in range(20)], "g long, d long, y long")
    with pytest.raises(ValueError, match="> cap"):
        bounded_group_pairs(s, ["g"], "d", ["y"], max_points=10)
