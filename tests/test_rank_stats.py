"""Unit tests for the rank-statistics and graph-structure operators
added in r9 — the degenerate/adversarial cases the sf0.01 oracle
differential can't probe (all-ties, identical samples, regular
graphs, hub caps)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avocado_spark.operators.components import (
    degree_assortativity,
    edge_strength,
    jaccard_link_prediction,
)
from avocado_spark.operators.relational import mannwhitney_u, spearman_rho


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- MWU


def test_mwu_identical_samples_auc_5000(spark):
    """Same distribution in A and B → U_A = n_a·n_b/2 exactly, AUC
    5000 bp, and every value tied across groups feeds tie_cubes."""
    rows = [(v, g) for v in (1, 2, 3, 4, 5) for g in ("a", "b")]
    out = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
    ).first()
    assert (out["n_a"], out["n_b"]) == (5, 5)
    assert out["u2_a"] == 25  # 2·U_A = 2·(n_a·n_b/2)
    assert out["auc_bp"] == 5000
    assert out["tie_cubes"] == 5 * (2**3 - 2)


def test_mwu_total_separation(spark):
    """A strictly above B → U_A = n_a·n_b, AUC 10000; strictly below
    → 0. The doubled-rank bookkeeping must hit the exact extremes."""
    rows = [(v, "a") for v in (11, 12, 13)] + [(v, "b") for v in (1, 2)]
    hi = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
    ).first()
    assert hi["u2_a"] == 2 * 3 * 2 and hi["auc_bp"] == 10000
    lo = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "b"
    ).first()
    assert lo["u2_a"] == 0 and lo["auc_bp"] == 0 and lo["tie_cubes"] == 0


def test_mwu_midrank_ties_cross_group(spark):
    """Hand-checked midrank case: A={1,3}, B={3,5}. Ranks: 1→1,
    3,3→2.5 each, 5→4. R_A=3.5 → 2R_A=7, U2 = 7−2·3=1."""
    rows = [(1, "a"), (3, "a"), (3, "b"), (5, "b")]
    out = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
    ).first()
    assert out["u2_a"] == 1
    assert out["tie_cubes"] == 2**3 - 2


def test_mwu_empty_sample_is_null_not_div0(spark):
    """One-sided input (is_a matches everything / nothing): the effect
    size is undefined → auc_bp NULL, not an ANSI divide-by-zero; the
    counts still come back exact."""
    rows = [(v, "a") for v in (1, 2, 3)]
    out = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
    ).first()
    assert (out["n_a"], out["n_b"]) == (3, 0)
    assert out["auc_bp"] is None
    out = mannwhitney_u(
        _df(spark, rows, "v long, g string"), "v", F.col("g") == "zzz"
    ).first()
    assert (out["n_a"], out["n_b"]) == (0, 3)
    assert out["auc_bp"] is None and out["u2_a"] == 0


# ---------------------------------------------------------------- Spearman


def test_spearman_perfect_monotone(spark):
    """Any strictly monotone relation → rho ±1 exactly (rank space)."""
    up = _df(spark, [(i, i * i) for i in range(1, 9)], "x long, y long")
    assert spearman_rho(up, "x", "y").first()["rho"] == pytest.approx(1.0)
    dn = _df(spark, [(i, 100 - i * i) for i in range(1, 9)], "x long, y long")
    assert spearman_rho(dn, "x", "y").first()["rho"] == pytest.approx(-1.0)


def test_spearman_ties_match_scipy_formula(spark):
    """Tied midranks: x=(1,1,2), y=(10,20,30). x-ranks (1.5,1.5,3),
    y-ranks (1,2,3) → Pearson over ranks = +0.866025."""
    df = _df(spark, [(1, 10), (1, 20), (2, 30)], "x long, y long")
    assert spearman_rho(df, "x", "y").first()["rho"] == pytest.approx(
        0.866025, abs=1e-6
    )


def test_spearman_constant_series_is_null(spark):
    """Zero rank variance → rho undefined → NULL (ANSI /0 guarded)."""
    df = _df(spark, [(1, 10), (1, 20), (1, 30)], "x long, y long")
    assert spearman_rho(df, "x", "y").first()["rho"] is None


# ---------------------------------------------------------------- graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_assortativity_star_is_disassortative(spark):
    """A star graph is maximally disassortative: r = −1."""
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    row = degree_assortativity(e).first()
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_null(spark):
    """Degree-regular graph (cycle): zero variance → NULL, not a
    divide-by-zero crash."""
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    cyc = [(min(u, v), max(u, v)) for u, v in cyc]
    row = degree_assortativity(_edges(spark, cyc)).first()
    assert row["assortativity"] is None


def test_edge_strength_triangle_plus_tail(spark):
    """Triangle 0-1-2 with a tail 2-3: the three triangle edges get
    support 1; jaccard uses full degrees (node 2 has degree 3)."""
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    rows = {(r["u"], r["v"]): r for r in edge_strength(e).collect()}
    assert set(rows) == {(0, 1), (0, 2), (1, 2)}
    assert rows[(0, 1)]["support"] == 1
    # edge (0,1): du=dv=2, union=2+2-1=3 → 3333 bp
    assert rows[(0, 1)]["jaccard_bp"] == 3333
    # edge (0,2): du=2, dv=3 → 10000//4 = 2500
    assert rows[(0, 2)]["jaccard_bp"] == 2500


def test_link_prediction_path_and_hub_cap(spark):
    """Path 0-1-2: the only candidate is (0,2) via center 1. With the
    cap below center degree, the candidate disappears and the dropped
    count is reported."""
    e = _edges(spark, [(0, 1), (1, 2)])
    out = jaccard_link_prediction(e, top_k=10).collect()
    assert [(r["u"], r["v"], r["common"]) for r in out] == [(0, 2, 1)]
    assert out[0]["jaccard_bp"] == 10000  # union = 1+1-1
    stats: dict = {}
    capped = jaccard_link_prediction(
        e, top_k=10, max_center_degree=1, stats=stats
    ).collect()
    assert capped == []
    assert stats["dropped_centers"] == 1


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle: every 2-hop pair is already an edge → empty output."""
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    assert jaccard_link_prediction(e, top_k=10).collect() == []


def test_mannwhitney_hypothesis_differential(spark):
    """Randomized differential vs the textbook midrank definition —
    Spark per example is slow, so a handful of drawn cases."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=20)

    def _brute(a, b):
        allv = sorted(a + b)
        # midrank of value v = average position of its ties (1-based)
        first = {}
        for i, v in enumerate(allv, 1):
            first.setdefault(v, i)
        cnt = {v: allv.count(v) for v in set(allv)}
        rank2 = {v: 2 * first[v] + (cnt[v] - 1) for v in cnt}  # doubled midrank
        r2a = sum(rank2[v] for v in a)
        u2 = r2a - len(a) * (len(a) + 1)
        ties = sum(t**3 - t for t in cnt.values() if t > 1)
        return u2, ties

    @given(a=vals, b=vals)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def _case(a, b):
        rows = [(v, "a") for v in a] + [(v, "b") for v in b]
        out = mannwhitney_u(
            _df(spark, rows, "v long, g string"), "v", F.col("g") == "a"
        ).first()
        u2, ties = _brute(a, b)
        assert out["u2_a"] == u2, (a, b, out)
        assert out["tie_cubes"] == ties
        assert out["auc_bp"] == (10000 * u2) // (2 * len(a) * len(b))

    _case()


def test_spearman_hypothesis_differential(spark):
    """Randomized differential vs Pearson-over-midranks in Python."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pairs = st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=2,
        max_size=20,
    )

    def _rank2(xs):
        s = sorted(xs)
        first = {}
        for i, v in enumerate(s, 1):
            first.setdefault(v, i)
        cnt = {v: s.count(v) for v in set(s)}
        return [2 * first[v] + cnt[v] - 1 for v in xs]

    @given(data=pairs)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def _case(data):
        df = _df(spark, data, "x long, y long")
        out = spearman_rho(df, "x", "y").first()
        rx, ry = _rank2([x for x, _ in data]), _rank2([y for _, y in data])
        n = len(data)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        denx, deny = n * sxx - sx * sx, n * syy - sy * sy
        if denx == 0 or deny == 0:
            assert out["rho"] is None
        else:
            rho = (n * sxy - sx * sy) / math.sqrt(denx * deny)
            assert out["rho"] == pytest.approx(round(rho, 6), abs=1e-9)

    _case()
