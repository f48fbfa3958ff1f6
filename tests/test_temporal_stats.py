"""Unit semantics for the round-8 monitoring additions: exact
two-sample KS (relational.ks_two_sample) and the mergeable
log2-histogram quantile sketch (sketches.log2_hist_quantiles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.relational import ks_two_sample
from avocado_spark.operators.sketches import log2_hist_quantiles


def _ks_brute(a: list[int], b: list[int]) -> tuple[int, int]:
    """(d_num, d_at_value) by brute force: max over distinct values of
    |n_b·cumA − n_a·cumB|, smallest attaining value."""
    na, nb = len(a), len(b)
    best, at = -1, None
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = abs(nb * ca - na * cb)
        if d > best:
            best, at = d, v
    return best, at


def test_ks_two_sample_matches_brute(spark):
    a = [1, 2, 2, 3, 7, 7, 9]
    b = [2, 3, 4, 4, 8]
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "v long, tag int")
    out = ks_two_sample(df, "v", F.col("tag") == 1).collect()[0]
    d_num, at = _ks_brute(a, b)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert int(out["d_num"]) == d_num
    assert out["d_at_value"] == at
    assert out["ks_bp"] == (10000 * d_num) // (len(a) * len(b))


def test_ks_two_sample_identical_samples_zero(spark):
    rows = [(v, t) for v in (1, 5, 5, 9) for t in (0, 1)]
    df = spark.createDataFrame(rows, "v long, tag int")
    out = ks_two_sample(df, "v", F.col("tag") == 1).collect()[0]
    assert int(out["d_num"]) == 0 and out["ks_bp"] == 0


def test_ks_two_sample_disjoint_full_separation(spark):
    # A entirely below B: D = 1 exactly at A's max
    rows = [(v, 1) for v in (1, 2, 3)] + [(v, 0) for v in (10, 11)]
    df = spark.createDataFrame(rows, "v long, tag int")
    out = ks_two_sample(df, "v", F.col("tag") == 1).collect()[0]
    assert int(out["d_num"]) == 3 * 2  # n_a * n_b
    assert out["ks_bp"] == 10000
    assert out["d_at_value"] == 3


def test_log2_hist_quantiles_exact_small_case(spark):
    # group g: values 1..8 — bins: 1→1, {2,3}→2, {4..7}→3, 8→4
    # cum: 1,3,7,8 of n=8; p50 first cum≥4 → bin 3 → est 7;
    # p95/p99 first cum≥7.6/7.92 → bin 4 → est 15
    df = spark.createDataFrame([("g", v) for v in range(1, 9)], "g string, v long")
    out = log2_hist_quantiles(df, ["g"], "v").collect()[0]
    assert out["n"] == 8
    assert out["est_p50_c"] == 7
    assert out["est_p95_c"] == 15 and out["est_p99_c"] == 15


def test_log2_hist_quantiles_relative_error_bound(spark):
    # sketch guarantee: exact quantile lies in the est's bin, so
    # est/2 < true quantile <= est for every group and percentile
    import random

    rng = random.Random(8)
    rows = [(f"g{i % 3}", rng.randrange(1, 50_000)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    est = {r["g"]: r for r in log2_hist_quantiles(df, ["g"], "v").collect()}
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for q in (50, 95, 99):
            true = vals[(q * n + 99) // 100 - 1]
            e = est[g][f"est_p{q}_c"]
            assert true <= e < 2 * (true + 1), (g, q, true, e)


def test_isotonic_calibrate_pools_violators(spark):
    from avocado_spark.operators.relational import isotonic_calibrate

    rows = [(1, 1, 10), (2, 5, 10), (3, 3, 10), (4, 4, 10), (5, 9, 10)]
    df = spark.createDataFrame(rows, "b int, p bigint, w bigint")
    out = {r["b"]: r["iso_rate"] for r in isotonic_calibrate(df, "b", "p", "w").collect()}
    # PAVA pools the 0.5/0.3/0.4 violation run into (5+3+4)/30 = 0.4
    assert out == {1: 0.1, 2: 0.4, 3: 0.4, 4: 0.4, 5: 0.9}
    # monotone non-decreasing
    vals = [out[b] for b in sorted(out)]
    assert vals == sorted(vals)


def test_isotonic_calibrate_matches_brute_minimax(spark):
    import itertools
    import random

    from avocado_spark.operators.relational import isotonic_calibrate

    rng = random.Random(88)
    rows = [(i, rng.randrange(0, 50), 50) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "b int, p bigint, w bigint")
    out = {r["b"]: r["iso_rate"] for r in isotonic_calibrate(df, "b", "p", "w").collect()}
    ps = {b: p for b, p, _ in rows}
    bs = sorted(ps)
    for i in bs:
        cand = []
        for j, k in itertools.product(bs, bs):
            if j <= i <= k:
                num = sum(ps[x] for x in bs if j <= x <= k)
                den = 50 * len([x for x in bs if j <= x <= k])
                cand.append((j, k, num / den))
        fit = max(
            min(a for jj, kk, a in cand if jj == j and kk >= i)
            for j in bs
            if j <= i
        )
        assert abs(out[i] - round(fit, 6)) < 1e-9, (i, out[i], fit)


def test_ks_two_sample_hypothesis_differential(spark):
    """Randomized differential vs the brute-force definition — Spark
    per example is slow, so a handful of drawn cases, no shrink-time
    deadline."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=25)

    @given(a=vals, b=vals)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def _case(a, b):
        rows = [(v, 1) for v in a] + [(v, 0) for v in b]
        df = spark.createDataFrame(rows, "v long, tag int")
        out = ks_two_sample(df, "v", F.col("tag") == 1).collect()[0]
        d_num, at = _ks_brute(a, b)
        assert int(out["d_num"]) == d_num
        assert out["d_at_value"] == at
        assert out["ks_bp"] == (10000 * d_num) // (len(a) * len(b))

    _case()


def test_weighted_quantile_matches_brute(spark):
    import random

    from avocado_spark.operators.relational import weighted_quantile

    rng = random.Random(42)
    rows = [
        (g, rng.randrange(1, 30), rng.randrange(1, 9))
        for g in ("a", "b")
        for _ in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    for qn, qd in ((1, 2), (9, 10)):
        got = {
            r["g"]: (r["wq_value"], r["total_weight"])
            for r in weighted_quantile(df, ["g"], "v", "w", qn, qd).collect()
        }
        for g in ("a", "b"):
            per = {}
            for gg, v, w in rows:
                if gg == g:
                    per[v] = per.get(v, 0) + w
            tot = sum(per.values())
            cum = 0
            for v in sorted(per):
                cum += per[v]
                if qd * cum >= qn * tot:
                    assert got[g] == (v, tot), (g, qn, qd, got[g], v, tot)
                    break
