"""Unit semantics for the round-8 feature-engineering additions:
dup_span_coverage (cross-doc exact-substring spans), target_encoding_oof
(leakage-free folds), neyman_allocation (variance-optimal sampling plan).
"""

from __future__ import annotations

from avocado_spark.operators.relational import neyman_allocation, target_encoding_oof
from avocado_spark.operators.text import dup_span_coverage


def test_dup_span_merges_overlapping_windows(spark):
    # Docs 1 and 2 share the SAME 10-token prefix -> every k=4 window in
    # that prefix is duplicated; the 7 windows must merge into ONE span
    # covering exactly the 10 shared tokens. The distinct tails must not
    # be counted.
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1a tail1b tail1c"),
            (2, shared + " tail2a tail2b tail2c"),
            (3, "completely different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dup_span_coverage(docs, k=4, min_docs=2).collect()
    }
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_tokens"] == 10
    assert out[2]["dup_tokens"] == 10
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert abs(out[1]["dup_fraction"] - 10 / 13) < 1e-6


def test_dup_span_short_doc_and_intra_doc_repeat(spark):
    # A doc shorter than k emits no windows; intra-doc repetition alone
    # (min_docs=2 distinct docs) must NOT flag spans.
    docs = spark.createDataFrame(
        [
            (1, "a b c"),  # shorter than k=4
            (2, "x y z w x y z w x y z w"),  # self-repeats only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_coverage(docs, k=4).collect()}
    assert out[1]["dup_tokens"] == 0 and out[1]["n_tokens"] == 3
    assert out[2]["dup_tokens"] == 0


def test_target_encoding_excludes_own_fold(spark):
    # cat 'A': fold 0 has y=100, fold 1 has y=300. With smoothing=0 the
    # fold-0 encoding must equal fold 1's mean (3.0 dollars) and vice
    # versa — own-fold rows never contribute.
    df = spark.createDataFrame(
        [("A", 0, 100), ("A", 1, 300), ("B", 0, 500), ("B", 1, 700)],
        "cat string, fold int, y_cents long",
    )
    out = {
        (r["cat"], r["fold"]): r
        for r in target_encoding_oof(df, "cat", "y_cents", "fold", smoothing=0.0).collect()
    }
    assert out[("A", 0)]["oof_mean"] == 3.0
    assert out[("A", 1)]["oof_mean"] == 1.0
    assert out[("A", 0)]["encoded"] == 3.0
    assert out[("B", 1)]["oof_mean"] == 5.0


def test_target_encoding_smoothing_falls_back_to_global_mean(spark):
    # A category seen in only one fold has oof_count=0: oof_mean is NULL
    # and the smoothed encoding collapses to the global mean exactly.
    df = spark.createDataFrame(
        [("A", 0, 100), ("B", 0, 200), ("B", 1, 600)],
        "cat string, fold int, y_cents long",
    )
    out = {
        (r["cat"], r["fold"]): r
        for r in target_encoding_oof(df, "cat", "y_cents", "fold", smoothing=10.0).collect()
    }
    row = out[("A", 0)]
    assert row["oof_count"] == 0 and row["oof_mean"] is None
    assert abs(row["encoded"] - 3.0) < 1e-9  # global mean = 900/3 cents


def test_neyman_allocation_favors_high_variance_strata(spark):
    # Two equal-size strata; stratum 'hi' has 10x the spread of 'lo' ->
    # its allocation must be ~10x larger and the weights exact.
    rows = [("lo", v) for v in (100, 101, 102, 103)] + [
        ("hi", v) for v in (100, 110, 120, 130)
    ]
    df = spark.createDataFrame(rows, "stratum string, y long")
    out = {
        r["stratum"]: r
        for r in neyman_allocation(df, ["stratum"], "y", n_sample=100).collect()
    }
    assert out["hi"]["alloc_n"] + out["lo"]["alloc_n"] <= 100
    assert out["hi"]["alloc_n"] >= 9 * out["lo"]["alloc_n"]
    assert out["hi"]["stratum_n"] == 4
    # sd(lo) = sd of 100..103 step 1 -> sqrt(5/3); exact-integer partials
    import math

    assert abs(out["lo"]["stddev_y"] - round(math.sqrt(5 / 3), 6)) < 1e-9


def test_neyman_singleton_stratum_gets_zero_weight(spark):
    # n_h == 1 -> variance defined as 0 -> weight 0, allocation 0.
    df = spark.createDataFrame(
        [("a", 5), ("b", 1), ("b", 9)], "stratum string, y long"
    )
    out = {
        r["stratum"]: r
        for r in neyman_allocation(df, ["stratum"], "y", n_sample=10).collect()
    }
    assert out["a"]["weight_micro"] == 0 and out["a"]["alloc_n"] == 0
    assert out["b"]["alloc_n"] == 10


def test_decayed_heavy_hitters_piecewise_linear_decay(spark, tmp_path):
    # Anchor at the max ts; ages 0, H, 1.5H must weight 1.0, 0.5, 0.375
    # (piecewise-linear within each half-life, halved across periods).
    import datetime as dt

    h = 604800
    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, t0, 1, "now", 1.0, ""),
        (2, t0 - dt.timedelta(seconds=h), 1, "one_hl", 1.0, ""),
        (3, t0 - dt.timedelta(seconds=int(1.5 * h)), 1, "mid", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    from avocado_spark.queries import get_queries

    out = {
        r["event_type"]: r
        for r in get_queries()["decayed_heavy_hitters"](spark, str(tmp_path)).collect()
    }
    assert out["now"]["decayed_weight"] == 1.0
    assert out["one_hl"]["decayed_weight"] == 0.5
    assert out["mid"]["decayed_weight"] == 0.375
    assert out["now"]["rank"] == 1


def test_purged_folds_embargo_separates_train_from_test(spark, tmp_path):
    # 10 consecutive days, 1 event each, K=5 -> each fold tests 2 days;
    # the 1-day embargo on each side removes up to 2 more days from
    # train; totals must account for every event exactly once per fold.
    import datetime as dt

    t0 = dt.datetime(2025, 3, 1, tzinfo=dt.timezone.utc)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "e", 1.0, "") for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from avocado_spark.queries import get_queries

    out = get_queries()["purged_timeseries_folds"](spark, str(tmp_path)).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_test"] == 2
        assert r["n_test"] + r["n_embargo"] + r["n_train"] == 10
    # middle folds lose exactly 2 days to embargo; edge folds lose 1
    by_fold = {r["fold"]: r for r in out}
    assert by_fold[0]["n_embargo"] == 1 and by_fold[4]["n_embargo"] == 1
    assert by_fold[2]["n_embargo"] == 2
