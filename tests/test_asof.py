"""asof_join unit semantics: inclusive at-or-before match, left-outer
nulls, deterministic equal-ts tie-break, tolerance horizon."""

from __future__ import annotations

from avocado_spark.operators.relational import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3"), (3, 10, "p4")],
        "user long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 100, 11, 2.0), (1, 150, 12, 3.0), (2, 60, 13, 4.0)],
        "user long, ts long, rid long, val double",
    )
    return left, right


def test_asof_basic(spark):
    left, right = _fixture(spark)
    out = {
        r["tag"]: (r["r_rid"], r["r_ts"], r["r_val"])
        for r in asof_join(
            left, right, keys=["user"], ts_col="ts", right_cols=["rid", "val"]
        ).collect()
    }
    # inclusive: equal-ts right row matches; tie at ts=100 -> max rid
    assert out["p1"] == (11, 100, 2.0)
    # most recent prior, not just any: ts=200 sees the 150 row
    assert out["p2"] == (12, 150, 3.0)
    # right row AFTER the left ts must not match
    assert out["p3"] == (None, None, None)
    # user with no right rows at all
    assert out["p4"] == (None, None, None)


def test_asof_tolerance(spark):
    left, right = _fixture(spark)
    # interval arithmetic needs timestamps; rebuild with timestamp ts
    from pyspark.sql import functions as F

    lt = left.withColumn("ts", F.timestamp_seconds("ts"))
    rt = right.withColumn("ts", F.timestamp_seconds("ts"))
    out = {
        r["tag"]: r["r_rid"]
        for r in asof_join(
            lt, rt, keys=["user"], ts_col="ts", right_cols=["rid", "val"],
            tolerance="30 seconds",
        ).collect()
    }
    assert out["p1"] == 11      # same instant, within horizon
    assert out["p2"] is None    # 150 is 50s before 200 -> outside 30s


def test_asof_matches_pandas_merge_asof_property(spark):
    """Property differential: on randomized inputs, asof_join must agree
    with pandas.merge_asof (direction='backward', exact matches
    allowed) — the de-facto semantics reference for as-of joins. The
    right side is pre-sorted by (ts, rid) so merge_asof's last-wins
    tie-break coincides with asof_join's max-struct tie-break (rid is
    the first payload column)."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    ts_vals = st.integers(min_value=0, max_value=30)
    keys = st.integers(min_value=0, max_value=3)

    @settings(max_examples=15, deadline=None)
    @given(
        lrows=st.lists(st.tuples(keys, ts_vals), min_size=1, max_size=25),
        rrows=st.lists(st.tuples(keys, ts_vals), min_size=0, max_size=25),
    )
    def check(lrows, rrows):
        lpdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lrows)],
            columns=["user", "ts", "lid"],
        ).astype("int64")
        rpdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(rrows)],
            columns=["user", "ts", "rid"],
        ).astype("int64")
        left = spark.createDataFrame(lpdf)
        right = (
            spark.createDataFrame(rpdf)
            if len(rpdf)
            else spark.createDataFrame([], "user long, ts long, rid long")
        )
        got = {
            r["lid"]: r["r_rid"]
            for r in asof_join(
                left, right, keys=["user"], ts_col="ts", right_cols=["rid"]
            ).collect()
        }
        lsort = lpdf.sort_values("ts", kind="stable")
        rsort = rpdf.sort_values(["ts", "rid"], kind="stable")
        merged = pd.merge_asof(
            lsort, rsort, on="ts", by="user", direction="backward",
            allow_exact_matches=True, suffixes=("", "_r"),
        )
        want = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
        assert got == want

    check()
