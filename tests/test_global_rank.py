"""relational.global_rank — the two-phase (frozen sampled boundaries
→ deterministic bucket id → parallel per-bucket window → broadcast
offset add) replacement for unpartitioned Window.orderBy. Differential
against the single-task window on every mode, plus the plan and
memory-lifecycle properties that justify it."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from avocado_spark.operators.relational import global_rank


def _df(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") * 37 % 701).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
    )


def _same(a, b, cols):
    return (
        a.select(*cols).exceptAll(b.select(*cols)).count() == 0
        and a.count() == b.count()
    )


def test_matches_global_window_asc(spark):
    df = _df(spark)
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    got = global_rank(df, [F.col("v"), F.col("k")], "r")
    assert _same(exp, got, ["v", "k", "r"])


def test_matches_desc_with_cumsum(spark):
    df = _df(spark)
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    exp = df.withColumn("r", F.row_number().over(w)).withColumn(
        "c",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    got = global_rank(
        df, [(F.col("v"), "desc"), F.col("k")], "r", cumsum_cols={"c": "v"}
    )
    assert _same(exp, got, ["v", "k", "r", "c"])


def test_matches_grouped_window(spark):
    df = _df(spark)
    exp = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("v", "k"))
    )
    got = global_rank(
        df, [F.col("v"), F.col("k")], "r", partition_cols=["g"]
    )
    assert _same(exp, got, ["g", "v", "k", "r"])


def test_degenerate_bucket_counts(spark):
    df = _df(spark, n=7)
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    for buckets in (1, 2, 64):  # fewer rows than buckets, single bucket
        got = global_rank(df, [F.col("v"), F.col("k")], "r", buckets=buckets)
        assert _same(exp, got, ["v", "k", "r"]), buckets


def test_empty_input(spark):
    df = _df(spark).where(F.lit(False))
    assert global_rank(df, [F.col("v"), F.col("k")], "r").count() == 0


def test_plan_is_scale_safe(spark):
    """The whole point: no single-partition exchange, no nested-loop
    join — every stage is parallel. The frozen-boundary design also
    removed the full-table RANGE exchange (bucket ids are a codegen'd
    comparison against plan literals): the only exchanges left are the
    hash partitionings of the window and the tiny offset aggregation."""
    got = global_rank(_df(spark), [F.col("v"), F.col("k")], "r")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_nullable_partition_col_matches_window(spark):
    """NULL group keys: groupBy treats NULL as a real group, but a
    name-list join is null-unsafe — the offset join must be eqNullSafe
    or null-group ranks restart in every bucket (the r6 advice
    regression)."""
    df = spark.range(3000).select(
        (F.col("id") * 37 % 701).alias("v"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("g"),
        F.col("id").alias("k"),
    )
    exp = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("v", "k"))
    )
    got = global_rank(
        df, [F.col("v"), F.col("k")], "r", partition_cols=["g"]
    )
    assert _same(exp, got, ["g", "v", "k", "r"])


def test_nullable_partition_col_with_cumsum(spark):
    df = spark.range(2000).select(
        (F.col("id") * 13 % 211).alias("v"),
        F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id") % 2).alias("g"),
        F.col("id").alias("k"),
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    exp = df.withColumn("r", F.row_number().over(w)).withColumn(
        "c",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    got = global_rank(
        df,
        [F.col("v"), F.col("k")],
        "r",
        partition_cols=["g"],
        cumsum_cols={"c": "v"},
    )
    assert _same(exp, got, ["g", "v", "k", "r", "c"])


def test_non_numeric_shuffle_partitions_conf(spark):
    """Some runtimes surface spark.sql.shuffle.partitions as a
    non-numeric sentinel ('auto'); the bucket-count parse must fall
    back to defaultParallelism instead of raising. Spark 4 validates
    the conf at set-time so the sentinel is simulated with a stub."""
    from avocado_spark.operators.relational import _default_buckets

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key, default=None):
            return self._v

    class _Sess:
        def __init__(self, v, sc):
            self.conf = _Conf(v)
            self.sparkContext = sc

    assert _default_buckets(_Sess("16", spark.sparkContext)) == 16
    assert (
        _default_buckets(_Sess("auto", spark.sparkContext))
        == spark.sparkContext.defaultParallelism
    )
    assert _default_buckets(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_no_cachemanager_pinning(spark):
    """The r6 persist leak: global_rank must not register anything in
    the session CacheManager — nothing session-pinned. Other tests in
    the shared session may legitimately leave cached fixtures, so
    clear first (cache is a perf artifact, never correctness)."""
    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty(), "cache not empty after clearCache"
    got = global_rank(_df(spark), [F.col("v"), F.col("k")], "r")
    got.count()
    assert cache_mgr.isEmpty(), (
        "global_rank pinned a table in the CacheManager (session-lifetime leak)"
    )


def test_no_persistent_rdds(spark):
    """The frozen-boundaries design needs NO materialization at all:
    running a global_rank query must leave zero RDD-level persisted
    blocks behind (the r6 design pinned the range-partitioned input
    for the session lifetime)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    got = global_rank(_df(spark), [F.col("v"), F.col("k")], "r")
    got.count()
    assert jsc.getPersistentRDDs().size() == before, (
        "global_rank left persisted RDD blocks behind"
    )


def test_reexecution_is_deterministic(spark):
    """The r6 nondeterminism bug: range partitioning re-samples per
    execution, so two evaluations of the same plan could disagree on
    bucket boundaries and corrupt ranks. The boundaries are now frozen
    literals in the plan — collecting the SAME DataFrame twice (and
    the rank/count subtrees within one execution) must agree exactly."""
    got = global_rank(
        _df(spark), [F.col("v"), F.col("k")], "r", cumsum_cols={"c": "v"}
    )
    a = sorted((r["k"], r["r"], r["c"]) for r in got.collect())
    b = sorted((r["k"], r["r"], r["c"]) for r in got.collect())
    assert a == b
    exp = _df(spark).withColumn(
        "r", F.row_number().over(Window.orderBy("v", "k"))
    )
    assert _same(exp, got, ["v", "k", "r"])


def test_null_order_keys_match_window(spark):
    """NULLs in the order column: repartitionByRange and Window.orderBy
    must agree on NULLS FIRST ascending for the two-phase rank to be a
    drop-in replacement."""
    df = spark.range(2000).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") * 37 % 701).alias("v"),
        F.col("id").alias("k"),
    )
    exp = df.withColumn("r", F.row_number().over(Window.orderBy("v", "k")))
    got = global_rank(df, [F.col("v"), F.col("k")], "r")
    assert _same(exp, got, ["v", "k", "r"])


def test_frozen_range_ids_interior_buckets_nonempty(spark):
    """frozen_range_ids guarantees every bucket >= 1 is non-empty
    (each boundary is a real sampled row that sorts into its own
    bucket) — the property the encoding advisor's adjacent-bucket
    carry stitch depends on. Also: ids are contiguous and ascend with
    the sort order."""
    from avocado_spark.operators.relational import frozen_range_ids

    df = spark.range(20_000).select(
        (F.col("id") * 131 % 9973).alias("v"), F.col("id").alias("k")
    )
    out, nb = frozen_range_ids(df, [F.col("v"), F.col("k")], id_col="_pid")
    per = {
        r["_pid"]: (r["n"], r["lo"], r["hi"])
        for r in out.groupBy("_pid")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert nb >= 2, "fixture should produce multiple buckets"
    for pid in range(1, nb):
        assert pid in per and per[pid][0] > 0, f"bucket {pid} empty"
    # ranges: bucket pid's min v must be >= bucket pid-1's max v
    for pid in range(1, nb):
        if pid - 1 in per:
            assert per[pid][1] >= per[pid - 1][2], (pid, per[pid], per[pid - 1])


def test_large_input_matches_window(spark):
    """1M-row differential: frozen-boundary ranks + running sums must
    match the single-task window exactly at a scale where boundary
    sampling actually matters (hundreds of rows per bucket boundary,
    duplicate order keys across bucket edges, all 32 buckets
    populated) — the small fixtures cannot exercise sampling error."""
    df = spark.range(1_000_000).select(
        (F.col("id") * 2654435761 % 99991).alias("v"),
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").alias("k"),
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    exp = df.withColumn("r", F.row_number().over(w)).withColumn(
        "c",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    got = global_rank(
        df,
        [F.col("v"), F.col("k")],
        "r",
        partition_cols=["g"],
        cumsum_cols={"c": "v"},
    )
    mismatch = (
        exp.select("g", "k", "r", "c")
        .exceptAll(got.select("g", "k", "r", "c"))
        .count()
    )
    assert mismatch == 0
    assert got.count() == 1_000_000


def test_global_rank_rejects_nondeterministic_input(spark):
    """r7 advice: the rank and offset branches re-execute the input
    independently — a nondeterministic df must be refused at build
    time, not silently mis-ranked."""
    import pytest
    from pyspark.sql import functions as F

    from avocado_spark.operators.relational import global_rank

    nd = spark.range(100).withColumn("v", F.rand(7))
    with pytest.raises(ValueError, match="deterministic"):
        global_rank(nd, [F.col("v"), F.col("id")])
    # materialized nondeterminism is fine: lineage is cut
    fixed = nd.localCheckpoint(eager=True)
    out = global_rank(fixed, [F.col("v"), F.col("id")])
    assert out.count() == 100


def test_boundary_dedup_canonicalizes_negative_zero(spark):
    """-0.0 and 0.0 are engine-equal; both surviving the boundary
    dedup would fabricate an empty interior bucket (r7 advice)."""
    from avocado_spark.operators.relational import _range_boundaries
    from pyspark.sql import functions as F

    rows = [(float(x),) for x in ([-0.0] * 500 + [0.0] * 500 + [1.0] * 500)]
    df = spark.createDataFrame(rows, ["v"])
    bounds = _range_boundaries(df, [F.col("v")], ["asc"], buckets=6)
    markers = [tuple(repr(x + 0.0) if isinstance(x, float) and x == 0.0 else repr(x) for x in b) for b in bounds]
    assert len(markers) == len(set(markers)), bounds


def test_sql_literal_fast_path_matches_column_fold(spark):
    """frozen_range_ids' one-parse SQL predicate (r9 driver-time fix)
    must assign the SAME bucket ids as the per-literal Column fold it
    replaced, across the tricky literal types: strings needing quote/
    backslash escaping, dates, decimals, doubles (incl. -0.0), and
    NULL keys. Both paths run on the same frozen boundary draw."""
    import datetime
    import decimal

    from pyspark.sql import functions as F

    from avocado_spark.operators.relational import (
        _at_or_after,
        _at_or_after_sql,
        _order_spec,
        _range_boundaries,
    )

    rows = []
    for i in range(400):
        s = ["plain", "o'quote", "back\\slash", "unié", None][i % 5]
        d = datetime.date(2024, 1 + i % 12, 1 + i % 28)
        dec = decimal.Decimal(i * 7 % 101) - decimal.Decimal("50.25")
        f = [-0.0, 0.0, 1.5, -3.25, float(i)][i % 5]
        rows.append((i, s, d, dec, f))
    df = spark.createDataFrame(
        rows, "k long, s string, d date, dec decimal(12,2), f double"
    )
    for order in (
        [F.col("s"), F.col("k")],
        [F.col("d"), F.col("k")],
        [F.col("dec"), F.col("k")],
        [(F.col("f"), "desc"), F.col("k")],
    ):
        vals, dirs, _sorts = _order_spec(order)
        bounds = _range_boundaries(df, vals, dirs, 8)
        assert bounds, "fixture should produce boundaries"
        k = len(vals)
        keyed = df.withColumns({f"_gr_fk{i}": vals[i] for i in range(k)})
        dtypes = [
            keyed.schema[f"_gr_fk{i}"].dataType.simpleString() for i in range(k)
        ]
        names = [f"_gr_fk{i}" for i in range(k)]
        sql_pid = F.expr(
            "(" + " + ".join(
                f"CAST(({_at_or_after_sql(names, dirs, dtypes, b)}) AS INT)"
                for b in bounds
            ) + ")"
        )
        fold_pid = sum(
            (_at_or_after(vals, dirs, b).cast("int") for b in bounds),
            start=F.lit(0),
        )
        diff = (
            keyed.select(
                "k", sql_pid.alias("p_sql"), fold_pid.alias("p_fold")
            )
            .where(~F.col("p_sql").eqNullSafe(F.col("p_fold")))
            .count()
        )
        assert diff == 0
