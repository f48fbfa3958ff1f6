"""Sketch-family queries: Bloom-pruned joins, Count-Min heavy-hitter
estimation, HyperLogLog cardinality rollups.

Oracle strategy per family:
  * Bloom — the OUTPUT is exact (the post-prune join removes false
    positives), so the oracle is the plain equi-join the operator
    accelerates.
  * CMS — the hash family is deterministic and replayable, so the
    oracle rebuilds the identical cell table in SQL and must match the
    estimates VALUE-FOR-VALUE (including collision overcounts).
  * HLL — estimates are engine-specific (DataSketches), so the output
    carries an error-bound FLAG; the oracle computes the exact
    cardinalities and asserts the flag is always true.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avocado_spark.operators import sketches as SK
from avocado_spark.queries import query
from avocado_spark.session import load_table

_P = SK.P


@query(
    "bloom_pruned_join",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """,
)
def bloom_pruned_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned exact join: build a Bloom filter on BUILDING-segment
    customer keys (a distributed bit_or aggregation, no driver
    collect), map-side-prune the orders scan to ~1/5 of its rows, then
    join exactly. The oracle is the plain join — Bloom false positives
    cannot survive it, so the differential proves exactness, and the
    pruning-effectiveness property is asserted in tests/test_sketches_bloom.py."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    joined = SK.bloom_pruned_join(
        orders,
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_c"),
    )


@query(
    "events_cms_user_counts",
    f"""
    WITH dd AS (SELECT UNNEST(generate_series(0, 3)) AS d),
    cells AS (
      SELECT d, ((user_id % {_P}) * (2*d+3) + (5*d+7)) % {_P} % 1024 AS w,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events, dd
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY 1
    ),
    probes AS (
      SELECT c.user_id, c.exact_cnt, dd.d,
             ((c.user_id % {_P}) * (2*dd.d+3) + (5*dd.d+7)) % {_P} % 1024 AS w
      FROM cand c, dd
    ),
    est AS (
      SELECT user_id, exact_cnt, MIN(COALESCE(cl.cnt, 0)) AS cms_est
      FROM probes p LEFT JOIN cells cl USING (d, w)
      GROUP BY 1, 2
    )
    SELECT user_id, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est
    """,
)
def events_cms_user_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: one bounded-shuffle sketch
    build over the event log, then per-user point estimates vs exact
    counts. Deterministic hash family → the oracle replays the sketch
    cell-for-cell, so even collision overcounts must match exactly.
    The CMS guarantee est ≥ exact is asserted as a property test."""
    events = load_table(spark, sf_dir, "events")
    cms = SK.cms_build(events, "user_id", depth=4, width=1024)
    cand = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    est = SK.cms_estimate(cand.select("user_id"), cms, "user_id", depth=4, width=1024)
    return cand.join(est, "user_id").select(
        "user_id",
        "exact_cnt",
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
    )


@query(
    "events_hll_daily_users",
    """
    SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_cnt,
           TRUE AS est_within_bound
    FROM events GROUP BY 1
    UNION ALL
    SELECT '__ALL__' AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_cnt,
           TRUE AS est_within_bound
    FROM events
    """,
)
def events_hll_daily_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user rollup: per-day DataSketches HLL sketches, with
    the __ALL__ row produced by MERGING the daily sketches
    (hll_union_agg) rather than rescanning — the mergeable
    pre-aggregation pattern for distinct counts over append-only logs.
    The oracle asserts the 5% error-bound flag plus exact counts."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return SK.hll_group_cardinality(events, "day", "user_id", lg_k=12, rel_err_bound=0.05)


@query(
    "cms_join_size_estimate",
    f"""
    WITH dd AS (SELECT UNNEST(generate_series(0, 3)) AS d),
    ca AS (
      SELECT d, ((user_id % {_P}) * (2*d+3) + (5*d+7)) % {_P} % 1024 AS w,
             CAST(COUNT(*) AS BIGINT) AS cnt_a
      FROM events, dd GROUP BY 1, 2
    ),
    cb AS (
      SELECT d, ((user_id % {_P}) * (2*d+3) + (5*d+7)) % {_P} % 1024 AS w,
             CAST(COUNT(*) AS BIGINT) AS cnt_b
      FROM events, dd WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    ip AS (
      SELECT ca.d, SUM(ca.cnt_a * cb.cnt_b) AS ip
      FROM ca JOIN cb ON ca.d = cb.d AND ca.w = cb.w
      GROUP BY ca.d
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM ip),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND b.event_type = 'purchase'
    )
    SELECT exact_n, cms_est, cms_est >= exact_n AS overestimates
    FROM exact, est
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two Count-Min sketches (cell
    inner product, min over depths) vs the exact join count — sketch
    algebra for pricing a join before running it. The oracle replays
    both sketches cell-for-cell, so the estimate must match exactly,
    and the CMS inner-product upper-bound property ships as a column."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    est = SK.cms_join_size_estimate(events, purchases, "user_id", depth=4, width=1024)
    exact = (
        events.select("user_id")
        .join(purchases.select("user_id"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("overestimates"),
    )


@query(
    "compaction_plan",
    """
    WITH file_stats AS (
      SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS part,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1, 2
    )
    SELECT part, file_id, n_rows,
           CAST(FLOOR(CAST(SUM(n_rows) OVER (PARTITION BY part
                              ORDER BY n_rows DESC, file_id ASC
                              ROWS UNBOUNDED PRECEDING) - n_rows AS DOUBLE)
                      / 100) AS BIGINT) AS bin_id
    FROM file_stats
    """,
)
def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning over per-file stats (here:
    hour-of-day slices stand in for files; tests/test_compaction.py
    drives the same operator on REAL parquet fragments via the
    _metadata hidden columns): next-fit bin packing by running row
    total inside each partition — the plan is O(files) and
    oracle-replayable as a prefix-sum."""
    from avocado_spark.operators.layout import compaction_plan

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("part"),
        F.hour("ts").cast("bigint").alias("file_id"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return compaction_plan(stats, "part", "file_id", "n_rows", target_rows=100)


@query(
    "events_hll_rolling_users",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(strftime(days.d, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_cnt,
           TRUE AS est_within_bound
    FROM days JOIN events e
      ON CAST(e.ts AS DATE) BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
)
def events_hll_rolling_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users WITHOUT rescanning: one HLL sketch
    per day, then ``hll_union_agg`` as a RANGE-frame window function —
    each day's rolling estimate merges seven daily sketches instead of
    re-reading a week of raw events. This is the payoff of mergeable
    sketches at 100 TB: the window runs over O(days) sketch rows, while
    the exact differential (and any rescan-based implementation) pays a
    7× read amplification. The oracle asserts exact counts + the 5%
    error-bound flag, matching the hll_group_cardinality contract."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    daily = ev.groupBy("d").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    from pyspark.sql import Window

    day_idx = F.datediff(F.col("d"), F.lit("2020-01-01").cast("date"))
    w = Window.orderBy(day_idx).rangeBetween(-6, 0)
    est = daily.select(
        "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est")
    )
    days = daily.select("d")
    exact = (
        F.broadcast(days.withColumnRenamed("d", "d0"))
        .join(
            ev.select(F.col("d").alias("de"), "user_id"),
            (F.col("de") >= F.date_sub(F.col("d0"), 6)) & (F.col("de") <= F.col("d0")),
        )
        .groupBy("d0")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_cnt"))
    )
    return (
        est.join(exact, est["d"] == exact["d0"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "exact_cnt",
            (
                F.abs(F.col("est") - F.col("exact_cnt"))
                <= F.lit(0.05) * F.col("exact_cnt")
            ).alias("est_within_bound"),
        )
    )


@query(
    "events_kmv_overlap",
    f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             ((user_id % {_P}) * 2654435761 + 12345) % {_P} AS hv
      FROM events
    ),
    sk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS r
        FROM hashed
      ) WHERE r <= 64
    ),
    types AS (SELECT DISTINCT event_type AS t FROM sk),
    pairs AS (SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t),
    pm AS (SELECT ta AS t, ta, tb FROM pairs
           UNION ALL SELECT tb, ta, tb FROM pairs),
    cand AS (SELECT pm.ta, pm.tb, sk.event_type AS t, sk.hv
             FROM pm JOIN sk ON sk.event_type = pm.t),
    u AS (SELECT DISTINCT ta, tb, hv FROM cand),
    uk AS (
      SELECT ta, tb, hv FROM (
        SELECT ta, tb, hv,
               ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS r
        FROM u
      ) WHERE r <= 64
    ),
    tau AS (SELECT ta, tb, MAX(hv) AS tau, COUNT(*) AS ku FROM uk GROUP BY ta, tb),
    bothm AS (
      SELECT ta, tb, hv FROM cand GROUP BY ta, tb, hv
      HAVING COUNT(DISTINCT t) = 2
    ),
    l AS (
      SELECT uk.ta, uk.tb, COUNT(*) AS n_both
      FROM uk JOIN bothm ON uk.ta = bothm.ta AND uk.tb = bothm.tb
                         AND uk.hv = bothm.hv
      GROUP BY uk.ta, uk.tb
    ),
    est AS (
      SELECT tau.ta, tau.tb, tau.ku, COALESCE(l.n_both, 0) AS n_both,
             CASE WHEN tau.ku >= 64
                  THEN CAST(ROUND((CAST(tau.ku AS DOUBLE) - 1) * {_P}
                                  / CAST(tau.tau AS DOUBLE), 0) AS BIGINT)
                  ELSE CAST(tau.ku AS BIGINT) END AS est_union
      FROM tau LEFT JOIN l ON tau.ta = l.ta AND tau.tb = l.tb
    )
    SELECT ta, tb, est_union,
           ROUND(CAST(n_both AS DOUBLE) / ku, 6) AS jaccard_est,
           CAST(ROUND(CAST(n_both AS DOUBLE) * est_union / ku, 0) AS BIGINT)
             AS est_overlap
    FROM est
    """,
)
def events_kmv_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV audience overlap: per event-type pair, estimate the shared-
    user count and Jaccard from k=64-minimum-values sketches built in
    ONE scan + one rank window (operators/sketches.kmv_sketch). The
    mergeable-sketch answer to "how much do the click and purchase
    audiences overlap" that a 100-TB log answers from |types|×64 rows
    of synopsis instead of a self-join of distinct users. The LCG hash
    is deterministic, so the oracle replays the sketch — and therefore
    the ESTIMATES — value-for-value (stronger than the HLL family's
    bound-only check)."""
    ev = load_table(spark, sf_dir, "events")
    return SK.kmv_pairwise_overlap(ev, "event_type", "user_id", k=64)
