"""Streaming-surface queries over `events`, checked in BATCH mode.

Structured Streaming's contract is that a streaming query computes the
same answer as the batch query over the same (complete) input — so the
DuckDB differential gate runs each operator's batch shadow here, while
tests/test_streaming.py runs the genuinely-streaming path (file source
→ watermark → memory sink) and asserts it converges to the batch
result. Timestamps are surfaced as epoch MICROSECOND bigints (exact in
both engines); money sums as cent bigints (house convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from avocado_spark.queries import query
from avocado_spark.functions.time_fns import ts_us
from avocado_spark.session import load_table
from avocado_spark.streaming import events as EV

_US_HOUR = 3_600_000_000
_US_30MIN = 1_800_000_000


@query(
    "stream_tumbling_hourly",
    f"""
    SELECT (epoch_us(ts) // {_US_HOUR}) * {_US_HOUR} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window × event_type rollup — the canonical
    watermarked streaming aggregation, batch shadow."""
    return EV.tumbling_agg(load_table(spark, sf_dir, "events"), window="1 hour")


@query(
    "stream_sliding_30m",
    f"""
    WITH panes AS (
      SELECT e.*,
             (epoch_us(ts) // {_US_30MIN}) * {_US_30MIN} - k.k * {_US_30MIN} AS window_start_us
      FROM events e CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM panes
    GROUP BY 1
    """,
)
def stream_sliding_30m_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m window rollup: every event lands in 2 panes."""
    return EV.sliding_agg(
        load_table(spark, sf_dir, "events"), window="1 hour", slide="30 minutes"
    )


@query(
    "stream_session_windows",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sessions AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM gaps
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 300000000 AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def stream_session_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap session windows (native session_window
    keyed state); session end = last event + gap."""
    return EV.session_agg(load_table(spark, sf_dir, "events"), gap="5 minutes")


@query(
    "stream_dedup_first",
    """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id, ts_us FROM ranked WHERE rn = 1
    """,
)
def stream_dedup_first_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed streaming dedup's deterministic batch shadow: earliest
    event per (user_id, event_type)."""
    return EV.first_event_per_key(load_table(spark, sf_dir, "events"))


@query(
    "stream_running_total",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total_c
    FROM events
    """,
)
def stream_running_total_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of the applyInPandasWithState running-total
    operator (per-user cumulative cent-sum)."""
    return EV.running_total_batch(load_table(spark, sf_dir, "events"))


@query(
    "events_props_parse",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_props_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured metadata path: parse the JSON props column with
    a declared schema (from_json stays JVM-side/codegen) and aggregate
    an extracted field — the everyday training-pipeline shape the
    reference never needed but the engine inherits from Spark."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).cast("bigint").alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "events_salted_agg",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events
    GROUP BY event_type
    """,
)
def events_salted_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a 5-value key (maximal skew:
    every key is hot). Result must equal the plain groupBy — the salt
    is a pure execution-shape change."""
    from pyspark.sql import functions as F

    from avocado_spark.operators.relational import salted_agg

    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["event_type"],
        {
            "n": F.count("*"),
            "sum_value_c": F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint"),
            "min_user": F.min("user_id"),
            "max_user": F.max("user_id"),
        },
    )


@query(
    "stream_attribution_join",
    """
    SELECT l.user_id,
           l.event_id AS l_event_id,
           r.event_id AS r_event_id,
           epoch_us(l.ts) AS l_ts_us,
           epoch_us(r.ts) AS r_ts_us,
           CAST(ROUND(r.value * 100) AS BIGINT) AS r_value_c
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
    WHERE l.event_type = 'view' AND r.event_type = 'purchase'
    """,
)
def stream_attribution_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join (view → purchase by the same
    user within 30 min), batch shadow. The streaming path (two
    watermarked file streams, bounded join state) is exercised in
    tests/test_streaming.py."""
    return EV.attribution_join(load_table(spark, sf_dir, "events"))


@query(
    "stream_trending_topk",
    f"""
    WITH counts AS (
      SELECT (epoch_us(ts) // {_US_HOUR}) * {_US_HOUR} AS window_start_us,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT window_start_us, event_type, n_events, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start_us
                 ORDER BY n_events DESC, event_type) AS rank
      FROM counts
    ) WHERE rank <= 3
    """,
)
def stream_trending_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 trending event types per tumbling hour: streaming windowed
    counts + the downstream rank stage, batch shadow."""
    ev = load_table(spark, sf_dir, "events")
    counts = EV.tumbling_agg(ev, window="1 hour").drop("sum_value_c")
    return EV.trending_topk(counts, k=3)


@query(
    "events_asof_join",
    """
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v0 AS (
      SELECT user_id, ts, MAX(event_id) AS event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    v AS (SELECT v0.user_id, v0.ts, v0.event_id, e.value
          FROM v0 JOIN events e ON e.event_id = v0.event_id)
    SELECT p.user_id, p.event_id AS p_event_id, epoch_us(p.ts) AS p_ts_us,
           v.event_id AS v_event_id, epoch_us(v.ts) AS v_ts_us,
           CAST(ROUND(v.value * 100) AS BIGINT) AS v_value_c
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def events_asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent view at or
    before it (null if none). Spark side is the JOIN-FREE union+window
    shape — one shuffle on user_id, linear state — differentialed
    against DuckDB's native ASOF LEFT JOIN. Equal-ts views dedup to the
    max event_id on both sides."""
    from pyspark.sql import functions as F  # noqa: F811
    from avocado_spark.operators.relational import asof_join

    ev = EV.normalize_events(load_table(spark, sf_dir, "events"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), F.col("ts")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases, views, keys=["user_id"], ts_col="ts", right_cols=["event_id", "value"]
    )
    return out.select(
        "user_id",
        "p_event_id",
        ts_us("ts").alias("p_ts_us"),
        F.col("r_event_id").alias("v_event_id"),
        ts_us("r_ts").alias("v_ts_us"),
        F.round(F.col("r_value") * 100).cast("bigint").alias("v_value_c"),
    )


@query(
    "events_value_quantiles",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, n,
           CAST(ROUND(MAX(CASE WHEN rn = 1 + FLOOR((n - 1) * 0.5) THEN value END) * 100) AS BIGINT) AS q50_c,
           CAST(ROUND(MAX(CASE WHEN rn = 1 + FLOOR((n - 1) * 0.9) THEN value END) * 100) AS BIGINT) AS q90_c
    FROM ranked
    WHERE rn = 1 + FLOOR((n - 1) * 0.5) OR rn = 1 + FLOOR((n - 1) * 0.9)
    GROUP BY event_type, n
    """,
)
def events_value_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90 of event value per type by rank position —
    one window shuffle, |q| rows kept per group, wide pivot."""
    from pyspark.sql import functions as F  # noqa: F811
    from avocado_spark.operators.relational import exact_group_quantiles

    ev = load_table(spark, sf_dir, "events")
    out = exact_group_quantiles(
        ev, ["event_type"], "value", "event_id", quantiles=(0.5, 0.9)
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("q50") * 100).cast("bigint").alias("q50_c"),
        F.round(F.col("q90") * 100).cast("bigint").alias("q90_c"),
    )


@query(
    "events_funnel",
    """
    WITH scoped AS (
      SELECT * FROM (
        SELECT *, MIN(ts) OVER (PARTITION BY user_id) AS u0 FROM events
      ) WHERE ts < u0 + INTERVAL 2 DAY
    ),
    s0 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id) AS t0
      FROM scoped
    ),
    s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND t0 IS NOT NULL
                          AND ts >= t0 THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
      FROM s0
    ),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t1 IS NOT NULL
                          AND ts >= t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM s1
    )
    SELECT DISTINCT user_id,
           epoch_us(t0) AS t0_us, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
           (CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS reached_stage
    FROM s2
    """,
)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel within each user's first 2 days:
    stacked conditional-min windows on one user_id partitioning
    (single shuffle, no sort); the horizon makes every break depth
    occur in the fixture (mixed 0/1/2/3 distribution at sf0.01)."""
    ev = EV.normalize_events(load_table(spark, sf_dir, "events"))
    return EV.funnel_stages(ev, ("view", "click", "purchase"), within="2 days")


@query(
    "events_rolling_stats",
    """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS n_30m,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_30m_c
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute per-user velocity features via a RANGE frame
    on epoch-micros — one shuffle on user_id, no time-range self-join.
    Equal-timestamp rows are admitted symmetrically, matching DuckDB's
    RANGE BETWEEN INTERVAL frame exactly."""
    from avocado_spark.operators.relational import rolling_event_stats

    return rolling_event_stats(
        load_table(spark, sf_dir, "events"), horizon_minutes=30
    )


@query(
    "stream_static_enrich",
    """
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
           CAST(ROUND(e.value * 100) AS BIGINT) AS value_c,
           c.c_name, c.c_nationkey
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: events left-joined to the
    customer dimension. In a streaming plan the static side broadcasts
    and the stream buffers NOTHING (no watermark, no state) — here the
    batch shadow is oracle-checked; the streaming path converges in
    tests/test_streaming.py."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return EV.enrich_with_dim(ev, cust).select(
        "event_id",
        "user_id",
        ts_us("ts").alias("ts_us"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
        "c_name",
        "c_nationkey",
    )


@query(
    "events_rollup_hierarchy",
    """
    WITH e AS (SELECT event_type,
                      (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
                      value
               FROM events)
    SELECT event_type, hour_us, GROUPING(event_type, hour_us) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM e GROUP BY ROLLUP(event_type, hour_us)
    """,
)
def events_rollup_hierarchy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (type → type×hour → grand total) in ONE
    aggregation pass — Spark's ROLLUP expands grouping sets inside a
    single partial+final hash agg instead of three scans + union.
    grouping_id disambiguates subtotal rows from genuine null keys;
    its bit convention (leftmost rollup column = MSB) matches DuckDB's
    GROUPING() exactly, which this differential pins."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    hour = (ts_us("ts") - F.pmod(ts_us("ts"), F.lit(3600000000))).alias("hour_us")
    return (
        ev.select("event_type", hour, "value")
        .rollup("event_type", "hour_us")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_c"),
        )
    )


@query(
    "events_value_deciles",
    """
    WITH t AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT event_type, decile, COUNT(*) AS n,
           MIN(v_c) AS lo_c, MAX(v_c) AS hi_c
    FROM t GROUP BY event_type, decile
    """,
)
def events_value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type decile distribution of event values: NTILE(10) under a
    deterministic (value, event_id) order, rolled up to count + cent
    bounds per bucket — the histogram primitive for drift monitoring.
    Only 3 event types exist, so a ``Window.partitionBy(event_type)``
    would push a third of the fact table through one task each; the
    rank rides :func:`global_rank` restarting per type and the decile
    comes from the standard NTILE position formula with broadcast
    per-type counts."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import global_rank

    ev = load_table(spark, sf_dir, "events")
    ranked = global_rank(
        ev.select(
            "event_type",
            "value",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        ),
        [F.col("value"), F.col("event_id")],
        rank_col="_r",
        partition_cols=["event_type"],
    )
    ng = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    j = ranked.join(F.broadcast(ng), "event_type")
    qsz = F.expr("_n div 10")
    rem = F.col("_n") % 10
    cutoff = rem * (qsz + 1)
    decile = F.when(
        F.col("_r") <= cutoff, F.expr("(_r - 1) div (_n div 10 + 1)") + 1
    ).otherwise(
        rem
        + F.expr("(_r - 1 - (_n % 10) * (_n div 10 + 1)) div greatest(_n div 10, 1)")
        + 1
    )
    return (
        j.withColumn("decile", decile)
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("v_c").alias("lo_c"),
            F.max("v_c").alias("hi_c"),
        )
    )


@query(
    "events_interarrival",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM g GROUP BY user_id
    """,
)
def events_interarrival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps (LAG over event time) rolled up to
    count/min/max/sum — the session-cadence feature. The LAG window
    and the user agg share one user_id shuffle; integer micros keep
    the sums exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    us = ts_us("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", (us - F.lag(us).over(w)).alias("gap_us")
        )
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        )
    )


@query(
    "events_scd2_history",
    """
    WITH runs AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             SUM(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
      )
    ),
    hist AS (
      SELECT user_id, version,
             MIN(event_type) AS event_type,
             CAST(MIN(us) AS BIGINT) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, version
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY version) AS valid_to_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY version) IS NULL AS is_current,
           n_events
    FROM hist
    """,
)
def events_scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history compiled from the raw event feed: per-user
    runs of the same event_type become versioned validity intervals
    with an open-ended current row — lag-detect + running-sum version
    + grouped min + lead, all sharing ONE user_id shuffle."""
    from avocado_spark.operators.relational import scd2_history

    return scd2_history(load_table(spark, sf_dir, "events"))


@query(
    "multitouch_attribution",
    """
    WITH t AS (
      SELECT user_id, event_id AS touch_id, epoch_us(ts) AS t_us
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT t.touch_id, t.user_id, c.conv_id
      FROM t JOIN c ON t.user_id = c.user_id
       AND t.t_us <= c.c_us AND t.t_us > c.c_us - 21600000000
    ),
    credited AS (
      SELECT touch_id, user_id,
             1000000 // COUNT(*) OVER (PARTITION BY conv_id) AS credit_u
      FROM pairs
    )
    SELECT touch_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_convs,
           CAST(SUM(credit_u) AS BIGINT) AS credit_u
    FROM credited GROUP BY touch_id, user_id
    """,
)
def multitouch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (6h horizon): each purchase
    splits 1e6 credit micro-units integer-evenly across the user's
    views in the window — exact bigint credit per touch, no float
    summation-order drift."""
    return EV.multitouch_attribution(load_table(spark, sf_dir, "events"))


@query(
    "cohort_retention",
    """
    WITH u AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    f AS (
      SELECT user_id, MIN(us) // 604800000000 AS cw
      FROM u GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT u.user_id, f.cw,
             (u.us // 604800000000) - f.cw AS off
      FROM u JOIN f USING (user_id)
    )
    SELECT CAST(cw AS BIGINT) AS cohort_week,
           CAST(off AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a GROUP BY 1, 2
    """,
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week,
    counted once per (cohort, week-offset) they were active — the
    product-analytics staple. First-seen min, the activity join, and
    both aggs all hash on user_id/cohort keys; week arithmetic is
    integer `div` on epoch micros, engine-exact."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    week = 604_800_000_000
    u = ev.select("user_id", ts_us("ts").alias("us"))
    f = (
        u.groupBy("user_id")
        .agg(F.min("us").alias("first_us"))
        .select("user_id", F.expr(f"first_us div {week}").alias("cw"))
    )
    a = (
        u.join(f, "user_id")
        .select(
            "user_id",
            "cw",
            (F.expr(f"us div {week}") - F.col("cw")).alias("off"),
        )
        .distinct()
    )
    return a.groupBy(
        F.col("cw").cast("bigint").alias("cohort_week"),
        F.col("off").cast("bigint").alias("week_offset"),
    ).agg(F.count("*").cast("bigint").alias("n_users"))


@query(
    "stream_attribution_outer",
    """
    SELECT l.user_id,
           l.event_id AS l_event_id,
           r.event_id AS r_event_id,
           epoch_us(l.ts) AS l_ts_us,
           epoch_us(r.ts) AS r_ts_us,
           CAST(ROUND(r.value * 100) AS BIGINT) AS r_value_c
    FROM (SELECT * FROM events WHERE event_type = 'view') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
)
def stream_attribution_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream attribution: unconverted views emit
    with null purchase columns. In streaming the null row is emitted
    only after the watermark proves no in-horizon match can still
    arrive (state held until then); the batch shadow here is the plain
    left interval join both engines agree on."""
    return EV.attribution_join(
        load_table(spark, sf_dir, "events"), how="left_outer"
    )


@query(
    "events_dow_hour_profile",
    """
    SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow,
           CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1, 2
    """,
)
def events_dow_hour_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: (day-of-week, hour-of-day) rollup.
    Calendar arithmetic is done directly on epoch micros with integer
    div/mod (epoch day 0 was a Thursday, hence the +4), NOT the
    engines' dayofweek() functions, whose 0-vs-1-based Sunday
    conventions differ — the profile is engine-exact by construction.
    One hash agg, map-side combined."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    us = ts_us("ts")
    day_us = 86_400_000_000
    hour_us = 3_600_000_000
    return (
        ev.select(
            us.alias("us"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        )
        .select(
            (
                (F.expr(f"us div {day_us}") + 4) % 7
            ).cast("bigint").alias("dow"),
            F.expr(f"(us % {day_us}) div {hour_us}").cast("bigint").alias("hour"),
            "v_c",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v_c").cast("bigint").alias("sum_value_c"),
        )
    )


@query(
    "events_partition_gaps",
    """
    WITH d0 AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events
    ),
    d AS (SELECT day FROM d0 WHERE day % 5 <> 2),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    expected AS (
      SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    )
    SELECT CAST(e.day AS BIGINT) AS missing_day,
           CAST(e.day - (SELECT lo FROM bounds) AS BIGINT) AS offset_from_start
    FROM expected e LEFT JOIN d ON d.day = e.day
    WHERE d.day IS NULL
    """,
)
def events_partition_gaps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: expected daily partitions (the min..max day
    lattice) anti-joined against days actually present — the missing-
    partition report every scheduled-ingest pipeline runs before
    declaring a dataset complete. The fixture is gapless, so days
    ``day % 5 == 2`` are deterministically dropped from the present
    set on BOTH engines (a 0-row oracle verifies nothing). The
    expected lattice comes from a 1-row bounds aggregate, so nothing
    scales with the gap count but the output."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    d = (
        ev.select(ts_us("ts").alias("us"))
        .select(F.expr(f"us div {day_us}").alias("day"))
        .distinct()
        .where(F.col("day") % 5 != 2)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    expected = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"), "lo"
    )
    return (
        expected.join(d, "day", "left_anti")
        .select(
            F.col("day").cast("bigint").alias("missing_day"),
            (F.col("day") - F.col("lo")).cast("bigint").alias("offset_from_start"),
        )
    )


@query(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY event_type), 6) AS p
    FROM t
    """,
)
def events_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    per-user LEAD pairs rolled into (from, to, count, row-normalized
    probability) — the sequence-mining primitive behind next-action
    prediction and funnel design. The lead window and the transition
    agg share one user_id shuffle; the normalizing window runs over
    the |types|² result."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy("event_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wn = Window.partitionBy("event_type")
    return t.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"),
    )


@query(
    "events_expectations",
    """
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
        SUM(CASE WHEN COALESCE(value >= 0, FALSE) THEN 0 ELSE 1 END) AS v_nonneg,
        SUM(CASE WHEN COALESCE(event_type IN
              ('view','click','purchase','signup','error'), FALSE)
            THEN 0 ELSE 1 END) AS v_types,
        SUM(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS v_ts,
        SUM(CASE WHEN COALESCE(user_id >= 0, FALSE) THEN 0 ELSE 1 END) AS v_uid,
        SUM(CASE WHEN COALESCE(value <= 50, FALSE) THEN 0 ELSE 1 END) AS v_cap
      FROM events
    )
    SELECT r.rule, CAST(agg.n_rows AS BIGINT) AS n_rows,
           CAST(CASE r.rule
             WHEN 'value_non_negative' THEN v_nonneg
             WHEN 'known_event_type' THEN v_types
             WHEN 'ts_not_null' THEN v_ts
             WHEN 'user_id_non_negative' THEN v_uid
             WHEN 'value_under_cap' THEN v_cap
           END AS BIGINT) AS n_violations,
           CASE r.rule
             WHEN 'value_non_negative' THEN v_nonneg
             WHEN 'known_event_type' THEN v_types
             WHEN 'ts_not_null' THEN v_ts
             WHEN 'user_id_non_negative' THEN v_uid
             WHEN 'value_under_cap' THEN v_cap
           END = 0 AS passed
    FROM agg CROSS JOIN (SELECT UNNEST([
      'value_non_negative', 'known_event_type', 'ts_not_null',
      'user_id_non_negative', 'value_under_cap']) AS rule) r
    """,
)
def events_expectations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite over the event feed: five
    declarative rules evaluated in ONE scan (conditional-sum wide agg
    → rule explode), including an intentionally failable value cap so
    the violation path is exercised, not just the happy path."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import expectation_check

    ev = load_table(spark, sf_dir, "events")
    rules = [
        ("value_non_negative", F.col("value") >= 0),
        (
            "known_event_type",
            F.col("event_type").isin("view", "click", "purchase", "signup", "error"),
        ),
        ("ts_not_null", F.col("ts").isNotNull()),
        ("user_id_non_negative", F.col("user_id") >= 0),
        ("value_under_cap", F.col("value") <= 50),
    ]
    return expectation_check(ev, rules)


@query(
    "events_table_fingerprint",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(
             ((((event_id * 131 + epoch_us(ts)) % 1000000007) * 131
               + user_id) % 1000000007 * 131
               + CAST(ROUND(value * 100) AS BIGINT)) % 1000000007
           ) AS BIGINT) AS fp_sum
    FROM events
    """,
)
def events_table_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table certificate: per-row polynomial hash
    (id, epoch micros, user, cent value) reduced mod P, summed exactly
    as a bigint — identical under any partitioning, so two engines or
    two runs can certify table equality with one row exchanged."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import table_fingerprint

    ev = load_table(spark, sf_dir, "events")
    P_ = 1_000_000_007
    h = (
        (
            ((F.col("event_id") * 131 + ts_us("ts")) % P_) * 131
            + F.col("user_id")
        ) % P_ * 131
        + F.round(F.col("value") * 100).cast("bigint")
    ) % P_
    return table_fingerprint(ev, h)


@query(
    "session_conversion",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sessions AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM gaps
    ),
    per_session AS (
      SELECT user_id, session_no,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conversion_rate
    FROM per_session GROUP BY user_id
    """,
)
def session_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session conversion rate: gap-based sessionization (the
    batch shadow of the native session_window) → did each session
    contain a purchase → user rollup. All three stages share one
    user_id shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 5 * 60 * 1_000_000
    us = ts_us("ts")
    chg = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) >= gap_us), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "event_type",
        F.sum(chg).over(w).alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


@query(
    "funnel_conversion_rates",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ),
    t0 AS (
      SELECT user_id, MIN(ts) AS t_view FROM seq
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t1 AS (
      SELECT s.user_id, MIN(s.ts) AS t_click
      FROM seq s JOIN t0 ON s.user_id = t0.user_id
      WHERE s.event_type = 'click' AND s.ts >= t0.t_view
      GROUP BY s.user_id
    ),
    t2 AS (
      SELECT s.user_id, MIN(s.ts) AS t_purchase
      FROM seq s JOIN t1 ON s.user_id = t1.user_id
      WHERE s.event_type = 'purchase' AND s.ts >= t1.t_click
      GROUP BY s.user_id
    ),
    per_user AS (
      SELECT t0.user_id,
             1 + CASE WHEN t1.user_id IS NULL THEN 0 ELSE 1 END
               + CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END AS reached
      FROM t0
      LEFT JOIN t1 ON t0.user_id = t1.user_id
      LEFT JOIN t2 ON t1.user_id = t2.user_id
    )
    SELECT CAST(reached AS BIGINT) AS reached_stage,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM per_user GROUP BY reached
    """,
)
def funnel_conversion_rates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel drop-off rollup: how many users reached each ordered
    stage (view → click-after-view → purchase-after-click) and each
    stage's share of the funnel population — the conversion report
    built on the funnel operator's per-user output. Users with no view
    are outside the funnel, exactly as in the stacked-window operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    per_user = EV.funnel_stages(ev).where(F.col("t0_us").isNotNull())
    agg = per_user.groupBy(
        F.col("reached_stage").cast("bigint").alias("reached_stage")
    ).agg(F.count("*").cast("bigint").alias("n_users"))
    return agg.select(
        "reached_stage",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.sum("n_users").over(Window.partitionBy()),
            6,
        ).alias("share"),
    )


@query(
    "events_partition_fingerprint_diff",
    """
    WITH base AS (
      SELECT event_id, ts, user_id, value,
             CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day
      FROM events
    ),
    new_t AS (
      SELECT event_id, ts, user_id,
             CASE WHEN day = '2024-01-05' THEN value + 1 ELSE value END AS value,
             day
      FROM base WHERE day <> '2024-01-03'
      UNION ALL
      SELECT event_id + 1000000, ts + INTERVAL 60 DAY, user_id, value,
             CAST(strftime(ts + INTERVAL 60 DAY, '%Y-%m-%d') AS VARCHAR)
      FROM base WHERE day = '2024-01-01'
    ),
    o AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS old_n,
             CAST(SUM(((((event_id * 131 + epoch_us(ts)) % 1000000007) * 131
               + user_id) % 1000000007 * 131
               + CAST(ROUND(value * 100) AS BIGINT)) % 1000000007) AS BIGINT) AS old_fp
      FROM base GROUP BY day
    ),
    n AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_n,
             CAST(SUM(((((event_id * 131 + epoch_us(ts)) % 1000000007) * 131
               + user_id) % 1000000007 * 131
               + CAST(ROUND(value * 100) AS BIGINT)) % 1000000007) AS BIGINT) AS new_fp
      FROM new_t GROUP BY day
    )
    SELECT COALESCE(o.day, n.day) AS day,
           CASE WHEN o.old_n IS NULL THEN 'added'
                WHEN n.new_n IS NULL THEN 'removed'
                WHEN o.old_n = n.new_n AND o.old_fp = n.new_fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           COALESCE(o.old_n, 0) AS old_n,
           COALESCE(n.new_n, 0) AS new_n
    FROM o FULL OUTER JOIN n ON o.day = n.day
    """,
)
def events_partition_fingerprint_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style partition diff: per-day fingerprints of two event
    snapshots (one day dropped, one day's values touched, one day
    time-shifted in as new), full-outer joined and classified. The
    exchange is O(days); the deterministic fixture mutations make all
    four statuses non-empty in the differential."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import partition_fingerprint_diff

    P_ = 1_000_000_007
    base = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    shifted = (
        base.where(F.col("day") == "2024-01-01")
        .select(
            (F.col("event_id") + 1000000).alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 60 DAYS")).alias("ts"),
            "user_id",
            "value",
        )
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    )
    new = (
        base.where(F.col("day") != "2024-01-03")
        .withColumn(
            "value",
            F.when(F.col("day") == "2024-01-05", F.col("value") + 1).otherwise(
                F.col("value")
            ),
        )
        .select("event_id", "ts", "user_id", "value", "day")
        .unionByName(shifted)
    )
    h = (
        (
            ((F.col("event_id") * 131 + ts_us("ts")) % P_) * 131 + F.col("user_id")
        ) % P_ * 131
        + F.round(F.col("value") * 100).cast("bigint")
    ) % P_
    return partition_fingerprint_diff(
        base.select("event_id", "ts", "user_id", "value", "day"), new, "day", h
    )


@query(
    "session_paths",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sessions AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM gaps
    ),
    paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path HAVING COUNT(*) >= 5
    """,
)
def session_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: gap-sessionize the event stream (same
    5-minute rule as session_conversion), fold each session's ordered
    event types into a path string, and count the recurring paths —
    the navigation-pattern rollup. Ordering inside the fold is made
    deterministic by sorting structs on (ts, event_id), not by
    trusting collect_list order; the heavy lifting is the one user_id
    window shuffle plus a path groupBy."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        ev.withColumn(
            "is_start",
            F.when(gap.isNull() | (gap >= 300), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_no",
            F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    paths = sess.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .where(F.col("n_sessions") >= 5)
    )


@query(
    "events_join_skew_report",
    """
    WITH freq AS (
      SELECT CAST(event_type AS VARCHAR) AS key_val, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    heavy AS (
      SELECT key_val, CAST(n AS BIGINT) AS n_rows,
             CAST(NULL AS BIGINT) AS skew_x1000
      FROM freq ORDER BY n DESC, key_val ASC LIMIT 10
    ),
    overall AS (
      SELECT '__ALL__' AS key_val, CAST(0 AS BIGINT) AS n_rows,
             CAST(MAX(n) * 1000 * COUNT(*) // SUM(n) AS BIGINT) AS skew_x1000
      FROM freq
    )
    SELECT * FROM heavy UNION ALL SELECT * FROM overall
    """,
)
def events_join_skew_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew telemetry on a candidate join key: the top heavy
    keys plus an exact integer skew factor (max/avg in thousandths) —
    the number that decides salting / AQE skew-split BEFORE paying the
    join. One groupBy on the key the join would shuffle on anyway."""
    from avocado_spark.operators.relational import join_skew_report

    ev = load_table(spark, sf_dir, "events")
    return join_skew_report(ev, "event_type", top_k=10)


@query(
    "events_quantile_normalize",
    """
    WITH ranked AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    gpool AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS gi
      FROM events
    ),
    tot AS (SELECT COUNT(*) AS nt FROM events),
    mapped AS (
      SELECT event_id, event_type, value,
             CASE WHEN n > 1 THEN 1 + (r - 1) * (nt - 1) // (n - 1)
                  ELSE (nt + 1) // 2 END AS gi
      FROM ranked, tot
    )
    SELECT m.event_id, m.event_type,
           CAST(ROUND(m.value * 100) AS BIGINT) AS value_c,
           CAST(ROUND(g.value * 100) AS BIGINT) AS norm_value_c
    FROM mapped m JOIN gpool g USING (gi)
    """,
)
def events_quantile_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-event-type value distributions
    onto the pooled distribution — exact integer rank mapping (no float
    interpolation), one window per side + a rank-index equi-join."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import quantile_normalize

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = quantile_normalize(ev, "event_type", "value", "event_id")
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
        F.round(F.col("norm_value") * 100).cast("bigint").alias("norm_value_c"),
    )


@query(
    "events_burst_alerts",
    """
    WITH clicks AS (
      SELECT user_id, event_id, epoch_us(ts) AS u
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT c.user_id, c.event_id, c.u, COUNT(*) AS n_in_window
      FROM clicks c JOIN clicks p ON p.user_id = c.user_id
        AND p.u >= c.u - 21600000000
        AND (p.u < c.u OR (p.u = c.u AND p.event_id <= c.event_id))
      GROUP BY 1, 2, 3
    )
    SELECT user_id, event_id, CAST(u AS BIGINT) AS ts_us,
           CAST(n_in_window AS BIGINT) AS n_in_window
    FROM j WHERE n_in_window >= 3
    """,
)
def events_burst_alerts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection (≥3 clicks in a trailing 6-hour window), batch
    form: horizon-bounded self-join + count. The streaming twin
    (burst_alerts_stream, transformWithStateInPandas ListState) carries
    O(horizon) state per user instead of the self-join — convergence
    asserted in tests/test_streaming.py across MULTIPLE time-split
    micro-batches."""
    return EV.burst_alerts_batch(load_table(spark, sf_dir, "events"))


@query(
    "scd2_point_in_time_join",
    """
    WITH feed AS (SELECT * FROM events WHERE event_type <> 'purchase'),
    runs AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             SUM(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM feed
      )
    ),
    hist AS (
      SELECT user_id, version, MIN(event_type) AS state,
             CAST(MIN(us) AS BIGINT) AS valid_from_us
      FROM runs GROUP BY user_id, version
    ),
    dim AS (
      SELECT user_id, version, state, valid_from_us,
             LEAD(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY version) AS valid_to_us
      FROM hist
    ),
    facts AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, CAST(f.ts_us AS BIGINT) AS ts_us,
           d.state, CAST(d.version AS BIGINT) AS version
    FROM facts f LEFT JOIN dim d
      ON f.user_id = d.user_id
      AND f.ts_us >= d.valid_from_us
      AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
    """,
)
def scd2_point_in_time_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension join — the feature-store
    pattern: compile a type-2 SCD dimension from the non-purchase feed
    (what state was the user in), then join every purchase fact to the
    version VALID AT ITS TIMESTAMP (validity-interval predicate, never
    the current row — the classic leakage bug this operator exists to
    prevent). The interval predicate rides the user_id equi-join;
    intervals tile the timeline so each fact matches at most one
    version, left-outer keeps purchases before any state."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import scd2_history

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(ev.where(F.col("event_type") != "purchase")).select(
        "user_id",
        "version",
        F.col("event_type").alias("state"),
        "valid_from_us",
        "valid_to_us",
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_us("ts").alias("ts_us")
    )
    j = facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (facts["ts_us"] >= dim["valid_from_us"])
        & (dim["valid_to_us"].isNull() | (facts["ts_us"] < dim["valid_to_us"])),
        "left",
    )
    return j.select(
        facts["event_id"],
        facts["user_id"],
        facts["ts_us"],
        dim["state"],
        dim["version"].cast("bigint").alias("version"),
    )


@query(
    "events_key_uniqueness_audit",
    """
    SELECT 'event_id' AS candidate_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT event_id) AS is_unique
    FROM events
    UNION ALL
    SELECT 'user_id+ts' AS candidate_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT (user_id, ts)) AS BIGINT) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT (user_id, ts)) AS is_unique
    FROM events
    UNION ALL
    SELECT 'user_id' AS candidate_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT user_id) AS is_unique
    FROM events
    """,
)
def events_key_uniqueness_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit: for each proposed key, exact distinct count
    vs row count and a uniqueness verdict — the constraint-inference
    pass that decides whether an upsert/merge key is actually safe.
    Three candidate keys share one cached scan; each check is one
    distinct-agg (at 100 TB: approx_count_distinct first, exact only
    on keys that pass the sketch screen)."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")

    def audit(name: str, cols: list[str]):
        return ev.agg(
            F.lit(name).alias("candidate_key"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols]).cast("bigint").alias("n_distinct"),
        ).select(
            "candidate_key",
            "n_rows",
            "n_distinct",
            (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        )

    return (
        audit("event_id", ["event_id"])
        .unionByName(audit("user_id+ts", ["user_id", "ts"]))
        .unionByName(audit("user_id", ["user_id"]))
    )


@query(
    "events_encoding_advisor",
    """
    WITH ordered AS (
      SELECT event_type, user_id,
             LAG(event_type) OVER (ORDER BY event_id) AS prev_et,
             LAG(user_id) OVER (ORDER BY event_id) AS prev_uid
      FROM events
    ),
    stats AS (
      SELECT 'event_type' AS column_name,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN prev_et IS NULL OR prev_et <> event_type
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM ordered
      UNION ALL
      SELECT 'user_id',
             CAST(COUNT(DISTINCT user_id) AS BIGINT),
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN prev_uid IS NULL OR prev_uid <> user_id
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM ordered
    )
    SELECT column_name, ndv, n_rows, n_runs,
           CASE WHEN ndv * 20 <= n_rows AND n_runs * 4 <= n_rows THEN 'dict+rle'
                WHEN ndv * 20 <= n_rows THEN 'dict'
                ELSE 'plain' END AS suggested_encoding
    FROM stats
    """,
)
def events_encoding_advisor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor: per column, exact cardinality and
    run count in the table's physical order → dictionary / RLE /
    plain suggestion — the storage-layout scorecard that tells you
    whether a sort (or Z-order) before write would make the parquet
    pages collapse. A global ``lag`` would funnel the whole fact table
    through one task, so the run count is computed two-phase: assign a
    DETERMINISTIC frozen-boundary range-bucket id (relational.
    frozen_range_ids — boundaries are plan literals, so the lag branch
    and the boundary branch always agree, with no persist), lag INSIDE
    each bucket with a parallel window, and stitch the bucket
    boundaries by broadcasting each bucket's last row to the next
    bucket's first (≤ buckets rows of boundary state — the classic
    distributed run-length shape). Adjacent-id stitching is sound
    because frozen_range_ids guarantees every bucket ≥ 1 is non-empty
    (each boundary is a real sampled row): the only absent carry is
    for the bucket holding the true global first row, whose null prev
    is exactly right."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import frozen_range_ids

    ev = load_table(spark, sf_dir, "events")
    ranged, _nb = frozen_range_ids(
        ev.select("event_id", "event_type", "user_id"),
        [F.col("event_id")],
        id_col="_pid",
    )
    w = W.partitionBy("_pid").orderBy("event_id")
    local = ranged.select(
        "_pid",
        "event_type",
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_et"),
        F.lag("user_id").over(w).alias("prev_uid"),
        F.row_number().over(w).alias("_rn"),
    )
    bounds = ranged.groupBy("_pid").agg(
        F.max_by("event_type", "event_id").alias("_last_et"),
        F.max_by("user_id", "event_id").alias("_last_uid"),
    )
    carry = bounds.select(
        (F.col("_pid") + 1).alias("_pid"),
        F.col("_last_et").alias("_carry_et"),
        F.col("_last_uid").alias("_carry_uid"),
    )
    ordered = (
        local.join(F.broadcast(carry), "_pid", "left")
        .select(
            "event_type",
            "user_id",
            F.when(F.col("_rn") == 1, F.col("_carry_et"))
            .otherwise(F.col("prev_et"))
            .alias("prev_et"),
            F.when(F.col("_rn") == 1, F.col("_carry_uid"))
            .otherwise(F.col("prev_uid"))
            .alias("prev_uid"),
        )
    )

    def stat(name: str, col: str, prev: str):
        return ordered.agg(
            F.lit(name).alias("column_name"),
            F.count_distinct(F.col(col)).cast("bigint").alias("ndv"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.when(
                    F.col(prev).isNull() | (F.col(prev) != F.col(col)), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
        )

    stats = stat("event_type", "event_type", "prev_et").unionByName(
        stat("user_id", "user_id", "prev_uid")
    )
    suggestion = (
        F.when(
            (F.col("ndv") * 20 <= F.col("n_rows"))
            & (F.col("n_runs") * 4 <= F.col("n_rows")),
            F.lit("dict+rle"),
        )
        .when(F.col("ndv") * 20 <= F.col("n_rows"), F.lit("dict"))
        .otherwise(F.lit("plain"))
    )
    return stats.select(
        "column_name", "ndv", "n_rows", "n_runs", suggestion.alias("suggested_encoding")
    )


@query(
    "events_woe_iv",
    """
    WITH users AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(ROUND(value * 100) AS BIGINT)
                               ELSE 0 END) >= 59000
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    binned AS (
      SELECT CASE WHEN clicks < 5 THEN '00-04'
                  WHEN clicks < 10 THEN '05-09'
                  WHEN clicks < 20 THEN '10-19'
                  ELSE '20+' END AS click_bin,
             converted
      FROM users
    ),
    agg AS (
      SELECT click_bin,
             CAST(SUM(converted) AS BIGINT) AS n_good,
             CAST(SUM(1 - converted) AS BIGINT) AS n_bad
      FROM binned GROUP BY click_bin
    ),
    tot AS (SELECT SUM(n_good) AS gt, SUM(n_bad) AS bt FROM agg)
    SELECT click_bin, n_good, n_bad,
           ROUND(LN(((CAST(n_good AS DOUBLE) + 0.5) / gt)
                    / ((CAST(n_bad AS DOUBLE) + 0.5) / bt)), 6) AS woe,
           ROUND(((CAST(n_good AS DOUBLE) + 0.5) / gt
                  - (CAST(n_bad AS DOUBLE) + 0.5) / bt)
                 * LN(((CAST(n_good AS DOUBLE) + 0.5) / gt)
                      / ((CAST(n_bad AS DOUBLE) + 0.5) / bt)), 6) AS iv_contrib
    FROM agg CROSS JOIN tot
    """,
)
def events_woe_iv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature screening: bin a
    behavioral feature (click count), label users by conversion, and
    report per-bin WOE = ln(good%/bad%) with 0.5 smoothing plus the IV
    contribution — the standard monotonicity/strength check run before
    admitting a feature to a model. Shape: one user rollup, one bin
    rollup, totals as a broadcast 1-row aggregate; nothing beyond the
    user-key shuffle touches the fact table."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("clicks"),
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            >= 59000,
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    binned = users.select(
        F.when(F.col("clicks") < 5, "00-04")
        .when(F.col("clicks") < 10, "05-09")
        .when(F.col("clicks") < 20, "10-19")
        .otherwise("20+")
        .alias("click_bin"),
        "converted",
    )
    agg = binned.groupBy("click_bin").agg(
        F.sum("converted").cast("bigint").alias("n_good"),
        F.sum(1 - F.col("converted")).cast("bigint").alias("n_bad"),
    )
    tot = agg.agg(
        F.sum("n_good").alias("gt"), F.sum("n_bad").alias("bt")
    )
    gshare = (F.col("n_good").cast("double") + 0.5) / F.col("gt")
    bshare = (F.col("n_bad").cast("double") + 0.5) / F.col("bt")
    woe = F.log(gshare / bshare)
    return agg.crossJoin(F.broadcast(tot)).select(
        "click_bin",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round((gshare - bshare) * woe, 6).alias("iv_contrib"),
    )


@query(
    "ab_test_analysis",
    """
    WITH assigned AS (
      SELECT user_id, (user_id * 2654435761 % 1000000007) % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(ROUND(value * 100) AS BIGINT)
                               ELSE 0 END) >= 59000
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM assigned GROUP BY arm
    ),
    tot AS (
      SELECT SUM(n_users) AS n, SUM(n_converted) AS c FROM arms
    )
    SELECT arm, n_users, n_converted,
           ROUND(CAST(n_converted AS DOUBLE) / n_users, 6) AS conv_rate,
           ROUND(
             POW(n_converted - n_users * (CAST(c AS DOUBLE) / n), 2)
               / (n_users * (CAST(c AS DOUBLE) / n))
             + POW((n_users - n_converted) - n_users * (1 - CAST(c AS DOUBLE) / n), 2)
               / (n_users * (1 - CAST(c AS DOUBLE) / n)),
             6) AS chisq_contrib
    FROM arms, tot
    """,
)
def ab_test_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout: users land in arms by a deterministic
    hash (the replayable substitute for random assignment — stable
    across reruns and engines), "converted" = lifetime purchase cents
    over a mid-distribution threshold (a rate near 0.5, so both
    chi-square cells are populated), per-arm conversion is one rollup, and
    each arm's chi-square contribution against the pooled rate gives
    the independence test the experiment decision reads. The pooled
    totals ride a broadcast 1-row aggregate."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            >= 59000
        )
        .cast("int")
        .alias("converted")
    ).select(
        # mod-first keeps the LCG product under int64 at any user count:
        # (a·c) mod M == ((a mod M)·c) mod M
        (((F.col("user_id") % 1_000_000_007) * 2654435761 % 1_000_000_007) % 2).alias("arm"),
        "converted",
    )
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    tot = arms.agg(
        F.sum("n_users").alias("n"), F.sum("n_converted").alias("c")
    )
    j = arms.crossJoin(F.broadcast(tot))
    p = F.col("c").cast("double") / F.col("n")
    exp_c = F.col("n_users") * p
    exp_nc = F.col("n_users") * (1 - p)
    return j.select(
        "arm",
        "n_users",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_users"), 6).alias(
            "conv_rate"
        ),
        F.round(
            F.pow(F.col("n_converted") - exp_c, 2) / exp_c
            + F.pow((F.col("n_users") - F.col("n_converted")) - exp_nc, 2) / exp_nc,
            6,
        ).alias("chisq_contrib"),
    )


@query(
    "events_value_psi",
    """
    WITH bucketed AS (
      SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'ref' ELSE 'cur' END AS period,
             LEAST(CAST(FLOOR(value / 5) AS BIGINT), 9) AS bucket
      FROM events
    ),
    counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM counts)
    SELECT bucket, n_ref, n_cur,
           ROUND((CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr)
                 * LN((CAST(n_cur AS DOUBLE) / tc) / (CAST(n_ref AS DOUBLE) / tr)),
                 6) AS psi_contrib
    FROM counts, tot
    """,
)
def events_value_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index between the first half-month and the
    rest: value deciles (fixed-width buckets, capped), per-bucket
    share shift times the log-ratio — the standard drift alarm for a
    scored feature between a reference and a current period. One scan,
    one conditional rollup, a broadcast totals row."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        F.when(
            F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), "ref"
        )
        .otherwise("cur")
        .alias("period"),
        F.least(F.floor(F.col("value") / 5).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bucket"
        ),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    tot = counts.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    j = counts.crossJoin(F.broadcast(tot))
    pr = F.col("n_ref").cast("double") / F.col("tr")
    pc = F.col("n_cur").cast("double") / F.col("tc")
    return j.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_contrib"),
    )


@query(
    "events_volume_anomaly_days",
    """
    WITH feed AS (
      SELECT * FROM events
      WHERE NOT (CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) = '2024-01-20'
                 AND event_id % 2 = 0)
    ),
    d AS (
      SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM feed GROUP BY 1
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_events, day) AS rk,
             COUNT(*) OVER () AS cnt
      FROM d
    ),
    med AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS med2
      FROM r WHERE rk IN ((cnt + 1) // 2, (cnt + 2) // 2)
    ),
    dev AS (
      SELECT d.day, d.n_events, ABS(2 * d.n_events - m.med2) AS dev2
      FROM d, med m
    ),
    rd AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY dev2, day) AS rk,
             COUNT(*) OVER () AS cnt
      FROM dev
    ),
    mad AS (
      SELECT CAST(SUM(dev2) AS BIGINT) AS mad4
      FROM rd WHERE rk IN ((cnt + 1) // 2, (cnt + 2) // 2)
    )
    SELECT dv.day, dv.n_events, 4 * dv.dev2 > 3 * 2 * md.mad4 AS flagged
    FROM dev dv, mad md
    """,
)
def events_volume_anomaly_days_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection with integer-exact robust stats:
    median and MAD of the per-day event counts via exact rank positions
    (scaled-integer arithmetic throughout — no float median, so the
    flag is engine-replayable), flagging days beyond 3 MADs. A
    deterministic half-volume drop is injected on one day so the alarm
    path is exercised, mirroring the backfill planner's gap-injection
    convention."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    feed = ev.where(
        ~((F.col("day") == "2024-01-20") & (F.col("event_id") % 2 == 0))
    )
    d = feed.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))

    def two_middle(df, val):
        r = df.withColumn(
            "rk", F.row_number().over(W.orderBy(val, "day"))
        ).withColumn("cnt", F.count(F.lit(1)).over(W.partitionBy()))
        return r.where(
            (F.col("rk") == F.expr("(cnt + 1) div 2"))
            | (F.col("rk") == F.expr("(cnt + 2) div 2"))
        ).agg(F.sum(val).cast("bigint").alias("m"))

    med2 = two_middle(d, "n_events").withColumnRenamed("m", "med2")
    dev = d.crossJoin(F.broadcast(med2)).withColumn(
        "dev2", F.abs(2 * F.col("n_events") - F.col("med2"))
    )
    mad4 = two_middle(dev, "dev2").withColumnRenamed("m", "mad4")
    return dev.crossJoin(F.broadcast(mad4)).select(
        "day",
        "n_events",
        (4 * F.col("dev2") > 3 * 2 * F.col("mad4")).alias("flagged"),
    )


@query(
    "events_hourly_ffill",
    """
    WITH hourly AS (
      SELECT event_type,
             to_timestamp(CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN rk = 1 THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS close_c
      FROM (
        SELECT event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                   to_timestamp(CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900)
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events
      ) GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS h
                  FROM bounds) g
    ),
    joined AS (
      SELECT spine.event_type, spine.h,
             COALESCE(hourly.n_events, 0) AS n_events, hourly.close_c
      FROM spine LEFT JOIN hourly
        ON spine.event_type = hourly.event_type AND spine.h = hourly.h
    )
    SELECT event_type, CAST(strftime(h, '%Y-%m-%d %H:%M') AS VARCHAR) AS bucket_key,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(LAST_VALUE(close_c IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS close_ffill_c,
           n_events = 0 AS is_gap
    FROM joined
    """,
)
def events_hourly_ffill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: build the full (event_type x
    15-minute-bucket) spine between the observed bounds, left-join the
    bucket rollup, and FORWARD-FILL the last observed close into gaps
    (last-ignorenulls running window) — the gap-fill primitive every
    feature pipeline needs before resampling or joining time grids.
    Scale shape: the spine is GENERATED (dims x hours — grows with
    time, not with data volume), the rollup is one hash agg of the
    fact table, and the fill window partitions by type over
    hours-in-range rows, so a 100x data growth changes only the
    pre-aggregation, never the window length. Hourly close is picked
    by a deterministic (ts, event_id) rank, as in events_daily_ohlc."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events").withColumn(
        "h",
        F.timestamp_seconds(
            F.expr("unix_timestamp(ts) div 900") * 900
        ),
    )
    wr = W.partitionBy("event_type", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        ev.select(
            "event_type",
            "h",
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
            F.row_number().over(wr).alias("rk"),
        )
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("rk") == 1, F.col("v_c")).otherwise(0))
            .cast("bigint")
            .alias("close_c"),
        )
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 15 minutes"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "close_c",
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm").alias("bucket_key"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.last("close_c", ignorenulls=True)
        .over(wf)
        .cast("bigint")
        .alias("close_ffill_c"),
        (F.col("n_events") == 0).alias("is_gap"),
    )


@query(
    "events_daily_ohlc",
    """
    WITH ranked AS (
      SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR)
                                ORDER BY ts, event_id) AS rk_open,
             ROW_NUMBER() OVER (PARTITION BY CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR)
                                ORDER BY ts DESC, event_id DESC) AS rk_close
      FROM events
    )
    SELECT day,
           CAST(SUM(CASE WHEN rk_open = 1 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS open_c,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS high_c,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS low_c,
           CAST(SUM(CASE WHEN rk_close = 1 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked GROUP BY day
    """,
)
def events_daily_ohlc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC rollup of the value stream: open/close picked by
    deterministic (ts, event_id) rank windows (no engine-specific
    arg_min tie semantics), high/low/count as plain aggregates — the
    candlestick shape every time-series store needs, on ONE day
    partitioning shared by both rank windows and the final rollup."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    wo = W.partitionBy("day").orderBy("ts", "event_id")
    wc = W.partitionBy("day").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.select(
        "day",
        cents.alias("v_c"),
        F.row_number().over(wo).alias("rk_open"),
        F.row_number().over(wc).alias("rk_close"),
    )
    return ranked.groupBy("day").agg(
        F.sum(F.when(F.col("rk_open") == 1, F.col("v_c")).otherwise(0))
        .cast("bigint")
        .alias("open_c"),
        F.max("v_c").cast("bigint").alias("high_c"),
        F.min("v_c").cast("bigint").alias("low_c"),
        F.sum(F.when(F.col("rk_close") == 1, F.col("v_c")).otherwise(0))
        .cast("bigint")
        .alias("close_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@query(
    "conversion_latency_quantiles",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT user_id,
             (first_purchase_us - first_view_us) // 60000000 AS latency_min
      FROM firsts
      WHERE first_view_us IS NOT NULL AND first_purchase_us IS NOT NULL
        AND first_purchase_us >= first_view_us
    ),
    ranked AS (
      SELECT latency_min,
             ROW_NUMBER() OVER (ORDER BY latency_min, user_id) AS rk,
             COUNT(*) OVER () AS n
      FROM lat
    )
    SELECT q.q AS quantile_pct, CAST(r.latency_min AS BIGINT) AS latency_min
    FROM (SELECT UNNEST([25, 50, 75, 90, 99]) AS q) q
    JOIN ranked r ON r.rk = GREATEST(1, CAST(CEIL(q.q * r.n / 100.0) AS BIGINT))
    """,
)
def conversion_latency_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view to first-purchase latency distribution: one
    conditional-min rollup per user, integer minute deltas, exact
    rank-position quantiles (ceil(q·n/100), the same exact-order-
    statistic convention as exact_group_quantiles — no interpolation,
    so the report is engine-replayable). The funnel-latency metric a
    growth dashboard reads. The rank comes from the two-phase
    :func:`global_rank` (parallel range-partitioned sort, no
    single-partition window) and the five target positions are a
    broadcast 5-row table joined on the rank."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import global_rank

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ts_us("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", ts_us("ts"))).alias("fp"),
    )
    lat = firsts.where(
        F.col("fv").isNotNull() & F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))
    ).select(
        "user_id", F.expr("(fp - fv) div 60000000").alias("latency_min")
    )
    ranked = global_rank(
        lat, [F.col("latency_min"), F.col("user_id")], rank_col="rk"
    )
    ntotal = lat.agg(F.count(F.lit(1)).alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in (25, 50, 75, 90, 99)])).alias(
            "quantile_pct"
        )
    )
    targets = qs.crossJoin(ntotal).select(
        "quantile_pct",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("quantile_pct") * F.col("n") / 100.0).cast("bigint"),
        ).alias("rk"),
    )
    return ranked.join(F.broadcast(targets), "rk").select(
        "quantile_pct", F.col("latency_min").cast("bigint").alias("latency_min")
    )


@query(
    "events_weekly_wow_growth",
    """
    WITH w AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 1000000 - 1704067200) // 604800 AS BIGINT) AS week_no,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_no, CAST(n AS BIGINT) AS n_events,
           CAST(lag_n AS BIGINT) AS prev_events,
           CASE WHEN lag_n IS NOT NULL AND lag_n > 0
                THEN CAST((n - lag_n) * 10000 // lag_n AS BIGINT) END AS wow_growth_bp
    FROM (
      SELECT *, LAG(n) OVER (PARTITION BY event_type ORDER BY week_no) AS lag_n
      FROM w
    )
    """,
)
def events_weekly_wow_growth_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type in exact integer basis
    points (floor((Δ·10000)/prev) — no float percentage, so the number
    can never drift): epoch-derived week index (engine-neutral, no
    ISO-week convention hazards), one (type, week) rollup, one lag
    window on the same partitioning."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "event_type",
        F.expr("cast((unix_micros(cast(ts as timestamp)) div 1000000 - 1704067200) div 604800 as bigint)").alias(
            "week_no"
        ),
    ).groupBy("event_type", "week_no").agg(F.count(F.lit(1)).alias("n"))
    lw = W.partitionBy("event_type").orderBy("week_no")
    out = weekly.withColumn("lag_n", F.lag("n").over(lw))
    return out.select(
        "event_type",
        "week_no",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("lag_n").cast("bigint").alias("prev_events"),
        F.when(
            F.col("lag_n").isNotNull() & (F.col("lag_n") > 0),
            F.expr("cast((n - lag_n) * 10000 div lag_n as bigint)"),
        ).alias("wow_growth_bp"),
    )


@query(
    "events_user_activity_gini",
    """
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i,
             COUNT(*) OVER () AS nn, SUM(n) OVER () AS tot
      FROM per_user
    )
    SELECT CAST(MAX(nn) AS BIGINT) AS n_users,
           CAST(MAX(tot) AS BIGINT) AS total_events,
           ROUND(2.0 * SUM(i * n) / (MAX(nn) * MAX(tot)) - (MAX(nn) + 1.0) / MAX(nn), 6)
             AS gini
    FROM ranked
    """,
)
def events_user_activity_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity — the concentration number
    behind "do 1% of users generate 90% of events": rank-weighted sum
    formula over EXACT integer counts (Σ i·x over sorted x), with the
    only float step the final one-row division — both engines compute
    the same expression on the same integers, so the 6-decimal Gini is
    replay-stable. One rollup + a two-phase :func:`global_rank` on the
    per-user pre-agg (range-partitioned parallel rank — never a
    single-partition window), and the count/total come straight out of
    the one final aggregate instead of per-row global windows."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import global_rank

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = global_rank(
        per_user, [F.col("n"), F.col("user_id")], rank_col="i"
    )
    nn = F.count(F.lit(1))
    tot = F.sum("n")
    return ranked.agg(
        nn.cast("bigint").alias("n_users"),
        tot.cast("bigint").alias("total_events"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("n")) / (nn * tot) - (nn + 1.0) / nn,
            6,
        ).alias("gini"),
    )


@query(
    "ab_test_bootstrap_ci",
    """
    WITH assigned AS (
      SELECT user_id, (user_id * 2654435761 % 1000000007) % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(ROUND(value * 100) AS BIGINT)
                               ELSE 0 END) >= 59000
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    reps AS (
      SELECT a.user_id, a.arm, a.converted, b.b AS b,
             (((a.user_id % 1000000007) * (2654435761 + b.b * 40503) + b.b * 97 + 17)
                % 1000000007) AS h1
      FROM assigned a, (SELECT UNNEST(generate_series(0, 199)) AS b) b
    ),
    weighted AS (
      SELECT b, arm, converted, (h1 * h1 + h1) % 1000000007 % 3 AS w FROM reps
    ),
    per_rep AS (
      SELECT b,
             SUM(CASE WHEN arm = 1 THEN w * converted ELSE 0 END) * 10000
               // GREATEST(SUM(CASE WHEN arm = 1 THEN w ELSE 0 END), 1)
             - SUM(CASE WHEN arm = 0 THEN w * converted ELSE 0 END) * 10000
               // GREATEST(SUM(CASE WHEN arm = 0 THEN w ELSE 0 END), 1) AS diff_bp
      FROM weighted GROUP BY b
    ),
    ranked AS (
      SELECT diff_bp, ROW_NUMBER() OVER (ORDER BY diff_bp, b) AS r FROM per_rep
    ),
    point AS (
      SELECT SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) * 10000
               // SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             - SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) * 10000
               // SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS point_bp,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM assigned
    )
    SELECT CAST(p.n_users AS BIGINT) AS n_users,
           CAST(p.point_bp AS BIGINT) AS point_diff_bp,
           CAST(MAX(CASE WHEN r.r = 5 THEN r.diff_bp END) AS BIGINT) AS ci_lo_bp,
           CAST(MAX(CASE WHEN r.r = 195 THEN r.diff_bp END) AS BIGINT) AS ci_hi_bp
    FROM point p, ranked r
    GROUP BY p.n_users, p.point_bp
    """,
)
def ab_test_bootstrap_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the A/B conversion-rate delta
    WITHOUT rand(): a multiplier bootstrap where replica b reweights
    user u by a deterministic mixed-LCG draw in {0,1,2} (mean-1
    multiplier — same two-round integer mix as the rendezvous hash, so
    replica weights avalanche instead of cycling), 200 replicas, each
    replica's arm rates in exact integer basis points, CI = the exact
    5th/195th order statistics of the replica deltas. Everything until
    the final 4 output cells is integer arithmetic — the readout is
    engine-replayable, rerun-stable, and retry-safe, which a
    rand()-based bootstrap can never be.

    Scale shape: users × 200 replicas explode map-side, collapse in
    ONE partial-aggregated rollup to 400 (replica, arm) cells; the
    rank runs over 200 tiny rows."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    M = 1_000_000_007
    assigned = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            >= 59000,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        "user_id",
        (((F.col("user_id") % M) * 2654435761 % M) % 2).alias("arm"),
        "converted",
    )
    reps = assigned.select(
        "user_id",
        "arm",
        "converted",
        F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b"),
    )
    h1 = ((F.col("user_id") % M) * (2654435761 + F.col("b") * 40503) + F.col("b") * 97 + 17) % M
    weighted = reps.select("b", "arm", "converted", ((h1 * h1 + h1) % M % 3).alias("w"))
    # integer div must be `div`, not `/`, for exact replay in the oracle
    per_rep = weighted.groupBy("b").agg(
        F.expr(
            "sum(case when arm = 1 then w * converted else 0 end) * 10000"
            " div greatest(sum(case when arm = 1 then w else 0 end), 1)"
            " - sum(case when arm = 0 then w * converted else 0 end) * 10000"
            " div greatest(sum(case when arm = 0 then w else 0 end), 1)"
        ).alias("diff_bp")
    )
    ranked = per_rep.withColumn(
        "r", F.row_number().over(W.orderBy("diff_bp", "b"))  # 200 rows, constant-bounded
    )
    point = assigned.agg(
        F.expr(
            "sum(case when arm = 1 then converted else 0 end) * 10000"
            " div sum(case when arm = 1 then 1 else 0 end)"
            " - sum(case when arm = 0 then converted else 0 end) * 10000"
            " div sum(case when arm = 0 then 1 else 0 end)"
        ).alias("point_bp"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    ci = ranked.agg(
        F.max(F.when(F.col("r") == 5, F.col("diff_bp"))).cast("bigint").alias("ci_lo_bp"),
        F.max(F.when(F.col("r") == 195, F.col("diff_bp"))).cast("bigint").alias("ci_hi_bp"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_users",
        F.col("point_bp").cast("bigint").alias("point_diff_bp"),
        "ci_lo_bp",
        "ci_hi_bp",
    )


@query(
    "events_cusum_changepoint",
    """
    WITH ev AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_id FROM events
    ),
    feed AS (
      SELECT * FROM ev WHERE NOT (day >= '2024-01-20' AND event_id % 2 = 0)
    ),
    d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events FROM feed GROUP BY day),
    c AS (
      SELECT day, n_events,
             CAST(SUM(n_events) OVER (ORDER BY day) AS BIGINT) AS s_i,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(n_events) OVER () AS BIGINT) AS s_n,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d
    ),
    dev AS (SELECT *, ABS(n * s_i - i * s_n) AS d_i FROM c),
    best AS (
      SELECT * FROM dev ORDER BY d_i DESC, day ASC LIMIT 1
    )
    SELECT day AS change_day, d_i AS d_max,
           CAST(n AS BIGINT) AS n_days,
           (1000 * s_i) // i AS pre_mean_milli,
           CASE WHEN n > i THEN (1000 * (s_n - s_i)) // (n - i) END
             AS post_mean_milli
    FROM best
    """,
)
def events_cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point location over the daily event volume — the
    statistical-process-control primitive a pipeline monitor runs to
    LOCATE a level shift (the MAD anomaly flags that a day is odd;
    CUSUM says where the regime changed). Integer-exact: deviation
    D_i = |n·S_i − i·S_n| (cross-multiplied, no float mean), argmax by
    (D desc, day asc) as ONE min-of-struct agg — no driver logic, no
    sort of the full table. A deterministic REGIME SHIFT is injected
    (half volume on every day from 2024-01-20 on — the level-shift
    analog of events_volume_anomaly_days' single-day drop) so the
    located boundary is a true change, not noise.

    Scale shape: one groupBy(day) agg shrinks the stream to a
    days-sized table; the cumsum window runs over that tiny rollup
    (never the raw events), and the argmax is a hash agg."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    feed = ev.where(
        ~((F.col("day") >= "2024-01-20") & (F.col("event_id") % 2 == 0))
    )
    d = feed.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    c = (
        d.withColumn("s_i", F.sum("n_events").over(W.orderBy("day")).cast("long"))
        .withColumn("i", F.row_number().over(W.orderBy("day")).cast("long"))
        .withColumn("s_n", F.sum("n_events").over(W.partitionBy()).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy()).cast("long"))
    )
    dev = c.withColumn("d_i", F.abs(F.col("n") * F.col("s_i") - F.col("i") * F.col("s_n")))
    best = dev.agg(
        F.min(
            F.struct((-F.col("d_i")).alias("neg"), "day", "d_i", "s_i", "i", "s_n", "n")
        ).alias("m")
    ).select("m.*")
    return best.select(
        F.col("day").alias("change_day"),
        F.col("d_i").cast("bigint").alias("d_max"),
        F.col("n").cast("bigint").alias("n_days"),
        F.expr("(1000 * s_i) div i").cast("bigint").alias("pre_mean_milli"),
        F.when(
            F.col("n") > F.col("i"),
            F.expr("(1000 * (s_n - s_i)) div (n - i)"),
        )
        .cast("bigint")
        .alias("post_mean_milli"),
    )


@query(
    "stream_cusum_alerts",
    """
    WITH d AS (
      SELECT event_type, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) - 5500 AS d_i
      FROM events
    ),
    s AS (
      SELECT *, SUM(d_i) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS s_i
      FROM d
    ),
    c AS (
      SELECT *, s_i - LEAST(0, MIN(s_i) OVER (PARTITION BY event_type
                                              ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING)) AS c_val
      FROM s
    ),
    x AS (
      SELECT *, LAG(c_val) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pc
      FROM c
    )
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(c_val AS BIGINT) AS c_val
    FROM x WHERE c_val > 50000 AND COALESCE(pc <= 50000, TRUE)
    """,
)
def stream_cusum_alerts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of the streaming CUSUM drift detector
    (EV.cusum_alerts_stream — O(1) per-key state): one-sided CUSUM via
    the Lindley closed form (C = S − min(0, running min S)), alerting
    on upward threshold crossings; every window rides one
    hashpartitioning(event_type) exchange."""
    return EV.cusum_alerts_batch(load_table(spark, sf_dir, "events"))


@query(
    "purged_timeseries_folds",
    """
    WITH days AS (
      SELECT CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS day_cnt
      FROM events GROUP BY day
    ),
    ranked AS (
      SELECT day, day_cnt,
             ROW_NUMBER() OVER (ORDER BY day) AS r,
             COUNT(*) OVER () AS d
      FROM days
    ),
    folds AS (SELECT *, CAST(((r - 1) * 5) // d AS INTEGER) AS fold FROM ranked),
    bounds AS (
      SELECT fold, MIN(day) AS test_start, MAX(day) AS test_end
      FROM folds GROUP BY fold
    ),
    classified AS (
      SELECT b.fold, b.test_start, b.test_end, f.day, f.day_cnt,
             CASE
               WHEN f.day BETWEEN b.test_start AND b.test_end THEN 'test'
               WHEN CAST(f.day AS DATE) >= CAST(b.test_start AS DATE) - INTERVAL 1 DAY
                AND CAST(f.day AS DATE) <= CAST(b.test_end AS DATE) + INTERVAL 1 DAY
                 THEN 'embargo'
               ELSE 'train'
             END AS role
      FROM bounds b CROSS JOIN folds f
    )
    SELECT fold, test_start, test_end,
           CAST(SUM(CASE WHEN role = 'test' THEN day_cnt ELSE 0 END) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN role = 'embargo' THEN day_cnt ELSE 0 END) AS BIGINT) AS n_embargo,
           CAST(SUM(CASE WHEN role = 'train' THEN day_cnt ELSE 0 END) AS BIGINT) AS n_train
    FROM classified GROUP BY fold, test_start, test_end
    """,
)
def purged_timeseries_folds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged K-fold temporal cross-validation plan with a 1-day
    embargo (the leakage-safe splitter for time-series models: each
    fold's test window is contiguous in time, and events within the
    embargo margin of the test window join NEITHER side): 5 folds
    assigned by exact integer division over the ranked day index.

    Scale shape: the fact table is crushed to a per-day rollup by ONE
    hash agg (map-side partials); everything after — the rank window,
    fold bounds, the 5×D day-classification cross join — runs on the
    tiny day dimension (D rows), so the single-partition rank window
    is over a pre-aggregated dimension, never the facts."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("day_cnt")
    )
    wr = W.orderBy("day")
    ranked = days.select(
        "day",
        "day_cnt",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("d"),
    )
    folds = ranked.withColumn(
        "fold", F.expr("((r - 1) * 5) div d").cast("int")
    )
    bounds = folds.groupBy("fold").agg(
        F.min("day").alias("test_start"), F.max("day").alias("test_end")
    )
    c = bounds.crossJoin(
        folds.select(F.col("day").alias("dday"), "day_cnt")
    ).withColumn(
        "role",
        F.when(
            F.col("dday").between(F.col("test_start"), F.col("test_end")),
            F.lit("test"),
        )
        .when(
            (F.to_date("dday") >= F.date_sub(F.to_date("test_start"), 1))
            & (F.to_date("dday") <= F.date_add(F.to_date("test_end"), 1)),
            F.lit("embargo"),
        )
        .otherwise(F.lit("train")),
    )
    return c.groupBy("fold", "test_start", "test_end").agg(
        F.sum(F.when(F.col("role") == "test", F.col("day_cnt")).otherwise(0))
        .cast("long")
        .alias("n_test"),
        F.sum(F.when(F.col("role") == "embargo", F.col("day_cnt")).otherwise(0))
        .cast("long")
        .alias("n_embargo"),
        F.sum(F.when(F.col("role") == "train", F.col("day_cnt")).otherwise(0))
        .cast("long")
        .alias("n_train"),
    )


@query(
    "decayed_heavy_hitters",
    """
    WITH t AS (SELECT CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS t_max FROM events),
    w AS (
      SELECT event_type,
             t_max - CAST(FLOOR(epoch(ts)) AS BIGINT) AS age_s
      FROM events CROSS JOIN t
    ),
    decayed AS (
      SELECT event_type,
             CASE WHEN age_s // 604800 >= 40 THEN 0
                  ELSE (1000000 * (1209600 - age_s % 604800))
                       // (1209600 * (1 << CAST(age_s // 604800 AS INTEGER)))
             END AS w_micro
      FROM w
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(w_micro) AS BIGINT) AS dw_micro
      FROM decayed GROUP BY event_type
    )
    SELECT event_type, n_events,
           ROUND(CAST(dw_micro AS DOUBLE) / 1000000.0, 6) AS decayed_weight,
           CAST(ROW_NUMBER() OVER (ORDER BY dw_micro DESC, event_type) AS INTEGER) AS rank
    FROM agg
    """,
)
def decayed_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed heavy hitters ("trending now"): per-event-type mass
    under a 7-day half-life decay anchored at the corpus max timestamp.
    The decay is piecewise-LINEAR within each half-life period —
    w = (2H − (age mod H)) / 2H · 2^−⌊age/H⌋ in integer micro-units —
    so every weight is exact integer arithmetic (no transcendental
    whose last-ulp rounding differs across engines) and the per-type
    sums are order-independent. Ages beyond 40 half-lives floor to 0
    before the shift could overflow.

    Scale shape: the anchor is a broadcast 1-row max; weights are
    map-side row arithmetic; ONE event_type hash agg with integer
    partials; the rank window runs over the tiny type dimension."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    t = ev.agg(F.unix_timestamp(F.max("ts")).cast("long").alias("t_max"))
    w = ev.crossJoin(F.broadcast(t)).select(
        "event_type",
        (F.col("t_max") - F.unix_timestamp("ts").cast("long")).alias("age_s"),
    )
    h = 604800  # 7-day half-life in seconds
    w_micro = F.when(F.expr(f"age_s div {h}") >= 40, F.lit(0).cast("long")).otherwise(
        F.expr(
            f"(1000000 * ({2 * h} - age_s % {h})) div "
            f"({2 * h} * shiftleft(1L, CAST(age_s div {h} AS INT)))"
        )
    )
    agg = w.select("event_type", w_micro.alias("w_micro")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("w_micro").cast("long").alias("dw_micro"),
    )
    wr = W.orderBy(F.desc("dw_micro"), F.asc("event_type"))
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.col("dw_micro").cast("double") / 1e6, 6).alias("decayed_weight"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


_US_DAY = 86_400_000_000
_KS_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC


@query(
    "events_ks_drift",
    f"""
    WITH g AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             SUM(CASE WHEN epoch_us(ts) < {_KS_SPLIT_US} THEN 1 ELSE 0 END) AS c_a,
             SUM(CASE WHEN epoch_us(ts) < {_KS_SPLIT_US} THEN 0 ELSE 1 END) AS c_b
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a, CAST(SUM(c_b) AS BIGINT) AS n_b FROM g),
    cum AS (
      SELECT v_c,
             SUM(c_a) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(c_b) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM g
    ),
    d AS (
      SELECT n_a, n_b,
             ABS(CAST(n_b AS DECIMAL(38,0)) * CAST(cum_a AS DECIMAL(38,0))
                 - CAST(n_a AS DECIMAL(38,0)) * CAST(cum_b AS DECIMAL(38,0))) AS dd,
             v_c
      FROM cum CROSS JOIN t
    ),
    m AS (SELECT n_a, n_b, MAX(dd) AS d_num FROM d GROUP BY 1, 2)
    SELECT m.n_a, m.n_b,
           CAST(m.d_num AS BIGINT) AS d_num,
           CAST((CAST(10000 AS HUGEINT) * CAST(m.d_num AS HUGEINT))
                // (CAST(m.n_a AS HUGEINT) * CAST(m.n_b AS HUGEINT)) AS BIGINT)
             AS ks_bp,
           CAST((SELECT MIN(v_c) FROM d WHERE d.dd = m.d_num) AS BIGINT) AS d_at_value
    FROM m
    """,
)
def events_ks_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift statistic between the
    first and second half of the month (split at Jan 16): the
    distribution-shift monitor PSI can't provide (KS is binning-free
    and gives the exact sup-distance plus WHERE it occurs). Shape: one
    hash agg to distinct cents (bounded by the value domain, not row
    count), running ECDFs via global_rank's frozen-boundary cumsum (no
    single-partition window anywhere), 1-row totals broadcast; the D
    numerator is exact DECIMAL(38,0) cross-multiplication — counts to
    ~1e18 per side cannot overflow, the events_quantile_normalize
    convention."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import ks_two_sample

    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        ts_us("ts").alias("t_us"),
    )
    return ks_two_sample(ev, "v_c", F.col("t_us") < F.lit(_KS_SPLIT_US))


@query(
    "events_type_trend_slope",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_US_DAY} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    centered AS (
      SELECT event_type,
             day_idx - MIN(day_idx) OVER (PARTITION BY event_type) AS x, y
      FROM daily
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM centered GROUP BY 1
    )
    SELECT event_type, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST((1000 * (n_days * sxy - sx * sy))
                // NULLIF(n_days * sxx - sx * sx, 0) AS BIGINT) AS slope_milli
    FROM s
    """,
)
def events_type_trend_slope_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS trend: daily event volume regressed on
    the (per-type min-centered) day index, slope from the five exact
    bigint moments n·Σxy−ΣxΣy over n·Σx²−(Σx)² — associatively
    mergeable partials, so the whole regression is two hash aggs plus
    a window over the tiny day dimension. slope_milli uses truncating
    integer division, which Spark's `div` and DuckDB's `//` agree on
    for negative slopes too. Days with zero events are absent from the
    fit (observed-days regression), documented behavior."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (ts_us("ts") - (ts_us("ts") % F.lit(_US_DAY)))
            .cast("bigint")
            .alias("_day_us"),
        )
        .withColumn("day_idx", F.expr(f"_day_us div {_US_DAY}").cast("bigint"))
        .groupBy("event_type", "day_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    wmin = W.partitionBy("event_type")
    centered = daily.select(
        "event_type",
        (F.col("day_idx") - F.min("day_idx").over(wmin)).alias("x"),
        "y",
    )
    s = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n_days",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.expr(
            "CAST((1000 * (n_days * sxy - sx * sy)) div "
            "nullif(n_days * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("slope_milli"),
    )


@query(
    "events_quantile_sketch",
    """
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c FROM events
    ),
    b AS (
      SELECT event_type, CAST(LENGTH(bin(v_c)) AS INTEGER) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin_id, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin_id
                          ROWS UNBOUNDED PRECEDING) AS cumc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM b
    ),
    est AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(CASE WHEN 100 * cumc >= 50 * n
                           THEN (CAST(1 AS BIGINT) << bin_id) - 1 END) AS BIGINT)
               AS est_p50_c,
             CAST(MIN(CASE WHEN 100 * cumc >= 95 * n
                           THEN (CAST(1 AS BIGINT) << bin_id) - 1 END) AS BIGINT)
               AS est_p95_c,
             CAST(MIN(CASE WHEN 100 * cumc >= 99 * n
                           THEN (CAST(1 AS BIGINT) << bin_id) - 1 END) AS BIGINT)
               AS est_p99_c
      FROM cum GROUP BY 1
    ),
    r AS (
      SELECT event_type, v_c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v_c) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    ex AS (
      SELECT event_type,
             CAST(MAX(CASE WHEN rk = (95 * n + 99) // 100 THEN v_c END) AS BIGINT)
               AS exact_p95_c
      FROM r GROUP BY 1
    )
    SELECT est.event_type, est.n, est_p50_c, est_p95_c, est_p99_c, exact_p95_c,
           CAST((10000 * ABS(est_p95_c - exact_p95_c)) // exact_p95_c AS BIGINT)
             AS p95_err_bp
    FROM est JOIN ex USING (event_type)
    """,
)
def events_quantile_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log2-histogram quantile sketch (the HDR-histogram /
    DDSketch idea with power-of-two buckets): per event_type, values
    collapse into ⌈log2⌉ bins — the bin id is the BIT LENGTH of the
    cent value via length(bin(v)), an exact integer in both engines,
    never floating log — giving a fixed-size mergeable state (≤ 64
    counters per group) whose quantile estimates carry a bounded
    2× relative error. One hash agg builds the sketch; the cumulative
    pass runs over ≤ 64 rows per group. The EXACT p95 (via
    global_rank, no single-partition sort) is computed alongside as
    the evaluation column, with the estimate's error in basis points —
    at 100 TB you'd ship only the sketch agg and drop the eval side."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import global_rank
    from avocado_spark.operators.sketches import log2_hist_quantiles

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        "event_id",
    )
    est = log2_hist_quantiles(v, ["event_type"], "v_c", quantiles=(50, 95, 99))
    ranked = global_rank(
        v,
        [F.col("v_c"), F.col("event_id")],
        rank_col="rk",
        partition_cols=["event_type"],
    )
    totals = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    ex = (
        ranked.join(F.broadcast(totals), "event_type")
        .where(F.col("rk") == F.expr("(95 * nt + 99) div 100"))
        .groupBy("event_type")
        .agg(F.max("v_c").cast("bigint").alias("exact_p95_c"))
    )
    return est.join(ex, "event_type").select(
        "event_type",
        "n",
        "est_p50_c",
        "est_p95_c",
        "est_p99_c",
        "exact_p95_c",
        F.expr(
            "CAST((10000 * ABS(est_p95_c - exact_p95_c)) div exact_p95_c AS BIGINT)"
        ).alias("p95_err_bp"),
    )


_US_WEEK = 604_800_000_000


@query(
    "events_user_churn_weekly",
    f"""
    WITH active AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_WEEK} AS week
      FROM events
    ),
    per_user AS (
      SELECT user_id, MIN(week) AS first_w, MAX(week) AS last_w
      FROM active GROUP BY 1
    ),
    weekly AS (
      SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active FROM active GROUP BY 1
    ),
    births AS (
      SELECT first_w AS week, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM per_user GROUP BY 1
    ),
    deaths AS (
      SELECT last_w AS week, CAST(COUNT(*) AS BIGINT) AS n_lost
      FROM per_user GROUP BY 1
    )
    SELECT w.week, w.n_active,
           COALESCE(b.n_new, 0) AS n_new,
           COALESCE(d.n_lost, 0) AS n_lost,
           COALESCE(b.n_new, 0) - COALESCE(d.n_lost, 0) AS net_change
    FROM weekly w
    LEFT JOIN births b ON w.week = b.week
    LEFT JOIN deaths d ON w.week = d.week
    """,
)
def events_user_churn_weekly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly user births/deaths ledger: per epoch-week, active users,
    users whose FIRST-ever activity lands in that week (new), and
    users whose LAST-ever activity lands there (churned — they never
    return within the observed range; the trailing week is therefore
    boundary-censored, standard for this report). One distinct
    (user, week) shuffle feeds everything downstream; births/deaths
    aggregate the per-user extremes and join back BROADCAST on the
    tiny week dimension."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        (ts_us("ts") - (ts_us("ts") % F.lit(_US_WEEK)))
        .cast("bigint")
        .alias("_wus"),
    ).withColumn("week", (F.col("_wus") / F.lit(_US_WEEK)).cast("bigint")).select(
        "user_id", "week"
    ).distinct()
    per_user = active.groupBy("user_id").agg(
        F.min("week").alias("first_w"), F.max("week").alias("last_w")
    )
    weekly = active.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    births = per_user.groupBy(F.col("first_w").alias("week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    deaths = per_user.groupBy(F.col("last_w").alias("week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lost")
    )
    out = (
        weekly.join(F.broadcast(births), "week", "left")
        .join(F.broadcast(deaths), "week", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("bigint"))
        .withColumn("n_lost", F.coalesce("n_lost", F.lit(0)).cast("bigint"))
    )
    return out.select(
        "week",
        "n_active",
        "n_new",
        "n_lost",
        (F.col("n_new") - F.col("n_lost")).cast("bigint").alias("net_change"),
    )


@query(
    "events_seasonal_backtest",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_US_DAY} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MAX(day_idx) AS max_d FROM daily GROUP BY 1
    ),
    lagged AS (
      SELECT d.event_type, d.day_idx, d.y,
             LAG(d.y, 1) OVER w AS y_lag1,
             LAG(d.y, 7) OVER w AS y_lag7,
             b.max_d
      FROM daily d JOIN bounds b ON d.event_type = b.event_type
      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day_idx)
    ),
    train AS (
      SELECT event_type,
             CAST(SUM(ABS(y - y_lag7)) AS BIGINT) AS train_sae7,
             CAST(COUNT(*) AS BIGINT) AS n_train7
      FROM lagged WHERE day_idx <= max_d - 7 AND y_lag7 IS NOT NULL
      GROUP BY 1
    ),
    test AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(ABS(y - y_lag1)) AS BIGINT) AS sae_naive,
             CAST(SUM(ABS(y - y_lag7)) AS BIGINT) AS sae_snaive
      FROM lagged
      WHERE day_idx > max_d - 7 AND y_lag1 IS NOT NULL AND y_lag7 IS NOT NULL
      GROUP BY 1
    )
    SELECT t.event_type, t.n_test,
           CAST((1000 * t.sae_naive) // t.n_test AS BIGINT) AS mae_naive_milli,
           CAST((1000 * t.sae_snaive) // t.n_test AS BIGINT) AS mae_snaive_milli,
           CAST((1000 * t.sae_snaive * tr.n_train7)
                // NULLIF(t.n_test * tr.train_sae7, 0) AS BIGINT) AS mase_milli
    FROM test t JOIN train tr ON t.event_type = tr.event_type
    """,
)
def events_seasonal_backtest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest per event_type: hold out the last 7
    observed days, score the naive (yesterday) and seasonal-naive
    (same weekday last week) forecasts by MAE, and report MASE
    (Hyndman–Koehler: test error scaled by the train-period seasonal-
    naive error) — the sanity floor every demand-forecasting pipeline
    must beat before a model earns its keep. The fact table crushes to
    the tiny per-day rollup in ONE hash agg; both lag features share
    one window over that rollup; every metric is exact integer
    cross-multiplication in milli-units."""
    from pyspark.sql import Window as W  # noqa: N814
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (ts_us("ts") - (ts_us("ts") % F.lit(_US_DAY)))
            .cast("bigint")
            .alias("_day_us"),
        )
        .withColumn("day_idx", F.expr(f"_day_us div {_US_DAY}").cast("bigint"))
        .groupBy("event_type", "day_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w = W.partitionBy("event_type").orderBy("day_idx")
    wmax = W.partitionBy("event_type")
    lagged = daily.select(
        "event_type",
        "day_idx",
        "y",
        F.lag("y", 1).over(w).alias("y_lag1"),
        F.lag("y", 7).over(w).alias("y_lag7"),
        F.max("day_idx").over(wmax).alias("max_d"),
    )
    train = (
        lagged.where(
            (F.col("day_idx") <= F.col("max_d") - 7) & F.col("y_lag7").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.abs(F.col("y") - F.col("y_lag7")))
            .cast("bigint")
            .alias("train_sae7"),
            F.count(F.lit(1)).cast("bigint").alias("n_train7"),
        )
    )
    test = (
        lagged.where(
            (F.col("day_idx") > F.col("max_d") - 7)
            & F.col("y_lag1").isNotNull()
            & F.col("y_lag7").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.abs(F.col("y") - F.col("y_lag1")))
            .cast("bigint")
            .alias("sae_naive"),
            F.sum(F.abs(F.col("y") - F.col("y_lag7")))
            .cast("bigint")
            .alias("sae_snaive"),
        )
    )
    return test.join(train, "event_type").select(
        "event_type",
        "n_test",
        F.expr("CAST((1000 * sae_naive) div n_test AS BIGINT)").alias(
            "mae_naive_milli"
        ),
        F.expr("CAST((1000 * sae_snaive) div n_test AS BIGINT)").alias(
            "mae_snaive_milli"
        ),
        F.expr(
            "CAST((1000 * sae_snaive * n_train7) div "
            "nullif(n_test * train_sae7, 0) AS BIGINT)"
        ).alias("mase_milli"),
    )


@query(
    "stream_quantile_sketch",
    """
    SELECT event_type,
           CAST(LENGTH(bin(CAST(ROUND(value * 100) AS BIGINT))) AS INTEGER) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def stream_quantile_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of the streaming log2-histogram quantile-sketch
    build: the sketch state is a plain integer hash agg, so batch and
    complete-mode streaming compute the identical (type × ≤64 bins)
    table — the mergeability proof for using the sketch as a live
    quantile monitor (tests/test_streaming.py runs the true-streaming
    path to convergence)."""
    return EV.quantile_sketch_agg(load_table(spark, sf_dir, "events"))


@query(
    "events_mannwhitney",
    """
    WITH g AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v_c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS HUGEINT) AS cb
      FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
    ),
    cum AS (
      SELECT ca, cb, ca + cb AS t,
             SUM(ca + cb) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING) AS cumt
      FROM g
    ),
    s AS (
      SELECT CAST(SUM(ca) AS HUGEINT) AS n_a, CAST(SUM(cb) AS HUGEINT) AS n_b,
             CAST(SUM(ca * (2 * (cumt - t) + t + 1)) AS HUGEINT) AS r2a,
             CAST(SUM(CASE WHEN t > 1 THEN t * t * t - t ELSE 0 END) AS HUGEINT) AS ties
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST((10000 * (r2a - n_a * (n_a + 1))) // (2 * n_a * n_b) AS BIGINT) AS auc_bp,
           CAST(ties AS BIGINT) AS tie_cubes
    FROM s
    """,
)
def events_mannwhitney_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U between purchase and view order values —
    the rank-based location-shift monitor beside events_ks_drift's
    shape test, with the effect size surfaced as exact AUC basis
    points (5000 = no shift). Midrank ties carried as doubled-rank
    integers; DECIMAL(38,0) internally, BIGINT out (HUGEINT replays in
    the oracle). One distinct-cents hash agg + frozen-boundary cumsum,
    no single-partition window."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import mannwhitney_u

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
            "event_type",
        )
    )
    return mannwhitney_u(ev, "v_c", F.col("event_type") == "purchase")


@query(
    "events_spearman_daily",
    f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {86_400_000_000} AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT CAST(2 * (RANK() OVER (ORDER BY x)) + COUNT(*) OVER (PARTITION BY x) - 1 AS HUGEINT) AS xr2,
             CAST(2 * (RANK() OVER (ORDER BY y)) + COUNT(*) OVER (PARTITION BY y) - 1 AS HUGEINT) AS yr2
      FROM daily
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(xr2) AS HUGEINT) AS sx, CAST(SUM(yr2) AS HUGEINT) AS sy,
             CAST(SUM(xr2 * xr2) AS HUGEINT) AS sxx,
             CAST(SUM(yr2 * yr2) AS HUGEINT) AS syy,
             CAST(SUM(xr2 * yr2) AS HUGEINT) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS rho
    FROM m
    """,
)
def events_spearman_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily event volume and daily
    revenue — "do busy days monetize?" — via exact-midrank doubled
    ranks (Pearson over integer ranks; the only floats are one sqrt +
    one division on identical integer-derived doubles in both
    engines). Day key is timezone-free epoch-µs division. Each series
    ranks with a distinct-value agg + frozen-boundary cumsum; the
    rank maps join back value-bounded and the moments are one 1-row
    agg."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.relational import spearman_rho

    daily = (
        load_table(spark, sf_dir, "events")
        .select(ts_us("ts").alias("us"), "value")
        .groupBy(F.expr("us div 86400000000").cast("bigint").alias("day_idx"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
    )
    return spearman_rho(daily, "x", "y")


@query(
    "stream_rankstat_state",
    """
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS v_c,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
    FROM events WHERE event_type IN ('purchase', 'view')
    GROUP BY 1
    """,
)
def stream_rankstat_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of the streaming rank-statistic state build: the
    per-distinct-cent (c_a, c_b) count table that Mann–Whitney /
    KS fold their statistics from. A plain integer hash agg over a
    value-domain-bounded key → batch and complete-mode streaming
    produce the identical table (tests/test_streaming.py runs the
    true-streaming path to convergence and folds the U statistic from
    the streamed state)."""
    return EV.rankstat_state_agg(load_table(spark, sf_dir, "events"))


# ===========================================================================
# r10b: hypothesis-testing statistics over the event stream (stats family)
# ===========================================================================

from avocado_spark.operators.stats import (  # noqa: E402
    two_sided_z_p_txt,
    welch_t_oracle,
)


@query(
    "events_welch_ttest",
    welch_t_oracle(
        "events WHERE event_type IN ('purchase', 'view')",
        "CAST(ROUND(value * 100) AS BIGINT)",
        "event_type = 'purchase'",
    ),
)
def events_welch_ttest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between purchase and view order
    values — the parametric location test beside events_mannwhitney's
    rank test (Welch because the two event populations' variances have
    no reason to agree). Integer-cent moments in DECIMAL(38,0), the
    t statistic and Welch–Satterthwaite df as the identical
    double expression on both engines — no libm beyond SQRT
    (operators/stats.welch_t)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import welch_t

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
            "event_type",
        )
    )
    return welch_t(ev, "v_c", F.col("event_type") == "purchase")


@query(
    "events_cramers_v",
    """
    WITH b AS (
      SELECT event_type AS a, (epoch_us(ts) // 86400000000) % 7 AS bnd
      FROM events
    ),
    cells AS (SELECT a, bnd, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY a, bnd),
    ra AS (SELECT a, SUM(o) AS row_n FROM cells GROUP BY a),
    cb AS (SELECT bnd, SUM(o) AS col_n FROM cells GROUP BY bnd),
    tot AS (SELECT SUM(o) AS total FROM cells),
    agg AS (
      SELECT ROUND(SUM(ROUND(
               CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
               / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE)), 9))
               - CAST(FIRST(total) AS DOUBLE), 6) AS chi2,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows_cat,
             CAST(COUNT(DISTINCT bnd) AS BIGINT) AS n_cols_cat,
             CAST(FIRST(total) AS BIGINT) AS n
      FROM cells JOIN ra USING (a) JOIN cb USING (bnd) CROSS JOIN tot
    )
    SELECT chi2,
           CAST((n_rows_cat - 1) * (n_cols_cat - 1) AS BIGINT) AS dof,
           n, n_rows_cat, n_cols_cat,
           CASE WHEN least(n_rows_cat, n_cols_cat) > 1 AND n > 0 THEN
             ROUND(SQRT((chi2 / CAST(n AS DOUBLE))
                        / CAST(least(n_rows_cat, n_cols_cat) - 1 AS DOUBLE)), 6)
           END AS cramers_v
    FROM agg
    """,
)
def events_cramers_v_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between event type and day-of-week — the BOUNDED
    [0,1] effect size events_chisq's raw χ² (which grows with n)
    doesn't give: "is the type mix actually weekday-dependent, and how
    much?". Same exact-integer contingency + per-term ROUND-9
    discipline; V is derived from the ROUNDED χ² so both engines root
    the identical double (operators/stats.cramers_v)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import cramers_v

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        ts_us("ts").alias("us"),
    ).select(
        "event_type",
        F.expr("(us div 86400000000) % 7").cast("bigint").alias("dow"),
    )
    return cramers_v(ev, "event_type", "dow")


@query(
    "events_acf_hourly",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    r AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
    dense AS (
      SELECT gs.h, COALESCE(c.x, 0) AS x
      FROM (SELECT UNNEST(generate_series(h0, h1)) AS h FROM r) gs
      LEFT JOIN c USING (h)
    ),
    mom AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS s FROM dense),
    base AS (SELECT h, n * CAST(x AS HUGEINT) - s AS dev FROM dense CROSS JOIN mom),
    den AS (SELECT SUM(dev * dev) AS den FROM base),
    lags AS (SELECT UNNEST([1, 2, 3, 6, 12, 24, 48, 168]) AS lag),
    num AS (
      SELECT lag, SUM(b1.dev * b2.dev) AS num, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM lags l
      JOIN base b1 ON TRUE
      JOIN base b2 ON b2.h = b1.h + l.lag
      GROUP BY lag
    )
    SELECT CAST(l.lag AS BIGINT) AS lag,
           COALESCE(num.n_terms, 0) AS n_terms,
           CASE WHEN num.num IS NOT NULL AND den.den > 0 THEN
             ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6)
           END AS acf_r
    FROM lags l LEFT JOIN num USING (lag) CROSS JOIN den
    """,
)
def events_acf_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the HOURLY event-volume series at lags
    1–168: the seasonality detector — a daily cycle spikes lag 24, a
    weekly one lag 168. The hourly series is densified (zero-filled
    gaps via sequence explode) so lags mean wall-clock hours; the
    n-scaled deviation trick keeps every numerator/denominator an
    exact DECIMAL(38,0) integer, one double division per lag
    (operators/stats.acf). Series length is calendar-bounded: 100 TB
    of events is still one row per hour."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import acf

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    counts = ev.groupBy(
        F.expr("us div 3600000000").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rng = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (
        rng.select(F.explode(F.sequence("h0", "h1")).alias("h"))
        .join(counts, "h", "left")
        .select("h", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"))
    )
    return acf(dense, "h", "x", [1, 2, 3, 6, 12, 24, 48, 168])


@query(
    "events_kendall_hourly",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.x AS lx, a.y AS ly, b.x AS rx, b.y AS ry
      FROM c a JOIN c b ON b.h > a.h
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n_pairs,
             CAST(COALESCE(SUM(CASE WHEN (rx > lx AND ry > ly) OR (rx < lx AND ry < ly) THEN 1 END), 0) AS HUGEINT) AS nc,
             CAST(COALESCE(SUM(CASE WHEN (rx > lx AND ry < ly) OR (rx < lx AND ry > ly) THEN 1 END), 0) AS HUGEINT) AS nd,
             CAST(COALESCE(SUM(CASE WHEN rx = lx THEN 1 END), 0) AS HUGEINT) AS tx,
             CAST(COALESCE(SUM(CASE WHEN ry = ly THEN 1 END), 0) AS HUGEINT) AS ty
      FROM p
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(nc AS BIGINT) AS concordant,
           CAST(nd AS BIGINT) AS discordant,
           CAST(tx AS BIGINT) AS ties_x,
           CAST(ty AS BIGINT) AS ties_y,
           CASE WHEN n_pairs - tx > 0 AND n_pairs - ty > 0 THEN
             ROUND(CAST(nc - nd AS DOUBLE)
                   / SQRT(CAST(n_pairs - tx AS DOUBLE) * CAST(n_pairs - ty AS DOUBLE)), 6)
           END AS tau_b
    FROM agg
    """,
)
def events_kendall_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between hourly event volume and hourly revenue —
    the concordance twin of events_spearman_daily (τ has the direct
    probabilistic reading P(concordant) − P(discordant) and a 29%
    breakdown point). All pair classification is strict integer
    comparison; the O(n²/2) pair space is calendar-bounded (hourly
    rollup) and explodes distributed via the triangle-slice trick —
    never a driver loop (operators/stats.kendall_tau_b)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import kendall_tau_b

    hourly = (
        load_table(spark, sf_dir, "events")
        .select(ts_us("ts").alias("us"), "value")
        .groupBy(F.expr("us div 3600000000").cast("bigint").alias("h"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
    )
    return kendall_tau_b(hourly, "h", "x", "y")


_MK_Z_TXT = (
    "((CAST(s_stat AS DOUBLE) - CAST(SIGN(s_stat) AS DOUBLE))"
    " / SQRT(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE)))"
)


@query(
    "events_mann_kendall",
    f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS d, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
                                    WHEN b.y < a.y THEN -1
                                    ELSE 0 END), 0) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    tie AS (
      SELECT CAST(COALESCE(SUM(tg), 0) AS BIGINT) AS np,
             CAST(COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT) AS tt
      FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS tg FROM daily GROUP BY y)
    ),
    v AS (
      SELECT np, s_stat,
             CAST(np * (np - 1) * (2 * np + 5) - tt AS BIGINT) AS var18
      FROM s, tie
    )
    SELECT np AS n_points, s_stat, var18,
           CASE WHEN var18 > 0 THEN {two_sided_z_p_txt(_MK_Z_TXT)} END AS p_value
    FROM v
    """,
)
def events_mann_kendall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test on the daily event-volume
    series — the SIGNIFICANCE companion to orders_theilsen_trend's
    magnitude estimate (is there a trend at all, before asking how
    steep?). Exact integer S (strict sign compares over the calendar-
    bounded pair space, distributed via the triangle-slice trick) and
    exact integer 18·Var with the y-tie correction; the one double is
    the continuity-corrected z, written textually identically in both
    engines, p via the shared A&S erf polynomial
    (operators/stats.mann_kendall)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import mann_kendall

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    daily = ev.groupBy(
        F.expr("us div 86400000000").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    return mann_kendall(daily, "d", "y")


@query(
    "events_seasonal_mann_kendall",
    f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS d, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ser AS (SELECT d % 7 AS g, d, y FROM daily),
    s AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
                                    WHEN b.y < a.y THEN -1
                                    ELSE 0 END), 0) AS BIGINT) AS s_stat
      FROM ser a JOIN ser b ON a.g = b.g AND b.d > a.d
    ),
    grp AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng FROM ser GROUP BY g),
    tie AS (
      SELECT CAST(COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT) AS tt
      FROM (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS tg FROM ser GROUP BY g, y)
    ),
    v AS (
      SELECT (SELECT CAST(COALESCE(SUM(ng), 0) AS BIGINT) FROM grp) AS n_points,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM grp) AS n_seasons,
             s_stat,
             CAST((SELECT COALESCE(SUM(ng * (ng - 1) * (2 * ng + 5)), 0)
                   FROM grp) - tt AS BIGINT) AS var18
      FROM s, tie
    )
    SELECT n_points, n_seasons, s_stat, var18,
           CASE WHEN var18 > 0 THEN {two_sided_z_p_txt(_MK_Z_TXT)} END AS p_value
    FROM v
    """,
)
def events_seasonal_mann_kendall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann–Kendall (Hirsch, Slack & Smith 1982; seasons
    treated as independent — no 1984 covariance correction) on daily event
    volume with day-of-week seasons (g = d mod 7): within-season
    time-ordered pairs only, so a weekly rhythm is neither read as
    trend nor allowed to drown one — the right trend test for traffic
    series with a strong weekday cycle. Per-season exact-integer S and
    18·Var (with the (season, y)-tie correction) summed as BIGINT; the
    one double is the continuity-corrected z, textually identical on
    both engines; p via the shared A&S erf polynomial
    (operators/stats.seasonal_mann_kendall over bounded_group_pairs —
    the grouped triangle-slice explode, pairs never cross seasons)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import seasonal_mann_kendall

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    daily = ev.groupBy(
        F.expr("us div 86400000000").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    ser = daily.select(
        (F.col("d") % 7).cast("bigint").alias("g"), "d", "y"
    )
    return seasonal_mann_kendall(ser, "g", "d", "y")


_BH_Z_TXT = (
    "(CAST(kh AS DOUBLE) / CAST(nh AS DOUBLE)"
    " - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    " / SQRT(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)"
    " * (CAST(1 AS DOUBLE) - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    " / CAST(nh AS DOUBLE))"
)
_BH_P_TXT = (
    f"CASE WHEN nh > 0 AND kk > 0 AND kk < nn THEN "
    f"{two_sided_z_p_txt(_BH_Z_TXT)} END"
)


@query(
    "events_bh_fdr",
    f"""
    WITH g AS (
      SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS kh
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(nh) AS BIGINT) AS nn, CAST(SUM(kh) AS BIGINT) AS kk FROM g),
    tests AS (SELECT hod, {_BH_P_TXT} AS p_value FROM g CROSS JOIN tot),
    ranked AS (
      SELECT hod, p_value,
             ROW_NUMBER() OVER (ORDER BY p_value, hod) AS p_rank,
             COUNT(*) OVER () AS m_tests
      FROM tests WHERE p_value IS NOT NULL
    ),
    cut AS (
      SELECT hod, p_value, p_rank, m_tests,
             ROUND(CAST(p_rank * 5 AS DOUBLE) / CAST(m_tests * 100 AS DOUBLE), 9) AS bh_cutoff
      FROM ranked
    ),
    k AS (SELECT COALESCE(MAX(CASE WHEN p_value <= bh_cutoff THEN p_rank END), 0) AS ks FROM cut)
    SELECT CAST(hod AS BIGINT) AS hod, p_value,
           CAST(p_rank AS BIGINT) AS p_rank,
           CAST(m_tests AS BIGINT) AS m_tests,
           bh_cutoff,
           p_rank <= ks AS rejected
    FROM cut CROSS JOIN k
    UNION ALL
    SELECT CAST(hod AS BIGINT), p_value,
           CAST(NULL AS BIGINT),
           (SELECT COUNT(*) FROM tests WHERE p_value IS NOT NULL),
           CAST(NULL AS DOUBLE),
           FALSE
    FROM tests WHERE p_value IS NULL
    """,
)
def events_bh_fdr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over 24 hour-of-day purchase-
    share z-tests — the multiple-testing correction a per-segment
    drift scan needs (24 tests at α=.05 expect >1 false alarm a day
    uncorrected). The two-sided normal p-value uses the A&S 7.1.26 erf
    polynomial written textually identically in both engines (the one
    EXP per row is rounded to 9 digits before any compare); ranks ride
    global_rank's frozen-boundary machinery with hod tie-break; the
    step-up maximum is a 1-row broadcast, not a running window
    (operators/stats.bh_fdr)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import bh_fdr

    ev = load_table(spark, sf_dir, "events").select(
        ts_us("ts").alias("us"), "event_type"
    )
    g = ev.groupBy(
        F.expr("(us div 3600000000) % 24").cast("bigint").alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("kh"),
    )
    tot = g.agg(
        F.sum("nh").cast("bigint").alias("nn"),
        F.sum("kh").cast("bigint").alias("kk"),
    )
    tests = g.crossJoin(F.broadcast(tot)).select(
        "hod", F.expr(_BH_P_TXT).alias("p_value")
    )
    return bh_fdr(tests, ["hod"], "p_value")


def _sd_oracle() -> str:
    from avocado_spark.operators.stats import floor_div_txt

    trend_q = floor_div_txt("CAST(1000 AS HUGEINT) * s", "CAST(7 AS HUGEINT)", False)
    seas_q = floor_div_txt("SUM(dt)", "CAST(COUNT(*) AS HUGEINT)", False)
    return f"""
    WITH c AS (
      SELECT epoch_us(ts) // 86400000000 AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    r AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM c),
    dense AS (
      SELECT gs.d, CAST(COALESCE(c.x, 0) AS HUGEINT) AS x
      FROM (SELECT UNNEST(generate_series(d0, d1)) AS d FROM r) gs
      LEFT JOIN c USING (d)
    ),
    offs AS (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS o),
    win AS (
      SELECT b.d, SUM(n.x) AS s, COUNT(*) AS cnt
      FROM dense b JOIN offs ON TRUE JOIN dense n ON n.d = b.d + offs.o
      GROUP BY b.d
    ),
    j AS (
      SELECT dense.d, dense.x,
             CASE WHEN cnt = 7 THEN {trend_q} END AS trend_milli,
             dense.d % 7 AS phase
      FROM dense LEFT JOIN win ON win.d = dense.d
    ),
    detr AS (
      SELECT *, CASE WHEN trend_milli IS NOT NULL
                     THEN CAST(1000 AS HUGEINT) * x - trend_milli END AS dt
      FROM j
    ),
    seas AS (
      SELECT phase, {seas_q} AS seas_milli
      FROM detr WHERE dt IS NOT NULL GROUP BY phase
    )
    SELECT CAST(detr.d AS BIGINT) AS d,
           CAST(detr.x AS BIGINT) AS x,
           CAST(detr.trend_milli AS BIGINT) AS trend_milli,
           CAST(detr.phase AS BIGINT) AS phase,
           CAST(seas.seas_milli AS BIGINT) AS seas_milli,
           CAST(detr.dt - seas.seas_milli AS BIGINT) AS resid_milli
    FROM detr LEFT JOIN seas USING (phase)
    """


@query("events_seasonal_decompose", _sd_oracle())
def events_seasonal_decompose_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily event volume:
    x = trend + seasonal + residual — the diagnosis companion to
    events_seasonal_backtest's forecast scoring (is there a weekly
    cycle, and how big is it against the trend?). Exact milli-integer
    arithmetic throughout: centered 7-day trend and per-dow seasonal
    means via canonical-remainder floor division (detrended values go
    NEGATIVE, where Spark div truncates but DuckDB // floors — the
    pmod trick makes both exact-divisible first, operators/stats.
    seasonal_decompose + floor_div_txt). Window = literal-offset
    explode + equi join on the zero-filled daily spine, never a
    single-partition ORDER BY window."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import seasonal_decompose

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    counts = ev.groupBy(
        F.expr("us div 86400000000").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rng = counts.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    dense = (
        rng.select(F.explode(F.sequence("d0", "d1")).alias("d"))
        .join(counts, "d", "left")
        .select("d", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"))
    )
    return seasonal_decompose(dense, "d", "x", period=7, half_window=3)


@query(
    "events_conformal_interval",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 86400000000 AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    r AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM c),
    dense AS (
      SELECT gs.d, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
      FROM (SELECT UNNEST(generate_series(d0, d1)) AS d FROM r) gs
      LEFT JOIN c USING (d)
    ),
    p AS (
      SELECT a.d, a.x, b.x AS pred
      FROM dense a JOIN dense b ON b.d = a.d - 7
    ),
    mx AS (SELECT MAX(d) AS maxd FROM dense),
    cal AS (SELECT ABS(x - pred) AS rr FROM p, mx WHERE d <= maxd - 7),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    kk AS (SELECT ((n_cal + 1) * 4 + 4) // 5 AS k, n_cal FROM n),
    g AS (SELECT rr, CAST(COUNT(*) AS BIGINT) AS w FROM cal GROUP BY rr),
    cm AS (SELECT rr, SUM(w) OVER (ORDER BY rr ROWS UNBOUNDED PRECEDING) AS cum FROM g),
    q AS (SELECT MIN(rr) AS qhat FROM cm, kk WHERE cum >= kk.k AND kk.k <= kk.n_cal),
    qq AS (SELECT qhat FROM q WHERE qhat IS NOT NULL)
    SELECT CAST(p.d AS BIGINT) AS d,
           p.x,
           p.pred,
           p.pred - qq.qhat AS lo,
           p.pred + qq.qhat AS hi,
           p.x BETWEEN p.pred - qq.qhat AND p.pred + qq.qhat AS covered
    FROM p, mx, qq WHERE p.d > maxd - 7
    """,
)
def events_conformal_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals around the seasonal-naive
    daily-volume forecast: calibrate |x − x(d−7)| on the pre-holdout
    window, take the finite-sample-valid k-th smallest score
    (k = ⌈(n+1)·0.8⌉, 80% target coverage), band the last week with
    pred ± q̂ and flag coverage — distribution-free uncertainty for
    the forecast family (events_seasonal_backtest scores the point
    error; this bounds it). Exact integer scores, integer-ceil k, and
    the order statistic rides weighted_quantile's ungrouped range-
    refinement fast path (operators/stats.conformal_interval)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import conformal_interval

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    counts = ev.groupBy(
        F.expr("us div 86400000000").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rng = counts.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    dense = (
        rng.select(F.explode(F.sequence("d0", "d1")).alias("d"))
        .join(counts, "d", "left")
        .select("d", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"))
    )
    return conformal_interval(dense, "d", "x", period=7, holdout=7)


@query(
    "events_decision_stump",
    """
    WITH b AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    g AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(y) AS BIGINT) AS p
      FROM b GROUP BY v
    ),
    r AS (
      SELECT v,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(p) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cp
      FROM g
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS k FROM g),
    cand AS (
      SELECT v AS split_value,
             CAST(cn AS HUGEINT) AS nl, CAST(cp AS HUGEINT) AS kl,
             CAST(n AS HUGEINT) - CAST(cn AS HUGEINT) AS nr,
             CAST(k AS HUGEINT) - CAST(cp AS HUGEINT) AS kr,
             CAST(n AS HUGEINT) AS n
      FROM r CROSS JOIN tot WHERE cn < n
    ),
    scored AS (
      SELECT split_value,
             CAST(nl AS BIGINT) AS n_left, CAST(kl AS BIGINT) AS pos_left,
             CAST(nr AS BIGINT) AS n_right, CAST(kr AS BIGINT) AS pos_right,
             (CAST(1000000000 AS HUGEINT)
              * ((kl * kl + (nl - kl) * (nl - kl)) * nr
                 + (kr * kr + (nr - kr) * (nr - kr)) * nl))
               // (nl * nr) AS score,
             n
      FROM cand
    )
    SELECT split_value, n_left, pos_left, n_right, pos_right,
           CAST(score AS BIGINT) AS score_nano,
           CAST((10000 * (GREATEST(pos_left, n_left - pos_left)
                          + GREATEST(pos_right, n_right - pos_right))) // n
                AS BIGINT) AS acc_bp
    FROM scored
    ORDER BY score DESC, split_value ASC
    LIMIT 1
    """,
)
def events_decision_stump_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 classifier in the engine: the single order-value
    threshold that best separates purchases from views by exact
    Gini-surrogate score — the weak learner under boosted quality-
    classifier filtering, with majority-vote training accuracy in
    basis points. One hash agg to the distinct-cents domain,
    frozen-boundary running totals, fixed-point DECIMAL(38,0) scoring
    with a deterministic smallest-split tie-break, and a TakeOrdered
    argmax (operators/stats.decision_stump)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import decision_stump

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
            "event_type",
        )
    )
    return decision_stump(ev, "v_c", F.col("event_type") == "purchase")


@query(
    "events_pettitt_changepoint",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    r AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
    dense AS (
      SELECT gs.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
      FROM (SELECT UNNEST(generate_series(h0, h1)) AS h FROM r) gs
      LEFT JOIN c USING (h)
    ),
    g AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cc FROM dense GROUP BY x),
    rv AS (
      SELECT v, cc, SUM(cc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
      FROM g
    ),
    dmap AS (SELECT v, 2 * (cum - cc) + cc + 1 AS d FROM rv),
    keyed AS (SELECT dense.h AS t, dmap.d FROM dense JOIN dmap ON dmap.v = dense.x),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed),
    rt AS (
      SELECT t,
             ROW_NUMBER() OVER (ORDER BY t) AS pos,
             SUM(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cd
      FROM keyed
    ),
    cand AS (
      SELECT t AS t_change,
             ABS(CAST(cd AS HUGEINT) - CAST(pos AS HUGEINT) * (CAST(n AS HUGEINT) + 1)) AS k,
             n
      FROM rt CROSS JOIN nn WHERE pos < n
    )
    SELECT CAST(t_change AS BIGINT) AS t_change,
           CAST(k AS BIGINT) AS k_stat,
           n AS n_points,
           ROUND(LEAST(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE) * EXP(-CAST(6 AS DOUBLE)
             * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 9) AS p_approx
    FROM cand ORDER BY k DESC, t_change ASC LIMIT 1
    """,
)
def events_pettitt_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric single-changepoint test over the dense
    hourly volume series — WHERE does the level most likely shift,
    with distribution-free evidence: the offline retrospective
    companion to events_cusum_changepoint's online alert and
    events_ks_drift's two-known-windows comparison. Exact integer
    U_t via doubled midranks (the mannwhitney_u bookkeeping) + one
    time-ordered frozen-boundary cumsum; a single EXP (ROUND 9) for
    the approximate significance (operators/stats.
    pettitt_changepoint)."""
    from pyspark.sql import functions as F  # noqa: F811

    from avocado_spark.operators.stats import pettitt_changepoint

    ev = load_table(spark, sf_dir, "events").select(ts_us("ts").alias("us"))
    counts = ev.groupBy(
        F.expr("us div 3600000000").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rng = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (
        rng.select(F.explode(F.sequence("h0", "h1")).alias("h"))
        .join(counts, "h", "left")
        .select("h", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"))
    )
    return pettitt_changepoint(dense, "h", "x")
