"""Structured Streaming surface over the `events` table (SURVEY §2.9:
the reference is batch-only — this is the north-star extension, stock
Spark Structured Streaming).

Design: every operator here takes a DataFrame that may be BATCH or
STREAMING and declares the same logical plan for both — that is the
core Structured Streaming contract. The batch path is what the DuckDB
oracle checks (queries_streaming.py); the streaming path is exercised
end-to-end in tests/test_streaming.py with a file source + memory
sink. Watermarks are applied only when the input is streaming (they
are meaningless on batch).

Scale stance (100 TB/day of events):
  * tumbling/sliding aggs are partial-aggregated map-side before the
    keyed state shuffle; state size = #open windows × #keys;
  * watermark bounds state: late rows beyond it are dropped instead of
    growing state forever;
  * session windows use Spark's native session_window (merging keyed
    state), not a custom groupByKey;
  * dedup keeps only key hashes within the watermark horizon;
  * output sums are integer cent-sums (exact under any accumulation
    order — same convention as the batch registry).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from avocado_spark.functions.time_fns import normalize_timestamps, ts_us


def normalize_events(raw: DataFrame) -> DataFrame:
    """Canonicalize ts to TIMESTAMP (shared by batch + stream): handles
    the long-nanos legacy encoding AND TIMESTAMP_NTZ (plain
    timestamp[us] fixture) — the round-4 regression surface."""
    if dict(raw.dtypes).get("ts") == "bigint":
        # integer DIV, not /1000: double division loses ulps at 1e18 ns
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_timestamps(raw)


# (source path, mtime) → staged directory; see read_events_stream
_STAGED_STREAM_DIRS: dict[tuple[str, float], str] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet — the S-table analog
    of `readStream`; one file = one micro-batch locally, a directory of
    arriving files in production.

    The stream source needs an explicit schema; take it from a batch
    footer read of the same path so the stream tracks whatever ts
    encoding the fixture currently uses (it has changed across driver
    rounds), then normalize to canonical TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # the file stream source requires a DIRECTORY of arriving
        # files; stage the single local fixture into a temp dir (in
        # production this points at the landing directory itself).
        # Cached per source path+mtime — repeated stream builds in one
        # process must not copy the fixture and leak a temp dir each
        # call.
        key = (os.path.abspath(path), os.path.getmtime(path))
        staged = _STAGED_STREAM_DIRS.get(key)
        if staged is None or not os.path.isdir(staged):
            import shutil
            import tempfile

            staged = tempfile.mkdtemp(prefix="events_stream_")
            shutil.copy(path, os.path.join(staged, "events.parquet"))
            _STAGED_STREAM_DIRS[key] = staged
        path = staged
    raw = spark.readStream.schema(raw_schema).format("parquet").load(path)
    return normalize_events(raw)


def _watermarked(events: DataFrame, watermark: str | None) -> DataFrame:
    if watermark is not None and events.isStreaming:
        return events.withWatermark("ts", watermark)
    return events


def _cents(col) -> Column:
    return F.sum(F.round(F.col(col) * 100).cast("bigint")).cast("bigint")


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Tumbling-window rollup by event_type: the canonical streaming
    aggregation (watermark + window + partial-agg shuffle)."""
    return (
        _watermarked(events, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _cents("value").alias("sum_value_c"))
        .select(
            ts_us(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value_c",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window rollup: each event lands in window/slide panes."""
    return (
        _watermarked(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), _cents("value").alias("sum_value_c"))
        .select(
            ts_us(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value_c",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "5 minutes", watermark: str | None = "30 minutes"
) -> DataFrame:
    """Per-user session windows (merge events closer than `gap`):
    native session_window keyed state, the streaming sessionization
    primitive."""
    return (
        _watermarked(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), _cents("value").alias("sum_value_c"))
        .select(
            "user_id",
            ts_us(F.col("w.start")).alias("session_start_us"),
            ts_us(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value_c",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: state = key hashes within the watermark
    horizon (dropDuplicatesWithinWatermark when streaming)."""
    keys = keys or ["event_id"]
    ev = _watermarked(events, watermark)
    if ev.isStreaming and watermark is not None:
        return ev.dropDuplicatesWithinWatermark(keys)
    return ev.dropDuplicates(keys)


def first_event_per_key(events: DataFrame) -> DataFrame:
    """Batch shadow of keyed streaming dedup with deterministic winner:
    earliest (ts, event_id) per (user_id, event_type)."""
    from pyspark.sql import Window

    w = (
        F.row_number()
        .over(
            Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        )
        .alias("rn")
    )
    return (
        events.select("user_id", "event_type", "event_id", "ts", w)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            ts_us("ts").alias("ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: per-user running total
# ---------------------------------------------------------------------------

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("running_total_c", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("total_c", LongType())])


def running_total_stream(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user cumulative cent-sum across micro-batches. State is one
    long per user — bounded, shuffle-keyed by user_id.

    The reference has no streaming ops (SURVEY §2.9); this is the
    applyInPandasWithState pattern from the north-star list.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        total = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                total += int(round(r["value"] * 100))
                rows.append(
                    (int(key[0]), int(r["event_id"]), int(r["ts"].value // 1000), total)
                )
        state.update((total,))
        yield pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts_us", "running_total_c"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True when Spark-4's transformWithStateInPandas can actually RUN
    here: the API shipped with Spark 4.0 but its Python worker talks to
    the JVM state server over protobuf, so the GA operator family
    (applyInPandasWithState) stays the default wherever protobuf is
    absent.

    Probe log: re-checked 2026-08-16 (r13) — unchanged from r12:
    ``import google.protobuf`` still raises ModuleNotFoundError, so the
    r12 note below stands verbatim.
    r12 note: re-checked 2026-08-16 (r12) — ``import google.protobuf``
    still raises ModuleNotFoundError on this pyspark 4.1.2 runtime (no
    ``google`` namespace package at all), so the exact missing piece is
    the protobuf *Python* package the TWS state-server client imports;
    nothing JVM-side is missing. Vendoring was considered and rejected:
    the real wheel is a compiled C++ extension plus generated modules —
    a hand-stubbed pure-Python shim would have to fake the descriptor
    pool the state-server client round-trips through, i.e. ship
    non-trivial third-party code in-repo for one skip.
    Previously re-checked 2026-08-15 on this pyspark 4.1.2 runtime —
    ``GroupedData.transformWithStateInPandas`` exists but
    ``google.protobuf`` is still not installed (and installs are not
    permitted here), so the suite's one skip stands; the CUSUM /
    running-total stateful ops stay on applyInPandasWithState behind
    this probe and migrate automatically where protobuf exists."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    from pyspark.sql import GroupedData

    return hasattr(GroupedData, "transformWithStateInPandas")


def running_total_stream_tws(events: DataFrame) -> DataFrame:
    """running_total_stream on the Spark-4 successor API
    (transformWithStateInPandas + ValueState) — identical semantics
    and state size (one long per user), but the new API adds what the
    GA one can't express: multiple named state variables per operator,
    ListState/MapState with per-element updates (no full-value
    rewrite), timers decoupled from watermarks, TTL on state, and
    initial-state bootstrap. Guard calls with :func:`tws_available`;
    on protobuf-less runtimes use ``running_total_stream``."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            import pandas as pd

            prior = self._total.get()
            total = int(prior[0]) if prior is not None else 0
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for _, r in pdf.iterrows():
                    total += int(round(r["value"] * 100))
                    out.append(
                        (
                            int(key[0]),
                            int(r["event_id"]),
                            int(r["ts"].value // 1000),
                            total,
                        )
                    )
            self._total.update((total,))
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts_us", "running_total_c"]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotal(),
        outputStructType=RUNNING_TOTAL_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def running_total_batch(events: DataFrame) -> DataFrame:
    """Batch shadow of running_total_stream: cumulative window sum."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).over(w).alias("running_total_c"),
    )


def attribution_join(
    events: DataFrame,
    trigger_events: DataFrame | None = None,
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with a time-range condition — the
    attribution primitive (view → purchase by the same user within
    ``within``). The one streaming join shape whose state Spark can
    bound: both sides watermarked + an event-time range predicate lets
    the engine evict matched/expired rows instead of buffering both
    streams forever (state ≈ rows inside the watermark horizon).

    ``how='left_outer'`` is the unconverted-impression variant: a view
    with no purchase in the horizon emits once with null purchase
    columns — in streaming, only AFTER the watermark proves no match
    can still arrive (Spark holds the row in state until then), which
    is why the outer side REQUIRES both watermarks and the range
    conjunct; without them the engine cannot know when to give up.

    Works identically on batch inputs (the oracle path): the same plan
    is a pure interval equi-join on user_id with a range conjunct.

    STATE-PARTITION SIZING (measured, STREAMBENCH r9): the dominant
    per-trigger cost is state-store COMMITS, and the symmetric hash
    join keeps FOUR stores per shuffle partition — so commit overhead
    scales with ``spark.sql.shuffle.partitions`` (frozen into the
    checkpoint at first start), not with rows. At sf0.1 (100k rows,
    ~40k state rows / 11 MB) the same single-batch run takes 7.3 s at
    32 partitions vs 3.0 s at 8 (commit time 37 s → 2.8 s summed);
    marginal cost decomposes to ~15 µs/row once partitions match the
    state volume. Size partitions to STATE SIZE (e.g. ~64 MB of state
    per partition), not to core count — at 100 TB the state is large
    and the overhead amortizes; a small stream with default-parallel
    partitions pays pure commit overhead. RocksDB is ~1.5× slower
    than the HDFS-backed store at this state size (right only when
    state outgrows executor memory)."""
    src = trigger_events if trigger_events is not None else events
    left = events.where(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    right = src.where(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    if left.isStreaming:
        left = left.withWatermark("l_ts", watermark)
    if right.isStreaming:
        right = right.withWatermark("r_ts", watermark)
    cond = (
        (left["user_id"] == right["r_user_id"])
        & (right["r_ts"] >= left["l_ts"])
        & (right["r_ts"] <= left["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, how).select(
        "user_id",
        "l_event_id",
        "r_event_id",
        ts_us("l_ts").alias("l_ts_us"),
        ts_us("r_ts").alias("r_ts_us"),
        F.round(F.col("r_value") * 100).cast("bigint").alias("r_value_c"),
    )


def trending_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k trending event types per tumbling window, over the
    ``tumbling_agg`` output. Rank windows are not supported inside a
    streaming plan, so the streaming deployment shape is the standard
    two-stage split: the WINDOWED COUNT stage runs streaming (keyed
    state, watermark-bounded), and this rank stage runs on each emitted
    result set (foreachBatch / downstream batch over the sink table) —
    exactly how the convergence test drives it. On batch inputs the
    whole pipeline is one plan."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start_us").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start_us", "event_type", "n_events", "rank")
    )


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    within: str | None = None,
) -> DataFrame:
    """Ordered funnel per user: the earliest time each stage was
    reached, where stage k only counts at or after stage k−1's time
    (view → click → purchase). ``within`` scopes the funnel to the
    window after each user's FIRST event (e.g. "2 days" — the
    onboarding-conversion question); None uses the full history.
    Output: one row per user with t<k>_us per stage (null once the
    funnel breaks) and ``reached_stage`` = number of completed stages.

    Scale shape: stacked conditional-min windows over ONE user_id
    partitioning — a single shuffle, no sort (unordered frame), no
    self-joins; then one distinct per user. The per-row window results
    are identical within a user, so the final dropDuplicates moves no
    data that the window shuffle didn't already place."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = events
    if within is not None:
        df = df.withColumn("_u0", F.min("ts").over(w)).where(
            F.col("ts") < F.col("_u0") + F.expr(f"INTERVAL {within}")
        )
    prev_t = None
    tcols = []
    for i, st in enumerate(stages):
        cond = F.col("event_type") == st
        if prev_t is not None:
            cond = cond & F.col(prev_t).isNotNull() & (F.col("ts") >= F.col(prev_t))
        tcol = f"_t{i}"
        df = df.withColumn(tcol, F.min(F.when(cond, F.col("ts"))).over(w))
        prev_t = tcol
        tcols.append(tcol)
    reached = None
    for i in range(len(stages)):
        c = F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0)
        reached = c if reached is None else reached + c
    return (
        df.select(
            "user_id",
            *[ts_us(F.col(t)).alias(f"t{i}_us") for i, t in enumerate(tcols)],
            reached.alias("reached_stage"),
        )
        .dropDuplicates(["user_id"])
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_name", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to a (possibly streaming) event feed. The static side is
    broadcast — the ONE join shape that needs no watermark and keeps no
    state in a streaming plan, because the stream side never buffers:
    each micro-batch hash-probes the broadcast table map-side.

    Left-outer so unmatched events survive with null attributes (the
    telemetry-before-signup case). Works identically on batch input,
    which is what the DuckDB oracle checks."""
    d = F.broadcast(
        dim.select(F.col(dim_key).alias(key), *[F.col(c) for c in dim_cols])
    )
    return events.join(d, key, "left")


def multitouch_attribution(
    events: DataFrame,
    touch_type: str = "view",
    conv_type: str = "purchase",
    horizon_us: int = 6 * 3_600_000_000,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion splits one unit
    of credit EQUALLY across all of the user's touch events in the
    ``horizon_us`` window before it (inclusive) — the generalization of
    first/last-touch `attribution_join` that marketing/causal pipelines
    actually run.

    Credit is integer micro-units (``1_000_000 div n`` per touch), so
    per-touch sums are exact bigints in any accumulation order — no
    float 1/n summation-order drift between engines.

    Scale shape: the touch×conversion pair space is a per-user interval
    join bounded by the horizon; everything — pair build, per-conversion
    fan-out count, per-touch credit sum — shuffles on user-derived keys
    once each. State is bounded by events-per-user-per-horizon, the
    same contract as the streaming join's watermark."""
    us = ts_us("ts")
    touches = events.where(F.col("event_type") == touch_type).select(
        "user_id", F.col("event_id").alias("touch_id"), us.alias("t_us")
    )
    convs = events.where(F.col("event_type") == conv_type).select(
        "user_id", F.col("event_id").alias("conv_id"), us.alias("c_us")
    )
    pairs = touches.join(convs, "user_id").where(
        (F.col("t_us") <= F.col("c_us"))
        & (F.col("t_us") > F.col("c_us") - F.lit(horizon_us))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id")
    credited = pairs.withColumn("n_touches", F.count("*").over(w)).withColumn(
        "credit_u", F.expr("1000000 div n_touches").cast("bigint")
    )
    return credited.groupBy("touch_id", "user_id").agg(
        F.count("*").cast("bigint").alias("n_convs"),
        F.sum("credit_u").cast("bigint").alias("credit_u"),
    )


BURST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("n_in_window", LongType()),
    ]
)

_BURST_HORIZON_US = 21_600 * 1_000_000  # 6 hours
_BURST_THRESHOLD = 3


def burst_alerts_batch(
    events: DataFrame,
    threshold: int = _BURST_THRESHOLD,
    horizon_us: int = _BURST_HORIZON_US,
) -> DataFrame:
    """Burst detection, batch form: alert for every click whose
    trailing 6-hour window (counting itself and predecessors by the
    (ts, event_id) total order) holds ≥ ``threshold`` clicks from the
    same user. Expressed as a horizon-bounded self-join + count — the
    O(n·w) shape the STREAMING form replaces with O(1) per-user list
    state (burst_alerts_stream); the differential between the two is
    the point."""
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "event_id", ts_us("ts").alias("u")
    )
    cur = clicks.select(
        "user_id", F.col("event_id").alias("cur_eid"), F.col("u").alias("cur_u")
    )
    prior = clicks.select(
        "user_id", F.col("event_id").alias("p_eid"), F.col("u").alias("p_u")
    )
    j = cur.join(prior, "user_id").where(
        (F.col("p_u") >= F.col("cur_u") - F.lit(horizon_us))
        & (
            (F.col("p_u") < F.col("cur_u"))
            | ((F.col("p_u") == F.col("cur_u")) & (F.col("p_eid") <= F.col("cur_eid")))
        )
    )
    n = j.groupBy("user_id", "cur_eid", "cur_u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_window")
    )
    return n.where(F.col("n_in_window") >= threshold).select(
        "user_id",
        F.col("cur_eid").alias("event_id"),
        F.col("cur_u").alias("ts_us"),
        "n_in_window",
    )


def burst_alerts_stream(
    events: DataFrame,
    threshold: int = _BURST_THRESHOLD,
    horizon_us: int = _BURST_HORIZON_US,
) -> DataFrame:
    """Burst detection, streaming form: per-user state holds ONLY the
    clicks inside the trailing horizon (two parallel long arrays), so
    each user costs O(clicks-in-horizon) state and one pass — where the
    batch shadow pays a horizon self-join. Implemented with
    applyInPandasWithState; the Spark-4 successor
    (transformWithStateInPandas + ListState) is the same shape but its
    Python runner needs protobuf, absent from this container, so the
    GA API carries the operator here. Rows are processed in
    (u, event_id) order inside each micro-batch; with a time-split
    source the alerts converge exactly to burst_alerts_batch
    (tests/test_streaming.py, multi-batch case)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType

    state_schema = StructType(
        [
            StructField("us", ArrayType(LongType())),
            StructField("eids", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            us, eids = state.get
            hist = list(zip(list(us), list(eids)))
        else:
            hist = []
        incoming = []
        for pdf in pdfs:
            clicks = pdf[pdf["event_type"] == "click"]
            for _, r in clicks.iterrows():
                incoming.append((int(r["u"]), int(r["event_id"])))
        out = []
        for u, eid in sorted(incoming):
            hist = [(hu, he) for (hu, he) in hist if hu >= u - horizon_us]
            hist.append((u, eid))
            if len(hist) >= threshold:
                out.append((int(key[0]), eid, u, len(hist)))
        state.update(([h[0] for h in hist], [h[1] for h in hist]))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts_us", "n_in_window"]
        )

    prepped = events.select(
        "user_id", "event_id", "event_type", ts_us("ts").alias("u")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=BURST_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# CUSUM drift alerts (r8): the streaming counterpart of the batch
# change-point monitor — one-sided CUSUM with a fixed target, alerting
# on upward threshold CROSSINGS. The Lindley recursion
# C_i = max(0, C_{i-1} + (x_i − target)) has the closed form
# C_i = S_i − min(0, min_{j≤i} S_j), so the batch shadow is two windows
# + a lag (fully SQL-replayable, no reset), and the stream carries O(1)
# state per key: (s, min_s, prev_c).
# ---------------------------------------------------------------------------

CUSUM_TARGET_C = 5_500  # cents — the in-control per-event value mean
CUSUM_H_C = 50_000  # cents — alert threshold on the CUSUM statistic

CUSUM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("c_val", LongType()),
    ]
)


def cusum_alerts_batch(
    events: DataFrame,
    target_c: int = CUSUM_TARGET_C,
    h_c: int = CUSUM_H_C,
) -> DataFrame:
    """Batch shadow: per event_type ordered by (ts, event_id),
    d = cents − target; S = running sum; C = S − min(0, running min S);
    alert rows are the upward crossings (C > h, previous C ≤ h). All
    windows share ONE hashpartitioning(event_type) exchange."""
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    wrows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    d = events.select(
        "event_type",
        "event_id",
        "ts",
        (F.round(F.col("value") * 100).cast("long") - target_c).alias("d_i"),
    )
    s = d.withColumn("s_i", F.sum("d_i").over(wrows))
    c = s.withColumn(
        "c_val", F.col("s_i") - F.least(F.lit(0), F.min("s_i").over(wrows))
    )
    x = c.withColumn("pc", F.lag("c_val").over(w))
    return (
        x.where((F.col("c_val") > h_c) & F.coalesce(F.col("pc") <= h_c, F.lit(True)))
        .select(
            "event_type",
            "event_id",
            ts_us("ts").alias("ts_us"),
            F.col("c_val").cast("long"),
        )
    )


def cusum_alerts_stream(
    events: DataFrame,
    target_c: int = CUSUM_TARGET_C,
    h_c: int = CUSUM_H_C,
) -> DataFrame:
    """Streaming CUSUM drift detector: per-event_type state is THREE
    longs — (s, min_s, prev_c) — independent of stream length, the
    O(1)-state shape that survives any horizon (contrast the burst
    detector's trailing-window list state). Rows are folded in
    (ts_us, event_id) order inside each micro-batch; with a time-split
    source the emitted crossings equal cusum_alerts_batch exactly
    (tests/test_streaming.py)."""
    import pandas as pd  # noqa: F401 — Arrow batch interface
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = StructType(
        [
            StructField("s", LongType()),
            StructField("min_s", LongType()),
            StructField("prev_c", LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        s, min_s, prev_c = state.get if state.exists else (0, 0, 0)
        incoming = []
        for pdf in pdfs:
            # itertuples: the fold is per-row Python either way, but
            # tuple access is ~3x cheaper than iterrows' Series build
            incoming.extend(
                (int(u), int(eid), int(cents))
                for u, eid, cents in zip(pdf["u"], pdf["event_id"], pdf["cents"])
            )
        out = []
        for u, eid, cents in sorted(incoming):
            s += cents - target_c
            if s < min_s:
                min_s = s
            c = s - min(0, min_s)
            if c > h_c and prev_c <= h_c:
                out.append((str(key[0]), eid, u, c))
            prev_c = c
        state.update((s, min_s, prev_c))
        yield pd.DataFrame(out, columns=["event_type", "event_id", "ts_us", "c_val"])

    prepped = events.select(
        "event_type",
        "event_id",
        ts_us("ts").alias("u"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepped.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def query_health(query) -> list[dict]:
    """Per-micro-batch operational metrics from a (finished or running)
    StreamingQuery's progress log — the numbers an on-call engineer
    reads FIRST when a 100 TB streaming job misbehaves: input volume,
    watermark position, rows the watermark dropped (late-data loss is
    silent in the sink — this is the only place it is visible), and
    state-store size/memory (the leak axis for stateful operators).

    Returns one dict per progress event:
    (batch_id, input_rows, watermark, dropped_by_watermark,
    state_rows, state_bytes). Purely driver-side introspection of
    ``recentProgress`` — no jobs, no plan impact; usable identically
    against a live query (monitoring loop) or after
    ``processAllAvailable`` (tests, backfills).
    """
    out = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": int(p.get("numInputRows") or 0),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "dropped_by_watermark": sum(
                    int(o.get("numRowsDroppedByWatermark") or 0) for o in ops
                ),
                "state_rows": sum(int(o.get("numRowsTotal") or 0) for o in ops),
                "state_bytes": sum(
                    int(o.get("memoryUsedBytes") or 0) for o in ops
                ),
            }
        )
    return out


def quantile_sketch_agg(events: DataFrame) -> DataFrame:
    """Streaming build of the mergeable log2-histogram quantile sketch
    (sketches.log2_hist_quantiles's state): per event_type, exact
    counts per BIT-LENGTH bin of the cent value. Because the sketch
    state is a plain integer-count hash aggregation, the SAME
    definition runs batch or streaming (complete mode) and micro-batch
    partials merge associatively — the property that makes the sketch
    a streaming-native quantile monitor where an exact rank quantile
    would need the whole history. The tiny (type × ≤64 bins) result is
    turned into p50/p95/p99 estimates downstream (or by
    log2_hist_quantiles on the batch side)."""
    from avocado_spark.operators.sketches import log2_bin_expr

    v_c = F.round(F.col("value") * 100).cast("bigint")
    return (
        events.select("event_type", v_c.alias("_qs_v"))
        .withColumn("bin_id", log2_bin_expr("_qs_v"))
        .groupBy("event_type", "bin_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def rankstat_state_agg(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "view",
) -> DataFrame:
    """Streaming build of the SUFFICIENT STATE for two-sample rank
    statistics (Mann–Whitney U, KS): per distinct cent value, the
    count from sample A and from sample B. Rank stats are streamable
    for the same reason the log2 sketch is — their state is a plain
    integer-count hash aggregation over a VALUE-DOMAIN-bounded key
    (never the row history), so the same definition runs batch or
    complete-mode streaming and micro-batch partials merge
    associatively. relational.mannwhitney_u / ks_two_sample fold their
    statistics from exactly this table (their first stage IS this
    agg), so a live drift monitor keeps this state hot and replays the
    tiny cumsum+argmax tail on demand."""
    v_c = F.round(F.col("value") * 100).cast("bigint")
    return (
        events.where(F.col("event_type").isin(type_a, type_b))
        .select(F.col("event_type").alias("_rs_t"), v_c.alias("v_c"))
        .groupBy("v_c")
        .agg(
            F.sum(F.when(F.col("_rs_t") == type_a, 1).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(F.col("_rs_t") == type_b, 1).otherwise(0))
            .cast("bigint")
            .alias("c_b"),
        )
    )
