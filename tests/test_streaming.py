"""True Structured Streaming tier: file source → watermarked
transformations → memory sink, asserted to converge to the batch
result over the same complete input (the Structured Streaming
contract). The batch side is already DuckDB-oracle-checked in
test_oracle_parity."""

from __future__ import annotations

import pytest

from avocado_spark.session import load_table
from avocado_spark.streaming import events as EV
from tests.conftest import SF_SMOKE


def _run_stream(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def events_stream(spark):
    return EV.read_events_stream(spark, SF_SMOKE)


def test_streaming_tumbling_matches_batch(spark, events_stream):
    batch = EV.tumbling_agg(load_table(spark, SF_SMOKE, "events"))
    stream = EV.tumbling_agg(events_stream)
    assert stream.isStreaming
    out = _run_stream(spark, stream, "t_tumbling", "complete")
    assert _rows(out) == _rows(batch)


def test_streaming_session_matches_batch(spark, events_stream):
    batch = EV.session_agg(load_table(spark, SF_SMOKE, "events"))
    out = _run_stream(spark, EV.session_agg(events_stream), "t_session", "complete")
    assert _rows(out) == _rows(batch)


def test_streaming_dedup_and_running_total(spark, events_stream):
    # dedup: streaming dropDuplicatesWithinWatermark keeps one row per id
    out = _run_stream(
        spark, EV.dedup_stream(events_stream, ["event_id"]), "t_dedup", "append"
    )
    n = load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    assert out.count() == n

    # custom stateful operator: per-user running totals converge to the
    # batch window-cumsum (compare final per-user totals)
    out2 = _run_stream(
        spark,
        EV.running_total_stream(events_stream),
        "t_running",
        "append",
    )
    got = {
        (r["user_id"], r["event_id"]): r["running_total_c"] for r in out2.collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["running_total_c"]
        for r in EV.running_total_batch(load_table(spark, SF_SMOKE, "events")).collect()
    }
    assert got == want


def test_streaming_sliding_matches_batch(spark, events_stream):
    batch = EV.sliding_agg(load_table(spark, SF_SMOKE, "events"))
    out = _run_stream(spark, EV.sliding_agg(events_stream), "t_sliding", "complete")
    assert _rows(out) == _rows(batch)


def test_streaming_attribution_join_matches_batch(spark, events_stream):
    # stream-stream inner join with time-range condition: both sides
    # watermarked, so join state is bounded by the horizon
    stream = EV.attribution_join(events_stream, trigger_events=events_stream)
    assert stream.isStreaming
    out = _run_stream(spark, stream, "t_attrib", "append")
    batch = EV.attribution_join(load_table(spark, SF_SMOKE, "events"))
    assert _rows(out) == _rows(batch)


def test_streaming_trending_topk_matches_batch(spark, events_stream):
    # two-stage split: windowed counts run streaming into the sink,
    # the rank stage runs over the emitted table (the foreachBatch
    # deployment shape) and must converge to the single batch plan
    counts = EV.tumbling_agg(events_stream).drop("sum_value_c")
    assert counts.isStreaming
    sink = _run_stream(spark, counts, "t_trending_counts", "complete")
    got = EV.trending_topk(sink, k=3)
    batch_counts = EV.tumbling_agg(load_table(spark, SF_SMOKE, "events")).drop(
        "sum_value_c"
    )
    want = EV.trending_topk(batch_counts, k=3)
    assert _rows(got) == _rows(want)


def test_streaming_late_data_dropped_at_watermark(spark, tmp_path):
    """Late-data contract (r4 verdict stretch item): an event arriving
    AFTER its window was finalized by the watermark is dropped — no
    state resurrection, no double emit. Three micro-batches
    (maxFilesPerTrigger=1): batch 0 opens the 00:00 window and advances
    the watermark to 02:00; batch 1's eviction finalizes the 00:00
    window (append emit, count 1); batch 2 carries a 00:45 row that is
    now beyond the watermark and must vanish. (Spark semantics note: a
    late row whose window is still LIVE in state does merge — drop
    happens once the window is finalized, which is what this stages.)
    The staged files are plain timestamp[us] (TIMESTAMP_NTZ), doubling
    as an end-to-end NTZ streaming regression test."""
    import datetime as dt
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    def _file(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),  # naive → TIMESTAMP_NTZ in Spark
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, path)

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    d = str(tmp_path / "late_events")
    os.makedirs(d)
    # batch 0: max event time 04:00 → watermark 02:00 for batch 1
    _file(f"{d}/0.parquet", [(1, T(0, 30), 10, "view", 1.0), (2, T(4, 0), 10, "view", 1.0)])
    # batch 1: filler row; its eviction pass finalizes the 00:00 window
    _file(f"{d}/1.parquet", [(5, T(4, 15), 12, "view", 1.0)])
    # batch 2: LATE row for the finalized 00:00 window + an on-time row
    _file(f"{d}/2.parquet", [(3, T(0, 45), 11, "view", 1.0), (4, T(4, 30), 11, "view", 1.0)])
    now = _time.time()
    for i, f in enumerate(["0.parquet", "1.parquet", "2.parquet"]):
        os.utime(f"{d}/{f}", (now - 100 + i * 10, now - 100 + i * 10))

    schema = spark.read.parquet(d).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(d)
    )
    stream = EV.tumbling_agg(EV.normalize_events(raw), window="1 hour", watermark="2 hours")
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    h0 = 1704067200000000  # 2024-01-01 00:00 UTC
    # append sink holds exactly the finalized windows: the 00:00 window
    # emitted ONCE with count 1 — the late row neither re-emitted it nor
    # resurrected state (04:00 never finalizes before availableNow ends)
    got = [tuple(r) for r in spark.table("t_late").collect()]
    assert got == [(h0, "view", 1, 100)]
    # batch shadow over the ON-TIME subset reproduces the finalized row
    shadow = (
        EV.tumbling_agg(
            EV.normalize_events(spark.read.parquet(d)).where(F.col("event_id") != 3),
            window="1 hour",
        )
        .where(F.col("window_start_us") == h0)
        .collect()
    )
    assert [tuple(r) for r in shadow] == [(h0, "view", 1, 100)]
    # the un-watermarked full batch DOES count the late row — the delta
    # is exactly the watermark drop
    full = (
        EV.tumbling_agg(EV.normalize_events(spark.read.parquet(d)), window="1 hour")
        .where(F.col("window_start_us") == h0)
        .collect()
    )
    assert [tuple(r) for r in full] == [(h0, "view", 2, 200)]


def test_streaming_static_enrich_matches_batch(spark, events_stream):
    """Stream-static broadcast join: no watermark, no state — each
    micro-batch probes the broadcast dim; must converge to the batch
    left join."""
    cust = load_table(spark, SF_SMOKE, "customer")
    stream = EV.enrich_with_dim(events_stream, cust)
    assert stream.isStreaming
    out = _run_stream(spark, stream, "t_enrich", "append")
    batch = EV.enrich_with_dim(load_table(spark, SF_SMOKE, "events"), cust)
    assert sorted(tuple(r) for r in out.drop("ts").collect()) == sorted(
        tuple(r) for r in batch.drop("ts").collect()
    )


def test_streaming_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpoint/restart contract: a file-source → parquet-sink stream
    stopped after one batch and RESTARTED from the same checkpoint must
    process only the files that arrived in between — the sink ends up
    with every input row exactly once (no reprocessing, no loss). This
    is the deployment shape of every production ingest: the offsets log
    in the checkpoint is the source of truth across process restarts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)

    def _file(path, ids):
        pq.write_table(
            pa.table({"event_id": pa.array(ids, pa.int64())}), path
        )

    def _run():
        q = (
            spark.readStream.schema("event_id long")
            .format("parquet")
            .load(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _file(f"{src}/a.parquet", [1, 2, 3])
    _run()  # first incarnation: sees only file a
    first = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert first == [1, 2, 3]
    _file(f"{src}/b.parquet", [4, 5])
    _run()  # restart from the same checkpoint: must process ONLY file b
    final = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert final == [1, 2, 3, 4, 5]


def test_streaming_attribution_outer_matches_batch(spark, events_stream):
    # LEFT OUTER stream-stream join: unconverted views emit exactly
    # once with null purchase columns — released only when the
    # watermark proves no in-horizon match can still arrive. Views
    # whose horizon the FINAL watermark never passes (the last
    # watermark-delay + horizon of event time) stay held in state —
    # that is the documented Structured Streaming semantic, so the
    # convergence claim is: stream ⊆ batch, with exact equality on
    # the provably-closed region.
    stream = EV.attribution_join(
        events_stream, trigger_events=events_stream, how="left_outer"
    )
    assert stream.isStreaming
    out = _run_stream(spark, stream, "t_attrib_outer", "append")
    batch = EV.attribution_join(
        load_table(spark, SF_SMOKE, "events"), how="left_outer"
    )
    assert set(_rows(out)) <= set(_rows(batch))
    from pyspark.sql import functions as F

    max_us = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.max(EV.ts_us("ts")))
        .first()[0]
    )
    # final watermark = max_ts - 1h delay; a view's horizon is closed
    # once l_ts + 30min < watermark
    closed = max_us - 3_600_000_000 - 1_800_000_000
    out_closed = [r for r in _rows(out) if r[3] <= closed]
    batch_closed = [r for r in _rows(batch) if r[3] <= closed]
    assert out_closed == batch_closed and len(out_closed) > 0
    # the outer rows are the delta vs the inner join, all null-purchase
    inner = EV.attribution_join(load_table(spark, SF_SMOKE, "events"))
    n_outer_only = batch.count() - inner.count()
    assert n_outer_only > 0
    assert batch.where("r_event_id IS NULL").count() == n_outer_only


def test_streaming_burst_alerts_multibatch_converges(spark, tmp_path):
    """transformWithStateInPandas burst detector across MULTIPLE
    micro-batches: the source is split into two time-ordered files and
    fed one file per trigger, so per-user ListState genuinely carries
    clicks across batch boundaries; the emitted alerts must equal the
    batch self-join shadow over the full input."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(src + "/p1")
    ev.where(F.col("ts") > cut).coalesce(1).write.parquet(src + "/p2")
    # stage the two part files into one source dir, time-ordered names
    import glob as g
    import shutil

    srcdir = str(tmp_path / "stream_in")
    import os

    os.makedirs(srcdir)
    for i, part in enumerate(["p1", "p2"]):
        [f] = g.glob(f"{src}/{part}/part-*.parquet")
        shutil.copy(f, f"{srcdir}/{i:02d}.parquet")

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(srcdir)
    )
    out = _run_stream(
        spark, EV.burst_alerts_stream(stream), "t_burst", "append"
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in EV.burst_alerts_batch(ev).collect())
    assert got == want and len(want) > 0


def test_native_session_window_equals_manual_gap_sessionization(spark):
    """Two independent sessionization implementations must produce the
    same sessions: Spark's native session_window (merging keyed state)
    vs the manual lag/cumsum gap rule the batch analytics use — same
    boundaries (end = last event + gap), same counts, same cent sums."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from avocado_spark.functions.time_fns import ts_us
    from tests.conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    native = EV.session_agg(ev, gap="5 minutes", watermark=None)

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = 300
    lag_us = F.lag(ts_us("ts")).over(w)
    sess = (
        ev.withColumn(
            "is_start",
            F.when(
                lag_us.isNull() | (ts_us("ts") - lag_us >= gap_s * 1_000_000), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    manual = sess.groupBy("user_id", "session_no").agg(
        F.min(ts_us("ts")).alias("session_start_us"),
        (F.max(ts_us("ts")) + gap_s * 1_000_000).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_value_c"),
    ).drop("session_no")

    a = {tuple(r) for r in native.collect()}
    b = {tuple(r) for r in manual.collect()}
    assert a == b and len(a) > 100


def test_running_total_tws_matches_batch_or_skips(spark, events_stream):
    """The transformWithStateInPandas successor must converge to the
    same batch cumsum; on runtimes without its protobuf worker the
    test skips cleanly (the GA operator above stays the product path)."""
    if not EV.tws_available():
        pytest.skip("transformWithStateInPandas runtime (protobuf) absent")
    out = _run_stream(
        spark,
        EV.running_total_stream_tws(events_stream),
        "t_running_tws",
        "append",
    )
    got = {
        (r["user_id"], r["event_id"]): r["running_total_c"] for r in out.collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["running_total_c"]
        for r in EV.running_total_batch(load_table(spark, SF_SMOKE, "events")).collect()
    }
    assert got == want


def test_streaming_cusum_multibatch_converges(spark, tmp_path):
    """CUSUM drift detector across multiple micro-batches: per-type
    (s, min_s, prev_c) state genuinely carries across batch boundaries
    on a time-split source; emitted crossings must equal the batch
    Lindley-closed-form shadow over the full input, and a crossing
    whose run spans the batch boundary must still fire exactly once."""
    import glob as g
    import os
    import shutil

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(src + "/p1")
    ev.where(F.col("ts") > cut).coalesce(1).write.parquet(src + "/p2")
    srcdir = str(tmp_path / "stream_in")
    os.makedirs(srcdir)
    for i, part in enumerate(["p1", "p2"]):
        [f] = g.glob(f"{src}/{part}/part-*.parquet")
        shutil.copy(f, f"{srcdir}/{i:02d}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(srcdir)
    )
    out = _run_stream(spark, EV.cusum_alerts_stream(stream), "t_cusum", "append")
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in EV.cusum_alerts_batch(ev).collect())
    assert got == want and len(want) > 0


def test_query_health_surfaces_watermark_drops(spark, tmp_path):
    """The progress-metrics helper must expose the silent late-data
    loss: replay the late-data scenario and read
    numRowsDroppedByWatermark from the query's own progress log —
    total input accounted, ≥1 row dropped, and state bounded."""
    import datetime as dt
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _file(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, path)

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    d = str(tmp_path / "health_events")
    os.makedirs(d)
    _file(f"{d}/0.parquet", [(1, T(0, 30), 10, "view", 1.0), (2, T(4, 0), 10, "view", 1.0)])
    _file(f"{d}/1.parquet", [(5, T(4, 15), 12, "view", 1.0)])
    _file(f"{d}/2.parquet", [(3, T(0, 45), 11, "view", 1.0), (4, T(4, 30), 11, "view", 1.0)])
    now = _time.time()
    for i, f in enumerate(["0.parquet", "1.parquet", "2.parquet"]):
        os.utime(f"{d}/{f}", (now - 100 + i * 10, now - 100 + i * 10))

    schema = spark.read.parquet(d).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(d)
    )
    stream = EV.tumbling_agg(
        EV.normalize_events(raw), window="1 hour", watermark="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_health")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        health = EV.query_health(q)
    finally:
        q.stop()
    assert sum(h["input_rows"] for h in health) == 5
    assert sum(h["dropped_by_watermark"] for h in health) >= 1
    # watermark advanced past the late row's window
    assert any((h["watermark"] or "") >= "2024-01-01T02:00:00" for h in health)
    # bounded state: never more windows than distinct (window, type) keys
    assert all(h["state_rows"] <= 4 for h in health)


def test_streaming_quantile_sketch_matches_batch(spark, events_stream):
    """The mergeable log2-hist sketch built by Structured Streaming
    (complete mode) must equal the batch build bin-for-bin — the
    micro-batch partials merge associatively by construction."""
    batch = EV.quantile_sketch_agg(load_table(spark, SF_SMOKE, "events"))
    out = _run_stream(
        spark, EV.quantile_sketch_agg(events_stream), "t_qsketch", "complete"
    )
    assert _rows(out) == _rows(batch)


def test_streaming_rankstat_state_matches_batch_and_folds_u(spark, events_stream):
    """The rank-statistic sufficient state built by Structured
    Streaming (complete mode) must equal the batch build row-for-row,
    and mannwhitney_u folded from the STREAMED state must equal the
    operator run directly on the batch rows — the end-to-end proof
    that rank stats are live-monitorable from domain-bounded state."""
    from pyspark.sql import functions as F

    from avocado_spark.operators.relational import mannwhitney_u

    ev = load_table(spark, SF_SMOKE, "events")
    batch = EV.rankstat_state_agg(ev)
    out = _run_stream(
        spark, EV.rankstat_state_agg(events_stream), "t_rankstat", "complete"
    )
    assert _rows(out) == _rows(batch)
    # fold U from the streamed state: re-expand is unnecessary — the
    # operator's first stage IS this agg, so feed it the state rows
    # weighted by their counts via explode-free union of the two sides
    expand = out.select(
        "v_c", F.expr("explode(array_repeat('a', int(c_a)))").alias("g")
    ).unionByName(
        out.select("v_c", F.expr("explode(array_repeat('b', int(c_b)))").alias("g"))
    )
    from_state = mannwhitney_u(expand, "v_c", F.col("g") == "a").first()
    direct = mannwhitney_u(
        ev.where(F.col("event_type").isin("purchase", "view")).select(
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
            "event_type",
        ),
        "v_c",
        F.col("event_type") == "purchase",
    ).first()
    assert tuple(from_state) == tuple(direct)
