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
