"""Fixture-encoding canary + NTZ-proofing tests.

Round-4 lesson: the driver silently regenerated ``events.parquet``
with a different timestamp encoding (TIMESTAMP(NANOS) → plain
``timestamp[us]`` = TIMESTAMP_NTZ) and 9 queries + the whole bench
went red at the driver gate with zero pytest signal. These tests make
the NEXT encoding change fail loudly here instead:

  * canary: ``load_table`` must yield canonical ``ts: timestamp`` for
    every available scale factor, and a known event's epoch-micros
    must round-trip exactly against DuckDB ``epoch_us`` (which reads
    the same parquet natively);
  * NTZ-proofing: the streaming/time-series operators run directly on
    a hand-built TIMESTAMP_NTZ DataFrame — no scan normalization in
    the path — so the module survives even if a raw NTZ frame reaches
    it.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from avocado_spark.functions.time_fns import normalize_timestamps, ts_us
from avocado_spark.session import load_table
from avocado_spark.streaming import events as EV

SF_DIRS = sorted(
    d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)
)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_canonical_timestamp(spark, sf_dir):
    """Canary: whatever the on-disk encoding, load_table must surface
    ts as TIMESTAMP (LTZ) — the single type every operator assumes."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        f"{sf_dir}/events.parquet: ts normalized to {dict(ev.dtypes)['ts']!r}, "
        "expected 'timestamp' — did the driver change the fixture encoding?"
    )


def test_events_epoch_us_matches_duckdb(spark, duck):
    """Value-level canary: epoch micros of the min-event_id row must
    agree exactly with DuckDB reading the same file natively."""
    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    row = (
        ev.select("event_id", ts_us("ts").alias("us"))
        .orderBy("event_id")
        .limit(1)
        .collect()[0]
    )
    want = duck.execute(
        f"SELECT event_id, epoch_us(ts) FROM read_parquet('{sf}/events.parquet') "
        "ORDER BY event_id LIMIT 1"
    ).fetchone()
    assert (row["event_id"], row["us"]) == want


def _ntz_events(spark):
    """A raw TIMESTAMP_NTZ events frame, built in-memory (no scan, no
    load_table normalization) — the worst-case input shape."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 10, "view", 1.0, "{}"),
            (2, "2024-01-01 00:10:00", 10, "click", 2.0, "{}"),
            (3, "2024-01-01 00:20:00", 10, "purchase", 30.0, "{}"),
            (4, "2024-01-01 01:05:00", 11, "view", 1.5, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


def test_ts_us_total_over_ntz_and_ltz(spark):
    ntz = _ntz_events(spark)
    ltz = normalize_timestamps(ntz)
    assert dict(ltz.dtypes)["ts"] == "timestamp"
    a = [r["us"] for r in ntz.select(ts_us("ts").alias("us")).orderBy("us").collect()]
    b = [r["us"] for r in ltz.select(ts_us("ts").alias("us")).orderBy("us").collect()]
    assert a == b
    # 2024-01-01 00:05:00 UTC
    assert a[0] == 1704067500000000


def test_tumbling_agg_on_raw_ntz(spark):
    out = EV.tumbling_agg(_ntz_events(spark), window="1 hour").orderBy(
        "window_start_us", "event_type"
    )
    rows = [tuple(r) for r in out.collect()]
    h0 = 1704067200000000  # 2024-01-01 00:00:00 UTC
    h1 = h0 + 3600_000_000
    assert rows == [
        (h0, "click", 1, 200),
        (h0, "purchase", 1, 3000),
        (h0, "view", 1, 100),
        (h1, "view", 1, 150),
    ]


def test_asof_join_on_raw_ntz(spark):
    from avocado_spark.operators.relational import asof_join

    ev = _ntz_events(spark)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases, views, keys=["user_id"], ts_col="ts", right_cols=["event_id", "value"]
    ).select("p_event_id", "r_event_id", ts_us("r_ts").alias("v_us"))
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(3, 1, 1704067500000000)]


def test_funnel_on_raw_ntz(spark):
    out = EV.funnel_stages(_ntz_events(spark)).orderBy("user_id")
    rows = [(r["user_id"], r["reached_stage"]) for r in out.collect()]
    assert rows == [(10, 3), (11, 1)]
