"""Timestamp-encoding normalization helpers.

The driver's ``events.parquet`` fixture has shipped with THREE ts
encodings across rounds: TIMESTAMP(NANOS) (read as long nanos under
``spark.sql.legacy.parquet.nanosAsLong``), plain ``timestamp[us]``
without timezone (Spark: TIMESTAMP_NTZ), and potentially tz-aware
``timestamp[us, UTC]`` (Spark: TIMESTAMP). LTZ-only expressions like
``unix_micros()`` throw ``DATATYPE_MISMATCH`` on NTZ input — this broke
9 queries + the whole bench in round 4. Every operator that extracts
epoch micros goes through :func:`ts_us` so all three encodings behave
identically; every scan goes through :func:`normalize_timestamps`.

Correctness contract: the session TZ is pinned to UTC (session.py), so
casting NTZ → TIMESTAMP reinterprets the wall-clock as a UTC instant —
exactly DuckDB's ``epoch_us(naive_ts)`` semantics. For LTZ input the
cast is a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_instant(col: Column | str) -> Column:
    """Coerce any timestamp flavor to TIMESTAMP (LTZ instant).

    NTZ wall-clock is reinterpreted under the session TZ (pinned UTC),
    LTZ passes through unchanged — so the result is cast-stable across
    fixture encodings.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-proof.

    ``F.unix_micros`` requires TIMESTAMP (LTZ); routing through
    :func:`as_instant` makes it total over NTZ/LTZ inputs and matches
    DuckDB ``epoch_us`` under the UTC session TZ.
    """
    return F.unix_micros(as_instant(col))


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column of ``df`` to TIMESTAMP.

    Scan-boundary normalization: downstream operators see one canonical
    timestamp type regardless of how the parquet fixture encodes it.
    Cheap — a cast inside the scan's project, no shuffle, stays in
    whole-stage codegen.
    """
    ntz = [name for name, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({name: F.col(name).cast("timestamp") for name in ntz})
