"""Shared pytest fixtures: one SparkSession per run + a DuckDB oracle
connection with the driver tables pre-registered (mirrors the driver's
t2 differential gate)."""

from __future__ import annotations

import math

import duckdb
import pytest

from avocado_spark.session import get_spark
from avocado_spark.tables import RAW_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="avocado_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir, suffix in ((SF_SMOKE, "_smoke"), (SF_CORRECT, "")):
        for t in RAW_TABLES:
            try:
                con.execute(
                    f"CREATE VIEW {t}{suffix} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
            except duckdb.Error:
                pass
    yield con
    con.close()


def _norm(v):
    """Everything → string so sorted() is total across nulls and mixed
    int/float dtypes (pandas promotes nullable ints to float64)."""
    import decimal

    if v is None or v is getattr(__import__("pandas"), "NA", None):
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 2.0 (promoted int) == 2
        return str(round(v, 9))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def assert_df_matches_oracle(spark_df, duck_con, sql: str, check_cols: bool = True):
    """Order-insensitive comparison of a Spark DataFrame against a DuckDB
    result — column names sorted first, like the driver's value-hash."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).df()
    s_cols, d_cols = sorted(map(str.lower, sdf.columns)), sorted(map(str.lower, ddf.columns))
    if check_cols:
        assert s_cols == d_cols, f"columns differ: {s_cols} vs {d_cols}"
    sdf.columns, ddf.columns = map(str.lower, sdf.columns), map(str.lower, ddf.columns)
    sdf, ddf = sdf[s_cols], ddf[s_cols]
    assert len(sdf) == len(ddf), f"row counts differ: {len(sdf)} vs {len(ddf)}"

    srows = sorted((tuple(_norm(v) for v in row) for row in sdf.itertuples(index=False)))
    drows = sorted((tuple(_norm(v) for v in row) for row in ddf.itertuples(index=False)))
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
