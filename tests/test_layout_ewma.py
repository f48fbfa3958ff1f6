"""Unit/property tests for the round-6 layout + robust-stats operators:
Z-order interleave correctness vs a Python reference, pruning-envelope
quality vs a single-column sort, EWMA fold vs a pandas replay, and the
salted join's row-identity to the plain join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from avocado_spark.operators.layout import (
    pruning_efficiency,
    zorder_block_stats,
    zvalue,
)
from avocado_spark.operators.relational import ewma_per_key, salted_join


def _py_zvalue(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "x int, y int").select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_zvalue(r.x, r.y), (r.x, r.y, r.z)


def test_zorder_prunes_both_axes(spark):
    """On a grid, Z-order blocks must prune a point query on EITHER
    axis to a small fraction of rows; a single-column sort prunes one
    axis only (the y envelope of every x-sorted block is full-width)."""
    n = 1 << 14
    base = spark.range(n).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("bigint").alias("y")
    )
    zb = zorder_block_stats(base, "x", "y", bits=7, block_shift=7)
    z = pruning_efficiency(zb, x_point=3, y_point=3).first()
    # both axes prune to well under a quarter of the data
    assert z.x_rows_read < n / 4, z
    assert z.y_rows_read < n / 4, z
    # contrast: sort by x alone -> y point query reads EVERYTHING
    xb = base.select(
        "x", "y", (F.col("x") * 128 + F.col("y")).alias("zv")
    )
    xb = (
        xb.select("x", "y", F.shiftright(F.col("zv"), 7).alias("block"))
        .groupBy("block")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
    s = pruning_efficiency(xb, x_point=3, y_point=3).first()
    assert s.y_rows_read == n, s  # row-major layout cannot prune y
    assert z.y_rows_read < s.y_rows_read / 4


def test_ewma_matches_pandas_replay(spark):
    pdf = pd.DataFrame(
        {
            "k": [1] * 5 + [2] * 3,
            "t": list(range(5)) + list(range(3)),
            "v": [1.0, 2.0, 0.5, 3.0, 1.5, 10.0, 0.0, 5.0],
        }
    )
    out = {
        r.k: r
        for r in ewma_per_key(
            spark.createDataFrame(pdf), "k", "t", "v", alpha=0.2
        ).collect()
    }
    for k, g in pdf.groupby("k"):
        acc = None
        for v in g.sort_values("t")["v"]:
            acc = v if acc is None else 0.2 * v + 0.8 * acc
        assert abs(out[k].ewma - round(acc, 6)) < 1e-9, (k, acc, out[k])
        assert out[k].n == len(g)
        assert out[k].first_v == g.sort_values("t")["v"].iloc[0]
        assert out[k].last_v == g.sort_values("t")["v"].iloc[-1]


def test_salted_join_equals_plain_join(spark):
    fact = spark.range(2000).select(
        (F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 10)).alias("k"),
        F.col("id").alias("rid"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("w")
    )
    for n_salts in (1, 4, 16):
        got = (
            salted_join(fact, dim, "k", n_salts=n_salts, salt_src=["rid"])
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum(F.col("rid") * F.col("w")).alias("s"))
        )
        want = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum(F.col("rid") * F.col("w")).alias("s"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
