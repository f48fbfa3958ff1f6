"""Per-site coverage capping (SURVEY §2.6 O2 — HardLimiter, dead code
in the reference but CLI-plumbed; avocado-core/.../util/HardLimiter.scala:40-137).

Semantics (exact sweep): process reads in (start) order per contig;
maintain the set of admitted reads still overlapping the current
position; flush admitted reads whose end <= new start; admit the new
read iff the remaining overlap depth < max_coverage. Dropped reads
vanish from the output.

Spark shape: the sweep is order-dependent, so it runs as an
Arrow-batched ``applyInPandas`` per contig group after a range sort.
At 100 TB one task per contig is too coarse — production splits each
contig into large bins sized >> read length and runs the sweep per
bin; only reads spanning a bin boundary see approximate depth (bounded
by bin_width / read_length). ``bin_width=None`` gives the exact
per-contig sweep; a positive bin width gives the scalable variant.
The cheap approximation (row_number window per identical start bin) is
`relational.top_k_per_group`.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sweep_limit(starts, ends, max_coverage: int) -> list[bool]:
    """The per-partition sweep kernel: keep/drop mask over reads sorted
    by start (HardLimiter.processRead, :100-137). O(n log k) via a heap
    of admitted read ends."""
    admitted: list[int] = []  # min-heap of ends
    keep: list[bool] = []
    for s, e in zip(starts, ends):
        while admitted and admitted[0] <= s:
            heapq.heappop(admitted)
        if len(admitted) < max_coverage:
            heapq.heappush(admitted, e)
            keep.append(True)
        else:
            keep.append(False)
    return keep


def coverage_cap_exact(
    reads: DataFrame,
    max_coverage: int,
    contig_col: str = "contig",
    start_col: str = "start",
    end_col: str = "end",
    order_col: str = "read_id",
    bin_width: int | None = None,
) -> DataFrame:
    """Exact (or bin-scoped) coverage cap. Ties on start are broken by
    ``order_col`` so the admitted set is deterministic."""

    group_cols = [contig_col]
    if bin_width is not None:
        reads = reads.withColumn("_cap_bin", (F.col(start_col) / bin_width).cast("long"))
        group_cols.append("_cap_bin")

    schema = reads.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, order_col])
        mask = sweep_limit(
            pdf[start_col].tolist(), pdf[end_col].tolist(), max_coverage
        )
        return pdf[pd.Series(mask, index=pdf.index)]

    out = reads.groupBy(*group_cols).applyInPandas(run, schema=schema)
    if bin_width is not None:
        out = out.drop("_cap_bin")
    return out


def interval_union_length(
    intervals: DataFrame,
    group_col: str = "contig",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Total genome covered per contig: merge overlapping [start, end)
    intervals into islands with the classic sweep — per group, order by
    (start, end), an interval starts a new island iff its start exceeds
    the running max of all previous ends — then sum island extents.
    Ref: the reference's coverage observer walks per-position depth
    (avocado-core/.../observer/Observer.scala); the island sweep
    answers the "how many bases are covered at all" question in
    O(n log n) without materializing positions.

    Shape: two stacked windows (running max + island running sum) on
    ONE (group) shuffle partitioning, then a grouped sum — no joins,
    no explode to base pairs, so 100 TB of reads never becomes 100 TB
    × read-length of positions.
    """
    w = Window.partitionBy(group_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = intervals.select(
        group_col,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        )
        .otherwise(0)
        .alias("_new_island"),
    )
    w2 = Window.partitionBy(group_col).orderBy("_s", "_e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = flagged.withColumn("_island", F.sum("_new_island").over(w2))
    per_island = islands.groupBy(group_col, "_island").agg(
        F.min("_s").alias("i_start"), F.max("_e").alias("i_end")
    )
    return per_island.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("bigint").alias("covered_len"),
    )
