"""Data-layout operators: multi-dimensional clustering for scan
pruning. At 100 TB the dominant cost is bytes scanned; Z-order
clustering co-locates rows that are close in BOTH of two key columns,
so parquet row-group min/max stats prune point/range queries on either
key — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed
here as plain column arithmetic + a range-partitioned sort.

Everything is JVM-side integer bit math (shiftleft / bitwise AND) —
codegen-friendly, no UDFs, and the identical arithmetic replays in the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    Morton (Z-order) key: bit i of x lands at position 2i, bit i of y
    at 2i+1. Unrolled at plan-build time into a straight-line sum of
    literal shift/mask terms — whole-stage codegen, no loop state."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_block_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    block_shift: int = 18,
) -> DataFrame:
    """Z-order clustering quality report: assign each row its Morton
    key, group rows into blocks of 2^block_shift consecutive key
    values (a proxy for the row-groups a Z-sorted writer would emit),
    and report each block's min/max envelope on BOTH dimensions plus
    its row count.

    Narrow envelopes on both axes = a point query on either column
    prunes most blocks via footer stats alone. Compare against a
    single-column sort, whose envelopes are tight on one axis and
    full-width on the other. One hash aggregation; the production
    writer would instead `repartitionByRange(zval).sortWithinPartitions`
    straight into the sink.
    """
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    return (
        df.select(
            F.col(x_col).cast("bigint").alias("x"),
            F.col(y_col).cast("bigint").alias("y"),
            F.shiftright(z, block_shift).alias("block"),
        )
        .groupBy("block")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


def pruning_efficiency(
    block_stats: DataFrame,
    x_point: int,
    y_point: int,
) -> DataFrame:
    """Footer-pruning scorecard for two point queries (one per
    dimension) against the block envelopes: how many blocks — and how
    many rows — would a min/max-stats reader actually open? The
    one-row result is the layout's figure of merit."""
    xin = (F.lit(x_point) >= F.col("x_min")) & (F.lit(x_point) <= F.col("x_max"))
    yin = (F.lit(y_point) >= F.col("y_min")) & (F.lit(y_point) <= F.col("y_max"))
    return block_stats.agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(xin.cast("int")).cast("bigint").alias("x_blocks_read"),
        F.sum(F.when(xin, F.col("n_rows")).otherwise(0)).cast("bigint").alias(
            "x_rows_read"
        ),
        F.sum(yin.cast("int")).cast("bigint").alias("y_blocks_read"),
        F.sum(F.when(yin, F.col("n_rows")).otherwise(0)).cast("bigint").alias(
            "y_rows_read"
        ),
    )


def shard_layout(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-export shard layout: deterministically scatter
    documents into ``n_shards`` output shards by an LCG hash of the id
    (the global shuffle a dataloader needs so every shard is an
    unbiased sample of the corpus), and report per-shard document
    count, token budget, and an order-sensitive fingerprint of the
    shard's content in its within-shard read order (hash asc, id asc).

    The fingerprint makes shard CONTENT AND ORDER part of the
    differential — two engines agreeing on counts but disagreeing on
    iteration order (the thing that silently changes training runs)
    hash-mismatch here.

    Scale shape: one hash aggregation on the shard id; the ordered
    fold rides an array_sort(collect_list) per shard, so shards must
    stay driver-irrelevant but executor-memory-sized — exactly the
    contract of a real shard writer (a shard IS one output file). The
    production writer is `repartition(n_shards, hash).sortWithin
    Partitions` straight into the sink; this operator is its audit.
    """
    from avocado_spark.operators.text import doc_fingerprint, tokens

    h = (F.col(id_col) * 1103515245 + 12345) % 2147483648
    fp = doc_fingerprint(tokens(F.col(text_col)))
    per_doc = docs.select(
        (h % n_shards).cast("bigint").alias("shard_id"),
        h.alias("_h"),
        F.col(id_col).alias("_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("_n_tokens"),
        fp.alias("_fp"),
    )
    ordered_fps = F.transform(
        F.array_sort(F.collect_list(F.struct("_h", "_id", "_fp"))),
        lambda s: s["_fp"],
    )
    order_fp = F.aggregate(
        ordered_fps,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % 1000000007,
    )
    return per_doc.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_n_tokens").cast("bigint").alias("n_tokens"),
        order_fp.alias("order_fp"),
    )


def compaction_plan(
    file_stats: DataFrame,
    part_col: str = "part",
    file_col: str = "file_id",
    rows_col: str = "n_rows",
    target_rows: int = 100_000,
) -> DataFrame:
    """Small-file compaction planner: given per-file stats within each
    partition, assign files to merge bins by next-fit over a running
    total (largest files first, id tie-break), so every bin reaches
    ``target_rows`` before the next opens. Output adds ``bin_id`` plus
    the file's position; downstream a compactor rewrites each bin as
    one file.

    The 100-TB small-files problem is planned, not solved, per row of
    DATA — this operator only ever touches per-file STATS (from the
    ``_metadata`` hidden columns or the catalog), so the plan costs
    O(files), and the one window shuffle partitions by the table
    partition key. Bin assignment is a prefix-sum expression —
    deterministic and engine-replayable, so the plan itself is
    oracle-checkable.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.desc(rows_col), F.asc(file_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(rows_col).over(w)
    return file_stats.select(
        part_col,
        file_col,
        F.col(rows_col).cast("bigint").alias(rows_col),
        F.floor((cum - F.col(rows_col)) / F.lit(target_rows))
        .cast("bigint")
        .alias("bin_id"),
    )
