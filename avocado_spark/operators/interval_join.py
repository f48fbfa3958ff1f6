"""Genomic interval-overlap joins (SURVEY §2.4 J1/J3/J4).

The reference implements interval joins twice:
  * TreeRegionJoin — sort + collect the small side to the driver,
    broadcast a binary-searchable array, stream the big side map-side
    (avocado-core/.../util/TreeRegionJoin.scala:43-203);
  * shuffleRegionJoinAndGroupByLeft — ADAM's sort-merge interval join
    for two large sides (avocado-core/.../genotyping/SquareOffReferenceModel.scala:87).

Spark-first re-expression: ONE api, two physical strategies, chosen by
a size heuristic (the reference hard-codes the choice per pipeline):

  * ``broadcast`` — bin the SMALL side, broadcast it, and equi-join on
    (contig, bin) with exact-overlap post-filter: a broadcast HASH join
    (O(bins-per-row) probes), the Spark analog of the reference's
    binary-searchable broadcast Forest. The big side never shuffles.
    NOT a BroadcastNestedLoopJoin — the naive theta-join hint gives
    O(n·m) probes per partition (measured 4× slower at sf0.1 already).
  * ``binned`` — the 100 TB path when both sides are large. Both sides
    are bucketed into fixed-width genome bins (an interval spanning k
    bins explodes into k rows), equi-joined on (contig, bin) — a
    shuffle hash/sort-merge join that scales linearly and
    co-partitions — then exact-overlap post-filtered. Turns the theta
    join into an equi join Catalyst plans well, at the cost of
    duplication bounded by (interval_len / bin_width + 1).

Overlap semantics are half-open, matching ReferenceRegion
(avocado-core/.../util/TreeRegionJoin.scala:175-177):
    same contig AND l.start < r.end AND l.end > r.start
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BIN_WIDTH = 10_000
# conservative driver-memory contract for the broadcast path (SURVEY §7
# "hard parts"): fall back to the binned shuffle join above this.
BROADCAST_MAX_ROWS = 3_000_000
# 'auto' first consults Catalyst's plan-time size estimate (free — no
# Spark job); only the gray zone between these bounds pays the bounded
# count probe. sizeInBytes over-estimates (column-product worst case),
# so the broadcast bound is generous and the binned bound conservative.
AUTO_BROADCAST_MAX_BYTES = 128 << 20
AUTO_BINNED_MIN_BYTES = 4 << 30


def _auto_strategy(left: DataFrame) -> str:
    """Pick broadcast vs binned for the left side: plan-time statistics
    when decisive, a single bounded count job only in the gray zone
    (the reference hard-codes the choice per pipeline; callers at scale
    should too and skip this entirely)."""
    try:
        stats_bytes = int(
            left._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
    except Exception:
        stats_bytes = None
    if stats_bytes is not None and stats_bytes <= AUTO_BROADCAST_MAX_BYTES:
        return "broadcast"
    if stats_bytes is not None and stats_bytes >= AUTO_BINNED_MIN_BYTES:
        return "binned"
    return (
        "broadcast"
        if left.limit(BROADCAST_MAX_ROWS + 1).count() <= BROADCAST_MAX_ROWS
        else "binned"
    )


_NATIVE_RANGE_JOIN: dict[str, bool] = {}  # per-session probe cache


def native_range_join_available(spark) -> bool:
    """Runtime capability probe (r7 verdict stretch #9): some Spark
    distributions (Databricks DBR's RANGE_JOIN hint; a session with a
    range-join strategy injected via spark.sql.extensions) plan an
    O(n log n) binned range join natively. OSS Spark 4.1 does NOT — the
    hint is silently ignored and the theta join degrades to a
    BroadcastNestedLoopJoin, measured 4× slower than our binned
    equi-join at sf0.1 already and quadratic at scale. Probe the
    EXPLAIN output of a 2-row hinted join once per session; callers
    (``strategy='native'``) fall back to 'binned' when absent, so the
    same pipeline code runs on both runtimes and picks up the native
    operator when it exists."""
    key = spark.sparkContext.applicationId
    if key not in _NATIVE_RANGE_JOIN:
        try:
            a = spark.range(2).select(
                F.col("id").alias("s"), (F.col("id") + 1).alias("e")
            )
            b = spark.range(2).select(F.col("id").alias("p"))
            j = a.hint("range_join", 1).join(
                b, (b["p"] >= a["s"]) & (b["p"] < a["e"])
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            _NATIVE_RANGE_JOIN[key] = "RangeJoin" in plan
        except Exception:  # pragma: no cover — probe must never break callers
            _NATIVE_RANGE_JOIN[key] = False
    return _NATIVE_RANGE_JOIN[key]


def _overlap_cond(left: DataFrame, right: DataFrame, lpre: str, rpre: str) -> Column:
    return (
        (left[f"{lpre}contig"] == right[f"{rpre}contig"])
        & (left[f"{lpre}start"] < right[f"{rpre}end"])
        & (left[f"{lpre}end"] > right[f"{rpre}start"])
    )


def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])


def _binned_side(df: DataFrame, prefix: str, bin_width: int) -> DataFrame:
    """Explode an interval table into one row per genome bin it touches.

    sequence() is JVM-side; the explode factor is bounded by
    interval_length / bin_width + 1, so pick bin_width near the median
    interval length of the *larger* side.
    """
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(f"{prefix}start") / bin_width).cast("long"),
                # end is exclusive: last touched bin is (end-1) // width
                ((F.col(f"{prefix}end") - F.lit(1)) / bin_width).cast("long"),
            )
        ),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    strategy: str = "auto",
    how: str = "inner",
    bin_width: int = DEFAULT_BIN_WIDTH,
    lprefix: str = "l_",
    rprefix: str = "r_",
) -> DataFrame:
    """Join two interval tables on genomic overlap.

    Both inputs must carry (contig, start, end) columns. Output carries
    every column from both sides, prefixed with ``lprefix``/``rprefix``.

    strategy: 'broadcast' (small left dim), 'binned' (both sides big),
    or 'auto' (count-based heuristic mirroring the reference's implicit
    contract that the variant set fits in driver memory).

    how: 'inner', or 'left' — left rows with no overlap appear once
    with null right columns. The left-outer backfill anti-joins on ALL
    left columns, so it requires the left side to be row-distinct
    (true for the variant/feature dims this operator serves); any other
    value raises rather than silently degrading to inner.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r} (use 'inner' or 'left')")
    lp, rp = _prefixed(left, lprefix), _prefixed(right, rprefix)

    if strategy == "auto":
        strategy = _auto_strategy(left)

    if strategy == "native":
        # use the runtime's own range-join operator when one exists
        # (DBR RANGE_JOIN hint / injected strategy); OSS Spark has none
        # — fall back to the binned equi-join rather than silently
        # shipping the O(n·m) nested loop the ignored hint leaves.
        if native_range_join_available(left.sparkSession):
            j = lp.hint("range_join", bin_width).join(
                rp, _overlap_cond(lp, rp, lprefix, rprefix), how
            )
            return j.select(
                *[lp[c] for c in lp.columns], *[rp[c] for c in rp.columns]
            )
        strategy = "binned"

    if strategy not in ("broadcast", "binned", "nlj"):
        raise ValueError(f"unknown strategy: {strategy}")

    if strategy == "nlj":
        # plain theta join — kept for plan comparison/debugging only
        if how == "left":
            # left-preserving: lp must be the streamed/preserved side
            # (rp.join(lp, ..., 'left') would preserve RIGHT rows — the
            # inverse of the documented contract)
            return lp.join(rp, _overlap_cond(lp, rp, lprefix, rprefix), "left").select(
                *[lp[c] for c in lp.columns], *[rp[c] for c in rp.columns]
            )
        return rp.join(F.broadcast(lp), _overlap_cond(lp, rp, lprefix, rprefix), how).select(
            *[lp[c] for c in lp.columns], *[rp[c] for c in rp.columns]
        )

    # both scalable paths are bin-bucketed equi joins; 'broadcast' only
    # adds the hint on the (binned) small side so the big side neither
    # shuffles nor explodes more than its own bin count.
    lb = _binned_side(lp, lprefix, bin_width).withColumnRenamed("_bin", "_lbin")
    rb = _binned_side(rp, rprefix, bin_width).withColumnRenamed("_bin", "_rbin")
    if strategy == "broadcast":
        lb = F.broadcast(lb)
    joined = lb.join(
        rb,
        (lb[f"{lprefix}contig"] == rb[f"{rprefix}contig"])
        & (lb["_lbin"] == rb["_rbin"])
        & (lb[f"{lprefix}start"] < rb[f"{rprefix}end"])
        & (lb[f"{lprefix}end"] > rb[f"{rprefix}start"])
        # dedup: credit the match only to the FIRST shared bin, so a
        # pair overlapping in k bins emits exactly one row — no
        # post-hoc distinct() shuffle needed.
        & (
            lb["_lbin"]
            == F.greatest(
                (lb[f"{lprefix}start"] / bin_width).cast("long"),
                (rb[f"{rprefix}start"] / bin_width).cast("long"),
            )
        ),
        how="inner",
    )
    inner = joined.select(
        *[F.col(f"{lprefix}{c}") for c in left.columns],
        *[F.col(f"{rprefix}{c}") for c in right.columns],
    )
    if how == "inner":
        return inner
    # left-outer backfill: one anti-join on the (distinct) left rows
    # that matched, then a null-extended union — no second interval join
    lcols = [f"{lprefix}{c}" for c in left.columns]
    matched = inner.select(*lcols).dropDuplicates()
    m = _prefixed(matched, "_m")
    # null-safe equality: a left row with a null non-key column must
    # still count as matched (plain = would resurrect it in the backfill)
    anti_cond = None
    for c in lcols:
        eq = lp[c].eqNullSafe(m[f"_m{c}"])
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = lp.join(m, on=anti_cond, how="left_anti")
    nulls = unmatched.select(
        *lcols,
        *[
            F.lit(None).cast(rp.schema[f"{rprefix}{c}"].dataType).alias(f"{rprefix}{c}")
            for c in right.columns
        ],
    )
    return inner.unionByName(nulls)


def interval_join_group_right(
    left: DataFrame,
    right: DataFrame,
    right_key: str,
    strategy: str = "broadcast",
    bin_width: int = DEFAULT_BIN_WIDTH,
    matches: str = "collect",
) -> DataFrame:
    """J1 fused form: join + groupByKey(right) — one output row per right
    row with the list of matching left rows (TreeRegionJoin.joinAndGroupByRight,
    avocado-core/.../util/TreeRegionJoin.scala:163-203; right rows with no
    match are dropped, matching the reference's inner semantics).

    ``matches='count'`` (r13 optimization round) returns ``n_matches``
    (the list's size) instead of the list itself: a consumer that only
    sizes the groups — coverage histograms, per-read match counts —
    otherwise pays an ObjectHashAggregate whose state is the full
    struct list just to take ``size()`` of it (guide §2.3: don't build
    agg state you throw away). count(*) over the same groups is a
    codegen HashAggregate with map-side partials, provably
    ``size(collect_list(...))`` row for row (both count the joined
    rows per right-row group; the inner join guarantees ≥ 1)."""
    j = interval_join(left, right, strategy=strategy, bin_width=bin_width)
    lcols = [c for c in j.columns if c.startswith("l_")]
    rcols = [c for c in j.columns if c.startswith("r_")]
    if matches == "count":
        return j.groupBy(*rcols).agg(
            F.count(F.lit(1)).alias("n_matches")
        )
    # group on ALL right columns (functionally dependent on the key):
    # one collect_list instead of a first() buffer per carried column —
    # halves the ObjectHashAggregate state
    return j.groupBy(*rcols).agg(
        F.collect_list(F.struct(*lcols)).alias("matches")
    )


def point_lookup_with_default(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    default,
    strategy: str = "broadcast",
) -> DataFrame:
    """J4: per point/interval row, find a covering interval in a small
    side table and take its value, else a default — the reference's
    CopyNumberMap.overlappingVariants driver-side scan
    (avocado-core/.../models/CopyNumberMap.scala:45-111) re-expressed as
    a broadcast left outer join + coalesce(default)."""
    iv = _prefixed(intervals, "iv_")
    cond = (
        (points["contig"] == iv["iv_contig"])
        & (points["start"] < iv["iv_end"])
        & (points["end"] > iv["iv_start"])
    )
    joined = points.join(F.broadcast(iv), cond, "left")
    return joined.select(
        *[points[c] for c in points.columns],
        F.coalesce(iv[f"iv_{value_col}"], F.lit(default)).alias(value_col),
    )
