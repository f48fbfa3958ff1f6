"""Probabilistic sketches as first-class DataFrame operators.

Three families, all shuffle-bounded by the SKETCH size (not the data
size) — the property that makes them the right tool at 100 TB:

  * **Bloom filter** — a distributed build with NO driver collect: key
    → k hash bit-positions → word grouping → ``bit_or`` partial
    aggregation → one row holding a ``map<word, bits>``. The probe side
    cross-joins that single broadcast row and tests membership with
    pure JVM expressions, so pruning a 100-TB fact table is map-side
    work; only surviving rows reach the join shuffle. False positives
    are removed by the exact join that follows, so the operator's
    OUTPUT is exact (and therefore SQL-oracle-checkable) while the
    shuffle volume is bounded by the true-match rate + FP rate.
  * **Count-Min sketch** — the sketch IS a DataFrame of
    ``depth × width`` cells built with one partial-aggregated groupBy.
    Estimation joins candidate keys against the broadcast cell table
    and takes the row-wise MIN. Deterministic hash family → the DuckDB
    oracle replays the arithmetic exactly, cell for cell.
  * **HyperLogLog** — thin wrappers over Spark's native DataSketches
    functions (``hll_sketch_agg`` / ``hll_union_agg``): mergeable
    per-partition/per-day sketches, the canonical pre-aggregation for
    distinct-count rollups over append-only logs. Estimates are
    engine-specific, so correctness is expressed as an error-BOUND
    flag (the oracle asserts the flag, not the estimate).

Hash family for Bloom/CMS: ``h_i(key) = (((key % P) * (2i+3)) + (5i+7))
% P % m`` with P = 1e9+7 — the same replayable linear-congruential
family the MinHash module uses (operators/dedup.py), safe from 64-bit
overflow because the key is reduced mod P before the multiply.

Words pack 63 bits (not 64): masks are then ``pow(2, bit)`` for
bit ≤ 62, exact in double arithmetic and castable to BIGINT, which
keeps the whole membership test in built-in column expressions (the
SQL ``shiftleft`` needs a literal shift amount from PySpark).

The reference engine has no sketch surface (SURVEY §2 north-star tier);
the Bloom-pruned join is the explicit, composable form of Spark's
runtime bloom-filter join (spark.sql.optimizer.runtime.bloomFilter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
_WORD_BITS = 63


def _hash_i(key: Column, i: Column | int, modulus: int) -> Column:
    """Replayable LCG hash #i of a bigint key, in [0, modulus)."""
    i = F.lit(i) if isinstance(i, int) else i
    a = (2 * i + 3).cast("bigint")
    b = (5 * i + 7).cast("bigint")
    return F.pmod((F.pmod(key.cast("bigint"), F.lit(P)) * a + b) % F.lit(P), F.lit(modulus))


def _mask(bit: Column) -> Column:
    """2^bit as BIGINT for bit in [0, 62] — exact (powers of two are
    exact doubles well past 2^62)."""
    return F.pow(F.lit(2.0), bit.cast("double")).cast("bigint")


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_build(
    keys: DataFrame, key: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``keys[key]`` entirely in DataFrame
    land: returns a ONE-ROW DataFrame ``(bloom_words: map<int,bigint>)``.

    Plan shape: explode k positions per key (map-side) → groupBy word
    with ``bit_or`` (partial agg bounds the shuffle at
    ``num_bits/63 × partitions`` rows) → single-row
    ``map_from_entries`` fold. No driver collect at any size.
    """
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: _hash_i(F.col(key), i, num_bits),
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("int").alias("word"),
            _mask(F.pmod(F.col("pos"), F.lit(_WORD_BITS))).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom_words")
    )


def bloom_probe(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` MIGHT be in the filter.

    The single-row sketch rides a broadcast cross join (the same
    1-row-dim pattern as the TF-IDF corpus-size join, text.py), so the
    membership test is map-side whole-stage-codegen work — no shuffle
    touches the probe table. ``num_hashes`` is a small literal, so the
    k-way conjunction unrolls at plan-build time.
    """
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = _hash_i(F.col(key), i, num_bits)
        word = (pos / _WORD_BITS).cast("int")
        bit = F.pmod(pos, F.lit(_WORD_BITS))
        got = F.coalesce(
            F.element_at(F.col("bloom_words"), word), F.lit(0).cast("bigint")
        )
        cond = cond & (got.bitwiseAND(_mask(bit)) != 0)
    return df.crossJoin(F.broadcast(bloom)).where(cond).drop("bloom_words")


def bloom_pruned_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact inner equi-join with a Bloom-pruned shuffle: build the
    filter on ``small``'s keys, map-side-prune ``large`` before the
    join, then join exactly (the join removes Bloom false positives, so
    the result equals ``large ⋈ small`` row-for-row).

    100-TB story: when the build side is too big to broadcast-hash-join
    but its KEY SET fits a few MiB of Bloom bits, shuffle volume drops
    from |large| to |true matches ∪ false positives|.
    """
    bloom = bloom_build(small.select(key), key, num_bits, num_hashes)
    pruned = bloom_probe(large, key, bloom, num_bits, num_hashes)
    return pruned.join(small, on=key, how="inner")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, key: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-Min sketch of ``df[key]`` as a ``(d, w, cnt)`` DataFrame
    (≤ depth×width rows). One groupBy with map-side partial counts —
    shuffle volume is bounded by ``depth × width × num_partitions``
    regardless of input size, and two sketches merge by summing cells
    (union + re-groupBy), which is how incremental daily builds roll up.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    rows = df.select(F.col(key).alias("_k"), d)
    return (
        rows.select("d", _hash_i(F.col("_k"), F.col("d"), width).alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, cms: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-estimate counts for ``keys[key]``: each key probes its
    ``depth`` cells (broadcast join against the tiny cell table) and
    takes the MIN — the classic CMS upper-bound estimator. Missing
    cells count 0. Output: ``(key, cms_est)``.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probes = keys.select(F.col(key).alias(key), d).select(
        key, "d", _hash_i(F.col(key), F.col("d"), width).alias("w")
    )
    return (
        probes.join(F.broadcast(cms), on=["d", "w"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (native DataSketches)
# ---------------------------------------------------------------------------


def hll_group_cardinality(
    df: DataFrame,
    group: str,
    key: str,
    lg_k: int = 12,
    rel_err_bound: float = 0.05,
) -> DataFrame:
    """Per-group distinct-count estimate with a mergeable-sketches
    rollup: per-group ``hll_sketch_agg`` estimates, plus an ``__ALL__``
    row whose estimate comes from ``hll_union_agg`` over the per-group
    sketches (NOT a rescan) — the pre-aggregation pattern that lets a
    100-TB log keep daily sketches and answer any-range distinct
    queries by merging.

    Output: ``(group, exact_cnt, est_within_bound)`` — the estimate is
    engine-specific (DataSketches), so what's asserted (and what the
    SQL oracle replays) is the ERROR BOUND, not the estimate value.
    The exact side is computed with an ordinary count-distinct for the
    differential; at production scale you'd drop it and trust the bound.
    """
    sketches = df.groupBy(group).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sk"),
        F.count_distinct(key).alias("exact_cnt"),
    )
    per_group = sketches.select(
        F.col(group).cast("string").alias(group),
        "exact_cnt",
        F.hll_sketch_estimate("sk").alias("est"),
    )
    overall_exact = df.agg(F.count_distinct(key).alias("exact_cnt"))
    merged = (
        sketches.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(overall_exact))
        .select(
            F.lit("__ALL__").alias(group),
            "exact_cnt",
            F.hll_sketch_estimate("sk").alias("est"),
        )
    )
    both = per_group.unionByName(merged)
    return both.select(
        group,
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        (
            F.abs(F.col("est") - F.col("exact_cnt"))
            <= F.lit(rel_err_bound) * F.col("exact_cnt")
        ).alias("est_within_bound"),
    )


def cms_join_size_estimate(
    a: DataFrame, b: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches: for
    each depth row, the cell-wise inner product Σ_w cnt_a·cnt_b
    overestimates |a ⋈ b|; the MIN over depths is the classic CMS
    inner-product estimator. Returns one row ``(cms_est)``.

    This is sketch algebra for query planning: both sketches are
    bounded-shuffle artifacts (possibly maintained incrementally), so a
    planner can price a 100-TB join — pick broadcast vs shuffle vs
    skew-salt — from two depth×width cell tables without touching the
    data. The estimate is an upper bound; hash collisions only inflate
    it (asserted in tests)."""
    ca = cms_build(a, key, depth, width).withColumnRenamed("cnt", "cnt_a")
    cb = cms_build(b, key, depth, width).withColumnRenamed("cnt", "cnt_b")
    per_depth = (
        ca.join(cb, ["d", "w"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_depth.agg(F.min("ip").cast("bigint").alias("cms_est"))

# ---------------------------------------------------------------------------
# K-minimum-values (KMV) distinct sketch + set algebra
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, group: str, key: str, k: int = 64) -> DataFrame:
    """Per-group KMV distinct sketch: the ``k`` smallest replayable
    hash values of the group's DISTINCT keys (Beyer et al., SIGMOD'07
    "On synopses for distinct-value estimation under multiset
    operations"). One row per retained hash: ``(group, hv, r)``.

    Scale shape: distinct → ONE rank window partitioned by the group —
    never an unbounded ``collect_list``; every group's state is pruned
    to k rows in the same shuffle that builds it, so a 100-TB log
    yields |groups| × k rows of sketch. Mergeable: the union sketch of
    two groups is the k smallest of their concatenated sketch rows —
    the property the pairwise-overlap estimator below exploits without
    rescanning the data. The LCG hash is shared with the CMS/Bloom
    family, so a SQL oracle replays the sketch (and therefore the
    ESTIMATES) value-for-value."""
    from pyspark.sql import Window

    # KMV needs a UNIFORM spread over [0, P): the shared small-multiplier
    # LCG family maps small keys to small hashes (fine for CMS cells,
    # fatal for an order-statistic estimator), so use the Knuth
    # multiplicative constant
    hv = (
        F.pmod(F.col(key).cast("bigint"), F.lit(P)) * F.lit(2654435761) + 12345
    ) % F.lit(P)
    hashed = df.select(F.col(group), hv.alias("hv")).distinct()
    w = Window.partitionBy(group).orderBy("hv")
    return (
        hashed.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    )


def kmv_pairwise_overlap(
    df: DataFrame, group: str, key: str, k: int = 64
) -> DataFrame:
    """Audience-overlap estimates for every unordered pair of groups,
    from per-group KMV sketches only (the data is scanned once to
    build sketches; all set algebra runs on |groups| × k rows):

      est_union     — (k−1)·P / kth-smallest of the merged sketch
                      (exact count when the union has < k hashes)
      est_overlap   — |L|/k′ · est_union with L = merged-sketch values
                      present in BOTH sides (the KMV ∩ estimator)
      jaccard_est   — |L| / k′

    Returns one row per (ta < tb) pair. At 100 TB the pair table is
    |groups|², driver-known and tiny; the sketches are the only thing
    shuffled. All arithmetic is integer/round-deterministic so the
    estimates replay exactly in the SQL oracle."""
    from pyspark.sql import Window

    sk = kmv_sketch(df, group, key, k)
    types = sk.select(F.col(group).alias("t")).distinct()
    pairs = (
        types.select(F.col("t").alias("ta"))
        .join(types.select(F.col("t").alias("tb")), F.col("ta") < F.col("tb"))
    )
    # equi-joinable pair membership (avoids an OR-condition NLJ)
    pm = pairs.select(F.col("ta").alias("t"), "ta", "tb").unionByName(
        pairs.select(F.col("tb").alias("t"), "ta", "tb")
    )
    cand = F.broadcast(pm).join(sk.withColumnRenamed(group, "t"), "t").select(
        "ta", "tb", "t", "hv"
    )
    u = cand.select("ta", "tb", "hv").distinct()
    wu = Window.partitionBy("ta", "tb").orderBy("hv")
    uk = u.withColumn("r", F.row_number().over(wu)).where(F.col("r") <= k)
    tau = uk.groupBy("ta", "tb").agg(
        F.max("hv").alias("tau"), F.count(F.lit(1)).alias("ku")
    )
    both = (
        cand.groupBy("ta", "tb", "hv")
        .agg(F.count_distinct("t").alias("nt"))
        .where(F.col("nt") == 2)
        .select("ta", "tb", "hv")
    )
    n_both = (
        uk.join(both, ["ta", "tb", "hv"], "left_semi")
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    est_union = F.when(
        F.col("ku") >= k,
        F.round(
            (F.col("ku").cast("double") - 1) * P / F.col("tau").cast("double"), 0
        ).cast("bigint"),
    ).otherwise(F.col("ku").cast("bigint"))
    out = (
        tau.join(n_both, ["ta", "tb"], "left")
        .withColumn("n_both", F.coalesce("n_both", F.lit(0)))
        .withColumn("est_union", est_union)
    )
    return out.select(
        "ta",
        "tb",
        F.col("est_union").cast("bigint").alias("est_union"),
        F.round(F.col("n_both").cast("double") / F.col("ku"), 6).alias("jaccard_est"),
        F.round(
            F.col("n_both").cast("double") * F.col("est_union") / F.col("ku"), 0
        )
        .cast("bigint")
        .alias("est_overlap"),
    )


def log2_bin_expr(value_col: str) -> Column:
    """Guarded bit-length bin id for the log2-histogram sketch:
    CAST(length(bin(v)) AS INT) for v >= 0, raise_error for negative v.
    Without the guard a negative value silently diverges across
    engines — Spark's shiftleft(1, 64) wraps the 64-bit bin edge to 1
    while DuckDB's (1::BIGINT << 64) raises Out of Range — so bad
    input must fail loudly and identically instead."""
    return F.expr(
        f"CASE WHEN {value_col} >= 0 "
        f"THEN CAST(length(bin({value_col})) AS INT) "
        f"ELSE CAST(raise_error('log2 histogram sketch requires "
        f"non-negative values, got ' || CAST({value_col} AS STRING)) "
        f"AS INT) END"
    )


def log2_hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Mergeable log2-histogram quantile sketch (the HDR-histogram /
    DDSketch idea with power-of-two buckets, γ = 2): positive integer
    values collapse into their BIT-LENGTH bin — computed as
    ``length(bin(v))``, an exact integer in both engines, never a
    floating log whose last-ulp rounding could differ — so per-group
    state is ≤ 64 exact counters: associatively mergeable across
    partitions, days, or streams, with quantile estimates carrying a
    bounded 2× relative error (the bin upper edge 2^b−1 is reported).

    This is the deterministic, oracle-checkable member of the sketch
    family (Bloom/CMS/HLL/KMV live above); Spark's built-in
    ``percentile_approx`` covers the generic approximate path but is
    not engine-portable bit-for-bit (tests/test_approx_quantiles.py
    bounds it instead).

    Output: group_cols + (n, est_p{q}_c per requested integer
    percentile). ONE hash agg over the data; the cumulative pass runs
    on ≤ 64 rows per group. Requires ``value_col`` >= 0 — ENFORCED: a
    negative value raises at execution instead of silently wrapping
    (bin(-x) is 64 bits long, and shiftleft(1, 64) wraps to 1 in Spark
    while DuckDB's 1 << 64 errors — a silent cross-engine divergence
    if allowed through). Zero is fine: it shares bin 1 with value 1,
    and the reported upper edge 1 still bounds it.
    """
    from pyspark.sql import Window as W  # noqa: N814

    b = df.groupBy(
        *group_cols,
        log2_bin_expr(value_col).alias("_lh_bin"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_lh_c"))
    wcum = (
        W.partitionBy(*group_cols)
        .orderBy("_lh_bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy(*group_cols)
    cum = b.select(
        *group_cols,
        "_lh_bin",
        F.sum("_lh_c").over(wcum).alias("_lh_cum"),
        F.sum("_lh_c").over(wn).alias("_lh_n"),
    )
    ub = F.expr("shiftleft(CAST(1 AS BIGINT), _lh_bin) - 1")
    aggs = [F.max("_lh_n").cast("bigint").alias("n")]
    for q in quantiles:
        aggs.append(
            F.min(F.when(100 * F.col("_lh_cum") >= q * F.col("_lh_n"), ub))
            .cast("bigint")
            .alias(f"est_p{q}_c")
        )
    return cum.groupBy(*group_cols).agg(*aggs)
