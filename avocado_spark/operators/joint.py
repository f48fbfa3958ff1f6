"""Joint annotation / recall over a cohort (SURVEY §2.3 E4, §2.5
A5-A7, §2.8 X11/X14).

Reference: avocado-core/.../genotyping/JointAnnotatorCaller.scala —
per site: variant-summary roll-up, minor-allele frequency, binomial
prior, posterior re-argmax, site quality. All of it is expressible as
one groupBy + a window-free second pass of column math: no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LOG10 = math.log(10.0)

SITE_KEYS = ["contig", "start", "ref_allele", "alt_allele"]


def variant_summary(genotypes: DataFrame) -> DataFrame:
    """A5 — per-site Option-aware sums of depth/strand counters
    (VariantSummary.scala:93-117): Spark's null-skipping sum has the
    exact Option.merge semantics."""
    return genotypes.groupBy(*SITE_KEYS).agg(
        F.sum("read_depth").cast("bigint").alias("total_read_depth"),
        F.sum("ref_read_depth").cast("bigint").alias("total_ref_depth"),
        F.sum("alt_read_depth").cast("bigint").alias("total_alt_depth"),
        F.sum("ref_fwd").cast("bigint").alias("ref_fwd"),
        F.sum("ref_rev").cast("bigint").alias("ref_rev"),
        F.sum("alt_fwd").cast("bigint").alias("alt_fwd"),
        F.sum("alt_rev").cast("bigint").alias("alt_rev"),
        F.count("*").alias("n_genotypes"),
    )


def _called_alleles(gt: Column) -> Column:
    # ploidy-2 calls: no-call (3) contributes nothing
    return F.when(gt.isin(0, 1, 2), F.lit(2)).otherwise(F.lit(0))


def _alt_alleles(gt: Column) -> Column:
    return F.when(gt == 1, 1).when(gt == 2, 2).otherwise(0)


def maf_and_quality(genotypes: DataFrame) -> DataFrame:
    """A6 + A7 — per-site minor-allele frequency
    (JointAnnotatorCaller.scala:117-128) and site quality
    −10/ln10 × Σ first-genotype-posterior (:270-281)."""
    gt = F.col("gt_state")
    return genotypes.groupBy(*SITE_KEYS).agg(
        F.sum(_called_alleles(gt)).cast("bigint").alias("called_alleles"),
        F.sum(_alt_alleles(gt)).cast("bigint").alias("alt_alleles"),
        F.sum("ll0").alias("sum_ll0"),
        F.count("*").alias("n_genotypes"),
    ).select(
        *SITE_KEYS,
        "called_alleles",
        "alt_alleles",
        (F.col("alt_alleles") / F.col("called_alleles")).alias("maf"),
        (F.lit(-10.0 / LOG10) * F.col("sum_ll0")).alias("site_quality"),
        "n_genotypes",
    )


def binom_log_pmf_ploidy2(k: Column, p: Column) -> Column:
    """X14 for m=2 — log C(2,k) + k log p + (2−k) log(1−p)
    (JointAnnotatorCaller.scala:162-176). C(2,k) expanded literally so
    the expression stays inside codegen."""
    log_comb = F.when(k == 1, F.lit(math.log(2.0))).otherwise(F.lit(0.0))
    return log_comb + k.cast("double") * F.log(p) + (F.lit(2) - k).cast("double") * F.log(
        F.lit(1.0) - p
    )


def joint_recall(genotypes: DataFrame, maf_floor: float = 0.05) -> DataFrame:
    """E4 — per site: drop MAF-0 sites, then re-call every genotype with
    a binomial(2, MAF) prior: posterior_g = ll_g + binomial_log_pmf(g),
    new state = argmax (JointAnnotatorCaller.scala:74-109,156-262).

    MAF is clamped away from {0,1} (the reference's prior is only
    applied to polymorphic sites; clamping keeps log() finite while
    preserving the argmax ordering at the extremes)."""
    site_w = Window.partitionBy(*SITE_KEYS)
    gt = F.col("gt_state")
    with_maf = genotypes.withColumn(
        "maf",
        F.sum(_alt_alleles(gt)).over(site_w) / F.sum(_called_alleles(gt)).over(site_w),
    ).filter(F.col("maf") > 0)
    p = F.least(F.greatest(F.col("maf"), F.lit(maf_floor)), F.lit(1.0 - maf_floor))
    posts = [
        (F.col(f"ll{g}") + binom_log_pmf_ploidy2(F.lit(g), p)).alias(f"post{g}")
        for g in range(3)
    ]
    scored = with_maf.select("*", *posts)
    p0, p1, p2 = F.col("post0"), F.col("post1"), F.col("post2")
    new_state = (
        F.when((p0 >= p1) & (p0 >= p2), 0).when((p1 >= p0) & (p1 >= p2), 1).otherwise(2)
    )
    return scored.withColumn("recalled_state", new_state.cast("int"))
