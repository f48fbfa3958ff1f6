"""Cohort square-off: allele canonicalization + gVCF reference-model
excision (SURVEY §2.8 X8/X9, §2.4 J3/J5).

Reference: avocado-core/.../genotyping/SquareOffReferenceModel.scala —
extractVariants (filter ALT-carrying rows, project variant, suffix-trim
ref/alt, dedup), then shuffle interval join against per-sample gVCF
blocks and per-(site, sample) pick-or-excise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from avocado_spark.operators.interval_join import interval_join


def trim_suffix_len(ref: Column, alt: Column) -> Column:
    """X8 — number of shared trailing characters, stopping before either
    allele empties (SquareOffReferenceModel.scala:106-127). Pure
    higher-order-function expression: zip the reversed char arrays and
    count the leading run of equal pairs (no UDF)."""
    pairs = F.zip_with(
        F.reverse(F.split(ref, "")),
        F.reverse(F.split(alt, "")),
        lambda a, b: a.eqNullSafe(b),
    )
    run = F.aggregate(
        pairs,
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
        lambda acc, eq: F.struct(
            F.when(~acc["stop"] & eq, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            (acc["stop"] | ~eq).alias("stop"),
        ),
        lambda acc: acc["n"],
    )
    return F.least(run, F.length(ref) - 1, F.length(alt) - 1)


def trim_alleles(df: DataFrame) -> DataFrame:
    """X8 applied — canonicalize (ref, alt, end): drop the shared
    suffix, shrink end accordingly (SquareOffReferenceModel.scala:155-162)."""
    k = trim_suffix_len(F.col("ref_allele"), F.col("alt_allele"))
    return (
        df.withColumn("_trim", k)
        .withColumn("ref_allele", F.expr("substring(ref_allele, 1, length(ref_allele) - _trim)"))
        .withColumn("alt_allele", F.expr("substring(alt_allele, 1, length(alt_allele) - _trim)"))
        .withColumn("end", F.col("end") - F.col("_trim"))
        .drop("_trim")
    )


def extract_variants(genotypes: DataFrame) -> DataFrame:
    """X9 + A4 — distinct ALT-carrying variant sites from a cohort of
    genotypes (SquareOffReferenceModel.scala:139-169): filter
    array-contains-ALT (gt_state ∈ {1,2}), alt non-null, trim, dedup."""
    v = (
        genotypes.filter(F.col("gt_state").isin(1, 2) & F.col("alt_allele").isNotNull())
        .select("contig", "start", "end", "ref_allele", "alt_allele")
    )
    return trim_alleles(v).dropDuplicates(
        ["contig", "start", "end", "ref_allele", "alt_allele"]
    )


def square_off(variants: DataFrame, genotypes: DataFrame, strategy: str = "binned") -> DataFrame:
    """J3 + J5 — for every (variant, sample): the exact-match scored
    genotype if the sample has one, else the likelihoods EXCISED from
    the overlapping gVCF reference-model block (nonReferenceLikelihoods
    → genotypeLikelihoods re-keyed to the variant)
    (SquareOffReferenceModel.scala:87-94,182-245).

    Both sides are large ⇒ binned shuffle interval join (the reference
    uses ADAM's shuffle region join here for the same reason), then a
    per-(variant, sample) max_by over match rank — no second shuffle
    beyond the join's own partitioning."""
    g = genotypes.select(
        "contig",
        "start",
        "end",
        "ref_allele",
        "alt_allele",
        "sample_id",
        "gt_state",
        "ll0",
        "ll1",
        "ll2",
        "nr_ll0",
        "nr_ll1",
        "nr_ll2",
    )
    j = interval_join(variants, g, strategy=strategy)
    exact = (
        (F.col("l_start") == F.col("r_start"))
        & (F.col("l_ref_allele") == F.col("r_ref_allele"))
        & F.col("r_alt_allele").isNotNull()
        & (F.col("l_alt_allele") == F.col("r_alt_allele"))
    )
    scored = j.select(
        F.col("l_contig").alias("contig"),
        F.col("l_start").alias("start"),
        F.col("l_end").alias("end"),
        F.col("l_ref_allele").alias("ref_allele"),
        F.col("l_alt_allele").alias("alt_allele"),
        F.col("r_sample_id").alias("sample_id"),
        exact.alias("exact"),
        F.when(exact, F.col("r_gt_state")).otherwise(F.lit(0)).alias("gt_state"),
        *[
            F.when(exact, F.col(f"r_ll{g_}")).otherwise(F.col(f"r_nr_ll{g_}")).alias(f"ll{g_}")
            for g_ in range(3)
        ],
    )
    # per (site, sample): prefer the exact match; deterministic tiebreak
    return (
        scored.groupBy("contig", "start", "end", "ref_allele", "alt_allele", "sample_id")
        .agg(
            F.max_by(
                F.struct("gt_state", "ll0", "ll1", "ll2"),
                F.struct(F.col("exact").cast("int").alias("rank"), F.col("ll0").alias("tie")),
            ).alias("pick"),
            F.max(F.col("exact").cast("int")).cast("boolean").alias("had_exact"),
        )
        .select(
            "contig",
            "start",
            "end",
            "ref_allele",
            "alt_allele",
            "sample_id",
            F.col("pick.gt_state").alias("gt_state"),
            F.col("pick.ll0").alias("ll0"),
            F.col("pick.ll1").alias("ll1"),
            F.col("pick.ll2").alias("ll2"),
            "had_exact",
        )
    )
