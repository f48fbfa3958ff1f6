"""Genotype post-filters (SURVEY §2.2 F2/F3/F4).

All pure column expressions — no UDFs, no shuffles; these layers are
free at 100 TB because they fuse into the upstream stage under
whole-stage codegen.

Genotype-table convention (FIXTURES.md §3 flattened): ``gt_state``
(0=hom-ref, 1=het, 2=hom-alt, 3=no-call), depths, ``genotype_quality``,
``rms_mapq``, ``ref_allele``/``alt_allele`` strings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rewrite_hets(genotypes: DataFrame, max_het_af: float = 0.666) -> DataFrame:
    """F4 — RewriteHets (avocado-core/.../util/RewriteHets.scala:64-140):
    a het call whose alt-allele fraction ≥ threshold is rewritten to
    hom-alt with quality nulled (the evidence contradicts the het)."""
    af = F.col("alt_read_depth") / F.col("read_depth")
    # materialize the decision BEFORE mutating gt_state — withColumn is
    # lazy, so a naive second reference would see the rewritten state
    flagged = genotypes.withColumn(
        "_rw", (F.col("gt_state") == 1) & (af >= F.lit(max_het_af))
    )
    return (
        flagged.withColumn(
            "gt_state", F.when(F.col("_rw"), F.lit(2)).otherwise(F.col("gt_state"))
        )
        .withColumn(
            "genotype_quality",
            F.when(F.col("_rw"), F.lit(None).cast("int")).otherwise(
                F.col("genotype_quality")
            ),
        )
        .drop("_rw")
    )


def emit_genotype_filter(
    genotypes: DataFrame, min_quality: int = 10, filter_ref_genotypes: bool = True
) -> DataFrame:
    """F2 — emission filter (HardFilterGenotypes.scala:349-383): drop
    hom-ref rows (unless gVCF emission) and low-GQ rows; a null quality
    (e.g. rewrite-hets output) is not evidence of low quality and is
    kept, matching the reference's Option.fold(true) semantics."""
    cond: Column = F.col("genotype_quality").isNull() | (
        F.col("genotype_quality") >= F.lit(min_quality)
    )
    if filter_ref_genotypes:
        cond = cond & F.col("gt_state").isin(1, 2)
    return genotypes.filter(cond)


@dataclass(frozen=True)
class HardFilterRules:
    """Defaults mirror the reference CLI defaults
    (avocado-cli/.../BiallelicGenotyper.scala hard-filter args;
    HardFilterGenotypes.scala:259-343)."""

    min_quality_by_depth: float = 2.0
    min_rms_mapq_snp: float = 30.0
    min_rms_mapq_indel: float = 20.0
    min_depth: int = 10
    max_depth: int = 200
    min_het_af: float = 0.2
    max_het_af: float = 0.8


def hard_filter_annotate(genotypes: DataFrame, rules: HardFilterRules = HardFilterRules()) -> DataFrame:
    """F3 — hard filters ANNOTATE (filters_failed list), never drop
    (HardFilterGenotypes.scala:176-343,571-660). SNP vs indel split by
    allele lengths (:616-619). Failure messages are stable codes so the
    output is deterministic and VCF-headerable."""
    is_snp = (F.length("ref_allele") == 1) & (F.length("alt_allele") == 1)
    qd = F.col("genotype_quality") / F.col("read_depth")
    af = F.col("alt_read_depth") / F.col("read_depth")
    het = F.col("gt_state") == 1

    checks = [
        F.when(qd < rules.min_quality_by_depth, F.lit("QD")),
        F.when(
            is_snp & (F.col("rms_mapq") < rules.min_rms_mapq_snp)
            | (~is_snp & (F.col("rms_mapq") < rules.min_rms_mapq_indel)),
            F.lit("MQ"),
        ),
        F.when(F.col("read_depth") < rules.min_depth, F.lit("MINDP")),
        F.when(F.col("read_depth") > rules.max_depth, F.lit("MAXDP")),
        F.when(het & (af < rules.min_het_af), F.lit("HETAFLO")),
        F.when(het & (af > rules.max_het_af), F.lit("HETAFHI")),
    ]
    failed = F.array_compact(F.array(*checks))
    return genotypes.withColumn("filters_failed", failed).withColumn(
        "filters_passed", F.size("filters_failed") == 0
    ).withColumn("filters_applied", F.lit(True))
