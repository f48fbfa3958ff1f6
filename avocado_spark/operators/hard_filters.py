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
    """The reference's full configurable rule set with its CLI defaults
    (avocado-cli/.../BiallelicGenotyper.scala:117-201; builders
    HardFilterGenotypes.scala:259-343). A value <= 0 disables the rule,
    exactly as Option(arg).filter(_ > 0) does in the reference."""

    min_het_snp_qd: float = 2.0
    min_hom_snp_qd: float = 1.0
    min_het_indel_qd: float = 2.0
    min_hom_indel_qd: float = 1.0
    min_snp_mq: float = 30.0
    min_indel_mq: float = -1.0
    max_snp_fs: float = -1.0
    max_indel_fs: float = -1.0
    min_snp_depth: int = 10
    max_snp_depth: int = 200
    min_indel_depth: int = 10
    max_indel_depth: int = 200
    min_het_snp_af: float = 0.333
    max_het_snp_af: float = 0.666
    min_hom_snp_af: float = 0.666
    min_het_indel_af: float = 0.333
    max_het_indel_af: float = 0.666
    min_hom_indel_af: float = 0.666


def hard_filter_annotate(
    genotypes: DataFrame,
    rules: HardFilterRules = HardFilterRules(),
    fs_col: str | None = None,
) -> DataFrame:
    """F3 — hard filters ANNOTATE (filters_failed list), never drop
    (HardFilterGenotypes.scala:176-343,571-660). SNP vs indel split by
    allele lengths (:616-619); per class the reference's nine
    predicates with its message codes. Semantics ported exactly:

      * "hom" = all alleles ALT (gt_state 2); every het-branch rule
        applies to NON-hom calls (hom-ref/het/no-call), :393-412;
      * min-AF fails on af <= threshold (:517-534), max-AF on
        af > threshold and only for non-hom (:543-563);
      * QD = genotype_quality / read_depth, het/hom split (:393-412);
      * null inputs never fail a rule (Option.flatMap skip).

    ``fs_col`` names the Phred strand-bias column for the FS rules
    (disabled by default, as in the reference CLI)."""
    is_snp = (F.length("ref_allele") == 1) & (F.length("alt_allele") == 1)
    qd = F.col("genotype_quality") / F.col("read_depth")
    af = F.col("alt_read_depth") / F.col("read_depth")
    dp = F.col("read_depth")
    hom = F.col("gt_state") == 2

    def rule(enabled: float, cond, msg: str):
        if enabled is None or enabled <= 0:
            return None
        return F.when(cond, F.lit(msg))

    def klass(snp: bool):
        r = rules
        side = is_snp if snp else ~is_snp
        tag = "SNP" if snp else "INDEL"
        qd_het = r.min_het_snp_qd if snp else r.min_het_indel_qd
        qd_hom = r.min_hom_snp_qd if snp else r.min_hom_indel_qd
        mq = r.min_snp_mq if snp else r.min_indel_mq
        fs = r.max_snp_fs if snp else r.max_indel_fs
        min_dp = r.min_snp_depth if snp else r.min_indel_depth
        max_dp = r.max_snp_depth if snp else r.max_indel_depth
        af_het_min = r.min_het_snp_af if snp else r.min_het_indel_af
        af_het_max = r.max_het_snp_af if snp else r.max_het_indel_af
        af_hom_min = r.min_hom_snp_af if snp else r.min_hom_indel_af
        out = [
            rule(qd_het, side & ~hom & (qd < qd_het), f"HET{tag}QD"),
            rule(qd_hom, side & hom & (qd < qd_hom), f"HOM{tag}QD"),
            rule(mq, side & (F.col("rms_mapq") < mq), f"{tag}MQ"),
            rule(fs, side & (F.col(fs_col) > fs), f"{tag}FS") if fs_col else None,
            rule(float(min_dp), side & (dp < min_dp), f"{tag}MINDP"),
            rule(float(max_dp), side & (dp > max_dp), f"{tag}MAXDP"),
            rule(af_het_min, side & ~hom & (af <= af_het_min), f"HET{tag}MINAF"),
            rule(af_het_max, side & ~hom & (af > af_het_max), f"HET{tag}MAXAF"),
            rule(af_hom_min, side & hom & (af <= af_hom_min), f"HOM{tag}MINAF"),
        ]
        return [c for c in out if c is not None]

    checks = klass(True) + klass(False)
    failed = F.array_compact(F.array(*checks))
    return genotypes.withColumn("filters_failed", failed).withColumn(
        "filters_passed", F.size("filters_failed") == 0
    ).withColumn("filters_applied", F.lit(True))


def filter_header_lines(rules: HardFilterRules = HardFilterRules()) -> list[str]:
    """The VCF ##FILTER header lines for every ENABLED hard-filter rule
    (HardFilterGenotypes.scala:186-253) — one line per message code the
    annotate step can emit, so a VCF writer downstream can declare them."""
    def line(code: str, desc: str) -> str:
        return f'##FILTER=<ID={code},Description="{desc}">'

    r = rules
    specs = [
        (r.min_het_snp_qd, "HETSNPQD", f"Quality by depth was below {r.min_het_snp_qd} for a heterozygous SNP."),
        (r.min_hom_snp_qd, "HOMSNPQD", f"Quality by depth was below {r.min_hom_snp_qd} for a homozygous SNP."),
        (r.min_het_indel_qd, "HETINDELQD", f"Quality by depth was below {r.min_het_indel_qd} for a heterozygous INDEL."),
        (r.min_hom_indel_qd, "HOMINDELQD", f"Quality by depth was below {r.min_hom_indel_qd} for a homozygous INDEL."),
        (r.max_snp_fs, "SNPFS", f"Phred Fisher scored strand bias was above {r.max_snp_fs} for a SNP."),
        (r.max_indel_fs, "INDELFS", f"Phred Fisher scored strand bias was above {r.max_indel_fs} for a INDEL."),
        (r.min_snp_mq, "SNPMQ", f"RMS mapping quality was below {r.min_snp_mq} for a SNP."),
        (r.min_indel_mq, "INDELMQ", f"RMS mapping quality was below {r.min_indel_mq} for a INDEL."),
        (float(r.min_snp_depth), "SNPMINDP", f"Read depth was below {r.min_snp_depth} for a SNP."),
        (float(r.max_snp_depth), "SNPMAXDP", f"Read depth was above {r.max_snp_depth} for a SNP."),
        (float(r.min_indel_depth), "INDELMINDP", f"Read depth was below {r.min_indel_depth} for a INDEL."),
        (float(r.max_indel_depth), "INDELMAXDP", f"Read depth was above {r.max_indel_depth} for a INDEL."),
        (r.min_het_snp_af, "HETSNPMINAF", f"Allelic fraction was below {r.min_het_snp_af} for a het SNP."),
        (r.max_het_snp_af, "HETSNPMAXAF", f"Allelic fraction was above {r.max_het_snp_af} for a het SNP."),
        (r.min_hom_snp_af, "HOMSNPMINAF", f"Allelic fraction was below {r.min_hom_snp_af} for a hom SNP."),
        (r.min_het_indel_af, "HETINDELMINAF", f"Allelic fraction was below {r.min_het_indel_af} for a het INDEL."),
        (r.max_het_indel_af, "HETINDELMAXAF", f"Allelic fraction was above {r.max_het_indel_af} for a het INDEL."),
        (r.min_hom_indel_af, "HOMINDELMINAF", f"Allelic fraction was below {r.min_hom_indel_af} for a hom INDEL."),
    ]
    return [line(code, desc) for v, code, desc in specs if v is not None and v > 0]
