"""The genomic data model as Spark StructTypes (SURVEY §1.1/§1.4).

The reference's Avro record classes (AlignmentRecord, Variant,
Genotype, … from bdg-formats) map to nested StructTypes: Option[T] →
nullable fields, GenotypeAllele enum arrays → array<string> over the
domain {REF, ALT, OTHER_ALT, NO_CALL}, likelihood vectors →
array<double>, genomic coordinates 0-based half-open longs
(DiscoveredVariant.scala:83,102-108).

These are the CONTRACT schemas for external data; the operator modules
mostly work on the flattened derivations in tables.py (flat columns
aggregate faster and re-nest at the edge — the modern form of the
reference's own flatten-before-aggregate pattern, SURVEY §1.3/P4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GENOTYPE_ALLELES = ("REF", "ALT", "OTHER_ALT", "NO_CALL")


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# AlignmentRecord fields consumed by the reference
# (Observer.scala:55-60, PrefilterReads.scala:99-116)
READ_SCHEMA = StructType(
    [
        _f("read_name", StringType(), False),
        _f("contig", StringType()),
        _f("start", LongType()),
        _f("end", LongType()),
        _f("sequence", StringType(), False),
        _f("qual", StringType()),
        _f("cigar", StringType()),
        _f("md", StringType()),
        _f("mapq", IntegerType()),
        _f("read_mapped", BooleanType(), False),
        _f("primary_alignment", BooleanType()),
        _f("duplicate_read", BooleanType()),
        _f("forward_strand", BooleanType()),
        _f("read_paired", BooleanType()),
        _f("mate_mapped", BooleanType()),
        _f("mate_contig", StringType()),
        _f("mate_start", LongType()),
        _f("sample_id", StringType()),
    ]
)

# Variant / DiscoveredVariant (DiscoveredVariant.scala:72-108);
# alt_allele NULL models the gVCF symbolic non-ref allele (:81)
VARIANT_SCHEMA = StructType(
    [
        _f("contig", StringType(), False),
        _f("start", LongType(), False),
        _f("end", LongType(), False),
        _f("ref_allele", StringType(), False),
        _f("alt_allele", StringType()),
    ]
)

# VariantCallingAnnotations (BiallelicGenotyper.scala:708-711,
# HardFilterGenotypes.scala:596-613)
ANNOTATIONS_SCHEMA = StructType(
    [
        _f("rms_mapq", DoubleType()),
        _f("fisher_strand_bias_p", DoubleType()),
        _f("filters_applied", BooleanType()),
        _f("filters_passed", BooleanType()),
        _f("filters_failed", ArrayType(StringType())),
    ]
)

# Genotype (BiallelicGenotyper.scala:731-747): nested variant +
# annotations, enum-domain allele array, log-likelihood vectors
GENOTYPE_SCHEMA = StructType(
    [
        _f("variant", VARIANT_SCHEMA, False),
        _f("sample_id", StringType(), False),
        _f("alleles", ArrayType(StringType()), False),
        _f("genotype_likelihoods", ArrayType(DoubleType())),
        _f("non_reference_likelihoods", ArrayType(DoubleType())),
        _f("read_depth", IntegerType()),
        _f("reference_read_depth", IntegerType()),
        _f("alternate_read_depth", IntegerType()),
        _f("strand_bias_components", ArrayType(IntegerType())),
        _f("genotype_quality", IntegerType()),
        _f("phased", BooleanType()),
        _f("annotations", ANNOTATIONS_SCHEMA),
    ]
)

# Feature (CNV side input, CopyNumberMap.scala:45-64)
FEATURE_SCHEMA = StructType(
    [
        _f("contig", StringType(), False),
        _f("start", LongType(), False),
        _f("end", LongType(), False),
        _f("feature_type", StringType()),  # "DUP" / "DEL"
        _f("source", StringType()),
    ]
)


def alleles_for_state(gt_state: Column) -> Column:
    """gt_state (0/1/2/3) → the reference's GenotypeAllele array
    (ploidy 2): hom-ref [REF,REF], het [REF,ALT], hom-alt [ALT,ALT],
    no-call [NO_CALL,NO_CALL]."""
    return (
        F.when(gt_state == 0, F.array(F.lit("REF"), F.lit("REF")))
        .when(gt_state == 1, F.array(F.lit("REF"), F.lit("ALT")))
        .when(gt_state == 2, F.array(F.lit("ALT"), F.lit("ALT")))
        .otherwise(F.array(F.lit("NO_CALL"), F.lit("NO_CALL")))
    )


def nest_genotype(flat) -> Column:
    """X2 — re-nest a flat genotype row into the reference's nested
    Genotype shape (struct()/array() re-nesting,
    BiallelicGenotyper.scala:503-547). `flat` is a DataFrame whose
    columns follow the genotype-table convention (tables.py)."""
    return F.struct(
        F.struct(
            F.col("contig"),
            F.col("start"),
            F.col("end"),
            F.col("ref_allele"),
            F.col("alt_allele"),
        ).alias("variant"),
        F.col("sample_id"),
        alleles_for_state(F.col("gt_state")).alias("alleles"),
        F.array("ll0", "ll1", "ll2").alias("genotype_likelihoods"),
        F.col("read_depth"),
        F.col("ref_read_depth").alias("reference_read_depth"),
        F.col("alt_read_depth").alias("alternate_read_depth"),
        F.array("ref_fwd", "ref_rev", "alt_fwd", "alt_rev").alias(
            "strand_bias_components"
        ),
        F.col("genotype_quality"),
    )
