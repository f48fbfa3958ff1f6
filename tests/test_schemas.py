"""Schema-contract tests: the nested Genotype shape (SURVEY §1.1) and
the flat→nested re-nesting path (X2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark import tables
from avocado_spark.schemas import (
    GENOTYPE_SCHEMA,
    READ_SCHEMA,
    alleles_for_state,
    nest_genotype,
)
from tests.conftest import SF_SMOKE


def test_genotype_schema_shape():
    names = [f.name for f in GENOTYPE_SCHEMA.fields]
    assert "variant" in names and "alleles" in names
    variant = GENOTYPE_SCHEMA["variant"].dataType
    assert [f.name for f in variant.fields] == [
        "contig",
        "start",
        "end",
        "ref_allele",
        "alt_allele",
    ]
    # gVCF symbolic non-ref: alt is the only nullable allele field
    assert variant["alt_allele"].nullable
    assert not variant["ref_allele"].nullable
    assert not READ_SCHEMA["sequence"].nullable


def test_alleles_for_state_mapping(spark):
    df = spark.range(4).select(alleles_for_state(F.col("id")).alias("a"))
    assert [tuple(r["a"]) for r in df.collect()] == [
        ("REF", "REF"),
        ("REF", "ALT"),
        ("ALT", "ALT"),
        ("NO_CALL", "NO_CALL"),
    ]


def test_nest_genotype_structure(spark):
    calls = tables.derived(spark, SF_SMOKE, "calls_rel")
    nested = calls.select(nest_genotype(calls).alias("g"), "gt_state")
    for r in nested.limit(100).collect():
        g = r["g"]
        assert g["variant"]["contig"].startswith("chr")
        assert len(g["genotype_likelihoods"]) == 3
        assert len(g["strand_bias_components"]) == 4
        want = {
            0: ("REF", "REF"),
            1: ("REF", "ALT"),
            2: ("ALT", "ALT"),
            3: ("NO_CALL", "NO_CALL"),
        }[r["gt_state"]]
        assert tuple(g["alleles"]) == want
