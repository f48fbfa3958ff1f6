"""Unit tests for the cohort square-off (SquareOffReferenceModel
semantics, SURVEY §2.4 J5): exact-match pick vs reference-model
likelihood excision."""

from __future__ import annotations


def _geno(contig, start, end, ref, alt, sample, gt, lls, nr_lls):
    return (contig, start, end, ref, alt, sample, gt, *lls, *nr_lls)


GENO_SCHEMA = (
    "contig string, start long, end long, ref_allele string, alt_allele string, "
    "sample_id string, gt_state int, ll0 double, ll1 double, ll2 double, "
    "nr_ll0 double, nr_ll1 double, nr_ll2 double"
)


def test_square_off_pick_and_excise(spark):
    from avocado_spark.operators.squareoff import square_off

    genotypes = spark.createDataFrame(
        [
            # s0: exact scored call at the variant
            _geno("1", 100, 101, "A", "G", "s0", 2, [-9.0, -4.0, -0.1], [-1.0, -2.0, -3.0]),
            # s1: only an overlapping reference-model block (alt null)
            _geno("1", 95, 120, "A", None, "s1", 0, [-0.1, -5.0, -9.0], [-0.2, -6.0, -8.0]),
        ],
        GENO_SCHEMA,
    )
    variants = spark.createDataFrame(
        [("1", 100, 101, "A", "G")],
        "contig string, start long, end long, ref_allele string, alt_allele string",
    )
    out = {r["sample_id"]: r for r in square_off(variants, genotypes).collect()}
    assert set(out) == {"s0", "s1"}
    # s0 keeps its scored genotype + likelihoods
    assert out["s0"]["had_exact"] and out["s0"]["gt_state"] == 2
    assert out["s0"]["ll2"] == -0.1
    # s1 gets the EXCISED non-reference likelihoods, hom-ref state
    assert not out["s1"]["had_exact"] and out["s1"]["gt_state"] == 0
    assert (out["s1"]["ll0"], out["s1"]["ll1"], out["s1"]["ll2"]) == (-0.2, -6.0, -8.0)


def test_extract_variants_trims_and_dedups(spark):
    from avocado_spark.operators.squareoff import extract_variants

    genotypes = spark.createDataFrame(
        [
            _geno("1", 10, 13, "TAC", "TC", "s0", 1, [-1.0] * 3, [-1.0] * 3),
            _geno("1", 10, 13, "TAC", "TC", "s1", 2, [-1.0] * 3, [-1.0] * 3),
            # hom-ref and null-alt rows must be excluded
            _geno("1", 20, 21, "A", "G", "s0", 0, [-1.0] * 3, [-1.0] * 3),
            _geno("1", 30, 50, "A", None, "s0", 1, [-1.0] * 3, [-1.0] * 3),
        ],
        GENO_SCHEMA,
    )
    rows = extract_variants(genotypes).collect()
    assert len(rows) == 1
    r = rows[0]
    # TAC->TC shares suffix 'C': canonicalized to TA->T, end shrinks by 1
    assert (r["ref_allele"], r["alt_allele"], r["start"], r["end"]) == ("TA", "T", 10, 12)
