"""Golden unit tests for the alignment-algebra kernel — mirrors the
reference's pure-function tier (DiscoverVariantsSuite.scala:136-264,
ObservationOperator parse tests)."""

from __future__ import annotations

import math

import pytest

from avocado_spark.functions.alignment import (
    parse_cigar,
    parse_md,
    read_base_at,
    variants_in_read,
    walk_alignment,
)

Q30 = chr(33 + 30)


def test_parse_cigar():
    assert parse_cigar("40M3D35M") == [(40, "M"), (3, "D"), (35, "M")]
    assert parse_cigar("91M10S") == [(91, "M"), (10, "S")]
    assert parse_cigar("*") == []


def test_parse_md():
    assert parse_md("15") == [("match", "15")]
    assert parse_md("6C8") == [("match", "6"), ("mismatch", "C"), ("match", "8")]
    assert parse_md("12^GCA88") == [("match", "12"), ("del", "GCA"), ("match", "88")]
    assert parse_md("0A14") == [("mismatch", "A"), ("match", "14")]


def test_snp_discovery():
    # SNP: ref C at offset 6 read as G (DiscoverVariantsSuite-style)
    seq = "AAAAAA" + "G" + "AAAAAAAA"
    v = variants_in_read("1", 100, seq, Q30 * 15, "15M", "6C8", phred_threshold=18)
    assert v == [("1", 106, 107, "C", "G")]


def test_snp_below_threshold_dropped():
    seq = "AAAAAA" + "G" + "AAAAAAAA"
    lowq = Q30 * 6 + chr(33 + 5) + Q30 * 8
    assert variants_in_read("1", 100, seq, lowq, "15M", "6C8", 18) == []


def test_deletion_discovery():
    # 10M3D5M with MD 10^GCA5: anchor at offset 9, ref AGCA->A
    seq = "A" * 15
    v = variants_in_read("1", 100, seq, Q30 * 15, "10M3D5M", "10^GCA5", 18)
    assert v == [("1", 109, 113, "AGCA", "A")]


def test_insertion_discovery():
    # 5M2I8M: inserted read bases at offsets 5,6; anchor offset 4
    seq = "AAAAA" + "TT" + "AAAAAAAA"
    v = variants_in_read("1", 100, seq, Q30 * 15, "5M2I8M", "13", 18)
    assert v == [("1", 104, 105, "A", "ATT")]


def test_mnp_split_into_snps():
    # adjacent mismatches split per-base (DiscoverVariants.scala MNP rule)
    seq = "AAAA" + "GT" + "AAAA"
    v = variants_in_read("1", 100, seq, Q30 * 10, "10M", "4CA4", 18)
    assert v == [("1", 104, 105, "C", "G"), ("1", 105, 106, "A", "T")]


def test_soft_clip_consumes_read_not_ref():
    seq = "TTT" + "AAAAAA" + "G" + "AA"
    v = variants_in_read("1", 100, seq, Q30 * 12, "3S9M", "6C2", 18)
    assert v == [("1", 106, 107, "C", "G")]


def test_inconsistent_md_raises():
    with pytest.raises(ValueError):
        walk_alignment("10M", "5^GCA5", "A" * 10)


def test_read_base_at():
    seq = "AAAAAA" + "G" + "AAAAAAAA"
    assert read_base_at(100, seq, Q30 * 15, "15M", "6C8", 106) == ("G", 30)
    assert read_base_at(100, seq, Q30 * 15, "15M", "6C8", 100) == ("A", 30)
    assert read_base_at(100, seq, Q30 * 15, "15M", "6C8", 99) is None
    # position inside a deletion -> None
    assert read_base_at(100, "A" * 15, Q30 * 15, "10M3D5M", "10^GCA5", 111) is None
    # position after the deletion maps past it
    assert read_base_at(100, "A" * 15, Q30 * 15, "10M3D5M", "10^GCA5", 113) == ("A", 30)


def test_genotype_likelihood_analytic(spark):
    """End-to-end: hom-alt site with 6 alt reads — likelihoods match the
    analytic oracle L(g) = Σ log((m−g)ε + g(1−ε)) − log m
    (BiallelicGenotyperSuite.scala:167-178 style)."""
    from avocado_spark.operators.genotyping import genotype_sites

    q, mapq = 30, 40
    rows = [("1", 106, 107, "C", "G", "s0", q, mapq, True) for _ in range(6)]
    obs = spark.createDataFrame(
        rows,
        "contig string, site_start long, site_end long, ref_allele string, "
        "alt_allele string, sample_id string, qual int, mapq int, is_alt boolean",
    )
    out = genotype_sites(spark, obs).collect()
    assert len(out) == 1
    g = out[0]
    eps = 1 - (1 - 10 ** (-q / 10)) * (1 - 10 ** (-mapq / 10))
    expected = [
        6 * (math.log((2 - k) * eps + k * (1 - eps)) - math.log(2)) for k in range(3)
    ]
    got = [g["ll0"], g["ll1"], g["ll2"]]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, expected))
    assert g["gt_state"] == 2  # hom alt
    assert g["alt_read_depth"] == 6 and g["ref_read_depth"] == 0
    exp_gq = 10 / math.log(10) * (expected[2] - expected[1])
    assert abs(g["gq"] - exp_gq) < 1e-6
    assert abs(g["rms_mapq"] - mapq) < 1e-9


def test_het_site(spark):
    from avocado_spark.operators.genotyping import genotype_sites

    rows = [("1", 10, 11, "A", "G", "s0", 30, 40, i % 2 == 0) for i in range(8)]
    obs = spark.createDataFrame(
        rows,
        "contig string, site_start long, site_end long, ref_allele string, "
        "alt_allele string, sample_id string, qual int, mapq int, is_alt boolean",
    )
    g = genotype_sites(spark, obs).collect()[0]
    assert g["gt_state"] == 1
    assert g["read_depth"] == 8


def test_site_events_keep_pushdown():
    from avocado_spark.functions.alignment import site_events

    # 10M2I3M1D5M starting at 100: ins anchored at 109, del anchored at
    # 112 spanning 113
    seq = "AAAAAAAAAAGGTTTCCCCC"
    qual = Q30 * len(seq)
    cigar, md = "10M2I3M1D5M", "13^A5"
    full, end_full = site_events(100, seq, qual, cigar, md)
    for keep in [frozenset({105, 109, 112}), frozenset(), frozenset({999})]:
        kept, end = site_events(100, seq, qual, cigar, md, keep=keep)
        assert end == end_full
        # kept rows identical to the full emission at those positions,
        # minus deletion-span rows (gVCF-only evidence)
        expect = [r for r in full if r[0] in keep and r[1] is not None]
        assert kept == expect
    # ins/del anchor info survives when the anchor is kept
    anch = {r[0]: r for r in site_events(100, seq, qual, cigar, md,
                                         keep=frozenset({109, 112}))[0]}
    assert anch[109][5] == "GG" and anch[109][6] == 30
    assert anch[112][7] == 1
