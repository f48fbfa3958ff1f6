"""Unit tests for the realignment kernel — mirrors the reference's
AlignerSuite / RealignmentBlockSuite / RealignerSuite coverage
(pure-function tier; the oracle-parity test covers the Spark tier)."""

from __future__ import annotations

from avocado_spark.functions.realign import (
    align,
    align_segment,
    collapse,
    extract_reference,
    make_cigar_md,
    ops_from_cigar_md,
    realign_read,
    segment_read,
    to_kmers,
    zip_and_trim,
)


def test_codec_roundtrip_snp_and_del():
    seq = "A" * 10 + "G" + "A" * 9
    ops = ops_from_cigar_md("20M", "10C9", seq)
    assert ops == [("=", 10, None), ("X", 1, "C"), ("=", 9, None)]
    assert make_cigar_md(ops) == ("10=1X9=", "10C9")

    ops2 = ops_from_cigar_md("10M3D10M", "10^GCA10", "A" * 20)
    assert ops2 == [("=", 10, None), ("D", 3, "GCA"), ("=", 10, None)]
    assert make_cigar_md(ops2) == ("10=3D10=", "10^GCA10")


def test_codec_clips_and_insertion():
    seq = "T" * 5 + "A" * 10 + "GG" + "A" * 8
    ops = ops_from_cigar_md("5S10M2I8M", "18", seq)
    assert ops[0] == ("S", 5, None)
    assert ("I", 2, None) in ops
    cigar, md = make_cigar_md(ops)
    assert cigar == "5S10=2I8="
    assert md == "18"


def test_collapse_merges_mismatch_runs():
    ops = [("X", 1, "A"), ("X", 1, "C"), ("=", 3, None), ("=", 2, None), ("=", 0, None)]
    assert collapse(ops) == [("X", 2, "AC"), ("=", 5, None)]


def test_extract_reference():
    # read AAAA GG TTTT with 2-base insertion: ref is AAAA TTTT
    ops = [("=", 4, None), ("I", 2, None), ("=", 4, None)]
    assert extract_reference("AAAAGGTTTT", ops) == "AAAATTTT"
    # deletion adds ref bases back
    ops = [("=", 4, None), ("D", 2, "CC"), ("=", 4, None)]
    assert extract_reference("AAAATTTT", ops) == "AAAACCTTTT"
    # mismatch takes recorded ref base
    ops = [("=", 2, None), ("X", 1, "G"), ("=", 1, None)]
    assert extract_reference("AATA", ops) == "AAGA"


def test_zip_and_trim_end_first():
    # homopolymer deletion: end-trim first leaves the LEFT-most copy
    ref, alt, s, e = zip_and_trim("ATCCCCG", "ATCCCG")
    assert (ref, alt) == ("C", "")
    assert s == 2 and e == 4


def test_to_kmers_raises_on_repeat():
    assert to_kmers("ACGT", 5) == {}
    assert to_kmers("ACGTA", 3) == {"ACG": 0, "CGT": 1, "GTA": 2}
    try:
        to_kmers("AAAA", 2)
        raise AssertionError("expected repeat error")
    except ValueError:
        pass


def test_align_segment_complex_indel():
    # longer-event-first: insertion + mismatch tail
    ops = align_segment("AC", "GGGAC")
    assert ops[0] == ("I", 3, None)
    # deletion + mismatch tail
    ops = align_segment("TTTAC", "AG")
    assert ops[0] == ("D", 3, "TTT")
    assert ("X", 1, "C") in ops or any(o[0] == "X" for o in ops)


def test_align_left_shifts_homopolymer():
    #        0123456789
    # ref  = ATGATTGACCCCTGATTA ; alt drops one C
    ref = "ATGATTGACCCCTGATTA"
    alt = "ATGATTGACCCTGATTA"
    ops = align(ref, alt, 6)
    assert ops == [("=", 8, None), ("D", 1, "C"), ("=", 9, None)]


def test_segment_read_flanks():
    # 13M 1D 37M with k=6: canonical 7M | realign (6M D 6M) | canonical 31M
    ops = [("=", 13, None), ("D", 1, "C"), ("=", 37, None)]
    read = "ATGATTGAATCCC" + "TGATTAGGATTGAATTGGTATTGAATTGGATAGGATT"
    blocks = segment_read(read, ops, 6)
    kinds = [b[0] for b in blocks]
    assert kinds == ["canonical", "realign", "canonical"]
    assert blocks[0][1] == [("=", 7, None)]
    assert blocks[1][2] == [("=", 6, None), ("D", 1, "C"), ("=", 6, None)]
    assert blocks[1][1] == read[7:19]
    assert blocks[2][1] == [("=", 31, None)]


def test_segment_read_absorbs_mismatches_in_backtrack():
    # mismatch right before the indel is pulled into the realign block
    ops = [("=", 10, None), ("X", 1, "G"), ("=", 2, None), ("I", 1, None), ("=", 20, None)]
    read = "A" * 34
    blocks = segment_read(read, ops, 6)
    kinds = [b[0] for b in blocks]
    assert kinds == ["canonical", "realign", "canonical"]
    # left flank: Match(6) + X + Match(2) absorbed, canonical keeps Match(4)
    assert blocks[0][1] == [("=", 4, None)]
    assert blocks[1][2][0] == ("=", 6, None)


def test_realign_read_left_shift_and_passthrough():
    P, S = "ATGATTGA", "TGATTAGGATTGAATTGGTATTGAATTGGA"
    # right-shifted deletion -> left-shifted
    c, m, f = realign_read(P + "CCC" + S, "11M1D30M", "11^C30", 6)
    assert (c, m, f) == ("8=1D33=", "8^C33", True)
    # right-shifted insertion -> left-shifted
    c, m, f = realign_read(P + "CCCC" + S, "11M1I30M", "41", 6)
    assert (c, m, f) == ("8=1I33=", "41", True)
    # SNP only: not a candidate, untouched
    c, m, f = realign_read(P + "C" + S, "39M", "8A30", 6)
    assert (c, m, f) == ("39M", "8A30", False)
    # soft clip preserved
    c, m, f = realign_read("GGGGG" + P + "CCC" + S, "5S11M1D30M", "11^C30", 6)
    assert (c, m, f) == ("5S8=1D33=", "8^C33", True)


def test_realign_read_fault_isolation():
    # garbage MD -> fall back to input
    c, m, f = realign_read("ACGT", "4M", "not-an-md", 6)
    assert (c, m, f) == ("4M", "not-an-md", False)
    # unparseable cigar
    c, m, f = realign_read("ACGT", "*", "", 6)
    assert (c, m, f) == ("*", "", False)


def test_realign_read_already_canonical_is_stable():
    # left-shifted input stays put (idempotence on canonical form)
    P, S = "ATGATTGA", "TGATTAGGATTGAATTGGTATTGAATTGGA"
    c, m, f = realign_read(P + "CCC" + S, "8M1D33M", "8^C33", 6)
    assert (c, m) == ("8=1D33=", "8^C33")
    assert f is True
