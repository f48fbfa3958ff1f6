"""Alignment algebra: CIGAR + MD string codecs and per-read variant /
observation extraction (SURVEY §2.8 X18, §2.3 E1-E3).

Reference semantics:
  * operator parse/normalize — avocado-core/.../models/ObservationOperator.scala:42-171
  * per-read variant extraction — avocado-core/.../genotyping/DiscoverVariants.scala:112-252
  * per-base observation — avocado-core/.../genotyping/Observer.scala:48-140

These are pure per-row string algorithms with no relational structure,
so they are the designated "slow path": plain Python here, invoked
from Arrow-batched ``mapInPandas`` wrappers in the operator modules.
Coordinates are 0-based half-open throughout, matching the reference
(DiscoveredVariant.scala:83,102-108).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_MD_RE = re.compile(r"(\d+)|(\^[A-Za-z]+)|([A-Za-z])")


def parse_cigar(cigar: str) -> list[tuple[int, str]]:
    """'40M3D35M' → [(40,'M'), (3,'D'), (35,'M')]."""
    if not cigar or cigar == "*":
        return []
    return [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]


def parse_md(md: str) -> list[tuple[str, str]]:
    """MD tag → [('match', '15'), ('mismatch', 'C'), ('del', 'GCA'), ...]."""
    out: list[tuple[str, str]] = []
    for num, dele, sub in _MD_RE.findall(md or ""):
        if num:
            if int(num) == 0:
                continue  # zero-length match runs are MD padding
            out.append(("match", num))
        elif dele:
            out.append(("del", dele[1:].upper()))
        elif sub:
            out.append(("mismatch", sub.upper()))
    return out


@dataclass
class AlignedPiece:
    """One normalized alignment event on the reference axis."""

    kind: str  # 'match' | 'mismatch' | 'ins' | 'del'
    ref_pos: int  # reference coordinate (event start)
    read_off: int  # read offset (first read base of the event; for del: anchor+1)
    length: int  # event length (ref bases for match/del, read bases for ins)
    ref_bases: str = ""  # mismatch: ref base; del: deleted ref bases
    read_bases: str = ""  # mismatch: read base; ins: inserted read bases


def walk_alignment(cigar: str, md: str, sequence: str) -> list[AlignedPiece]:
    """Normalize CIGAR+MD+sequence into aligned pieces — the engine's
    form of ObservationOperator.extractAlignmentOperators
    (ObservationOperator.scala:42-171). Raises ValueError on
    inconsistent inputs (the reference asserts, :132-156); callers wrap
    rows in try/except for row-level fault isolation
    (Realigner.scala:97-105)."""
    ops = parse_cigar(cigar)
    md_tokens = parse_md(md)

    pieces: list[AlignedPiece] = []
    ref_pos = 0  # relative to alignment start
    read_off = 0
    mi = 0  # md token index
    md_remaining = 0  # bases left in current md 'match' run
    md_kind = None

    def next_md():
        nonlocal mi, md_remaining, md_kind
        while mi < len(md_tokens):
            kind, val = md_tokens[mi]
            mi += 1
            if kind == "match":
                n = int(val)
                if n == 0:
                    continue
                md_kind, md_remaining = "match", n
                return
            md_kind, md_remaining = kind, val
            return
        md_kind, md_remaining = None, 0

    next_md()
    for length, op in ops:
        if op in ("S", "H"):
            if op == "S":
                read_off += length
            continue
        if op == "I":
            pieces.append(
                AlignedPiece(
                    "ins",
                    ref_pos,
                    read_off,
                    length,
                    read_bases=sequence[read_off : read_off + length],
                )
            )
            read_off += length
            continue
        if op == "D":
            if md_kind != "del":
                raise ValueError(f"MD/CIGAR disagree at deletion: {cigar} {md}")
            deleted = md_remaining
            if len(deleted) != length:
                raise ValueError(f"deletion length mismatch: {cigar} {md}")
            pieces.append(AlignedPiece("del", ref_pos, read_off, length, ref_bases=deleted))
            ref_pos += length
            next_md()
            continue
        if op in ("M", "=", "X"):
            remaining = length
            while remaining > 0:
                if md_kind == "match":
                    take = min(remaining, md_remaining)
                    pieces.append(AlignedPiece("match", ref_pos, read_off, take))
                    ref_pos += take
                    read_off += take
                    remaining -= take
                    md_remaining -= take
                    if md_remaining == 0:
                        next_md()
                elif md_kind == "mismatch":
                    pieces.append(
                        AlignedPiece(
                            "mismatch",
                            ref_pos,
                            read_off,
                            1,
                            ref_bases=md_remaining,
                            read_bases=sequence[read_off : read_off + 1].upper(),
                        )
                    )
                    ref_pos += 1
                    read_off += 1
                    remaining -= 1
                    next_md()
                else:
                    raise ValueError(f"MD exhausted inside match: {cigar} {md}")
            continue
        if op == "N":
            ref_pos += length
            continue
        raise ValueError(f"unsupported CIGAR op {op}")
    return pieces


def variants_in_read(
    contig: str,
    start: int,
    sequence: str,
    qual: str,
    cigar: str,
    md: str,
    phred_threshold: int = 18,
) -> list[tuple[str, int, int, str, str]]:
    """E1 — emit (contig, start, end, ref, alt) candidates from one read
    (DiscoverVariants.scala:112-252): SNP per mismatching base with
    phred ≥ threshold (MNPs split per base); insertion left-anchored
    when the inserted bases' mean qual passes; deletion anchored at the
    preceding base when the anchor qual passes."""
    out: list[tuple[str, int, int, str, str]] = []
    pieces = walk_alignment(cigar, md, sequence)
    for p in pieces:
        if p.kind == "mismatch":
            q = ord(qual[p.read_off]) - 33
            if q >= phred_threshold:
                out.append(
                    (contig, start + p.ref_pos, start + p.ref_pos + 1, p.ref_bases, p.read_bases)
                )
        elif p.kind == "ins":
            if p.read_off == 0:
                continue  # no anchor base before the insertion
            qs = [ord(c) - 33 for c in qual[p.read_off : p.read_off + p.length]]
            if qs and sum(qs) / len(qs) >= phred_threshold:
                anchor = sequence[p.read_off - 1].upper()
                pos = start + p.ref_pos - 1
                out.append((contig, pos, pos + 1, anchor, anchor + p.read_bases.upper()))
        elif p.kind == "del":
            if p.read_off == 0:
                continue
            if ord(qual[p.read_off - 1]) - 33 >= phred_threshold:
                anchor = sequence[p.read_off - 1].upper()
                pos = start + p.ref_pos - 1
                out.append(
                    (contig, pos, pos + 1 + p.length, anchor + p.ref_bases, anchor)
                )
    return out


def read_base_at(
    start: int, sequence: str, qual: str, cigar: str, md: str, ref_pos: int
) -> tuple[str, int] | None:
    """E3 helper — the read base + phred qual aligned to reference
    position ``ref_pos`` (None if the position falls in a deletion or
    outside the alignment). Used to classify an observation against a
    variant allele (BiallelicGenotyper.scala:195-393)."""
    rel = ref_pos - start
    for p in walk_alignment(cigar, md, sequence):
        if p.kind in ("match", "mismatch") and p.ref_pos <= rel < p.ref_pos + p.length:
            off = p.read_off + (rel - p.ref_pos)
            return sequence[off].upper(), ord(qual[off]) - 33
        if p.kind == "del" and p.ref_pos <= rel < p.ref_pos + p.length:
            return None
    return None


def site_events(
    start: int,
    sequence: str,
    qual: str,
    cigar: str,
    md: str,
    keep: frozenset[int] | None = None,
) -> tuple[list[list], int]:
    """E2/E3 — ONE walk_alignment pass per read, emitting every site
    the read attests (BiallelicGenotyper.scala:227-336, Observer.scala:83-135):

      [pos, base, ref_base, matched, qual, ins_bases, ins_qual, del_len]

    * one row per aligned base (match/mismatch), with the read base,
      the reference base (from MD on mismatch) and the phred qual;
    * an insertion is attached to its left-anchor row (``ins_bases`` =
      inserted read bases, ``ins_qual`` = floor-mean of their quals) —
      the reference keys insertions to the anchor with an
      empty→bases allele (Observer.scala:96-110);
    * a deletion is attached to its left-anchor row (``del_len``) AND
      emits one row per deleted reference position (base=None,
      ref_base from MD, qual = anchor qual) so gVCF mode scores the
      spanned sites as non-reference (Observer.scala:111-135).

    Returns (rows, aligned_end). Downstream classification against
    variant alleles is pure relational work (an equi-join on pos) —
    the read's CIGAR is parsed exactly once no matter how many
    variants it covers.

    ``keep`` restricts emission to the given reference positions (the
    variant-site pushdown for the discovery→classify path): only rows
    anchored at a kept position are materialized, so event volume is
    O(read ∩ variant sites) instead of O(aligned bases). An ins/del
    whose anchor is not kept is rightly dropped — no variant is keyed
    there — and deletion-span rows (gVCF evidence only) are skipped
    entirely under ``keep``.
    """
    pieces = walk_alignment(cigar, md, sequence)
    rows: list[list] = []
    index: dict[int, int] = {}  # ref pos -> row index (aligned bases only)
    ref_span = 0
    for p in pieces:
        if p.kind in ("match", "mismatch"):
            ref_span = max(ref_span, p.ref_pos + p.length)
            for i in range(p.length):
                pos = start + p.ref_pos + i
                if keep is not None and pos not in keep:
                    continue
                off = p.read_off + i
                b = sequence[off].upper()
                index[pos] = len(rows)
                rows.append(
                    [
                        pos,
                        b,
                        b if p.kind == "match" else p.ref_bases.upper(),
                        p.kind == "match",
                        ord(qual[off]) - 33,
                        None,
                        None,
                        None,
                    ]
                )
        elif p.kind == "ins":
            if p.read_off == 0:
                continue  # no anchor base before the insertion
            anchor = start + p.ref_pos - 1
            i = index.get(anchor)
            if i is not None:
                qs = [ord(c) - 33 for c in qual[p.read_off : p.read_off + p.length]]
                rows[i][5] = p.read_bases.upper()
                rows[i][6] = sum(qs) // len(qs)
        elif p.kind == "del":
            ref_span = max(ref_span, p.ref_pos + p.length)
            if p.read_off == 0:
                continue
            anchor = start + p.ref_pos - 1
            i = index.get(anchor)
            if i is None:
                continue
            rows[i][7] = p.length
            if keep is not None:
                continue  # span rows are gVCF-only evidence
            anchor_q = rows[i][4]
            for d in range(p.length):
                rows.append(
                    [
                        start + p.ref_pos + d,
                        None,
                        p.ref_bases[d].upper(),
                        False,
                        anchor_q,
                        None,
                        None,
                        None,
                    ]
                )
    return rows, start + ref_span


def observe_sites(
    start: int,
    sequence: str,
    qual: str,
    cigar: str,
    md: str,
    stride: int = 1,
) -> list[tuple[int, str, bool, int]]:
    """E2 (all-sites form) — walk the alignment once and emit one
    observation per covered reference site on the ``stride`` lattice:
    (ref_pos, ref_base, is_ref, phred_qual). Matches observe ref-model
    semantics (Observer.scala:48-140): match → ref observation,
    mismatch → non-ref (ref base from MD), deletion spans contribute no
    base observation. ``stride=1`` is the reference's every-base gVCF
    scoring; larger strides thin the lattice for testability."""
    out: list[tuple[int, str, bool, int]] = []
    for p in walk_alignment(cigar, md, sequence):
        if p.kind not in ("match", "mismatch"):
            continue
        lo = start + p.ref_pos
        hi = lo + p.length
        first = ((lo + stride - 1) // stride) * stride
        for pos in range(first, hi, stride):
            off = p.read_off + (pos - lo)
            if p.kind == "match":
                ref_base = sequence[off].upper()
                is_ref = True
            else:
                ref_base = p.ref_bases[pos - lo].upper()
                is_ref = False
            out.append((pos, ref_base, is_ref, ord(qual[off]) - 33))
    return out
