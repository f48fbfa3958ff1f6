"""Read realignment kernel (SURVEY §2.2 F7, §2.8 X18/X19) — the
`reassemble` pipeline's per-read string algorithm, re-implemented from
the reference's semantics:

  * operator algebra + CIGAR/MD codecs —
    avocado-core/.../models/ObservationOperator.scala:42-367
  * block segmentation (clipped / canonical / realignable with k-base
    flanks) — avocado-core/.../realigner/RealignmentBlock.scala:121-386
  * k-mer anchored pairwise alignment —
    avocado-core/.../realigner/Aligner.scala:42-371
  * per-read driver with row-level fault isolation —
    avocado-core/.../realigner/Realigner.scala:46-158

Pure per-row string code (no relational structure) — the designated
slow path, invoked from an Arrow-batched ``mapInPandas`` wrapper in
``avocado_spark.operators.realigner``.

Operator representation: ``(kind, size, data)`` tuples with kind in
{'=', 'X', 'I', 'D', 'S', 'H'}; data is the reference bases for 'X'
(mismatch run, len == size) and 'D' (deleted bases), else None.
Realigned CIGARs use the extended '='/'X' match operators, as the
reference's emitter does (ObservationOperator.scala:420-427).
"""

from __future__ import annotations

from avocado_spark.functions.alignment import parse_cigar, parse_md

Op = tuple[str, int, str | None]


# ---------------------------------------------------------------------------
# codecs: CIGAR+MD <-> operator algebra
# ---------------------------------------------------------------------------


def ops_from_cigar_md(cigar: str, md: str, sequence: str) -> list[Op]:
    """Parse CIGAR + MD into normalized operators (the engine's form of
    extractAlignmentOperators, ObservationOperator.scala:42-171).
    Raises ValueError on inconsistent/unsupported input."""
    cops = parse_cigar(cigar)
    if not cops:
        raise ValueError("unparseable cigar")
    if md is None or md == "":
        raise ValueError("missing MD tag")
    mtoks = parse_md(md)

    out: list[Op] = []
    read_off = 0
    mi = 0
    cur_kind: str | None = None
    cur_val: str | int = 0

    def advance_md() -> None:
        nonlocal mi, cur_kind, cur_val
        if mi < len(mtoks):
            cur_kind, cur_val = mtoks[mi]
            if cur_kind == "match":
                cur_val = int(cur_val)
            mi += 1
        else:
            cur_kind, cur_val = None, 0

    advance_md()
    for length, op in cops:
        if op == "S":
            out.append(("S", length, None))
            read_off += length
        elif op == "H":
            out.append(("H", length, None))
        elif op == "I":
            out.append(("I", length, None))
            read_off += length
        elif op == "D":
            if cur_kind != "del" or len(cur_val) != length:
                raise ValueError(f"MD/CIGAR disagree at deletion: {cigar} {md}")
            out.append(("D", length, cur_val))
            advance_md()
        elif op in ("M", "=", "X"):
            remaining = length
            while remaining > 0:
                if cur_kind == "match":
                    take = min(remaining, cur_val)
                    out.append(("=", take, None))
                    read_off += take
                    remaining -= take
                    cur_val -= take
                    if cur_val == 0:
                        advance_md()
                elif cur_kind == "mismatch":
                    out.append(("X", 1, cur_val))
                    read_off += 1
                    remaining -= 1
                    advance_md()
                else:
                    raise ValueError(f"MD exhausted inside match: {cigar} {md}")
        else:
            raise ValueError(f"unsupported CIGAR op {op}")
    return collapse(out)


def collapse(ops: list[Op]) -> list[Op]:
    """Merge adjacent same-kind operators, dropping zero-length blocks
    (ObservationOperator.collapse, :183-224)."""
    out: list[Op] = []
    for op in ops:
        kind, size, data = op
        if size <= 0:
            continue
        if out and out[-1][0] == kind and kind in ("=", "X", "I", "D"):
            pk, ps, pd = out[-1]
            if kind in ("X", "D"):
                out[-1] = (kind, ps + size, (pd or "") + (data or ""))
            else:
                out[-1] = (kind, ps + size, None)
        else:
            out.append(op)
    return out


def extract_reference(read: str, ops: list[Op]) -> str:
    """Reconstruct the reference spanned by these operators from the
    read bases + recorded mismatch/deletion bases
    (ObservationOperator.extractReference, :233-292)."""
    ref: list[str] = []
    r = read
    for kind, size, data in ops:
        if kind in ("S", "I"):
            if len(r) <= size:
                raise ValueError("not enough read bases to drop")
            r = r[size:]
        elif kind == "H":
            pass
        elif kind == "D":
            ref.append(data or "")
        elif kind == "=":
            ref.append(r[:size])
            r = r[size:]
        elif kind == "X":
            ref.append(data or "")
            r = r[size:]
    if r:
        raise ValueError("operators exhausted but read bases remain")
    return "".join(ref)


def make_cigar_md(ops: list[Op]) -> tuple[str, str]:
    """Emit extended CIGAR ('='/'X') + MD tag
    (ObservationOperator.makeCigarAndMD, :300-367)."""
    cigar: list[str] = []
    md: list[str] = []
    run = 0
    for kind, size, data in ops:
        cigar.append(f"{size}{kind}")
        if kind == "=":
            run += size
        elif kind == "X":
            md.append(str(run))
            md.append((data or "")[0])
            for base in (data or "")[1:]:
                md.append("0")
                md.append(base)
            run = 0
        elif kind == "D":
            md.append(str(run))
            md.append("^" + (data or ""))
            run = 0
    md.append(str(run))
    return "".join(cigar), "".join(md)


# ---------------------------------------------------------------------------
# block segmentation (RealignmentBlock.scala:121-386)
# ---------------------------------------------------------------------------

# block kinds: ('clip', size, soft) | ('canonical', ops) |
#              ('realign', read_bases, ops)
Block = tuple


def _consumes_read(op: Op) -> int:
    return op[1] if op[0] in ("=", "X", "I", "S") else 0


def segment_read(read: str, ops: list[Op], k: int) -> list[Block]:
    """Split a read into clipped / canonical / realignable blocks. A
    realignable block contains the indel(s) plus up to k flanking
    sequence-match bases carved from the adjacent canonical runs; a
    pure match of length >= k closes a realignable block (first k bases
    stay in it, the remainder starts a new canonical block)."""
    # clips are legal only as a prefix/suffix run of the operator list
    n = len(ops)
    first_non_clip = next((i for i, o in enumerate(ops) if o[0] not in ("S", "H")), n)
    last_non_clip = next((n - 1 - i for i, o in enumerate(reversed(ops)) if o[0] not in ("S", "H")), -1)
    blocks: list[Block] = []
    buf: list[tuple[Op, int]] = []  # (op, read offset)
    in_realign = False
    off = 0

    def close_buf() -> None:
        nonlocal buf, in_realign
        if not buf:
            return
        if in_realign:
            start = buf[0][1]
            end = buf[-1][1] + _consumes_read(buf[-1][0])
            blocks.append(("realign", read[start:end], [o for o, _ in buf]))
        else:
            blocks.append(("canonical", [o for o, _ in buf]))
        buf = []
        in_realign = False

    def start_realign(op: Op, op_off: int) -> None:
        """Backtrack into the canonical buffer for the left flank."""
        nonlocal buf, in_realign
        flank: list[tuple[Op, int]] = []
        while buf:
            pk, psize, _ = buf[-1][0]
            if pk == "=" and psize >= k:
                pop, poff = buf.pop()
                if psize > k:
                    buf.append((("=", psize - k, None), poff))
                flank.insert(0, (("=", k, None), poff + psize - k))
                break
            flank.insert(0, buf.pop())
        if buf:
            blocks.append(("canonical", [o for o, _ in buf]))
        buf = flank + [(op, op_off)]
        in_realign = True

    for i, op in enumerate(ops):
        kind, size, data = op
        if kind in ("S", "H"):
            if not (i < first_non_clip or i > last_non_clip):
                raise ValueError("clip operator in the middle of a read")
            close_buf()
            blocks.append(("clip", size, kind == "S"))
        elif kind == "=":
            if in_realign:
                if size >= k:
                    buf.append((("=", k, None), off))
                    close_buf()
                    if size > k:
                        buf.append((("=", size - k, None), off + k))
                else:
                    buf.append((op, off))
            else:
                buf.append((op, off))
        elif kind == "X":
            buf.append((op, off))
        elif kind in ("I", "D"):
            if in_realign:
                buf.append((op, off))
            else:
                start_realign(op, off)
        off += _consumes_read(op)
    close_buf()
    return blocks


# ---------------------------------------------------------------------------
# k-mer anchored pairwise alignment (Aligner.scala)
# ---------------------------------------------------------------------------


def zip_and_trim(ref: str, alt: str) -> tuple[str, str, int, int]:
    """Trim shared flanks: end first, then start (Aligner.scala:42-72 —
    the end-first order is what left-shifts homopolymer indels)."""
    n_end = 0
    while n_end < min(len(ref), len(alt)) and ref[-1 - n_end] == alt[-1 - n_end]:
        n_end += 1
    r = ref[: len(ref) - n_end]
    a = alt[: len(alt) - n_end]
    n_start = 0
    while n_start < min(len(r), len(a)) and r[n_start] == a[n_start]:
        n_start += 1
    return r[n_start:], a[n_start:], n_start, n_end


def to_kmers(sequence: str, k: int) -> dict[str, int]:
    """k-mer -> position map; raises on internal repeats
    (Aligner.scala:79-96 — a repeat means no unique anchoring)."""
    if len(sequence) < k:
        return {}
    out: dict[str, int] = {}
    for i in range(len(sequence) - k + 1):
        km = sequence[i : i + k]
        if km in out:
            raise ValueError("input sequence contains a repeat")
        out[km] = i
    return out


def _squash(ref: str, alt: str) -> list[Op]:
    """Per-base (mis)match run for equal-length segments."""
    ops: list[Op] = []
    for r, a in zip(ref, alt):
        ops.append(("=", 1, None) if r == a else ("X", 1, r))
    return collapse(ops)


def align_segment(ref: str, alt: str) -> list[Op]:
    """Align one trimmed segment: SNP/MNP squash, simple indel, or
    complex indel split longer-event-first (Aligner.scala:125-162)."""
    if len(ref) == len(alt):
        return _squash(ref, alt)
    if len(ref) == 0:
        return [("I", len(alt), None)]
    if len(alt) == 0:
        return [("D", len(ref), ref)]
    if len(alt) > len(ref):
        ins = len(alt) - len(ref)
        return [("I", ins, None)] + _squash(ref, alt[ins:])
    d = len(ref) - len(alt)
    return [("D", d, ref[:d])] + _squash(ref[d:], alt)


def _concordant(indices: list[tuple[int, int]]) -> bool:
    last = -1
    for _, ai in indices:
        if ai <= last:
            return False
        last = ai
    return True


def _chop_blocks(
    indices: list[tuple[int, int]], ref: str, alt: str, k: int
) -> list[tuple]:
    """Split (ref, alt) at shared k-mer anchors into match /
    unknown-segment blocks (Aligner.indicesToBlocks, :246-316);
    processed right-to-left so anchor runs coalesce."""
    out: list[tuple] = []
    match_len = -1
    for ri, ai in reversed(indices):
        ref_ext = len(ref) - ri
        alt_ext = len(alt) - ai
        pending = [("match", match_len)] if match_len > 0 else []
        if ref_ext >= k and alt_ext >= k:
            out = [("unknown", ref[ri + k :], alt[ai + k :])] + pending + out
            match_len = k
        elif ref_ext > 1 and alt_ext >= 1 and ref_ext > alt_ext:
            out = [("unknown", ref[ri + alt_ext :], "")] + pending + out
            match_len = alt_ext
        elif alt_ext > 1 and ref_ext >= 1 and alt_ext > ref_ext:
            out = [("unknown", "", alt[ai + ref_ext :])] + pending + out
            match_len = ref_ext
        else:
            if not (ref_ext == 1 and alt_ext == 1):
                raise ValueError("non-unit anchor extension")
            match_len += 1
        ref, alt = ref[:ri], alt[:ai]
    head = [("match", match_len)] if match_len > 0 else []
    return [("unknown", ref, alt)] + head + out


def align(ref: str, alt: str, k: int) -> list[Op]:
    """Pairwise-align alt (read bases) against ref: trim shared flanks,
    anchor on unique shared k-mers, align the leftover segments
    (Aligner.align, :175-233)."""
    tref, talt, n_start, n_end = zip_and_trim(ref, alt)
    ref_k = to_kmers(tref, k)
    alt_k = to_kmers(talt, k)
    inter = set(ref_k) & set(alt_k)
    mid: list[Op]
    if not inter:
        mid = align_segment(tref, talt)
    else:
        indices = sorted((ref_k[m], alt_k[m]) for m in inter)
        if _concordant(indices):
            mid = []
            for blk in _chop_blocks(indices, tref, talt, k):
                if blk[0] == "match":
                    mid.append(("=", blk[1], None))
                else:
                    _, bref, balt = blk
                    if bref == balt:
                        raise ValueError("degenerate unknown block")
                    mid.extend(align_segment(bref, balt))
        else:
            mid = align_segment(tref, talt)
    return collapse([("=", n_start, None)] + mid + [("=", n_end, None)])


# ---------------------------------------------------------------------------
# per-read driver (Realigner.scala:46-158)
# ---------------------------------------------------------------------------


def realign_read(
    sequence: str, cigar: str, md: str, kmer_length: int = 20
) -> tuple[str, str, bool]:
    """Realign one read; returns (cigar, md, was_realigned). Any error
    (unparseable input, k-mer repeat, degenerate block) falls back to
    the input alignment — row-level fault isolation
    (Realigner.scala:97-105)."""
    try:
        ops = ops_from_cigar_md(cigar, md, sequence)
        blocks = segment_read(sequence, ops, kmer_length)
        if not any(b[0] == "realign" for b in blocks):
            return cigar, md, False
        out_ops: list[Op] = []
        for b in blocks:
            if b[0] == "clip":
                out_ops.append(("S" if b[2] else "H", b[1], None))
            elif b[0] == "canonical":
                out_ops.extend(b[1])
            else:
                _, bases, bops = b
                ref = extract_reference(bases, bops)
                out_ops.extend(align(ref, bases, kmer_length))
        new_cigar, new_md = make_cigar_md(collapse(out_ops))
        return new_cigar, new_md, True
    except Exception:
        return cigar, md, False
