"""Content-defined chunking: boundary determinism and the
shift-resistance property that distinguishes CDC from fixed-size
blocking — a prefix insertion must re-align chunk boundaries so most
fingerprints survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.multimodal import cdc_chunks

P = 1_000_000_007


def _chunks_of(spark, blobs: dict[int, bytes]):
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()], "media_id long, payload binary"
    )
    rows = cdc_chunks(df).collect()
    out: dict[int, list] = {k: [] for k in blobs}
    for r in rows:
        out[r.media_id].append((r.chunk_idx, r.offset, r.length, r.fp))
    for k in out:
        out[k].sort()
    return out


def _py_chunks(b: bytes):
    n = len(b)
    ends = [
        i
        for i in range(4, n + 1)
        if (29791 * b[i - 4] + 961 * b[i - 3] + 31 * b[i - 2] + b[i - 1]) % 64 == 0
    ]
    if not ends or ends[-1] != n:
        ends.append(n)
    chunks, start = [], 1
    for idx, e in enumerate(ends):
        fp = 0
        for byte in b[start - 1 : e]:
            fp = (fp * 131 + byte) % P
        chunks.append((idx, start, e - start + 1, fp))
        start = e + 1
    return chunks


def test_cdc_matches_python_replay(spark):
    blobs = {
        1: bytes(range(200)) * 3,
        2: b"abcd" * 50,
        3: b"xyz",  # shorter than the window -> one chunk
    }
    got = _chunks_of(spark, blobs)
    for k, b in blobs.items():
        assert got[k] == _py_chunks(b), k


def _lcg_bytes(n: int, seed: int = 42) -> bytes:
    x, out = seed, bytearray()
    for _ in range(n):
        x = (x * 1103515245 + 12345) % 2147483648
        out.append((x >> 16) & 0xFF)
    return bytes(out)


def test_cdc_chunks_partition_payload(spark):
    b = _lcg_bytes(5000)
    got = _chunks_of(spark, {1: b})[1]
    assert sum(c[2] for c in got) == len(b)
    assert got[0][1] == 1
    for (i1, o1, l1, _), (i2, o2, _, _) in zip(got, got[1:]):
        assert i2 == i1 + 1 and o2 == o1 + l1


def test_cdc_shift_resistance_vs_fixed_blocks(spark):
    base = _lcg_bytes(5000)
    shifted = b"!" + base  # one-byte prefix insertion
    got = _chunks_of(spark, {1: base, 2: shifted})
    fps1 = {fp for _, _, _, fp in got[1]}
    fps2 = {fp for _, _, _, fp in got[2]}
    shared = len(fps1 & fps2) / len(fps1)
    # CDC: everything after the first re-aligned boundary is identical
    assert shared > 0.9, shared
    # fixed 64-byte blocks under the same shift share (almost) nothing
    fixed1 = {base[i : i + 64] for i in range(0, len(base), 64)}
    fixed2 = {shifted[i : i + 64] for i in range(0, len(shifted), 64)}
    assert len(fixed1 & fixed2) / len(fixed1) < 0.1
