"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` so each batch amortizes codec setup. Production codecs
(PIL/ffmpeg/librosa) are NOT in this container, so the decode path is
implemented against three PURE-PYTHON toy formats that are real enough
to be honest — a byte-level parse of an actual container, not a pass-
through: binary PPM (P6) images, RIFF/WAVE PCM16 audio, and a minimal
``TVID`` multi-frame video container of concatenated PPM frames.
``decode_media`` parses headers and payload bytes and emits exact
integer pixel/sample statistics; :func:`synth_media_encoded` writes
well-formed payloads whose decoded statistics have a closed form, so
the whole encode→Arrow-exchange→parse→aggregate path is DuckDB-oracle
replayable. ``fake_features`` (SHA-256 → floats) remains as the
codec-free feature-extraction stand-in used by the embedding-shaped
queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 8


def attach_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8
    bytes of the text (a deterministic opaque blob), metadata derived
    from doc stats. This is the ingest shape a real pipeline would get
    from an object store manifest."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


DECODE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, n_samples bigint, px_sum bigint, px_count bigint, "
    "amp_sum bigint, amp_sumsq bigint"
)


def _encode_ppm(w: int, h: int, seed: int, off: int) -> bytes:
    """Binary PPM (P6): ASCII header + raw RGB bytes. Pixel byte i is
    (seed + off + i) mod 256 — a closed form an SQL oracle can replay
    without running the codec."""
    px = ((seed + off + np.arange(3 * w * h)) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def _encode_wav(rate: int, n: int, seed: int) -> bytes:
    """RIFF/WAVE, PCM16 mono: canonical 44-byte header + little-endian
    int16 samples. Sample i is ((7·seed + i) mod 256) − 128."""
    samples = ((7 * seed + np.arange(n)) % 256 - 128).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def _parse_ppm(buf: bytes, pos: int) -> tuple[int, int, int, int]:
    """Parse one P6 frame starting at ``pos``; returns (width, height,
    pixel_start, pixel_end). Real PPM tokenization: arbitrary
    whitespace between header fields, ``#`` comments, exactly one
    whitespace byte after maxval before the raster."""
    if buf[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 PPM at offset {pos}")
    i = pos + 2
    vals: list[int] = []
    while len(vals) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        vals.append(int(buf[i:j]))
        i = j
    i += 1  # the single whitespace byte that terminates the header
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit-per-channel PPM not supported")
    end = i + 3 * w * h
    if end > len(buf):
        raise ValueError("truncated PPM raster")
    return w, h, i, end


def _parse_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Walk RIFF chunks (word-aligned) for fmt/data; returns
    (sample_rate, int16 sample array). Only PCM16 mono is decoded —
    anything else raises, loudly, like a codec would."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, ch, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or ch != 1:
        raise ValueError(f"only PCM16 mono supported (bits={bits}, ch={ch})")
    return rate, np.frombuffer(data, dtype="<i2")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "media_id", "kind", "width", "height", "n_frames", "sample_rate",
        "n_samples", "px_sum", "px_count", "amp_sum", "amp_sumsq",
    ]
    for pdf in batches:
        rows = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b, mid = bytes(payload), int(mid)
            if b[:2] == b"P6":
                w, h, s, e = _parse_ppm(b, 0)
                px = np.frombuffer(b[s:e], dtype=np.uint8).astype(np.int64)
                rows.append((mid, "image", w, h, 1, None, None,
                             int(px.sum()), int(px.size), None, None))
            elif b[:4] == b"RIFF":
                rate, samples = _parse_wav(b)
                a = samples.astype(np.int64)
                rows.append((mid, "audio", None, None, None, rate,
                             int(a.size), None, None, int(a.sum()),
                             int((a * a).sum())))
            elif b[:4] == b"TVID":
                nf = int.from_bytes(b[4:6], "little")
                pos, tot, cnt, w0, h0 = 6, 0, 0, None, None
                for _f in range(nf):
                    w, h, s, e = _parse_ppm(b, pos)
                    px = np.frombuffer(b[s:e], dtype=np.uint8).astype(np.int64)
                    tot += int(px.sum())
                    cnt += int(px.size)
                    if w0 is None:
                        w0, h0 = w, h
                    pos = e
                rows.append((mid, "video", w0, h0, nf, None, None,
                             tot, cnt, None, None))
            else:
                raise ValueError(
                    f"unknown media magic {b[:4]!r} for media_id={mid}"
                )
        yield pd.DataFrame(rows, columns=cols)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode opaque binary media payloads into typed per-item
    statistics by PARSING the bytes — P6 PPM images, RIFF/WAVE PCM16
    audio, and the TVID concatenated-PPM video container. Emits exact
    integer pixel/sample aggregates (sums and counts, engine-hashable;
    no float accumulation order hazards). Unknown magics raise.

    Scale shape: Arrow-batched ``mapInPandas``, zero shuffles —
    decoding is embarrassingly parallel over rows and the per-batch
    numpy reductions keep Python off the per-byte hot path. Real
    codecs (JPEG/FLAC/H.264 via PIL/ffmpeg) slot into the same batch
    function and output schema when present; the toy formats keep this
    container's path honest end to end rather than stubbed."""
    return media.select("media_id", "payload").mapInPandas(
        _decode_batches, schema=DECODE_SCHEMA
    )


def synth_media_encoded(docs: DataFrame) -> DataFrame:
    """Encode real media payloads for the documents fixture —
    doc_id mod 3 picks the modality (0 image, 1 audio, 2 video); the
    dimensions, seeds, and pixel/sample values are closed-form in
    doc_id so a SQL oracle can replay :func:`decode_media`'s output
    without running either codec. Runs as the same Arrow-batched
    ``mapInPandas`` shape a real object-store fetch stage would."""
    base = docs.select(F.col("doc_id").cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                seed = mid % 256
                w, h = 8 + mid % 8, 6 + mid % 6
                if mid % 3 == 0:
                    rows.append((mid, "image", _encode_ppm(w, h, seed, 0)))
                elif mid % 3 == 1:
                    rows.append(
                        (mid, "audio", _encode_wav(8000, 64 + mid % 64, seed))
                    )
                else:
                    nf = 1 + mid % 3
                    payload = b"TVID" + nf.to_bytes(2, "little") + b"".join(
                        _encode_ppm(w, h, seed, f) for f in range(nf)
                    )
                    rows.append((mid, "video", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return base.mapInPandas(gen, schema="media_id long, kind string, payload binary")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            digest = hashlib.sha256(bytes(payload)).digest()
            vec = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype("float64")
            feats.append((int(mid), (vec / 2**32).tolist()))
        yield pd.DataFrame(feats, columns=["media_id", "features"])


def fake_features(media: DataFrame) -> DataFrame:
    """Deterministic feature extraction stand-in: SHA-256 of the payload
    → 8 floats in [0,1). Exercises the real Arrow exchange, schema and
    partitioning of a decode/embed stage."""
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, schema="media_id long, features array<double>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    the explode that precedes per-frame decode in a real pipeline."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


# content-defined chunking: boundary after byte i iff the rolling hash
# of the 4-byte window ending at i satisfies h % CDC_MODULUS == 0.
# Window-local hashing is what makes chunk boundaries shift-resistant
# (insert a byte early in the stream and later boundaries re-align) —
# the storage/backup dedup property fixed-size blocks lack.
CDC_MODULUS = 64
_CDC_P = 1_000_000_007


def _cdc_batches(batches):
    import pandas as pd

    for pdf in batches:
        out = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            if n == 0:
                continue
            a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            ends = []
            if n >= 4:
                h = a[3:] + 31 * a[2:-1] + 961 * a[1:-2] + 29791 * a[:-3]
                # i is the 1-based position of the window's LAST byte
                ends = (np.nonzero(h % CDC_MODULUS == 0)[0] + 4).tolist()
            if not ends or ends[-1] != n:
                ends.append(n)
            start = 1
            for idx, e in enumerate(ends):
                chunk = a[start - 1 : e]
                fp = 0
                for byte in chunk.tolist():
                    fp = (fp * 131 + byte) % _CDC_P
                out.append((int(mid), idx, start, e - start + 1, fp))
                start = e + 1
        yield pd.DataFrame(
            out, columns=["media_id", "chunk_idx", "offset", "length", "fp"]
        )


def cdc_chunks(media: DataFrame) -> DataFrame:
    """Content-defined chunking of opaque binary payloads (the
    rolling-hash boundary scheme behind storage dedup and media
    near-dup): split each payload where the 4-byte window hash hits the
    modulus, emit (chunk_idx, offset, length, fingerprint) per chunk.

    Runs as Arrow-batched ``mapInPandas`` with a vectorized window
    hash — binary byte-level work is the one place Python earns its
    slot, and the batch amortizes the exchange. Zero shuffles: chunking
    is embarrassingly parallel over rows; downstream dedup groups on
    the fingerprint."""
    return media.select("media_id", "payload").mapInPandas(
        _cdc_batches,
        schema="media_id long, chunk_idx int, offset int, length int, fp long",
    )
