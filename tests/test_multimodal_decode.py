"""The toy-codec decode path: decode_media must PARSE the container
bytes (header tokenization, chunk walking), not replay the generator's
formulas — these tests feed it payloads the generator never produces
(comments in PPM headers, extra RIFF chunks, garbage magic) to prove
the parse is real."""

from __future__ import annotations

import numpy as np
import pytest

from avocado_spark.operators.multimodal import (
    _encode_ppm,
    _encode_wav,
    _parse_ppm,
    _parse_wav,
    decode_media,
    synth_media_encoded,
)


def test_ppm_roundtrip_stats():
    buf = _encode_ppm(5, 4, seed=7, off=2)
    w, h, s, e = _parse_ppm(buf, 0)
    assert (w, h) == (5, 4)
    px = np.frombuffer(buf[s:e], dtype=np.uint8)
    assert px.size == 3 * 5 * 4
    assert px.tolist() == [(7 + 2 + i) % 256 for i in range(60)]


def test_ppm_parser_handles_comments_and_whitespace():
    """A header shape the generator never writes: comments + mixed
    whitespace. A formula-replay fake would fail here."""
    raster = bytes(range(3 * 2 * 1))
    buf = b"P6 # a comment\n# another\n 2\t1 \n255\n" + raster
    w, h, s, e = _parse_ppm(buf, 0)
    assert (w, h) == (2, 1)
    assert buf[s:e] == raster


def test_ppm_parser_rejects_truncation_and_16bit():
    with pytest.raises(ValueError):
        _parse_ppm(b"P6\n4 4\n255\n" + b"\x00" * 5, 0)  # raster too short
    with pytest.raises(ValueError):
        _parse_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6, 0)


def test_wav_roundtrip_and_extra_chunk():
    buf = _encode_wav(8000, 10, seed=3)
    rate, samples = _parse_wav(buf)
    assert rate == 8000 and samples.size == 10
    assert samples.tolist() == [(7 * 3 + i) % 256 - 128 for i in range(10)]
    # splice a LIST chunk between fmt and data — chunk walking must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = buf[:fmt_end] + extra + buf[fmt_end:]
    rate2, samples2 = _parse_wav(spliced)
    assert rate2 == 8000 and samples2.tolist() == samples.tolist()


def test_wav_rejects_stereo_and_missing_data():
    buf = bytearray(_encode_wav(8000, 4, seed=0))
    buf[22:24] = (2).to_bytes(2, "little")  # channels = 2
    with pytest.raises(ValueError):
        _parse_wav(bytes(buf))
    with pytest.raises(ValueError):
        _parse_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_media_end_to_end(spark):
    docs = spark.range(12).selectExpr(
        "id AS doc_id", "'x' AS text", "CAST(1 AS INT) AS n_chars"
    )
    out = decode_media(synth_media_encoded(docs)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id) == 12
    for mid, r in by_id.items():
        expect_kind = ["image", "audio", "video"][mid % 3]
        assert r["kind"] == expect_kind  # detected from magic, not passed
        if expect_kind == "image":
            w, h, seed = 8 + mid % 8, 6 + mid % 6, mid % 256
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, 1)
            assert r["px_count"] == 3 * w * h
            assert r["px_sum"] == sum(
                (seed + i) % 256 for i in range(3 * w * h)
            )
        elif expect_kind == "audio":
            n, seed = 64 + mid % 64, mid % 256
            amps = [(7 * seed + i) % 256 - 128 for i in range(n)]
            assert r["sample_rate"] == 8000 and r["n_samples"] == n
            assert r["amp_sum"] == sum(amps)
            assert r["amp_sumsq"] == sum(a * a for a in amps)
        else:
            assert r["n_frames"] == 1 + mid % 3
            assert r["px_count"] == (1 + mid % 3) * 3 * r["width"] * r["height"]


def test_decode_media_unknown_magic_raises(spark):
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [(1, bytearray(b"GIF89a....."))], "media_id long, payload binary"
    )
    with pytest.raises((Py4JJavaError, Exception)):
        decode_media(bad).collect()


def test_ppm_parser_hypothesis_roundtrip():
    """Random dims/pixels through encode→parse, plus randomized header
    whitespace and comment injection — the parser must recover the
    exact raster regardless of header formatting."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 9),
        seed=st.integers(0, 255),
        ws=st.sampled_from([" ", "\n", "\t", "  \n"]),
        comment=st.booleans(),
    )
    def check(w, h, seed, ws, comment):
        px = bytes((seed + i) % 256 for i in range(3 * w * h))
        hdr = f"P6{ws}{w}{ws}{h}{ws}255\n"
        if comment:
            hdr = f"P6{ws}# c\n{w}{ws}{h}{ws}255\n"
        buf = hdr.encode() + px
        pw, ph, s, e = _parse_ppm(buf, 0)
        assert (pw, ph) == (w, h) and buf[s:e] == px

    check()


def test_render_literal_timestamp_roundtrip(spark):
    """Timestamp boundary literals must render to SQL text that casts
    back to the identical engine value (session-tz round trip)."""
    import datetime

    from pyspark.sql import functions as F

    from avocado_spark.operators.relational import _render_literal_sql

    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    sql = _render_literal_sql(ts, "timestamp")
    got = spark.range(1).select(
        (F.expr(sql) == F.lit(ts)).alias("eq")
    ).first()["eq"]
    assert got is True
