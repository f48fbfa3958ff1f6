"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` so each batch amortizes codec setup. The actual codecs
(PIL/ffmpeg/librosa) are NOT in this container, so ``decode_media``
raises NotImplementedError by design; ``fake_features`` is the
deterministic stand-in that keeps the Spark-side plumbing (schema,
batching, partitioning) real and testable.
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


def decode_media(media: DataFrame) -> DataFrame:
    """Real decode path — requires image/audio codecs not present in
    this environment. The operator contract (input/output schema,
    batch shape) is what downstream code builds against."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this container; "
        "use fake_features() for the deterministic stand-in"
    )


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
