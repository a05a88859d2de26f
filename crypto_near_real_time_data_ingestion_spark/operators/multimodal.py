"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs; decode / feature-extraction runs as Arrow-batched pandas UDFs
over ``mapInPandas``. The container ships no imaging/audio libraries, so
the decode step is STUBBED (deterministic fake features derived from the
bytes, or ``NotImplementedError`` for the real-codec path) — the
Spark-side plumbing that matters at scale (schema, batch shape,
partitioning, UDF signatures) is real and tested.

Scale notes: binary payloads dominate row size — ``maxRecordsPerBatch``
is lowered on this path so Arrow batches stay ~tens of MB; partitioning
by (media_type, bucket(id)) keeps decode fan-out even; metadata-only
queries never touch the binary column (column pruning confirmed in the
scan's ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum32", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("fake_n_frames", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary payloads from the documents table (test stand-in
    for real image/audio blobs): payload = utf-8 bytes of text."""
    return docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - real path
    """Real-codec decode path — requires imaging/audio libs absent here."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/torchaudio; this container ships "
        "none. Use extract_media_features (deterministic fake) instead."
    )


def _features_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .ann import _round6_half_away

    for pdf in it:
        if len(pdf) == 0:
            continue
        n_rows = len(pdf)
        payloads = pdf["payload"].tolist()
        lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n_rows)
        # whole-batch byte histogram: concatenate payloads once, bincount
        # on (row << 8 | byte) — every per-payload feature below derives
        # from the (n_rows × 256) histogram; no per-row Python loop
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        hist = np.bincount(
            row_of * 256 + flat, minlength=n_rows * 256
        ).reshape(n_rows, 256)
        byte_vals = np.arange(256, dtype=np.int64)
        checksum = (hist * byte_vals).sum(axis=1) & 0xFFFFFFFF
        # round(·,6) half-away: numpy's pairwise sum and the oracle's
        # sequential list_sum differ at last-ulp only — 6-decimal
        # rounding is the cross-engine-stable contract (entropy is
        # not decimal-boundary-massed)
        p = hist / np.maximum(lens, 1)[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            plogp = np.where(hist > 0, p * np.log2(p), 0.0)
        entropy = np.where(lens > 0, _round6_half_away(-plogp.sum(axis=1)), 0.0)
        mtype = pdf["media_type"].to_numpy()
        # deterministic fake decode metadata (stub for PIL/ffmpeg)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].to_numpy(),
                "media_type": mtype,
                "n_bytes": lens,
                "checksum32": checksum,
                "fake_width": (320 + checksum % 1600).astype(np.int32),
                "fake_height": (240 + (checksum >> 8) % 900).astype(np.int32),
                "fake_n_frames": np.where(
                    mtype == "video", 24 + checksum % 240, 1
                ).astype(np.int32),
                "byte_entropy": entropy,
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (stubbed
    decode). Repartitions by a hash bucket so decode cost spreads evenly
    regardless of payload-size skew in the source layout."""
    return (
        media.repartition(F.pmod(F.hash("media_id"), F.lit(32)))
        .mapInPandas(_features_udf, schema=FEATURES_SCHEMA)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing (images): Arrow-batched mapInPandas with a binary
    output column — the shape a real PIL/libvips resize takes at scale
    (decode → resample → re-encode per batch). The resample itself is a
    deterministic stub (payload truncated/tiled to width·height bytes —
    a stand-in for the real codec, absent in this container); schema,
    batch flow, and output sizing are real."""
    target = width * height

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                b = np.frombuffer(payload, dtype=np.uint8)
                out = (
                    np.tile(b, target // max(len(b), 1) + 1)[:target]
                    if len(b)
                    else np.zeros(target, dtype=np.uint8)
                )
                rows.append((mid, mtype, width, height, out.tobytes(), target))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        fn, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 8, frame_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing (video): one input row → many output rows
    (every ``every_n``-th frame), the 1:N batch shape a real ffmpeg
    frame extractor produces. Frames are deterministic byte slices of the
    payload (codec stub); the row-explosion shape, per-frame binary
    column, and downstream partitioning are real."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n_frames = max(len(b) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    chunk = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    rows.append((mid, fi, chunk.tobytes(), len(chunk)))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )


# DuckDB oracle for the stubbed feature extractor: every feature is
# deterministic byte math over encode(text) — checksum (byte sum mod
# 2^32), byte-histogram Shannon entropy (round 6, see _features_udf
# note), and the fake decode dims derived from the checksum. Bytes are
# recovered from hex(encode(text)) pairs (DuckDB blobs have no direct
# byte indexing).
MEDIA_FEATURES_ORACLE_SQL = """
WITH m AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           hex(encode(text)) AS hx,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE text IS NOT NULL
),
b AS (
    SELECT media_id, n_bytes,
           unnest(list_transform(range(0, n_bytes),
               i -> (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
                  + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1)) AS byte
    FROM m
),
cs AS (
    SELECT media_id, CAST(sum(byte) % 4294967296 AS BIGINT) AS checksum32
    FROM b GROUP BY 1
),
ent AS (
    SELECT media_id,
           round(-list_sum(list_transform(probs, p -> p * log2(p))), 6) AS byte_entropy
    FROM (
        SELECT media_id, list(c ORDER BY byte) AS probs
        FROM (
            SELECT media_id, byte,
                   CAST(count(*) AS DOUBLE) / any_value(n_bytes) AS c
            FROM b GROUP BY media_id, byte
        ) GROUP BY media_id
    )
)
SELECT m.media_id, m.media_type, m.n_bytes, cs.checksum32,
       CAST(320 + cs.checksum32 % 1600 AS INTEGER) AS fake_width,
       CAST(240 + (cs.checksum32 // 256) % 900 AS INTEGER) AS fake_height,
       CAST(CASE WHEN m.media_type <> 'video' THEN 1
            ELSE 24 + cs.checksum32 % 240 END AS INTEGER) AS fake_n_frames,
       ent.byte_entropy
FROM m
JOIN cs USING (media_id)
JOIN ent USING (media_id)
"""
