"""Multimodal column conventions (north-star extension).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each executor
processes whole record batches (the only sane shape at 100 TB — payload
bytes never transit the driver, and partition sizing bounds memory).

The actual image/audio codecs are NOT in this container, so the decode
step is stubbed: ``decode_stub`` raises NotImplementedError by contract,
and ``fake_feature_extract`` is the deterministic stand-in used by tests
to prove the Spark-side plumbing (schema, batch iteration, partitioning)
end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text table in the media convention (payload = utf-8 bytes).
    Stands in for image/audio ingestion in this container."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(media_df: DataFrame) -> DataFrame:
    """Contract for the real decoder (needs PIL/ffmpeg — not installed).

    Raises at *execution* time, per batch, so the plan still builds and
    the schema contract is checkable."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; use fake_feature_extract for plumbing tests"
        )
        yield  # pragma: no cover - makes this a generator

    out_schema = "media_id long, kind string, decoded binary"
    return media_df.mapInPandas(_decode, schema=out_schema)


FEATURE_DIM = 8


def fake_feature_extract(media_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic stand-in for embedding extraction: a tiny rolling
    hash of payload bytes per feature slot. Real Spark plumbing (Arrow
    batches via mapInPandas, schema contract), fake math."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                vec = [0] * dim
                for i, byte in enumerate(b):
                    vec[i % dim] = (vec[i % dim] * 31 + byte) % 1_000_003
                feats.append([float(v) for v in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media_df.mapInPandas(
        _extract, schema="media_id long, n_bytes long, features array<double>"
    )


def media_stats(media_df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: payload sizes + checksums (no decode)."""
    return media_df.select(
        "media_id",
        F.col("meta.kind").alias("kind"),
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


def frame_sample(
    media_df: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Frame sampling with real plumbing: treat the payload as a frame
    sequence (fixed ``frame_bytes`` stride — a real decoder would use
    container timestamps), emit every k-th frame as its own row.

    One input row → many output rows, the shape that matters at scale:
    ``mapInPandas`` lets the batch fan out without exploding driver or
    single-row memory, and the output inherits the input partitioning
    (no shuffle)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media_df.mapInPandas(
        _sample, schema="media_id long, frame_idx int, frame binary"
    )


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Contract for image resize (needs PIL — not installed): plan
    builds, schema is checkable, execution raises per batch."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires codecs not present in this environment"
        )
        yield  # pragma: no cover - makes this a generator

    return media_df.mapInPandas(
        _resize, schema="media_id long, payload binary, width int, height int"
    )
