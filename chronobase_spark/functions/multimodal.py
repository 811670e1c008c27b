"""Multimodal column handling: image/audio/video as opaque binary
payloads with typed metadata (SURVEY.md §2.4).

This mirrors the reference's data model — its ``Row.Data []byte`` is an
opaque payload the engine carries untouched (reference
internal/storage/row.go:9) — lifted to a typed Spark schema:

    payload: binary, meta: struct<media_type, n_bytes, ...>

The Spark-side plumbing (schema, partition-preserving mapInPandas,
Arrow batch shape) is real and tested; the actual codec step is stubbed
behind ``decode_stub`` because image/audio libraries are not available
in this environment — swap `_decode_bytes` for a real decoder (PIL /
torchaudio / pyav) in production. Per-batch vectorized processing via
mapInPandas keeps the hot path Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def to_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct —
    the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_bytes(buf: bytes) -> dict:
    """STUB decode. A real implementation would parse the container
    (image header / audio frames) here; this deterministic fake derives
    the same feature shape from the raw bytes so the pipeline is fully
    exercisable without codec libraries."""
    n = len(buf)
    checksum = 0
    for b in buf[:128]:
        checksum = (checksum * 31 + b) % 2147483647
    return {"n_frames": n // 100 + 1, "checksum": checksum}


def decode_stub(payloads: DataFrame) -> DataFrame:
    """Vectorized 'decode / feature-extract' over payload batches via
    mapInPandas — Arrow-batched, partition-preserving (no shuffle).

    Raises nothing here; a production decoder that *cannot* run in this
    container should raise NotImplementedError at the `_decode_bytes`
    boundary instead of silently passing.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_bytes(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "n_frames": [f["n_frames"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(payloads: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """'Frame sampling' plumbing: explode each payload into frame-offset
    rows (deterministic byte-offset fake of video frame extraction).
    Native explode over a sequence — demonstrates the fan-out shape a
    real frame sampler would produce, with no Python in the loop."""
    n_frames = (F.length("payload").cast("long") / every_n_bytes).cast("int") + 1
    return payloads.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        (F.col("meta.n_bytes")).alias("n_bytes"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("media_type", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("scale_denom", IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_stub(payloads: DataFrame, scale_denom: int = 4) -> DataFrame:
    """STUB 'resize/downsample': keep every ``scale_denom``-th payload
    byte (a real implementation decodes, resamples pixels/PCM, and
    re-encodes at this exact boundary — same in/out schema). The output
    is the multimodal row shape again, so resize composes with
    ``decode_stub``/``frame_sample`` downstream. mapInPandas keeps the
    transform Arrow-batched and partition-preserving — at 100 TB of
    media the bytes never leave the executor that read them."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(bytes(p)[::scale_denom]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        {
                            "media_type": m["media_type"],
                            "n_bytes": len(b),
                            "scale_denom": scale_denom,
                        }
                        for m, b in zip(pdf["meta"], out)
                    ],
                }
            )

    return payloads.mapInPandas(resize, RESIZED_SCHEMA)
