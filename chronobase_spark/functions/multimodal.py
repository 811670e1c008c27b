"""Multimodal column handling: image/audio/video as opaque binary
payloads with typed metadata (SURVEY.md §2.4).

This mirrors the reference's data model — its ``Row.Data []byte`` is an
opaque payload the engine carries untouched (reference
internal/storage/row.go:9) — lifted to a typed Spark schema:

    payload: binary, meta: struct<media_type, n_bytes, ...>

The Spark-side plumbing (schema, partition-preserving mapInPandas,
Arrow batch shape) is real and tested, and so is the image decode:
``decode_ppm`` parses binary PPM (P6) payloads with a pure-Python
header tokenizer + numpy raster math and emits real pixel statistics.
Compressed codecs (JPEG / PCM audio / video containers) would slot in
at the same ``_decode_bytes`` boundary but their libraries are not in
this container, so ``decode_stub`` keeps that path exercisable with
deterministic byte math. Per-batch vectorized processing via
mapInPandas keeps the hot path Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
    """Deterministic byte-math 'decode' for payloads whose real codec
    (JPEG / PCM / video) is not present in this container — the real
    decoder slots in at exactly this boundary (see ``_decode_ppm_bytes``
    for the PPM one that IS real). Derives the same feature shape from
    the raw bytes so the pipeline stays fully exercisable."""
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
            # NULL payload/meta (e.g. a NULL source document) -> NULL
            # features, SQL-style; bytes(None) would crash the worker.
            feats = [
                None if p is None else _decode_bytes(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [
                        None if m is None else m["media_type"] for m in pdf["meta"]
                    ],
                    "n_bytes": [
                        None
                        if m is None or m["n_bytes"] is None
                        else int(m["n_bytes"])
                        for m in pdf["meta"]
                    ],
                    "n_frames": [None if f is None else f["n_frames"] for f in feats],
                    "checksum": [None if f is None else f["checksum"] for f in feats],
                }
            )

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)


PPM_WIDTH = 16  # fixture image width (pixels); 48 payload bytes per row

PPM_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def to_ppm_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = PPM_WIDTH
) -> DataFrame:
    """Encode each document as a REAL binary PPM (P6) image whose raster
    is the document's bytes, zero-padded to ``width`` × height × 3 —
    built entirely JVM-side (encode/concat/repeat, no Python). The
    payload is a spec-valid netpbm file any external PPM reader can
    open; height varies per document, exercising real header parsing
    downstream instead of fixed-shape assumptions."""
    data = F.encode(F.col(text_col), "UTF-8")
    n = F.length(data)
    h = F.greatest(F.ceil(n / F.lit(float(width * 3))).cast("int"), F.lit(1))
    pad = (h * width * 3 - n).cast("int")
    header = F.concat(
        F.lit(f"P6\n{width} "), h.cast("string"), F.lit("\n255\n")
    )
    payload = F.concat(
        F.encode(header, "UTF-8"),
        data,
        F.encode(F.repeat(F.lit("\x00"), pad), "UTF-8"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _parse_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (P6) header per the netpbm spec — magic, then
    three whitespace-separated decimal tokens (width, height, maxval)
    with ``#``-to-EOL comments allowed between tokens, then exactly one
    whitespace byte before the raster. Returns (width, height, maxval,
    raster)."""
    if buf[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {buf[:2]!r})")
    vals: list[int] = []
    idx = 2
    while len(vals) < 3:
        while idx < len(buf) and buf[idx : idx + 1].isspace():
            idx += 1
        if buf[idx : idx + 1] == b"#":
            while idx < len(buf) and buf[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(buf) and not buf[idx : idx + 1].isspace():
            idx += 1
        if idx == start:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[start:idx]))
    idx += 1  # the single whitespace byte that terminates the header
    w, h, maxval = vals
    raster = buf[idx : idx + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(f"raster short: want {w * h * 3}, have {len(raster)}")
    return w, h, maxval, raster


def _decode_ppm_bytes(buf: bytes) -> dict:
    """Real image decode: PPM header parse + numpy channel statistics.
    Channel SUMS (not means) keep the features integer-exact, so the
    SQL oracle can reproduce them without float-rounding hazards."""
    w, h, _maxval, raster = _parse_ppm(buf)
    px = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3)
    sums = px.sum(axis=0, dtype=np.int64)
    return {
        "width": w,
        "height": h,
        "r_sum": int(sums[0]),
        "g_sum": int(sums[1]),
        "b_sum": int(sums[2]),
    }


def decode_ppm(payloads: DataFrame) -> DataFrame:
    """Vectorized REAL image decode over payload batches via
    mapInPandas — Arrow-batched, partition-preserving (no shuffle). At
    100 TB of media the payload bytes never leave the executor that
    read them; only the fixed-width feature rows flow on."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload/meta -> NULL feature row (SQL semantics);
            # bytes(None) would crash the Arrow worker.
            feats = [
                None if p is None else _decode_ppm_bytes(bytes(p))
                for p in pdf["payload"]
            ]

            def col(k):
                return [None if f is None else f[k] for f in feats]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [
                        None if m is None else m["media_type"] for m in pdf["meta"]
                    ],
                    "n_bytes": [
                        None
                        if m is None or m["n_bytes"] is None
                        else int(m["n_bytes"])
                        for m in pdf["meta"]
                    ],
                    "width": col("width"),
                    "height": col("height"),
                    "r_sum": col("r_sum"),
                    "g_sum": col("g_sum"),
                    "b_sum": col("b_sum"),
                }
            )

    return payloads.mapInPandas(extract, PPM_FEATURE_SCHEMA)


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
            # NULL payload -> NULL payload + NULL meta (SQL semantics).
            out = [
                None if p is None else bytes(bytes(p)[::scale_denom])
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        None
                        if b is None or m is None
                        else {
                            "media_type": m["media_type"],
                            "n_bytes": len(b),
                            "scale_denom": scale_denom,
                        }
                        for m, b in zip(pdf["meta"], out)
                    ],
                }
            )

    return payloads.mapInPandas(resize, RESIZED_SCHEMA)
