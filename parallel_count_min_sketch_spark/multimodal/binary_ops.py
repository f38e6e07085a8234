"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched kernels.

The decode/resize/frame-sample steps are STUBBED (the codec libraries are
not in this container): ``decode_image_stub`` raises NotImplementedError
unless ``fake=True``, in which case it produces a deterministic fake
"decoded" tensor summary derived from the bytes — so the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested end-to-end while the codec call is a drop-in replacement point.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..memtune import tune_allocator

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"GIF8": "gif",
}

META_SCHEMA = "byte_len BIGINT, sniffed_format STRING, sha1 STRING"


def binary_metadata(df: DataFrame, bin_col: str, *, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Typed metadata for a binary column — pure JVM (no decode): length,
    magic-byte format sniff, digest."""
    b = F.col(bin_col)
    head = F.substring(b, 1, 4)
    fmt = F.lit("unknown")
    for magic, name in MAGIC.items():
        prefix = F.lit(bytearray(magic))
        fmt = F.when(F.substring(b, 1, len(magic)) == F.substring(prefix, 1, len(magic)),
                     F.lit(name)).otherwise(fmt)
    return df.select(
        *keep_cols,
        F.octet_length(b).cast("bigint").alias("byte_len"),
        fmt.alias("sniffed_format"),
        F.sha1(b).alias("sha1"),
        head.alias("_head"),
    ).drop("_head")


def decode_image_stub(data: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode step placeholder. Real deployment: PIL/libvips/ffmpeg here.

    fake=True returns a deterministic 4x4x3 uint8 'thumbnail' derived from
    a digest of the bytes — stable across runs/executors, shaped like a
    real decode output so downstream feature code is exercised."""
    if not fake:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    digest = hashlib.sha256(data).digest()
    arr = np.frombuffer((digest * 2)[:48], dtype=np.uint8)
    return arr.reshape(4, 4, 3)


def extract_features(df: DataFrame, bin_col: str, id_col: str, *,
                     fake_decode: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction: (id, mean_intensity_bp,
    feat array<float>). The decode is the stub; the batching, schema and
    partition behavior are the real production shape."""
    out_schema = "id BIGINT, mean_intensity_bp BIGINT, feat ARRAY<FLOAT>"
    proj = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("data"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            means, feats = [], []
            for blob in blobs:
                img = decode_image_stub(blob or b"", fake=fake_decode)
                means.append(int(img.mean() * 100))
                feats.append(img.mean(axis=(0, 1)).astype(np.float32).tolist())
            yield pa.RecordBatch.from_pydict(
                {"id": ids, "mean_intensity_bp": means, "feat": feats},
                schema=pa.schema([
                    ("id", pa.int64()), ("mean_intensity_bp", pa.int64()),
                    ("feat", pa.list_(pa.float32())),
                ]),
            )

    return proj.mapInArrow(kernel, out_schema)
