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


def resize_stub(img: np.ndarray, h: int, w: int, *, fake: bool = False) -> np.ndarray:
    """Resize placeholder (real deployment: PIL/cv2 interpolation). The fake
    path is a deterministic nearest-neighbor index map — correct output
    shape/dtype, stable across executors."""
    if not fake:
        raise NotImplementedError(
            "image resize libs are not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def sample_frames(df: DataFrame, bin_col: str, id_col: str, *, n_frames: int = 4,
                  fake_decode: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: (id, frame_idx, frame_feat). One input
    row fans out to ``n_frames`` output rows — the real production shape
    (row-expanding Arrow kernel, list<float> features per frame). The
     'video decode' is the stub applied to deterministic byte slices; a real
    deployment swaps in ffmpeg keyframe extraction."""
    out_schema = "id BIGINT, frame_idx INT, frame_feat ARRAY<FLOAT>"
    proj = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("data"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            out_id, out_idx, out_feat = [], [], []
            for i, blob in zip(ids, blobs):
                blob = blob or b""
                # deterministic "frame" byte ranges (stand-in for keyframes)
                step = max(1, len(blob) // n_frames)
                for f in range(n_frames):
                    # final frame extends to the end so len%n_frames tail
                    # bytes are still covered by a frame
                    end = len(blob) if f == n_frames - 1 else (f + 1) * step
                    chunk = blob[f * step:end] or b"\x00"
                    img = decode_image_stub(chunk, fake=fake_decode)
                    thumb = resize_stub(img, 2, 2, fake=fake_decode)
                    out_id.append(i)
                    out_idx.append(f)
                    out_feat.append(thumb.mean(axis=(0, 1)).astype(np.float32).tolist())
            yield pa.RecordBatch.from_pydict(
                {"id": out_id, "frame_idx": out_idx, "frame_feat": out_feat},
                schema=pa.schema([
                    ("id", pa.int64()), ("frame_idx", pa.int32()),
                    ("frame_feat", pa.list_(pa.float32())),
                ]),
            )

    return proj.mapInArrow(kernel, out_schema)


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
