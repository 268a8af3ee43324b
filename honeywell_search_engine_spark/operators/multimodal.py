"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The decode step is STUBBED (no image/audio libraries in this container —
see `_decode_image_stub`): it produces a deterministic fake "decode" so the
Spark-side plumbing — schema, batching, partition sizing, UDF signatures —
is real and tested. Swap the stub for PIL/libvips/ffmpeg on a real cluster.

Mirrors the reference's blob pipeline shape: MinIO bytes -> per-page
extract (reference worker/tasks.py:53-117) becomes binary column ->
mapInPandas feature extraction.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, crc int, "
    "feat array<float>, thumb_w int, thumb_h int"
)


def synthesize_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payloads + typed metadata) —
    stands in for an Iceberg table with image/audio columns."""

    def gen(batches):
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                rng = np.random.default_rng(
                    int.from_bytes(hashlib.sha256(f"media:{i}".encode()).digest()[:8], "little")
                )
                kind = ["image", "audio", "video"][i % 3]
                payload = rng.integers(0, 256, size=256 + (i % 512), dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": 64 + (i % 16) * 8 if kind != "audio" else 0,
                        "height": 48 + (i % 12) * 8 if kind != "audio" else 0,
                        "sample_rate": 16000 if kind == "audio" else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real deployment decodes payload via PIL/turbojpeg and
    resizes. Here: deterministic pseudo-pixels from the payload bytes so
    downstream feature math is real and testable.

    raise NotImplementedError to fail loudly if someone expects real
    decoding semantics: set STRICT_DECODE=True."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    n = max(width * height, 1)
    reps = int(np.ceil(n / arr.size))
    return np.tile(arr, reps)[:n].reshape(max(height, 1), max(width, 1))


STRICT_DECODE = False


def extract_features(media: DataFrame, thumb: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media columns:
    size/crc + a `thumb x thumb` mean-pooled "thumbnail" feature vector.
    The batch shape (Arrow columns of binary) is exactly what a real
    decode kernel would see."""

    def extract(batches):
        for b in batches:
            out = []
            for _, row in b.iterrows():
                payload = bytes(row["payload"])
                if STRICT_DECODE:
                    raise NotImplementedError(
                        "real media decode not available in this environment"
                    )
                feat: list[float]
                tw = th = 0
                if row["kind"] in ("image", "video") and row["width"]:
                    img = _decode_image_stub(payload, row["width"], row["height"])
                    h, w = img.shape
                    bh, bw = max(h // thumb, 1), max(w // thumb, 1)
                    pooled = img[: bh * thumb, : bw * thumb].reshape(
                        thumb, bh, thumb, bw
                    ).mean(axis=(1, 3))
                    feat = [float(x) for x in pooled.ravel()]
                    tw = th = thumb
                else:  # audio: frame-sample the byte stream
                    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                    step = max(arr.size // 16, 1)
                    feat = [float(x) for x in arr[::step][:16]]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload),
                        "crc": zlib.crc32(payload) & 0x7FFFFFFF,
                        "feat": feat,
                        "thumb_w": tw,
                        "thumb_h": th,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
