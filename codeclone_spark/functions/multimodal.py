"""Multimodal column plumbing: image / video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The sandbox has no image/video libraries, so the decode kernels are
STUBBED (deterministic fakes clearly marked below) per the build spec —
but the Spark-side contract is real and tested: schema, batch shape,
error-row discipline (never fail a task on one bad payload), byte budget,
and the drop-binary-before-shuffle rule, identical to the audio pass in
``functions/audio.py``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAX_BLOB_BYTES = 64 * 1024 * 1024

IMAGE_FACTS_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("format", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("error_kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("phash", StringType()),
    ]
)


def _fake_decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """DETERMINISTIC FAKE decode (no image libs in this container).

    Real deployment: swap for PIL/libvips inside the same batch loop.
    The fake derives a stable 8x8 'image' from the payload hash so the
    downstream feature math (resize, luma, phash) is exercised for real.
    """
    if fmt not in ("png", "jpeg", "webp"):
        raise ValueError(f"unsupported format {fmt!r}")
    if len(payload) < 8:
        raise ValueError("payload too short")
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).astype(np.float64)
    return arr.reshape(8, 8)


def image_facts_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Input batch columns: item_id, payload (binary), format.
    Output: IMAGE_FACTS_SCHEMA rows; payload consumed, never emitted."""
    for pdf in batches:
        out = {c.name: [] for c in IMAGE_FACTS_SCHEMA.fields}
        for item_id, payload, fmt in zip(
            pdf["item_id"], pdf["payload"], pdf["format"]
        ):
            row = {
                "item_id": item_id,
                "format": fmt,
                "decode_ok": False,
                "error_kind": None,
                "width": None,
                "height": None,
                "mean_luma": None,
                "phash": None,
            }
            try:
                if payload is None:
                    raise ValueError("null payload")
                if len(payload) > MAX_BLOB_BYTES:
                    row["error_kind"] = "blob_too_large"
                else:
                    img = _fake_decode_image(bytes(payload), fmt)
                    row["decode_ok"] = True
                    row["width"], row["height"] = img.shape[1], img.shape[0]
                    row["mean_luma"] = float(img.mean())
                    bits = (img > img.mean()).flatten()
                    row["phash"] = "".join("1" if b else "0" for b in bits)
            except Exception as e:
                row["error_kind"] = row["error_kind"] or f"undecodable:{type(e).__name__}"
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


# ----------------------------------------------------------------- video --
from pyspark.sql.types import ArrayType, LongType  # noqa: E402

VIDEO_FACTS_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("codec", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("error_kind", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("duration_s", DoubleType()),
        StructField("n_sampled", IntegerType()),
        # stable per-sampled-frame content hashes (dedup / similarity keys)
        StructField("frame_hashes", ArrayType(LongType())),
    ]
)


def _fake_demux_video(payload: bytes, codec: str) -> tuple[int, float]:
    """DETERMINISTIC FAKE demux (no video libs in this container).

    Real deployment: swap for PyAV/ffmpeg inside the same batch loop.
    Derives (n_frames, fps) from the payload hash so the frame-sampling
    policy and hash math downstream are exercised for real."""
    if codec not in ("h264", "vp9", "av1"):
        raise ValueError(f"unsupported codec {codec!r}")
    if len(payload) < 16:
        raise ValueError("payload too short")
    h = hashlib.sha256(payload).digest()
    n_frames = 24 + h[0] % 240  # 24..263 frames
    fps = float(24 + h[1] % 8)  # 24..31 fps
    return n_frames, fps


def _fake_frame_hash(payload: bytes, frame_idx: int) -> int:
    """Stable 63-bit per-frame content hash (real path: decode the frame,
    downscale, perceptual-hash — same signature)."""
    h = hashlib.sha256(payload + frame_idx.to_bytes(4, "big")).digest()
    return int.from_bytes(h[:8], "big") >> 1


def sample_frame_indices(n_frames: int, fps: float, every_s: float = 1.0,
                         max_frames: int = 16) -> list[int]:
    """Frame-sampling policy: one frame per *every_s* seconds, capped at
    *max_frames* (uniform re-spacing when the cap binds) — the cap is the
    usual caps-as-backpressure discipline (a 10-hour video must not emit
    36k frames)."""
    step = max(int(round(fps * every_s)), 1)
    idxs = list(range(0, n_frames, step))
    if len(idxs) > max_frames:
        stride = len(idxs) / max_frames
        idxs = [idxs[int(i * stride)] for i in range(max_frames)]
    return idxs


def video_facts_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Input batch columns: item_id, payload (binary), codec.
    Output: VIDEO_FACTS_SCHEMA rows; payload consumed, never emitted
    (the drop-binary-before-shuffle rule, same as the audio/image passes)."""
    for pdf in batches:
        out = {c.name: [] for c in VIDEO_FACTS_SCHEMA.fields}
        for item_id, payload, codec in zip(
            pdf["item_id"], pdf["payload"], pdf["codec"]
        ):
            row = {
                "item_id": item_id,
                "codec": codec,
                "decode_ok": False,
                "error_kind": None,
                "n_frames": None,
                "fps": None,
                "duration_s": None,
                "n_sampled": None,
                "frame_hashes": None,
            }
            try:
                if payload is None:
                    raise ValueError("null payload")
                if len(payload) > MAX_BLOB_BYTES:
                    row["error_kind"] = "blob_too_large"
                else:
                    raw = bytes(payload)
                    n_frames, fps = _fake_demux_video(raw, codec)
                    idxs = sample_frame_indices(n_frames, fps)
                    row.update(
                        decode_ok=True,
                        n_frames=n_frames,
                        fps=fps,
                        duration_s=round(n_frames / fps, 3),
                        n_sampled=len(idxs),
                        frame_hashes=[_fake_frame_hash(raw, i) for i in idxs],
                    )
            except Exception as e:
                row["error_kind"] = row["error_kind"] or f"undecodable:{type(e).__name__}"
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)
