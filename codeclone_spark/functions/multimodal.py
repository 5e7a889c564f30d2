"""Multimodal column plumbing: image / video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

Decode strategy (mirrors the audio pass in ``functions/audio.py``, which
decodes synthetic codecs for real):

- The SYNTHETIC container formats ``snpi`` (image) and ``snpv`` (video)
  are decoded FOR REAL: magic + header parse with limits, bounded zlib
  inflation (zip-bomb guard), shape validation, and genuine pixel math
  (luma, block-mean resize, perceptual hash) on the decoded arrays.
  Encoders live here too so tests and corpora can round-trip.
- External formats (png/jpeg/webp, h264/vp9/av1) are LIB-GATED: decoded
  through PIL / PyAV when importable, else the row gets
  ``error_kind='codec_unavailable'`` — never a task failure and never a
  fake result.  (This container ships neither library.)

Spark-side contract, identical to audio: fixed output schema, per-row
error channel, byte budget, and payloads consumed inside the batch loop —
binary never survives into shuffled columns.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_BLOB_BYTES = 64 * 1024 * 1024
MAX_DIM = 8192  # per-axis pixel bound (limits decoded size pre-inflate)
MAX_FRAMES = 100_000
_IMG_MAGIC = b"SNPi"
_VID_MAGIC = b"SNPv"

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


# ------------------------------------------------------ synthetic codecs --
def encode_snpi(rgb: np.ndarray) -> bytes:
    """``snpi`` container: magic | u16 w | u16 h | zlib(RGB u8 row-major)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return _IMG_MAGIC + struct.pack(">HH", w, h) + zlib.compress(rgb.tobytes(), 6)


def _bounded_inflate(data: bytes, expect: int) -> bytes:
    """Inflate exactly *expect* bytes; a payload that inflates past it is a
    bomb, short is truncation — both errors (audio.py's guard, applied to
    pixels)."""
    d = zlib.decompressobj()
    out = d.decompress(data, expect + 1)
    # unused_data: bytes past a COMPLETE stream (trailing garbage) — rejected
    # for parity with demux_snpv's "trailing garbage after last frame"
    if len(out) != expect or not d.eof or d.unconsumed_tail or d.unused_data:
        raise ValueError(f"inflated size != expected {expect}")
    return out


def decode_snpi(payload: bytes) -> np.ndarray:
    """REAL decode of the synthetic image container (parse-with-limits)."""
    if len(payload) < 8 or payload[:4] != _IMG_MAGIC:
        raise ValueError("bad magic")
    w, h = struct.unpack(">HH", payload[4:8])
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise ValueError(f"dims out of range {w}x{h}")
    raw = _bounded_inflate(payload[8:], w * h * 3)
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def luma(rgb: np.ndarray) -> np.ndarray:
    """Rec.601 luma on real pixel data."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def block_mean_resize(img: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Real area resize via block means (edge-padded to tile evenly)."""
    h, w = img.shape
    ph, pw = -h % out_h, -w % out_w
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    H, W = img.shape
    return img.reshape(out_h, H // out_h, out_w, W // out_w).mean(axis=(1, 3))


def phash_bits(img_luma: np.ndarray) -> str:
    small = block_mean_resize(img_luma)
    bits = (small > small.mean()).flatten()
    return "".join("1" if b else "0" for b in bits)


def _gated_pil_decode(payload: bytes):  # pragma: no cover - lib absent here
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise LookupError("codec_unavailable") from e
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


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
                    raw = bytes(payload)
                    if fmt == "snpi":
                        rgb = decode_snpi(raw)
                    elif fmt in ("png", "jpeg", "webp"):
                        rgb = _gated_pil_decode(raw)
                    else:
                        raise ValueError(f"unsupported format {fmt!r}")
                    ly = luma(rgb)
                    row["decode_ok"] = True
                    row["width"], row["height"] = rgb.shape[1], rgb.shape[0]
                    row["mean_luma"] = round(float(ly.mean()), 6)
                    row["phash"] = phash_bits(ly)
            except LookupError:
                row["error_kind"] = "codec_unavailable"
            except Exception as e:
                row["error_kind"] = row["error_kind"] or f"undecodable:{type(e).__name__}"
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


# ----------------------------------------------------------------- video --
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


def encode_snpv(frames_luma: np.ndarray, fps: int) -> bytes:
    """``snpv`` container: magic | u16 w | u16 h | u32 n_frames | u16 fps |
    then per frame: u32 compressed-length | zlib(luma u8).  The length
    index makes demux (count/locate frames) possible WITHOUT inflating
    every frame — only sampled frames are decoded downstream."""
    n, h, w = frames_luma.shape
    assert frames_luma.dtype == np.uint8
    head = _VID_MAGIC + struct.pack(">HHIH", w, h, n, fps)
    parts = [head]
    for i in range(n):
        blob = zlib.compress(frames_luma[i].tobytes(), 6)
        parts.append(struct.pack(">I", len(blob)) + blob)
    return b"".join(parts)


def demux_snpv(payload: bytes) -> tuple[int, int, int, float, list[tuple[int, int]]]:
    """REAL demux: header + frame index scan (offsets/lengths only — no
    pixel inflation).  Returns (w, h, n_frames, fps, [(offset, length)])."""
    if len(payload) < 14 or payload[:4] != _VID_MAGIC:
        raise ValueError("bad magic")
    w, h, n, fps = struct.unpack(">HHIH", payload[4:14])
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM and 0 < n <= MAX_FRAMES and fps > 0):
        raise ValueError("header out of range")
    idx, off = [], 14
    for _ in range(n):
        if off + 4 > len(payload):
            raise ValueError("truncated frame index")
        (ln,) = struct.unpack(">I", payload[off : off + 4])
        off += 4
        if off + ln > len(payload):
            raise ValueError("truncated frame data")
        idx.append((off, ln))
        off += ln
    if off != len(payload):
        raise ValueError("trailing garbage after last frame")
    return w, h, n, float(fps), idx


def decode_snpv_frame(
    payload: bytes, w: int, h: int, entry: tuple[int, int]
) -> np.ndarray:
    off, ln = entry
    raw = _bounded_inflate(payload[off : off + ln], w * h)
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


def frame_phash63(frame_luma: np.ndarray) -> int:
    """63-bit perceptual hash of one REAL decoded frame (8x8 block-mean
    threshold bits, top bit dropped to stay in a signed long)."""
    small = block_mean_resize(frame_luma.astype(np.float64))
    bits = (small > small.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val >> 1


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


def _gated_av_demux(payload: bytes):
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise LookupError("codec_unavailable") from e
    # PyAV importable but demux not wired yet: still the ENGINE's gap, not
    # the payload's — must surface as error_kind='codec_unavailable', never
    # as undecodable:* (the payload may be fine) nor as a task failure.
    raise LookupError("codec_unavailable: PyAV demux not wired")


def video_facts_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Input batch columns: item_id, payload (binary), codec.
    Output: VIDEO_FACTS_SCHEMA rows; payload consumed, never emitted
    (the drop-binary-before-shuffle rule, same as the audio/image passes).
    Only SAMPLED frames are inflated — demux reads the frame index."""
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
                    if codec == "snpv":
                        w, h, n_frames, fps, idx = demux_snpv(raw)
                        samples = sample_frame_indices(n_frames, fps)
                        hashes = [
                            frame_phash63(
                                decode_snpv_frame(raw, w, h, idx[i])
                            )
                            for i in samples
                        ]
                    elif codec in ("h264", "vp9", "av1"):
                        _gated_av_demux(raw)
                    else:
                        raise ValueError(f"unsupported codec {codec!r}")
                    row.update(
                        decode_ok=True,
                        n_frames=n_frames,
                        fps=fps,
                        duration_s=round(n_frames / fps, 3),
                        n_sampled=len(samples),
                        frame_hashes=hashes,
                    )
            except LookupError:
                row["error_kind"] = "codec_unavailable"
            except Exception as e:
                row["error_kind"] = row["error_kind"] or f"undecodable:{type(e).__name__}"
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)
