"""Deterministic synthetic clips + fixtures generator (no external data).

This is the engine's primary correctness corpus (FIXTURES.md §1-2): an
audio-clip + transcript table shaped exactly like ``BASELINE.json``
``input_hint`` with violations planted at exact recorded rates, plus a
``fixtures_ref`` side table carrying the canonical PCM oracle.

Everything is derived from a fixed seed via ``np.random.SeedSequence`` —
no wall clock, no randomness outside numpy — so two runs produce
byte-identical parquet (golden-test discipline copied from the reference's
``tests/test_detector_golden.py:50-71`` fixture approach).

Codecs: the sandbox has no flac/mp3/vorbis libraries, so per FIXTURES.md §1
("subset OK if a codec lib is unavailable") the non-PCM codecs are
DETERMINISTIC STAND-INS implemented with numpy+zlib.  The per-codec dispatch,
magic-byte validation, error-row discipline, and batch plumbing in the Spark
decode UDF are real; only the bitstream format is fake:

- ``pcm_s16le``: raw little-endian int16 samples (real).
- ``flac``:   ``b"fLaC"`` + zlib-compressed int16 LE (lossless stand-in).
- ``vorbis``: ``b"OggS"`` + zlib(int16 LE XOR 0x5A)   (lossless stand-in).
- ``mp3``:    ``b"ID3\\x04"`` + 8-bit requantized samples (LOSSY stand-in,
              ~39 dB SNR -> passes the >=30 dB gate like a good encode).

Durations are kept short (<=~1 s) so the sandbox fits; the engine's
byte-budget logic (MAX_CLIP_BYTES, batch sizing) is exercised regardless.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

SYNTH_VERSION = "2.0"  # 2.0: fixtures split into meta + partitioned PCM blobs
DEFAULT_SEED = 42

CODECS = ("pcm_s16le", "flac", "mp3", "vorbis")
CODEC_PROBS = (0.75, 0.10, 0.10, 0.05)  # heavy skew on pcm_s16le (FIXTURES)
SR_VALUES = (16000, 8000, 22050, 44100, 48000)
SR_PROBS = (0.72, 0.07, 0.07, 0.07, 0.07)  # >=70% mass on 16000 (skew tests)

# Planted-violation rates (FIXTURES.md §1); exact counts recorded in manifest.
RATES = {
    "dup_clip_id": 0.002,
    "undecodable": 0.001,
    "low_snr": 0.001,
    "sr_mismatch": 0.001,
    "dur_mismatch": 0.001,
    "dur_null": 0.001,
    "transcript_null": 0.002,
    "transcript_mismatch": 0.002,
    "fixture_missing": 0.05,
}

PROFILES: dict[str, dict[str, Any]] = {
    "tiny": {"n": 2000, "buckets": 4, "dur_lo": 200, "dur_hi": 800},
    "small": {"n": 20000, "buckets": 8, "dur_lo": 200, "dur_hi": 800},
    "bench": {"n": 60000, "buckets": 8, "dur_lo": 200, "dur_hi": 600},
}

_VOCAB = (
    "the quick brown fox jumps over lazy dog river stone cloud light "
    "sound wave signal audio clip sample rate frame noise tone pitch "
    "echo delay room voice speech word data table row check valid "
    "north south east west zero one two three four five six seven"
).split()

LOSSLESS_SNR_DB = 999.0  # sentinel for exact reconstruction


# ---------------------------------------------------------------- codecs --
def encode_pcm(codec: str, pcm_i16: np.ndarray) -> bytes:
    raw = pcm_i16.astype("<i2").tobytes()
    if codec == "pcm_s16le":
        return raw
    if codec == "flac":
        return b"fLaC" + zlib.compress(raw, 6)
    if codec == "vorbis":
        obf = (np.frombuffer(raw, dtype=np.uint8) ^ 0x5A).tobytes()
        return b"OggS" + zlib.compress(obf, 6)
    if codec == "mp3":
        u8 = ((pcm_i16.astype(np.int32) + 32768) >> 8).astype(np.uint8)
        return b"ID3\x04" + u8.tobytes()
    raise ValueError(f"unknown codec {codec!r}")


# Decompression bound: a <=MAX_CLIP_BYTES compressed payload must never
# inflate past the largest legal decoded clip (zip-bomb guard — unbounded
# zlib.decompress would defeat audio.py's task-memory ceiling).  48 kHz *
# 60 s * int16 = ~5.8 MB; 64 MiB leaves generous slack while still turning
# a multi-GB bomb into an error row.
MAX_DECODED_BYTES = 64 * 1024 * 1024


def _bounded_decompress(data: bytes) -> bytes:
    d = zlib.decompressobj()
    out = d.decompress(data, MAX_DECODED_BYTES)
    if d.unconsumed_tail or not d.eof:
        raise ValueError(
            f"compressed payload inflates past {MAX_DECODED_BYTES} bytes"
        )
    return out


def decode_pcm(codec: str, payload: bytes) -> np.ndarray:
    """Inverse of :func:`encode_pcm`. Raises on malformed payloads —
    callers convert exceptions into error rows, never task failures
    (reference worker error-row discipline, core/worker.py:46-94)."""
    if codec == "pcm_s16le":
        if len(payload) % 2:
            raise ValueError("pcm_s16le payload has odd length")
        return np.frombuffer(payload, dtype="<i2")
    if codec == "flac":
        if payload[:4] != b"fLaC":
            raise ValueError("bad flac magic")
        raw = _bounded_decompress(payload[4:])
        if len(raw) % 2:
            raise ValueError("flac payload has odd length")
        return np.frombuffer(raw, dtype="<i2")
    if codec == "vorbis":
        if payload[:4] != b"OggS":
            raise ValueError("bad vorbis magic")
        obf = _bounded_decompress(payload[4:])
        raw = (np.frombuffer(obf, dtype=np.uint8) ^ 0x5A).tobytes()
        if len(raw) % 2:
            raise ValueError("vorbis payload has odd length")
        return np.frombuffer(raw, dtype="<i2")
    if codec == "mp3":
        if payload[:4] != b"ID3\x04":
            raise ValueError("bad mp3 magic")
        u8 = np.frombuffer(payload[4:], dtype=np.uint8)
        return ((u8.astype(np.int32) << 8) - 32768 + 128).astype(np.int16)
    raise ValueError(f"unknown codec {codec!r}")


def pcm_sha256(pcm_i16: np.ndarray) -> str:
    """Canonical-PCM content hash (int16 LE bytes) — the analog of the
    reference's SHA-1 CFG fingerprint (analysis/fingerprint.py:22-23)."""
    return hashlib.sha256(pcm_i16.astype("<i2").tobytes()).hexdigest()


# ------------------------------------------------------------- synthesis --
def _synth_pcm(rng: np.random.Generator, sr: int, n_samples: int) -> np.ndarray:
    """Seeded sine-mix + noise, int16."""
    t = np.arange(n_samples, dtype=np.float64) / sr
    x = np.zeros(n_samples, dtype=np.float64)
    f_hi = min(3500.0, sr * 0.4)
    for _ in range(3):
        f = rng.uniform(100.0, f_hi)
        a = rng.uniform(0.08, 0.25)
        ph = rng.uniform(0.0, 2 * np.pi)
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0.0, 0.01, n_samples)
    np.clip(x, -0.97, 0.97, out=x)
    return np.round(x * 32767.0).astype(np.int16)


def _add_noise_at_snr(
    rng: np.random.Generator, pcm: np.ndarray, snr_db: float
) -> np.ndarray:
    sig_pow = float(np.mean(pcm.astype(np.float64) ** 2)) or 1.0
    noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
    noise = rng.normal(0.0, np.sqrt(noise_pow), pcm.shape[0])
    return np.clip(pcm.astype(np.float64) + noise, -32768, 32767).astype(np.int16)


def _transcript(rng: np.random.Generator, dur_ms: int) -> str:
    n_words = max(2, int(rng.poisson(max(1.0, dur_ms / 200.0))) + 2)
    idx = rng.integers(0, len(_VOCAB), n_words)
    return " ".join(_VOCAB[i] for i in idx)


def _bucket(clip_id: str, buckets: int) -> int:
    # Stable across processes (not Python's salted hash()).
    return int(hashlib.sha1(clip_id.encode()).hexdigest()[:8], 16) % buckets


def _plant_sets(rng: np.random.Generator, n: int) -> dict[str, np.ndarray]:
    """Disjoint index sets per plant type, drawn from one permutation so
    each row carries at most one planted defect."""
    perm = rng.permutation(n)
    out: dict[str, np.ndarray] = {}
    pos = 0
    for name, rate in RATES.items():
        k = max(1, round(n * rate))
        out[name] = np.sort(perm[pos : pos + k])
        pos += k
    if pos > n:
        raise ValueError("plant rates exceed row count")
    return out


# ------------------------------------------------------------ generation --
def generate(
    out_dir: str,
    profile: str = "tiny",
    seed: int = DEFAULT_SEED,
    n_rows: int | None = None,
    force: bool = False,
) -> dict[str, Any]:
    """Generate ``clips/`` (hive-partitioned by ``part``) and
    ``fixtures_ref.parquet`` plus ``manifest.json`` under *out_dir*.
    Idempotent: if a manifest with matching (version, seed, profile, n)
    exists, generation is skipped and the manifest returned."""
    cfg = dict(PROFILES[profile])
    if n_rows is not None:
        cfg["n"] = int(n_rows)
    n = int(cfg["n"])
    buckets = int(cfg["buckets"])

    manifest_path = os.path.join(out_dir, "manifest.json")
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if (
            m.get("synth_version") == SYNTH_VERSION
            and m.get("seed") == seed
            and m.get("n_base_rows") == n
            and m.get("profile") == profile
        ):
            return m

    root = np.random.SeedSequence(seed)
    plant_rng = np.random.default_rng(root.spawn(1)[0])
    plants = _plant_sets(plant_rng, n)
    in_set = {k: set(v.tolist()) for k, v in plants.items()}

    # Driver-level categorical draws, vectorized.
    cat_rng = np.random.default_rng(root.spawn(2)[0])
    codec_idx = cat_rng.choice(len(CODECS), size=n, p=CODEC_PROBS)
    sr_idx = cat_rng.choice(len(SR_VALUES), size=n, p=SR_PROBS)
    dur_lo, dur_hi = cfg["dur_lo"], cfg["dur_hi"]
    mu = np.log((dur_lo + dur_hi) / 2.5)
    durs = np.clip(
        np.round(cat_rng.lognormal(mu, 0.35, n)).astype(np.int64), dur_lo, dur_hi
    ).astype(np.int32)

    clip_ids: list[str] = []
    payloads: list[bytes | None] = []
    srs: list[int | None] = []
    dur_col: list[int | None] = []
    codecs_col: list[str] = []
    transcripts: list[str | None] = []
    parts: list[str] = []

    fx_ids: list[str] = []
    fx_sha: list[str] = []
    fx_pcm: list[bytes] = []
    fx_tr: list[str] = []
    fx_dur: list[int] = []
    fx_part: list[str] = []

    dup_rows: list[tuple] = []

    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence(seed, spawn_key=(3, i)))
        clip_id = f"clip-{i:08d}"
        codec = CODECS[codec_idx[i]]
        sr = int(SR_VALUES[sr_idx[i]])
        dur = int(durs[i])

        actual_sr = sr
        n_samples = int(round(sr * dur / 1000.0))
        if i in in_set["sr_mismatch"]:
            actual_sr = sr // 2 if sr > 8000 else sr * 2
            n_samples = int(round(actual_sr * dur / 1000.0))
        elif i in in_set["dur_mismatch"]:
            n_samples = int(round(sr * dur / 1000.0 * (0.8 if i % 2 else 1.25)))

        pcm = _synth_pcm(rng, actual_sr, n_samples)
        transcript = _transcript(rng, dur)

        part = f"{codec}-b{_bucket(clip_id, buckets):02d}"

        # Fixture carries the canonical truth (pre-plant PCM + transcript).
        sha = pcm_sha256(pcm)
        if i not in in_set["fixture_missing"]:
            fx_ids.append(clip_id)
            fx_sha.append(sha)
            fx_pcm.append(pcm.astype("<i2").tobytes())
            fx_tr.append(transcript)
            fx_dur.append(dur)
            fx_part.append(part)

        enc_pcm = pcm
        if i in in_set["low_snr"]:
            enc_pcm = _add_noise_at_snr(rng, pcm, snr_db=float(rng.uniform(12, 22)))
        payload: bytes | None = encode_pcm(codec, enc_pcm)
        if i in in_set["undecodable"]:
            # break magic (non-pcm codecs) AND force odd length (pcm_s16le)
            cut = max(3, len(payload) // 3)
            blob = b"\x00\x01" + payload[:cut]
            payload = blob if len(blob) % 2 else blob[:-1]

        out_dur: int | None = dur
        if i in in_set["dur_null"]:
            out_dur = None
        out_tr: str | None = transcript
        if i in in_set["transcript_null"]:
            out_tr = None if i % 2 else ""
        elif i in in_set["transcript_mismatch"]:
            out_tr = transcript + " corrupted"

        row = (clip_id, payload, sr, out_dur, codec, out_tr, part)
        clip_ids.append(row[0])
        payloads.append(row[1])
        srs.append(row[2])
        dur_col.append(row[3])
        codecs_col.append(row[4])
        transcripts.append(row[5])
        parts.append(row[6])
        if i in in_set["dup_clip_id"]:
            dup_rows.append(row)

    for row in dup_rows:  # exact duplicates (same clip_id, same content)
        clip_ids.append(row[0])
        payloads.append(row[1])
        srs.append(row[2])
        dur_col.append(row[3])
        codecs_col.append(row[4])
        transcripts.append(row[5])
        parts.append(row[6])

    clips_tbl = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(dur_col, pa.int32()),
            "codec": pa.array(codecs_col, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
            "part": pa.array(parts, pa.string()),
        }
    )
    # Fixture storage split (mirrors a metadata-table + blob-table layout):
    # - fixtures_ref.parquet: small meta columns; phase B of the facts plan
    #   reads ONLY this (a few MB even at bench scale)
    # - fixtures_pcm/: canonical PCM blobs, hive-partitioned by the SAME
    #   `part` key as clips, so the SNR phase prunes to suspect partitions
    fixtures_meta_tbl = pa.table(
        {
            "clip_id": pa.array(fx_ids, pa.string()),
            "pcm_sha256": pa.array(fx_sha, pa.string()),
            "expected_transcript": pa.array(fx_tr, pa.string()),
            "expected_dur_ms": pa.array(fx_dur, pa.int32()),
        }
    )
    fixtures_pcm_tbl = pa.table(
        {
            "clip_id": pa.array(fx_ids, pa.string()),
            "pcm_ref": pa.array(fx_pcm, pa.binary()),
            "part": pa.array(fx_part, pa.string()),
        }
    )

    clips_dir = os.path.join(out_dir, "clips")
    os.makedirs(out_dir, exist_ok=True)
    pa_ds.write_dataset(
        clips_tbl,
        clips_dir,
        format="parquet",
        partitioning=pa_ds.partitioning(
            pa.schema([("part", pa.string())]), flavor="hive"
        ),
        basename_template="part-{i}.parquet",
        existing_data_behavior="delete_matching",
    )
    pq.write_table(fixtures_meta_tbl, os.path.join(out_dir, "fixtures_ref.parquet"))
    pa_ds.write_dataset(
        fixtures_pcm_tbl,
        os.path.join(out_dir, "fixtures_pcm"),
        format="parquet",
        partitioning=pa_ds.partitioning(
            pa.schema([("part", pa.string())]), flavor="hive"
        ),
        basename_template="part-{i}.parquet",
        existing_data_behavior="delete_matching",
    )

    manifest = {
        "synth_version": SYNTH_VERSION,
        "seed": seed,
        "profile": profile,
        "n_base_rows": n,
        "n_total_rows": len(clip_ids),
        "buckets": buckets,
        "codecs": list(CODECS),
        "planted": {k: [f"clip-{i:08d}" for i in v.tolist()] for k, v in plants.items()},
        "planted_counts": {k: int(len(v)) for k, v in plants.items()},
        "partitions": sorted(set(parts)),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:  # atomic write (reference utils/json_io.py)
        json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(tmp, manifest_path)
    return manifest


def ensure_profile(base_dir: str, profile: str, seed: int = DEFAULT_SEED) -> str:
    """Generate (idempotently) and return the directory for *profile*."""
    out = os.path.join(base_dir, profile)
    generate(out, profile=profile, seed=seed)
    return out


if __name__ == "__main__":
    import sys

    prof = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    dest = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/testclips/{prof}"
    m = generate(dest, profile=prof)
    print(json.dumps({k: v for k, v in m.items() if k != "planted"}, indent=1))
