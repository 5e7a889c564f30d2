"""Generator + codec unit tests (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from codeclone_spark.synth import (
    CODECS,
    LOSSLESS_SNR_DB,
    decode_pcm,
    encode_pcm,
    pcm_sha256,
)


def _pcm(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-0.5, 0.5, n) * 32767).astype(np.int16)


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip(codec):
    pcm = _pcm()
    out = decode_pcm(codec, encode_pcm(codec, pcm))
    assert out.shape == pcm.shape
    if codec == "mp3":  # lossy stand-in: bounded quantization error
        err = np.abs(out.astype(np.int32) - pcm.astype(np.int32))
        assert err.max() <= 256
        # SNR above the 30 dB gate
        sp = float(np.sum(pcm.astype(np.float64) ** 2))
        ep = float(np.sum((out - pcm).astype(np.float64) ** 2))
        assert 10 * np.log10(sp / ep) > 30
    else:
        assert np.array_equal(out, pcm)


@pytest.mark.parametrize("codec", CODECS)
def test_corruption_raises(codec):
    payload = encode_pcm(codec, _pcm())
    cut = max(3, len(payload) // 3)
    blob = b"\x00\x01" + payload[:cut]
    corrupted = blob if len(blob) % 2 else blob[:-1]
    with pytest.raises(Exception):
        decode_pcm(codec, corrupted)


def test_unknown_codec_raises():
    with pytest.raises(ValueError):
        decode_pcm("wav", b"\x00\x00")


def test_sha_stable():
    pcm = _pcm()
    assert pcm_sha256(pcm) == pcm_sha256(pcm.copy())


def test_manifest_counts(tiny_manifest):
    pc = tiny_manifest["planted_counts"]
    assert pc["dup_clip_id"] == 4
    assert pc["fixture_missing"] == 100
    assert tiny_manifest["n_total_rows"] == tiny_manifest["n_base_rows"] + pc["dup_clip_id"]
    # planted sets are disjoint
    sets = [set(v) for v in tiny_manifest["planted"].values()]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            assert not (sets[i] & sets[j])


def test_generator_idempotent(tiny_dir, tiny_manifest):
    from codeclone_spark.synth import generate

    m2 = generate(tiny_dir, profile="tiny")
    assert m2["planted_counts"] == tiny_manifest["planted_counts"]


def test_zip_bomb_bounded():
    """A small compressed payload that inflates to >64 MiB must raise (and
    thus become an error row), not allocate the full bomb."""
    import zlib

    import pytest

    from codeclone_spark.synth import MAX_DECODED_BYTES, decode_pcm

    bomb = b"fLaC" + zlib.compress(b"\x00" * (MAX_DECODED_BYTES + 2), 9)
    assert len(bomb) < 1024 * 1024  # the payload itself passes byte caps
    with pytest.raises(ValueError, match="inflates past"):
        decode_pcm("flac", bomb)
    # a legitimate payload at the boundary still decodes
    ok = b"fLaC" + zlib.compress(b"\x01\x02" * 1000, 6)
    assert decode_pcm("flac", ok).shape == (1000,)
