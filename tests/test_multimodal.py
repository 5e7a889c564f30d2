"""Multimodal plumbing: REAL synthetic-codec decode (snpi/snpv), schema,
error rows, lib-gated external formats, binary never emitted."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from codeclone_spark.functions.multimodal import (
    IMAGE_FACTS_SCHEMA,
    VIDEO_FACTS_SCHEMA,
    block_mean_resize,
    decode_snpi,
    decode_snpv_frame,
    demux_snpv,
    encode_snpi,
    encode_snpv,
    frame_phash63,
    image_facts_map_in_pandas,
    luma,
    sample_frame_indices,
    video_facts_map_in_pandas,
)


def _rgb(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_snpi_roundtrip_exact():
    img = _rgb(7)
    out = decode_snpi(encode_snpi(img))
    assert np.array_equal(out, img)


def test_snpi_trailing_garbage_rejected():
    # bytes after a COMPLETE zlib stream must fail like snpv's trailing-
    # garbage guard (zlib exposes them as decompressobj.unused_data)
    blob = encode_snpi(_rgb(9, 4, 4))
    with pytest.raises(ValueError):
        decode_snpi(blob + b"zz")


def test_snpi_guards():
    img = _rgb(1, 4, 4)
    blob = encode_snpi(img)
    with pytest.raises(ValueError):
        decode_snpi(b"JUNK" + blob[4:])  # bad magic
    # zip bomb: header claims 4x4 but compressed data inflates far larger
    bomb = blob[:8] + zlib.compress(b"\x00" * 10_000_000, 9)
    with pytest.raises(ValueError):
        decode_snpi(bomb)
    # truncation
    with pytest.raises(ValueError):
        decode_snpi(blob[:-3])
    # dims out of range
    big = b"SNPi" + struct.pack(">HH", 9000, 2) + blob[8:]
    with pytest.raises(ValueError):
        decode_snpi(big)


def _img_df(spark):
    rows = [
        ("img1", encode_snpi(_rgb(42)), "snpi"),          # real decode
        ("img2", b"x", "snpi"),                            # too short
        ("img3", None, "jpeg"),                            # null payload
        ("img4", b"y" * 100, "bmp"),                       # unsupported format
        ("img5", b"\x89PNG" + b"\x00" * 64, "png"),        # lib-gated format
    ]
    return spark.createDataFrame(rows, "item_id string, payload binary, format string")


def test_image_facts(spark):
    facts = _img_df(spark).mapInPandas(
        image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA
    )
    rows = {r["item_id"]: r for r in facts.collect()}
    r1 = rows["img1"]
    assert r1["decode_ok"]
    assert (r1["width"], r1["height"]) == (32, 24)
    assert len(r1["phash"]) == 64 and set(r1["phash"]) <= {"0", "1"}
    # luma of the actual pixels, not a payload-hash fake
    expect = round(float(luma(_rgb(42)).mean()), 6)
    assert r1["mean_luma"] == pytest.approx(expect, abs=1e-9)
    assert not rows["img2"]["decode_ok"] and rows["img2"]["error_kind"]
    assert not rows["img3"]["decode_ok"]
    assert not rows["img4"]["decode_ok"]
    # PIL not installed in this container: honest gate, not a fake
    assert rows["img5"]["error_kind"] == "codec_unavailable"
    assert "payload" not in facts.columns  # binary consumed, not emitted


def test_image_facts_deterministic(spark):
    df = _img_df(spark)
    a = df.mapInPandas(image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA).collect()
    b = df.mapInPandas(image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_block_mean_resize_is_real_math():
    # constant blocks resize to their own values
    img = np.kron(np.arange(64, dtype=np.float64).reshape(8, 8), np.ones((3, 3)))
    out = block_mean_resize(img, 8, 8)
    assert np.allclose(out, np.arange(64, dtype=np.float64).reshape(8, 8))


# ----------------------------------------------------------------- video --
def _frames(seed: int, n: int = 90, h: int = 16, w: int = 16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)


def test_snpv_demux_without_inflation_and_frame_decode():
    fr = _frames(3)
    blob = encode_snpv(fr, fps=30)
    w, h, n, fps, idx = demux_snpv(blob)
    assert (w, h, n, fps) == (16, 16, 90, 30.0)
    assert len(idx) == 90
    # decode one real frame and compare exactly
    got = decode_snpv_frame(blob, w, h, idx[37])
    assert np.array_equal(got, fr[37])
    # frame hash comes from real pixels: identical frames hash equal
    dup = np.stack([fr[0], fr[0]])
    b2 = encode_snpv(dup, fps=1)
    _, _, _, _, i2 = demux_snpv(b2)
    h0 = frame_phash63(decode_snpv_frame(b2, 16, 16, i2[0]))
    h1 = frame_phash63(decode_snpv_frame(b2, 16, 16, i2[1]))
    assert h0 == h1


def test_snpv_guards():
    blob = encode_snpv(_frames(5, n=4), fps=10)
    with pytest.raises(ValueError):
        demux_snpv(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        demux_snpv(blob[:-2])  # truncated last frame
    with pytest.raises(ValueError):
        demux_snpv(blob + b"zz")  # trailing garbage


def test_video_frame_sampling_policy():
    # 1 fps sampling at 30fps, 120 frames -> every 30th
    assert sample_frame_indices(120, 30.0) == [0, 30, 60, 90]
    # cap binds: long video stays bounded and spaced
    idxs = sample_frame_indices(100_000, 30.0, max_frames=16)
    assert len(idxs) == 16 and idxs == sorted(set(idxs))
    # degenerate fps
    assert sample_frame_indices(5, 0.4) == [0, 1, 2, 3, 4]


def test_gated_codecs_error_row_even_when_lib_imports(monkeypatch):
    """If PyAV/PIL become importable but the decode path is unwired (or the
    import is a stub), the row must still carry error_kind=
    'codec_unavailable' — never undecodable:* and never a task failure."""
    import sys
    import types

    import pandas as pd

    monkeypatch.setitem(sys.modules, "av", types.ModuleType("av"))
    pdf = pd.DataFrame(
        {"item_id": ["v1"], "payload": [b"\x00" * 64], "codec": ["h264"]}
    )
    (out,) = list(video_facts_map_in_pandas(iter([pdf])))
    assert out.loc[0, "error_kind"] == "codec_unavailable"
    assert not out.loc[0, "decode_ok"]

    # PIL stub whose Image.open raises ImportError-adjacent failure paths is
    # out of scope; but a missing PIL must keep yielding the honest gate
    monkeypatch.delitem(sys.modules, "PIL", raising=False)
    ipdf = pd.DataFrame(
        {"item_id": ["i1"], "payload": [b"\x89PNG" + b"\x00" * 8],
         "format": ["png"]}
    )
    (iout,) = list(image_facts_map_in_pandas(iter([ipdf])))
    assert iout.loc[0, "error_kind"] == "codec_unavailable"


def test_video_facts_stage(spark):
    rows = [
        ("v1", bytes(encode_snpv(_frames(1), fps=30)), "snpv"),
        ("v2", bytes(encode_snpv(_frames(2, n=200), fps=25)), "snpv"),
        ("v3", b"short", "snpv"),                      # too short -> error row
        ("v4", b"z" * 64, "mpeg2"),                    # bad codec
        ("v5", None, "snpv"),                          # null payload
        ("v6", b"\x00" * 64, "h264"),                  # lib-gated codec
    ]
    df = spark.createDataFrame(rows, "item_id string, payload binary, codec string")
    facts = df.mapInPandas(video_facts_map_in_pandas, schema=VIDEO_FACTS_SCHEMA)
    got = {r["item_id"]: r for r in facts.collect()}
    assert len(got) == 6  # error rows, never task failures
    r1, r2 = got["v1"], got["v2"]
    assert r1["decode_ok"] and r1["n_frames"] == 90 and r1["fps"] == 30.0
    assert r1["duration_s"] == 3.0
    assert r1["n_sampled"] == len(r1["frame_hashes"]) == 3  # 90f @ 30fps, 1/s
    assert r2["n_sampled"] == 8  # 200f @ 25fps -> 8 one-per-second samples
    assert all(h >= 0 for h in r1["frame_hashes"])
    assert not got["v3"]["decode_ok"] and got["v3"]["error_kind"]
    assert not got["v4"]["decode_ok"]
    assert not got["v5"]["decode_ok"]
    assert got["v6"]["error_kind"] == "codec_unavailable"
    assert "payload" not in facts.columns
