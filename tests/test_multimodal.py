"""Multimodal (image) plumbing: schema, error rows, binary never emitted."""

from __future__ import annotations

import hashlib

from codeclone_spark.functions.multimodal import (
    IMAGE_FACTS_SCHEMA,
    image_facts_map_in_pandas,
)


def _df(spark):
    rows = [
        ("img1", hashlib.sha256(b"seed1").digest() * 4, "png"),
        ("img2", b"x", "png"),          # too short -> undecodable
        ("img3", None, "jpeg"),         # null payload -> error row
        ("img4", b"y" * 100, "bmp"),    # unsupported format -> error row
    ]
    return spark.createDataFrame(rows, ["item_id", "payload", "format"])


def test_image_facts(spark):
    df = _df(spark)
    facts = df.mapInPandas(image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA)
    rows = {r["item_id"]: r for r in facts.collect()}
    assert rows["img1"]["decode_ok"]
    assert rows["img1"]["width"] == 8 and rows["img1"]["height"] == 8
    assert len(rows["img1"]["phash"]) == 64
    assert not rows["img2"]["decode_ok"] and rows["img2"]["error_kind"]
    assert not rows["img3"]["decode_ok"]
    assert not rows["img4"]["decode_ok"]
    # binary consumed, not emitted
    assert "payload" not in facts.columns


def test_image_facts_deterministic(spark):
    df = _df(spark)
    a = df.mapInPandas(image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA).collect()
    b = df.mapInPandas(image_facts_map_in_pandas, schema=IMAGE_FACTS_SCHEMA).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_video_frame_sampling_policy():
    from codeclone_spark.functions.multimodal import sample_frame_indices

    # 1 fps sampling at 30fps, 120 frames -> every 30th
    assert sample_frame_indices(120, 30.0) == [0, 30, 60, 90]
    # cap binds: long video stays bounded and spaced
    idxs = sample_frame_indices(100_000, 30.0, max_frames=16)
    assert len(idxs) == 16 and idxs == sorted(set(idxs))
    # degenerate fps
    assert sample_frame_indices(5, 0.4) == [0, 1, 2, 3, 4]


def test_video_facts_stage(spark):
    import hashlib

    from pyspark.sql import functions as F

    from codeclone_spark.functions.multimodal import (
        VIDEO_FACTS_SCHEMA,
        video_facts_map_in_pandas,
    )

    rows = [
        ("v1", hashlib.sha256(b"a").digest() * 4, "h264"),
        ("v2", hashlib.sha256(b"b").digest() * 4, "vp9"),
        ("v3", b"short", "h264"),           # too short -> error row
        ("v4", hashlib.sha256(b"c").digest() * 4, "mpeg2"),  # bad codec
        ("v5", None, "h264"),               # null payload
    ]
    df = spark.createDataFrame(rows, "item_id string, payload binary, codec string")
    facts = df.mapInPandas(video_facts_map_in_pandas, schema=VIDEO_FACTS_SCHEMA)
    got = {r["item_id"]: r for r in facts.collect()}
    assert len(got) == 5  # error rows, never task failures
    ok = [got["v1"], got["v2"]]
    for r in ok:
        assert r["decode_ok"] and r["n_sampled"] == len(r["frame_hashes"])
        assert r["duration_s"] > 0 and all(h >= 0 for h in r["frame_hashes"])
    assert not got["v3"]["decode_ok"] and "undecodable" in got["v3"]["error_kind"]
    assert not got["v4"]["decode_ok"]
    assert not got["v5"]["decode_ok"]
    # deterministic: same payload -> same hashes
    again = {r["item_id"]: r for r in facts.collect()}
    assert again["v1"]["frame_hashes"] == got["v1"]["frame_hashes"]
    # binary never leaves the stage
    assert "payload" not in facts.columns
    assert facts.filter(F.col("decode_ok")).count() == 2
