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
