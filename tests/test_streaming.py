"""Structured Streaming micro-batch validation over a clips stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from codeclone_spark.streaming import stream_validate, windowed_violation_counts


def test_stream_validate_matches_batch(spark, tiny_dir, tmp_path):
    out = str(tmp_path / "viol")
    ckpt = str(tmp_path / "ckpt")
    q = stream_validate(
        spark,
        clips_stream_dir=f"{tiny_dir}/clips",
        fixtures_dir=tiny_dir,
        out_dir=out,
        checkpoint_dir=ckpt,
        trigger_once=True,
    )
    q.awaitTermination(300)
    viol = spark.read.parquet(out)
    counts = {r["rule_id"]: r["n"] for r in viol.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # same row-rule counts as the batch engine golden (uniq is global-only)
    assert counts["audio:undecodable"] == 2
    assert counts["audio:snr"] == 2
    assert counts["ref:fixture_missing"] == 100
    # exactly-once: re-running the same stream adds nothing
    q2 = stream_validate(
        spark,
        clips_stream_dir=f"{tiny_dir}/clips",
        fixtures_dir=tiny_dir,
        out_dir=out,
        checkpoint_dir=ckpt,
        trigger_once=True,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == viol.count()


def test_windowed_violation_counts(spark):
    rows = [
        ("2024-01-01 10:05:00", "audio:snr"),
        ("2024-01-01 10:55:00", "audio:snr"),
        ("2024-01-01 11:05:00", "audio:snr"),
    ]
    df = spark.createDataFrame(rows, ["ts", "rule_id"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        (r["window_start"], r["rule_id"]): r["n"]
        for r in windowed_violation_counts(df).collect()
    }
    assert got == {
        ("2024-01-01 10:00", "audio:snr"): 2,
        ("2024-01-01 11:00", "audio:snr"): 1,
    }
