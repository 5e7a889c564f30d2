"""Facts stage: clips ⟕ fixtures → fused decode pass → small facts frame.

Scale notes (the plan we want at 100 TB, verified via .explain in tests):
- Filters on ``part`` (resume pruning) hit the hive/Iceberg partition columns
  → partition pruning at the scan, zero bytes read for done partitions.
- The fixtures join is an equi-join on a uniform high-cardinality key
  (clip_id): no skew.  Catalyst/AQE picks broadcast when fixtures fit under
  the threshold and sort-merge otherwise; at 10^12 rows both sides would be
  bucketed by clip_id in Iceberg so the join is co-located (documented here,
  not forceable on local parquet).
- ``bytes``/``pcm_ref`` die inside the decode pass; everything downstream
  (rule evaluation, aggregations, verdicts) shuffles only ~100 B/row facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from codeclone_spark.functions.audio import facts_map_in_pandas

FACTS_OUT_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
        StructField("part", StringType()),
        StructField("fx_sha256", StringType()),
        StructField("expected_transcript", StringType()),
        StructField("expected_dur_ms", IntegerType()),
        StructField("decode_ok", BooleanType()),
        StructField("error_kind", StringType()),
        StructField("decoded_samples", LongType()),
        StructField("decoded_dur_ms", DoubleType()),
        StructField("pcm_sha256", StringType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("clipping_ratio", DoubleType()),
        StructField("snr_db", DoubleType()),
        StructField("fixture_status", StringType()),
        StructField("transcript_match", BooleanType()),
    ]
)


def read_clips(spark: SparkSession, data_dir: str) -> DataFrame:
    """Hive-partitioned clips scan; `part` is a partition column so any
    filter on it prunes directories before reading a byte."""
    return spark.read.parquet(f"{data_dir}/clips")


def read_fixtures(spark: SparkSession, data_dir: str) -> DataFrame:
    return spark.read.parquet(f"{data_dir}/fixtures_ref.parquet").select(
        "clip_id",
        F.col("pcm_sha256").alias("fx_sha256"),
        "pcm_ref",
        "expected_transcript",
        "expected_dur_ms",
    )


def build_facts(
    clips: DataFrame,
    fixtures: DataFrame,
    parts: list[str] | None = None,
    force_smj: bool = False,
) -> DataFrame:
    """clips ⟕ fixtures on clip_id, then the single fused decode pass.

    *parts* restricts to a partition subset (resume pruning — analog of the
    reference's changed-file discovery, core/discovery.py:118-190).
    *force_smj* disables broadcast to exercise the sort-merge path the
    north_star demands for cluster-scale fixtures."""
    if parts is not None:
        clips = clips.filter(F.col("part").isin(parts))
    fx = fixtures.hint("merge") if force_smj else fixtures
    joined = clips.join(fx, "clip_id", "left")
    return joined.mapInPandas(facts_map_in_pandas, schema=FACTS_OUT_SCHEMA)
