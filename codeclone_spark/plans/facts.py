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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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

from codeclone_spark.functions.audio import (
    decode_map_in_pandas,
    facts_map_in_pandas,
    snr_map_in_pandas,
)
from codeclone_spark.synth import LOSSLESS_SNR_DB

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
        StructField("silence_ratio", DoubleType()),
        StructField("spectral_flatness", DoubleType()),
        StructField("dominant_freq_hz", DoubleType()),
        StructField("band_energies", ArrayType(DoubleType())),
        StructField("snr_db", DoubleType()),
        StructField("fixture_status", StringType()),
        StructField("transcript_match", BooleanType()),
    ]
)


def read_clips(spark: SparkSession, data_dir: str) -> DataFrame:
    """Hive-partitioned clips scan; `part` is a partition column so any
    filter on it prunes directories before reading a byte."""
    return spark.read.parquet(f"{data_dir}/clips")


def read_fixtures_meta(spark: SparkSession, data_dir: str) -> DataFrame:
    """Small fixture meta table (sha, transcript, dur) — all phase B needs."""
    return spark.read.parquet(f"{data_dir}/fixtures_ref.parquet").select(
        "clip_id",
        F.col("pcm_sha256").alias("fx_sha256"),
        "expected_transcript",
        "expected_dur_ms",
    )


def read_fixtures_pcm(spark: SparkSession, data_dir: str) -> DataFrame:
    """Canonical-PCM blob table, hive-partitioned by the same `part` key as
    clips so the SNR phase prunes to suspect partitions."""
    return spark.read.parquet(f"{data_dir}/fixtures_pcm")


def read_fixtures(spark: SparkSession, data_dir: str) -> DataFrame:
    """Joined meta+PCM view (the full_join strategy / streaming path)."""
    return read_fixtures_meta(spark, data_dir).join(
        read_fixtures_pcm(spark, data_dir).select("clip_id", "pcm_ref"),
        "clip_id",
        "left",
    )


DECODE_OUT_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
        StructField("part", StringType()),
        StructField("transcript_nfc", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("error_kind", StringType()),
        StructField("decoded_samples", LongType()),
        StructField("decoded_dur_ms", DoubleType()),
        StructField("pcm_sha256", StringType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("clipping_ratio", DoubleType()),
        StructField("silence_ratio", DoubleType()),
        StructField("spectral_flatness", DoubleType()),
        StructField("dominant_freq_hz", DoubleType()),
        StructField("band_energies", ArrayType(DoubleType())),
    ]
)

SNR_OUT_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("snr_db", DoubleType()),
    ]
)


def _nfc_udf():
    """Built lazily — pandas_udf type parsing needs a live session."""

    @pandas_udf(StringType())
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


def build_facts(
    clips: DataFrame,
    fixtures_meta: DataFrame,
    fixtures_pcm: DataFrame,
    parts: list[str] | None = None,
    force_smj: bool = False,
    snr_strategy: str = "two_phase",
) -> DataFrame:
    """Facts frame for the rule pass.  Two strategies:

    ``two_phase`` (default — the 100 TB plan):
      A. decode over the bare clips scan (map-only: the heavy ``bytes``
         column NEVER enters a shuffle; it dies inside the Arrow batch);
      B. join the small fixture META columns (sha/transcript/dur —
         ~100 B/row) on clip_id — a cheap shuffle of scalars;
      C. rows whose decoded sha mismatches the fixture sha (lossy codecs,
         corrupted encodes) re-read ``bytes`` + ``pcm_ref`` via semi-joins
         and compute SNR — traffic proportional to the SUSPECT subset, not
         the table.  sha-equal rows get SNR = lossless sentinel for free.

    ``full_join`` (fallback for lossy-dominated tables where phase C would
      approach 100% anyway): single clips ⟕ fixtures join with the fused
      decode — shuffles payloads once, decodes once.

    *parts* restricts to a partition subset (resume pruning, reference
    core/discovery.py:118-190).  *force_smj* disables broadcast to exercise
    the sort-merge path the north_star demands for cluster-scale fixtures.
    """
    if parts is not None:
        clips = clips.filter(F.col("part").isin(parts))
        fixtures_pcm = fixtures_pcm.filter(F.col("part").isin(parts))

    if snr_strategy == "full_join":
        fixtures = fixtures_meta.join(
            fixtures_pcm.select("clip_id", "pcm_ref"), "clip_id", "left"
        ).select(
            "clip_id", "fx_sha256", "pcm_ref", "expected_transcript", "expected_dur_ms"
        )
        fx = fixtures.hint("merge") if force_smj else fixtures
        joined = clips.join(fx, "clip_id", "left")
        return joined.mapInPandas(facts_map_in_pandas, schema=FACTS_OUT_SCHEMA)

    # --- phase A: map-only decode (no shuffle of bytes)
    decoded = decode_stage(clips)
    return assemble_facts(decoded, clips, fixtures_meta, fixtures_pcm, force_smj)


def decode_stage(clips: DataFrame) -> DataFrame:
    """Phase A alone — callers should persist() this: both the rule pass and
    the SNR-suspect branch consume it, and caching it means audio bytes are
    decoded exactly once per wave."""
    return clips.mapInPandas(decode_map_in_pandas, schema=DECODE_OUT_SCHEMA)


def join_meta(decoded: DataFrame, fixtures_meta: DataFrame, force_smj: bool = False) -> DataFrame:
    """Phase B: join the small fixture meta columns onto decoded facts."""
    meta = fixtures_meta.select(
        "clip_id",
        "fx_sha256",
        _nfc_udf()(F.col("expected_transcript")).alias("fx_transcript_nfc"),
        "expected_transcript",
        "expected_dur_ms",
    )
    fx_meta = meta.hint("merge") if force_smj else meta
    return decoded.join(fx_meta, "clip_id", "left")


def suspect_filter(f: DataFrame):
    """Rows whose decoded sha mismatches the fixture sha — the only rows
    that need the expensive PCM comparison."""
    return f.filter(
        F.col("decode_ok")
        & F.col("fx_sha256").isNotNull()
        & (F.col("pcm_sha256") != F.col("fx_sha256"))
    )


def assemble_facts(
    decoded: DataFrame,
    clips: DataFrame,
    fixtures_meta: DataFrame,
    fixtures_pcm: DataFrame,
    force_smj: bool = False,
    suspect_parts: list[str] | None = None,
) -> DataFrame:
    """Phases B+C.  *suspect_parts*: when the caller has materialized the
    suspect partition list (runner does, from the cached decode stage), the
    phase-C re-scans prune statically to those directories — guaranteed,
    no reliance on dynamic partition pruning."""
    # --- phase B: small-column meta join
    f = join_meta(decoded, fixtures_meta, force_smj)

    sha_match = F.col("pcm_sha256") == F.col("fx_sha256")
    fixture_status = (
        F.when(F.col("fx_sha256").isNull(), F.lit("missing_fixture"))
        .when(~F.col("decode_ok"), F.lit("undecodable"))
        .otherwise(F.lit("checked"))
    )
    transcript_match = F.when(
        F.col("fx_transcript_nfc").isNotNull(),
        F.coalesce(
            F.col("transcript_nfc") == F.col("fx_transcript_nfc"), F.lit(False)
        ),
    )

    # --- phase C: SNR only where the cheap exact check can't settle it.
    # The suspect id-list MUST be broadcast: a sort-merge semi-join here
    # would shuffle the full bytes/pcm_ref columns — the exact cost this
    # strategy exists to avoid (confirmed via stage metrics: SMJ planned
    # ~700 core-seconds of payload shuffle at 20k rows).  If suspects ever
    # outgrow broadcast (lossy-dominated table), use snr_strategy=full_join.
    suspects = suspect_filter(f).select("clip_id", "part")
    suspect_ids = suspects.select("clip_id")
    if suspect_parts is not None:
        # static literal pruning: only the suspect directories are listed,
        # let alone read
        payload_base = clips.filter(F.col("part").isin(suspect_parts))
        ref_base = fixtures_pcm.filter(F.col("part").isin(suspect_parts))
    else:
        # lazy fallback: broadcast the suspect-part set; joining it against
        # the hive partition column prunes directories dynamically
        sp = suspects.select("part").distinct()
        payload_base = clips.join(F.broadcast(sp), "part")
        ref_base = fixtures_pcm.join(F.broadcast(sp), "part")
    payload_side = payload_base.join(
        F.broadcast(suspect_ids), "clip_id", "left_semi"
    ).select("clip_id", "bytes", "codec")
    ref_side = ref_base.join(
        F.broadcast(suspect_ids), "clip_id", "left_semi"
    ).select("clip_id", "pcm_ref")
    snr = (
        payload_side.join(ref_side, "clip_id")
        .mapInPandas(snr_map_in_pandas, schema=SNR_OUT_SCHEMA)
        .groupBy("clip_id")
        .agg(F.min("snr_db").alias("snr_db_joined"))  # dup clip_ids: one row
    )
    out = f.join(snr, "clip_id", "left").select(
        "clip_id",
        "sr_hz",
        "dur_ms",
        "codec",
        "transcript",
        "part",
        "fx_sha256",
        "expected_transcript",
        "expected_dur_ms",
        "decode_ok",
        "error_kind",
        "decoded_samples",
        "decoded_dur_ms",
        "pcm_sha256",
        "rms",
        "peak",
        "clipping_ratio",
        "silence_ratio",
        "spectral_flatness",
        "dominant_freq_hz",
        "band_energies",
        F.when(F.col("decode_ok") & sha_match, F.lit(LOSSLESS_SNR_DB))
        .otherwise(F.col("snr_db_joined"))
        .alias("snr_db"),
        fixture_status.alias("fixture_status"),
        transcript_match.alias("transcript_match"),
    )
    return out
