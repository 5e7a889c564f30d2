"""Bucketed (pre-shuffled) tables: co-located joins without an Exchange.

The 100 TB story for the engine's repeated equi-joins (clips ⋈ fixtures on
clip_id, violations ⋈ baseline keys): persist both sides bucketed + sorted
by the join key once, and every subsequent sort-merge join reads co-located
buckets with NO shuffle — the Spark analog of the reference's pre-indexed
cache lookups.  Verified by a plan test asserting the join runs without an
Exchange on either side (tests/test_plans_physical.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist *df* as a parquet table bucketed + sorted by *key*.

    *path* makes it an external table (tests point this at a tmp dir).
    Bucket count must match across join partners for the exchange-free
    plan; pick it once per key domain (clip_id -> table-wide constant)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables: Catalyst plans a sort-merge
    join over co-located bucket scans (zero Exchange) when
    spark.sql.sources.bucketing.enabled (default) and bucket specs align."""
    return spark.table(left_table).join(spark.table(right_table), key)
