"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship TPC-H-style pricing summary at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline ops (dedup/similarity/text)
and the audio validation rules over this repo's deterministic synthetic
clips corpus.  See ``codeclone_spark/entry_queries.py`` for the paired
implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from codeclone_spark.entry_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops like the audio decode pass — driver records a rows-only check)."""
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
