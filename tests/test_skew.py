"""Salted two-stage aggregation: equivalence + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codeclone_spark.operators.skew import salted_group_stats, skew_safe_count_distinct


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 'hot'
    rows = [("hot" if i % 10 else "cold", i % 7, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, ["k", "v", "x"])


def test_salted_matches_plain_groupby(spark, skewed):
    got = {
        r["k"]: (r["rows"], r["mn"], r["mx"], round(r["mean"], 6))
        for r in salted_group_stats(
            skewed,
            ["k"],
            {"rows": ("count", "x"), "mn": ("min", "x"), "mx": ("max", "x"), "mean": ("avg", "x")},
        ).collect()
    }
    expect = {
        r["k"]: (r["rows"], r["mn"], r["mx"], round(r["mean"], 6))
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            F.avg("x").alias("mean"),
        )
        .collect()
    }
    assert got == expect


def test_salted_avg_skips_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], ["k", "x"]
    )
    got = salted_group_stats(df, ["k"], {"mean": ("avg", "x")}).collect()[0]
    assert got["mean"] == pytest.approx(2.0)


def test_salted_two_stage_plan(spark, skewed):
    df = salted_group_stats(skewed, ["k"], {"rows": ("count", "x")})
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # two aggregation levels on top of each other (stage1 on (k, salt))
    assert plan.count("HashAggregate") >= 4  # partial+final x two stages


def test_skew_safe_count_distinct(spark, skewed):
    got = {r["k"]: r["ndv"] for r in skew_safe_count_distinct(skewed, "k", "v").collect()}
    expect = {
        r["k"]: r["ndv"]
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("ndv")).collect()
    }
    assert got == expect
