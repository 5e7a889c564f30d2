"""Skew handling: salted two-stage aggregation.

The clips table is intentionally skewed (~75% of rows share one codec,
~72% one sample rate — FIXTURES.md).  A naive ``groupBy("codec")`` sends
3/4 of the table through one reducer.  Two defenses, both used here:

1. **Pre-salted layout**: the engine's partition key ``part`` is
   codec x clip_id-bucket — the bucket suffix IS a salt baked into the
   storage layout, so per-partition aggregation (``partition_aggregates``)
   never sees the hot key.  Table-level stats fold the per-partition
   partials (mergeable counts/sums/min/max/histograms) on the driver.
2. **Salted two-stage aggregation** (this module) for ad-hoc groupBys on
   a skewed key: stage 1 aggregates on (key, salt) — uniform fan-out;
   stage 2 merges the ≤ salt_n partials per key.  Equivalent results,
   bounded reducer size.  (AQE skew-join handles the join-side analog;
   it cannot split a skewed aggregation key, hence this operator.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ops supported: algebraic aggregates with a well-defined merge step
_MERGE = {
    "count": F.sum,
    "count_nonnull": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)),
    "count_nonnull": lambda c: F.count(F.col(c)),  # avg denominator
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_group_stats(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    *aggs*: out_name -> (op, col) with op in {count,sum,min,max,avg}.
    ``avg`` decomposes into sum+count partials and a final ratio.
    The salt is derived from a uniform high-cardinality expression (the
    row's first key + monotonically varying hash), bounded to *salt_n*.
    """
    plan: dict[str, tuple[str, str]] = {}
    finals: list[tuple[str, str]] = []  # (out_name, kind)
    for out, (op, col) in aggs.items():
        if op == "avg":
            plan[f"__{out}_sum"] = ("sum", col)
            plan[f"__{out}_cnt"] = ("count_nonnull", col)  # null-skipping avg
            finals.append((out, "avg"))
        elif op in _PARTIAL:
            plan[out] = (op, col)
            finals.append((out, op))
        else:
            raise ValueError(f"unsupported op {op!r}")

    # deterministic salt: spread by input task, bounded fan-in per key.
    # (For count/sum/min/max Spark's map-side partial agg already defuses
    # skew; this operator matters when composed with non-algebraic partials
    # — see skew_safe_count_distinct — and documents the pattern.)
    salted = df.withColumn(salt_col, F.pmod(F.spark_partition_id(), salt_n))

    stage1 = salted.groupBy(*keys, salt_col).agg(
        *[_PARTIAL[op](col).alias(name) for name, (op, col) in plan.items()]
    )
    merged = stage1.groupBy(*keys).agg(
        *[_MERGE[op](name).alias(name) for name, (op, _) in plan.items()]
    )
    cols = [F.col(k) for k in keys]
    for out, kind in finals:
        if kind == "avg":
            cols.append(
                (F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")).alias(out)
            )
        else:
            cols.append(F.col(out))
    return merged.select(*cols)


def skew_safe_count_distinct(
    df: DataFrame, key: str, value: str, out: str = "ndv"
) -> DataFrame:
    """Exact count-distinct per (possibly hot) key without a hot reducer.

    ``groupBy(key).agg(countDistinct(value))`` keeps every distinct value
    of the hot key in one reducer.  Two-stage form: distinct on
    (key, value) — shuffle keyed by BOTH columns, uniform by construction —
    then count per key (algebraic, map-side combined)."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out))
    )
