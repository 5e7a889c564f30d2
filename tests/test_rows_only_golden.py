"""Golden pinning of the rows-only registry queries.

The correctness driver can only count rows for queries without a DuckDB
oracle (audio decode, stateful streaming, zlib+pixel math — none
SQL-expressible).  They ARE deterministic by construction (seeded corpora
and payloads), so their FULL output frames are committed as golden JSON and
asserted exactly here: "rows-only" for the driver, exact-frame for CI.

Bootstrap discipline mirrors tests/test_render.py's SARIF golden: first run
writes the file and skips; the committed file is the contract thereafter.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from codeclone_spark.entry_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"  # -> tiny clips profile for clip queries
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

ROWS_ONLY = [
    "validation_violations",
    "stream_dedup_updates",
    "stream_neardup_updates",
    "multimodal_image_stats",
    "multimodal_video_stats",
    "clips_flatness_stats_by_part",
]


def _canon(v):
    """JSON-stable cell: floats round-tripped at 6 decimals (every float
    column in these queries is already rounded coarser than that)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


def _frame_as_rows(df):
    cols = sorted(df.columns)
    return [[_canon(r[c]) for c in cols] for r in df.collect()], cols


def test_rows_only_queries_are_registered_rows_only():
    for name in ROWS_ONLY:
        assert name in REGISTRY and REGISTRY[name].sql is None


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_golden(spark, name):
    rows, cols = _frame_as_rows(REGISTRY[name].fn(spark, SF_DIR))
    got = {"columns": cols, "rows": rows}
    path = os.path.join(GOLDEN_DIR, f"rows_only_{name}.json")
    if not os.path.exists(path):  # bootstrap once; committed after
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=0)
        pytest.skip(f"golden bootstrapped — commit {path}")
    with open(path) as f:
        expect = json.load(f)
    assert got["columns"] == expect["columns"]
    assert got["rows"] == expect["rows"]
