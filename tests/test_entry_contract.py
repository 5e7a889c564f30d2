"""Contract snapshot of the __spark_entry__ surface (reference keeps CLI
help text + tool schemas frozen as contract snapshots the same way)."""

from __future__ import annotations

import duckdb
import pytest


def test_registry_shape():
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    # only genuinely non-SQL-expressible ops may omit the oracle
    assert set(qs) - set(osql) == {
        "validation_violations",  # full engine run (audio decode)
        "stream_dedup_updates",  # stateful streaming (cross-batch state)
        "stream_neardup_updates",  # stateful streaming (LSH bucket memory)
        "multimodal_image_stats",  # zlib+pixel decode (snpi container)
        "multimodal_video_stats",  # frame-index demux + frame decode
        "clips_flatness_stats_by_part",  # decode-derived stats column
    }
    # every rows-only query is golden-pinned to its exact frame in pytest
    # (tests/test_rows_only_golden.py) — "rows-only" is a driver
    # limitation, not a weaker engine contract
    from test_rows_only_golden import ROWS_ONLY

    assert set(qs) - set(osql) == set(ROWS_ONLY)


@pytest.mark.parametrize("clause", ["syntax"])
def test_oracle_sql_parses_in_duckdb(clause):
    """Every oracle must at least bind+plan against empty tables of the
    right shape (full value checks run in scripts/check_oracles.py)."""
    import __spark_entry__ as E

    con = duckdb.connect()
    ddl = {
        "region": "r_regionkey INT, r_name VARCHAR",
        "nation": "n_nationkey INT, n_name VARCHAR, n_regionkey INT",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, s_acctbal DOUBLE",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INT, p_retailprice DOUBLE",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP",
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }
    for t, cols in ddl.items():
        con.execute(f"CREATE TABLE {t} ({cols})")
    for name, sql in E.oracle_sql().items():
        if "read_parquet" in sql:
            continue  # clips oracles need the generated corpus on disk
        con.sql(sql).fetchall()  # empty result, but parses + plans + runs
