"""Physical-plan assertions: the plans we demand at 100 TB must be visible
in .explain output at test scale — partition pruning, column pruning,
broadcast-vs-SMJ join choice, and single-scan (shuffle-free) rule evaluation."""

from __future__ import annotations

from pyspark.sql import functions as F

from codeclone_spark.operators.rules import evaluate_row_rules
from codeclone_spark.plans.facts import (
    build_facts,
    read_clips,
    read_fixtures_meta,
    read_fixtures_pcm,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning_on_part_filter(spark, tiny_dir):
    clips = read_clips(spark, tiny_dir)
    pruned = clips.filter(F.col("part").isin(["pcm_s16le-b00"]))
    plan = _plan(pruned.select("clip_id"))
    assert "PartitionFilters" in plan
    # the partition filter must actually contain the part predicate
    assert "part" in plan.split("PartitionFilters")[1][:200]


def test_column_pruning_uniqueness_scan(spark, tiny_dir):
    clips = read_clips(spark, tiny_dir)
    ids_only = clips.select("clip_id", "part")
    plan = _plan(ids_only)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # the heavy binary column must NOT be read for the uniqueness pass
    assert "bytes" not in read_schema
    assert "clip_id" in read_schema


def test_fixture_join_broadcast_small(spark, tiny_dir):
    clips = read_clips(spark, tiny_dir)
    facts = build_facts(
        clips, read_fixtures_meta(spark, tiny_dir), read_fixtures_pcm(spark, tiny_dir)
    )
    plan = _plan(facts)
    assert "BroadcastHashJoin" in plan  # tiny fixture meta fits the threshold


def test_fixture_join_smj_forced(spark, tiny_dir):
    clips = read_clips(spark, tiny_dir)
    facts = build_facts(
        clips,
        read_fixtures_meta(spark, tiny_dir),
        read_fixtures_pcm(spark, tiny_dir),
        force_smj=True,
    )
    plan = _plan(facts)
    assert "SortMergeJoin" in plan  # the cluster-scale fixtures path


def test_two_phase_decode_is_map_only(spark, tiny_dir):
    """Phase A of the two-phase facts plan: decode runs directly over the
    scan — the heavy `bytes` column must never enter an Exchange."""
    from codeclone_spark.functions.audio import decode_map_in_pandas
    from codeclone_spark.plans.facts import DECODE_OUT_SCHEMA

    clips = read_clips(spark, tiny_dir)
    decoded = clips.mapInPandas(decode_map_in_pandas, schema=DECODE_OUT_SCHEMA)
    body = _plan(decoded).split("== Physical Plan ==")[-1]
    assert "Exchange" not in body
    assert "MapInPandas" in body


def test_row_rules_are_single_pass_no_shuffle(spark, tiny_dir):
    """All row rules evaluate in one projection+generate over facts —
    an Exchange here would mean a per-rule shuffle creep.  Uses the
    full_join strategy whose facts plan is shuffle-free after the join."""
    clips = read_clips(spark, tiny_dir)
    facts = build_facts(
        clips,
        read_fixtures_meta(spark, tiny_dir),
        read_fixtures_pcm(spark, tiny_dir),
        snr_strategy="full_join",
    )
    viol = evaluate_row_rules(facts)
    plan = _plan(viol)
    body = plan.split("== Physical Plan ==")[-1]
    # the only allowed exchange is the fixture join's broadcast
    assert "Exchange hashpartitioning" not in body
    assert "Generate explode" in body or "Generate" in body


def test_stats_registry_width_adds_zero_wave_jobs(spark):
    """qsketch_counts_multi's claim: EVERY registry column's quantile
    sketch folds into ONE wave job — adding a NumericColSpec (e.g. the
    round-4 spectral_flatness) must not change the Spark job count of the
    sketch pass."""
    from codeclone_spark.operators.rules import (
        NUMERIC_STATS_COLUMNS,
        qsketch_counts_multi,
    )

    assert len(NUMERIC_STATS_COLUMNS) >= 3  # dur_ms, rms, spectral_flatness
    rows = [(f"p{i % 4}", float(i * 40), i / 100.0, i / 200.0) for i in range(64)]
    df = spark.createDataFrame(
        rows, "part string, dur_ms double, rms double, spectral_flatness double"
    )
    sc = spark.sparkContext

    def jobs_for(specs, group):
        sc.setJobGroup(group, "sketch job-count probe")
        try:
            qsketch_counts_multi(df, specs).collect()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    narrow = jobs_for(NUMERIC_STATS_COLUMNS[:2], "qsk_narrow")
    wide = jobs_for(NUMERIC_STATS_COLUMNS, "qsk_wide")
    assert wide == narrow  # zero marginal jobs per added registry column


def test_lsh_verified_pairs_index_is_candidate_confined(spark):
    """The composed LSH→exact-verify plan must confine the inverted shingle
    index with broadcast semi-joins (candidate docs, then candidate pairs)
    BEFORE the quadratic shingle self-join — the property that keeps exact
    verification off the full corpus at 100 TB."""
    from codeclone_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"shared boilerplate text block number {i % 3}") for i in range(24)],
        ["doc_id", "text"],
    )
    body = _plan(dd.lsh_verified_pairs(docs, "doc_id", "text")).split(
        "== Physical Plan =="
    )[-1]
    # two confinement semi-joins: shingle index ⋉ candidate ids,
    # pair stream ⋉ candidate pairs (AQE picks broadcast when the
    # candidate set is small — asserted at runtime by the ReusedExchange
    # test below; statically they plan as shuffles, which is the correct
    # fallback when candidates are most of a dup-heavy corpus)
    assert body.count("LeftSemi") >= 2
    assert "CartesianProduct" not in body
    # the doc-CONTENT array side is explicitly shuffle-hash joined: its
    # compressed size fools the broadcast heuristic while its serialized
    # form is whole-corpus text (measured >1 GiB driver abort at 601k docs)
    assert "ShuffledHashJoin" in body


def test_lsh_verified_pairs_reuses_exchanges(spark):
    """The lazy (scratch_dir=None) ladder references the LSH candidate
    subplan twice (pair stream + id-set semi-join); at this scale AQE
    deduplicates the identical exchanges.  NOTE this is a small-scale
    courtesy, not a contract: at a 601k-doc corpus the final adaptive plan
    was measured with ZERO ReusedExchange nodes (MinHash computed twice),
    which is why scale call-sites pass scratch_dir — see the
    materialization test below.  Reuse only materializes in the AQE-FINAL
    plan, so assert after an action."""
    from codeclone_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"shared boilerplate text block number {i % 3}") for i in range(24)],
        ["doc_id", "text"],
    )
    pairs = dd.lsh_verified_pairs(docs, "doc_id", "text")
    pairs.collect()  # materialize so AQE finalizes the plan
    final = _plan(pairs)
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 2


def test_lsh_verified_pairs_scratch_runs_minhash_once(spark, tmp_path):
    """With scratch_dir the candidate pairs come from a parquet
    materialization, so the verify plan contains NO MinHash pipeline at
    all (md5 appears only in MinHash base hashing — the shingle-array side
    is md5-free) and the output is identical to the lazy plan's."""
    from codeclone_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"shared boilerplate text block number {i % 3}") for i in range(24)],
        ["doc_id", "text"],
    )
    lazy = dd.lsh_verified_pairs(docs, "doc_id", "text")
    mat = dd.lsh_verified_pairs(
        docs, "doc_id", "text", scratch_dir=str(tmp_path)
    )
    body = _plan(mat).split("== Physical Plan ==")[-1]
    assert "md5" not in body  # upstream consumed exactly once, via scratch
    assert sorted(map(tuple, mat.collect())) == sorted(
        map(tuple, lazy.collect())
    )


def test_filter_pushdown_to_parquet(spark, tiny_dir):
    clips = read_clips(spark, tiny_dir)
    q = clips.filter(F.col("sr_hz") == 16000).select("clip_id")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "sr_hz" in plan.split("PushedFilters")[1][:200]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables join with SMJ over co-located bucket scans —
    zero Exchange in the physical plan (the repeated-join scale path)."""
    from codeclone_spark.operators.bucketing import bucketed_join, save_bucketed

    left = spark.range(0, 1000).selectExpr(
        "concat('c', id) AS clip_id", "id % 7 AS x"
    )
    right = spark.range(0, 1000).selectExpr(
        "concat('c', id) AS clip_id", "id % 3 AS y"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(left, "t_bk_left", "clip_id", 8, path=str(tmp_path / "l"))
        save_bucketed(right, "t_bk_right", "clip_id", 8, path=str(tmp_path / "r"))
        joined = bucketed_join(spark, "t_bk_left", "t_bk_right", "clip_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        # control: the same join on unbucketed frames DOES shuffle
        plan2 = (
            left.join(right.withColumnRenamed("y", "y2"), "clip_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bk_left")
        spark.sql("DROP TABLE IF EXISTS t_bk_right")


def test_text_queries_prune_document_columns(spark):
    """Text/dedup operators over `documents` must read only the columns
    they use (ReadSchema pruned to doc_id/text), not the whole table."""
    from codeclone_spark.operators import dedup as dd

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert len(d.columns) > 2  # the pruning claim is non-trivial
    sigs = dd.minhash_signatures(dd.char_shingles(d, "doc_id", "text", dedupe=False))
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and "ReadSchema: struct<doc_id:bigint,text:string>" in scan[0], scan
