"""Scoped report-query surface: answers from persisted outputs only
(reference blast_radius / patch_verify analog — "one compute, many
surfaces", README:191-206)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from codeclone_spark.plans.report_query import _sink_rows, query_run


def _out(tiny_run) -> str:
    return os.path.dirname(tiny_run.violations_path)


def test_failed_gates_match_report(tiny_run):
    res = query_run(_out(tiny_run), failed_only=True, limit=0)
    got = {(r["partition"], r["rule_id"]) for r in res["verdicts"]["rows"]}
    want = {
        (g["partition"], g["rule_id"])
        for g in tiny_run.report["findings"]["failed_gates"]
    }
    assert got == want and got


def test_rule_scope_and_true_totals(tiny_run):
    rule = "ref:fixture_missing"
    res = query_run(_out(tiny_run), rule=rule, limit=5)
    assert {r["rule_id"] for r in res["verdicts"]["rows"]} == {rule}
    # dense grid: every partition answers for the rule
    assert res["verdicts"]["n"] == tiny_run.report["inventory"]["partitions"]
    assert len(res["violations"]["rows"]) == 5  # capped by --limit ...
    # ... but true totals come from the report, never the row stream
    want_total = tiny_run.report["findings"]["by_rule"][rule]
    assert res["violations"]["true_totals_by_rule"] == {rule: want_total}
    assert res["violations"]["n_exemplar_rows"] == want_total


def test_partition_scope(tiny_run):
    part = tiny_run.report["findings"]["failed_gates"][0]["partition"]
    res = query_run(_out(tiny_run), partition=part, limit=0)
    assert {r["partition"] for r in res["verdicts"]["rows"]} == {part}
    assert {r["partition"] for r in res["violations"]["rows"]} == {part}


def test_new_only_cells_confine_exemplars(tiny_run):
    # tiny_run has no baseline: every violated cell is NEW, so the
    # new-only exemplar stream equals the full one
    res = query_run(_out(tiny_run), new_only=True, limit=0)
    assert all(r["novelty"] == "new" for r in res["verdicts"]["rows"])
    full = query_run(_out(tiny_run), limit=0)
    assert (
        res["violations"]["n_exemplar_rows"]
        == full["violations"]["n_exemplar_rows"]
    )


def test_sink_rows_prunes_partitioned_layout(tmp_path):
    base = tmp_path / "violations"
    hot = base / "rule_id=a%3Ab"
    cold = base / "rule_id=other"
    hot.mkdir(parents=True)
    cold.mkdir()
    pq.write_table(
        pa.table({"partition": ["p1"], "clip_id": ["c1"]}),
        hot / "part-0.parquet",
    )
    pq.write_table(
        pa.table({"partition": ["p2"], "clip_id": ["c2"]}),
        cold / "part-0.parquet",
    )
    rows = list(_sink_rows(str(base), "a:b"))
    assert rows == [{"rule_id": "a:b", "partition": "p1", "clip_id": "c1"}]
    # flat fallback still filters by value
    assert {r["clip_id"] for r in _sink_rows(str(base))} == {"c1", "c2"}


def test_cli_query_json(tiny_run, capsys):
    from codeclone_spark.cli import main

    rc = main(
        [
            "query",
            "--out-dir",
            _out(tiny_run),
            "--failed-gates",
            "--limit",
            "3",
        ]
    )
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["filters"]["failed_only"] is True
    assert doc["verdicts"]["n"] > 0
    assert len(doc["violations"]["rows"]) <= 3


def test_cli_query_missing_run(tmp_path, capsys):
    from codeclone_spark import EXIT_CONTRACT_ERROR
    from codeclone_spark.cli import main

    rc = main(["query", "--out-dir", str(tmp_path / "nope")])
    assert rc == EXIT_CONTRACT_ERROR
