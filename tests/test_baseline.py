"""Baseline snapshot: integrity, trust states, drift math (no Spark)."""

from __future__ import annotations

import json

import pytest

from codeclone_spark.plans import baseline as bl


def _write(tmp_path):
    path = str(tmp_path / "baseline.json")
    doc = bl.write_baseline(
        path,
        stats={"dur_ms": {"count": 10, "mean": 500.0}},
        histograms={"dur_ms": {"bin_edges": [0, 1], "counts": [10]}},
        uniqueness={"clip_id_approx_ndv": 10, "clip_id_exact_dup_groups": 0},
        accepted_violations=["uniq:clip_id|p1|c1"],
    )
    return path, doc


def test_roundtrip_trusted(tmp_path):
    path, doc = _write(tmp_path)
    snap, trust = bl.load_baseline(path)
    assert trust.trusted
    assert snap["accepted_violations"] == ["uniq:clip_id|p1|c1"]
    assert snap["meta"]["payload_sha256"] == doc["meta"]["payload_sha256"]


def test_tampered_payload_untrusted(tmp_path):
    path, _ = _write(tmp_path)
    with open(path) as f:
        doc = json.load(f)
    doc["accepted_violations"].append("sneaky|p9|c9")
    with open(path, "w") as f:
        json.dump(doc, f)
    snap, trust = bl.load_baseline(path)
    assert not trust.trusted
    assert "payload_sha256 mismatch" in trust.reason


def test_schema_version_mismatch(tmp_path):
    path, _ = _write(tmp_path)
    with open(path) as f:
        doc = json.load(f)
    doc["meta"]["schema_version"] = "99.0"
    with open(path, "w") as f:
        json.dump(doc, f)
    _, trust = bl.load_baseline(path)
    assert not trust.trusted
    assert "schema_version mismatch" in trust.reason


def test_missing_baseline(tmp_path):
    snap, trust = bl.load_baseline(str(tmp_path / "nope.json"))
    assert snap is None and not trust.trusted


def test_psi_identical_zero():
    assert bl.psi([10, 20, 30], [10, 20, 30]) == pytest.approx(0.0, abs=1e-9)
    assert bl.ks_stat([10, 20, 30], [10, 20, 30]) == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_shift():
    a = [100, 100, 100, 100]
    b = [400, 10, 10, 10]
    assert bl.psi(a, b) > 0.25
    assert bl.ks_stat(a, b) > 0.25


def test_ks_bounded():
    assert 0.0 <= bl.ks_stat([1, 0], [0, 1]) <= 1.0
