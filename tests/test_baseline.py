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
    assert "schema_version incompatible" in trust.reason


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


def test_sketch_quantile_interpolation():
    # 100 values uniform over [0, 25): all in bin 0 -> interpolate inside
    counts = [100] + [0] * 128
    assert 0.0 <= bl.sketch_quantile(counts, 25, 0.5) < 25.0
    # point mass in bin 40 ([1000, 1025)) -> all quantiles inside that bin
    counts = [0] * 129
    counts[40] = 1000
    for q in (0.5, 0.95, 0.99):
        v = bl.sketch_quantile(counts, 25, q)
        assert 1000.0 <= v < 1025.0, (q, v)
    # empty sketch
    assert bl.sketch_quantile([0] * 129, 25, 0.5) is None
    # overflow bin clamps to the ceiling
    counts = [0] * 129
    counts[128] = 10
    assert bl.sketch_quantile(counts, 25, 0.99) == 128 * 25
    # monotone in q
    counts = [i for i in range(129)]
    q50 = bl.sketch_quantile(counts, 25, 0.5)
    q99 = bl.sketch_quantile(counts, 25, 0.99)
    assert q50 < q99


def _resign(path):
    """Re-sign a mutated baseline doc (valid sha; trust must come from the
    OTHER checks)."""
    doc = json.load(open(path))
    minor = int(doc["meta"]["schema_version"].split(".")[1])
    payload = {k: doc[k] for k in bl.payload_keys(minor) if k in doc}
    doc["meta"]["payload_sha256"] = bl.payload_sha256(payload)
    json.dump(doc, open(path, "w"))


def test_trust_rejects_newer_minor(tmp_path):
    path, _ = _write(tmp_path)
    doc = json.load(open(path))
    doc["meta"]["schema_version"] = "1.99"
    json.dump(doc, open(path, "w"))
    _, trust = bl.load_baseline(path)
    assert not trust.trusted and "schema_version incompatible" in trust.reason


def test_trust_rejects_other_major(tmp_path):
    path, _ = _write(tmp_path)
    doc = json.load(open(path))
    doc["meta"]["schema_version"] = "2.0"
    json.dump(doc, open(path, "w"))
    _, trust = bl.load_baseline(path)
    assert not trust.trusted and "schema_version" in trust.reason


def test_trust_accepts_older_minor_without_schema_key(tmp_path):
    """A 1.0-era baseline (no schema payload key) stays loadable: same
    major, older minor, sha computed over the keys that minor carries."""
    path, _ = _write(tmp_path)
    doc = json.load(open(path))
    doc["meta"]["schema_version"] = "1.0"
    del doc["schema"]
    payload = {k: doc[k] for k in ("stats", "histograms", "uniqueness", "accepted_violations")}
    doc["meta"]["payload_sha256"] = bl.payload_sha256(payload)
    json.dump(doc, open(path, "w"))
    snap, trust = bl.load_baseline(path)
    assert trust.trusted, trust.reason
    assert "schema" not in snap


def test_trust_rejects_engine_major_mismatch(tmp_path):
    path, _ = _write(tmp_path)
    doc = json.load(open(path))
    doc["meta"]["engine_version"] = "9.0.0"
    json.dump(doc, open(path, "w"))
    _, trust = bl.load_baseline(path)
    assert not trust.trusted and "engine_version incompatible" in trust.reason


def test_trust_rejects_malformed_accepted_keys(tmp_path):
    path, _ = _write(tmp_path)
    for bad in ("no pipes at all", "bad rule id!|p|c", "a|b", "x" * 600):
        doc = json.load(open(path))
        doc["accepted_violations"] = [bad]
        json.dump(doc, open(path, "w"))
        _resign(path)
        _, trust = bl.load_baseline(path)
        assert not trust.trusted, bad
        assert "key shape invalid" in trust.reason, bad


def test_trust_rejects_malformed_clone_keys(tmp_path):
    path, _ = _write(tmp_path)
    # valid: '<min_member_id>|<size>' keys under a rule-id family
    doc = json.load(open(path))
    doc["clones"] = {"neardup:transcript": ["clip-0001|3", "clip-0009|2"]}
    json.dump(doc, open(path, "w"))
    _resign(path)
    snap, trust = bl.load_baseline(path)
    assert trust.trusted, trust.reason
    assert snap["clones"]["neardup:transcript"] == ["clip-0001|3", "clip-0009|2"]
    for bad in (
        {"neardup:transcript": ["no-size-part"]},
        {"neardup:transcript": ["id|notanumber"]},
        {"bad family!": ["a|2"]},
        {"neardup:transcript": "a|2"},
    ):
        doc = json.load(open(path))
        doc["clones"] = bad
        json.dump(doc, open(path, "w"))
        _resign(path)
        _, trust = bl.load_baseline(path)
        assert not trust.trusted, bad
        assert "clones key shape invalid" in trust.reason, bad


def test_schema_diff_pure():
    from codeclone_spark.operators.schema_diff import schema_diff

    cur = {"a": "VARCHAR", "b": "INTEGER", "d": "BLOB"}
    base = {"a": "VARCHAR", "b": "DOUBLE", "c": "VARCHAR"}
    d = schema_diff(cur, base)
    assert d["removed"] == ["c"]
    assert d["type_changed"] == [["b", "DOUBLE", "INTEGER"]]
    assert d["added"] == ["d"]
