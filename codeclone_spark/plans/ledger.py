"""Per-partition checkpoint ledger — the resume mechanism.

Analog of the reference's incremental cache: a durable map
``partition -> {status, rows, violations, digest, elapsed_ms, partials}``
(cache-signature semantics of ``core/discovery.py:118-190``; phase metrics
like ``analysis/phase_ledger.py:16-39``).  A partition is *done* only after
its wave's outputs AND the ledger entry are durably written (atomic rename,
reference ``_atomic_write_json`` clone_baseline.py:394-400); a re-run prunes
done partitions at the SCAN level (partition-column filter → zero bytes read)
and converges to identical final outputs.

Partials stored per partition are MERGEABLE (counts, sums, min/max, histogram
arrays) so table-level stats/drift never rescan completed partitions.
"""

from __future__ import annotations

import json
import os
from typing import Any

from codeclone_spark import LEDGER_SCHEMA_VERSION


class Ledger:
    def __init__(self, path: str):
        self.path = path
        self.doc: dict[str, Any] = {
            "ledger_schema_version": LEDGER_SCHEMA_VERSION,
            "partitions": {},
        }
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            if doc.get("ledger_schema_version") == LEDGER_SCHEMA_VERSION:
                self.doc = doc

    @property
    def partitions(self) -> dict[str, dict[str, Any]]:
        return self.doc["partitions"]

    def done_parts(self) -> set[str]:
        return {
            p for p, e in self.partitions.items() if e.get("status") == "done"
        }

    def record(self, part: str, entry: dict[str, Any]) -> None:
        self.partitions[part] = {"status": "done", **entry}

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.doc, f, sort_keys=True, indent=1)
        os.replace(tmp, self.path)


def merge_partials(entries: list[dict[str, Any]]) -> dict[str, Any]:
    """Fold per-partition partials into table-level stats (the reference's
    MetricFamily.aggregate step, metrics/registry.py:678-783)."""
    if not entries:
        return {}
    rows = sum(e["rows"] for e in entries)
    dur_null = sum(e["dur_null"] for e in entries)
    tr_null = sum(e["transcript_null"] for e in entries)
    undec = sum(e["undecodable"] for e in entries)
    mins = [e["dur_min"] for e in entries if e["dur_min"] is not None]
    maxs = [e["dur_max"] for e in entries if e["dur_max"] is not None]
    # mean from per-partition (mean, non-null count) weighted fold
    wsum = sum(
        e["dur_mean"] * (e["rows"] - e["dur_null"])
        for e in entries
        if e["dur_mean"] is not None
    )
    nn = sum(e["rows"] - e["dur_null"] for e in entries)
    hist = [0] * len(entries[0]["dur_hist"])
    for e in entries:
        for i, c in enumerate(e["dur_hist"]):
            hist[i] += c
    qsk = [0] * len(entries[0].get("dur_qsk", []))
    for e in entries:
        for i, c in enumerate(e.get("dur_qsk", [])):
            qsk[i] += c
    sr_counts: dict[str, int] = {}
    for e in entries:
        for k, v in e["sr_counts"].items():
            sr_counts[k] = sr_counts.get(k, 0) + v
    return {
        "rows": rows,
        "dur_null": dur_null,
        "transcript_null": tr_null,
        "undecodable": undec,
        "dur_min": min(mins) if mins else None,
        "dur_max": max(maxs) if maxs else None,
        "dur_mean": round(wsum / nn, 6) if nn else None,
        "dur_hist": hist,
        "dur_qsk": qsk,
        "sr_counts": dict(sorted(sr_counts.items())),
    }
