"""Interleaved A/B of `validation_full` between two engine checkouts.

Pins down cross-round bench deltas that single-window numbers cannot: this
sandbox's host has 3-6x CPU-steal waves (see BENCH.md variance notes), so
the ONLY meaningful comparison is alternating cold runs of both engines in
one window — fresh JVM per run, same tmpfs-staged corpus, min-of-k per
engine, a single-thread busy-loop probe and /proc/stat steal% recorded
around every run.  Per-stage phase walls come from the runner's report so
a real regression names its stage.

Usage:
    python scripts/ab_bench.py <repo_a> <repo_b> [data_dir] [rounds] [cores]
    # e.g. python scripts/ab_bench.py /root/repo /tmp/r3wt \
    #          /dev/shm/ccspark_bench_bench 5 32
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SNIPPET = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from codeclone_spark.session import get_spark
from codeclone_spark.plans.runner import RunConfig, run

spark = get_spark(app_name="ab-bench", cores={cores},
                  shuffle_partitions={cores})
spark.sparkContext.setLogLevel("ERROR")

def _steal():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return v[7], sum(v)

out = "/tmp/ab_bench_out"
shutil.rmtree(out, ignore_errors=True)
s0, tot0 = _steal()
t0 = time.monotonic()
res = run(spark, RunConfig(data_dir={data!r}, out_dir=out, gating=False))
dt = time.monotonic() - t0
s1, tot1 = _steal()
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{
    "t": round(dt, 2),
    "steal_pct": round(100.0 * (s1 - s0) / max(tot1 - tot0, 1), 2),
    "digest": res.report["integrity"]["run_digest"],
    "phases": res.report["phases"],
}}))
spark.stop()
"""


def _settle() -> None:
    for _ in range(60):
        out = subprocess.run(
            ["pgrep", "-f", "pyspark-shell|pyspark.daemon"],
            capture_output=True,
            text=True,
        )
        if not out.stdout.strip():
            break
        time.sleep(2)
    time.sleep(3)


def _busy_probe() -> float:
    """Wall of a fixed single-thread busy loop — host-pressure canary."""
    t0 = time.monotonic()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.monotonic() - t0, 2)


def run_one(repo: str, data: str, cores: int) -> dict:
    _settle()
    code = SNIPPET.format(repo=repo, data=data, cores=cores)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "12g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    repo_a = sys.argv[1]
    repo_b = sys.argv[2]
    data = sys.argv[3] if len(sys.argv) > 3 else "/dev/shm/ccspark_bench_bench"
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    cores = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    results: dict[str, list[dict]] = {repo_a: [], repo_b: []}
    for r in range(rounds):
        for repo in (repo_a, repo_b):
            probe = _busy_probe()
            res = run_one(repo, data, cores)
            res["busy_probe_s"] = probe
            results[repo].append(res)
            print(
                f"round {r} {os.path.basename(repo)}: t={res['t']}s "
                f"steal={res['steal_pct']}% probe={probe}s",
                flush=True,
            )

    summary = {}
    for repo, rs in results.items():
        ts = sorted(x["t"] for x in rs)
        # min-of-k phase walls for the stage-level diff
        phases = {}
        for k in rs[0]["phases"]:
            phases[k] = min(x["phases"].get(k, 0.0) for x in rs)
        summary[repo] = {
            "walls": [x["t"] for x in rs],
            "min": ts[0],
            "median": ts[len(ts) // 2],
            "steal_pct": [x["steal_pct"] for x in rs],
            "busy_probe_s": [x["busy_probe_s"] for x in rs],
            "digests": sorted({x["digest"] for x in rs}),
            "phases_min": {k: round(v, 2) for k, v in phases.items()},
        }
    a, b = summary[repo_a], summary[repo_b]
    summary["min_ratio_a_over_b"] = round(a["min"] / b["min"], 3)
    summary["median_ratio_a_over_b"] = round(a["median"] / b["median"], 3)
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
