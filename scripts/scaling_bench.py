"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction we run
the IDENTICAL validation job at two local parallelism levels (default
local[8] vs local[32]) on the same input, in fresh JVMs, and report
throughput at both plus efficiency = T(N) / T(4N) / 4 ... precisely:
efficiency = throughput(4N) / (4 * throughput(N)).

Writes BENCH.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [profile] [n_low] [n_high] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from codeclone_spark.session import get_spark
from codeclone_spark.plans.runner import RunConfig, run

cores = {cores}
data_dir = {data_dir!r}
spark = get_spark(app_name=f"scaling-{{cores}}", cores=cores,
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
# warmup (JVM/Arrow init + file listing), then measured runs
times = []
digests = set()
for i in range({runs} + 1):
    out = f"/tmp/scaling_out_{{cores}}_{{i}}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    res = run(spark, RunConfig(data_dir=data_dir, out_dir=out, gating=False))
    dt = time.monotonic() - t0
    digests.add(res.report["integrity"]["run_digest"])
    if i > 0:
        times.append(dt)
    shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{"cores": cores, "times": times,
                              "digests": sorted(digests)}}))
"""


def run_level(cores: int, data_dir: str, runs: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, data_dir=data_dir, runs=runs)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    profile = sys.argv[1] if len(sys.argv) > 1 else "bench"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    sys.path.insert(0, REPO)
    from codeclone_spark.synth import ensure_profile

    data_dir = ensure_profile(os.path.join(REPO, "testclips"), profile)
    with open(os.path.join(data_dir, "manifest.json")) as f:
        n_clips = json.load(f)["n_total_rows"]

    lo = run_level(n_low, data_dir, runs)
    hi = run_level(n_high, data_dir, runs)

    t_lo = statistics.median(lo["times"])
    t_hi = statistics.median(hi["times"])
    thr_lo = n_clips / t_lo
    thr_hi = n_clips / t_hi
    eff = thr_hi / ((n_high / n_low) * thr_lo)
    det_ok = len(set(lo["digests"]) | set(hi["digests"])) == 1

    result = {
        "profile": profile,
        "clips": n_clips,
        "n_low": n_low,
        "n_high": n_high,
        "runs": runs,
        "median_sec_low": round(t_lo, 3),
        "median_sec_high": round(t_hi, 3),
        "throughput_low_clips_per_sec": round(thr_lo, 1),
        "throughput_high_clips_per_sec": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "determinism_digest_identical": det_ok,
        "all_times_low": [round(t, 3) for t in lo["times"]],
        "all_times_high": [round(t, 3) for t in hi["times"]],
    }
    print(json.dumps(result))

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North rule: throughput scaling efficiency >= 0.8 between N and 4N
executors.  No real cluster exists in this sandbox, so per the driver
instruction the criterion is evidenced by the identical end-to-end
validation job at two local parallelism levels on the same input (fresh
JVM per level, {runs} measured runs after 1 warmup, median reported).

| quantity | value |
|---|---|
| corpus | `{profile}` profile, {n_clips} clips |
| N (cores) | local[{n_low}] |
| 4N (cores) | local[{n_high}] |
| median wall (N) | {t_lo:.3f} s |
| median wall (4N) | {t_hi:.3f} s |
| throughput (N) | {thr_lo:.1f} clips/s |
| throughput (4N) | {thr_hi:.1f} clips/s |
| **scaling efficiency** = thr(4N) / (4 x thr(N)) | **{eff:.3f}** |
| determinism (run digests identical across all runs/levels) | {det_ok} |

Raw times (s): N={result["all_times_low"]}, 4N={result["all_times_high"]}

Reproduce: `python scripts/scaling_bench.py {profile} {n_low} {n_high} {runs}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
