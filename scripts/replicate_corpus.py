"""Build a K-fold replica of a synth corpus for large-scale scaling runs.

The scaling evidence (north rule: >=0.8 N->4N efficiency) needs a corpus
~10x the bench profile so the parallel work W dwarfs the constant serial
driver latency C.  Generating 600k clips through the per-row synth loop
would cost tens of minutes and tens of GB of driver RAM; replication is
arrow-native and memory-bounded per partition file instead:

every clips / fixtures_pcm partition file and fixtures_ref.parquet is read
once and written K times with the clip_id column prefixed `r<k>-` (and
nothing else changed), so

- replicas are disjoint in clip_id -> table-level uniqueness behaves like
  a K-times-larger table with the SAME planted dup-rate,
- clips <-> fixture joins stay consistent inside each replica,
- every planted violation class scales exactly K-fold,
- the result is deterministic (no RNG at all).

Output goes to tmpfs by default (the corpus exists only to be measured).

Usage: python scripts/replicate_corpus.py [profile] [K] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _replicate_file(src: str, dst_dir: str, k: int, id_cols: list[str]) -> int:
    os.makedirs(dst_dir, exist_ok=True)
    tbl = pq.read_table(src)
    n = 0
    for r in range(k):
        out = tbl
        for c in id_cols:
            idx = out.schema.get_field_index(c)
            out = out.set_column(
                idx, c, pc.binary_join_element_wise(f"r{r}-", out.column(c), "")
            )
        pq.write_table(out, os.path.join(dst_dir, f"rep{r}-{os.path.basename(src)}"))
        n += out.num_rows
    return n


def replicate(src_dir: str, out_dir: str, k: int) -> dict:
    with open(os.path.join(src_dir, "manifest.json")) as f:
        src_m = json.load(f)
    total = 0
    for ds, id_cols in (("clips", ["clip_id"]), ("fixtures_pcm", ["clip_id"])):
        root = os.path.join(src_dir, ds)
        for pdir in sorted(os.listdir(root)):
            if not pdir.startswith("part="):
                continue
            src_part = os.path.join(root, pdir)
            dst_part = os.path.join(out_dir, ds, pdir)
            for fn in sorted(os.listdir(src_part)):
                if fn.endswith(".parquet"):
                    n = _replicate_file(
                        os.path.join(src_part, fn), dst_part, k, id_cols
                    )
                    if ds == "clips":
                        total += n
    # fixtures_ref is one flat file: concat K prefixed copies
    tbl = pq.read_table(os.path.join(src_dir, "fixtures_ref.parquet"))
    parts = []
    for r in range(k):
        idx = tbl.schema.get_field_index("clip_id")
        parts.append(
            tbl.set_column(
                idx, "clip_id",
                pc.binary_join_element_wise(f"r{r}-", tbl.column("clip_id"), ""),
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, "fixtures_ref.parquet")
    )

    manifest = {
        **{key: src_m[key] for key in ("synth_version", "seed", "buckets",
                                       "codecs", "partitions")},
        "profile": f"{src_m['profile']}-x{k}",
        "replicas": k,
        "n_base_rows": src_m["n_base_rows"] * k,
        "n_total_rows": src_m["n_total_rows"] * k,
        "planted_counts": {
            key: v * k for key, v in src_m["planted_counts"].items()
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    return manifest


def main() -> None:
    profile = sys.argv[1] if len(sys.argv) > 1 else "bench"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/dev/shm/scaling_{profile}_x{k}"
    )
    sys.path.insert(0, REPO)
    from codeclone_spark.synth import ensure_profile

    src = ensure_profile(os.path.join(REPO, "testclips"), profile)
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        print(json.dumps({"out_dir": out_dir, "status": "exists"}))
        return
    m = replicate(src, out_dir, k)
    print(json.dumps({"out_dir": out_dir, "n_total_rows": m["n_total_rows"]}))


if __name__ == "__main__":
    main()
