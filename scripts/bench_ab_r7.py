"""Interleaved A/B attributing the r6 quiet-bench drift (VERDICT r6 item 2).

Question: the r6 quiet bench moved 23.7s → 27.77s vs r5-final, with the
two scan-heaviest stages (decode +25%, knn_join +36%) moving most while
shuffle-dominated stages barely moved. The one bench-path change in r6
that touches every parquet scan is columnarReaderBatchSize 4096 → 512
(commit 5dde8ae, an sf0.4 OOM fix). Is the batch size the cause?

Design: four legs, interleaved within each round so box drift hits all
legs equally, rotation of leg order across rounds so no leg always runs
first/last:

  r5code  — r5-final tree (worktree @ 30b1ecd), stock 4096 batch
  r7@512  — current HEAD, SPARK_GRAFT_READER_BATCH=512 (the r6 default)
  r7@2048 — current HEAD, batch 2048
  r7@4096 — current HEAD, batch 4096 (stock, = the r5 reader config)

Stages: decode, knn_join, fused_pipeline (the movers + the headline),
sf0.1, local[32], BENCH_REPEATS=2 per leg-round (bench.py keeps the
best repeat and records foreign_cores per run). Verdict rule: if
r7@4096 ≈ r5code and r7@512 is the slow one, the drift is the reader
batch; if r7@512 ≈ r7@4096, the drift is elsewhere in the r6 diff.

Writes BENCH_AB_R7.json. Run on a quiet box (checks loadavg first).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = "/root/repo"
R5_TREE = os.path.join(REPO, "data", "ab_r5final")
STAGES = "decode,knn_join,fused_pipeline"
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
OUT = os.environ.get("AB_OUT", os.path.join(REPO, "BENCH_AB_R7.json"))

LEGS = {
    "r5code": {"cwd": R5_TREE, "env": {}},
    "r7@512": {"cwd": REPO, "env": {"SPARK_GRAFT_READER_BATCH": "512"}},
    "r7@2048": {"cwd": REPO, "env": {"SPARK_GRAFT_READER_BATCH": "2048"}},
    "r7@4096": {"cwd": REPO, "env": {"SPARK_GRAFT_READER_BATCH": "4096"}},
}


def run_leg(name: str, spec: dict) -> dict:
    env = dict(os.environ)
    env.update(spec["env"])
    env.update({
        "BENCH_STAGES": STAGES,
        "BENCH_REPEATS": "2",
        "SPARK_GRAFT_LOCAL_DIR": os.path.join(REPO, "data", "spark_local"),
        "PYTHONPATH": spec["cwd"],
    })
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd=spec["cwd"],
                       env=env, capture_output=True, text=True, timeout=900)
    line = next((ln for ln in p.stdout.splitlines()
                 if ln.startswith("{") and '"queries"' in ln), None)
    if line is None:
        raise RuntimeError(f"{name}: no JSON line\n{p.stdout[-2000:]}\n"
                           f"{p.stderr[-2000:]}")
    j = json.loads(line)
    return {"leg": name, "wall_s": round(time.time() - t0, 1),
            "queries": j["queries"], "contended": j.get("contended"),
            "contended_stages": j.get("contended_stages"),
            "runs": {k: v for k, v in j.items()
                     if k in ("foreign_gate_cores",)}}


def main() -> None:
    load1 = float(open("/proc/loadavg").read().split()[0])
    print(f"loadavg(1m)={load1}", flush=True)
    results = []
    order = list(LEGS)
    for rnd in range(ROUNDS):
        # rotate so each leg takes each position (JIT/page-cache fairness)
        rotated = order[rnd % len(order):] + order[:rnd % len(order)]
        for name in rotated:
            r = run_leg(name, LEGS[name])
            r["round"] = rnd
            results.append(r)
            print(json.dumps(r), flush=True)

    summary = {}
    for name in LEGS:
        legs = [r for r in results if r["leg"] == name]
        summary[name] = {
            stage: {
                "best": round(min(r["queries"][stage] for r in legs), 2),
                "median": round(statistics.median(
                    r["queries"][stage] for r in legs), 2),
            }
            for stage in STAGES.split(",")
        }
        summary[name]["contended_rounds"] = sum(
            1 for r in legs if r.get("contended"))
    art = {
        "metric": "ab_reader_batch_r7", "stages": STAGES.split(","),
        "rounds": ROUNDS, "repeats_per_leg": 2, "sf": 0.1,
        "legs": {n: {"cwd": os.path.relpath(s["cwd"], REPO) or ".",
                     "env": s["env"]} for n, s in LEGS.items()},
        "r5_ref_commit": "30b1ecd", "loadavg_start": load1,
        "summary": summary, "runs": results,
    }
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
