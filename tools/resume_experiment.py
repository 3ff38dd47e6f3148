"""Kill-and-resume at bench scale (round-4 verdict ask #7).

The north rule requires "resumes mid-run without recomputation".
tests/test_resume.py proves the mechanism at 300 rows; this measures it on
the 80k bench corpus:

1. COLD reference run with a checkpoint dir (full wall).
2. Fresh checkpoint dir; launch the same run and SIGKILL it mid-flight
   (default: at ~45% of the cold wall — inside the edge stages).
3. RESUME run over the killed checkpoint; record wall, the per-stage
   cached/computed split from lineage.jsonl, and resumed/cold ratio.

Usage: python tools/resume_experiment.py [kill_fraction]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

CORPUS = os.environ.get("GRAFT_SCALING_DIR", "/tmp/graft_scaling_corpus")
CK = "/tmp/resume80k_ck"

WORKER = r"""
import ray, time, sys
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from who_owns_mass_processing_ray.pipelines import dedup
t0 = time.time()
res = dedup.dedup_pipeline(sys.argv[1] + "/clips",
                           checkpoint_dir=sys.argv[2])
n = res["clusters"].count()
print(f"RESULT {n} {round(time.time() - t0, 2)}", flush=True)
ray.shutdown()
"""


def _run(ck: str, kill_after: float | None = None) -> dict:
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-c", WORKER, CORPUS, ck],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, start_new_session=True)
    if kill_after is not None:
        time.sleep(kill_after)
        # SIGKILL the whole process group: raylet + workers die like a
        # node failure, nothing flushes gracefully
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait()
        return {"killed_after_sec": round(time.time() - t0, 2)}
    out, _ = proc.communicate(timeout=3600)
    line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
    _, clusters, wall = line.split()
    return {"wall_sec": float(wall), "clusters": int(clusters),
            "total_sec": round(time.time() - t0, 2)}


def _lineage_stages(ck: str, skip: int = 0) -> dict:
    """Per-stage computed/cached partition counts from lineage.jsonl
    (``skip`` ignores records already present before the run)."""
    stages: dict[str, dict] = {}
    path = os.path.join(ck, "lineage.jsonl")
    if not os.path.exists(path):
        return stages
    with open(path) as f:
        lines = f.readlines()[skip:]
    for line in lines:
        rec = json.loads(line)
        st = stages.setdefault(rec["stage"], {"computed": 0, "cached": 0})
        st["cached" if rec.get("cached") else "computed"] += 1
    return stages


def _lineage_len(ck: str) -> int:
    path = os.path.join(ck, "lineage.jsonl")
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return sum(1 for _ in f)


def main() -> None:
    kill_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.45

    subprocess.run(["rm", "-rf", CK + "_cold", CK], check=False)
    cold = _run(CK + "_cold")

    kill_at = round(cold["wall_sec"] * kill_frac, 1)
    killed = _run(CK, kill_after=kill_at)
    stages_at_kill = _lineage_stages(CK)

    n_before = _lineage_len(CK)
    resumed = _run(CK)
    stages_after = _lineage_stages(CK, skip=n_before)   # resume-run only

    out = {
        "metric": "resume_at_bench_scale",
        "corpus": CORPUS,
        "cold_wall_sec": cold["wall_sec"],
        "cold_clusters": cold["clusters"],
        "killed_at_sec": kill_at,
        "stages_checkpointed_at_kill": stages_at_kill,
        "resumed_wall_sec": resumed["wall_sec"],
        "resumed_clusters": resumed["clusters"],
        "resume_run_stage_partitions": stages_after,
        "resume_ratio": round(resumed["wall_sec"] / cold["wall_sec"], 3),
        "clusters_match": cold["clusters"] == resumed["clusters"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
