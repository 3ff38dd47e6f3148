"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "clips_per_sec": ...}

``--scaling``: run the flagship dedup pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs +
scaling efficiency (the sandbox evidence for the north rule's N vs 4N
cluster-size criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline set: flagship + one representative per operator family
HEADLINE = [
    "dedup_clusters",      # flagship end-to-end dedup DAG (audio + text)
    "minhash_near_dup",    # MinHash+LSH near-dup
    "exact_dedup",         # hash-partition exact dedup
    "simhash_near_dup",    # SimHash near-dup
    "knn_brute",           # similarity search baseline
    "embed_near_dup",      # embedding near-dup
    "lineitem_agg",        # relational aggregate
    "join_agg",            # broadcast join + aggregate
    "quality_score",       # text analysis
    "cascade_norm",        # rule-cascade normalizer (r2)
    "sessionize",          # event-stream sessionization (r3)
    "tfidf_terms",         # corpus-stats TF-IDF ranking (r3)
]


def _sf_of(path: str) -> float:
    try:
        return float(path.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        return -1.0


def run_bench(flagship_only: bool = False) -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    names = ["dedup_clusters"] if flagship_only else HEADLINE
    times: dict[str, float] = {}
    n_clips = 0
    for name in names:
        t0 = time.time()
        res = qs[name](SF_DIR)
        # consume the stream (count() for datasets, len for tables)
        n = res.count() if hasattr(res, "count") else len(res)
        times[name] = round(time.time() - t0, 3)
        if name == "dedup_clusters":
            import pyarrow.parquet as pq

            n_clips = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_pipelines_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
    }
    if "dedup_clusters" in times and times["dedup_clusters"] > 0:
        out["clips_per_sec"] = round(n_clips / times["dedup_clusters"], 2)
    ray.shutdown()
    return out


# sized so the flagship is compute-dominated at 32 CPUs (fixed stage
# orchestration otherwise caps measurable scaling on a single node)
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "80000"))
SCALING_DIR = os.environ.get("GRAFT_SCALING_DIR", "/tmp/graft_scaling_corpus")


def run_scaling_worker(cpus: int) -> dict:
    """One fresh-process flagship run over the dedicated scaling corpus
    (synthesized once, cached on disk — identical bytes for both runs)."""
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from who_owns_mass_processing_ray import synth
    from who_owns_mass_processing_ray.pipelines import dedup

    synth.generate_clips_parquet(SCALING_DIR, SCALING_ROWS, seed=42)
    t0 = time.time()
    res = dedup.dedup_pipeline(f"{SCALING_DIR}/clips")
    n_clusters = res["clusters"].count()
    dt = time.time() - t0
    ray.shutdown()
    return {"cpus": cpus, "sec": round(dt, 3), "rows": SCALING_ROWS,
            "clusters": n_clusters,
            "clips_per_sec": round(SCALING_ROWS / dt, 2)}


def run_scaling() -> dict:
    """Same flagship job + same input, fresh processes at 8 and 32 CPUs —
    the sandbox evidence for the north rule's N vs 4N cluster criterion."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--scaling-worker", str(cpus)],
            capture_output=True, text=True, env=env, timeout=3600)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"scaling worker {cpus} failed: "
                               f"{proc.stderr[-2000:]}")
        results[cpus] = json.loads(lines[-1])
    thr8 = results[8]["clips_per_sec"]
    thr32 = results[32]["clips_per_sec"]
    eff = (thr32 / thr8) / 4.0
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "fraction",
        "queries": {"dedup_8cpu_sec": results[8]["sec"],
                    "dedup_32cpu_sec": results[32]["sec"]},
        "throughput_clips_per_sec": {"8": thr8, "32": thr32},
        "speedup": round(thr32 / thr8, 3),
        "rows": SCALING_ROWS,
        "clusters": [results[8]["clusters"], results[32]["clusters"]],
        "num_cpus": [8, 32],
    }


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--scaling-worker") + 1])
        print(json.dumps(run_scaling_worker(cpus)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--flagship-json" in sys.argv:
        print(json.dumps(run_bench(flagship_only=True)))
    else:
        print(json.dumps(run_bench()))
