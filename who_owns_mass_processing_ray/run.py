"""CLI entry point — the ``ray job submit`` path.

    python -m who_owns_mass_processing_ray.run \
        --input /data/clips --output /data/dedup_out \
        --checkpoint /data/ck [--num-cpus 32] [--jaccard-thresh 0.55] ...

On a cluster, submit with ``ray job submit --working-dir . --
python -m who_owns_mass_processing_ray.run --input ... --output ...`` and
omit ``--num-cpus`` (connects to the running cluster).  A killed run
re-submitted with the same ``--checkpoint`` resumes: finished stages are
read back, the feature pass resumes at input-file granularity
(stages/checkpoint.py), and a metrics JSON is printed at the end.

This is the ONLY module besides bench.py and the test fixture that owns a
Ray session (guarded — connects to an existing cluster when one exists).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Ray-Data dedup engine")
    ap.add_argument("--input", required=True,
                    help="Parquet directory/file matching the clip contract")
    ap.add_argument("--output", required=True,
                    help="output directory (clip_to_cluster/ + clusters/)")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint root for resumable stages")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPUs (omit on a cluster)")
    ap.add_argument("--jaccard-thresh", type=float, default=None)
    ap.add_argument("--hamming-thresh", type=int, default=None)
    ap.add_argument("--components", default="auto",
                    choices=["auto", "dsu", "labelprop"])
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init()

    from who_owns_mass_processing_ray.config import DedupConfig
    from who_owns_mass_processing_ray.pipelines import dedup

    overrides = {}
    if args.jaccard_thresh is not None:
        overrides["jaccard_thresh"] = args.jaccard_thresh
    if args.hamming_thresh is not None:
        overrides["hamming_thresh"] = args.hamming_thresh
    cfg = DedupConfig(**overrides)

    t0 = time.time()
    res = dedup.dedup_pipeline(args.input, cfg,
                               checkpoint_dir=args.checkpoint,
                               components_method=args.components)
    dedup.write_outputs(res, args.output)
    n_clusters = res["clusters"].count()
    n_clips = res["clip_to_cluster"].count()
    wall = time.time() - t0
    print(json.dumps({
        "clips": n_clips,
        "clusters": n_clusters,
        "wall_sec": round(wall, 2),
        "clips_per_sec": round(n_clips / wall, 2) if wall else None,
        "output": args.output,
        "checkpoint": args.checkpoint,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
