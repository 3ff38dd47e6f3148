"""Stage checkpoints + per-partition lineage — the resume layer.

Reference analog: ``load_read_write`` (``/root/reference/R/loaders.R:373-438``)
caches each stage as a PostGIS table and skips recompute when the table
exists and ``refresh`` is off; the ``ROUTINES`` map gates whole subroutines
(``/root/reference/R/runner.R:39-41``).  The engine generalizes that to:

- one Parquet directory per stage under the checkpoint root, written to a
  temp dir and atomically renamed, then marked with ``_SUCCESS`` carrying
  the input fingerprint;
- a ``lineage.jsonl`` manifest at the root with one record per output
  partition file: (stage, partition_id, input_fingerprint, rows_out,
  wall_ms, cached);
- a rerun with the same fingerprint reads the stage back instead of
  recomputing — kill the run at any stage boundary and it resumes there
  (tested in tests/test_resume.py).

Granularity is per-stage for shuffled stages (a shuffle's inputs are all
partitions, so partial shuffle output is not resumable — SURVEY.md §7.3)
and the stage list is fine-grained (features / each edge kind / assignment /
outputs) so the expensive audio pass is never repeated.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class StageCache:
    """``run(name, fingerprint, fn)``: compute-or-restore a stage Dataset."""

    def __init__(self, root: str | None):
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _success_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_SUCCESS")

    def is_done(self, name: str, fingerprint: str) -> bool:
        if not self.root:
            return False
        sp = self._success_path(name)
        if not os.path.exists(sp):
            return False
        with open(sp) as f:
            return f.read().strip() == fingerprint

    def _log_lineage(self, records: list[dict]) -> None:
        with open(os.path.join(self.root, "lineage.jsonl"), "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    def run(self, name: str, fingerprint: str, fn):
        """fn: () -> Dataset.  Returns a Dataset backed by the checkpoint."""
        import ray.data as rd

        if not self.root:
            return fn()
        out_dir = self._dir(name)
        if self.is_done(name, fingerprint):
            self._log_lineage([{
                "stage": name, "partition_id": -1,
                "input_fingerprint": fingerprint, "rows_out": -1,
                "wall_ms": 0, "cached": True,
            }])
            return rd.read_parquet(out_dir)
        t0 = time.monotonic()
        ds = fn()
        tmp = out_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)  # empty datasets write no files
        ds.write_parquet(tmp)
        wall_ms = int((time.monotonic() - t0) * 1000)
        # per-partition lineage from the written part files
        import pyarrow.parquet as pq

        records = []
        parts = sorted(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        for i, p in enumerate(parts):
            md = pq.read_metadata(os.path.join(tmp, p))
            records.append({
                "stage": name, "partition_id": i,
                "input_fingerprint": fingerprint, "rows_out": md.num_rows,
                "wall_ms": wall_ms, "cached": False, "file": p,
            })
        if not parts:
            # write_parquet of an empty Dataset may write no files; persist a
            # schema-only file so the checkpoint restores with the schema
            import pyarrow as pa

            sch = ds.schema(fetch_if_missing=True)
            if sch is None:
                # cannot checkpoint a schemaless empty dataset; pass through
                shutil.rmtree(tmp, ignore_errors=True)
                return ds
            empty = pa.table({n: pa.array([], type=t)
                              for n, t in zip(sch.names, sch.types)})
            pq.write_table(empty, os.path.join(tmp, "part-empty.parquet"))
            records.append({
                "stage": name, "partition_id": 0,
                "input_fingerprint": fingerprint, "rows_out": 0,
                "wall_ms": wall_ms, "cached": False,
            })
        os.rename(tmp, out_dir)
        with open(self._success_path(name), "w") as f:
            f.write(fingerprint)
        self._log_lineage(records)
        return rd.read_parquet(out_dir)


def partitioned_features(clips_path: str, cfg, cache: "StageCache",
                         fingerprint: str):
    """PER-PARTITION resumable feature extraction: one output Parquet part
    per INPUT file, computed by an actor pool over the pending file list and
    written atomically (tmp + rename).  A rerun lists the input files,
    skips every part whose output already exists under the current
    fingerprint, and computes only the missing ones — the partition-level
    resume the north rule asks for on the one stage that touches the wide
    audio rows (stage-level granularity remains for shuffled stages, whose
    partial output is not resumable — SURVEY.md §7.3).

    Reference analog: ``load_read_write`` caches whole tables
    (/root/reference/R/loaders.R:373-438); this is the same gate at input-
    file granularity.  Expressed with ray.data over the file list (each
    task = read one file -> featurize -> write one part) because Dataset
    map_batches cannot bind outputs to input files; this is the documented
    "raw-task-style stage" exception.
    """
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from who_owns_mass_processing_ray.stages import pool_bounds
    from who_owns_mass_processing_ray.stages.features import ExtractFeatures

    files = sorted(glob.glob(os.path.join(clips_path, "*.parquet")))
    if not files:
        files = [clips_path] if clips_path.endswith(".parquet") else files
    # The fingerprint covers config + the CONCRETE input file list with
    # sizes/mtimes, not just the path string: an input file removed, renamed
    # or rewritten in place between runs sharing a checkpoint dir must
    # invalidate the cache, else orphaned part files would be read back and
    # duplicate/resurrect rows (breaking row preservation).
    fingerprint = fingerprint_of(
        fingerprint,
        [(os.path.basename(f), os.path.getsize(f),
          int(os.path.getmtime(f) * 1000)) for f in files])

    out_dir = cache._dir("features")
    fp_path = os.path.join(out_dir, "_FINGERPRINT")
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(fp_path):
        with open(fp_path) as f:
            if f.read().strip() != fingerprint:
                shutil.rmtree(out_dir)
                os.makedirs(out_dir)
    with open(fp_path, "w") as f:
        f.write(fingerprint)

    part_of = {f: os.path.join(
        out_dir, f"part-{os.path.splitext(os.path.basename(f))[0]}.parquet")
        for f in files}
    # drop any part file not produced by the current input list (belt and
    # braces on top of the file-list fingerprint above)
    expected = {os.path.basename(p) for p in part_of.values()}
    for p in os.listdir(out_dir):
        if p.endswith(".parquet") and p not in expected:
            os.remove(os.path.join(out_dir, p))
    pending = [f for f in files if not os.path.exists(part_of[f])]
    done = [f for f in files if os.path.exists(part_of[f])]
    cache._log_lineage([{
        "stage": "features", "partition_id": i,
        "input_fingerprint": fingerprint, "rows_out": -1, "wall_ms": 0,
        "cached": True, "file": os.path.basename(part_of[f]),
    } for i, f in enumerate(done)])

    if pending:
        cfg_ref = ray.put(cfg)

        class FileWorker:
            """One task per input file: read -> featurize -> atomic write."""

            def __init__(self):
                self.ex = ExtractFeatures(ray.get(cfg_ref))

            def __call__(self, batch: pa.Table) -> pa.Table:
                rows = []
                for src, dst in zip(batch["src"].to_pylist(),
                                    batch["dst"].to_pylist()):
                    t0 = time.monotonic()
                    tbl = pq.read_table(src)
                    outs = [self.ex(tbl.slice(s, 256))
                            for s in range(0, tbl.num_rows, 256)]
                    out = pa.concat_tables(outs) if outs else self.ex(tbl)
                    tmp = dst + ".tmp"
                    pq.write_table(out, tmp)
                    os.replace(tmp, dst)
                    rows.append({
                        "file": os.path.basename(dst),
                        "rows_out": out.num_rows,
                        "wall_ms": int((time.monotonic() - t0) * 1000),
                    })
                return pa.table({
                    "file": pa.array([r["file"] for r in rows]),
                    "rows_out": pa.array([r["rows_out"] for r in rows]),
                    "wall_ms": pa.array([r["wall_ms"] for r in rows]),
                })

        items = [{"src": f, "dst": part_of[f]} for f in pending]
        lineage_tbl = rd.from_items(items).map_batches(
            FileWorker, batch_size=1, batch_format="pyarrow",
            concurrency=pool_bounds(), num_cpus=1,
        ).to_pandas()
        cache._log_lineage([{
            "stage": "features", "partition_id": len(done) + i,
            "input_fingerprint": fingerprint,
            "rows_out": int(r.rows_out), "wall_ms": int(r.wall_ms),
            "cached": False, "file": r.file,
        } for i, r in enumerate(lineage_tbl.itertuples())])
    with open(cache._success_path("features"), "w") as f:
        f.write(fingerprint)
    return rd.read_parquet(out_dir, file_extensions=["parquet"])


def fingerprint_of(*parts) -> str:
    """Stable fingerprint string from config + input descriptors."""
    import hashlib

    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:16]
