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


def fingerprint_of(*parts) -> str:
    """Stable fingerprint string from config + input descriptors."""
    import hashlib

    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:16]
