"""Checkpoint/resume semantics (≙ reference ``load_read_write`` caching,
/root/reference/R/loaders.R:373-438, generalized to per-stage lineage)."""

from __future__ import annotations

import json
import os
import time

from who_owns_mass_processing_ray.config import DedupConfig

CFG = DedupConfig(num_parts=8)


def _lineage(root: str) -> list[dict]:
    with open(os.path.join(root, "lineage.jsonl")) as f:
        return [json.loads(l) for l in f]


class TestResume:
    def test_warm_run_all_cached(self, small_corpus, tmp_path):
        from who_owns_mass_processing_ray.pipelines import dedup

        ck = str(tmp_path / "ck")
        r1 = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                                  checkpoint_dir=ck)
        n1 = r1["clusters"].count()
        cold_records = _lineage(ck)
        assert all(not r["cached"] for r in cold_records)
        stages = {r["stage"] for r in cold_records}
        assert {"features", "edges_near", "assignment", "clusters"} <= stages

        t0 = time.time()
        r2 = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                                  checkpoint_dir=ck)
        n2 = r2["clusters"].count()
        warm_s = time.time() - t0
        assert n1 == n2
        assert warm_s < 5.0, f"warm resume took {warm_s:.1f}s"
        warm_records = _lineage(ck)[len(cold_records):]
        assert warm_records and all(r["cached"] for r in warm_records)

    def test_partial_resume_skips_finished_stages(self, small_corpus, tmp_path):
        """Kill-after-features simulation: only downstream stages recompute."""
        import shutil

        from who_owns_mass_processing_ray.pipelines import dedup

        ck = str(tmp_path / "ck2")
        dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                             checkpoint_dir=ck)["clusters"].count()
        # wipe everything downstream of features — as if the run died there
        for stage in os.listdir(ck):
            p = os.path.join(ck, stage)
            if os.path.isdir(p) and stage != "features":
                shutil.rmtree(p)
        base = len(_lineage(ck))
        res = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                                   checkpoint_dir=ck)
        assert res["clusters"].count() > 0
        new = _lineage(ck)[base:]
        cached = {r["stage"] for r in new if r["cached"]}
        recomputed = {r["stage"] for r in new if not r["cached"]}
        assert "features" in cached
        assert "edges_near" in recomputed

    def test_partition_level_feature_resume(self, small_corpus, tmp_path):
        """Deleting ONE features part file recomputes only that partition."""
        import glob
        import shutil

        from who_owns_mass_processing_ray import synth
        from who_owns_mass_processing_ray.pipelines import dedup

        # multi-file input so there are several feature partitions
        multi = str(tmp_path / "multi")
        import os

        import pyarrow.parquet as pq

        os.makedirs(f"{multi}/clips", exist_ok=True)
        src = pq.read_table(f"{small_corpus}/clips")
        for i in range(4):
            pq.write_table(src.slice(i * 100, 100),
                           f"{multi}/clips/part-{i}.parquet")
        ck = str(tmp_path / "ckp")
        dedup.dedup_pipeline(f"{multi}/clips", CFG,
                             checkpoint_dir=ck)["clusters"].count()
        parts = sorted(glob.glob(f"{ck}/features/part-*.parquet"))
        assert len(parts) == 4
        os.remove(parts[1])
        for stage in os.listdir(ck):
            p = os.path.join(ck, stage)
            if os.path.isdir(p) and stage != "features":
                shutil.rmtree(p)
        base = len(_lineage(ck))
        dedup.dedup_pipeline(f"{multi}/clips", CFG,
                             checkpoint_dir=ck)["clusters"].count()
        new = [r for r in _lineage(ck)[base:] if r["stage"] == "features"]
        cached = [r for r in new if r["cached"]]
        fresh = [r for r in new if not r["cached"]]
        assert len(cached) == 3 and len(fresh) == 1
        assert fresh[0]["file"] == "part-part-1.parquet"

    def test_config_change_invalidates(self, small_corpus, tmp_path):
        from who_owns_mass_processing_ray.pipelines import dedup

        ck = str(tmp_path / "ck3")
        dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                             checkpoint_dir=ck)["clusters"].count()
        base = len(_lineage(ck))
        cfg2 = DedupConfig(num_parts=8, jaccard_thresh=0.6)
        dedup.dedup_pipeline(f"{small_corpus}/clips", cfg2,
                             checkpoint_dir=ck)["clusters"].count()
        new = _lineage(ck)[base:]
        assert all(not r["cached"] for r in new), \
            "changed config must invalidate every stage"


class TestCheckpointInputChange:
    def test_rewritten_input_invalidates_feature_cache(self, small_corpus,
                                                       tmp_path):
        """ADVICE r1 (medium): the feature checkpoint fingerprint must cover
        the concrete input file list + contents, so an input REWRITTEN
        in place (or removed) between runs sharing a checkpoint dir can
        never resurrect stale part files / duplicate rows."""
        import shutil

        import pyarrow.parquet as pq

        from who_owns_mass_processing_ray.pipelines import dedup

        clips_dir = str(tmp_path / "clips_copy")
        shutil.copytree(f"{small_corpus}/clips", clips_dir)
        ck = str(tmp_path / "ck")
        r1 = dedup.dedup_pipeline(clips_dir, CFG, checkpoint_dir=ck)
        n1 = r1["features"].count()

        # rewrite one input file in place with HALF its rows
        files = sorted(os.listdir(clips_dir))
        victim = os.path.join(clips_dir, files[0])
        tbl = pq.read_table(victim)
        kept = tbl.num_rows // 2
        pq.write_table(tbl.slice(0, kept), victim)

        r2 = dedup.dedup_pipeline(clips_dir, CFG, checkpoint_dir=ck)
        n2 = r2["features"].count()
        assert n2 == n1 - (tbl.num_rows - kept), (
            "stale checkpoint rows resurrected after in-place input rewrite")

    def test_removed_input_drops_orphan_parts(self, small_corpus, tmp_path):
        import shutil

        from who_owns_mass_processing_ray.pipelines import dedup

        clips_dir = str(tmp_path / "clips_copy2")
        shutil.copytree(f"{small_corpus}/clips", clips_dir)
        # split the single part into two so one can be removed
        import pyarrow.parquet as pq

        files = sorted(os.listdir(clips_dir))
        src = os.path.join(clips_dir, files[0])
        tbl = pq.read_table(src)
        half = tbl.num_rows // 2
        pq.write_table(tbl.slice(0, half), os.path.join(clips_dir, "a.parquet"))
        pq.write_table(tbl.slice(half), os.path.join(clips_dir, "b.parquet"))
        os.remove(src)

        ck = str(tmp_path / "ck2")
        r1 = dedup.dedup_pipeline(clips_dir, CFG, checkpoint_dir=ck)
        n1 = r1["features"].count()
        assert n1 == tbl.num_rows

        os.remove(os.path.join(clips_dir, "b.parquet"))
        r2 = dedup.dedup_pipeline(clips_dir, CFG, checkpoint_dir=ck)
        assert r2["features"].count() == half, (
            "orphaned feature part for the removed input was read back")


def test_transient_failure_retry(ray_session, tmp_path):
    """Fault tolerance: a stage that fails transiently (first attempt per
    block) completes under ``retry_exceptions`` without data loss — the
    single-node stand-in for worker/node failures mid-run."""
    import numpy as np
    import pyarrow as pa
    import ray

    marker_dir = tmp_path / "attempts"
    marker_dir.mkdir()

    def flaky(t: pa.Table) -> pa.Table:
        key = int(t["x"][0].as_py())
        marker = marker_dir / f"blk-{key}"
        if not marker.exists():
            marker.write_text("1")
            raise OSError(f"transient failure on block {key}")
        return pa.table({"x": t["x"],
                         "y": pa.array(t["x"].to_numpy() * 2)})

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(np.arange(64, dtype=np.int64))}))
    ds = ds.repartition(8)
    out = ds.map_batches(flaky, batch_format="pyarrow",
                         retry_exceptions=[OSError]).to_pandas()
    out = out.sort_values("x").reset_index(drop=True)
    assert len(out) == 64
    assert (out["y"].to_numpy() == out["x"].to_numpy() * 2).all()
    # every block really did fail once before succeeding
    assert len(list(marker_dir.iterdir())) >= 1


class TestLanceGating:
    """io_utils.read_table_auto: Lance detection + honest gating."""

    def test_lance_suffix_detected(self, tmp_path):
        from who_owns_mass_processing_ray import io_utils
        d = tmp_path / "clips.lance"
        d.mkdir()
        assert io_utils.is_lance_dataset(str(d))

    def test_lance_manifest_layout_detected(self, tmp_path):
        from who_owns_mass_processing_ray import io_utils
        d = tmp_path / "tbl"
        (d / "_versions").mkdir(parents=True)
        (d / "data").mkdir()
        assert io_utils.is_lance_dataset(str(d))

    def test_parquet_dir_not_lance(self, small_corpus):
        from who_owns_mass_processing_ray import io_utils
        assert not io_utils.is_lance_dataset(small_corpus)

    def test_lance_without_package_raises_not_implemented(self, tmp_path):
        import pytest
        from who_owns_mass_processing_ray import io_utils
        d = tmp_path / "clips.lance"
        d.mkdir()
        try:
            import lance  # noqa: F401
            pytest.skip("lance installed; gating path not reachable")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="pylance"):
            io_utils.read_table_auto(str(d))

    def test_parquet_path_dispatches_to_parquet(self, ray_session,
                                                small_corpus):
        from who_owns_mass_processing_ray import io_utils
        import os
        ds = io_utils.read_table_auto(os.path.join(small_corpus, "clips"),
                                      columns=["clip_id"])
        assert ds.columns() == ["clip_id"]
        assert ds.count() == 400


def test_fixture_dir_content_keyed(tmp_path):
    """/tmp fixture cache must invalidate when the SOURCE file changes
    (regenerated corpus at the same path) and must never publish a
    partially-built dir."""
    import os
    import time

    import pytest

    from who_owns_mass_processing_ray.pipelines.relational import _fixture_dir

    src = tmp_path / "src.parquet"
    src.write_bytes(b"v1")
    calls = []

    def build(d):
        calls.append(d)
        with open(os.path.join(d, "out.txt"), "w") as f:
            f.write("data")

    d1 = _fixture_dir("wom_testfix", str(src), build)
    d1b = _fixture_dir("wom_testfix", str(src), build)
    assert d1 == d1b and len(calls) == 1        # cached on identical source

    time.sleep(0.01)
    src.write_bytes(b"v2-different")            # new size + mtime
    d2 = _fixture_dir("wom_testfix", str(src), build)
    assert d2 != d1 and len(calls) == 2         # invalidated

    # a failing build must not publish the final dir
    src.write_bytes(b"v3-even-more-different")

    def bad_build(d):
        raise RuntimeError("mid-write crash")

    with pytest.raises(RuntimeError):
        _fixture_dir("wom_testfix", str(src), bad_build)
    d3 = _fixture_dir("wom_testfix", str(src), build)
    assert os.path.isdir(d3) and os.listdir(d3)

    import shutil
    for d in {d1, d2, d3}:
        shutil.rmtree(d, ignore_errors=True)
