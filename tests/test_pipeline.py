"""End-to-end pipeline tests: recall vs planted truth, determinism,
components-method equivalence, edge-kind coverage."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from who_owns_mass_processing_ray.config import DedupConfig

CFG = DedupConfig(num_parts=8)


@pytest.fixture(scope="module")
def results(small_corpus):
    from who_owns_mass_processing_ray.pipelines import dedup

    res = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG)
    c2c = res["clip_to_cluster"].to_pandas()
    clusters = res["clusters"].to_pandas()
    edges = res["edges"].to_pandas()
    truth = pq.read_table(f"{small_corpus}/truth_pairs").to_pandas()
    return c2c, clusters, edges, truth


class TestRecall:
    def test_every_row_assigned(self, results):
        c2c, clusters, _, _ = results
        assert len(c2c) == 400
        assert c2c["clip_id"].is_unique
        assert set(c2c["cluster_id"]) == set(clusters["cluster_id"])

    def test_dup_pair_recall(self, results):
        """North-rule gate: recall >= 0.99 on planted dup pairs."""
        c2c, _, _, truth = results
        amap = dict(zip(c2c.clip_id, c2c.cluster_id))
        hits = sum(amap[l] == amap[r]
                   for l, r in zip(truth.left_id, truth.right_id))
        assert hits / len(truth) >= 0.99, f"{hits}/{len(truth)}"

    def test_all_kinds_detected(self, results):
        """Each planted dup kind must be caught by its designed stage."""
        c2c, _, _, truth = results
        amap = dict(zip(c2c.clip_id, c2c.cluster_id))
        by_kind = truth.assign(
            hit=[amap[l] == amap[r]
                 for l, r in zip(truth.left_id, truth.right_id)]
        ).groupby("kind")["hit"].mean()
        for kind, rate in by_kind.items():
            assert rate >= 0.95, f"kind {kind}: recall {rate}"

    def test_edge_kinds_present(self, results):
        _, _, edges, _ = results
        kinds = set(edges["kind"])
        assert {"exact", "near", "audio"} <= kinds, kinds

    def test_cluster_stats_consistent(self, results):
        c2c, clusters, _, _ = results
        sizes = c2c.groupby("cluster_id").size()
        merged = clusters.set_index("cluster_id")["size"]
        assert (sizes.sort_index() == merged.sort_index()).all()
        # canonical member belongs to its own cluster
        amap = dict(zip(c2c.clip_id, c2c.cluster_id))
        for cid, canon in zip(clusters.cluster_id, clusters.canonical_clip_id):
            assert amap[canon] == cid


class TestComponentsEquivalence:
    def test_dsu_equals_labelprop(self, small_corpus):
        """Both component implementations must produce the same partition."""
        from who_owns_mass_processing_ray.pipelines import dedup

        r1 = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                                  components_method="dsu")
        r2 = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG,
                                  components_method="labelprop")
        a1 = r1["clip_to_cluster"].to_pandas().set_index("clip_id")["cluster_id"]
        a2 = r2["clip_to_cluster"].to_pandas().set_index("clip_id")["cluster_id"]
        assert (a1.sort_index() == a2.sort_index()).all()

    def test_starcontract_random_graphs(self, ray_session):
        """Star contraction == python DSU on adversarial topologies: long
        chains (worst case for propagation), cliques, random sparse."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from who_owns_mass_processing_ray.config import DedupConfig
        from who_owns_mass_processing_ray.stages import components

        rng = np.random.default_rng(5)
        edges = []
        # 3 chains of length 120 (diameter stress)
        for c in range(3):
            base = c * 1000
            edges += [(f"n{base + i:05d}", f"n{base + i + 1:05d}")
                      for i in range(120)]
        # 2 cliques of 15
        for c in range(2):
            base = 5000 + c * 100
            ids = [f"n{base + i:05d}" for i in range(15)]
            edges += [(a, b) for i, a in enumerate(ids)
                      for b in ids[i + 1:]]
        # random sparse over 400 nodes
        for _ in range(300):
            a, b = rng.integers(8000, 8400, 2)
            if a != b:
                edges.append((f"n{a:05d}", f"n{b:05d}"))
        ds = rd.from_arrow(pa.table({
            "left_id": pa.array([e[0] for e in edges]),
            "right_id": pa.array([e[1] for e in edges]),
        }))
        got = components.components_labelprop(ds, DedupConfig(), 16) \
            .to_pandas().set_index("clip_id")["root_id"]

        # reference: python union-find with min-root convention
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        want = {n: find(n) for n in parent}
        assert len(got) == len(want)
        for n, r in want.items():
            assert got[n] == r, (n, got[n], r)


class TestDeterminism:
    def test_rerun_identical(self, small_corpus):
        from who_owns_mass_processing_ray.pipelines import dedup

        runs = []
        for _ in range(2):
            res = dedup.dedup_pipeline(f"{small_corpus}/clips", CFG)
            df = res["clip_to_cluster"].to_pandas() \
                .sort_values("clip_id").reset_index(drop=True)
            runs.append(df[["clip_id", "cluster_id"]])
        assert runs[0].equals(runs[1])

    def test_sequential_equals_overlapped(self, small_corpus):
        """The edge-stage scheduling policy (sequential materialize vs
        overlapped lazy union, gated on cfg.sequential_stage_rows) must not
        change output — forcing the big-input sequential branch on the small
        corpus yields the identical assignment."""
        import dataclasses

        from who_owns_mass_processing_ray.pipelines import dedup

        dfs = []
        for kw in (
            {"sequential_stage_rows": 10**9},           # overlap branch
            {"sequential_stage_rows": 0},               # sequential branch
            {"sequential_stage_rows": 0,
             "verify_rows_per_block": 500},             # many tiny verify blocks
        ):
            cfg = dataclasses.replace(CFG, **kw)
            res = dedup.dedup_pipeline(f"{small_corpus}/clips", cfg)
            dfs.append(res["clip_to_cluster"].to_pandas()
                       .sort_values("clip_id").reset_index(drop=True)
                       [["clip_id", "cluster_id"]])
        assert dfs[0].equals(dfs[1])
        assert dfs[0].equals(dfs[2])


def test_cli_entrypoint_smoke(tmp_path):
    """The ray-job-submit entry (run.py) end to end in a subprocess: runs
    the flagship over the 300-clip corpus, writes outputs, prints the JSON
    summary, and a second run with the same checkpoint resumes from cache
    (wall well under the cold run)."""
    import json
    import subprocess
    import sys

    from who_owns_mass_processing_ray import synth

    synth.generate_clips_parquet("/tmp/clips300", 300, seed=42,
                                 use_ray=False)   # cached across tests
    out = tmp_path / "out"
    ck = tmp_path / "ck"

    def run_once():
        proc = subprocess.run(
            [sys.executable, "-m", "who_owns_mass_processing_ray.run",
             "--input", "/tmp/clips300/clips", "--output", str(out),
             "--checkpoint", str(ck), "--num-cpus", "4"],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    cold = run_once()
    assert cold["clips"] == 300 and cold["clusters"] == 240
    assert (out / "clusters").exists() and (out / "clip_to_cluster").exists()
    warm = run_once()
    assert warm["clusters"] == 240
    assert warm["wall_sec"] < cold["wall_sec"]

