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
