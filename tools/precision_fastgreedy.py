"""Quantify the components-vs-fast-greedy substitution (VERDICT r1 #9).

The reference clusters with igraph ``cluster_fast_greedy``
(/root/reference/R/deduplicaters.R:225-246) — community detection that can
SPLIT a connected component; the engine uses connected components (recall-
safe, may over-merge).  This script runs BOTH on the SAME verified edge set
(NetworkX ``greedy_modularity_communities`` is the same fast-greedy
modularity algorithm family) and reports the pairwise precision/recall of
components against the fast-greedy partition, so the over-merge cost of
the documented substitution is a measured number in BASELINE.md, not an
assumption.

Usage: python tools/precision_fastgreedy.py [sf_dir]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import networkx as nx
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from who_owns_mass_processing_ray.pipelines import dedup, multimodal

    if sf_dir.startswith("--clips="):
        # a raw clip-contract Parquet dir (e.g. the synth scaling corpus)
        res = dedup.dedup_pipeline(sf_dir.split("=", 1)[1], multimodal.MM_CFG)
    else:
        clips = multimodal.clips_from_documents(sf_dir)
        res = dedup.dedup_pipeline_from_dataset(clips, multimodal.MM_CFG)
    edges = res["edges"].to_pandas()
    asg = res["clip_to_cluster"].to_pandas()

    g = nx.Graph()
    g.add_nodes_from(asg.clip_id)
    g.add_edges_from(zip(edges.left_id, edges.right_id))
    fg_of: dict[str, int] = {}
    for ci, comm in enumerate(
            nx.community.greedy_modularity_communities(g)):
        for node in comm:
            fg_of[node] = ci
    comp_of = dict(zip(asg.clip_id, asg.cluster_id))

    from collections import defaultdict

    def pairs_of(mapping):
        groups = defaultdict(list)
        for k, v in mapping.items():
            groups[v].append(k)
        out = set()
        for mem in groups.values():
            mem.sort()
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    out.add((mem[i], mem[j]))
        return out

    comp_pairs = pairs_of(comp_of)
    fg_pairs = pairs_of(fg_of)
    inter = len(comp_pairs & fg_pairs)
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_clips": len(asg),
        "n_edges": len(edges),
        "components_clusters": len(set(comp_of.values())),
        "fastgreedy_clusters": len(set(fg_of.values())),
        "component_pairs": len(comp_pairs),
        "fastgreedy_pairs": len(fg_pairs),
        # pairs the components merge that fast-greedy would split
        "precision_vs_fastgreedy": round(inter / len(comp_pairs), 4)
        if comp_pairs else 1.0,
        # fast-greedy pairs the components also merge (should be 1.0 —
        # components never split a connected community)
        "recall_vs_fastgreedy": round(inter / len(fg_pairs), 4)
        if fg_pairs else 1.0,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
