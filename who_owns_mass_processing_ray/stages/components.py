"""Connected components over the union of all edge kinds — the engine's
clustering reduce (≙ reference ``dedupe_igraph`` / ``dedupe_network``,
``/root/reference/R/deduplicaters.R:225-288``).

The reference runs igraph ``cluster_fast_greedy`` — community detection,
which can SPLIT a connected component.  Per SURVEY.md §7.3 the north rule
pins dup-pair recall >= 0.99, which connected components satisfy (they
over-merge, never under-merge, relative to fast-greedy); that substitution
is deliberate and documented here.

Two implementations with identical output:

- **driver DSU** (default, ``method="dsu"``): stream the edge dataset's
  (left,right) pairs to the driver (edges ≈ O(dup pairs) ≪ rows) into a
  union-find with path compression; root = lexicographic min clip_id of the
  component, so cluster identity is deterministic under any parallelism.
- **distributed min-label propagation** (``method="labelprop"``, the 100 TB
  path when edges exceed ``cfg.dsu_edge_limit``): iterate
  label(v) <- min(label(v), min label over neighbors) via
  join + groupby-min until fixpoint; converges in <= diameter iterations,
  each one shuffle of the (node,label) table.  Tested equal to DSU.

``method="auto"`` counts edges once and picks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray.config import DedupConfig


class DSU:
    """Union-find with path compression; root is the min element."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo

    def roots(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def components_dsu(edges_ds) -> dict:
    """Edge dataset -> {clip_id: root_clip_id} for every clip touched by an
    edge (clips absent from the map are singletons, root = self)."""
    dsu = DSU()
    for batch in edges_ds.select_columns(["left_id", "right_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["left_id"].to_pylist(), batch["right_id"].to_pylist()):
            dsu.union(a, b)
    return dsu.roots()


def components_labelprop(edges_ds, cfg: DedupConfig, num_partitions: int):
    """Distributed min-label propagation. Returns a Dataset
    (clip_id, root_id) for every clip touched by an edge.

    Each iteration: labels join onto edge sources, groupby(dst).min, merge
    with current labels, count changes; stop at fixpoint or
    ``cfg.label_prop_max_iters``.  Converges in <= component-diameter
    iterations; dup clusters are star-shaped (exact stars, verified pair
    cliques), so the expected round count is small.  Iteration count is a
    documented scale knob (cfg.label_prop_max_iters).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    sym = edges_ds.select_columns(["left_id", "right_id"]).union(
        edges_ds.select_columns(["left_id", "right_id"]).map_batches(
            lambda t: pa.table({"left_id": t["right_id"], "right_id": t["left_id"]}),
            batch_format="pyarrow",
        )
    ).materialize()
    # initial labels: every node labels itself
    labels = sym.groupby("left_id").aggregate(Min("right_id", alias_name="label"))
    labels = labels.map_batches(
        lambda t: pa.table({
            "clip_id": t["left_id"],
            "label": pa.compute.min_element_wise(t["label"], t["left_id"]),
        }),
        batch_format="pyarrow",
    ).materialize()

    for it in range(cfg.label_prop_max_iters):
        # neighbor labels: edge (u,v) proposes label(u) to v — plus pointer
        # doubling: (label(u) , v) also proposes, via joining on source u
        src_lab = sym.join(labels, join_type="inner",
                           num_partitions=num_partitions,
                           on=("left_id",), right_on=("clip_id",))
        proposals = src_lab.map_batches(
            lambda t: pa.table({"clip_id": t["right_id"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        # include own label so nodes never lose theirs
        own = labels.map_batches(
            lambda t: pa.table({"clip_id": t["clip_id"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = proposals.union(own).groupby("clip_id").aggregate(
            Min("cand", alias_name="label")
        ).materialize()
        # convergence: join old/new, count differing labels
        merged = new_labels.join(labels, join_type="inner",
                                 num_partitions=num_partitions,
                                 on=("clip_id",), right_on=("clip_id",),
                                 left_suffix="_new", right_suffix="_old")
        cols = merged.schema().names
        new_col = "label_new" if "label_new" in cols else "label"
        old_col = "label_old" if "label_old" in cols else [c for c in cols if c.startswith("label") and c != new_col][0]
        changed = merged.map_batches(
            lambda t: pa.table({"c": pa.compute.cast(
                pa.compute.not_equal(t[new_col], t[old_col]), pa.int64())}),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table({"clip_id": t["clip_id"], "root_id": t["label"]}),
        batch_format="pyarrow",
    )


def assignment_dataset(features_ds, edges_ds, cfg: DedupConfig,
                       num_partitions: int, method: str = "auto"):
    """-> Dataset (clip_id, root_id) covering ALL clips (singletons -> self).

    ``method``: "dsu" | "labelprop" | "auto" (pick by edge count vs
    ``cfg.dsu_edge_limit``).
    """
    if method == "auto":
        n_edges = edges_ds.count()
        method = "dsu" if n_edges <= cfg.dsu_edge_limit else "labelprop"

    ids = features_ds.select_columns(["clip_id"])
    if method == "dsu":
        roots = components_dsu(edges_ds)
        import ray
        roots_ref = ray.put(roots)

        def assign(t: pa.Table) -> pa.Table:
            import ray as _ray
            rmap = _ray.get(roots_ref)
            clip_ids = t["clip_id"].to_pylist()
            out = [rmap.get(c, c) for c in clip_ids]
            return pa.table({"clip_id": t["clip_id"],
                             "root_id": pa.array(out, pa.string())})

        return ids.map_batches(assign, batch_format="pyarrow")

    labeled = components_labelprop(edges_ds, cfg, num_partitions)
    joined = ids.join(labeled, join_type="left_outer",
                      num_partitions=num_partitions,
                      on=("clip_id",), right_on=("clip_id",))

    def fill(t: pa.Table) -> pa.Table:
        root = pa.compute.coalesce(t["root_id"], t["clip_id"])
        return pa.table({"clip_id": t["clip_id"], "root_id": root})

    return joined.map_batches(fill, batch_format="pyarrow")
