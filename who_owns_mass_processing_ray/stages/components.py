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
  (left,right) pairs to the driver (edges ≈ O(dup pairs) ≪ rows,
  bounded by ``cfg.dsu_edge_limit``), dictionary-encode the string ids to
  SORTED integer codes with Arrow C kernels, and run a fully vectorized
  numpy min-label propagation with pointer jumping (O(E·log D) work, no
  per-edge Python); root = lexicographic min clip_id of the component, so
  cluster identity is deterministic under any parallelism.
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


def min_label_components(el: np.ndarray, er: np.ndarray, n: int) -> np.ndarray:
    """Vectorized connected components over int-coded edges: label[v] = min
    code reachable from v, via numpy min-propagation + pointer jumping.

    Converges in O(log D) rounds (D = component diameter; dup clusters are
    star/clique-shaped so D is tiny) with no per-edge Python loop.
    """
    lab = np.arange(n, dtype=np.int64)
    while True:
        m = np.minimum(lab[el], lab[er])
        new = lab.copy()
        np.minimum.at(new, el, m)
        np.minimum.at(new, er, m)
        new = np.minimum(new, new[new])  # pointer jumping
        if np.array_equal(new, lab):
            break
        lab = new
    # full path compression to fixpoint
    while True:
        nl = lab[lab]
        if np.array_equal(nl, lab):
            return lab
        lab = nl


def components_dsu(edges_ds):
    """Edge dataset -> (sorted_ids: pa.Array, root_idx: np.ndarray[int64])
    for every clip touched by an edge: ``sorted_ids[root_idx[i]]`` is the
    root (= lexicographic min member) of ``sorted_ids[i]``'s component.
    Clips absent from ``sorted_ids`` are singletons (root = self).

    Everything is Arrow/numpy C kernels: concat -> unique -> sort ->
    index_in for the code assignment, then ``min_label_components`` — the
    per-edge Python loop of the round-1 DSU is gone.
    """
    import pyarrow.compute as pc
    import ray

    _EDGE_SCHEMA = pa.schema([("left_id", pa.string()),
                              ("right_id", pa.string())])

    def project(t: pa.Table) -> pa.Table:
        # map_batches (not select_columns): the Project operator passes
        # zero-row bundles through unprojected, tripping the streaming
        # executor's schema-consistency warning on every edge union
        return pa.table({"left_id": t["left_id"],
                         "right_id": t["right_id"]}, schema=_EDGE_SCHEMA)

    tables = [t for t in ray.get(
        edges_ds.map_batches(project,
                             batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not tables:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    edges = pa.concat_tables(tables).combine_chunks()
    both = pa.chunked_array([edges["left_id"], edges["right_id"]])
    uniq = pc.unique(both.combine_chunks())
    sorted_ids = uniq.take(pc.array_sort_indices(uniq))
    el = pc.index_in(edges["left_id"], value_set=sorted_ids) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    er = pc.index_in(edges["right_id"], value_set=sorted_ids) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    lab = min_label_components(el, er, len(sorted_ids))
    return sorted_ids, lab


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

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"left_id": t["left_id"], "right_id": t["right_id"]})

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"left_id": t["right_id"], "right_id": t["left_id"]})

    sym = edges_ds.map_batches(fwd, batch_format="pyarrow").union(
        edges_ds.map_batches(rev, batch_format="pyarrow")
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

    ids = features_ds.map_batches(
        lambda t: pa.table({"clip_id": t["clip_id"]}),
        batch_format="pyarrow")
    if method == "dsu":
        sorted_ids, lab = components_dsu(edges_ds)
        root_ids = sorted_ids.take(pa.array(lab, pa.int64()))
        import ray
        roots_ref = ray.put((sorted_ids, root_ids))

        def assign(t: pa.Table) -> pa.Table:
            """Vectorized probe: index_in (Arrow C hash lookup) -> take the
            root id, coalesce misses (untouched clips) to self."""
            import pyarrow.compute as pc
            import ray as _ray
            member, roots = _ray.get(roots_ref)
            pos = pc.index_in(t["clip_id"], value_set=member)
            rooted = roots.take(pos) if len(roots) else \
                pa.nulls(len(t), pa.string())
            out = pc.coalesce(rooted, t["clip_id"])
            return pa.table({"clip_id": t["clip_id"], "root_id": out})

        return ids.map_batches(assign, batch_format="pyarrow")

    labeled = components_labelprop(edges_ds, cfg, num_partitions)
    joined = ids.join(labeled, join_type="left_outer",
                      num_partitions=num_partitions,
                      on=("clip_id",), right_on=("clip_id",))

    def fill(t: pa.Table) -> pa.Table:
        root = pa.compute.coalesce(t["root_id"], t["clip_id"])
        return pa.table({"clip_id": t["clip_id"], "root_id": root})

    return joined.map_batches(fill, batch_format="pyarrow")
