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
- **distributed alternating star contraction** (``method="labelprop"``, the
  100 TB path when edges exceed ``cfg.dsu_edge_limit``): Kiveris et al.
  2014 large-star/small-star rounds, one hash-partition groupby shuffle per
  half-round with vectorized segment-min inside partitions, until the edge
  multiset fixpoint (per-component stars rooted at the min node) — the star
  edges are the assignment directly.  Tested equal to DSU on the flagship
  corpus and on adversarial chain/clique/random graphs.

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
    """Distributed connected components by ALTERNATING STAR CONTRACTION
    (large-star / small-star, Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the 100 TB path when the edge set exceeds
    ``cfg.dsu_edge_limit``.  Returns a Dataset (clip_id, root_id) for every
    clip touched by an edge.

    Each half-round is ONE hash-partition groupby shuffle of the canonical
    edge list; inside a partition every node's neighborhood is processed in
    one vectorized pass (ordinal string codes -> lexsort -> segment mins).
    large-star points every neighbor v > u at m = min(N(u) ∪ {u});
    small-star points every neighbor v < u (and u itself) at the min of the
    smaller neighborhood.  The edge multiset converges to per-component
    stars rooted at the component minimum in O(log² n) rounds (2–5 in
    practice on dup-cluster graphs), at which point the star edges ARE the
    assignment — no label joins, no mapping composition.  (The earlier
    design — min-label propagation with per-round ``Dataset.join`` —
    measured 1065 s over 21 rounds on the 80k corpus, ~50 s/round of pure
    hash-shuffle-join setup; the contraction replaces 4 join/groupby
    shuffles per round with one groupby per half-round.)

    Convergence detection compares (count, two independent 64-bit hash
    sums) of successive canonical edge multisets — two distinct multisets
    would have to agree on both sums (~2⁻¹²⁸), the same birthday
    discipline as stages/exact.py.  Raises after
    ``cfg.label_prop_max_iters`` rounds (bound is O(log² n); never hit).
    """
    import logging

    from ray.data.aggregate import Min

    from who_owns_mass_processing_ray.functions import hashing as hx

    log = logging.getLogger(__name__)
    _U64 = np.uint64

    def canon(t: pa.Table) -> pa.Table:
        lo = pa.compute.min_element_wise(t["left_id"], t["right_id"])
        hi = pa.compute.max_element_wise(t["left_id"], t["right_id"])
        tb = pa.table({"lo": lo, "hi": hi})
        return tb.filter(pa.compute.not_equal(tb["lo"], tb["hi"]))

    edges = edges_ds.map_batches(canon, batch_format="pyarrow").materialize()
    eff = int(max(8, min(num_partitions, edges.count() // 25_000 + 8)))

    def _sig(ds) -> tuple[int, int, int]:
        """(row count, two independent 64-bit edge-multiset hash sums)."""
        def part(t: pa.Table) -> pa.Table:
            lo, hi = t["lo"], t["hi"]
            h1 = hx.hash_strings(lo, seed=101)
            g1 = hx.hash_strings(hi, seed=103)
            h2 = hx.hash_strings(lo, seed=107)
            g2 = hx.hash_strings(hi, seed=109)
            with np.errstate(over="ignore"):
                s1 = (h1 * _U64(3) + g1).sum(dtype=_U64)
                s2 = (h2 ^ (g2 * _U64(0x9E3779B97F4A7C15 | 1))).sum(dtype=_U64)
            return pa.table({"n": pa.array([len(t)], pa.int64()),
                             "s1": pa.array([int(s1)], pa.uint64()),
                             "s2": pa.array([int(s2)], pa.uint64())})

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        M = 1 << 64
        return (sum(r["n"] for r in rows),
                sum(int(r["s1"]) for r in rows) % M,
                sum(int(r["s2"]) for r in rows) % M)

    def _codes(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col

    def star_round(edges_in, large: bool):
        def sym_part(t: pa.Table) -> pa.Table:
            lo, hi = _codes(t["lo"]), _codes(t["hi"])
            src = pa.concat_arrays([lo, hi])
            dst = pa.concat_arrays([hi, lo])
            prt = (hx.hash_strings(src, seed=7) % _U64(eff)).astype(np.int32)
            return pa.table({"src": src, "dst": dst,
                             "part": pa.array(prt)})

        def process(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"lo": pa.array([], pa.string()),
                                 "hi": pa.array([], pa.string())})
            src, dst = _codes(g["src"]), _codes(g["dst"])
            both = pa.concat_arrays([src, dst])
            uniq = pa.compute.unique(both)
            ids_sorted = uniq.take(pa.compute.array_sort_indices(uniq))
            sc = pa.compute.index_in(src, value_set=ids_sorted) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dc = pa.compute.index_in(dst, value_set=ids_sorted) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((dc, sc))
            scs, dcs = sc[order], dc[order]
            starts = np.concatenate(
                ([0], np.flatnonzero(scs[1:] != scs[:-1]) + 1))
            sizes = np.diff(np.concatenate((starts, [len(scs)])))
            seg_src = scs[starts]
            seg_first_dst = dcs[starts]        # dst asc in segment -> min
            if large:
                m = np.minimum(seg_first_dst, seg_src)   # min(N(u) ∪ {u})
                m_row = np.repeat(m, sizes)
                mask = dcs > scs
                out_lo, out_hi = m_row[mask], dcs[mask]  # m <= u < v
            else:
                # min over smaller neighbors ∪ self
                m = np.where(seg_first_dst < seg_src, seg_first_dst, seg_src)
                m_row = np.repeat(m, sizes)
                mask = dcs < scs
                lo_v, hi_v = m_row[mask], dcs[mask]
                keepv = hi_v != lo_v                     # v == m self-loop
                keepu = seg_src != m
                out_lo = np.concatenate((lo_v[keepv], m[keepu]))
                out_hi = np.concatenate((hi_v[keepv], seg_src[keepu]))
            # in-partition dedup of emitted canonical pairs
            o = np.lexsort((out_hi, out_lo))
            ls, hs = out_lo[o], out_hi[o]
            f = np.ones(len(o), dtype=bool)
            if len(o) > 1:
                f[1:] = (ls[1:] != ls[:-1]) | (hs[1:] != hs[:-1])
            return pa.table({
                "lo": ids_sorted.take(pa.array(ls[f])),
                "hi": ids_sorted.take(pa.array(hs[f])),
            })

        return edges_in.map_batches(sym_part, batch_format="pyarrow") \
            .groupby("part").map_groups(process, batch_format="pyarrow") \
            .materialize()

    sig = _sig(edges)
    converged = False
    for rnd in range(cfg.label_prop_max_iters):
        edges = star_round(edges, large=True)
        edges = star_round(edges, large=False)
        new_sig = _sig(edges)
        log.info("starcontract round %d: %d canonical edges", rnd + 1,
                 new_sig[0])
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge in "
            f"{cfg.label_prop_max_iters} rounds (O(log^2 n) expected)")

    # fixpoint edges are stars (lo = component min): members map to root,
    # roots map to self; groupby-min dedups cross-partition duplicates
    members = edges.map_batches(
        lambda t: pa.table({"clip_id": t["hi"], "cand": t["lo"]}),
        batch_format="pyarrow")
    roots = edges.map_batches(
        lambda t: pa.table({"clip_id": t["lo"], "cand": t["lo"]}),
        batch_format="pyarrow")
    return members.union(roots).groupby("clip_id").aggregate(
        Min("cand", alias_name="root_id"))


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
    # size-aware join width (same clamp discipline as the contraction's
    # shuffle): a corpus-sized id table earns the full cluster width at
    # 10^12 rows, but 128 partitions over an 80k-row join is pure
    # per-partition overhead — measured 12.5 s at 32 CPUs vs 7.2 s at
    # 8 CPUs for the SAME tiny join before this clamp (BASELINE.md r5)
    ids = ids.materialize()
    join_parts = int(max(8, min(num_partitions,
                                ids.count() // 25_000 + 8)))
    joined = ids.join(labeled, join_type="left_outer",
                      num_partitions=join_parts,
                      on=("clip_id",), right_on=("clip_id",))

    def fill(t: pa.Table) -> pa.Table:
        root = pa.compute.coalesce(t["root_id"], t["clip_id"])
        return pa.table({"clip_id": t["clip_id"], "root_id": root})

    return joined.map_batches(fill, batch_format="pyarrow")
