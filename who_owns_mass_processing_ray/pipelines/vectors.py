"""Similarity search + embedding near-dup over the ``embeddings`` table
(vec_id:int64, embedding:list<float>, label:int32).

Three tiers, per the scale plan:

- ``q_knn_brute``      exact top-k cosine — broadcast query matrix, one numpy
                       matmul per batch, block-local top-k then a tiny global
                       reduce (correct because global top-k ⊆ union of block
                       top-ks).  The baseline every ANN variant is judged
                       against.
- ``q_embed_near_dup`` exact all-pairs cosine ≥ τ via block-row × broadcast
                       matrix products (O(n²/B) flops but streaming memory).
- ``q_knn_ivf``        IVF ANN: deterministic k-means-lite centroids held in
                       actor state, probe nprobe nearest lists — the scale
                       path (recall measured against q_knn_brute in tests).

Everything flows as Arrow; embeddings decode to a contiguous float64 matrix
per batch with one ``list_flatten`` (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.functions.numeric import round_half_away


def _emb(sf_dir: str):
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, row-normalized float64 matrix) from an Arrow batch."""
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(t)
    dim = len(flat) // max(n, 1) if n else 0
    m = flat.reshape(n, dim) if n else np.zeros((0, 0))
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m = m / np.maximum(norms, 1e-12)
    return t["vec_id"].to_numpy(), m


def _smallest_ids_table(ds, n: int) -> pa.Table:
    """The ``n`` rows with smallest vec_id, via per-block bottom-n + a tiny
    driver merge — only n rows per block ever leave the workers (the global
    bottom-n is a subset of the union of block bottom-ns), so this streams
    at any table size, unlike a driver read of the whole table."""
    import ray

    def local_min(t: pa.Table) -> pa.Table:
        return t.sort_by("vec_id").slice(0, n)

    parts = [t for t in ray.get(
        ds.map_batches(local_min, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "embedding": pa.array([], pa.list_(pa.float32()))})
    return pa.concat_tables(parts).combine_chunks() \
        .sort_by("vec_id").slice(0, n)


def _query_matrix(sf_dir: str, n_queries: int):
    """First ``n_queries`` vec_ids as the query set (deterministic)."""
    return _batch_matrix(_smallest_ids_table(_emb(sf_dir), n_queries))


def q_knn_brute(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Exact cosine top-k for the first ``n_queries`` vectors against the
    whole table (self excluded).  Broadcast the query matrix with ray.put
    ONCE; each batch contributes its local top-k rows; a final per-query
    group reduce keeps the global top-k.  Ties break by vec_id ascending."""
    import ray

    q_ids, Q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put((q_ids, Q))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = qm @ m.T  # (nq, batch)
        nq = len(qi)
        out_q, out_v, out_s = [], [], []
        for r in range(nq):
            s = sims[r].copy()
            s[ids == qi[r]] = -np.inf  # exclude self
            kk = min(k, len(s))
            # top-k with deterministic (score desc, vec_id asc) order
            idx = np.lexsort((ids, -s))[:kk]
            good = s[idx] > -np.inf
            out_q.append(np.full(good.sum(), qi[r], dtype=np.int64))
            out_v.append(ids[idx][good])
            out_s.append(s[idx][good])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_s)),
        })

    def global_topk(g: pa.Table) -> pa.Table:
        # group <= nq*k rows; Arrow sort+slice, no pandas conversion
        return g.sort_by([("cosine", "descending"),
                          ("vec_id", "ascending")]).slice(0, k)

    out = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(global_topk, batch_format="pyarrow")

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "vec_id": t["vec_id"],
            "cosine": round_half_away(t["cosine"], 4),
        })

    return out.map_batches(rnd, batch_format="pyarrow") \
        .sort(["query_id", "cosine", "vec_id"],
              descending=[False, True, False])


def q_embed_near_dup(sf_dir: str, thresh: float = 0.45):
    """Exact embedding-cosine near-dup pairs (cosine ≥ τ, left < right).
    The full normalized matrix is broadcast once (ray.put) and each batch
    computes its block-row of the similarity matrix — O(n²) flops stream
    through workers with O(n·d) memory, never materializing the n×n matrix.
    The broadcast side is gathered from the Dataset's own blocks (the read
    stays distributed + column-pruned; no driver parquet read).  This exact
    path is the small-scale oracle; above ~1M rows the broadcast itself is
    the bottleneck — use ``q_embed_near_dup_ivf`` (bucketed generation, no
    full broadcast) as the scale path."""
    import ray

    side = [t for t in ray.get(_emb(sf_dir).to_arrow_refs()) if t.num_rows]
    full = pa.concat_tables(side).combine_chunks().sort_by("vec_id")
    all_ids, M = _batch_matrix(full)
    m_ref = ray.put((all_ids, M))

    def block_pairs(t: pa.Table) -> pa.Table:
        aids, am = ray.get(m_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m @ am.T  # (batch, n)
        bi, aj = np.nonzero(sims >= thresh)
        li = ids[bi]
        rj = aids[aj]
        keep = li < rj  # canonical orientation, excludes self
        return pa.table({
            "left_id": pa.array(li[keep]),
            "right_id": pa.array(rj[keep]),
            "cosine": pa.array(round_half_away(sims[bi, aj][keep], 4)),
        })

    return _emb(sf_dir).map_batches(block_pairs, batch_format="pyarrow") \
        .sort(["left_id", "right_id"])


class IVFIndex:
    """Actor state: deterministic k-means-lite centroids (init = evenly
    spaced sorted-id sample, 5 Lloyd iterations over a fixed sample) built
    once per actor in ``__init__`` from the broadcast sample ref."""

    def __init__(self, sample_ref, n_lists: int, seed: int = 42):
        import ray

        ids, m = ray.get(sample_ref)
        rng = np.random.default_rng(seed)
        idx = np.linspace(0, len(ids) - 1, n_lists).astype(np.int64)
        c = m[idx].copy()
        for _ in range(5):
            assign = (m @ c.T).argmax(axis=1)
            for j in range(n_lists):
                mem = m[assign == j]
                if len(mem):
                    v = mem.mean(axis=0)
                    c[j] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = c

    def assign(self, m: np.ndarray, nprobe: int = 1) -> np.ndarray:
        sims = m @ self.centroids.T
        if nprobe == 1:
            return sims.argmax(axis=1)[:, None]
        return np.argsort(-sims, axis=1)[:, :nprobe]


def q_knn_ivf(sf_dir: str, n_queries: int = 10, k: int = 5, n_lists: int = 16,
              nprobe: int = 8):
    """IVF ANN top-k: vectors shuffled into centroid lists (one groupby),
    queries probe their ``nprobe`` nearest lists only — the 10^12-row path
    where the brute matmul row is infeasible.  Approximate by design; tests
    gate recall vs q_knn_brute at ≥0.8.  nprobe defaults high (8/16)
    because the synthetic test embeddings are near-uniform on the sphere —
    the worst case for IVF; clustered real corpora allow much lower nprobe
    at the same recall."""
    import ray

    ds = _emb(sf_dir)
    n_rows = ds.count()  # parquet metadata count — no scan
    # keep lists populated: >= ~32 vectors per list, else recall collapses
    n_lists = max(2, min(n_lists, n_rows // 32))
    nprobe = min(nprobe, n_lists)
    # centroid-training sample: streamed per-block bottom-n (deterministic),
    # never a whole-table driver read
    s_ids, SM = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    sample_ref = ray.put((s_ids, SM))
    q_ids, Q = _query_matrix(sf_dir, n_queries)
    index = IVFIndex(sample_ref, n_lists)
    q_lists = index.assign(Q, nprobe)  # (nq, nprobe)
    # invert: list -> queries probing it
    probes: dict[int, list[int]] = {}
    for r, lists in enumerate(q_lists):
        for l in lists:
            probes.setdefault(int(l), []).append(r)
    probes_ref = ray.put((q_ids, Q, probes))

    class AssignLists:
        def __init__(self):
            self.index = IVFIndex(sample_ref, n_lists)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            lists = self.index.assign(m, 1)[:, 0].astype(np.int32)
            return t.append_column("list_id", pa.array(lists))

    def list_topk(g: pa.Table) -> pa.Table:
        qi, qm, pro = ray.get(probes_ref)
        if g.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        lid = int(g["list_id"][0].as_py())
        rows = pro.get(lid, [])
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids, m = _batch_matrix(g)
        sims = qm[rows] @ m.T
        out_q, out_v, out_s = [], [], []
        for rr, r in enumerate(rows):
            s = sims[rr].copy()
            s[ids == qi[r]] = -np.inf
            kk = min(k, len(s))
            idx = np.lexsort((ids, -s))[:kk]
            good = s[idx] > -np.inf
            out_q.append(np.full(good.sum(), qi[r], dtype=np.int64))
            out_v.append(ids[idx][good])
            out_s.append(s[idx][good])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else [],
                                 pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v) if out_v else [],
                               pa.int64()),
            "cosine": pa.array(np.concatenate(out_s) if out_s else [],
                               pa.float64()),
        })

    def global_topk(g: pa.Table) -> pa.Table:
        # group <= nprobe*k rows; Arrow sort+slice, no pandas conversion
        return g.sort_by([("cosine", "descending"),
                          ("vec_id", "ascending")]).slice(0, k)

    from who_owns_mass_processing_ray.stages import pool_bounds

    assigned = _emb(sf_dir).map_batches(AssignLists, batch_format="pyarrow",
                                        concurrency=pool_bounds(4))
    out = assigned.groupby("list_id").map_groups(list_topk,
                                                 batch_format="pyarrow") \
        .groupby("query_id").map_groups(global_topk, batch_format="pyarrow")

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "vec_id": t["vec_id"],
            "cosine": round_half_away(t["cosine"], 4),
        })

    return out.map_batches(rnd, batch_format="pyarrow") \
        .sort(["query_id", "cosine", "vec_id"],
              descending=[False, True, False])


def q_embed_near_dup_ivf(sf_dir: str, thresh: float = 0.45,
                         n_lists: int = 16, nprobe: int = 2):
    """Embedding near-dup at scale: IVF-BUCKETED pair generation — the
    10^12-row path ``q_embed_near_dup``'s docstring names.  Each vector is
    multi-probed into its ``nprobe`` nearest centroid lists (actor-held
    centroids, one map pass); each list generates its local exact-cosine
    pairs (one matmul per group); pairs dedup with a tiny groupby.  No full
    matrix broadcast anywhere — memory per task is O(list size · d) and the
    only wide move is the bucket shuffle.

    Approximate by design: a pair lands in the same list with high
    probability when cosine >= τ (multi-probe covers boundary cells);
    recall vs the exact path is gated in tests/test_queries.py.  Scores of
    emitted pairs are EXACT (computed from the true embeddings), so
    precision is 1.0."""
    import ray

    from ray.data.aggregate import Max

    ds = _emb(sf_dir)
    n_rows = ds.count()
    n_lists = max(2, min(n_lists, n_rows // 32))
    nprobe = min(nprobe, n_lists)
    s_ids, SM = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    sample_ref = ray.put((s_ids, SM))

    class AssignMulti:
        """Actor: emit each vector into its nprobe nearest lists."""

        def __init__(self):
            self.index = IVFIndex(sample_ref, n_lists)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            emb = t["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            if not len(ids):
                return pa.table({"list_id": pa.array([], pa.int32()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "embedding": emb})
            lists = self.index.assign(m, nprobe)          # (n, nprobe)
            n = len(ids)
            rep = pa.array(np.repeat(np.arange(n), nprobe))
            return pa.table({
                "list_id": pa.array(lists.reshape(-1).astype(np.int32)),
                "vec_id": pa.array(np.repeat(ids, nprobe), pa.int64()),
                "embedding": emb.take(rep),
            })

    def local_pairs(g: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(g)
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) < 2:
            return empty
        sims = m @ m.T
        bi, bj = np.nonzero(sims >= thresh)
        li, rj = ids[bi], ids[bj]
        keep = li < rj
        if not keep.any():
            return empty
        return pa.table({
            "left_id": pa.array(li[keep]),
            "right_id": pa.array(rj[keep]),
            "cosine": pa.array(round_half_away(sims[bi, bj][keep], 4)),
        })

    from who_owns_mass_processing_ray.stages import pool_bounds

    assigned = ds.map_batches(AssignMulti, batch_format="pyarrow",
                              concurrency=pool_bounds(4))
    pairs = assigned.groupby("list_id").map_groups(
        local_pairs, batch_format="pyarrow")
    # a pair probed into two shared lists appears twice — dedup (tiny set)
    out = pairs.groupby(["left_id", "right_id"]).aggregate(
        Max("cosine", alias_name="cosine"))
    return out.sort(["left_id", "right_id"])


RPLSH_BITS_PER_BAND = 4
RPLSH_BANDS = 64


def _rplsh_planes(dim: int, n_bits: int, seed: int = 0xA11CE) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (n_bits × dim) via splitmix64 +
    Box-Muller — independent of NumPy's Generator bit-stream (the round-3
    ADVICE stability point), so signatures are reproducible across NumPy
    versions.  True Gaussians (not Rademacher) so the SimHash collision law
    P[bit agrees] = 1 − θ/π holds exactly."""
    from who_owns_mass_processing_ray.functions.hashing import splitmix64

    n = n_bits * dim
    idx = np.arange(2 * n, dtype=np.uint64) + np.uint64(seed)
    u = (splitmix64(idx).astype(np.float64) + 1.0) / 2.0**64  # (0, 1]
    g = np.sqrt(-2.0 * np.log(u[:n])) * np.cos(2.0 * np.pi * u[n:])
    return g.reshape(n_bits, dim)


def q_embed_rplsh_near_dup(sf_dir: str, thresh: float = 0.45,
                           bands: int = RPLSH_BANDS,
                           r: int = RPLSH_BITS_PER_BAND):
    """Embedding near-dup via RANDOM-PROJECTION LSH (SimHash for cosine) —
    the second scale path beside IVF, with different failure modes: banding
    sign bits needs no centroid sample and is insensitive to cluster-count
    tuning, at the cost of more bucket rows per vector.

    Charikar sign-random-projection banding: 256 deterministic Gaussian
    hyperplanes → per-vector sign bits → 64 bands × 4 bits bucket keys →
    the shared salted/capped pair expansion (``pairs_from_bucket_rows``) →
    EXACT cosine verify on attached embeddings (precision 1.0 — every
    emitted score is computed from the true vectors) → global pair dedup.
    At τ = 0.45 a qualifying pair shares a band with
    p = 1 − (1 − (1 − θ/π)^4)^64 ≥ 1 − 3e-6, so the oracle (the exact
    all-pairs SQL, same as ``embed_near_dup``) is deterministic in practice
    at test scale; recall is additionally gated vs the exact path in
    tests/test_queries.py.  No full-matrix broadcast anywhere: buckets
    shuffle narrow (key, id) rows, embeddings attach only to candidates."""
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    ds = _emb(sf_dir)
    n_bits = bands * r

    class RPBuckets:
        """Actor: hyperplanes built once per actor (state in __init__
        modulo the data-dependent dim, cached on first batch)."""

        def __init__(self):
            self.planes: np.ndarray | None = None

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            if len(ids) == 0:
                return pa.table({"bucket_key": pa.array([], pa.uint64()),
                                 "vec_id": pa.array([], pa.int64())})
            if self.planes is None or self.planes.shape[1] != m.shape[1]:
                self.planes = _rplsh_planes(m.shape[1], n_bits)
            bits = (m @ self.planes.T) >= 0.0           # (n, n_bits)
            # pack each band's r bits into a code, key = mix(band, code)
            codes = np.zeros((len(ids), bands), dtype=np.uint64)
            for j in range(r):
                codes = (codes << np.uint64(1)) | \
                    bits[:, j::r].astype(np.uint64)
            from who_owns_mass_processing_ray.functions.hashing import (
                splitmix64,
            )
            band_ids = np.arange(bands, dtype=np.uint64)[None, :]
            keys = splitmix64((band_ids << np.uint64(32)) ^ codes)
            return pa.table({
                "bucket_key": pa.array(keys.reshape(-1)),
                "vec_id": pa.array(np.repeat(ids, bands), pa.int64()),
            })

    from who_owns_mass_processing_ray.pipelines.dedup import _auto_parts

    num_parts = _auto_parts()
    bucket_rows = ds.map_batches(RPBuckets, batch_format="pyarrow",
                                 concurrency=pool_bounds(8))
    cand = pr.pairs_from_bucket_rows(bucket_rows, "bucket_key", "vec_id",
                                     max_bucket=512, num_parts=num_parts)

    # Acero joins can't carry list<float> payloads — attach the vectors as
    # fixed-width binary blobs of the PRE-NORMALIZED float64 rows (the DTW
    # stage's profile-blob pattern), so verify is a plain row dot.
    def to_blob(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        n, d = m.shape if len(ids) else (0, 0)
        blob = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(max(d, 1) * 8), n,
            [None, pa.py_buffer(np.ascontiguousarray(m, dtype="<f8")
                                .tobytes())])
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embbin": blob})

    feats = ds.map_batches(to_blob, batch_format="pyarrow")
    cand = pr.attach_pair_features(cand, feats, "embbin", num_parts,
                                   side_key="vec_id")

    def _fsb_matrix(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.type.byte_width // 8
        flat = np.frombuffer(col.buffers()[1], dtype="<f8")
        start = col.offset * d
        return flat[start:start + len(col) * d].reshape(len(col), d)

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "dropped": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        cos = np.einsum("ij,ij->i", _fsb_matrix(t["left_embbin"]),
                        _fsb_matrix(t["right_embbin"]))
        keep = cos >= thresh
        if not keep.any():
            return empty
        return pa.table({
            "left_id": t["left_id"].filter(pa.array(keep)),
            "right_id": t["right_id"].filter(pa.array(keep)),
            "dropped": t["dropped"].filter(pa.array(keep)),
            "cosine": pa.array(round_half_away(cos[keep], 4)),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow")
    out = pr.distinct_edges(verified, kind="rplsh",
                            extra_num_cols=["cosine"],
                            num_parts=num_parts)
    return out.select_columns(["left_id", "right_id", "cosine"]) \
        .sort(["left_id", "right_id"])


def q_semantic_dedup(sf_dir: str, eps: float = 0.35, n_lists: int = 16):
    """SemDeDup-style semantic deduplication: cluster embeddings with the
    deterministic IVF centroids, then within each cluster drop any vector
    whose cosine to a LOWER-vec_id cluster member is >= ``eps`` (keep the
    smallest id of each semantic-duplicate set — deterministic, order-free).

    The cluster pass is one actor-pool assign + one groupby shuffle of
    (id, embedding); per-cluster work is a single matmul + a triangular
    any-reduce.  This is the 100 TB shape SemDeDup prescribes: no global
    pairwise pass, memory per task O(cluster size x d).  Rows-only for the
    driver (k-means centroids are not SQL-expressible); exactness vs a
    brute-force recompute with the same centroids is gated in
    tests/test_independent_oracles.py."""
    import ray

    ds = _emb(sf_dir)
    n_rows = ds.count()
    n_lists = max(2, min(n_lists, n_rows // 32))
    s_ids, SM = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    sample_ref = ray.put((s_ids, SM))

    class AssignOne:
        def __init__(self):
            self.index = IVFIndex(sample_ref, n_lists)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            emb = t["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            lists = (self.index.assign(m, 1)[:, 0] if len(ids)
                     else np.empty(0, np.int64))
            return pa.table({
                "list_id": pa.array(lists.astype(np.int32)),
                "vec_id": t["vec_id"],
                "embedding": emb,
            })

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(g)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            sims = m @ m.T
            tri = np.triu(sims >= eps, k=1)      # [i, j]: i < j, near-dup
            keep = ~tri.any(axis=0)
        lid = g["list_id"][0].as_py() if n else -1
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(np.full(n, lid, np.int32)),
            "keep": pa.array(keep),
        })

    from who_owns_mass_processing_ray.stages import pool_bounds

    assigned = ds.map_batches(AssignOne, batch_format="pyarrow",
                              concurrency=pool_bounds(4))
    return assigned.groupby("list_id").map_groups(
        dedup_cluster, batch_format="pyarrow").sort("vec_id")


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd) — the iterative-algorithm pattern: centroids
# are the ONLY driver-side state (k x d floats), each iteration is one
# streaming map over the full table producing per-batch partial sums that
# reduce through a bounded two-level groupby — the vectors themselves never
# shuffle and never collect.  This is the full-data training loop behind
# IVFIndex (which trains on a fixed sample); spherical k-means on
# normalized vectors, assignment by max cosine, ties to the lower cluster
# id (argmax), empty clusters keep their previous centroid.
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5
_KM_MERGE_PARTS = 16


def kmeans_init(sf_dir: str, k: int = KMEANS_K) -> np.ndarray:
    """Deterministic init: k evenly spaced rows of the sorted-id 2048
    sample (the IVFIndex scheme) — reproducible at any parallelism."""
    ds = _emb(sf_dir)
    n_rows = ds.count()
    _, sm = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    idx = np.linspace(0, len(sm) - 1, k).astype(np.int64)
    return sm[idx].copy()


def q_kmeans_fit(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """-> (vec_id, cluster, cosine): final Lloyd assignment per vector plus
    its cosine to the winning centroid (rounded 4).  Rows-only for the
    driver (iterative model fitting is not SQL-expressible); exact parity
    vs a single-process numpy Lloyd with the same init is gated in
    tests/test_independent_oracles.py."""
    import ray

    from ray.data.aggregate import Sum

    ds = _emb(sf_dir)
    c = kmeans_init(sf_dir, k)
    dim = c.shape[1]

    for _ in range(iters):
        c_ref = ray.put(c)

        def partials(t: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            ids, m = _batch_matrix(t)
            if not len(ids):
                return pa.table({
                    "rg": pa.array([], pa.int32()),
                    "sums": pa.array([], pa.list_(pa.float64())),
                    "counts": pa.array([], pa.list_(pa.int64()))})
            assign = (m @ cm.T).argmax(axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            rg = int(ids[0] % _KM_MERGE_PARTS)
            return pa.table({
                "rg": pa.array([rg], pa.int32()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1)), k * dim),
                "counts": pa.FixedSizeListArray.from_arrays(
                    pa.array(counts), k),
            })

        def merge(g: pa.Table) -> pa.Table:
            s = g["sums"]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            cn = g["counts"]
            if isinstance(cn, pa.ChunkedArray):
                cn = cn.combine_chunks()
            sums = s.flatten().to_numpy().reshape(g.num_rows, k * dim) \
                .sum(axis=0)
            counts = cn.flatten().to_numpy().reshape(g.num_rows, k) \
                .sum(axis=0)
            return pa.table({
                "rg": pa.array([0], pa.int32()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums), k * dim),
                "counts": pa.FixedSizeListArray.from_arrays(
                    pa.array(counts), k),
            })

        reduced = ds.map_batches(partials, batch_format="pyarrow") \
            .groupby("rg").map_groups(merge, batch_format="pyarrow")
        rows = [t for t in ray.get(reduced.to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(rows)
        scol = tbl["sums"].combine_chunks() \
            if isinstance(tbl["sums"], pa.ChunkedArray) else tbl["sums"]
        ccol = tbl["counts"].combine_chunks() \
            if isinstance(tbl["counts"], pa.ChunkedArray) else tbl["counts"]
        sums = scol.flatten().to_numpy().reshape(tbl.num_rows, k, dim) \
            .sum(axis=0)
        counts = ccol.flatten().to_numpy().reshape(tbl.num_rows, k) \
            .sum(axis=0)
        nz = counts > 0
        new_c = c.copy()
        new_c[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new_c, axis=1, keepdims=True)
        c = new_c / np.maximum(norms, 1e-12)

    c_ref = ray.put(c)

    def assign_final(t: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        ids, m = _batch_matrix(t)
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int32()),
                             "cosine": pa.array([], pa.float64())})
        sims = m @ cm.T
        a = sims.argmax(axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int32)),
            "cosine": pa.array(round_half_away(
                sims[np.arange(len(ids)), a], 4)),
        })

    return ds.map_batches(assign_final, batch_format="pyarrow").sort("vec_id")


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the memory-bound scale path: at 10^12
# rows even the IVF lists cannot hold raw float vectors, so vectors are
# compressed to m_sub uint8 codes (32x smaller than float64 at 64-dim) and
# queries scan codes with an ADC lookup table (Jegou et al., TPAMI 2011).
# Codebooks are deterministic per-subspace k-means on the sorted-id sample
# (the IVFIndex scheme); encoding is an actor-pool map; the search is the
# same per-batch top-k + tiny global reduce as q_knn_brute, but each batch
# touches 8 bytes per vector instead of 512.
# ---------------------------------------------------------------------------

PQ_M_SUB = 16       # subspaces
PQ_N_CENT = 256     # centroids per subspace (8-bit codes)
PQ_ITERS = 8
PQ_SHORTLIST = 50   # ADC shortlist size per (query, batch) before rerank


def _pq_train(sample: np.ndarray, m_sub: int, n_cent: int,
              iters: int) -> np.ndarray:
    """(m_sub, n_cent, d_sub) codebooks: deterministic per-subspace Lloyd
    (L2) seeded with evenly spaced sample rows."""
    n, d = sample.shape
    d_sub = d // m_sub
    books = np.empty((m_sub, n_cent, d_sub))
    for s in range(m_sub):
        x = sample[:, s * d_sub:(s + 1) * d_sub]
        idx = np.linspace(0, n - 1, n_cent).astype(np.int64)
        c = x[idx].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(n_cent):
                mem = x[assign == j]
                if len(mem):
                    c[j] = mem.mean(axis=0)
        books[s] = c
    return books


def _pq_encode(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 codes — one argmin per subspace, vectorized."""
    n = len(m)
    m_sub, n_cent, d_sub = books.shape
    codes = np.empty((n, m_sub), np.uint8)
    for s in range(m_sub):
        x = m[:, s * d_sub:(s + 1) * d_sub]
        d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def q_knn_pq(sf_dir: str, n_queries: int = 10, k: int = 5,
             m_sub: int = PQ_M_SUB, n_cent: int = PQ_N_CENT,
             shortlist: int = PQ_SHORTLIST):
    """-> (query_id, vec_id, cosine): top-k via the production PQ shape —
    an ADC (asymmetric distance) scan over uint8 codes picks a per-batch
    shortlist, and only those rows get an exact dot product (rerank).  Per
    batch the full-precision matmul touches ``shortlist`` rows instead of
    all of them; the scan itself reads 16 bytes/vector instead of 512.  (In
    a deployed index the codes are precomputed and the rerank fetches raw
    vectors by id; here both live in the same batch, which changes the I/O
    accounting but not the algorithm.)  Emitted scores are EXACT cosines,
    so precision is 1.0 by construction; recall is the ADC shortlist's and
    is gated vs q_knn_brute in tests (measured 1.0 at these parameters on
    the near-uniform-sphere corpus, PQ's adversarial case)."""
    import ray

    ds = _emb(sf_dir)
    n_rows = ds.count()
    s_ids, SM = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    books = _pq_train(SM, m_sub, n_cent, PQ_ITERS)
    q_ids, Q = _query_matrix(sf_dir, n_queries)
    d_sub = Q.shape[1] // m_sub
    lut = np.einsum("qsd,scd->qsc",
                    Q.reshape(len(Q), m_sub, d_sub), books)
    side_ref = ray.put((q_ids, Q, lut, books))

    class ScanRerank:
        """Actor pool: encode the batch to PQ codes, ADC-scan them per
        query, exact-rerank only the shortlist rows."""

        def __init__(self):
            import ray as _r

            self.q_ids, self.Q, self.lut, self.books = _r.get(side_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "vec_id": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            ids, m = _batch_matrix(t)
            if not len(ids):
                return empty
            codes = _pq_encode(m, self.books)
            sub = np.arange(m_sub)
            sims = self.lut[:, sub[None, :], codes].sum(axis=2)  # (nq, n)
            out_q, out_v, out_s = [], [], []
            for r in range(len(self.q_ids)):
                s = sims[r].copy()
                s[ids == self.q_ids[r]] = -np.inf
                ll = min(shortlist, len(s))
                cand = np.lexsort((ids, -s))[:ll]
                cand = cand[s[cand] > -np.inf]
                if not len(cand):
                    continue
                exact = m[cand] @ self.Q[r]          # rerank: exact cosine
                kk = min(k, len(cand))
                order = np.lexsort((ids[cand], -exact))[:kk]
                out_q.append(np.full(kk, self.q_ids[r], np.int64))
                out_v.append(ids[cand][order])
                out_s.append(exact[order])
            if not out_q:
                return empty
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_s)),
            })

    def global_topk(g: pa.Table) -> pa.Table:
        return g.sort_by([("cosine", "descending"),
                          ("vec_id", "ascending")]).slice(0, k)

    from who_owns_mass_processing_ray.stages import pool_bounds

    out = ds.map_batches(ScanRerank, batch_format="pyarrow",
                         concurrency=pool_bounds(4)) \
        .groupby("query_id").map_groups(global_topk, batch_format="pyarrow")

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "vec_id": t["vec_id"],
            "cosine": round_half_away(t["cosine"], 4),
        })

    return out.map_batches(rnd, batch_format="pyarrow") \
        .sort(["query_id", "cosine", "vec_id"],
              descending=[False, True, False])


# ---------------------------------------------------------------------------
# Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al. 2009) of a
# lexical BM25 list and an embedding-cosine list, the standard production
# retrieval topology.  Each list is a streaming per-block top-L + tiny
# merge (only L rows per block leave the workers); fusion touches <= 2L
# rows.  doc_id and vec_id share the id space in the test tables.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_LIST = 50
RRF_TOP = 20


def _block_topk_merge(ds, score_col: str, id_col: str, L: int) -> pa.Table:
    """Global top-L by (score desc, id asc): per-block top-L + driver merge
    of <= L rows per block (the global top-L is a subset of the union)."""
    import ray

    def local(t: pa.Table) -> pa.Table:
        return t.sort_by([(score_col, "descending"),
                          (id_col, "ascending")]).slice(0, L)

    parts = [t for t in ray.get(
        ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:
        return pa.table({id_col: pa.array([], pa.int64()),
                         score_col: pa.array([], pa.float64())})
    return pa.concat_tables(parts).combine_chunks() \
        .sort_by([(score_col, "descending"), (id_col, "ascending")]) \
        .slice(0, L)


def q_hybrid_search(sf_dir: str, k_rrf: int = RRF_K, L: int = RRF_LIST,
                    top: int = RRF_TOP):
    """-> (doc_id, rrf, bm25_rank, cos_rank): top-``top`` docs by
    RRF = Σ_lists 1/(k + rank), fusing the BM25 top-L (query =
    BM25_QUERY_TERMS) with the cosine top-L against the smallest-vec_id
    embedding (self excluded).  Ranks are 1-based, ties broken by id —
    identical on both engines, so the oracle matches exactly."""
    import ray

    from who_owns_mass_processing_ray.pipelines import textops

    bm = _block_topk_merge(textops.q_bm25_score(sf_dir), "bm25", "doc_id", L)

    ds = _emb(sf_dir)
    q_ids, Q = _query_matrix(sf_dir, 1)
    q_ref = ray.put((q_ids[0], Q[0]))

    def cos(t: pa.Table) -> pa.Table:
        qid, qv = ray.get(q_ref)
        ids, m = _batch_matrix(t)
        keep = ids != qid
        return pa.table({"vec_id": pa.array(ids[keep], pa.int64()),
                         "cosine": pa.array(m[keep] @ qv)})

    cs = _block_topk_merge(ds.map_batches(cos, batch_format="pyarrow"),
                           "cosine", "vec_id", L)

    rrf: dict[int, float] = {}
    b_rank: dict[int, int] = {}
    c_rank: dict[int, int] = {}
    for r, did in enumerate(bm["doc_id"].to_pylist(), start=1):
        b_rank[did] = r
        rrf[did] = rrf.get(did, 0.0) + 1.0 / (k_rrf + r)
    for r, vid in enumerate(cs["vec_id"].to_pylist(), start=1):
        c_rank[vid] = r
        rrf[vid] = rrf.get(vid, 0.0) + 1.0 / (k_rrf + r)
    rows = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    out = pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "rrf": round_half_away(
            pa.array([s for _, s in rows], pa.float64()), 6),
        "bm25_rank": pa.array([b_rank.get(d) for d, _ in rows],
                              pa.int64()),
        "cos_rank": pa.array([c_rank.get(d) for d, _ in rows], pa.int64()),
    })
    import ray.data as rd

    return rd.from_arrow(out).sort(["rrf", "doc_id"],
                                   descending=[True, False])


def hybrid_search_sql(k_rrf: int = RRF_K, L: int = RRF_LIST,
                      top: int = RRF_TOP) -> str:
    from who_owns_mass_processing_ray.pipelines.textops import (
        bm25_score_sql,
    )

    return f"""
        WITH bm AS (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
                 AS bm25_rank
          FROM ({bm25_score_sql()})
          ORDER BY bm25_rank LIMIT {L}),
        qv AS (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1),
        co AS (
          SELECT vec_id, row_number() OVER (ORDER BY c DESC, vec_id)
                 AS cos_rank
          FROM (SELECT e.vec_id,
                       list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]),
                         CAST(qv.embedding AS DOUBLE[])) AS c
                FROM embeddings e CROSS JOIN qv
                WHERE e.vec_id > (SELECT min(vec_id) FROM embeddings))
          ORDER BY cos_rank LIMIT {L}),
        ids AS (SELECT doc_id FROM bm
                UNION SELECT vec_id AS doc_id FROM co)
        SELECT ids.doc_id,
               round(coalesce(1.0 / ({k_rrf} + bm.bm25_rank), 0)
                     + coalesce(1.0 / ({k_rrf} + co.cos_rank), 0), 6)
                 AS rrf,
               bm.bm25_rank, co.cos_rank
        FROM ids
        LEFT JOIN bm ON bm.doc_id = ids.doc_id
        LEFT JOIN co ON co.vec_id = ids.doc_id
        ORDER BY rrf DESC, ids.doc_id
        LIMIT {top}
    """


# ---------------------------------------------------------------------------
# k-NN JOIN — the all-vectors k-nearest-neighbor graph (every vector gets
# its k neighbors, not just a query set): the construction step under
# SemDeDup-style pruning, kNN-graph clustering and label propagation.
# Exact path: block-row matmul against the broadcast normalized matrix
# (same O(n·d)-memory discipline as q_embed_near_dup — the small-scale
# oracle).  Scale path: q_knn_join_ivf below (bucketed, no full broadcast),
# recall-gated against this one.
# ---------------------------------------------------------------------------

def q_knn_join(sf_dir: str, k: int = 3):
    """-> (vec_id, neighbor_id, cosine): each vector's k nearest other
    vectors by exact cosine (ties broken by smaller neighbor id), rounded 4,
    sorted (vec_id, cosine desc, neighbor_id)."""
    import ray

    side = [t for t in ray.get(_emb(sf_dir).to_arrow_refs()) if t.num_rows]
    full = pa.concat_tables(side).combine_chunks().sort_by("vec_id")
    all_ids, M = _batch_matrix(full)
    m_ref = ray.put((all_ids, M))

    def block_topk(t: pa.Table) -> pa.Table:
        aids, am = ray.get(m_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m @ am.T                      # (batch, n)
        # mask self-pairs, then per-row top-k by (cosine desc, id asc):
        # argpartition bounds the sort to k+ties instead of n
        self_mask = ids[:, None] == aids[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(ids)), kk)
        cols = part.reshape(-1)
        cand_s = sims[rows, cols]
        cand_id = aids[cols]
        order = np.lexsort((cand_id, -cand_s, rows))
        rows_s = rows[order]
        rank = np.arange(len(rows_s)) - np.repeat(
            np.flatnonzero(np.concatenate(
                ([True], rows_s[1:] != rows_s[:-1]))),
            np.bincount(rows_s))
        keep = rank < kk
        return pa.table({
            "vec_id": pa.array(ids[rows_s[keep]]),
            "neighbor_id": pa.array(cand_id[order][keep]),
            "cosine": pa.array(round_half_away(cand_s[order][keep], 4)),
        })

    return _emb(sf_dir).map_batches(block_topk, batch_format="pyarrow") \
        .sort(["vec_id", "cosine", "neighbor_id"],
              descending=[False, True, False])


def knn_join_sql(k: int = 3) -> str:
    return f"""
        SELECT vec_id, neighbor_id, round(cos, 4) AS cosine FROM (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])) AS cos,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) DESC,
                           b.vec_id ASC) AS rn
            FROM embeddings a CROSS JOIN embeddings b
            WHERE b.vec_id != a.vec_id
        ) WHERE rn <= {k}
        ORDER BY vec_id, cosine DESC, neighbor_id
    """


def q_knn_join_ivf(sf_dir: str, k: int = 3, n_lists: int = 16,
                   nprobe: int = 4):
    """Scale path of the kNN join: IVF multi-probe bucketing (actor-held
    centroids), local per-list top-k candidates, one per-vector final
    reduce — no full-matrix broadcast; memory per task is O(list·d).
    Rows-only: scores exact, neighbor recall vs q_knn_join gated in
    tests/test_independent_oracles.py (measured 0.61/0.86/0.96/1.00 at
    nprobe 2/3/4/6 on sf0.001 — a kNN JOIN needs wider probing than
    threshold near-dup because mid-distance neighbors cross cell walls;
    default 4)."""
    import ray

    from who_owns_mass_processing_ray.stages import pool_bounds

    ds = _emb(sf_dir)
    n_rows = ds.count()
    n_lists = max(2, min(n_lists, n_rows // 32))
    nprobe = min(nprobe, n_lists)
    s_ids, SM = _batch_matrix(_smallest_ids_table(ds, min(2048, n_rows)))
    sample_ref = ray.put((s_ids, SM))

    class AssignMulti:
        def __init__(self):
            self.index = IVFIndex(sample_ref, n_lists)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            emb = t["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            if not len(ids):
                return pa.table({"list_id": pa.array([], pa.int32()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "embedding": emb})
            lists = self.index.assign(m, nprobe)
            n = len(ids)
            rep = pa.array(np.repeat(np.arange(n), nprobe))
            return pa.table({
                "list_id": pa.array(lists.reshape(-1).astype(np.int32)),
                "vec_id": pa.array(np.repeat(ids, nprobe), pa.int64()),
                "embedding": emb.take(rep),
            })

    def local_topk(g: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(g)
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) < 2:
            return empty
        sims = m @ m.T
        np.fill_diagonal(sims, -np.inf)
        kk = min(k, len(ids) - 1)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(ids)), kk)
        cols = part.reshape(-1)
        return pa.table({
            "vec_id": pa.array(ids[rows]),
            "neighbor_id": pa.array(ids[cols]),
            "cosine": pa.array(round_half_away(sims[rows, cols], 4)),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        # candidates from nprobe lists (duplicates included): exact
        # per-vector top-k by (cosine desc, neighbor asc) after dedup
        vid = g["vec_id"].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        cos = g["cosine"].to_numpy()
        key = np.unique(np.stack(
            (vid, nid, cos.view(np.int64)), axis=1), axis=0)
        vid, nid = key[:, 0], key[:, 1]
        cos = key[:, 2].view(np.float64)
        order = np.lexsort((nid, -cos, vid))
        vs = vid[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], vs[1:] != vs[:-1])))
        rank = np.arange(len(vs)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(vs)]))))
        keep = rank < k
        return pa.table({
            "vec_id": pa.array(vs[keep]),
            "neighbor_id": pa.array(nid[order][keep]),
            "cosine": pa.array(cos[order][keep]),
        })

    assigned = ds.map_batches(AssignMulti, batch_format="pyarrow",
                              concurrency=pool_bounds(4))
    cands = assigned.groupby("list_id").map_groups(
        local_topk, batch_format="pyarrow")
    # final reduce per VECTOR-HASH PARTITION (vectorized segment ranks),
    # not per key — no per-group dispatch overhead
    return cands.map_batches(
        lambda t: t.append_column(
            "vpart", pa.array((t["vec_id"].to_numpy() % np.int64(32))
                              .astype(np.int32))), batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            lambda g: final_topk(g.drop_columns(["vpart"])),
            batch_format="pyarrow") \
        .sort(["vec_id", "cosine", "neighbor_id"],
              descending=[False, True, False])


# ---------------------------------------------------------------------------
# Distributed PCA — top-k principal components from one streaming moment
# pass: per-batch partial (n, Σx, Σxxᵀ) sums reduce to a d×d covariance on
# the driver (d² floats — model-sized, like the k-means centroids), eigh
# solves it there, and a second map pass projects every vector.  The
# whitening/visualization front of every embedding-space diagnostic
# (corpus drift plots, cluster inspection) — vectors never shuffle and
# never collect.
# ---------------------------------------------------------------------------

PCA_COMPONENTS = 2


def pca_components(sf_dir: str, k: int = PCA_COMPONENTS):
    """(mean, top-k eigenvectors (k, d), eigenvalues (k,)) of the RAW
    (un-normalized) embedding covariance, deterministically sign-fixed
    (largest-|coord| positive)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _emb(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(t)
        d = len(flat) // max(n, 1) if n else 0
        m = flat.reshape(n, d)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s1": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
            "s2": pa.array([(m.T @ m).reshape(-1).tobytes()], pa.binary()),
        })

    def merge_group(g: pa.Table) -> pa.Table:
        n = int(np.sum(g["n"].to_numpy()))
        s1 = np.sum([np.frombuffer(b, np.float64)
                     for b in g["s1"].to_pylist()], axis=0)
        s2 = np.sum([np.frombuffer(b, np.float64)
                     for b in g["s2"].to_pylist()], axis=0)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "s1": pa.array([s1.tobytes()], pa.binary()),
                         "s2": pa.array([s2.tobytes()], pa.binary())})

    # bounded two-level reduce (same shape as q_kmeans_fit's partial-sum
    # merge): one partial row per batch -> <= 16 merge groups -> driver.
    # Without it the driver would collect one 32 KB moment row per input
    # batch — unbounded at 10^12 rows.
    from who_owns_mass_processing_ray.functions import hashing as hx

    def assign_group(t: pa.Table) -> pa.Table:
        # moment rows arrive one per block: derive the merge group from the
        # partial-sum content (deterministic, spreads across groups)
        h = np.array([int(hx.splitmix64(np.frombuffer(
            b[:8], np.uint64))[0] % np.uint64(_KM_MERGE_PARTS))
            for b in t["s1"].to_pylist()], dtype=np.int64)
        return t.append_column("g", pa.array(h))

    rows = ds.map_batches(moments, batch_format="pyarrow") \
        .map_batches(assign_group, batch_format="pyarrow") \
        .groupby("g").map_groups(
            lambda g: merge_group(g.drop_columns(["g"])),
            batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s1 = np.sum([np.frombuffer(r["s1"], np.float64) for r in rows], axis=0)
    d = len(s1)
    s2 = np.sum([np.frombuffer(r["s2"], np.float64).reshape(d, d)
                 for r in rows], axis=0)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    evals = w[order]
    comps = v[:, order].T               # (k, d)
    # deterministic sign: the largest-|coordinate| entry is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals


def q_embedding_pca(sf_dir: str, k: int = PCA_COMPONENTS):
    """-> (vec_id, pc1, pc2): every vector's projection onto the top-k
    principal components (rounded 4), sorted by vec_id.  Rows-only (no SQL
    eigensolver); exact numpy full-data parity gated in
    tests/test_independent_oracles.py."""
    import ray

    mean, comps, _ = pca_components(sf_dir, k)
    model_ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mu, c = ray.get(model_ref)
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(t)
        m = flat.reshape(n, len(mu)) if n else np.zeros((0, len(mu)))
        proj = (m - mu) @ c.T
        out = {"vec_id": t["vec_id"]}
        for i in range(c.shape[0]):
            out[f"pc{i + 1}"] = pa.array(round_half_away(proj[:, i], 4))
        return pa.table(out)

    return _emb(sf_dir).map_batches(project, batch_format="pyarrow") \
        .sort("vec_id")


# ---------------------------------------------------------------------------
# Clustering evaluation — purity + NMI of the k-means partition against the
# embeddings table's ground-truth ``label`` column: the eval loop closed
# (fit with q_kmeans_fit's machinery, score here).  The contingency table
# is one partial-count reduce of (cluster, label) rows — k × n_labels cells
# of model-sized state; vectors never collect.
# ---------------------------------------------------------------------------

def q_cluster_purity(sf_dir: str, k: int = KMEANS_K,
                     iters: int = KMEANS_ITERS):
    """-> (cluster, n, majority_label, cluster_purity, overall_purity, nmi):
    one row per k-means cluster with its majority ground-truth label and
    within-cluster purity, plus the corpus-level purity and normalized
    mutual information repeated on every row (rounded 4), sorted by
    cluster.  Rows-only; pure-numpy recompute parity gated in
    tests/test_independent_oracles.py."""
    import ray
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    assign = q_kmeans_fit(sf_dir, k, iters).select_columns(
        ["vec_id", "cluster"])
    labels = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"])

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    joined = attach_columns(assign, labels, "vec_id", "vec_id",
                            {"label": "label"}, None)

    def contingency(t: pa.Table) -> pa.Table:
        c = t["cluster"].to_numpy().astype(np.int64)
        l = t["label"].to_numpy().astype(np.int64)
        key = c * np.int64(1 << 20) + l
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cluster": pa.array(u // (1 << 20)),
            "label": pa.array(u % (1 << 20)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    cells = joined.map_batches(contingency, batch_format="pyarrow") \
        .groupby(["cluster", "label"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()    # k × n_labels cells — model-sized

    import pandas as pd

    df = pd.DataFrame(cells)
    N = df.n.sum()
    piv = df.pivot_table(index="cluster", columns="label", values="n",
                         fill_value=0, aggfunc="sum")
    M = piv.to_numpy().astype(np.float64)
    row = M.sum(axis=1)
    col = M.sum(axis=0)
    overall_purity = M.max(axis=1).sum() / N
    # NMI (arithmetic normalization)
    P = M / N
    pr = row / N
    pc_ = col / N
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(np.where(P > 0,
                                P * np.log(P / np.outer(pr, pc_)), 0.0))
        hr = -np.nansum(np.where(pr > 0, pr * np.log(pr), 0.0))
        hc = -np.nansum(np.where(pc_ > 0, pc_ * np.log(pc_), 0.0))
    nmi = mi / ((hr + hc) / 2.0) if (hr + hc) > 0 else 0.0
    maj = piv.columns.to_numpy()[M.argmax(axis=1)]
    return pd.DataFrame({
        "cluster": piv.index.to_numpy().astype(np.int64),
        "n": row.astype(np.int64),
        "majority_label": maj.astype(np.int64),
        "cluster_purity": np.round(M.max(axis=1) / row, 4),
        "overall_purity": np.round(np.full(len(row), overall_purity), 4),
        "nmi": np.round(np.full(len(row), nmi), 4),
    }).sort_values("cluster").reset_index(drop=True)


# ---------------------------------------------------------------------------
# ANN recall evaluation — the index-quality report as a data product:
# per-query recall@k of the IVF path against the exact brute-force baseline
# (the table an ops team watches when tuning nprobe/n_lists).  Both sides
# are the engine's own queries; the comparison is one tiny per-query set
# intersection over <= n_queries * k rows.
# ---------------------------------------------------------------------------

def q_ann_recall_eval(sf_dir: str, n_queries: int = 10, k: int = 5):
    """-> (query_id, k, n_hits, recall_at_k): per query, IVF hits inside
    the exact top-k and the recall ratio (rounded 4), sorted by query_id.
    Rows-only (both sides are engine outputs; correctness of each side has
    its own gates)."""
    import pandas as pd

    brute = q_knn_brute(sf_dir, n_queries, k).to_pandas()
    ivf = q_knn_ivf(sf_dir, n_queries, k).to_pandas()
    b = brute.groupby("query_id").vec_id.apply(set)
    i = ivf.groupby("query_id").vec_id.apply(set)
    rows = []
    for q in sorted(b.index):
        hits = len(b[q] & i.get(q, set()))
        rows.append((int(q), k, hits, round(hits / len(b[q]), 4)))
    return pd.DataFrame(rows, columns=["query_id", "k", "n_hits",
                                       "recall_at_k"])
