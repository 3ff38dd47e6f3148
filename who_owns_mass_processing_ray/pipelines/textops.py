"""Training-data text operators over the ``documents`` table.

The large-scale-pipeline operator set (dedup variants, text analysis) that
generalizes the engine's core machinery beyond the clip contract:

- exact dedup            (hash-partition + per-group first)
- MinHash+LSH near-dup   (shingle → minhash → band → bucket groupby → verify)
- SimHash near-dup       (char-gram features → 64-bit simhash → hamming)
- n-gram Jaccard pairs   (complete blocking, exact — the small-scale oracle)
- language ID            (char-bigram profile heuristic)
- quality scoring        (length / punctuation / stopword ratios)
- token counting         (whitespace + BPE-ish regex)
- document fingerprints  (winnowed rolling-hash anchors)

All stages are ``map_batches`` over Arrow with the vectorized kernels from
``functions/hashing.py``; candidate generation reuses the partitioned
bucket-pair machinery in ``stages/pairs.py`` — identical code paths to the
flagship clip pipeline, applied to (doc_id:int64, text) instead of
(clip_id, transcript).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.stages import auto_parts as _auto_shuffle_parts
from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.functions.numeric import round_half_away

# 48 bands x 4 rows (vs the flagship's 32x4): the oracle for
# q_minhash_near_dup is the EXACT brute-force Jaccard SQL, so the LSH miss
# probability is a driver-flake probability.  At J=0.7 a pair is missed with
# p = (1-0.7^4)^48 ≈ 2e-6 (vs ~1.5e-4 for 32x4) — negligible at any test
# scale factor.  rows stays at 4: a 3-row variant had p≈2e-9 but its
# shallower S-curve let ~30x more low-J candidate pairs through to verify
# (measured 10.9s vs 4.3s at sf0.1); doubling 4-row bands buys the flake
# margin for ~1.5x band rows instead.  The flagship keeps 32x4 where recall
# 0.99 is the bar and candidate volume matters more.
DOCS_CFG = DedupConfig(shingle_k=5, jaccard_thresh=0.7, num_perm=192,
                       lsh_bands=48, lsh_rows=4)  # num_parts auto = 4x CPUs


def _docs(sf_dir: str, columns=("doc_id", "text")):
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=list(columns))


# ---------------------------------------------------------------------------
# Exact dedup — hash-partition + per-group first
# (≙ dedupe_naive, /root/reference/R/deduplicaters.R:208-223)
# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str, key_chars: int = 40):
    """Group docs whose first ``key_chars`` chars agree; emit every member of
    a >1 group with the group's min doc_id as its group id.  The group key is
    hashed and hash-partitioned; group id = min member (deterministic, not
    arrival order — SURVEY.md §4 determinism)."""
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        # utf8_slice_codeunits slices by Unicode CODEPOINTS despite the name
        # (verified: slice('héllo wörld',0,3) == 'hél'), matching the DuckDB
        # oracle's character-based substr() on non-ASCII text too — see
        # tests/test_textops_oracles.py::test_exact_dedup_key_non_ascii.
        key = pc.utf8_slice_codeunits(t["text"], 0, key_chars)
        return pa.table({"doc_id": t["doc_id"], "key": key})

    k = ds.map_batches(keyed, batch_format="pyarrow")
    groups = k.groupby("key").aggregate(
        Min("doc_id", alias_name="group_id"), Count(alias_name="group_size"))
    dups = groups.filter(expr="group_size > 1")
    from who_owns_mass_processing_ray.stages import joins

    out = joins.attach_columns(k, dups, "key", "key",
                               {"group_id": "group_id",
                                "group_size": "group_size"}, None, how="inner")
    return out.select_columns(["doc_id", "group_id", "group_size"]).sort("doc_id")


def q_dup_members(sf_dir: str, num_parts: int | None = None, key_chars: int = 40):
    """Distributed group-collect (the ``string_agg`` aggregation class): for
    each duplicate group (>1 member; same ``key_chars``-char prefix key as
    ``q_exact_dedup``), the sorted comma-joined member doc_ids — the
    manifest a dedup pipeline hands to a reviewer or a downstream delete
    job.

    Scale shape: the full text never shuffles — each batch reduces to
    (doc_id, h1, h2) where (h1, h2) is a 128-bit content hash, rows
    hash-partition on h1, and each partition collects its groups with one
    lexsort + run-length segmentation + an Arrow ``ListArray`` build +
    ``pc.binary_join`` (no Python loop over groups).  Collected lists are
    only materialized for >1-member groups, so output volume is bounded by
    the duplicate subset, not the corpus.

    Output: (group_id = min member doc_id, n_members, members) sorted by
    group_id."""
    num_parts = num_parts or _auto_shuffle_parts()
    ds = _docs(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))   # match oracle: non-null only
        txt = pc.utf8_slice_codeunits(t["text"], 0, key_chars)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h1 = hx.hash_strings(txt, seed=4051)
        h2 = hx.hash_strings(txt, seed=9257)
        return pa.table({
            "doc_id": t["doc_id"],
            # int64 bit-cast: uint64 must not cross Ray shuffles
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "part": pa.array((h1 % np.uint64(num_parts)).astype(np.int32)),
        })

    rows = ds.map_batches(keyed, batch_format="pyarrow")
    return rows.groupby("part").map_groups(
        _collect_dup_members, batch_format="pyarrow").sort("group_id")


def _collect_dup_members(g: pa.Table) -> pa.Table:
    """One partition's group-collect kernel: (doc_id, h1, h2[, part]) rows
    -> (group_id, n_members, members) for >1-member (h1, h2) groups.
    Pure numpy/Arrow; property-tested against a pandas recompute in
    tests/test_invariants.py."""
    ids = g["doc_id"].to_numpy()
    h1 = g["h1"].to_numpy()
    h2 = g["h2"].to_numpy()
    order = np.lexsort((ids, h2, h1))
    ids_s, h1_s, h2_s = ids[order], h1[order], h2[order]
    change = np.flatnonzero((h1_s[1:] != h1_s[:-1])
                            | (h2_s[1:] != h2_s[:-1])) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [len(ids_s)])))
    big = sizes > 1
    if not big.any():
        return pa.table({"group_id": pa.array([], pa.int64()),
                         "n_members": pa.array([], pa.int64()),
                         "members": pa.array([], pa.string())})
    seg_of_row = np.repeat(np.arange(len(sizes)), sizes)
    kept = big[seg_of_row]
    ids_kept = ids_s[kept]
    sizes_kept = sizes[big]
    offsets = np.concatenate(([0], np.cumsum(sizes_kept)))
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pc.cast(pa.array(ids_kept), pa.string()))
    return pa.table({
        "group_id": pa.array(ids_kept[offsets[:-1]]),
        "n_members": pa.array(sizes_kept.astype(np.int64)),
        "members": pc.binary_join(lists, ","),
    })


DUP_MEMBERS_SQL = """
    SELECT min(doc_id) AS group_id,
           count(*) AS n_members,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS members
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY substr(text, 1, 40)
    HAVING count(*) > 1
    ORDER BY group_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the flagship machinery on documents)
# ---------------------------------------------------------------------------

class _DocMinHashBands:
    """map_batches actor: permutation table derived once per actor."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals, offs = hx.shingle_hashes(col, cfg.shingle_k, seed=cfg.seed)
        sig = hx.minhash_signatures(vals, offs, cfg.num_perm, cfg.seed)
        bands = hx.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows, seed=cfg.seed)
        keep = np.diff(offs) > 0
        ids = batch["doc_id"].to_numpy()
        return pa.table({
            "bucket_key": pa.array(bands[keep].reshape(-1)),
            "doc_id": pa.array(np.repeat(ids[keep], cfg.lsh_bands), pa.int64()),
        })


def _verify_jaccard_int(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    jac = hx.jaccard_pairs_dict(batch["left_text"], batch["right_text"],
                                cfg.shingle_k, seed=cfg.seed)
    keep = jac >= cfg.jaccard_thresh
    out = batch.filter(pa.array(keep))
    return pa.table({
        "left_id": out["left_id"],
        "right_id": out["right_id"],
        "jaccard": pa.array(round_half_away(jac[keep], 4)),
    })


def _doc_candidates(ds, cfg: DedupConfig):
    """The flagship's LSH candidate stage over a (doc_id, text) Dataset:
    per-actor MinHash banding -> salted bucket pair expansion.  Shared by
    minhash_pairs_ds and q_minhash_calibration so the calibration curve
    measures the EXACT candidate distribution the near-dup threshold rides
    on — any banding/bucketing tuning changes both automatically."""
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    band_rows = ds.map_batches(_DocMinHashBands, fn_constructor_args=(cfg,),
                               batch_format="pyarrow", batch_size=cfg.batch_size,
                               concurrency=pool_bounds(8))
    return pr.pairs_from_bucket_rows(band_rows, "bucket_key", "doc_id",
                                     cfg.max_bucket, cfg.num_parts or 16)


def minhash_pairs_ds(ds, cfg: DedupConfig = DOCS_CFG):
    """LSH near-dup pairs over ANY (doc_id, text, ...) Dataset — the body
    of q_minhash_near_dup, reusable on filtered/derived corpora (the
    curation funnel's near-dup stage).  ``ds`` is consumed twice (bands +
    text attach): pass a materialized Dataset when it is derived."""
    from who_owns_mass_processing_ray.stages import pairs as pr

    from ray.data.aggregate import Max

    cand = _doc_candidates(ds, cfg)
    cand = pr.attach_pair_features(cand, ds, "text", side_key="doc_id")
    out = cand.map_batches(_verify_jaccard_int, fn_kwargs={"cfg": cfg},
                           batch_format="pyarrow",
                           batch_size=cfg.verify_batch_size)
    # cross-partition dup pairs dedup AFTER verify (tiny set)
    out = out.groupby(["left_id", "right_id"]).aggregate(
        Max("jaccard", alias_name="jaccard"))
    return out.sort(["left_id", "right_id"])


def q_minhash_near_dup(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """Near-dup pairs (char-5-gram Jaccard ≥ 0.7) via MinHash+LSH blocking +
    exact-Jaccard verify — the linear-in-rows replacement for the
    reference's all-pairs TF-IDF cosine matrix
    (/root/reference/R/deduplicaters.R:313-378).  At J=0.7 the 32x4 S-curve
    catches a pair with p≈1-(1-0.7^4)^32≈0.9997; precision is exact (every
    candidate verified)."""
    return minhash_pairs_ds(_docs(sf_dir), cfg)


def q_minhash_calibration(sf_dir: str, cfg: DedupConfig = DOCS_CFG,
                          bin_width: float = 0.05):
    """MinHash estimator calibration — measure, don't guess: over the
    distinct LSH candidate set, compare the signature-based Jaccard
    ESTIMATE (fraction of agreeing MinHash components, the quantity the
    banding S-curve is built on) against the EXACT distinct-5-gram Jaccard,
    binned by estimate.  The output is the empirical calibration curve +
    per-bin mean absolute error — the evidence that the flagship's
    approximation is tight enough for its 0.7 threshold at THIS corpus's
    text statistics, refreshable on any new corpus before trusting the
    banding config.

    Scale shape: candidates come from the same salted bucket machinery as
    the flagship (``_doc_candidates`` — shared code, so the curve measures
    the exact candidate distribution the threshold rides on); the pair set
    is made globally distinct BEFORE stats via the coarse-partition
    vectorized edge dedup (``pairs.distinct_edges`` — per-key Ray groupby
    on a pre-verify candidate set is the measured anti-pattern,
    stages/pairs.py); texts attach via the adaptive pair-feature join;
    per-batch signatures are computed once per DISTINCT text and gathered
    by dictionary code (hot docs recur ~100x per candidate batch —
    same memoization jaccard_pairs_dict uses); per-batch stats reduce to
    ≤ ``1/bin_width`` partial rows (bincount partials), so the final
    groupby moves a few dozen rows regardless of corpus size.

    Output: (bin_lo, n_pairs, mean_est, mean_exact, mae) sorted by bin_lo.
    Not SQL-expressible (MinHash permutations); brute-force parity test in
    tests/test_independent_oracles.py."""
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import pairs as pr

    ds = _docs(sf_dir)
    nbins = int(round(1.0 / bin_width))

    cand = _doc_candidates(ds, cfg)
    pairs = pr.distinct_edges(cand, "cal") \
        .select_columns(["left_id", "right_id"])
    feat = pr.attach_pair_features(pairs, ds, "text", side_key="doc_id")

    def _sigs_per_distinct(col: pa.Array) -> np.ndarray:
        """Signatures for each row of ``col``, computed once per distinct
        text and gathered back by dictionary code."""
        enc = pc.dictionary_encode(col)
        vals, offs = hx.shingle_hashes(enc.dictionary, cfg.shingle_k,
                                       seed=cfg.seed)
        sig = hx.minhash_signatures(vals, offs, cfg.num_perm, cfg.seed)
        return sig[enc.indices.to_numpy()]

    def stats(t: pa.Table) -> pa.Table:
        lt, rt = t["left_text"], t["right_text"]
        if isinstance(lt, pa.ChunkedArray):
            lt = lt.combine_chunks()
        if isinstance(rt, pa.ChunkedArray):
            rt = rt.combine_chunks()
        exact = hx.jaccard_pairs_dict(lt, rt, cfg.shingle_k, seed=cfg.seed)
        est = (_sigs_per_distinct(lt) == _sigs_per_distinct(rt)).mean(axis=1)
        b = np.minimum((est / bin_width).astype(np.int64), nbins - 1)
        n = np.bincount(b, minlength=nbins)
        se = np.bincount(b, weights=est, minlength=nbins)
        sx = np.bincount(b, weights=exact, minlength=nbins)
        sa = np.bincount(b, weights=np.abs(est - exact), minlength=nbins)
        nz = np.flatnonzero(n)
        return pa.table({
            "bin": pa.array(nz.astype(np.int64)),
            "n": pa.array(n[nz].astype(np.int64)),
            "se": pa.array(se[nz]),
            "sx": pa.array(sx[nz]),
            "sa": pa.array(sa[nz]),
        })

    agg = feat.map_batches(stats, batch_format="pyarrow") \
        .groupby("bin").aggregate(
            Sum("n", alias_name="n_pairs"), Sum("se", alias_name="se"),
            Sum("sx", alias_name="sx"), Sum("sa", alias_name="sa"))

    def finish(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy()
        n = t["n_pairs"].to_numpy().astype(np.float64)
        return pa.table({
            "bin_lo": pa.array(np.round(b * bin_width, 2)),
            "n_pairs": t["n_pairs"],
            "mean_est": pa.array(round_half_away(
                t["se"].to_numpy() / n, 4)),
            "mean_exact": pa.array(round_half_away(
                t["sx"].to_numpy() / n, 4)),
            "mae": pa.array(round_half_away(t["sa"].to_numpy() / n, 4)),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("bin_lo")


def q_lsh_recall_curve(sf_dir: str, floor: float = 0.5,
                       bin_width: float = 0.05,
                       cfg: DedupConfig = DOCS_CFG, num_parts: int | None = None):
    """Blocking recall audit — the flagship's recall claim measured, not
    derived: every EXACT Jaccard pair ≥ ``floor`` (from the complete
    AllPairs prefix-filter join) is checked for membership in the LSH
    candidate set, binned by exact similarity, next to the analytic
    banding S-curve ``1-(1-j^r)^b``.  The output is the empirical
    recall-vs-similarity curve on THIS corpus — the number that justifies
    (or falsifies) trusting the 48x4 banding at the 0.7 threshold without
    a planted-truth corpus.

    Scale shape: both sides are narrow id pairs; they co-partition by the
    same pair-key hash and membership is resolved per partition with a
    union dictionary + sorted-key ``np.isin`` (no driver set, no Acero
    join); partial per-bin counts reduce each partition to ≤ ``1/bin_width``
    rows, so the final shuffle is constant-size.

    Output: (bin_lo, n_true, n_caught, recall, mean_j, analytic_catch)
    sorted by bin_lo.  Rows-only (the LSH side is not SQL-expressible);
    brute recompute parity in tests/test_independent_oracles.py."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import pairs as pr

    nbins = int(round(1.0 / bin_width))
    ds = _docs(sf_dir)

    exact = q_ngram_jaccard_pairs(sf_dir, k=cfg.shingle_k, thresh=floor)
    cand = pr.distinct_edges(_doc_candidates(ds, cfg), "cand") \
        .select_columns(["left_id", "right_id"])

    def _part_of(l: np.ndarray, r: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = hx.splitmix64(l.astype(np.uint64)) * np.uint64(3) \
                + hx.splitmix64(r.astype(np.uint64))
        return (h % np.uint64(num_parts)).astype(np.int32)

    def tag_exact(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        return pa.table({
            "l": t["left_id"], "r": t["right_id"],
            "j": t["jaccard"],
            "is_cand": pa.array(np.zeros(len(l), bool)),
            "part": pa.array(_part_of(l, r)),
        })

    def tag_cand(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        return pa.table({
            "l": t["left_id"], "r": t["right_id"],
            "j": pa.array(np.zeros(len(l))),
            "is_cand": pa.array(np.ones(len(l), bool)),
            "part": pa.array(_part_of(l, r)),
        })

    both = exact.map_batches(tag_exact, batch_format="pyarrow").union(
        cand.map_batches(tag_cand, batch_format="pyarrow"))

    def audit(g: pa.Table) -> pa.Table:
        is_c = g["is_cand"].to_numpy(zero_copy_only=False)
        l = g["l"].to_numpy()
        r = g["r"].to_numpy()
        j = g["j"].to_numpy()
        uu = np.unique(np.concatenate((l, r)))
        key = (np.searchsorted(uu, l).astype(np.int64) * len(uu)
               + np.searchsorted(uu, r))
        ek, ej = key[~is_c], j[~is_c]
        caught = np.isin(ek, key[is_c])
        b = np.minimum((ej / bin_width).astype(np.int64), nbins - 1)
        n = np.bincount(b, minlength=nbins)
        nc = np.bincount(b, weights=caught.astype(np.float64),
                         minlength=nbins)
        sj = np.bincount(b, weights=ej, minlength=nbins)
        nz = np.flatnonzero(n)
        return pa.table({
            "bin": pa.array(nz.astype(np.int64)),
            "n": pa.array(n[nz].astype(np.int64)),
            "nc": pa.array(nc[nz].astype(np.int64)),
            "sj": pa.array(sj[nz]),
        })

    agg = both.groupby("part").map_groups(
        lambda g: audit(g.drop_columns(["part"])),
        batch_format="pyarrow") \
        .groupby("bin").aggregate(
            Sum("n", alias_name="n_true"), Sum("nc", alias_name="n_caught"),
            Sum("sj", alias_name="sj"))

    def finish(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy()
        n = t["n_true"].to_numpy().astype(np.float64)
        mj = t["sj"].to_numpy() / n
        analytic = 1.0 - (1.0 - mj ** cfg.lsh_rows) ** cfg.lsh_bands
        return pa.table({
            "bin_lo": pa.array(np.round(b * bin_width, 2)),
            "n_true": t["n_true"],
            "n_caught": t["n_caught"],
            "recall": pa.array(np.round(
                t["n_caught"].to_numpy() / n, 4)),
            "mean_j": pa.array(np.round(mj, 4)),
            "analytic_catch": pa.array(np.round(analytic, 4)),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("bin_lo")


def _distinct_grams(t: pa.Table, k: int, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids_rep, gram_vals, doc_gram_counts): distinct k-gram hashes
    per doc, fully vectorized (segment sort + boundary mask)."""
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.shingle_hashes(col, k, seed=seed)
    ids = t["doc_id"].to_numpy()
    doc_idx = np.repeat(np.arange(len(t)), np.diff(offs))
    order = np.lexsort((vals, doc_idx))
    v, d = vals[order], doc_idx[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = (v[1:] != v[:-1]) | (d[1:] != d[:-1])
    v, d = v[first], d[first]
    counts = np.bincount(d, minlength=len(t))
    return ids[d], v, counts


def q_ngram_jaccard_pairs(sf_dir: str, k: int = 5, thresh: float = 0.7,
                          df_broadcast_limit: int | None = None):
    """EXACT n-gram Jaccard similarity join via prefix filtering (the
    AllPairs/PPJoin blocking, Bayardo et al. WWW'07; complete, zero
    approximation): order each doc's distinct grams globally by
    (doc-frequency, gram) ascending and keep only the first
    |d| - ceil(τ·|d|) + 1 as blocking keys — J(A,B) ≥ τ forces the two
    prefixes to share a gram, and rare-first ordering keeps buckets small.
    This is the oracle-grade exact variant of q_minhash_near_dup (which is
    the approximate scale path).

    The doc-frequency table handling is ADAPTIVE (mirrors
    joins.attach_columns): when the distinct-gram table fits
    ``df_broadcast_limit`` rows it is gathered once and ``ray.put``
    (read per task, never re-shipped per batch); above the limit it is
    NEVER driver-materialized — DF attaches to the gram rows via the
    partitioned shuffle join and per-doc prefixes are computed inside a
    coarse ``doc_id % P`` partition with one vectorized segment pass.
    Both paths produce identical prefixes (tested equal)."""
    import ray
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins, pairs as pr

    if df_broadcast_limit is None:
        df_broadcast_limit = joins.BROADCAST_ROW_LIMIT
    ds = _docs(sf_dir)
    seed = 7

    def gram_rows(t: pa.Table) -> pa.Table:
        ids_rep, v, _ = _distinct_grams(t, k, seed)
        return pa.table({
            "gram": pa.array(v.view(np.int64)),   # bit-cast: no uint64 in aggs
            "doc_id": pa.array(ids_rep, pa.int64()),
        })

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    df_tbl = grams.groupby("gram").aggregate(Count(alias_name="df")).materialize()

    if df_tbl.count() <= df_broadcast_limit:
        # broadcast path: one driver gather + ray.put, probed per task
        df_tables = ray.get(df_tbl.to_arrow_refs())
        df_all = pa.concat_tables(
            [x for x in df_tables if x.num_rows]).combine_chunks()
        sorted_grams = np.sort(df_all["gram"].to_numpy())
        df_of = df_all["df"].to_numpy()[np.argsort(df_all["gram"].to_numpy())]
        df_ref = ray.put((sorted_grams, df_of))

        def prefix_rows(t: pa.Table) -> pa.Table:
            sg, dfv = ray.get(df_ref)
            ids_rep, v, counts = _distinct_grams(t, k, seed)
            df_per = dfv[np.searchsorted(sg, v.view(np.int64))]
            doc_idx = np.repeat(np.arange(len(counts)), counts)
            # order grams within each doc by (df, gram) ascending
            order = np.lexsort((v, df_per, doc_idx))
            v, ids_rep, doc_idx = v[order], ids_rep[order], doc_idx[order]
            offs = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            prefix_len = counts - np.ceil(thresh * counts).astype(np.int64) + 1
            prefix_len = np.maximum(np.minimum(prefix_len, counts), 0)
            pos_in_doc = np.arange(len(v)) - np.repeat(offs[:-1], counts)
            keep = pos_in_doc < np.repeat(prefix_len, counts)
            return pa.table({
                "bucket_key": pa.array(v[keep]),
                "doc_id": pa.array(ids_rep[keep], pa.int64()),
            })

        prefixes = ds.map_batches(prefix_rows, batch_format="pyarrow")
    else:
        # shuffle path: DF joins onto gram rows partition-by-gram (no
        # driver gather), then per-doc prefixes inside coarse doc_id % P
        # partitions — one vectorized segment pass per partition.
        with_df = joins.attach_columns(
            grams, df_tbl, "gram", "gram", {"df": "df"}, num_partitions=None,
            how="inner", broadcast_limit=0)
        num_parts = 16

        def add_part(t: pa.Table) -> pa.Table:
            part = (t["doc_id"].to_numpy() % num_parts).astype(np.int32)
            return t.append_column("part", pa.array(part))

        def prefix_of_partition(g: pa.Table) -> pa.Table:
            v = g["gram"].to_numpy()
            dfv = g["df"].to_numpy()
            d = g["doc_id"].to_numpy()
            order = np.lexsort((v, dfv, d))
            v, d = v[order], d[order]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            counts = np.diff(np.r_[starts, len(d)])
            prefix_len = counts - np.ceil(thresh * counts).astype(np.int64) + 1
            prefix_len = np.maximum(np.minimum(prefix_len, counts), 0)
            pos = np.arange(len(d)) - np.repeat(starts, counts)
            keep = pos < np.repeat(prefix_len, counts)
            return pa.table({
                "bucket_key": pa.array(v[keep].view(np.uint64)),
                "doc_id": pa.array(d[keep], pa.int64()),
            })

        prefixes = with_df.map_batches(add_part, batch_format="pyarrow") \
            .groupby("part").map_groups(
                lambda g: prefix_of_partition(g.drop_columns(["part"])),
                batch_format="pyarrow")

    from ray.data.aggregate import Max

    cand = pr.pairs_from_bucket_rows(prefixes, "bucket_key", "doc_id",
                                     max_bucket=100_000)
    cand = pr.attach_pair_features(cand, ds, "text", side_key="doc_id")
    cfg = DedupConfig(shingle_k=k, jaccard_thresh=thresh, num_parts=16, seed=seed)
    out = cand.map_batches(_verify_jaccard_int, fn_kwargs={"cfg": cfg},
                           batch_format="pyarrow")
    out = out.groupby(["left_id", "right_id"]).aggregate(
        Max("jaccard", alias_name="jaccard"))
    return out.sort(["left_id", "right_id"])


# ---------------------------------------------------------------------------
# SimHash near-dup (cosine-ish; rows-only check — random projections)
# ---------------------------------------------------------------------------

def q_simhash_near_dup(sf_dir: str, hamming_thresh: int = 3,
                       bands: int = 4):
    """64-bit SimHash over char-3-gram term frequencies; candidate pairs
    share one of ``bands`` equal-width band slices; verify hamming ≤
    thresh.  The text analog of the audio fingerprint stage
    (stages/audio_fp.py).

    EXACTNESS: with ``hamming_thresh <= bands - 1`` the result is EXACT by
    pigeonhole — ≤ bands-1 flipped bits cannot touch every band, so every
    qualifying pair shares a clean band and is generated + verified
    (asserted; equality against an all-pairs pure-Python oracle is tested
    in tests/test_independent_oracles.py).  For a larger radius r pass
    ``bands >= r + 1`` (64 must divide evenly: 4/8/16); wider bands raise
    candidate volume ~ n²/2^width per band, which the salted hot-bucket
    machinery absorbs but is the price of completeness at large radii."""
    from who_owns_mass_processing_ray import audio as au
    from who_owns_mass_processing_ray.stages import pairs as pr

    assert 64 % bands == 0, "bands must divide 64"
    assert hamming_thresh <= bands - 1, (
        "completeness requires thresh <= bands-1; raise bands for a larger "
        "radius")
    ds = _docs(sf_dir)
    BITS, BANDS = 64, bands
    WIDTH = BITS // BANDS

    def simhash_rows(t: pa.Table) -> pa.Table:
        """Vectorized across the whole batch: unpack bits for ALL gram
        hashes at once, then per-doc bit-one counts via one prefix-sum and
        segment differences (bit set iff ones > grams/2 — identical to the
        signed tf-weighted vote, since sum over occurrences == tf-weighted
        sum over uniques).  No per-doc Python loop."""
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals, offs = hx.shingle_hashes(col, 3, seed=13)
        n = len(t)
        counts = np.diff(offs)
        bits = np.unpackbits(vals.view(np.uint8).reshape(-1, 8), axis=1)
        cs = np.zeros((len(vals) + 1, 64), dtype=np.int64)
        np.cumsum(bits, axis=0, out=cs[1:])
        ones = cs[offs[1:]] - cs[offs[:-1]]           # (n, 64)
        sh_bits = (2 * ones > counts[:, None]).astype(np.uint8)
        sh = np.packbits(sh_bits, axis=1).view(np.uint64)[:, 0]
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(sh)})

    hashed = ds.map_batches(simhash_rows, batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy()
        ids = t["doc_id"].to_numpy()
        keys, out_ids = [], []
        mask = np.uint64((1 << WIDTH) - 1)
        for b in range(BANDS):
            slice_bits = (sh >> np.uint64(b * WIDTH)) & mask
            keys.append(hx.splitmix64(slice_bits ^ np.uint64(b << 32)))
            out_ids.append(ids)
        return pa.table({
            "bucket_key": pa.array(np.concatenate(keys)),
            "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            # bit-cast to int64: uint64 must not pass through Ray aggregates
            # (falls back to pickled python objects and overflows)
            "simhash": pa.array(np.tile(sh, BANDS).view(np.int64)),
        })

    banded = hashed.map_batches(band_rows, batch_format="pyarrow")
    cand = pr.pairs_from_bucket_rows(banded, "bucket_key", "doc_id", 256, 16,
                                     payload_cols=["simhash"])

    def verify(t: pa.Table) -> pa.Table:
        d = au.hamming64(t["left_simhash"].to_numpy().astype(np.int64).view(np.uint64),
                         t["right_simhash"].to_numpy().astype(np.int64).view(np.uint64))
        keep = d <= hamming_thresh
        out = t.filter(pa.array(keep))
        return pa.table({"left_id": out["left_id"], "right_id": out["right_id"],
                         "hamming": pa.array(d[keep].astype(np.int32))})

    from ray.data.aggregate import Min

    out = cand.map_batches(verify, batch_format="pyarrow") \
        .groupby(["left_id", "right_id"]).aggregate(
            Min("hamming", alias_name="hamming"))
    return out.sort(["left_id", "right_id"])


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

# stopword set used by quality scoring (fixed, documented)
STOPWORDS = ["the", "a", "of", "and", "in", "to", "is", "on", "for", "with"]

_BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def q_token_stats(sf_dir: str):
    """Token counting: whitespace tokens + BPE-ish regex tokens (letter runs,
    digit runs, single punctuation) per doc — all Arrow kernels."""
    ds = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        ws = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(txt), r"\s+"))
        bpe = pc.count_substring_regex(pc.utf8_lower(txt), _BPE_ISH)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_ws_tokens": ws.cast(pa.int64()),
            "n_bpe_tokens": bpe.cast(pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def q_quality_score(sf_dir: str):
    """Quality scoring — length / punctuation / stopword ratios
    (the std_flag_* feature-extraction capability class,
    /root/reference/R/standardizers.R:1882-2101, as continuous features)."""
    ds = _docs(sf_dir)
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def score(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_chars = pc.utf8_length(txt).cast(pa.float64())
        n_tokens = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(txt), r"\s+")).cast(pa.float64())
        n_punct = pc.count_substring_regex(txt, r"[^\w\s]").cast(pa.float64())
        n_stop = pc.count_substring_regex(pc.utf8_lower(txt), stop_re) \
            .cast(pa.float64())
        safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))
        safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": n_chars.cast(pa.int64()),
            "mean_word_len": round_half_away(pc.divide(
                pc.subtract(n_chars, pc.subtract(n_tokens, pa.scalar(1.0))),
                safe_tokens), 4),
            "punct_ratio": round_half_away(pc.divide(n_punct, safe_chars), 4),
            "stopword_ratio": round_half_away(pc.divide(n_stop, safe_tokens), 4),
        })

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


# Character-bigram log-frequency profiles for 5 languages, derived from fixed
# public seed sentences (declared inline — deterministic, no external data).
_LANG_SEEDS = {
    "en": "the quick brown fox jumps over the lazy dog and the rain in spain "
          "stays mainly on the plain it was the best of times",
    "es": "el rapido zorro marron salta sobre el perro perezoso y la lluvia "
          "en espana se queda principalmente en la llanura era el mejor",
    "de": "der schnelle braune fuchs springt uber den faulen hund und der "
          "regen in spanien bleibt hauptsachlich in der ebene es war die",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et la "
          "pluie en espagne reste principalement dans la plaine c etait le",
    "zh": "kuai su de zong se hu li tiao guo lan gou yu zhu yao liu zai ping "
          "yuan shang zhe shi zui hao de shi dai",
}


class LangID:
    """Actor: char-bigram profile matrix built once per actor in __init__
    (the stateful-stage pattern, SURVEY.md §2.3); scoring is one matmul per
    batch.  A heuristic n-gram classifier — deliberately simple, the
    capability is the actor-pool plumbing + vectorized scoring."""

    def __init__(self):
        self.langs = sorted(_LANG_SEEDS)
        dim = 27 * 27
        mat = np.zeros((len(self.langs), dim), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            mat[li] = self._profile(_LANG_SEEDS[lang])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.mat = mat / np.maximum(norms, 1e-12)

    @staticmethod
    def _bigram_ids(text: str) -> np.ndarray:
        b = np.frombuffer(text.lower().encode("ascii", "replace"), np.uint8)
        c = np.where((b >= 97) & (b <= 122), b - 96, 0).astype(np.int64)
        if len(c) < 2:
            return np.empty(0, np.int64)
        return c[:-1] * 27 + c[1:]

    def _profile(self, text: str) -> np.ndarray:
        out = np.zeros(27 * 27, dtype=np.float64)
        ids = self._bigram_ids(text)
        if len(ids):
            np.add.at(out, ids, 1.0)
        return out

    @staticmethod
    def batch_profiles(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """(n, 729) bigram-count matrix for a whole string column — zero-copy
        view of the Arrow byte buffer, one bincount; bigrams never cross row
        boundaries.  Byte-identical to ``_profile`` on ASCII text (the
        lowercase map is applied with the Arrow C kernel first)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, offsets = hx._string_buffers(pc.utf8_lower(col))
        n = len(offsets) - 1
        lengths = np.diff(offsets)
        d = data[offsets[0]:offsets[-1]]
        c = np.where((d >= 97) & (d <= 122), d - 96, 0).astype(np.int64)
        if len(c) < 2:
            return np.zeros((n, 27 * 27), dtype=np.float64)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        valid = row_of[:-1] == row_of[1:]
        flat = row_of[:-1][valid] * 729 + (c[:-1] * 27 + c[1:])[valid]
        counts = np.bincount(flat, minlength=n * 729)
        return counts.reshape(n, 729).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        profs = self.batch_profiles(batch["text"])
        norms = np.linalg.norm(profs, axis=1, keepdims=True)
        profs /= np.maximum(norms, 1e-12)
        sims = profs @ self.mat.T
        best = sims.argmax(axis=1)
        conf = sims[np.arange(n), best]
        lang_arr = pa.array(self.langs, pa.string()).take(
            pa.array(best, pa.int64()))
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": lang_arr,
            "lang_conf": pa.array(np.round(conf, 4)),
        })


def q_lang_id(sf_dir: str):
    """Language ID over documents (char-bigram cosine against per-language
    profiles held in actor state)."""
    from who_owns_mass_processing_ray.stages import pool_bounds

    return _docs(sf_dir).map_batches(
        LangID, batch_format="pyarrow", batch_size=512,
        concurrency=pool_bounds(4),
    ).sort("doc_id")


def q_doc_fingerprint(sf_dir: str):
    """Winnowed rolling-hash fingerprint per doc (the containment-stage
    anchor machinery, functions/hashing.py:winnow_anchors): anchor count +
    a combined 64-bit doc fingerprint."""
    ds = _docs(sf_dir)

    def fp(t: pa.Table) -> pa.Table:
        """Vectorized combine: the per-doc fingerprint is an order-free SUM
        (mod 2^64) of splitmix-mixed anchors, so one prefix sum + segment
        differences replaces the round-1 per-row loop (the round-1 sort
        before summing was a no-op — addition commutes)."""
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals, offs = hx.winnow_anchors(col, gram=16, stride=8, min_len=12, seed=7)
        n = len(t)
        counts = np.diff(offs)
        with np.errstate(over="ignore"):
            mixed = hx.splitmix64(vals)
            cs = np.zeros(len(vals) + 1, dtype=np.uint64)
            np.cumsum(mixed, out=cs[1:])
            combined = cs[offs[1:]] - cs[offs[:-1]]
        combined[counts == 0] = np.uint64(0x9E3779B97F4A7C15)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_anchors": pa.array(counts.astype(np.int64)),
            # bit-cast to int64: uint64 must not pass through Ray aggregates
            "fingerprint": pa.array(combined.view(np.int64)),
        })

    return ds.map_batches(fp, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Flag predicates + extraction + token-sort (std_flag_* / std_extract_* /
# std_alphabetize_name capability classes)
# ---------------------------------------------------------------------------

FLAG_VOCABS = {
    # ≙ std_flag_inst / std_flag_agent / std_flag_manager keyword vocabs
    # (/root/reference/R/standardizers.R:1952-1973, 1907-1928)
    "is_query": ["query", "scan", "filter"],
    "is_storage": ["table", "row", "column"],
    "is_exec": ["spark", "hash", "merge", "sort"],
}


def q_flag_features(sf_dir: str):
    """Boolean keyword-vocab flags per doc ≙ the reference's ~9 std_flag_*
    predicates — one compiled alternation regex per flag, all evaluated as
    vectorized Arrow kernels in a single pass."""
    ds = _docs(sf_dir)
    regexes = {name: r"\b(" + "|".join(words) + r")\b"
               for name, words in FLAG_VOCABS.items()}

    def flags(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"]}
        low = pc.utf8_lower(t["text"])
        for name, rx in regexes.items():
            cols[name] = pc.match_substring_regex(low, rx)
        return pa.table(cols)

    return ds.map_batches(flags, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Entity flags with the reference's ACTUAL vocabularies (std_flag_agent /
# std_flag_manager / std_flag_inst / std_flag_trust,
# /root/reference/R/standardizers.R:1907-2004 + SEARCH lists :1-54)
# ---------------------------------------------------------------------------

AGENT_NAME_RE = ("(^C ?T ?CORP)|( REGISTERED A)|( AGENTS?)|"
                 "(CORPORAT(E|ION) SERVICE)|(INC(ORP(ORATING)?)? SERVICES)|"
                 "(BUSINESS FILL?INGS)|(CORPORATION COMPANY)|"
                 r"(PRENTICE[-\s]?HALL CORP)|(COGENCY GLOB)")
AGENT_POS_RE = "AGENT|SIGNATORY"
AGENT_LAW_RE = r"\b(LAW|ATTORNEY|LLP|ESQ(UIRE)?)\b"
MANAGER_RE = "(MANAGE(R|MENT))|(PROPERT(Y|IES))"
INST_VOCAB = [
    "CORPORATION", " INC( |$)", "LLC", "LTD", "COMPANY",
    "LP", "PROPERT(IES|Y)", "GROUP", "MANAGEMENT", "PARTNERS",
    "REALTY", "DEVELOPMENT", "EQUITIES", "HOLDING", "INSTITUTE",
    "DIOCESE", "PARISH", "CITY", "HOUSING", "AUTHORITY", "SERVICE(S|R)?",
    "LEGAL", "SERVICES", "LLP", "UNIVERSITY", "COLLEGE", "ASSOCIATION",
    "CONDOMINIUM", "HEALTH", "HOSPITAL", "SYSTEM", "ACCOUNTS?", "PAYABLE",
    "ASSOCIATES", "ATTORNEY", "AT LAW", "DEPARTMENT", "REGISTERED", "AGENTS",
    "MORTGAGE", "COMMUNITY", "BANK", "LOANS?",
]
INST_RE = r"\b(" + "|".join(INST_VOCAB) + r")\b"
# TRUST(?!EES): RE2 has no lookahead — "TRUST not followed by EES" spelled
# out as the three ways the next chars can diverge from E,E,S (or end)
TRUST_NOT_EES_RE = r"TRUST($|[^E]|E($|[^E])|EE($|[^S]))"
TRUSTEES_OF_RE = "^TRUSTEES OF "
ACADEMIC_RE = "UNIVERSITY|COLLEGE|INSTITUTE"
TRUST_DEFINITE = ["(IR)?REVOCABLE", "NOMINEE", "INCOME ONLY", "FOR LIFE",
                  "UNDER DECLARATION OF", "LIVING", "FAMILY"]
TRUST_DEFINITE_RE = r"\b(" + "|".join(TRUST_DEFINITE) + r")\b"
TRUSTEES_RE = "TRUSTEES"

ENTITY_NAMES = ["CT CORP SYSTEM", "ACME REGISTERED AGENTS", "SMITH LAW LLP",
                "JONES MANAGEMENT CO", "OAK PROPERTIES LLC",
                "DOE FAMILY TRUST", "TRUSTEES OF DARTMOUTH COLLEGE",
                "TRUSTEES OF MAIN ST", "IRREVOCABLE NOMINEE", "MARY JONES",
                "COGENCY GLOBAL INC", "HARVARD UNIVERSITY TRUST",
                "JOHN SMITH TRUSTEES"]
ENTITY_POSITIONS = ["AGENT", "SIGNATORY", "MANAGER", "OWNER", "PRESIDENT"]


def q_entity_flags(sf_dir: str):
    """≙ std_flag_agent + std_flag_manager + std_flag_inst + std_flag_trust
    with the reference's full vocabularies, over derived (name, position)
    pairs chosen so every branch of every flag fires.  The trust flag's
    negative lookahead is re-expressed lookahead-free (RE2); the trustees
    flag preserves the reference's "& !trust" suppression."""
    def pick(did, options):
        return pa.array(options, pa.string()).take(
            pa.array(did % len(options), pa.int64()))

    def flags(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        name = pick(did, ENTITY_NAMES)
        position = pick(did, ENTITY_POSITIONS)
        m = lambda col, rx: pc.match_substring_regex(col, rx)
        agent = pc.or_(pc.or_(m(name, AGENT_NAME_RE), m(position, AGENT_POS_RE)),
                       m(name, AGENT_LAW_RE))
        manager = m(name, MANAGER_RE)
        inst = m(name, INST_RE)
        academic = m(name, ACADEMIC_RE)
        trust = pc.or_(
            pc.or_(m(name, TRUST_NOT_EES_RE),
                   pc.and_(m(name, TRUSTEES_OF_RE), pc.invert(academic))),
            m(name, TRUST_DEFINITE_RE))
        trustees = pc.and_(
            pc.and_(m(name, TRUSTEES_RE), pc.invert(academic)),
            pc.invert(trust))
        return pa.table({
            "doc_id": t["doc_id"], "name": name, "position": position,
            "agent": agent, "manager": manager, "inst": inst,
            "trust": trust, "trustees": trustees,
        })

    return _docs(sf_dir).map_batches(flags, batch_format="pyarrow").sort("doc_id")


def entity_flags_sql() -> str:
    def pick_sql(col, options):
        lst = ", ".join(f"'{o}'" for o in options)
        return (f"list_extract([{lst}], "
                f"CAST({col} % {len(options)} AS INTEGER) + 1)")

    name = pick_sql("doc_id", ENTITY_NAMES)
    position = pick_sql("doc_id", ENTITY_POSITIONS)
    academic = f"regexp_matches(name, '{ACADEMIC_RE}')"
    trust = (f"(regexp_matches(name, '{TRUST_NOT_EES_RE}')"
             f" OR (regexp_matches(name, '{TRUSTEES_OF_RE}') AND NOT {academic})"
             f" OR regexp_matches(name, '{TRUST_DEFINITE_RE}'))")
    return f"""
        WITH raw AS (
            SELECT doc_id, {name} AS name, {position} AS position
            FROM documents)
        SELECT doc_id, name, position,
               (regexp_matches(name, '{AGENT_NAME_RE}')
                OR regexp_matches(position, '{AGENT_POS_RE}')
                OR regexp_matches(name, '{AGENT_LAW_RE}')) AS agent,
               regexp_matches(name, '{MANAGER_RE}') AS manager,
               regexp_matches(name, '{INST_RE}') AS inst,
               {trust} AS trust,
               (regexp_matches(name, '{TRUSTEES_RE}') AND NOT {academic}
                AND NOT {trust}) AS trustees
        FROM raw ORDER BY doc_id
    """


def q_extract_first_token(sf_dir: str):
    """Regex extraction into a column ≙ std_extract_zip / std_extract_address
    (/root/reference/R/standardizers.R:609-625, 1148-1182): first token and
    last token of each doc pulled out with one extract kernel each."""
    ds = _docs(sf_dir)

    def ext(t: pa.Table) -> pa.Table:
        first = pc.extract_regex(t["text"], r"^(?P<tok>\S+)")
        last = pc.extract_regex(t["text"], r"(?P<tok>\S+)$")
        # no-match -> '' (DuckDB regexp_extract semantics), not null
        return pa.table({
            "doc_id": t["doc_id"],
            "first_token": pc.fill_null(pc.struct_field(first, "tok"), ""),
            "last_token": pc.fill_null(pc.struct_field(last, "tok"), ""),
        })

    return ds.map_batches(ext, batch_format="pyarrow").sort("doc_id")


def q_token_sort(sf_dir: str):
    """Token-sorted text ≙ std_alphabetize_name explode→sort→reassemble
    (/root/reference/R/standardizers.R:2180-2197), vectorized: one Arrow
    split, one numpy lexsort over (doc, token), one grouped re-join."""
    ds = _docs(sf_dir)

    def srt(t: pa.Table) -> pa.Table:
        """All-Arrow: sort the exploded (doc, token) table with the C sort
        kernel, rebuild the list array from the sorted flat tokens +
        original offsets, and re-join with ``binary_join`` — no Python
        object arrays, no per-doc join loop.  UTF-8 byte order equals
        codepoint order, so the Arrow sort matches DuckDB list_sort."""
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words)
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_per)
        pairs = pa.table({"d": pa.array(doc_idx), "w": flat})
        pairs = pairs.sort_by([("d", "ascending"), ("w", "ascending")])
        offsets = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n_per, out=offsets[1:])
        sorted_lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pairs["w"].combine_chunks().cast(pa.large_string()))
        joined = pc.binary_join(sorted_lists, pa.scalar(" ", pa.large_string()))
        return pa.table({
            "doc_id": t["doc_id"],
            "text_sorted": joined.cast(pa.string()),
        })

    return ds.map_batches(srt, batch_format="pyarrow").sort("doc_id")


# fixed match vocabulary for the fuzzy join (≙ the reference's ~1.5k places
# table; deliberately small + declared inline)
FUZZY_VOCAB = ["table", "query", "spark", "merge", "batch", "window", "vector",
               "stream", "filter", "hash", "sort", "scan", "group", "order",
               "join", "row", "column", "value", "line", "key"]


_BAND_LIMIT = 4  # |len(a)-len(b)| > limit short-circuits to the lower bound


def _edit_distance_matrix(tokens: list[str], vocab: list[str],
                          match_thresh: int = 2) -> np.ndarray:
    """Levenshtein distance of every token to every vocab word — one
    banded DP per vocab word over the whole token batch (numpy rows).

    The |m-n| > _BAND_LIMIT shortcut returns the LOWER BOUND abs(m-n)
    instead of the true distance, which is only safe when the caller's
    match threshold is <= _BAND_LIMIT (the shortcut value already exceeds
    the threshold, so the argmin winner among candidates within the band is
    unaffected) — asserted here so reuse with a larger threshold fails loud
    instead of silently selecting wrong argmin words."""
    assert match_thresh <= _BAND_LIMIT, (
        f"banded shortcut valid only for thresholds <= {_BAND_LIMIT}")
    n = len(tokens)
    out = np.zeros((n, len(vocab)), dtype=np.int64)
    if n == 0:
        return out
    # one DP per VOCAB WORD over the whole token batch: codepoint matrix +
    # numpy row ops, no per-(token, word) Python DP (the r1 version ran a
    # pure-Python DP per cell — fine at 20 vocab words, 75x slower at the
    # reference's ~1.5k places table)
    tl = np.array([len(t or "") for t in tokens], dtype=np.int64)
    L = max(int(tl.max()), 1)
    T = np.zeros((n, L), dtype=np.uint32)
    for i, t in enumerate(tokens):
        if t:
            T[i, :len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    rows = np.arange(n)
    for j, w in enumerate(vocab):
        m = len(w)
        band = np.abs(tl - m) <= _BAND_LIMIT
        wcp = np.frombuffer(w.encode("utf-32-le"), np.uint32)
        prev = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
        for a in range(1, m + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = a
            neq = (T != wcp[a - 1]).astype(np.int64)
            for b in range(1, L + 1):
                cur[:, b] = np.minimum(
                    np.minimum(prev[:, b] + 1, cur[:, b - 1] + 1),
                    prev[:, b - 1] + neq[:, b - 1])
            prev = cur
        d = prev[rows, tl]
        out[:, j] = np.where(band, d, np.abs(tl - m))
    return out


def _fuzzify_key(s: str) -> str:
    """Anagram key ≙ ``std_fuzzify_string``
    (/root/reference/R/standardizers.R:105-132): first and last characters
    anchored, middle characters sorted — two strings share a key iff they
    are anagrams sharing start/end characters (the exact-anagram core of
    the reference's char-class regex; the regex additionally admits
    non-anagram strings over the same alphabet within a ±1 length band)."""
    if len(s) < 3:
        return s
    return s[0] + "".join(sorted(s[1:-1])) + s[-1]


class FuzzyJoin:
    """Actor: vocab + precompiled fuzzified (anagram) keys held in state
    (≙ the reference's places join, /root/reference/R/standardizers.R:
    1564-1670, 'std_munis_by_places' 3rd pass with its ``name_fuzzy``
    anagram regexes, /root/reference/R/loaders.R:1083) — per batch, two
    passes per doc's FIRST token: (1) anagram-key equality against the
    fuzzified vocab (≙ std_fuzzify_string), then (2) closest vocab word
    with edit distance <= 2.  Ties by lexicographic min word; the winning
    pass is reported in ``match_pass``."""

    def __init__(self):
        self.vocab = sorted(FUZZY_VOCAB)
        self.fuzz_of: dict[str, str] = {}
        for w in self.vocab:            # sorted -> first insert = lexic. min
            self.fuzz_of.setdefault(_fuzzify_key(w), w)

    def __call__(self, t: pa.Table) -> pa.Table:
        # no-match -> '' to mirror the DuckDB oracle's regexp_extract
        # (which yields '' for empty / whitespace-leading texts, not null)
        first = pc.fill_null(pc.struct_field(
            pc.extract_regex(t["text"], r"^(?P<tok>\S+)"), "tok"), "")
        toks = first.to_pylist()
        anag = [self.fuzz_of.get(_fuzzify_key(tok)) for tok in toks]
        d = _edit_distance_matrix(toks, self.vocab, match_thresh=2)
        best = d.argmin(axis=1)  # ties -> first (vocab sorted -> lexic. min)
        bestd = d[np.arange(len(toks)), best]
        ok = bestd <= 2
        matched, dist, mpass = [], [], []
        for i, a in enumerate(anag):
            if a is not None:
                matched.append(a)
                dist.append(None)
                mpass.append("anagram")
            elif ok[i]:
                matched.append(self.vocab[best[i]])
                dist.append(int(bestd[i]))
                mpass.append("edit")
            else:
                matched.append(None)
                dist.append(-1)
                mpass.append(None)
        return pa.table({
            "doc_id": t["doc_id"],
            "first_token": first,
            "matched_word": pa.array(matched, pa.string()),
            "edit_dist": pa.array(dist, pa.int64()),
            "match_pass": pa.array(mpass, pa.string()),
        })


def q_fuzzy_join(sf_dir: str):
    from who_owns_mass_processing_ray.stages import pool_bounds

    return _docs(sf_dir).map_batches(
        FuzzyJoin, batch_format="pyarrow", batch_size=512,
        concurrency=pool_bounds(4),
    ).sort("doc_id")


def q_cross_table_link(sf_dir: str, thresh: float = 0.7):
    """Cross-table near-dup link ≙ ``dedupe_cosine_join``
    (/root/reference/R/deduplicaters.R:380-444): LSH-block the UNION of two
    source-tagged tables, verify exact Jaccard, and keep only pairs that
    SPAN both tables (table A = even doc_ids, table B = odd — a
    deterministic two-table split of the documents corpus).  Output is
    oriented (a_id from A, b_id from B); same 48x4 LSH margin as
    q_minhash_near_dup so the exact-SQL oracle cannot flake."""
    from ray.data.aggregate import Max

    from who_owns_mass_processing_ray.stages import pairs as pr, pool_bounds

    cfg = DOCS_CFG
    ds = _docs(sf_dir)
    band_rows = ds.map_batches(_DocMinHashBands, fn_constructor_args=(cfg,),
                               batch_format="pyarrow", batch_size=cfg.batch_size,
                               concurrency=pool_bounds(8))
    cand = pr.pairs_from_bucket_rows(band_rows, "bucket_key", "doc_id",
                                     cfg.max_bucket, cfg.num_parts or 16)
    cand = pr.attach_pair_features(cand, ds, "text", side_key="doc_id")
    verified = cand.map_batches(_verify_jaccard_int, fn_kwargs={"cfg": cfg},
                                batch_format="pyarrow",
                                batch_size=cfg.verify_batch_size)

    def orient_cross(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        cross = (l % 2) != (r % 2)
        jac = t["jaccard"].to_numpy()[cross]
        l, r = l[cross], r[cross]
        a = np.where(l % 2 == 0, l, r)    # the even (table-A) member
        b = np.where(l % 2 == 0, r, l)    # the odd (table-B) member
        return pa.table({"a_id": pa.array(a), "b_id": pa.array(b),
                         "jaccard": pa.array(jac)})

    out = verified.map_batches(orient_cross, batch_format="pyarrow") \
        .groupby(["a_id", "b_id"]).aggregate(Max("jaccard",
                                                 alias_name="jaccard"))
    return out.sort(["a_id", "b_id"])


def near_dup_groups_ds(ds, cfg: DedupConfig = DOCS_CFG):
    """(doc_id, group_id) for every multi-doc near-dup group member of ANY
    (doc_id, text, ...) Dataset — q_near_dup_groups' body, reusable on
    derived corpora (pass a materialized Dataset)."""
    return _groups_from_pairs(minhash_pairs_ds(ds, cfg), cfg)


def q_near_dup_groups(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """End-to-end near-dup CLUSTERING with a SQL oracle: LSH pairs (48x4,
    flake p≈2e-6) -> exact-Jaccard verify -> connected components -> every
    member of a multi-doc group with the group's min doc_id as group_id.

    This is the flagship's pairs->components->assignment chain on the
    documents table, hash-verified against a DuckDB RECURSIVE CTE computing
    min-reachable-id over the exact all-pairs Jaccard graph — the clustering
    reduce itself gets an oracle, not just the pair generation
    (≙ dedupe_network + sites_to_owners,
    /root/reference/R/deduplicaters.R:225-288, 684-710).

    Driver collect is GATED like the flagship: past ``cfg.dsu_edge_limit``
    verified edges the reduce switches to the distributed star contraction
    (zero-padded ids so lexicographic roots == the oracle's numeric min;
    path parity tested with a forced tiny limit)."""
    return _groups_from_pairs(minhash_pairs_ds(_docs(sf_dir), cfg), cfg)


def _groups_from_pairs(pairs_ds, cfg: DedupConfig):
    """Verified pair Dataset -> (doc_id, group_id), edge-limit gated."""
    import ray
    import ray.data as rd

    from who_owns_mass_processing_ray.stages.components import (
        components_labelprop,
        min_label_components,
    )

    # materialize ONCE so the edge-count gate and the consumer below don't
    # each re-execute the LSH pipeline
    pairs = pairs_ds.materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "group_id": pa.array([], pa.int64())}))
    if n_edges > cfg.dsu_edge_limit:
        # 100 TB path: same star contraction as the flagship.  Contraction
        # roots at the LEXICOGRAPHIC min, so zero-pad ids to make string
        # order == numeric order (group_id must equal the SQL oracle's
        # numeric min-reachable id).
        def to_str(t: pa.Table) -> pa.Table:
            return pa.table({
                "left_id": pc.utf8_lpad(
                    pc.cast(t["left_id"], pa.string()), 19, "0"),
                "right_id": pc.utf8_lpad(
                    pc.cast(t["right_id"], pa.string()), 19, "0"),
            })

        labeled = components_labelprop(
            pairs.map_batches(to_str, batch_format="pyarrow"), cfg,
            cfg.num_parts or _auto_shuffle_parts())

        def back(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pc.cast(t["clip_id"], pa.int64()),
                "group_id": pc.cast(t["root_id"], pa.int64()),
            })

        return labeled.map_batches(back, batch_format="pyarrow") \
            .sort("doc_id")

    tables = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
    e = pa.concat_tables(tables).combine_chunks()
    l = e["left_id"].to_numpy()
    r = e["right_id"].to_numpy()
    ids = np.unique(np.concatenate((l, r)))       # sorted -> code order = id order
    el = np.searchsorted(ids, l)
    er = np.searchsorted(ids, r)
    lab = min_label_components(el, er, len(ids))
    out = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "group_id": pa.array(ids[lab], pa.int64())})
    return rd.from_arrow(out).sort("doc_id")


# ---------------------------------------------------------------------------
# Compound-bounded near-dup ≙ dedupe_cosine_bounded
# (/root/reference/R/deduplicaters.R:446-539): a pair may merge only when it
# is text-similar AND shares the bounding dimension — the reference's
# address-equality bound, mapped (SURVEY §7.0) to a second signature-bucket
# blocking dimension — with the reference's 0.85 (inst/trust) vs 0.95
# (individuals) dual-threshold routing, pairs never crossing classes.
#
# The bounding signature is a 48-bit marker-bigram parity vector (bit i =
# parity of marker_i's occurrence count): deterministic, engine-computable
# with one vectorized count kernel per marker, and SQL-computable with
# length/replace arithmetic — so unlike the random-projection SimHash, the
# WHOLE compound predicate (exact Jaccard ∧ hamming ∧ routing) has a DuckDB
# oracle and this query is driver hash-matched, not rows-only.
#
# Blocking is a true AND-intersection of candidate sets: LSH band pairs ∩
# signature band pairs (4 x 12-bit bands — complete for hamming <= 3 by
# pigeonhole, asserted), joined on the pair key BEFORE any text is attached
# or verified, so candidate volume is bounded by the smaller set.  (The
# composite-key alternative — emit all 48x4 (lsh_band, sig_band) keys per
# doc — trades 4x row fan-out for no join; the join form moves only narrow
# id pairs and is the 100 TB shape.)
# ---------------------------------------------------------------------------

BOUND_MARKERS = ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
                 "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
                 "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
                 "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
                 "ra", "ce", "li", "ch", "lo", "ma", "si", "ta"]
BOUND_BITS = len(BOUND_MARKERS)          # 48
BOUND_SIG_BANDS = 4                       # 4 x 12-bit slices
BOUND_HAMMING = 3                         # <= bands - 1: complete (pigeonhole)
BOUND_INST_THRESH = 0.85                  # ≙ config.R COSINE_THRESH routing
BOUND_IND_THRESH = 0.95                   # ≙ dedupe_cosine_bounded inds_thresh


def bound_signature(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """48-bit parity signature (int64) — one count kernel per marker, no
    per-row Python.  Markers have distinct characters, so non-overlapping
    substring counting (both Arrow count_substring and DuckDB
    length/replace) is exact occurrence counting."""
    low = pc.utf8_lower(col)
    sig = np.zeros(len(low), np.int64)
    for i, m in enumerate(BOUND_MARKERS):
        c = pc.count_substring(low, m).to_numpy(zero_copy_only=False)
        sig |= (c.astype(np.int64) & 1) << i
    return sig


def q_bounded_near_dup(sf_dir: str, hamming_thresh: int = BOUND_HAMMING):
    """Pairs that are text-similar (exact 5-gram Jaccard >= 0.85 inst /
    0.95 individual, same class both sides — class derived as
    doc_id % 3 == 0 ≙ the reference's inst|trust flag) AND within hamming
    <= 3 on the bounding parity signature."""
    from ray.data.aggregate import Max, Min

    from who_owns_mass_processing_ray import audio as au
    from who_owns_mass_processing_ray.stages import pairs as pr, pool_bounds

    assert hamming_thresh <= BOUND_SIG_BANDS - 1, (
        "signature-band completeness requires thresh <= bands-1")
    cfg = DOCS_CFG
    width = BOUND_BITS // BOUND_SIG_BANDS
    ds = _docs(sf_dir)

    # dimension 1: MinHash LSH band buckets (at J >= 0.85 the 48x4 S-curve
    # misses a pair with p ~ 5e-16 — far below driver-flake relevance)
    band_rows = ds.map_batches(_DocMinHashBands, fn_constructor_args=(cfg,),
                               batch_format="pyarrow",
                               batch_size=cfg.batch_size,
                               concurrency=pool_bounds(8))
    cand_text = pr.pairs_from_bucket_rows(band_rows, "bucket_key", "doc_id",
                                          cfg.max_bucket, cfg.num_parts or 16)
    cand_text = cand_text.map_batches(
        lambda t: t.select(["left_id", "right_id"]), batch_format="pyarrow")

    # dimension 2: signature band buckets (complete for the hamming radius)
    def sig_rows(t: pa.Table) -> pa.Table:
        sig = bound_signature(t["text"])
        ids = t["doc_id"].to_numpy()
        mask = np.uint64((1 << width) - 1)
        keys, out_ids = [], []
        u = sig.view(np.uint64)
        for b in range(BOUND_SIG_BANDS):
            keys.append(hx.splitmix64(
                ((u >> np.uint64(b * width)) & mask) ^ np.uint64(b << 32)))
            out_ids.append(ids)
        return pa.table({
            "bucket_key": pa.array(np.concatenate(keys)),
            "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "sig": pa.array(np.tile(sig, BOUND_SIG_BANDS)),
        })

    sig_banded = ds.map_batches(sig_rows, batch_format="pyarrow")
    cand_sig = pr.pairs_from_bucket_rows(sig_banded, "bucket_key", "doc_id",
                                         cfg.max_bucket, cfg.num_parts or 16,
                                         payload_cols=["sig"])
    cand_sig = cand_sig.map_batches(
        lambda t: t.select(["left_id", "right_id", "left_sig", "right_sig"]),
        batch_format="pyarrow")

    # the AND bound: intersect the two candidate sets on the pair key
    # (keep the sig-side rows — they carry the signatures verify needs)
    inter = pr.pair_intersect(cand_sig, cand_text)
    inter = pr.attach_pair_features(inter, ds, "text", side_key="doc_id")

    def verify(batch: pa.Table) -> pa.Table:
        jac = hx.jaccard_pairs_dict(batch["left_text"], batch["right_text"],
                                    cfg.shingle_k, seed=cfg.seed)
        l = batch["left_id"].to_numpy()
        r = batch["right_id"].to_numpy()
        l_inst = l % 3 == 0
        r_inst = r % 3 == 0
        ham = au.hamming64(
            batch["left_sig"].to_numpy().view(np.uint64),
            batch["right_sig"].to_numpy().view(np.uint64))
        thr = np.where(l_inst, BOUND_INST_THRESH, BOUND_IND_THRESH)
        keep = ((l_inst == r_inst) & (ham <= hamming_thresh) & (jac >= thr))
        out = batch.filter(pa.array(keep))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "jaccard": pa.array(round_half_away(jac[keep], 4)),
            "hamming": pa.array(ham[keep].astype(np.int32)),
        })

    verified = inter.map_batches(
        verify, batch_format="pyarrow", batch_size=cfg.verify_batch_size)
    out = verified.groupby(["left_id", "right_id"]).aggregate(
        Max("jaccard", alias_name="jaccard"),
        Min("hamming", alias_name="hamming"))

    def stamp_class(t: pa.Table) -> pa.Table:
        inst = t["left_id"].to_numpy() % 3 == 0
        cls = pa.array(np.where(inst, "inst", "ind"), pa.string())
        return t.append_column("pair_class", cls)

    return out.map_batches(stamp_class, batch_format="pyarrow") \
        .sort(["left_id", "right_id"])


def bounded_near_dup_sql() -> str:
    sig = " + ".join(
        f"((((length(t) - length(replace(t, '{m}', ''))) / 2) % 2)::BIGINT"
        f" << {i})"
        for i, m in enumerate(BOUND_MARKERS))
    return f"""
        WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
        sig AS (SELECT doc_id, (doc_id % 3 = 0) AS inst, {sig} AS sig FROM s),
        g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
                FROM documents)),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT i.left_id, i.right_id,
                 i.c * 1.0 / (sa.n + sb.n - i.c) AS jac
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.left_id
          JOIN sz sb ON sb.doc_id = i.right_id
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {BOUND_INST_THRESH})
        SELECT j.left_id, j.right_id, round(j.jac, 4) AS jaccard,
               CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming,
               CASE WHEN sa.inst THEN 'inst' ELSE 'ind' END AS pair_class
        FROM j
        JOIN sig sa ON sa.doc_id = j.left_id
        JOIN sig sb ON sb.doc_id = j.right_id
        WHERE sa.inst = sb.inst
          AND bit_count(xor(sa.sig, sb.sig)) <= {BOUND_HAMMING}
          AND j.jac >= CASE WHEN sa.inst THEN {BOUND_INST_THRESH}
                            ELSE {BOUND_IND_THRESH} END
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Exact strict-substring containment pairs — the standalone, ORACLE-MATCHED
# variant of the flagship's containment stage (stages/containment.py; the
# capability the reference expresses only as pattern-specific regex peels,
# /root/reference/R/standardizers.R:1148-1182).  With ``stride=1`` every
# gram is a content-defined anchor, so the probe/anchor blocking is
# PROVABLY COMPLETE for documents with at least ``gram`` characters: if
# A ⊆ B, A's minimum gram hash is one of B's anchor rows and the pair meets
# in that bucket.  ``max_bucket`` is set above any sf bucket size so no
# anchors are capped (exactness; the flagship keeps stride=8 + caps as the
# 100 TB scale path and measures the residual instead).
# ---------------------------------------------------------------------------

def q_containment_pairs(sf_dir: str, gram: int = 4, backend: str = "scan"):
    from who_owns_mass_processing_ray.stages import containment as ct

    cfg = DedupConfig(containment_gram=gram, containment_stride=1,
                      containment_min_len=1, max_bucket=1_000_000_000,
                      num_parts=16, containment_backend=backend)

    def feat(t: pa.Table) -> pa.Table:
        return pa.table({
            "clip_id": pc.cast(t["doc_id"], pa.string()),
            "transcript_norm": t["text"],
        })

    # both sides of the completeness precondition: non-null, >= gram chars
    feats = _docs(sf_dir).map_batches(feat, batch_format="pyarrow") \
        .map_batches(
            lambda t: t.filter(pc.fill_null(pc.greater_equal(
                pc.utf8_length(t["transcript_norm"]), gram), False)),
            batch_format="pyarrow")
    edges = ct.containment_edges(feats, cfg)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            "container_id": pc.cast(t["left_id"], pa.int64()),
            "contained_id": pc.cast(t["right_id"], pa.int64()),
        })

    return edges.map_batches(out, batch_format="pyarrow") \
        .sort(["container_id", "contained_id"])


def q_containment_pairs_sa(sf_dir: str, gram: int = 4):
    """`q_containment_pairs` on the ``suffix_array`` verify backend
    (functions/suffix.py) — the north-star's named suffix-array substring
    matcher, hash-matched against the same DuckDB ``contains()`` oracle."""
    return q_containment_pairs(sf_dir, gram=gram, backend="suffix_array")


def containment_pairs_sql(gram: int = 4) -> str:
    return f"""
        WITH d AS (SELECT doc_id, text FROM documents
                   WHERE text IS NOT NULL AND length(text) >= {gram})
        SELECT b.doc_id AS container_id, a.doc_id AS contained_id
        FROM d a JOIN d b
          ON a.doc_id <> b.doc_id
         AND length(a.text) < length(b.text)
         AND contains(b.text, a.text)
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination + repetition statistics — the two remaining
# training-data hygiene ops a 100 TB corpus pipeline runs alongside dedup
# (the reference has no equivalent; capability class = vocab-driven flags,
# /root/reference/R/standardizers.R:1882-2101, generalized to n-gram
# membership and word-frequency profiles).
# ---------------------------------------------------------------------------

DECON_GRAM_WORDS = 5     # word n-gram size for contamination checks
DECON_BENCH_MOD = 97     # doc_id % MOD == 0 -> the held-out "benchmark" set


def _word_grams(t: pa.Table, n: int):
    """All word ``n``-grams of ``t['text']``, fully vectorized.

    Returns ``(doc_idx, grams)``: a numpy int array mapping each gram to its
    row in ``t`` and a StringArray of space-joined grams.  Tokenization is
    whitespace splitting with empty tokens dropped (matches the DuckDB
    oracle's ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')``).
    Gram strings are built with ONE ``pc.binary_join_element_wise`` over
    ``n`` shifted views of the flattened token array — no per-row loop.
    """
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
    parent = pc.list_parent_indices(la).to_numpy()
    flat = la.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    M = len(flat)
    if M < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    parts = [flat.slice(j, M - n + 1) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = parent[: M - n + 1] == parent[n - 1:]
    return parent[: M - n + 1][valid], grams.filter(pa.array(valid))


def _word_counts(t: pa.Table):
    """Per-(row, word) counts, vectorized: returns ``(doc_idx_of_unique,
    counts_of_unique, words_per_row)``."""
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
    parent = pc.list_parent_indices(la).to_numpy()
    flat = la.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    n_rows = len(t)
    n_words = np.bincount(parent, minlength=n_rows).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64) if len(enc) else \
        np.empty(0, np.int64)
    K = len(enc.dictionary) if len(enc) else 1
    key = parent * K + codes
    ukey, counts = np.unique(key, return_counts=True)
    return (ukey // K), counts.astype(np.int64), n_words


DECON_HASH_SEED = 0x5EED  # 64-bit gram hashing (false-hit prob ~ m²/2⁶⁵)


class Decontaminate:
    """Actor: the distinct benchmark-gram HASH set (an Arrow int64 array —
    8 B/gram, no Python-string overhead — broadcast once via ``ray.put``)
    held in ``__init__``; per batch, hash the corpus grams with the same
    64-bit seed and run one ``pc.is_in`` C kernel + a numpy distinct-hit
    count per doc.  The benchmark side is bounded by benchmark-suite size
    (MBs at 100 TB corpus scale), so a broadcast set — not a shuffle join
    — is the right shape; 64-bit hashing keeps the false-hit probability
    below 1e-6 even at 10⁸ grams."""

    def __init__(self, grams_ref):
        import ray

        self.value_set = ray.get(grams_ref)   # sorted Arrow int64 array

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_idx, grams = _word_grams(t, DECON_GRAM_WORDS)
        n_hits = np.zeros(len(t), np.int64)
        if len(grams):
            gh = hx.hash_strings(grams, seed=DECON_HASH_SEED) \
                .view(np.int64)
            hit = pc.is_in(pa.array(gh), value_set=self.value_set)
            hnp = hit.to_numpy(zero_copy_only=False)
            if hnp.any():
                hgv = gh[hnp]
                hd = doc_idx[hnp]
                order = np.lexsort((hgv, hd))      # distinct (doc, gram)
                hd_s, hg_s = hd[order], hgv[order]
                first = np.ones(len(order), dtype=bool)
                if len(order) > 1:
                    first[1:] = (hd_s[1:] != hd_s[:-1]) | \
                        (hg_s[1:] != hg_s[:-1])
                np.add.at(n_hits, hd_s[first], 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag docs sharing any word 5-gram with
    the held-out benchmark split (doc_id % 97 == 0).  The benchmark gram
    set is hashed to 64 bits inside map_batches (per-batch distinct),
    concatenated as an Arrow int64 array — never a Python string set, no
    ``take_all`` — and broadcast once; the corpus side streams."""
    import ray

    from who_owns_mass_processing_ray.stages import pool_bounds

    def _split(t: pa.Table, bench_side: bool) -> pa.Table:
        mod = t["doc_id"].to_numpy() % DECON_BENCH_MOD == 0
        return t.filter(pa.array(mod if bench_side else ~mod))

    def emit(t: pa.Table) -> pa.Table:
        _, grams = _word_grams(_split(t, True), DECON_GRAM_WORDS)
        gh = hx.hash_strings(pc.unique(grams), seed=DECON_HASH_SEED)
        return pa.table({"gh": pa.array(np.unique(gh).view(np.int64))})

    gram_tables = ray.get(_docs(sf_dir).map_batches(
        emit, batch_format="pyarrow").materialize().to_arrow_refs())
    gram_tables = [t for t in gram_tables if t.num_rows]
    if gram_tables:
        gh_all = np.unique(np.concatenate(
            [t["gh"].to_numpy() for t in gram_tables]))
    else:
        gh_all = np.empty(0, np.int64)
    grams_ref = ray.put(pa.array(gh_all, pa.int64()))

    corpus = _docs(sf_dir).map_batches(
        lambda t: _split(t, False), batch_format="pyarrow")
    return corpus.map_batches(
        Decontaminate, fn_constructor_kwargs={"grams_ref": grams_ref},
        batch_format="pyarrow", batch_size=1024,
        concurrency=pool_bounds(4),
    ).sort("doc_id")


def decontaminate_sql() -> str:
    n, mod = DECON_GRAM_WORDS, DECON_BENCH_MOD
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(w) - {n - 1}, 0) + 1),
                   i -> array_to_string(list_slice(w, i, i + {n - 1}), ' ')
                 )) AS gram
          FROM tok
        ),
        bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = 0),
        hits AS (
          SELECT dg.doc_id, count(*) AS n_hits
          FROM (SELECT DISTINCT doc_id, gram FROM g
                WHERE doc_id % {mod} <> 0) dg
          JOIN bg USING (gram)
          GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {mod} <> 0
        ORDER BY d.doc_id
    """


def q_word_repetition(sf_dir: str):
    """Per-doc repetition statistics (the Gopher-style repetition filters):
    word count, distinct-word count, duplicate-word fraction, and the
    top word's frequency share.  One dictionary-encode + numpy unique per
    batch — no per-row loop, no shuffle (per-doc stats are embarrassingly
    parallel)."""
    ds = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        doc_u, counts, n_words = _word_counts(t)
        n_rows = len(t)
        n_distinct = np.bincount(doc_u, minlength=n_rows).astype(np.int64)
        top = np.zeros(n_rows, np.int64)
        np.maximum.at(top, doc_u, counts)
        safe = np.maximum(n_words, 1).astype(np.float64)
        out = pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct": pa.array(n_distinct),
            "dup_frac": round_half_away(
                pa.array(1.0 - n_distinct / safe), 4),
            "top_frac": round_half_away(pa.array(top / safe), 4),
        })
        # match the oracle: null/empty docs have no word rows in SQL and
        # drop out of its GROUP BY (the null-divergence class ADVICE r3
        # flagged in q_pack_sequences, aligned here too)
        return out.filter(pa.array(n_words > 0))

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def word_repetition_sql() -> str:
    return """
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        u AS (SELECT doc_id, unnest(w) AS word FROM tok),
        c AS (SELECT doc_id, word, count(*) AS cnt FROM u GROUP BY 1, 2),
        s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(max(cnt) AS BIGINT) AS top_cnt
              FROM c GROUP BY 1)
        SELECT doc_id, n_words, n_distinct,
               round(1.0 - n_distinct * 1.0 / greatest(n_words, 1), 4)
                 AS dup_frac,
               round(top_cnt * 1.0 / greatest(n_words, 1), 4) AS top_frac
        FROM s
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Gopher-style n-gram repetition fractions — the repeated-n-gram quality
# filters from Rae et al. 2021 (Gopher, table A1): per doc, the share of
# word n-grams occupied by the single most frequent n-gram (top-n-gram
# fraction) and the share of n-grams that are repeats of an earlier one
# (duplicate-n-gram fraction), for n = 2, 3, 4.  q_word_repetition is the
# n = 1 member of the same family.  (Gopher weights by characters; this
# uses gram counts so the DuckDB oracle is exact — same decision boundary
# class.)  Pure map-side: one dictionary_encode + one rolling token-hash
# pass per n (64-bit, within-doc collision prob ~ g²/2⁶⁵) + one lexsort —
# no shuffle, document text never leaves its block.
# ---------------------------------------------------------------------------

GOPHER_NS = (2, 3, 4)


def q_ngram_repetition(sf_dir: str):
    """-> (doc_id, n_words, top2_frac, dup2_frac, top3_frac, dup3_frac,
    top4_frac, dup4_frac) for every doc with >= 2 words; fractions are 0
    where the doc is shorter than n."""
    ds = _docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        cols: dict[str, pa.Array] = {}
        if not len(t):
            empty = {"doc_id": pa.array([], pa.int64()),
                     "n_words": pa.array([], pa.int64())}
            for n in GOPHER_NS:
                empty[f"top{n}_frac"] = pa.array([], pa.float64())
                empty[f"dup{n}_frac"] = pa.array([], pa.float64())
            return pa.table(empty)
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        la = pc.utf8_split_whitespace(col)
        parent = pc.list_parent_indices(la).to_numpy()
        flat = la.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        n_rows = len(t)
        n_words = np.bincount(parent, minlength=n_rows).astype(np.int64)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = (enc.indices.to_numpy().astype(np.uint64) if len(enc)
                 else np.empty(0, np.uint64))
        offsets = np.concatenate(([0], np.cumsum(n_words)))
        cols["doc_id"] = t["doc_id"]
        cols["n_words"] = pa.array(n_words)
        for n in GOPHER_NS:
            vals, ooffs = hx.token_shingle_hashes(codes, offsets, n)
            seg = np.repeat(np.arange(n_rows), np.diff(ooffs))
            order = np.lexsort((vals, seg))
            v_s, s_s = vals[order], seg[order]
            if len(v_s):
                new_run = np.concatenate(
                    ([True], (v_s[1:] != v_s[:-1]) | (s_s[1:] != s_s[:-1])))
            else:
                new_run = np.empty(0, bool)
            run_len = np.bincount(np.cumsum(new_run) - 1) if len(v_s) \
                else np.empty(0, np.int64)
            run_seg = s_s[new_run]
            distinct = np.bincount(run_seg, minlength=n_rows)
            top = np.zeros(n_rows, np.int64)
            np.maximum.at(top, run_seg, run_len)
            total = np.maximum(n_words - n + 1, 0)
            # token_shingle_hashes emits one whole-seq hash for docs with
            # 0 < len < n; the valid mask zeroes those out
            valid = n_words >= n
            safe = np.maximum(total, 1).astype(np.float64)
            cols[f"top{n}_frac"] = round_half_away(
                pa.array(np.where(valid, top / safe, 0.0)), 4)
            cols[f"dup{n}_frac"] = round_half_away(
                pa.array(np.where(valid, 1.0 - distinct / safe, 0.0)), 4)
        return pa.table(cols).filter(pa.array(n_words >= 2))

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def ngram_repetition_sql() -> str:
    per_n = []
    joins = []
    sel = []
    for n in GOPHER_NS:
        per_n.append(f"""
        c{n} AS (
          SELECT doc_id, w,
                 unnest(range(0, CAST(len(w) - {n - 1} AS BIGINT))) AS i
          FROM base
        ),
        g{n} AS (
          SELECT doc_id,
                 array_to_string(list_slice(w, i + 1, i + {n}), ' ') AS gram
          FROM c{n}
        ),
        a{n} AS (
          SELECT doc_id, max(c) AS mx, count(*) AS nd, sum(c) AS tot
          FROM (SELECT doc_id, gram, count(*) AS c FROM g{n}
                GROUP BY doc_id, gram)
          GROUP BY doc_id
        )""")
        joins.append(f"LEFT JOIN a{n} USING (doc_id)")
        sel.append(f"""
               round(coalesce(a{n}.mx * 1.0 / a{n}.tot, 0), 4)
                   AS top{n}_frac,
               round(coalesce(1.0 - a{n}.nd * 1.0 / a{n}.tot, 0), 4)
                   AS dup{n}_frac""")
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        base AS (SELECT doc_id, w FROM tok WHERE len(w) >= 2),
        {','.join(per_n)}
        SELECT base.doc_id,
               CAST(len(base.w) AS BIGINT) AS n_words,
               {','.join(sel)}
        FROM base {' '.join(joins)}
        ORDER BY base.doc_id
    """


# ---------------------------------------------------------------------------
# Corpus statistics: global n-gram top-k + per-doc TF-IDF keyword terms
# (the corpus-analysis pass a training-data pipeline runs before filtering;
# capability class ≙ the reference's vocabulary/frequency summaries,
# /root/reference/R/summarizers.R — re-expressed as partial-aggregate
# shuffles, never a driver-side token table)
# ---------------------------------------------------------------------------

NGRAM_TOPK_N = 3
NGRAM_TOPK_K = 100
TFIDF_TOP_RK = 3
_TFIDF_PARTS = 32


def q_ngram_topk(sf_dir: str, n: int = NGRAM_TOPK_N, k: int = NGRAM_TOPK_K):
    """Global top-``k`` word ``n``-grams by occurrence count.  Counting is
    PARTIAL per batch (dictionary-encode + unique inside map_batches), so
    only (gram, count) combiner rows — bounded by distinct-gram cardinality
    per batch, not token volume — reach the groupby shuffle; the final sort
    ranks the tiny aggregated table.  Total order (count desc, gram asc)
    makes the LIMIT deterministic on both engines."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        _, grams = _word_grams(t, n)
        if not len(grams):
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(grams)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = np.bincount(enc.indices.to_numpy(),
                             minlength=len(enc.dictionary))
        return pa.table({"gram": enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("n", alias_name="n_total")) \
        .sort(["n_total", "gram"], descending=[True, False]).limit(k)


def ngram_topk_sql() -> str:
    n, k = NGRAM_TOPK_N, NGRAM_TOPK_K
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        g AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(w) - {n - 1}, 0) + 1),
                   i -> array_to_string(list_slice(w, i, i + {n - 1}), ' ')
                 )) AS gram
          FROM tok
        )
        SELECT gram, count(*) AS n_total FROM g GROUP BY gram
        ORDER BY n_total DESC, gram LIMIT {k}
    """


def _term_tf(t: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows for every distinct word of every doc —
    one dictionary-encode + one ``np.unique`` per batch."""
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
    parent = pc.list_parent_indices(la).to_numpy()
    flat = la.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    if not len(flat):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    K = len(enc.dictionary)
    ukey, counts = np.unique(parent * K + codes, return_counts=True)
    doc_ids = t["doc_id"].to_numpy()[ukey // K]
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "term": enc.dictionary.take(pa.array(ukey % K)),
        "tf": pa.array(counts.astype(np.int64)),
    })


def q_tfidf_terms(sf_dir: str, top: int = TFIDF_TOP_RK):
    """Per-doc top-``top`` TF-IDF terms (keyword extraction).  Distributed
    shape: (doc, term, tf) rows stream out of one vectorized pass; the
    document-frequency side is a distinct-term aggregate (vocabulary-sized
    — attached via the adaptive broadcast/shuffle join); ranking is a
    per-doc-partition C sort + vectorized rank filter.  idf = ln(N/df)."""
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins

    docs = _docs(sf_dir)
    # N = docs with non-null text (matches the oracle's WHERE) — streamed
    # partial counts, not a driver pull
    n_docs = docs.map_batches(
        lambda t: pa.table({"n": pa.array([len(t) - t["text"].null_count],
                                          pa.int64())}),
        batch_format="pyarrow").sum("n")

    tf_rows = docs.map_batches(_term_tf, batch_format="pyarrow")
    df_tbl = tf_rows.groupby("term").aggregate(Count(alias_name="df"))
    with_df = joins.attach_columns(tf_rows, df_tbl, "term", "term",
                                   {"df": "df"}, _TFIDF_PARTS, how="inner")

    def weigh(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy().astype(np.float64)
        df = t["df"].to_numpy().astype(np.float64)
        w = tf * np.log(float(n_docs) / df)
        part = (t["doc_id"].to_numpy() % _TFIDF_PARTS).astype(np.int32)
        return pa.table({"doc_id": t["doc_id"], "term": t["term"],
                         "w": pa.array(w), "part": pa.array(part)})

    def rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending"), ("w", "descending"),
                       ("term", "ascending")])
        ids = g["doc_id"].to_numpy()
        n = len(ids)
        new_doc = np.concatenate(([True], ids[1:] != ids[:-1]))
        starts = np.flatnonzero(new_doc)
        sizes = np.diff(np.append(starts, n))
        rk = np.arange(n) - np.repeat(starts, sizes) + 1
        keep = rk <= top
        out = g.filter(pa.array(keep))
        return pa.table({
            "doc_id": out["doc_id"],
            "term": out["term"],
            "tfidf": pa.array(round_half_away(
                out["w"].to_numpy().astype(np.float64), 4)),
            "rk": pa.array(rk[keep].astype(np.int64)),
        })

    out = with_df.map_batches(weigh, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: rank(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.sort(["doc_id", "rk"])


def tfidf_terms_sql() -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        t AS (SELECT doc_id, unnest(w) AS term FROM tok),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        s AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * ln(n.n / CAST(df.df AS DOUBLE)) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY w DESC, term) AS rk
          FROM s
        )
        SELECT doc_id, term, round(w, 4) AS tfidf, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {TFIDF_TOP_RK}
        ORDER BY doc_id, rk
    """


# ---------------------------------------------------------------------------
# Corpus assembly: deterministic sampling / split assignment + sliding-window
# chunking (the dataset-construction stage downstream of dedup+filtering)
# ---------------------------------------------------------------------------

SAMPLE_PER_SOURCE = 50
_KNUTH = 2654435761  # Knuth multiplicative hash constant
CHUNK_WORDS = 32
CHUNK_STRIDE = 16


def q_sample_stratified(sf_dir: str, k: int = SAMPLE_PER_SOURCE):
    """Deterministic stratified sampling + train/val/test split assignment.
    The sampling key is an arithmetic Knuth hash of doc_id — identical
    integer math on both engines, so the sample is reproducible across
    runs, partitionings AND engines (no RNG state anywhere).  Per-source
    rank is a per-partition C sort + vectorized rank (sources never split
    across partitions)."""
    ds = _docs(sf_dir, columns=("doc_id", "source"))
    P = 32

    def hashed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        h = (ids * _KNUTH) % 4294967296
        split_code = h % 10
        split = pa.array(np.where(split_code < 8, "train",
                                  np.where(split_code == 8, "val", "test")))
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "h": pa.array(h), "split": split})

    def parts(t: pa.Table) -> pa.Table:
        # stable source partition: sum of byte values mod P (vectorized via
        # dictionary encode — the distinct-source set per batch is tiny)
        enc = pc.dictionary_encode(t["source"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_vals = enc.dictionary.to_pylist()  # distinct sources only (~10)
        pmap = np.array([sum(s.encode()) % P for s in dict_vals], np.int32)
        part = pmap[enc.indices.to_numpy()]
        return t.append_column("part", pa.array(part))

    def rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([("source", "ascending"), ("h", "ascending"),
                       ("doc_id", "ascending")])
        src = g["source"].to_numpy(zero_copy_only=False)
        n = len(src)
        new_src = np.concatenate(([True], src[1:] != src[:-1]))
        starts = np.flatnonzero(new_src)
        sizes = np.diff(np.append(starts, n))
        rk = np.arange(n) - np.repeat(starts, sizes) + 1
        keep = rk <= k
        out = g.filter(pa.array(keep))
        return pa.table({"doc_id": out["doc_id"], "source": out["source"],
                         "split": out["split"],
                         "rk": pa.array(rk[keep].astype(np.int64))})

    out = ds.map_batches(hashed, batch_format="pyarrow") \
        .map_batches(parts, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: rank(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.sort(["source", "rk"])


def sample_stratified_sql() -> str:
    return f"""
        WITH h AS (
          SELECT doc_id, source,
                 (doc_id * {_KNUTH}) % 4294967296 AS hv
          FROM documents
        ),
        r AS (
          SELECT doc_id, source, hv,
                 CASE WHEN hv % 10 < 8 THEN 'train'
                      WHEN hv % 10 = 8 THEN 'val' ELSE 'test' END AS split,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hv, doc_id) AS rk
          FROM h
        )
        SELECT doc_id, source, split, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {SAMPLE_PER_SOURCE}
        ORDER BY source, rk
    """


def chunk_batch(t: pa.Table, width: int, stride: int) -> pa.Table:
    """Vectorized word-window chunker over one Arrow batch: one split per
    batch, then numpy repeat/arange index construction + one ListArray
    rebuild + one ``pc.binary_join`` — no per-doc Python.  Shared by
    ``q_chunk_text`` (sliding windows) and ``q_para_dedup``
    (non-overlapping paragraphs, stride == width)."""
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
    parent = pc.list_parent_indices(la).to_numpy()
    flat = la.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int64()),
                      "n_words": pa.array([], pa.int64()),
                      "chunk": pa.array([], pa.string())})
    if not len(flat):
        return empty
    # tokens per doc (docs with 0 tokens drop out, same as the oracle)
    docs, ntok = np.unique(parent, return_counts=True)
    doc_start = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    # chunks per doc: starts 0, stride, ... while start < ntok
    nch = (ntok + stride - 1) // stride
    total = int(nch.sum())
    if total == 0:
        return empty
    ch_doc = np.repeat(np.arange(len(docs)), nch)       # chunk -> doc pos
    ch_idx = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(nch)[:-1])), nch)
    ch_start = ch_idx * stride                          # within-doc offset
    ch_len = np.minimum(ntok[ch_doc] - ch_start, width)
    # gather indices into flat tokens: for each chunk, start..start+len
    tok_off = np.concatenate(([0], np.cumsum(ch_len)[:-1]))
    gather = (np.arange(int(ch_len.sum())) -
              np.repeat(tok_off, ch_len) +
              np.repeat(doc_start[ch_doc] + ch_start, ch_len))
    chunk_tokens = flat.take(pa.array(gather))
    offsets = pa.array(np.concatenate(([0], np.cumsum(ch_len))),
                       pa.int32())
    chunk_list = pa.ListArray.from_arrays(offsets, chunk_tokens)
    joined = pc.binary_join(chunk_list, " ")
    return pa.table({
        "doc_id": pa.array(t["doc_id"].to_numpy()[docs[ch_doc]]),
        "chunk_idx": pa.array(ch_idx.astype(np.int64)),
        "n_words": pa.array(ch_len.astype(np.int64)),
        "chunk": joined,
    })


def q_chunk_text(sf_dir: str, width: int = CHUNK_WORDS,
                 stride: int = CHUNK_STRIDE):
    """Sliding-window word chunking (width {W}, stride {S}) — the
    context-window slicing step that turns filtered documents into training
    sequences.  Per-batch work is the fully vectorized ``chunk_batch``."""
    return _docs(sf_dir).map_batches(
        lambda t: chunk_batch(t, width, stride),
        batch_format="pyarrow").sort(["doc_id", "chunk_idx"])


def chunk_text_sql() -> str:
    w, s = CHUNK_WORDS, CHUNK_STRIDE
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, CAST(ceil(len(w) * 1.0 / {s}) AS BIGINT)))
                     AS chunk_idx
          FROM tok WHERE len(w) > 0
        )
        SELECT doc_id, chunk_idx,
               CAST(len(list_slice(w, chunk_idx * {s} + 1,
                                   chunk_idx * {s} + {w})) AS BIGINT)
                   AS n_words,
               array_to_string(list_slice(w, chunk_idx * {s} + 1,
                                          chunk_idx * {s} + {w}), ' ')
                   AS chunk
        FROM c
        ORDER BY doc_id, chunk_idx
    """


# ---------------------------------------------------------------------------
# Paragraph-level (chunk) dedup — the CCNet-style repeated-span removal a
# pretraining corpus runs BEFORE document-level near-dup: split every doc
# into non-overlapping word windows, keep only the globally FIRST occurrence
# of each window's content, and reassemble the surviving text per doc.
# Capability class ≙ the reference's duplicate-row collapse applied one
# level below the row (dedupe_naive, /root/reference/R/deduplicaters.R:208-223
# — here the "row" is a chunk occurrence keyed by content).
#
# Scale shape: two shuffles on the two natural keys — occurrences hash-
# partitioned by CHUNK CONTENT (so every occurrence of a span meets its
# twins in one partition; winner = lexicographic-min (doc_id, chunk_idx),
# one dictionary_encode + lexsort per group, no per-row Python), then the
# flagged occurrences hash-partitioned by DOC (one sort + segment pass to
# rebuild each doc's surviving text with a ListArray + binary_join).  Only
# (hash-partition key, ids, chunk strings) cross the exchanges; nothing is
# gathered to the driver.
# ---------------------------------------------------------------------------

PARA_WORDS = 16          # non-overlapping window width
_PARA_PARTS = 32         # fixed partition count -> deterministic plan


def _chunked_by_content(t: pa.Table, width: int) -> pa.Table:
    """Chunk one batch and key each occurrence by its CONTENT hash partition
    (shared by ``q_para_dedup`` and ``q_boilerplate_strip`` — both need every
    occurrence of a span to meet its twins in one partition)."""
    c = chunk_batch(t, width, width)
    h = hx.hash_strings(c["chunk"])
    return c.append_column(
        "part", pa.array((h % _PARA_PARTS).astype(np.int32)))


def _assemble_kept(g: pa.Table) -> pa.Table:
    """Rebuild each doc's surviving text from flagged chunk occurrences in
    one doc-hash partition: one sort + segmented counts + ListArray
    ``binary_join`` — no per-doc Python (shared by ``q_para_dedup`` and
    ``q_boilerplate_strip``)."""
    g = g.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    ids = g["doc_id"].to_numpy()
    keep = g["keep"].to_numpy(zero_copy_only=False)
    new_doc = np.concatenate(([True], ids[1:] != ids[:-1]))
    starts = np.flatnonzero(new_doc)
    n = len(ids)
    sizes = np.diff(np.append(starts, n))
    # per-doc kept counts via segmented sum of the keep mask
    kept_cum = np.concatenate(([0], np.cumsum(keep)))
    bounds = np.append(starts, n)
    n_kept = np.diff(kept_cum[bounds])
    kept_chunks = g["chunk"].filter(g["keep"])
    if isinstance(kept_chunks, pa.ChunkedArray):
        kept_chunks = kept_chunks.combine_chunks()
    offsets = pa.array(np.concatenate(
        ([0], np.cumsum(n_kept))).astype(np.int32))
    joined = pc.binary_join(
        pa.ListArray.from_arrays(offsets, kept_chunks), " ")
    return pa.table({
        "doc_id": pa.array(ids[starts]),
        "n_chunks": pa.array(sizes.astype(np.int64)),
        "n_kept": pa.array(n_kept.astype(np.int64)),
        "kept_text": joined,
    })


def q_para_dedup(sf_dir: str, width: int = PARA_WORDS):
    """doc_id, n_chunks, n_kept, kept_text after global keep-first chunk
    dedup.  Docs whose every chunk is a repeat stay in the output with
    kept_text = '' (they are exactly the docs a corpus build drops)."""
    ds = _docs(sf_dir)
    P = _PARA_PARTS

    def flag(g: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(g["chunk"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy()
        ids = g["doc_id"].to_numpy()
        idx = g["chunk_idx"].to_numpy()
        order = np.lexsort((idx, ids, codes))      # content, then (doc, pos)
        first = np.concatenate(([True], codes[order][1:] != codes[order][:-1]))
        keep = np.zeros(len(g), dtype=bool)
        keep[order] = first
        return pa.table({
            "doc_id": g["doc_id"],
            "chunk_idx": g["chunk_idx"],
            "chunk": g["chunk"],
            "keep": pa.array(keep),
            "dpart": pa.array((ids % P).astype(np.int32)),
        })

    out = ds.map_batches(lambda t: _chunked_by_content(t, width),
                         batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: flag(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby("dpart").map_groups(
            lambda g: _assemble_kept(g.drop_columns(["dpart"])),
            batch_format="pyarrow")
    return out.sort("doc_id")


def para_dedup_sql() -> str:
    w = PARA_WORDS
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, CAST(ceil(len(w) * 1.0 / {w}) AS BIGINT)))
                     AS chunk_idx
          FROM tok WHERE len(w) > 0
        ),
        ch AS (
          SELECT doc_id, chunk_idx,
                 array_to_string(list_slice(w, chunk_idx * {w} + 1,
                                            chunk_idx * {w} + {w}), ' ')
                     AS chunk
          FROM c
        ),
        r AS (
          SELECT doc_id, chunk_idx, chunk,
                 row_number() OVER (PARTITION BY chunk
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM ch
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
               coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
                            FILTER (rn = 1), '') AS kept_text
        FROM r GROUP BY doc_id ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Frequency-based boilerplate removal — the CCNet/RefinedWeb line-frequency
# filter: a span whose content occurs in >= BOILER_MIN_DOCS DISTINCT
# documents is boilerplate (nav bars, license headers, templated footers)
# and is stripped from EVERY document, including the first occurrence —
# the complement of q_para_dedup's keep-first policy (dedup keeps one copy;
# boilerplate removal keeps zero).  Capability class ≙ the reference's
# vocabulary-driven junk removal (std_replace_blank's junk lexicon,
# /root/reference/R/standardizers.R:189-243) with the lexicon LEARNED from
# corpus frequency instead of hand-curated.
#
# Scale shape: identical two-shuffle plan as q_para_dedup (content-hash
# partitions decide, doc-hash partitions reassemble) — the frequency test is
# exact because every occurrence of a span lands in one partition, where
# distinct-doc counting is one lexsort + boundary diff.  Only (hash, ids,
# chunk strings) cross the exchanges; document bytes never shuffle.
# ---------------------------------------------------------------------------

BOILER_MIN_DOCS = 3      # spans seen in >= this many distinct docs drop


def q_boilerplate_strip(sf_dir: str, width: int = PARA_WORDS,
                        min_docs: int = BOILER_MIN_DOCS):
    """doc_id, n_chunks, n_boiler, kept_text after removing every chunk
    whose content appears in >= ``min_docs`` distinct documents."""
    ds = _docs(sf_dir)
    P = _PARA_PARTS

    def flag(g: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(g["chunk"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy()
        ids = g["doc_id"].to_numpy()
        # distinct docs per content code: sort by (code, doc), count
        # (code, doc) boundary starts per code — one lexsort, no Python loop
        order = np.lexsort((ids, codes))
        c_s, i_s = codes[order], ids[order]
        pair_start = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | (i_s[1:] != i_s[:-1])))
        n_docs = np.bincount(c_s[pair_start],
                             minlength=len(enc.dictionary))
        boiler = n_docs[codes] >= min_docs
        return pa.table({
            "doc_id": g["doc_id"],
            "chunk_idx": g["chunk_idx"],
            "chunk": g["chunk"],
            "keep": pa.array(~boiler),
            "dpart": pa.array((ids % P).astype(np.int32)),
        })

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chunks": t["n_chunks"],
            "n_boiler": pc.subtract(t["n_chunks"], t["n_kept"]),
            "kept_text": t["kept_text"],
        })

    out = ds.map_batches(lambda t: _chunked_by_content(t, width),
                         batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: flag(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby("dpart").map_groups(
            lambda g: rename(_assemble_kept(g.drop_columns(["dpart"]))),
            batch_format="pyarrow")
    return out.sort("doc_id")


def boilerplate_strip_sql() -> str:
    w, k = PARA_WORDS, BOILER_MIN_DOCS
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, CAST(ceil(len(w) * 1.0 / {w}) AS BIGINT)))
                     AS chunk_idx
          FROM tok WHERE len(w) > 0
        ),
        ch AS (
          SELECT doc_id, chunk_idx,
                 array_to_string(list_slice(w, chunk_idx * {w} + 1,
                                            chunk_idx * {w} + {w}), ' ')
                     AS chunk
          FROM c
        ),
        f AS (
          SELECT chunk FROM ch
          GROUP BY chunk HAVING count(DISTINCT doc_id) >= {k}
        )
        SELECT ch.doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(*) FILTER (f.chunk IS NOT NULL) AS BIGINT)
                   AS n_boiler,
               coalesce(string_agg(ch.chunk, ' ' ORDER BY ch.chunk_idx)
                            FILTER (f.chunk IS NULL), '') AS kept_text
        FROM ch LEFT JOIN f ON ch.chunk = f.chunk
        GROUP BY ch.doc_id ORDER BY ch.doc_id
    """


# ---------------------------------------------------------------------------
# Near-dup retention policy — keep the "best" member of every near-dup
# cluster (the decision step after clustering: which copy enters the
# training set).  Quality key = n_chars desc, tiebreak doc_id asc.
# ≙ the reference's canonical-record election over dedup groups
# (metacorp naming, /root/reference/R/deduplicaters.R:684-710) applied to
# the documents corpus, with the whole chain — LSH pairs → exact-Jaccard
# verify → connected components → per-group argmax — hash-checked against
# a DuckDB recursive-CTE + window-rank oracle.
# ---------------------------------------------------------------------------


def q_near_dup_keep_best(sf_dir: str):
    """group_id, kept_doc_id, n_members, n_chars_kept per multi-doc
    near-dup group."""
    from who_owns_mass_processing_ray.stages.joins import attach_columns

    groups = q_near_dup_groups(sf_dir)               # doc_id, group_id
    meta = _docs(sf_dir, columns=("doc_id", "n_chars"))
    joined = attach_columns(groups, meta, "doc_id", "doc_id",
                            {"n_chars": "n_chars"}, num_partitions=None)

    def pick(g: pa.Table) -> pa.Table:
        nc = g["n_chars"].to_numpy()
        ids = g["doc_id"].to_numpy()
        best = np.lexsort((ids, -nc))[0]
        return pa.table({
            "group_id": g["group_id"].slice(best, 1),
            "kept_doc_id": g["doc_id"].slice(best, 1),
            "n_members": pa.array([len(g)], pa.int64()),
            "n_chars_kept": g["n_chars"].slice(best, 1),
        })

    return joined.groupby("group_id").map_groups(
        pick, batch_format="pyarrow").sort("group_id")


# ---------------------------------------------------------------------------
# Streaming sequence packing — assign documents to fixed token-budget packs
# (the step that turns a filtered corpus into context-window training
# batches).  Deterministic across engines, runs and parallelism: docs are
# hash-partitioned by a Knuth multiplicative hash into a FIXED number of
# streams, ordered by doc_id within each stream, and packed by exclusive
# running token count — pure integer math, so the DuckDB window-SUM oracle
# reproduces it bit-for-bit.  No RNG, no driver state; one groupby shuffle.
# ---------------------------------------------------------------------------

PACK_BUDGET = 256        # words per pack


def q_pack_sequences(sf_dir: str, budget: int = PACK_BUDGET):
    """part, doc_id, n_words, pack_id, pack_off for every non-null doc."""
    ds = _docs(sf_dir)
    P = _PARA_PARTS

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))     # match oracle: non-null only
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        la = pc.utf8_split_whitespace(txt)
        flat = la.flatten()
        parent = pc.list_parent_indices(la).to_numpy()
        nonempty = pc.greater(pc.utf8_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        n_words = np.bincount(parent[nonempty], minlength=len(t)) \
            .astype(np.int64)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        part = (ids * _KNUTH) % 4294967296 % P
        return pa.table({"part": pa.array(part),
                         "doc_id": t["doc_id"],
                         "n_words": pa.array(n_words)})

    def pack(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        n = g["n_words"].to_numpy()
        prev = np.cumsum(n) - n                      # exclusive running sum
        pack_id = prev // budget
        return pa.table({
            "part": g["part"],
            "doc_id": g["doc_id"],
            "n_words": g["n_words"],
            "pack_id": pa.array(pack_id.astype(np.int64)),
            "pack_off": pa.array((prev - pack_id * budget).astype(np.int64)),
        })

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("part").map_groups(pack, batch_format="pyarrow") \
        .sort(["part", "doc_id"])


def pack_sequences_sql() -> str:
    return f"""
        WITH t AS (
          SELECT CAST((doc_id * {_KNUTH}) % 4294967296 % {_PARA_PARTS}
                      AS BIGINT) AS part,
                 doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_words
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT *,
                 sum(n_words) OVER (PARTITION BY part ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_words AS prev
          FROM t
        )
        SELECT part, doc_id, n_words,
               CAST(prev // {PACK_BUDGET} AS BIGINT) AS pack_id,
               CAST(prev - (prev // {PACK_BUDGET}) * {PACK_BUDGET}
                    AS BIGINT) AS pack_off
        FROM c ORDER BY part, doc_id
    """


def q_near_dup_survivors(sf_dir: str):
    """The corpus AFTER near-dup dedup — what actually ships to training:
    every singleton doc plus the best member (n_chars desc, doc_id asc) of
    every near-dup group, tagged with why it survived.  The group table is
    small by construction (near-dup groups ≪ corpus), so it broadcasts;
    the corpus side STREAMS through one filter — the 100 TB shape.
    ≙ dedupe_all's final keep set (/root/reference/R/deduplicaters.R:616-682)."""
    import ray
    import ray.data as rd

    groups_ds = q_near_dup_groups(sf_dir)        # doc_id, group_id (small)
    g = pa.concat_tables(
        [t for t in ray.get(groups_ds.to_arrow_refs()) if t.num_rows])
    gid = g["doc_id"].to_numpy() if g.num_rows else np.empty(0, np.int64)
    ggrp = g["group_id"].to_numpy() if g.num_rows else np.empty(0, np.int64)

    # n_chars of grouped docs only — a second small gather, filtered at read
    meta = _docs(sf_dir, columns=("doc_id", "n_chars"))
    gid_ref = ray.put(pa.array(gid))

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(gid_ref)))

    m = pa.concat_tables([t for t in ray.get(
        meta.map_batches(grab, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows])
    m = m.sort_by([("doc_id", "ascending")])
    nch = (m["n_chars"].to_numpy()[
        np.searchsorted(m["doc_id"].to_numpy(), gid)]
        if m.num_rows else np.zeros(0, np.int64))
    # winner per group: max n_chars, tiebreak min doc_id (tiny, driver-side)
    o = np.lexsort((gid, -nch, ggrp))
    grp_sorted = ggrp[o]
    first = (np.concatenate(([True], grp_sorted[1:] != grp_sorted[:-1]))
             if len(grp_sorted) else np.zeros(0, bool))
    winners = gid[o][first]
    win_grp = grp_sorted[first]
    ws = np.argsort(winners)                 # id order for searchsorted probes
    winners, win_grp = winners[ws], win_grp[ws]
    winners_ref = ray.put(pa.array(winners))
    wgrp_ref = ray.put(pa.array(win_grp))

    def survive(t: pa.Table) -> pa.Table:
        grouped = pc.is_in(t["doc_id"], value_set=ray.get(gid_ref))
        is_win = pc.is_in(t["doc_id"], value_set=ray.get(winners_ref))
        keep = pc.or_(pc.invert(grouped), is_win)
        out = t.filter(keep)
        w = ray.get(winners_ref).to_numpy()
        wg = ray.get(wgrp_ref).to_numpy()
        ids = out["doc_id"].to_numpy()
        pos = np.searchsorted(w, ids)
        pos = np.clip(pos, 0, max(len(w) - 1, 0))
        hit = (w[pos] == ids) if len(w) else np.zeros(len(ids), bool)
        gcol = np.where(hit, wg[pos] if len(w) else -1, -1)
        return pa.table({
            "doc_id": out["doc_id"],
            "group_id": pa.array(gcol.astype(np.int64)),
            "kept_reason": pa.array(
                np.where(hit, "group_best", "singleton")),
        })

    docs = _docs(sf_dir, columns=("doc_id",))
    return docs.map_batches(survive, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Cross-document duplicated-span detection — the Lee et al. 2022
# (arXiv:2107.06499, "Deduplicating Training Data Makes Language Models
# Better") substring-dedup primitive: find every pair of documents sharing
# at least one exact span of >= SPAN_CHARS characters, with the count of
# distinct shared spans.  Generalizes q_containment_pairs (full-string
# containment) to partial overlap — the op that catches boilerplate,
# quoted passages and template reuse that whole-doc MinHash misses.
# Capability class in the reference: the winnowing/containment extraction
# (/root/reference/R/standardizers.R:1148-1182), widened to symmetric spans.
# ---------------------------------------------------------------------------

SPAN_CHARS = 30          # minimum shared-span length (characters)


def q_shared_span_pairs(sf_dir: str, span: int = SPAN_CHARS,
                        num_parts: int | None = None, max_bucket: int = 4096):
    """Doc pairs sharing >= 1 exact ``span``-char substring + the count of
    distinct shared spans (``n_shared_grams``).

    Blocking is COMPLETE and stride-1: every document emits ALL of its
    distinct char-``span``-gram rolling hashes (two independent 64-bit
    seeds = a 128-bit key, the same birthday discipline as
    stages/exact.py — collision-safe past 10^12 grams), so any shared
    span of length >= ``span`` shares an aligned gram by construction.
    Shape: one vectorized rolling-hash pass per batch -> narrow
    (h1, h2, doc_id) rows -> coarse hash-partition groupby -> in-partition
    run-length pair expansion (stages/pairs._triangular_pairs) with partial
    per-pair counts -> tiny global sum over verified pairs.  Nothing
    all-pairs, nothing driver-side; gram rows are ~bytes-of-corpus narrow
    rows, the same volume discipline as the suffix-array literature's
    (doc, gram) table.  Hot spans (> ``max_bucket`` docs sharing one gram
    — boilerplate at corpus scale) are salted + counted via ``dropped``,
    never silent; at test scale no bucket approaches the cap, so the
    result is oracle-exact.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from who_owns_mass_processing_ray.stages import pairs as pr

    docs = _docs(sf_dir)

    def gram_rows(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        keep = pc.fill_null(
            pc.greater_equal(pc.utf8_length(txt), span), False)
        t2 = t.filter(keep)
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t2["doc_id"].to_numpy()
        v1, offs = hx.shingle_hashes(col, span, seed=17)
        v2, _ = hx.shingle_hashes(col, span, seed=9176)
        doc_of = np.repeat(np.arange(len(t2)), np.diff(offs))
        # per-doc distinct (h1, h2) — mirrors the oracle's DISTINCT gram
        order = np.lexsort((v2, v1, doc_of))
        d, a, b = doc_of[order], v1[order], v2[order]
        first = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            first[1:] = ((d[1:] != d[:-1]) | (a[1:] != a[:-1])
                         | (b[1:] != b[:-1]))
        a, b, d = a[first], b[first], d[first]
        part = (a % np.uint64(num_parts)).astype(np.int32)
        return pa.table({
            # int64 bit-cast: uint64 must not cross Ray shuffles/aggregates
            "h1": pa.array(a.view(np.int64)),
            "h2": pa.array(b.view(np.int64)),
            "doc_id": pa.array(ids[d]),
            "part": pa.array(part),
        })

    rows = docs.map_batches(gram_rows, batch_format="pyarrow")

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "dropped": pa.array([], pa.int64())})
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        h1s, h2s, idss = h1[order], h2[order], ids[order]
        change = np.flatnonzero((h1s[1:] != h1s[:-1])
                                | (h2s[1:] != h2s[:-1])) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(h1s)])))
        seg_of_pair, li, lj, dropped = pr._triangular_pairs(sizes, max_bucket)
        base = starts[seg_of_pair]
        x, y = idss[base + li], idss[base + lj]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        # partial per-pair counts within this partition (one row per
        # distinct shared gram -> run-length count after a pair sort)
        o = np.lexsort((hi, lo))
        lo_s, hi_s = lo[o], hi[o]
        f = np.ones(len(o), dtype=bool)
        if len(o) > 1:
            f[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        st = np.flatnonzero(f)
        cnt = np.diff(np.concatenate((st, [len(o)])))
        return pa.table({
            "a_id": pa.array(lo_s[st]),
            "b_id": pa.array(hi_s[st]),
            "n": pa.array(cnt.astype(np.int64)),
            "dropped": pa.array(np.full(len(st), dropped, np.int64)),
        })

    cand = rows.groupby("part").map_groups(expand, batch_format="pyarrow")

    from ray.data.aggregate import Max, Sum

    # ``dropped`` (pairs lost to the hot-bucket cap) rides along so the
    # truncation is visible in the OUTPUT, not just the docstring; 0 at
    # test scale, so the oracle carries a literal 0.
    agg = cand.groupby(["a_id", "b_id"]).aggregate(
        Sum("n", alias_name="n_shared_grams"),
        Max("dropped", alias_name="dropped"))
    return agg.select_columns(["a_id", "b_id", "n_shared_grams", "dropped"]) \
        .sort(["a_id", "b_id"])


def shared_span_pairs_sql(span: int = SPAN_CHARS) -> str:
    return f"""
        WITH d AS (SELECT doc_id, text FROM documents
                   WHERE text IS NOT NULL AND length(text) >= {span}),
        pos AS (SELECT doc_id, text,
                       UNNEST(range(1, length(text) - {span} + 2)) AS i
                FROM d),
        g AS (SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INT), {span}) AS gram
              FROM pos)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               COUNT(*) AS n_shared_grams,
               CAST(0 AS BIGINT) AS dropped
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Incremental (delta) dedup — ingest a new batch against an existing corpus
# snapshot.  The daily-ingestion shape every 100 TB training pipeline runs:
# the snapshot's key set is itself TB-scale, so the anti-join is a
# hash-partition SHUFFLE where each partition sees both sides' keys — the
# snapshot is never broadcast and never driver-materialized.
# Capability class in the reference: the route-reunite negative filters
# (/root/reference/R/deduplicaters.R:56-64), lifted to two-table streaming.
# ---------------------------------------------------------------------------

DELTA_SNAPSHOT_MOD = 5   # doc_id % MOD == 0 -> the "already ingested" side


def q_delta_dedup(sf_dir: str, mod: int = DELTA_SNAPSHOT_MOD,
                  num_parts: int | None = None):
    """New docs that survive ingestion against a corpus snapshot:
    drop any incoming doc whose text already exists in the snapshot
    (exact, 128-bit key), dedup the incoming batch itself (keep min
    doc_id), and report ``n_dup_incoming`` — how many incoming rows
    collapsed into each survivor."""
    num_parts = num_parts or _auto_shuffle_parts()
    docs = _docs(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t2["doc_id"].to_numpy()
        h1 = hx.hash_strings(col, seed=3)
        h2 = hx.hash_strings(col, seed=77)
        part = (h1 % np.uint64(num_parts)).astype(np.int32)
        return pa.table({
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "doc_id": pa.array(ids),
            "is_snap": pa.array(ids % mod == 0),
            "part": pa.array(part),
        })

    rows = docs.map_batches(keyed, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup_incoming": pa.array([], pa.int64())})
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        snap = g["is_snap"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s = h1[order], h2[order]
        idss, snaps = ids[order], snap[order]
        change = np.flatnonzero((h1s[1:] != h1s[:-1])
                                | (h2s[1:] != h2s[:-1])) + 1
        starts = np.concatenate(([0], change))
        n_seg = len(starts)
        seg_of = np.repeat(np.arange(n_seg),
                           np.diff(np.concatenate((starts, [len(h1s)]))))
        has_snap = np.zeros(n_seg, dtype=bool)
        np.logical_or.at(has_snap, seg_of, snaps)
        inc = ~snaps
        n_inc = np.zeros(n_seg, dtype=np.int64)
        np.add.at(n_inc, seg_of, inc.astype(np.int64))
        min_inc = np.full(n_seg, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(min_inc, seg_of[inc], idss[inc])
        keep = (~has_snap) & (n_inc > 0)
        return pa.table({
            "doc_id": pa.array(min_inc[keep]),
            "n_dup_incoming": pa.array(n_inc[keep]),
        })

    out = rows.groupby("part").map_groups(resolve, batch_format="pyarrow")
    return out.sort("doc_id")


def delta_dedup_sql(mod: int = DELTA_SNAPSHOT_MOD) -> str:
    return f"""
        WITH snap AS (SELECT DISTINCT text FROM documents
                      WHERE doc_id % {mod} = 0 AND text IS NOT NULL),
        inc AS (SELECT doc_id, text FROM documents
                WHERE doc_id % {mod} <> 0 AND text IS NOT NULL)
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dup_incoming
        FROM inc
        WHERE text NOT IN (SELECT text FROM snap)
        GROUP BY text
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Incremental NEAR-dup delta — the LSH counterpart of q_delta_dedup.
# q_delta_dedup refreshes a corpus against exact duplicates; real corpus
# refreshes also need the near-dup pass, and recomputing the full pairset
# per refresh is the thing that does NOT scale: at 100 TB the snapshot side
# dominates and its old<->old pairs are already known.  This operator emits
# ONLY pairs touching an incoming doc: band buckets containing no incoming
# member are dropped BEFORE pair expansion (the snapshot never pairs with
# itself), and mixed-bucket expansion filters old<->old pairs out.  Work is
# bounded by buckets the incoming batch touches — independent of snapshot
# pair volume.  Same shingle/band config + exact-Jaccard verify as
# q_minhash_near_dup, so precision is exact and the DuckDB oracle is the
# same brute-force Jaccard join restricted to pairs with an incoming side.
# ---------------------------------------------------------------------------

NEARDUP_DELTA_MOD = 4    # doc_id % MOD == 0 -> the small INCOMING batch
                         # (the other 3/4 are the already-ingested snapshot)


def build_band_index(sf_dir: str, out_dir: str,
                     mod: int = NEARDUP_DELTA_MOD,
                     cfg: DedupConfig = DOCS_CFG) -> int:
    """Persist the snapshot side's LSH band rows (bucket_key, doc_id) as
    partitioned parquet — the signature index a 100 TB corpus builds ONCE.
    Each later ``q_near_dup_delta(band_index_dir=...)`` refresh then
    re-shingles/minhashes only the incoming batch and streams the snapshot
    bands back from this index: per-refresh feature cost scales with the
    delta, not the corpus.  Returns the band-row count."""
    from who_owns_mass_processing_ray.stages import pool_bounds

    snap = _docs(sf_dir).map_batches(
        lambda t: t.filter(pa.array(t["doc_id"].to_numpy() % mod != 0)),
        batch_format="pyarrow")
    bands = snap.map_batches(_DocMinHashBands, fn_constructor_args=(cfg,),
                             batch_format="pyarrow",
                             batch_size=cfg.batch_size,
                             concurrency=pool_bounds(8)).materialize()
    bands.write_parquet(out_dir)
    return bands.count()


def q_near_dup_delta(sf_dir: str, mod: int = NEARDUP_DELTA_MOD,
                     cfg: DedupConfig = DOCS_CFG,
                     band_index_dir: str | None = None):
    """Near-dup pairs (char-5-gram Jaccard >= cfg.jaccard_thresh) between an
    incoming batch (doc_id % mod == 0) and the full corpus, old<->old pairs
    never generated.  Output: (left_id, right_id, jaccard, link_type) with
    link_type 'new_new' | 'new_old'.

    With ``band_index_dir`` (from ``build_band_index``) the snapshot's
    signatures are READ, not recomputed — the incremental-refresh form
    (pair set identical either way, tested)."""
    from ray.data.aggregate import Max

    from who_owns_mass_processing_ray.io_utils import read_parquet_clean
    from who_owns_mass_processing_ray.stages import pairs as pr
    from who_owns_mass_processing_ray.stages import pool_bounds

    ds = _docs(sf_dir)

    def side(want_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            m = (ids % mod == 0) if want_new else (ids % mod != 0)
            return t.filter(pa.array(m))
        return f

    def tag(flag: bool):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_new", pa.array(np.full(t.num_rows, flag)))
        return f

    if band_index_dir is not None:
        # incremental refresh: ONE actor pool (incoming only), snapshot
        # bands stream back from the persisted index
        inc_bands = ds.map_batches(side(True), batch_format="pyarrow") \
            .map_batches(_DocMinHashBands, fn_constructor_args=(cfg,),
                         batch_format="pyarrow", batch_size=cfg.batch_size,
                         concurrency=pool_bounds(8))
        snap_bands = read_parquet_clean(band_index_dir)
        band_rows = inc_bands.map_batches(tag(True), batch_format="pyarrow") \
            .union(snap_bands.map_batches(tag(False),
                                          batch_format="pyarrow"))
    else:
        # recompute form: one pool over the whole corpus (two concurrent
        # pools would claim every CPU of a small session — the wedge
        # pool_bounds exists to prevent), is_new derived from the id
        def mark(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            return t.append_column("is_new", pa.array(ids % mod == 0))

        band_rows = ds.map_batches(_DocMinHashBands,
                                   fn_constructor_args=(cfg,),
                                   batch_format="pyarrow",
                                   batch_size=cfg.batch_size,
                                   concurrency=pool_bounds(8)) \
            .map_batches(mark, batch_format="pyarrow")

    num_parts = cfg.num_parts or 16

    def add_part(t: pa.Table) -> pa.Table:
        key = t["bucket_key"].to_numpy()
        part = (key % np.uint64(num_parts)).astype(np.int32)
        return pa.table({
            "bucket_key": t["bucket_key"],
            "doc_id": t["doc_id"],
            "is_new": t["is_new"],
            "part": pa.array(part),
        })

    def expand_delta(group: pa.Table) -> pa.Table:
        """Drop snapshot-only buckets, expand the rest, filter old<->old."""
        group = group.drop_columns(["part"])
        if group.num_rows:
            tbl = group.sort_by([("bucket_key", "ascending")])
            keys = tbl["bucket_key"].to_numpy()
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            sizes = np.diff(np.concatenate((starts, [len(keys)])))
            seg_of = np.repeat(np.arange(len(starts)), sizes)
            new = tbl["is_new"].to_numpy(zero_copy_only=False)
            has_new = np.zeros(len(starts), dtype=bool)
            np.logical_or.at(has_new, seg_of, new)
            group = tbl.filter(pa.array(has_new[seg_of]))
        pairs = pr.expand_partition_pairs(group, "bucket_key", "doc_id",
                                          cfg.max_bucket,
                                          payload_cols=["is_new"])
        keep = pc.or_(pairs["left_is_new"], pairs["right_is_new"])
        return pairs.filter(keep).select(["left_id", "right_id", "dropped"])

    cand = band_rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(expand_delta, batch_format="pyarrow")
    cand = pr.attach_pair_features(cand, ds, "text", side_key="doc_id")
    out = cand.map_batches(_verify_jaccard_int, fn_kwargs={"cfg": cfg},
                           batch_format="pyarrow",
                           batch_size=cfg.verify_batch_size)
    out = out.groupby(["left_id", "right_id"]).aggregate(
        Max("jaccard", alias_name="jaccard"))

    def label(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        both = (l % mod == 0) & (r % mod == 0)
        return t.append_column("link_type", pa.array(
            np.where(both, "new_new", "new_old")))

    return out.map_batches(label, batch_format="pyarrow") \
        .sort(["left_id", "right_id"])


SPLIT_BUCKETS = 20       # 18/1/1 -> 90% train, 5% val, 5% test
SPLIT_KNUTH = 2654435761  # Knuth multiplicative hash (2^32 / phi)


def q_leakage_safe_split(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """Dedup-aware train/val/test assignment: every member of a near-dup
    group lands in the SAME split (otherwise eval examples leak into
    training as near-copies — the standard contamination failure that
    motivates dedup-before-split).  Group = connected components over the
    exact-Jaccard pair graph (q_near_dup_groups, which has its own
    recursive-CTE oracle); split = Knuth multiplicative hash of the group
    root id into 20 buckets (18 train / 1 val / 1 test), so the assignment
    is a pure function of content relations — stable under re-sharding,
    re-ordering, and incremental corpus growth for untouched groups.
    Scale shape: the groups side is only multi-doc dup members (small),
    attached to the full corpus via the adaptive broadcast/shuffle join;
    the corpus itself streams."""
    from who_owns_mass_processing_ray.stages import joins

    docs = _docs(sf_dir, columns=("doc_id",))
    groups = q_near_dup_groups(sf_dir, cfg)
    out = joins.attach_columns(docs, groups, "doc_id", "doc_id",
                               {"group_id": "group_id"}, None, how="left")

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        gcol = t["group_id"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        grp = pc.coalesce(pc.cast(gcol, pa.int64()),
                          pa.array(ids, pa.int64())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        b = (grp.astype(np.uint64) * np.uint64(SPLIT_KNUTH)
             % np.uint64(2 ** 32)) % np.uint64(SPLIT_BUCKETS)
        split = np.full(len(ids), "train", dtype=object)
        split[b == SPLIT_BUCKETS - 2] = "val"
        split[b == SPLIT_BUCKETS - 1] = "test"
        return pa.table({
            "doc_id": pa.array(ids),
            "group_id": pa.array(grp),
            "split": pa.array(split, pa.string()),
        })

    return out.map_batches(assign, batch_format="pyarrow").sort("doc_id")


def leakage_safe_split_sql(pairs_sql: str) -> str:
    """``pairs_sql`` is the exact-Jaccard pair oracle (left_id, right_id,
    no ORDER BY); group = min reachable id via the recursive CTE (the
    near_dup_groups oracle form), singletons fall back to their own
    doc_id."""
    return f"""
        WITH RECURSIVE base AS ({pairs_sql}),
        sym(a, b) AS (
            SELECT left_id, right_id FROM base
            UNION ALL
            SELECT right_id, left_id FROM base
        ),
        reach(id, r) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        ),
        grp AS (SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id)
        SELECT d.doc_id,
               COALESCE(g.group_id, d.doc_id) AS group_id,
               CASE ((COALESCE(g.group_id, d.doc_id) * {SPLIT_KNUTH})
                     % 4294967296) % {SPLIT_BUCKETS}
                    WHEN {SPLIT_BUCKETS - 2} THEN 'val'
                    WHEN {SPLIT_BUCKETS - 1} THEN 'test'
                    ELSE 'train' END AS split
        FROM documents d LEFT JOIN grp g ON g.doc_id = d.doc_id
        ORDER BY d.doc_id
    """


def near_dup_delta_sql(mod: int = NEARDUP_DELTA_MOD) -> str:
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
                FROM documents)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          WHERE a.doc_id % {mod} = 0 OR b.doc_id % {mod} = 0
          GROUP BY 1, 2
        )
        SELECT i.left_id, i.right_id,
               round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard,
               CASE WHEN i.left_id % {mod} = 0 AND i.right_id % {mod} = 0
                    THEN 'new_new' ELSE 'new_old' END AS link_type
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.left_id
        JOIN sz sb ON sb.doc_id = i.right_id
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.7
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# End-to-end curation funnel — the Dolma/RedPajama-style composition the
# individual operators exist FOR: quality gate -> exact dedup -> near-dup
# keep-best -> benchmark decontamination, each stage feeding the next, with
# a per-stage attrition report (docs + tokens surviving).  Every stage
# reuses the engine's oracle-proven machinery (quality predicates, the
# delta-dedup hash-partition keep-min, minhash_pairs_ds/_groups_from_pairs,
# the near_dup_keep_best retention rule, the Decontaminate broadcast gram
# set), and the WHOLE chain has one DuckDB oracle — so the composition is
# hash-checked end to end, not just its pieces.
# ---------------------------------------------------------------------------

FUNNEL_MIN_TOKENS = 5
FUNNEL_MAX_AVG_WORD = 12.0


def q_curation_funnel(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """-> (stage_idx, stage, n_docs, n_tokens): corpus attrition through
    input -> quality -> exact_dedup -> near_dup -> decontaminate.  The
    benchmark split (doc_id % 97 == 0) is held out of the funnel input and
    supplies the decontamination grams, as in q_decontaminate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import joins, pool_bounds

    # ---- stage 0: input (non-null text, bench split held out) ----------
    def prep(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        keep = pc.and_(pc.is_valid(txt),
                       pa.array(t["doc_id"].to_numpy() % DECON_BENCH_MOD
                                != 0))
        t = t.filter(keep)
        txt = t["text"]
        n_tok = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(txt), r"\s+")).cast(pa.int64())
        n_nsp = pc.utf8_length(pc.replace_substring_regex(
            txt, r"\s", "")).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "n_chars": t["n_chars"], "n_tokens": n_tok,
                         "n_nonspace": n_nsp})

    base = _docs(sf_dir, columns=("doc_id", "text", "n_chars")) \
        .map_batches(prep, batch_format="pyarrow").materialize()

    # ---- stage 1: quality gate -----------------------------------------
    def quality(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(t["n_tokens"], FUNNEL_MIN_TOKENS),
            pc.less_equal(
                pc.divide(pc.cast(t["n_nonspace"], pa.float64()),
                          pc.cast(pc.max_element_wise(
                              t["n_tokens"], 1), pa.float64())),
                FUNNEL_MAX_AVG_WORD))
        return t.filter(ok)

    q1 = base.map_batches(quality, batch_format="pyarrow").materialize()

    # ---- stage 2: exact dedup (keep min doc_id per text) ---------------
    num_parts = cfg.num_parts or 16

    def keyed(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1 = hx.hash_strings(col, seed=3)
        h2 = hx.hash_strings(col, seed=77)       # 128-bit: no collision drift
        part = (h1 % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("h1", pa.array(h1.view(np.int64))) \
                .append_column("h2", pa.array(h2.view(np.int64))) \
                .append_column("part", pa.array(part))

    def keep_min(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        first = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            first[1:] = (h1[order][1:] != h1[order][:-1]) | \
                        (h2[order][1:] != h2[order][:-1])
        return g.take(pa.array(order[first])).drop_columns(["h1", "h2"])

    q2 = q1.map_batches(keyed, batch_format="pyarrow") \
        .groupby("part").map_groups(keep_min, batch_format="pyarrow") \
        .materialize()

    # ---- stage 3: near-dup keep-best (longest, tiebreak min id) --------
    groups = near_dup_groups_ds(q2, cfg)
    with_grp = joins.attach_columns(q2, groups, "doc_id", "doc_id",
                                    {"group_id": "group_id"}, num_parts,
                                    how="left")

    def grp_part(t: pa.Table) -> pa.Table:
        gcol = t["group_id"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        grp = pc.coalesce(pc.cast(gcol, pa.int64()),
                          t["doc_id"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        part = (grp.astype(np.uint64) % np.uint64(num_parts)) \
            .astype(np.int32)
        t = t.drop_columns(["group_id"])
        return t.append_column("grp", pa.array(grp)) \
                .append_column("part", pa.array(part))

    def keep_best(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        grp = g["grp"].to_numpy()
        nch = g["n_chars"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, -nch, grp))
        first = np.ones(len(order), dtype=bool)
        gs = grp[order]
        if len(order) > 1:
            first[1:] = gs[1:] != gs[:-1]
        return g.take(pa.array(order[first])).drop_columns(["grp"])

    q3 = with_grp.map_batches(grp_part, batch_format="pyarrow") \
        .groupby("part").map_groups(keep_best, batch_format="pyarrow") \
        .materialize()

    # ---- stage 4: decontamination (shared word-5-gram with bench) ------
    def emit_bench(t: pa.Table) -> pa.Table:
        bench = t.filter(pa.array(
            t["doc_id"].to_numpy() % DECON_BENCH_MOD == 0))
        _, grams = _word_grams(bench, DECON_GRAM_WORDS)
        gh = hx.hash_strings(pc.unique(grams), seed=DECON_HASH_SEED)
        return pa.table({"gh": pa.array(np.unique(gh).view(np.int64))})

    gram_tables = [t for t in ray.get(
        _docs(sf_dir).map_batches(emit_bench, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    gh_all = np.unique(np.concatenate(
        [t["gh"].to_numpy() for t in gram_tables])) if gram_tables \
        else np.empty(0, np.int64)
    grams_ref = ray.put(pa.array(gh_all, pa.int64()))

    def drop_contaminated(t: pa.Table) -> pa.Table:
        doc_idx, grams = _word_grams(t, DECON_GRAM_WORDS)
        hit_doc = np.zeros(len(t), dtype=bool)
        if len(grams):
            gh = hx.hash_strings(grams, seed=DECON_HASH_SEED) \
                .view(np.int64)
            hit = pc.is_in(pa.array(gh), value_set=ray.get(grams_ref)) \
                .to_numpy(zero_copy_only=False)
            np.logical_or.at(hit_doc, doc_idx[hit], True)
        return t.filter(pa.array(~hit_doc))

    q4 = q3.map_batches(drop_contaminated, batch_format="pyarrow",
                        batch_size=1024).materialize()

    # ---- attrition report ----------------------------------------------
    rows = []
    for idx, (name, ds) in enumerate(
            [("input", base), ("quality", q1), ("exact_dedup", q2),
             ("near_dup", q3), ("decontaminate", q4)]):
        agg = ds.aggregate(Sum("n_tokens", alias_name="s"))
        rows.append((idx, name, ds.count(), int(agg["s"] or 0)))
    return rd.from_arrow(pa.table({
        "stage_idx": pa.array([r[0] for r in rows], pa.int64()),
        "stage": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
    }))


def curation_funnel_sql() -> str:
    return f"""
        WITH RECURSIVE d0 AS (
          SELECT doc_id, text, n_chars,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                 length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
          FROM documents
          WHERE text IS NOT NULL AND doc_id % {DECON_BENCH_MOD} <> 0
        ),
        q1 AS (
          SELECT * FROM d0
          WHERE n_tokens >= {FUNNEL_MIN_TOKENS}
            AND n_nonspace * 1.0 / greatest(n_tokens, 1)
                <= {FUNNEL_MAX_AVG_WORD}
        ),
        e AS (SELECT *, min(doc_id) OVER (PARTITION BY text) AS keeper
              FROM q1),
        q2 AS (SELECT doc_id, text, n_chars, n_tokens FROM e
               WHERE doc_id = keeper),
        g2 AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
                FROM q2)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g2 GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS c
          FROM g2 a JOIN g2 b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        bp AS (
          SELECT i.left_id, i.right_id FROM inter i
          JOIN sz sa ON sa.doc_id = i.left_id
          JOIN sz sb ON sb.doc_id = i.right_id
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.7
        ),
        sym(a, b) AS (
          SELECT left_id, right_id FROM bp
          UNION ALL SELECT right_id, left_id FROM bp
        ),
        reach(id, r) AS (
          SELECT a, a FROM sym
          UNION
          SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        ),
        grp AS (SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id),
        q2g AS (
          SELECT q2.*, COALESCE(g.group_id, q2.doc_id) AS grp_id
          FROM q2 LEFT JOIN grp g ON g.doc_id = q2.doc_id
        ),
        sel AS (
          SELECT *, row_number() OVER (PARTITION BY grp_id
                      ORDER BY n_chars DESC, doc_id) AS rn
          FROM q2g
        ),
        q3 AS (SELECT doc_id, text, n_tokens FROM sel WHERE rn = 1),
        tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        gw AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(w) - 4, 0) + 1),
                   i -> array_to_string(list_slice(w, i, i + 4), ' ')
                 )) AS gram
          FROM tok
        ),
        bg AS (SELECT DISTINCT gram FROM gw
               WHERE doc_id % {DECON_BENCH_MOD} = 0),
        hits AS (SELECT DISTINCT gw.doc_id FROM gw JOIN bg USING (gram)
                 WHERE gw.doc_id % {DECON_BENCH_MOD} <> 0),
        q4 AS (SELECT * FROM q3
               WHERE doc_id NOT IN (SELECT doc_id FROM hits))
        SELECT * FROM (
          SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage,
                 count(*) AS n_docs,
                 CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens
          FROM d0
          UNION ALL SELECT 1, 'quality', count(*),
                 CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q1
          UNION ALL SELECT 2, 'exact_dedup', count(*),
                 CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q2
          UNION ALL SELECT 3, 'near_dup', count(*),
                 CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q3
          UNION ALL SELECT 4, 'decontaminate', count(*),
                 CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q4
        ) ORDER BY stage_idx
    """


# ---------------------------------------------------------------------------
# Per-source length winsorize — the grouped generalization of the
# reference's 0.95-quantile unit-count gate (/root/reference/R/loaders.R:1153):
# each corpus source has its own length distribution, so curation trims
# per-source tails, not global ones.  Thresholds come from
# functions/quantile.exact_group_quantiles — per-group exact quantile_cont
# via SHARED streaming histogram passes (one scan per level serves every
# (group, q) slot; the column is never sorted or driver-pulled); the trim
# itself is one broadcast-threshold filter pass.
# ---------------------------------------------------------------------------

TRIM_Q_LO = 0.05
TRIM_Q_HI = 0.95


def q_group_quantile_trim(sf_dir: str, q_lo: float = TRIM_Q_LO,
                          q_hi: float = TRIM_Q_HI):
    """Docs whose n_chars lies within [quantile(q_lo), quantile(q_hi)] of
    their OWN source group."""
    from who_owns_mass_processing_ray.functions.quantile import (
        exact_group_quantiles,
    )

    ds = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))
    th = exact_group_quantiles(ds, "source", "n_chars", [q_lo, q_hi])
    groups = sorted(th)
    src_arr = pa.array(groups, pa.string())
    lo_arr = np.array([th[g][q_lo] for g in groups], np.float64)
    hi_arr = np.array([th[g][q_hi] for g in groups], np.float64)

    def trim(t: pa.Table) -> pa.Table:
        pos_a = pc.index_in(t["source"], value_set=src_arr)
        pos = pc.fill_null(pos_a, -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = t["n_chars"].to_numpy().astype(np.float64)
        ok = pos >= 0          # index_in miss (unseen source) -> drop
        pos_f = np.where(ok, pos, 0)
        keep = ok & (x >= lo_arr[pos_f]) & (x <= hi_arr[pos_f])
        return t.filter(pa.array(keep)).select(
            ["doc_id", "source", "n_chars"])

    return ds.map_batches(trim, batch_format="pyarrow").sort("doc_id")


def group_quantile_trim_sql(q_lo: float = TRIM_Q_LO,
                            q_hi: float = TRIM_Q_HI) -> str:
    return f"""
        WITH t AS (SELECT source,
                          quantile_cont(n_chars, {q_lo}) AS lo,
                          quantile_cont(n_chars, {q_hi}) AS hi
                   FROM documents GROUP BY source)
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN t USING (source)
        WHERE d.n_chars >= t.lo AND d.n_chars <= t.hi
        ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# Unigram language-model quality scoring — the model-scored curation filter
# class (a corpus-trained probability model scores every document; low
# average log-probability flags boilerplate/garbled text, high rare-token
# mass flags OCR noise).  The "model" is the corpus's own unigram
# distribution with Laplace smoothing — trained with one partial-aggregate
# shuffle, attached back with the adaptive broadcast join, so the whole
# operator is two narrow shuffles regardless of corpus size.
# ---------------------------------------------------------------------------

_LM_PARTS = 32


def q_ngram_logprob(sf_dir: str):
    """Per non-empty doc: token count, mean token log2-probability under the
    corpus unigram model (Laplace +1 smoothing), and the fraction of tokens
    whose corpus count is 1 (hapax mass).

    -> (doc_id, n_tokens, avg_logprob, rare_frac), sorted by doc_id."""
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import joins

    docs = _docs(sf_dir)
    tf_rows = docs.map_batches(_term_tf, batch_format="pyarrow")
    cg = tf_rows.groupby("term").aggregate(Sum("tf", alias_name="c"))
    # model size: total token count T and vocab size V — two scalar reduces
    # over the (already tiny) count table
    totals = cg.map_batches(
        lambda t: pa.table({"t": pa.array([int(t["c"].to_numpy().sum())
                                           if t.num_rows else 0], pa.int64()),
                            "v": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow")
    import ray

    tot_tbl = pa.concat_tables(
        [x for x in ray.get(totals.to_arrow_refs()) if x.num_rows])
    T = int(tot_tbl["t"].to_numpy().sum())
    V = int(tot_tbl["v"].to_numpy().sum())

    with_c = joins.attach_columns(tf_rows, cg, "term", "term", {"c": "c"},
                                  _LM_PARTS, how="inner")

    _SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("avg_logprob", pa.float64()), ("rare_frac", pa.float64()),
    ])

    def score_part(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy().astype(np.float64)
        c = t["c"].to_numpy().astype(np.float64)
        lp = tf * np.log2((c + 1.0) / float(T + V))
        rare = np.where(c == 1.0, tf, 0.0)
        part = (t["doc_id"].to_numpy() % _LM_PARTS).astype(np.int32)
        return pa.table({"doc_id": t["doc_id"], "tf": t["tf"],
                         "lp": pa.array(lp), "rare": pa.array(rare),
                         "part": pa.array(part)})

    def per_doc(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SCHEMA.empty_table()
        g = g.sort_by([("doc_id", "ascending")])
        ids = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        tf = g["tf"].to_numpy().astype(np.float64)
        n_tok = np.add.reduceat(tf, starts)
        lp = np.add.reduceat(g["lp"].to_numpy(), starts)
        rare = np.add.reduceat(g["rare"].to_numpy(), starts)
        return pa.table({
            "doc_id": pa.array(ids[starts]),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "avg_logprob": pa.array(round_half_away(lp / n_tok, 3)),
            "rare_frac": pa.array(round_half_away(rare / n_tok, 4)),
        }, schema=_SCHEMA)

    out = with_c.map_batches(score_part, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: per_doc(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.sort("doc_id")


def ngram_logprob_sql() -> str:
    return """
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        t AS (SELECT doc_id, unnest(w) AS term FROM tok),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        cg AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
        tot AS (SELECT sum(c) AS t, count(*) AS v FROM cg)
        SELECT tf.doc_id,
               CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               round(sum(tf.tf * log2((cg.c + 1) / CAST(tot.t + tot.v AS DOUBLE)))
                     / sum(tf.tf), 3) AS avg_logprob,
               round(sum(CASE WHEN cg.c = 1 THEN tf.tf ELSE 0 END)
                     / CAST(sum(tf.tf) AS DOUBLE), 4) AS rare_frac
        FROM tf JOIN cg USING (term) CROSS JOIN tot
        GROUP BY tf.doc_id
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# phi-heavy-hitter n-grams via a Count-Min Sketch (Cormode & Muthukrishnan
# 2005) — the fixed-memory sketch path for "which grams exceed phi of the
# corpus" when the distinct-gram table itself is too large to groupby at
# 100 TB.  SOUND and EXACT by construction:
#   pass A: one streaming pass builds the global sketch (d x w counters,
#           512 KB) via per-batch partials + a bounded two-level sum — the
#           driver only ever sees <= 8 partial sketches, never the corpus;
#   pass B: one more streaming pass re-reads the grams and keeps those whose
#           sketch ESTIMATE clears the phi threshold — CMS never
#           underestimates, so this candidate set is a SUPERSET of the true
#           heavy hitters (no silent misses, unlike local-top-k candidate
#           schemes); per-batch exact counts of the candidates are emitted
#           and groupby-summed, so emitted counts are EXACT;
#   filter: exact count >= ceil(phi * T) in integer arithmetic (no float
#           boundary), so the output matches a plain SQL GROUP BY oracle.
# ---------------------------------------------------------------------------

HH_PHI_DEN = 2000        # heavy hitter: count * DEN >= total bigram count
_CMS_D = 4
_CMS_W = 1 << 14


def _doc_bigrams(t: pa.Table) -> pa.Array:
    """All word bigrams ("tok tok") of every doc in the batch, flattened."""
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
    parent = pc.list_parent_indices(la).to_numpy()
    flat = la.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    parent = parent[keep_np]
    if len(flat) < 2:
        return pa.array([], pa.string())
    same = parent[1:] == parent[:-1]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    left = flat.slice(0, len(flat) - 1)
    right = flat.slice(1)
    grams = pc.binary_join_element_wise(left, right, " ")
    return grams.filter(pa.array(same))


def _cms_rows(grams: pa.Array) -> np.ndarray:
    """(d, w) uint64 sketch of the gram multiset."""
    sk = np.zeros((_CMS_D, _CMS_W), dtype=np.uint64)
    if len(grams) == 0:
        return sk
    enc = pc.dictionary_encode(grams)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    cnt = np.bincount(codes).astype(np.uint64)
    base = hx.hash_strings(enc.dictionary)
    for j in range(_CMS_D):
        idx = (hx.splitmix64(base ^ np.uint64(0xC0FFEE + j)) 
               % np.uint64(_CMS_W)).astype(np.int64)
        np.add.at(sk[j], idx, cnt)
    return sk


def _cms_estimate(sketch: np.ndarray, grams: pa.Array) -> np.ndarray:
    base = hx.hash_strings(grams)
    est = np.full(len(grams), np.iinfo(np.uint64).max, dtype=np.uint64)
    for j in range(_CMS_D):
        idx = (hx.splitmix64(base ^ np.uint64(0xC0FFEE + j))
               % np.uint64(_CMS_W)).astype(np.int64)
        est = np.minimum(est, sketch[j][idx])
    return est


def q_heavy_hitters(sf_dir: str):
    """Word bigrams whose corpus count clears the phi = 1/HH_PHI_DEN
    heavy-hitter threshold, with EXACT counts.

    -> (gram, count, rk), ordered by (count desc, gram asc)."""
    import ray
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import joins

    docs = _docs(sf_dir)

    # ---- pass A: global sketch + total gram count, bounded two-level sum
    def partial_sketch(t: pa.Table) -> pa.Table:
        g = _doc_bigrams(t)
        sk = _cms_rows(g)
        return pa.table({
            "sk": pa.array([sk.reshape(-1).view(np.int64)],
                           pa.list_(pa.int64())),
            "n": pa.array([len(g)], pa.int64()),
            "part": pa.array([0], pa.int32()),
        })

    def sum_sketches(g: pa.Table) -> pa.Table:
        col = g["sk"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy().reshape(len(g), -1)
        return pa.table({
            "sk": pa.array([mat.sum(axis=0, dtype=np.int64)],
                           pa.list_(pa.int64())),
            "n": pa.array([int(g["n"].to_numpy().sum())], pa.int64()),
        })

    partials = docs.map_batches(partial_sketch, batch_format="pyarrow")

    def level_part(t: pa.Table, k: int) -> pa.Table:
        part = (np.arange(len(t)) % k).astype(np.int32)
        return t.set_column(t.schema.get_field_index("part"), "part",
                            pa.array(part))

    level1 = partials.map_batches(
        lambda t: level_part(t, 8), batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: sum_sketches(g.drop_columns(["part"])),
            batch_format="pyarrow")
    rows = [r for r in ray.get(level1.to_arrow_refs()) if r.num_rows]
    tbl = pa.concat_tables(rows)
    sk_col = tbl["sk"].combine_chunks() if isinstance(tbl["sk"], pa.ChunkedArray) else tbl["sk"]
    sketch = sk_col.flatten().to_numpy().reshape(tbl.num_rows, _CMS_D, _CMS_W) \
        .sum(axis=0, dtype=np.int64).view(np.uint64)
    total = int(tbl["n"].to_numpy().sum())
    thresh = -(-total // HH_PHI_DEN)           # ceil(total / DEN)
    sketch_ref = ray.put(sketch)

    # ---- pass B: candidates (sketch superset) + per-batch exact counts
    def candidates(t: pa.Table) -> pa.Table:
        import ray as _ray

        g = _doc_bigrams(t)
        if len(g) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        sk = _ray.get(sketch_ref)
        est = _cms_estimate(sk, enc.dictionary)
        keep = est >= np.uint64(thresh)
        return pa.table({
            "gram": enc.dictionary.filter(pa.array(keep)),
            "cnt": pa.array(cnt[keep]),
        })

    exact = docs.map_batches(candidates, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("cnt", alias_name="count"))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply(t["count"].cast(pa.int64()),
                        pa.scalar(HH_PHI_DEN, pa.int64())),
            pa.scalar(total, pa.int64()))
        out = t.filter(keep)
        return pa.table({"gram": out["gram"],
                         "count": out["count"].cast(pa.int64())})

    out = exact.map_batches(finish, batch_format="pyarrow") \
        .sort(["count", "gram"], descending=[True, False])

    def add_rank(t: pa.Table) -> pa.Table:
        # single small table after the heavy-hitter filter
        return t.append_column(
            "rk", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)))

    return out.repartition(1).map_batches(add_rank, batch_format="pyarrow")


def heavy_hitters_sql() -> str:
    return f"""
        WITH tok AS (
          SELECT list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        gi AS (SELECT w, unnest(range(1, len(w))) AS i FROM tok),
        g AS (SELECT w[i] || ' ' || w[i + 1] AS gram FROM gi),
        c AS (SELECT gram, count(*) AS count FROM g GROUP BY gram),
        t AS (SELECT count(*) AS total FROM g)
        SELECT c.gram, c.count,
               CAST(row_number() OVER (ORDER BY c.count DESC, c.gram)
                    AS BIGINT) AS rk
        FROM c CROSS JOIN t
        WHERE c.count * {HH_PHI_DEN} >= t.total
        ORDER BY c.count DESC, c.gram
    """


# ---------------------------------------------------------------------------
# Distinct-token cardinality per source — exact path (the oracle baseline)
# + HyperLogLog scale path (Flajolet et al. 2007), the same
# exact-baseline / approximate-scale-path pairing as knn_brute / knn_ivf.
# Exact: per-batch distinct -> ONE hash-partition shuffle of the distinct
# (source, token-hash) pairs -> partition-local distinct counts -> tiny sum.
# HLL: fixed 4 KB of registers per source merged with elementwise max (an
# associative reduce — the shape that works when even the distinct pair
# stream is too large to shuffle).
# ---------------------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def q_distinct_tokens(sf_dir: str, num_parts: int | None = None):
    """-> (source, n_distinct_tokens) — EXACT, sorted by source.

    Tokens are hashed to 64-bit before the shuffle (8 B/row instead of the
    string; at 2^63 distinct tokens the birthday collision odds are still
    negligible for a cardinality count) and deduped per batch so only the
    batch-distinct pairs enter the shuffle."""
    num_parts = num_parts or _auto_shuffle_parts()
    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def pairs(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
        parent = pc.list_parent_indices(la).to_numpy()
        flat = la.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_row = src.take(pa.array(parent))
        h = hx.hash_strings(flat)
        senc = pc.dictionary_encode(src_row)
        if isinstance(senc, pa.ChunkedArray):
            senc = senc.combine_chunks()
        scode = senc.indices.to_numpy().astype(np.int64)
        # batch-local distinct (source, hash)
        key = np.stack((scode, h.view(np.int64)), axis=1)
        uniq = np.unique(key, axis=0)
        part = (uniq[:, 1].view(np.uint64) % np.uint64(num_parts)) \
            .astype(np.int32)
        return pa.table({
            "source": senc.dictionary.take(pa.array(uniq[:, 0])),
            "h": pa.array(uniq[:, 1]),
            "part": pa.array(part),
        })

    def count_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        src = g["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        scode = enc.indices.to_numpy().astype(np.int64)
        key = np.stack((scode, g["h"].to_numpy()), axis=1)
        uniq = np.unique(key, axis=0)
        n = np.bincount(uniq[:, 0], minlength=len(enc.dictionary))
        return pa.table({"source": enc.dictionary,
                         "n": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    out = docs.map_batches(pairs, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: count_part(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n_distinct_tokens"))
    return out.sort("source")


def distinct_tokens_sql() -> str:
    return """
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
          FROM documents WHERE text IS NOT NULL
        )
        SELECT source, count(DISTINCT term) AS n_distinct_tokens
        FROM tok GROUP BY source ORDER BY source
    """


def _hll_ranks(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, rank) per the standard HLL split:
    top P bits pick the register, rank = leading zeros of the remaining
    64-P bits + 1.  Pure-integer bit_length (shift-fold + popcount) — float
    conversion is lossy past 2^53."""
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h << np.uint64(_HLL_P)
    nz = rest != 0
    lz = np.full(len(h), 64 - _HLL_P, dtype=np.int64)
    bl = np.zeros(len(h), dtype=np.int64)
    v = rest[nz].copy()
    for s in (32, 16, 8, 4, 2, 1):
        v |= v >> np.uint64(s)
    # v has all bits below the msb set; popcount(v) == bit_length
    pop = np.zeros(len(v), dtype=np.int64)
    x = v.copy()
    while x.any():
        pop += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    bl[nz] = pop
    lz[nz] = 64 - bl[nz]
    # rest is left-shifted by P, so its leading zeros ARE the remainder's
    # leading zeros; zero remainders keep lz = 64 - P
    return idx, (lz + 1).astype(np.int8)


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """(n, M) register matrix -> cardinality estimates (bias-corrected raw
    estimator + linear counting in the small-range regime)."""
    regs = regs.astype(np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    est = alpha * _HLL_M * _HLL_M / np.power(2.0, -regs).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = est < 2.5 * _HLL_M
    lc = np.where(zeros > 0,
                  _HLL_M * np.log(np.maximum(_HLL_M / np.maximum(zeros, 1),
                                             1.0)),
                  est)
    return np.where(small & (zeros > 0), lc, est)


def q_distinct_tokens_hll(sf_dir: str):
    """HyperLogLog estimate of the same cardinalities — the scale path when
    even the distinct (source, hash) pair stream is too large to shuffle:
    per-batch 4 KB register arrays per source, merged by elementwise MAX
    (associative) through a bounded two-level reduce, estimated with the
    standard bias correction + linear-counting small-range regime.

    -> (source, n_distinct_est).  Gated in tests at ±5% of the exact path
    on the corpus AND at 200k synthetic cardinality (the raw-estimator
    regime; theoretical RSE at p=12 is 1.04/sqrt(4096) ≈ 1.6%)."""
    import ray

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def partial_regs(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
        parent = pc.list_parent_indices(la).to_numpy()
        flat = la.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "regs": pa.array([], pa.list_(pa.int8()))})
        senc = pc.dictionary_encode(src.take(pa.array(parent)))
        if isinstance(senc, pa.ChunkedArray):
            senc = senc.combine_chunks()
        scode = senc.indices.to_numpy().astype(np.int64)
        idx, rank = _hll_ranks(hx.hash_strings(flat))
        n_src = len(senc.dictionary)
        regs = np.zeros((n_src, _HLL_M), dtype=np.int8)
        np.maximum.at(regs, (scode, idx), rank)
        return pa.table({
            "source": senc.dictionary,
            "regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1)), _HLL_M),
        })

    def merge_regs(g: pa.Table) -> pa.Table:
        src = g["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        scode = enc.indices.to_numpy().astype(np.int64)
        col = g["regs"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy().reshape(len(g), _HLL_M)
        out = np.zeros((len(enc.dictionary), _HLL_M), dtype=np.int8)
        np.maximum.at(out, scode, mat)
        return pa.table({
            "source": enc.dictionary,
            "regs": pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1)), _HLL_M),
        })

    merged = docs.map_batches(partial_regs, batch_format="pyarrow") \
        .groupby("source").map_groups(merge_regs, batch_format="pyarrow")
    rows = [t for t in ray.get(merged.to_arrow_refs()) if t.num_rows]
    if not rows:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "n_distinct_est": pa.array([], pa.int64())}))
    tbl = pa.concat_tables(rows)
    col = tbl["regs"].combine_chunks() if isinstance(tbl["regs"], pa.ChunkedArray) else tbl["regs"]
    est = _hll_estimate(col.flatten().to_numpy().reshape(tbl.num_rows, _HLL_M))
    import ray.data as rd

    out = pa.table({
        "source": tbl["source"],
        "n_distinct_est": pa.array(np.round(est).astype(np.int64)),
    })
    return rd.from_arrow(out.sort_by("source"))


# ---------------------------------------------------------------------------
# Per-source quota cap — "keep at most K documents per host/source", the
# standard web-corpus curation step that bounds any one domain's share of
# the training mix (the grouped-LIMIT generalization of the reference's
# per-group slice_min idiom, /root/reference/R/loaders.R:1075-1083).
# Classic combiner shape: each BATCH keeps its local top-k per source, so at
# most k x n_sources narrow rows per batch enter the one small shuffle; the
# corpus itself never moves.
# ---------------------------------------------------------------------------

GROUP_CAP_K = 40


def _topk_per_source(t: pa.Table, k: int) -> pa.Table:
    """Vectorized per-source top-k by (n_chars desc, doc_id asc): one
    lexsort + segment-rank pass, no Python loop over rows."""
    if t.num_rows == 0:
        return t
    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    enc = pc.dictionary_encode(src)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    n_chars = t["n_chars"].to_numpy()
    ids = t["doc_id"].to_numpy()
    order = np.lexsort((ids, -n_chars, codes))
    cs = codes[order]
    starts = np.concatenate(([0], np.flatnonzero(cs[1:] != cs[:-1]) + 1))
    rank = np.arange(len(cs)) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(cs)]))))
    keep_idx = order[rank < k]
    return t.take(pa.array(np.sort(keep_idx)))


def q_group_cap(sf_dir: str, k: int = GROUP_CAP_K):
    """-> (source, doc_id, n_chars): at most ``k`` docs per source, keeping
    the longest (ties broken by smaller doc_id).  Partial top-k per batch
    (correct because the global per-source top-k is a subset of the union
    of batch top-ks), then a tiny per-source final select over <= k x
    n_batches rows."""
    docs = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))

    out = docs.map_batches(lambda t: _topk_per_source(t, k),
                           batch_format="pyarrow") \
        .groupby("source").map_groups(lambda g: _topk_per_source(g, k),
                                      batch_format="pyarrow")
    return out.sort(["source", "doc_id"])


def group_cap_sql(k: int = GROUP_CAP_K) -> str:
    return f"""
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents)
        WHERE rn <= {k}
        ORDER BY source, doc_id
    """


# ---------------------------------------------------------------------------
# Bloom-prefilter delta dedup — the fixed-memory scale companion to
# ``q_delta_dedup``.  There the snapshot side SHUFFLES alongside the
# incoming rows; at 100 TB the snapshot is the whole historical corpus and
# dominates the exchange even though almost none of it matches.  Here the
# snapshot is summarized ONCE into a Bloom bitmap (fixed bytes regardless of
# corpus size, OR-merge is associative), the bitmap is broadcast, and only
# the Bloom-POSITIVE incoming groups — true dups plus an engineered ~1e-8
# false-positive sliver — get exact verification against a key-filtered
# snapshot scan.  Output and oracle are IDENTICAL to q_delta_dedup: the
# Bloom can only create false positives, and every positive is exactly
# verified, so no row is wrongly dropped or kept.
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 20     # 2^20 bits = 128 KB bitmap
BLOOM_K = 7              # hash probes per key
_BLOOM_MERGE_PARTS = 32  # two-level OR-merge fan-in bound


def _bloom_positions(h1: np.ndarray, h2: np.ndarray,
                     m_log2: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing pos_i = h1 + i*h2 (mod 2^m).
    Kirsch-Mitzenmacher: two independent 64-bit hashes generate all k
    probes with the standard FP guarantee."""
    i = np.arange(1, k + 1, dtype=np.uint64)
    mask = np.uint64((1 << m_log2) - 1)
    return (h1[:, None] + i[None, :] * h2[:, None]) & mask


def _bloom_words(pos: np.ndarray, m_log2: int) -> np.ndarray:
    """Set the given positions in a fresh 2^m-bit bitmap (uint64 words)."""
    words = np.zeros(1 << (m_log2 - 6), dtype=np.uint64)
    flat = pos.reshape(-1)
    np.bitwise_or.at(words, (flat >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (flat & np.uint64(63)))
    return words


def _bloom_probe(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-k-bits-set test per row against a bitmap."""
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    return (((w >> (pos & np.uint64(63))) & np.uint64(1)) == 1).all(axis=1)


def q_delta_dedup_bloom(sf_dir: str, mod: int = DELTA_SNAPSHOT_MOD,
                        num_parts: int | None = None,
                        m_log2: int = BLOOM_BITS_LOG2, k: int = BLOOM_K):
    """Same contract as ``q_delta_dedup`` — new docs surviving ingestion
    against a snapshot, with per-survivor incoming-duplicate counts — but
    the snapshot never shuffles:

    1. snapshot pass: per-batch local Bloom bitmaps (one fixed-size row
       each), OR-merged through a bounded two-level reduce, broadcast once;
    2. incoming pass: the usual per-partition incoming-side group resolve,
       plus one vectorized k-probe per group key;
    3. Bloom-negative groups are DEFINITELY absent from the snapshot and
       emit directly; the positive sliver is exactly verified against a
       snapshot scan filtered to the positive keys (broadcast, gated at
       the joins broadcast limit — if the sliver ever exceeds it the query
       falls back to the exact two-sided shuffle path).

    At 2^20 bits / 7 probes the sliver is ~(1-e^(-7n/2^20))^7 — under 1e-8
    per distinct incoming key for snapshots up to ~10^4 keys; size the
    bitmap as bits ≈ 10 x snapshot keys for ~1% at any scale."""
    num_parts = num_parts or _auto_shuffle_parts()
    import ray

    from who_owns_mass_processing_ray.stages.joins import BROADCAST_ROW_LIMIT

    docs = _docs(sf_dir)

    def keyed(t: pa.Table, want_snap: bool) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        ids = t2["doc_id"].to_numpy()
        sel = (ids % mod == 0) if want_snap else (ids % mod != 0)
        t2 = t2.filter(pa.array(sel))
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1 = hx.hash_strings(col, seed=3)
        h2 = hx.hash_strings(col, seed=77)
        return pa.table({
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "doc_id": pa.array(t2["doc_id"].to_numpy()),
        })

    # --- pass 1: snapshot -> Bloom bitmap (bounded two-level OR-merge) ----
    def snap_bitmap(t: pa.Table) -> pa.Table:
        kt = keyed(t, want_snap=True)
        h1 = kt["h1"].to_numpy().view(np.uint64)
        h2 = kt["h2"].to_numpy().view(np.uint64)
        words = _bloom_words(_bloom_positions(h1, h2, m_log2, k), m_log2)
        rg = int(h1[0] % _BLOOM_MERGE_PARTS) if len(h1) else 0
        return pa.table({
            "rg": pa.array([rg], pa.int32()),
            "words": pa.FixedSizeListArray.from_arrays(
                pa.array(words.view(np.int64)), len(words)),
        })

    def or_merge(g: pa.Table) -> pa.Table:
        col = g["words"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy().reshape(g.num_rows, -1) \
            .view(np.uint64)
        words = np.bitwise_or.reduce(mat, axis=0)
        return pa.table({
            "rg": pa.array([0], pa.int32()),
            "words": pa.FixedSizeListArray.from_arrays(
                pa.array(words.view(np.int64)), len(words)),
        })

    merged = docs.map_batches(snap_bitmap, batch_format="pyarrow") \
        .groupby("rg").map_groups(or_merge, batch_format="pyarrow")
    parts = [t for t in ray.get(merged.to_arrow_refs()) if t.num_rows]
    if parts:
        allw = pa.concat_tables(parts)
        col = allw["words"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bits = np.bitwise_or.reduce(
            col.flatten().to_numpy().reshape(allw.num_rows, -1)
            .view(np.uint64), axis=0)
    else:
        bits = np.zeros(1 << (m_log2 - 6), dtype=np.uint64)
    bits_ref = ray.put(bits)

    # --- pass 2: incoming resolve + Bloom probe ----------------------------
    def inc_keyed(t: pa.Table) -> pa.Table:
        kt = keyed(t, want_snap=False)
        h1 = kt["h1"].to_numpy().view(np.uint64)
        part = (h1 % np.uint64(num_parts)).astype(np.int32)
        return kt.append_column("part", pa.array(part))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_dup_incoming": pa.array([], pa.int64()),
                          "h1": pa.array([], pa.int64()),
                          "h2": pa.array([], pa.int64()),
                          "hit": pa.array([], pa.bool_())})
        if g.num_rows == 0:
            return empty
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        h1s, h2s, idss = h1[order], h2[order], ids[order]
        change = np.flatnonzero((h1s[1:] != h1s[:-1])
                                | (h2s[1:] != h2s[:-1])) + 1
        starts = np.concatenate(([0], change))
        n = np.diff(np.concatenate((starts, [len(h1s)])))
        gh1 = h1s[starts]
        gh2 = h2s[starts]
        min_id = idss[starts]  # lexsort put smallest id first per segment
        pos = _bloom_positions(gh1.view(np.uint64), gh2.view(np.uint64),
                               m_log2, k)
        hit = _bloom_probe(ray.get(bits_ref), pos)
        return pa.table({
            "doc_id": pa.array(min_id),
            "n_dup_incoming": pa.array(n.astype(np.int64)),
            "h1": pa.array(gh1),
            "h2": pa.array(gh2),
            "hit": pa.array(hit),
        })

    resolved = docs.map_batches(inc_keyed, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: resolve(g.drop_columns(["part"])),
            batch_format="pyarrow")
    resolved = resolved.materialize()

    # --- pass 3: exact-verify the Bloom-positive sliver --------------------
    pos_tbls = [t for t in ray.get(
        resolved.filter(expr="hit == True").to_arrow_refs()) if t.num_rows]
    pos = (pa.concat_tables(pos_tbls).combine_chunks() if pos_tbls
           else None)
    if pos is not None and pos.num_rows > BROADCAST_ROW_LIMIT:
        # adversarial sliver (undersized bitmap): exact two-sided fallback
        return q_delta_dedup(sf_dir, mod=mod, num_parts=num_parts)
    if pos is not None and pos.num_rows:
        pos_h1 = pa.array(pos["h1"].to_numpy())

        def snap_hits(t: pa.Table) -> pa.Table:
            kt = keyed(t, want_snap=True)
            return kt.filter(pc.is_in(kt["h1"], value_set=pos_h1)) \
                .select(["h1", "h2"])

        hit_tbls = [t for t in ray.get(
            docs.map_batches(snap_hits, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        if hit_tbls:
            st = pa.concat_tables(hit_tbls).combine_chunks()
            snap_keys = set(zip(st["h1"].to_numpy(), st["h2"].to_numpy()))
            keep = ~np.fromiter(
                ((a, b) in snap_keys
                 for a, b in zip(pos["h1"].to_numpy(),
                                 pos["h2"].to_numpy())),
                dtype=bool, count=pos.num_rows)
            pos = pos.filter(pa.array(keep))

    import ray.data as rd

    neg = resolved.filter(expr="hit == False") \
        .select_columns(["doc_id", "n_dup_incoming"])
    if pos is not None and pos.num_rows:
        out = neg.union(rd.from_arrow(
            pos.select(["doc_id", "n_dup_incoming"])))
    else:
        out = neg
    return out.sort("doc_id")


# ---------------------------------------------------------------------------
# BM25 keyword relevance — the retrieval-side scoring a curation pipeline
# uses to mine topic-targeted training data from a web corpus (and the
# lexical sibling of the reference's quanteda TF-IDF scoring,
# /root/reference/R/deduplicaters.R:327-359).  Two streaming passes, no
# corpus shuffle: (1) per-batch partial corpus stats (doc count, total
# length, per-query-term document frequency) reduced through one tiny
# aggregate; (2) broadcast the ~bytes-sized model (idf per term, avgdl) and
# score every batch vectorized.
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("customer", "filter", "merge", "stream")
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_score(sf_dir: str, terms: tuple = BM25_QUERY_TERMS,
                 k1: float = BM25_K1, b: float = BM25_B):
    """-> (doc_id, bm25) for every doc containing at least one query term,
    Robertson/Sparck-Jones BM25 with the +1 idf floor (Lucene form):
    idf_t = ln((N - df_t + 0.5) / (df_t + 0.5) + 1).  Document length =
    whitespace token count (empty tokens dropped), identical to the oracle's
    tokenizer."""
    import ray

    from ray.data.aggregate import Sum

    docs = _docs(sf_dir)
    terms_arr = pa.array(list(terms))
    n_terms = len(terms)

    def tokens_of(t: pa.Table):
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        la = pc.utf8_split_whitespace(col)
        parent = pc.list_parent_indices(la).to_numpy()
        flat = la.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        return t2, flat, parent

    # --- pass 1: corpus stats (one partial row per batch -> tiny Sum) -----
    def partial_stats(t: pa.Table) -> pa.Table:
        t2, flat, parent = tokens_of(t)
        n_docs = t2.num_rows
        term_idx = pc.index_in(flat, value_set=terms_arr).to_numpy(
            zero_copy_only=False)
        hitm = term_idx == term_idx  # non-null mask
        df = np.zeros(n_terms, dtype=np.int64)
        if hitm.any():
            # distinct (doc, term) within the batch
            key = parent[hitm] * n_terms + term_idx[hitm].astype(np.int64)
            df = np.bincount(np.unique(key) % n_terms, minlength=n_terms)
        cols = {"n_docs": pa.array([n_docs], pa.int64()),
                "sum_len": pa.array([len(flat)], pa.int64())}
        for j in range(n_terms):
            cols[f"df_{j}"] = pa.array([int(df[j])], pa.int64())
        return pa.table(cols)

    aggs = [Sum("n_docs", alias_name="n_docs"),
            Sum("sum_len", alias_name="sum_len")] + \
           [Sum(f"df_{j}", alias_name=f"df_{j}") for j in range(n_terms)]
    stats = docs.map_batches(partial_stats, batch_format="pyarrow") \
        .aggregate(*aggs)
    n = float(stats["n_docs"])
    avgdl = stats["sum_len"] / n
    df = np.array([stats[f"df_{j}"] for j in range(n_terms)], dtype=np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    model_ref = ray.put((idf, avgdl))

    # --- pass 2: vectorized per-batch scoring ------------------------------
    def score(t: pa.Table) -> pa.Table:
        idf_v, avg = ray.get(model_ref)
        t2, flat, parent = tokens_of(t)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "bm25": pa.array([], pa.float64())})
        if t2.num_rows == 0:
            return empty
        dl = np.bincount(parent, minlength=t2.num_rows).astype(np.float64)
        term_idx = pc.index_in(flat, value_set=terms_arr).to_numpy(
            zero_copy_only=False)
        hitm = term_idx == term_idx
        if not hitm.any():
            return empty
        key = parent[hitm] * n_terms + term_idx[hitm].astype(np.int64)
        tf_flat = np.bincount(key, minlength=t2.num_rows * n_terms) \
            .reshape(t2.num_rows, n_terms).astype(np.float64)
        denom = tf_flat + k1 * (1.0 - b + b * (dl / avg))[:, None]
        s = (idf_v[None, :] * tf_flat * (k1 + 1.0) / denom) \
            .sum(axis=1, where=tf_flat > 0)
        has = tf_flat.sum(axis=1) > 0
        return pa.table({
            "doc_id": pa.array(t2["doc_id"].to_numpy()[has]),
            "bm25": pa.array(round_half_away(s[has], 4)),
        })

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def bm25_score_sql(terms: tuple = BM25_QUERY_TERMS, k1: float = BM25_K1,
                   b: float = BM25_B) -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
          FROM documents WHERE text IS NOT NULL
        ),
        len AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (
          SELECT (SELECT count(*) FROM documents WHERE text IS NOT NULL) AS n,
                 (SELECT sum(dl) FROM len) * 1.0 /
                 (SELECT count(*) FROM documents WHERE text IS NOT NULL) AS avgdl
        ),
        qt(term) AS (VALUES {vals}),
        df AS (SELECT qt.term,
                      (SELECT count(DISTINCT tok.doc_id) FROM tok
                       WHERE tok.term = qt.term) AS df
               FROM qt),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
               WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term)
        SELECT tf.doc_id,
               round(sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                         * tf.tf * ({k1} + 1)
                         / (tf.tf + {k1} * (1 - {b} + {b} * len.dl / stats.avgdl))
                         ), 4) AS bm25
        FROM tf
        JOIN df ON df.term = tf.term
        JOIN len ON len.doc_id = tf.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
        ORDER BY tf.doc_id
    """


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement (Efraimidis-Spirakis):
# per source, keep the k docs with largest u^(1/w) where u is a
# deterministic pseudo-uniform of the doc id and w = n_chars — long docs
# are proportionally more likely to survive, yet the sample is exactly
# reproducible at any parallelism (and in SQL).  Same combiner shape as
# q_group_cap: per-batch partial top-k, corpus never shuffles.
# ---------------------------------------------------------------------------

WSAMPLE_K = 25
_WS_MULT = 2654435761  # Knuth multiplicative constant, also used in SQL


def q_weighted_sample(sf_dir: str, k: int = WSAMPLE_K):
    """-> (source, doc_id, n_chars): k-per-source weighted sample,
    weight = n_chars, key = u^(1/w), u = ((doc_id * 2654435761 + 7) mod
    2^32 + 1) / (2^32 + 1) in (0, 1)."""
    docs = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))

    def with_key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        w = np.maximum(t["n_chars"].to_numpy().astype(np.float64), 1.0)
        u = ((ids.astype(np.uint64) * np.uint64(_WS_MULT) + np.uint64(7))
             % np.uint64(1 << 32)).astype(np.float64)
        u = (u + 1.0) / float((1 << 32) + 1)
        return t.append_column("es_key", pa.array(u ** (1.0 / w)))

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        key = t["es_key"].to_numpy()
        ids = t["doc_id"].to_numpy()
        order = np.lexsort((ids, -key, codes))
        cs = codes[order]
        starts = np.concatenate(([0], np.flatnonzero(cs[1:] != cs[:-1]) + 1))
        rank = np.arange(len(cs)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(cs)]))))
        return t.take(pa.array(np.sort(order[rank < k])))

    out = docs.map_batches(lambda t: topk(with_key(t)),
                           batch_format="pyarrow") \
        .groupby("source").map_groups(topk, batch_format="pyarrow")
    return out.drop_columns(["es_key"]).sort(["source", "doc_id"])


def weighted_sample_sql(k: int = WSAMPLE_K) -> str:
    return f"""
        WITH keyed AS (
          SELECT source, doc_id, n_chars,
                 pow(((doc_id * {_WS_MULT}::UBIGINT + 7) % 4294967296 + 1)
                     / 4294967297.0,
                     1.0 / greatest(n_chars, 1)) AS es_key
          FROM documents)
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY es_key DESC, doc_id) AS rn
          FROM keyed)
        WHERE rn <= {k}
        ORDER BY source, doc_id
    """


# ---------------------------------------------------------------------------
# Compression-ratio quality signal — the zlib entropy proxy used by web-
# corpus curation (boilerplate/repetition compresses far below natural
# text).  Per-row zlib is the unavoidable C call over opaque bytes (same
# shape as codec decode); everything around it is Arrow.  Rows-only for the
# driver (no SQL zlib); exact recompute oracle in
# tests/test_independent_oracles.py.
# ---------------------------------------------------------------------------

ZRATIO_LEVEL = 6
ZRATIO_LOW = 0.35    # ratio below this -> repetitive/low-entropy flag


def q_compression_ratio(sf_dir: str):
    """-> (doc_id, n_bytes, z_ratio, low_entropy): compressed/raw byte
    ratio per doc (zlib level 6), flagging docs that compress below
    ``ZRATIO_LOW`` (repetition-heavy candidates for removal)."""
    import zlib

    docs = _docs(sf_dir)

    def ratios(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        texts = t2["text"].to_pylist()
        n = np.empty(len(texts), np.int64)
        z = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            b = s.encode("utf-8")
            n[i] = len(b)
            z[i] = len(zlib.compress(b, ZRATIO_LEVEL))
        ratio = z / np.maximum(n, 1)
        return pa.table({
            "doc_id": t2["doc_id"],
            "n_bytes": pa.array(n),
            "z_ratio": pa.array(round_half_away(ratio, 4)),
            "low_entropy": pa.array(ratio < ZRATIO_LOW),
        })

    return docs.map_batches(ratios, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Dup-graph degree table — per-document degree in the exact-Jaccard near-dup
# graph: the diagnostic that finds template/boilerplate hubs (a doc near-
# duplicating hundreds of others is a template, not content).  Composes the
# exact AllPairs join (complete candidate generation) with one explode +
# partial-count reduce; only (doc_id, 1) rows shuffle.
# ---------------------------------------------------------------------------

def q_dup_graph_degree(sf_dir: str, k: int = 5, thresh: float = 0.7):
    """-> (doc_id, degree) for every doc with >= 1 near-dup neighbor at
    char-k-gram Jaccard >= thresh, sorted by doc_id."""
    from ray.data.aggregate import Sum

    pairs = _graph_edges(sf_dir, k, thresh)

    def explode(t: pa.Table) -> pa.Table:
        ids = np.concatenate((t["left_id"].to_numpy(),
                              t["right_id"].to_numpy()))
        return pa.table({"doc_id": pa.array(ids),
                         "n": pa.array(np.ones(len(ids), np.int64))})

    return pairs.map_batches(explode, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("n", alias_name="degree")) \
        .sort("doc_id")


def dup_graph_degree_sql(k: int = 5, thresh: float = 0.7) -> str:
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), {k}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS u
                FROM documents)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        e AS (
          SELECT i.l, i.r FROM inter i
          JOIN sz sa ON sa.doc_id = i.l
          JOIN sz sb ON sb.doc_id = i.r
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {thresh}
        ),
        d AS (SELECT l AS doc_id FROM e UNION ALL SELECT r FROM e)
        SELECT doc_id, count(*) AS degree FROM d
        GROUP BY doc_id ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Corpus-drift divergence — pairwise Jensen-Shannon divergence between the
# per-source unigram distributions: the mixing/drift diagnostic run before
# blending corpora.  Decomposition keeps it one-shuffle distributed: only
# terms present in BOTH sources of a pair need a joint row —
#   JS(a,b) = Σ_both f(p,q) + 0.5·ln2·(2 − Σ_both p − Σ_both q),
# so the term-hash groupby emits (pair, contrib, p-mass, q-mass) partials
# and pairs that never co-occur degenerate to ln 2 exactly.  Per-source
# totals are a tiny broadcast; the corpus streams once.
# ---------------------------------------------------------------------------

def q_source_divergence(sf_dir: str, num_parts: int | None = None):
    """-> (src_a, src_b, js_div) for every source pair (a < b), natural-log
    Jensen-Shannon divergence of whitespace-token unigram distributions,
    rounded 4."""
    num_parts = num_parts or _auto_shuffle_parts()
    import ray

    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        la = pc.utf8_split_whitespace(pc.fill_null(txt, ""))
        parent = pc.list_parent_indices(la).to_numpy()
        flat = la.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = pc.dictionary_encode(src.take(pa.array(parent)))
        if isinstance(senc, pa.ChunkedArray):
            senc = senc.combine_chunks()
        scode = senc.indices.to_numpy().astype(np.int64)
        h = hx.hash_strings(flat)
        key = np.stack((scode, h.view(np.int64)), axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({
            "source": senc.dictionary.take(pa.array(uniq[:, 0])),
            "h": pa.array(uniq[:, 1]),
            "c": pa.array(cnt.astype(np.int64)),
            "part": pa.array((uniq[:, 1].view(np.uint64)
                              % np.uint64(num_parts)).astype(np.int32)),
        })

    cstream = docs.map_batches(counts, batch_format="pyarrow")
    cstream = cstream.materialize()

    # per-source token totals: tiny two-level aggregate, then broadcast
    totals = cstream.groupby("source").aggregate(Sum("c", alias_name="n")) \
        .take_all()
    tot = {r["source"]: float(r["n"]) for r in totals}
    sources = sorted(tot)
    src_arr = pa.array(sources)
    tot_vec = np.array([tot[s] for s in sources])
    side_ref = ray.put((src_arr, tot_vec))

    def pair_partials(g: pa.Table) -> pa.Table:
        empty = pa.table({"src_a": pa.array([], pa.string()),
                          "src_b": pa.array([], pa.string()),
                          "contrib": pa.array([], pa.float64()),
                          "mass_a": pa.array([], pa.float64()),
                          "mass_b": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        s_arr, t_vec = ray.get(side_ref)
        sidx = pc.index_in(g["source"], value_set=s_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = g["h"].to_numpy()
        c = g["c"].to_numpy().astype(np.float64)
        # per-(term, source) counts were pre-combined per batch but may
        # arrive in several partial rows: merge within the group first
        key = np.stack((h, sidx), axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        cm = np.zeros(len(uniq))
        np.add.at(cm, inv, c)
        hh = uniq[:, 0]
        si = uniq[:, 1]
        p = cm / t_vec[si]
        order = np.lexsort((si, hh))
        hh, si, p = hh[order], si[order], p[order]
        starts = np.concatenate(([0],
                                 np.flatnonzero(hh[1:] != hh[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [len(hh)])))
        out_a, out_b, out_c, out_pa, out_qb = [], [], [], [], []
        for st, sz in zip(starts, sizes):
            if sz < 2:
                continue
            ss = si[st:st + sz]
            pp = p[st:st + sz]
            ii, jj = np.triu_indices(sz, k=1)
            pi, qj = pp[ii], pp[jj]
            m2 = pi + qj
            contrib = 0.5 * pi * np.log(2.0 * pi / m2) \
                + 0.5 * qj * np.log(2.0 * qj / m2)
            out_a.append(ss[ii])
            out_b.append(ss[jj])
            out_c.append(contrib)
            out_pa.append(pi)
            out_qb.append(qj)
        if not out_a:
            return empty
        ai = np.concatenate(out_a)
        bi = np.concatenate(out_b)
        return pa.table({
            "src_a": s_arr.take(pa.array(ai)),
            "src_b": s_arr.take(pa.array(bi)),
            "contrib": pa.array(np.concatenate(out_c)),
            "mass_a": pa.array(np.concatenate(out_pa)),
            "mass_b": pa.array(np.concatenate(out_qb)),
        })

    agg = cstream.groupby("part").map_groups(
        lambda g: pair_partials(g.drop_columns(["part"])),
        batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]).aggregate(
            Sum("contrib", alias_name="contrib"),
            Sum("mass_a", alias_name="mass_a"),
            Sum("mass_b", alias_name="mass_b")).take_all()
    got = {(r["src_a"], r["src_b"]):
           (r["contrib"], r["mass_a"], r["mass_b"]) for r in agg}

    ln2 = float(np.log(2.0))
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            contrib, ma, mb = got.get((a, b), (0.0, 0.0, 0.0))
            js = contrib + 0.5 * ln2 * (2.0 - ma - mb)
            rows.append({"src_a": a, "src_b": b,
                         "js_div": float(round_half_away(
                             np.array([js]), 4)[0])})
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)) \
        .sort(["src_a", "src_b"])


def source_divergence_sql() -> str:
    return """
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
          FROM documents WHERE text IS NOT NULL
        ),
        cnt AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY 1),
        p AS (SELECT cnt.source, cnt.term, cnt.c * 1.0 / tot.n AS p
              FROM cnt JOIN tot ON tot.source = cnt.source),
        pairs AS (SELECT a.source AS sa, b.source AS sb
                  FROM tot a JOIN tot b ON a.source < b.source),
        terms AS (SELECT DISTINCT term FROM cnt),
        grid AS (
          SELECT pr.sa, pr.sb, t.term,
                 coalesce(px.p, 0) AS p, coalesce(py.p, 0) AS q
          FROM pairs pr CROSS JOIN terms t
          LEFT JOIN p px ON px.source = pr.sa AND px.term = t.term
          LEFT JOIN p py ON py.source = pr.sb AND py.term = t.term)
        SELECT sa AS src_a, sb AS src_b,
               round(sum(
                 CASE WHEN p > 0 THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END
               + CASE WHEN q > 0 THEN 0.5 * q * ln(2 * q / (p + q)) ELSE 0 END
               ), 4) AS js_div
        FROM grid WHERE p + q > 0
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Longest-repeated-substring diagnostic — the intra-document repetition
# signal from the substring-dedup literature (Lee et al. 2022 flag docs
# whose text contains long internal repeats; word_repetition covers gram
# RATES, this measures the single worst repeat).  Per-doc suffix array +
# max adjacent LCP (functions/suffix.max_adjacent_lcp); docs are opaque
# variable-length strings so the loop is per-row with a vectorized body —
# the codec-decode shape.
# ---------------------------------------------------------------------------

LRS_FLAG_FRAC = 0.3   # repeat covering > 30% of the doc -> flagged


def q_longest_repeat(sf_dir: str):
    """-> (doc_id, n_chars_utf8, max_repeat_len, repeat_frac, flagged):
    longest repeated substring length per doc (byte-domain), its fraction
    of the doc, and the curation flag.  Rows-only for the driver; brute
    binary-search-over-substring-sets oracle in
    tests/test_independent_oracles.py."""
    docs = _docs(sf_dir)

    from who_owns_mass_processing_ray.functions import suffix as sx

    def per_doc(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        texts = t2["text"].to_pylist()
        n = np.empty(len(texts), np.int64)
        lrs = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            b = np.frombuffer(s.encode("utf-8"), np.uint8)
            n[i] = len(b)
            lrs[i] = sx.max_adjacent_lcp(b)
        frac = lrs / np.maximum(n, 1)
        return pa.table({
            "doc_id": t2["doc_id"],
            "n_chars_utf8": pa.array(n),
            "max_repeat_len": pa.array(lrs),
            "repeat_frac": pa.array(round_half_away(frac, 4)),
            "flagged": pa.array(frac > LRS_FLAG_FRAC),
        })

    return docs.map_batches(per_doc, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Document novelty — fraction of a doc's distinct char-5-grams that appear
# NOWHERE else in the corpus (df == 1): the uniqueness prior used when
# up-sampling rare content and down-sampling boilerplate.  Same two-shuffle
# shape as paragraph dedup: distinct (doc, gram-hash) pairs hash-partition
# by gram (so each partition sees a gram's FULL document set and computes
# its df exactly), then per-doc partials reduce by doc.
# ---------------------------------------------------------------------------

def q_doc_novelty(sf_dir: str, k: int = 5, num_parts: int | None = None):
    """-> (doc_id, n_grams, n_unique, novelty): distinct-gram count, count
    with corpus df == 1, and their ratio (rounded 4), sorted by doc_id."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.is_valid(txt))
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t2["doc_id"].to_numpy()
        vals, offs = hx.shingle_hashes(col, k, seed=21)
        doc = np.repeat(ids, np.diff(offs))
        key = np.stack((doc, vals.view(np.int64)), axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({
            "doc_id": pa.array(uniq[:, 0]),
            "h": pa.array(uniq[:, 1]),
            "part": pa.array((uniq[:, 1].view(np.uint64)
                              % np.uint64(num_parts)).astype(np.int32)),
        })

    def part_counts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_unique": pa.array([], pa.int64())})
        h = g["h"].to_numpy()
        doc = g["doc_id"].to_numpy()
        hu, inv, cnt = np.unique(h, return_inverse=True,
                                 return_counts=True)
        is_unique = (cnt == 1)[inv]
        du, dinv = np.unique(doc, return_inverse=True)
        n_grams = np.bincount(dinv, minlength=len(du))
        n_unique = np.bincount(dinv[is_unique], minlength=len(du))
        return pa.table({
            "doc_id": pa.array(du),
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "n_unique": pa.array(n_unique.astype(np.int64)),
        })

    agg = docs.map_batches(pairs, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: part_counts(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby("doc_id").aggregate(
            Sum("n_grams", alias_name="n_grams"),
            Sum("n_unique", alias_name="n_unique"))

    def finish(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy()
        nu = t["n_unique"].to_numpy()
        return t.append_column(
            "novelty", pa.array(round_half_away(
                nu / np.maximum(ng, 1), 4)))

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def doc_novelty_sql(k: int = 5) -> str:
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), {k}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS u
                FROM documents WHERE text IS NOT NULL)
        ),
        df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
        SELECT g.doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unique,
               round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS novelty
        FROM g JOIN df ON df.gram = g.gram
        GROUP BY g.doc_id ORDER BY g.doc_id
    """


# ---------------------------------------------------------------------------
# PMI bigram association mining — collocation detection over the corpus
# (corpus-statistics sibling of q_ngram_topk; the association measure behind
# phrase tables / tokenizer-merge candidates in training-data pipelines)
# ---------------------------------------------------------------------------

def q_pmi_bigrams(sf_dir: str, min_count: int = 3,
                  pmi_thresh: float = 0.25, num_parts: int | None = None):
    """-> (w1, w2, n_pair, pmi): adjacent-word bigrams with corpus count
    >= ``min_count`` whose pointwise mutual information (log2 of observed
    over independent-margin expectation, both margins positional) rounds to
    >= ``pmi_thresh``, sorted (w1, w2).

    Scale shape: the corpus never shuffles — per-batch Arrow group_by emits
    partial (w1, w2) counts, ONE groupby reduces them, and the two positional
    margins are groupbys OF THAT table (vocabulary-sized, far smaller).
    Margins re-attach via the adaptive broadcast/shuffle join, so a 100 TB
    corpus pays one bigram-table shuffle + two vocab-table shuffles, never a
    doc shuffle.  Thresholding on the ROUNDED pmi keeps the output set
    deterministic across engines (no float-boundary top-k flake).
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    docs = _docs(sf_dir)

    def pair_counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        vals = lst.flatten()
        offs = lst.offsets.to_numpy()
        offs = offs - offs[0]  # slice-safe: flatten() already compensates
        n = len(vals)
        if n == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_pair": pa.array([], pa.int64())})
        # adjacency mask: every token is a left-word except each doc's last
        keep = np.ones(n, dtype=bool)
        keep[np.maximum(offs[1:], 1) - 1] = False
        keep[n - 1] = False
        idx = np.flatnonzero(keep)
        pairs = pa.table({"w1": vals.take(pa.array(idx)),
                          "w2": vals.take(pa.array(idx + 1))})
        part = pairs.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": part["w1"], "w2": part["w2"],
                         "n_pair": part["w1_count"]})

    bigrams = docs.map_batches(pair_counts, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("n_pair", alias_name="n_pair")) \
        .materialize()

    left = bigrams.groupby("w1").aggregate(Sum("n_pair", alias_name="c1"))
    right = bigrams.groupby("w2").aggregate(Sum("n_pair", alias_name="c2"))
    total = bigrams.aggregate(Sum("n_pair", alias_name="n"))["n"]

    freq = bigrams.filter(expr=f"n_pair >= {min_count}")
    freq = attach_columns(freq, left, "w1", "w1", {"c1": "c1"}, num_parts)
    freq = attach_columns(freq, right, "w2", "w2", {"c2": "c2"}, num_parts)

    def score(t: pa.Table) -> pa.Table:
        c = t["n_pair"].to_numpy().astype(np.float64)
        c1 = t["c1"].to_numpy().astype(np.float64)
        c2 = t["c2"].to_numpy().astype(np.float64)
        pmi = round_half_away(np.log2((c * float(total)) / (c1 * c2)), 4)
        out = t.select(["w1", "w2", "n_pair"]).append_column(
            "pmi", pa.array(pmi))
        return out.filter(pa.array(pmi >= pmi_thresh))

    return freq.map_batches(score, batch_format="pyarrow").sort(["w1", "w2"])


def pmi_bigrams_sql(min_count: int = 3, pmi_thresh: float = 0.25) -> str:
    return f"""
        WITH ws AS (
          SELECT string_split(text, ' ') AS w FROM documents
          WHERE text IS NOT NULL),
        bg AS (
          SELECT w[CAST(i AS INTEGER)] AS w1,
                 w[CAST(i AS INTEGER) + 1] AS w2, count(*) AS n_pair
          FROM ws, unnest(range(1, len(w))) AS t(i)
          GROUP BY 1, 2),
        l AS (SELECT w1, sum(n_pair) AS c1 FROM bg GROUP BY 1),
        r AS (SELECT w2, sum(n_pair) AS c2 FROM bg GROUP BY 1),
        n AS (SELECT sum(n_pair) AS n FROM bg)
        SELECT bg.w1, bg.w2, bg.n_pair,
               round(log2((bg.n_pair * 1.0 * n.n) / (1.0 * l.c1 * r.c2)), 4)
                   AS pmi
        FROM bg, n
        JOIN l ON l.w1 = bg.w1
        JOIN r ON r.w2 = bg.w2
        WHERE bg.n_pair >= {min_count}
          AND round(log2((bg.n_pair * 1.0 * n.n) / (1.0 * l.c1 * r.c2)), 4)
              >= {pmi_thresh}
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Per-source distinctive terms — smoothed log-odds ratio (Monroe et al. 2008
# "Fightin' Words" with a flat 0.5 prior).  The per-source companion of
# q_source_divergence: which words make a source different, not just how far
# apart two sources are.  Used to audit what a crawl slice actually contains
# before mixing it into a training blend.
# ---------------------------------------------------------------------------

def q_distinctive_terms(sf_dir: str, k: int = 10, num_parts: int | None = None):
    """-> (source, term, n_term, log_odds): the ``k`` most distinctive words
    per source by smoothed log-odds of in-source vs rest-of-corpus rate
    (rounded 4; rank ties broken by term), sorted (source, term).

    Scale shape: the corpus never shuffles — per-batch Arrow group_by emits
    partial (source, term) counts and ONE groupby reduces them.  Word totals
    are a groupby OF the counts table (vocab-sized) re-attached via the
    adaptive join; source totals are a tiny broadcast dict.  Ranking on the
    ROUNDED score with a term tiebreak makes the top-k deterministic across
    engines, and the per-batch partial top-k means only <= k rows per
    (source, batch) reach the final select.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def term_counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        flat = pa.table({
            "source": src.take(pa.array(np.repeat(
                np.arange(len(counts)), counts))),
            "term": lst.flatten(),
        })
        part = flat.group_by(["source", "term"]).aggregate([("term", "count")])
        return pa.table({"source": part["source"], "term": part["term"],
                         "y": part["term_count"]})

    counts = docs.map_batches(term_counts, batch_format="pyarrow") \
        .groupby(["source", "term"]).aggregate(Sum("y", alias_name="y")) \
        .materialize()

    word_tot = counts.groupby("term").aggregate(Sum("y", alias_name="tw"))
    src_rows = counts.groupby("source").aggregate(
        Sum("y", alias_name="ns")).take_all()  # bounded: one row per source
    ns_map = {r["source"]: float(r["ns"]) for r in src_rows}
    n_total = float(sum(ns_map.values()))

    scored = attach_columns(counts, word_tot, "term", "term",
                            {"tw": "tw"}, num_parts)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n_term": pa.array([], pa.int64()),
                             "log_odds": pa.array([], pa.float64())})
        srcs = t["source"]
        if isinstance(srcs, pa.ChunkedArray):
            srcs = srcs.combine_chunks()
        uniq = srcs.unique()
        ns_arr = np.array([ns_map[s.as_py()] for s in uniq])
        ns = ns_arr[pc.index_in(srcs, uniq).to_numpy()]
        y = t["y"].to_numpy().astype(np.float64)
        tw = t["tw"].to_numpy().astype(np.float64)
        lo = round_half_away(np.log2(
            ((y + 0.5) / (ns - y + 0.5))
            / ((tw - y + 0.5) / (n_total - ns - (tw - y) + 0.5))), 4)
        return pa.table({"source": t["source"], "term": t["term"],
                         "n_term": t["y"], "log_odds": pa.array(lo)})

    def top_terms(t: pa.Table) -> pa.Table:
        # per-source top-k by (log_odds desc, term asc): Arrow sort (string
        # tiebreak native) + one segment-rank pass; valid as a PARTIAL pass
        # because the global top-k is a subset of the union of batch top-ks
        if t.num_rows == 0:
            return t
        s = t.sort_by([("source", "ascending"), ("log_odds", "descending"),
                       ("term", "ascending")])
        src = s["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        rank = np.arange(len(codes)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(codes)]))))
        return s.filter(pa.array(rank < k))

    out = scored.map_batches(score, batch_format="pyarrow") \
        .map_batches(top_terms, batch_format="pyarrow") \
        .groupby("source").map_groups(top_terms, batch_format="pyarrow")
    return out.sort(["source", "term"])


def distinctive_terms_sql(k: int = 10) -> str:
    return f"""
        WITH w AS (
          SELECT source, unnest(string_split(text, ' ')) AS term
          FROM documents WHERE text IS NOT NULL),
        c AS (SELECT source, term, count(*) AS y FROM w GROUP BY 1, 2),
        wt AS (SELECT term, sum(y) AS tw FROM c GROUP BY 1),
        st AS (SELECT source, sum(y) AS ns FROM c GROUP BY 1),
        n AS (SELECT sum(y) AS n FROM c),
        sc AS (
          SELECT c.source, c.term, c.y,
                 round(log2(((c.y + 0.5) / (st.ns - c.y + 0.5))
                       / ((wt.tw - c.y + 0.5)
                          / (n.n - st.ns - (wt.tw - c.y) + 0.5))), 4)
                     AS log_odds
          FROM c, n
          JOIN wt ON wt.term = c.term
          JOIN st ON st.source = c.source)
        SELECT source, term, y AS n_term, log_odds FROM (
          SELECT *, row_number() OVER (
              PARTITION BY source ORDER BY log_odds DESC, term) AS rn
          FROM sc)
        WHERE rn <= {k}
        ORDER BY source, term
    """


def _graph_edges(sf_dir: str, k: int, thresh: float):
    """Edge stream for the dup-graph analytics.  At the LSH-tuned threshold
    (0.7, char-5-grams) the MinHash+LSH+exact-verify stream produces the
    SAME verified pair set as the exact AllPairs join (per-pair miss
    p≈2e-6 — the same margin q_minhash_near_dup's own hash-match oracle
    carries) at a fraction of the cost: the exact join is O(candidate²)
    on zipfy corpora (~140 s at sf0.1) while the LSH path is linear
    (~7 s).  Other thresholds fall back to the exact join — the 48x4
    S-curve is only flake-safe at its tuned tau."""
    if k == 5 and abs(thresh - 0.7) < 1e-9:
        return q_minhash_near_dup(sf_dir)
    return q_ngram_jaccard_pairs(sf_dir, k=k, thresh=thresh)


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph — the clustering-coefficient
# numerator.  Dense triangle neighborhoods = template/boilerplate families
# (complements q_dup_graph_degree's hub view: degree finds stars, triangles
# find cliques).  Classic degree-ordered orientation (Cohen 2009 / Suri-
# Vassilvitskii 2011): orient every edge from the (degree, id)-smaller
# endpoint, generate wedges only between OUT-neighbors, and probe each wedge
# against the undirected edge set.  Each triangle has exactly one apex under
# the total order, so counts are exact, and out-degree is bounded by
# O(sqrt(m)) — the skew mitigation that makes wedge expansion tractable on
# power-law dup graphs.
# ---------------------------------------------------------------------------

def q_dup_graph_triangles(sf_dir: str, k: int = 5, thresh: float = 0.7,
                          num_parts: int | None = None):
    """-> (doc_id, n_triangles) for every doc in >= 1 triangle of the
    char-k-gram Jaccard >= thresh graph, sorted by doc_id.

    Scale shape: only narrow id streams move — degrees are one partial-count
    reduce, both endpoint degrees re-attach via the adaptive join, wedge
    generation is a vectorized per-partition segment expansion (bounded by
    the orientation, no silent caps), and wedges meet edges in ONE shared
    hash-partition shuffle keyed on the closing pair, matched by a pyarrow
    hash join per partition.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.stages.joins import attach_columns

    edges = _graph_edges(sf_dir, k, thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        ids = np.concatenate((t["left_id"].to_numpy(),
                              t["right_id"].to_numpy()))
        return pa.table({"doc_id": pa.array(ids),
                         "n": pa.array(np.ones(len(ids), np.int64))})

    deg = edges.map_batches(explode, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("n", alias_name="degree"))

    e2 = attach_columns(edges, deg, "left_id", "doc_id",
                        {"degree": "dl"}, num_parts)
    e2 = attach_columns(e2, deg, "right_id", "doc_id",
                        {"degree": "dr"}, num_parts)

    def _pair_part(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        h = hx.splitmix64(a.astype(np.uint64)
                          ^ hx.splitmix64(b.astype(np.uint64)))
        return (h % np.uint64(num_parts)).astype(np.int32)

    def orient(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        dl = t["dl"].to_numpy()
        dr = t["dr"].to_numpy()
        lf = (dl < dr) | ((dl == dr) & (l < r))
        return pa.table({
            "src": pa.array(np.where(lf, l, r)),
            "dst": pa.array(np.where(lf, r, l)),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "part", pa.array((t["src"].to_numpy()
                              % np.int64(num_parts)).astype(np.int32))),
            batch_format="pyarrow")

    def wedges(g: pa.Table) -> pa.Table:
        # all out-neighbor pairs per apex: one lexsort + exact triangular
        # expansion per src segment (orientation bounds segment size)
        if g.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64()),
                             "pp": pa.array([], pa.int32())})
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(src[1:] != src[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [len(src)])))
        P = sizes * (sizes - 1) // 2
        tot = int(P.sum())
        if tot == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64()),
                             "pp": pa.array([], pa.int32())})
        cum = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(P, out=cum[1:])
        rr = np.arange(tot, dtype=np.int64) - np.repeat(cum[:-1], P)
        # decode r -> (i, j) with i < j inside each segment
        jj = np.ceil((np.sqrt(8.0 * (rr + 1) + 1) - 1) / 2).astype(np.int64)
        ii = rr - jj * (jj - 1) // 2
        base = np.repeat(starts, P)
        u = dst[base + ii]
        v = dst[base + jj]
        a = np.minimum(u, v)
        b = np.maximum(u, v)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "apex": pa.array(src[base + ii]),
                         "pp": pa.array(_pair_part(a, b))})

    wedge_ds = oriented.groupby("part").map_groups(
        lambda g: wedges(g.drop_columns(["part"])), batch_format="pyarrow")

    edge_keys = edges.map_batches(
        lambda t: pa.table({
            "a": t["left_id"], "b": t["right_id"],
            "pp": pa.array(_pair_part(t["left_id"].to_numpy(),
                                      t["right_id"].to_numpy())),
        }), batch_format="pyarrow")

    def close_wedges(g: pa.Table) -> pa.Table:
        # wedge rows carry apex >= 0; edge rows carry apex == -1
        w = g.filter(pc.not_equal(g["apex"], -1))
        e = g.filter(pc.equal(g["apex"], -1)).select(["a", "b"])
        if w.num_rows == 0 or e.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        hit = w.join(e.append_column(
            "__e", pa.array(np.ones(e.num_rows, np.int8))),
            keys=["a", "b"], join_type="inner")
        if hit.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ids = np.concatenate((hit["a"].to_numpy(), hit["b"].to_numpy(),
                              hit["apex"].to_numpy()))
        return pa.table({"doc_id": pa.array(ids),
                         "n": pa.array(np.ones(len(ids), np.int64))})

    tagged_edges = edge_keys.map_batches(
        lambda t: t.append_column(
            "apex", pa.array(np.full(t.num_rows, -1, np.int64))),
        batch_format="pyarrow").select_columns(["a", "b", "apex", "pp"])
    both = wedge_ds.select_columns(["a", "b", "apex", "pp"]) \
        .union(tagged_edges)

    return both.groupby("pp").map_groups(
        lambda g: close_wedges(g.drop_columns(["pp"])),
        batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("n", alias_name="n_triangles")) \
        .sort("doc_id")


def dup_graph_triangles_sql(k: int = 5, thresh: float = 0.7) -> str:
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), {k}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS u
                FROM documents)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        e AS (
          SELECT i.l, i.r FROM inter i
          JOIN sz sa ON sa.doc_id = i.l
          JOIN sz sb ON sb.doc_id = i.r
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {thresh}
        ),
        tri AS (
          SELECT e1.l AS a, e1.r AS b, e2.r AS c
          FROM e e1
          JOIN e e2 ON e2.l = e1.r
          JOIN e e3 ON e3.l = e1.l AND e3.r = e2.r
        ),
        m AS (
          SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri
        )
        SELECT doc_id, count(*) AS n_triangles
        FROM m GROUP BY doc_id ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Per-doc character entropy — exact Shannon entropy of the byte distribution
# (bits/char).  The analytic sibling of q_compression_ratio's zlib proxy:
# low entropy = repetitive/boilerplate text, a standard curation filter.
# Pure map-side: zero shuffles, one vectorized pass per batch over the
# zero-copy Arrow string buffers.
# ---------------------------------------------------------------------------

def q_char_entropy(sf_dir: str):
    """-> (doc_id, n_chars, char_entropy): per-doc byte count and Shannon
    entropy in bits (rounded 4), non-empty docs only, sorted by doc_id."""
    docs = _docs(sf_dir)

    def entropy(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, offs = hx._string_buffers(col)
        offs = offs - offs[0]
        lens = np.diff(offs)
        ids = t["doc_id"].to_numpy()
        keep = lens > 0
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "char_entropy": pa.array([], pa.float64())})
        doc_of_byte = np.repeat(np.arange(len(lens)), lens)
        # per-(doc, byte-value) counts in one bincount over a combined key
        key = doc_of_byte * np.int64(256) + data[offs[0]:offs[-1]]
        cnt = np.bincount(key, minlength=len(lens) * 256) \
            .reshape(len(lens), 256).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = cnt / np.maximum(lens, 1)[:, None]
            h = -np.where(cnt > 0, p * np.log2(p), 0.0).sum(axis=1)
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_chars": pa.array(lens[keep]),
            "char_entropy": pa.array(round_half_away(h[keep], 4)),
        })

    return docs.map_batches(entropy, batch_format="pyarrow").sort("doc_id")


def char_entropy_sql() -> str:
    return """
        WITH ch AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
          FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1)
        SELECT cnt.doc_id, CAST(tot.t AS BIGINT) AS n_chars,
               round(-sum((cnt.n * 1.0 / tot.t)
                          * log2(cnt.n * 1.0 / tot.t)), 4) AS char_entropy
        FROM cnt JOIN tot ON tot.doc_id = cnt.doc_id
        GROUP BY 1, 2 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# Span-dedup masking — the APPLY side of cross-doc substring dedup (Lee et
# al. 2022): q_shared_span_pairs finds documents sharing exact spans; this
# operator performs the removal, masking every stride-1 span-gram occurrence
# whose gram also appears in an earlier (min-doc_id "owner") document.  The
# owner keeps its text; every later doc gets the shared chars blanked.
# Same 128-bit stride-1 gram discipline as q_shared_span_pairs; positions
# ride along as one extra int32 per gram row.
# ---------------------------------------------------------------------------

def q_span_dedup_mask(sf_dir: str, span: int = SPAN_CHARS,
                      num_parts: int | None = None):
    """-> (doc_id, n_masked, text_masked): per non-null doc, the count of
    chars covered by masked spans and the text with those chars replaced by
    '#', sorted by doc_id.

    Scale shape: gram rows (h1, h2, doc_id, pos — ~bytes-of-corpus narrow)
    hash-partition by gram; each partition computes per-gram owners with one
    vectorized lexsort/segment-min and emits only NON-owner (doc_id, pos)
    rows; those collapse to one packed int32 blob per doc (hash-partitioned,
    vectorized), re-attached to the corpus via the adaptive join; the mask
    itself is one diff-array/cumsum pass over the zero-copy string buffers.
    The corpus pays one narrow join — document bytes never shuffle.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    docs = _docs(sf_dir)

    def gram_rows(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t2 = t.filter(pc.fill_null(
            pc.greater_equal(pc.utf8_length(txt), span), False))
        if t2.num_rows == 0:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int32()),
                             "part": pa.array([], pa.int32())})
        col = t2["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t2["doc_id"].to_numpy()
        v1, offs = hx.shingle_hashes(col, span, seed=17)
        v2, _ = hx.shingle_hashes(col, span, seed=9176)
        per_doc = np.diff(offs)
        doc = np.repeat(ids, per_doc)
        pos = (np.arange(len(v1), dtype=np.int64)
               - np.repeat(offs[:-1], per_doc)).astype(np.int32)
        return pa.table({
            "h1": pa.array(v1.view(np.int64)),
            "h2": pa.array(v2.view(np.int64)),
            "doc_id": pa.array(doc),
            "pos": pa.array(pos),
            "part": pa.array((v1 % np.uint64(num_parts)).astype(np.int32)),
        })

    def non_owner_hits(g: pa.Table) -> pa.Table:
        # per (h1, h2) gram: owner = min doc_id; emit every occurrence in a
        # LATER doc (one lexsort + segment-min broadcast, no Python loop)
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int32())})
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((doc, h2, h1))
        h1s, h2s, ds, ps = h1[order], h2[order], doc[order], pos[order]
        new_seg = np.empty(len(h1s), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        seg_id = np.cumsum(new_seg) - 1
        owners = ds[new_seg]          # segment head = min doc (sorted)
        hit = ds > owners[seg_id]
        return pa.table({"doc_id": pa.array(ds[hit]),
                         "pos": pa.array(ps[hit])})

    hits = docs.map_batches(gram_rows, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: non_owner_hits(g.drop_columns(["part"])),
            batch_format="pyarrow")

    def pack_positions(g: pa.Table) -> pa.Table:
        # one int32 blob of distinct sorted positions per doc (binary, not
        # list<> — Arrow hash joins reject list payload columns)
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos_blob": pa.array([], pa.binary())})
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        key = np.unique(np.stack(
            (doc, pos.astype(np.int64)), axis=1), axis=0)
        d, p = key[:, 0], key[:, 1].astype(np.int32)
        new_doc = np.empty(len(d), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new_doc)
        ends = np.concatenate((starts[1:], [len(d)]))
        return pa.table({
            "doc_id": pa.array(d[starts]),
            "pos_blob": pa.array([p[s:e].tobytes()
                                  for s, e in zip(starts, ends)],
                                 pa.binary()),
        })

    packed = hits.map_batches(
        lambda t: t.append_column(
            "dpart", pa.array((t["doc_id"].to_numpy()
                               % np.int64(num_parts)).astype(np.int32))),
        batch_format="pyarrow") \
        .groupby("dpart").map_groups(
            lambda g: pack_positions(g.drop_columns(["dpart"])),
            batch_format="pyarrow")

    base = docs.map_batches(
        lambda t: t.filter(pc.is_valid(t["text"])), batch_format="pyarrow")
    joined = attach_columns(base, packed, "doc_id", "doc_id",
                            {"pos_blob": "pos_blob"}, num_parts, how="left")

    def apply_mask(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, offs = hx._string_buffers(col)
        data = data.copy()
        base_off = offs[0]
        blobs = t["pos_blob"].to_pylist()
        n_masked = np.zeros(len(blobs), dtype=np.int64)
        for i, blob in enumerate(blobs):
            if not blob:
                continue
            p = np.frombuffer(blob, dtype=np.int32).astype(np.int64)
            ln = offs[i + 1] - offs[i]
            diff = np.zeros(ln + 1, dtype=np.int64)
            np.add.at(diff, p, 1)
            np.add.at(diff, np.minimum(p + span, ln), -1)
            cover = np.cumsum(diff[:-1]) > 0
            n_masked[i] = int(cover.sum())
            seg = data[offs[i] - base_off:offs[i + 1] - base_off]
            seg[cover] = ord("#")
        masked = pa.Array.from_buffers(
            pa.large_utf8(), len(blobs),
            [None, pa.py_buffer((offs - base_off).tobytes()),
             pa.py_buffer(data.tobytes())])
        return pa.table({"doc_id": t["doc_id"],
                         "n_masked": pa.array(n_masked),
                         "text_masked": masked.cast(pa.string())})

    return joined.map_batches(apply_mask, batch_format="pyarrow") \
        .sort("doc_id")


def span_dedup_mask_sql(span: int = SPAN_CHARS) -> str:
    return f"""
        WITH g AS (
          SELECT doc_id, CAST(u AS INTEGER) AS p,
                 substr(text, CAST(u AS INTEGER), {span}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {span - 1}, 0) + 1))
                    AS u
                FROM documents WHERE text IS NOT NULL)),
        own AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY 1),
        bad AS (
          SELECT g.doc_id, g.p FROM g
          JOIN own ON own.gram = g.gram
          WHERE g.doc_id > own.owner),
        cov AS (
          SELECT DISTINCT doc_id, p + CAST(i AS INTEGER) AS c
          FROM bad, unnest(range(0, {span})) AS t(i)),
        ch AS (
          SELECT d.doc_id, CAST(u AS INTEGER) AS i,
                 substr(d.text, CAST(u AS INTEGER), 1) AS c0
          FROM documents d, unnest(range(1, length(d.text) + 1)) AS t(u)
          WHERE d.text IS NOT NULL),
        m AS (
          SELECT ch.doc_id, ch.i,
                 CASE WHEN cov.c IS NOT NULL THEN '#' ELSE ch.c0 END AS c
          FROM ch LEFT JOIN cov
            ON cov.doc_id = ch.doc_id AND cov.c = ch.i)
        SELECT d.doc_id,
               CAST(coalesce(x.n_masked, 0) AS BIGINT) AS n_masked,
               coalesce(x.text_masked, d.text) AS text_masked
        FROM documents d
        LEFT JOIN (
          SELECT doc_id,
                 sum(CASE WHEN c = '#' THEN 1 ELSE 0 END) AS n_masked,
                 string_agg(c, '' ORDER BY i) AS text_masked
          FROM m GROUP BY doc_id) x ON x.doc_id = d.doc_id
        WHERE d.text IS NOT NULL
        ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# Feature-hashing doc vectors — the hashing-trick bag-of-words embedding
# (Weinberger et al. 2009): token -> dimension h(token) mod D with a sign
# hash, L2-normalized.  The no-model bridge from the text table into the
# vectors/ANN family (cosine over these vectors approximates token-set
# similarity): at 100 TB this is how a corpus gets embeddings BEFORE any
# trained encoder exists.  Pure map-side — zero shuffles, one bincount per
# batch; collisions are part of the estimator, not an error.
# ---------------------------------------------------------------------------

FEATURE_HASH_DIM = 64


def q_feature_hash(sf_dir: str, dim: int = FEATURE_HASH_DIM):
    """-> (doc_id, n_tokens, norm, embedding float32-blob): signed-hash
    bag-of-words vector per non-null doc (L2-normalized; all-zero vectors
    stay zero), sorted by doc_id.  Rows-only for the driver (the hash is
    not SQL-portable); exact recompute oracle in
    tests/test_independent_oracles.py."""
    docs = _docs(sf_dir)

    def embed(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        toks = lst.flatten()
        h = hx.hash_strings(toks, seed=1729)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        mat = np.bincount(doc_of * dim + idx, weights=sign,
                          minlength=len(counts) * dim) \
            .reshape(len(counts), dim)
        norms = np.sqrt((mat * mat).sum(axis=1))
        mat = mat / np.where(norms > 0, norms, 1.0)[:, None]
        # float32 blob per row, not list<float>: keeps the row hashable
        # for the driver's order-insensitive compare and join-safe (the
        # same serialize-not-list discipline as stages/canonical.py)
        m32 = mat.astype(np.float32)
        emb = pa.array([m32[i].tobytes() for i in range(len(m32))],
                       pa.binary())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(counts),
            "norm": pa.array(round_half_away(norms, 4)),
            "embedding": emb,
        })

    return docs.map_batches(embed, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Corpus mixing to per-source quotas — the data-mixing sampler that builds a
# training blend: each source contributes exactly its quota of docs, chosen
# by a deterministic hash order (reproducible at any parallelism AND in
# SQL).  Distinct from q_group_cap (uniform K, longest-first) and
# q_weighted_sample (global weighted draw): here the quota VARIES per source
# — the "30% web, 20% code, ..." recipe — and selection is uniform-at-
# random within the source.
# ---------------------------------------------------------------------------

def _mix_quota(source: str) -> int:
    """Per-source doc quota — a pure function of the source name shared by
    the Ray path and the generated SQL oracle."""
    return 5 + 3 * (int(source.removeprefix("src")) % 4)


def q_corpus_mix(sf_dir: str):
    """-> (source, doc_id, n_chars): exactly quota(source) docs per source,
    selected by ascending multiplicative-hash uniform (tie: doc_id),
    sorted (source, doc_id).

    Scale shape: per-batch partial top-k at the GLOBAL max quota (a valid
    superset of any per-source selection), then a tiny exact per-source
    final select — the corpus never shuffles.
    """
    docs = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))

    def with_key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        u = ((ids.astype(np.uint64) * np.uint64(_WS_MULT) + np.uint64(7))
             % np.uint64(1 << 32)).astype(np.float64)
        u = (u + 1.0) / float((1 << 32) + 1)
        return t.append_column("mix_key", pa.array(u))

    def topk(t: pa.Table, exact: bool) -> pa.Table:
        if t.num_rows == 0:
            return t
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        key = t["mix_key"].to_numpy()
        ids = t["doc_id"].to_numpy()
        order = np.lexsort((ids, key, codes))
        cs = codes[order]
        starts = np.concatenate(([0], np.flatnonzero(cs[1:] != cs[:-1]) + 1))
        rank = np.arange(len(cs)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(cs)]))))
        if exact:
            quotas = np.array([_mix_quota(s.as_py())
                               for s in enc.dictionary])
            cap = quotas[cs]
        else:
            uniq = enc.dictionary
            cap = max(_mix_quota(s.as_py()) for s in uniq)
        return t.take(pa.array(np.sort(order[rank < cap])))

    out = docs.map_batches(lambda t: topk(with_key(t), exact=False),
                           batch_format="pyarrow") \
        .groupby("source").map_groups(lambda g: topk(g, exact=True),
                                      batch_format="pyarrow")
    return out.drop_columns(["mix_key"]).sort(["source", "doc_id"])


def corpus_mix_sql() -> str:
    import duckdb  # noqa: F401  (documentational: oracle runs in DuckDB)

    quotas = ", ".join(f"('src{i}', {_mix_quota(f'src{i}')})"
                       for i in range(20))
    return f"""
        WITH q(source, quota) AS (VALUES {quotas}),
        keyed AS (
          SELECT source, doc_id, n_chars,
                 ((doc_id * {_WS_MULT}::UBIGINT + 7) % 4294967296 + 1)
                     / 4294967297.0 AS mix_key
          FROM documents),
        r AS (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY mix_key, doc_id) AS rn
          FROM keyed)
        SELECT r.source, r.doc_id, r.n_chars
        FROM r JOIN q ON q.source = r.source
        WHERE r.rn <= q.quota
        ORDER BY r.source, r.doc_id
    """


# ---------------------------------------------------------------------------
# Token-budget corpus mixing — the tokens-not-docs quota variant of
# q_corpus_mix: mixture weights in LLM data blends are token budgets, so the
# selection is "take docs in the deterministic hash order until the source's
# token budget is exhausted" (a doc is kept iff the budget is not yet spent
# when it STARTS).  Exact, and the corpus never shuffles: the per-source
# prefix boundary is found by the histogram-bracketing pattern
# (functions/quantile.py) — (1) one narrow pass histograms token mass into
# hash-key buckets per source, (2) the tiny (sources × buckets) table
# locates each source's boundary bucket on the driver, (3) only the
# boundary buckets' rows (corpus/NB per source) collect for exact in-bucket
# resolution, (4) one broadcast-filter pass emits the kept prefix.  At
# larger scale step 3 recurses (re-bucket the boundary bucket) exactly like
# the quantile module; one level suffices at test scale and is documented.
# ---------------------------------------------------------------------------

TB_BUDGET = 700   # tokens per source — ~half a source's mass at test SFs
TB_BUCKETS = 256


def _tb_keyed(t: pa.Table) -> pa.Table:
    """(source, doc_id, n_tokens, key, bucket) — whitespace token count
    (same kernel as q_token_stats) + the corpus_mix multiplicative-hash
    uniform + its histogram bucket."""
    ids = t["doc_id"].to_numpy()
    u = ((ids.astype(np.uint64) * np.uint64(_WS_MULT) + np.uint64(7))
         % np.uint64(1 << 32)).astype(np.float64)
    key = (u + 1.0) / float((1 << 32) + 1)
    toks = pc.list_value_length(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t["text"]), r"\s+")).cast(pa.int64())
    bucket = np.minimum((key * TB_BUCKETS).astype(np.int64), TB_BUCKETS - 1)
    return pa.table({
        "source": t["source"],
        "doc_id": t["doc_id"],
        "n_tokens": toks,
        "key": pa.array(key),
        "bucket": pa.array(bucket),
    })


def q_token_budget_mix(sf_dir: str, budget: int = TB_BUDGET):
    """-> (source, doc_id, n_tokens): per-source prefix of the hash order
    whose cumulative token count stays under ``budget`` at each doc's
    start, sorted (source, doc_id)."""
    import ray
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, columns=("doc_id", "source", "text"))
    keyed = docs.map_batches(_tb_keyed, batch_format="pyarrow").materialize()

    # pass 1: (source, bucket) token-mass histogram — bounded take_all
    # (sources × TB_BUCKETS rows)
    def pre_agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "bucket"]).aggregate([("n_tokens", "sum")])
        return pa.table({"source": g["source"], "bucket": g["bucket"],
                         "tok": g["n_tokens_sum"]})

    hist = keyed.map_batches(pre_agg, batch_format="pyarrow") \
        .groupby(["source", "bucket"]) \
        .aggregate(Sum("tok", alias_name="tok")).take_all()

    # driver: per source, cumulative over sorted buckets -> boundary bucket
    # b* = first bucket whose END crosses the budget; buckets < b* are fully
    # kept, buckets > b* fully excluded (cum_before is monotone).
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_src.setdefault(r["source"], []).append((r["bucket"], r["tok"]))
    boundary: dict[str, tuple[int, int]] = {}   # source -> (b*, cum_before)
    for src, rows in by_src.items():
        cum = 0
        bstar, base = None, 0
        for b, tok in sorted(rows):
            if cum + tok >= budget:
                bstar, base = b, cum
                break
            cum += tok
        if bstar is not None:
            boundary[src] = (bstar, base)
        # else: total < budget -> whole source kept, no boundary

    # pass 2: ONLY boundary-bucket rows collect (corpus/NB per source) for
    # the exact in-bucket cutoff: the first doc with cum_before >= budget.
    bmap_ref = ray.put({s: b for s, (b, _) in boundary.items()})

    def only_boundary(t: pa.Table) -> pa.Table:
        bmap = ray.get(bmap_ref)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        want = np.array([bmap.get(s.as_py(), -1) for s in enc.dictionary],
                        np.int64)   # one lookup per DISTINCT source
        keep = want[enc.indices.to_numpy()] == t["bucket"].to_numpy()
        return t.filter(pa.array(keep))

    cutoffs: dict[str, tuple[float, int]] = {}  # source -> first EXCLUDED
    if boundary:
        brows = keyed.map_batches(only_boundary,
                                  batch_format="pyarrow").take_all()
        per_src: dict[str, list] = {}
        for r in brows:
            per_src.setdefault(r["source"], []).append(r)
        for src, rows in per_src.items():
            cum = boundary[src][1]
            for r in sorted(rows, key=lambda r: (r["key"], r["doc_id"])):
                if cum >= budget:
                    cutoffs[src] = (r["key"], r["doc_id"])
                    break
                cum += r["n_tokens"]
        # a boundary bucket whose docs all START under budget -> the first
        # excluded doc is in a LATER bucket; later buckets have
        # cum_before >= budget by construction of b*, so exclusion starts
        # at their first row: mark cutoff just past the boundary bucket.
        for src, (b, _) in boundary.items():
            cutoffs.setdefault(src, ((b + 1) / TB_BUCKETS, -1))

    cut_ref = ray.put(cutoffs)

    def final_filter(t: pa.Table) -> pa.Table:
        cut = ray.get(cut_ref)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        # one lookup per DISTINCT source; (inf, ·) = no cutoff = keep all
        ckey = np.array([cut.get(s.as_py(), (np.inf, 0))[0]
                         for s in enc.dictionary])
        cid = np.array([cut.get(s.as_py(), (np.inf, 0))[1]
                        for s in enc.dictionary], np.int64)
        codes = enc.indices.to_numpy()
        key = t["key"].to_numpy()
        ids = t["doc_id"].to_numpy()
        keep = (key < ckey[codes]) | \
            ((key == ckey[codes]) & (ids < cid[codes]))
        return t.filter(pa.array(keep)) \
            .select(["source", "doc_id", "n_tokens"])

    return keyed.map_batches(final_filter, batch_format="pyarrow") \
        .sort(["source", "doc_id"])


def token_budget_mix_sql(budget: int = TB_BUDGET) -> str:
    return rf"""
        WITH keyed AS (
          SELECT source, doc_id,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                 ((doc_id * {_WS_MULT}::UBIGINT + 7) % 4294967296 + 1)
                     / 4294967297.0 AS key
          FROM documents),
        c AS (
          SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY key, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS cum_before
          FROM keyed)
        SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM c WHERE coalesce(cum_before, 0) < {budget}
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Dedup accounting report — per-source doc/token retention after near-dup
# dedup: the numbers a data-mixing team actually reads before re-weighting
# a blend (dedup shifts source shares; this measures by how much).
# Composes q_near_dup_survivors' keep set with per-source token totals.
# ---------------------------------------------------------------------------

def q_dedup_token_report(sf_dir: str, num_parts: int | None = None):
    """-> (source, n_docs, n_kept, n_tokens, n_tokens_kept, doc_retention,
    token_retention), per-source totals before/after near-dup dedup
    (ratios rounded 4), sorted by source.

    Scale shape: the survivors keep-set is the small side (broadcast inside
    q_near_dup_survivors); per-doc token counts are map-side; both the
    "before" and "after" aggregates are partial-count reduces over narrow
    (source, counts) rows — the corpus streams exactly twice, shuffles
    never.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def doc_stats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ntok = pc.list_value_length(
            pc.split_pattern(col, pattern=" ")).to_numpy().astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "n_tok": pa.array(ntok)})

    stats = docs.map_batches(doc_stats, batch_format="pyarrow").materialize()

    def per_source(t: pa.Table) -> pa.Table:
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        ntok = t["n_tok"].to_numpy()
        nsrc = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=nsrc)
                          .astype(np.int64)),
            "tok": pa.array(np.bincount(codes, weights=ntok,
                                        minlength=nsrc).astype(np.int64)),
        })

    before = stats.map_batches(per_source, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n_docs"),
                                     Sum("tok", alias_name="n_tokens"))

    surv = q_near_dup_survivors(sf_dir).select_columns(["doc_id"])
    kept_stats = attach_columns(surv, stats, "doc_id", "doc_id",
                                {"source": "source", "n_tok": "n_tok"},
                                num_parts)
    after = kept_stats.map_batches(per_source, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n_kept"),
                                     Sum("tok", alias_name="n_tokens_kept"))

    joined = attach_columns(before, after, "source", "source",
                            {"n_kept": "n_kept",
                             "n_tokens_kept": "n_tokens_kept"},
                            num_parts, how="left")

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy().astype(np.float64)
        nk = pc.fill_null(t["n_kept"], 0).to_numpy().astype(np.float64)
        tt = t["n_tokens"].to_numpy().astype(np.float64)
        tk = pc.fill_null(t["n_tokens_kept"], 0) \
            .to_numpy().astype(np.float64)
        return pa.table({
            "source": t["source"],
            "n_docs": pa.array(nd.astype(np.int64)),
            "n_kept": pa.array(nk.astype(np.int64)),
            "n_tokens": pa.array(tt.astype(np.int64)),
            "n_tokens_kept": pa.array(tk.astype(np.int64)),
            "doc_retention": pa.array(
                round_half_away(nk / np.maximum(nd, 1), 4)),
            "token_retention": pa.array(
                round_half_away(tk / np.maximum(tt, 1), 4)),
        })

    return joined.map_batches(finish, batch_format="pyarrow").sort("source")


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph — the importance-weighted hub score
# (degree counts neighbors, triangles count cliques; PageRank weighs WHOSE
# neighbor you are).  Standard damped power iteration expressed Ray-Data-
# native: the edge stream is materialized ONCE, each iteration is one
# map_batches (join rank to edge source via a broadcast dict — ranks are
# node-sized model state, like k-means centroids) + one groupby Sum.
# Iterations are data-independent in count (fixed), so the whole loop is a
# deterministic pipeline.
# ---------------------------------------------------------------------------

def q_dup_graph_pagerank(sf_dir: str, k: int = 5, thresh: float = 0.7,
                         damping: float = 0.85, iters: int = 20):
    """-> (doc_id, pagerank): damped PageRank (rounded 6) of every node of
    the char-k-gram Jaccard >= thresh graph after ``iters`` power
    iterations (uniform init over graph nodes), sorted by doc_id.

    Scale note: ranks/degrees are broadcast per iteration (node-sized model
    state — the same discipline as kmeans centroids / IVF lists).  For
    graphs whose NODE TABLE outruns driver memory the rank join would move
    into the edge shuffle (attach_columns); the dup graph's node set is the
    duplicate subset of the corpus, orders of magnitude below row count.
    Parity vs an independent dense numpy power iteration is gated in
    tests/test_independent_oracles.py.
    """
    import ray
    from ray.data.aggregate import Sum

    edges = _graph_edges(sf_dir, k, thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        ids = np.concatenate((t["left_id"].to_numpy(),
                              t["right_id"].to_numpy()))
        return pa.table({"doc_id": pa.array(ids),
                         "n": pa.array(np.ones(len(ids), np.int64))})

    deg_rows = edges.map_batches(explode, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("n", alias_name="degree")) \
        .take_all()   # node-sized (dup subset), driver-safe by design
    nodes = np.array(sorted(r["doc_id"] for r in deg_rows), dtype=np.int64)
    deg = np.array([dict((r["doc_id"], r["degree"])
                         for r in deg_rows)[i] for i in nodes],
                   dtype=np.float64)
    n = len(nodes)
    if n == 0:
        import pandas as pd

        return pd.DataFrame({"doc_id": pa.array([], pa.int64()).to_pandas(),
                             "pagerank": pa.array([], pa.float64())
                             .to_pandas()})
    rank = np.full(n, 1.0 / n)

    for _ in range(iters):
        model_ref = ray.put((nodes, rank / deg))

        def contrib(t: pa.Table, _ref=model_ref) -> pa.Table:
            nd, rd = ray.get(_ref)
            l = t["left_id"].to_numpy()
            r = t["right_id"].to_numpy()
            # undirected: each edge sends mass both ways
            src = np.concatenate((l, r))
            dst = np.concatenate((r, l))
            w = rd[np.searchsorted(nd, src)]
            u, inv = np.unique(dst, return_inverse=True)
            return pa.table({
                "doc_id": pa.array(u),
                "m": pa.array(np.bincount(inv, weights=w)),
            })

        agg = edges.map_batches(contrib, batch_format="pyarrow") \
            .groupby("doc_id").aggregate(Sum("m", alias_name="mass")) \
            .take_all()
        mass = np.zeros(n)
        got = {r["doc_id"]: r["mass"] for r in agg}
        for j, node in enumerate(nodes):
            mass[j] = got.get(node, 0.0)
        rank = (1.0 - damping) / n + damping * mass

    import pandas as pd

    return pd.DataFrame({"doc_id": nodes,
                         "pagerank": np.round(rank, 6)})


# ---------------------------------------------------------------------------
# BPE merge training — tokenizer induction from corpus word counts: the
# standard pipeline (HF tokenizers, SentencePiece-BPE) trains on the WORD-
# FREQUENCY table, not the raw corpus, so the distributed part is exactly
# one partial-count groupby (corpus -> vocab-sized (word, count) table) and
# the merge loop runs over that model-sized state — the same discipline as
# kmeans centroids / PageRank ranks.  Merge loop itself is vectorized
# (np.unique pair counting weighted by word counts), not a dict crawl.
# ---------------------------------------------------------------------------

def _bpe_state(sf_dir: str, n_merges: int = 20):
    """Train BPE merges from corpus word counts; returns
    ``(merges, words, seqs)`` where ``merges`` is the learned
    [(rank, left, right, pair_count)] list, ``words`` the distinct
    marker-suffixed words, and ``seqs`` each word's FINAL symbol sequence
    after all merges — i.e. the word's BPE encoding (training applies
    merges leftmost-first in rank order, which is exactly what encoding
    does, so the end-of-training sequences ARE the encode table)."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir)

    def word_counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern=" ").flatten()
        part = pa.table({"word": toks}).group_by(["word"]) \
            .aggregate([("word", "count")])
        return pa.table({"word": part["word"], "n": part["word_count"]})

    wc = docs.map_batches(word_counts, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n")).take_all()
    # model-sized state from here on (vocab table, like centroids/ranks)
    words = [r["word"] + "_" for r in wc if r["word"]]
    counts = np.array([r["n"] for r in wc if r["word"]], dtype=np.int64)

    # symbol sequences as one flat int array + offsets; symbols interned
    sym_of: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in sym_of:
            sym_of[s] = len(sym_of)
        return sym_of[s]

    seqs = [np.array([intern(c) for c in w], dtype=np.int64)
            for w in words]
    merges = []
    for rank in range(n_merges):
        # vectorized weighted pair counting across all words
        pairs_l, pairs_r, w = [], [], []
        for s, c in zip(seqs, counts):
            if len(s) < 2:
                continue
            pairs_l.append(s[:-1])
            pairs_r.append(s[1:])
            w.append(np.full(len(s) - 1, c, dtype=np.int64))
        if not pairs_l:
            break
        pl = np.concatenate(pairs_l)
        pr = np.concatenate(pairs_r)
        ww = np.concatenate(w)
        key = pl * np.int64(len(sym_of) + 1) + pr
        u, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=ww).astype(np.int64)
        # best pair: max count, ties lexicographic by (left, right) string
        names = np.array(list(sym_of))
        ul = names[(u // (len(sym_of) + 1))]
        ur = names[(u % (len(sym_of) + 1))]
        order = np.lexsort((ur, ul, -tot))
        best = order[0]
        bl, br, bc = str(ul[best]), str(ur[best]), int(tot[best])
        merges.append((rank, bl, br, bc))
        new_sym = intern(bl + br)
        li, ri = sym_of[bl], sym_of[br]
        # apply the merge to every sequence (leftmost-first within a word)
        out = []
        for s in seqs:
            if len(s) < 2:
                out.append(s)
                continue
            hit = (s[:-1] == li) & (s[1:] == ri)
            if not hit.any():
                out.append(s)
                continue
            res = []
            j = 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == li and s[j + 1] == ri:
                    res.append(new_sym)
                    j += 2
                else:
                    res.append(s[j])
                    j += 1
            out.append(np.array(res, dtype=np.int64))
        seqs = out

    return merges, words, seqs


def q_bpe_train(sf_dir: str, n_merges: int = 20):
    """-> (merge_rank, left, right, pair_count): the first ``n_merges`` BPE
    merges learned from whitespace-word counts with end-of-word marker '_'
    (ties broken lexicographically by (left, right)), ordered by rank.

    Distributed shape: ONE groupby builds the (word, count) table; training
    state is vocab-sized.  Parity vs an independent dict-based BPE
    reference is gated in tests/test_independent_oracles.py.
    """
    import pandas as pd

    merges, _, _ = _bpe_state(sf_dir, n_merges)
    return pd.DataFrame(merges, columns=["merge_rank", "left", "right",
                                         "pair_count"])


# ---------------------------------------------------------------------------
# Distributed BPE ENCODE — the apply side of q_bpe_train (tokenize the whole
# corpus with the learned merges; the step that turns a filtered corpus into
# token counts for packing/budgeting).  Since BPE is word-internal, the
# corpus never needs the merge loop: the trainer's end-of-training symbol
# sequences ARE each distinct word's encoding, so the model is a vocab-sized
# word -> token-count table, broadcast ONCE via ray.put and probed per batch
# with one index_in + bincount — the centroid/broadcast discipline; document
# text never shuffles and no per-row Python runs in the corpus pass.
# ---------------------------------------------------------------------------


def q_bpe_encode(sf_dir: str, n_merges: int = 20):
    """-> (doc_id, n_words, n_tokens, tokens_per_word): per non-null doc,
    whitespace word count, total BPE token count under the learned merges,
    and the mean tokens-per-word ratio (rounded 4), sorted by doc_id."""
    import ray as _ray

    _, words, seqs = _bpe_state(sf_dir, n_merges)
    # strip the end-of-word marker for corpus lookup; model is vocab-sized
    model_ref = _ray.put((
        pa.array([w[:-1] for w in words]),
        np.array([len(s) for s in seqs], dtype=np.int64),
    ))

    class Encode:
        def __init__(self) -> None:
            self.words, self.ntok = _ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            txt = t["text"]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            t = t.filter(pc.is_valid(txt))
            if not len(t):
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_words": pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64()),
                                 "tokens_per_word": pa.array([], pa.float64())})
            col = t["text"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            la = pc.split_pattern(col, pattern=" ")
            parent = pc.list_parent_indices(la).to_numpy()
            flat = la.flatten()
            nonempty = pc.greater(pc.utf8_length(flat), 0)
            flat = flat.filter(nonempty)
            parent = parent[nonempty.to_numpy(zero_copy_only=False)]
            idx = pc.index_in(flat, value_set=self.words)
            pos = idx.to_numpy(zero_copy_only=False)
            # every corpus word is in the model (trained on this corpus);
            # guard anyway: unseen word falls back to char count + marker
            miss = np.isnan(pos) if pos.dtype.kind == "f" else (pos < 0)
            pos = np.where(miss, 0, pos).astype(np.int64)
            per_word = self.ntok[pos]
            if miss.any():
                lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
                per_word = np.where(miss, lens + 1, per_word)
            n_rows = len(t)
            n_words = np.bincount(parent, minlength=n_rows).astype(np.int64)
            n_tokens = np.bincount(
                parent, weights=per_word, minlength=n_rows).astype(np.int64)
            safe = np.maximum(n_words, 1).astype(np.float64)
            return pa.table({
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
                "tokens_per_word": round_half_away(
                    pa.array(n_tokens / safe), 4),
            })

    from who_owns_mass_processing_ray.stages import pool_bounds

    return _docs(sf_dir).map_batches(
        Encode, concurrency=pool_bounds(4),
        batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring — order-2 extension of q_ngram_logprob:
# P(w2|w1) = λ·c12/c1 + (1-λ)·(c2+1)/(T+V), all statistics from the corpus
# bigram table.  Model assembly (marginal attaches) happens on the VOCAB-
# SIZED bigram-count table; the corpus stream then pays exactly ONE
# composite-key join against the finished model — the fluency filter a
# curation pipeline runs when unigram scores stop separating quality.
# ---------------------------------------------------------------------------

_BILM_LAMBDA = 0.7


def q_bigram_logprob(sf_dir: str, lam: float = _BILM_LAMBDA,
                     num_parts: int | None = None):
    """-> (doc_id, n_bigrams, avg_logprob2): per doc with >= 2 tokens, the
    bigram count and mean log2 interpolated bigram probability (rounded 3),
    sorted by doc_id."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    docs = _docs(sf_dir)
    SEP = "\x1f"

    def doc_bigrams(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        vals = lst.flatten()
        offs = lst.offsets.to_numpy()
        offs = offs - offs[0]
        n = len(vals)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bg": pa.array([], pa.string())})
        keep = np.ones(n, dtype=bool)
        keep[np.maximum(offs[1:], 1) - 1] = False
        keep[n - 1] = False
        idx = np.flatnonzero(keep)
        ids = t["doc_id"].to_numpy()
        per_doc = np.diff(offs)
        doc_of = np.repeat(ids, per_doc)
        bg = pc.binary_join_element_wise(
            vals.take(pa.array(idx)).cast(pa.string()),
            vals.take(pa.array(idx + 1)).cast(pa.string()), SEP)
        return pa.table({"doc_id": pa.array(doc_of[idx]), "bg": bg})

    stream = docs.map_batches(doc_bigrams,
                              batch_format="pyarrow").materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        part = t.group_by(["bg"]).aggregate([("bg", "count")])
        return pa.table({"bg": part["bg"], "n": part["bg_count"]})

    model = stream.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("bg").aggregate(Sum("n", alias_name="c12")).materialize()

    def split_bg(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["bg"], pattern=SEP)
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        return pa.table({"bg": t["bg"], "c12": t["c12"],
                         "w1": w1, "w2": w2})

    model = model.map_batches(split_bg, batch_format="pyarrow") \
        .materialize()
    left = model.groupby("w1").aggregate(Sum("c12", alias_name="c1"))
    right = model.groupby("w2").aggregate(Sum("c12", alias_name="c2"))
    tv = model.map_batches(
        lambda t: pa.table({
            "t": pa.array([int(t["c12"].to_numpy().sum())
                           if t.num_rows else 0], pa.int64()),
            "v": pa.array([len(np.unique(np.asarray(
                t["w2"].to_pylist(), dtype=object)))
                if t.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all()
    T = sum(r["t"] for r in tv)
    # distinct right words across blocks: per-block distinct may overlap —
    # recompute V exactly with one tiny groupby over the model table
    V = right.count()

    model = attach_columns(model, left, "w1", "w1", {"c1": "c1"}, num_parts)
    model = attach_columns(model, right, "w2", "w2", {"c2": "c2"}, num_parts)

    scored_model = model.map_batches(
        lambda t: pa.table({
            "bg": t["bg"],
            "lp": pa.array(np.log2(
                lam * t["c12"].to_numpy() / t["c1"].to_numpy()
                + (1.0 - lam) * (t["c2"].to_numpy() + 1.0)
                / float(T + V))),
        }), batch_format="pyarrow")

    with_lp = attach_columns(stream, scored_model, "bg", "bg",
                             {"lp": "lp"}, num_parts)

    def per_doc(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "avg_logprob2": pa.array([], pa.float64())})
        g = g.sort_by([("doc_id", "ascending")])
        ids = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lp = np.add.reduceat(g["lp"].to_numpy(), starts)
        sizes = np.diff(np.append(starts, len(ids)))
        return pa.table({
            "doc_id": pa.array(ids[starts]),
            "n_bigrams": pa.array(sizes.astype(np.int64)),
            "avg_logprob2": pa.array(round_half_away(lp / sizes, 3)),
        })

    return with_lp.map_batches(
        lambda t: t.append_column(
            "part", pa.array((t["doc_id"].to_numpy()
                              % np.int64(num_parts)).astype(np.int32))),
        batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: per_doc(g.drop_columns(["part"])),
            batch_format="pyarrow").sort("doc_id")


def bigram_logprob_sql(lam: float = _BILM_LAMBDA) -> str:
    return f"""
        WITH ws AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE text IS NOT NULL),
        bg AS (
          SELECT doc_id, w[CAST(i AS INTEGER)] AS w1,
                 w[CAST(i AS INTEGER) + 1] AS w2
          FROM ws, unnest(range(1, len(w))) AS t(i)),
        c AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        l AS (SELECT w1, sum(c12) AS c1 FROM c GROUP BY 1),
        r AS (SELECT w2, sum(c12) AS c2 FROM c GROUP BY 1),
        n AS (SELECT sum(c12) AS t, count(DISTINCT w2) AS v FROM c),
        m AS (
          SELECT c.w1, c.w2,
                 log2({lam} * c.c12 / l.c1
                      + (1.0 - {lam}) * (r.c2 + 1.0) / (1.0 * n.t + n.v))
                     AS lp
          FROM c, n
          JOIN l ON l.w1 = c.w1
          JOIN r ON r.w2 = c.w2)
        SELECT bg.doc_id, count(*) AS n_bigrams,
               round(avg(m.lp), 3) AS avg_logprob2
        FROM bg JOIN m ON m.w1 = bg.w1 AND m.w2 = bg.w2
        GROUP BY bg.doc_id ORDER BY bg.doc_id
    """


# ---------------------------------------------------------------------------
# Zipf exponent fit — per-source power-law fit of the term frequency
# distribution (log2 freq vs log2 rank OLS): the corpus-statistics
# diagnostic that flags synthetic/spammy slices (natural text sits near
# slope -1; templated content is flatter or stepped).  Term counting is the
# no-corpus-shuffle partial-count shape; ranking runs per source on the
# vocab-sized count table; the fit is one sufficient-statistics pass
# (q_group_regression's recipe).
# ---------------------------------------------------------------------------

def q_zipf_fit(sf_dir: str):
    """-> (source, n_terms, zipf_slope, intercept, corr): per source, OLS
    of log2(term count) on log2(frequency rank) over all its terms (rank
    by count desc, term asc), rounded 6, sorted by source."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def term_counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        flat = pa.table({
            "source": src.take(pa.array(np.repeat(
                np.arange(len(counts)), counts))),
            "term": lst.flatten(),
        })
        part = flat.group_by(["source", "term"]).aggregate([("term", "count")])
        return pa.table({"source": part["source"], "term": part["term"],
                         "y": part["term_count"]})

    counts = docs.map_batches(term_counts, batch_format="pyarrow") \
        .groupby(["source", "term"]).aggregate(Sum("y", alias_name="y"))

    def fit(g: pa.Table) -> pa.Table:
        # one source's vocab: rank by (count desc, term asc), then the
        # sufficient-statistics OLS (same finish math as group_regression)
        s = g.sort_by([("y", "descending"), ("term", "ascending")])
        y = np.log2(s["y"].to_numpy().astype(np.float64))
        x = np.log2(np.arange(1, len(y) + 1, dtype=np.float64))
        n = float(len(y))
        sx, sy = x.sum(), y.sum()
        sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
        cov = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        slope = cov / varx
        return pa.table({
            "source": pa.array([s["source"][0].as_py()]),
            "n_terms": pa.array([len(y)], pa.int64()),
            "zipf_slope": pa.array(round_half_away(
                np.array([slope]), 6)),
            "intercept": pa.array(round_half_away(
                np.array([sy / n - slope * sx / n]), 6)),
            "corr": pa.array(round_half_away(
                np.array([cov / np.sqrt(varx * vary)]), 6)),
        })

    return counts.groupby("source").map_groups(
        fit, batch_format="pyarrow").sort("source")


def zipf_fit_sql() -> str:
    return """
        WITH w AS (
          SELECT source, unnest(string_split(text, ' ')) AS term
          FROM documents WHERE text IS NOT NULL),
        c AS (SELECT source, term, count(*) AS y FROM w GROUP BY 1, 2),
        r AS (
          SELECT source, y,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY y DESC, term) AS rank
          FROM c)
        SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
               round(regr_slope(log2(1.0 * y), log2(1.0 * rank)), 6)
                   AS zipf_slope,
               round(regr_intercept(log2(1.0 * y), log2(1.0 * rank)), 6)
                   AS intercept,
               round(corr(log2(1.0 * y), log2(1.0 * rank)), 6) AS corr
        FROM r GROUP BY source ORDER BY source
    """


# ---------------------------------------------------------------------------
# Cross-source duplication matrix — near-dup pair counts by source pair:
# the leakage diagnostic run before train/eval splits (a dup pair spanning
# two sources means those slices are NOT independent; high off-diagonal
# mass breaks held-out-source evaluation).  Pairs come from the exact
# AllPairs join; sources attach via the adaptive join (narrow id streams
# only).
# ---------------------------------------------------------------------------

def q_source_dup_matrix(sf_dir: str, k: int = 5, thresh: float = 0.7,
                        num_parts: int | None = None):
    """-> (src_a, src_b, n_pairs): near-dup pairs (char-k-gram Jaccard >=
    thresh) counted by unordered source pair (src_a <= src_b), sorted
    (src_a, src_b)."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    pairs = _graph_edges(sf_dir, k, thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow")
    src = _docs(sf_dir, columns=("doc_id", "source"))
    pairs = attach_columns(pairs, src, "left_id", "doc_id",
                           {"source": "sa"}, num_parts)
    pairs = attach_columns(pairs, src, "right_id", "doc_id",
                           {"source": "sb"}, num_parts)

    def partial(t: pa.Table) -> pa.Table:
        sa = np.asarray(t["sa"].to_pylist(), dtype=object)
        sb = np.asarray(t["sb"].to_pylist(), dtype=object)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        tt = pa.table({"src_a": pa.array(lo.tolist(), pa.string()),
                       "src_b": pa.array(hi.tolist(), pa.string())})
        part = tt.group_by(["src_a", "src_b"]).aggregate([("src_a", "count")])
        return pa.table({"src_a": part["src_a"], "src_b": part["src_b"],
                         "n": part["src_a_count"]})

    return pairs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]).aggregate(Sum("n", alias_name="n_pairs")) \
        .sort(["src_a", "src_b"])


def source_dup_matrix_sql(k: int = 5, thresh: float = 0.7) -> str:
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), {k}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS u
                FROM documents)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        e AS (
          SELECT i.l, i.r FROM inter i
          JOIN sz sa ON sa.doc_id = i.l
          JOIN sz sb ON sb.doc_id = i.r
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {thresh}
        ),
        s AS (
          SELECT least(da.source, db.source) AS src_a,
                 greatest(da.source, db.source) AS src_b
          FROM e
          JOIN documents da ON da.doc_id = e.l
          JOIN documents db ON db.doc_id = e.r
        )
        SELECT src_a, src_b, count(*) AS n_pairs
        FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Dup-cluster size histogram — the shape of the duplication problem: how
# many near-dup groups of each size exist and how many removable docs each
# size class holds (size-2 pairs vs big template families need different
# handling).  One tiny rollup of the components output.
# ---------------------------------------------------------------------------

def q_dup_size_histogram(sf_dir: str):
    """-> (group_size, n_groups, n_docs, n_removable): near-dup group-size
    histogram (removable = size - 1 per group), sorted by group_size."""
    from ray.data.aggregate import Count, Sum

    groups = q_near_dup_groups(sf_dir)    # (doc_id, group_id)
    sizes = groups.groupby("group_id").aggregate(
        Count(alias_name="size"))

    def partial(t: pa.Table) -> pa.Table:
        s = t["size"].to_numpy()
        u, cnt = np.unique(s, return_counts=True)
        return pa.table({
            "group_size": pa.array(u.astype(np.int64)),
            "n_groups": pa.array(cnt.astype(np.int64)),
            "n_docs": pa.array((u * cnt).astype(np.int64)),
            "n_removable": pa.array(((u - 1) * cnt).astype(np.int64)),
        })

    return sizes.map_batches(partial, batch_format="pyarrow") \
        .groupby("group_size").aggregate(
            Sum("n_groups", alias_name="n_groups"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_removable", alias_name="n_removable")) \
        .sort("group_size")


# ---------------------------------------------------------------------------
# Near-dup threshold curve — pair volume as a function of the Jaccard
# threshold, from ONE candidate-generation pass at the lowest τ: the tuning
# table that picks the production threshold (how many more pairs does
# τ=0.7 admit vs 0.8?) without re-running the join per candidate value.
# ---------------------------------------------------------------------------

def q_dup_threshold_curve(sf_dir: str, k: int = 5, base: float = 0.5):
    """-> (thresh, n_pairs): exact near-dup pair counts at each candidate
    threshold in {0.5, 0.55, ..., 0.95}, all derived from one pass at
    ``base``, sorted by thresh.  Counting uses the ROUNDED (4) jaccard so
    the boundary is deterministic across engines."""
    from ray.data.aggregate import Sum

    pairs = q_ngram_jaccard_pairs(sf_dir, k=k, thresh=base)
    ts = np.round(np.arange(base, 0.96, 0.05), 2)

    def partial(t: pa.Table) -> pa.Table:
        j = t["jaccard"].to_numpy()
        n = np.array([(j >= th).sum() for th in ts], dtype=np.int64)
        return pa.table({"thresh": pa.array(ts),
                         "n_pairs": pa.array(n)})

    return pairs.map_batches(partial, batch_format="pyarrow") \
        .groupby("thresh").aggregate(Sum("n_pairs", alias_name="n_pairs")) \
        .sort("thresh")


def dup_threshold_curve_sql(k: int = 5, base: float = 0.5) -> str:
    ts = ", ".join(f"({round(t, 2)})"
                   for t in np.round(np.arange(base, 0.96, 0.05), 2))
    return f"""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), {k}) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS u
                FROM documents)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        p AS (
          SELECT round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS j
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.l
          JOIN sz sb ON sb.doc_id = i.r
          WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= {base}
        ),
        t(thresh) AS (VALUES {ts})
        SELECT t.thresh,
               CAST(count(*) FILTER (WHERE p.j >= t.thresh) AS BIGINT)
                   AS n_pairs
        FROM t CROSS JOIN p
        GROUP BY t.thresh ORDER BY t.thresh
    """


# ---------------------------------------------------------------------------
# Language-label agreement — metadata QA: the ``lang`` column audited
# against the engine's own LangID predictions, per source.  High
# disagreement flags either mislabeled metadata or an out-of-domain slice
# — run before trusting lang for routing/filtering.  One actor-pool
# prediction pass + one partial-count reduce.
# ---------------------------------------------------------------------------

def q_lang_agreement(sf_dir: str):
    """-> (source, n_docs, n_agree, agree_rate): per source, docs whose
    LangID prediction equals the lang column (rate rounded 4), sorted by
    source.  Rows-only (LangID is actor-held model state); consistency vs
    a direct q_lang_id join is gated in tests."""
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.io_utils import read_parquet_clean
    from who_owns_mass_processing_ray.stages import pool_bounds

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang", "source"])

    class Agree(LangID):
        def __call__(self, t: pa.Table) -> pa.Table:
            pred = LangID.__call__(self, t)
            src = t["source"]
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            enc = pc.dictionary_encode(src)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy().astype(np.int64)
            agree = pc.equal(pred["lang_pred"], t["lang"])
            a = pc.fill_null(agree, False).to_numpy(zero_copy_only=False)
            nsrc = len(enc.dictionary)
            return pa.table({
                "source": enc.dictionary,
                "n": pa.array(np.bincount(codes, minlength=nsrc)
                              .astype(np.int64)),
                "n_agree": pa.array(np.bincount(
                    codes[a], minlength=nsrc).astype(np.int64)),
            })

    agg = docs.map_batches(Agree, batch_format="pyarrow", batch_size=256,
                           concurrency=pool_bounds(4), num_cpus=1) \
        .groupby("source").aggregate(Sum("n", alias_name="n_docs"),
                                     Sum("n_agree", alias_name="n_agree"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy().astype(np.float64)
        a = t["n_agree"].to_numpy().astype(np.float64)
        return t.append_column(
            "agree_rate", pa.array(round_half_away(a / np.maximum(n, 1), 4)))

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


# ---------------------------------------------------------------------------
# Domain coverage scoring — per-source fraction of the benchmark split's
# distinct word-5-grams that the source's (non-benchmark) docs contain: the
# coverage-driven mixing signal ("which slice best covers the target
# domain") — decontamination's constructive twin (same gram machinery, same
# hashed-int64 broadcast discipline: the benchmark side is 8 B/gram Arrow,
# never a Python set; the corpus streams).
# ---------------------------------------------------------------------------

def q_domain_coverage(sf_dir: str):
    """-> (source, n_covered, n_bench_grams, coverage): per source, how many
    of the benchmark's distinct word-5-grams appear in it (rate rounded 4),
    sorted by source."""
    import ray
    from ray.data.aggregate import Sum

    n, mod = DECON_GRAM_WORDS, DECON_BENCH_MOD

    def _split(t: pa.Table, bench_side: bool) -> pa.Table:
        m = t["doc_id"].to_numpy() % mod == 0
        return t.filter(pa.array(m if bench_side else ~m))

    def emit(t: pa.Table) -> pa.Table:
        _, grams = _word_grams(_split(t, True), n)
        gh = hx.hash_strings(pc.unique(grams), seed=DECON_HASH_SEED)
        return pa.table({"gh": pa.array(np.unique(gh).view(np.int64))})

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))
    gram_tables = [t for t in ray.get(docs.map_batches(
        emit, batch_format="pyarrow").materialize().to_arrow_refs())
        if t.num_rows]
    gh_all = (np.unique(np.concatenate(
        [t["gh"].to_numpy() for t in gram_tables]))
        if gram_tables else np.empty(0, np.int64))
    n_bench = len(gh_all)
    grams_ref = ray.put(pa.array(gh_all, pa.int64()))

    def covered(t: pa.Table) -> pa.Table:
        t = _split(t, False)
        idx, grams = _word_grams(t, n)
        gh = hx.hash_strings(grams, seed=DECON_HASH_SEED).view(np.int64)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        hit = pc.is_in(pa.array(gh, pa.int64()),
                       value_set=ray.get(grams_ref)) \
            .to_numpy(zero_copy_only=False)
        srcs = np.asarray(src.to_pylist(), dtype=object)[idx[hit]]
        ghh = gh[hit]
        key = {}
        # distinct (source, gram) within the batch, vectorized per source
        out_s, out_g = [], []
        for s in np.unique(srcs):
            m = srcs == s
            out_s.extend([s] * len(np.unique(ghh[m])))
            out_g.extend(np.unique(ghh[m]).tolist())
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "gh": pa.array(out_g, pa.int64())})

    from ray.data.aggregate import Count

    cov = docs.map_batches(covered, batch_format="pyarrow") \
        .groupby(["source", "gh"]).aggregate(Count(alias_name="ct")) \
        .map_batches(lambda t: pa.table({
            "source": t["source"],
            "n": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n_covered"))

    def finish(t: pa.Table) -> pa.Table:
        c = t["n_covered"].to_numpy().astype(np.float64)
        return pa.table({
            "source": t["source"],
            "n_covered": t["n_covered"],
            "n_bench_grams": pa.array(
                np.full(t.num_rows, n_bench, np.int64)),
            "coverage": pa.array(round_half_away(
                c / max(n_bench, 1), 4)),
        })

    return cov.map_batches(finish, batch_format="pyarrow").sort("source")


def domain_coverage_sql() -> str:
    n, mod = DECON_GRAM_WORDS, DECON_BENCH_MOD
    return f"""
        WITH tok AS (
          SELECT doc_id, source,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        ),
        g AS (
          SELECT doc_id, source,
                 unnest(list_transform(
                   range(1, greatest(len(w) - {n - 1}, 0) + 1),
                   i -> array_to_string(list_slice(w, i, i + {n - 1}), ' ')
                 )) AS gram
          FROM tok
        ),
        bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = 0),
        nb AS (SELECT count(*) AS n FROM bg),
        sg AS (
          SELECT DISTINCT source, gram FROM g WHERE doc_id % {mod} <> 0),
        c AS (
          SELECT sg.source, count(*) AS n_covered
          FROM sg JOIN bg USING (gram) GROUP BY 1)
        SELECT c.source, c.n_covered,
               CAST(nb.n AS BIGINT) AS n_bench_grams,
               round(c.n_covered * 1.0 / greatest(nb.n, 1), 4) AS coverage
        FROM c, nb
        ORDER BY c.source
    """


# ---------------------------------------------------------------------------
# Incremental clustering — fold NEW near-dup edges into an EXISTING cluster
# snapshot without re-clustering history: the union of (doc -> old root)
# star edges and the delta edge set feeds the same components reduce, so
# yesterday's 10^12-doc clustering is represented by its (narrow) assignment
# table, never its original edge set.  The incremental twin of
# q_delta_dedup at the CLUSTERING level: snapshots merge when a new edge
# bridges them.
# ---------------------------------------------------------------------------

def q_incremental_components(sf_dir: str, snap_thresh: float = 0.8,
                             new_thresh: float = 0.7, k: int = 5,
                             cfg: DedupConfig = DOCS_CFG):
    """-> (doc_id, group_id): cluster assignments after folding the
    lower-threshold (``new_thresh``) edge DELTA into the snapshot built at
    ``snap_thresh`` (snapshot = components of the >= snap_thresh graph,
    represented ONLY by its narrow (root -> doc) star edges — the
    assignment table a prior run persisted; delta = edges with
    new_thresh <= jaccard < snap_thresh), sorted by doc_id.  By union-find
    algebra the result equals clustering everything at new_thresh — which
    is exactly what the oracle checks, so the star-edge representation is
    verified, not assumed."""
    pairs = _graph_edges(sf_dir, k, new_thresh).materialize()

    # both component reduces route through the GATED _groups_from_pairs
    # (driver DSU below cfg.dsu_edge_limit, distributed star contraction
    # above) — no ungated driver edge collect (r4 verdict gate audit)
    snap = _groups_from_pairs(
        pairs.filter(expr=f"jaccard >= {snap_thresh}")
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow"), cfg)
    star = snap.map_batches(
        lambda t: pa.table({"left_id": t["group_id"],
                            "right_id": t["doc_id"]}),
        batch_format="pyarrow")
    delta = pairs.filter(expr=f"jaccard < {snap_thresh}") \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow")

    return _groups_from_pairs(star.union(delta), cfg).sort("doc_id")


# ---------------------------------------------------------------------------
# k-core of the near-dup graph — iterative peeling to the maximal subgraph
# of minimum degree k: the dense-boilerplate community detector one rung
# above triangles (a k-core survives even when hubs are removed).  Each
# peel round is one partial-degree reduce + one broadcast filter of the
# narrow edge stream; rounds to fixpoint are bounded by the peel depth,
# node state stays model-sized.
# ---------------------------------------------------------------------------

def q_dup_graph_kcore(sf_dir: str, core_k: int = 2, k: int = 5,
                      thresh: float = 0.5):
    """-> (doc_id, degree_in_core): members of the ``core_k``-core of the
    char-k-gram Jaccard >= thresh graph with their within-core degree,
    sorted by doc_id.  Parity vs an independent driver-side peeling is
    gated in tests/test_independent_oracles.py."""
    import ray
    from ray.data.aggregate import Sum

    edges = q_ngram_jaccard_pairs(sf_dir, k=k, thresh=thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()

    def degrees(ds):
        def explode(t: pa.Table) -> pa.Table:
            ids = np.concatenate((t["left_id"].to_numpy(),
                                  t["right_id"].to_numpy()))
            return pa.table({"doc_id": pa.array(ids),
                             "n": pa.array(np.ones(len(ids), np.int64))})

        return ds.map_batches(explode, batch_format="pyarrow") \
            .groupby("doc_id").aggregate(Sum("n", alias_name="degree"))

    cur = edges
    while True:
        deg_rows = degrees(cur).take_all()   # node-sized (dup subset)
        keep = np.array(sorted(r["doc_id"] for r in deg_rows
                               if r["degree"] >= core_k), dtype=np.int64)
        n_nodes = len(deg_rows)
        if len(keep) == n_nodes:
            break
        keep_ref = ray.put(pa.array(keep, pa.int64()))

        def filt(t: pa.Table, _ref=keep_ref) -> pa.Table:
            ks = ray.get(_ref)
            m = pc.and_(pc.is_in(t["left_id"], value_set=ks),
                        pc.is_in(t["right_id"], value_set=ks))
            return t.filter(m)

        cur = cur.map_batches(filt, batch_format="pyarrow").materialize()
        if len(keep) == 0:
            break

    import ray.data as rd

    final = degrees(cur).take_all()
    if not final:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "degree_in_core": pa.array([], pa.int64())}))
    final.sort(key=lambda r: r["doc_id"])
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in final], pa.int64()),
        "degree_in_core": pa.array([r["degree"] for r in final],
                                   pa.int64())}))


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law) — distinct-token count as the corpus
# grows in doc_id order: the diagnostic that sizes tokenizer vocabularies
# and detects synthetic slices (natural text grows ~ n^beta, templated text
# plateaus).  Order-free distributed form: a token's first appearance is
# min(doc_id) over its occurrences — one groupby-min over narrow
# (token-hash, doc) rows — and the curve at checkpoint c is the count of
# tokens with first_doc <= c: a bucket histogram + driver cumsum over
# checkpoint-sized state.
# ---------------------------------------------------------------------------

def q_vocab_growth(sf_dir: str, step: int = 50):
    """-> (docs_seen, vocab_size): distinct word-BIGRAM vocabulary size
    after each ``step``-doc checkpoint (doc_id order), sorted by
    docs_seen.  Bigrams, not unigrams: the synthetic corpus's ~31-word
    unigram vocabulary saturates within 10 docs, while its ~900 bigram
    types keep growing — the regime Heaps' law describes."""
    from ray.data.aggregate import Min

    docs = _docs(sf_dir)

    def token_first(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = t.filter(pc.is_valid(txt))
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(col, pattern=" ")
        vals = lst.flatten()
        offs = lst.offsets.to_numpy()
        offs = offs - offs[0]
        n = len(vals)
        if n == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "first_doc": pa.array([], pa.int64())})
        keep = np.ones(n, dtype=bool)
        keep[np.maximum(offs[1:], 1) - 1] = False
        keep[n - 1] = False
        idx = np.flatnonzero(keep)
        bg = pc.binary_join_element_wise(
            vals.take(pa.array(idx)).cast(pa.string()),
            vals.take(pa.array(idx + 1)).cast(pa.string()), " ")
        h = hx.hash_strings(bg, seed=77).view(np.int64)
        per_doc = np.diff(offs)
        doc = np.repeat(t["doc_id"].to_numpy(), per_doc)[idx]
        # in-batch min doc per token
        order = np.lexsort((doc, h))
        hs, ds = h[order], doc[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        return pa.table({"h": pa.array(hs[first]),
                         "first_doc": pa.array(ds[first])})

    firsts = docs.map_batches(token_first, batch_format="pyarrow") \
        .groupby("h").aggregate(Min("first_doc", alias_name="first_doc"))

    def bucket(t: pa.Table) -> pa.Table:
        b = (t["first_doc"].to_numpy() // step).astype(np.int64)
        u, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    rows = firsts.map_batches(bucket, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n", alias_name="n")).take_all()
    rows.sort(key=lambda r: r["bucket"])
    import pandas as pd

    buckets = [r["bucket"] for r in rows]
    counts = np.cumsum([r["n"] for r in rows])
    return pd.DataFrame({
        "docs_seen": [(b + 1) * step for b in buckets],
        "vocab_size": counts.astype(np.int64),
    })


def vocab_growth_sql(step: int = 50) -> str:
    return f"""
        WITH ws AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE text IS NOT NULL),
        w AS (
          SELECT doc_id,
                 w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1]
                     AS tok
          FROM ws, unnest(range(1, len(w))) AS t(i)),
        f AS (SELECT tok, min(doc_id) AS first_doc FROM w GROUP BY 1),
        b AS (
          SELECT (first_doc // {step}) AS bucket, count(*) AS n
          FROM f GROUP BY 1)
        SELECT (bucket + 1) * {step} AS docs_seen,
               CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
        FROM b ORDER BY docs_seen
    """


# ---------------------------------------------------------------------------
# Bridge detection on the near-dup graph — the over-merge audit for
# connected-components clustering.  Components is recall-safe but a single
# false-positive edge fuses two unrelated dup families; a BRIDGE whose
# removal leaves two large sides is exactly that suspect edge (the
# reference's fast-greedy would cut it; measured precision-1.0 vs
# fast-greedy notwithstanding, this surfaces the risk as an auditable
# artifact).  Scale shape: edges get their component id via the adaptive
# join, then ONE groupby ships each cluster's edges to one task; per-group
# work is Tarjan's linear-time bridge DFS (inherently sequential per
# cluster, like the DTW DP — cluster size is bounded upstream by the
# salting/caps of the candidate generators).
# ---------------------------------------------------------------------------

def _find_bridges(edges: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Iterative Tarjan bridges over one connected component's edge list
    -> [(u, v, subtree_size_of_far_side), ...] with original node labels."""
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for ei, (u, v) in enumerate(edges):
        ui, vi = idx[u], idx[v]
        adj[ui].append((vi, ei))
        adj[vi].append((ui, ei))
    disc = [0] * n
    low = [0] * n
    sub = [1] * n
    state = [0] * n   # next adj index to visit
    timer = 1
    out: list[tuple[int, int, int]] = []
    for root in range(n):
        if disc[root]:
            continue
        stack = [(root, -1)]   # (node, edge id used to enter)
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, in_edge = stack[-1]
            if state[u] < len(adj[u]):
                v, ei = adj[u][state[u]]
                state[u] += 1
                if ei == in_edge:
                    continue
                if disc[v]:
                    low[u] = min(low[u], disc[v])
                else:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, ei))
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    sub[p] += sub[u]
                    if low[u] > disc[p]:
                        a, b = edges[in_edge]
                        out.append((a, b, sub[u]))
    return out


def _find_articulation(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Iterative articulation points over one connected component's edges
    -> [(node, n_components_after_removal), ...] with original labels."""
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        adj[idx[u]].append(idx[v])
        adj[idx[v]].append(idx[u])
    disc = [0] * n
    low = [0] * n
    state = [0] * n
    # split_children[u]: DFS children v with low[v] >= disc[u] (each is a
    # component after removing u); the root's count is its child count
    split = [0] * n
    timer = 1
    out: list[tuple[int, int]] = []
    for root in range(n):
        if disc[root]:
            continue
        comp = [root]
        stack = [(root, -1)]
        disc[root] = low[root] = timer
        timer += 1
        root_children = 0
        while stack:
            u, parent = stack[-1]
            if state[u] < len(adj[u]):
                v = adj[u][state[u]]
                state[u] += 1
                if v == parent:
                    continue
                if disc[v]:
                    low[u] = min(low[u], disc[v])
                else:
                    disc[v] = low[v] = timer
                    timer += 1
                    if u == root:
                        root_children += 1
                    comp.append(v)
                    stack.append((v, u))
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if p != root and low[u] >= disc[p]:
                        split[p] += 1
        for i in comp:
            if i == root:
                if root_children >= 2:
                    out.append((nodes[i], root_children))
            elif split[i]:
                # split[i] children split off + the rest of the component
                out.append((nodes[i], split[i] + 1))
    return out


def q_dup_graph_articulation(sf_dir: str, k: int = 5, thresh: float = 0.3,
                             num_parts: int | None = None):
    """-> (doc_id, n_parts): articulation docs of the near-dup graph — the
    node-side over-merge audit (a doc similar to two otherwise-unrelated
    dup families is the classic false-merge cause; its removal splits the
    cluster into ``n_parts`` pieces).  Same scale shape as
    q_dup_graph_bridges; brute per-node-removal DSU parity in
    tests/test_independent_oracles.py."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Count  # noqa: F401 (sibling parity)

    from who_owns_mass_processing_ray.config import DedupConfig
    from who_owns_mass_processing_ray.stages.joins import attach_columns

    edges = _graph_edges(sf_dir, k, thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()
    assign = _groups_from_pairs(edges, DedupConfig()).materialize()
    labeled = attach_columns(edges, assign, "left_id", "doc_id",
                             {"group_id": "group_id"}, num_parts)

    def arts(g: pa.Table) -> pa.Table:
        el = list(zip(g["left_id"].to_pylist(), g["right_id"].to_pylist()))
        rows = _find_articulation(el)
        if not rows:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_parts": pa.array([], pa.int64())})
        d, np_ = (np.array(x, np.int64) for x in zip(*rows))
        return pa.table({"doc_id": pa.array(d),
                         "n_parts": pa.array(np_)})

    return labeled.groupby("group_id") \
        .map_groups(arts, batch_format="pyarrow") \
        .sort("doc_id")


def q_dup_graph_bridges(sf_dir: str, k: int = 5, thresh: float = 0.7,
                        num_parts: int | None = None):
    """-> (left_id, right_id, side_small, side_large): every bridge of the
    char-k-gram Jaccard >= thresh near-dup graph with the node counts of
    the two components its removal leaves, sorted (left_id, right_id).
    side_small >= 2 rows are the over-merge suspects.  Not SQL-expressible
    (DFS); brute-force oracle (per-edge-removal DSU recompute) + synthetic
    chain/clique/barbell property tests in tests/test_independent_oracles.py.
    """
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.config import DedupConfig
    from who_owns_mass_processing_ray.stages.joins import attach_columns

    edges = _graph_edges(sf_dir, k, thresh) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()
    assign = _groups_from_pairs(edges, DedupConfig()).materialize()
    labeled = attach_columns(edges, assign, "left_id", "doc_id",
                             {"group_id": "group_id"}, num_parts)

    # per-group sizes for the far-side complement (nodes, not edges)
    sizes = assign.groupby("group_id").aggregate(
        Count(alias_name="n_nodes"))
    labeled = attach_columns(labeled, sizes, "group_id", "group_id",
                             {"n_nodes": "n_nodes"}, num_parts)

    def bridges(g: pa.Table) -> pa.Table:
        el = list(zip(g["left_id"].to_pylist(), g["right_id"].to_pylist()))
        n_nodes = int(g["n_nodes"][0].as_py())
        rows = _find_bridges(el)
        if not rows:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "side_small": pa.array([], pa.int64()),
                             "side_large": pa.array([], pa.int64())})
        a, b, far = (np.array(x, np.int64) for x in zip(*rows))
        near = n_nodes - far
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({
            "left_id": pa.array(lo),
            "right_id": pa.array(hi),
            "side_small": pa.array(np.minimum(far, near)),
            "side_large": pa.array(np.maximum(far, near)),
        })

    return labeled.groupby("group_id") \
        .map_groups(bridges, batch_format="pyarrow") \
        .sort(["left_id", "right_id"])


# ---------------------------------------------------------------------------
# Modularity of the near-dup clustering — the graph-side quality metric
# (vector-side siblings: cluster purity/NMI).  Q = Σ_c [ e_c/m −
# (a_c/2m)² ] over the components partition of the Jaccard graph: high Q =
# clusters are denser than chance.  The reference's fast-greedy maximizes
# exactly this objective, so Q also quantifies how much headroom the
# components substitution leaves (measured precision vs fast-greedy is 1.0
# — BASELINE.md round 2).
# ---------------------------------------------------------------------------

def q_dup_graph_modularity(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """-> (n_groups, n_edges, modularity): one row — component count, edge
    count, and partition modularity (rounded 6) of the near-dup graph.

    Scale shape (r4 verdict gate audit): the component reduce routes
    through the GATED ``_groups_from_pairs``; per-group within-edge counts
    and degree sums are partial-aggregated distributed (attach group ids to
    edges, one groupby).  The only driver collect is the per-GROUP stat
    table — bounded by the number of dup clusters, orders of magnitude
    below the edge set — folded into the final scalar Q."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import joins

    pairs = _graph_edges(sf_dir, 5, 0.7) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow").materialize()
    m = pairs.count()
    if m == 0:
        return pd.DataFrame({"n_groups": [0], "n_edges": [0],
                             "modularity": [0.0]})
    assign = _groups_from_pairs(pairs, cfg).materialize()
    e2 = joins.attach_columns(pairs, assign, "left_id", "doc_id",
                              {"group_id": "gl"}, None)
    e2 = joins.attach_columns(e2, assign, "right_id", "doc_id",
                              {"group_id": "gr"}, None)

    def partial(t: pa.Table) -> pa.Table:
        gl = t["gl"].to_numpy()
        gr = t["gr"].to_numpy()
        # per-edge contributions: every endpoint adds 1 to its group's
        # degree sum; a within-group edge adds 1 to e_c
        groups = np.concatenate((gl, gr))
        deg = np.ones(len(groups), np.int64)
        ewin = np.concatenate((np.where(gl == gr, 1, 0),
                               np.zeros(len(gr), np.int64)))
        return pa.table({"group_id": pa.array(groups),
                         "deg": pa.array(deg),
                         "e_within": pa.array(ewin)})

    stats = e2.map_batches(partial, batch_format="pyarrow") \
        .groupby("group_id").aggregate(Sum("deg", alias_name="a_c"),
                                       Sum("e_within", alias_name="e_c"))
    # per-GROUP table: bounded by dup-cluster count (documented row bound)
    g = pa.concat_tables(
        [t for t in ray.get(stats.to_arrow_refs()) if t.num_rows])
    e_c = g["e_c"].to_numpy().astype(float)
    a_c = g["a_c"].to_numpy().astype(float)
    q = float((e_c / m - (a_c / (2.0 * m)) ** 2).sum())
    return pd.DataFrame({"n_groups": [g.num_rows], "n_edges": [m],
                         "modularity": [round(q, 6)]})


# ---------------------------------------------------------------------------
# Exact TF-IDF char-3-gram cosine pairs ≙ dedupe_cosine — the reference's
# ACTUAL similarity kernel (/root/reference/R/deduplicaters.R:313-378):
# quanteda tokens(what="character") |> tokens_ngrams(n=3) |> dfm |>
# dfm_tfidf() |> textstat_simil(method="cosine", min_simil=thresh).
#
# Semantics reproduced exactly: character 3-grams over the text with
# whitespace removed (quanteda's character tokenizer drops separators),
# tf = raw occurrence count, idf = log10(N / df) (quanteda dfm_tfidf
# default scheme), cosine over the weighted vectors, threshold 0.85
# (= COSINE_THRESH, /root/reference/config.R:28).  Elsewhere the engine
# SUBSTITUTES MinHash/LSH for this kernel (the scale path, SURVEY §7.0);
# this query proves the original kernel itself, oracle-hash-matched.
#
# Blocking is an EXACT AllPairs-style prefix filter adapted to cosine
# (Bayardo et al., WWW'07): order each doc's grams globally by (df, gram)
# ascending (rare first) and emit gram g as a blocking key only while the
# unit-normalized suffix norm from g onward is >= thresh.  Completeness:
# for any pair with cos >= τ, let g be the EARLIEST shared gram in the
# global order; by Cauchy-Schwarz cos <= ||ŵa over shared|| <= s_a(pos(g))
# (and symmetrically for b), so g must lie in BOTH prefixes and the pair
# meets in g's bucket.  Zero pairs are lost; zero-weight grams (df == N,
# idf == 0) are dropped outright since they contribute nothing to any dot
# product or norm.
#
# Scale: the df/idf table is VOCABULARY-bounded (char-3-gram vocab <=
# |alphabet|³ — tens of thousands of rows at any corpus size), so the
# broadcast via ray.put is safe at 100 TB; doc rows stream through
# map_batches; only narrow (gram, doc_id) prefix rows shuffle; hot buckets
# ride the shared salted-pair machinery (pairs_from_bucket_rows).
# ---------------------------------------------------------------------------

COSINE_K = 3                 # reference tokens_ngrams(n = 3)
COSINE_PAIR_THRESH = 0.85    # reference COSINE_THRESH (config.R:28)
_COSINE_SEED = 11


def _gram_tf(t: pa.Table, k: int, seed: int):
    """-> (doc_ids_rep, gram_vals, tf, distinct_per_doc): like
    _distinct_grams but also returns each gram's multiplicity."""
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.shingle_hashes(col, k, seed=seed)
    ids = t["doc_id"].to_numpy()
    doc_idx = np.repeat(np.arange(len(t)), np.diff(offs))
    order = np.lexsort((vals, doc_idx))
    v, d = vals[order], doc_idx[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = (v[1:] != v[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.r_[starts, len(v)]).astype(np.float64)
    v, d = v[first], d[first]
    counts = np.bincount(d, minlength=len(t))
    return ids[d], v, tf, counts


def _cosine_verify(batch: pa.Table, k: int, thresh: float, ref,
                   thresh_of=None) -> pa.Table:
    """Exact tf-idf cosine per candidate pair; distinct texts in the batch
    are vectorized/weighted ONCE (dictionary memoization, same design as
    jaccard_pairs_dict).  ``thresh_of(left_ids, right_ids)`` optionally
    supplies a PER-PAIR threshold array (dual-threshold class routing ≙
    dedupe_cosine_bounded's inds_thresh; np.inf excludes a pair)."""
    import ray as _ray

    sorted_grams, _dfv, idfv = _ray.get(ref)
    left, right = batch["left_text"], batch["right_text"]
    if isinstance(left, pa.ChunkedArray):
        left = left.combine_chunks()
    if isinstance(right, pa.ChunkedArray):
        right = right.combine_chunks()
    n = len(left)
    if n == 0:
        return pa.table({"left_id": pa.array([], pa.int64()),
                         "right_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    both = pa.concat_arrays([left.cast(pa.large_utf8()),
                             right.cast(pa.large_utf8())])
    enc = pc.fill_null(both, "").dictionary_encode()
    n_dict = len(enc.dictionary)
    vals, offs = hx.shingle_hashes(enc.dictionary, k, seed=_COSINE_SEED)
    seg = np.repeat(np.arange(n_dict), np.diff(offs))
    order = np.lexsort((vals, seg))
    v, s = vals[order], seg[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = (v[1:] != v[:-1]) | (s[1:] != s[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.r_[starts, len(v)]).astype(np.float64)
    v, s = v[first], s[first]
    w = tf * idfv[np.searchsorted(sorted_grams, v)]
    pos_w = w > 0
    v, s, w = v[pos_w], s[pos_w], w[pos_w]
    cnt = np.bincount(s, minlength=n_dict)
    doffs = np.zeros(n_dict + 1, np.int64)
    np.cumsum(cnt, out=doffs[1:])
    nrm2 = np.bincount(s, weights=w * w, minlength=n_dict)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lc, rc = codes[:n], codes[n:]
    cosv = np.zeros(n, dtype=np.float64)
    eq = (lc == rc) & (nrm2[lc] > 0)
    cosv[eq] = 1.0
    for i in np.flatnonzero(~eq):
        a0, a1 = doffs[lc[i]], doffs[lc[i] + 1]
        b0, b1 = doffs[rc[i]], doffs[rc[i] + 1]
        if a1 == a0 or b1 == b0:
            continue
        va, wa = v[a0:a1], w[a0:a1]
        vb, wb = v[b0:b1], w[b0:b1]
        if a1 - a0 > b1 - b0:
            va, wa, vb, wb = vb, wb, va, wa
        idx = np.searchsorted(vb, va)
        idx[idx == len(vb)] = len(vb) - 1
        m = vb[idx] == va
        if not m.any():
            continue
        dot = float((wa[m] * wb[idx[m]]).sum())
        cosv[i] = dot / float(np.sqrt(nrm2[lc[i]] * nrm2[rc[i]]))
    if thresh_of is not None:
        thr = thresh_of(batch["left_id"].to_numpy(),
                        batch["right_id"].to_numpy())
        keep = cosv >= thr
    else:
        keep = cosv >= thresh
    out = batch.filter(pa.array(keep))
    return pa.table({
        "left_id": out["left_id"],
        "right_id": out["right_id"],
        "cosine": pa.array(round_half_away(cosv[keep], 4)),
    })


def cosine_pairs_ds(ds, k: int = COSINE_K, thresh: float = COSINE_PAIR_THRESH,
                    thresh_of=None, candidate_filter=None):
    """Exact tf-idf cosine similarity join over any (doc_id, text) Dataset.
    See the section comment for the completeness proof of the prefix
    filter.  ``thresh`` is the BLOCKING threshold (use the minimum of all
    routed thresholds — completeness needs prefixes at the loosest bound);
    ``thresh_of`` routes per-pair verify thresholds; ``candidate_filter``
    prunes candidate pairs (narrow id rows) BEFORE text attach + verify."""
    import ray
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import pairs as pr

    seed = _COSINE_SEED

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        s = pc.replace_substring_regex(t["text"], r"\s+", "")
        keep = pc.greater(pc.utf8_length(s), 0)
        return pa.table({"doc_id": t["doc_id"],
                         "text": s}).filter(keep)

    docs = ds.map_batches(prep, batch_format="pyarrow")
    n_docs = docs.count()
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"left_id": pa.array([], pa.int64()),
                                       "right_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))

    def gram_rows(t: pa.Table) -> pa.Table:
        ids_rep, v, _, _ = _gram_tf(t, k, seed)
        return pa.table({
            "gram": pa.array(v.view(np.int64)),  # bit-cast: aggs lack uint64
            "doc_id": pa.array(ids_rep, pa.int64()),
        })

    # df table is vocabulary-bounded (<= |alphabet|^k rows) -> broadcast is
    # safe at ANY corpus size, unlike a per-doc table
    df_tbl = docs.map_batches(gram_rows, batch_format="pyarrow") \
        .groupby("gram").aggregate(Count(alias_name="df"))
    df_parts = [x for x in ray.get(df_tbl.to_arrow_refs()) if x.num_rows]
    df_all = pa.concat_tables(df_parts).combine_chunks()
    gv = df_all["gram"].to_numpy().view(np.uint64)
    order = np.argsort(gv)
    sorted_grams = gv[order].copy()
    dfv = df_all["df"].to_numpy()[order].astype(np.float64)
    idfv = np.log10(float(n_docs) / dfv)
    ref = ray.put((sorted_grams, dfv, idfv))

    def prefix_rows(t: pa.Table) -> pa.Table:
        sg, dfl, idfl = ray.get(ref)
        ids_rep, v, tf, counts = _gram_tf(t, k, seed)
        pos = np.searchsorted(sg, v)
        w = tf * idfl[pos]
        dfp = dfl[pos]
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        keep0 = w > 0                      # idf == 0 grams affect nothing
        v, ids_rep, doc_idx = v[keep0], ids_rep[keep0], doc_idx[keep0]
        w, dfp = w[keep0], dfp[keep0]
        if not len(v):
            return pa.table({"bucket_key": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        norms2 = np.bincount(doc_idx, weights=w * w, minlength=len(counts))
        what2 = (w * w) / norms2[doc_idx]  # unit-normalized squared weights
        order = np.lexsort((v, dfp, doc_idx))
        v, ids_rep, doc_idx = v[order], ids_rep[order], doc_idx[order]
        what2 = what2[order]
        cnt2 = np.bincount(doc_idx, minlength=len(counts))
        offs = np.zeros(len(cnt2) + 1, np.int64)
        np.cumsum(cnt2, out=offs[1:])
        gcs = np.cumsum(what2)
        seg_first = np.repeat(offs[:-1], cnt2)
        # within-doc sum of positions < i
        before = (gcs - what2) - (gcs[seg_first] - what2[seg_first])
        total = np.bincount(doc_idx, weights=what2, minlength=len(counts))
        suffix2 = total[doc_idx] - before
        keep = suffix2 >= (thresh * thresh) - 1e-9
        return pa.table({
            "bucket_key": pa.array(v[keep]),
            "doc_id": pa.array(ids_rep[keep], pa.int64()),
            "snorm": pa.array(np.sqrt(suffix2[keep])),
        })

    # Positional (PPJoin-style) candidate prune, COMPLETE: for a pair with
    # cos >= τ, its earliest shared gram g* sits in both prefixes and
    # Cauchy-Schwarz gives cos <= s_a(g*)·s_b(g*), so the MAX over the
    # pair's bucket co-occurrences of the suffix-norm product is >= τ.
    # Pairs whose max product stays below τ cannot qualify and never ship
    # text or reach verify.  (Measured on the zipf sf0.1 corpus: 7.78 M
    # raw candidates -> far fewer verified; see BASELINE.md.)
    def expand_with_prune(group: pa.Table) -> pa.Table:
        tbl = group.sort_by([("bucket_key", "ascending"),
                             ("doc_id", "ascending")])
        keys = tbl["bucket_key"].to_numpy()
        if not len(keys):
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64())})
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(keys)])))
        seg_of_pair, li, lj, _dropped = pr._triangular_pairs(sizes, 100_000)
        base = starts[seg_of_pair]
        left_idx, right_idx = base + li, base + lj
        ids = tbl["doc_id"].to_numpy()
        sn = tbl["snorm"].to_numpy()
        prod = sn[left_idx] * sn[right_idx]
        l, r = ids[left_idx], ids[right_idx]
        order = np.lexsort((r, l))
        ls, rs, ps = l[order], r[order], prod[order]
        seg = np.flatnonzero(np.r_[True, (ls[1:] != ls[:-1])
                                   | (rs[1:] != rs[:-1])])
        maxp = np.maximum.reduceat(ps, seg)
        keep = maxp >= thresh - 1e-9
        return pa.table({
            "left_id": pa.array(ls[seg][keep], pa.int64()),
            "right_id": pa.array(rs[seg][keep], pa.int64()),
        })

    from who_owns_mass_processing_ray.stages import auto_parts

    gram_parts = np.uint64(auto_parts())   # cluster-derived shuffle widths
    pair_parts = np.uint64(auto_parts())

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["bucket_key"].to_numpy() % gram_parts).astype(np.int32)
        return t.append_column("part", pa.array(part))

    prefixes = docs.map_batches(prefix_rows, batch_format="pyarrow")
    cand = prefixes.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: expand_with_prune(g.drop_columns(["part"])),
            batch_format="pyarrow")
    if candidate_filter is not None:
        cand = cand.map_batches(candidate_filter, batch_format="pyarrow")

    # global narrow-pair dedup BEFORE text attach: unlike the LSH flagship
    # (3.5% duplication — global dedup measured a LOSS there, BASELINE.md),
    # gram-bucket candidates recur across partitions heavily (measured 24%
    # at sf0.1, and 8x among verified rows pre-dedup); dropping them here
    # avoids shipping duplicate ~1 KB text pairs and re-verifying them,
    # and makes the verified set unique by construction (no post groupby).
    def pre_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int32()))
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        key = l.astype(np.uint64) * np.uint64(1 << 32) ^ r.astype(np.uint64)
        part = (hx.splitmix64(key) % pair_parts).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def distinct_part(g: pa.Table) -> pa.Table:
        l = g["left_id"].to_numpy()
        r = g["right_id"].to_numpy()
        o = np.lexsort((r, l))
        ls, rs = l[o], r[o]
        seg = np.flatnonzero(np.r_[True, (ls[1:] != ls[:-1])
                                   | (rs[1:] != rs[:-1])])
        return pa.table({"left_id": pa.array(ls[seg], pa.int64()),
                         "right_id": pa.array(rs[seg], pa.int64())})

    cand = cand.map_batches(pre_part, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: distinct_part(g.drop_columns(["part"])),
            batch_format="pyarrow")
    cand = pr.attach_pair_features(cand, docs, "text", side_key="doc_id")
    out = cand.map_batches(_cosine_verify,
                           fn_kwargs={"k": k, "thresh": thresh, "ref": ref,
                                      "thresh_of": thresh_of},
                           batch_format="pyarrow",
                           batch_size=DOCS_CFG.verify_batch_size)
    return out.sort(["left_id", "right_id"])


def q_tfidf_cosine_pairs(sf_dir: str):
    """The reference's dedupe_cosine pair generation, exactly
    (/root/reference/R/deduplicaters.R:313-358): tf-idf-weighted char-3-gram
    cosine >= 0.85 over the documents table."""
    return cosine_pairs_ds(_docs(sf_dir))


def tfidf_cosine_pairs_body_sql(k: int = COSINE_K,
                                thresh: float = COSINE_PAIR_THRESH) -> str:
    """The pair oracle WITHOUT a trailing ORDER BY, for embedding in
    composed oracles' CTEs (textual surgery on the ordered form was
    brittle — ADVICE r4)."""
    # short docs (0 < len < k) get one whole-string gram on both sides
    # (substr(s, 1, k) == s when len < k; shingle_hashes' whole-string
    # convention) — strings of different length never collide
    return f"""
        WITH t AS (
            SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS s
            FROM documents WHERE text IS NOT NULL),
        g AS (
            SELECT doc_id, substr(s, CAST(u AS INTEGER), {k}) AS gram,
                   count(*) AS tf
            FROM (SELECT doc_id, s,
                         unnest(range(1, greatest(length(s) - {k - 1},
                                      least(length(s), 1)) + 1)) AS u
                  FROM t)
            GROUP BY 1, 2),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM g),
        idf AS (SELECT gram, log10((SELECT n FROM nd) * 1.0 / count(*))
                       AS idf
                FROM g GROUP BY gram),
        w AS (SELECT g.doc_id, g.gram, g.tf * i.idf AS w
              FROM g JOIN idf i USING (gram) WHERE i.idf > 0),
        nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY 1),
        dot AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       sum(a.w * b.w) AS d
                FROM w a JOIN w b ON a.gram = b.gram
                                 AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT d.left_id, d.right_id,
               round(d.d / (na.nn * nb.nn), 4) AS cosine
        FROM dot d
        JOIN nrm na ON na.doc_id = d.left_id
        JOIN nrm nb ON nb.doc_id = d.right_id
        WHERE d.d / (na.nn * nb.nn) >= {thresh}
    """


def tfidf_cosine_pairs_sql(k: int = COSINE_K,
                           thresh: float = COSINE_PAIR_THRESH) -> str:
    return tfidf_cosine_pairs_body_sql(k, thresh) + "ORDER BY 1, 2"


def q_cosine_clusters(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """dedupe_cosine END TO END (/root/reference/R/deduplicaters.R:313-378):
    exact tf-idf cosine pairs -> connected components -> (doc_id, group_id)
    for every member of a multi-doc group.  Components stand in for igraph
    fast-greedy (measured precision 1.0 on dup structure — BASELINE.md);
    the reduce is edge-limit gated exactly like q_near_dup_groups."""
    return _groups_from_pairs(cosine_pairs_ds(_docs(sf_dir)), cfg)


def cosine_clusters_sql() -> str:
    base = tfidf_cosine_pairs_body_sql()
    return f"""
        WITH RECURSIVE base AS ({base}),
        sym(a, b) AS (
            SELECT left_id, right_id FROM base
            UNION ALL
            SELECT right_id, left_id FROM base
        ),
        reach(id, r) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        )
        SELECT id AS doc_id, min(r) AS group_id
        FROM reach GROUP BY id ORDER BY doc_id
    """


def _parity_cross_filter(t: pa.Table) -> pa.Table:
    """Keep only candidate pairs spanning the even/odd table split —
    pruned BEFORE text attach, so same-side pairs never ship text."""
    l = t["left_id"].to_numpy()
    r = t["right_id"].to_numpy()
    return t.filter(pa.array((l % 2) != (r % 2)))


def q_cosine_cross_link(sf_dir: str):
    """``dedupe_cosine_join`` with the reference's TRUE kernel
    (/root/reference/R/deduplicaters.R:380-444): tf-idf char-3-gram cosine
    >= 0.85 pairs linking table A (even doc_ids) to table B (odd doc_ids)
    — the owners↔companies cross-table link, oriented (a_id, b_id).
    q_cross_table_link is the MinHash/Jaccard scale substitution of the
    same chain; this query proves the literal kernel, oracle-matched."""
    from ray.data.aggregate import Max

    pairs = cosine_pairs_ds(_docs(sf_dir),
                            candidate_filter=_parity_cross_filter)

    def orient(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        a = np.where(l % 2 == 0, l, r)
        b = np.where(l % 2 == 0, r, l)
        return pa.table({"a_id": pa.array(a, pa.int64()),
                         "b_id": pa.array(b, pa.int64()),
                         "cosine": t["cosine"]})

    return pairs.map_batches(orient, batch_format="pyarrow") \
        .groupby(["a_id", "b_id"]).aggregate(Max("cosine",
                                                 alias_name="cosine")) \
        .sort(["a_id", "b_id"])


def cosine_cross_link_sql() -> str:
    base = tfidf_cosine_pairs_sql()
    return base.replace(
        "AND a.doc_id < b.doc_id",
        "AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1",
    ).replace("AS left_id", "AS a_id").replace("AS right_id", "AS b_id") \
     .replace("d.left_id", "d.a_id").replace("d.right_id", "d.b_id")


def _bounded_cosine_thresh(l_ids: np.ndarray, r_ids: np.ndarray) -> np.ndarray:
    """Per-pair routed thresholds ≙ dedupe_cosine_bounded's COSINE_THRESH /
    inds_thresh split (/root/reference/R/deduplicaters.R:446-539 +
    config.R:28-29): inst class (doc_id % 3 == 0, the established stand-in
    for the inst|trust flag) pairs at 0.85, individual pairs at 0.95,
    cross-class pairs never merge (inf)."""
    l_inst = l_ids % 3 == 0
    r_inst = r_ids % 3 == 0
    thr = np.where(l_inst, BOUND_INST_THRESH, BOUND_IND_THRESH)
    return np.where(l_inst == r_inst, thr, np.inf)


def q_cosine_bounded(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """``dedupe_cosine_bounded`` with the TRUE kernel, end to end
    (/root/reference/R/deduplicaters.R:446-539): class-routed tf-idf
    cosine pairs (0.85 inst / 0.95 ind, never cross-class) -> GLOBAL
    per-class cosine components (the reference clusters first) -> compound
    (bounding_key, cosine_group) intersection — similarity merges only
    within a shared bounding key.  The bound is DERIVED FROM THE RECORD
    like the reference's standardized address (first whitespace token ≙
    addr_id; an independent attribute like ``source`` would make every
    compound group a singleton).  Emits every member of a multi-doc
    compound group with group id = min member doc_id.
    q_bounded_near_dup is the Jaccard∧Hamming scale substitution; this is
    the literal chain, oracle-matched."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from who_owns_mass_processing_ray.stages import joins

    pairs = cosine_pairs_ds(_docs(sf_dir),
                            thresh=BOUND_INST_THRESH,  # loosest: complete
                            thresh_of=_bounded_cosine_thresh)
    assign = _groups_from_pairs(pairs, cfg)           # (doc_id, group_id)
    docs_bound = _docs(sf_dir)
    with_bound = joins.attach_columns(assign, docs_bound, "doc_id", "doc_id",
                                      {"text": "text"}, None, how="inner")

    def compound_key(t: pa.Table) -> pa.Table:
        tok = pc.struct_field(
            pc.extract_regex(pc.fill_null(t["text"], ""), r"^(?P<tok>\S+)"),
            "tok")
        sk = hx.hash_strings(pc.fill_null(tok, ""))
        gk = t["group_id"].to_numpy()
        ck = hx.splitmix64(sk ^ gk.view(np.uint64)).view(np.int64)
        return pa.table({"doc_id": t["doc_id"], "group_id": t["group_id"],
                         "ckey": pa.array(ck)})

    keyed = with_bound.map_batches(compound_key, batch_format="pyarrow") \
        .materialize()   # consumed twice (group table + member attach)
    groups = keyed.groupby("ckey").aggregate(
        Min("doc_id", alias_name="bound_group_id"),
        Count(alias_name="n_members"))
    groups = groups.filter(expr="n_members > 1")
    out = joins.attach_columns(keyed, groups, "ckey", "ckey",
                               {"bound_group_id": "bound_group_id",
                                "n_members": "n_members"}, None, how="inner")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "bound_group_id": t["bound_group_id"].cast(pa.int64()),
            "n_members": t["n_members"].cast(pa.int64()),
        })

    out = out.map_batches(project, batch_format="pyarrow")
    if out.count() == 0:     # typed empty result (schema survives)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "bound_group_id": pa.array([], pa.int64()),
            "n_members": pa.array([], pa.int64())}))
    return out.sort("doc_id")


def _bounded_cosine_pairs_sql() -> str:
    """Routed pair CTE body (no trailing ORDER BY): same tf-idf base with
    class routing folded into the join + threshold."""
    base = tfidf_cosine_pairs_body_sql()
    base = base.replace(
        "AND a.doc_id < b.doc_id",
        "AND a.doc_id < b.doc_id AND (a.doc_id % 3 = 0) = (b.doc_id % 3 = 0)")
    return base.replace(
        f">= {COSINE_PAIR_THRESH}",
        f">= CASE WHEN d.left_id % 3 = 0 THEN {BOUND_INST_THRESH} "
        f"ELSE {BOUND_IND_THRESH} END")


def cosine_bounded_sql() -> str:
    return f"""
        WITH RECURSIVE base AS ({_bounded_cosine_pairs_sql()}),
        sym(a, b) AS (
            SELECT left_id, right_id FROM base
            UNION ALL
            SELECT right_id, left_id FROM base
        ),
        reach(id, r) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        ),
        grp AS (SELECT id AS doc_id, min(r) AS cg FROM reach GROUP BY id),
        cmp AS (SELECT g.doc_id,
                       regexp_extract(d.text, '^(\\S+)', 1) AS bound_key,
                       g.cg
                FROM grp g JOIN documents d USING (doc_id)),
        bg AS (SELECT bound_key, cg, min(doc_id) AS bound_group_id,
                      count(*) AS n_members
               FROM cmp GROUP BY 1, 2 HAVING count(*) > 1)
        SELECT c.doc_id, b.bound_group_id, b.n_members
        FROM cmp c JOIN bg b ON b.bound_key = c.bound_key AND b.cg = c.cg
        ORDER BY c.doc_id
    """


# ---------------------------------------------------------------------------
# Distributed logistic-regression quality filter — model-BASED curation
# beyond the rule-based quality_score heuristics (the CCNet/fastText-style
# "train a small classifier, score every doc" stage of a training-data
# pipeline).  Fitting is IRLS/Newton with RIDGE, distributed the standard
# GLM way (one streaming pass per iteration): each batch contributes its
# 5x5 Gram X'WX and 5-vector X'Wz sufficient statistics; the driver solves
# the 5x5 system.  No driver-side row collection ever — per-iteration
# reduce payload is 30 floats per batch regardless of corpus size, and the
# final scoring pass streams.  Fully deterministic (fixed iterations, no
# RNG); labels are lang=='en' so the fit is reproducible from the table.
# ---------------------------------------------------------------------------

_LR_RIDGE = 1e-3
_LR_ITERS = 6
_LR_STOPWORDS = r"\b(the|a|of|and|in|to|is|on|for|with)\b"


def _lr_feature_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """-> (X[n,5], y[n], doc_id): intercept, mean word len, punct ratio,
    stopword ratio, log1p(n_chars)."""
    t = t.filter(pc.is_valid(t["text"]))
    txt = t["text"]
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    toks = pc.list_value_length(pc.utf8_split_whitespace(txt)) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    toks = np.maximum(toks, 1.0)
    punct = pc.count_substring_regex(txt, r"[^\w\s]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    stop = pc.count_substring_regex(pc.utf8_lower(txt), _LR_STOPWORDS) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    mean_wl = (n_chars - (toks - 1.0)) / toks
    X = np.stack([np.ones(len(n_chars)), mean_wl,
                  punct / np.maximum(n_chars, 1.0), stop / toks,
                  np.log1p(n_chars)], axis=1)
    y = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    return X, y, t["doc_id"]


def fit_quality_lr(ds, iters: int = _LR_ITERS, ridge: float = _LR_RIDGE
                   ) -> np.ndarray:
    """IRLS fit over a (doc_id, text, lang) Dataset -> beta[5]."""
    beta = np.zeros(5, dtype=np.float64)
    for _ in range(iters):
        b = beta.copy()

        def partials(t: pa.Table, _b=b) -> pa.Table:
            X, y, _ = _lr_feature_matrix(t)
            eta = X @ _b
            p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30)))
            w = np.maximum(p * (1.0 - p), 1e-6)
            z = eta + (y - p) / w
            G = X.T @ (X * w[:, None])          # 5x5
            v = X.T @ (w * z)                   # 5
            flat = np.concatenate([G.reshape(-1), v])
            return pa.table({f"s{i}": pa.array([flat[i]])
                             for i in range(30)})

        sums = ds.map_batches(partials, batch_format="pyarrow") \
            .sum([f"s{i}" for i in range(30)])
        flat = np.array([sums[f"sum(s{i})"] for i in range(30)])
        G = flat[:25].reshape(5, 5) + ridge * np.eye(5)
        beta = np.linalg.solve(G, flat[25:])
    return beta


def q_quality_lr_filter(sf_dir: str):
    """-> (doc_id, p_en, pred): per-doc probability from the distributed
    IRLS logistic fit of lang=='en' on the rule-based quality features —
    sorted, rounded 4.  Rows-only for the driver (iterative model fitting
    is not SQL-expressible); full-batch numpy IRLS parity + accuracy gate
    in tests/test_independent_oracles.py."""
    ds = _docs(sf_dir, columns=("doc_id", "text", "lang"))
    beta = fit_quality_lr(ds)

    def score(t: pa.Table) -> pa.Table:
        X, _, ids = _lr_feature_matrix(t)
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ beta, -30, 30)))
        return pa.table({
            "doc_id": ids,
            "p_en": pa.array(round_half_away(p, 4)),
            "pred": pa.array(p >= 0.5),
        })

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_cosine_metacorps(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """The ``metacorps_cosine`` output table with the TRUE kernel
    (/root/reference/R/deduplicaters.R:1032-1075 + dedupe_text_mode
    :290-311): cosine clusters -> per-cluster canonical text election
    (the MODE text; ties break to the lexicographically smallest text —
    the deterministic replacement for the reference's arrange-order
    dependence, SURVEY §4) plus member count.
    -> (group_id, n_members, canonical_text), sorted by group_id."""
    from who_owns_mass_processing_ray.stages import joins

    assign = _groups_from_pairs(cosine_pairs_ds(_docs(sf_dir)), cfg)
    with_text = joins.attach_columns(assign, _docs(sf_dir), "doc_id",
                                     "doc_id", {"text": "text"}, None,
                                     how="inner")

    def elect(g: pa.Table) -> pa.Table:
        txt = g["text"].to_pylist()
        vals, counts = np.unique(np.array(txt, dtype=object),
                                 return_counts=True)
        i = np.lexsort((vals, -counts))[0]   # max count, tie min text
        return pa.table({
            "group_id": pa.array([g["group_id"][0].as_py()], pa.int64()),
            "n_members": pa.array([g.num_rows], pa.int64()),
            "canonical_text": pa.array([str(vals[i])], pa.string()),
        })

    return with_text.groupby("group_id").map_groups(
        elect, batch_format="pyarrow").sort("group_id")


def cosine_metacorps_sql() -> str:
    base = tfidf_cosine_pairs_body_sql()
    return f"""
        WITH RECURSIVE base AS ({base}),
        sym(a, b) AS (
            SELECT left_id, right_id FROM base
            UNION ALL
            SELECT right_id, left_id FROM base
        ),
        reach(id, r) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        ),
        grp AS (SELECT id AS doc_id, min(r) AS group_id
                FROM reach GROUP BY id),
        m AS (SELECT g.group_id, d.text, count(*) AS ct
              FROM grp g JOIN documents d USING (doc_id)
              GROUP BY 1, 2),
        sz AS (SELECT group_id, CAST(count(*) AS BIGINT) AS n_members
               FROM grp GROUP BY 1)
        SELECT m.group_id, sz.n_members, m.text AS canonical_text
        FROM m JOIN sz USING (group_id)
        QUALIFY row_number() OVER (PARTITION BY m.group_id
                                   ORDER BY m.ct DESC, m.text ASC) = 1
        ORDER BY m.group_id
    """


# ---------------------------------------------------------------------------
# Token-set (bag-of-words) dedup — order/repetition-invariant identity
# ---------------------------------------------------------------------------

def _token_set_keys(txt) -> pa.Array:
    """Per-row canonical token-set string: sorted DISTINCT whitespace tokens
    joined by ' '.  One dictionary sort per batch + pure-numpy segment work
    (lexsort, run-length dedup, ListArray rebuild + ``pc.binary_join``) —
    no Python loop over rows.

    The trim set is the EXPLICIT ASCII one RE2's ``\\s`` matches
    ([ \\t\\n\\r\\f]) rather than ``utf8_trim_whitespace``: DuckDB's bare
    ``trim()`` strips only spaces, so the oracle strips the same explicit
    set — both sides are defined on identical characters."""
    la = pc.split_pattern_regex(
        pc.utf8_trim(pc.utf8_lower(txt), " \t\n\r\f"), r"\s+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    counts = pc.list_value_length(la).to_numpy().astype(np.int64)
    rows = np.repeat(np.arange(len(la), dtype=np.int64), counts)
    if len(rows) == 0:
        return pa.array([], pa.string())
    enc = pc.dictionary_encode(flat)
    dic = np.array(enc.dictionary.to_pylist(), dtype=object)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[np.argsort(dic)] = np.arange(len(dic))
    key = rank[enc.indices.to_numpy()]
    order = np.lexsort((key, rows))
    rows_s, key_s = rows[order], key[order]
    keep = np.concatenate(
        ([True], (rows_s[1:] != rows_s[:-1]) | (key_s[1:] != key_s[:-1])))
    rows_k = rows_s[keep]
    tok = flat.take(pa.array(order[keep]))
    new_offs = np.zeros(len(la) + 1, dtype=np.int32)
    np.cumsum(np.bincount(rows_k, minlength=len(la)), out=new_offs[1:])
    lst = pa.ListArray.from_arrays(pa.array(new_offs), tok)
    return pc.binary_join(lst, " ")


def q_token_set_dedup(sf_dir: str, num_parts: int | None = None):
    """Token-set (bag-of-words) dedup: two docs are duplicates when their
    sorted DISTINCT token sets agree — identity invariant to word order and
    repetition (shuffled listings, re-ordered boilerplate, copy-paste with
    duplicated lines).  Generalizes the reference's alphabetize-then-match
    idiom (``std_alphabetize_name``, /root/reference/R/standardizers.R:
    2149-2176, used so name-order variants of the same owner collide) from
    name fields to whole documents, composed with ``dedupe_naive``'s
    group-identically reduce (/root/reference/R/deduplicaters.R:208-223).

    Scale shape: the canonical token-set string never shuffles — each batch
    reduces rows to (doc_id, h1, h2) with a 128-bit key hash, rows
    hash-partition on h1, and each partition resolves its groups with one
    lexsort + run-length segmentation (group id = min member doc_id,
    deterministic).  Output is bounded by the duplicate subset.

    Output: (doc_id, group_id, n_members) for every member of a >1 group,
    sorted by doc_id."""
    num_parts = num_parts or _auto_shuffle_parts()

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))   # match oracle: non-null only
        skel = _token_set_keys(t["text"])
        if isinstance(skel, pa.ChunkedArray):
            skel = skel.combine_chunks()
        h1 = hx.hash_strings(skel, seed=7177)
        h2 = hx.hash_strings(skel, seed=2753)
        return pa.table({
            "doc_id": t["doc_id"],
            # int64 bit-cast: uint64 must not cross Ray shuffles
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "part": pa.array((h1 % np.uint64(num_parts)).astype(np.int32)),
        })

    def groups(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy()
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "group_id": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64())})
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        ids, h1, h2 = ids[order], h1[order], h2[order]
        new = np.concatenate(
            ([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [len(ids)])))
        seg = np.repeat(np.arange(len(starts)), sizes)
        keep = sizes[seg] > 1
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "group_id": pa.array(ids[starts][seg][keep]),
            "n_members": pa.array(sizes[seg][keep].astype(np.int64)),
        })

    return _docs(sf_dir).map_batches(keyed, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: groups(g.drop_columns(["part"])),
            batch_format="pyarrow").sort("doc_id")


def token_set_dedup_sql() -> str:
    # trim set == the engine's explicit ASCII \s set (bare trim() strips
    # only spaces — see _token_set_keys docstring)
    return """
        WITH s AS (
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(
                       string_split_regex(trim(lower(text),
                           concat(' ', chr(9), chr(10), chr(13), chr(12))),
                       '\\s+'))), ' ') AS skel
            FROM documents WHERE text IS NOT NULL),
        g AS (SELECT skel, min(doc_id) AS group_id,
                     CAST(count(*) AS BIGINT) AS n_members
              FROM s GROUP BY 1)
        SELECT s.doc_id, g.group_id, g.n_members
        FROM s JOIN g USING (skel)
        WHERE g.n_members > 1
        ORDER BY s.doc_id
    """


# ---------------------------------------------------------------------------
# Per-doc nearest-duplicate top-k report
# ---------------------------------------------------------------------------

def q_near_dup_topk(sf_dir: str, k: int = 3, num_parts: int | None = None,
                    cfg: DedupConfig = DOCS_CFG):
    """Nearest-duplicate triage report: for every doc with >= 1 verified
    near-dup (char-5-gram Jaccard >= 0.7 via the flagship's MinHash+LSH
    blocking), its top-``k`` most similar neighbors with rank — the
    per-record "which doc is my closest duplicate" listing a curation
    reviewer or a keep-best policy consumes (the per-group ``slice_min``
    idiom of the reference's match selection, /root/reference/R/loaders.R,
    applied to the dedup pair stream).

    Scale shape: only verified (left_id, right_id, jaccard) pairs move —
    symmetrized, hash-partitioned on doc_id, each partition ranks its
    segments with ONE lexsort + run-length offsets (no per-group Python);
    ties break (jaccard DESC, neighbor_id ASC) so ranks are deterministic.

    Output: (doc_id, neighbor_id, jaccard, rank), sorted by (doc_id, rank).
    """
    num_parts = num_parts or _auto_shuffle_parts()
    pairs = minhash_pairs_ds(_docs(sf_dir), cfg)

    def sym(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy()
        r = t["right_id"].to_numpy()
        j = t["jaccard"].to_numpy()
        d = np.concatenate((l, r))
        nb = np.concatenate((r, l))
        jj = np.concatenate((j, j))
        return pa.table({
            "doc_id": pa.array(d),
            "neighbor_id": pa.array(nb),
            "jaccard": pa.array(jj),
            "part": pa.array((hx.splitmix64(d.astype(np.uint64))
                              % np.uint64(num_parts)).astype(np.int32)),
        })

    def topk(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy()
        nb = g["neighbor_id"].to_numpy()
        j = g["jaccard"].to_numpy()
        order = np.lexsort((nb, -j, d))
        d, nb, j = d[order], nb[order], j[order]
        new = np.concatenate(([True], d[1:] != d[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [len(d)])))
        rank = np.arange(len(d), dtype=np.int64) \
            - np.repeat(starts, sizes) + 1
        keep = rank <= k
        return pa.table({
            "doc_id": pa.array(d[keep]),
            "neighbor_id": pa.array(nb[keep]),
            "jaccard": pa.array(j[keep]),
            "rank": pa.array(rank[keep]),
        })

    return pairs.map_batches(sym, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: topk(g.drop_columns(["part"])),
            batch_format="pyarrow").sort(["doc_id", "rank"])


def near_dup_topk_sql(base_pairs_sql: str, k: int = 3) -> str:
    """Composes from the SHARED exact-Jaccard pair oracle (the same
    ``_JACCARD_ORACLE`` every near-dup oracle uses) so the gram/threshold/
    rounding definition lives in exactly one place."""
    return f"""
        WITH pairs AS ({base_pairs_sql}),
        sym AS (
          SELECT left_id AS doc_id, right_id AS neighbor_id, jaccard
          FROM pairs
          UNION ALL
          SELECT right_id, left_id, jaccard FROM pairs
        )
        SELECT doc_id, neighbor_id, jaccard,
               CAST(row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY jaccard DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM sym
        QUALIFY rank <= {k}
        ORDER BY doc_id, rank
    """


# ---------------------------------------------------------------------------
# Soft dedup — per-doc training-sample weight 1/cluster_size
# ---------------------------------------------------------------------------

def q_dup_soft_weight(sf_dir: str, cfg: DedupConfig = DOCS_CFG):
    """Soft dedup (SoftDeDup-style reweighting): instead of DROPPING
    near-duplicates, every doc gets a training-sample weight of
    ``1 / near-dup-cluster-size`` so each duplicated content unit
    contributes one document's worth of gradient regardless of copy count
    — the downweight-don't-delete alternative to ``near_dup_survivors``
    retention (same clustering, different policy head).

    Scale shape: the cluster assignment is the dup subset (the
    ``q_near_dup_groups`` chain — LSH pairs -> verify -> gated components);
    group sizes are one partial-count reduce over it; the full corpus
    streams ONCE through a left attach (adaptive broadcast — the dup
    assignment is orders of magnitude smaller than the corpus) and
    singletons fill group_id = self, size = 1 without ever joining.

    Output: (doc_id, group_id, group_size, weight) for EVERY doc, sorted
    by doc_id."""
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins

    assign = q_near_dup_groups(sf_dir, cfg).materialize()
    sizes = assign.groupby("group_id").aggregate(
        Count(alias_name="group_size"))
    withsz = joins.attach_columns(assign, sizes, "group_id", "group_id",
                                  {"group_size": "group_size"}, None)
    docs = _docs(sf_dir, columns=("doc_id",))
    out = joins.attach_columns(docs, withsz, "doc_id", "doc_id",
                               {"group_id": "group_id",
                                "group_size": "group_size"}, None, how="left")

    def finish(t: pa.Table) -> pa.Table:
        gid = pc.coalesce(t["group_id"], t["doc_id"])
        gsz = pc.coalesce(t["group_size"], pa.scalar(1, pa.int64()))
        w = 1.0 / gsz.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "group_id": pc.cast(gid, pa.int64()),
            "group_size": pc.cast(gsz, pa.int64()),
            "weight": pa.array(round_half_away(w, 6)),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def dup_soft_weight_sql(base_pairs_sql: str) -> str:
    """Composes from the shared exact-Jaccard pair oracle."""
    return f"""
        WITH RECURSIVE base AS ({base_pairs_sql}),
        sym(a, b) AS (
            SELECT left_id, right_id FROM base
            UNION ALL
            SELECT right_id, left_id FROM base
        ),
        reach(id, r) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
        ),
        grp AS (SELECT id AS doc_id, min(r) AS gid FROM reach GROUP BY id),
        m AS (SELECT d.doc_id, coalesce(g.gid, d.doc_id) AS group_id
              FROM documents d LEFT JOIN grp g USING (doc_id)),
        sz AS (SELECT group_id, CAST(count(*) AS BIGINT) AS group_size
               FROM m GROUP BY 1)
        SELECT m.doc_id, m.group_id, sz.group_size,
               round(1.0 / sz.group_size, 6) AS weight
        FROM m JOIN sz USING (group_id)
        ORDER BY m.doc_id
    """
