"""Exact-containment matching (clip cuts: one transcript a strict substring
of another).

The reference handles embedded-entity extraction with regex peels
(C/O-in-name address extraction, ``/root/reference/R/standardizers.R:1148-1182``)
— inherently pattern-specific.  The engine's general capability is a
winnowing-fingerprint candidate stage (the MOSS/winnowing idea: sample
char-grams whose hash satisfies ``h % stride == 0``; selection depends only
on gram content, so a substring and its container select the SAME grams) and
an exact substring verification.

Candidate generation is an ASYMMETRIC probe/anchor bucket join, not an
all-pairs-in-bucket expansion: every doc contributes *anchor* rows for all
its winnowed grams (the container side), but probes with only the MINIMUM
content-defined anchor hash (the contained side).  Soundness: if A ⊆ B then
every content-defined (h % stride == 0) gram of A is also a gram of B and
is equally selected by B's winnowing — so A's min content-defined anchor is
one of B's anchor rows and the pair meets in that bucket.  Docs with no
content-defined anchor (shorter than ``containment_min_len`` grams keep all
grams) probe with their min gram instead, which the container also selects
when it, too, keeps all grams, or when the gram satisfies the stride rule —
the residual miss probability for such short cuts is (1-1/stride)^g and is
counted in tests.  This cuts candidate volume from
O(sum bucket_size²) to O(sum probes×anchors) — hot 16-gram buckets carry
many anchors but almost never a probe.

  winnowed anchors -> (anchor_hash, clip_id, n_chars) rows     [container]
  min content anchor -> (anchor_hash, clip_id, n_chars) row    [contained]
  -> coarse-partition groupby -> probe×anchor pairs (capped, counted)
  -> join both transcripts -> exact ``shorter in longer`` check
  -> 'containment' edges (left = container, right = contained)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.config import DedupConfig
from who_owns_mass_processing_ray.functions import hashing as hx
from who_owns_mass_processing_ray.stages import pairs as pr

_U64 = np.uint64


def _probe_anchor_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """-> (bucket_key, clip_id, n_chars, is_probe) rows."""
    col = batch["transcript_norm"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.winnow_anchors(
        col, cfg.containment_gram, cfg.containment_stride,
        cfg.containment_min_len, seed=cfg.seed,
    )
    counts = np.diff(offs)
    n = len(batch)
    ids_arr = batch["clip_id"]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    lens = pc.fill_null(pc.utf8_length(col), 0).to_numpy().astype(np.int64)

    # probe key per doc: min content-defined anchor (h % stride == 0),
    # falling back to min anchor for docs that kept every gram
    probe = np.zeros(n, dtype=_U64)
    has_probe = np.zeros(n, dtype=bool)
    content = (vals % _U64(cfg.containment_stride)) == 0
    doc_of = np.repeat(np.arange(n), counts)
    big = np.full(len(vals), np.iinfo(np.uint64).max, dtype=_U64)
    cand = np.where(content, vals, big)
    if len(vals):
        mins_content = np.full(n, np.iinfo(np.uint64).max, dtype=_U64)
        np.minimum.at(mins_content, doc_of, cand)
        mins_any = np.full(n, np.iinfo(np.uint64).max, dtype=_U64)
        np.minimum.at(mins_any, doc_of, vals)
        use_content = mins_content != np.iinfo(np.uint64).max
        probe = np.where(use_content, mins_content, mins_any)
        has_probe = counts > 0

    anchor_rep = pa.array(np.repeat(np.arange(n), counts))
    probe_idx = np.flatnonzero(has_probe)
    keys = np.concatenate((vals, probe[probe_idx]))
    take = pa.concat_arrays([
        ids_arr.take(anchor_rep).combine_chunks()
        if isinstance(ids_arr.take(anchor_rep), pa.ChunkedArray)
        else ids_arr.take(anchor_rep),
        ids_arr.take(pa.array(probe_idx)).combine_chunks()
        if isinstance(ids_arr.take(pa.array(probe_idx)), pa.ChunkedArray)
        else ids_arr.take(pa.array(probe_idx)),
    ])
    n_chars = np.concatenate((np.repeat(lens, counts), lens[probe_idx]))
    is_probe = np.concatenate((np.zeros(int(counts.sum()), bool),
                               np.ones(len(probe_idx), bool)))
    return pa.table({
        "bucket_key": pa.array(keys),
        "clip_id": take,
        "n_chars": pa.array(n_chars),
        "is_probe": pa.array(is_probe),
    })


def _expand_probe_anchor(group: pa.Table, max_bucket: int) -> pa.Table:
    """probe×anchor pairs per bucket, vectorized; contained=probe side must
    be strictly shorter.  Caps each bucket's ANCHOR list at ``max_bucket``
    (kept in (bucket, clip_id) sort order), counting drops."""
    if group.num_rows == 0:
        return pa.table({"contained_id": pa.array([], pa.string()),
                         "container_id": pa.array([], pa.string()),
                         "dropped": pa.array([], pa.int64())})
    tbl = group.sort_by([("bucket_key", "ascending"),
                         ("is_probe", "descending"),  # probes first
                         ("clip_id", "ascending")])
    keys = tbl["bucket_key"].to_numpy()
    probe_mask = tbl["is_probe"].to_numpy(zero_copy_only=False)
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(keys)]))
    # per segment: probes occupy a prefix (sorted is_probe desc)
    n_probe = np.add.reduceat(probe_mask.astype(np.int64), starts)
    sizes = ends - starts
    n_anchor = sizes - n_probe
    a_keep = np.minimum(n_anchor, max_bucket)
    dropped = int((n_anchor - a_keep).sum())
    P = n_probe * a_keep
    tot = int(P.sum())
    if tot == 0:
        return pa.table({"contained_id": pa.array([], tbl["clip_id"].type),
                         "container_id": pa.array([], tbl["clip_id"].type),
                         "dropped": pa.array([], pa.int64())})
    cum = np.zeros(len(P) + 1, dtype=np.int64)
    np.cumsum(P, out=cum[1:])
    seg = np.repeat(np.arange(len(P)), P)
    r = np.arange(tot, dtype=np.int64) - cum[seg]
    pi = r // a_keep[seg]                       # probe index within segment
    ai = r % a_keep[seg]                        # anchor index within kept
    probe_idx = starts[seg] + pi
    anchor_idx = starts[seg] + n_probe[seg] + ai
    # require contained strictly shorter than container
    nch = tbl["n_chars"].to_numpy()
    ok = nch[probe_idx] < nch[anchor_idx]
    probe_idx, anchor_idx = probe_idx[ok], anchor_idx[ok]
    ids_arr = tbl["clip_id"]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    # exact in-partition dedup on (contained, container)
    codes = pc.dictionary_encode(ids_arr).indices.to_numpy().astype(np.int64)
    pc_, ac_ = codes[probe_idx], codes[anchor_idx]
    order = np.lexsort((ac_, pc_))
    ps, as_ = pc_[order], ac_[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (ps[1:] != ps[:-1]) | (as_[1:] != as_[:-1])
    keep = order[first]
    probe_idx, anchor_idx = probe_idx[keep], anchor_idx[keep]
    return pa.table({
        "contained_id": ids_arr.take(pa.array(probe_idx)),
        "container_id": ids_arr.take(pa.array(anchor_idx)),
        "dropped": pa.array(np.full(len(probe_idx), dropped, np.int64)),
    })


def containment_edges(features_ds, cfg: DedupConfig,
                      num_parts: int | None = None,
                      num_partitions: int | None = None):
    """features -> verified 'containment' edges (left=container, right=contained)."""
    from who_owns_mass_processing_ray.stages import auto_parts

    if num_parts is None:
        num_parts = auto_parts()
    narrow = features_ds.select_columns(["clip_id", "transcript_norm"])
    rows = narrow.map_batches(_probe_anchor_rows, fn_kwargs={"cfg": cfg},
                              batch_format="pyarrow", batch_size=cfg.batch_size)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["bucket_key"].to_numpy() % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    cand = rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: _expand_probe_anchor(g.drop_columns(["part"]),
                                           cfg.max_bucket),
            batch_format="pyarrow")

    # rename to the generic pair schema for the shared attach machinery
    cand = cand.map_batches(
        lambda t: pa.table({"left_id": t["container_id"],
                            "right_id": t["contained_id"],
                            "dropped": t["dropped"]}),
        batch_format="pyarrow")
    # rebalance narrow pairs before the verify map (straggler partitions —
    # see config.verify_rows_per_block)
    cand = cand.repartition(
        target_num_rows_per_block=cfg.verify_rows_per_block)
    cand = pr.attach_pair_features(cand, features_ds, "transcript_norm",
                                   num_partitions, out_prefix="norm")

    backend = cfg.containment_backend

    def verify(batch: pa.Table) -> pa.Table:
        # Vectorized substring check: Arrow length/validity gates, then one
        # of two exact backends over the surviving pairs (tested equal,
        # tests/test_suffix.py):
        #  - 'scan': ONE C search kernel (pc.match_substring) per UNIQUE
        #    contained string, with pairs grouped by the contained side —
        #    Python dispatch scales with unique probes, not with pairs
        #    (a probe meets many anchors).
        #  - 'suffix_array': ONE generalized suffix array over the batch's
        #    unique containers, then O(|p| log N) binary-search probes per
        #    unique pattern (functions/suffix.py) — work scales with
        #    container bytes + patterns, independent of pair fan-out.
        ln = batch["left_norm"]    # container
        rn = batch["right_norm"]   # contained
        if isinstance(ln, pa.ChunkedArray):
            ln = ln.combine_chunks()
        if isinstance(rn, pa.ChunkedArray):
            rn = rn.combine_chunks()
        pre_arr = pc.and_kleene(
            pc.and_(pc.is_valid(ln), pc.is_valid(rn)),
            pc.less(pc.utf8_length(rn), pc.utf8_length(ln)))
        pre = pc.fill_null(pre_arr, False).to_numpy(zero_copy_only=False)
        ok = np.zeros(len(batch), dtype=bool)
        idx = np.flatnonzero(pre)
        if len(idx):
            take = pa.array(idx)
            enc = pc.dictionary_encode(rn.take(take))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy().astype(np.int64)
            uniq = enc.dictionary
            lefts_all = ln.take(take)
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            ends = np.r_[starts[1:], len(sc)]
            if backend == "suffix_array":
                from who_owns_mass_processing_ray.functions import suffix as sx
                lenc = pc.dictionary_encode(lefts_all)
                if isinstance(lenc, pa.ChunkedArray):
                    lenc = lenc.combine_chunks()
                lcodes = lenc.indices.to_numpy().astype(np.int64)
                docs = [d.as_py().encode("utf-8") for d in lenc.dictionary]
                blob, doc_starts = sx.concat_docs(docs)
                sa = sx.build_suffix_array(
                    np.frombuffer(blob, dtype=np.uint8))
                for s, e in zip(starts, ends):
                    members = order[s:e]
                    pattern = uniq[sc[s]].as_py().encode("utf-8")
                    hit_docs = sx.docs_containing(blob, sa, doc_starts,
                                                  pattern)
                    ok[idx[members]] = np.isin(lcodes[members], hit_docs)
            else:
                for s, e in zip(starts, ends):
                    members = order[s:e]
                    pattern = uniq[sc[s]].as_py()
                    m = pc.match_substring(
                        lefts_all.take(pa.array(members)), pattern=pattern)
                    ok[idx[members]] = m.to_numpy(zero_copy_only=False)
        out = batch.filter(pa.array(ok))
        return pa.table({
            "left_id": out["left_id"],
            "right_id": out["right_id"],
            "dropped": out["dropped"],
        })

    verified = cand.map_batches(verify, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    return pr.distinct_edges(verified, "containment", num_parts=num_parts)
