"""Independent oracles for the driver queries that have no DuckDB oracle
(random projections / MinHash / actor state / binary codecs).

Each test recomputes the expected result with a deliberately DIFFERENT
implementation — pure-Python ints and per-row loops instead of the engine's
vectorized numpy buffer kernels, and brute-force all-pairs instead of the
distributed blocking/shuffle machinery — so a bug in either side shows up
as a mismatch.  This closes the round-1 gap where one third of the driver
contract was "runs, unverified" (VERDICT.md Next-round #1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
M64 = (1 << 64) - 1


# -- pure-Python reimplementations of the hashing kernel semantics ----------

def py_splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)


def py_shingle_hashes(text: str, k: int, seed: int) -> list[int]:
    """Rolling char-k-gram hashes of one doc (docs >= k chars only — the
    test corpus has no shorter rows)."""
    b = text.encode("utf-8")
    assert len(b) >= k
    P = 0x9E3779B97F4A7C15 | 1
    out = []
    for j in range(len(b) - k + 1):
        h = 0
        for c in b[j:j + k]:
            h = (h * P + c) & M64
        out.append(py_splitmix64(h ^ seed))
    return out


def py_simhash(text: str) -> int:
    """Per-doc 64-bit simhash exactly as q_simhash_near_dup defines it
    (bit votes over 3-gram hashes, numpy unpackbits/packbits bit order)."""
    votes = [0] * 64
    grams = py_shingle_hashes(text, 3, 13)
    for h in grams:
        bs = h.to_bytes(8, "little")
        pos = 0
        for byte in bs:
            for bit in range(7, -1, -1):   # unpackbits: MSB-first per byte
                votes[pos] += 1 if (byte >> bit) & 1 else -1
                pos += 1
    flags = [1 if v > 0 else 0 for v in votes]
    out_bytes = bytearray(8)
    for i, f in enumerate(flags):          # packbits: MSB-first per byte
        if f:
            out_bytes[i // 8] |= 1 << (7 - (i % 8))
    return int.from_bytes(bytes(out_bytes), "little")


def _docs_table() -> pa.Table:
    return pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).sort_by("doc_id")


@pytest.fixture(scope="module")
def docs():
    t = _docs_table()
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def test_simhash_near_dup_vs_bruteforce(ray_session, docs):
    """EXACT equality against brute force: at the default radius
    (thresh = bands-1 = 3) the banding is complete by pigeonhole, so the
    engine's pair set and per-pair distances must equal the all-pairs
    pure-Python recompute bit for bit."""
    from who_owns_mass_processing_ray.pipelines import textops

    ids, texts = docs
    sh = {i: py_simhash(t) for i, t in zip(ids, texts)}
    brute = {}
    id_list = sorted(sh)
    for a_i in range(len(id_list)):
        for b_i in range(a_i + 1, len(id_list)):
            a, b = id_list[a_i], id_list[b_i]
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= 3:
                brute[(a, b)] = d
    got = textops.q_simhash_near_dup(SF_DIR).to_pandas()
    engine = {(int(r.left_id), int(r.right_id)): int(r.hamming)
              for r in got.itertuples()}
    assert engine == brute
    assert len(brute) > 0    # the corpus must actually exercise the query


def test_lang_id_vs_pure_python(ray_session, docs):
    """Per-row dict-based bigram profiles + cosine must reproduce the
    engine's vectorized buffer-kernel predictions exactly."""
    from who_owns_mass_processing_ray.pipelines import textops

    li = textops.LangID()
    got = textops.q_lang_id(SF_DIR).to_pandas().set_index("doc_id")
    ids, texts = docs
    for i, txt in list(zip(ids, texts)):
        counts: dict[int, int] = {}
        b = txt.lower().encode("ascii", "replace")
        cls = [c - 96 if 97 <= c <= 122 else 0 for c in b]
        for a, bb in zip(cls[:-1], cls[1:]):
            counts[a * 27 + bb] = counts.get(a * 27 + bb, 0) + 1
        vec = np.zeros(27 * 27)
        for k, v in counts.items():
            vec[k] = v
        vec /= max(np.linalg.norm(vec), 1e-12)
        sims = vec @ li.mat.T
        best = int(sims.argmax())
        assert got.loc[i, "lang_pred"] == li.langs[best]
        assert abs(got.loc[i, "lang_conf"] - sims[best]) < 1e-3


def test_doc_fingerprint_vs_pure_python(ray_session, docs):
    """Winnowed-anchor counts + combined fingerprints recomputed per row
    with pure-Python ints (selection: h % stride == 0, keep-all under
    min_len grams, first gram always kept; combine: sum of splitmix64
    mod 2^64)."""
    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_doc_fingerprint(SF_DIR).to_pandas().set_index("doc_id")
    ids, texts = docs
    for i, txt in zip(ids, texts):
        grams = py_shingle_hashes(txt, 16, 7)
        keep_all = len(grams) < 12
        kept = [h for j, h in enumerate(grams)
                if j == 0 or keep_all or h % 8 == 0]
        fp = sum(py_splitmix64(h) for h in kept) & M64
        if not kept:
            fp = 0x9E3779B97F4A7C15
        assert int(got.loc[i, "n_anchors"]) == len(kept)
        want = np.uint64(fp).astype(np.int64) if fp < (1 << 63) \
            else np.int64(fp - (1 << 64))
        assert int(got.loc[i, "fingerprint"]) == int(want)


def test_knn_ivf_scores_are_exact(ray_session):
    """Every (query, vec, cosine) row the IVF path returns must carry the
    EXACT cosine (recomputed from the raw embeddings) — the approximation
    is allowed to miss neighbors, never to mis-score them."""
    from who_owns_mass_processing_ray.pipelines import vectors

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    ids = emb["vec_id"].to_numpy()
    m = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    of = {int(v): k for k, v in enumerate(ids)}
    got = vectors.q_knn_ivf(SF_DIR).to_pandas()
    assert len(got)
    for r in got.itertuples():
        exact = float(m[of[int(r.query_id)]] @ m[of[int(r.vec_id)]])
        assert abs(r.cosine - round(exact, 4)) <= 1e-9


def _brute_flagship_partition(cfg):
    """Brute-force cluster partition of the sf0.001 clip corpus: per-row
    feature recompute (no distributed pipeline), all-pairs edge tests with
    an independent Python Jaccard/substring, Python DSU."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.functions import text as tx

    t = _docs_table()
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    clip_ids, norms, t_hashes, b_hashes, fps, oks = [], [], [], [], [], []
    for i, txt in zip(ids, texts):
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        pcm = synth._waveform(params, sr, dur)
        buf = audio.encode(pcm, sr, codec)
        clip_ids.append(f"clip-{int(i):012d}")
        norm = tx.normalize_transcripts(pa.array([txt]))[0].as_py()
        norms.append(norm or "")
        t_hashes.append(int(hx.hash_strings(pa.array([norm or ""]))[0]))
        b_hashes.append(int(hx.hash_binary_rows(pa.array([buf], pa.large_binary()))[0]))
        dec, dsr = audio.decode(buf, codec)
        fps.append(int(audio.audio_fingerprint(
            dec, dsr, cfg.fp_num_bands, cfg.simhash_bits,
            cfg.fp_fmin_hz, cfg.fp_fmax_hz, cfg.seed)))
        oks.append(True)

    def grams(s: str) -> set:
        k = cfg.shingle_k
        return {s[j:j + k] for j in range(max(len(s) - k + 1, 0))} or \
            ({s} if s else set())

    gram_sets = [grams(n) for n in norms]
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a in range(n):
        for b in range(a + 1, n):
            if t_hashes[a] == t_hashes[b] and b_hashes[a] == b_hashes[b]:
                union(a, b)
                continue
            ga, gb = gram_sets[a], gram_sets[b]
            if ga and gb:
                inter = len(ga & gb)
                if inter and inter / (len(ga) + len(gb) - inter) \
                        >= cfg.jaccard_thresh:
                    union(a, b)
                    continue
            if oks[a] and oks[b] and \
                    bin(fps[a] ^ fps[b]).count("1") <= cfg.hamming_thresh:
                union(a, b)
                continue
            na, nb = norms[a], norms[b]
            if na and nb and na != nb and (na in nb or nb in na):
                union(a, b)
    return clip_ids, [find(i) for i in range(n)]


def test_flagship_clusters_vs_bruteforce(ray_session):
    """The driver's dedup_assignment vs a single-process brute-force
    recompute: engine precision must be EXACT (every engine-merged pair is
    brute-connected — verified edges can't over-merge) and dup-pair recall
    >= 0.99 (the north-rule bar; the only allowed misses are the documented
    probabilistic containment/LSH residual)."""
    from who_owns_mass_processing_ray.pipelines import multimodal

    cfg = multimodal.MM_CFG
    clip_ids, roots = _brute_flagship_partition(cfg)
    brute_of = dict(zip(clip_ids, roots))
    got = multimodal.q_dedup_assignment(SF_DIR).to_pandas()
    eng_of = dict(zip(got.clip_id, got.cluster_id))
    assert set(eng_of) == set(brute_of)

    from collections import defaultdict
    eng_groups = defaultdict(list)
    for c, g in eng_of.items():
        eng_groups[g].append(c)
    # precision: engine-merged => brute-connected
    for members in eng_groups.values():
        b0 = brute_of[members[0]]
        for m in members[1:]:
            assert brute_of[m] == b0, f"engine over-merged {m}"
    # recall over brute dup pairs
    brute_groups = defaultdict(list)
    for c, r in brute_of.items():
        brute_groups[r].append(c)
    tot = hit = 0
    for members in brute_groups.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                tot += 1
                hit += eng_of[members[x]] == eng_of[members[y]]
    if tot:
        assert hit / tot >= 0.99, f"dup-pair recall {hit}/{tot}"


def test_audio_stats_vs_direct_decode(ray_session):
    """q_audio_decode_stats and q_audio_frames vs a direct per-row decode
    recompute — exact equality on every row."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    stats = multimodal.q_audio_decode_stats(SF_DIR).to_pandas() \
        .set_index("clip_id")
    frames = multimodal.q_audio_frames(SF_DIR).to_pandas() \
        .set_index("clip_id")
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:120]:   # spot-check a prefix
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        pcm0 = synth._waveform(params, sr, dur)
        buf = audio.encode(pcm0, sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        assert bool(stats.loc[cid, "decode_ok"]) == (dsr == sr)
        assert int(stats.loc[cid, "n_samples"]) == len(pcm)
        assert abs(stats.loc[cid, "rms"]
                   - round(float(np.sqrt(np.mean(pcm ** 2))), 4)) <= 1e-12
        hop = max(1, int(dsr * 25 / 1000))
        k = len(pcm) // hop
        assert int(frames.loc[cid, "n_frames"]) == k
        if k:
            e = (pcm[:k * hop].reshape(k, hop).astype(np.float64) ** 2) \
                .mean(axis=1)
            assert abs(frames.loc[cid, "mean_energy"]
                       - round(float(e.mean()), 6)) <= 1e-12
            assert abs(frames.loc[cid, "max_energy"]
                       - round(float(e.max()), 6)) <= 1e-12


def test_image_stub_vs_recompute(ray_session):
    """The marked image-decode stub must stay deterministic: fake dims are
    a pure function of the payload prefix."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    got = multimodal.q_image_decode_stub(SF_DIR).to_pandas() \
        .set_index("clip_id")
    assert not got["decoded"].any()        # stub marker stays visible
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:60]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        h = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
        cid = f"clip-{int(i):012d}"
        assert int(got.loc[cid, "width"]) == 64 + h % 1024
        assert int(got.loc[cid, "height"]) == 64 + (h >> 32) % 1024


def test_video_stub_vs_recompute(ray_session):
    """The marked video frame-sample stub: fan-out layout (one row per
    sampled frame), timestamps, fake-probed fps, and frame indices must all
    be an exact pure function of (payload prefix, dur_ms)."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    got = multimodal.q_video_frame_sample_stub(SF_DIR).to_pandas()
    assert not got["decoded"].any()        # stub marker stays visible
    by_clip = dict(tuple(got.groupby("clip_id", sort=False)))
    t = _docs_table()
    checked = 0
    for i in t["doc_id"].to_pylist()[:60]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        h = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
        fps = (24, 25, 30)[h % 3]
        k = min((dur - 1) // 200 + 1, 8)   # every ts strictly < dur
        g = by_clip[f"clip-{int(i):012d}"].sort_values("ts_ms")
        assert len(g) == k
        assert (g["ts_ms"] < dur).all()   # no sample past the clip end
        assert (g["frame_idx"] < dur * fps // 1000 + (dur * fps % 1000 > 0)
                ).all()                   # frame_idx within decoded range
        assert list(g["ts_ms"]) == [j * 200 for j in range(k)]
        assert set(g["fps"]) == {fps}
        assert list(g["frame_idx"]) == [j * 200 * fps // 1000
                                        for j in range(k)]
        checked += 1
    assert checked == 60


def test_minhash_calibration_vs_brute(ray_session):
    """q_minhash_calibration vs a full in-process recompute: same bands ->
    same candidate buckets -> distinct pairs -> signature-agreement estimate
    + exact distinct-gram Jaccard -> identical bins, counts, and 4-decimal
    means."""
    import numpy as np

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import textops
    from who_owns_mass_processing_ray.pipelines.textops import DOCS_CFG as cfg

    got = textops.q_minhash_calibration(SF_DIR).to_pandas() \
        .set_index("bin_lo")

    t = _docs_table()
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.shingle_hashes(col, cfg.shingle_k, seed=cfg.seed)
    sig = hx.minhash_signatures(vals, offs, cfg.num_perm, cfg.seed)
    bands = hx.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows, seed=cfg.seed)
    ids = t["doc_id"].to_numpy()
    keep = np.diff(offs) > 0
    sig_of = {int(i): sig[k] for k, i in enumerate(ids)}
    grams_of = {int(ids[k]): set(vals[offs[k]:offs[k + 1]].tolist())
                for k in range(len(ids))}

    from collections import defaultdict

    buckets = defaultdict(list)
    for k in np.flatnonzero(keep):
        for b in bands[k]:
            buckets[int(b)].append(int(ids[k]))
    pairs = set()
    for members in buckets.values():
        assert len(members) <= cfg.max_bucket   # no salting path at sf0.001
        m = sorted(set(members))
        for x in range(len(m)):
            for y in range(x + 1, len(m)):
                pairs.add((m[x], m[y]))

    bins = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    for a, b in pairs:
        est = float((sig_of[a] == sig_of[b]).mean())
        ga, gb = grams_of[a], grams_of[b]
        exact = len(ga & gb) / len(ga | gb) if (ga or gb) else 0.0
        k = min(int(est / 0.05), 19)
        row = bins[k]
        row[0] += 1
        row[1] += est
        row[2] += exact
        row[3] += abs(est - exact)
    assert len(got) == len(bins)
    for k, (n, se, sx, sa) in bins.items():
        lo = round(k * 0.05, 2)
        assert int(got.loc[lo, "n_pairs"]) == n
        assert abs(got.loc[lo, "mean_est"] - round(se / n, 4)) <= 1e-9
        assert abs(got.loc[lo, "mean_exact"] - round(sx / n, 4)) <= 1e-9
        assert abs(got.loc[lo, "mae"] - round(sa / n, 4)) <= 1e-9


def test_lsh_recall_curve_vs_brute(ray_session):
    """q_lsh_recall_curve vs a full in-process recompute: exact Jaccard
    pairs >= 0.5 from raw 5-gram sets, LSH candidacy from the same
    bands/buckets as the flagship, identical bins, counts, and recalls."""
    import numpy as np

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import textops
    from who_owns_mass_processing_ray.pipelines.textops import DOCS_CFG as cfg

    got = textops.q_lsh_recall_curve(SF_DIR).to_pandas().set_index("bin_lo")

    t = _docs_table()
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    grams_of = {i: {txt[p:p + 5] for p in range(len(txt) - 4)}
                for i, txt in zip(ids, texts) if txt is not None}

    # exact pairs >= 0.5 (brute all-pairs on the 500-doc fixture)
    exact = {}
    idl = sorted(grams_of)
    for x in range(len(idl)):
        for y in range(x + 1, len(idl)):
            a, b = idl[x], idl[y]
            ga, gb = grams_of[a], grams_of[b]
            if not ga and not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.5:
                exact[(a, b)] = j

    # LSH candidate set — same recipe as test_minhash_calibration_vs_brute
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals, offs = hx.shingle_hashes(col, cfg.shingle_k, seed=cfg.seed)
    sig = hx.minhash_signatures(vals, offs, cfg.num_perm, cfg.seed)
    bands = hx.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows, seed=cfg.seed)
    all_ids = t["doc_id"].to_numpy()
    from collections import defaultdict

    buckets = defaultdict(list)
    for k in np.flatnonzero(np.diff(offs) > 0):
        for bb in bands[k]:
            buckets[int(bb)].append(int(all_ids[k]))
    cand = set()
    for members in buckets.values():
        m = sorted(set(members))
        for x in range(len(m)):
            for y in range(x + 1, len(m)):
                cand.add((m[x], m[y]))

    bins = defaultdict(lambda: [0, 0, 0.0])
    for pair, j in exact.items():
        jr = round(j, 4)        # the query bins/sums the rounded jaccard
        k = min(int(jr / 0.05), 19)
        row = bins[k]
        row[0] += 1
        row[1] += 1 if pair in cand else 0
        row[2] += jr
    assert len(got) == len(bins)
    for k, (n, nc, sj) in bins.items():
        lo = round(k * 0.05, 2)
        assert int(got.loc[lo, "n_true"]) == n
        assert int(got.loc[lo, "n_caught"]) == nc
        assert abs(got.loc[lo, "recall"] - np.round(nc / n, 4)) <= 1e-9
        mj = sj / n
        assert abs(got.loc[lo, "mean_j"] - np.round(mj, 4)) <= 1e-9
        analytic = 1 - (1 - mj ** cfg.lsh_rows) ** cfg.lsh_bands
        assert abs(got.loc[lo, "analytic_catch"]
                   - np.round(analytic, 4)) <= 1e-9


def test_simhash_calibration_vs_brute(ray_session):
    """q_simhash_calibration vs a full in-process recompute: per-clip
    decode -> spectral feature vector + fingerprint, multi-index buckets
    (prod _band_rows on the brute fingerprints), distinct pairs, hamming +
    true cosine, identical per-distance bins and 4-decimal means."""
    import numpy as np

    from who_owns_mass_processing_ray import audio as au, synth
    from who_owns_mass_processing_ray.pipelines import multimodal
    from who_owns_mass_processing_ray.pipelines.multimodal import MM_CFG as cfg
    from who_owns_mass_processing_ray.stages import audio_fp

    got = multimodal.q_simhash_calibration(SF_DIR).to_pandas() \
        .set_index("hamming")

    t = _docs_table()
    ids, fps, feats = [], [], {}
    for i in t["doc_id"].to_pylist():
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = au.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = au.decode(buf, codec)
        e = au.band_energies(pcm, dsr, cfg.fp_num_bands,
                             cfg.fp_fmin_hz, cfg.fp_fmax_hz)
        v = np.diff(np.log(e + 1e-12)) * np.sqrt(np.maximum(e[1:], e[:-1]))
        cid = f"clip-{int(i):012d}"
        ids.append(cid)
        fps.append(au.simhash_from_features(v, cfg.simhash_bits, cfg.seed))
        feats[cid] = v

    rows = audio_fp._band_rows(pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "fp": pa.array(np.array(fps, dtype=np.uint64)),
        "decode_ok": pa.array([True] * len(ids)),
    }), cfg)
    from collections import defaultdict

    buckets = defaultdict(list)
    for key, cid in zip(rows["bucket_key"].to_pylist(),
                        rows["clip_id"].to_pylist()):
        buckets[key].append(cid)
    fp_of = dict(zip(ids, fps))
    pairs = set()
    for members in buckets.values():
        assert len(members) <= cfg.max_bucket
        m = sorted(set(members))
        for x in range(len(m)):
            for y in range(x + 1, len(m)):
                pairs.add((m[x], m[y]))

    bits = cfg.simhash_bits
    bins = defaultdict(lambda: [0, 0.0, 0.0])
    for a, b in pairs:
        d = int(au.hamming64(np.array([fp_of[a]], np.uint64),
                             np.array([fp_of[b]], np.uint64))[0])
        va, vb = feats[a], feats[b]
        den = max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-30)
        tc = float((va * vb).sum() / den)
        est = float(np.cos(np.pi * d / bits))
        row = bins[d]
        row[0] += 1
        row[1] += tc
        row[2] += abs(est - tc)
    assert len(got) == len(bins)
    for d, (n, sc, sa) in bins.items():
        assert int(got.loc[d, "n_pairs"]) == n
        assert abs(got.loc[d, "est_cos"]
                   - np.round(np.cos(np.pi * d / bits), 4)) <= 1e-9
        assert abs(got.loc[d, "mean_true_cos"]
                   - np.round(sc / n, 4)) <= 1e-9
        assert abs(got.loc[d, "mae"] - np.round(sa / n, 4)) <= 1e-9


def test_audio_loudness_silence_vs_direct_decode(ray_session):
    """q_audio_loudness and q_audio_silence vs a direct per-row decode
    recompute — exact equality on every checked row."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    loud = multimodal.q_audio_loudness(SF_DIR).to_pandas() \
        .set_index("clip_id")
    sil = multimodal.q_audio_silence(SF_DIR).to_pandas() \
        .set_index("clip_id")
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:120]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        r = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
        dbfs = 20.0 * np.log10(r) if r > 0 else -120.0
        assert abs(loud.loc[cid, "rms_dbfs"] - round(dbfs, 4)) <= 1e-12
        assert abs(loud.loc[cid, "peak"]
                   - round(float(np.abs(pcm).max()), 4)) <= 1e-12
        assert abs(loud.loc[cid, "gain_to_target_db"]
                   - round(-20.0 - dbfs, 4)) <= 1e-12
        assert abs(loud.loc[cid, "clip_frac"]
                   - round(float(np.mean(np.abs(pcm) >= 0.999)), 6)) <= 1e-12
        thresh = 0.05 * float(np.abs(pcm).max())
        act = np.flatnonzero(np.abs(pcm) > thresh)
        if len(act):
            assert int(sil.loc[cid, "lead_silence_ms"]) == \
                int(act[0] * 1000 / dsr)
            assert int(sil.loc[cid, "trail_silence_ms"]) == \
                int((len(pcm) - 1 - act[-1]) * 1000 / dsr)
            assert int(sil.loc[cid, "active_ms"]) == \
                int((act[-1] - act[0] + 1) * 1000 / dsr)


def test_semantic_dedup_vs_bruteforce(ray_session):
    """q_semantic_dedup vs a pure-numpy recompute with the SAME
    deterministic centroids: identical assignment and keep decisions."""
    import pyarrow.parquet as pq
    import ray

    from who_owns_mass_processing_ray.pipelines import vectors

    got = vectors.q_semantic_dedup(SF_DIR).to_pandas().set_index("vec_id")

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).combine_chunks()
    ids, m = vectors._batch_matrix(t)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    n_rows = len(ids)
    n_lists = max(2, min(16, n_rows // 32))
    sample_ref = ray.put((ids[:2048], m[:2048]))
    index = vectors.IVFIndex(sample_ref, n_lists)
    assign = index.assign(m, 1)[:, 0]
    keep = np.ones(n_rows, dtype=bool)
    for c in np.unique(assign):
        mem = np.flatnonzero(assign == c)       # ids sorted -> mem sorted
        sims = m[mem] @ m[mem].T
        tri = np.triu(sims >= 0.35, k=1)
        keep[mem] = ~tri.any(axis=0)
    assert len(got) == n_rows
    assert (got.loc[ids, "cluster"].to_numpy() == assign).all()
    assert (got.loc[ids, "keep"].to_numpy() == keep).all()
    assert 0 < keep.sum() < n_rows   # the op actually drops something


def test_audio_resample_spectral_vs_direct_decode(ray_session):
    """q_audio_resample and q_audio_spectral vs direct per-row recompute
    — exact equality (same numpy ops, independent driver-side path)."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    rs = multimodal.q_audio_resample(SF_DIR).to_pandas().set_index("clip_id")
    sp = multimodal.q_audio_spectral(SF_DIR).to_pandas().set_index("clip_id")
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:100]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        # resample recompute
        m = int(round(len(pcm) * 8000 / dsr))
        y = np.interp(np.arange(m, dtype=np.float64) / 8000,
                      np.arange(len(pcm), dtype=np.float64) / dsr,
                      pcm.astype(np.float64))
        assert int(rs.loc[cid, "n_out"]) == m
        assert int(rs.loc[cid, "sr_out"]) == 8000
        assert int(rs.loc[cid, "dur_out_ms"]) == int(m * 1000 / 8000)
        assert abs(rs.loc[cid, "rms_out"]
                   - round(float(np.sqrt(np.mean(y ** 2))), 4)) <= 1e-12
        # spectral recompute
        x = pcm.astype(np.float64)
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        mag = np.abs(np.fft.rfft(x))
        cen = float((np.fft.rfftfreq(len(x), 1.0 / dsr) * mag).sum()
                    / mag.sum()) if mag.sum() > 0 else 0.0
        assert abs(sp.loc[cid, "zcr"] - round(zcr, 6)) <= 1e-12
        assert abs(sp.loc[cid, "centroid_hz"] - round(cen, 2)) <= 1e-12


def test_dedup_report_vs_clusters_table(ray_session):
    """The one-row report must equal a pandas recompute over the SAME
    clusters table the flagship emits."""
    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    qs = m.queries()
    rep = qs["dedup_report"](sf)
    cl = qs["dedup_clusters"](sf).to_pandas()
    assert int(rep["n_clusters"].iloc[0]) == len(cl)
    assert int(rep["n_clips"].iloc[0]) == int(cl["size"].sum())
    dup = cl[cl["size"] > 1]
    assert int(rep["n_dup_clusters"].iloc[0]) == len(dup)
    assert int(rep["n_removable_clips"].iloc[0]) == int((dup["size"] - 1).sum())
    assert int(rep["dur_ms_total"].iloc[0]) == int(cl["total_dur_ms"].sum())
    for kind in ("exact", "near", "containment", "audio"):
        assert int(rep[f"{kind}_edges"].iloc[0]) == int(cl[f"{kind}_ct"].sum())
    want_pct = round(100.0 * (dup["size"] - 1).sum()
                     / max(int(cl["size"].sum()), 1), 2)
    assert float(rep["dup_ratio_pct"].iloc[0]) == want_pct


def test_audio_delta_dedup_vs_brute(ray_session):
    """q_audio_delta_dedup vs a single-process brute recompute: per-row
    decode + fingerprint in a plain Python loop, all incoming x snapshot
    hamming pairs — exact equality on counts, min match, and survival."""
    from who_owns_mass_processing_ray import audio
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    got = mm.q_audio_delta_dedup(SF_DIR).to_pandas()
    cfg = mm.MM_CFG
    clips = mm.clips_from_documents(SF_DIR).to_pandas()
    fps = {}
    for row in clips.itertuples():
        pcm, sr = audio.decode(row.bytes, row.codec)
        fps[row.clip_id] = audio.audio_fingerprint(
            pcm, sr, cfg.fp_num_bands, cfg.simhash_bits,
            cfg.fp_fmin_hz, cfg.fp_fmax_hz, cfg.seed)
    snap = sorted(c for c in fps
                  if int(c.rsplit("-", 1)[1]) % mm.AUDIO_DELTA_MOD == 0)
    incoming = sorted(c for c in fps if c not in set(snap))
    assert sorted(got.clip_id) == incoming
    idx = got.set_index("clip_id")
    n_dups = 0
    for c in incoming:
        ms = [s for s in snap
              if bin(fps[c] ^ fps[s]).count("1") <= cfg.hamming_thresh]
        row = idx.loc[c]
        assert row.n_snapshot_matches == len(ms), c
        assert bool(row.survives) == (not ms), c
        if ms:
            assert row.min_snapshot_match == ms[0], c
            n_dups += 1
    assert n_dups > 0, "corpus should contain planted audio dups"


def test_kmeans_fit_vs_numpy_lloyd(ray_session):
    """Distributed Lloyd (per-batch partial sums, two-level reduce) must
    reproduce the single-process numpy recompute with the same init:
    identical assignments, centroid-cosine parity to 1e-4."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from who_owns_mass_processing_ray.pipelines import vectors

    sf = "/root/testdata/sf0.001"
    df = vectors.q_kmeans_fit(sf).to_pandas().sort_values("vec_id")

    tb = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    ids = tb["vec_id"].to_numpy()
    m = pc.list_flatten(tb["embedding"].combine_chunks()) \
        .to_numpy(zero_copy_only=False).astype(np.float64) \
        .reshape(len(ids), -1)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    c = vectors.kmeans_init(sf)
    for _ in range(vectors.KMEANS_ITERS):
        a = (m @ c.T).argmax(axis=1)
        nc = c.copy()
        for j in range(len(c)):
            mem = m[a == j]
            if len(mem):
                nc[j] = mem.sum(axis=0) / len(mem)
        c = nc / np.maximum(np.linalg.norm(nc, axis=1, keepdims=True), 1e-12)
    sims = m @ c.T
    a = sims.argmax(axis=1)
    assert (df["cluster"].to_numpy() == a).all()
    cos = sims[np.arange(len(ids)), a]
    assert np.allclose(df["cosine"].to_numpy(), cos, atol=1.1e-4)


def test_audio_snippet_search_vs_brute(ray_session):
    """Exact recompute oracle: decode every clip single-process, rebuild
    token runs + snippet probes, count distinct shared run hashes per
    (query, clip) — the pipeline's hash-partition join must reproduce the
    table exactly, and every parent must be its query's top hit."""
    import numpy as np
    import pyarrow as pa

    from who_owns_mass_processing_ray import audio
    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    sf = "/root/testdata/sf0.001"
    got = mm.q_audio_snippet_search(sf).to_pandas()

    parts = list(mm.clips_from_documents(sf)
                 .iter_batches(batch_format="pyarrow", batch_size=256))
    tbl = pa.concat_tables(parts)
    anchors: dict[str, set[int]] = {}
    probes: dict[str, set[int]] = {}
    for i in range(tbl.num_rows):
        cid = tbl["clip_id"][i].as_py()
        pcm, sr = audio.decode(tbl["bytes"][i].as_py(),
                               tbl["codec"][i].as_py())
        toks = mm._frame_tokens(pcm, sr)
        if not len(toks):
            continue
        offs = np.array([0, len(toks)], np.int64)
        vals, _ = hx.token_shingle_hashes(toks, offs, mm.SNIP_RUN, seed=4242)
        anchors[cid] = set(vals.tolist())
        doc_i = int(cid.split("-")[1])
        if doc_i % mm.SNIP_PARENT_MOD == 0 and \
                int(tbl["dur_ms"][i].as_py()) >= 1300:
            lo, hi = mm._snippet_slice(len(toks))
            st = toks[lo:hi]
            if len(st) >= mm.SNIP_RUN:
                offs = np.array([0, len(st)], np.int64)
                qv, _ = hx.token_shingle_hashes(st, offs, mm.SNIP_RUN,
                                                seed=4242)
                probes["snip" + cid[4:]] = set(qv.tolist())

    expected = {}
    for q, qs in probes.items():
        for c, cs in anchors.items():
            n = len(qs & cs)
            if n >= 1:
                expected[(q, c)] = n
    got_pairs = {(r.query_id, r.clip_id): r.n_matching_runs
                 for r in got.itertuples()}
    assert got_pairs == expected
    # parent is the top hit of every query
    for q in probes:
        parent = "clip" + q[4:]
        hits = {c: n for (qq, c), n in expected.items() if qq == q}
        assert hits, q
        assert hits.get(parent, -1) == max(hits.values())


def test_compression_ratio_vs_recompute(ray_session, docs):
    """Per-row zlib recompute must match the pipeline exactly."""
    import zlib

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_compression_ratio(SF_DIR).to_pandas() \
        .set_index("doc_id")
    ids, texts = docs
    assert len(got) == sum(t is not None for t in texts)
    for i, s in zip(ids, texts):
        if s is None:
            continue
        b = s.encode("utf-8")
        r = len(zlib.compress(b, textops.ZRATIO_LEVEL)) / max(len(b), 1)
        assert int(got.loc[i, "n_bytes"]) == len(b)
        assert abs(float(got.loc[i, "z_ratio"]) - round(r, 4)) < 1e-9
        assert bool(got.loc[i, "low_entropy"]) == (r < textops.ZRATIO_LOW)


def test_knn_pq_scores_exact_and_recall(ray_session):
    """PQ/ADC + rerank: every emitted cosine must be the EXACT recompute
    from raw embeddings (rerank emits true scores, never ADC estimates),
    and shortlist recall vs q_knn_brute must clear 0.8 (measured 1.0 at
    the default parameters on this corpus)."""
    from who_owns_mass_processing_ray.pipelines import vectors

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    ids = emb["vec_id"].to_numpy()
    m = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    of = {int(v): j for j, v in enumerate(ids)}
    got = vectors.q_knn_pq(SF_DIR).to_pandas()
    assert len(got)
    for r in got.itertuples():
        exact = float(m[of[int(r.query_id)]] @ m[of[int(r.vec_id)]])
        assert abs(r.cosine - round(exact, 4)) <= 1e-9
    brute = vectors.q_knn_brute(SF_DIR).to_pandas()
    recs = []
    for q in brute["query_id"].unique():
        want = set(brute[brute.query_id == q]["vec_id"])
        have = set(got[got.query_id == q]["vec_id"])
        recs.append(len(want & have) / len(want))
    assert np.mean(recs) >= 0.8


def test_audio_transcode_vs_direct(ray_session):
    """Per-row recompute: the manifest's content hash must equal a direct
    single-process transcode of the same clip, and the transcoded blob must
    decode at >= 30 dB SNR vs a direct resample of the source PCM (the
    BASELINE per-row invariant applied to the bytes->bytes path)."""
    import hashlib

    from who_owns_mass_processing_ray import audio
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    sf = "/root/testdata/sf0.001"
    got = mm.q_audio_transcode(sf).to_pandas().set_index("clip_id")
    parts = list(mm.clips_from_documents(sf)
                 .iter_batches(batch_format="pyarrow", batch_size=256))
    tbl = pa.concat_tables(parts)
    checked = 0
    for i in range(min(tbl.num_rows, 100)):
        cid = tbl["clip_id"][i].as_py()
        buf = tbl["bytes"][i].as_py()
        codec = tbl["codec"][i].as_py()
        blob = mm.Transcoder.transcode_one(buf, codec)
        row = got.loc[cid]
        assert bool(row["transcode_ok"]) == (blob is not None)
        if blob is None:
            continue
        want_h = int.from_bytes(
            hashlib.blake2b(blob, digest_size=8).digest(),
            "little", signed=True)
        assert int(row["content_hash"]) == want_h
        assert int(row["n_bytes_out"]) == len(blob)
        # SNR invariant vs a direct resample of the source
        pcm, sr = audio.decode(buf, codec)
        m = max(int(round(len(pcm) * mm.TRANSCODE_SR / sr)), 1)
        src_t = np.arange(len(pcm), dtype=np.float64) / sr
        dst_t = np.arange(m, dtype=np.float64) / mm.TRANSCODE_SR
        ref = np.interp(dst_t, src_t, pcm.astype(np.float64))
        out_pcm, out_sr = audio.decode(blob, "pcm_s16le")
        assert out_sr == mm.TRANSCODE_SR
        assert audio.snr_db(ref.astype(np.float32), out_pcm) >= 30.0
        checked += 1
    assert checked >= 50


def test_longest_repeat_vs_brute(ray_session, docs):
    """Brute oracle: binary search over L with a substring-set duplicate
    check (monotone: a repeat of length L implies one of L-1) must match
    the SA adjacent-LCP answer for every doc."""
    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_longest_repeat(SF_DIR).to_pandas().set_index("doc_id")
    ids, texts = docs

    def brute(b: bytes) -> int:
        def has_rep(L: int) -> bool:
            seen = set()
            for j in range(len(b) - L + 1):
                s = b[j:j + L]
                if s in seen:
                    return True
                seen.add(s)
            return False

        lo, hi = 0, len(b) - 1   # answer in [lo, hi]
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if has_rep(mid):
                lo = mid
            else:
                hi = mid - 1
        return lo

    for i, s in list(zip(ids, texts))[:120]:
        if s is None:
            continue
        b = s.encode("utf-8")
        assert int(got.loc[i, "max_repeat_len"]) == brute(b), i


def test_audio_pitch_vs_direct_decode(ray_session):
    """q_audio_pitch vs direct per-row autocorrelation recompute — exact
    equality, plus a synthetic pure-tone sanity check (known f0)."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    pt = multimodal.q_audio_pitch(SF_DIR).to_pandas().set_index("clip_id")
    t = _docs_table()
    n_voiced = 0
    for i in t["doc_id"].to_pylist()[:60]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        lag_max = int(dsr / multimodal.PitchStats.F_LO)
        lag_min = max(int(dsr / multimodal.PitchStats.F_HI), 1)
        if dsr <= 0 or len(pcm) <= lag_max or lag_min >= lag_max:
            assert pt.loc[cid, "f0_hz"] == 0.0
            continue
        x = pcm.astype(np.float64)
        x = x - x.mean()
        e = float(np.dot(x, x))
        if e <= 0:
            assert pt.loc[cid, "f0_hz"] == 0.0
            continue
        nfft = 1 << int(np.ceil(np.log2(len(x) + lag_max)))
        spec = np.fft.rfft(x, nfft)
        ac = np.fft.irfft(spec * np.conj(spec), nfft)[:lag_max + 1]
        band = ac[lag_min:lag_max + 1] / e
        k = int(np.argmax(band))
        assert abs(pt.loc[cid, "f0_hz"] - round(dsr / (lag_min + k), 2)) \
            <= 1e-12
        assert abs(pt.loc[cid, "voicing"] - round(float(band[k]), 4)) \
            <= 1e-12
        n_voiced += int(band[k] > 0.3)
    assert n_voiced > 0   # the synthetic corpus has periodic content

    # known-pitch sanity: a clean 200 Hz tone must estimate ~200 Hz
    sr = 16000
    tt = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 200.0 * tt)).astype(np.float32)
    lag_max = int(sr / multimodal.PitchStats.F_LO)
    lag_min = max(int(sr / multimodal.PitchStats.F_HI), 1)
    x = tone.astype(np.float64) - tone.mean()
    nfft = 1 << int(np.ceil(np.log2(len(x) + lag_max)))
    spec = np.fft.rfft(x, nfft)
    ac = np.fft.irfft(spec * np.conj(spec), nfft)[:lag_max + 1]
    band = ac[lag_min:lag_max + 1] / float(np.dot(x, x))
    f0 = sr / (lag_min + int(np.argmax(band)))
    assert abs(f0 - 200.0) < 5.0


def test_quantile_sketch_rank_error(ray_session):
    """The hash-sample quantile estimates must sit within rank-eps of the
    TRUE grouped quantiles (the exact path the sketch replaces at scale):
    |F_type(est) - q| <= 0.05 with the default 5% sample (rank RSE
    ~ sqrt(q(1-q)/m))."""
    import duckdb

    from who_owns_mass_processing_ray.pipelines import relational

    import numpy as np

    sf = "/root/testdata/sf0.01"   # enough rows for the bound to bind
    # rate=0.25 so every per-type sample is big enough (~500) for the
    # normal rank bound to hold even at q=0.99 (at the default 5% the max-
    # order-statistic bias at m~50-90 makes the extreme quantile a Beta
    # tail, not a Gaussian)
    est = relational.q_quantile_sketch(sf, rate=0.25).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    full = con.sql("SELECT event_type, value FROM events").df()
    assert est.n_sample.min() > 50
    for _, row in est.iterrows():
        vals = full[full.event_type == row.event_type].value.to_numpy()
        rank = float((vals <= row.value_est).mean())
        eps = 4.0 * np.sqrt(row.q * (1 - row.q) / row.n_sample) \
            + 2.0 / row.n_sample
        assert abs(rank - row.q) <= eps, \
            f"{row.event_type} q={row.q}: est rank {rank} (eps {eps:.4f})"


def test_feature_hash_vs_pure_python(ray_session):
    """q_feature_hash vs a per-doc pure-Python dict recompute (same hash
    function driver-side, independent accumulation path), plus the
    similarity property the embedding exists for: identical texts -> cosine
    exactly 1."""
    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import textops

    D = textops.FEATURE_HASH_DIM
    got = textops.q_feature_hash(SF_DIR).to_pandas().set_index("doc_id")
    t = _docs_table()
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    for i, txt in list(zip(ids, texts))[:80]:
        toks = txt.split(" ")
        h = hx.hash_strings(pa.array(toks), seed=1729)
        vec = np.zeros(D)
        for hh in h:
            # int() first: np.uint64 % python-int silently promotes to
            # float64 and corrupts the residue for large hashes
            vec[int(hh) % D] += 1.0 if (int(hh) >> 32) & 1 else -1.0
        norm = float(np.sqrt((vec * vec).sum()))
        row = got.loc[i]
        assert int(row.n_tokens) == len(toks)
        assert abs(row.norm - round(norm, 4)) <= 1e-12
        want = vec / (norm if norm > 0 else 1.0)
        np.testing.assert_allclose(
            np.frombuffer(row.embedding, np.float32).astype(np.float64),
            want, atol=1e-6)
    # embedding properties: unit L2 norm wherever norm > 0, and the query
    # is a pure function of the corpus (bit-identical on a second run)
    nz = got[got.norm > 0]
    assert len(nz) > 0
    mats = np.array([np.frombuffer(e, np.float32).astype(np.float64)
                     for e in nz.embedding[:50]])
    np.testing.assert_allclose(np.sqrt((mats * mats).sum(axis=1)), 1.0,
                               atol=1e-6)
    again = textops.q_feature_hash(SF_DIR).to_pandas().set_index("doc_id")
    assert got.norm.equals(again.norm)


def test_audio_qc_vs_direct_decode(ray_session):
    """q_audio_qc vs per-row recompute (same DSP, independent driver-side
    path) + a constructed clipped-square-wave sanity check."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    qc = multimodal.q_audio_qc(SF_DIR).to_pandas().set_index("clip_id")
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:60]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        x = pcm.astype(np.float64)
        peak = np.abs(x).max()
        cf = float(np.mean(np.abs(x) >= 0.999 * peak)) if peak > 0 else 0.0
        assert abs(qc.loc[cid, "clip_frac"] - np.round(cf, 6)) <= 1e-12
        assert abs(qc.loc[cid, "dc_offset"]
                   - np.round(float(x.mean()), 6)) <= 1e-12
        flen = max(int(dsr * 32 / 1000), 1)
        nf = len(x) // flen
        if nf >= 2:
            e = np.sort((x[:nf * flen].reshape(nf, flen) ** 2).mean(axis=1))
            want = 10.0 * np.log10(max(e[int(0.9 * (nf - 1))], 1e-12)
                                   / max(e[int(0.1 * (nf - 1))], 1e-12))
            assert abs(qc.loc[cid, "snr_db"] - np.round(want, 2)) <= 1e-12
    # a hard-clipped square wave is ~100% at full scale
    sq = np.sign(np.sin(2 * np.pi * 100 * np.arange(8000) / 8000)) \
        .astype(np.float64)
    assert float(np.mean(np.abs(sq) >= 0.999 * np.abs(sq).max())) > 0.99


def test_knn_join_ivf_recall_and_exact_scores(ray_session):
    """The IVF kNN join must (a) never mis-score an emitted edge (cosines
    exact vs raw embeddings) and (b) keep neighbor recall >= 0.7 vs the
    exact join at the default nprobe."""
    from who_owns_mass_processing_ray.pipelines import vectors

    exact = vectors.q_knn_join(SF_DIR).to_pandas()
    ivf = vectors.q_knn_join_ivf(SF_DIR).to_pandas()
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    m = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    of = {int(v): i for i, v in enumerate(emb["vec_id"].to_numpy())}
    for r in ivf.itertuples():
        true = float(m[of[int(r.vec_id)]] @ m[of[int(r.neighbor_id)]])
        assert abs(r.cosine - round(true, 4)) <= 1e-9
    e = set(zip(exact.vec_id, exact.neighbor_id))
    i = set(zip(ivf.vec_id, ivf.neighbor_id))
    recall = len(e & i) / len(e)
    assert recall >= 0.85, f"kNN-join IVF recall {recall}"
    assert ivf.groupby("vec_id").size().max() <= 3


def test_embedding_pca_vs_numpy(ray_session):
    """Distributed moment-pass PCA vs a single-shot numpy PCA over the whole
    table — projections must agree to float tolerance, and the components
    must actually explain the most variance (eigenvalues descending)."""
    from who_owns_mass_processing_ray.pipelines import vectors

    got = vectors.q_embedding_pca(SF_DIR).to_pandas().set_index("vec_id")
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    ids = emb["vec_id"].to_numpy()
    m = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    mu = m.mean(axis=0)
    cov = np.cov(m.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    proj = (m - mu) @ comps.T
    assert w[order][0] >= w[order][1] > 0
    np.testing.assert_allclose(
        got.loc[ids, ["pc1", "pc2"]].to_numpy(), np.round(proj, 4),
        atol=2e-4)


def test_dup_graph_pagerank_vs_dense_numpy(ray_session):
    """Distributed power iteration vs an independent DENSE-matrix PageRank
    over the same Jaccard graph — elementwise parity, plus ranks sum to
    ~1 and every node gets mass > teleport floor."""
    import duckdb

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_dup_graph_pagerank(SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'")
    e = con.sql("""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
                FROM documents)),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.l, i.r FROM inter i
        JOIN sz sa ON sa.doc_id = i.l
        JOIN sz sb ON sb.doc_id = i.r
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.7
    """).df()
    nodes = np.array(sorted(set(e.l) | set(e.r)), dtype=np.int64)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for l, r in zip(e.l, e.r):
        A[idx[l], idx[r]] = 1.0
        A[idx[r], idx[l]] = 1.0
    deg = A.sum(axis=1)
    rank = np.full(n, 1.0 / n)
    for _ in range(20):
        rank = (1 - 0.85) / n + 0.85 * (A.T @ (rank / deg))
    want = np.round(rank, 6)
    assert len(got) == n
    np.testing.assert_allclose(
        got.set_index("doc_id").loc[nodes, "pagerank"].to_numpy(), want,
        atol=1e-9)
    assert abs(got.pagerank.sum() - 1.0) < 1e-3
    assert (got.pagerank > (1 - 0.85) / n - 1e-12).all()


def test_bpe_train_vs_dict_reference(ray_session):
    """q_bpe_train vs a from-scratch dict-based BPE trainer (classic
    Sennrich reference shape: dict of symbol tuples -> counts) — merge
    sequence and pair counts must agree exactly."""
    from collections import Counter

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_bpe_train(SF_DIR)
    t = _docs_table()
    wc = Counter()
    for txt in t["text"].to_pylist():
        if txt:
            for w in txt.split(" "):
                if w:
                    wc[w + "_"] += 1
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for rank in range(20):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym[:-1], sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, c))
        new_vocab = {}
        for sym, cnt in vocab.items():
            res, j = [], 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == l and sym[j + 1] == r:
                    res.append(l + r)
                    j += 2
                else:
                    res.append(sym[j])
                    j += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + cnt
        vocab = new_vocab
    assert len(got) == len(merges)
    for row, (rank, l, r, c) in zip(got.itertuples(), merges):
        assert (row.merge_rank, row.left, row.right, row.pair_count) \
            == (rank, l, r, c)


def test_bpe_encode_vs_scratch_encoder(ray_session):
    """q_bpe_encode vs a from-scratch encoder that re-tokenizes every doc
    by applying the LEARNED merges (from the engine's own parity-gated
    q_bpe_train) in rank order, leftmost-first — the standard BPE encode
    loop, sharing no code with the pipeline's end-of-training-sequence
    shortcut."""
    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_bpe_encode(SF_DIR).to_pandas().set_index("doc_id")
    merges = [(row.left, row.right)
              for row in textops.q_bpe_train(SF_DIR).itertuples()]

    def encode_word(w: str) -> int:
        sym = list(w + "_")   # marker-suffixed, split to chars like training
        for l, r in merges:
            j, res = 0, []
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == l and sym[j + 1] == r:
                    res.append(l + r)
                    j += 2
                else:
                    res.append(sym[j])
                    j += 1
            sym = res
        return len(sym)

    cache: dict[str, int] = {}
    t = _docs_table()
    for doc_id, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if txt is None:
            assert doc_id not in got.index
            continue
        words = [w for w in txt.split(" ") if w]
        n_tok = sum(cache.setdefault(w, encode_word(w)) for w in words)
        row = got.loc[doc_id]
        assert int(row.n_words) == len(words)
        assert int(row.n_tokens) == n_tok
        if words:
            assert abs(row.tokens_per_word - n_tok / len(words)) < 5e-4


def test_cluster_purity_vs_numpy(ray_session):
    """q_cluster_purity vs a single-process recompute: same Lloyd
    assignments (already parity-gated), contingency + purity + NMI redone
    with plain dict/numpy."""
    from who_owns_mass_processing_ray.pipelines import vectors

    got = vectors.q_cluster_purity(SF_DIR)
    fit = vectors.q_kmeans_fit(SF_DIR).to_pandas()
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    m = fit.merge(emb, on="vec_id")
    N = len(m)
    clusters = sorted(m.cluster.unique())
    labels = sorted(m.label.unique())
    M = np.zeros((len(clusters), len(labels)))
    for (c, l), n in m.groupby(["cluster", "label"]).size().items():
        M[clusters.index(c), labels.index(l)] = n
    purity = M.max(axis=1).sum() / N
    P = M / N
    pr, pc_ = P.sum(axis=1), P.sum(axis=0)
    mi = sum(P[i, j] * np.log(P[i, j] / (pr[i] * pc_[j]))
             for i in range(len(clusters)) for j in range(len(labels))
             if P[i, j] > 0)
    hr = -sum(p * np.log(p) for p in pr if p > 0)
    hc = -sum(p * np.log(p) for p in pc_ if p > 0)
    nmi = mi / ((hr + hc) / 2)
    assert len(got) == len(clusters)
    assert abs(got.overall_purity.iloc[0] - round(purity, 4)) <= 1e-9
    assert abs(got.nmi.iloc[0] - round(nmi, 4)) <= 1e-9
    for _, r in got.iterrows():
        i = clusters.index(r.cluster)
        assert r.n == int(M[i].sum())
        assert r.majority_label == labels[int(M[i].argmax())]
    assert 0.0 < got.nmi.iloc[0] <= 1.0


def test_ann_recall_eval_consistent(ray_session):
    """The recall report must agree with a direct recompute from the two
    underlying query outputs, and its mean must match the suite's own
    recall gate regime (>= 0.8)."""
    from who_owns_mass_processing_ray.pipelines import vectors

    rep = vectors.q_ann_recall_eval(SF_DIR)
    brute = vectors.q_knn_brute(SF_DIR).to_pandas()
    ivf = vectors.q_knn_ivf(SF_DIR).to_pandas()
    for _, r in rep.iterrows():
        b = set(brute[brute.query_id == r.query_id].vec_id)
        i = set(ivf[ivf.query_id == r.query_id].vec_id)
        assert r.n_hits == len(b & i)
        assert abs(r.recall_at_k - round(len(b & i) / len(b), 4)) <= 1e-12
    assert rep.recall_at_k.mean() >= 0.8


def test_audio_vad_segments_vs_direct_decode(ray_session):
    """q_audio_vad_segments vs a per-row pure recompute of the same VAD
    rule, plus structural invariants (ordered, non-overlapping, inside the
    clip)."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    vad = multimodal.q_audio_vad_segments(SF_DIR).to_pandas()
    by_clip = dict(tuple(vad.groupby("clip_id")))
    t = _docs_table()
    n_with_segments = 0
    C = multimodal.VadSegments
    for i in t["doc_id"].to_pylist()[:50]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        flen = max(int(dsr * C.FRAME_MS / 1000), 1)
        nf = len(pcm) // flen
        want = []
        if nf >= 1:
            x = pcm[:nf * flen].astype(np.float64).reshape(nf, flen)
            e = (x ** 2).mean(axis=1)
            ref = np.sort(e)[int(0.9 * (nf - 1))]
            idx = np.flatnonzero(e >= C.REL_THRESH * ref)
            if len(idx):
                gaps = np.flatnonzero(np.diff(idx) > C.BRIDGE + 1)
                starts = np.r_[idx[0], idx[gaps + 1]]
                ends = np.r_[idx[gaps], idx[-1]] + 1
                for s, en in zip(starts, ends):
                    if en - s >= C.MIN_FRAMES:
                        seg = pcm[s * flen:en * flen].astype(np.float64)
                        want.append((int(s * flen * 1000 / dsr),
                                     int(en * flen * 1000 / dsr),
                                     round(float(np.sqrt((seg ** 2).mean())),
                                           4)))
        got = by_clip.get(cid)
        got_rows = ([] if got is None else
                    list(zip(got.start_ms, got.end_ms, got.rms)))
        assert len(got_rows) == len(want), cid
        for (gs, ge, gr), (ws, we, wr) in zip(got_rows, want):
            assert (gs, ge) == (ws, we)
            assert abs(gr - wr) <= 1e-12
        if want:
            n_with_segments += 1
            # structural: ordered, non-overlapping, inside the clip
            for j in range(1, len(got_rows)):
                assert got_rows[j][0] >= got_rows[j - 1][1]
            assert got_rows[-1][1] <= int(len(pcm) * 1000 / dsr) + 1
    assert n_with_segments > 0


def test_lang_agreement_vs_direct_join(ray_session):
    """q_lang_agreement vs a pandas recompute joining q_lang_id to the
    documents metadata — exact per-source counts."""
    import pandas as pd

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_lang_agreement(SF_DIR).to_pandas().set_index("source")
    pred = textops.q_lang_id(SF_DIR).to_pandas()
    meta = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "lang", "source"]).to_pandas()
    m = meta.merge(pred[["doc_id", "lang_pred"]], on="doc_id", how="left")
    for src, g in m.groupby("source"):
        agree = int((g.lang_pred == g.lang).sum())
        assert int(got.loc[src, "n_docs"]) == len(g)
        assert int(got.loc[src, "n_agree"]) == agree
        assert abs(got.loc[src, "agree_rate"]
                   - round(agree / len(g), 4)) <= 1e-9


def test_audio_mel_stats_vs_direct_decode(ray_session):
    """q_audio_mel_stats vs a per-row recompute with an independently
    constructed filterbank, plus monotone-band sanity on a pure tone (the
    band containing the tone frequency dominates)."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.pipelines import multimodal

    C = multimodal.MelStats
    got = multimodal.q_audio_mel_stats(SF_DIR).to_pandas() \
        .set_index("clip_id")
    helper = C()
    t = _docs_table()
    for i in t["doc_id"].to_pylist()[:40]:
        params = synth._base_params(1234, int(i) % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (int(i) % 7) * 150
        buf = audio.encode(synth._waveform(params, sr, dur), sr, codec)
        pcm, dsr = audio.decode(buf, codec)
        cid = f"clip-{int(i):012d}"
        flen = max(int(dsr * C.FRAME_MS / 1000), 16)
        nf = len(pcm) // flen
        if nf < 1:
            assert not got.loc[cid, "mel_ok"]
            continue
        x = pcm[:nf * flen].astype(np.float64).reshape(nf, flen)
        spec = np.abs(np.fft.rfft(x, axis=1)) ** 2
        mel = spec @ helper._bank(dsr, flen).T
        want = np.log10(np.maximum(mel.mean(axis=0), 1e-12))
        assert got.loc[cid, "mel_ok"]
        for b in range(C.N_BANDS):
            assert abs(got.loc[cid, f"mel{b}"]
                       - np.round(want[b], 4)) <= 1e-12
    # pure 1 kHz tone at 16 kHz: its band must carry the max energy
    sr = 16000
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * np.arange(sr) / sr)) \
        .astype(np.float64)
    flen = max(int(sr * C.FRAME_MS / 1000), 16)
    nf = len(tone) // flen
    x = tone[:nf * flen].reshape(nf, flen)
    spec = np.abs(np.fft.rfft(x, axis=1)) ** 2
    bank = helper._bank(sr, flen)
    mel = (spec @ bank.T).mean(axis=0)
    freqs = np.fft.rfftfreq(flen, 1.0 / sr)
    # the winning band's filter must respond at 1 kHz
    k = int(np.argmin(np.abs(freqs - 1000.0)))
    assert bank[int(np.argmax(mel)), k] > 0


def test_dup_graph_kcore_vs_peeling(ray_session):
    """q_dup_graph_kcore vs an independent dict-based peeling over the
    same exact-Jaccard edge set (default core_k=2: the triangle/cycle
    cores of this corpus — size 4 for k=3 at sf0.001 but EMPTY at sf0.01,
    so 2 is the default that stays non-trivial at every test scale)."""
    import duckdb

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_dup_graph_kcore(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'")
    e = con.sql("""
        WITH g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(u AS INTEGER), 5) AS gram
          FROM (SELECT doc_id, text,
                unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u
                FROM documents)),
        sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.l, i.r FROM inter i
        JOIN sz sa ON sa.doc_id = i.l
        JOIN sz sb ON sb.doc_id = i.r
        WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.5
    """).df()
    adj: dict = {}
    for l, r in zip(e.l, e.r):
        adj.setdefault(l, set()).add(r)
        adj.setdefault(r, set()).add(l)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 2:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    want = {v: len(nbrs) for v, nbrs in adj.items()}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[r.doc_id] == r.degree_in_core
    assert len(want) > 0   # the corpus must actually have a 3-core


def test_dup_graph_modularity_vs_networkx(ray_session):
    """Engine modularity vs networkx.algorithms.community.modularity over
    the same graph and partition (independent implementation)."""
    import networkx as nx

    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_dup_graph_modularity(SF_DIR)
    pairs = textops.q_minhash_near_dup(SF_DIR).to_pandas()
    G = nx.Graph()
    G.add_edges_from(zip(pairs.left_id, pairs.right_id))
    comms = list(nx.connected_components(G))
    want = nx.algorithms.community.modularity(G, comms)
    assert int(got.n_edges.iloc[0]) == G.number_of_edges()
    assert int(got.n_groups.iloc[0]) == len(comms)
    assert abs(got.modularity.iloc[0] - round(want, 6)) <= 1e-6
    assert got.modularity.iloc[0] > 0   # clustering beats chance


def test_modality_disagreement_consistent(ray_session):
    """The disagreement table must be the exact set algebra of its two
    source queries, and the synthetic corpus (audio independent of text)
    must actually produce disagreement rows."""
    from who_owns_mass_processing_ray.pipelines import multimodal, textops

    rep = multimodal.q_modality_disagreement(SF_DIR)
    text = textops.q_minhash_near_dup(SF_DIR).to_pandas()
    aud = multimodal.q_audio_shingle_near_dup(SF_DIR).to_pandas()
    tset = {(int(a), int(b)) for a, b in zip(text.left_id, text.right_id)}
    aset = {tuple(sorted((int(a.rsplit("-", 1)[1]),
                          int(b.rsplit("-", 1)[1]))))
            for a, b in zip(aud.left_id, aud.right_id)}
    assert len(rep) == len(tset | aset)
    for _, r in rep.iterrows():
        assert r.in_text == ((r.doc_a, r.doc_b) in tset)
        assert r.in_audio == ((r.doc_a, r.doc_b) in aset)
        want = ("both" if r.in_text and r.in_audio
                else ("text_only" if r.in_text else "audio_only"))
        assert r.agreement == want
    assert (rep.agreement != "both").any()
    assert len(rep) > 0


def test_audio_dtw_near_dup(ray_session):
    """q_audio_dtw_near_dup: (1) recall 1.0 on the planted +-8%
    speed-perturbed copies (the capability none of the other audio passes
    has); (2) every emitted pair's cost re-verified by the independent
    min-over-shifts brute DP (the pipeline's single-shift cost upper-bounds
    it, so acceptance implies brute acceptance — recomputed here from the
    decoded PCM, not trusted from the pipeline)."""
    from who_owns_mass_processing_ray import audio
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    df = mm.q_audio_dtw_near_dup(SF_DIR).to_pandas()
    ids = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    planted = {(f"clip-{i:012d}", f"clip-{i:012d}-sp")
               for i in ids if i % mm.DTW_STRETCH_MOD == 0}
    got = set(zip(df.left_id, df.right_id))
    got |= {(b, a) for a, b in got}
    assert planted, "corpus too small to plant stretched copies"
    missed = [p for p in planted if p not in got]
    assert not missed, f"planted stretched pairs missed: {missed[:5]}"

    # independent re-verification of a deterministic sample of emitted
    # pairs: recompute band frames from re-synthesized PCM and check the
    # brute min-shift DTW cost agrees with the emitted cost within rounding
    feats = {}

    def frames_for(cid: str) -> np.ndarray:
        if cid not in feats:
            from who_owns_mass_processing_ray import synth
            base = int(cid.split("-")[1])
            params = synth._base_params(1234, base % 997)
            sr = params["sr_hz"]
            dur = 400 + (base % 7) * 150
            pcm = synth._waveform(params, sr, dur)
            if cid.endswith("-sp"):
                r = 1.08 if (base // mm.DTW_STRETCH_MOD) % 2 else 0.92
                n_out = max(int(round(len(pcm) / r)), 1)
                pcm = np.interp(np.arange(n_out) * r / sr,
                                np.arange(len(pcm)) / sr,
                                pcm).astype(np.float32)
            # roundtrip through the codec like the pipeline does
            pcm2, sr2 = audio.decode(
                audio.encode(pcm, sr, params["codec"]), params["codec"])
            feats[cid] = mm._dtw_band_frames(pcm2, sr2)
        return feats[cid]

    sample = df.sort_values(["left_id", "right_id"]).iloc[::37]
    for _, row in sample.iterrows():
        brute = mm._dtw_cost(frames_for(row.left_id),
                             frames_for(row.right_id))
        assert brute <= row.dtw_cost + 5e-4   # single-shift >= min-shift
        assert brute <= mm.DTW_THRESH + 5e-4


def test_near_dup_delta_band_index_parity(ray_session, tmp_path):
    """The persisted-band-index refresh path must produce the IDENTICAL
    pair set as the recompute-everything path — the guarantee that lets a
    100 TB corpus build its signature index once and pay per-refresh cost
    proportional to the delta."""
    from who_owns_mass_processing_ray.pipelines import textops as tx

    idx_dir = str(tmp_path / "band_index")
    n = tx.build_band_index(SF_DIR, idx_dir)
    assert n > 0

    base = tx.q_near_dup_delta(SF_DIR).to_pandas()
    indexed = tx.q_near_dup_delta(SF_DIR, band_index_dir=idx_dir).to_pandas()
    assert len(base) == len(indexed)
    for col in ("left_id", "right_id", "jaccard", "link_type"):
        assert (base[col].values == indexed[col].values).all(), col
    assert len(base) > 0


def test_near_dup_groups_labelprop_parity(ray_session):
    """Forcing the distributed star-contraction path (dsu_edge_limit=0)
    must reproduce the driver-DSU group table exactly — including numeric
    min-root semantics through the zero-padded string ids."""
    import dataclasses

    from who_owns_mass_processing_ray.pipelines import textops as tx
    from who_owns_mass_processing_ray.pipelines.textops import DOCS_CFG

    base = tx.q_near_dup_groups(SF_DIR).to_pandas()
    forced = tx.q_near_dup_groups(
        SF_DIR, dataclasses.replace(DOCS_CFG, dsu_edge_limit=0)).to_pandas()
    assert len(base) == len(forced) > 0
    assert (base.doc_id.values == forced.doc_id.values).all()
    assert (base.group_id.values == forced.group_id.values).all()


def test_incremental_components_labelprop_parity(ray_session):
    """q_incremental_components' two component reduces route through the
    gated _groups_from_pairs — forcing the distributed path
    (dsu_edge_limit=0) must reproduce the driver-DSU assignment exactly."""
    import dataclasses

    from who_owns_mass_processing_ray.pipelines import textops as tx
    from who_owns_mass_processing_ray.pipelines.textops import DOCS_CFG

    base = tx.q_incremental_components(SF_DIR).to_pandas()
    forced = tx.q_incremental_components(
        SF_DIR, cfg=dataclasses.replace(DOCS_CFG, dsu_edge_limit=0)
    ).to_pandas()
    assert len(base) == len(forced) > 0
    assert (base.doc_id.values == forced.doc_id.values).all()
    assert (base.group_id.values == forced.group_id.values).all()


def test_dup_graph_modularity_labelprop_parity(ray_session):
    """Same forced-path parity for the distributed modularity pipeline."""
    import dataclasses

    from who_owns_mass_processing_ray.pipelines import textops as tx
    from who_owns_mass_processing_ray.pipelines.textops import DOCS_CFG

    base = tx.q_dup_graph_modularity(SF_DIR)
    forced = tx.q_dup_graph_modularity(
        SF_DIR, cfg=dataclasses.replace(DOCS_CFG, dsu_edge_limit=0))
    assert base.equals(forced)


def test_tfidf_cosine_pairs_vs_bruteforce(ray_session):
    """Exact tf-idf cosine join vs a brute-force all-pairs numpy recompute
    on a synthetic corpus with planted near-dups — proves the AllPairs
    cosine prefix filter is COMPLETE (no pair lost to blocking) and the
    weighting scheme (tf = count, idf = log10(N/df)) is what's claimed."""
    import ray.data as rd

    from who_owns_mass_processing_ray.pipelines.textops import (
        COSINE_PAIR_THRESH,
        cosine_pairs_ds,
    )

    rng = np.random.default_rng(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
             "kappa", "lambda", "sigma"]
    texts = []
    for i in range(60):
        n = int(rng.integers(6, 14))
        texts.append(" ".join(rng.choice(words, n)))
    # planted near-dups: single-word edits of earlier docs
    for i in range(20):
        base = texts[i].split()
        j = int(rng.integers(0, len(base)))
        base[j] = str(rng.choice(words))
        texts.append(" ".join(base))
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = cosine_pairs_ds(ds).to_pandas()

    # brute force: char-3-grams over whitespace-stripped text
    k = 3
    grams_of = []
    for t in texts:
        s = "".join(t.split())
        grams_of.append([s[i:i + k] for i in range(len(s) - k + 1)]
                        if len(s) >= k else ([s] if s else []))
    df: dict[str, int] = {}
    for gs in grams_of:
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    n_docs = sum(1 for gs in grams_of if gs)
    import math

    vecs = []
    for gs in grams_of:
        tf: dict[str, int] = {}
        for g in gs:
            tf[g] = tf.get(g, 0) + 1
        w = {g: c * math.log10(n_docs / df[g]) for g, c in tf.items()
             if df[g] < n_docs}
        nn = math.sqrt(sum(x * x for x in w.values()))
        vecs.append((w, nn))
    expect = {}
    for a in range(len(texts)):
        wa, na = vecs[a]
        if na == 0:
            continue
        for b in range(a + 1, len(texts)):
            wb, nb = vecs[b]
            if nb == 0:
                continue
            dot = sum(wa[g] * wb.get(g, 0.0) for g in wa)
            cos = dot / (na * nb)
            if cos >= COSINE_PAIR_THRESH:
                expect[(a, b)] = round(cos, 4)

    got_pairs = {(int(r.left_id), int(r.right_id)): float(r.cosine)
                 for r in got.itertuples()}
    assert set(got_pairs) == set(expect)
    assert expect, "test corpus must plant at least one qualifying pair"
    for p, c in expect.items():
        assert abs(got_pairs[p] - c) < 2e-4, (p, got_pairs[p], c)


def test_cosine_clusters_match_pair_components(ray_session):
    """q_cosine_clusters == connected components over q_tfidf_cosine_pairs
    (python DSU recompute)."""
    from who_owns_mass_processing_ray.pipelines.textops import (
        q_cosine_clusters,
        q_tfidf_cosine_pairs,
    )

    pairs = q_tfidf_cosine_pairs(SF_DIR).to_pandas()
    groups = q_cosine_clusters(SF_DIR).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        a, b = find(int(r.left_id)), find(int(r.right_id))
        if a != b:
            parent[max(a, b)] = min(a, b)
    expect = {x: find(x) for x in parent}
    got = {int(r.doc_id): int(r.group_id) for r in groups.itertuples()}
    assert got == expect


def test_constellation_offset_recovery_kernel():
    """The landmark voting kernel recovers WHERE a snippet sits in a
    non-stationary signal: white noise, snippet = samples [s0:s1), the
    modal (t1_clip - t1_snippet) must equal s0 // HOP exactly."""
    from who_owns_mass_processing_ray.pipelines.multimodal import (
        AMH_HOP,
        AMH_SR,
        constellation_landmarks,
    )

    rng = np.random.default_rng(7)
    pcm = rng.normal(0, 0.3, size=AMH_SR * 4).astype(np.float32)  # 4 s
    s0 = 37 * AMH_HOP                     # hop-aligned snippet start
    snip = pcm[s0: s0 + AMH_SR * 2]
    ch, ct = constellation_landmarks(pcm, AMH_SR)
    qh, qt = constellation_landmarks(snip, AMH_SR)
    assert len(ch) and len(qh)
    order = np.argsort(ch, kind="stable")
    ch, ct = ch[order], ct[order]
    lo = np.searchsorted(ch, qh, side="left")
    hi = np.searchsorted(ch, qh, side="right")
    offsets = []
    for i in range(len(qh)):
        for j in range(lo[i], hi[i]):
            offsets.append(int(ct[j]) - int(qt[i]))
    vals, counts = np.unique(np.array(offsets), return_counts=True)
    best = int(vals[np.argmax(counts)])
    assert best == s0 // AMH_HOP, (best, s0 // AMH_HOP)
    # the true offset must dominate: sharper than any competitor by 3x
    runner = np.sort(counts)[-2] if len(counts) > 1 else 0
    assert counts.max() >= 3 * max(runner, 1)


def test_constellation_match_recall(ray_session):
    """Corpus gate at sf0.001: >= 85% of query snippets match a clip of
    their own waveform-equivalence class (doc_id % 997 — the synth corpus
    reuses base params, so identical-audio twins are legitimate hits)."""
    from who_owns_mass_processing_ray.pipelines.multimodal import (
        q_audio_constellation_match,
    )

    out = q_audio_constellation_match(SF_DIR).to_pandas()
    assert len(out) >= 20
    ok = sum((int(r.query_id[5:]) % 997) == (int(r.clip_id[5:]) % 997)
             for r in out.itertuples())
    assert ok / len(out) >= 0.85, f"{ok}/{len(out)}"
    # determinism: rerun equality
    again = q_audio_constellation_match(SF_DIR).to_pandas()
    assert out.equals(again)


def test_quality_lr_vs_numpy_irls(ray_session):
    """Distributed IRLS == full-batch numpy IRLS (same features, ridge,
    iteration count) — coefficients and per-doc probabilities must agree;
    the fitted model must beat a majority-class baseline on its own
    training labels (the features genuinely predict lang)."""
    import pyarrow.compute as pc

    from who_owns_mass_processing_ray.pipelines.textops import (
        _LR_ITERS,
        _LR_RIDGE,
        _lr_feature_matrix,
        fit_quality_lr,
        q_quality_lr_filter,
    )

    tab = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    X, y, ids = _lr_feature_matrix(tab)

    beta = np.zeros(5)
    for _ in range(_LR_ITERS):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30)))
        w = np.maximum(p * (1.0 - p), 1e-6)
        z = eta + (y - p) / w
        G = X.T @ (X * w[:, None]) + _LR_RIDGE * np.eye(5)
        beta = np.linalg.solve(G, X.T @ (w * z))

    import ray.data as rd

    ds = rd.from_arrow(tab)
    got_beta = fit_quality_lr(ds)
    np.testing.assert_allclose(got_beta, beta, rtol=1e-6, atol=1e-8)

    out = q_quality_lr_filter(SF_DIR).to_pandas()
    p_full = 1.0 / (1.0 + np.exp(-np.clip(X @ beta, -30, 30)))
    expect = {int(i): round(float(v), 4)
              for i, v in zip(ids.to_pylist(), p_full)}
    assert len(out) == len(expect)
    for r in out.itertuples():
        assert abs(float(r.p_en) - expect[int(r.doc_id)]) <= 2e-4
    acc = float(np.mean((p_full >= 0.5) == (y > 0.5)))
    base = max(float(y.mean()), 1.0 - float(y.mean()))
    assert acc > base, (acc, base)


def test_audio_curation_funnel_vs_brute(ray_session):
    """The funnel's per-stage attrition vs a per-row brute recompute:
    synthesize every clip directly, gate on duration, dedup exact bytes
    with a dict, all-pairs signature-agreement near-dup + python DSU +
    keep-longest."""
    from who_owns_mass_processing_ray import audio, synth
    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.pipelines import multimodal as mm

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = sorted(int(x) for x in docs["doc_id"].to_pylist())
    rows = []
    for i in ids:
        params = synth._base_params(1234, i % 997)
        sr, codec = params["sr_hz"], params["codec"]
        dur = 400 + (i % 7) * 150
        pcm = synth._waveform(params, sr, dur)
        rows.append((f"clip-{i:012d}", audio.encode(pcm, sr, codec),
                     sr, dur, codec))
    n0, d0 = len(rows), sum(r[3] for r in rows)
    qc = [r for r in rows if r[3] >= mm.FUNNEL_MIN_DUR_MS]
    n1, d1 = len(qc), sum(r[3] for r in qc)
    seen: dict[bytes, str] = {}
    exact = []
    for r in sorted(qc, key=lambda r: r[0]):     # min clip_id kept
        if r[1] not in seen:
            seen[r[1]] = r[0]
            exact.append(r)
    n2, d2 = len(exact), sum(r[3] for r in exact)

    sigs = {}
    for cid, buf, sr, dur, codec in exact:
        pcm, sr2 = audio.decode(buf, codec)
        toks = mm._frame_tokens(pcm, sr2)
        if not len(toks):
            sigs[cid] = None
            continue
        offs = np.array([0, len(toks)], np.int64)
        vals, o2 = hx.token_shingle_hashes(toks, offs, mm.AMH_K,
                                           seed=mm.AMH_SEED)
        sigs[cid] = hx.minhash_signatures(vals, o2, mm.AMH_PERM,
                                          mm.AMH_SEED)[0]
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cids = [r[0] for r in exact]
    for a in range(len(cids)):
        for b in range(a + 1, len(cids)):
            sa, sb = sigs[cids[a]], sigs[cids[b]]
            if sa is None or sb is None:
                continue
            if (sa == sb).mean() >= mm.AMH_THRESH:
                ra, rb = find(cids[a]), find(cids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    by_root: dict[str, list] = {}
    dur_of = {r[0]: r[3] for r in exact}
    survivors = set()
    for cid in cids:
        if cid in parent:
            by_root.setdefault(find(cid), []).append(cid)
        else:
            survivors.add(cid)
    for root, members in by_root.items():
        members.sort(key=lambda c: (-dur_of[c], c))
        survivors.add(members[0])
    n3 = len(survivors)
    d3 = sum(dur_of[c] for c in survivors)

    got = mm.q_audio_curation_funnel(SF_DIR).to_pandas() \
        .set_index("stage")
    expect = {"input": (n0, d0, 0), "qc": (n1, d1, n0 - n1),
              "exact": (n2, d2, n1 - n2), "near": (n3, d3, n2 - n3)}
    for stage, (n, d, rm) in expect.items():
        assert int(got.loc[stage, "n_clips"]) == n, (stage, n)
        assert int(got.loc[stage, "total_dur_ms"]) == d, (stage, d)
        assert int(got.loc[stage, "n_removed"]) == rm, (stage, rm)
    assert n0 - n3 > 0, "funnel must remove something at sf0.001"


# -- bridge detection: synthetic property graphs + brute per-edge removal ---

def _brute_bridges(edges):
    """(u, v, {side sizes}) for every edge whose removal disconnects its
    component — by per-edge-removal DSU recount + BFS side sizes."""
    nodes = sorted({x for e in edges for x in e})

    def n_comps(es):
        parent = {v: v for v in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in es:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        return len({find(v) for v in nodes})

    base = n_comps(edges)
    out = set()
    for i, (u, v) in enumerate(edges):
        rest = edges[:i] + edges[i + 1:]
        if n_comps(rest) > base:
            # side sizes via BFS from u in the remaining graph
            adj = {}
            for a, b in rest:
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
            seen = {u}
            todo = [u]
            while todo:
                x = todo.pop()
                for y in adj.get(x, []):
                    if y not in seen:
                        seen.add(y)
                        todo.append(y)
            # component of the original edge = all nodes reachable incl. v
            comp = {u, v}
            adj2 = {}
            for a, b in edges:
                adj2.setdefault(a, []).append(b)
                adj2.setdefault(b, []).append(a)
            todo = [u]
            comp = {u}
            while todo:
                x = todo.pop()
                for y in adj2.get(x, []):
                    if y not in comp:
                        comp.add(y)
                        todo.append(y)
            s = len(seen)
            out.add((min(u, v), max(u, v),
                     frozenset({s, len(comp) - s})))
    return out


def test_find_bridges_properties():
    from who_owns_mass_processing_ray.pipelines.textops import _find_bridges

    # chain: every edge a bridge
    chain = [(1, 2), (2, 3), (3, 4)]
    got = {(min(a, b), max(a, b), frozenset({s, 4 - s}))
           for a, b, s in _find_bridges(chain)}
    assert got == _brute_bridges(chain)
    # clique: none
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert _find_bridges(k4) == []
    # barbell: two triangles + one bridge of sides 3/3
    bar = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = {(min(a, b), max(a, b), frozenset({s, 6 - s}))
           for a, b, s in _find_bridges(bar)}
    assert got == {(3, 4, frozenset({3}))}
    assert got == _brute_bridges(bar)
    # random graphs vs brute
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(4, 12))
        m = min(int(rng.integers(n - 1, n * 2)), n * (n - 1) // 2)
        es = set()
        while len(es) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                es.add((min(int(a), int(b)), max(int(a), int(b))))
        es = sorted(es)
        nn = len({x for e in es for x in e})
        got = {(min(a, b), max(a, b)) for a, b, _ in _find_bridges(es)}
        want = {(a, b) for a, b, _ in _brute_bridges(es)}
        assert got == want, (trial, es)


def test_dup_graph_bridges_vs_brute(ray_session):
    """Query-level: bridges of the sf0.001 near-dup graph vs the brute
    per-edge-removal recompute over the SAME verified pair set."""
    from who_owns_mass_processing_ray.pipelines import textops

    pairs = textops.q_minhash_near_dup(SF_DIR).to_pandas()
    edges = sorted(zip(pairs.left_id.astype(int),
                       pairs.right_id.astype(int)))
    want = _brute_bridges(edges)
    got_df = textops.q_dup_graph_bridges(SF_DIR).to_pandas()
    got = {(int(r.left_id), int(r.right_id),
            frozenset({int(r.side_small), int(r.side_large)}))
           for r in got_df.itertuples()}
    assert got == want
    assert len(got) > 0, "sf0.001 graph should contain at least one bridge"


def _brute_articulation(edges):
    nodes = sorted({x for e in edges for x in e})

    def comps(ns, es):
        parent = {v: v for v in ns}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in es:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        return len({find(v) for v in ns})

    base = comps(nodes, edges)
    out = set()
    for v in nodes:
        ns = [x for x in nodes if x != v]
        es = [e for e in edges if v not in e]
        c = comps(ns, es)
        if c > base:   # v's component fell into c - base + 1 parts
            out.add((v, c - base + 1))
    return out


def test_find_articulation_properties():
    from who_owns_mass_processing_ray.pipelines.textops import (
        _find_articulation,
    )

    chain = [(1, 2), (2, 3), (3, 4)]
    assert set(_find_articulation(chain)) == {(2, 2), (3, 2)} \
        == _brute_articulation(chain)
    star = [(0, 1), (0, 2), (0, 3), (0, 4)]
    assert set(_find_articulation(star)) == {(0, 4)} \
        == _brute_articulation(star)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert _find_articulation(k4) == []
    bar = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    assert set(_find_articulation(bar)) == {(3, 2), (4, 2)} \
        == _brute_articulation(bar)
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(4, 12))
        m = min(int(rng.integers(n - 1, n * 2)), n * (n - 1) // 2)
        es = set()
        while len(es) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                es.add((min(int(a), int(b)), max(int(a), int(b))))
        es = sorted(es)
        assert set(_find_articulation(es)) == _brute_articulation(es), \
            (trial, es)


def test_dup_graph_articulation_vs_brute(ray_session):
    from who_owns_mass_processing_ray.pipelines import textops

    # same edge source as the query default (exact AllPairs at tau=0.3 —
    # dense enough for real cut vertices, unlike the 0.7 LSH graph)
    pairs = textops.q_ngram_jaccard_pairs(SF_DIR, k=5, thresh=0.3) \
        .to_pandas()
    edges = sorted(zip(pairs.left_id.astype(int),
                       pairs.right_id.astype(int)))
    want = _brute_articulation(edges)
    got_df = textops.q_dup_graph_articulation(SF_DIR).to_pandas()
    got = {(int(r.doc_id), int(r.n_parts)) for r in got_df.itertuples()}
    assert got == want
    assert len(got) > 0, "tau=0.3 graph at sf0.001 has cut vertices"
