"""Deterministic synthetic clip+transcript corpus with planted duplicates.

Implements the FIXTURES.md §1 contract: a table
``(clip_id, bytes, sr_hz, dur_ms, codec, transcript)`` plus a
``truth_pairs (left_id, right_id, kind)`` side table, seeded and fully
deterministic — row ``i`` is a pure function of ``(seed, i)``, so generation
parallelizes embarrassingly (the Ray path generates batches of indices with
``map_batches`` across workers; same bytes either way).

Planted duplicate kinds (fraction ~20% of rows):
- ``exact``            byte-identical audio + transcript       (exact-hash stage)
- ``near_transcript``  1-3 word edits / casing / whitespace    (MinHash+LSH stage)
- ``containment``      transcript is a word-aligned substring,
                       audio truncated to match                (containment stage)
- ``reencoded_audio``  same waveform, new codec and/or sr      (SimHash stage)
- ``cross``            near transcript AND re-encoded audio    (union-find merge)

Word-edit counts scale with transcript length (min 1 edit only for >=12-word
transcripts; shorter ones get a single char typo) so every planted near-dup
stays above the engine's Jaccard verify threshold — the reference's dedup
semantics equally bound how different two "same owner" strings may be
(cosine >= 0.85/0.95, ``/root/reference/config.R:28-29``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray import audio

CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

TRUTH_SCHEMA = pa.schema(
    [("left_id", pa.string()), ("right_id", pa.string()), ("kind", pa.string())]
)

_SRS = np.array([8000, 16000, 22050, 44100])
_SR_P = np.array([0.15, 0.55, 0.15, 0.15])
_CODECS = ["pcm_s16le", "flac"]
_KINDS = ["exact", "near_transcript", "containment", "reencoded_audio", "cross"]
_KIND_P = [0.25, 0.30, 0.20, 0.15, 0.10]
_DUP_FRACTION = 0.2
_NOISE_SR = 8000
_NOISE_AMP = 0.01

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du", "ka", "ke",
    "ki", "ko", "ku", "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo",
    "mu", "na", "ne", "ni", "no", "nu", "ra", "re", "ri", "ro", "ru", "sa",
    "se", "si", "so", "su", "ta", "te", "ti", "to", "tu", "va", "ve", "vi",
    "vo", "vu",
]


def _make_vocab(seed: int, size: int = 5000) -> list[str]:
    rng = np.random.default_rng(seed ^ 0x70CAB)
    syl = np.array(_SYLLABLES)
    words = set()
    out = []
    while len(out) < size:
        k = rng.integers(1, 5)
        w = "".join(rng.choice(syl, size=k))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def _style_tables(seed: int, style: str) -> tuple[list[str], np.ndarray | None]:
    """(vocab, rank-probabilities) for a corpus style.

    ``zipf`` (default, the original corpus): 5k vocab, ``np.random.zipf(1.3)``
    draw folded mod vocab — a HEAVY head (few hundred words dominate), so
    cross-document shingle collisions, and with them LSH candidate volume,
    grow super-linearly with corpus size.  Deliberately adversarial; kept
    as-is for continuity with the recorded 80k scaling runs.

    ``natural``: 30k vocab with Zipf-Mandelbrot rank frequencies
    p(r) ∝ 1/(r+2.7) — the published shape of natural-language word
    frequencies (Zipf exponent ~1, Mandelbrot offset β≈2.7).  The flatter
    head + 6× vocab makes unrelated-document shingle overlap rare, so
    candidate pairs grow ~linearly with rows — the regime a real 100 TB
    text corpus is in, and the one where doubling the corpus amortizes
    fixed per-run costs instead of drowning them in quadratic verify work
    (BASELINE.md: why 160k-zipf measured a WORSE 8→32 ratio than 80k)."""
    if style == "zipf":
        return _make_vocab(seed), None
    if style == "natural":
        vocab = _make_vocab(seed, size=30000)
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        p = 1.0 / (ranks + 2.7)
        return vocab, np.cumsum(p / p.sum())  # CDF, inverse-transform ready
    raise ValueError(f"unknown corpus style: {style!r}")


def clip_id_str(i: int) -> str:
    return f"clip-{i:012d}"


def clip_id_to_int(s: str) -> int:
    return int(s.rsplit("-", 1)[1])


def _row_rng(seed: int, i: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng((seed * 0x9E3779B9 + i * 0x85EBCA6B + salt) % (1 << 63))


def _base_params(seed: int, i: int) -> dict:
    """Waveform + row parameters for base row i (pure function)."""
    rng = _row_rng(seed, i, 1)
    n_sin = int(rng.integers(2, 5))
    freqs = np.exp(rng.uniform(np.log(150.0), np.log(3300.0), size=n_sin))
    amps = rng.uniform(0.1, 0.3, size=n_sin)
    phases = rng.uniform(0, 2 * np.pi, size=n_sin)
    sr = int(rng.choice(_SRS, p=_SR_P))
    dur_ms = int(np.exp(rng.uniform(np.log(500.0), np.log(15000.0))))
    codec = _CODECS[int(rng.random() < 0.3)]
    return {
        "freqs": freqs, "amps": amps, "phases": phases,
        "sr_hz": sr, "dur_ms": dur_ms, "codec": codec,
        "noise_seed": int(rng.integers(0, 1 << 62)),
    }


def _waveform(params: dict, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Evaluate the continuous waveform at a sample grid — the SAME waveform
    regardless of sr (sinusoids exact; noise linearly interpolated from a
    fixed 8 kHz track so re-encodes share it)."""
    n = int(round(sr_hz * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = np.zeros(n, dtype=np.float64)
    for f, a, p in zip(params["freqs"], params["amps"], params["phases"]):
        x += a * np.sin(2 * np.pi * f * t + p)
    nrng = np.random.default_rng(params["noise_seed"])
    n_noise = int(np.ceil(dur_ms / 1000.0 * _NOISE_SR)) + 2
    noise = nrng.normal(0.0, 1.0, size=n_noise)
    x += _NOISE_AMP * np.interp(t * _NOISE_SR, np.arange(n_noise), noise)
    return x.astype(np.float32)


def _transcript(seed: int, i: int, vocab: list[str],
                probs: np.ndarray | None = None) -> list[str]:
    rng = _row_rng(seed, i, 2)
    n_words = int(rng.integers(5, 81))
    if probs is None:
        # zipf-ish draw over the vocab for realistic token frequencies
        idx = (rng.zipf(1.3, size=n_words) - 1) % len(vocab)
    else:
        # natural style: inverse-CDF over the Zipf-Mandelbrot rank CDF
        idx = np.searchsorted(probs, rng.random(n_words))
        idx = np.minimum(idx, len(vocab) - 1)
    return [vocab[j] for j in idx]


def _edit_transcript(words: list[str], rng: np.random.Generator, vocab: list[str]) -> str:
    """Casing/whitespace noise + length-scaled word edits (see module doc)."""
    words = list(words)
    n = len(words)
    n_edits = min(3, n // 12)
    if n_edits == 0:
        # single char typo in one word
        j = int(rng.integers(0, n))
        w = words[j]
        pos = int(rng.integers(0, len(w)))
        words[j] = w[:pos] + chr(ord("a") + int(rng.integers(0, 26))) + w[pos + 1 :]
    else:
        for _ in range(n_edits):
            j = int(rng.integers(0, n))
            repl = vocab[int(rng.integers(0, len(vocab)))]
            while repl == words[j]:
                repl = vocab[int(rng.integers(0, len(vocab)))]
            words[j] = repl
    # casing + whitespace noise (normalized away by the engine)
    out = []
    for w in words:
        if rng.random() < 0.2:
            w = w.upper()
        out.append(w)
    sep = ["  " if rng.random() < 0.1 else " " for _ in range(n - 1)] + [""]
    return "".join(w + s for w, s in zip(out, sep))


def generate_batch(
    indices: np.ndarray, n_rows: int, seed: int, vocab: list[str],
    probs: np.ndarray | None = None,
) -> tuple[pa.Table, pa.Table]:
    """Generate clip rows (+ truth-pair rows for dup indices) for a batch of
    global indices.  Pure function of (seed, index) — safe to run on any
    worker in any order."""
    n_dups = int(n_rows * _DUP_FRACTION)
    n_base = n_rows - n_dups
    ids, blobs, srs, durs, codecs, transcripts = [], [], [], [], [], []
    t_left, t_right, t_kind = [], [], []
    for i in indices:
        i = int(i)
        if i < n_base:
            params = _base_params(seed, i)
            words = _transcript(seed, i, vocab, probs)
            sr, dur, codec = params["sr_hz"], params["dur_ms"], params["codec"]
            pcm = _waveform(params, sr, dur)
            blob = audio.encode(pcm, sr, codec)
            text = " ".join(words)
        else:
            d = i - n_base
            rng = _row_rng(seed, i, 3)
            b = int(rng.integers(0, n_base))
            kind = _KINDS[int(rng.choice(len(_KINDS), p=_KIND_P))]
            params = _base_params(seed, b)
            words = _transcript(seed, b, vocab, probs)
            sr, dur, codec = params["sr_hz"], params["dur_ms"], params["codec"]
            if kind == "exact":
                pcm = _waveform(params, sr, dur)
                blob = audio.encode(pcm, sr, codec)
                text = " ".join(words)
            elif kind == "near_transcript":
                pcm = _waveform(params, sr, dur)
                blob = audio.encode(pcm, sr, codec)
                text = _edit_transcript(words, rng, vocab)
            elif kind == "containment":
                n_keep = max(6, int(len(words) * rng.uniform(0.4, 0.8)))
                n_keep = min(n_keep, len(words) - 1) if len(words) > 6 else len(words)
                start = int(rng.integers(0, len(words) - n_keep + 1))
                text = " ".join(words[start : start + n_keep])
                frac = n_keep / len(words)
                dur = max(100, int(dur * frac))
                pcm = _waveform(params, sr, dur)
                blob = audio.encode(pcm, sr, codec)
            elif kind == "reencoded_audio":
                sr = int(_SRS[(list(_SRS).index(sr) + 1 + int(rng.integers(0, 3))) % 4])
                codec = _CODECS[1 - _CODECS.index(codec)]
                pcm = _waveform(params, sr, dur)
                blob = audio.encode(pcm, sr, codec)
                text = " ".join(words)
            else:  # cross
                sr = int(_SRS[(list(_SRS).index(sr) + 1 + int(rng.integers(0, 3))) % 4])
                pcm = _waveform(params, sr, dur)
                blob = audio.encode(pcm, sr, codec)
                text = _edit_transcript(words, rng, vocab)
            t_left.append(clip_id_str(b))
            t_right.append(clip_id_str(i))
            t_kind.append(kind)
        ids.append(clip_id_str(i))
        blobs.append(blob)
        srs.append(sr)
        durs.append(dur)
        codecs.append(codec)
        transcripts.append(text)
    clips = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
        },
        schema=CLIP_SCHEMA,
    )
    truth = pa.table(
        {
            "left_id": pa.array(t_left, pa.string()),
            "right_id": pa.array(t_right, pa.string()),
            "kind": pa.array(t_kind, pa.string()),
        },
        schema=TRUTH_SCHEMA,
    )
    return clips, truth


def generate_clips_tables(n_rows: int, seed: int = 42,
                          style: str = "zipf") -> tuple[pa.Table, pa.Table]:
    """Driver-side generation for tests / small scales."""
    vocab, probs = _style_tables(seed, style)
    clips, truth = generate_batch(np.arange(n_rows), n_rows, seed, vocab, probs)
    return clips, truth


def generate_clips_parquet(out_dir: str, n_rows: int, seed: int = 42,
                           use_ray: bool | None = None,
                           style: str = "zipf") -> str:
    """Write clips.parquet + truth_pairs.parquet under ``out_dir``; cached —
    if the directory already has a matching manifest, generation is skipped.

    For n_rows above a threshold the generation fans out over Ray workers
    (``ray.data.range -> map_batches``); the output bytes are identical to
    the driver-side path because every row is a pure function of (seed, i).
    """
    import json
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    want = {"n_rows": n_rows, "seed": seed, "version": 3}
    if style != "zipf":  # default-style manifests keep their cached shape
        want["style"] = style
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return out_dir
    import pyarrow.parquet as pq

    if use_ray is None:
        use_ray = n_rows > 20000
    clips_path = os.path.join(out_dir, "clips")
    truth_path = os.path.join(out_dir, "truth_pairs")
    # stale-manifest regeneration must not leave part files from a previous
    # (larger) corpus behind — write_parquet appends new part files, so a
    # dirty dir would silently mix corpora (observed: an 80k manifest over
    # 120k rows of files)
    shutil.rmtree(clips_path, ignore_errors=True)
    shutil.rmtree(truth_path, ignore_errors=True)
    os.makedirs(clips_path, exist_ok=True)
    os.makedirs(truth_path, exist_ok=True)
    if not use_ray:
        clips, truth = generate_clips_tables(n_rows, seed, style)
        pq.write_table(clips, os.path.join(clips_path, "part-0.parquet"))
        pq.write_table(truth, os.path.join(truth_path, "part-0.parquet"))
    else:
        import ray.data as rd

        vocab, probs = _style_tables(seed, style)

        class Gen:
            """Actor: vocab built once per worker, batches of indices in."""

            def __init__(self):
                self.vocab = vocab
                self.probs = probs

            def __call__(self, batch: pa.Table) -> pa.Table:
                idx = batch["id"].to_numpy()
                clips, truth = generate_batch(idx, n_rows, seed, self.vocab,
                                              self.probs)
                # carry truth pairs inline (empty strings for base rows)
                nb = len(clips)
                left = [""] * nb
                kind = [""] * nb
                tl = truth["left_id"].to_pylist()
                tk = truth["kind"].to_pylist()
                j = 0
                for r, cid in enumerate(clips["clip_id"].to_pylist()):
                    if clip_id_to_int(cid) >= n_rows - int(n_rows * _DUP_FRACTION):
                        left[r] = tl[j]
                        kind[r] = tk[j]
                        j += 1
                return clips.append_column("t_left", pa.array(left)).append_column(
                    "t_kind", pa.array(kind)
                )

        from who_owns_mass_processing_ray.stages import pool_bounds

        ds = rd.range(n_rows).map_batches(Gen, batch_size=256,
                                          concurrency=pool_bounds(16),
                                          batch_format="pyarrow")
        ds = ds.materialize()
        ds.drop_columns(["t_left", "t_kind"]).write_parquet(clips_path)
        truth_ds = ds.filter(expr="t_left != ''").select_columns(
            ["t_left", "t_kind", "clip_id"]
        )
        truth_ds.map_batches(
            lambda t: pa.table(
                {"left_id": t["t_left"], "right_id": t["clip_id"], "kind": t["t_kind"]},
                schema=TRUTH_SCHEMA,
            ),
            batch_format="pyarrow",
        ).write_parquet(truth_path)
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return out_dir
