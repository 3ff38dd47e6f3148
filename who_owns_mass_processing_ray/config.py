"""Typed engine configuration.

The reference keeps its knobs in a global ``config.R`` (cosine thresholds 0.85
inst / 0.95 individuals, `COMPANY_TEST_COUNT`, `ROUTINES` gates —
``/root/reference/config.R:1-49``).  The engine equivalent is a frozen
dataclass passed explicitly to every pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """All knobs of the near-dup pipeline.

    The MinHash/LSH settings are the analog of the reference's cosine
    thresholds (``/root/reference/config.R:28-29``): ``jaccard_thresh`` plays
    the role of ``COSINE_THRESH`` and the (bands, rows) shape fixes the
    LSH S-curve so pairs at ``jaccard_thresh`` are caught with
    probability > 0.999.
    """

    # --- transcript shingling / MinHash -------------------------------------
    shingle_k: int = 5              # char k-grams over the normalized transcript
    num_perm: int = 128             # MinHash permutations
    lsh_bands: int = 32             # bands (num_perm = lsh_bands * lsh_rows)
    lsh_rows: int = 4               # rows per band
    jaccard_thresh: float = 0.55    # exact-Jaccard verify threshold (>= kept)
    seed: int = 42
    # number of coarse hash partitions for bucket-local pair generation; 0 =
    # auto (4 x cluster CPUs). Same key -> same partition; work inside a
    # partition is vectorized numpy over all its buckets.
    num_parts: int = 0

    # --- skew handling (hot LSH buckets: degenerate shingles, silence) ------
    # A bucket larger than max_bucket is a stop-shingle bucket; its pair
    # generation is capped pairwise against the bucket's min-id rows only and
    # the truncation is logged in the stage metrics (never silent).
    max_bucket: int = 256

    # --- audio SimHash (second blocking dimension, ≙ reference addr_id
    # bounding key /root/reference/R/deduplicaters.R:446-539) ----------------
    simhash_bits: int = 64
    simhash_bands: int = 4          # bucket key = one of 4 x 16-bit slices
    hamming_thresh: int = 6         # verify: hamming distance <= thresh
    fp_num_bands: int = 129         # log-spaced bands -> 128 log-delta features
    fp_fmin_hz: float = 100.0
    fp_fmax_hz: float = 3500.0      # below nyquist of the lowest sr (8 kHz)

    # --- exact containment (suffix/winnowing stage) -------------------------
    # gram=16 keeps hot-bucket candidate volume ~14x below gram=8 on zipf
    # text (measured: 95k vs 1.3M pre-dedup pairs on a 600-doc corpus) while
    # any contained cut >= 17 chars still shares >= 2 content-defined
    # anchors; miss probability for g shared grams is (1-1/stride)^g.
    containment_gram: int = 16      # char grams used for winnowed anchors
    containment_stride: int = 8     # keep grams with hash % stride == 0
    containment_min_len: int = 12   # docs with fewer grams keep every gram
    # verify backend: 'scan' = one pc.match_substring C kernel per unique
    # contained string; 'suffix_array' = one generalized suffix array per
    # verify batch over the unique containers, O(|p| log N) binary-search
    # probes per unique pattern (functions/suffix.py). Tested equal.
    containment_backend: str = "scan"

    # --- compound bounding (≙ dedupe_cosine_bounded's AND semantics,
    # /root/reference/R/deduplicaters.R:446-539) -----------------------------
    # False (default): edge kinds merge by union — recall-first, the
    # dedupe_all shape.  True: the bounded shape — a 'near' (text-similar)
    # edge is kept only when the SAME pair also has a verified 'audio'
    # (fingerprint-bucket) edge, and audio-only edges do not merge on their
    # own; exact and containment edges (exact evidence) always merge.  This
    # is the reference's over-merge defense: name-similar entities merge
    # only when they also share the bounding dimension.
    compound_bound: bool = False

    # --- components ---------------------------------------------------------
    # Edges <= this: driver-side union-find (exact, cheap). Above: distributed
    # min-label propagation (bounded iterations). Both produce identical
    # components; see stages/components.py.
    dsu_edge_limit: int = 5_000_000
    label_prop_max_iters: int = 50

    # --- execution sizing ---------------------------------------------------
    batch_size: int = 1024          # rows per batch for text stages
    # candidate-verify batches are larger: the exact-Jaccard kernel memoizes
    # per-DISTINCT-doc shingle sets within a batch, so bigger batches reuse
    # hot docs across more pairs (measured 44.5s -> 32.5s for the 80k near
    # stage at 8192 vs 1024)
    verify_batch_size: int = 8192
    # Cap candidate-pair block size before the attach+verify map: pair
    # expansion emits one block per coarse partition, and a partition that
    # holds a salted mega-bucket can carry millions of pairs — one straggler
    # task then gates the whole stage (measured 22 s max vs 5.7 s mean task
    # at 80k clips / 32 CPUs).  A streaming split of the NARROW pair stream
    # (ids only, ~30 B/row) rebalances verify at any scale; 50k pairs
    # ≈ 20 MB attached-transcript working set per task.
    verify_rows_per_block: int = 50_000
    # Below this many input rows the four edge stages overlap inside one
    # union materialize; at/above it each stage materializes alone (see the
    # scheduling note in pipelines/dedup.py — sequential wins at 80k+ rows,
    # but its ~4 barrier setups are pure fixed cost on small inputs).
    sequential_stage_rows: int = 24_000
    audio_batch_size: int = 64      # rows per batch for PCM decode (wide rows)
    minhash_concurrency: int = 0    # 0 = let Ray autoscale task pool

    def __post_init__(self) -> None:
        if self.num_perm != self.lsh_bands * self.lsh_rows:
            raise ValueError("num_perm must equal lsh_bands * lsh_rows")
        if self.simhash_bits % self.simhash_bands != 0:
            raise ValueError("simhash_bits must divide into simhash_bands")


DEFAULT_CONFIG = DedupConfig()
