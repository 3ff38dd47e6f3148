"""who_owns_mass_processing_ray — a Ray-Data-native near-duplicate detection
and clustering engine.

A from-scratch re-expression of the capabilities of
``mit-spatial-action/who-owns-mass-processing`` (an R/dplyr/PostGIS owner-dedup
pipeline, see ``/root/reference``) as idiomatic Ray Data:

- per-record regex/normalization cascades  -> vectorized ``map_batches`` over
  zero-copy Arrow batches (reference: ``R/standardizers.R``)
- exact-name dedup (``dedupe_naive``, ``R/deduplicaters.R:208-223``)
  -> content-hash groupby keep-first
- TF-IDF char-3-gram cosine blocking (``R/deduplicaters.R:313-378``)
  -> MinHash signatures + LSH band buckets over transcript shingles
- address-bounded secondary blocking (``R/deduplicaters.R:446-539``)
  -> SimHash buckets over decoded-PCM audio fingerprints
- igraph fast-greedy clustering (``R/deduplicaters.R:225-288``)
  -> union-find connected components (driver DSU or distributed
     min-label propagation, chosen by edge count)
- mode-name canonical election (``R/deduplicaters.R:290-311``)
  -> per-cluster ``map_groups`` election

The flagship input is a Parquet/Lance-shaped table of audio clip + transcript
pairs: ``clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
codec:string, transcript:string``.
"""

from who_owns_mass_processing_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
