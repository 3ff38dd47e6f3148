"""Per-row invariants from the BASELINE contract: decoded PCM must match
the reference waveform at SNR >= 30 dB, and transcripts must round-trip
exactly (input_hint: 'per-row invariant vs the reference: decoded-PCM
allclose (SNR>=30dB) + transcript equality')."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from who_owns_mass_processing_ray import audio, synth


class TestPerRowInvariants:
    def test_decoded_pcm_snr_and_transcript_equality(self, small_corpus):
        clips = pq.read_table(f"{small_corpus}/clips")
        vocab = synth._make_vocab(42)
        n = clips.num_rows
        n_dups = int(n * synth._DUP_FRACTION)
        n_base = n - n_dups
        checked = 0
        for row in range(0, n, 7):  # stride sample across the corpus
            cid = clips["clip_id"][row].as_py()
            i = synth.clip_id_to_int(cid)
            if i >= n_base:
                continue  # dup rows derive from base params; base rows suffice
            buf = clips["bytes"][row].as_py()
            codec = clips["codec"][row].as_py()
            sr = clips["sr_hz"][row].as_py()
            dur = clips["dur_ms"][row].as_py()
            pcm, got_sr = audio.decode(buf, codec)
            assert got_sr == sr
            # reference waveform regenerated pure-functionally
            params = synth._base_params(42, i)
            ref = synth._waveform(params, sr, dur)
            assert len(pcm) == len(ref)
            snr = audio.snr_db(ref, pcm)
            assert snr >= 30.0, f"{cid}: SNR {snr:.1f} dB"
            # transcript equality
            words = synth._transcript(42, i, vocab)
            assert clips["transcript"][row].as_py() == " ".join(words)
            checked += 1
        assert checked >= 40  # the sample actually covered the corpus

    def test_flagship_preserves_rows(self, small_corpus, ray_session):
        """The pipeline must neither drop nor duplicate input rows, and the
        assignment must cover exactly the input clip_ids."""
        from who_owns_mass_processing_ray.config import DedupConfig
        from who_owns_mass_processing_ray.pipelines import dedup

        res = dedup.dedup_pipeline(f"{small_corpus}/clips",
                                   DedupConfig(num_parts=8))
        c2c = res["clip_to_cluster"].to_pandas()
        src_ids = set(pq.read_table(f"{small_corpus}/clips",
                                    columns=["clip_id"])
                      .column("clip_id").to_pylist())
        assert set(c2c["clip_id"]) == src_ids
        assert len(c2c) == len(src_ids)
