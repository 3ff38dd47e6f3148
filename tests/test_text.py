"""Unit tests for transcript normalization (functions/text.py)."""

from __future__ import annotations

import pyarrow as pa

from who_owns_mass_processing_ray.functions import text as tx


class TestNormalize:
    def test_case_whitespace_specials(self):
        col = pa.array(["  Hello,\tWorld!\n", "a  b   c", "O'brien-smith"])
        out = tx.normalize_transcripts(col).to_pylist()
        assert out[0] == "HELLO WORLD"
        assert out[1] == "A B C"
        assert out[2] == "O'BRIEN SMITH"

    def test_junk_to_null(self):
        col = pa.array(["N/A", "none", "  ", "-", "real text", None])
        out = tx.normalize_transcripts(col).to_pylist()
        assert out[:4] == [None, None, None, None]
        assert out[4] == "REAL TEXT"
        assert out[5] is None

    def test_idempotent(self):
        col = pa.array(["  MiXeD   case,, text!! ", "N/A", None])
        once = tx.normalize_transcripts(col)
        twice = tx.normalize_transcripts(once)
        assert once.to_pylist() == twice.to_pylist()


class TestTokenCount:
    def test_counts(self):
        col = pa.array(["one two three", " padded  out ", "", None, "single"])
        out = tx.token_count(col).to_pylist()
        assert out == [3, 2, 0, 0, 1]
