"""Vectorized transcript normalization — the engine's equivalent of the
reference's regex standardization cascade (``/root/reference/R/standardizers.R``).

The reference chains ~40 ``std_*`` string transforms (uppercase, squish,
special-char stripping, junk-string -> NA) over owner/address columns with
``str_replace_all``; here the same capability class is a single
``pyarrow.compute`` pipeline applied per batch (zero-copy Arrow in/out),
fused by Ray Data's streaming executor.

Specific reference analogs:
- ``std_uppercase``        (R/standardizers.R:191-205)  -> ``pc.utf8_upper``
- ``std_squish``           (R/standardizers.R:207-227)  -> collapse whitespace
- ``std_remove_special``   (R/standardizers.R:229-287)  -> strip non-alnum
- ``std_replace_blank``    (R/standardizers.R:343-379)  -> junk vocab -> null
- ``std_replace_newline``  (R/standardizers.R:381-397)  -> newline -> space
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Junk strings that mean "no value" (reference's BLANKS vocab,
# R/standardizers.R:343-379) — uppercased, post-squish forms.
JUNK_STRINGS = [
    "", "N/A", "NA", "NONE", "NULL", "UNKNOWN", "SAME", "-", "--", ".",
]


def normalize_transcripts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical transcript form used by every dedup stage.

    uppercase -> newlines/tabs to spaces -> strip all chars outside
    [A-Z0-9 '] -> squish runs of whitespace -> trim -> junk -> null.
    Deterministic and idempotent (normalize(normalize(x)) == normalize(x)).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    x = pc.utf8_upper(col)
    x = pc.replace_substring_regex(x, r"[\n\r\t]+", " ")
    # junk vocab check BEFORE the special-char strip — "N/A" must match as
    # written (the strip would turn it into "N A" and the vocab would miss it)
    trimmed = pc.utf8_trim_whitespace(x)
    junk = pc.is_in(trimmed, value_set=pa.array(JUNK_STRINGS, type=x.type))
    x = pc.if_else(junk, pa.scalar(None, type=x.type), x)
    x = pc.replace_substring_regex(x, r"[^A-Z0-9' ]+", " ")
    x = pc.replace_substring_regex(x, r" {2,}", " ")
    x = pc.utf8_trim_whitespace(x)
    empty = pc.equal(x, "")
    return pc.if_else(empty, pa.scalar(None, type=x.type), x)


def token_count(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per string (0 for null/empty)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.replace_substring_regex(col, r"\s+", " "))
    empty = pc.equal(trimmed, "")
    spaces = pc.count_substring(trimmed, " ")
    n = pc.add(spaces, 1)
    n = pc.if_else(empty, pa.scalar(0, type=n.type), n)
    return pc.fill_null(n, 0)
