"""Numeric helpers shared by the query surfaces.

``round_half_away``: SQL-compatible rounding.  Arrow's ``pc.round`` and
numpy's ``np.round`` are round-half-to-even; DuckDB's ``round()`` is
round-half-away-from-zero.  Values that are exact binary fractions at the
rounding boundary (e.g. 4.40625 → 4.4062 vs 4.4063) therefore diverge — so
every float column that is compared against a DuckDB oracle goes through
this helper on the Ray side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(col, ndigits: int):
    """Round an Arrow array/chunked-array or numpy array half away from
    zero, matching SQL ROUND semantics."""
    if isinstance(col, np.ndarray):
        scale = 10.0 ** ndigits
        return np.sign(col) * np.floor(np.abs(col) * scale + 0.5) / scale
    return pc.round(col, ndigits=ndigits, round_mode="half_towards_infinity")


def round_col(t: pa.Table, name: str, ndigits: int) -> pa.Table:
    """Return ``t`` with column ``name`` rounded half-away."""
    return t.set_column(t.schema.get_field_index(name), name,
                        round_half_away(t[name], ndigits))
