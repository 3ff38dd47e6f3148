"""Exact distributed quantile via histogram bracketing.

Reference analog: the 0.95-quantile unit-count filter in
``/root/reference/R/loaders.R:1153`` (a single-process ``quantile()`` call).
At cluster scale an exact quantile cannot sort the column or pull it to the
driver; instead:

1. one aggregate pass for (min, max, count);
2. a 4096-bin histogram pass (per-batch bincount rows + a tiny groupby) —
   the cumulative counts bracket the two order statistics that
   ``quantile_cont`` interpolates between;
3. a filtered pull of ONLY the bracketing bins' values (~n/4096 rows), or
   another histogram level over the narrowed range if the bracket is still
   above ``_PULL_LIMIT`` (spiked distributions; at most 4 levels).

Region membership at every level uses the SAME binning arithmetic as the
histogram (never a separate value comparison, whose float rounding could
disagree by one ulp at a bin edge and shift the pulled order statistics).

Interpolation matches DuckDB ``quantile_cont`` double arithmetic:
``k = (n-1)*q; v = v_lo + (v_hi - v_lo) * frac``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NBINS = 4096
_PULL_LIMIT = 4_000_000  # recurse while a bracket holds more than this
_MAX_LEVELS = 4

# a region constraint: rows whose bin under (lo, width) lies in [b_lo, b_hi]
Region = tuple[float, float, int, int]


def _bin(x: np.ndarray, lo: float, width: float) -> np.ndarray:
    return np.clip(((x - lo) / width * _NBINS).astype(np.int64), 0,
                   _NBINS - 1)


def _region_mask(x: np.ndarray, regions: list[Region]) -> np.ndarray:
    m = np.ones(len(x), dtype=bool)
    for lo, width, b_lo, b_hi in regions:
        b = _bin(x, lo, width)
        m &= (b >= b_lo) & (b <= b_hi)
    return m


def _histogram(ds, col: str, lo: float, width: float,
               regions: list[Region]) -> np.ndarray:
    from ray.data.aggregate import Sum

    def bins(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy()
        x = x[_region_mask(x, regions)]
        cnt = np.bincount(_bin(x, lo, width), minlength=_NBINS)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    rows = ds.map_batches(bins, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("cnt", alias_name="n")).take_all()
    out = np.zeros(_NBINS, dtype=np.int64)
    for r in rows:
        out[r["bin"]] = r["n"]
    return out


def _pull_sorted(ds, col: str, regions: list[Region]) -> np.ndarray:
    import ray

    def pull(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy()
        return pa.table({col: pa.array(x[_region_mask(x, regions)])})

    parts = [t for t in ray.get(
        ds.map_batches(pull, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    return np.sort(np.concatenate([t[col].to_numpy() for t in parts])
                   if parts else np.empty(0))


def _order_stats(ds, col: str, ranks: list[int], lo: float,
                 hi: float) -> dict[int, float]:
    """Values at the given global 0-indexed ranks of the sorted column."""
    want = sorted(ranks)
    width = (hi - lo) or 1.0
    regions: list[Region] = []
    rank_base = 0
    for _level in range(_MAX_LEVELS):
        counts = _histogram(ds, col, lo, width, regions)
        cum = np.concatenate(([0], np.cumsum(counts)))
        b_lo = int(np.searchsorted(cum, want[0] - rank_base,
                                   side="right")) - 1
        b_hi = int(np.searchsorted(cum, want[-1] - rank_base,
                                   side="right")) - 1
        bracket = (lo, width, b_lo, b_hi)
        pull_n = int(cum[b_hi + 1] - cum[b_lo])
        if pull_n <= _PULL_LIMIT or _level == _MAX_LEVELS - 1:
            vals = _pull_sorted(ds, col, regions + [bracket])
            base = rank_base + int(cum[b_lo])
            return {r: float(vals[r - base]) for r in ranks}
        regions.append(bracket)
        rank_base += int(cum[b_lo])
        lo = lo + b_lo * width / _NBINS
        width = (b_hi - b_lo + 1) * width / _NBINS
    raise AssertionError("unreachable")


def exact_quantile(ds, col: str, q: float) -> float:
    """quantile_cont(col, q) computed in streaming passes (see module
    docstring) — never sorts or materializes the column."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(col, alias_name="lo"),
                         Max(col, alias_name="hi"),
                         Count(alias_name="n"))
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return float("nan")
    if n == 1 or lo == hi:
        return float(lo)
    k = (n - 1) * q
    k_lo = int(np.floor(k))
    frac = k - k_lo
    ranks = [k_lo] if frac == 0 else [k_lo, k_lo + 1]
    vs = _order_stats(ds, col, ranks, float(lo), float(hi))
    if frac == 0:
        return vs[k_lo]
    return vs[k_lo] + (vs[k_lo + 1] - vs[k_lo]) * frac
