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


# ---------------------------------------------------------------------------
# Per-group exact quantiles — same histogram-bracketing discipline, shared
# scans: ONE grouped histogram pass per level serves every (group, q) slot
# simultaneously, so the pass count stays bounded regardless of group
# cardinality (vs. G independent exact_quantile calls = G full scans).
# Group cardinality must be driver-sized (sources, languages — a G-row
# thresholds table); per-group row counts are unbounded.
# ---------------------------------------------------------------------------


def _group_mask(gv: np.ndarray, x: np.ndarray, slot) -> np.ndarray:
    m = gv == slot["group"]
    if slot["regions"]:
        m &= _region_mask(x, slot["regions"])
    return m


def _grouped_histograms(ds, group_col: str, col: str,
                        slots: list[dict]) -> list[np.ndarray]:
    """One streaming pass -> a 4096-bin histogram per active slot, each
    under its own (lo, width, regions) state."""
    from ray.data.aggregate import Sum

    spec = [{"group": s["group"], "lo": s["lo"], "width": s["width"],
             "regions": list(s["regions"])} for s in slots]

    def bins(t: pa.Table) -> pa.Table:
        gv = np.asarray(t[group_col].to_numpy(zero_copy_only=False))
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_slot, out_bin, out_cnt = [], [], []
        for si, s in enumerate(spec):
            xv = x[_group_mask(gv, x, s)]
            if not len(xv):
                continue
            cnt = np.bincount(_bin(xv, s["lo"], s["width"]),
                              minlength=_NBINS)
            nz = np.flatnonzero(cnt)
            out_slot.append(np.full(len(nz), si, np.int64))
            out_bin.append(nz)
            out_cnt.append(cnt[nz])
        if not out_slot:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "bin": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"slot": pa.array(np.concatenate(out_slot)),
                         "bin": pa.array(np.concatenate(out_bin)),
                         "cnt": pa.array(np.concatenate(out_cnt))})

    rows = ds.map_batches(bins, batch_format="pyarrow") \
        .groupby(["slot", "bin"]).aggregate(Sum("cnt", alias_name="n")) \
        .take_all()
    out = [np.zeros(_NBINS, dtype=np.int64) for _ in slots]
    for r in rows:
        out[r["slot"]][r["bin"]] = r["n"]
    return out


def _grouped_pull_sorted(ds, group_col: str, col: str,
                         slots: list[dict]) -> list[np.ndarray]:
    """One streaming pass -> the sorted bracket values per ready slot."""
    import ray

    spec = [{"group": s["group"], "lo": s["lo"], "width": s["width"],
             "regions": list(s["regions"]) + [s["bracket"]]} for s in slots]

    def pull(t: pa.Table) -> pa.Table:
        gv = np.asarray(t[group_col].to_numpy(zero_copy_only=False))
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_slot, out_val = [], []
        for si, s in enumerate(spec):
            xv = x[_group_mask(gv, x, s)]
            if len(xv):
                out_slot.append(np.full(len(xv), si, np.int64))
                out_val.append(xv)
        if not out_slot:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        return pa.table({"slot": pa.array(np.concatenate(out_slot)),
                         "val": pa.array(np.concatenate(out_val))})

    parts = [t for t in ray.get(
        ds.map_batches(pull, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    res = [np.empty(0) for _ in slots]
    if parts:
        all_t = pa.concat_tables(parts)
        sl = all_t["slot"].to_numpy()
        va = all_t["val"].to_numpy()
        for si in range(len(slots)):
            res[si] = np.sort(va[sl == si])
    return res


def exact_group_quantiles(ds, group_col: str, col: str,
                          qs: list[float]) -> dict:
    """``{group: {q: quantile_cont(col, q) within group}}`` — per-group
    exact quantiles in <= 1 + _MAX_LEVELS + #levels streaming passes TOTAL
    (shared across groups), never sorting or driver-pulling the column."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.groupby(group_col).aggregate(
        Min(col, alias_name="lo"), Max(col, alias_name="hi"),
        Count(alias_name="n")).take_all()
    result: dict = {}
    slots: list[dict] = []
    for r in stats:
        g, lo, hi, n = r[group_col], float(r["lo"]), float(r["hi"]), r["n"]
        result.setdefault(g, {})
        for q in qs:
            if n == 1 or lo == hi:
                result[g][q] = lo
                continue
            k = (n - 1) * q
            k_lo = int(np.floor(k))
            frac = k - k_lo
            ranks = [k_lo] if frac == 0 else [k_lo, k_lo + 1]
            slots.append({"group": g, "q": q, "ranks": ranks, "frac": frac,
                          "lo": lo, "width": (hi - lo) or 1.0,
                          "regions": [], "rank_base": 0})
    active = slots
    for level in range(_MAX_LEVELS):
        if not active:
            break
        hists = _grouped_histograms(ds, group_col, col, active)
        ready, deeper = [], []
        for s, counts in zip(active, hists):
            cum = np.concatenate(([0], np.cumsum(counts)))
            want = s["ranks"]
            b_lo = int(np.searchsorted(cum, want[0] - s["rank_base"],
                                       side="right")) - 1
            b_hi = int(np.searchsorted(cum, want[-1] - s["rank_base"],
                                       side="right")) - 1
            bracket = (s["lo"], s["width"], b_lo, b_hi)
            pull_n = int(cum[b_hi + 1] - cum[b_lo])
            if pull_n <= _PULL_LIMIT or level == _MAX_LEVELS - 1:
                s["bracket"] = bracket
                s["base"] = s["rank_base"] + int(cum[b_lo])
                ready.append(s)
            else:
                s["regions"].append(bracket)
                s["rank_base"] += int(cum[b_lo])
                s["lo"] = s["lo"] + b_lo * s["width"] / _NBINS
                s["width"] = (b_hi - b_lo + 1) * s["width"] / _NBINS
                deeper.append(s)
        if ready:
            pulls = _grouped_pull_sorted(ds, group_col, col, ready)
            for s, vals in zip(ready, pulls):
                vs = {r: float(vals[r - s["base"]]) for r in s["ranks"]}
                k_lo = s["ranks"][0]
                if s["frac"] == 0:
                    result[s["group"]][s["q"]] = vs[k_lo]
                else:
                    result[s["group"]][s["q"]] = (
                        vs[k_lo] + (vs[k_lo + 1] - vs[k_lo]) * s["frac"])
        active = deeper
    return result
