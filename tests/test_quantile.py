"""exact_quantile vs numpy/DuckDB quantile_cont — including the spiked
distribution that forces the histogram bracketing to recurse."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest


def _check(vals: np.ndarray, q: float, ray_session):
    import ray.data as rd

    import who_owns_mass_processing_ray.functions.quantile as qt

    ds = rd.from_items([{"x": float(v)} for v in vals])
    got = qt.exact_quantile(ds, "x", q)
    want = duckdb.sql(
        "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
        params=[q, [float(v) for v in vals]]).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-9), (q, got, want)


def test_quantile_uniform(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1000, 5000)
    for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
        _check(vals, q, ray_session)


def test_quantile_spiked_forces_recursion(ray_session, monkeypatch):
    """Nearly all mass in one histogram bin: with a tiny pull limit the
    bracketing must recurse into the spike and still return the exact
    interpolated value."""
    import who_owns_mass_processing_ray.functions.quantile as qt

    monkeypatch.setattr(qt, "_PULL_LIMIT", 50)
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(500.0, 1e-6, 4000),      # spike, far below bin width
        rng.uniform(0, 1_000_000, 100),     # wide tail sets the range
    ])
    for q in (0.5, 0.6):
        _check(vals, q, ray_session)


def test_quantile_degenerate(ray_session):
    _check(np.array([42.0]), 0.5, ray_session)
    _check(np.full(100, 7.0), 0.9, ray_session)


def test_group_quantiles_match_numpy(ray_session):
    """exact_group_quantiles vs per-group np.quantile (linear interp ==
    quantile_cont), mixed group sizes incl. a singleton group."""
    import ray.data as rd

    import who_owns_mass_processing_ray.functions.quantile as qt

    rng = np.random.default_rng(23)
    groups = (["a"] * 3000) + (["b"] * 500) + (["c"] * 1)
    vals = np.concatenate([
        rng.uniform(0, 100, 3000),
        rng.normal(50, 5, 500),
        [7.0],
    ])
    ds = rd.from_items([{"g": g, "x": float(v)}
                        for g, v in zip(groups, vals)])
    got = qt.exact_group_quantiles(ds, "g", "x", [0.05, 0.5, 0.95])
    for g, sl in (("a", slice(0, 3000)), ("b", slice(3000, 3500)),
                  ("c", slice(3500, 3501))):
        for q in (0.05, 0.5, 0.95):
            want = float(np.quantile(vals[sl], q, method="linear"))
            assert got[g][q] == pytest.approx(want, abs=1e-9), (g, q)


def test_group_quantiles_recursion(ray_session, monkeypatch):
    """Tiny pull limit forces the per-slot bracketing to recurse on a
    spiked group while another group resolves at level 0."""
    import ray.data as rd

    import who_owns_mass_processing_ray.functions.quantile as qt

    monkeypatch.setattr(qt, "_PULL_LIMIT", 50)
    rng = np.random.default_rng(31)
    spike = np.concatenate([rng.normal(500.0, 1e-6, 4000),
                            rng.uniform(0, 1000, 100)])
    flat = rng.uniform(0, 10, 40)
    ds = rd.from_items(
        [{"g": "spike", "x": float(v)} for v in spike]
        + [{"g": "flat", "x": float(v)} for v in flat])
    got = qt.exact_group_quantiles(ds, "g", "x", [0.5, 0.9])
    for q in (0.5, 0.9):
        assert got["spike"][q] == pytest.approx(
            float(np.quantile(spike, q)), abs=1e-9)
        assert got["flat"][q] == pytest.approx(
            float(np.quantile(flat, q)), abs=1e-9)
