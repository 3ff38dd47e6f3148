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
