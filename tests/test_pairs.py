"""Unit tests for the vectorized pair-expansion kernel (stages/pairs.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from who_owns_mass_processing_ray.stages import pairs as pr


def _expand(keys, ids, cap, payloads=None):
    cols = {"k": pa.array(np.asarray(keys, np.uint64)),
            "id": pa.array(list(ids))}
    for name, vals in (payloads or {}).items():
        cols[name] = pa.array(vals)
    t = pa.table(cols)
    out = pr.expand_partition_pairs(t, "k", "id", cap,
                                    list((payloads or {}).keys()))
    return out


class TestExpand:
    def test_small_buckets_all_pairs(self):
        keys = [1, 1, 1, 2, 2, 3]
        ids = ["a", "b", "c", "d", "e", "f"]
        out = _expand(keys, ids, cap=10)
        got = set(zip(out["left_id"].to_pylist(), out["right_id"].to_pylist()))
        assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}
        assert all(l < r for l, r in got)  # value-ascending orientation

    def test_multi_bucket_pair_deduped(self):
        # pair (a, b) appears in two buckets -> emitted once
        keys = [1, 1, 2, 2]
        ids = ["a", "b", "a", "b"]
        out = _expand(keys, ids, cap=10)
        assert out.num_rows == 1

    def test_hot_bucket_salted_not_dropped(self):
        n = 40
        ids = [f"x{i:03d}" for i in range(n)]
        out = _expand([7] * n, ids, cap=8)
        got = set(zip(out["left_id"].to_pylist(), out["right_id"].to_pylist()))
        # star: min member paired with EVERY other member
        for i in range(1, n):
            assert ("x000", f"x{i:03d}") in got
        # bounded: far fewer than all pairs, more than just the star
        assert n - 1 < len(got) < n * (n - 1) // 2
        assert out["dropped"][0].as_py() == n  # salted-member count visible

    def test_int_ids_and_payloads(self):
        keys = [5, 5, 5]
        ids = [30, 10, 20]
        out = _expand(keys, ids, cap=10, payloads={"w": [3.0, 1.0, 2.0]})
        got = {(l, r): (wl, wr) for l, r, wl, wr in zip(
            out["left_id"].to_pylist(), out["right_id"].to_pylist(),
            out["left_w"].to_pylist(), out["right_w"].to_pylist())}
        assert set(got) == {(10, 20), (10, 30), (20, 30)}
        assert got[(10, 20)] == (1.0, 2.0)
        assert got[(10, 30)] == (1.0, 3.0)

    def test_deterministic_under_permutation(self):
        rng = np.random.default_rng(0)
        keys = rng.integers(0, 5, size=60)
        ids = [f"id{i:02d}" for i in rng.permutation(60)]
        a = _expand(keys, ids, cap=6)
        perm = rng.permutation(60)
        b = _expand(np.asarray(keys)[perm], [ids[i] for i in perm], cap=6)
        pa_set = set(zip(a["left_id"].to_pylist(), a["right_id"].to_pylist()))
        pb_set = set(zip(b["left_id"].to_pylist(), b["right_id"].to_pylist()))
        assert pa_set == pb_set
