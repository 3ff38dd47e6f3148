"""Compound-bounded near-dup semantics (≙ dedupe_cosine_bounded,
/root/reference/R/deduplicaters.R:446-539): planted-pair verification of the
AND bound + dual-threshold routing, DuckDB parity on the planted corpus, and
the flagship's compound_bound mode recall on planted truth."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SAFE = "qwxzbpkj"  # letters that appear in NO bounding marker bigram


def _rand_text(seed: int, n: int = 1000) -> str:
    rng = np.random.default_rng(seed)
    chars = list(SAFE + " ")
    return "".join(rng.choice(chars, size=n))


def _insert(text: str, pieces: list[str], seed: int = 0) -> str:
    """Insert each piece (space-padded) at spread positions."""
    rng = np.random.default_rng(seed)
    out = text
    for p in pieces:
        pos = int(rng.integers(10, len(out) - 10))
        out = out[:pos] + f" {p} " + out[pos:]
    return out


def _true_jaccard(a: str, b: str, k: int = 5) -> float:
    ga = {a[i:i + k] for i in range(len(a) - k + 1)}
    gb = {b[i:i + k] for i in range(len(b) - k + 1)}
    return len(ga & gb) / len(ga | gb)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with planted pairs isolating each predicate:
    - (3, 6)  inst, J=1, ham=0            -> KEPT (pair_class inst)
    - (1, 4)  ind, 0.85<=J<0.95, ham=0    -> rejected by 0.95 routing
    - (9, 10) identical text, inst x ind  -> rejected by class separation
    - (12, 15) inst, J>=0.85, ham=5       -> rejected by the hamming bound
    """
    base_a = _rand_text(1)
    base_b = _rand_text(2)
    base_c = _rand_text(3)
    base_d = _rand_text(4)
    b_edit = _insert(base_b, ["qqpp"] * 5, seed=11)       # no marker letters
    d_edit = _insert(base_d, ["th", "he", "in", "er", "an"], seed=12)
    jb = _true_jaccard(base_b, b_edit)
    jd = _true_jaccard(base_d, d_edit)
    assert 0.85 <= jb < 0.95, jb
    assert jd >= 0.85, jd
    docs = {
        3: base_a, 6: base_a,
        1: base_b, 4: b_edit,
        9: base_c, 10: base_c,
        12: base_d, 15: d_edit,
        # filler singletons so blocking has non-pair rows too
        2: _rand_text(20), 5: _rand_text(21), 7: _rand_text(22),
    }
    d = tmp_path_factory.mktemp("bounded")
    ids = sorted(docs)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids], pa.string()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_bounded_planted_semantics(ray_session, planted_dir):
    from who_owns_mass_processing_ray.pipelines import textops

    out = textops.q_bounded_near_dup(planted_dir).to_pandas()
    pairs = set(zip(out.left_id, out.right_id))
    assert (3, 6) in pairs                      # inst, similar, bounded
    assert (1, 4) not in pairs                  # ind pair below 0.95
    assert (9, 10) not in pairs                 # class mismatch
    assert (12, 15) not in pairs                # hamming bound exceeded
    row = out[(out.left_id == 3) & (out.right_id == 6)].iloc[0]
    assert row.pair_class == "inst" and row.hamming == 0


def test_bounded_duckdb_parity_on_planted(ray_session, planted_dir):
    """Engine == generated oracle on the planted corpus (driver-compare
    shape: sorted columns, order-insensitive rows)."""
    from who_owns_mass_processing_ray.pipelines import textops

    got = textops.q_bounded_near_dup(planted_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{planted_dir}/documents.parquet'")
    want = con.sql(textops.bounded_near_dup_sql()).df()
    got = got[sorted(got.columns)].sort_values(
        list(sorted(got.columns))).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        list(sorted(want.columns))).reset_index(drop=True)
    got["hamming"] = got["hamming"].astype("int64")
    want["hamming"] = want["hamming"].astype("int64")
    pd.testing.assert_frame_equal(got.round(4), want.round(4),
                                  check_dtype=False)


def test_flagship_compound_bound_recall(ray_session, tmp_path):
    """compound_bound=True: exact/near_transcript/containment planted dups
    must still cluster (they carry exact evidence or both dimensions);
    bounding-dimension-only merges disappear.  Overall recall is reported —
    the precision/recall trade the reference's bounded variant makes."""
    from who_owns_mass_processing_ray import synth
    from who_owns_mass_processing_ray.config import DedupConfig
    from who_owns_mass_processing_ray.pipelines import dedup

    corpus = "/tmp/clips300"
    synth.generate_clips_parquet(corpus, 300, seed=42, use_ray=False)
    res = dedup.dedup_pipeline(
        f"{corpus}/clips", DedupConfig(num_parts=16, compound_bound=True))
    a2c = res["clip_to_cluster"].to_pandas().set_index("clip_id")["cluster_id"]
    truth = pq.read_table(f"{corpus}/truth_pairs").to_pandas()
    truth["hit"] = [a2c.get(l) == a2c.get(r)
                    for l, r in zip(truth.left_id, truth.right_id)]
    by_kind = truth.groupby("kind")["hit"].mean()
    for kind in ["exact", "near_transcript"]:
        if kind in by_kind.index:
            assert by_kind[kind] == 1.0, (kind, by_kind[kind])
    # containment cuts can lose the union-mode rescue where the anchor
    # stage's documented stride-miss residual was previously covered by a
    # near edge (which bounded mode correctly refuses without audio
    # confirmation) — the reference's precision-for-recall trade
    if "containment" in by_kind.index:
        assert by_kind["containment"] >= 0.85, by_kind.to_dict()
    overall = truth.hit.mean()
    assert overall >= 0.9, by_kind.to_dict()
    print("compound-bound recall by kind:", by_kind.round(4).to_dict(),
          "overall:", round(overall, 4))
