"""Driver-mimic: run each queries() entry at sf0.01 and compare with its
oracle_sql() via DuckDB (row count + column names + order-insensitive value
comparison).  Usage: python tools/check_oracle.py [name ...]"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(4)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
        except Exception as e:
            print(f"FAIL  {name:22s} ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name:22s} {len(got):7d} rows {dt:6.1f}s (rows-only)")
            n_pass += 1
            continue
        want = canon(con.sql(oracles[name]).df())
        status = "PASS"
        detail = ""
        if list(got.columns) != list(want.columns):
            status, detail = "FAIL", f"cols {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            status, detail = "FAIL", f"rows {len(got)} vs {len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, atol=1e-9)
            except AssertionError as e:
                status, detail = "FAIL", str(e).split("\n")[0][:120]
        print(f"{status}  {name:22s} {len(got):7d} rows {dt:6.1f}s {detail}")
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()


if __name__ == "__main__":
    main()
