"""Shared Parquet source helper.

``read_parquet_clean`` = ``ray.data.read_parquet`` with an explicit,
metadata-STRIPPED schema: pandas-written Parquet carries a ``b'pandas'``
schema-metadata dict that makes ``pa.Schema`` unhashable, which defeats the
streaming executor's schema-deduplication check on every downstream
operator ("Failed to hash the schemas" worker warnings).  Stripping it at
the source keeps every block schema hashable and the executor's
consistency checks meaningful.  Column projection still prunes at the read
(only the requested columns leave storage).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def read_parquet_clean(path: str, columns: list[str] | None = None):
    import pyarrow.parquet as pq
    import ray.data as rd

    probe = path
    if not probe.endswith(".parquet"):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        probe = files[0] if files else None
    schema = None
    if probe:
        full = pq.read_schema(probe).remove_metadata()
        schema = pa.schema([full.field(c) for c in columns]) if columns \
            else full
    return rd.read_parquet(path, columns=columns, schema=schema)
