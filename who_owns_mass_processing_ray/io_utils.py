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


def is_lance_dataset(path: str) -> bool:
    """A Lance dataset is a directory named ``*.lance`` or one carrying the
    Lance manifest layout (``_versions/`` + ``data/``)."""
    p = path.rstrip("/")
    if p.endswith(".lance"):
        return True
    return (os.path.isdir(os.path.join(p, "_versions"))
            and os.path.isdir(os.path.join(p, "data")))


def read_table_auto(path: str, columns: list[str] | None = None):
    """Format-dispatching source for the clip input contract.

    The north-rule input is a LANCE table of (clip_id, bytes, sr_hz, dur_ms,
    codec, transcript); when the ``lance`` package is importable this routes
    through ``ray.data.read_lance`` (same projection pushdown: only
    ``columns`` leave storage, Lance being columnar like Parquet).  This
    sandbox image does not ship ``pylance``, so Parquet — the same columnar
    contract — is the storage stand-in, and a Lance path without the
    package fails loudly with the fallback spelled out instead of silently
    misreading the directory.
    """
    if is_lance_dataset(path):
        try:
            import lance  # noqa: F401  (pylance; optional dependency)
        except ImportError as exc:
            raise NotImplementedError(
                f"{path!r} is a Lance dataset but the 'lance' (pylance) "
                "package is not installed in this environment. Install "
                "pylance, or convert the table to Parquet (the engine's "
                "storage stand-in with the identical columnar contract) "
                "and pass that path instead.") from exc
        import ray.data as rd

        return rd.read_lance(path, columns=columns)
    return read_parquet_clean(path, columns=columns)


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
