"""Adaptive hash join: broadcast the small side, shuffle the big one.

The reference does every join as an in-memory dplyr hash join (e.g.
``dedupe_owner_to_company``, ``/root/reference/R/deduplicaters.R:541-561``) —
fine in one R process, impossible at 10^12 rows.  The engine picks per call:

- **broadcast** (side rows <= ``broadcast_limit``): collect the projected
  side table once, ``ray.put`` it, and probe it inside ``map_batches`` with a
  per-block Acero (``pyarrow.Table.join``) hash join — no shuffle at all.
  This is the "broadcast small sides" scale pattern: the side is shipped to
  each worker once via the object store, not re-shipped per batch.
- **shuffle** (bigger): ``Dataset.join`` — Ray Data's partitioned hash join;
  both sides shuffle by key across ``num_partitions`` partitions.

``broadcast_limit`` bounds driver + worker heap (500k rows of narrow
key/value columns ~ tens of MB).  Correctness is identical either way; tests
cover both paths.
"""

from __future__ import annotations

import pyarrow as pa

BROADCAST_ROW_LIMIT = 500_000


def attach_columns(
    ds,
    side_ds,
    key: str,
    side_key: str,
    cols: dict[str, str],
    num_partitions: int | None = None,
    how: str = "inner",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
):
    """Join columns of ``side_ds`` onto ``ds``.

    ``cols`` maps side column -> output column name.  ``how`` is "inner" or
    "left" (left-outer: unmatched rows keep nulls in the attached columns).
    """
    def project_rename(t: pa.Table) -> pa.Table:
        # one map_batches, not select_columns + rename: the Project operator
        # passes zero-row bundles through unprojected, tripping streaming-
        # executor schema warnings on every dataset that carries empty blocks
        out = {"__sidekey": t[side_key]}
        for src, dst in cols.items():
            out[dst] = t[src]
        return pa.table(out)

    # materialize the projected side ONCE: count() + to_arrow_refs() would
    # otherwise each re-execute the side pipeline (profiling showed this
    # double execution dominating multi-join stages)
    proj = side_ds.map_batches(project_rename,
                               batch_format="pyarrow").materialize()
    n_side = proj.count()
    if n_side <= broadcast_limit:
        import ray

        refs = proj.to_arrow_refs()
        tables = ray.get(refs) if refs else []
        # empty blocks can carry an empty schema — drop them before concat
        tables = [t for t in tables if t.num_rows > 0]
        if not tables:
            # empty side: inner join -> nothing survives; left join -> null
            # columns appended
            base = ds.limit(0) if how == "inner" else ds

            def add_nulls(batch: pa.Table) -> pa.Table:
                for name in cols.values():
                    batch = batch.append_column(name, pa.nulls(len(batch)))
                return batch

            return base.map_batches(add_nulls, batch_format="pyarrow")
        side_tbl = pa.concat_tables(tables).combine_chunks()
        # distinct on key: Acero join would row-multiply on dup keys; the
        # shuffle path (Ray hash join) has the same semantics, so keep dups —
        # callers that need uniqueness dedup the side first.
        side_ref = ray.put(side_tbl)
        join_type = "left outer" if how == "left" else "inner"

        def probe(batch: pa.Table) -> pa.Table:
            import ray as _ray

            side = _ray.get(side_ref)
            out = batch.join(
                side, keys=[key], right_keys=["__sidekey"], join_type=join_type
            )
            return out

        return ds.map_batches(probe, batch_format="pyarrow")

    join_type = "left_outer" if how == "left" else "inner"
    if num_partitions is None:
        from who_owns_mass_processing_ray.stages import auto_parts

        num_partitions = auto_parts()
    joined = ds.join(
        proj,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(key,),
        right_on=("__sidekey",),
    )
    return joined.map_batches(
        lambda t: t.drop_columns(["__sidekey"]) if "__sidekey" in t.column_names else t,
        batch_format="pyarrow",
    )


def semi_anti_filter(
    ds,
    key: str,
    keys_ds,
    side_key: str,
    anti: bool = False,
    num_partitions: int | None = None,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
):
    """Keep rows of ``ds`` whose ``key`` is (semi) / is NOT (anti) present in
    ``keys_ds[side_key]`` — the filter(!(id %in% matched)) idiom
    (/root/reference/R/deduplicaters.R:56-64) and officers⋉companies
    (/root/reference/R/loaders.R:1445), made adaptive for scale:

    - key set <= ``broadcast_limit``: collect it ONCE, ``ray.put``, probe
      with ``pc.is_in`` inside map_batches — the big side never shuffles.
    - bigger: distinct the keys with a groupby (partial counts combine
      map-side), then a partitioned hash join — semi = inner join on the
      distinct keys (each ``ds`` row survives exactly once), anti =
      left-outer + filter on a null marker.  The key set is never
      driver-materialized.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"__sidekey": t[side_key]})

    proj = keys_ds.map_batches(project, batch_format="pyarrow").materialize()
    if proj.count() <= broadcast_limit:
        import ray

        tables = [t for t in ray.get(proj.to_arrow_refs()) if t.num_rows]
        if not tables:
            return ds if anti else ds.limit(0)
        key_set = pa.concat_tables(tables).column("__sidekey") \
            .combine_chunks()
        key_ref = ray.put(key_set)

        def probe(t: pa.Table) -> pa.Table:
            import ray as _ray

            mask = pc.is_in(t[key], value_set=_ray.get(key_ref))
            return t.filter(pc.invert(mask) if anti else mask)

        return ds.map_batches(probe, batch_format="pyarrow")

    # materialize the distinct keys BEFORE the join: the aggregate and the
    # hash-shuffle join each reserve aggregator actors, and co-scheduling
    # both inside one streaming execution can starve a small session into
    # a wedge (observed: a 4-CPU test session hung ~40 min in
    # Join(num_partitions=16) with idle aggregators).  attach_columns
    # already materializes its projected side for the same reason; the
    # key set is narrow (distinct keys only), so the materialization is
    # bounded by key cardinality, never by ``ds``.
    distinct_keys = proj.groupby("__sidekey") \
        .aggregate(Count(alias_name="__kmark")).materialize()
    if num_partitions is None:
        from who_owns_mass_processing_ray.stages import auto_parts

        num_partitions = auto_parts()
    if not anti:
        joined = ds.join(distinct_keys, join_type="inner",
                         num_partitions=num_partitions,
                         on=(key,), right_on=("__sidekey",))
    else:
        joined = ds.join(distinct_keys, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=(key,), right_on=("__sidekey",))

    def finish(t: pa.Table) -> pa.Table:
        if anti and "__kmark" in t.column_names:
            t = t.filter(pc.is_null(t["__kmark"]))
        return t.drop_columns(
            [c for c in ("__sidekey", "__kmark") if c in t.column_names])

    return joined.map_batches(finish, batch_format="pyarrow")
