"""Relational capability queries over the TPC-H-ish test tables.

Each query exercises one operator class from SURVEY.md §2 — the engine's
re-expression of a reference dplyr pattern — as an idiomatic Ray Data
pipeline (lazy ``read_parquet`` with column pruning → ``map_batches`` over
Arrow → ``groupby``/``aggregate``/``sort``).  Every query has a DuckDB
oracle in ``__ray_entry__.oracle_sql`` with IDENTICAL output column names.

Reference analogs cited per query (file:line into /root/reference).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.stages import auto_parts as _auto_shuffle_parts
from who_owns_mass_processing_ray.functions.numeric import round_col, round_half_away


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style rollup ≙ ``summ_site_group`` per-metacorp sums
    (/root/reference/R/summarizers.R:1-25).  Partial aggregation happens
    map-side per block; only combiner rows shuffle."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    out = ds.map_batches(derive, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="count_order"),
    )

    def rnd(t: pa.Table) -> pa.Table:
        # round float aggregates so the DuckDB oracle (different summation
        # order) hashes identically
        for col, d in [("sum_qty", 2), ("sum_base_price", 2),
                       ("sum_disc_price", 2), ("avg_disc", 6)]:
            t = round_col(t, col, d)
        return t

    return out.map_batches(rnd, batch_format="pyarrow") \
        .sort(["l_returnflag", "l_linestatus"])


def q_counts_in_group(sf_dir: str):
    """count + n_distinct per group ≙ ``std_counts_in_group``
    (/root/reference/R/standardizers.R:134-152)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    # n_distinct via two-level aggregation: distinct pairs, then count per key
    distinct_pairs = ds.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="_c"))
    n_distinct = distinct_pairs.groupby("user_id").aggregate(
        Count(alias_name="n_types"))
    totals = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
    from who_owns_mass_processing_ray.stages import joins

    out = joins.attach_columns(totals, n_distinct, "user_id", "user_id",
                               {"n_types": "n_types"}, None, how="inner")
    return out.sort("user_id")


def q_mode_per_group(sf_dir: str):
    """Most-frequent value per group ≙ ``dedupe_text_mode`` canonical-name
    election (/root/reference/R/deduplicaters.R:290-311); ties break by
    lexicographic min — deterministic under any parallelism.

    Two-level: count (lang, source) pairs first — partial aggregation
    combines map-side, so only the TINY distinct-pair count table shuffles,
    never the full rows (a low-cardinality groupby on the raw table would
    funnel every row into 5 groups — the r1 skew anti-pattern)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang", "source"])
    counts = ds.groupby(["lang", "source"]).aggregate(Count(alias_name="ct"))

    def argmax(g: pa.Table) -> pa.Table:
        top = g.sort_by([("lang", "ascending"), ("ct", "descending"),
                         ("source", "ascending")]).slice(0, 1)
        return pa.table({"lang": top["lang"], "mode_source": top["source"]})

    return counts.groupby("lang").map_groups(
        argmax, batch_format="pyarrow").sort("lang")


def q_group_fill(sf_dir: str):
    """Group-wise fill ≙ ``tidyr::fill`` downup / ``std_address_fill_downup``
    (/root/reference/R/standardizers.R:1672-1692): broadcast a per-group
    representative value (min l_shipdate of the order) onto every row of the
    group — join-of-aggregate, the scalable form of group fill."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])
    firsts = ds.groupby("l_orderkey").aggregate(
        Min("l_shipdate", alias_name="first_ship"))
    from who_owns_mass_processing_ray.stages import joins

    out = joins.attach_columns(ds, firsts, "l_orderkey", "l_orderkey",
                               {"first_ship": "first_ship"}, None, how="inner")
    return out.sort(["l_orderkey", "l_linenumber"])


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def q_join_agg(sf_dir: str):
    """orders ⋈ customer → revenue per market segment ≙ the ``summ_*``
    enrichment joins (/root/reference/R/summarizers.R:27-93).  Customer is
    the small side → broadcast (read once, probed per batch), no shuffle."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    from who_owns_mass_processing_ray.stages import joins

    enriched = joins.attach_columns(orders, customer, "o_custkey", "c_custkey",
                                    {"c_mktsegment": "c_mktsegment"}, None,
                                    how="inner")
    out = enriched.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )

    def rnd(t: pa.Table) -> pa.Table:
        return round_col(t, "revenue", 2)

    return out.map_batches(rnd, batch_format="pyarrow").sort("c_mktsegment")


def q_semi_join(sf_dir: str):
    """Semi join ≙ officers⋉companies (/root/reference/R/loaders.R:1445):
    customers having ≥1 open ('O') order, counted per nation — adaptive
    key-set filter (broadcast when small, partitioned hash join when the
    key set exceeds the driver-safe limit)."""
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    keys_ds = orders.filter(expr="o_orderstatus == 'O'") \
        .select_columns(["o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    out = joins.semi_anti_filter(customer, "c_custkey", keys_ds, "o_custkey") \
        .groupby("c_nationkey").aggregate(Count(alias_name="n_customers"))
    return out.sort("c_nationkey")


def q_interval_join(sf_dir: str):
    """Equality key + numeric-range predicate ≙ the reference's interval
    join ``std_match_address_to_address`` join_by(within(start,end,...))
    (/root/reference/R/standardizers.R:2220-2257): count lineitems shipped
    within 30 days of their order's date."""
    from ray.data.aggregate import Count

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    from who_owns_mass_processing_ray.stages import joins

    enriched = joins.attach_columns(li, orders, "l_orderkey", "o_orderkey",
                                    {"o_orderdate": "o_orderdate"}, None,
                                    how="inner")

    def in_window(t: pa.Table) -> pa.Table:
        lo = t["o_orderdate"]
        hi = pc.add(lo, pa.scalar(30 * 86400 * 1_000_000, pa.duration("us")))
        ok = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                     pc.less_equal(t["l_shipdate"], hi))
        return t.filter(ok)

    out = enriched.map_batches(in_window, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Count(alias_name="n_in_window"))
    return out.sort("l_orderkey")


# ---------------------------------------------------------------------------
# Sorts / limits / distinct / set ops
# ---------------------------------------------------------------------------

def q_topk(sf_dir: str):
    """Global top-10 ≙ ``summ_site_group`` arrange(desc(prop_count))
    (/root/reference/R/summarizers.R:22-24) + LIMIT
    (/root/reference/R/loaders.R:1352)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    tot = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spend"))

    def rnd(t: pa.Table) -> pa.Table:
        return round_col(t, "total_spend", 2)

    return tot.map_batches(rnd, batch_format="pyarrow") \
        .sort(["total_spend", "o_custkey"], descending=[True, False]) \
        .limit(10)


def q_distinct(sf_dir: str):
    """Distinct projection ≙ ``dplyr::distinct``
    (/root/reference/R/deduplicaters.R:161-165)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    # distinct = groupby(all cols) + drop the count; partial aggregation
    # dedups map-side so only distinct rows shuffle
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="_c")).select_columns(["l_returnflag", "l_linestatus"])
    return out.sort(["l_returnflag", "l_linestatus"])


def q_union_entities(sf_dir: str):
    """Union-all + groupby ≙ the reference's bind_rows route-reunite pattern
    and ``dedupe_unique_addresses`` cross-table identity grouping
    (/root/reference/R/deduplicaters.R:59-206): customers + suppliers tagged
    by source table, counted per nation."""
    from ray.data.aggregate import Count

    cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: pa.table({
            "nationkey": t["c_nationkey"].cast(pa.int32()),
            "entity": pa.array(["customer"] * len(t), pa.string()),
        }), batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({
            "nationkey": t["s_nationkey"].cast(pa.int32()),
            "entity": pa.array(["supplier"] * len(t), pa.string()),
        }), batch_format="pyarrow")
    out = cust.union(supp).groupby(["nationkey", "entity"]).aggregate(
        Count(alias_name="n"))
    return out.sort(["nationkey", "entity"])


def q_split_rows(sf_dir: str):
    """Row-splitting parser ≙ ``std_separate_and_label`` 1→N explode
    (/root/reference/R/standardizers.R:1788-1877): explode document texts to
    words, count occurrences per (doc, word).  Vectorized: one Arrow
    split_pattern + list-flatten per batch, no Python per row."""
    from ray.data.aggregate import Count

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), n_per)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "word": pc.list_flatten(words)})

    out = docs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["doc_id", "word"]).aggregate(Count(alias_name="n"))
    return out.sort(["doc_id", "word"])


def _cascade_side(otbl: pa.Table):
    """orders table -> (sorted unique users, segment starts, keys, prices)
    with per-user rows ordered (latest o_orderdate, ties min o_orderkey)."""
    otbl = otbl.combine_chunks().sort_by(
        [("o_custkey", "ascending"), ("o_orderdate", "descending"),
         ("o_orderkey", "ascending")])
    u = otbl["o_custkey"].to_numpy()
    change = np.flatnonzero(u[1:] != u[:-1]) + 1
    starts = np.concatenate(([0], change, [len(u)]))
    return (u[starts[:-1]], starts, otbl["o_orderkey"].to_numpy(),
            otbl["o_totalprice"].to_numpy())


def _cascade_probe(t: pa.Table, side, strict: bool) -> pa.Table:
    """Vectorized probe: searchsorted into the per-user segments; the
    strict pass walks the k-th order of every still-unmatched event in
    lock-step (bounded by max orders/user), all numpy — no per-row
    Python (the r1 per-row loop died here)."""
    su, seg_starts, keys, prices = side
    users = t["user_id"].to_numpy()
    vals = t["value"].to_numpy()
    n = len(t)
    matched = np.full(n, -1, dtype=np.int64)
    pos = np.searchsorted(su, users)
    found = (pos < len(su))
    found[found] = su[pos[found]] == users[found]
    s = np.where(found, seg_starts[np.where(found, pos, 0)], 0)
    e = np.where(found, seg_starts[np.where(found, pos, 0) + 1], 0)
    if not strict:
        matched[found] = keys[s[found]]   # latest date, min key
    else:
        idx = s.copy()
        active = found.copy()
        while active.any():
            cur = idx[active]
            ok = prices[cur] >= 100.0 * vals[active]
            hit_rows = np.flatnonzero(active)[ok]
            matched[hit_rows] = keys[cur[ok]]
            idx[active] += 1
            active &= (matched < 0) & (idx < e)
    return pa.table({
        "event_id": t["event_id"],
        "user_id": t["user_id"],
        "value": t["value"],
        "matched_order": pa.array(matched),
    })


def _cascade_hits(matched_tbl: pa.Table, strict: bool) -> pa.Table:
    m = matched_tbl["matched_order"].to_numpy()
    keep = m >= 0
    out = matched_tbl.filter(pa.array(keep))
    return pa.table({
        "event_id": out["event_id"],
        "matched_order": out["matched_order"],
        "matched_strict": pa.array(np.full(out.num_rows, strict)),
    })


def q_cascade_match(sf_dir: str, broadcast_limit: int | None = None):
    """Cascading fallback match ≙ ``dedupe_address_to_address_seq``'s
    multi-pass loosening cascade (/root/reference/R/deduplicaters.R:10-56)
    and the route-transform-reunite bind_rows pattern: pass 1 matches each
    event to its user's latest order with ``o_totalprice >= 100*value``
    (strict key); rows left unmatched are FORWARDED to pass 2, which drops
    the price predicate; results re-unite.  Deterministic: latest
    o_orderdate, ties by min o_orderkey.

    ADAPTIVE side handling (the joins.attach_columns pattern): the orders
    side broadcasts once (ray.put, per-user sorted arrays) while it fits
    ``broadcast_limit``; past the limit NOTHING collects on the driver —
    both tables hash-partition on user_id and each partition runs the
    identical probe kernel locally (both passes inside the group, since
    matching is per-user).  Forced-path parity is tested
    (tests/test_queries.py::test_cascade_match_shuffle_fallback)."""
    import ray

    from who_owns_mass_processing_ray.stages import joins

    if broadcast_limit is None:
        broadcast_limit = joins.BROADCAST_ROW_LIMIT
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey",
                                      "o_orderdate", "o_totalprice"])
    events = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    if orders.count() <= broadcast_limit:
        side_tables = [t for t in ray.get(orders.to_arrow_refs())
                       if t.num_rows]
        side_ref = ray.put(_cascade_side(pa.concat_tables(side_tables)))

        def probe(t: pa.Table, strict: bool) -> pa.Table:
            return _cascade_probe(t, ray.get(side_ref), strict)

        pass1 = events.map_batches(lambda t: probe(t, True),
                                   batch_format="pyarrow").materialize()
        hit1 = pass1.filter(expr="matched_order >= 0").map_batches(
            lambda t: _cascade_hits(t, True), batch_format="pyarrow")
        # forward the unmatched remainder to the looser pass (route-reunite)
        hit2 = pass1.filter(expr="matched_order < 0").map_batches(
            lambda t: _cascade_probe(t, ray.get(side_ref), False),
            batch_format="pyarrow").map_batches(
            lambda t: _cascade_hits(t, False), batch_format="pyarrow")
        return hit1.union(hit2).sort("event_id")

    # shuffle path: co-partition on user, run both passes per partition
    num_parts = 32
    date_type = orders.schema().base_schema.field("o_orderdate").type

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["o_custkey"].cast(pa.int64()),
            "event_id": pa.nulls(len(t), pa.int64()),
            "value": pa.nulls(len(t), pa.float64()),
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_orderdate": t["o_orderdate"],
            "o_totalprice": t["o_totalprice"].cast(pa.float64()),
            "part": pa.array((t["o_custkey"].to_numpy() % num_parts)
                             .astype(np.int32)),
        })

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "value": t["value"].cast(pa.float64()),
            "o_orderkey": pa.nulls(len(t), pa.int64()),
            "o_orderdate": pa.nulls(len(t), date_type),
            "o_totalprice": pa.nulls(len(t), pa.float64()),
            "part": pa.array((t["user_id"].to_numpy() % num_parts)
                             .astype(np.int32)),
        })

    union = orders.map_batches(tag_orders, batch_format="pyarrow") \
        .union(events.map_batches(tag_events, batch_format="pyarrow"))

    def per_part(g: pa.Table) -> pa.Table:
        is_ev = pc.is_valid(g["event_id"])
        ev = g.filter(is_ev).select(["event_id", "user_id", "value"])
        if ev.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "matched_order": pa.array([], pa.int64()),
                             "matched_strict": pa.array([], pa.bool_())})
        od = g.filter(pc.invert(is_ev))
        od = pa.table({"o_custkey": od["user_id"],
                       "o_orderkey": od["o_orderkey"],
                       "o_orderdate": od["o_orderdate"],
                       "o_totalprice": od["o_totalprice"]})
        side = _cascade_side(od)
        p1 = _cascade_probe(ev, side, True)
        hits = [_cascade_hits(p1, True)]
        rest = p1.filter(pc.less(p1["matched_order"], 0))
        if rest.num_rows:
            hits.append(_cascade_hits(_cascade_probe(rest, side, False),
                                      False))
        return pa.concat_tables(hits)

    return union.groupby("part").map_groups(
        lambda g: per_part(g.drop_columns(["part"])),
        batch_format="pyarrow").sort("event_id")


def q_window_agg(sf_dir: str):
    """Tumbling-window aggregate (the streaming-window capability class the
    reference lacks, SURVEY.md §2.9): per (user, UTC hour) event count +
    value sum.  Window key derived vectorized in map_batches; partial
    aggregation combines map-side before the shuffle."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"user_id": t["user_id"], "hour": hour,
                         "value": t["value"]})

    out = ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby(["user_id", "hour"]).aggregate(
            Sum("value", alias_name="value_sum"),
            Count(alias_name="n_events"))

    def rnd(t: pa.Table) -> pa.Table:
        return round_col(t, "value_sum", 2)

    return out.map_batches(rnd, batch_format="pyarrow") \
        .sort(["user_id", "hour"])


def q_quantile_filter(sf_dir: str, q: float = 0.9):
    """Quantile-gated filter ≙ the reference's 0.95-quantile unit-count gate
    (/root/reference/R/loaders.R:1153): orders priced at or above the exact
    0.9 quantile_cont of o_totalprice, counted per orderstatus.  The
    quantile comes from functions/quantile.exact_quantile — streaming
    histogram bracketing, never a sort or a driver pull of the column."""
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.functions.quantile import exact_quantile

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    qv = exact_quantile(ds, "o_totalprice", q)

    def above(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["o_totalprice"], pa.scalar(qv)))

    out = ds.map_batches(above, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(Count(alias_name="n_above"))

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "q_value", pa.array([round_half_away(np.float64(qv), 2)] * len(t),
                                pa.float64()))

    return out.map_batches(stamp, batch_format="pyarrow").sort("o_orderstatus")


def q_group_fill_downup(sf_dir: str):
    """Direction-sensitive group fill ≙ ``tidyr::fill(.direction="downup")``
    within ordered groups (/root/reference/R/standardizers.R:1672-1692,
    used ~12x).  Coarse hash partition on the group key, then ONE vectorized
    numpy pass per partition: forward-fill via running maximum of valid row
    indices (invalidated when it crosses a group start), backward-fill
    symmetric — no per-group Python, groups never split across partitions."""
    # events: (user_id group, event_id sequence) — event_id is UNIQUE, so
    # the fill order is total on both engines (lineitem's l_linenumber has
    # duplicate (order, line) pairs, which would make the fill ambiguous)
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    P = 32

    def derive(t: pa.Table) -> pa.Table:
        # deterministic holes: every 3rd event loses its value
        hole = pa.array(t["event_id"].to_numpy() % 3 == 0)
        val = pc.if_else(hole, pa.nulls(len(t), pa.float64()), t["value"])
        part = (t["user_id"].to_numpy() % P).astype(np.int32)
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                         "val": val, "part": pa.array(part)})

    def fill(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("event_id", "ascending")])
        keys = g["user_id"].to_numpy()
        v = g["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        valid = ~np.isnan(v)
        idx = np.arange(n)
        grp_start = np.concatenate(
            ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1))
        grp_sizes = np.diff(np.concatenate((grp_start, [n])))
        start_of = np.repeat(grp_start, grp_sizes)
        ff = np.maximum.accumulate(np.where(valid, idx, -1))
        ff_ok = ff >= start_of           # fill must not cross a group start
        end_of = np.repeat(np.concatenate((grp_start[1:], [n])), grp_sizes)
        bf = np.minimum.accumulate(np.where(valid, idx, n)[::-1])[::-1]
        bf_ok = bf < end_of
        filled = np.where(ff_ok, v[np.where(ff_ok, ff, 0)],
                          np.where(bf_ok, v[np.where(bf_ok, bf, 0)], np.nan))
        return pa.table({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "val_filled": pa.array(filled),
        })

    out = ds.map_batches(derive, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: fill(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.sort(["user_id", "event_id"])


# crosswalk ≙ std_luc LUC code lookup with prefix fallback
# (/root/reference/R/standardizers.R:892-958): exact 3-digit match first,
# else the 2-digit prefix class, else UNKNOWN.
LUC_EXACT = {"013": "SINGLE_FAM", "104": "TWO_FAM", "275": "OFFICE",
             "342": "WAREHOUSE", "421": "INDUSTRIAL"}
LUC_PREFIX = {"01": "RESIDENTIAL", "10": "RESIDENTIAL", "27": "COMMERCIAL",
              "34": "COMMERCIAL", "42": "INDUSTRIAL", "00": "EXEMPT"}


def q_luc_crosswalk(sf_dir: str):
    """Crosswalk lookup with prefix fallback — both maps are tiny
    broadcast-side tables probed with Arrow ``index_in`` (C hash lookup),
    coalesced exact -> prefix -> default."""
    ds = _read(sf_dir, "part", ["p_partkey"])
    ex_keys = pa.array(sorted(LUC_EXACT), pa.string())
    ex_vals = pa.array([LUC_EXACT[k] for k in sorted(LUC_EXACT)], pa.string())
    px_keys = pa.array(sorted(LUC_PREFIX), pa.string())
    px_vals = pa.array([LUC_PREFIX[k] for k in sorted(LUC_PREFIX)],
                       pa.string())

    def look(t: pa.Table) -> pa.Table:
        code = pc.utf8_lpad(pc.cast(
            pa.array(t["p_partkey"].to_numpy() % 500, pa.int64()),
            pa.string()), 3, "0")
        exact = ex_vals.take(pc.index_in(code, value_set=ex_keys))
        pfx = px_vals.take(pc.index_in(
            pc.utf8_slice_codeunits(code, 0, 2), value_set=px_keys))
        cat = pc.coalesce(exact, pfx, pa.scalar("UNKNOWN"))
        return pa.table({"p_partkey": t["p_partkey"], "code": code,
                         "category": cat})

    return ds.map_batches(look, batch_format="pyarrow").sort("p_partkey")


def q_uniqueness_flags(sf_dir: str):
    """Multi-key uniqueness flags ≙ the reference's n()==1 flag pass over
    four keys (/root/reference/R/loaders.R:963-983): per order, is its
    customer unique (exactly one order) and is its order date unique —
    two keyed count aggregates joined back, never a window over raw rows."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def keyed(t: pa.Table) -> pa.Table:
        # int64 epoch-day key: Ray's groupby degrades timestamp key
        # precision (us -> s), which then fails the Acero join back —
        # integer keys sidestep the coercion entirely
        dk = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "date_key": pa.array(dk, pa.int64())})

    kd = ds.map_batches(keyed, batch_format="pyarrow")
    c1 = kd.groupby("o_custkey").aggregate(Count(alias_name="n_cust"))
    c2 = kd.groupby("date_key").aggregate(Count(alias_name="n_date"))
    from who_owns_mass_processing_ray.stages import joins

    out = joins.attach_columns(kd, c1, "o_custkey", "o_custkey",
                               {"n_cust": "n_cust"}, None, how="inner")
    out = joins.attach_columns(out, c2, "date_key", "date_key",
                               {"n_date": "n_date"}, None, how="inner")

    def flags(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "cust_unique": pc.equal(t["n_cust"], pa.scalar(1)),
            "date_unique": pc.equal(t["n_date"], pa.scalar(1)),
        })

    return out.map_batches(flags, batch_format="pyarrow").sort("o_orderkey")


def q_csv_topk(sf_dir: str):
    """Typed CSV source path ≙ ``load_oc_companies``'s readr::read_csv with
    an explicit col spec + filter + LIMIT (/root/reference/R/loaders.R:
    1303-1374).  The CSV fixture is materialized ONCE per sf_dir from the
    customer table by a distributed ``Dataset.write_csv`` (never a driver
    read), then read back with ``read_csv`` + an explicit Arrow schema."""
    import hashlib
    import os

    import ray.data as rd
    from pyarrow import csv as pacsv

    tag = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    csv_dir = f"/tmp/wom_csv_{tag}"
    if not os.path.isdir(csv_dir) or not os.listdir(csv_dir):
        os.makedirs(csv_dir, exist_ok=True)
        _read(sf_dir, "customer").write_csv(csv_dir)

    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                        ("c_nationkey", pa.int32()),
                        ("c_acctbal", pa.float64()),
                        ("c_mktsegment", pa.string())])
    ds = rd.read_csv(
        csv_dir,
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}))

    def rnd(t: pa.Table) -> pa.Table:
        return round_col(t, "c_acctbal", 2)

    return ds.filter(expr="c_mktsegment == 'BUILDING'") \
        .map_batches(rnd, batch_format="pyarrow") \
        .select_columns(["c_custkey", "c_name", "c_acctbal"]) \
        .sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(10)


def _fixture_dir(prefix: str, source_file: str, build) -> str:
    """Content-keyed, atomically-published /tmp fixture cache.

    The tag hashes the SOURCE file's (path, size, mtime_ns) — not just the
    path — so a regenerated corpus at the same sf_dir invalidates the
    fixture instead of silently reusing stale rows; ``build(tmp_dir)``
    writes into a scratch dir that is renamed into place only on success,
    so a crashed distributed write can never be mistaken for a complete
    fixture."""
    import hashlib
    import os
    import shutil

    st = os.stat(source_file)
    tag = hashlib.sha256(
        f"{os.path.abspath(source_file)}|{st.st_size}|{st.st_mtime_ns}"
        .encode()).hexdigest()[:12]
    final = f"/tmp/{prefix}_{tag}"
    if os.path.isdir(final) and os.listdir(final):
        return final
    tmp = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    build(tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        # another process published first — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    # GC (ADVICE r4): every corpus regeneration mints a new tag, and a
    # failed build from another pid strands its scratch dir — sweep
    # best-effort on successful publish so /tmp doesn't accumulate forever
    import glob as _glob
    import time as _time

    for stale in _glob.glob(f"/tmp/{prefix}_*"):
        if stale == final:
            continue
        if stale.startswith(final + ".tmp"):
            # same-tag scratch: only sweep if abandoned (a LIVE concurrent
            # builder of this tag may still be writing into its scratch)
            try:
                if _time.time() - os.stat(stale).st_mtime < 3600:
                    continue
            except OSError:
                continue
        shutil.rmtree(stale, ignore_errors=True)
    return final


def q_jsonl_ingest(sf_dir: str):
    """Typed JSONL source path — the ubiquitous training-data ingest format
    (one JSON object per line), the capability class of the reference's
    typed external reads (``load_oc_companies``, /root/reference/R/loaders.R:
    1303-1374) over a second wire format.  The fixture is materialized ONCE
    per sf_dir from the orders table by a distributed ``Dataset.write_json``
    (never a driver read): ints stay ints, the price is converted to exact
    integer cents and the timestamp to an ISO date string at write time so
    the JSON roundtrip is lossless.  Read back with ``ray.data.read_json``
    → typed parse (date-string slice) → filter → partial-sum groupby.

    -> (month, n_orders, total_cents) for fulfilled orders, by month."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def to_wire(t: pa.Table) -> pa.Table:
        # exact integer cents: floor(x*100 + 0.5) over the identical
        # double the oracle sees (prices are positive 2-decimals)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        day = pc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderstatus": t["o_orderstatus"],
            "total_cents": pa.array(cents),
            "order_date": day,
        })

    def build(tmp_dir: str) -> None:
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate"]) \
            .map_batches(to_wire, batch_format="pyarrow") \
            .write_json(tmp_dir)

    js_dir = _fixture_dir("wom_jsonl", f"{sf_dir}/orders.parquet", build)

    def parse(t: pa.Table) -> pa.Table:
        # the Arrow JSON reader type-infers ISO date strings back into
        # timestamps — the typed parse accepts either wire representation
        day = t["order_date"]
        if pa.types.is_timestamp(day.type):
            month = pc.strftime(day, format="%Y-%m")
        else:
            month = pc.utf8_slice_codeunits(day, 0, 7)
        return pa.table({
            "month": month,
            "total_cents": pc.cast(t["total_cents"], pa.int64()),
        })

    return rd.read_json(js_dir) \
        .filter(expr="o_orderstatus == 'F'") \
        .map_batches(parse, batch_format="pyarrow") \
        .groupby("month") \
        .aggregate(Count(alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents")) \
        .sort("month")


def jsonl_ingest_sql() -> str:
    """Oracle over the SAME parquet the fixture was derived from — the JSON
    roundtrip is lossless by construction, so the views-level SQL matches."""
    return """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# Unit-estimation rule engine ≙ proc_assess_sites_condos +
# proc_assess_sites_units (/root/reference/R/processors.R:577-628) composing
# std_flag_condos (standardizers.R:1930-1949), std_flag_residential
# (:2006-2052), std_units_from_luc (:960-991), std_test_units (:993-1037)
# and std_estimate_units (:1039-1144): LUC-driven conditional column
# rewrites with per-parcel group aggregates and a routed re-estimation of
# the rows that fail validity.
#
# Documented deviations from the reference source (both favor the evident
# intent): (1) std_test_units' Boston branch does not parse in the
# reference (stray "s" token, standardizers.R:1003) and its second mutate's
# `.default = TRUE` discards the first mutate's range checks — the engine
# implements the intended semantics (range checks AND condo/res checks);
# (2) the per-parcel address count (all_addr) is summed from the same
# derived table rather than a separate addresses join — the capability
# (group sum + re-attach) is identical and the join machinery is
# exercised by q_join_agg / interval_join.
# ---------------------------------------------------------------------------

UNIT_MUNIS = ["035", "017", "274", "049", "035"]
UNIT_LUCS = ["101", "102", "104", "105", "111", "112", "113", "114", "025",
             "026", "027", "970", "990", "908", "303", "120", "109"]
# residential LUC sets by index into UNIT_LUCS (≙ std_flag_residential's
# flags / nonboston_flags / boston_flags vocab — '103', '109', '0xxR'
# entries not present in the derived vocab are inherently unexercised)
_RES_COMMON_IDX = [0, 1, 2, 3, 16, 4, 5, 7, 12]     # 101 102 104 105 109 111 112 114 990
_RES_BOSTON_IDX = _RES_COMMON_IDX + [8, 9, 10, 15, 13]  # + 025 026 027 120 908
_RES_NONBOSTON_IDX = _RES_COMMON_IDX + [11]              # + 970
_CONDO_REWRITE_IDX = [11, 13]                            # 970, 908 (≙ :588)
EST_SIZE = 900.0


def q_unit_estimate(sf_dir: str):
    """LUC rule engine over parcels derived from orders: flag condos
    (group-filled) and residential rows, assign units from LUC, test
    validity, re-estimate invalid rows from address counts / floor area
    with per-parcel backfill, reunite."""
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages import joins

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    luc_arr = pa.array(UNIT_LUCS, pa.string())
    muni_arr = pa.array(UNIT_MUNIS, pa.string())

    def base(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy()
        ac = (okey % 9).astype(np.float64)
        ac[okey % 9 == 0] = np.nan        # ≙ the reference's NA addr counts
        return pa.table({
            "row_id": t["o_orderkey"],
            "loc_id": t["o_custkey"],
            "midx": pa.array((okey % 5).astype(np.int32)),
            "lidx": pa.array((okey % 17).astype(np.int32)),
            "units0": pa.array((okey % 5).astype(np.float64)),
            "res_area": t["o_totalprice"],
            "ac": pa.array(ac),
            # per-parcel aggregate contributions (pre-aggregated map-side)
            "condo_seed": pa.array((okey % 17 == 1).astype(np.int32)),
            "ac0": pa.array(np.nan_to_num(ac)),
        })

    rows = ds.map_batches(base, batch_format="pyarrow")
    g1 = rows.groupby("loc_id").aggregate(
        Sum("condo_seed", alias_name="condo_ct"),
        Sum("ac0", alias_name="all_addr"))
    rows = joins.attach_columns(
        rows, g1, "loc_id", "loc_id",
        {"condo_ct": "condo_ct", "all_addr": "all_addr"}, None, how="inner")

    def estimate(t: pa.Table) -> pa.Table:
        lidx = t["lidx"].to_numpy()
        midx = t["midx"].to_numpy()
        boston = (midx == 0) | (midx == 4)
        condo = t["condo_ct"].to_numpy() > 0
        res = np.where(boston, np.isin(lidx, _RES_BOSTON_IDX),
                       np.isin(lidx, _RES_NONBOSTON_IDX))
        u1 = t["units0"].to_numpy().copy()
        # condo LUC rewrite (processors.R:587-591), then std_units_from_luc
        u1[condo & np.isin(lidx, _CONDO_REWRITE_IDX)] = 1.0
        for idx, val in [(8, 1.0), (9, 2.0), (10, 3.0)]:
            u1[boston & (lidx == idx)] = val
        for idx, val in [(0, 1.0), (1, 1.0), (2, 2.0), (3, 3.0)]:
            u1[lidx == idx] = val
        # std_test_units (intended semantics; see module comment)
        bad = (boston & (((lidx == 4) & ~((u1 >= 4) & (u1 <= 6)))
                         | ((lidx == 5) & ~((u1 >= 7) & (u1 <= 30)))
                         | ((lidx == 6) & ~((u1 >= 31) & (u1 <= 99)))
                         | ((lidx == 7) & (u1 < 100))))
        bad |= (~boston & (((lidx == 4) & ~((u1 >= 4) & (u1 <= 8)))
                           | ((lidx == 5) & (u1 <= 8))))
        bad |= condo & (u1 != 1) & res
        bad |= res & (u1 == 0)
        valid = ~bad
        # std_estimate_units ladder (NaN addr counts fall through branches,
        # matching the reference's NA-condition case_when semantics)
        ac = t["ac"].to_numpy()
        acm1 = ac - 1.0
        uba = np.ceil(t["res_area"].to_numpy() / EST_SIZE)

        def btw(x, a, b):
            return (x >= a) & (x <= b)

        u2 = u1.copy()
        for mask, cand, lo_hi, floor_v in [
            (boston & (lidx == 4), acm1, (4, 6), 4.0),
            (boston & (lidx == 5), acm1, (7, 30), 7.0),
            (boston & (lidx == 6), acm1, (31, 99), 31.0),
            (~boston & (lidx == 4), ac, (4, 8), 4.0),
        ]:
            pick1 = btw(cand, *lo_hi)
            pick2 = btw(uba, *lo_hi)
            u2[mask] = np.where(pick1[mask], acm1[mask],
                                np.where(pick2[mask], uba[mask], floor_v))
        m = boston & (lidx == 7)
        u2[m] = np.where((acm1 >= 100)[m], acm1[m],
                         np.where((uba >= 100)[m], uba[m], 100.0))
        m = ~boston & (lidx == 5)
        u2[m] = np.where((ac > 8)[m], acm1[m],
                         np.where((uba > 8)[m], uba[m], 9.0))
        inv = ~valid
        return pa.table({
            "row_id": t["row_id"], "loc_id": t["loc_id"],
            "muni_id": muni_arr.take(t["midx"].cast(pa.int64())),
            "luc": luc_arr.take(t["lidx"].cast(pa.int64())),
            "res": pa.array(res), "condo": pa.array(condo),
            "units_valid": pa.array(valid),
            "u1": pa.array(u1), "u2": pa.array(u2),
            "ac": t["ac"], "uba": pa.array(uba),
            "all_addr": t["all_addr"],
            "tu_c": pa.array(np.where(inv, u2, 0.0)),
            "tm_c": pa.array((inv & (u2 == 0)).astype(np.int64)),
        })

    est = rows.map_batches(estimate, batch_format="pyarrow")
    g2 = est.groupby("loc_id").aggregate(
        Sum("tu_c", alias_name="total_units"),
        Sum("tm_c", alias_name="total_missing"))
    est = joins.attach_columns(
        est, g2, "loc_id", "loc_id",
        {"total_units": "total_units", "total_missing": "total_missing"},
        16, how="inner")

    def finish(t: pa.Table) -> pa.Table:
        valid = t["units_valid"].to_numpy(zero_copy_only=False)
        res = t["res"].to_numpy(zero_copy_only=False)
        u1 = t["u1"].to_numpy()
        u2 = t["u2"].to_numpy()
        ac = t["ac"].to_numpy()
        uba = t["uba"].to_numpy()
        q = ((t["all_addr"].to_numpy() - t["total_units"].to_numpy() - 1.0)
             / np.maximum(t["total_missing"].to_numpy(), 1.0))
        zero = res & (u2 == 0)
        u3 = np.where(zero & ~np.isnan(ac), ac,
                      np.where(zero & (q >= 1.0), np.ceil(q),
                               np.where(zero & (uba > 0), uba, u2)))
        return pa.table({
            "row_id": t["row_id"], "loc_id": t["loc_id"],
            "muni_id": t["muni_id"], "luc": t["luc"],
            "res": t["res"], "condo": t["condo"],
            "units_valid": t["units_valid"],
            "units": pa.array(np.where(valid, u1, u3)),
        })

    return est.map_batches(finish, batch_format="pyarrow").sort("row_id")


def unit_estimate_sql() -> str:
    munis = "[" + ", ".join(f"'{m}'" for m in UNIT_MUNIS) + "]"
    lucs = "[" + ", ".join(f"'{l}'" for l in UNIT_LUCS) + "]"
    res_b = ", ".join(str(i) for i in _RES_BOSTON_IDX)
    res_n = ", ".join(str(i) for i in _RES_NONBOSTON_IDX)
    condo_rw = ", ".join(str(i) for i in _CONDO_REWRITE_IDX)
    return f"""
        WITH base AS (
          SELECT o_orderkey AS row_id, o_custkey AS loc_id,
                 CAST(o_orderkey % 5 AS INTEGER) AS midx,
                 CAST(o_orderkey % 17 AS INTEGER) AS lidx,
                 CAST(o_orderkey % 5 AS DOUBLE) AS units0,
                 o_totalprice AS res_area,
                 CASE WHEN o_orderkey % 9 = 0 THEN NULL
                      ELSE CAST(o_orderkey % 9 AS DOUBLE) END AS ac
          FROM orders),
        b2 AS (
          SELECT *, (midx = 0 OR midx = 4) AS boston,
                 list_extract({munis}, midx + 1) AS muni_id,
                 list_extract({lucs}, lidx + 1) AS luc,
                 ceil(res_area / {EST_SIZE}) AS uba,
                 bool_or(lidx = 1) OVER (PARTITION BY loc_id) AS condo,
                 sum(coalesce(ac, 0)) OVER (PARTITION BY loc_id) AS all_addr
          FROM base),
        b3 AS (
          SELECT *,
            CASE WHEN boston THEN lidx IN ({res_b})
                 ELSE lidx IN ({res_n}) END AS res,
            CASE WHEN condo AND lidx IN ({condo_rw}) THEN 1.0
                 WHEN lidx IN (0, 1) THEN 1.0
                 WHEN lidx = 2 THEN 2.0
                 WHEN lidx = 3 THEN 3.0
                 WHEN boston AND lidx = 8 THEN 1.0
                 WHEN boston AND lidx = 9 THEN 2.0
                 WHEN boston AND lidx = 10 THEN 3.0
                 ELSE units0 END AS u1
          FROM b2),
        b4 AS (
          SELECT *,
            NOT ((boston AND ((lidx = 4 AND u1 NOT BETWEEN 4 AND 6)
                           OR (lidx = 5 AND u1 NOT BETWEEN 7 AND 30)
                           OR (lidx = 6 AND u1 NOT BETWEEN 31 AND 99)
                           OR (lidx = 7 AND u1 < 100)))
              OR (NOT boston AND ((lidx = 4 AND u1 NOT BETWEEN 4 AND 8)
                               OR (lidx = 5 AND u1 <= 8)))
              OR (condo AND u1 != 1 AND res)
              OR (res AND u1 = 0)) AS units_valid,
            CASE WHEN boston AND lidx = 4 THEN
                   CASE WHEN ac - 1 BETWEEN 4 AND 6 THEN ac - 1
                        WHEN uba BETWEEN 4 AND 6 THEN uba ELSE 4 END
                 WHEN boston AND lidx = 5 THEN
                   CASE WHEN ac - 1 BETWEEN 7 AND 30 THEN ac - 1
                        WHEN uba BETWEEN 7 AND 30 THEN uba ELSE 7 END
                 WHEN boston AND lidx = 6 THEN
                   CASE WHEN ac - 1 BETWEEN 31 AND 99 THEN ac - 1
                        WHEN uba BETWEEN 31 AND 99 THEN uba ELSE 31 END
                 WHEN boston AND lidx = 7 THEN
                   CASE WHEN ac - 1 >= 100 THEN ac - 1
                        WHEN uba >= 100 THEN uba ELSE 100 END
                 WHEN NOT boston AND lidx = 4 THEN
                   CASE WHEN ac BETWEEN 4 AND 8 THEN ac - 1
                        WHEN uba BETWEEN 4 AND 8 THEN uba ELSE 4 END
                 WHEN NOT boston AND lidx = 5 THEN
                   CASE WHEN ac > 8 THEN ac - 1
                        WHEN uba > 8 THEN uba ELSE 9 END
                 ELSE u1 END AS u2
          FROM b3),
        b5 AS (
          SELECT *,
            sum(CASE WHEN NOT units_valid THEN u2 ELSE 0 END)
                OVER (PARTITION BY loc_id) AS total_units,
            sum(CASE WHEN NOT units_valid AND u2 = 0 THEN 1 ELSE 0 END)
                OVER (PARTITION BY loc_id) AS total_missing
          FROM b4)
        SELECT row_id, loc_id, muni_id, luc, res, condo, units_valid,
               CAST(CASE WHEN units_valid THEN u1 ELSE
                 CASE WHEN res AND u2 = 0 AND ac IS NOT NULL THEN ac
                      WHEN res AND u2 = 0 AND
                           (all_addr - total_units - 1)
                               / greatest(total_missing, 1) >= 1
                           THEN ceil((all_addr - total_units - 1)
                                     / greatest(total_missing, 1))
                      WHEN res AND u2 = 0 AND uba > 0 THEN uba
                      ELSE u2 END END AS DOUBLE) AS units
        FROM b5 ORDER BY row_id
    """


# ---------------------------------------------------------------------------
# 6-pass address-match cascade ≙ dedupe_address_to_address_seq
# (/root/reference/R/deduplicaters.R:10-56) + std_simp_street
# (/root/reference/R/standardizers.R:1421-1434) + std_match_address_to_address
# (:2220-2257).  Pass sequence (the reference's, including the doubled
# strict pass): (body,muni,postal) x2 -> (body,muni) gated unique_in_muni ->
# (body,postal) gated unique_in_postal -> simp passes on body_simp (street
# type stripped) gated unique_in_muni_simp / unique_in_postal_simp.
# Reference fill semantics are OVERWRITE-on-match (case_when(!is.na(replace)
# ~ replace)): a later pass that matches replaces an earlier fill, so the
# engine combines pass results in reverse priority, exactly as sequential
# application would.  multiple="first" is made deterministic as min(loc_id)
# per key group (≙ SURVEY §4 determinism policy).
# ---------------------------------------------------------------------------

CM_NAMES = ["MAIN", "OAK", "ELM", "PINE", "MAPLE", "CEDAR", "WALNUT",
            "CHERRY", "LAKE", "HILL"]
CM_TYPES = ["STREET", "AVENUE", "ROAD", "LANE", "DRIVE", "COURT"]
CM_MUNIS = ["BOSTON", "NEWTON", "ACTON", "CAMBRIDGE", "QUINCY", "DEVENS",
            "SALEM"]
# ≙ SEARCH$street_types (/root/reference/R/standardizers.R:5-10) collapsed
# to the anchored strip regex std_simp_street builds
SIMP_STREET_TYPES = ["STREET", "AVENUE", "LANE", "EXTENSION", "PARK",
                     "DRIVE", "ROAD", "BOULEVARD", "PARKWAY", "TERRACE",
                     "PLACE", "WAY", "CIRCLE", "ALLEY", "SQUARE", "HIGHWAY",
                     "CENTER", "FREEWAY", "COURT", "PLAZA", "WHARF", "POINT",
                     "COVE", "RIDGE"]
SIMP_STREET_RE = " (" + "|".join(SIMP_STREET_TYPES) + ")$"


def _cm_parts(k: np.ndarray):
    """Deterministic address components for key array ``k``.  Class A
    (k%3==0) standalone; class B (k%3==1) paired with its C shadow (k%3==2,
    same fields, street type rotated +3) so (body,*) keys stay unique while
    (body_simp,*) keys are NOT — exercising the simp gates both ways; class
    E (k%51==0) collapses to one hot address so the strict pass's
    min-loc_id multi-match and all-gates-false routes are exercised."""
    b = np.where(k % 3 == 2, k - 1, k)
    e = k % 51 == 0
    num = np.where(e, 9, b % 1000)
    nix = np.where(e, 0, b % 10)
    tix = np.where(e, 0, np.where(k % 3 == 2, (b % 6 + 3) % 6, b % 6))
    mix = np.where(e, 0, b % 7)
    pix = np.where(e, 0, b % 25)
    return num, nix, tix, mix, pix


def _cm_assemble(num, nix, tix, mix, pix):
    names = pa.array(CM_NAMES, pa.string())
    types = pa.array(CM_TYPES, pa.string())
    munis = pa.array(CM_MUNIS, pa.string())
    body = pc.binary_join_element_wise(
        pc.cast(pa.array(num, pa.int64()), pa.string()),
        names.take(pa.array(nix, pa.int64())),
        types.take(pa.array(tix, pa.int64())), " ")
    muni = munis.take(pa.array(mix, pa.int64()))
    postal = pc.utf8_lpad(pc.cast(pa.array(pix, pa.int64()), pa.string()),
                          5, "0")
    return body, muni, postal


def _cm_simp(body):
    """≙ std_simp_street: strip one trailing canonical street type."""
    return pc.replace_substring_regex(body, pattern=SIMP_STREET_RE,
                                      replacement="")


def q_addr_match_cascade(sf_dir: str):
    """Match dirty order-derived addresses against the part-derived address
    table through all six reference passes.  The address side is the small
    (dimension) side: gathered once from the distributed read, the six
    pass tables built with Arrow group_by, shipped via ray.put, and probed
    with per-batch Acero joins — above joins.BROADCAST_ROW_LIMIT this side
    swaps to six Dataset.join shuffles keyed identically (the adaptive
    pattern of stages/joins.attach_columns)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey"])
    side_tables = [t for t in ray.get(part.to_arrow_refs()) if t.num_rows]
    pk = pa.concat_tables(side_tables)["p_partkey"].to_numpy()
    n_part = len(pk)
    body, muni, postal = _cm_assemble(*_cm_parts(pk))
    addr = pa.table({
        "loc_id": pa.array(pk, pa.int64()),
        "body": body, "muni": muni, "postal": postal,
        "body_simp": _cm_simp(body),
    })

    def side(keys: list[str], gate: bool) -> pa.Table:
        """(key cols..., loc): min loc_id per key group; gate=True keeps
        only groups of size 1 (the uniqueness-flag filter)."""
        g = addr.group_by(keys).aggregate(
            [("loc_id", "min"), ("loc_id", "count")])
        if gate:
            g = g.filter(pc.equal(g["loc_id_count"], 1))
        key = g[keys[0]]
        for c in keys[1:]:
            key = pc.binary_join_element_wise(key, g[c], "|")
        return pa.table({"k": key, "loc": g["loc_id_min"]})

    sides_ref = ray.put({
        1: side(["body", "muni", "postal"], gate=False),
        3: side(["body", "muni"], gate=True),
        4: side(["body", "postal"], gate=True),
        5: side(["body_simp", "muni"], gate=True),
        6: side(["body_simp", "postal"], gate=True),
    })

    def probe(t: pa.Table) -> pa.Table:
        sides = ray.get(sides_ref)
        okey = t["o_orderkey"].to_numpy()
        k = okey % n_part
        cls = okey % 6
        num, nix, tix, mix, pix = _cm_parts(k)
        tix = np.where(np.isin(cls, (3, 4)), (tix + 1) % 6, tix)
        body, muni, postal = _cm_assemble(num, nix, tix, mix, pix)
        body = pc.if_else(pa.array(cls == 5),
                          pa.array(["0 ZZZ NOWHERE"] * len(t)), body)
        muni = pc.if_else(pa.array(np.isin(cls, (2, 4))),
                          pa.array(["NOMUNI"] * len(t)), muni)
        postal = pc.if_else(pa.array(np.isin(cls, (1, 3))),
                            pa.array(["99999"] * len(t)), postal)
        simp = _cm_simp(body)
        keys = {
            1: pc.binary_join_element_wise(body, muni, postal, "|"),
            3: pc.binary_join_element_wise(body, muni, "|"),
            4: pc.binary_join_element_wise(body, postal, "|"),
            5: pc.binary_join_element_wise(simp, muni, "|"),
            6: pc.binary_join_element_wise(simp, postal, "|"),
        }
        probe_t = pa.table({"row_id": t["o_orderkey"],
                            **{f"k{p}": keys[p] for p in keys}})
        for p, s in sides.items():
            s = s.rename_columns(["k" + str(p), f"loc{p}"])
            probe_t = probe_t.join(s, keys=[f"k{p}"], join_type="left outer")
        probe_t = probe_t.sort_by("row_id")   # Acero joins reorder rows
        locs = [probe_t[f"loc{p}"] for p in (6, 5, 4, 3, 1)]
        loc = locs[0]
        for nxt in locs[1:]:
            loc = pc.if_else(pc.is_valid(loc), loc, nxt)
        match_pass = pa.nulls(len(probe_t), pa.int32())
        for p, col in zip((6, 5, 4, 3, 1), locs):
            match_pass = pc.if_else(
                pc.and_(pc.is_null(match_pass), pc.is_valid(col)),
                pa.scalar(p, pa.int32()), match_pass)
        return pa.table({
            "row_id": probe_t["row_id"],
            "loc_id": loc,
            "matched_pass": match_pass,
        })

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return orders.map_batches(probe, batch_format="pyarrow").sort("row_id")


def addr_match_cascade_sql() -> str:
    names = "[" + ", ".join(f"'{s}'" for s in CM_NAMES) + "]"
    types = "[" + ", ".join(f"'{s}'" for s in CM_TYPES) + "]"
    munis = "[" + ", ".join(f"'{s}'" for s in CM_MUNIS) + "]"

    parts_sql = """
            SELECT *, CASE WHEN kk % 3 = 2 THEN kk - 1 ELSE kk END AS b,
                   (kk % 51 = 0) AS e FROM __SRC__"""

    fields = f"""
        CASE WHEN e THEN 9 ELSE b % 1000 END AS num,
        CASE WHEN e THEN 0 ELSE b % 10 END AS nix,
        CASE WHEN e THEN 0
             WHEN kk % 3 = 2 THEN (b % 6 + 3) % 6
             ELSE b % 6 END AS tix,
        CASE WHEN e THEN 0 ELSE b % 7 END AS mix,
        CASE WHEN e THEN 0 ELSE b % 25 END AS pix"""
    assemble = f"""
        CAST(num AS VARCHAR) || ' ' ||
            list_extract({names}, CAST(nix AS INTEGER) + 1) || ' ' ||
            list_extract({types}, CAST(tix AS INTEGER) + 1) AS body,
        list_extract({munis}, CAST(mix AS INTEGER) + 1) AS muni,
        lpad(CAST(pix AS VARCHAR), 5, '0') AS postal"""
    return f"""
        WITH a0 AS (
            {parts_sql.replace('__SRC__',
                '(SELECT p_partkey, p_partkey AS kk FROM part)')}),
        a1 AS (SELECT p_partkey AS loc_id, kk, {fields} FROM a0),
        a2 AS (SELECT loc_id, {assemble} FROM a1),
        addr AS (SELECT *, regexp_replace(body, '{SIMP_STREET_RE}', '')
                     AS body_simp FROM a2),
        u AS (SELECT *,
                count(*) OVER (PARTITION BY body, muni) = 1 AS u_m,
                count(*) OVER (PARTITION BY body, postal) = 1 AS u_p,
                count(*) OVER (PARTITION BY body_simp, muni) = 1 AS u_ms,
                count(*) OVER (PARTITION BY body_simp, postal) = 1 AS u_ps
              FROM addr),
        s1 AS (SELECT body, muni, postal, min(loc_id) AS loc1
               FROM addr GROUP BY 1, 2, 3),
        s3 AS (SELECT body, muni, min(loc_id) AS loc3
               FROM u WHERE u_m GROUP BY 1, 2),
        s4 AS (SELECT body, postal, min(loc_id) AS loc4
               FROM u WHERE u_p GROUP BY 1, 2),
        s5 AS (SELECT body_simp, muni, min(loc_id) AS loc5
               FROM u WHERE u_ms GROUP BY 1, 2),
        s6 AS (SELECT body_simp, postal, min(loc_id) AS loc6
               FROM u WHERE u_ps GROUP BY 1, 2),
        q0 AS (
            {parts_sql.replace(
                '__SRC__',
                '''(SELECT o_orderkey AS row_id,
                    o_orderkey % (SELECT count(*) FROM part) AS kk,
                    o_orderkey % 6 AS cls FROM orders)''')}),
        q1 AS (SELECT row_id, cls, {fields.replace(
            'ELSE b % 6 END AS tix',
            'ELSE b % 6 END + CASE WHEN cls IN (3, 4) THEN 1 ELSE 0 END AS tix0')}
               FROM q0),
        q2 AS (SELECT row_id, cls, num, nix, tix0 % 6 AS tix, mix, pix
               FROM q1),
        q3 AS (SELECT row_id, cls, {assemble} FROM q2),
        q AS (SELECT row_id,
                 CASE WHEN cls = 5 THEN '0 ZZZ NOWHERE' ELSE body END AS body,
                 CASE WHEN cls IN (2, 4) THEN 'NOMUNI' ELSE muni END AS muni,
                 CASE WHEN cls IN (1, 3) THEN '99999' ELSE postal END AS postal
              FROM q3),
        qs AS (SELECT *, regexp_replace(body, '{SIMP_STREET_RE}', '')
                   AS body_simp FROM q)
        SELECT qs.row_id,
               COALESCE(loc6, loc5, loc4, loc3, loc1) AS loc_id,
               CAST(CASE WHEN loc6 IS NOT NULL THEN 6
                    WHEN loc5 IS NOT NULL THEN 5
                    WHEN loc4 IS NOT NULL THEN 4
                    WHEN loc3 IS NOT NULL THEN 3
                    WHEN loc1 IS NOT NULL THEN 1 END AS INTEGER)
                   AS matched_pass
        FROM qs
        LEFT JOIN s1 ON qs.body = s1.body AND qs.muni = s1.muni
                    AND qs.postal = s1.postal
        LEFT JOIN s3 ON qs.body = s3.body AND qs.muni = s3.muni
        LEFT JOIN s4 ON qs.body = s4.body AND qs.postal = s4.postal
        LEFT JOIN s5 ON qs.body_simp = s5.body_simp AND qs.muni = s5.muni
        LEFT JOIN s6 ON qs.body_simp = s6.body_simp AND qs.postal = s6.postal
        ORDER BY qs.row_id
    """


# ---------------------------------------------------------------------------
# LUC condo / residential flags ≙ std_flag_condos + std_flag_residential
# (/root/reference/R/standardizers.R:1930-1948, 2006-2052): condo = the
# row's PARCEL GROUP contains a luc '102' row (the reference flags condo
# rows TRUE/NA then tidyr::fill(downup)s within the parcel and
# replace_na(FALSE) — equivalently a per-group ANY), res = luc in the
# residential whitelist with the Boston (muni '035') vs non-Boston code
# routing.  The group-ANY is a keyed partial aggregate joined back through
# the adaptive broadcast/shuffle machinery — never a window over raw rows.
# ---------------------------------------------------------------------------

LUC_RES_FLAGS = ["101", "102", "103", "104", "105", "109", "111", "112",
                 "114", "990", "0xxR"]
LUC_RES_NONBOSTON = ["970"]
LUC_RES_BOSTON = ["025", "026", "027", "120", "908"]

# derived columns: hits and misses for every routing branch
_LUC_POOL = ["101", "102", "970", "908", "303", "0xxR", "340", "025",
             "990", "112"]
_MUNI_POOL = ["035", "001", "261"]


def q_luc_flags(sf_dir: str):
    from ray.data.aggregate import Max

    from who_owns_mass_processing_ray.stages import joins

    ds = _read(sf_dir, "documents", ["doc_id"])

    def derive(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        luc = pa.array(_LUC_POOL, pa.string()).take(
            pa.array(did % len(_LUC_POOL), pa.int64()))
        muni = pa.array(_MUNI_POOL, pa.string()).take(
            pa.array(did % len(_MUNI_POOL), pa.int64()))
        return pa.table({
            "doc_id": t["doc_id"],
            "parcel_id": pa.array(did // 4, pa.int64()),
            "luc": luc,
            "muni": muni,
            "is_condo_row": pc.cast(pc.equal(luc, "102"), pa.int64()),
        })

    rows = ds.map_batches(derive, batch_format="pyarrow")
    per_parcel = rows.groupby("parcel_id").aggregate(
        Max("is_condo_row", alias_name="parcel_has_condo"))
    joined = joins.attach_columns(
        rows, per_parcel, "parcel_id", "parcel_id",
        {"parcel_has_condo": "parcel_has_condo"}, num_partitions=None,
        how="left")

    nonb = pa.array(LUC_RES_FLAGS + LUC_RES_NONBOSTON, pa.string())
    bos = pa.array(LUC_RES_FLAGS + LUC_RES_BOSTON, pa.string())

    def flags(t: pa.Table) -> pa.Table:
        luc = t["luc"]
        boston = pc.equal(t["muni"], "035")
        res = pc.if_else(boston,
                         pc.is_in(luc, value_set=bos),
                         pc.is_in(luc, value_set=nonb))
        condo = pc.equal(pc.fill_null(t["parcel_has_condo"], 0), 1)
        return pa.table({
            "doc_id": t["doc_id"], "parcel_id": t["parcel_id"],
            "luc": luc, "muni": t["muni"],
            "condo": condo, "res": res,
        })

    return joined.map_batches(flags, batch_format="pyarrow").sort("doc_id")


def luc_flags_sql() -> str:
    def lst(xs):
        return ", ".join(f"'{x}'" for x in xs)

    luc = (f"list_extract([{lst(_LUC_POOL)}], "
           f"CAST(doc_id % {len(_LUC_POOL)} AS INTEGER) + 1)")
    muni = (f"list_extract([{lst(_MUNI_POOL)}], "
            f"CAST(doc_id % {len(_MUNI_POOL)} AS INTEGER) + 1)")
    return f"""
        WITH d AS (SELECT doc_id, doc_id // 4 AS parcel_id,
                          {luc} AS luc, {muni} AS muni FROM documents),
        c AS (SELECT parcel_id,
                     max(CASE WHEN luc = '102' THEN 1 ELSE 0 END) = 1
                         AS parcel_has_condo
              FROM d GROUP BY parcel_id)
        SELECT d.doc_id, d.parcel_id, d.luc, d.muni,
               COALESCE(c.parcel_has_condo, FALSE) AS condo,
               CASE WHEN d.muni = '035'
                    THEN d.luc IN ({lst(LUC_RES_FLAGS + LUC_RES_BOSTON)})
                    ELSE d.luc IN ({lst(LUC_RES_FLAGS + LUC_RES_NONBOSTON)})
               END AS res
        FROM d LEFT JOIN c ON d.parcel_id = c.parcel_id
        ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# Event-stream operators: sessionization, rolling windows, JSON parsing
# (streaming capability classes a training-data ingest pipeline needs;
# the reference's closest analog is its per-group ordered mutate chains,
# /root/reference/R/standardizers.R:1672-1692)
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30
_SESS_PARTS = 32


def _event_parts(t: pa.Table, cols: list[str]) -> pa.Table:
    """Attach the coarse user-hash partition key (groups never split)."""
    part = (t["user_id"].to_numpy() % _SESS_PARTS).astype(np.int32)
    return pa.table({c: t[c] for c in cols} | {"part": pa.array(part)})


def q_sessionize(sf_dir: str):
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``SESSION_GAP_MIN`` minutes.  Coarse hash
    partition on user_id, then ONE vectorized numpy pass per partition
    (sort, break detection, ``np.add.reduceat`` segment aggregation) —
    no per-session Python.  Sessions never span partitions because a
    user's rows land in exactly one partition."""
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def sess(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        val = g["value"].to_numpy().astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_seq": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "t_start": pa.array([], pa.timestamp("us")),
                "t_end": pa.array([], pa.timestamp("us")),
                "value_sum": pa.array([], pa.float64()),
            })
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = new_user | np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, n))
        # session_seq = 1-based session index within the user
        sess_idx = np.cumsum(brk) - 1
        user_starts = np.flatnonzero(new_user)
        user_sizes = np.diff(np.append(user_starts, n))
        first_sess = np.repeat(sess_idx[user_starts], user_sizes)
        seq = (sess_idx - first_sess + 1)[starts]
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "session_seq": pa.array(seq.astype(np.int64)),
            "n_events": pa.array(sizes.astype(np.int64)),
            "t_start": pa.array(ts[starts].astype("datetime64[us]")),
            "t_end": pa.array(ts[ends].astype("datetime64[us]")),
            "value_sum": pa.array(
                round_half_away(np.add.reduceat(val, starts), 2)),
        })

    out = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]) \
        .map_batches(lambda t: _event_parts(
            t, ["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: sess(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.sort(["user_id", "session_seq"])


def sessionize_sql() -> str:
    return f"""
        WITH o AS (
          SELECT user_id, event_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        ),
        s AS (
          SELECT *, CASE WHEN prev IS NULL
                          OR ts - prev > INTERVAL {SESSION_GAP_MIN} MINUTE
                     THEN 1 ELSE 0 END AS brk
          FROM o
        ),
        c AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess
          FROM s
        )
        SELECT user_id, CAST(sess AS BIGINT) AS session_seq,
               count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end,
               round(sum(value), 2) AS value_sum
        FROM c GROUP BY user_id, sess
        ORDER BY user_id, session_seq
    """


def q_rolling_agg(sf_dir: str):
    """Per-user running windows over the ordered event stream: cumulative
    value sum + trailing 3-event moving average.  Same coarse user-hash
    partitioning as q_sessionize; the window math is a padded-cumsum
    trick (one numpy pass), never per-row Python."""

    def roll(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        val = g["value"].to_numpy().astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "cum_sum": pa.array([], pa.float64()),
                "ma3": pa.array([], pa.float64()),
            })
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        user_starts = np.flatnonzero(new_user)
        user_sizes = np.diff(np.append(user_starts, n))
        start_of = np.repeat(user_starts, user_sizes)
        cs0 = np.concatenate(([0.0], np.cumsum(val)))
        idx = np.arange(n)
        cum = cs0[idx + 1] - cs0[start_of]
        w_start = np.maximum(idx - 2, start_of)
        wsum = cs0[idx + 1] - cs0[w_start]
        wcnt = (idx - w_start + 1).astype(np.float64)
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "cum_sum": pa.array(round_half_away(cum, 2)),
            "ma3": pa.array(round_half_away(wsum / wcnt, 4)),
        })

    out = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]) \
        .map_batches(lambda t: _event_parts(
            t, ["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: roll(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.select_columns(["event_id", "user_id", "cum_sum", "ma3"]) \
        .sort("event_id")


def rolling_agg_sql() -> str:
    return """
        SELECT event_id, user_id,
               round(sum(value) OVER w_all, 2) AS cum_sum,
               round(avg(value) OVER w_3, 4) AS ma3
        FROM events
        WINDOW w_all AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING),
               w_3 AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """


def q_json_extract(sf_dir: str):
    """Typed field extraction from a JSON-string column (``events.props``)
    — the semi-structured-source parse every ingest pipeline needs.  One
    ``pc.extract_regex`` C kernel per batch; no Python row loop.  The
    DuckDB oracle uses the real ``json_extract`` so the regex path is
    checked against an independent JSON parser."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def ext(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k,
                         "has_k": pc.is_valid(k)})

    return ds.map_batches(ext, batch_format="pyarrow").sort("event_id")


def json_extract_sql() -> str:
    return """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               json_extract_string(props, '$.k') IS NOT NULL AS has_k
        FROM events
        ORDER BY event_id
    """


def q_regex_redact(sf_dir: str):
    """PII-style masking over the semi-structured events payload: every
    digit run in ``props`` is replaced with '#' and counted — the redaction
    pass a training-data pipeline runs on identifiers before export.  Two
    RE2 C kernels per batch (``pc.replace_substring_regex`` +
    ``pc.count_substring_regex``); no Python row loop.  The oracle uses
    DuckDB's independent regexp engine on the same pattern."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def red(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "props_redacted": pc.replace_substring_regex(
                t["props"], r"[0-9]+", "#"),
            "n_masked": pc.count_substring_regex(
                t["props"], r"[0-9]+").cast(pa.int64()),
        })

    return ds.map_batches(red, batch_format="pyarrow").sort("event_id")


def regex_redact_sql() -> str:
    return """
        SELECT event_id,
               regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
               CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
                   AS n_masked
        FROM events
        ORDER BY event_id
    """


def q_anti_join(sf_dir: str):
    """Anti join — the complement of ``q_semi_join`` and the reference's
    negative-filter idiom (filter(!(id %in% matched)),
    /root/reference/R/deduplicaters.R:56-64): customers with NO
    fulfilled ('F') order, counted per market segment.  Adaptive key-set
    filter: broadcast + inverted ``pc.is_in`` when the key set is small,
    partitioned left-outer + null-marker filter when it is not — the big
    side never collects on the driver either way."""
    from ray.data.aggregate import Count

    from who_owns_mass_processing_ray.stages import joins

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'").select_columns(["o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    out = joins.semi_anti_filter(customer, "c_custkey", orders, "o_custkey",
                                 anti=True) \
        .groupby("c_mktsegment").aggregate(Count(alias_name="n_no_orders"))
    return out.sort("c_mktsegment")


def anti_join_sql() -> str:
    return """
        SELECT c_mktsegment, count(*) AS n_no_orders
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


_PIVOT_TYPES = ["click", "view", "purchase", "signup"]  # "error" -> other


def q_event_type_pivot(sf_dir: str):
    """Long→wide pivot: per-user event counts, one column per event type
    (≙ the reference's kind pivot in the metacorp rollup,
    /root/reference/R/deduplicaters.R:684-710, generalized).  The partial
    pivot happens INSIDE map_batches (one dictionary_encode + bincount per
    batch — combiner rows bounded by users-per-batch, not events), then a
    tiny groupby-SUM merges partials; unknown types land in ``other``."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    tmap = {t: i for i, t in enumerate(_PIVOT_TYPES)}
    k = len(_PIVOT_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        # NULL event_type lands deterministically in n_other (oracle uses
        # the same COALESCE sentinel), and dictionary_encode never sees
        # null indices.
        et = pc.fill_null(t["event_type"], "\x00null")
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        col_of = np.array([tmap.get(v, k) for v in
                           enc.dictionary.to_pylist()], np.int64)
        cols = col_of[enc.indices.to_numpy()]
        uids = t["user_id"].to_numpy()
        uniq, inv = np.unique(uids, return_inverse=True)
        flat = np.bincount(inv * (k + 1) + cols,
                           minlength=len(uniq) * (k + 1)) \
            .reshape(len(uniq), k + 1)
        out = {"user_id": pa.array(uniq)}
        for i, name in enumerate(_PIVOT_TYPES + ["other"]):
            out[f"n_{name}"] = pa.array(flat[:, i].astype(np.int64))
        return pa.table(out)

    aggs = [Sum(f"n_{name}", alias_name=f"n_{name}")
            for name in _PIVOT_TYPES + ["other"]]
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(*aggs).sort("user_id")


def event_type_pivot_sql() -> str:
    cols = ",\n               ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _PIVOT_TYPES)
    types = ", ".join(f"'{t}'" for t in _PIVOT_TYPES)
    return f"""
        SELECT user_id,
               {cols},
               CAST(count(*) FILTER (COALESCE(event_type, '') NOT IN ({types}))
                    AS BIGINT) AS n_other
        FROM events GROUP BY user_id ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# Bipartite affiliation-network chain, END TO END ≙ the reference's second
# clustering output (metacorps_network): dedupe_network over distinct
# (company_group, officer_group) edges -> igraph communities -> network id
# propagated to owners with a per-owner-group downup fill -> networks that
# never meet a property record pruned via a group-filled match flag
# (/root/reference/R/deduplicaters.R:882-1026, dedupe_network :248-288).
#
# Mapping onto the synthetic tables: affiliation edges are distinct
# (l_partkey, l_suppkey) pairs from flagged lineitems (quantity = 1, line 1
# — picked so the bipartite graph has ~83 nontrivial components at sf0.01,
# not one giant blob); "companies" are orders (linked to edges via
# l_orderkey), "owners" are orders grouped by o_custkey (the cosine group),
# and "meets a property record" is o_orderstatus = 'F'.  The whole chain —
# components included, via a recursive CTE — is DuckDB-expressible, so the
# query is driver hash-matched end to end.
#
# Scale shape: the edge list is the DISTINCT affiliation-pair set (O(edges)
# ≪ rows — the same bound the flagship's components stage documents via
# cfg.dsu_edge_limit, with stages/components.components_labelprop as the
# overflow path); per-batch distinct happens map-side before anything
# leaves the scan, node labels attach back via the adaptive join, and both
# fills are one groupby/aggregate each — never a driver-side loop.
# ---------------------------------------------------------------------------

def q_network_communities(sf_dir: str):
    """Per-company network assignment after pruning: (company_id,
    cosine_group, network_id) for every order whose (group-filled) network
    contains at least one fulfilled order."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Max, Min

    from who_owns_mass_processing_ray.stages import joins
    from who_owns_mass_processing_ray.stages.components import (
        min_label_components,
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_linenumber"])

    def edge_rows(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy()
        ln = t["l_linenumber"].to_numpy()
        m = (q == 1) & (ln == 1)
        pk = t["l_partkey"].to_numpy()[m].astype(np.int64)
        sk = t["l_suppkey"].to_numpy()[m].astype(np.int64)
        # per-batch distinct: only unique narrow pairs leave the scan
        key = pk * (1 << 32) + sk
        _, idx = np.unique(key, return_index=True)
        return pa.table({"a": pa.array(2 * pk[idx]),
                         "b": pa.array(2 * sk[idx] + 1)})

    edges = li.map_batches(edge_rows, batch_format="pyarrow").materialize()
    tables = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    empty = pa.table({"company_id": pa.array([], pa.int64()),
                      "cosine_group": pa.array([], pa.int64()),
                      "network_id": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    e = pa.concat_tables(tables).combine_chunks()
    a, b = e["a"].to_numpy(), e["b"].to_numpy()
    nodes = np.unique(np.concatenate((a, b)))
    lab = min_label_components(np.searchsorted(nodes, a),
                               np.searchsorted(nodes, b), len(nodes))
    net_of = nodes[lab]                      # component label = min node code
    pmask = nodes % 2 == 0                   # part-side nodes carry the label
    part_map = rd.from_arrow(pa.table({
        "pk": pa.array(nodes[pmask] // 2),
        "net": pa.array(net_of[pmask]),
    }))

    # company (order) network: min component label over its flagged lines
    def flagged(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["l_quantity"], 1),
                    pc.equal(t["l_linenumber"], 1))
        t2 = t.filter(m)
        return pa.table({"l_orderkey": t2["l_orderkey"],
                         "l_partkey": pc.cast(t2["l_partkey"], pa.int64())})

    li_net = joins.attach_columns(
        li.map_batches(flagged, batch_format="pyarrow"), part_map,
        "l_partkey", "pk", {"net": "net"}, None, how="inner")
    cnet = li_net.groupby("l_orderkey").aggregate(Min("net", alias_name="net"))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    own = joins.attach_columns(orders, cnet, "o_orderkey", "l_orderkey",
                               {"net": "net"}, None, how="left")

    # group fill downup within the cosine group (deterministic: the fill
    # value is the group MIN, ≙ tidyr::fill after arrange), then drop rows
    # whose whole group has no network — the reference's un-networked tail
    def fill(g: pa.Table) -> pa.Table:
        net = pc.cast(g["net"], pa.int64())
        fillv = pc.min(net).as_py()          # ignores nulls
        t = pa.table({
            "company_id": pc.cast(g["o_orderkey"], pa.int64()),
            "cosine_group": pc.cast(g["o_custkey"], pa.int64()),
            "network_id": net,
            "is_f": pc.cast(pc.equal(g["o_orderstatus"], "F"), pa.int64()),
        })
        if fillv is None:
            return t.slice(0, 0)
        return t.set_column(2, "network_id",
                            pc.fill_null(t["network_id"], fillv))

    filled = own.groupby("o_custkey").map_groups(
        fill, batch_format="pyarrow").materialize()

    match = filled.groupby("network_id").aggregate(
        Max("is_f", alias_name="m"))
    out = joins.attach_columns(filled, match, "network_id", "network_id",
                               {"m": "m"}, None, how="inner")

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["m"], 1))
        return pa.table({
            "company_id": t["company_id"],
            "cosine_group": t["cosine_group"],
            "network_id": t["network_id"],
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("company_id")


def network_communities_sql() -> str:
    return """
        WITH RECURSIVE e AS (
          SELECT DISTINCT 2 * l_partkey AS a, 2 * l_suppkey + 1 AS b
          FROM lineitem WHERE l_quantity = 1 AND l_linenumber = 1
        ),
        sym(x, y) AS (
          SELECT a, b FROM e UNION ALL SELECT b, a FROM e
        ),
        reach(id, r) AS (
          SELECT x, x FROM sym
          UNION
          SELECT s.y, reach.r FROM reach JOIN sym s ON s.x = reach.id
        ),
        lab AS (SELECT id, min(r) AS net FROM reach GROUP BY id),
        cnet AS (
          SELECT l.l_orderkey AS ok, min(lab.net) AS net
          FROM lineitem l JOIN lab ON lab.id = 2 * l.l_partkey
          WHERE l.l_quantity = 1 AND l.l_linenumber = 1
          GROUP BY 1
        ),
        own AS (
          SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, c.net
          FROM orders o LEFT JOIN cnet c ON c.ok = o.o_orderkey
        ),
        fill AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 coalesce(net, min(net) OVER (PARTITION BY o_custkey))
                   AS network_id
          FROM own
        ),
        mt AS (
          SELECT network_id,
                 max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS m
          FROM fill WHERE network_id IS NOT NULL GROUP BY 1
        )
        SELECT f.o_orderkey AS company_id,
               f.o_custkey AS cosine_group,
               f.network_id
        FROM fill f JOIN mt USING (network_id)
        WHERE mt.m = 1
        ORDER BY company_id
    """


# ---------------------------------------------------------------------------
# Metacorp enrichment rollup ≙ the public results contract
# (/root/reference/load_results.R:36-52): summ_sites_to_owners (link table
# ⨝ owners ⨝ sites, per-site derived val/units) -> summ_site_group
# (per-metacorp prop_count / unit_count / val sums + ratios,
# /root/reference/R/summarizers.R:1-25) -> summ_metacorps_network_companies
# (n_distinct companies per metacorp, :81-93).
#
# Mapping: sites ≙ orders (val = o_totalprice), units ≙ lineitem count per
# order, owners ≙ customer, metacorp id ≙ c_nationkey, companies per
# metacorp ≙ DISTINCT suppliers serving that metacorp's orders.  Shape: two
# partial-aggregated groupbys + adaptive joins; the n_distinct uses
# per-batch distinct (nation, supplier) pairs before the shuffle so only
# unique narrow pairs move.
# ---------------------------------------------------------------------------

def q_metacorp_rollup(sf_dir: str):
    """Per-metacorp rollup: prop_count, unit_count, val, units_per_prop,
    val_per_prop, company_count — sorted by prop_count desc (tiebreak id),
    the ``load_results`` summarize contract."""
    from ray.data.aggregate import Count, Sum

    from who_owns_mass_processing_ray.stages import joins

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    # units per site (lineitems per order): partial count map-side
    units = li.groupby("l_orderkey").aggregate(Count(alias_name="units"))
    sites = joins.attach_columns(orders, units, "o_orderkey", "l_orderkey",
                                 {"units": "units"}, None, how="left")
    sites = joins.attach_columns(sites, customer, "o_custkey", "c_custkey",
                                 {"c_nationkey": "metacorp_id"}, None,
                                 how="inner")

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "metacorp_id": pc.cast(t["metacorp_id"], pa.int64()),
            "units": pc.cast(pc.fill_null(t["units"], 0), pa.int64()),
            "val": t["o_totalprice"],
        })

    roll = sites.map_batches(derive, batch_format="pyarrow") \
        .groupby("metacorp_id").aggregate(
            Count(alias_name="prop_count"),
            Sum("units", alias_name="unit_count"),
            Sum("val", alias_name="val"))

    # n_distinct companies (suppliers) per metacorp: attach nation to the
    # link table, per-batch distinct pairs, then count distinct per group
    li_nat = joins.attach_columns(li, orders, "l_orderkey", "o_orderkey",
                                  {"o_custkey": "o_custkey"}, None, how="inner")
    li_nat = joins.attach_columns(li_nat, customer, "o_custkey", "c_custkey",
                                  {"c_nationkey": "metacorp_id"}, None,
                                  how="inner")

    def pair_distinct(t: pa.Table) -> pa.Table:
        n = t["metacorp_id"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        key = n * (1 << 32) + s
        _, idx = np.unique(key, return_index=True)
        return pa.table({"metacorp_id": pa.array(n[idx]),
                         "l_suppkey": pa.array(s[idx])})

    comp = li_nat.map_batches(pair_distinct, batch_format="pyarrow") \
        .groupby(["metacorp_id", "l_suppkey"]).aggregate(
            Count(alias_name="_dup")) \
        .groupby("metacorp_id").aggregate(
            Count(alias_name="company_count"))

    out = joins.attach_columns(roll, comp, "metacorp_id", "metacorp_id",
                               {"company_count": "company_count"}, None,
                               how="left")

    def ratios(t: pa.Table) -> pa.Table:
        prop = pc.cast(t["prop_count"], pa.float64())
        val = pc.cast(t["val"], pa.float64())
        tbl = pa.table({
            "metacorp_id": t["metacorp_id"],
            "prop_count": pc.cast(t["prop_count"], pa.int64()),
            "unit_count": pc.cast(t["unit_count"], pa.int64()),
            "val": val,
            "units_per_prop": pc.divide(
                pc.cast(t["unit_count"], pa.float64()), prop),
            "val_per_prop": pc.divide(val, prop),
            "company_count": pc.cast(
                pc.fill_null(t["company_count"], 0), pa.int64()),
        })
        return round_col(round_col(round_col(
            tbl, "val", 2), "units_per_prop", 6), "val_per_prop", 4)

    return out.map_batches(ratios, batch_format="pyarrow") \
        .sort(["prop_count", "metacorp_id"], descending=[True, False])


def metacorp_rollup_sql() -> str:
    return """
        WITH units AS (
          SELECT l_orderkey, count(*) AS units FROM lineitem GROUP BY 1
        ),
        sites AS (
          SELECT CAST(c.c_nationkey AS BIGINT) AS metacorp_id,
                 coalesce(u.units, 0) AS units,
                 o.o_totalprice AS val
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          LEFT JOIN units u ON u.l_orderkey = o.o_orderkey
        ),
        roll AS (
          SELECT metacorp_id,
                 CAST(count(*) AS BIGINT) AS prop_count,
                 CAST(sum(units) AS BIGINT) AS unit_count,
                 round(sum(val), 2) AS val,
                 round(sum(units) * 1.0 / count(*), 6) AS units_per_prop,
                 round(sum(val) / count(*), 4) AS val_per_prop
          FROM sites GROUP BY 1
        ),
        comp AS (
          SELECT CAST(c.c_nationkey AS BIGINT) AS metacorp_id,
                 CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
                   AS company_count
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1
        )
        SELECT r.metacorp_id, r.prop_count, r.unit_count, r.val,
               r.units_per_prop, r.val_per_prop,
               coalesce(cp.company_count, 0) AS company_count
        FROM roll r LEFT JOIN comp cp USING (metacorp_id)
        ORDER BY r.prop_count DESC, r.metacorp_id
    """


# ---------------------------------------------------------------------------
# As-of join — the nearest-prior-event time-series join class Ray Data has
# no native operator for (≙ the reference's first-match lookup discipline,
# std_match_address_to_address /root/reference/R/standardizers.R:1210-1280,
# transposed to the time axis).  Partitioning assumption (documented per the
# custom-operator contract): both sides hash-partition on the equality key
# (user_id), so a user's full history lands in one task and the as-of scan
# is a single sorted pass — no windowed cross join, no per-row Python.
# ---------------------------------------------------------------------------


def q_asof_join(sf_dir: str):
    """Every 'click' event matched to the same user's most recent
    'purchase' at or before it (inclusive).

    -> (event_id, user_id, ts, prior_purchase_ts, gap_us), sorted by
    event_id; prior/gap are NULL when the user has no earlier purchase.

    One vectorized pass per user partition: lexsort (user, ts, side) with
    purchases ordered before clicks at equal ts (inclusive semantics), a
    running ``np.maximum.accumulate`` over purchase positions, and per-user
    validity via segment starts.
    """
    _SCHEMA = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("prior_purchase_ts", pa.timestamp("us")),
        ("gap_us", pa.int64()),
    ])

    def parts(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        part = (t["user_id"].to_numpy() % _SESS_PARTS).astype(np.int32)
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"],
            "is_click": pc.equal(t["event_type"], "click"),
            "part": pa.array(part),
        })

    def asof(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SCHEMA.empty_table()
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("is_click", "ascending"),       # purchase first @ tie
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        isc = g["is_click"].to_numpy(zero_copy_only=False)
        n = len(uid)
        pos = np.arange(n, dtype=np.int64)
        last_p = np.maximum.accumulate(np.where(~isc, pos, -1))
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        user_starts = np.flatnonzero(new_user)
        seg_start = np.repeat(user_starts,
                              np.diff(np.append(user_starts, n)))
        idx = np.flatnonzero(isc)
        p_idx = last_p[idx]
        valid = p_idx >= seg_start[idx]
        prior = np.where(valid, ts[np.maximum(p_idx, 0)], 0)
        gap = ts[idx] - prior
        ev = g["event_id"].take(pa.array(idx))
        return pa.table({
            "event_id": ev,
            "user_id": pa.array(uid[idx]),
            "ts": pa.array(ts[idx].astype("datetime64[us]")),
            "prior_purchase_ts": pa.array(
                prior.astype("datetime64[us]"), mask=~valid),
            "gap_us": pa.array(gap, pa.int64(), mask=~valid),
        }, schema=_SCHEMA)

    out = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(parts, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: asof(g.drop_columns(["part"])), batch_format="pyarrow")
    return out.sort("event_id")


def asof_join_sql() -> str:
    return """
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, c.ts,
               max(p.ts) AS prior_purchase_ts,
               CAST(epoch_us(c.ts) - epoch_us(max(p.ts)) AS BIGINT) AS gap_us
        FROM c LEFT JOIN p
          ON p.user_id = c.user_id AND p.ts <= c.ts
        GROUP BY c.event_id, c.user_id, c.ts
        ORDER BY c.event_id
    """


# ---------------------------------------------------------------------------
# Table profiler — per-column (row count, nulls, exact distinct count,
# numeric min/max) in two streaming passes over a column-pruned read: a
# partial-stats pass (one tiny row per batch -> one Sum/Min/Max reduce) and
# a distinct pass reusing the distinct-hash shuffle shape of
# q_distinct_tokens (per-batch distinct 64-bit value hashes -> partitioned
# exact counts).  The standard first query against any new 100 TB drop.
# ---------------------------------------------------------------------------

PROFILE_COLS = ("l_quantity", "l_discount", "l_returnflag", "l_linestatus",
                "l_suppkey")
_PROFILE_NUMERIC = ("l_quantity", "l_discount", "l_suppkey")


def q_table_profile(sf_dir: str, num_parts: int | None = None):
    """-> (col_name, n_rows, n_null, n_distinct, min_num, max_num), one row
    per profiled lineitem column; min/max only for numeric columns (NULL
    for strings), rounded 4."""
    num_parts = num_parts or _auto_shuffle_parts()
    import ray

    from ray.data.aggregate import Max, Min, Sum

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    cols = list(PROFILE_COLS)
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)

    # --- pass 1: counts + numeric min/max (one partial row per batch) -----
    def partial_stats(t: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([t.num_rows], pa.int64())}
        for c in cols:
            col = t[c]
            out[f"null_{c}"] = pa.array(
                [int(col.null_count)], pa.int64())
            if c in _PROFILE_NUMERIC:
                valid = pc.drop_null(col)
                if len(valid):
                    out[f"min_{c}"] = pa.array(
                        [float(pc.min(valid).as_py())], pa.float64())
                    out[f"max_{c}"] = pa.array(
                        [float(pc.max(valid).as_py())], pa.float64())
                else:
                    out[f"min_{c}"] = pa.array([None], pa.float64())
                    out[f"max_{c}"] = pa.array([None], pa.float64())
        return pa.table(out)

    aggs = [Sum("n_rows", alias_name="n_rows")]
    for c in cols:
        aggs.append(Sum(f"null_{c}", alias_name=f"null_{c}"))
    for c in _PROFILE_NUMERIC:
        aggs.append(Min(f"min_{c}", alias_name=f"min_{c}"))
        aggs.append(Max(f"max_{c}", alias_name=f"max_{c}"))
    stats = ds.map_batches(partial_stats, batch_format="pyarrow") \
        .aggregate(*aggs)

    # --- pass 2: exact distinct via per-batch distinct value hashes -------
    def distinct_pairs(t: pa.Table) -> pa.Table:
        outs = []
        for ci, c in enumerate(cols):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = col.drop_null()
            if not len(col):
                continue
            if pa.types.is_floating(col.type):
                h = col.to_numpy().view(np.uint64)
            elif pa.types.is_integer(col.type):
                h = col.cast(pa.int64()).to_numpy().view(np.uint64)
            else:
                h = hx.hash_strings(col.cast(pa.string()))
            salt = np.uint64((ci * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
            h = hx.splitmix64(h ^ salt)
            hu = np.unique(h)
            outs.append(pa.table({
                "ci": pa.array(np.full(len(hu), ci, np.int32)),
                "h": pa.array(hu.view(np.int64)),
                "part": pa.array((hu % np.uint64(num_parts))
                                 .astype(np.int32)),
            }))
        if not outs:
            return pa.table({"ci": pa.array([], pa.int32()),
                             "h": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        return pa.concat_tables(outs)

    def count_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"ci": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        ci = g["ci"].to_numpy().astype(np.int64)
        key = np.stack((ci, g["h"].to_numpy()), axis=1)
        uniq = np.unique(key, axis=0)
        n = np.bincount(uniq[:, 0], minlength=len(cols))
        return pa.table({"ci": pa.array(np.arange(len(cols), dtype=np.int32)),
                         "n": pa.array(n.astype(np.int64))})

    dist = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: count_part(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby("ci").aggregate(Sum("n", alias_name="n_distinct"))
    dist_rows = {int(r["ci"]): int(r["n_distinct"])
                 for r in dist.take_all()}  # len == n profiled columns

    import ray.data as rd

    from who_owns_mass_processing_ray.functions.numeric import (
        round_half_away,
    )

    rows = []
    for ci, c in enumerate(cols):
        is_num = c in _PROFILE_NUMERIC
        rows.append({
            "col_name": c,
            "n_rows": int(stats["n_rows"]),
            "n_null": int(stats[f"null_{c}"]),
            "n_distinct": dist_rows.get(ci, 0),
            "min_num": (float(round_half_away(
                np.array([stats[f"min_{c}"]]), 4)[0]) if is_num else None),
            "max_num": (float(round_half_away(
                np.array([stats[f"max_{c}"]]), 4)[0]) if is_num else None),
        })
    return rd.from_arrow(pa.Table.from_pylist(rows)).sort("col_name")


def table_profile_sql() -> str:
    parts = []
    for c in PROFILE_COLS:
        if c in _PROFILE_NUMERIC:
            mn = f"round(min({c}) * 1.0, 4)"
            mx = f"round(max({c}) * 1.0, 4)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
        parts.append(f"""
          SELECT '{c}' AS col_name, count(*) AS n_rows,
                 count(*) - count({c}) AS n_null,
                 count(DISTINCT {c}) AS n_distinct,
                 {mn} AS min_num, {mx} AS max_num
          FROM lineitem""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


# ---------------------------------------------------------------------------
# Data-quality constraint audit — the expectations-suite capability class
# (declared rules → per-rule violation counts): range / domain / referential
# / uniqueness rules evaluated in ONE streaming pass over the fact table
# plus one gated key-set probe (orphans) and one hash-partitioned
# uniqueness reduce.  The report a pipeline gate reads before promoting a
# snapshot; generalizes the reference's validity gating in std_test_units
# (/root/reference/R/standardizers.R:993-1037) from inline rewrites to an
# auditable artifact.
# ---------------------------------------------------------------------------

def q_constraint_audit(sf_dir: str):
    """-> (rule, n_violations), one row per declared rule, sorted by rule.

    Scale shape: the in-row rules (range/domain) are per-batch boolean-sum
    partials (one row per batch leaves each task); the referential rule
    streams through the adaptive semi/anti filter (key side gated by
    BROADCAST_ROW_LIMIT); the uniqueness rule pre-counts composite-key
    duplicates IN-BATCH, then hash-partitions only (key, count) combiner
    rows — excess = sum(count) - distinct keys per partition."""
    import ray
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.functions import hashing as hx
    from who_owns_mass_processing_ray.stages import joins

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_tax", "l_returnflag"])

    # --- in-row rules: per-batch partial violation counts -------------------
    def partials(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        x = t["l_tax"].to_numpy(zero_copy_only=False)
        rf = t["l_returnflag"]
        dom = pc.sum(pc.invert(pc.is_in(
            rf, value_set=pa.array(["A", "N", "R"])))).as_py() or 0
        return pa.table({
            "rule": pa.array(["quantity_gt_45", "discount_range",
                              "tax_gt_0_05", "returnflag_domain"]),
            "n": pa.array([int((q > 45).sum()),
                           int(((d < 0) | (d > 0.1)).sum()),
                           int((x > 0.05).sum()), int(dom)], pa.int64()),
        })

    inrow = li.map_batches(partials, batch_format="pyarrow") \
        .groupby("rule").aggregate(Sum("n", alias_name="n_violations"))

    # --- referential rule: lineitem rows with no parent order ---------------
    # count() is the scalar action (an empty anti-join must still yield an
    # n_violations=0 row, which a groupby over zero rows cannot produce)
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    n_orphans = joins.semi_anti_filter(
        li.select_columns(["l_orderkey"]), "l_orderkey", orders,
        "o_orderkey", anti=True).count()
    orphan_n = ray.data.from_arrow(pa.table({
        "rule": pa.array(["orphan_orderkey"]),
        "n_violations": pa.array([int(n_orphans)], pa.int64()),
    }))

    # --- uniqueness rule: excess rows per duplicate (orderkey, lineno) ------
    # exact composite keys end-to-end (no hash-collision undercount at any
    # scale): in-batch segment pre-count, hash-partition the (key, cnt)
    # combiner rows on l_orderkey, exact segment reduce per partition.
    def key_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "l_linenumber": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        ok = t["l_orderkey"].to_numpy()
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ln, ok))
        oks, lns = ok[order], ln[order]
        new = np.concatenate(
            ([True], (oks[1:] != oks[:-1]) | (lns[1:] != lns[:-1])))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(oks)])))
        part = hx.splitmix64(oks[starts].astype(np.uint64)) % np.uint64(64)
        return pa.table({
            "l_orderkey": pa.array(oks[starts]),
            "l_linenumber": pa.array(lns[starts]),
            "cnt": pa.array(cnt.astype(np.int64)),
            "part": pa.array(part.astype(np.int32)),
        })

    def excess(g: pa.Table) -> pa.Table:
        ok = g["l_orderkey"].to_numpy()
        ln = g["l_linenumber"].to_numpy()
        order = np.lexsort((ln, ok))
        oks, lns = ok[order], ln[order]
        n_keys = int(np.concatenate(
            ([True], (oks[1:] != oks[:-1]) | (lns[1:] != lns[:-1]))).sum())
        return pa.table({
            "rule": pa.array(["dup_lineno"]),
            "n": pa.array([int(g["cnt"].to_numpy().sum() - n_keys)],
                          pa.int64()),
        })

    dup_n = li.map_batches(key_counts, batch_format="pyarrow") \
        .groupby("part").map_groups(excess, batch_format="pyarrow") \
        .groupby("rule").aggregate(Sum("n", alias_name="n_violations"))

    return inrow.union(orphan_n).union(dup_n).sort("rule")


def constraint_audit_sql() -> str:
    return """
        SELECT 'quantity_gt_45' AS rule,
               CAST(count(*) FILTER (WHERE l_quantity > 45) AS BIGINT)
                   AS n_violations FROM lineitem
        UNION ALL
        SELECT 'discount_range',
               CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                    AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'tax_gt_0_05',
               CAST(count(*) FILTER (WHERE l_tax > 0.05) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'returnflag_domain',
               CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R'))
                    AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'orphan_orderkey', CAST(count(*) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'dup_lineno', CAST(sum(c) - count(*) AS BIGINT) FROM (
            SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber)
        ORDER BY rule
    """


# ---------------------------------------------------------------------------
# ROLLUP aggregate (grouping sets) — subtotals + grand total in one query,
# a capability Ray Data's groupby lacks natively.  Scale shape: aggregate
# the FINEST level distributed (partial map-side combine, only combiner
# rows shuffle), then roll the tiny finest-level table up locally — correct
# whenever the finest-level cardinality is small (here 6 rows), which is
# the only regime where ROLLUP output is human-consumable anyway.
# ---------------------------------------------------------------------------

def q_rollup_agg(sf_dir: str):
    """-> (l_returnflag, l_linestatus, sum_qty, n_rows) for GROUP BY
    ROLLUP(l_returnflag, l_linestatus); rolled-up levels carry the 'ALL'
    marker (both engines COALESCE so NULL-handling is identical)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])
    fine = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="n_rows"),
    )

    def rollup(t: pa.Table) -> pa.Table:
        # t is the complete finest-level table (single small block)
        flag = t["l_returnflag"].to_pylist()
        stat = t["l_linestatus"].to_pylist()
        qty = t["sum_qty"].to_numpy()
        n = t["n_rows"].to_numpy()
        rows = [{"l_returnflag": f, "l_linestatus": s,
                 "sum_qty": float(q), "n_rows": int(c)}
                for f, s, q, c in zip(flag, stat, qty, n)]
        # level 1: per returnflag
        by_flag: dict[str, list[float]] = {}
        for f, q, c in zip(flag, qty, n):
            acc = by_flag.setdefault(f, [0.0, 0])
            acc[0] += float(q)
            acc[1] += int(c)
        for f in sorted(by_flag):
            rows.append({"l_returnflag": f, "l_linestatus": "ALL",
                         "sum_qty": by_flag[f][0], "n_rows": by_flag[f][1]})
        # level 0: grand total
        rows.append({"l_returnflag": "ALL", "l_linestatus": "ALL",
                     "sum_qty": float(qty.sum()), "n_rows": int(n.sum())})
        out = pa.Table.from_pylist(rows)
        return round_col(out, "sum_qty", 2)

    import ray
    import ray.data as rd

    parts = [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    merged = pa.concat_tables(parts).combine_chunks()
    return rd.from_arrow(rollup(merged)) \
        .sort(["l_returnflag", "l_linestatus"])


def rollup_agg_sql() -> str:
    return """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Burst-suppression event dedup — the streaming-dedup sibling of
# q_sessionize: within each (user, event_type) stream, a repeat arriving
# within BURST_GAP_SEC of the previous event is suppressed; the first event
# of each burst survives and carries how many repeats it absorbed.  Same
# scale shape as sessionize (coarse user-hash partition -> one vectorized
# pass); the suppressed rows never leave their partition.
# ---------------------------------------------------------------------------

BURST_GAP_SEC = 14400  # 4 h — suppresses ~7% of the synthetic stream


def q_event_burst_dedup(sf_dir: str):
    """-> (user_id, event_type, event_id, t_first, n_suppressed): first
    event of each burst (gap > BURST_GAP_SEC vs the PREVIOUS event starts a
    new burst — sessionize break semantics, so it is windowed-SQL
    expressible), with the count of suppressed repeats."""
    gap_us = BURST_GAP_SEC * 1_000_000
    cols = ["event_id", "user_id", "ts", "event_type"]

    def bursts(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "event_id": pa.array([], pa.int64()),
            "t_first": pa.array([], pa.timestamp("us")),
            "n_suppressed": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et = pc.fill_null(et, "\x00null")
        g = g.set_column(g.schema.get_field_index("event_type"),
                         "event_type", et)
        g = g.sort_by([("user_id", "ascending"),
                       ("event_type", "ascending"),
                       ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        enc = pc.dictionary_encode(g["event_type"].combine_chunks()
                                   if isinstance(g["event_type"],
                                                 pa.ChunkedArray)
                                   else g["event_type"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tcode = enc.indices.to_numpy().astype(np.int64)
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        eid = g["event_id"].to_numpy()
        n = len(uid)
        new_key = np.concatenate(([True], (uid[1:] != uid[:-1])
                                  | (tcode[1:] != tcode[:-1])))
        brk = new_key | np.concatenate(([True],
                                        (ts[1:] - ts[:-1]) > gap_us))
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, n))
        types = enc.dictionary.take(pa.array(tcode[starts]))
        types = pc.replace_substring_regex(types.cast(pa.string()),
                                           "^\x00null$", "")
        # restore genuine NULL for the sentinel
        types = pc.if_else(pc.equal(types, ""), pa.nulls(len(starts),
                                                         pa.string()), types)
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "event_type": types,
            "event_id": pa.array(eid[starts]),
            "t_first": pa.array(ts[starts].astype("datetime64[us]")),
            "n_suppressed": pa.array((sizes - 1).astype(np.int64)),
        })

    out = _read(sf_dir, "events", cols) \
        .map_batches(lambda t: _event_parts(t, cols),
                     batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: bursts(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.sort(["user_id", "event_type", "event_id"])


def event_burst_dedup_sql() -> str:
    return f"""
        WITH o AS (
          SELECT user_id, event_type, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS prev
          FROM events
        ),
        s AS (
          SELECT *, CASE WHEN prev IS NULL
                          OR ts - prev > INTERVAL {BURST_GAP_SEC} SECOND
                     THEN 1 ELSE 0 END AS brk
          FROM o
        ),
        c AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS burst
          FROM s
        )
        SELECT user_id, event_type,
               min(event_id ORDER BY ts, event_id) AS event_id,
               min(ts) AS t_first,
               count(*) - 1 AS n_suppressed
        FROM c GROUP BY user_id, event_type, burst
        ORDER BY user_id, event_type, event_id
    """


# ---------------------------------------------------------------------------
# Funnel analysis — ordered view -> click -> purchase progression per user
# (the canonical product-analytics query; each stage's timestamp is the
# earliest qualifying event STRICTLY AFTER the previous stage).  Same scale
# shape as sessionize: coarse user-hash partition, then three chained
# vectorized group-min passes (np.minimum.at on user codes) — no per-user
# Python, no driver collection.
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """-> (user_id, t_view, t_click, t_purchase, stage_reached) for every
    user appearing in events, sorted by user_id."""
    cols = ["event_id", "user_id", "ts", "event_type"]

    def funnel(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "t_view": pa.array([], pa.timestamp("us")),
            "t_click": pa.array([], pa.timestamp("us")),
            "t_purchase": pa.array([], pa.timestamp("us")),
            "stage_reached": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        users, ucode = np.unique(uid, return_inverse=True)
        big = np.iinfo(np.int64).max
        stage_t = []
        for s, name in enumerate(FUNNEL_STAGES):
            # qualifying: right type AND strictly after the previous stage
            qual = pc.equal(et, name).to_numpy(zero_copy_only=False)
            if s == 0:
                ok = qual
            else:
                p = stage_t[s - 1][ucode]
                ok = qual & (p < big) & (ts > p)
            t = np.full(len(users), big, np.int64)
            if ok.any():
                np.minimum.at(t, ucode[ok], ts[ok])
            stage_t.append(t)
        reached = np.zeros(len(users), np.int64)
        for t in stage_t:
            reached += (t < big).astype(np.int64)

        def col(t):
            arr = t.astype("datetime64[us]")
            return pa.array(np.where(t < big, arr,
                                     np.datetime64("NaT", "us")))

        return pa.table({
            "user_id": pa.array(users),
            "t_view": col(stage_t[0]),
            "t_click": col(stage_t[1]),
            "t_purchase": col(stage_t[2]),
            "stage_reached": pa.array(reached),
        })

    out = _read(sf_dir, "events", cols) \
        .map_batches(lambda t: _event_parts(t, cols),
                     batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: funnel(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.sort("user_id")


def funnel_sql() -> str:
    return """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (SELECT user_id, min(ts) AS t_view FROM events
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
              JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
              WHERE e.event_type = 'click' GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
              JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
              WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                    AS BIGINT) AS stage_reached
        FROM u
        LEFT JOIN v ON v.user_id = u.user_id
        LEFT JOIN c ON c.user_id = u.user_id
        LEFT JOIN p ON p.user_id = u.user_id
        ORDER BY u.user_id
    """


# ---------------------------------------------------------------------------
# Grouped linear regression — per-event-type OLS of value against time,
# the drift/trend monitor.  The textbook distributed form: regression needs
# only the sufficient statistics (n, Σx, Σy, Σxy, Σx²), so one partial-
# aggregate pass computes everything and only 5 numbers per (batch, group)
# shuffle.  x is DAYS since 2020-01-01 (shifting + day scale keep the
# float64 sufficient-statistics formula within rounding distance of the
# oracle's streaming covariance).
# ---------------------------------------------------------------------------

_REGR_EPOCH = np.datetime64("2020-01-01T00:00:00", "us").astype("int64")


def q_group_regression(sf_dir: str):
    """-> (event_type, n, slope_per_day, intercept, corr): per-type OLS of
    value on days-since-2020, rounded 6."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        ok = pc.and_(pc.is_valid(et), pc.is_valid(t["value"]))
        t2 = t.filter(ok)
        et = t2["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy().astype(np.int64)
        x = (t2["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
             - _REGR_EPOCH) / 86_400_000_000.0
        y = t2["value"].to_numpy().astype(np.float64)
        g = len(enc.dictionary)
        sums = np.zeros((g, 6))
        np.add.at(sums, code, np.stack(
            (np.ones(len(x)), x, y, x * y, x * x, y * y), axis=1))
        return pa.table({
            "event_type": enc.dictionary,
            "n": pa.array(sums[:, 0]),
            "sx": pa.array(sums[:, 1]),
            "sy": pa.array(sums[:, 2]),
            "sxy": pa.array(sums[:, 3]),
            "sxx": pa.array(sums[:, 4]),
            "syy": pa.array(sums[:, 5]),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        sx = t["sx"].to_numpy()
        sy = t["sy"].to_numpy()
        sxy = t["sxy"].to_numpy()
        sxx = t["sxx"].to_numpy()
        syy = t["syy"].to_numpy()
        cov = sxy - sx * sy / n
        varx = sxx - sx * sx / n
        vary = syy - sy * sy / n
        slope = cov / varx
        intercept = sy / n - slope * sx / n
        corr = cov / np.sqrt(varx * vary)
        return pa.table({
            "event_type": t["event_type"],
            "n": pa.array(n.astype(np.int64)),
            "slope_per_day": pa.array(round_half_away(slope, 6)),
            "intercept": pa.array(round_half_away(intercept, 6)),
            "corr": pa.array(round_half_away(corr, 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("event_type")


def group_regression_sql() -> str:
    return """
        WITH d AS (
          SELECT event_type,
                 CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2020-01-01')
                      AS DOUBLE) / 86400000000.0 AS x,
                 value AS y
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL)
        SELECT event_type, count(*) AS n,
               round(regr_slope(y, x), 6) AS slope_per_day,
               round(regr_intercept(y, x), 6) AS intercept,
               round(corr(y, x), 6) AS corr
        FROM d GROUP BY event_type ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# Changelog compaction — latest row per key (CDC upsert semantics): the
# standard "current state from an event log" materialization.  Partial
# per-batch top-1 per (user, type) key — valid because the global latest is
# a subset of the union of batch latests — then a tiny per-key final select;
# the event stream itself never shuffles.
# ---------------------------------------------------------------------------

def _latest_per_key(t: pa.Table) -> pa.Table:
    """Vectorized per-(user_id, event_type) top-1 by (ts desc, event_id
    desc): one sort + segment-head pass."""
    if t.num_rows == 0:
        return t
    s = t.sort_by([("user_id", "ascending"), ("event_type", "ascending"),
                   ("ts", "descending"), ("event_id", "descending")])
    uid = s["user_id"].to_numpy()
    et = s["event_type"]
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    enc = pc.dictionary_encode(et)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    new_seg = np.empty(len(uid), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = (uid[1:] != uid[:-1]) | (codes[1:] != codes[:-1])
    return s.filter(pa.array(new_seg))


def q_latest_by_key(sf_dir: str):
    """-> (user_id, event_type, event_id, ts, value): the most recent event
    per (user, type) — ties on ts broken by larger event_id — sorted by
    (user_id, event_type)."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["ts"])),
                     batch_format="pyarrow")
    # final pass runs per USER-HASH PARTITION (all rows of a key co-locate),
    # not per key — one vectorized segment-head per partition, no per-group
    # dispatch overhead
    out = ev.map_batches(_latest_per_key, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "part", pa.array((t["user_id"].to_numpy() % np.int64(32))
                             .astype(np.int32))), batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: _latest_per_key(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.map_batches(
        lambda t: round_col(t.select(["user_id", "event_type", "event_id",
                                      "ts", "value"]), "value", 2),
        batch_format="pyarrow").sort(["user_id", "event_type"])


def latest_by_key_sql() -> str:
    return """
        SELECT user_id, event_type, event_id, ts, round(value, 2) AS value
        FROM events WHERE ts IS NOT NULL
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id, event_type
    """


# ---------------------------------------------------------------------------
# Per-group z-score normalization — the feature-scaling op (per-entity
# standardization before modeling / outlier gating).  One partial-moment
# pass (n, Σx, Σx²) per group, tiny stats table re-attached via the
# adaptive join; the event stream pays zero shuffles.
# ---------------------------------------------------------------------------

def q_group_zscore(sf_dir: str, num_parts: int | None = None):
    """-> (event_id, user_id, value, zscore): population z-score of value
    within each user's events (users with one event or zero variance are
    excluded — zscore undefined), rounded 4, sorted by event_id."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["value"])),
                     batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        v = t["value"].to_numpy().astype(np.float64)
        u, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s1": pa.array(np.bincount(inv, weights=v)),
            "s2": pa.array(np.bincount(inv, weights=v * v)),
        })

    stats = ev.map_batches(moments, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("n", alias_name="n"),
                                      Sum("s1", alias_name="s1"),
                                      Sum("s2", alias_name="s2"))

    joined = attach_columns(ev, stats, "user_id", "user_id",
                            {"n": "n", "s1": "s1", "s2": "s2"}, num_parts)

    def score(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        s1 = t["s1"].to_numpy()
        s2 = t["s2"].to_numpy()
        v = t["value"].to_numpy().astype(np.float64)
        mean = s1 / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        sd = np.sqrt(var)
        keep = (n > 1) & (sd > 0)
        z = np.where(keep, (v - mean) / np.where(sd > 0, sd, 1.0), 0.0)
        out = pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "value": round_half_away(t["value"], 2),
            "zscore": pa.array(round_half_away(z, 4)),
        })
        return out.filter(pa.array(keep))

    return joined.map_batches(score, batch_format="pyarrow").sort("event_id")


def group_zscore_sql() -> str:
    return """
        WITH s AS (
          SELECT event_id, user_id, value,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 sum(value) OVER (PARTITION BY user_id) AS s1,
                 sum(value * value) OVER (PARTITION BY user_id) AS s2
          FROM events WHERE value IS NOT NULL)
        SELECT event_id, user_id, round(value, 2) AS value,
               round((value - s1 / n)
                     / sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0)), 4)
                   AS zscore
        FROM s
        WHERE n > 1 AND s2 / n - (s1 / n) * (s1 / n) > 0
        ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# Hot-key skew diagnostic — the audit run BEFORE any 100 TB groupby/join:
# per-key frequencies of a join key, the top-N hottest keys with their
# corpus share, and the p99 multiplier vs the mean.  This is the tool that
# decides whether a key needs salting (stages/pairs.py) before the shuffle.
# One partial-count pass; only (key, count) rows move.
# ---------------------------------------------------------------------------

def q_key_skew(sf_dir: str, n_top: int = 20):
    """-> (o_custkey, n_rows, share_pct, x_mean) for the ``n_top`` hottest
    order keys: row count, percent of all orders (rounded 4), and the
    multiplier vs the mean rows-per-key (rounded 2), hottest first (ties by
    key), sorted by (n_rows desc, o_custkey)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy()
        u, cnt = np.unique(k, return_counts=True)
        return pa.table({"o_custkey": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n_rows")) \
        .materialize()

    total = counts.aggregate(Sum("n_rows", alias_name="t"))["t"]
    n_keys = counts.count()
    mean = total / max(n_keys, 1)

    top = counts.sort(["n_rows", "o_custkey"],
                      descending=[True, False]).limit(n_top)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_rows"].to_numpy().astype(np.float64)
        return pa.table({
            "o_custkey": t["o_custkey"],
            "n_rows": t["n_rows"],
            "share_pct": pa.array(round_half_away(100.0 * n / total, 4)),
            "x_mean": pa.array(round_half_away(n / mean, 2)),
        })

    return top.map_batches(finish, batch_format="pyarrow") \
        .sort(["n_rows", "o_custkey"], descending=[True, False])


def key_skew_sql(n_top: int = 20) -> str:
    return f"""
        WITH c AS (
          SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1),
        t AS (SELECT sum(n_rows) AS tot, avg(n_rows) AS mean FROM c)
        SELECT c.o_custkey, c.n_rows,
               round(100.0 * c.n_rows / t.tot, 4) AS share_pct,
               round(c.n_rows / t.mean, 2) AS x_mean
        FROM c, t
        ORDER BY c.n_rows DESC, c.o_custkey LIMIT {n_top}
    """


# ---------------------------------------------------------------------------
# Quantile sketch via deterministic hash-sampling — the fixed-memory scale
# companion to the EXACT streaming-histogram quantiles (functions/
# quantile.py), mirroring the distinct_tokens / distinct_tokens_hll pairing.
# The sample predicate is a pure function of event_id (same multiplicative-
# hash uniform as q_weighted_sample), so the sketch is deterministic at ANY
# parallelism, mergeable by construction (a filter commutes with union), and
# — unlike KLL's random compaction — exactly reproducible in SQL, giving an
# approximate operator a bit-exact oracle on the sample itself.  Estimation
# error vs the true quantile is the standard sampling bound (rank RSE
# ~ sqrt(q(1-q)/m)), gated separately in pytest against the exact path.
# ---------------------------------------------------------------------------

_QS_MULT = 2654435761
_QS_RATE = 0.05
_QS_QUANTILES = (0.5, 0.9, 0.99)


def q_quantile_sketch(sf_dir: str, rate: float = _QS_RATE,
                      quantiles: tuple = _QS_QUANTILES):
    """-> (event_type, q, n_sample, value_est): nearest-rank quantiles of a
    deterministic ``rate``-fraction sample of ``value`` per event type,
    sorted (event_type, q).  Only sampled rows leave the scan."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        u = ((ids.astype(np.uint64) * np.uint64(_QS_MULT) + np.uint64(7))
             % np.uint64(1 << 32)).astype(np.float64)
        u = (u + 1.0) / float((1 << 32) + 1)
        keep = pa.array(u < rate)
        out = t.select(["event_type", "value"]).filter(keep)
        return out.filter(pc.is_valid(out["value"]))

    def ranks(g: pa.Table) -> pa.Table:
        v = np.sort(g["value"].to_numpy().astype(np.float64))
        m = len(v)
        qs = np.asarray(quantiles, dtype=np.float64)
        idx = np.maximum(np.ceil(qs * m), 1.0).astype(np.int64) - 1
        et = g["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(qs)),
            "q": pa.array(qs),
            "n_sample": pa.array(np.full(len(qs), m, np.int64)),
            "value_est": pa.array(round_half_away(v[idx], 4)),
        })

    return ev.map_batches(sample, batch_format="pyarrow") \
        .groupby("event_type").map_groups(ranks, batch_format="pyarrow") \
        .sort(["event_type", "q"])


def quantile_sketch_sql(rate: float = _QS_RATE,
                        quantiles: tuple = _QS_QUANTILES) -> str:
    qvals = ", ".join(f"({q})" for q in quantiles)
    return f"""
        WITH s AS (
          SELECT event_type, value FROM events
          WHERE value IS NOT NULL
            AND ((event_id * {_QS_MULT}::UBIGINT + 7) % 4294967296 + 1)
                / 4294967297.0 < {rate}),
        m AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
        r AS (SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn
              FROM s),
        q(q) AS (VALUES {qvals})
        SELECT r.event_type, q.q, m.n AS n_sample,
               round(r.value, 4) AS value_est
        FROM q, m
        JOIN r ON r.event_type = m.event_type
        WHERE r.rn = greatest(1, CAST(ceil(q.q * m.n) AS BIGINT))
        ORDER BY r.event_type, q.q
    """


# ---------------------------------------------------------------------------
# Fixed-bin value histogram — the distribution profiler (per-type bin counts
# + shares): what an engineer actually plots before choosing thresholds,
# complementing q_quantile_sketch's point estimates.  One partial-bincount
# pass; only (type, bin, count) rows move.
# ---------------------------------------------------------------------------

def q_value_histogram(sf_dir: str, bin_width: float = 50.0):
    """-> (event_type, bin_lo, n_events, share): count and in-type share
    (rounded 4) of events per ``bin_width``-wide value bin, sorted
    (event_type, bin_lo)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["value"])),
                     batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        b = np.floor(t["value"].to_numpy() / bin_width).astype(np.int64)
        nb = b.max() + 1 if len(b) else 1
        key = codes * nb + b
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u // nb)),
            "bin_lo": pa.array((u % nb).astype(np.float64) * bin_width),
            "n": pa.array(cnt.astype(np.int64)),
        })

    hist = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "bin_lo"]) \
        .aggregate(Sum("n", alias_name="n_events")).materialize()

    totals = {r["event_type"]: float(r["t"]) for r in
              hist.groupby("event_type").aggregate(
                  Sum("n_events", alias_name="t")).take_all()}

    def finish(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        tot = np.array([totals[s.as_py()] for s in et])
        n = t["n_events"].to_numpy().astype(np.float64)
        return t.append_column(
            "share", pa.array(round_half_away(n / tot, 4)))

    return hist.map_batches(finish, batch_format="pyarrow") \
        .sort(["event_type", "bin_lo"])


def value_histogram_sql(bin_width: float = 50.0) -> str:
    return f"""
        WITH h AS (
          SELECT event_type,
                 floor(value / {bin_width}) * {bin_width} AS bin_lo,
                 count(*) AS n_events
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT event_type, sum(n_events) AS tot FROM h GROUP BY 1)
        SELECT h.event_type, h.bin_lo, h.n_events,
               round(h.n_events * 1.0 / t.tot, 4) AS share
        FROM h JOIN t ON t.event_type = h.event_type
        ORDER BY h.event_type, h.bin_lo
    """


# ---------------------------------------------------------------------------
# Event-type Markov transitions — P(next type | type) per user-ordered event
# stream: the sequence-statistics prep (behavior modeling, anomaly priors)
# over the same partition shape as sessionize (user-hash partitions, one
# vectorized lag pass; a user's chain never splits).
# ---------------------------------------------------------------------------

def q_event_transitions(sf_dir: str):
    """-> (from_type, to_type, n_trans, p): per ordered user stream (ts,
    event_id), counts of consecutive event-type transitions and the
    row-normalized probability (rounded 4), sorted (from_type, to_type)."""
    from ray.data.aggregate import Sum

    def trans(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        n = len(uid)
        if n < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = uid[1:] == uid[:-1]
        f = codes[:-1][same]
        t_ = codes[1:][same]
        nd = len(enc.dictionary)
        key = f * nd + t_
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "from_type": enc.dictionary.take(pa.array(u // nd)),
            "to_type": enc.dictionary.take(pa.array(u % nd)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    counts = _read(sf_dir, "events",
                   ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_type"]))),
            batch_format="pyarrow") \
        .map_batches(lambda t: _event_parts(
            t, ["event_id", "user_id", "ts", "event_type"]),
            batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: trans(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n", alias_name="n_trans")).materialize()

    totals = {r["from_type"]: float(r["t"]) for r in
              counts.groupby("from_type").aggregate(
                  Sum("n_trans", alias_name="t")).take_all()}

    def finish(t: pa.Table) -> pa.Table:
        ft = t["from_type"]
        if isinstance(ft, pa.ChunkedArray):
            ft = ft.combine_chunks()
        tot = np.array([totals[s.as_py()] for s in ft])
        n = t["n_trans"].to_numpy().astype(np.float64)
        return t.append_column("p", pa.array(round_half_away(n / tot, 4)))

    return counts.map_batches(finish, batch_format="pyarrow") \
        .sort(["from_type", "to_type"])


def event_transitions_sql() -> str:
    return """
        WITH o AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
          WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        c AS (
          SELECT event_type AS from_type, nxt AS to_type, count(*) AS n_trans
          FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, sum(n_trans) AS tot FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n_trans,
               round(c.n_trans * 1.0 / t.tot, 4) AS p
        FROM c JOIN t ON t.from_type = c.from_type
        ORDER BY c.from_type, c.to_type
    """


# ---------------------------------------------------------------------------
# Hour-of-day activity profile — the seasonality diagnostic (crawl/ingest
# load shaping, bot detection): per (event_type, hour) counts + in-type
# share.  One partial-count pass over narrow columns.
# ---------------------------------------------------------------------------

def q_hourly_profile(sf_dir: str):
    """-> (event_type, hour, n_events, share): events per UTC hour-of-day
    and type with in-type share (rounded 4), sorted (event_type, hour)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["ts"])),
                     batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        hrs = pc.hour(t["ts"]).to_numpy().astype(np.int64)
        key = codes * 24 + hrs
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u // 24)),
            "hour": pa.array(u % 24),
            "n": pa.array(cnt.astype(np.int64)),
        })

    hist = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n_events")).materialize()

    totals = {r["event_type"]: float(r["t"]) for r in
              hist.groupby("event_type").aggregate(
                  Sum("n_events", alias_name="t")).take_all()}

    def finish(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        tot = np.array([totals[s.as_py()] for s in et])
        n = t["n_events"].to_numpy().astype(np.float64)
        return t.append_column(
            "share", pa.array(round_half_away(n / tot, 4)))

    return hist.map_batches(finish, batch_format="pyarrow") \
        .sort(["event_type", "hour"])


def hourly_profile_sql() -> str:
    return """
        WITH h AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                 count(*) AS n_events
          FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT event_type, sum(n_events) AS tot FROM h GROUP BY 1)
        SELECT h.event_type, h.hour, h.n_events,
               round(h.n_events * 1.0 / t.tot, 4) AS share
        FROM h JOIN t ON t.event_type = h.event_type
        ORDER BY h.event_type, h.hour
    """


# ---------------------------------------------------------------------------
# Cohort retention — users grouped by first-seen day, counted on each later
# active day (the standard retention triangle).  User-hash partitions make
# the per-user first-day and the distinct (cohort, offset, user) set exact
# without any cross-partition dedup: a user's rows live in ONE partition.
# ---------------------------------------------------------------------------

def q_cohort_retention(sf_dir: str):
    """-> (cohort_day, day_offset, n_users): distinct users of first-seen
    cohort ``cohort_day`` active ``day_offset`` days later, sorted
    (cohort_day, day_offset)."""
    from ray.data.aggregate import Sum

    def cohorts(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        day = g["ts"].cast(pa.timestamp("us")).to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        first = np.repeat(day[new_u], np.diff(
            np.append(np.flatnonzero(new_u), len(uid))))
        off = day - first
        key = np.unique(np.stack((first, off, uid), axis=1), axis=0)
        f, o = key[:, 0], key[:, 1]
        pk = np.unique(np.stack((f, o), axis=1), axis=0,
                       return_counts=True)
        (fo, cnt) = pk
        return pa.table({
            "cohort_day": pa.array(
                fo[:, 0].astype("datetime64[D]").astype("datetime64[us]")),
            "day_offset": pa.array(fo[:, 1]),
            "n": pa.array(cnt.astype(np.int64)),
        })

    out = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["ts"])),
                     batch_format="pyarrow") \
        .map_batches(lambda t: _event_parts(t, ["user_id", "ts"]),
                     batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: cohorts(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]) \
        .aggregate(Sum("n", alias_name="n_users"))
    return out.sort(["cohort_day", "day_offset"])


def cohort_retention_sql() -> str:
    return """
        WITH d AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
          WHERE ts IS NOT NULL),
        f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
        SELECT CAST(f.first_day AS TIMESTAMP_S) AS cohort_day,
               date_diff('day', f.first_day, d.day) AS day_offset,
               count(*) AS n_users
        FROM d JOIN f ON f.user_id = d.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Partitioned sink + manifest — the resumable-output contract as a query:
# write the documents table as hash-partitioned Parquet directories (one
# dir per partition, the layout a failed 100 TB run resumes from by
# skipping finished partitions) and return the verification manifest
# (per-partition rows/bytes/files).  The distributed write happens via
# Ray's parquet sink with partition columns; the manifest is read back
# from the filesystem, so it verifies WHAT LANDED, not what was intended.
# ---------------------------------------------------------------------------

def q_partitioned_write_manifest(sf_dir: str, num_parts: int = 8):
    """-> (part, n_rows, n_files, n_bytes): writes documents hash-
    partitioned by ``doc_id % num_parts`` under /tmp (fresh dir per call)
    and manifests the landed partitions, sorted by part.  Oracle: per-
    partition row counts are SQL (the manifest's n_rows must match the
    data); file/byte counts are filesystem facts asserted > 0."""
    import shutil

    import pandas as pd

    out_dir = f"/tmp/graft_part_write/{num_parts}"
    shutil.rmtree(out_dir, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    docs.map_batches(
        lambda t: t.append_column(
            "part", pa.array((t["doc_id"].to_numpy()
                              % np.int64(num_parts)).astype(np.int32))),
        batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["part"])

    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for d in sorted(glob.glob(f"{out_dir}/part=*")):
        part = int(d.rsplit("=", 1)[1])
        files = glob.glob(f"{d}/*.parquet")
        n_rows = sum(pq.read_metadata(f).num_rows for f in files)
        n_bytes = sum(os.path.getsize(f) for f in files)
        rows.append((part, n_rows, len(files), n_bytes))
    df = pd.DataFrame(rows, columns=["part", "n_rows", "n_files",
                                     "n_bytes"]).sort_values("part")
    # the driver compare covers (part, n_rows); files/bytes are
    # environment-dependent — assert sane, then drop
    assert (df.n_files > 0).all() and (df.n_bytes > 0).all()
    return df[["part", "n_rows"]].reset_index(drop=True)


def partitioned_write_manifest_sql(num_parts: int = 8) -> str:
    return f"""
        SELECT CAST(doc_id % {num_parts} AS BIGINT) AS part,
               count(*) AS n_rows
        FROM documents GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# MAD robust outliers — median/MAD-based anomaly gate per event type (the
# robust alternative to q_group_zscore: one extreme value cannot move the
# threshold).  Two exact streaming-quantile passes (functions/quantile.py —
# never sorts or collects the column), one derived-column map between them;
# thresholds broadcast as model-sized dicts.
# ---------------------------------------------------------------------------

_MAD_K = 3.5
_MAD_C = 1.4826


def q_group_mad_outliers(sf_dir: str):
    """-> (event_id, event_type, value, robust_z): events whose |value -
    type-median| exceeds 3.5 robust sigmas (MAD × 1.4826), with the robust
    z-score (rounded 4), sorted by event_id."""
    from who_owns_mass_processing_ray.functions.quantile import (
        exact_group_quantiles,
    )

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    med = {g: v[0.5] for g, v in exact_group_quantiles(
        ev, "event_type", "value", [0.5]).items()}

    def with_dev(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        uniq = et.unique()
        mm = np.array([med[s.as_py()] for s in uniq])
        m = mm[pc.index_in(et, uniq).to_numpy()]
        v = t["value"].to_numpy()
        return t.append_column("ad", pa.array(np.abs(v - m)))

    dev = ev.map_batches(with_dev, batch_format="pyarrow")
    mad = {g: v[0.5] for g, v in exact_group_quantiles(
        dev, "event_type", "ad", [0.5]).items()}

    def flag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        uniq = et.unique()
        mm = np.array([med[s.as_py()] for s in uniq])
        dd = np.array([mad[s.as_py()] for s in uniq])
        idx = pc.index_in(et, uniq).to_numpy()
        m, d = mm[idx], dd[idx]
        v = t["value"].to_numpy()
        keep = np.abs(v - m) > _MAD_K * _MAD_C * d
        z = (v - m) / (_MAD_C * np.where(d > 0, d, 1.0))
        out = pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": round_half_away(t["value"], 2),
            "robust_z": pa.array(round_half_away(z, 4)),
        })
        return out.filter(pa.array(keep & (d > 0)))

    return dev.map_batches(flag, batch_format="pyarrow").sort("event_id")


def group_mad_outliers_sql() -> str:
    return f"""
        WITH m AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY 1),
        d AS (
          SELECT e.event_id, e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS ad
          FROM events e JOIN m ON m.event_type = e.event_type),
        s AS (
          SELECT event_type, quantile_cont(ad, 0.5) AS mad
          FROM d GROUP BY 1)
        SELECT d.event_id, d.event_type, round(d.value, 2) AS value,
               round((d.value - d.med) / ({_MAD_C} * s.mad), 4) AS robust_z
        FROM d JOIN s ON s.event_type = d.event_type
        WHERE abs(d.value - d.med) > {_MAD_K} * {_MAD_C} * s.mad
          AND s.mad > 0
        ORDER BY d.event_id
    """


# ---------------------------------------------------------------------------
# Time-RANGE sliding window — per event, the trailing-1-hour sum/count of
# the user's values (peer-inclusive RANGE frame semantics, exactly SQL's
# ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``).  The
# row-window sibling is q_rolling_agg; time windows need a range search,
# vectorized here with ONE global searchsorted over composite
# (user << 43 | ts-offset) keys — sorted-by-(user, ts) rows make the
# composite strictly ordered, so no per-user Python loop.
# ---------------------------------------------------------------------------

_SLIDE_WINDOW_US = 3_600_000_000  # 1 hour


def q_sliding_window_agg(sf_dir: str):
    """-> (event_id, user_id, w_sum, w_n): trailing-1h peer-inclusive sum
    (rounded 2) and count of the user's event values, sorted by event_id."""

    def slide(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        val = g["value"].to_numpy().astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "w_sum": pa.array([], pa.float64()),
                             "w_n": pa.array([], pa.int64())})
        off = ts - ts.min()
        assert off.max() < (1 << 43), "ts span exceeds composite-key range"
        key = (uid.astype(np.int64) << 43) | off
        # peer-inclusive upper bound; lower bound clipped at the window
        hi = np.searchsorted(key, key, side="right")
        lo = np.searchsorted(
            key, (uid.astype(np.int64) << 43)
            | np.maximum(off - _SLIDE_WINDOW_US, 0), side="left")
        cs = np.concatenate(([0.0], np.cumsum(val)))
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "w_sum": pa.array(round_half_away(cs[hi] - cs[lo], 2)),
            "w_n": pa.array((hi - lo).astype(np.int64)),
        })

    out = _read(sf_dir, "events",
                ["event_id", "user_id", "ts", "value"]) \
        .map_batches(lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["value"]))),
            batch_format="pyarrow") \
        .map_batches(lambda t: _event_parts(
            t, ["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: slide(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.sort("event_id")


def sliding_window_agg_sql() -> str:
    return """
        SELECT event_id, user_id,
               round(sum(value) OVER w, 2) AS w_sum,
               CAST(count(*) OVER w AS BIGINT) AS w_n
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
        ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# Star join (TPC-H Q3 shape) — customer ⋈ orders ⋈ lineitem with dimension
# filters and a revenue rollup: the canonical multi-join composition
# (join_agg is two tables; real marts chain three+).  Both joins route
# through the adaptive broadcast/shuffle attach; revenue partials combine
# map-side before the final tiny groupby.
# ---------------------------------------------------------------------------

def q_star_join(sf_dir: str, segment: str = "BUILDING", num_parts: int | None = None):
    """-> (o_orderkey, o_orderdate, revenue): open orders of ``segment``
    customers with their discounted lineitem revenue (rounded 2), top 20 by
    (revenue desc, o_orderkey), sorted that way."""
    num_parts = num_parts or _auto_shuffle_parts()
    from ray.data.aggregate import Sum

    from who_owns_mass_processing_ray.stages.joins import attach_columns

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr=f"c_mktsegment == '{segment}'")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'O'")
    orders = attach_columns(orders, cust, "o_custkey", "c_custkey",
                            {"c_mktsegment": "seg"}, num_parts)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial_rev(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy()
        rev = (t["l_extendedprice"].to_numpy()
               * (1.0 - t["l_discount"].to_numpy()))
        u, inv = np.unique(k, return_inverse=True)
        return pa.table({"l_orderkey": pa.array(u),
                         "rev": pa.array(np.bincount(inv, weights=rev))})

    rev = li.map_batches(partial_rev, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("rev", alias_name="rev"))

    joined = attach_columns(orders, rev, "o_orderkey", "l_orderkey",
                            {"rev": "rev"}, num_parts)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "revenue": round_half_away(t["rev"], 2),
        })

    return joined.map_batches(finish, batch_format="pyarrow") \
        .sort(["revenue", "o_orderkey"], descending=[True, False]) \
        .limit(20)


def star_join_sql(segment: str = "BUILDING") -> str:
    return f"""
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{segment}' AND o_orderstatus = 'O'
        GROUP BY 1, 2
        ORDER BY revenue DESC, o_orderkey LIMIT 20
    """


# ---------------------------------------------------------------------------
# SCD-2 validity intervals — the slowly-changing-dimension build: every
# event becomes a version row [valid_from, valid_to) per (user, type), the
# open version carrying NULL valid_to (q_latest_by_key is the SCD-1
# collapse of the same log).  Same user-hash partition shape, one
# vectorized shift per partition.
# ---------------------------------------------------------------------------

def q_scd2_intervals(sf_dir: str):
    """-> (user_id, event_type, event_id, valid_from, valid_to, value,
    is_current): versioned rows per (user, type) ordered by (ts,
    event_id), sorted by (user_id, event_type, valid_from, event_id)."""

    def versions(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("event_type", "ascending"),
                       ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        ts = g["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "valid_from": pa.array([], pa.timestamp("us")),
                "valid_to": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
                "is_current": pa.array([], pa.bool_()),
            })
        same_key = np.r_[(uid[1:] == uid[:-1]) & (codes[1:] == codes[:-1]),
                         False]
        vt = np.where(same_key, np.r_[ts[1:], 0], 0)
        valid_to = pa.array(
            np.where(same_key, vt, 0).astype("datetime64[us]"),
            mask=~same_key)
        return pa.table({
            "user_id": g["user_id"],
            "event_type": g["event_type"],
            "event_id": g["event_id"],
            "valid_from": pa.array(ts.astype("datetime64[us]")),
            "valid_to": valid_to,
            "value": round_half_away(g["value"], 2),
            "is_current": pa.array(~same_key),
        })

    out = _read(sf_dir, "events",
                ["event_id", "user_id", "ts", "event_type", "value"]) \
        .map_batches(lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_type"]))),
            batch_format="pyarrow") \
        .map_batches(lambda t: _event_parts(
            t, ["event_id", "user_id", "ts", "event_type", "value"]),
            batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: versions(g.drop_columns(["part"])),
            batch_format="pyarrow")
    return out.sort(["user_id", "event_type", "valid_from", "event_id"])


def scd2_intervals_sql() -> str:
    return """
        SELECT user_id, event_type, event_id,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               round(value, 2) AS value,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id)
        ORDER BY user_id, event_type, valid_from, event_id
    """


# ---------------------------------------------------------------------------
# CDC snapshot diff — the change-data-capture table compare (added / removed
# / changed rows with per-column change attribution) every warehouse sync
# and dataset-versioning system needs.  Complements the family: delta_dedup
# is a content-hash anti-join, scd2_intervals versions one table over time;
# this diffs two SNAPSHOTS row-by-key and names which columns changed.
# Snapshots are derived deterministically from orders (old: keys with
# k % 11 == 3 absent — "inserted later"; new: keys with k % 13 == 5 absent
# — "deleted", price shifted +100.0 when k % 7 == 2, status rewritten to
# 'X' when k % 17 == 4).  Scale plan: both sides stream through ONE
# hash-partition shuffle of narrow (key, side, status, price) rows; the
# per-partition compare is two sorted-key searchsorted alignments — no
# broadcast, no driver collect, unchanged rows never leave the reduce.
# ---------------------------------------------------------------------------

_DIFF_PARTS = 32


def q_snapshot_diff(sf_dir: str):
    """-> (o_orderkey, change_type, changed_cols, old_price, new_price),
    one row per added/removed/changed key; absent-side price is -1.0."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy().astype(np.int64)
        status = t["o_orderstatus"]
        if isinstance(status, pa.ChunkedArray):
            status = status.combine_chunks()
        price = t["o_totalprice"].to_numpy().astype(np.float64)

        old_mask = keys % 11 != 3
        new_mask = keys % 13 != 5
        new_status = pc.if_else(
            pa.array(keys % 17 == 4), pa.scalar("X", pa.string()), status)
        new_price = np.where(keys % 7 == 2, price + 100.0, price)

        part = (keys * 2654435761) % 4294967296 % _DIFF_PARTS
        old_t = pa.table({
            "part": pa.array(part[old_mask]),
            "o_orderkey": pa.array(keys[old_mask]),
            "side": pa.array(np.zeros(int(old_mask.sum()), np.int8)),
            "status": status.filter(pa.array(old_mask)),
            "price": pa.array(price[old_mask]),
        })
        new_t = pa.table({
            "part": pa.array(part[new_mask]),
            "o_orderkey": pa.array(keys[new_mask]),
            "side": pa.array(np.ones(int(new_mask.sum()), np.int8)),
            "status": new_status.filter(pa.array(new_mask)),
            "price": pa.array(new_price[new_mask]),
        })
        return pa.concat_tables([old_t, new_t])

    _EMPTY = pa.table({
        "o_orderkey": pa.array([], pa.int64()),
        "change_type": pa.array([], pa.string()),
        "changed_cols": pa.array([], pa.string()),
        "old_price": pa.array([], pa.float64()),
        "new_price": pa.array([], pa.float64()),
    })

    def diff(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY
        side = g["side"].to_numpy()
        keys = g["o_orderkey"].to_numpy()
        price = g["price"].to_numpy()
        status_all = g["status"].to_numpy(zero_copy_only=False)

        om, nm = side == 0, side == 1
        ok, nk = keys[om], keys[nm]
        oord, nord = np.argsort(ok), np.argsort(nk)
        ok, nk = ok[oord], nk[nord]
        op, np_ = price[om][oord], price[nm][nord]
        ost, nst = status_all[om][oord], status_all[nm][nord]

        # align: for each old key, its position in new (if present)
        pos = np.searchsorted(nk, ok)
        pos_c = np.minimum(pos, max(len(nk) - 1, 0))
        in_new = (len(nk) > 0) & (nk[pos_c] == ok) if len(ok) else \
            np.zeros(0, bool)
        pos2 = np.searchsorted(ok, nk)
        pos2_c = np.minimum(pos2, max(len(ok) - 1, 0))
        in_old = (len(ok) > 0) & (ok[pos2_c] == nk) if len(nk) else \
            np.zeros(0, bool)

        rem_k, rem_p = ok[~in_new], op[~in_new]
        add_k, add_p = nk[~in_old], np_[~in_old]
        ci = np.flatnonzero(in_new)          # common, indexed on old side
        cj = pos_c[ci]                        # matching new-side index
        st_diff = ost[ci] != nst[cj]
        pr_diff = op[ci] != np_[cj]
        chg = st_diff | pr_diff
        ck = ok[ci][chg]
        cols = np.select(
            [st_diff[chg] & pr_diff[chg], st_diff[chg]],
            ["o_orderstatus,o_totalprice", "o_orderstatus"],
            "o_totalprice")
        out_k = np.concatenate([add_k, rem_k, ck])
        out_t = np.concatenate([
            np.full(len(add_k), "added"),
            np.full(len(rem_k), "removed"),
            np.full(len(ck), "changed")])
        out_c = np.concatenate([
            np.full(len(add_k) + len(rem_k), ""), cols])
        out_op = np.concatenate([
            np.full(len(add_k), -1.0), rem_p, op[ci][chg]])
        out_np = np.concatenate([
            add_p, np.full(len(rem_k), -1.0), np_[cj][chg]])
        return pa.table({
            "o_orderkey": pa.array(out_k),
            "change_type": pa.array(out_t, pa.string()),
            "changed_cols": pa.array(out_c, pa.string()),
            "old_price": round_half_away(pa.array(out_op), 2),
            "new_price": round_half_away(pa.array(out_np), 2),
        })

    return orders.map_batches(keyed, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: diff(g.drop_columns(["part"])),
            batch_format="pyarrow") \
        .sort("o_orderkey")


def snapshot_diff_sql() -> str:
    return """
        WITH old AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 11 <> 3
        ),
        new AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 17 = 4 THEN 'X'
                      ELSE o_orderstatus END AS o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice + 100.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 13 <> 5
        )
        SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type,
               CASE WHEN old.o_orderkey IS NULL OR new.o_orderkey IS NULL
                    THEN ''
                    ELSE concat_ws(',',
                      CASE WHEN old.o_orderstatus <> new.o_orderstatus
                           THEN 'o_orderstatus' END,
                      CASE WHEN old.o_totalprice <> new.o_totalprice
                           THEN 'o_totalprice' END) END AS changed_cols,
               round(COALESCE(old.o_totalprice, -1.0), 2) AS old_price,
               round(COALESCE(new.o_totalprice, -1.0), 2) AS new_price
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
           OR old.o_orderstatus <> new.o_orderstatus
           OR old.o_totalprice <> new.o_totalprice
        ORDER BY o_orderkey
    """


# ---------------------------------------------------------------------------
# Event-time watermark / late-data accounting — the streaming-ingestion
# audit every event-time pipeline runs: how much data would a tumbling
# window have missed had it closed at (window_end + watermark)?
# ---------------------------------------------------------------------------

LATE_DELAY_MOD_MIN = 120     # deterministic per-event ingest delay (minutes)
LATE_WATERMARK_MIN = 15      # window closes watermark minutes after its end


def q_late_data_audit(sf_dir: str):
    """-> (hour, n_events, n_late, late_share): per event-time tumbling
    hour window, how many events would arrive AFTER the window closed at
    ``end + watermark`` under a deterministic per-event ingest delay of
    ``event_id % LATE_DELAY_MOD_MIN`` minutes (the events table carries no
    arrival timestamp, so the delay is derived — identically in the SQL
    oracle — rather than invented at random).

    The streaming semantics demonstrated: event-time windowing with a
    processing-time watermark, late rows counted per window instead of
    silently dropped (the Beam/Flink allowed-lateness accounting).  Scale
    shape: one vectorized pass per batch reduces to per-hour partial
    counts; the only shuffle is the tiny (hours x 1) groupby."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_id", "ts"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["ts"])),
                     batch_format="pyarrow")
    us_per_min = np.int64(60_000_000)
    us_per_hour = np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("us")).to_numpy().astype("int64")
        eid = t["event_id"].to_numpy()
        hour = ts // us_per_hour
        arrival = ts + (eid % LATE_DELAY_MOD_MIN) * us_per_min
        close = (hour + 1) * us_per_hour + LATE_WATERMARK_MIN * us_per_min
        late = arrival > close
        u, inv = np.unique(hour, return_inverse=True)
        return pa.table({
            "hour_us": pa.array(u * us_per_hour),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "nl": pa.array(np.bincount(
                inv, weights=late.astype(np.float64)).astype(np.int64)),
        })

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour_us").aggregate(Sum("n", alias_name="n_events"),
                                      Sum("nl", alias_name="n_late"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy().astype(np.float64)
        return pa.table({
            "hour": pa.array(t["hour_us"].to_numpy()
                             .astype("datetime64[us]")),
            "n_events": t["n_events"],
            "n_late": t["n_late"],
            "late_share": pa.array(round_half_away(
                t["n_late"].to_numpy() / n, 4)),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("hour")


def late_data_audit_sql() -> str:
    return f"""
        SELECT date_trunc('hour', ts) AS hour,
               count(*) AS n_events,
               count(*) FILTER (
                 ts + (event_id % {LATE_DELAY_MOD_MIN}) * INTERVAL 1 MINUTE
                 > date_trunc('hour', ts) + INTERVAL 1 HOUR
                   + INTERVAL {LATE_WATERMARK_MIN} MINUTE) AS n_late,
               round(count(*) FILTER (
                 ts + (event_id % {LATE_DELAY_MOD_MIN}) * INTERVAL 1 MINUTE
                 > date_trunc('hour', ts) + INTERVAL 1 HOUR
                   + INTERVAL {LATE_WATERMARK_MIN} MINUTE)
                 / CAST(count(*) AS DOUBLE), 4) AS late_share
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# Crosswalk-driven schema adapter — the reference's porting mechanism
# ---------------------------------------------------------------------------

# Column crosswalk, declared as data (≙ data/col_cw.csv + data/unit_cw.csv in
# the reference's md-standardizer prototype, md-standardizer.R:186-233 — the
# documented mechanism for adapting a new state's foreign schema onto the
# canonical one).  Each rule: (foreign_col, canonical_col, conversion kind).
CUSTOMER_COL_CW = [
    ("cust_ref", "c_custkey", "int64"),
    ("cust_label", "c_name", "identity"),
    ("region_code", "c_nationkey", "strip_prefix_int32"),   # "N07" -> 7
    ("bal_cents", "c_acctbal", "cents_to_dollars"),
    ("seg", "c_mktsegment", "upper"),
]


def _apply_crosswalk(t: pa.Table, cw) -> pa.Table:
    """Vectorized crosswalk application: one Arrow kernel per rule kind —
    the generic ``Dataset -> Dataset`` adapter stage any foreign source
    plugs into (SURVEY §2.10: extension via crosswalk, not code)."""
    out = {}
    for src, dst, kind in cw:
        col = t[src]
        if kind == "identity":
            out[dst] = col
        elif kind == "int64":
            out[dst] = pc.cast(col, pa.int64())
        elif kind == "strip_prefix_int32":
            out[dst] = pc.cast(pc.utf8_slice_codeunits(col, 1, 2**30),
                               pa.int32())
        elif kind == "cents_to_dollars":
            # unit conversion + SQL-compatible rounding in ONE rule kind:
            # money rules carry their own output precision, nothing bolted
            # on outside the crosswalk mechanism
            out[dst] = pa.array(round_half_away(
                pc.divide(pc.cast(col, pa.float64()), 100.0)
                .to_numpy(zero_copy_only=False), 2))
        elif kind == "upper":
            out[dst] = pc.utf8_upper(col)
        else:  # pragma: no cover - config error, not data
            raise ValueError(f"unknown crosswalk kind {kind!r}")
    return pa.table(out)


def q_schema_adapt(sf_dir: str):
    """Crosswalk-driven schema adapter — SURVEY §2.10's extension surface
    (the md-standardizer prototype, /root/reference/md-standardizer.R:
    186-233 with data/col_cw.csv + data/unit_cw.csv): a FOREIGN-schema
    table (renamed columns, balances in integer cents, nation as a coded
    string, lowercased segment) adapts back onto the canonical ``customer``
    schema purely by declared crosswalk rules.

    The foreign fixture is materialized ONCE per sf_dir by a distributed
    ``write_parquet`` (never a driver loop); the adapter itself is one
    vectorized ``map_batches`` driven by the SAME rule list the oracle is
    judged against — the oracle reads the canonical table directly, so a
    hash match proves the foreign roundtrip is lossless.

    -> the adapted canonical rows (c_custkey, c_name, c_nationkey,
    c_acctbal, c_mktsegment), sorted by c_custkey."""
    import ray.data as rd

    def to_foreign(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        # exact integer cents (balances are signed 2-decimals)
        cents = np.floor(np.abs(bal) * 100.0 + 0.5).astype(np.int64) \
            * np.sign(bal).astype(np.int64)
        code = pc.binary_join_element_wise(
            pa.array(["N"] * len(t)),
            pc.utf8_lpad(pc.cast(t["c_nationkey"], pa.string()), 2, "0"),
            "")
        return pa.table({
            "cust_ref": pc.cast(t["c_custkey"], pa.int32()),
            "cust_label": t["c_name"],
            "region_code": code,
            "bal_cents": pa.array(cents),
            "seg": pc.utf8_lower(t["c_mktsegment"]),
        })

    def build(tmp_dir: str) -> None:
        _read(sf_dir, "customer").map_batches(
            to_foreign, batch_format="pyarrow").write_parquet(tmp_dir)

    fdir = _fixture_dir("wom_foreign", f"{sf_dir}/customer.parquet", build)

    return rd.read_parquet(fdir) \
        .map_batches(lambda t: _apply_crosswalk(t, CUSTOMER_COL_CW),
                     batch_format="pyarrow") \
        .sort("c_custkey")


def schema_adapt_sql() -> str:
    return """
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        FROM customer ORDER BY c_custkey
    """

# ---------------------------------------------------------------------------
# load_vintage_select — the modal-vintage file election
# (/root/reference/R/loaders.R:3-88): parse (muni_id, fy, cy) out of a file
# LISTING, elect the most-complete recent fiscal year (max file count, ties
# to max fy), then per municipality keep the exact-match files (cy-max
# tie-break) or, for municipalities with no file in the elected year, the
# nearest-year files (same tie-break).  Closes the last "missing" row of
# the r4 verdict.  The listing is a TABLE here (deterministic synthetic
# manifest from orders), not a filesystem walk — the distributed shape: the
# fy election is a tiny aggregate collected on the driver (bounded by the
# number of distinct years), the per-muni selection is one vectorized
# map_groups pass.
# ---------------------------------------------------------------------------

VINTAGE_YEAR = 2026     # explicit stand-in for the reference's Sys.Date()


def _vintage_listing(sf_dir: str):
    """Deterministic file-listing fixture: MassGIS-style names
    ``M<muni:03d>_FY<yy>_CY<yy>.gdb`` derived from o_orderkey.  Municipal
    year coverage varies by muni (muni % 4 controls the fy span), so both
    the exact-match and the nearest-year fallback paths carry rows."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def names(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        muni = k % 50
        span = 3 + (muni % 4)                     # 3..6 years of coverage
        fy = 2020 + (k // 7) % span
        cy = fy - (k % 2)
        fnames = [f"M{m:03d}_FY{f % 100:02d}_CY{c % 100:02d}.gdb"
                  for m, f, c in zip(muni, fy, cy)]
        return pa.table({"fname": pa.array(fnames, pa.string())})

    return ds.map_batches(names, batch_format="pyarrow")


def vintage_listing_sql() -> str:
    """The identical listing fixture in SQL (shared by the oracle)."""
    return """
        SELECT DISTINCT
               printf('M%03d_FY%02d_CY%02d.gdb',
                      muni, fy % 100, cy % 100) AS fname
        FROM (SELECT o_orderkey % 50 AS muni,
                     2020 + (o_orderkey // 7)
                          % (3 + (o_orderkey % 50) % 4) AS fy,
                     2020 + (o_orderkey // 7)
                          % (3 + (o_orderkey % 50) % 4)
                        - (o_orderkey % 2) AS cy
              FROM orders)
    """


def q_vintage_select(sf_dir: str, current_year: int = VINTAGE_YEAR,
                     recent: int = 3):
    """-> (muni_id, fy, cy): the files to load, one (or more, on exact cy
    ties) per municipality, sorted by (muni_id, fy, cy).  muni_id stays a
    zero-padded string exactly as the reference's str_extract yields it."""
    import re

    import ray

    listing = _vintage_listing(sf_dir)

    pat = re.compile(r"M([0-9]{3})_FY([0-9]{2})_CY([0-9]{2})\.gdb")

    def parse(t: pa.Table) -> pa.Table:
        munis, fys, cys = [], [], []
        for f in t["fname"].to_pylist():
            m = pat.match(f)
            munis.append(m.group(1))
            fys.append(2000 + int(m.group(2)))
            cys.append(2000 + int(m.group(3)))
        return pa.table({
            "muni_id": pa.array(munis, pa.string()),
            "fy": pa.array(fys, pa.int64()),
            "cy": pa.array(cys, pa.int64()),
        })

    rows = listing.map_batches(parse, batch_format="pyarrow") \
        .groupby(["muni_id", "fy", "cy"]).count() \
        .drop_columns(["count()"])

    rows = rows.materialize()     # consumed by the election AND the select

    # elect the most-complete recent fy: tiny histogram -> driver scalar
    # (bounded by the number of distinct years, never by the listing)
    hist = pa.concat_tables([t for t in ray.get(
        rows.filter(expr=f"fy > {current_year - recent}")
        .groupby("fy").count().to_arrow_refs()) if t.num_rows])
    counts = hist["count()"].to_numpy()
    fys = hist["fy"].to_numpy()
    best = fys[counts == counts.max()].max()

    def select(g: pa.Table) -> pa.Table:
        fy = g["fy"].to_numpy()
        cy = g["cy"].to_numpy()
        diff = np.abs(fy - best)
        if (diff == 0).any():
            keep = diff == 0
        else:
            keep = diff == diff.min()
        # cy-max tie-break only when more than one candidate
        if keep.sum() > 1:
            keep = keep & (cy == cy[keep].max())
        out = g.filter(pa.array(keep))
        return out.select(["muni_id", "fy", "cy"])

    return rows.groupby("muni_id") \
        .map_groups(select, batch_format="pyarrow") \
        .sort(["muni_id", "fy", "cy"])


def vintage_select_sql(current_year: int = VINTAGE_YEAR,
                       recent: int = 3) -> str:
    return f"""
        WITH listing AS ({vintage_listing_sql()}),
        rows_ AS (
            SELECT DISTINCT
                   regexp_extract(fname, 'M([0-9]{{3}})', 1) AS muni_id,
                   2000 + CAST(regexp_extract(fname, '_FY([0-9]{{2}})', 1)
                               AS BIGINT) AS fy,
                   2000 + CAST(regexp_extract(fname, '_CY([0-9]{{2}})', 1)
                               AS BIGINT) AS cy
            FROM listing),
        best AS (
            SELECT fy FROM (
                SELECT fy, count(*) AS n FROM rows_
                WHERE fy > {current_year - recent} GROUP BY fy)
            QUALIFY rank() OVER (ORDER BY n DESC) = 1
            ORDER BY fy DESC LIMIT 1),
        diffed AS (
            SELECT r.*, abs(r.fy - (SELECT fy FROM best)) AS year_diff
            FROM rows_ r),
        kept AS (
            SELECT * FROM diffed
            QUALIFY year_diff = min(year_diff) OVER (PARTITION BY muni_id)),
        tied AS (
            SELECT muni_id, fy, cy,
                   count(*) OVER (PARTITION BY muni_id) AS cnt,
                   max(cy) OVER (PARTITION BY muni_id) AS cymax
            FROM kept)
        SELECT muni_id, fy, cy FROM tied
        WHERE cnt = 1 OR cy = cymax
        ORDER BY muni_id, fy, cy
    """
