"""Normalizer-cascade queries — the driver-checked expression of the
reference's standardizer breadth (SURVEY.md §2.2).

Each query derives a DETERMINISTIC dirty string column from the documents
table (address-like / institution-like / unit-suffixed strings computed
from doc_id and the first token — the same arithmetic on both the Ray and
DuckDB side, so every rule actually FIRES on every row), then runs a
rule-cascade from ``functions/cascade.py``.  The DuckDB oracle for each
query is GENERATED from the same rule objects (``cascade_sql``), so the
compare is structural: any drift between the Arrow chain and the SQL chain
is a red driver row, not a silently stale hand-written oracle.

Reference analogs per query:
- ``q_cascade_norm``  ≙ proc_address_text composition of std_directions /
  std_street_types / std_small_numbers / std_small_ordinals /
  std_hyphenate_range / std_frac_to_dec / std_spacing_characters /
  std_leading_zeros (/root/reference/R/processors.R:233-286)
- ``q_inst_norm``     ≙ proc_name composition of std_inst_types /
  std_remove_titles / std_massachusetts / std_mass_corp /
  std_trailing_leading (/root/reference/R/processors.R:288-330)
- ``q_addr2_split``   ≙ the std_addr2_* peel family + keyword
  canonicalization (/root/reference/R/standardizers.R:1218-1419)
- ``q_text_norm``     ≙ load_generic_preprocess's uppercase / despecial /
  squish / junk→NA chain (std_uppercase, std_remove_special,
  std_replace_blank — /root/reference/R/standardizers.R:342-441)
- ``q_zip_format``    ≙ std_zip_format zero-pad + validity gate
  (/root/reference/R/standardizers.R:717-769)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from who_owns_mass_processing_ray.functions import cascade as cx

# -- deterministic dirty-string derivations (engine side + SQL side) --------

ADDR_DIRS = ["N", "SO", "E", "W", "NE", "GT"]
ADDR_NAMES = ["FIRST", "SECOND", "THIRD", "MAIN", "OAK", "TENTH", "ELM"]
ADDR_SUFS = ["ST", "AVE", "RD", "BLVD", "LN", "DRV", "CRT", "SQ"]
INST_SUFS = ["CORP", "RLTY TR", "PROPS LLC", "MGMT CO", "INV PRTNRS",
             "CONDO TST", "ASSN", "IRREV TR"]
UNIT_SUFS = ["UNIT 5", "APT 7B", "STE 300", "FLR 2", "REAR", "BOX 12",
             "PENT", "RM 9"]

ADDR_CHAIN = ["directions", "small_numbers", "small_ordinals",
              "hyphenate_range", "frac_to_dec", "street_types", "spacing",
              "leading_zeros"]
INST_CHAIN = ["inst_types", "remove_titles", "massachusetts", "mass_corp",
              "trailing_leading"]
ADDR2_CHAIN = ["addr2_keywords"]

# all groups NAMED: Arrow extract_regex rejects unnamed groups; DuckDB
# regexp_extract(x, pat, 1) counts named groups positionally, so group 1
# == <a> on both engines
_UNIT_TAIL = (r" (?P<a>(?P<kw>UNIT|APT|STE|SUITE|FLOOR|RM|REAR|PH|PO BOX)"
              r"(?P<num> ?[A-Z0-9]+)?)$")

# junk-to-null full-string vocabulary ≙ std_replace_blank
# (/root/reference/R/standardizers.R:342-380), minus MA-specific entries
_BLANK_RE = r"^([\_\-\;\:\, ]+|N(ONE)?|N( /)? ?A|U ?NKNOWN|N N| *|)$"


def _docs(sf_dir: str):
    from who_owns_mass_processing_ray.io_utils import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])


def _pick(did: np.ndarray, options: list[str]) -> pa.Array:
    return pa.array(options, pa.string()).take(
        pa.array(did % len(options), pa.int64()))


def _pick_sql(col: str, options: list[str]) -> str:
    lst = ", ".join(f"'{o}'" for o in options)
    return f"list_extract([{lst}], CAST({col} % {len(options)} AS INTEGER) + 1)"


def _addr_raw(t: pa.Table) -> pa.Array:
    did = t["doc_id"].to_numpy()
    num = pc.cast(pa.array(did % 1000, pa.int64()), pa.string())
    return pc.binary_join_element_wise(
        num, _pick(did, ADDR_DIRS), _pick(did, ADDR_NAMES),
        _pick(did, ADDR_SUFS), " ")


_ADDR_RAW_SQL = ("concat_ws(' ', CAST(doc_id % 1000 AS VARCHAR), "
                 + _pick_sql("doc_id", ADDR_DIRS) + ", "
                 + _pick_sql("doc_id", ADDR_NAMES) + ", "
                 + _pick_sql("doc_id", ADDR_SUFS) + ")")


def _first_upper(t: pa.Table) -> pa.Array:
    tok = pc.fill_null(pc.struct_field(
        pc.extract_regex(t["text"], r"^(?P<tok>\S+)"), "tok"), "")
    return pc.utf8_upper(tok)


_FIRST_UPPER_SQL = r"upper(regexp_extract(text, '^(\S+)', 1))"


# -- queries ----------------------------------------------------------------

def q_cascade_norm(sf_dir: str):
    """Address-style rule cascade over derived dirty strings (directions,
    small numbers/ordinals, range hyphenation, fractions, street types,
    spacing, leading zeros — 8 reference standardizers in one chain)."""
    chains = [cx.RULESETS[n] for n in ADDR_CHAIN]

    def norm(t: pa.Table) -> pa.Table:
        raw = _addr_raw(t)
        return pa.table({
            "doc_id": t["doc_id"],
            "addr_raw": raw,
            "addr_norm": cx.apply_cascade(raw, chains),
        })

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow").sort("doc_id")


def cascade_norm_sql() -> str:
    return cx.cascade_cte_sql(
        f"SELECT doc_id, {_ADDR_RAW_SQL} AS addr_raw, "
        f"{_ADDR_RAW_SQL} AS v FROM documents",
        [cx.RULESETS[n] for n in ADDR_CHAIN],
        "SELECT doc_id, addr_raw, v AS addr_norm FROM {last} ORDER BY doc_id")


def q_inst_norm(sf_dir: str):
    """Institution-name cascade (inst types, titles, Massachusetts forms,
    trailing/leading junk) over derived company-like strings."""
    chains = [cx.RULESETS[n] for n in INST_CHAIN]

    def norm(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        raw = pc.binary_join_element_wise(
            _first_upper(t), _pick(did, INST_SUFS), " ")
        return pa.table({
            "doc_id": t["doc_id"],
            "name_raw": raw,
            "name_norm": cx.apply_cascade(raw, chains),
        })

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow").sort("doc_id")


def inst_norm_sql() -> str:
    raw = ("concat_ws(' ', " + _FIRST_UPPER_SQL + ", "
           + _pick_sql("doc_id", INST_SUFS) + ")")
    return cx.cascade_cte_sql(
        f"SELECT doc_id, {raw} AS name_raw, {raw} AS v FROM documents",
        [cx.RULESETS[n] for n in INST_CHAIN],
        "SELECT doc_id, name_raw, v AS name_norm FROM {last} ORDER BY doc_id")


def q_addr2_split(sf_dir: str):
    """Peel the unit/addr2 tail off an address into its own column, then
    canonicalize addr2 keywords — the std_addr2_parser extract-remove-carry
    shape as one vectorized pass."""
    chains = [cx.RULESETS[n] for n in ADDR2_CHAIN]

    def split(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        num = pc.cast(pa.array(did % 1000, pa.int64()), pa.string())
        raw0 = pc.binary_join_element_wise(
            num, pa.array(["MAIN ST"] * len(t)), _pick(did, UNIT_SUFS), " ")
        # keyword canonicalization BEFORE the peel (FLR->FLOOR, PENT->PH)
        raw = cx.apply_cascade(raw0, chains)
        tail = pc.fill_null(pc.struct_field(
            pc.extract_regex(raw, _UNIT_TAIL), "a"), "")
        main = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(raw, pattern=_UNIT_TAIL,
                                       replacement=""))
        # ≙ std_assemble_addr (concat non-empty parts with one space,
        # /root/reference/R/standardizers.R:1474-1520)
        assembled = pc.utf8_trim_whitespace(
            pc.binary_join_element_wise(main, tail, " "))
        return pa.table({
            "doc_id": t["doc_id"],
            "addr_main": main,
            "addr2": tail,
            "addr_assembled": assembled,
        })

    return _docs(sf_dir).map_batches(split, batch_format="pyarrow").sort("doc_id")


def addr2_split_sql() -> str:
    raw0 = ("concat_ws(' ', CAST(doc_id % 1000 AS VARCHAR), 'MAIN ST', "
            + _pick_sql("doc_id", UNIT_SUFS) + ")")
    raw = cx.cascade_sql(raw0, [cx.RULESETS[n] for n in ADDR2_CHAIN])
    return f"""
        SELECT doc_id, addr_main, addr2,
               trim(concat_ws(' ', addr_main, addr2)) AS addr_assembled
        FROM (
            SELECT doc_id,
                   trim(regexp_replace({raw}, '{_UNIT_TAIL}', '', 'g'))
                       AS addr_main,
                   regexp_extract({raw}, '{_UNIT_TAIL}', 1) AS addr2
            FROM documents)
        ORDER BY doc_id
    """


def q_text_norm(sf_dir: str):
    """Generic preprocess chain on the REAL corpus text: uppercase, strip
    special characters, spacing canonicalization, trailing/leading removal,
    squish, full-string junk → NULL."""
    chains = [cx.RULESETS[n] for n in ["spacing", "trailing_leading"]]

    def norm(t: pa.Table) -> pa.Table:
        up = pc.utf8_upper(t["text"])
        de = pc.replace_substring_regex(up, pattern=r"[^A-Z0-9\s\-/&,\.]",
                                        replacement="")
        out = cx.apply_cascade(de, chains)
        junk = pc.match_substring_regex(out, _BLANK_RE)
        return pa.table({
            "doc_id": t["doc_id"],
            "text_norm": pc.if_else(junk, pa.nulls(len(t), pa.string()), out),
        })

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow").sort("doc_id")


def text_norm_sql() -> str:
    de = (r"regexp_replace(upper(text), '[^A-Z0-9\s\-/&,\.]', '', 'g')")
    expr = cx.cascade_sql(de, [cx.RULESETS[n]
                               for n in ["spacing", "trailing_leading"]])
    return f"""
        SELECT doc_id,
               CASE WHEN regexp_matches({expr}, '{_BLANK_RE}')
                    THEN NULL ELSE {expr} END AS text_norm
        FROM documents ORDER BY doc_id
    """


def q_zip_format(sf_dir: str):
    """ZIP zero-pad + validity gate: short all-digit zips left-pad to 5
    (Int-cast truncation repair), junk → NULL."""
    def norm(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        digits = pc.cast(pa.array(did % 100000, pa.int64()), pa.string())
        junk_row = pa.array((did % 10 == 0))
        raw = pc.if_else(junk_row, pa.array(["UNKNOWN"] * len(t)), digits)
        is_digits = pc.match_substring_regex(raw, r"^[0-9]{1,5}$")
        padded = pc.utf8_lpad(raw, 5, "0")
        return pa.table({
            "doc_id": t["doc_id"],
            "zip_raw": raw,
            "zip_norm": pc.if_else(is_digits, padded,
                                   pa.nulls(len(t), pa.string())),
        })

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow").sort("doc_id")


def zip_format_sql() -> str:
    raw = ("CASE WHEN doc_id % 10 = 0 THEN 'UNKNOWN' "
           "ELSE CAST(doc_id % 100000 AS VARCHAR) END")
    return f"""
        SELECT doc_id, {raw} AS zip_raw,
               CASE WHEN regexp_matches({raw}, '^[0-9]{{1,5}}$')
                    THEN lpad({raw}, 5, '0') ELSE NULL END AS zip_norm
        FROM documents ORDER BY doc_id
    """


def q_concat_ranges_fix(sf_dir: str):
    """≙ std_fix_concatenated_ranges (standardizers.R:399-415): repair
    doubled leading street numbers ("234234A TEST ST" -> "234A TEST ST")
    and hyphenate concatenated ranges.  The reference regexes use
    backreferences, which RE2 lacks — ported as a slice-compare branch
    cascade evaluated in backtracking priority order
    (functions/cascade.fix_concat_ranges; the oracle CASE chain is
    generated from the SAME branch lists)."""
    def fix(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        num = pc.cast(pa.array(100 + did % 900, pa.int64()), pa.string())
        d1 = pc.cast(pa.array(did % 10, pa.int64()), pa.string())
        branch = did % 4
        doubled = pc.binary_join_element_wise(num, num, " ELM ST", "")
        lettered = pc.binary_join_element_wise(num, "B", num, " OAK ST", "")
        ranged = pc.binary_join_element_wise(num, d1, num, d1, " PINE ST", "")
        plain = pc.binary_join_element_wise(num, " MAPLE ST", "")
        raw = pc.if_else(pa.array(branch == 0), doubled,
                         pc.if_else(pa.array(branch == 1), lettered,
                                    pc.if_else(pa.array(branch == 2), ranged,
                                               plain)))
        return pa.table({
            "doc_id": t["doc_id"],
            "addr_raw": raw,
            "addr_fixed": cx.fix_concat_ranges(raw),
        })

    return _docs(sf_dir).map_batches(fix, batch_format="pyarrow").sort("doc_id")


def concat_ranges_fix_sql() -> str:
    raw = ("CASE CAST(doc_id % 4 AS INTEGER)"
           " WHEN 0 THEN num || num || ' ELM ST'"
           " WHEN 1 THEN num || 'B' || num || ' OAK ST'"
           " WHEN 2 THEN num || d1 || num || d1 || ' PINE ST'"
           " ELSE num || ' MAPLE ST' END")
    return f"""
        SELECT doc_id, addr_raw,
               {cx.fix_concat_ranges_sql('addr_raw')} AS addr_fixed
        FROM (
            SELECT doc_id, {raw} AS addr_raw FROM (
                SELECT doc_id,
                       CAST(100 + doc_id % 900 AS VARCHAR) AS num,
                       CAST(doc_id % 10 AS VARCHAR) AS d1
                FROM documents))
        ORDER BY doc_id
    """


# -- row splitters: C/O-DBA-ATTN-FBO peel + multiname ------------------------

CO_KWS = ["C O", "ATTN", "DBA", "FBO"]
CO_LABELS = {"C O": "co", "ATTN": "attn", "DBA": "dba", "FBO": "fbo"}
_CO_SPLIT = r" (C O|ATTN|DBA|FBO) "


def q_co_split(sf_dir: str):
    """≙ proc_name_co_dba_attn (/root/reference/R/processors.R:321-355):
    peel the C/O / ATTN: / DBA / FBO tail of a name into its OWN row with a
    label; the main row keeps the head.  1->N row splitting with labels —
    one vectorized extract + one table concat per batch, no per-row
    Python."""
    def split(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        a = _first_upper(t)
        b = _pick(did, ["SMITH PROPERTIES", "JONES MGMT", "ACME REALTY",
                        "DOE HOLDINGS", "CITY BANK"])
        kw = _pick(did, CO_KWS + [""])          # every 5th row: no keyword
        has_kw = pc.not_equal(kw, pa.scalar(""))
        joined = pc.binary_join_element_wise(a, kw, b, " ")
        plain = pc.binary_join_element_wise(a, b, " ")
        raw = pc.if_else(has_kw, joined, plain)
        ext = pc.extract_regex(
            raw, r" (?P<kw>C O|ATTN|DBA|FBO) (?P<tail>.*)$")
        kw_found = pc.fill_null(pc.struct_field(ext, "kw"), "")
        tail = pc.fill_null(pc.struct_field(ext, "tail"), "")
        main = pc.replace_substring_regex(raw, pattern=_CO_SPLIT + r".*$",
                                          replacement="")
        label_map = pa.array(CO_KWS, pa.string())
        label_vals = pa.array([CO_LABELS[k] for k in CO_KWS], pa.string())
        lab = label_vals.take(pc.index_in(kw_found, value_set=label_map))
        main_rows = pa.table({
            "doc_id": t["doc_id"],
            "label": pa.array(["main"] * len(t)),
            "value": main,
        })
        keep = pc.fill_null(pc.not_equal(kw_found, pa.scalar("")), False)
        extra = pa.table({
            "doc_id": t["doc_id"],
            "label": pc.fill_null(lab, ""),
            "value": tail,
        }).filter(keep)
        return pa.concat_tables([main_rows, extra])

    return _docs(sf_dir).map_batches(split, batch_format="pyarrow") \
        .sort(["doc_id", "label"])


def co_split_sql() -> str:
    a = _FIRST_UPPER_SQL
    b = _pick_sql("doc_id", ["SMITH PROPERTIES", "JONES MGMT", "ACME REALTY",
                             "DOE HOLDINGS", "CITY BANK"])
    kw = _pick_sql("doc_id", CO_KWS + [""])
    case_label = ("CASE k WHEN 'C O' THEN 'co' WHEN 'ATTN' THEN 'attn' "
                  "WHEN 'DBA' THEN 'dba' WHEN 'FBO' THEN 'fbo' END")
    return f"""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN {kw} != ''
                        THEN concat_ws(' ', {a}, {kw}, {b})
                        ELSE concat_ws(' ', {a}, {b}) END AS name
            FROM documents),
        parts AS (
            SELECT doc_id,
                   regexp_replace(name, '{_CO_SPLIT}.*$', '') AS main,
                   regexp_extract(name, ' (C O|ATTN|DBA|FBO) (.*)$', 1) AS k,
                   regexp_extract(name, ' (C O|ATTN|DBA|FBO) (.*)$', 2) AS tail
            FROM raw)
        SELECT doc_id, 'main' AS label, main AS value FROM parts
        UNION ALL
        SELECT doc_id, {case_label} AS label, tail AS value
        FROM parts WHERE k != ''
        ORDER BY doc_id, label
    """


def q_multiname_split(sf_dir: str):
    """≙ std_multiname (/root/reference/R/standardizers.R:2103-2147): split
    "SURNAME FIRST I AND SECOND" on AND, inherit the surname onto the bare
    second name, drop middle initials — emitted as one row per person."""
    def split(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        sur = _pick(did, ["SMITH", "JONES", "GARCIA", "CHEN", "OBRIEN",
                          "MILLER", "DAVIS"])
        f1 = _pick(did, ["JOHN", "MARY", "JAMES", "LINDA", "ROBERT"])
        ini = _pick(did, ["A", "B", "R"])
        f2 = _pick(did, ["JANE", "PAUL", "ANNA", "MARK", "LUCY", "KARL"])
        has_and = did % 4 != 3
        full = pc.binary_join_element_wise(sur, f1, ini, "AND", f2, " ")
        single = pc.binary_join_element_wise(sur, f1, ini, " ")
        raw = pc.if_else(pa.array(has_and), full, single)
        # part 1 = text before AND (or whole), surname extracted from the
        # "SURNAME FIRST I" shape, middle initial removed (lone letters)
        p1 = pc.replace_substring_regex(raw, pattern=r" AND .*$",
                                        replacement="")
        last = pc.fill_null(pc.struct_field(pc.extract_regex(
            p1, r"^(?P<s>[A-Z]{2,}) [A-Z]{2,20} [A-Z]$"), "s"), "")
        p1c = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            p1, pattern=r" [A-Z]$", replacement=""))
        ext2 = pc.extract_regex(raw, r" AND (?P<p2>.*)$")
        p2 = pc.fill_null(pc.struct_field(ext2, "p2"), "")
        # bare single-word second names inherit the surname
        bare = pc.match_substring_regex(p2, r"^[A-Z]+$")
        p2f = pc.if_else(
            pc.and_(bare, pc.not_equal(last, pa.scalar(""))),
            pc.utf8_trim_whitespace(
                pc.binary_join_element_wise(p2, last, " ")),
            p2)
        rows1 = pa.table({"doc_id": t["doc_id"],
                          "member": pa.array([1] * len(t), pa.int32()),
                          "name": p1c})
        keep = pc.fill_null(pc.not_equal(p2, pa.scalar("")), False)
        rows2 = pa.table({"doc_id": t["doc_id"],
                          "member": pa.array([2] * len(t), pa.int32()),
                          "name": p2f}).filter(keep)
        return pa.concat_tables([rows1, rows2])

    return _docs(sf_dir).map_batches(split, batch_format="pyarrow") \
        .sort(["doc_id", "member"])


def multiname_split_sql() -> str:
    sur = _pick_sql("doc_id", ["SMITH", "JONES", "GARCIA", "CHEN", "OBRIEN",
                               "MILLER", "DAVIS"])
    f1 = _pick_sql("doc_id", ["JOHN", "MARY", "JAMES", "LINDA", "ROBERT"])
    ini = _pick_sql("doc_id", ["A", "B", "R"])
    f2 = _pick_sql("doc_id", ["JANE", "PAUL", "ANNA", "MARK", "LUCY",
                              "KARL"])
    return f"""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 != 3
                        THEN concat_ws(' ', {sur}, {f1}, {ini}, 'AND', {f2})
                        ELSE concat_ws(' ', {sur}, {f1}, {ini}) END AS name
            FROM documents),
        parts AS (
            SELECT doc_id,
                   regexp_replace(name, ' AND .*$', '') AS p1,
                   regexp_extract(name, ' AND (.*)$', 1) AS p2
            FROM raw),
        der AS (
            SELECT doc_id,
                   trim(regexp_replace(p1, ' [A-Z]$', '')) AS p1c,
                   regexp_extract(p1, '^([A-Z]{{2,}}) [A-Z]{{2,20}} [A-Z]$',
                                  1) AS last,
                   p2
            FROM parts)
        SELECT doc_id, 1 AS member, p1c AS name FROM der
        UNION ALL
        SELECT doc_id, 2 AS member,
               CASE WHEN regexp_matches(p2, '^[A-Z]+$') AND last != ''
                    THEN trim(concat_ws(' ', p2, last)) ELSE p2 END AS name
        FROM der WHERE p2 != ''
        ORDER BY doc_id, member
    """


MASS_MUNI_DIRTY = ["FOXBORO", "ACT", "GLOUSTER", "NEW TOWN", "KAMBRIDGE",
                   "NEWBURY PORT", "ROCKY HLDS", "DEVEN", "PRIDE CROSSING",
                   "MANCHESTER", "MANC BY THE SEA", "BOSTON"]
NYC_MUNI_DIRTY = ["QUEENS", "BKLN", "STATEN ISL", "NEW YORK", "HARLEM",
                  "MANHATTAN", "THE BRONX", "LA", "CHICAGO"]


def q_muni_norm(sf_dir: str):
    """≙ std_muni_names (/root/reference/R/standardizers.R:663-715), both
    branches: the Massachusetts misspelling cascade (mass=TRUE, a rule set
    every entry of which fires on the derived vocab) and the NYC/LA
    detect-to-constant mapping (mass=FALSE)."""
    chains = [cx.RULESETS["muni_names"]]

    def norm(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        mass_raw = _pick(did, MASS_MUNI_DIRTY)
        nyc_raw = _pick(did, NYC_MUNI_DIRTY)
        is_nyc = pc.match_substring_regex(nyc_raw, cx.NYC_MUNI_RE)
        nyc_out = pc.if_else(
            is_nyc, pa.array(["NEW YORK CITY"] * len(t)),
            pc.if_else(pc.equal(nyc_raw, pa.scalar("LA")),
                       pa.array(["LOS ANGELES"] * len(t)), nyc_raw))
        return pa.table({
            "doc_id": t["doc_id"],
            "muni_raw": mass_raw,
            "muni_mass": cx.apply_cascade(mass_raw, chains),
            "nyc_raw": nyc_raw,
            "muni_nyc": nyc_out,
        })

    return _docs(sf_dir).map_batches(norm, batch_format="pyarrow").sort("doc_id")


def muni_norm_sql() -> str:
    mass_raw = _pick_sql("doc_id", MASS_MUNI_DIRTY)
    nyc_raw = _pick_sql("doc_id", NYC_MUNI_DIRTY)
    mass_norm = cx.cascade_sql("muni_raw", [cx.RULESETS["muni_names"]])
    return f"""
        WITH raw AS (
            SELECT doc_id, {mass_raw} AS muni_raw, {nyc_raw} AS nyc_raw
            FROM documents)
        SELECT doc_id, muni_raw, {mass_norm} AS muni_mass, nyc_raw,
               CASE WHEN regexp_matches(nyc_raw, '{cx.NYC_MUNI_RE}')
                    THEN 'NEW YORK CITY'
                    WHEN nyc_raw = 'LA' THEN 'LOS ANGELES'
                    ELSE nyc_raw END AS muni_nyc
        FROM raw ORDER BY doc_id
    """


# dirty PO-box / PMB strings: every reference rule + extraction fires on at
# least one entry, plus negatives ("P0 BOX..." has a zero, stays unparsed)
PO_PMB_DIRTY = ["P O B0X-12", "123 MAIN ST,PO BOX 678", "BOX 45 ELM",
                "UNIT 9 PMB 77-A", "P O BOX-7", "12 ELM ST",
                "PO BOX 9-B 55", "BX -3 OAK", "P0 BOX A12 34"]

# lookbehind-free re-expressions of the reference's extraction regexes
# (standardizers.R:1350-1351) — Arrow extract_regex requires every group
# named; DuckDB counts named groups positionally, so group 1 == <v>
_PO_EXTRACT = r"PO BOX ?(?P<v>[A-Z0-9\-]+(?P<t> [0-9]+)?)"
_PMB_EXTRACT = r" PMB ?(?P<v>[A-Z0-9\-]+(?P<t> [0-9]+)?)"
_PO_PMB_REMOVE = r",?(PO BOX|PMB) ?[A-Z0-9\-]+( [0-9]+)?"


def q_po_pmb_split(sf_dir: str):
    """≙ std_addr2_po_pmb (/root/reference/R/standardizers.R:1323-1362):
    canonicalize PO-box misspellings, EXTRACT the po / pmb identifiers into
    their own columns, remove them from the address, junk -> NULL, squish."""
    chains = [cx.RULESETS["po_pmb"]]

    def split(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        raw = _pick(did, PO_PMB_DIRTY)
        norm = cx.apply_cascade(raw, chains)
        po = pc.struct_field(pc.extract_regex(norm, _PO_EXTRACT), "v")
        pmb = pc.struct_field(pc.extract_regex(norm, _PMB_EXTRACT), "v")
        rem = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.replace_substring_regex(norm, pattern=_PO_PMB_REMOVE,
                                       replacement=""),
            pattern=r"\s+", replacement=" "))
        junk = pc.match_substring_regex(rem, _BLANK_RE)
        return pa.table({
            "doc_id": t["doc_id"],
            "addr_raw": raw,
            "addr_main": pc.if_else(junk, pa.nulls(len(t), pa.string()), rem),
            "po": po,
            "pmb": pmb,
        })

    return _docs(sf_dir).map_batches(split, batch_format="pyarrow").sort("doc_id")


def po_pmb_split_sql() -> str:
    raw = _pick_sql("doc_id", PO_PMB_DIRTY)
    norm = cx.cascade_sql("addr_raw", [cx.RULESETS["po_pmb"]])
    rem = (f"trim(regexp_replace(regexp_replace({norm}, "
           f"'{_PO_PMB_REMOVE}', '', 'g'), '\\s+', ' ', 'g'))")
    return f"""
        WITH raw AS (SELECT doc_id, {raw} AS addr_raw FROM documents)
        SELECT doc_id, addr_raw,
               CASE WHEN regexp_matches({rem}, '{_BLANK_RE}')
                    THEN NULL ELSE {rem} END AS addr_main,
               nullif(regexp_extract({norm}, '{_PO_EXTRACT}', 1), '') AS po,
               nullif(regexp_extract({norm}, '{_PMB_EXTRACT}', 1), '') AS pmb
        FROM raw ORDER BY doc_id
    """


def q_select_address(sf_dir: str):
    """≙ std_select_address (/root/reference/R/standardizers.R:1724-1766):
    pick the best of several candidate address columns — prefer the first
    candidate that looks like a street address (leading number + words),
    else the first non-junk candidate, else NULL.  Pure vectorized CASE."""
    looks = r"^[0-9]+ [A-Z]"

    def sel(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        # candidate 1 is junk for every 3rd row; candidate 2 for every 4th
        a1_good = pc.binary_join_element_wise(
            pc.cast(pa.array(did % 500, pa.int64()), pa.string()),
            _pick(did, ["MAIN ST", "OAK AVE", "ELM RD"]), " ")
        a1 = pc.if_else(pa.array(did % 3 == 0),
                        _pick(did, ["N/A", "UNKNOWN", ""]), a1_good)
        a2_good = pc.binary_join_element_wise(
            pc.cast(pa.array(did % 700, pa.int64()), pa.string()),
            _pick(did, ["PINE LN", "BIRCH DR"]), " ")
        a2 = pc.if_else(pa.array(did % 4 == 0),
                        pa.array([""] * len(t)), a2_good)
        ok1 = pc.match_substring_regex(a1, looks)
        ok2 = pc.match_substring_regex(a2, looks)
        sel_v = pc.if_else(ok1, a1, pc.if_else(ok2, a2,
                                               pa.nulls(len(t), pa.string())))
        return pa.table({"doc_id": t["doc_id"], "addr1": a1, "addr2": a2,
                         "addr_selected": sel_v})

    return _docs(sf_dir).map_batches(sel, batch_format="pyarrow").sort("doc_id")


def select_address_sql() -> str:
    a1g = ("concat_ws(' ', CAST(doc_id % 500 AS VARCHAR), "
           + _pick_sql("doc_id", ["MAIN ST", "OAK AVE", "ELM RD"]) + ")")
    a1 = (f"CASE WHEN doc_id % 3 = 0 THEN "
          + _pick_sql("doc_id", ["N/A", "UNKNOWN", ""]) + f" ELSE {a1g} END")
    a2g = ("concat_ws(' ', CAST(doc_id % 700 AS VARCHAR), "
           + _pick_sql("doc_id", ["PINE LN", "BIRCH DR"]) + ")")
    a2 = f"CASE WHEN doc_id % 4 = 0 THEN '' ELSE {a2g} END"
    return f"""
        WITH c AS (SELECT doc_id, {a1} AS addr1, {a2} AS addr2
                   FROM documents)
        SELECT doc_id, addr1, addr2,
               CASE WHEN regexp_matches(addr1, '^[0-9]+ [A-Z]') THEN addr1
                    WHEN regexp_matches(addr2, '^[0-9]+ [A-Z]') THEN addr2
                    ELSE NULL END AS addr_selected
        FROM c ORDER BY doc_id
    """


def q_address_preprocess(sf_dir: str):
    """≙ load_boston/nonboston_address_preprocess — the full composed
    address pipeline (/root/reference/R/loaders.R:836-962): dirty address ->
    8-set normalizer cascade -> addr2 peel + keyword canonicalization ->
    zip pad -> assembled canonical address.  One query demonstrating the
    composition surface: every stage is the same rule/kernel object the
    standalone queries run, chained."""
    addr_chains = [cx.RULESETS[n] for n in ADDR_CHAIN]
    a2_chains = [cx.RULESETS[n] for n in ADDR2_CHAIN]

    def prep(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        raw = pc.binary_join_element_wise(
            _addr_raw(t), _pick(did, UNIT_SUFS), " ")
        norm = cx.apply_cascade(raw, addr_chains)
        norm = cx.apply_cascade(norm, a2_chains)
        tail = pc.fill_null(pc.struct_field(
            pc.extract_regex(norm, _UNIT_TAIL), "a"), "")
        main = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(norm, pattern=_UNIT_TAIL,
                                       replacement=""))
        zip5 = pc.utf8_lpad(pc.cast(
            pa.array(did % 100000, pa.int64()), pa.string()), 5, "0")
        assembled = pc.utf8_trim_whitespace(pc.binary_join_element_wise(
            main, tail, zip5, " "))
        return pa.table({
            "doc_id": t["doc_id"],
            "addr_raw": raw,
            "addr_main": main,
            "addr2": tail,
            "zip": zip5,
            "addr_assembled": assembled,
        })

    return _docs(sf_dir).map_batches(prep, batch_format="pyarrow").sort("doc_id")


def address_preprocess_sql() -> str:
    raw = ("concat_ws(' ', " + _ADDR_RAW_SQL + ", "
           + _pick_sql("doc_id", UNIT_SUFS) + ")")
    final = """
        SELECT doc_id, addr_raw,
               trim(regexp_replace(v, '{tail}', '', 'g')) AS addr_main,
               regexp_extract(v, '{tail}', 1) AS addr2,
               lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') AS zip,
               trim(concat_ws(' ',
                    trim(regexp_replace(v, '{tail}', '', 'g')),
                    regexp_extract(v, '{tail}', 1),
                    lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')))
                   AS addr_assembled
        FROM {last} ORDER BY doc_id
    """.replace("{tail}", _UNIT_TAIL)
    return cx.cascade_cte_sql(
        f"SELECT doc_id, {raw} AS addr_raw, {raw} AS v FROM documents",
        [cx.RULESETS[n] for n in ADDR_CHAIN + ADDR2_CHAIN],
        final)


# ---------------------------------------------------------------------------
# House-number range parsing ≙ proc_address_to_range
# (/root/reference/R/processors.R:44-112): split a street address into the
# leading house-number token (single, hyphen/space range, decimal, or
# letter-suffixed), the street body, numeric start/end (end falls back to
# start when the trailing number does not exceed it), and the street-side
# parity flag the reference's address-range interval matcher keys on
# (proc_assess_address_to_range, R/processors.R:832-870).
#
# The reference's lookahead `(?= ([0-9]{1,3}(ST|ND|RD|TH)|[A-Z]))` (the next
# token must be a word or ordinal, so the house number never swallows a
# numeric street name) is RE2-unrepresentable; rewritten as a consuming
# non-capturing group with only the number group captured — identical
# matches, usable by both Arrow and DuckDB.
# ---------------------------------------------------------------------------

_RANGE_NUM_RE = (r"^(?P<num>[0-9.]+[A-Z]{0,2}(?:[ \-][0-9.]+[A-Z]?)*)"
                 r" (?:[0-9]{1,3}(?:ST|ND|RD|TH)|[A-Z])")
_RANGE_NUM_RE_SQL = (r"^([0-9.]+[A-Z]{0,2}(?:[ -][0-9.]+[A-Z]?)*)"
                     r" (?:[0-9]{1,3}(?:ST|ND|RD|TH)|[A-Z])")
# second group captured so replacement can keep the consumed next token
_RANGE_BODY_RE = (r"^(?P<num>[0-9.]+[A-Z]{0,2}(?:[ \-][0-9.]+[A-Z]?)*)"
                  r" (?P<nxt>[0-9]{1,3}(?:ST|ND|RD|TH)|[A-Z])")


def _range_addr(t: pa.Table) -> pa.Array:
    """Deterministic range-shaped addresses: single / range / decimal /
    letter-suffixed / no-number / descending-range variants by doc_id % 6."""
    did = t["doc_id"].to_numpy()
    n1 = (did % 90 + 1).astype(np.int64)
    n2 = n1 + 4
    a1 = n1.astype(str).astype(object)
    a2 = n2.astype(str).astype(object)
    pat = did % 6
    num_tok = np.select(
        [pat == 0, pat == 1, pat == 2, pat == 3, pat == 4],
        [a1, a1 + "-" + a2, a1 + ".5", a1 + "A",
         np.full(len(did), "", object)],
        default=a2 + "-" + a1)
    street = np.select(
        [pat == 3, pat == 4],
        [np.full(len(did), "5TH ST", object),
         np.full(len(did), "WASHINGTON AVE", object)],
        default=np.char.add(
            np.char.add(np.array([ADDR_NAMES[i] for i in did % len(ADDR_NAMES)]),
                        " "),
            np.array([ADDR_SUFS[i] for i in did % len(ADDR_SUFS)])).astype(object))
    addr = np.where(num_tok == "", street, num_tok + " " + street)
    return pa.array(addr.astype(str), pa.string())


_RANGE_ADDR_SQL = f"""trim(concat(
    CASE CAST(doc_id % 6 AS INTEGER)
      WHEN 0 THEN CAST(doc_id % 90 + 1 AS VARCHAR)
      WHEN 1 THEN CAST(doc_id % 90 + 1 AS VARCHAR) || '-' ||
                  CAST(doc_id % 90 + 5 AS VARCHAR)
      WHEN 2 THEN CAST(doc_id % 90 + 1 AS VARCHAR) || '.5'
      WHEN 3 THEN CAST(doc_id % 90 + 1 AS VARCHAR) || 'A'
      WHEN 4 THEN ''
      ELSE CAST(doc_id % 90 + 5 AS VARCHAR) || '-' ||
           CAST(doc_id % 90 + 1 AS VARCHAR)
    END, ' ',
    CASE CAST(doc_id % 6 AS INTEGER)
      WHEN 3 THEN '5TH ST'
      WHEN 4 THEN 'WASHINGTON AVE'
      ELSE {_pick_sql("doc_id", ADDR_NAMES)} || ' ' ||
           {_pick_sql("doc_id", ADDR_SUFS)}
    END))"""


def q_addr_to_range(sf_dir: str):
    """addr -> (addr_body, addr_start, addr_end, addr_even) — the
    proc_address_to_range parse, all Arrow kernels."""
    def parse(t: pa.Table) -> pa.Table:
        addr = _range_addr(t)
        num = pc.struct_field(pc.extract_regex(addr, _RANGE_NUM_RE), "num")
        valid = pc.is_valid(num)
        nulls = pa.nulls(len(t), pa.string())
        # body: strip "num " off the front (replacement keeps the consumed
        # next token via \2), then trim; NULL when no number parsed
        body = pc.if_else(
            valid,
            pc.utf8_trim_whitespace(pc.replace_substring_regex(
                addr, pattern=_RANGE_BODY_RE, replacement=r"\2",
                max_replacements=1)),
            nulls)
        start = pc.cast(pc.struct_field(
            pc.extract_regex(num, r"^(?P<a>[0-9.]+)"), "a"), pa.float64())
        end_init = pc.cast(pc.struct_field(
            pc.extract_regex(num, r"(?P<a>[0-9.]+)[A-Z]?$"), "a"),
            pa.float64())
        cond = pc.or_kleene(pc.greater(end_init, start), pc.is_null(end_init))
        end = pc.if_else(pc.fill_null(cond, False), end_init, start)
        sv = start.to_numpy(zero_copy_only=False).astype(np.float64)
        even = np.where(np.isnan(sv), False, np.floor(sv) % 2 == 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "addr": addr,
            "addr_body": body,
            "addr_start": start,
            "addr_end": end,
            "addr_even": pa.array(even, pa.bool_()),
        })

    return _docs(sf_dir).map_batches(parse, batch_format="pyarrow") \
        .sort("doc_id")


def addr_to_range_sql() -> str:
    return f"""
        WITH a AS (SELECT doc_id, {_RANGE_ADDR_SQL} AS addr FROM documents),
        e AS (SELECT doc_id, addr,
                     regexp_extract(addr, '{_RANGE_NUM_RE_SQL}', 1) AS num
              FROM a),
        p AS (SELECT doc_id, addr,
                     CASE WHEN num <> '' THEN num END AS num FROM e),
        n AS (SELECT doc_id, addr, num,
                     CASE WHEN num IS NOT NULL
                          THEN trim(substr(addr, length(num) + 1)) END
                         AS addr_body,
                     CAST(regexp_extract(num, '^([0-9.]+)', 1) AS DOUBLE)
                         AS addr_start,
                     CAST(regexp_extract(num, '([0-9.]+)[A-Z]?$', 1)
                          AS DOUBLE) AS end_init
              FROM p)
        SELECT doc_id, addr, addr_body, addr_start,
               CASE WHEN end_init > addr_start OR end_init IS NULL
                    THEN end_init ELSE addr_start END AS addr_end,
               CASE WHEN addr_start IS NULL THEN FALSE
                    WHEN CAST(floor(addr_start) AS BIGINT) % 2 = 0 THEN TRUE
                    ELSE FALSE END AS addr_even
        FROM n ORDER BY doc_id
    """
