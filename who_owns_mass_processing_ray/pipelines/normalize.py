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
