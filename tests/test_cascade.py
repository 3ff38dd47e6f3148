"""Rule-cascade normalizer: the ported rule sets must actually FIRE with
the reference semantics (not just match the oracle structurally)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from who_owns_mass_processing_ray.functions import cascade as cx


def run(text: str, sets: list[str]) -> str:
    out = cx.apply_cascade(pa.array([text]),
                           [cx.RULESETS[n] for n in sets])
    return out[0].as_py()


@pytest.mark.parametrize("raw,want", [
    ("12 N MAIN ST", "12 NORTH MAIN STREET"),
    ("SO SHORE AVE", "SOUTH SHORE AVENUE"),
    ("5 SW ELM DRV", "5 SOUTHWEST ELM DRIVE"),
    ("3 GT HILL BLVD", "3 GREAT HILL BOULEVARD"),
    ("9 MT VERNON TERR", "9 MOUNT VERNON TERRACE"),
    ("HARBOR PT CG", "HARBOR POINT CROSSING"),
])
def test_directions_and_street_types(raw, want):
    assert run(raw, ["directions", "street_types"]) == want


@pytest.mark.parametrize("raw,want", [
    ("1 ST AVE", "1ST AVENUE"),          # ordinal space fix, not SAINT
    ("4 ST JAMES AVE", "4 SAINT JAMES AVENUE"),
    ("ST MARY RD", "SAINT MARY ROAD"),
    ("P O BX 12", "PO BOX 12"),
    ("BX 34 MAIN ST", "PO BOX 34 MAIN STREET"),
])
def test_saint_vs_ordinal_and_po_box(raw, want):
    assert run(raw, ["street_types"]) == want


@pytest.mark.parametrize("raw,want", [
    ("ONE BEACON WAY", "1 BEACON WAY"),
    ("TEN POST OFFICE SQ", "10 POST OFFICE SQ"),
    ("AREA X LOT", "AREA 10 LOT"),        # roman numeral
    ("FIRST STREET", "1ST STREET"),
    ("TWENTIETH AVE", "20TH AVE"),
])
def test_small_numbers_and_ordinals(raw, want):
    assert run(raw, ["small_numbers", "small_ordinals"]) == want


@pytest.mark.parametrize("raw,want", [
    ("ACME CORP", "ACME CORPORATION"),
    ("ACME RLTY TR", "ACME REALTY TRUST"),
    ("ACME PROPS LLC", "ACME PROPERTIES LLC"),
    ("ACME MGMT CO", "ACME MANAGEMENT COMPANY"),
    ("ACME INV PRTNRS", "ACME INVESTMENT PARTNERS"),
    ("SMITH FAM IRREV TR", "SMITH FAMILY IRREVOCABLE TRUST"),
    ("FOOLLC", "FOO LLC"),
])
def test_inst_types(raw, want):
    assert run(raw, ["inst_types"]) == want


def test_trailing_leading_and_zeros():
    # one alternation pass strips BOTH the leading THE and the trailing AND
    # (reference std_trailing_leading does the same via str_replace_all)
    assert run("THE ACME GROUP AND ", ["trailing_leading"]) == "ACME GROUP"
    assert run("AND ACME OF ", ["trailing_leading"]) == "ACME"
    assert run("0042 MAIN", ["leading_zeros"]) == "42 MAIN"
    assert run("- 42 MAIN", ["leading_zeros"]) == "42 MAIN"


def test_spacing_fracs_ranges():
    assert run("A / B & C", ["spacing"]) == "A/B AND C"
    assert run("12 1/2 ELM ST", ["frac_to_dec"]) == "12.5 ELM ST"
    assert run("12 14 ELM ST", ["hyphenate_range"]) == "12-14 ELM ST"
    assert run("12A14 ELM ST", ["hyphenate_range"]) == "12A-14 ELM ST"


def test_titles_estate_initials_mass():
    assert run("JOHN SMITH JR ESQ", ["remove_titles"]) == "JOHN SMITH"
    assert run("ESTATE OF JOHN SMITH", ["remove_estate"]) == "JOHN SMITH"
    assert run("ERIC R HUNTLEY", ["middle_initial"]) == "ERIC HUNTLEY"
    assert run("BOSTON MASS", ["massachusetts"]) == "BOSTON MASSACHUSETTS"
    assert run("ACME LLC A MASS LLC", ["mass_corp"]) == "ACME LLC"


def test_sql_generator_mirrors_arrow():
    """The generated DuckDB chain must produce byte-identical output to the
    Arrow chain on tricky strings (same RE2, same order, same squish)."""
    import duckdb

    sets = ["directions", "small_numbers", "small_ordinals",
            "hyphenate_range", "frac_to_dec", "street_types", "spacing",
            "leading_zeros"]
    samples = ["  1 ST  AVE ", "ONE BEACON ST EXT", "0012 N ELM CRT",
               "TEN P O BX 9", "SO FIRST ST / REAR & X", "12 14 GT OAK TRL"]
    rule_sets = [cx.RULESETS[n] for n in sets]
    got = [v.as_py() for v in cx.apply_cascade(pa.array(samples), rule_sets)]
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{s}')" for i, s in enumerate(samples))
            + ") AS v(i, v)")
    sql = cx.cascade_cte_sql("SELECT i, v FROM t", rule_sets,
                             "SELECT v FROM {last} ORDER BY i")
    want = [r[0] for r in con.sql(sql).fetchall()]
    assert got == want


def test_muni_names_every_rule_fires():
    """≙ std_muni_names(mass=TRUE) — each reference correction rewrites its
    misspelling, including the faithful space-dropping HLDS rule."""
    cases = {
        "FOXBORO": "FOXBOROUGH",
        "ACT": "ACTON",
        "GLOUSTER": "GLOUCESTER",
        "NEW TOWN": "NEWTON",
        "KAMBRIDGE": "CAMBRIDGE",
        "NEWBURY PORT": "NEWBURYPORT",
        "ROCKY HLDS": "ROCKYHIGHLANDS",
        "DEVEN": "DEVENS",
        "PRIDE CROSSING": "PRIDES CROSSING",
        "MANCHESTER": "MANCHESTER-BY-THE-SEA",
        "MANC BY THE SEA": "MANCHESTER-BY-THE-SEA",
        "BOSTON": "BOSTON",
    }
    got = cx.apply_cascade(pa.array(list(cases)), [cx.RULESETS["muni_names"]])
    assert [v.as_py() for v in got] == list(cases.values())


def test_nyc_muni_detection():
    import re

    hits = ["QUEENS", "BKLN", "BROOKLYN X", "STATEN ISLAND", "NEW YORK",
            "HARLEM", "MANHATTAN", "THE BRONX", "BRONX"]
    misses = ["NEW YORK CITY X", "LA", "CHICAGO", "EAST QUEENS"]
    for s in hits:
        assert re.search(cx.NYC_MUNI_RE, s), s
    for s in misses:
        assert not re.search(cx.NYC_MUNI_RE, s), s
