"""Vocab-driven regex rule-cascade normalizer — the engine expression of the
reference's standardizer family (its single biggest code mass).

A *rule set* is an ordered list of (RE2 pattern, replacement) pairs applied
sequentially, with a whitespace squish after each set (mirroring the
reference's ``std_replace_generic``, which str_squishes after every
replacement call — /root/reference/R/standardizers.R:75-104).

Rule sets ported (cited by reference file:line; patterns are RE2-SAFE
re-expressions — the reference's ICU lookarounds become capture groups /
``\\b`` boundaries, since both Arrow and DuckDB compile RE2, which has no
lookaround; tests/test_cascade.py verifies rules fire as intended and the
driver verifies engine == DuckDB on the same chains):

- DIRECTIONS        ≙ std_directions          (standardizers.R:443-474)
- STREET_TYPES      ≙ std_street_types        (standardizers.R:476-538)
  (MA proper-name fixups LYDON/OBRIEN/MCCLELLAN/PRUDENTIAL are omitted —
  domain noise, not normalizer machinery)
- SMALL_NUMBERS     ≙ std_small_numbers       (standardizers.R:541-576;
  the reference's apparent ``^ONE`` typo in the "2" rule is mirrored
  faithfully — it is dead after the "1" rule, on both engines)
- SMALL_ORDINALS    ≙ std_small_ordinals      (standardizers.R:578-607;
  reference spellings TWELTH/NINTEENTH kept as-is)
- INST_TYPES        ≙ std_inst_types          (standardizers.R:802-873)
- TRAILING_LEADING  ≙ std_trailing_leading    (standardizers.R:289-314)
- LEADING_ZEROS     ≙ std_leading_zeros       (standardizers.R:316-340)
- SPACING           ≙ std_spacing_characters  (standardizers.R:417-441)
- FRAC_TO_DEC       ≙ std_frac_to_dec         (standardizers.R:1459-1471)
- HYPHENATE_RANGE   ≙ std_hyphenate_range     (standardizers.R:1436-1457)
- REMOVE_TITLES     ≙ std_remove_titles + SEARCH$titles
                                              (standardizers.R:875-888, 47-53)
- REMOVE_ESTATE     ≙ std_remove_estate + SEARCH$estate
                                              (standardizers.R:1768-1786, 2-4)
- MIDDLE_INITIAL    ≙ std_remove_middle_initial (standardizers.R:2199-2218)
- MASSACHUSETTS     ≙ std_massachusetts       (standardizers.R:771-791)
- MASS_CORP         ≙ std_mass_corp           (standardizers.R:793-800)
- ADDR2_KEYWORDS    ≙ std_addr2_remove_keywords canonicalization tail
                                              (standardizers.R:1389-1419)
- MUNI_NAMES        ≙ std_muni_names(mass=TRUE) (standardizers.R:663-690);
  the NYC branch (mass=FALSE, :691-714) is the NYC_MUNI_RE detection
  constant + a case mapping in pipelines/normalize.q_muni_norm

``apply_cascade`` runs a chain on an Arrow column (vectorized RE2 kernels,
no Python per row); ``cascade_sql`` emits the EXACT same chain as a nested
DuckDB ``regexp_replace(..., 'g')`` expression from the same rule objects —
one source of truth, so the driver's oracle compare is structural, not
hand-kept-in-sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class RuleSet:
    name: str
    rules: tuple[tuple[str, str], ...]
    squish: bool = True   # collapse \s+ to ' ' and trim after the set


DIRECTIONS = RuleSet("directions", (
    (r"\bN\b", "NORTH"),
    (r"^NO( )", r"NORTH\1"),
    (r"( )NO( [A-Z]{3})", r"\1NORTH\2"),
    (r"\bNW\b", "NORTHWEST"),
    (r"\bNE\b", "NORTHEAST"),
    (r"^SO( )", r"SOUTH\1"),
    (r"\bS\b", "SOUTH"),
    (r"\bSW\b", "SOUTHWEST"),
    (r"\bSE\b", "SOUTHEAST"),
    (r"\bE\b", "EAST"),
    (r"\bW\b", "WEST"),
    (r"\bGT\b", "GREAT"),
    (r"\bMT\b", "MOUNT"),
    (r"\b(CENTRE|CTR)\b", "CENTER"),
    (r"\b(CR?G)$", "CROSSING"),
    (r"\bSQ$", "SQUARE"),
    (r"\bVLLY\b", "VALLEY"),
))

STREET_TYPES = RuleSet("street_types", (
    (r"([02-9] )ST( [A-Z]{3})", r"\1SAINT\2"),
    (r"^ST( [A-Z]{3})", r"SAINT\1"),
    (r"\b(1) (ST)\b", r"\1\2"),
    (r"\b(2) (ND)\b", r"\1\2"),
    (r"\b(3) (RD)\b", r"\1\2"),
    (r"\b([1-9]?[04-9]) (TH)\b", r"\1\2"),
    (r"\b(ST|ST[RET]{3,5}|STREE)\b", "STREET"),
    (r"\bAVE?\b", "AVENUE"),
    (r"\bLA?N\b", "LANE"),
    (r"\bBLV?R?D?\b", "BOULEVARD"),
    (r"\bP(A?R?KWA?)?Y\b", "PARKWAY"),
    (r"\bPW\b", "PARKWAY"),
    (r"\bEXT\b", "EXTENSION"),
    (r"\bPR?K\b", "PARK"),
    (r"\bDRV?\b", "DRIVE"),
    (r"\bPT\b", "POINT"),
    (r"\bCV\b", "COVE"),
    (r"\bRDG\b", "RIDGE"),
    (r"\bTRL?\b", "TRAIL"),
    (r"\bRD\b", "ROAD"),
    (r"\bRO\b", "ROW"),
    (r"\bT[ER]+R+(CE)?\b", "TERRACE"),
    (r"\bTE\b", "TERRACE"),
    (r"\bPLC?E?\b", "PLACE"),
    (r"\bWY\b", "WAY"),
    (r"\b(CI?RC?|CI)\b", "CIRCLE"),
    (r"\bA[L]+E?Y\b", "ALLEY"),
    (r"\bSQR?\b", "SQUARE"),
    (r"\bHG?WY?\b", "HIGHWAY"),
    (r"\bCNTR\b", "CENTER"),
    (r"\bFR?WY\b", "FREEWAY"),
    (r"\bMSGR\b", "MONSIGNOR"),
    (r"\bCR?T\b", "COURT"),
    (r"\bPL?Z\b", "PLAZA"),
    (r"\bW[HR]+F\b", "WHARF"),
    (r"\bDEPT\b", "DEPARTMENT"),
    (r"\bP ?O SQUARE\b", "POST OFFICE SQUARE"),
    (r"\bP ?O( ?BO?X)?[ \-]*([A-Z]?[0-9])", r"PO BOX \2"),
    (r"\b(PO BOX|BO?X)[ \-]+([A-Z]?[0-9])", r"PO BOX \2"),
))

SMALL_NUMBERS = RuleSet("small_numbers", (
    (r"^ZERO( )", r"0\1"),
    (r"^ONE( )", r"1\1"), (r"\bI\b", "1"),
    (r"\bII\b", "2"),
    (r"^THREE( )", r"3\1"), (r"\bIII\b", "3"),
    (r"^FOUR( )", r"4\1"), (r"\bIV\b", "4"),
    (r"^FIVE( )", r"5\1"), (r"\bV\b", "5"),
    (r"^SIX( )", r"6\1"), (r"\bVI\b", "6"),
    (r"^SEVEN( )", r"7\1"), (r"\bVII\b", "7"),
    (r"^EIGHT( )", r"8\1"), (r"\bVIII\b", "8"),
    (r"^NINE( )", r"9\1"), (r"\bIX\b", "9"),
    (r"^TEN( )", r"10\1"), (r"\bX\b", "10"),
    (r"^TWENTY( )", r"20\1"), (r"\bXX\b", "20"),
    (r"^([1-9]) ([0-9]{2,4}[\- ])", r"\1\2"),
))

SMALL_ORDINALS = RuleSet("small_ordinals", tuple(
    (rf"\b{w}\b", r)
    for w, r in [
        ("FIRST", "1ST"), ("SECOND", "2ND"), ("THIRD", "3RD"),
        ("FOURTH", "4TH"), ("FIFTH", "5TH"), ("SIXTH", "6TH"),
        ("SEVENTH", "7TH"), ("EIGHTH", "8TH"), ("NINTH", "9TH"),
        ("TENTH", "10TH"), ("ELEVENTH", "11TH"), ("TWELTH", "12TH"),
        ("THIRTEENTH", "13TH"), ("FOURTEENTH", "14TH"),
        ("FIFTEENTH", "15TH"), ("SIXTEENTH", "16TH"),
        ("SEVENTEENTH", "17TH"), ("EIGHTEENTH", "18TH"),
        ("NINTEENTH", "19TH"), ("TWENTIETH", "20TH"),
    ]))

INST_TYPES = RuleSet("inst_types", tuple(
    (rf"\b{p}\b", r) for p, r in [
        (r"COMM OF", "COMMONWEALTH OF"),
        (r"MASSACHUSETTS COMMONWEALTH", "COMMONWEALTH OF MASSACHUSETTS"),
        (r"COMM", "COMMUNITY"),
        (r"CORP[ORATION]{0,8}", "CORPORATION"),
        (r"INC[ORPORATED]{0,10}", "INC"),
        (r"PRO?[PERTIE]{1,6}S", "PROPERTIES"),
        (r"PRO?[PERT]{1,4}Y?", "PROPERTY"),
        (r"L[IMI]{0,4}TE?D", "LIMITED"),
        (r"PA?RTN[ERS]{1,3}", "PARTNERS"),
        (r"(P[AR]{0,2}TN[ERS]{1,3}[HIP]{1,4}S?|PRTSHIP|PTSH)", "PARTNERSHIP"),
        (r"M[ANA]{0,4}G[EMENT]{0,6}", "MANAGEMENT"),
        (r"TECH", "TECHNOLOGY"),
        (r"INST[ITUT]{3,5}E?", "INSTITUTE"),
        (r"UNI[VERSITY]{6,8}", "UNIVERSITY"),
        (r"(COMP[ANY]{2,4}|CO(MP)*)", "COMPANY"),
        (r"GR[OU]{0,3}P", "GROUP"),
        (r"INV", "INVESTMENT"),
        (r"BK", "BANK"),
        (r"ESQ", "ESQUIRE"),
        (r"PRIV", "PRIVATE"),
        (r"(RLTY|RTY|RELTY|RALTY)", "REALTY"),
        (r"R / E", "REAL ESTATE"),
        (r"(LI?V[IN]{1,3}G|LIV)", "LIVING"),
        (r"FAM", "FAMILY"),
        (r"NOM[INEE]{3,5}", "NOMINEE"),
        (r"IRREV[OCABLE]{0,7}", "IRREVOCABLE"),
        (r"REV[OCABLE]{0,7}", "REVOCABLE"),
        (r"CONDO[MINIU]{0,7}", "CONDOMINIUM"),
        (r"L L C", "LLC"),
        (r"L P", "LP"),
        (r"G P", "GP"),
        (r"L T D", "LTD"),
        (r"ET( (- )?)?AL", ""),
        (r"L[IMI]{0,4}TE?D", "LTD"),
        (r"LTD LIABILITY (COMPANY|CORPORATION)", "LLC"),
        (r"LTD LLC", "LLC"),
        (r"LTD (LIABILITY )?PARTNERS(HIP)?", "LLP"),
        (r"LPS?", "LLP"),
        (r"GENERAL PARTNERS(HIP)?", "GP"),
        (r"AUTH[ORITY]{0,6}", "AUTHORITY"),
        (r"(ASS[N]?|ASSOC)", "ASSOCATION"),
        (r"DEPT", "DEPARTMENT"),
        (r"((G?ST|[0-9]{0,4}) )?(TRUST|TRU?ST|TR|TRT|TRUS|TRU|TRYST|T[RUS]{3}T)( (OF )?[0-9\s\-]+)?",
         "TRUST"),
        (r"(C ?O-?)?(TRS|TRU?ST[ES]{1,4}|TRSTS|T[RUSTEE]{6}S|TS|BE)",
         "TRUSTEES"),
        (r"([A-Z]+)TRUST", r"\1 TRUST"),
        (r"([A-Z]+)TRUSTEES", r"\1 TRUSTEES"),
        (r"([A-Z]+)LLC", r"\1 LLC"),
        (r"LLC( A)? MASSACHUSETTS LLC", "LLC"),
        (r"LLP( A)? MASSACHUSETTS (LLP|LPS)", "LLP"),
        (r"(?:(INC|COMPANY)( A)?) MASSACHUSETTS CORPORATION", ""),
        (r"([A-Z]+)LLP", r"\1 LLP"),
    ]) + ((r"\bIRR\b( TR)", r"IRREVOCABLE\1"),))

TRAILING_LEADING = RuleSet("trailing_leading", (
    (r"( OF ?$)|( AND ?$)|( THE ?$)|(^ ?OF )|(^ ?AND )|(^ ?THE )", ""),
))

LEADING_ZEROS = RuleSet("leading_zeros", (
    (r"^0+([1-9])", r"\1"),
    (r"^[\- ]+", ""),
))

SPACING = RuleSet("spacing", (
    (r" ?/ ?", "/"),
    (r"& ?$", ""),
    (r" ?& ?", " AND "),
    (r" ?(-|–|—) ?", "-"),
    (r" ?, ?", ","),
))

FRAC_TO_DEC = RuleSet("frac_to_dec", (
    (r"([0-9]) 1/2", r"\1.5"),
    (r"/", " "),
))

HYPHENATE_RANGE = RuleSet("hyphenate_range", (
    (r"^([0-9]{1,6}[A-Z]{0,2}) ([0-9]{1,6}[A-Z]? )", r"\1-\2"),
    (r"^([0-9]{1,6}[A-Z]{1,2})([0-9]{1,6}[A-Z]? )", r"\1-\2"),
))

REMOVE_TITLES = RuleSet("remove_titles", (
    (r"\b(ESQ(UIRE)?|MD|JD|PHD|PC|MR|MS|MRS|JR|SR|I+|I*[VX]I*|(AND )?ET( - | )?ALL?)\b",
     ""),
))

REMOVE_ESTATE = RuleSet("remove_estate", (
    (r"\b(ESTATE OF|(A )?LIFE ESTATE|FOR LIFE|LE)\b", ""),
))

MIDDLE_INITIAL = RuleSet("middle_initial", (
    (r"([A-Z] )[A-Z] ([A-Z])", r"\1\2"),
))

MASSACHUSETTS = RuleSet("massachusetts", (
    (r"\b(MASS|MA)\b", "MASSACHUSETTS"),
))

MASS_CORP = RuleSet("mass_corp", (
    (r"( (CO|INC|CORP|LLC|L?LPS?|LTD)) (A )?(MASS|MASSACHUSETTS)( (CO|INC|CORP|LLC|L?LPS?|LTD))?$",
     r"\1"),
))

# ≙ std_muni_names(mass=TRUE) misspelling canonicalization
# (/root/reference/R/standardizers.R:663-690).  Mirrored faithfully,
# including the reference's " HLDS( |$)" -> "HIGHLANDS" rule, which drops
# the leading space ("ROCKY HLDS" -> "ROCKYHIGHLANDS") — same on both
# engines.  Rule order matters: the MANCHESTER rewrite runs before the
# MANC...SEA catch-all, whose char class excludes '-' so the already
# canonical form is not re-matched.
MUNI_NAMES = RuleSet("muni_names", (
    (r"BORO$", "BOROUGH"),
    (r"^ACT$", "ACTON"),
    (r"^GLOUSTER$", "GLOUCESTER"),
    (r"^NEW TOWN$", "NEWTON"),
    (r"^[A-Z]AMBRIDGE$", "CAMBRIDGE"),
    (r"^NEWBURY PORT$", "NEWBURYPORT"),
    (r" HLDS( |$)", "HIGHLANDS"),
    (r"^DEVEN$", "DEVENS"),
    (r"^PRIDE CROSSING$", "PRIDES CROSSING"),
    (r"^MANCHESTER$", "MANCHESTER-BY-THE-SEA"),
    (r"^MANC[A-Z /]+SEA$", "MANCHESTER-BY-THE-SEA"),
))

# ≙ std_muni_names(mass=FALSE) NYC/LA detect-to-constant branch
# (/root/reference/R/standardizers.R:691-714): a case_when, not a cascade —
# exposed as the collapsed detection regex both engines compile.
NYC_MUNI_RE = "|".join(f"({p})" for p in [
    r"^QUEENS( |$)",
    r"^(BROOKLYN|BKLY?N)( |$)",
    r"^STATEN (ISL(AND)?)?( |$)",
    r"^NEW YORK$",
    r"^HARLEM$( |$)",
    r"^MANHATTAN( |$)",
    r"^(THE )?BRONX( |$)",
])

# ≙ std_addr2_po_pmb normalization pair (/root/reference/R/standardizers.R:
# 1323-1345).  The reference appends a lookahead "[\\,\\-](?= ?[0-9])" to the
# PO-box misspelling terms; RE2 has no lookahead, so the digit tail is a
# capture group restored by the replacement.  Replacements faithfully mirror
# the reference's space-free "PO BOX" (so "BOX 12" -> "PO BOX12"); the
# downstream extraction regex carries the reference's optional space for
# exactly this reason.  No squish mid-set: extraction runs on unsquished
# text, as in the reference.
PO_PMB = RuleSet("po_pmb", (
    (r"((?:P ?[0O] ?)+B[0X]?X|(?:(?:P ?)?[0O])+ ?BOX|BX )[,\-]( ?[0-9])",
     r"PO BOX\2"),
    (r"^BO?X ", "PO BOX"),
), squish=False)

ADDR2_KEYWORDS = RuleSet("addr2_keywords", (
    (r"([ \-,])FLR?\b", r"\1FLOOR"),
    (r"([ \-,])BSMT\b", r"\1BASEMENT"),
    (r"([ \-,])BLDG\b", r"\1BUILDING"),
    (r"([ \-,])TWR\b", r"\1TOWER"),
    (r"PENT(HOUSE)?\b", "PH"),
    (r" A K A ", " "),
))

# the named registry the pipelines + oracle generator share
RULESETS: dict[str, RuleSet] = {rs.name: rs for rs in [
    DIRECTIONS, STREET_TYPES, SMALL_NUMBERS, SMALL_ORDINALS, INST_TYPES,
    TRAILING_LEADING, LEADING_ZEROS, SPACING, FRAC_TO_DEC, HYPHENATE_RANGE,
    REMOVE_TITLES, REMOVE_ESTATE, MIDDLE_INITIAL, MASSACHUSETTS, MASS_CORP,
    ADDR2_KEYWORDS, MUNI_NAMES, PO_PMB,
]}

_SQUISH_PAT = r"\s+"


def apply_cascade(col: pa.Array | pa.ChunkedArray,
                  rulesets: list[RuleSet]) -> pa.Array | pa.ChunkedArray:
    """Run the rule chain over a string column — one vectorized RE2 kernel
    per rule, a squish after each set (reference std_replace_generic
    semantics).  Order matters and is preserved exactly."""
    for rs in rulesets:
        for pat, rep in rs.rules:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
        if rs.squish:
            col = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(col, pattern=_SQUISH_PAT,
                                           replacement=" "))
    return col


def cascade_sql(expr: str, rulesets: list[RuleSet]) -> str:
    """The SAME chain as a nested DuckDB expression (single source of truth
    with ``apply_cascade`` — both compile RE2, so results are identical).
    Only for SHORT chains: DuckDB's binder caps expression nesting at 128 —
    long chains must go through ``cascade_cte_sql``."""
    for rs in rulesets:
        for pat, rep in rs.rules:
            assert "'" not in pat and "'" not in rep, "quote-free rules only"
            expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
        if rs.squish:
            expr = f"trim(regexp_replace({expr}, '{_SQUISH_PAT}', ' ', 'g'))"
    return expr


def cascade_sql_steps(rulesets: list[RuleSet],
                      per_layer: int = 12) -> list[str]:
    """The chain as a list of unary transforms over the placeholder ``{x}``,
    each nesting at most ``per_layer`` calls — stacked into CTE layers by
    ``cascade_cte_sql`` so DuckDB's 128-deep binder limit never trips."""
    steps: list[str] = []
    cur, count = "{x}", 0

    def flush():
        nonlocal cur, count
        if cur != "{x}":
            steps.append(cur)
            cur, count = "{x}", 0

    for rs in rulesets:
        for pat, rep in rs.rules:
            assert "'" not in pat and "'" not in rep, "quote-free rules only"
            cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
            count += 1
            if count >= per_layer:
                flush()
        if rs.squish:
            cur = f"trim(regexp_replace({cur}, '{_SQUISH_PAT}', ' ', 'g'))"
            count += 2
            if count >= per_layer:
                flush()
    flush()
    return steps


def cascade_cte_sql(base_select: str, rulesets: list[RuleSet],
                    final_select: str) -> str:
    """Full CTE-layered query: ``base_select`` must expose the working
    column as ``v``; ``final_select`` may reference ``{last}`` as the final
    CTE name."""
    steps = cascade_sql_steps(rulesets)
    sql = f"WITH s0 AS ({base_select})"
    for i, st in enumerate(steps, 1):
        # plain replace, NOT str.format — rule patterns contain regex
        # quantifier braces like {0,8}
        expr = st.replace("{x}", "v")
        sql += f", s{i} AS (SELECT * REPLACE ({expr} AS v) FROM s{i-1})"
    return sql + " " + final_select.replace("{last}", f"s{len(steps)}")


class CascadeNormalizer:
    """map_batches actor ≙ the reference's per-loader standardizer chains
    (e.g. proc_address_text, /root/reference/R/processors.R): rule sets are
    resolved and validated ONCE per actor in ``__init__`` (every pattern
    compiled eagerly so a bad rule fails at pool start, not mid-stream);
    ``__call__`` normalizes the configured columns per batch."""

    def __init__(self, cols: list[str], ruleset_names: list[str],
                 out_suffix: str = "_norm"):
        import re

        self.cols = cols
        self.rulesets = [RULESETS[n] for n in ruleset_names]
        self.out_suffix = out_suffix
        for rs in self.rulesets:
            for pat, _ in rs.rules:
                re.compile(pat)  # eager validation (RE2 ⊂ re syntax here)

    def __call__(self, t: pa.Table) -> pa.Table:
        for c in self.cols:
            t = t.append_column(f"{c}{self.out_suffix}",
                                apply_cascade(t[c], self.rulesets))
        return t


# -- std_fix_concatenated_ranges (standardizers.R:399-415) -------------------
# The reference patterns use BACKREFERENCES (^([0-9]{3,4})[A-Z]?(?=\1)),
# which RE2 (Arrow + DuckDB) does not support at all — so this one operator
# is ported as explicit slice-compare branches, evaluated in the same
# priority order the backtracking regex would try ({3,4} greedy -> 4 first;
# [A-Z]? greedy -> with-letter first).  `concat_ranges_branches` is the ONE
# source both the Arrow kernel and the generated SQL CASE are built from.

# rule 1: drop the first copy of a doubled 3-4 digit leading number
#   ("234234A TEST ST" -> "234A TEST ST"); branch = (k, with_letter)
_R1_BRANCHES = [(4, True), (4, False), (3, True), (3, False)]
# rule 2: hyphenate a concatenated range ("2342345 X" -> "2342-345 X" side
# of the reference's lookbehind form); branch = (k, with_letter), prefix =
# first k digits, then 1 digit, optional letter, then the same k digits + digit
_R2_BRANCHES = [(3, True), (3, False), (2, True), (2, False)]


def fix_concat_ranges(col: pa.Array | pa.ChunkedArray):
    """Vectorized std_fix_concatenated_ranges: rule-1 removal then rule-2
    hyphen insertion, first matching branch wins (if_else cascade)."""
    def digits(s, off, k):
        return pc.match_substring_regex(
            pc.utf8_slice_codeunits(s, off, off + k), rf"^[0-9]{{{k}}}$")

    def letter_at(s, off):
        return pc.match_substring_regex(
            pc.utf8_slice_codeunits(s, off, off + 1), r"^[A-Z]$")

    BIG = 1 << 30
    out = col
    # rule 1 (single anchored replacement -> evaluate branches high->low
    # priority, later writes must not touch rows already rewritten)
    done = pa.array(np.zeros(len(col), dtype=bool)) if len(col) else \
        pa.array([], pa.bool_())
    result = out
    for k, with_letter in _R1_BRANCHES:
        pre = pc.utf8_slice_codeunits(out, 0, k)
        second_off = k + 1 if with_letter else k
        cond = pc.and_kleene(digits(out, 0, k), pc.equal(
            pc.utf8_slice_codeunits(out, second_off, second_off + k), pre))
        if with_letter:
            cond = pc.and_kleene(cond, letter_at(out, k))
        cond = pc.and_kleene(cond, pc.invert(done))
        cond = pc.fill_null(cond, False)
        repl = pc.utf8_slice_codeunits(out, second_off, BIG)
        result = pc.if_else(cond, repl, result)
        done = pc.or_(done, cond)
    out = result
    # rule 2
    done = pa.array(np.zeros(len(col), dtype=bool)) if len(col) else \
        pa.array([], pa.bool_())
    result = out
    for k, with_letter in _R2_BRANCHES:
        p = k + 1 + (1 if with_letter else 0)   # insertion point
        pre = pc.utf8_slice_codeunits(out, 0, k)
        cond = pc.and_kleene(digits(out, 0, k), digits(out, k, 1))
        if with_letter:
            cond = pc.and_kleene(cond, letter_at(out, k + 1))
        cond = pc.and_kleene(cond, pc.equal(
            pc.utf8_slice_codeunits(out, p, p + k), pre))
        cond = pc.and_kleene(cond, digits(out, p + k, 1))
        cond = pc.and_kleene(cond, pc.invert(done))
        cond = pc.fill_null(cond, False)
        repl = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(out, 0, p), "-",
            pc.utf8_slice_codeunits(out, p, BIG), "")
        result = pc.if_else(cond, repl, result)
        done = pc.or_(done, cond)
    return result


def fix_concat_ranges_sql(expr: str) -> str:
    """The SAME branch cascade as nested DuckDB CASEs (built from the same
    branch lists — substr is 1-based)."""
    def digits_sql(e, off, k):
        return (f"regexp_matches(substr({e}, {off + 1}, {k}), "
                f"'^[0-9]{{{k}}}$')")

    def letter_sql(e, off):
        return f"regexp_matches(substr({e}, {off + 1}, 1), '^[A-Z]$')"

    v = expr
    cases = []
    for k, with_letter in _R1_BRANCHES:
        second_off = k + 1 if with_letter else k
        cond = (f"{digits_sql(v, 0, k)} AND substr({v}, {second_off + 1}, "
                f"{k}) = substr({v}, 1, {k})")
        if with_letter:
            cond += f" AND {letter_sql(v, k)}"
        cases.append((cond, f"substr({v}, {second_off + 1})"))
    r1 = "CASE " + " ".join(f"WHEN {c} THEN {r}" for c, r in cases) \
        + f" ELSE {v} END"
    u = f"({r1})"
    cases = []
    for k, with_letter in _R2_BRANCHES:
        p = k + 1 + (1 if with_letter else 0)
        cond = (f"{digits_sql(u, 0, k)} AND {digits_sql(u, k, 1)}"
                f" AND substr({u}, {p + 1}, {k}) = substr({u}, 1, {k})"
                f" AND {digits_sql(u, p + k, 1)}")
        if with_letter:
            cond += f" AND {letter_sql(u, k + 1)}"
        cases.append((cond,
                      f"substr({u}, 1, {p}) || '-' || substr({u}, {p + 1})"))
    return "CASE " + " ".join(f"WHEN {c} THEN {r}" for c, r in cases) \
        + f" ELSE {u} END"
