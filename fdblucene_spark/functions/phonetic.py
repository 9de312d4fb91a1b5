"""Soundex phonetic encoding — the Lucene analysis-phonetic module's
default encoder (PhoneticFilter with commons-codec Soundex), rebuilt
three ways that agree byte-for-byte:

- soundex_py:  pure-Python reference (the commons-codec algorithm:
  keep the first letter; H/W are code-TRANSPARENT — same-code letters
  separated by h/w collapse; vowels SEPARATE — same-code letters
  separated by a vowel code twice; pad/truncate to 4).
- soundex_col: the same algorithm as ONE Catalyst expression chain
  (whole-stage codegen; Java regex backreference collapses runs).
- soundex_sql: the DuckDB twin (RE2 has no backreferences, so run
  collapse is a generated fixed-point replace ladder — 6 passes halve
  any run of length <= 64).

Reference parity target: Lucene's analysis/phonetic PhoneticFilter
(the reference delegates analysis to Lucene wholesale,
/root/reference/README.md:53); classic test vectors (ROBERT -> R163,
ASHCRAFT -> A261 with HW transparency, TYMCZAK -> T522,
PFISTER -> P236) pin the commons-codec variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
SOUNDEX_MAP = "01230120022455012623010202"  # commons-codec US_ENGLISH
_CODE = {c: m for c, m in zip(ALPHA, SOUNDEX_MAP)}
_MAX_RUN_PASSES = 6  # halves runs: covers terms up to 2**6 = 64 chars


def soundex_py(term: str) -> str:
    """Reference implementation (commons-codec semantics). Non-letters
    are stripped first; an all-non-letter input encodes to ''."""
    u = "".join(ch for ch in term.upper() if "A" <= ch <= "Z")
    if not u:
        return ""
    first = u[0]
    # H/W transparency == deleting them from the tail before the
    # adjacency collapse; vowels stay (their 0 code breaks runs)
    tail = "".join(ch for ch in u[1:] if ch not in "HW")
    m = "".join(_CODE[ch] for ch in first + tail)
    collapsed = []
    for d in m:
        if not collapsed or collapsed[-1] != d:
            collapsed.append(d)
    tail_codes = "".join(d for d in collapsed[1:] if d != "0")
    return (first + tail_codes)[:4].ljust(4, "0")


def soundex_col(col: Column) -> Column:
    """soundex_py as one Catalyst expression (no Python in the plan)."""
    big = 1 << 30
    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    tail = F.regexp_replace(F.substring(u, 2, big), "[HW]", "")
    m = F.translate(F.concat(first, tail), ALPHA, SOUNDEX_MAP)
    collapsed = F.regexp_replace(m, r"(\d)\1+", "$1")
    tail_codes = F.replace(F.substring(collapsed, 2, big), F.lit("0"), F.lit(""))
    return F.when(u == "", F.lit("")).otherwise(
        F.rpad(F.substring(F.concat(first, tail_codes), 1, 4), 4, "0")
    )


def soundex_sql(expr: str) -> str:
    """DuckDB twin of soundex_col over `expr`. RE2 backreferences
    don't exist, so the run collapse is a generated replace ladder:
    each pass halves every same-digit run, 6 passes flatten any run
    up to 64 chars (longer than any indexable term)."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    first = f"substr({u}, 1, 1)"
    tail = f"regexp_replace(substr({u}, 2), '[HW]', '', 'g')"
    m = f"translate({first} || {tail}, '{ALPHA}', '{SOUNDEX_MAP}')"
    for _ in range(_MAX_RUN_PASSES):
        for d in "0123456":
            m = f"replace({m}, '{d}{d}', '{d}')"
    tail_codes = f"replace(substr({m}, 2), '0', '')"
    return (
        f"CASE WHEN {u} = '' THEN '' "
        f"ELSE rpad(substr({first} || {tail_codes}, 1, 4), 4, '0') END"
    )
