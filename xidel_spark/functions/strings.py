"""Xidel/XPath string-function surface as Spark Column helpers.

Coverage of the fn: string module the reference exposes
(/root/reference/web/functions.xml; readme.txt:191-194 for extract()):
each helper keeps XPath semantics (1-based positions, empty-string
behavior on no-match) while compiling to built-in Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract(col: Column, regex: str, group: int = 0) -> Column:
    """xidel's signature scraping primitive: extract(string, regex[, group])
    — empty string when no match (readme.txt:191-194)."""
    return F.regexp_extract(col, regex, group)


def extract_all(col: Column, regex: str, group: int = 0) -> Column:
    return F.regexp_extract_all(col, F.lit(regex), F.lit(group))


def substring_before(col: Column, sep: Column | str) -> Column:
    """fn:substring-before — '' when sep absent."""
    sep = F.lit(sep) if isinstance(sep, str) else sep
    pos = F.instr(col, sep)
    return F.when(pos > 0, F.substring(col, F.lit(1), pos - 1)).otherwise(F.lit(""))


def substring_after(col: Column, sep: Column | str) -> Column:
    sep = F.lit(sep) if isinstance(sep, str) else sep
    pos = F.instr(col, sep)
    return F.when(
        pos > 0, F.substring(col, pos + F.length(sep), F.length(col))
    ).otherwise(F.lit(""))


def string_join(arr: Column, sep: str = "") -> Column:
    """fn:string-join over an array column."""
    return F.array_join(arr, sep)


def normalize_space(col: Column) -> Column:
    """fn:normalize-space: trim + collapse internal whitespace runs."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def translate(col: Column, from_chars: str, to_chars: str) -> Column:
    return F.translate(col, from_chars, to_chars)


def tokenize(col: Column, regex: str = r"\s+") -> Column:
    """fn:tokenize — no empty leading/trailing tokens."""
    return F.filter(F.split(col, regex), lambda t: t != "")


def codepoints_to_string(arr: Column) -> Column:
    return F.array_join(F.transform(arr, lambda c: F.char(c)), "")


def string_to_codepoints(col: Column) -> Column:
    return F.transform(
        F.filter(F.split(col, ""), lambda c: c != ""), lambda c: F.ascii(c)
    )


def contains(col: Column, sub: Column | str) -> Column:
    sub = F.lit(sub) if isinstance(sub, str) else sub
    return F.instr(col, sub) > 0


def starts_with(col: Column, pre: str) -> Column:
    return col.startswith(pre)


def ends_with(col: Column, suf: str) -> Column:
    return col.endswith(suf)


def substring_xpath(col: Column, start, length=None) -> Column:
    """fn:substring — 1-based with the XPath rounding rule: characters at
    positions p with round(start) <= p < round(start) + round(length)
    (round = half-to-positive-infinity), so substring('12345', 1.5, 2.6)
    is '234' and out-of-range prefixes clamp instead of erroring."""
    lit = lambda v: v if isinstance(v, Column) else F.lit(float(v))  # noqa: E731
    b = F.floor(lit(start) + 0.5).cast("int")
    if length is None:
        lo = F.greatest(b, F.lit(1))
        return F.substring(col, lo, F.length(col))
    n = F.floor(lit(length) + 0.5).cast("int")
    lo = F.greatest(b, F.lit(1))
    cnt = F.greatest(b + n - lo, F.lit(0))
    return F.substring(col, lo, cnt)


def compare_strings(a: Column, b: Column) -> Column:
    """fn:compare → -1 / 0 / 1; empty-sequence (NULL) argument → empty
    sequence (NULL), not 0 — fn:compare((), 'b') is (), never 'equal'."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(a < b, -1)
        .when(a > b, 1)
        .otherwise(0)
    )


def deep_equal(a: Column, b: Column) -> Column:
    """fn:deep-equal over sequence (array) columns — null-safe equality."""
    return a.eqNullSafe(b)
