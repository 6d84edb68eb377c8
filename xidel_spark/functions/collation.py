"""Xidel's default string collation: case-insensitive, numeric-aware.

readme.txt:167-173 pins the ordering: '9xy' = '9XY' < '10XY' < 'xy' —
digit runs compare numerically, letters case-insensitively. Spark's binary
string comparison can't express this, so we compute an order-preserving
SORT KEY (vectorized Arrow UDF): each digit run is replaced by
('0', zero-padded value), each text run by ('1', lowercased text), so
plain byte comparison of keys equals xidel comparison of originals.

Weak typing (readme.txt:174-176: 'false' = false(), 1+"2" = 3) lives in
weak_eq / weak_add below.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_RUNS = re.compile(r"(\d+)|(\D+)")
_PAD = 24


def collation_key_one(s: str | None) -> str | None:
    if s is None:
        return None
    parts = []
    for digits, text in _RUNS.findall(s):
        if digits:
            parts.append("0" + digits.lstrip("0").rjust(_PAD, "0"))
        else:
            parts.append("1" + text.lower())
    return "\x01".join(parts)


@F.pandas_udf(StringType())
def collation_key(col: pd.Series) -> pd.Series:
    return col.map(collation_key_one)


def xidel_eq(a: Column, b: Column) -> Column:
    """= under xidel's default collation ('9xy' = '9XY')."""
    return collation_key(a) == collation_key(b)


def xidel_lt(a: Column, b: Column) -> Column:
    return collation_key(a) < collation_key(b)


def weak_eq(a: Column, b: Column) -> Column:
    """Weak-typed general comparison: numeric if both castable, boolean
    words against booleans, else collation equality."""
    an, bn = a.try_cast("double"), b.try_cast("double")  # ANSI-safe coercion probe
    return F.when(an.isNotNull() & bn.isNotNull(), an == bn).otherwise(
        xidel_eq(a.cast("string"), b.cast("string"))
    )


def weak_add(a: Column, b: Column) -> Column:
    """1 + "2" = 3 (readme.txt:176): untyped atomics coerce to number."""
    return a.try_cast("double") + b.try_cast("double")


def collation_key_expr(col: Column) -> Column:
    """collation_key as a PURE-CATALYST expression — byte-identical to
    collation_key_one, but usable inside higher-order-function lambdas
    (Catalyst rejects Python UDF calls inside HOFs, so the expression
    language's existential comparisons over sequences need this form) and
    free of the Python-worker boundary on the scalar path too.

    Split into digit / non-digit runs with a lookaround regex, key each run
    ('0'+zero-padded value | '1'+lowercase), join with \\x01."""
    parts = F.filter(
        F.split(col, r"(?<=\d)(?=\D)|(?<=\D)(?=\d)"), lambda p: p != ""
    )

    def run_key(p: Column) -> Column:
        stripped = F.regexp_replace(p, "^0+", "")
        # python rjust(24) never truncates; F.lpad does — guard long runs
        padded = F.when(F.length(stripped) >= _PAD, stripped).otherwise(
            F.lpad(stripped, _PAD, "0")
        )
        return F.when(p.rlike(r"^\d"), F.concat(F.lit("0"), padded)).otherwise(
            F.concat(F.lit("1"), F.lower(p))
        )

    return F.array_join(F.transform(parts, run_key), "\x01")
