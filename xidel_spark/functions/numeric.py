"""XDM double arithmetic edge semantics (±INF, NaN, −0).

The reference pins IEEE-754 behavior plus XPath error codes through the
golden matrices tests/output/{addition,subtraction,multiplication,
division,divisionInt,modulo} (tests/tests.sh:524-529). Spark doubles are
IEEE, so +,−,×,÷ come free; what needs care is xidel's SERIALIZATION
(INF/-INF/NaN/-0, integral doubles without '.0') and idiv/mod error codes
(FOAR0001 division by zero, FOAR0002 numeric overflow in integer division).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FOAR0001 = "err:FOAR0001"
FOAR0002 = "err:FOAR0002"


def ser_double(col: Column) -> Column:
    """xidel's adhoc serialization of xs:double."""
    s = col.cast("string")  # Spark: 'Infinity', '-Infinity', 'NaN', '-0.0', '2.0'
    s = F.regexp_replace(s, "^Infinity$", "INF")
    s = F.regexp_replace(s, "^-Infinity$", "-INF")
    return F.regexp_replace(s, r"\.0$", "")


def _is_zero(c: Column) -> Column:
    return c == 0.0  # true for both +0.0 and -0.0


def _neg(c: Column) -> Column:
    """true for -0.0/-Infinity/negative values (string form keeps the sign
    bit that comparisons lose); NaN is never negative here."""
    return c.cast("string").startswith("-")


def xdm_div(a: Column, b: Column) -> Column:
    """$a div $b on xs:double — IEEE semantics incl. ÷0 → ±INF/NaN.
    Spark 4's ANSI mode raises DIVIDE_BY_ZERO even for doubles, so the
    zero-divisor branch is computed explicitly (sign via the string form
    to honor -0.0)."""
    zero_div = _is_zero(b) & ~F.isnan(b)
    inf = F.lit(float("inf"))
    safe_b = F.when(zero_div, F.lit(1.0)).otherwise(b)
    return (
        F.when(
            zero_div,
            F.when(F.isnan(a) | _is_zero(a), F.lit(float("nan")))
            .when(_neg(a) != _neg(b), -inf)
            .otherwise(inf),
        )
        .otherwise(a / safe_b)
    )


def xdm_idiv(a: Column, b: Column) -> Column:
    """$a idiv $b with XPath error codes as string results (the golden
    matrices serialize caught errors, tests/tests.sh:528)."""
    nan = F.isnan(a) | F.isnan(b)
    a_inf = F.abs(a) == float("inf")
    zero_div = _is_zero(b) & ~F.isnan(b)
    safe_b = F.when(zero_div, F.lit(1.0)).otherwise(b)
    quot = a / safe_b
    # |quotient| >= 2^63 cannot fit a long: XPath overflow (err:FOAR0002).
    # Without the guard, ANSI mode aborts the job with CAST_OVERFLOW.
    overflow = F.abs(quot) >= F.lit(9.223372036854775808e18)
    return (
        F.when(zero_div, F.lit(FOAR0001))
        .when(nan | a_inf | overflow, F.lit(FOAR0002))
        .otherwise(quot.cast("long").cast("string"))
    )


def xdm_mod(a: Column, b: Column) -> Column:
    """$a mod $b — the reference computes a - trunc(a/b)*b (golden
    tests/output/modulo: '-1 mod 1' is 0, not IEEE fmod's -0), with the
    finite dividend passed through for infinite divisors; mod ±0/NaN/±INF
    dividend → NaN."""
    nan_case = _is_zero(b) | F.isnan(b) | F.isnan(a) | (F.abs(a) == float("inf"))
    b_inf = F.abs(b) == float("inf")
    safe_b = F.when(_is_zero(b), F.lit(1.0)).otherwise(b)
    q_real = a / safe_b
    # past 2^63 the long cast would ANSI-overflow, but any double >= 2^53
    # is already integral, so trunc(q) == q there — use q_real directly
    quot = F.when(
        F.abs(q_real) >= F.lit(9.223372036854775808e18), q_real
    ).otherwise(q_real.cast("long").cast("double"))
    return ser_double(
        F.when(nan_case, float("nan"))
        .when(b_inf | _is_zero(a), a)  # ±0 dividend keeps its sign
        .otherwise(a - quot * safe_b)
    )
