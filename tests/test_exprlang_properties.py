"""Property-based cross-check of the expression compiler.

Random expression trees (integer arithmetic, comparisons, if/then/else,
let-bindings, sequences + aggregates) are rendered to the -e string
surface, compiled to Catalyst by exprlang, and evaluated AGAINST an
independent Python evaluator that implements the same XPath semantics
directly on the AST — two implementations, one grammar, zero shared
evaluation code (the same pattern as tests/test_selector_properties.py
for the selector engine)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xidel_spark.exprlang import compile_expr

# ---------------------------------------------------------------------------
# AST generator: (kind, ...) tuples rendered to strings + evaluated in python
# ---------------------------------------------------------------------------


def _leaf():
    return st.integers(min_value=0, max_value=9).map(lambda n: ("lit", n))


def _expr(depth: int):
    if depth == 0:
        return _leaf()
    sub = _expr(depth - 1)
    return st.one_of(
        _leaf(),
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(
            lambda t: ("bin", *t)
        ),
        st.tuples(sub, st.integers(min_value=1, max_value=9)).map(
            lambda t: ("mod", t[0], ("lit", t[1]))
        ),
        st.tuples(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]), sub, sub, sub, sub).map(
            lambda t: ("if", (t[0], t[1], t[2]), t[3], t[4])
        ),
        st.tuples(sub, sub).map(lambda t: ("let", t[0], t[1])),
        st.lists(sub, min_size=1, max_size=3).map(lambda xs: ("sum", xs)),
    )


def render(e) -> str:
    k = e[0]
    if k == "lit":
        return str(e[1])
    if k == "bin":
        return f"({render(e[2])} {e[1]} {render(e[3])})"
    if k == "mod":
        return f"({render(e[1])} mod {render(e[2])})"
    if k == "if":
        op, a, b = e[1]
        return (
            f"(if ({render(a)} {op} {render(b)}) then {render(e[2])} "
            f"else {render(e[3])})"
        )
    if k == "let":
        return f"(let $v := {render(e[1])} return $v + {render(e[2])})"
    if k == "sum":
        return "sum((" + ", ".join(render(x) for x in e[1]) + "))"
    raise AssertionError(k)


def pyeval(e) -> float:
    k = e[0]
    if k == "lit":
        return e[1]
    if k == "bin":
        a, b = pyeval(e[2]), pyeval(e[3])
        return {"+": a + b, "-": a - b, "*": a * b}[e[1]]
    if k == "mod":
        a, b = pyeval(e[1]), pyeval(e[2])
        # XPath mod: sign follows the dividend (python % follows divisor)
        import math

        return a - b * math.trunc(a / b)
    if k == "if":
        op, x, y = e[1]
        a, b = pyeval(x), pyeval(y)
        ok = {
            "=": a == b, "!=": a != b, "<": a < b,
            "<=": a <= b, ">": a > b, ">=": a >= b,
        }[op]
        return pyeval(e[2]) if ok else pyeval(e[3])
    if k == "let":
        return pyeval(e[1]) + pyeval(e[2])
    if k == "sum":
        return sum(pyeval(x) for x in e[1])
    raise AssertionError(k)


@pytest.fixture(scope="module")
def one_row(spark):
    return spark.range(1)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_expr(3), min_size=1, max_size=6))
def test_expression_compiler_matches_python_evaluator(one_row, exprs):
    from pyspark.sql import functions as F  # noqa: F401

    cols = [
        compile_expr(render(e)).string().alias(f"c{i}") for i, e in enumerate(exprs)
    ]
    row = one_row.select(*cols).first()
    for i, e in enumerate(exprs):
        want = pyeval(e)
        got = row[f"c{i}"]
        # integer-valued results print without a decimal point
        want_s = str(int(want)) if float(want).is_integer() else str(want)
        assert got == want_s, f"{render(e)}: want {want_s!r} got {got!r}"
