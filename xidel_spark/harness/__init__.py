"""Reference golden-test harness.

Parses the reference's own test script (tests/tests.sh — 364 golden
output files) into runnable cases and replays them through THIS engine:
every expression/selector/template evaluates as Catalyst columns via the
same compile_expr / compile_css / template pipeline the distributed
operators use, on one-row DataFrames (the single-document degenerate case
of the cluster engine, same placement as tools/xidel_spark_cli.py).

The processing-context semantics (sibling creation, [ ] brackets, -f
follow chaining, the global duplication list) mirror the reference's
TProcessingContext machinery (xidelbase.pas:1844-2140, 3349-3460) and are
pinned by the nest*/sibling*/tef/tfe goldens.
"""

from .cases import Case, parse_tests_sh
from .sim import Skip, run_case

__all__ = ["Case", "parse_tests_sh", "Skip", "run_case"]
