"""Run the reference's own test suite (tests/tests.sh → tests/output/*)
through the golden harness and report per-case PASS / FAIL / SKIP.

    python tools/golden_report.py [name-substring...]   # filter cases
    GOLDEN_DIFF=1 python tools/golden_report.py NAME    # show diffs

Summary line: distinct goldens matched byte-exactly at least once /
total distinct goldens with at least one runnable case.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path(os.environ.get("XIDEL_REF", "/root/reference"))


def main() -> int:
    from xidel_spark.harness import Skip, parse_tests_sh, run_case
    from xidel_spark.session import get_spark

    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    cases = parse_tests_sh(REF / "tests/tests.sh")
    if filters:
        cases = [c for c in cases if any(f in c.name for f in filters)]

    spark = get_spark("golden", master="local[4]", shuffle_partitions=1)
    spark.sparkContext.setLogLevel("ERROR")

    passed: set[str] = set()
    failed: dict[str, str] = {}
    skipped: dict[str, str] = {}
    no_golden = 0
    for case in cases:
        gpath = REF / "tests/output" / case.name
        if not gpath.exists():
            no_golden += 1
            continue
        want = gpath.read_text()
        try:
            got = run_case(spark, case, REF)
        except Skip as e:
            skipped.setdefault(case.name, str(e))
            continue
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            failed.setdefault(case.name, f"ERROR {type(e).__name__}: {str(e)[:100]}")
            continue
        if got == want:
            passed.add(case.name)
            print(f"PASS {case.name} (line {case.line})")
        else:
            failed.setdefault(case.name, f"line {case.line}")
            print(f"FAIL {case.name} (line {case.line})")
            if os.environ.get("GOLDEN_DIFF"):
                print(" want:", repr(want[:400]))
                print("  got:", repr(got[:400]))

    failed = {k: v for k, v in failed.items() if k not in passed}
    skipped = {k: v for k, v in skipped.items() if k not in passed and k not in failed}
    print()
    print(f"PASS {len(passed)}  FAIL {len(failed)}  SKIP {len(skipped)}  "
          f"(+{no_golden} cases without golden)")
    if failed:
        print("\nFAILED:")
        for k, v in sorted(failed.items()):
            print(f"  {k}: {v}")
    if skipped:
        from collections import Counter

        print("\nSKIP reasons:")
        for reason, n in Counter(skipped.values()).most_common(20):
            print(f"  {n:3d}  {reason}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
