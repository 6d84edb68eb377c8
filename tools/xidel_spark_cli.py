"""xidel-style CLI over the Spark engine — the reference's invocation
surface (readme.txt:1-60), driven by the same processing-context
simulator that reproduces 386/386 of the reference's own test goldens
byte-exactly (xidel_spark/harness):

    python tools/xidel_spark_cli.py '<a>3</a>' -e ' 3 + . '
    python tools/xidel_spark_cli.py page.html -e "//a/@href" -f //a -e //title
    python tools/xidel_spark_cli.py a.xml -e //title --output-format json-wrapped
    echo '<a>3</a>' | python tools/xidel_spark_cli.py - -e .

Everything the harness supports works here: `[ ]` grouping, -f follow
chains with recursion, pattern templates, --output-format matrix,
--json-mode, modules, multipage actions. Expressions evaluate as Catalyst
columns — this CLI is the single-document degenerate case of the
distributed pipeline, not a separate code path.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    from xidel_spark.harness.sim import Sim, Skip
    from xidel_spark.session import get_spark

    # only consume stdin when the invocation can actually use it — an
    # open-but-idle stdin from a script runner must not block the process.
    # stdin is referenced by: a standalone '-' (input/expression/post),
    # an '--opt=-' form, or the IMPLICIT form (no data source at all, the
    # reference's `echo doc | xidel -e //x` shape, tests.sh:80)
    def _wants_stdin(args: list[str]) -> bool:
        if "-" in args or any(a.endswith("=-") for a in args):
            return True
        # implicit stdin: no positional data-source argument present.
        # Options default to value-taking (misclassifying a flag only
        # over-reads stdin, which the simulator then ignores; the reverse
        # would silently drop piped documents)
        from xidel_spark.harness.sim import _FLAG_OPTS

        takes_value = False
        for a in args:
            if takes_value:
                takes_value = False
                continue
            if a in ("[", "]"):
                continue
            if a.startswith("-"):
                takes_value = "=" not in a and a not in _FLAG_OPTS \
                    and a not in ("--xml", "--html", "--compressed")
                continue
            return False  # found a positional data source
        return True

    stdin = None
    if not sys.stdin.isatty() and _wants_stdin(argv):
        try:
            stdin = sys.stdin.read()
        except Exception:  # noqa: BLE001
            stdin = None

    spark = get_spark("xidel_spark_cli", master="local[*]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sim = Sim(spark, Path.cwd(), argv, stdin=stdin, env=dict(os.environ))
    try:
        out = sim.run()
    except Skip as e:
        print(f"xidel_spark: unsupported in this CLI: {e}", file=sys.stderr)
        return 2
    enc = sim._opt("output-encoding", "UTF-8")
    sys.stdout.buffer.write(out.encode(str(enc)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
