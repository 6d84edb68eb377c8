"""tests.sh → Case list.

The reference's test driver is `tests/test.sh NAME ARGS...` which runs
`xidel ARGS...` and byte-diffs stdout against tests/output/NAME
(tests/test.sh:1-28, --strip-trailing-cr). tests.sh invokes it ~500
times; this parser extracts (name, argv, stdin, env) per invocation,
handling `echo 'X' | tests/test.sh ...` pipes, `< file` redirects,
`VAR=x tests/test.sh ...` env prefixes, `export` lines, and multi-line
quoted arguments.
"""

from __future__ import annotations

import shlex
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Case:
    name: str
    argv: list[str]
    stdin: str | None = None
    stdin_file: str | None = None  # ref-relative path for '< file' redirects
    env: dict[str, str] = field(default_factory=dict)
    line: int = 0

    def resolve_stdin(self, ref_tests_dir: str | Path) -> str | None:
        if self.stdin is not None:
            return self.stdin
        if self.stdin_file is not None:
            p = Path(ref_tests_dir) / ".." / self.stdin_file
            return p.resolve().read_text()
        return None


def parse_tests_sh(path: str | Path) -> list[Case]:
    lines = Path(path).read_text().split("\n")
    cases: list[Case] = []
    exports: dict[str, str] = {}
    i = 0
    while i < len(lines):
        start = i
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("#"):
            continue
        if line.startswith("export "):
            kv = line[len("export ") :]
            if "=" in kv:
                k, v = kv.split("=", 1)
                exports[k] = v
            continue
        # join continuation lines until the quotes balance
        while True:
            try:
                toks = shlex.split(line, comments=True)
                break
            except ValueError:
                if i >= len(lines):
                    toks = []
                    break
                line += "\n" + lines[i]
                i += 1
        if not toks:
            continue
        env = dict(exports)
        while toks and "=" in toks[0] and "/" not in toks[0].split("=", 1)[0]:
            k, v = toks[0].split("=", 1)
            env[k] = v
            toks = toks[1:]
        stdin = None
        if toks and toks[0] == "echo":
            if "|" not in toks:
                continue
            p = toks.index("|")
            stdin = " ".join(toks[1:p]) + "\n"
            toks = toks[p + 1 :]
        if not toks or not toks[0].endswith("test.sh") or len(toks) < 2:
            continue
        name, argv = toks[1], toks[2:]
        stdin_file = None
        if "<" in argv:
            j = argv.index("<")
            if j + 1 < len(argv):
                stdin_file = argv[j + 1]
            argv = argv[:j]
        cases.append(
            Case(name=name, argv=argv, stdin=stdin, stdin_file=stdin_file,
                 env=env, line=start + 1)
        )
    return cases
