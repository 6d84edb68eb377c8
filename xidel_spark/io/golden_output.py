"""Byte-exact output serializers for the reference's format matrix.

Pinned by /root/reference/tests/output/{adhoc1,adhoc3,json1,json3,bash1,
bash3} (tests/tests.sh:132-175). Input is the ordered variable change log
(per document, in processing order):

- adhoc: raw values when only the default 'result' variable exists,
  otherwise 'name := value' lines (xidelbase.pas:2486-2504).
- json-wrapped: a JSON array of per-document objects; variables in
  first-assignment order; multi-assigned variables become arrays; items
  joined with ', \\n' (readme.txt:500-502).
- bash: scalar first, then promote-to-array on the second assignment:
  x='a' / x[0]="$x" / x[1]='b'; indexes continue globally (xidelcrt.pas
  bash mode).

The formatting itself is a driver-side serializer over an already-reduced
log (exactly the reference's output layer); the DataFrame wrappers collect
per-document condensed logs computed distributed-side.
"""

from __future__ import annotations


def adhoc_lines(log: list[tuple[str, str]]) -> list[str]:
    names = {n for n, _ in log}
    if names <= {"result"}:
        return [v for _, v in log]
    return [f"{n} := {v}" for n, v in log]


def _jq(v: str) -> str:
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


def json_wrapped(docs: list[list[tuple[str, str]]]) -> str:
    doc_strs = []
    for log in docs:
        order: list[str] = []
        vals: dict[str, list[str]] = {}
        for n, v in log:
            if n not in vals:
                order.append(n)
                vals[n] = []
            vals[n].append(v)
        entries = []
        for n in order:
            if len(vals[n]) > 1:
                entries.append(f'"{n}": [' + ", ".join(_jq(v) for v in vals[n]) + "]")
            else:
                entries.append(f'"{n}": ' + _jq(vals[n][0]))
        doc_strs.append("{\n" + ", \n".join(entries) + "\n}")
    return "[\n" + ", \n".join(doc_strs) + "\n]"


def bash_lines(log: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    counts: dict[str, int] = {}
    for n, v in log:
        q = "'" + v.replace("'", "'\\''") + "'"
        c = counts.get(n, 0)
        if c == 0:
            out.append(f"{n}={q}")
        elif c == 1:
            out.append(f'{n}[0]="${n}"')
            out.append(f"{n}[1]={q}")
        else:
            out.append(f"{n}[{c}]={q}")
        counts[n] = c + 1
    return out
