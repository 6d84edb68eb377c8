"""Pattern-template matching over span sequences.

The reference's signature feature: annotated templates where elements
match elements, `{var := expr}` captures values, and `t:optional` /
`*` `+` `?` `{min,max}` control repetition, with backtracking
(readme.txt:289-392; engine invoked at xidelbase.pas:2559-2565).

Spans re-expression: a document is an ordered span sequence, so a pattern
is an ordered list of SPAN MATCHERS; matching is subsequence alignment
with backtracking — matchers must hit spans in order, arbitrary spans may
be skipped between hits (the template engine's 'loose' matching), greedy
repetition with give-back. Captures append to the variable change log
(extract/changelog.py), preserving multi-assignment order.

Execution: the pattern is compiled once (driver), then run per document
inside an Arrow `mapInPandas` batch — the same placement the reference
gives its template engine (an interpreter over the parsed tree), kept off
the crawl hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

REPEAT = {"?": (0, 1), "*": (0, None), "+": (1, None), "1": (1, 1)}


@dataclass(frozen=True)
class SpanMatcher:
    kind: str                      # span kind to match ('title', 'link', ...)
    capture: str | None = None     # variable name to assign
    field: str = "text"            # which span field the capture reads
    text_prefix: str | None = None  # xidel text-match default: starts-with
    min_count: int = 1
    max_count: int | None = 1      # None = unbounded


def compile_pattern(spec: list[dict]) -> list[SpanMatcher]:
    out = []
    for m in spec:
        mn, mx = REPEAT.get(m.get("repeat", "1"), (None, None))
        if mn is None:
            mn, mx = m["repeat"]  # explicit (min, max) tuple
        out.append(
            SpanMatcher(
                kind=m["kind"],
                capture=m.get("capture"),
                field=m.get("field", "text"),
                text_prefix=m.get("text_prefix"),
                min_count=mn,
                max_count=mx,
            )
        )
    return out


def _span_matches(span: dict, m: SpanMatcher) -> bool:
    if span["kind"] != m.kind:
        return False
    if m.text_prefix is not None and not (span.get("text") or "").startswith(m.text_prefix):
        return False
    return True


def match_spans(spans: list[dict], matchers: list[SpanMatcher]) -> list[tuple[str, str]] | None:
    """Backtracking subsequence match; returns captured (var, value) pairs
    in document order, or None when the pattern does not match."""

    def rec(si: int, mi: int) -> list[tuple[str, str]] | None:
        if mi == len(matchers):
            return []
        m = matchers[mi]
        limit = len(spans) if m.max_count is None else m.max_count
        # collect greedy occurrence positions (with skips allowed)
        occs: list[int] = []
        caps: list[tuple[str, str]] = []
        pos = si
        while len(occs) < limit and pos < len(spans):
            if _span_matches(spans[pos], m):
                occs.append(pos)
            pos += 1
        # backtrack from greedy count down to min_count
        for take in range(len(occs), m.min_count - 1, -1):
            nxt = (occs[take - 1] + 1) if take else si
            rest = rec(nxt, mi + 1)
            if rest is not None:
                mine = []
                if m.capture:
                    for p in occs[:take]:
                        mine.append((m.capture, spans[p].get(m.field) or ""))
                return mine + rest
        return None

    return rec(0, 0)


LOG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("var_name", T.StringType()),
        T.StructField("seq_index", T.LongType()),
        T.StructField("value", T.StringType()),
    ]
)


def apply_pattern(docs: DataFrame, spec: list[dict], id_col: str = "doc_id") -> DataFrame:
    """Run a compiled pattern over the documents' span sequences; emits
    change-log rows (doc_id, var_name, seq_index, value). Documents that
    don't match emit nothing (template semantics)."""
    matchers = compile_pattern(spec)

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "var_name": [], "seq_index": [], "value": []}
            for doc_id, spans in zip(pdf[id_col], pdf["spans"]):
                norm = sorted(
                    ({"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
                      "offset": s["offset"]} for s in spans),
                    key=lambda s: s["offset"],
                )
                res = match_spans(norm, matchers)
                if res is None:
                    continue
                for i, (var, val) in enumerate(res):
                    out["doc_id"].append(doc_id)
                    out["var_name"].append(var)
                    out["seq_index"].append(i)
                    out["value"].append(val)
            yield pd.DataFrame(out)

    return docs.select(id_col, "spans").mapInPandas(run, schema=LOG_SCHEMA)
