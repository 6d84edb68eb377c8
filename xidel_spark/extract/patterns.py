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

_CONDITION_OPS = {
    "eq": lambda v, x: v == x,
    "ne": lambda v, x: v != x,
    "contains": lambda v, x: x in v,
    "starts-with": lambda v, x: v.startswith(x),
    "ends-with": lambda v, x: v.endswith(x),
}


@dataclass(frozen=True)
class SpanMatcher:
    kind: str                      # span kind to match ('title', 'link', ...)
    capture: str | None = None     # variable name to assign
    field: str = "text"            # capture source; 'matched-text' = the
    #                                text the matcher matched (changelog:12:
    #                                matched-text replaces text() in patterns)
    text_prefix: str | None = None  # legacy alias for ('starts-with', v)
    min_count: int = 1
    max_count: int | None = 1      # None = unbounded
    condition: tuple | None = None  # t:condition subset: (field, op, value)
    # <t:meta default-text-matching=.. default-case-sensitive=..> modes
    # (readme.txt:360-366): how a pattern TEXT matches a page text node
    text_match: str | None = None   # starts-with | ends-with | exact | regex
    text_value: str | None = None
    case_sensitive: bool = True


@dataclass(frozen=True)
class Switch:
    """<t:switch> / <t:switch-prioritized>: ordered alternation — the first
    branch whose match lets the rest of the pattern succeed wins
    (readme.txt t:switch rows)."""
    branches: tuple
    prioritized: bool = False


@dataclass(frozen=True)
class Loop:
    """<t:loop min=.. max=..>: repeats its whole CHILD GROUP (a '+' marker
    can only repeat the single previous element — readme.txt)."""
    children: tuple
    min_count: int = 0
    max_count: int | None = None


@dataclass(frozen=True)
class Siblings:
    """<t:siblings>: the children must match ADJACENT spans (no skipped
    spans inside the group)."""
    children: tuple


def compile_pattern(spec: list[dict]) -> list:
    out = []
    meta = {"text-matching": "starts-with", "case-sensitive": True}
    for m in spec:
        if "meta" in m:
            # <t:meta default-text-matching=".." default-case-sensitive="..">
            # applies to every FOLLOWING matcher (readme.txt:360-366)
            meta["text-matching"] = m["meta"].get(
                "default-text-matching", meta["text-matching"]
            )
            meta["case-sensitive"] = m["meta"].get(
                "default-case-sensitive", meta["case-sensitive"]
            )
            continue
        if "switch" in m:
            out.append(
                Switch(
                    tuple(tuple(compile_pattern(b)) for b in m["switch"]),
                    prioritized=bool(m.get("prioritized")),
                )
            )
            continue
        if "loop" in m:
            out.append(
                Loop(
                    tuple(compile_pattern(m["loop"])),
                    min_count=m.get("min", 0),
                    max_count=m.get("max"),
                )
            )
            continue
        if "siblings" in m:
            out.append(Siblings(tuple(compile_pattern(m["siblings"]))))
            continue
        mn, mx = REPEAT.get(m.get("repeat", "1"), (None, None))
        if mn is None:
            mn, mx = m["repeat"]  # explicit (min, max) tuple
        cond = m.get("condition")
        text_match = m.get("text_match")
        text_value = m.get("text")
        if text_value is not None and text_match is None:
            text_match = meta["text-matching"]
        out.append(
            SpanMatcher(
                kind=m["kind"],
                capture=m.get("capture"),
                field=m.get("field", "text"),
                text_prefix=m.get("text_prefix"),
                min_count=mn,
                max_count=mx,
                condition=tuple(cond) if cond else None,
                text_match=text_match,
                text_value=text_value,
                case_sensitive=bool(m.get("case_sensitive", meta["case-sensitive"])),
            )
        )
    return out


def _text_match(m: SpanMatcher, text: str) -> str | None:
    """matched portion of `text` under the matcher's text mode, or None on
    no match (starts-with/ends-with/exact/regex × case sensitivity,
    readme.txt:360-366). The return value feeds `matched-text`."""
    import re

    value = m.text_value
    t = text
    if not m.case_sensitive:
        t, value = t.lower(), value.lower()
    mode = m.text_match or "starts-with"
    if mode == "starts-with":
        return text[: len(value)] if t.startswith(value) else None
    if mode == "ends-with":
        return text[len(text) - len(value):] if t.endswith(value) else None
    if mode == "exact":
        return text if t == value else None
    if mode == "regex":
        flags = 0 if m.case_sensitive else re.IGNORECASE
        mt = re.search(m.text_value, text, flags)
        return mt.group(0) if mt else None
    raise ValueError(f"unknown text-matching mode {mode!r}")


def _span_matches(span: dict, m: SpanMatcher) -> str | None | bool:
    """False = no match; otherwise the matched text (for matched-text) or
    True when the matcher has no text test."""
    if span["kind"] != m.kind:
        return False
    if m.text_prefix is not None and not (span.get("text") or "").startswith(m.text_prefix):
        return False
    if m.text_value is not None:
        got = _text_match(m, span.get("text") or "")
        if got is None:
            return False
        matched = got
    else:
        matched = True
    if m.condition is not None:
        field, op, value = m.condition
        if not _CONDITION_OPS[op](span.get(field) or "", value):
            return False
    return matched


def _match_matcher(spans, m: SpanMatcher, si: int, adjacent: bool, cont):
    limit = len(spans) if m.max_count is None else m.max_count
    occs: list[tuple[int, object]] = []  # (span index, matched-text or True)
    pos = si
    if adjacent:
        # t:siblings: occurrences must be consecutive from the current spot
        while len(occs) < limit and pos < len(spans):
            got = _span_matches(spans[pos], m)
            if got is False:
                break
            occs.append((pos, got))
            pos += 1
    else:
        while len(occs) < limit and pos < len(spans):
            got = _span_matches(spans[pos], m)
            if got is not False:
                occs.append((pos, got))
            pos += 1
    for take in range(len(occs), m.min_count - 1, -1):
        nxt = (occs[take - 1][0] + 1) if take else si
        rest = cont(nxt)
        if rest is not None:
            mine = []
            if m.capture:
                for p, got in occs[:take]:
                    if m.field == "matched-text":
                        # the text this matcher MATCHED, not the whole span
                        # (changelog:12 — matched-text replaces text())
                        val = got if isinstance(got, str) else (
                            spans[p].get("text") or ""
                        )
                    else:
                        val = spans[p].get(m.field) or ""
                    mine.append((m.capture, val))
            return mine + rest
    return None


def _match_nodes(spans, nodes, si: int, ni: int, adjacent: bool, cont):
    if ni == len(nodes):
        return cont(si)
    node = nodes[ni]

    def k(si2):
        return _match_nodes(spans, nodes, si2, ni + 1, adjacent, cont)

    if isinstance(node, SpanMatcher):
        return _match_matcher(spans, node, si, adjacent, k)
    if isinstance(node, Switch):
        for br in node.branches:
            r = _match_nodes(spans, br, si, 0, adjacent, k)
            if r is not None:
                return r
        return None
    if isinstance(node, Loop):
        def rep(si2, n):
            if node.max_count is None or n < node.max_count:
                def again(s3, si2=si2, n=n):
                    if s3 == si2:  # empty iteration — stop, don't spin
                        return k(s3) if n + 1 >= node.min_count else None
                    return rep(s3, n + 1)

                r = _match_nodes(spans, node.children, si2, 0, adjacent, again)
                if r is not None:
                    return r
            return k(si2) if n >= node.min_count else None

        return rep(si, 0)
    if isinstance(node, Siblings):
        if adjacent:  # nested inside another adjacency group: stay anchored
            return _match_nodes(spans, node.children, si, 0, True, k)
        # the group may START anywhere at-or-after si; adjacency binds
        # only WITHIN the group
        for start in range(si, len(spans) + 1):
            r = _match_nodes(spans, node.children, start, 0, True, k)
            if r is not None:
                return r
        return None
    raise TypeError(f"unknown pattern node {node!r}")  # pragma: no cover


def match_spans(spans: list[dict], matchers: list) -> list[tuple[str, str]] | None:
    """Backtracking subsequence match over the compiled pattern AST;
    returns captured (var, value) pairs in document order, or None when
    the pattern does not match."""
    return _match_nodes(spans, matchers, 0, 0, False, lambda si: [])


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
