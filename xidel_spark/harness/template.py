"""Pattern-template matching over parsed node trees.

The reference's template engine matches an annotated HTML/XML template
against a document: elements match same-named elements anywhere below the
current position (loose subsequence matching in document order),
`{expr}` in text position captures a value with the matched element as
context, `{var := expr}` / `{$var}` capture under a name, and a
`*` / `+` / `?` marker after an element repeats it
(readme.txt:289-392; xidelbase.pas:2559-2565 invokes the engine).

The distributed counterpart is extract/patterns.py (span-sequence
matchers inside mapInPandas); this module is the node-tree variant the
golden harness uses for single documents, sharing the same loose-match /
greedy-repetition semantics. Matching is structural only — captures are
returned as (name, expr, node_id) triples for the caller to evaluate
through the expression compiler (exprlang), so the VALUES still come out
of the same Catalyst evaluation path as everything else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CAPTURE = re.compile(r"\{([^{}]*)\}")
_REPEAT = {"*": (0, None), "+": (1, None), "?": (0, 1)}


@dataclass
class TElem:
    tag: str
    attrs: dict[str, str]
    captures: list[tuple[str | None, str]] = field(default_factory=list)
    text_conds: list[str] = field(default_factory=list)
    children: list["TElem"] = field(default_factory=list)
    repeat: tuple[int, int | None] = (1, 1)


def _parse_capture(body: str) -> tuple[str | None, str]:
    """'{x := expr}' → (x, expr); '{$x}' → (x, '.'); '{expr}' → (None, expr)."""
    b = body.strip()
    m = re.match(r"^([A-Za-z_][\w-]*)\s*:=\s*(.*)$", b, re.S)
    if m:
        return m.group(1), m.group(2)
    m = re.fullmatch(r"\$([A-Za-z_][\w-]*)", b)
    if m:
        return m.group(1), "."
    return None, b


def parse_template(tmpl: str) -> list[TElem]:
    """template markup → matcher list (may have several roots and
    trailing repeat markers between them)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(f'<__t__ xmlns:t="t" xmlns:template="t">{tmpl}</__t__>')
    except ET.ParseError as e:
        raise ValueError(f"template parse: {e}") from None

    def conv(el) -> TElem:
        t = TElem(tag=el.tag, attrs=dict(el.attrib))
        if el.text and el.text.strip():
            _split_text(el.text, t)
        for child in el:
            ctag = child.tag
            if isinstance(ctag, str) and ctag.startswith("{t}"):
                # template-namespace instruction: <t:read var=V source=E/>
                # captures on the ENCLOSING element (regression_multipage2)
                local = ctag[3:]
                if local == "read":
                    t.captures.append(
                        (child.attrib.get("var"), child.attrib.get("source", "."))
                    )
                    continue
                raise ValueError(f"template: unsupported t:{local}")
            c = conv(child)
            if child.tail and child.tail.strip():
                tail = child.tail.strip()
                if tail[0] in _REPEAT:
                    c.repeat = _REPEAT[tail[0]]
                    tail = tail[1:].strip()
                if tail:
                    _split_text(tail, t)
            t.children.append(c)
        return t

    def _split_text(text: str, into: TElem) -> None:
        pos = 0
        for m in _CAPTURE.finditer(text):
            lit = text[pos : m.start()].strip()
            if lit:
                into.text_conds.append(lit)
            into.captures.append(_parse_capture(m.group(1)))
            pos = m.end()
        lit = text[pos:].strip()
        if lit:
            into.text_conds.append(lit)

    top = conv(root)
    # repeat markers between top-level roots land in top's text handling —
    # redo: markers attach in conv via tails, so just return children
    return top.children


def _subtree_end(nodes: list[dict], k: int) -> int:
    """index just past node k's subtree in the pre-order list."""
    j = k + 1
    while j < len(nodes) and k in nodes[j]["anc"]:
        j += 1
    return j


def _attrs_match(tattrs: dict[str, str], nattrs: dict[str, str]) -> bool:
    for a, v in tattrs.items():
        if a.startswith("t:") or a.startswith("{t}"):
            continue  # template-control attributes: not structural
        if nattrs.get(a) != v:
            return False
    return True


def _direct_text(nodes: list[dict], k: int) -> str:
    out = []
    for j in range(k + 1, _subtree_end(nodes, k)):
        n = nodes[j]
        if n["tag"] == "#text" and n["parent"] == k:
            out.append(n["text"] or "")
    return "".join(out)


def _elem_match(tm: TElem, nodes: list[dict], k: int) -> list | None:
    n = nodes[k]
    if n["tag"].startswith("#") or n["tag"].lower() != tm.tag.lower():
        return None
    if not _attrs_match(tm.attrs, n["attrs"]):
        return None
    if tm.text_conds:
        txt = _direct_text(nodes, k)
        for cond in tm.text_conds:
            if not txt.strip().startswith(cond):
                return None
    out: list[tuple[str | None, str, int]] = []
    if tm.children:
        sub = match_seq(tm.children, nodes, k + 1, _subtree_end(nodes, k))
        if sub is None:
            return None
        out.extend(sub)
    out.extend((name, expr, k) for name, expr in tm.captures)
    return out


def match_seq(
    tmpl: list[TElem], nodes: list[dict], lo: int, hi: int
) -> list[tuple[str | None, str, int]] | None:
    """loose in-order matching of the template element sequence against the
    pre-order node range [lo, hi); greedy repetition. Returns the ordered
    capture list or None when a required matcher finds no hit."""
    out: list[tuple[str | None, str, int]] = []
    i = lo
    for tm in tmpl:
        mn, mx = tm.repeat
        count = 0
        while mx is None or count < mx:
            hit = None
            j = i
            while j < hi:
                got = _elem_match(tm, nodes, j)
                if got is not None:
                    hit = (j, got)
                    break
                j += 1
            if hit is None:
                break
            out.extend(hit[1])
            i = _subtree_end(nodes, hit[0])
            count += 1
        if count < mn:
            return None
    return out


def match_template(tmpl_src: str, nodes: list[dict]) -> list[tuple[str | None, str, int]] | None:
    return match_seq(parse_template(tmpl_src), nodes, 0, len(nodes))
