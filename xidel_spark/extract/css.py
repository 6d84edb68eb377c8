"""CSS selector compiler → the XPath-lite AST (extract/xpath.py).

The reference accepts CSS 3 selectors via --css / --extract-kind=css /
css("...") (readme.txt:195-196, 282-285). Supported here: selector groups
(','), combinators (descendant space, '>', '+', '~'), type/universal
selectors, '.class', '#id', '[attr]', '[attr=v]' with ~= ^= $= *= |=,
and the structural pseudo-classes :first-child, :last-child,
:nth-child(k). Everything compiles to the same Path/Step AST, so CSS and
XPath share one Catalyst evaluator (and one set of plan guarantees:
no UDF, no shuffle, document-parallel).
"""

from __future__ import annotations

import re

from .xpath import CompiledXPath, Path, Step

_TOK = re.compile(
    r"""(?:
        (?P<ws>\s+)
      | (?P<comb>[>+~])
      | (?P<comma>,)
      | (?P<name>[a-zA-Z_][\w-]*)
      | (?P<star>\*)
      | (?P<cls>\.[a-zA-Z_][\w-]*)
      | (?P<id>\#[a-zA-Z_][\w-]*)
      | (?P<attr>\[\s*[a-zA-Z_][\w-]*\s*(?:[~^$*|]?=\s*(?:'[^']*'|"[^"]*"|[^\]\s]+))?\s*\])
      | (?P<pseudo>:[a-zA-Z-]+(?:\(\s*\d+\s*\))?)
    )""",
    re.VERBOSE,
)

_ATTR = re.compile(
    r"\[\s*(?P<name>[a-zA-Z_][\w-]*)\s*(?:(?P<op>[~^$*|]?=)\s*(?P<val>'[^']*'|\"[^\"]*\"|[^\]\s]+))?\s*\]"
)

_COMBINATOR_AXIS = {
    " ": "descendant",
    ">": "child",
    "+": "adjacent-sibling",
    "~": "following-sibling",
}


def _attr_pred(tok: str):
    m = _ATTR.fullmatch(tok)
    if not m:
        raise ValueError(f"css: bad attribute selector {tok!r}")
    name, op, val = m.group("name"), m.group("op"), m.group("val")
    if op is None:
        return ("attr-exists", name)
    if val and val[0] in "'\"":
        val = val[1:-1]
    if op == "=":
        return ("attr-cmp", name, "=", val)
    if op == "~=":
        # whitespace-separated word match (class semantics)
        return ("fn", "word", "@" + name, val)
    if op == "^=":
        return ("fn", "starts-with", "@" + name, val)
    if op == "$=":
        return ("fn", "ends-with", "@" + name, val)
    if op == "*=":
        return ("fn", "contains", "@" + name, val)
    if op == "|=":
        return ("fn", "lang-prefix", "@" + name, val)
    raise ValueError(f"css: unsupported attr op {op!r}")


def _pseudo_pred(tok: str):
    if tok == ":first-child":
        return ("nth-child", 1)
    if tok == ":last-child":
        return ("last-child",)
    m = re.fullmatch(r":nth-child\(\s*(\d+)\s*\)", tok)
    if m:
        return ("nth-child", int(m.group(1)))
    raise ValueError(f"css: unsupported pseudo-class {tok!r}")


def parse_css(selector: str) -> list[Path]:
    paths: list[Path] = []
    for group in _split_groups(selector):
        steps: list[Step] = []
        axis = "descendant"  # CSS matches anywhere under the document root
        cur: Step | None = None
        i = 0
        pending_ws = False
        while i < len(group):
            m = _TOK.match(group, i)
            if not m:
                raise ValueError(f"css: cannot tokenize at {group[i:]!r}")
            i = m.end()
            kind = m.lastgroup
            tok = m.group(kind)
            if kind == "ws":
                pending_ws = True
                continue
            if kind == "comb":
                if cur is None:
                    raise ValueError(f"css: dangling combinator in {group!r}")
                steps.append(cur)
                cur = None
                axis = _COMBINATOR_AXIS[tok]
                pending_ws = False
                continue
            if kind in ("name", "star"):
                if cur is not None:
                    if not pending_ws:
                        raise ValueError(f"css: unexpected type selector in {group!r}")
                    steps.append(cur)
                    axis = "descendant"
                cur = Step(axis, "*" if kind == "star" else tok, [])
                pending_ws = False
                continue
            # simple-selector suffixes; a leading '.x'/'#x' implies '*'
            if cur is None or pending_ws:
                if cur is not None:
                    steps.append(cur)
                    axis = "descendant"
                cur = Step(axis, "*", [])
            pending_ws = False
            if kind == "cls":
                cur.preds.append(("fn", "word", "@class", tok[1:]))
            elif kind == "id":
                cur.preds.append(("attr-cmp", "id", "=", tok[1:]))
            elif kind == "attr":
                cur.preds.append(_attr_pred(tok))
            elif kind == "pseudo":
                cur.preds.append(_pseudo_pred(tok))
        if cur is None:
            raise ValueError(f"css: empty selector in {selector!r}")
        steps.append(cur)
        paths.append(Path(steps=steps))
    return paths


def _split_groups(selector: str) -> list[str]:
    """split on top-level commas (no nesting in the supported grammar —
    attribute values are the only place a comma could hide)."""
    out, depth, cur = [], 0, []
    for ch in selector:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return [g for g in out if g]


def compile_css(selector: str) -> CompiledXPath:
    return CompiledXPath(parse_css(selector), selector)
