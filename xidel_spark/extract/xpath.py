"""XPath-lite compiler: location paths → Catalyst higher-order expressions.

Covers the reference's daily selector surface (readme.txt:120-196,
tests/tests.sh:594-596): absolute/relative paths, '//' descent, the axes
child / descendant(-or-self) / self / parent / ancestor(-or-self) /
following-sibling / preceding-sibling / following / preceding / attribute,
node tests (name, '*', text(), node()), and predicates — positional
([2], [last()], [last()-1], [position() op n]), attribute ([@x],
[@x='v'], [@x!='v']), string tests ([.='v'], [text()='v'],
[contains(@x,'v')], [starts-with(...)], [ends-with(...)]) and relative-path
existence ([b/c]). Unions with '|'.

Compilation strategy (the Spark-first part): a compiled path is a pure
column transform over the per-document node array (extract/nodes.py).
Context node-sets are array<int> of node ids; one axis step is

    flatten(transform(ctx, c -> filter(nodes, n -> axis ∧ test)))

— document-order by construction (ids are pre-order), deduped with
array_distinct + array_sort. Everything stays inside whole-stage codegen:
no Python, no UDF, no shuffle, no explode until the caller asks for rows.
The reference's tree axes map to integer algebra because every node carries
its ancestor-id array: descendant:: is array_contains(n.anc, c.id),
following-sibling:: is (n.parent == c.parent) ∧ (n.id > c.id), etc.

Not covered here (and routed elsewhere or raising ValueError): full XQuery
expressions (FLWOR lives in queries_fn.py), pattern templates
(extract/patterns.py), arbitrary function calls.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

FORWARD_AXES = {
    "child", "descendant", "descendant-or-self", "self",
    "following-sibling", "adjacent-sibling", "following",
}
REVERSE_AXES = {"parent", "ancestor", "ancestor-or-self", "preceding-sibling", "preceding"}
AXES = FORWARD_AXES | REVERSE_AXES


@dataclass
class Step:
    axis: str                 # one of AXES
    test: str                 # tag name | '*' | '#text' | 'node()'
    preds: list = field(default_factory=list)


@dataclass
class Path:
    steps: list[Step]
    attr: str | None = None   # trailing /@name
    # absolute and relative paths both evaluate from the #doc root at the
    # document level; relative paths inside predicates evaluate from the
    # predicate's context node.


# predicates are tuples:
#   ('pos', k)                    [k]          1-based slice
#   ('last', n)                   [last()-n]
#   ('poscmp', op, k)             [position() op k]
#   ('attr-exists', name)
#   ('attr-cmp', name, op, value) op in {'=', '!='}
#   ('str-cmp', source, op, value) source in {'.', 'text()'}
#   ('fn', fname, arg, value)     fname in {contains, starts-with, ends-with},
#                                 arg ('@name' | '.' | 'text()')
#   ('path', Path)                existence
#   ('nth-child', k)              CSS :nth-child / :first-child
#   ('last-child',)               CSS :last-child


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], src: str):
        self.toks = tokens
        self.i = 0
        self.src = src

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"xpath parse error in {self.src!r}: expected {val or kind}, got {v!r}")
        return v

    # path := ('/' | '//')? step (('/' | '//') step)*  [ '/@' name ]
    def parse_path(self) -> Path:
        steps: list[Step] = []
        attr: str | None = None
        k, _ = self.peek()
        pending_axis = None
        if k == "dslash":
            self.next()
            pending_axis = "descendant"
        elif k == "slash":
            self.next()
            pending_axis = "child"
        else:
            pending_axis = "child"  # relative
        while True:
            k, v = self.peek()
            if k == "sym" and v == "@":
                self.next()
                attr = self.expect("name")
                break
            if k is None or (k == "sym" and v in ("]", ")", ",", "|")) or k == "op":
                break
            if k == "name" and v == "css" and self.peek(1) == ("sym", "("):
                # css("sel") step — combine CSS and XPath in one path, the
                # reference's pxp:css bridge (readme.txt:195-196): the CSS
                # selector's steps splice in relative to the current context
                self.next(); self.next()
                sel = self._string()
                self.expect("sym", ")")
                from .css import parse_css

                groups = parse_css(sel)
                if len(groups) != 1:
                    raise ValueError(
                        f"css() inside a path supports a single selector, got {sel!r}"
                    )
                steps.extend(groups[0].steps)
                k, v = self.peek()
                if k == "dslash":
                    self.next()
                    pending_axis = "descendant"
                elif k == "slash":
                    self.next()
                    pending_axis = "child"
                else:
                    break
                continue
            step = self.parse_step(pending_axis)
            if step.axis == "descendant" and pending_axis == "descendant" and any(
                p[0] in ("pos", "last", "poscmp") for p in step.preds
            ):
                # '//x[k]' abbreviates descendant-or-self::node()/child::x[k]
                # — the positional predicate counts PER PARENT, not globally
                # (descendant::x[k] would). Expand to two steps.
                steps.append(Step("descendant-or-self", "node()", []))
                step = Step("child", step.test, step.preds)
            steps.append(step)
            k, v = self.peek()
            if k == "dslash":
                self.next()
                pending_axis = "descendant"
            elif k == "slash":
                self.next()
                pending_axis = "child"
            else:
                break
        if not steps and attr is None:
            raise ValueError(f"xpath: empty path in {self.src!r}")
        return Path(steps=steps, attr=attr)

    def parse_step(self, default_axis: str) -> Step:
        k, v = self.peek()
        axis = default_axis
        if k == "sym" and v == "(":
            # parenthesized path step — 'a/(text())' keeps the inner step's
            # semantics under the surrounding axis (golden regression_text1c)
            self.next()
            inner = self.parse_step(default_axis)
            self.expect("sym", ")")
            return inner
        if k == "dotdot":
            self.next()
            return Step("parent", "node()", self._parse_preds())
        if k == "sym" and v == ".":
            # '.' only appears as sym via name regex miss — handled below
            self.next()
            return Step("self", "node()", self._parse_preds())
        if k == "axis":
            self.next()
            axis = v[:-2]
            if axis not in AXES and axis != "attribute":
                raise ValueError(f"xpath: unsupported axis {axis!r}")
            if default_axis == "descendant" and axis != "descendant":
                # '//axis::x' == descendant-or-self::node()/axis::x; for the
                # supported axes this only differs for self/child — expand:
                if axis == "child":
                    axis = "descendant"
                elif axis == "self":
                    axis = "descendant-or-self"
        k, v = self.peek()
        if k == "func":
            self.next()
            name = v[:-2]
            if name == "text":
                test = "#text"
            elif name == "node":
                test = "node()"
            else:
                raise ValueError(f"xpath: unsupported node test {v!r}")
        elif k == "sym" and v == "*":
            self.next()
            test = "*"
        elif k == "name":
            self.next()
            test = v
        else:
            raise ValueError(f"xpath parse error in {self.src!r}: expected node test, got {v!r}")
        return Step(axis, test, self._parse_preds())

    def _parse_preds(self) -> list:
        preds = []
        while True:
            k, v = self.peek()
            if not (k == "sym" and v == "["):
                return preds
            self.next()
            preds.append(self._parse_pred())
            self.expect("sym", "]")

    def _parse_pred(self):
        start = self.i
        try:
            out = self._parse_pred_fixed()
            if self.peek() == ("sym", "]"):  # fixed form must consume fully
                return out
        except ValueError:
            pass
        # general expression predicate (round 3): anything the fixed
        # vocabulary doesn't cover — arithmetic, comparisons, function
        # calls, position()/last() math — compiles through the expression
        # language (exprlang) with the node as the context item
        self.i = start
        from ..exprlang.parser import ExprParser

        p = ExprParser.__new__(ExprParser)
        p.src = self.src
        p.toks = self.toks
        p.i = self.i
        ast = p.parse_sub()
        self.i = p.i
        if self.peek() != ("sym", "]"):
            raise ValueError(
                f"xpath: cannot parse predicate in {self.src!r} at {self.toks[self.i:]!r}"
            )
        return ("expr", ast)

    def _parse_pred_fixed(self):
        k, v = self.peek()
        if k == "num" and self.peek(1) == ("sym", "]") and v.isdigit():
            self.next()
            return ("pos", int(v))
        if k == "func" and v == "last()":
            self.next()
            if self.peek() == ("sym", "-"):
                self.next()
                n = int(self.expect("num"))
                return ("last", n)
            return ("last", 0)
        if k == "func" and v == "position()":
            self.next()
            op = self.expect("op")
            n = int(self.expect("num"))
            return ("poscmp", op, n)
        if k == "sym" and v == "@":
            self.next()
            name = self.expect("name")
            k2, v2 = self.peek()
            if k2 == "op" and v2 in ("=", "!="):
                self.next()
                val = self._string()
                return ("attr-cmp", name, v2, val)
            return ("attr-exists", name)
        if (k == "func" and v == "text()") or (k == "sym" and v == "."):
            src = "text()" if k == "func" else "."
            self.next()
            op = self.expect("op")
            if op not in ("=", "!="):  # ordered string tests → expression path
                raise ValueError(f"xpath: {op!r} string test routes to exprlang")
            val = self._string()
            return ("str-cmp", src, op, val)
        if k == "name" and v in ("contains", "starts-with", "ends-with"):
            nk, nv = self.peek(1)
            if nk == "sym" and nv == "(":
                self.next()
                self.next()
                arg = self._fn_arg()
                self.expect("sym", ",")
                val = self._string()
                self.expect("sym", ")")
                return ("fn", v, arg, val)
        # relative path existence — only when the whole predicate IS a path
        sub = self.parse_path()
        if self.peek() != ("sym", "]"):
            raise ValueError(f"xpath: predicate is not a bare path in {self.src!r}")
        return ("path", sub)

    def _fn_arg(self):
        k, v = self.peek()
        if k == "sym" and v == "@":
            self.next()
            return "@" + self.expect("name")
        if k == "func" and v == "text()":
            self.next()
            return "text()"
        if k == "sym" and v == ".":
            self.next()
            return "."
        raise ValueError(f"xpath: unsupported function arg in {self.src!r}")

    def _string(self) -> str:
        k, v = self.next()
        if k != "str":
            raise ValueError(f"xpath parse error in {self.src!r}: expected string literal")
        return v[1:-1]


def parse_xpath(expr: str) -> list[Path]:
    """Parse an XPath-lite expression into a union of Paths."""
    p = _Parser(_retok(expr), expr)
    paths = [p.parse_path()]
    while p.peek() == ("sym", "|"):
        p.next()
        paths.append(p.parse_path())
    if p.peek()[0] is not None:
        raise ValueError(f"xpath: trailing tokens in {expr!r}: {p.toks[p.i:]!r}")
    return paths


_TOKEN2 = re.compile(
    r"""\s*(?:
        (?P<dslash>//)
      | (?P<slash>/)
      | (?P<axis>[a-zA-Z][\w-]*::)
      | (?P<func>[a-zA-Z][\w-]*\s*\(\s*\))
      | (?P<name>[a-zA-Z_][\w-]*)
      | (?P<num>\d+)
      | (?P<str>'[^']*'|"[^"]*")
      | (?P<dotdot>\.\.)
      | (?P<op><=|>=|!=|=|<|>)
      | (?P<minus>-)
      | (?P<sym>[@\[\]().,*|])
    )""",
    re.VERBOSE,
)


def _retok(s: str) -> list[tuple[str, str]]:
    """Tokenize with the expression language's superset tokenizer — same
    kinds for all path syntax, plus the tokens general predicates need
    ('+', decimals, $vars, '||'); the legacy regex remains as a fallback
    for inputs the richer grammar can't lex."""
    try:
        from ..exprlang.parser import tokenize

        return tokenize(s)
    except ValueError:
        pass
    out, i = [], 0
    while i < len(s):
        if s[i:].strip() == "":
            break
        m = _TOKEN2.match(s, i)
        if not m:
            raise ValueError(f"xpath: cannot tokenize at {s[i:]!r}")
        i = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "func":
            val = re.sub(r"\s+", "", val)
        if kind == "minus":
            kind, val = "sym", "-"
        out.append((kind, val))
    return out


# ---------------------------------------------------------------------------
# Catalyst compiler
# ---------------------------------------------------------------------------


def _attr(n, name: str) -> Column:
    return F.try_element_at(n["attrs"], F.lit(name))


def _axis_cond(axis: str, n, c) -> Column:
    if axis == "child":
        return n["parent"] == c["id"]
    if axis == "descendant":
        return F.array_contains(n["anc"], c["id"])
    if axis == "descendant-or-self":
        return F.array_contains(n["anc"], c["id"]) | (n["id"] == c["id"])
    if axis == "self":
        return n["id"] == c["id"]
    if axis == "parent":
        return n["id"] == c["parent"]
    if axis == "ancestor":
        return F.array_contains(c["anc"], n["id"])
    if axis == "ancestor-or-self":
        return F.array_contains(c["anc"], n["id"]) | (n["id"] == c["id"])
    if axis == "following-sibling":
        return (n["parent"] == c["parent"]) & (n["id"] > c["id"])
    if axis == "adjacent-sibling":  # CSS '+': next ELEMENT sibling
        return (n["parent"] == c["parent"]) & (n["pos"] == c["pos"] + 1) & (n["pos"] > 0)
    if axis == "preceding-sibling":
        return (n["parent"] == c["parent"]) & (n["id"] < c["id"])
    if axis == "following":
        return (n["id"] > c["id"]) & ~F.array_contains(n["anc"], c["id"])
    if axis == "preceding":
        return (n["id"] < c["id"]) & ~F.array_contains(c["anc"], n["id"])
    raise ValueError(f"unsupported axis {axis!r}")


def _test_cond(test: str, n) -> Column:
    if test == "*":
        return ~n["tag"].startswith("#")
    if test == "#text":
        return n["tag"] == "#text"
    if test == "node()":
        # any real node INCLUDING the #doc root (descendant-or-self::node()
        # in the '//x[k]' expansion must pass through the document node);
        # only the '#skip' placeholder is invisible
        return n["tag"] != "#skip"
    return n["tag"] == F.lit(test)


def _cmp(col: Column, op: str, value: str) -> Column:
    lit = F.lit(value)
    if op == "=":
        return col == lit
    if op == "!=":
        return col.isNotNull() & (col != lit)
    raise ValueError(f"unsupported comparison {op!r}")


def _node_pred(pred, nodes: Column, n) -> Column | None:
    """Predicates testable per node (no position in the axis result)."""
    kind = pred[0]
    if kind == "attr-exists":
        return _attr(n, pred[1]).isNotNull()
    if kind == "attr-cmp":
        return _cmp(_attr(n, pred[1]), pred[2], pred[3])
    if kind == "str-cmp":
        src = _text_of(nodes, n) if pred[1] == "text()" else n["text"]
        return _cmp(src, pred[2], pred[3])
    if kind == "fn":
        _, fname, arg, value = pred
        if arg.startswith("@"):
            col = _attr(n, arg[1:])
        elif arg == "text()":
            col = _text_of(nodes, n)
        else:
            col = n["text"]
        if fname == "contains":
            return col.contains(value)
        if fname == "starts-with":
            return col.startswith(value)
        if fname == "ends-with":
            return col.endswith(value)
        if fname == "word":  # CSS ~= / .class: whitespace-separated word
            return F.array_contains(F.split(col, r"\s+"), value)
        if fname == "lang-prefix":  # CSS |=
            return (col == F.lit(value)) | col.startswith(value + "-")
    if kind == "path":
        sub: Path = pred[1]
        return F.size(_eval_steps(nodes, F.array(n["id"]), sub)) > 0
    if kind == "nth-child":
        return n["pos"] == F.lit(pred[1])
    if kind == "last-child":
        return F.size(
            F.filter(
                nodes,
                lambda m: (m["parent"] == n["parent"]) & (m["pos"] > n["pos"]),
            )
        ) == 0
    return None


def _text_of(nodes: Column, n) -> Column:
    """string of the node's first '#text' child (predicate text() tests)."""
    kids = F.filter(nodes, lambda m: (m["parent"] == n["id"]) & (m["tag"] == "#text"))
    # the extraction index must be a Column (PySpark's try_element_at
    # wrapper rejects a bare int)
    return F.try_element_at(kids, F.lit(1))["text"]


def _positional(pred, matched: Column) -> Column:
    kind = pred[0]
    if kind == "pos":
        return F.slice(matched, pred[1], 1)
    if kind == "last":
        n = pred[1]
        start = F.size(matched) - n
        return F.when(start >= 1, F.slice(matched, start, 1)).otherwise(
            F.array().cast(matched_type())
        )
    if kind == "poscmp":
        _, op, k = pred
        ops = {
            "=": lambda i: i == k, "!=": lambda i: i != k,
            "<": lambda i: i < k, "<=": lambda i: i <= k,
            ">": lambda i: i > k, ">=": lambda i: i >= k,
        }
        return F.filter(matched, lambda m, i: ops[op](i + 1))
    raise ValueError(f"not positional: {pred!r}")


def matched_type() -> str:
    from .nodes import NODE_FIELDS

    return f"array<{NODE_FIELDS.simpleString()}>"


def _apply_step(nodes: Column, ctx_ids: Column, step: Step) -> Column:
    node_preds = []
    list_preds = []
    for p in step.preds:
        if p[0] in ("pos", "last", "poscmp"):
            list_preds.append(("positional", p))
        else:
            list_preds.append(("node", p))
    # predicate order matters ([@x][2] != [2][@x]) → apply strictly in order
    def per_ctx(c_id):
        c = F.element_at(nodes, c_id + 1)
        matched = F.filter(
            nodes, lambda n: _axis_cond(step.axis, n, c) & _test_cond(step.test, n)
        )
        if step.axis in REVERSE_AXES:
            matched = F.reverse(matched)  # axis order for positional preds
        # NB: bind the predicate via a closure factory — a default-arg lambda
        # (lambda n, p=p: ...) would be seen as a 2-parameter HOF lambda and
        # receive the ARRAY INDEX as its second argument
        def pred_filter(p):
            return lambda n: _node_pred(p, nodes, n)

        def expr_filter(matched, ast):
            # general expression predicate (exprlang): context item = the
            # node, position()/last() bound from the filtered axis result;
            # a numeric result is a position test (XPath §3.2.1)
            from ..exprlang.compiler import NUM_KINDS, Compiler, TV

            size = F.size(matched)

            def fn(n, i):
                comp = Compiler(
                    env=None, nodes=nodes,
                    ctx=TV(F.array(n["id"]), "nodes"),
                    pos=i + 1, size=size,
                )
                tv = comp.compile(ast)
                if tv.kind in NUM_KINDS:
                    return (i + 1).cast("double") == comp.to_number(tv)
                return comp.ebv(tv)

            return F.filter(matched, fn)

        for tag, p in list_preds:
            if tag == "positional":
                matched = _positional(p, matched)
            elif p[0] == "expr":
                matched = expr_filter(matched, p[1])
            else:
                matched = F.filter(matched, pred_filter(p))
        return F.transform(matched, lambda n: n["id"])

    return F.array_sort(F.array_distinct(F.flatten(F.transform(ctx_ids, per_ctx))))


def _eval_steps(nodes: Column, ctx_ids: Column, path: Path) -> Column:
    ids = ctx_ids
    for step in path.steps:
        ids = _apply_step(nodes, ids, step)
    return ids


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


class CompiledXPath:
    """A compiled union of location paths, evaluable against a node array."""

    def __init__(self, paths: list[Path], source: str):
        self.paths = paths
        self.source = source
        attrs = {p.attr for p in paths}
        if len(attrs) > 1:
            raise ValueError(f"mixed element/attribute union unsupported: {source!r}")
        self.attr = attrs.pop()
        self.yields_text = all(
            p.steps and p.steps[-1].test == "#text" for p in paths
        ) and self.attr is None

    def ids(self, nodes: Column) -> Column:
        """array<int> of matched node ids in document order."""
        root = F.array(F.lit(0).cast("int"))
        out = None
        for p in self.paths:
            ids = _eval_steps(nodes, root, p)
            out = ids if out is None else F.concat(out, ids)
        if len(self.paths) > 1:
            out = F.array_sort(F.array_distinct(out))
        return out

    def values(self, nodes: Column) -> Column:
        """array<string>: @attr values, text() text, or element string-values
        (what the reference prints for -e)."""
        ids = self.ids(nodes)
        if self.attr is not None:
            attr = self.attr
            vals = F.transform(
                ids, lambda i: F.try_element_at(F.element_at(nodes, i + 1)["attrs"], F.lit(attr))
            )
            return F.filter(vals, lambda v: v.isNotNull())
        return F.transform(ids, lambda i: F.element_at(nodes, i + 1)["text"])

    def nodes_result(self, nodes: Column) -> Column:
        """array<node struct> of the matched elements."""
        return F.transform(self.ids(nodes), lambda i: F.element_at(nodes, i + 1))


def compile_xpath(expr: str) -> CompiledXPath:
    return CompiledXPath(parse_xpath(expr), expr)
