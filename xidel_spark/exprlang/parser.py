"""Expression-language parser: the reference's `-e` string surface beyond
location paths (readme.txt:120-196; tests/tests.sh:423-452).

Grammar (XPath 3.0 subset + xidel extensions), lowest to highest binding:

    or > and > comparison (= != < <= > >= eq ne lt le gt ge)
    > || (string concat) > to (range) > + - > * div idiv mod
    > unary -/+ > cast as > | (node union) > postfix ([pred], /path)
    > primary

Primaries: numeric/string literals, x"..{..}.." extended strings, $var,
'.', '(' sequence ')', if/then/else, let/for..return (FLWOR core),
some/every..satisfies, function calls (resolved late through
ModuleRegistry), JSONiq true/false/null words, and location paths — paths
reuse extract.xpath's parser verbatim, so everything the selector engine
accepts embeds unchanged (css() bridging included).

FLWOR order-by, group-by/count (single-for forms), and tumbling/sliding
window clauses all parse in-string and compile to pure Catalyst; the
distributed multi-for shapes route through the library operators
(queries_fn.py / queries_ext.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..extract.xpath import Path, Step, _Parser

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: object
    kind: str  # 'long' | 'double' | 'string' | 'bool' | 'null'


@dataclass
class VarRef:
    name: str


@dataclass
class Assign:
    """xidel's `$var := value` / `var := value` extension (readme.txt:
    131-135): records the variable AND evaluates to the assigned value;
    later items in the same sequence see the binding."""
    name: str
    value: object


@dataclass
class ContextItem:
    pass


@dataclass
class SeqExpr:
    items: list


@dataclass
class ArrayLit(SeqExpr):
    """JSONiq array [v, ...] — value-space is the seq model, but the item
    keeps its JSON serialization identity (adhoc-json goldens)."""


@dataclass
class RangeExpr:
    lo: object
    hi: object


@dataclass
class BinOp:
    op: str  # '+','-','*','div','idiv','mod','and','or','||','=','!=','<','<=','>','>=','eq','ne','lt','le','gt','ge','|'
    left: object
    right: object


@dataclass
class UnaryOp:
    op: str
    expr: object


@dataclass
class IfExpr:
    cond: object
    then: object
    els: object


@dataclass
class Flwor:
    clauses: list  # [('let'|'for', varname, expr), ...]
    where: object | None
    ret: object
    order_by: tuple | None = None  # (key_expr, descending: bool)
    group_by: list | None = None  # grouping variable names
    count_var: str | None = None  # 'count $c' positional binding


@dataclass
class TryCatch:
    """try { E } catch * { H } — H sees $__err_code (the rewritten
    $Q{..xqt-errors..}code braced-URI variable). `errors` carries a named
    catch spec ('file:out-of-range') when given instead of '*'."""
    expr: object
    handler: object
    errors: str | None = None


@dataclass
class WindowExpr:
    """for tumbling|sliding window $v in SRC start when C [end when C]
    return BODY (XQuery 3.0 window clause; tests.sh:441-442)."""
    mode: str
    var: str
    src: object
    start: object
    end: object | None
    ret: object


@dataclass
class Quant:
    mode: str  # 'some' | 'every'
    clauses: list  # [(varname, expr), ...]
    cond: object


@dataclass
class Call:
    qname: str
    args: list


@dataclass
class PathRoot:
    path: Path


@dataclass
class PathApply:
    base: object
    path: Path


@dataclass
class FilterExpr:
    base: object
    preds: list = field(default_factory=list)


@dataclass
class XString:
    parts: list  # str | AST


@dataclass
class CastAs:
    expr: object
    type_qname: str


@dataclass
class Arrow:
    """a => f(b, c) ≡ f(a, b, c) (XPath 3.1 arrow operator)."""
    base: object
    qname: str
    args: list


@dataclass
class SimpleMap:
    """a ! expr (XPath 3.1 simple map): expr per item, '.' bound."""
    src: object
    body: object


@dataclass
class Otherwise:
    """A otherwise B (XPath 4.0): A when non-empty, else B."""
    left: object
    right: object


@dataclass
class MapLit:
    """JSONiq object {"k": v, ...} (readme.txt:142-152)."""
    pairs: list  # [(key_ast, value_ast)]


@dataclass
class Lookup:
    """$m?key / $m?1 / $m?* / $m("key") / $m.key — map/array lookup."""
    base: object
    key: object  # str | int | '*' | AST
    dot: bool = False  # came from the proprietary '.prop' syntax


@dataclass
class CastableAs:
    expr: object
    type_qname: str


@dataclass
class ElemCtor:
    """computed element constructor: element NAME { content } — the
    constructed value SERIALIZES (kind 'xmlstr'); path navigation over
    constructed nodes is out of scope (would need a re-parse)."""
    name: str
    attrs: list   # [AttrCtor]
    content: list  # non-attribute content items (AST)


@dataclass
class AttrCtor:
    name: str
    value: object


@dataclass
class TextCtor:
    value: object


@dataclass
class FuncDecl:
    """declare function local:name($p1, $p2) { body };"""
    qname: str
    params: list  # param names
    body: object


@dataclass
class LocalCall:
    qname: str
    args: list


@dataclass
class InstanceOf:
    expr: object
    type_qname: str
    occurrence: str  # '' | '?' | '*' | '+'


# ---------------------------------------------------------------------------
# tokenizer — a superset of extract.xpath's token stream, same kinds, so
# the path parser consumes slices of it directly
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<xstr>x"(?:[^"]|"")*"|x'(?:[^']|'')*')
      | (?P<dslash>//)
      | (?P<dcolonassign>:=)
      | (?P<axis>[a-zA-Z][\w-]*::)
      | (?P<func>[a-zA-Z][\w-]*(?::[a-zA-Z][\w.-]*)?\s*\(\s*\))
      | (?P<qname>[a-zA-Z_][\w-]*:[a-zA-Z_][\w.-]*)
      | (?P<name>[a-zA-Z_][\w-]*)
      | (?P<var>\$[a-zA-Z_][\w-]*(?::[a-zA-Z_][\w-]*)?)
      | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*'|"(?:[^"]|"")*")
      | (?P<dotdot>\.\.)
      | (?P<dbar>\|\|)
      | (?P<arrow>=>)
      | (?P<slash>/)
      | (?P<op><=|>=|!=|=|<|>|\+)
      | (?P<minus>-)
      | (?P<bang>!)
      | (?P<semi>;)
      | (?P<colon>:)
      | (?P<sym>[@\[\]().,*|{}?])
    )""",
    re.VERBOSE,
)

# keyword names that act as binary operators when seen in operator position
_CMP_WORDS = {"eq", "ne", "lt", "le", "gt", "ge"}
_MUL_WORDS = {"div", "idiv", "mod"}

# reserved words that can never be function CALLS — 'in ()' must lex as
# the keyword followed by an empty sequence, not a func token 'in()'
_RESERVED_NONFUNC = {
    "in", "return", "then", "else", "satisfies", "where", "to", "and", "or",
    "div", "idiv", "mod", "cast", "castable", "as", "otherwise", "let",
    "for", "some", "every", "order", "by", "descending", "ascending",
    "group", "instance", "treat",
} | _CMP_WORDS


def tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        if s[i:].strip() == "":
            break
        m = _TOKEN.match(s, i)
        if not m:
            raise ValueError(f"expr: cannot tokenize at {s[i:]!r}")
        i = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "func":
            val = re.sub(r"\s+", "", val)
            name = val[:-2]
            if name in _RESERVED_NONFUNC:
                # 'in ()' / 'return ()' — keyword + empty parens, not a call
                out.append(("name", name))
                out.append(("sym", "("))
                out.append(("sym", ")"))
                continue
        if kind == "minus":
            kind, val = "sym", "-"
        if kind == "qname":
            kind = "name"  # path parser and calls both treat qnames as names
        out.append((kind, val))
    return out


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_PATH_START_SYMS = {"*", "@", "."}


_PROLOG = re.compile(
    r"^\s*xquery\s+version\s+(?:\"[^\"]*\"|'[^']*')"
    r"(?:\s+encoding\s+(?:\"[^\"]*\"|'[^']*'))?\s*;\s*"
)


def _scan_markup(s: str, i: int, allow_braces: bool = False) -> int | None:
    """balanced scan of a direct XML constructor starting at s[i] == '<';
    returns the end index (exclusive) or None if not well-formed markup.
    Static markup only — '{' interpolation disqualifies (the computed
    constructors handle dynamic content) unless allow_braces (template
    scans for pattern-destructuring bindings treat {..} as opaque)."""
    depth = 0
    j = i
    n = len(s)
    while j < n:
        c = s[j]
        if c == "{":
            if allow_braces:
                end = s.find("}", j)
                if end < 0:
                    return None
                j = end + 1
                continue
            return None
        if c == "<":
            if s.startswith("<!--", j):
                end = s.find("-->", j)
                if end < 0:
                    return None
                j = end + 3
                continue
            close = s[j + 1 : j + 2] == "/"
            k = j + 1 + (1 if close else 0)
            if k >= n or not (s[k].isalpha() or s[k] == "_"):
                return None
            # find tag end, quote-aware
            q = None
            while k < n:
                ch = s[k]
                if q:
                    if ch == q:
                        q = None
                elif ch in "'\"":
                    q = ch
                elif ch == "{":
                    return None
                elif ch == ">":
                    break
                k += 1
            if k >= n:
                return None
            selfclose = s[k - 1] == "/"
            if close:
                depth -= 1
            elif not selfclose:
                depth += 1
            j = k + 1
            if depth == 0:
                return j
            continue
        j += 1
    return None


# `import module namespace p = "uri" at "path";` prologs: the parser
# ACCEPTS and surfaces them (CompiledExpr.imports) — loading is the
# caller's job (functions/registry.load_module; harness/sim hoists)
IMPORT_MODULE = re.compile(
    r'import\s+module\s+(?:namespace\s+([\w-]+)\s*=\s*)?"([^"]*)"'
    r'(?:\s+at\s+"([^"]*)")?\s*;'
)


def extract_doc_literals(src: str) -> tuple[str, dict[str, str]]:
    """replace static direct XML constructors with synthetic $__docN vars;
    recognized at expression start or right after '(' / ','."""
    out = []
    docs: dict[str, str] = {}
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c == "<" and i + 1 < n and (src[i + 1].isalpha() or src[i + 1] == "_"):
            prev = "".join(out).rstrip()
            # expression start, after '('/',', after ':=' (binding position:
            # let $x := <a>..</a>//b), or after a flow keyword
            if (prev == "" or prev.endswith(("(", ",", ":=", "["))
                    or re.search(r"\b(return|in|then|else|satisfies)$", prev)):
                end = _scan_markup(src, i)
                if end is not None:
                    name = f"__doc{len(docs)}"
                    docs[name] = src[i:end]
                    out.append(f"${name}")
                    i = end
                    continue
        out.append(c)
        i += 1
    return "".join(out), docs


class ExprParser:
    def __init__(self, src: str, json_literals: bool = True):
        # version declarations toggle extension sets in the reference
        # (readme.txt:129-131); the compiled surface is the same either way
        self.src = _PROLOG.sub("", src)
        self.toks = tokenize(self.src)
        self.i = 0
        # JSONiq word literals true/false/null: on for -e (unified
        # json-mode), off for --json-mode standard / --no-json-literals /
        # --xquery (goldens jsonmode/*-literals)
        self.json_literals = json_literals

    # -- token helpers ------------------------------------------------------
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
            raise ValueError(
                f"expr parse error in {self.src!r}: expected {val or kind}, got {v!r}"
            )
        return v

    def at_word(self, *words) -> bool:
        k, v = self.peek()
        return k == "name" and v in words

    # -- entry --------------------------------------------------------------
    def parse(self):
        # prolog: declare variable/function (tests.sh xquery6 shapes)
        self.func_decls: list[FuncDecl] = []
        var_decls: list[tuple[str, object]] = []
        while self.at_word("declare"):
            self.next()
            if self.at_word("variable"):
                self.next()
                vk, vv = self.next()
                if vk != "var":
                    raise ValueError(f"expr: bad variable declaration in {self.src!r}")
                self.expect("dcolonassign")
                var_decls.append((vv[1:], self.exprsingle()))
            elif self.at_word("function"):
                self.next()
                nk, nv = self.next()
                if nk == "func":  # zero-arg: 'local:abc()'
                    fname, params = nv[:-2], []
                elif nk == "name":
                    fname = nv
                    self.expect("sym", "(")
                    params = []
                    while self.peek()[0] == "var":
                        params.append(self.next()[1][1:])
                        # optional 'as TYPE' annotations are skipped
                        if self.at_word("as"):
                            self.next()
                            self.next()
                            if self.peek() == ("sym", "?"):
                                self.next()
                        if self.peek() == ("sym", ","):
                            self.next()
                    self.expect("sym", ")")
                else:
                    raise ValueError(f"expr: bad function declaration in {self.src!r}")
                if self.at_word("as"):  # return-type annotation
                    self.next()
                    self.next()
                    if self.peek() == ("sym", "?"):
                        self.next()
                self.expect("sym", "{")
                body = self.parse_sub()
                self.expect("sym", "}")
                self.func_decls.append(FuncDecl(fname, params, body))
            else:
                raise ValueError(
                    f"expr: unsupported prolog 'declare {self.peek()[1]}' in {self.src!r}"
                )
            if self.peek()[0] == "semi":
                self.next()
        # Expr := ExprSingle (',' ExprSingle)* — a top-level comma list is
        # a sequence (the common multi-value -e shape)
        items = [self.parse_sub()]
        while self.peek() == ("sym", ","):
            self.next()
            items.append(self.parse_sub())
        e = items[0] if len(items) == 1 else SeqExpr(items)
        if self.peek()[0] is not None:
            raise ValueError(
                f"expr: trailing tokens in {self.src!r}: {self.toks[self.i:]!r}"
            )
        # declared variables wrap the body as lets (evaluation-order-correct)
        for name, val in reversed(var_decls):
            e = Flwor([("let", name, val)], None, e)
        return e

    def parse_sub(self):
        """expression up to the current nesting boundary (no EOF check)."""
        a = self.or_expr()
        while self.at_word("otherwise"):
            # XPath 4.0 'otherwise' (changelog:6): first non-empty operand
            self.next()
            a = Otherwise(a, self.or_expr())
        return a

    # -- precedence ladder ---------------------------------------------------
    def or_expr(self):
        a = self.and_expr()
        while self.at_word("or"):
            self.next()
            a = BinOp("or", a, self.and_expr())
        return a

    def and_expr(self):
        a = self.cmp_expr()
        while self.at_word("and"):
            self.next()
            a = BinOp("and", a, self.cmp_expr())
        return a

    def cmp_expr(self):
        a = self.concat_expr()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            return BinOp(v, a, self.concat_expr())
        if k == "name" and v in _CMP_WORDS:
            self.next()
            return BinOp(v, a, self.concat_expr())
        return a

    def concat_expr(self):
        a = self.range_expr()
        while self.peek()[0] == "dbar":
            self.next()
            a = BinOp("||", a, self.range_expr())
        return a

    def range_expr(self):
        a = self.add_expr()
        if self.at_word("to"):
            self.next()
            return RangeExpr(a, self.add_expr())
        return a

    def add_expr(self):
        a = self.mul_expr()
        while True:
            k, v = self.peek()
            if k == "op" and v == "+":
                self.next()
                a = BinOp("+", a, self.mul_expr())
            elif k == "sym" and v == "-":
                self.next()
                a = BinOp("-", a, self.mul_expr())
            else:
                return a

    def mul_expr(self):
        a = self.unary_expr()
        while True:
            k, v = self.peek()
            if k == "sym" and v == "*":
                self.next()
                a = BinOp("*", a, self.unary_expr())
            elif k == "name" and v in _MUL_WORDS:
                self.next()
                a = BinOp(v, a, self.unary_expr())
            else:
                return a

    def unary_expr(self):
        k, v = self.peek()
        if (k == "sym" and v == "-") or (k == "op" and v == "+"):
            self.next()
            return UnaryOp(v, self.unary_expr())
        return self.map_expr()

    def map_expr(self):
        """SimpleMapExpr: a ! expr (XPath 3.1, changelog:5)."""
        a = self.arrow_expr()
        while self.peek()[0] == "bang":
            self.next()
            a = SimpleMap(a, self.arrow_expr())
        return a

    def arrow_expr(self):
        """ArrowExpr: a => f(b) ≡ f(a, b) (XPath 3.1, changelog:5)."""
        a = self.cast_expr()
        while self.peek()[0] == "arrow":
            self.next()
            nk, nv = self.next()
            if nk == "func":
                a = Arrow(a, nv[:-2], [])
                continue
            if nk != "name":
                raise ValueError(f"expr: '=>' needs a function name in {self.src!r}")
            self.expect("sym", "(")
            args = []
            if self.peek() != ("sym", ")"):
                args.append(self.parse_sub())
                while self.peek() == ("sym", ","):
                    self.next()
                    args.append(self.parse_sub())
            self.expect("sym", ")")
            a = Arrow(a, nv, args)
        return self._cast_suffix(a)

    def cast_expr(self):
        return self._cast_suffix(self.union_expr())

    def _cast_suffix(self, a):
        while self.at_word("cast", "castable"):
            word = self.next()[1]
            if not self.at_word("as"):
                raise ValueError(f"expr: '{word}' without 'as' in {self.src!r}")
            self.next()
            tk, tv = self.next()
            if tk != "name":
                raise ValueError(f"expr: bad cast target {tv!r} in {self.src!r}")
            if self.peek() == ("sym", "?"):
                self.next()  # optional-occurrence marker: same compilation
            a = CastAs(a, tv) if word == "cast" else CastableAs(a, tv)
        while self.at_word("instance"):
            self.next()
            if not self.at_word("of"):
                raise ValueError(f"expr: 'instance' without 'of' in {self.src!r}")
            self.next()
            tk, tv2 = self.next()
            if tk == "func":  # item() / node() sequence types
                tv2 = tv2[:-2] + "()"
            elif tk != "name":
                raise ValueError(f"expr: bad sequence type {tv2!r} in {self.src!r}")
            occ = ""
            nk, nv = self.peek()
            if (nk, nv) in (("sym", "?"), ("sym", "*")) or (nk, nv) == ("op", "+"):
                occ = nv
                self.next()
            a = InstanceOf(a, tv2, occ)
        if self.at_word("treat"):
            raise ValueError(
                f"expr: 'treat as' is not supported in the string surface "
                f"(route type checks through xs constructors)"
            )
        return a

    def union_expr(self):
        a = self.postfix_expr()
        while self.peek() == ("sym", "|"):
            self.next()
            a = BinOp("|", a, self.postfix_expr())
        return a

    def postfix_expr(self):
        a = self.primary()
        while True:
            k, v = self.peek()
            if k == "sym" and v == "[":
                self.next()
                pred = self.parse_sub()
                self.expect("sym", "]")
                if isinstance(a, FilterExpr):
                    a.preds.append(pred)
                else:
                    a = FilterExpr(a, [pred])
            elif k in ("slash", "dslash") and not isinstance(a, (PathRoot,)):
                # $x/foo, (expr)//bar — apply a relative path to the value.
                # The path parser consumes the leading slash itself.
                a = PathApply(a, self._parse_path_here())
            elif k == "sym" and v == "?":
                # XPath 3.1 lookup: $m?key, $a?1, $m?* (changelog:5)
                self.next()
                nk, nv = self.peek()
                if nk == "name":
                    self.next()
                    a = Lookup(a, nv)
                elif nk == "num" and nv.isdigit():
                    self.next()
                    a = Lookup(a, int(nv))
                elif (nk, nv) == ("sym", "*"):
                    self.next()
                    a = Lookup(a, "*")
                else:
                    raise ValueError(f"expr: bad lookup key after '?' in {self.src!r}")
            elif (
                k == "sym" and v == "." and self.peek(1)[0] == "name"
                and isinstance(a, (VarRef, Lookup, MapLit, Call, SeqExpr, ContextItem))
            ):
                # proprietary object.property access (readme.txt:147-149) —
                # marked dot=True: the compiler yields empty in
                # --json-mode standard/jsoniq (goldens jsonmode/*-dotnotation)
                self.next()
                a = Lookup(a, self.next()[1], dot=True)
            elif (
                k == "sym" and v == "(" and isinstance(a, (PathRoot, PathApply))
                and a.path.steps and a.path.attr is None
                and a.path.steps[-1].axis == "child"
                and not a.path.steps[-1].test.startswith("#")
                and a.path.steps[-1].test not in ("*", "node()")
            ):
                # path-step function call (readme.txt:147-149):
                # '/html/body/a/concat(">",text(),"<")' — the trailing name
                # step is really a per-node call: rewrite to
                # path ! concat(...) (simple-map semantics)
                fname = a.path.steps[-1].test
                self.next()
                args = []
                if self.peek() != ("sym", ")"):
                    args.append(self.parse_sub())
                    while self.peek() == ("sym", ","):
                        self.next()
                        args.append(self.parse_sub())
                self.expect("sym", ")")
                import dataclasses as _dc

                base_path = _dc.replace(a.path, steps=a.path.steps[:-1])
                base = (PathRoot(base_path) if isinstance(a, PathRoot)
                        else PathApply(a.base, base_path))
                a = SimpleMap(base, Call(fname, args))
            elif (
                k == "sym" and v == "("
                and isinstance(a, (VarRef, Lookup, MapLit, ContextItem))
            ):
                # dynamic call on a map value = property access ('{..}("name")');
                # zero-arg '$obj()' returns the property-name sequence
                # (readme.txt:150: 'jn:keys or $object()')
                self.next()
                if self.peek() == ("sym", ")"):
                    self.next()
                    a = Call("jn:keys", [a])
                else:
                    key = self.parse_sub()
                    self.expect("sym", ")")
                    a = Lookup(a, key)
            else:
                return a

    # -- primaries ------------------------------------------------------------
    def primary(self):
        k, v = self.peek()
        if k is None:
            raise ValueError(f"expr: unexpected end of input in {self.src!r}")
        if k == "num":
            self.next()
            if re.fullmatch(r"\d+", v):
                return Lit(int(v), "long")
            return Lit(float(v), "double")
        if k == "str":
            self.next()
            q = v[0]
            return Lit(v[1:-1].replace(q + q, q), "string")
        if k == "xstr":
            self.next()
            return self._xstring(v)
        if k == "var":
            self.next()
            nk, nv = self.peek()
            if nk == "dcolonassign":
                self.next()
                return Assign(v[1:], self.exprsingle())
            return VarRef(v[1:])
        if k == "sym" and v == ".":
            self.next()
            return ContextItem()
        if k == "sym" and v == "(":
            self.next()
            if self.peek() == ("sym", ")"):
                self.next()
                return SeqExpr([])
            items = [self.parse_sub()]
            while self.peek() == ("sym", ","):
                self.next()
                items.append(self.parse_sub())
            self.expect("sym", ")")
            return items[0] if len(items) == 1 else SeqExpr(items)
        if k == "sym" and v == "[":
            # JSONiq array literal (readme.txt:137-141) — value-space mapped
            # to a Spark array; nested arrays flatten into the seq model
            # (jn:members is the identity under this mapping)
            self.next()
            items = []
            if self.peek() != ("sym", "]"):
                items.append(self.parse_sub())
                while self.peek() == ("sym", ","):
                    self.next()
                    items.append(self.parse_sub())
            self.expect("sym", "]")
            return ArrayLit(items)
        if k == "name" and v == "map" and self.peek(1) == ("sym", "{"):
            # XPath 3.1 'map { ... }' — same literal as the JSONiq object
            self.next()
            k, v = self.peek()
        if k == "sym" and v == "{":
            # JSONiq object constructor (readme.txt:142-152): {"k": v, ...}
            self.next()
            pairs = []
            if self.peek() != ("sym", "}"):
                while True:
                    key = self.parse_sub()
                    # ':' is not a standalone token — a qname 'a:b' would
                    # have lexed as one name; object keys are strings or
                    # parenthesized exprs followed by ':' via axis-miss, so
                    # accept the common string-key ':' as part of grammar
                    kk, kv = self.peek()
                    if kk == "axis":  # 'name::'-style mislex never valid here
                        raise ValueError(f"expr: bad object key in {self.src!r}")
                    if (kk, kv) != ("colon", ":"):
                        raise ValueError(
                            f"expr: expected ':' after object key in {self.src!r}"
                        )
                    self.next()
                    pairs.append((key, self.parse_sub()))
                    if self.peek() == ("sym", ","):
                        self.next()
                        continue
                    break
            self.expect("sym", "}")
            return MapLit(pairs)
        if k == "name" and v == "try" and self.peek(1) == ("sym", "{"):
            self.next()
            self.next()
            e = self.parse_sub()
            self.expect("sym", "}")
            if not (self.at_word("catch")):
                raise ValueError("expr: try without catch")
            self.next()
            errs = None
            if self.peek() == ("sym", "*"):
                self.next()
            elif self.peek()[0] in ("name", "qname"):
                errs = self.next()[1]
            self.expect("sym", "{")
            h = self.parse_sub()
            self.expect("sym", "}")
            return TryCatch(e, h, errs)
        if k == "name" and v == "if" and self.peek(1) == ("sym", "("):
            return self._if_expr()
        if k == "name" and v in ("let", "for") and self.peek(1)[0] == "var":
            return self._flwor()
        if (k == "name" and v == "for" and self.peek(1)[1] in ("tumbling", "sliding")
                and self.peek(2)[1] == "window"):
            return self._window_expr()
        if k == "name" and v == "for" and self.peek(1)[0] == "name":
            raise ValueError(
                "expr: 'for ... window' variant not recognized"
            )
        if k == "name" and v in ("some", "every") and self.peek(1)[0] == "var":
            return self._quant(v)
        if (
            k == "name" and v == "element" and self.peek(1)[0] == "name"
            and self.peek(2) == ("sym", "{")
        ):
            self.next()
            name = self.next()[1]
            self.expect("sym", "{")
            items = []
            if self.peek() != ("sym", "}"):
                items.append(self.parse_sub())
                while self.peek() == ("sym", ","):
                    self.next()
                    items.append(self.parse_sub())
            self.expect("sym", "}")
            attrs = [i for i in items if isinstance(i, AttrCtor)]
            content = [i for i in items if not isinstance(i, AttrCtor)]
            return ElemCtor(name, attrs, content)
        if (
            k == "name" and v == "attribute" and self.peek(1)[0] == "name"
            and self.peek(2) == ("sym", "{")
        ):
            self.next()
            name = self.next()[1]
            self.expect("sym", "{")
            val = self.parse_sub()
            self.expect("sym", "}")
            return AttrCtor(name, val)
        if k == "name" and v == "text" and self.peek(1) == ("sym", "{"):
            self.next()
            self.next()
            val = self.parse_sub()
            self.expect("sym", "}")
            return TextCtor(val)
        if (k == "name" and v in ("true", "false") and self.json_literals
                and self.peek(1) != ("sym", "(")):
            # JSONiq word literals (readme.txt:133-135) — only when NOT
            # followed by '(', and not a path step start: a bare 'true'
            # selects nothing in the fixtures so the literal reading is the
            # reference's
            self.next()
            return Lit(v == "true", "bool")
        if (k == "name" and v == "null" and self.json_literals
                and self.peek(1) != ("sym", "(")):
            self.next()
            return Lit(None, "null")
        if k == "func":
            fname = v[:-2]
            if fname in ("text", "node"):
                return PathRoot(self._parse_path_here())
            self.next()
            if fname == "true":
                return Lit(True, "bool")
            if fname == "false":
                return Lit(False, "bool")
            return Call(fname, [])
        if k == "name" and self.peek(1)[0] == "dcolonassign":
            # bare-name assignment 'v := 18' (tests.sh:263 separator tests)
            self.next()
            self.next()
            return Assign(v, self.exprsingle())
        if k == "name" and self.peek(1) == ("sym", "(") and v != "css":
            self.next()
            self.next()
            args = []
            if self.peek() != ("sym", ")"):
                args.append(self.parse_sub())
                while self.peek() == ("sym", ","):
                    self.next()
                    args.append(self.parse_sub())
            self.expect("sym", ")")
            return Call(v, args)
        if k == "slash" and self.peek(1)[0] in (
            None, "op", "dbar", "bang", "arrow",
        ) or (
            k == "slash" and self.peek(1) == ("sym", ")")
        ) or (k == "slash" and self.peek(1) == ("sym", ",")):
            # bare '/' — the document root itself (outer-xml(/), '/')
            self.next()
            return PathRoot(Path(steps=[Step("self", "node()", [])]))
        if k in ("slash", "dslash", "axis", "dotdot", "name") or (
            k == "sym" and v in _PATH_START_SYMS
        ):
            return PathRoot(self._parse_path_here())
        raise ValueError(f"expr parse error in {self.src!r}: unexpected {v!r}")

    def _parse_path_here(self) -> Path:
        """Delegate to the selector engine's parser on the shared tokens."""
        p = _Parser(self.toks, self.src)
        p.i = self.i
        path = p.parse_path()
        self.i = p.i
        return path

    def _if_expr(self):
        self.next()  # if
        self.expect("sym", "(")
        cond = self.parse_sub()
        self.expect("sym", ")")
        if not self.at_word("then"):
            raise ValueError(f"expr: 'if' without 'then' in {self.src!r}")
        self.next()
        then = self.exprsingle()
        if not self.at_word("else"):
            raise ValueError(f"expr: 'if' without 'else' in {self.src!r}")
        self.next()
        els = self.exprsingle()
        return IfExpr(cond, then, els)

    def exprsingle(self):
        """ExprSingle: one expression, no top-level ','."""
        return self.parse_sub()

    def _window_expr(self):
        self.next()  # for
        mode = self.next()[1]  # tumbling | sliding
        self.next()  # window
        vk, vv = self.next()
        if vk != "var":
            raise ValueError("expr: expected $var after 'window'")
        if not self.at_word("in"):
            raise ValueError("expr: window clause without 'in'")
        self.next()
        src = self.exprsingle()
        if not self.at_word("start"):
            raise ValueError("expr: window clause without 'start'")
        self.next()
        if not self.at_word("when"):
            raise ValueError("expr: window 'start' without 'when'")
        self.next()
        start = self.exprsingle()
        end = None
        if self.at_word("end"):
            self.next()
            if not self.at_word("when"):
                raise ValueError("expr: window 'end' without 'when'")
            self.next()
            end = self.exprsingle()
        if not self.at_word("return"):
            raise ValueError("expr: window clause without 'return'")
        self.next()
        return WindowExpr(mode, vv[1:], src, start, end, self.exprsingle())

    def _flwor(self):
        clauses = []
        while self.at_word("let", "for"):
            word = self.next()[1]
            while True:
                vk, vv = self.next()
                if vk != "var":
                    raise ValueError(f"expr: expected $var after {word!r}")
                if word == "let":
                    self.expect("dcolonassign")
                else:
                    if not self.at_word("in"):
                        raise ValueError(f"expr: 'for {vv}' without 'in'")
                    self.next()
                clauses.append((word, vv[1:], self.exprsingle()))
                if self.peek() == ("sym", ","):
                    self.next()
                    continue
                break
        if self.at_word("window"):
            raise ValueError(
                "expr: FLWOR window-after-for routes through the library "
                "operators (queries_fn.py / queries_ext.py window_*)"
            )
        group_by = None
        count_var = None
        while self.at_word("group", "count"):
            if self.at_word("group"):
                self.next()
                if not self.at_word("by"):
                    raise ValueError(f"expr: 'group' without 'by' in {self.src!r}")
                self.next()
                gv = []
                while True:
                    vk, vv = self.next()
                    if vk != "var":
                        raise ValueError("expr: expected $var after 'group by'")
                    gv.append(vv[1:])
                    if self.peek()[0] == "dcolonassign":
                        # 'group by $k := expr' binds then groups (XQ 3.1)
                        self.next()
                        clauses.append(("let", gv[-1], self.exprsingle()))
                    if self.peek() == ("sym", ","):
                        self.next()
                        continue
                    break
                group_by = gv
            else:  # count
                self.next()
                vk, vv = self.next()
                if vk != "var":
                    raise ValueError("expr: expected $var after 'count'")
                count_var = vv[1:]
        where = None
        if self.at_word("where"):
            self.next()
            where = self.exprsingle()
        order_by = None
        if self.at_word("order"):
            self.next()
            if not self.at_word("by"):
                raise ValueError(f"expr: 'order' without 'by' in {self.src!r}")
            self.next()
            key = self.exprsingle()
            desc = False
            if self.at_word("descending"):
                desc = True
                self.next()
            elif self.at_word("ascending"):
                self.next()
            if self.peek() == ("sym", ","):
                raise ValueError(
                    "expr: multi-key 'order by' routes through the library "
                    "FLWOR (queries_fn.py)"
                )
            order_by = (key, desc)
        if not self.at_word("return"):
            raise ValueError(f"expr: FLWOR without 'return' in {self.src!r}")
        self.next()
        return Flwor(clauses, where, self.exprsingle(), order_by,
                     group_by, count_var)

    def _quant(self, mode: str):
        self.next()  # some/every
        clauses = []
        while True:
            vk, vv = self.next()
            if vk != "var":
                raise ValueError(f"expr: expected $var after {mode!r}")
            if not self.at_word("in"):
                raise ValueError(f"expr: quantified '{vv}' without 'in'")
            self.next()
            clauses.append((vv[1:], self.exprsingle()))
            if self.peek() == ("sym", ","):
                self.next()
                continue
            break
        if not self.at_word("satisfies"):
            raise ValueError(f"expr: '{mode}' without 'satisfies' in {self.src!r}")
        self.next()
        return Quant(mode, clauses, self.exprsingle())

    def _xstring(self, tok: str):
        """x"..{e}.." extended string (readme.txt:160-164). '{{'/'}}'
        escape to literal braces; nested strings inside embedded
        expressions are quote-aware."""
        q = tok[1]
        body = tok[2:-1].replace(q + q, q)
        parts: list = []
        buf: list[str] = []
        i = 0
        while i < len(body):
            ch = body[i]
            if ch == "{" and body[i + 1 : i + 2] == "{":
                buf.append("{")
                i += 2
            elif ch == "}" and body[i + 1 : i + 2] == "}":
                buf.append("}")
                i += 2
            elif ch == "{":
                if buf:
                    parts.append("".join(buf))
                    buf = []
                depth, j, quote = 1, i + 1, None
                while j < len(body) and depth:
                    c = body[j]
                    if quote:
                        if c == quote:
                            quote = None
                    elif c in "'\"":
                        quote = c
                    elif c == "{":
                        depth += 1
                    elif c == "}":
                        depth -= 1
                    j += 1
                if depth:
                    raise ValueError(f"expr: unbalanced {{}} in x-string {tok!r}")
                parts.append(parse_expr(body[i + 1 : j - 1]))
                i = j
            else:
                buf.append(ch)
                i += 1
        if buf:
            parts.append("".join(buf))
        return XString(parts)


def parse_expr(src: str):
    return parse_expr_full(src)[0]


def parse_expr_full(src: str, json_literals: bool = True):
    """(ast, declared functions) — the prolog's `declare function` entries
    need the compiler (late-bound, recursion-guarded)."""
    p = ExprParser(src, json_literals=json_literals)
    ast = p.parse()
    return ast, {f.qname: f for f in getattr(p, "func_decls", [])}


# ---------------------------------------------------------------------------
# extraction-kind auto-detection (tests/tests.sh:423-452)
# ---------------------------------------------------------------------------

# one CSS simple selector: name, .class, #id, name.class, a:hover, [attr]…
# NB: the alternation MUST be wrapped before interpolation — top-level '|'
# would otherwise split the composed pattern
_CSS_SIMPLE = r"(?:(?:[a-zA-Z][\w-]*|\*)?(?:[.#][\w-]+|:{1,2}[\w-]+(?:\([^()]*\))?|\[[^\]]+\])+|[a-zA-Z][\w-]*|\*)"
_CSS_RE = re.compile(
    rf"\s*{_CSS_SIMPLE}(?:\s*[>+~,]\s*{_CSS_SIMPLE}|\s+{_CSS_SIMPLE})*\s*"
)


def detect_kind(src: str) -> str:
    """'pattern' | 'css' | 'xpath' — the reference's ekAuto guess
    (xidelbase.pas:2540-2543 guessExtractionKind; behavior pinned by
    tests/tests.sh:423-452):

    - leading '<'  → pattern template
    - pure CSS shape that XPath would not read the same way (has a
      css-only marker like '.cls' / '#id' / ':pseudo' / '[x=y]' without
      any XPath-only syntax) → css
    - everything else (paths, bare names, full expressions) → xpath
    """
    s = src.strip()
    if s.startswith("<"):
        return "pattern"
    if s.startswith("["):
        return "xpath"  # JSONiq array literal, not a CSS attribute selector
    if any(t in s for t in ("/", "::", "$", "(", ")", '"', "'", "=", "|")):
        return "xpath"
    if re.fullmatch(_CSS_RE, s) and re.search(r"[.#]\w|:{1,2}[a-z-]+|\[[^\]]+\]|[>+~]", s):
        return "css"
    return "xpath"
