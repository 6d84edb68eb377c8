"""Replay a reference CLI invocation through the Spark engine.

Mirrors the reference's processing model (xidelbase.pas):

- context building: sibling creation on data-after-actions (3349-3378),
  `-f` chaining a followTo context (3365-3370), `[ ]` push/pop with the
  datasource-vs-action closing rule (3425-3451), the trailing-follow
  recursion fixup and the `-e query data...` wrap-around (3826-3855),
  fictive datasources (1932-1960).
- processing: per-doc action suffixes, follow resolution + the global
  duplication list (TFollowToList.add), recursion-level caps
  (TProcessingContext.process, 1996-2140).
- printing: actions containing variable definitions print the change-log
  entries ('name := value'); plain expressions print value items and set
  $result (2560-2600); adhoc name-prefix rule per extraction group
  (printExtractedVariables, 2641-2704).

Every expression/selector/capture evaluates through compile_expr /
compile_css as Catalyst columns over spark.range(1) with the document
bound as a constant node-array literal (extract/nodes.nodes_literal_column)
— the same compilation path the distributed operators use; the harness
only orchestrates single documents the way the CLI does.
"""

from __future__ import annotations

import json
import posixpath
import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import functions as F

from ..exprlang import compile_expr
from ..exprlang.parser import detect_kind
from ..extract.css import compile_css
from ..extract.nodes import (
    _parse_auto_py,
    _parse_html_py,
    _parse_xml_py,
    nodes_literal_column,
)
from .template import match_template


class Skip(Exception):
    """case uses a surface the harness does not simulate (reason in args)."""


# ---------------------------------------------------------------------------
# argv model
# ---------------------------------------------------------------------------


@dataclass
class Extraction:
    expr: str
    kind: str  # auto | xpath | css | xquery | pattern | multipage
    base_dir: Path | None = None  # file-relative loads (--template-file)


@dataclass
class Source:
    value: str  # literal markup, file path, or '-'
    input_format: str | None = None
    request: dict | None = None  # http(s) sources: the captured request tuple


class PC:
    """processing context (TProcessingContext)."""

    def __init__(self, parent: "PC | None" = None):
        self.parent = parent
        self.data: list = []  # Source | PC
        self.actions: list = []  # Extraction | PC
        self.follow: str | None = None
        self.followTo: "PC | None" = None  # may be self (recursion)
        self.nextSibling: "PC | None" = None
        self.yield_to_parent = False

    def last(self) -> "PC":
        if self.nextSibling is not None:
            return self.nextSibling.last()
        if self.followTo is not None and self.followTo is not self:
            return self.followTo.last()
        return self


_KIND_OPTS = {
    "--xpath": "xpath", "--xpath2": "xpath", "--xpath3": "xpath",
    "--xpath3.0": "xpath", "--xpath3.1": "xpath",
    "--css": "css",
    "--xquery": "xquery", "--xquery1": "xquery", "--xquery3": "xquery",
    "--xquery3.0": "xquery", "--xquery3.1": "xquery",
}

_VALUE_OPTS = {
    "--output-format", "--output-separator", "--output-header",
    "--output-footer", "--output-declaration", "--output-encoding",
    "--printed-node-format", "--output-node-format", "--printed-json-format",
    "--input-format", "--json-mode", "--variable", "--follow-level",
    "--dot-notation", "--extract-kind", "--template-action",
    "--module", "--module-path", "--default-variable-name",
}
_FLAG_OPTS = {
    "--hide-variable-names", "--allow-repetitions", "--print-type-annotations",
    "--output-node-indent", "--ignore-namespaces", "--strict-type-checking",
    "--no-json-literals", "--disable-no-extended-json", "--silent",
    "--deprecated-string-options",
}
_SKIP_OPTS = {
    "--user-agent", "--proxy", "--wait",
    "--print-received-headers", "--load-cookies", "--save-cookies",
}

# request options accumulate like the reference's combineMultiArgs
# (xidelbase.pas:3285-3292): values join on the separator while the
# accumulator is 'open' (trailing separator); a leading '&' always joins;
# an empty value clears; a data-source arg closes the accumulator
_MULTI_OPTS = {"--post": "&", "-d": "&", "--form": "\0", "--header": "\r\n",
               "-H": "\r\n"}
# request options restored at ']' (pushCommandLineState/pop, :3241-3269)
_SCOPED_OPTS = ("method", "error-handling")


def _combine_multi(old: str | None, append: str, sep: str) -> str:
    if append == "":
        return ""
    if append.startswith("&"):
        append = append[1:]
    elif not (old or "").endswith(sep):
        old = ""
    return (old or "") + append + sep


def _close_multi(val: str | None, sep: str) -> str:
    if val is None:
        return ""
    return val[: -len(sep)] if val.endswith(sep) else val


class Sim:
    def __init__(self, spark, ref_root: str | Path, argv: list[str],
                 stdin: str | None = None, env: dict[str, str] | None = None):
        self.spark = spark
        self.ref_root = Path(ref_root)
        self.argv = list(argv)
        self.stdin = stdin
        self.osenv = env or {}
        self.opts: dict[str, object] = {}
        self.vars: dict[str, tuple[str, object]] = {}  # name -> (shape, value)
        self.result: tuple[str, object] | None = None
        self.seen: set[str] = set()
        self.groups: list[dict] = []  # {'doc': i, 'entries': [(name, [vals])]}
        self.raw_out: list[str] = []  # --download '-' raw response chunks
        self.doc_counter = 0
        self.magic: dict[str, str] = {}
        self.funcs: dict = {}  # declared/imported functions, persist across -e
        self.modules: dict[str, tuple] = {}  # resolved path -> (prefix, uri, funcs)
        self.modules_by_uri: dict[str, str] = {}

    # -- option handling -----------------------------------------------------

    def _opt(self, name, default=None):
        return self.opts.get(name, default)

    # -- context building ----------------------------------------------------

    def build(self) -> PC:
        base = PC()
        cur = base
        stack: list[tuple[PC, PC]] = []  # (saved current, bracket base)
        toks = self.argv
        i = 0
        pending_input_format: str | None = self._opt("input-format")

        def add_action(expr: str, kind: str):
            cur.actions.append(Extraction(expr, kind))

        # request-option accumulators (combineMultiArgs state) + the
        # [ ]-scoped snapshot stack (pushCommandLineState/pop)
        acc: dict[str, str | None] = {"post": None, "form": None, "header": None}
        optstack: list[tuple[dict, dict]] = []

        def capture_request(url: str) -> dict:
            post_set = acc["post"] is not None
            form_set = acc["form"] is not None
            method = self.opts.get("method")
            if method is None:
                method = "POST" if (post_set or form_set) else "GET"
            method = str(method)
            if method == "-":
                if self.stdin is None:
                    raise Skip("stdin method, none provided")
                method = self.stdin.strip()
            data = _close_multi(acc["post"], "&") if post_set else ""
            if data == "-":
                if self.stdin is None:
                    raise Skip("stdin post data, none provided")
                data = self.stdin[:-1] if self.stdin.endswith("\n") else self.stdin
            form = [f for f in _close_multi(acc["form"], "\0").split("\0") if f] \
                if form_set else []
            headers = [h for h in _close_multi(acc["header"], "\r\n").split("\r\n")
                       if h.strip()]
            return {"url": url, "method": method.upper(), "post": data,
                    "form": form, "headers": headers,
                    "error-handling": self.opts.get("error-handling")}

        def close_accs():
            for k, sep in (("post", "&"), ("form", "\0"), ("header", "\r\n")):
                if acc[k] is not None:
                    acc[k] = _close_multi(acc[k], sep)

        while i < len(toks):
            t = toks[i]
            i += 1
            if t == "[":
                optstack.append((dict(acc),
                                 {k: self.opts.get(k) for k in _SCOPED_OPTS}))
                nb = PC()
                stack.append((cur, nb))
                cur = nb
                continue
            if t == "]":
                if not stack:
                    raise Skip("unbalanced ]")
                if optstack:
                    saved_acc, saved_opts = optstack.pop()
                    acc.update(saved_acc)
                    for k, v in saved_opts.items():
                        if v is None:
                            self.opts.pop(k, None)
                        else:
                            self.opts[k] = v
                outer, bbase = stack.pop()
                cond_ds = (
                    (cur is bbase and not cur.actions and cur.data)
                    or (cur.parent is not None and cur.parent.followTo is cur
                        and not cur.actions and bbase.data)
                )
                if cond_ds:
                    outer.data.append(bbase)
                    bbase.parent = outer
                    if cur.parent is not None and cur.parent.followTo is cur:
                        cur.parent.followTo = None
                else:
                    outer.actions.append(bbase)
                    bbase.parent = outer
                cur = outer
                continue
            name, eq, val = t.partition("=") if t.startswith("--") else (t, "", "")
            if name in ("-e", "--extract", "--extract-file") or name in _KIND_OPTS or t == "-e":
                opt = name if name.startswith("-") else t
                if eq:
                    expr = val
                else:
                    if i >= len(toks):
                        raise Skip(f"missing arg for {t}")
                    expr = toks[i]
                    i += 1
                if opt == "--extract-file":
                    p = self.ref_root / expr
                    if not p.exists():
                        raise Skip(f"extract-file {expr}")
                    expr = p.read_text()
                elif expr == "-":
                    # '-e -': the expression itself comes from stdin
                    # (golden stdin2, tests.sh:81)
                    if self.stdin is None:
                        raise Skip("stdin expression, none provided")
                    expr = self.stdin.strip()
                add_action(expr, _KIND_OPTS.get(opt, "auto"))
                continue
            if t in ("-f", "--follow") or name == "--follow":
                if eq:
                    sel = val
                else:
                    if i >= len(toks):
                        raise Skip("missing arg for -f")
                    sel = toks[i]
                    i += 1
                if cur.actions and isinstance(cur.actions[-1], PC):
                    cur.actions[-1].last().yield_to_parent = True
                cur.follow = sel
                nxt = PC(parent=cur)
                cur.followTo = nxt
                cur = nxt
                continue
            if name == "--template-file" or t == "--template-file":
                if eq:
                    v = val
                else:
                    if i >= len(toks):
                        raise Skip("missing arg for --template-file")
                    v = toks[i]
                    i += 1
                p = self.ref_root / v
                if not p.exists():
                    raise Skip(f"template-file {v}")
                cur.actions.append(Extraction(p.read_text(), "multipage", p.parent))
                continue
            if t in ("--xml", "--html"):
                fmt = t[2:]
                pending_input_format = fmt
                self.opts["input-format"] = fmt
                self.opts["output-format"] = fmt
                continue
            if name in _SKIP_OPTS or t in _SKIP_OPTS:
                raise Skip(f"option {name or t}")
            if name in _MULTI_OPTS or t in _MULTI_OPTS:
                opt = name if name in _MULTI_OPTS else t
                if eq:
                    v = val
                else:
                    if i >= len(toks):
                        raise Skip(f"missing arg for {t}")
                    v = toks[i]
                    i += 1
                key = {"-d": "post", "-H": "header"}.get(opt, opt[2:])
                acc[key] = _combine_multi(acc[key], v, _MULTI_OPTS[opt])
                continue
            if t == "--compressed" or name == "--compressed":
                acc["header"] = _combine_multi(
                    acc["header"], "Accept-Encoding: gzip", "\r\n")
                continue
            if name in ("--method", "--error-handling") \
                    or t in ("--method", "--error-handling"):
                if eq:
                    v = val
                else:
                    if i >= len(toks):
                        raise Skip(f"missing arg for {t}")
                    v = toks[i]
                    i += 1
                self.opts[(name or t)[2:]] = v
                continue
            if name == "--download" or t == "--download":
                if eq:
                    v = val
                else:
                    if i >= len(toks):
                        raise Skip("missing arg for --download")
                    v = toks[i]
                    i += 1
                cur.actions.append(Extraction(v, "download"))
                continue
            if name in _FLAG_OPTS or t in _FLAG_OPTS:
                if eq:
                    self.opts[name[2:]] = val not in ("false", "0")
                else:
                    self.opts[t[2:]] = True
                continue
            if name in _VALUE_OPTS or t in _VALUE_OPTS:
                if eq:
                    v = val
                else:
                    if i >= len(toks):
                        raise Skip(f"missing arg for {t}")
                    v = toks[i]
                    i += 1
                key = (name or t)[2:]
                if key == "input-format":
                    pending_input_format = v
                    self.opts["input-format"] = v
                elif key == "variable":
                    self._import_variables(v)
                elif key == "module":
                    self._load_module_arg(v)
                elif key == "module-path":
                    self.opts.setdefault("module-path", []).append(v)  # type: ignore[union-attr]
                else:
                    self.opts[key] = v
                continue
            if t.startswith("--"):
                raise Skip(f"option {t}")
            # data source
            if t.startswith("ftp://"):
                raise Skip("online fetch")
            req = None
            if t.startswith(("http://", "https://")):
                req = capture_request(t)
            if (cur.parent is not None and cur.parent.followTo is cur) or cur.actions:
                sib = PC(parent=cur.parent)
                cur.nextSibling = sib
                cur = sib
            cur.data.append(Source(t, pending_input_format, request=req))
            close_accs()  # closeAllMultiArgs after every data source

        # trailing-follow recursion fixup (xidelbase.pas:3829-3841)
        if cur.parent is not None and not cur.actions and not cur.data:
            p = cur.parent
            cur.follow = p.follow
            cur.followTo = cur
            cur.actions = list(p.actions)

        # '-e query data...' wrap-around (3843-3855)
        if (cur.parent is None and base.nextSibling is cur and not base.data
                and not cur.actions and cur.follow is None):
            cur.actions = base.actions
            base.actions = []
            base.nextSibling = None
            base = cur

        # single existing-file argument with no actions anywhere: run the
        # FILE as the query, imports relative to its directory
        # (xidelbase:3862; golden moduleFuncImportRel tests/subdir/test.xq)
        if (base.nextSibling is None and not base.actions and base.follow is None
                and len(base.data) == 1 and isinstance(base.data[0], Source)):
            pth = self.ref_root / base.data[0].value
            if not base.data[0].value.lstrip().startswith("<") and pth.is_file()                     and pth.suffix in (".xq", ".xqm", ".xquery"):
                base.data = []
                base.actions = [Extraction(pth.read_text(), "xquery", pth.parent)]

        self._insert_fictive(base, can_use_stdin=self.stdin is not None)
        return base

    def _insert_fictive(self, pc: PC, can_use_stdin: bool):
        """xidelbase.pas:1932-1960 — a context with actions but no data gets
        stdin (base only) or '<empty/>'; contexts whose actions are all
        subcontexts delegate downward."""
        if not pc.data and pc.actions:
            if any(not isinstance(a, PC) for a in pc.actions):
                pc.data.append(Source("-" if can_use_stdin else "<empty/>", None))
            else:
                for a in pc.actions:
                    self._insert_fictive(a, False)

    def _import_variables(self, spec: str):
        for part in spec.split(","):
            if "=" in part:
                k, v = part.split("=", 1)
            else:
                k, v = part, self.osenv.get(part, "")
            self.vars[k] = ("string", v)

    # -- modules (--module / import module ... at; tests/module.xq shape) ----

    _MODULE_HDR = re.compile(r'\s*(?:xquery[^;]*;\s*)?module\s+namespace\s+([\w-]+)\s*=\s*"([^"]*)"\s*;')
    _IMPORT = re.compile(
        r'import\s+module\s+(?:namespace\s+([\w-]+)\s*=\s*)?"([^"]*)"'
        r'(?:\s+at\s+"([^"]*)")?\s*;'
    )
    _DECL_VAR = re.compile(
        r"declare\s+variable\s+\$([\w.-]+(?::[\w.-]+)?)\s*"
        r"(?:as\s+[\w:?*+()-]+\s*)?(external|:=)"
    )

    def _load_module_arg(self, spec: str):
        if "=" in spec:
            pfx, path = spec.split("=", 1)
        else:
            pfx, path = None, spec
        self._load_module(path, pfx)

    def _find_module_file(self, ref: str, base_dir: Path | None = None) -> Path | None:
        bases = [self.ref_root]
        if base_dir is not None:
            bases.insert(0, base_dir)
        for mp in self._opt("module-path", []) or []:
            bases.append(self.ref_root / mp)
        for b in bases:
            p = b / ref
            if p.exists():
                return p
        return None

    def _load_module(self, path: str, import_prefix: str | None = None,
                     base_dir: Path | None = None):
        p = self._find_module_file(path, base_dir)
        if p is None:
            raise Skip(f"module file {path}")
        key = str(p.resolve())
        if key not in self.modules:
            src = p.read_text()
            hdr = self._MODULE_HDR.match(src)
            if hdr is None:
                raise Skip(f"module header in {path}")
            mpfx, uri = hdr.group(1), hdr.group(2)
            body = src[hdr.end():]
            body = self._hoist_imports(body, base_dir=p.parent)
            body = self._hoist_var_declares(body, None)
            # remaining function declares parse through the expression
            # compiler's prolog handling; '()' is a throwaway body
            try:
                ce = compile_expr(body + " ()")
            except Exception as e:
                raise Skip(f"module parse {path}: {e}") from None
            self.funcs.update(ce._funcs)
            self.modules[key] = (mpfx, uri, dict(ce._funcs))
            self.modules_by_uri[uri] = key
        mpfx, uri, funcs = self.modules[key]
        if import_prefix and import_prefix != mpfx:
            for qname, decl in funcs.items():
                local = qname.split(":", 1)[-1]
                self.funcs[f"{import_prefix}:{local}"] = decl
            for vname in list(self.vars):
                if vname.startswith(mpfx + ":"):
                    self.vars[f"{import_prefix}:{vname.split(':', 1)[1]}"] = self.vars[vname]

    def _hoist_imports(self, src: str, base_dir: Path | None = None) -> str:
        def rep(m):
            pfx, uri, at = m.group(1), m.group(2), m.group(3)
            if at:
                self._load_module(at, pfx, base_dir)
            elif uri in self.modules_by_uri:
                mpfx, _u, _f = self.modules[self.modules_by_uri[uri]]
                if pfx and pfx != mpfx:
                    self._load_module_alias(uri, pfx)
            else:
                raise Skip(f"import module {uri} without location")
            return ""

        return self._IMPORT.sub(rep, src)

    def _load_module_alias(self, uri: str, pfx: str):
        key = self.modules_by_uri[uri]
        mpfx, _uri, funcs = self.modules[key]
        for qname, decl in funcs.items():
            self.funcs[f"{pfx}:{qname.split(':', 1)[-1]}"] = decl

    def _hoist_var_declares(self, src: str, d) -> str:
        """evaluate `declare variable` prologs so they persist across -e
        actions (golden moduleVars) and across module loads; 'external'
        declares read the OS environment (golden varenviron3) and are
        stripped from the source."""
        out = src
        for m in list(self._DECL_VAR.finditer(src)):
            name, tail = m.group(1), m.group(2)
            if tail == "external":
                self.vars[name] = ("string", self.osenv.get(name.split(":")[-1], ""))
                semi = src.find(";", m.end())
                out = out.replace(src[m.start():semi + 1], "", 1)
            else:
                semi = src.find(";", m.end())
                if semi < 0:
                    continue
                value_expr = src[m.end():semi]
                try:
                    self.vars[name] = self._eval_value(value_expr, d)
                except Skip:
                    continue
        return out

    def _eval_value(self, expr: str, d) -> tuple[str, object]:
        from ..exprlang.compiler import Compiler

        try:
            ce = compile_expr(expr)
        except Exception as e:
            raise Skip(f"declare-value parse: {e}") from None
        nodes = self._nodes_col(d) if d is not None else None
        env = self._env()
        c = Compiler(env=ce._env_with_docs(env), nodes=nodes,
                     funcs={**self.funcs, **ce._funcs})
        try:
            tv = c.compile(ce.ast)
            col, _k = self._printed(c, tv, nodes)
            row = self.spark.range(1).select(col.alias("r")).first()
        except Exception as e:
            raise Skip(f"declare-value eval: {str(e)[:120]}") from None
        vals = list(row["r"] or [])
        return ("seq", vals) if len(vals) != 1 else ("string", vals[0])

    # -- document retrieval --------------------------------------------------

    def _resolve_path(self, ref: str, base_url: str | None) -> str:
        if base_url and "/" in base_url and not ref.startswith("/"):
            cand = posixpath.normpath(posixpath.join(posixpath.dirname(base_url), ref))
        else:
            cand = ref
        return cand

    def _retrieve(self, src, level: int):
        """Source|str ref → Doc dict or None."""
        fmt = None
        base = None
        if isinstance(src, Source):
            if src.request is not None:
                return self._fetch_sim(src.request, level, src.input_format)
            ref, fmt = src.value, src.input_format
        elif isinstance(src, tuple):  # (ref, base_url, fmt) | ('__req__', dict)
            if src and src[0] == "__req__":
                return self._fetch_sim(src[1], level, None)
            ref, base, fmt = src
        else:
            ref = src
        if ref == "-":
            if self.stdin is None:
                raise Skip("stdin requested, none provided")
            return self._mkdoc("-", self.stdin, level, fmt)
        if ref.lstrip().startswith("<"):
            return self._mkdoc("", ref, level, fmt)
        if ref.startswith(("http://", "https://")):
            return self._fetch_sim({"url": ref, "method": "GET"}, level, fmt)
        if ref.startswith("ftp://"):
            raise Skip("online fetch")
        path = self._resolve_path(ref, base)
        p = self.ref_root / path
        if not p.exists():
            return None
        try:
            text = p.read_text()
        except UnicodeDecodeError:
            text = p.read_text(encoding="latin-1")  # golden encodingJson
        return self._mkdoc(path, text, level, fmt)

    def _fetch_sim(self, req: dict, level: int, fmt: str | None):
        """offline stand-in for the network fetch: the harness/echo
        endpoints render the exact response bytes for the request tuple;
        unknown hosts stay Skips (genuinely online-only cases)."""
        from ..exprlang.compiler import XQError
        from .echo import HttpError, simulate_fetch

        req = dict(req)
        if req.get("post"):
            # command-line option values interpolate variables at request
            # time (golden post6: --post 'data={$v}')
            req["post"] = self._interp_vars(req["post"])
        try:
            markup = simulate_fetch(req, self.ref_root)
        except HttpError as e:
            raise XQError(f"HTTP {e.status} for {req.get('url')}",
                          ns="http", local=str(e.status)) from None
        except OSError as e:
            raise Skip(f"fetch fixture: {e}") from None
        if markup is None:
            raise Skip("online fetch")
        if fmt is None and (req.get("url") or "").endswith("/xidelecho.php"):
            # the .php echo serves content-type text/html → the reference
            # parses it with the LENIENT tree builder: trailing text after
            # </xml> stays in the tree, so '-e /' sees the final newline
            # (post7/post8 whole-document values). The .pl echo is
            # text/xml and parses case-preserving (its <ENV_VAR> tags).
            fmt = "lenient"
        return self._mkdoc(req["url"], markup, level, fmt)

    def _interp_vars(self, s: str) -> str:
        """{$name} → the variable's string value (option interpolation)."""
        def rep(m):
            name = m.group(1)
            if name in self.vars:
                shape, value = self.vars[name]
                if shape == "seq":
                    return " ".join(str(v) for v in value)
                return str(value)
            return m.group(0)

        return re.sub(r"\{\$(\w+)\}", rep, s)

    def _mkdoc(self, url: str, markup: str, level: int, fmt: str | None):
        fmt = fmt or self._opt("input-format") or "auto"
        if fmt in ("json", "json-strict") or markup.lstrip()[:1] in ("{", "["):
            # JSON document: $json binds as a deep variant value; there is
            # no markup node tree ($raw still carries the bytes)
            return {"url": url, "markup": markup, "level": level, "nodes": [],
                    "html": False, "jsonraw": markup}
        is_html = False
        if fmt in ("auto",):
            nodes = _parse_auto_py(markup)
            is_html = bool(nodes) and any(
                n["tag"] == "html" and n["parent"] == 0 for n in nodes
            )
        elif fmt == "xml-strict":
            nodes = _parse_xml_py(markup)
        elif fmt == "xml":
            # non-strict xml = the reference's LENIENT tree parser: PIs and
            # undeclared entities keep their raw bytes (pinode-xml)
            import re as _re

            if _re.search(r"<\?(?!xml\b)", markup) or "<!ENTITY" in markup:
                nodes = _parse_html_py(markup, wrap=False)
            else:
                nodes = _parse_xml_py(markup) or _parse_html_py(markup, wrap=False)
        elif fmt == "lenient":
            # echo-endpoint responses: the lenient tree without wrapping
            # (keeps trailing text after the root element in the tree)
            nodes = _parse_html_py(markup, wrap=False)
        elif fmt == "html":
            # forced-html mode does NOT protect <?...?> blocks (pinode-html)
            nodes = _parse_html_py(markup, keep_pis=False)
            is_html = True
        else:
            raise Skip(f"input-format {fmt}")
        if nodes is None:
            nodes = []
        if self._opt("ignore-namespaces"):
            for n in nodes:
                if n.get("attrs") and "xmlns" in n["attrs"]:
                    n["attrs"] = {k: v for k, v in n["attrs"].items() if k != "xmlns"}
        return {"url": url, "markup": markup, "level": level, "nodes": nodes,
                "html": is_html}

    # -- processing ----------------------------------------------------------

    def run(self) -> str:
        base = self.build()
        self.process(base, None)
        return self._finish()

    def _identity(self, ref) -> str | None:
        if isinstance(ref, Source):
            # '<empty/>' placeholders and stdin never compare equal
            # (TDirectDataRequest/TStdinDataRequest.equalTo)
            if ref.value in ("<empty/>", "-"):
                return None
            if ref.request is not None:
                return self._request_identity(ref.request)
            return ref.value
        if isinstance(ref, tuple):
            if ref and ref[0] == "__doc__":
                return None  # already-processed data yielded upward: never deduped
            if ref and ref[0] == "__req__":
                return self._request_identity(ref[1])
            return self._resolve_path(ref[0], ref[1])
        return str(ref)

    @staticmethod
    def _request_identity(req: dict) -> str:
        """THTTPRequest.equalTo (xidelbase.pas:1242-1245): the dedup key is
        the FULL request tuple — url, method, post data, headers, multipart
        (post4b: same tuple fetched once; post4c: method differs → twice)."""
        return json.dumps([req.get("url"), req.get("method"), req.get("post"),
                           req.get("headers") or [], req.get("form") or []])

    def _dup(self, ref) -> bool:
        if self._opt("allow-repetitions"):
            return False
        key = self._identity(ref)
        if key is None:
            return False
        if key in self.seen:
            return True
        self.seen.add(key)
        return False

    @property
    def follow_max(self) -> float:
        v = self._opt("follow-level")
        return float(v) if v is not None else float("inf")

    def process(self, pc: PC, doc) -> list:
        res: list = []
        next_q: list[tuple[object, int]] = []

        def sub(d, skip=0):
            if d is None:
                return
            if pc.yield_to_parent:
                res.append(("__doc__", d))
            self._set_magic(d)
            for ai in range(skip, len(pc.actions)):
                act = pc.actions[ai]
                if isinstance(act, PC):
                    # yields were dedup-listed when first added (merge does
                    # not re-dedup — TFollowToList.merge, xidelbase:1464)
                    for y in self.process(act, d):
                        next_q.append((y, ai + 1))
                else:
                    self._set_magic(d)
                    self.eval_action(act, d)
            if pc.follow is not None:
                # dedup ONCE, at first entry into the follow list
                followed = [fr for fr in self.eval_follow(pc.follow, d)
                            if not self._dup(fr)]
                if pc.followTo is not None:
                    if d["level"] + 1 <= self.follow_max:
                        for fr in followed:
                            nd = self._retrieve(fr, d["level"] + 1)
                            if nd is not None:
                                self.process(pc.followTo, nd)
                else:
                    res.extend(followed)

        if doc is not None:
            sub(doc)
        for ds in pc.data:
            if isinstance(ds, PC):
                for y in self.process(ds, None):
                    next_q.append((y, 0))
            else:
                if not self._dup(ds):
                    next_q.append((ds, 0))
        if not pc.actions and pc.follow is None:
            out = [q[0] for q in next_q] + res
            if pc.nextSibling is not None:
                out += self.process(pc.nextSibling, None)
            return out
        if doc is None and not pc.data and pc.actions:
            for ai, act in enumerate(pc.actions):
                if isinstance(act, PC):
                    for y in self.process(act, None):
                        next_q.append((y, ai + 1))
        cur_level = doc["level"] + 1 if doc is not None else 0
        while next_q:
            ref, na = next_q.pop(0)
            if cur_level <= self.follow_max:
                if isinstance(ref, tuple) and ref and ref[0] == "__doc__":
                    sub(ref[1], na)
                else:
                    sub(self._retrieve(ref, cur_level if doc is not None else 0), na)
        if pc.nextSibling is not None:
            res += self.process(pc.nextSibling, None)
        return res

    def _set_magic(self, d):
        url = d["url"]
        host = ""
        path = url if url.startswith("/") else ""
        if url.startswith(("http://", "https://")):
            from urllib.parse import urlsplit

            parts = urlsplit(url)
            host = parts.hostname or ""
            path = parts.path or "/"
        self.magic = {
            "url": url,
            "host": host,
            "path": path,
            "raw": d["markup"],
        }

    # -- evaluation ----------------------------------------------------------

    _ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}

    def _decode_entities(self, s: str) -> str:
        def rep(m):
            b = m.group(1)
            if b in self._ENTITIES:
                return self._ENTITIES[b]
            if b.startswith("#x") or b.startswith("#X"):
                return chr(int(b[2:], 16))
            if b.startswith("#"):
                return chr(int(b[1:]))
            return m.group(0)

        return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", rep, s)

    def _json_nulls(self) -> bool:
        return self._opt("json-mode") in ("jsoniq", "deprecated")

    def _env(self, d=None):
        from ..exprlang.compiler import TV, jsonv

        env = {}
        for name, (shape, value) in self.vars.items():
            env[name] = self._tv_of(shape, value)
        for name, value in self.magic.items():
            env[name] = TV(F.lit(value), "string")
        if d is not None and d.get("jsonraw") is not None:
            flag = self._json_nulls()
            env["json"] = TV(
                jsonv(F.try_parse_json(F.lit(d["jsonraw"])), flag),
                "jsonv", jnull=flag,
            )
        if self.result is not None:
            env["result"] = self._tv_of(*self.result)
        elif "result" not in env:
            # unset $result is the empty sequence, not an unbound-variable
            # error (multipageChoose4's golden is empty output); a
            # VARIABLE named result (multipage <variable name="result">)
            # wins over the magic default
            env["result"] = TV(F.array().cast("array<string>"), "seq:string")
        return env

    def _tv_of(self, shape, value):
        from ..exprlang.compiler import TV

        if shape == "map":
            return TV(
                F.from_json(F.lit(value), "map<string,string>"), "map",
                jtext=F.lit(value),
            )
        if shape == "seq":
            return TV(
                F.array(*[F.lit(v) for v in value]).cast("array<string>"),
                "seq:string",
            )
        return TV(F.lit(value), "string")

    # -- multipage actions (<action>/<page>/<template>/<pattern>/<loop>/<s>;
    #    xidelbase ekMultipage, goldens multipage*/moreActions*/variableActions)

    def _eval_multipage(self, src: str, base_dir: Path | None = None):
        nodes = _parse_html_py(src, wrap=False)
        if nodes is None:
            raise Skip("multipage parse")
        actions = {}
        order = []
        for n in nodes:
            if n["tag"] == "action":
                aid = (n.get("attrs") or {}).get("id", "")
                actions[aid] = n["id"]
                order.append(aid)
        if not actions:
            raise Skip("multipage: no <action>")
        # the action table stays loaded for later x:call-action /
        # x:has-action calls from -e/--xquery strings (moreActions*)
        self._mp_loaded = (nodes, actions, base_dir)
        sel = self._opt("template-action")
        if sel:
            wanted = []
            for part in str(sel).split(","):
                opt_ok = part.endswith("?")
                aid = part.rstrip("?")
                if aid in actions:
                    wanted.append(aid)
                elif not opt_ok:
                    raise Skip(f"multipage action {aid!r} missing")
        else:
            wanted = [""] if "" in actions else order[:1]
        for aid in wanted:
            self._mp_steps(nodes, actions[aid], base_dir)

    def _mp_children(self, nodes, pid):
        return [n for n in nodes if n["parent"] == pid and not n["tag"].startswith("#")]

    def _mp_interp(self, s: str) -> str:
        """'{$var}' / '{expr}' interpolation in page URLs."""
        def rep(m):
            shape, value = self._eval_value(m.group(1), None)
            return value if shape == "string" else " ".join(value)

        return re.sub(r"\{([^{}]*)\}", rep, s)

    def _mp_steps(self, nodes, pid, base_dir):
        for n in self._mp_children(nodes, pid):
            self._mp_one_step(nodes, n, base_dir)

    def _mp_one_step(self, nodes, n, base_dir):
        from ..exprlang.compiler import XQError
        from ..extract.nodes import inner_xml_py

        tag, attrs = n["tag"], n.get("attrs") or {}
        if tag == "try":
            # <try>steps<catch errors="..">steps</catch>..</try> —
            # dynamic errors from body steps match the FIRST catch
            # whose errors token list covers the (ns, local) code
            # (goldens multipageTry/multipageTryHttp)
            children = list(self._mp_children(nodes, n["id"]))
            prev = getattr(self, "_xq_raise", False)
            self._xq_raise = True
            try:
                for c in children:
                    if c["tag"] != "catch":
                        self._mp_one_step(nodes, c, base_dir)
            except XQError as e:
                self._xq_raise = prev
                ns = getattr(e, "ns", "err")
                loc = getattr(e, "local", "")
                for c in children:
                    if c["tag"] != "catch":
                        continue
                    spec = (c.get("attrs") or {}).get("errors")
                    if self._catch_matches(spec, ns, loc):
                        self._mp_steps(nodes, c["id"], base_dir)
                        break
                else:
                    raise
            finally:
                self._xq_raise = prev
            return
        if tag == "s":
            if self._mp_test(attrs):
                self._mp_script(n.get("text") or "")
        elif tag == "page":
            url = self._mp_interp(attrs.get("url", ""))
            base = self._mp_page["url"] if getattr(self, "_mp_page", None) else None
            if url.lstrip().startswith("{"):
                # page url bound to a request OBJECT variable
                # (multipageonline: {"url":..,"method":"PUT","post":..})
                try:
                    obj = json.loads(url)
                except json.JSONDecodeError:
                    raise Skip(f"multipage page object {url[:40]}") from None
                ref = ("__req__", self._request_of_object(obj))
            elif url.startswith(("http://", "https://")):
                ref = ("__req__", {"url": url, "method": "GET"})
            else:
                ref = (url, base, None)
            d = self._retrieve(ref, 0)
            if d is None:
                raise Skip(f"multipage page {url}")
            self._mp_page = d
            tf = attrs.get("templatefile")
            if tf:
                p = (base_dir / tf) if base_dir and (base_dir / tf).exists() \
                    else (self.ref_root / tf)
                if not p.exists():
                    raise Skip(f"multipage templateFile {tf}")
                self._mp_template(p.read_text())
            for c in self._mp_children(nodes, n["id"]):
                if c["tag"] == "template":
                    self._mp_template(inner_xml_py(nodes, c["id"]) or "")
        elif tag == "pattern":
            href = attrs.get("href")
            if href:
                p = (base_dir / href) if base_dir and (base_dir / href).exists() \
                    else (self.ref_root / href)
                if not p.exists():
                    raise Skip(f"multipage pattern {href}")
                self._mp_template(p.read_text())
            else:
                self._mp_template(inner_xml_py(nodes, n["id"]) or "")
        elif tag == "loop":
            var = attrs.get("var")
            shape, value = self._eval_value(attrs.get("list", "()"), None)
            values = value if shape == "seq" else [value]
            for v in values:
                if var:
                    self.vars[var] = ("string", v)
                self._mp_steps_only(nodes, n["id"], base_dir)
        elif tag == "if":
            if self._mp_test(attrs):
                self._mp_steps(nodes, n["id"], base_dir)
        elif tag == "choose":
            # first <when test> that passes runs; else <otherwise>
            # (goldens multipageChoose*)
            for c in self._mp_children(nodes, n["id"]):
                cattrs = c.get("attrs") or {}
                if c["tag"] == "when" and self._mp_test(cattrs):
                    self._mp_steps(nodes, c["id"], base_dir)
                    break
                if c["tag"] == "otherwise":
                    self._mp_steps(nodes, c["id"], base_dir)
                    break
        elif tag == "variable":
            vname = attrs.get("name")
            if vname and self._mp_test(attrs):
                self.vars[vname] = self._eval_value(
                    n.get("text") or "''", getattr(self, "_mp_page", None)
                )
        elif tag == "template":
            return
        else:
            raise Skip(f"multipage step <{tag}>")

    def _mp_steps_only(self, nodes, pid, base_dir):
        self._mp_steps(nodes, pid, base_dir)

    def _mp_test(self, attrs) -> bool:
        """test="expr" conditions on <s>/<if>/<variable> (multipageShortF)."""
        t = attrs.get("test")
        if t is None:
            return True
        _shape, val = self._eval_value(
            f"boolean({t})", getattr(self, "_mp_page", None)
        )
        return val == "true"

    @staticmethod
    def _catch_matches(spec: str | None, ns: str, local: str) -> bool:
        """<catch errors="tok tok..."> vs an error code (ns, local).

        Token forms pinned by multipageTry/multipageTryHttp: 'ns:local'
        with '*' wildcards on either side, local prefix-'*' and 'Nxx'
        class forms for http codes, bare 'httpNNN'/'http' aliases, plain
        '*'; a BARE name is a no-namespace code and matches neither err:
        nor http: errors ('FORG0001' does not catch err:FORG0001). The
        reference raises http errors in its extension namespace, so
        'pxp:*' also covers them (TryHttp try#7)."""
        if spec is None:
            return True
        for tok in spec.split():
            if tok == "*":
                return True
            if ":" in tok:
                tns, tloc = tok.split(":", 1)
            elif ns == "http" and tok == "http":
                return True
            elif ns == "http" and tok.startswith("http"):
                tns, tloc = "http", tok[4:]
            else:
                continue  # bare name: no-namespace code
            if tns not in ("*", ns) and not (ns == "http" and tns == "pxp"):
                continue
            if tloc == "*" or tloc == local:
                return True
            if tloc.endswith("*") and tloc != "*" and local.startswith(tloc[:-1]):
                return True
            if (len(tloc) == 3 and tloc.endswith("xx") and len(local) == 3
                    and local[0] == tloc[0]):
                return True
        return False

    def _mp_script(self, script: str):
        """<s> scripts: evaluate against the current page, record variable
        assignments, print NOTHING (the reference logs them to stderr) —
        EXCEPT under x:call-action, where the caller collects the change
        log into its own print stream (golden moreActions)."""
        d = getattr(self, "_mp_page", None) or self._mkdoc("", "<empty/>", 0, None)
        self._set_magic(d)
        mark = len(self.groups)
        self._eval_expr(script, d, "expr")
        if not getattr(self, "_mp_keep_logs", False):
            del self.groups[mark:]

    def _has_action_calls(self, src: str, kind: str) -> bool:
        """true iff the PARSED expression actually calls x:call-action /
        x:has-action — a substring in a string literal must not reroute
        evaluation (review r5)."""
        from ..exprlang import compile_expr
        from ..exprlang import parser as P

        try:
            ast = compile_expr(src, json_literals=self._json_literals_for(kind)).ast
        except Exception:  # noqa: BLE001 — normal path reports the parse error
            return False

        def walk(node) -> bool:
            if isinstance(node, P.Call) \
                    and node.qname.split(":")[-1] in ("call-action", "has-action"):
                return True
            for f in getattr(node, "__dataclass_fields__", {}):
                v = getattr(node, f)
                vs = v if isinstance(v, (list, tuple)) else [v]
                for x in vs:
                    if isinstance(x, (list, tuple)):
                        if any(walk(y) for y in x
                               if hasattr(y, "__dataclass_fields__")):
                            return True
                    elif hasattr(x, "__dataclass_fields__") and walk(x):
                        return True
            return False

        return walk(ast)

    def _eval_expr_imperative(self, src: str, d, kind: str):
        """x:call-action / x:has-action (reference tests/more.actions):
        imperative invocation of a loaded multipage <action> from inside an
        expression. The top-level comma sequence evaluates item by item so
        action side effects interleave with assignments in log order;
        static `for` loops over call-actions unroll. Change-log entries
        (incl. those produced by the called actions' <s>/<pattern> steps)
        print as one group before the result values — the reference's
        'variables set by call-action are reordered before the extract
        print' behavior (goldens moreActions, moreActions3)."""
        from ..exprlang import compile_expr
        from ..exprlang import parser as P
        from ..exprlang.compiler import Compiler, XQError

        try:
            ce = compile_expr(src, json_literals=self._json_literals_for(kind))
        except Exception as e:
            raise Skip(f"parse: {e}") from None
        self.funcs.update(ce._funcs)
        items = ce.ast.items if isinstance(ce.ast, P.SeqExpr) else [ce.ast]
        entries: list = []
        results: list = []

        def loaded():
            tab = getattr(self, "_mp_loaded", None)
            if tab is None:
                raise Skip("x:call-action without a loaded action table")
            return tab

        def localname(ast) -> str | None:
            if isinstance(ast, P.Call):
                return ast.qname.split(":")[-1]
            return None

        def arg_str(ast) -> str | None:
            if isinstance(ast, P.Lit) and ast.kind == "string":
                return str(ast.value)
            if isinstance(ast, P.VarRef):
                shape, val = self.vars.get(ast.name, (None, None))
                if shape == "string":
                    return str(val)
            return None

        def run_action(aid: str):
            optional = aid.endswith("?")
            aid = aid.rstrip("?")
            nodes, actions, base_dir = loaded()
            if aid not in actions:
                if optional:
                    return
                raise Skip(f"x:call-action {aid!r} missing")
            mark = len(self.groups)
            prev = getattr(self, "_mp_keep_logs", False)
            self._mp_keep_logs = True
            try:
                self._mp_steps(nodes, actions[aid], base_dir)
            finally:
                self._mp_keep_logs = prev
            for g in self.groups[mark:]:
                entries.extend(g["entries"])
            del self.groups[mark:]

        def contains_call(ast) -> bool:
            if localname(ast) == "call-action":
                return True
            for f in getattr(ast, "__dataclass_fields__", {}):
                v = getattr(ast, f)
                vs = v if isinstance(v, (list, tuple)) else [v]
                for x in vs:
                    if isinstance(x, (list, tuple)):
                        if any(contains_call(y) for y in x
                               if hasattr(y, "__dataclass_fields__")):
                            return True
                    elif hasattr(x, "__dataclass_fields__") and contains_call(x):
                        return True
            return False

        def rewrite_has(ast):
            if localname(ast) == "has-action":
                aid = arg_str(ast.args[0]) if ast.args else None
                _nodes, actions, _bd = loaded()
                ok = aid is not None and aid.rstrip("?") in actions
                return P.Lit(ok, "bool")
            for f in getattr(ast, "__dataclass_fields__", {}):
                v = getattr(ast, f)
                if isinstance(v, list):
                    setattr(ast, f, [
                        rewrite_has(x) if hasattr(x, "__dataclass_fields__") else x
                        for x in v
                    ])
                elif hasattr(v, "__dataclass_fields__"):
                    setattr(ast, f, rewrite_has(v))
            return ast

        def eval_one(it):
            it = rewrite_has(it)
            nodes_col = self._nodes_col(d)
            env = self._env(d)
            c = Compiler(env=ce._env_with_docs(env), nodes=nodes_col,
                         funcs=dict(self.funcs),
                         dot_notation=self._dot_notation(),
                         json_mode=str(self._opt("json-mode", "unified")))
            c.doc_loader = self._doc_loader
            try:
                tv = c.compile(it)
                rcol, rkind = self._printed(c, tv, nodes_col)
                cols = [rcol.alias("r")]
                akinds = []
                for j, (_name, v) in enumerate(c.assignments):
                    acol, ak = self._printed(c, v, nodes_col)
                    cols.append(acol.alias(f"a{j}"))
                    akinds.append(ak)
                row = self.spark.range(1).select(*cols).first()
            except XQError:
                return
            except Exception as e:
                raise Skip(f"eval: {type(e).__name__}: {str(e)[:120]}") from None
            if c.assignments:
                for j, (name, _v) in enumerate(c.assignments):
                    vals = list(row[f"a{j}"] or [])
                    entries.append((name, vals, akinds[j]))
                    self.vars[name] = ("seq", vals) if len(vals) != 1 \
                        else ("string", vals[0])
            else:
                results.append((list(row["r"] or []), rkind))

        def eval_items(seq):
            for it in seq:
                if localname(it) == "call-action":
                    aid = arg_str(it.args[0]) if it.args else None
                    if aid is None:
                        raise Skip("x:call-action with dynamic id")
                    run_action(aid)
                    continue
                if isinstance(it, P.Flwor) and contains_call(it):
                    if (len(it.clauses) != 1 or it.clauses[0][0] != "for"
                            or not isinstance(it.clauses[0][2], P.SeqExpr)
                            or it.where is not None or it.order_by is not None):
                        raise Skip("dynamic loop over x:call-action")
                    _w, var, seqast = it.clauses[0]
                    for vast in seqast.items:
                        v = arg_str(vast)
                        if v is None:
                            raise Skip("dynamic loop over x:call-action")
                        self.vars[var] = ("string", v)
                        body = (it.ret.items
                                if isinstance(it.ret, P.SeqExpr) else [it.ret])
                        eval_items(body)
                    continue
                eval_one(it)

        eval_items(items)
        if entries:
            self._emit(entries, "vars")
        vals = [v for vs, _k in results for v in vs]
        if results:
            self._emit([("result", vals, results[0][1])])
            self.result = ("seq", vals) if len(vals) != 1 else ("string", vals[0])

    def _mp_template(self, tmpl: str):
        """match a template against the current page; anonymous captures
        log under the multipage default name '_result' (golden multipage)."""
        d = getattr(self, "_mp_page", None)
        if d is None:
            raise Skip("multipage pattern without a page")
        self._set_magic(d)
        try:
            caps = match_template(tmpl, d["nodes"])
        except ValueError as e:
            raise Skip(str(e)) from None
        if caps is None:
            self._emit([], "vars")
            return
        entries = []
        for name, expr, node_id in caps:
            vals, ekind = self._eval_capture(expr, d, node_id)
            nm = name or "_result"
            entries.append((nm, vals, ekind))
            if name:
                self.vars[name] = ("seq", vals) if len(vals) != 1 else ("string", vals[0])
        self._emit(entries, "vars")

    def eval_action(self, act: Extraction, d):
        kind = act.kind
        if kind == "download":
            # --download: '-' streams the raw response bytes to stdout
            # (golden post3c); file targets are driver-side in this CLI
            # replay and stay skipped
            if act.expr != "-":
                raise Skip(f"download to file {act.expr}")
            self.raw_out.append(d["markup"])
            return
        if kind == "multipage" or (
            kind == "auto" and self._opt("extract-kind") == "multipage"
        ):
            self._eval_multipage(act.expr, getattr(act, "base_dir", None))
            return
        if kind == "auto":
            kind = detect_kind(act.expr)
            if kind == "xpath":
                # -e strings decode entities like xquery but KEEP json word
                # literals (only explicit --xquery turns them off)
                kind = "expr"
        if kind == "pattern":
            self._eval_pattern(act.expr, d)
        elif kind == "css":
            self._eval_css(act.expr, d)
        else:
            src = act.expr
            if kind in ("xquery", "expr"):
                src = self._decode_entities(src)
            if ("call-action" in src or "has-action" in src) \
                    and self._has_action_calls(src, kind):
                self._eval_expr_imperative(src, d, kind)
            else:
                self._eval_expr(src, d, kind, base_dir=act.base_dir)

    def _nodes_col(self, d):
        col, _roots = nodes_literal_column(d["nodes"])
        return col

    def _emit(self, entries: list[tuple[str, list[str], str]], gkind: str = "value"):
        """gkind 'vars' = change-log group (assignments / template captures:
        wrapped formats render an <object>/{...}); 'value' = plain result."""
        self.groups.append({"doc": self.doc_counter, "entries": entries, "kind": gkind})

    def _pnf(self) -> str:
        """effective printed-node-format: explicit option, else xml for the
        raw xml/html output formats, text otherwise (xmlraw1 vs adhoc5)."""
        pnf = self._opt("printed-node-format") or self._opt("output-node-format")
        if pnf:
            return pnf
        return "xml" if self._opt("output-format") in ("xml", "html") else "text"

    _EKIND = {"long": "num", "double": "num", "bool": "bool"}

    def _printed(self, c, v, nodes):
        """TV → (array<string> printed items, entry kind)."""
        from ..exprlang.compiler import TV, _empty_seq

        if v.kind == "map":
            return F.array(c.json_form(v)), "json"
        if v.kind in ("jsonv", "seq:jsonv"):
            seq = c.to_seq(v) if v.kind == "jsonv" else v

            def pone(e):
                vv = e["v"]
                sch = F.schema_of_variant(vv)
                return F.when(
                    sch.startswith("ARRAY") | sch.startswith("OBJECT")
                    | sch.startswith("STRUCT"),
                    F.to_json(vv),
                ).otherwise(c._jstring(vv))

            return F.transform(seq.col, pone), "json"
        if v.kind == "xmlstr" and self._pnf() == "xml":
            # computed-constructor results are already serialized markup —
            # raw node items, never escaped (linebreaksXMLOutput goldens)
            return F.array(v.col), "node"
        jt = getattr(v, "jtext", None)
        if jt is not None:
            # JSON serialization identity (object/array literals): render
            # style is per output format (pretty in adhoc, spaced in
            # json-wrapped, compact in bash)
            return F.array(jt), "json"
        if v.kind == "null":
            # JSONiq null prints as the word null (adhoc) / bare null (json)
            return F.array(F.lit("null")), "num"
        if v.kind == "nodes" and self._pnf() == "xml":
            from ..extract.nodes import outer_xml_expr

            # a document-literal node set serializes against its OWN backing
            backing = v.backing if v.backing is not None else nodes
            col = F.transform(v.col, lambda i: outer_xml_expr(backing, i))
            if self._opt("output-format") == "html":
                col = F.transform(col, lambda s: self._html_unclose(s))
            return col, "node"
        if getattr(c, "annotate", False):
            if v.is_seq:
                if getattr(v, "atype", None) == "__annotated__":
                    return v.col, "annstr"  # elements already annotated
                seq = c.atomize_seq(v)
                ek = "string" if v.kind == "nodes" else seq.elem_kind
                return F.transform(
                    seq.col, lambda x: c.ann_string(TV(x, ek))
                ), "annstr"
            a = c.ann_string(v)
            return F.when(a.isNull(), _empty_seq("string")).otherwise(F.array(a)), "annstr"
        if v.is_seq:
            seq = c.atomize_seq(v)
            ekind = self._EKIND.get(seq.elem_kind, "str")
            if seq.elem_kind != "string":
                return F.transform(seq.col, lambda x: c.to_string(TV(x, seq.elem_kind))), ekind
            return seq.col, ekind
        s = c.to_string(v)
        col = F.when(s.isNull(), _empty_seq("string")).otherwise(F.array(s))
        return col, self._EKIND.get(v.kind, "str")

    _VOID_TAGS = "br|img|input|hr|meta|link|area|base|col|embed|source|track|wbr"

    @staticmethod
    def _html_unclose(col):
        """HTML serialization: non-void empties are <head></head>, never
        self-closed (golden opthtml)."""
        return F.regexp_replace(
            col,
            r"<(?!(?:" + Sim._VOID_TAGS + r")\b)(\w+)((?:\s[^>]*)?)/>",
            r"<$1$2></$1>",
        )

    def _dot_notation(self) -> bool:
        if "dot-notation" in self.opts:
            return str(self.opts["dot-notation"]) not in ("off", "false")
        return self._opt("json-mode") not in ("standard", "jsoniq")

    def _doc_loader(self, ref: str):
        """fn:doc with a constant path or simulated URL — compile-time
        literal node array (goldens regression_doclocal/_doconline)."""
        from ..extract.nodes import nodes_literal_column

        if ref.startswith(("http://", "https://")):
            d = self._fetch_sim({"url": ref, "method": "GET"}, 0, None)
            return nodes_literal_column(d["nodes"])
        p = self.ref_root / ref
        if not p.exists():
            return None
        d = self._mkdoc(str(p), p.read_text(), 0, None)
        return nodes_literal_column(d["nodes"])

    def _json_literals_for(self, kind: str) -> bool:
        """true/false/null word literals: off in --json-mode standard, off
        for --xquery strings, --no-json-literals[=false] overrides
        (goldens jsonmode/*-literals)."""
        if "no-json-literals" in self.opts:
            return not self.opts["no-json-literals"]
        if self._opt("json-mode") == "standard":
            return False
        return kind != "xquery"

    _JMUT = re.compile(
        r"^\s*(?:\(\$json\)\.(\w+)"                  # ($json).key
        r"|\$json\(\s*\"(\w+)\"\s*\)"                # $json("key")
        r"|\$json((?:\?\w+)+))"                      # $json?1?c
        r"\s*:=\s*(.+?)\s*$"
    )

    def _try_json_mutation(self, src: str, d) -> bool:
        """'$json(\"a\") := 12, ...' — property changes on the (static)
        json document; the reference reprints the mutated $json pretty
        WITHOUT a name prefix (goldens jsonassign/jsonmultiassign/
        jsonassignarray). Whole-value '$json := ..' stays a normal
        assignment."""
        if d.get("jsonraw") is None or "$json" not in src or ":=" not in src:
            return False
        stmts = [p for p in src.split(",") if p.strip()]
        muts = []
        for p in stmts:
            m = self._JMUT.match(p)
            if m is None:
                return False
            key = m.group(1) or m.group(2)
            path = [key] if key else [
                int(seg) - 1 if seg.isdigit() else seg
                for seg in m.group(3).strip("?").split("?")
            ]
            try:
                value = json.loads(m.group(4))
            except json.JSONDecodeError:
                return False
            muts.append((path, value))
        doc = json.loads(d["jsonraw"])
        for path, value in muts:
            cur = doc
            for seg in path[:-1]:
                cur = cur[seg]
            last = path[-1]
            cur[last] = value
        self._emit([("result", [json.dumps(doc, separators=(",", ":"))], "json")])
        return True

    def _eval_expr(self, src: str, d, kind: str = "auto", base_dir=None):
        from ..exprlang.compiler import Compiler

        src = self._hoist_imports(src, base_dir=base_dir)
        if self._try_json_mutation(src, d):
            return
        src = self._hoist_var_declares(src, d)
        try:
            ce = compile_expr(src, json_literals=self._json_literals_for(kind))
        except Exception as e:
            raise Skip(f"parse: {e}") from None
        self.funcs.update(ce._funcs)
        from ..exprlang.compiler import XQError

        nodes = self._nodes_col(d)
        env = self._env(d)
        # json documents bind '.' to the $json value (deep navigation:
        # '. / f', '. // property' — golden inputformatAutoJson)
        ctx = env.get("json") if d.get("jsonraw") is not None else None
        ann = bool(self._opt("print-type-annotations")) and str(
            self._opt("output-format", "adhoc")
        ) not in ("xml-wrapped", "json-wrapped", "json")
        self._compiler_annotated = ann
        c = Compiler(env=ce._env_with_docs(env), nodes=nodes, ctx=ctx,
                     funcs={**self.funcs, **ce._funcs},
                     dot_notation=self._dot_notation(),
                     json_mode=str(self._opt("json-mode", "unified")),
                     annotate=ann)
        c.doc_loader = self._doc_loader
        try:
            tv = c.compile(ce.ast)
        except XQError:
            # dynamic error: the reference reports to stderr and prints
            # nothing for the action (standard-mode ebv/atomization) —
            # unless a multipage <try> is waiting to catch it
            if getattr(self, "_xq_raise", False):
                raise
            return
        except Exception as e:
            raise Skip(f"compile: {e}") from None

        rcol, rkind = self._printed(c, tv, nodes)
        cols = [rcol.alias("r")]
        akinds = []
        for j, (name, v) in enumerate(c.assignments):
            acol, akind = self._printed(c, v, nodes)
            cols.append(acol.alias(f"a{j}"))
            akinds.append(akind)
        try:
            row = self.spark.range(1).select(*cols).first()
        except Exception as e:
            raise Skip(f"eval: {type(e).__name__}: {str(e)[:120]}") from None
        if c.assignments:
            entries = []
            for j, (name, v) in enumerate(c.assignments):
                if j in c.hidden_assignments:
                    continue  # x:clear-log'd entries don't print
                vals = list(row[f"a{j}"] or [])
                entries.append((name, vals, akinds[j]))
                if v.kind == "map" and len(vals) == 1:
                    self.vars[name] = ("map", vals[0])  # compact json text
                else:
                    self.vars[name] = ("seq", vals) if len(vals) != 1 else ("string", vals[0])
            self._emit(entries, "vars")
            if ":=" not in src:
                # assignments surfaced only from NESTED function bodies:
                # the reference's termContainsVariableDefinition misses
                # them, so the result value ALSO prints and $result is set
                # (golden moduleFuncImportGlobalMut)
                vals = list(row["r"] or [])
                self._emit([("result", vals, rkind)])
                self.result = ("seq", vals) if len(vals) != 1 else ("string", vals[0])
        else:
            vals = list(row["r"] or [])
            self._emit([("result", vals, rkind)])
            self.result = ("seq", vals) if len(vals) != 1 else ("string", vals[0])

    def _eval_css(self, sel: str, d):
        try:
            cx = compile_css(sel)
        except Exception as e:
            raise Skip(f"css: {e}") from None
        nodes = self._nodes_col(d)
        if self._pnf() == "xml":
            from ..extract.nodes import outer_xml_expr

            col = F.transform(cx.ids(nodes), lambda i: outer_xml_expr(nodes, i))
            ekind = "node"
        else:
            col = cx.values(nodes)
            ekind = "str"
        row = self.spark.range(1).select(col.alias("r")).first()
        vals = [v for v in (row["r"] or []) if v is not None]
        self._emit([("result", vals, ekind)])
        self.result = ("seq", vals) if len(vals) != 1 else ("string", vals[0])

    def _eval_pattern(self, tmpl: str, d):
        try:
            caps = match_template(tmpl, d["nodes"])
        except ValueError as e:
            raise Skip(str(e)) from None
        if caps is None:
            self._emit([])
            return
        entries = []
        for name, expr, node_id in caps:
            vals, ekind = self._eval_capture(expr, d, node_id)
            nm = name or "result"
            entries.append((nm, vals, ekind))
            if name:
                self.vars[name] = ("seq", vals) if len(vals) != 1 else ("string", vals[0])
        self._emit(entries, "vars")

    def _eval_capture(self, expr: str, d, node_id: int) -> tuple[list[str], str]:
        from ..exprlang.compiler import Compiler, TV

        try:
            # no entity decode here: the template's XML parse already
            # decoded once (goldens regression_entity3a-d pin exactly one)
            ce = compile_expr(expr)
        except Exception as e:
            raise Skip(f"capture parse: {e}") from None
        nodes = self._nodes_col(d)
        ctx = TV(F.array(F.lit(node_id).cast("int")), "nodes")
        env = self._env()
        c = Compiler(env=ce._env_with_docs(env), nodes=nodes, ctx=ctx, funcs=ce._funcs)
        try:
            tv = c.compile(ce.ast)
            col, ekind = self._printed(c, tv, nodes)
            row = self.spark.range(1).select(col.alias("r")).first()
        except Exception as e:
            raise Skip(f"capture eval: {str(e)[:120]}") from None
        return list(row["r"] or []), ekind

    # -- follow evaluation ---------------------------------------------------

    _SIMPLE_PATH = re.compile(r"\(?//?([A-Za-z][\w-]*)\)?(\[\d+\])?")

    def _ci_selector(self, sel: str, d) -> str:
        """HTML node tests are case-insensitive in the reference ('-f //A'
        over lowercase-parsed HTML, golden maxlevel1); lowercase the tag of
        simple path selectors when the document came through the HTML
        parser. XML stays case-sensitive."""
        if d.get("html") and self._SIMPLE_PATH.fullmatch(sel.strip()):
            m = self._SIMPLE_PATH.fullmatch(sel.strip())
            tag = m.group(1)
            return sel.replace(tag, tag.lower())
        return sel

    def eval_follow(self, sel: str, d) -> list:
        sel = self._ci_selector(sel, d)
        kind = detect_kind(sel)
        base_url = d["url"]
        if kind == "pattern":
            # follow TEMPLATE (xidelbase ekPattern follow): each capture
            # value becomes a follow-to item — strings are addresses,
            # objects carry data/url like follow objects
            # (golden regression_text1e)
            try:
                caps = match_template(sel, d["nodes"])
            except ValueError as e:
                raise Skip(str(e)) from None
            vals: list[str] = []
            for _name, expr, node_id in caps or []:
                cvals, _k = self._eval_capture(expr, d, node_id)
                vals.extend(cvals)
            return self._follow_refs(vals, base_url)
        if kind == "css":
            cx = compile_css(sel)
            nodes = self._nodes_col(d)
            row = self.spark.range(1).select(cx.ids(nodes).alias("r")).first()
            ids = list(row["r"] or [])
            return [
                (h, base_url, None)
                for h in (self._href_of(d, i) for i in ids)
                if h
            ]
        from ..exprlang.compiler import Compiler, TV

        try:
            ce = compile_expr(self._decode_entities(sel))
        except Exception as e:
            raise Skip(f"follow parse: {e}") from None
        nodes = self._nodes_col(d)
        env = self._env()
        c = Compiler(env=ce._env_with_docs(env), nodes=nodes, funcs=ce._funcs)
        try:
            tv = c.compile(ce.ast)
        except Exception as e:
            raise Skip(f"follow compile: {e}") from None
        if tv.kind == "nodes":
            row = self.spark.range(1).select(tv.col.alias("r")).first()
            ids = list(row["r"] or [])
            return [
                (h, base_url, None)
                for h in (self._href_of(d, i) for i in ids)
                if h
            ]
        # string / sequence results: treat items as addresses or request objects
        if tv.is_seq:
            seq = c.atomize_seq(tv)
            col = F.transform(seq.col, lambda x: c.to_string(TV(x, seq.elem_kind))) \
                if seq.elem_kind != "string" else seq.col
        else:
            col = F.array(c.to_string(tv))
        row = self.spark.range(1).select(col.alias("r")).first()
        return self._follow_refs(list(row["r"] or []), base_url)

    def _follow_refs(self, vals: list, base_url: str) -> list:
        out = []
        for v in vals:
            if v is None:
                continue
            v = v.strip()
            if v.startswith("{"):
                try:
                    obj = json.loads(v)
                except json.JSONDecodeError:
                    raise Skip("follow object") from None
                ref = obj.get("data") or obj.get("url")
                if ref is None:
                    raise Skip("follow object")
                if str(ref).startswith("http"):
                    # follow-object request: url + per-request options
                    # (method/post/headers/error-handling — the reference's
                    # TOptionReaderFromObject surface)
                    out.append(("__req__", self._request_of_object(obj)))
                else:
                    out.append((str(ref), base_url, obj.get("input-format")))
            elif v:
                out.append((v, base_url, None))
        return out

    @staticmethod
    def _request_of_object(obj: dict) -> dict:
        """follow-object / multipage-page object → request dict (the
        TOptionReaderFromObject option surface: url, method, post, headers,
        error-handling; post implies POST unless method overrides)."""
        method = obj.get("method")
        if method is None:
            method = "POST" if obj.get("post") is not None else "GET"
        headers = obj.get("headers") or []
        if isinstance(headers, str):
            headers = [headers]
        if obj.get("header"):
            headers = list(headers) + [obj["header"]]
        return {"url": str(obj.get("url")), "method": str(method).upper(),
                "post": obj.get("post") or "", "form": [],
                "headers": [str(h) for h in headers],
                "error-handling": obj.get("error-handling")}

    def _href_of(self, d, node_id: int) -> str | None:
        n = d["nodes"][node_id]
        attrs = n.get("attrs") or {}
        return attrs.get("href") or attrs.get("src") or (n.get("text") or "").strip() or None

    # -- output assembly -----------------------------------------------------

    def _finish(self) -> str:
        if self.raw_out:
            # --download '-' chunks stream verbatim ahead of any formatted
            # extraction output (post3c is download-only)
            return "".join(self.raw_out) + (self._finish_fmt()
                                            if self.groups else "")
        return self._finish_fmt()

    def _finish_fmt(self) -> str:
        fmt = self._opt("output-format", "adhoc")
        if fmt == "json":
            fmt = "json-wrapped"  # deprecated alias (tests.sh:135)
        if self._opt("print-type-annotations") and fmt in (
                "adhoc", "xml", "html", "bash", "cmd"):
            # bash/cmd list sequence items flat; only the line formats
            # parenthesize multi-item sequences (bash9b vs adhoc9b)
            self.groups = self._annotate_groups(parens=fmt in ("adhoc", "xml", "html"))
        hide = bool(self._opt("hide-variable-names"))
        if fmt == "adhoc":
            items = self._adhoc_items(hide)
            from ..io.golden_output import serialize_document

            decl = self._opt("output-declaration")
            if decl and self._opt("output-node-indent"):
                # indent mode breaks the line after the declaration
                # (linebreaksXMLElementNodes-Decl-Indent vs -NoIndent)
                decl = decl + "\n"
            return serialize_document(
                [(None, line) for line in items],
                fmt="adhoc",
                separator=self._opt("output-separator"),
                header=self._opt("output-header"),
                footer=self._opt("output-footer"),
                declaration=decl,
                encoding=self._opt("output-encoding", "UTF-8"),
            ) if items else ""
        if fmt == "xml-wrapped":
            return self._finish_xml_wrapped()
        if fmt == "json-wrapped":
            return self._finish_json_wrapped()
        if fmt in ("xml", "html"):
            return self._finish_raw(fmt)
        if fmt == "bash":
            return self._finish_bash()
        if fmt == "cmd":
            return self._finish_cmd()
        raise Skip(f"output-format {fmt}")

    def _adhoc_items(self, hide: bool) -> list[str]:
        lines: list[str] = []
        for g in self.groups:
            names = {n for n, _, _ in g["entries"]}
            plain = hide or names <= {"result"}
            for name, vals, k in g["entries"]:
                if k == "json":
                    # single top-level json values pretty-print; items in a
                    # multi-item result stay inline (inputformatAutoJson);
                    # with type annotations arrays print inline-spaced but
                    # objects stay pretty (adhoc11)
                    if getattr(self, "_compiler_annotated", False):
                        vals = [
                            self._jfmt(v, "spaced" if v.lstrip().startswith("[")
                                       else "pretty")
                            for v in vals
                        ]
                    else:
                        style = ("spaced" if g["kind"] == "vars" or len(vals) != 1
                                 else "pretty")
                        vals = [self._jfmt(v, style) for v in vals]
                if k == "node" and self._opt("output-node-indent"):
                    vals = [self._indent_markup(v) for v in vals]
                if plain:
                    lines.extend(vals)
                elif vals:
                    lines.append(f"{name} := {vals[0]}")
                    lines.extend(vals[1:])
                else:
                    lines.append(f"{name} := ")  # named empty sequence (adhoc9c)
        return lines

    def _annotate_groups(self, parens: bool = True) -> list[dict]:
        """--print-type-annotations: strings quote as ".." (" doubled,
        backslash doubled), empty sequence prints '()', multi-item
        sequences parenthesize '(v1, <sep>v2)' (goldens adhoc9b, bash9b,
        bash-escape7/8, xmlraw9b)."""
        out = []
        for g in self.groups:
            entries2 = []
            for n, vals, k in g["entries"]:
                if not vals:
                    entries2.append((n, ["()"], "str"))
                    continue
                if k == "str":
                    # quote with '"', double embedded '"'; backslashes are
                    # NOT escapes in XPath strings and stay as-is
                    # (bash-escape7: concat('"',"'",'\\') -> """'\\")
                    vals = ['"' + v.replace('"', '""') + '"' for v in vals]
                # 'annstr' values were annotated at compile time; 'json'
                # and raw 'node' markup keep their kinds for per-format
                # rendering (adhoc11 / xmlraw11)
                if parens and len(vals) > 1:
                    vals = (["(" + vals[0] + ", "]
                            + [v + ", " for v in vals[1:-1]]
                            + [vals[-1] + ")"])
                entries2.append((n, vals, k if k in ("json", "node") else "str"))
            out.append({**g, "entries": entries2})
        return out

    # -- format assembly (escape rules: xidelbase.pas:2254-2299) -------------

    @staticmethod
    def _xml_esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;") \
            .replace('"', "&quot;")

    @staticmethod
    def _html_esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    @staticmethod
    def _bash_esc(s: str) -> str:
        if "\n" not in s and "\r" not in s:
            return "'" + s.replace("'", "'\"'\"'") + "'"
        return ("$'" + s.replace("\\", "\\\\").replace("'", "\\'")
                .replace("\n", "\\n").replace("\r", "\\r") + "'")

    @staticmethod
    def _cmd_esc(s: str) -> str:
        s = s.replace("\n", "").replace("\r", "")
        out = []
        for ch in s:
            if ch == "%":
                out.append("%%")
            elif ch in '^&<>|",;()=':
                out.append("^" + ch)
            else:
                out.append(ch)
        return "".join(out)

    @staticmethod
    def _jfmt(v: str, style: str) -> str:
        """re-render canonical compact JSON: 'pretty' (indent 2, adhoc/raw
        formats), 'spaced' (inline with ', '/': ', json-wrapped and
        change-log entries), 'compact' (bash)."""
        try:
            obj = json.loads(v)
        except (json.JSONDecodeError, TypeError):
            return v
        if style == "pretty":
            return json.dumps(obj, indent=2, ensure_ascii=False)
        if style == "spaced":
            return json.dumps(obj, separators=(", ", ": "), ensure_ascii=False)
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)

    def _xmlw_json(self, obj) -> str:
        """xml-wrapped structural JSON rendering (golden xmlw-json):
        arrays -> <seq><e>..</e></seq>, objects -> <object><k>v</k></object>
        with invalid element names as <_ key="..">."""
        if isinstance(obj, list):
            return "<seq>" + "".join(f"<e>{self._xmlw_json(x)}</e>" for x in obj) + "</seq>"
        if isinstance(obj, dict):
            parts = []
            for k, v in obj.items():
                if re.fullmatch(r"[A-Za-z_][\w.-]*", k):
                    parts.append(f"<{k}>{self._xmlw_json(v)}</{k}>")
                else:
                    parts.append(f'<_ key="{self._xml_esc(k)}">{self._xmlw_json(v)}</_>')
            return "<object>" + "".join(parts) + "</object>"
        if obj is None:
            return ""
        if obj is True:
            return "true"
        if obj is False:
            return "false"
        if isinstance(obj, str):
            return self._xml_esc(obj)
        return json.dumps(obj)

    def _jval(self, v: str, kind: str) -> str:
        if kind == "json":
            return self._jfmt(v, "spaced")
        if kind == "num":
            return v
        if kind == "bool":
            return v
        from ..io.golden_output import _jq

        return _jq(v)

    def _finish_xml_wrapped(self) -> str:
        enc = self._opt("output-encoding", "UTF-8")
        decl = self._opt("output-declaration")
        if decl is None:
            decl = f'<?xml version="1.0" encoding="{enc}"?>'
        parts = []
        for g in self.groups:
            if g["kind"] == "vars":
                body = "".join(
                    f"<{n}>{self._xml_esc(v)}</{n}>\n"
                    for n, vals, _k in g["entries"] for v in vals
                )
                parts.append(f"<e>\n<object>\n{body}</object>\n</e>")
            else:
                for _n, vals, k in g["entries"]:
                    if k == "json" and vals:
                        try:
                            parts.append("<e>" + self._xmlw_json(json.loads(vals[0])) + "</e>")
                            continue
                        except json.JSONDecodeError:
                            pass
                    if not vals:
                        parts.append("<e><seq/></e>")
                    elif len(vals) == 1:
                        parts.append(f"<e>{self._xml_esc(vals[0])}</e>")
                    else:
                        inner = "".join(f"<e>{self._xml_esc(v)}</e>" for v in vals)
                        parts.append(f"<e><seq>{inner}</seq></e>")
        body = "\n".join(parts)
        return f"{decl}\n<seq>\n{body}\n</seq>\n"

    def _finish_json_wrapped(self) -> str:
        parts = []
        for g in self.groups:
            if g["kind"] == "vars":
                order: list[str] = []
                vals: dict[str, list[str]] = {}
                kinds: dict[str, str] = {}
                for n, vs, k in g["entries"]:
                    if n not in vals:
                        order.append(n)
                        vals[n] = []
                        kinds[n] = k
                    vals[n].extend(vs)
                fields = []
                for n in order:
                    if len(vals[n]) == 1:
                        fields.append(f'"{n}": {self._jval(vals[n][0], kinds[n])}')
                    else:
                        arr = ", ".join(self._jval(v, kinds[n]) for v in vals[n])
                        fields.append(f'"{n}": [{arr}]')
                parts.append("{\n" + ", \n".join(fields) + "\n}")
            else:
                for _n, vs, k in g["entries"]:
                    if not vs:
                        parts.append("null")
                    elif len(vs) == 1:
                        parts.append(self._jval(vs[0], k))
                    else:
                        parts.append("[" + ", ".join(self._jval(v, k) for v in vs) + "]")
        return "[\n" + ", \n".join(parts) + "\n]\n"

    _INLINE_TAGS = {"a", "span", "b", "i", "em", "strong", "code", "u",
                    "sub", "sup", "small", "label"}

    def _indent_markup(self, s: str, html: bool = False) -> str:
        """--output-node-indent: 2-space pretty markup. Text-only elements
        stay inline; in HTML mode inline-level elements stay on the parent
        line and voids drop the self-closing slash (linebreaks goldens)."""
        from ..extract.nodes import _VOID, _parse_html_py, _parse_xml_py

        nodes = _parse_xml_py(s) or _parse_html_py(s, wrap=False)
        if not nodes:
            return s
        byid = {n["id"]: n for n in nodes}
        kids: dict[int, list[int]] = {}
        for n in nodes:
            kids.setdefault(n["parent"], []).append(n["id"])

        def esc(t):
            return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

        def ser(nid: int, depth: int) -> str:
            n = byid[nid]
            tag = n["tag"]
            if tag == "#text":
                return esc(n["text"] or "")
            if tag == "#pi":
                return f"<?{n['text'] or ''}?>"
            if tag == "#doc":
                return "".join(ser(k, depth) for k in kids.get(nid, []))
            attrs = "".join(
                f' {k}="{(v or "").replace("&", "&amp;").replace(chr(34), "&quot;")}"'
                for k, v in (n["attrs"] or {}).items()
            )
            ks = kids.get(nid, [])
            if not ks:
                if html:
                    return (f"<{tag}{attrs}>" if tag in _VOID
                            else f"<{tag}{attrs}></{tag}>")
                return f"<{tag}{attrs}/>"
            if all(byid[k]["tag"] == "#text" for k in ks):
                body = "".join(esc(byid[k]["text"] or "") for k in ks)
                return f"<{tag}{attrs}>{body}</{tag}>"
            out = [f"<{tag}{attrs}>"]
            broke = False
            for k in ks:
                kn = byid[k]
                if kn["tag"] == "#text":
                    if (kn["text"] or "").strip():
                        out.append(esc(kn["text"]))
                    continue
                if html and kn["tag"] in self._INLINE_TAGS:
                    out.append(ser(k, depth + 1))
                else:
                    broke = True
                    out.append("\n" + "  " * (depth + 1) + ser(k, depth + 1))
            if broke:
                out.append("\n" + "  " * depth)
            return "".join(out) + f"</{tag}>"

        roots = kids.get(0, [])
        return "\n".join(ser(r, 0) for r in roots
                         if byid[r]["tag"] != "#text" or (byid[r]["text"] or "").strip())

    def _finish_raw(self, fmt: str) -> str:
        esc = self._xml_esc if fmt == "xml" else self._html_esc
        hide = bool(self._opt("hide-variable-names"))
        items: list[str] = []
        # the raw wrapper (<xml>/<html><body>) is added lazily when the
        # output would not otherwise be well-formed (xidelcrt needRawWrapper;
        # call sites xidelbase:2329,2347,2416,2686): a non-element value, a
        # node printed as text, or a change-log group with >1 entries.
        wrapper = False
        for g in self.groups:
            names = {n for n, _, _ in g["entries"]}
            plain = hide or names <= {"result"}
            if g["kind"] == "vars" and len(g["entries"]) > 1:
                wrapper = True
            for n, vals, k in g["entries"]:
                if k == "json":
                    if getattr(self, "_compiler_annotated", False):
                        # annotations: arrays inline-spaced, objects pretty
                        vals = [self._jfmt(v, "spaced" if v.lstrip().startswith("[")
                                           else "pretty") for v in vals]
                    else:
                        vals = [self._jfmt(v, "pretty") for v in vals]
                if k == "node" and self._opt("output-node-indent"):
                    vals = [self._indent_markup(v, html=(fmt == "html")) for v in vals]
                if plain:
                    # plain entries: empty sequences print nothing (xmlraw8)
                    for v in vals:
                        if k == "node" and v.startswith("<"):
                            items.append(v)
                        else:
                            wrapper = True
                            items.append(v if k == "node" else esc(v))
                else:
                    # one name wrapper per entry, values joined by newline
                    # (xmlraw9c '<a>1\n2</a>' vs per-capture wrappers xmlraw3)
                    body = "\n".join(v if k == "node" else esc(v) for v in vals)
                    if fmt == "xml":
                        items.append(f"<{n}>{body}</{n}>")
                    else:
                        items.append(f'<span class="{n}">{body}</span>')
        if not wrapper:
            enc = self._opt("output-encoding", "UTF-8")
            decl = self._opt("output-declaration")
            if decl is None:
                decl = (f'<?xml version="1.0" encoding="{enc}"?>' if fmt == "xml"
                        else "<!DOCTYPE html>")
            return decl + "\n" + "\n".join(items) + "\n"
        from ..io.golden_output import serialize_document

        return serialize_document(
            [(None, line) for line in items],
            fmt=fmt,
            separator=self._opt("output-separator"),
            header=self._opt("output-header"),
            footer=self._opt("output-footer"),
            declaration=self._opt("output-declaration"),
            encoding=self._opt("output-encoding", "UTF-8"),
        )

    def _flat_cmdline_values(self) -> list[tuple[str, str | None]]:
        """(name, value) pairs; value None = empty-sequence placeholder
        (bash prints an unquoted empty assignment for it, xidelbase:2405)."""
        out: list[tuple[str, str | None]] = []
        for g in self.groups:
            for n, vals, _k in g["entries"]:
                if not vals:
                    out.append((n, None))
                for v in vals:
                    out.append((n, v))
        return out

    def _finish_bash(self) -> str:
        lines: list[str] = []
        counts: dict[str, int] = {}
        for n, v in self._flat_cmdline_values():
            q = "" if v is None else self._bash_esc(v)
            c = counts.get(n, 0)
            if c == 0:
                lines.append(f"{n}={q}")
            elif c == 1:
                lines.append(f'{n}[0]="${n}"')
                lines.append(f"{n}[1]={q}")
            else:
                lines.append(f"{n}[{c}]={q}")
            counts[n] = c + 1
        return "\n".join(lines) + "\n" if lines else ""

    def _finish_cmd(self) -> str:
        lines: list[str] = []
        order: list[str] = []
        vals: dict[str, list[str]] = {}
        for n, v in self._flat_cmdline_values():
            e = "" if v is None else self._cmd_esc(v)
            seen = vals.setdefault(n, [])
            if n not in order:
                order.append(n)
            if len(seen) == 0:
                lines.append(f"SET {n}={e}")
            elif len(seen) == 1:
                lines.append(f"SET {n}[0]={seen[0]}")
                lines.append(f"SET {n}[1]={e}")
            else:
                lines.append(f"SET {n}[{len(seen)}]={e}")
            seen.append(e)
        for n in order:
            if len(vals[n]) > 1:
                lines.append(f"SET #{n}={len(vals[n])}")
        return "\n".join(lines) + "\n" if lines else ""


def run_case(spark, case, ref_root: str | Path = "/root/reference") -> str:
    """case → produced stdout text (raises Skip when unsupported)."""
    ref_root = Path(ref_root)
    stdin = case.resolve_stdin(ref_root / "tests")
    sim = Sim(spark, ref_root, case.argv, stdin=stdin, env=case.env)
    return sim.run()
