"""EXPath file module (file:*) — the DRIVER-SIDE interpreter.

SURVEY §2.3 maps the reference's 34 `file:*` functions to "driver-side
I/O helpers; not distributed": file system side effects have no place in
a Catalyst plan, so the harness evaluates file-module expressions with a
small sequential interpreter over the SAME exprlang AST the column
compiler uses. Strings are byte-transparent (FPC strings are byte
strings): reads decode with errors='surrogateescape' so undecodable
bytes round-trip to the output stream exactly — the reference's
mixed-encoding goldens (tests/tests-file-module.sh → tests/output/file/*)
pin this byte behavior.

Reference: readme.txt EXPath block; web/functions.xml file module;
tests/tests-file-module.sh:1-50 (33 golden files replayed byte-exact by
tests/test_file_module.py, all but the cwd-dependent current-dir case
the reference itself marks machine-specific).
"""

from __future__ import annotations

import base64
import datetime as dt
import fnmatch
import os
import re
import shutil
import tempfile

from ..exprlang import parser as P


class FileError(Exception):
    def __init__(self, code: str, msg: str = ""):
        super().__init__(msg or code)
        self.code = code  # e.g. 'file:out-of-range'


class B64(bytes):
    """xs:base64Binary value: bytes whose PRINTED form is base64 text."""


_S = "surrogateescape"


def _enc(name: str | None) -> str:
    n = (name or "utf-8").lower().replace("-", "")
    return {"latin1": "latin-1", "utf8": "utf-8"}.get(n, name or "utf-8")


def _to_bytes(value, encoding=None) -> bytes:
    if isinstance(value, bytes):
        return bytes(value)
    return str(value).encode(_enc(encoding), errors=_S)


def _item_str(v) -> str:
    if isinstance(v, B64):
        return base64.b64encode(v).decode()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else str(v)
    return str(v)


def _flat(v) -> list:
    if v is None:
        return []
    if isinstance(v, list):
        out = []
        for x in v:
            out.extend(_flat(x))
        return out
    return [v]


def _one(v):
    items = _flat(v)
    return items[0] if items else None


class FileInterp:
    """sequential evaluator for the file-module expression subset."""

    def __init__(self, env: dict | None = None, osenv: dict | None = None):
        self.vars = dict(env or {})
        self.osenv = dict(osenv or {})

    # -- dispatch ----------------------------------------------------------

    def eval(self, node):
        m = getattr(self, "_e_" + type(node).__name__.lower(), None)
        if m is None:
            raise FileError("file:unsupported",
                            f"file interpreter: no rule for {type(node).__name__}")
        return m(node)

    def _e_lit(self, n):
        return n.value

    def _e_seqexpr(self, n):
        return [self.eval(i) for i in n.items]

    def _e_varref(self, n):
        if n.name not in self.vars:
            raise FileError("file:unbound", f"${n.name}")
        return self.vars[n.name]

    def _e_ifexpr(self, n):
        return self.eval(n.then) if self._ebv(self.eval(n.cond)) \
            else self.eval(n.els)

    def _e_trycatch(self, n):
        try:
            return self.eval(n.expr)
        except FileError as e:
            if n.errors is None or n.errors == e.code:
                return self.eval(n.handler)
            raise

    def _e_simplemap(self, n):
        out = []
        for item in _flat(self.eval(n.src)):
            sub = FileInterp(self.vars, self.osenv)
            sub.vars["."] = item
            out.append(sub.eval(n.body))
        return out

    def _e_contextitem(self, n):
        return self.vars.get(".")

    def _e_flwor(self, n):
        # lets bind sequentially; a single for iterates (with order by)
        env = dict(self.vars)
        fors = [c for c in n.clauses if c[0] == "for"]
        if not fors:
            sub = FileInterp(env, self.osenv)
            for _w, name, src in n.clauses:
                sub.vars[name] = sub.eval(src)
            return sub.eval(n.ret)
        if len(fors) != 1:
            raise FileError("file:unsupported", "multi-for")
        out = []
        _w, var, src = fors[0]
        items = _flat(FileInterp(env, self.osenv).eval(src))
        if n.order_by is not None:
            key_ast, desc = n.order_by
            def key_of(it):
                sub = FileInterp(env, self.osenv)
                sub.vars[var] = it
                return _item_str(_one(sub.eval(key_ast)))
            items = sorted(items, key=key_of, reverse=desc)
        for it in items:
            sub = FileInterp(env, self.osenv)
            sub.vars[var] = it
            for w, name, lsrc in n.clauses:
                if w == "let":
                    sub.vars[name] = sub.eval(lsrc)
            if n.where is not None and not self._ebv(sub.eval(n.where)):
                continue
            out.append(sub.eval(n.ret))
        return out

    def _e_binop(self, n):
        op = n.op
        li, r = self.eval(n.left), self.eval(n.right)
        lv, rv = _one(li), _one(r)
        if op == "-":
            return lv - rv  # dateTime - dateTime → timedelta
        if op in ("<", "<=", ">", ">=", "=", "!="):
            # dispatch BEFORE evaluating: a dict literal would compute all
            # six eagerly and TypeError on mixed/None operands (review r5)
            if op == "=":
                return bool(lv == rv)
            if op == "!=":
                return bool(lv != rv)
            if lv is None or rv is None:
                return False  # empty-sequence comparison is false
            if op == "<":
                return bool(lv < rv)
            if op == "<=":
                return bool(lv <= rv)
            if op == ">":
                return bool(lv > rv)
            return bool(lv >= rv)
        if op == "||":
            return _item_str(lv) + _item_str(rv)
        raise FileError("file:unsupported", f"op {op}")

    def _e_elemctor(self, n):
        # serialization-parameter elements etc. — inert placeholders
        return None

    @staticmethod
    def _ebv(v) -> bool:
        items = _flat(v)
        if not items:
            return False
        x = items[0]
        if isinstance(x, bool):
            return x
        if isinstance(x, (int, float)):
            return x != 0
        return bool(str(x))

    # -- calls -------------------------------------------------------------

    def _e_call(self, n):
        name = n.qname
        local = name.split(":")[-1]
        args = [self.eval(a) for a in n.args]
        if name.startswith("file:"):
            fn = getattr(self, "f_" + local.replace("-", "_"), None)
            if fn is None:
                raise FileError("file:unsupported", name)
            return fn(*args)
        if local in ("base64Binary",):
            return B64(base64.b64decode(str(_one(args[0]))))
        if local == "matches":
            return bool(re.search(str(_one(args[1])), str(_one(args[0]))))
        if local == "count":
            return len(_flat(args[0]))
        if local == "current-dateTime":
            return dt.datetime.now()
        if local == "dayTimeDuration":
            m = re.fullmatch(r"PT(\d+)M", str(_one(args[0])))
            if m:
                return dt.timedelta(minutes=int(m.group(1)))
            raise FileError("file:unsupported", "duration lexical")
        if local == "string-join":
            sep = _item_str(_one(args[1])) if len(args) > 1 else ""
            return sep.join(_item_str(x) for x in _flat(args[0]))
        raise FileError("file:unsupported", name)

    def _e_castas(self, n):
        # xs:base64Binary('...') arrives as CastAs in some spellings
        v = _one(self.eval(n.expr))
        if n.type_qname.split(":")[-1] == "base64Binary":
            return B64(base64.b64decode(str(v)))
        return v

    # -- the file:* functions ---------------------------------------------

    @staticmethod
    def _p(path) -> str:
        return str(_one(path))

    def f_exists(self, p):
        return os.path.exists(self._p(p))

    def f_is_dir(self, p):
        return os.path.isdir(self._p(p))

    def f_is_file(self, p):
        return os.path.isfile(self._p(p))

    def f_size(self, p):
        q = self._p(p)
        return 0 if os.path.isdir(q) else os.path.getsize(q)

    def f_last_modified(self, p):
        return dt.datetime.fromtimestamp(os.path.getmtime(self._p(p)))

    def f_create_dir(self, p):
        os.makedirs(self._p(p), exist_ok=True)

    def f_delete(self, p, recursive=None):
        q = self._p(p)
        if os.path.isdir(q):
            if recursive is not None and self._ebv(recursive):
                shutil.rmtree(q)
            else:
                os.rmdir(q)
        else:
            os.remove(q)

    def f_write_text(self, p, text, encoding=None):
        with open(self._p(p), "wb") as f:
            f.write(_to_bytes(_one(text) or "", _one(encoding)))

    def f_write_text_lines(self, p, lines, encoding=None):
        data = b"".join(_to_bytes(_item_str(x), _one(encoding)) + b"\n"
                        for x in _flat(lines))
        with open(self._p(p), "wb") as f:
            f.write(data)

    def f_write(self, p, items, _params=None):
        # fn-style serialization: space-joined items + line ending
        body = " ".join(_item_str(x) for x in _flat(items))
        with open(self._p(p), "wb") as f:
            f.write(_to_bytes(body) + b"\n")

    def f_write_binary(self, p, data, offset=None):
        q = self._p(p)
        blob = _to_bytes(_one(data))
        if offset is None:
            with open(q, "wb") as f:
                f.write(blob)
            return
        off = int(_one(offset))
        cur = b""
        if os.path.exists(q):
            with open(q, "rb") as f:
                cur = f.read()
        if off > len(cur):
            raise FileError("file:out-of-range")
        out = cur[:off] + blob + cur[off + len(blob):]
        with open(q, "wb") as f:
            f.write(out)

    def f_append(self, p, items):
        body = " ".join(_item_str(x) for x in _flat(items))
        with open(self._p(p), "ab") as f:
            f.write(_to_bytes(body))

    def f_append_binary(self, p, data):
        with open(self._p(p), "ab") as f:
            f.write(_to_bytes(_one(data)))

    def f_append_text(self, p, text, encoding=None):
        with open(self._p(p), "ab") as f:
            f.write(_to_bytes(_one(text) or "", _one(encoding)))

    def f_append_text_lines(self, p, lines, encoding=None):
        data = b"".join(_to_bytes(_item_str(x), _one(encoding)) + b"\n"
                        for x in _flat(lines))
        with open(self._p(p), "ab") as f:
            f.write(data)

    def f_read_text(self, p, encoding=None):
        with open(self._p(p), "rb") as f:
            return f.read().decode(_enc(_one(encoding)), errors=_S)

    def f_read_text_lines(self, p, encoding=None):
        txt = self.f_read_text(p, encoding)
        return txt.split("\n")[:-1] if txt.endswith("\n") else txt.split("\n")

    def f_read_binary(self, p, offset=None, length=None):
        with open(self._p(p), "rb") as f:
            data = f.read()
        if offset is None:
            return B64(data)
        off = int(_one(offset))
        ln = int(_one(length)) if length is not None else len(data) - off
        if off < 0 or ln < 0 or off + ln > len(data):
            raise FileError("file:out-of-range")
        return B64(data[off:off + ln])

    def f_copy(self, src, dst):
        s, d = self._p(src), self._p(dst)
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copy(s, d)

    def f_move(self, src, dst):
        shutil.move(self._p(src), self._p(dst))

    def f_list(self, p, recursive=None, pattern=None):
        base = self._p(p)
        rec = recursive is not None and self._ebv(recursive)
        out = []
        if rec:
            for root, dirs, files in os.walk(base):
                for nm in dirs + files:
                    rel = os.path.relpath(os.path.join(root, nm), base)
                    out.append(rel)
        else:
            out = os.listdir(base)
        if pattern is not None:
            pat = str(_one(pattern))
            out = [x for x in out if fnmatch.fnmatch(x, pat)]
        return sorted(out)

    def f_children(self, p):
        base = self._p(p)
        return sorted(os.path.join(base, x) for x in os.listdir(base))

    def f_create_temp_dir(self, prefix, suffix, under=None):
        base = self._p(under) if under is not None else self.f_temp_dir()
        return tempfile.mkdtemp(prefix=str(_one(prefix)),
                                suffix=str(_one(suffix)), dir=base)

    def f_create_temp_file(self, prefix, suffix, under=None):
        base = self._p(under) if under is not None else self.f_temp_dir()
        fd, path = tempfile.mkstemp(prefix=str(_one(prefix)),
                                    suffix=str(_one(suffix)), dir=base)
        os.close(fd)
        return path

    def f_name(self, p):
        return os.path.basename(self._p(p).rstrip("/"))

    def f_parent(self, p):
        return os.path.dirname(self._p(p).rstrip("/"))

    def f_path_to_native(self, p):
        q = os.path.normpath(self._p(p))
        if not os.path.exists(q):
            raise FileError("file:not-found", q)
        return q + "/" if os.path.isdir(q) else q

    def f_path_to_uri(self, p):
        return "file://" + self._p(p)

    def f_dir_separator(self):
        return os.sep

    def f_line_separator(self):
        return "\n"

    def f_path_separator(self):
        return os.pathsep

    def f_temp_dir(self):
        t = self.osenv.get("TEMP") or self.osenv.get("TMPDIR") \
            or tempfile.gettempdir()
        return t if t.endswith("/") else t + "/"


def eval_file_expr(src: str, osenv: dict | None = None) -> str:
    """expression text → printed output (adhoc: one line per item; empty
    sequences contribute nothing)."""
    # file:write's optional <output:serialization-parameters .../> argument
    # is inert (defaults only in the corpus) — replace the XML literal with
    # an empty-sequence placeholder before parsing
    src = re.sub(r"<\w+:serialization-parameters[^>]*/>", "()", src)
    ast, _funcs = P.parse_expr_full(src)
    items = _flat(FileInterp(osenv=osenv).eval(ast))
    return "".join(_item_str(x) + "\n" for x in items)
