"""Named-function registry — the `--module` / user-function surface.

The reference loads XQuery library modules (`--module FILE`) whose
declared functions become callable by qualified name; its builtin surface
is the 467-signature catalog in internettools web/functions.xml. The Spark
analogue: a registry of qualified names → Column functions. Built-in
namespaces (fn:, math:, map:, array:, jn:, libjn:, pxp:, x:) are
pre-registered onto this package's implementations; user modules register
their own namespace from any mapping of name → callable (the `--module`
equivalent), and `call("ns:name", cols...)` resolves late so query specs
can reference functions AS DATA (the pattern-spec style).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


class ModuleRegistry:
    def __init__(self) -> None:
        self._fns: dict[str, Callable[..., Column]] = {}

    def register(self, qname: str, fn: Callable[..., Column]) -> None:
        if ":" not in qname:
            qname = f"fn:{qname}"
        self._fns[qname] = fn

    def load_module(self, namespace: str, functions: Mapping[str, Callable]) -> None:
        """--module analogue: register every function of a user module
        under its namespace prefix."""
        for name, fn in functions.items():
            self.register(f"{namespace}:{name}", fn)

    def resolve(self, qname: str) -> Callable[..., Column]:
        if ":" not in qname:
            # unprefixed: fn: first, then the default-importable extension
            # namespaces — the reference's pxp/x functions are callable
            # without a prefix (readme.txt: extract(...), inner-text(...))
            for ns in ("fn", "x", "pxp"):
                fn = self._fns.get(f"{ns}:{qname}")
                if fn is not None:
                    return fn
            qname = f"fn:{qname}"
        try:
            return self._fns[qname]
        except KeyError:
            ns = qname.split(":", 1)[0]
            known = sorted(n for n in self._fns if n.startswith(ns + ":"))[:8]
            raise KeyError(f"unknown function {qname!r}; {ns}: has {known}") from None

    def call(self, qname: str, *args) -> Column:
        return self.resolve(qname)(*args)

    def names(self, namespace: str | None = None) -> list[str]:
        if namespace is None:
            return sorted(self._fns)
        return sorted(n for n in self._fns if n.startswith(namespace + ":"))


def _builtin_registry() -> ModuleRegistry:
    from . import datetimefn as dt
    from . import jsonfn as jf
    from . import quantified as q
    from . import sequences as sq
    from . import strings as st
    from ..urlnorm import canonicalize, resolve_url

    r = ModuleRegistry()
    # fn: core
    r.load_module("fn", {
        "abs": F.abs, "ceiling": F.ceil, "floor": F.floor, "round": F.round,
        "concat": F.concat, "string-length": F.length, "upper-case": F.upper,
        "lower-case": F.lower, "normalize-space": st.normalize_space,
        "substring-before": st.substring_before, "substring-after": st.substring_after,
        "string-join": st.string_join, "tokenize": st.tokenize,
        "translate": st.translate, "contains": st.contains,
        "starts-with": st.starts_with, "ends-with": st.ends_with,
        "string-to-codepoints": st.string_to_codepoints,
        "codepoints-to-string": st.codepoints_to_string,
        "index-of": sq.index_of, "distinct-values": sq.distinct_values,
        "subsequence": sq.subsequence, "insert-before": sq.insert_before,
        "remove": sq.remove_at, "reverse": sq.reverse_seq, "head": sq.head,
        "tail": sq.tail, "sort": sq.sort_seq,
        "analyze-string": q.analyze_string, "format-number": q.format_number,
        "format-integer": q.format_integer,
        "adjust-dateTime-to-timezone": q.adjust_datetime_to_timezone,
        "resolve-uri": resolve_url, "exists": lambda c: c.isNotNull(),
        "count": F.size, "sum": lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x),
        "matches": dt.matches, "replace": dt.replace_rx,
        "substring": st.substring_xpath, "compare": st.compare_strings,
        "deep-equal": st.deep_equal,
        "encode-for-uri": dt.encode_for_uri,
        "format-dateTime": dt.format_datetime, "format-date": dt.format_date,
        "format-time": dt.format_time,
    })
    r.load_module("math", {
        "sqrt": F.sqrt, "pow": F.pow, "sin": F.sin, "cos": F.cos, "tan": F.tan,
        "asin": F.asin, "acos": F.acos, "atan": F.atan, "atan2": F.atan2,
        "exp": F.exp, "log": F.log, "log10": F.log10,
        "pi": lambda: F.lit(3.141592653589793),
    })
    r.load_module("map", {
        "size": jf.map_size, "keys": jf.map_keys, "contains": jf.map_contains,
        "get": jf.map_get, "put": jf.map_put, "remove": jf.map_remove,
        "entry": jf.map_entry, "merge": jf.map_merge,
    })
    r.load_module("array", {
        "size": jf.array_size, "get": jf.array_get, "head": jf.array_head,
        "tail": jf.array_tail, "reverse": jf.array_reverse,
        "append": jf.array_append, "subarray": jf.array_subarray,
        "insert-before": jf.array_insert_before, "remove": jf.array_remove,
        "flatten": jf.array_flatten, "for-each": jf.array_for_each,
        "filter": jf.array_filter, "fold-left": jf.array_fold_left,
        "join": jf.array_join_arrays,
    })
    r.load_module("jn", {
        "keys": jf.jn_keys, "size": jf.jn_size, "members": jf.jn_members,
    })
    r.load_module("libjn", {
        "values": jf.libjn_values, "intersect": jf.libjn_intersect,
        "project": jf.libjn_project, "remove-keys": jf.libjn_remove_keys,
        "accumulate": jf.libjn_accumulate,
    })
    from ..crawl.requests import request_combine, request_decode
    from ..extract.nodefn import (
        deep_text, inner_text, is_nth, replace_nodes, transform_nodes,
    )
    from .xsd import CONSTRUCTORS

    r.load_module("xs", CONSTRUCTORS)  # the 49-constructor XSD lattice

    r.load_module("pxp", {
        "canonicalize-url": canonicalize, "resolve-html": resolve_url,
        "parse-ietf-date": q.parse_ietf_date,
        "deep-text": deep_text, "inner-text": inner_text, "is-nth": is_nth,
        "transform": transform_nodes,
    })
    r.load_module("x", {
        "extract": st.extract, "extract-all": st.extract_all,
        "request-combine": request_combine, "request-decode": request_decode,
        "replace-nodes": replace_nodes,
    })
    return r


BUILTINS = _builtin_registry()


def call(qname: str, *args) -> Column:
    """Resolve+apply against the builtin registry (user modules: construct
    your own ModuleRegistry or load_module onto BUILTINS)."""
    return BUILTINS.call(qname, *args)
