"""Byte-exact output serializers for the reference's format matrix.

Pinned by /root/reference/tests/output/{adhoc1,adhoc3,json1,json3,bash1,
bash3} (tests/tests.sh:132-175). Input is the ordered variable change log
(per document, in processing order):

- adhoc: raw values when only the default 'result' variable exists,
  otherwise 'name := value' lines (xidelbase.pas:2486-2504).
- json-wrapped: a JSON array of per-document objects; variables in
  first-assignment order; multi-assigned variables become arrays; items
  joined with ', \\n' (readme.txt:500-502).
- bash: scalar first, then promote-to-array on the second assignment:
  x='a' / x[0]="$x" / x[1]='b'; indexes continue globally (xidelcrt.pas
  bash mode).

The formatting itself is a driver-side serializer over an already-reduced
log (exactly the reference's output layer); the DataFrame wrappers collect
per-document condensed logs computed distributed-side.
"""

from __future__ import annotations


def adhoc_lines(log: list[tuple[str, str]]) -> list[str]:
    names = {n for n, _ in log}
    if names <= {"result"}:
        return [v for _, v in log]
    return [f"{n} := {v}" for n, v in log]


def _jq(v: str) -> str:
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


def json_wrapped(docs: list[list[tuple[str, str]]]) -> str:
    doc_strs = []
    for log in docs:
        order: list[str] = []
        vals: dict[str, list[str]] = {}
        for n, v in log:
            if n not in vals:
                order.append(n)
                vals[n] = []
            vals[n].append(v)
        entries = []
        for n in order:
            if len(vals[n]) > 1:
                entries.append(f'"{n}": [' + ", ".join(_jq(v) for v in vals[n]) + "]")
            else:
                entries.append(f'"{n}": ' + _jq(vals[n][0]))
        doc_strs.append("{\n" + ", \n".join(entries) + "\n}")
    return "[\n" + ", \n".join(doc_strs) + "\n]"


def bash_lines(log: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    counts: dict[str, int] = {}
    for n, v in log:
        q = "'" + v.replace("'", "'\\''") + "'"
        c = counts.get(n, 0)
        if c == 0:
            out.append(f"{n}={q}")
        elif c == 1:
            out.append(f'{n}[0]="${n}"')
            out.append(f"{n}[1]={q}")
        else:
            out.append(f"{n}[{c}]={q}")
        counts[n] = c + 1
    return out


# ---------------------------------------------------------------------------
# --output-separator / --output-header / --output-footer / --output-declaration
# (xidelcrt.pas:148-252 initOutput/writeOutputHeader/needRawWrapper; byte-
# exact vs tests/output/{separator-adhoc,separator-xml,separator-html,
# separator-xml2,separator-html2,xmlraw1c})
# ---------------------------------------------------------------------------

_DEFAULT_DECLARATION = {
    "xml": '<?xml version="1.0" encoding="{enc}"?>',
    "xml-wrapped": '<?xml version="1.0" encoding="{enc}"?>',
    "html": "<!DOCTYPE html>",
}
_RAW_WRAPPER = {
    "xml": ("<xml>", "</xml>"),
    "xml-wrapped": ("<xml>", "</xml>"),
    "html": ("<html><body>", "</body></html>"),
}


def format_item(fmt: str, name: str | None, value: str) -> str:
    """one output item: adhoc 'name := value', xml '<name>v</name>',
    html '<span class=\"name\">v</span>' — unnamed values print raw."""
    if name is None or name == "result":
        return value
    if fmt in ("xml", "xml-wrapped"):
        return f"<{name}>{value}</{name}>"
    if fmt == "html":
        return f'<span class="{name}">{value}</span>'
    return f"{name} := {value}"


def serialize_document(
    items: list[tuple[str | None, str]],
    fmt: str = "adhoc",
    separator: str | None = None,
    header: str | None = None,
    footer: str | None = None,
    declaration: str | None = None,
    encoding: str = "UTF-8",
) -> str:
    """Assemble one output document under the reference's rules:

    - declaration defaults per format (xml prolog with the output encoding,
      html doctype); an explicit --output-declaration overrides it; a line
      break follows the declaration for the raw xml/html formats.
    - with no explicit header, xml/html get the raw wrapper
      (<xml>/<html><body>); the wrapper's closing tag is preceded by a
      line break ONLY when the separator is the default line ending, and
      always followed by one. An explicit footer is written verbatim.
    - items are joined with the separator (default: line ending); adhoc
      with neither header nor footer ends with a line break.
    """
    sep = "\n" if separator is None else separator
    decl = declaration
    if decl is None:
        decl = _DEFAULT_DECLARATION.get(fmt, "").format(enc=encoding)
    parts: list[str] = []
    if decl:
        parts.append(decl)
        if header is not None:
            parts.append("\n")
        elif fmt in ("xml", "xml-wrapped", "html"):
            parts.append("\n")  # implicit break after declaration (raw xml/html)
    wrapper_footer = None
    if header is not None:
        parts.append(header)
    elif fmt in _RAW_WRAPPER:
        h, f = _RAW_WRAPPER[fmt]
        le = "\n" if separator is None else ""
        parts.append(h)
        if separator is None:
            parts.append("\n")
        if footer is None:
            wrapper_footer = le + f + "\n"
    formatted = [format_item(fmt, n, v) for n, v in items]
    body = sep.join(formatted)
    parts.append(body)
    if footer is not None:
        parts.append(footer)
    elif wrapper_footer is not None:
        parts.append(wrapper_footer)
    elif items:
        # the final line ending is written only when the LAST WRITTEN char
        # is not already a line break (xidelcrt.pas:280); separators don't
        # count as written chars, so a trailing EMPTY item still gets its
        # blank line (jsonmode/default's final name(())) while a value
        # ending in '\n' does not double it (post7/post8 whole-document
        # string values)
        lastch = next((f[-1] for f in reversed(formatted) if f), "")
        if lastch not in ("\n", "\r"):
            parts.append("\n")
    return "".join(parts)


def encode_output(s: str, encoding: str = "UTF-8") -> bytes:
    """--output-encoding: the final byte stream (utf-8 default; latin1 and
    friends for legacy consumers; characters outside the target charset
    raise, matching the reference's strict conversion)."""
    return s.encode(encoding)
