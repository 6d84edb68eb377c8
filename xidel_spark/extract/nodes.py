"""Node-tree model for the selector engine.

The reference evaluates XPath/CSS over a parsed DOM (internettools
simplehtmltreeparser; dispatch at xidelbase.pas:2540-2543). The Spark-first
re-expression keeps one *node array per document row* — a pre-order list of
``NODE`` structs — so every axis step is per-row array algebra (Catalyst
higher-order functions), never a join or shuffle. Documents evaluate in
parallel across partitions; a selector over 100 TB of pages is exactly as
shuffle-free as a `length(text)` projection.

Node encoding (invariant: ``nodes[i].id == i - 1``, i.e. array position is
id+1, ids are pre-order document order):

    id     int                 pre-order index; 0 is the synthetic #doc root
    parent int                 parent id (-1 for the root)
    pos    int                 1-based index among ELEMENT siblings (0 for
                               text/placeholder nodes) — CSS :nth-child
    tag    string              element name; '#doc' root, '#text' text node,
                               '#skip' dead placeholder (never matches)
    attrs  map<string,string>  attributes
    text   string              string-value (concatenated descendant text)
    anc    array<int>          ancestor ids root-first — makes descendant::
                               and ancestor:: O(depth) membership tests

Two constructors:
- `spans_to_nodes` — pure Catalyst, for the interleaved-spans documents
  table (BASELINE.json input_hint): spans become element children of the
  root, each with one '#text' child.
- `parse_html_nodes` / `parse_xml_nodes` — the `parse-html`/`parse-xml`
  doc loaders (xidelbase.pas parse-* / --input-format): Arrow-batched
  pandas UDF over raw markup (parsing is inherently not expressible in
  Catalyst; the batch transfer keeps it off the row-at-a-time path, the
  north star's "vectorized Arrow UDF extraction stage").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

NODE_FIELDS = StructType(
    [
        StructField("id", IntegerType()),
        StructField("parent", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("tag", StringType()),
        StructField("attrs", MapType(StringType(), StringType())),
        StructField("text", StringType()),
        StructField("anc", ArrayType(IntegerType())),
    ]
)
NODES_TYPE = ArrayType(NODE_FIELDS)

# span kind → element tag the reference's selectors use ('//a' must match
# anchor spans but NOT the fixture's <ad href=..> span, golden tests/output/tef)
_KIND_TAG = {"link": "a", "image": "img"}
# attribute carrying the span's media_ref, per kind
_REF_ATTR = {"image": "src"}

_I = lambda v: F.lit(v).cast("int")  # noqa: E731


def _span_tag(kind: Column) -> Column:
    out = kind
    for k, tag in _KIND_TAG.items():
        out = F.when(kind == k, F.lit(tag)).otherwise(out)
    return out


def _span_attrs(kind: Column, media_ref: Column) -> Column:
    name = F.when(kind == "image", F.lit("src")).otherwise(F.lit("href"))
    return F.when(
        media_ref.isNotNull(), F.map_from_arrays(F.array(name), F.array(media_ref))
    ).otherwise(F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")))


def spans_to_nodes(spans: Column) -> Column:
    """interleaved spans → node array (root + one element per span, each
    element with one '#text' child so `text()` steps work uniformly).

    Ids are fixed arithmetic (element 2i+1, its text child 2i+2) so the
    position==id+1 invariant holds without a running counter; a span with
    NULL text still emits its child slot as a '#skip' placeholder that no
    node test matches.
    """
    ss = F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    root = F.struct(
        _I(0).alias("id"),
        _I(-1).alias("parent"),
        _I(0).alias("pos"),
        F.lit("#doc").alias("tag"),
        empty_map.alias("attrs"),
        F.lit(None).cast("string").alias("text"),
        F.array().cast("array<int>").alias("anc"),
    )

    def pair(s, i):
        eid = (F.lit(2) * i + 1).cast("int")
        elem = F.struct(
            eid.alias("id"),
            _I(0).alias("parent"),
            (i + 1).cast("int").alias("pos"),
            _span_tag(s["kind"]).alias("tag"),
            _span_attrs(s["kind"], s["media_ref"]).alias("attrs"),
            s["text"].alias("text"),
            F.array(_I(0)).alias("anc"),
        )
        tchild = F.struct(
            (eid + 1).cast("int").alias("id"),
            eid.alias("parent"),
            _I(0).alias("pos"),
            F.when(s["text"].isNotNull(), F.lit("#text")).otherwise(F.lit("#skip")).alias("tag"),
            empty_map.alias("attrs"),
            s["text"].alias("text"),
            F.array(_I(0), eid).alias("anc"),
        )
        return F.array(elem, tchild)

    return F.concat(F.array(root), F.flatten(F.transform(ss, pair)))


# ---------------------------------------------------------------------------
# parse-html / parse-xml loaders (Arrow-batched)
# ---------------------------------------------------------------------------

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _parse_html_py(html: str | None, wrap: bool = True, keep_pis: bool = True) -> list[dict] | None:
    """stdlib-HTMLParser → node dicts. Mirrors the reference's lenient tree
    builder: void elements never nest, stray end tags pop to the nearest
    open match, fragments get an implicit html/body wrapper (the reference
    pins '/html/body/a' on a bare '<a>' fragment, tests.sh:597)."""
    if html is None:
        return None
    import re as _re
    from html.parser import HTMLParser

    # full processing instructions terminate at '?>' (HTMLParser stops at
    # the first '>'): stash them and re-emit as #pi nodes from text
    # position (golden pinode-xml keeps PI bytes exactly)
    _pis: list[str] = []

    def _stash(m):
        _pis.append(m.group(1))
        return f"\x00PI{len(_pis) - 1}\x00"

    if keep_pis:
        html = _re.sub(r"<\?(?!xml\b)(.*?)\?>", _stash, html, flags=_re.S)

    nodes: list[dict] = [
        {"id": 0, "parent": -1, "pos": 0, "tag": "#doc", "attrs": {},
         "text": None, "anc": []}
    ]
    stack = [0]  # ids of open elements
    child_elems = {0: 0}

    def add(tag, attrs, text):
        nid = len(nodes)
        parent = stack[-1]
        if tag.startswith("#"):
            pos = 0
        else:
            child_elems[parent] = child_elems.get(parent, 0) + 1
            pos = child_elems[parent]
        nodes.append(
            {"id": nid, "parent": parent, "pos": pos, "tag": tag,
             "attrs": attrs, "text": text,
             "anc": nodes[parent]["anc"] + [parent] if parent >= 0 else []}
        )
        return nid

    # tags whose open implies closing a same-tag (or listed) predecessor —
    # '<ol><li>a<li>b' nests the li's as SIBLINGS (golden regression_htmlparse)
    _IMPLIED_END = {
        "li": {"li"}, "p": {"p"}, "td": {"td", "th"}, "th": {"td", "th"},
        "tr": {"tr"}, "option": {"option"}, "dd": {"dd", "dt"},
        "dt": {"dd", "dt"},
    }

    class P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            closes = _IMPLIED_END.get(tag)
            if closes and len(stack) > 1 and nodes[stack[-1]]["tag"] in closes:
                stack.pop()
            amap = {}
            for k, v in attrs:
                amap.setdefault(k, v if v is not None else "")
            nid = add(tag, amap, None)
            if tag not in _VOID:
                stack.append(nid)

        def handle_startendtag(self, tag, attrs):
            amap = {}
            for k, v in attrs:
                amap.setdefault(k, v if v is not None else "")
            add(tag, amap, None)

        def handle_endtag(self, tag):
            for i in range(len(stack) - 1, 0, -1):
                if nodes[stack[i]]["tag"] == tag:
                    del stack[i:]
                    return
            # stray end tag: ignored (lenient)

        def handle_data(self, data):
            if not data:
                return
            parts = _re.split(r"\x00PI(\d+)\x00", data)
            for j, part in enumerate(parts):
                if j % 2 == 1:
                    add("#pi", {}, _pis[int(part)])
                elif part:
                    add("#text", {}, part)

        def handle_pi(self, data):
            pass  # unstashed PIs (xml declaration / forced-html mode) drop

    parser = P(convert_charrefs=True)
    parser.feed(html)
    parser.close()

    top = [n for n in nodes if n["parent"] == 0 and not n["tag"].startswith("#")]
    if wrap and not (len(top) >= 1 and top[0]["tag"] == "html"):
        nodes = _wrap_html_body(nodes)
    _fill_string_values(nodes)
    return nodes


def _wrap_html_body(nodes: list[dict]) -> list[dict]:
    """Re-root a fragment forest under synthetic html/head/body (ids
    renumbered to keep the pre-order position==id+1 invariant; the empty
    <head/> matches the reference's tree builder — golden
    tests/output/inputformatAutoA serializes <html><head/><body>…)."""
    out = [
        {"id": 0, "parent": -1, "pos": 0, "tag": "#doc", "attrs": {}, "text": None, "anc": []},
        {"id": 1, "parent": 0, "pos": 1, "tag": "html", "attrs": {}, "text": None, "anc": [0]},
        {"id": 2, "parent": 1, "pos": 1, "tag": "head", "attrs": {}, "text": None, "anc": [0, 1]},
        {"id": 3, "parent": 1, "pos": 2, "tag": "body", "attrs": {}, "text": None, "anc": [0, 1]},
    ]
    remap = {0: 3}  # old root's children now hang off body (id 3)
    for n in nodes[1:]:
        new = dict(n)
        new["id"] = len(out)
        new["parent"] = remap[n["parent"]]
        new["anc"] = out[new["parent"]]["anc"] + [new["parent"]]
        remap[n["id"]] = new["id"]
        out.append(new)
    return out


# root tags the reference's auto-detection treats as HTML (fragments whose
# top element is a known HTML tag get the html/head/body wrapper; anything
# else parses as plain XML — goldens inputformatAutoA vs inputformatAutoC)
_HTML_TAGS = {
    "html", "head", "body", "a", "p", "div", "span", "table", "tr", "td",
    "th", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6", "title",
    "b", "i", "em", "strong", "img", "br", "form", "input", "script",
    "style", "pre", "code", "section", "article", "nav", "header", "footer",
}


def _parse_auto_py(markup: str | None) -> list[dict] | None:
    """--input-format auto: HTML when the root element is a known HTML tag,
    XML otherwise."""
    if markup is None:
        return None
    import re

    import re as _re
    if _re.search(r"<\?(?!xml\b)", markup):
        return _parse_html_py(markup, wrap=False)
    if "<!ENTITY" in markup:
        # internal-DTD entity declarations: the default (lenient) mode does
        # NOT process the DTD — entity references stay raw text (golden
        # dtd-broken; only --input-format xml-strict resolves them). Strip
        # the DOCTYPE block first: stdlib HTMLParser mis-splits an internal
        # subset at the first '>' and would leak ']>' as text.
        stripped = re.sub(r"<!DOCTYPE[^\[>]*(\[[^\]]*\])?\s*>", "", markup)
        return _parse_html_py(stripped, wrap=False)
    m = re.search(r"<\s*([a-zA-Z][\w-]*)", markup)
    tag = (m.group(1).lower() if m else "")
    if tag in _HTML_TAGS:
        return _parse_html_py(markup)
    # non-HTML root that fails strict XML (broken entities etc.) parses
    # leniently but WITHOUT the html/body wrapper — '/x' still matches
    # (golden adhoc7: '<x>&nbsp;&auml;...' keeps its own root)
    return _parse_xml_py(markup) or _parse_html_py(markup, wrap=False)


def _parse_xml_py(xml: str | None) -> list[dict] | None:
    if xml is None:
        return None
    import xml.etree.ElementTree as ET

    try:
        parser = ET.XMLParser(target=ET.TreeBuilder(insert_pis=True))
        root = ET.fromstring(xml, parser=parser)
    except ET.ParseError:
        return None
    nodes: list[dict] = [
        {"id": 0, "parent": -1, "pos": 0, "tag": "#doc", "attrs": {}, "text": None, "anc": []}
    ]

    def walk(el, parent, pos, parent_ns=""):
        nid = len(nodes)
        tag = el.tag if isinstance(el.tag, str) else "#pi"
        if tag == "#pi":
            # tails are appended by the parent loop like any child's
            nodes.append(
                {"id": nid, "parent": parent, "pos": 0, "tag": "#pi",
                 "attrs": {}, "text": el.text,
                 "anc": nodes[parent]["anc"] + [parent]}
            )
            return
        ns = ""
        if tag.startswith("{"):
            ns, tag = tag[1:].split("}", 1)
        attrs = dict(el.attrib)
        if ns != parent_ns:
            # ET strips xmlns declarations; re-materialize the default-ns
            # change so serialization round-trips (golden namespace1)
            attrs = {"xmlns": ns, **attrs}
        nodes.append(
            {"id": nid, "parent": parent, "pos": pos, "tag": tag,
             "attrs": attrs, "text": None,
             "anc": nodes[parent]["anc"] + [parent]}
        )
        if el.text:
            nodes.append(
                {"id": len(nodes), "parent": nid, "pos": 0, "tag": "#text",
                 "attrs": {}, "text": el.text, "anc": nodes[nid]["anc"] + [nid]}
            )
        cpos = 0
        for child in el:
            cpos += 1
            walk(child, nid, cpos, ns)
            if child.tail:
                nodes.append(
                    {"id": len(nodes), "parent": nid, "pos": 0, "tag": "#text",
                     "attrs": {}, "text": child.tail, "anc": nodes[nid]["anc"] + [nid]}
                )

    walk(root, 0, 1)
    _fill_string_values(nodes)
    return nodes


def _fill_string_values(nodes: list[dict]) -> None:
    """element.text := concatenated descendant text (XPath string-value),
    computed in one reverse pre-order pass."""
    parts: dict[int, list[str]] = {n["id"]: [] for n in nodes}
    for n in nodes:
        if n["tag"] == "#text" and n["text"]:
            for a in n["anc"]:
                parts[a].append(n["text"])
    for n in nodes:
        if not n["tag"].startswith("#"):
            n["text"] = "".join(parts[n["id"]])
    if nodes:
        nodes[0]["text"] = "".join(parts[0])


def _esc_text(s: str) -> str:
    # the reference's writer escapes quotes in TEXT nodes too (golden
    # pinode-html: " -> &quot;, ' -> &apos;)
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&apos;"))


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


def outer_xml_py(nodes: list[dict] | None, root_id: int = 0) -> str | None:
    """outer-xml()/outer-html(): serialize the subtree at root_id —
    self-closing empties (<head/>), escaped text/attributes; id 0 (the
    #doc node) serializes its children (golden inputformatAutoA:
    '<html><head/><body><a>x</a></body></html>')."""
    if nodes is None:
        return None
    kids: dict[int, list[int]] = {}
    for n in nodes:
        kids.setdefault(n["parent"], []).append(n["id"])
    byid = {n["id"]: n for n in nodes}

    def ser(nid: int) -> str:
        n = byid[nid]
        if n["tag"] == "#text":
            return _esc_text(n["text"] or "")
        if n["tag"] == "#skip":
            return ""
        if n["tag"] == "#pi":
            return f"<?{n['text'] or ''}?>"
        inner = "".join(ser(c) for c in kids.get(nid, []))
        if n["tag"] == "#doc":
            return inner
        attrs = "".join(f' {k}="{_esc_attr(v or "")}"' for k, v in (n["attrs"] or {}).items())
        if not kids.get(nid):
            return f"<{n['tag']}{attrs}/>"
        return f"<{n['tag']}{attrs}>{inner}</{n['tag']}>"

    return ser(root_id)


def inner_xml_py(nodes: list[dict] | None, root_id: int = 0) -> str | None:
    """inner-xml()/inner-html(): the children's serialization only."""
    if nodes is None:
        return None
    kids = [n["id"] for n in nodes if n["parent"] == root_id]
    return "".join(outer_xml_py(nodes, k) or "" for k in kids)


@F.pandas_udf(StringType())
def outer_xml_udf(nodes: pd.Series, root_id: pd.Series) -> pd.Series:
    return pd.Series(
        [outer_xml_py(_rows_to_dicts(n), int(i)) for n, i in zip(nodes, root_id)],
        dtype="object",
    )


@F.pandas_udf(StringType())
def inner_xml_udf(nodes: pd.Series, root_id: pd.Series) -> pd.Series:
    return pd.Series(
        [inner_xml_py(_rows_to_dicts(n), int(i)) for n, i in zip(nodes, root_id)],
        dtype="object",
    )


def _rows_to_dicts(rows) -> list[dict] | None:
    if rows is None:
        return None
    return [
        {"id": r["id"], "parent": r["parent"], "pos": r["pos"], "tag": r["tag"],
         "attrs": r["attrs"], "text": r["text"], "anc": r["anc"]}
        for r in rows
    ]


def literal_nodes(markup: str) -> tuple[Column, list[int]]:
    """parse markup at COMPILE time (driver) into a CONSTANT node-array
    column — the backing for static document literals in expressions
    ('(<html>..</html>)//td'): navigation over them is then plain
    Catalyst over a literal, no per-row parse, no UDF. Returns
    (array column, ids of the top-level element nodes — the literal's
    VALUE per XQuery, not the synthetic #doc root). Parsed as XML (a
    direct constructor is XQuery XML — no HTML fragment wrapping);
    falls back to the lenient auto parser."""
    parsed = _parse_xml_py(markup)
    if parsed is None:
        parsed = _parse_auto_py(markup) or []
    return nodes_literal_column(parsed)


def nodes_literal_column(parsed: list[dict]) -> tuple[Column, list[int]]:
    """already-parsed node dicts → (constant node-array column, root ids).
    Shared by literal_nodes and the golden harness (which parses driver-
    side per --input-format and evaluates on spark.range(1))."""
    structs = []
    for n in parsed:
        attrs = n.get("attrs") or {}
        if attrs:
            kv = []
            for k, v in attrs.items():
                kv.append(F.lit(k))
                kv.append(F.lit(v if v is not None else ""))
            attrs_col = F.create_map(*kv)
        else:
            attrs_col = F.create_map().cast("map<string,string>")
        anc = n.get("anc") or []
        anc_col = (
            F.array(*[F.lit(a).cast("int") for a in anc])
            if anc
            else F.array().cast("array<int>")
        )
        structs.append(
            F.struct(
                F.lit(n["id"]).cast("int").alias("id"),
                F.lit(n["parent"]).cast("int").alias("parent"),
                F.lit(n["pos"]).cast("int").alias("pos"),
                F.lit(n["tag"]).alias("tag"),
                attrs_col.alias("attrs"),
                (F.lit(n["text"]) if n.get("text") is not None else F.lit(None).cast("string")).alias("text"),
                anc_col.alias("anc"),
            )
        )
    roots = [
        n["id"] for n in parsed
        if n.get("parent") == 0 and not str(n.get("tag", "")).startswith("#")
    ] or [0]
    if not structs:
        return F.array().cast(NODES_TYPE.simpleString()), roots
    return F.array(*structs), roots


def _esc_text_expr(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def _esc_attr_expr(c: Column) -> Column:
    return F.replace(_esc_text_expr(c), F.lit('"'), F.lit("&quot;"))


def _serialize_expr(nodes: Column, rid: Column, include_root: bool) -> Column:
    """Pure-Catalyst subtree serializer — byte-identical to outer_xml_py
    (self-closing empties, attr/text escaping, #doc emits children only).

    One F.aggregate pass over the pre-order subtree carrying
    (out, open-element stack): entering a node closes every stacked
    element that is not among its ancestors (ancestors always form a
    stack prefix in a tree), then emits text / <tag attrs> / <tag attrs/>.
    No Python — unlike the Arrow UDF this composes inside the expression
    language (UDFs cannot take HOF-derived arguments)."""
    in_subtree = lambda n: F.array_contains(n["anc"], rid) | (  # noqa: E731
        F.lit(include_root) & (n["id"] == rid)
    )
    sub = F.filter(nodes, lambda n: in_subtree(n) & (n["tag"] != "#skip"))
    init = F.struct(
        F.lit("").alias("out"),
        F.array().cast("array<struct<id:int,tag:string>>").alias("stack"),
    )

    def closings(stack_part: Column) -> Column:
        return F.array_join(
            F.transform(
                F.reverse(stack_part),
                lambda s: F.concat(F.lit("</"), s["tag"], F.lit(">")),
            ),
            "",
        )

    def step(acc, n):
        kept = F.filter(acc["stack"], lambda s: F.array_contains(n["anc"], s["id"]))
        popped = F.filter(
            acc["stack"], lambda s: ~F.array_contains(n["anc"], s["id"])
        )
        attrs = F.array_join(
            F.transform(
                F.map_entries(n["attrs"]),
                lambda e: F.concat(
                    F.lit(" "), e["key"], F.lit('="'),
                    _esc_attr_expr(F.coalesce(e["value"], F.lit(""))), F.lit('"'),
                ),
            ),
            "",
        )
        has_kids = F.exists(nodes, lambda m: m["parent"] == n["id"])
        emit = (
            F.when(n["tag"] == "#text", _esc_text_expr(F.coalesce(n["text"], F.lit(""))))
            .when(n["tag"] == "#pi",
                  F.concat(F.lit("<?"), F.coalesce(n["text"], F.lit("")), F.lit("?>")))
            .when(n["tag"] == "#doc", F.lit(""))
            .when(has_kids, F.concat(F.lit("<"), n["tag"], attrs, F.lit(">")))
            .otherwise(F.concat(F.lit("<"), n["tag"], attrs, F.lit("/>")))
        )
        pushes = F.when(
            (n["tag"] == "#text") | (n["tag"] == "#pi") | (n["tag"] == "#doc") | ~has_kids, kept
        ).otherwise(
            F.concat(kept, F.array(F.struct(n["id"].alias("id"), n["tag"].alias("tag"))))
        )
        return F.struct(
            F.concat(acc["out"], closings(popped), emit).alias("out"),
            pushes.alias("stack"),
        )

    out = F.aggregate(
        sub, init, step, lambda acc: F.concat(acc["out"], closings(acc["stack"]))
    )
    return F.when(nodes.isNull(), F.lit(None).cast("string")).otherwise(out)


def outer_xml_expr(nodes: Column, root_id: Column | int = 0) -> Column:
    rid = (F.lit(root_id) if isinstance(root_id, int) else root_id).cast("int")
    return _serialize_expr(nodes, rid, include_root=True)


def inner_xml_expr(nodes: Column, root_id: Column | int = 0) -> Column:
    rid = (F.lit(root_id) if isinstance(root_id, int) else root_id).cast("int")
    return _serialize_expr(nodes, rid, include_root=False)


def outer_xml(nodes: Column, root_id: Column | int = 0) -> Column:
    """outer-xml — Arrow UDF form: composes with an INLINE parse_* UDF
    column (the expr serializer cannot: Catalyst rejects Python UDFs under
    HOF lambdas in either nesting direction). Use outer_xml_expr on
    materialized node columns — pinned byte-equal, and the only form that
    composes inside the expression language."""
    rid = F.lit(root_id) if isinstance(root_id, int) else root_id
    return outer_xml_udf(nodes, rid)


def inner_xml(nodes: Column, root_id: Column | int = 0) -> Column:
    rid = F.lit(root_id) if isinstance(root_id, int) else root_id
    return inner_xml_udf(nodes, rid)


@F.pandas_udf(NODES_TYPE)
def parse_html_udf(htmls: pd.Series) -> pd.Series:
    return htmls.map(_parse_html_py)


@F.pandas_udf(NODES_TYPE)
def parse_auto_udf(markup: pd.Series) -> pd.Series:
    return markup.map(_parse_auto_py)


def parse_auto_nodes(markup: Column) -> Column:
    """--input-format auto analogue."""
    return parse_auto_udf(markup)


@F.pandas_udf(NODES_TYPE)
def parse_xml_udf(xmls: pd.Series) -> pd.Series:
    return xmls.map(_parse_xml_py)


def parse_html_nodes(markup: Column) -> Column:
    """fn:parse-html analogue: raw HTML column → node array column."""
    return parse_html_udf(markup)


def parse_xml_nodes(markup: Column) -> Column:
    return parse_xml_udf(markup)
