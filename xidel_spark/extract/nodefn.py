"""Node-function stragglers — deep-text, is-nth, transform()/x:replace-nodes
(reference: web/functions.xml:307-349; changelog:9-18 'x:replace-nodes to
replace nodes (replacing the deprecated pxp:transform function)').

All pure Catalyst over the node-array representation (extract/nodes.py):
no Python, no shuffle — per-row array rewrites that Tungsten vectorizes.
Structural splices (inserting/removing subtrees) change array shape and
are out of scope for the shape-preserving forms here; the reference's own
transform() is also per-node replacement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deep_text(nodes: Column, ctx_id: Column | int = 0, sep: str = "") -> Column:
    """pxp:deep-text([sep]) — the concatenated descendant text of the
    context node in document order (web/functions.xml:323). Node ids are
    pre-order, so a filter over the ancestor arrays IS document order."""
    cid = F.lit(ctx_id).cast("int") if isinstance(ctx_id, int) else ctx_id.cast("int")
    texts = F.transform(
        F.filter(
            nodes,
            lambda n: (F.array_contains(n["anc"], cid) | (n["id"] == cid))
            & (n["tag"] == "#text"),
        ),
        lambda n: n["text"],
    )
    return F.array_join(texts, sep)


def inner_text(nodes: Column, ctx_id: Column | int = 0) -> Column:
    """pxp:inner-text (changelog:11 'visible text from a HTML page, no
    full CSS support'): descendant text with whitespace runs collapsed and
    script/style subtrees dropped — the reference's no-stylesheet
    approximation."""
    cid = F.lit(ctx_id).cast("int") if isinstance(ctx_id, int) else ctx_id.cast("int")

    # a text node is hidden when any ancestor is <script>/<style>; node ids
    # are dense so the ancestor tags resolve through element_at
    def is_visible_text(n):
        anc_hidden = F.exists(
            n["anc"],
            lambda a: F.element_at(nodes, a.cast("int") + 1)["tag"].isin(
                "script", "style"
            ),
        )
        return (
            (F.array_contains(n["anc"], cid) | (n["id"] == cid))
            & (n["tag"] == "#text")
            & ~anc_hidden
        )

    texts = F.transform(F.filter(nodes, is_visible_text), lambda n: n["text"])
    return F.trim(F.regexp_replace(F.array_join(texts, " "), r"\s+", " "))


def is_nth(n: Column, a: Column | int, b: Column | int) -> Column:
    """pxp:is-nth(n, a, b) — true iff n = a·i + b for some integer i ≥ 0
    (the CSS :nth-child(an+b) arithmetic, web/functions.xml:309)."""
    a = F.lit(a) if isinstance(a, int) else a
    b = F.lit(b) if isinstance(b, int) else b
    return F.when(a == 0, n == b).otherwise(
        ((n - b) % a == 0) & ((n - b) / a >= 0)
    )


def transform_nodes(nodes: Column, fn) -> Column:
    """transform(node, f) (readme.txt:232-236) — apply `fn` to every node
    and keep the returned node: the reference 'calls the transformer-
    function for every descendant node and replaces the node with the
    value returned'. `fn` maps a node struct Column → node struct Column
    (shape-preserving: tag/attrs/text rewrites; identity = pass-through).
    """
    return F.transform(nodes, fn)


def replace_nodes(nodes: Column, match_ids: Column, **field_updates) -> Column:
    """x:replace-nodes (changelog:14) — nodes whose id is in `match_ids`
    (an array<int>, e.g. CompiledXPath.ids) get the given fields replaced;
    field values may be Columns or callables node→Column.

        replace_nodes(nodes, sel.ids(nodes), text=F.lit("REDACTED"))
        replace_nodes(nodes, ids, tag=F.lit("b"))
    """

    def rewrite(n):
        hit = F.array_contains(match_ids, n["id"])
        fields = []
        for name in ("id", "parent", "pos", "tag", "attrs", "text", "anc"):
            if name in field_updates:
                v = field_updates[name]
                col = v(n) if callable(v) else v
                fields.append(F.when(hit, col).otherwise(n[name]).alias(name))
            else:
                fields.append(n[name].alias(name))
        return F.struct(*fields)

    return F.transform(nodes, rewrite)


def set_attr(nodes: Column, match_ids: Column, name: str, value) -> Column:
    """attribute rewrite via x:replace-nodes: set/overwrite one attribute
    on the matched nodes (value: Column or node→Column callable)."""

    def upd(n):
        v = value(n) if callable(value) else value
        return F.map_concat(
            F.map_filter(n["attrs"], lambda k, _: k != name),
            F.create_map(F.lit(name), v),
        )

    return replace_nodes(nodes, match_ids, attrs=upd)
