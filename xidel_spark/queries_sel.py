"""Selector-engine driver-contract queries: XPath axes, CSS selection,
and parse-html extraction (the -e/-f surface beyond plain '//a').

Column names/types match oracle_sel.py exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus
from .extract.links import compile_selector, extract_links


def q_xpath_axes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'//a[1]/following-sibling::a/@href' over the interleaved-spans table:
    positional predicate + sibling axis through the generic node-tree engine
    (tests/tests.sh:594 semantics). Expected = every link except each
    document's first (idx >= 1 in the shared arithmetic)."""
    docs = corpus.synth_docs(spark, sf_dir)
    return extract_links(docs, "//a[1]/following-sibling::a/@href").select(
        F.col("src").alias("url"), "idx", "dst"
    )


def q_css_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSS group 'text + a, img[src]' (adjacent-sibling combinator +
    attribute selector + union, readme.txt:282-285): the anchor right after
    the first text chunk, plus every image — resolved to resource refs in
    document order."""
    docs = corpus.synth_docs(spark, sf_dir)
    return extract_links(docs, "text + a, img[src]").select(
        F.col("src").alias("url"), "idx", "dst"
    )


def q_parse_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse-html doc loader (xidelbase.pas parse-* / --input-format=html):
    deterministic HTML synthesized per doc, parsed by the Arrow-batched
    tree builder, then '//p[@class=\\'c1\\']/text()' through the compiler."""
    from .extract.nodes import parse_html_nodes

    base = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    html = F.format_string(
        '<html><body><h1 id="h%d">T%d</h1><p class="c%d">P%d</p>'
        '<p class="c%d">Q%d</p></body></html>',
        d, d, (d % 3).cast("long"), d, ((d + 1) % 3).cast("long"), d,
    )
    sel = compile_selector("//p[@class='c1']/text()")
    # the UDF output must be a materialized column before lambda use —
    # Catalyst rejects Python UDF calls inside higher-order functions
    parsed = base.select(d.alias("doc_id"), parse_html_nodes(html).alias("nodes"))
    return parsed.select(
        "doc_id", F.explode(sel.values(F.col("nodes"))).alias("value")
    )


def q_node_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node-function batch over parsed HTML: deep-text (descendant text),
    inner-text (script/style-hidden, whitespace-collapsed), is-nth, and an
    expression predicate through the round-3 unified compiler — the §2.3
    HTML/node row's driver gate."""
    from .extract.nodefn import deep_text, inner_text, is_nth
    from .extract.nodes import parse_html_nodes
    from .extract.xpath import compile_xpath

    base = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    html = F.format_string(
        "<html><body><p>A%d  B</p><script>junk%d</script><p>C%d</p></body></html>",
        d, d, d,
    )
    parsed = base.select(d.alias("doc_id"), parse_html_nodes(html).alias("nodes"))
    sel = compile_xpath("//p[position() = last()]")
    nodes = F.col("nodes")
    return parsed.select(
        "doc_id",
        deep_text(nodes).alias("deep"),
        inner_text(nodes).alias("visible"),
        is_nth(F.col("doc_id") + 1, 3, 1).alias("nth"),
        F.element_at(sel.values(nodes), 1).alias("last_p"),
    )


SEL_QUERIES = {
    "xpath_axes": q_xpath_axes,
    "css_select": q_css_select,
    "parse_html_extract": q_parse_html,
    "node_functions": q_node_functions,
}
