"""Output writer — the reference's serialization formats on DataFrames.

xidelcrt.pas:42-51 enumerates the formats (readme.txt:467-509):
adhoc, xml, html, xml-wrapped, json-wrapped, bash, cmd. Re-expressed as
column transforms producing one text line per item (df.write.text-ready)
or one wrapped blob per document — serialization is Catalyst expressions,
not driver-side string building, so it distributes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _xml_escape(c: Column) -> Column:
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def adhoc(values: DataFrame, value_col: str = "value") -> DataFrame:
    """default output: one line per extracted value (xidelcrt adhoc)."""
    return values.select(F.col(value_col).cast("string").alias("line"))


def xml_wrapped(values: DataFrame, value_col: str = "value") -> DataFrame:
    """--output-format xml: <e>v</e> per item (collection wrapper is a
    constant header/footer added at write time)."""
    return values.select(
        F.concat(F.lit("<e>"), _xml_escape(F.col(value_col).cast("string")), F.lit("</e>")).alias("line")
    )


def json_wrapped(values: DataFrame, value_col: str = "value", group_col: str | None = None) -> DataFrame:
    """--output-format json-wrapped: one JSON array of the values (per
    group when group_col given)."""
    # backslash first, then quotes — mirrors golden_output._jq; escaping
    # quotes alone would emit invalid JSON for values containing backslashes
    esc = F.regexp_replace(F.col(value_col).cast("string"), r"\\", r"\\\\")
    esc = F.regexp_replace(esc, '"', '\\\\"')
    item = F.concat(F.lit('"'), esc, F.lit('"'))
    if group_col is None:
        gb = values.select(item.alias("item")).agg(F.collect_list("item").alias("items"))
    else:
        gb = values.select(F.col(group_col), item.alias("item")).groupBy(group_col).agg(
            F.collect_list("item").alias("items")
        )
    return gb.select(
        *([group_col] if group_col else []),
        F.concat(F.lit("["), F.array_join("items", ", "), F.lit("]")).alias("line"),
    )


def html_wrapped(nodes: DataFrame, tag_col: str = "tag", ref_col: str = "ref",
                 text_col: str = "text") -> DataFrame:
    """--output-format html (ofRawHTML, xidelcrt.pas:42): outer-HTML of
    each matched element, one per line; write-time wrapper is
    '<!DOCTYPE html>\\n<html><body>' / '</body></html>' (html_header/
    html_footer below). Golden tests/output/htmlraw1."""
    attr = F.when(
        F.col(ref_col).isNotNull(),
        F.concat(F.lit(' href="'), _xml_escape(F.col(ref_col)), F.lit('"')),
    ).otherwise(F.lit(""))
    return nodes.select(
        F.concat(
            F.lit("<"), F.col(tag_col), attr, F.lit(">"),
            _xml_escape(F.col(text_col).cast("string")),
            F.lit("</"), F.col(tag_col), F.lit(">"),
        ).alias("line")
    )


HTML_HEADER = "<!DOCTYPE html>\n<html><body>"
HTML_FOOTER = "</body></html>"


def cmd_vars(log: DataFrame, percent_escape: str = "%") -> DataFrame:
    """--output-format cmd (ofWindowsCmd): SET var=<first>, SET var[i]=v
    per value, SET #var=N per variable (golden tests/output/cmd1).
    percent_escape mirrors windowsCmdPercentageEscape: '%%' for .bat,
    '^%' for `for /f` (xidelcrt.pas:178-185)."""
    repl = "%%" if percent_escape == "%" else percent_escape + "%"
    esc = F.regexp_replace(F.col("value").cast("string"), "%", repl)
    w_var = Window.partitionBy("var_name").orderBy("seq_index")
    # every line of a variable groups at the variable's FIRST appearance
    first = F.min("seq_index").over(Window.partitionBy("var_name"))
    indexed = log.withColumn("__i", F.row_number().over(w_var) - 1).withColumn(
        "__ord", first
    )
    scalar = (
        indexed.where(F.col("__i") == 0)
        .select(
            "var_name", "__ord", F.lit(0).alias("__k"),
            F.concat(F.lit("SET "), F.col("var_name"), F.lit("="), esc).alias("line"),
        )
    )
    element = indexed.select(
        "var_name", "__ord", (F.col("__i") + 1).alias("__k"),
        F.concat(
            F.lit("SET "), F.col("var_name"), F.lit("["), F.col("__i"), F.lit("]="), esc
        ).alias("line"),
    )
    counts = (
        log.groupBy("var_name")
        .agg(F.count(F.lit(1)).alias("n"), F.min("seq_index").alias("__ord"))
        .select(
            "var_name", "__ord", F.lit(1 << 30).alias("__k"),
            F.concat(F.lit("SET #"), F.col("var_name"), F.lit("="), F.col("n")).alias("line"),
        )
    )
    return (
        scalar.unionByName(element).unionByName(counts)
        .orderBy("__ord", "__k")
        .select("line")
    )


def bash_vars(log: DataFrame) -> DataFrame:
    """--output-format bash: var='value' lines with single-quote escaping
    (xidelcrt.pas bash mode)."""
    esc = F.regexp_replace(F.col("value").cast("string"), "'", "'\\\\''")
    return log.select(
        F.concat(F.col("var_name"), F.lit("='"), esc, F.lit("'")).alias("line")
    )


def assemble_document(
    values: DataFrame,
    value_col: str = "value",
    name_col: str | None = None,
    order_col: str | None = None,
    fmt: str = "adhoc",
    separator: str | None = None,
    header: str | None = None,
    footer: str | None = None,
    declaration: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Distributed --output-separator/-header/-footer/-declaration assembly:
    items are formatted per format as column expressions, sort-merged into
    ONE document string (single-row result — an output document is one
    artifact by definition; the per-item formatting and ordering stay
    distributed). Byte semantics match golden_output.serialize_document.
    Returns a one-row DataFrame (line STRING, bytes BINARY)."""
    from .golden_output import _DEFAULT_DECLARATION, _RAW_WRAPPER

    v = F.col(value_col).cast("string")
    if name_col is not None:
        n = F.col(name_col)
        named = (
            F.when(
                n.isNull() | (n == "result"), v
            )
        )
        if fmt in ("xml", "xml-wrapped"):
            named = named.otherwise(F.concat(F.lit("<"), n, F.lit(">"), v, F.lit("</"), n, F.lit(">")))
        elif fmt == "html":
            named = named.otherwise(
                F.concat(F.lit('<span class="'), n, F.lit('">'), v, F.lit("</span>"))
            )
        else:
            named = named.otherwise(F.concat(n, F.lit(" := "), v))
        item = named
    else:
        item = v
    ordered = values.select(item.alias("__item"), *(
        [F.col(order_col).alias("__ord")] if order_col else []
    ))
    if order_col:
        agg = ordered.agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__ord", "__item"))),
                    lambda s: s["__item"],
                ),
                "\n" if separator is None else separator,
            ).alias("body")
        )
    else:
        agg = ordered.agg(
            F.array_join(F.collect_list("__item"), "\n" if separator is None else separator).alias("body")
        )
    decl = declaration
    if decl is None:
        decl = _DEFAULT_DECLARATION.get(fmt, "").format(enc=encoding)
    pre = ""
    if decl:
        pre = decl + ("\n" if (header is not None or fmt in ("xml", "xml-wrapped", "html")) else "")
    post = ""
    if header is not None:
        pre += header
    elif fmt in _RAW_WRAPPER:
        h, f = _RAW_WRAPPER[fmt]
        le = "\n" if separator is None else ""
        pre += h + ("\n" if separator is None else "")
        if footer is None:
            post = le + f + "\n"
    if footer is not None:
        post = footer
    line = F.concat(F.lit(pre), F.col("body"), F.when(
        F.lit(footer is not None or post != ""), F.lit(post)
    ).otherwise(F.when(F.col("body").endswith("\n"), F.lit("")).otherwise(F.lit("\n"))))
    return agg.select(line.alias("line"), F.encode(line, encoding.lower()).alias("bytes"))
