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


def bash_vars(log: DataFrame) -> DataFrame:
    """--output-format bash: var='value' lines with single-quote escaping
    (xidelcrt.pas bash mode)."""
    esc = F.regexp_replace(F.col("value").cast("string"), "'", "'\\\\''")
    return log.select(
        F.concat(F.col("var_name"), F.lit("='"), esc, F.lit("'")).alias("line")
    )
