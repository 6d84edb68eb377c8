"""Link / span extraction over the interleaved documents table.

This is the vectorized replacement for the reference's follow-expression
evaluation (`-f '//a'` → element nodes resolved to @href via
``pxp:resolve-html(., $url)``, xidelbase.pas:2054-2085 and 1494-1535).

Documents here are already parsed into spans (BASELINE.json `input_hint`),
so a link selector is a pure Catalyst expression over the spans array —
no UDF, whole-stage-codegen friendly, and the scan prunes every column but
`doc_id`/`spans` (and Parquet reads only the struct fields referenced).

The reference pins that ``//a`` selects only real anchor elements: the
fixture <ad href="d.xml"> in tests/a.xml must NOT be followed (golden
tests/output/tef has no DDD). Spans carry the element kind, so selection
is an exact kind match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# selector → span kinds it matches; the crawl slice of xidel's selector
# language ('//a', '//img/@src', ...). Extraction-language depth lives in
# xidel_spark/functions/.
_SELECTOR_KINDS = {
    "//a": ("link",),
    "//a/@href": ("link",),
    "//img": ("image",),
    "//img/@src": ("image",),
    "//title": ("title",),
}


def spans_of_kind(spans: Column, kinds: tuple[str, ...]) -> Column:
    ks = F.array(*[F.lit(k) for k in kinds])
    return F.array_sort(
        F.filter(spans, lambda s: F.array_contains(ks, s["kind"])),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )


def extract_links(docs: DataFrame, selector: str = "//a", url_col: str = "doc_id") -> DataFrame:
    """(src, idx, dst): one row per followed link, idx = document order.

    Equivalent of evaluating the follow expression and resolving each hit
    to its resource attribute; `dst` targets are assumed absolute here —
    resolution against base_uri is urlnorm.resolve_url's job.
    """
    kinds = _SELECTOR_KINDS.get(selector)
    if kinds is None:
        raise ValueError(f"unsupported follow selector: {selector!r}")
    hits = spans_of_kind(F.col("spans"), kinds)
    return (
        docs.select(F.col(url_col).alias("src"), F.posexplode(hits).alias("idx", "span"))
        .where(F.col("span.media_ref").isNotNull())
        .select("src", F.col("idx").cast("int").alias("idx"), F.col("span.media_ref").alias("dst"))
    )


def extract_kind_text(docs: DataFrame, selector: str, url_col: str = "doc_id") -> DataFrame:
    """(url, idx, value): text of spans matched by the selector — the `-e`
    extraction analogue for span-kind selectors (e.g. -e '//title')."""
    kinds = _SELECTOR_KINDS.get(selector)
    if kinds is None:
        raise ValueError(f"unsupported extract selector: {selector!r}")
    hits = spans_of_kind(F.col("spans"), kinds)
    return docs.select(
        F.col(url_col).alias("url"), F.posexplode(hits).alias("idx", "span")
    ).select("url", "idx", F.col("span.text").alias("value"))
