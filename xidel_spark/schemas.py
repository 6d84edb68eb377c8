"""Canonical schemas for the engine's tables.

Mirrors the reference's data model (SURVEY.md §1):
- DOCUMENTS  ~ xidel's IData (xidelbase.pas:178-186) re-expressed as the
  interleaved text+media spans row mandated by BASELINE.json `input_hint`.
- FRONTIER   ~ TFollowTo / THTTPRequest (xidelbase.pas:390-407): a pending
  request; identity = (url, method, body, headers) per
  xidelbase.pas:1242-1245 (THTTPRequest.equalTo).
- SEEN       ~ globalDuplicationList (xidelbase.pas:1482-1491).
- EXTRACTIONS~ the variable change log (xidelbase.pas:2486-2504).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # 'title'|'text'|'link'|'image'|... element-ish kind
        T.StructField("text", T.StringType()),       # visible text of the span
        T.StructField("media_ref", T.StringType()),  # href/src target for link/media spans, else null
        T.StructField("offset", T.IntegerType()),    # defines span order within the document
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),     # canonical URL of the document
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("base_uri", T.StringType()),   # final URL after redirects (xidelbase.pas:1140)
        T.StructField("content_type", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("input_format", T.StringType()),  # auto|html|xml|json|text (xidelbase.pas:172)
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("headers", T.StringType()),    # canonical serialized header list (sorted)
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("rank", T.StringType()),       # DFS rank: fixed-width hex segments
        T.StructField("host", T.StringType()),
        T.StructField("url_hash", T.LongType()),     # xxhash64 of the canonical request tuple
        T.StructField("next_action", T.IntegerType()),
        T.StructField("input_format", T.StringType()),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("wave", T.IntegerType()),
    ]
)

EXTRACTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("var_name", T.StringType()),
        T.StructField("seq_index", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)
