"""Text analysis for training-data pipelines: language-ID, quality score,
token counting, document fingerprinting.

All pure Catalyst expressions (regexp_count / split / aggregate) — no
Python in the path — and every formula is mirrorable in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import qround

from .dedup_text import shingles_col, tokens_col

# tiny stopword panels; language-ID is a hit-count heuristic (argmax with
# name tie-break), deliberately simple enough to mirror in SQL
LANG_STOPWORDS = {
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu)\b",
    "en": r"\b(the|and|of|to|is|in|that|it)\b",
    "es": r"\b(el|la|los|que|de|es|un|una)\b",
    "fr": r"\b(le|la|les|et|est|une|que|des)\b",
}


def token_count(text: Column) -> Column:
    """whitespace tokens"""
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """sub-word-ish tokens: runs of letters/digits, or single non-space
    punctuation — the regex analogue of a BPE pre-tokenizer. (RE2-safe
    pattern: no lookarounds, so the DuckDB oracle can mirror it.)"""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio_col(t: Column) -> Column:
    punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    return qround(punct / F.greatest(F.length(t), F.lit(1)), 4)


def stop_ratio_col(t: Column) -> Column:
    stops = F.regexp_count(F.lower(t), F.lit(LANG_STOPWORDS["en"]))
    return qround(stops / F.greatest(token_count(t), F.lit(1)), 4)


def quality_col(t: Column) -> Column:
    return qround(
        F.least(token_count(t) / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio_col(t) * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio_col(t) * 10, F.lit(1.0))) * 0.2,
        4,
    )


def lang_pred_col(t: Column) -> Column:
    """stopword-panel argmax (ties -> alphabetical first): min over
    (-hits, lang) structs."""
    low = F.lower(t)
    neg = [
        F.struct(
            (-F.regexp_count(low, F.lit(pat))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, pat in sorted(LANG_STOPWORDS.items())
    ]
    return F.array_min(F.array(*neg))["lang"]


def fingerprint_col(t: Column) -> Column:
    """md5-minimum over 3-gram shingles (winnowing's global-min special
    case), falling back to md5(text) for short docs."""
    sh = shingles_col(t, 3)
    return F.coalesce(F.array_min(F.transform(sh, lambda s: F.md5(s))), F.md5(t))


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, punct_ratio, stop_ratio, quality): scalar
    quality heuristics + a composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    punct_ratio = punct_ratio_col(t)
    stop_ratio = stop_ratio_col(t)
    quality = quality_col(t)
    return docs.select(
        F.col(id_col),
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred): stopword-panel argmax (ties → alphabetical first)."""
    return docs.select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("lang_pred")
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): rolling-shingle fingerprint = md5-minimum over
    3-gram shingles (winnowing's global-min special case), usable as a
    near-dup cluster key."""
    return docs.select(
        F.col(id_col), fingerprint_col(F.col(text_col)).alias("fingerprint")
    )
