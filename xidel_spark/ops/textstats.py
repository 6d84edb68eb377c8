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


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, punct_ratio, stop_ratio, quality): scalar
    quality heuristics + a composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    stops = F.regexp_count(F.lower(t), F.lit(LANG_STOPWORDS["en"]))
    punct_ratio = qround(punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = qround(stops / F.greatest(n_tokens, F.lit(1)), 4)
    quality = qround(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2,
        4,
    )
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
    t = F.lower(F.col(text_col))
    scores = [
        F.struct(
            F.regexp_count(t, F.lit(pat)).alias("hits"), F.lit(lang).alias("lang")
        )
        for lang, pat in sorted(LANG_STOPWORDS.items(), reverse=True)
    ]
    # array_max on struct(hits, lang): max hits, ties → max lang of reversed
    # order == alphabetically-last... use min over (-hits, lang) instead
    neg = [
        F.struct(
            (-F.regexp_count(t, F.lit(pat))).alias("neg_hits"), F.lit(lang).alias("lang")
        )
        for lang, pat in sorted(LANG_STOPWORDS.items())
    ]
    best = F.array_min(F.array(*neg))
    return docs.select(F.col(id_col), best["lang"].alias("lang_pred"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): rolling-shingle fingerprint = md5-minimum over
    3-gram shingles (winnowing's global-min special case), usable as a
    near-dup cluster key."""
    sh = shingles_col(F.col(text_col), 3)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return docs.select(
        F.col(id_col), F.coalesce(fp, F.md5(F.col(text_col))).alias("fingerprint")
    )
