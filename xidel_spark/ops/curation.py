"""Corpus-curation ops for training-data pipelines: within-document
repetition removal, PII scrubbing, benchmark-contamination checks.

All pure Catalyst (split / slice / array_distinct / regexp_*) — zero
Python in the path — with every formula mirrorable in ANSI SQL for the
DuckDB oracles (oracle_ops.py). 100-TB shapes:

- paragraph dedup is per-row (no shuffle at all);
- PII scrub is per-row regex (whole-stage codegen);
- contamination joins each document's distinct n-grams against the
  benchmark n-gram set — the benchmark side is tiny by construction
  (eval sets are MBs, corpora are TBs) and broadcasts; at extreme scale
  the same set feeds a Bloom filter (crawl/bloom.py) so clean documents
  never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import qround
from .dedup_text import shingles_col, tokens_col


def paragraph_parts(text: Column, n: int = 4) -> Column:
    """array<string> of n-token chunks in document order (the 'paragraph'
    unit for within-doc dedup; a real pipeline splits on \\n\\n — the
    synthetic corpus has no newlines, so the unit is a token window)."""
    toks = tokens_col(text)
    n_parts = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    # sequence(0, -1) is DESCENDING in Spark — guard empty docs
    idx = F.when(n_parts > 0, F.sequence(F.lit(0), n_parts - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * n + 1, n), " ")
    )


def dedup_paragraphs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 4
) -> DataFrame:
    """(id, n_parts, n_unique, dup_ratio, kept_md5): exact within-document
    repetition removal, first occurrence kept (array_distinct preserves
    first-occurrence order). Per-row only — no shuffle."""
    parts = paragraph_parts(F.col(text_col), n)
    kept = F.array_distinct(parts)
    return docs.select(
        F.col(id_col),
        F.size(parts).cast("int").alias("n_parts"),
        F.size(kept).cast("int").alias("n_unique"),
        qround(1 - F.size(kept) / F.greatest(F.size(parts), F.lit(1)), 4)
        .alias("dup_ratio"),
        F.md5(F.array_join(kept, "\n")).alias("kept_md5"),
    )


# RE2-safe patterns (no lookarounds/backrefs) so the DuckDB oracle runs
# the SAME regex text
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


def scrub_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_emails, n_ips, n_phones, scrubbed_md5): count + redact
    emails/IPv4s/phone-shaped tokens ([EMAIL]/[IP]/[PHONE]). Order
    matters: IPs redact before phones so '10.0.x.y' never half-matches."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(t, F.lit(IPV4_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    scrubbed = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    scrubbed = F.regexp_replace(scrubbed, IPV4_RE, "[IP]")
    scrubbed = F.regexp_replace(scrubbed, PHONE_RE, "[PHONE]")
    return docs.select(
        F.col(id_col),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, is_contaminated): how many of a
    document's DISTINCT word n-grams appear in the benchmark corpus —
    the decontamination gate every eval-aware training pipeline needs.

    The benchmark n-gram set is built once and BROADCASTS into the join
    (eval suites are tiny next to a 100-TB corpus); documents ship only
    their distinct shingles."""
    bench_ngrams = (
        benchmark.select(F.explode(shingles_col(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    # ONE shingle projection feeds both the count and the membership join
    # (tokenizing the TB-scale side twice was the dominant waste — review
    # r5); at extreme scale `ds` is the thing to materialize once
    ds = docs.select(
        F.col(id_col),
        F.array_distinct(shingles_col(F.col(text_col), n)).alias("__ds"),
    )
    doc_ngrams = ds.select(F.col(id_col), F.explode(F.col("__ds")).alias("ngram"))
    hits = (
        doc_ngrams.join(F.broadcast(bench_ngrams), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    base = ds.select(
        F.col(id_col), F.size(F.col("__ds")).cast("int").alias("n_shingles")
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_shingles"),
        F.coalesce(F.col("__hits"), F.lit(0)).cast("int").alias("n_contaminated"),
        (F.coalesce(F.col("__hits"), F.lit(0)) > 0).alias("is_contaminated"),
    )
