"""Training-data-pipeline queries (dedup / similarity / text analysis) for
the driver contract. Column names/types match oracle_ops.py exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import dedup_text as dt
from .ops import similarity as sim
from .ops import textstats as ts


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang"
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark, sf_dir):
    return dt.exact_dedup(_docs(spark, sf_dir))


def q_dedup_minhash_sig(spark, sf_dir):
    return dt.minhash_signature(_docs(spark, sf_dir), k=8)


def q_dedup_minhash_lsh_pairs(spark, sf_dir):
    sigs = dt.minhash_signature(_docs(spark, sf_dir), k=8)
    return dt.lsh_candidate_pairs(dt.lsh_buckets(sigs, bands=4))


def q_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sigs = dt.minhash_signature(docs, k=8)
    pairs = dt.lsh_candidate_pairs(dt.lsh_buckets(sigs, bands=4))
    return dt.ngram_jaccard_pairs(docs, pairs)


def q_dedup_simhash(spark, sf_dir):
    return dt.simhash16(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 16)
    return sim.cosine_topk(queries, emb, k=5)


def q_lang_id(spark, sf_dir):
    return ts.lang_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return ts.quality_features(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        ts.token_count(F.col("text")).cast("int").alias("ws_tokens"),
        ts.bpe_ish_token_count(F.col("text")).cast("int").alias("bpe_tokens"),
    )


def q_doc_fingerprint(spark, sf_dir):
    return ts.doc_fingerprint(_docs(spark, sf_dir))


def q_ann_topk_lsh(spark, sf_dir):
    """ANN recall@1 against planted ground truth, with an EXACT DuckDB
    oracle: queries are the planted-twin bases (v % 5 == 0, v < 80), whose
    true top-1 is their twin at sim ≈ 1.0 — retrieved through the SRP
    (table, bucket) equi-join with miss probability ~3e-14, so the
    brute-force SQL top-1 matches exactly. This verifies the RANKING the
    LSH path produces, not its internal hashes (which DuckDB cannot
    replicate). Recall on the un-planted corpus is asserted in pytest."""
    from . import corpus as _corpus

    emb = _corpus.planted_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    queries = emb.where((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 80))
    return sim.ann_topk_lsh(queries, emb, k=1, bits=8, tables=8)


def q_text_stats(spark, sf_dir):
    """language-ID + quality heuristics + token counts + fingerprint in
    one multi-column gate (one row per doc; the four legs were separate
    driver rows before the 50-row record budget — semantics unchanged).
    All four are row-local functions of (doc_id, text), so this is ONE
    select over ONE scan — no self-joins (review r5)."""
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        ts.lang_pred_col(t).alias("lang_pred"),
        F.length(t).cast("int").alias("n_chars"),
        ts.token_count(t).cast("int").alias("n_tokens"),
        ts.punct_ratio_col(t).alias("punct_ratio"),
        ts.stop_ratio_col(t).alias("stop_ratio"),
        ts.quality_col(t).alias("quality"),
        ts.token_count(t).cast("int").alias("ws_tokens"),
        ts.bpe_ish_token_count(t).cast("int").alias("bpe_tokens"),
        ts.fingerprint_col(t).alias("fingerprint"),
    )


def q_dedup_paragraph(spark, sf_dir):
    """within-document repetition removal (exact, first occurrence kept) —
    per-row Catalyst, no shuffle."""
    from .ops import curation

    return curation.dedup_paragraphs(_docs(spark, sf_dir))


def q_pii_scrub(spark, sf_dir):
    """PII redaction counts + scrubbed-text hash. The corpus is synthetic,
    so deterministic PII-shaped tokens are injected per doc first (id-keyed
    email/IP/phone mix) — the scrubber sees realistic variety (0-2 emails,
    0-1 IPs/phones per doc)."""
    from .ops import curation

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(d % 3 != 0, F.format_string(" contact user%d@example.com", d % 97))
        .otherwise(F.lit("")),
        F.when(d % 2 == 0, F.format_string(" from 10.0.%d.%d", d % 256, d % 100))
        .otherwise(F.lit("")),
        F.format_string(" call 555-0%03d", d % 1000),
        F.when(d % 5 == 0, F.format_string(" cc admin%d@example.org", d % 89))
        .otherwise(F.lit("")),
    )
    return curation.scrub_pii(docs.select("doc_id", injected.alias("text")))


def q_contamination_ngram(spark, sf_dir):
    """benchmark-contamination gate: distinct word 3-grams of every doc
    joined (broadcast) against the 'benchmark' subset (doc_id % 50 == 0 —
    a stand-in eval suite drawn from the same distribution, so overlap is
    non-trivial)."""
    from .ops import curation

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return curation.contamination_check(docs, bench)


OPS_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_sig": q_dedup_minhash_sig,
    "dedup_minhash_lsh_pairs": q_dedup_minhash_lsh_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_paragraph": q_dedup_paragraph,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "text_stats": q_text_stats,
    "pii_scrub": q_pii_scrub,
    "contamination_ngram": q_contamination_ngram,
}
