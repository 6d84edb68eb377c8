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


OPS_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_sig": q_dedup_minhash_sig,
    "dedup_minhash_lsh_pairs": q_dedup_minhash_lsh_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_stats": q_token_stats,
    "doc_fingerprint": q_doc_fingerprint,
}
