"""Training-data ops: semantic sanity beyond the DuckDB value gate."""

import pytest
from pyspark.sql import functions as F

from xidel_spark.ops import dedup_text as dt
from xidel_spark.ops import similarity as sim
from xidel_spark.ops import textstats as ts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text", "lang")
        .cache()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_finds_planted_duplicate(spark, docs):
    planted = docs.limit(1).select(F.lit(10_000).alias("doc_id"), "text", "lang")
    clusters = dt.exact_dedup(docs.unionByName(planted))
    dup = clusters.where(F.col("n_dupes") > 1).collect()
    assert len(dup) >= 1
    assert any(r["n_dupes"] == 2 for r in dup)


def test_minhash_near_dup_scores_high(spark, docs):
    # a doc and its lightly-perturbed copy must share LSH buckets and have
    # high jaccard; two unrelated docs must not score high
    base = docs.where("doc_id = 7").select("doc_id", "text")
    near = base.select(
        F.lit(7777).alias("doc_id"), F.concat(F.col("text"), F.lit(" tail tweak")).alias("text")
    )
    pool = docs.select("doc_id", "text").unionByName(near)
    sigs = dt.minhash_signature(pool, k=8)
    pairs = dt.lsh_candidate_pairs(dt.lsh_buckets(sigs, bands=4))
    jac = dt.ngram_jaccard_pairs(pool, pairs)
    hit = jac.where((F.col("id_a") == 7) & (F.col("id_b") == 7777)).collect()
    assert hit and hit[0]["jaccard"] > 0.8


def test_simhash_near_dup_low_hamming(spark, docs):
    base = docs.where("doc_id = 7").select("doc_id", "text")
    near = base.select(
        F.lit(7777).alias("doc_id"), F.concat(F.col("text"), F.lit(" zz")).alias("text")
    )
    sh = dt.simhash16(base.unionByName(near)).collect()
    a, b = (r["simhash"] for r in sh)
    hamming = bin(a ^ b).count("1")
    assert hamming <= 3


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.where(F.col("vec_id") < 8)
    exact = sim.cosine_topk(queries, emb, k=5).collect()
    approx = sim.ann_topk_lsh(queries, emb, k=5, bits=4, tables=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # OR-amplified SRP (8 tables × 4 bits): near neighbors collide in at
    # least one table with high probability even for weak (s≈0.3) pairs
    assert recall > 0.5, recall


def test_lang_id_beats_chance(spark, docs):
    pred = ts.lang_id(docs)
    joined = docs.join(pred, "doc_id").where(F.col("lang").isin("en", "de", "fr", "es"))
    total = joined.count()
    if total:
        acc = joined.where(F.col("lang") == F.col("lang_pred")).count() / total
        assert acc > 0.25  # synthetic corpus text is not strongly language-marked


def test_quality_and_tokens_ranges(spark, docs):
    q = ts.quality_features(docs)
    bad = q.where(
        (F.col("quality") < 0) | (F.col("quality") > 1) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0


def test_paragraph_dedup_removes_planted_repeat(spark):
    from xidel_spark.ops import curation

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h a b c d"),   # chunk[0] == chunk[2]
            (2, "x y z w p q r s"),           # no repeats
            (3, ""),                          # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.dedup_paragraphs(docs).collect()}
    assert out[1]["n_parts"] == 3 and out[1]["n_unique"] == 2
    assert out[1]["dup_ratio"] > 0
    assert out[2]["n_parts"] == 2 and out[2]["n_unique"] == 2
    assert out[3]["n_parts"] == 0 and out[3]["n_unique"] == 0


def test_pii_scrub_counts_and_redacts(spark):
    from pyspark.sql import functions as F

    from xidel_spark.ops import curation

    docs = spark.createDataFrame(
        [(1, "mail a@b.com and c@d.org ip 10.0.0.1 call 555-1234 ok")],
        "doc_id long, text string",
    )
    row = curation.scrub_pii(docs).first()
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (2, 1, 1)
    # redaction is total: scrubbing twice is a fixed point
    scrubbed = docs.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), curation.EMAIL_RE, "[EMAIL]"),
                curation.IPV4_RE, "[IP]"),
            curation.PHONE_RE, "[PHONE]").alias("t")
    ).first()["t"]
    assert "@" not in scrubbed and "10.0.0.1" not in scrubbed and "555-" not in scrubbed


def test_contamination_flags_benchmark_members(spark):
    from pyspark.sql import functions as F

    from xidel_spark.ops import curation

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown fox somewhere else entirely today"),  # shares 3-grams with 0
            (2, "completely disjoint vocabulary nothing matches here"),
        ],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in curation.contamination_check(docs, bench).collect()}
    assert out[0]["is_contaminated"]  # benchmark overlaps itself fully
    assert out[0]["n_contaminated"] == out[0]["n_shingles"]
    assert out[1]["is_contaminated"] and 0 < out[1]["n_contaminated"] < out[1]["n_shingles"]
    assert not out[2]["is_contaminated"] and out[2]["n_contaminated"] == 0
