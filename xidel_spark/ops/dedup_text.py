"""Document deduplication for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
SimHash, and n-gram Jaccard — all expressed with built-in column functions
(JVM-side, whole-stage codegen) so they shuffle once per aggregation and
never drop to per-row Python.

Cross-engine determinism (for the DuckDB oracle): every hash is md5 of an
explicit string — identical hex in Spark and DuckDB — and minhash
"permutations" are md5(seed || '|' || shingle) string minima.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import qround
from pyspark.sql.window import Window


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def shingles_col(text: Column, n: int = 3) -> Column:
    """word n-gram shingles, document order.

    Built as arrays_zip of n shifted slices — evaluates the token array n
    times per ROW. (The obvious per-index element_at(toks, i+j) form
    inlines the tokenizer into the lambda and re-splits the text 3× per
    SHINGLE — an O(shingles) blowup measured at 10× on the minhash bench.)
    Guarded: Spark's sequence(1, 0) is DESCENDING, and slice() needs a
    non-negative length — short docs must yield an empty array."""
    toks = tokens_col(text)
    n_sh = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, n_sh).alias(f"w{j}") for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, canonical_id, n_dupes): exact duplicate clusters.
    One shuffle on the content hash; canonical row = min id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def minhash_signature(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): k minhash values, each the md5-string minimum
    over shingles under a seeded 'permutation'.

    The shingle array is materialized ONCE behind a non-deterministic
    barrier (r6): each of the k signature columns references the whole
    tokenize→zip→concat chain, expression trees have no sharing, and the
    regex split is excluded from Spark's subexpression elimination — the
    unbarriered form re-tokenized every document k times (measured 4.4 →
    1.6 s per 5k-doc signature pass). F.shuffle blocks CollapseProject
    from re-inlining the chain into the k projections; array_min is
    order-invariant, so the signatures are byte-identical (verified
    exceptAll both ways = 0) and remain deterministic under task retry."""
    sh = shingles_col(F.col(text_col), shingle_n)
    barrier = docs.select(F.col(id_col), F.shuffle(sh).alias("__sh"))

    def hasher(seed: int):
        # NOTE: F.transform dispatches on lambda arity — a (s, j=j) lambda
        # would receive the ARRAY INDEX as j. Bind the seed via closure.
        prefix = f"{seed}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    cols = [F.col(id_col)]
    for j in range(k):
        cols.append(F.array_min(F.transform(F.col("__sh"), hasher(j))).alias(f"sig_{j}"))
    return barrier.select(*cols)


def lsh_buckets(signatures: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """(id, band, bucket): banded LSH — docs sharing a bucket in any band are
    near-duplicate candidates. rows_per_band = k / bands.

    Shape note (round-3 A/B, sf0.1 solo): the union-of-selects beats a
    single-projection explode (8.5 vs 13.2 s end-to-end) — each union
    branch column-prunes to its own band's 2 signature columns, while the
    explode forces all k sig expressions into one interpreted projection
    on BOTH sides of the candidate self-join. The real win is
    materializing the signatures once (lsh_candidate_pairs does)."""
    sig_cols = [c for c in signatures.columns if c.startswith("sig_")]
    rows = len(sig_cols) // bands
    out = []
    for b in range(bands):
        chunk = sig_cols[b * rows : (b + 1) * rows]
        parts: list = []
        for i, c in enumerate(chunk):
            if i:
                parts.append(F.lit("|"))
            parts.append(F.col(c))
        # F.concat (not concat_ws): null sigs (shingle-less docs) must yield
        # a NULL bucket, which joins drop on both engines
        out.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat(*parts)).alias("bucket"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def lsh_candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_a, id_b): distinct candidate pairs from shared LSH buckets.
    The join key is (band, bucket) — a co-partitioned self-join.

    The bucket table is MATERIALIZED first: a self-join re-evaluates its
    input plan once per side, and the input here is the whole
    shingle→minhash→band pipeline (measured 1.4-2× end-to-end on sf0.1;
    at scale the signature/bucket table is a persisted artifact anyway —
    it feeds every future incremental dedup batch)."""
    buckets = buckets.localCheckpoint(eager=False)
    a = buckets.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"))
    b = buckets.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 3
) -> DataFrame:
    """(id_a, id_b, jaccard): exact n-gram Jaccard for candidate pairs.
    Two broadcast-able joins against the (small) pair list; set ops are
    array built-ins on distinct shingle arrays."""
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(shingles_col(F.col(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        qround(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def simhash16(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): 16-bit SimHash — bit i set iff the majority of tokens
    have md5 hex digit i in [8..f]. Explode + one groupBy (map-side combine
    keeps the shuffle at 16 ints per doc)."""
    toks = tokens_col(F.col(text_col))
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("tok")).withColumn(
        "h", F.md5("tok")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(16):
        aggs.append(
            F.sum(
                F.when(F.substring("h", i + 1, 1).isin(*"89abcdef"), 1).otherwise(0)
            ).alias(f"b{i}")
        )
    counted = exploded.groupBy(id_col).agg(*aggs)
    sim = F.lit(0)
    for i in range(16):
        sim = sim + F.when(F.col(f"b{i}") * 2 > F.col("n"), F.lit(1 << i)).otherwise(0)
    return counted.select(F.col(id_col), sim.cast("int").alias("simhash"))
