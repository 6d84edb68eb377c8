"""Similarity search over embedding columns.

- brute-force cosine top-k: the exactness baseline — built-in higher-order
  functions (zip_with + aggregate) keep the dot product JVM-side.
- LSH-bucketed ANN (sign random projection): the scale path — candidates
  only within matching hash buckets; recall/bucket tradeoff measured in
  tests. Projections are deterministic (seeded hash of dimension index) so
  runs are reproducible.

Scale shape: queries × corpus is a broadcast nested-loop at baseline; the
ANN variant turns it into an equi-join on bucket signature (shuffle on a
16-bit key), which is the 100-TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import qround
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): brute-force top-k by cosine.

    The query side is broadcast (small); ranking is a window per query.
    sim is rounded to 3 decimals and ties broken by neighbor id so results
    are deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 3).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rnk").cast("int").alias("rnk"))
    )


def srp_signature(
    vectors: DataFrame,
    *,
    bits: int = 16,
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): sign-random-projection LSH signatures, one
    bucket per hash table (OR-amplification: b bits AND-ed within a table,
    L tables OR-ed — recall 1-(1-p^b)^L). Hyperplane (t, j)'s weight for
    dimension d is a deterministic pseudo-random ± sign(xxhash64(t, j, d))
    — computed JVM-side, no RNG state, reproducible across runs.

    Packed single-pass form: ONE aggregate per table carries all `bits`
    partial projections in an array accumulator (the inner 2-arg transform
    receives the BIT INDEX as its second argument — deliberate use of the
    index-passing lambda convention), instead of bits separate traversals
    of the vector per table."""
    v = F.col(vec_col).cast("array<double>")
    pairs = F.zip_with(
        v,
        F.sequence(F.lit(0), F.size(v) - 1),
        lambda x, d: F.struct(x.alias("x"), d.alias("d")),
    )

    def make_merge(t: int):
        # closure factory: a default-arg lambda would change the visible
        # arity and break PySpark's lambda-parameter binding
        def merge(acc, p):
            def upd(a, j):
                sign = F.when(
                    F.pmod(F.xxhash64(F.lit(t), j, p["d"]), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                return a + p["x"] * sign

            return F.transform(acc, upd)

        return merge

    outs = []
    for t in range(tables):
        projs = F.aggregate(pairs, F.array_repeat(F.lit(0.0), bits), make_merge(t))
        # pack sign bits by doubling (shiftleft needs a literal shift count)
        sig = F.aggregate(
            F.reverse(projs),
            F.lit(0),
            lambda acc, pj: acc * 2 + F.when(pj > 0, F.lit(1)).otherwise(F.lit(0)),
        )
        outs.append(
            vectors.select(
                F.col(id_col), F.lit(t).alias("table"), sig.cast("int").alias("bucket")
            )
        )
    res = outs[0]
    for df in outs[1:]:
        res = res.unionByName(df)
    return res


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    bits: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking, but only over candidates
    sharing an SRP bucket in ANY hash table — the (table, bucket) equi-join
    replaces the cross join."""
    qs = srp_signature(
        queries, bits=bits, tables=tables, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed(id_col, "query_id")
    cs = srp_signature(
        corpus, bits=bits, tables=tables, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed(id_col, "neighbor_id")
    pairs = (
        qs.join(cs, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        pairs.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            qround(cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 3).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rnk").cast("int").alias("rnk"))
    )
