"""Partitioned blocked-Bloom URL-seen filter — DataFrame-native.

The reference's seen set is an O(n)-scan list (containsEqual,
xidelbase.pas:1537-1544) — fine for a CLI, hopeless at 10^10 URLs. The
north rule replaces it with a sharded Bloom filter in front of the exact
seen table:

- the EXACT `seen` table remains ground truth (no false drops, ever);
- the Bloom filter is a pre-filter that lets definitely-new candidates
  skip the expensive anti-join: only "maybe seen" candidates (a small
  fraction once the crawl matures) are exactly checked.

Representation: a DataFrame of 64-bit words — (shard, widx, word) — NEVER
collected to the driver (the round-1 design materialized every shard block
driver-side and re-broadcast per wave; at the 10^10 target that is ~15 GiB
through one process). Build is one `bit_or` groupBy (map-side combined);
merge is union + re-aggregate over BLOOM rows (bounded by m/64, not by
|seen|); probing joins candidates' k probe words against the word table —
broadcast when the filter is small enough, a (shard, widx) shuffle join
otherwise, so the filter scales with executors like any other table.

Sizing: callers pass the OBSERVED seen count (the crawler tracks exact
per-wave enqueued counts); bits = -n·ln(fpp)/ln²2, k = m/n·ln2
(FrontierCrawler rebuilds at 4x when the count outgrows capacity).

Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i·h2 (mod m bits)
with h1/h2 independent-seed xxhash64 columns — all JVM-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import checkpoint_reset_stats

_H1_SEED = 0x9E3779B9
_H2_SEED = 0x85EBCA6B

# filters up to this many total bits take the broadcast probe path
BROADCAST_MAX_BITS = 1 << 28  # 32 MiB of words


def _params(capacity: int, fpp: float) -> tuple[int, int]:
    m_bits = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m_bits / capacity * math.log(2)))
    return m_bits, min(k, 12)


class ShardedBloom:
    """(shard, widx, word) DataFrame + hash parameters."""

    def __init__(
        self, df: DataFrame, n_shards: int, m_bits_per_shard: int, k: int, capacity: int
    ):
        self.df = df
        self.n_shards = n_shards
        self.m_bits = m_bits_per_shard
        self.k = k
        self.capacity = capacity

    @property
    def total_bits(self) -> int:
        return self.m_bits * self.n_shards

    def merge(self, other: "ShardedBloom", *, eager: bool = True) -> "ShardedBloom":
        """OR-merge word tables (incremental build: per wave only the NEW
        urls are hashed; cost is bounded by filter size, not |seen|)."""
        assert (self.n_shards, self.m_bits, self.k) == (
            other.n_shards, other.m_bits, other.k,
        ), "bloom parameter mismatch"
        merged = checkpoint_reset_stats(
            self.df.unionByName(other.df)
            .groupBy("shard", "widx")
            .agg(F.bit_or("word").alias("word")),
            eager=eager,
        )
        return ShardedBloom(merged, self.n_shards, self.m_bits, self.k, self.capacity)

    def unpersist(self) -> None:
        self.df.unpersist()


def _probe_words(url_col, m_bits: int, k: int, n_shards: int):
    """(shard, array<struct<widx, mask>>) probe positions for a url."""
    # reduce mod m BEFORE combining: raw xxhash64 sums overflow ANSI longs;
    # i*h2m + h1m stays < (k+1)*m, far inside long range at any capacity
    h1 = F.pmod(F.xxhash64(url_col, F.lit(_H1_SEED)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(url_col, F.lit(_H2_SEED)), F.lit(m_bits)).bitwiseOR(F.lit(1))
    shard = F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")
    probes = F.array(
        *[
            F.struct(
                F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).alias("bit"),
            )
            for i in range(k)
        ]
    )
    return shard, probes


def build_bloom(
    seen: DataFrame,
    url_col: str = "url",
    *,
    capacity: int = 1_000_000,
    fpp: float = 0.01,
    n_shards: int = 16,
    eager: bool = True,
    partitioned_cache: bool = False,
    approx_rows: int | None = None,
) -> ShardedBloom:
    """seen urls → word table via explode + bit_or groupBy (one shuffle of
    k small rows per url with map-side combine; nothing driver-side).

    Large inputs (approx_rows unknown or above the conf threshold) are
    first REPARTITIONED BY SHARD as (shard, h1, h2) triples — 3 longs per
    url instead of k exploded probe rows. Without this the groupBy's
    map-side combine is useless (every map task sees every shard, so
    distinct (shard, widx) groups per task ≈ input rows per task — measured
    r6: the 20M-url/64-shard build shuffled ~140M probe rows, 18.5 s);
    with shards co-located each task covers only its shards' m/64 word
    slots, partial aggregation reduces ~20×, and the url strings never
    shuffle at all (guide §2.3/§2.5: shuffle a narrow proxy, aggregate
    where the groups live). Callers that know the input is small (the
    crawler's per-wave incremental merges) pass approx_rows to skip the
    extra exchange.

    partitioned_cache=True persists the word table hash-partitioned on
    (shard, widx): the distributed probe join then reshuffles only the
    candidates' probe rows, never the filter — the right resident form for
    a long-lived filter probed every wave. The default (checkpoint) form
    is for the incremental-merge chain, whose per-wave re-aggregation
    wants the cheap block representation."""
    m_bits, k = _params(max(1, capacity) // n_shards + 1, fpp)
    shard, probes = _probe_words(F.col(url_col), m_bits, k, n_shards)
    spark = seen.sparkSession
    shard_first_min = int(spark.conf.get("xidel.bloom.shardBuildMinRows", "2000000"))
    if approx_rows is None or approx_rows >= shard_first_min:
        h1 = F.pmod(F.xxhash64(F.col(url_col), F.lit(_H1_SEED)), F.lit(m_bits))
        h2 = F.pmod(
            F.xxhash64(F.col(url_col), F.lit(_H2_SEED)), F.lit(m_bits)
        ).bitwiseOR(F.lit(1))
        hashed = seen.select(
            shard.alias("shard"), h1.alias("h1"), h2.alias("h2")
        ).repartition(F.col("shard"))
        h1c, h2c = F.col("h1"), F.col("h2")
        bit = F.explode(
            F.array(*[F.pmod(h1c + F.lit(i) * h2c, F.lit(m_bits)) for i in range(k)])
        )
        bits = hashed.select("shard", bit.alias("bit")).select(
            "shard",
            (F.col("bit") / 64).cast("long").alias("widx"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("word"),
        )
    else:
        bits = seen.select(shard.alias("shard"), F.explode(probes).alias("p")).select(
            "shard",
            (F.col("p.bit") / 64).cast("long").alias("widx"),
            F.expr("shiftleft(1L, CAST(p.bit % 64 AS INT))").alias("word"),
        )
    agg = bits.groupBy("shard", "widx").agg(F.bit_or("word").alias("word"))
    if partitioned_cache:
        df = agg.repartition(max(n_shards, 32), "shard", "widx").persist()
        df.count()
    else:
        df = checkpoint_reset_stats(agg, eager=eager)
    return ShardedBloom(df, n_shards, m_bits, k, capacity)


def flag_candidates(
    candidates: DataFrame, bloom: ShardedBloom, url_col: str = "url"
) -> DataFrame:
    """candidates + a `__maybe` boolean.

    Broadcast regime (filter ≤ BROADCAST_MAX_BITS): k chained broadcast
    hash lookups — one codegen stage, no explode, no groupBy, no re-join
    of the candidate payload; the word table's broadcast exchange is built
    once and reused across the k joins. Large-filter regime: explode the k
    probes, shuffle-join by (shard, widx), AND per url — the word table
    scales out like any other table."""
    k, m_bits, n_shards = bloom.k, bloom.m_bits, bloom.n_shards
    shard, probes = _probe_words(F.col(url_col), m_bits, k, n_shards)
    if bloom.total_bits <= BROADCAST_MAX_BITS:
        ann = candidates.select(
            "*",
            shard.alias("__shard"),
            *[F.element_at(probes, i + 1)["bit"].alias(f"__b{i}") for i in range(k)],
        )
        ann = ann.select(
            "*",
            *[(F.col(f"__b{i}") / 64).cast("long").alias(f"__w{i}") for i in range(k)],
            *[
                F.expr(f"shiftleft(1L, CAST(__b{i} % 64 AS INT))").alias(f"__m{i}")
                for i in range(k)
            ],
        )
        cur = ann
        conds = []
        for i in range(k):
            # identical projection every join → ONE broadcast exchange,
            # reused k times (per-join aliasing would rebuild the ~100s-MB
            # hash relation k times over)
            w = bloom.df.alias(f"__bl{i}")
            cur = (
                cur.join(
                    F.broadcast(w),
                    (cur["__shard"] == F.col(f"__bl{i}.shard"))
                    & (cur[f"__w{i}"] == F.col(f"__bl{i}.widx")),
                    "left",
                )
                .withColumnRenamed("word", f"__word{i}")
                .drop("shard", "widx")
            )
            conds.append(
                F.col(f"__word{i}").isNotNull()
                & (F.col(f"__word{i}").bitwiseAND(F.col(f"__m{i}")) == F.col(f"__m{i}"))
            )
        maybe = conds[0]
        for c in conds[1:]:
            maybe = maybe & c
        # NULL url probes nothing — route it to the maybe/exact-check side
        # so both probe regimes agree (distributed path yields NULL→maybe)
        maybe = F.when(F.col(url_col).isNull(), F.lit(True)).otherwise(maybe)
        drop = (
            ["__shard"]
            + [f"__b{i}" for i in range(k)]
            + [f"__w{i}" for i in range(k)]
            + [f"__m{i}" for i in range(k)]
            + [f"__word{i}" for i in range(k)]
        )
        return cur.withColumn("__maybe", maybe).drop(*drop)
    probe_rows = candidates.select(
        F.col(url_col).alias("__u"), shard.alias("shard"), F.explode(probes).alias("p")
    ).select(
        "__u",
        "shard",
        (F.col("p.bit") / 64).cast("long").alias("widx"),
        F.expr("shiftleft(1L, CAST(p.bit % 64 AS INT))").alias("mask"),
    )
    # SHUFFLE_HASH on the word side (r6): the default sort-merge join
    # re-SORTS the cached word table on every probe (the partitioned cache
    # is stored unsorted). A per-partition hash build is m/64/n_partitions
    # words (~1.5 MB at 6M words / 64 partitions) and the persisted
    # (shard, widx) layout already satisfies the join's distribution, so
    # only the candidates' probe rows exchange.
    joined = probe_rows.join(bloom.df.hint("SHUFFLE_HASH"), ["shard", "widx"], "left")
    hit = (F.col("word").isNotNull()) & (
        F.col("word").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    verdict = (
        joined.select("__u", hit.alias("__hit"))
        .groupBy("__u")
        .agg(F.min("__hit").alias("__maybe"))  # AND over the k probes
    )
    return candidates.join(
        verdict, candidates[url_col] == verdict["__u"], "left"
    ).drop("__u")


def split_candidates(
    candidates: DataFrame, bloom: ShardedBloom, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen): definitely_new skips the exact
    anti-join entirely; maybe_seen still gets the exact check (the Bloom
    can never cause a false drop — a missing word row reads as a miss,
    which errs toward 'new', and a false positive errs toward the exact
    check)."""
    flagged = flag_candidates(candidates, bloom, url_col)
    # NULL verdict (e.g. a NULL url never matches the left join in the
    # distributed probe) must not vanish from both splits — err toward the
    # exact check so the two probe regimes agree and no row is lost
    verdict = F.coalesce(F.col("__maybe"), F.lit(True))
    definitely_new = flagged.where(~verdict).drop("__maybe")
    maybe_seen = flagged.where(verdict).drop("__maybe")
    return definitely_new, maybe_seen
