"""Partitioned blocked-Bloom URL-seen filter.

The reference's seen set is an O(n)-scan list (containsEqual,
xidelbase.pas:1537-1544) — fine for a CLI, hopeless at 10^10 URLs. The
north rule replaces it with a sharded Bloom filter in front of the exact
seen table:

- the EXACT `seen` table remains ground truth (no false drops, ever);
- the Bloom filter is a pre-filter that lets definitely-new candidates skip
  the expensive anti-join shuffle: only "maybe seen" candidates (a small
  fraction once the crawl matures) are exactly checked.

Sharding: urls are assigned to shards by xxhash64 (JVM-side column); each
shard's bit block is built by a vectorized Arrow `applyInPandas` (numpy
bit ops, no per-row Python). Shard blocks are small enough to broadcast at
test scale; at 10^10 capacity (~14 GiB at 1% FPR) the shard map lives as
binary blobs in the checkpoint store and each executor loads only the
shards its partition needs — the shard id IS the partition key.

Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i*h2 (mod m bits),
with h1/h2 derived from independent-seed xxhash64 columns.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

_H1_SEED = 0x9E3779B9
_H2_SEED = 0x85EBCA6B


def _hash_cols(url_col):
    return (
        F.xxhash64(url_col, F.lit(_H1_SEED)).alias("__h1"),
        F.xxhash64(url_col, F.lit(_H2_SEED)).alias("__h2"),
    )


def _params(capacity: int, fpp: float) -> tuple[int, int]:
    m_bits = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m_bits / capacity * math.log(2)))
    return m_bits, k


class ShardedBloom:
    def __init__(self, n_shards: int, m_bits_per_shard: int, k: int, blocks: dict[int, bytes]):
        self.n_shards = n_shards
        self.m_bits = m_bits_per_shard
        self.k = k
        self.blocks = blocks

    def to_rows(self) -> list[tuple[int, bytes]]:
        return sorted(self.blocks.items())

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        """OR-merge bit blocks (incremental build: per wave only the NEW
        urls are hashed; prior state is reused — O(increment), not O(seen))."""
        assert (self.n_shards, self.m_bits, self.k) == (other.n_shards, other.m_bits, other.k)
        blocks = dict(self.blocks)
        for s, b in other.blocks.items():
            if s in blocks:
                blocks[s] = (
                    np.frombuffer(blocks[s], dtype=np.uint8)
                    | np.frombuffer(b, dtype=np.uint8)
                ).tobytes()
            else:
                blocks[s] = b
        return ShardedBloom(self.n_shards, self.m_bits, self.k, blocks)

    @classmethod
    def from_rows(cls, n_shards: int, m_bits: int, k: int, rows) -> "ShardedBloom":
        return cls(n_shards, m_bits, k, {int(s): bytes(b) for s, b in rows})


def build_bloom(
    seen: DataFrame,
    url_col: str = "url",
    *,
    capacity_per_shard: int = 1_000_000,
    fpp: float = 0.01,
    n_shards: int = 16,
) -> ShardedBloom:
    """Aggregate the seen table into per-shard bit blocks (one Arrow batch
    per shard, numpy-vectorized)."""
    m_bits, k = _params(capacity_per_shard, fpp)
    m_bytes = (m_bits + 7) // 8
    hashed = seen.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards)).alias("shard"),
        *_hash_cols(F.col(url_col)),
    )
    out_schema = StructType(
        [StructField("shard", LongType()), StructField("block", BinaryType())]
    )

    def make_block(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bytes, dtype=np.uint8)
        h1 = pdf["__h1"].to_numpy(dtype=np.uint64)
        h2 = pdf["__h2"].to_numpy(dtype=np.uint64) | np.uint64(1)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "block": [bits.tobytes()]})

    rows = (
        hashed.groupBy("shard")
        .applyInPandas(make_block, schema=out_schema)
        .collect()
    )
    return ShardedBloom(n_shards, m_bits, k, {r["shard"]: bytes(r["block"]) for r in rows})


def split_candidates(
    candidates: DataFrame, bloom: ShardedBloom, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen): definitely_new skips the exact
    anti-join entirely; maybe_seen still gets the exact check (the Bloom
    can never cause a false drop)."""
    spark = candidates.sparkSession
    blocks_b = spark.sparkContext.broadcast(
        {s: np.frombuffer(b, dtype=np.uint8) for s, b in bloom.blocks.items()}
    )
    m_bits, k, n_shards = bloom.m_bits, bloom.k, bloom.n_shards

    # hashes computed JVM-side; membership test is pure numpy over the batch
    @F.pandas_udf("boolean")
    def member(shard: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:
        blocks = blocks_b.value
        sh = shard.to_numpy(dtype=np.int64)
        a = h1.to_numpy(dtype=np.uint64)
        b = h2.to_numpy(dtype=np.uint64) | np.uint64(1)
        out = np.ones(len(sh), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            byte_idx = (pos // 8).astype(np.int64)
            bit = (1 << (pos % 8)).astype(np.uint8)
            hit = np.zeros(len(sh), dtype=bool)
            for s in np.unique(sh):
                blk = blocks.get(int(s))
                mask = sh == s
                if blk is None:
                    continue
                hit[mask] = (blk[byte_idx[mask]] & bit[mask]) != 0
            out &= hit
        return pd.Series(out)

    annotated = candidates.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards))
    ).select("*", *_hash_cols(F.col(url_col)))
    flagged = annotated.withColumn(
        "__maybe", member(F.col("__shard"), F.col("__h1"), F.col("__h2"))
    )
    drop = ["__shard", "__h1", "__h2", "__maybe"]
    definitely_new = flagged.where(~F.col("__maybe")).drop(*drop)
    maybe_seen = flagged.where(F.col("__maybe")).drop(*drop)
    return definitely_new, maybe_seen
