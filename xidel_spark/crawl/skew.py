"""Skew salting for hot hosts.

Web host distributions are power-law: one mega-host can dominate a
frontier partition. AQE's skew-join splitting covers the join side; this
covers OUR repartitioning (the host-bucketed frontier): hot keys get a
salt suffix so one host spreads over `factor` partitions. The politeness
budget still applies per TRUE host (politeness.py windows on `host`, not
the salted key) — salting only balances physical placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(df: DataFrame, key: str, threshold_ratio: float = 0.1) -> list[str]:
    """keys holding more than threshold_ratio of all rows."""
    total = df.count()
    if total == 0:
        return []
    hot = (
        df.groupBy(key)
        .count()
        .where(F.col("count") > total * threshold_ratio)
        .select(key)
        .collect()
    )
    return [r[key] for r in hot]


def salted_repartition(df: DataFrame, key: str, hot_keys: list[str], factor: int = 8) -> DataFrame:
    """Repartition by key, with hot keys split across `factor` salted
    buckets. Adds a __salt column consumers may ignore."""
    if not hot_keys:
        return df.repartition(F.col(key))
    is_hot = F.col(key).isin(hot_keys)
    salt = F.when(is_hot, F.pmod(F.xxhash64("url"), F.lit(factor))).otherwise(F.lit(0))
    return df.withColumn("__salt", salt).repartition(F.col(key), F.col("__salt"))
