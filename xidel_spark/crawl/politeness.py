"""Per-host politeness scheduling.

The reference sleeps `--wait s` between consecutive frontier pops
(xidelbase.pas:2118) — a global budget, trivially so because the crawler is
single-threaded. The distributed generalization (north rule) applies the
same budget per politeness bucket (host): within a host, consecutive
fetches are spaced >= wait; across hosts fetches proceed in parallel.

Pure window functions — one shuffle on host, which is also the frontier's
partitioning key, so at scale the sort is within already-co-located
partitions (sortWithinPartitions after repartition(host) keeps the
exchange count at one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..urlnorm import host_of


def politeness_schedule(
    visited: DataFrame,
    wait_ms: int,
    url_col: str = "url",
    watermark: DataFrame | None = None,
) -> DataFrame:
    """Assign each visit a host bucket, a per-host sequence number (in crawl
    rank order) and the earliest allowed fetch time under the budget.

    `watermark` — optional (host, last_ms) table carrying each host's last
    scheduled fetch from prior waves, so the >= wait_ms spacing also holds
    across the wave boundary (the reference's single global clock never
    resets, xidelbase.pas:2118). The join shares the host key with the
    window's shuffle, so it adds no extra exchange of the frontier."""
    host = host_of(F.col(url_col))
    w = Window.partitionBy("host").orderBy("rank")
    out = (
        visited.withColumn("host", host)
        .withColumn("host_seq", F.row_number().over(w))
        .withColumn("__off", ((F.col("host_seq") - 1) * wait_ms).cast("long"))
    )
    if watermark is not None:
        out = out.join(watermark, "host", "left").withColumn(
            "__base", F.coalesce(F.col("last_ms") + wait_ms, F.lit(0).cast("long"))
        ).drop("last_ms")
    else:
        out = out.withColumn("__base", F.lit(0).cast("long"))
    return out.withColumn(
        "scheduled_ms", (F.col("__base") + F.col("__off")).cast("long")
    ).drop("__off", "__base")


def host_watermark(scheduled: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """(host, last_ms): each host's latest scheduled fetch time, folded with
    the previous watermark — one small groupBy per wave."""
    cur = scheduled.groupBy("host").agg(F.max("scheduled_ms").alias("last_ms"))
    if prev is not None:
        cur = prev.unionByName(cur).groupBy("host").agg(
            F.max("last_ms").alias("last_ms")
        )
    return cur


def assert_spacing(scheduled: DataFrame, wait_ms: int) -> bool:
    """Replay check: within every host, consecutive scheduled times differ
    by >= wait_ms (the politeness invariant the oracle replays)."""
    w = Window.partitionBy("host").orderBy("host_seq")
    gaps = scheduled.withColumn("gap", F.col("scheduled_ms") - F.lag("scheduled_ms").over(w))
    return gaps.where(F.col("gap").isNotNull() & (F.col("gap") < wait_ms)).limit(1).count() == 0
