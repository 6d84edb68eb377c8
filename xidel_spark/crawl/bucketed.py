"""Bucketed state tables — shuffle-stable seen/links for the wave loop.

The naive wave loop reshuffles the entire seen set (for the dedup
anti-join) and the entire link table (for the expansion join) EVERY wave:
O(waves × corpus) shuffle volume, the scaling killer at 10^10 URLs.

Fix: persist both as hash-bucketed tables (Spark `CLUSTERED BY` — the
local stand-in for Iceberg `bucket(N, url)` partitioning):

- `seen`  bucketed by url  → per-wave anti-join shuffles only the (small)
  candidate side into the bucket layout; the seen side is scanned in place.
  Appends (each wave's increment) add files per bucket, never rewrite.
- `links` bucketed by src  → the expansion join shuffles only the frontier.

On a real cluster these are Iceberg tables with bucket transforms and the
same plans apply; this module is the only place that knows the storage
mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BucketedTable:
    """A hash-bucketed, append-only parquet table registered in the session
    catalog."""

    def __init__(self, spark: SparkSession, name: str, bucket_col: str, n_buckets: int = 32):
        self.spark = spark
        self.name = name
        self.bucket_col = bucket_col
        self.n_buckets = n_buckets
        self._created = False

    def overwrite(self, df: DataFrame) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}")
        (
            df.write.bucketBy(self.n_buckets, self.bucket_col)
            .sortBy(self.bucket_col)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(self.name)
        )
        self._created = True

    def append(self, df: DataFrame) -> None:
        if not self._created and not self.spark.catalog.tableExists(self.name):
            self.overwrite(df)
            return
        (
            df.write.bucketBy(self.n_buckets, self.bucket_col)
            .sortBy(self.bucket_col)
            .mode("append")
            .format("parquet")
            .saveAsTable(self.name)
        )
        self._created = True

    def df(self) -> DataFrame:
        return self.spark.table(self.name)

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}")
        self._created = False
