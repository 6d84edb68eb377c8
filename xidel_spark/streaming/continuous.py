"""Continuous crawl via Structured Streaming.

The reference is a batch CLI; its crawl loop is an iterative drain
(SURVEY.md §2.5). The streaming transplant: seeds arrive as a stream
(file source here; Kafka on a cluster), and every micro-batch runs the
SAME wave-loop logic via foreachBatch against the shared link/seen state —
so batch and streaming share one engine (the Structured Streaming design
point: incremental execution of the batch plan).

Watermark analogue: per-host frontier progress is monotone in
(depth, discovery rank); a host bucket is 'closed' for a wave once its
rank high-water-mark passes — tracked in the store's wave manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..crawl.crawler import FrontierCrawler

SEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("seed_idx", T.LongType()),
    ]
)


class ContinuousCrawl:
    """Drain seed batches from a stream; each batch crawls to convergence
    against the shared seen set (cumulative across batches)."""

    def __init__(self, spark: SparkSession, links: DataFrame, **crawler_kw):
        self.spark = spark
        self.links = links
        self.crawler_kw = crawler_kw
        self.seen: DataFrame | None = None
        self.batches: list[dict] = []

    def _process_batch(self, seeds_df: DataFrame, batch_id: int) -> None:
        crawler = FrontierCrawler(self.spark, self.links, **self.crawler_kw)
        if self.seen is not None:
            # pre-seed the dup list with everything earlier batches saw:
            # cross-batch enqueue-time dedup, same rule as in-batch
            seeds_df = seeds_df.join(self.seen, "url", "left_anti")
        if seeds_df.isEmpty():
            return
        run = crawler.run(seeds_df.select("url", "seed_idx"))
        new_seen = run.seen if self.seen is None else self.seen.unionByName(run.seen).distinct()
        self.seen = new_seen.localCheckpoint(eager=True)
        self.batches.append(
            {"batch_id": batch_id, "waves": run.waves, "seen_total": self.seen.count()}
        )

    def run_from_files(self, seed_dir: str, *, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(SEED_SCHEMA)
            .json(seed_dir)
        )
        writer = stream.writeStream.foreachBatch(self._process_batch).outputMode("append")
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.start()
