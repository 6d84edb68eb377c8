"""Benchmark harness — prints ONE JSON line for the driver.

Headline: frontier throughput (URLs scheduled+deduped/sec) on a cyclic
link graph scaled up from the SF corpus (documents_count × BENCH_MULT
nodes, ~2 links/node), crawled to convergence by the production wave loop
(within-wave first-enqueuer resolution + anti-join dedup) — the north-rule
metric. Plus the exact-DFS crawl, span link extraction, and the
canonicalization UDF at SF scale.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_MULT (default 40).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("BENCH_MULT", "200"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def min_of(fn, n: int = REPS) -> float:
    """min-of-N wall time for a leg. Single-shot numbers on this box flip
    verdicts (r3's driver record showed a 9.8 s bloom-probe outlier vs a
    1.6-3.3 s steady state); the min is the stable, cache-warm figure the
    break-even calibration needs. The two one-off legs (wave-crawl
    headline, bloom build) stay single-shot — they are 25-35 s each and
    their wave-loop variance is relatively small."""
    best = float("inf")
    for _ in range(max(n, 1)):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def bench_corpus_links(spark, n_nodes: int):
    """Cyclic web-ish graph over spark.range — generated partition-parallel,
    no driver materialization. Knuth-scrambled dst gives high-fanout BFS
    (converges in few waves, like a real crawl frontier); host skew via
    quadratic host id exercises AQE skew handling."""
    base = spark.range(n_nodes).select(F.col("id").alias("i"))
    exploded = base.select(
        "i", F.explode(F.sequence(F.lit(0), (F.col("i") % 3).cast("int"))).alias("k")
    )
    url = lambda c: F.format_string(  # noqa: E731
        "http://h%03d.example.com/p/%d", ((c * c) % 997).cast("long"), c.cast("long")
    )
    return exploded.select(
        url(F.col("i")).alias("src"),
        F.col("k").cast("int").alias("idx"),
        url((F.col("i") * 2654435761 + F.col("k") * 1000003 + 12345) % n_nodes).alias("dst"),
    )


def bench_seeds(spark, n_nodes: int):
    return (
        spark.range(0, n_nodes, 35)
        .select(
            F.format_string(
                "http://h%03d.example.com/p/%d",
                ((F.col("id") * F.col("id")) % 997).cast("long"),
                F.col("id"),
            ).alias("url"),
            (F.col("id") / 35).cast("long").alias("seed_idx"),
        )
    )


def run(spark) -> dict:
    from xidel_spark import corpus
    from xidel_spark.crawl.crawler import FrontierCrawler
    from xidel_spark.crawl.engine import crawl_exact
    from xidel_spark.extract.links import extract_links
    from xidel_spark.urlnorm import canonicalize

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_nodes = n_docs * MULT
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # q1: headline — wave crawl to convergence on the scaled cyclic graph
    # (graph synthesis is not crawl work: materialized outside the clock)
    links = bench_corpus_links(spark, n_nodes).localCheckpoint(eager=True)
    seeds = bench_seeds(spark, n_nodes)
    t0 = time.time()
    run_ = FrontierCrawler(spark, links).run(seeds)
    n_seen = run_.seen.count()
    timings["crawl_waves_cyclic"] = time.time() - t0
    scheduled = sum(m["candidates"] for m in run_.metrics) + n_seen
    extras["frontier_urls_scheduled"] = scheduled
    extras["frontier_seen"] = n_seen
    extras["frontier_waves"] = run_.waves
    extras["frontier_urls_per_sec"] = round(scheduled / timings["crawl_waves_cyclic"], 1)

    # q2: exact DFS rank fixpoint on the layered SF corpus
    docs = corpus.synth_docs(spark, SF_DIR)

    def leg_dfs():
        l2 = extract_links(docs, "//a")
        crawl_exact(spark, l2, corpus.synth_seeds(spark, SF_DIR)).visited.count()

    timings["crawl_dfs_exact"] = min_of(leg_dfs)

    # q3: span link extraction over the interleaved docs (replicated)
    reps = spark.range(MULT)
    big_docs = docs.crossJoin(reps)
    timings["link_extraction"] = min_of(lambda: extract_links(big_docs, "//a").count())

    # q4: canonicalization throughput (replicated dirty urls) — both
    # engines: the Arrow row-map (auto default on local) and the pure
    # Catalyst expression (auto default off-box, no Python boundary)
    from xidel_spark.urlnorm import canonicalize_expr

    # the crossJoin inherits the small side's single partition — spread the
    # replicated set across the executor threads (affects both engines
    # equally; the leg measures canonicalization, not a 1-core ceiling)
    dirty = (
        corpus.dirty_urls(spark, SF_DIR).crossJoin(reps)
        .repartition(CPUS).localCheckpoint(eager=True)
    )
    timings["url_canonicalize"] = min_of(
        lambda: dirty.select(canonicalize(F.col("raw_url")).alias("c"))
        .where(F.col("c").isNotNull())
        .count()
    )
    extras["url_canonicalize_expr_sec"] = round(
        min_of(
            lambda: dirty.select(canonicalize_expr(F.col("raw_url")).alias("c"))
            .where(F.col("c").isNotNull())
            .count()
        ),
        2,
    )

    # q5: minhash-LSH dedup candidates over the SF document corpus
    from xidel_spark.ops import dedup_text as dt

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )

    def leg_lsh():
        sigs = dt.minhash_signature(base, k=8)
        dt.lsh_candidate_pairs(dt.lsh_buckets(sigs, bands=4)).count()

    timings["dedup_minhash_lsh"] = min_of(leg_lsh)

    # q6: ANN top-k (SRP-LSH) over the embeddings table
    from xidel_spark.ops.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timings["ann_topk_lsh"] = min_of(
        lambda: ann_topk_lsh(
            emb.where(F.col("vec_id") < 64), emb, k=5, bits=8, tables=4
        ).count()
    )

    # q7: bloom-prefiltered dedup in the mature-crawl regime (|seen| >>
    # per-wave candidates: 20M seen, 50k candidates, 5% dups). Steady-state
    # per-wave cost = probe (the resident partitioned filter; candidates'
    # probe rows are the only shuffle) + 1/N of the batched exact
    # adjudication of the maybes (false drops stay impossible — maybes are
    # exactly checked, just every N waves). The exact anti-join reshuffles
    # the full seen side every wave. Filter build is one-off (reported).
    import xidel_spark.crawl.bloom as bl
    from xidel_spark.crawl.bloom import build_bloom, flag_candidates

    n_seen = min(20_000_000, n_nodes * 20)
    useen = lambda c: F.format_string("http://s%04d.example.com/d/%d", (c % 4096).cast("long"), c.cast("long"))  # noqa: E731
    seen_big = spark.range(n_seen).select(useen(F.col("id")).alias("url")).localCheckpoint(eager=True)
    cand = spark.range(50_000).select(
        F.when(F.col("id") % 20 == 0, useen(F.col("id") * 399))  # 5% dups
        .otherwise(useen(F.col("id") + n_seen))
        .alias("url")
    ).localCheckpoint(eager=True)
    n_cand = cand.count()
    t_exact = min_of(lambda: cand.join(seen_big, "url", "left_anti").count())
    exact_dups = n_cand - cand.join(seen_big, "url", "left_anti").count()
    t0 = time.time()
    bloom = build_bloom(seen_big, capacity=2 * n_seen, n_shards=64, partitioned_cache=True)
    t_build = time.time() - t0
    old_thresh = bl.BROADCAST_MAX_BITS
    bl.BROADCAST_MAX_BITS = 0  # resident partitioned filter → distributed probe
    try:
        t_probe = min_of(
            lambda: flag_candidates(cand, bloom).where(F.col("__maybe")).count()
        )
        # materialize the flagged set once, off-clock, for the adjudication leg
        flagged = flag_candidates(cand, bloom).localCheckpoint(eager=True)
        n_maybe = flagged.where(F.col("__maybe")).count()
        maybes = flagged.where(F.col("__maybe")).select("url")
        t_adjudicate = min_of(lambda: maybes.join(seen_big, "url", "left_anti").count())
        bloom_dups = n_maybe - maybes.join(seen_big, "url", "left_anti").count()
    finally:
        bl.BROADCAST_MAX_BITS = old_thresh
    assert bloom_dups == exact_dups, (bloom_dups, exact_dups)  # no false drops
    amortize_waves = 5
    timings["dedup_bloom_probe"] = t_probe
    extras["bloom_exact_antijoin_sec"] = round(t_exact, 2)
    extras["bloom_adjudicate_sec"] = round(t_adjudicate, 2)
    extras["bloom_build_sec"] = round(t_build, 2)
    extras["bloom_speedup_vs_exact"] = round(
        t_exact / (t_probe + t_adjudicate / amortize_waves), 2
    )
    extras["bloom_false_positives"] = n_maybe - bloom_dups

    return timings | {"extras": extras}


def main() -> None:
    from xidel_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    result = run(spark)
    total = time.time() - t0
    extras = result.pop("extras")
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    line = {
        "metric": "crawl_pipeline_total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in result.items()},
        "sf": float(sf),
        "cpus": CPUS,
        "bench_nodes": extras["frontier_seen"],
        "frontier_urls_per_sec": extras["frontier_urls_per_sec"],
        "frontier_waves": extras["frontier_waves"],
        "bloom_speedup_vs_exact": extras["bloom_speedup_vs_exact"],
        "bloom_exact_antijoin_sec": extras["bloom_exact_antijoin_sec"],
        "bloom_build_sec": extras["bloom_build_sec"],
        "url_canonicalize_expr_sec": extras["url_canonicalize_expr_sec"],
        "bench_reps": REPS,
    }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
