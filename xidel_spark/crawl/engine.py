"""The distributed crawl engine: frontier closure + exact DFS crawl order.

Reference semantics being reproduced (see SURVEY.md §2.2 and
xidel_spark/crawl/simulator.py for the sequential oracle):

- **DFS visit order** (xidelbase.pas:2007-2020): children of a document are
  enqueued all at once at the parent's visit, in link-document order, and
  each child is fully processed before its later siblings.
- **Enqueue-time dedup** (xidelbase.pas:1484-1491): a URL is dropped iff an
  equal request was *ever enqueued* before — where "before" is the parent's
  visit time, not the child's. Consequence (pinned by golden
  tests/output/tef): a URL enqueued by an early-visited shallow parent
  shadows links from later-visited parents, and the URL is visited at the
  *enqueueing* parent's position.

Spark-first formulation
-----------------------
DFS order is encoded as a rank string (order.py). The final crawl tree
satisfies a fixpoint: a node's first enqueuer is the *visited* in-neighbor
with the smallest rank, and ``rank(v) = rank(first_enqueuer) || seg(link_idx)``.

With dedup ON and unlimited depth (the reference's default: followMaxLevel
99999 ≈ ∞), "visited" = "reachable", so the fixpoint is a *monotone*
lexicographic-min path problem — solved by Bellman-Ford-style DataFrame
relaxation (`crawl_exact`): each iteration is one join + one aggregation,
ranks only decrease, convergence in O(tree height) iterations. This is the
same shape as distributed SSSP / connected components, and parallelizes to
arbitrarily many executors: no sequential pop loop.

With dedup OFF (``--allow-repetitions``) the crawl is pure tree expansion
(`expand_nodedup`) — embarrassingly parallel per wave.

With dedup ON **and** a finite depth limit, the reference's behavior is
genuinely sequential (an over-depth enqueue still poisons the seen set:
xidelbase.pas add() registers before processFollowTo's depth check), and
lexicographically-first DFS is P-complete — `crawl_exact_depth_limited`
replays it with a per-pop Spark loop (exact; used at fixture scale). The
scalable path for bounded-depth production crawls is `crawl_waves`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .order import seg, seg_py

UNLIMITED = 1 << 30


class _sized_loop:
    """Scale-adaptive physical sizing for an iterative fixpoint (r6,
    guide §2): shuffle partitions derived from the loop's bounded work
    (expected_rows / xidel.crawl.waveRowsPerPartition, capped at the
    session setting), and AQE — whose per-query stage re-planning measured
    ~0.5 s of driver latency per tiny iteration — disabled when the whole
    loop is below xidel.crawl.aqeMinCandidates rows. Restores both confs on
    exit; results are unaffected (only partition counts / replanning
    change). `static` tells callers whether the plan is statically sized
    (they then hint SHUFFLE_HASH where the planner would otherwise pick a
    sort-merge join on default-stat checkpointed inputs)."""

    def __init__(self, spark: SparkSession, expected_rows: int):
        self.spark = spark
        self.expected = max(1, int(expected_rows))

    def __enter__(self) -> bool:
        conf = self.spark.conf
        self._parts0 = conf.get("spark.sql.shuffle.partitions")
        self._aqe0 = conf.get("spark.sql.adaptive.enabled", "true")
        rpp = int(conf.get("xidel.crawl.waveRowsPerPartition", "50000"))
        aqe_min = int(conf.get("xidel.crawl.aqeMinCandidates", "5000000"))
        parts = min(int(self._parts0), max(1, -(-self.expected // rpp)))
        static = self.expected <= aqe_min
        conf.set("spark.sql.shuffle.partitions", str(parts))
        conf.set("spark.sql.adaptive.enabled", "false" if static else "true")
        return static

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self._parts0)
        self.spark.conf.set("spark.sql.adaptive.enabled", self._aqe0)


@dataclass
class CrawlResult:
    visited: DataFrame   # (url, rank, depth) — one row per visit (repeats possible if dedup off)
    seen: DataFrame      # (url) — every enqueued url (the duplication list)
    waves: int = 0
    metrics: list[dict] = field(default_factory=list)


def _seeds_df(spark: SparkSession, seeds: list[str] | DataFrame, dedup: bool) -> DataFrame:
    """Seed frontier with FIFO ranks; dedup-at-enqueue applies to seeds too
    (golden tests/output/repetitionoff: the same seed twice fetches once)."""
    if isinstance(seeds, DataFrame):
        df = seeds.select("url", "seed_idx")
    else:
        df = spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], "url string, seed_idx long"
        )
    if dedup:
        df = (
            df.groupBy("url")
            .agg(F.min("seed_idx").alias("seed_idx"))
        )
    return df.select("url", seg(F.col("seed_idx").cast("int")).alias("rank"), F.lit(0).alias("depth"))


def _with_order(visited: DataFrame, approx_rows: int | None = None) -> DataFrame:
    """ord = global crawl-order position. Range-partitioned two-pass
    numbering (util.total_order) — the rank string already IS the total
    order, so no single-partition sort is ever needed. Callers that track
    the visited size pass approx_rows so the range partitioning is sized
    by data instead of the session constant (guide §2)."""
    from ..util import total_order

    n = None
    if approx_rows is not None:
        spark = visited.sparkSession
        rpp = int(spark.conf.get("xidel.crawl.waveRowsPerPartition", "50000"))
        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n = min(base, max(1, -(-int(approx_rows) // rpp)))
    return total_order(visited, ["rank"], out_col="ord", num_partitions=n)


def crawl_exact(
    spark: SparkSession,
    links: DataFrame,
    seeds: list[str] | DataFrame,
    *,
    max_iter: int = 200,
) -> CrawlResult:
    """Exact xidel crawl (dedup ON, unlimited depth) via rank relaxation.

    `links`: (src: string, idx: int|long, dst: string) — link-document order
    per src given by idx. Returns visit order identical to the reference's
    recursive loop (golden tests/output/tef).
    """
    from pyspark.sql import Observation

    # materialize the link table ONCE, hash-partitioned on the join key:
    # without this every relaxation step re-runs the whole upstream plan
    # (corpus synthesis / span extraction — scan + groupBy + join + explode
    # per iteration, guide §2.4) and re-shuffles links for the sort-merge
    # join. The persisted InMemoryRelation keeps hashpartitioning(src), so
    # only the (small) best side exchanges per step. Standard iterative-
    # algorithm shape; MEMORY_AND_DISK spills at scale.
    links = (
        links.select(F.col("src"), F.col("idx").cast("int").alias("idx"), F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    n_links = links.count()
    waves = 0
    # best is broadcast into the relaxation join while provably small
    # (|best| ≤ |seeds| + Σ changed, tracked exactly from the Observation)
    # — the links side then needs neither exchange nor sort; falls back to
    # the co-partitioned shuffle join when the frontier outgrows the cap,
    # exactly like FrontierCrawler's frontier broadcast.
    bcast_max = int(spark.conf.get("xidel.crawl.broadcastBestMax", "2000000"))
    try:
        with _sized_loop(spark, n_links) as static:
            # seed prep (a dedup groupBy + checkpoint) runs under the loop
            # sizing too — at fixture/gate scale it is a 1-partition job
            seed_urls = _seeds_df(spark, seeds, dedup=True).localCheckpoint(eager=True)
            best = seed_urls
            best_rows_ub = seed_urls.count()
            for it in range(max_iter):
                waves += 1
                # one relaxation step: per dst, the best (parent rank, link
                # idx). Seeds are excluded: all data sources are enqueued
                # into the dup list before any visit (xidelbase.pas:
                # 2099-2100), so a seed's rank is fixed and links back to a
                # seed are always dedup-dropped.
                lnk = links.hint("SHUFFLE_HASH") if static else links
                bside = F.broadcast(best) if best_rows_ub <= bcast_max else best
                cand = (
                    bside.join(lnk, best.url == links.src)
                    .groupBy(links.dst)
                    .agg(F.min(F.struct("rank", "idx", "depth")).alias("m"))
                    .select(
                        F.col("dst").alias("url"),
                        F.concat(F.col("m.rank"), seg(F.col("m.idx"))).alias("rank"),
                        (F.col("m.depth") + 1).alias("depth"),
                    )
                    .join(seed_urls.select("url"), "url", "left_anti")
                )
                # convergence detection FUSED into the relaxation aggregate:
                # carry the previous rank on the best side; a url changed iff
                # it is new (no old rank) or relaxed below it. The count
                # rides the checkpoint job as an Observation — no separate
                # anti-join probe per iteration.
                merged = best.withColumn("old_rank", F.col("rank")).unionByName(
                    cand.withColumn("old_rank", F.lit(None).cast("string"))
                )
                obs = Observation(f"relax_{it}")
                new_best = (
                    merged.groupBy("url")
                    .agg(
                        F.min(F.struct("rank", "depth")).alias("m"),
                        F.min("old_rank").alias("old_rank"),
                    )
                    .withColumn(
                        "__changed",
                        (F.col("old_rank").isNull() | (F.col("m.rank") < F.col("old_rank"))).cast("int"),
                    )
                    .observe(obs, F.sum("__changed").alias("ch"))
                    .select("url", F.col("m.rank").alias("rank"), F.col("m.depth").alias("depth"))
                    .localCheckpoint(eager=True)
                )
                changed = int(obs.get["ch"] or 0)
                if best is not seed_urls:
                    best.unpersist()  # superseded relaxation state
                best = new_best
                best_rows_ub += changed  # every new url counts as changed
                if changed == 0:
                    break
    finally:
        # best/visited derive from checkpointed RDDs only — links is free
        links.unpersist()
    visited = _with_order(best, approx_rows=best_rows_ub)
    seen = best.select("url")
    return CrawlResult(visited=visited, seen=seen, waves=waves)


def expand_nodedup(
    spark: SparkSession,
    links: DataFrame,
    seeds: list[str] | DataFrame,
    *,
    max_depth: int,
) -> CrawlResult:
    """Crawl with ``--allow-repetitions`` (dedup OFF) and a depth limit.

    Pure tree expansion: every link spawns a visit instance (goldens
    tests/output/maxlevel0..3, repetitionon). One wave per depth level.
    """
    # same iterative-loop materialization + sizing as crawl_exact: links is
    # scanned once per depth level, never re-derived or re-shuffled
    links = (
        links.select(F.col("src"), F.col("idx").cast("int").alias("idx"), F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    n_links = links.count()
    enqueued_only = None
    try:
        with _sized_loop(spark, n_links) as static:
            level = _seeds_df(spark, seeds, dedup=False).localCheckpoint(eager=True)
            layers = [level]
            for d in range(max_depth + 1):
                lnk = links.hint("SHUFFLE_HASH") if static else links
                children = (
                    level.join(lnk, level.url == links.src)
                    .select(
                        F.col("dst").alias("url"),
                        F.concat("rank", seg(F.col("idx"))).alias("rank"),
                        F.lit(d + 1).alias("depth"),
                    )
                )
                if d < max_depth:
                    level = children.localCheckpoint(eager=True)
                    if level.limit(1).count() == 0:
                        break
                    layers.append(level)
                else:
                    # children of depth-max_depth visits are enqueued
                    # (registered) but never fetched (xidelbase.pas:2012
                    # depth check at fetch time) — materialized so the
                    # returned seen set does not re-reference links after
                    # unpersist
                    enqueued_only = children.select("url").localCheckpoint(eager=True)
    finally:
        links.unpersist()
    visited = layers[0]
    for extra in layers[1:]:
        visited = visited.unionByName(extra)
    seen = visited.select("url")
    if enqueued_only is not None:
        seen = seen.unionByName(enqueued_only)
    return CrawlResult(visited=_with_order(visited), seen=seen.distinct(), waves=len(layers))


def crawl_exact_depth_limited(
    spark: SparkSession,
    links: dict[str, list[str]] | DataFrame,
    seeds: list[str],
    *,
    max_depth: int,
) -> CrawlResult:
    """Exact semantics for dedup ON + finite depth limit.

    This combination is inherently sequential in the reference (the seen set
    is mutated in visit order and over-depth enqueues still poison it), so we
    replay it with the sequential oracle and parallelize the result. Only
    used at fixture scale; production bounded-depth crawls use crawl_waves.

    Guarded: a link table above `max_replay_links` rows raises instead of
    OOM-ing the driver — this path is P-complete (dedup ON + finite depth
    serializes on the visit-order-mutated seen set), so there is no
    distributed exact form to fall back to; callers at scale must accept
    crawl_waves' BFS order or lift the depth limit (crawl_exact).
    """
    from .simulator import simulate_crawl

    max_replay_links = int(
        spark.conf.get("xidel.crawl.maxReplayLinks", "5000000")
    )
    if isinstance(links, DataFrame):
        n_links = links.count()
        if n_links > max_replay_links:
            raise ValueError(
                f"crawl_exact_depth_limited replays the crawl on the driver "
                f"(P-complete: dedup ON + finite depth is inherently "
                f"sequential) and the link table has {n_links} rows "
                f"(> xidel.crawl.maxReplayLinks={max_replay_links}). "
                f"Use crawl_waves(max_depth=...) for scalable BFS-order "
                f"bounded crawls, or crawl_exact for unlimited depth."
            )
        rows = links.select("src", "idx", "dst").collect()
        adj: dict[str, list[tuple[int, str]]] = {}
        for r in rows:
            adj.setdefault(r["src"], []).append((r["idx"], r["dst"]))
        link_map = {k: [d for _, d in sorted(v)] for k, v in adj.items()}
    else:
        link_map = links
    sim = simulate_crawl(link_map, seeds, max_depth=max_depth, dedup=True)
    visited = spark.createDataFrame(
        [(u, seg_py(i), d, i + 1) for i, (u, d) in enumerate(zip(sim.visit_order, sim.visit_depths))],
        "url string, rank string, depth int, ord int",
    )
    seen = spark.createDataFrame([(u,) for u in sorted(sim.seen)], "url string")
    return CrawlResult(visited=visited, seen=seen, waves=len(sim.visit_order))


def crawl_waves(
    spark: SparkSession,
    links: DataFrame,
    seeds: list[str] | DataFrame,
    *,
    max_depth: int = UNLIMITED,
    max_waves: int = 10_000,
    shuffle_partitions: int | None = None,
) -> CrawlResult:
    """Scalable wave-synchronous (BFS) frontier loop — the production path.

    Per wave: frontier ⋈ links → candidates → within-wave first-enqueuer
    resolution (min rank) → LEFT ANTI join vs the seen set (the central
    dedup join, SURVEY.md §2.4) → new frontier. Ranks still give a total,
    deterministic crawl order (BFS-flavored); the seen SET equals the exact
    engine's whenever depth is unlimited, since both are reachability.

    Per-wave metrics (candidates / deduped / enqueued) are recorded —
    the lineage the north rule asks to checkpoint.
    """
    from pyspark.sql import Observation

    # iterative-loop materialization + sizing (see crawl_exact): links is
    # pinned once, co-partitioned on src; the sort-merge join on static
    # waves is hinted to a shuffled-hash build
    links = (
        links.select(F.col("src"), F.col("idx").cast("int").alias("idx"), F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    n_links = links.count()
    metrics: list[dict] = []
    wave = 0
    try:
        with _sized_loop(spark, n_links) as static:
            frontier = _seeds_df(spark, seeds, dedup=True).localCheckpoint(eager=True)
            # seen is an append-only UNION of per-wave frontier increments:
            # each increment is checkpointed exactly once, never rewritten
            # (the Iceberg append pattern — at 10^10 scale the seen table
            # must not be copied per wave).
            seen = frontier.select("url")
            visited_layers = [frontier]
            while wave < max_waves:
                depth = wave
                if depth + 1 > max_depth:
                    break
                lnk = links.hint("SHUFFLE_HASH") if static else links
                cand = (
                    frontier.join(lnk, frontier.url == links.src)
                    .groupBy(links.dst)
                    .agg(F.min(F.struct("rank", "idx", "depth")).alias("m"))
                    .select(
                        F.col("dst").alias("url"),
                        F.concat(F.col("m.rank"), seg(F.col("m.idx"))).alias("rank"),
                        (F.col("m.depth") + 1).alias("depth"),
                    )
                )
                # ONE job per wave: the candidate/dedup counts ride the fresh
                # checkpoint as an Observation over the pre-filter rows — no
                # separate cand checkpoint and no extra count jobs
                obs = Observation(f"wave_{wave}")
                seen_side = seen.withColumn("__seen", F.lit(True))
                if static:
                    seen_side = seen_side.hint("SHUFFLE_HASH")
                fresh = (
                    cand.join(seen_side, "url", "left")
                    .observe(
                        obs,
                        F.count(F.lit(1)).alias("n_cand"),
                        F.sum(F.col("__seen").isNotNull().cast("long")).alias("n_dup"),
                    )
                    .where(F.col("__seen").isNull())
                    .drop("__seen")
                    .localCheckpoint(eager=True)
                )
                got = obs.get
                n_cand = int(got["n_cand"] or 0)
                n_fresh = n_cand - int(got["n_dup"] or 0)
                metrics.append(
                    {"wave": wave, "candidates": n_cand, "deduped": n_cand - n_fresh, "enqueued": n_fresh}
                )
                if n_fresh == 0:
                    break
                frontier = fresh
                seen = seen.unionByName(frontier.select("url"))
                visited_layers.append(frontier)
                wave += 1
    finally:
        links.unpersist()
    visited = visited_layers[0]
    for extra in visited_layers[1:]:
        visited = visited.unionByName(extra)
    return CrawlResult(visited=_with_order(visited), seen=seen, waves=wave + 1, metrics=metrics)
