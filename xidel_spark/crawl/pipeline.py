"""Processing-context pipelines — the `[ ]` grouping / -f chaining model.

The reference builds a tree of processing contexts: `-f` chains a child
context that receives the followed documents (xidelbase.pas:3362-3370),
`[ ]` brackets scope sub-pipelines (3425-3451), and a *trailing* -f sets
followTo := self for unbounded recursion (3829-3841). The goldens pin the
observable difference:

    a.xml -f //a -e //title   → BBB CCC        (tfe: extract on followed)
    a.xml -e //title -f //a   → AAA BBB … C2   (tef: recurse, extract all)
    a.xml -e //t [-f //a -e //t] → AAA BBB CCC (tefe: one hop, both extract)

Spark form: a pipeline is a list of Stage specs; each stage extracts from
ITS documents and follows into the next stage's seeds; a stage marked
recurse=True runs the full rank-fixpoint crawl instead of a single hop.
Output rows carry (stage, ord) so the global print order is reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract.links import extract_kind_text, extract_links
from .engine import crawl_exact


@dataclass
class Stage:
    extract: list[str] = field(default_factory=list)  # selectors, e.g. ['//title']
    follow: str | None = None                          # link selector feeding the next stage
    recurse: bool = False                              # trailing -f: followTo := self


def run_pipeline(
    spark: SparkSession, docs: DataFrame, seeds: list[str], stages: list[Stage]
) -> DataFrame:
    """(stage, url, ord, selector, value): extraction output in the
    reference's print order — stage by stage, crawl order within."""
    outputs: list[DataFrame] = []
    current = spark.createDataFrame(
        [(u, i + 1) for i, u in enumerate(seeds)], "url string, ord int"
    )
    seen_all = current.select("url")  # global duplication list spans ALL stages
    for si, stage in enumerate(stages):
        if stage.recurse:
            links = extract_links(docs, stage.follow or "//a")
            # the stage frontier stays a DataFrame end-to-end — collecting
            # it to the driver to re-seed would cap recursing stages at
            # driver memory (crawl_exact takes (url, seed_idx) directly)
            res = crawl_exact(
                spark, links, current.select("url", F.col("ord").cast("long").alias("seed_idx"))
            )
            current = res.visited.select("url", "ord")
        for sel in stage.extract:
            vals = extract_kind_text(docs, sel)
            outputs.append(
                current.join(vals, "url").select(
                    F.lit(si).alias("stage"), "url", "ord", F.lit(sel).alias("selector"),
                    F.col("value"),
                )
            )
        if stage.follow and not stage.recurse:
            # one-hop follow: ordered by (parent ord, link idx), deduped at
            # enqueue against everything this pipeline has fetched
            links = extract_links(docs, stage.follow)
            nxt = (
                current.join(links, current.url == links.src)
                .select(
                    F.col("dst").alias("url"),
                    F.struct(F.col("ord").alias("p"), F.col("idx").alias("i")).alias("k"),
                )
                .groupBy("url")
                .agg(F.min("k").alias("k"))
            )
            from ..util import total_order

            nxt = nxt.join(seen_all, "url", "left_anti").select(
                "url", F.col("k.p").alias("__p"), F.col("k.i").alias("__i")
            )
            current = total_order(nxt, ["__p", "__i"], out_col="ord").select(
                "url", "ord"
            )
            seen_all = seen_all.unionByName(current.select("url"))
    result = outputs[0]
    for o in outputs[1:]:
        result = result.unionByName(o)
    return result.orderBy("stage", "ord")


def run_pipeline_dfs(
    spark: SparkSession, docs: DataFrame, seeds: list[str], stages: list[Stage],
    *, max_iter: int = 50,
) -> DataFrame:
    """Unbracketed `-f/-e` chains in the reference's TRUE print order
    (golden tests/output/nest9a): every followed document is processed
    depth-first with the REMAINING action suffix, under one global
    duplication list — so outputs interleave across stages (b's subtree
    prints before c starts).

    Spark form: the stage pipeline is a rank fixpoint like crawl_exact,
    with STAGE-INDEXED link tables (a doc reached at stage s follows stage
    s's selector into stage s+1). The first-enqueuer rule is the min over
    (parent rank, link idx) — the smallest parent rank IS the earliest
    processed parent; the winning enqueue fixes the doc's stage and hence
    its action suffix. The stage graph has no beyond-the-end follows, so
    unlike finite --follow-level the fixpoint is exact (no over-depth
    poisoning; cf. engine.crawl_exact_depth_limited).

    Returns (url, stage, rank, selector, value, ord) ordered by ord =
    (rank, selector position, hit index) — the print order."""
    from pyspark.sql import Observation

    from ..util import total_order
    from .order import seg

    links_by_stage = {
        s: extract_links(docs, st.follow).localCheckpoint(eager=True)
        for s, st in enumerate(stages)
        if st.follow is not None and s + 1 < len(stages)
    }
    best = spark.createDataFrame(
        [(u, seg_val, 0) for u, seg_val in
         ((u, "%08x" % i) for i, u in enumerate(seeds))],
        "url string, rank string, stage int",
    ).localCheckpoint(eager=True)
    for it in range(max_iter):
        edges = None
        for s, links in links_by_stage.items():
            e = (
                best.where(F.col("stage") == s)
                .join(links, F.col("url") == links.src)
                .select(
                    F.col("dst"), F.col("rank").alias("prank"), F.col("idx"),
                    F.lit(s + 1).alias("nstage"),
                )
            )
            edges = e if edges is None else edges.unionByName(e)
        if edges is None:
            break
        # first-enqueuer = the MIN-RANK PARENT (earliest processed) across
        # ALL stages, then its link index — reduce on the parent rank
        # BEFORE concatenating the child segment (comparing concatenated
        # child ranks would wrongly prefer a longer path through an
        # earlier-rank subtree; same trick as engine.crawl_exact)
        cands = (
            edges.groupBy("dst")
            .agg(F.min(F.struct(F.col("prank"), F.col("idx"), F.col("nstage"))).alias("m"))
            .select(
                F.col("dst").alias("url"),
                F.concat(F.col("m.prank"), seg(F.col("m.idx"))).alias("rank"),
                F.col("m.nstage").alias("stage"),
            )
        )
        merged = best.withColumn("old_rank", F.col("rank")).unionByName(
            cands.join(best.where(F.col("stage") == 0).select("url"), "url", "left_anti")
            .withColumn("old_rank", F.lit(None).cast("string"))
        )
        obs = Observation(f"pipe_{it}")
        new_best = (
            merged.groupBy("url")
            .agg(F.min(F.struct("rank", "stage")).alias("m"), F.min("old_rank").alias("o"))
            .withColumn("__ch", (F.col("o").isNull() | (F.col("m.rank") < F.col("o"))).cast("int"))
            .observe(obs, F.sum("__ch").alias("ch"))
            .select("url", F.col("m.rank").alias("rank"), F.col("m.stage").alias("stage"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["ch"] or 0)
        best.unpersist()
        best = new_best
        if changed == 0:
            break
    outputs = []
    for s, stage in enumerate(stages):
        for sel_i, sel in enumerate(stage.extract):
            vals = extract_kind_text(docs, sel)
            outputs.append(
                best.where(F.col("stage") == s)
                .join(vals, "url")
                .select(
                    "url", "stage", "rank", F.lit(sel).alias("selector"),
                    F.col("value"), F.lit(sel_i).alias("__sel"), F.col("idx").alias("__hit"),
                )
            )
    if not outputs:
        return spark.createDataFrame(
            [], "url string, stage int, rank string, selector string, value string, ord int"
        )
    res = outputs[0]
    for o in outputs[1:]:
        res = res.unionByName(o)
    return total_order(res, ["rank", "__sel", "__hit"], out_col="ord").drop(
        "__sel", "__hit"
    )
