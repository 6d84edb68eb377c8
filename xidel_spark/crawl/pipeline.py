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
            res = crawl_exact(spark, links, [r["url"] for r in current.orderBy("ord").collect()])
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
