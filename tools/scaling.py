"""Scaling-efficiency evidence for the north rule.

Runs the identical headline crawl (same synthetic input) at two
parallelism levels — local[N] and local[4N] — in separate JVMs, and
reports throughput at both plus scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

In-sandbox stand-in for the N vs 4N executor cluster comparison
(BASELINE.json north_rule); results recorded in BASELINE.md.

Usage: python tools/scaling.py [--mult 200] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = """
import sys, time, json
sys.path.insert(0, {repo!r})
from xidel_spark.session import get_spark
import bench as B
from xidel_spark.crawl.crawler import FrontierCrawler
cpus = {cpus}
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
n = {n_nodes}
links = B.bench_corpus_links(spark, n).localCheckpoint(eager=True)
seeds = B.bench_seeds(spark, n)
t0 = time.time()
run = FrontierCrawler(spark, links).run(seeds)
el = time.time() - t0
sched = sum(m["candidates"] for m in run.metrics) + run.seen.count()
print(json.dumps({{"cpus": cpus, "elapsed_sec": round(el, 2),
                   "urls_scheduled": sched,
                   "urls_per_sec": round(sched / el, 1),
                   "waves": run.waves}}))
spark.stop()
"""


def run_at(cpus: int, n_nodes: int) -> dict:
    code = RUNNER.format(repo=str(REPO), cpus=cpus, n_nodes=n_nodes)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_SHUFFLE": str(cpus)},
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=int(os.environ.get("BENCH_MULT", "200")))
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    import duckdb  # cheap row count without starting spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = duckdb.sql(f"select count(*) from '{sf_dir}/documents.parquet'").fetchone()[0]
    n_nodes = n_docs * args.mult
    lo = run_at(args.n, n_nodes)
    hi = run_at(args.n * 4, n_nodes)
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "low": lo,
                "high": hi,
                "speedup": round(hi["urls_per_sec"] / lo["urls_per_sec"], 2),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
