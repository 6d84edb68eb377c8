"""Round-6 probe: per-wave wall-time breakdown of the bench's wave-crawl leg.

Reproduces bench.py's crawl_waves_cyclic leg exactly (same graph, same
FrontierCrawler call) but reports per-wave wall times (crawler metrics'
wall_s), so the ~2 s/wave floor can be attributed. NOT part of the driver
bench.

Usage: python tools/probe_waves.py [n_nodes]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import bench
    from xidel_spark.crawl.crawler import FrontierCrawler
    from xidel_spark.session import get_spark

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("probe_waves", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    links = bench.bench_corpus_links(spark, n_nodes).localCheckpoint(eager=True)
    seeds = bench.bench_seeds(spark, n_nodes)
    t0 = time.time()
    run_ = FrontierCrawler(spark, links).run(seeds)
    total = time.time() - t0
    n_seen = run_.seen.count()
    print(json.dumps({
        "total_sec": round(total, 2),
        "seen_count_sec": round(time.time() - t0 - total, 2),
        "seen": n_seen,
        "waves": run_.waves,
        "per_wave": [
            {k: m.get(k) for k in ("wave", "candidates", "enqueued", "wall_s")}
            for m in run_.metrics
        ],
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
