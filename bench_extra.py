"""Round-6 auxiliary bench: the frozen bench.py legs plus ENVIRONMENT
CAPTURE (VERDICT r5 item 2 — a drifted box must be distinguishable from a
code regression without a judge-side bisect).

Runs bench.run() unchanged (same legs, same SF/env contract) and emits the
same JSON line EXTENDED with a `box` object: loadavg before/after, free
memory, cpufreq range. This file is NOT the measurement of record —
bench.py stays frozen — it exists so recorded numbers carry box evidence.

Usage: python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def box_snapshot() -> dict:
    out: dict = {}
    try:
        out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    except OSError:
        pass
    try:
        mem = dict(
            line.split(":")[:2]
            for line in open("/proc/meminfo").read().splitlines()
            if ":" in line
        )
        out["mem_available_kb"] = int(mem.get("MemAvailable", "0").split()[0])
    except (OSError, ValueError):
        pass
    freqs = []
    try:
        import glob

        for f in glob.glob("/sys/devices/system/cpu/cpu*/cpufreq/scaling_cur_freq")[:8]:
            freqs.append(int(open(f).read()))
    except (OSError, ValueError):
        pass
    if freqs:
        out["cpufreq_khz_min_max"] = [min(freqs), max(freqs)]
    return out


def contamination_leg(spark, sf_dir: str) -> dict:
    """VERDICT r5 item 8: contamination_ngram at sf0.1 with a ~100k-ngram
    benchmark set — times the broadcast-membership join and confirms the
    broadcast survives planning (no SortMergeJoin of the documents)."""
    from pyspark.sql import functions as F

    from xidel_spark.ops import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    # ~2% of docs as the 'benchmark' suite: at sf0.1 that is ~100 docs ×
    # ~1k distinct 3-gram shingles ≈ 1e5 benchmark n-grams
    bench_set = docs.where(F.col("doc_id") % 50 == 0)
    out = curation.contamination_check(docs, bench_set)
    plan = out._jdf.queryExecution().executedPlan().toString()
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    return {
        "contamination_sec": round(dt, 2),
        "contamination_broadcast": "BroadcastExchange" in plan
        and "SortMergeJoin" not in plan,
    }


def main() -> None:
    import bench
    from xidel_spark.session import get_spark

    before = box_snapshot()
    spark = get_spark(
        "bench_extra", master=f"local[{bench.CPUS}]", shuffle_partitions=max(bench.CPUS, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    result = bench.run(spark)
    total = time.time() - t0
    extras = result.pop("extras")
    sf = bench.SF_DIR.rstrip("/").split("sf")[-1]
    line = {
        "metric": "crawl_pipeline_total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in result.items()},
        "sf": float(sf),
        "cpus": bench.CPUS,
        "bench_nodes": extras["frontier_seen"],
        "frontier_urls_per_sec": extras["frontier_urls_per_sec"],
        "frontier_waves": extras["frontier_waves"],
        "bloom_speedup_vs_exact": extras["bloom_speedup_vs_exact"],
        "bloom_build_sec": extras["bloom_build_sec"],
        "url_canonicalize_expr_sec": extras["url_canonicalize_expr_sec"],
        "box": {"before": before, "after": box_snapshot()},
    }
    line.update(contamination_leg(spark, bench.SF_DIR))
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
