"""Property-based engine-vs-oracle equivalence on random graphs.

hypothesis generates small arbitrary digraphs (cycles, self-loops,
multi-edges, unreachable nodes all possible); the distributed rank
fixpoint must reproduce the sequential simulator exactly every time.
Example count is small because each example runs Spark jobs; the
deterministic adversarial set lives in test_crawl_properties.py.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xidel_spark.crawl.engine import crawl_exact, expand_nodedup
from xidel_spark.crawl.simulator import simulate_crawl

NODES = [f"n{i}" for i in range(7)]

graph_strategy = st.dictionaries(
    keys=st.sampled_from(NODES),
    values=st.lists(st.sampled_from(NODES), max_size=4),
    max_size=7,
)
seeds_strategy = st.lists(st.sampled_from(NODES), min_size=1, max_size=3)


def links_df(spark, link_map):
    rows = [(s, i, d) for s, dsts in link_map.items() for i, d in enumerate(dsts)]
    if not rows:
        rows = []
    return spark.createDataFrame(rows, "src string, idx int, dst string")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(links=graph_strategy, seeds=seeds_strategy)
def test_exact_crawl_matches_simulator(spark, links, seeds):
    sim = simulate_crawl(links, seeds, dedup=True)
    res = crawl_exact(spark, links_df(spark, links), seeds)
    got = [r["url"] for r in res.visited.orderBy("ord").collect()]
    assert got == sim.visit_order
    assert {r["url"] for r in res.seen.collect()} == sim.seen


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(links=graph_strategy, seeds=seeds_strategy, depth=st.integers(0, 3))
def test_nodedup_matches_simulator(spark, links, seeds, depth):
    sim = simulate_crawl(links, seeds, max_depth=depth, dedup=False)
    res = expand_nodedup(spark, links_df(spark, links), seeds, max_depth=depth)
    got = [r["url"] for r in res.visited.orderBy("ord").collect()]
    assert got == sim.visit_order
    assert {r["url"] for r in res.seen.collect()} == sim.seen
