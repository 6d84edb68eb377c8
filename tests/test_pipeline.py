"""Context-chaining pipelines vs the reference goldens tfe/tef/tefe."""

import pytest

from xidel_spark.corpus import fixture_graph
from xidel_spark.crawl.pipeline import Stage, run_pipeline


@pytest.fixture(scope="module")
def docs(spark):
    return fixture_graph(spark).cache()


def titles(df):
    return [r["value"] for r in df.collect()]


def test_tfe_extract_on_followed(spark, docs):
    # a.xml -f //a -e //title → BBB CCC
    out = run_pipeline(spark, docs, ["a.xml"],
                       [Stage(follow="//a"), Stage(extract=["//title"])])
    assert titles(out) == ["BBB", "CCC"]


def test_tef_recursive(spark, docs):
    # a.xml -e //title -f //a (trailing -f) → full DFS crawl extraction
    out = run_pipeline(spark, docs, ["a.xml"],
                       [Stage(extract=["//title"], follow="//a", recurse=True)])
    assert titles(out) == ["AAA", "BBB", "B1", "B2", "CCC", "C1", "C2"]


def test_tefe_both_contexts_extract(spark, docs):
    # a.xml -e //title [-f //a -e //title] → AAA BBB CCC (one hop)
    out = run_pipeline(spark, docs, ["a.xml"],
                       [Stage(extract=["//title"], follow="//a"), Stage(extract=["//title"])])
    assert titles(out) == ["AAA", "BBB", "CCC"]


def test_two_hop_chain(spark, docs):
    out = run_pipeline(spark, docs, ["a.xml"],
                       [Stage(follow="//a"), Stage(follow="//a"), Stage(extract=["//title"])])
    # hop1: b, c ; hop2 from b: c(dup→dropped? c was fetched in hop1) b1 b2; from c: c1 c2
    assert titles(out) == ["B1", "B2", "C1", "C2"]
