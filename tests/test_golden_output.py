"""Output-format serializers vs the reference's golden files
(tests/tests.sh:132-175 matrix; pattern '<a>{.}</a>*' over a.xml/b.xml)."""

from pathlib import Path

import pytest

from xidel_spark.corpus import fixture_graph
from xidel_spark.extract.patterns import apply_pattern
from xidel_spark.io.golden_output import adhoc_lines, bash_lines, json_wrapped

G = Path("/root/reference/tests/output")

# the pattern "<a>{.}</a>*" → default var 'result' over anchor text;
# "<title>{title:=.}</title><a>{.}</a>*" adds the title capture
P_A = [{"kind": "link", "capture": "result", "repeat": "*"}]
P_TA = [
    {"kind": "title", "capture": "title"},
    {"kind": "link", "capture": "result", "repeat": "*"},
]


@pytest.fixture(scope="module")
def docs(spark):
    return fixture_graph(spark).cache()


def log_for(spark, docs, pattern, urls):
    rows = apply_pattern(docs.where(docs.doc_id.isin(urls)), pattern).collect()
    per_doc = {u: [] for u in urls}
    for r in sorted(rows, key=lambda r: r["seq_index"]):
        per_doc[r["doc_id"]].append((r["var_name"], r["value"]))
    return [per_doc[u] for u in urls]


def test_adhoc1_golden(spark, docs):
    (log,) = log_for(spark, docs, P_A, ["a.xml"])
    assert adhoc_lines(log) == G.joinpath("adhoc1").read_text().splitlines()


def test_adhoc3_golden(spark, docs):
    logs = log_for(spark, docs, P_TA, ["a.xml", "b.xml"])
    flat = [kv for log in logs for kv in log]
    assert adhoc_lines(flat) == G.joinpath("adhoc3").read_text().splitlines()


def test_json1_golden(spark, docs):
    logs = log_for(spark, docs, P_A, ["a.xml"])
    assert json_wrapped(logs) == G.joinpath("json1").read_text().strip()


def test_json3_golden(spark, docs):
    logs = log_for(spark, docs, P_TA, ["a.xml", "b.xml"])
    assert json_wrapped(logs) == G.joinpath("json3").read_text().strip()


def test_bash1_golden(spark, docs):
    logs = log_for(spark, docs, P_A, ["a.xml"])
    flat = [kv for log in logs for kv in log]
    assert bash_lines(flat) == G.joinpath("bash1").read_text().splitlines()


def test_bash3_golden(spark, docs):
    logs = log_for(spark, docs, P_TA, ["a.xml", "b.xml"])
    flat = [kv for log in logs for kv in log]
    assert bash_lines(flat) == G.joinpath("bash3").read_text().splitlines()
