"""Multipage template interpreter (readme.txt:394-430 subset)."""

import pytest

from xidel_spark.corpus import fixture_graph
from xidel_spark.extract.multipage import MultipageRunner

TITLE = {"kind": "title", "capture": "title"}
LINKS = {"kind": "link", "capture": "href", "field": "media_ref", "repeat": "*"}


@pytest.fixture(scope="module")
def runner(spark):
    return lambda: MultipageRunner(spark, fixture_graph(spark).cache())


def test_page_then_loop_over_links(runner):
    r = runner()
    spec = {
        "actions": {
            "main": [
                {"variable": {"name": "start", "value": "a.xml"}},
                {"page": "{start}", "extract": [TITLE, LINKS]},
                {"loop": {"over": "href", "var": "u",
                          "do": [{"page": "{u}", "extract": [TITLE]}]}},
            ]
        }
    }
    state = r.run(spec)
    assert state.get_all("title") == ["AAA", "BBB", "CCC"]
    assert r.pages_fetched == ["a.xml", "b.xml", "c.xml"]


def test_if_and_call(runner):
    r = runner()
    spec = {
        "actions": {
            "main": [
                {"page": "a.xml", "extract": [TITLE]},
                {"if": {"var": "title", "equals": "AAA",
                        "then": [{"call": "deep"}],
                        "else": [{"variable": {"name": "note", "value": "nope"}}]}},
            ],
            "deep": [{"page": "c.xml", "extract": [TITLE]}],
        }
    }
    state = r.run(spec)
    assert state.get_all("title") == ["AAA", "CCC"]
    assert state.get("note") is None


def test_missing_page_is_skipped(runner):
    r = runner()
    spec = {"actions": {"main": [{"page": "ghost.xml", "extract": [TITLE]},
                                 {"page": "b1.xml", "extract": [TITLE]}]}}
    state = r.run(spec)
    assert state.get_all("title") == ["B1"]


def test_interpolation_uses_latest_assignment(runner):
    r = runner()
    spec = {
        "actions": {
            "main": [
                {"variable": {"name": "x", "value": "a.xml"}},
                {"variable": {"name": "x", "value": "b.xml"}},
                {"page": "{x}", "extract": [TITLE]},
            ]
        }
    }
    assert r.run(spec).get("title") == "BBB"
