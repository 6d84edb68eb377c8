"""Pattern-template matching semantics (readme.txt:289-392 subset)."""

import pytest
from pyspark.sql import functions as F

from xidel_spark.corpus import fixture_graph
from xidel_spark.extract.patterns import apply_pattern, compile_pattern, match_spans


def spans(*items):
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(items)
    ]


def test_basic_capture_and_repetition():
    s = spans(("title", "AAA", None), ("link", "b", "b.xml"), ("link", "c", "c.xml"))
    pat = compile_pattern(
        [
            {"kind": "title", "capture": "t"},
            {"kind": "link", "capture": "href", "field": "media_ref", "repeat": "*"},
        ]
    )
    assert match_spans(s, pat) == [("t", "AAA"), ("href", "b.xml"), ("href", "c.xml")]


def test_skips_between_matchers():
    s = spans(("text", "noise", None), ("title", "T", None), ("text", "mid", None),
              ("link", "l", "x.xml"))
    pat = compile_pattern([{"kind": "title", "capture": "t"},
                           {"kind": "link", "capture": "h", "field": "media_ref"}])
    assert match_spans(s, pat) == [("t", "T"), ("h", "x.xml")]


def test_plus_requires_one():
    s = spans(("title", "T", None))
    pat = compile_pattern([{"kind": "title"}, {"kind": "link", "repeat": "+"}])
    assert match_spans(s, pat) is None


def test_optional_matches_zero():
    s = spans(("title", "T", None))
    pat = compile_pattern([{"kind": "title", "capture": "t"},
                           {"kind": "link", "capture": "h", "repeat": "?"}])
    assert match_spans(s, pat) == [("t", "T")]


def test_backtracking_gives_back_greedy_take():
    # greedy '*' must give back the last link so the trailing single-link
    # matcher can still match (the backtracking corner)
    s = spans(("link", "a", "a.x"), ("link", "b", "b.x"), ("link", "c", "c.x"))
    pat = compile_pattern(
        [
            {"kind": "link", "capture": "many", "field": "media_ref", "repeat": "*"},
            {"kind": "link", "capture": "last", "field": "media_ref"},
        ]
    )
    assert match_spans(s, pat) == [("many", "a.x"), ("many", "b.x"), ("last", "c.x")]


def test_text_prefix_condition():
    s = spans(("title", "BBB", None))
    ok = compile_pattern([{"kind": "title", "capture": "t", "text_prefix": "B"}])
    no = compile_pattern([{"kind": "title", "capture": "t", "text_prefix": "Z"}])
    assert match_spans(s, ok) == [("t", "BBB")]
    assert match_spans(s, no) is None


def test_min_max_counts():
    s = spans(("link", "1", "1"), ("link", "2", "2"), ("link", "3", "3"))
    pat = compile_pattern([{"kind": "link", "capture": "l", "field": "media_ref",
                            "repeat": (2, 2)}])
    assert match_spans(s, pat) == [("l", "1"), ("l", "2")]


def test_apply_pattern_on_fixture_corpus(spark):
    docs = fixture_graph(spark)
    log = apply_pattern(
        docs,
        [
            {"kind": "title", "capture": "title"},
            {"kind": "link", "capture": "href", "field": "media_ref", "repeat": "+"},
        ],
    )
    rows = log.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["var_name"], r["value"]))
    # only docs WITH links match (+ requires one)
    assert set(by_doc) == {"a.xml", "b.xml", "c.xml", "dpre.xml"}
    assert by_doc["a.xml"] == [("title", "AAA"), ("href", "b.xml"), ("href", "c.xml")]
    # leaf doc without links: pattern with '+' must not match
    assert "b1.xml" not in by_doc
