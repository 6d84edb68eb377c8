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


def _spans(*kinds_texts):
    return [{"kind": k, "text": t, "media_ref": None, "offset": i}
            for i, (k, t) in enumerate(kinds_texts)]


def test_switch_ordered_alternation():
    """<t:switch>: the first branch that lets the rest succeed is used."""
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    pat = compile_pattern([
        {"switch": [
            [{"kind": "title", "capture": "v"}],
            [{"kind": "text", "capture": "v"}],
        ]},
        {"kind": "link", "capture": "href"},
    ])
    # branch 1 matches
    got = match_spans(_spans(("title", "T"), ("link", "L")), pat)
    assert got == [("v", "T"), ("href", "L")]
    # branch 1 impossible → branch 2
    got = match_spans(_spans(("text", "X"), ("link", "L")), pat)
    assert got == [("v", "X"), ("href", "L")]
    # branch 1 matches locally but starves the rest → backtrack into branch 2
    pat2 = compile_pattern([
        {"switch": [
            [{"kind": "text", "capture": "v"}, {"kind": "text", "capture": "v"}],
            [{"kind": "text", "capture": "w"}],
        ]},
        {"kind": "text", "capture": "tail"},
    ])
    got = match_spans(_spans(("text", "1"), ("text", "2")), pat2)
    assert got == [("w", "1"), ("tail", "2")]


def test_loop_repeats_child_group():
    """<t:loop>: repeats ALL its children ('+' repeats only one element)."""
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    pat = compile_pattern([
        {"loop": [{"kind": "title", "capture": "t"}, {"kind": "link", "capture": "l"}]},
    ])
    spans = _spans(("title", "T1"), ("link", "L1"), ("title", "T2"), ("link", "L2"))
    got = match_spans(spans, pat)
    assert got == [("t", "T1"), ("l", "L1"), ("t", "T2"), ("l", "L2")]
    # min enforced
    pat_min2 = compile_pattern([
        {"loop": [{"kind": "title"}, {"kind": "link"}], "min": 2},
    ])
    assert match_spans(_spans(("title", "T"), ("link", "L")), pat_min2) is None
    # max respected with a tail matcher
    pat_max1 = compile_pattern([
        {"loop": [{"kind": "title", "capture": "t"}], "max": 1},
        {"kind": "title", "capture": "rest"},
    ])
    got = match_spans(_spans(("title", "A"), ("title", "B")), pat_max1)
    assert got == [("t", "A"), ("rest", "B")]


def test_siblings_requires_adjacency():
    """<t:siblings>: children must hit consecutive spans."""
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    adjacent = compile_pattern([
        {"siblings": [{"kind": "title", "capture": "t"}, {"kind": "link", "capture": "l"}]},
    ])
    loose = compile_pattern([
        {"kind": "title", "capture": "t"}, {"kind": "link", "capture": "l"},
    ])
    gap = _spans(("title", "T"), ("text", "X"), ("link", "L"))
    tight = _spans(("text", "pre"), ("title", "T"), ("link", "L"))
    assert match_spans(gap, loose) == [("t", "T"), ("l", "L")]
    assert match_spans(gap, adjacent) is None
    # the group itself may start anywhere — adjacency binds WITHIN it
    assert match_spans(tight, adjacent) == [("t", "T"), ("l", "L")]


def test_condition_predicate():
    """t:condition subset: a field predicate on the candidate span."""
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    pat = compile_pattern([
        {"kind": "link", "capture": "u", "field": "media_ref",
         "condition": ("media_ref", "ends-with", ".pdf")},
    ])
    spans = [
        {"kind": "link", "text": "a", "media_ref": "x.html", "offset": 0},
        {"kind": "link", "text": "b", "media_ref": "y.pdf", "offset": 1},
    ]
    assert match_spans(spans, pat) == [("u", "y.pdf")]


def test_loop_empty_children_terminates():
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    pat = compile_pattern([{"loop": [{"kind": "ghost", "repeat": "*"}]}])
    assert match_spans(_spans(("title", "T")), pat) == []
