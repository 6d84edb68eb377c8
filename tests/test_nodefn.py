"""Node-function stragglers (VERDICT r2 #6): deep-text, is-nth,
transform()/x:replace-nodes, request-combine/-decode, pattern text-match
modes + matched-text."""

from pyspark.sql import functions as F

from xidel_spark.crawl.requests import request_combine, request_decode, request_from_form
from xidel_spark.extract.nodefn import deep_text, is_nth, replace_nodes, set_attr
from xidel_spark.extract.nodes import parse_auto_nodes, outer_xml


def _nodes(spark, markup):
    return (
        spark.createDataFrame([(markup,)], "m string")
        .select(parse_auto_nodes(F.col("m")).alias("nodes"))
        .localCheckpoint()
    )


def test_deep_text(spark):
    nd = _nodes(spark, "<a>x<b>y<c>z</c></b>w</a>")
    got = nd.select(
        deep_text(F.col("nodes")).alias("all"),
        deep_text(F.col("nodes"), 0, "|").alias("sep"),
    ).first()
    assert got["all"] == "xyzw"
    assert got["sep"] == "x|y|z|w"


def test_is_nth(spark):
    # :nth-child(2n+1) over positions 1..6 → odd positions
    df = spark.range(1, 7).select(F.col("id").alias("n"))
    got = [r["v"] for r in df.select(is_nth(F.col("n"), 2, 1).alias("v")).collect()]
    assert got == [True, False, True, False, True, False]
    # a=0: exact position only
    got0 = [r["v"] for r in df.select(is_nth(F.col("n"), 0, 3).alias("v")).collect()]
    assert got0 == [False, False, True, False, False, False]
    # negative b never reached below position: 3n+0 → 3 and 6
    got3 = [r["v"] for r in df.select(is_nth(F.col("n"), 3, 0).alias("v")).collect()]
    assert got3 == [False, False, True, False, False, True]


def test_replace_nodes_and_set_attr(spark):
    from xidel_spark.extract.xpath import compile_xpath

    nd = _nodes(spark, "<d><a>keep</a><b>hide</b></d>")
    sel = compile_xpath("//b/text()")  # serialization reads #text nodes
    # serializer is an Arrow UDF: its input must be a MATERIALIZED column,
    # not an inline HOF expression (same restriction as queries_sel.py)
    red = (
        nd.select(
            replace_nodes(F.col("nodes"), sel.ids(F.col("nodes")), text=F.lit("[X]")).alias("n2")
        )
        .localCheckpoint()
        .select(outer_xml(F.col("n2")).alias("x"))
        .first()["x"]
    )
    assert "<b>" in red and "hide" not in red and "[X]" in red
    # x:replace-nodes attribute rewrite
    sel_a = compile_xpath("//a")
    att = (
        nd.select(
            set_attr(F.col("nodes"), sel_a.ids(F.col("nodes")), "class", F.lit("c1")).alias("n2")
        )
        .localCheckpoint()
        .select(outer_xml(F.col("n2")).alias("x"))
        .first()["x"]
    )
    assert '<a class="c1">keep</a>' in att


def test_transform_nodes_via_registry(spark):
    """pxp:transform through the ModuleRegistry — uppercase every text node
    (the reference's per-node transformer-function semantics)."""
    from xidel_spark.functions.registry import call

    nd = _nodes(spark, "<d><a>one</a><b>two</b></d>")

    def upper_texts(n):
        return F.struct(
            n["id"].alias("id"), n["parent"].alias("parent"), n["pos"].alias("pos"),
            n["tag"].alias("tag"), n["attrs"].alias("attrs"),
            F.when(n["tag"] == "#text", F.upper(n["text"])).otherwise(n["text"]).alias("text"),
            n["anc"].alias("anc"),
        )

    got = nd.select(
        outer_xml(call("pxp:transform", F.col("nodes"), upper_texts)).alias("x")
    ).first()["x"]
    assert "ONE" in got and "TWO" in got


def test_request_decode(spark):
    df = spark.createDataFrame(
        [("http://h.com/p/q?a=1&b=2=x", "c=3&d"), ("https://x.org", None)],
        "url string, body string",
    )
    got = df.select(
        request_decode(F.col("url"), F.col("body")).alias("r")
    ).collect()
    r0 = got[0]["r"]
    assert r0["host"] == "h.com" and r0["path"] == "/p/q"
    assert [(p["name"], p["value"]) for p in r0["params"]] == [
        ("a", "1"), ("b", "2=x"), ("c", "3"), ("d", ""),  # value keeps its '='
    ]
    r1 = got[1]["r"]
    assert r1["path"] == "/" and list(r1["params"]) == []


def test_request_combine(spark):
    df = spark.createDataFrame(
        [("http://e.com/s", "post", [("a", "1"), ("b", "2")], "http://e.com")],
        "action string, method string, fields array<struct<name:string,value:string>>, base string",
    )
    req = request_from_form(
        F.col("action"), F.col("method"), F.col("fields"), F.col("base")
    )
    overrides = F.expr(
        "array(named_struct('name','b','value','9'),"
        "      named_struct('name','c','value','3'),"
        "      named_struct('name','a','value',CAST(NULL AS STRING)))"
    )
    got = df.select(request_combine(req, overrides).alias("r")).first()["r"]
    # b replaced, c appended, a REMOVED (null override = '{\"key\":()}')
    assert got["body"] == "b=9&c=3"
    assert got["method"] == "POST" and got["query"] == ""
    # GET requests merge into the query string instead
    req_get = request_from_form(
        F.col("action"), F.lit("get"), F.col("fields"), F.col("base")
    )
    got_get = df.select(request_combine(req_get, overrides).alias("r")).first()["r"]
    assert got_get["query"] == "b=9&c=3" and got_get["body"] == ""


def test_pattern_text_match_modes(spark):
    """readme.txt:360-366: default starts-with; t:meta switches to
    ends-with / exact / regex and case sensitivity; matched-text captures
    the matched portion (changelog:12)."""
    from xidel_spark.extract.patterns import compile_pattern, match_spans

    spans = [
        {"kind": "text", "text": "Hello World"},
        {"kind": "text", "text": "price: 42 EUR"},
    ]
    # default = starts-with
    got = match_spans(spans, compile_pattern([
        {"kind": "text", "text": "Hello", "capture": "v"},
    ]))
    assert got == [("v", "Hello World")]
    # t:meta ends-with
    got = match_spans(spans, compile_pattern([
        {"meta": {"default-text-matching": "ends-with"}},
        {"kind": "text", "text": "EUR", "capture": "v"},
    ]))
    assert got == [("v", "price: 42 EUR")]
    # exact: no match for a prefix
    got = match_spans(spans, compile_pattern([
        {"meta": {"default-text-matching": "exact"}},
        {"kind": "text", "text": "Hello", "capture": "v"},
    ]))
    assert got is None
    # regex + matched-text = the matched portion only
    got = match_spans(spans, compile_pattern([
        {"kind": "text", "text": r"\d+", "text_match": "regex",
         "capture": "n", "field": "matched-text"},
    ]))
    assert got == [("n", "42")]
    # case-insensitive via t:meta
    got = match_spans(spans, compile_pattern([
        {"meta": {"default-case-sensitive": False}},
        {"kind": "text", "text": "hello", "capture": "v", "field": "matched-text"},
    ]))
    assert got == [("v", "Hello")]


def test_inner_text_hides_script_style(spark):
    nd = _nodes(
        spark,
        "<d><p>Hello   World</p><script>var x=1;</script><style>.a{}</style><p>Bye</p></d>",
    )
    from xidel_spark.extract.nodefn import inner_text

    got = nd.select(inner_text(F.col("nodes")).alias("t")).first()["t"]
    assert got == "Hello World Bye"


def test_eval_constant_string(spark):
    from xidel_spark.exprlang import compile_expr

    got = spark.range(1).select(
        compile_expr("eval('1 + 2 * 3') + 1").string().alias("v")
    ).first()["v"]
    assert got == "8"
