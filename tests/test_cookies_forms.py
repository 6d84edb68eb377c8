"""Cookie jar and form() request constructor."""

from pyspark.sql import functions as F

from xidel_spark.crawl.cookies import cookie_headers, parse_set_cookie, update_jar
from xidel_spark.crawl.requests import request_from_form


def test_cookie_roundtrip(spark):
    resp1 = spark.createDataFrame(
        [("http://a.com/x", "sid=1; Path=/"), ("http://b.com/", "t=9")],
        "url string, set_cookie string",
    )
    jar = update_jar(None, parse_set_cookie(resp1))
    # second wave overwrites sid and adds lang
    resp2 = spark.createDataFrame(
        [("http://a.com/y", "sid=2"), ("http://a.com/z", "lang=de")],
        "url string, set_cookie string",
    )
    jar = update_jar(jar, parse_set_cookie(resp2))
    hdrs = {r["host"]: r["cookie_header"] for r in cookie_headers(jar).collect()}
    assert hdrs["a.com"] == "lang=de; sid=2"
    assert hdrs["b.com"] == "t=9"


def test_cookie_update_wins_across_partitions(spark):
    """regression: monotonically_increasing_id carries partition-id high
    bits (>= 2^33 past partition 0), so a +1e6 offset could not outrank a
    stale jar entry — generations must, regardless of partitioning."""
    resp1 = spark.createDataFrame(
        [(f"http://a.com/{i}", f"junk{i}=x") for i in range(64)]
        + [("http://a.com/x", "sid=old")],
        "url string, set_cookie string",
    ).repartition(16)
    jar = update_jar(None, parse_set_cookie(resp1))
    resp2 = spark.createDataFrame(
        [("http://a.com/y", "sid=new")], "url string, set_cookie string"
    )
    jar = update_jar(jar, parse_set_cookie(resp2))
    sid = jar.where("name = 'sid'").collect()
    assert len(sid) == 1 and sid[0]["value"] == "new"


def test_form_request_constructor(spark):
    df = spark.createDataFrame(
        [
            ("http://e.com/submit", "post", [("a", "1"), ("b", "2")], "http://e.com/page"),
            (None, None, [("q", "x")], "http://e.com/page"),
        ],
        "action string, method string, fields array<struct<name:string,value:string>>, base string",
    )
    out = df.select(
        request_from_form(F.col("action"), F.col("method"), F.col("fields"), F.col("base")).alias("r")
    ).select("r.*").collect()
    post, get = out
    assert (post["url"], post["method"], post["body"]) == ("http://e.com/submit", "POST", "a=1&b=2")
    assert (get["url"], get["method"], get["query"], get["body"]) == (
        "http://e.com/page", "GET", "q=x", ""
    )


def test_request_fetch_lateral_join(spark):
    from xidel_spark.corpus import fixture_graph
    from xidel_spark.crawl.requests import request_fetch

    docs = fixture_graph(spark)
    reqs = spark.createDataFrame([("a.xml",), ("ghost.xml",)], "url string")
    out = {r["url"]: r["response"] for r in request_fetch(reqs, docs).collect()}
    assert out["a.xml"]["type"] == "text/html"
    assert "AAA" in out["a.xml"]["raw"]
    assert out["ghost.xml"] is None


def test_x_request_constructor_threads_all_fields(spark):
    from xidel_spark.crawl.requests import x_request

    df = spark.createDataFrame([("http://e.com/x",)], "u string")
    [r] = df.select(
        x_request(
            F.col("u"), F.lit("put"), F.lit("data"),
            F.array(F.lit("X-H: 1")), F.lit("404=retry"),
        ).alias("r")
    ).select("r.*").collect()
    assert (r["url"], r["method"], r["body"], list(r["headers"]), r["error_handling"]) == (
        "http://e.com/x", "PUT", "data", ["X-H: 1"], "404=retry"
    )


def test_per_request_error_policy(spark):
    """follow-object error-handling overrides (tests/tests.sh:128-129):
    the policy is a per-ROW column; exact code beats class, parsed in
    Catalyst."""
    from xidel_spark.corpus import fixture_graph
    from xidel_spark.crawl.requests import request_fetch

    docs = fixture_graph(spark)
    reqs = spark.createDataFrame(
        [
            ("a.xml", ""),                        # 200 → accept (default)
            ("ghost.xml", ""),                    # 404 → skip (default)
            ("ghost.xml", "4xx=retry"),           # class match
            ("ghost.xml", "404=ignore,4xx=retry"),  # exact beats class
            ("ghost.xml", "403=ignore,4xx=retry"),  # exact misses → class
        ],
        "url string, error_handling string",
    )
    out = request_fetch(reqs, docs, policy_col="error_handling").collect()
    got = [(r["url"], r["status"], r["action"], r["error_handling"]) for r in out]
    by_policy = {(u, p): (s, a) for u, s, a, p in got}
    assert by_policy[("a.xml", "")] == (200, "accept")
    assert by_policy[("ghost.xml", "")] == (404, "skip")
    assert by_policy[("ghost.xml", "4xx=retry")] == (404, "retry")
    assert by_policy[("ghost.xml", "404=ignore,4xx=retry")] == (404, "ignore")
    assert by_policy[("ghost.xml", "403=ignore,4xx=retry")] == (404, "retry")


def test_cookie_first_batch_dedups_same_name(spark):
    """regression: duplicate Set-Cookie for one (host,name) within the very
    first batch (jar=None) must still collapse to one row, last write wins."""
    resp = spark.createDataFrame(
        [("http://a.com/x", "sid=1"), ("http://a.com/y", "sid=2")],
        "url string, set_cookie string",
    )
    jar = update_jar(None, parse_set_cookie(resp))
    rows = jar.where("name = 'sid'").collect()
    assert len(rows) == 1 and rows[0]["value"] == "2"
