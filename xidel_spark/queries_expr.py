"""Expression-language driver-contract queries: the -e string surface
(readme.txt:120-196) compiled by exprlang and gated against DuckDB.

Every output column is produced by compiling a REAL expression string —
arithmetic, weak-typed comparison, collation, if/then/else, FLWOR,
quantified, x-strings, sequence predicates — with table columns bound as
$variables, exactly how a reference user feeds `-e` queries over crawled
data. Column names/types match oracle_expr.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprlang import compile_expr
from .exprlang.compiler import TV


def q_xpath_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one expression battery per orders row; $key/$price/$pri bound to
    o_orderkey/o_totalprice/o_orderpriority (tests/tests.sh:423-452 strings
    and the readme.txt:167-176 weak-typing rules, row-dependent so a wrong
    comparison engine hash-mismatches)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderpriority").alias("pri"),
    )
    env = {
        "key": TV(F.col("key"), "long"),
        "price": TV(F.col("price"), "double"),
        "pri": TV(F.col("pri"), "string"),
    }

    def e(src: str) -> F.Column:
        return compile_expr(src).column(env=env)

    def s(src: str) -> F.Column:
        return compile_expr(src).string(env=env)

    return o.select(
        F.col("key"),
        e("$key * 2 + 1").alias("arith"),
        e("$key + '10'").alias("weak_sum"),
        e("$price div 2").alias("half_price"),
        s("if ($price > 100000) then 'big' else 'small'").alias("cond"),
        e("'Foo' || string($key) = 'foo' || string($key)").alias("ci_eq"),
        e("'x' || string($key + 1) < 'x' || string($key + 2)").alias("numcoll"),
        e("(if ($key mod 2 = 0) then 'true' else 'false') = true()").alias("boolweak"),
        e("some $x in 1 to 5 satisfies $key mod 7 = $x").alias("quant"),
        s("string-join(for $i in 1 to $key mod 3 + 1 return string($i * $i), '-')").alias("flwor"),
        s('x"k={$key} p={$pri}"').alias("xstr"),
        F.element_at(e("(10, 20, 30)[position() = $key mod 3 + 1]"), 1).alias("pick"),
        e("sum(1 to $key mod 4 + 1)").alias("agg"),
        s("$pri || '#' || string($key)").alias("concat3"),
    )


def q_request_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """request-combine/-decode over a frontier batch (readme.txt:215-217;
    changelog x:request-decode): per orders row build the form() request,
    apply overrides (replace p, append extra, REMOVE id via the ()-value
    rule), and decode a parameterized url — all row-wise Catalyst."""
    from .crawl.requests import request_combine, request_decode, request_from_form

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_orderpriority").alias("pri"),
    )
    req = request_from_form(
        F.lit("http://api.test/submit"),
        F.when(F.col("key") % 2 == 0, F.lit("post")).otherwise(F.lit("get")),
        F.array(
            F.struct(F.lit("id").alias("name"), F.col("key").cast("string").alias("value")),
            F.struct(F.lit("p").alias("name"), F.col("pri").alias("value")),
        ),
        F.lit("http://api.test/"),
    )
    overrides = F.array(
        F.struct(F.lit("p").alias("name"), F.lit("X").alias("value")),
        F.struct(F.lit("extra").alias("name"), F.lit("1").alias("value")),
        F.struct(F.lit("id").alias("name"), F.lit(None).cast("string").alias("value")),
    )
    combined = request_combine(req, overrides)
    url = F.format_string("http://h%d.test/p/%d?x=%d&y=2", F.col("key") % 13, F.col("key"), F.col("key"))
    decoded = request_decode(url)
    return o.select(
        "key",
        combined["method"].alias("method"),
        combined["body"].alias("body"),
        combined["query"].alias("query"),
        decoded["host"].alias("dec_host"),
        decoded["path"].alias("dec_path"),
        F.element_at(decoded["params"], 1)["value"].alias("dec_x"),
        F.size(decoded["params"]).alias("dec_n"),
    )


EXPR_QUERIES = {
    "xpath_expressions": q_xpath_expressions,
    "request_combine_frontier": q_request_combine,
}
