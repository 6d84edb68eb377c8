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


EXPR_QUERIES = {
    "xpath_expressions": q_xpath_expressions,
}
