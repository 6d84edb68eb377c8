"""Extraction-language / relational queries for the driver contract
(SURVEY.md §2.3 classes: regex extraction, string functions, sequence ops,
JSON access, FLWOR group/order, window clauses, aggregations, joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import sequences as sq
from .functions import strings as st
from .util import qround


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source"
    )


def q_extract_regex(spark, sf_dir):
    """xidel extract(text, regex, group) — first word pair + first number-ish
    token per document (empty string on no match, readme.txt:191-194)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        st.extract(F.col("text"), r"^(\w+) (\w+)", 1).alias("first_word"),
        st.extract(F.col("text"), r"^(\w+) (\w+)", 2).alias("second_word"),
        st.extract(F.col("text"), r"(customer|order|line)", 1).alias("entity"),
    )


def q_string_functions(spark, sf_dir):
    """substring-before/after, contains, normalize-space, translate,
    string-join(tokenize) round-trip."""
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        st.substring_before(t, " ").alias("before_sp"),
        st.substring_after(t, "table").alias("after_table"),
        st.contains(t, "spark").cast("boolean").alias("has_spark"),
        st.normalize_space(F.concat(F.lit("  x  "), F.substring(t, 1, 20), F.lit(" "))).alias("norm"),
        st.translate(F.substring(t, 1, 30), "aeiou", "_____").alias("translated"),
        st.string_join(sq.subsequence(st.tokenize(t), 2, 3), "-").alias("joined_2_4"),
    )


def q_sequence_ops(spark, sf_dir):
    """index-of / distinct-values / subsequence / insert-before / remove /
    reverse / head / tail over token sequences (1-based XPath semantics)."""
    docs = _docs(spark, sf_dir)
    toks = st.tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(sq.index_of(toks, "the")).cast("int").alias("n_the"),
        F.try_element_at(sq.index_of(toks, "the"), F.lit(1)).cast("int").alias("first_the"),
        F.size(sq.distinct_values(toks)).cast("int").alias("n_distinct"),
        sq.head(toks).alias("head"),
        F.try_element_at(sq.tail(toks), F.lit(1)).alias("second"),
        st.string_join(sq.reverse_seq(sq.subsequence(toks, 1, 4)), " ").alias("rev4"),
        st.string_join(sq.remove_at(sq.subsequence(toks, 1, 4), 2), " ").alias("rm2"),
    )


def q_json_access(spark, sf_dir):
    """JSONiq-style property access on the events.props JSON column
    (readme.txt:139-160 → get_json_object)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        (F.get_json_object("props", "$.k").cast("int") % 10 == 0).alias("k_mod10"),
    )


def q_flwor_group_order(spark, sf_dir):
    """FLWOR group-by/order-by: per event_type counts + quantized stats."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(F.avg("value"), 2).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("event_type", "n", "avg_value", "n_users")
    )


def q_window_tumbling(spark, sf_dir):
    """tumbling-window clause (XQuery 3.0 window FLWOR → time bucket agg)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # driver session may differ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), qround(F.sum("value"), 2).alias("sum_value"))
        .select("hour", "event_type", "n", "sum_value")
    )


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregation on lineitem (partial aggregation +
    single shuffle; Catalyst pushes the date filter to the parquet scan)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qround(F.sum("l_quantity"), 2).alias("sum_qty"),
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_broadcast_dim(spark, sf_dir):
    """Star join: fact ⋈ broadcast dims, revenue by nation (the broadcast
    is explicit — dims are always small relative to facts)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            qround(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_flwor_group_by(spark, sf_dir):
    """IN-STRING FLWOR `group by`/`count` (reference readme
    changelog:79-84) compiled to pure Catalyst: per document, a derived
    integer sequence is grouped by $x mod 3, groups ordered by key, each
    emitting key:count:sum — plus a `count $c` positional leg. The whole
    expression evaluates as one Column (no Python), mirrored by a DuckDB
    unnest/GROUP BY oracle."""
    from . import corpus
    from .exprlang import compile_expr

    docs = corpus.base_docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    grouped = compile_expr(
        "string-join(for $x in (1 to 1 + $d mod 7) let $k := $x mod 3 "
        "group by $k order by $k "
        "return concat($k, ':', count($x), ':', sum($x)), ';')"
    ).column(env={"d": F.col("doc_id")})
    counted = compile_expr(
        "string-join(for $x in (1 to 1 + $d mod 5) count $c "
        "return concat($c, 'x', $x), ',')"
    ).column(env={"d": F.col("doc_id")})
    return docs.select("doc_id", grouped.alias("grouped"),
                       counted.alias("counted"))


FN_QUERIES = {
    "extract_regex": q_extract_regex,
    "string_functions": q_string_functions,
    "sequence_ops": q_sequence_ops,
    "json_access": q_json_access,
    "flwor_group_order": q_flwor_group_order,
    "flwor_group_by": q_flwor_group_by,
    "agg_pricing_summary": q_agg_pricing_summary,
    "join_broadcast_dim": q_join_broadcast_dim,
}
