"""JSON-mode matrix + map:/array:/jn: function queries for the driver gate.

Column names/types match oracle_json.py exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus
from .functions import jsonfn as jf
from .functions import jsonmode as jm

GATED_MODES = ["standard", "jsoniq", "deprecated", "unified"]


def q_json_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--json-mode behavior matrix over synthesized data2.json-shaped docs:
    [<null-or-number>, {"a": <null-or-number>}] plus constructor probes —
    every mode-dependent axis (null itemhood, constructor coercions, array
    flattening, literals, dot notation) evaluated per doc per mode
    (semantics pinned byte-exact vs tests/output/jsonmode/* in pytest)."""
    base = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    v1_null = d % 2 == 0        # slot $json(1)
    a_null = d % 3 == 0         # object key "a"
    seq_n = (d % 4).cast("int")  # object value with seq_n items
    member_counts = F.array(F.lit(0), F.lit(1), (1 + d % 3).cast("int"))
    token = F.element_at(
        F.array(F.lit("true"), F.lit("false"), F.lit("null"), F.lit("maybe")),
        (d % 4 + 1).cast("int"),
    )
    obj = F.map_from_arrays(F.array(F.lit("k")), F.array((d % 5).cast("string")))

    outs = []
    for name in GATED_MODES:
        mode = jm.MODES[name]
        outs.append(
            base.select(
                d.alias("doc_id"),
                F.lit(name).alias("mode"),
                jm.null_count(v1_null, mode).cast("int").alias("cnt1"),
                jm.is_null(v1_null, mode).alias("isnull1"),
                jm.null_count(a_null, mode).cast("int").alias("cnt_a"),
                jm.ctor_object_value_count(seq_n, mode).cast("int").alias("obj_cnt"),
                jm.ctor_array_size(member_counts, mode).cast("int").alias("arr_size"),
                jm.member_item_counts(member_counts, mode).alias("counts"),
                jm.parse_literal(token, mode).alias("lit_val"),
                jm.dot_access(obj, "k", mode).alias("dot"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def q_map_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map:/array:/libjn: module batch over synthesized per-doc values
    (readme.txt:139-176; web/functions.xml map/array modules)."""
    base = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array((d % 5).cast("string"), (d % 7).cast("string")),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("b"), F.lit("c")),
        F.array((d % 11).cast("string"), F.lit("1")),
    )
    arr = F.transform(
        F.sequence(F.lit(1), (1 + d % 4).cast("int")), lambda i: (i * (d % 3 + 1)).cast("long")
    )
    merged = jf.map_merge(m, m2)
    return base.select(
        d.alias("doc_id"),
        F.array_join(jf.map_keys(m), ",").alias("m_keys"),
        jf.map_size(m).cast("int").alias("m_size"),
        jf.map_contains(m, F.lit("a")).alias("m_has_a"),
        jf.map_get(m, "b").alias("m_b"),
        jf.map_get(jf.map_put(m, "a", F.lit("Z")), "a").alias("m_put_a"),
        jf.map_size(jf.map_remove(m, F.lit("a"))).cast("int").alias("m_rm_size"),
        F.array_join(jf.map_keys(merged), ",").alias("merged_keys"),
        jf.map_get(merged, "b").alias("merged_b"),  # use-first: from m
        jf.array_size(arr).cast("int").alias("a_size"),
        jf.array_head(arr).alias("a_head"),
        jf.array_size(jf.array_tail(arr)).cast("int").alias("a_tail_size"),
        F.array_join(jf.array_reverse(arr), ",").alias("a_rev"),
        F.array_join(jf.array_subarray(arr, 2), ",").alias("a_sub"),
        F.array_join(
            jf.array_for_each(arr, lambda x: (x * 2).cast("string")), ","
        ).alias("a_x2"),
        jf.array_fold_left(arr, F.lit(0).cast("long"), lambda a, x: a + x).alias("a_sum"),
        F.array_join(jf.libjn_values(m), ",").alias("jn_values"),
        F.array_join(jf.map_keys(jf.libjn_intersect(m, m2)), ",").alias("jn_isect"),
        F.array_join(
            jf.map_keys(jf.libjn_project(merged, F.array(F.lit("a"), F.lit("c")))), ","
        ).alias("jn_proj"),
    )


def q_quantified_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """some/every quantifiers, if/then/else, the xidel `otherwise` operator
    (changelog:5-6), fn:format-number/-integer pictures, timezone
    adjustment and pxp:parse-ietf-date — the VERDICT-flagged fn: batch,
    all pure Catalyst over synthesized per-doc values."""
    from .functions import quantified as q

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    seq = F.transform(
        F.sequence(F.lit(1), (1 + d % 5).cast("int")), lambda i: i * (d % 3).cast("int")
    )
    v1 = F.when(d % 3 == 0, F.lit("a"))
    v2 = F.when(d % 5 == 0, F.lit("b"))
    money = (d * 37).cast("double") + (d % 90).cast("double") / 100.0
    months = F.array(*[F.lit(m) for m in
                       "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()])
    mon = F.element_at(months, (d % 12 + 1).cast("int"))
    day, year = (1 + d % 28).cast("int"), (2000 + d % 25).cast("int")
    hh, mi, ss = (d % 24).cast("int"), (d % 60).cast("int"), (d % 57).cast("int")
    ietf = (
        F.when(d % 3 == 0, F.concat(
            F.format_string("Tue, %02d ", day), mon,
            F.format_string(" %04d %02d:%02d:%02d GMT", year, hh, mi, ss)))
        .when(d % 3 == 1, F.concat(
            F.format_string("Tuesday, %02d-", day), mon,
            F.format_string("-%02d %02d:%02d:%02d GMT", year - 2000, hh, mi, ss)))
        .otherwise(F.concat(
            F.lit("Tue "), mon,
            F.format_string(" %d %02d:%02d:%02d %04d", day, hh, mi, ss, year)))
    )
    ts = F.make_timestamp(year, (d % 12 + 1).cast("int"), day, hh, mi, ss.cast("double"))
    return base.select(
        d.alias("doc_id"),
        q.some(seq, lambda x: x > 3).alias("some_gt3"),
        q.every(seq, lambda x: x >= 0).alias("every_nonneg"),
        q.if_then_else(d % 2 == 0, F.lit("even"), F.lit("odd")).alias("cond"),
        q.otherwise(v1, v2, F.lit("z")).alias("oth"),
        q.format_number(money, "#,##0.00").alias("fmt_num"),
        q.format_integer((1 + d % 600).cast("int"), "000").alias("fmt_pad"),
        q.format_integer((1 + d % 30).cast("int"), "i").alias("roman"),
        q.format_integer((1 + d % 100).cast("int"), "a").alias("alpha"),
        F.unix_timestamp(q.parse_ietf_date(ietf)).alias("ietf_epoch"),
        q.adjust_datetime_string(ts, "+02:00").alias("adjusted"),
    )


JSON_QUERIES = {
    "json_modes": q_json_modes,
    "map_array_functions": q_map_array_functions,
    "quantified_conditional": q_quantified_conditional,
}
