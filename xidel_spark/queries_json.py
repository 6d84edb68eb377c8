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


JSON_QUERIES = {
    "json_modes": q_json_modes,
    "map_array_functions": q_map_array_functions,
}
