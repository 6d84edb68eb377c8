"""The variable change log — xidel's extraction output model.

Extraction in the reference appends (name, value) pairs to a global,
ordered change log (`$var := value`, readme.txt:133-137; printed per page
xidelbase.pas:2486-2504). Two consumption modes matter:

- the raw log: every assignment in order;
- the CONDENSED view (json-wrapped output, readme.txt:500-502;
  tests/tests.sh:216-221): per variable, a single value — scalar when
  assigned once, array of values in assignment order when multi-assigned:
  (a:=1, b:=2, a:=3, c:=4) → {"a":[1,3],"b":2,"c":4}.

Spark mapping: the log is a DataFrame (doc_id, var_name, seq_index, value);
condensing is one groupBy per (doc, var) with sort_array over
(seq_index, value) structs — order restored without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def condense(log: DataFrame, per_doc: bool = True) -> DataFrame:
    """(doc_id, var_name, values: array<string>, is_multi) — assignment
    order preserved via sort_array of (seq_index, value) structs."""
    keys = ["doc_id", "var_name"] if per_doc else ["var_name"]
    return (
        log.groupBy(*keys)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seq_index", "value"))),
                lambda s: s["value"],
            ).alias("values"),
            F.count(F.lit(1)).alias("n_assignments"),
        )
        .withColumn("is_multi", F.col("n_assignments") > 1)
    )


def condensed_json(log: DataFrame) -> DataFrame:
    """(doc_id, json): the json-wrapped condensed object per document —
    {"a":[1,3],"b":2,"c":4} with variables in first-assignment order."""
    c = condense(log)
    first_seq = log.groupBy("doc_id", "var_name").agg(F.min("seq_index").alias("first_seq"))
    joined = c.join(first_seq, ["doc_id", "var_name"])
    per_var = joined.select(
        "doc_id",
        "first_seq",
        F.when(
            F.col("is_multi"),
            F.concat(
                F.lit('"'), F.col("var_name"), F.lit('": ['),
                F.array_join(F.transform("values", _jstr), ", "),
                F.lit("]"),
            ),
        ).otherwise(
            F.concat(
                F.lit('"'), F.col("var_name"), F.lit('": '),
                _jstr(F.element_at(F.col("values"), 1)),
            )
        ).alias("entry"),
    )
    return (
        per_var.groupBy("doc_id")
        .agg(
            F.concat(
                F.lit("{"),
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("first_seq", "entry"))),
                        lambda s: s["entry"],
                    ),
                    ", ",
                ),
                F.lit("}"),
            ).alias("json")
        )
    )


def get_log(log: DataFrame, var_name: str | None = None) -> DataFrame:
    """x:get-log([$name]) — the assignment history, optionally for one
    variable (xidelbase.pas:4323-4372)."""
    out = log.orderBy("seq_index")
    if var_name is not None:
        out = out.where(F.col("var_name") == var_name)
    return out


def clear_log(log: DataFrame, var_name: str | None = None) -> DataFrame:
    """x:clear-log([$name]) — drop history (all, or one variable's)."""
    if var_name is None:
        return log.limit(0)
    return log.where(F.col("var_name") != var_name)


def _jstr(v):
    """serialize a logged value: numbers bare, strings quoted (the adhoc
    form keeps everything stringly; json-wrapped re-types numerics)."""
    return F.when(
        v.rlike(r"^-?\d+(\.\d+)?$"), v
    ).otherwise(F.concat(F.lit('"'), F.regexp_replace(v, '"', '\\\\"'), F.lit('"')))
