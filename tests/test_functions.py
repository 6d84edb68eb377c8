"""Collation, weak typing, and string-function unit tests
(readme.txt:167-176 pins the semantics)."""

from pyspark.sql import functions as F

from xidel_spark.functions.collation import (
    collation_key_one,
    weak_add,
    weak_eq,
    xidel_eq,
    xidel_lt,
)
from xidel_spark.functions.strings import substring_after, substring_before


def test_collation_golden_ordering():
    # readme.txt:167-173: '9xy' = '9XY' < '10XY' < 'xy'
    k = collation_key_one
    assert k("9xy") == k("9XY")
    assert k("9XY") < k("10XY") < k("xy")
    # numeric runs compare numerically, not lexically
    assert k("a2") < k("a10")
    assert k("file9.txt") < k("file10.txt")


def test_collation_columns(spark):
    df = spark.createDataFrame([("9xy", "9XY"), ("10XY", "xy")], "a string, b string")
    rows = df.select(xidel_eq(F.col("a"), F.col("b")).alias("eq"),
                     xidel_lt(F.col("a"), F.col("b")).alias("lt")).collect()
    assert (rows[0]["eq"], rows[0]["lt"]) == (True, False)
    assert (rows[1]["eq"], rows[1]["lt"]) == (False, True)


def test_weak_typing(spark):
    # readme.txt:174-176: 1 + "2" is 3; numeric-string comparison is numeric
    df = spark.createDataFrame([(1, "2")], "a int, b string")
    r = df.select(
        weak_add(F.col("a"), F.col("b")).alias("s"),
        weak_eq(F.lit("02"), F.lit("2")).alias("eq_num"),
        weak_eq(F.lit("abc"), F.lit("ABC")).alias("eq_ci"),
    ).collect()[0]
    assert r["s"] == 3.0
    assert r["eq_num"] is True
    assert r["eq_ci"] is True


def test_substring_before_after_empty_on_miss(spark):
    df = spark.createDataFrame([("a-b",)], "s string")
    r = df.select(
        substring_before(F.col("s"), "-").alias("b"),
        substring_after(F.col("s"), "-").alias("a"),
        substring_before(F.col("s"), "#").alias("miss_b"),
        substring_after(F.col("s"), "#").alias("miss_a"),
    ).collect()[0]
    assert (r["b"], r["a"], r["miss_b"], r["miss_a"]) == ("a", "b", "", "")
