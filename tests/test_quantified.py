"""Quantified/conditional expressions + fn: batch (analyze-string,
format-number/-integer, adjust-*-to-timezone, parse-ietf-date)."""

from pyspark.sql import functions as F

from xidel_spark.functions import quantified as q


def _one(spark, cols):
    row = spark.range(1).select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).collect()[0]
    return list(row)


def test_some_every_semantics(spark):
    seq = F.array(F.lit(1), F.lit(5), F.lit(2))
    empty = F.array().cast("array<int>")
    got = _one(spark, [
        q.some(seq, lambda x: x > 4),
        q.some(seq, lambda x: x > 9),
        q.some(empty, lambda x: x > 0),   # false over ()
        q.every(seq, lambda x: x > 0),
        q.every(seq, lambda x: x > 1),
        q.every(empty, lambda x: x > 0),  # true over ()
    ])
    assert got == [True, False, False, True, False, True]


def test_otherwise_first_nonempty(spark):
    got = _one(spark, [
        q.otherwise(F.lit(None).cast("string"), F.lit(None).cast("string"), F.lit("fb")),
        q.otherwise(F.lit("x"), F.lit("y")),
        q.if_then_else(F.lit(True), F.lit(1), F.lit(2)),
    ])
    assert got == ["fb", "x", 1]


def test_analyze_string_alternation(spark):
    """fn:analyze-string partitions input into match/non-match runs in
    document order (XPath 3.0 §5.4.2.4)."""
    segs = q.analyze_string(F.lit("The cat sat on the mat."), r"[a-z]at")
    [row] = spark.range(1).select(segs.alias("s")).collect()
    got = [(x["kind"], x["text"]) for x in row["s"]]
    assert got == [
        ("non-match", "The "), ("match", "cat"),
        ("non-match", " "), ("match", "sat"),
        ("non-match", " on the "), ("match", "mat"),
        ("non-match", "."),
    ]
    [m] = _one(spark, [q.analyze_string_matches(F.lit("a1b22c333"), r"\d+")])
    assert list(m) == ["1", "22", "333"]


def test_format_number_pictures(spark):
    got = _one(spark, [
        q.format_number(F.lit(1234567.891), "#,##0.00"),
        q.format_number(F.lit(1234.5), "0.###"),
        q.format_number(F.lit(0.25), "0%"),
        q.format_number(F.lit(1.0), "0.###"),
        q.format_number(F.lit(1.25), "0.0##"),
        q.format_number(F.lit(1.0), "0.0##"),
    ])
    assert got[0] == "1,234,567.89"
    # '#' fraction digits are optional per the XSLT picture rules — trailing
    # zeros beyond the mandatory '0' count are stripped
    assert got[1] == "1234.5"
    assert got[2] == "25%"
    assert got[3] == "1"
    assert got[4] == "1.25"
    assert got[5] == "1.0"


def test_format_integer_pictures(spark):
    got = _one(spark, [
        q.format_integer(F.lit(7), "000"),
        q.format_integer(F.lit(4), "i"),
        q.format_integer(F.lit(1994), "I"),
        q.format_integer(F.lit(1), "a"),
        q.format_integer(F.lit(26), "a"),
        q.format_integer(F.lit(27), "a"),
        q.format_integer(F.lit(28), "A"),
    ])
    assert got == ["007", "iv", "MCMXCIV", "a", "z", "aa", "AB"]


def test_parse_ietf_date_three_formats(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = _one(spark, [
        F.unix_timestamp(q.parse_ietf_date(F.lit(s)))
        for s in (
            "Tue, 03 Jun 2008 11:05:30 GMT",      # RFC 1123
            "Tuesday, 03-Jun-08 11:05:30 GMT",    # RFC 850
            "Tue Jun  3 11:05:30 2008",           # asctime
        )
    ])
    assert got[0] == got[1] == got[2] == 1212491130


def test_parse_ietf_date_850_century_pivot(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    a, b = _one(spark, [
        F.year(q.parse_ietf_date(F.lit("Monday, 01-Jan-96 00:00:00 GMT"))),
        F.year(q.parse_ietf_date(F.lit("Monday, 01-Jan-06 00:00:00 GMT"))),
    ])
    assert (a, b) == (1996, 2006)


def test_adjust_datetime_to_timezone(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts = F.to_timestamp(F.lit("2002-03-07 10:00:00"))
    [s] = _one(spark, [q.adjust_datetime_string(ts, "+02:00")])
    assert s == "2002-03-07T12:00:00+02:00"

def test_format_datetime_picture_strings(spark):
    """XPath 3.0 §9.8.4 picture strings → correct rendering."""
    from xidel_spark.functions.datetimefn import format_datetime, picture_to_pattern

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts = F.to_timestamp(F.lit("2008-06-03 11:05:30"))
    got = _one(spark, [
        format_datetime(ts, "[Y0001]-[M01]-[D01]"),
        format_datetime(ts, "[D] [MNn] [Y], [H01]:[m01]:[s01]"),
        format_datetime(ts, "[FNn] [D01].[M01]."),
        format_datetime(ts, "[h]:[m01] [P]"),
    ])
    assert got[0] == "2008-06-03"
    assert got[1] == "3 June 2008, 11:05:30"
    assert got[2] == "Tuesday 03.06."
    assert got[3] == "11:05 AM"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        picture_to_pattern("[Q9]")


def test_matches_replace_encode(spark):
    from xidel_spark.functions.datetimefn import encode_for_uri, matches, replace_rx

    got = _one(spark, [
        matches(F.lit("abc123"), r"\d+"),
        matches(F.lit("abc"), r"^\d+$"),
        replace_rx(F.lit("a1b22c"), r"(\d+)", "<$1>"),
        encode_for_uri(F.lit("a b/c~d*e")),
    ])
    assert got == [True, False, "a<1>b<22>c", "a%20b%2Fc~d%2Ae"]


def test_substring_xpath_rounding_rule(spark):
    from xidel_spark.functions.strings import (
        compare_strings, deep_equal, substring_xpath,
    )

    got = _one(spark, [
        substring_xpath(F.lit("motor car"), 6),
        substring_xpath(F.lit("metadata"), 4, 3),
        substring_xpath(F.lit("12345"), 1.5, 2.6),   # spec example → '234'
        substring_xpath(F.lit("12345"), 0, 3),       # clamp: round(0)=0 → '12'
        substring_xpath(F.lit("12345"), -1, 4),      # → '12'
        compare_strings(F.lit("a"), F.lit("b")),
        compare_strings(F.lit("b"), F.lit("b")),
        deep_equal(F.array(F.lit(1), F.lit(2)), F.array(F.lit(1), F.lit(2))),
        deep_equal(F.array(F.lit(1)), F.array(F.lit(2))),
    ])
    assert got == [" car", "ada", "234", "12", "12", -1, 0, True, False]
