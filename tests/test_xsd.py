"""xs:* constructor lattice (web/functions.xml:1-49): facet edges,
special lexicals, durations, binary, and registry/cast-as wiring."""

import pytest
from pyspark.sql import functions as F

from xidel_spark.functions import xsd


def _one(spark, *cols):
    return spark.range(1).select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).first()


def test_integer_facets(spark):
    r = _one(
        spark,
        xsd.xs_integer(F.lit(" 42 ")),
        xsd.xs_integer(F.lit("3.9")),       # NOT in the integer lexical space → NULL
        xsd.xs_integer(F.lit("3.0")),       # FORG0001 in the reference → NULL
                                            # (doubles reach xs:integer via
                                            # to_string's canonical '3' form)
        xsd.xs_byte(F.lit("127")),
        xsd.xs_byte(F.lit("128")),          # out of facet → NULL
        xsd.xs_unsignedByte(F.lit("-1")),
        xsd.xs_negativeInteger(F.lit("-5")),
        xsd.xs_negativeInteger(F.lit("0")),
        xsd.xs_positiveInteger(F.lit("1")),
    )
    assert list(r) == [42, None, None, 127, None, None, -5, None, 1]


def test_double_decimal_bool(spark):
    r = _one(
        spark,
        xsd.xs_double(F.lit("INF")),
        xsd.xs_double(F.lit("-INF")),
        F.isnan(xsd.xs_double(F.lit("NaN"))),
        xsd.xs_decimal(F.lit("1.5")).cast("string"),
        xsd.xs_boolean(F.lit("true")),
        xsd.xs_boolean(F.lit("0")),
        xsd.xs_boolean(F.lit("maybe")),
    )
    assert r["c0"] == float("inf") and r["c1"] == float("-inf") and r["c2"] is True
    assert r["c3"] == "1.500000000000000000"
    assert (r["c4"], r["c5"], r["c6"]) == (True, False, None)


def test_strings_and_lists(spark):
    r = _one(
        spark,
        xsd.xs_normalizedString(F.lit("a\tb\nc")),
        xsd.xs_token(F.lit("  a   b  ")),
        xsd.xs_NMTOKENS(F.lit(" x  y z ")),
    )
    assert r["c0"] == "a b c"
    assert r["c1"] == "a b"
    assert list(r["c2"]) == ["x", "y", "z"]


def test_dates_times_gregorian(spark):
    import datetime

    r = _one(
        spark,
        xsd.xs_date(F.lit("1996-04-12")),
        xsd.xs_date(F.lit("not-a-date")),
        xsd.xs_dateTime(F.lit("1996-04-12T08:00:05")),
        xsd.xs_time(F.lit("23:59:59")),
        xsd.xs_time(F.lit("24:00:00")),
        xsd.xs_gYear(F.lit("1999")),
        xsd.xs_gMonthDay(F.lit("--02-29")),
        xsd.xs_gDay(F.lit("---32")),
    )
    assert r["c0"] == datetime.date(1996, 4, 12) and r["c1"] is None
    assert r["c2"] == datetime.datetime(1996, 4, 12, 8, 0, 5)
    assert r["c3"] == "23:59:59" and r["c4"] is None
    assert r["c5"] == "1999" and r["c6"] == "--02-29" and r["c7"] is None


def test_durations(spark):
    import datetime

    df = spark.createDataFrame([("2000-01-31 00:00:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    r = df.select(
        (F.col("ts") + xsd.xs_dayTimeDuration(F.lit("P1DT2H30M5S"))).alias("plus"),
        (F.col("ts").cast("date") + xsd.xs_yearMonthDuration(F.lit("P1M"))).cast("date").alias("ym"),
        xsd.xs_duration(F.lit("-P1Y2M3DT4H"))["months"].alias("m"),
        xsd.xs_duration(F.lit("-P1Y2M3DT4H"))["seconds"].alias("s"),
        xsd.xs_duration(F.lit("P")).alias("bad"),
    ).first()
    assert r["plus"] == datetime.datetime(2000, 2, 1, 2, 30, 5)
    assert r["ym"] == datetime.date(2000, 2, 29)  # month-end clamping
    assert r["m"] == -14 and r["s"] == -(3 * 86400 + 4 * 3600)
    assert r["bad"] is None


def test_binary(spark):
    r = _one(
        spark,
        F.octet_length(xsd.xs_hexBinary(F.lit("0A1B"))),
        xsd.xs_hexBinary(F.lit("xyz")),
        F.decode(xsd.xs_base64Binary(F.lit("aGk=")), "utf-8"),
    )
    assert r["c0"] == 2 and r["c1"] is None and r["c2"] == "hi"


def test_registry_and_cast_as(spark):
    """the lattice resolves through the ModuleRegistry, and the expression
    language's `cast as` reaches unlisted targets through it."""
    from xidel_spark.exprlang import compile_expr
    from xidel_spark.functions.registry import BUILTINS

    assert len(BUILTINS.names("xs")) >= 49
    got = spark.range(1).select(
        compile_expr("'42' cast as xs:unsignedByte").column().alias("v"),
        compile_expr("'300' cast as xs:unsignedByte").column().alias("bad"),
        compile_expr("'  a  b ' cast as xs:token").column().alias("tok"),
    ).first()
    assert got["v"] == 42 and got["bad"] is None and got["tok"] == "a b"


def test_error_constructor(spark):
    with pytest.raises(Exception):
        _one(spark, xsd.xs_error(F.lit("x")))
