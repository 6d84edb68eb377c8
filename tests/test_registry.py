"""Named-function registry (--module analogue, §2.5 user modules)."""

import pytest
from pyspark.sql import functions as F

from xidel_spark.functions.registry import BUILTINS, ModuleRegistry, call


def _one(spark, col):
    return spark.range(1).select(col.alias("c")).collect()[0]["c"]


def test_builtin_namespaces_resolve(spark):
    assert _one(spark, call("fn:upper-case", F.lit("ab"))) == "AB"
    assert _one(spark, call("upper-case", F.lit("ab"))) == "AB"  # default ns
    assert _one(spark, call("math:sqrt", F.lit(9.0))) == 3.0
    assert _one(spark, call("array:size", F.array(F.lit(1), F.lit(2)))) == 2
    assert _one(spark, call("map:get",
                            F.map_from_arrays(F.array(F.lit("k")), F.array(F.lit("v"))),
                            "k")) == "v"
    assert _one(spark, call("pxp:canonicalize-url",
                            F.lit("HTTP://A.com:80/x"))) == "http://a.com/x"


def test_namespace_listing_covers_modules():
    assert len(BUILTINS.names("fn")) >= 25
    for ns in ("math", "map", "array", "jn", "libjn", "pxp"):
        assert BUILTINS.names(ns), ns


def test_user_module_registration(spark):
    """--module FILE analogue: a user module's functions become callable by
    qualified name, including from spec-as-data callers."""
    reg = ModuleRegistry()
    reg.load_module("my", {
        "shout": lambda c: F.concat(F.upper(c), F.lit("!")),
        "double": lambda c: c * 2,
    })
    assert _one(spark, reg.call("my:shout", F.lit("hi"))) == "HI!"
    assert _one(spark, reg.call("my:double", F.lit(21))) == 42
    with pytest.raises(KeyError) as e:
        reg.call("my:missing", F.lit(1))
    assert "my:shout" in str(e.value)  # the error lists the namespace's names
