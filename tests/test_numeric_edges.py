"""IEEE/XDM numeric edge matrices vs the reference goldens
(/root/reference/tests/output/{addition,...,modulo}; tests.sh:524-529)."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from xidel_spark.functions.numeric import ser_double, xdm_div, xdm_idiv, xdm_mod

GOLDEN_DIR = Path("/root/reference/tests/output")
VALUES = [float("-inf"), -1.0, -0.0, float("nan"), 0.0, 1.0, float("inf")]


@pytest.fixture(scope="module")
def matrix(spark):
    rows = [(i, a, j, b) for i, a in enumerate(VALUES) for j, b in enumerate(VALUES)]
    return spark.createDataFrame(rows, "i int, a double, j int, b double").cache()


def rows_of(df, col):
    got = df.select("i", "j", col).collect()
    grid = {}
    for r in got:
        grid.setdefault(r["i"], {})[r["j"]] = r[2]
    return ["\n".join([]) or " ".join(grid[i][j] for j in range(7)) for i in range(7)]


def golden(name):
    return GOLDEN_DIR.joinpath(name).read_text().strip().splitlines()


@pytest.mark.parametrize(
    "name,expr",
    [
        ("addition", lambda a, b: ser_double(a + b)),
        ("subtraction", lambda a, b: ser_double(a - b)),
        ("multiplication", lambda a, b: ser_double(a * b)),
        ("division", lambda a, b: ser_double(xdm_div(a, b))),
        ("divisionInt", xdm_idiv),
        ("modulo", xdm_mod),
    ],
)
def test_numeric_matrix_matches_golden(matrix, name, expr):
    out = rows_of(matrix.withColumn("r", expr(F.col("a"), F.col("b"))), "r")
    assert out == golden(name), f"{name}: {out}"
