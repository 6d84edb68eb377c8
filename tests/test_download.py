"""Download-sink path resolution vs the reference's golden filenames
(/root/reference/tests/downloadTests.sh:16-60)."""

import os

import pytest
from pyspark.sql import functions as F

from xidel_spark.io.download import download_sink, resolve_download_path

D = "http://example.org"

GOLDENS = [
    # (expected path, url, --download target)
    ("index.html", D, "."),
    ("foobar", f"{D}/foobar", "."),
    ("nest", f"{D}/foo/bar/nest", "."),
    ("index.html", f"{D}/foo/bar/", "."),
    ("nest2", f"{D}/foo/bar/nest2#anchor", "."),
    ("nest3", f"{D}/foo/bar/nest3?data", "."),
    ("nest4", f"{D}/foo/bar/nest4?data#anchor", "."),
    ("index.html", D, "./"),
    ("foobar", f"{D}/foobar", "./"),
    ("foo/bar/nest", f"{D}/foo/bar/nest", "./"),
    ("foo/bar/index.html", f"{D}/foo/bar/", "./"),
    ("foo/bar/nest2", f"{D}/foo/bar/nest2#anchor", "./"),
    ("foo/bar/nest3", f"{D}/foo/bar/nest3?data", "./"),
    ("foo/bar/nest4", f"{D}/foo/bar/nest4?data#anchor", "./"),
    ("index.html", D, "./."),
    ("foobar", f"{D}/foobar", "./."),
    ("nest", f"{D}/foo/bar/nest", "./."),
    ("index.html", f"{D}/foo/bar/", "./."),
    ("abc", D, "abc"),
    ("abc", f"{D}/foobar", "abc"),
    ("abc", f"{D}/foo/bar/nest", "abc"),
    ("abc", f"{D}/foo/bar/", "abc"),
    ("abc/index.html", D, "abc/"),
    ("abc/foobar", f"{D}/foobar", "abc/"),
    ("abc/foo/bar/nest", f"{D}/foo/bar/nest", "abc/"),
    ("abc/foo/bar/index.html", f"{D}/foo/bar/", "abc/"),
    ("abc/index.html", D, "abc/."),
    ("abc/foobar", f"{D}/foobar", "abc/."),
    ("abc/nest", f"{D}/foo/bar/nest", "abc/."),
    ("abc/index.html", f"{D}/foo/bar/", "abc/."),
    ("abc/def", D, "abc/def"),
    ("abc/def", f"{D}/foobar", "abc/def"),
    ("abc/def", f"{D}/foo/bar/nest", "abc/def"),
    ("abc/def", f"{D}/foo/bar/", "abc/def"),
    ("abc/def/index.html", D, "abc/def/"),
]


@pytest.mark.parametrize("expected,url,target", GOLDENS)
def test_download_path_goldens(expected, url, target):
    assert resolve_download_path(url, target) == expected


def test_content_disposition_overrides():
    assert resolve_download_path(f"{D}/x/y", ".", content_disposition_name="report.pdf") == "report.pdf"


def test_dotdot_scrubbed():
    got = resolve_download_path(f"{D}/a/../../etc/passwd", "./")
    assert ".." not in got


def test_stdout_target():
    assert resolve_download_path(D, "-") is None


def test_executor_side_write(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"{D}/foo/bar/nest", "BODY1"), (f"{D}/foobar", "BODY2")], "url string, body string"
    )
    planned = download_sink(docs, str(tmp_path), target="./")
    paths = {r["path"] for r in planned.collect()}
    assert paths == {"foo/bar/nest", "foobar"}
    assert (tmp_path / "foo/bar/nest").read_text() == "BODY1"
    assert (tmp_path / "foobar").read_text() == "BODY2"
