"""Change-log condensing, output formats, streaming crawl, media plumbing."""

import json

import pytest
from pyspark.sql import functions as F

from xidel_spark.extract.changelog import condense, condensed_json
from xidel_spark.io import output as out
from xidel_spark.ops.media import media_features, synth_media


def test_changelog_multi_assignment_collapse(spark):
    # readme.txt:500-502: (a:=1, b:=2, a:=3, c:=4) → {"a": [1,3], "b": 2, "c": 4}
    log = spark.createDataFrame(
        [("d1", "a", 0, "1"), ("d1", "b", 1, "2"), ("d1", "a", 2, "3"), ("d1", "c", 3, "4")],
        "doc_id string, var_name string, seq_index long, value string",
    )
    j = condensed_json(log).collect()[0]["json"]
    assert json.loads(j) == {"a": [1, 3], "b": 2, "c": 4}
    c = {r["var_name"]: r["values"] for r in condense(log).collect()}
    assert c == {"a": ["1", "3"], "b": ["2"], "c": ["4"]}


def test_changelog_string_values_quoted(spark):
    log = spark.createDataFrame(
        [("d1", "t", 0, 'say "hi"'), ("d1", "t", 1, "x")],
        "doc_id string, var_name string, seq_index long, value string",
    )
    j = condensed_json(log).collect()[0]["json"]
    assert json.loads(j) == {"t": ['say "hi"', "x"]}


def test_output_formats(spark):
    vals = spark.createDataFrame([("v<1>",), ("v2",)], "value string")
    assert {r["line"] for r in out.adhoc(vals).collect()} == {"v<1>", "v2"}
    assert {r["line"] for r in out.xml_wrapped(vals).collect()} == {
        "<e>v&lt;1&gt;</e>", "<e>v2</e>"
    }
    line = out.json_wrapped(vals.orderBy("value")).collect()[0]["line"]
    assert json.loads(line) == ["v<1>", "v2"] or json.loads(line) == ["v2", "v<1>"]
    log = spark.createDataFrame(
        [("d", "name", 0, "it's")], "doc_id string, var_name string, seq_index long, value string"
    )
    assert out.bash_vars(log).collect()[0]["line"] == "name='it'\\''s'"


def test_streaming_continuous_crawl_matches_batch(spark, tmp_path):
    from xidel_spark.crawl.engine import crawl_waves
    from xidel_spark.streaming.continuous import ContinuousCrawl

    rows = [(f"u{i}", k, f"u{(3 * i + k + 1) % 20}") for i in range(20) for k in range(2)]
    links = spark.createDataFrame(rows, "src string, idx int, dst string").cache()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    (seeds_dir / "b1.json").write_text('{"url": "u0", "seed_idx": 0}\n')
    (seeds_dir / "b2.json").write_text('{"url": "u1", "seed_idx": 1}\n{"url": "u0", "seed_idx": 2}\n')
    cc = ContinuousCrawl(spark, links, partition_by_host=False)
    cc.run_from_files(str(seeds_dir))
    stream_seen = {r["url"] for r in cc.seen.collect()}
    batch = crawl_waves(spark, links, ["u0", "u1"])
    assert stream_seen == {r["url"] for r in batch.seen.collect()}


def test_media_plumbing(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    feats = media_features(synth_media(docs))
    rows = feats.limit(5).collect()
    assert all(r["blob_len"] == 16 for r in rows)
    assert all(0 <= r["first_byte"] <= 255 for r in rows)
    assert all(len(r["feat"]) == 3 for r in rows)


def test_media_decode_stub_raises():
    from xidel_spark.ops.media import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
