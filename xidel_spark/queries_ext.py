"""Extended driver-contract queries: URI resolution, error policy,
priority frontier order, variable change-log condensing, output formats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import corpus
from .crawl.engine import crawl_exact
from .crawl.errors import action_for, parse_policy
from .extract.changelog import condense, condensed_json
from .extract.links import extract_links
from .functions.datetimefn import format_datetime as _fmt_dt
from .urlnorm import resolve_url


def q_resolve_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn:resolve-uri / strResolveURI parity (tests/tests.sh:625-626,
    readme.txt:178-182): five relative-reference shapes vs closed form."""
    docs = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    base = F.format_string("http://h%02d.example.com/dir%d/page.html", (d % 13).cast("long"), (d % 4).cast("long"))
    ref = (
        F.when(d % 5 == 0, F.format_string("other%d.html", d))
        .when(d % 5 == 1, F.lit("../up.html"))
        .when(d % 5 == 2, F.format_string("/rooted/%d", d))
        .when(d % 5 == 3, F.lit("//mirror.example.org/pp"))
        .otherwise(F.lit("?q=1"))
    )
    return docs.select(
        d.alias("doc_id"),
        base.alias("base"),
        ref.alias("ref"),
        resolve_url(ref, base).alias("resolved"),
    )


def q_error_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--error-handling '3xx=ignore,404=skip,4xx=retry,5xx=retry' over
    synthetic statuses; exact code beats class (xidelbase.pas:2241-2249)."""
    docs = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    status = (
        F.when(d % 7 == 2, 301)
        .when(d % 7 == 3, 404)
        .when(d % 7 == 4, 503)
        .when(d % 7 == 6, 429)
        .otherwise(200)
    ).cast("int")
    policy = parse_policy("3xx=ignore,404=skip,4xx=retry,5xx=retry")
    return docs.select(
        corpus.url_of(d).alias("url"),
        status.alias("status"),
        action_for(status, policy).alias("action"),
    )


def q_frontier_priority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """host-bucketed priority queue: fetch order = (priority, DFS rank) —
    the sort-within-partitions Delta of the north rule, checked globally."""
    from .queries import _tune_iterative

    _tune_iterative(spark)
    docs = corpus.synth_docs(spark, sf_dir)
    links = extract_links(docs, "//a")
    res = crawl_exact(spark, links, corpus.synth_seeds(spark, sf_dir))
    from .util import total_order

    host_id = F.regexp_extract("url", r"http://h(\d+)\.", 1).cast("int")
    prio = (host_id % 3).alias("priority")
    # global fetch sequence via range-partitioned two-pass numbering — the
    # priority queue drains in parallel, never through one task
    return total_order(
        res.visited.select("url", "rank", prio), ["priority", "rank"], out_col="fetch_seq"
    )


def _synth_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic variable change log derived from events: doc = user
    bucket, var = event_type, ordered by event_id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("user_id") % 20).cast("long").alias("doc_id"),
        F.col("event_type").alias("var_name"),
        F.col("event_id").cast("long").alias("seq_index"),
        F.when(F.col("event_id") % 3 == 0, (F.col("event_id") % 100).cast("string"))
        .otherwise(F.concat(F.lit("v"), (F.col("event_id") % 10).cast("string")))
        .alias("value"),
    )


def q_changelog_condense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """condensed variable log: per (doc, var) the ordered assignment values
    — the json-wrapped collapse of readme.txt:500-502."""
    log = _synth_log(spark, sf_dir)
    c = condense(log)
    return c.select(
        "doc_id", "var_name", F.array_join("values", ",").alias("values_joined"),
        F.col("n_assignments"), "is_multi",
    )


def q_changelog_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """the full json-wrapped object per doc: {"a":[1,3],"b":2,...}."""
    return condensed_json(_synth_log(spark, sf_dir))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal binary plumbing: blob synthesis + Arrow mapInPandas
    feature extraction (decode stubbed; byte-level features real)."""
    from .ops.media import media_features, synth_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    feats = media_features(synth_media(docs))
    return feats.select("doc_id", "mime", "blob_len", "first_byte", "byte_sum")


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal decode/feature-extract/resize leg: the deterministic fake
    decoder (decoder='fake', the sandbox stand-in the brief allows) turns
    each blob into a real pixel array; width from the content, exact-tiled
    height, pixel mean/std computed with oracle-identical arithmetic."""
    from .ops.media import decode_media, synth_media
    from .util import qround

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    dec = decode_media(synth_media(docs), decoder="fake")
    return dec.select(
        "doc_id", "mime", "width", "height",
        qround(F.col("px_mean"), 4).alias("px_mean"),
        qround(F.col("px_std"), 4).alias("px_std"),
    )


def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date/time function class (SURVEY §2.3): component extraction,
    formatting, epoch arithmetic over the events timestamps."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # driver session may differ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.year(ts).cast("int").alias("y"),
        F.month(ts).cast("int").alias("m"),
        F.dayofmonth(ts).cast("int").alias("d"),
        F.hour(ts).cast("int").alias("h"),
        F.date_format(ts, "yyyy-MM-dd").alias("iso_date"),
        F.unix_timestamp(ts).cast("long").alias("epoch"),
        F.date_format(F.date_add(ts.cast("date"), 7), "yyyy-MM-dd").alias("plus7"),
        # fn:format-dateTime picture string (XPath 3.0 §9.8.4)
        _fmt_dt(ts, "[D] [MNn] [Y], [H01]:[m01]").alias("picture"),
    )


def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """math module (abs/ceil/floor/round/sqrt/pow/pi) over lineitem."""
    from .util import qround

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    x = F.col("l_extendedprice")
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.abs(x - 1000).alias("abs_x"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("ceil_disc"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("floor_tax"),
        qround(F.sqrt(x), 4).alias("sqrt_x"),
        qround(F.pow(F.col("l_quantity"), F.lit(2.0)), 4).alias("qty_sq"),
        # math: trig / pi / logarithms (web/functions.xml math module)
        qround(F.sin(F.col("l_discount") * 3.0), 4).alias("sin_d"),
        qround(F.cos(F.col("l_tax") * 2.0), 4).alias("cos_t"),
        qround(F.atan2(F.col("l_quantity"), F.lit(7.0)), 4).alias("atan2_q"),
        qround(F.lit(3.141592653589793) * F.col("l_discount"), 4).alias("pi_d"),
        qround(F.log(x + 1.0), 4).alias("ln_x"),
        qround(F.log10(x + 1.0), 4).alias("log10_x"),
        qround(F.exp(F.col("l_discount")), 4).alias("exp_d"),
    )


def q_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """higher-order fn class: for-each(transform), filter, fold-left
    (aggregate), for-each-pair (zip_with) over token sequences."""
    from .functions.strings import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    toks = tokenize(F.col("text"))
    upper3 = F.transform(toks, lambda t: F.upper(F.substring(t, 1, 3)))
    longs = F.filter(toks, lambda t: F.length(t) > 4)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    pairs = F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat(a, F.lit("~"), b))
    return docs.select(
        "doc_id",
        F.array_join(F.slice(upper3, 1, 3), ",").alias("upper3_head"),
        F.size(longs).cast("int").alias("n_long"),
        total_len.cast("int").alias("total_len"),
        F.try_element_at(pairs, F.lit(1)).alias("first_pair"),
    )


def q_option_inheritance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """follow-object option overrides coalesced with session defaults
    (mergeWithObject, xidelbase.pas:1810-1842): object wins, else default."""
    from .crawl.options import SessionOptions, effective_options

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    frontier = o.select(
        k.cast("long").alias("o_orderkey"),
        F.format_string("http://h%02d.example.com/api/%d", (F.col("o_custkey") % 13).cast("long"), k.cast("long")).alias("url"),
        F.when(k % 5 == 0, "POST").otherwise(F.lit(None).cast("string")).alias("method"),
        F.when(k % 7 == 0, "json").otherwise(F.lit(None).cast("string")).alias("input_format"),
    )
    eff = effective_options(frontier, SessionOptions(method="GET", input_format="auto"))
    return eff.select("o_orderkey", "url", "method", "input_format", "error_handling", "wait_ms")


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding-cosine near-duplicate pairs at sim >= 0.99 over the
    planted-twin corpus — SRP-bucketed candidate generation + exact-cosine
    verification. The 100-TB shape: a (table, bucket) equi-self-join
    replaces the all-pairs theta join (the round-1 version was a broadcast
    nested loop over N²/2 pairs); at this similarity the LSH miss
    probability is ~3e-14 per pair, so the exact brute-force DuckDB oracle
    still matches bit-for-bit."""
    from .ops.similarity import cosine, srp_signature
    from .util import qround

    emb = corpus.planted_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    # materialize the signature table: the candidate self-join would
    # otherwise recompute the 8-table SRP projection once per side
    sigs = srp_signature(emb, bits=8, tables=8).localCheckpoint(eager=False)
    a = sigs.select(F.col("vec_id").alias("id_a"), "table", "bucket")
    b = sigs.select(F.col("vec_id").alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sim = qround(cosine(F.col("va"), F.col("vb")), 3)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.99)
    )


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sliding window clause (1h windows, 30min slide): each event falls in
    two windows; arithmetic form shared verbatim with the oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = F.unix_timestamp("ts").cast("long")
    k = F.explode(F.array(F.lit(0), F.lit(1)))
    rows = ev.select(e.alias("e"), F.col("event_type"), k.alias("k"))
    w_start = (F.floor((F.col("e") - F.col("k") * 1800) / 3600) * 3600 + F.col("k") * 1800).cast("long")
    return (
        rows.select(w_start.alias("w_start"), "event_type")
        .groupBy("w_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONiq object/array functions (jn:keys/size/members, map/array
    access — readme.txt:139-160) over synthesized JSON documents."""
    docs = corpus.base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    jdoc = F.format_string('{"a": %d, "arr": [%d, %d], "s": "x%d"}',
                           (d % 5).cast("long"), (d % 3).cast("long"),
                           (d % 7).cast("long"), (d % 11).cast("long"))
    parsed = F.from_json(jdoc, "a int, arr array<int>, s string")
    return docs.select(
        d.alias("doc_id"),
        parsed["a"].alias("a"),
        F.size(parsed["arr"]).cast("int").alias("arr_size"),
        F.aggregate(parsed["arr"], F.lit(0), lambda acc, x: acc + x).cast("int").alias("arr_sum"),
        F.try_element_at(parsed["arr"], F.lit(1)).cast("int").alias("first_member"),
        parsed["s"].alias("s"),
        F.array_join(F.array_sort(F.map_keys(
            F.from_json(jdoc, "map<string,string>"))), ",").alias("keys_joined"),
    )


def q_changelog_surfaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """both change-log surfaces (condensed per-var rows + the json-wrapped
    per-doc object) under one driver row (50-row record budget)."""
    c = q_changelog_condense(spark, sf_dir).select(
        F.lit("condense").alias("mode"), "doc_id", "var_name",
        F.col("values_joined").alias("value"), "n_assignments", "is_multi",
    )
    j = q_changelog_json(spark, sf_dir).select(
        F.lit("json").alias("mode"), "doc_id",
        F.lit(None).cast("string").alias("var_name"),
        F.col("json").alias("value"),
        F.lit(None).cast("long").alias("n_assignments"),
        F.lit(None).cast("boolean").alias("is_multi"),
    )
    return c.unionByName(j)


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal plumbing end-to-end in one gate: blob synthesis + Arrow
    mapInPandas byte features JOINED with the deterministic fake-decoder
    pixel statistics (one row per doc, 9 hashed columns)."""
    feats = q_media_features(spark, sf_dir)
    dec = q_media_decode(spark, sf_dir).drop("mime")
    return feats.join(dec, "doc_id").select(
        "doc_id", "mime", "blob_len", "first_byte", "byte_sum",
        "width", "height", "px_mean", "px_std",
    )


def q_window_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tumbling (1h) + sliding (1h/30min) window clauses under one driver
    row; the tumbling hour is epoch-keyed so both grains union."""
    from .queries_fn import q_window_tumbling

    t = q_window_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("mode"),
        F.unix_timestamp("hour").cast("long").alias("w_start"),
        "event_type", "n", "sum_value",
    )
    s = q_window_sliding(spark, sf_dir).select(
        F.lit("sliding").alias("mode"), "w_start", "event_type", "n",
        F.lit(None).cast("double").alias("sum_value"),
    )
    return t.unionByName(s)


EXT_QUERIES = {
    "resolve_uri": q_resolve_uri,
    "error_policy": q_error_policy,
    "frontier_priority_order": q_frontier_priority_order,
    "changelog_surfaces": q_changelog_surfaces,
    "media_pipeline": q_media_pipeline,
    "datetime_functions": q_datetime_functions,
    "math_functions": q_math_functions,
    "higher_order_functions": q_higher_order_functions,
    "option_inheritance": q_option_inheritance,
    "embedding_near_dup": q_embedding_near_dup,
    "window_clauses": q_window_clauses,
    "json_functions": q_json_functions,
}
