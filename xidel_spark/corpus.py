"""Deterministic synthetic corpora.

Two corpora, both fully deterministic (no RNG, no external data):

1. `fixture_graph` — the reference's crawl-order oracle graph
   (/root/reference/tests/a.xml..c2.xml, FIXTURES.md §1a) expressed as the
   interleaved-spans documents table. Drives the golden-output tests.

2. `synth_docs` / `synth_links` — a layered link graph derived arithmetically
   from the driver's documents.parquet (doc_id is the only input), so the
   exact same graph is constructible in DuckDB SQL (see oracle.py) for the
   driver's correctness gate. Layered (links go layer ℓ → ℓ+1 only) so the
   SQL oracle's path enumeration stays polynomial; the *engine* does not
   rely on layering — generality is covered by the sequential-simulator and
   property-based tests.

Shared arithmetic (mirrored verbatim in oracle.py — keep in sync):
    NL      = 5                      layers; layer(d) = d % NL
    outdeg(d) = 1 + d % 3            1..3 links, only if layer(d) < NL-1
    m_next  = ((n - 2 - layer) // NL) + 1      docs in layer+1
    dst(d,k) = (((d // NL)*7 + k*17 + 7) % m_next) * NL + layer(d) + 1
    seed(d) : layer(d)==0 and (d // NL) % 7 == 0
    url(d)  = printf('http://h%02d.example.com/p/%d', d % 13, d)

The ×7 multiplier + 1..3 out-degree make distinct parents collide on
children, so the dedup anti-join and first-enqueuer resolution are actually
exercised (verified: >30% of wave candidates are dedup hits at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NL = 5
HOSTS = 13
MULT_A, MULT_B, ADD_C = 7, 17, 7
SEED_MOD = 7

# ---------------------------------------------------------------------------
# 1. reference fixture graph (tests/a.xml family)
# ---------------------------------------------------------------------------

# (doc, title, [followed links], [non-anchor refs])
FIXTURE = [
    ("a.xml", "AAA", ["b.xml", "c.xml"], ["d.xml"]),  # <ad href=d.xml> is NOT an <a>
    ("b.xml", "BBB", ["c.xml", "b1.xml", "b2.xml"], []),
    ("b1.xml", "B1", [], []),
    ("b2.xml", "B2", [], []),
    ("c.xml", "CCC", ["c1.xml", "c2.xml"], []),
    ("c1.xml", "C1", [], []),
    ("c2.xml", "C2", [], []),
    ("d.xml", "DDD", [], []),
    ("dpre.xml", "Dpre", ["d.xml"], []),
]


def fixture_link_map() -> dict[str, list[str]]:
    return {doc: list(links) for doc, _, links, _ in FIXTURE}


def fixture_graph(spark: SparkSession) -> DataFrame:
    """The a/b/c/d graph as an interleaved-spans documents table."""
    rows = []
    for doc, title, links, others in FIXTURE:
        spans = [("title", title, None, 0)]
        off = 1
        for href in links:
            spans.append(("link", href.split(".")[0], href, off))
            off += 1
        for href in others:
            # non-anchor element carrying an href (like <ad>): must not be
            # selected by '//a' (golden tests/output/tef excludes DDD)
            spans.append(("ad", "ad", href, off))
            off += 1
        rows.append((doc, spans, doc, "text/html", {"status": "200"}, "html"))
    from .schemas import DOCUMENTS

    return spark.createDataFrame(rows, DOCUMENTS)


# ---------------------------------------------------------------------------
# 2. synthetic layered corpus derived from documents.parquet
# ---------------------------------------------------------------------------


def url_of(doc_id) -> F.Column:
    return F.format_string(
        "http://h%02d.example.com/p/%d", (doc_id % HOSTS).cast("long"), doc_id.cast("long")
    )


def base_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def synth_links(spark: SparkSession, sf_dir: str, *, as_urls: bool = True) -> DataFrame:
    """(src, idx, dst) link table from the shared arithmetic."""
    docs = base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    n = docs.count()
    d = F.col("d")
    layer = d % NL
    outdeg = 1 + d % 3
    linked = (
        docs.where(layer < NL - 1)
        .select(d.alias("d"), F.explode(F.sequence(F.lit(0), (outdeg - 1).cast("int"))).alias("k"))
    )
    d, k = F.col("d"), F.col("k")
    layer = d % NL
    m_next = ((F.lit(n) - 2 - layer) / NL).cast("long") + 1
    dst_id = (((d / NL).cast("long") * MULT_A + k * MULT_B + ADD_C) % m_next) * NL + layer + 1
    out = linked.select(d.alias("src_id"), k.cast("int").alias("idx"), dst_id.alias("dst_id"))
    if as_urls:
        out = out.select(
            url_of(F.col("src_id")).alias("src"), "idx", url_of(F.col("dst_id")).alias("dst")
        )
    return out


def synth_seed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    return docs.where((d % NL == 0) & ((d / NL).cast("long") % SEED_MOD == 0)).orderBy("d")


def synth_seeds(spark: SparkSession, sf_dir: str) -> list[str]:
    rows = synth_seed_ids(spark, sf_dir).select(
        url_of(F.col("d")).alias("url")
    ).collect()
    return [r["url"] for r in rows]


def synth_links_cyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-layered (cyclic) link graph: dst(d,k) = (d*7 + k*17 + 7) % n.

    Used for the BFS seen-set query and the bench crawl: unlike the layered
    graph, already-seen URLs recur in later waves, so the central anti-join
    actually drops candidates (cross-wave dedup).
    """
    docs = base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    n = docs.count()
    d = F.col("d")
    outdeg = 1 + d % 3
    linked = docs.select(
        d.alias("d"), F.explode(F.sequence(F.lit(0), (outdeg - 1).cast("int"))).alias("k")
    )
    d, k = F.col("d"), F.col("k")
    dst_id = (d * MULT_A + k * MULT_B + ADD_C) % n
    return linked.select(
        url_of(d).alias("src"), k.cast("int").alias("idx"), url_of(dst_id).alias("dst")
    )


def dirty_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, raw_url) — deterministically 'dirty' URLs for the
    canonicalization query: uppercase scheme/host, default ports, dot
    segments, unsorted query params, fragments."""
    docs = base_docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("d"))
    d = F.col("d")
    scheme = F.when(d % 2 == 0, "HTTP").otherwise("http")
    host = F.format_string("H%02d.Example.COM", (d % HOSTS).cast("long"))
    port = F.when(d % 3 == 0, ":80").otherwise("")
    path = F.when(d % 5 == 0, F.format_string("/a/./x/../p/%d", d)).otherwise(
        F.format_string("/p/%d", d)
    )
    query = F.when(d % 4 == 0, "?b=2&a=1").otherwise("")
    frag = F.when(d % 7 == 0, "#frag").otherwise("")
    return docs.select(
        d.alias("doc_id"),
        F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias("raw_url"),
    )


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic near-duplicate twins.

    The driver's embeddings are random (max pairwise cosine ≈ 0.51 at
    sf0.01), so genuine near-dup thresholds would match nothing. Every
    vec_id v with v % 5 == 0 gets a twin (id = v + n) whose element j is
    scaled by (1 + 0.01·((v + j) % 3 − 1)) — cosine(e, twin) ≈ 0.9999,
    far above any random pair. The same arithmetic is mirrored in the
    DuckDB oracles (oracle_ext.PLANTED), so ground truth is closed-form."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    n = emb.count()
    v = F.col("vec_id")
    twin = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.sequence(F.lit(0), F.size("embedding") - 1),
        lambda x, j: x * (1.0 + 0.01 * (((v + j) % 3).cast("double") - 1.0)),
    )
    twins = emb.where(v % 5 == 0).select(
        (v + n).alias("vec_id"), twin.alias("embedding")
    )
    return emb.select(v.alias("vec_id"), F.col("embedding").cast("array<double>").alias("embedding")).unionByName(twins)


def synth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved text+media documents table (input_hint schema).

    Each synthetic page gets: a title span, two text spans (chunks of the
    base document text), its arithmetic link spans (kind='link'), and an
    image media span — interleaved by offset.
    """
    base = base_docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("d"), F.col("text")
    )
    links = synth_links(spark, sf_dir, as_urls=False)
    agg_links = links.groupBy("src_id").agg(
        F.sort_array(F.collect_list(F.struct("idx", "dst_id"))).alias("ls")
    )
    d = F.col("d")
    joined = base.join(agg_links, base.d == agg_links.src_id, "left")
    title = F.struct(
        F.lit("title").alias("kind"),
        F.format_string("T%d", d).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    text1 = F.struct(
        F.lit("text").alias("kind"),
        F.substring("text", 1, 64).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(1).alias("offset"),
    )
    link_spans = F.transform(
        F.coalesce(F.col("ls"), F.array()),
        lambda s: F.struct(
            F.lit("link").alias("kind"),
            F.format_string("link%d", s["idx"]).alias("text"),
            url_of(s["dst_id"]).alias("media_ref"),
            (s["idx"] + 2).cast("int").alias("offset"),
        ),
    )
    text2 = F.struct(
        F.lit("text").alias("kind"),
        F.substring("text", 65, 64).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(90).alias("offset"),
    )
    image = F.struct(
        F.lit("image").alias("kind"),
        F.lit("img").alias("text"),
        F.format_string("http://img.example.com/i/%d.png", d).alias("media_ref"),
        F.lit(99).alias("offset"),
    )
    spans = F.concat(F.array(title, text1), link_spans, F.array(text2, image))
    return joined.select(
        url_of(d).alias("doc_id"),
        spans.alias("spans"),
        url_of(d).alias("base_uri"),
        F.lit("text/html").alias("content_type"),
        F.create_map(F.lit("status"), F.lit("200")).alias("headers"),
        F.lit("html").alias("input_format"),
    )
