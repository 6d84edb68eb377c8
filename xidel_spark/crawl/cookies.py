"""Cookie jar — load/save cookies across requests (RFC 6265-lite).

The reference keeps a cookie store on the connection object and persists
it with --load-cookies/--save-cookies (xidelbase.pas:1123-1126, 2134;
changelog:33). Distributed form: the jar is a small (host, name, value)
table — updated per wave from Set-Cookie response headers (last write
wins in wave order), broadcast back into the next wave's fetch as a
per-host Cookie header, and persisted with the checkpoint snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parse_set_cookie(responses: DataFrame, url_col: str = "url", header_col: str = "set_cookie") -> DataFrame:
    """(host, name, value, order) from Set-Cookie response headers;
    attributes after the first ';' are ignored (lite)."""
    from ..urlnorm import host_of

    pair = F.split(F.split(F.col(header_col), ";").getItem(0), "=", 2)
    return (
        responses.where(F.col(header_col).isNotNull())
        .select(
            host_of(F.col(url_col)).alias("host"),
            F.trim(pair.getItem(0)).alias("name"),
            F.trim(pair.getItem(1)).alias("value"),
            F.monotonically_increasing_id().alias("order"),
        )
    )


def update_jar(
    jar: DataFrame | None, new_cookies: DataFrame, generation: int | None = None
) -> DataFrame:
    """last-write-wins per (host, name), ordered by an explicit generation
    counter (wave number) — NOT by monotonically_increasing_id arithmetic,
    whose partition-id high bits (>= 2^33 for partition 1+) would let a
    stale jar entry outrank a newer Set-Cookie. Within one generation the
    intra-batch `order` id breaks ties (same partition-ordering semantics
    the response batch arrived with)."""
    if jar is None:
        # generation 0 still needs the per-(host,name) last-write-wins pass:
        # duplicate Set-Cookie headers for one (host,name) inside the first
        # response batch must collapse to one jar row.
        w0 = Window.partitionBy("host", "name").orderBy(F.desc("order"))
        return (
            new_cookies.withColumn("generation", F.lit(0).cast("long"))
            .withColumn("__rn", F.row_number().over(w0))
            .where("__rn = 1")
            .drop("__rn")
        )
    if generation is None:
        row = jar.agg(F.max("generation").alias("g")).first()
        generation = int(row["g"] or 0) + 1
    new_cookies = new_cookies.withColumn("generation", F.lit(generation).cast("long"))
    merged = jar.unionByName(new_cookies)
    w = Window.partitionBy("host", "name").orderBy(
        F.desc("generation"), F.desc("order")
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def cookie_headers(jar: DataFrame) -> DataFrame:
    """(host, cookie_header): 'a=1; b=2' with names sorted — ready to
    broadcast-join onto the frontier before the fetch stage."""
    return (
        jar.groupBy("host")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.concat("name", F.lit("="), "value"))), "; "
            ).alias("cookie_header")
        )
    )
