"""Request-tuple identity — the URL-seen-set key.

The reference's dedup key is the FULL request tuple, not the URL:
`THTTPRequest.equalTo` (xidelbase.pas:1242-1245) compares url, method,
post data, header block, multipart. Pinned by tests/tests.sh:558-559:
the same (url, body) twice is fetched once (post4b), the same url with a
different method is fetched twice (post4c).

At scale the tuple is hashed (xxhash64) into the seen filter; headers are
canonicalized (sorted, trimmed) before hashing so equal header sets hash
equally regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def canonical_headers(headers: Column) -> Column:
    """array<string> of 'k: v' → sorted, newline-joined canonical block."""
    return F.array_join(F.array_sort(headers), "\n")


def request_key(
    url: Column, method: Column, body: Column, headers_canon: Column
) -> Column:
    return F.xxhash64(
        F.coalesce(url, F.lit("")),
        F.coalesce(method, F.lit("GET")),
        F.coalesce(body, F.lit("")),
        F.coalesce(headers_canon, F.lit("")),
    )


def request_from_form(
    action_url: Column, method: Column, fields: Column, base_uri: Column
) -> Column:
    """form() → request object (readme.txt:203-214): a struct with the
    resolved action url, method, and the urlencoded field body — fields is
    an array<struct<name,value>> in document order (first wins on dup
    names, like browser form submission)."""
    body = F.array_join(
        F.transform(fields, lambda f: F.concat(f["name"], F.lit("="), f["value"])), "&"
    )
    return F.struct(
        F.coalesce(action_url, base_uri).alias("url"),
        F.upper(F.coalesce(method, F.lit("GET"))).alias("method"),
        F.when(F.upper(F.coalesce(method, F.lit("GET"))) == "GET", F.lit(""))
        .otherwise(body)
        .alias("body"),
        F.when(F.upper(F.coalesce(method, F.lit("GET"))) == "GET", body)
        .otherwise(F.lit(""))
        .alias("query"),
    )


def x_request(
    url: Column,
    method: Column | None = None,
    body: Column | None = None,
    headers: Column | None = None,
    error_handling: Column | None = None,
) -> Column:
    """x:request object constructor (readme.txt x:request; option fields at
    xidelbase.pas follow-object options): url, method, post body, header
    block, and the per-request error-handling override — ALL fields thread
    through the fetch stage and into the request-tuple identity."""
    empty_headers = F.array().cast("array<string>")
    return F.struct(
        url.alias("url"),
        F.upper(F.coalesce(method, F.lit("GET"))).alias("method"),
        F.coalesce(body, F.lit("")).alias("body"),
        F.coalesce(headers, empty_headers).alias("headers"),
        F.coalesce(error_handling, F.lit("")).alias("error_handling"),
    )


def _params_of(qs: Column) -> Column:
    """'a=1&b=2' → array<struct<name,value>> in order (empty → [])."""
    pairs = F.filter(F.split(F.coalesce(qs, F.lit("")), "&"), lambda p: p != "")

    def pair(p):
        name = F.substring_index(p, "=", 1)
        # value = everything after the FIRST '=' — a value may itself
        # contain '=' ('a=b=c' → value 'b=c', not 'c')
        value = (
            F.when(p.contains("="), F.substring(p, F.length(name) + 2, F.length(p)))
            .otherwise(F.lit(""))
        )
        return F.struct(name.alias("name"), value.alias("value"))

    return F.transform(pairs, pair)


def request_decode(url: Column, body: Column | None = None) -> Column:
    """x:request-decode (changelog:9-10 'parse the parameters of a HTTP
    request') — request → {host, path, params}: query-string parameters
    plus urlencoded POST body parameters, in arrival order with the query
    first (the order the reference's TStringList sees them)."""
    from ..urlnorm import host_of

    qpos = F.instr(url, "?")
    path_full = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.when(qpos > 0, F.substring(url, qpos + 1, F.length(url)))
    empty = F.array().cast("array<struct<name:string,value:string>>")
    params = F.concat(
        _params_of(query), _params_of(body) if body is not None else empty
    )
    return F.struct(
        host_of(url).alias("host"),
        F.when(path_full == "", F.lit("/")).otherwise(path_full).alias("path"),
        params.alias("params"),
    )


def request_combine(request: Column, overrides: Column) -> Column:
    """request-combine(request, overrides) (readme.txt:215-217): a new
    request with the override parameters applied — same-named parameters
    are replaced, new names appended, a NULL override value REMOVES the
    parameter ('{"key":()} sends nothing', changelog:17). GET requests
    merge into the query string, others into the body — 'the second
    parameter behaves like that parameter of form'.

    `request` is the form()/x:request struct (url, method, body, query);
    `overrides` is array<struct<name,value>>. Pure higher-order Catalyst —
    combining rides the frontier row-wise, no driver round-trip."""
    is_get = request["method"] == "GET"
    target = F.when(is_get, request["query"]).otherwise(request["body"])
    existing = _params_of(target)
    replaced = F.transform(
        existing,
        lambda e: F.coalesce(
            F.try_element_at(
                F.filter(overrides, lambda o: o["name"] == e["name"]), F.lit(1)
            ),
            e,
        ),
    )
    kept = F.filter(replaced, lambda e: e["value"].isNotNull())
    appended = F.filter(
        overrides,
        lambda o: o["value"].isNotNull()
        & ~F.array_contains(F.transform(existing, lambda e: e["name"]), o["name"]),
    )
    encoded = F.array_join(
        F.transform(
            F.concat(kept, appended),
            lambda p: F.concat(p["name"], F.lit("="), p["value"]),
        ),
        "&",
    )
    return F.struct(
        request["url"].alias("url"),
        request["method"].alias("method"),
        F.when(is_get, request["body"]).otherwise(encoded).alias("body"),
        F.when(is_get, encoded).otherwise(request["query"]).alias("query"),
    )


def action_for_request(status: Column, policy: Column) -> Column:
    """Per-REQUEST error policy (the reference's follow-object override,
    tests/tests.sh:128-129): the policy string ('404=skip,4xx=retry,...')
    is a COLUMN, parsed row-wise in Catalyst — exact status code beats the
    Nxx class, default accept for 2xx / skip otherwise, all inside
    whole-stage codegen (no driver-side parse_policy needed)."""
    entries = F.filter(
        F.split(F.coalesce(policy, F.lit("")), ","), lambda e: F.trim(e) != ""
    )

    def value_for(key: Column) -> Column:
        hits = F.filter(
            entries, lambda e: F.trim(F.element_at(F.split(e, "="), 1)) == key
        )
        return F.try_element_at(
            F.transform(hits, lambda e: F.trim(F.element_at(F.split(e, "="), 2))),
            F.lit(1),
        )

    exact = value_for(status.cast("string"))
    cls = value_for(F.concat((status / 100).cast("int").cast("string"), F.lit("xx")))
    default = F.when((status >= 200) & (status < 300), "accept").otherwise(F.lit("skip"))
    return F.coalesce(exact, cls, default)


def request_fetch(
    requests: DataFrame,
    documents: DataFrame,
    url_col: str = "url",
    policy_col: str | None = None,
) -> DataFrame:
    """x:request($req) inside an expression (xidelbase.pas:4149-4205):
    each request row gains the response object {url, type, headers, raw} —
    realized as a lateral lookup join against the documents table (the
    sandbox fetch; an HTTP stage on a cluster sends the request's method/
    body/headers). Unmatched requests get a null response and status 404;
    when `policy_col` names a per-request error-handling column the rows
    also gain (status, action) from `action_for_request`."""
    resp = documents.select(
        F.col("doc_id").alias("__u"),
        F.struct(
            F.col("doc_id").alias("url"),
            F.col("content_type").alias("type"),
            F.col("headers").alias("headers"),
            F.to_json(F.col("spans")).alias("raw"),
        ).alias("response"),
    )
    out = requests.join(resp, requests[url_col] == resp["__u"], "left").drop("__u")
    if policy_col is not None:
        status = F.when(F.col("response").isNotNull(), F.lit(200)).otherwise(F.lit(404))
        out = out.withColumn("status", status).withColumn(
            "action", action_for_request(F.col("status"), F.col(policy_col))
        )
    return out


def dedup_requests(requests: DataFrame, arrival_col: str = "arrival") -> DataFrame:
    """Drop duplicate requests, keeping the first by arrival order — the
    enqueue-time dedup of xidelbase.pas:1484-1491 applied to a request
    batch. Identity = the full tuple.

    One shuffle on the identity columns; at scale this groupBy is preceded
    by the Bloom pre-filter so most already-seen tuples never shuffle.
    """
    ident = ["url", "method", "body", "headers"]
    w = Window.partitionBy(*ident).orderBy(arrival_col)
    return (
        requests.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
