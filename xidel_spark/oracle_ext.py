"""DuckDB oracles for queries_ext.py."""

from __future__ import annotations

from .oracle import IDS, LINKS_LAYERED, PARAMS, SEEDS, url_expr

RESOLVE_URI = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT d AS doc_id,
       printf('http://h%02d.example.com/dir%d/page.html', d % 13, d % 4) AS base,
       CASE WHEN d % 5 = 0 THEN printf('other%d.html', d)
            WHEN d % 5 = 1 THEN '../up.html'
            WHEN d % 5 = 2 THEN printf('/rooted/%d', d)
            WHEN d % 5 = 3 THEN '//mirror.example.org/pp'
            ELSE '?q=1' END AS ref,
       CASE WHEN d % 5 = 0 THEN printf('http://h%02d.example.com/dir%d/other%d.html', d % 13, d % 4, d)
            WHEN d % 5 = 1 THEN printf('http://h%02d.example.com/up.html', d % 13)
            WHEN d % 5 = 2 THEN printf('http://h%02d.example.com/rooted/%d', d % 13, d)
            WHEN d % 5 = 3 THEN 'http://mirror.example.org/pp'
            ELSE printf('http://h%02d.example.com/dir%d/page.html?q=1', d % 13, d % 4) END AS resolved
FROM ids
"""

ERROR_POLICY = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents),
s AS (
  SELECT d, CAST(CASE WHEN d % 7 = 2 THEN 301
                      WHEN d % 7 = 3 THEN 404
                      WHEN d % 7 = 4 THEN 503
                      WHEN d % 7 = 6 THEN 429
                      ELSE 200 END AS INT) AS status
  FROM ids
)
SELECT printf('http://h%02d.example.com/p/%d', d % 13, d) AS url,
       status,
       CASE WHEN status = 404 THEN 'skip'
            WHEN status >= 300 AND status < 400 THEN 'ignore'
            WHEN status >= 400 AND status < 500 THEN 'retry'
            WHEN status >= 500 AND status < 600 THEN 'retry'
            WHEN status >= 200 AND status < 300 THEN 'accept'
            ELSE 'skip' END AS action
FROM s
"""

FRONTIER_PRIORITY_ORDER = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_LAYERED}, {SEEDS},
walk(id, rank) AS (
  SELECT id, printf('%08x', sidx) FROM seeds
  UNION ALL
  SELECT l.dst, w.rank || printf('%08x', l.idx)
  FROM walk w JOIN links l ON l.src = w.id
),
best AS (SELECT id, min(rank) AS rank FROM walk GROUP BY id)
SELECT {url_expr()} AS url, rank,
       CAST((id % 13) % 3 AS INT) AS priority,
       CAST(row_number() OVER (ORDER BY (id % 13) % 3, rank) AS BIGINT) AS fetch_seq
FROM best
"""

_LOG_CTE = """log AS (
  SELECT (user_id % 20)::BIGINT AS doc_id,
         event_type AS var_name,
         event_id::BIGINT AS seq_index,
         CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 100 AS VARCHAR)
              ELSE 'v' || CAST(event_id % 10 AS VARCHAR) END AS value
  FROM events
)"""

CHANGELOG_CONDENSE = f"""
WITH {_LOG_CTE}
SELECT doc_id, var_name,
       string_agg(value, ',' ORDER BY seq_index) AS values_joined,
       count(*)::BIGINT AS n_assignments,
       count(*) > 1 AS is_multi
FROM log GROUP BY doc_id, var_name
"""

CHANGELOG_JSON = f"""
WITH {_LOG_CTE},
c AS (
  SELECT doc_id, var_name,
         list(value ORDER BY seq_index) AS vals,
         min(seq_index) AS first_seq,
         count(*) AS n
  FROM log GROUP BY doc_id, var_name
),
entries AS (
  SELECT doc_id, first_seq,
         '"' || var_name || '": ' ||
         CASE WHEN n > 1
              THEN '[' || array_to_string(list_transform(vals,
                     v -> CASE WHEN regexp_matches(v, '^-?\\d+(\\.\\d+)?$') THEN v
                               ELSE '"' || replace(v, '"', '\\"') || '"' END), ', ') || ']'
              ELSE (CASE WHEN regexp_matches(vals[1], '^-?\\d+(\\.\\d+)?$') THEN vals[1]
                         ELSE '"' || replace(vals[1], '"', '\\"') || '"' END)
         END AS entry
  FROM c
)
SELECT doc_id,
       '{{' || string_agg(entry, ', ' ORDER BY first_seq) || '}}' AS json
FROM entries GROUP BY doc_id
"""


MEDIA_FEATURES = """
WITH m AS (SELECT doc_id::BIGINT AS doc_id, md5(text) AS h FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS mime,
       CAST(16 AS INT) AS blob_len,
       CAST(16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS INT) AS first_byte,
       CAST((16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 9, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 10, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 11, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 12, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 13, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 14, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 15, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 16, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 17, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 18, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 19, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 20, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 21, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 22, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 23, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 24, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 25, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 26, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 27, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 28, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 29, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 30, 1)) - 1)) + (16 * (strpos('0123456789abcdef', substr(h, 31, 1)) - 1) + (strpos('0123456789abcdef', substr(h, 32, 1)) - 1)) AS INT) AS byte_sum
FROM m
"""

MEDIA_DECODE = """
WITH m AS (SELECT doc_id::BIGINT AS doc_id, md5(text) AS h FROM documents),
b AS (
  SELECT doc_id, i,
         16 * (strpos('0123456789abcdef', substr(h, (2 * i - 1)::INT, 1)) - 1)
            + (strpos('0123456789abcdef', substr(h, (2 * i)::INT, 1)) - 1) AS byte
  FROM m CROSS JOIN (SELECT unnest(range(1, 17)) AS i)
),
agg AS (
  SELECT doc_id,
         avg(byte::DOUBLE) AS mu,
         avg(byte::DOUBLE * byte) AS m2,
         max(CASE WHEN i = 1 THEN byte END) AS b0
  FROM b GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS mime,
       CAST(8 + b0 % 8 AS INT) AS width,
       CAST(16 AS INT) AS height,
       floor(mu * 10000 + 0.5) / 10000 AS px_mean,
       floor(sqrt(m2 - mu * mu) * 10000 + 0.5) / 10000 AS px_std
FROM agg
"""

DATETIME_FUNCTIONS = """
SELECT event_id::BIGINT AS event_id,
       CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
       CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
       strftime(ts, '%Y-%m-%d') AS iso_date,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
       strftime(ts::DATE + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
       strftime(ts, '%-d %B %Y, %H:%M') AS picture
FROM events
"""

MATH_FUNCTIONS = """
SELECT l_orderkey::BIGINT AS l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
       abs(l_extendedprice - 1000) AS abs_x,
       CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
       CAST(floor(l_tax * 100) AS BIGINT) AS floor_tax,
       floor(sqrt(l_extendedprice) * 10000 + 0.5) / 10000 AS sqrt_x,
       floor(pow(l_quantity, 2.0) * 10000 + 0.5) / 10000 AS qty_sq,
       floor(sin(l_discount * 3.0) * 10000 + 0.5) / 10000 AS sin_d,
       floor(cos(l_tax * 2.0) * 10000 + 0.5) / 10000 AS cos_t,
       floor(atan2(l_quantity, 7.0) * 10000 + 0.5) / 10000 AS atan2_q,
       floor(3.141592653589793 * l_discount * 10000 + 0.5) / 10000 AS pi_d,
       floor(ln(l_extendedprice + 1.0) * 10000 + 0.5) / 10000 AS ln_x,
       floor(log10(l_extendedprice + 1.0) * 10000 + 0.5) / 10000 AS log10_x,
       floor(exp(l_discount) * 10000 + 0.5) / 10000 AS exp_d
FROM lineitem
"""

HIGHER_ORDER_FUNCTIONS = r"""
WITH t AS (SELECT doc_id::BIGINT AS doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id,
       array_to_string(list_transform(toks[1:3], x -> upper(substr(x, 1, 3))), ',') AS upper3_head,
       CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
       CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b) AS INT) AS total_len,
       CASE WHEN len(toks) >= 1 THEN toks[1] || '~' || toks[len(toks)] END AS first_pair
FROM t
"""

OPTION_INHERITANCE = """
SELECT o_orderkey::BIGINT AS o_orderkey,
       printf('http://h%02d.example.com/api/%d', o_custkey % 13, o_orderkey) AS url,
       CASE WHEN o_orderkey % 5 = 0 THEN 'POST' ELSE 'GET' END AS method,
       CASE WHEN o_orderkey % 7 = 0 THEN 'json' ELSE 'auto' END AS input_format,
       '' AS error_handling,
       CAST(0 AS BIGINT) AS wait_ms
FROM orders
"""

# planted-twin corpus (mirror of corpus.planted_embeddings — keep in sync):
# twin of v (v % 5 == 0) has id v + n and element j scaled by
# (1 + 0.01*((v + j) % 3 - 1)); DuckDB lambda index is 1-based → j - 1
PLANTED = """base AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings),
twins AS (
  SELECT vec_id + (SELECT count(*) FROM base) AS vec_id,
         list_transform(e, (x, j) -> x * (1 + 0.01 * ((vec_id + j - 1) % 3 - 1))) AS e
  FROM base WHERE vec_id % 5 = 0
),
planted AS (SELECT * FROM base UNION ALL SELECT * FROM twins)"""

EMBEDDING_NEAR_DUP = f"""
WITH {PLANTED},
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         floor(list_cosine_similarity(a.e, b.e) * 1000 + 0.5) / 1000 AS sim
  FROM planted a JOIN planted b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM p WHERE sim >= 0.99
"""

WINDOW_SLIDING = """
WITH r AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e, event_type, k
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
)
SELECT CAST(floor((e - k * 1800) / 3600) * 3600 + k * 1800 AS BIGINT) AS w_start,
       event_type, count(*)::BIGINT AS n
FROM r GROUP BY 1, 2
"""

JSON_FUNCTIONS = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents),
j AS (SELECT d, printf('{"a": %d, "arr": [%d, %d], "s": "x%d"}',
                       d % 5, d % 3, d % 7, d % 11) AS doc FROM ids)
SELECT d AS doc_id,
       CAST(json_extract_string(doc, '$.a') AS INT) AS a,
       CAST(json_array_length(doc, '$.arr') AS INT) AS arr_size,
       CAST(json_extract_string(doc, '$.arr[0]') AS INT)
         + CAST(json_extract_string(doc, '$.arr[1]') AS INT) AS arr_sum,
       CAST(json_extract_string(doc, '$.arr[0]') AS INT) AS first_member,
       json_extract_string(doc, '$.s') AS s,
       array_to_string(list_sort(json_keys(doc)), ',') AS keys_joined
FROM j
"""

CHANGELOG_SURFACES = f"""
WITH {_LOG_CTE},
cond AS (
  SELECT doc_id, var_name,
         string_agg(value, ',' ORDER BY seq_index) AS value,
         count(*)::BIGINT AS n_assignments,
         count(*) > 1 AS is_multi
  FROM log GROUP BY doc_id, var_name
),
c AS (
  SELECT doc_id, var_name,
         list(value ORDER BY seq_index) AS vals,
         min(seq_index) AS first_seq,
         count(*) AS n
  FROM log GROUP BY doc_id, var_name
),
entries AS (
  SELECT doc_id, first_seq,
         '"' || var_name || '": ' ||
         CASE WHEN n > 1
              THEN '[' || array_to_string(list_transform(vals,
                     v -> CASE WHEN regexp_matches(v, '^-?\\d+(\\.\\d+)?$') THEN v
                               ELSE '"' || replace(v, '"', '\\"') || '"' END), ', ') || ']'
              ELSE (CASE WHEN regexp_matches(vals[1], '^-?\\d+(\\.\\d+)?$') THEN vals[1]
                         ELSE '"' || replace(vals[1], '"', '\\"') || '"' END)
         END AS entry
  FROM c
),
js AS (
  SELECT doc_id,
         '{{' || string_agg(entry, ', ' ORDER BY first_seq) || '}}' AS value
  FROM entries GROUP BY doc_id
)
SELECT 'condense' AS mode, doc_id, var_name, value, n_assignments, is_multi
FROM cond
UNION ALL
SELECT 'json' AS mode, doc_id, CAST(NULL AS VARCHAR) AS var_name, value,
       CAST(NULL AS BIGINT) AS n_assignments, CAST(NULL AS BOOLEAN) AS is_multi
FROM js
"""

MEDIA_PIPELINE = """
WITH m AS (SELECT doc_id::BIGINT AS doc_id, md5(text) AS h FROM documents),
b AS (
  SELECT doc_id, i,
         16 * (strpos('0123456789abcdef', substr(h, (2 * i - 1)::INT, 1)) - 1)
            + (strpos('0123456789abcdef', substr(h, (2 * i)::INT, 1)) - 1) AS byte
  FROM m CROSS JOIN (SELECT unnest(range(1, 17)) AS i)
),
agg AS (
  SELECT doc_id,
         sum(byte) AS bs,
         avg(byte::DOUBLE) AS mu,
         avg(byte::DOUBLE * byte) AS m2,
         max(CASE WHEN i = 1 THEN byte END) AS b0
  FROM b GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS mime,
       CAST(16 AS INT) AS blob_len,
       CAST(b0 AS INT) AS first_byte,
       CAST(bs AS INT) AS byte_sum,
       CAST(8 + b0 % 8 AS INT) AS width,
       CAST(16 AS INT) AS height,
       floor(mu * 10000 + 0.5) / 10000 AS px_mean,
       floor(sqrt(m2 - mu * mu) * 10000 + 0.5) / 10000 AS px_std
FROM agg
"""

WINDOW_CLAUSES = """
WITH t AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS w_start,
         event_type, count(*)::BIGINT AS n,
         floor(sum(value) * 100 + 0.5) / 100 AS sum_value
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e, event_type, k
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
),
s AS (
  SELECT CAST(floor((e - k * 1800) / 3600) * 3600 + k * 1800 AS BIGINT) AS w_start,
         event_type, count(*)::BIGINT AS n
  FROM r GROUP BY 1, 2
)
SELECT 'tumbling' AS mode, w_start, event_type, n, sum_value FROM t
UNION ALL
SELECT 'sliding' AS mode, w_start, event_type, n, CAST(NULL AS DOUBLE) AS sum_value
FROM s
"""

EXT_ORACLES = {
    "resolve_uri": RESOLVE_URI,
    "error_policy": ERROR_POLICY,
    "frontier_priority_order": FRONTIER_PRIORITY_ORDER,
    "changelog_surfaces": CHANGELOG_SURFACES,
    "media_pipeline": MEDIA_PIPELINE,
    "datetime_functions": DATETIME_FUNCTIONS,
    "math_functions": MATH_FUNCTIONS,
    "higher_order_functions": HIGHER_ORDER_FUNCTIONS,
    "option_inheritance": OPTION_INHERITANCE,
    "embedding_near_dup": EMBEDDING_NEAR_DUP,
    "window_clauses": WINDOW_CLAUSES,
    "json_functions": JSON_FUNCTIONS,
}
