"""DuckDB oracles for queries_fn.py."""

from __future__ import annotations

EXTRACT_REGEX = r"""
SELECT doc_id::BIGINT AS doc_id,
       regexp_extract(text, '^(\w+) (\w+)', 1) AS first_word,
       regexp_extract(text, '^(\w+) (\w+)', 2) AS second_word,
       regexp_extract(text, '(customer|order|line)', 1) AS entity
FROM documents
"""

STRING_FUNCTIONS = r"""
WITH t AS (SELECT doc_id::BIGINT AS doc_id, text,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id,
       CASE WHEN strpos(text, ' ') > 0 THEN substr(text, 1, strpos(text, ' ') - 1) ELSE '' END AS before_sp,
       CASE WHEN strpos(text, 'table') > 0 THEN substr(text, strpos(text, 'table') + 5) ELSE '' END AS after_table,
       strpos(text, 'spark') > 0 AS has_spark,
       trim(regexp_replace('  x  ' || substr(text, 1, 20) || ' ', '\s+', ' ', 'g')) AS norm,
       translate(substr(text, 1, 30), 'aeiou', '_____') AS translated,
       array_to_string(toks[2:4], '-') AS joined_2_4
FROM t
"""

SEQUENCE_OPS = r"""
WITH t AS (SELECT doc_id::BIGINT AS doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
idx AS (SELECT doc_id, toks,
               list_filter(list_transform(toks, (x, i) -> CASE WHEN x = 'the' THEN i ELSE NULL END),
                           p -> p IS NOT NULL) AS the_pos
        FROM t)
SELECT doc_id,
       CAST(len(the_pos) AS INT) AS n_the,
       CAST(the_pos[1] AS INT) AS first_the,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       toks[1] AS head,
       toks[2] AS second,
       array_to_string(list_reverse(toks[1:4]), ' ') AS rev4,
       array_to_string(list_concat([toks[1]], toks[3:4]), ' ') AS rm2
FROM idx
"""

JSON_ACCESS = """
SELECT event_id::BIGINT AS event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0 AS k_mod10
FROM events
"""

FLWOR_GROUP_ORDER = """
SELECT event_type,
       count(*)::BIGINT AS n,
       floor(avg(value) * 100 + 0.5) / 100 AS avg_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
"""

WINDOW_TUMBLING = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events GROUP BY 1, 2
"""

AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

JOIN_BROADCAST_DIM = """
SELECT n_name,
       count(*)::BIGINT AS n_orders,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

FLWOR_GROUP_BY = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents),
seqs AS (SELECT d, unnest(range(1, 2 + d % 7)) AS x FROM ids),
g AS (
  SELECT d, x % 3 AS k, count(*)::BIGINT AS c, sum(x)::BIGINT AS s
  FROM seqs GROUP BY d, x % 3
),
grp AS (
  SELECT d, string_agg(k || ':' || c || ':' || s, ';' ORDER BY k) AS grouped
  FROM g GROUP BY d
),
cseqs AS (SELECT d, unnest(range(1, 2 + d % 5)) AS x,
                 unnest(range(1, 2 + d % 5)) AS c FROM ids),
cnt AS (
  SELECT d, string_agg(c || 'x' || x, ',' ORDER BY c) AS counted
  FROM cseqs GROUP BY d
)
SELECT grp.d AS doc_id, grouped, counted
FROM grp JOIN cnt ON grp.d = cnt.d
"""

FN_ORACLES = {
    "extract_regex": EXTRACT_REGEX,
    "string_functions": STRING_FUNCTIONS,
    "sequence_ops": SEQUENCE_OPS,
    "json_access": JSON_ACCESS,
    "flwor_group_order": FLWOR_GROUP_ORDER,
    "flwor_group_by": FLWOR_GROUP_BY,
    "agg_pricing_summary": AGG_PRICING_SUMMARY,
    "join_broadcast_dim": JOIN_BROADCAST_DIM,
}
