"""DuckDB oracles for the JSON-mode matrix and map:/array: queries.

The mode table mirrors functions/jsonmode.MODES (keep in sync) — the
oracle recomputes every axis from the flags with plain CASE logic, so the
gate checks the SEMANTICS tables independently of the Spark expressions.
"""

from __future__ import annotations

# name, null_is_item, empty_to_null & seq_to_array (jsoniq ctor), flattens,
# literals, dot
MODE_ROWS = """modes(mode, null_item, ctor_one, flattens, lits, dot) AS (
  VALUES ('standard',   false, false, false, false, false),
         ('jsoniq',     true,  true,  true,  true,  false),
         ('deprecated', true,  false, true,  true,  true),
         ('unified',    false, false, false, true,  true)
)"""

JSON_MODES = f"""
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents),
{MODE_ROWS}
SELECT d AS doc_id, mode,
  CAST(CASE WHEN null_item THEN 1 WHEN d % 2 = 0 THEN 0 ELSE 1 END AS INT) AS cnt1,
  (null_item AND d % 2 = 0) AS isnull1,
  CAST(CASE WHEN null_item THEN 1 WHEN d % 3 = 0 THEN 0 ELSE 1 END AS INT) AS cnt_a,
  CAST(CASE WHEN ctor_one THEN 1 ELSE d % 4 END AS INT) AS obj_cnt,
  CAST(CASE WHEN flattens THEN 2 + d % 3 ELSE 3 END AS INT) AS arr_size,
  CASE WHEN flattens
       THEN CASE WHEN d % 3 = 0 THEN '110' ELSE '111' END
       ELSE '01' || CAST(1 + d % 3 AS VARCHAR) END AS counts,
  CASE WHEN lits AND (d % 4) IN (0, 1, 2)
       THEN ['true', 'false', 'null', 'maybe'][(d % 4)::INT + 1]
       ELSE NULL END AS lit_val,
  CASE WHEN dot THEN CAST(d % 5 AS VARCHAR) ELSE NULL END AS dot
FROM ids CROSS JOIN modes
"""

MAP_ARRAY_FUNCTIONS = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents),
v AS (
  SELECT d,
         CAST(d % 5 AS VARCHAR) AS va, CAST(d % 7 AS VARCHAR) AS vb,
         CAST(d % 11 AS VARCHAR) AS wb,
         (list_transform(range(1, 5), i -> i * (d % 3 + 1)))[1 : (1 + d % 4)::INT] AS arr
  FROM ids
)
SELECT d AS doc_id,
  'a,b' AS m_keys,
  CAST(2 AS INT) AS m_size,
  true AS m_has_a,
  vb AS m_b,
  'Z' AS m_put_a,
  CAST(1 AS INT) AS m_rm_size,
  'a,b,c' AS merged_keys,
  vb AS merged_b,
  CAST(len(arr) AS INT) AS a_size,
  arr[1] AS a_head,
  CAST(len(arr) - 1 AS INT) AS a_tail_size,
  list_aggregate(list_reverse(arr), 'string_agg', ',') AS a_rev,
  coalesce(list_aggregate(arr[2:], 'string_agg', ','), '') AS a_sub,
  list_aggregate(list_transform(arr, x -> CAST(x * 2 AS VARCHAR)), 'string_agg', ',') AS a_x2,
  list_sum(arr)::BIGINT AS a_sum,
  va || ',' || vb AS jn_values,
  'b' AS jn_isect,
  'a,c' AS jn_proj
FROM v
"""

JSON_ORACLES = {
    "json_modes": JSON_MODES,
    "map_array_functions": MAP_ARRAY_FUNCTIONS,
}
