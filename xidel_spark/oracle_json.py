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

# roman numerals 1..30 as a ground-truth table (format-integer 'i')
_ROMANS = ("i ii iii iv v vi vii viii ix x xi xii xiii xiv xv xvi xvii xviii "
           "xix xx xxi xxii xxiii xxiv xxv xxvi xxvii xxviii xxix xxx").split()
_ROMAN_LIST = "[" + ", ".join(f"'{r}'" for r in _ROMANS) + "]"

QUANTIFIED_CONDITIONAL = f"""
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT d AS doc_id,
  -- seq = [i * (d%3) for i in 1..1+d%5]; some x > 3
  ((d % 3) > 0 AND (1 + d % 5) * (d % 3) > 3) AS some_gt3,
  true AS every_nonneg,
  CASE WHEN d % 2 = 0 THEN 'even' ELSE 'odd' END AS cond,
  CASE WHEN d % 3 = 0 THEN 'a' WHEN d % 5 = 0 THEN 'b' ELSE 'z' END AS oth,
  format('{{:,}}', d * 37) || '.' || lpad(CAST(d % 90 AS VARCHAR), 2, '0') AS fmt_num,
  lpad(CAST(1 + d % 600 AS VARCHAR), 3, '0') AS fmt_pad,
  {_ROMAN_LIST}[(d % 30)::INT + 1] AS roman,
  (CASE WHEN 1 + d % 100 > 26 THEN chr(96 + ((d % 100)::INT // 26)) ELSE '' END)
    || chr(97 + (d % 100)::INT % 26) AS alpha,
  CAST(floor(epoch(make_timestamp(2000 + d % 25, (d % 12)::INT + 1, (1 + d % 28)::INT,
                                  (d % 24)::INT, (d % 60)::INT, (d % 57)::DOUBLE))) AS BIGINT) AS ietf_epoch,
  strftime(make_timestamp(2000 + d % 25, (d % 12)::INT + 1, (1 + d % 28)::INT,
                          (d % 24)::INT, (d % 60)::INT, (d % 57)::DOUBLE)
           + INTERVAL 2 HOUR, '%Y-%m-%dT%H:%M:%S') || '+02:00' AS adjusted
FROM ids
"""

JSON_ORACLES = {
    "json_modes": JSON_MODES,
    "map_array_functions": MAP_ARRAY_FUNCTIONS,
    "quantified_conditional": QUANTIFIED_CONDITIONAL,
}
