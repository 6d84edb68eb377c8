"""DuckDB oracles for the expression-language queries (queries_expr.py).

Each SQL mirrors what the xidel expression semantics REQUIRE, written
independently in ANSI SQL: e.g. the collation columns (ci_eq/numcoll) are
TRUE by the case-insensitive numeric-aware comparison rules, so an engine
that byte-compares would mismatch on real rows.
"""

XPATH_EXPRESSIONS = """
SELECT
  o_orderkey::BIGINT                              AS key,
  (o_orderkey * 2 + 1)::BIGINT                    AS arith,
  CAST(o_orderkey + 10 AS DOUBLE)                 AS weak_sum,
  CAST(o_totalprice / 2 AS DOUBLE)                AS half_price,
  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS cond,
  TRUE                                            AS ci_eq,
  TRUE                                            AS numcoll,
  (o_orderkey % 2 = 0)                            AS boolweak,
  (o_orderkey % 7 BETWEEN 1 AND 5)                AS quant,
  CASE o_orderkey % 3 WHEN 0 THEN '1' WHEN 1 THEN '1-4' ELSE '1-4-9' END AS flwor,
  'k=' || o_orderkey || ' p=' || o_orderpriority  AS xstr,
  (CASE o_orderkey % 3 WHEN 0 THEN 10 WHEN 1 THEN 20 ELSE 30 END)::BIGINT AS pick,
  CAST((o_orderkey % 4 + 1) * (o_orderkey % 4 + 2) / 2 AS DOUBLE) AS agg,
  o_orderpriority || '#' || o_orderkey            AS concat3
FROM orders
"""

REQUEST_COMBINE_FRONTIER = """
SELECT
  o_orderkey::BIGINT AS key,
  CASE WHEN o_orderkey % 2 = 0 THEN 'POST' ELSE 'GET' END AS method,
  CASE WHEN o_orderkey % 2 = 0 THEN 'p=X&extra=1' ELSE '' END AS body,
  CASE WHEN o_orderkey % 2 = 0 THEN '' ELSE 'p=X&extra=1' END AS query,
  'h' || (o_orderkey % 13) || '.test' AS dec_host,
  '/p/' || o_orderkey AS dec_path,
  CAST(o_orderkey AS VARCHAR) AS dec_x,
  CAST(2 AS INT) AS dec_n
FROM orders
"""

XS_CONSTRUCTORS = """
SELECT
  o_orderkey::BIGINT AS key,
  o_orderkey::BIGINT AS i,
  CASE WHEN (o_orderkey % 300 - 150) BETWEEN -128 AND 127
       THEN (o_orderkey % 300 - 150)::BIGINT END AS b,
  CAST(CAST(o_orderkey || '.25' AS DECIMAL(38,18)) AS VARCHAR) AS dec,
  (o_orderkey % 2 = 0) AS bool,
  CAST(o_orderdate AS DATE) AS d,
  CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 12:34:56' AS TIMESTAMP) AS ts,
  CAST(o_orderdate AS DATE)::TIMESTAMP + INTERVAL (o_orderkey % 7) HOUR AS plus_dtd,
  CAST(CAST(o_orderdate AS DATE) + INTERVAL (o_orderkey % 5) MONTH AS DATE) AS plus_ym,
  CAST(0 AS BIGINT) AS dur_months,
  -CAST(o_orderkey % 3 AS DOUBLE) * 86400 - 7200 AS dur_secs,
  strftime(o_orderdate, '%Y-%m') AS gym,
  'a ' || o_orderkey || ' b' AS tok,
  printf('%02d:05:06', o_orderkey % 24) AS t,
  CASE WHEN o_orderkey % 10 >= 5 THEN (o_orderkey % 10 - 5)::BIGINT END AS nni
FROM orders
"""

INSTANCE_OF_DYNAMIC = """
WITH base AS (
  SELECT o_orderkey::BIGINT AS key,
    CASE o_orderkey % 6
      WHEN 0 THEN o_orderkey::VARCHAR
      WHEN 1 THEN o_orderkey::VARCHAR || '.5'
      WHEN 2 THEN 'true'
      WHEN 3 THEN strftime(o_orderdate::DATE, '%Y-%m-%d')
      WHEN 4 THEN 'NaN'
      ELSE 'x' || o_orderkey::VARCHAR
    END AS lex
  FROM orders
)
SELECT key, lex,
  regexp_matches(lex, '^[+-]?\\d+$')
    AND TRY_CAST(lex AS BIGINT) IS NOT NULL
    AS is_integer,
  trim(lex) IN ('INF','-INF','NaN') OR TRY_CAST(trim(lex) AS DOUBLE) IS NOT NULL
    AS is_double,
  trim(lex) IN ('true','false','1','0') AS is_boolean,
  regexp_matches(lex, '^\\d{4}-\\d{2}-\\d{2}$') AND TRY_CAST(lex AS DATE) IS NOT NULL
    AS is_date,
  regexp_matches(lex, '^[+-]?\\d+$')
    AND TRY_CAST(lex AS BIGINT) BETWEEN -128 AND 127
    AS is_byte,
  lex IS NOT NULL AS is_string
FROM base
"""

EXPR_ORACLES = {
    "xpath_expressions": XPATH_EXPRESSIONS,
    "request_combine_frontier": REQUEST_COMBINE_FRONTIER,
    "xs_constructors": XS_CONSTRUCTORS,
    "instance_of_dynamic": INSTANCE_OF_DYNAMIC,
}
