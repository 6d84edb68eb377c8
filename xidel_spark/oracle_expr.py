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

EXPR_ORACLES = {
    "xpath_expressions": XPATH_EXPRESSIONS,
    "request_combine_frontier": REQUEST_COMBINE_FRONTIER,
}
