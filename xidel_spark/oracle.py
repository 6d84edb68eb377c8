"""DuckDB oracle SQL for the driver's correctness gate.

Every query in __spark_entry__.queries() has a matching ANSI-SQL string
here that DuckDB runs against the same parquet tables. The synthetic link
graph / URL arithmetic is the SAME closed-form math as corpus.py (keep in
sync — constants NL=5, MULT_A=7, MULT_B=17, ADD_C=7, HOSTS=13, SEED_MOD=7).

The crawl oracles are recursive CTEs:
- layered DAG  → all enqueue paths are enumerable (polynomial: equal-length
  paths per node), and on a layered graph lexicographic MIN over full path
  ranks equals the reference's first-enqueuer DFS rank (all parents of a
  node share a layer, so no prefix-length comparison corner).
- cyclic graph → BFS seen set via UNION-distinct recursion with min(depth).
Generality beyond these graph shapes (prefix-parent corners, dedup+depth
interplay) is covered by tests/test_crawl_properties.py against the
sequential simulator.
"""

from __future__ import annotations

# ---- shared CTE fragments -------------------------------------------------

PARAMS = "params AS (SELECT count(*)::BIGINT AS n FROM documents)"
IDS = "ids AS (SELECT doc_id::BIGINT AS d FROM documents)"

# layered links: layer(d)=d%5, outdeg=1+d%3, dst in layer+1
LINKS_LAYERED = """links AS (
  SELECT i.d AS src, CAST(gs.k AS INT) AS idx,
         ((((i.d // 5) * 7 + gs.k * 17 + 7)
            % (((p.n - 2 - (i.d % 5)) // 5) + 1)) * 5 + (i.d % 5) + 1) AS dst
  FROM ids i
  CROSS JOIN params p
  CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + i.d % 3)) AS k) gs
  WHERE i.d % 5 < 4
)"""

# cyclic links: dst = (d*7 + k*17 + 7) % n
LINKS_CYCLIC = """clinks AS (
  SELECT i.d AS src, CAST(gs.k AS INT) AS idx,
         ((i.d * 7 + gs.k * 17 + 7) % p.n) AS dst
  FROM ids i
  CROSS JOIN params p
  CROSS JOIN LATERAL (SELECT unnest(range(0, 1 + i.d % 3)) AS k) gs
)"""

SEEDS = """seeds AS (
  SELECT d AS id, CAST(row_number() OVER (ORDER BY d) - 1 AS INT) AS sidx
  FROM ids WHERE d % 5 = 0 AND (d // 5) % 7 = 0
)"""

URL = "printf('http://h%02d.example.com/p/%d', {id} % 13, {id})"


def url_expr(id_col: str = "id") -> str:
    return URL.format(id=id_col)


CRAWL_DFS_ORDER = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_LAYERED}, {SEEDS},
walk(id, rank) AS (
  SELECT id, printf('%08x', sidx) FROM seeds
  UNION ALL
  SELECT l.dst, w.rank || printf('%08x', l.idx)
  FROM walk w JOIN links l ON l.src = w.id
),
best AS (SELECT id, min(rank) AS rank FROM walk GROUP BY id)
SELECT {url_expr()} AS url,
       rank,
       CAST(length(rank) / 8 - 1 AS INT) AS depth,
       CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS ord
FROM best
"""

CRAWL_NODEDUP_DEPTH2 = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_LAYERED}, {SEEDS},
walk(id, rank, depth) AS (
  SELECT id, printf('%08x', sidx), 0 FROM seeds
  UNION ALL
  SELECT l.dst, w.rank || printf('%08x', l.idx), w.depth + 1
  FROM walk w JOIN links l ON l.src = w.id
  WHERE w.depth < 2
)
SELECT {url_expr()} AS url, rank, CAST(depth AS INT) AS depth,
       CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS ord
FROM walk
"""

CRAWL_SEEN_BFS = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_CYCLIC}, {SEEDS},
reach(id, depth) AS (
  SELECT id, 0 FROM seeds
  UNION
  SELECT l.dst, r.depth + 1
  FROM reach r JOIN clinks l ON l.src = r.id
  WHERE r.depth < 64
)
SELECT {url_expr()} AS url, CAST(min(depth) AS INT) AS depth
FROM reach GROUP BY id
"""

# nodedup expansion + BFS seen set under one driver row (mode column)
CRAWL_MODES = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_LAYERED}, {LINKS_CYCLIC}, {SEEDS},
walk(id, rank, depth) AS (
  SELECT id, printf('%08x', sidx), 0 FROM seeds
  UNION ALL
  SELECT l.dst, w.rank || printf('%08x', l.idx), w.depth + 1
  FROM walk w JOIN links l ON l.src = w.id
  WHERE w.depth < 2
),
reach(id, depth) AS (
  SELECT id, 0 FROM seeds
  UNION
  SELECT l.dst, r.depth + 1
  FROM reach r JOIN clinks l ON l.src = r.id
  WHERE r.depth < 64
)
SELECT 'nodedup' AS mode, {url_expr()} AS url, rank,
       CAST(depth AS INT) AS depth,
       CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS ord
FROM walk
UNION ALL
SELECT 'bfs' AS mode, {url_expr()} AS url, CAST(NULL AS VARCHAR) AS rank,
       CAST(min(depth) AS INT) AS depth, CAST(NULL AS BIGINT) AS ord
FROM reach GROUP BY id
"""

LINK_EXTRACTION = f"""
WITH {PARAMS}, {IDS}, {LINKS_LAYERED}
SELECT {url_expr('src')} AS src, idx, {url_expr('dst')} AS dst FROM links
"""

URL_CANONICALIZE = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT d AS doc_id,
       (CASE WHEN d % 2 = 0 THEN 'HTTP' ELSE 'http' END)
         || '://' || printf('H%02d.Example.COM', d % 13)
         || (CASE WHEN d % 3 = 0 THEN ':80' ELSE '' END)
         || (CASE WHEN d % 5 = 0 THEN printf('/a/./x/../p/%d', d) ELSE printf('/p/%d', d) END)
         || (CASE WHEN d % 4 = 0 THEN '?b=2&a=1' ELSE '' END)
         || (CASE WHEN d % 7 = 0 THEN '#frag' ELSE '' END) AS raw_url,
       'http://' || printf('h%02d.example.com', d % 13)
         || (CASE WHEN d % 5 = 0 THEN printf('/a/p/%d', d) ELSE printf('/p/%d', d) END)
         || (CASE WHEN d % 4 = 0 THEN '?a=1&b=2' ELSE '' END) AS canonical
FROM ids
"""

POLITENESS_SCHEDULE = f"""
WITH RECURSIVE {PARAMS}, {IDS}, {LINKS_LAYERED}, {SEEDS},
walk(id, rank) AS (
  SELECT id, printf('%08x', sidx) FROM seeds
  UNION ALL
  SELECT l.dst, w.rank || printf('%08x', l.idx)
  FROM walk w JOIN links l ON l.src = w.id
),
best AS (SELECT id, min(rank) AS rank FROM walk GROUP BY id)
SELECT {url_expr()} AS url,
       printf('h%02d.example.com', id % 13) AS host,
       CAST(row_number() OVER (PARTITION BY id % 13 ORDER BY rank) AS INT) AS host_seq,
       CAST((row_number() OVER (PARTITION BY id % 13 ORDER BY rank) - 1) * 500 AS BIGINT) AS scheduled_ms
FROM best
"""

ROBOTS_FILTER = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT printf('http://h%02d.example.com/p/%d', d % 13, d) AS url,
       NOT ((d % 13) % 3 = 0 AND CAST(d AS VARCHAR) LIKE '1%') AS allowed
FROM ids
"""

FRONTIER_DEDUP_REQUEST_TUPLE = """
WITH reqs AS (
  SELECT printf('http://h%02d.example.com/api/%d', o_custkey % 13, o_custkey % 50) AS url,
         CASE o_orderkey % 3 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' ELSE 'PUT' END AS method,
         CASE WHEN o_orderkey % 3 = 1 THEN printf('q=%d', o_orderkey % 5) ELSE '' END AS body,
         o_orderkey::BIGINT AS arrival
  FROM orders
)
SELECT url, method, body,
       min(arrival) AS first_arrival,
       count(*)::BIGINT AS n_requests
FROM reqs GROUP BY url, method, body
"""
