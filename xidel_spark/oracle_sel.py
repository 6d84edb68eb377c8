"""DuckDB oracles for the selector-engine queries (queries_sel.py).

Same shared arithmetic as oracle.py — the expected selector hits are
closed-form over the layered link table, so the oracle checks the
*semantics* of axes/CSS/parse-html without needing an XPath engine in SQL.
"""

from __future__ import annotations

from .oracle import IDS, LINKS_LAYERED, PARAMS, url_expr

# //a[1]/following-sibling::a/@href == every link after each doc's first
XPATH_AXES = f"""
WITH {PARAMS}, {IDS}, {LINKS_LAYERED}
SELECT {url_expr('src')} AS url, CAST(idx - 1 AS INT) AS idx, {url_expr('dst')} AS dst
FROM links WHERE idx >= 1
"""

# 'text + a, img[src]': the k=0 link (adjacent to the first text span) for
# linked docs, then the image span; idx is document order within the doc
CSS_SELECT = f"""
WITH {PARAMS}, {IDS}, {LINKS_LAYERED},
first_links AS (
  SELECT {url_expr('src')} AS url, 0 AS idx, {url_expr('dst')} AS dst
  FROM links WHERE idx = 0
),
images AS (
  SELECT {url_expr('d')} AS url,
         CASE WHEN d % 5 < 4 THEN 1 ELSE 0 END AS idx,
         printf('http://img.example.com/i/%d.png', d) AS dst
  FROM ids
)
SELECT url, CAST(idx AS INT) AS idx, dst FROM first_links
UNION ALL
SELECT url, CAST(idx AS INT) AS idx, dst FROM images
"""

# //p[@class='c1']/text() over the synthesized page: P{d} when d%3==1
# (first p is c1), Q{d} when d%3==0 (second p is c1), nothing when d%3==2
PARSE_HTML_EXTRACT = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT d AS doc_id,
       CASE WHEN d % 3 = 1 THEN printf('P%d', d) ELSE printf('Q%d', d) END AS value
FROM ids WHERE d % 3 IN (0, 1)
"""

# node functions over '<p>A{d}  B</p><script>junk{d}</script><p>C{d}</p>':
# deep-text concatenates ALL descendant text (script included), inner-text
# hides script/style and collapses whitespace, is-nth(d+1,3,1) ⇔ d%3=0,
# //p[position()=last()] string-value = the second paragraph
NODE_FUNCTIONS = """
WITH ids AS (SELECT doc_id::BIGINT AS d FROM documents)
SELECT d AS doc_id,
       printf('A%d  Bjunk%dC%d', d, d, d) AS deep,
       printf('A%d B C%d', d, d)          AS visible,
       (d % 3 = 0)                        AS nth,
       printf('C%d', d)                   AS last_p
FROM ids
"""

SEL_ORACLES = {
    "xpath_axes": XPATH_AXES,
    "css_select": CSS_SELECT,
    "parse_html_extract": PARSE_HTML_EXTRACT,
    "node_functions": NODE_FUNCTIONS,
}
