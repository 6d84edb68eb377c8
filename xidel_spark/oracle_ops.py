"""DuckDB oracle SQL for the training-data ops (queries_ops.py)."""

from __future__ import annotations

K = 8
BANDS = 4

_SIG_COLS = ",\n       ".join(
    f"list_min(list_transform(s, x -> md5('{j}|' || x))) AS sig_{j}" for j in range(K)
)

MINHASH_CTES = f"""toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS s
  FROM toks
),
sig AS (
  SELECT doc_id,
       {_SIG_COLS}
  FROM sh
)"""

_BANDS_SQL = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, md5(sig_{2*b} || '|' || sig_{2*b+1}) AS bucket FROM sig"
    for b in range(BANDS)
)

BUCKETS_CTE = f"""buckets AS (
{_BANDS_SQL}
)"""

PAIRS_CTE = """pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

DEDUP_EXACT = """
SELECT md5(text) AS content_hash,
       min(doc_id)::BIGINT AS canonical_id,
       count(*)::BIGINT AS n_dupes
FROM documents GROUP BY md5(text)
"""

DEDUP_MINHASH_SIG = f"""
WITH {MINHASH_CTES}
SELECT * FROM sig
"""

DEDUP_MINHASH_LSH_PAIRS = f"""
WITH {MINHASH_CTES},
{BUCKETS_CTE},
{PAIRS_CTE}
SELECT id_a, id_b FROM pairs
"""

NGRAM_JACCARD = f"""
WITH {MINHASH_CTES},
{BUCKETS_CTE},
{PAIRS_CTE},
dsh AS (
  SELECT doc_id, list_distinct(s) AS s FROM sh
)
SELECT p.id_a, p.id_b,
       floor(len(list_filter(a.s, x -> list_contains(b.s, x)))
             / greatest(len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))), 1) * 10000 + 0.5) / 10000 AS jaccard
FROM pairs p
JOIN dsh a ON a.doc_id = p.id_a
JOIN dsh b ON b.doc_id = p.id_b
"""

_SIM_B = "\n       ".join(
    f"sum(CASE WHEN substr(h, {i+1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS b{i},"
    for i in range(16)
)
_SIM_SUM = " + ".join(f"(CASE WHEN b{i} * 2 > n THEN {1 << i} ELSE 0 END)" for i in range(16))

DEDUP_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok
  FROM documents
),
h AS (SELECT doc_id, md5(tok) AS h FROM toks),
c AS (
  SELECT doc_id,
       {_SIM_B}
       count(*) AS n
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({_SIM_SUM} AS INT) AS simhash FROM c
"""

ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         floor(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) * 1000 + 0.5) / 1000 AS sim
  FROM q JOIN embeddings c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
  FROM scored
)
SELECT * FROM ranked WHERE rnk <= 5
"""

# ANN recall@1 on the planted-twin corpus: the exact top-1 (the twin) is
# what the LSH path must retrieve — this verifies its ranking without
# needing xxhash64 in SQL (see queries_ops.q_ann_topk_lsh)
ANN_TOPK_LSH = """
WITH base AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings),
twins AS (
  SELECT vec_id + (SELECT count(*) FROM base) AS vec_id,
         list_transform(e, (x, j) -> x * (1 + 0.01 * ((vec_id + j - 1) % 3 - 1))) AS e
  FROM base WHERE vec_id % 5 = 0
),
planted AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
q AS (SELECT vec_id AS query_id, e AS qv FROM planted WHERE vec_id % 5 = 0 AND vec_id < 80),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         floor(list_cosine_similarity(q.qv, c.e) * 1000 + 0.5) / 1000 AS sim
  FROM q JOIN planted c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
  FROM scored
)
SELECT * FROM ranked WHERE rnk <= 1
"""

_STOP = {
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu)\b",
    "en": r"\b(the|and|of|to|is|in|that|it)\b",
    "es": r"\b(el|la|los|que|de|es|un|una)\b",
    "fr": r"\b(le|la|les|et|est|une|que|des)\b",
}

_LANG_STRUCTS = ", ".join(
    f"{{'neg_hits': -len(regexp_extract_all(lower(text), '{pat}')), 'lang': '{lang}'}}"
    for lang, pat in sorted(_STOP.items())
)

LANG_ID = f"""
SELECT doc_id::BIGINT AS doc_id,
       list_min([{_LANG_STRUCTS}]).lang AS lang_pred
FROM documents
"""

QUALITY_SCORE = f"""
WITH f AS (
  SELECT doc_id::BIGINT AS doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
         len(regexp_extract_all(lower(text), '{_STOP["en"]}')) AS stops
  FROM documents
),
r AS (
  SELECT doc_id, n_chars, n_tokens,
         floor(punct / greatest(n_chars, 1) * 10000 + 0.5) / 10000 AS punct_ratio,
         floor(stops / greatest(n_tokens, 1) * 10000 + 0.5) / 10000 AS stop_ratio
  FROM f
)
SELECT doc_id, CAST(n_chars AS INT) AS n_chars, CAST(n_tokens AS INT) AS n_tokens,
       punct_ratio, stop_ratio,
       floor((least(n_tokens / 100.0, 1.0) * 0.5
             + least(stop_ratio * 5, 1.0) * 0.3
             + (1 - least(punct_ratio * 10, 1.0)) * 0.2) * 10000 + 0.5) / 10000 AS quality
FROM r
"""

TOKEN_STATS = """
SELECT doc_id::BIGINT AS doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens
FROM documents
"""

DOC_FINGERPRINT = f"""
WITH {MINHASH_CTES}
SELECT sh.doc_id,
       coalesce(list_min(list_transform(sh.s, x -> md5(x))), md5(d.text)) AS fingerprint
FROM sh JOIN documents d ON d.doc_id = sh.doc_id
"""

TEXT_STATS = f"""
WITH {MINHASH_CTES},
lang AS (
  SELECT doc_id::BIGINT AS doc_id,
         list_min([{_LANG_STRUCTS}]).lang AS lang_pred
  FROM documents
),
f AS (
  SELECT doc_id::BIGINT AS doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
         len(regexp_extract_all(lower(text), '{_STOP["en"]}')) AS stops,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_chars, n_tokens, bpe_tokens,
         floor(punct / greatest(n_chars, 1) * 10000 + 0.5) / 10000 AS punct_ratio,
         floor(stops / greatest(n_tokens, 1) * 10000 + 0.5) / 10000 AS stop_ratio
  FROM f
),
fp AS (
  SELECT sh.doc_id,
         coalesce(list_min(list_transform(sh.s, x -> md5(x))), md5(d.text)) AS fingerprint
  FROM sh JOIN documents d ON d.doc_id = sh.doc_id
)
SELECT r.doc_id, lang.lang_pred,
       CAST(r.n_chars AS INT) AS n_chars, CAST(r.n_tokens AS INT) AS n_tokens,
       r.punct_ratio, r.stop_ratio,
       floor((least(r.n_tokens / 100.0, 1.0) * 0.5
             + least(r.stop_ratio * 5, 1.0) * 0.3
             + (1 - least(r.punct_ratio * 10, 1.0)) * 0.2) * 10000 + 0.5) / 10000 AS quality,
       CAST(r.n_tokens AS INT) AS ws_tokens, r.bpe_tokens, fp.fingerprint
FROM r JOIN lang ON lang.doc_id = r.doc_id JOIN fp ON fp.doc_id = r.doc_id
"""

DEDUP_PARAGRAPH = """
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
  FROM documents
),
p AS (
  SELECT doc_id,
         CASE WHEN len(w) = 0 THEN []
              ELSE list_transform(range(0, CAST(ceil(len(w) / 4.0) AS BIGINT)),
                                  i -> array_to_string(w[i*4+1:i*4+4], ' '))
         END AS parts
  FROM toks
),
d AS (
  SELECT doc_id, parts,
         list_filter(parts, (x, i) -> list_position(parts, x) = i) AS kept
  FROM p
)
SELECT doc_id, CAST(len(parts) AS INT) AS n_parts,
       CAST(len(kept) AS INT) AS n_unique,
       floor((1 - len(kept) / greatest(len(parts), 1)) * 10000 + 0.5) / 10000 AS dup_ratio,
       md5(array_to_string(kept, chr(10))) AS kept_md5
FROM d
"""

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b555-\d{4}\b"

PII_SCRUB = f"""
WITH inj AS (
  SELECT doc_id::BIGINT AS doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN printf(' contact user%d@example.com', doc_id % 97)
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN printf(' from 10.0.%d.%d', doc_id % 256, doc_id % 100)
                 ELSE '' END
         || printf(' call 555-0%03d', doc_id % 1000)
         || CASE WHEN doc_id % 5 = 0
                 THEN printf(' cc admin%d@example.org', doc_id % 89)
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_IPV4_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_IPV4_RE}', '[IP]', 'g'),
             '{_PHONE_RE}', '[PHONE]', 'g')) AS scrubbed_md5
FROM inj
"""

CONTAMINATION_NGRAM = f"""
WITH {MINHASH_CTES},
dsh AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
bench AS (
  SELECT DISTINCT unnest(ds) AS ngram FROM dsh WHERE doc_id % 50 = 0
),
expl AS (SELECT doc_id, unnest(ds) AS ngram FROM dsh),
hits AS (
  SELECT e.doc_id, count(*) AS h
  FROM expl e JOIN bench b ON e.ngram = b.ngram
  GROUP BY e.doc_id
)
SELECT d.doc_id, CAST(len(d.ds) AS INT) AS n_shingles,
       CAST(coalesce(h.h, 0) AS INT) AS n_contaminated,
       coalesce(h.h, 0) > 0 AS is_contaminated
FROM dsh d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""

OPS_ORACLES = {
    "dedup_exact": DEDUP_EXACT,
    "dedup_minhash_sig": DEDUP_MINHASH_SIG,
    "dedup_minhash_lsh_pairs": DEDUP_MINHASH_LSH_PAIRS,
    "ngram_jaccard": NGRAM_JACCARD,
    "dedup_paragraph": DEDUP_PARAGRAPH,
    "dedup_simhash": DEDUP_SIMHASH,
    "ann_cosine_topk": ANN_COSINE_TOPK,
    "ann_topk_lsh": ANN_TOPK_LSH,
    "text_stats": TEXT_STATS,
    "pii_scrub": PII_SCRUB,
    "contamination_ngram": CONTAMINATION_NGRAM,
}
