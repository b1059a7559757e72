"""DuckDB oracle SQL for the query catalog.

One entry per hash-checkable catalog query (the driver runs these
verbatim against the same parquet tables registered as DuckDB views and
compares row count, column names, and an order-insensitive value hash
with the Spark result).  Kept separate from the query definitions so
`plans/catalog.py` stays readable; `@query(name)` looks the SQL up here
by name.  Queries absent from this dict get the driver's rows-only
check (sampling RNG, engine-specific hashes, heuristics, mapInPandas).
"""

from __future__ import annotations

ORACLE_SQL: dict[str, str] = {
    'sliding_count_16': r'''
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id FROM events
)
SELECT rank, event_id,
       COUNT(*) OVER (ORDER BY rank ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS cnt
FROM base
''',
    'sliding_avg_79_scalable': r'''
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT rank, event_id,
       CAST(SUM(value_u) OVER w AS DOUBLE) / COUNT(value_u) OVER w AS avg_u
FROM base
WINDOW w AS (ORDER BY rank ROWS BETWEEN 78 PRECEDING AND CURRENT ROW)
''',
    'total_sort_events': r'''SELECT event_id, user_id, event_type FROM events ORDER BY ts, event_id''',
    'equi_depth_borders_events': r'''
WITH v AS (SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS value_u FROM events),
ranked AS (
  SELECT value_u AS border, row_number() OVER (ORDER BY value_u) AS rn,
         count(*) OVER () AS n
  FROM v
)
SELECT CAST(i AS BIGINT) AS border_idx, border
FROM ranked, generate_series(1, 7) t(i)
WHERE rn = greatest(CAST(floor(i * n / 8.0) AS BIGINT), 1)
''',
    'top_customers_by_revenue': r'''
SELECT c_custkey, c_name, CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_c DESC, c_custkey
LIMIT 10
''',
    'group_rollup_lineitem': r'''
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
''',
    'group_cube_orders': r'''
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c, count(*) AS n_rows
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
''',
    'distinct_agg_lineitem': r'''
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
''',
    'semi_join_parts': r'''SELECT p_partkey, p_name FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)''',
    'anti_join_customers': r'''SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)''',
    'set_ops_custkeys': r'''
SELECT 'both' AS tag, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
UNION ALL
SELECT 'only_big' AS tag, custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
''',
    'window_analytics_orders': r'''
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS seq,
       date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS gap_days,
       CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_total_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
''',
    'scalar_functions_part': r'''
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_pfx,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_slug,
       p_size * 2 AS size2,
       CAST(floor(abs(p_retailprice) * 100.0) AS BIGINT) AS price_c,
       p_partkey % 7 AS key_mod
FROM part
''',
    'date_functions_orders': r'''
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(day(o_orderdate) AS BIGINT) AS o_day,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
''',
    'asof_join_purchases': r'''
SELECT p.event_id, p.user_id, epoch_us(c.ts) AS last_click_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
''',
    'q6_forecast_revenue': r'''
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
''',
    'q4_order_priority_exists': r'''
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
)
GROUP BY o_orderpriority
''',
    'q13_customer_distribution': r'''
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
''',
    'q14_promo_revenue': r'''
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rev_c, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_rev_c,
       CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
       CAST(floor(1000.0 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) / SUM(rev_c)) AS BIGINT) AS promo_permille
FROM j
''',
    'q17_small_quantity_revenue': r'''
WITH pa AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
              JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#21'
  AND 5 * CAST(floor(l_quantity * 100.0) AS BIGINT) * cnt < sum_qty_c
''',
    'q18_large_volume_customers': r'''
SELECT c_custkey, o_orderkey, sum_qty_c
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) > 30000
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY sum_qty_c DESC, o_orderkey
LIMIT 20
''',
    'q19_disjunctive_predicates': r'''
SELECT CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
''',
    'q22_dormant_customers': r'''
WITH pos AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS n_cust,
       CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS total_bal_c
FROM customer, pos
WHERE CAST(floor(c_acctbal * 100.0) AS BIGINT) * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
  )
GROUP BY c_nationkey
''',
    'sessionize_events_batch': r'''
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts_us, value_u,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > 900000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us, value_u,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
       min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us,
       CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM sess GROUP BY user_id, sess_id
''',
    'token_histogram_documents': r'''
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents
)
SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY n DESC, tok LIMIT 50
''',
    'top_parts_per_brand': r'''
SELECT p_brand, p_partkey, price_c, rnk FROM (
  SELECT p_brand, p_partkey,
         CAST(floor(p_retailprice * 100.0) AS BIGINT) AS price_c,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
  FROM part
) WHERE rnk <= 3
''',
    'quantiles_quantity_by_flag': r'''
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.25) * 10.0) AS BIGINT) AS p25_cd,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.5) * 10.0) AS BIGINT) AS p50_cd,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.9) * 10.0) AS BIGINT) AS p90_cd
FROM lineitem GROUP BY l_returnflag
''',
    'pandas_udf_norm_embeddings': r'''
SELECT vec_id,
       CAST(list_aggregate(
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000.0) AS BIGINT) * CAST(floor(x * 1000.0) AS BIGINT)),
         'sum') AS BIGINT) AS sq_norm_milli
FROM embeddings
''',
    'range_join_event_slices': r'''
WITH v AS (
  SELECT epoch_us(ts) AS ts_us, CAST(floor(value * 1000000.0) AS BIGINT) AS value_u FROM events
),
ranked AS (
  SELECT ts_us, row_number() OVER (ORDER BY ts_us) AS rn, count(*) OVER () AS n FROM v
),
borders AS (
  SELECT CAST(i AS BIGINT) AS border_idx, ts_us AS border
  FROM ranked, generate_series(1, 7) t(i)
  WHERE rn = greatest(CAST(floor(i * n / 8.0) AS BIGINT), 1)
),
pts AS (
  SELECT CAST(0 AS BIGINT) AS border_idx, min(ts_us) - 1 AS border FROM v
  UNION ALL SELECT border_idx, border FROM borders
  UNION ALL SELECT CAST(8 AS BIGINT), max(ts_us) FROM v
),
iv AS (
  SELECT border_idx AS slice_id, border AS lo,
         lead(border) OVER (ORDER BY border_idx) AS hi
  FROM pts QUALIFY lead(border) OVER (ORDER BY border_idx) IS NOT NULL
)
SELECT slice_id, count(*) AS n_events, CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM v JOIN iv ON v.ts_us > iv.lo AND v.ts_us <= iv.hi
GROUP BY slice_id
''',
    'time_bucket_rollup_events': r'''
WITH v AS (
  SELECT CAST(floor(epoch_us(ts) / 21600000000) * 21600000000 AS BIGINT) AS bucket_6h_us,
         CAST(floor(epoch_us(ts) / 86400000000) * 86400000000 AS BIGINT) AS bucket_1d_us,
         event_type,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT bucket_6h_us, bucket_1d_us, event_type,
       count(*) AS n_events, CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM v
GROUP BY GROUPING SETS ((bucket_6h_us, event_type), (bucket_1d_us, event_type))
''',
    'dedup_exact_documents': r'''SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text''',
    'dedup_fingerprint_documents': r'''
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
''',
    'knn_cosine_top5': r'''
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rnk FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 5
''',
    'embedding_stats_by_label': r'''
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e0_u
FROM embeddings GROUP BY label
''',
    'doc_stats_documents': r'''
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
       CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','that','for'], tk))) AS BIGINT) AS n_stopwords,
       CAST(floor(1000.0 * len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','that','for'], tk))) / len(toks)) AS BIGINT) AS stopword_permille,
       CAST(floor(1000.0 * len(list_distinct(toks)) / len(toks)) AS BIGINT) AS uniq_permille
FROM t
''',
    'token_count_by_lang': r'''
SELECT lang, count(*) AS n_docs,
       CAST(SUM(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
''',
    'grouping_sets_lineitem': r'''
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
''',
    'pivot_priority_by_status': r'''
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_f_c,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_o_c,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_p_c
FROM orders GROUP BY o_orderpriority
''',
    'cosine_near_dup_pairs': r'''
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
''',
    'array_functions_embeddings': r'''
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS e0_u,
       CAST(floor(CAST(embedding[64] AS DOUBLE) * 1000000.0) AS BIGINT) AS e63_u,
       CAST(floor(CAST(list_aggregate(embedding::DOUBLE[], 'sum') AS DOUBLE) * 1000.0) AS BIGINT) AS sum_milli
FROM embeddings
''',
    'curation_pipeline': r'''
WITH stats AS (
  SELECT doc_id, lang,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_uniq
  FROM documents
),
deduped AS (
  SELECT * FROM stats
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
),
kept AS (
  SELECT * FROM deduped
  WHERE n_tokens >= 20 AND floor(1000.0 * n_uniq / n_tokens) >= 300
)
SELECT lang, count(*) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens_kept
FROM kept GROUP BY lang
''',
    'redact_pii_documents': r'''
WITH salted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or 555-01' || lpad(CAST(doc_id AS VARCHAR), 2, '0') || '.' AS t
  FROM documents
),
counted AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM salted
)
SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '[0-9]{3}[-.][0-9]{3,4}[-.]?[0-9]{0,4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(t1, '[0-9]{3}[-.][0-9]{3,4}[-.]?[0-9]{0,4}', '<PHONE>', 'g')) AS redacted_md5
FROM counted
''',
    'repetition_stats_documents': r'''
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id, unnest(ts) AS tk, unnest(range(len(ts))) AS i FROM tok),
uni AS (SELECT doc_id, tk AS g, count(*) AS c FROM flat WHERE tk <> '' GROUP BY 1, 2),
u AS (
  SELECT doc_id, CAST(floor(1000.0 * max(c) / sum(c)) AS BIGINT) AS top_token_permille
  FROM uni GROUP BY doc_id
),
bflat AS (
  SELECT doc_id, tk || ' ' || lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY i) AS g
  FROM flat QUALIFY lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
),
bic AS (SELECT doc_id, g, count(*) AS c FROM bflat GROUP BY 1, 2),
b AS (
  SELECT doc_id, CAST(floor(1000.0 * max(c) / sum(c)) AS BIGINT) AS top_bigram_permille
  FROM bic GROUP BY doc_id
)
SELECT u.doc_id, u.top_token_permille,
       COALESCE(b.top_bigram_permille, 0) AS top_bigram_permille
FROM u LEFT JOIN b ON u.doc_id = b.doc_id
''',
    'tf_df_top_terms_documents': r'''
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id AS doc, unnest(ts) AS term FROM tok),
tf AS (SELECT doc, term, count(*) AS tf FROM flat WHERE term <> '' GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc, tf.term, CAST(floor(1000000.0 * tf / df) AS BIGINT) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT doc AS doc_id, term, score,
       CAST(row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 3
''',
    'unpivot_priority_metrics': r'''
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_f_c,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_o_c,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_p_c
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, total_c
FROM wide
UNPIVOT (total_c FOR status IN (total_f_c, total_o_c, total_p_c))
''',
    'pack_documents_2k': r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), p AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // 2048 AS BIGINT) AS first_pack,
       CAST(CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 2048
            ELSE start_offset // 2048 END AS BIGINT) AS last_pack,
       CAST((CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 2048
             ELSE start_offset // 2048 END) - (start_offset // 2048) + 1 AS BIGINT) AS n_packs_spanned
FROM p
""",
    'deterministic_shuffle_documents': r"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS shuffle_rank
FROM documents
""",
}
