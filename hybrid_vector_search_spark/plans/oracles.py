"""DuckDB oracle SQL for the pipeline suite (plans/pipeline.py).

Every statement mirrors the corresponding Spark operator definition EXACTLY —
same tokenizer regex, same md5-based hash family, same rounding, same
floating-point expression shapes — so the driver's order-insensitive
value-hash comparison passes bit-for-bit. Generated programmatically where
the operator is parameterized (MinHash seeds, SimHash bits) to keep the two
sides structurally locked together.
"""

from __future__ import annotations

from ..operators.pii import REDACTION_RULES
from ..operators.textstats import MIN_LANG_RATIO, STOPWORDS

# ---------------------------------------------------------------- shared CTEs

# functions.text.tokens: lower, split on non-alphanumeric runs, drop empties
TOKL = (
    "tokl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
    r"'[^\p{L}\p{N}]+'), t -> t <> '') AS ts FROM documents)"
)

# operators.dedup.shingle_table: distinct word 3-gram md5 per doc
SHINGLES3 = (
    "sh AS (SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM ("
    "SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ') "
    "FOR i IN range(1, len(ts) - 1)]) AS g FROM tokl WHERE len(ts) >= 3))"
)

# operators.dedup.jaccard_pairs: inverted-index exact jaccard
JACCARD = (
    "sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id), "
    "inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i FROM sh a "
    "JOIN sh b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2), "
    "jac AS (SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i)::DOUBLE AS jaccard "
    "FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b)"
)

NORM_TEXT = r"trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'))"


def _minhash_ctes(bands: int, rows_per_band: int) -> str:
    h = bands * rows_per_band
    sig_cols = ", ".join(f"min(md5('{i}#' || sh)) AS sig_{i}" for i in range(h))
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({key}) AS key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return (
        f"sigs AS (SELECT id, {sig_cols} FROM sh GROUP BY id), "
        f"banded AS ({band_rows}), "
        "cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM banded a "
        "JOIN banded b ON a.band = b.band AND a.key = b.key AND a.id < b.id)"
    )


def _source_minhash_sql(num_hashes: int) -> str:
    """pipeline.source_minhash_similarity: per-source signature = min per
    slot of the chunked md5 family (dedup.MINHASH_SLOTS_PER_MD5 — slot 4k+j
    is hex chunk j of md5('k#'||gram)) over each source's exploded shingles
    (per-doc distinct is irrelevant to a min); estimate = agreeing-slot
    fraction, an exact multiple of 1/num_hashes so round(·,6) is the
    identity in both engines. All arithmetic is exact BIGINT."""
    from ..operators.dedup import MINHASH_SLOTS_PER_MD5 as S

    sig_cols = ", ".join(
        f"min(('0x' || substr(md5('{i // S}#' || gram), {8 * (i % S) + 1}, 8))::BIGINT)"
        f" AS sig_{i}"
        for i in range(num_hashes)
    )
    agree = " + ".join(f"(a.sig_{i} = b.sig_{i})::INT" for i in range(num_hashes))
    return f"""
WITH {TOKL},
grams AS (
  SELECT d.source AS g, u.g AS gram
  FROM (
    SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
    FOR i IN range(1, len(ts) - 1)]) AS g FROM tokl WHERE len(ts) >= 3
  ) u JOIN documents d USING (doc_id)
),
sigs AS (SELECT g, {sig_cols} FROM grams GROUP BY g)
SELECT a.g AS src_a, b.g AS src_b,
       ({agree})::INT AS n_agree,
       round(({agree})::DOUBLE / {num_hashes}, 6) AS est_jaccard
FROM sigs a JOIN sigs b ON a.g < b.g
ORDER BY src_a, src_b
"""


SOURCE_MINHASH_SIMILARITY = _source_minhash_sql(32)


# pipeline.embedding_centroid_outliers: centroid components are exact decimal
# sums of 7-dp-rounded values over lateral range(1, dim+1) — same arithmetic
# as Spark's posexplode + decimal aggregate — and the cosine mirrors _COS_AB's
# double-fold shape at 6-dp rounding; vec_id breaks rank ties identically
EMBEDDING_CENTROID_OUTLIERS = """
WITH p AS (
  SELECT label, idx, round(val::DOUBLE, 7)::DECIMAL(20,7) AS val FROM (
    SELECT label, generate_subscripts(embedding, 1) AS idx,
           unnest(embedding) AS val
    FROM embeddings
  )
),
cent AS (
  SELECT label, idx, sum(val)::DOUBLE / count(*) AS c
  FROM p GROUP BY label, idx
),
carr AS (SELECT label, list(c ORDER BY idx) AS cv FROM cent GROUP BY label),
s AS (
  SELECT e.vec_id, e.label,
         round(
           list_dot_product(e.embedding::DOUBLE[], cv) /
           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
            * sqrt(list_dot_product(cv, cv))), 6) AS cos_centroid
  FROM embeddings e JOIN carr USING (label)
)
SELECT vec_id, label, cos_centroid FROM (
  SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos_centroid, vec_id) AS rn
  FROM s
) WHERE rn <= 5
ORDER BY label, cos_centroid, vec_id
"""


# textstats.source_token_divergence: exact count ratios, double log-sum,
# 6-dp rounding — the LM scorers' engine-parity recipe
SOURCE_TOKEN_KL = f"""
WITH {TOKL},
toks AS (
  SELECT d.source AS g, u.tok FROM (
    SELECT doc_id, unnest(ts) AS tok FROM tokl
  ) u JOIN documents d USING (doc_id)
),
gt AS (SELECT g, tok, count(*) AS c FROM toks GROUP BY g, tok),
g_tot AS (SELECT g, sum(c) AS n_g FROM gt GROUP BY g),
corp AS (SELECT tok, sum(c) AS c_t FROM gt GROUP BY tok),
n_total AS (SELECT sum(c_t) AS n_total FROM corp)
SELECT g AS source,
       any_value(n_g)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_vocab,
       round(sum((c::DOUBLE / n_g) * ln((c::DOUBLE / n_g) / (c_t::DOUBLE / n_total))), 6)
         AS kl_divergence
FROM gt
JOIN corp USING (tok)
JOIN g_tot USING (g)
CROSS JOIN n_total
GROUP BY g
ORDER BY source
"""


# textstats.source_token_js: group vs rest-of-corpus Jensen-Shannon with
# the absent-token Q-side mass telescoped to ln2·(1 − Σ q_t) — exact count
# ratios, double log-sum, 6-dp rounding (the KL recipe)
SOURCE_TOKEN_JS = f"""
WITH {TOKL},
toks AS (
  SELECT d.source AS g, u.tok FROM (
    SELECT doc_id, unnest(ts) AS tok FROM tokl
  ) u JOIN documents d USING (doc_id)
),
gt AS (SELECT g, tok, count(*) AS c FROM toks GROUP BY g, tok),
g_tot AS (SELECT g, sum(c) AS n_g FROM gt GROUP BY g),
corp AS (SELECT tok, sum(c) AS c_t FROM gt GROUP BY tok),
n_total AS (SELECT sum(c_t) AS n_total FROM corp),
terms AS (
  SELECT g, n_g,
         (c::DOUBLE / n_g) AS p,
         ((c_t - c)::DOUBLE / (n_total - n_g)) AS q,
         ((c::DOUBLE / n_g) + ((c_t - c)::DOUBLE / (n_total - n_g))) / 2.0 AS m,
         c_t > c AS has_rest
  FROM gt JOIN corp USING (tok) JOIN g_tot USING (g) CROSS JOIN n_total
)
SELECT g AS source,
       any_value(n_g)::BIGINT AS n_tokens,
       round(0.5 * sum(p * ln(p / m))
             + 0.5 * (sum(CASE WHEN has_rest THEN q * ln(q / m) ELSE 0.0 END)
                      + ln(2.0) * (1.0 - sum(q))), 6) AS js_divergence
FROM terms GROUP BY g ORDER BY source
"""


# pipeline.embedding_drift: same decimal-exact centroid + sequential-fold
# cosine recipe as EMBEDDING_CENTROID_OUTLIERS, split on vec_id parity
EMBEDDING_DRIFT = """
WITH p AS (
  SELECT (vec_id % 2 = 0) AS is_ref, label, idx,
         round(val::DOUBLE, 7)::DECIMAL(20,7) AS val FROM (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS idx,
           unnest(embedding) AS val
    FROM embeddings
  )
),
cent AS (
  SELECT is_ref, label, idx, sum(val)::DOUBLE / count(*) AS c
  FROM p GROUP BY is_ref, label, idx
),
carr AS (
  SELECT is_ref, label, list(c ORDER BY idx) AS cv
  FROM cent GROUP BY is_ref, label
),
counts AS (
  SELECT label,
         sum((vec_id % 2 = 0)::INT)::BIGINT AS n_ref,
         sum((vec_id % 2 <> 0)::INT)::BIGINT AS n_cur
  FROM embeddings GROUP BY label
)
SELECT r.label, counts.n_ref, counts.n_cur,
       round(
         list_dot_product(r.cv, c.cv) /
         (sqrt(list_dot_product(r.cv, r.cv)) * sqrt(list_dot_product(c.cv, c.cv))),
         6) AS centroid_cos
FROM carr r
JOIN carr c ON c.label = r.label AND NOT c.is_ref
JOIN counts ON counts.label = r.label
WHERE r.is_ref
ORDER BY r.label
"""


# textstats.oov_rate: top-1000-by-(df desc, tok asc) vocabulary, left-join
# scoring; token-less docs kept with rate 0.0 (explode_outer ↔ LEFT JOIN)
OOV_RATE_STATS = f"""
WITH {TOKL},
toks AS (SELECT doc_id AS id, unnest(ts) AS tok FROM tokl),
dfreq AS (SELECT tok, count(DISTINCT id) AS df FROM toks GROUP BY tok),
vocab AS (SELECT tok FROM dfreq ORDER BY df DESC, tok LIMIT 1000),
per AS (
  SELECT id, count(*) AS n_tokens,
         count(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov
  FROM toks LEFT JOIN vocab v USING (tok)
  GROUP BY id
)
SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(p.n_oov, 0)::BIGINT AS n_oov,
       CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
            ELSE round(p.n_oov::DOUBLE / p.n_tokens, 6) END AS oov_rate
FROM documents d LEFT JOIN per p ON p.id = d.doc_id
ORDER BY d.doc_id
"""


# pipeline.url_domain_stats / operators.urls: identical regex sequence with
# the 'g' flag (Spark regexp_replace is global by default); registrable
# domain = last 2 labels, 3 for the co.uk family
URL_DOMAIN_STATS = r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text
           || ' see https://WWW.Example' || (doc_id % 3)::VARCHAR
           || '.COM/page/' || doc_id::VARCHAR
           || '?utm_source=x&id=' || doc_id::VARCHAR
           || '&utm_medium=y#frag and http://blog.example' || (doc_id % 3)::VARCHAR
           || '.co.uk/post-' || doc_id::VARCHAR || '/'
         ELSE text END AS text
  FROM documents
),
u AS (
  SELECT doc_id AS id,
         unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]*[A-Za-z0-9](?:/[^\s]*)?')) AS url
  FROM planted
),
e AS (
  SELECT id, url,
         lower(regexp_extract(url, 'https?://([A-Za-z0-9.-]*[A-Za-z0-9])', 1)) AS host,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           'https://' || lower(regexp_extract(url, 'https?://([A-Za-z0-9.-]*[A-Za-z0-9])', 1))
             || regexp_extract(url, 'https?://[A-Za-z0-9.-]*[A-Za-z0-9](/[^\s]*)?', 1),
           '#[^\s]*', '', 'g'),
           '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
           '[?&]$', '', 'g'),
           '/$', '', 'g') AS norm_url
  FROM u
),
dom AS (
  SELECT id, norm_url,
         CASE
           WHEN len(string_split(host, '.')) <= 2 THEN host
           WHEN array_to_string(string_split(host, '.')[len(string_split(host, '.'))-1:], '.')
                IN ('co.uk', 'com.au', 'co.jp', 'co.in', 'com.br')
                AND len(string_split(host, '.')) >= 3
           THEN array_to_string(string_split(host, '.')[len(string_split(host, '.'))-2:], '.')
           ELSE array_to_string(string_split(host, '.')[len(string_split(host, '.'))-1:], '.')
         END AS domain
  FROM e
)
SELECT domain,
       count(*)::BIGINT AS n_urls,
       count(DISTINCT id)::BIGINT AS n_docs,
       count(DISTINCT norm_url)::BIGINT AS n_distinct_urls
FROM dom
GROUP BY domain
ORDER BY domain
"""


# sampling.stratified_sample_exact: md5('#'||key) rank order, key tiebreak
STRATIFIED_EXACT_K = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('#' || doc_id::VARCHAR), doc_id) AS rk
  FROM documents
) WHERE rk <= 10
ORDER BY lang, doc_id
"""


# pipeline.user_purge_counts: the anti-join is NOT IN the deletion list
USER_PURGE_COUNTS = """
WITH purge AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
kept AS (
  -- NOT EXISTS, not NOT IN: Spark's LEFT ANTI keeps null-key rows, NOT IN
  -- drops every row when any null is involved — NOT EXISTS matches anti-join
  -- null semantics exactly (same policy as _DATA_QUALITY_ORACLE's FK check)
  SELECT event_type, count(*) AS n_kept
  FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM purge p WHERE p.user_id = e.user_id)
  GROUP BY event_type
),
total AS (SELECT event_type, count(*) AS n_total FROM events GROUP BY event_type)
SELECT t.event_type, t.n_total,
       coalesce(k.n_kept, 0) AS n_kept,
       t.n_total - coalesce(k.n_kept, 0) AS n_purged
FROM total t LEFT JOIN kept k USING (event_type)
ORDER BY t.event_type
"""


# dedup.sorted_neighborhood_pairs over the planted-dupes corpus: identical
# normalized-prefix key, first-char bucket, per-bucket rank, window-3
# candidates, exact-Jaccard verification — rank ties broken by doc_id in
# both engines, keys are [a-z0-9 ] so binary collation agrees
SORTED_NEIGHBORHOOD = rf"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
k AS (SELECT doc_id, substr({NORM_TEXT}, 1, 24) AS key,
             substr(reverse({NORM_TEXT}), 1, 24) AS key2 FROM u),
r1 AS (SELECT doc_id, row_number() OVER (PARTITION BY substr(key, 1, 1)
                                         ORDER BY key, doc_id) AS rn,
              substr(key, 1, 1) AS b
       FROM k),
r2 AS (SELECT doc_id, row_number() OVER (PARTITION BY substr(key2, 1, 1)
                                         ORDER BY key2, doc_id) AS rn,
              substr(key2, 1, 1) AS b
       FROM k),
cand AS (
  SELECT DISTINCT least(id_l, id_r) AS id_a, greatest(id_l, id_r) AS id_b
  FROM (
    SELECT a.doc_id AS id_l, b.doc_id AS id_r
    FROM r1 a JOIN r1 b ON a.b = b.b AND b.rn - a.rn BETWEEN 1 AND 3
    UNION ALL
    SELECT a.doc_id AS id_l, b.doc_id AS id_r
    FROM r2 a JOIN r2 b ON a.b = b.b AND b.rn - a.rn BETWEEN 1 AND 3
  )
),
tokl AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
         '[^\p{{L}}\p{{N}}]+'), t -> t <> '') AS ts FROM u),
sh AS (SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM (
  SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
  FOR i IN range(1, len(ts) - 1)]) AS g FROM tokl WHERE len(ts) >= 3)),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS i
          FROM cand c JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
          GROUP BY 1, 2),
jac AS (SELECT id_a, id_b,
               round(i::DOUBLE / (sa.sz + sb.sz - i)::DOUBLE, 6) AS jaccard
        FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b)
SELECT id_a AS doc_a, id_b AS doc_b, jaccard
FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
"""


DEDUP_EXACT = f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
h AS (SELECT doc_id, md5({NORM_TEXT}) AS content_hash FROM u)
SELECT doc_id, content_hash,
       doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_duplicate
FROM h
"""

# pipeline.blob_dedup_manifest: md5 over the raw utf-8 bytes (DuckDB's
# md5(VARCHAR) hashes the same bytes Spark's md5(encode(text,'utf-8')) does)
BLOB_DEDUP_MANIFEST = """
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
b AS (SELECT doc_id, md5(text) AS digest,
             octet_length(encode(text)) AS n_bytes FROM u)
SELECT digest, count(*) AS n_copies,
       max(n_bytes)::BIGINT AS blob_bytes,
       ((count(*) - 1) * max(n_bytes))::BIGINT AS saved_bytes,
       min(doc_id) AS keeper_id
FROM b
GROUP BY digest
HAVING count(*) > 1
ORDER BY digest
"""

DEDUP_MINHASH_LSH = f"""
WITH {TOKL},
{SHINGLES3},
{_minhash_ctes(bands=4, rows_per_band=2)},
{JACCARD}
SELECT id_a AS doc_a, id_b AS doc_b, round(jaccard, 6) AS jaccard
FROM jac
WHERE jaccard >= 0.7
  AND EXISTS (SELECT 1 FROM cands c WHERE c.id_a = jac.id_a AND c.id_b = jac.id_b)
"""

# dedup.edit_distance_near_dups: same candidate CTEs as the minhash oracle,
# precision phase replayed with DuckDB's exact levenshtein (Spark's
# thresholded variant returns the identical distance when within bound).
DEDUP_EDIT_DISTANCE = f"""
WITH {TOKL},
{SHINGLES3},
{_minhash_ctes(bands=4, rows_per_band=2)}
SELECT c.id_a AS doc_a, c.id_b AS doc_b,
       levenshtein(ta.text, tb.text)::INT AS edits
FROM cands c
JOIN documents ta ON ta.doc_id = c.id_a
JOIN documents tb ON tb.doc_id = c.id_b
WHERE levenshtein(ta.text, tb.text) <= 16
ORDER BY doc_a, doc_b
"""

DEDUP_SOURCE_MATRIX = f"""
WITH {TOKL},
{SHINGLES3},
{_minhash_ctes(bands=4, rows_per_band=2)},
{JACCARD},
verified AS (
  SELECT jac.id_a, jac.id_b FROM jac
  WHERE jaccard >= 0.7
    AND EXISTS (SELECT 1 FROM cands c
                WHERE c.id_a = jac.id_a AND c.id_b = jac.id_b)
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs
FROM verified v
JOIN documents da ON da.doc_id = v.id_a
JOIN documents db ON db.doc_id = v.id_b
GROUP BY 1, 2
ORDER BY source_a, source_b
"""

NGRAM_JACCARD = f"""
WITH {TOKL},
{SHINGLES3},
{JACCARD}
SELECT id_a AS doc_a, id_b AS doc_b, round(jaccard, 6) AS jaccard
FROM jac
WHERE jaccard >= 0.5
"""


SHINGLES5 = (
    "sh5 AS (SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM ("
    "SELECT doc_id, unnest([array_to_string(ts[i:i+4], ' ') "
    "FOR i IN range(1, len(ts) - 3)]) AS g FROM tokl WHERE len(ts) >= 5))"
)

DOC_REPETITION = f"""
WITH {TOKL},
g AS (
  SELECT doc_id,
         CASE WHEN len(ts) >= 3
              THEN [array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts) - 1)]
              ELSE [] END AS grams
  FROM tokl
)
SELECT doc_id, len(grams)::INT AS n_grams,
       len(list_distinct(grams))::INT AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN round((len(grams) - len(list_distinct(grams)))::DOUBLE
                       / len(grams)::DOUBLE, 6)
            ELSE 0.0 END AS rep_ratio
FROM g ORDER BY doc_id
"""

UNIGRAM_LOGPROB = f"""
WITH {TOKL},
toks AS (SELECT doc_id AS id, unnest(ts) AS tok FROM tokl),
freq AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
n AS (SELECT sum(cnt)::BIGINT AS n_total FROM freq),
lm AS (SELECT tok, -ln(cnt::DOUBLE / n_total::DOUBLE) AS neg_logp FROM freq, n)
SELECT id AS doc_id, round(avg(neg_logp), 6) AS mean_neg_logp,
       count(*)::BIGINT AS n_tokens
FROM toks JOIN lm USING (tok)
GROUP BY id ORDER BY doc_id
"""

MULTIMODAL_BINARY = """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5  -- VARCHAR md5 == md5 of its utf-8 bytes
FROM documents ORDER BY doc_id
"""

DECONTAMINATE = f"""
WITH {TOKL},
{SHINGLES5},
ev AS (SELECT DISTINCT sh FROM sh5 WHERE id < 100),
corpus AS (SELECT id, sh FROM sh5 WHERE id >= 100)
SELECT id AS doc_id, count(*)::BIGINT AS n_shared
FROM corpus JOIN ev USING (sh)
GROUP BY id ORDER BY doc_id
"""

DEDUP_COMPONENTS = f"""
WITH RECURSIVE {TOKL},
{SHINGLES3},
{JACCARD},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5
  UNION
  SELECT id_b AS a, id_a AS b FROM jac WHERE jaccard >= 0.5
),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
)
SELECT n AS doc_id, min(m)::BIGINT AS component
FROM reach GROUP BY n ORDER BY doc_id
"""


# pipeline.dedup_cluster_sizes: the same recursive closure, rolled up twice
# (component -> size, size -> n_clusters)
DEDUP_CLUSTER_SIZES = f"""
WITH RECURSIVE {TOKL},
{SHINGLES3},
{JACCARD},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5
  UNION
  SELECT id_b AS a, id_a AS b FROM jac WHERE jaccard >= 0.5
),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
csizes AS (SELECT component, count(*)::BIGINT AS cluster_size FROM comp GROUP BY component)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM csizes GROUP BY cluster_size ORDER BY cluster_size
"""


def _simhash_sql(bits: int) -> str:
    votes = ", ".join(
        f"sum(tf * (2 * ((((instr('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1) >> {j % 4}) & 1)) - 1)) AS v_{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    return f"""
WITH {TOKL},
tok AS (SELECT doc_id AS id, unnest(ts) AS token FROM tokl),
tf AS (SELECT id, token, count(*)::BIGINT AS tf FROM tok GROUP BY id, token),
hh AS (SELECT id, tf, md5(token) AS h FROM tf),
votes AS (SELECT id, {votes} FROM hh GROUP BY id)
SELECT id AS doc_id, ({fp})::BIGINT AS simhash FROM votes
"""


DEDUP_SIMHASH = _simhash_sql(32)

_COS_AB = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)

DEDUP_EMBEDDING_COSINE = f"""
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({_COS_AB}, 6) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
WHERE cos >= 0.45
"""

TOKEN_STATS = f"""
WITH {TOKL},
ws AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ws
       FROM documents)
SELECT d.doc_id,
       len(ts)::BIGINT AS n_tokens,
       len(ws)::BIGINT AS n_ws_tokens,
       len(list_distinct(ts))::BIGINT AS n_distinct_tokens,
       coalesce(list_sum(list_transform(ts, t -> length(t))), 0)::BIGINT AS n_token_chars,
       round(coalesce(list_sum(list_transform(ts, t -> length(t))), 0)::DOUBLE
             / greatest(len(ts), 1), 6) AS mean_token_len
FROM documents d
JOIN tokl USING (doc_id)
JOIN ws USING (doc_id)
"""


# operators.textstats.bpe_token_stats: RE2-safe GPT-2-style pre-tokenizer —
# same regex string as textstats.BPE_PRETOKEN_RE, leftmost-first in both
# engines, over the lowercased text
BPE_TOKEN_STATS = r"""
WITH p AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+') AS ps
  FROM documents
)
SELECT doc_id,
       len(ps)::BIGINT AS n_pieces,
       len(list_distinct(ps))::BIGINT AS n_distinct_pieces,
       coalesce(list_sum(list_transform(ps, x -> length(x))), 0)::BIGINT AS n_piece_chars,
       round(coalesce(list_sum(list_transform(ps, x -> length(x))), 0)::DOUBLE
             / greatest(len(ps), 1), 6) AS mean_piece_len
FROM p ORDER BY doc_id
"""


# pipeline.token_fertility_by_lang: BPE pre-tokenizer pieces per
# whitespace word, rolled up by language
TOKEN_FERTILITY = r"""
WITH c AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))::BIGINT AS n_pieces,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_words
  FROM documents
)
SELECT lang,
       sum(n_pieces)::BIGINT AS bpe_tokens,
       sum(n_words)::BIGINT AS words,
       round(sum(n_pieces)::DOUBLE / greatest(sum(n_words), 1), 6) AS fertility
FROM c GROUP BY lang ORDER BY lang
"""


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _lang_sql() -> str:
    langs = sorted(STOPWORDS)
    ratios = ", ".join(
        f"round(len(list_intersect(dt, {_stop_list(lg)}))::DOUBLE / greatest(len(dt), 1), 6) AS ratio_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"ratio_{lg}" for lg in langs) + ")"
    case = f"CASE WHEN {best} < {MIN_LANG_RATIO} THEN 'und' "
    for lg in langs[:-1]:
        case += f"WHEN ratio_{lg} = {best} THEN '{lg}' "
    case += f"ELSE '{langs[-1]}' END"
    cols = ", ".join(f"ratio_{lg}" for lg in langs)
    return f"""
WITH {TOKL},
dtt AS (SELECT doc_id, list_distinct(ts) AS dt FROM tokl),
r AS (SELECT doc_id, {ratios} FROM dtt)
SELECT doc_id, {cols}, {case} AS pred_lang FROM r
"""


LANGUAGE_ID = _lang_sql()

QUALITY_SCORE = rf"""
WITH {TOKL},
m AS (
  SELECT d.doc_id,
         len(ts) AS n,
         len(list_distinct(ts)) AS nd,
         length(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}]', '', 'g'))::DOUBLE AS alnum,
         length(text) AS tlen,
         len(list_intersect(list_distinct(ts), {_stop_list("en")}))::DOUBLE
           / greatest(len(list_distinct(ts)), 1) AS stop_en
  FROM documents d JOIN tokl USING (doc_id)
)
SELECT doc_id,
       n::BIGINT AS n_tokens,
       round(nd::DOUBLE / greatest(n, 1), 6) AS ttr,
       round(alnum / greatest(tlen, 1), 6) AS alnum_ratio,
       round(least(n::DOUBLE / 50.0, 1.0)
             * (0.5 + 0.5 * (nd::DOUBLE / greatest(n, 1)))
             * (alnum / greatest(tlen, 1))
             * (0.8 + 0.2 * least(stop_en * 10.0, 1.0)), 6) AS quality
FROM m
"""

# plans.pipeline.quality_curriculum: exact interpolated quartile thresholds
# (quantile_cont == Spark percentile, parity pinned by value_percentiles)
# over the composite quality score, then a CASE bucket per doc. The score
# CTE is referenced twice (thresholds + bucketing) -> AS MATERIALIZED, or
# DuckDB re-expands it exponentially. Mean through DECIMAL(18,6): scores
# are pre-rounded to 6 dp so the decimal sum is exact on both engines.
QUALITY_CURRICULUM = f"""
WITH q AS MATERIALIZED ({QUALITY_SCORE}),
th AS (
  SELECT round(quantile_cont(quality, 0.25), 6) AS q1,
         round(quantile_cont(quality, 0.50), 6) AS q2,
         round(quantile_cont(quality, 0.75), 6) AS q3
  FROM q),
b AS (
  SELECT n_tokens, quality,
         CASE WHEN quality <= th.q1 THEN 1
              WHEN quality <= th.q2 THEN 2
              WHEN quality <= th.q3 THEN 3
              ELSE 4 END AS bucket
  FROM q CROSS JOIN th)
SELECT bucket,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS token_budget,
       round(sum(quality::DECIMAL(18,6))::DOUBLE / count(*), 6) AS mean_quality
FROM b
GROUP BY bucket
ORDER BY bucket
"""

# operators.skyline.pareto_frontier: strict dominance (smaller AND larger)
# — the frontier is a pure function of the value set, stated as NOT EXISTS.
DOC_QUALITY_SKYLINE = f"""
WITH q AS ({QUALITY_SCORE}),
d AS (
  SELECT q.doc_id, length(doc.text)::BIGINT AS n_chars, q.quality
  FROM q JOIN documents doc ON doc.doc_id = q.doc_id
)
SELECT doc_id, n_chars, quality
FROM d a
WHERE NOT EXISTS (SELECT 1 FROM d b
                  WHERE b.n_chars < a.n_chars AND b.quality > a.quality)
ORDER BY n_chars, doc_id
"""

DOC_FINGERPRINTS = f"""
SELECT doc_id,
       md5({NORM_TEXT}) AS content_hash,
       list_min([md5(substr(lower(text), i, 5)) FOR i IN range(1, length(text) - 3)])
         AS min_ngram_hash
FROM documents
"""

# operators.sampling.weighted_sample_k (A-ES, Efraimidis-Spirakis): key =
# ln(u)/w with u = (md5-first-32-bits + 1) / (2^32 + 1), top-50 by key desc,
# doc_id tiebreak; weight = n_chars + 1
WEIGHTED_SAMPLE_DOCS = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ln((('0x' || substr(md5('wsk#' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
            / 4294967297.0) / (n_chars::DOUBLE + 1.0) AS s
  FROM documents
  ORDER BY s DESC, doc_id ASC
  LIMIT 50
)
ORDER BY doc_id
"""


# operators.snapshots.snapshot_diff over the synthetic next crawl: %17 drop,
# %13 text amended, %19 re-ingested at +500000; diff on (key, md5(text))
SNAPSHOT_DIFF = """
WITH old AS (SELECT doc_id, text FROM documents),
modified AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM old WHERE doc_id % 17 <> 0
),
added AS (SELECT doc_id + 500000 AS doc_id, text FROM old WHERE doc_id % 19 = 0),
new AS (SELECT * FROM modified UNION ALL SELECT * FROM added),
o AS (SELECT doc_id AS key, md5(text) AS ofp FROM old),
n AS (SELECT doc_id AS key, md5(text) AS nfp FROM new),
j AS (
  SELECT coalesce(o.key, n.key) AS key, ofp, nfp
  FROM o FULL OUTER JOIN n ON o.key = n.key
),
st AS (
  SELECT key,
         CASE WHEN ofp IS NULL THEN 'added'
              WHEN nfp IS NULL THEN 'removed'
              WHEN ofp <> nfp THEN 'modified'
              ELSE 'unchanged' END AS status
  FROM j
)
SELECT key, status FROM st WHERE status <> 'unchanged'
ORDER BY status, key
"""


# operators.sampling.hash_bucket: first 8 md5 hex chars of 'salt#key' mod 10000
def _bucket(salt: str, key: str = "doc_id") -> str:
    return f"(('0x' || substr(md5('{salt}#' || {key}::VARCHAR), 1, 8))::BIGINT % 10000)"


SAMPLE_DETERMINISTIC = f"""
SELECT doc_id, lang FROM documents
WHERE {_bucket('')} < 1000
"""

STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_bucket('')} < (CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 10000
                       WHEN 'fr' THEN 5000 ELSE 0 END)
"""

# plans.pipeline.lang_temperature_mix: census -> (n_min/n_s)^(1-alpha)
# keep rates -> md5-bucket membership, alpha = 0.3
LANG_TEMPERATURE_MIX = f"""
WITH census AS (SELECT lang, count(*)::BIGINT AS n_stratum FROM documents GROUP BY 1),
mn AS (SELECT min(n_stratum) AS n_min FROM census),
rates AS (SELECT lang, n_stratum,
                 pow(n_min::DOUBLE / n_stratum::DOUBLE, 0.7) AS keep_rate
          FROM census CROSS JOIN mn)
SELECT d.doc_id, d.lang, r.n_stratum, round(r.keep_rate, 6) AS keep_rate
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_bucket('mix')} < floor(r.keep_rate * 10000)
ORDER BY d.doc_id
"""

# operators.ordering.epoch_order: shard = first 8 md5 hex chars of
# 'epoch:1#doc_id' mod n_shards; pos = row_number within shard by the FULL
# md5 hex (total order, ties by key) — replayed verbatim.
EPOCH_SHUFFLE_ORDER = """
WITH h AS (
  SELECT doc_id, md5('epoch:1#' || doc_id::VARCHAR) AS ekey
  FROM documents
)
SELECT doc_id,
       (('0x' || substr(ekey, 1, 8))::BIGINT % 8)::INT AS shard,
       row_number() OVER (
         PARTITION BY (('0x' || substr(ekey, 1, 8))::BIGINT % 8)
         ORDER BY ekey, doc_id) AS pos
FROM h
ORDER BY shard, pos
"""

# operators.ordering.dense_ids: the two-level (shard rank + broadcast
# prefix-sum offsets) construction realizes exactly the global salted-hash
# order — one row_number replays it.
DENSE_DOC_IDS = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5('ids:0#' || doc_id::VARCHAR), doc_id) - 1
         AS dense_id
FROM documents
ORDER BY dense_id
"""

EPOCH_SHARD_MANIFEST = """
SELECT (('0x' || substr(md5('epoch:1#' || doc_id::VARCHAR), 1, 8))::BIGINT % 8)::INT
         AS shard,
       count(*) AS n_rows,
       sum(length(text))::BIGINT AS len_sum
FROM documents
GROUP BY 1
ORDER BY shard
"""

DATASET_SPLIT_COUNTS = f"""
SELECT CASE WHEN {_bucket('split')} < 1000 THEN 'val'
            WHEN {_bucket('split')} < 2000 THEN 'test'
            ELSE 'train' END AS split,
       lang, count(*) AS n
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""

def _corpus_clean_sql(tail: str | None = None) -> str:
    langs = sorted(STOPWORDS)
    ratios = ", ".join(
        f"round(len(list_intersect(dt, {_stop_list(lg)}))::DOUBLE / greatest(len(dt), 1), 6) AS ratio_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"ratio_{lg}" for lg in langs) + ")"
    case = f"CASE WHEN {best} < {MIN_LANG_RATIO} THEN 'und' "
    for lg in langs[:-1]:
        case += f"WHEN ratio_{lg} = {best} THEN '{lg}' "
    case += f"ELSE '{langs[-1]}' END"
    return rf"""
WITH {TOKL},
q AS (
  SELECT d.doc_id,
         round(least(len(ts)::DOUBLE / 50.0, 1.0)
               * (0.5 + 0.5 * (len(list_distinct(ts))::DOUBLE / greatest(len(ts), 1)))
               * (length(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}]', '', 'g'))::DOUBLE
                  / greatest(length(text), 1))
               * (0.8 + 0.2 * least((len(list_intersect(list_distinct(ts), {_stop_list("en")}))::DOUBLE
                                     / greatest(len(list_distinct(ts)), 1)) * 10.0, 1.0)), 6) AS quality
  FROM documents d JOIN tokl USING (doc_id)
),
lg AS (
  SELECT doc_id, {case} AS pred_lang FROM (
    SELECT doc_id, {ratios} FROM (SELECT doc_id, list_distinct(ts) AS dt FROM tokl)
  )
),
dup AS (
  SELECT doc_id,
         doc_id <> min(doc_id) OVER (PARTITION BY md5({NORM_TEXT})) AS is_duplicate
  FROM documents
),
sp AS (
  SELECT doc_id,
         CASE WHEN (('0x' || substr(md5('split#' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000) < 1000 THEN 'val'
              WHEN (('0x' || substr(md5('split#' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000) < 2000 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
)
{tail or _CORPUS_CLEAN_TAIL}
"""


_CORPUS_CLEAN_TAIL = """SELECT source, count(*) AS n_docs, round(sum(quality), 4) AS sum_quality
FROM documents
JOIN q USING (doc_id)
JOIN lg USING (doc_id)
JOIN dup USING (doc_id)
JOIN sp USING (doc_id)
WHERE quality >= 0.5 AND pred_lang = 'en' AND NOT is_duplicate AND split = 'train'
GROUP BY source
ORDER BY source"""


# pipeline.corpus_clean_funnel: per-gate pass counts over the SAME gate CTEs
# — the per-source funnel a pipeline dashboard reads (each count independent,
# n_kept = the conjunction, reconciling with corpus_clean's n_docs)
_CORPUS_FUNNEL_TAIL = """SELECT source,
       count(*)::BIGINT AS n_total,
       sum((quality >= 0.5)::INT)::BIGINT AS n_quality,
       sum((pred_lang = 'en')::INT)::BIGINT AS n_lang,
       sum((NOT is_duplicate)::INT)::BIGINT AS n_unique,
       sum((split = 'train')::INT)::BIGINT AS n_train,
       sum((quality >= 0.5 AND pred_lang = 'en' AND NOT is_duplicate
            AND split = 'train')::INT)::BIGINT AS n_kept
FROM documents
JOIN q USING (doc_id)
JOIN lg USING (doc_id)
JOIN dup USING (doc_id)
JOIN sp USING (doc_id)
GROUP BY source
ORDER BY source"""


CORPUS_CLEAN = _corpus_clean_sql()
CORPUS_CLEAN_FUNNEL = _corpus_clean_sql(_CORPUS_FUNNEL_TAIL)


# pipeline.training_manifest: post-gate (split, lang) doc/token accounting
# over the SAME gate CTEs; tokl supplies the token counts
_TRAINING_MANIFEST_TAIL = """SELECT split, pred_lang,
       count(*)::BIGINT AS n_docs,
       sum(len(ts))::BIGINT AS n_tokens
FROM documents
JOIN q USING (doc_id)
JOIN lg USING (doc_id)
JOIN dup USING (doc_id)
JOIN sp USING (doc_id)
JOIN tokl USING (doc_id)
WHERE quality >= 0.5 AND NOT is_duplicate
GROUP BY split, pred_lang
ORDER BY split, pred_lang"""

TRAINING_MANIFEST = _corpus_clean_sql(_TRAINING_MANIFEST_TAIL)


def _pii_sql() -> str:
    """Byte-identical regex rules as operators.pii.REDACTION_RULES, applied in
    the same order; planting mirrors pipeline.pii_redact's doc_id-derived
    suffix exactly (DuckDB numeric || is string concat)."""
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in REDACTION_RULES
    )
    red = "text"
    for _, pat, repl in REDACTION_RULES:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id ||
              '@example.com or 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') ||
              '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
              ' ssn 123-45-6789 ip 10.0.' || (doc_id % 256) || '.7'
         ELSE text END AS text
  FROM documents
)
SELECT doc_id, {counts}, md5({red}) AS redacted_md5
FROM planted
"""


# operators.quality_rules.gopher_rules — same tokenizer, same thresholds
_STOP_PROBE_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"

GOPHER_RULES = f"""
WITH {TOKL},
base AS (
  SELECT d.doc_id, t.ts,
         list_filter(list_transform(string_split(d.text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls,
         ((length(d.text) - length(replace(d.text, '#', ''))) / 1)::INT
         + ((length(d.text) - length(replace(d.text, '...', ''))) / 3)::INT AS n_symbols
  FROM documents d JOIN tokl t USING (doc_id)
),
m AS (
  SELECT doc_id,
         len(ts)::INT AS n_words,
         CASE WHEN len(ts) > 0 THEN round(
           list_sum(list_transform(ts, t -> length(t)))::DOUBLE / len(ts)::DOUBLE, 6)
           ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(ts) > 0 THEN round(
           len(list_filter(ts, t -> regexp_matches(t, '\\p{{L}}')))::DOUBLE
           / len(ts)::DOUBLE, 6) ELSE 0.0 END AS frac_alpha,
         CASE WHEN len(ls) > 0 THEN round(
           len(list_filter(ls, l -> regexp_matches(l, '^[-*\u2022]')))::DOUBLE
           / len(ls)::DOUBLE, 6) ELSE 0.0 END AS frac_bullet_lines,
         CASE WHEN len(ls) > 0 THEN round(
           len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.$')))::DOUBLE
           / len(ls)::DOUBLE, 6) ELSE 0.0 END AS frac_ellipsis_lines,
         CASE WHEN len(ts) > 0 THEN round(
           n_symbols::DOUBLE / len(ts)::DOUBLE, 6) ELSE 0.0 END AS symbol_word_ratio,
         len(list_filter({_STOP_PROBE_SQL},
                         s -> list_contains(list_distinct(ts), s)))::INT AS stop_hits
  FROM base
)
SELECT doc_id, n_words, mean_word_len, frac_alpha, frac_bullet_lines,
       frac_ellipsis_lines, symbol_word_ratio, stop_hits,
       (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_word_ratio <= 0.1 AND frac_bullet_lines <= 0.9
        AND frac_ellipsis_lines <= 0.3 AND frac_alpha >= 0.8
        AND stop_hits >= 1) AS passes
FROM m ORDER BY doc_id
"""

# operators.dedup.duplicate_spans(n=5)
DUPLICATE_SPANS = f"""
WITH {TOKL},
{SHINGLES5},
per AS (SELECT sh, count(*) AS n_docs FROM sh5 GROUP BY sh)
SELECT id AS doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS dup_frac
FROM sh5 JOIN per USING (sh)
GROUP BY id ORDER BY doc_id
"""

# operators.textstats.char_entropy (pandas kernel ground truth)
CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(lower(text), '')) AS c FROM documents
),
cnt AS (SELECT doc_id, c, count(*)::BIGINT AS k FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(k)::BIGINT AS n FROM cnt GROUP BY doc_id)
SELECT doc_id,
       round(sum(-(k::DOUBLE / n::DOUBLE) * ln(k::DOUBLE / n::DOUBLE)), 6) AS entropy,
       n AS n_chars_counted
FROM cnt JOIN tot USING (doc_id)
GROUP BY doc_id, n ORDER BY doc_id
"""

# operators.dedup.canonicalize over the >=0.5-jaccard component graph
DEDUP_CANONICAL = f"""
WITH RECURSIVE {TOKL},
{SHINGLES3},
{JACCARD},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5
  UNION
  SELECT id_b AS a, id_a AS b FROM jac WHERE jaccard >= 0.5
),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
clustered AS (
  SELECT c.node, c.component, d.n_chars FROM comp c
  JOIN documents d ON d.doc_id = c.node
),
canon AS (
  SELECT component, node AS canon_id FROM (
    SELECT component, node,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, node ASC) AS rn
    FROM clustered) WHERE rn = 1
),
lab AS (SELECT cl.node, ca.canon_id FROM clustered cl JOIN canon ca USING (component))
SELECT d.doc_id,
       coalesce(l.canon_id, d.doc_id)::BIGINT AS canonical_id,
       (coalesce(l.canon_id, d.doc_id) = d.doc_id) AS is_kept
FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
ORDER BY d.doc_id
"""


def _sign_bucket_sql(bits: int) -> str:
    terms = " + ".join(
        f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH b AS (
  SELECT ({terms})::BIGINT AS bucket,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT bucket, count(*)::BIGINT AS n_vectors, round(avg(nrm), 6) AS mean_norm
FROM b GROUP BY bucket ORDER BY bucket
"""


EMBEDDING_SIGN_BUCKETS = _sign_bucket_sql(8)


# operators.dedup.simhash_pairs — oracle is the EXHAUSTIVE popcount join,
# pinning that 4-band bucketing is lossless at Hamming radius 3
DEDUP_SIMHASH_PAIRS = f"""
WITH fps AS ({DEDUP_SIMHASH})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""

# operators.textstats.doc_keywords (k=3, smoothed sklearn idf)
DOC_KEYWORDS = f"""
WITH {TOKL},
toks AS (SELECT doc_id AS id, unnest(ts) AS term FROM tokl),
tf AS (SELECT id, term, count(*)::BIGINT AS tf FROM toks GROUP BY id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT id, term,
         round(tf * (ln((1 + n_docs)::DOUBLE / (1 + df)::DOUBLE) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
),
ranked AS (
  SELECT id, term, tfidf,
         row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT id AS doc_id, term, tfidf, rank::INT AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""

# plans.pipeline.source_mixture_weights (alpha = 0.3)
SOURCE_MIXTURE = r"""
WITH per AS (
  SELECT source,
         sum(len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                             t -> t <> '')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
r AS (SELECT source, n_tokens, pow(n_tokens::DOUBLE, 0.3) AS raw FROM per)
SELECT source, n_tokens, round(raw / sum(raw) OVER (), 6) AS weight
FROM r ORDER BY source
"""

PII_REDACT = _pii_sql()

# operators.textstats.bigram_logprob: -ln(cnt(bigram)/cnt(left-context)),
# averaged per doc. Same TOKL tokenizer; bigram list via adjacent-pair
# slicing; context counts derived from the bigram relation exactly as the
# engine does (so both sides share one definition of "left context").
BIGRAM_LOGPROB = f"""
WITH {TOKL},
g AS (
  SELECT doc_id AS id,
         unnest(CASE WHEN len(ts) >= 2
                THEN [array_to_string(ts[i:i+1], ' ') FOR i IN range(1, len(ts))]
                ELSE [] END) AS gram
  FROM tokl
),
bi AS (SELECT gram, count(*)::BIGINT AS cnt FROM g GROUP BY gram),
ctx AS (
  SELECT split_part(gram, ' ', 1) AS l, sum(cnt)::BIGINT AS ctx_cnt
  FROM bi GROUP BY 1
),
lm AS (
  SELECT gram, -ln(cnt::DOUBLE / ctx_cnt::DOUBLE) AS neg_logp
  FROM bi JOIN ctx ON split_part(gram, ' ', 1) = ctx.l
)
SELECT id AS doc_id, round(avg(neg_logp), 6) AS mean_neg_logp,
       count(*)::BIGINT AS n_bigrams
FROM g JOIN lm USING (gram)
GROUP BY id ORDER BY doc_id
"""

# plans.pipeline.doc_chunks: token windows of 32 advancing by 24; integer
# chunk-count arithmetic matches functions.text.chunk_index exactly
DOC_CHUNKS = f"""
WITH {TOKL},
n AS (SELECT doc_id, ts, len(ts) AS nt FROM tokl),
c AS (
  SELECT doc_id, ts, nt,
         CASE WHEN nt <= 0 THEN 0
              WHEN nt <= 32 THEN 1
              ELSE 1 + (nt - 32 + 23) // 24 END AS n_chunks
  FROM n
),
x AS (
  SELECT doc_id, ts, nt, unnest(range(0, n_chunks)) AS chunk_id FROM c
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       len(ts[chunk_id*24 + 1 : least(chunk_id*24 + 32, nt)])::INT AS n_tokens,
       array_to_string(ts[chunk_id*24 + 1 : least(chunk_id*24 + 32, nt)], ' ')
         AS chunk_text
FROM x ORDER BY doc_id, chunk_id
"""

# plans.pipeline.rag_retrieve: the full chunk → embed → score → top-k RAG
# pipeline replayed in SQL. Chunking reuses DOC_CHUNKS' arithmetic; both the
# chunk texts and the literal query string run through the HashingEmbedder's
# md5 pipeline (the embed_roundtrip bit-exactness result) as sparse
# (bucket, float32) rows; the dot is per-product 12dp-rounded DECIMAL(38,12)
# sums (order-independent), and chunks sharing no bucket with the query
# coalesce to exactly 0 — mirroring Spark's dense zip over all 64 buckets.
RAG_RETRIEVE = rf"""
WITH {TOKL},
n AS (SELECT doc_id, ts, len(ts) AS nt FROM tokl),
c AS (
  SELECT doc_id, ts, nt,
         CASE WHEN nt <= 0 THEN 0
              WHEN nt <= 32 THEN 1
              ELSE 1 + (nt - 32 + 23) // 24 END AS n_chunks
  FROM n
),
x AS (SELECT doc_id, ts, nt, unnest(range(0, n_chunks)) AS chunk_id FROM c),
chunks AS (
  SELECT doc_id, chunk_id::INT AS chunk_id,
         ts[chunk_id*24 + 1 : least(chunk_id*24 + 32, nt)] AS cts
  FROM x
),
cfeat AS (
  SELECT doc_id, chunk_id,
         unnest(list_concat(cts, [cts[i] || '_' || cts[i+1] FOR i IN range(1, len(cts))])) AS f
  FROM chunks
),
chit AS (
  SELECT doc_id, chunk_id,
         (('0x' || substr(md5(f), 1, 8))::UBIGINT % 64)::INT AS bucket,
         CASE WHEN ('0x' || substr(md5(f), 9, 2))::UBIGINT % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM cfeat
),
cbsum AS (
  SELECT doc_id, chunk_id, bucket, sum(sgn)::BIGINT AS s
  FROM chit GROUP BY doc_id, chunk_id, bucket
),
cnrm AS (
  SELECT doc_id, chunk_id, sqrt(sum((s * s)::DOUBLE)) AS nn
  FROM cbsum GROUP BY doc_id, chunk_id
),
cvec AS (
  SELECT b.doc_id, b.chunk_id, b.bucket, ((b.s::DOUBLE) / m.nn)::FLOAT AS val
  FROM cbsum b JOIN cnrm m USING (doc_id, chunk_id)
  WHERE b.s <> 0
),
qtok AS (
  SELECT list_filter(string_split_regex(lower('fast spark table value'), '[^\p{{L}}\p{{N}}]+'),
                     t -> t <> '') AS ts
),
qfeat AS (
  SELECT unnest(list_concat(ts, [ts[i] || '_' || ts[i+1] FOR i IN range(1, len(ts))])) AS f
  FROM qtok
),
qhit AS (
  SELECT (('0x' || substr(md5(f), 1, 8))::UBIGINT % 64)::INT AS bucket,
         CASE WHEN ('0x' || substr(md5(f), 9, 2))::UBIGINT % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM qfeat
),
qbsum AS (SELECT bucket, sum(sgn)::BIGINT AS s FROM qhit GROUP BY bucket),
qnrm AS (SELECT sqrt(sum((s * s)::DOUBLE)) AS nn FROM qbsum),
qvec AS (
  SELECT bucket, ((s::DOUBLE) / (SELECT nn FROM qnrm))::FLOAT AS val
  FROM qbsum WHERE s <> 0
),
dots AS (
  SELECT c.doc_id, c.chunk_id,
         sum(round((c.val::DOUBLE) * (q.val::DOUBLE), 12)::DECIMAL(38,12)) AS d
  FROM cvec c JOIN qvec q USING (bucket)
  GROUP BY c.doc_id, c.chunk_id
),
scored AS (
  SELECT ch.doc_id, ch.chunk_id, coalesce(d.d, 0::DECIMAL(38,12)) AS d
  FROM chunks ch LEFT JOIN dots d USING (doc_id, chunk_id)
)
SELECT doc_id, chunk_id, round(d::DOUBLE, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC, chunk_id ASC
LIMIT 10
"""


# plans.pipeline.multimodal_resize_stats: replay the nearest-neighbor gather
# byte-for-byte. Src image = text rpadded to 32·32·3 bytes (ASCII corpus, so
# rpad/substring char positions ARE byte positions in both engines); out
# pixel (r, c) = the 3 bytes at src offset ((2r)·32 + 2c)·3 (0-based;
# SQL substring is 1-based). Aggregating in (r, c) order rebuilds the
# kernel's row-major output, and md5 over that ASCII string equals Spark's
# md5 over the binary column.
_RS, _RO = 32, 16  # must match plans.pipeline.RESIZE_SRC / RESIZE_OUT
MULTIMODAL_RESIZE = f"""
WITH padded AS (
  SELECT doc_id, rpad(text, {_RS * _RS * 3}, ' ') AS p FROM documents
),
px AS (
  SELECT doc_id, r.r AS r, c.c AS c,
         substring(p, ((2*r.r)*{_RS} + 2*c.c)*3 + 1, 3) AS b
  FROM padded
  CROSS JOIN (SELECT unnest(range(0, {_RO})) AS r) r
  CROSS JOIN (SELECT unnest(range(0, {_RO})) AS c) c
),
gathered AS (
  SELECT doc_id, string_agg(b, '' ORDER BY r, c) AS out_bytes
  FROM px GROUP BY doc_id
)
SELECT doc_id, {_RO} AS out_w, {_RO} AS out_h,
       {_RO * _RO * 3}::BIGINT AS n_bytes, md5(out_bytes) AS content_md5
FROM gathered ORDER BY doc_id
"""

# plans.pipeline.seq_pack: grouped next-fit sequence packing. The md5 group
# bucket mirrors sampling.hash_bucket(salt="pack") with 8 groups; the
# next-fit fold (an inherently sequential recurrence) is replayed as a
# recursive CTE stepping rn → rn+1 per group. Capacity 128 must match
# pipeline.PACK_CAPACITY.
SEQ_PACK = f"""
WITH RECURSIVE {TOKL},
items AS (
  SELECT doc_id, nt, grp,
         row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
  FROM (SELECT doc_id, len(ts)::BIGINT AS nt,
               (('0x' || substr(md5('pack#' || doc_id::VARCHAR), 1, 8))::BIGINT
                % 8)::INT AS grp
        FROM tokl)
),
rec AS (
  SELECT grp, rn, doc_id, nt,
         0::BIGINT AS bin_idx, 0::BIGINT AS bin_offset, nt AS fill
  FROM items WHERE rn = 1
  UNION ALL
  SELECT i.grp, i.rn, i.doc_id, i.nt,
         CASE WHEN r.fill + i.nt <= 128 THEN r.bin_idx ELSE r.bin_idx + 1 END,
         CASE WHEN r.fill + i.nt <= 128 THEN r.fill ELSE 0::BIGINT END,
         CASE WHEN r.fill + i.nt <= 128 THEN r.fill + i.nt ELSE i.nt END
  FROM rec r JOIN items i ON i.grp = r.grp AND i.rn = r.rn + 1
)
SELECT doc_id, nt AS n_tokens, grp AS pack_group, bin_idx, bin_offset
FROM rec ORDER BY doc_id
"""


def _phrase_sql(terms: list[str]) -> str:
    """operators.phrase.phrase_search replayed as posting-list CTEs: the
    positional index from the shared tokenizer, one shifted posting list per
    phrase term, intersection on (doc_id, start). Terms must match
    pipeline.PHRASE_PROBE through the same tokenizer."""
    posting = ", ".join(
        f"m{i} AS (SELECT doc_id, pos - {i} AS start FROM pt WHERE term = '{t}')"
        for i, t in enumerate(terms)
    )
    joins = " ".join(
        f"JOIN m{i} ON m{i}.doc_id = m0.doc_id AND m{i}.start = m0.start"
        for i in range(1, len(terms))
    )
    return f"""
WITH {TOKL},
px AS (
  SELECT doc_id,
         unnest([{{'p': i - 1, 't': ts[i]}} FOR i IN range(1, len(ts) + 1)]) AS e
  FROM tokl
),
pt AS (SELECT doc_id, e.p AS pos, e.t AS term FROM px),
{posting},
hits AS (SELECT m0.doc_id AS doc_id, m0.start AS start FROM m0 {joins})
SELECT doc_id, count(*) AS n_occurrences, min(start)::INT AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


PHRASE_MATCH = _phrase_sql(["fast", "table"])

# plans.pipeline.source_cap: per-source cap via the same md5 hash order as
# operators.packing.cap_per_group (salt="cap", 10000 buckets, tie by id)
SOURCE_CAP = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_bucket('cap')} ASC, doc_id ASC) AS rk
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rk <= 20 ORDER BY doc_id
"""

# plans.pipeline.span_dedup: C4-style duplicate-span removal — disjoint
# 8-token spans, first global (doc_id, span_idx) occurrence wins; kept_md5
# fingerprints each doc's surviving spans joined in document order.
# DuckDB zips two parallel list comprehensions through unnest (same-length
# lists unnest pairwise); list slice ts[i:i+7] is 1-based inclusive = 8
# tokens; string_agg skips the NULLed removed spans, coalesce covers docs
# whose every span was removed (md5('') on both engines).
SPAN_DEDUP = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                     t -> t <> '') AS ts
  FROM documents
),
sp AS (
  SELECT doc_id,
         unnest([(i - 1) // 8 FOR i IN range(1, len(ts) + 1, 8)]) AS span_idx,
         unnest([array_to_string(ts[i:i+7], ' ')
                 FOR i IN range(1, len(ts) + 1, 8)]) AS s
  FROM tok WHERE len(ts) >= 1
),
fl AS (
  SELECT doc_id, span_idx, s,
         row_number() OVER (PARTITION BY s ORDER BY doc_id, span_idx) = 1 AS kept
  FROM sp
)
SELECT doc_id, count(*)::BIGINT AS n_spans,
       sum(kept::INT)::BIGINT AS n_kept,
       md5(coalesce(string_agg(CASE WHEN kept THEN s END, ' '
                               ORDER BY span_idx), '')) AS kept_md5
FROM fl GROUP BY doc_id ORDER BY doc_id
"""

# plans.pipeline.dedup_incremental: cross-corpus exact shingle Jaccard —
# base corpus vs a planted "new snapshot" (exact re-crawls of every 25th
# doc, half-truncated re-crawls of every 40th); pairs are base×new only.
DEDUP_INCREMENTAL = r"""
WITH inc AS (
  SELECT doc_id + 30000 AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 40000 AS doc_id,
         substring(text, 1, (n_chars // 2)::INT) AS text
  FROM documents WHERE doc_id % 40 = 0
),
tb AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
        '[^\p{L}\p{N}]+'), t -> t <> '') AS ts FROM documents),
tn AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
        '[^\p{L}\p{N}]+'), t -> t <> '') AS ts FROM inc),
shb AS (SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM (
  SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
                         FOR i IN range(1, len(ts) - 1)]) AS g
  FROM tb WHERE len(ts) >= 3)),
shn AS (SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM (
  SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
                         FOR i IN range(1, len(ts) - 1)]) AS g
  FROM tn WHERE len(ts) >= 3)),
szb AS (SELECT id, count(*) AS sz FROM shb GROUP BY id),
szn AS (SELECT id, count(*) AS sz FROM shn GROUP BY id),
inter AS (SELECT shb.id AS id_base, shn.id AS id_new, count(*) AS i
          FROM shb JOIN shn USING (sh) GROUP BY 1, 2),
jac AS (SELECT id_base, id_new,
               i::DOUBLE / (szb.sz + szn.sz - i)::DOUBLE AS jaccard
        FROM inter
        JOIN szb ON szb.id = inter.id_base
        JOIN szn ON szn.id = inter.id_new)
SELECT id_base AS base_id, id_new AS new_id, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.5
"""

# plans.pipeline.nb_language_classifier: closed-form naive-Bayes log-odds
# (operators/classifier.py) — add-one smoothing, en-vs-rest, score rounded
# 6dp, pred = score > 0. Same token relation as the unigram LM.
NB_CLASSIFIER = r"""
WITH tokl AS (
  SELECT doc_id, lang = 'en' AS is_pos,
         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                     t -> t <> '') AS ts
  FROM documents
),
toks AS (SELECT doc_id, is_pos, unnest(ts) AS tok FROM tokl),
per_tok AS (
  SELECT tok,
         sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS c_pos,
         sum(CASE WHEN is_pos THEN 0 ELSE 1 END)::BIGINT AS c_neg
  FROM toks GROUP BY tok
),
tot AS (SELECT sum(c_pos)::BIGINT AS t_pos, sum(c_neg)::BIGINT AS t_neg,
               count(*)::BIGINT AS v
        FROM per_tok),
w AS (SELECT tok,
             ln((c_pos + 1)::DOUBLE / (t_pos + v)::DOUBLE)
             - ln((c_neg + 1)::DOUBLE / (t_neg + v)::DOUBLE) AS weight
      FROM per_tok, tot),
nd AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_pos,
              sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n_neg
       FROM documents),
pr AS (SELECT ln(n_pos::DOUBLE / n_neg::DOUBLE) AS prior FROM nd),
per_doc AS (SELECT doc_id, sum(weight) AS w_sum
            FROM toks JOIN w USING (tok) GROUP BY doc_id)
SELECT d.doc_id AS doc_id,
       round(pr.prior + coalesce(pd.w_sum, 0), 6) AS score,
       round(pr.prior + coalesce(pd.w_sum, 0), 6) > 0 AS pred
FROM documents d
CROSS JOIN pr
LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id
ORDER BY d.doc_id
"""

# pipeline.nb_confusion_matrix: the same closed-form scoring, rolled up to
# the (actual, predicted) 2x2 evaluation matrix
NB_CONFUSION = NB_CLASSIFIER[:NB_CLASSIFIER.index("SELECT d.doc_id")] + """
SELECT (d.lang = 'en') AS actual_en,
       (round(pr.prior + coalesce(pd.w_sum, 0), 6) > 0) AS pred_en,
       count(*)::BIGINT AS n
FROM documents d
CROSS JOIN pr
LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id
GROUP BY 1, 2
ORDER BY actual_en, pred_en
"""

# pipeline.quality_band_tokens: fixed 0.1-wide quality bands (map-side
# assignment - no global window, no percentile interpolation to diverge on)
QUALITY_BAND_TOKENS = f"""
WITH q AS ({QUALITY_SCORE})
SELECT least(floor(quality * 10), 9)::BIGINT AS band,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(min(quality), 6) AS min_quality,
       round(max(quality), 6) AS max_quality
FROM q
GROUP BY 1
ORDER BY band
"""

# plans.pipeline.frame_sample: the sampling schedule of
# multimodal.sample_frames — frame at every t in range(0, duration, 600),
# frame_idx = t // 600, 64 fake-frame bytes. The frame CONTENT is the
# md5-chain fake, pinned in tests/test_multimodal.py instead.
FRAME_SAMPLE = """
WITH media AS (
  SELECT doc_id, (500 + (n_chars % 2500))::INT AS dur FROM documents
),
f AS (SELECT doc_id, unnest(range(0, dur, 600)) AS t FROM media)
SELECT doc_id, (t // 600)::INT AS frame_idx, t::INT AS t_ms,
       64::INT AS n_frame_bytes
FROM f ORDER BY doc_id, frame_idx
"""

# plans.pipeline.skew_salted_agg: the salted two-phase aggregation is
# DEFINED to equal the plain groupBy (algebraic merges), so the oracle IS
# the un-salted aggregate — the driver hash-checks the equivalence claim.
SKEW_SALTED_AGG = """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(value::DECIMAL(18,4))::DOUBLE AS sum_value,
       max(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""

# plans.pipeline.zorder_bucket_counts: Morton interleave of
# (value bucketized to 8 bits over the fixed [0, 600) domain) with
# hour-of-day, unrolled to 16 shift-mask terms. Bucketize matches
# functions.zorder.bucketize's exact double arithmetic: (v / 600.0) * 255,
# truncated (floor == trunc for non-negatives), clamped to [0, 255].
_ZORDER_TERMS = " + ".join(
    f"(((vb >> {i}) & 1) << {2 * i}) + (((h >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)
ZORDER_BUCKETS = f"""
WITH b AS (
  SELECT least(255, greatest(0, floor((value - 0.0) / 600.0 * 255)::BIGINT)) AS vb,
         hour(ts)::BIGINT AS h
  FROM events
),
k AS (SELECT ({_ZORDER_TERMS}) AS zkey FROM b)
SELECT (zkey >> 6)::BIGINT AS zbucket, count(*)::BIGINT AS n_events
FROM k GROUP BY 1 ORDER BY 1
"""



# operators.pagerank over the deterministic synthetic link graph
# (pipeline.pagerank_top_docs): the 10-iteration damped power iteration
# replayed as 10 chained CTEs — contributions rounded to 12dp doubles then
# summed as DECIMAL(38,12), so every iteration is order-independent and
# engine-exact (the same decimal-accumulation trick as the revenue sums)
def _pagerank_sql(iterations: int = 10, damping: float = 0.85, dp: int = 12) -> str:
    head = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 31 + 7) % nn.n AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id AS src, (doc_id * 17 + 3) % nn.n AS dst FROM documents, nn
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS node, round(1.0 / nn.n, {dp})::DECIMAL(38,{dp}) AS rank
       FROM documents, nn)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""",
r{i} AS (
  SELECT d.doc_id AS node,
         (round({1.0 - damping} / nn.n, {dp})::DECIMAL(38,{dp})
          + coalesce(s.m, 0::DECIMAL(38,{dp})))::DECIMAL(38,{dp}) AS rank
  FROM documents d CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node,
           sum(round(r.rank::DOUBLE * {damping} / g.outdeg, {dp})::DECIMAL(38,{dp})) AS m
    FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg g ON e.src = g.src
    GROUP BY e.dst
  ) s ON d.doc_id = s.node
)""")
    tail = f"""
SELECT node, round(rank::DOUBLE, 10) AS rank
FROM r{iterations}
ORDER BY rank DESC, node ASC
LIMIT 20
"""
    return head + "".join(its) + tail


PAGERANK_TOP_DOCS = _pagerank_sql()


# operators.pagerank with seeds (pipeline.ppr_top_docs): teleport mass lands
# only on the doc_id % 10 = 0 seed set; same decimal-exact chain replay.
def _ppr_sql(iterations: int = 10, damping: float = 0.85, dp: int = 12) -> str:
    head = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
ns AS (SELECT count(*)::BIGINT AS s FROM documents WHERE doc_id % 10 = 0),
edges AS (
  SELECT doc_id AS src, (doc_id * 31 + 7) % nn.n AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id AS src, (doc_id * 17 + 3) % nn.n AS dst FROM documents, nn
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
nb AS (SELECT doc_id AS node,
              CASE WHEN doc_id % 10 = 0
                   THEN round({1.0 - damping} / ns.s, {dp})::DECIMAL(38,{dp})
                   ELSE 0::DECIMAL(38,{dp}) END AS base,
              CASE WHEN doc_id % 10 = 0
                   THEN round(1.0 / ns.s, {dp})::DECIMAL(38,{dp})
                   ELSE 0::DECIMAL(38,{dp}) END AS rank
       FROM documents, ns),
r0 AS (SELECT node, rank FROM nb)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""",
r{i} AS (
  SELECT nb.node,
         (nb.base + coalesce(s.m, 0::DECIMAL(38,{dp})))::DECIMAL(38,{dp}) AS rank
  FROM nb
  LEFT JOIN (
    SELECT e.dst AS node,
           sum(round(r.rank::DOUBLE * {damping} / g.outdeg, {dp})::DECIMAL(38,{dp})) AS m
    FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg g ON e.src = g.src
    GROUP BY e.dst
  ) s ON nb.node = s.node
)""")
    tail = f"""
SELECT node, round(rank::DOUBLE, 10) AS rank
FROM r{iterations}
ORDER BY rank DESC, node ASC
LIMIT 20
"""
    return head + "".join(its) + tail


PPR_TOP_DOCS = _ppr_sql()


# graph.hop_distances over the synthetic link graph: bounded recursive
# walk, min(hops) per reached node — frontier BFS computes exactly this.
LINK_HOP_DISTANCES = """
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 31 + 7) % nn.n AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id AS src, (doc_id * 17 + 3) % nn.n AS dst FROM documents, nn
),
walk(node, hops) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hops < 6
)
SELECT node, min(hops)::INT AS hops
FROM walk
GROUP BY node
ORDER BY hops, node
"""


# operators.graph.label_propagation over the pagerank synthetic link graph
# (pipeline.lpa_communities): 5 synchronous rounds replayed as chained
# CTEs — per round, the neighbor-label count, the (cnt DESC, label ASC)
# per-node winner, and the coalesce-keep for isolated nodes. MATERIALIZED
# for the same double-reference reason as the BPE chain.
def _lpa_sql(iterations: int = 5) -> str:
    head = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
e0 AS (
  SELECT doc_id AS a, (doc_id * 31 + 7) % nn.n AS b FROM documents, nn
  UNION ALL
  SELECT doc_id, (doc_id * 17 + 3) % nn.n FROM documents, nn
),
sym AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
  ) WHERE a <> b
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM sym)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""",
c{i} AS (
  SELECT s.b AS nbr, l.label, count(*)::BIGINT AS cnt
  FROM sym s JOIN l{i - 1} l ON s.a = l.node
  GROUP BY 1, 2
),
w{i} AS (
  SELECT nbr, label FROM (
    SELECT nbr, label,
           row_number() OVER (PARTITION BY nbr ORDER BY cnt DESC, label ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
),
l{i} AS MATERIALIZED (
  SELECT l.node, coalesce(w.label, l.label) AS label
  FROM l{i - 1} l LEFT JOIN w{i} w ON l.node = w.nbr
)""")
    tail = f"""
SELECT node AS doc_id, label AS community FROM l{iterations} ORDER BY doc_id
"""
    return head + "".join(its) + tail


LPA_COMMUNITIES = _lpa_sql()


# relational.events_robust_outliers: median/MAD modified z per event type;
# the z chain mirrors Spark's double ops exactly (same op order), so even
# the |z| > 3.5 boundary comparison agrees bit-for-bit
EVENTS_ROBUST_OUTLIERS = """
WITH b AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
c AS (
  SELECT e.event_type, e.value, b.med FROM events e JOIN b USING (event_type)
),
m AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM c GROUP BY event_type
),
z AS (
  SELECT c.event_type, c.med, m.mad,
         CASE WHEN m.mad > 0
              THEN abs(0.6745 * (c.value - c.med) / m.mad)
              ELSE 0.0 END AS az
  FROM c JOIN m USING (event_type)
)
SELECT event_type,
       count(*)::BIGINT AS n_events,
       round(any_value(med), 6) AS median_value,
       round(any_value(mad), 6) AS mad,
       sum(CASE WHEN az > 3.5 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       round(max(az), 6) AS max_abs_z
FROM z GROUP BY event_type ORDER BY event_type
"""


# pipeline.bigram_pmi: occurrence-count PMI of adjacent token pairs; the
# ln argument mirrors Spark's division chain exactly
BIGRAM_PMI = f"""
WITH {TOKL},
uni AS (
  SELECT tok, count(*)::DOUBLE AS c FROM (
    SELECT unnest(ts) AS tok FROM tokl
  ) GROUP BY tok
),
ntot AS (SELECT sum(c) AS n_total FROM uni),
bi AS (
  SELECT bigram, count(*)::DOUBLE AS cab FROM (
    SELECT unnest([ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))]) AS bigram
    FROM tokl WHERE len(ts) >= 2
  ) GROUP BY bigram HAVING count(*) >= 5
),
btot AS (SELECT sum(cab) AS b_total FROM bi),
j AS (
  SELECT b.bigram, b.cab, ua.c AS ca, ub.c AS cb, ntot.n_total, btot.b_total
  FROM bi b
  JOIN uni ua ON ua.tok = string_split(b.bigram, ' ')[1]
  JOIN uni ub ON ub.tok = string_split(b.bigram, ' ')[2]
  CROSS JOIN ntot CROSS JOIN btot
)
SELECT bigram, cab::BIGINT AS n_pair,
       round(ln((cab / b_total) / ((ca / n_total) * (cb / n_total))), 6) AS pmi
FROM j
ORDER BY pmi DESC, bigram ASC
LIMIT 20
"""


# operators.bpe_train.learn_bpe (pipeline.bpe_learn_merges): the 10-merge
# BPE training fixpoint replayed as a chained CTE — per iteration, the
# integer-weighted pair count (exact, order-independent), the (cnt DESC,
# lhs, rhs) top-1 merge decision, and the P-pass ' l r ' → ' lr ' replace
# re-segmentation (Spark's and DuckDB's replace share left-to-right
# non-overlapping scan semantics, so the segment tables stay byte-equal).
# AS MATERIALIZED is load-bearing: s{i} is referenced by both p{i+1} and
# s{i+1}, and without it DuckDB inlines the chain into a 2^N-blowup.
def _bpe_sql(merges: int = 10, passes: int = 6, tail: str | None = None) -> str:
    head = r"""
WITH w AS MATERIALIZED (
  SELECT t AS word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '[^\p{L}]+')) AS t FROM documents
  ) WHERE t <> '' GROUP BY t
),
s0 AS MATERIALIZED (
  SELECT word,
         ' ' || array_to_string(regexp_extract_all(word, '\p{L}'), ' ') || ' ' AS seq,
         freq
  FROM w
)"""
    its = []
    for i in range(1, merges + 1):
        reseg = "seq"
        for _ in range(passes):
            reseg = (
                f"replace({reseg}, ' ' || m.lhs || ' ' || m.rhs || ' ',"
                f" ' ' || m.lhs || m.rhs || ' ')"
            )
        its.append(f""",
p{i} AS (
  SELECT t[i] AS lhs, t[i+1] AS rhs, sum(freq)::BIGINT AS cnt FROM (
    SELECT t, freq, unnest(generate_series(1, len(t) - 1)) AS i FROM (
      SELECT string_split(trim(seq), ' ') AS t, freq FROM s{i - 1}
    )
  ) GROUP BY 1, 2
),
m{i} AS MATERIALIZED (
  SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
),
s{i} AS MATERIALIZED (SELECT word, {reseg} AS seq, freq FROM s{i - 1}, m{i} m)""")
    if tail is None:
        sels = [
            f"SELECT {i} AS rank, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count"
            f" FROM m{i}"
            for i in range(1, merges + 1)
        ]
        tail = (
            "\nSELECT * FROM (\n" + "\nUNION ALL\n".join(sels) + "\n) ORDER BY rank"
        )
    return head + "".join(its) + tail


BPE_LEARN_MERGES = _bpe_sql()

# pipeline.bpe_vocab_usage: the same 10-merge training chain, rolled up to
# the frequency-weighted usage of the final segment table's tokens
BPE_VOCAB_USAGE = _bpe_sql(
    tail="""
SELECT token, sum(freq)::BIGINT AS total_count FROM (
  SELECT unnest(string_split(trim(seq), ' ')) AS token, freq FROM s10
) GROUP BY token ORDER BY total_count DESC, token ASC LIMIT 20
"""
)

# pipeline.bpe_learned_fertility: corpus words joined to the trained
# word → segmentation table for post-merge token counts, per-lang rollup
BPE_LEARNED_FERTILITY = _bpe_sql(
    tail=r"""
SELECT lang, sum(n_tokens)::BIGINT AS bpe_tokens, count(*)::BIGINT AS words,
       round(sum(n_tokens)::DOUBLE / count(*), 6) AS fertility
FROM (
  SELECT lang, unnest(string_split_regex(lower(text), '[^\p{L}]+')) AS word
  FROM documents
) d
JOIN (
  SELECT word, len(string_split(trim(seq), ' '))::BIGINT AS n_tokens FROM s10
) n USING (word)
WHERE d.word <> ''
GROUP BY lang ORDER BY lang
"""
)




# multimodal.audio_windows schedule: full 25ms windows at 10ms hop over
# duration_ms = 500 + n_chars % 2500 at 16 kHz; n_windows =
# floor((dur - 25) / 10) + 1, n_samples = 25*16 = 400 per window
AUDIO_WINDOW_STATS = """
WITH clips AS (
  SELECT doc_id, (500 + n_chars % 2500)::INT AS dur FROM documents
),
w AS (
  SELECT doc_id, unnest(range(0, dur - 25 + 1, 10)) AS start_ms
  FROM clips WHERE dur >= 25
)
SELECT doc_id,
       count(*)::BIGINT AS n_windows,
       max(start_ms)::INT AS last_start_ms,
       (count(*) * 400)::BIGINT AS total_samples
FROM w GROUP BY doc_id ORDER BY doc_id
"""


# wav_window_stats: the planted square-wave WAV corpus — schedule facts
# from the decoded header (8 kHz, 25 ms windows = 200 samples) and the
# alignment-free RMS (|sample| ≡ amplitude, so window RMS = amplitude
# exactly); everything is doc_id/n_chars arithmetic by construction
WAV_WINDOW_STATS = """
WITH clips AS (
  SELECT doc_id,
         (200 + n_chars % 800)::INT AS dur,
         (1000 + (doc_id % 7) * 500)::DOUBLE AS amp
  FROM documents
),
w AS (
  SELECT doc_id, amp, unnest(range(0, dur - 25 + 1, 10)) AS start_ms
  FROM clips WHERE dur >= 25
)
SELECT doc_id,
       count(*)::BIGINT AS n_windows,
       max(start_ms)::INT AS last_start_ms,
       (count(*) * 200)::BIGINT AS total_samples,
       round(min(amp), 6) AS rms_lo,
       round(max(amp), 6) AS rms_hi
FROM w GROUP BY doc_id ORDER BY doc_id
"""




# operators.snapshots.scd2_merge over the snapshot_diff fixture pair
SNAPSHOT_SCD2 = """
WITH old AS (SELECT doc_id, text FROM documents),
modified AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM old WHERE doc_id % 17 <> 0
),
added AS (SELECT doc_id + 500000 AS doc_id, text FROM old WHERE doc_id % 19 = 0),
new AS (SELECT * FROM modified UNION ALL SELECT * FROM added),
o AS (SELECT doc_id AS key, md5(text) AS ofp FROM old),
n AS (SELECT doc_id AS key, md5(text) AS nfp FROM new),
j AS (
  SELECT coalesce(o.key, n.key) AS key, ofp, nfp
  FROM o FULL OUTER JOIN n ON o.key = n.key
),
hist AS (
  SELECT key, nfp AS fingerprint, 2::INT AS valid_from, NULL::INT AS valid_to,
         true AS is_current
  FROM j WHERE ofp IS NULL
  UNION ALL
  SELECT key, ofp, 1::INT, 2::INT, false FROM j WHERE nfp IS NULL
  UNION ALL
  SELECT key, ofp, 1::INT, NULL::INT, true FROM j WHERE ofp = nfp
  UNION ALL
  SELECT key, ofp, 1::INT, 2::INT, false
  FROM j WHERE ofp IS NOT NULL AND nfp IS NOT NULL AND ofp <> nfp
  UNION ALL
  SELECT key, nfp, 2::INT, NULL::INT, true
  FROM j WHERE ofp IS NOT NULL AND nfp IS NOT NULL AND ofp <> nfp
)
SELECT key, fingerprint, valid_from, valid_to, is_current
FROM hist ORDER BY key, valid_from, fingerprint
"""


def _kcore_sql(k: int = 2, rounds: int = 12) -> str:
    """operators.graph.kcore replay: fixed-depth unrolled peeling. The
    fixpoint is idempotent (once converged, further rounds are no-ops), so
    any unrolling >= the convergence depth reproduces the Spark loop's
    relation exactly; the engine caps at the same max_iter. Every CTE is
    MATERIALIZED — each is referenced twice downstream and DuckDB would
    otherwise re-expand the chain exponentially."""
    parts = [f"""
WITH {TOKL},
{SHINGLES3},
{JACCARD},
e0 AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5
  UNION
  SELECT id_b AS a, id_a AS b FROM jac WHERE jaccard >= 0.5)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
k{i} AS MATERIALIZED (
  SELECT a FROM e{i - 1} GROUP BY a HAVING count(*) >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b
  FROM e{i - 1} e JOIN k{i} x ON e.a = x.a JOIN k{i} y ON e.b = y.a)""")
    parts.append(f"""
SELECT a AS doc_id, count(*)::BIGINT AS degree
FROM e{rounds}
GROUP BY a HAVING count(*) >= {k}
ORDER BY doc_id""")
    return "".join(parts)


DEDUP_KCORE = _kcore_sql(2, 12)

# plans.relational.events_retention: cohort = first signup week (Monday
# date_trunc in both engines); whole-week activity buckets via integer
# day-diff / 7 floored; DISTINCT (user, cohort, week) before the rollup.
EVENTS_RETENTION = """
WITH c2 AS MATERIALIZED (
  SELECT user_id, cohort_day,
         strftime(date_trunc('week', cohort_day), '%Y-%m-%d') AS cohort_week
  FROM (SELECT user_id, min(ts::DATE) AS cohort_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id)),
sizes AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size
          FROM c2 GROUP BY 1),
act AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         floor(date_diff('day', c.cohort_day, e.ts::DATE) / 7.0)::INT AS week_k
  FROM events e JOIN c2 c USING (user_id))
SELECT f.cohort_week, f.week_k, count(*)::BIGINT AS n_active, s.cohort_size,
       round(count(*)::DOUBLE / s.cohort_size, 6) AS retention
FROM (SELECT * FROM act WHERE week_k BETWEEN 0 AND 8) f
JOIN sizes s USING (cohort_week)
GROUP BY f.cohort_week, f.week_k, s.cohort_size
ORDER BY f.cohort_week, f.week_k
"""




# ------------------------------------------------- r9: semantic pruning etc.

_SIGN8 = " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(8)
)

# plans.pipeline.semdedup_prune — sign-bucket blocking, 6-dp cosine >= 0.3,
# min-label components, min-id election
SEMDEDUP_PRUNE = f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT vec_id, embedding, ({_SIGN8})::BIGINT AS bucket FROM embeddings
),
pr AS MATERIALIZED (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE round(list_dot_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6)
        >= 0.3
),
edges AS (
  SELECT id_a AS a, id_b AS bb FROM pr UNION SELECT id_b, id_a FROM pr
),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.bb, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n)
SELECT v.vec_id, v.bucket,
       coalesce(c.component, v.vec_id)::BIGINT AS canonical_id,
       (coalesce(c.component, v.vec_id) = v.vec_id) AS is_kept
FROM b v LEFT JOIN comp c ON c.node = v.vec_id
ORDER BY v.vec_id
"""

# plans.pipeline.embedding_mahalanobis_outliers — quantize -> exact-sum ->
# divide ladder, identical to the Spark side
EMBEDDING_MAHALANOBIS = """
WITH pos AS MATERIALIZED (
  SELECT vec_id, u['idx'] AS idx,
         round(u['v'], 7)::DECIMAL(18,7) AS v
  FROM (SELECT vec_id,
               unnest([{'idx': i, 'v': embedding[i]::DOUBLE}
                       FOR i IN range(1, len(embedding) + 1)]) AS u
        FROM embeddings)
),
stats AS MATERIALIZED (
  SELECT idx, count(*)::DOUBLE AS n, sum(v) AS s, sum(v * v) AS ss
  FROM pos GROUP BY idx
),
sd AS (
  SELECT idx, s::DOUBLE / n AS mu,
         (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n) / n AS var
  FROM stats
),
terms AS (
  SELECT vec_id,
         round((v::DOUBLE - mu) * (v::DOUBLE - mu) / var, 6)::DECIMAL(18,6) AS t
  FROM pos JOIN sd USING (idx)
),
dist AS (SELECT vec_id, sum(t)::DOUBLE AS m2 FROM terms GROUP BY vec_id)
SELECT vec_id, round(m2, 6) AS mahalanobis_sq
FROM dist ORDER BY m2 DESC, vec_id ASC LIMIT 20
"""

# plans.pipeline.ngram_novelty_scores — first-occurrence share per doc
NGRAM_NOVELTY = f"""
WITH {TOKL},
{SHINGLES3},
first_seen AS (SELECT sh AS shk, min(id) AS first_id FROM sh GROUP BY sh)
SELECT id AS doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN first_id = id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       round(sum(CASE WHEN first_id = id THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS novelty
FROM sh JOIN first_seen ON first_seen.shk = sh.sh
GROUP BY id ORDER BY doc_id
"""




# operators.graph.katz_centrality over the pagerank link fixture
# (pipeline.katz_central_docs): x <- 1 + alpha*A'x unrolled as chained CTEs,
# contributions rounded to 12dp then summed as DECIMAL(38,12) — the
# pagerank ladder with beta=1 and no degree normalization
def _katz_sql(iterations: int = 6, alpha: float = 0.05, dp: int = 12) -> str:
    head = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS MATERIALIZED (
  SELECT doc_id AS u, (doc_id * 31 + 7) % nn.n AS v FROM documents, nn
  UNION ALL
  SELECT doc_id AS u, (doc_id * 17 + 3) % nn.n AS v FROM documents, nn
),
x0 AS (SELECT doc_id AS node, 1::DECIMAL(38,{dp}) AS x FROM documents)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""",
x{i} AS (
  SELECT d.doc_id AS node,
         (1::DECIMAL(38,{dp}) + coalesce(s.m, 0::DECIMAL(38,{dp})))::DECIMAL(38,{dp}) AS x
  FROM documents d
  LEFT JOIN (
    SELECT e.v AS node,
           sum(round({alpha} * r.x::DOUBLE, {dp})::DECIMAL(38,{dp})) AS m
    FROM edges e JOIN x{i - 1} r ON e.u = r.node
    GROUP BY e.v
  ) s ON d.doc_id = s.node
)"""
        )
    tail = f"""
SELECT node AS doc_id, round(x::DOUBLE, 10) AS katz
FROM x{iterations}
ORDER BY katz DESC, doc_id ASC
LIMIT 20
"""
    return head + "".join(its) + tail


KATZ_CENTRAL_DOCS = _katz_sql()


# operators.graph.hits_scores over the same link fixture
# (pipeline.hits_hub_authority): a <- A'h, h <- Aa, each half-step
# max-normalized — contributions DECIMAL(38,12)-summed, the ONE double
# division per node rounded to 12dp, so 5 iterations unroll as 10 CTEs
def _hits_sql(iterations: int = 5, dp: int = 12) -> str:
    dec = f"DECIMAL(38,{dp})"
    head = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS MATERIALIZED (
  SELECT doc_id AS u, (doc_id * 31 + 7) % nn.n AS v FROM documents, nn
  UNION ALL
  SELECT doc_id AS u, (doc_id * doc_id + 1) % nn.n AS v FROM documents, nn
),
nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
h0 AS MATERIALIZED (SELECT node, 1::{dec} AS h FROM nodes)"""
    its = []
    # every intermediate is MATERIALIZED: DuckDB inlines plain CTEs, so a
    # non-materialized chain re-expands the whole prefix at each reference
    # (exponential); the max lives in its own 1-row CTE for the same reason
    for i in range(1, iterations + 1):
        its.append(f""",
sa{i} AS MATERIALIZED (
  SELECT e.v AS node, sum(r.h) AS s
  FROM edges e JOIN h{i - 1} r ON e.u = r.node GROUP BY e.v
),
ma{i} AS MATERIALIZED (SELECT max(s) AS mx FROM sa{i}),
a{i} AS MATERIALIZED (
  SELECT d.node,
         round(coalesce(s.s, 0)::DOUBLE / m.mx::DOUBLE, {dp})::{dec} AS a
  FROM nodes d LEFT JOIN sa{i} s ON d.node = s.node CROSS JOIN ma{i} m
),
sh{i} AS MATERIALIZED (
  SELECT e.u AS node, sum(r.a) AS s
  FROM edges e JOIN a{i} r ON e.v = r.node GROUP BY e.u
),
mh{i} AS MATERIALIZED (SELECT max(s) AS mx FROM sh{i}),
h{i} AS MATERIALIZED (
  SELECT d.node,
         round(coalesce(s.s, 0)::DOUBLE / m.mx::DOUBLE, {dp})::{dec} AS h
  FROM nodes d LEFT JOIN sh{i} s ON d.node = s.node CROSS JOIN mh{i} m
)"""
        )
    tail = f"""
SELECT n.node AS doc_id,
       round(h.h::DOUBLE, 10) AS hub,
       round(a.a::DOUBLE, 10) AS authority
FROM nodes n
JOIN a{iterations} a ON a.node = n.node
JOIN h{iterations} h ON h.node = n.node
ORDER BY authority DESC, doc_id ASC
LIMIT 20
"""
    return head + "".join(its) + tail


HITS_HUB_AUTHORITY = _hits_sql()




# plans.pipeline.flesch_reading_ease — identical regex proxies both engines
FLESCH_READING_EASE = f"""
WITH {TOKL},
m AS (
  SELECT d.doc_id,
         len(list_filter(string_split_regex(d.text, '[.!?]+'),
                         s -> trim(s) <> ''))::INT AS n_sentences,
         len(ts)::INT AS n_words,
         len(regexp_extract_all(lower(d.text), '[aeiouy]+'))::INT AS n_syllables
  FROM documents d JOIN tokl USING (doc_id)
)
SELECT doc_id, n_sentences, n_words, n_syllables,
       round(206.835
             - 1.015 * (n_words::DOUBLE / greatest(n_sentences, 1)::DOUBLE)
             - 84.6 * (n_syllables::DOUBLE / greatest(n_words, 1)::DOUBLE),
             6) AS fre
FROM m ORDER BY doc_id
"""




# plans.pipeline.token_zipf_fit — 12-dp-quantized coordinates, exact decimal
# sufficient statistics, single double expressions (the OLS-trends ladder)
TOKEN_ZIPF_FIT = f"""
WITH {TOKL},
freq AS (
  SELECT t AS term, count(*)::BIGINT AS n
  FROM (SELECT unnest(ts) AS t FROM tokl) GROUP BY t
  ORDER BY n DESC, term ASC LIMIT 100
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS rank FROM freq
),
xy AS (
  SELECT round(ln(rank::DOUBLE), 12)::DECIMAL(18,12) AS x,
         round(ln(n::DOUBLE), 12)::DECIMAL(18,12) AS y
  FROM ranked
),
s AS (
  SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         sum(x * x)::DOUBLE AS sxx, sum(x * y)::DOUBLE AS sxy,
         sum(y * y)::DOUBLE AS syy
  FROM xy
)
SELECT n::BIGINT AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""

# plans.pipeline.source_keyness_g2 — Dunning G2, en vs rest, fixed-shape
# expression over integer cells
SOURCE_KEYNESS_G2 = f"""
WITH {TOKL},
toks AS (
  SELECT (d.lang = 'en') AS is_en, t AS term
  FROM tokl JOIN documents d USING (doc_id), unnest(ts) AS u(t)
),
cnt AS (
  SELECT term,
         sum(CASE WHEN is_en THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN is_en THEN 0 ELSE 1 END)::BIGINT AS b
  FROM toks GROUP BY term
),
tot AS (SELECT sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb FROM cnt),
j AS (
  SELECT term, a::DOUBLE AS a, b::DOUBLE AS b, ta::DOUBLE AS ta, tb::DOUBLE AS tb
  FROM cnt CROSS JOIN tot
),
g AS (
  SELECT term, a, b,
         2.0 * (
           (CASE WHEN a > 0
                 THEN a * ln(a / (ta * ((a + b) / (ta + tb)))) ELSE 0.0 END)
           + (CASE WHEN b > 0
                   THEN b * ln(b / (tb * ((a + b) / (ta + tb)))) ELSE 0.0 END)
           + (CASE WHEN (ta - a) > 0
                   THEN (ta - a) * ln((ta - a)
                        / (ta * (((ta - a) + (tb - b)) / (ta + tb)))) ELSE 0.0 END)
           + (CASE WHEN (tb - b) > 0
                   THEN (tb - b) * ln((tb - b)
                        / (tb * (((ta - a) + (tb - b)) / (ta + tb)))) ELSE 0.0 END)
         ) AS g2,
         CASE WHEN a / ta > b / tb THEN 'en' ELSE 'rest' END AS favors
  FROM j
)
SELECT term, a::BIGINT AS n_en, b::BIGINT AS n_rest, round(g2, 6) AS g2, favors
FROM g ORDER BY g2 DESC, term ASC LIMIT 25
"""




# operators.textstats.tfidf_cosine_pairs (pipeline.tfidf_doc_pairs) —
# inverted-index TF-IDF cosine with the df cap and the 9/12-dp quantize ->
# exact-decimal-sum ladder
TFIDF_DOC_PAIRS = f"""
WITH {TOKL},
posts AS MATERIALIZED (
  SELECT doc_id AS id, t AS term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(ts) AS t FROM tokl) GROUP BY 1, 2
),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM posts GROUP BY term),
kept AS (SELECT term, df FROM dfreq CROSS JOIN nn WHERE df <= 0.5 * nn.n),
weighted AS MATERIALIZED (
  SELECT id, p.term, round(p.tf * ln(nn.n / k.df), 9) AS w
  FROM posts p JOIN kept k USING (term) CROSS JOIN nn
),
norms AS MATERIALIZED (
  SELECT id, sqrt(sum(round(w * w, 12)::DECIMAL(28,12))::DOUBLE) AS nrm
  FROM weighted GROUP BY id
),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b,
         sum(round(a.w * b.w, 9)::DECIMAL(18,9)) AS dot
  FROM weighted a JOIN weighted b ON a.term = b.term AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a AS doc_a, id_b AS doc_b, cos FROM (
  SELECT d.id_a, d.id_b,
         round(d.dot::DOUBLE / (na.nrm * nb.nrm), 6) AS cos
  FROM dots d
  JOIN norms na ON na.id = d.id_a
  JOIN norms nb ON nb.id = d.id_b
)
WHERE cos >= 0.3
ORDER BY doc_a, doc_b
"""




# plans.pipeline.ngram_containment_pairs — planted half-doc scrapes, the
# same inverted-index intersection as the jaccard oracles
NGRAM_CONTAINMENT = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000, substr(text, 1, floor(n_chars / 2)::INT)
  FROM documents WHERE doc_id % 25 = 0
),
tok2 AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
         '[^\p{L}\p{N}]+'), t -> t <> '') AS ts FROM corpus
),
sh2 AS (
  SELECT DISTINCT doc_id AS id, md5(g) AS sh FROM (
    SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
                           FOR i IN range(1, len(ts) - 1)]) AS g
    FROM tok2 WHERE len(ts) >= 3)
),
sizes AS (SELECT id, count(*)::BIGINT AS sz FROM sh2 GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS i
  FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i / sa.sz::DOUBLE, 6) AS cont_a_in_b,
       round(i / sb.sz::DOUBLE, 6) AS cont_b_in_a
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
-- integer predicate i >= ceil(t*sz), matching the Spark plan: never
-- threshold on the 6-dp-rounded ratio (a ratio 5e-7 under t rounds up)
WHERE i >= ceil(0.8 * sa.sz) OR i >= ceil(0.8 * sb.sz)
ORDER BY id_a, id_b
"""




# operators.graph.harmonic_centrality over the link fixture, landmarks =
# the BFS seed fixture (pipeline.harmonic_central_docs): per-seed bounded
# walk -> min hops -> 12-dp-quantized 1/d summed as DECIMAL(38,12)
HARMONIC_CENTRAL_DOCS = """
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT doc_id AS u, (doc_id * 31 + 7) % nn.n AS v FROM documents, nn
  UNION
  SELECT doc_id AS u, (doc_id * 17 + 3) % nn.n AS v FROM documents, nn
),
walk(seed, node, hops) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id % 50 = 0
  UNION
  SELECT w.seed, e.v, w.hops + 1
  FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.hops < 6
),
d AS (SELECT seed, node, min(hops) AS hops FROM walk GROUP BY seed, node)
SELECT node, harmonic FROM (
  SELECT node,
         round(sum(round(1.0 / hops::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE, 10)
           AS harmonic
  FROM d WHERE hops > 0 GROUP BY node
)
ORDER BY harmonic DESC, node ASC
LIMIT 20
"""




# operators.pca.pc1_power_iteration (pipeline.embedding_pc1_variance):
# exact-decimal covariance sufficient statistics, then the 12-dp quantize ->
# exact-sum -> single-double-op power iteration unrolled as chained CTEs
def _pc1_sql(iterations: int = 8, dp: int = 12) -> str:
    dec = f"DECIMAL(38,{dp})"
    head = f"""
WITH pos AS MATERIALIZED (
  SELECT vec_id AS rid, u['idx'] AS i, round(u['v'], 7)::DECIMAL(18,7) AS v
  FROM (SELECT vec_id,
               unnest([{{'idx': i, 'v': embedding[i]::DOUBLE}}
                       FOR i IN range(1, len(embedding) + 1)]) AS u
        FROM embeddings)
),
gram AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, count(*)::BIGINT AS n, sum(a.v * b.v) AS sp
  FROM pos a JOIN pos b ON a.rid = b.rid GROUP BY 1, 2
),
mu AS MATERIALIZED (
  SELECT i, sum(v)::DOUBLE / count(*)::DOUBLE AS mu FROM pos GROUP BY i
),
cov AS MATERIALIZED (
  SELECT g.i, g.j, g.sp::DOUBLE / g.n::DOUBLE - m1.mu * m2.mu AS c
  FROM gram g JOIN mu m1 ON m1.i = g.i JOIN mu m2 ON m2.i = g.j
),
tr AS (SELECT sum(round(c, {dp})::{dec})::DOUBLE AS trace FROM cov WHERE i = j),
x0 AS (SELECT DISTINCT i AS j, 0.125::{dec} AS x FROM cov)"""
    its = []
    prev = "x0"
    for t in range(1, iterations + 1):
        its.append(f""",
y{t} AS MATERIALIZED (
  SELECT c.i, sum(round(c.c * p.x::DOUBLE, {dp})::{dec})::DOUBLE AS y
  FROM cov c JOIN {prev} p ON p.j = c.j GROUP BY c.i
),
n{t} AS (SELECT sqrt(sum(round(y * y, {dp})::{dec})::DOUBLE) AS nrm FROM y{t}),
x{t} AS (
  SELECT y{t}.i AS j, round(y{t}.y / n{t}.nrm, {dp})::{dec} AS x
  FROM y{t} CROSS JOIN n{t}
)"""
        )
        prev = f"x{t}"
    tail = f"""
SELECT (SELECT count(*) FROM mu)::BIGINT AS dim,
       (SELECT count(*) FROM embeddings)::BIGINT AS n_vectors,
       round(nrm, 6) AS lambda1,
       round(trace, 6) AS trace,
       round(nrm / trace, 6) AS explained_frac
FROM n{iterations} CROSS JOIN tr
"""
    return head + "".join(its) + tail


EMBEDDING_PC1 = _pc1_sql()




# plans.pipeline.minhash_lsh_eval — candidate recall/precision of the 4x2
# banding against the exact >=0.7 Jaccard truth (same CTE family as
# DEDUP_MINHASH_LSH)
MINHASH_LSH_EVAL = f"""
WITH {TOKL},
{SHINGLES3},
{_minhash_ctes(bands=4, rows_per_band=2)},
{JACCARD},
truth AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.7),
tp AS (SELECT t.id_a, t.id_b FROM truth t JOIN cands c USING (id_a, id_b))
SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
       (SELECT count(*) FROM cands)::BIGINT AS n_candidates,
       (SELECT count(*) FROM tp)::BIGINT AS tp,
       round((SELECT count(*) FROM tp)::DOUBLE
             / (SELECT count(*) FROM truth)::DOUBLE, 6) AS candidate_recall,
       round((SELECT count(*) FROM tp)::DOUBLE
             / (SELECT count(*) FROM cands)::DOUBLE, 6) AS candidate_precision
"""




# plans.pipeline.dedup_token_savings — the canonical-election closure
# (DEDUP_CANONICAL's CTEs) composed with per-source token accounting
DEDUP_TOKEN_SAVINGS = f"""
WITH RECURSIVE {TOKL},
{SHINGLES3},
{JACCARD},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jac WHERE jaccard >= 0.5
  UNION
  SELECT id_b AS a, id_a AS b FROM jac WHERE jaccard >= 0.5
),
reach(n, m) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
),
comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
clustered AS (
  SELECT c.node, c.component, d.n_chars FROM comp c
  JOIN documents d ON d.doc_id = c.node
),
canon AS (
  SELECT component, node AS canon_id FROM (
    SELECT component, node,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, node ASC) AS rn
    FROM clustered) WHERE rn = 1
),
lab AS (SELECT cl.node, ca.canon_id FROM clustered cl JOIN canon ca USING (component)),
kept AS (
  SELECT d.doc_id, d.source,
         (coalesce(l.canon_id, d.doc_id) = d.doc_id) AS is_kept,
         len(t.ts)::BIGINT AS n_tok
  FROM documents d
  LEFT JOIN lab l ON l.node = d.doc_id
  JOIN tokl t ON t.doc_id = d.doc_id
)
SELECT source,
       sum(n_tok)::BIGINT AS total_tokens,
       sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)::BIGINT AS kept_tokens,
       round(1.0 - sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)::DOUBLE
             / sum(n_tok)::DOUBLE, 6) AS savings_frac
FROM kept GROUP BY source ORDER BY source
"""


PIPELINE_ORACLES: dict[str, str] = {
    "span_dedup": SPAN_DEDUP,
    "dedup_incremental": DEDUP_INCREMENTAL,
    "nb_language_classifier": NB_CLASSIFIER,
    "nb_confusion_matrix": NB_CONFUSION,
    "quality_band_tokens": QUALITY_BAND_TOKENS,
    "pagerank_top_docs": PAGERANK_TOP_DOCS,
    "bpe_learn_merges": BPE_LEARN_MERGES,
    "bpe_vocab_usage": BPE_VOCAB_USAGE,
    "bpe_learned_fertility": BPE_LEARNED_FERTILITY,
    "lpa_communities": LPA_COMMUNITIES,
    "bigram_pmi": BIGRAM_PMI,
    "events_robust_outliers": EVENTS_ROBUST_OUTLIERS,
    "audio_window_stats": AUDIO_WINDOW_STATS,
    "wav_window_stats": WAV_WINDOW_STATS,
    "snapshot_scd2": SNAPSHOT_SCD2,
    "frame_sample": FRAME_SAMPLE,
    "skew_salted_agg": SKEW_SALTED_AGG,
    "zorder_bucket_counts": ZORDER_BUCKETS,
    "seq_pack": SEQ_PACK,
    "phrase_match": PHRASE_MATCH,
    "source_cap": SOURCE_CAP,
    "bigram_logprob_score": BIGRAM_LOGPROB,
    # nprobe == n_clusters degenerates the IVF near-dup to the exact
    # all-pairs kernel, so it shares dedup_embedding_cosine's oracle
    "dedup_embedding_ivf": DEDUP_EMBEDDING_COSINE,
    "multimodal_resize_stats": MULTIMODAL_RESIZE,
    "doc_chunks": DOC_CHUNKS,
    "rag_retrieve": RAG_RETRIEVE,
    "pii_redact": PII_REDACT,
    "dedup_components_star": DEDUP_COMPONENTS,
    "dedup_exact": DEDUP_EXACT,
    "dedup_minhash_lsh": DEDUP_MINHASH_LSH,
    "dedup_edit_distance": DEDUP_EDIT_DISTANCE,
    "dedup_source_matrix": DEDUP_SOURCE_MATRIX,
    "blob_dedup_manifest": BLOB_DEDUP_MANIFEST,
    "doc_quality_skyline": DOC_QUALITY_SKYLINE,
    "ppr_top_docs": PPR_TOP_DOCS,
    "link_hop_distances": LINK_HOP_DISTANCES,
    "ngram_jaccard_pairs": NGRAM_JACCARD,
    "dedup_components": DEDUP_COMPONENTS,
    "dedup_kcore": DEDUP_KCORE,
    "events_retention": EVENTS_RETENTION,
    "decontaminate": DECONTAMINATE,
    # bloom prefilter + exact re-verify ≡ exact (no false negatives), so the
    # scale path answers to the same SQL as the broadcast-exact path
    "decontaminate_bloom": DECONTAMINATE,
    "source_minhash_similarity": SOURCE_MINHASH_SIMILARITY,
    "embedding_centroid_outliers": EMBEDDING_CENTROID_OUTLIERS,
    "embedding_drift": EMBEDDING_DRIFT,
    "source_token_kl": SOURCE_TOKEN_KL,
    "source_token_js": SOURCE_TOKEN_JS,
    "sorted_neighborhood_dedup": SORTED_NEIGHBORHOOD,
    "stratified_sample_exact_k": STRATIFIED_EXACT_K,
    "url_domain_stats": URL_DOMAIN_STATS,
    "oov_rate_stats": OOV_RATE_STATS,
    "user_purge_counts": USER_PURGE_COUNTS,
    "multimodal_binary_stats": MULTIMODAL_BINARY,
    "unigram_logprob_score": UNIGRAM_LOGPROB,
    "doc_repetition": DOC_REPETITION,
    "dedup_simhash": DEDUP_SIMHASH,
    "dedup_embedding_cosine": DEDUP_EMBEDDING_COSINE,
    "token_stats": TOKEN_STATS,
    "bpe_token_stats": BPE_TOKEN_STATS,
    "language_id": LANGUAGE_ID,
    "quality_score": QUALITY_SCORE,
    "quality_curriculum": QUALITY_CURRICULUM,
    "doc_fingerprints": DOC_FINGERPRINTS,
    "sample_deterministic": SAMPLE_DETERMINISTIC,
    "weighted_sample_docs": WEIGHTED_SAMPLE_DOCS,
    "snapshot_diff": SNAPSHOT_DIFF,
    "dedup_cluster_sizes": DEDUP_CLUSTER_SIZES,
    # materialize-once closure twins: same output contract as the
    # self-contained queries, so the same SQL replays them — the shared
    # variants differ only in WHERE the components relation comes from
    "dedup_canonical_shared": DEDUP_CANONICAL,
    "dedup_cluster_sizes_shared": DEDUP_CLUSTER_SIZES,
    "token_fertility_by_lang": TOKEN_FERTILITY,
    "stratified_sample": STRATIFIED_SAMPLE,
    "dataset_split_counts": DATASET_SPLIT_COUNTS,
    "epoch_shuffle_order": EPOCH_SHUFFLE_ORDER,
    "dense_doc_ids": DENSE_DOC_IDS,
    "epoch_shard_manifest": EPOCH_SHARD_MANIFEST,
    "lang_temperature_mix": LANG_TEMPERATURE_MIX,
    "corpus_clean": CORPUS_CLEAN,
    "corpus_clean_funnel": CORPUS_CLEAN_FUNNEL,
    "training_manifest": TRAINING_MANIFEST,
    "gopher_quality_rules": GOPHER_RULES,
    "duplicate_spans": DUPLICATE_SPANS,
    "char_entropy_score": CHAR_ENTROPY,
    "dedup_canonical": DEDUP_CANONICAL,
    "embedding_sign_buckets": EMBEDDING_SIGN_BUCKETS,
    "dedup_simhash_pairs": DEDUP_SIMHASH_PAIRS,
    "doc_keywords_tfidf": DOC_KEYWORDS,
    "source_mixture_weights": SOURCE_MIXTURE,
    "semdedup_prune": SEMDEDUP_PRUNE,
    "embedding_mahalanobis_outliers": EMBEDDING_MAHALANOBIS,
    "ngram_novelty_scores": NGRAM_NOVELTY,
    "katz_central_docs": KATZ_CENTRAL_DOCS,
    "hits_hub_authority": HITS_HUB_AUTHORITY,
    "flesch_reading_ease": FLESCH_READING_EASE,
    "token_zipf_fit": TOKEN_ZIPF_FIT,
    "source_keyness_g2": SOURCE_KEYNESS_G2,
    "tfidf_doc_pairs": TFIDF_DOC_PAIRS,
    "ngram_containment_pairs": NGRAM_CONTAINMENT,
    "harmonic_central_docs": HARMONIC_CENTRAL_DOCS,
    "embedding_pc1_variance": EMBEDDING_PC1,
    "minhash_lsh_eval": MINHASH_LSH_EVAL,
    "dedup_token_savings": DEDUP_TOKEN_SAVINGS,
}
