"""DuckDB oracle SQL for every query in queries.py (where SQL-expressible).

Each SQL string re-computes the Spark query's result from first principles
on the same parquet tables (pre-registered views: region nation customer
supplier part orders lineitem events documents embeddings). The driver
compares row counts, schemas, and order-insensitive value hashes.

Engine-parity rules baked into these strings:
- null = absent: every keyword predicate passes on NULL; `required` alone
  checks presence (nodes.py null convention)
- md5-only hashing; regexp_replace needs the 'g' flag in DuckDB (Spark
  replaces all matches by default)
- float outputs rounded identically on both sides
- cumulative windows use RANGE (ties) exactly like the Spark plan
"""

from __future__ import annotations

from jsonschema_rs_spark.operators.similarity import hyperplane_signs
from jsonschema_rs_spark.operators.table_checks import KS_SKETCH_K
from jsonschema_rs_spark.operators.text_analysis import (
    BPE_TOKEN_RE, LANG_MARKERS, STOPWORDS)

# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

_EVENTS_VALID = """
 (event_type IS NOT NULL AND ts IS NOT NULL
  AND (event_type IS NULL OR event_type IN ('click','view','signup','purchase'))
  AND (value IS NULL OR (value >= 0 AND value <= 150))
  AND (user_id IS NULL OR user_id >= 0)
  AND (props IS NULL OR (regexp_matches(props, '^\\{{.*\\}}$')
       AND length(props) >= 2 AND length(props) <= 64)))
""".replace("{{", "{").replace("}}", "}")

VAL_EVENTS_FLAG = f"""
SELECT event_id, {_EVENTS_VALID} AS valid FROM events
"""

VAL_EVENTS_VIOLATIONS = """
SELECT event_id, 'required' AS keyword FROM events WHERE event_type IS NULL
UNION ALL
SELECT event_id, 'required' FROM events WHERE ts IS NULL
UNION ALL
SELECT event_id, 'enum' FROM events
 WHERE event_type IS NOT NULL
   AND event_type NOT IN ('click','view','signup','purchase')
UNION ALL
SELECT event_id, 'minimum' FROM events WHERE value IS NOT NULL AND value < 0
UNION ALL
SELECT event_id, 'maximum' FROM events WHERE value IS NOT NULL AND value > 150
UNION ALL
SELECT event_id, 'minimum' FROM events
 WHERE user_id IS NOT NULL AND user_id < 0
UNION ALL
SELECT event_id, 'pattern' FROM events
 WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\\{.*\\}$')
UNION ALL
SELECT event_id, 'minLength' FROM events
 WHERE props IS NOT NULL AND length(props) < 2
UNION ALL
SELECT event_id, 'maxLength' FROM events
 WHERE props IS NOT NULL AND length(props) > 64
"""

_DOCS_VALID = """
 (doc_id IS NOT NULL AND text IS NOT NULL
  AND (lang IS NULL OR lang IN ('en','es','de','fr'))
  AND (source IS NULL OR regexp_matches(source, '^src[0-4]$'))
  AND (n_chars IS NULL OR (n_chars >= 50 AND n_chars <= 500))
  AND (text IS NULL OR length(text) >= 20))
"""

VAL_DOCS_FLAG = f"SELECT doc_id, {_DOCS_VALID} AS valid FROM documents"

VAL_DOCS_SUMMARY = f"""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN {_DOCS_VALID} THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(count(*) - sum(CASE WHEN {_DOCS_VALID} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_invalid
FROM documents
"""

_LINEITEM_VALID = """
 ((l_quantity IS NULL OR (l_quantity % 5) = 0)
  AND (l_discount IS NULL OR (l_discount >= 0 AND l_discount < 0.08))
  AND (l_returnflag IS NULL OR l_returnflag IN ('A','N')))
"""

VAL_LINEITEM_FLAG = f"""
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CASE WHEN {_LINEITEM_VALID} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_valid
FROM lineitem GROUP BY l_returnflag
"""

# dynamic JSON via DuckDB's JSON functions; mirrors the variant compiler's
# semantics: required presence, integer = number with zero fraction,
# bounds pass for non-numbers (but type already failed them)
VAL_JSON_PROPS = """
SELECT event_id,
 (props IS NULL OR
  (json_valid(props) AND json_type(props) = 'OBJECT'
   AND json_extract(props, '$.k') IS NOT NULL
   AND (json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        OR (json_type(props, '$.k') = 'DOUBLE'
            AND CAST(json_extract(props, '$.k') AS DOUBLE)
                = floor(CAST(json_extract(props, '$.k') AS DOUBLE))))
   AND (json_type(props, '$.k') NOT IN ('BIGINT','UBIGINT','DOUBLE')
        OR (CAST(json_extract(props, '$.k') AS DOUBLE) >= 0
            AND CAST(json_extract(props, '$.k') AS DOUBLE) <= 50))))
 AS valid
FROM events
"""

# typed-path composition keywords over events: $ref -> minimum; oneOf
# over disjoint ranges; not(const); anyOf(const | minLength); if/then
VAL_EVENTS_COMPOSED = """
SELECT event_id,
 ((value IS NULL OR value >= 0)
  AND (user_id IS NULL OR user_id <= 100 OR user_id >= 900)
  AND (event_type IS NULL OR event_type <> 'error')
  AND (props IS NULL OR props = '{}' OR length(props) >= 10)
  AND (CASE WHEN event_type = 'purchase'
       THEN (value IS NULL OR value > 0) ELSE TRUE END))
 AS valid
FROM events
"""

VAL_DOCS_UNIQUE_TOKENS = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
 (toks IS NULL OR (len(toks) >= 1
                   AND len(list_distinct(toks)) = len(toks))) AS valid
FROM t
"""

# spans: media_ref is set for every 5th token (i=5,10,...), so a doc has
# an unevaluated property iff it has >= 5 tokens
VAL_SPANS_UNEVALUATED = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
SELECT doc_id, (toks IS NULL OR len(toks) < 5) AS valid FROM t
"""

# spans derived from documents.text: token i (0-based) → span; every 5th is
# an image. Mirrors queries.derived_spans_df exactly.
_SPANS_CTE = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
"""

VAL_SPANS_FLAG = _SPANS_CTE + """
SELECT doc_id,
 (len(toks) >= 1 AND len(toks) <= 500
  AND list_bool_and(list_transform(range(1, len(toks)+1), i ->
        length(toks[i]) >= 1 AND length(toks[i]) <= 6))
  AND list_bool_or(list_transform(range(1, len(toks)+1), i ->
        ((i-1) % 5) = 4))
 ) AS valid
FROM t
"""

VAL_SPANS_VIOLATIONS = _SPANS_CTE + """, v AS (
SELECT doc_id,
  len(list_filter(list_transform(range(1, len(toks)+1), i ->
        length(toks[i]) < 1), x -> x)) AS n_minlen,
  len(list_filter(list_transform(range(1, len(toks)+1), i ->
        length(toks[i]) > 6), x -> x)) AS n_maxlen,
  CASE WHEN list_bool_or(list_transform(range(1, len(toks)+1), i ->
        ((i-1) % 5) = 4)) THEN 0 ELSE 1 END AS n_contains
FROM t)
SELECT keyword, CAST(n_violations AS BIGINT) AS n_violations FROM (
  SELECT 'minLength' AS keyword, sum(n_minlen) AS n_violations FROM v
  UNION ALL
  SELECT 'maxLength', sum(n_maxlen) FROM v
  UNION ALL
  SELECT 'contains', sum(n_contains) FROM v
) WHERE n_violations > 0
"""

# ---------------------------------------------------------------------------
# table-level checks
# ---------------------------------------------------------------------------


def _stats_one(col: str) -> str:
    return f"""
SELECT '{col}' AS "column", count(*) AS n_rows,
  CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  round(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE), 6) AS null_rate,
  CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
  CAST(min({col}) AS VARCHAR) AS min_value,
  CAST(max({col}) AS VARCHAR) AS max_value
FROM documents"""


STATS_DOCUMENTS = " UNION ALL ".join(
    _stats_one(c) for c in ["doc_id", "text", "lang", "source", "n_chars"])

VAL_DOCS_KEYWORD_SUMMARY = """
SELECT keyword, count(*) AS n_violations FROM (
  SELECT doc_id, 'required' AS keyword FROM documents WHERE doc_id IS NULL
  UNION ALL
  SELECT doc_id, 'required' FROM documents WHERE text IS NULL
  UNION ALL
  SELECT doc_id, 'enum' FROM documents
   WHERE lang IS NOT NULL AND lang NOT IN ('en','es','de','fr')
  UNION ALL
  SELECT doc_id, 'pattern' FROM documents
   WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-4]$')
  UNION ALL
  SELECT doc_id, 'minimum' FROM documents
   WHERE n_chars IS NOT NULL AND n_chars < 50
  UNION ALL
  SELECT doc_id, 'maximum' FROM documents
   WHERE n_chars IS NOT NULL AND n_chars > 500
  UNION ALL
  SELECT doc_id, 'minLength' FROM documents
   WHERE text IS NOT NULL AND length(text) < 20
) GROUP BY keyword
"""

# hierarchical rollup: violation schema-paths expanded to every prefix
# (evaluate().hierarchical() analog) — paths mirror the typed compiler's
# Rule.schema_path values for DOCS_SCHEMA
OUTPUT_UNITS_DOCS = """
-- Structured Output v1 unit counts, recomputed from first principles:
-- per doc the unit tree is root + /type + /required + /properties, plus
-- per PRESENT property its subschema-root unit and one unit per
-- assertion keyword ({type,minimum}=3, {type,minLength}=3, {enum}=2,
-- {type,minimum}=3). Validity of every unit is re-derived in SQL.
WITH d AS (
  SELECT doc_id,
         doc_id IS NOT NULL AS has_id,
         text IS NOT NULL AS has_text,
         lang IS NOT NULL AS has_lang,
         n_chars IS NOT NULL AS has_nc,
         COALESCE(doc_id >= 0, true) AS id_ok,
         COALESCE(length(text) >= 100, true) AS ml_ok,
         COALESCE(lang IN ('en','de','fr','es'), true) AS enum_ok,
         COALESCE(n_chars >= 100, true) AS nc_ok,
         (doc_id IS NOT NULL AND text IS NOT NULL
          AND lang IS NOT NULL) AS req_ok
  FROM documents
), u AS (
  SELECT doc_id,
         (req_ok AND id_ok AND ml_ok AND enum_ok AND nc_ok) AS valid,
         (id_ok AND ml_ok AND enum_ok AND nc_ok) AS props_ok,
         4
         + CASE WHEN has_id THEN 3 ELSE 0 END
         + CASE WHEN has_text THEN 3 ELSE 0 END
         + CASE WHEN has_lang THEN 2 ELSE 0 END
         + CASE WHEN has_nc THEN 3 ELSE 0 END AS n_units,
         1  -- /type (always an object here)
         + CASE WHEN req_ok THEN 1 ELSE 0 END
         + CASE WHEN has_id THEN 1 + 2 * CAST(id_ok AS INT) ELSE 0 END
         + CASE WHEN has_text THEN 1 + 2 * CAST(ml_ok AS INT) ELSE 0 END
         + CASE WHEN has_lang THEN 2 * CAST(enum_ok AS INT) ELSE 0 END
         + CASE WHEN has_nc THEN 1 + 2 * CAST(nc_ok AS INT) ELSE 0 END
           AS n_valid_wo_root_props
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_units AS INT) AS n_units,
       CAST(n_valid_wo_root_props
            + CAST(valid AS INT) + CAST(props_ok AS INT) AS INT)
         AS n_valid_units,
       valid
FROM u
"""

# Round-3 unit families (not / if-then-else / dependentSchemas /
# propertyNames / patternProperties / unevaluatedProperties), recomputed
# from first principles for OUTPUT_UNITS_EXT_SCHEMA over documents
# (all five serialized columns are non-null at every SF — presence is
# constant, validity varies by value). Per-family units:
#   root 1; not 3 (self valid + 2 invalid child units, media_ref absent);
#   if 4 (subtree root/properties/text-root/minLength — all valid iff
#   len(text)>=100); then 4 when if passed (valid iff n_chars>=100);
#   else 4 when if failed (valid iff lang in (en,de));
#   dependentSchemas/source 2 (always active, always valid);
#   propertyNames 11 (self + 2 per key, all valid);
#   patternProperties 5 (self + 2 per matching key lang/source, valid);
#   unevaluatedProperties: if passed -> only doc_id uncovered (3 units),
#   else doc_id/text/n_chars uncovered (7 units), all valid.
OUTPUT_UNITS_EXT = """
WITH d AS (
  SELECT doc_id,
         length(text) >= 100 AS if_ok,
         n_chars >= 100 AS nc_ok,
         lang IN ('en','de') AS lang_ok
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN if_ok THEN 33 ELSE 37 END AS INT) AS n_units,
       CAST(1 + 2 + 11 + 5                    -- not-self, ds, pn, pp
            + CASE WHEN if_ok
                   THEN 4 + 4 * CAST(nc_ok AS INT) + 3
                   ELSE 4 * CAST(lang_ok AS INT) + 7 END
            + CAST(CASE WHEN if_ok THEN nc_ok ELSE lang_ok END AS INT)
         AS INT) AS n_valid_units,
       CASE WHEN if_ok THEN nc_ok ELSE lang_ok END AS valid
FROM d
"""

VAL_DOCS_HIERARCHY = """
WITH viol AS (
  SELECT '/properties/lang/enum' AS p FROM documents
   WHERE lang IS NOT NULL AND lang NOT IN ('en','es','de','fr')
  UNION ALL
  SELECT '/properties/source/pattern' FROM documents
   WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-4]$')
  UNION ALL
  SELECT '/properties/n_chars/minimum' FROM documents
   WHERE n_chars IS NOT NULL AND n_chars < 50
  UNION ALL
  SELECT '/properties/n_chars/maximum' FROM documents
   WHERE n_chars IS NOT NULL AND n_chars > 500
  UNION ALL
  SELECT '/properties/text/minLength' FROM documents
   WHERE text IS NOT NULL AND length(text) < 20
  UNION ALL
  SELECT '/required' FROM documents WHERE doc_id IS NULL
  UNION ALL
  SELECT '/required' FROM documents WHERE text IS NULL
),
parts AS (SELECT string_split(p, '/') AS sp FROM viol),
pref AS (
  SELECT array_to_string(list_slice(sp, 1, i), '/') AS schema_prefix,
         CAST(i - 1 AS INT) AS depth
  FROM parts, unnest(range(2, len(sp) + 1)) AS t(i))
SELECT schema_prefix, depth, count(*) AS n_violations
FROM pref GROUP BY 1, 2
"""

UNIQ_RATIO_ORDERS = """
WITH c AS (SELECT o_custkey, count(*) AS c FROM orders GROUP BY o_custkey)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
             / CAST(sum(c) AS DOUBLE), 6) AS dup_row_ratio
FROM c
"""

UNIQ_ORDERS_CUSTKEY = """
SELECT o_custkey, count(*) AS n_dup FROM orders
GROUP BY o_custkey HAVING count(*) > 1
"""

RI_ORDERS_CUSTOMER = """
SELECT o_custkey, count(*) AS n_dangling FROM orders
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_custkey IS NOT NULL)
GROUP BY o_custkey
"""

RI_EVENTS_CUSTOMER = """
SELECT user_id, count(*) AS n_dangling FROM events
WHERE user_id IS NOT NULL
  AND user_id NOT IN (SELECT c_custkey FROM customer
                      WHERE c_custkey IS NOT NULL)
GROUP BY user_id
"""

# k (quantile points per side) comes from the SAME constant the Spark
# plan uses (table_checks.KS_SKETCH_K) so rank selection and the 2/k
# bound cannot silently diverge between engine and oracle
_KS_EVENTS_VALUE_T = """
WITH u AS (
  SELECT value AS v, 1 AS ia, 0 AS ib FROM events
   WHERE event_type = 'click' AND value IS NOT NULL
  UNION ALL
  SELECT value, 0, 1 FROM events
   WHERE event_type = 'error' AND value IS NOT NULL),
c AS (SELECT
  sum(ia) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS ca,
  sum(ib) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cb
  FROM u),
t AS (SELECT CAST(max(ca) AS BIGINT) AS na, CAST(max(cb) AS BIGINT) AS nb
      FROM c),
ex AS (SELECT t.na, t.nb,
       max(abs(ca / CAST(t.na AS DOUBLE)
             - cb / CAST(t.nb AS DOUBLE))) AS ks_raw
       FROM c, t GROUP BY t.na, t.nb),
-- sketch path: k rank-selected quantile points per side (the last
-- order statistic of each of the k equal-probability CDF buckets,
-- integer-div bucket index so the selection is bit-identical to the
-- Spark plan), then max point-CDF gap over the union of points
ra AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
       FROM u WHERE ia = 1),
rb AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
       FROM u WHERE ib = 1),
p AS (
  SELECT v, 1 AS ia, 0 AS ib FROM ra
   WHERE (rn * {k}) // n > ((rn - 1) * {k}) // n
  UNION ALL
  SELECT v, 0, 1 FROM rb
   WHERE (rn * {k}) // n > ((rn - 1) * {k}) // n),
kc AS (SELECT CAST(sum(ia) AS BIGINT) AS ka, CAST(sum(ib) AS BIGINT) AS kb
       FROM p),
pc AS (SELECT
  sum(ia) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS ca,
  sum(ib) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cb
  FROM p),
sk AS (SELECT max(abs(ca / CAST(kc.ka AS DOUBLE)
                    - cb / CAST(kc.kb AS DOUBLE))) AS sk_raw
       FROM pc, kc)
SELECT ex.na AS n_a, ex.nb AS nb_out,
       round(ex.ks_raw, 6) AS ks_stat,
       round(sk.sk_raw, 6) AS ks_sketch,
       (abs(round(ex.ks_raw, 6) - round(sk.sk_raw, 6))
        <= 2.0 / {k} + 2e-6) AS within_bound
FROM ex, sk
""".replace("nb_out", "n_b")
KS_EVENTS_VALUE = _KS_EVENTS_VALUE_T.format(k=KS_SKETCH_K)

CHISQ_EVENTS_HALVES = """
WITH mid AS (SELECT CAST(max(event_id) // 2 AS BIGINT) AS m FROM events),
o AS (SELECT event_type AS cat, count(*) AS n_o
      FROM events, mid WHERE event_id <= m GROUP BY event_type),
r AS (SELECT event_type AS cat, count(*) AS n_r
      FROM events, mid WHERE event_id > m GROUP BY event_type),
b AS (SELECT coalesce(o.n_o, 0) AS n_o, coalesce(r.n_r, 0) AS n_r
      FROM o FULL OUTER JOIN r ON o.cat IS NOT DISTINCT FROM r.cat),
j AS (SELECT n_o, n_r, sum(n_o) OVER () AS tot_o, sum(n_r) OVER () AS tot_r
      FROM b)
SELECT
  round(sum(
    (CASE WHEN (n_o + n_r) * tot_o / CAST(tot_o + tot_r AS DOUBLE) >= 1.0
      THEN pow(n_o - (n_o + n_r) * tot_o / CAST(tot_o + tot_r AS DOUBLE), 2)
           / ((n_o + n_r) * tot_o / CAST(tot_o + tot_r AS DOUBLE))
      ELSE 0.0 END)
    + (CASE WHEN (n_o + n_r) * tot_r / CAST(tot_o + tot_r AS DOUBLE) >= 1.0
      THEN pow(n_r - (n_o + n_r) * tot_r / CAST(tot_o + tot_r AS DOUBLE), 2)
           / ((n_o + n_r) * tot_r / CAST(tot_o + tot_r AS DOUBLE))
      ELSE 0.0 END)), 6) AS chi2,
  CAST(greatest(sum(CASE WHEN
        (n_o + n_r) * tot_o / CAST(tot_o + tot_r AS DOUBLE) >= 1.0
        OR (n_o + n_r) * tot_r / CAST(tot_o + tot_r AS DOUBLE) >= 1.0
      THEN 1 ELSE 0 END) - 1, 0) AS BIGINT) AS dof,
  CAST(max(tot_o) AS BIGINT) AS n_obs,
  CAST(max(tot_r) AS BIGINT) AS n_ref
FROM j
"""

# windowed goodness-of-fit drift (queries.drift_windows): 6h event-time
# windows vs the table's global event_type distribution. time_bucket and
# Spark's window() are both epoch-aligned for sub-day intervals, so
# boundaries agree; p = n_c/N is the same IEEE double both sides.
DRIFT_WINDOWS = """
WITH ref AS (
  SELECT event_type AS cat,
         count(*) / CAST((SELECT count(*) FROM events) AS DOUBLE) AS p
  FROM events GROUP BY 1),
wc AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, event_type AS cat,
         count(*) AS n_c
  FROM events GROUP BY 1, 2),
wn AS (SELECT time_bucket(INTERVAL '6 hours', ts) AS ws,
              CAST(count(*) AS BIGINT) AS n
       FROM events GROUP BY 1),
terms AS (
  SELECT wn.ws, wn.n, ref.p, coalesce(wc.n_c, 0) AS n_c
  FROM wn CROSS JOIN ref
  LEFT JOIN wc ON wc.ws = wn.ws AND wc.cat IS NOT DISTINCT FROM ref.cat)
SELECT ws, n,
       round(sum(CASE WHEN n * p >= 1.0
                      THEN pow(n_c - n * p, 2) / (n * p)
                      ELSE 0.0 END), 6) AS chi2,
       CAST((SELECT count(*) - 1 FROM ref) AS BIGINT) AS dof,
       CAST(max(n) - sum(n_c) AS BIGINT) AS n_unexpected
FROM terms GROUP BY ws, n
"""

# Spark width_bucket(v, lo, hi, n): 0 below lo, n+1 at/above hi, else
# floor((v-lo)/((hi-lo)/n)) + 1
HIST_ORDERS_TOTAL = """
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 500000.0 THEN 11
            ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS BIGINT)
         AS bucket,
       count(*) AS n
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

# ---------------------------------------------------------------------------
# text analysis / dedup
# ---------------------------------------------------------------------------

_NORM = ("trim(regexp_replace(regexp_replace(lower(text),"
         "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))")

_WS_COUNT = ("CASE WHEN trim(text) = '' THEN 0 "
             "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END")


def _marker_sql(markers: list[str]) -> str:
    pat = "\\b(" + "|".join(markers) + ")\\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


def _lang_sql() -> str:
    langs = sorted(LANG_MARKERS)
    hits = {lang: _marker_sql(LANG_MARKERS[lang]) for lang in langs}
    m = "greatest(" + ", ".join(hits[lang] for lang in langs) + ")"
    cases = " ".join(
        f"WHEN {hits[lang]} = {m} THEN '{lang}'" for lang in langs)
    # ELSE catches NULL text (all hits NULL): 'und', like the engine
    return f"(CASE WHEN {m} < 1 THEN 'und' {cases} ELSE 'und' END)"


_N_PUNCT = "len(regexp_extract_all(text, '[^\\w\\s]'))"
_N_DIGIT = "len(regexp_extract_all(text, '[0-9]'))"
_N_STOP = _marker_sql(STOPWORDS)
_SAFE_TOK = f"greatest({_WS_COUNT}, 1)"
_SAFE_CHR = "greatest(length(text), 1)"
_PUNCT_RATIO = f"({_N_PUNCT} / CAST({_SAFE_CHR} AS DOUBLE))"
_DIGIT_RATIO = f"({_N_DIGIT} / CAST({_SAFE_CHR} AS DOUBLE))"
_STOP_RATIO = f"({_N_STOP} / CAST({_SAFE_TOK} AS DOUBLE))"

_QUALITY = f"""
(CASE WHEN text IS NULL THEN 0.0 ELSE greatest(1.0
  - (CASE WHEN {_WS_COUNT} < 5 THEN 0.4 ELSE 0.0 END)
  - (CASE WHEN {_PUNCT_RATIO} > 0.2 THEN 0.2 ELSE 0.0 END)
  - (CASE WHEN {_DIGIT_RATIO} > 0.3 THEN 0.2 ELSE 0.0 END)
  - (CASE WHEN {_STOP_RATIO} < 0.05 THEN 0.2 ELSE 0.0 END), 0.0) END)
"""

TEXT_FEATURES = f"""
SELECT doc_id,
  CAST({_WS_COUNT} AS INT) AS n_tokens_ws,
  CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INT)
      AS n_tokens_bpe,
  {_lang_sql()} AS lang_pred,
  round({_PUNCT_RATIO}, 6) AS punct_ratio,
  round({_STOP_RATIO}, 6) AS stopword_ratio,
  round({_QUALITY}, 6) AS quality,
  md5({_NORM}) AS fp
FROM documents
"""

FP_COUNTS = f"""
SELECT md5({_NORM}) AS fp, count(*) AS n_docs FROM documents GROUP BY 1
"""

# word shingles (n=3, distinct) over normalized text — mirrors
# dedup.word_shingles
_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))")


def _minhash_sql(num_hashes: int = 8) -> str:
    from jsonschema_rs_spark.operators.dedup import (MINHASH_PRIME,
                                                     minhash_params)
    mins = ", ".join(
        f"list_aggregate(list_transform(hs, h -> "
        f"({a} * h + {b}) % {MINHASH_PRIME}), 'min')"
        for a, b in minhash_params(num_hashes))
    return f"""
WITH t AS (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM documents),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
hh AS (SELECT doc_id, list_transform(sh,
         x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM s)
SELECT doc_id, concat_ws(',', {mins}) AS sig FROM hh
"""


MINHASH_SIGS = _minhash_sql(8)


def _simhash_sql(bits: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hs, v -> "
        f"CASE WHEN ((v >> {j}) & 1) = 1 THEN 1 ELSE -1 END), 'sum') > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(bits))
    return f"""
WITH t AS (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM documents),
h AS (SELECT doc_id, list_transform(toks,
        x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM t)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM h
"""


SIMHASH_VALS = _simhash_sql(32)

# exact all-pairs hamming check (queries.simhash_pairs): the engine's
# pigeonhole-banded join has guaranteed full recall for
# max_hamming < chunks, so exact equality against the O(N^2) oracle is
# the correct expectation
SIMHASH_PAIRS = f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM ({SIMHASH_VALS}) a JOIN ({SIMHASH_VALS}) b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

def _curate_sql(num_hashes: int = 16, bands: int = 8,
                quality_threshold: float = 0.7,
                jaccard_threshold: float = 0.6) -> str:
    from jsonschema_rs_spark.operators.dedup import (MINHASH_PRIME,
                                                     minhash_params)
    rpb = num_hashes // bands
    sigs = ", ".join(
        f"list_aggregate(list_transform(hs, h -> "
        f"({a} * h + {b}) % {MINHASH_PRIME}), 'min')"
        for a, b in minhash_params(num_hashes))
    key_selects = " UNION ALL ".join(
        "SELECT doc_id, md5('{b}#' || {parts}) AS bk FROM sg".format(
            b=b,
            parts=" || ',' || ".join(
                f"sig[{b * rpb + j + 1}]::VARCHAR" for j in range(rpb)))
        for b in range(bands))
    common = ("len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))")
    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents WHERE {_QUALITY} >= {quality_threshold}
),
fps AS (SELECT doc_id, text, md5({_NORM}) AS fp FROM gated),
keep AS (SELECT fp, min(doc_id) AS k FROM fps GROUP BY fp),
exact AS (SELECT f.doc_id, f.text FROM fps f
          JOIN keep ON f.fp = keep.fp AND f.doc_id = keep.k),
tk AS (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM exact),
shx AS (SELECT doc_id, {_SHINGLES} AS sh FROM tk),
hh AS (SELECT doc_id, sh,
         list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)
           AS hs FROM shx),
sg AS (SELECT doc_id, sh, [{sigs}] AS sig FROM hh),
keys AS ({key_selects}),
cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         FROM keys a JOIN keys b USING (bk) WHERE a.doc_id < b.doc_id),
ver AS (SELECT ia, ib FROM cand
        JOIN shx sa ON sa.doc_id = ia JOIN shx sb ON sb.doc_id = ib
        WHERE {common}
              / CAST(len(sa.sh) + len(sb.sh) - {common} AS DOUBLE)
              >= {jaccard_threshold}),
dropped AS (SELECT DISTINCT ib FROM ver)
SELECT doc_id FROM exact
WHERE doc_id NOT IN (SELECT ib FROM dropped)
"""


# banding mirrors queries.curate_docs: num_hashes="auto" at Jaccard 0.6
# derives (39, 13) via dedup.adaptive_minhash_banding
def _adaptive_minhash(threshold: float) -> tuple[int, int]:
    from jsonschema_rs_spark.operators.dedup import adaptive_minhash_banding

    return adaptive_minhash_banding(threshold)


CURATE_DOCS = _curate_sql(*_adaptive_minhash(0.6))

# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

_COS = ("(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))")

SIM_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      FROM embeddings),
s AS (SELECT query_id, neighbor_id,
        round({_COS.format(a='cv', b='qv')}, 6) AS sim
      FROM c CROSS JOIN q)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= 5
"""


def _bucket_sql(vec_expr: str, n_planes: int = 8, dim: int = 64) -> str:
    planes = hyperplane_signs(n_planes, dim)
    parts = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(s)}" for s in plane) + "]::DOUBLE[]"
        parts.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


ANN_LSH = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             {_bucket_sql('embedding::DOUBLE[]')} AS b
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             {_bucket_sql('embedding::DOUBLE[]')} AS b
      FROM embeddings),
s AS (SELECT query_id, neighbor_id,
        round({_COS.format(a='cv', b='qv')}, 6) AS sim
      FROM c JOIN q USING (b))
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= 5
"""

# IVF-flat ANN re-derived: hash-seeded centroids → nearest-centroid
# assignment (9dp-rounded sim, centroid-id tiebreak — identical float
# fold order on both engines) → per-query n_probe lists → exact re-rank
ANN_IVF = f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(id::VARCHAR)) AS INT)
           AS centroid_id, e AS c
  FROM (SELECT id, e FROM v ORDER BY md5(id::VARCHAR) LIMIT 16)),
assign AS (
  SELECT id, centroid_id FROM (
    SELECT v.id, s.centroid_id,
           row_number() OVER (PARTITION BY v.id
             ORDER BY round({_COS.format(a='v.e', b='s.c')}, 9) DESC,
                      s.centroid_id) AS r
    FROM v CROSS JOIN seeds s) WHERE r = 1),
q AS (SELECT id AS query_id, e AS qv FROM v WHERE id < 8),
probes AS (
  SELECT query_id, centroid_id, qv FROM (
    SELECT q.query_id, s.centroid_id, q.qv,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round({_COS.format(a='q.qv', b='s.c')}, 9) DESC,
                      s.centroid_id) AS r
    FROM q CROSS JOIN seeds s) WHERE r <= 4),
scored AS (
  SELECT p.query_id, a.id AS neighbor_id,
         round({_COS.format(a='cv.e', b='p.qv')}, 6) AS sim
  FROM probes p JOIN assign a USING (centroid_id)
  JOIN v cv ON cv.id = a.id)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM scored)
WHERE rank <= 5
"""

def _ann_lsh_mp_sql(n_planes: int = 8, dim: int = 64, bits: int = 2,
                    n_probe: int = 8, k: int = 5) -> str:
    """Multi-probe LSH oracle: re-derives the FULL perturbation-set
    probe sequence (similarity.probe_buckets, Lv et al. VLDB'07) in
    DuckDB SQL — per-plane margins, list_sort rank, compile-time subset
    enumeration scored by summed |margin| with (score, mask) ordering,
    base-XOR probes — then the bucket equi-join + exact cosine re-rank.
    A green row certifies the probe SEQUENCE itself, not just the
    re-rank."""
    import itertools

    from jsonschema_rs_spark.operators.similarity import (_PROBE_RANKS,
                                                          hyperplane_signs)
    planes = hyperplane_signs(n_planes, dim)
    lits = ["[" + ", ".join(f"{float(s)}" for s in p) + "]::DOUBLE[]"
            for p in planes]
    dots = ", ".join(f"list_dot_product(v, {lit})" for lit in lits)
    base = " + ".join(f"(CASE WHEN d[{i + 1}] > 0 THEN {1 << i} "
                      "ELSE 0 END)" for i in range(n_planes))
    rk = ", ".join("{'m': abs(d[%d]), 'i': %d}" % (i + 1, i)
                   for i in range(n_planes))
    m = min(n_planes, _PROBE_RANKS)
    cands = []
    for r in range(1, bits + 1):
        # pool mirrors probe_buckets: singletons from ALL ranks,
        # multi-bit subsets from the _PROBE_RANKS smallest margins
        pool = range(1, (n_planes if r == 1 else m) + 1)
        for sub in itertools.combinations(pool, r):
            score = " + ".join(f"rk[{p}].m" for p in sub)
            masks = [f"(1::BIGINT << rk[{p}].i)" for p in sub]
            x = masks[0]
            for mm in masks[1:]:
                x = f"xor({x}, {mm})"
            cands.append("{'s': %s, 'x': %s}" % (score, x))
    return f"""
WITH qd AS (SELECT vec_id AS query_id, v AS qv, [{dots}] AS d
            FROM (SELECT vec_id, embedding::DOUBLE[] AS v
                  FROM embeddings WHERE vec_id < 8)),
qr AS (SELECT query_id, qv, ({base})::BIGINT AS base,
         list_sort([{rk}]) AS rk
       FROM qd),
qp AS (SELECT query_id, qv,
         list_prepend(base, list_transform(
           list_slice(list_sort([{", ".join(cands)}]), 1, {n_probe - 1}),
           c -> xor(base, c.x))) AS probes
       FROM qr),
qb AS (SELECT query_id, qv, unnest(probes) AS b FROM qp),
cd AS (SELECT vec_id AS neighbor_id, v AS cv, [{dots}] AS d
       FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
c AS (SELECT neighbor_id, cv, ({base})::BIGINT AS b FROM cd),
s AS (SELECT DISTINCT query_id, neighbor_id,
        round({_COS.format(a='cv', b='qv')}, 6) AS sim
      FROM c JOIN qb USING (b))
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= {k}
"""


ANN_LSH_MP = _ann_lsh_mp_sql()

NDCOS_PAIRS = f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.id AS id_a, b.id AS id_b,
       round({_COS.format(a='a.e', b='b.e')}, 6) AS sim
FROM v a CROSS JOIN v b
WHERE a.id < b.id
  AND round({_COS.format(a='a.e', b='b.e')}, 6) >= 0.5
"""

ROLLUP_EVENTS = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# previously rows-only queries, now value-level (VERDICT item 7)
# ---------------------------------------------------------------------------


def _minhash_pairs_sql(num_hashes: int = 16, bands: int = 8,
                       threshold: float = 0.5) -> str:
    """Full banded-LSH pipeline re-derived in SQL: md5 minhash sigs →
    band keys → bucket pairs → exact-Jaccard verify. Mirrors
    queries.minhash_pairs exactly (no oversized buckets exist at oracle
    scale, so the star-pair path never fires on either side)."""
    from jsonschema_rs_spark.operators.dedup import (MINHASH_PRIME,
                                                     minhash_params)
    rpb = num_hashes // bands
    sigs = ", ".join(
        f"list_aggregate(list_transform(hs, h -> "
        f"({a} * h + {b}) % {MINHASH_PRIME}), 'min')"
        for a, b in minhash_params(num_hashes))
    key_selects = " UNION ALL ".join(
        "SELECT doc_id, md5('{b}#' || {parts}) AS bk FROM sg".format(
            b=b,
            parts=" || ',' || ".join(
                f"sig[{b * rpb + j + 1}]::VARCHAR" for j in range(rpb)))
        for b in range(bands))
    common = "len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))"
    return f"""
WITH tk AS (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM documents),
shx AS (SELECT doc_id, {_SHINGLES} AS sh FROM tk),
hh AS (SELECT doc_id, sh,
         list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)
           AS hs FROM shx),
sg AS (SELECT doc_id, sh, [{sigs}] AS sig FROM hh),
keys AS ({key_selects}),
cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         FROM keys a JOIN keys b USING (bk) WHERE a.doc_id < b.doc_id)
SELECT ia AS id_a, ib AS id_b,
       round({common} / CAST(len(sa.sh) + len(sb.sh) - {common} AS DOUBLE),
             6) AS jaccard
FROM cand
JOIN shx sa ON sa.doc_id = ia JOIN shx sb ON sb.doc_id = ib
WHERE {common} / CAST(len(sa.sh) + len(sb.sh) - {common} AS DOUBLE)
      >= {threshold}
"""


# banding mirrors queries.minhash_pairs: "auto" at threshold 0.5 → (22, 11)
MINHASH_PAIRS = _minhash_pairs_sql(*_adaptive_minhash(0.5), threshold=0.5)

# connected components over the minhash near-dup pairs
# (queries.cc_groups): the min-label fixpoint dedup.connected_components
# converges to equals, per node, the MINIMUM id reachable through the
# symmetric edge set — computed exactly by a recursive transitive-
# closure CTE (UNION dedups, so cycles terminate)
CC_GROUPS = f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, comp) AS (
    SELECT id, id FROM nodes
  UNION
    SELECT e.src, r.comp FROM edges e JOIN reach r ON r.id = e.dst
)
SELECT id, MIN(comp) AS component FROM reach GROUP BY id
"""

# sequence packing (queries.pack_docs): exclusive prefix sum of
# whitespace token counts in doc_id order within each language shard;
# pack_id = start_offset // 512 (concatenate-then-chunk semantics)
PACK_DOCS = f"""
WITH t AS (SELECT doc_id, lang,
             CAST(coalesce({_WS_COUNT}, 0) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                  - n_tokens AS BIGINT) AS start_offset
      FROM t)
SELECT doc_id, lang, n_tokens, start_offset,
       CAST(start_offset // 512 AS BIGINT) AS pack_id
FROM c
"""

# exact pairwise n-gram Jaccard (queries.jaccard_pairs): distinct 3-gram
# shingles over normalized text, the deterministic stopword-shingle skew
# guard (drop shingles in > 1000 docs, |A|/|B| still counted pre-drop,
# exactly like ngram_jaccard_pairs), pairs sharing >= 1 surviving
# shingle; threshold applied to the 6dp-rounded value like the Spark side
JACCARD_PAIRS = f"""
WITH tk AS (SELECT doc_id, str_split({_NORM}, ' ') AS toks FROM documents),
shx AS (SELECT doc_id, {_SHINGLES} AS sh FROM tk),
ex0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM shx),
ex AS (
  SELECT * FROM ex0
  WHERE shingle NOT IN (
    SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 1000)),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS n_common
  FROM ex a JOIN ex b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard
FROM common
WHERE round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6) >= 0.5
"""

# deterministic-stub formulas from multimodal.py re-derived: the content
# blob is the utf-8 bytes of md5(text), so md5-of-bytes == md5(md5(text))
MM_FEATURES = """
WITH m AS (
  SELECT 'asset-' || substr(md5(doc_id::VARCHAR), 1, 8) AS asset_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         md5(md5(text)) AS mh
  FROM documents),
f AS (SELECT asset_id, media_type, mh,
        ('0x' || substr(mh, 1, 8))::BIGINT AS h1,
        ('0x' || substr(mh, 9, 8))::BIGINT AS h2
      FROM m)
SELECT asset_id, media_type, CAST(32 AS INT) AS n_bytes, mh AS content_md5,
  CASE WHEN media_type = 'image'
       THEN CAST(64 + h1 % 1024 AS INT) END AS width,
  CASE WHEN media_type = 'image'
       THEN CAST(64 + (h1 >> 10) % 1024 AS INT) END AS height,
  CASE WHEN media_type IN ('audio', 'video')
       THEN CAST(500 + h2 % 600000 AS INT) END AS duration_ms,
  CASE WHEN media_type IN ('audio', 'video')
       THEN CAST(greatest((500 + h2 % 600000) // 40, 1) AS INT)
       END AS frame_count
FROM f
"""

# ---------------------------------------------------------------------------
# registry — keys must match queries.QUERIES; missing key → rows-only check
# ---------------------------------------------------------------------------

def _suite_oracles():
    from jsonschema_rs_spark.suite import suite_oracles

    return suite_oracles()


ORACLES = {
    **_suite_oracles(),
    "val_events_flag": VAL_EVENTS_FLAG,
    "val_events_violations": VAL_EVENTS_VIOLATIONS,
    "val_docs_flag": VAL_DOCS_FLAG,
    "val_docs_summary": VAL_DOCS_SUMMARY,
    "val_json_props": VAL_JSON_PROPS,
    "val_lineitem_flag": VAL_LINEITEM_FLAG,
    "val_spans_flag": VAL_SPANS_FLAG,
    "val_spans_violations": VAL_SPANS_VIOLATIONS,
    "val_events_composed": VAL_EVENTS_COMPOSED,
    "val_docs_unique_tokens": VAL_DOCS_UNIQUE_TOKENS,
    "val_spans_unevaluated": VAL_SPANS_UNEVALUATED,
    "val_docs_keyword_summary": VAL_DOCS_KEYWORD_SUMMARY,
    "val_docs_hierarchy": VAL_DOCS_HIERARCHY,
    "output_units_docs": OUTPUT_UNITS_DOCS,
    "output_units_ext": OUTPUT_UNITS_EXT,
    "stats_documents": STATS_DOCUMENTS,
    "uniq_orders_custkey": UNIQ_ORDERS_CUSTKEY,
    "uniq_ratio_orders": UNIQ_RATIO_ORDERS,
    "ri_orders_customer": RI_ORDERS_CUSTOMER,
    "ri_events_customer": RI_EVENTS_CUSTOMER,
    "ks_events_value": KS_EVENTS_VALUE,
    "chisq_events_halves": CHISQ_EVENTS_HALVES,
    "drift_windows": DRIFT_WINDOWS,
    "hist_orders_total": HIST_ORDERS_TOTAL,
    "text_features": TEXT_FEATURES,
    "fp_counts": FP_COUNTS,
    "minhash_sigs": MINHASH_SIGS,
    "simhash_vals": SIMHASH_VALS,
    "simhash_pairs": SIMHASH_PAIRS,
    "curate_docs": CURATE_DOCS,
    "minhash_pairs": MINHASH_PAIRS,
    "cc_groups": CC_GROUPS,
    "jaccard_pairs": JACCARD_PAIRS,
    "pack_docs": PACK_DOCS,
    "sim_topk": SIM_TOPK,
    "ann_lsh": ANN_LSH,
    "ann_lsh_mp": ANN_LSH_MP,
    "ann_ivf": ANN_IVF,
    "ndcos_pairs": NDCOS_PAIRS,
    "rollup_events": ROLLUP_EVENTS,
    "mm_features": MM_FEATURES,
}
