"""Declared correctness queries for the ext/ operators (dedup, similarity,
text analysis, multimodal plumbing) over the documents/embeddings tables.

SQL-expressible operators carry a DuckDB oracle; the LSH-based ones
(minhash, simhash, hyperplane buckets) are algorithm-specific and get the
weaker rows-only check plus recall tests in tests/test_ext.py.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aircan_spark.rownum import with_row_number

from aircan_spark.data import fan_out
from aircan_spark.data import load_table as _load
from aircan_spark.ext import (
    chunking,
    dedup,
    features,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
    vectors,
)


def _t(spark, sf_dir, name):
    """Load + fan_out: every ext operator is compute-heavy per row, so a
    single-split local scan must not serialize it onto one core (no-op on
    inputs that already have enough splits)."""
    return fan_out(_load(spark, sf_dir, name))


# --- text analysis ------------------------------------------------------------


def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.text_stats(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_regex_tokens", "n_punct",
        "n_digits", "mean_token_len",
    ).orderBy("doc_id")


EXT_TEXT_STATS_SQL = r"""
SELECT doc_id,
       LENGTH(text) AS n_chars_calc,
       LEN(string_split_regex(TRIM(text), '\s+')) AS n_tokens,
       LEN(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_regex_tokens,
       LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS n_punct,
       LEN(regexp_extract_all(text, '[0-9]')) AS n_digits,
       ROUND(CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
             / CAST(GREATEST(LEN(string_split_regex(TRIM(text), '\s+')), 1) AS DOUBLE),
             4) AS mean_token_len
FROM documents ORDER BY doc_id
"""


def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.quality_score(docs).select("doc_id", "quality").orderBy("doc_id")


EXT_QUALITY_SQL = r"""
SELECT doc_id,
       ROUND(
         LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
         * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                  / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
         * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                  / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
         4) AS quality
FROM documents ORDER BY doc_id
"""


def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.lang_id(docs).select(
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "pred_lang"
    ).orderBy("doc_id")


EXT_LANG_ID_SQL = r"""
WITH scored AS (
  SELECT doc_id,
         LEN(regexp_extract_all(LOWER(text), '\b(der|und|das|nicht)\b')) AS score_de,
         LEN(regexp_extract_all(LOWER(text), '\b(the|and|of|is)\b')) AS score_en,
         LEN(regexp_extract_all(LOWER(text), '\b(el|los|una|que)\b')) AS score_es,
         LEN(regexp_extract_all(LOWER(text), '\b(le|et|les|dans)\b')) AS score_fr
  FROM documents
)
SELECT doc_id, score_de, score_en, score_es, score_fr,
       CASE
         WHEN GREATEST(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
         WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr) THEN 'de'
         WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr) THEN 'en'
         WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr) THEN 'es'
         ELSE 'fr'
       END AS pred_lang
FROM scored ORDER BY doc_id
"""


def ext_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.stopword_stats(docs).select(
        "doc_id", "n_stopwords", "stopword_ratio"
    ).orderBy("doc_id")


EXT_STOPWORD_SQL = r"""
SELECT doc_id,
       LEN(regexp_extract_all(LOWER(text),
           '\b(the|and|of|to|in|is|that|it|for|was|on|are|as|with|at|by|an|be|this|have)\b')) AS n_stopwords,
       ROUND(CAST(LEN(regexp_extract_all(LOWER(text),
           '\b(the|and|of|to|in|is|that|it|for|was|on|are|as|with|at|by|an|be|this|have)\b')) AS DOUBLE)
             / CAST(GREATEST(LEN(string_split_regex(TRIM(text), '\s+')), 1) AS DOUBLE), 4) AS stopword_ratio
FROM documents ORDER BY doc_id
"""


def ext_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOD-p rolling fingerprint sets (xxhash64-based — no DuckDB analog,
    rows-only check; overlap semantics covered in tests/test_ext.py).

    The raw array<long> column is collapsed to a scalar md5 digest so every
    harness can canonicalize the output (a raw array column crashes
    pandas-based sorters — round-2 driver red)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.rolling_fingerprints(docs)
        .select(
            "doc_id",
            F.size("fingerprints").alias("n_prints"),
            F.md5(F.array_join("fingerprints", ",")).alias("prints_digest"),
        )
        .orderBy("doc_id")
    )


def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.fingerprint(docs).select("doc_id", "fp_md5").orderBy("doc_id")


EXT_FINGERPRINT_SQL = r"""
SELECT doc_id, md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp_md5
FROM documents ORDER BY doc_id
"""


def ext_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.repetition_stats(docs).orderBy("doc_id")


EXT_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
  FROM documents
),
cnt AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       COUNT(*) AS n_distinct_words,
       ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS dup_word_ratio,
       ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS top_word_ratio
FROM cnt GROUP BY doc_id ORDER BY doc_id
"""


def ext_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.pii_stats(docs).select(
        "doc_id", "n_emails", "n_urls", "n_ipv4", "n_digit_runs"
    ).orderBy("doc_id")


EXT_PII_SQL = r"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS n_emails,
       LEN(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
       LEN(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
       LEN(regexp_extract_all(text, '[0-9][0-9][0-9]+')) AS n_digit_runs
FROM documents ORDER BY doc_id
"""


# --- temporal / relational -------------------------------------------------------


def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent purchase by the same user at or
    before the click (backward as-of join) — the stream-alignment primitive
    feature pipelines need and Spark lacks natively."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = relational.asof_join(
        clicks, purchases, on="user_id", right_cols=["event_id", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("purchase_event_id"),
        F.round("value_right", 2).alias("purchase_value"),
    ).orderBy("event_id")


EXT_ASOF_SQL = r"""
SELECT c.event_id, c.user_id,
       p.event_id AS purchase_event_id,
       ROUND(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within the 10 minutes before each error, per user — bounded
    interval join (bucketed equi-join, never a per-key cross product),
    aggregated to a count per error event."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click")
    pairs = relational.range_join(
        errors,
        clicks,
        on="user_id",
        lower="-10 minutes",
        upper="0 seconds",
        right_cols=["event_id"],
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_10m")
    )
    return (
        errors.select("event_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_clicks_10m", F.lit(0)).alias("n_clicks_10m"),
        )
        .orderBy("event_id")
    )


EXT_RANGE_JOIN_SQL = r"""
SELECT e.event_id, COUNT(c.event_id) AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL '10 minutes'
 AND c.ts < e.ts
GROUP BY e.event_id ORDER BY e.event_id
"""


def ext_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per language — rank-limit pushdown
    (WindowGroupLimit) keeps the shuffle at O(k x groups)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        relational.topk_per_group(
            docs, ["lang"], "n_chars", 3, tie_break="doc_id"
        )
        .select("lang", "doc_id", "n_chars", "rank")
        .orderBy("lang", "rank")
    )


EXT_TOPK_SQL = r"""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS BIGINT) AS rank
  FROM documents
)
SELECT lang, doc_id, n_chars, rank
FROM ranked WHERE rank <= 3 ORDER BY lang, rank
"""


def ext_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts/values rolled up over (event_type, day) with subtotal
    and grand-total rows (Expand + one partial-aggregated hash agg)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    return (
        relational.rollup_counts(
            ev,
            ["event_type", "day"],
            [
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").cast("decimal(24,6)").cast("string").alias("sum_value"),
            ],
        )
        .orderBy("event_type", "day")
    )


EXT_ROLLUP_SQL = r"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(value AS DECIMAL(18,6)) AS value
  FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, 'ALL') AS day,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(value) AS DECIMAL(24,6)) AS VARCHAR) AS sum_value
FROM e GROUP BY ROLLUP (event_type, day)
ORDER BY event_type, day
"""


def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles (exact continuous
    interpolation; the approx_percentile sketch is the 100 TB path)."""
    docs = _t(spark, sf_dir, "documents")
    return relational.grouped_percentiles(docs, ["lang"], "n_chars").orderBy("lang")


EXT_PERCENTILES_SQL = r"""
SELECT lang,
       ROUND(quantile_cont(n_chars, 0.25), 4) AS p25,
       ROUND(quantile_cont(n_chars, 0.50), 4) AS p50,
       ROUND(quantile_cont(n_chars, 0.75), 4) AS p75
FROM documents GROUP BY lang ORDER BY lang
"""


def ext_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language 5-95% length band filter — the outlier-trimming corpus
    filter; bounds broadcast, data rows never shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return (
        relational.filter_by_group_quantiles(docs, ["lang"], "n_chars")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


EXT_LENGTH_FILTER_SQL = r"""
WITH p AS (
  SELECT lang,
         quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT doc_id, lang, n_chars
FROM documents JOIN p USING (lang)
WHERE n_chars >= lo AND n_chars <= hi
ORDER BY doc_id
"""


def ext_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.tf_idf(docs).orderBy("doc_id", "word")


EXT_TF_IDF_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.word, tf.tf, dfreq.doc_freq,
       ROUND(tf.tf * (LN((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0), 6)
         AS tf_idf
FROM tf JOIN dfreq USING (word) CROSS JOIN n
ORDER BY doc_id, word
"""


def ext_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.vocab_topk(docs, k=100).orderBy("rank")


EXT_VOCAB_TOPK_SQL = r"""
WITH w AS (
  SELECT unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
  FROM documents
),
f AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word)
SELECT word, freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank
FROM f ORDER BY rank LIMIT 100
"""


def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag corpus docs sharing any word 3-gram
    with the held-out slice (doc_id % 50 == 0). The eval shingle set
    broadcasts; the corpus side never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    return dedup.contamination_flags(docs, eval_df, n=3).orderBy("doc_id")


EXT_DECONTAMINATE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
esh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
hits AS (
  SELECT doc_id, COUNT(*) AS n
  FROM sh JOIN esh USING (shingle)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(hits.n, 0) AS n_contaminated_shingles,
       COALESCE(hits.n, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits USING (doc_id)
ORDER BY d.doc_id
"""


def ext_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (exact n-gram Jaccard) clustered into components via
    iterative hash-min label propagation, every document assigned a group
    and the minimum id marked representative. The oracle computes the same
    components with a recursive CTE — an iterative Spark algorithm checked
    value-for-value against declarative SQL."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    return dedup.dedup_groups(docs, pairs).orderBy("doc_id")


EXT_DEDUP_GROUPS_SQL = r"""
WITH RECURSIVE
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE ROUND(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.3
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, MIN(comp) AS component,
       (id = MIN(comp)) AS is_representative
FROM reach GROUP BY id ORDER BY doc_id
"""


# --- sampling / chunking / vectors ----------------------------------------------


def ext_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order (md5(seed,id) sort key) — the
    reproducible pre-training data ordering."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.deterministic_shuffle(docs, "doc_id", seed=42).select(
        "doc_id", "shuffle_key"
    )


EXT_SHUFFLE_SQL = r"""
SELECT doc_id, md5('42-' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents ORDER BY shuffle_key
"""


def ext_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return sampling.hash_split(docs, "doc_id", seed=42).select(
        "doc_id", "split"
    ).orderBy("doc_id")


EXT_HASH_SPLIT_SQL = r"""
WITH b AS (
  SELECT doc_id,
         ('0x' || SUBSTR(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           % 10000 AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        sampling.stratified_sample(docs, ["lang"], 5, "doc_id", seed=42)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


EXT_STRATIFIED_SQL = r"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5('42-' || CAST(doc_id AS VARCHAR))
         ) AS rn
  FROM documents
)
SELECT lang, doc_id FROM ranked WHERE rn <= 5 ORDER BY lang, doc_id
"""


def ext_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return chunking.chunk_documents(
        docs, chunk_size=32, overlap=4
    ).orderBy("doc_id", "chunk_id")


EXT_CHUNK_SQL = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS words
  FROM documents
),
s AS (
  SELECT doc_id, words,
         unnest(generate_series(0, GREATEST(LEN(words) - 1, 0), 28)) AS st
  FROM w
)
SELECT doc_id,
       st // 28 AS chunk_id,
       LEN(list_slice(words, st + 1, st + 32)) AS n_chunk_tokens,
       array_to_string(list_slice(words, st + 1, st + 32), ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_id
"""


def ext_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return vectors.vector_norms(emb).orderBy("vec_id")


EXT_VECTOR_NORMS_SQL = r"""
SELECT vec_id,
       LEN(embedding) AS dim,
       ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 6) AS l2_norm
FROM embeddings ORDER BY vec_id
"""


def ext_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return vectors.label_centroids(emb).orderBy("label", "pos")


EXT_LABEL_CENTROIDS_SQL = r"""
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(CAST(embedding AS DOUBLE[])) AS DECIMAL(20,10)) AS v
  FROM embeddings
)
SELECT label, pos,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS centroid_val,
       COUNT(*) AS n_vectors
FROM u GROUP BY label, pos
ORDER BY label, pos
"""


def ext_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency/frequency/accumulation features (lag + cumulative
    windows in one shuffle)."""
    ev = _t(spark, sf_dir, "events")
    return features.user_event_features(ev).orderBy("event_id")


EXT_EVENT_FEATURES_SQL = r"""
SELECT event_id, user_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS micros_since_prev,
       COUNT(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
         AS n_prev_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(24,6)) AS VARCHAR) AS cum_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def ext_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    return relational.pivot_counts(ev, ["user_id"], "event_type", cats).orderBy(
        "user_id"
    )


EXT_PIVOT_SQL = r"""
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


def ext_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each document with
    probability min(n_chars/300, 1) — longer documents kept more often,
    decided per-row by portable hash (no RNG state, subset-stable)."""
    docs = _t(spark, sf_dir, "documents")
    prob = F.least(F.col("n_chars") / 300.0, F.lit(1.0))
    return (
        sampling.bernoulli_sample(docs, "doc_id", prob, seed=42)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


EXT_WEIGHTED_SAMPLE_SQL = r"""
SELECT doc_id, n_chars
FROM documents
WHERE CAST(('0x' || SUBSTR(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           % 10000 AS DOUBLE)
      < LEAST(n_chars / 300.0, 1.0) * 10000
ORDER BY doc_id
"""


# --- dedup -------------------------------------------------------------------------


def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).orderBy("doc_id")


EXT_DEDUP_EXACT_SQL = r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))
ORDER BY doc_id
"""


def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)


EXT_DEDUP_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         ROUND(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
)
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.3 ORDER BY id_a, id_b
"""


def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_pairs(docs, threshold=0.3)


def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3)


def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine dedup — the ORACLE BASELINE (O(n²),
    driver-collected corpus matrix; verification scale only, HARD-CAPPED
    at dedup.BRUTE_PAIRS_MAX_VECTORS so it cannot be invoked at scale).
    The declared 100 TB path is ``ext_dedup_embedding_lsh`` below."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_pairs(emb, threshold=0.4, lsh_bits=0)


def ext_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for embedding near-dup: multi-table hyperplane LSH
    bucket equi-join (no all-pairs, no driver-side corpus matrix). Output
    is a high-recall subset of ``ext_dedup_embedding`` (recall measured in
    tests/test_ext.py) — rows-only contract, the exact query stays the
    oracle baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    # 6 bits x 24 tables: at cosine 0.4 the per-bit collision prob is
    # ~0.63, so table hit-rate ~0.63^6=0.06 and recall 1-(1-0.06)^24~0.79
    # on worst-case (exactly-at-threshold) pairs; higher-cosine dupes are
    # found with near-certainty. Bits dial bucket size (candidate volume),
    # tables dial recall.
    return dedup.embedding_pairs(emb, threshold=0.4, lsh_bits=6, num_tables=24)


EXT_DEDUP_EMBEDDING_SQL = r"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4 ORDER BY id_a, id_b
"""


# --- similarity search ---------------------------------------------------------------


def ext_sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_topk(emb, queries, k=5)


EXT_SIM_TOPK_SQL = r"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def ext_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_topk(emb, queries, k=5, bits=8)


def ext_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5, nlist=16, nprobe=4)


def ext_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: corpus scanned as m-byte codes (32x
    compression at fp32/dim-64), asymmetric-distance scoring via per-query
    lookup tables — the compression half of IVF-PQ (compose with
    ext_sim_topk_ivf's cell probe for the full production layout).
    Rows-only contract; recall measured in tests/test_ext.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    books = similarity.pq_train(emb, m=16, ksub=16, seed=42)
    return similarity.pq_topk(emb, queries, books, k=5)


# --- streaming (batch-parity execution of the streaming plan) -------------------------


def ext_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed aggregation (streaming.py) run in batch mode —
    the SAME plan degrades gracefully on a bounded frame, which is what
    makes it oracle-checkable. value goes through DECIMAL so the sum does
    not depend on float accumulation order across engines."""
    from aircan_spark.streaming import windowed_event_counts

    events = _t(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    return (
        windowed_event_counts(events, window_duration="1 hour")
        .withColumn("sum_value", F.col("sum_value").cast("decimal(24,6)").cast("string"))
        .orderBy("window_start", "event_type")
    )


def ext_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user, batch-parity mode. The oracle
    is the classic gaps-and-islands rewrite — same sessions, computed with
    window functions instead of session state."""
    from aircan_spark.streaming import sessionized_activity

    events = _t(spark, sf_dir, "events")
    return sessionized_activity(events, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


EXT_STREAM_SESSIONS_SQL = r"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


EXT_STREAM_WINDOW_SQL = r"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DECIMAL(24,6)) AS VARCHAR) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


# --- multimodal plumbing ---------------------------------------------------------------


def ext_mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "doc_id", "text", "text/plain")
    return (
        multimodal.byte_features(media)
        .select("media_id", "n_bytes", "first_byte")
        .orderBy("media_id")
    )


EXT_MM_BYTES_SQL = r"""
SELECT doc_id AS media_id,
       CAST(octet_length(ENCODE(text)) AS BIGINT) AS n_bytes,
       ascii(SUBSTR(text, 1, 1)) AS first_byte
FROM documents ORDER BY media_id
"""


def ext_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, end-to-end and oracle-checked (no ``fake=``):
    per document a deterministic gradient BMP is synthesized
    (W=16+id%17, H=16+id%13, gray value (x*7+y*13+id)%256), pushed through
    the real decode→nearest-neighbor-resize→re-encode kernel
    (multimodal.decode_pixels/nn_resize/encode_bmp), decoded AGAIN from
    the resized BMP bytes, and summarized as the mean sampled gray value.
    Nearest-neighbor sampling at floor((i+0.5)*src/8) is closed-form, so
    DuckDB replays the whole pipeline without touching a single image
    byte — the oracle checks the codec round-trip AND the resample
    geometry. All kernels are partition-local mapInPandas (no shuffle)."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def make_bmp(batches):
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                w, h = 16 + did % 17, 16 + did % 13
                x = np.arange(w, dtype="int64")[None, :]
                y = np.arange(h, dtype="int64")[:, None]
                gray = ((x * 7 + y * 13 + int(did)) % 256).astype("u1")
                rgb = np.repeat(gray[:, :, None], 3, axis=2)
                ids.append(did)
                blobs.append(multimodal.encode_bmp(rgb))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(make_bmp, "media_id bigint, content binary")
    resized = multimodal.resize_images(media, width=8, height=8)

    def mean_gray(batches):
        for pdf in batches:
            def m(blob):
                px = multimodal.decode_pixels(blob)
                return round(float(px[:, :, 0].astype("float64").mean()), 6)

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "pixel_mean": pdf["content"].map(m),
                }
            )

    return resized.mapInPandas(
        mean_gray, "media_id bigint, width int, height int, pixel_mean double"
    ).orderBy("media_id")


EXT_MM_RESIZE_SQL = r"""
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM documents
),
sampled AS (
  SELECT d.doc_id,
         CAST(FLOOR((gx.i + 0.5) * d.w / 8.0) AS BIGINT) AS sx,
         CAST(FLOOR((gy.j + 0.5) * d.h / 8.0) AS BIGINT) AS sy
  FROM dims d, generate_series(0, 7) gx(i), generate_series(0, 7) gy(j)
)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       ROUND(AVG((sx * 7 + sy * 13 + doc_id) % 256), 6) AS pixel_mean
FROM sampled GROUP BY doc_id ORDER BY media_id
"""


# --- corpus statistics / relevance wave ------------------------------------------------


def ext_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus bigrams (collocation mining head)."""
    docs = _t(spark, sf_dir, "documents")
    return text.ngram_counts(docs, n=2, k=100).orderBy("rank")


EXT_NGRAM_TOPK_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(LOWER(text)), '\s+'), 1) AS i
  FROM documents
),
grams AS (
  SELECT a.w || ' ' || b.w AS ngram
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
f AS (SELECT ngram, COUNT(*) AS freq FROM grams GROUP BY ngram)
SELECT ngram, freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, ngram) AS BIGINT) AS rank
FROM f ORDER BY rank LIMIT 100
"""


BM25_QUERY_TERMS = ["join", "merge", "window"]


def ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed 3-term query."""
    docs = _t(spark, sf_dir, "documents")
    return text.bm25_scores(docs, BM25_QUERY_TERMS).orderBy("doc_id")


EXT_BM25_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS w
  FROM documents
),
lens AS (SELECT doc_id, len(w) AS dl, w FROM toks),
scalars AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM lens),
words AS (
  SELECT doc_id, dl, unnest(w) AS word FROM lens
),
tf AS (
  SELECT doc_id, dl, word, COUNT(*) AS tf
  FROM words WHERE word IN ('join', 'merge', 'window')
  GROUP BY doc_id, dl, word
),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
comp AS (
  SELECT tf.doc_id,
         CAST(
           LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)
                    / (CAST(d.doc_freq AS DOUBLE) + 0.5))
           * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE)
                                     / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
           AS DECIMAL(27,12)) AS comp
  FROM tf JOIN dfreq d ON tf.word = d.word CROSS JOIN scalars s
)
SELECT doc_id, ROUND(CAST(SUM(comp) AS DOUBLE), 6) AS score,
       COUNT(*) AS n_terms_matched
FROM comp GROUP BY doc_id ORDER BY doc_id
"""


def ext_rolling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h per-user rolling count/sum/mean for every event."""
    ev = _t(spark, sf_dir, "events")
    return features.rolling_event_stats(ev, span_seconds=3600).orderBy("event_id")


EXT_ROLLING_EVENT_SQL = r"""
SELECT event_id, user_id,
       COUNT(value) OVER w AS win_count,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(24,6)) AS VARCHAR)
         AS win_sum,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w, 6) AS win_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def ext_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score of event values (broadcast moments,
    data rows never shuffle)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return features.zscore_normalize(ev, ["event_type"], "value").orderBy(
        "event_id"
    )


EXT_ZSCORE_SQL = r"""
WITH m AS (
  SELECT event_type,
         COUNT(value) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s1,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0.0
            THEN ROUND((e.value - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / SQRT((CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)), 6)
       END AS zscore
FROM events e JOIN m ON e.event_type = m.event_type
ORDER BY e.event_id
"""


def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin histogram of order totals over [0, 500000]."""
    orders = _t(spark, sf_dir, "orders")
    return relational.histogram(orders, "o_totalprice", 0.0, 500000.0, 20).orderBy(
        "bin"
    )


EXT_HISTOGRAM_SQL = r"""
WITH b AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS BIGINT), 19) AS bin
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0.0 AND o_totalprice <= 500000.0
)
SELECT bin,
       ROUND(0.0 + bin * 25000.0, 6) AS bin_lo,
       ROUND(0.0 + (bin + 1) * 25000.0, 6) AS bin_hi,
       COUNT(*) AS n
FROM b GROUP BY bin ORDER BY bin
"""


def ext_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem counts + quantity totals cubed over (returnflag,
    linestatus): every subset of the two dimensions, ALL-labelled."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,6)").alias("qty"),
    )
    return relational.cube_counts(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("decimal(24,6)").cast("string").alias("sum_qty"),
        ],
    ).orderBy("l_returnflag", "l_linestatus")


EXT_CUBE_SQL = r"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS VARCHAR)
         AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def ext_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus normalization: control chars -> spaces, whitespace
    collapsed, lowercased, trimmed (pure JVM regex, scan-fused)."""
    docs = _t(spark, sf_dir, "documents")
    return text.clean_text(docs).orderBy("doc_id")


EXT_CLEAN_TEXT_SQL = r"""
SELECT doc_id,
       TRIM(regexp_replace(
              regexp_replace(LOWER(text), '[\x00-\x1f\x7f-\x9f]', ' ', 'g'),
              '\s+', ' ', 'g')) AS clean
FROM documents ORDER BY doc_id
"""


def ext_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized event values (row-preserving outlier clamp,
    broadcast quantile bounds)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return relational.winsorize_by_group(
        ev, ["event_type"], "value", 0.05, 0.95, out_col="value_w"
    ).select("event_id", "event_type", "value_w").orderBy("event_id")


EXT_WINSORIZE_SQL = r"""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN e.value IS NULL THEN NULL
            ELSE ROUND(GREATEST(LEAST(e.value, b.hi), b.lo), 6) END AS value_w
FROM events e JOIN b USING (event_type)
ORDER BY e.event_id
"""


def ext_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user cardinality (the HLL++ approx path is
    the 100 TB swap-in, property-tested for error bound)."""
    ev = _t(spark, sf_dir, "events")
    return relational.distinct_counts(
        ev, ["event_type"], "user_id", exact=True
    ).orderBy("event_type")


EXT_DISTINCT_COUNTS_SQL = r"""
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def ext_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — LeftAnti physical join; the orders side
    projects to its key column only before the exchange."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    )


EXT_ANTI_JOIN_SQL = r"""
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def ext_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation membership algebra over customer vs supplier presence:
    INTERSECT / EXCEPT both ways, tagged and unioned. Each set op is a
    distinct-aggregate under the hood; the inputs are pre-projected to
    the single key column so the exchanges carry only nation keys."""
    cn = _t(spark, sf_dir, "customer").select("c_nationkey").distinct()
    sn = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("c_nationkey"))
        .distinct()
    )
    tagged = (
        cn.intersect(sn).withColumn("membership", F.lit("both"))
        .unionByName(cn.subtract(sn).withColumn("membership", F.lit("customer_only")))
        .unionByName(sn.subtract(cn).withColumn("membership", F.lit("supplier_only")))
    )
    return tagged.select(
        F.col("c_nationkey").alias("nationkey"), "membership"
    ).orderBy("nationkey")


EXT_SET_OPS_SQL = r"""
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'customer_only' FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'supplier_only' FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn)
ORDER BY nationkey
"""


def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON field extraction from the event props payload (one
    from_json parse per row, scan-fused)."""
    from aircan_spark.ext import semistructured

    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    return semistructured.json_fields(
        ev, "props", {"k": "bigint"}, keep=["event_id"]
    ).orderBy("event_id")


EXT_JSON_EXTRACT_SQL = r"""
SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
FROM events ORDER BY event_id
"""


def ext_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy token-count packing into ~256-token packs
    within 8 portable hash buckets."""
    docs = _t(spark, sf_dir, "documents")
    return chunking.pack_documents(
        docs, seq_len=256, n_buckets=8, seed=42
    ).orderBy("doc_id")


EXT_PACK_DOCUMENTS_SQL = r"""
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || SUBSTR(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % 8 AS BIGINT) AS bucket,
         CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM d
)
SELECT doc_id, bucket, n_tokens,
       CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id
FROM c ORDER BY doc_id
"""


MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}


def ext_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixture: per-source sampling rates building a
    target training mix (hash-decided, subset-stable, zero shuffle)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.mixture_sample(
        docs, "doc_id", "source", MIXTURE_RATES
    ).orderBy("doc_id")


EXT_MIXTURE_SAMPLE_SQL = r"""
SELECT doc_id, source
FROM documents
WHERE CAST(('0x' || SUBSTR(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           % 10000 AS DOUBLE)
      < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.75
                     WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.25
                     ELSE 0.0 END) * 10000
ORDER BY doc_id
"""


def ext_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition: doc counts, char totals, and shares
    (exact integer division, broadcast global totals)."""
    docs = _t(spark, sf_dir, "documents")
    return relational.group_share(docs, ["source"], "n_chars").orderBy("source")


EXT_CORPUS_MIX_SQL = r"""
WITH per AS (
  SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS w
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(n) AS tn, SUM(w) AS tw FROM per)
SELECT source, n, w,
       ROUND(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS share,
       ROUND(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS weight_share
FROM per CROSS JOIN tot ORDER BY source
"""


def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets: event counts per type AND per day (no
    cross cells) in one Expand + single hash agg."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").cast("string").alias("day")
    )
    return relational.grouping_sets_counts(
        ev,
        [["event_type"], ["day"]],
        [F.count(F.lit(1)).alias("n_events")],
    ).orderBy("event_type", "day")


EXT_GROUPING_SETS_SQL = r"""
WITH e AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events
)
SELECT COALESCE(day, 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events
FROM e GROUP BY GROUPING SETS ((event_type), (day))
ORDER BY event_type, day
"""


def ext_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: each user's most recent event (ts desc,
    event_id desc tie-break) — WindowGroupLimit bounds the shuffle at
    one row per key per task."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    return (
        relational.latest_by_key(ev, ["user_id"], "ts", "event_id")
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


EXT_LATEST_BY_KEY_SQL = r"""
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


def ext_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of document lengths via broadcast thresholds (the
    scale-safe alternative to a single-partition global NTILE)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return relational.quantile_buckets(docs, "n_chars", 10).orderBy("doc_id")


EXT_QUANTILE_BUCKETS_SQL = r"""
WITH b AS (
  SELECT list_transform(
           quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           q -> ROUND(q, 6)) AS bounds
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(len(list_filter(b.bounds, x -> n_chars > x)) AS BIGINT) AS bucket
FROM documents CROSS JOIN b
ORDER BY doc_id
"""


def ext_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (per-vector scale, 4x
    storage cut; codes emitted as a portable comma-joined string)."""
    emb = _t(spark, sf_dir, "embeddings")
    from aircan_spark.ext import vectors as V

    return V.quantize_int8(emb).orderBy("vec_id")


EXT_QUANTIZE_SQL = r"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> ABS(x))) / 127.0 AS scale0
  FROM v
)
SELECT vec_id,
       ROUND(scale0, 9) AS scale,
       CASE WHEN scale0 > 0.0
            THEN array_to_string(
                   list_transform(e, x -> CAST(ROUND(x / scale0) AS BIGINT)), ',')
            ELSE array_to_string(list_transform(e, x -> 0), ',')
       END AS qvec
FROM s ORDER BY vec_id
"""


def ext_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavor star join: 1996 revenue by nation within one
    region — lineitem |><| orders |><| customer |><| nation |><| region
    with a decimal-exact revenue aggregate.

    Scale shape: the date filter prunes orders AT THE SCAN (parquet
    predicate pushdown), nation/region are explicit broadcasts, customer
    is left to AQE (broadcast at small SF, shuffle join at 100 TB), and
    the lineitem->orders equi-join is the single big exchange. Revenue
    accumulates in DECIMAL so the result is order-independent."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum("rev").cast("decimal(38,12)").cast("string").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


EXT_STAR_JOIN_SQL = r"""
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,12)) AS VARCHAR) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
GROUP BY n_name ORDER BY n_name
"""


def ext_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust spread per event type: median absolute deviation via the
    pandas GROUPED_AGG UDAF surface (sort-internal, order-independent)."""
    ev = _t(spark, sf_dir, "events")
    return features.mad_by_group(ev, ["event_type"], "value").orderBy("event_type")


EXT_MAD_SQL = r"""
WITH m AS (
  SELECT event_type, median(value) AS md FROM events GROUP BY event_type
)
SELECT e.event_type, ROUND(median(ABS(e.value - m.md)), 6) AS mad
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


def ext_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: customer-name pairs within edit distance 1,
    blocked on the name minus its last 2 chars (equi-join on the block
    key, levenshtein verify inside blocks only)."""
    from aircan_spark.ext import entity

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        entity.fuzzy_self_join(cust, "c_custkey", "c_name", max_dist=1, tail=2)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    )


EXT_FUZZY_JOIN_SQL = r"""
WITH k AS (
  SELECT c_custkey AS id, c_name AS name,
         SUBSTR(c_name, 1, GREATEST(LENGTH(c_name) - 2, 0)) AS block
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM k a JOIN k b ON a.block = b.block AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY id_a, id_b
"""


def ext_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (nulls / distinct / min / max
    per column, stack-unpivoted)."""
    from aircan_spark import profile as P

    orders = _t(spark, sf_dir, "orders")
    return P.profile(
        orders, ["o_orderkey", "o_custkey", "o_totalprice"]
    ).orderBy("column")


EXT_PROFILE_SQL = r"""
WITH w AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ok,
         COUNT(DISTINCT o_orderkey) AS nd_ok,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_ok,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_ok,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ck,
         COUNT(DISTINCT o_custkey) AS nd_ck,
         CAST(MIN(o_custkey) AS VARCHAR) AS min_ck,
         CAST(MAX(o_custkey) AS VARCHAR) AS max_ck,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_tp,
         COUNT(DISTINCT o_totalprice) AS nd_tp,
         CAST(MIN(o_totalprice) AS VARCHAR) AS min_tp,
         CAST(MAX(o_totalprice) AS VARCHAR) AS max_tp
  FROM orders
)
SELECT 'o_orderkey' AS "column", n AS n_rows, nulls_ok AS n_nulls,
       nd_ok AS n_distinct, min_ok AS min_value, max_ok AS max_value FROM w
UNION ALL
SELECT 'o_custkey', n, nulls_ck, nd_ck, min_ck, max_ck FROM w
UNION ALL
SELECT 'o_totalprice', n, nulls_tp, nd_tp, min_tp, max_tp FROM w
ORDER BY "column"
"""


def ext_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed export: customer names replaced by salted SHA-256 tokens
    (referentially stable, row-local, zero shuffle)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return text.pseudonymize(cust, ["c_name"], salt="pepper-1").orderBy(
        "c_custkey"
    )


EXT_PSEUDONYMIZE_SQL = r"""
SELECT c_custkey,
       CASE WHEN c_name IS NULL THEN NULL
            ELSE sha256('pepper-1' || c_name) END AS c_name_token
FROM customer ORDER BY c_custkey
"""


def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution funnel: daily purchase counts split by whether a
    same-user click preceded the purchase within 1 hour — COMPOSED from
    the bucketed ``range_join`` (clicks explode into <= 2 time buckets;
    no per-user cross product) plus a distinct + left join back.

    The composition is the point: funnel analytics at 100 TB is a
    bounded interval join, never a sort of each user's full history."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    pairs = relational.range_join(
        purchases,
        clicks,
        on="user_id",
        lower="-1 hours",
        upper="0 seconds",
        right_cols=["click_id"],
    )
    attributed = pairs.select("event_id").distinct().withColumn(
        "__attr", F.lit(1)
    )
    return (
        purchases.join(attributed, "event_id", "left")
        .groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.coalesce(F.col("__attr"), F.lit(0))).alias("n_attributed"),
        )
        .withColumn(
            "attribution_rate",
            F.round(F.col("n_attributed") / F.col("n_purchases"), 6),
        )
        .orderBy("day")
    )


EXT_FUNNEL_SQL = r"""
WITH p AS (
  SELECT event_id, user_id, ts, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
  FROM events WHERE event_type = 'purchase'
),
a AS (
  SELECT p.day,
         CASE WHEN EXISTS (
           SELECT 1 FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
         ) THEN 1 ELSE 0 END AS attr
  FROM p
)
SELECT day, COUNT(*) AS n_purchases, CAST(SUM(attr) AS BIGINT) AS n_attributed,
       ROUND(CAST(SUM(attr) AS DOUBLE) / COUNT(*), 6) AS attribution_rate
FROM a GROUP BY day ORDER BY day
"""


def ext_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    distinct actives per (cohort_week, weeks_since). Two hash aggregates
    (first-seen per user, distinct actives per cell) joined on the user
    key — no per-user window, no global sort."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("d")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("d")).cast("date").alias("w")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("w", "cohort_week") / 7).cast("long").alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


EXT_RETENTION_SQL = r"""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
c AS (
  SELECT user_id, CAST(date_trunc('week', MIN(d)) AS DATE) AS cohort_week
  FROM e GROUP BY user_id
),
a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', d) AS DATE) AS w FROM e)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', cohort_week, w) / 7 AS BIGINT) AS weeks_since,
       COUNT(DISTINCT a.user_id) AS n_active_users
FROM a JOIN c ON a.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization: a session breaks after a 30-minute
    silence per user. lag + conditional flag + running sum, all inside
    per-user windows, then one hash aggregate per (user, session).

    Scale shape: every window is PARTITIONED BY user_id — one hash
    exchange on the user key, per-key sorts only (no global sort, no
    single-partition window). Timestamps compare natively (no epoch
    truncation) so sub-second gaps are exact; outputs are epoch micros
    (BIGINT) for engine-independent value hashing."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
        .orderBy("user_id", "session_idx")
    )


EXT_SESSIONIZE_SQL = r"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sessioned GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled daily event counts over a generated date spine
    (min..max day). The spine comes from a 1-row bounds aggregate +
    ``sequence``/``explode`` — generated, never stored — and the daily
    aggregate (tiny: one row per day) is explicitly broadcast onto it.

    Scale shape: the only exchange over the big table is the daily
    count's partial agg; the spine join moves O(days) rows."""
    ev = _t(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        ev.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    return (
        spine.join(F.broadcast(daily), "d", "left")
        .select(
            F.col("d").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("day")
    )


EXT_GAP_FILL_SQL = r"""
WITH e AS (SELECT CAST(ts AS DATE) AS d FROM events),
b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
),
daily AS (SELECT d, COUNT(*) AS n_events FROM e GROUP BY d)
SELECT CAST(spine.d AS VARCHAR) AS day,
       COALESCE(daily.n_events, 0) AS n_events
FROM spine LEFT JOIN daily ON spine.d = daily.d
ORDER BY day
"""


def ext_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-flavor pricing summary: per (returnflag, linestatus)
    decimal-exact sums of qty / base price / discounted price / charge
    plus row counts, under a shipdate cutoff.

    Scale shape: the cutoff filter pushes to the parquet scan, the
    4-column projection prunes the read, and everything else is ONE
    partial+final hash aggregate over a handful of groups — the map-side
    combine shrinks the shuffle to O(groups x partitions). DECIMAL
    accumulation makes the sums order-independent across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    d = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("decimal(38,6)").cast("string").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("decimal(38,6)").cast("string").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (one - d("l_discount")))
            .cast("decimal(38,12)").cast("string").alias("sum_disc_price"),
            F.sum(d("l_extendedprice") * (one - d("l_discount")) * (one + d("l_tax")))
            .cast("decimal(38,18)").cast("string").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


EXT_PRICING_SUMMARY_SQL = r"""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,12)) AS VARCHAR) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                     * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))))
                 AS DECIMAL(38,18)) AS VARCHAR) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def ext_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-flavor: top-20 customers by returned-item revenue.
    lineitem(R) |><| orders -> per-customer decimal revenue -> join
    customer -> global top-k.

    Scale shape: the returnflag filter pushes to the scan; the one big
    exchange is lineitem->orders on orderkey; per-customer revenue is a
    hash agg (small output), so the customer join's left side is already
    reduced and AQE can broadcast it; the final top-20 compiles to
    TakeOrderedAndProject (per-task heaps, no global sort)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum("rev").cast("decimal(38,12)").alias("_rev"),
            F.count(F.lit(1)).alias("n_return_items"),
        )
    )
    return (
        per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("_rev").cast("string").alias("revenue"),
            "n_return_items",
            F.col("_rev").alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "c_custkey")
        .limit(20)
        .drop("_ord")
    )


EXT_TOP_CUSTOMERS_SQL = r"""
SELECT c_custkey, c_name, c_mktsegment,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,12)) AS VARCHAR) AS revenue,
       COUNT(*) AS n_return_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
              AS DECIMAL(38,12)) DESC, c_custkey
LIMIT 20
"""


def ext_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-flavor existence query: orders with at least one lineitem
    shipped >60 days after the order date, counted by priority — a LEFT
    SEMI join (equi on orderkey + residual date condition).

    Scale shape: semi join never duplicates or widens the left side (the
    probe stops at first match), both scans project 2-3 columns, and the
    priority count is a tiny hash agg. One exchange on orderkey."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


EXT_LATE_ORDERS_SQL = r"""
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def ext_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral sequence extraction: the first 20 events (by
    time) joined into a `view>click>purchase` path string — the
    sequence-mining / session-replay input shape for training pipelines.

    Scale shape: a row_number filter per user BEFORE the collect caps
    every group at 20 rows (WindowGroupLimit pushes the cap into the
    shuffle), so collect_list is bounded — never an unbounded per-user
    array. One exchange on user_id serves both the window and the agg."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first20 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 20)
    return (
        first20.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_seq"),
        )
        .orderBy("user_id")
    )


EXT_EVENT_SEQUENCES_SQL = r"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rn) AS seq,
       COUNT(*) AS n_seq
FROM ranked WHERE rn <= 20
GROUP BY user_id ORDER BY user_id
"""


def ext_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (k=5 docs per source) ordered by
    a portable md5 hash — the subset-stable 'show me 5 examples of every
    source' primitive (engine-independent, re-runnable, no rand()).

    Scale shape: row_number over (source, hash order) with the <=k
    filter compiles to WindowGroupLimit — per-task group limits run
    BEFORE the exchange, so the shuffle carries O(k x groups), not the
    corpus."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    keyed = docs.withColumn(
        "sample_key", F.md5(F.concat(F.lit("7-"), F.col("doc_id").cast("string")))
    )
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", F.col("rn").alias("rank"), "doc_id", "sample_key")
        .orderBy("source", "rank")
    )


EXT_GROUP_SAMPLE_SQL = r"""
WITH keyed AS (
  SELECT source, doc_id,
         md5('7-' || CAST(doc_id AS VARCHAR)) AS sample_key
  FROM documents
),
ranked AS (
  SELECT source, doc_id, sample_key,
         row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS rn
  FROM keyed
)
SELECT source, rn AS rank, doc_id, sample_key
FROM ranked WHERE rn <= 5 ORDER BY source, rank
"""


def ext_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-flavor conditional-aggregate share: PROMO parts' slice
    of March-1996 revenue — CASE-gated decimal sums in ONE aggregate
    (never two passes), share derived from the exact decimals.

    Scale shape: the shipdate window pushes to the lineitem scan before
    the join; part joins on partkey (AQE broadcasts at small SF, shuffle
    join at scale — part is a data-sized table, not a guaranteed-small
    dim); the global agg is a 1-row partial+final."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    ).select(
        "l_partkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0).cast("decimal(18,6)")))
            .cast("decimal(38,12)").alias("_promo"),
            F.sum("rev").cast("decimal(38,12)").alias("_total"),
        )
    )
    return agg.select(
        F.col("_promo").cast("string").alias("promo_revenue"),
        F.col("_total").cast("string").alias("total_revenue"),
        F.round(
            F.col("_promo").cast("double") / F.col("_total").cast("double") * 100, 6
        ).alias("promo_share_pct"),
    )


EXT_PROMO_SHARE_SQL = r"""
WITH j AS (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(18,6))
         * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
),
a AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,12)) AS p,
         CAST(SUM(rev) AS DECIMAL(38,12)) AS t
  FROM j
)
SELECT CAST(p AS VARCHAR) AS promo_revenue,
       CAST(t AS VARCHAR) AS total_revenue,
       ROUND(CAST(p AS DOUBLE) / CAST(t AS DOUBLE) * 100, 6) AS promo_share_pct
FROM a
"""


def ext_next_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap analysis: lead() per user gives time-to-next-event,
    aggregated to a mean gap per event_type. The mean is derived from an
    exact decimal micros sum / count (float avg is accumulation-order
    dependent across engines — SNIPPETS cross-engine lesson).

    Scale shape: lead() runs in per-user windows (one exchange on
    user_id), then a tiny per-type hash agg."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_us", F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(
                F.sum(F.col("gap_us").cast("decimal(27,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


EXT_NEXT_EVENT_GAP_SQL = r"""
WITH g AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         - epoch_us(ts) AS gap_us
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND(CAST(SUM(CAST(gap_us AS DECIMAL(27,0))) AS DOUBLE) / COUNT(*), 6) AS avg_gap_us,
       MAX(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def ext_segment_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative ranking inside each market segment: percent_rank + ntile
    quartiles over account balance (custkey tie-break makes every rank
    row-unique and both engines' ntile deterministic).

    Scale shape: NOT ``Window.partitionBy(segment)`` — segments are a
    fixed small set, so that window sorts millions of rows per segment in
    one task at scale. Instead: range-partitioned GLOBAL numbering ordered
    by (segment, balance desc, custkey) via rownum.py's partition-offset
    scheme, then the in-segment row number is global_i minus the segment's
    broadcast start offset. The ordering is row-unique, so rank ==
    row_number and percent_rank/ntile reduce to closed-form arithmetic on
    (rn, segment size) — bit-equal to the window functions, parallel at
    any size."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    numbered = with_row_number(
        cust,
        column="_gi",
        order_by=[F.col("c_mktsegment"), F.col("c_acctbal").desc(), F.col("c_custkey")],
    )
    seg = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("_n"))
    seg = seg.select(
        "c_mktsegment",
        "_n",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("c_mktsegment").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    rn = F.col("_gi") - F.col("_off")
    n = F.col("_n")
    # percent_rank = (rank-1)/(n-1); row-unique order => rank == rn
    pct = F.when(n > 1, F.round((rn - 1) / (n - 1), 6)).otherwise(F.lit(0.0))
    # ntile(4): first (n%4) buckets get ceil(n/4) rows, the rest floor(n/4)
    q, r = F.floor(n / 4), n % 4
    boundary = r * (q + 1)
    quartile = F.when(rn <= boundary, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - boundary - 1) / q) + 1
    ).cast("int")
    return (
        numbered.join(F.broadcast(seg), "c_mktsegment")
        .withColumn("pct_rank", pct)
        .withColumn("quartile", quartile)
        .select("c_custkey", "c_mktsegment", "c_acctbal", "pct_rank", "quartile")
        .orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
    )


EXT_SEGMENT_RANK_SQL = r"""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ntile(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
"""


def ext_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative daily order revenue: decimal day sums, then a running
    total over the ORDERED DAY AXIS.

    Scale shape: the expensive part (per-day revenue) is a partial+final
    hash agg over the big table; the unpartitioned running-total window
    runs AFTER aggregation over O(days) rows — a global window over raw
    orders would serialize, over the day axis it's bounded and fine at
    any SF. Decimal accumulation keeps the cumsum order-independent."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
    )
    daily = orders.groupBy("day").agg(
        F.sum("price").cast("decimal(38,6)").alias("day_revenue")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn(
            "cum_revenue", F.sum("day_revenue").over(w).cast("decimal(38,6)")
        )
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("day_revenue").cast("string").alias("day_revenue"),
            F.col("cum_revenue").cast("string").alias("cum_revenue"),
        )
        .orderBy("day")
    )


EXT_RUNNING_REVENUE_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS day_revenue
  FROM orders GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(day_revenue AS VARCHAR) AS day_revenue,
       CAST(CAST(SUM(day_revenue) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,6)) AS VARCHAR) AS cum_revenue
FROM daily ORDER BY day
"""


def ext_partitioned_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink round-trip: documents written
    ``source=<v>/part-*.parquet``, read back with a partition-column
    filter, aggregated per source.

    Scale shape: the read-back filter resolves against DIRECTORY NAMES
    (PartitionFilters in the scan node — asserted in
    tests/test_sources_validate_export.py); files outside the three
    selected sources are never opened. This is the layout contract every
    downstream engine (Spark/Trino/Hive/DuckDB) prunes on."""
    import hashlib
    import tempfile

    from aircan_spark.export import export_partitioned

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars", "source")
    # stable per-sf output dir: overwrite-mode re-runs reuse it (no /tmp
    # accumulation across driver invocations)
    out = os.path.join(
        tempfile.gettempdir(),
        "aircan_part_export_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    export_partitioned(docs, out, ["source"])
    back = spark.read.parquet(out).filter(
        F.col("source").isin("src1", "src2", "src3")
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


EXT_PARTITIONED_EXPORT_SQL = r"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE source IN ('src1', 'src2', 'src3')
GROUP BY source ORDER BY source
"""


def ext_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7/Q9-flavor supplier volume: revenue by supplier nation and
    ship year. lineitem joins supplier on suppkey (data-sized table —
    shuffle join at scale, AQE broadcasts at small SF), nation is an
    explicit broadcast; decimal-exact revenue.

    Scale shape: 3-column lineitem projection, one orderkey-free exchange
    (suppkey), tiny (nation x year) hash agg output."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "ship_year")
        .agg(
            F.sum("rev").cast("decimal(38,12)").cast("string").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("n_name", "ship_year")
    )


EXT_SUPPLIER_VOLUME_SQL = r"""
SELECT n_name, EXTRACT(YEAR FROM l_shipdate) AS ship_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,12)) AS VARCHAR) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, ship_year ORDER BY n_name, ship_year
"""


def ext_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stream reconciliation: daily click vs purchase counts FULL
    OUTER joined on the day axis, absent sides zero-filled, with the
    imbalance delta — the audit query for 'did sink B receive everything
    source A sent'.

    Scale shape: both inputs aggregate FIRST (partial+final hash aggs);
    the full-outer join runs over two O(days) frames, never raw events.
    Full outer can't broadcast — but at O(days) rows the sort-merge is
    trivial at any SF."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("day").agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("day").agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purchases, "day", "full_outer")
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            (
                F.coalesce("n_clicks", F.lit(0))
                - F.coalesce("n_purchases", F.lit(0))
            ).alias("delta"),
        )
        .orderBy("day")
    )


EXT_RECONCILE_SQL = r"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
p AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(COALESCE(c.day, p.day) AS VARCHAR) AS day,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(n_clicks, 0) - COALESCE(n_purchases, 0) AS delta
FROM c FULL OUTER JOIN p ON c.day = p.day
ORDER BY day
"""


def ext_union_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two projections of documents with
    DIFFERENT column sets combined via ``unionByName(allowMissing
    Columns=True)`` — the batch-boundary schema-drift append the
    reference handles with its recreate-vs-append decision tree (D4),
    expressed as a single relational op (missing columns null-filled,
    matched BY NAME, never by position).

    Scale shape: union is a zero-shuffle concatenation of scans; the
    final ordering is the only exchange."""
    docs = _t(spark, sf_dir, "documents")
    old_batch = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    )
    new_batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "lang"
    )
    return (
        old_batch.unionByName(new_batch, allowMissingColumns=True)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("lang", F.lit("?")).alias("lang"),
        )
        .orderBy("doc_id")
    )


EXT_UNION_EVOLVE_SQL = r"""
SELECT doc_id, source, n_chars, COALESCE(lang, '?') AS lang
FROM (
  SELECT doc_id, source, n_chars, NULL AS lang
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL BY NAME
  SELECT doc_id, source, NULL AS n_chars, lang
  FROM documents WHERE doc_id % 2 = 1
)
ORDER BY doc_id
"""


def ext_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (streaming.py::stream_enrich)
    in batch-parity mode: events left-join the customer dim (broadcast —
    the stream side never shuffles), unmatched users fall back to
    'unknown', then segment x event_type counts."""
    from aircan_spark.streaming import stream_enrich

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream_enrich(
        ev,
        cust,
        on=("user_id", "c_custkey"),
        dim_cols=["c_mktsegment"],
        default={"c_mktsegment": "unknown"},
    )
    return (
        enriched.groupBy(
            F.col("c_mktsegment").alias("segment"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("segment", "event_type")
    )


EXT_STREAM_ENRICH_SQL = r"""
SELECT COALESCE(c_mktsegment, 'unknown') AS segment, event_type,
       COUNT(*) AS n_events
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1, 2 ORDER BY segment, event_type
"""


def ext_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmin/argmax per group: the event carrying the
    smallest / largest value per event_type, via MIN/MAX over a
    (value, event_id) struct — lexicographic struct ordering gives an
    exact tie-break inside ONE hash aggregate (no window, no self-join).

    Scale shape: partial min/max structs combine map-side; the shuffle
    carries one struct per (partition, group)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    lo = F.min(F.struct("value", "event_id"))
    hi = F.max(F.struct("value", "event_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(lo["value"], 6).alias("min_value"),
            lo["event_id"].alias("min_event_id"),
            F.round(hi["value"], 6).alias("max_value"),
            hi["event_id"].alias("max_event_id"),
        )
        .orderBy("event_type")
    )


EXT_ARGMINMAX_SQL = r"""
SELECT event_type,
       ROUND((MIN({'value': value, 'event_id': event_id})).value, 6) AS min_value,
       (MIN({'value': value, 'event_id': event_id})).event_id AS min_event_id,
       ROUND((MAX({'value': value, 'event_id': event_id})).value, 6) AS max_value,
       (MAX({'value': value, 'event_id': event_id})).event_id AS max_event_id
FROM events GROUP BY event_type ORDER BY event_type
"""


def ext_mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent lang per source (count agg,
    then row_number over (count DESC, lang) — built-in MODE() leaves tie
    choice engine-defined, the explicit ranking does not).

    Scale shape: the heavy input collapses in the first hash agg
    ((source, lang) cells); the window ranks O(cells) rows with a
    WindowGroupLimit cap."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    return (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("mode_lang"), F.col("n").alias("n_docs"))
        .orderBy("source")
    )


EXT_MODE_SQL = r"""
WITH cells AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT source, lang, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
  FROM cells
)
SELECT source, lang AS mode_lang, n AS n_docs
FROM ranked WHERE rn = 1 ORDER BY source
"""


def ext_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation funnel — exact dedup, length filter,
    quality filter — as ONE declarative plan: every per-doc flag is
    computed in a single projection pass, the dedup representative is one
    row_number over the fingerprint key, and all four stage counts fall
    out of ONE conditional-sum aggregate.

    Scale shape: one scan of the corpus, one exchange (fingerprint), one
    tiny global agg. The naive form (filter + count per stage) scans the
    corpus four times; this is the composition argument for an engine
    with declarative plans."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    flagged = docs.select(
        "doc_id",
        "n_chars",
        F.md5(norm).alias("fp"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("digit_ratio"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    staged = flagged.withColumn(
        "is_rep", (F.row_number().over(w) == 1).cast("int")
    ).select(
        "is_rep",
        (F.col("n_chars").between(100, 20000)).cast("int").alias("len_ok"),
        ((F.col("digit_ratio") < 0.3) & (F.col("n_tokens") >= 20))
        .cast("int")
        .alias("qual_ok"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("is_rep").alias("n_after_dedup"),
        F.sum(F.col("is_rep") * F.col("len_ok")).alias("n_after_length"),
        F.sum(F.col("is_rep") * F.col("len_ok") * F.col("qual_ok")).alias(
            "n_retained"
        ),
        F.round(
            F.sum(F.col("is_rep") * F.col("len_ok") * F.col("qual_ok"))
            / F.count(F.lit(1)),
            6,
        ).alias("retention_rate"),
    )


EXT_CURATION_FUNNEL_SQL = r"""
WITH flagged AS (
  SELECT doc_id, n_chars,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS digit_ratio
  FROM documents
),
staged AS (
  SELECT CASE WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
              THEN 1 ELSE 0 END AS is_rep,
         CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1 ELSE 0 END AS len_ok,
         CASE WHEN digit_ratio < 0.3 AND n_tokens >= 20 THEN 1 ELSE 0 END AS qual_ok
  FROM flagged
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(is_rep) AS BIGINT) AS n_after_dedup,
       CAST(SUM(is_rep * len_ok) AS BIGINT) AS n_after_length,
       CAST(SUM(is_rep * len_ok * qual_ok) AS BIGINT) AS n_retained,
       ROUND(CAST(SUM(is_rep * len_ok * qual_ok) AS DOUBLE) / COUNT(*), 6) AS retention_rate
FROM staged
"""


def ext_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per returnflag,
    derived from EXACT decimal moments (n, Σx, Σy, Σxy, Σx², Σy²) —
    native corr() accumulates in floating point and differs in the last
    ulps between engines/partitionings; decimal moments make the result
    bit-identical and order-independent.

    Scale shape: one partial+final hash agg; the moments are algebraic,
    so map-side combine applies."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(15,3)").alias("x"),
        F.col("l_extendedprice").cast("decimal(15,3)").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    corr = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / F.sqrt(
        (m["n"] * m["sxx"] - m["sx"] * m["sx"])
        * (m["n"] * m["syy"] - m["sy"] * m["sy"])
    )
    return m.select(
        "l_returnflag",
        m["n"].cast("long").alias("n_rows"),
        F.round(corr, 6).alias("qty_price_corr"),
    ).orderBy("l_returnflag")


EXT_CORRELATION_SQL = r"""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,3))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,3))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,3)) * CAST(l_extendedprice AS DECIMAL(15,3))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,3)) * CAST(l_quantity AS DECIMAL(15,3))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,3)) * CAST(l_extendedprice AS DECIMAL(15,3))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS qty_price_corr
FROM m ORDER BY l_returnflag
"""


def ext_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily order revenue: decimal day
    sums, then a rows-bounded window over the ORDERED DAY AXIS (sum/count
    over the trailing frame — exact decimal numerator).

    Scale shape: like ext_running_revenue, the unpartitioned window runs
    over the O(days) aggregate, never raw orders."""
    from pyspark.sql.window import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
        )
        .groupBy("day")
        .agg(F.sum("price").cast("decimal(38,6)").alias("day_revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return (
        daily.withColumn(
            "ma7",
            F.round(
                F.sum("day_revenue").over(w).cast("double")
                / F.count(F.lit(1)).over(w),
                6,
            ),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("day_revenue").cast("string").alias("day_revenue"),
            "ma7",
        )
        .orderBy("day")
    )


EXT_MOVING_AVG_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS day_revenue
  FROM orders GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(day_revenue AS VARCHAR) AS day_revenue,
       ROUND(CAST(SUM(day_revenue) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def ext_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: month-axis decimal sums,
    lag(12) over the ordered month axis, growth percent from the exact
    decimals (NULL for the first year — no prior-year base).

    Scale shape: the lag window runs over O(months) aggregated rows."""
    from pyspark.sql.window import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
        )
        .groupBy("month")
        .agg(F.sum("price").cast("decimal(38,6)").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return (
        monthly.withColumn(
            "yoy_pct",
            F.round(
                (F.col("revenue").cast("double") - prev.cast("double"))
                / prev.cast("double")
                * 100,
                6,
            ),
        )
        .select(
            F.col("month").cast("string").alias("month"),
            F.col("revenue").cast("string").alias("revenue"),
            "yoy_pct",
        )
        .orderBy("month")
    )


EXT_YOY_SQL = r"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(month AS VARCHAR) AS month,
       CAST(revenue AS VARCHAR) AS revenue,
       ROUND((CAST(revenue AS DOUBLE) - CAST(lag(revenue, 12) OVER (ORDER BY month) AS DOUBLE))
             / CAST(lag(revenue, 12) OVER (ORDER BY month) AS DOUBLE) * 100, 6) AS yoy_pct
FROM monthly ORDER BY month
"""


def ext_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (segment, nation): every
    equivalence class with its size and a below-k flag (k=5), plus the
    governed-export decision input — the per-class rows that would need
    suppression or generalization.

    Scale shape: one hash agg over the QI combination; the audit output
    is O(distinct QI combos), never row-level."""
    cust = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    return (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("below_k", (F.col("class_size") < 5).cast("int"))
        .orderBy("c_mktsegment", "c_nationkey")
    )


EXT_K_ANONYMITY_SQL = r"""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS class_size,
       CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS below_k
FROM customer
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
"""


def ext_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 derivation from a change log:
    each user's value history becomes versioned validity ranges —
    valid_from = the change timestamp, valid_to = the NEXT change (NULL
    for the current version). One lead() in per-key windows.

    Scale shape: one exchange on the entity key; per-key sorts only.
    Epoch-micros outputs for engine-independent hashing."""
    from pyspark.sql.window import Window

    changes = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    ).select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.round("value", 6).alias("value"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
            (F.lead("ts").over(w).isNull()).cast("int").alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


EXT_SCD2_SQL = r"""
SELECT user_id, ROUND(value, 6) AS value,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
WHERE event_type = 'signup'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from_us
"""


def ext_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage heatmap axes: event counts per (ISO weekday, hour) cell —
    the load-profile / anomaly-baseline primitive. Spark ``weekday()``
    (0=Monday) aligned to DuckDB ``isodow - 1``.

    Scale shape: one partial+final hash agg into a fixed 7x24 output."""
    ev = _t(spark, sf_dir, "events").select(
        F.weekday("ts").cast("long").alias("weekday"),
        F.hour("ts").cast("long").alias("hour"),
    )
    return (
        ev.groupBy("weekday", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("weekday", "hour")
    )


EXT_WEEKDAY_PROFILE_SQL = r"""
SELECT isodow(ts) - 1 AS weekday, EXTRACT(HOUR FROM ts) AS hour,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY weekday, hour
"""


def ext_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key forward-fill imputation: error events carry no valid
    measurement (masked to NULL), each takes the user's most recent
    prior value — ``last(..., ignorenulls)`` over a trailing per-user
    window, the standard gap-imputation primitive for sensor/telemetry
    prep.

    Scale shape: one exchange on user_id, per-key ordered scan; the
    trailing frame keeps state O(1) per row."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    masked = ev.withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        masked.select(
            "user_id",
            "event_id",
            (F.col("event_type") == "error").cast("int").alias("was_masked"),
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("value_ffill"),
        )
        .orderBy("user_id", "event_id")
    )


EXT_FORWARD_FILL_SQL = r"""
SELECT user_id, event_id,
       CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS was_masked,
       ROUND(LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill
FROM events ORDER BY user_id, event_id
"""


def ext_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality audit for orders |><| lineitem on orderkey:
    per-side row/distinct-key counts, max per-key multiplicity, and the
    EXACT join output size — the 'will this join explode' check run
    before committing to a shuffle at scale.

    Scale shape: two hash aggs (one per side, keyed by the join key) and
    a join of the two small per-key count frames; the predicted size is
    Σ cnt_l × cnt_r — no execution of the audited join itself."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    lc = li.groupBy("k").agg(F.count(F.lit(1)).alias("cl"))
    oc = orders.groupBy("k").agg(F.count(F.lit(1)).alias("cr"))
    joined = lc.join(oc, "k", "inner")
    return (
        joined.agg(
            F.sum("cl").alias("_left_matched"),
            F.sum("cr").alias("_right_matched"),
            F.max("cl").alias("max_left_multiplicity"),
            F.max("cr").alias("max_right_multiplicity"),
            F.sum(F.col("cl") * F.col("cr")).alias("join_output_rows"),
            F.count(F.lit(1)).alias("n_matched_keys"),
        )
        .select(
            "n_matched_keys",
            "max_left_multiplicity",
            "max_right_multiplicity",
            "join_output_rows",
        )
    )


EXT_JOIN_AUDIT_SQL = r"""
WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1),
oc AS (SELECT o_orderkey AS k, COUNT(*) AS cr FROM orders GROUP BY 1),
j AS (SELECT cl, cr FROM lc JOIN oc USING (k))
SELECT COUNT(*) AS n_matched_keys,
       MAX(cl) AS max_left_multiplicity,
       MAX(cr) AS max_right_multiplicity,
       CAST(SUM(cl * cr) AS BIGINT) AS join_output_rows
FROM j
"""


def ext_ri_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan foreign keys per relation
    (lineitem->orders on orderkey, orders->customer on custkey) as LEFT
    ANTI joins, reported as one long-format frame.

    Scale shape: anti joins never widen the probe side; each relation is
    one equi-exchange; counts are tiny aggregates."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    li_orphans = li.join(
        orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_orphans"))
    ord_orphans = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_orphans"))
    return (
        li_orphans.select(
            F.lit("lineitem->orders").alias("relation"), "n_orphans"
        )
        .unionAll(
            ord_orphans.select(
                F.lit("orders->customer").alias("relation"), "n_orphans"
            )
        )
        .orderBy("relation")
    )


EXT_RI_CHECK_SQL = r"""
SELECT 'lineitem->orders' AS relation,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
ORDER BY relation
"""


def ext_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/staleness audit: latest event per type vs the global
    watermark, lag in seconds — the 'is source X falling behind' monitor.

    Scale shape: one tiny per-type MAX agg; the global max derives from
    the same aggregate (no second scan — a window over the O(types)
    frame)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    per_type = ev.groupBy("event_type").agg(
        F.unix_micros(F.max("ts")).alias("latest_us")
    )
    w = Window.partitionBy()
    return (
        per_type.withColumn("global_latest_us", F.max("latest_us").over(w))
        .select(
            "event_type",
            "latest_us",
            # floor on BOTH engines: DuckDB's double->bigint cast rounds,
            # Spark's truncates — explicit floor removes the ambiguity
            F.floor((F.col("global_latest_us") - F.col("latest_us")) / 1_000_000)
            .cast("long")
            .alias("lag_seconds"),
        )
        .orderBy("event_type")
    )


EXT_FRESHNESS_SQL = r"""
WITH per_type AS (
  SELECT event_type, epoch_us(MAX(ts)) AS latest_us FROM events GROUP BY 1
)
SELECT event_type, latest_us,
       CAST(FLOOR((MAX(latest_us) OVER () - latest_us) / 1000000) AS BIGINT) AS lag_seconds
FROM per_type ORDER BY event_type
"""


def ext_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit: per market segment, exact-interpolated
    Q1/Q3 of account balance, 1.5-IQR fences, and the out-of-fence count
    — two passes (tiny fence agg broadcast back onto the rows), the
    standard distribution-drift gate.

    Scale shape: pass 1 is a per-group percentile agg (O(groups) out);
    pass 2 re-scans with the broadcast fences — data rows never shuffle."""
    cust = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    fences = cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("q3"),
    )
    flagged = cust.join(F.broadcast(fences), "c_mktsegment")
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        flagged.groupBy("c_mktsegment", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                ((F.col("c_acctbal") < lo) | (F.col("c_acctbal") > hi)).cast("int")
            ).alias("n_outliers"),
        )
        .orderBy("c_mktsegment")
    )


EXT_IQR_SQL = r"""
WITH fences AS (
  SELECT c_mktsegment,
         ROUND(quantile_cont(c_acctbal, 0.25), 4) AS q1,
         ROUND(quantile_cont(c_acctbal, 0.75), 4) AS q3
  FROM customer GROUP BY 1
)
SELECT c.c_mktsegment, q1, q3, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c.c_acctbal < q1 - 1.5 * (q3 - q1)
                  OR c.c_acctbal > q3 + 1.5 * (q3 - q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM customer c JOIN fences f ON c.c_mktsegment = f.c_mktsegment
GROUP BY c.c_mktsegment, q1, q3 ORDER BY c.c_mktsegment
"""


def ext_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: per-user consecutive event-type
    bigrams (lag in per-user time order), counted globally with each
    source state's outgoing probability — the Markov-chain input for
    sequence modeling / funnel discovery.

    Scale shape: lag() in per-user windows (one exchange on user_id),
    then a tiny (types x types) hash agg; probabilities derive from a
    window over the O(types²) aggregate."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = bigrams.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(wt), 6)
        )
        .orderBy("from_type", "to_type")
    )


EXT_TRANSITIONS_SQL = r"""
WITH bigrams AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM bigrams WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM counts ORDER BY from_type, to_type
"""


def ext_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical diversity: corpus type-token ratio and mean
    token length from ROW-LOCAL array HOFs (no explode, no shuffle per
    token), aggregated as exact integer moments with one final division.

    Scale shape: the entire per-doc computation is a projection; the only
    exchange is the per-language final agg."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("lang", F.trim("text").alias("t"))
        # blank docs: split('', '\s+') yields [''] (n_tok=1), so the
        # n_tok>0 guard below can't exclude them — match the oracle's
        # explicit whitespace-only pre-filter
        .filter(F.length(F.col("t")) > 0)
    )
    toks = F.split(F.col("t"), r"\s+")
    per_doc = docs.select(
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.length(F.regexp_replace("t", r"\s+", "")).alias("n_alpha"),
    ).filter(F.col("n_tok") > 0)
    # ratio-of-sums (integer moments, ONE final division) — a mean of
    # per-row decimal quotients would expose engine-specific division
    # scales; integer sums are exact everywhere
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("n_types").cast("double") / F.sum("n_tok"), 6
            ).alias("corpus_ttr"),
            F.round(
                F.sum("n_alpha").cast("double") / F.sum("n_tok"), 6
            ).alias("mean_token_len"),
        )
        .orderBy("lang")
    )


EXT_LEXICAL_SQL = r"""
WITH per_doc AS (
  SELECT lang,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_types,
         length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_alpha
  FROM documents WHERE length(trim(text)) > 0
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(n_types) AS DOUBLE) / SUM(n_tok), 6) AS corpus_ttr,
       ROUND(CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_tok), 6) AS mean_token_len
FROM per_doc WHERE n_tok > 0
GROUP BY lang ORDER BY lang
"""


def ext_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: the share of segment
    revenue held by its top-decile customers (per-customer decimal
    revenue -> per-segment P90 threshold -> conditional share).

    Scale shape: the raw tables collapse to per-customer revenue first
    (one orderkey exchange + one custkey agg); the percentile + share
    passes run over the O(customers) aggregate with broadcast
    thresholds — raw rows are touched once."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("rev").cast("decimal(38,6)").alias("crev"))
    )
    thresholds = per_cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile(F.col("crev").cast("double"), F.lit(0.9)), 4).alias("p90")
    )
    tagged = per_cust.join(F.broadcast(thresholds), "c_mktsegment")
    return (
        tagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(F.col("crev").cast("double") >= F.col("p90"), F.col("crev"))
                .otherwise(F.lit(0).cast("decimal(38,6)"))
            ).cast("decimal(38,6)").alias("_top"),
            F.sum("crev").cast("decimal(38,6)").alias("_total"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            F.round(
                F.col("_top").cast("double") / F.col("_total").cast("double"), 6
            ).alias("top_decile_share"),
        )
        .orderBy("c_mktsegment")
    )


EXT_PARETO_SQL = r"""
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
              AS DECIMAL(38,6)) AS crev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
t AS (
  SELECT c_mktsegment, ROUND(quantile_cont(CAST(crev AS DOUBLE), 0.9), 4) AS p90
  FROM per_cust GROUP BY 1
)
SELECT p.c_mktsegment, COUNT(*) AS n_customers,
       ROUND(CAST(CAST(SUM(CASE WHEN CAST(crev AS DOUBLE) >= p90 THEN crev
                                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM(crev) AS DECIMAL(38,6)) AS DOUBLE), 6) AS top_decile_share
FROM per_cust p JOIN t ON p.c_mktsegment = t.c_mktsegment
GROUP BY p.c_mktsegment ORDER BY p.c_mktsegment
"""


def ext_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day DISTINCT active users per day. Distinct counts are
    NOT mergeable from daily distincts — the exact path compacts events
    to the (day, user) pair frame first, then counts each pair into the
    <= 7 trailing days it belongs to via a generated day offset (pairs
    explode x7, but pairs << raw events).

    At 100 TB the same query swaps the exact pair explode for
    ``hll_sketch_agg`` per day + ``hll_union_agg`` over the trailing
    window (mergeable sketches — see ext_distinct_counts for the HLL
    surface); the exact form IS the oracle here."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    pairs = ev.distinct()
    days = ev.select("d").distinct()
    contrib = pairs.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "d"
    ).select("user_id", F.date_add("d", F.col("off")).alias("day"))
    return (
        contrib.join(days, contrib["day"] == days["d"])
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n_active_7d"))
        .select(F.col("day").cast("string").alias("day"), "n_active_7d")
        .orderBy("day")
    )


EXT_ROLLING_DISTINCT_SQL = r"""
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
contrib AS (
  SELECT user_id, d + CAST(off AS INTEGER) AS day
  FROM pairs, (SELECT unnest(generate_series(0, 6)) AS off)
)
SELECT CAST(days.d AS VARCHAR) AS day,
       COUNT(DISTINCT user_id) AS n_active_7d
FROM contrib JOIN days ON contrib.day = days.d
GROUP BY days.d ORDER BY day
"""


EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_pareto_share": ext_pareto_share,
    "ext_rolling_distinct": ext_rolling_distinct,
    "ext_transitions": ext_transitions,
    "ext_lexical_diversity": ext_lexical_diversity,
    "ext_freshness": ext_freshness,
    "ext_iqr_outliers": ext_iqr_outliers,
    "ext_join_audit": ext_join_audit,
    "ext_ri_check": ext_ri_check,
    "ext_weekday_profile": ext_weekday_profile,
    "ext_forward_fill": ext_forward_fill,
    "ext_k_anonymity": ext_k_anonymity,
    "ext_scd2": ext_scd2,
    "ext_correlation": ext_correlation,
    "ext_moving_avg": ext_moving_avg,
    "ext_yoy_growth": ext_yoy_growth,
    "ext_curation_funnel": ext_curation_funnel,
    "ext_stream_enrich": ext_stream_enrich,
    "ext_argminmax": ext_argminmax,
    "ext_mode_by_group": ext_mode_by_group,
    "ext_reconcile": ext_reconcile,
    "ext_union_evolve": ext_union_evolve,
    "ext_partitioned_export": ext_partitioned_export,
    "ext_supplier_volume": ext_supplier_volume,
    "ext_next_event_gap": ext_next_event_gap,
    "ext_segment_rank": ext_segment_rank,
    "ext_running_revenue": ext_running_revenue,
    "ext_late_orders": ext_late_orders,
    "ext_event_sequences": ext_event_sequences,
    "ext_group_sample": ext_group_sample,
    "ext_promo_share": ext_promo_share,
    "ext_sessionize": ext_sessionize,
    "ext_gap_fill": ext_gap_fill,
    "ext_pricing_summary": ext_pricing_summary,
    "ext_top_customers": ext_top_customers,
    "ext_funnel": ext_funnel,
    "ext_retention": ext_retention,
    "ext_pseudonymize": ext_pseudonymize,
    "ext_fuzzy_join": ext_fuzzy_join,
    "ext_profile": ext_profile,
    "ext_mad": ext_mad,
    "ext_star_join": ext_star_join,
    "ext_grouping_sets": ext_grouping_sets,
    "ext_latest_by_key": ext_latest_by_key,
    "ext_quantile_buckets": ext_quantile_buckets,
    "ext_quantize_embeddings": ext_quantize_embeddings,
    "ext_json_extract": ext_json_extract,
    "ext_pack_documents": ext_pack_documents,
    "ext_mixture_sample": ext_mixture_sample,
    "ext_corpus_mix": ext_corpus_mix,
    "ext_clean_text": ext_clean_text,
    "ext_winsorize": ext_winsorize,
    "ext_distinct_counts": ext_distinct_counts,
    "ext_anti_join": ext_anti_join,
    "ext_set_ops": ext_set_ops,
    "ext_ngram_topk": ext_ngram_topk,
    "ext_bm25": ext_bm25,
    "ext_rolling_event_stats": ext_rolling_event_stats,
    "ext_zscore": ext_zscore,
    "ext_histogram": ext_histogram,
    "ext_cube_agg": ext_cube_agg,
    "ext_text_stats": ext_text_stats,
    "ext_quality_score": ext_quality_score,
    "ext_lang_id": ext_lang_id,
    "ext_fingerprint": ext_fingerprint,
    "ext_stopword_ratio": ext_stopword_ratio,
    "ext_rolling_fingerprint": ext_rolling_fingerprint,
    "ext_repetition_stats": ext_repetition_stats,
    "ext_pii_stats": ext_pii_stats,
    "ext_asof_join": ext_asof_join,
    "ext_range_join": ext_range_join,
    "ext_topk_per_group": ext_topk_per_group,
    "ext_rollup_agg": ext_rollup_agg,
    "ext_percentiles": ext_percentiles,
    "ext_shuffle": ext_shuffle,
    "ext_hash_split": ext_hash_split,
    "ext_stratified_sample": ext_stratified_sample,
    "ext_chunk_documents": ext_chunk_documents,
    "ext_vector_norms": ext_vector_norms,
    "ext_label_centroids": ext_label_centroids,
    "ext_tf_idf": ext_tf_idf,
    "ext_length_filter": ext_length_filter,
    "ext_event_features": ext_event_features,
    "ext_pivot_counts": ext_pivot_counts,
    "ext_weighted_sample": ext_weighted_sample,
    "ext_dedup_groups": ext_dedup_groups,
    "ext_decontaminate": ext_decontaminate,
    "ext_vocab_topk": ext_vocab_topk,
    "ext_dedup_exact": ext_dedup_exact,
    "ext_dedup_ngram_jaccard": ext_dedup_ngram_jaccard,
    "ext_dedup_minhash": ext_dedup_minhash,
    "ext_dedup_simhash": ext_dedup_simhash,
    "ext_dedup_embedding": ext_dedup_embedding,
    "ext_dedup_embedding_lsh": ext_dedup_embedding_lsh,
    "ext_sim_topk_brute": ext_sim_topk_brute,
    "ext_sim_topk_lsh": ext_sim_topk_lsh,
    "ext_sim_topk_ivf": ext_sim_topk_ivf,
    "ext_sim_topk_pq": ext_sim_topk_pq,
    "ext_stream_window_counts": ext_stream_window_counts,
    "ext_stream_sessions": ext_stream_sessions,
    "ext_mm_byte_features": ext_mm_byte_features,
    "ext_mm_resize": ext_mm_resize,
}

# minhash/simhash/LSH ANN are non-SQL-expressible (algorithm-specific
# candidate generation) -> rows-only check; everything else has an oracle.
EXT_ORACLES: dict[str, str] = {
    "ext_pareto_share": EXT_PARETO_SQL,
    "ext_rolling_distinct": EXT_ROLLING_DISTINCT_SQL,
    "ext_transitions": EXT_TRANSITIONS_SQL,
    "ext_lexical_diversity": EXT_LEXICAL_SQL,
    "ext_freshness": EXT_FRESHNESS_SQL,
    "ext_iqr_outliers": EXT_IQR_SQL,
    "ext_join_audit": EXT_JOIN_AUDIT_SQL,
    "ext_ri_check": EXT_RI_CHECK_SQL,
    "ext_weekday_profile": EXT_WEEKDAY_PROFILE_SQL,
    "ext_forward_fill": EXT_FORWARD_FILL_SQL,
    "ext_k_anonymity": EXT_K_ANONYMITY_SQL,
    "ext_scd2": EXT_SCD2_SQL,
    "ext_correlation": EXT_CORRELATION_SQL,
    "ext_moving_avg": EXT_MOVING_AVG_SQL,
    "ext_yoy_growth": EXT_YOY_SQL,
    "ext_curation_funnel": EXT_CURATION_FUNNEL_SQL,
    "ext_stream_enrich": EXT_STREAM_ENRICH_SQL,
    "ext_argminmax": EXT_ARGMINMAX_SQL,
    "ext_mode_by_group": EXT_MODE_SQL,
    "ext_reconcile": EXT_RECONCILE_SQL,
    "ext_union_evolve": EXT_UNION_EVOLVE_SQL,
    "ext_partitioned_export": EXT_PARTITIONED_EXPORT_SQL,
    "ext_supplier_volume": EXT_SUPPLIER_VOLUME_SQL,
    "ext_next_event_gap": EXT_NEXT_EVENT_GAP_SQL,
    "ext_segment_rank": EXT_SEGMENT_RANK_SQL,
    "ext_running_revenue": EXT_RUNNING_REVENUE_SQL,
    "ext_late_orders": EXT_LATE_ORDERS_SQL,
    "ext_event_sequences": EXT_EVENT_SEQUENCES_SQL,
    "ext_group_sample": EXT_GROUP_SAMPLE_SQL,
    "ext_promo_share": EXT_PROMO_SHARE_SQL,
    "ext_sessionize": EXT_SESSIONIZE_SQL,
    "ext_gap_fill": EXT_GAP_FILL_SQL,
    "ext_pricing_summary": EXT_PRICING_SUMMARY_SQL,
    "ext_top_customers": EXT_TOP_CUSTOMERS_SQL,
    "ext_funnel": EXT_FUNNEL_SQL,
    "ext_retention": EXT_RETENTION_SQL,
    "ext_pseudonymize": EXT_PSEUDONYMIZE_SQL,
    "ext_fuzzy_join": EXT_FUZZY_JOIN_SQL,
    "ext_profile": EXT_PROFILE_SQL,
    "ext_mad": EXT_MAD_SQL,
    "ext_star_join": EXT_STAR_JOIN_SQL,
    "ext_grouping_sets": EXT_GROUPING_SETS_SQL,
    "ext_latest_by_key": EXT_LATEST_BY_KEY_SQL,
    "ext_quantile_buckets": EXT_QUANTILE_BUCKETS_SQL,
    "ext_quantize_embeddings": EXT_QUANTIZE_SQL,
    "ext_json_extract": EXT_JSON_EXTRACT_SQL,
    "ext_pack_documents": EXT_PACK_DOCUMENTS_SQL,
    "ext_mixture_sample": EXT_MIXTURE_SAMPLE_SQL,
    "ext_corpus_mix": EXT_CORPUS_MIX_SQL,
    "ext_clean_text": EXT_CLEAN_TEXT_SQL,
    "ext_winsorize": EXT_WINSORIZE_SQL,
    "ext_distinct_counts": EXT_DISTINCT_COUNTS_SQL,
    "ext_anti_join": EXT_ANTI_JOIN_SQL,
    "ext_set_ops": EXT_SET_OPS_SQL,
    "ext_ngram_topk": EXT_NGRAM_TOPK_SQL,
    "ext_bm25": EXT_BM25_SQL,
    "ext_rolling_event_stats": EXT_ROLLING_EVENT_SQL,
    "ext_zscore": EXT_ZSCORE_SQL,
    "ext_histogram": EXT_HISTOGRAM_SQL,
    "ext_cube_agg": EXT_CUBE_SQL,
    "ext_stream_window_counts": EXT_STREAM_WINDOW_SQL,
    "ext_stream_sessions": EXT_STREAM_SESSIONS_SQL,
    "ext_text_stats": EXT_TEXT_STATS_SQL,
    "ext_quality_score": EXT_QUALITY_SQL,
    "ext_lang_id": EXT_LANG_ID_SQL,
    "ext_fingerprint": EXT_FINGERPRINT_SQL,
    "ext_stopword_ratio": EXT_STOPWORD_SQL,
    "ext_repetition_stats": EXT_REPETITION_SQL,
    "ext_pii_stats": EXT_PII_SQL,
    "ext_asof_join": EXT_ASOF_SQL,
    "ext_range_join": EXT_RANGE_JOIN_SQL,
    "ext_topk_per_group": EXT_TOPK_SQL,
    "ext_rollup_agg": EXT_ROLLUP_SQL,
    "ext_percentiles": EXT_PERCENTILES_SQL,
    "ext_shuffle": EXT_SHUFFLE_SQL,
    "ext_hash_split": EXT_HASH_SPLIT_SQL,
    "ext_stratified_sample": EXT_STRATIFIED_SQL,
    "ext_chunk_documents": EXT_CHUNK_SQL,
    "ext_vector_norms": EXT_VECTOR_NORMS_SQL,
    "ext_label_centroids": EXT_LABEL_CENTROIDS_SQL,
    "ext_tf_idf": EXT_TF_IDF_SQL,
    "ext_length_filter": EXT_LENGTH_FILTER_SQL,
    "ext_event_features": EXT_EVENT_FEATURES_SQL,
    "ext_pivot_counts": EXT_PIVOT_SQL,
    "ext_weighted_sample": EXT_WEIGHTED_SAMPLE_SQL,
    "ext_dedup_groups": EXT_DEDUP_GROUPS_SQL,
    "ext_decontaminate": EXT_DECONTAMINATE_SQL,
    "ext_vocab_topk": EXT_VOCAB_TOPK_SQL,
    "ext_dedup_exact": EXT_DEDUP_EXACT_SQL,
    "ext_dedup_ngram_jaccard": EXT_DEDUP_JACCARD_SQL,
    "ext_dedup_embedding": EXT_DEDUP_EMBEDDING_SQL,
    "ext_sim_topk_brute": EXT_SIM_TOPK_SQL,
    "ext_mm_byte_features": EXT_MM_BYTES_SQL,
    "ext_mm_resize": EXT_MM_RESIZE_SQL,
}


# --- round-2 analytics wave: classic warehouse flavors (Q2/Q11/Q16/Q22) +
# inequality/independence/vocabulary/trending ---------------------------------------


def ext_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest observed supplier per part (TPC-H Q2 flavor without
    partsupp): per (part, supplier) mean unit price from lineitem, then the
    per-part argmin via MIN over a (price, suppkey) struct — engine-neutral
    deterministic tie-break, no window needed.

    Scale shape: the filtered part dim broadcast-joins BEFORE the pair
    aggregate (the dim filter is the fact filter — ~90% of pairs never
    enter the hash agg), then one (partkey, suppkey) exchange for the pair
    agg and one partkey exchange for the argmin, both partial-aggregated
    map-side."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price"),
        F.col("l_quantity").cast("decimal(18,6)").alias("qty"),
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 45).select(
        "p_partkey", "p_brand", "p_size"
    )
    # the selective dim filter acts as the fact filter: broadcast-join it
    # BEFORE the wide (partkey, suppkey) aggregate so ~90% of pairs never
    # enter the hash agg (Catalyst can't infer this pushdown — the
    # predicate lives on the dim, the join is the filter)
    li = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    pair = (
        li.groupBy("l_partkey", "p_brand", "p_size", "l_suppkey")
        .agg(
            F.round(
                (F.sum("price") / F.sum("qty")).cast("decimal(38,6)"), 4
            ).alias("unit_price")
        )
    )
    return (
        pair.groupBy("l_partkey", "p_brand", "p_size")
        .agg(F.min(F.struct("unit_price", "l_suppkey")).alias("b"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "p_size",
            F.col("b.l_suppkey").alias("best_suppkey"),
            F.col("b.unit_price").cast("double").alias("best_unit_price"),
        )
        .orderBy("p_partkey")
    )


EXT_MIN_COST_SUPPLIER_SQL = r"""
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
               / SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)), 4)
           AS unit_price
  FROM lineitem GROUP BY 1, 2
),
best AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS best_suppkey,
         CAST(unit_price AS DOUBLE) AS best_unit_price,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY unit_price, l_suppkey) AS rn
  FROM pair
)
SELECT p.p_partkey, p.p_brand, p.p_size, b.best_suppkey, b.best_unit_price
FROM best b JOIN part p USING (p_partkey)
WHERE b.rn = 1 AND p.p_size >= 45
ORDER BY p.p_partkey
"""


def ext_nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue share vs the corpus total, keeping nations
    above a fraction threshold (TPC-H Q11 flavor: GROUP BY + HAVING
    against a global scalar).

    Scale shape: lineitem collapses per-suppkey first (the big exchange),
    then joins the small supplier/nation dims broadcast; the global total
    is a 1-row aggregate joined as a broadcast literal, never a second
    scan of the fact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("rev").cast("decimal(38,6)").alias("srev")
    )
    per_nation = (
        per_supp.join(F.broadcast(sup), per_supp["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("srev").cast("decimal(38,6)").alias("value"))
    )
    total = per_nation.agg(F.sum("value").cast("decimal(38,6)").alias("tot"))
    return (
        per_nation.join(F.broadcast(total))
        .withColumn(
            "share", F.round(F.col("value").cast("double") / F.col("tot").cast("double"), 6)
        )
        .filter(F.col("share") > 0.04)
        .select("n_name", F.col("value").cast("double").alias("value"), "share")
        .orderBy("n_name")
    )


EXT_NATION_VALUE_SHARE_SQL = r"""
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
           AS DECIMAL(38,6)) AS srev
  FROM lineitem GROUP BY 1
),
per_nation AS (
  SELECT n.n_name, CAST(SUM(srev) AS DECIMAL(38,6)) AS value
  FROM per_supp
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(value) AS DECIMAL(38,6)) AS tot FROM per_nation)
SELECT n_name, CAST(value AS DOUBLE) AS value,
       ROUND(CAST(value AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM per_nation CROSS JOIN tot
WHERE ROUND(CAST(value AS DOUBLE) / CAST(tot AS DOUBLE), 6) > 0.04
ORDER BY n_name
"""


def ext_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size-band) excluding a supplier
    denylist (TPC-H Q16 flavor: COUNT(DISTINCT) with a NOT-IN rewritten as
    LEFT ANTI).

    Scale shape: observed (partkey, suppkey) pairs dedup map-side before
    any join; the denylist (negative-balance suppliers) is tiny and
    broadcast for the anti join; the part dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        (F.floor(F.col("p_size") / 10) * 10).cast("int").alias("size_band"),
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy("p_brand", "size_band")
    )


EXT_PART_SUPPLIER_COUNT_SQL = r"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
keep AS (
  SELECT * FROM pairs
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p.p_brand, CAST(FLOOR(p.p_size / 10) * 10 AS INTEGER) AS size_band,
       CAST(COUNT(DISTINCT k.l_suppkey) AS BIGINT) AS supplier_cnt
FROM keep k JOIN part p ON k.l_partkey = p.p_partkey
GROUP BY 1, 2 ORDER BY p_brand, size_band
"""


def ext_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no orders (TPC-H Q22 flavor): balance
    above the positive-balance average AND no order history — scalar-
    subquery threshold + LEFT ANTI existence check, reported per nation.

    Scale shape: the average is a 1-row broadcast; the anti join probes
    orders by custkey only (key-projected build side); output is
    O(nations)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("threshold")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


EXT_IDLE_CUSTOMERS_SQL = r"""
WITH thresh AS (
  SELECT ROUND(AVG(c_acctbal), 4) AS threshold FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS totacctbal
FROM customer CROSS JOIN thresh
WHERE c_acctbal > threshold
  AND c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def ext_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    standard rank formula G = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n over ascending
    per-customer revenue.

    Scale shape: raw rows collapse to per-customer revenue first. The
    per-segment rank is NOT a ``Window.partitionBy(segment)`` — with ~5
    segments that window sorts millions of rows per segment in ONE task at
    scale (the low-cardinality-window trap). Instead: range-partitioned
    GLOBAL numbering ordered by (segment, crev, custkey) — rownum.py's
    partition-offset scheme, parallel at any size — then the in-segment
    rank is global_i minus the segment's broadcast start offset (exact
    cumulative counts over O(segments) rows). Ties carry identical values
    so rank order among ties cannot change the statistic."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("rev").cast("decimal(38,6)").alias("crev"))
    )
    numbered = with_row_number(
        per_cust, column="_gi", order_by=["c_mktsegment", "crev", "c_custkey"]
    )
    seg_counts = per_cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("_n"))
    seg_offsets = seg_counts.select(
        "c_mktsegment",
        (
            F.sum("_n").over(
                Window.orderBy("c_mktsegment").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna({"_off": 0})
    ranked = numbered.join(F.broadcast(seg_offsets), "c_mktsegment").withColumn(
        "i", F.col("_gi") - F.col("_off")
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("i") * F.col("crev")).cast("decimal(38,6)").alias("_iws"),
            F.sum("crev").cast("decimal(38,6)").alias("_tot"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            F.round(
                F.lit(2.0) * F.col("_iws").cast("double")
                / (F.col("n_customers") * F.col("_tot").cast("double"))
                - (F.col("n_customers") + F.lit(1.0)) / F.col("n_customers"),
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


EXT_GINI_SQL = r"""
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
           AS DECIMAL(38,6)) AS crev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_mktsegment, crev,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY crev, c_custkey) AS i
  FROM per_cust
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       ROUND(2.0 * CAST(SUM(i * crev) AS DOUBLE)
             / (COUNT(*) * CAST(SUM(crev) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def ext_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment × order-priority independence audit: observed contingency
    counts vs expected-under-independence, with each cell's chi-square
    contribution — the classic pre-modeling association check.

    Scale shape: one (segment, priority) hash agg over the joined fact;
    the margins are tiny aggregates of the cell frame joined back
    broadcast; output is O(segments × priorities)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    row_tot = cells.groupBy("c_mktsegment").agg(F.sum("observed").alias("rt"))
    col_tot = cells.groupBy("o_orderpriority").agg(F.sum("observed").alias("ct"))
    grand = cells.agg(F.sum("observed").alias("gt"))
    return (
        cells.join(F.broadcast(row_tot), "c_mktsegment")
        .join(F.broadcast(col_tot), "o_orderpriority")
        .join(F.broadcast(grand))
        .withColumn("expected", F.round(F.col("rt") * F.col("ct") / F.col("gt"), 4))
        .withColumn(
            "contribution",
            F.round(
                F.pow(F.col("observed") - F.col("rt") * F.col("ct") / F.col("gt"), 2)
                / (F.col("rt") * F.col("ct") / F.col("gt")),
                6,
            ),
        )
        .select("c_mktsegment", "o_orderpriority", "observed", "expected", "contribution")
        .orderBy("c_mktsegment", "o_orderpriority")
    )


EXT_CHI_SQUARE_SQL = r"""
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS observed
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
rt AS (SELECT c_mktsegment, CAST(SUM(observed) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT o_orderpriority, CAST(SUM(observed) AS BIGINT) AS ct FROM cells GROUP BY 1),
gt AS (SELECT CAST(SUM(observed) AS BIGINT) AS gt FROM cells)
SELECT c.c_mktsegment, c.o_orderpriority, c.observed,
       ROUND(CAST(rt.rt AS DOUBLE) * ct.ct / gt.gt, 4) AS expected,
       ROUND(POW(c.observed - CAST(rt.rt AS DOUBLE) * ct.ct / gt.gt, 2)
             / (CAST(rt.rt AS DOUBLE) * ct.ct / gt.gt), 6) AS contribution
FROM cells c
JOIN rt USING (c_mktsegment)
JOIN ct USING (o_orderpriority)
CROSS JOIN gt
ORDER BY c.c_mktsegment, c.o_orderpriority
"""


def ext_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary size and hapax-legomena share (words seen
    exactly once) — a corpus-maturity / OCR-noise signal: noisy extractions
    show inflated hapax mass.

    Scale shape: tokens explode once, partial-agg to (lang, word) counts
    (the only big exchange), then collapse to O(languages). No per-row
    Python anywhere."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.lower(F.trim(F.col("text"))).alias("t")
    )
    words = (
        docs.filter(F.length("t") > 0)
        .select("lang", F.explode(F.split("t", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    vocab = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    return (
        vocab.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "lang",
            "vocab_size",
            "n_hapax",
            F.round(F.col("n_hapax") / F.col("vocab_size"), 6).alias("hapax_share"),
        )
        .orderBy("lang")
    )


EXT_HAPAX_SQL = r"""
WITH words AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
vocab AS (
  SELECT lang, w, COUNT(*) AS n FROM words WHERE w <> '' GROUP BY 1, 2
)
SELECT lang, COUNT(*) AS vocab_size,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS hapax_share
FROM vocab GROUP BY lang ORDER BY lang
"""


def ext_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per ISO week by volume — the trending-topics
    shape: windowed counts then a rank head per window.

    Scale shape: the only fact-table exchange is the (week, type) partial
    agg; the rank window runs over O(weeks × types) rows and compiles to
    WindowGroupLimit pushdown. Deterministic tie-break (count desc, type
    asc)."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "event_type"
    )
    counts = ev.groupBy("week", "event_type").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("week").orderBy(F.col("n_events").desc(), F.col("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("week", "rnk", "event_type", "n_events")
        .orderBy("week", "rnk")
    )


EXT_TRENDING_SQL = r"""
WITH counts AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT week, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY n_events DESC, event_type) AS rnk
  FROM counts
)
SELECT week, rnk, event_type, n_events FROM ranked
WHERE rnk <= 3 ORDER BY week, rnk
"""


EXT_QUERIES.update(
    {
        "ext_min_cost_supplier": ext_min_cost_supplier,
        "ext_nation_value_share": ext_nation_value_share,
        "ext_part_supplier_count": ext_part_supplier_count,
        "ext_idle_customers": ext_idle_customers,
        "ext_gini": ext_gini,
        "ext_chi_square": ext_chi_square,
        "ext_hapax_ratio": ext_hapax_ratio,
        "ext_trending_topk": ext_trending_topk,
    }
)
EXT_ORACLES.update(
    {
        "ext_min_cost_supplier": EXT_MIN_COST_SUPPLIER_SQL,
        "ext_nation_value_share": EXT_NATION_VALUE_SHARE_SQL,
        "ext_part_supplier_count": EXT_PART_SUPPLIER_COUNT_SQL,
        "ext_idle_customers": EXT_IDLE_CUSTOMERS_SQL,
        "ext_gini": EXT_GINI_SQL,
        "ext_chi_square": EXT_CHI_SQUARE_SQL,
        "ext_hapax_ratio": EXT_HAPAX_SQL,
        "ext_trending_topk": EXT_TRENDING_SQL,
    }
)


# --- round-2 wave 2: reshaping, sketches, ranking classics -------------------------


def ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (melt): customer balance/counts as (metric,
    value) rows via the built-in ``unpivot`` — the inverse of the count
    pivot (X44), needed constantly for plotting/export layers.

    Scale shape: unpivot is a row-local Expand (no shuffle); the only
    exchange is the final per-metric aggregate, O(metrics) output."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    long = cust.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("metric")
    )


EXT_UNPIVOT_SQL = r"""
WITH long AS (
  SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
)
SELECT metric, COUNT(*) AS n_rows, ROUND(SUM(value), 2) AS sum_value,
       ROUND(MIN(value), 2) AS min_value, ROUND(MAX(value), 2) AS max_value
FROM long GROUP BY metric ORDER BY metric
"""


def ext_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped orders by revenue (TPC-H Q3 flavor): segment
    filter on the customer dim, date residuals both sides, revenue agg,
    global top-k.

    Scale shape: both date filters reach the scans (PushedFilters); the
    customer dim broadcasts; the global top-10 compiles to
    TakeOrderedAndProject — no full sort of the aggregate."""
    cutoff = "1995-03-15"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum("rev").cast("decimal(38,6)"), 4).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


EXT_SHIPPING_PRIORITY_SQL = r"""
SELECT l_orderkey, o_orderdate,
       CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
            * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DECIMAL(38,6)), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def ext_shipmode_priority_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority mix per return flag (TPC-H Q12 flavor):
    CASE-gated conditional counts over one scan — high- vs low-priority
    order shares among late lines.

    Scale shape: single fact exchange on the tiny group key; the orders
    dim join carries only (orderkey, priority); conditional sums are
    map-side partial."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


EXT_SHIPMODE_SQL = r"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def ext_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer-order graph: how many customers
    placed exactly k orders — the shape check before any graph/dedup-group
    work (heavy right tail = hub keys = skew risk).

    Scale shape: two cheap aggregates (custkey, then degree) — both
    partial-agged; output is O(distinct degrees)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    deg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("degree")
    )


EXT_DEGREE_SQL = r"""
WITH deg AS (SELECT o_custkey, COUNT(*) AS degree FROM orders GROUP BY 1)
SELECT degree, COUNT(*) AS n_customers FROM deg GROUP BY degree ORDER BY degree
"""


def ext_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean character entropy (Shannon, bits) — an OCR-noise
    / gibberish signal: natural text sits ~4-4.5 bits, random base64-ish
    noise pushes toward 6.

    Scale shape: per-doc entropy is ROW-LOCAL (aggregate over the doc's
    own char histogram via HOFs — no explode, no per-char shuffle); the
    only exchange is the per-language mean. Entropy uses exact integer
    char counts; one log2 per distinct char per doc."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.lower(F.trim(F.col("text"))).alias("t")
    ).filter(F.length("t") > 0)
    chars = F.split(F.col("t"), "")
    # distinct chars -> per-char count via size(filter(...)) — all row-local
    per_doc = docs.select(
        "lang",
        F.length("t").alias("n"),
        F.transform(
            F.array_distinct(chars),
            lambda c: F.size(F.filter(chars, lambda x: x == c)),
        ).alias("counts"),
    )
    log2 = lambda col: F.log(col) / F.log(F.lit(2.0))  # noqa: E731
    ent = F.aggregate(
        F.col("counts"),
        F.lit(0.0),
        lambda acc, k: acc - (k / F.col("n")) * log2(k / F.col("n")),
    )
    return (
        per_doc.select("lang", ent.alias("h"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("h"), 6).alias("mean_entropy_bits"),
        )
        .orderBy("lang")
    )


EXT_CHAR_ENTROPY_SQL = r"""
WITH chars AS (
  SELECT lang, doc_id AS doc, unnest(string_split(lower(trim(text)), '')) AS c,
         length(lower(trim(text))) AS n
  FROM documents WHERE length(trim(text)) > 0
),
counts AS (
  SELECT lang, doc, n, COUNT(*) AS k FROM chars GROUP BY 1, 2, 3, c
),
per_doc AS (
  SELECT lang, doc,
         -SUM((CAST(k AS DOUBLE) / n) * log2(CAST(k AS DOUBLE) / n)) AS h
  FROM counts GROUP BY 1, 2
)
SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(h), 6) AS mean_entropy_bits
FROM per_doc GROUP BY lang ORDER BY lang
"""


EXT_QUERIES.update(
    {
        "ext_unpivot": ext_unpivot,
        "ext_shipping_priority": ext_shipping_priority,
        "ext_shipmode_priority_audit": ext_shipmode_priority_audit,
        "ext_degree_distribution": ext_degree_distribution,
        "ext_char_entropy": ext_char_entropy,
    }
)
EXT_ORACLES.update(
    {
        "ext_unpivot": EXT_UNPIVOT_SQL,
        "ext_shipping_priority": EXT_SHIPPING_PRIORITY_SQL,
        "ext_shipmode_priority_audit": EXT_SHIPMODE_SQL,
        "ext_degree_distribution": EXT_DEGREE_SQL,
        "ext_char_entropy": EXT_CHAR_ENTROPY_SQL,
    }
)


# --- round-2 wave 3: sketches + exact-k weighted sampling ---------------------------


def ext_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: build a 4x2048 CMS over corpus
    tokens, then point-estimate the 20 most frequent words against their
    exact counts (overestimate = CMS error, always >= 0).

    The sketch is a FIXED-SIZE (depth x width) mergeable summary — the
    100 TB telemetry primitive: build per shard/day, merge by count
    addition, estimate without rescanning. Hashing is portable md5
    arithmetic, so the DuckDB oracle reproduces the ESTIMATES bit-for-bit,
    not just the exact counts.

    Scale shape: token explode is the only corpus-sized stage; the sketch
    agg key space is depth*width; estimation broadcast-joins the tiny
    sketch."""
    from aircan_spark.ext import sketch as cms

    docs = _t(spark, sf_dir, "documents").select(
        F.lower(F.trim(F.col("text"))).alias("t")
    ).filter(F.length("t") > 0)
    words = docs.select(F.explode(F.split("t", r"\s+")).alias("w")).filter(
        F.col("w") != ""
    )
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), "w").limit(20)
    sk = cms.count_min_build(words, "w", depth=4, width=2048, seed=42)
    est = cms.count_min_estimate(sk, top, "w", depth=4, width=2048, seed=42)
    return (
        top.join(est, top["w"] == est["item"])
        .select(
            F.col("w").alias("word"),
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), "word")
    )


EXT_CMS_SQL = r"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
w2 AS (SELECT w FROM words WHERE w <> ''),
exact AS (SELECT w, COUNT(*) AS exact_count FROM w2 GROUP BY w),
top AS (SELECT w, exact_count FROM exact ORDER BY exact_count DESC, w LIMIT 20),
r AS (SELECT unnest(range(4)) AS rw),
sketch AS (
  SELECT rw,
         CAST(('0x' || SUBSTR(md5('42:' || CAST(rw AS VARCHAR) || '-' || w), 1, 8))::UBIGINT
              % 2048 AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM w2 CROSS JOIN r GROUP BY 1, 2
),
est AS (
  SELECT t.w, MIN(COALESCE(s.cnt, 0)) AS cms_estimate
  FROM top t CROSS JOIN r
  LEFT JOIN sketch s
    ON s.rw = r.rw
   AND s.bucket = CAST(('0x' || SUBSTR(md5('42:' || CAST(r.rw AS VARCHAR) || '-' || t.w), 1, 8))::UBIGINT
                       % 2048 AS BIGINT)
  GROUP BY t.w
)
SELECT t.w AS word, t.exact_count, e.cms_estimate,
       e.cms_estimate - t.exact_count AS overestimate
FROM top t JOIN est e ON t.w = e.w
ORDER BY t.exact_count DESC, word
"""


def ext_weighted_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sampling without replacement per language
    (Efraimidis–Spirakis A-ES over n_chars weights): the curation pass
    that draws a fixed-size quality-weighted subset per stratum.

    Deterministic (md5-derived uniforms, 12-decimal-rounded keys, id
    tie-break) — the DuckDB oracle replays the identical draw. Per-group
    top-k compiles to WindowGroupLimit."""
    from aircan_spark.ext.sampling import aes_weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        aes_weighted_sample(
            docs, "doc_id", F.col("n_chars"), k=5, group_col="lang", seed=42
        )
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


EXT_WEIGHTED_SAMPLE_K_SQL = r"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ROUND(POW(
           ('0x' || SUBSTR(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
             / 4294967296.0 + 1.0 / 4294967296.0,
           1.0 / n_chars), 12) AS k
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, n_chars FROM ranked WHERE rn <= 5 ORDER BY lang, doc_id
"""


EXT_QUERIES.update(
    {
        "ext_cms_heavy_hitters": ext_cms_heavy_hitters,
        "ext_weighted_sample_k": ext_weighted_sample_k,
    }
)
EXT_ORACLES.update(
    {
        "ext_cms_heavy_hitters": EXT_CMS_SQL,
        "ext_weighted_sample_k": EXT_WEIGHTED_SAMPLE_K_SQL,
    }
)


def ext_boilerplate_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection per source: the most common 3-token
    document HEAD and its share of the source's docs — crawl pipelines use
    exactly this to spot injected headers/navigation chrome before
    stripping (CCNet-style line dedup collapses to head dedup for
    single-line docs).

    Scale shape: the head is a row-local projection (split + slice — no
    explode); one (source, head) partial agg, then a WindowGroupLimit
    argmax per source; output O(sources)."""
    docs = _t(spark, sf_dir, "documents").select(
        "source", F.lower(F.trim(F.col("text"))).alias("t")
    ).filter(F.length("t") > 0)
    head = F.array_join(F.slice(F.split(F.col("t"), r"\s+"), 1, 3), " ")
    counts = (
        docs.select("source", head.alias("head"))
        .groupBy("source", "head")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = counts.groupBy("source").agg(F.sum("n_docs").alias("total"))
    w = Window.partitionBy("source").orderBy(F.col("n_docs").desc(), F.col("head"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            F.col("head").alias("top_head"),
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 6).alias("head_share"),
        )
        .orderBy("source")
    )


EXT_BOILERPLATE_SQL = r"""
WITH heads AS (
  SELECT source,
         array_to_string(list_slice(regexp_split_to_array(lower(trim(text)), '\s+'), 1, 3), ' ') AS head
  FROM documents WHERE length(trim(text)) > 0
),
counts AS (SELECT source, head, COUNT(*) AS n_docs FROM heads GROUP BY 1, 2),
totals AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS total FROM counts GROUP BY 1),
ranked AS (
  SELECT source, head, n_docs,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, head) AS rn
  FROM counts
)
SELECT r.source, r.head AS top_head, r.n_docs,
       ROUND(CAST(r.n_docs AS DOUBLE) / t.total, 6) AS head_share
FROM ranked r JOIN totals t ON r.source = t.source
WHERE r.rn = 1 ORDER BY r.source
"""


EXT_QUERIES.update({"ext_boilerplate_heads": ext_boilerplate_heads})
EXT_ORACLES.update({"ext_boilerplate_heads": EXT_BOILERPLATE_SQL})


def ext_cross_lang_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language duplicate audit: normalized fingerprints appearing
    in MORE THAN ONE language — the translation-leak / mislabeled-lang
    signal a multilingual curation pass checks before per-lang dedup
    (within-lang dedup would silently keep both copies).

    Scale shape: one fingerprint exchange (same md5 the exact-dedup op
    uses), HAVING on distinct langs; output rows only for offending
    fingerprints."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    )
    return (
        docs.groupBy("fp")
        .agg(
            F.countDistinct("lang").alias("n_langs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        )
        .filter(F.col("n_langs") > 1)
        .orderBy("fp")
    )


EXT_CROSS_LANG_SQL = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(*) AS n_docs,
       array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs
FROM documents
GROUP BY 1 HAVING COUNT(DISTINCT lang) > 1
ORDER BY fp
"""


def ext_strict_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered 3-step funnel (view -> click -> purchase): a user
    converts at step N only with an event strictly AFTER their step-N-1
    completion time (earliest-completion semantics) — the sequence-mining
    flavor the 2-step attribution funnel (X76) doesn't capture.

    Scale shape: three per-user aggregates chained by user_id equi-joins —
    each stage collapses to O(users) before the next join, so the fact
    table is scanned once per step type and never joined to itself
    row-to-row."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # single plan, single action: t3 ⊆ t2 ⊆ t1 by construction, so left
    # joins + conditional counts produce all three stage counts in one job
    merged = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    return merged.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("t2").alias("n_clicked_after"),
        F.count("t3").alias("n_purchased_after"),
        F.round(F.count("t2") / F.count(F.lit(1)), 6).alias("view_to_click"),
        F.round(F.count("t3") / F.count("t2"), 6).alias("click_to_purchase"),
    )


EXT_STRICT_FUNNEL_SQL = r"""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM t1) AS n_viewed,
       (SELECT COUNT(*) FROM t2) AS n_clicked_after,
       (SELECT COUNT(*) FROM t3) AS n_purchased_after,
       ROUND(CAST((SELECT COUNT(*) FROM t2) AS DOUBLE)
             / (SELECT COUNT(*) FROM t1), 6) AS view_to_click,
       ROUND(CAST((SELECT COUNT(*) FROM t3) AS DOUBLE)
             / (SELECT COUNT(*) FROM t2), 6) AS click_to_purchase
"""


EXT_QUERIES.update(
    {
        "ext_cross_lang_dupes": ext_cross_lang_dupes,
        "ext_strict_funnel": ext_strict_funnel,
    }
)
EXT_ORACLES.update(
    {
        "ext_cross_lang_dupes": EXT_CROSS_LANG_SQL,
        "ext_strict_funnel": EXT_STRICT_FUNNEL_SQL,
    }
)


def ext_sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: cell probe cuts candidates, PQ codes cut bytes — the
    production layout. Rows-only contract; recall + full-probe==plain-PQ
    equivalence tested in tests/test_ext.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    books = similarity.pq_train(emb, m=16, ksub=16, seed=42)
    return similarity.ivfpq_topk(emb, queries, books, k=5, nlist=16, nprobe=4, seed=42)


def ext_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential revenue increase from discount removal (TPC-H Q6 flavor):
    one scan, all three predicates pushed to parquet, single decimal agg —
    the minimal filter-aggregate every warehouse benchmarks first.

    Scale shape: no join, no wide agg; the scan's PushedFilters carry the
    date/discount/quantity range predicates, so row groups prune on
    statistics."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * F.col("l_discount").cast("decimal(18,6)")
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("revenue"),
        )
    )


EXT_REVENUE_FORECAST_SQL = r"""
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def ext_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with very large orders (TPC-H Q18 flavor): orders whose
    line quantity sum exceeds a threshold, joined back to customer detail.

    Scale shape: the HAVING collapses lineitem per orderkey FIRST (one
    exchange, partial-agged); only qualifying orderkeys — a tiny set —
    join orders/customer, so the expensive tables meet AFTER selection,
    broadcast where small."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


EXT_LARGE_ORDERS_SQL = r"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


EXT_QUERIES.update(
    {
        "ext_sim_topk_ivfpq": ext_sim_topk_ivfpq,
        "ext_revenue_forecast": ext_revenue_forecast,
        "ext_large_orders": ext_large_orders,
    }
)
EXT_ORACLES.update(
    {
        "ext_revenue_forecast": EXT_REVENUE_FORECAST_SQL,
        "ext_large_orders": EXT_LARGE_ORDERS_SQL,
    }
)


# --- round-3 wave: TPC-H flavors Q13/Q17/Q19/Q15/Q8 -------------------------------


def ext_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer distribution INCLUDING zero-order customers
    (TPC-H Q13 flavor): LEFT OUTER join so silent customers survive, then
    a two-level aggregation — per-customer counts (shuffle on custkey),
    then the tiny O(distinct counts) histogram.

    Scale shape: the first agg is the only real exchange; the second
    groups O(customers) rows down to O(max orders per customer) — no
    global window anywhere."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


EXT_ORDER_COUNT_DIST_SQL = r"""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def ext_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost to small-quantity orders for one brand
    (TPC-H Q17 flavor): the correlated subquery `l_quantity <
    0.2*AVG(l_quantity) per part` becomes a per-part aggregate joined
    back — both joins broadcast (parts of one brand are a sliver of the
    part table), so lineitem never shuffles.

    Determinism note: l_quantity is integral, so the per-part AVG (exact
    integer sum / count) and the 0.2x threshold are bit-identical across
    engines — the boundary filter cannot flip."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_li = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).drop("p_partkey")
    thresholds = brand_li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_cut")
    )
    return (
        brand_li.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly"),
        )
    )


EXT_SMALL_QTY_SQL = r"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
cuts AS (
  SELECT l_partkey, AVG(l_quantity) * 0.2 AS qty_cut
  FROM brand_li GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) / 7.0 AS DOUBLE)
         AS avg_yearly
FROM brand_li JOIN cuts USING (l_partkey)
WHERE l_quantity < qty_cut
"""


def ext_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR-of-ANDs predicate (TPC-H Q19 flavor): three
    brand/size/quantity bands OR-ed together. Catalyst keeps the whole
    disjunction as one post-join filter but pushes the common parts
    (quantity range, size lower bound) to the scans; the part side
    broadcasts."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.filter(band).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        )
        .cast("decimal(38,6)")
        .cast("double")
        .alias("revenue"),
    )


EXT_DISJUNCTIVE_SQL = r"""
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def ext_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue, ties kept (TPC-H
    Q15 flavor). The MAX is a broadcast SCALAR compared against the
    per-supplier aggregate — no global window over the supplier axis (the
    low-cardinality-window trap: O(suppliers) rows in one task at scale).
    Decimal revenue makes the equality comparison exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        )
        .cast("decimal(38,6)")
        .alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev["total_revenue"] == top["mx"])
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


EXT_TOP_SUPPLIER_SQL = r"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
              * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
           AS DECIMAL(38,6)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def ext_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of revenue from ASIA customers per order
    year (TPC-H Q8 flavor): lineitem joins orders (shuffle on orderkey),
    every dimension (customer->nation->region, supplier->nation)
    broadcasts; the share is a CASE-gated decimal numerator over the same
    aggregate — one exchange for the final (year) grouping."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")

    asia_cust = (
        cust.join(
            F.broadcast(
                nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
                .filter(F.col("r_name") == "ASIA")
                .select("n_nationkey")
            ),
            cust["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    sup_nation = sup.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        sup["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    vol = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(asia_cust), orders["o_custkey"] == asia_cust["c_custkey"])
        .join(F.broadcast(sup_nation), li["l_suppkey"] == sup_nation["s_suppkey"])
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0).cast("decimal(18,6)")))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("nation_volume"),
        F.sum("volume").cast("decimal(38,6)").cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    ).orderBy("o_year")


EXT_MARKET_SHARE_SQL = r"""
WITH asia_cust AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
joined AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS volume,
         n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN asia_cust ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS nation_volume,
       CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume,
       ROUND(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE), 6) AS mkt_share
FROM joined GROUP BY o_year ORDER BY o_year
"""


EXT_QUERIES.update(
    {
        "ext_order_count_distribution": ext_order_count_distribution,
        "ext_small_quantity_revenue": ext_small_quantity_revenue,
        "ext_disjunctive_revenue": ext_disjunctive_revenue,
        "ext_top_revenue_supplier": ext_top_revenue_supplier,
        "ext_market_share": ext_market_share,
    }
)
EXT_ORACLES.update(
    {
        "ext_order_count_distribution": EXT_ORDER_COUNT_DIST_SQL,
        "ext_small_quantity_revenue": EXT_SMALL_QTY_SQL,
        "ext_disjunctive_revenue": EXT_DISJUNCTIVE_SQL,
        "ext_top_revenue_supplier": EXT_TOP_SUPPLIER_SQL,
        "ext_market_share": EXT_MARKET_SHARE_SQL,
    }
)


# --- round-3 wave: corpus curation + event hygiene ops ----------------------------


def ext_strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping, oracle-checked end-to-end: each document is
    wrapped in deterministic HTML/markdown/entity chrome (tags, a md
    link, escaped entities), pushed through text.strip_markup, and the
    cleaned text must reduce back to the original words plus the anchor
    text — both engines replay the identical regex chain (no lookaround,
    RE2-safe patterns)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    marked = docs.select(
        "doc_id",
        F.concat(
            F.lit('<div class="post"><p>'),
            F.col("text"),
            F.lit('</p></div> [read more](http://example.com/x?q=1) &amp; <b>fin&#39;</b>'),
        ).alias("text"),
    )
    return (
        text.strip_markup(marked)
        .select("doc_id", F.md5(F.col("text_clean")).alias("clean_digest"))
        .orderBy("doc_id")
    )


EXT_STRIP_MARKUP_SQL = r"""
WITH marked AS (
  SELECT doc_id,
         '<div class="post"><p>' || text ||
         '</p></div> [read more](http://example.com/x?q=1) &amp; <b>fin&#39;</b>' AS t
  FROM documents
),
cleaned AS (
  SELECT doc_id,
         TRIM(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(t, '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
               '<[^>]*>', ' ', 'g'),
             '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),
             '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
           '\s+', ' ', 'g')) AS text_clean
  FROM marked
)
SELECT doc_id, md5(text_clean) AS clean_digest FROM cleaned ORDER BY doc_id
"""


def ext_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-line removal (CCNet/C4 curation), with planted
    duplicates: every synthetic document is (own text \n successor's
    text), so each line occurs in exactly two documents and only the
    first corpus occurrence survives. Checks the full pipeline — global
    first-occurrence choice (one exchange keyed by line), per-doc
    reconstruction order, drop accounting."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    succ = docs.select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    two = docs.join(
        succ, succ["bid"] == (F.col("doc_id") + 1) % F.lit(n_docs)
    ).select("doc_id", F.concat("text", F.lit("\n"), "btext").alias("text"))
    return (
        dedup.line_dedup(two)
        .select(
            "doc_id",
            F.md5("text_kept").alias("kept_digest"),
            "n_lines_kept",
            "n_lines_dropped",
        )
        .orderBy("doc_id")
    )


EXT_LINE_DEDUP_SQL = r"""
WITH two AS (
  SELECT a.doc_id, a.text || chr(10) || b.text AS text
  FROM documents a
  JOIN documents b ON b.doc_id = (a.doc_id + 1) % (SELECT COUNT(*) FROM documents)
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM two
),
firsts AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
),
kept AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_kept,
         COUNT(*) AS n_kept
  FROM firsts WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_tot FROM lines GROUP BY doc_id)
SELECT t.doc_id,
       md5(COALESCE(k.text_kept, '')) AS kept_digest,
       COALESCE(k.n_kept, 0) AS n_lines_kept,
       t.n_tot - COALESCE(k.n_kept, 0) AS n_lines_dropped
FROM tot t LEFT JOIN kept k USING (doc_id) ORDER BY doc_id
"""


def ext_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-storm suppression: drop events repeating the same (user,
    type) within 24h of the previous one, then count survivors per type.
    The lag window partitions on real keys; the summary agg is O(types)."""
    ev = _t(spark, sf_dir, "events")
    kept = features.debounce_events(ev, gap_seconds=86400)
    return (
        kept.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("event_type")
    )


EXT_DEBOUNCE_SQL = r"""
WITH lagged AS (
  SELECT event_type,
         epoch(ts) - epoch(LAG(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT event_type, COUNT(*) AS n_kept
FROM lagged WHERE gap IS NULL OR gap >= 86400
GROUP BY event_type ORDER BY event_type
"""


def ext_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list heads for every word in >= 50 documents: df plus the
    first 20 doc ids. The head is rank-capped (WindowGroupLimit) so no
    stop-word posting list ever materializes whole."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.inverted_index(docs, min_df=50, postings_cap=20)
        .orderBy("word")
    )


EXT_INVERTED_INDEX_SQL = r"""
WITH pairs AS (
  SELECT DISTINCT doc_id AS did,
         unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
  FROM documents
),
dfreq AS (SELECT word, COUNT(*) AS df FROM pairs WHERE word <> '' GROUP BY word),
ranked AS (
  SELECT word, did, ROW_NUMBER() OVER (PARTITION BY word ORDER BY did) AS rn
  FROM pairs WHERE word <> ''
),
heads AS (
  SELECT word, string_agg(CAST(did AS VARCHAR), ',' ORDER BY did) AS postings_head
  FROM ranked WHERE rn <= 20 GROUP BY word
)
SELECT d.word, d.df, h.postings_head
FROM dfreq d JOIN heads h USING (word)
WHERE d.df >= 50 ORDER BY d.word
"""


EXT_QUERIES.update(
    {
        "ext_strip_markup": ext_strip_markup,
        "ext_line_dedup": ext_line_dedup,
        "ext_debounce": ext_debounce,
        "ext_inverted_index": ext_inverted_index,
    }
)
EXT_ORACLES.update(
    {
        "ext_strip_markup": EXT_STRIP_MARKUP_SQL,
        "ext_line_dedup": EXT_LINE_DEDUP_SQL,
        "ext_debounce": EXT_DEBOUNCE_SQL,
        "ext_inverted_index": EXT_INVERTED_INDEX_SQL,
    }
)


# --- round-3 wave: sketch + join-pruning + linear-algebra infrastructure -----------


def ext_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix over the first 8 embedding dims, exact decimal path —
    the verification face of the one-pass covariance/PCA input
    (vectors.embedding_gram). The pandas-UDF Mᵀ M partial path is the
    scale twin (equivalence proven in tests/test_ext.py); this declared
    query uses the explode+decimal formulation precisely because binary
    floats have no decimal-scale-9 halfway cases, making the sum
    bit-identical across engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return vectors.embedding_gram(emb, dims=8, exact=True)


EXT_EMBEDDING_GRAM_SQL = r"""
WITH comp AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding[1:8], 1) - 1 AS INTEGER) AS i,
         CAST(unnest(embedding[1:8]) AS DOUBLE) AS val
  FROM embeddings
),
pairs AS (
  SELECT a.i AS i, b.i AS j,
         CAST(a.val AS DECIMAL(18,9)) * CAST(b.val AS DECIMAL(18,9)) AS prod
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
)
SELECT i, j, ROUND(CAST(CAST(SUM(prod) AS DECIMAL(38,18)) AS DOUBLE), 12) AS gram
FROM pairs GROUP BY i, j ORDER BY i, j
"""


def ext_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog registers over order keys (m=1024, md5-portable hash):
    the fixed-size distinct sketch whose registers any engine reproduces
    bit-for-bit (integer/string rho, no floating log). Merge law and
    estimate accuracy are property-tested; the estimate itself is driver
    math over these <= m rows."""
    orders = _t(spark, sf_dir, "orders")
    from aircan_spark.ext import sketch as cms

    return cms.hll_build(orders, "o_orderkey", b=10, seed=42).orderBy("reg")


EXT_HLL_SQL = r"""
WITH h AS (
  SELECT CAST(('0x' || SUBSTR(md5('42-' || CAST(o_orderkey AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS hv
  FROM orders
),
rho AS (
  SELECT hv % 1024 AS reg,
         CASE WHEN hv // 1024 = 0 THEN 51
              ELSE 51 - LENGTH(bin(hv // 1024)) END AS rho
  FROM h
)
SELECT reg, MAX(rho) AS max_rho FROM rho GROUP BY reg ORDER BY reg
"""


def ext_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join: lineitems of 1997 urgent orders. The
    bloom (64 KiB bitmap from the filtered order keys) pre-filters
    lineitem JVM-side BEFORE the join exchange; the exact LEFT SEMI join
    then removes false positives, so the result — and this oracle — is
    exactly the plain semi join. The sketch moves work off the shuffle;
    it never changes the answer."""
    from aircan_spark.ext import bloom

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    kept = bloom.bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return kept.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        )
        .cast("decimal(38,6)")
        .cast("double")
        .alias("revenue"),
    )


EXT_BLOOM_SEMI_SQL = r"""
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
            AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
)
"""


EXT_QUERIES.update(
    {
        "ext_embedding_gram": ext_embedding_gram,
        "ext_hll_registers": ext_hll_registers,
        "ext_bloom_semi_join": ext_bloom_semi_join,
    }
)
EXT_ORACLES.update(
    {
        "ext_embedding_gram": EXT_EMBEDDING_GRAM_SQL,
        "ext_hll_registers": EXT_HLL_SQL,
        "ext_bloom_semi_join": EXT_BLOOM_SEMI_SQL,
    }
)


# --- round-3 wave: CDC, quality gates, time series, layout -------------------------


def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two synthetic snapshots of orders: v2 deletes every
    97th key, rewrites the price of every 31st, inserts shifted copies of
    every 113rd. The diff must classify every key exactly and name the
    changed columns — one FULL OUTER exchange, both sides co-partitioned
    on the key."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 113 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    return (
        relational.snapshot_diff(orders, v2, keys=["o_orderkey"])
        .orderBy("o_orderkey")
    )


EXT_SNAPSHOT_DIFF_SQL = r"""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 31 = 0 THEN ROUND(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 113 = 0
),
j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.o_orderkey IS NOT NULL AS in_old,
         b.o_orderkey IS NOT NULL AS in_new,
         CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus THEN 'o_orderstatus' END AS c1,
         CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'o_totalprice' END AS c2,
         CASE WHEN a.o_orderpriority IS DISTINCT FROM b.o_orderpriority THEN 'o_orderpriority' END AS c3
  FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey)
),
classified AS (
  SELECT o_orderkey,
         CASE WHEN NOT in_old THEN 'insert'
              WHEN NOT in_new THEN 'delete'
              WHEN c1 IS NOT NULL OR c2 IS NOT NULL OR c3 IS NOT NULL THEN 'update'
         END AS change_type,
         array_to_string(list_sort(list_filter([c1, c2, c3], x -> x IS NOT NULL)), ',') AS chg
  FROM j
)
SELECT o_orderkey, change_type,
       CASE WHEN change_type = 'update' THEN chg END AS changed_cols
FROM classified WHERE change_type IS NOT NULL ORDER BY o_orderkey
"""


def ext_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan declarative quality gate over orders: null-rate, range,
    set-membership, cardinality and uniqueness checks evaluated as a
    single aggregate (partial-aggregable expressions only) — the
    ingest-time contract check at warehouse scale."""
    from aircan_spark.profile import expectations

    orders = _t(spark, sf_dir, "orders")
    checks = [
        {"id": "key_unique", "column": "o_orderkey", "kind": "unique"},
        {"id": "key_not_null", "column": "o_orderkey", "kind": "not_null_rate", "min": 1.0},
        {"id": "price_floor", "column": "o_totalprice", "kind": "min", "min": 0.0},
        {"id": "price_ceiling", "column": "o_totalprice", "kind": "max", "max": 1e7},
        {"id": "status_domain", "column": "o_orderstatus", "kind": "in_set_rate",
         "values": ["F", "O", "P"], "min": 1.0},
        {"id": "priority_card", "column": "o_orderpriority", "kind": "distinct_max", "max": 5},
    ]
    return expectations(orders, checks).orderBy("check_id")


EXT_EXPECTATIONS_SQL = r"""
WITH agg AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderkey) AS key_nd,
         SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS key_nn,
         CAST(MIN(o_totalprice) AS DOUBLE) AS price_min,
         CAST(MAX(o_totalprice) AS DOUBLE) AS price_max,
         SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) AS status_in,
         SUM(CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) AS status_nn,
         COUNT(DISTINCT o_orderpriority) AS prio_nd
  FROM orders
)
SELECT * FROM (
  SELECT 'key_unique' AS check_id, 'o_orderkey' AS "column", 'unique' AS kind,
         CAST(key_nd AS DOUBLE) AS observed, CAST(NULL AS DOUBLE) AS threshold,
         key_nd = key_nn AS passed FROM agg
  UNION ALL
  SELECT 'key_not_null', 'o_orderkey', 'not_null_rate',
         ROUND(CAST(key_nn AS DOUBLE) / n, 6), 1.0,
         ROUND(CAST(key_nn AS DOUBLE) / n, 6) >= 1.0 FROM agg
  UNION ALL
  SELECT 'price_floor', 'o_totalprice', 'min', price_min, 0.0, price_min >= 0.0 FROM agg
  UNION ALL
  SELECT 'price_ceiling', 'o_totalprice', 'max', price_max, 1e7, price_max <= 1e7 FROM agg
  UNION ALL
  SELECT 'status_domain', 'o_orderstatus', 'in_set_rate',
         ROUND(CAST(status_in AS DOUBLE) / GREATEST(status_nn, 1), 6), 1.0,
         ROUND(CAST(status_in AS DOUBLE) / GREATEST(status_nn, 1), 6) >= 1.0 FROM agg
  UNION ALL
  SELECT 'priority_card', 'o_orderpriority', 'distinct_max',
         CAST(prio_nd AS DOUBLE), 5.0, prio_nd <= 5 FROM agg
) ORDER BY check_id
"""


def ext_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per user over purchase values: argmin/argmax via
    MIN/MAX over (ts, id, value) structs — one partial-aggregable pass,
    no window, one (user, day) exchange."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bars = features.ohlc_resample(ev)
    return bars.select(
        "user_id",
        F.col("bucket").cast("date").alias("day"),
        F.round("open", 2).alias("open"),
        F.round("high", 2).alias("high"),
        F.round("low", 2).alias("low"),
        F.round("close", 2).alias("close"),
        "n",
    ).orderBy("user_id", "day")


EXT_OHLC_SQL = r"""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
ranked AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM p
)
SELECT user_id, day,
       ROUND(MAX(CASE WHEN rn_first = 1 THEN value END), 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(MAX(CASE WHEN rn_last = 1 THEN value END), 2) AS close,
       COUNT(*) AS n
FROM ranked GROUP BY user_id, day ORDER BY user_id, day
"""


def ext_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the EARLIEST purchase by the same user at or after
    the click (forward as-of join) — the other merge_asof direction,
    same one-shuffle union-window plan with the frame reversed."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = relational.asof_join(
        clicks, purchases, on="user_id", right_cols=["event_id", "value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("purchase_event_id"),
        F.round("value_right", 2).alias("purchase_value"),
    ).orderBy("event_id")


EXT_ASOF_FORWARD_SQL = r"""
SELECT c.event_id, c.user_id,
       p.event_id AS purchase_event_id,
       ROUND(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
"""


def ext_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering keys over (user_id, hour-of-stream) —
    the multi-dimensional layout primitive (OPTIMIZE ZORDER): pure
    integer bit-interleave, bit-replicable in SQL; cluster_by_zorder
    range-partitions on this key so every output file covers a compact
    (user, time) rectangle. The query checks the key math row-for-row."""
    ev = _t(spark, sf_dir, "events")
    hours = F.floor(
        (F.unix_timestamp("ts") - F.lit(1704067200)) / 3600
    ).cast("long")  # hours since 2024-01-01 (data epoch), non-negative
    keyed = ev.select(
        "event_id",
        F.col("user_id").cast("long").alias("u"),
        hours.alias("h"),
    )
    zkey = relational.zorder_key(["u", "h"], bits=16)
    return keyed.select("event_id", zkey.alias("zkey")).orderBy("event_id")


EXT_ZORDER_SQL = r"""
WITH base AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS u,
         CAST(FLOOR((epoch(ts) - 1704067200) / 3600) AS BIGINT) AS h
  FROM events
),
bits AS (
  SELECT event_id, u, h, gb.b AS b FROM base, generate_series(0, 15) gb(b)
),
terms AS (
  SELECT event_id,
         ((u // (1 << b)) % 2) * (1 << (2 * b))
           + ((h // (1 << b)) % 2) * (1 << (2 * b + 1)) AS term
  FROM bits
)
SELECT event_id, CAST(SUM(term) AS BIGINT) AS zkey
FROM terms GROUP BY event_id ORDER BY event_id
"""


EXT_QUERIES.update(
    {
        "ext_snapshot_diff": ext_snapshot_diff,
        "ext_expectations": ext_expectations,
        "ext_ohlc": ext_ohlc,
        "ext_asof_forward": ext_asof_forward,
        "ext_zorder_keys": ext_zorder_keys,
    }
)
EXT_ORACLES.update(
    {
        "ext_snapshot_diff": EXT_SNAPSHOT_DIFF_SQL,
        "ext_expectations": EXT_EXPECTATIONS_SQL,
        "ext_ohlc": EXT_OHLC_SQL,
        "ext_asof_forward": EXT_ASOF_FORWARD_SQL,
        "ext_zorder_keys": EXT_ZORDER_SQL,
    }
)


def ext_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal split of the event stream: train < cutoff,
    2-day embargo, test after — per-split counts. Row-local predicate,
    O(3) output."""
    ev = _t(spark, sf_dir, "events")
    return (
        sampling.temporal_split(ev, "ts", "2024-01-20", embargo="2 days")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("split")
    )


EXT_TEMPORAL_SPLIT_SQL = r"""
SELECT CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
            WHEN ts >= TIMESTAMP '2024-01-20' + INTERVAL 2 DAY THEN 'test'
            ELSE 'embargo' END AS split,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY split
"""


def ext_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: per-doc mean NLL under a
    corpus-trained add-one unigram model (top-50 vocab, deterministic
    tie-break). Tokens exchange once for counting; scoring is a broadcast
    vocab join — documents never shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return text.unigram_nll(docs, vocab_size=50).orderBy("doc_id")


EXT_UNIGRAM_NLL_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE w <> ''),
counts AS (SELECT w, COUNT(*) AS cnt FROM toks2 GROUP BY w),
vocab AS (
  SELECT w, cnt FROM (
    SELECT w, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS r FROM counts
  ) WHERE r <= 50
),
scalars AS (
  SELECT (SELECT COUNT(*) FROM toks2) AS n_tokens,
         (SELECT COUNT(*) FROM vocab) AS v_size
),
scored AS (
  SELECT t.doc_id,
         -LN(CAST(COALESCE(v.cnt, 0) + 1 AS DOUBLE)
             / CAST(s.n_tokens + s.v_size + 1 AS DOUBLE)) AS nll
  FROM toks2 t LEFT JOIN vocab v USING (w) CROSS JOIN scalars s
)
SELECT doc_id, ROUND(AVG(nll), 6) AS mean_nll, COUNT(*) AS n_tokens_doc
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


EXT_QUERIES.update(
    {
        "ext_temporal_split": ext_temporal_split,
        "ext_unigram_nll": ext_unigram_nll,
    }
)
EXT_ORACLES.update(
    {
        "ext_temporal_split": EXT_TEMPORAL_SPLIT_SQL,
        "ext_unigram_nll": EXT_UNIGRAM_NLL_SQL,
    }
)


def ext_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by PMI (min count 5): phrase mining over
    the corpus — two count exchanges, broadcast joins, k-bounded head.
    PMI rounded before ranking (rank order immune to float ulp)."""
    docs = _t(spark, sf_dir, "documents")
    return text.pmi_collocations(docs, min_count=5, k=50)


EXT_PMI_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS ws FROM documents
),
toks AS (
  SELECT unnest(ws) AS w FROM words
),
toks2 AS (SELECT * FROM toks WHERE w <> ''),
uni AS (SELECT w, COUNT(*) AS cw FROM toks2 GROUP BY w),
n_tok AS (SELECT COUNT(*) AS n FROM toks2),
pairs AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS gram
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
  WHERE len(ws) >= 2
),
big AS (SELECT gram, COUNT(*) AS cab FROM pairs GROUP BY gram HAVING COUNT(*) >= 5),
n_big AS (SELECT COUNT(*) AS b FROM pairs),
scored AS (
  SELECT g.gram, g.cab,
         ROUND(LN((CAST(g.cab AS DOUBLE) / b.b)
                  / ((CAST(u1.cw AS DOUBLE) / t.n) * (CAST(u2.cw AS DOUBLE) / t.n))), 6) AS pmi
  FROM big g
  JOIN uni u1 ON u1.w = string_split(g.gram, ' ')[1]
  JOIN uni u2 ON u2.w = string_split(g.gram, ' ')[2]
  CROSS JOIN n_tok t CROSS JOIN n_big b
)
SELECT gram, cab, pmi FROM scored ORDER BY pmi DESC, gram LIMIT 50
"""


EXT_QUERIES.update({"ext_pmi_collocations": ext_pmi_collocations})
EXT_ORACLES.update({"ext_pmi_collocations": EXT_PMI_SQL})


def ext_dedup_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dedup-group semantics as ext_dedup_groups, computed with the
    large-star/small-star algorithm (O(log² n) rounds — the deep-graph
    escalation hash-min cannot handle past its round budget). Shares the
    recursive-CTE oracle with the hash-min query: two different iterative
    algorithms, one declarative ground truth."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    comp = dedup.connected_components_star(pairs)
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .withColumn("is_representative", F.col("doc_id") == F.col("component"))
        .orderBy("doc_id")
    )


EXT_QUERIES.update({"ext_dedup_groups_star": ext_dedup_groups_star})
EXT_ORACLES.update({"ext_dedup_groups_star": EXT_DEDUP_GROUPS_SQL})


def ext_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a bottom-k (KMV) uniform sample: 2000
    hash-least lineitem rows stand in for the full table; percentiles of
    l_extendedprice computed over the sample only. The selection is
    deterministic md5 order (TakeOrderedAndProject — no global sort), so
    the oracle replays the exact same sample; estimate-vs-exact error is
    property-tested separately."""
    from aircan_spark.ext import sketch as sk

    li = _t(spark, sf_dir, "lineitem")
    sample = sk.bottomk_sample(li, ["l_orderkey", "l_linenumber"], k=2000)
    return sample.agg(
        F.count(F.lit(1)).alias("k"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
    )


EXT_SKETCH_QUANTILES_SQL = r"""
WITH sample AS (
  SELECT l_extendedprice
  FROM lineitem
  ORDER BY md5('42-' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
  LIMIT 2000
)
SELECT COUNT(*) AS k,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
FROM sample
"""


def ext_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence graph from user behavior (the collaborative-
    filtering support build): per user the distinct set of engaged items
    (events.props.k), all within-user item pairs, edges weighted by user
    count. Per-user fan-out is bounded by items-per-user (the classic
    guard: the self-join is keyed on user, never item)."""
    ev = _t(spark, sf_dir, "events")
    items = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = items.select("user_id", F.col("item").alias("item_a"))
    b = items.select("user_id", F.col("item").alias("item_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= 20)
        .orderBy(F.col("n_users").desc(), "item_a", "item_b")
    )


EXT_COOCCURRENCE_SQL = r"""
WITH items AS (
  SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
)
SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_users
FROM items a JOIN items b ON a.user_id = b.user_id AND a.item < b.item
GROUP BY 1, 2 HAVING COUNT(*) >= 20
ORDER BY n_users DESC, item_a, item_b
"""


EXT_QUERIES.update(
    {
        "ext_sketch_quantiles": ext_sketch_quantiles,
        "ext_cooccurrence": ext_cooccurrence,
    }
)
EXT_ORACLES.update(
    {
        "ext_sketch_quantiles": EXT_SKETCH_QUANTILES_SQL,
        "ext_cooccurrence": EXT_COOCCURRENCE_SQL,
    }
)


# --- round-3 wave: graph analytics over the co-occurrence graph --------------------


def _cooc_edges(spark: SparkSession, sf_dir: str, min_users: int = 40) -> DataFrame:
    """Item co-occurrence edges (threshold ``min_users``) — the shared base
    graph for the graph-analytics queries."""
    ev = _t(spark, sf_dir, "events")
    items = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = items.select("user_id", F.col("item").alias("src"))
    b = items.select("user_id", F.col("item").alias("dst"))
    return (
        a.join(b, "user_id")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= min_users)
        .select("src", "dst")
    )


_COOC_EDGES_SQL = r"""
items AS (
  SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
),
edges AS (
  SELECT a.item AS u, b.item AS v
  FROM items a JOIN items b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 40
),
sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges)
"""


def ext_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the co-occurrence graph: wedge enumeration from
    each triangle's minimum vertex + one closing equi-join — every
    triangle counted exactly once, no neighborhood cross products."""
    from aircan_spark.ext import graph

    return graph.triangle_count(_cooc_edges(spark, sf_dir))


EXT_TRIANGLES_SQL = (
    "WITH " + _COOC_EDGES_SQL + r"""
SELECT COUNT(*) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
"""
)


def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 power iterations, d=0.85) on the undirected
    co-occurrence graph. Fixed iteration count makes the recurrence
    deterministic; the oracle unrolls the exact same 10 steps as chained
    CTEs — an iterative Spark loop checked value-for-value against
    declarative SQL."""
    from aircan_spark.ext import graph

    ranks = graph.pagerank(_cooc_edges(spark, sf_dir), iters=10)
    return ranks.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def _pagerank_unrolled_sql(iters: int = 10, damping: float = 0.85) -> str:
    prev = "r0"
    ctes = [
        "deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u)",
        "nn AS (SELECT COUNT(*) AS c FROM deg)",
        "r0 AS (SELECT u AS id, 1.0 / (SELECT c FROM nn) AS rank FROM deg)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS (SELECT d.u AS id, (1 - {damping}) / (SELECT c FROM nn) "
            f"+ {damping} * COALESCE(s.inflow, 0) AS rank "
            f"FROM deg d LEFT JOIN (SELECT sym.v AS id, SUM(r.rank / dg.deg) AS inflow "
            f"FROM sym JOIN {prev} r ON sym.u = r.id JOIN deg dg ON sym.u = dg.u "
            f"GROUP BY sym.v) s ON d.u = s.id)"
        )
        prev = f"r{i}"
    return (
        "WITH "
        + _COOC_EDGES_SQL.strip().rstrip()
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 6) AS rank FROM {prev} ORDER BY id"
    )


EXT_PAGERANK_SQL = _pagerank_unrolled_sql()


def ext_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from item 0 over the co-occurrence graph —
    frontier expansion with anti-join dedup, one round per level, checked
    against the recursive-CTE shortest-hop oracle."""
    from aircan_spark.ext import graph

    depths = graph.bfs_depths(_cooc_edges(spark, sf_dir), source=0)
    return depths.orderBy("id")


EXT_BFS_SQL = (
    "WITH RECURSIVE " + _COOC_EDGES_SQL.strip() + r""",
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT sym.v, r.depth + 1 FROM sym JOIN reach r ON sym.u = r.id
  WHERE r.depth < 30
)
SELECT id, CAST(MIN(depth) AS INTEGER) AS depth FROM reach GROUP BY id ORDER BY id
"""
)


EXT_QUERIES.update(
    {
        "ext_triangles": ext_triangles,
        "ext_pagerank": ext_pagerank,
        "ext_bfs": ext_bfs,
    }
)
EXT_ORACLES.update(
    {
        "ext_triangles": EXT_TRIANGLES_SQL,
        "ext_pagerank": EXT_PAGERANK_SQL,
        "ext_bfs": EXT_BFS_SQL,
    }
)


def ext_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (|A∩B|/|A| >= 0.5) with a planted
    contained document: doc -1 is the first half of doc 0's shingles, so
    (-1 -> 0) must clear the threshold even though symmetric Jaccard
    would not. Same inverted-index join shape as the Jaccard operator.

    Runs GUARDED (max_doc_freq=10): shingles appearing in more than 10
    documents are pruned before the candidate join, bounding per-key
    fan-in regardless of corpus hot spots, and containment is scored
    over the surviving discriminative shingle universe (see
    ``dedup.containment_pairs``). The guard is ACTIVE at sf0.01+
    (shingle df reaches 7 at sf0.01, 25 at sf0.1 — 2.7x fewer candidate
    rows at sf0.1), so the benched plan is the 100-TB plan. The planted
    pair scores exactly 1.0 under any cap because every discriminative
    shingle of doc -1 is by construction in doc 0."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.trim(F.col("text")), r"\s+")
    half = docs.filter(F.col("doc_id") == 0).select(
        F.lit(-1).cast("long").alias("doc_id"),
        F.array_join(F.slice(words, 1, F.floor(F.size(words) / 2).cast("int")), " ").alias("text"),
    )
    return dedup.containment_pairs(
        docs.unionByName(half), threshold=0.5, max_doc_freq=10
    )


EXT_CONTAINMENT_SQL = r"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT CAST(-1 AS BIGINT),
         array_to_string(
           (string_split_regex(TRIM(text), '\s+'))[1 :
             CAST(len(string_split_regex(TRIM(text), '\s+')) // 2 AS BIGINT)], ' ')
  FROM documents WHERE doc_id = 0
),
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM base
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
short_docs AS (
  SELECT doc_id, array_to_string(string_split_regex(TRIM(text), '\s+'), ' ') AS whole
  FROM base
  WHERE len(string_split_regex(TRIM(text), '\s+')) < 3
),
sh_all AS (
  SELECT doc_id, shingle FROM sh
  UNION
  SELECT doc_id, whole FROM short_docs
),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh_all GROUP BY 1),
joinable AS (
  SELECT s.doc_id, s.shingle
  FROM sh_all s JOIN dfreq d ON s.shingle = d.shingle
  WHERE d.df <= 10
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM joinable GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM joinable x JOIN joinable y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS containment
FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) >= 0.5
ORDER BY id_a, id_b
"""


def ext_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation telemetry: per source, exact-duplicate rate (1 - distinct
    normalized contents / docs) — the per-feed health metric a corpus
    pipeline tracks per crawl. One groupBy on (source, content hash),
    one tiny rollup."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).cast("binary"))
    per = (
        docs.withColumn("__h", h)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("__h").alias("n_unique"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_unique",
        F.round(
            F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_rate"),
    ).orderBy("source")


EXT_DUP_RATE_SQL = r"""
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))) AS n_unique,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


def ext_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew advisor for a prospective join/agg key: top-10
    heaviest keys with their share of all rows plus p50/p99 key sizes —
    the numbers that decide salting/AQE-skew-join before a 100 TB
    shuffle. Two partial-agged exchanges (key counts, then O(keys)
    stats), k-bounded head."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(
        F.sum("n").alias("total"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.99)").alias("p99"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("l_suppkey").alias("key"),
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("p50"), 2).alias("x_median"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(10)
    )


EXT_SKEW_AUDIT_SQL = r"""
WITH counts AS (
  SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1
),
tot AS (
  SELECT SUM(n) AS total, quantile_cont(n, 0.5) AS p50 FROM counts
)
SELECT key, n,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
       ROUND(CAST(n AS DOUBLE) / p50, 2) AS x_median
FROM counts CROSS JOIN tot
ORDER BY n DESC, key LIMIT 10
"""


EXT_QUERIES.update(
    {
        "ext_containment_pairs": ext_containment_pairs,
        "ext_dup_rate_by_source": ext_dup_rate_by_source,
        "ext_skew_audit": ext_skew_audit,
    }
)
EXT_ORACLES.update(
    {
        "ext_containment_pairs": EXT_CONTAINMENT_SQL,
        "ext_dup_rate_by_source": EXT_DUP_RATE_SQL,
        "ext_skew_audit": EXT_SKEW_AUDIT_SQL,
    }
)


# --- round-3 wave: completing the 22 TPC-H query shapes -----------------------


def ext_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 flavor): for finished
    ('F') orders involving more than one supplier, find the supplier who
    was the ONLY one to ship late (> 90 days after the order date) and
    count such orders per supplier; top-25.

    Scale shape: Q21's EXISTS / NOT-EXISTS pair is collapsed into ONE
    per-order aggregation (distinct suppliers vs distinct late
    suppliers) — the scalable rewrite. lineitem is scanned and joined
    ONCE: the tagged frame collapses to (order, supplier, any_late)
    first, the per-order summary aggregates that already-collapsed
    frame, and the culprit filter joins the two on the SAME orderkey
    partitioning (no second fact-table scan — a naive two-branch reuse
    of the tagged frame would rescan lineitem). Supplier detail
    attaches by broadcast; the head is a k-bounded
    TakeOrderedAndProject, never a global sort.
    """
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    tagged = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .alias("late"),
    )
    per_os = tagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("nl"),
    )
    culprit = per_os.filter(F.col("late")).join(
        per_order.filter((F.col("ns") > 1) & (F.col("nl") == 1)),
        "l_orderkey",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        culprit.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_waiting_orders"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_waiting_orders")
        .orderBy(F.col("n_waiting_orders").desc(), "s_suppkey")
        .limit(25)
    )


EXT_WAITING_SUPPLIERS_SQL = r"""
WITH tagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS ns,
         COUNT(DISTINCT l_suppkey) FILTER (late) AS nl
  FROM tagged GROUP BY 1
),
culprit AS (
  SELECT DISTINCT t.l_orderkey, t.l_suppkey
  FROM tagged t JOIN per_order p ON t.l_orderkey = p.l_orderkey
  WHERE t.late AND p.ns > 1 AND p.nl = 1
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_waiting_orders
FROM culprit c JOIN supplier s ON c.l_suppkey = s.s_suppkey
GROUP BY 1, 2
ORDER BY n_waiting_orders DESC, s_suppkey LIMIT 25
"""


def ext_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-share suppliers of promoted parts (TPC-H Q20 flavor):
    among 'small%'-named parts, suppliers whose 1996 shipped volume of a
    part exceeds 1.5x the fair per-supplier share of that part's total —
    Q20's correlated availqty > 0.5*SUM(l_quantity) threshold re-expressed
    against the tables this corpus carries (no partsupp table).

    Scale shape: the name-prefix part filter is scan-pushed and the
    filtered key set broadcasts into lineitem (part side shrinks ~20x
    before the join, the fact table never shuffles for it); volumes
    aggregate per (part, supplier) in one exchange; per-part totals are a
    second agg over the ALREADY-collapsed O(parts x suppliers-in-window)
    frame, joined back on the same part key. The correlated threshold is
    a column compare, never a per-row subquery.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    totals = agg.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("q").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    excess = agg.join(
        totals, agg["l_partkey"] == totals["t_partkey"]
    ).filter(
        (F.col("ns") > 1)
        & (
            F.col("q").cast("double")
            > 1.5 * F.col("tq").cast("double") / F.col("ns")
        )
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        excess.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_excess_parts"),
            F.sum("q").alias("excess_qty_dec"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "n_excess_parts",
            F.col("excess_qty_dec").cast("double").alias("excess_qty"),
        )
        .orderBy("s_suppkey")
    )


EXT_EXCESS_SHARE_SQL = r"""
WITH flt AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
agg AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS q
  FROM lineitem JOIN flt ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, CAST(SUM(q) AS DECIMAL(38,2)) AS tq,
         CAST(COUNT(*) AS BIGINT) AS ns
  FROM agg GROUP BY 1
),
excess AS (
  SELECT a.l_suppkey, a.q
  FROM agg a JOIN tot t ON a.l_partkey = t.l_partkey
  WHERE t.ns > 1 AND CAST(a.q AS DOUBLE) > 1.5 * CAST(t.tq AS DOUBLE) / t.ns
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_excess_parts,
       CAST(SUM(e.q) AS DOUBLE) AS excess_qty
FROM excess e
JOIN supplier s ON e.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2, 3
ORDER BY s_suppkey
"""


EXT_QUERIES.update(
    {
        "ext_waiting_suppliers": ext_waiting_suppliers,
        "ext_excess_share_suppliers": ext_excess_share_suppliers,
    }
)
EXT_ORACLES.update(
    {
        "ext_waiting_suppliers": EXT_WAITING_SUPPLIERS_SQL,
        "ext_excess_share_suppliers": EXT_EXCESS_SHARE_SQL,
    }
)


# --- round-3 wave: distribution drift, robust stats, shard planning -----------


def ext_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust scaling of event values: (value - median) / IQR —
    the outlier-immune sibling of z-score standardization (X51).

    Scale shape: one exchange for the O(groups) exact quantile bounds,
    broadcast back; the event rows never shuffle (see
    features.robust_scale docstring for the 100 TB approx_percentile
    swap)."""
    ev = _t(spark, sf_dir, "events")
    return (
        features.robust_scale(ev, ["event_type"], "value")
        .select("event_id", "event_type", "value", "robust_z")
        .orderBy("event_id")
    )


EXT_ROBUST_SCALE_SQL = r"""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.5)  AS med,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN q.q3 - q.q1 > 0
            THEN ROUND((e.value - q.med) / (q.q3 - q.q1), 6) END AS robust_z
FROM events e JOIN q USING (event_type)
ORDER BY event_id
"""


_PSI_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]  # 8 bins


def _psi_bin(col):
    expr = None
    for i, e in enumerate(_PSI_EDGES):
        cond = col < e
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return expr.otherwise(len(_PSI_EDGES))


def ext_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first half
    of the month (reference) and the second (current) — THE
    feature-drift gate a training pipeline runs before every refresh
    (PSI < 0.1 stable, > 0.25 action).

    Scale shape: row-local fixed-edge binning (scan-fused, no
    data-dependent bucketing), one (type x 8-bin) partial-agged
    exchange, the full grid materialized by an O(types x bins) explode
    so empty bins still contribute their smoothed term, broadcast
    per-type totals. Laplace 0.5 smoothing keeps ln() finite and is
    mirrored exactly in the oracle."""
    cutoff = F.lit("2024-01-16").cast("timestamp")
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        _psi_bin(F.col("value")).alias("bin"),
        (F.col("ts") < cutoff).alias("is_ref"),
    )
    cells = ev.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("cur_n"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
    )
    n_bins = len(_PSI_EDGES) + 1
    grid = totals.select(
        "event_type", "ref_t", "cur_t",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    full = grid.join(cells, ["event_type", "bin"], "left").select(
        "event_type", "ref_t", "cur_t", "bin",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    p_ref = (F.col("ref_n") + 0.5) / (F.col("ref_t") + 0.5 * n_bins)
    p_cur = (F.col("cur_n") + 0.5) / (F.col("cur_t") + 0.5 * n_bins)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        full.withColumn("__term", term)
        .groupBy("event_type")
        .agg(
            F.max("ref_t").alias("n_ref"),
            F.max("cur_t").alias("n_cur"),
            F.round(F.sum("__term"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


EXT_PSI_DRIFT_SQL = r"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN value < 5 THEN 0 WHEN value < 10 THEN 1
              WHEN value < 20 THEN 2 WHEN value < 40 THEN 3
              WHEN value < 80 THEN 4 WHEN value < 160 THEN 5
              WHEN value < 320 THEN 6 ELSE 7 END AS bin,
         ts < TIMESTAMP '2024-01-16' AS is_ref
  FROM events
),
cells AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
  FROM ev GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(SUM(ref_n) AS BIGINT) AS ref_t,
         CAST(SUM(cur_n) AS BIGINT) AS cur_t
  FROM cells GROUP BY 1
),
grid AS (
  SELECT t.event_type, t.ref_t, t.cur_t, g.bin
  FROM totals t CROSS JOIN (SELECT UNNEST(range(8)) AS bin) g
),
full_grid AS (
  SELECT g.event_type, g.ref_t, g.cur_t, g.bin,
         COALESCE(c.ref_n, 0) AS ref_n, COALESCE(c.cur_n, 0) AS cur_n
  FROM grid g LEFT JOIN cells c
    ON g.event_type = c.event_type AND g.bin = c.bin
)
SELECT event_type, MAX(ref_t) AS n_ref, MAX(cur_t) AS n_cur,
       ROUND(SUM(
         ((cur_n + 0.5) / (cur_t + 4.0) - (ref_n + 0.5) / (ref_t + 4.0))
         * LN(((cur_n + 0.5) / (cur_t + 4.0)) / ((ref_n + 0.5) / (ref_t + 4.0)))
       ), 6) AS psi
FROM full_grid GROUP BY event_type ORDER BY event_type
"""


def ext_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the 'click' and
    'purchase' value distributions, computed on a fixed unit grid
    (bucket = ceil(value)) — the distribution-shift test a pipeline runs
    between data sources or time windows.

    Scale shape: exact KS needs a global sort of both samples; on the
    fixed grid it collapses to one O(grid) partial-agged exchange + a
    running sum over the ~500-bucket axis (a window over the GRID, never
    over data rows — same O(days)-axis pattern as the moving average).
    Grid resolution bounds the KS error at max|F'-F| <= max bucket mass.
    """
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.ceil("value").cast("long").alias("bucket"),
            (F.col("event_type") == "click").alias("is_a"),
        )
    )
    cells = ev.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
    )
    totals = cells.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = cells.crossJoin(F.broadcast(totals)).select(
        "ta",
        "tb",
        (F.sum("na").over(w).cast("double") / F.col("ta")).alias("fa"),
        (F.sum("nb").over(w).cast("double") / F.col("tb")).alias("fb"),
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat"),
        F.max("ta").alias("n_a"),
        F.max("tb").alias("n_b"),
    )


EXT_KS_DRIFT_SQL = r"""
WITH ev AS (
  SELECT CAST(CEIL(value) AS BIGINT) AS bucket,
         event_type = 'click' AS is_a
  FROM events WHERE event_type IN ('click', 'purchase')
),
cells AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
  FROM ev GROUP BY 1
),
tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM cells),
cdf AS (
  SELECT ta, tb,
         CAST(SUM(na) OVER (ORDER BY bucket) AS DOUBLE) / ta AS fa,
         CAST(SUM(nb) OVER (ORDER BY bucket) AS DOUBLE) / tb AS fb
  FROM cells CROSS JOIN tot
)
SELECT ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat,
       MAX(ta) AS n_a, MAX(tb) AS n_b
FROM cdf
"""


def ext_dist_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moment sketch per event type: count and exact integer
    power sums (Sx..Sx4 over value scaled to cents) folded into mean /
    stddev / skewness / excess kurtosis — the algebraic
    partial-aggregable form (every sum map-side combines; two sketches
    merge by adding sums, which is how a 1000-executor rollup or a
    streaming maintenance job would keep it).

    Exactness: values carry 2 decimals, so cents are EXACT integers;
    sums stay in decimal(38,0) (iv^4 <= 5.8e18 fits a long per-term) —
    both engines produce bit-identical sums, and the double conversion
    happens once at the end. A naive SUM(pow(value, k)) of doubles
    would diverge in the last ulp with partial-agg order."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    iv = F.col("iv")
    # powers multiply in DECIMAL: iv^4 exceeds long range once values pass
    # ~548.00 (56021^4 > 2^63) — ANSI mode would throw at the larger SFs
    ivd = iv.cast("decimal(19,0)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(iv.cast("decimal(38,0)")).alias("s1"),
        F.sum((ivd * ivd).cast("decimal(38,0)")).alias("s2"),
        F.sum((ivd * ivd * ivd).cast("decimal(38,0)")).alias("s3"),
        F.sum((ivd * ivd * ivd * ivd).cast("decimal(38,0)")).alias("s4"),
    )
    n = F.col("n").cast("double")
    # raw moments of the cent-scaled variable, then de-scale by 100^k
    m1 = F.col("s1").cast("double") / n / 1e2
    m2 = F.col("s2").cast("double") / n / 1e4
    m3 = F.col("s3").cast("double") / n / 1e6
    m4 = F.col("s4").cast("double") / n / 1e8
    c2 = m2 - m1 * m1
    c3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    c4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
    return agg.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(F.sqrt(c2), 6).alias("stddev_pop"),
        F.round(c3 / F.pow(c2, 1.5), 6).alias("skewness"),
        F.round(c4 / (c2 * c2) - 3.0, 6).alias("kurtosis_excess"),
    ).orderBy("event_type")


EXT_DIST_MOMENTS_SQL = r"""
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS iv FROM events
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(iv AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(iv AS HUGEINT) * iv) AS DECIMAL(38,0)) AS s2,
         CAST(SUM(CAST(iv AS HUGEINT) * iv * iv) AS DECIMAL(38,0)) AS s3,
         CAST(SUM(CAST(iv AS HUGEINT) * iv * iv * iv) AS DECIMAL(38,0)) AS s4
  FROM ev GROUP BY 1
),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n / 1e2 AS m1,
         CAST(s2 AS DOUBLE) / n / 1e4 AS m2,
         CAST(s3 AS DOUBLE) / n / 1e6 AS m3,
         CAST(s4 AS DOUBLE) / n / 1e8 AS m4
  FROM agg
)
SELECT event_type, n,
       ROUND(m1, 6) AS mean,
       ROUND(SQRT(m2 - m1*m1), 6) AS stddev_pop,
       ROUND((m3 - 3*m1*m2 + 2*m1*m1*m1) / POW(m2 - m1*m1, 1.5), 6) AS skewness,
       ROUND((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*m1*m1*m1*m1)
             / ((m2 - m1*m1) * (m2 - m1*m1)) - 3.0, 6) AS kurtosis_excess
FROM m ORDER BY event_type
"""


def ext_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard planner: deterministic hash assignment of documents
    to 16 shards plus the per-shard manifest (docs, whitespace tokens,
    utf-8 bytes) a distributed training job reads to schedule epochs.

    Scale shape: the shard id is a row-local portable md5 bucket (zero
    shuffle to assign, stable under appends/subsetting like the
    train/val split); the manifest is one 16-group partial-agged
    exchange. Byte/token accounting is scan-fused."""
    from aircan_spark.ext.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select(
            F.pmod(hash_bucket(F.col("doc_id"), seed=7), F.lit(16)).alias("shard"),
            toks.alias("__t"),
            F.octet_length("text").alias("__b"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__b").alias("n_bytes"),
        )
        .orderBy("shard")
    )


EXT_SHARD_MANIFEST_SQL = r"""
WITH b AS (
  SELECT (('0x' || SUBSTR(md5('7-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          % 10000) % 16 AS shard,
         LEN(string_split_regex(TRIM(text), '\s+')) AS t,
         strlen(text) AS bts
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS n_tokens,
       CAST(SUM(bts) AS BIGINT) AS n_bytes
FROM b GROUP BY shard ORDER BY shard
"""


EXT_QUERIES.update(
    {
        "ext_robust_scale": ext_robust_scale,
        "ext_psi_drift": ext_psi_drift,
        "ext_ks_drift": ext_ks_drift,
        "ext_dist_moments": ext_dist_moments,
        "ext_shard_manifest": ext_shard_manifest,
    }
)
EXT_ORACLES.update(
    {
        "ext_robust_scale": EXT_ROBUST_SCALE_SQL,
        "ext_psi_drift": EXT_PSI_DRIFT_SQL,
        "ext_ks_drift": EXT_KS_DRIFT_SQL,
        "ext_dist_moments": EXT_DIST_MOMENTS_SQL,
        "ext_shard_manifest": EXT_SHARD_MANIFEST_SQL,
    }
)


def ext_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity proxy (see text.bigram_nll):
    context-aware quality scoring — word-salad detection the unigram
    model cannot do."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.bigram_nll(docs)
        .select("doc_id", "mean_bigram_nll", "n_bigrams")
        .orderBy("doc_id")
    )


EXT_BIGRAM_NLL_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS ws
  FROM documents
),
idx AS (
  SELECT doc_id, ws, UNNEST(range(1, len(ws))) AS i
  FROM toks WHERE len(ws) >= 2
),
pairs AS (
  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i + 1] AS gram FROM idx
),
big AS (SELECT gram, COUNT(*) AS cab FROM pairs GROUP BY 1),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT w) AS vs FROM (
    SELECT UNNEST(string_split(gram, ' ')) AS w FROM big
  )
),
sc AS (
  SELECT p.doc_id, -LN((b.cab + 0.5) / (c.c1 + 0.5 * v.vs)) AS nll
  FROM pairs p JOIN big b USING (gram) JOIN ctx c USING (w1) CROSS JOIN v
)
SELECT doc_id, ROUND(AVG(nll), 6) AS mean_bigram_nll,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


def ext_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib redundancy signal per document (text.compression_stats) —
    non-SQL-expressible (no deflate in DuckDB), rows-only gate;
    determinism + directional properties pinned in tests/test_ext.py."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.compression_stats(docs)
        .select("doc_id", "n_raw_bytes", "n_deflate_bytes", "compression_ratio")
        .orderBy("doc_id")
    )


def ext_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy name match (X72
    pairs) -> connected components (X41 hash-min propagation) ->
    cluster id + cluster size per customer; singleton customers keep
    their own id as the cluster. The full dedup-merge pipeline a
    master-data / golden-record job runs.

    Scale shape: pairs come from the blocked equi-join (levenshtein
    only inside blocks); CC is O(diameter) rounds over the TINY pair
    set; the final label attach is a left join on the customer key and
    sizes aggregate over O(customers) labels."""
    from aircan_spark.ext import entity

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = entity.fuzzy_self_join(
        cust, "c_custkey", "c_name", max_dist=1, tail=2
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    labeled = (
        cust.join(comp.withColumnRenamed("id", "c_custkey"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("component", F.col("c_custkey")).alias("cluster"),
        )
    )
    sizes = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster")
        .select("c_custkey", "cluster", "cluster_size")
        .orderBy("c_custkey")
    )


EXT_ENTITY_CLUSTERS_SQL = r"""
WITH RECURSIVE k AS (
  SELECT c_custkey AS id, c_name AS name,
         SUBSTR(c_name, 1, GREATEST(LENGTH(c_name) - 2, 0)) AS block
  FROM customer
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM k a JOIN k b ON a.block = b.block AND a.id < b.id
  WHERE levenshtein(a.name, b.name) <= 1
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
),
lab AS (
  SELECT id AS c_custkey, MIN(comp) AS cluster FROM reach GROUP BY id
),
sizes AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
)
SELECT l.c_custkey, l.cluster, s.cluster_size
FROM lab l JOIN sizes s USING (cluster)
ORDER BY c_custkey
"""


EXT_QUERIES.update(
    {
        "ext_bigram_nll": ext_bigram_nll,
        "ext_compression_ratio": ext_compression_ratio,
        "ext_entity_clusters": ext_entity_clusters,
    }
)
EXT_ORACLES.update(
    {
        "ext_bigram_nll": EXT_BIGRAM_NLL_SQL,
        "ext_entity_clusters": EXT_ENTITY_CLUSTERS_SQL,
    }
)


# --- round-3 wave: corpus health + warehouse-classic classification -----------


def ext_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap between corpus sources: Jaccard similarity of
    the distinct-token sets for every source pair — the corpus-level
    contamination/redundancy map (two feeds with near-identical
    vocabulary are candidates for near-dup sweeps before training).

    Scale shape: one exchange builds distinct (source, token) pairs,
    collapsed to a token -> sorted-source-array inverted index (arrays
    bounded by the FEED count, not the corpus); pair intersections are
    a row-local HOF expansion over that index (never a token self-join
    whose hot tokens fan out quadratically in DATA size), and
    per-source vocabulary sizes derive from the SAME index subtree
    (AQE reuses the exchange) before broadcasting onto the
    O(sources^2) result."""
    docs = _t(spark, sf_dir, "documents")
    idx = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
        .groupBy("w")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    srcs = F.col("srcs")
    combos = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + 2, F.size(srcs)),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    inter = (
        idx.select(F.explode(combos).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = (
        idx.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("v").alias("v_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("v").alias("v_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "v_a",
            "v_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


EXT_SOURCE_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT DISTINCT source, w FROM (
    SELECT source,
           UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> ''
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM toks GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM toks a JOIN toks b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, sa.v AS v_a, sb.v AS v_b, i.n_common,
       ROUND(CAST(i.n_common AS DOUBLE) / (sa.v + sb.v - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.source_a = sa.source
JOIN sizes sb ON i.source_b = sb.source
ORDER BY source_a, source_b
"""


def ext_encoding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding-health audit: replacement-character (U+FFFD)
    document rate, mean non-ASCII ratio, mean C0-control ratio — the
    mojibake/double-decode detector a crawl pipeline runs per feed
    before text ever reaches tokenization. Row-local regexp counting,
    one O(sources) exchange."""
    docs = _t(spark, sf_dir, "documents")
    L = F.greatest(F.length("text"), F.lit(1)).cast("double")
    return (
        docs.select(
            "source",
            F.col("text").contains("�").cast("int").alias("has_repl"),
            (F.regexp_count(F.col("text"), F.lit(r"[^\x00-\x7F]")) / L).alias("nonascii"),
            (
                F.regexp_count(
                    F.col("text"), F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
                )
                / L
            ).alias("control"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_repl").alias("n_replacement_docs"),
            F.round(F.avg("nonascii"), 6).alias("mean_nonascii_ratio"),
            F.round(F.avg("control"), 6).alias("mean_control_ratio"),
        )
        .orderBy("source")
    )


EXT_ENCODING_HEALTH_SQL = r"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_replacement_docs,
       ROUND(AVG(CAST(LEN(regexp_extract_all(text, '[^\x00-\x7F]')) AS DOUBLE)
                 / GREATEST(LENGTH(text), 1)), 6) AS mean_nonascii_ratio,
       ROUND(AVG(CAST(LEN(regexp_extract_all(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS DOUBLE)
                 / GREATEST(LENGTH(text), 1)), 6) AS mean_control_ratio
FROM documents GROUP BY source ORDER BY source
"""


def ext_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory classification per part: revenue class (A =
    above the 95th percentile of per-part revenue, B = above the 80th,
    C = rest — the scale-safe quantile variant of cumulative-share ABC;
    the exact cumulative form is the ext_gini numbering pattern) and
    demand-variability class from the coefficient of variation of
    monthly shipped quantity (X <= 0.35 steady, Y <= 0.6, Z erratic).

    Scale shape: lineitem is scanned and exchanged ONCE into the
    (part, month) grid carrying BOTH quantity and revenue partials;
    per-part revenue and the CV moment sums are second-level aggs over
    that already-collapsed grid sharing an identical subtree (AQE
    reuses the shuffle stage, so the fact table is not rescanned for
    the second branch); the two scalar thresholds broadcast. No global
    sort, no per-part windows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("iq"),
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    monthly = li.groupBy("l_partkey", "m").agg(
        F.sum("iq").alias("mq"),
        F.sum("rev").cast("decimal(38,12)").alias("mrev"),
    )
    rev = monthly.groupBy("l_partkey").agg(
        F.sum("mrev").cast("decimal(38,12)").alias("revenue")
    )
    thr = rev.agg(
        F.expr("percentile(CAST(revenue AS DOUBLE), 0.95)").alias("t95"),
        F.expr("percentile(CAST(revenue AS DOUBLE), 0.80)").alias("t80"),
    )
    mq = F.col("mq")
    cvf = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_m"),
        F.sum(mq.cast("decimal(38,0)")).alias("s1"),
        F.sum(mq.cast("decimal(19,0)") * mq.cast("decimal(19,0)")).alias("s2"),
    )
    n = F.col("n_m").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    cv = F.sqrt(s2 / n - (s1 / n) * (s1 / n)) / (s1 / n)
    classified = (
        rev.join(cvf, "l_partkey")
        .crossJoin(F.broadcast(thr))
        .select(
            "l_partkey",
            F.col("revenue").cast("double").alias("revenue"),
            F.when(F.col("revenue").cast("double") > F.col("t95"), "A")
            .when(F.col("revenue").cast("double") > F.col("t80"), "B")
            .otherwise("C")
            .alias("abc_class"),
            F.round(cv, 6).alias("demand_cv"),
            F.when(cv <= 0.35, "X").when(cv <= 0.6, "Y").otherwise("Z").alias("xyz_class"),
        )
    )
    return classified.orderBy("l_partkey")


EXT_ABC_XYZ_SQL = r"""
WITH li AS (
  SELECT l_partkey, l_shipdate,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS iq,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS rev
  FROM lineitem
),
rev AS (
  SELECT l_partkey, CAST(SUM(rev) AS DECIMAL(38,12)) AS revenue
  FROM li GROUP BY 1
),
thr AS (
  SELECT quantile_cont(CAST(revenue AS DOUBLE), 0.95) AS t95,
         quantile_cont(CAST(revenue AS DOUBLE), 0.80) AS t80
  FROM rev
),
monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         CAST(SUM(iq) AS BIGINT) AS mq
  FROM li GROUP BY 1, 2
),
cvf AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_m,
         CAST(SUM(CAST(mq AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(mq AS HUGEINT) * mq) AS DECIMAL(38,0)) AS s2
  FROM monthly GROUP BY 1
)
SELECT r.l_partkey AS l_partkey,
       CAST(r.revenue AS DOUBLE) AS revenue,
       CASE WHEN CAST(r.revenue AS DOUBLE) > t.t95 THEN 'A'
            WHEN CAST(r.revenue AS DOUBLE) > t.t80 THEN 'B'
            ELSE 'C' END AS abc_class,
       ROUND(SQRT(CAST(c.s2 AS DOUBLE) / c.n_m
                  - (CAST(c.s1 AS DOUBLE) / c.n_m) * (CAST(c.s1 AS DOUBLE) / c.n_m))
             / (CAST(c.s1 AS DOUBLE) / c.n_m), 6) AS demand_cv,
       CASE WHEN SQRT(CAST(c.s2 AS DOUBLE) / c.n_m
                      - (CAST(c.s1 AS DOUBLE) / c.n_m) * (CAST(c.s1 AS DOUBLE) / c.n_m))
                 / (CAST(c.s1 AS DOUBLE) / c.n_m) <= 0.35 THEN 'X'
            WHEN SQRT(CAST(c.s2 AS DOUBLE) / c.n_m
                      - (CAST(c.s1 AS DOUBLE) / c.n_m) * (CAST(c.s1 AS DOUBLE) / c.n_m))
                 / (CAST(c.s1 AS DOUBLE) / c.n_m) <= 0.6 THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM rev r JOIN cvf c ON r.l_partkey = c.l_partkey
CROSS JOIN thr t
ORDER BY l_partkey
"""


def ext_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over parts co-purchased in the
    same order: support, directional confidences, and lift for the
    top-100 most frequent part pairs (min pair count 2) — the
    recommendation-mining classic, built on the X160 co-occurrence
    shape.

    Scale shape: the fact table is scanned ONCE and collapsed to
    per-order sorted item ARRAYS (one exchange); pair expansion is a
    row-local HOF over each basket (fan-out bounded by basket size
    squared, never item-keyed, no self-join), and the basket frame's
    identical subtree feeds pair counts, item counts, and the
    basket-count scalar (AQE reuses the shuffle stage across the three
    branches); k-bounded head."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
    )
    items_col = F.col("items")
    combos = F.flatten(
        F.transform(
            items_col,
            lambda x, i: F.transform(
                F.slice(items_col, i + 2, F.size(items_col)),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    items = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(items.select(F.col("l_partkey").alias("pa"), F.col("n_item").alias("n_a"))),
            "pa",
        )
        .join(
            F.broadcast(items.select(F.col("l_partkey").alias("pb"), F.col("n_item").alias("n_b"))),
            "pb",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "n_pair",
            F.round(F.col("n_pair").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair").cast("double") / F.col("n_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_pair").cast("double") / F.col("n_b"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("n_pair").cast("double") * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "pa", "pb")
        .limit(100)
    )


EXT_ASSOCIATION_RULES_SQL = r"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
items AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op)
SELECT p.pa, p.pb, p.n_pair,
       ROUND(CAST(p.n_pair AS DOUBLE) / t.n_orders, 6) AS support,
       ROUND(CAST(p.n_pair AS DOUBLE) / ia.n_item, 6) AS conf_a_to_b,
       ROUND(CAST(p.n_pair AS DOUBLE) / ib.n_item, 6) AS conf_b_to_a,
       ROUND(CAST(p.n_pair AS DOUBLE) * t.n_orders / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM pairs p
JOIN items ia ON p.pa = ia.l_partkey
JOIN items ib ON p.pb = ib.l_partkey
CROSS JOIN tot t
ORDER BY n_pair DESC, pa, pb LIMIT 100
"""


def ext_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus max date), frequency (order count), monetary (lifetime
    spend), each scored 1-5 by strict-greater comparison against the
    20/40/60/80th percentile thresholds — the classic CRM segmentation.

    Scale shape: one per-customer exchange; the 12 threshold scalars
    broadcast; scores are row-local CASE arithmetic (no NTILE — a
    global ntile would single-task the customer axis)."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_dec"),
    )
    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    per = per.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.col("maxd"), F.col("last_order")).alias("recency_days"),
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
    )
    thr = per.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{int(q * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def score(col, pfx, invert=False):
        s = sum(
            (F.col(col) > F.col(f"{pfx}{q}")).cast("int") for q in (20, 40, 60, 80)
        )
        return (F.lit(5) - s) if invert else (F.lit(1) + s)

    return (
        per.crossJoin(F.broadcast(thr))
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            F.round("monetary", 2).alias("monetary"),
            score("recency_days", "r", invert=True).alias("r_score"),
            score("frequency", "f").alias("f_score"),
            score("monetary", "m").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
        )
        .orderBy("o_custkey")
    )


EXT_RFM_SQL = r"""
WITH per AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY 1
),
maxd AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
base AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_order, maxd) AS INT) AS recency_days,
         frequency, monetary
  FROM per CROSS JOIN maxd
),
thr AS (
  SELECT quantile_cont(recency_days, 0.2) AS r20, quantile_cont(recency_days, 0.4) AS r40,
         quantile_cont(recency_days, 0.6) AS r60, quantile_cont(recency_days, 0.8) AS r80,
         quantile_cont(frequency, 0.2) AS f20, quantile_cont(frequency, 0.4) AS f40,
         quantile_cont(frequency, 0.6) AS f60, quantile_cont(frequency, 0.8) AS f80,
         quantile_cont(monetary, 0.2) AS m20, quantile_cont(monetary, 0.4) AS m40,
         quantile_cont(monetary, 0.6) AS m60, quantile_cont(monetary, 0.8) AS m80
  FROM base
)
SELECT b.o_custkey, b.recency_days, b.frequency, ROUND(b.monetary, 2) AS monetary,
       5 - ((b.recency_days > t.r20)::INT + (b.recency_days > t.r40)::INT
            + (b.recency_days > t.r60)::INT + (b.recency_days > t.r80)::INT) AS r_score,
       1 + ((b.frequency > t.f20)::INT + (b.frequency > t.f40)::INT
            + (b.frequency > t.f60)::INT + (b.frequency > t.f80)::INT) AS f_score,
       1 + ((b.monetary > t.m20)::INT + (b.monetary > t.m40)::INT
            + (b.monetary > t.m60)::INT + (b.monetary > t.m80)::INT) AS m_score,
       CAST(5 - ((b.recency_days > t.r20)::INT + (b.recency_days > t.r40)::INT
            + (b.recency_days > t.r60)::INT + (b.recency_days > t.r80)::INT) AS VARCHAR)
       || CAST(1 + ((b.frequency > t.f20)::INT + (b.frequency > t.f40)::INT
            + (b.frequency > t.f60)::INT + (b.frequency > t.f80)::INT) AS VARCHAR)
       || CAST(1 + ((b.monetary > t.m20)::INT + (b.monetary > t.m40)::INT
            + (b.monetary > t.m60)::INT + (b.monetary > t.m80)::INT) AS VARCHAR) AS segment
FROM base b CROSS JOIN thr t
ORDER BY o_custkey
"""


def ext_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over daily event value totals:
    positive CUSUM via the cumulative-sum-minus-running-minimum
    identity (s_t = S_t - min_{j<=t} S_j with S = cumsum(x - mean)),
    flagged where the statistic exceeds one population stddev — the
    monitoring primitive for level shifts in a metric stream.

    Scale shape: the data collapses to the O(days) axis in one exact
    integer-cent exchange; mean/std broadcast as scalars; the recursive
    CUSUM definition becomes two windows over the tiny DAY axis (the
    O(days)-axis window pattern, never over raw rows)."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    daily = ev.groupBy("day").agg(F.sum(F.col("iv").cast("decimal(38,0)")).alias("x"))
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (F.col("sx").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            F.col("sxx").cast("double") / F.col("n")
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sx").cast("double") / F.col("n"))
        ).alias("std"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("S", F.sum(F.col("x").cast("double") - F.col("mean")).over(w))
        .withColumn("S_min", F.min(F.least(F.col("S"), F.lit(0.0))).over(w))
    )
    return cum.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("x").cast("double") / 100.0, 2).alias("daily_total"),
        F.round((F.col("S") - F.col("S_min")) / 100.0, 6).alias("cusum_pos"),
        ((F.col("S") - F.col("S_min")) > F.col("std")).alias("changepoint"),
    ).orderBy("day")


EXT_CUSUM_SQL = r"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, CAST(ROUND(value * 100) AS BIGINT) AS iv
  FROM events
),
daily AS (
  SELECT day, CAST(SUM(CAST(iv AS HUGEINT)) AS DECIMAL(38,0)) AS x
  FROM ev GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean,
         SQRT(CAST(SUM(x*x) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(x) AS DOUBLE) / COUNT(*)) * (CAST(SUM(x) AS DOUBLE) / COUNT(*))) AS std
  FROM daily
),
cum AS (
  SELECT d.day, d.x, s.mean, s.std,
         SUM(CAST(d.x AS DOUBLE) - s.mean) OVER (ORDER BY d.day) AS S
  FROM daily d CROSS JOIN stats s
),
cm AS (
  SELECT day, x, std, S,
         MIN(LEAST(S, 0.0)) OVER (ORDER BY day) AS S_min
  FROM cum
)
SELECT CAST(day AS VARCHAR) AS day,
       ROUND(CAST(x AS DOUBLE) / 100.0, 2) AS daily_total,
       ROUND((S - S_min) / 100.0, 6) AS cusum_pos,
       (S - S_min) > std AS changepoint
FROM cm ORDER BY day
"""


EXT_QUERIES.update(
    {
        "ext_source_overlap": ext_source_overlap,
        "ext_encoding_health": ext_encoding_health,
        "ext_abc_xyz": ext_abc_xyz,
        "ext_association_rules": ext_association_rules,
        "ext_rfm_segments": ext_rfm_segments,
        "ext_cusum_changepoint": ext_cusum_changepoint,
    }
)
EXT_ORACLES.update(
    {
        "ext_source_overlap": EXT_SOURCE_OVERLAP_SQL,
        "ext_encoding_health": EXT_ENCODING_HEALTH_SQL,
        "ext_abc_xyz": EXT_ABC_XYZ_SQL,
        "ext_association_rules": EXT_ASSOCIATION_RULES_SQL,
        "ext_rfm_segments": EXT_RFM_SQL,
        "ext_cusum_changepoint": EXT_CUSUM_SQL,
    }
)


# --- round-3 wave: incremental ingest dedup, correlation matrix, HDR sketch ---


def ext_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup gate: for a NEW batch of documents
    (doc_id % 5 == 0 — a scale-invariant synthetic split), flag each
    doc as a duplicate of the EXISTING corpus (normalized-content hash
    already present) and/or a duplicate within its own batch (not the
    batch's first occurrence of the hash); `keep` is the admission
    decision. This is the nightly-crawl admission filter — dedup
    against 100 TB of history WITHOUT rescanning it (the corpus side
    collapses to its distinct hash set).

    Scale shape: corpus hashes collapse via one distinct on the hash
    key; the batch left-joins that set (equi-join on an 8-byte-able
    key), and within-batch firsts come from a min-id per hash on the
    SMALL batch only."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).cast("binary")
    )
    hashed = docs.select("doc_id", h.alias("h"))
    corpus = hashed.filter(F.col("doc_id") % 5 != 0).select("h").distinct()
    batch = hashed.filter(F.col("doc_id") % 5 == 0)
    firsts = batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    return (
        batch.join(
            corpus.withColumn("__in_corpus", F.lit(True)), "h", "left"
        )
        .join(firsts, "h")
        .select(
            "doc_id",
            F.coalesce("__in_corpus", F.lit(False)).alias("is_corpus_dup"),
            (F.col("doc_id") != F.col("first_id")).alias("is_batch_dup"),
        )
        .withColumn(
            "keep", ~F.col("is_corpus_dup") & ~F.col("is_batch_dup")
        )
        .orderBy("doc_id")
    )


EXT_INCREMENTAL_DEDUP_SQL = r"""
WITH hashed AS (
  SELECT doc_id,
         md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS h
  FROM documents
),
corpus AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, h FROM hashed WHERE doc_id % 5 = 0),
firsts AS (SELECT h, MIN(doc_id) AS first_id FROM batch GROUP BY 1)
SELECT b.doc_id,
       (c.h IS NOT NULL) AS is_corpus_dup,
       (b.doc_id <> f.first_id) AS is_batch_dup,
       (c.h IS NULL AND b.doc_id = f.first_id) AS keep
FROM batch b
LEFT JOIN corpus c ON b.h = c.h
JOIN firsts f ON b.h = f.h
ORDER BY doc_id
"""


def ext_type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation matrix: Pearson correlation between the
    DAILY value totals of every event-type pair — the metric-coupling
    map (which KPIs move together) behind anomaly root-causing.

    Scale shape: raw events collapse to the O(days x types) grid in one
    integer-cent-exact exchange; the pair join is DAY-keyed over that
    tiny grid; correlations derive from exact decimal power sums in one
    double expression at the end (the X97 exactness discipline, lifted
    to the full matrix)."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    daily = ev.groupBy("day", "event_type").agg(F.sum("iv").alias("x"))
    a = daily.select("day", F.col("event_type").alias("type_a"), F.col("x").alias("xa"))
    b = daily.select("day", F.col("event_type").alias("type_b"), F.col("x").alias("xb"))
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("xa").cast("decimal(38,0)")).alias("sa"),
        F.sum(F.col("xb").cast("decimal(38,0)")).alias("sb"),
        F.sum(F.col("xa").cast("decimal(19,0)") * F.col("xb").cast("decimal(19,0)")).alias("sab"),
        F.sum(F.col("xa").cast("decimal(19,0)") * F.col("xa").cast("decimal(19,0)")).alias("saa"),
        F.sum(F.col("xb").cast("decimal(19,0)") * F.col("xb").cast("decimal(19,0)")).alias("sbb"),
    )
    n = F.col("n_days").cast("double")
    sa = F.col("sa").cast("double")
    sb = F.col("sb").cast("double")
    sab = F.col("sab").cast("double")
    saa = F.col("saa").cast("double")
    sbb = F.col("sbb").cast("double")
    corr = (n * sab - sa * sb) / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    return agg.select(
        "type_a", "type_b", "n_days", F.round(corr, 6).alias("corr")
    ).orderBy("type_a", "type_b")


EXT_TYPE_CORRELATIONS_SQL = r"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS iv
  FROM events
),
daily AS (
  SELECT day, event_type, CAST(SUM(iv) AS BIGINT) AS x
  FROM ev GROUP BY 1, 2
),
pairs AS (
  SELECT a.type_a, b.event_type AS type_b, a.xa, b.x AS xb
  FROM (SELECT day, event_type AS type_a, x AS xa FROM daily) a
  JOIN daily b ON a.day = b.day AND a.type_a < b.event_type
),
agg AS (
  SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CAST(xa AS HUGEINT)) AS DECIMAL(38,0)) AS sa,
         CAST(SUM(CAST(xb AS HUGEINT)) AS DECIMAL(38,0)) AS sb,
         CAST(SUM(CAST(xa AS HUGEINT) * xb) AS DECIMAL(38,0)) AS sab,
         CAST(SUM(CAST(xa AS HUGEINT) * xa) AS DECIMAL(38,0)) AS saa,
         CAST(SUM(CAST(xb AS HUGEINT) * xb) AS DECIMAL(38,0)) AS sbb
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       ROUND((n_days * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / SQRT((n_days * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (n_days * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
         AS corr
FROM agg ORDER BY type_a, type_b
"""


def ext_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style quantile sketch per event type: values (as
    integer cents) bucket by (bit-width, top-4-bits) — pure INTEGER
    log2 bucketing, so the sketch is bit-identical in any engine (no
    libm ln() whose last ulp could flip a boundary bucket, the classic
    DDSketch portability trap). Counts are mergeable by addition;
    p50/p90/p99 read off the cumulated bucket walk at bucket midpoints
    (bounded relative error ~= 1/2^4 per bucket).

    Scale shape: one O(types x buckets) partial-agged exchange; the
    quantile walk is a window over the BUCKET axis (~40 rows per
    type)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    scale_expr = (
        "CAST(POW(2.0, CAST(GREATEST(LENGTH(CONV(iv, 10, 2)) - 4, 0) AS DOUBLE))"
        " AS LONG)"
    )
    bucketed = ev.select(
        "event_type",
        F.expr(f"iv div {scale_expr}").alias("sub"),
        F.expr(scale_expr).alias("scale"),
    )
    cells = bucketed.groupBy("event_type", "sub", "scale").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # midpoint of [sub*scale, (sub+1)*scale) in original units
    mid = (
        (F.col("sub") * F.col("scale") + (F.col("sub") + 1) * F.col("scale"))
        .cast("double")
        / 2.0
        / 100.0
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("sub") * F.col("scale"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("event_type")
    walked = cells.select(
        "event_type",
        mid.alias("mid"),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("n"),
    )
    out = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("mid")
                )
            ),
            6,
        ).alias(nm)
        for nm, q in out
    ]
    return (
        walked.groupBy("event_type")
        .agg(F.max("n").alias("n"), *aggs)
        .orderBy("event_type")
    )


EXT_HDR_QUANTILES_SQL = r"""
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS iv FROM events
),
bucketed AS (
  SELECT event_type,
         iv // CAST(POW(2.0, GREATEST(LENGTH(bin(iv)) - 4, 0)) AS BIGINT) AS sub,
         CAST(POW(2.0, GREATEST(LENGTH(bin(iv)) - 4, 0)) AS BIGINT) AS scale
  FROM ev
),
cells AS (
  SELECT event_type, sub, scale, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY 1, 2, 3
),
walked AS (
  SELECT event_type,
         CAST(sub * scale + (sub + 1) * scale AS DOUBLE) / 2.0 / 100.0 AS mid,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY sub * scale) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM cells
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN mid END), 6) AS p50,
       ROUND(MIN(CASE WHEN cum >= CEIL(0.90 * n) THEN mid END), 6) AS p90,
       ROUND(MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN mid END), 6) AS p99
FROM walked GROUP BY event_type ORDER BY event_type
"""


EXT_QUERIES.update(
    {
        "ext_incremental_dedup": ext_incremental_dedup,
        "ext_type_correlations": ext_type_correlations,
        "ext_hdr_quantiles": ext_hdr_quantiles,
    }
)
EXT_ORACLES.update(
    {
        "ext_incremental_dedup": EXT_INCREMENTAL_DEDUP_SQL,
        "ext_type_correlations": EXT_TYPE_CORRELATIONS_SQL,
        "ext_hdr_quantiles": EXT_HDR_QUANTILES_SQL,
    }
)


# --- round-3 wave: winnow overlap, embedding outliers, readability ------------


def ext_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap (plagiarism-style) detection via MOD-p selected
    rolling fingerprints: hash every word 3-gram, keep hashes ≡ 0
    (mod 8) as each document's fingerprint set, and report pairs
    sharing >= 2 selected prints. Content-addressed like X164's
    containment but over a 1/8 SAMPLE of the shingle space — the
    winnowing trade: the inverted index (and its join) shrinks 8x while
    any shared run of >= 3 words still has a constant chance per
    selected window of surfacing the pair.

    The fingerprint here is an md5-derived 60-bit integer (NOT
    xxhash64 like text.rolling_fingerprints) so the whole selection
    replays exactly in any SQL engine. Scale shape: prints build
    row-locally, the hot-print guard (doc_freq <= 64) caps inverted-
    index fan-out, the pair join is print-keyed on bare ids."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup._shingle_array("text", 3)
    h = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    selected = F.array_distinct(
        F.filter(F.transform(sh, h), lambda x: F.pmod(x, F.lit(8)) == 0)
    )
    pr = docs.select(
        "doc_id", F.explode(selected).alias("p")
    )
    freq = pr.groupBy("p").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= 64
    )
    kept = pr.join(freq.select("p"), "p")
    a = kept.select(F.col("doc_id").alias("id_a"), "p")
    b = kept.select(F.col("doc_id").alias("id_b"), "p")
    return (
        a.join(b, "p")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_prints"))
        .filter(F.col("n_shared_prints") >= 2)
        .orderBy("id_a", "id_b")
    )


EXT_WINNOW_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
pr AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || SUBSTR(md5(s), 1, 15))::UBIGINT AS BIGINT) AS p
  FROM sh
  WHERE ('0x' || SUBSTR(md5(s), 1, 15))::UBIGINT % 8 = 0
),
freq AS (SELECT p FROM pr GROUP BY p HAVING COUNT(*) <= 64)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_prints
FROM pr a JOIN freq fa ON a.p = fa.p
JOIN pr b ON a.p = b.p AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY id_a, id_b
"""


def ext_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding label-outlier audit — the mislabeled-sample detector:
    cosine of every vector to ITS OWN label's centroid, flagged when it
    falls below the label's 5th percentile. Low cosine to your own
    class centroid = probable labeling error or boundary sample; this
    is the curation sweep run before training a classifier head.

    Scale shape: centroids are the X38 decimal-exact means (rounded to
    6 BEFORE use, so both engines score against bit-identical
    centroids); the O(labels x dims) centroid table and O(labels)
    norms/thresholds broadcast; vectors meet them in one row-local-ish
    (vec_id-grouped) join — the corpus never shuffles on anything
    data-sized except the posexplode regroup."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = vectors.label_centroids(emb).select(
        "label", "pos", "centroid_val"
    )
    cnorm = cent.groupBy("label").agg(
        F.sum(F.col("centroid_val") * F.col("centroid_val")).alias("cn")
    )
    exploded = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("long"))
    per_vec = (
        exploded.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("centroid_val")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("vn"),
        )
    )
    scored = per_vec.join(F.broadcast(cnorm), "label").select(
        "vec_id",
        "label",
        F.round(
            F.col("dot") / F.sqrt(F.col("vn") * F.col("cn")), 6
        ).alias("cos_to_centroid"),
    )
    thr = scored.groupBy("label").agg(
        F.expr("percentile(cos_to_centroid, 0.05)").alias("t05")
    )
    return (
        scored.join(F.broadcast(thr), "label")
        .select(
            "vec_id",
            "label",
            "cos_to_centroid",
            (F.col("cos_to_centroid") < F.col("t05")).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


EXT_LABEL_OUTLIERS_SQL = r"""
WITH u AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM u GROUP BY label, pos
),
cnorm AS (SELECT label, SUM(c * c) AS cn FROM cent GROUP BY label),
per_vec AS (
  SELECT u.vec_id, u.label,
         SUM(u.v * cent.c) AS dot, SUM(u.v * u.v) AS vn
  FROM u JOIN cent ON u.label = cent.label AND u.pos = cent.pos
  GROUP BY 1, 2
),
scored AS (
  SELECT p.vec_id, p.label,
         ROUND(p.dot / SQRT(p.vn * n.cn), 6) AS cos_to_centroid
  FROM per_vec p JOIN cnorm n ON p.label = n.label
),
thr AS (
  SELECT label, quantile_cont(cos_to_centroid, 0.05) AS t05
  FROM scored GROUP BY label
)
SELECT s.vec_id, s.label, s.cos_to_centroid,
       s.cos_to_centroid < t.t05 AS is_outlier
FROM scored s JOIN thr t ON s.label = t.label
ORDER BY vec_id
"""


def ext_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease-style readability per document (vowel-group
    syllable proxy): 206.835 - 1.015*(words/sentences) -
    84.6*(syllable_groups/words) — the classic text-difficulty signal a
    curation pipeline buckets corpora by. All counts are row-local
    regexp scans fused into the parquet read; one O(docs) projection,
    zero shuffle before the output sort."""
    docs = _t(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    )
    syll = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syll.alias("n_syllable_groups"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * words.cast("double") / sents
            - F.lit(84.6) * syll.cast("double") / words,
            4,
        ).alias("flesch_score"),
    ).orderBy("doc_id")


EXT_READABILITY_SQL = r"""
SELECT doc_id,
       LEN(string_split_regex(TRIM(text), '\s+')) AS n_words,
       GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
       LEN(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS n_syllable_groups,
       ROUND(206.835
             - 1.015 * CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS DOUBLE)
               / GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1)
             - 84.6 * CAST(LEN(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS DOUBLE)
               / LEN(string_split_regex(TRIM(text), '\s+')), 4) AS flesch_score
FROM documents ORDER BY doc_id
"""


EXT_QUERIES.update(
    {
        "ext_winnow_overlap": ext_winnow_overlap,
        "ext_label_outliers": ext_label_outliers,
        "ext_readability": ext_readability,
    }
)
EXT_ORACLES.update(
    {
        "ext_winnow_overlap": EXT_WINNOW_OVERLAP_SQL,
        "ext_label_outliers": EXT_LABEL_OUTLIERS_SQL,
        "ext_readability": EXT_READABILITY_SQL,
    }
)


# --- round-3 wave: novelty, balancing, integrity ------------------------------


def ext_kl_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty score: KL divergence of the document's
    unigram distribution from the corpus unigram distribution —
    high-KL docs use language the corpus doesn't (novel or noisy),
    low-KL docs are statistically generic; the diversity-vs-typicality
    axis a data-mixing pipeline samples along.

    Scale shape: ONE (doc, word) count exchange; the corpus word
    distribution DERIVES from that same table (Σ over docs — AQE
    reuses the stage rather than re-tokenizing), joins back on the
    word key, and the corpus-size scalar broadcasts."""
    docs = _t(spark, sf_dir, "documents")
    dw = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    doc_len = dw.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    corpus = dw.groupBy("w").agg(F.sum("c").alias("cw"))
    total = corpus.agg(F.sum("cw").alias("n"))
    scored = (
        dw.join(F.broadcast(corpus), "w")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__term",
            (F.col("c") / F.col("dl"))
            * F.log(
                (F.col("c").cast("double") / F.col("dl"))
                / (F.col("cw").cast("double") / F.col("n"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("__term"), 6).alias("kl_novelty"),
            F.max("dl").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


EXT_KL_NOVELTY_SQL = r"""
WITH dw AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id,
           UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY 1, 2
),
doc_len AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl FROM dw GROUP BY 1),
corpus AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM dw GROUP BY 1),
total AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM corpus)
SELECT d.doc_id AS doc_id,
       ROUND(SUM((CAST(d.c AS DOUBLE) / l.dl)
                 * LN((CAST(d.c AS DOUBLE) / l.dl) / (CAST(c.cw AS DOUBLE) / t.n))), 6)
         AS kl_novelty,
       MAX(l.dl) AS n_tokens
FROM dw d
JOIN corpus c ON d.w = c.w
JOIN doc_len l ON d.doc_id = l.doc_id
CROSS JOIN total t
GROUP BY d.doc_id ORDER BY d.doc_id
"""


def ext_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every language's documents at
    2x the MINORITY language's count, chosen in deterministic md5
    order — the imbalance fix applied before training a classifier on
    skewed labels (majority classes shrink, minority survives whole).

    Scale shape: class counts are one tiny agg whose min broadcasts
    back as the cap scalar; selection is row_number over (class, hash)
    — WindowGroupLimit prunes map-side once the cap is known, so no
    task ever holds more than cap rows per class."""
    from aircan_spark.ext.sampling import shuffle_key

    docs = _t(spark, sf_dir, "documents")
    cap = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        (F.min("n") * 2).alias("cap")
    )
    w = Window.partitionBy("lang").orderBy(shuffle_key(F.col("doc_id"), 13))
    return (
        docs.withColumn("__r", F.row_number().over(w))
        .crossJoin(F.broadcast(cap))
        .filter(F.col("__r") <= F.col("cap"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


EXT_BALANCED_SAMPLE_SQL = r"""
WITH cap AS (
  SELECT MIN(n) * 2 AS cap FROM (
    SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
  )
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5('13-' || CAST(doc_id AS VARCHAR))
         ) AS r
  FROM documents
)
SELECT doc_id, lang FROM ranked CROSS JOIN cap
WHERE r <= cap ORDER BY doc_id
"""


def ext_integrity_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard data-integrity checksums for transfer/export
    validation: order-independent BIT_XOR of each document's
    md5-derived 60-bit content hash plus row counts, per the same 16
    portable hash shards as the X173 manifest. Receiving side recomputes
    the same two numbers and compares — any lost, duplicated, or
    corrupted row flips the checksum.

    Scale shape: row-local hashing, one 16-group partial-agged
    exchange; XOR is commutative/associative so partials combine in
    any order (the property that makes it a SHUFFLE-SAFE checksum,
    unlike a concatenation digest)."""
    from aircan_spark.ext.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    content_hash = F.conv(
        F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return (
        docs.select(
            F.pmod(hash_bucket(F.col("doc_id"), seed=7), F.lit(16)).alias("shard"),
            content_hash.alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_checksum"),
        )
        .orderBy("shard")
    )


EXT_INTEGRITY_CHECKSUMS_SQL = r"""
WITH b AS (
  SELECT (('0x' || SUBSTR(md5('7-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          % 10000) % 16 AS shard,
         CAST(('0x' || SUBSTR(md5(text), 1, 15))::UBIGINT AS BIGINT) AS h
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(BIT_XOR(h) AS BIGINT) AS xor_checksum
FROM b GROUP BY shard ORDER BY shard
"""


EXT_QUERIES.update(
    {
        "ext_kl_novelty": ext_kl_novelty,
        "ext_balanced_sample": ext_balanced_sample,
        "ext_integrity_checksums": ext_integrity_checksums,
    }
)
EXT_ORACLES.update(
    {
        "ext_kl_novelty": EXT_KL_NOVELTY_SQL,
        "ext_balanced_sample": EXT_BALANCED_SAMPLE_SQL,
        "ext_integrity_checksums": EXT_INTEGRITY_CHECKSUMS_SQL,
    }
)


def ext_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product communities by label propagation over the co-purchase
    graph (parts bought together in >= 2 orders): three synchronous
    LPA rounds with deterministic min-label tie-breaks — the
    category-discovery step recommendation pipelines run on the X181
    association graph. Communities are FINER than connected components
    (the LPA vote keeps dense clusters distinct where hash-min floods).

    Scale shape: edges come from the row-local basket-combo expansion
    (one fact scan); each LPA round is one O(nodes) label join + one
    (node,label) exchange + an argmax-by-struct (no per-node window
    sort); lineage checkpointed per round."""
    from aircan_spark.ext import graph

    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
    )
    items_col = F.col("items")
    combos = F.flatten(
        F.transform(
            items_col,
            lambda x, i: F.transform(
                F.slice(items_col, i + 2, F.size(items_col)),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    edges = (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
        .select("pa", "pb")
    )
    comm = graph.label_propagation(edges, "pa", "pb", iters=3)
    sizes = comm.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return (
        comm.join(sizes, "community")
        .select("id", "community", "community_size")
        .orderBy("id")
    )


EXT_COMMUNITIES_SQL = r"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
sym AS (SELECT pa AS u, pb AS v FROM pairs UNION ALL SELECT pb, pa FROM pairs),
l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM sym),
v1 AS (
  SELECT s.u AS id, l.lbl, COUNT(*) AS cnt
  FROM sym s JOIN l0 l ON s.v = l.id GROUP BY 1, 2
),
l1 AS (
  SELECT id, lbl FROM (
    SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS r
    FROM v1
  ) WHERE r = 1
),
v2 AS (
  SELECT s.u AS id, l.lbl, COUNT(*) AS cnt
  FROM sym s JOIN l1 l ON s.v = l.id GROUP BY 1, 2
),
l2 AS (
  SELECT id, lbl FROM (
    SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS r
    FROM v2
  ) WHERE r = 1
),
v3 AS (
  SELECT s.u AS id, l.lbl, COUNT(*) AS cnt
  FROM sym s JOIN l2 l ON s.v = l.id GROUP BY 1, 2
),
l3 AS (
  SELECT id, lbl FROM (
    SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS r
    FROM v3
  ) WHERE r = 1
),
sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n FROM l3 GROUP BY 1)
SELECT l3.id AS id, l3.lbl AS community, sizes.n AS community_size
FROM l3 JOIN sizes ON l3.lbl = sizes.lbl
ORDER BY id
"""


EXT_QUERIES.update({"ext_communities": ext_communities})
EXT_ORACLES.update({"ext_communities": EXT_COMMUNITIES_SQL})


# --- round-3 wave: information-theoretic + survival analytics -----------------


def ext_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and ISO weekday (plus the
    marginal entropies and the normalized coefficient) — the
    information-theoretic dependence audit: chi-square (X118) answers
    "are they dependent?", MI answers "by how many nats?", comparable
    across feature pairs for feature selection.

    Scale shape: one (type x 7-weekday) contingency exchange; margins
    and totals DERIVE from the cell table (no rescan); the final
    reduction is over O(cells) rows. Counts are exact integers; the one
    double expression rounds at the end."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (((F.dayofweek("ts") + F.lit(5)) % 7) + 1).alias("wd"),
    )
    cells = ev.groupBy("event_type", "wd").agg(F.count(F.lit(1)).alias("c"))
    mx = cells.groupBy("event_type").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("wd").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    joined = (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "wd")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n").cast("double")
    pxy = F.col("c") / n
    mi_term = pxy * F.log(pxy / ((F.col("cx") / n) * (F.col("cy") / n)))
    agg = joined.agg(
        F.max("n").alias("n_events"),
        F.sum(mi_term).alias("mi"),
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cx") / F.col("n")) * F.log(F.col("cx") / F.col("n"))).alias("h_type")
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cy") / F.col("n")) * F.log(F.col("cy") / F.col("n"))).alias("h_weekday")
    )
    return (
        agg.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n_events").cast("long").alias("n_events"),
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_weekday", 6).alias("h_weekday"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_type") * F.col("h_weekday")), 6
            ).alias("nmi"),
        )
    )


EXT_MUTUAL_INFORMATION_SQL = r"""
WITH ev AS (
  SELECT event_type, isodow(ts) AS wd FROM events
),
cells AS (
  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
mx AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY 1),
my AS (SELECT wd, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
mi AS (
  SELECT SUM((CAST(c.c AS DOUBLE) / t.n)
             * LN((CAST(c.c AS DOUBLE) / t.n)
                  / ((CAST(x.cx AS DOUBLE) / t.n) * (CAST(y.cy AS DOUBLE) / t.n)))) AS mi,
         MAX(t.n) AS n_events
  FROM cells c JOIN mx x ON c.event_type = x.event_type
  JOIN my y ON c.wd = y.wd CROSS JOIN tot t
),
hx AS (
  SELECT SUM(-(CAST(cx AS DOUBLE) / t.n) * LN(CAST(cx AS DOUBLE) / t.n)) AS h_type
  FROM mx CROSS JOIN tot t
),
hy AS (
  SELECT SUM(-(CAST(cy AS DOUBLE) / t.n) * LN(CAST(cy AS DOUBLE) / t.n)) AS h_weekday
  FROM my CROSS JOIN tot t
)
SELECT CAST(mi.n_events AS BIGINT) AS n_events,
       ROUND(mi.mi, 6) AS mi_nats,
       ROUND(hx.h_type, 6) AS h_type,
       ROUND(hy.h_weekday, 6) AS h_weekday,
       ROUND(mi.mi / SQRT(hx.h_type * hy.h_weekday), 6) AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hy
"""


def ext_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: per user,
    duration = days from their first event to their first purchase
    (event) or to the corpus horizon (censored); S(t) steps down at
    each event day by (1 - d_t / n_at_risk_t) — THE churn/conversion
    time-to-event estimator, with censoring handled correctly (naive
    conversion-rate-by-day ignores users still at risk).

    Scale shape: users collapse in one exchange (min ts, min purchase
    ts); durations aggregate to the O(days) axis; risk sets and the
    product come from two windows over that tiny axis (product as
    exp(sum(ln)) — associative, engine-identical after rounding)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("hz"))
    dur = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("tp").isNotNull(),
            F.datediff(F.to_date("tp"), F.to_date("t0")),
        )
        .otherwise(F.datediff(F.col("hz"), F.to_date("t0")))
        .alias("t"),
        F.col("tp").isNotNull().alias("event"),
    )
    days = dur.groupBy("t").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(~F.col("event"), 1).otherwise(0)).alias("cens"),
    )
    total = days.agg(F.sum(F.col("d") + F.col("cens")).alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        days.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d") + F.col("cens")).over(w_prev), F.lit(0)),
        )
        .withColumn(
            "__f", F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
        )
        # a zero factor (everyone remaining converts) can only be the
        # terminal row; guard ln() and pin S(t) to exactly 0 there —
        # Spark's ln(0)=NULL would silently DROP the term from the sum
        .withColumn(
            "__zero",
            F.max(F.when(F.col("__f") <= 0.0, 1).otherwise(0)).over(w_cum),
        )
        .withColumn(
            "survival",
            F.when(F.col("__zero") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(F.col("__f") > 0.0, F.log("__f")).otherwise(0.0)
                    ).over(w_cum)
                )
            ),
        )
    )
    return risk.filter(F.col("d") > 0).select(
        "t",
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("cens").alias("n_censored"),
        F.round("survival", 6).alias("survival"),
    ).orderBy("t")


EXT_SURVIVAL_SQL = r"""
WITH per_user AS (
  SELECT user_id, MIN(ts) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY 1
),
hz AS (SELECT MAX(CAST(ts AS DATE)) AS hz FROM events),
dur AS (
  SELECT CASE WHEN tp IS NOT NULL
              THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
              ELSE date_diff('day', CAST(t0 AS DATE), hz) END AS t,
         tp IS NOT NULL AS event
  FROM per_user CROSS JOIN hz
),
days AS (
  SELECT t,
         CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS cens
  FROM dur GROUP BY 1
),
total AS (SELECT CAST(SUM(d + cens) AS BIGINT) AS n_users FROM days),
risk AS (
  SELECT t, d, cens,
         n_users - COALESCE(SUM(d + cens) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM days CROSS JOIN total
),
surv AS (
  SELECT t, d, cens, n_risk,
         CASE WHEN MAX(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_risk <= 0 THEN 1 ELSE 0 END)
                   OVER cum = 1
              THEN 0.0
              ELSE EXP(SUM(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_risk > 0
                                THEN LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                                ELSE 0.0 END) OVER cum) END AS survival
  FROM risk
  WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events, cens AS n_censored,
       ROUND(survival, 6) AS survival
FROM surv WHERE d > 0 ORDER BY t
"""


EXT_QUERIES.update(
    {
        "ext_mutual_information": ext_mutual_information,
        "ext_survival_curve": ext_survival_curve,
    }
)
EXT_ORACLES.update(
    {
        "ext_mutual_information": EXT_MUTUAL_INFORMATION_SQL,
        "ext_survival_curve": EXT_SURVIVAL_SQL,
    }
)


# --- round-3 wave: dataset card, quantile norm, negatives, SQL surface --------


def ext_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card / datasheet for the document corpus: sizes,
    language/source cardinalities, token totals and median, exact-dup
    rate — the summary block a dataset release publishes, produced in
    one scan plus O(1) aggregates.

    Scale shape: a single partial-aggregable pass (counts, sums,
    distincts over scan-fused row-local projections); the token median
    is the only percentile and runs over the collapsed per-doc token
    counts."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).cast("binary")
    )
    base = docs.select(
        toks.alias("t"),
        F.octet_length("text").alias("b"),
        h.alias("h"),
        "lang",
        "source",
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("t").alias("total_tokens"),
        F.sum("b").alias("total_bytes"),
        F.round(F.avg("t"), 4).alias("mean_doc_tokens"),
        F.expr("percentile(t, 0.5)").alias("median_doc_tokens"),
        F.round(
            F.lit(1.0)
            - F.count_distinct("h").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )


EXT_DATASET_CARD_SQL = r"""
WITH base AS (
  SELECT LEN(string_split_regex(TRIM(text), '\s+')) AS t,
         strlen(text) AS b,
         md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS h,
         lang, source
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(t) AS BIGINT) AS total_tokens,
       CAST(SUM(b) AS BIGINT) AS total_bytes,
       ROUND(AVG(t), 4) AS mean_doc_tokens,
       quantile_cont(t, 0.5) AS median_doc_tokens,
       ROUND(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6) AS exact_dup_rate
FROM base
"""


def ext_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of a per-document signal
    (length) WITHIN each language, via the X186 HDR integer-bucket CDF:
    each doc maps to (docs in smaller buckets + half its own bucket) /
    group size — a [0,1] percentile comparable across languages, the
    rank-normalization a mixing pipeline uses where z-scores break on
    heavy tails.

    Scale shape: this is how per-group percent_rank survives LOW-
    cardinality groups at 100 TB — no Window.partitionBy(lang) single-
    task sort; one (lang x bucket) exchange builds the CDF, which
    BROADCASTS back onto the rows (bucket granularity bounds the rank
    error at the bucket mass, same trade as X186)."""
    docs = _t(spark, sf_dir, "documents")
    scale_expr = (
        "CAST(POW(2.0, CAST(GREATEST(LENGTH(CONV(n_chars, 10, 2)) - 4, 0) AS DOUBLE))"
        " AS LONG)"
    )
    bucketed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.expr(f"n_chars div {scale_expr}") * F.expr(scale_expr)).alias("blo"),
    )
    cells = bucketed.groupBy("lang", "blo").agg(F.count(F.lit(1)).alias("c"))
    w_prev = (
        Window.partitionBy("lang")
        .orderBy("blo")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.partitionBy("lang")
    cdf = cells.select(
        "lang",
        "blo",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).alias("below"),
        F.col("c").alias("inb"),
        F.sum("c").over(tot).alias("n"),
    )
    return (
        bucketed.join(F.broadcast(cdf), ["lang", "blo"])
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                (F.col("below") + 0.5 * F.col("inb")) / F.col("n"), 6
            ).alias("pct"),
        )
        .orderBy("doc_id")
    )


EXT_QUANTILE_NORM_SQL = r"""
WITH bucketed AS (
  SELECT doc_id, lang, n_chars,
         (n_chars // CAST(POW(2.0, GREATEST(LENGTH(bin(n_chars)) - 4, 0)) AS BIGINT))
           * CAST(POW(2.0, GREATEST(LENGTH(bin(n_chars)) - 4, 0)) AS BIGINT) AS blo
  FROM documents
),
cells AS (
  SELECT lang, blo, CAST(COUNT(*) AS BIGINT) AS c
  FROM bucketed GROUP BY 1, 2
),
cdf AS (
  SELECT lang, blo,
         COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY blo
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
         c AS inb,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM cells
)
SELECT b.doc_id, b.lang, b.n_chars,
       ROUND((f.below + 0.5 * f.inb) / f.n, 6) AS pct
FROM bucketed b JOIN cdf f ON b.lang = f.lang AND b.blo = f.blo
ORDER BY b.doc_id
"""


def ext_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document pairs with the next 2 documents on its md5 hash ring —
    pseudo-random, reproducible, and collision-free negatives without
    any RNG state or driver-side shuffle (the pairing a contrastive
    embedding run needs to be identical across retries and engines).

    Scale shape: the ring is partitioned into 64 hash buckets, so the
    lead() windows sort ~n/64 rows per task (no global window); the
    last rows of each bucket get NULL negatives (~128 of them corpus-
    wide), mirrored exactly in the oracle."""
    from aircan_spark.ext.sampling import hash_bucket, shuffle_key

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ringed = docs.select(
        "doc_id",
        F.pmod(hash_bucket(F.col("doc_id"), seed=29), F.lit(64)).alias("bk"),
        shuffle_key(F.col("doc_id"), 29).alias("hk"),
    )
    w = Window.partitionBy("bk").orderBy("hk")
    return ringed.select(
        "doc_id",
        F.lead("doc_id", 1).over(w).alias("neg_id_1"),
        F.lead("doc_id", 2).over(w).alias("neg_id_2"),
    ).orderBy("doc_id")


EXT_NEGATIVE_PAIRS_SQL = r"""
WITH ringed AS (
  SELECT doc_id,
         (('0x' || SUBSTR(md5('29-' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          % 10000) % 64 AS bk,
         md5('29-' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
)
SELECT doc_id,
       LEAD(doc_id, 1) OVER (PARTITION BY bk ORDER BY hk) AS neg_id_1,
       LEAD(doc_id, 2) OVER (PARTITION BY bk ORDER BY hk) AS neg_id_2
FROM ringed ORDER BY doc_id
"""


_SQL_INTERFACE_QUERY = r"""
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,12)) AS STRING) AS revenue,
       CAST(RANK() OVER (
         PARTITION BY EXTRACT(YEAR FROM o_orderdate)
         ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) DESC,
                  n_name
       ) AS BIGINT) AS rnk
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY EXTRACT(YEAR FROM o_orderdate), n_name
ORDER BY yr, rnk
"""


def ext_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface (aircan_spark.sqlapi): yearly revenue per nation
    with an in-year rank, submitted as ANSI SQL TEXT through spark.sql
    over the registered views — and the SAME string is the DuckDB
    oracle, so the dialect-portable SQL path is zero-drift by
    construction. Catalyst gives the identical pushdown/broadcast plan
    the DataFrame registry gets (the revenue decimal discipline matches
    X68)."""
    from aircan_spark import sqlapi

    return sqlapi.sql(spark, sf_dir, _SQL_INTERFACE_QUERY)


EXT_QUERIES.update(
    {
        "ext_dataset_card": ext_dataset_card,
        "ext_quantile_norm": ext_quantile_norm,
        "ext_negative_pairs": ext_negative_pairs,
        "ext_sql_interface": ext_sql_interface,
    }
)
EXT_ORACLES.update(
    {
        "ext_dataset_card": EXT_DATASET_CARD_SQL,
        "ext_quantile_norm": EXT_QUANTILE_NORM_SQL,
        "ext_negative_pairs": EXT_NEGATIVE_PAIRS_SQL,
        "ext_sql_interface": _SQL_INTERFACE_QUERY,
    }
)


# --- round-3 wave: session mining + feature encodings -------------------------


def ext_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence within behavioral sessions (30-min gap
    sessionization): which activities happen TOGETHER in one sitting —
    the intra-session affinity matrix behind next-action models, on the
    same session definition as X78.

    Scale shape: session ids come from one per-user window (high-
    cardinality key); per-session distinct types collapse row-locally
    to sorted arrays whose pair expansion is an O(types^2)-bounded HOF
    (never a session-keyed self-join); one (type,type) exchange."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = ev.select(
        "user_id",
        "event_type",
        F.sum(
            F.when(
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(w)
                > 1800,
                1,
            ).otherwise(0)
        ).over(w).alias("sess"),
    )
    baskets = (
        sess.select("user_id", "sess", "event_type")
        .distinct()
        .groupBy("user_id", "sess")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    tcol = F.col("types")
    combos = F.flatten(
        F.transform(
            tcol,
            lambda x, i: F.transform(
                F.slice(tcol, i + 2, F.size(tcol)),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("type_a", "type_b")
    )


EXT_SESSION_COOCCURRENCE_SQL = r"""
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked
),
st AS (SELECT DISTINCT user_id, sess, event_type FROM sess)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM st a JOIN st b
  ON a.user_id = b.user_id AND a.sess = b.sess AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY type_a, type_b
"""


def ext_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed customer value: Σ order_total ·
    exp(-λ·days_before_horizon) with a 30-day half-life — the recency
    weighting behind churn/LTV features (yesterday's order counts ~30x
    a month-old one at this λ).

    Scale shape: row-local decay weights (scan-fused; the horizon is a
    broadcast scalar), one per-customer exchange."""
    orders = _t(spark, sf_dir, "orders")
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("hz"))
    lam = 0.0231049060186648  # ln(2)/30
    decayed = orders.crossJoin(F.broadcast(horizon)).select(
        "o_custkey",
        (
            F.col("o_totalprice")
            * F.exp(
                -F.lit(lam)
                * F.datediff(F.col("hz"), F.to_date("o_orderdate")).cast("double")
            )
        ).alias("dv"),
    )
    return (
        decayed.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("dv"), 4).alias("decayed_value"),
        )
        .orderBy("o_custkey")
    )


EXT_DECAY_FEATURES_SQL = r"""
WITH hz AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS hz FROM orders)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice
                 * EXP(-0.0231049060186648
                       * date_diff('day', CAST(o_orderdate AS DATE), hz))), 4)
         AS decayed_value
FROM orders CROSS JOIN hz
GROUP BY o_custkey ORDER BY o_custkey
"""


def ext_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment against order
    value: each order's segment encodes as the smoothed mean of OTHER
    orders' totals in the segment ((sum − own + k·global)/(n − 1 + k),
    k = 10) — the leakage-safe categorical encoding a tabular-ML
    pipeline ships (naive per-category means leak the row's own
    target).

    Scale shape: per-segment exact decimal sums and the global scalar
    broadcast; the encode itself is a row-local expression — rows never
    shuffle. Exact decimal sums keep the subtraction (sum − own) free
    of float cancellation across engines."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("tp"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "c_mktsegment", "tp")
    seg = base.groupBy("c_mktsegment").agg(
        F.sum("tp").alias("seg_sum"), F.count(F.lit(1)).alias("seg_n")
    )
    glob = base.agg(
        (F.sum("tp").cast("double") / F.count(F.lit(1))).alias("g_mean")
    )
    return (
        base.join(F.broadcast(seg), "c_mktsegment")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.round(
                (
                    (F.col("seg_sum") - F.col("tp")).cast("double")
                    + 10.0 * F.col("g_mean")
                )
                / (F.col("seg_n") - 1 + 10).cast("double"),
                6,
            ).alias("loo_encoded"),
        )
        .orderBy("o_orderkey")
    )


EXT_TARGET_ENCODING_SQL = r"""
WITH base AS (
  SELECT o_orderkey, c_mktsegment,
         CAST(o_totalprice AS DECIMAL(18,2)) AS tp
  FROM orders JOIN customer ON o_custkey = c_custkey
),
seg AS (
  SELECT c_mktsegment, CAST(SUM(tp) AS DECIMAL(38,2)) AS seg_sum,
         CAST(COUNT(*) AS BIGINT) AS seg_n
  FROM base GROUP BY 1
),
gstats AS (
  SELECT CAST(SUM(tp) AS DOUBLE) / COUNT(*) AS g_mean FROM base
)
SELECT b.o_orderkey, b.c_mktsegment,
       ROUND((CAST(s.seg_sum - b.tp AS DOUBLE) + 10.0 * g.g_mean)
             / (s.seg_n - 1 + 10), 6) AS loo_encoded
FROM base b JOIN seg s ON b.c_mktsegment = s.c_mktsegment
CROSS JOIN gstats g
ORDER BY o_orderkey
"""


EXT_QUERIES.update(
    {
        "ext_session_cooccurrence": ext_session_cooccurrence,
        "ext_decay_features": ext_decay_features,
        "ext_target_encoding": ext_target_encoding,
    }
)
EXT_ORACLES.update(
    {
        "ext_session_cooccurrence": EXT_SESSION_COOCCURRENCE_SQL,
        "ext_decay_features": EXT_DECAY_FEATURES_SQL,
        "ext_target_encoding": EXT_TARGET_ENCODING_SQL,
    }
)


# --- round-3 wave: label audits, weighted stats, collaborative filtering ------


def ext_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content language audit: per source, how often the
    declared `lang` field disagrees with the X11 content-based language
    id — the labeling-error detector run before trusting corpus
    metadata for mixture weighting ('und' predictions are counted
    separately, not as mismatches).

    Scale shape: row-local marker scoring fused into the scan; one
    O(sources) exchange."""
    docs = _t(spark, sf_dir, "documents")
    scored = text.lang_id(docs).select(
        "source",
        "lang",
        "pred_lang",
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("pred_lang") != "und")
                    & (F.col("pred_lang") != F.col("lang")),
                    1,
                ).otherwise(0)
            ).alias("n_mismatch"),
            F.sum(F.when(F.col("pred_lang") == "und", 1).otherwise(0)).alias(
                "n_undetermined"
            ),
        )
        .withColumn(
            "mismatch_rate",
            F.round(F.col("n_mismatch") / F.col("n_docs"), 6),
        )
        .orderBy("source")
    )


EXT_LANG_MISMATCH_SQL = r"""
WITH scored AS (
  SELECT source, lang,
         LEN(regexp_extract_all(LOWER(text), '\b(der|und|das|nicht)\b')) AS score_de,
         LEN(regexp_extract_all(LOWER(text), '\b(the|and|of|is)\b')) AS score_en,
         LEN(regexp_extract_all(LOWER(text), '\b(el|los|una|que)\b')) AS score_es,
         LEN(regexp_extract_all(LOWER(text), '\b(le|et|les|dans)\b')) AS score_fr
  FROM documents
),
pred AS (
  SELECT source, lang,
         CASE
           WHEN GREATEST(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
           WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr) THEN 'de'
           WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr) THEN 'en'
           WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr) THEN 'es'
           ELSE 'fr'
         END AS pred_lang
  FROM scored
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pred_lang <> 'und' AND pred_lang <> lang
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(SUM(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_undetermined,
       ROUND(CAST(SUM(CASE WHEN pred_lang <> 'und' AND pred_lang <> lang
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS mismatch_rate
FROM pred GROUP BY source ORDER BY source
"""


def ext_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per brand: the price point at
    which half the shipped VOLUME sits below — the weighted-percentile
    statistic plain median gets wrong whenever weights are skewed
    (pricing/abundance analyses).

    Scale shape: (brand, price) cells collapse first (one exchange),
    then the cumulative-weight walk runs per brand over the collapsed
    O(distinct prices) axis — a per-brand window on a HIGH-cardinality
    partition key with bounded rows per group, not a data-row sort.
    Weighted median = smallest price whose cumulative weight reaches
    half the brand total (integer compare: 2·cum >= total)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("iq"),
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2).alias("unit"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "unit")
        .agg(F.sum("iq").alias("wq"))
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy("unit")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("p_brand")
    walked = cells.select(
        "p_brand",
        "unit",
        F.sum("wq").over(w_cum).alias("cum"),
        F.sum("wq").over(tot).alias("total"),
    )
    return (
        walked.filter(F.lit(2) * F.col("cum") >= F.col("total"))
        .groupBy("p_brand")
        .agg(
            F.min("unit").alias("weighted_median_unit_price"),
            F.max("total").alias("total_qty_cents"),
        )
        .orderBy("p_brand")
    )


EXT_WEIGHTED_MEDIAN_SQL = r"""
WITH li AS (
  SELECT l_partkey, CAST(ROUND(l_quantity * 100) AS BIGINT) AS iq,
         ROUND(l_extendedprice / l_quantity, 2) AS unit
  FROM lineitem
),
cells AS (
  SELECT p.p_brand, li.unit, CAST(SUM(li.iq) AS BIGINT) AS wq
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
walked AS (
  SELECT p_brand, unit,
         SUM(wq) OVER (PARTITION BY p_brand ORDER BY unit
                       ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wq) OVER (PARTITION BY p_brand) AS total
  FROM cells
)
SELECT p_brand, MIN(unit) AS weighted_median_unit_price,
       CAST(MAX(total) AS BIGINT) AS total_qty_cents
FROM walked WHERE 2 * cum >= total
GROUP BY p_brand ORDER BY p_brand
"""


def ext_user_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user collaborative-filtering neighbors: cosine similarity
    over shared event-type interaction sets, top-3 neighbors per user —
    the bipartite-projection step of a memory-based recommender
    (users who do the same things).

    Scale guard (the hot-item hazard fixed): a naive type-keyed
    self-join is O(users^2 / types) because every popular item pairs
    all its users. Instead, candidate generation uses CAPPED POSTING
    LISTS — per event_type only the ``_NEIGHBOR_ANCHOR_CAP`` users with
    the smallest md5(user_id) act as candidate neighbors ("anchors"),
    the same hot-key bounding idea as ``dedup.containment_pairs``'s
    ``max_doc_freq`` guard, but down-sampling instead of dropping so the
    item still contributes signal. Per-key fan-in is <= cap and total
    candidates are O(users * types * cap) — LINEAR in users, not
    quadratic — while every user still receives neighbors (drawn from
    the anchor sample; production CF does exactly this with capped
    inverted lists). n_common/cosine stay EXACT for surviving pairs:
    scoring re-joins the full per-user sets, only candidate generation
    is sampled. The cap (128) is active at sf0.01+ (150+ users/type),
    so the driver's oracle check exercises the guarded semantics. The
    head is a per-user WindowGroupLimit, never a global sort."""
    ev = _t(spark, sf_dir, "events")
    ui = ev.select("user_id", "event_type").distinct()
    deg = ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
    w_anchor = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("user_id").cast("string")), F.col("user_id")
    )
    anchors = (
        ui.withColumn("rn", F.row_number().over(w_anchor))
        .filter(F.col("rn") <= _NEIGHBOR_ANCHOR_CAP)
        .select("event_type", F.col("user_id").alias("ub"))
    )
    cand = (
        ui.select(F.col("user_id").alias("ua"), "event_type")
        .join(anchors, "event_type")
        .filter(F.col("ua") != F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    x = ui.select(F.col("user_id").alias("ua"), "event_type")
    y = ui.select(F.col("user_id").alias("ub"), "event_type")
    common = (
        cand.join(x, "ua")
        .join(y, ["ub", "event_type"])
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        common.join(
            F.broadcast(deg.select(F.col("user_id").alias("ua"), F.col("deg").alias("da"))),
            "ua",
        )
        .join(
            F.broadcast(deg.select(F.col("user_id").alias("ub"), F.col("deg").alias("db"))),
            "ub",
        )
        .select(
            "ua",
            "ub",
            "n_common",
            F.round(
                F.col("n_common") / F.sqrt(F.col("da").cast("double") * F.col("db")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("ua").orderBy(
        F.col("cosine").desc(), F.col("ub")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("ua").alias("user_id"),
            F.col("ub").alias("neighbor_id"),
            "n_common",
            "cosine",
            "rank",
        )
        .orderBy("user_id", "rank")
    )


#: Per-item candidate-neighbor sample size for ext_user_neighbors.
#: Bounds the pair join's per-key fan-in regardless of item popularity.
_NEIGHBOR_ANCHOR_CAP = 128


EXT_USER_NEIGHBORS_SQL = r"""
WITH ui AS (SELECT DISTINCT user_id, event_type FROM events),
deg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS deg FROM ui GROUP BY 1),
anchors AS (
  SELECT event_type, user_id AS ub FROM (
    SELECT event_type, user_id,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
    FROM ui) t
  WHERE rn <= 128
),
cand AS (
  SELECT DISTINCT u.user_id AS ua, a.ub
  FROM ui u JOIN anchors a ON u.event_type = a.event_type
  WHERE u.user_id <> a.ub
),
common AS (
  SELECT c.ua, c.ub, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN ui x ON x.user_id = c.ua
  JOIN ui y ON y.user_id = c.ub AND y.event_type = x.event_type
  GROUP BY 1, 2
),
scored AS (
  SELECT c.ua, c.ub, c.n_common,
         ROUND(c.n_common / SQRT(CAST(da.deg AS DOUBLE) * db.deg), 6) AS cosine
  FROM common c
  JOIN deg da ON c.ua = da.user_id
  JOIN deg db ON c.ub = db.user_id
),
ranked AS (
  SELECT ua, ub, n_common, cosine,
         ROW_NUMBER() OVER (PARTITION BY ua ORDER BY cosine DESC, ub) AS rank
  FROM scored
)
SELECT ua AS user_id, ub AS neighbor_id, n_common, cosine,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
ORDER BY user_id, rank
"""

def ext_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn label construction: users active in the observation window
    (first 20 days) labelled churned when absent from the outcome
    window (last 10 days), with observation-window activity features
    attached — the label+feature frame a churn model trains on,
    leakage-free by construction (features never read the outcome
    window).

    Scale shape: one conditional aggregation per user over a single
    scan; window boundaries are literals pushed to the scan."""
    cutoff = F.lit("2024-01-21").cast("timestamp")
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("n_obs"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("n_out"),
        F.sum(
            F.when(
                (F.col("ts") < cutoff) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("n_obs_purchases"),
        F.round(
            F.sum(F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0)), 2
        ).alias("obs_value"),
    )
    return (
        per.filter(F.col("n_obs") > 0)
        .select(
            "user_id",
            "n_obs",
            "n_obs_purchases",
            "obs_value",
            (F.col("n_out") == 0).alias("churned"),
        )
        .orderBy("user_id")
    )


EXT_CHURN_LABELS_SQL = r"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_obs_purchases,
         ROUND(SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN value ELSE 0 END), 2) AS obs_value
  FROM events GROUP BY 1
)
SELECT user_id, n_obs, n_obs_purchases, obs_value, n_out = 0 AS churned
FROM per WHERE n_obs > 0 ORDER BY user_id
"""


EXT_QUERIES.update(
    {
        "ext_lang_mismatch": ext_lang_mismatch,
        "ext_weighted_median": ext_weighted_median,
        "ext_user_neighbors": ext_user_neighbors,
        "ext_churn_labels": ext_churn_labels,
    }
)
EXT_ORACLES.update(
    {
        "ext_lang_mismatch": EXT_LANG_MISMATCH_SQL,
        "ext_weighted_median": EXT_WEIGHTED_MEDIAN_SQL,
        "ext_user_neighbors": EXT_USER_NEIGHBORS_SQL,
        "ext_churn_labels": EXT_CHURN_LABELS_SQL,
    }
)


# --- round-3 wave: sequence mining, regression, experimentation ---------------


def ext_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 frequent 3-step behavioral paths (ordered event-type
    trigrams per user) — the sequence-mining upgrade of the X108
    transition matrix: bigrams say what follows what, trigrams surface
    whole flows (view>click>purchase vs view>click>error).

    Scale shape: each user's ordered type array builds from ONE
    (user)-keyed sort (struct array_sort — no per-row windows), trigram
    shingles expand row-locally, one (path) exchange, k-bounded head."""
    ev = _t(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.col("event_type")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["event_type"]
            ).alias("types")
        )
    )
    t = F.col("types")
    idx = F.sequence(F.lit(0), F.size(t) - 3)
    tri = F.when(
        F.size(t) >= 3,
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, 3), ">")),
    ).otherwise(F.array().cast("array<string>"))
    return (
        seqs.select(F.explode(tri).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


EXT_TRIGRAM_PATHS_SQL = r"""
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
),
tri AS (
  SELECT a.event_type || '>' || b.event_type || '>' || c.event_type AS path
  FROM r a
  JOIN r b ON a.user_id = b.user_id AND b.i = a.i + 1
  JOIN r c ON a.user_id = c.user_id AND c.i = a.i + 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM tri GROUP BY path ORDER BY n DESC, path LIMIT 20
"""


def ext_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand curve per brand: closed-form OLS slope of
    ln(quantity) on ln(unit price) — the price-elasticity estimate, as
    a pure aggregation (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²); no
    iterative solver, merges like any moment sketch).

    Scale shape: row-local log projections fused into the scan, one
    per-brand exchange carrying five partial-aggregable sums."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.log(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias("x"),
        F.log(F.col("l_quantity")).alias("y"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("elasticity"),
        # round 4: the slope's ulp-level cancellation noise is amplified
        # by sx (~1e-6 at round-6 — measured cross-engine straddle)
        F.round(intercept, 4).alias("intercept"),
    ).orderBy("p_brand")


EXT_PRICE_ELASTICITY_SQL = r"""
WITH li AS (
  SELECT l_partkey,
         LN(ROUND(l_extendedprice / l_quantity, 2)) AS x,
         LN(l_quantity) AS y
  FROM lineitem
),
agg AS (
  SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(li.x) AS sx, SUM(li.y) AS sy,
         SUM(li.x * li.y) AS sxy, SUM(li.x * li.x) AS sxx
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
         AS intercept
FROM agg ORDER BY p_brand
"""


def ext_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users assigned to arms by portable md5
    parity (the same subset-stable assignment as the X34 split),
    compared on purchase conversion with the two-proportion pooled
    z-statistic and a |z| > 1.96 significance flag — the
    experimentation primitive, RNG-free and replayable.

    Scale shape: per-user conversion collapses in one exchange; arm
    aggregates are two rows; the z arithmetic is exact-integer-count
    driven (deterministic across engines)."""
    from aircan_spark.ext.sampling import hash_bucket

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300.0), 1
            ).otherwise(0)
        ).alias("converted")
    )
    armed = per_user.select(
        F.pmod(hash_bucket(F.col("user_id"), seed=17), F.lit(2)).alias("arm"),
        "converted",
    )
    arms = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("c_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("c_b")
    )
    j = a.crossJoin(b)
    pa = F.col("c_a").cast("double") / F.col("n_a")
    pb = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    denom = F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # degenerate arms (0% or 100% pooled conversion): z undefined -> NULL
    z = F.when(denom > 0.0, (pa - pb) / denom)
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_stat"),
        F.coalesce(F.abs(z) > 1.959964, F.lit(False)).alias("significant"),
    )


EXT_AB_TEST_SQL = r"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 300.0
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
armed AS (
  SELECT (('0x' || SUBSTR(md5('17-' || CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
          % 10000) % 2 AS arm,
         converted
  FROM per_user
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM armed GROUP BY 1
),
j AS (
  SELECT a.n AS n_a, a.conv AS c_a, b.n AS n_b, b.conv AS c_b
  FROM (SELECT * FROM arms WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
)
SELECT n_a, c_a, n_b, c_b,
       ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / NULLIF(SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0.0), 4) AS z_stat,
       COALESCE(ABS((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
           / NULLIF(SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)), 0.0)) > 1.959964, FALSE) AS significant
FROM j
"""


EXT_QUERIES.update(
    {
        "ext_trigram_paths": ext_trigram_paths,
        "ext_price_elasticity": ext_price_elasticity,
        "ext_ab_test": ext_ab_test,
    }
)
EXT_ORACLES.update(
    {
        "ext_trigram_paths": EXT_TRIGRAM_PATHS_SQL,
        "ext_price_elasticity": EXT_PRICE_ELASTICITY_SQL,
        "ext_ab_test": EXT_AB_TEST_SQL,
    }
)


def ext_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most similar document pairs by sparse TF-IDF cosine — the
    classic IR similarity join, term-at-a-time: pairs accumulate dot
    products only through SHARED terms (an inverted-index join), so
    the n² dense-pair space is never materialized.

    Scale shape: the hot-term guard caps the posting fan-out exactly
    like X2's shingle guard (stopword postings are the quadratic
    hazard); its bound scales with the corpus — max(64, 5% of docs) —
    so it prunes true stopwords at any size instead of emptying the
    index once every mid-frequency term passes a fixed cutoff (the
    failure the fixed-64 form hit at sf0.1). Norms broadcast; the head
    is k-bounded. Weights round to 6 BEFORE pairing so ranking can't
    straddle engine ulp."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    wts = (
        text.tf_idf(docs)
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("doc_freq")
            <= F.greatest(F.lit(64), F.floor(F.col("nd") / 20))
        )
        .select("doc_id", "word", "tf_idf")
    )
    norms = wts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf_idf") * F.col("tf_idf"))).alias("nrm")
    )
    a = wts.select(F.col("doc_id").alias("id_a"), "word", F.col("tf_idf").alias("wa"))
    b = wts.select(F.col("doc_id").alias("id_b"), "word", F.col("tf_idf").alias("wb"))
    dots = (
        a.join(b, "word")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"), F.count(F.lit(1)).alias("n_shared_terms"))
    )
    return (
        dots.join(F.broadcast(norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))), "id_a")
        .join(F.broadcast(norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_terms",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(50)
    )


EXT_TFIDF_COSINE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
wts AS (
  SELECT tf.doc_id, tf.word,
         ROUND(tf.tf * (LN((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0), 6)
           AS tf_idf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
  WHERE dfreq.doc_freq <= GREATEST(64, n.n_docs // 20)
),
norms AS (
  SELECT doc_id, SQRT(SUM(tf_idf * tf_idf)) AS nrm FROM wts GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         SUM(a.tf_idf * b.tf_idf) AS dot,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms
  FROM wts a JOIN wts b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.id_a, d.id_b, d.n_shared_terms,
       ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON d.id_a = na.doc_id
JOIN norms nb ON d.id_b = nb.doc_id
ORDER BY cosine DESC, id_a, id_b LIMIT 50
"""


def ext_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: histogram of connected-
    component sizes from the X41 dedup grouping — the dedup-health
    report (a heavy tail of giant clusters means the similarity
    threshold is too loose or a template is flooding the corpus).

    Scale shape: CC runs over the tiny pair set; sizes and the
    histogram are two O(components) aggregations."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    groups = dedup.dedup_groups(docs, pairs.select("id_a", "id_b"))
    sizes = groups.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


EXT_CLUSTER_SIZE_HISTOGRAM_SQL = r"""
WITH RECURSIVE
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE ROUND(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.3
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
),
lab AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
csize AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM lab GROUP BY 1
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM csize GROUP BY cluster_size ORDER BY cluster_size
"""


EXT_QUERIES.update(
    {
        "ext_tfidf_cosine_pairs": ext_tfidf_cosine_pairs,
        "ext_cluster_size_histogram": ext_cluster_size_histogram,
    }
)
EXT_ORACLES.update(
    {
        "ext_tfidf_cosine_pairs": EXT_TFIDF_COSINE_SQL,
        "ext_cluster_size_histogram": EXT_CLUSTER_SIZE_HISTOGRAM_SQL,
    }
)


# --- round-3 wave: statistical audits + forecast baselines --------------------


def ext_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected leading-digit shares plus the chi-square statistic — the
    fabricated-data / data-entry-anomaly screen auditors run on
    monetary columns (natural multi-scale amounts follow
    log10(1 + 1/d)).

    Scale shape: the leading digit is a row-local string projection
    (no log needed — first char of the integer part), one 9-cell
    exchange, expectation attached as a literal map."""
    orders = _t(spark, sf_dir, "orders")
    d = F.substring(F.floor("o_totalprice").cast("string"), 1, 1).cast("int")
    cells = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = cells.agg(F.sum("n").alias("tot"))
    import math

    exp_arr = F.array(
        *[F.lit(math.log10(1.0 + 1.0 / dd)) for dd in range(1, 10)]
    )
    joined = cells.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("observed_share"),
        F.round(F.element_at(exp_arr, F.col("digit")), 6).alias("benford_share"),
        (
            F.pow(
                F.col("n") - F.col("tot") * F.element_at(exp_arr, F.col("digit")),
                2.0,
            )
            / (F.col("tot") * F.element_at(exp_arr, F.col("digit")))
        ).alias("__chi"),
    )
    return joined.select(
        "digit",
        "n",
        "observed_share",
        "benford_share",
        F.round(F.sum("__chi").over(Window.partitionBy()), 4).alias("chi_square_total"),
    ).orderBy("digit")


EXT_BENFORD_SQL = r"""
WITH cells AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM cells),
j AS (
  SELECT digit, n,
         ROUND(CAST(n AS DOUBLE) / tot, 6) AS observed_share,
         ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share,
         POW(n - tot * LOG10(1.0 + 1.0 / digit), 2)
           / (tot * LOG10(1.0 + 1.0 / digit)) AS chi
  FROM cells CROSS JOIN tot
)
SELECT digit, n, observed_share, benford_share,
       ROUND(SUM(chi) OVER (), 4) AS chi_square_total
FROM j ORDER BY digit
"""


def ext_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline evaluation per event type: MAE
    of the week-ago forecast (x̂_t = x_{t-7}) and MASE (scaled by the
    one-step naive error) over the daily totals — the accuracy floor
    any real forecast model must beat, and the standard way to compare
    error across series of different magnitude.

    Scale shape: raw events collapse to the O(days x types) grid
    (integer cents, exact); the lag features are windows over that tiny
    axis per type."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("iv").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "x",
        F.lag("x", 7).over(w).alias("x7"),
        F.lag("x", 1).over(w).alias("x1"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("x7").isNotNull(), 1)).alias("n_scored_days"),
            F.round(
                F.avg(F.abs(F.col("x") - F.col("x7")).cast("double")) / 100.0, 4
            ).alias("mae_seasonal_naive"),
            F.round(
                F.avg(F.abs(F.col("x") - F.col("x7")).cast("double"))
                / F.avg(F.abs(F.col("x") - F.col("x1")).cast("double")),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


EXT_FORECAST_ERROR_SQL = r"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, x,
         LAG(x, 7) OVER w AS x7, LAG(x, 1) OVER w AS x1
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type,
       CAST(COUNT(CASE WHEN x7 IS NOT NULL THEN 1 END) AS BIGINT) AS n_scored_days,
       ROUND(AVG(CAST(ABS(x - x7) AS DOUBLE)) / 100.0, 4) AS mae_seasonal_naive,
       ROUND(AVG(CAST(ABS(x - x7) AS DOUBLE)) / AVG(CAST(ABS(x - x1) AS DOUBLE)), 6)
         AS mase
FROM lagged GROUP BY event_type ORDER BY event_type
"""


def ext_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-regularity signal per user: Shannon entropy of the
    hour-of-day activity distribution plus the modal hour — low entropy
    = habitual users (bot-like when extreme), high = diffuse activity;
    a standard fraud/segmentation feature.

    Scale shape: one (user x 24-hour) exchange; entropy folds the
    O(users x 24) cells per user; argmax modal hour via MAX-of-struct
    (no per-user window sort)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.hour("ts").alias("h")
    )
    cells = ev.groupBy("user_id", "h").agg(F.count(F.lit(1)).alias("c"))
    per = cells.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            (F.col("c").cast("double"))
            * F.log(F.col("c").cast("double"))
        ).alias("clogc"),
        F.max(F.struct(F.col("c"), (-F.col("h")).alias("nh"))).alias("m"),
    )
    # H = ln(n) - (1/n)·Σ c·ln(c) — exact regrouping of -Σ p·ln p
    return per.select(
        "user_id",
        "n",
        F.round(
            F.log(F.col("n").cast("double"))
            - F.col("clogc") / F.col("n"),
            6,
        ).alias("hour_entropy"),
        (-F.col("m.nh")).alias("modal_hour"),
    ).orderBy("user_id")


EXT_ACTIVITY_ENTROPY_SQL = r"""
WITH cells AS (
  SELECT user_id, EXTRACT(HOUR FROM ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
per AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(c AS DOUBLE) * LN(c)) AS clogc,
         MAX({'c': c, 'nh': -h}) AS m
  FROM cells GROUP BY 1
)
SELECT user_id, n,
       ROUND(LN(n) - clogc / n, 6) AS hour_entropy,
       CAST(-(m).nh AS BIGINT) AS modal_hour
FROM per ORDER BY user_id
"""


EXT_QUERIES.update(
    {
        "ext_benford_audit": ext_benford_audit,
        "ext_forecast_error": ext_forecast_error,
        "ext_activity_entropy": ext_activity_entropy,
    }
)
EXT_ORACLES.update(
    {
        "ext_benford_audit": EXT_BENFORD_SQL,
        "ext_forecast_error": EXT_FORECAST_ERROR_SQL,
        "ext_activity_entropy": EXT_ACTIVITY_ENTROPY_SQL,
    }
)


# --- round-3 wave: corpus budget/diagnostic quick wins ------------------------


def ext_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup token-budget report per source: total tokens vs tokens
    after exact dedup (each distinct content counted once) and the
    fraction saved — the number that justifies running dedup before a
    training run (tokens are the currency).

    Scale shape: one (source, hash) collapse carrying token counts
    (identical content has identical counts, so MAX per group is
    exact), then an O(sources) rollup."""
    docs = _t(spark, sf_dir, "documents")
    t = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).cast("binary")
    )
    per_hash = (
        docs.select("source", h.alias("h"), t.alias("t"))
        .groupBy("source", "h")
        .agg(F.sum("t").alias("t_all"), F.max("t").alias("t_once"))
    )
    return (
        per_hash.groupBy("source")
        .agg(
            F.sum("t_all").alias("total_tokens"),
            F.sum("t_once").alias("unique_tokens"),
        )
        .withColumn(
            "pct_saved",
            F.round(
                F.lit(1.0)
                - F.col("unique_tokens").cast("double") / F.col("total_tokens"),
                6,
            ),
        )
        .orderBy("source")
    )


EXT_TOKEN_BUDGET_SQL = r"""
WITH per_hash AS (
  SELECT source,
         md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS h,
         CAST(SUM(LEN(string_split_regex(TRIM(text), '\s+'))) AS BIGINT) AS t_all,
         CAST(MAX(LEN(string_split_regex(TRIM(text), '\s+'))) AS BIGINT) AS t_once
  FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(t_all) AS BIGINT) AS total_tokens,
       CAST(SUM(t_once) AS BIGINT) AS unique_tokens,
       ROUND(1.0 - CAST(SUM(t_once) AS DOUBLE) / SUM(t_all), 6) AS pct_saved
FROM per_hash GROUP BY source ORDER BY source
"""


def ext_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full declared-vs-predicted language confusion matrix (the X206
    mismatch audit's detail view): counts per (metadata lang, content
    prediction) cell, diagonal = agreement. One row-local scoring pass,
    one O(langs^2) exchange."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.lang_id(docs)
        .groupBy(F.col("lang").alias("declared"), F.col("pred_lang").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("declared", "predicted")
    )


EXT_LANG_CONFUSION_SQL = r"""
WITH scored AS (
  SELECT lang,
         LEN(regexp_extract_all(LOWER(text), '\b(der|und|das|nicht)\b')) AS score_de,
         LEN(regexp_extract_all(LOWER(text), '\b(the|and|of|is)\b')) AS score_en,
         LEN(regexp_extract_all(LOWER(text), '\b(el|los|una|que)\b')) AS score_es,
         LEN(regexp_extract_all(LOWER(text), '\b(le|et|les|dans)\b')) AS score_fr
  FROM documents
)
SELECT lang AS declared,
       CASE
         WHEN GREATEST(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
         WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr) THEN 'de'
         WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr) THEN 'en'
         WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr) THEN 'es'
         ELSE 'fr'
       END AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2 ORDER BY declared, predicted
"""


def ext_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness: events in the busiest minute vs the mean
    over active minutes — the rate-anomaly/bot signal (humans are
    bursty up to a point; scripted traffic pins the ratio).

    Scale shape: raw events collapse to (user, minute) in one exchange;
    the per-user ratio folds the collapsed frame."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    )
    per_min = ev.groupBy("user_id", "m").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_min.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_active_minutes"),
            F.max("c").alias("peak_per_minute"),
            F.round(
                F.max("c").cast("double")
                * F.count(F.lit(1))
                / F.sum("c"),
                4,
            ).alias("burst_ratio"),
        )
        .orderBy("user_id")
    )


EXT_BURST_DETECTION_SQL = r"""
WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS m, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_active_minutes,
       CAST(MAX(c) AS BIGINT) AS peak_per_minute,
       ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 4) AS burst_ratio
FROM per_min GROUP BY user_id ORDER BY user_id
"""


def ext_case_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capitalization-format quality signals per document: ALL-CAPS
    word count, TitleCase word count, and the uppercase share of
    letters — shouting/headline/boilerplate indicators in the
    Gopher-rule family. Row-local regexp counting, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    letters = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]")), F.lit(1)
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\b[A-Z]{2,}\b")).alias("n_allcaps_words"),
        F.regexp_count(F.col("text"), F.lit(r"\b[A-Z][a-z]+\b")).alias("n_titlecase_words"),
        F.round(
            F.regexp_count(F.col("text"), F.lit(r"[A-Z]")).cast("double") / letters,
            6,
        ).alias("upper_ratio"),
    ).orderBy("doc_id")


EXT_CASE_SIGNALS_SQL = r"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS n_allcaps_words,
       LEN(regexp_extract_all(text, '\b[A-Z][a-z]+\b')) AS n_titlecase_words,
       ROUND(CAST(LEN(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
             / GREATEST(LEN(regexp_extract_all(text, '[A-Za-z]')), 1), 6)
         AS upper_ratio
FROM documents ORDER BY doc_id
"""


def ext_cross_source_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-feed duplication matrix: for every source pair, how many
    distinct normalized contents they SHARE — the crawl-overlap
    diagnosis (two feeds mirroring each other waste budget and skew
    mixtures; the X129 cross-language audit's source-axis sibling).

    Scale shape: contents collapse to a hash -> sorted-source-set
    inverted index; pair expansion is row-local (bounded by the feed
    count), one O(sources^2) exchange."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).cast("binary")
    )
    idx = (
        docs.select(h.alias("h"), "source")
        .distinct()
        .groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") > 1)
    )
    srcs = F.col("srcs")
    combos = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + 2, F.size(srcs)),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    return (
        idx.select(F.explode(combos).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_contents"))
        .orderBy("source_a", "source_b")
    )


EXT_CROSS_SOURCE_DUPES_SQL = r"""
WITH sh AS (
  SELECT DISTINCT md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS h,
         source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_contents
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2 ORDER BY source_a, source_b
"""


EXT_QUERIES.update(
    {
        "ext_token_budget": ext_token_budget,
        "ext_lang_confusion": ext_lang_confusion,
        "ext_burst_detection": ext_burst_detection,
        "ext_case_signals": ext_case_signals,
        "ext_cross_source_dupes": ext_cross_source_dupes,
    }
)
EXT_ORACLES.update(
    {
        "ext_token_budget": EXT_TOKEN_BUDGET_SQL,
        "ext_lang_confusion": EXT_LANG_CONFUSION_SQL,
        "ext_burst_detection": EXT_BURST_DETECTION_SQL,
        "ext_case_signals": EXT_CASE_SIGNALS_SQL,
        "ext_cross_source_dupes": EXT_CROSS_SOURCE_DUPES_SQL,
    }
)


# --- round-3 wave: model-eval + sampling-theory classics ----------------------


def ext_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality strength per event type: the share of daily-
    total variance explained by day-of-week (ANOVA R² = SS_between /
    SS_total over the day axis) — decides whether a forecast needs the
    weekly component the X217 seasonal-naive baseline assumes.

    Scale shape: data collapses to O(days x types) exact-cent totals;
    both sums of squares derive from that grid and its 7-row dow means.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("iv").alias("x"))
    daily = daily.withColumn(
        "dow", ((F.dayofweek("day") + F.lit(5)) % 7) + 1
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")).alias("sxx"),
    )
    d = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("x").alias("sd")
    )
    between = d.groupBy("event_type").agg(
        F.sum(
            (F.col("sd").cast("double") / F.col("nd"))
            * (F.col("sd").cast("double") / F.col("nd"))
            * F.col("nd")
        ).alias("ss_b_raw")
    )
    j = g.join(between, "event_type")
    n = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / n
    ss_total = F.col("sxx").cast("double") - n * mean * mean
    ss_between = F.col("ss_b_raw") - n * mean * mean
    return j.select(
        "event_type",
        "n",
        F.round(ss_between / ss_total, 6).alias("r2_weekly"),
    ).orderBy("event_type")


EXT_SEASONALITY_SQL = r"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
dowd AS (SELECT event_type, day, x, isodow(day) AS dow FROM daily),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx
  FROM dowd GROUP BY 1
),
d AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(x) AS BIGINT) AS sd
  FROM dowd GROUP BY 1, 2
),
btw AS (
  SELECT event_type,
         SUM((CAST(sd AS DOUBLE) / nd) * (CAST(sd AS DOUBLE) / nd) * nd) AS ss_b_raw
  FROM d GROUP BY 1
)
SELECT g.event_type AS event_type, g.n AS n,
       ROUND((b.ss_b_raw - g.n * (CAST(g.sx AS DOUBLE) / g.n) * (CAST(g.sx AS DOUBLE) / g.n))
             / (CAST(g.sxx AS DOUBLE) - g.n * (CAST(g.sx AS DOUBLE) / g.n) * (CAST(g.sx AS DOUBLE) / g.n)), 6)
         AS r2_weekly
FROM g JOIN btw b ON g.event_type = b.event_type
ORDER BY g.event_type
"""


def ext_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table: users ranked by observation-window spend
    (the X209 churn frame's feature), retention rate per spend decile
    plus cumulative lift over the base rate — the standard targeting-
    model evaluation readout (does the top decile actually retain
    more?).

    Scale shape: deciles come from nine broadcast percentile thresholds
    (strict-compare bucketing, no NTILE global sort — the X182
    discipline); the lift walk is a window over the 10-row decile axis.
    """
    cutoff = F.lit("2024-01-21").cast("timestamp")
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("n_obs"),
        F.round(
            F.sum(F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0)), 2
        ).alias("score"),
        (F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)) > 0).alias("retained"),
    ).filter(F.col("n_obs") > 0)
    thr = per.agg(
        *[
            F.expr(f"percentile(score, {q / 10.0})").alias(f"t{q}")
            for q in range(1, 10)
        ]
    )
    decile = F.lit(10) - sum(
        (F.col("score") > F.col(f"t{q}")).cast("int") for q in range(1, 10)
    )
    bucketed = per.crossJoin(F.broadcast(thr)).select(
        decile.alias("decile"), "retained"
    )
    cells = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("retained").cast("int")).alias("n_retained"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(
        F.sum("n_users").alias("tn"), F.sum("n_retained").alias("tr")
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_retained",
            F.round(F.col("n_retained") / F.col("n_users"), 6).alias("retention_rate"),
            F.round(
                (F.sum("n_retained").over(w) / F.sum("n_users").over(w))
                / (F.col("tr") / F.col("tn")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


EXT_LIFT_TABLE_SQL = r"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
         ROUND(SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN value ELSE 0 END), 2) AS score,
         SUM(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) > 0 AS retained
  FROM events GROUP BY 1
),
flt AS (SELECT * FROM per WHERE n_obs > 0),
thr AS (
  SELECT quantile_cont(score, 0.1) AS t1, quantile_cont(score, 0.2) AS t2,
         quantile_cont(score, 0.3) AS t3, quantile_cont(score, 0.4) AS t4,
         quantile_cont(score, 0.5) AS t5, quantile_cont(score, 0.6) AS t6,
         quantile_cont(score, 0.7) AS t7, quantile_cont(score, 0.8) AS t8,
         quantile_cont(score, 0.9) AS t9
  FROM flt
),
bucketed AS (
  SELECT 10 - ((score > t1)::INT + (score > t2)::INT + (score > t3)::INT
             + (score > t4)::INT + (score > t5)::INT + (score > t6)::INT
             + (score > t7)::INT + (score > t8)::INT + (score > t9)::INT) AS decile,
         retained
  FROM flt CROSS JOIN thr
),
cells AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(retained::INT) AS BIGINT) AS n_retained
  FROM bucketed GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tn, CAST(SUM(n_retained) AS BIGINT) AS tr FROM cells)
SELECT decile, n_users, n_retained,
       ROUND(CAST(n_retained AS DOUBLE) / n_users, 6) AS retention_rate,
       ROUND((CAST(SUM(n_retained) OVER w AS DOUBLE) / SUM(n_users) OVER w)
             / (CAST(tr AS DOUBLE) / tn), 6) AS cum_lift
FROM cells CROSS JOIN tot
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
ORDER BY decile
"""


def ext_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal sample allocation across customer segments for a
    1000-unit audit budget: n_h ∝ N_h·σ_h (stratum size × stddev of
    customer lifetime value) — minimum-variance stratified sampling,
    the survey-statistics classic a QA/audit pipeline uses instead of
    proportional allocation when strata differ in volatility.

    Scale shape: customers collapse once; per-stratum exact decimal
    moments give σ; the allocation normalizer is a broadcast scalar.
    Allocations round half-up and are reported with their exact weight
    shares (budget rounding residue is the caller's concern)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ltv"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    v = F.col("ltv")
    strata = per.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(v).alias("s1"),
        F.sum(v.cast("decimal(19,2)") * v.cast("decimal(19,2)")).alias("s2"),
    )
    n = F.col("n_h").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sigma = F.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    weighted = strata.select(
        "c_mktsegment", "n_h", sigma.alias("sigma"), (n * sigma).alias("w")
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "n_h",
            F.round("sigma", 4).alias("ltv_stddev"),
            F.round(F.col("w") / F.col("tw"), 6).alias("weight_share"),
            F.round(F.lit(1000.0) * F.col("w") / F.col("tw"), 0)
            .cast("long")
            .alias("allocated_samples"),
        )
        .orderBy("c_mktsegment")
    )


EXT_NEYMAN_SQL = r"""
WITH per AS (
  SELECT o.o_custkey, c.c_mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS ltv
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
strata AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(ltv) AS DECIMAL(38,2)) AS s1,
         CAST(SUM(CAST(ltv AS DECIMAL(19,2)) * CAST(ltv AS DECIMAL(19,2))) AS DECIMAL(38,4)) AS s2
  FROM per GROUP BY 1
),
wgt AS (
  SELECT c_mktsegment, n_h,
         SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
              / (n_h - 1.0)) AS sigma,
         n_h * SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
              / (n_h - 1.0)) AS w
  FROM strata
),
tot AS (SELECT SUM(w) AS tw FROM wgt)
SELECT c_mktsegment, n_h,
       ROUND(sigma, 4) AS ltv_stddev,
       ROUND(w / tw, 6) AS weight_share,
       CAST(ROUND(1000.0 * w / tw, 0) AS BIGINT) AS allocated_samples
FROM wgt CROSS JOIN tot
ORDER BY c_mktsegment
"""


EXT_QUERIES.update(
    {
        "ext_seasonality_strength": ext_seasonality_strength,
        "ext_lift_table": ext_lift_table,
        "ext_neyman_allocation": ext_neyman_allocation,
    }
)
EXT_ORACLES.update(
    {
        "ext_seasonality_strength": EXT_SEASONALITY_SQL,
        "ext_lift_table": EXT_LIFT_TABLE_SQL,
        "ext_neyman_allocation": EXT_NEYMAN_SQL,
    }
)


def ext_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-extraction detector: unbalanced parentheses/brackets/
    double-quotes per document — truncated or mis-parsed extractions
    leave dangling delimiters that poison downstream parsing; flagged
    docs are curation candidates. Row-local regexp counting, zero
    shuffle; the flag is parity/count arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    opens = F.regexp_count(F.col("text"), F.lit(r"\("))
    closes = F.regexp_count(F.col("text"), F.lit(r"\)"))
    brack_o = F.regexp_count(F.col("text"), F.lit(r"\["))
    brack_c = F.regexp_count(F.col("text"), F.lit(r"\]"))
    quotes = F.regexp_count(F.col("text"), F.lit(r'"'))
    return docs.select(
        "doc_id",
        (opens - closes).alias("paren_delta"),
        (brack_o - brack_c).alias("bracket_delta"),
        F.pmod(quotes, F.lit(2)).alias("quote_parity"),
        (
            (opens != closes)
            | (brack_o != brack_c)
            | (F.pmod(quotes, F.lit(2)) != 0)
        ).alias("is_unbalanced"),
    ).orderBy("doc_id")


EXT_BALANCE_AUDIT_SQL = r"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '\(')) - LEN(regexp_extract_all(text, '\)'))
         AS paren_delta,
       LEN(regexp_extract_all(text, '\[')) - LEN(regexp_extract_all(text, '\]'))
         AS bracket_delta,
       LEN(regexp_extract_all(text, '"')) % 2 AS quote_parity,
       (LEN(regexp_extract_all(text, '\(')) <> LEN(regexp_extract_all(text, '\)'))
        OR LEN(regexp_extract_all(text, '\[')) <> LEN(regexp_extract_all(text, '\]'))
        OR LEN(regexp_extract_all(text, '"')) % 2 <> 0) AS is_unbalanced
FROM documents ORDER BY doc_id
"""


def ext_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source (keyness): top-3 terms by
    smoothed log-odds of in-source vs rest-of-corpus frequency
    (Monroe-style +0.5 Dirichlet prior) — the corpus-exploration
    readout that names what makes each feed different.

    Scale shape: ONE (source, word) count exchange; corpus totals
    derive from it (no re-tokenization); log-odds are row-local over
    the O(sources x vocab) grid; the head is a per-source
    WindowGroupLimit. Log-odds round to 6 BEFORE ranking."""
    docs = _t(spark, sf_dir, "documents")
    sw = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = sw.groupBy("w").agg(F.sum("c").alias("cw"))
    src_tot = sw.groupBy("source").agg(F.sum("c").alias("cs"))
    grand = totals.agg(F.sum("cw").alias("n"))
    j = (
        sw.join(F.broadcast(totals), "w")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
    )
    inc = F.col("c") + 0.5
    out_c = (F.col("cw") - F.col("c")) + 0.5
    in_rest = (F.col("cs") - F.col("c")) + 0.5
    out_rest = (F.col("n") - F.col("cw") - F.col("cs") + F.col("c")) + 0.5
    lo = F.round(F.log(inc / in_rest) - F.log(out_c / out_rest), 6)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("log_odds").desc(), "w"
    )
    return (
        j.select("source", "w", "c", lo.alias("log_odds"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("source", F.col("w").alias("term"), "c", "log_odds", "rank")
        .orderBy("source", "rank")
    )


EXT_DISTINCTIVE_TERMS_SQL = r"""
WITH sw AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source,
           UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY 1, 2
),
totals AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM sw GROUP BY 1),
src_tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM sw GROUP BY 1),
grand AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM totals),
j AS (
  SELECT sw.source, sw.w, sw.c,
         ROUND(LN((sw.c + 0.5) / ((st.cs - sw.c) + 0.5))
               - LN(((t.cw - sw.c) + 0.5) / ((g.n - t.cw - st.cs + sw.c) + 0.5)), 6)
           AS log_odds
  FROM sw JOIN totals t ON sw.w = t.w
  JOIN src_tot st ON sw.source = st.source
  CROSS JOIN grand g
),
ranked AS (
  SELECT source, w, c, log_odds,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY log_odds DESC, w) AS rank
  FROM j
)
SELECT source, w AS term, c, log_odds, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
ORDER BY source, rank
"""


EXT_QUERIES.update(
    {
        "ext_balance_audit": ext_balance_audit,
        "ext_distinctive_terms": ext_distinctive_terms,
    }
)
EXT_ORACLES.update(
    {
        "ext_balance_audit": EXT_BALANCE_AUDIT_SQL,
        "ext_distinctive_terms": EXT_DISTINCTIVE_TERMS_SQL,
    }
)


# --- round-3 wave: statistical calculators ------------------------------------


def ext_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator from observed data: per-arm n needed
    to detect a 10% relative drop in the X212 conversion rate at
    alpha=0.05 / power=0.80 (two-sided two-proportion formula,
    n = (z_a·√(2p̄q̄) + z_b·√(p1q1+p2q2))² / δ²) — the experiment-design
    companion every A/B readout needs.

    Scale shape: the observed rate is one per-user collapse + one
    scalar; the formula is O(1) driver-free arithmetic in the plan."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300.0), 1
            ).otherwise(0)
        ).alias("converted")
    )
    base = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("p1"),
    )
    za, zb = 1.959964, 0.841621  # alpha=0.05 two-sided, power=0.80
    p1 = F.col("p1")
    p2 = p1 * 0.9
    pbar = (p1 + p2) / 2.0
    delta = p1 - p2
    n = F.when(
        delta > 0.0,
        F.pow(
            F.lit(za) * F.sqrt(2.0 * pbar * (1.0 - pbar))
            + F.lit(zb) * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)),
            2.0,
        )
        / (delta * delta),
    )  # zero observed rate -> no detectable effect -> NULL (mirrored)
    return base.select(
        "n_users",
        F.round(p1, 6).alias("baseline_rate"),
        F.round(p2, 6).alias("target_rate"),
        F.ceil(n).cast("long").alias("required_per_arm"),
    )


EXT_POWER_ANALYSIS_SQL = r"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 300.0
             THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS p1
  FROM per_user
)
SELECT n_users,
       ROUND(p1, 6) AS baseline_rate,
       ROUND(p1 * 0.9, 6) AS target_rate,
       CAST(CEIL(POW(1.959964 * SQRT(2.0 * ((p1 + p1 * 0.9) / 2.0) * (1.0 - (p1 + p1 * 0.9) / 2.0))
                     + 0.841621 * SQRT(p1 * (1.0 - p1) + p1 * 0.9 * (1.0 - p1 * 0.9)), 2)
                 / NULLIF((p1 - p1 * 0.9) * (p1 - p1 * 0.9), 0.0)) AS BIGINT) AS required_per_arm
FROM base
"""


def ext_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion audit of basket sizes: variance-to-mean ratio of
    lineitems per order (index-of-dispersion; ~1 = Poisson, >1.5 =
    clumped demand that breaks Poisson capacity models). Exact integer
    moments over the per-order collapse; one scalar row."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("k").alias("s1"),
        F.sum(F.col("k") * F.col("k")).alias("s2"),
    )
    n = F.col("n_orders").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    return agg.select(
        "n_orders",
        F.round(mean, 6).alias("mean_lines"),
        F.round(var, 6).alias("var_lines"),
        F.round(var / mean, 6).alias("dispersion_index"),
        (var / mean > 1.5).alias("overdispersed"),
    )


EXT_DISPERSION_SQL = r"""
WITH per AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k FROM lineitem GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(k) AS BIGINT) AS s1,
         CAST(SUM(k * k) AS BIGINT) AS s2
  FROM per
)
SELECT n_orders,
       ROUND(CAST(s1 AS DOUBLE) / n_orders, 6) AS mean_lines,
       ROUND(CAST(s2 AS DOUBLE) / n_orders
             - (CAST(s1 AS DOUBLE) / n_orders) * (CAST(s1 AS DOUBLE) / n_orders), 6)
         AS var_lines,
       ROUND((CAST(s2 AS DOUBLE) / n_orders
              - (CAST(s1 AS DOUBLE) / n_orders) * (CAST(s1 AS DOUBLE) / n_orders))
             / (CAST(s1 AS DOUBLE) / n_orders), 6) AS dispersion_index,
       (CAST(s2 AS DOUBLE) / n_orders
        - (CAST(s1 AS DOUBLE) / n_orders) * (CAST(s1 AS DOUBLE) / n_orders))
       / (CAST(s1 AS DOUBLE) / n_orders) > 1.5 AS overdispersed
FROM agg
"""


def ext_pareto_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-tail exponent of customer lifetime value: Pareto alpha by
    MLE over the tail above the 90th percentile (α = n_tail /
    Σ ln(x/x_min)) — quantifies revenue-concentration risk beyond what
    the Gini/top-decile summaries (X110/X117) show (α < 2 = infinite-
    variance territory).

    Scale shape: one per-customer collapse; the x_min threshold is a
    broadcast percentile scalar; the MLE is one filtered aggregate."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("ltv")
    )
    xmin = per.agg(F.expr("percentile(ltv, 0.9)").alias("xm"))
    tail = per.crossJoin(F.broadcast(xmin)).filter(F.col("ltv") > F.col("xm"))
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.round(F.max("xm"), 2).alias("x_min"),
        F.round(
            F.count(F.lit(1)) / F.sum(F.log(F.col("ltv") / F.col("xm"))), 6
        ).alias("pareto_alpha"),
    )


EXT_PARETO_TAIL_SQL = r"""
WITH per AS (
  SELECT o_custkey,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS ltv
  FROM orders GROUP BY 1
),
xm AS (SELECT quantile_cont(ltv, 0.9) AS xm FROM per),
tail AS (SELECT ltv, xm FROM per CROSS JOIN xm WHERE ltv > xm)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
       ROUND(MAX(xm), 2) AS x_min,
       ROUND(COUNT(*) / SUM(LN(ltv / xm)), 6) AS pareto_alpha
FROM tail
"""


def ext_corpus_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level unigram entropy and perplexity (effective vocabulary
    size): H = ln N − Σc·ln(c)/N over token counts, perplexity = e^H —
    the one-number diversity summary that makes corpora comparable
    (dedup/filtering should RAISE it; template floods lower it).

    Scale shape: one token-count exchange; the entropy folds the
    O(vocab) counts with the exact ln-regrouping (no per-token p·ln p
    materialization)."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("clogc"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("clogc") / F.col("n_tokens")
    return agg.select(
        "vocab_size",
        "n_tokens",
        F.round(h, 6).alias("unigram_entropy_nats"),
        F.round(F.exp(h), 2).alias("perplexity"),
    )


EXT_CORPUS_PERPLEXITY_SQL = r"""
WITH counts AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         SUM(CAST(c AS DOUBLE) * LN(c)) AS clogc
  FROM counts
)
SELECT vocab_size, n_tokens,
       ROUND(LN(n_tokens) - clogc / n_tokens, 6) AS unigram_entropy_nats,
       ROUND(EXP(LN(n_tokens) - clogc / n_tokens), 2) AS perplexity
FROM agg
"""


EXT_QUERIES.update(
    {
        "ext_power_analysis": ext_power_analysis,
        "ext_dispersion_index": ext_dispersion_index,
        "ext_pareto_tail": ext_pareto_tail,
        "ext_corpus_perplexity": ext_corpus_perplexity,
    }
)
EXT_ORACLES.update(
    {
        "ext_power_analysis": EXT_POWER_ANALYSIS_SQL,
        "ext_dispersion_index": EXT_DISPERSION_SQL,
        "ext_pareto_tail": EXT_PARETO_TAIL_SQL,
        "ext_corpus_perplexity": EXT_CORPUS_PERPLEXITY_SQL,
    }
)


# --- round-3 wave: shrinkage, calendar anomalies, vocabulary growth -----------


def ext_shrunk_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes return-rate ranking of parts: per-part 'R'
    lineitem share shrunk toward the global rate with a k=20
    pseudo-count prior ((r + k·p0)/(n + k)) — the small-n correction
    that stops a 1-for-1 part from topping the list (the cold-start
    ranking problem). Top-25 by shrunk rate.

    Scale shape: one per-part collapse; the global prior is a broadcast
    scalar; the head is k-bounded."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
    )
    prior = per.agg(
        (F.sum("r").cast("double") / F.sum("n")).alias("p0")
    )
    k = 20.0
    shrunk = F.round(
        (F.col("r") + F.lit(k) * F.col("p0")) / (F.col("n") + F.lit(k)), 6
    )
    return (
        per.crossJoin(F.broadcast(prior))
        .select(
            "l_partkey",
            "n",
            "r",
            F.round(F.col("r") / F.col("n"), 6).alias("raw_rate"),
            shrunk.alias("shrunk_rate"),
        )
        .orderBy(F.col("shrunk_rate").desc(), "l_partkey")
        .limit(25)
    )


EXT_SHRUNK_RATES_SQL = r"""
WITH per AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
prior AS (SELECT CAST(SUM(r) AS DOUBLE) / SUM(n) AS p0 FROM per)
SELECT l_partkey, n, r,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS raw_rate,
       ROUND((r + 20.0 * p0) / (n + 20.0), 6) AS shrunk_rate
FROM per CROSS JOIN prior
ORDER BY shrunk_rate DESC, l_partkey LIMIT 25
"""


def ext_calendar_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar anomaly days: daily event-value totals more than 2
    population stddevs from their DAY-OF-WEEK mean (the X102 weekday
    profile as an expectation, X172's exact moments as the yardstick) —
    the holiday/outage detector that plain global z-scores miss when
    weekends differ structurally from weekdays.

    Scale shape: one exact-cent collapse to the day axis; dow moments
    are a 7-row frame broadcast back."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("iv"),
    )
    daily = ev.groupBy("day").agg(F.sum("iv").alias("x"))
    daily = daily.withColumn("dow", ((F.dayofweek("day") + F.lit(5)) % 7) + 1)
    m = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    std = F.sqrt(F.col("s2").cast("double") / n - mean * mean)
    stats = m.select("dow", mean.alias("mu"), std.alias("sd"))
    return (
        daily.join(F.broadcast(stats), "dow")
        .select(
            F.col("day").cast("string").alias("day"),
            "dow",
            F.round(F.col("x").cast("double") / 100.0, 2).alias("daily_total"),
            F.round((F.col("x").cast("double") - F.col("mu")) / F.col("sd"), 4).alias("dow_z"),
            (F.abs((F.col("x").cast("double") - F.col("mu")) / F.col("sd")) > 2.0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


EXT_CALENDAR_ANOMALIES_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
dowd AS (SELECT day, x, isodow(day) AS dow FROM daily),
m AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS s2
  FROM dowd GROUP BY 1
),
stats AS (
  SELECT dow, CAST(s1 AS DOUBLE) / n AS mu,
         SQRT(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
  FROM m
)
SELECT CAST(d.day AS VARCHAR) AS day, CAST(d.dow AS BIGINT) AS dow,
       ROUND(CAST(d.x AS DOUBLE) / 100.0, 2) AS daily_total,
       ROUND((CAST(d.x AS DOUBLE) - s.mu) / s.sd, 4) AS dow_z,
       ABS((CAST(d.x AS DOUBLE) - s.mu) / s.sd) > 2.0 AS is_anomaly
FROM dowd d JOIN stats s ON d.dow = s.dow
ORDER BY day
"""


def ext_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth estimate: distinct-type counts at the
    half corpus (doc_id below the median) vs the full corpus give the
    growth exponent beta = ln(V2/V1)/ln(N2/N1) — predicts how much NEW
    vocabulary more crawling buys (beta near 0 = saturated corpus,
    near 1 = every batch still novel).

    Scale shape: two conditional distinct aggregations over one token
    exchange; the median doc id is a broadcast scalar."""
    docs = _t(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)").alias("md"))
    toks = (
        docs.crossJoin(F.broadcast(med))
        .select(
            (F.col("doc_id") <= F.col("md")).alias("in_half"),
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    agg = toks.agg(
        F.count_distinct(F.when(F.col("in_half"), F.col("w"))).alias("v1"),
        F.count_distinct("w").alias("v2"),
        F.sum(F.when(F.col("in_half"), 1).otherwise(0)).alias("n1"),
        F.count(F.lit(1)).alias("n2"),
    )
    beta = (
        F.log(F.col("v2").cast("double") / F.col("v1"))
        / F.log(F.col("n2").cast("double") / F.col("n1"))
    )
    return agg.select(
        "v1", "v2", "n1", "n2", F.round(beta, 6).alias("heaps_beta")
    )


EXT_HEAPS_SQL = r"""
WITH med AS (SELECT quantile_cont(doc_id, 0.5) AS md FROM documents),
toks AS (
  SELECT doc_id <= md AS in_half, w FROM (
    SELECT doc_id, md,
           UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents CROSS JOIN med
  ) WHERE w <> ''
)
SELECT CAST(COUNT(DISTINCT CASE WHEN in_half THEN w END) AS BIGINT) AS v1,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS v2,
       CAST(SUM(CASE WHEN in_half THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(COUNT(*) AS BIGINT) AS n2,
       ROUND(LN(CAST(COUNT(DISTINCT w) AS DOUBLE)
                / COUNT(DISTINCT CASE WHEN in_half THEN w END))
             / LN(CAST(COUNT(*) AS DOUBLE)
                  / SUM(CASE WHEN in_half THEN 1 ELSE 0 END)), 6) AS heaps_beta
FROM toks
"""


EXT_QUERIES.update(
    {
        "ext_shrunk_return_rates": ext_shrunk_return_rates,
        "ext_calendar_anomalies": ext_calendar_anomalies,
        "ext_heaps_growth": ext_heaps_growth,
    }
)
EXT_ORACLES.update(
    {
        "ext_shrunk_return_rates": EXT_SHRUNK_RATES_SQL,
        "ext_calendar_anomalies": EXT_CALENDAR_ANOMALIES_SQL,
        "ext_heaps_growth": EXT_HEAPS_SQL,
    }
)


# --- round-3 wave: KMV sketches, bitmap-index distinct ------------------------


def ext_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-vocabulary estimate from a k-minimum-values
    sketch (k=256) next to the exact count: the mergeable fixed-size
    summary that lets a 100 TB corpus report per-shard vocabularies and
    combine them WITHOUT re-scanning (min-k of a union == min-k of the
    per-shard min-k's) — the set-sketch complement of the HLL registers
    (X156) that additionally supports resemblance (see ext_kmv_jaccard).

    Scale shape: distinct (source, hash) collapses map-side; the rank
    filter is WindowGroupLimit (each task forwards its local k smallest),
    so the exchange carries O(sources*k) rows. The exact column is one
    count_distinct for the audit — drop it in production."""
    from aircan_spark.ext import sketch as sk

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    minima = sk.kmv_minima(toks, "w", ["source"], k=256)
    est = sk.kmv_estimates(minima, ["source"], k=256)
    exact = toks.groupBy("source").agg(
        F.count_distinct("w").alias("exact_distinct")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            F.round("kmv_distinct", 2).alias("kmv_distinct"),
            "exact_distinct",
            F.round(
                F.abs(F.col("kmv_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


EXT_KMV_DISTINCT_SQL = r"""
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> ''
),
hs AS (
  SELECT DISTINCT source, CAST(('0x' || SUBSTR(md5(w), 1, 12))::UBIGINT AS BIGINT) AS h
  FROM tok
),
mins AS (
  SELECT source, h FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= 256
),
est AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS nm, MAX(h) AS hk
  FROM mins GROUP BY 1
),
ex AS (
  SELECT source, CAST(COUNT(DISTINCT w) AS BIGINT) AS exact_distinct
  FROM tok GROUP BY 1
)
SELECT e.source,
       ROUND(CASE WHEN nm < 256 THEN CAST(nm AS DOUBLE)
                  ELSE 255.0 / (CAST(hk AS DOUBLE) / 281474976710656.0) END, 2)
         AS kmv_distinct,
       x.exact_distinct,
       ROUND(ABS(CASE WHEN nm < 256 THEN CAST(nm AS DOUBLE)
                      ELSE 255.0 / (CAST(hk AS DOUBLE) / 281474976710656.0) END
                 - x.exact_distinct) / x.exact_distinct, 4) AS rel_err
FROM est e JOIN ex x ON e.source = x.source
ORDER BY e.source
"""


def ext_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary resemblance from KMV sketches: union
    cardinality from the merged min-k, intersection by inclusion-
    exclusion, Jaccard = inter/union — next to the exact Jaccard for the
    audit. This is what sketches buy at 100 TB: comparing every pair of
    shards/feeds costs O(pairs * k), not O(pairs * vocab).

    Scale shape: sketches are built ONCE (O(sources*k) rows); the pair
    expansion, merge, and re-take all run on that tiny frame. The exact
    Jaccard audit is one equi-join of per-source distinct-token sets on
    the token (vocab-sized, ≪ corpus) — drop it in production."""
    from aircan_spark.ext import sketch as sk

    k = 256
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    minima = sk.kmv_minima(toks, "w", ["source"], k=k).select("source", "h")
    est = sk.kmv_estimates(minima, ["source"], k=k)
    sources = minima.select("source").distinct()
    pairs = (
        sources.select(F.col("source").alias("sa"))
        .crossJoin(sources.select(F.col("source").alias("sb")))
        .filter(F.col("sa") < F.col("sb"))
    )
    # union sketch: hashes of either side, distinct, re-take k smallest per pair
    side_a = F.broadcast(pairs).join(minima, pairs.sa == minima.source).select(
        "sa", "sb", "h"
    )
    side_b = F.broadcast(pairs).join(minima, pairs.sb == minima.source).select(
        "sa", "sb", "h"
    )
    u = side_a.unionByName(side_b).distinct()
    wkm = Window.partitionBy("sa", "sb").orderBy("h")
    umins = u.withColumn("rn", F.row_number().over(wkm)).filter(F.col("rn") <= k)
    uest = umins.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("hk")
    )
    est_u = F.when(F.col("n_mins") < k, F.col("n_mins").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("hk").cast("double") / F.lit(sk.KMV_HASH_SPACE))
    )
    uest = uest.select("sa", "sb", est_u.alias("est_union"))
    ea = est.select(F.col("source").alias("sa"), F.col("kmv_distinct").alias("est_a"))
    eb = est.select(F.col("source").alias("sb"), F.col("kmv_distinct").alias("est_b"))
    kmv = (
        uest.join(F.broadcast(ea), "sa")
        .join(F.broadcast(eb), "sb")
        .select(
            "sa",
            "sb",
            F.round(
                F.greatest(
                    F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
                )
                / F.col("est_union"),
                4,
            ).alias("kmv_jaccard"),
        )
    )
    # exact audit: per-source distinct token sets, equi-join on the token
    vocab = toks.distinct()
    inter = (
        vocab.alias("a")
        .join(vocab.alias("b"), F.col("a.w") == F.col("b.w"))
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    exact = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("sa"), F.col("nv").alias("na"))),
            "sa",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("sb"), F.col("nv").alias("nb"))),
            "sb",
        )
        .select(
            "sa",
            "sb",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                4,
            ).alias("exact_jaccard"),
        )
    )
    return (
        kmv.join(exact, ["sa", "sb"])
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "kmv_jaccard",
            "exact_jaccard",
            F.round(F.abs(F.col("kmv_jaccard") - F.col("exact_jaccard")), 4).alias(
                "abs_err"
            ),
        )
        .orderBy("source_a", "source_b")
    )


EXT_KMV_JACCARD_SQL = r"""
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> ''
),
hs AS (
  SELECT DISTINCT source, CAST(('0x' || SUBSTR(md5(w), 1, 12))::UBIGINT AS BIGINT) AS h
  FROM tok
),
mins AS (
  SELECT source, h FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= 256
),
est AS (
  SELECT source,
         CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE 255.0 / (CAST(MAX(h) AS DOUBLE) / 281474976710656.0) END AS kd
  FROM mins GROUP BY 1
),
srcs AS (SELECT DISTINCT source FROM mins),
pairs AS (
  SELECT a.source AS sa, b.source AS sb FROM srcs a, srcs b WHERE a.source < b.source
),
u AS (
  SELECT DISTINCT sa, sb, h FROM (
    SELECT p.sa, p.sb, m.h FROM pairs p JOIN mins m ON m.source = p.sa
    UNION ALL
    SELECT p.sa, p.sb, m.h FROM pairs p JOIN mins m ON m.source = p.sb
  )
),
umins AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h, ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= 256
),
uest AS (
  SELECT sa, sb,
         CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE 255.0 / (CAST(MAX(h) AS DOUBLE) / 281474976710656.0) END AS eu
  FROM umins GROUP BY 1, 2
),
kmv AS (
  SELECT u.sa, u.sb,
         ROUND(GREATEST(0.0, ea.kd + eb.kd - u.eu) / u.eu, 4) AS kmv_jaccard
  FROM uest u
  JOIN est ea ON ea.source = u.sa
  JOIN est eb ON eb.source = u.sb
),
vocab AS (SELECT DISTINCT source, w FROM tok),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM vocab GROUP BY 1),
exact AS (
  SELECT i.sa, i.sb,
         ROUND(CAST(i.n_inter AS DOUBLE) / (na.nv + nb.nv - i.n_inter), 4)
           AS exact_jaccard
  FROM inter i
  JOIN sizes na ON na.source = i.sa
  JOIN sizes nb ON nb.source = i.sb
)
SELECT k.sa AS source_a, k.sb AS source_b, k.kmv_jaccard, e.exact_jaccard,
       ROUND(ABS(k.kmv_jaccard - e.exact_jaccard), 4) AS abs_err
FROM kmv k JOIN exact e ON k.sa = e.sa AND k.sb = e.sb
ORDER BY source_a, source_b
"""


def ext_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day AND per month from ONE bitmap-index
    pass: per (day, bucket) RoaringBitmap-style bitmaps built with the
    engine-native bitmap aggregates (JVM-side, whole-stage codegen), then
    daily counts by summing per-bucket popcounts and monthly counts by
    OR-merging the SAME bitmaps — the mergeable exact-distinct pattern
    that replaces two full re-scans (per-grain count_distinct) with one
    scan + tiny bitmap rollups at 100 TB.

    Output (grain, key, n_users) — 'day' rows from the bitmaps, 'month'
    rows from their OR-merge; both exactly equal the naive
    COUNT(DISTINCT) the oracle runs."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id")
    )
    pos = ev.select(
        "day",
        F.bitmap_bucket_number(F.col("user_id")).alias("bkt"),
        F.bitmap_bit_position(F.col("user_id")).alias("pos"),
    )
    day_bm = pos.groupBy("day", "bkt").agg(
        F.bitmap_construct_agg(F.col("pos")).alias("bm")
    )
    daily = day_bm.groupBy("day").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_users")
    )
    monthly = (
        day_bm.select(F.trunc("day", "month").alias("mo"), "bkt", "bm")
        .groupBy("mo", "bkt")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .groupBy("mo")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_users"))
    )
    out = daily.select(
        F.lit("day").alias("grain"),
        F.col("day").cast("string").alias("key"),
        "n_users",
    ).unionByName(
        monthly.select(
            F.lit("month").alias("grain"),
            F.col("mo").cast("string").alias("key"),
            "n_users",
        )
    )
    return out.orderBy("grain", "key")


EXT_BITMAP_DISTINCT_SQL = r"""
WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events)
SELECT grain, key, n_users FROM (
  SELECT 'day' AS grain, CAST(day AS VARCHAR) AS key,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev GROUP BY day
  UNION ALL
  SELECT 'month' AS grain, CAST(date_trunc('month', day) AS VARCHAR) AS key,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev GROUP BY date_trunc('month', day)
)
ORDER BY grain, key
"""


EXT_QUERIES.update(
    {
        "ext_kmv_distinct": ext_kmv_distinct,
        "ext_kmv_jaccard": ext_kmv_jaccard,
        "ext_bitmap_distinct": ext_bitmap_distinct,
    }
)
EXT_ORACLES.update(
    {
        "ext_kmv_distinct": EXT_KMV_DISTINCT_SQL,
        "ext_kmv_jaccard": EXT_KMV_JACCARD_SQL,
        "ext_bitmap_distinct": EXT_BITMAP_DISTINCT_SQL,
    }
)


# --- round-3 wave: Theil decomposition, autocorrelation, bootstrap CI ---------


def ext_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of customer lifetime value with the exact
    between/within market-segment decomposition (T = T_between +
    Σ share_g·T_g) — the property the Gini (X117) does NOT have: it says
    how much revenue concentration lives INSIDE segments vs BETWEEN
    them, which is what a mix-shift investigation actually needs.

    Scale shape: one per-customer collapse (shuffle on custkey), one
    segment join, then O(segments) arithmetic; the global scalars ride a
    broadcast. T_total is computed from the global sums directly, so the
    decomposition identity is checkable from the output."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
        .join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    seg = per.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.log("x")).alias("xlgx"),
    )
    glob = seg.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("s"), F.sum("xlgx").alias("xl")
    )
    g = seg.crossJoin(F.broadcast(glob))
    mu = F.col("s") / F.col("n")
    mug = F.col("sg") / F.col("ng")
    t_g = F.col("xlgx") / (F.col("sg")) - F.log(mug)
    # note: (1/(ng*mug))*Σ x ln x == Σ x ln x / sg
    share = F.col("sg") / F.col("s")
    terms = g.agg(
        F.max("n").alias("n"),
        F.max(F.col("xl") / F.col("s") - F.log(F.col("s") / F.col("n"))).alias(
            "t_total"
        ),
        F.sum(share * F.log(mug / mu)).alias("t_between"),
        F.sum(share * t_g).alias("t_within"),
    )
    return terms.select(
        F.col("n").alias("n_customers"),
        F.round("t_total", 6).alias("theil_total"),
        F.round("t_between", 6).alias("theil_between"),
        F.round("t_within", 6).alias("theil_within"),
    )


EXT_THEIL_SQL = r"""
WITH per AS (
  SELECT o.o_custkey, c.c_mktsegment,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ng, SUM(x) AS sg,
         SUM(x * LN(x)) AS xlgx
  FROM per GROUP BY 1
),
gl AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(sg) AS s, SUM(xlgx) AS xl FROM seg)
SELECT MAX(n) AS n_customers,
       ROUND(MAX(xl / s - LN(s / n)), 6) AS theil_total,
       ROUND(SUM((sg / s) * LN((sg / ng) / (s / n))), 6) AS theil_between,
       ROUND(SUM((sg / s) * (xlgx / sg - LN(sg / ng))), 6) AS theil_within
FROM seg CROSS JOIN gl
"""


def ext_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order revenue at lags 1,2,3,7,14,28 —
    the memory/seasonality diagnostic behind every forecasting choice
    (X217's seasonal-naive baseline assumes exactly the lag-7 structure
    this measures). Missing calendar days simply contribute no pair
    (stated estimator: pairwise-complete ACF on the calendar grid).

    Scale shape: the big table collapses to the O(days) axis first
    (exact cents); mean/denominator are broadcast scalars; each lag is
    one equi-join on the shifted day over the tiny axis."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("xc").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.col("xc").cast("double") - F.col("mu")).alias("d")
    )
    denom = dev.agg(F.sum(F.col("d") * F.col("d")).alias("ss"))
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in [1, 2, 3, 7, 14, 28]])).alias("lag")
    )
    pairs = (
        F.broadcast(lags)
        .crossJoin(dev.select(F.col("day").alias("d0"), F.col("d").alias("da")))
        .join(
            dev.select(F.col("day").alias("d1"), F.col("d").alias("db")),
            F.expr("d1 = date_add(d0, lag)"),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum(F.col("da") * F.col("db")).alias("num"))
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("num") / F.col("ss"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


EXT_ACF_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS xc
  FROM orders GROUP BY 1
),
stats AS (SELECT CAST(SUM(xc) AS DOUBLE) / COUNT(*) AS mu FROM daily),
dev AS (SELECT day, CAST(xc AS DOUBLE) - mu AS d FROM daily CROSS JOIN stats),
denom AS (SELECT SUM(d * d) AS ss FROM dev),
lags AS (SELECT UNNEST([1, 2, 3, 7, 14, 28]) AS lag)
SELECT CAST(l.lag AS INTEGER) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(a.d * b.d) / MAX(ss), 6) AS acf
FROM lags l
JOIN dev a ON TRUE
JOIN dev b ON b.day = a.day + CAST(l.lag AS INTEGER)
CROSS JOIN denom
GROUP BY l.lag
ORDER BY lag
"""


def ext_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value from
    B=100 deterministic Poisson(1)-weighted resamples (the scalable
    bootstrap: multinomial resampling ≈ independent Poisson weights, so
    NO per-replicate shuffle of the data — one pass computes every
    replicate). Hash-seeded weights make the 'randomness' replayable in
    any engine (the oracle recomputes it bit-for-bit).

    Scale shape: rows × B expansion is row-local (explode of a literal
    range); the per-replicate sums partial-aggregate map-side into B=100
    groups; quantiles run on the 100-row replicate frame."""
    orders = _t(spark, sf_dir, "orders")
    b = 100
    rep = orders.select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xc"),
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("-", F.col("o_orderkey"), F.col("rep"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(281474976710656.0)
    )
    # Poisson(1) inverse CDF ladder (cumulative probabilities, exact literals)
    cum = [
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.9999167588507119, 0.9999897508076832, 0.9999988597484035,
    ]
    w = F.lit(9)
    for i in range(len(cum) - 1, -1, -1):
        w = F.when(F.lit(cum[i]) > u, F.lit(i)).otherwise(w)
    means = (
        rep.select("rep", w.alias("w"), "xc")
        .groupBy("rep")
        .agg(
            (
                F.sum(F.col("w") * F.col("xc")).cast("double")
                / (F.sum("w") * 100.0)
            ).alias("m")
        )
    )
    point = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
            / (F.count(F.lit(1)) * 100.0)
        ).alias("pm"),
    )
    ci = means.agg(
        F.expr("percentile(m, 0.025)").alias("lo"),
        F.expr("percentile(m, 0.975)").alias("hi"),
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .select(
            "n_orders",
            F.round("pm", 4).alias("point_mean"),
            F.round("lo", 4).alias("ci_lo"),
            F.round("hi", 4).alias("ci_hi"),
        )
    )


EXT_BOOTSTRAP_SQL = r"""
WITH rep AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc, r.rep
  FROM orders CROSS JOIN (SELECT UNNEST(range(0, 100)) AS rep) r
),
wts AS (
  SELECT rep, xc,
         CASE
           WHEN 0.36787944117144233 > u THEN 0
           WHEN 0.7357588823428847 > u THEN 1
           WHEN 0.9196986029286058 > u THEN 2
           WHEN 0.9810118431238462 > u THEN 3
           WHEN 0.9963401531726563 > u THEN 4
           WHEN 0.9994058151824183 > u THEN 5
           WHEN 0.9999167588507119 > u THEN 6
           WHEN 0.9999897508076832 > u THEN 7
           WHEN 0.9999988597484035 > u THEN 8
           ELSE 9
         END AS w
  FROM (
    SELECT rep, xc,
           CAST(('0x' || SUBSTR(md5(o_orderkey || '-' || rep), 1, 12))::UBIGINT
                AS DOUBLE) / 281474976710656.0 AS u
    FROM rep
  )
),
means AS (
  SELECT rep, CAST(SUM(w * xc) AS DOUBLE) / (SUM(w) * 100.0) AS m
  FROM wts GROUP BY 1
),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * 100.0) AS pm
  FROM orders
),
ci AS (SELECT quantile_cont(m, 0.025) AS lo, quantile_cont(m, 0.975) AS hi FROM means)
SELECT n_orders, ROUND(pm, 4) AS point_mean, ROUND(lo, 4) AS ci_lo,
       ROUND(hi, 4) AS ci_hi
FROM point CROSS JOIN ci
"""


EXT_QUERIES.update(
    {
        "ext_theil_index": ext_theil_index,
        "ext_acf": ext_acf,
        "ext_bootstrap_ci": ext_bootstrap_ci,
    }
)
EXT_ORACLES.update(
    {
        "ext_theil_index": EXT_THEIL_SQL,
        "ext_acf": EXT_ACF_SQL,
        "ext_bootstrap_ci": EXT_BOOTSTRAP_SQL,
    }
)


# --- round-3 wave: model-eval operators (AUC, NDCG, kNN, k-means step) --------


def ext_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the stopword-ratio signal as a detector of lang='en'
    (Mann-Whitney rank formulation with exact tie handling) — the
    threshold-free quality-classifier evaluation every filtering
    pipeline needs before it picks a cutoff (X226's lift table assumes a
    ranking is worth using; this is the number that says whether it is).

    Scale shape: per-doc scores are row-local array HOFs; the rank sum
    runs on the COLLAPSED per-score axis (score rounded to 6 → bounded
    distinct values), so the only unpartitioned window is over O(distinct
    scores), not rows."""
    docs = _t(spark, sf_dir, "documents")
    stops = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("pos_label"),
        F.size(toks).alias("n_toks"),
        F.size(
            F.filter(toks, lambda w: w.isin(stops))
        ).alias("n_stop"),
    ).filter(F.col("n_toks") > 0)
    scored = scored.select(
        "pos_label",
        F.round(F.col("n_stop") / F.col("n_toks"), 6).alias("score"),
    )
    g = scored.groupBy("score").agg(
        F.sum("pos_label").alias("np"),
        F.sum(F.lit(1) - F.col("pos_label")).alias("nn"),
    )
    wb = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("nt", F.col("np") + F.col("nn")).withColumn(
        "cb", F.coalesce(F.sum("nt").over(wb), F.lit(0))
    )
    agg = g.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(
            F.col("np") * (F.col("cb") + (F.col("nt") + 1) / 2.0)
        ).alias("rpos"),
    )
    auc = (
        F.col("rpos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select("n_pos", "n_neg", F.round(auc, 6).alias("auc"))


EXT_AUC_SQL = r"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos_label,
         ROUND(CAST(len(list_filter(toks, w -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], w)))
               AS DOUBLE) / len(toks), 6) AS score
  FROM (
    SELECT lang,
           list_filter(string_split_regex(TRIM(LOWER(text)), '\s+'),
                       w -> w <> '') AS toks
    FROM documents
  ) WHERE len(toks) > 0
),
g AS (
  SELECT score, CAST(SUM(pos_label) AS BIGINT) AS np,
         CAST(SUM(1 - pos_label) AS BIGINT) AS nn
  FROM scored GROUP BY 1
),
c AS (
  SELECT score, np, nn, np + nn AS nt,
         COALESCE(SUM(np + nn) OVER (
           ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cb
  FROM g
),
agg AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
         SUM(np * (cb + (nt + 1) / 2.0)) AS rpos
  FROM c
)
SELECT n_pos, n_neg,
       ROUND((rpos - n_pos * (n_pos + 1) / 2.0) / (n_pos * CAST(n_neg AS DOUBLE)), 6) AS auc
FROM agg
"""


def ext_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality NDCG@10 of exact cosine search with same-label
    relevance, averaged per query label — the ranking-eval companion to
    the recall tests: it scores POSITION (a relevant hit at rank 1 is
    worth more than at rank 10), which recall@k cannot see. IDCG is the
    all-relevant ideal (every label has >10 corpus members).

    Scale shape: reuses the broadcast brute-force scorer (queries tiny,
    corpus streams); the gain math runs on the O(queries*k) hit list."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    hits = similarity.brute_topk(emb, queries, k=10)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    qlab = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    gains = (
        hits.join(lab, "neighbor_id")
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            "qlabel",
            (
                (F.col("nlabel") == F.col("qlabel")).cast("double")
                / F.log2(F.col("rank") + 1)
            ).alias("g"),
        )
    )
    per_q = gains.groupBy("query_id", "qlabel").agg(
        (F.sum("g") / F.lit(4.543559338088346)).alias("ndcg")
    )
    return (
        per_q.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
        )
        .orderBy("label")
    )


EXT_NDCG_SQL = r"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel, c.vec_id AS neighbor_id,
         c.label AS nlabel,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) AS rank
  FROM scored
),
per_q AS (
  SELECT query_id, qlabel,
         SUM(CASE WHEN nlabel = qlabel THEN 1.0 ELSE 0.0 END / log2(rank + 1))
           / 4.543559338088346 AS ndcg
  FROM ranked WHERE rank <= 10 GROUP BY 1, 2
)
SELECT CAST(qlabel AS INTEGER) AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(AVG(ndcg), 6) AS mean_ndcg
FROM per_q GROUP BY 1 ORDER BY label
"""


def ext_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration (the k-means E-step + quality audit)
    seeded from the label centroids: every vector is assigned to its
    nearest centroid (squared euclidean, rounded-9 distance, label tie-
    break), reporting per-centroid membership, agreement with the
    seeding label, and inertia — the distributed k-means building block
    (iterate = loop this; converged = n_moved stops falling).

    Scale shape: centroids are an O(labels*dim) broadcast; the distance
    computation is a posexplode + broadcast join + partial-agged
    regrouping — no N×k materialization survives the exchange."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = vectors.label_centroids(emb).select(
        F.col("label").alias("clabel"), "pos", "centroid_val"
    )
    ex = emb.select(
        "vec_id",
        F.col("label").alias("ilabel"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("long"))
    d2 = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "ilabel", "clabel")
        .agg(
            F.round(
                F.sum(
                    (F.col("v") - F.col("centroid_val"))
                    * (F.col("v") - F.col("centroid_val"))
                ),
                9,
            ).alias("d2")
        )
    )
    pick = d2.groupBy("vec_id", "ilabel").agg(
        F.min(F.struct(F.col("d2"), F.col("clabel"))).alias("best")
    )
    assigned = pick.select(
        "vec_id",
        "ilabel",
        F.col("best.clabel").alias("assigned"),
        F.col("best.d2").alias("d2"),
    )
    return (
        assigned.groupBy(F.col("assigned").alias("assigned_label"))
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum((F.col("ilabel") == F.col("assigned")).cast("long")).alias(
                "n_kept"
            ),
            F.round(F.sum("d2"), 4).alias("inertia"),
        )
        .orderBy("assigned_label")
    )


EXT_KMEANS_STEP_SQL = r"""
WITH u AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
cent AS (
  SELECT label AS clabel, pos,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)
           AS centroid_val
  FROM u GROUP BY 1, 2
),
d2 AS (
  SELECT u.vec_id, u.label AS ilabel, c.clabel,
         ROUND(SUM((u.v - c.centroid_val) * (u.v - c.centroid_val)), 9) AS d2
  FROM u JOIN cent c ON c.pos = u.pos
  GROUP BY 1, 2, 3
),
pick AS (
  SELECT vec_id, ilabel, clabel AS assigned, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d2 ASC, clabel ASC
    ) AS rn FROM d2
  ) WHERE rn = 1
)
SELECT CAST(assigned AS INTEGER) AS assigned_label,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(SUM(CASE WHEN ilabel = assigned THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(d2), 4) AS inertia
FROM pick GROUP BY 1 ORDER BY assigned_label
"""


def ext_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction (k=5 cosine neighbors, majority vote, count-
    then-smallest-label tie-break) with per-label accuracy — the
    classifier-eval loop run directly on the embedding store, no model:
    the standard probe for 'are these embeddings good enough to separate
    the classes'.

    Scale shape: reuses the broadcast brute scorer on a hash-thinned
    query panel; voting and accuracy run on O(queries*k) rows."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 1)
    hits = similarity.brute_topk(emb, queries, k=5)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    votes = (
        hits.join(lab, "neighbor_id")
        .groupBy("query_id", "nlabel")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pred = votes.groupBy("query_id").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("nlabel")).alias("neg"))).alias("b")
    ).select("query_id", (-F.col("b.neg")).cast("int").alias("pred"))
    truth = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("tlabel"))
    return (
        pred.join(F.broadcast(truth), "query_id")
        .groupBy(F.col("tlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum((F.col("pred") == F.col("tlabel")).cast("long")).alias("n_correct"),
            F.round(
                F.sum((F.col("pred") == F.col("tlabel")).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


EXT_KNN_CLASSIFY_SQL = r"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % 100 = 1),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS tlabel, c.vec_id AS neighbor_id,
         c.label AS nlabel,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id
),
hits AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM scored
  ) WHERE rank <= 5
),
votes AS (
  SELECT query_id, tlabel, nlabel, COUNT(*) AS cnt
  FROM hits GROUP BY 1, 2, 3
),
pred AS (
  SELECT query_id, tlabel, nlabel AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cnt DESC, nlabel ASC
    ) AS rn FROM votes
  ) WHERE rn = 1
)
SELECT CAST(tlabel AS INTEGER) AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred = tlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred = tlabel THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS accuracy
FROM pred GROUP BY 1 ORDER BY label
"""


EXT_QUERIES.update(
    {
        "ext_auc": ext_auc,
        "ext_ndcg": ext_ndcg,
        "ext_kmeans_step": ext_kmeans_step,
        "ext_knn_classify": ext_knn_classify,
    }
)
EXT_ORACLES.update(
    {
        "ext_auc": EXT_AUC_SQL,
        "ext_ndcg": EXT_NDCG_SQL,
        "ext_kmeans_step": EXT_KMEANS_STEP_SQL,
        "ext_knn_classify": EXT_KNN_CLASSIFY_SQL,
    }
)


# --- round-3 wave: governance + pipeline ops ----------------------------------


def ext_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit completing the k-anonymity check (X100): for
    every (segment, nation) equivalence class, the number of DISTINCT
    sensitive values (order priority of the members' orders) — a class
    can be k-anonymous yet leak the sensitive attribute outright if all
    members share one value (l=1). Flags classes below l=3.

    Scale shape: membership join keyed on custkey, then one hash agg per
    QI class with a distinct-count; output is O(classes)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    joined = cust.join(
        orders, cust.c_custkey == orders.o_custkey
    )
    return (
        joined.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_orderpriority").alias("l_distinct"),
        )
        .withColumn("below_l", (F.col("l_distinct") < 3).cast("int"))
        .orderBy("c_mktsegment", "c_nationkey")
    )


EXT_L_DIVERSITY_SQL = r"""
SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
       CASE WHEN COUNT(DISTINCT o_orderpriority) < 3 THEN 1 ELSE 0 END AS below_l
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
"""


def ext_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-style count release: per-segment customer
    counts with Laplace(1/eps) noise (eps=1.0, sensitivity 1), the noise
    drawn by the same replayable hash-uniform scheme every sampler here
    uses. NOT A PRIVACY MECHANISM: the noise is a deterministic function
    of the public segment name, so the release is exactly recoverable by
    anyone who can run the same hash — the replayable-hash draw exists
    ONLY so the pipeline shape (sensitivity-calibrated perturbation of a
    restricted aggregate) is engine-portable and oracle-checkable. A
    real DP release MUST draw fresh, secret randomness per release;
    swap the `u` expression for F.rand() (and drop the oracle) to
    deploy. The governed-export complement to k-anonymity/
    pseudonymization: release aggregates, not classes.

    Scale shape: one hash agg to O(segments) rows; noise is row-local
    arithmetic on the tiny aggregate."""
    cust = _t(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("true_n"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp-"), F.col("c_mktsegment"))), 1, 12),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(281474976710656.0)
    )
    # inverse-CDF Laplace(b): b * sign(u-0.5) * ln(1 - 2|u-0.5|), b = 1/eps
    noise = (
        F.lit(-1.0)
        * F.signum(u - 0.5)
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    )
    return (
        counts.select(
            "c_mktsegment",
            F.round(F.col("true_n") + noise, 4).alias("released_n"),
            F.round(noise, 4).alias("noise"),
        )
        .orderBy("c_mktsegment")
    )


EXT_DP_RELEASE_SQL = r"""
WITH counts AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM customer GROUP BY 1
),
noised AS (
  SELECT c_mktsegment, true_n,
         -1.0 * SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5)) AS noise
  FROM (
    SELECT c_mktsegment, true_n,
           CAST(('0x' || SUBSTR(md5('dp-' || c_mktsegment), 1, 12))::UBIGINT
                AS DOUBLE) / 281474976710656.0 AS u
    FROM counts
  )
)
SELECT c_mktsegment, ROUND(true_n + noise, 4) AS released_n,
       ROUND(noise, 4) AS noise
FROM noised ORDER BY c_mktsegment
"""


def ext_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is decided by the
    DUPLICATE-CLUSTER key (normalized-content fingerprint), not the doc
    id, so exact/near copies of one document can never straddle train
    and eval — the contamination failure mode a plain hash split (X34)
    cannot prevent. 80/10/10 by hash of the cluster key; summary rows
    prove the invariant (each cluster lands in exactly one split).

    Scale shape: fingerprint is row-local; the split decision is a hash
    of it (zero shuffle, subset-stable); the audit agg is O(clusters)."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit("split-"), fp)), 1, 12), 16, 10).cast(
        "long"
    ) % 10
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    tagged = docs.select(fp.alias("cluster_fp"), split.alias("split"))
    per_cluster = tagged.groupBy("cluster_fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split").alias("n_splits"),
        F.min("split").alias("split"),
    )
    return (
        per_cluster.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("n_docs").alias("n_docs"),
            F.max("n_splits").alias("max_splits_per_cluster"),
        )
        .orderBy("split")
    )


EXT_CLUSTER_SPLIT_SQL = r"""
WITH tagged AS (
  SELECT md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS cluster_fp,
         CASE
           WHEN ('0x' || SUBSTR(md5('split-' || md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))), 1, 12))::UBIGINT % 10 < 8 THEN 'train'
           WHEN ('0x' || SUBSTR(md5('split-' || md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')))), 1, 12))::UBIGINT % 10 < 9 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
),
per_cluster AS (
  SELECT cluster_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
         MIN(split) AS split
  FROM tagged GROUP BY 1
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(n_splits) AS BIGINT) AS max_splits_per_cluster
FROM per_cluster GROUP BY 1 ORDER BY split
"""


def ext_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution: per user, first click and
    the first purchase at-or-after it; exact p50/p90/p99 of the lag in
    seconds plus the converting-user count — the time-dimension
    companion to the funnel counts (X76 says HOW MANY convert; this says
    HOW LONG conversion takes, which sets attribution windows).

    Scale shape: two conditional MINs in ONE per-user hash agg (no self-
    join); percentiles run on the O(users) collapsed frame."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c0")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.filter(F.col("c0").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("c0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"), F.min("c0").alias("c0"))
    )
    lags = purch.select(
        "user_id",
        ((F.unix_micros("p0") - F.unix_micros("c0")) / 1000000.0).alias("lag_s"),
    )
    return lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(lag_s, 0.5)"), 3).alias("p50_s"),
        F.round(F.expr("percentile(lag_s, 0.9)"), 3).alias("p90_s"),
        F.round(F.expr("percentile(lag_s, 0.99)"), 3).alias("p99_s"),
    )


EXT_CONVERSION_LAG_SQL = r"""
WITH per_user AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'click' THEN ts END) AS c0
  FROM events GROUP BY 1
),
purch AS (
  SELECT e.user_id, MIN(e.ts) AS p0, MIN(u.c0) AS c0
  FROM events e JOIN per_user u ON u.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND u.c0 IS NOT NULL AND e.ts >= u.c0
  GROUP BY 1
),
lags AS (
  SELECT (epoch_us(p0) - epoch_us(c0)) / 1000000.0 AS lag_s FROM purch
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(lag_s, 0.5), 3) AS p50_s,
       ROUND(quantile_cont(lag_s, 0.9), 3) AS p90_s,
       ROUND(quantile_cont(lag_s, 0.99), 3) AS p99_s
FROM lags
"""


EXT_QUERIES.update(
    {
        "ext_l_diversity": ext_l_diversity,
        "ext_dp_release": ext_dp_release,
        "ext_cluster_split": ext_cluster_split,
        "ext_conversion_lag": ext_conversion_lag,
    }
)
EXT_ORACLES.update(
    {
        "ext_l_diversity": EXT_L_DIVERSITY_SQL,
        "ext_dp_release": EXT_DP_RELEASE_SQL,
        "ext_cluster_split": EXT_CLUSTER_SPLIT_SQL,
        "ext_conversion_lag": EXT_CONVERSION_LAG_SQL,
    }
)


# --- round-3 wave: hybrid ranking, EWMA monitoring, FS record linkage ---------


def ext_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion hybrid ranking (k=60): BM25 relevance and
    the heuristic quality prior are each ranked WITHIN the retrieval
    candidate set (docs matching >= 1 query term), then fused as
    1/(60+r_bm25) + 1/(60+r_quality) — the standard zero-training way to
    combine heterogeneous retrieval signals; top-20 head.

    Scale shape: candidates come from the scan-filtered BM25 operator
    (non-matching docs never shuffle); both rank windows run over the
    candidate set only — retrieval-bounded, not corpus-bounded — and the
    head is a TakeOrdered k-limit."""
    docs = _t(spark, sf_dir, "documents")
    cand = text.bm25_scores(docs, BM25_QUERY_TERMS).select("doc_id", "score")
    q = text.quality_score(docs).select("doc_id", "quality")
    j = cand.join(q, "doc_id")
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    wq = Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
    ranked = j.withColumn("r_bm25", F.row_number().over(wb)).withColumn(
        "r_quality", F.row_number().over(wq)
    )
    rrf = 1.0 / (60.0 + F.col("r_bm25")) + 1.0 / (60.0 + F.col("r_quality"))
    return (
        ranked.select(
            "doc_id",
            F.col("r_bm25").cast("long").alias("r_bm25"),
            F.col("r_quality").cast("long").alias("r_quality"),
            F.round(rrf, 6).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


EXT_RRF_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS w
  FROM documents
),
lens AS (SELECT doc_id, len(w) AS dl, w FROM toks),
scalars AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM lens),
words AS (SELECT doc_id, dl, UNNEST(w) AS word FROM lens),
tf AS (
  SELECT doc_id, dl, word, COUNT(*) AS tf
  FROM words WHERE word IN ('join', 'merge', 'window')
  GROUP BY doc_id, dl, word
),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
comp AS (
  SELECT tf.doc_id,
         CAST(
           LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)
                    / (CAST(d.doc_freq AS DOUBLE) + 0.5))
           * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE)
                                     / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
           AS DECIMAL(27,12)) AS comp
  FROM tf JOIN dfreq d ON tf.word = d.word CROSS JOIN scalars s
),
cand AS (
  SELECT doc_id, ROUND(CAST(SUM(comp) AS DOUBLE), 6) AS score
  FROM comp GROUP BY doc_id
),
qual AS (
  SELECT doc_id,
         ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS quality
  FROM documents
),
ranked AS (
  SELECT c.doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY c.score DESC, c.doc_id) AS BIGINT) AS r_bm25,
         CAST(ROW_NUMBER() OVER (ORDER BY q.quality DESC, c.doc_id) AS BIGINT) AS r_quality
  FROM cand c JOIN qual q ON q.doc_id = c.doc_id
)
SELECT doc_id, r_bm25, r_quality,
       ROUND(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_quality), 6) AS rrf
FROM ranked
ORDER BY rrf DESC, doc_id LIMIT 20
"""


def ext_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily event counts (lambda=0.2, trailing
    20-day support, renormalized over OBSERVED days so calendar gaps
    don't bias the smoother): each day's EWMA against the
    mu +/- 3*sigma*sqrt(lambda/(2-lambda)) control band — the
    small-shift drift detector that reacts faster than X214's CUSUM for
    sustained level changes and is closed-form replayable (no recursion).

    Scale shape: the big table collapses to the O(days) axis first; the
    EWMA is a bounded-lag self-join on that tiny axis; control scalars
    ride a broadcast."""
    lam = 0.2
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    stats = daily.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            F.sum(F.col("x").cast("double") * F.col("x")).cast("double")
            / F.count(F.lit(1))
            - F.pow(F.sum("x").cast("double") / F.count(F.lit(1)), 2)
        ).alias("sd"),
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = daily.select(F.col("day").alias("d0"), F.col("x").alias("x0"))
    pairs = a.join(
        b,
        (F.col("d0") <= F.col("d1"))
        & (F.col("d0") > F.date_sub(F.col("d1"), 20)),
    ).select(
        "d1",
        "x1",
        "x0",
        F.pow(F.lit(1.0 - lam), F.datediff("d1", "d0")).alias("w"),
    )
    ew = pairs.groupBy("d1", "x1").agg(
        (F.sum(F.col("w") * F.col("x0")) / F.sum("w")).alias("ewma")
    )
    band = float((lam / (2.0 - lam)) ** 0.5)
    return (
        ew.crossJoin(F.broadcast(stats))
        .select(
            F.col("d1").cast("string").alias("day"),
            F.col("x1").alias("n_events"),
            F.round("ewma", 4).alias("ewma"),
            F.round(F.col("mu") + 3.0 * F.col("sd") * band, 4).alias("ucl"),
            F.round(F.col("mu") - 3.0 * F.col("sd") * band, 4).alias("lcl"),
            (
                F.abs(F.col("ewma") - F.col("mu")) > 3.0 * F.col("sd") * band
            ).alias("out_of_control"),
        )
        .orderBy("day")
    )


EXT_EWMA_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu,
         SQRT(SUM(CAST(x AS DOUBLE) * x) / COUNT(*)
              - POWER(CAST(SUM(x) AS DOUBLE) / COUNT(*), 2)) AS sd
  FROM daily
),
pairs AS (
  SELECT a.day AS d1, a.x AS x1, b.x AS x0,
         POWER(0.8, date_diff('day', b.day, a.day)) AS w
  FROM daily a JOIN daily b
    ON b.day <= a.day AND b.day > a.day - 20
),
ew AS (
  SELECT d1, x1, SUM(w * x0) / SUM(w) AS ewma
  FROM pairs GROUP BY 1, 2
)
SELECT CAST(d1 AS VARCHAR) AS day, x1 AS n_events,
       ROUND(ewma, 4) AS ewma,
       ROUND(mu + 3.0 * sd * SQRT(0.2 / 1.8), 4) AS ucl,
       ROUND(mu - 3.0 * sd * SQRT(0.2 / 1.8), 4) AS lcl,
       ABS(ewma - mu) > 3.0 * sd * SQRT(0.2 / 1.8) AS out_of_control
FROM ew CROSS JOIN stats
ORDER BY day
"""


def ext_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record-linkage scoring: nation-blocked customer
    candidate pairs classified by their agreement pattern over (segment,
    acctbal-thousand-bucket, name-last-char), with the FS match weight
    log2(m/u) per agreeing field and log2((1-m)/(1-u)) per disagreeing
    field — u-probabilities ESTIMATED from the data (random-pair
    agreement = sum of squared value shares), m set to the conventional
    literals (0.95/0.9/0.85). The statistical layer the fuzzy join
    (X72) lacks: it says how much EVIDENCE an agreement carries.

    Scale shape: pairs are equi-join blocked on nation (bounded blocks);
    u-scalars are one tiny agg each, broadcast; output is O(2^fields)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bkt"),
        F.substring(F.col("c_name"), -1, 1).alias("last_ch"),
    )

    def u_prob(col):
        # u = sum(nv^2) / n^2 with n recovered as sum(nv) — one aggregation,
        # no driver-side count() job per field
        shares = cust.groupBy(col).agg(F.count(F.lit(1)).alias("nv"))
        return shares.agg(
            (
                F.sum(F.col("nv").cast("double") * F.col("nv"))
                / (F.sum("nv").cast("double") * F.sum("nv").cast("double"))
            ).alias(f"u_{col}")
        )

    u = (
        u_prob("c_mktsegment")
        .crossJoin(u_prob("bal_bkt"))
        .crossJoin(u_prob("last_ch"))
    )
    a = cust.alias("a")
    b = cust.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).cast("int").alias("g_seg"),
        (F.col("a.bal_bkt") == F.col("b.bal_bkt")).cast("int").alias("g_bal"),
        (F.col("a.last_ch") == F.col("b.last_ch")).cast("int").alias("g_ch"),
    )
    patt = pairs.groupBy("g_seg", "g_bal", "g_ch").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    m_seg, m_bal, m_ch = 0.95, 0.9, 0.85

    def w(flag, m, ucol):
        return F.when(
            F.col(flag) == 1, F.log2(F.lit(m) / F.col(ucol))
        ).otherwise(F.log2((1.0 - m) / (1.0 - F.col(ucol))))

    return (
        patt.crossJoin(F.broadcast(u))
        .select(
            "g_seg",
            "g_bal",
            "g_ch",
            "n_pairs",
            F.round(
                w("g_seg", m_seg, "u_c_mktsegment")
                + w("g_bal", m_bal, "u_bal_bkt")
                + w("g_ch", m_ch, "u_last_ch"),
                4,
            ).alias("fs_weight"),
        )
        .orderBy("g_seg", "g_bal", "g_ch")
    )


EXT_FS_LINKAGE_SQL = r"""
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bkt,
         SUBSTR(c_name, LENGTH(c_name), 1) AS last_ch
  FROM customer
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM cust),
useg AS (
  SELECT SUM(CAST(nv AS DOUBLE) * nv) / (MAX(n.n) * MAX(n.n)) AS u_seg
  FROM (SELECT c_mktsegment, COUNT(*) AS nv FROM cust GROUP BY 1) CROSS JOIN n
),
ubal AS (
  SELECT SUM(CAST(nv AS DOUBLE) * nv) / (MAX(n.n) * MAX(n.n)) AS u_bal
  FROM (SELECT bal_bkt, COUNT(*) AS nv FROM cust GROUP BY 1) CROSS JOIN n
),
uch AS (
  SELECT SUM(CAST(nv AS DOUBLE) * nv) / (MAX(n.n) * MAX(n.n)) AS u_ch
  FROM (SELECT last_ch, COUNT(*) AS nv FROM cust GROUP BY 1) CROSS JOIN n
),
pairs AS (
  SELECT CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS g_seg,
         CASE WHEN a.bal_bkt = b.bal_bkt THEN 1 ELSE 0 END AS g_bal,
         CASE WHEN a.last_ch = b.last_ch THEN 1 ELSE 0 END AS g_ch
  FROM cust a JOIN cust b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
),
patt AS (
  SELECT g_seg, g_bal, g_ch, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1, 2, 3
)
SELECT g_seg, g_bal, g_ch, n_pairs,
       ROUND(
         (CASE WHEN g_seg = 1 THEN log2(0.95 / u_seg)
               ELSE log2((1 - 0.95) / (1 - u_seg)) END)
         + (CASE WHEN g_bal = 1 THEN log2(0.9 / u_bal)
                 ELSE log2((1 - 0.9) / (1 - u_bal)) END)
         + (CASE WHEN g_ch = 1 THEN log2(0.85 / u_ch)
                 ELSE log2((1 - 0.85) / (1 - u_ch)) END),
         4) AS fs_weight
FROM patt CROSS JOIN useg CROSS JOIN ubal CROSS JOIN uch
ORDER BY g_seg, g_bal, g_ch
"""


EXT_QUERIES.update(
    {
        "ext_rrf_fusion": ext_rrf_fusion,
        "ext_ewma_control": ext_ewma_control,
        "ext_fs_linkage": ext_fs_linkage,
    }
)
EXT_ORACLES.update(
    {
        "ext_rrf_fusion": EXT_RRF_SQL,
        "ext_ewma_control": EXT_EWMA_SQL,
        "ext_fs_linkage": EXT_FS_LINKAGE_SQL,
    }
)


# --- round-3 wave: causal stratification, coverage estimators, clustering QA --


def ext_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect estimate: does a deep discount
    (l_discount >= 0.05) move line quantity? Naive difference-in-means
    vs the brand-stratified estimator (per-stratum effect weighted by
    stratum size, strata lacking either arm dropped) — the standard
    observational-data correction when treatment assignment varies by
    product mix. Exact integer-cent arithmetic end to end.

    Scale shape: one fact-dim join (part broadcasts), one hash agg to
    O(strata × 2) cells, then O(strata) arithmetic."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount") >= 0.05).cast("int").alias("treated"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    cells = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand", "treated")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qc").alias("s"))
    )
    strata = (
        cells.groupBy("p_brand")
        .agg(
            F.sum("n").alias("n_str"),
            F.count(F.lit(1)).alias("n_arms"),
            F.sum(F.when(F.col("treated") == 1, F.col("s"))).alias("st"),
            F.sum(F.when(F.col("treated") == 1, F.col("n"))).alias("nt"),
            F.sum(F.when(F.col("treated") == 0, F.col("s"))).alias("sc"),
            F.sum(F.when(F.col("treated") == 0, F.col("n"))).alias("nc"),
        )
        .filter(F.col("n_arms") == 2)
    )
    eff = F.col("st").cast("double") / F.col("nt") - F.col("sc").cast(
        "double"
    ) / F.col("nc")
    strat = strata.agg(
        F.count(F.lit(1)).alias("n_strata"),
        (F.sum(eff * F.col("n_str")) / F.sum("n_str") / 100.0).alias("ate_strat"),
    )
    naive = (
        li.groupBy("treated")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qc").alias("s"))
        .agg(
            (
                F.sum(F.when(F.col("treated") == 1, F.col("s"))).cast("double")
                / F.sum(F.when(F.col("treated") == 1, F.col("n")))
                - F.sum(F.when(F.col("treated") == 0, F.col("s"))).cast("double")
                / F.sum(F.when(F.col("treated") == 0, F.col("n")))
            ).alias("ate_naive")
        )
    )
    return strat.crossJoin(F.broadcast(naive)).select(
        "n_strata",
        F.round(F.col("ate_naive") / 100.0, 4).alias("ate_naive"),
        F.round("ate_strat", 4).alias("ate_stratified"),
    )


EXT_STRATIFIED_ATE_SQL = r"""
WITH li AS (
  SELECT l_partkey,
         CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS treated,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem
),
cells AS (
  SELECT p.p_brand, li.treated, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qc) AS BIGINT) AS s
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY 1, 2
),
strata AS (
  SELECT p_brand, SUM(n) AS n_str, COUNT(*) AS n_arms,
         SUM(CASE WHEN treated = 1 THEN s END) AS st,
         SUM(CASE WHEN treated = 1 THEN n END) AS nt,
         SUM(CASE WHEN treated = 0 THEN s END) AS sc,
         SUM(CASE WHEN treated = 0 THEN n END) AS nc
  FROM cells GROUP BY 1 HAVING COUNT(*) = 2
),
strat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         SUM((CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc) * n_str)
           / SUM(n_str) / 100.0 AS ate_strat
  FROM strata
),
naive AS (
  SELECT (CAST(SUM(CASE WHEN treated = 1 THEN qc END) AS DOUBLE)
            / SUM(CASE WHEN treated = 1 THEN 1 END)
          - CAST(SUM(CASE WHEN treated = 0 THEN qc END) AS DOUBLE)
            / SUM(CASE WHEN treated = 0 THEN 1 END)) AS ate_naive
  FROM li
)
SELECT n_strata, ROUND(ate_naive / 100.0, 4) AS ate_naive,
       ROUND(ate_strat, 4) AS ate_stratified
FROM strat CROSS JOIN naive
"""


def ext_chao1_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary coverage estimators: Chao1 richness
    (bias-corrected V + F1(F1-1)/(2(F2+1))) and Good-Turing coverage
    (1 - F1/N) from the singleton/doubleton counts — the 'how much
    vocabulary is my crawl still missing' pair that turns X236's Heaps
    exponent into an absolute estimate.

    Scale shape: one token-count exchange per language, then O(vocab)
    collapsed to frequency-of-frequency counts; output is O(langs)."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v_obs"),
        F.sum("c").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    chao1 = F.col("v_obs") + (
        F.col("f1").cast("double") * (F.col("f1") - 1)
    ) / (2.0 * (F.col("f2") + 1))
    gt = 1.0 - F.col("f1").cast("double") / F.col("n_tokens")
    return per.select(
        "lang",
        "v_obs",
        "n_tokens",
        "f1",
        "f2",
        F.round(chao1, 2).alias("chao1_richness"),
        F.round(gt, 6).alias("gt_coverage"),
    ).orderBy("lang")


EXT_CHAO1_SQL = r"""
WITH counts AS (
  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT lang, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY 1, 2
),
per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v_obs,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts GROUP BY 1
)
SELECT lang, v_obs, n_tokens, f1, f2,
       ROUND(v_obs + (CAST(f1 AS DOUBLE) * (f1 - 1)) / (2.0 * (f2 + 1)), 2)
         AS chao1_richness,
       ROUND(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS gt_coverage
FROM per ORDER BY lang
"""


def ext_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the label clustering in
    embedding space: per vector, a = distance to own-label centroid,
    b = distance to the nearest OTHER centroid, s = (b-a)/max(a,b);
    reported as the per-label mean — the O(n·k) clustering-quality score
    (full silhouette is O(n²) and does not survive 100 TB; this is the
    standard scalable surrogate).

    Scale shape: same posexplode + broadcast-centroid join as the
    k-means step (X245); the a/b pick is one regrouping; output O(labels)."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = vectors.label_centroids(emb).select(
        F.col("label").alias("clabel"), "pos", "centroid_val"
    )
    ex = emb.select(
        "vec_id",
        F.col("label").alias("ilabel"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("long"))
    d2 = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "ilabel", "clabel")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("v") - F.col("centroid_val"))
                        * (F.col("v") - F.col("centroid_val"))
                    )
                ),
                9,
            ).alias("d")
        )
    )
    ab = d2.groupBy("vec_id", "ilabel").agg(
        F.min(F.when(F.col("clabel") == F.col("ilabel"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("ilabel"), F.col("d"))).alias("b"),
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return (
        ab.groupBy(F.col("ilabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(s), 4).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


EXT_SILHOUETTE_SQL = r"""
WITH u AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
cent AS (
  SELECT label AS clabel, pos,
         ROUND(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)
           AS centroid_val
  FROM u GROUP BY 1, 2
),
d2 AS (
  SELECT u.vec_id, u.label AS ilabel, c.clabel,
         ROUND(SQRT(SUM((u.v - c.centroid_val) * (u.v - c.centroid_val))), 9) AS d
  FROM u JOIN cent c ON c.pos = u.pos
  GROUP BY 1, 2, 3
),
ab AS (
  SELECT vec_id, ilabel,
         MIN(CASE WHEN clabel = ilabel THEN d END) AS a,
         MIN(CASE WHEN clabel <> ilabel THEN d END) AS b
  FROM d2 GROUP BY 1, 2
)
SELECT CAST(ilabel AS INTEGER) AS label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(AVG((b - a) / GREATEST(a, b)), 4) AS mean_silhouette
FROM ab GROUP BY 1 ORDER BY label
"""


def ext_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length and the
    heuristic quality score, computed WINDOW-FREE at row scale: average
    ranks come from cumulative counts over the two COLLAPSED marginal
    value axes (O(distinct values) each), mapped back by equi-join, then
    Pearson over the mapped ranks — no per-row global sort anywhere, so
    the plan survives corpus-scale inputs (the monotone-association
    companion to X97's Pearson).

    Scale shape: two tiny rank maps (broadcast back), one row-local
    join pair, one moment aggregate."""
    docs = text.quality_score(_t(spark, sf_dir, "documents")).select(
        F.col("n_chars").alias("x"), F.col("quality").alias("y")
    )

    def rank_map(col):
        g = docs.groupBy(F.col(col).alias(col)).agg(F.count(F.lit(1)).alias("n"))
        wb = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return g.select(
            col,
            (
                F.coalesce(F.sum("n").over(wb), F.lit(0))
                + (F.col("n") + 1) / 2.0
            ).alias(f"r_{col}"),
        )
    ranked = docs.join(F.broadcast(rank_map("x")), "x").join(
        F.broadcast(rank_map("y")), "y"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_x").alias("sx"),
        F.sum("r_y").alias("sy"),
        F.sum(F.col("r_x") * F.col("r_x")).alias("sxx"),
        F.sum(F.col("r_y") * F.col("r_y")).alias("syy"),
        F.sum(F.col("r_x") * F.col("r_y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        F.col("n").alias("n_docs"), F.round(rho, 6).alias("spearman_rho")
    )


EXT_SPEARMAN_SQL = r"""
WITH docs AS (
  SELECT n_chars AS x,
         ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS y
  FROM documents
),
rx AS (
  SELECT x, COALESCE(SUM(n) OVER (
           ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + (n + 1) / 2.0 AS r_x
  FROM (SELECT x, COUNT(*) AS n FROM docs GROUP BY 1)
),
ry AS (
  SELECT y, COALESCE(SUM(n) OVER (
           ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + (n + 1) / 2.0 AS r_y
  FROM (SELECT y, COUNT(*) AS n FROM docs GROUP BY 1)
),
ranked AS (
  SELECT r_x, r_y FROM docs d JOIN rx ON rx.x = d.x JOIN ry ON ry.y = d.y
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(r_x) AS sx, SUM(r_y) AS sy,
         SUM(r_x * r_x) AS sxx, SUM(r_y * r_y) AS syy, SUM(r_x * r_y) AS sxy
  FROM ranked
)
SELECT n AS n_docs,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS spearman_rho
FROM agg
"""


EXT_QUERIES.update(
    {
        "ext_stratified_ate": ext_stratified_ate,
        "ext_chao1_coverage": ext_chao1_coverage,
        "ext_silhouette": ext_silhouette,
        "ext_spearman": ext_spearman,
    }
)
EXT_ORACLES.update(
    {
        "ext_stratified_ate": EXT_STRATIFIED_ATE_SQL,
        "ext_chao1_coverage": EXT_CHAO1_SQL,
        "ext_silhouette": EXT_SILHOUETTE_SQL,
        "ext_spearman": EXT_SPEARMAN_SQL,
    }
)


# --- round-3 wave: graph modularity, attribution, calibration, PCA step -------


def ext_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LABEL partition over the symmetrized
    5-NN cosine graph — community-structure quality of the embedding
    space (positive = labels really are neighborhoods; ~0 = labels are
    noise w.r.t. geometry). Q = sum_c (e_c/m - (d_c/(2m))^2) over
    undirected distinct edges.

    Scale shape: vertices are a deterministic hash-thinned panel (the
    structure metric is stable under vertex sampling); the k-NN edge
    list comes from the broadcast brute scorer here (oracle-exact) — at
    corpus scale swap in the IVF/LSH candidate paths (X7/X8) — and the
    modularity math downstream is one O(edges) tag + two O(labels)
    aggregates either way."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    hits = similarity.brute_topk(emb, emb, k=5)
    edges = (
        hits.select(
            F.least("query_id", "neighbor_id").alias("u"),
            F.greatest("query_id", "neighbor_id").alias("v"),
        )
        .distinct()
    )
    lab = emb.select("vec_id", "label")
    tagged = (
        edges.join(
            F.broadcast(lab.select(F.col("vec_id").alias("u"), F.col("label").alias("lu"))),
            "u",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("v"), F.col("label").alias("lv"))),
            "v",
        )
    )
    m = tagged.agg(F.count(F.lit(1)).alias("m"))
    intra = tagged.filter(F.col("lu") == F.col("lv")).groupBy(
        F.col("lu").alias("label")
    ).agg(F.count(F.lit(1)).alias("ec"))
    deg = (
        tagged.select(F.col("lu").alias("label"))
        .unionByName(tagged.select(F.col("lv").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    per = (
        deg.join(intra, "label", "left")
        .na.fill({"ec": 0})
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            (
                F.col("ec").cast("double") / F.col("m")
                - F.pow(F.col("dc").cast("double") / (2.0 * F.col("m")), 2)
            ).alias("q_c"),
            F.col("m"),
        )
    )
    return per.agg(
        F.max("m").alias("n_edges"),
        F.round(F.sum("q_c"), 6).alias("modularity"),
    )


EXT_MODULARITY_SQL = r"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 2 = 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM e q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id
),
hits AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM scored
  ) WHERE rank <= 5
),
edges AS (
  SELECT DISTINCT LEAST(query_id, neighbor_id) AS u,
         GREATEST(query_id, neighbor_id) AS v
  FROM hits
),
tagged AS (
  SELECT ed.u, ed.v, a.label AS lu, b.label AS lv
  FROM edges ed
  JOIN embeddings a ON a.vec_id = ed.u
  JOIN embeddings b ON b.vec_id = ed.v
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
intra AS (
  SELECT lu AS label, CAST(COUNT(*) AS BIGINT) AS ec
  FROM tagged WHERE lu = lv GROUP BY 1
),
deg AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS dc FROM (
    SELECT lu AS label FROM tagged UNION ALL SELECT lv AS label FROM tagged
  ) GROUP BY 1
)
SELECT MAX(m.m) AS n_edges,
       ROUND(SUM(CAST(COALESCE(i.ec, 0) AS DOUBLE) / m.m
                 - POWER(CAST(d.dc AS DOUBLE) / (2.0 * m.m), 2)), 6) AS modularity
FROM deg d LEFT JOIN intra i ON i.label = d.label CROSS JOIN m
"""


def ext_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: each purchase
    credits the user's clicks in the preceding 24h — 40% to the first
    touch, 40% to the last, the middle 20% split evenly over interior
    touches (all credit to a lone touch) — aggregated to the day of the
    purchase. The industry-standard middle ground between first-touch
    and last-touch single-credit models (X76 counts conversions; this
    allocates their value).

    Scale shape: one time-bucketed user join bounds the touch scan; the
    credit math is closed-form per (purchase, touch-count) from ranked
    positions — no per-purchase iteration."""
    ev = _t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    touches = purch.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    )
    w = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    ranked = touches.withColumn("pos", F.row_number().over(w)).withColumn(
        "n_t", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    )
    credit = (
        F.when(F.col("n_t") == 1, 1.0)
        .when(F.col("pos") == 1, 0.4)
        .when(F.col("pos") == F.col("n_t"), 0.4)
        .otherwise(0.2 / (F.col("n_t") - 2))
    )
    return (
        ranked.select(
            F.to_date("p_ts").alias("day"),
            (credit * F.col("vc") / 100.0).alias("cr"),
        )
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("cr"), 4).alias("attributed_value"),
        )
        .orderBy("day")
    )


EXT_ATTRIBUTION_SQL = r"""
WITH purch AS (
  SELECT user_id, event_id AS p_id, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id AS c_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
touches AS (
  SELECT p.p_id, p.p_ts, p.vc, c.c_id, c.c_ts
  FROM purch p JOIN clicks c ON c.user_id = p.user_id
  WHERE c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 24 HOURS
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS pos,
         COUNT(*) OVER (PARTITION BY p_id) AS n_t
  FROM touches
),
credited AS (
  SELECT CAST(CAST(p_ts AS DATE) AS VARCHAR) AS day,
         (CASE WHEN n_t = 1 THEN 1.0
               WHEN pos = 1 THEN 0.4
               WHEN pos = n_t THEN 0.4
               ELSE 0.2 / (n_t - 2) END) * vc / 100.0 AS cr
  FROM ranked
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(SUM(cr), 4) AS attributed_value
FROM credited GROUP BY 1 ORDER BY day
"""


def ext_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the quality score as a pseudo-probability of
    lang='en': ten fixed-width bins, mean predicted vs observed rate per
    bin, plus each bin's Brier contribution — discrimination (X243's
    AUC) and calibration are different failures; a ranker can order
    perfectly and still be uncalibrated, which is what threshold choices
    get wrong.

    Scale shape: row-local binning, one O(bins) hash agg."""
    docs = text.quality_score(_t(spark, sf_dir, "documents")).select(
        F.col("quality").alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    # p has 4 decimal places -> x1e4 is an exact integer; all bin stats are
    # then integer-exact ratios, immune to float-sum order AND to the
    # round-at-6 halfway trap (a double avg() landed exactly on .8496875
    # here and the two engines rounded it opposite ways)
    binned = docs.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(F.col("p") * 10000).cast("long").alias("pi"),
        "y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("pi") / (F.count(F.lit(1)) * 10000.0), 6).alias(
                "mean_pred"
            ),
            F.round(
                F.sum("y") / F.count(F.lit(1)).cast("double"), 6
            ).alias("obs_rate"),
            F.round(
                F.sum(
                    (F.col("pi") - F.col("y") * 10000)
                    * (F.col("pi") - F.col("y") * 10000)
                )
                / 100000000.0,
                4,
            ).alias("brier_sum"),
        )
        .orderBy("bin")
    )


EXT_CALIBRATION_SQL = r"""
WITH docs AS (
  SELECT ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
)
SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(p * 10000) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 10000.0), 6) AS mean_pred,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS obs_rate,
       ROUND(CAST(SUM((CAST(ROUND(p * 10000) AS BIGINT) - y * 10000)
                      * (CAST(ROUND(p * 10000) AS BIGINT) - y * 10000)) AS DOUBLE)
             / 100000000.0, 4) AS brier_sum
FROM docs GROUP BY 1 ORDER BY bin
"""


def ext_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal direction of the CENTERED embedding corpus by
    three in-plan power iterations over the distributed gram matrix
    (long-form 64x64 after one pass over the vectors): matvec = equi-
    join + regroup, renormalized each round; reports the per-dimension
    component (sign-fixed) and the Rayleigh-quotient eigenvalue — the
    distributed-PCA building block (the corpus-sized pass is the gram
    build; everything after is O(dim^2)).

    Scale shape: ONE data-sized exchange (the gram build, exact decimal
    sums); the iterations run on 64x64 rows. Deterministic start vector
    => engine-replayable (the oracle runs the same unrolled recursion)."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p0", "val"),
    ).select("vec_id", (F.col("p0") + 1).alias("pos"), "val")
    mean = ex.groupBy("pos").agg(
        (
            F.sum(F.col("val").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    cent = ex.join(F.broadcast(mean), "pos").select(
        "vec_id", "pos", F.round(F.col("val") - F.col("mu"), 9).alias("val")
    )
    gram = (
        cent.alias("a")
        .join(cent.alias("b"), F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
        .agg(
            F.round(
                F.sum(
                    F.col("a.val").cast("decimal(19,9)")
                    * F.col("b.val").cast("decimal(19,9)")
                ).cast("double"),
                6,
            ).alias("g")
        )
        # materialize the dim^2 gram ONCE: each power iteration references it
        # again, and without truncation the corpus-sized build would re-run
        # per reference (measured 6x re-execution -> 15 s; checkpointed ~3 s)
        .localCheckpoint()
    )
    # power iteration on the tiny 64x64 frame: v0 = uniform unit vector
    dim_f = gram.select(F.col("i").alias("pos")).distinct()
    v = dim_f.crossJoin(
        F.broadcast(dim_f.agg(F.count(F.lit(1)).alias("d")))
    ).select("pos", (1.0 / F.sqrt(F.col("d"))).alias("x"))
    for _ in range(3):
        gv = (
            gram.join(v.select(F.col("pos").alias("j"), "x"), "j")
            .groupBy(F.col("i").alias("pos"))
            .agg(F.sum(F.col("g") * F.col("x")).alias("gx"))
        )
        nrm = gv.agg(F.sqrt(F.sum(F.col("gx") * F.col("gx"))).alias("nn"))
        v = gv.crossJoin(F.broadcast(nrm)).select(
            "pos", (F.col("gx") / F.col("nn")).alias("x")
        )
    gv = (
        gram.join(v.select(F.col("pos").alias("j"), "x"), "j")
        .groupBy(F.col("i").alias("pos"))
        .agg(F.sum(F.col("g") * F.col("x")).alias("gx"))
    )
    lam = (
        v.join(gv, "pos")
        .agg(F.sum(F.col("x") * F.col("gx")).alias("lam"))
    )
    sign = v.orderBy("pos").limit(1).select(
        F.when(F.col("x") < 0, -1.0).otherwise(1.0).alias("sgn")
    )
    return (
        v.crossJoin(F.broadcast(sign))
        .crossJoin(F.broadcast(lam))
        .select(
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("x") * F.col("sgn"), 6).alias("component"),
            F.round("lam", 4).alias("eigenvalue"),
        )
        .orderBy("pos")
    )


EXT_PCA_POWER_SQL = r"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
),
mean AS (
  SELECT pos,
         CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS mu
  FROM ex GROUP BY 1
),
cent AS (
  SELECT e.vec_id, e.pos, ROUND(e.val - m.mu, 9) AS val
  FROM ex e JOIN mean m ON m.pos = e.pos
),
gram AS (
  SELECT a.pos AS i, b.pos AS j,
         ROUND(CAST(SUM(CAST(a.val AS DECIMAL(19,9)) * CAST(b.val AS DECIMAL(19,9)))
                    AS DOUBLE), 6) AS g
  FROM cent a JOIN cent b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
dims AS (SELECT DISTINCT i AS pos FROM gram),
d AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM dims),
v0 AS (SELECT pos, 1.0 / SQRT(d.d) AS x FROM dims CROSS JOIN d),
gv1 AS (
  SELECT g.i AS pos, SUM(g.g * v.x) AS gx
  FROM gram g JOIN v0 v ON v.pos = g.j GROUP BY 1
),
n1 AS (SELECT SQRT(SUM(gx * gx)) AS nn FROM gv1),
v1 AS (SELECT pos, gx / nn AS x FROM gv1 CROSS JOIN n1),
gv2 AS (
  SELECT g.i AS pos, SUM(g.g * v.x) AS gx
  FROM gram g JOIN v1 v ON v.pos = g.j GROUP BY 1
),
n2 AS (SELECT SQRT(SUM(gx * gx)) AS nn FROM gv2),
v2 AS (SELECT pos, gx / nn AS x FROM gv2 CROSS JOIN n2),
gv3 AS (
  SELECT g.i AS pos, SUM(g.g * v.x) AS gx
  FROM gram g JOIN v2 v ON v.pos = g.j GROUP BY 1
),
n3 AS (SELECT SQRT(SUM(gx * gx)) AS nn FROM gv3),
v3 AS (SELECT pos, gx / nn AS x FROM gv3 CROSS JOIN n3),
gv4 AS (
  SELECT g.i AS pos, SUM(g.g * v.x) AS gx
  FROM gram g JOIN v3 v ON v.pos = g.j GROUP BY 1
),
lam AS (
  SELECT SUM(v.x * gv.gx) AS lam
  FROM v3 v JOIN gv4 gv ON gv.pos = v.pos
),
sgn AS (
  SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS sgn
  FROM v3 ORDER BY pos LIMIT 1
)
SELECT CAST(v.pos AS BIGINT) AS pos,
       ROUND(v.x * s.sgn, 6) AS component,
       ROUND(l.lam, 4) AS eigenvalue
FROM v3 v CROSS JOIN sgn s CROSS JOIN lam l
ORDER BY pos
"""


EXT_QUERIES.update(
    {
        "ext_modularity": ext_modularity,
        "ext_attribution": ext_attribution,
        "ext_calibration": ext_calibration,
        "ext_pca_power": ext_pca_power,
    }
)
EXT_ORACLES.update(
    {
        "ext_modularity": EXT_MODULARITY_SQL,
        "ext_attribution": EXT_ATTRIBUTION_SQL,
        "ext_calibration": EXT_CALIBRATION_SQL,
        "ext_pca_power": EXT_PCA_POWER_SQL,
    }
)


# --- round-3 wave: price indices, threshold tuning, trend test, agreement -----


def ext_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices for the part catalog,
    current period (shipdate >= 1998) vs base (< 1998): unit prices are
    period revenue / period quantity per part, quantities the period
    totals; only parts traded in BOTH periods enter (matched-basket
    rule, the standard index construction). The price-level companion to
    the YoY growth query (X99) that separates price from volume.

    Scale shape: one per-(part, period) collapse in exact cents, a self-
    aligned regroup to one row per part, one O(parts) index aggregate."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") >= 1998).cast("int").alias("cur"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ec"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    per = li.groupBy("l_partkey", "cur").agg(
        F.sum("ec").alias("e"), F.sum("qc").alias("q")
    )
    both = (
        per.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_per"),
            F.sum(F.when(F.col("cur") == 0, F.col("e"))).alias("e0"),
            F.sum(F.when(F.col("cur") == 0, F.col("q"))).alias("q0"),
            F.sum(F.when(F.col("cur") == 1, F.col("e"))).alias("e1"),
            F.sum(F.when(F.col("cur") == 1, F.col("q"))).alias("q1"),
        )
        .filter(F.col("n_per") == 2)
    )
    p0 = F.col("e0").cast("double") / F.col("q0")
    p1 = F.col("e1").cast("double") / F.col("q1")
    agg = both.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(p1 * F.col("q0")).alias("l_num"),
        F.sum(p0 * F.col("q0")).alias("l_den"),
        F.sum(p1 * F.col("q1")).alias("p_num"),
        F.sum(p0 * F.col("q1")).alias("p_den"),
    )
    lasp = F.col("l_num") / F.col("l_den")
    paas = F.col("p_num") / F.col("p_den")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


EXT_PRICE_INDEX_SQL = r"""
WITH li AS (
  SELECT l_partkey,
         CASE WHEN year(l_shipdate) >= 1998 THEN 1 ELSE 0 END AS cur,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ec,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem
),
per AS (
  SELECT l_partkey, cur, CAST(SUM(ec) AS BIGINT) AS e, CAST(SUM(qc) AS BIGINT) AS q
  FROM li GROUP BY 1, 2
),
matched AS (
  SELECT l_partkey,
         SUM(CASE WHEN cur = 0 THEN e END) AS e0,
         SUM(CASE WHEN cur = 0 THEN q END) AS q0,
         SUM(CASE WHEN cur = 1 THEN e END) AS e1,
         SUM(CASE WHEN cur = 1 THEN q END) AS q1
  FROM per GROUP BY 1 HAVING COUNT(*) = 2
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM((CAST(e1 AS DOUBLE) / q1) * q0) AS l_num,
         SUM((CAST(e0 AS DOUBLE) / q0) * q0) AS l_den,
         SUM((CAST(e1 AS DOUBLE) / q1) * q1) AS p_num,
         SUM((CAST(e0 AS DOUBLE) / q0) * q1) AS p_den
  FROM matched
)
SELECT n_parts,
       ROUND(l_num / l_den, 6) AS laspeyres,
       ROUND(p_num / p_den, 6) AS paasche,
       ROUND(SQRT((l_num / l_den) * (p_num / p_den)), 6) AS fisher
FROM agg
"""


def ext_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-optimal decision threshold for the quality-score -> lang='en'
    classifier: sweep every distinct score as 'predict positive if
    score >= t', report the maximizing threshold with its confusion
    counts and precision/recall/F1 — the step after X243's AUC and
    X260's calibration that actually OPERATIONALIZES the score. All
    candidate F1s come from exact integer cumulative counts, so the
    argmax is engine-stable.

    Scale shape: the sweep runs on the collapsed per-score axis
    (cumulative window over O(distinct scores)); the pick is a 1-row
    TakeOrdered."""
    docs = text.quality_score(_t(spark, sf_dir, "documents")).select(
        F.col("quality").alias("score"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    g = docs.groupBy("score").agg(
        F.sum("y").alias("np"), F.sum(F.lit(1) - F.col("y")).alias("nn")
    )
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = docs.agg(F.sum("y").alias("n_pos"))
    cum = (
        g.withColumn("tp", F.sum("np").over(wd))
        .withColumn("fp", F.sum("nn").over(wd))
        .crossJoin(F.broadcast(tot))
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")
    rec = F.col("tp") / F.col("n_pos").cast("double")
    f1 = 2.0 * prec * rec / (prec + rec)
    scored = cum.select(
        F.col("score").alias("threshold"),
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    return scored.orderBy(F.col("f1").desc(), F.col("threshold").asc()).limit(1)


EXT_OPTIMAL_THRESHOLD_SQL = r"""
WITH docs AS (
  SELECT ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
g AS (
  SELECT score, CAST(SUM(y) AS BIGINT) AS np, CAST(SUM(1 - y) AS BIGINT) AS nn
  FROM docs GROUP BY 1
),
tot AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos FROM docs),
cum AS (
  SELECT score,
         CAST(SUM(np) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         CAST(SUM(nn) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
  FROM g
),
scored AS (
  SELECT score AS threshold, tp, fp, t.n_pos - tp AS fn,
         ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
         ROUND(CAST(tp AS DOUBLE) / t.n_pos, 6) AS recall,
         ROUND(2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / t.n_pos)
               / (CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / t.n_pos), 6) AS f1
  FROM cum CROSS JOIN tot t
)
SELECT * FROM scored ORDER BY f1 DESC, threshold ASC LIMIT 1
"""


def ext_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on daily order revenue:
    S = sum of pairwise signs (exact integer), tie-corrected variance,
    and the continuity-corrected z statistic — the distribution-free
    'is there a monotone trend' answer that X97's Pearson (linearity)
    and X228's seasonal checks do not give.

    Scale shape: the fact table collapses to the O(days) axis first; the
    pairwise sweep is a self-join on that tiny axis (days², independent
    of corpus scale); tie groups collapse to O(distinct values)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"))
    s = (
        a.join(b, F.col("d1") < F.col("d2"))
        .agg(F.sum(F.signum((F.col("x2") - F.col("x1")).cast("double")).cast("long")).alias("s"))
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term").cast("double")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(var_s, 4).alias("var_s"),
        F.round(z, 4).alias("z"),
        F.when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


EXT_MANN_KENDALL_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.day < b.day
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT x, COUNT(*) AS t FROM daily GROUP BY 1 HAVING COUNT(*) > 1)
),
j AS (
  SELECT s.s, nd.n, ties.tie_term,
         (CAST(nd.n AS DOUBLE) * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term)
           / 18.0 AS var_s
  FROM s CROSS JOIN nd CROSS JOIN ties
)
SELECT n AS n_days, s AS s_stat, ROUND(var_s, 4) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                  WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                  ELSE 0.0 END, 4) AS z,
       CASE WHEN (CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                       WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                       ELSE 0.0 END) > 1.96 THEN 'increasing'
            WHEN (CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                       WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                       ELSE 0.0 END) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM j
"""


def ext_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between the declared language column and
    the marker-based language detector (X11) — chance-corrected
    agreement, the right score when class priors are skewed (raw
    accuracy rewards always-guessing-the-majority; X222's confusion
    matrix shows WHERE they disagree, kappa says HOW MUCH beyond
    chance).

    Scale shape: one O(langs²) contingency collapse; marginals and the
    kappa arithmetic run on that tiny frame."""
    docs = text.lang_id(_t(spark, sf_dir, "documents")).select(
        F.col("lang").alias("a"), F.col("pred_lang").alias("b")
    )
    cells = docs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    agg = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))).alias("n_agree"),
    )
    ra = cells.groupBy("a").agg(F.sum("n").alias("na"))
    cb = cells.groupBy("b").agg(F.sum("n").alias("nb"))
    pe = (
        ra.join(cb, ra.a == cb.b)
        .agg(F.sum(F.col("na").cast("double") * F.col("nb")).alias("pe_num"))
    )
    j = agg.crossJoin(F.broadcast(pe))
    po = F.col("n_agree").cast("double") / F.col("n_docs")
    pe_c = F.col("pe_num") / (F.col("n_docs").cast("double") * F.col("n_docs"))
    return j.select(
        "n_docs",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe_c, 6).alias("pe"),
        F.round((po - pe_c) / (1.0 - pe_c), 6).alias("kappa"),
    )


EXT_COHENS_KAPPA_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang,
         LEN(regexp_extract_all(LOWER(text), '\b(der|und|das|nicht)\b')) AS score_de,
         LEN(regexp_extract_all(LOWER(text), '\b(the|and|of|is)\b')) AS score_en,
         LEN(regexp_extract_all(LOWER(text), '\b(el|los|una|que)\b')) AS score_es,
         LEN(regexp_extract_all(LOWER(text), '\b(le|la|les|des)\b')) AS score_fr
  FROM documents
),
pred AS (
  SELECT lang AS a,
         CASE
           WHEN GREATEST(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
           WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr) THEN 'de'
           WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr) THEN 'en'
           WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr) THEN 'es'
           ELSE 'fr'
         END AS b
  FROM scored
),
cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN a = b THEN n END) AS BIGINT) AS n_agree
  FROM cells
),
pe AS (
  SELECT SUM(CAST(ra.na AS DOUBLE) * cb.nb) AS pe_num
  FROM (SELECT a, SUM(n) AS na FROM cells GROUP BY 1) ra
  JOIN (SELECT b, SUM(n) AS nb FROM cells GROUP BY 1) cb ON cb.b = ra.a
)
SELECT n_docs, n_agree,
       ROUND(CAST(n_agree AS DOUBLE) / n_docs, 6) AS po,
       ROUND(pe_num / (CAST(n_docs AS DOUBLE) * n_docs), 6) AS pe,
       ROUND((CAST(n_agree AS DOUBLE) / n_docs
              - pe_num / (CAST(n_docs AS DOUBLE) * n_docs))
             / (1.0 - pe_num / (CAST(n_docs AS DOUBLE) * n_docs)), 6) AS kappa
FROM agg CROSS JOIN pe
"""


EXT_QUERIES.update(
    {
        "ext_price_index": ext_price_index,
        "ext_optimal_threshold": ext_optimal_threshold,
        "ext_mann_kendall": ext_mann_kendall,
        "ext_cohens_kappa": ext_cohens_kappa,
    }
)
EXT_ORACLES.update(
    {
        "ext_price_index": EXT_PRICE_INDEX_SQL,
        "ext_optimal_threshold": EXT_OPTIMAL_THRESHOLD_SQL,
        "ext_mann_kendall": EXT_MANN_KENDALL_SQL,
        "ext_cohens_kappa": EXT_COHENS_KAPPA_SQL,
    }
)


# --- round-3 wave: cohort LTV, concurrency sweep, HHI, intrinsic dimension ----


def ext_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase value per first-seen weekly cohort by account
    age (weeks since first event) — the REVENUE companion to the X77
    activity-retention triangle: cohort quality comparisons need the
    money curve, not just the active-user curve. Exact cents throughout;
    the running total is a window over the O(weeks) age axis per cohort.

    Scale shape: one per-user collapse for first-seen, one broadcast-
    joined purchase pass, one (cohort x age) hash agg; the cumsum runs
    on the tiny cohort-age grid."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    cohort = first.select(
        "user_id", F.date_trunc("week", F.col("d0")).cast("date").alias("cw"), "d0"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
        .join(cohort, "user_id")
        .select(
            "cw",
            F.floor(F.datediff("d", "d0") / 7).cast("long").alias("age_w"),
            "vc",
        )
    )
    grid = purch.groupBy("cw", "age_w").agg(
        F.count(F.lit(1)).alias("n_purchases"), F.sum("vc").alias("v")
    )
    wc = (
        Window.partitionBy("cw")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.withColumn("cum", F.sum("v").over(wc))
        .select(
            F.col("cw").cast("string").alias("cohort_week"),
            "age_w",
            "n_purchases",
            F.round(F.col("cum") / 100.0, 2).alias("cum_value"),
        )
        .orderBy("cohort_week", "age_w")
    )


EXT_COHORT_LTV_SQL = r"""
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
),
cohort AS (
  SELECT user_id, CAST(date_trunc('week', d0) AS DATE) AS cw, d0 FROM first
),
purch AS (
  SELECT c.cw,
         CAST(FLOOR(date_diff('day', c.d0, CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
           AS age_w,
         CAST(ROUND(e.value * 100) AS BIGINT) AS vc
  FROM events e JOIN cohort c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
),
grid AS (
  SELECT cw, age_w, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         CAST(SUM(vc) AS BIGINT) AS v
  FROM purch GROUP BY 1, 2
)
SELECT CAST(cw AS VARCHAR) AS cohort_week, age_w, n_purchases,
       ROUND(CAST(SUM(v) OVER (PARTITION BY cw ORDER BY age_w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0, 2) AS cum_value
FROM grid ORDER BY cohort_week, age_w
"""


def ext_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by the sweep-line method:
    sessionize (30-min gap, X78's rule), emit +1/-1 at session
    boundaries, running-sum within the day ordered (ts, starts-first) —
    max overlap is the capacity number a per-hour distinct count (X102)
    structurally underestimates. Sessions are day-local here (the gap
    rule plus the data's intraday sessions); cross-midnight carry is
    documented out of scope.

    Scale shape: per-user windows for session breaks (high-cardinality
    key), then the sweep runs in per-DAY partitions — bounded windows
    only, no global sort."""
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev", F.lag("ts").over(wu))
        .withColumn(
            "brk",
            (
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") > 1800 * 1000000)
            ).cast("long"),
        )
        .withColumn("sid", F.sum("brk").over(wu))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    bounds = sess.select(
        F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta")))
    wd = (
        Window.partitionBy(F.to_date("ts"))
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = bounds.withColumn("running", F.sum("delta").over(wd))
    return (
        swept.groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(
            # count session STARTS in the day (a boundary-pair halving would
            # go fractional when a session crosses midnight — and DuckDB
            # rounds double->bigint casts while Spark truncates)
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_sessions_started"
            ),
            F.max("running").alias("peak_concurrency"),
        )
        .orderBy("day")
    )


EXT_PEAK_CONCURRENCY_SQL = r"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, sid, MIN(ts) AS s, MAX(ts) AS e FROM (
    SELECT user_id, ts,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marked
  ) GROUP BY 1, 2
),
bounds AS (
  SELECT s AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM sess
),
swept AS (
  SELECT ts, delta,
         SUM(delta) OVER (PARTITION BY CAST(ts AS DATE)
           ORDER BY ts, delta DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM bounds
)
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started,
       CAST(MAX(running) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY 1 ORDER BY day
"""


def ext_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per part type:
    HHI = 10000 * sum of squared revenue shares across suppliers within
    the type — the antitrust-style single-source-risk number (X110's
    top-decile share and X117's Gini rank customers; HHI is the
    squared-share market-structure view). Exact cents; >2500 flags
    'highly concentrated'.

    Scale shape: one (type, supplier) collapse, one O(cells) regroup."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ec"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    cells = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("ec").alias("rev"))
    )
    hhi = (
        cells.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (
                10000.0
                * F.sum(F.col("rev").cast("double") * F.col("rev"))
                / (F.sum("rev").cast("double") * F.sum("rev").cast("double"))
            ).alias("h"),
        )
    )
    return hhi.select(
        "p_type",
        "n_suppliers",
        F.round("h", 2).alias("hhi"),
        (F.col("h") > 2500).alias("highly_concentrated"),
    ).orderBy("p_type")


EXT_HHI_SQL = r"""
WITH cells AS (
  SELECT p.p_type, li.l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY 1, 2
),
hhi AS (
  SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         10000.0 * SUM(CAST(rev AS DOUBLE) * rev)
           / (CAST(SUM(rev) AS DOUBLE) * SUM(rev)) AS h
  FROM cells GROUP BY 1
)
SELECT p_type, n_suppliers, ROUND(h, 2) AS hhi, h > 2500 AS highly_concentrated
FROM hhi ORDER BY p_type
"""


def ext_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al.) of the
    embedding manifold: ID = n / sum ln(r2/r1) over each point's two
    nearest euclidean neighbors — says how many effective degrees of
    freedom the 64-dim vectors actually use (guides PQ subspaces, ANN
    recall expectations, and whether dimension reduction is safe).
    Zero-distance duplicates are excluded (their ratio is undefined).

    Scale shape: exact 2-NN on a hash-thinned panel via the broadcast
    pair scan (swap in ANN candidates at corpus scale); the MLE is one
    O(panel) aggregate."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    pairs = (
        F.broadcast(e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
        .crossJoin(e.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
        .filter(F.col("qid") != F.col("cid"))
    )
    d = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        9,
    )
    scored = pairs.select("qid", "cid", d.alias("d")).filter(F.col("d") > 0)
    wq = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("cid").asc())
    nn2 = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .groupBy("qid")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("r1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("r2"),
        )
        .filter(F.col("r1") > 0)
    )
    return nn2.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.count(F.lit(1)) / F.sum(F.log(F.col("r2") / F.col("r1"))), 4
        ).alias("intrinsic_dim"),
    )


EXT_INTRINSIC_DIM_SQL = r"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 4 = 0
),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(list_distance(q.v, c.v), 9) AS d
  FROM e q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id AND ROUND(list_distance(q.v, c.v), 9) > 0
),
nn2 AS (
  SELECT qid,
         MIN(CASE WHEN rn = 1 THEN d END) AS r1,
         MIN(CASE WHEN rn = 2 THEN d END) AS r2
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid ASC) AS rn
    FROM scored
  ) WHERE rn <= 2 GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(COUNT(*) / SUM(LN(r2 / r1)), 4) AS intrinsic_dim
FROM nn2 WHERE r1 > 0
"""


EXT_QUERIES.update(
    {
        "ext_cohort_ltv": ext_cohort_ltv,
        "ext_peak_concurrency": ext_peak_concurrency,
        "ext_hhi": ext_hhi,
        "ext_intrinsic_dim": ext_intrinsic_dim,
    }
)
EXT_ORACLES.update(
    {
        "ext_cohort_ltv": EXT_COHORT_LTV_SQL,
        "ext_peak_concurrency": EXT_PEAK_CONCURRENCY_SQL,
        "ext_hhi": EXT_HHI_SQL,
        "ext_intrinsic_dim": EXT_INTRINSIC_DIM_SQL,
    }
)


# --- round-3 wave: SLA lag, dedup threshold curve, raking, salting plan -------


def ext_sla_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag distribution per order priority:
    exact p50/p90/p99 (days), max, and the share beyond a 90-day SLA —
    the operations-facing latency audit (X250 measures user conversion
    lag; this measures the supply side, keyed to the priority the
    customer paid for).

    Scale shape: one keyed fact-fact join (both sides hashed on
    orderkey), collapse to integer day lags, exact percentiles per
    O(priorities) group."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    lags = li.join(orders, "l_orderkey").select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_d"
        ),
    )
    return (
        lags.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.expr("percentile(lag_d, 0.5)"), 2).alias("p50_d"),
            F.round(F.expr("percentile(lag_d, 0.9)"), 2).alias("p90_d"),
            F.round(F.expr("percentile(lag_d, 0.99)"), 2).alias("p99_d"),
            F.max("lag_d").alias("max_d"),
            F.round(
                F.sum((F.col("lag_d") > 90).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("sla_breach_rate"),
        )
        .orderBy("o_orderpriority")
    )


EXT_SLA_SHIP_LAG_SQL = r"""
WITH lags AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
           AS lag_d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(quantile_cont(lag_d, 0.5), 2) AS p50_d,
       ROUND(quantile_cont(lag_d, 0.9), 2) AS p90_d,
       ROUND(quantile_cont(lag_d, 0.99), 2) AS p99_d,
       CAST(MAX(lag_d) AS BIGINT) AS max_d,
       ROUND(CAST(SUM(CASE WHEN lag_d > 90 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS sla_breach_rate
FROM lags GROUP BY 1 ORDER BY o_orderpriority
"""


def ext_dup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sensitivity curve: candidate-pair counts per
    0.05-wide Jaccard band (trigram shingles, pairs with sim >= 0.05)
    plus the cumulative pairs at-or-above each band — the evidence a
    dedup owner needs to CHOOSE the X2 threshold instead of cargo-
    culting 0.8 (a cliff in the curve = a natural cutoff; a fat tail =
    template contamination). Bands are exact integer arithmetic
    ((20*i) div u), immune to float binning at band edges.

    Scale shape: one inverted-index shingle join (X2's shape; apply its
    max_doc_freq hot-shingle guard at corpus scale), then an O(bands)
    collapse; the cumulative runs on the 20-row band axis."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, n=3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ju = (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .select(
            "i", (F.col("na") + F.col("nb") - F.col("i")).alias("u")
        )
        .filter(F.col("i") * 20 >= F.col("u"))
    )
    binned = ju.select(
        F.expr("(20 * i) div u").cast("long").alias("band")
    ).groupBy("band").agg(F.count(F.lit(1)).alias("n_pairs"))
    wc = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        binned.withColumn("cum_pairs_at_or_above", F.sum("n_pairs").over(wc))
        .select(
            "band",
            F.round(F.col("band") * 0.05, 2).alias("thr_lo"),
            "n_pairs",
            "cum_pairs_at_or_above",
        )
        .orderBy("band")
    )


EXT_DUP_THRESHOLD_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(TRIM(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(TRIM(text), '\s+'), 1) AS i
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
ju AS (
  SELECT i.i, sa.n + sb.n - i.i AS u
  FROM inter i
  JOIN sizes sa ON i.id_a = sa.doc_id
  JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE i.i * 20 >= sa.n + sb.n - i.i
),
binned AS (
  SELECT CAST((20 * i) // u AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM ju GROUP BY 1
)
SELECT band, ROUND(band * 0.05, 2) AS thr_lo, n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY band DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_pairs_at_or_above
FROM binned ORDER BY band
"""


def ext_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification (raking) weights that rebalance the corpus to
    a uniform language target: w_lang = target_share / actual_share,
    with the effective sample size ESS = (Σw)²/Σw² and the efficiency
    ratio ESS/n — the survey-statistics answer to 'what does reweighting
    my skewed corpus actually cost in statistical power' (the weighting
    alternative to X186's balanced downsampling, which pays in rows
    instead).

    Scale shape: one O(langs) marginal; every output number derives from
    that tiny frame (per-doc weights never materialize)."""
    docs = _t(spark, sf_dir, "documents")
    marg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = marg.agg(
        F.sum("n_docs").alias("n"), F.count(F.lit(1)).alias("n_langs")
    )
    j = marg.crossJoin(F.broadcast(tot))
    w = F.col("n").cast("double") / (F.col("n_langs") * F.col("n_docs"))
    ess_den = j.select(
        (F.col("n_docs") * w * w).alias("nw2"), "n"
    ).agg(F.sum("nw2").alias("den"), F.max("n").alias("n"))
    out = j.select(
        "lang",
        "n_docs",
        F.round(w, 6).alias("weight"),
    )
    ess = ess_den.select(
        (F.col("n").cast("double") * F.col("n") / F.col("den")).alias("ess"),
        "n",
    )
    return (
        out.crossJoin(F.broadcast(ess))
        .select(
            "lang",
            "n_docs",
            "weight",
            F.round("ess", 2).alias("ess"),
            F.round(F.col("ess") / F.col("n"), 6).alias("ess_ratio"),
        )
        .orderBy("lang")
    )


EXT_RAKING_SQL = r"""
WITH marg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_langs FROM marg),
j AS (
  SELECT m.lang, m.n_docs, t.n, t.n_langs,
         CAST(t.n AS DOUBLE) / (t.n_langs * m.n_docs) AS w
  FROM marg m CROSS JOIN tot t
),
ess AS (
  SELECT CAST(MAX(n) AS DOUBLE) * MAX(n) / SUM(n_docs * w * w) AS ess,
         MAX(n) AS n
  FROM j
)
SELECT j.lang, j.n_docs, ROUND(j.w, 6) AS weight,
       ROUND(e.ess, 2) AS ess, ROUND(e.ess / e.n, 6) AS ess_ratio
FROM j CROSS JOIN ess e
ORDER BY j.lang
"""


def ext_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salting plan for the event-type key: rows per key, the key's
    share of the table, and the salt fan-out ceil(n/target) (target
    2000 rows/task, capped at 32) a salted aggregation (X18) or
    replicate join (X19) should use — turns X124's degree audit into an
    actionable plan artifact the pipeline can feed straight into
    skew.salted_agg.

    Scale shape: one hash agg to O(keys); the plan math is row-local on
    that tiny frame."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").alias("n"))
    n_salts = F.least(
        F.ceil(F.col("n_rows") / F.lit(2000.0)).cast("long"), F.lit(32)
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_rows",
            F.round(F.col("n_rows") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
            n_salts.alias("n_salts"),
            (n_salts > 1).alias("needs_salting"),
        )
        .orderBy(F.col("n_rows").desc(), "event_type")
    )


EXT_SALTING_PLAN_SQL = r"""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n FROM counts)
SELECT event_type, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / n, 6) AS share,
       LEAST(CAST(CEIL(n_rows / 2000.0) AS BIGINT), 32) AS n_salts,
       LEAST(CAST(CEIL(n_rows / 2000.0) AS BIGINT), 32) > 1 AS needs_salting
FROM counts CROSS JOIN tot
ORDER BY n_rows DESC, event_type
"""


EXT_QUERIES.update(
    {
        "ext_sla_ship_lag": ext_sla_ship_lag,
        "ext_dup_threshold_curve": ext_dup_threshold_curve,
        "ext_raking_weights": ext_raking_weights,
        "ext_salting_plan": ext_salting_plan,
    }
)
EXT_ORACLES.update(
    {
        "ext_sla_ship_lag": EXT_SLA_SHIP_LAG_SQL,
        "ext_dup_threshold_curve": EXT_DUP_THRESHOLD_SQL,
        "ext_raking_weights": EXT_RAKING_SQL,
        "ext_salting_plan": EXT_SALTING_PLAN_SQL,
    }
)


# --- round-3 wave: CUPED, lead-lag xcorr, FD audit, dedup storage gain --------


def ext_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: per-user post-period purchase
    value (days 15+) adjusted by the pre-period covariate (days < 15),
    theta = cov(pre, post)/var(pre) from exact-cent moments; reports the
    raw and adjusted treatment effects (deterministic hash arms) and the
    variance-reduction share rho² — the standard trick that makes
    experiments readable weeks earlier. Users absent in a period count
    zero (fixed-panel convention, stated).

    Scale shape: one per-user collapse in exact cents; moments and
    theta are O(1) broadcast scalars; arms aggregate the panel once."""
    ev = _t(spark, sf_dir, "events")
    start = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    per = (
        ev.crossJoin(F.broadcast(start))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(
                F.datediff(F.to_date("ts"), F.col("d0")) < 15,
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("pre_c"),
            F.when(
                F.datediff(F.to_date("ts"), F.col("d0")) >= 15,
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("post_c"),
        )
        .groupBy("user_id")
        .agg(F.sum("pre_c").alias("x"), F.sum("post_c").alias("y"))
        .withColumn("arm", (F.col("user_id") % 2 == 0).cast("int"))
    )
    mom = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    cov = F.col("sxy").cast("double") / n - mx * (F.col("sy").cast("double") / n)
    var = F.col("sxx").cast("double") / n - mx * mx
    theta_f = mom.select((cov / var).alias("theta"), mx.alias("mx"))
    adj = per.crossJoin(F.broadcast(theta_f)).select(
        "arm",
        (F.col("y").cast("double") / 100.0).alias("yv"),
        (
            (F.col("y").cast("double") - F.col("theta") * (F.col("x") - F.col("mx")))
            / 100.0
        ).alias("ycuped"),
    )
    arms = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("yv").alias("my"),
        F.avg("ycuped").alias("mc"),
        F.variance("yv").alias("vy"),
        F.variance("ycuped").alias("vc"),
    )
    out = arms.agg(
        F.sum("n").alias("n_users"),
        F.round(
            F.max(F.when(F.col("arm") == 1, F.col("my")))
            - F.max(F.when(F.col("arm") == 0, F.col("my"))),
            4,
        ).alias("effect_raw"),
        F.round(
            F.max(F.when(F.col("arm") == 1, F.col("mc")))
            - F.max(F.when(F.col("arm") == 0, F.col("mc"))),
            4,
        ).alias("effect_cuped"),
        F.round(
            1.0 - F.sum(F.col("vc") * (F.col("n") - 1)) / F.sum(F.col("vy") * (F.col("n") - 1)),
            4,
        ).alias("variance_reduction"),
    )
    return out


EXT_CUPED_SQL = r"""
WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN date_diff('day', d0.d0, CAST(ts AS DATE)) < 15
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN date_diff('day', d0.d0, CAST(ts AS DATE)) >= 15
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events CROSS JOIN d0
  WHERE event_type = 'purchase'
  GROUP BY 1
),
panel AS (SELECT user_id, x, y, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm FROM per),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy
  FROM panel
),
theta AS (
  SELECT (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
         / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
           AS theta,
         CAST(sx AS DOUBLE) / n AS mx
  FROM mom
),
adj AS (
  SELECT arm, CAST(y AS DOUBLE) / 100.0 AS yv,
         (CAST(y AS DOUBLE) - t.theta * (x - t.mx)) / 100.0 AS ycuped
  FROM panel CROSS JOIN theta t
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, AVG(yv) AS my, AVG(ycuped) AS mc,
         VAR_SAMP(yv) AS vy, VAR_SAMP(ycuped) AS vc
  FROM adj GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS n_users,
       ROUND(MAX(CASE WHEN arm = 1 THEN my END)
             - MAX(CASE WHEN arm = 0 THEN my END), 4) AS effect_raw,
       ROUND(MAX(CASE WHEN arm = 1 THEN mc END)
             - MAX(CASE WHEN arm = 0 THEN mc END), 4) AS effect_cuped,
       ROUND(1.0 - SUM(vc * (n - 1)) / SUM(vy * (n - 1)), 4) AS variance_reduction
FROM arms
"""


def ext_xcorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily click and purchase
    counts at offsets -7..+7 (positive lag = clicks LEAD purchases by
    that many days): the argmax offset is the empirical marketing-
    response delay — the cross-series companion to X241's ACF and the
    evidence behind X251's attribution window choice.

    Scale shape: both series collapse to the O(days) axis first; every
    lag is an equi-join on the shifted tiny axis; moments are broadcast
    scalars."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    clicks = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("c")
    )
    purch = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("n").alias("p")
    )
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(-7), F.lit(7))).alias("lag")
    )
    # join purchases at day + lag; per-lag Pearson over the matched pairs
    pairs = (
        F.broadcast(lags)
        .crossJoin(clicks.select(F.col("day").alias("cd"), "c"))
        .join(
            purch.select(F.col("day").alias("pd"), "p"),
            F.expr("pd = date_add(cd, lag)"),
        )
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("c").cast("double") * F.col("p")).alias("scp"),
        F.sum(F.col("c").cast("double")).alias("sc1"),
        F.sum(F.col("p").cast("double")).alias("sp1"),
        F.sum(F.col("c").cast("double") * F.col("c")).alias("scc"),
        F.sum(F.col("p").cast("double") * F.col("p")).alias("spp"),
    )
    n = F.col("n_pairs").cast("double")
    r = (n * F.col("scp") - F.col("sc1") * F.col("sp1")) / F.sqrt(
        (n * F.col("scc") - F.col("sc1") * F.col("sc1"))
        * (n * F.col("spp") - F.col("sp1") * F.col("sp1"))
    )
    return num.select(
        "lag", "n_pairs", F.round(r, 6).alias("xcorr")
    ).orderBy("lag")


EXT_XCORR_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
clicks AS (SELECT day AS cd, n AS c FROM daily WHERE event_type = 'click'),
purch AS (SELECT day AS pd, n AS p FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT UNNEST(range(-7, 8)) AS lag),
pairs AS (
  SELECT l.lag, c.c, p.p
  FROM lags l
  JOIN clicks c ON TRUE
  JOIN purch p ON p.pd = c.cd + CAST(l.lag AS INTEGER)
),
num AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(c AS DOUBLE) * p) AS scp,
         SUM(CAST(c AS DOUBLE)) AS sc1, SUM(CAST(p AS DOUBLE)) AS sp1,
         SUM(CAST(c AS DOUBLE) * c) AS scc, SUM(CAST(p AS DOUBLE) * p) AS spp
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       ROUND((n_pairs * scp - sc1 * sp1)
             / SQRT((n_pairs * scc - sc1 * sc1) * (n_pairs * spp - sp1 * sp1)),
             6) AS xcorr
FROM num ORDER BY lag
"""


def ext_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over declared candidate FDs
    (nation->region, part->brand, part->type, customer->nation,
    order->customer): for each, the number of determinant values mapping
    to more than one dependent value (violations; 0 = FD holds) and the
    implied compression ratio distinct(det)/rows — the data-quality
    check that catches silently broken dimension hierarchies before a
    join fans out (X104 audits join keys; this audits attribute
    hierarchies).

    Scale shape: one (det, dep) distinct collapse per FD, then an
    O(determinants) regroup; long-form output, one union of tiny
    frames."""
    fds = [
        ("nation.n_nationkey->n_regionkey", _t(spark, sf_dir, "nation"),
         "n_nationkey", "n_regionkey"),
        ("part.p_partkey->p_brand", _t(spark, sf_dir, "part"),
         "p_partkey", "p_brand"),
        ("part.p_partkey->p_type", _t(spark, sf_dir, "part"),
         "p_partkey", "p_type"),
        ("customer.c_custkey->c_nationkey", _t(spark, sf_dir, "customer"),
         "c_custkey", "c_nationkey"),
        ("orders.o_orderkey->o_custkey", _t(spark, sf_dir, "orders"),
         "o_orderkey", "o_custkey"),
    ]
    outs = []
    for fd_name, df, det, dep in fds:
        per_det = (
            df.select(F.col(det).alias("d"), F.col(dep).alias("v"))
            .distinct()
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n_vals"))
        )
        outs.append(
            per_det.agg(
                F.lit(fd_name).alias("fd"),
                F.count(F.lit(1)).alias("n_determinants"),
                F.sum((F.col("n_vals") > 1).cast("long")).alias("n_violations"),
                (F.sum((F.col("n_vals") > 1).cast("long")) == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fd")


EXT_FD_AUDIT_SQL = r"""
WITH checks AS (
  SELECT 'nation.n_nationkey->n_regionkey' AS fd, CAST(COUNT(*) AS BIGINT) AS n_determinants,
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM (SELECT n_nationkey AS d, COUNT(DISTINCT n_regionkey) AS n_vals FROM nation GROUP BY 1)
  UNION ALL
  SELECT 'part.p_partkey->p_brand', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT p_partkey AS d, COUNT(DISTINCT p_brand) AS n_vals FROM part GROUP BY 1)
  UNION ALL
  SELECT 'part.p_partkey->p_type', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT p_partkey AS d, COUNT(DISTINCT p_type) AS n_vals FROM part GROUP BY 1)
  UNION ALL
  SELECT 'customer.c_custkey->c_nationkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT c_custkey AS d, COUNT(DISTINCT c_nationkey) AS n_vals FROM customer GROUP BY 1)
  UNION ALL
  SELECT 'orders.o_orderkey->o_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT o_orderkey AS d, COUNT(DISTINCT o_custkey) AS n_vals FROM orders GROUP BY 1)
)
SELECT fd, n_determinants, n_violations, n_violations = 0 AS holds
FROM checks ORDER BY fd
"""


def ext_dedup_storage_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected storage savings from exact dedup, per source: bytes
    (n_chars) held by non-representative duplicate-cluster members vs
    total bytes — the capacity-planning number that justifies running
    X1 at all (and per source, WHERE the waste lives). Representative =
    min doc_id per normalized-content fingerprint (X1's rule).

    Scale shape: one fingerprint collapse carrying sum/min aggregates,
    one source regroup; no row-level rejoin needed for the byte math."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    clusters = (
        docs.select("source", fp.alias("fp"), "doc_id", "n_chars")
        .groupBy("source", "fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bytes_all"),
            F.min(F.struct("doc_id", "n_chars")).alias("rep"),
        )
    )
    return (
        clusters.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("bytes_all").alias("bytes_total"),
            F.sum(F.col("bytes_all") - F.col("rep.n_chars")).alias(
                "bytes_removable"
            ),
            F.round(
                F.sum(F.col("bytes_all") - F.col("rep.n_chars"))
                / F.sum("bytes_all").cast("double"),
                6,
            ).alias("savings_ratio"),
        )
        .orderBy("source")
    )


EXT_DEDUP_STORAGE_SQL = r"""
WITH clusters AS (
  SELECT source, md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS bytes_all,
         MIN({'doc_id': doc_id, 'n_chars': n_chars}) AS rep
  FROM documents GROUP BY 1, 2
)
SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(bytes_all) AS BIGINT) AS bytes_total,
       CAST(SUM(bytes_all - rep.n_chars) AS BIGINT) AS bytes_removable,
       ROUND(CAST(SUM(bytes_all - rep.n_chars) AS DOUBLE) / SUM(bytes_all), 6)
         AS savings_ratio
FROM clusters GROUP BY 1 ORDER BY source
"""


EXT_QUERIES.update(
    {
        "ext_cuped": ext_cuped,
        "ext_xcorr_lead_lag": ext_xcorr_lead_lag,
        "ext_fd_audit": ext_fd_audit,
        "ext_dedup_storage_gain": ext_dedup_storage_gain,
    }
)
EXT_ORACLES.update(
    {
        "ext_cuped": EXT_CUPED_SQL,
        "ext_xcorr_lead_lag": EXT_XCORR_SQL,
        "ext_fd_audit": EXT_FD_AUDIT_SQL,
        "ext_dedup_storage_gain": EXT_DEDUP_STORAGE_SQL,
    }
)


# --- round-3 wave: Markov attribution, IPS, Wasserstein, SRM ------------------


def ext_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: first-order journey chain from
    per-user event sequences (START -> ... -> purchase absorbing, last
    event -> NULL), conversion probability solved by 12 fixed value-
    iteration steps, re-solved with each channel knocked out
    (transitions INTO it redirected to NULL); a channel's credit is its
    normalized conversion drop. The data-driven complement to X251's
    position-based rule — it credits channels by counterfactual, not
    position. Transitions out of the absorbing purchase state are
    dropped (stated model).

    Scale shape: ONE pass over events builds the O(types²) transition
    counts; the value iteration then runs driver-side on the collected
    O(chains × types²) probability table (aggregate-sized, same class
    as the HLL register collect — 12 DataFrame-join iterations cost
    ~16 s of pure scheduling for microseconds of math), and the 4-row
    result is re-emitted as a DataFrame with in-plan rounding."""
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "nxt", F.lead("event_type").over(wu)
    ).withColumn("prv", F.lag("event_type").over(wu))
    bigrams = seq.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("i"),
        F.coalesce(F.col("nxt"), F.lit("NULL")).alias("j"),
    )
    starts = seq.filter(F.col("prv").isNull()).select(
        F.lit("START").alias("i"), F.col("event_type").alias("j")
    )
    trans = bigrams.unionByName(starts).groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n")
    )
    chans = (
        ev.select(F.col("event_type").alias("removed"))
        .filter(F.col("removed") != "purchase")
        .distinct()
        .unionByName(spark.range(1).select(F.lit("NONE").alias("removed")))
    )
    mod = (
        F.broadcast(chans)
        .crossJoin(trans)
        .filter(F.col("i") != F.col("removed"))
        .select(
            "removed",
            "i",
            F.when(F.col("j") == F.col("removed"), F.lit("NULL"))
            .otherwise(F.col("j"))
            .alias("j"),
            "n",
        )
        .groupBy("removed", "i", "j")
        .agg(F.sum("n").alias("n"))
    )
    tot = mod.groupBy("removed", "i").agg(F.sum("n").alias("tot"))
    probs = mod.join(tot, ["removed", "i"]).select(
        "removed", "i", "j", (F.col("n") / F.col("tot").cast("double")).alias("p")
    )
    rows = probs.collect()  # O(chains * types²) aggregate rows, never data-sized
    chains: dict[str, dict[str, list]] = {}
    for r in rows:
        chains.setdefault(r["removed"], {}).setdefault(r["i"], []).append(
            (r["j"], r["p"])
        )
    p_conv: dict[str, float] = {}
    for removed, outs in chains.items():
        v = {"purchase": 1.0}
        for _ in range(12):
            nxt = {}
            for i, edges in outs.items():
                # sorted target order -> deterministic float summation
                nxt[i] = sum(
                    p * v.get(j, 0.0) for j, p in sorted(edges)
                )
            nxt["purchase"] = 1.0
            v = nxt
        p_conv[removed] = v.get("START", 0.0)
    p_base = p_conv.get("NONE", 0.0)
    schema = (
        "channel string, p_conv_base double, p_conv_without double, "
        "removal_effect double, attribution_share double"
    )
    # zero-conversion corpus: removal effects are undefined (0/0) — emit
    # an empty frame rather than raising driver-side; the oracle's
    # `WHERE p_base > 0` guard mirrors this exactly
    if p_base == 0.0:
        return spark.createDataFrame([], schema)
    effs = {
        ch: max(0.0, 1.0 - p / p_base)
        for ch, p in p_conv.items()
        if ch != "NONE"
    }
    te = sum(effs[ch] for ch in sorted(effs))
    # te == 0 (conversions exist but no channel's removal moves them):
    # credit nothing instead of dividing 0/0 — mirrored in the oracle
    out = spark.createDataFrame(
        [
            (
                ch,
                p_base,
                p_conv[ch],
                effs[ch],
                effs[ch] / te if te > 0.0 else 0.0,
            )
            for ch in sorted(effs)
        ],
        schema,
    )
    return out.select(
        "channel",
        F.round("p_conv_base", 6).alias("p_conv_base"),
        F.round("p_conv_without", 6).alias("p_conv_without"),
        F.round("removal_effect", 6).alias("removal_effect"),
        F.round("attribution_share", 6).alias("attribution_share"),
    ).orderBy("channel")


def _markov_oracle_sql() -> str:
    head = r"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER w AS nxt,
         LAG(event_type) OVER w AS prv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT event_type AS i, COALESCE(nxt, 'NULL') AS j
    FROM seq WHERE event_type <> 'purchase'
    UNION ALL
    SELECT 'START' AS i, event_type AS j FROM seq WHERE prv IS NULL
  ) GROUP BY 1, 2
),
chans AS (
  SELECT DISTINCT event_type AS removed FROM events WHERE event_type <> 'purchase'
  UNION ALL SELECT 'NONE'
),
mod AS (
  SELECT removed, i, CASE WHEN j = removed THEN 'NULL' ELSE j END AS j,
         CAST(SUM(n) AS BIGINT) AS n
  FROM chans CROSS JOIN trans
  WHERE i <> removed
  GROUP BY 1, 2, 3
),
probs AS (
  SELECT removed, i, j, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY removed, i) AS p
  FROM mod
),
v0 AS (SELECT removed, 'purchase' AS state, 1.0 AS v FROM chans)"""
    steps = []
    for k in range(1, 13):
        steps.append(
            f""",
v{k} AS (
  SELECT p.removed, p.i AS state, SUM(p.p * v.v) AS v
  FROM probs p JOIN v{k - 1} v ON v.removed = p.removed AND v.state = p.j
  GROUP BY 1, 2
  UNION ALL
  SELECT removed, 'purchase' AS state, 1.0 AS v FROM chans
)"""
        )
    tail = r""",
pconv AS (SELECT removed, v AS p_conv FROM v12 WHERE state = 'START'),
base AS (SELECT p_conv AS p_base FROM pconv WHERE removed = 'NONE'),
effects AS (
  SELECT removed AS channel, p_conv, b.p_base,
         GREATEST(0.0, 1.0 - p_conv / b.p_base) AS eff
  FROM pconv CROSS JOIN base b
  WHERE removed <> 'NONE' AND b.p_base > 0
),
te AS (SELECT SUM(eff) AS te FROM effects)
SELECT channel, ROUND(p_base, 6) AS p_conv_base,
       ROUND(p_conv, 6) AS p_conv_without,
       ROUND(eff, 6) AS removal_effect,
       CASE WHEN te.te > 0 THEN ROUND(eff / te.te, 6) ELSE 0.0 END
         AS attribution_share
FROM effects CROSS JOIN te
ORDER BY channel"""
    return head + "".join(steps) + tail


EXT_MARKOV_SQL = _markov_oracle_sql()


def ext_ips_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-score treatment effect for the deep-discount
    question (X254's setting): propensities estimated per brand stratum
    from the data, clipped to [0.05, 0.95], IPS-weighted outcome means
    for treated vs control — the weighting-based causal estimator that
    generalizes to continuous covariates where stratification cannot
    follow; comparing it against X254's answer is the standard
    robustness check.

    Scale shape: propensities are an O(strata) broadcast map; the
    estimate is one weighted pass over the fact table."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount") >= 0.05).cast("int").alias("t"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    tagged = li.join(F.broadcast(part), "l_partkey")
    prop = tagged.groupBy("p_brand").agg(
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("e_raw")
    ).select(
        "p_brand",
        F.least(F.greatest(F.col("e_raw"), F.lit(0.05)), F.lit(0.95)).alias("e"),
    )
    j = tagged.join(F.broadcast(prop), "p_brand")
    est = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.col("t") * F.col("qc").cast("double") / F.col("e"))
            / F.sum(F.col("t") / F.col("e"))
            - F.sum((1 - F.col("t")) * F.col("qc").cast("double") / (1.0 - F.col("e")))
            / F.sum((1 - F.col("t")) / (1.0 - F.col("e")))
        ).alias("ate"),
        F.avg("e").alias("mean_prop"),
    )
    return est.select(
        "n_rows",
        F.round(F.col("ate") / 100.0, 4).alias("ate_ips"),
        F.round("mean_prop", 6).alias("mean_propensity"),
    )


EXT_IPS_SQL = r"""
WITH tagged AS (
  SELECT p.p_brand,
         CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
),
prop AS (
  SELECT p_brand,
         LEAST(GREATEST(CAST(SUM(t) AS DOUBLE) / COUNT(*), 0.05), 0.95) AS e
  FROM tagged GROUP BY 1
),
j AS (SELECT t.t, t.qc, p.e FROM tagged t JOIN prop p ON p.p_brand = t.p_brand)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND((SUM(t * CAST(qc AS DOUBLE) / e) / SUM(t / e)
              - SUM((1 - t) * CAST(qc AS DOUBLE) / (1.0 - e))
                / SUM((1 - t) / (1.0 - e))) / 100.0, 4) AS ate_ips,
       ROUND(AVG(e), 6) AS mean_propensity
FROM j
"""


def ext_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the order-value
    distributions of BUILDING vs MACHINERY customers, on a $100 grid:
    W1 = sum |F_a - F_b| * bin_width over the binned support — the
    magnitude-aware distribution distance (X213's KS sees the worst gap;
    W1 integrates ALL of it in dollars, which is what a revenue-mix
    shift is actually worth).

    Scale shape: both distributions collapse to the O(bins) axis; the
    CDF sweep is a window over that tiny axis."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    seg = (
        orders.join(cust, "o_custkey")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("is_a"),
            F.floor(F.round(F.col("o_totalprice") * 100).cast("long") / 10000).alias(
                "bin"
            ),
        )
    )
    counts = seg.groupBy("bin").agg(
        F.sum("is_a").alias("na"), F.sum(F.lit(1) - F.col("is_a")).alias("nb")
    )
    tots = counts.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = (
        counts.withColumn("ca", F.sum("na").over(wc))
        .withColumn("cb", F.sum("nb").over(wc))
        .crossJoin(F.broadcast(tots))
    )
    return cdf.agg(
        F.max("ta").alias("n_building"),
        F.max("tb").alias("n_machinery"),
        F.round(
            F.sum(
                F.abs(
                    F.col("ca").cast("double") / F.col("ta")
                    - F.col("cb").cast("double") / F.col("tb")
                )
            )
            * 100.0,
            4,
        ).alias("w1_dollars"),
    )


EXT_WASSERSTEIN_SQL = r"""
WITH seg AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a,
         CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 10000.0) AS BIGINT)
           AS bin
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
counts AS (
  SELECT bin, CAST(SUM(is_a) AS BIGINT) AS na,
         CAST(SUM(1 - is_a) AS BIGINT) AS nb
  FROM seg GROUP BY 1
),
tots AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM counts),
cdf AS (
  SELECT bin, SUM(na) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(nb) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM counts
)
SELECT MAX(ta) AS n_building, MAX(tb) AS n_machinery,
       ROUND(SUM(ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)) * 100.0, 4)
         AS w1_dollars
FROM cdf CROSS JOIN tots
"""


def ext_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch health check for the X274 experiment
    assignment: distinct users per hash arm vs the designed 50/50,
    1-df chi-square statistic and the 3.84 (p=0.05) alarm — the first
    thing a broken randomizer shows, and the check every experiment
    readout must pass BEFORE its effect numbers mean anything.

    Scale shape: one distinct-user collapse, O(1) arithmetic."""
    ev = _t(spark, sf_dir, "events")
    arms = (
        ev.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2 == 0).cast("int").alias("arm"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = arms.agg(
        F.sum("n").alias("n_users"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_c"),
    )
    exp = F.col("n_users").cast("double") / 2.0
    chi = (
        (F.col("n_t") - exp) * (F.col("n_t") - exp) / exp
        + (F.col("n_c") - exp) * (F.col("n_c") - exp) / exp
    )
    return agg.select(
        "n_users",
        "n_t",
        "n_c",
        F.round(chi, 4).alias("chi_square"),
        (chi > 3.841).alias("srm_alarm"),
    )


EXT_SRM_SQL = r"""
WITH arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_users,
         MAX(CASE WHEN arm = 1 THEN n END) AS n_t,
         MAX(CASE WHEN arm = 0 THEN n END) AS n_c
  FROM arms
)
SELECT n_users, n_t, n_c,
       ROUND((n_t - n_users / 2.0) * (n_t - n_users / 2.0) / (n_users / 2.0)
             + (n_c - n_users / 2.0) * (n_c - n_users / 2.0) / (n_users / 2.0), 4)
         AS chi_square,
       ((n_t - n_users / 2.0) * (n_t - n_users / 2.0) / (n_users / 2.0)
        + (n_c - n_users / 2.0) * (n_c - n_users / 2.0) / (n_users / 2.0)) > 3.841
         AS srm_alarm
FROM agg
"""


EXT_QUERIES.update(
    {
        "ext_markov_attribution": ext_markov_attribution,
        "ext_ips_ate": ext_ips_ate,
        "ext_wasserstein": ext_wasserstein,
        "ext_srm_check": ext_srm_check,
    }
)
EXT_ORACLES.update(
    {
        "ext_markov_attribution": EXT_MARKOV_SQL,
        "ext_ips_ate": EXT_IPS_SQL,
        "ext_wasserstein": EXT_WASSERSTEIN_SQL,
        "ext_srm_check": EXT_SRM_SQL,
    }
)


# --- round-3 wave: Ljung-Box, capture-recapture, skyline, Mahalanobis ---------


def ext_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily order revenue: Q = n(n+2)
    sum_{k=1..10} r_k²/(n-k) over the first ten autocorrelations — the
    'is there ANY serial structure' gate that turns X241's per-lag ACF
    into one decision number (Q > 18.31 rejects whiteness at p=0.05,
    10 df). Pairwise-complete r_k on the calendar grid, as in X241.

    Scale shape: day-axis collapse, ten tiny shifted self-joins, O(1)
    arithmetic."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("xc").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.col("xc").cast("double") - F.col("mu")).alias("d"), "nd"
    )
    denom = dev.agg(F.sum(F.col("d") * F.col("d")).alias("ss"), F.max("nd").alias("n"))
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("lag")
    )
    pairs = (
        F.broadcast(lags)
        .crossJoin(dev.select(F.col("day").alias("d0"), F.col("d").alias("da")))
        .join(
            dev.select(F.col("day").alias("d1"), F.col("d").alias("db")),
            F.expr("d1 = date_add(d0, lag)"),
        )
    )
    rks = (
        pairs.groupBy("lag")
        .agg(F.sum(F.col("da") * F.col("db")).alias("num"))
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n",
            ((F.col("num") / F.col("ss")) * (F.col("num") / F.col("ss"))).alias("rk2"),
        )
    )
    q = rks.agg(
        F.max("n").alias("n_days"),
        F.sum(F.col("rk2") / (F.col("n") - F.col("lag"))).alias("inner"),
    )
    stat = F.col("n_days") * (F.col("n_days") + 2) * F.col("inner")
    return q.select(
        "n_days",
        F.round(stat, 4).alias("ljung_box_q"),
        (stat > 18.307).alias("reject_whiteness"),
    )


EXT_LJUNG_BOX_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS xc
  FROM orders GROUP BY 1
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(xc) AS DOUBLE) / COUNT(*) AS mu FROM daily),
dev AS (SELECT day, CAST(xc AS DOUBLE) - mu AS d, nd FROM daily CROSS JOIN stats),
denom AS (SELECT SUM(d * d) AS ss, MAX(nd) AS n FROM dev),
lags AS (SELECT UNNEST(range(1, 11)) AS lag),
rks AS (
  SELECT l.lag, dn.n,
         (SUM(a.d * b.d) / MAX(dn.ss)) * (SUM(a.d * b.d) / MAX(dn.ss)) AS rk2
  FROM lags l
  JOIN dev a ON TRUE
  JOIN dev b ON b.day = a.day + CAST(l.lag AS INTEGER)
  CROSS JOIN denom dn
  GROUP BY l.lag, dn.n
),
q AS (
  SELECT MAX(n) AS n_days, SUM(rk2 / (n - lag)) AS inner_sum FROM rks
)
SELECT n_days,
       ROUND(n_days * (n_days + 2) * inner_sum, 4) AS ljung_box_q,
       n_days * (n_days + 2) * inner_sum > 18.307 AS reject_whiteness
FROM q
"""


def ext_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the TOTAL user population
    (including never-seen users) from two independent 'captures' —
    users active in the first vs second half of the window:
    N = (n1+1)(n2+1)/(m+1) - 1 with a binomial-variance CI — the
    ecology estimator that answers 'how many users exist that my logs
    have not seen yet', which no distinct-count can.

    Scale shape: two conditional distinct collapses in ONE per-user
    aggregation; the estimator is O(1) arithmetic."""
    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        F.to_date(
            F.from_unixtime(
                (F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts"))) / 2
            )
        ).alias("mid")
    )
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.max((F.to_date("ts") < F.col("mid")).cast("int")).alias("in1"),
            F.max((F.to_date("ts") >= F.col("mid")).cast("int")).alias("in2"),
        )
    )
    agg = per.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
        F.count(F.lit(1)).alias("n_observed"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m = F.col("m").cast("double")
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    var = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / (
        (m + 1) * (m + 1) * (m + 2)
    )
    return agg.select(
        "n1",
        "n2",
        "m",
        "n_observed",
        F.round(nhat, 2).alias("n_total_est"),
        F.round(nhat - 1.96 * F.sqrt(var), 2).alias("ci_lo"),
        F.round(nhat + 1.96 * F.sqrt(var), 2).alias("ci_hi"),
    )


EXT_CAPTURE_RECAPTURE_SQL = r"""
WITH mid AS (
  SELECT CAST(to_timestamp((epoch(MIN(ts)) + epoch(MAX(ts))) / 2) AS DATE) AS mid
  FROM events
),
per AS (
  SELECT user_id,
         MAX(CASE WHEN CAST(ts AS DATE) < mid THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN CAST(ts AS DATE) >= mid THEN 1 ELSE 0 END) AS in2
  FROM events CROSS JOIN mid GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(in1) AS BIGINT) AS n1, CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(in1 * in2) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_observed
  FROM per
)
SELECT n1, n2, m, n_observed,
       ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1, 2) AS n_total_est,
       ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1
             - 1.96 * SQRT((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                           / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2) AS ci_lo,
       ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1
             + 1.96 * SQRT((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                           / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2) AS ci_hi
FROM agg
"""


def ext_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: cheapest-price vs
    largest-size — parts no other part beats on BOTH axes. The classic
    multi-criteria shortlist operator relational engines lack: computed
    by the sort-scan formulation (order by price asc, size desc; keep
    rows whose size strictly exceeds the running max), with min-price
    tie groups handled by keeping only dominating representatives.

    Scale shape: collapse to distinct (price, size) pairs first (the
    frontier only depends on the collapsed set), sweep with a window
    over that axis, re-attach part ids by equi-join. The dimension
    table is O(catalog) — bounded — and the sweep axis is its distinct
    projection."""
    part = _t(spark, sf_dir, "part")
    pts = part.select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
        F.col("p_size").cast("long").alias("sz"),
    ).distinct()
    # keep max size per price level (others are dominated at equal price)
    lvl = pts.groupBy("pc").agg(F.max("sz").alias("sz"))
    wsweep = Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        lvl.withColumn("prev_max", F.max("sz").over(wsweep))
        .filter(F.col("prev_max").isNull() | (F.col("sz") > F.col("prev_max")))
        .select("pc", "sz")
    )
    out = part.join(
        sky,
        (F.round(F.col("p_retailprice") * 100).cast("long") == F.col("pc"))
        & (F.col("p_size").cast("long") == F.col("sz")),
    )
    return (
        out.select(
            "p_partkey",
            "p_brand",
            F.round(F.col("pc") / 100.0, 2).alias("price"),
            F.col("sz").alias("size"),
        )
        .orderBy("price", "p_partkey")
    )


EXT_SKYLINE_SQL = r"""
WITH pts AS (
  SELECT DISTINCT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS pc,
         CAST(p_size AS BIGINT) AS sz
  FROM part
),
lvl AS (SELECT pc, MAX(sz) AS sz FROM pts GROUP BY 1),
sky AS (
  SELECT pc, sz FROM (
    SELECT pc, sz,
           MAX(sz) OVER (ORDER BY pc
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
    FROM lvl
  ) WHERE prev_max IS NULL OR sz > prev_max
)
SELECT p.p_partkey, p.p_brand,
       ROUND(s.pc / 100.0, 2) AS price, s.sz AS size
FROM part p
JOIN sky s ON CAST(ROUND(p.p_retailprice * 100) AS BIGINT) = s.pc
          AND CAST(p.p_size AS BIGINT) = s.sz
ORDER BY price, p.p_partkey
"""


def ext_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis multivariate outlier audit of customers over
    (order count, total spend, avg order gap is omitted — two exact
    features plus account balance): D² = sum of squared z-scores with
    population moments from exact sums; flags D² above the chi-square
    (3 df, p=0.01) cutoff 11.345 — catches jointly-extreme customers
    that every single-feature fence (X107) passes.

    Scale shape: one per-customer collapse, broadcast moment scalars,
    row-local scoring; output only the flagged rows (k-bounded head)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_c"),
        )
        .join(cust, "o_custkey")
    )
    mom = per.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            expr
            for c in ["n_orders", "spend_c", "bal_c"]
            for expr in (
                F.sum(c).alias(f"s_{c}"),
                F.sum(F.col(c).cast("decimal(19,0)") * F.col(c)).alias(f"ss_{c}"),
            )
        ],
    )
    j = per.crossJoin(F.broadcast(mom))
    n = F.col("n").cast("double")

    def z(c):
        mu = F.col(f"s_{c}").cast("double") / n
        sd = F.sqrt(F.col(f"ss_{c}").cast("double") / n - mu * mu)
        return (F.col(c).cast("double") - mu) / sd

    d2 = (
        z("n_orders") * z("n_orders")
        + z("spend_c") * z("spend_c")
        + z("bal_c") * z("bal_c")
    )
    return (
        j.select("o_custkey", F.round(d2, 4).alias("d2"))
        .filter(F.col("d2") > 11.345)
        .orderBy(F.col("d2").desc(), "o_custkey")
        .limit(100)
    )


EXT_MAHALANOBIS_SQL = r"""
WITH per AS (
  SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
         CAST(ROUND(MAX(c.c_acctbal) * 100) AS BIGINT) AS bal_c
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_orders) AS BIGINT) AS s_n,
         CAST(SUM(CAST(n_orders AS HUGEINT) * n_orders) AS DECIMAL(38,0)) AS ss_n,
         CAST(SUM(spend_c) AS BIGINT) AS s_sp,
         CAST(SUM(CAST(spend_c AS HUGEINT) * spend_c) AS DECIMAL(38,0)) AS ss_sp,
         CAST(SUM(bal_c) AS BIGINT) AS s_b,
         CAST(SUM(CAST(bal_c AS HUGEINT) * bal_c) AS DECIMAL(38,0)) AS ss_b
  FROM per
),
scored AS (
  SELECT o_custkey,
         ROUND(
           POWER((n_orders - CAST(s_n AS DOUBLE) / n)
                 / SQRT(CAST(ss_n AS DOUBLE) / n - POWER(CAST(s_n AS DOUBLE) / n, 2)), 2)
           + POWER((spend_c - CAST(s_sp AS DOUBLE) / n)
                 / SQRT(CAST(ss_sp AS DOUBLE) / n - POWER(CAST(s_sp AS DOUBLE) / n, 2)), 2)
           + POWER((bal_c - CAST(s_b AS DOUBLE) / n)
                 / SQRT(CAST(ss_b AS DOUBLE) / n - POWER(CAST(s_b AS DOUBLE) / n, 2)), 2),
           4) AS d2
  FROM per CROSS JOIN mom
)
SELECT o_custkey, d2 FROM scored WHERE d2 > 11.345
ORDER BY d2 DESC, o_custkey LIMIT 100
"""


EXT_QUERIES.update(
    {
        "ext_ljung_box": ext_ljung_box,
        "ext_capture_recapture": ext_capture_recapture,
        "ext_skyline": ext_skyline,
        "ext_mahalanobis_outliers": ext_mahalanobis_outliers,
    }
)
EXT_ORACLES.update(
    {
        "ext_ljung_box": EXT_LJUNG_BOX_SQL,
        "ext_capture_recapture": EXT_CAPTURE_RECAPTURE_SQL,
        "ext_skyline": EXT_SKYLINE_SQL,
        "ext_mahalanobis_outliers": EXT_MAHALANOBIS_SQL,
    }
)


# --- round-3 wave: assortativity, RBO, numeric audit, runs test ---------------


def ext_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the 5-NN cosine graph (X258's edges):
    Pearson correlation of endpoint degrees over undirected edges —
    positive = hubs link to hubs (skew compounds at query time),
    negative = hub-and-spoke (the usual ANN-graph shape). Exact integer
    degree sums; both endpoint orientations counted (the standard
    undirected estimator).

    Scale shape: edges from the thinned brute scorer (ANN candidates at
    corpus scale); degrees are one O(nodes) collapse broadcast back;
    the correlation is one O(edges) aggregate."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    hits = similarity.brute_topk(emb, emb, k=5)
    edges = (
        hits.select(
            F.least("query_id", "neighbor_id").alias("u"),
            F.greatest("query_id", "neighbor_id").alias("v"),
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tagged = (
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
    )
    # both orientations: (du,dv) and (dv,du)
    ends = tagged.select(
        F.col("du").alias("x"), F.col("dv").alias("y")
    ).unionByName(tagged.select(F.col("dv").alias("x"), F.col("du").alias("y")))
    agg = ends.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("long") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("long") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("long") * F.col("y")).alias("syy"),
    )
    n = F.col("m2").cast("double")
    r = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return agg.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


EXT_ASSORTATIVITY_SQL = r"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 2 = 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM e q CROSS JOIN e c
  WHERE q.vec_id <> c.vec_id
),
hits AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM scored
  ) WHERE rank <= 5
),
edges AS (
  SELECT DISTINCT LEAST(query_id, neighbor_id) AS u,
         GREATEST(query_id, neighbor_id) AS v
  FROM hits
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY 1
),
ends AS (
  SELECT du.d AS x, dv.d AS y
  FROM edges ed JOIN deg du ON du.node = ed.u JOIN deg dv ON dv.node = ed.v
  UNION ALL
  SELECT dv.d AS x, du.d AS y
  FROM edges ed JOIN deg du ON du.node = ed.u JOIN deg dv ON dv.node = ed.v
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ends
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       ROUND((m2 * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((m2 * sxx - CAST(sx AS DOUBLE) * sx)
                    * (m2 * syy - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
FROM agg
"""


def ext_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p=0.9, depth 50) between the BM25 ranking
    and the quality-prior ranking over the shared candidate set —
    the top-weighted ranking-similarity number behind X251's fusion
    decision: RBO near 1 means the signals agree and fusion adds
    nothing; near 0 means they rank different documents up top.
    RBO@50 = (1-p)/(1-p^50-ish truncation) ... reported as the
    truncated sum (1-p) * sum_{d<=50} p^(d-1) * overlap(d)/d.

    Scale shape: both rankings run over the candidate set (X251's
    bound); overlap(d) comes from each shared item's max rank — one
    O(candidates) collapse, then the weighted sum on the 50-row depth
    axis."""
    docs = _t(spark, sf_dir, "documents")
    cand = text.bm25_scores(docs, BM25_QUERY_TERMS).select("doc_id", "score")
    q = text.quality_score(docs).select("doc_id", "quality")
    j = cand.join(q, "doc_id")
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    wq = Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
    ranked = j.withColumn("r1", F.row_number().over(wb)).withColumn(
        "r2", F.row_number().over(wq)
    )
    mx = ranked.select(
        F.greatest("r1", "r2").alias("m")
    ).filter(F.col("m") <= 50)
    per_m = mx.groupBy("m").agg(F.count(F.lit(1)).alias("c"))
    depths = spark.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(50))).alias("d")
    )
    ov = (
        F.broadcast(depths)
        .join(per_m, F.col("m") <= F.col("d"))
        .groupBy("d")
        .agg(F.sum("c").alias("overlap"))
    )
    term = F.pow(F.lit(0.9), F.col("d") - 1) * F.col("overlap") / F.col("d")
    return ov.agg(
        F.round(F.lit(0.1) * F.sum(term), 6).alias("rbo_at_50"),
        F.max(F.when(F.col("d") == 50, F.col("overlap"))).alias("overlap_at_50"),
    )


EXT_RBO_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS w
  FROM documents
),
lens AS (SELECT doc_id, len(w) AS dl, w FROM toks),
scalars AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM lens),
words AS (SELECT doc_id, dl, UNNEST(w) AS word FROM lens),
tf AS (
  SELECT doc_id, dl, word, COUNT(*) AS tf
  FROM words WHERE word IN ('join', 'merge', 'window')
  GROUP BY doc_id, dl, word
),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
comp AS (
  SELECT tf.doc_id,
         CAST(
           LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)
                    / (CAST(d.doc_freq AS DOUBLE) + 0.5))
           * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE)
                                     / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
           AS DECIMAL(27,12)) AS comp
  FROM tf JOIN dfreq d ON tf.word = d.word CROSS JOIN scalars s
),
cand AS (
  SELECT doc_id, ROUND(CAST(SUM(comp) AS DOUBLE), 6) AS score
  FROM comp GROUP BY doc_id
),
qual AS (
  SELECT doc_id,
         ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS quality
  FROM documents
),
ranked AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (ORDER BY c.score DESC, c.doc_id) AS r1,
         ROW_NUMBER() OVER (ORDER BY q.quality DESC, c.doc_id) AS r2
  FROM cand c JOIN qual q ON q.doc_id = c.doc_id
),
per_m AS (
  SELECT GREATEST(r1, r2) AS m, CAST(COUNT(*) AS BIGINT) AS c
  FROM ranked WHERE GREATEST(r1, r2) <= 50 GROUP BY 1
),
depths AS (SELECT UNNEST(range(1, 51)) AS d),
ov AS (
  SELECT d, CAST(SUM(c) AS BIGINT) AS overlap
  FROM depths JOIN per_m ON m <= d GROUP BY 1
)
SELECT ROUND(0.1 * SUM(POWER(0.9, d - 1) * overlap / d), 6) AS rbo_at_50,
       MAX(CASE WHEN d = 50 THEN overlap END) AS overlap_at_50
FROM ov
"""


def ext_numeric_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-precision audit of the lineitem measures: decimals
    actually used (max observed scale), sign/zero mix, and the value
    span in log10 — the schema-tightening advisor that says whether a
    DOUBLE column is really a DECIMAL(m, 2) in disguise (storage,
    exactness, and pushdown all improve when it is). Long-form output,
    one row per audited column.

    Scale shape: one pass per column collapsed to O(1) audit rows; the
    decimal-scale probe is row-local integer arithmetic (value*10^k
    roundtrip), unioned across columns."""
    li = _t(spark, sf_dir, "lineitem")
    outs = []
    for col in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        c = F.col(col)
        # max decimal scale actually used among {0,1,2}: value*10^k is integral
        k = (
            F.when(c * 1 == F.round(c * 1), 0)
            .when(c * 10 == F.round(c * 10), 1)
            .when(c * 100 == F.round(c * 100), 2)
            .otherwise(3)
        )
        outs.append(
            li.agg(
                F.lit(col).alias("column_name"),
                F.max(k).alias("max_scale_used"),
                F.sum((c < 0).cast("long")).alias("n_negative"),
                F.sum((c == 0).cast("long")).alias("n_zero"),
                F.round(
                    F.log10(F.max(F.abs(c)) / F.greatest(F.min(F.abs(F.nullif(c, F.lit(0.0)))), F.lit(1e-12))),
                    2,
                ).alias("span_log10"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("column_name")


EXT_NUMERIC_AUDIT_SQL = r"""
WITH cols AS (
  SELECT 'l_quantity' AS column_name, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT column_name,
       CAST(MAX(CASE WHEN v * 1 = ROUND(v * 1) THEN 0
                WHEN v * 10 = ROUND(v * 10) THEN 1
                WHEN v * 100 = ROUND(v * 100) THEN 2
                ELSE 3 END) AS INTEGER) AS max_scale_used,
       CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       ROUND(LOG10(MAX(ABS(v)) / GREATEST(MIN(CASE WHEN v <> 0 THEN ABS(v) END), 1e-12)), 2)
         AS span_log10
FROM cols GROUP BY 1 ORDER BY column_name
"""


def ext_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its median: the
    number of above/below runs against the randomness expectation
    (too few runs = sticky regimes/trend, too many = oscillation) —
    the order-sensitive randomness check that complements X283's
    monotone-trend test (a square wave fools Mann-Kendall; it lights
    this up). Median days are excluded (standard treatment).

    Scale shape: day-axis collapse, broadcast median, one lag over the
    tiny ordered axis, O(1) statistic."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    med = daily.agg(F.expr("percentile(x, 0.5)").alias("md"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("md"))
        .select("day", (F.col("x") > F.col("md")).cast("int").alias("s"))
    )
    wd = Window.orderBy("day")
    runs = signed.withColumn("prev", F.lag("s").over(wd)).agg(
        F.sum("s").alias("n_above"),
        F.sum(F.lit(1) - F.col("s")).alias("n_below"),
        (
            F.sum(
                (F.col("prev").isNull() | (F.col("s") != F.col("prev"))).cast(
                    "long"
                )
            )
        ).alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    return runs.select(
        "n_above",
        "n_below",
        "n_runs",
        F.round(mu, 4).alias("expected_runs"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("nonrandom"),
    )


EXT_RUNS_TEST_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
med AS (SELECT quantile_cont(x, 0.5) AS md FROM daily),
signed AS (
  SELECT day, CASE WHEN x > md THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med WHERE x <> md
),
runs AS (
  SELECT CAST(SUM(s) AS BIGINT) AS n_above,
         CAST(SUM(1 - s) AS BIGINT) AS n_below,
         CAST(SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END) AS BIGINT)
           AS n_runs
  FROM (SELECT day, s, LAG(s) OVER (ORDER BY day) AS prev FROM signed)
)
SELECT n_above, n_below, n_runs,
       ROUND(2.0 * n_above * n_below / (n_above + n_below) + 1.0, 4) AS expected_runs,
       ROUND((n_runs - (2.0 * n_above * n_below / (n_above + n_below) + 1.0))
             / SQRT(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below)
                    / ((n_above + n_below) * (n_above + n_below)
                       * (n_above + n_below - 1.0))), 4) AS z,
       ABS((n_runs - (2.0 * n_above * n_below / (n_above + n_below) + 1.0))
           / SQRT(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below)
                  / ((n_above + n_below) * (n_above + n_below)
                     * (n_above + n_below - 1.0)))) > 1.96 AS nonrandom
FROM runs
"""


EXT_QUERIES.update(
    {
        "ext_assortativity": ext_assortativity,
        "ext_rbo": ext_rbo,
        "ext_numeric_audit": ext_numeric_audit,
        "ext_runs_test": ext_runs_test,
    }
)
EXT_ORACLES.update(
    {
        "ext_assortativity": EXT_ASSORTATIVITY_SQL,
        "ext_rbo": EXT_RBO_SQL,
        "ext_numeric_audit": EXT_NUMERIC_AUDIT_SQL,
        "ext_runs_test": EXT_RUNS_TEST_SQL,
    }
)


# --- round-3 wave: Theil-Sen, 2-D histogram, UNK rate, McNemar ----------------


def _theil_sen_median(slopes: DataFrame, budget: int = 200_000):
    """Exact median of the double column ``s`` by two-phase distributed
    selection: a 10k-bucket histogram locates the two middle order
    statistics, and only their buckets are sorted exactly — bit-identical
    to percentile()/quantile_cont (same lo + frac*(hi-lo) interpolation
    at p=(n-1)/2) without boxing every distinct value into one
    counting-map buffer.

    Guards (the two-phase path's failure modes, asserted not assumed):
    - n == 0 (or NULL bounds from an all-NULL column) -> (0, None), no
      float(None) crash;
    - mn == mx (all values identical) -> that value, no histogram;
    - a distribution so concentrated that the order-statistic buckets
      hold more than ``budget`` rows (tight center + extreme outliers
      stretching the range) -> falls back to the single-buffer exact
      percentile() aggregate instead of collecting an unbounded bucket
      driver-side. Same value, bounded driver memory either way.
    Returns (n, median)."""
    rng = slopes.agg(
        F.count("s").alias("n"), F.min("s").alias("mn"), F.max("s").alias("mx")
    ).collect()[0]
    n = int(rng["n"])
    if n == 0 or rng["mn"] is None:
        return 0, None
    mn, mx = float(rng["mn"]), float(rng["mx"])
    if mn == mx:
        return n, mn
    w = max((mx - mn) / 10000.0, 1e-12)
    lo_idx = (n - 1) // 2
    hi_idx = (n - 1) - (n - 1) // 2
    inv_w = 1.0 / w
    hist = (
        slopes.groupBy(F.floor((F.col("s") - mn) * inv_w).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("b")
        .collect()
    )
    cum, need, need_rows = 0, [], 0
    for r in hist:
        if cum <= hi_idx and cum + r["c"] > lo_idx:
            need.append(int(r["b"]))
            need_rows += int(r["c"])
        cum += r["c"]
    if need_rows > budget:
        med = slopes.agg(
            F.expr("percentile(s, 0.5)").alias("m")
        ).collect()[0]["m"]
        return n, float(med)
    cand = sorted(
        v["s"]
        for v in slopes.filter(
            F.floor((F.col("s") - mn) * inv_w).isin(need)
        ).collect()
    )
    before = 0
    for r in hist:
        if int(r["b"]) < need[0]:
            before += r["c"]
    lo = cand[lo_idx - before]
    hi = cand[hi_idx - before]
    frac = (n - 1) * 0.5 - lo_idx
    return n, lo + frac * (hi - lo)


def ext_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of daily revenue: the median of all
    pairwise day-to-day slopes — 29% outlier breakdown where OLS
    (X205's elasticity machinery) has zero; the ESTIMATE companion to
    X283's Mann-Kendall TEST (same pair sweep, median instead of sign
    sum). Slopes are exact-int differences divided once.

    Scale shape: day-axis collapse first (checkpointed once); the
    O(days²) pair frame is SF-independent (calendar-bounded); the exact
    median comes from two-phase distributed selection with an explicit
    driver-collect row budget and a percentile() fallback — see
    ``_theil_sen_median`` (9.5 s -> 7 s warm at sf0.1; the value is
    bit-identical to percentile()/quantile_cont either way)."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"))
        # materialize the O(days) axis once: the selection below runs three
        # jobs over the pair frame, and without truncation each re-scans the
        # fact table
        .localCheckpoint()
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"))
    # try_divide: the histogram-filter predicate below gets pushed into the
    # join and may be evaluated BEFORE the d1<d2 conjunct; on a same-day
    # pair datediff is 0 and Spark-4 ANSI throws even for double division.
    # try_divide yields NULL there, and those pairs are excluded by the
    # join condition anyway — values on surviving pairs are identical.
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        F.try_divide(
            (F.col("x2") - F.col("x1")).cast("double"),
            F.datediff("d2", "d1").cast("double"),
        ).alias("s")
    )
    n, med = _theil_sen_median(slopes)
    out = spark.createDataFrame(
        [(n, med)], "n_pairs long, med double"
    )
    return out.select(
        "n_pairs",
        F.round(F.col("med") / 100.0, 4).alias("slope_dollars_per_day"),
    )


EXT_THEIL_SEN_SQL = r"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT CAST(b.x - a.x AS DOUBLE) / date_diff('day', a.day, b.day) AS s
  FROM daily a JOIN daily b ON a.day < b.day
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(s, 0.5) / 100.0, 4) AS slope_dollars_per_day
FROM slopes
"""


def ext_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density grid of (quantity band x discount level) with each
    cell's revenue share — the joint-distribution heatmap behind
    pricing questions that two 1-D histograms (X52) cannot answer
    (quantity and discount are dependent: that IS the finding). Exact
    integer binning (quantities band by 5s, discounts are exact cent
    levels), revenue in exact cents.

    Scale shape: one row-local binning pass, one O(cells) hash agg,
    broadcast total for the share."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.floor((F.round(F.col("l_quantity")).cast("long") - 1) / 5).alias("q_band"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ec"),
    )
    cells = li.groupBy("q_band", "disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum("ec").alias("rev_c")
    )
    tot = cells.agg(F.sum("rev_c").alias("t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "q_band",
            "disc_pct",
            "n_lines",
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("rev_c") / F.col("t").cast("double"), 6).alias(
                "rev_share"
            ),
        )
        .orderBy("q_band", "disc_pct")
    )


EXT_HIST2D_SQL = r"""
WITH li AS (
  SELECT CAST(FLOOR((CAST(ROUND(l_quantity) AS BIGINT) - 1) / 5.0) AS BIGINT)
           AS q_band,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ec
  FROM lineitem
),
cells AS (
  SELECT q_band, disc_pct, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(ec) AS BIGINT) AS rev_c
  FROM li GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS t FROM cells)
SELECT q_band, disc_pct, n_lines,
       ROUND(rev_c / 100.0, 2) AS revenue,
       ROUND(CAST(rev_c AS DOUBLE) / t, 6) AS rev_share
FROM cells CROSS JOIN tot
ORDER BY q_band, disc_pct
"""


def ext_unk_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-truncation impact per source: with the corpus vocab
    capped at min_count >= 3, the share of running tokens that become
    '<unk>' and the share of kept (distinct) types — the tokenizer-
    budget tradeoff every vocab-capped model makes, broken out by
    source (template-heavy feeds keep more mass with fewer types).

    Scale shape: one corpus token-count exchange builds the kept-vocab
    set; per-source rates come from a second count pass joined against
    the broadcast-sized kept set (vocab ≪ corpus)."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("kept", (F.col("c") >= 3).cast("int"))
    )
    per = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(vocab.select("w", "kept"), "w")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("n") * (1 - F.col("kept"))).alias("n_unk_tokens"),
            F.sum(F.lit(1) - F.col("kept")).alias("n_unk_types"),
        )
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_unk_tokens") / F.col("n_tokens").cast("double"), 6).alias(
            "unk_token_rate"
        ),
        F.round(F.col("n_unk_types") / F.col("n_types").cast("double"), 6).alias(
            "unk_type_rate"
        ),
    ).orderBy("source")


EXT_UNK_RATE_SQL = r"""
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) WHERE w <> ''
),
vocab AS (
  SELECT w, CASE WHEN COUNT(*) >= 3 THEN 1 ELSE 0 END AS kept
  FROM tok GROUP BY 1
),
per AS (
  SELECT t.source, t.w, CAST(COUNT(*) AS BIGINT) AS n, MAX(v.kept) AS kept
  FROM tok t JOIN vocab v ON v.w = t.w
  GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(n * (1 - kept)) AS DOUBLE) / SUM(n), 6) AS unk_token_rate,
       ROUND(CAST(SUM(1 - kept) AS DOUBLE) / COUNT(*), 6) AS unk_type_rate
FROM per GROUP BY 1 ORDER BY source
"""


def ext_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test between two English detectors on the SAME
    documents — the marker-based lang-id (X11) vs a stopword-ratio
    threshold — counting only the discordant documents (b: only A
    right, c: only B right), continuity-corrected chi-square — the
    correct way to compare two classifiers evaluated on one corpus
    (two independent accuracy CIs overlap-test is wrong; X243/X265
    score one model, this decides between two).

    Scale shape: row-local predictions, one O(1) discordance collapse."""
    docs = text.lang_id(_t(spark, sf_dir, "documents"))
    stops = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    scored = docs.select(
        (F.col("lang") == "en").alias("y"),
        (F.col("pred_lang") == "en").alias("pa"),
        (
            (
                F.size(F.filter(toks, lambda w: w.isin(stops)))
                / F.greatest(F.size(toks), F.lit(1))
            )
            > 0.08
        ).alias("pb"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y"))).cast("long")).alias("b"),
        F.sum(((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y"))).cast("long")).alias("c"),
    )
    chi = (
        (F.abs(F.col("b") - F.col("c")) - 1)
        * (F.abs(F.col("b") - F.col("c")) - 1)
        / (F.col("b") + F.col("c")).cast("double")
    )
    return agg.select(
        "n_docs",
        "b",
        "c",
        F.round(chi, 4).alias("mcnemar_chi2"),
        (chi > 3.841).alias("detectors_differ"),
    )


EXT_MCNEMAR_SQL = r"""
WITH scored AS (
  SELECT lang = 'en' AS y,
         (CASE
            WHEN GREATEST(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
            WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr) THEN 'de'
            WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr) THEN 'en'
            WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr) THEN 'es'
            ELSE 'fr'
          END) = 'en' AS pa,
         (CAST(len(list_filter(toks, w -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it'], w)))
           AS DOUBLE) / GREATEST(len(toks), 1)) > 0.08 AS pb
  FROM (
    SELECT lang,
           LEN(regexp_extract_all(LOWER(text), '\b(der|und|das|nicht)\b')) AS score_de,
           LEN(regexp_extract_all(LOWER(text), '\b(the|and|of|is)\b')) AS score_en,
           LEN(regexp_extract_all(LOWER(text), '\b(el|los|una|que)\b')) AS score_es,
           LEN(regexp_extract_all(LOWER(text), '\b(le|la|les|des)\b')) AS score_fr,
           list_filter(string_split_regex(TRIM(LOWER(text)), '\s+'),
                       w -> w <> '') AS toks
    FROM documents
  )
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM scored
)
SELECT n_docs, b, c,
       ROUND((ABS(b - c) - 1) * (ABS(b - c) - 1) / CAST(b + c AS DOUBLE), 4)
         AS mcnemar_chi2,
       (ABS(b - c) - 1) * (ABS(b - c) - 1) / CAST(b + c AS DOUBLE) > 3.841
         AS detectors_differ
FROM agg
"""


EXT_QUERIES.update(
    {
        "ext_theil_sen": ext_theil_sen,
        "ext_hist2d": ext_hist2d,
        "ext_unk_rate": ext_unk_rate,
        "ext_mcnemar": ext_mcnemar,
    }
)
EXT_ORACLES.update(
    {
        "ext_theil_sen": EXT_THEIL_SEN_SQL,
        "ext_hist2d": EXT_HIST2D_SQL,
        "ext_unk_rate": EXT_UNK_RATE_SQL,
        "ext_mcnemar": EXT_MCNEMAR_SQL,
    }
)


# --- round-3 wave: LOF outliers, LSH parameter planner ------------------------


def ext_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local outlier factor (k=5, euclidean) on the hash-thinned
    embedding panel: reach-dist smoothed density ratio vs each point's
    neighborhood — the DENSITY-based outlier detector that catches
    points stranded between clusters, which both the centroid audit
    (X190) and the Mahalanobis fence (X285) miss by construction.
    Top-20 by LOF.

    Scale shape: exact k-NN from the broadcast pair scan on the panel
    (ANN candidates at corpus scale); k-dist/lrd/LOF are three O(n*k)
    regroupings — no step touches more than the neighbor lists."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    pairs = (
        F.broadcast(e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
        .crossJoin(e.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
        .filter(F.col("qid") != F.col("cid"))
    )
    d = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        9,
    )
    wq = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("cid").asc())
    nn = (
        pairs.select("qid", "cid", d.alias("d"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 5)
        .localCheckpoint()
    )
    kdist = nn.groupBy("qid").agg(F.max("d").alias("kd"))
    reach = nn.join(
        kdist.select(F.col("qid").alias("cid"), F.col("kd").alias("kd_o")), "cid"
    ).select("qid", "cid", F.greatest("d", "kd_o").alias("rd"))
    lrd = reach.groupBy("qid").agg((1.0 / F.avg("rd")).alias("lrd"))
    lof = (
        nn.join(lrd.select(F.col("qid").alias("cid"), F.col("lrd").alias("lrd_o")), "cid")
        .groupBy("qid")
        .agg(F.avg("lrd_o").alias("avg_lrd_o"))
        .join(lrd, "qid")
        .select("qid", (F.col("avg_lrd_o") / F.col("lrd")).alias("lof"))
    )
    return (
        lof.select(F.col("qid").alias("vec_id"), F.round("lof", 4).alias("lof"))
        .orderBy(F.col("lof").desc(), "vec_id")
        .limit(20)
    )


EXT_LOF_SQL = r"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 4 = 0
),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(list_distance(q.v, c.v), 9) AS d
  FROM e q CROSS JOIN e c WHERE q.vec_id <> c.vec_id
),
nn AS (
  SELECT qid, cid, d FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid ASC) AS rn
    FROM scored
  ) WHERE rn <= 5
),
kdist AS (SELECT qid, MAX(d) AS kd FROM nn GROUP BY 1),
reach AS (
  SELECT n.qid, n.cid, GREATEST(n.d, ko.kd) AS rd
  FROM nn n JOIN kdist ko ON ko.qid = n.cid
),
lrd AS (SELECT qid, 1.0 / AVG(rd) AS lrd FROM reach GROUP BY 1),
lof AS (
  SELECT n.qid, AVG(lo.lrd) / MAX(ls.lrd) AS lof
  FROM nn n
  JOIN lrd lo ON lo.qid = n.cid
  JOIN lrd ls ON ls.qid = n.qid
  GROUP BY n.qid
)
SELECT qid AS vec_id, ROUND(lof, 4) AS lof
FROM lof ORDER BY lof DESC, vec_id LIMIT 20
"""


def ext_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planner: for each (bands, rows) layout of a
    128-hash signature budget, the S-curve capture probability
    1-(1-t^r)^b at the X3 operating threshold (t=0.3) and at a clear-
    duplicate point (t=0.8), plus the curve's inflection threshold
    (1/b)^(1/r) — the planning artifact that turns 'pick bands=32'
    folklore into a table the dedup owner can read (compare X273's
    salting plan: same philosophy, different knob).

    Scale shape: pure O(layouts) arithmetic on a literal frame — the
    point is the artifact, not the scan."""
    layouts = [(b, 128 // b) for b in [4, 8, 16, 32, 64]]
    base = spark.createDataFrame(
        [(b, r) for b, r in layouts], "bands int, rows_per_band int"
    )
    p_at = lambda t: 1.0 - F.pow(
        1.0 - F.pow(F.lit(t), F.col("rows_per_band")), F.col("bands")
    )
    return base.select(
        "bands",
        "rows_per_band",
        F.round(F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band")), 4).alias(
            "inflection_threshold"
        ),
        F.round(p_at(0.3), 6).alias("p_capture_at_030"),
        F.round(p_at(0.8), 6).alias("p_capture_at_080"),
    ).orderBy("bands")


EXT_LSH_PLANNER_SQL = r"""
WITH layouts AS (
  SELECT UNNEST([4, 8, 16, 32, 64]) AS bands
),
base AS (SELECT bands, 128 // bands AS rows_per_band FROM layouts)
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       ROUND(POWER(1.0 / bands, 1.0 / rows_per_band), 4) AS inflection_threshold,
       ROUND(1.0 - POWER(1.0 - POWER(0.3, rows_per_band), bands), 6)
         AS p_capture_at_030,
       ROUND(1.0 - POWER(1.0 - POWER(0.8, rows_per_band), bands), 6)
         AS p_capture_at_080
FROM base ORDER BY bands
"""


EXT_QUERIES.update(
    {
        "ext_lof": ext_lof,
        "ext_lsh_planner": ext_lsh_planner,
    }
)
EXT_ORACLES.update(
    {
        "ext_lof": EXT_LOF_SQL,
        "ext_lsh_planner": EXT_LSH_PLANNER_SQL,
    }
)


# --- round-3 wave: fairness audits --------------------------------------------


def ext_exposure_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure fairness of the BM25 ranking: each source's share of
    position-discounted exposure (1/log2(rank+1)) in the top-50 vs its
    share of the candidate pool — the ranking-fairness audit that
    catches a feed monopolizing the head even when per-item scoring is
    'fair' (skew ratio > 1 = over-exposed).

    Scale shape: ranking over the retrieval-bounded candidate set
    (X251's bound); exposure and pool shares are two O(sources)
    collapses against broadcast totals."""
    docs = _t(spark, sf_dir, "documents")
    cand = (
        text.bm25_scores(docs, BM25_QUERY_TERMS)
        .select("doc_id", "score")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    wr = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    ranked = cand.withColumn("rank", F.row_number().over(wr))
    exp = ranked.filter(F.col("rank") <= 50).select(
        "source", (1.0 / F.log2(F.col("rank") + 1)).alias("e")
    )
    per_exp = exp.groupBy("source").agg(F.sum("e").alias("exposure"))
    tot_exp = per_exp.agg(F.sum("exposure").alias("te"))
    pool = cand.groupBy("source").agg(F.count(F.lit(1)).alias("n_pool"))
    tot_pool = pool.agg(F.sum("n_pool").alias("tp"))
    return (
        pool.join(per_exp, "source", "left")
        .na.fill({"exposure": 0.0})
        .crossJoin(F.broadcast(tot_exp))
        .crossJoin(F.broadcast(tot_pool))
        .select(
            "source",
            "n_pool",
            F.round(F.col("exposure"), 4).alias("exposure"),
            F.round(F.col("exposure") / F.col("te"), 6).alias("exposure_share"),
            F.round(F.col("n_pool") / F.col("tp").cast("double"), 6).alias(
                "pool_share"
            ),
            F.round(
                (F.col("exposure") / F.col("te"))
                / (F.col("n_pool") / F.col("tp").cast("double")),
                4,
            ).alias("skew_ratio"),
        )
        .orderBy("source")
    )


EXT_EXPOSURE_FAIRNESS_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS w
  FROM documents
),
lens AS (SELECT doc_id, len(w) AS dl, w FROM toks),
scalars AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM lens),
words AS (SELECT doc_id, dl, UNNEST(w) AS word FROM lens),
tf AS (
  SELECT doc_id, dl, word, COUNT(*) AS tf
  FROM words WHERE word IN ('join', 'merge', 'window')
  GROUP BY doc_id, dl, word
),
dfreq AS (SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY word),
comp AS (
  SELECT tf.doc_id,
         CAST(
           LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.doc_freq AS DOUBLE) + 0.5)
                    / (CAST(d.doc_freq AS DOUBLE) + 0.5))
           * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE)
                                     / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))
           AS DECIMAL(27,12)) AS comp
  FROM tf JOIN dfreq d ON tf.word = d.word CROSS JOIN scalars s
),
cand AS (
  SELECT c.doc_id, ROUND(CAST(SUM(comp) AS DOUBLE), 6) AS score, dd.source
  FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
  GROUP BY c.doc_id, dd.source
),
ranked AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM cand
),
per_exp AS (
  SELECT source, SUM(1.0 / log2(rank + 1)) AS exposure
  FROM ranked WHERE rank <= 50 GROUP BY 1
),
te AS (SELECT SUM(exposure) AS te FROM per_exp),
pool AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pool FROM cand GROUP BY 1),
tp AS (SELECT CAST(SUM(n_pool) AS BIGINT) AS tp FROM pool)
SELECT p.source, p.n_pool,
       ROUND(COALESCE(e.exposure, 0.0), 4) AS exposure,
       ROUND(COALESCE(e.exposure, 0.0) / te.te, 6) AS exposure_share,
       ROUND(CAST(p.n_pool AS DOUBLE) / tp.tp, 6) AS pool_share,
       ROUND((COALESCE(e.exposure, 0.0) / te.te)
             / (CAST(p.n_pool AS DOUBLE) / tp.tp), 4) AS skew_ratio
FROM pool p
LEFT JOIN per_exp e ON e.source = p.source
CROSS JOIN te CROSS JOIN tp
ORDER BY p.source
"""


def ext_selection_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-rate parity audit of the quality filter (keep if
    quality >= 0.5) across languages: per-group selection rate, the
    disparate-impact ratio vs the most-selected group, and the 0.8-rule
    flag — the group-fairness audit a curation pipeline owes its
    corpus before a filter silently erases a language.

    Scale shape: row-local scoring, one O(langs) collapse, broadcast
    max-rate scalar."""
    docs = text.quality_score(_t(spark, sf_dir, "documents"))
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("quality") >= 0.5).cast("long")).alias("n_selected"),
    )
    per = per.withColumn(
        "rate", F.col("n_selected") / F.col("n_docs").cast("double")
    )
    mx = per.agg(F.max("rate").alias("max_rate"))
    return (
        per.crossJoin(F.broadcast(mx))
        .select(
            "lang",
            "n_docs",
            "n_selected",
            F.round("rate", 6).alias("selection_rate"),
            F.round(F.col("rate") / F.col("max_rate"), 4).alias(
                "impact_ratio"
            ),
            (F.col("rate") / F.col("max_rate") < 0.8).alias("fails_80_rule"),
        )
        .orderBy("lang")
    )


EXT_SELECTION_PARITY_SQL = r"""
WITH scored AS (
  SELECT lang,
         ROUND(
           LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
           * (1.0 - CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)),
           4) AS quality
  FROM documents
),
per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_selected
  FROM scored GROUP BY 1
),
mx AS (SELECT MAX(CAST(n_selected AS DOUBLE) / n_docs) AS max_rate FROM per)
SELECT lang, n_docs, n_selected,
       ROUND(CAST(n_selected AS DOUBLE) / n_docs, 6) AS selection_rate,
       ROUND((CAST(n_selected AS DOUBLE) / n_docs) / max_rate, 4) AS impact_ratio,
       (CAST(n_selected AS DOUBLE) / n_docs) / max_rate < 0.8 AS fails_80_rule
FROM per CROSS JOIN mx
ORDER BY lang
"""


EXT_QUERIES.update(
    {
        "ext_exposure_fairness": ext_exposure_fairness,
        "ext_selection_parity": ext_selection_parity,
    }
)
EXT_ORACLES.update(
    {
        "ext_exposure_fairness": EXT_EXPOSURE_FAIRNESS_SQL,
        "ext_selection_parity": EXT_SELECTION_PARITY_SQL,
    }
)


# --- round-3 wave: grouped OLS, GMM EM, permutation test ----------------------


def ext_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Massively-grouped OLS: one tiny regression per brand (quantity on
    discount) fitted from exact integer moments in a single pass — the
    'millions of small models' pattern (per-SKU elasticities, per-user
    trends) where the grouped closed form beats any model-parallel
    framework. Slope, intercept, and R² per brand.

    Scale shape: ONE hash agg computes every group's five moments;
    the fits are row-local arithmetic on the O(groups) frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.round(F.col("l_quantity")).cast("long").alias("y"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    mom = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    beta = cov_n / varx_n
    alpha = (F.col("sy").cast("double") - beta * F.col("sx")) / n
    r2 = cov_n * cov_n / (varx_n * vary_n)
    return mom.select(
        "p_brand",
        "n",
        F.round(beta, 6).alias("beta_qty_per_disc_pt"),
        F.round(alpha, 4).alias("alpha"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("p_brand")


EXT_GROUPED_OLS_SQL = r"""
WITH li AS (
  SELECT p.p_brand,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(ROUND(l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
mom AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM li GROUP BY 1
)
SELECT p_brand, n,
       ROUND((n * sxy - CAST(sx AS DOUBLE) * sy)
             / (n * sxx - CAST(sx AS DOUBLE) * sx), 6) AS beta_qty_per_disc_pt,
       ROUND((sy - ((n * sxy - CAST(sx AS DOUBLE) * sy)
                    / (n * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n, 4) AS alpha,
       ROUND((n * sxy - CAST(sx AS DOUBLE) * sy) * (n * sxy - CAST(sx AS DOUBLE) * sy)
             / ((n * sxx - CAST(sx AS DOUBLE) * sx)
                * (n * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
FROM mom ORDER BY p_brand
"""


def ext_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture on order values by FIVE fixed
    EM iterations — the distributed-EM pattern: each iteration is ONE
    aggregate pass with the current parameters as broadcast scalars
    (responsibilities are row-local; no per-row state ever persists).
    Deterministic quantile/moment initialization makes the whole
    trajectory engine-replayable (the oracle unrolls the same five
    steps). Reports mixture weights, component means/sds, and the final
    average log-likelihood.

    Scale shape: 5 passes x one O(1)-output aggregate each; parameters
    move driver-side as scalars (the accepted scalar-collect class)."""
    import math as _math

    orders = _t(spark, sf_dir, "orders")
    xs = orders.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias("x")
    )
    init = xs.agg(
        F.expr("percentile(x, 0.25)").alias("mu1"),
        F.expr("percentile(x, 0.75)").alias("mu2"),
        F.stddev_pop("x").alias("sd"),
    ).collect()[0]
    pi1, mu1, sd1 = 0.5, float(init["mu1"]), float(init["sd"])
    pi2, mu2, sd2 = 0.5, float(init["mu2"]), float(init["sd"])
    c = float(_math.sqrt(2.0 * _math.pi))
    for _ in range(5):
        d1 = (F.lit(pi1) / (c * sd1)) * F.exp(
            -((F.col("x") - mu1) * (F.col("x") - mu1)) / (2.0 * sd1 * sd1)
        )
        d2 = (F.lit(pi2) / (c * sd2)) * F.exp(
            -((F.col("x") - mu2) * (F.col("x") - mu2)) / (2.0 * sd2 * sd2)
        )
        r2 = d2 / (d1 + d2)
        step = xs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(r2).alias("w2"),
            F.sum(r2 * F.col("x")).alias("s2"),
            F.sum(r2 * F.col("x") * F.col("x")).alias("q2"),
            F.sum((1.0 - r2) * F.col("x")).alias("s1"),
            F.sum((1.0 - r2) * F.col("x") * F.col("x")).alias("q1"),
            F.sum(F.log(d1 + d2)).alias("ll"),
        ).collect()[0]
        n = float(step["n"])
        w2 = float(step["w2"])
        w1 = n - w2
        mu1 = float(step["s1"]) / w1
        mu2 = float(step["s2"]) / w2
        sd1 = _math.sqrt(max(float(step["q1"]) / w1 - mu1 * mu1, 1e-6))
        sd2 = _math.sqrt(max(float(step["q2"]) / w2 - mu2 * mu2, 1e-6))
        pi1, pi2 = w1 / n, w2 / n
        avg_ll = float(step["ll"]) / n
    out = spark.createDataFrame(
        [(int(n), pi1, mu1, sd1, mu2, sd2, avg_ll)],
        "n_orders long, pi1 double, mu1 double, sd1 double, "
        "mu2 double, sd2 double, avg_loglik double",
    )
    return out.select(
        "n_orders",
        F.round("pi1", 4).alias("pi1"),
        F.round("mu1", 2).alias("mu1"),
        F.round("sd1", 2).alias("sd1"),
        F.round("mu2", 2).alias("mu2"),
        F.round("sd2", 2).alias("sd2"),
        F.round("avg_loglik", 4).alias("avg_loglik"),
    )


def _gmm_oracle_sql() -> str:
    head = r"""
WITH xs AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS x FROM orders
),
p0 AS (
  SELECT 0.5 AS pi1, quantile_cont(x, 0.25) AS mu1, STDDEV_POP(x) AS sd1,
         0.5 AS pi2, quantile_cont(x, 0.75) AS mu2, STDDEV_POP(x) AS sd2
  FROM xs
)"""
    step = r""",
s{k} AS (
  SELECT COUNT(*) AS n,
         SUM(r2) AS w2, SUM(r2 * x) AS ss2, SUM(r2 * x * x) AS q2,
         SUM((1.0 - r2) * x) AS ss1, SUM((1.0 - r2) * x * x) AS q1,
         SUM(LN(d1 + d2)) AS ll
  FROM (
    SELECT x, d1, d2, d2 / (d1 + d2) AS r2 FROM (
      SELECT x,
             (p.pi1 / (SQRT(2 * PI()) * p.sd1))
               * EXP(-((x - p.mu1) * (x - p.mu1)) / (2 * p.sd1 * p.sd1)) AS d1,
             (p.pi2 / (SQRT(2 * PI()) * p.sd2))
               * EXP(-((x - p.mu2) * (x - p.mu2)) / (2 * p.sd2 * p.sd2)) AS d2
      FROM xs CROSS JOIN p{j} p
    )
  )
),
p{k} AS (
  SELECT (n - w2) / n AS pi1, ss1 / (n - w2) AS mu1,
         SQRT(GREATEST(q1 / (n - w2) - (ss1 / (n - w2)) * (ss1 / (n - w2)), 1e-6)) AS sd1,
         w2 / n AS pi2, ss2 / w2 AS mu2,
         SQRT(GREATEST(q2 / w2 - (ss2 / w2) * (ss2 / w2), 1e-6)) AS sd2,
         n, ll / n AS avg_ll
  FROM s{k}
)"""
    blocks = "".join(step.format(k=k, j=k - 1) for k in range(1, 6))
    tail = r"""
SELECT CAST(n AS BIGINT) AS n_orders,
       ROUND(pi1, 4) AS pi1, ROUND(mu1, 2) AS mu1, ROUND(sd1, 2) AS sd1,
       ROUND(mu2, 2) AS mu2, ROUND(sd2, 2) AS sd2,
       ROUND(avg_ll, 4) AS avg_loglik
FROM p5"""
    return head + blocks + tail


EXT_GMM_EM_SQL = _gmm_oracle_sql()


def ext_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the hash-arm difference in per-user purchase
    value: 200 deterministic hash-relabelings of the arms, two-sided
    p-value = (1 + #{|diff_perm| >= |diff_obs|}) / (B + 1) — exact-
    distribution inference with NO normality assumption (X230's power
    math and X274's CUPED assume one; this checks it). All arm sums in
    exact cents.

    Scale shape: the panel collapses per user once; the B=200 relabeled
    sums partial-aggregate map-side into O(B) groups (one exchange);
    the p-value is an O(B) fold."""
    ev = _t(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("yc"))
    )
    obs = per.groupBy((F.col("user_id") % 2 == 0).cast("int").alias("arm")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("yc").alias("s")
    ).agg(
        (
            F.max(F.when(F.col("arm") == 1, F.col("s").cast("double") / F.col("n")))
            - F.max(F.when(F.col("arm") == 0, F.col("s").cast("double") / F.col("n")))
        ).alias("obs_diff")
    )
    b = 200
    reps = per.select(
        "user_id",
        "yc",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep"),
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("-", F.lit("perm"), F.col("user_id"), F.col("rep"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    perms = (
        reps.select("rep", arm.alias("arm"), "yc")
        .groupBy("rep", "arm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("yc").alias("s"))
        .groupBy("rep")
        .agg(
            (
                F.max(F.when(F.col("arm") == 1, F.col("s").cast("double") / F.col("n")))
                - F.max(F.when(F.col("arm") == 0, F.col("s").cast("double") / F.col("n")))
            ).alias("d")
        )
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .agg(
            F.count(F.lit(1)).alias("n_perms"),
            F.round(F.max("obs_diff") / 100.0, 4).alias("obs_diff"),
            F.sum(
                (F.abs(F.col("d")) >= F.abs(F.col("obs_diff"))).cast("long")
            ).alias("n_extreme"),
            F.round(
                (
                    1.0
                    + F.sum(
                        (F.abs(F.col("d")) >= F.abs(F.col("obs_diff"))).cast(
                            "long"
                        )
                    )
                )
                / (F.count(F.lit(1)) + 1.0),
                4,
            ).alias("p_value"),
        )
    )


EXT_PERMUTATION_SQL = r"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
obs AS (
  SELECT MAX(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END)
         - MAX(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS obs_diff
  FROM (
    SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(yc) AS BIGINT) AS s
    FROM per GROUP BY 1
  )
),
reps AS (
  SELECT p.user_id, p.yc, r.rep,
         CAST(('0x' || SUBSTR(md5('perm' || '-' || p.user_id || '-' || r.rep), 1, 12))::UBIGINT
              % 2 AS BIGINT) AS arm
  FROM per p CROSS JOIN (SELECT UNNEST(range(0, 200)) AS rep) r
),
perms AS (
  SELECT rep,
         MAX(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END)
         - MAX(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS d
  FROM (
    SELECT rep, arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(yc) AS BIGINT) AS s
    FROM reps GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
       ROUND(MAX(o.obs_diff) / 100.0, 4) AS obs_diff,
       CAST(SUM(CASE WHEN ABS(d) >= ABS(o.obs_diff) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme,
       ROUND((1.0 + SUM(CASE WHEN ABS(d) >= ABS(o.obs_diff) THEN 1 ELSE 0 END))
             / (COUNT(*) + 1.0), 4) AS p_value
FROM perms CROSS JOIN obs o
"""


EXT_QUERIES.update(
    {
        "ext_grouped_ols": ext_grouped_ols,
        "ext_gmm_em": ext_gmm_em,
        "ext_permutation_test": ext_permutation_test,
    }
)
EXT_ORACLES.update(
    {
        "ext_grouped_ols": EXT_GROUPED_OLS_SQL,
        "ext_gmm_em": EXT_GMM_EM_SQL,
        "ext_permutation_test": EXT_PERMUTATION_SQL,
    }
)


# --- round-3 wave: Friedman, Kendall tau-b, Brown-Forsythe --------------------


# chi-square 0.95 quantiles for df 1..10. Decision flags DERIVE their
# critical value from the OBSERVED treatment/group cardinality instead of
# hardcoding the df=4 constant, so the boolean cannot silently test
# against the wrong distribution if the event-type or segment count ever
# differs from 5 (beyond df=10 the flag is NULL: refuse to decide rather
# than misdecide). F(df1, inf) = chi2(df1)/df1 reuses the same table.
_CHI2_CRIT_95 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
}


def _chi2_crit_95_expr(df_col):
    expr = F.lit(None).cast("double")
    for d, c in sorted(_CHI2_CRIT_95.items(), reverse=True):
        expr = F.when(df_col == F.lit(d), F.lit(c)).otherwise(expr)
    return expr


def _chi2_crit_95_case(df_sql: str) -> str:
    whens = " ".join(
        f"WHEN {df_sql} = {d} THEN {c}" for d, c in sorted(_CHI2_CRIT_95.items())
    )
    return f"(CASE {whens} END)"


def ext_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the event types keep the same daily-volume
    ORDERING across days? Average ranks within each day-block (exact
    tie handling via less/equal counts — no window sort), tie-robust
    chi-square form — the nonparametric repeated-measures test for
    blocked designs that one-way tests (X118's chi-square) get wrong by
    ignoring the day blocking.

    Scale shape: facts collapse to the O(days x types) grid; ranks come
    from a within-block self-join on that tiny grid; the statistic is
    O(types) arithmetic."""
    ev = _t(spark, sf_dir, "events")
    grid = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("x"))
    a = grid.select(F.col("day"), F.col("event_type").alias("t"), F.col("x").alias("xa"))
    b = grid.select(F.col("day"), F.col("event_type").alias("u"), F.col("x").alias("xb"))
    ranks = (
        a.join(b, "day")
        .groupBy("day", "t", "xa")
        .agg(
            F.sum((F.col("xb") < F.col("xa")).cast("long")).alias("less"),
            F.sum((F.col("xb") == F.col("xa")).cast("long")).alias("eq"),
        )
        .select(
            "day",
            "t",
            (F.col("less") + (F.col("eq") + 1) / 2.0).alias("r"),
        )
    )
    scal = ranks.agg(
        F.count_distinct("day").alias("n"),
        F.count_distinct("t").alias("k"),
        F.count(F.lit(1)).alias("cells"),
        F.sum(F.col("r") * F.col("r")).alias("sr2"),
    )
    per_t = ranks.groupBy("t").agg(F.sum("r").alias("rj"))
    stat = (
        per_t.crossJoin(F.broadcast(scal))
        .agg(
            F.max("n").alias("n_blocks"),
            F.max("k").alias("k_treatments"),
            F.max("cells").alias("cells"),
            (
                (F.max("k") - 1)
                * F.sum(
                    (F.col("rj") - F.col("n") * (F.col("k") + 1) / 2.0)
                    * (F.col("rj") - F.col("n") * (F.col("k") + 1) / 2.0)
                )
                / (
                    F.max("sr2")
                    - F.max("n")
                    * F.max("k")
                    * (F.max("k") + 1)
                    * (F.max("k") + 1)
                    / 4.0
                )
            ).alias("chi2"),
        )
    )
    crit = _chi2_crit_95_expr(F.col("k_treatments") - 1)
    complete = F.col("cells") == F.col("n_blocks") * F.col("k_treatments")
    return stat.select(
        "n_blocks",
        "k_treatments",
        # Friedman assumes a complete block design (every treatment
        # present in every block) — checked, not assumed; the decision
        # flag only fires on a valid design
        complete.alias("complete_blocks"),
        F.round("chi2", 4).alias("friedman_chi2"),
        crit.alias("chi2_crit"),
        (complete & (F.col("chi2") > crit)).alias("ordering_differs"),
    )


EXT_FRIEDMAN_SQL = r"""
WITH grid AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
ranks AS (
  SELECT a.day, a.event_type AS t,
         SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
         + (SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1) / 2.0 AS r
  FROM grid a JOIN grid b ON b.day = a.day
  GROUP BY a.day, a.event_type, a.x
),
scal AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT t) AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS cells,
         SUM(r * r) AS sr2
  FROM ranks
),
per_t AS (SELECT t, SUM(r) AS rj FROM ranks GROUP BY 1)
SELECT MAX(n) AS n_blocks, MAX(k) AS k_treatments,
       MAX(cells) = MAX(n) * MAX(k) AS complete_blocks,
       ROUND((MAX(k) - 1)
             * SUM((rj - n * (k + 1) / 2.0) * (rj - n * (k + 1) / 2.0))
             / (MAX(sr2) - MAX(n) * MAX(k) * (MAX(k) + 1) * (MAX(k) + 1) / 4.0),
             4) AS friedman_chi2,
       __CRIT__ AS chi2_crit,
       MAX(cells) = MAX(n) * MAX(k) AND
       (MAX(k) - 1)
       * SUM((rj - n * (k + 1) / 2.0) * (rj - n * (k + 1) / 2.0))
       / (MAX(sr2) - MAX(n) * MAX(k) * (MAX(k) + 1) * (MAX(k) + 1) / 4.0)
       > __CRIT__ AS ordering_differs
FROM per_t CROSS JOIN scal
""".replace("__CRIT__", _chi2_crit_95_case("MAX(k) - 1"))


def ext_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily click and purchase volumes (exact
    concordant/discordant pair counts with full tie correction, all
    integer arithmetic) — the concordance view of association: unlike
    Spearman (X257) it has a direct probabilistic reading
    (P(concordant) - P(discordant)) and is robust to the day-count ties
    these small integer series are full of.

    Scale shape: both series collapse to the shared O(days) axis; the
    pair sweep is the SF-independent tiny-axis self-join; tie terms
    come from two O(distinct values) collapses."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
        )
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = a.join(b, F.col("d1") < F.col("d2")).select(
        (F.signum((F.col("x2") - F.col("x1")).cast("double"))
         * F.signum((F.col("y2") - F.col("y1")).cast("double"))).alias("cd")
    )
    cdn = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((F.col("cd") > 0).cast("long")).alias("conc"),
        F.sum((F.col("cd") < 0).cast("long")).alias("disc"),
    )
    tx = daily.groupBy("x").agg(F.count(F.lit(1)).alias("t")).agg(
        F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n1")
    )
    ty = daily.groupBy("y").agg(F.count(F.lit(1)).alias("t")).agg(
        F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n2")
    )
    j = cdn.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    tau = (F.col("conc") - F.col("disc")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n2")).cast("double")
    )
    return j.select(
        "n0",
        "conc",
        "disc",
        F.round(tau, 6).alias("kendall_tau_b"),
    )


EXT_KENDALL_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
pairs AS (
  SELECT SIGN(b.x - a.x) * SIGN(b.y - a.y) AS cd
  FROM daily a JOIN daily b ON a.day < b.day
),
cdn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN cd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN cd < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc
  FROM pairs
),
tx AS (
  SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
  FROM (SELECT x, COUNT(*) AS t FROM daily GROUP BY 1)
),
ty AS (
  SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
  FROM (SELECT y, COUNT(*) AS t FROM daily GROUP BY 1)
)
SELECT n0, conc, disc,
       ROUND(CAST(conc - disc AS DOUBLE)
             / SQRT(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)), 6) AS kendall_tau_b
FROM cdn CROSS JOIN tx CROSS JOIN ty
"""


def ext_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across market segments
    (one-way ANOVA on |x - group median|, the median-centered Levene
    variant that is robust to skew) — the PRECONDITION check for every
    pooled-variance comparison in this suite (X230's power math, the
    t-flavored readouts): unequal spreads invalidate them, and this
    says so first.

    Scale shape: per-group exact medians broadcast back, one moment
    pass over the row-local absolute deviations, O(groups) F
    arithmetic."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    x = orders.join(cust, "o_custkey").select(
        "c_mktsegment",
        (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias("x"),
    )
    med = x.groupBy("c_mktsegment").agg(
        F.expr("percentile(x, 0.5)").alias("md")
    )
    z = x.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", F.abs(F.col("x") - F.col("md")).alias("z")
    )
    g = z.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("s"),
    )
    jg = g.crossJoin(F.broadcast(tot))
    zbar = F.col("s") / F.col("n")
    zg = F.col("sz") / F.col("ng")
    between = F.sum(F.col("ng") * (zg - zbar) * (zg - zbar))
    within = F.sum(F.col("szz") - F.col("sz") * F.col("sz") / F.col("ng"))
    stat = jg.agg(
        F.max("n").alias("n_orders"),
        F.max("k").alias("k_groups"),
        (
            (between / (F.max("k") - 1)) / (within / (F.max("n") - F.max("k")))
        ).alias("f"),
    )
    # F(k-1, inf) critical value derived from the observed group count:
    # chi2_crit(k-1)/(k-1) — 2.372 exactly when k=5, but correct for any k
    fcrit = _chi2_crit_95_expr(F.col("k_groups") - 1) / (
        F.col("k_groups") - 1
    ).cast("double")
    return stat.select(
        "n_orders",
        "k_groups",
        F.round("f", 4).alias("brown_forsythe_f"),
        fcrit.alias("f_crit"),
        (F.col("f") > fcrit).alias("variances_differ"),
    )


EXT_LEVENE_SQL = r"""
WITH x AS (
  SELECT c.c_mktsegment,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
med AS (SELECT c_mktsegment, quantile_cont(x, 0.5) AS md FROM x GROUP BY 1),
z AS (
  SELECT x.c_mktsegment, ABS(x.x - m.md) AS z
  FROM x JOIN med m ON m.c_mktsegment = x.c_mktsegment
),
g AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ng, SUM(z) AS sz,
         SUM(z * z) AS szz
  FROM z GROUP BY 1
),
tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
               SUM(sz) AS s FROM g)
SELECT MAX(n) AS n_orders, MAX(k) AS k_groups,
       ROUND((SUM(ng * (sz / ng - s / n) * (sz / ng - s / n)) / (MAX(k) - 1))
             / (SUM(szz - sz * sz / ng) / (MAX(n) - MAX(k))), 4)
         AS brown_forsythe_f,
       __CRIT__ / CAST(MAX(k) - 1 AS DOUBLE) AS f_crit,
       (SUM(ng * (sz / ng - s / n) * (sz / ng - s / n)) / (MAX(k) - 1))
       / (SUM(szz - sz * sz / ng) / (MAX(n) - MAX(k)))
       > __CRIT__ / CAST(MAX(k) - 1 AS DOUBLE)
         AS variances_differ
FROM g CROSS JOIN tot
""".replace("__CRIT__", _chi2_crit_95_case("MAX(k) - 1"))


EXT_QUERIES.update(
    {
        "ext_friedman": ext_friedman,
        "ext_kendall_tau": ext_kendall_tau,
        "ext_levene": ext_levene,
    }
)
EXT_ORACLES.update(
    {
        "ext_friedman": EXT_FRIEDMAN_SQL,
        "ext_kendall_tau": EXT_KENDALL_SQL,
        "ext_levene": EXT_LEVENE_SQL,
    }
)


# --- round-3 wave: log-rank survival comparison --------------------------------


def ext_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two hash arms' time-to-first-error
    curves: survival time = days from a user's first event to their
    first 'error' (death), users with no error censored at their last
    activity; O-E accumulated over the distinct death times with the
    hypergeometric variance — the significance companion to X177's
    Kaplan-Meier CURVE (X177 draws survival; this says whether two
    curves differ). Integer counts all the way to the final ratio.

    Scale shape: users collapse once to (arm, lifetime, churned)
    counts; at-risk sets come from a descending cumulative over the
    O(distinct lifetimes) axis; the statistic is one tiny fold."""
    ev = _t(spark, sf_dir, "events")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first"),
            F.max(F.to_date("ts")).alias("last"),
            F.min(
                F.when(F.col("event_type") == "error", F.to_date("ts"))
            ).alias("terr"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("g"),
            F.when(
                F.col("terr").isNotNull(), F.datediff("terr", "first")
            )
            .otherwise(F.datediff("last", "first"))
            .alias("tl"),
            F.col("terr").isNotNull().cast("long").alias("churned"),
        )
    )
    cells = per.groupBy("g", "tl").agg(
        F.count(F.lit(1)).alias("c"), F.sum("churned").alias("d")
    )
    wdesc = (
        Window.partitionBy("g")
        .orderBy(F.col("tl").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = cells.withColumn("n_at_risk", F.sum("c").over(wdesc))
    # align the two groups on the death-time axis
    times = risk.groupBy("tl").agg(
        F.sum("d").alias("d_tot"),
        F.sum(F.when(F.col("g") == 1, F.col("d"))).alias("d1"),
    )
    # at-risk per group at each time tl: cumulative from the cells frame
    r1 = risk.filter(F.col("g") == 1).select("tl", F.col("n_at_risk").alias("n1r"))
    r0 = risk.filter(F.col("g") == 0).select("tl", F.col("n_at_risk").alias("n0r"))
    # a group may have no cell at a given tl: at-risk = risk at the next
    # HIGHER existing tl... handled by joining on the union axis with a
    # descending cumulative max; with daily-integer lifetimes both groups
    # populate nearly every tl, and absent rows mean the group's at-risk
    # equals its value at the next lower tl -> use last_value over ordered
    # axis (tiny).
    axis = times.select("tl")
    wfill = (
        Window.orderBy(F.col("tl").desc()).rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        axis.join(r1, "tl", "left")
        .join(r0, "tl", "left")
        .withColumn("n1", F.max("n1r").over(wfill))
        .withColumn("n0", F.max("n0r").over(wfill))
        .na.fill({"n1": 0, "n0": 0})
    )
    j = times.join(filled.select("tl", "n1", "n0"), "tl").filter(
        F.col("d_tot") > 0
    )
    n = (F.col("n1") + F.col("n0")).cast("double")
    e1 = F.col("d_tot") * F.col("n1") / n
    # a time with a single subject at risk contributes zero variance
    # (hypergeometric of n=1 is degenerate; ANSI division would throw)
    v = F.when(
        n > 1.0,
        F.col("d_tot")
        * (F.col("n1") / n)
        * (1.0 - F.col("n1") / n)
        * (n - F.col("d_tot"))
        / (n - 1.0),
    ).otherwise(F.lit(0.0))
    agg = j.agg(
        F.sum(F.coalesce(F.col("d1"), F.lit(0))).alias("o1"),
        F.sum(e1).alias("e1"),
        F.sum(v).alias("v"),
    )
    chi2 = (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")) / F.col("v")
    return agg.select(
        "o1",
        F.round("e1", 4).alias("e1"),
        F.round("v", 4).alias("var"),
        F.round(chi2, 4).alias("log_rank_chi2"),
        (chi2 > 3.841).alias("curves_differ"),
    )


EXT_LOG_RANK_SQL = r"""
WITH per AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS g,
         CASE WHEN MIN(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END)
                   IS NOT NULL
              THEN date_diff('day', MIN(CAST(ts AS DATE)),
                             MIN(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END))
              ELSE date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
         END AS tl,
         CASE WHEN MIN(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END)
                   IS NOT NULL THEN 1 ELSE 0 END AS churned
  FROM events
  GROUP BY user_id
),
cells AS (
  SELECT g, tl, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(churned) AS BIGINT) AS d
  FROM per GROUP BY 1, 2
),
risk AS (
  SELECT g, tl, c, d,
         SUM(c) OVER (PARTITION BY g ORDER BY tl DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
  FROM cells
),
times AS (
  SELECT tl, CAST(SUM(d) AS BIGINT) AS d_tot,
         CAST(SUM(CASE WHEN g = 1 THEN d END) AS BIGINT) AS d1
  FROM risk GROUP BY 1
),
filled AS (
  SELECT t.tl, t.d_tot, t.d1,
         COALESCE(MAX(r1.n_at_risk) OVER (ORDER BY t.tl DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n1,
         COALESCE(MAX(r0.n_at_risk) OVER (ORDER BY t.tl DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n0
  FROM times t
  LEFT JOIN (SELECT tl, n_at_risk FROM risk WHERE g = 1) r1 ON r1.tl = t.tl
  LEFT JOIN (SELECT tl, n_at_risk FROM risk WHERE g = 0) r0 ON r0.tl = t.tl
),
agg AS (
  SELECT CAST(SUM(COALESCE(d1, 0)) AS BIGINT) AS o1,
         SUM(d_tot * CAST(n1 AS DOUBLE) / (n1 + n0)) AS e1,
         SUM(CASE WHEN n1 + n0 > 1
                  THEN d_tot * (CAST(n1 AS DOUBLE) / (n1 + n0))
                       * (1.0 - CAST(n1 AS DOUBLE) / (n1 + n0))
                       * (n1 + n0 - d_tot) / (n1 + n0 - 1.0)
                  ELSE 0.0 END) AS v
  FROM filled WHERE d_tot > 0
)
SELECT o1, ROUND(e1, 4) AS e1, ROUND(v, 4) AS var,
       ROUND((o1 - e1) * (o1 - e1) / v, 4) AS log_rank_chi2,
       (o1 - e1) * (o1 - e1) / v > 3.841 AS curves_differ
FROM agg
"""


EXT_QUERIES.update({"ext_log_rank": ext_log_rank})
EXT_ORACLES.update({"ext_log_rank": EXT_LOG_RANK_SQL})
