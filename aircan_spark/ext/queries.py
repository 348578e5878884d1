"""Declared correctness queries for the ext/ operators (dedup, similarity,
text analysis, multimodal plumbing) over the documents/embeddings tables.

SQL-expressible operators carry a DuckDB oracle; the LSH-based ones
(minhash, simhash, hyperplane buckets) are algorithm-specific and get the
weaker rows-only check plus recall tests in tests/test_ext.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aircan_spark.data import fan_out
from aircan_spark.data import load_table as _load
from aircan_spark.ext import dedup, multimodal, similarity, text


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
    rows-only check; overlap semantics covered in tests/test_ext.py)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.rolling_fingerprints(docs)
        .select("doc_id", F.size("fingerprints").alias("n_prints"), "fingerprints")
        .orderBy("doc_id")
    )


def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.fingerprint(docs).select("doc_id", "fp_md5").orderBy("doc_id")


EXT_FINGERPRINT_SQL = r"""
SELECT doc_id, md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp_md5
FROM documents ORDER BY doc_id
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
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_pairs(emb, threshold=0.4, lsh_bits=0)


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


EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ext_text_stats": ext_text_stats,
    "ext_quality_score": ext_quality_score,
    "ext_lang_id": ext_lang_id,
    "ext_fingerprint": ext_fingerprint,
    "ext_stopword_ratio": ext_stopword_ratio,
    "ext_rolling_fingerprint": ext_rolling_fingerprint,
    "ext_dedup_exact": ext_dedup_exact,
    "ext_dedup_ngram_jaccard": ext_dedup_ngram_jaccard,
    "ext_dedup_minhash": ext_dedup_minhash,
    "ext_dedup_simhash": ext_dedup_simhash,
    "ext_dedup_embedding": ext_dedup_embedding,
    "ext_sim_topk_brute": ext_sim_topk_brute,
    "ext_sim_topk_lsh": ext_sim_topk_lsh,
    "ext_sim_topk_ivf": ext_sim_topk_ivf,
    "ext_stream_window_counts": ext_stream_window_counts,
    "ext_stream_sessions": ext_stream_sessions,
    "ext_mm_byte_features": ext_mm_byte_features,
}

# minhash/simhash/LSH ANN are non-SQL-expressible (algorithm-specific
# candidate generation) -> rows-only check; everything else has an oracle.
EXT_ORACLES: dict[str, str] = {
    "ext_stream_window_counts": EXT_STREAM_WINDOW_SQL,
    "ext_stream_sessions": EXT_STREAM_SESSIONS_SQL,
    "ext_text_stats": EXT_TEXT_STATS_SQL,
    "ext_quality_score": EXT_QUALITY_SQL,
    "ext_lang_id": EXT_LANG_ID_SQL,
    "ext_fingerprint": EXT_FINGERPRINT_SQL,
    "ext_stopword_ratio": EXT_STOPWORD_SQL,
    "ext_dedup_exact": EXT_DEDUP_EXACT_SQL,
    "ext_dedup_ngram_jaccard": EXT_DEDUP_JACCARD_SQL,
    "ext_dedup_embedding": EXT_DEDUP_EMBEDDING_SQL,
    "ext_sim_topk_brute": EXT_SIM_TOPK_SQL,
    "ext_mm_byte_features": EXT_MM_BYTES_SQL,
}
