"""Declared-query waves: round-5 wave: full-feature PNG resize (Adam7 +
16-bit); round-5 wave: perceptual image hash, audio silence, video scene
cuts; round-5 wave: compaction planner, duplicate-column audit, PVM
decomposition; round-5 wave: Welch t-test, Kruskal-Wallis, average
precision, per-class classifier metrics, Adamic-Adar link prediction.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w08 import *  # noqa: F401,F403


# --- round-5 wave: full-feature PNG resize (Adam7 + 16-bit) -------------------


def ext_mm_resize_png_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG resize pipeline over the FULL feature grid the r5 decoder
    supports: per document a deterministic gradient (W=16+id%17,
    H=16+id%13, gray (x*7+y*3+id)%256) is encoded with layout id%4 —
    plain, Adam7-interlaced, 16-bit, or Adam7+16-bit — with per-scanline
    filters cycling through all five spec filters from id%5, then pushed
    through decode→NN-resize(8×8)→BMP→decode→mean. 16-bit uses the
    v*257 expansion whose high byte round-trips exactly, and Adam7
    re-orders scanlines without changing pixel values, so ONE closed-form
    oracle covers all four layouts — a wrong pass geometry, filter
    distance or byte order anywhere shifts the mean and the hash.
    All kernels partition-local mapInPandas (zero shuffle); extends
    ext_mm_resize_png (queries_w08) which pinned the 8-bit sequential
    path."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def make_png(batches):
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 17, 16 + did % 13
                x = np.arange(w, dtype="int64")[None, :]
                y = np.arange(h, dtype="int64")[:, None]
                gray = ((x * 7 + y * 3 + did) % 256).astype("u1")
                rgb = np.repeat(gray[:, :, None], 3, axis=2)
                filters = [(did + r) % 5 for r in range(5)]
                mode = did % 4
                blobs.append(
                    multimodal.encode_png(
                        rgb,
                        filters=filters,
                        interlace=mode in (1, 3),
                        depth=16 if mode in (2, 3) else 8,
                    )
                )
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(make_png, "media_id bigint, content binary")
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


EXT_MM_RESIZE_PNG_FULL_SQL = r"""
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
       ROUND(AVG((sx * 7 + sy * 3 + doc_id) % 256), 6) AS pixel_mean
FROM sampled GROUP BY doc_id ORDER BY media_id
"""


EXT_QUERIES.update({"ext_mm_resize_png_full": ext_mm_resize_png_full})
EXT_ORACLES.update({"ext_mm_resize_png_full": EXT_MM_RESIZE_PNG_FULL_SQL})


# --- round-5 wave: perceptual image hash (dHash) ------------------------------


def ext_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash + exact-duplicate grouping, end-to-end: per
    document a gradient BMP whose content depends only on family =
    id%211 (W=16+fam%9, H=16+fam%7, gray (x*11+y*5+fam)%256) — so every
    family forms a planted exact-duplicate cluster — hashed by
    multimodal.image_dhash (decode → 9×8 NN resample → right-neighbor
    comparisons → two 32-bit halves) and grouped by hash value. The
    whole chain is integer arithmetic, replayed closed-form by the
    oracle; n_same_hash counts hash-identical images (families, plus
    any cross-family gradient collisions — both engines see the same
    ones). The 8-byte signature is the image analog of X12's document
    fingerprint; near-dup search composes via Hamming bands (X3/X4
    machinery)."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def make_bmp(batches):
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                fam = did % 211
                w, h = 16 + fam % 9, 16 + fam % 7
                x = np.arange(w, dtype="int64")[None, :]
                y = np.arange(h, dtype="int64")[:, None]
                gray = ((x * 11 + y * 5 + fam) % 256).astype("u1")
                blobs.append(
                    multimodal.encode_bmp(np.repeat(gray[:, :, None], 3, axis=2))
                )
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(make_bmp, "media_id bigint, content binary")
    hashed = multimodal.image_dhash(media)
    wcnt = Window.partitionBy("dhash_hi", "dhash_lo")
    return (
        hashed.withColumn("n_same_hash", F.count(F.lit(1)).over(wcnt))
        .orderBy("media_id")
    )


EXT_IMAGE_DHASH_SQL = r"""
WITH fams AS (
  SELECT doc_id, doc_id % 211 AS fam,
         16 + (doc_id % 211) % 9 AS w, 16 + (doc_id % 211) % 7 AS h
  FROM documents
),
grid AS (
  SELECT f.doc_id, f.fam, gy.y, gx.x,
         CAST(FLOOR((gx.x + 0.5) * f.w / 9.0) AS BIGINT) AS sx,
         CAST(FLOOR((gy.y + 0.5) * f.h / 8.0) AS BIGINT) AS sy
  FROM fams f, generate_series(0, 8) gx(x), generate_series(0, 7) gy(y)
),
px AS (
  SELECT doc_id, y, x, (sx * 11 + sy * 5 + fam) % 256 AS g FROM grid
),
bits AS (
  SELECT a.doc_id, a.y, a.x,
         CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
  WHERE a.x < 8
),
halves AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN y < 4
                  THEN bit * (1::BIGINT << (31 - (y * 8 + x))) ELSE 0 END)
              AS BIGINT) AS dhash_hi,
         CAST(SUM(CASE WHEN y >= 4
                  THEN bit * (1::BIGINT << (31 - ((y - 4) * 8 + x))) ELSE 0 END)
              AS BIGINT) AS dhash_lo
  FROM bits GROUP BY doc_id
)
SELECT doc_id AS media_id, dhash_hi, dhash_lo,
       COUNT(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS n_same_hash
FROM halves ORDER BY media_id
"""


EXT_QUERIES.update({"ext_image_dhash": ext_image_dhash})
EXT_ORACLES.update({"ext_image_dhash": EXT_IMAGE_DHASH_SQL})


# --- round-5 wave: audio silence profile, video scene cuts --------------------


def ext_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file audio silence profile via multimodal.audio_silence_stats
    (REAL RIFF/WAV decode, amplitude <= 0.1 counting): per document a
    PCM-8 WAV of n = 400+(id%7)*50 samples alternating closed-form
    silent wiggles (|x| = 4/128, inside the gate) and loud spans
    (|x| >= 20/128, outside) — the dead-air curation gate. Decoded
    8-bit samples are exact dyadic rationals (v-128)/128 and the 0.1
    threshold has no representable boundary case, so silent counts are
    pure integer arithmetic the oracle replays from the sample-index
    formula."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def make_wav(batches):
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 400 + (did % 7) * 50
                i = np.arange(n, dtype="int64")
                silent = (i + did) % 5 < 2
                v = np.where(
                    silent,
                    128 + ((i + did) % 3 - 1) * 4,
                    148 + (i * 13 + did) % 80,
                )
                # encode_wav pcm8 stores (s >> 8) + 128 — feed it the
                # int16-range value whose high byte is exactly v-128
                blobs.append(
                    multimodal.encode_wav((v - 128) << 8, 8000, "pcm8")
                )
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(make_wav, "media_id bigint, content binary")
    return multimodal.audio_silence_stats(media, threshold=0.1).orderBy("media_id")


EXT_AUDIO_SILENCE_SQL = r"""
WITH samples AS (
  SELECT d.doc_id,
         400 + (d.doc_id % 7) * 50 AS n,
         g.i,
         CASE WHEN (g.i + d.doc_id) % 5 < 2 THEN 1 ELSE 0 END AS silent
  FROM documents d, generate_series(0, 749) g(i)
  WHERE g.i < 400 + (d.doc_id % 7) * 50
)
SELECT doc_id AS media_id,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(SUM(silent) AS BIGINT) AS n_silent,
       ROUND(SUM(silent) * 1.0 / MAX(n), 6) AS silence_ratio
FROM samples GROUP BY doc_id ORDER BY media_id
"""


EXT_QUERIES.update({"ext_audio_silence": ext_audio_silence})
EXT_ORACLES.update({"ext_audio_silence": EXT_AUDIO_SILENCE_SQL})


def ext_video_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection via multimodal.video_scene_changes (REAL
    MJPEG-AVI container walk + baseline-JPEG frame decode): per document
    a video of 6+(id%5) DC-only constant frames in 3-frame scenes whose
    gray level steps by delta = 10+(id%3)*25 per scene (mod 256) — so
    some boundaries fall under the luma threshold 20 and some wrap past
    it, exercising both branches. DC-only frames decode BIT-EXACT (the
    pinned all-ones-quant-table contract), frame means are exact
    integers, and the oracle replays the cut decisions from the scene
    formula with LAG over a generated scene axis."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def make_avi(batches):
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 6 + did % 5
                delta = 10 + (did % 3) * 25
                frames = []
                for f in range(n):
                    c = (did * 29 + (f // 3) * delta) % 256
                    frames.append(
                        multimodal.encode_jpeg(np.full((16, 16), c, np.uint8))
                    )
                blobs.append(multimodal.encode_avi_mjpeg(frames))
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(make_avi, "media_id bigint, content binary")
    return multimodal.video_scene_changes(media, threshold=20.0).orderBy("media_id")


EXT_VIDEO_SCENE_CHANGE_SQL = r"""
WITH scenes AS (
  SELECT d.doc_id,
         6 + d.doc_id % 5 AS n_frames,
         s.s,
         (d.doc_id * 29 + s.s * (10 + (d.doc_id % 3) * 25)) % 256 AS c
  FROM documents d, generate_series(0, 3) s(s)
  WHERE s.s <= (6 + d.doc_id % 5 - 1) / 3
),
diffs AS (
  SELECT doc_id, n_frames, s, c,
         ABS(c - LAG(c) OVER (PARTITION BY doc_id ORDER BY s)) AS dc
  FROM scenes
)
SELECT doc_id AS media_id,
       CAST(MAX(n_frames) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN dc >= 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_scene_changes,
       CAST(MIN(CASE WHEN dc >= 20 THEN s * 3 END) AS BIGINT)
         AS first_change_idx
FROM diffs GROUP BY doc_id ORDER BY media_id
"""


EXT_QUERIES.update({"ext_video_scene_change": ext_video_scene_change})
EXT_ORACLES.update({"ext_video_scene_change": EXT_VIDEO_SCENE_CHANGE_SQL})


# --- round-5 wave: compaction planner -----------------------------------------


def ext_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan over the orders "manifest" (one
    file per order date, size = row count × 100 bytes proxy) via
    relational.plan_compaction: exclusive-cumsum streaming split into
    ~100 KB bins, preserving date clustering. The maintenance op every
    long-lived table needs — thousands of tiny incremental files
    re-planned into scan-efficient ones; the window runs on the O(days)
    manifest axis, never on data rows, and the plan would broadcast-join
    against the rewrite at scale."""
    orders = _t(spark, sf_dir, "orders")
    manifest = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg((F.count(F.lit(1)) * 100).alias("size_bytes"))
    planned = relational.plan_compaction(manifest, "size_bytes", "d", 100_000)
    return (
        planned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
            F.min("d").alias("d_min"),
            F.max("d").alias("d_max"),
        )
        .orderBy("bin_id")
    )


EXT_COMPACTION_PLAN_SQL = r"""
WITH manifest AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) * 100 AS BIGINT) AS size_bytes
  FROM orders GROUP BY 1
),
planned AS (
  SELECT d, size_bytes,
         CAST(FLOOR(COALESCE(SUM(size_bytes) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 100000.0) AS BIGINT) AS bin_id
  FROM manifest
)
SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
       MIN(d) AS d_min, MAX(d) AS d_max
FROM planned GROUP BY bin_id ORDER BY bin_id
"""


EXT_QUERIES.update({"ext_compaction_plan": ext_compaction_plan})
EXT_ORACLES.update({"ext_compaction_plan": EXT_COMPACTION_PLAN_SQL})
