"""Declared-query waves: round-5 wave: optimizer-statistics accuracy
(grid equi-depth histogram), hash-sampling error calibration, physical
clusteredness audit; round-5 wave: perceptual near-duplicate image pairs
(banded dHash + Hamming verify), audio derivative-sign fingerprinting.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: exact integer sums and counts through identical double
trees; md5-replayable sampling; the perceptual hashes are integer
end-to-end (the property that makes real decode paths closed-form
oracle-checkable).
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w15 import *  # noqa: F401,F403


# --- round-5 wave: equi-depth histogram accuracy ------------------------------


def ext_equi_depth_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics quality audit: build a 10-bucket equi-depth
    histogram of order totals on a $100 grid (bucket boundaries = exact
    nearest-rank deciles of the grid distribution), then score three
    range predicates by comparing the histogram's uniform-within-bucket
    row estimate against the true count — the selectivity-estimation
    error a cost-based optimizer would make with these stats. Boundaries
    and true counts are exact integers; only the partial-bucket
    interpolation is double.

    Scale shape: one grid hash agg (O(grid) rows), one window over the
    grid axis, conditional re-aggregates per predicate."""
    grid = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) DIV 10000 AS BIGINT)").alias(
                "gv"
            )
        )
        .agg(F.count(F.lit(1)).alias("c"))
        # r13 note: persisting this grid was measured ~2x SLOWER (first
        # 6.8 -> 14.0s, second 2.6 -> 3.9s, 2-round alternating A/B) —
        # the five consumer branches share the IDENTICAL grid exchange,
        # which AQE stage reuse already dedupes; the persist only added
        # fill jobs (22 -> 48). Left unpersisted on purpose.
    )
    w = Window.orderBy("gv")
    tot = grid.agg(F.sum("c").alias("n"))
    cum = grid.join(F.broadcast(tot)).select(
        "gv", "c", "n", F.sum("c").over(w).alias("cc")
    )
    # decile boundaries: smallest grid value with cum >= i*n/10
    bounds = (
        cum.select(
            "gv",
            F.explode(
                F.expr(
                    "filter(sequence(1, 10),"
                    " i -> 10*cc >= i*n AND 10*(cc - c) < i*n)"
                )
            ).alias("dec"),
        )
        .groupBy("dec")
        .agg(F.min("gv").alias("b"))
    )
    # per-bucket (lo, hi] ranges with exact counts: bucket i covers (b_{i-1}, b_i]
    wb = Window.orderBy("dec")
    buckets = bounds.select(
        "dec",
        F.lag("b", 1, -1).over(wb).alias("lo"),
        F.col("b").alias("hi"),
    )
    bc = (
        cum.join(
            F.broadcast(buckets),
            F.expr("gv > lo AND gv <= hi"),
        )
        .groupBy("dec", "lo", "hi")
        .agg(F.sum("c").alias("bn"))
    )
    preds = [
        ("p1_under_50k", -1, 499),
        ("p2_50k_150k", 499, 1499),
        ("p3_over_200k", 1999, 10_000_000),
    ]
    outs = []
    for label, plo, phi in preds:
        est = bc.agg(
            F.lit(label).alias("predicate"),
            F.expr(
                "ROUND(SUM(CASE"
                f" WHEN lo >= {plo} AND hi <= {phi} THEN CAST(bn AS DOUBLE)"
                f" WHEN hi <= {plo} OR lo >= {phi} THEN 0e0"
                f" ELSE CAST(bn AS DOUBLE)*(LEAST(hi, {phi}) - GREATEST(lo, {plo}))/(hi - lo)"
                " END), 2)"
            ).alias("est_rows"),
        )
        true = grid.agg(
            F.sum(
                F.expr(f"CASE WHEN gv > {plo} AND gv <= {phi} THEN c ELSE 0 END")
            ).alias("true_rows")
        )
        outs.append(est.join(true))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "predicate",
        "true_rows",
        "est_rows",
        F.expr(
            "ROUND(CASE WHEN true_rows > 0 THEN (est_rows - true_rows)/true_rows END, 6)"
        ).alias("rel_error"),
    ).orderBy("predicate")


def _eda_pred_sql(label: str, plo: int, phi: int) -> str:
    return f"""
SELECT '{label}' AS predicate, t.true_rows, e.est_rows,
       ROUND(CASE WHEN t.true_rows > 0 THEN (e.est_rows - t.true_rows)/t.true_rows END, 6) AS rel_error
FROM (
  SELECT ROUND(SUM(CASE
           WHEN lo >= {plo} AND hi <= {phi} THEN CAST(bn AS DOUBLE)
           WHEN hi <= {plo} OR lo >= {phi} THEN 0e0
           ELSE CAST(bn AS DOUBLE)*(LEAST(hi, {phi}) - GREATEST(lo, {plo}))/(hi - lo)
         END), 2) AS est_rows
  FROM bc
) e
CROSS JOIN (
  SELECT CAST(SUM(CASE WHEN gv > {plo} AND gv <= {phi} THEN c ELSE 0 END) AS BIGINT) AS true_rows
  FROM grid
) t
"""


EXT_EQUI_DEPTH_ACCURACY_SQL = (
    r"""
WITH grid AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // 10000 AS gv, COUNT(*) AS c
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid),
cum AS (
  SELECT gv, c, n, CAST(SUM(c) OVER (ORDER BY gv) AS BIGINT) AS cc
  FROM grid CROSS JOIN tot
),
bounds AS (
  SELECT dec, MIN(gv) AS b FROM (
    SELECT gv, UNNEST(list_filter(generate_series(1, 10),
           i -> 10*cc >= i*n AND 10*(cc - c) < i*n)) AS dec
    FROM cum
  ) GROUP BY dec
),
buckets AS (
  SELECT dec, LAG(b, 1, -1) OVER (ORDER BY dec) AS lo, b AS hi FROM bounds
),
bc AS (
  SELECT k.dec, k.lo, k.hi, CAST(SUM(g.c) AS BIGINT) AS bn
  FROM cum g JOIN buckets k ON g.gv > k.lo AND g.gv <= k.hi
  GROUP BY 1, 2, 3
)
"""
    + _eda_pred_sql("p1_under_50k", -1, 499)
    + "UNION ALL"
    + _eda_pred_sql("p2_50k_150k", 499, 1499)
    + "UNION ALL"
    + _eda_pred_sql("p3_over_200k", 1999, 10000000)
    + "ORDER BY predicate"
)


EXT_QUERIES.update({"ext_equi_depth_accuracy": ext_equi_depth_accuracy})
EXT_ORACLES.update({"ext_equi_depth_accuracy": EXT_EQUI_DEPTH_ACCURACY_SQL})


# --- round-5 wave: hash-sampling error calibration ----------------------------


def ext_sampling_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing calibration: md5-hash samples of
    orders at 1/5/10/25% rates (subset-stable — every smaller sample is
    contained in every larger one), each scaled up to estimate total
    revenue and row count, with relative errors against the exact
    totals — the error-vs-cost curve that justifies (or vetoes) sampled
    dashboards on the full corpus. Sample membership is integer md5
    arithmetic; estimates are one division each.

    Scale shape: ONE pass computes all four samples via conditional
    aggregation (no per-rate rescan)."""
    o = _t(spark, sf_dir, "orders").select(
        F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10000"
        ).alias("bucket"),
    )
    rates = [(100, "r01_pct"), (500, "r05_pct"), (1000, "r10_pct"), (2500, "r25_pct")]
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        *[
            F.sum(F.expr(f"CASE WHEN bucket < {th} THEN 1 ELSE 0 END")).alias(
                f"n_{th}"
            )
            for th, _ in rates
        ],
        *[
            F.sum(F.expr(f"CASE WHEN bucket < {th} THEN cents ELSE 0 END")).alias(
                f"s_{th}"
            )
            for th, _ in rates
        ],
    )
    outs = []
    for th, label in rates:
        outs.append(
            agg.select(
                F.lit(label).alias("rate"),
                F.col(f"n_{th}").alias("sample_rows"),
                F.expr(f"ROUND(CAST(n_{th} AS DOUBLE)*10000/{th}, 2)").alias(
                    "est_rows"
                ),
                F.expr(
                    f"ROUND((CAST(n_{th} AS DOUBLE)*10000/{th} - n)/n, 6)"
                ).alias("rows_rel_error"),
                F.expr(
                    f"ROUND(CAST(s_{th} AS DOUBLE)*10000/{th}/1e2, 2)"
                ).alias("est_revenue"),
                F.expr(
                    f"ROUND((CAST(s_{th} AS DOUBLE)*10000/{th} - s)/s, 6)"
                ).alias("revenue_rel_error"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out.orderBy("rate")


def _sec_rate_sql(th: int, label: str) -> str:
    return f"""
SELECT '{label}' AS rate, n_{th} AS sample_rows,
       ROUND(CAST(n_{th} AS DOUBLE)*10000/{th}, 2) AS est_rows,
       ROUND((CAST(n_{th} AS DOUBLE)*10000/{th} - n)/n, 6) AS rows_rel_error,
       ROUND(CAST(s_{th} AS DOUBLE)*10000/{th}/1e2, 2) AS est_revenue,
       ROUND((CAST(s_{th} AS DOUBLE)*10000/{th} - s)/s, 6) AS revenue_rel_error
FROM agg
"""


EXT_SAMPLING_ERROR_CURVE_SQL = (
    r"""
WITH o AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
         CAST(('0x' || SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS BIGINT) AS bucket
  FROM orders
),
agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s,
"""
    + ",\n".join(
        f"         CAST(SUM(CASE WHEN bucket < {th} THEN 1 ELSE 0 END) AS BIGINT) AS n_{th},\n"
        f"         CAST(SUM(CASE WHEN bucket < {th} THEN cents ELSE 0 END) AS BIGINT) AS s_{th}"
        for th in (100, 500, 1000, 2500)
    )
    + r"""
  FROM o
)
"""
    + "UNION ALL".join(
        _sec_rate_sql(th, label)
        for th, label in [
            (100, "r01_pct"),
            (500, "r05_pct"),
            (1000, "r10_pct"),
            (2500, "r25_pct"),
        ]
    )
    + "ORDER BY rate"
)


EXT_QUERIES.update({"ext_sampling_error_curve": ext_sampling_error_curve})
EXT_ORACLES.update({"ext_sampling_error_curve": EXT_SAMPLING_ERROR_CURVE_SQL})


# --- round-5 wave: physical clusteredness audit -------------------------------


def ext_clusteredness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well does the table's physical order (order key) serve a date
    column? Two exact measures: the fraction of within-zone adjacent row
    pairs whose dates ascend (run coherence, via per-zone LAG), and the
    fraction of adjacent 256-key zones whose [min,max] date ranges do
    not overlap (zone disjointness, via LEAD on the zone axis) — the
    quantitative form of the zone-map audit (ext_zone_map_audit): high
    disjointness predicts effective data skipping, low suggests a
    re-sort/z-order pays off.

    Scale shape: per-zone LAG windows partition on the high-cardinality
    zone key; the zone-axis LEAD runs on O(zones)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(o_orderkey DIV 256 AS BIGINT)").alias("zone"),
        "o_orderdate",
    )
    wz = Window.partitionBy("zone").orderBy("o_orderkey")
    runs = o.select(
        "zone",
        F.expr("CAST(o_orderdate >= LAG(o_orderdate) OVER"
               " (PARTITION BY zone ORDER BY o_orderkey) AS LONG)").alias("asc_pair"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("asc_pair").alias("n_asc"),
        F.count("asc_pair").alias("n_pairs"),
    )
    zones = o.groupBy("zone").agg(
        F.min("o_orderdate").alias("zmin"), F.max("o_orderdate").alias("zmax")
    )
    wzl = Window.orderBy("zone")
    zdis = zones.select(
        "zone",
        F.expr(
            "CAST(zmax < LEAD(zmin) OVER (ORDER BY zone) AS LONG)"
        ).alias("disjoint"),
    ).agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum("disjoint").alias("n_disjoint"),
        F.count("disjoint").alias("n_zpairs"),
    )
    return (
        runs.join(zdis)
        .select(
            "n_rows",
            "n_zones",
            F.expr("ROUND(CAST(n_asc AS DOUBLE)/n_pairs, 6)").alias(
                "asc_pair_fraction"
            ),
            F.expr("ROUND(CAST(n_disjoint AS DOUBLE)/n_zpairs, 6)").alias(
                "zone_disjoint_fraction"
            ),
        )
    )


EXT_CLUSTEREDNESS_AUDIT_SQL = r"""
WITH o AS (
  SELECT o_orderkey, o_orderkey // 256 AS zone, o_orderdate FROM orders
),
runs AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(asc_pair) AS BIGINT) AS n_asc,
         COUNT(asc_pair) AS n_pairs
  FROM (
    SELECT CAST(o_orderdate >= LAG(o_orderdate) OVER
                (PARTITION BY zone ORDER BY o_orderkey) AS BIGINT) AS asc_pair
    FROM o
  )
),
zones AS (
  SELECT zone, MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax
  FROM o GROUP BY zone
),
zdis AS (
  SELECT COUNT(*) AS n_zones,
         CAST(SUM(disjoint) AS BIGINT) AS n_disjoint,
         COUNT(disjoint) AS n_zpairs
  FROM (
    SELECT CAST(zmax < LEAD(zmin) OVER (ORDER BY zone) AS BIGINT) AS disjoint
    FROM zones
  )
)
SELECT n_rows, n_zones,
       ROUND(CAST(n_asc AS DOUBLE)/n_pairs, 6) AS asc_pair_fraction,
       ROUND(CAST(n_disjoint AS DOUBLE)/n_zpairs, 6) AS zone_disjoint_fraction
FROM runs CROSS JOIN zdis
"""


EXT_QUERIES.update({"ext_clusteredness_audit": ext_clusteredness_audit})
EXT_ORACLES.update({"ext_clusteredness_audit": EXT_CLUSTEREDNESS_AUDIT_SQL})


# --- round-5 wave: near-duplicate image pairs (banded dHash) ------------------


def _image_family_modulus(n_docs: int) -> int:
    """Corpus-adaptive family modulus for the planted image near-dup
    corpus: max(211, ceil(n_docs/24)) — the historical 211 at every
    committed fixture SF (<= 5064 docs), ~24 variants per family beyond,
    so the TRUE near-dup pair count grows linearly with the corpus
    instead of quadratically (r9 salted-30x crash). The oracle SQL
    derives the identical value: GREATEST(211, CEIL(COUNT(*)/24.0))."""
    import math

    return max(211, math.ceil(n_docs / 24))


def ext_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE pair search, end to end through the real
    decode path: gradient BMPs whose family (id%211) fixes the pattern
    and whose variant (id DIV 211) shifts every pixel by +3v mod 256 —
    a brightness-style perturbation that flips only the comparison bits
    where the gradient wraps, so same-family variants are planted
    near-dups (small Hamming) — hashed by multimodal.image_dhash,
    candidate-paired by 4x16-bit LSH bands (never all-pairs), verified
    with exact bit_count Hamming <= 8, reported as the Hamming
    histogram. The image analog of the X3/X4 banded text dedup.

    Scale shape: decode+hash partition-local; the only shuffle is the
    band bucket join on 8-byte signatures. The family modulus is
    CORPUS-ADAPTIVE (fm = max(211, ceil(n_docs/24)), the
    capped_panel_modulus calibration pattern): a FIXED modulus keeps a
    fixed family count, so same-family (planted true near-dup) variants
    — and with them the TRUE pair answer and the band join — grow
    QUADRATICALLY with the corpus (the salted-30x full-registry smoke
    crashed here, r9). fm equals the historical 211 at every committed
    fixture SF (5000 docs -> ceil(5000/24) = 209 <= 211), so declared
    outputs are unchanged there; beyond, variants per family are
    bounded at ~24 and the true answer grows linearly. The oracle
    derives the identical fm from COUNT(*)."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    fm = _image_family_modulus(corpus_count(spark, sf_dir, "documents"))

    def make_bmp(batches):
        import numpy as np

        from aircan_spark.ext import multimodal

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                fam, var = did % fm, did // fm
                w, h = 16 + fam % 9, 16 + fam % 7
                x = np.arange(w, dtype="int64")[None, :]
                y = np.arange(h, dtype="int64")[:, None]
                gray = ((x * 11 + y * 5 + fam + 3 * var) % 256).astype("u1")
                blobs.append(
                    multimodal.encode_bmp(np.repeat(gray[:, :, None], 3, axis=2))
                )
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    from aircan_spark.ext import multimodal

    media = docs.mapInPandas(make_bmp, "media_id bigint, content binary")
    hashed = multimodal.image_dhash(media).select(
        "media_id", "dhash_hi", "dhash_lo"
    )
    # Pair counting in DISTINCT-HASH-VALUE space (r9 salted-30x fix):
    # the synthetic corpus saturates to a few hundred distinct dhashes
    # (432 at 150k images, 405 at 5k — measured), so the TRUE pair
    # answer grows ~n^2/|values| and materializing instance pairs heap-
    # OOMed the 30x smoke (3.5e9 candidates from 76 band buckets). The
    # identical histogram follows from group-count algebra: collapse to
    # (hash, count) — ONE shuffle, O(distinct) rows — run the exact same
    # 4x16-bit band candidate structure over distinct VALUES (432x4
    # rows), and weight each surviving value pair by ca*cb (plus the
    # within-group C(c,2) at hamming 0, which the instance form counted
    # via identical hashes sharing all bands). Outputs are bit-identical
    # to the instance formulation at every SF; work is O(n) + O(|values|^2)
    # at any corpus size. The weight sum rides DECIMAL (group counts are
    # ~n/|values|, so ca*cb sums pass 2^63 around sf~3000 in int64).
    groups = hashed.groupBy("dhash_hi", "dhash_lo").agg(
        F.count(F.lit(1)).alias("c")
    )
    bands = groups.select(
        "dhash_hi",
        "dhash_lo",
        "c",
        F.explode(
            F.expr(
                "array(struct(0 AS bi, dhash_hi DIV 65536 AS bv),"
                " struct(1 AS bi, dhash_hi % 65536 AS bv),"
                " struct(2 AS bi, dhash_lo DIV 65536 AS bv),"
                " struct(3 AS bi, dhash_lo % 65536 AS bv))"
            )
        ).alias("b"),
    ).select(
        "dhash_hi", "dhash_lo", "c", F.expr("b.bi").alias("bi"), F.expr("b.bv").alias("bv")
    )
    a = bands.select(
        F.col("dhash_hi").alias("ha"),
        F.col("dhash_lo").alias("la"),
        F.col("c").alias("ca"),
        "bi",
        "bv",
    )
    b = bands.select(
        F.col("dhash_hi").alias("hb"),
        F.col("dhash_lo").alias("lb"),
        F.col("c").alias("cb"),
        "bi",
        "bv",
    )
    cross = (
        a.join(b, ["bi", "bv"])
        .filter(F.expr("ha < hb OR (ha = hb AND la < lb)"))
        .select("ha", "la", "ca", "hb", "lb", "cb")
        .distinct()
        .select(
            F.expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").alias("hamming"),
            F.expr("CAST(ca AS DECIMAL(19,0)) * cb").alias("w"),
        )
        .filter(F.col("hamming") <= 8)
    )
    within = groups.filter(F.col("c") > 1).select(
        F.lit(0).alias("hamming"),
        F.expr("CAST(c AS DECIMAL(19,0)) * (c - 1) / 2").alias("w"),
    )
    return (
        cross.unionByName(within)
        .groupBy("hamming")
        .agg(F.expr("CAST(SUM(w) AS BIGINT)").alias("n_pairs"))
        .orderBy("hamming")
    )


EXT_IMAGE_NEAR_DUP_SQL = r"""
WITH fmod AS (
  SELECT GREATEST(211, CAST(CEIL(COUNT(*) / 24.0) AS BIGINT)) AS fm
  FROM documents
),
fams AS (
  SELECT doc_id, doc_id % fm AS fam, doc_id // fm AS var,
         16 + (doc_id % fm) % 9 AS w, 16 + (doc_id % fm) % 7 AS h
  FROM documents CROSS JOIN fmod
),
grid AS (
  SELECT f.doc_id, f.fam, f.var, gy.y, gx.x,
         CAST(FLOOR((gx.x + 0.5) * f.w / 9.0) AS BIGINT) AS sx,
         CAST(FLOOR((gy.y + 0.5) * f.h / 8.0) AS BIGINT) AS sy
  FROM fams f, generate_series(0, 8) gx(x), generate_series(0, 7) gy(y)
),
px AS (
  SELECT doc_id, y, x, (sx * 11 + sy * 5 + fam + 3 * var) % 256 AS g FROM grid
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
              AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN y >= 4
                  THEN bit * (1::BIGINT << (31 - ((y - 4) * 8 + x))) ELSE 0 END)
              AS BIGINT) AS lo
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, hi, lo, b.bi,
         CASE b.bi WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
                   WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS bv
  FROM halves CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS bi) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
         a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
),
ham AS (
  SELECT bit_count(CAST(xor(ha, hb) AS BIGINT)) + bit_count(CAST(xor(la, lb) AS BIGINT)) AS hamming
  FROM pairs
)
SELECT hamming, COUNT(*) AS n_pairs FROM ham
WHERE hamming <= 8 GROUP BY hamming ORDER BY hamming
"""


EXT_QUERIES.update({"ext_image_near_dup": ext_image_near_dup})
EXT_ORACLES.update({"ext_image_near_dup": EXT_IMAGE_NEAR_DUP_SQL})


# --- round-5 wave: audio derivative-sign fingerprint --------------------------


def ext_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprinting through the REAL WAV codec: per document a
    PCM-16 fixture whose samples follow the family pattern ((i*7 +
    fam*13) % 256 - 128) * 64 (fam = id % 97, so every family is a
    planted duplicate recording), decoded by multimodal.decode_wav and
    fingerprinted by the sign of each successive-sample derivative — 31
    bits packed into one BIGINT (the Shazam-style landmark idea reduced
    to its deterministic core). Duplicate groups are a groupBy on the
    fingerprint; the oracle replays the integer pattern closed-form
    (normalization by 32768 is monotone, so float signs equal integer
    signs).

    Scale shape: encode+decode+fingerprint partition-local mapInPandas;
    one hash agg for grouping."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def kernel(batches):
        import numpy as np

        from aircan_spark.ext import multimodal

        for pdf in batches:
            ids, fps = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                fam = did % 97
                i = np.arange(32, dtype="int64")
                samples = ((i * 7 + fam * 13) % 256 - 128) * 64
                blob = multimodal.encode_wav(samples, rate=8000, codec="pcm16")
                got = multimodal.decode_wav(blob)
                if got is None:
                    continue
                x = got[0]
                bits = (x[1:] > x[:-1]).astype("int64")
                fp = int((bits * (1 << (30 - np.arange(31)))).sum())
                ids.append(did)
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "fingerprint": fps})

    fp = docs.mapInPandas(kernel, "media_id bigint, fingerprint bigint")
    w = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("n_same", F.count(F.lit(1)).over(w))
        .orderBy("media_id")
    )


EXT_AUDIO_FINGERPRINT_SQL = r"""
WITH s AS (
  SELECT d.doc_id, g.i,
         (g.i * 7 + (d.doc_id % 97) * 13) % 256 - 128 AS v
  FROM documents d, generate_series(0, 31) g(i)
),
bits AS (
  SELECT a.doc_id, a.i, CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.i < 31
),
fp AS (
  SELECT doc_id,
         CAST(SUM(bit * (1::BIGINT << (30 - i))) AS BIGINT) AS fingerprint
  FROM bits GROUP BY doc_id
)
SELECT doc_id AS media_id, fingerprint,
       COUNT(*) OVER (PARTITION BY fingerprint) AS n_same
FROM fp ORDER BY media_id
"""


EXT_QUERIES.update({"ext_audio_fingerprint": ext_audio_fingerprint})
EXT_ORACLES.update({"ext_audio_fingerprint": EXT_AUDIO_FINGERPRINT_SQL})
