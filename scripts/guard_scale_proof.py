#!/usr/bin/env python
"""Adversarial-scale guard proof (VERDICT r03 #5): build a skewed
synthetic corpus — one hot shingle / one hot event type in 30% of rows,
at ~10x the sf0.1 row counts — and MEASURE candidate-pair counts and
wall-clock for the guarded vs unguarded plans of:

  - dedup.ngram_jaccard_pairs / containment (inverted-index self-join,
    max_doc_freq hot-shingle guard)
  - ext_user_neighbors (type-keyed CF pair join, capped anchor lists)

The point: the unguarded candidate count is dominated by the hot key's
df^2 term (quadratic in corpus size when the hot key's share is
constant), while the guarded plans are bounded per key — this script
prints the measured table that PERFORMANCE.md cites.

Everything is deterministic (hash-derived corpora, no RNG), generated
in-session (nothing written outside /tmp)."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from aircan_spark.ext import dedup
from aircan_spark.session import get_spark

N_DOCS = 50_000       # 10x sf0.1's 5k documents
N_USERS = 15_000      # 10x sf0.1's 1.5k users
HOT_SHARE = 0.30      # the adversarial hot key's row share
DOC_WORDS = 40
ANCHOR_CAP = 128      # same cap the declared ext_user_neighbors uses
MAX_DOC_FREQ = 10     # same guard the declared ext_containment_pairs uses


def build_docs(spark):
    """50k docs of 40 hash-derived words, three frequency bands:
    - a 6-word prefix shared by each cluster of 5 docs (shingle df = 5 —
      the legitimate near-dup signal the guard must KEEP),
    - 34 doc-unique words (df = 1),
    - the fixed 5-word hot tail (3 shingles with df = 15,000 — the
      boilerplate the guard must DROP) appended to 30%."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    word = lambda key, i: F.concat(
        F.lit("w"), F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"-{i}"))), 1, 8), 16, 10)
    )
    cluster = F.col("doc_id") / 5
    shared = [word(F.floor(cluster), i) for i in range(6)]
    unique = [word(F.col("doc_id"), 100 + i) for i in range(DOC_WORDS - 6)]
    text = F.concat_ws(" ", *(shared + unique))
    hot = (F.col("doc_id") % 10) < int(HOT_SHARE * 10)
    return base.select(
        "doc_id",
        F.when(hot, F.concat(text, F.lit(" hot boiler plate footer tail"))).otherwise(text).alias("text"),
    )


def build_ui(spark):
    """Distinct (user, event_type): one hot type covering 30% of users,
    24 cold types each covering ~20% (hash-chosen)."""
    users = spark.range(N_USERS).select(F.col("id").alias("user_id"))
    hot = users.filter(F.col("user_id") < int(HOT_SHARE * N_USERS)).select(
        "user_id", F.lit("hot_type").alias("event_type")
    )
    colds = []
    for t in range(24):
        member = (
            F.conv(F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit(f"-t{t}"))), 1, 4), 16, 10)
            .cast("long") % 5 == 0
        )
        colds.append(
            users.filter(member).select("user_id", F.lit(f"cold_{t:02d}").alias("event_type"))
        )
    ui = hot
    for c in colds:
        ui = ui.unionByName(c)
    return ui


def timed_count(df, label):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"  {label}: {n:,} rows in {dt:.1f}s")
    return n, dt


def main():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== shingle guard: {N_DOCS:,} docs, hot shingle in {HOT_SHARE:.0%} ==")
    docs = build_docs(spark)
    sh = dedup.shingles(docs, "doc_id", "text", 3).cache()
    sh.count()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).cache()
    stats = dfreq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("unguarded"),
        F.sum(F.when(F.col("df") <= MAX_DOC_FREQ, F.col("df") * (F.col("df") - 1) / 2).otherwise(F.lit(0))).alias("guarded"),
        F.max("df").alias("max_df"),
    ).collect()[0]
    print(f"  analytic candidates: unguarded {int(stats['unguarded']):,} "
          f"guarded(df<={MAX_DOC_FREQ}) {int(stats['guarded']):,} "
          f"(max df {stats['max_df']:,}; reduction {stats['unguarded']/max(stats['guarded'],1):,.0f}x)")
    # measured: run both candidate joins (count only — no scoring)
    a = sh.withColumnRenamed("doc_id", "id_a")
    b = sh.withColumnRenamed("doc_id", "id_b")
    rare = dfreq.filter(F.col("df") <= MAX_DOC_FREQ).select("shingle")
    ga = sh.join(rare, "shingle").withColumnRenamed("doc_id", "id_a")
    gb = sh.join(rare, "shingle").withColumnRenamed("doc_id", "id_b")
    g_n, g_t = timed_count(
        ga.join(gb, "shingle").filter(F.col("id_a") < F.col("id_b")), "guarded join (measured)"
    )
    u_n, u_t = timed_count(
        a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b")), "unguarded join (measured)"
    )
    jt0 = time.time()
    dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_doc_freq=MAX_DOC_FREQ).count()
    j_t = time.time() - jt0
    print(f"  guarded full jaccard (scored): {j_t:.1f}s")

    print(f"\n== CF anchor guard: {N_USERS:,} users, hot type = {HOT_SHARE:.0%} of users ==")
    from pyspark.sql.window import Window

    ui = build_ui(spark).cache()
    ui.count()
    ud = ui.groupBy("event_type").agg(F.count(F.lit(1)).alias("ud"))
    cf = ud.agg(
        F.sum(F.col("ud") * (F.col("ud") - 1) / 2).alias("unguarded"),
        F.sum(F.col("ud") * F.least(F.col("ud") - 1, F.lit(ANCHOR_CAP))).alias("guarded_bound"),
        F.max("ud").alias("max_ud"),
    ).collect()[0]
    print(f"  analytic: unguarded pairs {int(cf['unguarded']):,} "
          f"guarded bound {int(cf['guarded_bound']):,} (max type df {cf['max_ud']:,})")
    au = ui.select(F.col("user_id").alias("ua"), "event_type")
    bu = ui.select(F.col("user_id").alias("ub"), "event_type")
    u_cf_n, u_cf_t = timed_count(
        au.join(bu, "event_type").filter(F.col("ua") < F.col("ub")), "unguarded join (measured)"
    )
    w_anchor = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("user_id").cast("string")), F.col("user_id")
    )
    anchors = (
        ui.withColumn("rn", F.row_number().over(w_anchor))
        .filter(F.col("rn") <= ANCHOR_CAP)
        .select("event_type", F.col("user_id").alias("ub"))
    )
    g_cf_n, g_cf_t = timed_count(
        au.join(anchors, "event_type").filter(F.col("ua") != F.col("ub")).select("ua", "ub").distinct(),
        "guarded candidates (measured)",
    )
    print("\n== markdown table ==")
    print("| plan | unguarded candidates | guarded candidates | reduction | guarded wall (32 threads) |")
    print("|---|---|---|---|---|")
    print(f"| shingle inverted-index join ({N_DOCS//1000}k docs, hot shingle in 30%) "
          f"| {u_n:,} ({u_t:.0f}s to enumerate) | {g_n:,} | {u_n/max(g_n,1):,.0f}x | {j_t:.1f}s scored e2e |")
    print(f"| CF type-keyed pair join ({N_USERS//1000}k users, hot type = 30% of users) "
          f"| {u_cf_n:,} ({u_cf_t:.0f}s to enumerate) | {g_cf_n:,} | {u_cf_n/max(g_cf_n,1):.0f}x | {g_cf_t:.1f}s |")


if __name__ == "__main__":
    main()
