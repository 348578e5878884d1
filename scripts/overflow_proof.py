#!/usr/bin/env python
"""End-to-end proof that the r9 moment-overflow fixes hold at data
scales that actually cross 2^63 — and that the OLD int64 expressions
fail there (PERFORMANCE.md "r9 moment-overflow margin audit").

Two stressors, built by replicating sf0.1 testdata into a temp dir:

- events x40 (4M rows, verbatim): daily cent sums c ~ 7.1e8, so
  SUM(c*c) ~ 30 * 5e17 = 1.5e19 > 2^63 — the exact trap that killed
  the old ext_sax_motifs / ext_western_electric at ~sf3.3. The NEW
  queries must run end-to-end; the OLD SUM(c*c)-in-BIGINT expression
  must raise (ANSI) on the same frame.
- orders x2800 salted (420M slim rows; o_custkey salted so customers
  grow to ~4.2e7): SUM(|n*y - yt|) = n^2 * MAD(y) with measured
  MAD = 7287 -> ~1.29e19 > 2^63 — the old ext_hoover_index trap
  (overflow at ~sf237; the first x1500 attempt taught that the sum
  scales with the mean ABSOLUTE DEVIATION, not the mean — 3.7e18,
  still under). Same new-runs / old-raises contract.

cronbach/slope_heterogeneity cross their traps only at ~sf3000+ (3e8+
rows to build); their past-trap behavior is pinned at the expression
level in tests/test_round9_margin_audit.py instead.

Writes SCALE_PROOF_OVERFLOW_r09.json. Run AFTER bench (shares the host).
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"events_replication": 40, "orders_replication": 2800}
    tmp = tempfile.mkdtemp(prefix="aircan_overflow_proof_")
    try:
        # --- events x40 (verbatim: daily sums grow 40x, the c^2 trap) ----
        ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
        reps = spark.range(40).select(F.col("id").alias("rep"))
        ev.crossJoin(reps).drop("rep").write.mode("overwrite").parquet(
            os.path.join(tmp, "events.parquet")
        )
        # slim salted orders x2800: customers grow to ~4.2e7 so the
        # |n*y - yt| sum = n^2*MAD(y) crosses 2^63 (y per customer
        # unchanged; MAD measured 7287 at sf0.1)
        od = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
            "o_custkey", "o_totalprice"
        )
        reps2 = spark.range(2800).select(F.col("id").alias("rep"))
        od.crossJoin(reps2).select(
            (F.col("o_custkey") * 2800 + F.col("rep")).alias("o_custkey"),
            "o_totalprice",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))

        # --- the OLD int64 expressions must overflow (ANSI raise) --------
        daily = (
            spark.read.parquet(os.path.join(tmp, "events.parquet"))
            .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
            .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
        )
        try:
            daily.agg(F.sum(F.expr("c*c")).alias("s2")).collect()
            out["old_sax_expr"] = "NO-ERROR (unexpected: trap not reached)"
        except Exception as e:  # noqa: BLE001
            out["old_sax_expr"] = f"RAISES as expected: {type(e).__name__}"
        cust = (
            spark.read.parquet(os.path.join(tmp, "orders.parquet"))
            .groupBy("o_custkey")
            .agg(
                F.expr(
                    "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) DIV 10000"
                    " AS BIGINT)"
                ).alias("y")
            )
        )
        tot = cust.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("yt"))
        try:
            cust.crossJoin(F.broadcast(tot)).agg(
                F.sum(F.expr("ABS(n*y - yt)")).alias("absdev")
            ).collect()
            out["old_hoover_expr"] = "NO-ERROR (unexpected: trap not reached)"
        except Exception as e:  # noqa: BLE001
            out["old_hoover_expr"] = f"RAISES as expected: {type(e).__name__}"

        # --- the NEW declared queries must run end-to-end ----------------
        for name in ("ext_sax_motifs", "ext_western_electric",
                     "ext_cronbach_alpha_weekday", "ext_slope_heterogeneity"):
            t0 = time.time()
            n = QUERIES[name](spark, tmp).count()
            out[name] = {"rows": n, "sec": round(time.time() - t0, 1)}
            print(name, out[name], flush=True)
        t0 = time.time()
        n = QUERIES["ext_hoover_index"](spark, tmp).count()
        out["ext_hoover_index"] = {"rows": n, "sec": round(time.time() - t0, 1)}
        print("ext_hoover_index", out["ext_hoover_index"], flush=True)

        with open(os.path.join(REPO, "SCALE_PROOF_OVERFLOW_r09.json"), "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(json.dumps(out, sort_keys=True))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
