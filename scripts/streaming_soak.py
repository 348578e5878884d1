#!/usr/bin/env python
"""Continuous-trigger streaming SOAK — r10 VERDICT #7.

Every streaming operator is proven semantically via availableNow
batch-parity (the oracle-checked ext_stream_* keys); what that never
measured is the long-running processingTime path: does state-store size
plateau once the watermark horizon passes, and does throughput keep up
with the source, over minutes of real triggers?

This soak runs one RATE-source stream per stateful operator family —
  - windowed_event_counts   (watermarked tumbling-window agg)
  - sessionized_activity    (session windows, watermark merge+evict)
  - stream_dedup            (dropDuplicatesWithinWatermark)
  - running_user_totals     (applyInPandasWithState, bounded key space)
— each with trigger(processingTime=...), samples every StreamingQuery
progress event, and asserts per stream:

  1. enough real triggers fired (not one giant batch);
  2. BOUNDED STATE: max state rows in the final third of the run is no
     more than PLATEAU_SLACK x the max in the middle third (the
     watermark horizon is sized well inside the first third, so an
     unbounded operator shows monotone growth and fails);
  3. THROUGHPUT: total processed rows over the steady window >= 70% of
     rate x time (a stream falling behind its source accumulates
     backlog it can never drain).

Artifact: per-stream progress summaries + verdicts (STREAMING_SOAK_rN).

    python scripts/streaming_soak.py [OUT.json] [duration_sec=150] [rate=2000]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLATEAU_SLACK = 1.5
THROUGHPUT_FLOOR = 0.7


def rate_events(spark, rate: int, n_keys: int = 500):
    """events-shaped frame from the rate source: bounded key space, 5
    event types, deterministic value column."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % n_keys).alias("user_id"),
            F.concat(F.lit("t"), (F.col("value") % 5)).alias("event_type"),
            ((F.col("value") % 1000) / 10.0).alias("value"),
            F.col("value").alias("event_id"),
        )
    )


def build_streams(spark, rate: int, ckpt_root: str):
    from aircan_spark import streaming as S

    ev = lambda keys=500: rate_events(spark, rate, n_keys=keys)  # noqa: E731
    return {
        "windowed_counts": (
            # state bound = windows-in-horizon x event types; eviction is
            # the watermark's
            S.windowed_event_counts(ev(), window_duration="10 seconds",
                                    watermark="20 seconds"),
            "update",
        ),
        "sessions": (
            # SPARSE keys (inter-arrival per key >> gap) so sessions
            # genuinely close, emit in append mode, and EVICT — with a
            # dense key space every session extends forever and the
            # "bounded state" reading would be the key space, not the
            # session-window eviction. (Append is also the only mode
            # session-window streams support.)
            S.sessionized_activity(ev(keys=50_000), gap="10 seconds"),
            "append",
        ),
        "dedup": (
            # UNBOUNDED key (event_id is unique per row): watermark
            # eviction is the ONLY thing bounding this state — the
            # plateau assertion is measuring dropDuplicatesWithinWatermark
            # itself, not a finite key space
            S.stream_dedup(ev(), ["event_id"], delay="20 seconds"),
            "append",
        ),
        "user_totals": (
            # applyInPandasWithState with NoTimeout: state IS the key
            # space by design — the bound under test is that it tracks
            # distinct keys (500), not rows seen
            S.running_user_totals(ev()),
            "update",
        ),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/streaming_soak.json"
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 150.0
    rate = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    from aircan_spark.session import get_spark

    spark = get_spark(
        app_name="aircan_streaming_soak",
        master="local[32]",
        shuffle_partitions=8,  # stateful shuffles stay small; 8 keeps
        # per-trigger task overhead low so the trigger cadence is real
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    ckpt_root = tempfile.mkdtemp(prefix="aircan_soak_ckpt_")
    streams = build_streams(spark, rate, ckpt_root)
    queries = {}
    for name, (df, mode) in streams.items():
        queries[name] = (
            df.writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(ckpt_root, name))
            .trigger(processingTime="2 seconds")
            .queryName(f"soak_{name}")
            .start()
        )

    t0 = time.time()
    series: dict[str, list] = {n: [] for n in queries}
    seen_batch: dict[str, int] = {n: -1 for n in queries}
    while time.time() - t0 < duration:
        time.sleep(1.0)
        for name, q in queries.items():
            p = q.lastProgress
            if not p or p["batchId"] == seen_batch[name]:
                continue
            seen_batch[name] = p["batchId"]
            ops = p.get("stateOperators") or []
            series[name].append(
                {
                    "t": round(time.time() - t0, 1),
                    "batch": p["batchId"],
                    "input_rows": p.get("numInputRows", 0),
                    "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                    "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                    "state_mb": round(
                        sum(o.get("memoryUsedBytes", 0) for o in ops) / 1e6, 2
                    ),
                }
            )
            if q.exception():
                raise RuntimeError(f"{name}: {q.exception()}")

    results: dict = {}
    ok = True
    for name, q in queries.items():
        q.stop()
        s = series[name]
        verdicts: dict = {"n_batches": len(s)}
        if len(s) < 10:
            verdicts["verdict"] = "FAIL: too few triggers"
            ok = False
        else:
            third = len(s) // 3
            mid_max = max(r["state_rows"] for r in s[third : 2 * third])
            fin_max = max(r["state_rows"] for r in s[2 * third :])
            steady = s[third:]
            wall = steady[-1]["t"] - steady[0]["t"]
            processed = sum(r["input_rows"] for r in steady[1:])
            rate_ratio = processed / max(rate * wall, 1)
            verdicts.update(
                {
                    "state_rows_mid_max": mid_max,
                    "state_rows_final_max": fin_max,
                    "state_mb_final": s[-1]["state_mb"],
                    "plateau_ratio": round(fin_max / max(mid_max, 1), 3),
                    "throughput_ratio": round(rate_ratio, 3),
                    "mean_batch_ms": round(
                        sum(r["batch_ms"] or 0 for r in steady) / len(steady), 1
                    ),
                }
            )
            bounded = fin_max <= PLATEAU_SLACK * max(mid_max, 1) + 100
            keeps_up = rate_ratio >= THROUGHPUT_FLOOR
            verdicts["verdict"] = (
                "OK"
                if bounded and keeps_up
                else f"FAIL: bounded={bounded} keeps_up={keeps_up}"
            )
            ok = ok and bounded and keeps_up
        results[name] = verdicts
        print(f"{name}: {verdicts}", flush=True)

    artifact = {
        "mode": "processingTime=2s continuous-trigger soak (rate source)",
        "duration_sec": duration,
        "rows_per_sec": rate,
        "plateau_slack": PLATEAU_SLACK,
        "throughput_floor": THROUGHPUT_FLOOR,
        "streams": results,
        "series_tail": {n: s[-5:] for n, s in series.items()},
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"ok": ok, "out": out_path}))
    spark.stop()
    shutil.rmtree(ckpt_root, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
