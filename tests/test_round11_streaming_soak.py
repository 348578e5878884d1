"""Round-11 (r10 VERDICT #7): one IN-SUITE exercise of the continuous
processingTime trigger path. The full soak (scripts/streaming_soak.py,
4 stateful families x 150s, STREAMING_SOAK_r11 artifact) asserts
state-plateau and throughput over minutes; this test keeps the trigger
path itself from regressing: a rate-source stream through
dropDuplicatesWithinWatermark must fire multiple REAL triggers, keep
state bounded by the watermark horizon (the key is unique per row, so
nothing else bounds it), and stop cleanly.
"""

from __future__ import annotations

import os
import tempfile
import time


def test_processing_time_trigger_dedup_bounded_state(spark):
    from pyspark.sql import functions as F

    from aircan_spark import streaming as S

    rate = 500
    ev = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("event_id"),
        )
    )
    dedup = S.stream_dedup(ev, ["event_id"], delay="4 seconds")
    ckpt = tempfile.mkdtemp(prefix="aircan_soak_test_")
    q = (
        dedup.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "q"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        progress = []
        deadline = time.time() + 18
        seen = -1
        while time.time() < deadline:
            time.sleep(0.5)
            p = q.lastProgress
            if p and p["batchId"] != seen:
                seen = p["batchId"]
                ops = p.get("stateOperators") or []
                progress.append(
                    (p["batchId"], sum(o.get("numRowsTotal", 0) for o in ops))
                )
            assert q.exception() is None
    finally:
        q.stop()

    batches = [b for b, _ in progress]
    assert len(batches) >= 5, f"only {len(batches)} triggers fired: {progress}"
    # state is bounded by the watermark horizon: ~rate * (delay + trigger
    # slack). 500/s * 4s horizon -> ~2000-4000 live keys; 10x that means
    # eviction is not happening.
    max_state = max(s for _, s in progress[2:])
    assert max_state <= 10 * rate * 4, f"state unbounded: {progress}"
    # and state actually accumulated something (the operator is real)
    assert max_state > 0, f"no state recorded: {progress}"
