"""Round-7 pins: ADVICE fixes (sketch NULL exclusion, delete-parity
vacuum), plan-shape regression pins for the next bench tier, and the
non-vacuousness invariant helpers."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


# --- sketch builders drop NULL items in-library (r6 ADVICE #1) ---------------
# concat_ws silently skips a NULL arg, so before the fix a NULL item
# hashed the seed prefix alone into a real bucket/register; parity with
# the NULL-filtering oracles held only because testdata has no NULL
# user_ids — the vacuous-consistency trap class.


def test_count_min_build_drops_null_items(spark):
    from aircan_spark.ext.sketch import count_min_build

    items = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "item string"
    )
    with_null = count_min_build(items, "item", depth=2, width=64)
    without = count_min_build(items.filter(F.col("item").isNotNull()), "item",
                              depth=2, width=64)
    assert sorted(map(tuple, with_null.collect())) == sorted(
        map(tuple, without.collect())
    )
    # total mass = depth * non-null item count
    total = with_null.agg(F.sum("cnt")).first()[0]
    assert total == 2 * 3


def test_hll_build_drops_null_items(spark):
    from aircan_spark.ext.sketch import hll_build

    items = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "item string"
    )
    with_null = hll_build(items, "item", b=4)
    without = hll_build(items.filter(F.col("item").isNotNull()), "item", b=4)
    assert sorted(map(tuple, with_null.collect())) == sorted(
        map(tuple, without.collect())
    )


# --- table vacuum retires dead snapshots (r6 ADVICE #3) ----------------------


def test_parquet_table_vacuum_retires_pre_delete_snapshot(spark):
    from aircan_spark.table import ParquetTable

    wh = tempfile.mkdtemp(prefix="aircan_r7_vacuum_")
    t = ParquetTable(spark, wh, "t")
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.overwrite(df)
    n = t.delete(spark.range(10).select(F.col("id").alias("k")), ["k"])
    assert n == 10
    snaps = [e for e in os.listdir(t.path) if e.startswith("v") and e[1:].isdigit()]
    assert len(snaps) == 2  # retention window holds pre-delete snapshot
    removed = t.vacuum(keep_snapshots=1)
    assert removed == 1
    snaps = [e for e in os.listdir(t.path) if e.startswith("v") and e[1:].isdigit()]
    assert len(snaps) == 1
    assert t.read().count() == 90  # current snapshot unharmed


def test_bucketed_table_vacuum_gcs_dead_data_dirs(spark):
    from aircan_spark.bucketed import BucketedParquetTable

    wh = tempfile.mkdtemp(prefix="aircan_r7_bvacuum_")
    t = BucketedParquetTable(spark, wh, "t", keys=["k"], num_buckets=4)
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.overwrite(df)
    n = t.delete(spark.range(10).select(F.col("id").alias("k")))
    assert n == 10
    dirs = [e for e in os.listdir(t.path) if e.startswith("data_v")]
    assert len(dirs) >= 2  # history holds pre-delete data
    removed = t.vacuum(keep_versions=1)
    assert removed >= 1
    assert t.manifest().get("history") == []
    assert t.read().count() == 90


def test_delete_parity_harness_leaves_single_snapshot(spark, sf_dir):
    # the w49 harness must not accumulate pre-delete snapshots per run
    import glob

    from aircan_spark.ext.queries_w49 import ext_table_delete_parity

    before = set(glob.glob(tempfile.gettempdir() + "/aircan_r6_delete_wh_*"))
    ext_table_delete_parity(spark, sf_dir).collect()
    new = set(glob.glob(tempfile.gettempdir() + "/aircan_r6_delete_wh_*")) - before
    for wh in new:
        snaps = [
            e
            for e in os.listdir(os.path.join(wh, "t"))
            if e.startswith("v") and e[1:].isdigit()
        ]
        assert len(snaps) == 1, f"{wh}: pre-delete snapshot not vacuumed"


# --- DLQ-gate harness refuses an empty ingest (r6 ADVICE #2) -----------------


def test_dlq_gate_empty_parts_raises():
    from aircan_spark.ext import queries_w48 as w48

    src = open(w48.__file__).read()
    assert "if not parts:" in src and "RuntimeError" in src
