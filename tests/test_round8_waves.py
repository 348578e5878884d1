"""Round-8 pins: ADVICE fixes (stale stage-cache reclaim, theil-sen NULL
exclusion), plan-shape pins for the >=4.5s cold tier, and the
cap-adaptive graph-threshold property (r7 verdict items #5/#6)."""

import os

import pytest
from pyspark.sql import functions as F


# --- stale stage-cache entries are reclaimed before re-staging ---------------
# (r7 ADVICE #1): on a stale hit the old mkdtemp dir must be rmtree'd
# BEFORE the cache entry is overwritten — the atexit reclaim only walks
# current entries, so an overwritten path would leak for the process
# lifetime.


def test_staged_split_dir_reclaims_stale_dir(spark, sf_dir):
    import aircan_spark.ext.queries_w46 as w46

    d1, _ = w46._staged_split_dir(spark, sf_dir, "orders", ["o_orderkey"], n=2)
    # corrupt the staged split: drop one part file -> intact check fails
    removed = False
    for f in os.listdir(d1):
        if f.endswith(".parquet"):
            os.remove(os.path.join(d1, f))
            removed = True
            break
    assert removed
    d2, _ = w46._staged_split_dir(spark, sf_dir, "orders", ["o_orderkey"], n=2)
    assert d2 != d1
    assert not os.path.exists(d1)  # stale dir reclaimed, not leaked


def test_staged_dlq_backlog_reclaims_stale_dir(spark, sf_dir):
    import aircan_spark.ext.queries_w48 as w48

    s1, thr1 = w48._staged_dlq_backlog(spark, sf_dir)
    os.remove(os.path.join(s1, "bucket0.json"))
    s2, thr2 = w48._staged_dlq_backlog(spark, sf_dir)
    assert s2 != s1
    assert not os.path.exists(s1)
    assert thr2 == thr1  # deterministic re-stage: same data-derived gate


# --- _theil_sen_median excludes NULL slopes (r7 ADVICE #2) --------------------
# A NULL bucket row (sorted first) would desync cum ranks vs the
# non-null n, and int(r['b']) raises TypeError if that bucket is
# selected. The helper now drops NULLs up front; n counts non-nulls.


def test_theil_sen_median_ignores_nulls_on_selection_path(spark):
    from aircan_spark.ext.queries_w07 import _theil_sen_median

    vals = [(float(i),) for i in range(1001)] + [(None,)] * 50
    df = spark.createDataFrame(vals, "s double")
    # budget below bucket occupancy forces the refinement loop (the path
    # whose rank arithmetic the NULL bucket would desync)
    n, med = _theil_sen_median(df, budget=100)
    assert n == 1001
    assert med == 500.0


def test_theil_sen_median_all_null_column(spark):
    from aircan_spark.ext.queries_w07 import _theil_sen_median

    df = spark.createDataFrame([(None,)] * 5, "s double")
    assert _theil_sen_median(df) == (0, None)
