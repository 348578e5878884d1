"""Round-11: data.release_session_caches is the session-lifecycle hook
for the CacheManager pin class (lazy pair queries persist index frames
the consumer's lifetime owns; the CacheManager holds them by STRONG
reference, so nothing short of clearCache ever frees them). Pin both
halves: the pin is real (survives GC), and the release drains it.
"""

from __future__ import annotations

import gc
import time


def _persisted_bytes(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def test_release_session_caches_drains_the_pin(spark):
    from pyspark.sql import functions as F

    from aircan_spark.data import release_session_caches
    from aircan_spark.ext import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(300)],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    pairs.count()  # materialize -> the DISK_ONLY index is now populated
    del pairs

    # the pin survives both GCs: CacheManager holds it strongly
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    assert _persisted_bytes(spark) > 0

    n, b = release_session_caches(spark, gc_rounds=3, settle_sec=0.5)
    assert (n, b) == (0, 0), f"release left {n} rdds / {b} bytes"


def test_cc_family_releases_in_function(spark, monkeypatch):
    """The CC-family queries unpersist their inverted index during
    construction (their eager edge checkpoint makes it dead weight) —
    building AND running one must leave the CacheManager empty."""
    import aircan_spark.ext.queries as Q

    docs = spark.createDataFrame(
        [(i, f"one two three four five {i % 7} six") for i in range(100)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(Q, "_t", lambda _s, _d, _n: docs)
    Q.ext_dedup_groups(spark, "/root/testdata/sf0.001").count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
