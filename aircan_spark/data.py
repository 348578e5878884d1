"""Loaders for the driver testdata tables (/root/testdata/sf*/).

One quirk: ``events.parquet`` stores ``ts`` as INT64 TIMESTAMP(NANOS),
which Spark's vectorized parquet reader rejects outright
(PARQUET_TYPE_ILLEGAL). The ``nanosAsLong`` legacy conf makes the column
readable as a raw nanosecond count, which we convert to a microsecond
timestamp. The conf is set at read time so it works on ANY session the
caller hands us (the round driver constructs its own).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the temp checkpoint dir checkpoint(big=True) minted in local mode, if
# any — distinguishes our own dir from an externally configured cluster
# dir (an external setCheckpointDir always wins, even after minting)
_MINTED_CKPT_PATH: str | None = None


def checkpoint(df: DataFrame, big: bool = False, eager: bool = True) -> DataFrame:
    """Truncate lineage for iterative operators — reliable when possible.

    ``localCheckpoint`` stores blocks on executors: fast, but NOT
    fault-tolerant (an executor loss kills the job past the point of
    recomputation). On a real cluster, call
    ``spark.sparkContext.setCheckpointDir("hdfs://...")`` (or
    ``session.get_spark(checkpoint_dir=...)``) once and every iterative
    operator in this package transparently switches to RELIABLE
    ``df.checkpoint()`` — blocks in the fault-tolerant store survive
    executor churn, the requirement at 1000 executors. With no
    checkpoint dir configured (local mode, tests) this stays
    ``localCheckpoint``, which needs no filesystem.

    ``big=True`` marks a DATA-PROPORTIONAL frame (an edge list, a pair
    corpus) as opposed to the bounded per-round label/axis frames:
    localCheckpoint's MEMORY_AND_DISK_DESER level is wrong for those —
    blocks that spill to disk are RE-PROMOTED into the heap as
    deserialized objects on every read (``maybeCacheDiskValuesInMemory``),
    which is exactly how the r7 30x experiment OOMed ext_entity_clusters
    at the default heap. Big frames therefore go through RELIABLE
    ``df.checkpoint()`` even in local mode (lazily minting a process-
    lifetime temp checkpoint dir when none is configured): serialized on
    disk, read with bounded memory, lineage truncated — the same
    mechanics a cluster gets from its configured HDFS dir.

    ``eager=False`` (r12, guide §5 driver overhead): defer
    materialization to the CALLER'S next action over the frame — the
    convergence count of an iterative loop, or the query's own final
    execution. The blocks, the lineage truncation and the plan are
    identical to the eager form; the only difference is that the
    stand-alone materialization JOB disappears (per-round label frames
    were paying one extra job submission per iteration just to
    materialize before the round's real action ran). Only honored on
    the local ``localCheckpoint`` path: the ``big=True`` and
    external-checkpoint-dir paths stay eager because their
    cache-then-checkpoint dance (persist -> write -> unpersist) must
    complete while the persist pin is still held."""
    global _MINTED_CKPT_PATH
    sc = df.sparkSession.sparkContext
    cur = sc._jsc.sc().getCheckpointDir()
    cur_dir = cur.get() if cur.isDefined() else None
    minted_now = (
        _MINTED_CKPT_PATH is not None
        and cur_dir is not None
        and _MINTED_CKPT_PATH in cur_dir
    )
    if cur_dir is not None and not minted_now:
        # externally configured (cluster HDFS dir): everything reliable
        return df.checkpoint(eager=True)
    if big:
        if not minted_now:
            import atexit
            import shutil
            import tempfile

            ckpt_dir = tempfile.mkdtemp(prefix="aircan_big_ckpt_")
            atexit.register(shutil.rmtree, ckpt_dir, ignore_errors=True)
            sc.setCheckpointDir(ckpt_dir)
            _MINTED_CKPT_PATH = ckpt_dir
        from pyspark import StorageLevel

        # classic cache-before-checkpoint: the eager count populates the
        # DISK_ONLY persist, so the checkpoint WRITE job streams from
        # disk instead of recomputing the (expensive) lineage a second
        # time; unpersisted immediately — the checkpoint is the survivor
        df = df.persist(StorageLevel.DISK_ONLY)
        try:
            out = df.checkpoint(eager=True)
        finally:
            df.unpersist()
        return out
    # small bounded frames (per-round labels, collapsed axes) keep the
    # fast in-memory localCheckpoint even after a big frame minted the
    # temp dir — only data-proportional frames pay the disk round-trip
    return df.localCheckpoint(eager=eager)


def release_session_caches(spark, gc_rounds: int = 3, settle_sec: float = 1.0):
    """Release every DataFrame cache entry and drain unreachable blocks.

    Spark's CacheManager holds cached plans by STRONG reference, so a
    library function that returns a lazy plan over a ``persist()``ed
    index (minhash/simhash signatures, shingle inverted indexes) pins
    those bytes for the LIFE OF THE SESSION once the consumer is done —
    no GC ever frees them (r11 endurance finding: 98.8 MB surviving a
    full GC drain at 10x; terabytes at 100 TB). Queries that materialize
    their index during construction release it in-function (the CC
    family); for the rest, a long-lived session calls THIS between
    pipelines: clearCache drops the CacheManager pins, then alternating
    Python/JVM GC passes let the ContextCleaner reap localCheckpoint and
    RDD blocks whose owners are gone. Returns (n_rdds, bytes) still
    persisted afterwards — anything nonzero is strongly held by LIVE
    references (a real leak or a frame still in use)."""
    import gc
    import time as _time

    spark.catalog.clearCache()
    sc = spark.sparkContext
    n, b = 0, 0
    for _ in range(max(1, gc_rounds)):
        gc.collect()
        sc._jvm.System.gc()
        _time.sleep(settle_sec)
        infos = sc._jsc.sc().getRDDStorageInfo()
        n, b = len(infos), sum(i.memSize() + i.diskSize() for i in infos)
        if b == 0:
            break
    return n, b


def fan_out(df: DataFrame, min_ratio: int = 1) -> DataFrame:
    """Spread a narrow scan across the cluster for compute-heavy operators.

    Small single-file parquet inputs (one row group) arrive as ONE input
    split, so regex/shingle/vector work runs on one core no matter how
    many the cluster has. When the scan has fewer partitions than
    ``defaultParallelism * min_ratio``, repartition up; otherwise (the
    100 TB case — thousands of natural splits) this is a no-op, so no
    gratuitous shuffle is added at scale.

    r12: the ``df.rdd.getNumPartitions()`` probe converts the plan to an
    RDD through py4j — measured 45-110 ms on first touch of a scan. The
    probe result (and the repartitioned frame) are memoized as
    attributes ON the DataFrame object, so repeated ``fan_out`` of the
    same (immutable) plan object — which ``load_table``'s per-session
    frame cache now hands out — pays the probe once per session. The
    decision itself is unchanged: same target, same probe value, same
    plan.
    """
    sc = df.sparkSession.sparkContext
    par = getattr(sc, "_aircan_default_par", None)
    if par is None:
        par = sc.defaultParallelism
        try:
            sc._aircan_default_par = par
        except Exception:
            pass
    target = par * min_ratio
    n = getattr(df, "_aircan_nparts", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        try:
            df._aircan_nparts = n
        except Exception:  # foreign DataFrame subclass refusing attrs
            pass
    if n >= target:
        return df
    cached = getattr(df, "_aircan_fanout", None)
    if cached is not None and cached[0] == target:
        return cached[1]
    out = df.repartition(target)
    try:
        df._aircan_fanout = (target, out)
    except Exception:
        pass
    return out


# Per-session catalog of loaded testdata frames: SparkSession (weak) ->
# {(abspath, mtime_ns, size): DataFrame}. A DataFrame is an immutable lazy
# PLAN — caching the object caches table METADATA (schema, resolved scan),
# exactly what a warehouse catalog (HMS/Iceberg) provides a real engine;
# every execution still reads the parquet bytes. Without this, each of the
# ~1000 load_table calls in a 474-query suite re-runs parquet schema
# inference (measured 100-215 ms/call vs 46 ms schema-supplied and ~0 for
# a cache hit). Keyed on (mtime_ns, size) so a rewritten file misses; the
# weak session key drops the catalog with its session.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    per = None
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None  # non-posix path (hdfs://, s3a://): no cheap stamp
    if stamp is not None:
        try:
            per = _TABLE_CACHE.setdefault(spark, {})
        except TypeError:  # session not weak-referenceable (mock)
            per = None
        key = (os.path.abspath(path), stamp)
        if per is not None and key in per:
            return per[key]
    df = _load_table_uncached(spark, path, name)
    if stamp is not None and per is not None:
        per[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Some driver snapshots store ts as INT64 TIMESTAMP(NANOS) (arrives
        # as a raw long under nanosAsLong), others as plain timestamp[us].
        # Convert only the long case: ns -> µs via integer division (float
        # division rounds at ~1.7e15, a 52-bit mantissa, and lands 1µs off
        # the truncation every other engine does).
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # unix_micros()/window() want TIMESTAMP. Pin the session to UTC
            # so the NTZ->LTZ cast is wall-clock-preserving and epoch
            # extraction agrees with DuckDB's naive-as-UTC reading of the
            # same parquet.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)
