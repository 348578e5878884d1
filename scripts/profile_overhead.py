#!/usr/bin/env python
"""Round-12 overhead decomposition (guide §1: measure first).

Splits per-query wall time into:
  t_construct  fn(spark, sf_dir)           driver py4j + eager work
  t_analyze    df.schema access            Catalyst analysis
  t_first      1st noop write              optimize + codegen + execute
  t_second     2nd noop write              steady-state re-execution

plus micro-benches of the shared fixed costs every query pays:
  spark.read.parquet(path)                 schema inference per call
  spark.read.schema(s).parquet(path)       schema-supplied read
  df.rdd.getNumPartitions()                fan_out's probe
  load_table + fan_out (the _t composite)

Usage: python scripts/profile_overhead.py [sf_dir] [n_queries|name...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rest = sys.argv[2:]
    from aircan_spark.session import get_spark
    from aircan_spark.queries import QUERIES
    from aircan_spark.data import load_table, fan_out

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile_overhead",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "lineitem").count()

    # ---- micro-benches --------------------------------------------------
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F401

    def _noop_batches(it):
        for b in it:
            yield b

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    micro = {}
    path = os.path.join(sf_dir, "lineitem.parquet")
    reps = 20

    t0 = time.perf_counter()
    for _ in range(reps):
        df = spark.read.parquet(path)
    micro["read_parquet_infer_ms"] = (time.perf_counter() - t0) / reps * 1e3

    schema = spark.read.parquet(path).schema
    t0 = time.perf_counter()
    for _ in range(reps):
        df = spark.read.schema(schema).parquet(path)
    micro["read_parquet_schema_ms"] = (time.perf_counter() - t0) / reps * 1e3

    df = spark.read.parquet(path)
    t0 = time.perf_counter()
    for _ in range(reps):
        n = df.rdd.getNumPartitions()
    micro["rdd_getnumpartitions_ms"] = (time.perf_counter() - t0) / reps * 1e3
    micro["scan_partitions"] = n

    t0 = time.perf_counter()
    for _ in range(reps):
        fan_out(load_table(spark, sf_dir, "lineitem"))
    micro["t_composite_ms"] = (time.perf_counter() - t0) / reps * 1e3

    # per-table one-shot
    for t in ("lineitem", "orders", "events", "documents", "embeddings",
              "customer", "part", "supplier", "nation", "region"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        t0 = time.perf_counter()
        d = spark.read.parquet(p)
        t1 = time.perf_counter()
        np_ = d.rdd.getNumPartitions()
        t2 = time.perf_counter()
        micro[f"table_{t}"] = {
            "read_ms": (t1 - t0) * 1e3,
            "rdd_probe_ms": (t2 - t1) * 1e3,
            "parts": np_,
        }

    print(json.dumps(micro, indent=1))

    # ---- per-query decomposition ---------------------------------------
    if rest and not rest[0].isdigit():
        names = rest
    else:
        k = int(rest[0]) if rest else 60
        names = list(QUERIES)[:k]
    out = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        out[name] = {
            "construct": round(t1 - t0, 3),
            "analyze": round(t2 - t1, 3),
            "first": round(t3 - t2, 3),
            "second": round(t4 - t3, 3),
        }
    tot = {
        k: round(sum(v[k] for v in out.values()), 2)
        for k in ("construct", "analyze", "first", "second")
    }
    print(json.dumps({"totals": tot, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
