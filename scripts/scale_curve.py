"""Two-point scaling curve (r6 verdict item #4): run the most expensive
non-streaming declared queries at sf0.1 AND at the locally generated
sf1-equivalent (scripts/gen_sf1eq.py, 10x fact volume, same dimension
cardinalities) and report wall-clock ratios. A scale-safe plan should
grow ~linearly (ratio <= ~10 plus fixed overhead amortization, often
well under 10 because fixed scheduling cost dominates at sf0.1);
super-linear blowups flag a plan that would not survive 100x.

    python scripts/scale_curve.py [out.json] [q1 q2 ...]

Method per (query, dir): build via fn(), force end-to-end through the
noop sink (cold, includes Catalyst + any checkpoint materialization),
then rebuild via fn() and force again (warm_rebuild — JIT hot, files
cached, checkpoints honestly re-materialized: the steady-state number,
same protocol as bench.py's CHECKPOINT_QUERIES handling).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "ext_theil_sen",
    "ext_mm_resize_png_full",
    "ext_hits",
    "ext_entity_clusters",
    "ext_cluster_size_histogram",
    "ext_pca_power",
    "ext_dedup_embedding_lsh",
    "ext_gini",
    "ext_pagerank",
    "ext_dedup_groups",
]

# override second point with e.g. SCALE_CURVE_BIG=/tmp/sf1eq_salted
DIRS = ["/root/testdata/sf0.1", os.environ.get("SCALE_CURVE_BIG", "/tmp/sf1eq")]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_curve.json"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    # SCALE_CURVE_SHUFFLE: at bigger rungs, scale the partition count
    # with the data so per-partition size stays constant — the same knob
    # a real cluster turns (at 30x with 32 partitions, partitions are
    # 30x sf0.1's and a 32-task shared local heap OOMs; 96-128 restores
    # the per-task working set). This is sizing, not a plan change.
    spark = get_spark(
        app_name="aircan_scale_curve",
        master="local[32]",
        shuffle_partitions=int(os.environ.get("SCALE_CURVE_SHUFFLE", "32")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # pre-warm JVM + python workers as bench.py does
    spark.read.parquet(f"{DIRS[0]}/lineitem.parquet").count()

    res: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        rec: dict[str, float] = {}
        for d in DIRS:
            tag = "sf1eq" if d != DIRS[0] else "sf0.1"
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            rec[f"{tag}_cold_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            rec[f"{tag}_warm_s"] = round(time.perf_counter() - t0, 3)
        # clamp the denominator: a sub-millisecond sf0.1 timing rounds
        # to 0.0 and would ZeroDivisionError away the whole run's results
        rec["ratio_warm"] = round(
            rec["sf1eq_warm_s"] / max(rec["sf0.1_warm_s"], 1e-3), 2
        )
        rec["ratio_cold"] = round(
            rec["sf1eq_cold_s"] / max(rec["sf0.1_cold_s"], 1e-3), 2
        )
        res[name] = rec
        print(f"{name}: sf0.1 warm {rec['sf0.1_warm_s']}s -> sf1eq warm "
              f"{rec['sf1eq_warm_s']}s (x{rec['ratio_warm']})", flush=True)
        # write incrementally so a late-query failure keeps earlier rows
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1, sort_keys=True)

    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": out_path, "n": len(res)}))


if __name__ == "__main__":
    main()
