#!/usr/bin/env python
"""Session-ENDURANCE smoke over the heavy tier at 10x — the opposite
measurement to scale_smoke.py (r9 verdict item #5).

scale_smoke clearCache()s between queries because its measurand is
per-query scale behavior; the r9 ext_dedup_groups episode (320s clean
standalone, UNABLE_TO_ACQUIRE_MEMORY amid other queries' persisted
frames at salted-30x) showed session endurance is a DIFFERENT failure
axis: frames a query persists and never releases contend for the
unified memory region across every later query in the session. This
smoke runs the heavy tier back-to-back in ONE session with NO cache
clearing and records, per query: wall, error, and the persisted-RDD
RESIDUE it left behind (count + storage bytes delta via the Spark
status tracker) — a query that leaks a frame it no longer needs shows
up as monotone residue growth.

    python scripts/endurance_smoke.py [/tmp/sf1eq] [OUT.json] [N_TOP]

Heavy tier = the checkpoint/iterative set (dedup groups/star, entity
clusters, HITS, embedding LSH, ANN) + the top-N warm entries of the
committed bench_queries.json. Exit 1 on any error or if the FINAL
residue exceeds the leak budget (persisted frames that survive the
whole pass).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# iterative/checkpoint-backed queries whose persisted frames caused the
# r9 endurance failure class — always in the tier regardless of bench rank
ALWAYS = [
    "ext_dedup_groups",
    "ext_dedup_groups_star",
    "ext_entity_clusters",
    "ext_hits",
    "ext_dedup_embedding_lsh",
    "ext_dedup_minhash",
    "ext_dedup_ngram_jaccard",
    "ext_sim_topk_lsh",
    "ext_sim_topk_ivf",
    "ext_sim_topk_ivfpq",
    "ext_pca_power",
    "ext_communities",
    "ext_theil_sen",
]


def _persisted(spark):
    """(count, total MemSize+DiskSize bytes) of currently persisted RDDs."""
    jsc = spark.sparkContext._jsc.sc()
    infos = jsc.getRDDStorageInfo()
    return len(infos), sum(i.memSize() + i.diskSize() for i in infos)


def main() -> None:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1eq"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/endurance_smoke.json"
    n_top = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    with open(os.path.join(REPO, "bench_queries.json")) as fh:
        warm = json.load(fh).get("queries_warm") or {}
    tier = list(ALWAYS)
    for name, _sec in sorted(warm.items(), key=lambda kv: -kv[1]):
        if name not in tier and name in QUERIES:
            tier.append(name)
        if len(tier) >= len(ALWAYS) + n_top:
            break

    spark = get_spark(
        app_name="aircan_endurance",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{big_dir}/lineitem.parquet").count()

    results: dict = {}
    errors: dict = {}
    t_all = time.time()
    for i, name in enumerate(tier, 1):
        c0, b0 = _persisted(spark)
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, big_dir).count()
            wall = round(time.perf_counter() - t0, 2)
            c1, b1 = _persisted(spark)
            results[name] = {
                "sec": wall,
                "residue_rdds": c1,
                "residue_delta": c1 - c0,
                "residue_mb": round(b1 / 1e6, 1),
            }
            print(
                f"[{i}/{len(tier)}] {name}: {wall}s, residue {c1} rdds "
                f"({results[name]['residue_mb']} MB)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — record, continue (smoke)
            errors[name] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = {"sec": None, "error": errors[name]}
            print(f"[{i}/{len(tier)}] {name}: ERROR {errors[name]}", flush=True)

    # Final-residue measurement in two stages (r11, VERDICT #6). Stage 1:
    # raw residue + GC drain — what survives is NOT cleaner-pending; the
    # r11 investigation showed it is the CacheManager's STRONG pins on
    # the lazy pair queries' persisted indexes (minhash/simhash sigs,
    # shingle indexes), which no GC ever frees. The CC-family queries now
    # release theirs in-function; the lazy-return queries CANNOT (the
    # consumer owns the lifetime), so a long-lived session releases them
    # explicitly — stage 2 runs data.release_session_caches (clearCache +
    # GC drain) and the 5 MB budget applies to what survives THAT:
    # a strong reference nothing can release is a real leak.
    import gc

    gc.collect()
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        pre_release_count, pre_release_bytes = _persisted(spark)
        if pre_release_bytes == 0:
            break

    from aircan_spark.data import release_session_caches

    final_count, final_bytes = release_session_caches(spark)
    artifact = {
        "data_dir": big_dir,
        "mode": "no-clearCache single-session endurance",
        "n_queries": len(tier),
        "n_errors": len(errors),
        "peak_residue_mb": round(
            max(
                (r.get("residue_mb") or 0)
                for r in results.values()
                if isinstance(r, dict)
            ),
            1,
        ),
        "pre_release_residue_rdds": pre_release_count,
        "pre_release_residue_mb": round(pre_release_bytes / 1e6, 1),
        "final_residue_rdds": final_count,
        "final_residue_mb": round(final_bytes / 1e6, 1),
        "wall_sec": round(time.time() - t_all, 1),
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in artifact.items() if k != "queries"}))
    spark.stop()
    # leak budget: residue surviving the WHOLE pass AND the reference
    # drain. Healthy state is ~0 (cleaner-pending blocks drain once the
    # GCs run — measured 62.3 -> 0 MB at 10x, r11); a theil_sen-class
    # leak (a STRONG reference to a frame no result needs) survives the
    # drain and fails the budget.
    budget_mb = float(os.environ.get("ENDURANCE_RESIDUE_BUDGET_MB", "5"))
    if final_bytes / 1e6 > budget_mb:
        print(
            f"RESIDUE OVER BUDGET: {final_bytes/1e6:.1f} MB persisted after "
            f"the full pass (budget {budget_mb} MB) — a query is leaking "
            "frames it no longer needs"
        )
        sys.exit(1)
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
