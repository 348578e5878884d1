#!/usr/bin/env python
"""100x-salted (sf10-equivalent) rung over the heavy tier — one scale
decade above the r9/r10 salted-30x smoke, same distinct-content corpus
semantics (gen_sf1eq.py reps=100 salt=1: 500k docs / 60M lineitem /
200k vectors / 1M events). Measures the queries whose scale behavior
this round re-engineered (candidate-volume quadratics, ANN trainers,
CC family, overflow-fixed moments) at a data point where any surviving
quadratic is ~11x worse than 30x made it look.

    python scripts/tier100x.py [/tmp/sf10eq_salted] [OUT.json] [shuffle]

clearCache between queries (per-query scaling measurand — endurance is
ENDURANCE_SMOKE's domain); errors recorded, run continues.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIER = [
    # fixed candidate-volume quadratics (r10)
    "ext_tfidf_cosine_pairs",
    "ext_fs_linkage",
    "ext_dup_threshold_curve",
    "ext_dedup_ngram_jaccard",
    # overflow-fixed moments (r9/r10) — the DECIMAL paths at real volume
    "ext_pareto_knee",
    "ext_hoover_index",
    "ext_western_electric",
    "ext_sax_motifs",
    "ext_wilcoxon_signed_rank",
    # ANN on the partition-invariant trainer
    "ext_sim_topk_brute",
    "ext_sim_topk_lsh",
    "ext_sim_topk_ivf",
    "ext_sim_topk_pq",
    "ext_sim_topk_ivfpq",
    "ext_dedup_embedding_lsh",
    # sketch-signature dedup + image value-space
    "ext_dedup_minhash",
    "ext_dedup_simhash",
    "ext_image_near_dup",
    "ext_theil_sen",
    # graph / iterative CC family (longest last: partial artifacts stay useful)
    "ext_hits",
    "ext_pagerank",
    "ext_cluster_size_histogram",
    "ext_dedup_groups",
    "ext_dedup_groups_star",
    "ext_entity_clusters",
]


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10eq_salted"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tier100x.json"
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    spark = get_spark(
        app_name="aircan_tier100x",
        master="local[32]",
        shuffle_partitions=shuffle,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{big}/lineitem.parquet").count()

    results: dict = {}
    errors: dict = {}
    t_all = time.time()
    for i, name in enumerate(TIER, 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            n = QUERIES[name](spark, big).count()
            w = round(time.perf_counter() - t0, 1)
            results[name] = {"sec": w, "rows": n}
            print(f"[{i}/{len(TIER)}] {name}: {w}s, {n} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — smoke: record, continue
            errors[name] = f"{type(e).__name__}: {str(e)[:300]}"
            results[name] = {"error": errors[name]}
            print(f"[{i}/{len(TIER)}] {name}: ERROR {errors[name]}", flush=True)
        # checkpoint the artifact after every query so a wall-clock kill
        # still leaves a committed-able partial
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "data_dir": big,
                    "scale": "100x salted sf0.1 (sf10-equivalent, distinct contents)",
                    "shuffle_partitions": shuffle,
                    "n_done": i,
                    "n_errors": len(errors),
                    "wall_sec_so_far": round(time.time() - t_all, 1),
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    print(json.dumps({"n": len(TIER), "errors": len(errors),
                      "wall": round(time.time() - t_all, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
