#!/usr/bin/env python
"""FULL-REGISTRY 100x-salted (sf10-equivalent) smoke — r10 VERDICT #1.

The r10 rung (scripts/tier100x.py) measured only the 25 heavy-tier
queries at 100x; the other 443 had last run at salted-30x, and every
scale decade so far has exposed a quadratic class the previous one
could not see (30x: tfidf postings / fs_linkage pair join / jaccard
candidates; 100x: entity_clusters' verbatim-name edges). This script
runs EVERY declared query against the 100x corpus (gen_sf1eq.py
reps=100 salt=1: 500k docs / 60M lineitem / 200k vectors / 1M events),
budget-capped per query:

- each query runs inside its own Spark job group; a watchdog thread
  cancels the group at --budget seconds (default 600 — the VERDICT's
  ">10-minute walls recorded" line), so one runaway quadratic cannot
  eat the rung. Cancelled queries are recorded as ``timeout`` with the
  budget wall, errors are recorded and the run continues.
- clearCache + a best-effort unpersist sweep between queries (this
  rung measures PER-QUERY scaling; session endurance is
  ENDURANCE_SMOKE's domain).
- the artifact checkpoints after every query, so a wall-clock kill
  still leaves a committed-able partial.

    python scripts/smoke100x.py [/tmp/sf10eq_salted] [OUT.json] \
        [shuffle=256] [budget_sec=600] [only_names...]

Known-heavy keys (the r10 tier) run LAST so the cheap 443 finish first.
"""
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the r10 heavy tier (measured in SCALE_TIER_100X_r10) goes last
HEAVY_LAST = [
    "ext_tfidf_cosine_pairs", "ext_fs_linkage", "ext_dup_threshold_curve",
    "ext_dedup_ngram_jaccard", "ext_pareto_knee", "ext_hoover_index",
    "ext_western_electric", "ext_sax_motifs", "ext_wilcoxon_signed_rank",
    "ext_sim_topk_brute", "ext_sim_topk_lsh", "ext_sim_topk_ivf",
    "ext_sim_topk_pq", "ext_sim_topk_ivfpq", "ext_dedup_embedding_lsh",
    "ext_dedup_minhash", "ext_dedup_simhash", "ext_image_near_dup",
    "ext_theil_sen", "ext_hits", "ext_pagerank",
    "ext_cluster_size_histogram", "ext_dedup_groups",
    "ext_dedup_groups_star", "ext_entity_clusters",
]


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10eq_salted"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/smoke100x.json"
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0
    only = set(sys.argv[5:])

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    spark = get_spark(
        app_name="aircan_smoke100x",
        master="local[32]",
        shuffle_partitions=shuffle,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.read.parquet(f"{big}/lineitem.parquet").count()  # warm FS cache

    names = [n for n in QUERIES if n not in HEAVY_LAST] + [
        n for n in HEAVY_LAST if n in QUERIES
    ]
    if only:
        names = [n for n in names if n in only]

    results: dict = {}
    n_err = n_to = 0
    t_all = time.time()
    for i, name in enumerate(names, 1):
        spark.catalog.clearCache()
        group = f"smoke100x-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        fired = threading.Event()

        def _cancel(g=group, ev=fired):
            ev.set()
            sc.cancelJobGroup(g)

        timer = threading.Timer(budget, _cancel)
        timer.daemon = True
        timer.start()
        t0 = time.perf_counter()
        try:
            n = QUERIES[name](spark, big).count()
            w = round(time.perf_counter() - t0, 1)
            results[name] = {"sec": w, "rows": n}
            tag = " SLOW" if w > budget / 2 else ""
            print(f"[{i}/{len(names)}] {name}: {w}s, {n} rows{tag}", flush=True)
        except Exception as e:  # noqa: BLE001 — smoke: record, continue
            w = round(time.perf_counter() - t0, 1)
            if fired.is_set():
                n_to += 1
                results[name] = {"timeout_sec": w, "budget_sec": budget}
                print(f"[{i}/{len(names)}] {name}: TIMEOUT at {w}s", flush=True)
            else:
                n_err += 1
                msg = f"{type(e).__name__}: {str(e)[:300]}"
                results[name] = {"error": msg, "sec": w}
                print(f"[{i}/{len(names)}] {name}: ERROR {msg}", flush=True)
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "data_dir": big,
                    "scale": "100x salted sf0.1 (sf10-equivalent, distinct contents)",
                    "shuffle_partitions": shuffle,
                    "budget_sec": budget,
                    "n_done": i,
                    "n_total": len(names),
                    "n_errors": n_err,
                    "n_timeouts": n_to,
                    "wall_sec_so_far": round(time.time() - t_all, 1),
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    print(json.dumps({"n": len(names), "errors": n_err, "timeouts": n_to,
                      "wall": round(time.time() - t_all, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
