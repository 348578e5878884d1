#!/usr/bin/env python
"""Full-registry scale smoke: execute EVERY declared query end-to-end
(noop sink, no oracle) against a bigger-than-fixture data dir and record
per-query wall + any error, with the ratio against a reference per-query
map (a committed bench_queries.json). The point is coverage: the family
curves (dedup / ANN / graph) sample a dozen queries each, but only a
whole-registry pass proves that NO query crashes or goes super-linear at
10x — this is the run that caught ext_modularity's quadratic panel, two
ANSI divide-by-zero crashes on duplicate-heavy corpora
(ext_intrinsic_dim, ext_lof) and ext_interarrival_cv's BIGINT moment
overflow, all invisible at fixture SFs.

    python scripts/scale_smoke.py /tmp/sf1eq OUT.json [REF_MAP.json]

Unlike bench.py (the driver's timing contract — it must NOT swallow
errors), a failed query here is recorded and the smoke continues: the
artifact's `errors` map is the finding, not a crash.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1eq"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_smoke.json"
    ref_path = sys.argv[3] if len(sys.argv) > 3 else None

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    def _fresh_session():
        spark = get_spark(
            app_name="aircan_scale_smoke",
            master="local[32]",
            shuffle_partitions=32,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.read.parquet(f"{big_dir}/lineitem.parquet").count()
        return spark

    spark = _fresh_session()

    ref = {}
    if ref_path:
        with open(ref_path) as fh:
            ref = json.load(fh).get("queries_warm") or {}

    secs: dict[str, float] = {}
    errors: dict[str, str] = {}
    n = len(QUERIES)
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        # Restart the session every 100 queries: at 10x data the
        # leftover per-query state (localCheckpoint blocks awaiting
        # ContextCleaner GC, broadcast vars) is 10x bigger too, and a
        # single 8g local JVM eventually OOMs on ACCUMULATION rather
        # than on any one query (observed at query ~230 on the first
        # run; every query in the failing stretch passes standalone).
        # Session endurance is bench.py's domain at sf0.1; this smoke
        # measures PER-QUERY scale behavior.
        if i % 100 == 1 and i > 1:
            spark.stop()
            spark = _fresh_session()
        else:
            # r9 finding: persisted frames left behind by earlier queries
            # contend for execution memory at bigger data — at salted-30x
            # ext_dedup_groups died UNABLE_TO_ACQUIRE_MEMORY mid-session
            # yet runs 320s clean standalone (= r7's dedicated-session
            # number). The measurand here is PER-QUERY scale behavior, so
            # drop cross-query cache state; session endurance stays
            # bench.py's domain at sf0.1.
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            # two passes: cold compiles the plan; the recorded number is
            # the WARM re-execution (steady-state), matching the
            # reference map's queries_warm
            df = fn(spark, big_dir)
            df.write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            secs[name] = round(time.perf_counter() - t0, 3)
            status = f"{secs[name]}s"
        except Exception as exc:  # record and continue — coverage is the point
            errors[name] = f"{type(exc).__name__}: {str(exc)[:400]}"
            status = "ERROR " + errors[name][:80]
        print(f"[{i}/{n}] {name}: {status}", flush=True)

    ratios = {
        k: round(v / max(ref[k], 1e-3), 2) for k, v in secs.items() if k in ref
    }
    art = {
        "big_dir": big_dir,
        "ref": ref_path,
        "n_queries": n,
        "n_ok": len(secs),
        "n_errors": len(errors),
        "errors": errors,
        "secs": secs,
        "ratio_vs_ref": ratios,
        "top_ratios": dict(
            sorted(ratios.items(), key=lambda kv: -kv[1])[:20]
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(json.dumps({k: art[k] for k in ("n_queries", "n_ok", "n_errors")}))


if __name__ == "__main__":
    main()
