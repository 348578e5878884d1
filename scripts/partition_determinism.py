#!/usr/bin/env python
"""Partition-count determinism A/B: run every declared query TWICE —
once at shuffle_partitions=5/local[5], once at 32/local[32] — and
bit-compare the two Spark results.

Why: the sweeps compare Spark vs DuckDB under ONE partitioning; the
driver runs its own config. A float column whose value depends on
partition merge order (double SUM accumulation, first()-style
nondeterminism) would be bit-identical within each harness yet diverge
between them — invisible to every existing gate. The registry's
determinism discipline (decimal accumulation before double conversion,
ROUND on outputs, ORDER BY unique keys) is supposed to make results
partitioning-invariant; this script MEASURES that instead of trusting
it, with the same bit-exact comparator the sweeps use
(tests/test_oracle.py:assert_float_bits, all columns compared — float
columns bitwise, the rest by value).

    python scripts/partition_determinism.py [sf_dir] [OUT.json]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import pandas as pd  # noqa: E402


def collect_all(master: str, parts: int, sf: str, only: set | None = None) -> dict:
    """Run every declared query (or the ``only`` subset) on a fresh
    session and return {name: canonicalized pandas frame (or error
    string)}."""
    from test_oracle import canonicalize

    from aircan_spark.queries import QUERIES
    from aircan_spark.session import get_spark

    queries = {
        k: v for k, v in QUERIES.items() if not only or k in only
    }
    spark = get_spark(
        app_name=f"aircan_pdet_{parts}",
        master=master,
        shuffle_partitions=parts,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for i, (name, fn) in enumerate(queries.items(), 1):
        try:
            out[name] = canonicalize(fn(spark, sf).toPandas())
        except Exception as e:  # noqa: BLE001 - record and continue
            out[name] = f"ERROR {type(e).__name__}: {str(e)[:200]}"
        if i % 50 == 0:
            print(f"  [{parts}p {i}/{len(queries)}]", flush=True)
    spark.stop()
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PARTITION_DETERMINISM_r09.json"
    only = set(sys.argv[3:]) or None
    from test_oracle import assert_float_bits

    t0 = time.time()
    a = collect_all("local[5]", 5, sf, only)
    b = collect_all("local[32]", 32, sf, only)
    results: dict = {}
    n_fail = 0
    for name in a:
        ra, rb = a[name], b[name]
        try:
            if isinstance(ra, str) or isinstance(rb, str):
                raise AssertionError(f"run error: {ra if isinstance(ra, str) else rb}")
            assert list(ra.columns) == list(rb.columns), "column mismatch"
            assert len(ra) == len(rb), f"rows {len(ra)} vs {len(rb)}"
            pd.testing.assert_frame_equal(
                ra, rb, check_dtype=False, check_exact=True
            )
            assert_float_bits(ra, rb, name)
            results[name] = "bit_identical"
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            results[name] = f"DIVERGES: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name}: {results[name]}", flush=True)
    artifact = {
        "sf_dir": sf,
        "configs": ["local[5]/5 shuffle partitions", "local[32]/32 shuffle partitions"],
        "n_queries": len(a),
        "n_bit_identical": sum(1 for v in results.values() if v == "bit_identical"),
        "n_diverge": n_fail,
        "wall_sec": round(time.time() - t0, 1),
        "queries": results,
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in artifact.items() if k != "queries"}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
