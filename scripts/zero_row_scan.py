"""Rows-only scan: run every declared query at a given SF dir and report
the keys that return 0 rows (the vacuous-pass class the sweep now
hard-fails). Usage: python scripts/zero_row_scan.py /root/testdata/sf0.01
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aircan_spark.queries import QUERIES  # noqa: E402
from aircan_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    t0 = time.time()
    zeros, errs = [], []
    for i, (name, fn) in enumerate(QUERIES.items()):
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
            continue
        if n == 0:
            zeros.append(name)
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(QUERIES)} ({time.time() - t0:.0f}s)", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "zeros": zeros, "errors": errs,
                      "total": len(QUERIES), "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
