#!/usr/bin/env python
"""Developer harness: value-check named declared queries against their
DuckDB oracles at a chosen scale factor — the exact compare the round
driver and tests/test_oracle.py run, callable per-query while iterating.

    python scripts/devcheck.py /root/testdata/sf0.001 ext_foo ext_bar
    python scripts/devcheck.py /root/testdata/sf0.1 ext_foo   # sf0.1 smoke

Protocol reminder (ROUND_NOTES lessons): check every NEW query at
sf0.001 AND sf0.01 AND sf0.1 — ANSI overflows and blank-group classes
only appear at the larger scales, and the driver compares at sf0.01.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb
import pandas as pd

from aircan_spark.queries import ORACLES, QUERIES
from test_oracle import assert_float_bits, canonicalize, dtype_kind


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    from aircan_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            got_raw = QUERIES[name](spark, sf).toPandas()
            if name not in ORACLES:
                print(f"{name}: rows-only, {len(got_raw)} rows, {time.time()-t0:.1f}s")
                continue
            want_raw = con.sql(ORACLES[name]).df()
            got_raw = got_raw.reindex(sorted(got_raw.columns), axis=1)
            want_raw = want_raw.reindex(sorted(want_raw.columns), axis=1)
            assert list(got_raw.columns) == list(want_raw.columns), (
                f"cols {list(got_raw.columns)} vs {list(want_raw.columns)}"
            )
            km = {
                c: (dtype_kind(got_raw[c]), dtype_kind(want_raw[c]))
                for c in got_raw.columns
                if "?" not in (dtype_kind(got_raw[c]), dtype_kind(want_raw[c]))
                and dtype_kind(got_raw[c]) != dtype_kind(want_raw[c])
            }
            assert not km, f"dtype-kind mismatch {km}"
            got, want = canonicalize(got_raw), canonicalize(want_raw)
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            assert_float_bits(got, want, name)
            print(f"{name}: OK {len(got)} rows, {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 - report and continue
            failed += 1
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:1200]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
