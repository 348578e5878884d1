#!/usr/bin/env python
"""Whole-registry value sweep at a chosen scale factor, in ONE pass, with
a JSON artifact: runs every declared query against its DuckDB oracle
using the exact devcheck/test_oracle compare (sorted columns, dtype-kind
check, canonicalized values, atol 1e-9, plus the BIT-exact float pass —
signed zeros and ULP splits fail like they do under the driver's hash)
and writes per-query status + wall time to the artifact path.

    python scripts/sweep_sf.py /root/testdata/sf0.1 SWEEP_SF01_r06.json

Exit code 0 iff every oracled query value-matches and every rows-only
query executes. Non-vacuousness is a HARD invariant: any query returning
0 rows at the sweep SF fails unless annotated in
aircan_spark.queries.ALLOW_EMPTY (see that docstring).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb
import pandas as pd

from aircan_spark.queries import ALLOW_EMPTY, ORACLES, QUERIES
from test_oracle import assert_float_bits, canonicalize, dtype_kind


def guard_result(name: str, got_raw: "pd.DataFrame", allow_empty: dict) -> None:
    """The sweep's two hard result invariants, factored out so tests can
    exercise them BEHAVIORALLY (not via source grep — a grep pin passes
    even if the raise becomes unreachable).

    1. No raw-DECIMAL output columns (round-6 ext_idle_customers find):
       a Spark DECIMAL lands in pandas as Decimal objects whose
       trailing-zero repr diverges from DuckDB's float64 mapping the
       first time the query produces rows.
    2. Non-vacuousness (r6 verdict item #2): a 0-row result proves
       nothing — oracle agreement on empty frames is vacuous. Applies to
       rows-only queries too (their check is even weaker).

    Both are explicit raises, not asserts — python -O strips asserts and
    would silently re-admit the vacuous-pass class."""
    import decimal as _decimal

    for c in got_raw.columns:
        col = got_raw[c]
        if col.dtype == object and len(col.dropna()):
            v = col.dropna().iloc[0]
            if isinstance(v, _decimal.Decimal):
                raise AssertionError(
                    f"column {c!r} outputs raw DECIMAL — cast "
                    "to double/string in the query "
                    "(vacuous-pass trap)"
                )
    if len(got_raw) == 0 and name not in allow_empty:
        raise AssertionError(
            "vacuous result: 0 rows at this SF — rewrite the "
            "predicate to fire on testdata or annotate "
            f"ALLOW_EMPTY[{name!r}] with a reason"
        )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    from aircan_spark.session import get_spark

    spark = get_spark(
        master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
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

    results: dict[str, dict] = {}
    t_start = time.time()
    failed = 0
    for i, name in enumerate(QUERIES, 1):
        t0 = time.time()
        rec: dict = {}
        try:
            got_raw = QUERIES[name](spark, sf).toPandas()
            guard_result(name, got_raw, ALLOW_EMPTY)
            if name not in ORACLES:
                rec = {"status": "rows_only", "rows": len(got_raw)}
            else:
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
                # hard invariant #3 (r8 verdict item #2): float columns must
                # be BIT-exact — atol equality is blind to -0.0 vs +0.0,
                # which is exactly what the driver's hash failed in r8
                assert_float_bits(got, want, name)
                rec = {"status": "values_match", "rows": len(got)}
        except Exception as e:  # noqa: BLE001 - record and continue
            failed += 1
            rec = {"status": "FAIL", "error": f"{type(e).__name__}: {str(e)[:400]}"}
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        print(f"[{i}/{len(QUERIES)}] {name}: {rec['status']} {rec['sec']}s", flush=True)

    artifact = {
        "sf_dir": sf,
        "n_queries": len(QUERIES),
        "n_oracled": sum(1 for n in QUERIES if n in ORACLES),
        "n_values_match": sum(
            1 for r in results.values() if r["status"] == "values_match"
        ),
        "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "n_fail": failed,
        "wall_sec": round(time.time() - t_start, 1),
        "queries": results,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: v for k, v in artifact.items() if k != "queries"}, sort_keys=True
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
