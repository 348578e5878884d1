"""Round-10 window-moment margin audit (the ext_pareto_knee lesson,
operationalized): scripts/window_moment_audit.py scans every
window-carried integer aggregate for un-widened downstream integer
products; the r10 sweep audited all 30 flagged sites by magnitude at the
sf1000 design point (PERFORMANCE.md round-10 table). One over-margin hit:

- ext_wilcoxon_signed_rank's CUBIC tie term SUM(cnt^3 - cnt): cnt is the
  number of users sharing one |d| value, distribution-dependent with a
  worst case of n^3 = 3.4e21 at sf1000 (past 2^63 once ~2.1e6 of the
  1.5e7 users share a value — a peaked cent-difference distribution,
  i.e. exactly the duplicate-heavy shape a 100 TB corpus has). Moved to
  DECIMAL(19->38) on the Spark side / HUGEINT in the oracle; same exact
  integers, same final double conversion, fixture outputs bit-identical
  (devcheck green at sf0.001/0.01/0.1).

This test feeds the fixed expression tie counts PAST the old int64 trap
and pins the exact tie term on both engines.
"""

import duckdb
import numpy as np
from pyspark.sql import functions as F


def _bit_equal(a: float, b: float) -> bool:
    return np.array([a]).view(np.int64)[0] == np.array([b]).view(np.int64)[0]


def test_wilcoxon_cubic_tie_term_survives_peaked_sf1000(spark):
    # two hot |d| values holding 3e6 users each (cube 2.7e19 > 2^63 per
    # TERM) plus a unique-value tail
    cnt_hot, n_tail = 3_000_000, 5
    exact = 2 * (cnt_hot**3 - cnt_hot) + n_tail * (1**3 - 1)
    assert cnt_hot**3 > 2**63  # the raw-int64 trap the r10 fix removes
    rows = [(1, cnt_hot), (2, cnt_hot)] + [(10 + i, 1) for i in range(n_tail)]
    df = spark.createDataFrame(rows, "ad long, cnt long")
    got = df.agg(
        F.sum(F.expr("CAST(cnt AS DECIMAL(19,0))*cnt*cnt - cnt")).alias("tie")
    ).select(F.expr("CAST(tie AS DOUBLE)").alias("v"))
    spark_v = got.collect()[0]["v"]
    assert spark_v == float(exact)
    vals = ", ".join(f"({ad}, {cnt})" for ad, cnt in rows)
    duck = duckdb.sql(
        "SELECT CAST(SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS DOUBLE) "
        f"FROM (VALUES {vals}) t(ad, cnt)"
    ).fetchone()[0]
    assert _bit_equal(duck, spark_v)


def test_window_moment_scanner_flags_the_uncast_cubic():
    """The scanner must keep finding the pre-fix shape: a synthetic
    source with a window count whose alias is later cubed un-cast is
    flagged; the DECIMAL form is not."""
    import importlib.util
    import os
    import tempfile

    spec = importlib.util.spec_from_file_location(
        "wma", os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "window_moment_audit.py")
    )
    wma = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wma)

    bad = (
        'x = F.sum("c").over(w).alias("cc")\n'
        'y = F.expr("cc*cc*cc - cc")\n'
    )
    good = (
        'x = F.sum("c").over(w).alias("cc")\n'
        'y = F.expr("CAST(cc AS DECIMAL(19,0))*cc*cc - cc")\n'
    )
    for src, expect in ((bad, 1), (good, 0)):
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(src)
            path = f.name
        try:
            sites = list(wma.window_sites(path))
            assert len(sites) == 1
            lineno, _kind, _arg, alias, _line = sites[0]
            assert alias == "cc"
            assert len(wma.integer_products(path, alias, lineno)) == expect
        finally:
            os.unlink(path)
