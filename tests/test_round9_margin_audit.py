"""Round-9 moment-overflow margin audit: regression pins for the five
queries whose int64 moment math lacked 10x headroom past the sf1000
(100 TB) design point (see PERFORMANCE.md "r9 moment-overflow margin
audit" for the full per-query magnitude table):

- ext_sax_motifs / ext_western_electric: SUM(c^2) of daily cent sums
  (c ~ 1.7e8*SF) crossed 2^63 at ~sf3.3;
- ext_hoover_index: SUM(|n*y - yt|) ~ n^2 * y_avg crossed at ~sf175;
- ext_cronbach_alpha_weekday: u*sst and st*st ~ 1e18 at sf1000 (9x);
- ext_slope_heterogeneity: SUM(y^2) ~ 1.7e18 at sf1000 (5.4x).

Each fix moves exactly the over-margin operation to DECIMAL(19/38) on
the Spark side and HUGEINT in the DuckDB oracle (the ext_bullwhip /
ext_partial_correlation pattern) — same exact integers, same final
double conversion, fixture outputs bit-identical (devcheck green at
sf0.001/0.01/0.1). These tests feed each fixed expression a moment row
PAST the old int64 trap and pin the exact value on BOTH engines.
"""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F


def _bit_equal(a: float, b: float) -> bool:
    return np.array([a]).view(np.int64)[0] == np.array([b]).view(np.int64)[0]


def test_daily_cents_squared_moment_survives_sf1000(spark):
    """The sax/western SUM(c*c) shape: 30 daily cent sums at sf1000
    magnitude (~1.7e11 each; exact sum of squares 8.7e23 >> 2^63).
    Alternating 1.6e11/1.8e11 gives variance exactly 1e20 and z = +/-1."""
    c_lo, c_hi, days = 160_000_000_000, 180_000_000_000, 30
    s2_exact = (days // 2) * (c_lo * c_lo + c_hi * c_hi)
    assert s2_exact > 2**63  # the raw-int64 trap the r9 fix removes
    df = spark.createDataFrame(
        [(i, c_lo if i % 2 == 0 else c_hi) for i in range(days)], "d int, c long"
    )
    mo = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(
            F.expr("CAST(c AS DECIMAL(19,0))*CAST(c AS DECIMAL(19,0))")
        ).alias("s2"),
    )
    z = (
        df.join(F.broadcast(mo))
        .select(
            F.expr(
                "(c - CAST(s1 AS DOUBLE)/n)"
                "/SQRT(CAST(s2 AS DOUBLE)/n"
                " - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))"
            ).alias("z")
        )
        .collect()
    )
    for row in z:
        assert math.isclose(abs(row["z"]), 1.0, rel_tol=1e-9), row
    # oracle side: HUGEINT path produces the bit-identical s2 double
    duck = duckdb.sql(
        "SELECT CAST(SUM(CAST(c AS HUGEINT)*CAST(c AS HUGEINT)) AS DOUBLE) AS s2 "
        f"FROM (SELECT CASE WHEN i % 2 = 0 THEN {c_lo} ELSE {c_hi} END AS c "
        f"      FROM generate_series(1, {days}) t(i))"
    ).fetchone()[0]
    spark_s2 = mo.select(F.expr("CAST(s2 AS DOUBLE)").alias("v")).collect()[0]["v"]
    assert _bit_equal(duck, spark_s2) and duck == float(s2_exact)


def test_hoover_absdev_combination_survives_sf1000(spark):
    """The hoover SUM(|n*y - yt|) shape with a single term already past
    2^63: n = 4e9 customers, y = 2.5e9 -> n*y = 1e19. Two symmetric
    deviations around yt give an exact known absdev."""
    n, y_lo, y_hi = 4_000_000_000, 2_400_000_000, 2_600_000_000
    yt = y_lo + y_hi  # two "customers"
    assert n * y_lo > 2**63
    df = spark.createDataFrame([(y_lo,), (y_hi,)], "y long")
    got = (
        df.agg(
            F.sum(
                F.expr(
                    f"ABS(CAST({n} AS DECIMAL(19,0))*y - CAST({yt} AS LONG))"
                )
            ).alias("absdev")
        )
        .select(F.expr("CAST(absdev AS DOUBLE)").alias("v"))
        .collect()[0]["v"]
    )
    exact = abs(n * y_lo - yt) + abs(n * y_hi - yt)
    duck = duckdb.sql(
        f"SELECT CAST(SUM(ABS(CAST({n} AS HUGEINT)*y - {yt})) AS DOUBLE) "
        f"FROM (SELECT UNNEST([{y_lo}, {y_hi}]) AS y)"
    ).fetchone()[0]
    assert _bit_equal(got, duck) and got == float(exact)


def test_cronbach_total_var_combination_survives_sf1000(spark):
    """The cronbach u*sst - st*st shape at past-trap magnitudes:
    u = 4e9 subjects, sst = 4.5e9, st = 2.5e9 -> u*sst = 1.8e19 > 2^63."""
    u, sst, st = 4_000_000_000, 4_500_000_000, 2_500_000_000
    assert u * sst > 2**63
    row = spark.createDataFrame([(u, sst, st)], "u long, sst long, st long")
    got = row.select(
        F.expr(
            "CAST(CAST(u AS DECIMAL(19,0))*sst"
            " - CAST(st AS DECIMAL(19,0))*st AS DOUBLE)"
        ).alias("v")
    ).collect()[0]["v"]
    exact = u * sst - st * st
    duck = duckdb.sql(
        f"SELECT CAST(CAST({u} AS HUGEINT)*{sst} - CAST({st} AS HUGEINT)*{st} AS DOUBLE)"
    ).fetchone()[0]
    assert _bit_equal(got, duck) and got == float(exact)


def test_slope_het_syy_moment_survives_sf1000(spark):
    """The slope-heterogeneity SUM(y*y) shape: per-user cent totals at
    a magnitude whose squared sum passes 2^63 within few rows."""
    y, rows = 3_200_000_000, 10
    exact = rows * y * y
    assert exact > 2**63
    df = spark.createDataFrame([(y,)] * rows, "y long")
    got = (
        df.agg(
            F.sum(
                F.expr("CAST(y AS DECIMAL(19,0))*CAST(y AS DECIMAL(19,0))")
            ).alias("syy")
        )
        .select(F.expr("CAST(syy AS DOUBLE)").alias("v"))
        .collect()[0]["v"]
    )
    assert got == float(exact)


@pytest.mark.parametrize(
    "name",
    [
        "ext_sax_motifs",
        "ext_western_electric",
        "ext_hoover_index",
        "ext_cronbach_alpha_weekday",
        "ext_slope_heterogeneity",
    ],
)
def test_fixed_queries_still_match_fixtures(name, spark):
    """The five rewritten queries still run and produce rows at sf0.001
    (value parity vs the oracle is tests/test_oracle.py's job — this is
    the cheap smoke that the DECIMAL rewrite didn't break construction)."""
    from aircan_spark.queries import QUERIES

    assert QUERIES[name](spark, "/root/testdata/sf0.001").count() >= 1
