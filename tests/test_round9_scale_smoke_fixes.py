"""Round-9 salted-30x full-registry smoke findings, pinned.

The smoke (SCALE_SMOKE_30X_SALTED_r09.json) surfaced a class the 10x
verbatim smoke could not: candidate generators whose BUCKET COUNT is
fixed, so occupancy — and candidate volume, and the pair-vector attach
shuffle — grows quadratically with the corpus even at constant
duplication rate. Two crashed outright (ENOSPC spill / stopped
SparkContext): ext_dedup_embedding_lsh (fixed 6-bit hyperplane tables)
and ext_image_near_dup (fixed family modulus 211 made the TRUE planted
answer quadratic; worse, its synthetic dhash space saturates at a few
hundred distinct values, so instance-pair materialization is quadratic
no matter the banding — it now computes the bit-identical histogram in
DISTINCT-HASH-VALUE space weighted by group counts, while the oracle
still materializes instance pairs, making every devcheck/sweep a
cross-formulation equivalence proof). ext_pareto_knee's integer chord
distance cr*nc overflowed int64 (a window-cumsum x count product the
r9 moment-audit scanner missed — it only captured plain sum aliases).

Fix calibration contract (the capped_panel_modulus pattern): adaptive
values equal the HISTORICAL constants at every committed fixture SF, so
declared outputs are unchanged there, and growth is bounded beyond.
"""

import math

import pytest

from aircan_spark.ext.dedup import adaptive_lsh_bits
from aircan_spark.ext.queries_w16 import _image_family_modulus


def test_adaptive_lsh_bits_fixture_invariance_and_growth():
    # committed fixture sizes: 500 vecs (sf0.001/0.01), 2000 (sf0.1)
    assert adaptive_lsh_bits(500, 4) == 4  # recall-test floor unchanged
    assert adaptive_lsh_bits(500, 6) == 6
    assert adaptive_lsh_bits(2000, 6) == 6  # declared query unchanged
    # beyond: occupancy bounded at ~32 at any corpus size
    for n in (60_000, 1_000_000, 20_000_000):
        bits = adaptive_lsh_bits(n, 6)
        assert n / (2**bits) <= 32
        assert bits >= 6
    # the r9 crash point: 60k vecs must NOT stay at 6 bits
    assert adaptive_lsh_bits(60_000, 6) == 11


def test_adaptive_lsh_bits_never_below_floor():
    for n in (2, 10, 100, 10_000):
        assert adaptive_lsh_bits(n, 8) >= 8


def test_image_family_modulus_fixture_invariance_and_linear_density():
    # committed fixture sizes: 50 / 500 / 5000 docs -> historical 211
    for n in (50, 500, 5000):
        assert _image_family_modulus(n) == 211
    # beyond: <= 24 variants per family, so true-pair count ~linear
    for n in (150_000, 5_000_000):
        fm = _image_family_modulus(n)
        assert math.ceil(n / fm) <= 24
    assert _image_family_modulus(150_000) == 6250
    # oracle-formula parity: GREATEST(211, CEIL(n/24.0))
    import duckdb

    for n in (50, 5000, 5064, 5065, 150_000):
        sql_fm = duckdb.sql(
            f"SELECT GREATEST(211, CAST(CEIL({n} / 24.0) AS BIGINT))"
        ).fetchone()[0]
        assert sql_fm == _image_family_modulus(n), n


def test_pareto_knee_chord_distance_survives_sf1000(spark):
    """cr*nc at sf1000 magnitudes: cr ~ 3.75e16 total cents, nc ~ 1.5e8
    customers -> 5.6e24, far past 2^63; the DECIMAL expression must
    produce the exact value."""
    from pyspark.sql import functions as F

    cr, nc, rk, t = 37_500_000_000_000_000, 150_000_000, 1_000_000, 37_500_000_000_000_000
    assert cr * nc > 2**63
    row = spark.createDataFrame([(cr, nc, rk, t)], "cr long, nc long, rk long, t long")
    got = row.select(
        F.expr(
            "CAST(CAST(cr AS DECIMAL(19,0))*nc - CAST(rk AS DECIMAL(19,0))*t"
            " AS DOUBLE)"
        ).alias("d")
    ).collect()[0]["d"]
    assert got == float(cr * nc - rk * t)


@pytest.mark.parametrize(
    "name", ["ext_pareto_knee", "ext_image_near_dup", "ext_dedup_embedding_lsh"]
)
def test_fixed_queries_still_run_at_fixture_sf(name, spark):
    from aircan_spark.queries import QUERIES

    assert QUERIES[name](spark, "/root/testdata/sf0.001").count() >= 1
