"""Signed-zero canonicalization gate (r8 verdict items #1 and #2).

Round-8 driver postmortem: ``ROUND`` of a tiny negative double keeps the
sign bit in DuckDB and drops it in Spark, so two queries emitted ``-0.0``
on one side and ``+0.0`` on the other — numerically equal, bit-hash
divergent, 2/50 driver checks failed. Fix is two-sided and mechanical:

1. registry-wide canonicalization (aircan_spark/czero.py): every float
   output column gets ``+ 0.0`` appended on BOTH engines;
2. comparator hardening (tests/test_oracle.py:assert_float_bits): the
   sweep/devcheck/test_oracle compare now has a BIT-exact float pass, so
   a planted ``-0.0`` (or any ULP split) fails locally exactly like it
   fails under the driver's hash.

This module pins both, plus the codegen sync of the oracle-side column
map and an sf-independent regression of the two r8-failing queries'
exact expression shape.
"""

import numpy as np
import pandas as pd
import pytest

from aircan_spark.czero import canonicalize_floats, czero_sql
from test_oracle import assert_float_bits, canonicalize


def _signbit(x) -> bool:
    return bool(np.signbit(x))


# --- 1. the comparator must SEE a planted -0.0 --------------------------------


def test_planted_negative_zero_fails_the_comparator():
    got = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    want = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    # the old atol compare is blind to it — that blindness is WHY three
    # committed r8 sweeps were green while the driver failed
    pd.testing.assert_frame_equal(
        canonicalize(got), canonicalize(want), check_dtype=False, atol=1e-9
    )
    with pytest.raises(AssertionError, match="BIT-exact"):
        assert_float_bits(canonicalize(got), canonicalize(want), "planted")


def test_ulp_split_fails_the_comparator():
    a, b = 0.1 + 0.2, 0.3  # classic 1-ULP pair
    assert a != b
    with pytest.raises(AssertionError, match="BIT-exact"):
        assert_float_bits(
            pd.DataFrame({"v": [a]}), pd.DataFrame({"v": [b]}), "ulp"
        )


def test_bitexact_pass_allows_nan_and_null():
    df = pd.DataFrame({"v": [np.nan, 1.0, None]}, dtype="float64")
    assert_float_bits(df, df.copy(), "nan")


# --- 2. the Spark-side wrapper canonicalizes every float shape ----------------


def test_spark_wrapper_canonicalizes_all_float_shapes(spark):
    def fn(spark_, sf_dir_):
        return spark_.sql(
            "SELECT 1 AS k, CAST(-0.0 AS DOUBLE) AS d,"
            " CAST(-0.0 AS FLOAT) AS f,"
            " array(CAST(-0.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS ad,"
            " array(CAST(-0.0 AS FLOAT)) AS af,"
            " CAST('x' AS STRING) AS s"
        )

    out = canonicalize_floats(fn)(spark, "unused").toPandas()
    assert not _signbit(out["d"][0])
    assert not _signbit(out["f"][0])
    ad1 = out["ad"][0][1]  # NULL element: None or nan depending on arrow path
    assert not _signbit(out["ad"][0][0]) and (ad1 is None or np.isnan(ad1))
    assert not _signbit(out["af"][0][0])
    assert out["s"][0] == "x" and out["k"][0] == 1
    # schema unchanged: names, order, and float width survive the wrap
    sch = canonicalize_floats(fn)(spark, "unused").schema
    assert [f.name for f in sch.fields] == ["k", "d", "f", "ad", "af", "s"]
    assert sch["f"].dataType.simpleString() == "float"
    assert sch["af"].dataType.simpleString() == "array<float>"


def test_spark_wrapper_is_noop_without_float_columns(spark):
    def fn(spark_, sf_dir_):
        return spark_.sql("SELECT 1 AS k, 'a' AS s")

    wrapped = canonicalize_floats(fn)
    df = wrapped(spark, "unused")
    # identical plan: no Project is appended when nothing needs wrapping
    assert df is wrapped.__wrapped_query__(spark, "unused") or (
        df.toPandas().equals(fn(spark, "unused").toPandas())
    )


def test_spark_wrapper_not_folded_by_catalyst(spark):
    """Catalyst must keep the `+ 0.0` — if an optimizer rule ever starts
    folding float `x + 0.0` to `x`, the canonicalization silently dies.
    Feed a genuine runtime -0.0 (not a literal) through the wrap."""

    def fn(spark_, sf_dir_):
        df = spark_.createDataFrame([(-1e-300,)], "x double")
        return df.select((df["x"] * 1e-300).alias("v"))  # underflows to -0.0

    raw = fn(spark, "unused").toPandas()
    assert _signbit(raw["v"][0])  # the trap is armed
    out = canonicalize_floats(fn)(spark, "unused").toPandas()
    assert out["v"][0] == 0.0 and not _signbit(out["v"][0])


# --- 3. the DuckDB-side wrap canonicalizes and preserves everything else ------


def test_duckdb_wrap_canonicalizes():
    import duckdb

    sql = "SELECT 1 AS k, ROUND(-1e-9, 6) AS v, 'x' AS s"
    wrapped = czero_sql(sql, [("k", "keep"), ("v", "f64"), ("s", "keep")])
    out = duckdb.sql(wrapped).df()
    raw = duckdb.sql(sql).df()
    assert _signbit(raw["v"][0])  # DuckDB really keeps the sign (the r8 bug)
    assert not _signbit(out["v"][0])
    assert out["k"][0] == 1 and out["s"][0] == "x"
    assert list(out.columns) == ["k", "v", "s"]


def test_duckdb_wrap_list_and_real_actions():
    import duckdb

    sql = (
        "SELECT [ROUND(-1e-9, 6), NULL] AS ad,"
        " CAST(-0.0 AS REAL) AS f,"
        " [CAST(-0.0 AS REAL)] AS af"
    )
    wrapped = czero_sql(
        sql, [("ad", "f64list"), ("f", "f32"), ("af", "f32list")]
    )
    out = duckdb.sql(wrapped)
    types = dict(zip(out.columns, [str(t) for t in out.types]))
    assert types == {"ad": "DOUBLE[]", "f": "FLOAT", "af": "FLOAT[]"}
    row = out.fetchall()[0]
    assert not _signbit(row[0][0]) and row[0][1] is None
    assert not _signbit(row[1])
    assert not _signbit(row[2][0])


def test_czero_sql_rejects_unknown_action():
    with pytest.raises(ValueError, match="unknown action"):
        czero_sql("SELECT 1 AS a", [("a", "decimal")])


# --- 4. the codegen'd oracle column map cannot drift --------------------------


def test_floatcols_map_matches_live_describe():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from gen_floatcols import derive_map

    from aircan_spark._floatcols import FLOAT_WRAP

    live = derive_map()
    assert live == FLOAT_WRAP, (
        "aircan_spark/_floatcols.py is stale — an oracle changed shape; "
        "re-run `python scripts/gen_floatcols.py`"
    )


def test_registry_is_fully_wrapped():
    """Every declared Spark callable rides the czero wrap, and every
    oracle with a float output column carries the SQL-side wrap."""
    from aircan_spark._floatcols import FLOAT_WRAP
    from aircan_spark.queries import ORACLES, QUERIES

    for name, fn in QUERIES.items():
        assert getattr(fn, "__czero__", False), f"{name}: unwrapped callable"
    for name in FLOAT_WRAP:
        assert "__czero" in ORACLES[name], f"{name}: oracle missing czero wrap"


# --- 5. regression: the exact r8 failure shape, both engines ------------------


def test_r8_round_of_tiny_negative_is_canonical_on_both_engines(spark):
    """The precise r8 defect: ROUND(tiny negative, 6) — DuckDB keeps the
    sign, Spark drops it; after the registry wrap both sides emit +0.0.
    (ext_quality_logit's logit and ext_mediation_effect's
    indirect_effect are instances of this expression shape; their full
    sf0.01 re-verification is the driver's CORRECTNESS_r09 front-of-
    rotation check.)"""
    import duckdb

    def fn(spark_, sf_dir_):
        df = spark_.createDataFrame([(-1e-9,)], "x double")
        return df.select(F.expr("ROUND(x, 6)").alias("v"))

    from pyspark.sql import functions as F  # noqa: F811

    spark_v = canonicalize_floats(fn)(spark, "unused").toPandas()["v"][0]
    duck_v = duckdb.sql(
        czero_sql("SELECT ROUND(-1e-9, 6) AS v", [("v", "f64")])
    ).df()["v"][0]
    for v in (spark_v, duck_v):
        assert v == 0.0 and not _signbit(v)
    a = np.array([spark_v, duck_v])
    assert a.view(np.int64)[0] == a.view(np.int64)[1], "bit patterns differ"
