"""Round-4 guard tests: the degenerate-input and driver-memory guards
added to the round-3 statistical operators (VERDICT r03 #8 + ADVICE
items). Value-level equivalence vs DuckDB stays in tests/test_oracle.py;
these pin the failure modes the guards exist for."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kmv_minima_filters_null_items(spark):
    """A NULL item hashes to NULL, which Spark's ascending row_number
    would rank FIRST — kmv_minima must drop it inside the library so a
    NULL can never consume a sketch slot or skew the k-th minimum."""
    from aircan_spark.ext import sketch as sk

    rows = [("g", str(i)) for i in range(8)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, item string")
    minima = sk.kmv_minima(df, "item", ["g"], k=16).collect()
    assert len(minima) == 8  # 8 real distinct items, zero NULL slots
    assert all(r["h"] is not None for r in minima)
    # estimate path: small group is exact, NULLs invisible
    est = sk.kmv_estimates(
        sk.kmv_minima(df, "item", ["g"], k=16), ["g"], k=16
    ).collect()[0]
    assert est["kmv_distinct"] == 8.0


def test_theil_sen_median_degenerate_inputs(spark):
    from aircan_spark.ext.queries import _theil_sen_median

    empty = spark.createDataFrame([], "s double")
    assert _theil_sen_median(empty) == (0, None)

    all_null = spark.createDataFrame([(None,), (None,)], "s double")
    assert _theil_sen_median(all_null) == (0, None)

    constant = spark.createDataFrame([(4.5,)] * 7, "s double")
    assert _theil_sen_median(constant) == (7, 4.5)

    single = spark.createDataFrame([(2.25,)], "s double")
    assert _theil_sen_median(single) == (1, 2.25)


def test_theil_sen_median_budget_fallback_matches_percentile(spark):
    """A distribution concentrated in one histogram bucket (tight center,
    extreme outliers setting the range) must NOT be collected unboundedly:
    with the budget exceeded the selection REFINES into the hot bucket
    (round-7: iterative re-histogram, the regime the sf0.1 corpus
    actually hits) and still returns the bit-identical value; with
    refinement disabled (max_refine=0) it falls back to the exact
    percentile() aggregate — also identical."""
    from aircan_spark.ext.queries import _theil_sen_median

    # 999 values in [0, 1e-9) — all land in bucket 0 of a range stretched
    # to 1e6 by a single outlier — plus that outlier
    vals = [(i * 1e-12,) for i in range(999)] + [(1e6,)]
    df = spark.createDataFrame(vals, "s double").cache()
    exact = df.agg(F.expr("percentile(s, 0.5)").alias("m")).collect()[0]["m"]
    n, med_refined = _theil_sen_median(df, budget=100)  # refinement path
    n2, med_normal = _theil_sen_median(df)  # single-level path
    n3, med_fallback = _theil_sen_median(df, budget=100, max_refine=0)
    assert n == n2 == n3 == 1000
    assert med_refined == exact
    assert med_normal == exact
    assert med_fallback == exact


def test_theil_sen_median_refinement_depth_and_duplicate_wall(spark):
    """Two refinement edge cases: (a) a distribution needing MULTIPLE
    levels still matches percentile() exactly; (b) a duplicate-heavy
    center where the window collapses to one value (mn == mx inside the
    hot bucket) short-circuits to that value."""
    from aircan_spark.ext.queries import _theil_sen_median

    # (a) three nested scales: outlier at 1e6, cluster at 1e-3 spread
    # 1e-9 apart — bucket at level 1 holds everything, level 2 isolates
    vals = [((i % 50) * 1e-9 + 1e-3,) for i in range(400)] + [(1e6,)]
    df = spark.createDataFrame(vals, "s double").cache()
    exact = df.agg(F.expr("percentile(s, 0.5)").alias("m")).collect()[0]["m"]
    n, med = _theil_sen_median(df, budget=60)
    assert n == 401 and med == exact

    # (b) median bucket is a single repeated value + range-stretching
    # outliers on both sides
    vals = [(7.25,)] * 500 + [(-1e9,), (1e9,)]
    df2 = spark.createDataFrame(vals, "s double").cache()
    n, med = _theil_sen_median(df2, budget=100)
    assert n == 502 and med == 7.25


def test_markov_attribution_zero_conversions_empty_frame(spark, tmp_path):
    """A corpus with no purchase events has p_base = 0: removal effects
    are 0/0-undefined, so the operator emits an empty frame instead of
    raising ZeroDivisionError driver-side (oracle mirrors via its
    p_base > 0 guard)."""
    from aircan_spark.ext.queries import ext_markov_attribution

    ev = spark.read.parquet(SF + "/events.parquet")
    ev.filter(F.col("event_type") != "purchase").write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = ext_markov_attribution(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == [
        "channel",
        "p_conv_base",
        "p_conv_without",
        "removal_effect",
        "attribution_share",
    ]


def test_friedman_levene_critical_values_derived_from_k(spark):
    """The decision flags test against a critical value DERIVED from the
    observed cardinality (chi2(k-1) for Friedman, chi2(k-1)/(k-1) for
    Brown-Forsythe), so a non-5 cardinality can no longer silently test
    against the df=4 constant; beyond df=10 the flag refuses (NULL)."""
    from aircan_spark.ext.queries import (
        _chi2_crit_95_expr,
        ext_friedman,
        ext_levene,
    )

    probe = spark.range(1).select(
        _chi2_crit_95_expr(F.lit(2)).alias("df2"),
        _chi2_crit_95_expr(F.lit(4)).alias("df4"),
        _chi2_crit_95_expr(F.lit(11)).alias("df11"),
    ).collect()[0]
    assert probe["df2"] == 5.991
    assert probe["df4"] == 9.488
    assert probe["df11"] is None

    fr = ext_friedman(spark, SF).collect()[0]
    assert fr["complete_blocks"] is True  # design checked, not assumed
    assert fr["chi2_crit"] == 9.488  # k=5 event types -> df=4
    lv = ext_levene(spark, SF).collect()[0]
    assert lv["f_crit"] == pytest.approx(9.488 / 4)  # k=5 segments


def test_checkpoint_reliable_mode_opt_in(spark, tmp_path):
    """aircan_spark.data.checkpoint: localCheckpoint by default (no
    filesystem needed), RELIABLE df.checkpoint() once a checkpoint dir is
    configured — the fault-tolerance requirement for iterative operators
    on a real cluster (localCheckpoint blocks die with their executor)."""
    from aircan_spark.data import checkpoint
    from aircan_spark.ext import graph

    sc = spark.sparkContext
    # default mode: works with NO checkpoint dir configured
    assert checkpoint(spark.range(10)).count() == 10
    sc.setCheckpointDir(str(tmp_path))
    try:
        assert checkpoint(spark.range(10)).count() == 10
        # reliable blocks actually persisted under the configured dir
        assert any(p.is_file() for p in tmp_path.rglob("*"))
        # an iterative operator end-to-end in reliable mode
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        depths = {
            r["id"]: r["depth"] for r in graph.bfs_depths(edges, 1).collect()
        }
        assert depths == {1: 0, 2: 1, 3: 2}
    finally:
        # unset so later tests keep fast executor-local checkpoints
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
