"""Invariant pins for the round-6 waves: the registry collision guard,
the un-shadowed weekday Cronbach variant, and properties of the new
streaming-sketch batch-parity and sqlapi-text queries that the DuckDB
value-compare cannot express.
"""

import pytest
from pyspark.sql import functions as F

from aircan_spark.ext import queries as Q
from aircan_spark.ext._qcommon import _Registry


def _rows(spark, sf_dir, name):
    return Q.EXT_QUERIES[name](spark, sf_dir).collect()


def test_registry_rejects_duplicate_keys():
    """Round-5 defect class: a later wave silently shadowing an earlier
    wave's key (ext_cronbach_alpha). The registry must now raise on any
    re-registration, via both __setitem__ and update()."""
    r = _Registry()
    r["a"] = 1
    with pytest.raises(KeyError, match="duplicate ext-query registry key"):
        r["a"] = 2
    with pytest.raises(KeyError, match="duplicate"):
        r.update({"b": 1, "a": 3})
    assert r["a"] == 1  # original binding survives the refused update


def test_both_cronbach_variants_registered_and_distinct():
    """The w10 weekday variant and the w29 per-type-spend variant are
    BOTH reachable under distinct keys, in both registries."""
    assert "ext_cronbach_alpha" in Q.EXT_QUERIES
    assert "ext_cronbach_alpha_weekday" in Q.EXT_QUERIES
    assert "ext_cronbach_alpha" in Q.EXT_ORACLES
    assert "ext_cronbach_alpha_weekday" in Q.EXT_ORACLES
    assert (
        Q.EXT_QUERIES["ext_cronbach_alpha"]
        is not Q.EXT_QUERIES["ext_cronbach_alpha_weekday"]
    )


def test_stream_cms_state_ran_multiple_batches_and_conserves_mass(spark, sf_dir, tmp_path, monkeypatch):
    """The X460 parity query must exercise REAL multi-batch maintenance:
    2 staged files + maxFilesPerTrigger=1 => the committed pointer's
    batch_id is 1 (batch 0 initializes, batch 1 MERGES through the
    atomic pointer), and the sketch conserves mass — every CMS row's
    total count equals the non-null item count."""
    import json
    import os

    from aircan_spark.ext.queries_w46 import _shared_sketch_states

    rows = _rows(spark, sf_dir, "ext_stream_cms_state")
    # r8: the CMS rides the SHARED five-maintainer stream — resolve its
    # state dir through the process cache (also proves the query and the
    # cache agree on where the committed state lives)
    state_dir = _shared_sketch_states(spark, sf_dir)["cms"]
    with open(os.path.join(state_dir, "_current.json")) as fh:
        pointer = json.load(fh)
    # 2 one-file micro-batches, 0-indexed — exactly pins n_files=2 AND
    # guarantees >=1 real merge into stored state
    assert pointer["batch_id"] == 1
    n_items = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("user_id IS NOT NULL")
        .count()
    )
    for r in range(3):
        assert sum(x["cnt"] for x in rows if x["row"] == r) == n_items


def test_stream_hll_state_register_bounds(spark, sf_dir):
    """HLL registers: reg in [0, 1024), max_rho in [1, 51] (rho = 51 -
    bitlength of a 50-bit window, 51 when the window is 0)."""
    rows = _rows(spark, sf_dir, "ext_stream_hll_state")
    assert rows and len(rows) <= 1024
    assert all(0 <= r["reg"] < 1024 for r in rows)
    assert all(1 <= r["max_rho"] <= 51 for r in rows)


def test_stream_bottomk_state_is_global_minimum_set(spark, sf_dir):
    """The maintained bottom-k sample must be EXACTLY the k smallest
    hashes of the whole corpus — the min-k-of-union merge law."""
    from pyspark.sql import functions as F

    rows = _rows(spark, sf_dir, "ext_stream_bottomk_state")
    assert len(rows) == 100
    got = {r["o_orderkey"] for r in rows}
    want = {
        r["o_orderkey"]
        for r in (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(
                "o_orderkey",
                F.md5(F.concat_ws("-", F.lit("42"), F.col("o_orderkey").cast("string"))).alias("h"),
            )
            .orderBy("h")
            .limit(100)
            .collect()
        )
    }
    assert got == want


def test_stream_kmv_state_per_group_capped_and_sorted(spark, sf_dir):
    """Grouped KMV minima: at most k=64 hashes per event_type, all
    distinct, and each group's set is a prefix of the sorted hash axis
    (minima, not arbitrary k)."""
    rows = _rows(spark, sf_dir, "ext_stream_kmv_state")
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["h"])
    assert by_type
    for t, hs in by_type.items():
        assert len(hs) <= 64
        assert len(set(hs)) == len(hs)
        assert all(0 <= h < (1 << 48) for h in hs)


def test_sqltext_family_oracle_is_the_same_string():
    """The zero-drift contract of the SQL-text family: each key's DuckDB
    oracle IS the exact string fed to spark.sql — not a rewrite."""
    from aircan_spark.ext.queries_w47 import SQLTEXT_QUERIES

    assert len(SQLTEXT_QUERIES) == 5
    for name, sql_text in SQLTEXT_QUERIES.items():
        assert Q.EXT_ORACLES[name] is sql_text


def test_sqltext_window_rank_totals_consistent(spark, sf_dir):
    """The windowed grand total must equal the sum of the per-type
    counts on every row, and ranks must start at 1."""
    rows = _rows(spark, sf_dir, "ext_sqltext_window_rank")
    total = sum(r["n_events"] for r in rows)
    assert all(r["total_events"] == total for r in rows)
    assert min(r["volume_rank"] for r in rows) == 1


def test_sqltext_rollup_grand_total_matches_leaves(spark, sf_dir):
    """ROLLUP conservation: the (ALL, ALL) super-aggregate equals the
    sum of the leaf (region, nation) rows for both measures."""
    rows = _rows(spark, sf_dir, "ext_sqltext_rollup_grouping")
    grand = [r for r in rows if r["g_region"] == 1 and r["g_nation"] == 1]
    leaves = [r for r in rows if r["g_region"] == 0 and r["g_nation"] == 0]
    assert len(grand) == 1
    assert grand[0]["n_customers"] == sum(r["n_customers"] for r in leaves)
    assert grand[0]["acctbal_cents"] == sum(r["acctbal_cents"] for r in leaves)


def test_sqltext_set_cohorts_partition_the_union(spark, sf_dir):
    """both + f_only + o_only must equal |f_buyers ∪ o_buyers| — the
    inclusion-exclusion identity INTERSECT/EXCEPT must satisfy."""
    rows = {r["cohort"]: r["n_customers"] for r in _rows(spark, sf_dir, "ext_sqltext_set_cohorts")}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    union_n = (
        orders.filter("o_orderstatus IN ('F', 'O')")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows["both"] + rows["f_only"] + rows["o_only"] == union_n


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bottomk_sample_compiles_to_take_ordered(spark):
    """bottomk_sample's orderBy(hash).limit(k) must compile to
    TakeOrderedAndProject — per-task local k-heaps merged on the driver,
    never a global Sort + single-partition Exchange."""
    from aircan_spark.ext import sketch as sk

    df = spark.range(5000).select(F.col("id").alias("k"))
    plan = _plan(sk.bottomk_sample(df, ["k"], k=50))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no standalone global sort survives


def test_cms_estimate_broadcasts_the_sketch(spark):
    """count_min_estimate must probe the tiny sketch via a
    BroadcastHashJoin — the sketch is O(depth*width) and must never be
    the build side of a shuffled join."""
    from aircan_spark.ext import sketch as sk

    items = spark.range(2000).select((F.col("id") % 37).cast("string").alias("w"))
    sketch = sk.count_min_build(items, "w", depth=3, width=64, seed=1)
    est = sk.count_min_estimate(
        sketch, items.distinct(), "w", depth=3, width=64, seed=1
    )
    assert "BroadcastHashJoin" in _plan(est)


def test_sqltext_exists_compiles_to_semi_join(spark, sf_dir):
    """The correlated EXISTS text query must reach a left-semi hash join
    — Catalyst's subquery decorrelation — not a nested-loop or
    cartesian plan."""
    from aircan_spark.ext.queries_w47 import SQLTEXT_QUERIES
    from aircan_spark import sqlapi

    df = sqlapi.sql(spark, sf_dir, SQLTEXT_QUERIES["ext_sqltext_correlated_exists"])
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_idle_customers_outputs_double_not_decimal(spark, sf_dir):
    """Regression pin for the sf0.1 sweep find: Spark DECIMAL outputs
    reach pandas as Decimal objects (trailing-zero repr '7097.20') while
    DuckDB maps DECIMAL to float64 ('7097.2') — the value compare breaks
    the first time the query produces rows (sf<=0.01 yields 0 rows, so
    every earlier gate passed vacuously). The output column must stay
    DOUBLE."""
    df = Q.EXT_QUERIES["ext_idle_customers"](spark, sf_dir)
    assert dict(df.dtypes)["totacctbal"] == "double"


def test_dlq_gate_conserves_rows_and_splits_by_threshold(spark, sf_dir):
    """The DLQ contract: nothing dropped silently — table + quarantine
    row counts sum to the orders count per bucket — and the routing is
    exactly the data-derived threshold rule (2 buckets each way, barring
    exact max ties)."""
    rows = _rows(spark, sf_dir, "ext_stream_dlq_gate")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    assert sum(r["n_rows"] for r in rows) == n
    assert len(rows) == 4  # each bucket lands WHOLE in exactly one place
    assert {r["bucket"] for r in rows} == {0, 1, 2, 3}
    dests = [r["destination"] for r in rows]
    assert dests.count("table") == 2 and dests.count("dlq") == 2
    # destination follows the per-bucket max, never the bucket id
    from pyspark.sql import functions as F2

    mx = {
        r["b"]: r["m"]
        for r in orders.groupBy((F2.col("o_orderkey") % 4).alias("b"))
        .agg(F2.max("o_totalprice").alias("m"))
        .collect()
    }
    ms = sorted(mx.values())
    thr = (ms[1] + ms[2]) / 2.0
    for r in rows:
        assert r["destination"] == ("table" if mx[r["bucket"]] <= thr else "dlq")


def test_audio_rms_windows_vad_flags_and_ranges(spark, sf_dir):
    """Every file yields exactly 2 windows: window 0 voiced (RMS >=
    512/32768), window 1 silent (RMS <= 15/32768 < 0.01) — the fixture
    margins that make the VAD flag rounding-proof."""
    rows = _rows(spark, sf_dir, "ext_audio_rms_windows")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], {})[r["window_idx"]] = r
    for did, ws in by_doc.items():
        assert set(ws) == {0, 1}
        assert not ws[0]["is_silence"] and ws[0]["rms"] >= 512 / 32768
        assert ws[1]["is_silence"] and ws[1]["rms"] <= 15 / 32768
        assert ws[0]["t_start_s"] == 0.0 and ws[1]["t_start_s"] == 0.05


def test_delete_parity_paths_agree_and_conserve(spark, sf_dir):
    """The full-rewrite and bucket-pruned deletes must produce
    IDENTICAL observable results (they share one oracle), the reported
    delete count must equal the doomed-key population, and survivors +
    deleted must conserve the orders count."""
    plain = sorted(
        _rows(spark, sf_dir, "ext_table_delete_parity"),
        key=lambda r: r["o_orderstatus"],
    )
    bucketed = sorted(
        _rows(spark, sf_dir, "ext_bucketed_delete_parity"),
        key=lambda r: r["o_orderstatus"],
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in bucketed]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_doomed = orders.filter("o_orderkey % 7 = 3").count()
    assert plain[0]["n_deleted"] == n_doomed
    assert sum(r["n_rows"] for r in plain) + n_doomed == orders.count()


def test_stream_moments_state_conserves_and_is_psd(spark, sf_dir):
    """Keyed-moments state: per-user counts must sum to the events row
    count (ADD merge law, nothing lost across batches), and every
    user's second moment must satisfy n*Σx² >= (Σx)² (Cauchy-Schwarz —
    an impossible-to-fake positive-semidefiniteness check on the
    maintained partials)."""
    rows = _rows(spark, sf_dir, "ext_stream_moments_state")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert r["n_events"] * r["sum_cents_sq"] >= r["sum_cents"] ** 2


def test_cronbach_weekday_reconstructs_from_components(spark, sf_dir):
    """The formerly-shadowed weekday variant must satisfy its own
    defining identity alpha = k/(k-1)*(1 - sum_item_var/total_var)
    with k=7 weekday items, and alpha <= 1."""
    (r,) = _rows(spark, sf_dir, "ext_cronbach_alpha_weekday")
    expect = 7 / 6 * (1 - r["sum_item_var"] / r["total_var"])
    assert abs(r["alpha"] - expect) < 1e-4
    assert r["alpha"] <= 1.0
    assert r["n_subjects"] > 0 and r["n_events"] > 0
