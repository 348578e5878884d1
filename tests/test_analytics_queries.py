"""Crafted edge-case + plan-shape tests for the continuation-#2 analytics
queries (sessionize, funnel, argminmax, pricing pushdown, semi join,
group-limit plans). Value-level equivalence vs DuckDB lives in
tests/test_oracle.py; these pin the semantic corners and the physical
plans the docstrings promise."""

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# --- sessionize: gap boundary semantics --------------------------------------


def test_sessionize_gap_boundary(spark, monkeypatch):
    """A gap of EXACTLY 30 minutes stays in the same session (the break
    condition is strictly greater-than); 30min + 1us breaks."""
    import aircan_spark.ext.queries as Q

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 100),
        (1, base + dt.timedelta(minutes=30), 101),          # == gap -> same
        (1, base + dt.timedelta(minutes=60, microseconds=1), 102),  # > gap -> new
        (2, base, 200),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    monkeypatch.setattr(Q, "_t", lambda _s, _d, _n: ev)
    got = {
        (r.user_id, r.session_idx): r.n_events
        for r in Q.ext_sessionize(spark, SF).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


# --- funnel: attribution window inclusivity ----------------------------------


def test_funnel_window_inclusivity(spark, monkeypatch):
    """Click exactly 1h before the purchase IS attributed (closed lower
    bound); click at the purchase instant is NOT (open upper bound)."""
    import aircan_spark.ext.queries as Q

    p = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (1, p, 10, "purchase"),
        (1, p - dt.timedelta(hours=1), 11, "click"),   # boundary: attributed
        (2, p, 20, "purchase"),
        (2, p, 21, "click"),                           # same instant: NOT
        (3, p, 30, "purchase"),
        (3, p - dt.timedelta(hours=1, seconds=1), 31, "click"),  # too old: NOT
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    monkeypatch.setattr(Q, "_t", lambda _s, _d, _n: ev)
    out = Q.ext_funnel(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_purchases, r.n_attributed) == (3, 1)


# --- argminmax: deterministic tie-break --------------------------------------


def test_argminmax_tie_break(spark, monkeypatch):
    """Equal values resolve to the smallest event_id for MIN and the
    largest for MAX (lexicographic struct ordering)."""
    import aircan_spark.ext.queries as Q

    rows = [
        ("click", 1.0, 5),
        ("click", 1.0, 3),   # tie on min value -> event_id 3 wins MIN
        ("click", 9.0, 7),
        ("click", 9.0, 8),   # tie on max value -> event_id 8 wins MAX
    ]
    ev = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    monkeypatch.setattr(Q, "_t", lambda _s, _d, _n: ev)
    r = Q.ext_argminmax(spark, SF).collect()[0]
    assert (r.min_event_id, r.max_event_id) == (3, 8)


# --- plan shapes --------------------------------------------------------------


def test_pricing_summary_filter_pushed_to_scan(spark):
    from aircan_spark.ext.queries import ext_pricing_summary

    plan = _plan(ext_pricing_summary(spark, SF))
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed, f"shipdate cutoff not pushed: {pushed}"


def test_late_orders_is_semi_join(spark):
    from aircan_spark.ext.queries import ext_late_orders

    plan = _plan(ext_late_orders(spark, SF))
    assert "LeftSemi" in plan


def test_group_limits_in_plans(spark):
    """group_sample and mode_by_group promise WindowGroupLimit (rank-limit
    pushdown) — partial mode means the cap applies before the exchange."""
    from aircan_spark.ext.queries import ext_group_sample, ext_mode_by_group

    assert "WindowGroupLimit" in _plan(ext_group_sample(spark, SF))
    assert "WindowGroupLimit" in _plan(ext_mode_by_group(spark, SF))


def test_gap_fill_daily_is_broadcast(spark):
    from aircan_spark.ext.queries import ext_gap_fill

    plan = _plan(ext_gap_fill(spark, SF))
    assert "BroadcastHashJoin" in plan
