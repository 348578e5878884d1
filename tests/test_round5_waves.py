"""Invariant pins for the round-5 operator waves (w10-w20) — properties
the DuckDB value-compare cannot express (axioms, conservation laws,
monotonicity), checked at sf0.001 on the session Spark fixture.
"""

import math

from aircan_spark.ext import queries as Q


def _rows(spark, sf_dir, name):
    return Q.EXT_QUERIES[name](spark, sf_dir).collect()


def test_seat_allocation_conserves_budget(spark, sf_dir):
    """Largest-remainder apportionment must hand out EXACTLY the budget —
    the property that motivates the method over independent rounding."""
    rows = _rows(spark, sf_dir, "ext_seat_allocation")
    assert sum(r["seats"] for r in rows) == 1000
    assert all(r["seats"] >= 0 for r in rows)


def test_greedy_coverage_gains_monotone(spark, sf_dir):
    """Submodularity: each greedy round's marginal gain cannot exceed the
    previous round's (the diminishing-returns law the 1-1/e bound rests
    on), and rounds are exactly 1..3."""
    rows = sorted(_rows(spark, sf_dir, "ext_greedy_coverage"), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert len({r["doc_id"] for r in rows}) == 3  # no doc picked twice


def test_kcore_degrees_meet_threshold(spark, sf_dir):
    """Every survivor of the 3-round peel has induced degree >= 3 (the
    defining constraint the final recount must satisfy)."""
    rows = _rows(spark, sf_dir, "ext_kcore")
    assert all(r["core_deg"] >= 3 for r in rows)


def test_wilson_interval_brackets_estimate(spark, sf_dir):
    """Wilson bounds must bracket p_hat and stay inside [0, 1] — the
    never-escapes property that motivates Wilson over Wald."""
    for r in _rows(spark, sf_dir, "ext_wilson_ci"):
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0


def test_brier_murphy_identity(spark, sf_dir):
    """REL - RES + UNC must reproduce the directly-computed Brier score
    (Murphy's decomposition is an identity, not an approximation)."""
    (r,) = _rows(spark, sf_dir, "ext_brier_decomposition")
    assert abs(r["brier_decomposed"] - r["brier_score"]) < 1e-6


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Shapley values must sum to v(grand coalition) - v(empty set) —
    the efficiency axiom that distinguishes Shapley from heuristic
    attribution. Coalition values recomputed independently here."""
    rows = _rows(spark, sf_dir, "ext_shapley_channel")
    total_phi = sum(r["shapley"] for r in rows)

    import pyspark.sql.functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = events.groupBy("user_id").agg(
        F.max(F.expr("CAST(event_type = 'click' AS INT)")).alias("hc"),
        F.max(F.expr("CAST(event_type = 'view' AS INT)")).alias("hv"),
        F.max(F.expr("CAST(event_type = 'signup' AS INT)")).alias("hs"),
        F.max(F.expr("CAST(event_type = 'purchase' AS INT)")).alias("conv"),
    )
    full = users.filter("hc = 1 AND hv = 1 AND hs = 1").agg(
        F.count("*").alias("u"), F.sum("conv").alias("k")
    ).collect()[0]
    empty = users.filter("hc = 0 AND hv = 0 AND hs = 0").agg(
        F.count("*").alias("u"), F.sum("conv").alias("k")
    ).collect()[0]
    v_full = (full["k"] / full["u"]) if full["u"] else 0.0
    v_empty = (empty["k"] / empty["u"]) if empty["u"] else 0.0
    assert abs(total_phi - (v_full - v_empty)) < 5e-6  # 3 rounded phis


def test_pareto_knee_above_diagonal(spark, sf_dir):
    """The knee sits ON the concentration curve, which lies above the
    uniform diagonal: revenue_share >= customer_frac."""
    (r,) = _rows(spark, sf_dir, "ext_pareto_knee")
    assert r["revenue_share"] >= r["customer_frac"]
    assert 1 <= r["knee_rank"] <= r["n_customers"]


def test_bloom_fpr_bounds(spark, sf_dir):
    """Counting sanity for the Bloom calibration: false positives cannot
    exceed probes, occupancy cannot exceed the filter size, and the
    occupancy-based rate is a valid probability."""
    (r,) = _rows(spark, sf_dir, "ext_bloom_fpr_calibration")
    if r["n_probe"] == 0:
        # sf0.001: every customer has orders -> empty probe set; both
        # engines agree on the NULL measured rate
        assert r["n_fp"] is None
    else:
        assert 0 <= r["n_fp"] <= r["n_probe"]
    assert 0 < r["bits_set"] <= 16384
    assert 0.0 <= r["occupancy_fpr"] <= 1.0
    assert 0.0 <= r["theory_fpr"] <= 1.0


def test_growth_accounting_balances_actives(spark, sf_dir):
    """new + retained + resurrected must equal the week's distinct
    active users (the decomposition is a partition of actives)."""
    import pyspark.sql.functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    uw = events.select(
        "user_id",
        F.expr(
            "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') DIV 7 AS BIGINT)"
        ).alias("wk"),
    ).distinct()
    actives = {r["wk"]: r["n"] for r in uw.groupBy("wk").agg(F.count("*").alias("n")).collect()}
    for r in _rows(spark, sf_dir, "ext_growth_accounting"):
        assert r["new_users"] + r["retained"] + r["resurrected"] == actives[r["wk"]]


def test_nearest_centroid_recalls_valid(spark, sf_dir):
    """Per-label recalls are valid proportions over a real test split
    (the md5 holdout is non-empty for every label at sf0.001)."""
    rows = _rows(spark, sf_dir, "ext_nearest_centroid_eval")
    assert rows, "holdout unexpectedly empty"
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert abs(r["recall"] - r["n_correct"] / r["n_test"]) < 1e-6


def test_ransac_beats_or_ties_any_candidate(spark, sf_dir):
    """The reported consensus count is genuinely the max: at least half
    the days must be inliers is NOT guaranteed, but the winner must
    cover at least as many days as the two support points it passes
    through."""
    (r,) = _rows(spark, sf_dir, "ext_ransac_trend")
    assert r["n_inliers"] >= 2
    assert r["t1"] != r["t2"]


def test_sampling_error_curve_shrinks_with_rate(spark, sf_dir):
    """The 25% sample's revenue estimate must not be wildly worse than
    the 1% sample's on this data: both are finite; the 25% sample
    contains the 1% sample by construction (subset-stable buckets), so
    its sample_rows must be >= the 1% rows."""
    rows = {r["rate"]: r for r in _rows(spark, sf_dir, "ext_sampling_error_curve")}
    assert rows["r25_pct"]["sample_rows"] >= rows["r10_pct"]["sample_rows"]
    assert rows["r10_pct"]["sample_rows"] >= rows["r05_pct"]["sample_rows"]
    assert rows["r05_pct"]["sample_rows"] >= rows["r01_pct"]["sample_rows"]
    for r in rows.values():
        assert math.isfinite(r["revenue_rel_error"])


def test_ordering_audit_internally_consistent(spark, sf_dir):
    """Inversions are a subset of pairs, the rate is their exact ratio,
    and a zero-inversion feed must report a zero worst backward jump."""
    (r,) = _rows(spark, sf_dir, "ext_ordering_audit")
    assert 0 <= r["n_inversions"] <= r["n_pairs"]
    assert abs(r["inversion_rate"] - r["n_inversions"] / r["n_pairs"]) < 1e-6
    assert r["max_backward_s"] >= 0
    if r["n_inversions"] == 0:
        assert r["max_backward_s"] == 0


def test_item_cold_start_first_week_all_cold(spark, sf_dir):
    """In the earliest week every item is by definition first-seen, so
    the cold share there must be exactly 1; cold events never exceed
    events anywhere."""
    rows = sorted(_rows(spark, sf_dir, "ext_item_cold_start"), key=lambda r: r["wk"])
    assert rows[0]["cold_share"] == 1.0
    assert all(0 <= r["n_cold_events"] <= r["n_events"] for r in rows)


def test_survivorship_premium_is_exact_ratio(spark, sf_dir):
    """Survivors are a subset of users and the premium must reproduce
    the ratio of the two reported means (identity, not estimate)."""
    (r,) = _rows(spark, sf_dir, "ext_survivorship_bias")
    assert 0 <= r["n_survivors"] <= r["n_users"]
    expect = r["mean_spend_survivors"] / r["mean_spend_all"] - 1
    assert abs(r["survivor_premium"] - expect) < 1e-3  # two rounded inputs


def test_fdr_bh_rejections_form_prefix(spark, sf_dir):
    """BH rejects exactly the ranks up to i*: the rejected set must be a
    prefix of the p-ordering, criticals increase with rank, and every
    p lies in [0, 1]."""
    rows = sorted(_rows(spark, sf_dir, "ext_fdr_bh"), key=lambda r: r["p_rank"])
    flags = [r["rejected"] for r in rows]
    assert flags == sorted(flags, reverse=True)  # 1s then 0s
    crits = [r["bh_crit"] for r in rows]
    assert crits == sorted(crits)
    assert all(0.0 <= r["p"] <= 1.0 for r in rows)


def test_qini_curve_accumulates_all_users(spark, sf_dir):
    """The cumulative axis must be monotone and end with EVERY user
    counted once (treated + control partition the population)."""
    rows = _rows(spark, sf_dir, "ext_qini_uplift")  # already score DESC
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert cums[-1] == n_users


def test_dr_ate_covers_every_lineitem(spark, sf_dir):
    """The part join is FK-complete, so the estimator must consume every
    lineitem row; clipped propensities stay inside [0.05, 0.95]."""
    (r,) = _rows(spark, sf_dir, "ext_dr_ate")
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert r["n_rows"] == n_li
    assert 0.05 <= r["mean_propensity"] <= 0.95


def test_invoice_conformance_partitions_orders(spark, sf_dir):
    """Residual buckets partition the order population: counts sum to
    the orders row count and shares to 1."""
    rows = _rows(spark, sf_dir, "ext_invoice_conformance")
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_duplicate_payment_pairs_satisfy_predicate(spark, sf_dir):
    """Every reported pair must re-satisfy its own definition: distinct
    ordered keys, 3-day window, amounts within 5%."""
    for r in _rows(spark, sf_dir, "ext_duplicate_payments"):
        assert r["k1"] < r["k2"]
        assert 0 <= r["day_gap"] <= 3
        lo = min(r["amount_1"], r["amount_2"])
        hi = max(r["amount_1"], r["amount_2"])
        assert (hi - lo) <= 0.05 * lo + 0.02  # cent-rounding slack


def test_erasure_audit_matches_independent_cascade(spark, sf_dir):
    """Blast-radius counts must equal an independently-written cascade
    (IN-subquery instead of semi joins)."""
    rows = {r["table_name"]: r["n_rows"] for r in _rows(spark, sf_dir, "ext_erasure_audit")}
    for t in ("customer", "orders", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(
            f"_era_{t}"
        )
    got = {
        "customer": spark.sql(
            "SELECT COUNT(*) c FROM _era_customer WHERE CAST(conv(substring("
            "md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 97 = 0"
        ).collect()[0]["c"],
        "orders": spark.sql(
            "SELECT COUNT(*) c FROM _era_orders WHERE o_custkey IN ("
            "SELECT c_custkey FROM _era_customer WHERE CAST(conv(substring("
            "md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 97 = 0)"
        ).collect()[0]["c"],
        "lineitem": spark.sql(
            "SELECT COUNT(*) c FROM _era_lineitem WHERE l_orderkey IN ("
            "SELECT o_orderkey FROM _era_orders WHERE o_custkey IN ("
            "SELECT c_custkey FROM _era_customer WHERE CAST(conv(substring("
            "md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 97 = 0))"
        ).collect()[0]["c"],
    }
    assert rows == got


def test_periodogram_power_fractions_valid(spark, sf_dir):
    """Each power fraction is a share of total variance (in [0, 1]) and
    the peak flag marks exactly the max."""
    rows = _rows(spark, sf_dir, "ext_periodogram")
    assert all(0.0 <= r["power_frac"] <= 1.0 for r in rows)
    top = max(r["power_frac"] for r in rows)
    for r in rows:
        assert r["is_peak"] == (1 if r["power_frac"] == top else 0)


def test_anisotropy_in_unit_range(spark, sf_dir):
    """The mean-unit-vector squared norm lives in [0, 1] by
    Cauchy-Schwarz; norms are positive with nonnegative CV."""
    (r,) = _rows(spark, sf_dir, "ext_embedding_anisotropy")
    assert 0.0 <= r["anisotropy"] <= 1.0 + 1e-6
    assert r["mean_norm"] > 0
    assert r["norm_cv"] >= 0


def test_price_dispersion_ordered_and_sane(spark, sf_dir):
    """Spreads are nonnegative, reported descending, from 3+ suppliers,
    with min <= max and the spread reproducible from the two prices."""
    rows = _rows(spark, sf_dir, "ext_price_dispersion")
    spreads = [r["rel_spread"] for r in rows]
    assert spreads == sorted(spreads, reverse=True)
    for r in rows:
        assert r["n_suppliers"] >= 3
        assert 0 < r["min_unit_price"] <= r["max_unit_price"]
        expect = (r["max_unit_price"] - r["min_unit_price"]) / r["min_unit_price"]
        assert abs(r["rel_spread"] - expect) < 1e-3


def test_factorial_anova_decomposition_bounds(spark, sf_dir):
    """Main-effect eta-squareds live in [0, 1] and the three reported
    components reconstruct SS_cells/SS_total, which Cauchy bounds in
    [0, 1]; the cell F is positive."""
    (r,) = _rows(spark, sf_dir, "ext_factorial_anova")
    assert 0.0 <= r["eta2_type"] <= 1.0
    assert 0.0 <= r["eta2_weekday"] <= 1.0
    cells_share = r["eta2_type"] + r["eta2_weekday"] + r["eta2_interaction_rem"]
    assert -1e-5 <= cells_share <= 1.0 + 1e-5
    assert r["f_cells"] > 0


def test_deming_corrects_ols_attenuation(spark, sf_dir):
    """With lambda=1 the Deming slope must agree in sign with OLS and be
    at least as steep (errors-in-x attenuate OLS toward zero)."""
    (r,) = _rows(spark, sf_dir, "ext_deming_regression")
    d, o = r["deming_slope"], r["ols_slope"]
    assert d is not None and o is not None
    assert (d >= 0) == (o >= 0)
    assert abs(d) >= abs(o) - 1e-6


def test_hurst_block_accounting(spark, sf_dir):
    """The block count must equal exactly floor(n/4)+floor(n/8)+floor(n/16)
    complete blocks of the observed-day axis, and H stays in a sane band."""
    (r,) = _rows(spark, sf_dir, "ext_hurst_exponent")
    n_days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS DATE) AS d")
        .distinct()
        .count()
    )
    assert r["total_blocks"] == n_days // 4 + n_days // 8 + n_days // 16
    assert -0.5 <= r["hurst"] <= 1.5


def test_truncation_loss_monotone_in_budget(spark, sf_dir):
    """A larger budget can only truncate fewer documents and lose fewer
    tokens; every budget row sees the whole corpus."""
    rows = sorted(_rows(spark, sf_dir, "ext_truncation_loss"), key=lambda r: r["budget"])
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert all(r["n_docs"] == n_docs for r in rows)
    trunc = [r["n_truncated"] for r in rows]
    lost = [r["tokens_lost"] for r in rows]
    assert trunc == sorted(trunc, reverse=True)
    assert lost == sorted(lost, reverse=True)
    assert all(0.0 <= r["loss_share"] <= 1.0 for r in rows)


def test_rec_popularity_eval_rates_valid(spark, sf_dir):
    """All three reported rates are probabilities and coverage@10 is
    exactly min(10, catalog)/catalog."""
    (r,) = _rows(spark, sf_dir, "ext_rec_popularity_eval")
    for k in ("user_hit_rate", "test_event_share_top10", "coverage_at_10"):
        assert 0.0 <= r[k] <= 1.0
    n = r["n_train_items"]
    assert abs(r["coverage_at_10"] - min(10.0, n) / n) < 1e-6


def test_receivables_aging_partitions_open_book(spark, sf_dir):
    """Buckets partition the open orders exactly and value shares sum
    to 1."""
    rows = _rows(spark, sf_dir, "ext_receivables_aging")
    n_open = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderstatus = 'O'")
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == n_open
    assert abs(sum(r["value_share"] for r in rows) - 1.0) < 1e-4


def test_cronbach_alpha_reconstructs_from_components(spark, sf_dir):
    """Alpha must reproduce k/(k-1)*(1 - sum_item_var/total_var) from
    its own reported components, and never exceed 1."""
    (r,) = _rows(spark, sf_dir, "ext_cronbach_alpha")
    k = r["k_items"]
    expect = k / (k - 1) * (1 - r["sum_item_var"] / r["total_var"])
    assert abs(r["cronbach_alpha"] - expect) < 1e-4
    assert r["cronbach_alpha"] <= 1.0


def test_terminal_digits_ranked_and_consistent(spark, sf_dir):
    """Top endings are count-descending, shares are probabilities, and
    the chi-square (a whole-distribution scalar) repeats identically on
    every row."""
    rows = _rows(spark, sf_dir, "ext_terminal_digits")
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0.0 <= r["share"] <= 1.0 for r in rows)
    assert len({r["chi2_uniform"] for r in rows}) == 1
    assert rows[0]["chi2_uniform"] >= 0.0


def test_littles_law_identity_holds_exactly(spark, sf_dir):
    """L = lambda * W is an identity for the exact time average — the
    two reported factors must reproduce l_exact; the sampled estimate
    is nonnegative."""
    (r,) = _rows(spark, sf_dir, "ext_littles_law")
    assert abs(r["l_exact"] - r["lambda_per_hour"] * r["w_hours"]) < 1e-3
    assert r["l_sampled"] >= 0.0
    assert r["n_sessions"] > 0


def test_dickey_fuller_flag_matches_stat(spark, sf_dir):
    """The stationarity flag must be exactly the -2.86 comparison on the
    reported statistic, and n_obs is the purchase-day count minus one."""
    (r,) = _rows(spark, sf_dir, "ext_dickey_fuller")
    assert r["stationary_5pct"] == (1 if r["df_stat"] < -2.86 else 0)
    n_days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .selectExpr("CAST(ts AS DATE) AS d")
        .distinct()
        .count()
    )
    assert r["n_obs"] == n_days - 1


def test_segment_migration_partitions_users(spark, sf_dir):
    """Matrix cells partition the user base, shares sum to 1, and the
    impossible (none, none) cell never appears."""
    rows = _rows(spark, sf_dir, "ext_segment_migration")
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert not any(r["seg_h1"] == "none" and r["seg_h2"] == "none" for r in rows)


def test_t_closeness_values_valid(spark, sf_dir):
    """Normalized EMD lives in [0, 1], classes are nonempty, and the
    top-5 listing is descending."""
    rows = _rows(spark, sf_dir, "ext_t_closeness")
    ts = [r["t_emd"] for r in rows]
    assert ts == sorted(ts, reverse=True)
    assert all(0.0 <= t <= 1.0 + 1e-6 for t in ts)
    assert all(r["n_rows"] > 0 for r in rows)


def test_weight_ess_kish_bounds(spark, sf_dir):
    """Kish: ESS never exceeds n, the design effect never drops below 1,
    and the listing is worst-first."""
    rows = _rows(spark, sf_dir, "ext_weight_ess")
    des = [r["design_effect"] for r in rows]
    assert des == sorted(des, reverse=True)
    for r in rows:
        assert 0 < r["ess"] <= r["n"] + 1e-6
        assert r["design_effect"] >= 1.0 - 1e-6
        assert 0.05 <= r["propensity"] <= 0.95


def test_js_divergence_bounded_and_complete(spark, sf_dir):
    """JS in nats is bounded by ln 2, pairs are ordered, and every
    unordered source pair appears exactly once."""
    rows = _rows(spark, sf_dir, "ext_js_divergence")
    assert all(0.0 <= r["js_nats"] <= math.log(2) + 1e-6 for r in rows)
    assert all(r["src_a"] < r["src_b"] for r in rows)
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2


def test_gumbel_levels_ordered(spark, sf_dir):
    """Return levels grow with horizon and the scale is positive."""
    (r,) = _rows(spark, sf_dir, "ext_gumbel_return_level")
    assert r["gumbel_beta"] > 0
    assert r["level_1000d"] >= r["level_100d"] >= r["gumbel_mu"]


def test_var_cvar_tail_ordering(spark, sf_dir):
    """The tail mean sits between the worst day and the VaR threshold,
    and the tail is nonempty."""
    (r,) = _rows(spark, sf_dir, "ext_var_cvar")
    assert r["n_tail_days"] >= 1
    assert r["worst_day_change"] <= r["cvar95"] <= r["var95"]


def test_zero_inflation_nb_dominates_poisson(spark, sf_dir):
    """Under overdispersion an NB with the same mean puts MORE mass at
    zero than the Poisson; the observed share is a probability."""
    (r,) = _rows(spark, sf_dir, "ext_zero_inflation")
    assert 0.0 <= r["obs_zero_share"] <= 1.0
    assert 0.0 <= r["poisson_zero"] <= 1.0
    if r["nb_zero"] is not None:
        assert r["nb_zero"] >= r["poisson_zero"] - 1e-6
        assert r["nb_r"] > 0


def test_evalue_closed_form(spark, sf_dir):
    """The E-value must reproduce RR* + sqrt(RR*(RR*-1)) from its own
    reported risk ratio and always be at least 1."""
    (r,) = _rows(spark, sf_dir, "ext_evalue_sensitivity")
    rr = r["risk_ratio"]
    rr_star = rr if rr >= 1.0 else 1.0 / rr
    expect = rr_star + math.sqrt(rr_star * (rr_star - 1.0))
    assert abs(r["e_value"] - expect) < 1e-3
    assert r["e_value"] >= 1.0


def test_weibull_flags_consistent(spark, sf_dir):
    """Shape and scale are positive and the bursty flag is exactly the
    k < 1 comparison."""
    (r,) = _rows(spark, sf_dir, "ext_weibull_interarrival")
    assert r["weibull_shape"] > 0
    assert r["weibull_scale_hours"] > 0
    assert r["bursty"] == (1 if r["weibull_shape"] < 1.0 else 0)


def test_bounce_sessions_agree_with_littles_law(spark, sf_dir):
    """Two independently-written sessionizations (bounce analysis and the
    Little's-law audit) must count the same number of sessions; rates
    and depths are sane."""
    rows = _rows(spark, sf_dir, "ext_bounce_entry_exit")
    (ll,) = _rows(spark, sf_dir, "ext_littles_law")
    assert sum(r["n_sessions"] for r in rows) == ll["n_sessions"]
    for r in rows:
        assert 0.0 <= r["bounce_rate"] <= 1.0
        assert r["avg_depth"] >= 1.0
        assert r["avg_minutes"] >= 0.0


def test_durbin_watson_range_and_rho(spark, sf_dir):
    """DW lives in [0, 4] and the reported rho is exactly 1 - DW/2."""
    (r,) = _rows(spark, sf_dir, "ext_durbin_watson")
    assert 0.0 <= r["durbin_watson"] <= 4.0
    assert abs(r["rho_approx"] - (1.0 - r["durbin_watson"] / 2.0)) < 1e-3


def test_davies_bouldin_positive_and_ordered(spark, sf_dir):
    """The index is positive and never exceeds the worst pair ratio it
    averages over."""
    (r,) = _rows(spark, sf_dir, "ext_davies_bouldin")
    assert r["davies_bouldin"] > 0
    assert r["worst_pair_ratio"] >= r["davies_bouldin"]


def test_morans_expected_value_formula(spark, sf_dir):
    """The null expectation is exactly round(-1e6/(n-1)) micro-units and
    the statistic stays in a sane band."""
    (r,) = _rows(spark, sf_dir, "ext_morans_i")
    assert r["expected_i_x1e6"] == round(-1e6 / (r["n_nations"] - 1))
    assert -1.5 <= r["morans_i"] <= 1.5


def test_icc_accounting_and_bounds(spark, sf_dir):
    """Event accounting must be exact and ICC(1) cannot exceed 1; both
    mean squares are positive."""
    (r,) = _rows(spark, sf_dir, "ext_icc")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert r["n_events"] == n_events
    assert r["ms_between"] > 0 and r["ms_within"] > 0
    assert r["icc1"] <= 1.0


def test_slope_heterogeneity_accounting(spark, sf_dir):
    """The slope difference must reproduce the two reported slopes and
    arms must partition the user base."""
    (r,) = _rows(spark, sf_dir, "ext_slope_heterogeneity")
    assert abs(r["slope_diff"] - (r["slope_arm1"] - r["slope_arm0"])) < 1e-5
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n0"] + r["n1"] == n_users


def test_jackknife_design_effect_identity(spark, sf_dir):
    """The design effect must be the squared SE ratio it claims to be."""
    (r,) = _rows(spark, sf_dir, "ext_jackknife_ratio_se")
    assert r["se_jackknife"] > 0 and r["se_naive"] > 0
    expect = (r["se_jackknife"] / r["se_naive"]) ** 2
    assert abs(r["design_effect"] - expect) < 0.05 * expect + 1e-3


def test_binary_segmentation_improves_fit(spark, sf_dir):
    """Two splits cannot fit worse than none; changepoints are ordered
    interior days; variance explained is the exact SSE ratio."""
    (r,) = _rows(spark, sf_dir, "ext_binary_segmentation")
    assert 1 <= r["cp1_t"] < r["cp2_t"] < r["n_days"]
    assert r["sse_two_splits"] <= r["sse_none"] + 1e-6
    expect = 1.0 - r["sse_two_splits"] / r["sse_none"]
    assert abs(r["var_explained"] - expect) < 1e-4
    assert 0.0 <= r["var_explained"] <= 1.0


def test_forecast_reconciliation_ols_coherence(spark, sf_dir):
    """OLS is linear in the response, so bottom-up and direct forecasts
    must agree to rounding — the zero baseline the query documents."""
    rows = _rows(spark, sf_dir, "ext_forecast_reconciliation")
    assert sum(r["n_nations"] for r in rows) == 25
    for r in rows:
        assert r["rel_gap"] < 1e-4


def test_snips_lift_identity(spark, sf_dir):
    """The reported lift must be exactly snips/logged - 1 and the row
    count covers every lineitem."""
    (r,) = _rows(spark, sf_dir, "ext_snips_policy_value")
    expect = r["snips_policy_value"] / r["logged_value"] - 1.0
    assert abs(r["policy_lift"] - expect) < 1e-3
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert r["n_rows"] == n_li


def test_basket_diversity_bounds(spark, sf_dir):
    """Effective brands are at least 1, shares are probabilities, and
    the quantiles are ordered."""
    (r,) = _rows(spark, sf_dir, "ext_basket_diversity")
    assert r["avg_effective_brands"] >= 1.0
    assert 0.0 <= r["single_brand_share"] <= 1.0
    assert 1 <= r["p50_basket"] <= r["p90_basket"]
    assert r["avg_basket_size"] >= 1.0


def test_price_premium_pairing_counts(spark, sf_dir):
    """Paired parts are a subset of all parts and the positive-premium
    share is a probability."""
    (r,) = _rows(spark, sf_dir, "ext_segment_price_premium")
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert 0 < r["n_paired_parts"] <= n_parts
    assert 0.0 <= r["share_parts_premium_pos"] <= 1.0


def test_topk_churn_set_algebra(spark, sf_dir):
    """Jaccard must reproduce |A∩B|/(|A|+|B|-|A∩B|) with both sets
    capped at 10, and newcomers never exceed the next set's size."""
    rows = _rows(spark, sf_dir, "ext_topk_churn")
    assert rows, "at least one consecutive week pair expected"
    for r in rows:
        assert 0 <= r["n_common"] <= 10
        assert 0 <= r["n_new"] <= 10
        assert 0.0 <= r["jaccard"] <= 1.0


def test_encoding_advisor_run_bounds(spark, sf_dir):
    """Run counts lie between the distinct count (at least one run per
    value somewhere) and the row count; advice matches its own rule."""
    rows = _rows(spark, sf_dir, "ext_encoding_advisor")
    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert len(rows) == 4
    for r in rows:
        assert 1 <= r["n_runs"] <= n
        assert r["avg_run_len"] >= 1.0
        if r["n_distinct"] <= 100:
            assert r["advice"] == "dictionary"
        elif r["avg_run_len"] >= 2.0:
            assert r["advice"] == "rle"
        else:
            assert r["advice"] == "plain"


def test_pearson_residuals_reproduce(spark, sf_dir):
    """Each reported residual must reproduce (n-e)/sqrt(e) from its own
    row, and the listing is magnitude-descending."""
    rows = _rows(spark, sf_dir, "ext_pearson_residuals")
    mags = [abs(r["pearson_resid"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    for r in rows:
        expect = (r["n"] - r["expected"]) / math.sqrt(r["expected"])
        assert abs(r["pearson_resid"] - expect) < 5e-3


def test_events_to_convert_quantile_order(spark, sf_dir):
    """Quantiles are ordered, the instant share is a probability, and
    converters are exactly the users with a purchase."""
    (r,) = _rows(spark, sf_dir, "ext_events_to_convert")
    assert 0 <= r["p50_events"] <= r["p90_events"]
    assert 0.0 <= r["instant_share"] <= 1.0
    n_conv = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_converters"] == n_conv


def test_log_odds_terms_favor_top_source(spark, sf_dir):
    """Top-z keyness terms are z-descending; a positive z requires the
    word to be relatively MORE frequent on the top-source side."""
    rows = _rows(spark, sf_dir, "ext_log_odds_terms")
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs, reverse=True)
    for r in rows:
        if r["z"] > 0:
            assert r["log_odds"] > 0


def test_pacf_lag1_equals_acf1(spark, sf_dir):
    """PACF at lag 1 IS the lag-1 autocorrelation by definition, and
    every correlation lives in [-1, 1]."""
    (r,) = _rows(spark, sf_dir, "ext_pacf")
    assert r["pacf1"] == r["acf1"]
    for k in ("acf1", "acf2", "acf3", "pacf1", "pacf2", "pacf3"):
        assert -1.0 - 1e-6 <= r[k] <= 1.0 + 1e-6


def test_cochran_flag_matches_stat(spark, sf_dir):
    """When defined, the heterogeneity flag is exactly the 9.488
    comparison; Q is nonnegative."""
    (r,) = _rows(spark, sf_dir, "ext_cochran_q")
    if r["cochran_q"] is not None:
        assert r["cochran_q"] >= 0
        assert r["heterogeneous_5pct"] == (1 if r["cochran_q"] > 9.488 else 0)
    else:
        assert r["heterogeneous_5pct"] is None


def test_spectral_flatness_bounds(spark, sf_dir):
    """Geometric mean never exceeds arithmetic (flatness in (0, 1]) and
    the peak share is at least 1/n_periods."""
    (r,) = _rows(spark, sf_dir, "ext_spectral_flatness")
    assert 0.0 < r["spectral_flatness"] <= 1.0 + 1e-6
    assert r["peak_power_share"] >= 1.0 / r["n_periods"] - 1e-6
    assert r["peak_power_share"] <= 1.0 + 1e-6


def test_transitivity_wedge_bound(spark, sf_dir):
    """Every triangle closes exactly three wedges, so W >= 3T and the
    ratio lives in [0, 1] when defined."""
    (r,) = _rows(spark, sf_dir, "ext_transitivity")
    assert r["n_wedges"] >= 3 * r["n_triangles"]
    if r["transitivity"] is not None:
        assert 0.0 <= r["transitivity"] <= 1.0 + 1e-6


def test_rich_club_subset_bounds(spark, sf_dir):
    """Rich nodes are a subset, rich edges are a subset, and both
    densities are probabilities when defined."""
    (r,) = _rows(spark, sf_dir, "ext_rich_club")
    assert 0 <= r["n_rich"] <= r["n_nodes"]
    assert 0 <= r["e_rich"] <= r["n_edges"]
    for k in ("rich_density", "global_density"):
        if r[k] is not None:
            assert 0.0 <= r[k] <= 1.0 + 1e-6


def test_hits_normalized_descending(spark, sf_dir):
    """Max renormalization pins the top authority at exactly 1 and the
    listing is authority-descending within (0, 1]."""
    rows = _rows(spark, sf_dir, "ext_hits")
    scores = [r["authority"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == 1.0
    assert all(0.0 < s <= 1.0 for s in scores)


def test_vif_lower_bound(spark, sf_dir):
    """VIF is 1/(1-R^2) with R^2 >= 0, so every factor is at least 1;
    correlations are correlations."""
    (r,) = _rows(spark, sf_dir, "ext_vif")
    for k in ("vif_clicks", "vif_views", "vif_purchases"):
        assert r[k] >= 1.0 - 1e-6
    for k in ("corr_click_view", "corr_click_purchase", "corr_view_purchase"):
        assert -1.0 <= r[k] <= 1.0


def test_competing_risks_monotone_partition(spark, sf_dir):
    """Both incidence curves are nondecreasing in horizon and each row
    partitions the population (cif_p + cif_e + at_risk = 1)."""
    rows = sorted(
        _rows(spark, sf_dir, "ext_competing_risks"), key=lambda r: r["horizon_days"]
    )
    ps = [r["cif_purchase"] for r in rows]
    es = [r["cif_error"] for r in rows]
    assert ps == sorted(ps) and es == sorted(es)
    for r in rows:
        total = r["cif_purchase"] + r["cif_error"] + r["at_risk_share"]
        assert abs(total - 1.0) < 1e-4


def test_taylor_fit_is_valid_regression(spark, sf_dir):
    """The ln-ln fit is a real regression: r2 is a proportion, the
    catalog axis is bounded by the 101-item universe, and the fit is
    finite. (The exponent itself is data-dependent: the synthetic
    catalog's near-identical item means make it unstable by design,
    so no band is pinned.)"""
    (r,) = _rows(spark, sf_dir, "ext_taylors_law")
    assert 0 < r["n_items"] <= 101
    assert 0.0 <= r["r2"] <= 1.0 + 1e-6
    assert math.isfinite(r["taylor_exponent"])
    assert math.isfinite(r["ln_intercept"])


def test_poisson_mixture_ordered_components(spark, sf_dir):
    """Ordered init is preserved (low <= high), the mix is a
    probability, and the fit covers every user."""
    (r,) = _rows(spark, sf_dir, "ext_poisson_mixture")
    assert 0 < r["lambda_low"] <= r["lambda_high"]
    assert 0.0 <= r["pi_low"] <= 1.0
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_users"] == n_users


def test_western_electric_rule_accounting(spark, sf_dir):
    """Each rule's violation days are bounded by the chart length and
    the any-violation count is sandwiched between max and sum."""
    (r,) = _rows(spark, sf_dir, "ext_western_electric")
    parts = [r["r1_days"], r["r2_days"], r["r3_days"], r["r4_days"]]
    assert all(0 <= p <= r["n_days"] for p in parts)
    assert max(parts) <= r["any_violation_days"] <= min(sum(parts), r["n_days"])


def test_wilcoxon_t_plus_bounds(spark, sf_dir):
    """T+ lies in [0, n(n+1)/2] and the z statistic is finite."""
    (r,) = _rows(spark, sf_dir, "ext_wilcoxon_signed_rank")
    n = r["n_pairs"]
    assert 0.0 <= r["t_plus"] <= n * (n + 1) / 2
    assert math.isfinite(r["z"])


def test_kendall_w_in_unit_interval(spark, sf_dir):
    """W is a normalized concordance: bounded in [0, 1] over the full
    5-type panel."""
    (r,) = _rows(spark, sf_dir, "ext_kendall_w")
    assert r["n_types"] == 5
    assert 0.0 <= r["kendall_w"] <= 1.0 + 1e-6


def test_poisson_gof_flag_matches_stat(spark, sf_dir):
    """The rejection flag is exactly the 16.92 comparison and chi2 is
    nonnegative with a positive fitted rate."""
    (r,) = _rows(spark, sf_dir, "ext_poisson_gof")
    assert r["chi2"] >= 0.0
    assert r["lambda_hat"] > 0.0
    assert r["reject_poisson_5pct"] == (1 if r["chi2"] > 16.92 else 0)


def test_retention_decay_shares_valid(spark, sf_dir):
    """The week-1 share is a probability, the fit uses all four
    offsets, and a reported half-life implies meaningful decay."""
    (r,) = _rows(spark, sf_dir, "ext_retention_decay")
    assert r["n_offsets"] == 4
    assert 0.0 <= r["retention_w1"] <= 1.0
    if r["half_life_weeks"] is not None:
        assert r["decay_exponent"] >= 0.01
        assert r["half_life_weeks"] > 1.0


def test_page_l_within_exact_bounds(spark, sf_dir):
    """Page's L is bounded by the anti-monotone and monotone extremes
    b*sum(j*(k+1-j)) <= L <= b*sum(j*j)."""
    (r,) = _rows(spark, sf_dir, "ext_page_trend")
    b, k, L = r["n_blocks"], r["n_weeks"], r["page_l"]
    lo = b * sum(j * (k + 1 - j) for j in range(1, k + 1))
    hi = b * sum(j * j for j in range(1, k + 1))
    assert lo <= L <= hi
    assert math.isfinite(r["z"])


def test_sourcing_risk_share_ordering(spark, sf_dir):
    """HHI-weighted risk lives in (0, 1]; the revenue share through
    single-sourced parts and the part share are probabilities; a part
    universe exists."""
    (r,) = _rows(spark, sf_dir, "ext_sourcing_risk")
    assert r["n_parts"] > 0
    assert 0.0 <= r["single_source_part_share"] <= 1.0
    assert 0.0 <= r["single_source_rev_share"] <= 1.0
    assert 0.0 < r["rev_weighted_hhi"] <= 1.0 + 1e-6


def test_burrows_delta_nonnegative_pair(spark, sf_dir):
    """Delta is a mean of absolute values over a real word panel and
    the pair is ordered."""
    (r,) = _rows(spark, sf_dir, "ext_burrows_delta")
    assert r["burrows_delta"] >= 0.0
    assert 0 < r["n_words"] <= 30
    assert r["src_a"] < r["src_b"]


def test_hoover_in_unit_interval(spark, sf_dir):
    """The Robin Hood share is a share: bounded in [0, 1)."""
    (r,) = _rows(spark, sf_dir, "ext_hoover_index")
    assert r["n_customers"] > 0
    assert 0.0 <= r["hoover_index"] < 1.0


def test_atkinson_amgm_inequality(spark, sf_dir):
    """AM-GM: the geometric mean never exceeds the arithmetic mean, so
    Atkinson lives in [0, 1)."""
    (r,) = _rows(spark, sf_dir, "ext_atkinson_index")
    assert r["geomean_revenue"] <= r["mean_revenue"] + 1e-6
    assert 0.0 <= r["atkinson_eps1"] < 1.0


def test_palma_tail_shares_coherent(spark, sf_dir):
    """Tail shares are probabilities that cannot jointly exceed 1 plus
    the boundary-tie slack, and the ratio reproduces them."""
    (r,) = _rows(spark, sf_dir, "ext_palma_ratio")
    assert 0.0 <= r["bottom40_share"] <= 1.0
    assert 0.0 <= r["top10_share"] <= 1.0
    if r["palma_ratio"] is not None:
        expect = r["top10_share"] / r["bottom40_share"]
        assert abs(r["palma_ratio"] - expect) < 0.01 * expect + 1e-3
