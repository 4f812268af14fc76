"""Vectorised host-path equivalence (round-4 residual-phase work).

The headline valuation spent ~0.44 s in per-period host plumbing (context
build, discounting, curve sampling, seasonal params — residual_probe.py
attribution); these paths are now vectorised.  Each test pins bit-equality
against the scalar implementations the engines used before, plus the
fallback behaviour for inputs the fast paths cannot take.
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu.compile import _rule_days, build_valuation_context
from storage_tpu.models.multi_factor import (
    _curve_lookup,
    build_sim_coefficients,
    create_3_factor_season_params,
)
from storage_tpu.utils.daycount import act_365
from storage_tpu.utils.discount import (
    as_discounter,
    discount_factors_for_days,
    discount_factors_for_spec,
)
from storage_tpu.utils.frequencies import days_index, period_start_day, to_day


@pytest.fixture(scope="module")
def daily_setup():
    periods = pd.period_range("2025-06-01", periods=90, freq="D")
    rates = pd.Series(
        np.linspace(0.01, 0.03, 400),
        index=pd.period_range("2025-05-01", periods=400, freq="D"),
    )
    present = to_day(pd.Period("2025-06-01", "D"))
    return periods, rates, present


def settle_rule(p):
    return p.asfreq("M").asfreq("D", "end") + 5


def test_days_index_matches_scalar(daily_setup):
    periods, _, _ = daily_setup
    vec = days_index(periods)
    assert list(vec.astype(object)) == [period_start_day(p) for p in periods]
    # Heterogeneous sequence fallback.
    mixed = [pd.Period("2025-06-01", "D"), "2025-06-02", pd.Timestamp("2025-06-03")]
    assert list(days_index(mixed).astype(object)) == [to_day(x) for x in mixed]


def test_discount_spec_series_bit_equal(daily_setup):
    periods, rates, present = daily_setup
    days = days_index(periods)
    old = discount_factors_for_days(as_discounter(rates), present, days.astype(object))
    new = discount_factors_for_spec(rates, present, days)
    assert np.array_equal(old, new)


def test_discount_spec_flat_none_callable(daily_setup):
    periods, rates, present = daily_setup
    days = days_index(periods)
    old = discount_factors_for_days(as_discounter(0.017), present, days.astype(object))
    assert np.array_equal(old, discount_factors_for_spec(0.017, present, days))
    assert np.array_equal(
        np.ones(len(days)), discount_factors_for_spec(None, present, days)
    )
    fn = as_discounter(rates)
    assert np.array_equal(
        discount_factors_for_days(fn, present, days.astype(object)),
        discount_factors_for_spec(fn, present, days),
    )


def test_discount_spec_missing_rate_raises(daily_setup):
    periods, rates, present = daily_setup
    short = rates.iloc[:40]  # curve ends before the last cash-flow day
    with pytest.raises(ValueError, match="No interest rate provided"):
        discount_factors_for_spec(short, present, days_index(periods))


def test_discount_spec_past_days_skip_curve(daily_setup):
    _, rates, _ = daily_setup
    # Days on/before present discount to 1.0 WITHOUT consulting the curve,
    # even when the curve has no point there (act365_discounter_from_series
    # semantics).
    days = days_index(pd.period_range("2025-04-01", periods=3, freq="D"))
    present = to_day(pd.Period("2025-06-01", "D"))
    out = discount_factors_for_spec(rates.iloc[100:], present, days)
    assert np.array_equal(out, np.ones(3))


def test_discount_spec_duplicate_days_keep_last():
    # Same day twice in the curve: the dict build kept the LAST value.
    idx = pd.PeriodIndex(["2025-06-02", "2025-06-03", "2025-06-03"], freq="D")
    rates = pd.Series([0.01, 0.5, 0.02], index=idx)
    present = to_day(pd.Period("2025-06-01", "D"))
    days = days_index(pd.PeriodIndex(["2025-06-03"], freq="D"))
    old = discount_factors_for_days(as_discounter(rates), present, days.astype(object))
    assert np.array_equal(old, discount_factors_for_spec(rates, present, days))


def test_rule_days_vectorised_matches_scalar(daily_setup):
    periods, _, _ = daily_setup
    vec = _rule_days(settle_rule, periods)
    assert list(vec.astype(object)) == [to_day(settle_rule(p)) for p in periods]
    assert list(_rule_days(None, periods).astype(object)) == [
        period_start_day(p) for p in periods
    ]


def test_rule_days_scalar_only_rule_falls_back(daily_setup):
    periods, _, _ = daily_setup

    def branchy_rule(p):  # raises on a PeriodIndex (ambiguous truth value)
        if p.month > 6:
            return p + 3
        return p + 1

    vec = _rule_days(branchy_rule, periods)
    assert list(vec.astype(object)) == [to_day(branchy_rule(p)) for p in periods]


def test_rule_days_rejects_inconsistent_vector_rule(daily_setup):
    periods, _, _ = daily_setup

    def misaligned(p):  # index path disagrees with the scalar contract
        if isinstance(p, pd.PeriodIndex):
            return p + 99
        return p + 1

    vec = _rule_days(misaligned, periods)
    assert list(vec.astype(object)) == [to_day(misaligned(p)) for p in periods]


def test_build_sim_coefficients_vectorised_matches_scalar():
    periods = pd.period_range("2025-06-02", periods=60, freq="D")
    f3, c3 = create_3_factor_season_params(
        "D", 14.5, 0.8, 0.25, 0.2, periods[0], periods[-1]
    )
    fwd = pd.Series(np.linspace(20.0, 30.0, 60), index=periods)
    current = pd.Period("2025-06-01", "D")
    cs_vec = build_sim_coefficients(f3, c3, current, fwd, periods)
    # Scalar reference: explicit per-period lookups + act_365 loop.
    times = np.array([act_365(current, p) for p in periods])
    vols = np.array(
        [[_curve_lookup(vc, p, f) for f, (_mr, vc) in enumerate(f3)] for p in periods]
    )
    fwds = np.array([_curve_lookup(fwd, p, -1) for p in periods])
    from storage_tpu.models.simulation import sim_coefficients

    cs_ref = sim_coefficients(np.array([mr for mr, _ in f3]), vols, c3, times, fwds)
    for name in ("decay", "chol", "vols", "log_fwd_drift"):
        assert np.array_equal(getattr(cs_vec, name), getattr(cs_ref, name)), name
    # Explicit time_func still honoured (scalar loop path).
    cs_tf = build_sim_coefficients(f3, c3, current, fwd, list(periods), time_func=act_365)
    assert np.array_equal(cs_tf.decay, cs_vec.decay)


def test_build_sim_coefficients_missing_curve_point_message():
    periods = pd.period_range("2025-06-02", periods=10, freq="D")
    f3, c3 = create_3_factor_season_params(
        "D", 14.5, 0.8, 0.25, 0.2, periods[0], periods[-1]
    )
    fwd = pd.Series(np.ones(5), index=periods[:5])
    with pytest.raises(ValueError, match="No point in fwd curve"):
        build_sim_coefficients(f3, c3, pd.Period("2025-06-01", "D"), fwd, periods)


def test_seasonal_params_t_from_peak_vectorised():
    f3, _ = create_3_factor_season_params(
        "D", 14.5, 0.8, 0.25, 0.2, "2025-06-01", "2026-06-01"
    )
    _, seasonal_curve = f3[2]
    peak = pd.Period(year=2025, month=2, day=1, freq="D")
    t_from_peak = np.array(
        [
            (p.start_time - peak.start_time).total_seconds() / (365.25 * 86_400.0)
            for p in seasonal_curve.index
        ]
    )
    expected = np.sin(2.0 * np.pi * t_from_peak + np.pi / 2.0) * 0.1
    assert np.array_equal(seasonal_curve.to_numpy(), expected)


def test_context_build_discounts_bit_stable():
    # End-to-end: the compiled context's df arrays equal the scalar
    # discounter applied per period (the pre-round-4 implementation).
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_case

    storage, fwd_curve, ir_curve, settle = build_case()
    ctx = build_valuation_context(
        storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100
    )
    disc = as_discounter(ir_curve)
    present = period_start_day(ctx.val_period)
    dps = ctx.periods[:-1]
    assert np.array_equal(
        ctx.df_settle,
        discount_factors_for_days(disc, present, [to_day(settle(p)) for p in dps]),
    )
    assert np.array_equal(
        ctx.df_cost,
        discount_factors_for_days(disc, present, [period_start_day(p) for p in dps]),
    )
