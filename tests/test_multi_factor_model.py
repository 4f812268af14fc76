"""Multi-factor model analytics + simulator moment tests.

Mirrors the reference's analytic-property suite
(``test_multi_factor.py:94-164``) and validates the simulator statistically
against the closed-form integrated covariance — the cross-implementation
technique SURVEY.md §4.3 prescribes in place of impossible Mersenne-Twister
seed parity.
"""
import itertools
from datetime import date

import numpy as np
import pandas as pd
import pytest

from storage_tpu.models.multi_factor import (
    MultiFactorModel,
    MultiFactorSpotSim,
    create_3_factor_season_params,
    validate_multi_factor_params,
)

SHORT_PLUS_LONG = pd.period_range(start="2020-09-01", periods=25, freq="D").append(
    pd.period_range(start="2030-09-01", periods=25, freq="D")
)


def one_factor_zero_mr():
    return MultiFactorModel(
        "D", [(0.0, {"2020-09-01": 0.36, "2020-10-01": 0.29, "2020-11-01": 0.23})]
    )


def one_factor_pos_mr():
    return MultiFactorModel(
        "D",
        [(2.5, pd.Series(data=np.linspace(0.65, 0.38, num=50), index=SHORT_PLUS_LONG))],
    )


def two_factor_canonical():
    return MultiFactorModel(
        "D",
        factors=[
            (0.0, pd.Series(data=np.linspace(0.53, 0.487, num=50), index=SHORT_PLUS_LONG)),
            (2.5, pd.Series(data=np.linspace(1.45, 1.065, num=50), index=SHORT_PLUS_LONG)),
        ],
        factor_corrs=0.87,
    )


class TestModelAnalytics:
    def test_zero_mr_implied_vol_equals_factor_vol(self):
        model = one_factor_zero_mr()
        implied_vol = model.integrated_vol(date(2020, 8, 5), date(2020, 8, 30), "2020-09-01")
        assert implied_vol == pytest.approx(0.36, abs=1e-14)

    @pytest.mark.parametrize("factory", [one_factor_zero_mr, one_factor_pos_mr])
    def test_single_factor_cross_correlations_equal_one(self, factory):
        model = factory()
        if factory is one_factor_zero_mr:
            fwd_points = ["2020-09-01", "2020-10-01", "2020-11-01"]
            obs = (date(2020, 8, 1), date(2020, 9, 1))
        else:
            fwd_points = list(SHORT_PLUS_LONG[:4])
            obs = (date(2020, 5, 1), date(2020, 9, 1))
        for p1, p2 in itertools.product(fwd_points, fwd_points):
            if p1 != p2:
                assert model.integrated_corr(obs[0], obs[1], p1, p2) == pytest.approx(1.0, abs=1e-13)

    def test_mean_reverting_variance_far_in_future_is_zero(self):
        model = one_factor_pos_mr()
        variance = model.integrated_variance("2020-08-05", "2020-09-01", fwd_contract="2030-09-15")
        assert variance == pytest.approx(0.0, abs=1e-14)

    def test_2f_canonical_vol_far_in_future_equals_non_mr_vol(self):
        model = two_factor_canonical()
        fwd_contract = pd.Period("2030-09-15", freq="D")
        implied_vol = model.integrated_vol("2020-08-05", "2021-08-05", fwd_contract)
        non_mr_vol = float(
            pd.Series(data=np.linspace(0.53, 0.487, num=50), index=SHORT_PLUS_LONG)[fwd_contract]
        )
        assert implied_vol == pytest.approx(non_mr_vol, abs=1e-10)

    def test_corr_spec_forms_equivalent(self):
        factors = [
            (0.0, pd.Series(data=np.linspace(0.53, 0.487, num=50), index=SHORT_PLUS_LONG)),
            (2.5, pd.Series(data=np.linspace(1.45, 1.065, num=50), index=SHORT_PLUS_LONG)),
        ]
        results = []
        for corrs in [0.0, 0, np.array([[1.0, 0.0], [0.0, 1.0]]), np.array([[1, 0], [0, 1]])]:
            model = MultiFactorModel("D", factors=factors, factor_corrs=corrs)
            results.append(
                model.integrated_covar(date(2020, 8, 5), date(2020, 8, 30), "2020-09-01", "2020-09-20")
            )
        assert all(r == results[0] for r in results)

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="factors cannot be empty"):
            validate_multi_factor_params([], None)
        with pytest.raises(ValueError, match="diagonal"):
            validate_multi_factor_params(
                [(0.1, {}), (0.2, {})], np.array([[0.5, 0.0], [0.0, 1.0]])
            )
        with pytest.raises(ValueError, match=r"outside \[-1, 1\]"):
            validate_multi_factor_params(
                [(0.1, {}), (0.2, {})], np.array([[1.0, 1.5], [1.5, 1.0]])
            )
        with pytest.raises(ValueError, match="not square"):
            validate_multi_factor_params([(0.1, {}), (0.2, {})], np.ones((2, 3)))
        with pytest.raises(ValueError, match="sizes must agree"):
            validate_multi_factor_params([(0.1, {})], np.eye(2))
        with pytest.raises(ValueError, match="negative mean reversion"):
            validate_multi_factor_params([(-0.1, {})], np.eye(1))

    def test_missing_vol_curve_point_raises(self):
        model = one_factor_zero_mr()
        with pytest.raises(ValueError, match="No point in vol curve"):
            model.integrated_variance("2020-08-05", "2020-08-30", "2025-01-01")


class TestThreeFactorSeasonalParams:
    def test_structure(self):
        factors, corrs = create_3_factor_season_params(
            "D", 91.0, 0.85, 0.30, 0.19, "2021-04-25", "2022-04-01"
        )
        np.testing.assert_array_equal(corrs, np.eye(3))
        (mr_spot, spot_curve), (mr_lt, lt_curve), (mr_sw, sw_curve) = factors
        assert mr_spot == 91.0 and mr_lt == 0.0 and mr_sw == 0.0
        assert (spot_curve == 0.85).all()
        assert (lt_curve == 0.30).all()
        # Seasonal factor: amplitude seasonal_vol/2, peaks Feb-1.
        assert sw_curve.abs().max() <= 0.19 / 2 + 1e-12
        feb1 = pd.Period("2022-02-01", freq="D")
        assert sw_curve[feb1] == pytest.approx(0.19 / 2, rel=1e-3)
        # Troughs near Aug-1 (half a year from peak).
        aug1 = pd.Period("2021-08-01", freq="D")
        assert sw_curve[aug1] == pytest.approx(-0.19 / 2, rel=1e-2)


class TestSimulatorMoments:
    """Simulated moments must match the closed-form model (martingale forward,
    integrated variance) within Monte-Carlo error."""

    def setup_sim(self, antithetic=False, num_factors=2):
        periods = [pd.Period(p, freq="D") for p in ["2020-08-01", "2021-01-15", "2021-07-30"]]
        vol1 = {p: v for p, v in zip(periods, [0.35, 0.29, 0.32])}
        vol2 = {p: v for p, v in zip(periods, [0.95, 0.92, 0.89])}
        factors = [(0.0, vol1), (2.5, vol2)][: num_factors]
        corrs = np.array([[1.0, 0.6], [0.6, 1.0]])[:num_factors, :num_factors]
        fwd = {periods[0]: 56.85, periods[1]: 59.08, periods[2]: 62.453}
        sim = MultiFactorSpotSim(
            "D", factors, corrs, date(2020, 7, 27), fwd, periods, seed=12,
            antithetic=antithetic,
        )
        return sim, periods, fwd, factors, corrs

    def test_shapes_and_determinism(self):
        sim, periods, *_ = self.setup_sim()
        df1 = sim.simulate(16)
        df2 = sim.simulate(16)
        assert df1.shape == (3, 16)
        assert list(df1.index) == periods
        pd.testing.assert_frame_equal(df1, df2)  # same seed -> same draws

    def test_martingale_property(self):
        sim, periods, fwd, *_ = self.setup_sim()
        spots = sim.simulate(200_000)
        for p in periods:
            mean = spots.loc[p].mean()
            # Standard error ~ vol * F / sqrt(n); allow 4 sigma.
            assert mean == pytest.approx(fwd[p], rel=0.02)

    def test_antithetic_exact_martingale_in_log(self):
        sim, periods, *_ = self.setup_sim(antithetic=True)
        spots, factors = sim.simulate_with_factors(10_000)
        # Antithetic pairs: factor states average to exactly zero.
        assert float(np.abs(np.asarray(factors).mean(axis=-1)).max()) < 1e-4

    def test_terminal_log_variance_matches_closed_form(self):
        sim, periods, fwd, factors, corrs = self.setup_sim()
        model = MultiFactorModel("D", factors, corrs)
        spots = sim.simulate(200_000)
        for p in periods:
            sample_var = np.var(np.log(spots.loc[p].to_numpy()))
            closed = model.integrated_variance(date(2020, 7, 27), p, p)
            assert sample_var == pytest.approx(closed, rel=0.03)

    def test_factor_cross_correlation_matches_spec(self):
        sim, periods, *_ = self.setup_sim()
        _spots, factors = sim.simulate_with_factors(100_000)
        f = np.asarray(factors)[0]  # first period, [F, S]
        corr = np.corrcoef(f)
        assert corr[0, 1] == pytest.approx(0.6, abs=0.02)

    def test_sim_period_not_after_current_date_raises(self):
        periods = [pd.Period("2020-07-27", freq="D")]
        with pytest.raises(ValueError, match="after the current date"):
            MultiFactorSpotSim(
                "D", [(0.0, {periods[0]: 0.3})], None, date(2020, 7, 27),
                {periods[0]: 50.0}, periods, seed=1,
            )
