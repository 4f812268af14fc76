"""Headline integration test: the reference README's 3-factor seasonal example.

Reference inputs: ``readme_example.py:1-79`` / ``README.md:139-183``; reference
outputs (Mersenne-Twister seed 12, 2,000 sims): Full NPV 69,496, Intrinsic
38,446, Extrinsic 31,049 (``README.md:177-183``).

This build's values are HIGHER on the same inputs — legitimately: both engines
compute lower-bound estimates of the same true storage value, and this
engine's fixed-count linspace grids resolve the must-be-empty endgame far
better than the reference's global-spacing grids (verified against an
independent fine-grid brute-force DP: intrinsic optimum 40,991 vs this
engine's 40,976 vs the reference's 38,446).  The assertions below lock both
properties: we must beat the reference's realized values, and stay at our
pinned levels (threefry golden regression).
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, RatchetInterp, three_factor_seasonal_value

REFERENCE_FULL_NPV = 69_496.0
REFERENCE_INTRINSIC_NPV = 38_446.0
BRUTE_FORCE_INTRINSIC_OPTIMUM = 40_990.8  # float64 DP, 1500 grid pts, 81 decisions
PINNED_INTRINSIC = 40_976.2  # this build, G=100
PINNED_FULL_NPV = 77_886.0  # this build, 2000 sims, threefry seed 12


def readme_storage():
    return CmdtyStorage(
        freq="D",
        storage_start="2021-04-01",
        storage_end="2022-04-01",
        injection_cost=0.01,
        withdrawal_cost=0.025,
        ratchets=[
            (
                "2021-04-01",
                [
                    (0.0, -150.0, 250.0),
                    (2000.0, -200.0, 175.0),
                    (5000.0, -260.0, 155.0),
                    (7000.0, -275.0, 132.0),
                ],
            ),
            (
                "2022-10-01",
                [
                    (0.0, -130.0, 260.0),
                    (2000.0, -190.0, 190.0),
                    (5000.0, -230.0, 165.0),
                    (7000.0, -245.0, 148.0),
                ],
            ),
        ],
        ratchet_interp=RatchetInterp.LINEAR,
    )


def readme_market():
    monthly_index = pd.period_range(start="2021-04-25", periods=25, freq="M")
    monthly_fwd = [
        16.61, 15.68, 15.42, 15.31, 15.27, 15.13, 15.96, 17.22, 17.32, 17.66,
        17.59, 16.81, 15.36, 14.49, 14.28, 14.25, 14.32, 14.33, 15.30, 16.58,
        16.64, 16.79, 16.64, 15.90, 14.63,
    ]
    fwd_curve = pd.Series(monthly_fwd, index=monthly_index).resample("D").ffill()
    rates = pd.Series(
        [0.005, 0.006, 0.0072, 0.0087, 0.0101, 0.0115, 0.0126],
        index=pd.PeriodIndex(
            freq="D",
            data=[
                "2021-04-25", "2021-06-01", "2021-08-01", "2021-12-01",
                "2022-04-01", "2022-12-01", "2023-12-01",
            ],
        ),
    )
    ir_curve = rates.resample("D").asfreq().interpolate(method="linear")
    return fwd_curve, ir_curve


def settlement_rule(delivery_date):
    return delivery_date.asfreq("M").asfreq("D", "end") + 20


@pytest.fixture(scope="module")
def readme_results():
    fwd_curve, ir_curve = readme_market()
    return three_factor_seasonal_value(
        cmdty_storage=readme_storage(),
        val_date="2021-04-25",
        inventory=1500.0,
        fwd_curve=fwd_curve,
        interest_rates=ir_curve,
        settlement_rule=settlement_rule,
        num_sims=2000,
        seed=12,
        spot_mean_reversion=91.0,
        spot_vol=0.85,
        long_term_vol=0.30,
        seasonal_vol=0.19,
        basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
        discount_deltas=True,
    )


class TestReadmeExample:
    def test_intrinsic_beats_reference_and_near_optimum(self, readme_results):
        assert readme_results.intrinsic_npv > REFERENCE_INTRINSIC_NPV
        assert readme_results.intrinsic_npv <= BRUTE_FORCE_INTRINSIC_OPTIMUM * (1 + 1e-4)
        assert readme_results.intrinsic_npv == pytest.approx(PINNED_INTRINSIC, rel=1e-3)

    def test_full_npv_beats_reference(self, readme_results):
        assert readme_results.npv > REFERENCE_FULL_NPV
        # Threefry golden pin (CPU f32); MC-seeded, deterministic per seed.
        assert readme_results.npv == pytest.approx(PINNED_FULL_NPV, rel=5e-3)

    def test_extrinsic_positive_and_consistent(self, readme_results):
        assert readme_results.extrinsic_npv == pytest.approx(
            readme_results.npv - readme_results.intrinsic_npv
        )
        assert readme_results.extrinsic_npv > 0.0

    def test_result_shapes(self, readme_results):
        n_periods = len(pd.period_range("2021-04-25", "2022-04-01", freq="D"))
        assert len(readme_results.deltas) == n_periods
        assert len(readme_results.expected_profile) == n_periods
        assert readme_results.sim_inventory.shape == (n_periods, 2000)
        assert readme_results.sim_pv.shape == (n_periods, 2000)
        # Simulated-period panels exclude the deterministic current period.
        assert readme_results.sim_spot_regress.shape == (n_periods - 1, 2000)
        assert len(readme_results.trigger_prices) == n_periods - 1
        # Expected inventory starts at the starting inventory and ends empty.
        inv = readme_results.expected_profile["inventory"]
        assert inv.iloc[0] == pytest.approx(1500.0)
        assert inv.iloc[-1] == pytest.approx(0.0, abs=1e-3)

    def test_deltas_sane(self, readme_results):
        # Deltas bounded by the max daily ratchet rates.
        deltas = readme_results.deltas
        assert deltas.abs().max() <= 275.0 + 1e-6
