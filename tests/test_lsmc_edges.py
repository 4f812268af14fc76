"""LSMC edge-period semantics + panel consistency + granularity coverage.

Reference: edge-period tests (``Lsmc/LsmcStorageValuationTest.cs:204-306``),
panel shape assertions (``test_multi_factor.py:233-239``).
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import (
    CmdtyStorage,
    InventoryConstraintsCannotBeFulfilledError,
    multi_factor_value,
)


def simple_storage(terminal=None, **kw):
    args = dict(
        freq="D", storage_start="2021-01-01", storage_end="2021-02-01",
        injection_cost=0.1, withdrawal_cost=0.1,
        min_inventory=0.0, max_inventory=100.0,
        max_injection_rate=10.0, max_withdrawal_rate=10.0,
        terminal_storage_npv=terminal,
    )
    args.update(kw)
    return CmdtyStorage(**args)


def curve(value=25.0, start="2021-01-01", end="2021-02-01", freq="D"):
    idx = pd.period_range(start, end, freq=freq)
    return pd.Series(value, index=idx)


def value(storage, val_date, inventory, fwd=None, **kw):
    fwd = curve() if fwd is None else fwd
    vol = pd.Series(0.5, index=fwd.index)
    args = dict(
        factors=[(1.0, vol)], factor_corrs=None, num_sims=128,
        basis_funcs="1 + x0", discount_deltas=False, seed=1,
    )
    args.update(kw)
    return multi_factor_value(storage, val_date, inventory, fwd, None, None, **args)


class TestEdgePeriods:
    def test_expired_returns_empty_results(self):
        results = value(simple_storage(), "2021-03-01", 0.0)
        assert results.npv == 0.0
        assert len(results.deltas) == 0
        assert len(results.expected_profile) == 0
        assert len(results.trigger_prices) == 0

    def test_end_period_must_be_empty_with_inventory_raises(self):
        with pytest.raises(InventoryConstraintsCannotBeFulfilledError):
            value(simple_storage(), "2021-02-01", 5.0)

    def test_end_period_terminal_value(self):
        storage = simple_storage(terminal=lambda p, i: 0.8 * p * i)
        results = value(storage, "2021-02-01", 10.0)
        assert results.npv == pytest.approx(0.8 * 25.0 * 10.0)
        assert results.intrinsic_npv == pytest.approx(results.npv)

    def test_negative_inventory_raises(self):
        with pytest.raises(ValueError, match="negative"):
            value(simple_storage(), "2021-01-01", -1.0)

    def test_progress_reaches_one_for_expired(self):
        progresses = []
        value(simple_storage(), "2021-03-01", 0.0, on_progress_update=progresses.append)
        assert progresses == [1.0]


class TestPanelsConsistency:
    def test_panel_means_match_expected_profile(self):
        results = value(simple_storage(), "2021-01-01", 50.0, num_sims=256,
                        return_sim_panels=True)
        np.testing.assert_allclose(
            results.sim_inventory.mean(axis=1).to_numpy(),
            results.expected_profile["inventory"].to_numpy(),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            results.sim_pv.mean(axis=1).to_numpy(),
            results.expected_profile["period_pv"].to_numpy(),
            rtol=1e-4, atol=1e-2,
        )
        # NPV equals the mean of summed per-period per-sim PVs.
        assert results.npv == pytest.approx(
            float(results.sim_pv.to_numpy().sum(axis=0).mean()), rel=1e-5
        )
        # Inventory dynamics: inv[k+1] = inv[k] + volume[k] - loss[k] per sim.
        inv = results.sim_inventory.to_numpy()
        vol = results.sim_inject_withdraw.to_numpy()
        loss = results.sim_inventory_loss.to_numpy()
        np.testing.assert_allclose(inv[1:], inv[:-1] + vol[:-1] - loss[:-1], atol=1e-3)

    def test_panels_empty_when_not_requested(self):
        results = value(simple_storage(), "2021-01-01", 50.0, return_sim_panels=False)
        assert results.sim_inventory.shape[1] == 0
        assert len(results.expected_profile) > 0  # means still produced


class TestTwoFactorConsistency:
    def test_uncorrelated_second_factor_with_zero_vol_changes_nothing(self):
        storage = simple_storage()
        fwd = curve(25.0)
        vol = pd.Series(0.5, index=fwd.index)
        zero_vol = pd.Series(1e-12, index=fwd.index)
        one_factor = multi_factor_value(
            storage, "2021-01-01", 50.0, fwd, None, None,
            factors=[(1.0, vol)], factor_corrs=None,
            num_sims=512, basis_funcs="1 + x0 + x0**2", discount_deltas=False, seed=9,
        )
        two_factor = multi_factor_value(
            storage, "2021-01-01", 50.0, fwd, None, None,
            factors=[(1.0, vol), (0.0, zero_vol)], factor_corrs=0.0,
            num_sims=512, basis_funcs="1 + x0 + x0**2", discount_deltas=False, seed=9,
        )
        # Same dynamics (second factor inert): values agree to MC/regression noise.
        assert two_factor.npv == pytest.approx(one_factor.npv, rel=0.02)


class TestGranularities:
    @pytest.mark.parametrize("freq,start,end,n_expected", [
        ("h", "2021-01-01 00:00", "2021-01-03 00:00", 49),
        ("30min", "2021-01-01 00:00", "2021-01-02 00:00", 49),
        ("M", "2021-01", "2021-12", 12),
        ("Q", "2021Q1", "2022Q1", 5),
    ])
    def test_valuation_at_all_granularities(self, freq, start, end, n_expected):
        idx = pd.period_range(start, end, freq=freq)
        assert len(idx) == n_expected
        storage = CmdtyStorage(
            freq=freq, storage_start=start, storage_end=end,
            injection_cost=0.1, withdrawal_cost=0.1,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=10.0, max_withdrawal_rate=10.0,
        )
        fwd = pd.Series(20.0 + np.sin(np.arange(len(idx))), index=idx)
        vol = pd.Series(0.5, index=idx)
        results = multi_factor_value(
            storage, start, 20.0, fwd, None, None,
            factors=[(1.0, vol)], factor_corrs=None,
            num_sims=64, basis_funcs="1 + x0", discount_deltas=False, seed=2,
            num_inventory_grid_points=20,
        )
        assert np.isfinite(results.npv)
        assert len(results.deltas) == len(idx)

    def test_hourly_long_horizon_smoke(self):
        # Two months hourly (~1,400 steps): exercises long-horizon scans and
        # the native inventory-space reduction at scale.
        idx = pd.period_range("2021-01-01 00:00", "2021-03-01 00:00", freq="h")
        storage = CmdtyStorage(
            freq="h", storage_start=idx[0], storage_end=idx[-1],
            injection_cost=0.01, withdrawal_cost=0.01,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=5.0, max_withdrawal_rate=5.0,
        )
        fwd = pd.Series(20.0 + 2.0 * np.sin(np.arange(len(idx)) / 24.0), index=idx)
        vol = pd.Series(1.0, index=idx)
        results = multi_factor_value(
            storage, idx[0], 100.0, fwd, None, None,
            factors=[(20.0, vol)], factor_corrs=None,
            num_sims=64, basis_funcs="1 + x0", discount_deltas=False, seed=3,
            num_inventory_grid_points=30, return_sim_panels=False,
        )
        assert np.isfinite(results.npv)
        assert len(results.expected_profile) == len(idx)


class TestAntitheticApi:
    def test_antithetic_reduces_variance_of_npv(self):
        storage = simple_storage()
        fwd = curve()
        vol = pd.Series(0.5, index=fwd.index)

        def npv(seed, antithetic):
            return multi_factor_value(
                storage, "2021-01-01", 50.0, fwd, None, None,
                factors=[(1.0, vol)], factor_corrs=None,
                num_sims=256, basis_funcs="1 + x0", discount_deltas=False,
                seed=seed, antithetic=antithetic, return_sim_panels=False,
            ).npv

        plain = np.array([npv(s, False) for s in range(8)])
        anti = np.array([npv(s, True) for s in range(8)])
        # Antithetic variates must not shift the level and should not blow up
        # the spread (usually reduce it).
        assert anti.mean() == pytest.approx(plain.mean(), rel=0.05)
        assert anti.std() <= plain.std() * 1.5
