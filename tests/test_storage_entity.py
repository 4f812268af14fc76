"""CmdtyStorage constructor/validation matrix.

Mirrors the reference Python suite ``tests/test_cmdty_storage.py:106-445``:
every scalar/Series parameter combination, mutual-exclusion errors, and the
read accessors.
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, InjectWithdrawRange, RatchetInterp


def daily_series(start, end, value):
    idx = pd.period_range(start=start, end=end, freq="D")
    return pd.Series(data=[value] * len(idx), index=idx)


def make_simple(**overrides):
    kwargs = dict(
        freq="D",
        storage_start="2021-04-01",
        storage_end="2022-04-01",
        injection_cost=0.01,
        withdrawal_cost=0.025,
        min_inventory=0.0,
        max_inventory=1500.0,
        max_injection_rate=25.5,
        max_withdrawal_rate=30.9,
    )
    kwargs.update(overrides)
    return CmdtyStorage(**kwargs)


RATCHETS = [
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
]


class TestConstruction:
    def test_simple_storage_accessors(self):
        storage = make_simple()
        assert storage.freq == "D"
        assert storage.start == pd.Period("2021-04-01", freq="D")
        assert storage.end == pd.Period("2022-04-01", freq="D")
        assert storage.empty_at_end  # no terminal npv
        assert storage.min_inventory("2021-06-01") == 0.0
        assert storage.max_inventory("2021-06-01") == 1500.0
        rng = storage.inject_withdraw_range("2021-06-01", 700.0)
        assert rng == InjectWithdrawRange(-30.9, 25.5)

    def test_costs_and_consumption_accessors(self):
        storage = make_simple(
            cmdty_consumed_inject=0.01,
            cmdty_consumed_withdraw=0.02,
            inventory_loss=0.001,
            inventory_cost=0.03,
        )
        p = "2021-06-01"
        assert storage.injection_cost(p, 100.0, 10.0) == pytest.approx(0.1)
        assert storage.withdrawal_cost(p, 100.0, 10.0) == pytest.approx(0.25)
        assert storage.cmdty_consumed_inject(p, 100.0, 10.0) == pytest.approx(0.1)
        assert storage.cmdty_consumed_withdraw(p, 100.0, 10.0) == pytest.approx(0.2)
        assert storage.inventory_pcnt_loss(p) == pytest.approx(0.001)
        assert storage.inventory_cost(p, 100.0) == pytest.approx(3.0)

    def test_series_parameters(self):
        inj_cost = daily_series("2021-04-01", "2022-04-01", 0.5)
        max_inv = daily_series("2021-04-01", "2022-04-01", 1200.0)
        storage = make_simple(injection_cost=inj_cost, max_inventory=max_inv)
        assert storage.injection_cost("2021-07-01", 0.0, 2.0) == pytest.approx(1.0)
        assert storage.max_inventory("2021-07-01") == 1200.0

    def test_terminal_npv_callable(self):
        storage = make_simple(terminal_storage_npv=lambda price, inv: 0.95 * price * inv)
        assert not storage.empty_at_end
        assert storage.terminal_storage_npv(10.0, 100.0) == pytest.approx(950.0)

    def test_inject_withdraw_range_at_end_is_zero(self):
        storage = make_simple(terminal_storage_npv=lambda p, i: 0.0)
        assert storage.inject_withdraw_range("2022-04-01", 0.0) == InjectWithdrawRange(0.0, 0.0)

    def test_inventory_bounds_validated(self):
        storage = make_simple()
        with pytest.raises(ValueError):
            storage.inject_withdraw_range("2021-06-01", -1.0)
        with pytest.raises(ValueError):
            storage.inject_withdraw_range("2021-06-01", 1501.0)


class TestRatchets:
    def test_linear_ratchet_interpolation(self):
        storage = CmdtyStorage(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2022-04-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            ratchets=RATCHETS,
            ratchet_interp=RatchetInterp.LINEAR,
        )
        assert storage.min_inventory("2021-06-01") == 0.0
        assert storage.max_inventory("2021-06-01") == 7000.0
        # Midpoint of first segment
        rng = storage.inject_withdraw_range("2021-06-01", 1000.0)
        assert rng.min_inject_withdraw_rate == pytest.approx(-175.0)
        assert rng.max_inject_withdraw_rate == pytest.approx(212.5)

    def test_ratchet_table_switches_by_period(self):
        # Storage extends past the second table date.
        storage = CmdtyStorage(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2022-12-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            ratchets=RATCHETS,
            ratchet_interp=RatchetInterp.LINEAR,
            terminal_storage_npv=lambda p, i: 0.0,
        )
        rng_before = storage.inject_withdraw_range("2022-09-30", 0.0)
        rng_after = storage.inject_withdraw_range("2022-10-01", 0.0)
        assert rng_before.max_inject_withdraw_rate == pytest.approx(250.0)
        assert rng_after.max_inject_withdraw_rate == pytest.approx(260.0)

    def test_step_ratchet_floor_lookup(self):
        storage = CmdtyStorage(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2022-04-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            ratchets=[
                (
                    "2021-04-01",
                    [(0.0, -60.0, 20.0), (50.0, -80.0, 15.0), (100.0, -80.0, 15.0)],
                )
            ],
            ratchet_interp=RatchetInterp.STEP,
            terminal_storage_npv=lambda p, i: 0.0,
        )
        assert storage.inject_withdraw_range("2021-06-01", 25.0) == InjectWithdrawRange(-60.0, 20.0)
        assert storage.inject_withdraw_range("2021-06-01", 75.0) == InjectWithdrawRange(-80.0, 15.0)

    def test_step_ratchet_validation(self):
        with pytest.raises(ValueError, match="Top two ratchets"):
            CmdtyStorage(
                freq="D",
                storage_start="2021-04-01",
                storage_end="2022-04-01",
                injection_cost=0.01,
                withdrawal_cost=0.025,
                ratchets=[("2021-04-01", [(0.0, -60.0, 20.0), (100.0, -80.0, 15.0)])],
                ratchet_interp=RatchetInterp.STEP,
                terminal_storage_npv=lambda p, i: 0.0,
            )


class TestValidationMatrix:
    @pytest.mark.parametrize(
        "bad_kwargs,match",
        [
            (dict(ratchets=RATCHETS), "ratchet_interp parameter should be provided"),
            (dict(min_inventory=None), "min_inventory parameter should be provided"),
            (dict(max_inventory=None), "max_inventory parameter should be provided"),
            (dict(max_injection_rate=None), "max_injection_rate parameter should be provided"),
            (dict(max_withdrawal_rate=None), "max_withdrawal_rate parameter should be provided"),
            (dict(ratchet_interp=RatchetInterp.LINEAR), "ratchet_interp should not be provided"),
        ],
    )
    def test_mutual_exclusion_errors(self, bad_kwargs, match):
        kwargs = dict(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2022-04-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            min_inventory=0.0,
            max_inventory=1500.0,
            max_injection_rate=25.5,
            max_withdrawal_rate=30.9,
        )
        if "ratchets" in bad_kwargs:
            kwargs.update(min_inventory=None, max_inventory=None, max_injection_rate=None, max_withdrawal_rate=None)
        kwargs.update(bad_kwargs)
        with pytest.raises(ValueError, match=match):
            CmdtyStorage(**kwargs)

    @pytest.mark.parametrize(
        "ratchet_conflict",
        ["min_inventory", "max_inventory", "max_injection_rate", "max_withdrawal_rate"],
    )
    def test_ratchets_exclude_rate_params(self, ratchet_conflict):
        kwargs = dict(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2022-04-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            ratchets=RATCHETS,
            ratchet_interp=RatchetInterp.LINEAR,
        )
        kwargs[ratchet_conflict] = 1.0
        with pytest.raises(ValueError, match="should not be provided if ratchets"):
            CmdtyStorage(**kwargs)

    def test_unsupported_freq(self):
        with pytest.raises(ValueError, match="freq"):
            make_simple(freq="W")

    def test_start_after_end(self):
        with pytest.raises(ValueError, match="before end"):
            make_simple(storage_start="2022-05-01")

    def test_series_too_short_raises(self):
        short = daily_series("2021-04-01", "2021-06-01", 0.5)
        with pytest.raises(ValueError, match="ends at"):
            make_simple(injection_cost=short)

    def test_series_starting_late_raises(self):
        late = daily_series("2021-05-01", "2022-04-01", 0.5)
        with pytest.raises(ValueError, match="starts at"):
            make_simple(injection_cost=late)

    @pytest.mark.parametrize("freq", ["15min", "30min", "H", "h", "D", "M", "Q"])
    def test_all_supported_freqs_construct(self, freq):
        storage = CmdtyStorage(
            freq=freq,
            storage_start="2021-01-01",
            storage_end="2022-01-01",
            injection_cost=0.01,
            withdrawal_cost=0.025,
            min_inventory=0.0,
            max_inventory=100.0,
            max_injection_rate=5.0,
            max_withdrawal_rate=5.0,
        )
        assert storage.num_decision_steps >= 1


class TestPolynomialRatchets:
    """Polynomial ratchet interpolation (reference C#-only
    InterpolationType.Polynomial, PolynomialInjectWithdrawConstraint.cs)."""

    def make(self):
        return CmdtyStorage(
            freq="D",
            storage_start="2021-04-01",
            storage_end="2021-06-01",
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
                )
            ],
            ratchet_interp=RatchetInterp.POLYNOMIAL,
            terminal_storage_npv=lambda p, i: 0.0,
        )

    def test_exact_fit_through_pillars(self):
        storage = self.make()
        for inv, min_r, max_r in [
            (0.0, -150.0, 250.0),
            (2000.0, -200.0, 175.0),
            (5000.0, -260.0, 155.0),
            (7000.0, -275.0, 132.0),
        ]:
            rng = storage.inject_withdraw_range("2021-05-01", inv)
            assert rng.min_inject_withdraw_rate == pytest.approx(min_r, abs=1e-6)
            assert rng.max_inject_withdraw_rate == pytest.approx(max_r, abs=1e-6)

    def test_midpoint_differs_from_linear(self):
        poly = self.make().inject_withdraw_range("2021-05-01", 1000.0)
        # Cubic through the four points is not the chord at the midpoint.
        assert poly.max_inject_withdraw_rate != pytest.approx(212.5, abs=1e-3)

    def test_intrinsic_valuation_runs_with_polynomial_ratchets(self):
        import storage_tpu

        idx = pd.period_range("2021-04-01", "2021-06-01", freq="D")
        fwd = pd.Series(15.0 + 2.0 * np.sin(np.arange(len(idx)) / 5.0), index=idx)
        results = storage_tpu.intrinsic_value(
            self.make(), "2021-04-01", 1500.0, fwd, None, None
        )
        assert np.isfinite(results.npv)
        assert results.npv > 0
