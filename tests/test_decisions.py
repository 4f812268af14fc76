"""Bang-bang decision-set micro-tests.

Mirrors the reference kernel test strategy in
``tests/Cmdty.Storage.Test/StorageHelperTest.cs:39-608`` (unconstrained /
forced-positive / forced-negative / next-step-constrained cases, with and
without extra decisions), plus parity checks between the exact host kernel and
the fixed-width jit kernel.
"""
import numpy as np
import pytest

from storage_tpu.ops.decisions import (
    bang_bang_decision_set,
    bang_bang_decisions_fixed,
    decision_width,
    max_value_and_index,
)

TOL = 1e-12


class TestBangBangExact:
    def test_unconstrained_three_decisions(self):
        ds = bang_bang_decision_set(-150.0, 250.0, 500.0, 0.0, 0.0, 2000.0, TOL)
        np.testing.assert_allclose(ds, [-150.0, 0.0, 250.0])

    def test_withdraw_constrained_by_next_min(self):
        # Max withdrawal would drop below next-step min inventory.
        ds = bang_bang_decision_set(-150.0, 250.0, 100.0, 0.0, 20.0, 2000.0, TOL)
        np.testing.assert_allclose(ds, [-80.0, 0.0, 250.0])

    def test_inject_constrained_by_next_max(self):
        ds = bang_bang_decision_set(-150.0, 250.0, 1900.0, 0.0, 0.0, 2000.0, TOL)
        np.testing.assert_allclose(ds, [-150.0, 0.0, 100.0])

    def test_forced_injection_no_zero(self):
        # Next-step min above current inventory: even "max withdrawal" must inject.
        ds = bang_bang_decision_set(-150.0, 250.0, 100.0, 0.0, 150.0, 2000.0, TOL)
        np.testing.assert_allclose(ds, [50.0, 250.0])

    def test_forced_withdrawal_no_zero(self):
        ds = bang_bang_decision_set(-150.0, 250.0, 1000.0, 0.0, 0.0, 900.0, TOL)
        np.testing.assert_allclose(ds, [-150.0, -100.0])

    def test_inventory_loss_shifts_decisions(self):
        # 2% loss on 1000 = 20 lost before decisions apply.
        ds = bang_bang_decision_set(-150.0, 250.0, 1000.0, 20.0, 0.0, 2000.0, TOL)
        np.testing.assert_allclose(ds, [-150.0, 0.0, 250.0])
        # Constrained inject: inventory after loss 980 + 250 > 1100
        ds = bang_bang_decision_set(-150.0, 250.0, 1000.0, 20.0, 0.0, 1100.0, TOL)
        np.testing.assert_allclose(ds, [-150.0, 0.0, 120.0])

    def test_extra_decisions_spanning_zero(self):
        ds = bang_bang_decision_set(-100.0, 200.0, 500.0, 0.0, 0.0, 2000.0, TOL, extra_decisions=1)
        np.testing.assert_allclose(ds, [-100.0, -50.0, 0.0, 100.0, 200.0])

    def test_extra_decisions_forced(self):
        ds = bang_bang_decision_set(-150.0, 250.0, 100.0, 0.0, 150.0, 2000.0, TOL, extra_decisions=2)
        np.testing.assert_allclose(ds, [50.0, 50 + 200 / 3, 50 + 400 / 3, 250.0])

    def test_tolerance_breach_clamps(self):
        # Breach below numerical tolerance: clamp instead of raise.
        ds = bang_bang_decision_set(-150.0, 250.0, 100.0, 0.0, 0.0, 2000.0, 1e-6)
        assert len(ds) == 3
        with pytest.raises(ValueError):
            bang_bang_decision_set(-150.0, -140.0, 100.0, 0.0, 500.0, 2000.0, TOL)

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            bang_bang_decision_set(-1.0, 1.0, 0.0, 0.0, 10.0, 5.0, TOL)
        with pytest.raises(ValueError):
            bang_bang_decision_set(-1.0, 1.0, 0.0, 0.0, 0.0, 5.0, TOL, extra_decisions=-1)


class TestBangBangFixedWidth:
    @pytest.mark.parametrize("extra", [0, 1, 3])
    @pytest.mark.parametrize(
        "case",
        [
            dict(min_rate=-150.0, max_rate=250.0, inv=500.0, loss=0.0, lo=0.0, hi=2000.0),
            dict(min_rate=-150.0, max_rate=250.0, inv=100.0, loss=0.0, lo=150.0, hi=2000.0),
            dict(min_rate=-150.0, max_rate=250.0, inv=1000.0, loss=0.0, lo=0.0, hi=900.0),
            dict(min_rate=-150.0, max_rate=250.0, inv=1000.0, loss=20.0, lo=0.0, hi=1100.0),
        ],
    )
    def test_matches_exact_as_set(self, extra, case):
        exact = bang_bang_decision_set(
            case["min_rate"], case["max_rate"], case["inv"], case["loss"],
            case["lo"], case["hi"], TOL, extra,
        )
        fixed = np.asarray(
            bang_bang_decisions_fixed(
                case["min_rate"], case["max_rate"], case["inv"], case["loss"],
                case["lo"], case["hi"], extra,
            )
        )
        assert fixed.shape == (decision_width(extra),)
        # Fixed-width output contains exactly the exact decisions (duplicates allowed).
        np.testing.assert_allclose(np.unique(fixed.round(9)), np.unique(exact.round(9)), atol=1e-6)

    def test_batched_shapes(self):
        inv = np.array([100.0, 500.0, 1900.0])
        out = bang_bang_decisions_fixed(-150.0, 250.0, inv, 0.0, 0.0, 2000.0, 1)
        assert out.shape == (3, 5)


def test_max_value_and_index_first_occurrence():
    value, idx = max_value_and_index(np.array([1.0, 3.0, 3.0, 2.0]))
    assert value == 3.0 and idx == 1


class TestReferenceNumericCases:
    """The reference's exact numeric decision-set cases
    (``StorageHelperTest.cs:37-260``), range (-15.5, 65.685), inventory 1010,
    loss 10."""

    @pytest.mark.parametrize("next_lo,next_hi,extra,expected", [
        # Unconstrained: min/max rates with zero.
        (900.0, 1070.0, 0, [-15.5, 0.0, 65.685]),
        (900.0, 1070.0, 1, [-15.5, -7.75, 0.0, 32.8425, 65.685]),
        # Next-step bounds bite on both sides, still spanning zero.
        (991.87, 1051.8, 0, [-8.13, 0.0, 51.8]),
        (991.87, 1051.8, 1, [-8.13, -4.065, 0.0, 25.9, 51.8]),
        # Next max below post-loss inventory: forced withdrawal, no zero.
        (900.0, 995.8, 0, [-15.5, -4.2]),
        (900.0, 995.8, 1, [-15.5, -9.85, -4.2]),
        # Next min above post-loss inventory: forced injection, no zero.
        (1001.8, 1009.51, 0, [1.8, 9.51]),
        (1001.8, 1009.51, 1, [1.8, 5.655, 9.51]),
    ])
    def test_reference_case(self, next_lo, next_hi, extra, expected):
        decisions = bang_bang_decision_set(
            -15.5, 65.685, 1010.0, 10.0, next_lo, next_hi, TOL, extra
        )
        np.testing.assert_allclose(np.asarray(decisions), expected, atol=1e-9)
