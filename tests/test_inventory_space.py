"""Inventory-space reduction micro-tests.

Mirrors the reference's ``StorageHelperTest.cs`` CalculateInventorySpace cases:
forward/backward reachability, must-be-empty pull-down, infeasible configs.
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage
from storage_tpu.exceptions import InventoryConstraintsCannotBeFulfilledError
from storage_tpu.ops.inventory_space import calculate_inventory_space
from storage_tpu.ops.ratchets import INTERP_LINEAR, INTERP_STEP


def constant_tables(n, min_inv, max_inv, withdraw, inject):
    return [
        np.array([[min_inv, -withdraw, inject], [max_inv, -withdraw, inject]])
        for _ in range(n)
    ]


class TestConstantRates:
    def test_forward_reachability_limits_early_steps(self):
        n = 5
        space = calculate_inventory_space(
            constant_tables(n, 0.0, 1000.0, 60.0, 50.0),
            INTERP_LINEAR,
            np.zeros(n + 1),
            np.full(n + 1, 1000.0),
            np.zeros(n),
            starting_inventory=100.0,
            must_be_empty_at_end=False,
        )
        # Max grows by 50/step from 100; min shrinks by 60/step floored at 0.
        np.testing.assert_allclose(space.max_inventory, [100, 150, 200, 250, 300, 350])
        np.testing.assert_allclose(space.min_inventory, [100, 40, 0, 0, 0, 0])

    def test_must_be_empty_pulls_down_tail(self):
        n = 4
        space = calculate_inventory_space(
            constant_tables(n, 0.0, 1000.0, 100.0, 100.0),
            INTERP_LINEAR,
            np.zeros(n + 1),
            np.full(n + 1, 1000.0),
            np.zeros(n),
            starting_inventory=250.0,
            must_be_empty_at_end=True,
        )
        # Backward from 0: max = 100*k periods before end.
        np.testing.assert_allclose(space.max_inventory, [250, 300, 200, 100, 0])
        np.testing.assert_allclose(space.min_inventory, [250, 150, 50, 0, 0])

    def test_infeasible_raises(self):
        n = 2
        with pytest.raises(InventoryConstraintsCannotBeFulfilledError):
            calculate_inventory_space(
                constant_tables(n, 0.0, 1000.0, 10.0, 10.0),
                INTERP_LINEAR,
                np.zeros(n + 1),
                np.full(n + 1, 1000.0),
                np.zeros(n),
                starting_inventory=500.0,
                must_be_empty_at_end=True,  # cannot empty 500 in 2 steps of 10
            )

    def test_starting_inventory_out_of_bounds_raises(self):
        n = 2
        with pytest.raises(InventoryConstraintsCannotBeFulfilledError):
            calculate_inventory_space(
                constant_tables(n, 0.0, 100.0, 10.0, 10.0),
                INTERP_LINEAR,
                np.zeros(n + 1),
                np.full(n + 1, 100.0),
                np.zeros(n),
                starting_inventory=150.0,
                must_be_empty_at_end=False,
            )

    def test_inventory_loss_enters_forward_and_backward(self):
        n = 2
        space = calculate_inventory_space(
            constant_tables(n, 0.0, 1000.0, 0.0, 0.0),  # no flows allowed
            INTERP_LINEAR,
            np.zeros(n + 1),
            np.full(n + 1, 1000.0),
            np.full(n, 0.1),
            starting_inventory=100.0,
            must_be_empty_at_end=False,
        )
        np.testing.assert_allclose(space.max_inventory, [100.0, 90.0, 81.0])
        np.testing.assert_allclose(space.min_inventory, [100.0, 90.0, 81.0])


class TestRatchetBounds:
    def test_linear_ratchet_backward_bound_solved_on_pillars(self):
        # Withdraw rate grows with inventory; must be empty at end after 1 step.
        table = np.array([[0.0, -50.0, 10.0], [100.0, -150.0, 10.0]])
        space = calculate_inventory_space(
            [table],
            INTERP_LINEAR,
            np.zeros(2),
            np.full(2, 100.0),
            np.zeros(1),
            starting_inventory=100.0,
            must_be_empty_at_end=True,
        )
        # From inventory q, after max withdrawal: q - (50 + q) = -50 < 0 for all q,
        # so constraint reachable from max inventory: upper bound = 100... but
        # max withdrawal at 100 leaves 100-150 <0 -> reachable; check feasible.
        assert space.max_inventory[1] == 0.0
        assert space.min_inventory[1] == 0.0

    def test_step_ratchet_bound(self):
        table = np.array([[0.0, -60.0, 20.0], [50.0, -80.0, 20.0], [100.0, -80.0, 20.0]])
        space = calculate_inventory_space(
            [table, table],
            INTERP_STEP,
            np.zeros(3),
            np.full(3, 100.0),
            np.zeros(2),
            starting_inventory=90.0,
            must_be_empty_at_end=True,
        )
        # Final step: must reach 0; max withdrawal 80 in top bracket -> max inv 80.
        np.testing.assert_allclose(space.max_inventory, [90.0, 80.0, 0.0])


class TestReferenceInventorySpaceRecurrences:
    """Ports of ``StorageHelperTest.CalculateInventorySpace_*`` (reference
    ``StorageHelperTest.cs:280-420``): exact forward/backward recurrences with
    3% inventory loss, rates -6/+5 and bounds [0, 23.5]."""

    def make_storage(self, start, end, must_be_empty):
        kw = dict(
            freq="D", storage_start=start, storage_end=end,
            injection_cost=1.5, withdrawal_cost=0.8,
            min_inventory=0.0, max_inventory=23.5,
            max_injection_rate=5.0, max_withdrawal_rate=6.0,
            inventory_loss=0.03,
        )
        if not must_be_empty:
            kw["terminal_storage_npv"] = lambda price, inv: 0.0
        return CmdtyStorage(**kw)

    def context(self, storage, val_date, inventory):
        from storage_tpu.compile import build_valuation_context

        idx = pd.period_range("2019-08-01", "2019-08-28", freq="D")
        fwd = pd.Series(20.0, index=idx)
        return build_valuation_context(storage, val_date, inventory, fwd, None, None)

    def test_current_period_after_storage_start(self):
        storage = self.make_storage("2019-08-01", "2019-08-28", must_be_empty=False)
        ctx = self.context(storage, "2019-08-20", 8.0)
        lo = np.asarray(ctx.inv_space.min_inventory, np.float64)
        hi = np.asarray(ctx.inv_space.max_inventory, np.float64)
        assert len(lo) == 9  # 2019-08-20 .. 2019-08-28
        exp_lo = 8.0 * 0.97 - 6.0
        exp_hi = 8.0 * 0.97 + 5.0
        np.testing.assert_allclose([lo[1], hi[1]], [exp_lo, exp_hi], rtol=1e-12)
        for k in range(2, 9):  # pure forward recurrence, no end constraint
            exp_lo = max(exp_lo * 0.97 - 6.0, 0.0)
            exp_hi = min(exp_hi * 0.97 + 5.0, 23.5)
            np.testing.assert_allclose([lo[k], hi[k]], [exp_lo, exp_hi], rtol=1e-12)

    def test_current_period_before_storage_start_with_empty_end(self):
        storage = self.make_storage("2019-08-19", "2019-08-28", must_be_empty=True)
        ctx = self.context(storage, "2019-08-10", 11.0)
        lo = np.asarray(ctx.inv_space.min_inventory, np.float64)
        hi = np.asarray(ctx.inv_space.max_inventory, np.float64)
        assert len(lo) == 10  # 2019-08-19 .. 2019-08-28
        # Forward recurrence holds through 2019-08-24 (index 5).
        exp_lo = 11.0 * 0.97 - 6.0
        exp_hi = 11.0 * 0.97 + 5.0
        np.testing.assert_allclose([lo[1], hi[1]], [exp_lo, exp_hi], rtol=1e-12)
        for k in range(2, 6):
            exp_lo = max(exp_lo * 0.97 - 6.0, 0.0)
            exp_hi = min(exp_hi * 0.97 + 5.0, 23.5)
            np.testing.assert_allclose([lo[k], hi[k]], [exp_lo, exp_hi], rtol=1e-12)
        # Must-be-empty backward reduction from the end (indices 9..6).
        exp_hi = 0.0
        np.testing.assert_allclose([lo[9], hi[9]], [0.0, 0.0], atol=1e-12)
        for k in (8, 7, 6):
            exp_hi = min((exp_hi + 6.0) / 0.97, 23.5)
            np.testing.assert_allclose([lo[k], hi[k]], [0.0, exp_hi], rtol=1e-12)
