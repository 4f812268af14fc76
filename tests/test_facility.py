"""Facility-schedule helper tests (reference spec_helpers.py behaviours)."""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, RatchetInterp, intrinsic_value
from storage_tpu.utils.facility import (
    inventory_bounds_with_gates,
    ratchets_with_maintenance,
)

BASE = [
    ("2021-04-01", [(0.0, -150.0, 250.0), (7000.0, -275.0, 132.0)]),
    ("2021-10-01", [(0.0, -130.0, 260.0), (7000.0, -245.0, 148.0)]),
]


class TestMaintenanceRatchets:
    def test_outage_day_scales_and_next_day_resumes(self):
        schedule = ratchets_with_maintenance(
            BASE,
            maintenance=[("2021-06-15", 0.0, 0.5)],  # no injection, half withdrawal
            storage_end="2022-04-01",
        )
        by_period = dict(schedule)
        outage = by_period[pd.Period("2021-06-15", "D")]
        assert outage[0] == (0.0, -75.0, 0.0)
        assert outage[1] == (7000.0, -137.5, 0.0)
        resume = by_period[pd.Period("2021-06-16", "D")]
        assert resume == [(0.0, -150.0, 250.0), (7000.0, -275.0, 132.0)]
        # Base entries preserved and ordering monotone.
        periods = [p for p, _ in schedule]
        assert periods == sorted(periods)

    def test_maintenance_uses_applicable_table(self):
        schedule = ratchets_with_maintenance(
            BASE, [("2021-11-05", 0.5, 1.0)], "2022-04-01"
        )
        outage = dict(schedule)[pd.Period("2021-11-05", "D")]
        # Scaled from the second (October) table.
        assert outage[0] == (0.0, -130.0, 130.0)

    def test_maintenance_before_schedule_raises(self):
        with pytest.raises(ValueError, match="precedes"):
            ratchets_with_maintenance(BASE, [("2021-01-01", 0.0, 0.0)], "2022-04-01")

    def test_storage_valuation_with_full_outage_day(self):
        schedule = ratchets_with_maintenance(
            BASE, [("2021-06-15", 0.0, 0.0)], "2022-04-01"
        )
        storage = CmdtyStorage(
            "D", "2021-04-01", "2022-04-01",
            injection_cost=0.01, withdrawal_cost=0.02,
            ratchets=schedule, ratchet_interp=RatchetInterp.LINEAR,
        )
        rng = storage.inject_withdraw_range("2021-06-15", 3000.0)
        assert rng == (0.0, 0.0)
        idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
        fwd = pd.Series(15.0 + 2.0 * np.sin(np.arange(len(idx)) / 30.0), index=idx)
        results = intrinsic_value(storage, "2021-04-01", 1000.0, fwd, None, None)
        assert np.isfinite(results.npv)
        # No flow on the outage day.
        assert results.profile.loc[pd.Period("2021-06-15", "D"), "inject_withdraw_volume"] == 0.0


class TestInventoryGates:
    def test_gate_days_tighten_bounds(self):
        min_s, max_s = inventory_bounds_with_gates(
            "2021-04-01", "2022-04-01", 100.0,
            gates=[("2021-04-02", 0.25, 0.8), ("2022-01-05", 0.2, 0.5)],
        )
        assert max_s[pd.Period("2021-04-02", "D")] == 80.0
        assert min_s[pd.Period("2021-04-02", "D")] == 25.0
        assert max_s[pd.Period("2022-01-05", "D")] == 50.0
        assert min_s[pd.Period("2021-05-01", "D")] == 0.0
        assert max_s[pd.Period("2021-05-01", "D")] == 100.0

    def test_gate_validation(self):
        with pytest.raises(ValueError, match="outside"):
            inventory_bounds_with_gates("2021-04-01", "2021-05-01", 100.0,
                                        gates=[("2022-01-01", 0.1, 0.5)])
        with pytest.raises(ValueError, match="fractions"):
            inventory_bounds_with_gates("2021-04-01", "2021-05-01", 100.0,
                                        gates=[("2021-04-10", 0.7, 0.5)])

    def test_gated_storage_valuation(self):
        min_s, max_s = inventory_bounds_with_gates(
            "2021-01-01", "2021-03-01", 1000.0, gates=[("2021-02-01", 0.5, 0.8)]
        )
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-03-01",
            injection_cost=0.1, withdrawal_cost=0.1,
            min_inventory=min_s, max_inventory=max_s,
            max_injection_rate=60.0, max_withdrawal_rate=60.0,
        )
        idx = pd.period_range("2021-01-01", "2021-03-01", freq="D")
        fwd = pd.Series(20.0, index=idx)
        results = intrinsic_value(storage, "2021-01-01", 200.0, fwd, None, None)
        # The gate forces inventory into [500, 800] on Feb 1.  The intrinsic
        # profile stores POST-decision inventory (reference semantics,
        # IntrinsicStorageValuation.cs:247-250), so the inventory *at* Feb 1
        # is the Jan 31 row.
        feb1 = results.profile.loc[pd.Period("2021-01-31", "D"), "inventory"]
        assert 500.0 - 1e-6 <= feb1 <= 800.0 + 1e-6
