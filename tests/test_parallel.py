"""Multi-device scale-out tests on the virtual 8-device CPU mesh.

SURVEY.md §4.3: the same valuation on 1 chip and N chips must agree to
floating-point tolerance — the stand-in for multi-node tests without a
cluster.
"""
import jax
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, multi_factor_value
from storage_tpu.parallel.mesh import paths_mesh, shard_sims


def _valuation(mesh=None, num_sims=512):
    storage = CmdtyStorage(
        "D", "2021-01-01", "2021-03-01",
        injection_cost=0.3, withdrawal_cost=0.4,
        min_inventory=0.0, max_inventory=2000.0,
        max_injection_rate=60.0, max_withdrawal_rate=80.0,
    )
    idx = pd.period_range("2021-01-01", "2021-03-01", freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 8.0), index=idx)
    vol = pd.Series(0.7, index=idx)
    return multi_factor_value(
        storage, "2021-01-01", 800.0, fwd, None, None,
        factors=[(5.0, vol)], factor_corrs=None,
        num_sims=num_sims, basis_funcs="1 + x0 + x0**2", discount_deltas=False,
        seed=5, mesh=mesh,
    )


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


def test_single_vs_multi_device_valuation_agrees():
    single = _valuation(mesh=None)
    mesh = paths_mesh()
    multi = _valuation(mesh=mesh)
    # f32 + changed reduction order across shards: the VALUE is stable to
    # rounding noise, but pointwise policies (hence deltas/profiles) can flip
    # discretely wherever sims are near-indifferent between decisions, so
    # value-level invariants are what a distributed run must preserve.
    assert multi.npv == pytest.approx(single.npv, rel=1e-4)
    assert float(multi.deltas.sum()) == pytest.approx(
        float(single.deltas.sum()), abs=0.02 * single.deltas.abs().sum()
    )
    # Terminal expected inventory (empty) and start inventory are invariant.
    assert multi.expected_profile["inventory"].iloc[0] == pytest.approx(
        single.expected_profile["inventory"].iloc[0]
    )
    assert multi.expected_profile["inventory"].iloc[-1] == pytest.approx(
        single.expected_profile["inventory"].iloc[-1], abs=1.0
    )


def test_shard_sims_places_on_all_devices():
    mesh = paths_mesh()
    x = shard_sims(mesh, jax.numpy.zeros((16, 100)), 0)
    assert len(x.sharding.device_set) == jax.device_count()
