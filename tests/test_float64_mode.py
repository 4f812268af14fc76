"""float64 engine mode (the reference is float64 throughout; this build's
default is float32 with conditioning safeguards — verify the engines also run
exactly in float64 under jax.experimental.enable_x64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, intrinsic_value, multi_factor_value


def setup():
    storage = CmdtyStorage(
        "D", "2021-01-01", "2021-02-01",
        injection_cost=0.3, withdrawal_cost=0.4,
        min_inventory=0.0, max_inventory=500.0,
        max_injection_rate=50.0, max_withdrawal_rate=50.0,
    )
    idx = pd.period_range("2021-01-01", "2021-02-01", freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 4.0), index=idx)
    vol = pd.Series(0.6, index=idx)
    return storage, fwd, vol


def test_intrinsic_float64_matches_float32():
    storage, fwd, _ = setup()
    f32 = intrinsic_value(storage, "2021-01-01", 100.0, fwd, None, None)
    with jax.enable_x64(True):
        f64 = intrinsic_value(storage, "2021-01-01", 100.0, fwd, None, None,
                              dtype=jnp.float64)
    assert f64.npv == pytest.approx(f32.npv, rel=1e-4)


def test_lsmc_float64_runs_and_matches():
    storage, fwd, vol = setup()

    def run(dtype):
        return multi_factor_value(
            storage, "2021-01-01", 100.0, fwd, None, None,
            factors=[(3.0, vol)], factor_corrs=None,
            num_sims=512, basis_funcs="1 + x0 + x0**2", discount_deltas=False,
            seed=4, dtype=dtype, return_sim_panels=False,
        )

    f32 = run(jnp.float32)
    with jax.enable_x64(True):
        f64 = run(jnp.float64)
    # float64 normal sampling consumes different random bits than float32, so
    # the two runs see different paths: agreement is to Monte-Carlo error at
    # 512 sims, not rounding error.
    assert f64.npv == pytest.approx(f32.npv, rel=0.03)
    assert np.isfinite(f64.npv)
