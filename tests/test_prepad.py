"""Pre-padded (kernel-aligned) factor-path plumbing.

Round-4 HBM-peak work: ``simulate_factor_paths(pad_to=...)`` emits paths
already lane-padded to the Pallas block/span multiple so the backward and
forward programs use them in place instead of materialising padded copies
(4.1 GB each at 1M paths — the whole-horizon materialised OOM of rounds
3-4).  These tests pin:

- padding changes no true-lane draw (bit-identical) and pads with zeros;
- the pre-padded engine path is BIT-equal to the legacy in-program-pad path
  end-to-end (run_lsmc with pad-aware factories vs plain arrays);
- the backward span cap (``STORAGE_TPU_BWD_SPAN_BYTES``) splits the scan
  into several in-program spans without moving the result beyond the
  documented chunk-boundary noise.

Reference: the peak itself is our addition (the reference is in-memory C#,
``LsmcStorageValuation.cs`` has no analogue); behavior parity is covered by
the NPV equalities below.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines import lsmc as L
from storage_tpu.models.multi_factor import build_sim_coefficients
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions


@pytest.fixture(scope="module")
def scenario():
    storage = CmdtyStorage(
        "D", "2021-02-01", "2021-03-21",
        injection_cost=0.3, withdrawal_cost=0.4,
        min_inventory=0.0, max_inventory=500.0,
        max_injection_rate=50.0, max_withdrawal_rate=60.0,
        cmdty_consumed_inject=0.01, inventory_loss=0.001, inventory_cost=0.02,
    )
    idx = pd.period_range("2021-01-15", "2021-03-21", freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 3.0), index=idx)
    rates = pd.Series(
        0.05, index=pd.period_range("2021-01-15", "2021-06-01", freq="D")
    )
    ctx = build_valuation_context(
        storage, "2021-01-15", 200.0, fwd, rates, None, num_grid_points=24
    )
    coeffs_sim = build_sim_coefficients(
        [(4.0, pd.Series(0.6, index=idx))], np.eye(1), ctx.val_period, fwd,
        list(ctx.periods[1:]),
    )
    spec = basis_spec(parse_basis_functions("1 + x0 + x0**2"), 1)
    sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
    return ctx, coeffs_sim, spec, sim_vols, sim_drift


class TestSimulatePadTo:
    def test_true_lanes_bit_identical_and_pad_zero(self, scenario):
        _, coeffs_sim, *_ = scenario
        plain = simulate_factor_paths(coeffs_sim, 200, seed=7)
        padded = simulate_factor_paths(coeffs_sim, 200, seed=7, pad_to=256)
        assert padded.shape == plain.shape[:2] + (256,)
        np.testing.assert_array_equal(
            np.asarray(padded[..., :200]), np.asarray(plain)
        )
        np.testing.assert_array_equal(
            np.asarray(padded[..., 200:]), 0.0
        )

    def test_pad_to_not_larger_is_noop(self, scenario):
        _, coeffs_sim, *_ = scenario
        plain = simulate_factor_paths(coeffs_sim, 200, seed=7)
        same = simulate_factor_paths(coeffs_sim, 200, seed=7, pad_to=200)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(plain))


def _run(ctx, spec, sim_vols, sim_drift, reg, val, num_sims=None):
    return L.run_lsmc(
        ctx, reg, val, sim_vols, sim_drift, spec,
        discount_deltas=False, collect_panels=False, num_sims=num_sims,
    )


class TestPrePaddedEngineParity:
    def test_factories_bit_equal_plain_arrays(self, scenario, monkeypatch):
        """Pad-aware factories (engine pre-pads) vs raw arrays (engine pads
        in-program): the kernels see identical padded operands, so every
        output must be BIT-equal."""
        ctx, coeffs_sim, spec, sim_vols, sim_drift = scenario
        monkeypatch.setenv("STORAGE_TPU_PALLAS", "interpret")
        S = 200  # pads to the 256-lane block multiple

        reg_arr = simulate_factor_paths(coeffs_sim, S, seed=5)
        val_arr = simulate_factor_paths(coeffs_sim, S, seed=6)
        base = _run(ctx, spec, sim_vols, sim_drift, reg_arr, val_arr)

        def make_reg(pad_to=None):
            return simulate_factor_paths(coeffs_sim, S, seed=5, pad_to=pad_to)

        def make_val(pad_to=None):
            return simulate_factor_paths(coeffs_sim, S, seed=6, pad_to=pad_to)

        pre = _run(ctx, spec, sim_vols, sim_drift, make_reg, make_val,
                   num_sims=S)
        assert float(pre.npv) == float(base.npv)
        assert float(pre.backward_npv) == float(base.backward_npv)
        np.testing.assert_array_equal(np.asarray(pre.deltas),
                                      np.asarray(base.deltas))
        np.testing.assert_array_equal(np.asarray(pre.pv_by_sim),
                                      np.asarray(base.pv_by_sim))
        assert pre.pv_by_sim.shape == (S,)

    def test_zero_arg_factories_still_work(self, scenario, monkeypatch):
        """Legacy factories without a pad_to parameter keep working (the
        driver inspects the signature)."""
        ctx, coeffs_sim, spec, sim_vols, sim_drift = scenario
        monkeypatch.setenv("STORAGE_TPU_PALLAS", "interpret")
        S = 200
        base = _run(
            ctx, spec, sim_vols, sim_drift,
            simulate_factor_paths(coeffs_sim, S, seed=5),
            simulate_factor_paths(coeffs_sim, S, seed=6),
        )
        legacy = _run(
            ctx, spec, sim_vols, sim_drift,
            lambda: simulate_factor_paths(coeffs_sim, S, seed=5),
            lambda: simulate_factor_paths(coeffs_sim, S, seed=6),
            num_sims=S,
        )
        assert float(legacy.npv) == float(base.npv)


class TestBackwardSpanCap:
    def test_span_cap_splits_and_stays_close(self, scenario, monkeypatch):
        """A tiny STORAGE_TPU_BWD_SPAN_BYTES forces several in-program spans;
        the per-span hoisted regression reorders float sums, so the result
        is close but not bit-equal (same contract as the chunked driver)."""
        ctx, coeffs_sim, spec, sim_vols, sim_drift = scenario
        monkeypatch.setenv("STORAGE_TPU_PALLAS", "interpret")
        S = 256
        reg_arr = simulate_factor_paths(coeffs_sim, S, seed=5)
        val_arr = simulate_factor_paths(coeffs_sim, S, seed=6)
        base = _run(ctx, spec, sim_vols, sim_drift, reg_arr, val_arr)

        # one span step = F * S * 4 bytes = 1 KB -> cap of 16 steps (floor)
        monkeypatch.setenv("STORAGE_TPU_BWD_SPAN_BYTES", str(16 * 1024))
        cap = L._backward_span_cap(1, S, 4)
        assert cap == 16  # the floor; 65 steps here -> >= 4 spans
        jax.clear_caches()
        split = _run(ctx, spec, sim_vols, sim_drift, reg_arr, val_arr)
        monkeypatch.delenv("STORAGE_TPU_BWD_SPAN_BYTES")
        jax.clear_caches()
        rel = abs(float(split.npv) - float(base.npv)) / abs(float(base.npv))
        assert rel < 5e-4, (float(split.npv), float(base.npv))

    def test_cap_disabled_via_env_zero(self, monkeypatch):
        monkeypatch.setenv("STORAGE_TPU_BWD_SPAN_BYTES", "0")
        assert L._backward_span_cap(3, 1_000_000, 4) is None

    def test_default_cap_at_production_scale(self):
        # 3 factors x ~1M padded lanes x f32: ~103-step spans at the default
        # 1.25 GB budget; small test configs never split.
        assert L._backward_span_cap(3, 1_003_520, 4) == 103
        assert L._backward_span_cap(1, 256, 4) > 10_000
