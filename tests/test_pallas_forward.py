"""Pallas fused forward-kernel parity tests (interpreter mode on CPU).

The kernel must reproduce the XLA forward scan exactly (same decisions, same
per-step means, same final inventory/PV) on shared inputs.
"""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import (
    _backward_program_jit,
    device_inputs,
    forward_scan,
)
from storage_tpu.models.multi_factor import build_sim_coefficients
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.pallas_forward import pack_scalars, pallas_forward_sim
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions


@pytest.fixture(scope="module")
def scenario():
    storage = CmdtyStorage(
        "D", "2021-02-01", "2021-02-21",
        injection_cost=0.3, withdrawal_cost=0.4,
        min_inventory=0.0, max_inventory=500.0,
        max_injection_rate=50.0, max_withdrawal_rate=60.0,
        cmdty_consumed_inject=0.01, inventory_loss=0.001, inventory_cost=0.02,
        terminal_storage_npv=lambda p, i: 0.9 * p * i,
    )
    idx = pd.period_range("2021-01-15", "2021-02-21", freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 3.0), index=idx)
    rates = pd.Series(0.05, index=pd.period_range("2021-01-15", "2021-06-01", freq="D"))
    # Valuation date before storage start: no step-0 special case.
    ctx = build_valuation_context(storage, "2021-01-15", 200.0, fwd, rates, None,
                                  num_grid_points=24)
    assert not ctx.val_date_is_first_step
    sim_periods = list(ctx.periods)
    coeffs_sim = build_sim_coefficients(
        [(4.0, pd.Series(0.6, index=idx))], np.eye(1), ctx.val_period, fwd, sim_periods
    )
    spec = basis_spec(parse_basis_functions("1 + x0 + x0**2"), 1)
    dev = device_inputs(ctx, jnp.float32)
    sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)

    reg = simulate_factor_paths(coeffs_sim, 256, seed=5)
    val = simulate_factor_paths(coeffs_sim, 256, seed=6)

    statics = dict(
        spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
        extra_decisions=0, val_first=False, terminal_fn=storage.terminal_npv_fn,
    )
    _, _, cf, mus, sds, vbars = _backward_program_jit(reg, sim_vols, sim_drift, dev, **statics)
    return ctx, dev, spec, sim_vols, sim_drift, val, cf, mus, sds, vbars


def run_xla_forward(scenario):
    ctx, dev, spec, sim_vols, sim_drift, val, cf, mus, sds, vbars = scenario
    n = ctx.n_steps
    S = val.shape[-1]
    carry = (jnp.full((S,), dev.inventory, jnp.float32), jnp.zeros((S,), jnp.float32))
    dfd = jnp.ones_like(dev.df_settle)
    m = val.shape[0] - 1
    carry, outputs = forward_scan(
        carry, val[:m], sim_vols[:m], sim_drift[:m], cf, mus, sds, vbars,
        dev.space_lo[1 : n + 1], dev.space_hi[1 : n + 1],
        dev.pillars, dev.loss, dev.inject_cost, dev.withdraw_cost,
        dev.cons_inject, dev.cons_withdraw, dev.inv_cost_rate,
        dev.df_settle, dev.df_start, dev.fwd[:n], dfd[:n],
        spec=spec, interp_kind=ctx.interp_kind, num_grid_points=ctx.num_grid_points,
        extra_decisions=0, collect_panels=False,
        # Mirror the kernel's 1/256 query quantization (fwd_split3 default)
        # so the comparison is like for like.
        quantize_queries=True,
    )
    means, deltas, _rows, *_triggers = outputs
    return np.asarray(means), np.asarray(deltas), np.asarray(carry[0]), np.asarray(carry[1])


def run_pallas_forward(scenario, block_sims=128):
    ctx, dev, spec, sim_vols, sim_drift, val, cf, mus, sds, vbars = scenario
    n = ctx.n_steps
    m = val.shape[0] - 1
    tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)  # [m, B+1, G]
    scalars = pack_scalars(
        dev.space_lo[1 : n + 1], dev.space_hi[1 : n + 1], dev.loss,
        dev.inject_cost, dev.withdraw_cost, dev.cons_inject, dev.cons_withdraw,
        dev.inv_cost_rate, dev.df_settle, dev.df_start, sim_drift[:m], sim_vols[:m],
    )
    sums, xsums, inv_final, pv_final = pallas_forward_sim(
        val[:m], dev.inventory, tables, mus, sds, dev.pillars, scalars,
        spec=spec, interp_kind=ctx.interp_kind, num_grid=ctx.num_grid_points,
        block_sims=block_sims, interpret=True,
    )
    return np.asarray(sums), np.asarray(xsums), np.asarray(inv_final), np.asarray(pv_final)


class TestKernelParity:
    def test_matches_xla_forward(self, scenario):
        means, deltas, inv_xla, pv_xla = run_xla_forward(scenario)
        sums, xsums, inv_pl, pv_pl = run_pallas_forward(scenario)
        S = inv_xla.shape[0]
        np.testing.assert_allclose(sums[:, :6] / S, means, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(inv_pl, inv_xla, atol=1e-2)
        np.testing.assert_allclose(pv_pl, pv_xla, rtol=2e-4, atol=0.5)
        # Delta numerators: mean(net * spot) / fwd (dfd == 1 here).
        ctx, dev, *_ = scenario
        n = ctx.n_steps
        expected_deltas = sums[:, 6] / S / np.asarray(dev.fwd[:n])
        np.testing.assert_allclose(expected_deltas, deltas, rtol=2e-4, atol=1e-3)

    def test_block_size_invariance_and_padding(self, scenario):
        # 256 sims with block 128 (exact) and 256 (padding path not hit) plus
        # an odd block forcing the padded-mask path.
        sums_a, _, inv_a, pv_a = run_pallas_forward(scenario, block_sims=128)
        sums_b, _, inv_b, pv_b = run_pallas_forward(scenario, block_sims=384)
        np.testing.assert_allclose(sums_a, sums_b, rtol=1e-5)
        np.testing.assert_allclose(inv_a, inv_b)
        np.testing.assert_allclose(pv_a, pv_b)

    def test_chunked_carry_matches_single_run(self, scenario):
        # The chunked progress driver splits the horizon and threads the
        # per-sim inventory carry between kernel invocations; results must
        # match one full-horizon run.
        ctx, dev, spec, sim_vols, sim_drift, val, cf, mus, sds, vbars = scenario
        n = ctx.n_steps
        m = val.shape[0] - 1
        tables = jnp.concatenate([cf, vbars[:, None, :]], axis=1)
        scalars = pack_scalars(
            dev.space_lo[1 : n + 1], dev.space_hi[1 : n + 1], dev.loss,
            dev.inject_cost, dev.withdraw_cost, dev.cons_inject, dev.cons_withdraw,
            dev.inv_cost_rate, dev.df_settle, dev.df_start, sim_drift[:m], sim_vols[:m],
        )
        kw = dict(spec=spec, interp_kind=ctx.interp_kind,
                  num_grid=ctx.num_grid_points, block_sims=128, interpret=True)
        sums_full, xs_full, inv_full, pv_full = pallas_forward_sim(
            val[:m], dev.inventory, tables, mus, sds, dev.pillars, scalars, **kw
        )
        cut = m // 2
        S = val.shape[-1]
        inv_carry = jnp.full((S,), dev.inventory, jnp.float32)
        pv_total = jnp.zeros((S,), jnp.float32)
        sums_parts, xs_parts = [], []
        for a, b in [(0, cut), (cut, m)]:
            s_c, x_c, inv_carry, pv_c = pallas_forward_sim(
                val[a:b], inv_carry, tables[a:b], mus[a:b], sds[a:b],
                dev.pillars[a:b], scalars[a:b], **kw
            )
            pv_total = pv_total + pv_c
            sums_parts.append(s_c)
            xs_parts.append(x_c)
        np.testing.assert_allclose(
            np.concatenate(sums_parts), np.asarray(sums_full), rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(
            np.concatenate(xs_parts), np.asarray(xs_full), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(inv_carry), np.asarray(inv_full), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pv_total), np.asarray(pv_full), rtol=1e-5, atol=0.1)
