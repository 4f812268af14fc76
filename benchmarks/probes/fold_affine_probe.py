"""Backward-only precision reproducer for the REJECTED affine-fold kernel.

Round-3 experiment (see ROUND3_NOTES.md "Rejected: affine-fold"): folding the
per-decision immediate economics into the bf16 actual-surface matmul passes
via augmented table columns degraded compiled-TPU accuracy ~8x (vbar max rel
3.7e-5 -> 2.7e-4 on this config; precision-study NPV rel 4e-5 -> 3.4e-4,
trigger prices 1e-3 -> 3.5e-2) while CPU-interpret showed near-parity.
Column extracts, 3D-table loads, bf16 sublane concats and the augmented
matmul itself each probe CLEAN in isolation on the same chip; the
composition-level mechanism was not identified within the time box, so the
fold was reverted.  This probe reproduces the comparison:

    python fold_affine_probe.py <repo> ref   # CPU float64 golden (saves npz)
    python fold_affine_probe.py <repo> tpu   # compiled f32 kernel vs golden

Expected with the production (pre-fold) kernel: backward_npv rel ~8e-5,
vbar max rel ~4e-5.
"""
import os, sys
MODE = sys.argv[2]
import jax
if MODE == "ref":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
sys.path.insert(0, sys.argv[1])

import jax.numpy as jnp
import numpy as np
import pandas as pd
from storage_tpu import CmdtyStorage, RatchetInterp
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines import lsmc as L
from storage_tpu.models.multi_factor import build_sim_coefficients, create_3_factor_season_params
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.pallas_backward import pick_backward_block
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions, THREE_FACTOR_SEASONAL_ALIASES

S = 4096
storage = CmdtyStorage(
    "D", "2021-04-01", "2021-10-01",
    injection_cost=0.01, withdrawal_cost=0.025,
    ratchets=[("2021-04-01", [(0.0, -150.0, 250.0), (2000.0, -200.0, 175.0),
                              (5000.0, -260.0, 155.0), (7000.0, -275.0, 132.0)])],
    ratchet_interp=RatchetInterp.LINEAR,
)
idx = pd.period_range("2021-04-01", "2021-10-01", freq="D")
fwd = pd.Series(16.0 + 2.0 * np.sin(np.arange(len(idx)) / 20.0), index=idx)
ctx = build_valuation_context(storage, "2021-04-01", 1500.0, fwd, None, None)
factors3, corrs3 = create_3_factor_season_params("D", 91.0, 0.85, 0.30, 0.19,
                                                 ctx.val_period, idx[-1])
coeffs_sim = build_sim_coefficients(
    factors3, corrs3, ctx.val_period, fwd,
    list(ctx.periods[1 if ctx.val_date_is_first_step else 0:]))
spec = basis_spec(parse_basis_functions(
    "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
    THREE_FACTOR_SEASONAL_ALIASES), 3)
statics = dict(spec=spec, interp_kind=ctx.interp_kind,
               num_grid_points=ctx.num_grid_points, extra_decisions=0,
               val_first=ctx.val_date_is_first_step,
               terminal_fn=storage.terminal_npv_fn)

if MODE == "ref":
    reg64 = simulate_factor_paths(coeffs_sim, S, seed=11, dtype=jnp.float64)
    dev64 = L.device_inputs(ctx, jnp.float64)
    npv64, _, c64, mu64, sd64, vb64 = L._backward_program_jit(
        reg64, jnp.asarray(coeffs_sim.vols, jnp.float64),
        jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float64), dev64,
        pallas=None, quantize_weights=True, **statics)
    np.savez("/tmp/fe2_ref.npz", npv=float(npv64),
             vb=np.asarray(vb64, np.float64),
             reg32=np.asarray(reg64, np.float32))
    print(f"ref npv={float(npv64):,.3f} saved")
else:
    data = np.load("/tmp/fe2_ref.npz")
    dev32 = L.device_inputs(ctx, jnp.float32)
    npv32, _, c32, mu32, sd32, vb32 = L._backward_program_jit(
        jnp.asarray(data["reg32"]), jnp.asarray(np.float32(coeffs_sim.vols)),
        jnp.asarray(np.float32(coeffs_sim.log_fwd_drift)), dev32,
        pallas=(pick_backward_block(S, ctx.num_grid_points), False), **statics)
    npv32 = float(npv32); vb32n = np.asarray(vb32, np.float64)
    npv64 = float(data["npv"]); vb64n = data["vb"]
    scale = np.abs(vb64n).max()
    d = np.abs(vb32n - vb64n)
    print(f"repo={sys.argv[1]}")
    print(f"backward_npv: f64={npv64:,.3f} f32tpu={npv32:,.3f} "
          f"rel={abs(npv32-npv64)/abs(npv64):.3e}")
    print(f"vbar max rel={d.max()/scale:.3e}  per-period max (every 30): "
          f"{[float(f'{d[k].max():.2f}') for k in range(0, d.shape[0], 30)]}")
