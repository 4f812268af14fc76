"""Backward-phase wall-clock: production kernel vs STORAGE_TPU_FOLD_AFFINE=1.

VERDICT r4 item 2's measurement harness: the clean affine-fold variant
(exact-f32 cwa-sourced, 3-term colB / 2-term colB1 in-kernel splits) must
either beat the production kernel on the headline shape or be rejected with
these numbers.  Runs the full Pallas backward scan (the whole serial path:
kernel dispatches + XLA glue) at the bench config's shape.

    timeout 1800 python benchmarks/probes/fold_timing_probe.py [num_sims]

Prints per-leg wall times and the NPV cross-check.  Accuracy is measured
separately by fold_affine_probe.py (vs an f64 golden).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from bench import build_case
    from storage_tpu.compile import build_valuation_context
    from storage_tpu.engines import lsmc as L
    from storage_tpu.models.multi_factor import (
        build_sim_coefficients,
        create_3_factor_season_params,
    )
    from storage_tpu.models.simulation import simulate_factor_paths
    from storage_tpu.ops.pallas_backward import pick_backward_block
    from storage_tpu.ops.regression import basis_spec
    from storage_tpu.utils.basis import (
        THREE_FACTOR_SEASONAL_ALIASES,
        parse_basis_functions,
    )

    storage, fwd_curve, ir_curve, settle = build_case()
    ctx = build_valuation_context(
        storage, "2021-04-25", 1500.0, fwd_curve, ir_curve, settle, 100
    )
    f3, c3 = create_3_factor_season_params(
        "D", 91.0, 0.85, 0.30, 0.19, ctx.val_period, storage.end
    )
    coeffs_sim = build_sim_coefficients(
        f3, c3, ctx.val_period, fwd_curve, list(ctx.periods[1:])
    )
    spec = basis_spec(
        parse_basis_functions(
            "1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 + x_lt**2 + s**2 + s * x_st",
            THREE_FACTOR_SEASONAL_ALIASES,
        ),
        num_factors=3,
    )
    statics = dict(
        spec=spec, interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points, extra_decisions=0,
        val_first=ctx.val_date_is_first_step, terminal_fn=storage.terminal_npv_fn,
    )
    dev = L.device_inputs(ctx, jnp.float32)
    reg = simulate_factor_paths(coeffs_sim, S, seed=11)
    vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
    blk = pick_backward_block(S, ctx.num_grid_points)

    def run_leg(label, fold):
        os.environ["STORAGE_TPU_FOLD_AFFINE"] = "1" if fold else ""
        jax.clear_caches()  # env gate is read at trace time

        interpret = jax.default_backend() != "tpu"  # CPU smoke runs interpret

        def once():
            npv, *_ , vb = L._backward_program_jit(
                reg, vols, drift, dev, pallas=(blk, interpret), **statics
            )
            # One scalar readback: axon's block_until_ready doesn't sync.
            return float(npv), np.asarray(vb[0, :1])

        t0 = time.perf_counter()
        npv, _ = once()
        print(f"{label}: warm(incl compile) {time.perf_counter() - t0:.1f}s "
              f"npv={npv:,.2f}", flush=True)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            npv, _ = once()
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(f"{label}: backward {S:,} x 365: best {best:.3f}s "
              f"({best / 365 * 1e3:.3f} ms/step)  runs={[f'{w:.3f}' for w in walls]}",
              flush=True)
        return npv, best

    npv_p, wall_p = run_leg("prod", fold=False)
    npv_f, wall_f = run_leg("fold", fold=True)
    print(
        f"fold/prod wall: {wall_f / wall_p:.4f}  "
        f"npv rel diff: {abs(npv_f - npv_p) / abs(npv_p):.3e}", flush=True,
    )


if __name__ == "__main__":
    main()
