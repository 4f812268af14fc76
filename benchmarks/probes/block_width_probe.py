"""Backward-kernel lane-block-width ladder: does >1024 still hang Mosaic?

Round 2 measured that 2048-lane sim blocks HANG the remote Mosaic compile
(ROUND2_NOTES "Known gaps"), capping `pick_backward_block` at 1024 and
pinning the per-step floor at ~2.2 ms (977 block dispatches/step at 1M sims;
the fixed per-block overhead dominates over HBM+MXU).  If a compiler update
lifts the hang, wider blocks halve the dispatch count — the only remaining
lever below the floor.  This probe runs ONE width per process so a compile
hang is survivable by the caller's `timeout`:

    for w in 1024 1280 1536 2048; do
        timeout 900 python benchmarks/probes/block_width_probe.py $w 1000000 \
            || echo "width $w: FAILED/HUNG (rc=$?)"
    done

Prints warm-compile and best-of-3 wall for the full backward scan at the
bench config's shape (compare legs across processes; same seed/config).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if width % 128:
        raise SystemExit("width must be a multiple of 128 (TPU lanes)")

    import jax

    if os.environ.get("PROBE_CPU"):
        # The JAX_PLATFORMS env var is silently ignored under the axon
        # plugin (and axon init HANGS during tunnel outages) — the config
        # update before first backend touch is the only reliable CPU pin.
        jax.config.update("jax_platforms", "cpu")
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
    interpret = jax.default_backend() != "tpu"  # CPU smoke runs interpret

    def once():
        npv, *_, vb = L._backward_program_jit(
            reg, vols, drift, dev, pallas=(width, interpret), **statics
        )
        # One scalar readback: axon's block_until_ready doesn't sync.
        return float(npv), np.asarray(vb[0, :1])

    t0 = time.perf_counter()
    npv, _ = once()
    print(f"width {width}: warm(incl compile) {time.perf_counter() - t0:.1f}s "
          f"npv={npv:,.2f}", flush=True)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        npv, _ = once()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    n_steps = len(ctx.periods) - 1
    print(f"width {width}: backward {S:,} x {n_steps}: best {best:.3f}s "
          f"({best / n_steps * 1e3:.3f} ms/step)  "
          f"runs={[f'{w:.3f}' for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
