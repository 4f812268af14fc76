"""Phase-split wall-clock of the headline config at production defaults.

Times the four device programs the materialised headline run executes —
regression-path simulation, backward induction, valuation-path simulation,
forward pass — each with a forced scalar readback (axon's block_until_ready
does not synchronise), mirroring run_lsmc's exact composition: pre-padded
factor paths, span-capped Pallas backward, fused Pallas forward
(collect_panels=False, the bench posture).  The residual between the sum of
phases and bench.py's end-to-end wall is host-side assembly + intrinsic.

    timeout 1800 python benchmarks/probes/phase_split_probe.py [num_sims]

PROBE_CPU=1 pins the CPU backend (interpret mode) for smoke runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from _scenario import BASIS, maybe_pin_cpu


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    maybe_pin_cpu()
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
        parse_basis_functions(BASIS, THREE_FACTOR_SEASONAL_ALIASES),
        num_factors=3,
    )
    statics = dict(
        spec=spec, interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points, extra_decisions=0,
        val_first=ctx.val_date_is_first_step, terminal_fn=storage.terminal_npv_fn,
    )
    G = ctx.num_grid_points
    dev = L.device_inputs(ctx, jnp.float32)
    vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)

    interpret = jax.default_backend() != "tpu"
    bpal = L._pallas_backward_eligible(None, jnp.float32, S, G)
    if bpal is not None and interpret:
        bpal = (bpal[0], True)
    pad = L._backward_pad_target(S, G, bpal[0]) if bpal is not None else S
    fpal = L._pallas_forward_eligible(ctx, 0, None, False, S, jnp.float32)
    if fpal is not None and interpret:
        fpal = (fpal[0], True)
    val_pad = -(-S // fpal[0]) * fpal[0] if fpal is not None else S
    print(f"bpal={bpal} pad={pad} fpal={fpal} val_pad={val_pad}", flush=True)

    def timeit(label, fn, n=2):
        out = fn()  # warm/compile
        t0 = time.perf_counter()
        out = fn()
        print(f"{label}: first-warm {time.perf_counter() - t0:.3f}s", flush=True)
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            walls.append(time.perf_counter() - t0)
        print(f"{label}: best {min(walls):.3f}s  runs={[f'{w:.3f}' for w in walls]}",
              flush=True)
        return out

    # Phase 1: regression-path simulation (pre-padded, as run_lsmc requests).
    def sim_reg():
        f = simulate_factor_paths(
            coeffs_sim, S, seed=11, pad_to=None if pad == S else pad
        )
        np.asarray(jnp.ravel(f[-1])[:1])
        return f

    reg = timeit("sim_reg", sim_reg)

    # Phase 2: backward induction (production routing).
    def backward():
        npv, cm0, coeffs, mus, sds, vbars = L._backward_program_jit(
            reg, vols, drift, dev, pallas=bpal, mesh=None,
            quantize_weights=L._xla_quantize_weights(), true_sims=S, **statics
        )
        np.asarray(jnp.ravel(vbars[0])[:1])
        return npv, cm0, coeffs, mus, sds, vbars

    backward_npv, cont_mean0, coeffs, mus, sds, vbars = timeit("backward", backward)
    del reg

    # Phase 3: valuation-path simulation.
    def sim_val():
        f = simulate_factor_paths(
            coeffs_sim, S, seed=12, pad_to=None if val_pad == S else val_pad
        )
        np.asarray(jnp.ravel(f[-1])[:1])
        return f

    val = timeit("sim_val", sim_val)

    # Phase 4: forward pass (fused Pallas when eligible, bench posture).
    def forward():
        if fpal is not None:
            arrays = L._forward_program_pallas(
                val, vols, drift, cont_mean0, coeffs, mus, sds, vbars,
                dev, backward_npv, discount_deltas=True, block_sims=fpal[0],
                interpret=fpal[1], mesh=None, true_sims=S, **statics
            )
        else:
            arrays = L._forward_program_jit(
                val, vols, drift, cont_mean0, coeffs, mus, sds, vbars, dev,
                backward_npv, discount_deltas=True, collect_panels=False,
                **statics
            )
        np.asarray(jnp.ravel(arrays.deltas)[:1])
        return arrays

    arrays = timeit("forward", forward)
    print(f"npv={float(arrays.npv):,.2f}", flush=True)


if __name__ == "__main__":
    main()
