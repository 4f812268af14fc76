"""Backward-phase wall-clock: broadcast kernel (FOLD_AFFINE=0) vs fold (=1).

VERDICT r4 item 2's measurement harness: the clean affine-fold variant
(exact-f32 cwa-sourced, 3-term colB / 2-term colB1 in-kernel splits) must
either beat the production kernel on the headline shape or be rejected with
these numbers.  Runs the full Pallas backward scan (the whole serial path:
kernel dispatches + XLA glue) at the bench config's shape.

    timeout 1800 python benchmarks/probes/fold_timing_probe.py [num_sims]

Prints per-leg wall times and the NPV cross-check.  Accuracy is measured
separately by fold_affine_probe.py (vs an f64 golden).  PROBE_CPU=1 pins
the CPU backend (interpret mode) for smoke runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from _scenario import bench_backward_setup, maybe_pin_cpu


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    maybe_pin_cpu()
    import jax

    print("backend:", jax.default_backend(), flush=True)
    from storage_tpu.engines import lsmc as L
    from storage_tpu.ops.pallas_backward import pick_backward_block

    statics, dev, reg, vols, drift, G, n_steps = bench_backward_setup(S)
    blk = pick_backward_block(S, G)

    def run_leg(label, fold):
        os.environ["STORAGE_TPU_FOLD_AFFINE"] = "1" if fold else "0"
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
        print(f"{label}: backward {S:,} x {n_steps}: best {best:.3f}s "
              f"({best / n_steps * 1e3:.3f} ms/step)  "
              f"runs={[f'{w:.3f}' for w in walls]}", flush=True)
        return npv, best

    npv_p, wall_p = run_leg("prod", fold=False)
    npv_f, wall_f = run_leg("fold", fold=True)
    print(
        f"fold/prod wall: {wall_f / wall_p:.4f}  "
        f"npv rel diff: {abs(npv_f - npv_p) / abs(npv_p):.3e}", flush=True,
    )


if __name__ == "__main__":
    main()
