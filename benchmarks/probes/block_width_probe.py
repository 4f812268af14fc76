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
PROBE_CPU=1 pins the CPU backend (interpret mode) for smoke runs.

The SUB-TILE alternative (if wide blocks still hang): keep width 1024 and
set STORAGE_TPU_BWD_SUBTILES=N — the kernel's VMEM block widens to N x 1024
lanes while every vector op stays 1024 wide, halving/quartering the
per-grid-step fixed overhead without the 2048-lane Mosaic ops:

    for t in 2 4; do
        STORAGE_TPU_BWD_SUBTILES=$t timeout 900 \
            python benchmarks/probes/block_width_probe.py 1024 1000000 \
            || echo "subtiles $t: FAILED/HUNG (rc=$?)"
    done
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from _scenario import bench_backward_setup, maybe_pin_cpu


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if width % 128:
        raise SystemExit("width must be a multiple of 128 (TPU lanes)")

    maybe_pin_cpu()
    import jax

    print("backend:", jax.default_backend(), flush=True)
    from storage_tpu.engines import lsmc as L

    statics, dev, reg, vols, drift, _G, n_steps = bench_backward_setup(S)
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
    print(f"width {width}: backward {S:,} x {n_steps}: best {best:.3f}s "
          f"({best / n_steps * 1e3:.3f} ms/step)  "
          f"runs={[f'{w:.3f}' for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
