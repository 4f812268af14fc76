"""Probe: threefry vs rbg PRNG cost of the factor-path simulation.

The headline's two simulation phases (~0.35 s of a 1.7 s wall at 1M x 365
x 3 factors) are dominated by normal generation (threefry2x32 + erfinv on
the VPU); JAX's ``rbg`` key implementation drives the TPU's hardware bit
generator instead.  This probe times ``simulate_factor_paths`` under both
key impls on synthetic coefficients at the headline shape — evidence for
(or against) offering an RNG knob.  Draw STREAMS differ between impls, so
a default flip would be a seed-stream break (0.2.0-style, CHANGELOG'd).

Run: timeout 900 python benchmarks/probes/rng_probe.py [num_sims] [n_steps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from storage_tpu.models.simulation import SimCoefficients, simulate_factor_paths


def main():
    num_sims = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 365
    F = 3
    rng = np.random.default_rng(0)
    decay = np.exp(-rng.uniform(0.001, 0.02, size=(n, F)))
    a = rng.normal(scale=0.02, size=(n, F, F))
    chol = np.linalg.cholesky(a @ a.transpose(0, 2, 1) + 1e-4 * np.eye(F))
    coeffs = SimCoefficients(
        decay=decay.astype(np.float32),
        chol=chol.astype(np.float32),
        vols=np.ones((n, F), np.float32),
        log_fwd_drift=np.zeros((n,), np.float32),
    )

    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            key = jax.random.key(11, impl=impl)
        except Exception as exc:  # noqa: BLE001 - impl not available
            print(f"{impl}: unavailable ({exc})")
            continue
        # Warm (compile), then 3 timed runs.  Sync via a one-element host
        # readback: on the tunnel backend block_until_ready returns before
        # the work is done (the engine's stopwatches learned the same).
        def run():
            f = simulate_factor_paths(coeffs, num_sims, None, key=key)
            np.asarray(jnp.ravel(f[-1])[:1])
            return f

        f = run()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            f = run()
            walls.append(time.perf_counter() - t0)
        del f
        print(f"{impl}: best {min(walls)*1e3:.1f} ms  runs "
              f"{[round(w*1e3, 1) for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
