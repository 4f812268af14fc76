"""VERDICT r2 #2: compile (not interpret) the shard_map'd Pallas kernels.

All in-suite Pallas-under-mesh parity tests run in interpret mode on the
virtual CPU mesh; this probe runs the headline bench case under a 1-device
``paths`` mesh on the REAL chip, so the composed shard_map -> pallas_call
path actually Mosaic-compiles and executes on hardware, and asserts NPV
parity against the meshless run.

Run:  timeout 900 python benchmarks/probes/mesh_compiled_probe.py [num_sims]
Records (round 3): see ROUND3_NOTES.md "Compiled shard_map kernels".
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from bench import build_case


def main() -> None:
    num_sims = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000

    from storage_tpu import three_factor_seasonal_value
    from storage_tpu.parallel.mesh import paths_mesh

    assert jax.default_backend() == "tpu", "probe must run on the real chip"
    storage, fwd_curve, ir_curve, settlement_rule = build_case()

    def once(mesh, seed):
        return three_factor_seasonal_value(
            cmdty_storage=storage, val_date="2021-04-25", inventory=1500.0,
            fwd_curve=fwd_curve, interest_rates=ir_curve,
            settlement_rule=settlement_rule, num_sims=num_sims, seed=seed,
            spot_mean_reversion=91.0, spot_vol=0.85, long_term_vol=0.30,
            seasonal_vol=0.19,
            basis_funcs="1 + x_st + x_sw + x_lt + s + x_st**2 + x_sw**2 "
                        "+ x_lt**2 + s**2 + s * x_st",
            discount_deltas=True, return_sim_panels=False, mesh=mesh,
        )

    mesh = paths_mesh(jax.devices()[:1])

    for label, m in (("meshless", None), ("mesh[1]", mesh)):
        t0 = time.perf_counter()
        warm = once(m, seed=12)
        compile_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = once(m, seed=13)
        wall = time.perf_counter() - t0
        print(
            f"{label}: warm(compile)={compile_wall:.1f}s run={wall:.3f}s "
            f"npv={res.npv:,.2f}"
        )
        if label == "meshless":
            base = res
        else:
            rel = abs(res.npv - base.npv) / abs(base.npv)
            dmax = float((res.deltas - base.deltas).abs().max())
            print(f"parity: npv rel diff={rel:.2e} delta max abs diff={dmax:.4f}")
            assert rel < 5e-4, "compiled-under-mesh NPV parity violated"
            print("OK: shard_map'd Pallas kernels Mosaic-compiled and match")


if __name__ == "__main__":
    main()
