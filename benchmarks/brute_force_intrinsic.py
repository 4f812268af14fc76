"""Independent float64 brute-force intrinsic DP — the verifier behind the
README-example claim that this build's higher intrinsic NPV is correct
optimisation, not a bug.

The engine's intrinsic valuation (``storage_tpu/engines/intrinsic.py``) is a
bang-bang DP on a fixed-count grid with fixed-width decisions.  This module
re-solves the same deterministic control problem with NONE of that machinery:
plain NumPy float64 backward induction on an arbitrarily fine inventory grid
with a dense ladder of candidate decisions per grid point (pure pillar-table
interpolation for the ratchet rates; no engine kernels).  As the grid and
decision counts grow, its value converges to the true optimum from below, so

    engine_intrinsic  <=  brute_force(G→inf, D→inf)  =  true optimum

and the engine's value should sit within a fraction of a percent of it.
Reference analogue: the hand-computed trivial-config oracles of
``LsmcStorageValuationTest.cs:686-845`` — this is the same idea mechanised.

Run standalone:  python benchmarks/brute_force_intrinsic.py
Used by tests/test_brute_force.py.
"""
from __future__ import annotations

import numpy as np


def brute_force_intrinsic_npv(ctx, num_grid: int = 1500, num_decisions: int = 81) -> float:
    """Backward-induction optimum of the deterministic (intrinsic) problem.

    ``ctx`` is a ``storage_tpu.compile.ValuationContext`` — only its dense
    input arrays are used (pillar tables, costs, discount factors, forward
    curve, reduced inventory space); the solve itself is independent NumPy.
    """
    n = ctx.n_steps
    lo = np.asarray(ctx.inv_space.min_inventory, np.float64)  # [n+1]
    hi = np.asarray(ctx.inv_space.max_inventory, np.float64)
    pillars = np.asarray(ctx.pillars, np.float64)  # [n, P, 3]
    fwd = np.asarray(ctx.fwd, np.float64)
    df_settle = np.asarray(ctx.df_settle, np.float64)
    df_cost = np.asarray(ctx.df_cost, np.float64)
    inject_cost = np.asarray(ctx.inject_cost, np.float64)
    withdraw_cost = np.asarray(ctx.withdraw_cost, np.float64)
    cons_inject = np.asarray(ctx.cons_inject, np.float64)
    cons_withdraw = np.asarray(ctx.cons_withdraw, np.float64)
    loss = np.asarray(ctx.inventory_loss, np.float64)
    inv_cost_rate = np.asarray(ctx.inventory_cost_rate, np.float64)

    def grid_at(k: int) -> np.ndarray:
        if lo[k] == hi[k]:
            return np.full(1, lo[k])
        return np.linspace(lo[k], hi[k], num_grid)

    def rates_at(k: int, q: np.ndarray):
        if ctx.interp_kind == 1:  # step ratchets: floor lookup
            idx = np.clip(
                np.searchsorted(pillars[k, :, 0], q, side="right") - 1,
                0, pillars.shape[1] - 1,
            )
            return pillars[k, idx, 1], pillars[k, idx, 2]
        min_rate = np.interp(q, pillars[k, :, 0], pillars[k, :, 1])
        max_rate = np.interp(q, pillars[k, :, 0], pillars[k, :, 2])
        return min_rate, max_rate

    def sweep(k: int, q: np.ndarray, v_next: np.ndarray, grid_next: np.ndarray):
        """max over a dense decision ladder of immediate + interp(continuation)."""
        min_rate, max_rate = rates_at(k, q)
        loss_amt = loss[k] * q
        # Clip the feasible volume range so inventory-after stays reachable.
        d_lo = np.maximum(min_rate, lo[k + 1] - q + loss_amt)
        d_hi = np.minimum(max_rate, hi[k + 1] - q + loss_amt)
        d_hi = np.maximum(d_hi, d_lo)  # degenerate → single decision
        frac = np.linspace(0.0, 1.0, num_decisions)[:, None]  # [D, 1]
        d = d_lo[None, :] + frac * (d_hi - d_lo)[None, :]  # [D, Q]
        # Always consider the do-nothing decision when feasible.
        zero_ok = (d_lo <= 0.0) & (d_hi >= 0.0)
        d = np.concatenate([d, np.where(zero_ok, 0.0, d_lo)[None, :]], axis=0)
        consumed = np.where(d > 0.0, cons_inject[k] * d, -cons_withdraw[k] * d)
        iw_cost = np.where(d > 0.0, inject_cost[k] * d, -withdraw_cost[k] * d)
        immediate = (
            -(d + consumed) * fwd[k] * df_settle[k]
            - (iw_cost + inv_cost_rate[k] * q[None, :]) * df_cost[k]
        )
        after = q[None, :] + d - loss_amt[None, :]
        cont = np.interp(after, grid_next, v_next)
        return np.max(immediate + cont, axis=0)  # [Q]

    # Terminal values on the end grid.
    grid_next = grid_at(n)
    if ctx.storage.terminal_npv_fn is not None:
        v_next = np.asarray(
            ctx.storage.terminal_npv_fn(np.full_like(grid_next, fwd[n]), grid_next),
            np.float64,
        )
        v_next = np.broadcast_to(v_next, grid_next.shape).copy()
    else:
        v_next = np.zeros_like(grid_next)

    first = 1 if ctx.val_date_is_first_step else 0
    for k in range(n - 1, first - 1, -1):
        q = grid_at(k)
        v_next = sweep(k, q, v_next, grid_next)
        grid_next = q

    if ctx.val_date_is_first_step:
        v0 = sweep(0, np.full(1, float(ctx.inventory)), v_next, grid_next)
        return float(v0[0])
    return float(np.interp(float(ctx.inventory), grid_next, v_next))


def readme_context(num_grid_points: int = 100):
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    for p in (str(root), str(root / "tests")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from test_readme_example import readme_market, readme_storage, settlement_rule

    from storage_tpu.compile import build_valuation_context

    fwd_curve, ir_curve = readme_market()
    return build_valuation_context(
        readme_storage(), "2021-04-25", 1500.0, fwd_curve, ir_curve,
        settlement_rule, num_grid_points, 1e-12,
    )


if __name__ == "__main__":
    ctx = readme_context()
    for grid, dec in ((500, 41), (1500, 81), (3000, 121)):
        npv = brute_force_intrinsic_npv(ctx, grid, dec)
        print(f"brute-force intrinsic optimum  G={grid:<5d} D={dec:<4d}  {npv:,.1f}")
