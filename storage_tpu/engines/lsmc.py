"""Least-Squares Monte Carlo storage valuation — the flagship engine.

Reference: ``LsmcStorageValuation.Calculate<T>``
(``LsmcValuation/LsmcStorageValuation.cs:55-617``).  The TPU formulation
(SURVEY.md §3.2, §7 stage 4):

- **Backward induction** is a ``lax.scan`` over periods carrying the
  value-by-(sim, grid) matrix ``V [S, G]``.  Per period: one design matrix
  ``[S, B]``, one standardized normal-equations solve for ALL grid columns at
  once (two MXU matmuls + a [B,B] Cholesky — replacing the reference's
  float64 MKL QR, :186-191), fixed-width bang-bang decisions, O(1)
  uniform-grid continuation interpolation, and a static unrolled loop over the
  small decision axis so peak memory stays at a few ``[S, G]`` buffers.
- The **lower-bound estimator subtlety** is preserved exactly: the argmax is
  taken over *fitted* continuation values but the realised value uses the
  *actual* simulated continuation of the chosen decision (:321-329) — using
  fitted values for both silently biases the NPV high.
- **Forward pass** is a second scan carrying per-sim inventory, re-applying
  the saved regression coefficients (with their standardization constants) to
  the independent valuation path set (:374-562), accumulating per-sim panels,
  per-period deltas and trigger prices.
- **Distribution-ready**: sims are the batch axis everywhere; under a
  path-sharded mesh the Gram/cross products and all means become cross-shard
  ``psum`` reductions that XLA inserts automatically (see
  :mod:`storage_tpu.parallel`).

Deviations from the reference (documented design choices):

- Per-period grids are fixed-count linspace over the reduced inventory space
  rather than global-spacing ragged grids (see ``compile.py`` note).
- The end-period terminal PV uses the **valuation** path set's end-period spot
  prices; the reference reads the regression sims there
  (``LsmcStorageValuation.cs:567``) even though the forward inventory paths
  came from the valuation sims.
"""
from __future__ import annotations

import logging
import os
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..compile import ValuationContext
from ..exceptions import StorageError
from ..ops.interp import fractional_index
from ..ops.regression import BasisSpec, design_matrix, fit_continuation, standardize_columns
from .common import step_economics

NUM_TRIGGER_VOLUMES = 10  # reference numTriggerPriceVolumes (LsmcStorageValuation.cs:367)
BACKWARD_PCNT_TIME = 0.66  # reference progress weighting (LsmcStorageValuation.cs:46)


def env_sub_tiles() -> int | None:
    """Parse ``STORAGE_TPU_BWD_SUBTILES`` crash-proof (like the string
    gates): a typo must degrade to the adaptive default with a warning, not
    abort a valuation — or worse, kill the bench harness before it prints
    the one JSON line the driver parses.  Returns ``None`` when unset (the
    engine then picks :func:`auto_sub_tiles`)."""
    raw = os.environ.get("STORAGE_TPU_BWD_SUBTILES")
    if raw is None:
        return None
    try:
        return max(1, int(raw))
    except ValueError:
        logging.getLogger(__name__).warning(
            "STORAGE_TPU_BWD_SUBTILES=%r is not an integer; using the "
            "adaptive default", raw
        )
        return None


def auto_sub_tiles(
    block_sims: int, num_grid_points: int, num_decisions: int = 3
) -> int:
    """VMEM-bounded default for the backward kernel's dispatch amortisation.

    Sub-tiling widens the kernel's VMEM block to ``block_sims * sub_tiles``
    lanes (every vector op stays ``block_sims`` wide) so the per-grid-step
    fixed overhead — DMA descriptors, semaphores, scalar prologue — is paid
    once per ``sub_tiles`` compute tiles.  Hardware ladder (Aug 18, 1M paths
    x 341 steps, G=100, fold-affine kernel): 1 tile 1.540 s, 2 tiles
    1.482 s, 4 tiles 1.462 s; gains saturate there, so tiles cap at 4 (the
    saturation knee).

    The span cap models the Mosaic scoped-VMEM STACK (16 MB hard limit):
    per-lane tile temporaries scale ~30 B x G per lane (the [D*G, bS]
    fitted/actual products, the hi/lo rhs splits and the centred-surface
    copies), plus a span-independent shared term for the decision-concat
    bf16 actual matrices (~4 x D x G x (G+4) bytes for the hi/lo pair).
    Calibrated against two measured points: G=100 span 8192 overflowed at
    18.79M (pre-concat) and G=500 span 768 at 18.38M (in-kernel concat,
    since moved to XLA — see prepare_decision_matrices); the 14 MB budget
    keeps ~15% headroom under the 16 MB limit."""
    G = max(num_grid_points, 1)
    shared = 4 * max(num_decisions, 3) * G * (G + 4)
    span_cap = max(block_sims, (14_000_000 - shared) // (30 * G))
    return max(1, min(4, span_cap // block_sims))


#: The affine-fold backward kernel (per-decision immediate economics riding
#: the existing bf16 actual-surface MXU passes, affine sourced from the
#: exact-f32 ``cwa`` columns) is the PRODUCTION default since it measured
#: both more accurate and faster than the broadcast path on real hardware
#: (Aug 18: NPV rel vs f64 golden 5.49e-5 vs 7.32e-5; backward 1M x 341
#: wall 1.546 s vs 1.591 s).  ``STORAGE_TPU_FOLD_AFFINE=0`` reverts to the
#: broadcast path.
FOLD_AFFINE_DEFAULT = True


def env_fold_affine() -> bool:
    """Effective fold-affine kernel setting (crash-proof env parse)."""
    raw = os.environ.get("STORAGE_TPU_FOLD_AFFINE", "")
    if raw == "0":
        return False
    if raw == "1":
        return True
    if raw:
        logging.getLogger(__name__).warning(
            "STORAGE_TPU_FOLD_AFFINE=%r is not 0/1; using default %s",
            raw, FOLD_AFFINE_DEFAULT,
        )
    return FOLD_AFFINE_DEFAULT


class ValuationCancelledError(StorageError):
    """Raised when a cancellation callback requests a stop (reference:
    ``CancellationToken.ThrowIfCancellationRequested``, :339, :490)."""


PANEL_FIELDS = (
    "inventory",  # pre-decision inventory per period
    "inject_withdraw",
    "cmdty_consumed",
    "inventory_loss",
    "net_volume",
    "period_pv",
)


class LsmcArrays(NamedTuple):
    """Raw device outputs of one LSMC run (engine-level, pre-pandas)."""

    npv: jax.Array  # scalar — forward (lower-bound) estimate
    backward_npv: jax.Array  # scalar — backward estimate, diagnostic
    deltas: jax.Array  # [n+1] (last entry 0)
    profile_means: jax.Array  # [n+1, 6] per-period sim-means of PANEL_FIELDS
    panels: jax.Array  # [n+1, 6, S] per-sim panels ([n+1, 6, 0] when not collected)
    pv_by_sim: jax.Array  # [S]
    trigger_has_inject: jax.Array  # [n] bool
    trigger_has_withdraw: jax.Array  # [n] bool
    trigger_inject_volumes: jax.Array  # [n, 10]
    trigger_inject_prices: jax.Array  # [n, 10]
    trigger_withdraw_volumes: jax.Array  # [n, 10] (ordered |vol| increasing)
    trigger_withdraw_prices: jax.Array  # [n, 10]


class LsmcDeviceInputs(NamedTuple):
    """Static-shape device arrays compiled from a :class:`ValuationContext`.

    A NamedTuple (pytree) so the whole bundle can flow through a single jit.
    """

    grids: jax.Array  # [n+1, G]
    space_lo: jax.Array  # [n+1]
    space_hi: jax.Array  # [n+1]
    pillars: jax.Array  # [n, P, 3]
    loss: jax.Array  # [n]
    inject_cost: jax.Array
    withdraw_cost: jax.Array
    cons_inject: jax.Array
    cons_withdraw: jax.Array
    inv_cost_rate: jax.Array
    df_settle: jax.Array
    df_start: jax.Array
    fwd: jax.Array  # [n+1]
    inventory: jax.Array  # scalar


def device_inputs(ctx: ValuationContext, dtype) -> LsmcDeviceInputs:
    return LsmcDeviceInputs(
        grids=jnp.asarray(ctx.grids, dtype),
        space_lo=jnp.asarray(ctx.inv_space.min_inventory, dtype),
        space_hi=jnp.asarray(ctx.inv_space.max_inventory, dtype),
        pillars=jnp.asarray(ctx.pillars, dtype),
        loss=jnp.asarray(ctx.inventory_loss, dtype),
        inject_cost=jnp.asarray(ctx.inject_cost, dtype),
        withdraw_cost=jnp.asarray(ctx.withdraw_cost, dtype),
        cons_inject=jnp.asarray(ctx.cons_inject, dtype),
        cons_withdraw=jnp.asarray(ctx.cons_withdraw, dtype),
        inv_cost_rate=jnp.asarray(ctx.inventory_cost_rate, dtype),
        df_settle=jnp.asarray(ctx.df_settle, dtype),
        df_start=jnp.asarray(ctx.df_cost, dtype),
        fwd=jnp.asarray(ctx.fwd, dtype),
        inventory=jnp.asarray(ctx.inventory, dtype),
    )


# --------------------------------------------------------------------------- #
# Backward induction                                                          #
# --------------------------------------------------------------------------- #


def spot_from_factors(factors_k, vols_k, drift_k):
    """Spot prices from factor states: ``exp(drift + vols . Y)``.

    Inverse of storing simulated spot panels — the spot is a deterministic
    per-period transform of the Markov states (see
    :mod:`storage_tpu.models.simulation`), so engines recompute it in-body
    instead of carrying an extra ``[n, S]`` array.
    """
    log_spot = (
        jnp.einsum("f,fs->s", vols_k, factors_k, precision=jax.lax.Precision.HIGHEST)
        + drift_k
    )
    return jnp.exp(log_spot)


def _backward_step_core(
    v_next,  # [S, G]
    spot,  # [S]
    factors,  # [F, S]
    grid,  # [G]
    next_lo,
    next_hi,
    pillars,
    loss,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    *,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    quantize_weights: bool,
):
    """One backward-induction period (reference :166-340).

    Returns ``(v_this [S, G], coeffs [B, G], mean [B], scale [B], vbar [G])``.
    """
    X = design_matrix(spec, spot, factors)
    Xs, mu, sd = standardize_columns(X)
    # Centre the regression target: continuation values carry the cumulated
    # storage value (magnitudes >> their spread), and the TPU's sequential
    # f32 tile accumulation in X^T V loses enough mantissa at 10^5-10^6 path
    # counts to visibly degrade the fitted policy.  Regressing (V - mean) and
    # adding the mean back bounds accumulation magnitudes by the spread.
    vbar = jnp.mean(v_next, axis=0)  # [G]
    coeffs = fit_continuation(Xs, v_next - vbar)  # [B, G]
    fitted = jnp.dot(
        Xs, coeffs, preferred_element_type=Xs.dtype,
        precision=jax.lax.Precision.HIGHEST,
    ) + vbar  # [S, G]

    econ = step_economics(
        grid, pillars, interp_kind, loss, next_lo, next_hi,
        inject_cost, withdraw_cost, cons_inject, cons_withdraw,
        inv_cost_rate, df_settle, df_start, extra_decisions,
    )
    j, w = fractional_index(econ.inventory_after, next_lo, next_hi, num_grid_points)
    # [G, D] indices/weights onto the next period's grid columns.  With
    # quantize_weights the weights are 1/128-quantized to match the Pallas
    # kernel's discretisation (see backward_scan_pallas), keeping the two
    # backward paths value-identical for parity testing; the engine's XLA
    # fallback (CPU / f64 / kernels off) uses EXACT weights, matching the
    # reference's exact linear interpolation.  The quantization error is
    # bounded by tests/test_lsmc.py::TestWeightQuantization and documented
    # in docs/valuation_math.md.
    if quantize_weights:
        w = jnp.round(w * 128.0) / 128.0

    num_decisions = econ.decisions.shape[-1]
    best_fitted_total = None
    best_actual_total = None
    for d in range(num_decisions):  # static small D: keeps peak memory at O(S*G)
        j_d, w_d = j[:, d], w[:, d]
        # Interpolation as an MXU matmul: the query points depend only on the
        # grid geometry (not on sims), so each decision's linear-interp is a
        # static [G_next, G] two-nonzeros-per-column matrix.  Dense matmul
        # beats lane-dimension gathers on TPU by a wide margin.
        interp_w = (
            jax.nn.one_hot(j_d, num_grid_points, dtype=v_next.dtype) * (1.0 - w_d)[:, None]
            + jax.nn.one_hot(j_d + 1, num_grid_points, dtype=v_next.dtype) * w_d[:, None]
        ).T  # [G_next, G]
        fitted_cont = jnp.dot(
            fitted, interp_w, preferred_element_type=v_next.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # [S, G]
        actual_cont = jnp.dot(
            v_next, interp_w, preferred_element_type=v_next.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        immediate = econ.price_coeff[None, :, d] * spot[:, None] - econ.cost_npv[None, :, d]
        total_fitted = immediate + fitted_cont
        # Lower-bound estimator: realised value of the chosen decision uses the
        # ACTUAL simulated continuation (reference :321-329).  Decision 0 seeds
        # the running argmax unconditionally so a non-finite comparison can
        # never leave the carried values at a bogus initialiser.
        if best_fitted_total is None:
            best_fitted_total = total_fitted
            best_actual_total = immediate + actual_cont
        else:
            better = total_fitted > best_fitted_total
            best_fitted_total = jnp.where(better, total_fitted, best_fitted_total)
            best_actual_total = jnp.where(better, immediate + actual_cont, best_actual_total)
    return best_actual_total, coeffs, mu, sd, vbar


@partial(
    jax.jit,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions",
        "quantize_weights",
    ),
)
def backward_scan(
    v_init,  # [S, G] value at the period AFTER the last one in this chunk
    factors,  # [m, F, S] Markov factor states
    sim_vols,  # [m, F] spot vol loadings sigma_i(t_k)
    sim_drift,  # [m] ln F(0,t_k) - V_k/2
    grids,  # [m, G] grid of each period in the chunk
    next_lo,  # [m]
    next_hi,  # [m]
    pillars,  # [m, P, 3]
    loss,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    quantize_weights: bool = True,
):
    """Reverse scan over a chunk of periods.  Inputs are time-ordered; the scan
    runs backwards.  Returns final carry + per-period regression data."""

    def step(v_next, xs):
        (f, vols, drift, grid, lo, hi, pil, lo_r, ic, wc, ci, cw, icr, dfs, df0) = xs
        # Spot prices are a deterministic transform of the factor states:
        # recomputing them in-body saves an [m, S] array and its HBM traffic.
        spot = spot_from_factors(f, vols, drift)
        v_this, coeffs, mu, sd, vbar = _backward_step_core(
            v_next, spot, f, grid, lo, hi, pil, lo_r, ic, wc, ci, cw, icr, dfs, df0,
            spec=spec, interp_kind=interp_kind,
            num_grid_points=num_grid_points, extra_decisions=extra_decisions,
            quantize_weights=quantize_weights,
        )
        return v_this, (coeffs, mu, sd, vbar)

    xs = (
        factors, sim_vols, sim_drift, grids, next_lo, next_hi, pillars, loss,
        inject_cost, withdraw_cost, cons_inject, cons_withdraw, inv_cost_rate,
        df_settle, df_start,
    )
    v_final, (coeffs, mu, sd, vbar) = jax.lax.scan(step, v_init, xs, reverse=True)
    return v_final, coeffs, mu, sd, vbar


@partial(
    jax.jit,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions",
        "block_sims", "interpret", "mesh", "true_sims",
    ),
)
def backward_scan_pallas(
    v_init,
    factors,
    sim_vols,
    sim_drift,
    grids,
    next_lo,
    next_hi,
    pillars,
    loss,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    block_sims: int,
    interpret: bool = False,
    mesh=None,
    true_sims: Optional[int] = None,
):
    """:func:`backward_scan` with the value update fused into the Pallas
    kernel (:mod:`storage_tpu.ops.pallas_backward`).

    The per-period regression (Gram + Cholesky) stays in XLA — it reduces
    over all sims (cross-shard psums under a mesh, inserted by GSPMD) —
    while the fitted/actual interpolation matmuls, argmax and realised-value
    select run block-resident in VMEM.  The value surface is carried
    TRANSPOSED (``[G, S_pad]``, sims lane-padded once to the kernel block
    multiple — see the layout rule in :mod:`storage_tpu.ops.pallas_backward`)
    so neither the kernel nor the per-step glue ever converts between the
    lane and sublane axes; likewise the factor paths feed the kernel as
    ``[F, S_pad]`` rows with no per-step transpose.  The kernel's masked row
    sums carry the sim-mean ``vbar`` between periods so the centring never
    re-reads the value surface from HBM.  Under ``mesh`` the kernel itself
    runs per path shard via ``shard_map`` (see :func:`pallas_backward_update`).
    """
    from ..ops.pallas_backward import (
        assemble_regression, pallas_backward_update, prepare_decision_matrices,
    )

    # Serial-path optimisation (VERDICT r4 item 2): ride the per-decision
    # affine economics through the existing bf16 actual-surface MXU passes,
    # sourced from the exact-f32 cwa columns (the variant the round-3
    # bisection measured clean).  Hardware-measured more accurate AND faster
    # than the broadcast path, so it is the default; see env_fold_affine and
    # ops/pallas_backward.py.
    fold_affine = env_fold_affine()
    G = num_grid_points
    # Dispatch-overhead amortisation: widen the kernel's VMEM block to N
    # compute tiles (every vector op stays at the measured-safe block_sims
    # width) so the per-grid-step fixed overhead is paid once per N tiles.
    # Default is the VMEM-bounded adaptive pick (see auto_sub_tiles);
    # STORAGE_TPU_BWD_SUBTILES overrides.
    sub_tiles = env_sub_tiles()
    if sub_tiles is None:
        sub_tiles = auto_sub_tiles(block_sims, G)
    W_v = v_init.shape[0]  # incoming value-surface width (maybe pre-padded)
    W_f = factors.shape[-1]  # incoming factor width (maybe pre-padded)
    S = W_v if true_sims is None else true_sims  # true (unpadded) sims
    m = factors.shape[0]
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    true_local = S // ndev

    # Single device: transpose + lane-pad ONCE for the whole scan (the padded
    # lanes run through every step harmlessly and are masked out of the row
    # sums) — to the full VMEM span so the kernel wrapper never re-pads the
    # carry per step.  Under a mesh the padding must be per shard, so the
    # carry stays unpadded and the shard-local kernel wrapper pads (a tiny
    # per-step copy).  Callers that can should pass factors/v_init ALREADY
    # padded to the span multiple (with ``true_sims`` set): the in-program
    # pad below materialises a second full copy of the path set — at 1M
    # paths 4.1 GB of avoidable HBM peak (see simulate_factor_paths(pad_to)).
    # v_init and factors may arrive at DIFFERENT widths (e.g. the span loop
    # feeds pre-padded factor chunks while the first v_end is unpadded);
    # each is padded to the common aligned width independently, and the
    # result is returned at v_init's width so multi-span callers never
    # slice-and-re-pad the carry between spans.
    span = block_sims * min(sub_tiles, max(1, -(-true_local // block_sims)))
    S_pad = (-(-max(W_v, W_f) // span) * span) if mesh is None else W_v
    v_t = jnp.pad(v_init.T, ((0, 0), (0, S_pad - W_v))) if S_pad != W_v else v_init.T
    factors_t = factors  # [m, F, S]
    if S_pad != W_f:
        factors_t = jnp.pad(factors, ((0, 0), (0, 0), (0, S_pad - W_f)))

    def step_geometry(grid, lo, hi, pil, lo_r, ic, wc, ci, cw, icr, dfs, df0):
        """Per-period decision geometry: interp matrices + affine economics.

        Depends only on the grid/ratchet/cost structure — NOT on the carried
        value surface or regression — so it is vmapped over ALL periods once
        before the scan instead of recomputed on the scan's serial path
        (one_hot builds and the pillar walk are VPU-latency-bound glue that
        otherwise sits between kernel dispatches).
        """
        econ = step_economics(
            grid, pil, interp_kind, lo_r, lo, hi, ic, wc, ci, cw, icr, dfs, df0,
            extra_decisions,
        )
        j, w = fractional_index(econ.inventory_after, lo, hi, G)  # [G, D]
        # Quantize the interpolation weights to multiples of 1/128 so BOTH w
        # and 1-w are exactly bfloat16-representable: the kernel's actual-
        # surface product then needs only two bf16 MXU passes (M @ v_hi +
        # M @ v_lo) with no weight-rounding residual, and the weights still
        # sum to exactly 1 (no bias on constant surfaces).  The ~0.8%-of-a-
        # grid-cell weight shift is discretisation-level noise (bounded by
        # tests/test_lsmc.py::TestWeightQuantization).
        w = jnp.round(w * 128.0) / 128.0
        # M_d [G_query, G_next]: row g holds the two interpolation weights of
        # query point g on the next grid (the kernel computes M_d @ V').
        wdt = jnp.stack(
            [
                jax.nn.one_hot(j[:, d], G, dtype=jnp.float32) * (1.0 - w[:, d])[:, None]
                + jax.nn.one_hot(j[:, d] + 1, G, dtype=jnp.float32) * w[:, d][:, None]
                for d in range(econ.decisions.shape[-1])
            ],
            axis=0,
        )  # [D, G, G]
        # Stored bf16: EXACT for 1/128-quantized weights, and the whole-span
        # precompute is the largest per-period array ([n, D, G, G] — ~2 GB
        # f32 at hourly horizons); the scan glue casts back to f32 (also
        # exact) for the HIGHEST-precision cwa einsums.
        return wdt.astype(jnp.bfloat16), econ.cost_npv.T, econ.price_coeff.T

    def kernel_step(k, coeffs, mu, sd, vbar_next, v_next_t, xs_k):
        """Dispatch the fused kernel for period k (regression already solved).

        The kernel also emits Gram/RHS partials for period k-1's regression
        (computed from factors[k-1] against the surface it just wrote), so
        the scan's next iteration skips the XLA design/standardize/Gram pass
        entirely — the [S, B] design matrix never materialises in HBM.
        """
        (vols, drift, vols_p, drift_p, wdt, cost_t, price_t) = xs_k
        f = jax.lax.dynamic_index_in_dim(factors_t, k, 0, keepdims=False)
        f_prev = jax.lax.dynamic_index_in_dim(
            factors_t, jnp.maximum(k - 1, 0), 0, keepdims=False
        )
        # Augmented decision tables [D, G, B+2]: associativity-fold the
        # fitted interpolation through the coefficients (columns 0..B-1 =
        # M_d @ coeffs') AND fold the immediate economics into the same
        # matmul via the kernel design row's trailing ones/spot rows:
        # column B = M_d @ vbar - cost_npv (the shared affine offset),
        # column B+1 = price_coeff (multiplies the spot row).
        cwa_x = jnp.einsum(
            "dqn,bn->dqb", wdt, coeffs, precision=jax.lax.Precision.HIGHEST,
        )  # [D, G, B]
        vbar_d = jnp.einsum(
            "dqn,n->dq", wdt, vbar_next, precision=jax.lax.Precision.HIGHEST,
        )  # [D, G]
        cwa_t = jnp.concatenate(
            [
                cwa_x,
                (vbar_d - cost_t)[..., None],
                price_t[..., None],
            ],
            axis=-1,
        )  # [D, G, B+2]
        musd = jnp.stack([mu, sd], axis=0)
        scal = jnp.stack(
            [jnp.concatenate([drift[None], vols]),
             jnp.concatenate([drift_p[None], vols_p])],
            axis=0,
        )  # [2, 1+F]
        vbar_in = vbar_next[:, None]
        # Kernel refs are typed by out_shape: pin every operand to f32 so
        # weak-type promotion (e.g. under jax_enable_x64) can't feed the f32
        # kernel f64 inputs.
        f, f_prev, wdt, cwa_t, vbar_in, musd, scal = (
            jnp.asarray(a, jnp.float32)
            for a in (f, f_prev, wdt, cwa_t, vbar_in, musd, scal)
        )
        # Decision-concatenated kernel operands, built once per SCAN STEP on
        # XLA (the kernel runs 100s of sim blocks per step — prepping there
        # would repeat this serial VPU work per block; see
        # prepare_decision_matrices).
        fit, act1, act2 = prepare_decision_matrices(
            cwa_t, wdt, spec.num_basis, fold_affine
        )
        return pallas_backward_update(
            f, f_prev, v_next_t, fit, vbar_in, musd, act1, act2, scal,
            spec=spec, num_grid=G, block_sims=block_sims, true_sims=true_local,
            interpret=interpret, mesh=mesh, fold_affine=fold_affine,
            sub_tiles=sub_tiles,
        ), musd

    def slice_xs(all_xs, k):
        return tuple(a[k] for a in all_xs)

    vols_prev = jnp.concatenate([sim_vols[:1], sim_vols[:-1]], axis=0)
    drift_prev = jnp.concatenate([sim_drift[:1], sim_drift[:-1]], axis=0)
    # Whole-span geometry precompute (one fused vmapped program; the scan
    # then reads [D, G, G]-sized slices per step — ~120 KB of HBM traffic,
    # nothing on the serial dispatch path).
    wdt_all, cost_t_all, price_t_all = jax.vmap(step_geometry)(
        grids, next_lo, next_hi, pillars, loss, inject_cost, withdraw_cost,
        cons_inject, cons_withdraw, inv_cost_rate, df_settle, df_start,
    )
    all_xs = (
        sim_vols, sim_drift, vols_prev, drift_prev,
        wdt_all, cost_t_all, price_t_all,
    )

    # Hoisted latest period (k = m-1): its regression has no kernel partials
    # yet, so solve it the XLA way once per scan span.  All reductions here
    # run over the TRUE sims only (padded lanes are sliced away).
    vbar0 = jnp.mean(v_init[:S] if W_v != S else v_init, axis=0)
    f_last = factors_t[m - 1][:, :S] if S_pad != S else factors_t[m - 1]
    spot = spot_from_factors(f_last, sim_vols[m - 1], sim_drift[m - 1])
    X = design_matrix(spec, spot, f_last)
    Xs, mu0, sd0 = standardize_columns(X)
    rhs0 = jax.lax.dot_general(
        Xs, v_t[:, :S] if S_pad != S else v_t, (((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) - jnp.sum(Xs, axis=0)[:, None] * vbar0[None, :]
    gram0 = jax.lax.dot_general(
        Xs, Xs, (((0,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST,
    ) + (1e-6 * S) * jnp.eye(spec.num_basis, dtype=Xs.dtype)
    coeffs0 = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(gram0), rhs0)
    coeffs0 = jnp.where(jnp.isfinite(coeffs0), coeffs0, 0.0)  # see fit_continuation

    (v_t1, vbar1, graw, praw), _ = kernel_step(
        m - 1, coeffs0, mu0, sd0, vbar0, v_t, slice_xs(all_xs, m - 1)
    )

    def step(carry, k):
        v_next_t, vbar_next, c_prev, graw, praw, musd_prev = carry
        # The partials were standardized with musd_prev and centred on c_prev;
        # assemble period k's exact regression from them.
        coeffs, mu, sd = assemble_regression(
            graw, praw, musd_prev, vbar_next - c_prev, S
        )
        (v_this_t, vbar_this, graw_n, praw_n), musd = kernel_step(
            k, coeffs, mu, sd, vbar_next, v_next_t, slice_xs(all_xs, k)
        )
        carry = (v_this_t, vbar_this, vbar_next, graw_n, praw_n, musd)
        return carry, (coeffs, mu, sd, vbar_next)

    carry0 = (v_t1, vbar1, vbar0, graw, praw, jnp.stack([mu0, sd0], axis=0))
    carry_f, ys = jax.lax.scan(
        step, carry0, jnp.arange(m - 2, -1, -1) if m > 1 else jnp.arange(0),
    )
    v_final_t = carry_f[0]

    if m > 1:
        coeffs_s, mu_s, sd_s, vbar_s = ys  # emitted k = m-2 .. 0 (reverse time)
        coeffs_all = jnp.concatenate([coeffs_s[::-1], coeffs0[None]], axis=0)
        mu_all = jnp.concatenate([mu_s[::-1], mu0[None]], axis=0)
        sd_all = jnp.concatenate([sd_s[::-1], sd0[None]], axis=0)
        vbar_all = jnp.concatenate([vbar_s[::-1], vbar0[None]], axis=0)
    else:
        coeffs_all, mu_all = coeffs0[None], mu0[None]
        sd_all, vbar_all = sd0[None], vbar0[None]

    # Return at the INPUT width (W_v): multi-span drivers keep the carry
    # padded end-to-end and slice to the true sims once at the very end.
    v_final = (v_final_t[:, :W_v] if S_pad != W_v else v_final_t).T
    return v_final, coeffs_all, mu_all, sd_all, vbar_all


# --------------------------------------------------------------------------- #
# Forward simulation                                                          #
# --------------------------------------------------------------------------- #


def _trigger_calc(
    mean_cont,  # [G] sim-average fitted continuation on the next grid
    expected_inventory,
    pillars,
    interp_kind,
    loss_rate,
    next_lo,
    next_hi,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    num_grid_points,
    extra_decisions,
):
    """Trigger-price ladders at the expected inventory (reference :492-561).

    Trigger price p solves  ΔContinuation − ΔCost = p · df · (ΔVolume + ΔConsumed)
    between a candidate volume and the 'alternative' (usually zero) decision.
    """
    econ = step_economics(
        jnp.reshape(expected_inventory, (1,)), pillars, interp_kind, loss_rate,
        next_lo, next_hi, inject_cost, withdraw_cost, cons_inject, cons_withdraw,
        inv_cost_rate, df_settle, df_start, extra_decisions,
    )
    decisions = econ.decisions[0]  # [D]
    loss_amt = loss_rate * expected_inventory
    max_inject = jnp.max(decisions)
    max_withdraw = jnp.min(decisions)
    big = jnp.asarray(jnp.finfo(decisions.dtype).max, decisions.dtype)
    alt_inject = jnp.min(jnp.where(decisions >= 0.0, decisions, big))
    alt_withdraw = jnp.max(jnp.where(decisions <= 0.0, decisions, -big))

    def cont_at(volume):
        after = expected_inventory + volume - loss_amt
        j, w = fractional_index(after, next_lo, next_hi, num_grid_points)
        return jnp.take(mean_cont, j) * (1.0 - w) + jnp.take(mean_cont, j + 1) * w

    def cost_of(volume):
        return jnp.where(
            volume > 0.0, inject_cost * volume, withdraw_cost * (-volume)
        ) * df_start

    def consumed_of(volume):
        return jnp.where(volume > 0.0, cons_inject * volume, cons_withdraw * (-volume))

    def trigger_price(volumes, alt):
        d_cont = cont_at(volumes) - cont_at(alt)
        d_cost = cost_of(volumes) - cost_of(alt)
        d_consumed = consumed_of(volumes) - consumed_of(alt)
        denom = df_settle * (volumes - alt + d_consumed)
        # Zero headroom (volumes == alt) makes the denominator exactly 0; the
        # has_inject/has_withdraw masks hide those rows downstream, but the
        # raw arrays are engine outputs too — emit 0 instead of NaN/Inf so
        # consumers (and jax_debug_nans) never see a poisoned value.
        safe = jnp.where(denom != 0.0, denom, 1.0)
        return jnp.where(denom != 0.0, (d_cont - d_cost) / safe, 0.0)

    steps = jnp.arange(1, NUM_TRIGGER_VOLUMES + 1, dtype=decisions.dtype)
    inject_volumes = alt_inject + steps * (max_inject - alt_inject) / NUM_TRIGGER_VOLUMES
    inject_prices = trigger_price(inject_volumes, alt_inject)
    has_inject = (max_inject > 0.0) & (max_inject > alt_inject)

    withdraw_volumes = alt_withdraw + steps * (max_withdraw - alt_withdraw) / NUM_TRIGGER_VOLUMES
    withdraw_prices = trigger_price(withdraw_volumes, alt_withdraw)
    has_withdraw = (max_withdraw < 0.0) & (max_withdraw < alt_withdraw)
    return (
        has_inject, inject_volumes, inject_prices,
        has_withdraw, withdraw_volumes, withdraw_prices,
    )


def dense_continuation(cont):
    """Continuation accessors for a dense per-sim matrix ``[S, G]``."""

    def cont_at(j, w):  # j, w: [S, D]
        return jnp.take_along_axis(cont, j, axis=1) * (1.0 - w) + jnp.take_along_axis(
            cont, j + 1, axis=1
        ) * w

    def cont_mean():
        return jnp.mean(cont, axis=0)

    return cont_at, cont_mean


def regression_continuation(Xn1, table):
    """Continuation accessors from regression data without materialising the
    per-sim ``[S, G]`` matrix.

    ``Xn1 [S, B+1]`` is the standardized design matrix with a ones column;
    ``table [G, B+1]`` stacks the per-grid coefficient columns with the
    centring constant.  Evaluating only at the D per-sim query points turns
    75 ms/step of [S, G] materialisation + lane gathers into small-table
    gathers and an einsum, and the trigger-price mean continuation comes from
    the design-matrix column means alone.
    """

    def cont_at(j, w):  # j, w: [S, D]
        lo = jnp.take(table, j, axis=0)  # [S, D, B+1]
        hi = jnp.take(table, j + 1, axis=0)
        eff = lo * (1.0 - w)[..., None] + hi * w[..., None]
        return jnp.einsum(
            "sb,sdb->sd", Xn1, eff, precision=jax.lax.Precision.HIGHEST
        )

    def cont_mean():
        return jnp.dot(
            table, jnp.mean(Xn1, axis=0), preferred_element_type=table.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G]

    return cont_at, cont_mean


def _forward_step_core(
    carry,
    spot,  # [S]
    cont,  # (cont_at, cont_mean) accessor pair — see dense/regression_continuation
    next_lo,
    next_hi,
    pillars,
    loss_rate,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    fwd_price,
    discount_for_deltas,
    *,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    collect_panels: bool = True,
    quantize_queries: bool = False,
):
    """One forward-simulation period (reference :374-490)."""
    cont_at, cont_mean_fn = cont
    inv, pv = carry
    econ = step_economics(
        inv, pillars, interp_kind, loss_rate, next_lo, next_hi,
        inject_cost, withdraw_cost, cons_inject, cons_withdraw,
        inv_cost_rate, df_settle, df_start, extra_decisions,
    )  # decision axis last: [S, D]
    j, w = fractional_index(econ.inventory_after, next_lo, next_hi, num_grid_points)
    if quantize_queries:
        # Mirror the Pallas forward kernel's 1/256 query quantization (see
        # pallas_forward.fwd_split3) so kernel-vs-XLA parity tests compare
        # like for like; the production XLA fallback stays reference-exact
        # unless STORAGE_TPU_QUANTIZE_WEIGHTS forces the match.
        w = jnp.round(w * 256.0) / 256.0
    cont_d = cont_at(j, w)  # [S, D]
    immediate = econ.immediate_npv(spot[:, None])  # [S, D]
    total = immediate + cont_d
    best = jnp.argmax(total, axis=1)  # [S] first-occurrence argmax like reference

    take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
    volume = take(econ.decisions)
    consumed = take(econ.consumed)
    imm_pv = take(immediate)
    loss_amt = loss_rate * inv
    new_inv = inv + volume - loss_amt
    new_pv = pv + imm_pv

    net_volume = -volume - consumed
    delta = jnp.mean(net_volume * spot) / fwd_price * discount_for_deltas

    mean_cont = cont_mean_fn()  # [G] for trigger prices
    expected_inventory = jnp.mean(inv)
    triggers = _trigger_calc(
        mean_cont, expected_inventory, pillars, interp_kind, loss_rate,
        next_lo, next_hi, inject_cost, withdraw_cost, cons_inject, cons_withdraw,
        inv_cost_rate, df_settle, df_start, num_grid_points, extra_decisions,
    )
    fields = (inv, volume, consumed, loss_amt, net_volume, imm_pv)
    means = jnp.stack(
        [expected_inventory] + [jnp.mean(x) for x in fields[1:]]
    )  # [6], PANEL_FIELDS order
    if collect_panels:
        rows = jnp.stack(fields)  # [6, S]
    else:
        rows = jnp.zeros((6, 0), inv.dtype)
    outputs = (means, delta, rows) + triggers
    return (new_inv, new_pv), outputs


@partial(
    jax.jit,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions", "collect_panels",
        "quantize_queries",
    ),
)
def forward_scan(
    carry,
    factors,  # [m, F, S]
    sim_vols,  # [m, F]
    sim_drift,  # [m]
    coeffs,  # [m, B, G]
    mus,  # [m, B]
    sds,  # [m, B]
    vbars,  # [m, G]
    next_lo,  # [m]
    next_hi,  # [m]
    pillars,
    loss,
    inject_cost,
    withdraw_cost,
    cons_inject,
    cons_withdraw,
    inv_cost_rate,
    df_settle,
    df_start,
    fwd,
    discount_for_deltas,  # [m]
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    collect_panels: bool = True,
    quantize_queries: bool = False,
):
    def step(carry, xs):
        (f, vols, drift, cf, mu, sd, vbar, lo, hi, pil, lr, ic, wc, ci, cw, icr, dfs, df0, fp, dd) = xs
        spot = spot_from_factors(f, vols, drift)
        X = design_matrix(spec, spot, f)
        Xn = (X - mu) / sd
        Xn1 = jnp.concatenate([Xn, jnp.ones((Xn.shape[0], 1), Xn.dtype)], axis=1)
        table = jnp.concatenate([cf.T, vbar[:, None]], axis=1)  # [G, B+1]
        cont = regression_continuation(Xn1, table)
        return _forward_step_core(
            carry, spot, cont, lo, hi, pil, lr, ic, wc, ci, cw, icr, dfs, df0, fp, dd,
            interp_kind=interp_kind, num_grid_points=num_grid_points,
            extra_decisions=extra_decisions, collect_panels=collect_panels,
            quantize_queries=quantize_queries,
        )

    xs = (
        factors, sim_vols, sim_drift, coeffs, mus, sds, vbars, next_lo, next_hi,
        pillars, loss, inject_cost, withdraw_cost, cons_inject, cons_withdraw,
        inv_cost_rate, df_settle, df_start, fwd, discount_for_deltas,
    )
    return jax.lax.scan(step, carry, xs)


# --------------------------------------------------------------------------- #
# Engine driver                                                               #
# --------------------------------------------------------------------------- #


def _chunk_bounds(n: int, num_chunks: int) -> List[Tuple[int, int]]:
    """Split range(n) into at most num_chunks contiguous spans (for progress
    reporting between jitted scan chunks)."""
    num_chunks = max(1, min(num_chunks, n))
    edges = np.linspace(0, n, num_chunks + 1).astype(int)
    return [(int(a), int(b)) for a, b in zip(edges[:-1], edges[1:]) if b > a]


# Empirically, the axon TPU backend mis-lowers long scans once the cumulative
# steps x sims x grid element count crosses ~2^31 (int32 offset overflow):
# the carried value matrix silently comes back all-zero.  Splitting into
# sub-scans below this budget inside the same program is loss-free.
_MAX_SCAN_ELEMENTS = 1_000_000_000
# The failure mode is in XLA's dense scan lowering; the Pallas backward path
# updates the carry through an aliased custom call instead and measures clean
# 17x past the old threshold (1M sims x 365 steps x 100 grid = 3.65e10,
# npv/vbar healthy; chunking it costs ~10% wall and 3-4x compile time).  Its
# budget is effectively unlimited, with `_check_backward_health` still
# probing every run for the zeroed-surface signature.
_MAX_SCAN_ELEMENTS_PALLAS = 1_000_000_000_000

# The fused FORWARD kernel keeps its whole span horizon VMEM-resident per
# sim block (~17 KB/step at 1024 lanes, double-buffered), so span length is
# bounded by the 16 MB scoped-VMEM limit: 341 steps compiles, 512 overflows
# by 16 KB (measured on v5e).  256 leaves ~2x headroom for wider bases.
# The backward kernel dispatches per STEP (constant scoped VMEM) and has no
# such span bound.
_FORWARD_PALLAS_MAX_SPAN = 256


def _check_backward_health(coeffs, vbars, fwd=None) -> None:
    """Cheap post-run probe for the silent-zeroing backend failure that
    motivated ``_MAX_SCAN_ELEMENTS``: if a backend update moves the overflow
    threshold, the carried value surface comes back all-zero (vbars == 0 for
    every period) or NaNs.  ``vbars`` (the per-period sim-means of the value
    surface) is the right signal for both probes — unlike the regression
    coefficients it is never NaN-sanitised upstream, so a numerical blow-up
    actually reaches it.  Three device-side reductions, one fetch — no
    material cost at any scale.

    A genuinely worthless facility (zero value at every grid point of every
    period) trips the same signature; when ``fwd`` (the forward curve the
    valuation ran against) is given and is itself identically zero, the zero
    surface is recognised as legitimate and only warned about.  For non-zero
    curves, set ``STORAGE_TPU_ALLOW_ZERO_SURFACE=1`` to downgrade the error
    to a warning (e.g. a facility whose costs exceed every spread).
    """
    import logging
    import os

    if fwd is not None and not np.any(np.asarray(fwd)):
        fwd_zero = True
    else:
        fwd_zero = False
    # One fetch for all probes: each host read of a device scalar costs a
    # full round trip on the remote-chip tunnel (~30 ms).
    finite_c, finite_v, nonzero_v = np.asarray(
        jnp.stack([
            jnp.all(jnp.isfinite(coeffs)).astype(jnp.float32),
            jnp.all(jnp.isfinite(vbars)).astype(jnp.float32),
            jnp.any(vbars != 0.0).astype(jnp.float32) if vbars.size
            else jnp.asarray(1.0, jnp.float32),
        ])
    )
    if not (finite_c and finite_v):
        raise StorageError(
            "Backward induction produced non-finite values "
            f"(regression coefficients finite: {bool(finite_c)}, value-surface "
            f"means finite: {bool(finite_v)}); this indicates a numerical "
            "failure in the backward scan (see the _MAX_SCAN_ELEMENTS note in "
            "engines/lsmc.py)."
        )
    if vbars.size and not nonzero_v:
        msg = (
            "Backward induction value surface is identically zero for every "
            "period — with non-zero forward prices this is the known "
            "scan-overflow backend failure (engines/lsmc.py "
            "_MAX_SCAN_ELEMENTS); a silently-wrong NPV must not be returned. "
            "Set STORAGE_TPU_ALLOW_ZERO_SURFACE=1 if this facility is "
            "genuinely worthless (zero value at every state)."
        )
        if fwd_zero or os.environ.get("STORAGE_TPU_ALLOW_ZERO_SURFACE"):
            logging.getLogger("storage_tpu.lsmc").warning(msg)
        else:
            raise StorageError(msg)


def _check_forward_health(pv, inv_final, backward_npv) -> None:
    """Forward-side twin of :func:`_check_backward_health`: if an XLA forward
    scan ever crosses the overflow threshold (see ``_MAX_SCAN_ELEMENTS``), the
    per-sim PV vector comes back all-zero or non-finite.  Legitimately
    zero-PV runs are distinguished two ways: (a) when the backward pass
    itself valued the store at ~0, a zero forward PV is expected; (b) a
    facility whose value is entirely TERMINAL (do-nothing optimal at every
    step with a ``terminal_storage_npv``) has zero decision PV but a non-zero
    backward estimate — there the final inventory equals the (non-zero)
    starting inventory, whereas the overflow failure zeroes the whole scan
    carry including inventory.  Only the pv-zero AND inventory-zero AND
    backward-non-zero combination raises.  One stacked fetch, same cost
    posture as the backward probe.
    """
    finite_p, nonzero_p, inv_nonzero_p, back_zero = np.asarray(
        jnp.stack([
            jnp.all(jnp.isfinite(pv)).astype(jnp.float32),
            jnp.any(pv != 0.0).astype(jnp.float32),
            jnp.any(inv_final != 0.0).astype(jnp.float32),
            (jnp.abs(backward_npv) < 1e-9).astype(jnp.float32),
        ])
    )
    if not finite_p:
        raise StorageError(
            "Forward simulation produced non-finite per-simulation PVs; this "
            "indicates a numerical failure in the forward scan (see the "
            "_MAX_SCAN_ELEMENTS note in engines/lsmc.py)."
        )
    if pv.size and not nonzero_p and not inv_nonzero_p and not back_zero:
        import logging
        import os

        msg = (
            "Forward simulation PV and inventory paths are identically zero "
            "while the backward estimate is not — this is the known "
            "scan-overflow backend "
            "failure signature (engines/lsmc.py _MAX_SCAN_ELEMENTS); a "
            "silently-wrong NPV must not be returned. Set "
            "STORAGE_TPU_ALLOW_ZERO_SURFACE=1 to downgrade to a warning."
        )
        if os.environ.get("STORAGE_TPU_ALLOW_ZERO_SURFACE"):
            logging.getLogger("storage_tpu.lsmc").warning(msg)
        else:
            raise StorageError(msg)


def _overflow_safe_spans(
    num_steps: int, num_sims: int, num_grid: int, pallas: bool = False,
    max_steps_cap: Optional[int] = None,
) -> List[Tuple[int, int]]:
    budget = _MAX_SCAN_ELEMENTS_PALLAS if pallas else _MAX_SCAN_ELEMENTS
    per_step = max(1, num_sims * num_grid)
    max_steps = max(1, budget // per_step)
    if max_steps_cap is not None:
        max_steps = min(max_steps, max(1, max_steps_cap))
    num_chunks = -(-num_steps // max_steps)
    return _chunk_bounds(num_steps, num_chunks)


def _backward_span_cap(num_factors: int, width: int, itemsize: int) -> Optional[int]:
    """HBM-peak cap on the backward scan's span length, in steps.

    XLA copy-insertion materialises one copy of everything a ``while`` carry
    references that comes from a read-only parameter — for a whole-horizon
    span that is the entire ``[m, F, S]`` path set (4.1 GB at 1M paths; the
    round-3/4 whole-horizon OOM).  Capping the span so each scan's carry
    slice stays under ``STORAGE_TPU_BWD_SPAN_BYTES`` (default 1.25 GB) keeps
    the backward induction ONE XLA program (no host syncs between spans)
    while bounding the transient copy.  Small path counts never split.
    """
    span_bytes = float(os.environ.get("STORAGE_TPU_BWD_SPAN_BYTES", 1.25e9))
    if span_bytes <= 0:  # escape hatch: 0 disables the cap
        return None
    per_step = max(1, num_factors * width * itemsize)
    return max(16, int(span_bytes // per_step))

def _backward_program(
    reg_factors,  # [m, F, S] simulated periods only (S may be lane-padded)
    sim_vols,  # [m, F]
    sim_drift,  # [m]
    dev: LsmcDeviceInputs,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    val_first: bool,
    terminal_fn,
    pallas: Optional[Tuple[int, bool]] = None,
    mesh=None,
    quantize_weights: bool = False,
    true_sims: Optional[int] = None,
):
    """Backward induction as one XLA program.

    Returns ``(backward_npv, cont_mean0 [G], coeffs [m,B,G], mus, sds, vbars)``.
    ``cont_mean0`` is the current-period mean continuation when ``val_first``
    (reference :171-181), else zeros (unused).  ``pallas`` is a
    ``(block_sims, interpret)`` pair routing the per-period value update
    through the fused kernel (:mod:`storage_tpu.ops.pallas_backward`),
    shard_map'd over ``mesh`` when one is given.
    """
    G = num_grid_points
    num_sims = reg_factors.shape[-1]  # incoming width (maybe lane-padded)
    S_true = num_sims if true_sims is None else true_sims
    if S_true != num_sims and pallas is None:
        raise ValueError(
            "pre-padded factor paths (true_sims < width) require the Pallas "
            "route — the XLA backward scan reduces over every lane"
        )
    dtype = reg_factors.dtype
    n = reg_factors.shape[0] - 1 + (1 if val_first else 0)  # total decision steps

    static = dict(
        spec=spec, interp_kind=interp_kind,
        num_grid_points=G, extra_decisions=extra_decisions,
    )

    # Terminal values on the end-period grid (reference :107-128), computed on
    # the regression path set like the backward induction itself.  Padded
    # lanes carry zeros (never a user terminal_fn's value at the padded
    # lanes' meaningless spots — that could be NaN and poison masked sums).
    if terminal_fn is None:
        v_end = jnp.zeros((num_sims, G), dtype=dtype)
    else:
        end_f = (
            reg_factors[-1][:, :S_true] if S_true != num_sims
            else reg_factors[-1]
        )
        end_spots = spot_from_factors(end_f, sim_vols[-1], sim_drift[-1])
        v_end = jnp.asarray(
            terminal_fn(end_spots[:, None], dev.grids[n][None, :]), dtype
        )
        v_end = jnp.broadcast_to(v_end, (S_true, G))
        if S_true != num_sims:
            v_end = jnp.pad(v_end, ((0, num_sims - S_true), (0, 0)))

    first = 1 if val_first else 0
    m = reg_factors.shape[0] - 1  # simulated decision steps
    v = v_end
    parts = []
    scan_fn = (
        partial(backward_scan, quantize_weights=quantize_weights)
        if pallas is None
        else partial(
            backward_scan_pallas, block_sims=pallas[0], interpret=pallas[1],
            mesh=mesh, true_sims=S_true,
        )
    )
    span_cap = (
        _backward_span_cap(
            reg_factors.shape[1], num_sims, jnp.dtype(dtype).itemsize
        )
        if pallas is not None
        else None
    )
    spans = reversed(
        _overflow_safe_spans(m, num_sims, G, pallas is not None, span_cap)
    )
    for i, (a, b) in enumerate(spans):
        lo_k, hi_k = first + a, first + b
        if i == 0:
            chunk = reg_factors[a:b]
        else:
            # Sequencing guard: route the factor array through an
            # optimization_barrier with the previous span's value surface so
            # each span's slice-copy cannot be scheduled before that span is
            # reached — without it XLA hoists ALL span slices to the top of
            # the program and keeps the full 4.1 GB of them live at once at
            # 1M paths (the barrier is opaque to the simplifier; an index
            # arithmetic trick like `a + (x & 0)` gets constant-folded away).
            src, v = jax.lax.optimization_barrier((reg_factors, v))
            chunk = src[a:b]
        v, coeffs_c, mus_c, sds_c, vbars_c = scan_fn(
            v,
            chunk,
            sim_vols[a:b],
            sim_drift[a:b],
            dev.grids[lo_k:hi_k],
            dev.space_lo[lo_k + 1 : hi_k + 1],
            dev.space_hi[lo_k + 1 : hi_k + 1],
            dev.pillars[lo_k:hi_k],
            dev.loss[lo_k:hi_k],
            dev.inject_cost[lo_k:hi_k],
            dev.withdraw_cost[lo_k:hi_k],
            dev.cons_inject[lo_k:hi_k],
            dev.cons_withdraw[lo_k:hi_k],
            dev.inv_cost_rate[lo_k:hi_k],
            dev.df_settle[lo_k:hi_k],
            dev.df_start[lo_k:hi_k],
            **static,
        )
        parts.insert(0, (coeffs_c, mus_c, sds_c, vbars_c))
    coeffs, mus, sds, vbars = (
        jnp.concatenate([p[i] for p in parts], axis=0) for i in range(4)
    )

    if v.shape[0] != S_true:  # zero-span edge: v is still the padded v_end
        v = v[:S_true]
    if val_first:
        v0, cont_mean0 = _current_period_step(
            v, dev, interp_kind, G, extra_decisions, dtype
        )
        backward_npv = jnp.mean(v0)
    else:
        cont_mean0 = jnp.zeros((G,), dtype)
        backward_npv = jnp.mean(v[:, 0])
    return backward_npv, cont_mean0, coeffs, mus, sds, vbars


def _forward_program(
    val_factors,  # [m, F, S] simulated periods only
    sim_vols,  # [m, F]
    sim_drift,  # [m]
    cont_mean0,  # [G]
    coeffs,  # [m-?, B, G] per simulated decision step
    mus,
    sds,
    vbars,
    dev: LsmcDeviceInputs,
    backward_npv,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    val_first: bool,
    terminal_fn,
    discount_deltas: bool,
    collect_panels: bool,
) -> LsmcArrays:
    """Forward policy simulation + result assembly as one XLA program."""
    G = num_grid_points
    num_sims = val_factors.shape[-1]
    dtype = val_factors.dtype
    n = val_factors.shape[0] - 1 + (1 if val_first else 0)
    first = 1 if val_first else 0

    static = dict(
        spec=spec, interp_kind=interp_kind,
        num_grid_points=G, extra_decisions=extra_decisions,
        collect_panels=collect_panels,
    )

    dfd = dev.df_settle if discount_deltas else jnp.ones_like(dev.df_settle)
    inv0 = jnp.full((num_sims,), dev.inventory, dtype)
    pv0 = jnp.zeros((num_sims,), dtype)
    carry = (inv0, pv0)
    out_parts = []

    if val_first:
        cont0 = dense_continuation(jnp.broadcast_to(cont_mean0[None, :], (num_sims, G)))
        spot0 = jnp.full((num_sims,), dev.fwd[0])
        carry, outputs0 = _forward_step_core(
            carry, spot0, cont0,
            dev.space_lo[1], dev.space_hi[1],
            dev.pillars[0], dev.loss[0],
            dev.inject_cost[0], dev.withdraw_cost[0],
            dev.cons_inject[0], dev.cons_withdraw[0],
            dev.inv_cost_rate[0], dev.df_settle[0], dev.df_start[0],
            dev.fwd[0], dfd[0],
            interp_kind=interp_kind, num_grid_points=G,
            extra_decisions=extra_decisions, collect_panels=collect_panels,
        )
        out_parts.append(jax.tree.map(lambda x: x[None], outputs0))

    m = val_factors.shape[0] - 1
    for a, b in _overflow_safe_spans(m, num_sims, G):
        lo_k, hi_k = first + a, first + b
        carry, outputs = forward_scan(
            carry,
            val_factors[a:b],
            sim_vols[a:b],
            sim_drift[a:b],
            coeffs[a:b],
            mus[a:b],
            sds[a:b],
            vbars[a:b],
            dev.space_lo[lo_k + 1 : hi_k + 1],
            dev.space_hi[lo_k + 1 : hi_k + 1],
            dev.pillars[lo_k:hi_k],
            dev.loss[lo_k:hi_k],
            dev.inject_cost[lo_k:hi_k],
            dev.withdraw_cost[lo_k:hi_k],
            dev.cons_inject[lo_k:hi_k],
            dev.cons_withdraw[lo_k:hi_k],
            dev.inv_cost_rate[lo_k:hi_k],
            dev.df_settle[lo_k:hi_k],
            dev.df_start[lo_k:hi_k],
            dev.fwd[lo_k:hi_k],
            dfd[lo_k:hi_k],
            quantize_queries=_xla_quantize_weights(),
            **static,
        )
        out_parts.append(outputs)

    stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *out_parts)
    end_spots = spot_from_factors(val_factors[-1], sim_vols[-1], sim_drift[-1])
    return _assemble_arrays(
        stacked, carry, end_spots, terminal_fn, backward_npv, dtype, collect_panels
    )


def _assemble_arrays(
    stacked, carry, end_spots, terminal_fn, backward_npv, dtype, collect_panels
) -> LsmcArrays:
    (
        means_rows,  # [n, 6] per-step means: inv, volume, consumed, loss, net, pv
        deltas_rows,
        rows,  # [n, 6, S] per-sim panels, or [n, 6, 0] when not collected
        has_inj, inj_vols, inj_prices, has_wdr, wdr_vols, wdr_prices,
    ) = stacked
    inv_final, pv_by_sim = carry
    num_sims = inv_final.shape[0]

    # ---- End-period terminal PV (reference :563-579; valuation sims here,
    # see module docstring) ---- #
    if terminal_fn is not None:
        terminal_pv = jnp.asarray(terminal_fn(end_spots, inv_final), dtype)
        terminal_pv = jnp.broadcast_to(terminal_pv, (num_sims,))
    else:
        terminal_pv = jnp.zeros((num_sims,), dtype)
    pv_by_sim = pv_by_sim + terminal_pv

    end_means = jnp.stack(
        [jnp.mean(inv_final), 0.0, 0.0, 0.0, 0.0, jnp.mean(terminal_pv)]
    ).astype(dtype)
    profile_means = jnp.concatenate([means_rows, end_means[None]], axis=0)

    if collect_panels:
        end_rows = jnp.stack(
            [
                inv_final,
                jnp.zeros_like(inv_final),
                jnp.zeros_like(inv_final),
                jnp.zeros_like(inv_final),
                jnp.zeros_like(inv_final),
                terminal_pv,
            ]
        )  # [6, S]
        panels = jnp.concatenate([rows, end_rows[None]], axis=0)  # [n+1, 6, S]
    else:
        panels = jnp.zeros((profile_means.shape[0], 6, 0), dtype)

    return LsmcArrays(
        npv=jnp.mean(pv_by_sim),
        backward_npv=backward_npv,
        deltas=jnp.concatenate([deltas_rows, jnp.zeros((1,), dtype)], axis=0),
        profile_means=profile_means,
        panels=panels,
        pv_by_sim=pv_by_sim,
        trigger_has_inject=has_inj,
        trigger_has_withdraw=has_wdr,
        trigger_inject_volumes=inj_vols,
        trigger_inject_prices=inj_prices,
        trigger_withdraw_volumes=wdr_vols,
        trigger_withdraw_prices=wdr_prices,
    )


# NOTE on donation: the factor-path argument is live across the entire scan
# and the programs' outputs are grid-sized (nothing of the paths' shape), so
# donate_argnums could never alias it — XLA warned "donated buffers were not
# usable" and kept the buffer pinned regardless.  The HBM-peak fix is
# upstream instead: simulate_factor_paths(pad_to=...) emits kernel-aligned
# paths so the Pallas scans never materialise a padded second copy.
_backward_program_jit = jax.jit(
    _backward_program,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions",
        "val_first", "terminal_fn", "pallas", "mesh", "quantize_weights",
        "true_sims",
    ),
)

_forward_program_jit = jax.jit(
    _forward_program,
    static_argnames=(
        "spec", "interp_kind", "num_grid_points", "extra_decisions",
        "val_first", "terminal_fn", "discount_deltas", "collect_panels",
    ),
)


def run_lsmc(
    ctx: ValuationContext,
    reg_sims,  # callable () -> factors [m, F, S], or the array itself
    val_sims,  # callable () -> factors [m, F, S], or the array itself
    sim_vols,  # [m, F] spot-vol loadings per simulated period
    sim_drift,  # [m] ln F(0,t_k) - V_k/2 per simulated period
    spec: BasisSpec,
    discount_deltas: bool,
    extra_decisions: int = 0,
    dtype=jnp.float32,
    on_progress_update: Optional[Callable[[float], None]] = None,
    cancelled: Optional[Callable[[], bool]] = None,
    num_progress_chunks: int = 20,
    mesh=None,
    collect_panels: bool = True,
    stopwatches=None,
    num_sims: Optional[int] = None,
) -> LsmcArrays:
    """Run backward induction + forward simulation.

    ``num_sims`` (the true path count, when known up front) lets the driver
    ask ``pad_to``-aware simulation factories for kernel-aligned (lane-
    padded) path sets, which removes a full padded path-set copy from the
    backward/forward programs' HBM peaks.  Factories without a ``pad_to``
    parameter and direct arrays behave exactly as before.

    ``reg_sims``/``val_sims`` are factories so the regression path set can be
    freed before the valuation set is simulated — at production path counts
    each set is GBs of HBM (reference simulates lazily per phase too,
    :100 and :346).

    The common case compiles to exactly two XLA programs (backward/forward).
    With progress/cancellation hooks the scans split into chunks with host
    callbacks between them (reference :337-339, :488-490).
    """
    G = ctx.num_grid_points
    dev = device_inputs(ctx, dtype)
    statics = dict(
        spec=spec,
        interp_kind=ctx.interp_kind,
        num_grid_points=G,
        extra_decisions=extra_decisions,
        val_first=ctx.val_date_is_first_step,
        terminal_fn=ctx.storage.terminal_npv_fn,
    )

    def shard(factors):
        if mesh is None:
            return factors
        from ..parallel.mesh import shard_sims

        return shard_sims(mesh, factors, 2)

    sim_vols = jnp.asarray(sim_vols, dtype)
    sim_drift = jnp.asarray(sim_drift, dtype)

    from ..models.simulation import StreamingFactorSource

    chunked = on_progress_update is not None or cancelled is not None
    # Lane-pad hint: with a known path count and the single-device Pallas
    # route ahead, ask the simulation factory to emit factor paths ALREADY
    # padded to the backward scan's span multiple — the scan then uses them
    # in place instead of materialising a padded second copy (4.1 GB at 1M
    # paths; the whole-horizon materialised OOM of rounds 3-4).
    reg_pad = None
    if (
        not chunked and mesh is None and num_sims is not None
        and jnp.dtype(dtype) == jnp.float32
    ):
        bpal_hint = _pallas_backward_eligible(
            mesh, dtype, num_sims, ctx.num_grid_points
        )
        if bpal_hint is not None:
            tgt = _backward_pad_target(
                num_sims, ctx.num_grid_points, bpal_hint[0]
            )
            reg_pad = tgt if tgt != num_sims else None
    reg = _call_sim_factory(reg_sims, reg_pad)
    if chunked or isinstance(reg, StreamingFactorSource):
        # Streaming sources always take the chunked driver: factor paths are
        # re-simulated span-by-span there instead of materialising [m, F, S].
        return _run_lsmc_chunked(
            ctx, reg, val_sims, sim_vols, sim_drift, dev, spec, discount_deltas,
            extra_decisions, dtype, on_progress_update, cancelled,
            num_progress_chunks, mesh, collect_panels, stopwatches,
        )

    reg_factors = shard(reg)
    del reg
    width = reg_factors.shape[-1]
    true = num_sims if (num_sims is not None and width >= num_sims) else width
    if stopwatches is not None:
        stopwatches.start("BackwardInduction")
    bpal = _pallas_backward_eligible(mesh, dtype, true, ctx.num_grid_points)
    backward_npv, cont_mean0, coeffs, mus, sds, vbars = _backward_program_jit(
        reg_factors, sim_vols, sim_drift, dev, pallas=bpal, mesh=mesh,
        quantize_weights=_xla_quantize_weights(), true_sims=true, **statics
    )
    jax.block_until_ready(coeffs)
    _check_backward_health(coeffs, vbars, ctx.fwd)
    if stopwatches is not None:
        stopwatches.stop("BackwardInduction")
    del reg_factors

    fpal = _pallas_forward_eligible(
        ctx, extra_decisions, mesh, collect_panels, true, dtype
    )
    val_pad = None
    if fpal is not None and mesh is None:
        tgt = -(-true // fpal[0]) * fpal[0]
        val_pad = tgt if tgt != true else None
    val_factors = shard(_call_sim_factory(val_sims, val_pad))
    if stopwatches is not None:
        stopwatches.start("ForwardSimulation")
    if fpal is not None:
        arrays = _forward_program_pallas(
            val_factors, sim_vols, sim_drift, cont_mean0, coeffs, mus, sds, vbars,
            dev, backward_npv,
            discount_deltas=discount_deltas, block_sims=fpal[0],
            interpret=fpal[1], mesh=mesh, true_sims=true, **statics
        )
    else:
        arrays = _forward_program_jit(
            val_factors, sim_vols, sim_drift, cont_mean0, coeffs, mus, sds, vbars, dev,
            backward_npv,
            discount_deltas=discount_deltas, collect_panels=collect_panels, **statics
        )
    if stopwatches is not None:
        if getattr(stopwatches, "sync", False):
            np.asarray(arrays.npv)  # tunnel-honest sync (block_until_ready is not)
        else:
            jax.block_until_ready(arrays.npv)
        stopwatches.stop("ForwardSimulation")
    return arrays


def _factor_access(factors_or_source, shard):
    """Uniform chunk access over a materialised ``[m+1, F, S]`` array or a
    :class:`~storage_tpu.models.simulation.StreamingFactorSource`.

    Returns ``(get(a, b), last(), num_sims, source_spans_or_None)``.
    """
    from ..models.simulation import StreamingFactorSource

    if isinstance(factors_or_source, StreamingFactorSource):
        src = factors_or_source
        return src.factors, src.last, src.num_sims, src.spans()
    arr = shard(factors_or_source)
    return (
        lambda a, b: arr[a:b],
        lambda: arr[-1],
        arr.shape[-1],
        None,
    )


def _refine_spans(m: int, max_steps: int, min_count: int, source_spans):
    """Chunk [0, m) into scan spans.

    Without a streaming source this is :func:`_chunk_bounds` capped by the
    overflow budget.  With one, the source's aligned spans are the outer
    structure (each ``factors(a, b)`` call must stay within one span) and are
    further split only if they exceed the scan-element budget.
    """
    if source_spans is None:
        return _chunk_bounds(m, max(min_count, -(-m // max_steps)))
    out = []
    for a, b in source_spans:
        if a >= m:
            break
        b = min(b, m)
        for aa, bb in _chunk_bounds(b - a, -(-(b - a) // max_steps)):
            out.append((a + aa, a + bb))
    return out


def _run_lsmc_chunked(
    ctx, reg_sims, val_sims, sim_vols, sim_drift, dev, spec, discount_deltas,
    extra_decisions, dtype, on_progress_update, cancelled, num_progress_chunks,
    mesh, collect_panels, stopwatches=None,
) -> LsmcArrays:
    """Chunked variant: host progress/cancellation hooks between scan chunks,
    and span-by-span factor re-simulation when given streaming sources."""
    n = ctx.n_steps
    G = ctx.num_grid_points
    interp_kind = ctx.interp_kind
    terminal_fn = ctx.storage.terminal_npv_fn
    val_first = ctx.val_date_is_first_step
    first = 1 if val_first else 0

    def shard(factors):
        if mesh is None:
            return factors
        from ..parallel.mesh import shard_sims

        return shard_sims(mesh, factors, 2)

    def check_cancel():
        if cancelled is not None and cancelled():
            raise ValuationCancelledError("Storage valuation was cancelled.")

    def report(frac):
        if on_progress_update is not None:
            on_progress_update(frac)

    if stopwatches is not None:
        stopwatches.start("BackwardInduction")
    reg = reg_sims() if callable(reg_sims) else reg_sims
    reg_fac, reg_last, num_sims, reg_spans = _factor_access(reg, shard)

    if terminal_fn is None:
        v_end = jnp.zeros((num_sims, G), dtype=dtype)
    else:
        end_spots = spot_from_factors(reg_last(), sim_vols[-1], sim_drift[-1])
        v_end = jnp.asarray(
            terminal_fn(end_spots[:, None], dev.grids[n][None, :]), dtype
        )
        v_end = jnp.broadcast_to(v_end, (num_sims, G))

    static = dict(
        spec=spec, interp_kind=interp_kind,
        num_grid_points=G, extra_decisions=extra_decisions,
    )
    m = n - first  # simulated decision steps

    bpal = _pallas_backward_eligible(mesh, dtype, num_sims, G)
    per_step = num_sims * G
    budget = _MAX_SCAN_ELEMENTS_PALLAS if bpal is not None else _MAX_SCAN_ELEMENTS
    min_chunks = -(-m * per_step // budget)
    max_steps = max(1, budget // per_step)
    spans = _refine_spans(
        m, max_steps, max(num_progress_chunks, min_chunks), reg_spans
    )
    v = v_end
    coeffs_parts: List[jax.Array] = []
    mu_parts: List[jax.Array] = []
    sd_parts: List[jax.Array] = []
    vbar_parts: List[jax.Array] = []
    total_back = max(1, len(spans))
    bscan = (
        partial(backward_scan, quantize_weights=_xla_quantize_weights())
        if bpal is None
        else partial(
            backward_scan_pallas, block_sims=bpal[0], interpret=bpal[1], mesh=mesh
        )
    )
    for i, (a, b) in enumerate(reversed(spans)):
        lo_k = first + a
        hi_k = first + b
        v, coeffs_c, mu_c, sd_c, vbar_c = bscan(
            v,
            reg_fac(a, b),
            sim_vols[a:b],
            sim_drift[a:b],
            dev.grids[lo_k:hi_k],
            dev.space_lo[lo_k + 1 : hi_k + 1],
            dev.space_hi[lo_k + 1 : hi_k + 1],
            dev.pillars[lo_k:hi_k],
            dev.loss[lo_k:hi_k],
            dev.inject_cost[lo_k:hi_k],
            dev.withdraw_cost[lo_k:hi_k],
            dev.cons_inject[lo_k:hi_k],
            dev.cons_withdraw[lo_k:hi_k],
            dev.inv_cost_rate[lo_k:hi_k],
            dev.df_settle[lo_k:hi_k],
            dev.df_start[lo_k:hi_k],
            **static,
        )
        coeffs_parts.insert(0, coeffs_c)
        mu_parts.insert(0, mu_c)
        sd_parts.insert(0, sd_c)
        vbar_parts.insert(0, vbar_c)
        check_cancel()
        report(BACKWARD_PCNT_TIME * (i + 1) / total_back)
    coeffs = jnp.concatenate(coeffs_parts, axis=0)
    mus = jnp.concatenate(mu_parts, axis=0)
    sds = jnp.concatenate(sd_parts, axis=0)
    vbars = jnp.concatenate(vbar_parts, axis=0)
    _check_backward_health(coeffs, vbars, ctx.fwd)

    if val_first:
        v0, cont_mean0 = _current_period_step(
            v, dev, interp_kind, G, extra_decisions, dtype
        )
        backward_npv = jnp.mean(v0)
    else:
        cont_mean0 = jnp.zeros((G,), dtype)
        backward_npv = jnp.mean(v[:, 0])
    del v, reg, reg_fac, reg_last
    if stopwatches is not None:
        jax.block_until_ready(coeffs)
        stopwatches.stop("BackwardInduction")
        stopwatches.start("ForwardSimulation")

    val = val_sims() if callable(val_sims) else val_sims
    val_fac, val_last, _, val_spans = _factor_access(val, shard)

    dfd = dev.df_settle if discount_deltas else jnp.ones_like(dev.df_settle)

    fpal = _pallas_forward_eligible(
        ctx, extra_decisions, mesh, collect_panels, num_sims, dtype
    )
    # The forward path sizes its own spans from its OWN eligibility: with a
    # Pallas backward but an XLA forward (collect_panels, extra decisions,
    # cubic interp), reusing the backward's ~1e12 Pallas budget would let a
    # forward XLA scan exceed _MAX_SCAN_ELEMENTS and re-expose the silent
    # all-zero scan mis-lowering.
    budget_fwd = _MAX_SCAN_ELEMENTS_PALLAS if fpal is not None else _MAX_SCAN_ELEMENTS
    min_chunks_fwd = -(-m * per_step // budget_fwd)
    max_steps_fwd = max(1, budget_fwd // per_step)
    if fpal is not None:
        max_steps_fwd = min(max_steps_fwd, _FORWARD_PALLAS_MAX_SPAN)
    fwd_spans = _refine_spans(
        m, max_steps_fwd, max(num_progress_chunks, min_chunks_fwd), val_spans
    )
    total_fwd = max(1, len(fwd_spans))
    if fpal is not None:
        # Fused-kernel forward, chunked by progress span: the per-sim
        # inventory carry threads between kernel invocations, per-sim PV adds.
        from ..ops.pallas_forward import pack_scalars, pallas_forward_sim

        if val_first:
            inv0_s, pv0_s, outputs0 = _step0_single_sim(
                cont_mean0, dev, dfd[0],
                spec=spec, interp_kind=interp_kind, num_grid_points=G,
                extra_decisions=extra_decisions,
            )
        else:
            inv0_s = dev.inventory
            pv0_s = jnp.zeros((), dtype)
            outputs0 = None
        tables = jnp.concatenate([coeffs, vbars[:, None, :]], axis=1)  # [m, B+1, G]
        scalars = pack_scalars(
            dev.space_lo[first + 1 : n + 1], dev.space_hi[first + 1 : n + 1],
            dev.loss[first:n], dev.inject_cost[first:n], dev.withdraw_cost[first:n],
            dev.cons_inject[first:n], dev.cons_withdraw[first:n],
            dev.inv_cost_rate[first:n], dev.df_settle[first:n], dev.df_start[first:n],
            sim_drift[:m], sim_vols[:m],
        )
        inv_carry = jnp.broadcast_to(
            jnp.asarray(inv0_s, jnp.float32), (num_sims,)
        )
        pv_total = jnp.zeros((num_sims,), jnp.float32)
        sums_parts: List[jax.Array] = []
        xsum_parts: List[jax.Array] = []
        for i, (a, b) in enumerate(fwd_spans):
            sums_c, xsums_c, inv_carry, pv_c = pallas_forward_sim(
                val_fac(a, b), inv_carry, tables[a:b], mus[a:b], sds[a:b],
                dev.pillars[first + a : first + b], scalars[a:b],
                spec=spec, interp_kind=interp_kind, num_grid=G,
                block_sims=fpal[0], interpret=fpal[1], mesh=mesh,
            )
            pv_total = pv_total + pv_c
            sums_parts.append(sums_c)
            xsum_parts.append(xsums_c)
            check_cancel()
            report(BACKWARD_PCNT_TIME + (1.0 - BACKWARD_PCNT_TIME) * (i + 1) / total_fwd)
        stacked = _pallas_stacked_outputs(
            jnp.concatenate(sums_parts, axis=0), jnp.concatenate(xsum_parts, axis=0),
            tables, dev, dfd, first, n, num_sims, interp_kind, G,
            extra_decisions, dtype,
        )
        if val_first:
            outputs0 = jax.tree.map(lambda x: x[None], outputs0)
            stacked = jax.tree.map(
                lambda u, v_: jnp.concatenate([u, v_], axis=0), outputs0, stacked
            )
        carry = (inv_carry, pv_total + pv0_s)
        _check_forward_health(carry[1], carry[0], backward_npv)
        end_spots = spot_from_factors(val_last(), sim_vols[-1], sim_drift[-1])
        arrays = _assemble_arrays(
            stacked, carry, end_spots, terminal_fn, backward_npv, dtype,
            collect_panels=False,
        )
        if stopwatches is not None:
            if getattr(stopwatches, "sync", False):
                np.asarray(arrays.npv)
            else:
                jax.block_until_ready(arrays.npv)
            stopwatches.stop("ForwardSimulation")
        report(1.0)
        return arrays

    inv0 = jnp.full((num_sims,), dev.inventory, dtype)
    pv0 = jnp.zeros((num_sims,), dtype)
    carry = (inv0, pv0)
    out_parts = []

    if val_first:
        cont0 = dense_continuation(jnp.broadcast_to(cont_mean0[None, :], (num_sims, G)))
        spot0 = jnp.full((num_sims,), dev.fwd[0])
        carry, outputs0 = _forward_step_core(
            carry, spot0, cont0,
            dev.space_lo[1], dev.space_hi[1],
            dev.pillars[0], dev.loss[0],
            dev.inject_cost[0], dev.withdraw_cost[0],
            dev.cons_inject[0], dev.cons_withdraw[0],
            dev.inv_cost_rate[0], dev.df_settle[0], dev.df_start[0],
            dev.fwd[0], dfd[0],
            interp_kind=interp_kind, num_grid_points=G,
            extra_decisions=extra_decisions, collect_panels=collect_panels,
        )
        out_parts.append(jax.tree.map(lambda x: x[None], outputs0))

    for i, (a, b) in enumerate(fwd_spans):
        lo_k = first + a
        hi_k = first + b
        carry, outputs = forward_scan(
            carry,
            val_fac(a, b),
            sim_vols[a:b],
            sim_drift[a:b],
            coeffs[a:b],
            mus[a:b],
            sds[a:b],
            vbars[a:b],
            dev.space_lo[lo_k + 1 : hi_k + 1],
            dev.space_hi[lo_k + 1 : hi_k + 1],
            dev.pillars[lo_k:hi_k],
            dev.loss[lo_k:hi_k],
            dev.inject_cost[lo_k:hi_k],
            dev.withdraw_cost[lo_k:hi_k],
            dev.cons_inject[lo_k:hi_k],
            dev.cons_withdraw[lo_k:hi_k],
            dev.inv_cost_rate[lo_k:hi_k],
            dev.df_settle[lo_k:hi_k],
            dev.df_start[lo_k:hi_k],
            dev.fwd[lo_k:hi_k],
            dfd[lo_k:hi_k],
            collect_panels=collect_panels,
            quantize_queries=_xla_quantize_weights(),
            **static,
        )
        out_parts.append(outputs)
        check_cancel()
        report(BACKWARD_PCNT_TIME + (1.0 - BACKWARD_PCNT_TIME) * (i + 1) / total_fwd)

    stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *out_parts)
    _check_forward_health(carry[1], carry[0], backward_npv)
    end_spots = spot_from_factors(val_last(), sim_vols[-1], sim_drift[-1])
    arrays = _assemble_arrays(
        stacked, carry, end_spots, terminal_fn, backward_npv, dtype, collect_panels
    )
    if stopwatches is not None:
        if getattr(stopwatches, "sync", False):
            np.asarray(arrays.npv)
        else:
            jax.block_until_ready(arrays.npv)
        stopwatches.stop("ForwardSimulation")
    report(1.0)
    return arrays


def _current_period_step(v_next, dev, interp_kind, num_grid_points, extra_decisions, dtype):
    """Backward value at the deterministic current period (reference :171-181,
    :226-330 with simulatedPrices = forward price)."""
    G = num_grid_points
    cont_mean = jnp.mean(v_next, axis=0)  # [G]
    econ = step_economics(
        jnp.reshape(dev.inventory, (1,)),
        dev.pillars[0], interp_kind, dev.loss[0],
        dev.space_lo[1], dev.space_hi[1],
        dev.inject_cost[0], dev.withdraw_cost[0],
        dev.cons_inject[0], dev.cons_withdraw[0],
        dev.inv_cost_rate[0], dev.df_settle[0], dev.df_start[0],
        extra_decisions,
    )
    j, w = fractional_index(econ.inventory_after, dev.space_lo[1], dev.space_hi[1], G)
    fitted = jnp.take(cont_mean, j) * (1.0 - w) + jnp.take(cont_mean, j + 1) * w  # [1, D]
    immediate = econ.immediate_npv(dev.fwd[0])  # [1, D]
    total = immediate + fitted
    best = jnp.argmax(total[0])
    # Per-sim actual continuation at the chosen decision.
    j_b, w_b = j[0, best], w[0, best]
    actual = jnp.take(v_next, j_b, axis=1) * (1.0 - w_b) + jnp.take(
        v_next, j_b + 1, axis=1
    ) * w_b  # [S]
    v0 = immediate[0, best] + actual
    return v0, cont_mean


# --------------------------------------------------------------------------- #
# Policy capture / repricing                                                  #
# --------------------------------------------------------------------------- #


class LsmcPolicy(NamedTuple):
    """A fitted exercise policy: everything the forward pass needs.

    The reference retains regression coefficients from the backward pass and
    reuses them in the forward pass within one calculation
    (``LsmcStorageValuation.cs:156, 206, 350, 394``); SURVEY.md §5 flags
    exposing this as the checkpoint/resume analogue.  A policy can be saved
    (``save``) and repriced against fresh path sets without re-running the
    backward induction — e.g. intraday re-pricing or standalone scenario runs.
    """

    coeffs: jax.Array  # [m, B, G]
    mus: jax.Array  # [m, B]
    sds: jax.Array  # [m, B]
    vbars: jax.Array  # [m, G]
    cont_mean0: jax.Array  # [G]
    backward_npv: jax.Array  # scalar

    def save(self, path: str) -> None:
        np.savez(
            path,
            **{f: np.asarray(getattr(self, f)) for f in self._fields},
        )

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "LsmcPolicy":
        data = np.load(path)
        return cls(**{f: jnp.asarray(data[f], dtype) for f in cls._fields})


def fit_policy(
    ctx: ValuationContext,
    reg_factors: jax.Array,  # [m, F, S]
    sim_vols,
    sim_drift,
    spec: BasisSpec,
    extra_decisions: int = 0,
    dtype=jnp.float32,
) -> LsmcPolicy:
    """Run only the backward induction and capture the fitted policy."""
    dev = device_inputs(ctx, dtype)
    backward_npv, cont_mean0, coeffs, mus, sds, vbars = _backward_program_jit(
        jnp.asarray(reg_factors, dtype),
        jnp.asarray(sim_vols, dtype),
        jnp.asarray(sim_drift, dtype),
        dev,
        pallas=_pallas_backward_eligible(
            None, dtype, int(reg_factors.shape[-1]), ctx.num_grid_points
        ),
        spec=spec,
        interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points,
        extra_decisions=extra_decisions,
        val_first=ctx.val_date_is_first_step,
        terminal_fn=ctx.storage.terminal_npv_fn,
        quantize_weights=_xla_quantize_weights(),
    )
    return LsmcPolicy(coeffs, mus, sds, vbars, cont_mean0, backward_npv)


def reprice(
    ctx: ValuationContext,
    policy: LsmcPolicy,
    val_factors: jax.Array,  # [m, F, S]
    sim_vols,
    sim_drift,
    spec: BasisSpec,
    discount_deltas: bool = False,
    extra_decisions: int = 0,
    dtype=jnp.float32,
    collect_panels: bool = False,
) -> LsmcArrays:
    """Forward-simulate a previously fitted policy on a fresh path set."""
    dev = device_inputs(ctx, dtype)
    return _forward_program_jit(
        jnp.asarray(val_factors, dtype),
        jnp.asarray(sim_vols, dtype),
        jnp.asarray(sim_drift, dtype),
        policy.cont_mean0,
        policy.coeffs,
        policy.mus,
        policy.sds,
        policy.vbars,
        dev,
        policy.backward_npv,
        spec=spec,
        interp_kind=ctx.interp_kind,
        num_grid_points=ctx.num_grid_points,
        extra_decisions=extra_decisions,
        val_first=ctx.val_date_is_first_step,
        terminal_fn=ctx.storage.terminal_npv_fn,
        discount_deltas=discount_deltas,
        collect_panels=collect_panels,
    )


# --------------------------------------------------------------------------- #
# Fused-Pallas forward driver                                                 #
# --------------------------------------------------------------------------- #


def _backward_pad_target(num_sims: int, num_grid: int, block_sims: int) -> int:
    """Sims width the backward Pallas scan wants its inputs padded to.

    Mirrors :func:`backward_scan_pallas`'s single-device span computation
    (``block * min(sub_tiles, ceil(S/block))`` rounded up) so pre-padded
    inputs skip the scan's own in-program pad entirely.
    """
    sub = env_sub_tiles()
    if sub is None:
        sub = auto_sub_tiles(block_sims, num_grid)
    span = block_sims * min(sub, max(1, -(-num_sims // block_sims)))
    return -(-num_sims // span) * span


def _call_sim_factory(factory, pad_to: Optional[int]):
    """Invoke a simulation factory, forwarding ``pad_to`` only if it takes it.

    Accepts plain arrays (returned as-is), zero-arg factories (legacy), and
    ``pad_to``-aware factories.
    """
    if not callable(factory):
        return factory
    if pad_to is not None:
        import inspect

        try:
            if "pad_to" in inspect.signature(factory).parameters:
                return factory(pad_to=pad_to)
        except (TypeError, ValueError):
            pass
    return factory()


def _pick_pallas_block(num_sims: int, max_block: int = 1024) -> Optional[int]:
    """Lane-aligned block size (the kernel pads the sims axis as needed).

    Capped at the lane-rounded sim count for ALL sizes: jumping straight to a
    1024-lane block at >=512 sims carried 12-50% dead lanes through every
    kernel step in the 512-896 regime (where the parity/mesh suites live).
    """
    return min(max_block, max(128, -(-num_sims // 128) * 128))


@partial(
    jax.jit,
    static_argnames=("spec", "interp_kind", "num_grid_points", "extra_decisions"),
)
def _step0_single_sim(
    cont_mean0, dev: LsmcDeviceInputs, dfd0,
    spec: BasisSpec, interp_kind: int, num_grid_points: int, extra_decisions: int,
):
    """Deterministic current-period forward step on ONE representative sim.

    At the valuation date the price is the forward and the continuation is the
    sim-average, so every simulation takes the same decision — one sim
    suffices and its outputs are exact (reference :382-413).
    """
    carry = (jnp.reshape(dev.inventory, (1,)), jnp.zeros((1,), cont_mean0.dtype))
    cont0 = dense_continuation(cont_mean0[None, :])
    spot0 = jnp.reshape(dev.fwd[0], (1,))
    (inv1, pv1), outputs0 = _forward_step_core(
        carry, spot0, cont0,
        dev.space_lo[1], dev.space_hi[1],
        dev.pillars[0], dev.loss[0],
        dev.inject_cost[0], dev.withdraw_cost[0],
        dev.cons_inject[0], dev.cons_withdraw[0],
        dev.inv_cost_rate[0], dev.df_settle[0], dev.df_start[0],
        dev.fwd[0], dfd0,
        interp_kind=interp_kind, num_grid_points=num_grid_points,
        extra_decisions=extra_decisions, collect_panels=False,
    )
    return inv1[0], pv1[0], outputs0


def _pallas_stacked_outputs(
    sums, xsums, tables, dev, dfd, first, n, num_sims, interp_kind,
    num_grid_points, extra_decisions, dtype,
):
    """Per-step means, deltas and trigger arrays from the Pallas kernel's
    reduced partial sums — the stacked-outputs structure of forward_scan
    with ``collect_panels=False``."""
    G = num_grid_points
    means_rows = sums[:, :6] / num_sims  # PANEL_FIELDS order
    deltas_rows = sums[:, 6] / num_sims / dev.fwd[first:n] * dfd[first:n]

    # Trigger prices: sim-mean continuation per step from design-row sums.
    mean_xn1 = xsums / num_sims  # [m, B+1]
    mean_cont = jnp.einsum(
        "mb,mbg->mg", mean_xn1, tables, precision=jax.lax.Precision.HIGHEST
    )  # [m, G]
    expected_inv = sums[:, 0] / num_sims

    trig = jax.vmap(
        _trigger_calc,
        in_axes=(0, 0, 0, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
    )(
        mean_cont, expected_inv, dev.pillars[first:n], interp_kind,
        dev.loss[first:n], dev.space_lo[first + 1 : n + 1],
        dev.space_hi[first + 1 : n + 1], dev.inject_cost[first:n],
        dev.withdraw_cost[first:n], dev.cons_inject[first:n],
        dev.cons_withdraw[first:n], dev.inv_cost_rate[first:n],
        dev.df_settle[first:n], dev.df_start[first:n], G, extra_decisions,
    )

    rows_empty = jnp.zeros((n - first, 6, 0), dtype)
    return (means_rows, deltas_rows, rows_empty) + trig


@partial(
    jax.jit,
    static_argnames=("spec", "interp_kind", "num_grid_points", "extra_decisions",
                     "val_first", "terminal_fn", "discount_deltas", "block_sims",
                     "interpret", "mesh", "true_sims"),
)
def _forward_program_pallas(
    val_factors,  # [m_rows, F, S] simulated periods (incl. end row; S may be lane-padded)
    sim_vols,
    sim_drift,
    cont_mean0,
    coeffs,
    mus,
    sds,
    vbars,
    dev: LsmcDeviceInputs,
    backward_npv,
    spec: BasisSpec,
    interp_kind: int,
    num_grid_points: int,
    extra_decisions: int,
    val_first: bool,
    terminal_fn,
    discount_deltas: bool,
    block_sims: int,
    interpret: bool = False,
    mesh=None,
    true_sims: Optional[int] = None,
) -> LsmcArrays:
    """Forward pass via the fused Pallas kernel (collect_panels=False path)."""
    from ..ops.pallas_forward import pack_scalars, pallas_forward_sim

    G = num_grid_points
    num_sims = val_factors.shape[-1]  # incoming width (maybe lane-padded)
    S_true = num_sims if true_sims is None else true_sims
    dtype = val_factors.dtype
    n = val_factors.shape[0] - 1 + (1 if val_first else 0)
    first = 1 if val_first else 0
    m = val_factors.shape[0] - 1

    dfd = dev.df_settle if discount_deltas else jnp.ones_like(dev.df_settle)

    if val_first:
        inv0, pv0, outputs0 = _step0_single_sim(
            cont_mean0, dev, dfd[0],
            spec=spec, interp_kind=interp_kind, num_grid_points=G,
            extra_decisions=extra_decisions,
        )
    else:
        inv0 = dev.inventory
        pv0 = jnp.zeros((), dtype)
        outputs0 = None

    tables = jnp.concatenate([coeffs, vbars[:, None, :]], axis=1)  # [m, B+1, G]
    scalars = pack_scalars(
        dev.space_lo[first + 1 : n + 1], dev.space_hi[first + 1 : n + 1],
        dev.loss[first:n], dev.inject_cost[first:n], dev.withdraw_cost[first:n],
        dev.cons_inject[first:n], dev.cons_withdraw[first:n],
        dev.inv_cost_rate[first:n], dev.df_settle[first:n], dev.df_start[first:n],
        sim_drift[:m], sim_vols[:m],
    )
    # Pin kernel operands to the path dtype (weak-type promotion under
    # jax_enable_x64 would otherwise feed the f32 kernel f64 inputs).
    inv0, tables, mus, sds, scalars, pillars = (
        jnp.asarray(a, dtype)
        for a in (inv0, tables, mus, sds, scalars, dev.pillars[first:n])
    )
    # The kernel's scoped VMEM scales with span length (it keeps the whole
    # span horizon resident per sim block) — split past the measured bound.
    # Trace-time loop: still ONE XLA program, several pallas_call ops.
    inv_carry = jnp.broadcast_to(jnp.asarray(inv0, dtype), (num_sims,))
    pv_final = jnp.zeros((num_sims,), dtype)
    sums_parts, xsum_parts = [], []
    for a in range(0, m, _FORWARD_PALLAS_MAX_SPAN):
        b = min(a + _FORWARD_PALLAS_MAX_SPAN, m)
        if a == 0:
            src = val_factors
        else:
            # Sequencing guard (same as the backward span loop): tie each
            # span's factor slice-copy to the running inventory carry so XLA
            # cannot schedule every span's ~3 GB slice up front and hold them
            # all live at once.
            src, inv_carry = jax.lax.optimization_barrier(
                (val_factors, inv_carry)
            )
        sums_c, xsums_c, inv_carry, pv_c = pallas_forward_sim(
            src[a:b], inv_carry, tables[a:b], mus[a:b], sds[a:b],
            pillars[a:b], scalars[a:b],
            spec=spec, interp_kind=interp_kind, num_grid=G,
            block_sims=block_sims, interpret=interpret, mesh=mesh,
            true_sims=S_true if mesh is None else None,
        )
        pv_final = pv_final + pv_c
        sums_parts.append(sums_c)
        xsum_parts.append(xsums_c)
    sums = jnp.concatenate(sums_parts, axis=0) if len(sums_parts) > 1 else sums_parts[0]
    xsums = jnp.concatenate(xsum_parts, axis=0) if len(xsum_parts) > 1 else xsum_parts[0]
    # Per-sim outputs shed the padded lanes here; the reduced sums/xsums were
    # already masked to the true sims inside the kernel.
    inv_final = inv_carry[:S_true] if S_true != num_sims else inv_carry
    if S_true != num_sims:
        pv_final = pv_final[:S_true]

    stacked = _pallas_stacked_outputs(
        sums, xsums, tables, dev, dfd, first, n, S_true, interp_kind, G,
        extra_decisions, dtype,
    )
    if val_first:
        outputs0 = jax.tree.map(lambda x: x[None], outputs0)
        stacked = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), outputs0, stacked
        )

    pv_by_sim_base = pv_final + pv0
    carry = (inv_final, pv_by_sim_base)
    end_f = val_factors[-1][:, :S_true] if S_true != num_sims else val_factors[-1]
    end_spots = spot_from_factors(end_f, sim_vols[-1], sim_drift[-1])
    return _assemble_arrays(
        stacked, carry, end_spots, terminal_fn, backward_npv, dtype,
        collect_panels=False,
    )


def _xla_quantize_weights() -> bool:
    """Whether the engine's XLA backward fallback quantizes interpolation
    weights to 1/128 like the Pallas kernel.  Default False: when the fused
    kernel cannot run (CPU / f64 / kernels off) the reference-exact linear
    interpolation is strictly better.  Set ``STORAGE_TPU_QUANTIZE_WEIGHTS=1``
    to force quantization for engine-level XLA-vs-Pallas value-identity
    (parity tests, quantization-error studies)."""
    return bool(os.environ.get("STORAGE_TPU_QUANTIZE_WEIGHTS"))


def _pallas_mode(mesh=None) -> str:
    """Kernel execution mode: 'compiled' on TPU, 'interpret' when forced via
    ``STORAGE_TPU_PALLAS=interpret`` (CPU-mesh parity testing), else 'off'.

    The platform is taken from the MESH's devices when one is given — a CPU
    mesh in a process whose default backend is a TPU (e.g. the driver's
    virtual-device dryrun) must not compile TPU kernels.
    """
    force = os.environ.get("STORAGE_TPU_PALLAS", "").lower()
    if force in ("off", "0", "disable", "disabled"):
        return "off"
    if force == "interpret":
        return "interpret"
    if mesh is not None:
        platform = mesh.devices.flat[0].platform
    else:
        platform = jax.default_backend()
    return "compiled" if platform == "tpu" else "off"


def _local_sims(mesh, num_sims: int) -> Optional[int]:
    """Per-device sim count under a paths mesh (None if not evenly sharded)."""
    if mesh is None:
        return num_sims
    ndev = int(np.prod(list(mesh.shape.values())))
    if num_sims % ndev:
        return None
    return num_sims // ndev


def _pallas_backward_eligible(mesh, dtype, num_sims, num_grid):
    """Fused backward value update: any interp kind / decision width; f32
    only.  Under a paths mesh the kernel runs per shard via ``shard_map``
    (sims must divide evenly across the devices).

    Returns ``(block_sims, interpret)`` or None (XLA fallback).
    """
    mode = _pallas_mode(mesh)
    if mode == "off" or jnp.dtype(dtype) != jnp.float32:
        return None
    local = _local_sims(mesh, num_sims)
    if local is None:
        return None
    from ..ops.pallas_backward import pick_backward_block

    return pick_backward_block(local, num_grid), mode == "interpret"


def _pallas_forward_eligible(
    ctx, extra_decisions, mesh, collect_panels, num_sims, dtype=jnp.float32
):
    """Returns ``(block_sims, interpret)`` or None (XLA fallback)."""
    if collect_panels or extra_decisions:
        return None
    mode = _pallas_mode(mesh)
    if mode == "off" or jnp.dtype(dtype) != jnp.float32:
        return None
    from ..ops.ratchets import INTERP_LINEAR, INTERP_STEP

    if ctx.interp_kind not in (INTERP_LINEAR, INTERP_STEP):
        return None
    local = _local_sims(mesh, num_sims)
    if local is None:
        return None
    return _pick_pallas_block(local), mode == "interpret"
