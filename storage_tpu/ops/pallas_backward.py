"""Fused Pallas backward-induction value update.

One backward LSMC period (reference ``LsmcStorageValuation.cs:166-340``) does
two things: (a) regress next-period values on the current design matrix and
(b) update the value surface ``V[k] = max_d [immediate_d + interp_d(V[k+1])]``
with the argmax taken on the FITTED continuation (lower-bound estimator).

(a) is two skinny matmuls plus a tiny Cholesky — XLA already runs it at MXU
speed, and it reduces over ALL sims so it cannot live inside a sim-blocked
kernel anyway.  (b) is the hot part and runs here, one sim-block per grid
step, entirely in VMEM.

LAYOUT RULE (same as the forward kernel, load-bearing): per-sim quantities
are LANE vectors and the value surface is kept ``[G (sublane), bS (lane)]``
— the whole simulation axis lives on lanes, so the design row stacks on
sublanes ([B+1, bS]), scalar-per-grid terms broadcast as ``[G, 1]`` columns
and nothing ever converts between the lane and sublane axes.  The original
``[bS, G]`` orientation spent ~10 us/block on layout glue (the 11-column
design stack and per-decision broadcasts), dwarfing both the MXU work and
the HBM traffic.  Consequence: the value surface is carried TRANSPOSED
(``[G, S_pad]`` with sims lane-padded to the block multiple) across the
whole backward scan; :func:`storage_tpu.engines.lsmc.backward_scan_pallas`
transposes once at entry/exit.

The fitted continuation never pays a ``[G, G]`` product: the interpolation
is associativity-folded into the coefficient table
(``interp_d(Xn' C') == (M_d @ C') Xn1``) and the immediate economics fold
into the SAME skinny dot through trailing ones/spot rows of the design, so
``immediate + fitted`` is one ``[G, B+2] x [B+2, bS]`` MXU product per
decision.  Only the ACTUAL surface pays the big ``[G, G] x [G, bS]``
product — a 6-pass HIGHEST f32 dot on the vbar-centred surface (no VPU-side
split/add chains; both engine precision modes share this path).

It also emits per-block row sums of the new surface, so the scan body can
carry the sim-mean ``vbar`` (used to centre the next regression target —
f32 accumulation of uncentred 1e5-magnitude values loses enough mantissa at
1e6 paths to degrade the fitted policy) without re-reading ``V`` from HBM.

Works for every ratchet interp kind and any ``extra_decisions`` width: the
per-grid decision economics enter through the augmented tables (computed by
``engines/common.py::step_economics`` on XLA, they are ``[G, D]`` — tiny).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .regression import BasisSpec
from .pallas_forward import _design_row

_DN = (((1,), (0,)), ((), ()))


def fit_split3() -> bool:
    """Whether the decision-concat fitted product runs as the K-concatenated
    3-term bf16 split instead of a HIGHEST-precision f32 matmul.

    Mosaic has no ``Precision.HIGH``, so the classic 3-pass bf16 scheme
    (``F@X ~= F_hi@X_hi + F_lo@X_hi + F_hi@X_lo``, ~2^-16 relative) is built
    by hand — and because the contraction is only ``B+2 ~= 12`` deep, all
    three terms CONCATENATE along K into ONE ``[D*G, 3(B+2)] x [3(B+2), bS]``
    DEFAULT-precision pass (K = 36 <= 128, so the MXU pads it to a single
    tile either way): the arithmetic of three passes for the latency of one,
    vs HIGHEST's six.  The fitted totals only pick the argmax decision
    (realised values come from the actual-surface passes, so the estimator
    stays a lower bound), which is why ~2^-16 there is safe.  Chip
    measurement (Aug 19, 1M x 341, G=100): BackwardInduction 1.497 ->
    0.820-0.827 s with NPV 78374.81 -> 78375.07 (+3.5e-6 relative — MC/f32
    noise scale), so split3 is the PRODUCTION DEFAULT;
    ``STORAGE_TPU_FIT_PRECISION=highest`` reverts to the f32 product."""
    import os

    return os.environ.get(
        "STORAGE_TPU_FIT_PRECISION", "split3"
    ).lower() in ("split3", "high")


def reg_split3() -> bool:
    """Whether the kernel's regression partials (graw/praw) run as manual
    3-term bf16 splits (3 MXU passes each) instead of HIGHEST f32 (6).

    These contract over the LANE axis (K = bS), so there is no free
    K-concatenation like :func:`fit_split3` — it is 3 genuine passes vs 6.
    Unlike the fitted/forward products this perturbs the REGRESSION
    (~2^-16 relative on Gram/RHS sums of approx-standardized O(1) entries),
    i.e. the continuation coefficients themselves — still policy-only for
    the NPV (realised values ride the actual surface) but it also moves
    trigger prices and deltas.  Chip measurement (Aug 19, 1M x 341): saves
    only ~65 ms of BackwardInduction (0.82 -> 0.76 s) while the NPV DROPS
    78375.1 -> 78316.3 (-7.5e-4 relative — a genuine policy degradation,
    visible exactly because the estimator is a lower bound), two orders
    noisier than the fit split's +3.5e-6.  REJECTED as a default; kept as
    an opt-in knob (``STORAGE_TPU_REG_PRECISION=split3``) so the trade can
    be re-measured on future hardware."""
    import os

    return os.environ.get(
        "STORAGE_TPU_REG_PRECISION", "highest"
    ).lower() in ("split3", "high")


def _mm(a, b, precision=None):
    return jax.lax.dot_general(
        a, b, dimension_numbers=_DN, preferred_element_type=jnp.float32,
        precision=precision,
    )


def _backward_kernel(
    factors_ref,  # [F, bS] (sims on the LANE axis, like every other ref)
    fprev_ref,  # [F, bS] PREVIOUS period's factors (for the next regression)
    v_ref,  # [G, bS] next-period values (transposed surface)
    fit_ref,  # [D*G, B+2] f32 | [D*G, 3(B+2)] bf16 split fitted tables
    vbar_ref,  # [G, 1] sim-mean of the next-period surface
    musd_ref,  # [2, B] standardization mean / scale
    act1_ref,  # [D*G, G+4] bf16 actual-pass hi matrices (fold) | [D*G, G] m16
    act2_ref,  # [D*G, G+4] bf16 actual-pass lo matrices (fold) | [D*G, 2] f32 affine cols
    scal_ref,  # [2, 1+F] drift, vol loadings for this and the previous period
    v_out_ref,  # out [G, bS] this-period values
    graw_ref,  # out [1, B+1, B+1] raw Gram partials of the PREVIOUS design
    praw_ref,  # out [1, B+1, G] raw cross partials X_prev' (V_out - vbar)
    *,
    spec: BasisSpec,
    num_grid: int,
    num_factors: int,
    num_decisions: int,
    true_sims: int,
    fold_affine: bool = False,
    sub_tiles: int = 1,
):
    span = v_ref.shape[-1]
    if span % sub_tiles:
        raise ValueError("VMEM block width must divide into sub_tiles")
    bS = span // sub_tiles  # compute-tile lane width (every vector op's width)

    # All per-decision matrices arrive CONCATENATED on the query-grid axis
    # ([D*G, .]) and pre-cast/split by the XLA-side glue in
    # ``backward_scan_pallas.kernel_step`` (once per SCAN STEP, not once per
    # block — the kernel runs hundreds of blocks per step at 1M paths), so
    # the tile pays ONE fitted product and ONE actual hi/lo pass pair per
    # step instead of per decision: each output row still depends on exactly
    # one decision's matrix rows, so results are element-identical while the
    # per-pass MXU dispatch overhead is paid D times less often.  The bf16
    # casts are EXACT (the interp weights are 1/128-quantized upstream; the
    # affine columns ship as explicit hi/lo splits), and shipping bf16 also
    # halves the per-block DMA of the largest [D*G, G] operand.
    dec_fit = fit_ref[...]
    if fold_affine:
        dec_act = (act1_ref[...], act2_ref[...])
    else:
        dec_act = (act1_ref[...], act2_ref[:, 0:1], act2_ref[:, 1:2])

    # With sub_tiles > 1 the VMEM block spans several compute tiles and the
    # per-tile body below runs (unrolled) once per tile: every vector op stays
    # at the measured-safe <=1024-lane width while the per-grid-step fixed
    # overhead (DMA descriptor setup for the 11 operands, semaphores, scalar
    # prologue — the ~2.2 us/block floor, ROUND2_NOTES "Known gaps") is paid
    # once per SPAN.  The regression partials accumulate across tiles in
    # registers and are written once.
    graw_acc = None
    praw_acc = None
    for s in range(sub_tiles):
        sl = slice(s * bS, (s + 1) * bS)
        g_sl, p_sl = _backward_tile(
            factors_ref, fprev_ref, v_ref, vbar_ref, musd_ref,
            scal_ref, v_out_ref, dec_fit, dec_act, sl=sl, bS=bS,
            lane_offset=pl.program_id(0) * span + s * bS,
            spec=spec, num_factors=num_factors, num_decisions=num_decisions,
            true_sims=true_sims, fold_affine=fold_affine,
        )
        graw_acc = g_sl if graw_acc is None else graw_acc + g_sl
        praw_acc = p_sl if praw_acc is None else praw_acc + p_sl
    graw_ref[0, :, :] = graw_acc
    praw_ref[0, :, :] = praw_acc


def _backward_tile(
    factors_ref, fprev_ref, v_ref, vbar_ref, musd_ref,
    scal_ref, v_out_ref, dec_fit, dec_act, *, sl, bS, lane_offset, spec,
    num_factors, num_decisions, true_sims, fold_affine,
):
    """One compute tile of the backward update (lane slice ``sl`` of the VMEM
    block); writes the tile's new values and returns its regression partials.
    ``dec_fit``/``dec_act`` are the decision-CONCATENATED fitted tables and
    prepared actual-pass matrices (tile-invariant, built once in the
    caller); the per-decision results are static [G, bS] row slices of the
    single wide products."""
    B = spec.num_basis
    G = dec_fit.shape[0] // num_decisions
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bS), 1)
    valid_f = ((lane + lane_offset) < true_sims).astype(jnp.float32)

    def spot_of(fac_ref, row):
        rows = [fac_ref[i : i + 1, sl] for i in range(num_factors)]  # [1, bS]
        log_spot = scal_ref[row, 0]
        for i in range(num_factors):
            log_spot = log_spot + scal_ref[row, 1 + i] * rows[i]
        return jnp.exp(log_spot), rows  # [1, bS]

    spot, f_rows = spot_of(factors_ref, 0)

    # Standardized design row with trailing ones AND spot rows, stacked on
    # the SUBLANE axis ([B+2, bS]) — each [1, bS] lane vector lands on its
    # own sublane, no relayout (forward-kernel pattern).  The extra rows let
    # the decision tables fold the immediate-economics affine terms straight
    # into the fitted matmul (see the cwa layout in backward_scan_pallas).
    cols = _design_row(spec, spot, f_rows)
    xn1 = jnp.concatenate(
        [(cols[b] - musd_ref[0, b]) / musd_ref[1, b] for b in range(B)]
        + [jnp.ones((1, bS), jnp.float32), spot],
        axis=0,
    )  # [B+2, bS]

    # The [G, G] x [G, bS] actual-surface product: a single bf16 pass would
    # quantize 1e5-magnitude continuation values by ~0.4%, so the surface is
    # vbar-CENTRED (magnitudes drop to the sim spread) and split once into
    # bf16 halves; the interp weights are 1/128-quantized upstream so the
    # bf16 cast of M_d is EXACT and two passes (M @ v_hi + M @ v_lo) carry
    # the full ~16-bit effective precision — half the passes of the classic
    # bf16x3 split and a third of HIGHEST (which was measured slower at
    # equal accuracy and rejected; see ROUND2_NOTES.md).
    v_c = v_ref[:, sl] - vbar_ref[...]  # [G, bS]
    v_hi = v_c.astype(jnp.bfloat16)
    v_lo = (v_c - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    if fold_affine:
        # VERDICT r4 item 2 — the CLEAN affine-fold variant: ride the
        # per-decision immediate economics through the two EXISTING bf16
        # actual-surface passes, SOURCING the affine from the exact-f32 cwa
        # columns and splitting them to bf16 hi/lo (the round-3 rejection,
        # ebb6549, shipped pre-split bf16 tables; the bisection found only
        # the table-sourced values biased while the exact-f32 cwa-sourced
        # affine measured clean — ROUND3_NOTES "Rejected: affine-fold").
        # RHS gains three bf16-exact rows (ones, spot hi/lo) shared by both
        # passes; each decision's matrix gains three columns (colB hi|lo,
        # colB1 hi|lo paired against both spot rows — split in the caller,
        # tile-invariant), so
        #   pass_hi + pass_lo = q_d + colB + colB1 * spot
        # Removes 3 VPU broadcast ops x [G, bS] per decision from the serial
        # path for ~4% more MXU work.
        ones_b = jnp.ones((1, bS), jnp.bfloat16)
        s_hi16 = spot.astype(jnp.bfloat16)
        s_lo16 = (spot - s_hi16.astype(jnp.float32)).astype(jnp.bfloat16)
        rhs_hi = jnp.concatenate([v_hi, ones_b, ones_b, s_hi16, s_lo16], axis=0)
        rhs_lo = jnp.concatenate([v_lo, ones_b, ones_b, s_hi16, s_lo16], axis=0)

    # Fitted totals straight off the MXU, ALL decisions in one wide product:
    # columns 0..B-1 of cwa are M_d @ coeffs', column B (ones row) carries
    # M_d@vbar - cost_npv and column B+1 (spot row) carries price_coeff, so
    # row block d of this product IS immediate + fitted continuation for
    # decision d.  When the caller shipped the K-concatenated bf16 split
    # (``dec_fit`` width 3(B+2) — see fit_split3/prepare_decision_matrices),
    # the matching RHS blocks [xn1_hi; xn1_hi; xn1_lo] make ONE
    # DEFAULT-precision pass equal the 3-term bf16 product; otherwise the
    # f32 operands run at HIGHEST.
    if dec_fit.shape[1] == 3 * (B + 2):
        xn1_hi = xn1.astype(jnp.bfloat16)
        xn1_lo = (xn1 - xn1_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xn1_cat = jnp.concatenate([xn1_hi, xn1_hi, xn1_lo], axis=0)
        total_all = _mm(dec_fit, xn1_cat)  # [D*G, bS]
    else:
        total_all = _mm(dec_fit, xn1, jax.lax.Precision.HIGHEST)  # [D*G, bS]
    # Realised values of the same decisions: centred actual continuation
    # plus the same affine pieces — column B is (M_d@vbar - cost_npv),
    # which is exactly the act-side offset too since q_d is centred.
    if fold_affine:
        m_hi, m_lo = dec_act
        act_all = _mm(m_hi, rhs_hi) + _mm(m_lo, rhs_lo)  # [D*G, bS]
    else:
        m16, colB, colB1 = dec_act
        act_all = _mm(m16, v_hi) + _mm(m16, v_lo) + colB + colB1 * spot

    best_fitted = None
    best_actual = None
    for d in range(num_decisions):
        total = total_all[d * G : (d + 1) * G, :]
        actual = act_all[d * G : (d + 1) * G, :]
        if best_fitted is None:  # decision 0 seeds unconditionally (NaN guard)
            best_fitted = total
            best_actual = actual
        else:
            better = total > best_fitted  # first-occurrence argmax
            best_fitted = jnp.where(better, total, best_fitted)
            best_actual = jnp.where(better, actual, best_actual)

    v_out_ref[:, sl] = best_actual

    # Regression partials for the NEXT scan step, computed while the
    # just-written surface is still in VMEM: the previous period's design
    # rows (ones row appended, padded lanes masked to zero) contracted
    # against themselves and against the centred new surface.  The rows are
    # standardized with THIS period's (mu, sd) as an approximate centring —
    # consecutive periods' design statistics differ by ~0.1 sd, so every
    # accumulated entry stays at sd scale and f32 block sums lose nothing to
    # cancellation.  The caller re-standardizes to the previous period's own
    # exact statistics with closed-form affine algebra (the ones row carries
    # the column sums) — see ``assemble_regression``.
    spot_prev, fprev_rows = spot_of(fprev_ref, 1)
    cols_prev = _design_row(spec, spot_prev, fprev_rows)
    xr = jnp.concatenate(
        [(cols_prev[b] - musd_ref[0, b]) / musd_ref[1, b] for b in range(B)]
        + [jnp.ones((1, bS), jnp.float32)],
        axis=0,
    ) * valid_f  # [B+1, bS] approx-standardized, masked
    # The ones row of praw doubles as the (centred) row sums of the new
    # surface, so no separate row-sum output is emitted: the caller recovers
    # the new sim-mean as vbar_next + praw[B] / S.
    v_out_c = best_actual - vbar_ref[...]
    lanes_dn = (((1,), (1,)), ((), ()))
    if reg_split3():
        xr_hi = xr.astype(jnp.bfloat16)
        xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        vo_hi = v_out_c.astype(jnp.bfloat16)
        vo_lo = (v_out_c - vo_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def _lmm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=lanes_dn,
                preferred_element_type=jnp.float32,
            )

        graw = _lmm(xr_hi, xr_hi) + _lmm(xr_lo, xr_hi) + _lmm(xr_hi, xr_lo)
        praw = _lmm(xr_hi, vo_hi) + _lmm(xr_lo, vo_hi) + _lmm(xr_hi, vo_lo)
    else:
        graw = jax.lax.dot_general(
            xr, xr, dimension_numbers=lanes_dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        praw = jax.lax.dot_general(
            xr, v_out_c, dimension_numbers=lanes_dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return graw, praw


def _backward_update_local(
    factors_t,  # [F, S_local] (lane-padded)
    fprev_t,  # [F, S_local] previous period's factors
    v_next_t,  # [G, S_local] (lane-padded)
    fit,  # [D*G, B+2] f32 decision-concat fitted tables
    vbar,  # [G, 1]
    musd,  # [2, B]
    act1,  # [D*G, G+4] bf16 (fold) | [D*G, G] bf16 (broadcast)
    act2,  # [D*G, G+4] bf16 (fold) | [D*G, 2] f32 (broadcast)
    scal,  # [2, 1+F]
    spec: BasisSpec,
    num_grid: int,
    block_sims: int,
    true_sims: int,
    interpret: bool,
    fold_affine: bool = False,
    sub_tiles: int = 1,
):
    """Device-local kernel invocation on the TRANSPOSED surface.

    Inputs may be lane-padded to a multiple of the VMEM block span already
    (the single-device scan pre-pads ONCE for the whole scan) or unpadded
    (the per-shard body under a mesh — local shards pad here, a tiny per-step
    copy); ``true_sims`` is the real (unpadded) count for masking.
    ``sub_tiles`` widens the VMEM block to ``block_sims * sub_tiles`` lanes
    while keeping every compute op at ``block_sims`` width (see
    :func:`_backward_kernel`); it is clamped so small path counts never pay
    extra dead lanes.  Returns ``(v_this_t [G, S_in], graw [B+1, B+1] f32,
    praw [B+1, G] f32)`` — the new surface (at the input's lane count) and
    the raw regression partials for the previous period (sums, not means:
    under a paths mesh the caller psums the per-shard sums before dividing
    by the global sim count).
    """
    if block_sims % 128:
        raise ValueError("block_sims must be a multiple of 128 (TPU lanes).")
    S_in = v_next_t.shape[-1]
    sub_tiles = max(1, min(sub_tiles, -(-S_in // block_sims)))
    span = block_sims * sub_tiles
    S_pad = -(-S_in // span) * span
    if S_pad != S_in:
        factors_t = jnp.pad(factors_t, ((0, 0), (0, S_pad - S_in)))
        fprev_t = jnp.pad(fprev_t, ((0, 0), (0, S_pad - S_in)))
        v_next_t = jnp.pad(v_next_t, ((0, 0), (0, S_pad - S_in)))
    num_blocks = S_pad // span
    B = spec.num_basis
    D = fit.shape[0] // num_grid
    num_factors = factors_t.shape[0]
    a1_cols = act1.shape[-1]
    a2_cols = act2.shape[-1]

    kernel = functools.partial(
        _backward_kernel,
        spec=spec,
        num_grid=num_grid,
        num_factors=num_factors,
        num_decisions=D,
        true_sims=true_sims,
        fold_affine=fold_affine,
        sub_tiles=sub_tiles,
    )
    v_this, graws, praws = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((num_factors, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_factors, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_grid, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * num_grid, fit.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_grid, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D * num_grid, a1_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * num_grid, a2_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1 + num_factors), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_grid, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B + 1, B + 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B + 1, num_grid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_grid, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, B + 1, B + 1), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, B + 1, num_grid), jnp.float32),
        ],
        # The new surface overwrites the old in place: block i's input is
        # fully VMEM-resident before block i's output DMA starts, and the
        # block index maps are identical, so aliasing is safe — without it
        # XLA copies the 100s-of-MB carry once per scan step.
        input_output_aliases={2: 0},
        interpret=interpret,
    )(factors_t, fprev_t, v_next_t, fit, vbar, musd, act1, act2, scal)

    if S_pad != S_in:
        v_this = v_this[:, :S_in]
    # Cross-block f32 sums are safe: the kernel's approximate standardization
    # keeps every partial at sd scale (no raw s**4-magnitude moments).
    graw = jnp.sum(graws, axis=0)
    praw = jnp.sum(praws, axis=0)
    return v_this, graw, praw


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "num_grid", "block_sims", "true_sims", "interpret",
        "mesh", "axis_name", "fold_affine", "sub_tiles",
    ),
)
def pallas_backward_update(
    factors_t,  # [F, S_pad] lane-padded
    fprev_t,  # [F, S_pad] previous period's factors
    v_next_t,  # [G, S_pad] lane-padded transposed surface
    fit,  # [D*G, B+2] f32 | [D*G, 3(B+2)] bf16 fitted tables (prepare_decision_matrices)
    vbar,  # [G, 1]
    musd,  # [2, B]
    act1,  # [D*G, G+4] bf16 (fold) | [D*G, G] bf16 (broadcast)
    act2,  # [D*G, G+4] bf16 (fold) | [D*G, 2] f32 (broadcast)
    scal,  # [2, 1+F]
    spec: BasisSpec,
    num_grid: int,
    block_sims: int,
    true_sims: int,
    interpret: bool = False,
    mesh=None,
    axis_name: Optional[str] = None,
    fold_affine: bool = False,
    sub_tiles: int = 1,
):
    """One fused backward value update on the transposed surface.

    Returns ``(v_this_t [G, S_pad], vbar_this [G], graw [B+1, B+1],
    praw [B+1, G])`` — the new surface, its sim-mean (from masked per-block
    partial sums over the TRUE sims), and the previous-period regression
    partials (global sums; see :func:`assemble_regression`).

    With ``mesh`` (a 1-D paths mesh) the kernel runs per device shard under
    ``shard_map``: each device updates its local slice of the value surface
    in VMEM and every reduction becomes a cross-shard ``psum`` over ICI —
    ``block_sims`` then sizes blocks of the LOCAL shard and ``true_sims`` is
    the per-shard unpadded count.
    """
    local = functools.partial(
        _backward_update_local,
        spec=spec, num_grid=num_grid, block_sims=block_sims,
        true_sims=true_sims, interpret=interpret, fold_affine=fold_affine,
        sub_tiles=sub_tiles,
    )
    if mesh is None:
        v_this, graw, praw = local(
            factors_t, fprev_t, v_next_t, fit, vbar, musd, act1, act2, scal
        )
        # New sim-mean from praw's ones row (centred row sums): vbar + d.
        return v_this, vbar[:, 0] + praw[-1, :] / true_sims, graw, praw

    from jax.sharding import PartitionSpec as P

    axis_name = axis_name or mesh.axis_names[0]
    ndev = mesh.devices.size

    def body(f, fp, v, ft, vb, ms, a1, a2, sc):
        v_out, graw, praw = local(f, fp, v, ft, vb, ms, a1, a2, sc)
        return (
            v_out,
            jax.lax.psum(graw, axis_name),
            jax.lax.psum(praw, axis_name),
        )

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, axis_name), P(None, axis_name), P(None, axis_name),
            P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(None, axis_name), P(), P()),
        check_vma=False,
    )
    v_this, graw, praw = sharded(
        factors_t, fprev_t, v_next_t, fit, vbar, musd, act1, act2, scal
    )
    return v_this, vbar[:, 0] + praw[-1, :] / (true_sims * ndev), graw, praw


def prepare_decision_matrices(cwa_t, wdt, num_basis: int, fold_affine: bool):
    """Build the kernel's decision-concatenated operands on the XLA side.

    Runs ONCE per scan step (between kernel dispatches) instead of once per
    simulation block inside the kernel — at 1M paths that is ~250x less
    often — and ships the largest operand as bf16, halving its per-block DMA.
    All casts are exact: the interp weights in ``wdt`` are 1/128-quantized
    upstream, and the two affine cwa columns ship as explicit bf16 hi/lo
    splits (colB — value-surface scale ~1e5 — 3-term via a doubled ones row;
    colB1 — price_coeff — 2-term against the kernel's exact spot hi/lo rows).

    Returns ``(fit [D*G, B+2] f32, act1, act2)`` where for ``fold_affine``
    ``act1``/``act2`` are the [D*G, G+4] bf16 hi/lo actual-pass matrices and
    otherwise ``act1`` is the [D*G, G] bf16 interp matrix and ``act2`` the
    [D*G, 2] f32 (colB, colB1) affine columns.
    """
    B = num_basis
    D, G = cwa_t.shape[0], cwa_t.shape[1]
    fit = cwa_t.reshape(D * G, B + 2)
    if fit_split3():
        # K-concatenated 3-term bf16 split of the fitted tables (see
        # fit_split3): blocks [F_hi | F_lo | F_hi] pair against the kernel's
        # RHS blocks [X_hi; X_hi; X_lo].  The hi part MUST round via
        # lax.reduce_precision — a plain cast round-trip is elidable under
        # --xla_allow_excess_precision (the measured 22% NPV corruption
        # mode, see the act-matrix splits below).
        f_hi_f = jax.lax.reduce_precision(fit, 8, 7)
        f_hi = f_hi_f.astype(jnp.bfloat16)
        f_lo = (fit - f_hi_f).astype(jnp.bfloat16)
        fit = jnp.concatenate([f_hi, f_lo, f_hi], axis=1)  # [D*G, 3(B+2)]
    m16 = wdt.astype(jnp.bfloat16).reshape(D * G, G)
    if not fold_affine:
        cols = jnp.stack(
            [cwa_t[:, :, B].reshape(D * G), cwa_t[:, :, B + 1].reshape(D * G)],
            axis=1,
        )
        return fit, m16, cols
    colB = cwa_t[:, :, B].reshape(D * G, 1)
    colB1 = cwa_t[:, :, B + 1].reshape(D * G, 1)
    # The hi/lo splits MUST round through bf16 in f32 arithmetic.  On the XLA
    # side a plain ``x - f32(bf16(x))`` is NOT safe: TPU builds run with
    # --xla_allow_excess_precision, which licenses XLA to elide the
    # bf16->f32 rounding round-trip, collapsing the residual to zero and
    # silently degrading the affine columns to ONE bf16 pass (~0.4% on the
    # 1e5-magnitude colB — measured as a 22% NPV corruption on chip).
    # ``lax.reduce_precision`` is the non-elidable rounding primitive; the
    # final bf16 casts of already-rounded values are then exact.
    def split3(x):
        hi = jax.lax.reduce_precision(x, 8, 7)
        r1 = x - hi
        md = jax.lax.reduce_precision(r1, 8, 7)
        lo = r1 - md
        return (hi.astype(jnp.bfloat16), md.astype(jnp.bfloat16),
                lo.astype(jnp.bfloat16))

    cb_hi, cb_md, cb_lo = split3(colB)
    c1_hi_f = jax.lax.reduce_precision(colB1, 8, 7)  # 2-term split suffices
    c1_hi = c1_hi_f.astype(jnp.bfloat16)
    c1_lo = (colB1 - c1_hi_f).astype(jnp.bfloat16)
    act1 = jnp.concatenate([m16, cb_hi, cb_md, c1_hi, c1_hi], axis=1)
    act2 = jnp.concatenate([m16, cb_lo, jnp.zeros_like(cb_lo), c1_lo, c1_lo],
                           axis=1)
    return fit, act1, act2


def assemble_regression(graw, praw, musd_approx, delta, num_sims,
                        ridge: float = 1e-6, eps: float = 1e-12):
    """Exact regression solve from the kernel's approximate-standardized
    partials.

    The kernel emitted, for the previous period's design matrix X (columns b)
    approx-standardized as ``z_b = (x_b - m_b) / s_b`` with a trailing ones
    row (index B):

      ``graw = [Z; 1] [Z; 1]'``  and  ``praw = [Z; 1] (V - c)'``

    where ``c`` is the next-period sim-mean used for in-kernel centring and
    ``delta = vbar_new - c`` re-centres the target onto the new surface's own
    mean.  Because every properly-standardized column ``Xs_b = (x_b -
    mu_b)/sd_b`` is AFFINE in ``z_b`` (``Xs_b = alpha_b z_b + beta_b``), the
    exact standardized Gram/RHS — including the reference's constant-column
    pass-through (``storage_tpu.ops.regression.standardize_columns``) —
    assemble in closed form from these sums.  Mirrors
    :func:`storage_tpu.ops.regression.fit_continuation` (ridge scaling, f32
    Cholesky, NaN fallback to the zero/centred fit).

    Returns ``(coeffs [B, G], mu [B], sd [B])``.
    """
    B = graw.shape[0] - 1
    S = num_sims
    m_a, s_a = musd_approx[0], musd_approx[1]

    zbar = graw[B, :B] / S
    ez2 = jnp.diagonal(graw)[:B] / S
    var_z = jnp.maximum(ez2 - zbar * zbar, 0.0)
    mu = m_a + s_a * zbar
    sd = s_a * jnp.sqrt(var_z)
    # Constant-column detection must tolerate the f32 cancellation floor of
    # E[z^2] - zbar^2.  For a CONSTANT z (a column constant in the previous
    # period — e.g. a factor whose vol loading is zero over the early steps —
    # standardized with the CURRENT period's stats, so z is a non-zero
    # constant) the floor is set by f32 summation error, which grows with
    # the accumulation structure: ~(block_lanes + num_blocks)/2 * eps32
    # relative, measured 2.9e-5 at 4096 sims and bounded by ~2.4e-4 at 1M
    # sims (worst block split).  1e-3 covers every practical path count with
    # >= 4x headroom; a missed detection is far worse than a false positive
    # (the constant column gets sd ~ its own noise floor and is amplified
    # 100-5000x into the Gram, corrupting that period's coefficients, while
    # a false positive merely passes a <= 3%-relative-sd column through raw
    # like ``standardize_columns`` does with its exact-data eps).
    is_const = var_z <= jnp.maximum(1e-3 * ez2, eps)
    mu = jnp.where(is_const, 0.0, mu)
    sd = jnp.where(is_const, 1.0, sd)

    # Xs_b = alpha_b z_b + beta_b with the final (mu, sd).
    alpha = s_a / sd
    beta = (m_a - mu) / sd
    g = graw[:B, :B]
    gz1 = graw[:B, B]  # sum of z_b
    gram = (
        alpha[:, None] * alpha[None, :] * g
        + alpha[:, None] * beta[None, :] * gz1[:, None]
        + beta[:, None] * alpha[None, :] * gz1[None, :]
        + S * beta[:, None] * beta[None, :]
    )
    # Xs' (V - vbar_new): re-centre the target by delta via the column sums.
    xs_colsum = alpha * gz1 + S * beta  # [B]
    rhs = (
        alpha[:, None] * praw[:B, :]
        + beta[:, None] * praw[B, :][None, :]
        - xs_colsum[:, None] * delta[None, :]
    )
    gram = gram + (ridge * S) * jnp.eye(B, dtype=gram.dtype)
    cho = jax.scipy.linalg.cho_factor(gram)
    coeffs = jax.scipy.linalg.cho_solve(cho, rhs)
    return jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), mu, sd


def pick_backward_block(num_sims: int, num_grid: int) -> int:
    """Lane-block width for the transposed kernel.

    The sim axis lives on lanes, so blocks must be 128-multiples; the padded
    surface carries ``ceil(S / block) * block`` lanes for the whole scan
    (padded once at scan entry, never per step).  ~1024 lanes keeps the
    double-buffered [G, bS] value tiles plus the decision temporaries inside
    the 16 MB scoped-VMEM limit at G ~ 100 (measured: 2048 overflows).
    """
    target = min(1024, max(128, (1 << 17) // max(1, num_grid)))
    # Never exceed the lane-rounded sim count: a 1024-lane block at e.g.
    # 512 sims would carry 50% dead lanes through every step of the scan
    # (the regime all parity/mesh tests run in — VERDICT r3 item 7).
    target = min(target, -(-num_sims // 128) * 128)
    return max(128, (target // 128) * 128)
