"""Fused Pallas forward-simulation kernel.

The LSMC forward pass is the hot loop after all XLA-level optimisation: per
period it builds a design row, evaluates the fitted continuation at three
per-sim query points, picks the bang-bang argmax and advances per-sim
inventory (reference ``LsmcStorageValuation.cs:374-490``).  Under XLA this
costs ~46 ms/step at 500k paths — dominated by small-table gathers and
intermediate HBM round-trips, not bandwidth.

This kernel runs the ENTIRE horizon for a block of simulations inside VMEM:

- grid over simulation blocks; each block DMAs its ``[n, F, bS]`` factor
  paths once and loops the n periods with ``fori_loop``;
- the continuation surface for the block is one MXU matmul
  ``Xn1 [bS, B+1] x table_k [B+1, G]`` per period, kept in VMEM;
- per-decision interpolation is an iota-mask weighted row-sum (no gathers);
- outputs are per-(block, period) partial sums (inventory, volumes, pv,
  delta numerators, design-row sums for the trigger pass) plus the final
  per-sim inventory/PV — a few KB per block instead of [S, G] matrices.

Per-period means, deltas and trigger prices are reduced/recomputed by the
caller from the partial sums (:func:`storage_tpu.engines.lsmc` wires it in
when ``collect_panels=False``, ``extra_decisions=0`` and no mesh is used).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decisions import clipped_decision_bounds
from .regression import BasisSpec


def fwd_split3() -> bool:
    """Whether the per-decision continuation-interp matmul runs as the
    K-concatenated 3-term bf16 split instead of a HIGHEST f32 contraction.

    Mosaic has no ``Precision.HIGH``, so a 2-term bf16 scheme is built by
    hand: the query point is quantized to 1/256 of a grid cell (the SAME
    trick the backward kernel's 1/128 interp weights use — hat weights
    become k/256 values that bf16 represents EXACTLY, so W carries no
    rounding error at all; the query instead shifts by <=1/512 cell, a
    policy-only discretisation-level perturbation) and the table splits hi/lo
    (``T@W = T_hi@W + T_lo@W`` to ~2^-16 — the tables reach ~1e5 so a
    single bf16 table pass is NOT safe, see the inline note), concatenated
    along K into one [B+1, 2G] x [2G, bS] DEFAULT pass: ceil(2G/128) MXU
    K-tiles vs HIGHEST's 6 x ceil(G/128).  ``cont_d`` only picks the
    forward argmax decision (realised PV accumulates immediates), so the
    perturbation is policy-only.
    Chip measurement (Aug 19, 1M x 341): ForwardSimulation 0.472 -> 0.457 s
    (the kernel is mostly VPU/serial-bound, and the W splits add VPU casts
    that eat most of the MXU saving) with NO measurable NPV change on top of
    the backward fit split, so it defaults on for the small positive gain;
    ``STORAGE_TPU_FWD_PRECISION=highest`` reverts."""
    import os

    return os.environ.get(
        "STORAGE_TPU_FWD_PRECISION", "split3"
    ).lower() in ("split3", "high")

# Packed per-step scalar layout (column indices into scalars[n, :]).
_SC_LO = 0  # next-step inventory-space min
_SC_HI = 1  # next-step inventory-space max
_SC_LOSS = 2  # fractional inventory loss
_SC_IC = 3  # inject cost / unit
_SC_WC = 4  # withdraw cost / unit
_SC_CI = 5  # consumed fraction on inject
_SC_CW = 6  # consumed fraction on withdraw
_SC_ICR = 7  # inventory cost rate / unit
_SC_DFS = 8  # df to settlement
_SC_DFC = 9  # df to cost cash-flow date
_SC_DRIFT = 10  # ln F - V/2
_SC_VOLS = 11  # start of F vol loadings
NUM_FIXED_SCALARS = 11


def _design_row(spec: BasisSpec, spot, factors_cols):
    """Design-matrix columns for a block: list of [bS] vectors."""
    cols = []
    for b in range(spec.num_basis):
        col = jnp.ones_like(spot)
        if spec.spot_powers[b]:
            col = col * spot ** spec.spot_powers[b]
        for f, fp in enumerate(spec.factor_powers[b]):
            if fp:
                col = col * factors_cols[f] ** fp
        cols.append(col)
    return cols


def _forward_kernel(
    factors_ref,  # [n, F, bS]
    inv0_ref,  # [1, bS]
    tables_ref,  # [n, B+1, G]
    mus_ref,  # [n, B]
    sds_ref,  # [n, B]
    pillars_ref,  # [n, P, 3]
    scalars_ref,  # [n, NS]
    sums_ref,  # out [n, SUMS]
    xsum_ref,  # out [n, B+1]
    inv_out_ref,  # out [1, bS]
    pv_out_ref,  # out [1, bS]
    *,
    spec: BasisSpec,
    num_steps: int,
    num_grid: int,
    num_factors: int,
    num_pillars: int,
    interp_kind: int,
    true_sims: int,
):
    bS = inv0_ref.shape[-1]
    B = spec.num_basis
    # LAYOUT RULE (load-bearing for performance): every per-sim quantity is a
    # LANE-oriented [bS] vector and the continuation surface is kept
    # [G(sublane), bS(lane)] — so the per-decision interpolation compares and
    # selects broadcast j[None, :] without ever converting a lane vector to
    # the sublane axis.  The original [bS, G] orientation forced a
    # lane->sublane relayout per decision per step (plus an 11-column stack
    # relayout), which dominated the kernel at ~28 us/block-step.
    # Mosaic's tpu.iota is integer-only; cast to f32 for the hat weights.
    gi_f = jax.lax.broadcasted_iota(jnp.int32, (num_grid, bS), 0).astype(jnp.float32)
    use_split3 = fwd_split3()
    # Padded-sim mask: sims are padded up to a lane-aligned block multiple;
    # padded lanes run through the DP harmlessly but must not contribute to
    # the reduced outputs.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bS), 1)[0]
    valid = (lane + pl.program_id(0) * bS) < true_sims
    valid_f = valid.astype(jnp.float32)

    def body(k, carry):
        inv, pv = carry  # [bS], [bS]
        sc = scalars_ref[k]  # [NS]
        f_cols = [factors_ref[k, i, :] for i in range(num_factors)]
        log_spot = sc[_SC_DRIFT]
        for i in range(num_factors):
            log_spot = log_spot + sc[_SC_VOLS + i] * f_cols[i]
        spot = jnp.exp(log_spot)  # [bS]

        # Standardized design row with a trailing ones column, stacked on the
        # SUBLANE axis ([B+1, bS]) — each [bS] lane vector lands on its own
        # sublane row, no relayout.
        cols = _design_row(spec, spot, f_cols)
        xn1_cols = []
        for b in range(B):
            xn1_cols.append((cols[b] - mus_ref[k, b]) / sds_ref[k, b])
        xn1_cols.append(jnp.ones_like(spot))
        xn1 = jnp.stack(xn1_cols, axis=0)  # [B+1, bS]

        tbl_k = tables_ref[k]  # [B+1, G]
        if use_split3:
            # Shared across the decision loop: the K-concatenated bf16 split
            # of the continuation table (see fwd_split3) — blocks
            # [T_hi | T_lo] pair against the per-decision doubled weight
            # blocks [W; W] (W is exactly bf16 after the 1/256 query
            # quantization below).  In-kernel (Mosaic) cast round-trips are
            # honest rounding, unlike XLA under --xla_allow_excess_precision.
            t_hi = tbl_k.astype(jnp.bfloat16)
            t_lo = (tbl_k - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            tbl_cat = jnp.concatenate([t_hi, t_lo], axis=1)  # [B+1, 2G]

        # Ratchet rates at per-sim inventory (pillars unrolled; P is small).
        pil_inv = [pillars_ref[k, p_idx, 0] for p_idx in range(num_pillars)]
        pil_min = [pillars_ref[k, p_idx, 1] for p_idx in range(num_pillars)]
        pil_max = [pillars_ref[k, p_idx, 2] for p_idx in range(num_pillars)]
        if interp_kind == 1:  # step: floor lookup
            min_rate = jnp.full_like(inv, pil_min[0])
            max_rate = jnp.full_like(inv, pil_max[0])
            for p_idx in range(1, num_pillars):
                hit = inv >= pil_inv[p_idx]
                min_rate = jnp.where(hit, pil_min[p_idx], min_rate)
                max_rate = jnp.where(hit, pil_max[p_idx], max_rate)
        else:  # linear with boundary clamping
            min_rate = jnp.full_like(inv, pil_min[0])
            max_rate = jnp.full_like(inv, pil_max[0])
            for p_idx in range(num_pillars - 1):
                x0, x1 = pil_inv[p_idx], pil_inv[p_idx + 1]
                seg = x1 - x0
                w_seg = jnp.where(seg > 0.0, (inv - x0) / jnp.where(seg > 0.0, seg, 1.0), 0.0)
                w_seg = jnp.clip(w_seg, 0.0, 1.0)
                in_seg = inv >= x0
                min_rate = jnp.where(
                    in_seg, pil_min[p_idx] + (pil_min[p_idx + 1] - pil_min[p_idx]) * w_seg, min_rate
                )
                max_rate = jnp.where(
                    in_seg, pil_max[p_idx] + (pil_max[p_idx + 1] - pil_max[p_idx]) * w_seg, max_rate
                )

        # Fixed-width bang-bang decision set, D = 3 — the SHARED clipping
        # kernel (pure jnp.where on lane vectors, Pallas-safe), so the
        # forward set can never drift from the backward one
        # (step_economics -> bang_bang_decisions_fixed uses the same fn).
        lo, hi, loss_rate = sc[_SC_LO], sc[_SC_HI], sc[_SC_LOSS]
        loss_amt = loss_rate * inv
        yw, yi = clipped_decision_bounds(min_rate, max_rate, inv, loss_amt, lo, hi)
        has_zero = (yw < 0.0) & (yi > 0.0)
        d_mid = jnp.where(has_zero, 0.0, yi)
        decisions = (yw, d_mid, yi)

        inv_step = (hi - lo) / (num_grid - 1)
        safe_step = jnp.where(inv_step > 0.0, inv_step, 1.0)

        best_total = None
        best_imm = None
        best_vol = None
        best_consumed = None
        for d_idx, d in enumerate(decisions):
            q_after = inv + d - loss_amt
            t = jnp.where(inv_step > 0.0, (q_after - lo) / safe_step, 0.0)
            # Linear interpolation of the fitted continuation at the per-sim
            # query point t, MXU-formulated: the hat-function weight matrix
            # W[g, s] = max(0, 1 - |g - clip(t_s)|) has the same two non-zero
            # rows per sim as the classic (j, 1-w)/(j+1, w) pair, and
            #   cont_d = xn1' (tables_k W)
            # contracts the G axis on the MXU into a [B+1, bS] panel instead
            # of evaluating the full [G, bS] continuation surface and
            # masked-summing it on the VPU (which was the kernel's dominant
            # serial cost: ~2 extra [G, bS] select ops plus a [G, bS]
            # multiply + G-sublane reduction per decision per step).
            # HIGHEST precision is load-bearing: default bf16 multiplies
            # quantize ~1e5-magnitude table values by ~0.4%, visibly
            # corrupting the exercise decisions.
            th = jnp.clip(t, 0.0, num_grid - 1.0)
            if use_split3:
                # 1/256-quantized query ([bS]-cheap): every hat weight is a
                # k/256 value — 8 significant bits, EXACTLY bf16-representable
                # (bf16 carries 1+7 mantissa bits), and the pair still sums
                # to exactly 1.  Finer than the backward kernel's 1/128 table
                # quantization because the query here is per-sim (policy
                # noise, not a stored table): measured -1.15e-4 NPV at 1/128,
                # halved at 1/256.
                th_q = jnp.round(th * 256.0) * jnp.float32(1.0 / 256.0)
                wmat = jnp.maximum(1.0 - jnp.abs(gi_f - th_q[None, :]), 0.0)
                w16 = wmat.astype(jnp.bfloat16)
                w_cat = jnp.concatenate([w16, w16], axis=0)  # [2G, bS]
                tblw = jax.lax.dot_general(
                    tbl_cat, w_cat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [B+1, bS]
            else:
                wmat = jnp.maximum(1.0 - jnp.abs(gi_f - th[None, :]), 0.0)
                tblw = jax.lax.dot_general(
                    tbl_k, wmat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [B+1, bS]
            cont_d = jnp.sum(xn1 * tblw, axis=0)  # [bS]
            consumed = jnp.where(d > 0.0, sc[_SC_CI] * d, -sc[_SC_CW] * d)
            iw_cost = jnp.where(d > 0.0, sc[_SC_IC] * d, -sc[_SC_WC] * d)
            immediate = (
                -(d + consumed) * spot * sc[_SC_DFS]
                - (iw_cost + sc[_SC_ICR] * inv) * sc[_SC_DFC]
            )
            total = immediate + cont_d
            if best_total is None:
                best_total = total
                best_imm, best_vol, best_consumed = immediate, d, consumed
            else:
                better = total > best_total  # first-occurrence argmax
                best_total = jnp.where(better, total, best_total)
                best_imm = jnp.where(better, immediate, best_imm)
                best_vol = jnp.where(better, d, best_vol)
                best_consumed = jnp.where(better, consumed, best_consumed)

        net = -best_vol - best_consumed
        # Vector row stores: scalar stores to VMEM are not supported on TPU.
        sums_ref[0, k, :] = jnp.stack(
            [
                jnp.sum(inv * valid_f),
                jnp.sum(best_vol * valid_f),
                jnp.sum(best_consumed * valid_f),
                jnp.sum(loss_amt * valid_f),
                jnp.sum(net * valid_f),
                jnp.sum(best_imm * valid_f),
                jnp.sum(net * spot * valid_f),
            ]
        )
        xsum_ref[0, k, :] = jnp.sum(xn1 * valid_f[None, :], axis=1)
        return inv + best_vol - loss_amt, pv + best_imm

    inv_final, pv_final = jax.lax.fori_loop(
        0, num_steps, body, (inv0_ref[0, :], jnp.zeros((bS,), jnp.float32))
    )
    inv_out_ref[0, :] = inv_final
    pv_out_ref[0, :] = pv_final


NUM_SUMS = 7


def _forward_sim_local(
    factors,  # [n, F, S_local]
    inv0_vec,  # [S_local]
    tables,  # [n, B+1, G]
    mus,  # [n, B]
    sds,  # [n, B]
    pillars,  # [n, P, 3]
    scalars,  # [n, NS]
    spec: BasisSpec,
    interp_kind: int,
    num_grid: int,
    block_sims: int,
    interpret: bool,
    true_sims: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Device-local fused forward simulation.

    Returns ``(sums [n, 7], xsums [n, B+1], inv_final [S_local],
    pv_final [S_local])`` with sums/xsums reduced over the LOCAL sims only.
    ``true_sims`` marks the real path count when ``factors`` arrives already
    lane-padded (see ``simulate_factor_paths(pad_to=...)``); padded lanes are
    masked out of the reduced sums and the per-sim outputs keep the incoming
    (padded) width for the caller to slice.
    """
    n, num_factors, S = factors.shape
    if true_sims is None:
        true_sims = S
    if block_sims % 128:
        raise ValueError("block_sims must be a multiple of 128 (TPU lane width).")
    num_blocks = -(-S // block_sims)
    padded = num_blocks * block_sims
    if padded != S:
        factors = jnp.pad(factors, ((0, 0), (0, 0), (0, padded - S)))
    B = spec.num_basis
    num_pillars = pillars.shape[1]
    ns = scalars.shape[1]

    # Padded lanes are masked out of the reduced outputs by true_sims.
    inv0_row = jnp.pad(inv0_vec, (0, padded - S))[None, :]

    kernel = functools.partial(
        _forward_kernel,
        spec=spec,
        num_steps=n,
        num_grid=num_grid,
        num_factors=num_factors,
        num_pillars=num_pillars,
        interp_kind=interp_kind,
        true_sims=true_sims,
    )
    sums, xsums, inv_final, pv_final = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((n, num_factors, block_sims), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_sims), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, B + 1, num_grid), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, num_pillars, 3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ns), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, NUM_SUMS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, B + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_sims), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_sims), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_blocks, n, NUM_SUMS), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, n, B + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, padded), jnp.float32),
            jax.ShapeDtypeStruct((1, padded), jnp.float32),
        ],
        interpret=interpret,
    )(factors, inv0_row, tables, mus, sds, pillars, scalars)

    return (
        jnp.sum(sums, axis=0),
        jnp.sum(xsums, axis=0),
        inv_final[0, :S],
        pv_final[0, :S],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "interp_kind", "num_grid", "block_sims", "interpret", "mesh",
        "axis_name", "true_sims",
    ),
)
def pallas_forward_sim(
    factors,  # [n, F, S]
    inv0,  # starting inventory: scalar, or per-sim [S] carry from a prior chunk
    tables,  # [n, B+1, G] coeff tables incl. the vbar column
    mus,  # [n, B]
    sds,  # [n, B]
    pillars,  # [n, P, 3]
    scalars,  # [n, NS] packed per-step scalars
    spec: BasisSpec,
    interp_kind: int,
    num_grid: int,
    block_sims: int = 1024,
    interpret: bool = False,
    mesh=None,
    axis_name: Optional[str] = None,
    true_sims: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the fused forward simulation.

    Returns ``(sums [n, 7], xsums [n, B+1], inv_final [S], pv_final [S])``
    where sums/xsums are already reduced over all simulations.

    With ``mesh`` (a 1-D paths mesh) each device runs the whole horizon for
    its local path shard inside the kernel and the per-period partial sums
    are ``psum``ed across shards over ICI; the per-sim inventory/PV carries
    stay device-local.  ``block_sims`` then sizes blocks of the LOCAL shard.
    """
    n, num_factors, S = factors.shape
    # Scalar inv0 broadcasts; a per-sim [S] array (the inventory carry when
    # the horizon is split into progress chunks) passes through.
    inv0_vec = jnp.broadcast_to(jnp.asarray(inv0, jnp.float32), (S,))
    local = functools.partial(
        _forward_sim_local,
        spec=spec, interp_kind=interp_kind, num_grid=num_grid,
        block_sims=block_sims, interpret=interpret,
    )
    if mesh is None:
        return local(
            factors, inv0_vec, tables, mus, sds, pillars, scalars,
            true_sims=true_sims,
        )

    from jax.sharding import PartitionSpec as P

    if true_sims is not None and true_sims != S:
        raise ValueError(
            "pre-padded (true_sims < width) inputs are single-device only — "
            "under a mesh the padding would have to be per shard"
        )
    axis_name = axis_name or mesh.axis_names[0]

    def body(f, iv, tb, mu, sd, pil, sc):
        sums, xsums, inv_f, pv_f = local(f, iv, tb, mu, sd, pil, sc)
        return (
            jax.lax.psum(sums, axis_name),
            jax.lax.psum(xsums, axis_name),
            inv_f,
            pv_f,
        )

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name), P(axis_name), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return sharded(factors, inv0_vec, tables, mus, sds, pillars, scalars)


def pack_scalars(
    space_lo, space_hi, loss, inject_cost, withdraw_cost, cons_inject, cons_withdraw,
    inv_cost_rate, df_settle, df_cost, sim_drift, sim_vols,
) -> jnp.ndarray:
    """Pack per-step scalars into the kernel's [n, NS] layout."""
    cols = [
        space_lo, space_hi, loss, inject_cost, withdraw_cost, cons_inject,
        cons_withdraw, inv_cost_rate, df_settle, df_cost, sim_drift,
    ]
    packed = jnp.stack([jnp.asarray(c, jnp.float32) for c in cols], axis=1)
    return jnp.concatenate([packed, jnp.asarray(sim_vols, jnp.float32)], axis=1)


