"""Fused Pallas backward-induction value update.

One backward LSMC period (reference ``LsmcStorageValuation.cs:166-340``) does
two things: (a) regress next-period values on the current design matrix and
(b) update the value surface ``V[k] = max_d [immediate_d + interp_d(V[k+1])]``
with the argmax taken on the FITTED continuation (lower-bound estimator).

(a) is two skinny matmuls plus a tiny Cholesky — XLA already runs it at MXU
speed, and it reduces over ALL sims so it cannot live inside a sim-blocked
kernel anyway.  (b) is the hot part: per decision it interpolates two
``[S, G]`` surfaces onto the next grid (dense two-nonzeros-per-column matmuls,
``engines/lsmc.py::_backward_step_core``) and under XLA each product plus the
argmax select chain round-trips HBM.  This kernel fuses (b): a block of sims
computes the fitted surface, all ``D`` interpolation matmuls, the running
argmax and the realised-value select entirely in VMEM, writing ``V[k]`` once.

It also emits per-block column sums of the new surface, so the scan body can
carry the sim-mean ``vbar`` (used to centre the next regression target —
f32 accumulation of uncentred 1e5-magnitude values loses enough mantissa at
1e6 paths to degrade the fitted policy) without re-reading ``V`` from HBM.

Works for every ratchet interp kind and any ``extra_decisions`` width: the
per-grid decision economics are host-of-kernel inputs (computed by
``engines/common.py::step_economics`` on XLA, they are ``[G, D]`` — tiny).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .regression import BasisSpec
from .pallas_forward import _design_row


def _dot3(a, b):
    """bf16_3x matmul: ~2^-21 relative error at half the passes of HIGHEST.

    Mosaic only lowers DEFAULT and HIGHEST dot precisions, so the classic
    three-pass split is done by hand: a = a_hi + a_lo in bfloat16, likewise b,
    dropping only the a_lo*b_lo term (~2^-18 relative).  Callers must centre
    large-magnitude operands first so the dropped term stays at f32-roundoff
    scale.
    """
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dn, preferred_element_type=jnp.float32
        )

    return mm(a_hi, b_hi) + mm(a_lo, b_hi) + mm(a_hi, b_lo)


def _backward_kernel(
    factors_ref,  # [bS, F] (sims on the sublane axis, like every other ref)
    v_ref,  # [bS, G] next-period values
    ctab_ref,  # [B+1, G] regression coeffs with the vbar row appended
    musd_ref,  # [2, B] standardization mean / scale
    wd_ref,  # [D, G, G] per-decision linear-interp matrices
    econ_ref,  # [2, D, G] price_coeff / cost_npv per (decision, grid point)
    scal_ref,  # [1, 1+F] drift, vol loadings
    v_out_ref,  # out [bS, G] this-period values
    colsum_ref,  # out [1, 1, G] partial column sums of the new surface
    *,
    spec: BasisSpec,
    num_grid: int,
    num_factors: int,
    num_decisions: int,
    true_sims: int,
    precision,
):
    bS = v_ref.shape[0]
    B = spec.num_basis
    row = jax.lax.broadcasted_iota(jnp.int32, (bS, 1), 0)
    valid_f = ((row + pl.program_id(0) * bS) < true_sims).astype(jnp.float32)

    # All per-sim vectors are kept [bS, 1] so every op stays 2-D with sims on
    # the sublane axis (the partitioned axis only needs 8-alignment there,
    # letting the block width divide non-128-multiple sim counts exactly —
    # no per-step pad copies of the 100s-of-MB value surface).
    f_cols = [factors_ref[:, i : i + 1] for i in range(num_factors)]
    log_spot = scal_ref[0, 0]
    for i in range(num_factors):
        log_spot = log_spot + scal_ref[0, 1 + i] * f_cols[i]
    spot = jnp.exp(log_spot)  # [bS, 1]

    cols = _design_row(spec, spot, f_cols)
    xn = jnp.concatenate(
        [(cols[b] - musd_ref[0, b]) / musd_ref[1, b] for b in range(B)], axis=1
    )  # [bS, B]

    dn = (((1,), (0,)), ((), ()))
    # Centred fitted continuation (the ctab vbar row is added back after the
    # interpolation): skinny matmul, HIGHEST precision is cheap here.
    fitted_c = jax.lax.dot_general(
        xn, ctab_ref[:B, :], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [bS, G]
    vbar_row = ctab_ref[B, :][None, :]  # [1, G]
    # Raised matmul precision on the [bS, G] x [G, G] interpolation products
    # is load-bearing (see the forward kernel): plain bf16 passes quantize
    # 1e5-magnitude continuation values by ~0.4%.  The default 'high' mode
    # centres both surfaces by vbar (magnitudes drop to the sim spread) and
    # uses the half-cost bf16_3x split; 'highest' keeps full 6-pass dots.
    high = precision != jax.lax.Precision.HIGHEST
    v_next = v_ref[...]
    v_c = v_next - vbar_row if high else v_next

    best_fitted = None
    best_actual = None
    for d in range(num_decisions):
        wd = wd_ref[d]  # [G_next, G]
        vbar_d = jax.lax.dot_general(
            vbar_row, wd, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [1, G]
        if high:
            fit_d = _dot3(fitted_c, wd) + vbar_d
            act_d = _dot3(v_c, wd) + vbar_d
        else:
            fit_d = jax.lax.dot_general(
                fitted_c, wd, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) + vbar_d
            act_d = jax.lax.dot_general(
                v_c, wd, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        imm = spot * econ_ref[0, d, :][None, :] - econ_ref[1, d, :][None, :]
        total = imm + fit_d
        if best_fitted is None:  # decision 0 seeds unconditionally (NaN guard)
            best_fitted = total
            best_actual = imm + act_d
        else:
            better = total > best_fitted  # first-occurrence argmax
            best_fitted = jnp.where(better, total, best_fitted)
            best_actual = jnp.where(better, imm + act_d, best_actual)

    v_out_ref[...] = best_actual
    colsum_ref[0, 0, :] = jnp.sum(best_actual * valid_f, axis=0)


def _backward_update_local(
    factors,  # [S_local, F]
    v_next,  # [S_local, G]
    ctab,  # [B+1, G]
    musd,  # [2, B]
    wd,  # [D, G, G]
    econ,  # [2, D, G]
    scal,  # [1, 1+F]
    spec: BasisSpec,
    num_grid: int,
    block_sims: int,
    interpret: bool,
    precision: str,
) -> Tuple[jax.Array, jax.Array]:
    """Device-local kernel invocation.

    Returns ``(v_this [S_local, G], colsum [G])`` — the new surface and its
    masked column SUM (not mean: under a paths mesh the caller psums the
    per-shard sums before dividing by the global sim count).
    """
    S, num_factors = factors.shape
    if block_sims % 8:
        raise ValueError("block_sims must be a multiple of 8 (TPU sublane width).")
    num_blocks = -(-S // block_sims)
    padded = num_blocks * block_sims
    if padded != S:
        factors = jnp.pad(factors, ((0, padded - S), (0, 0)))
        v_next = jnp.pad(v_next, ((0, padded - S), (0, 0)))
    B = spec.num_basis
    D = wd.shape[0]

    kernel = functools.partial(
        _backward_kernel,
        spec=spec,
        num_grid=num_grid,
        num_factors=num_factors,
        num_decisions=D,
        true_sims=S,
        precision=(
            jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.HIGH
        ),
    )
    v_this, colsums = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block_sims, num_factors), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sims, num_grid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B + 1, num_grid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, num_grid, num_grid), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, num_grid), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1 + num_factors), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_sims, num_grid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_grid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, num_grid), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, 1, num_grid), jnp.float32),
        ],
        interpret=interpret,
    )(factors, v_next, ctab, musd, wd, econ, scal)

    return v_this[:S], jnp.sum(colsums, axis=(0, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "num_grid", "block_sims", "interpret", "precision", "mesh", "axis_name",
    ),
)
def pallas_backward_update(
    factors,  # [S, F]
    v_next,  # [S, G]
    ctab,  # [B+1, G]
    musd,  # [2, B]
    wd,  # [D, G, G]
    econ,  # [2, D, G]
    scal,  # [1, 1+F]
    spec: BasisSpec,
    num_grid: int,
    block_sims: int = 1024,
    interpret: bool = False,
    precision: str = "high",
    mesh=None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One fused backward value update.

    Returns ``(v_this [S, G], vbar_this [G])`` — the new surface and its
    sim-mean (from masked per-block partial sums).

    With ``mesh`` (a 1-D paths mesh) the kernel runs per device shard under
    ``shard_map``: each device updates its local slice of the value surface
    in VMEM and the sim-mean becomes a cross-shard ``psum`` over ICI —
    ``block_sims`` then sizes blocks of the LOCAL shard.
    """
    S = factors.shape[0]
    local = functools.partial(
        _backward_update_local,
        spec=spec, num_grid=num_grid, block_sims=block_sims,
        interpret=interpret, precision=precision,
    )
    if mesh is None:
        v_this, colsum = local(factors, v_next, ctab, musd, wd, econ, scal)
        return v_this, colsum / S

    from jax.sharding import PartitionSpec as P

    axis_name = axis_name or mesh.axis_names[0]

    def body(f, v, ct, ms, w, ec, sc):
        v_out, colsum = local(f, v, ct, ms, w, ec, sc)
        return v_out, jax.lax.psum(colsum, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(), P(), P(), P(), P()),
        out_specs=(P(axis_name, None), P()),
        check_vma=False,
    )
    v_this, colsum = sharded(factors, v_next, ctab, musd, wd, econ, scal)
    return v_this, colsum / S


def pick_backward_block(num_sims: int, num_grid: int) -> int:
    """Sim-block width targeting ~0.5 MB value tiles (scoped VMEM must stay
    under 16 MB with the fitted surface, the per-decision temporaries and the
    double-buffered in/out value blocks).

    Prefers the largest 8-aligned block that divides ``num_sims`` exactly —
    the partitioned axis is the sublane axis throughout, so exact division
    skips the per-step pad copy of the value surface entirely (e.g. 1,000
    for 1M sims, which no 128-multiple divides).
    """
    target = min(1024, max(128, (1 << 17) // max(1, num_grid)), max(8, num_sims))
    for block in range(target - target % 8, 127, -8):
        if num_sims % block == 0:
            return block
    return max(128, (target // 128) * 128)  # fall back to the pad path
