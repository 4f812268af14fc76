"""Multi-factor spot-price path simulation (JAX).

TPU-native replacement for the reference's native (NuGet, MKL-backed)
``Cmdty.Core.Simulation.MultiFactor.MultiFactorSpotPriceSimulator`` (call
sites: ``LsmcValuationParameters.cs:163-178``, ``multi_factor.py:49-92``).

Model (see SURVEY.md §2.2): risk-neutral forward dynamics

    dF(t,T)/F(t,T) = sum_i sigma_i(T) e^{-alpha_i (T-t)} dW_i,   corr(dW_i,dW_j)=rho_ij

so the spot S(t) = F(t,t) is log-normal around the initial forward curve:

    ln S(t_k) = ln F(0,t_k) - V_k/2 + sum_i sigma_i(t_k) * Y_i(t_k)

with dimensionless OU factor states Y_i (dY_i = -alpha_i Y_i dt + dW_i) and
V_k = Var[sum_i sigma_i(t_k) Y_i(t_k)] given by the closed-form integrated
covariance (confirmed against the reference's pure-Python mirror
``MultiFactorModel.integrated_covar``, ``multi_factor.py:145-187``).

Discretisation is **exact** (no Euler error): between sim times the factor
update is ``Y_k = e^{-alpha dt} Y_{k-1} + L_k Z_k`` where ``L_k`` is the
Cholesky factor of the exact increment covariance

    Cov(eps_i, eps_j) = rho_ij (1 - e^{-(alpha_i+alpha_j) dt}) / (alpha_i + alpha_j).

All per-step coefficients are precomputed on host in float64; the device
kernel is a ``lax.scan`` of rank-F matmuls over [F, S] normal draws from
threefry (``jax.random``), with antithetic mirroring.  The Markov factor
states Y_i are returned per (step, sim) for use as LSMC regressors
(reference ``ISpotSimResults.MarkovFactorsForPeriod``).

Seed parity with the reference's Mersenne Twister is impossible by design;
golden values are re-pinned for threefry (BASELINE.md note on seeds).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cont_ext(x: np.ndarray, dt) -> np.ndarray:
    """(1 - e^{-x dt}) / x with the x -> 0 limit dt (reference
    ``MultiFactorModel._cont_ext``, ``multi_factor.py:225-229``)."""
    x = np.asarray(x, dtype=np.float64)
    safe = np.where(x == 0.0, 1.0, x)
    return np.where(x == 0.0, dt, (1.0 - np.exp(-safe * dt)) / safe)


@dataclass(frozen=True)
class SimCoefficients:
    """Host-precomputed per-step simulation coefficients (all float64).

    Shapes: n sim steps, F factors.
    """

    decay: np.ndarray  # [n, F] e^{-alpha_i dt_k}
    chol: np.ndarray  # [n, F, F] Cholesky of exact increment covariance
    vols: np.ndarray  # [n, F] sigma_i(t_k) of the spot for each sim period
    log_fwd_drift: np.ndarray  # [n] ln F(0,t_k) - V_k / 2


def sim_coefficients(
    mean_reversions: np.ndarray,  # [F]
    vols: np.ndarray,  # [n, F] factor vol for each simulated period
    factor_corrs: np.ndarray,  # [F, F]
    times: np.ndarray,  # [n] year fractions from the valuation date
    forwards: np.ndarray,  # [n] F(0, t_k)
) -> SimCoefficients:
    """Precompute exact-discretisation coefficients."""
    alphas = np.asarray(mean_reversions, dtype=np.float64)
    vols = np.asarray(vols, dtype=np.float64)
    corrs = np.asarray(factor_corrs, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    forwards = np.asarray(forwards, dtype=np.float64)
    n, num_factors = vols.shape
    alpha_sum = alphas[:, None] + alphas[None, :]  # [F, F]

    prev_times = np.concatenate([[0.0], times[:-1]])
    dts = times - prev_times
    if np.any(dts < 0.0):
        raise ValueError("Simulation times must be non-decreasing.")

    decay = np.exp(-alphas[None, :] * dts[:, None])  # [n, F]

    chol = np.empty((n, num_factors, num_factors), dtype=np.float64)
    for k in range(n):
        cov = corrs * _cont_ext(alpha_sum, dts[k])
        # Tiny jitter guards semidefinite cases (dt == 0 or perfectly
        # correlated factors) without perturbing healthy covariances.
        try:
            chol[k] = np.linalg.cholesky(cov)
        except np.linalg.LinAlgError:
            eye = np.eye(num_factors) * 1e-14
            w, v = np.linalg.eigh(cov + eye)
            w = np.clip(w, 0.0, None)
            chol[k] = np.linalg.cholesky(v @ np.diag(w) @ v.T + eye)

    # V_k = Var[sum_i sigma_i(t_k) Y_i(t_k)]
    variance = np.einsum(
        "kf,kg,fg,kfg->k",
        vols,
        vols,
        corrs,
        _cont_ext(alpha_sum[None, :, :], times[:, None, None]),
    )
    log_fwd_drift = np.log(forwards) - 0.5 * variance
    return SimCoefficients(decay=decay, chol=chol, vols=vols, log_fwd_drift=log_fwd_drift)


@partial(jax.jit, static_argnames=("num_sims", "antithetic"))
def _simulate_factor_kernel(
    key,
    decay,  # [n, F]
    chol,  # [n, F, F]
    num_sims: int,
    antithetic: bool,
):
    """Device kernel: scan OU factor states over time.

    Returns ``factors [n, F, S]``.  Spot prices are a per-period deterministic
    transform of the factors (``exp(drift_k + vols_k . Y_k)``) and are
    recomputed where needed instead of stored — at production path counts the
    spot panel alone is GBs of HBM.
    """
    n, num_factors = decay.shape
    dtype = decay.dtype
    if antithetic:
        half = (num_sims + 1) // 2
        normals = jax.random.normal(key, (n, num_factors, half), dtype=dtype)
        normals = jnp.concatenate([normals, -normals], axis=-1)[:, :, :num_sims]
    else:
        normals = jax.random.normal(key, (n, num_factors, num_sims), dtype=dtype)

    def advance(y, decay_k, chol_k, z_k):
        # Exact OU update: decay + correlated increment.  F is tiny, so the
        # matmul is a cheap [F,F]x[F,S] contraction fused by XLA.
        return decay_k[:, None] * y + jnp.dot(
            chol_k, z_k, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Scan in UNROLLED CHUNKS of steps: a plain per-step scan stacks its
    # outputs with one [1, F, S] dynamic-update-slice per step, which the
    # backend runs far below HBM bandwidth (~10x) — at 1M sims the stacking
    # dominated the whole simulation.  Unrolling C steps per scan iteration
    # makes each iteration write one contiguous [C, F, S] block instead.
    # The per-step arithmetic and the threefry stream are unchanged, so
    # paths are bit-identical to the naive scan's.
    chunk = 16
    num_chunks = n // chunk
    y0 = jnp.zeros((num_factors, num_sims), dtype=dtype)

    def chunk_step(y, c0):
        # Read the chunk's normals as one contiguous dynamic slice of the
        # full array — reshaping the 4 GB array into scan xs would
        # materialise a second copy of it.
        zero = jnp.zeros_like(c0)  # same int width as c0 (x64-safe)
        z_c = jax.lax.dynamic_slice(
            normals, (c0, zero, zero), (chunk, num_factors, num_sims)
        )
        decay_c = jax.lax.dynamic_slice(decay, (c0, zero), (chunk, num_factors))
        chol_c = jax.lax.dynamic_slice(
            chol, (c0, zero, zero), (chunk, num_factors, num_factors)
        )
        ys = []
        for c in range(chunk):
            y = advance(y, decay_c[c], chol_c[c], z_c[c])
            ys.append(y)
        return y, jnp.stack(ys)

    if num_chunks:
        starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
        y_last, factors_main = jax.lax.scan(chunk_step, y0, starts)
        factors_main = factors_main.reshape((num_chunks * chunk,) + factors_main.shape[2:])
    else:
        y_last, factors_main = y0, jnp.zeros((0, num_factors, num_sims), dtype)

    tail = []
    y = y_last
    for k in range(num_chunks * chunk, n):
        y = advance(y, decay[k], chol[k], normals[k])
        tail.append(y)
    if tail:
        factors_main = jnp.concatenate([factors_main, jnp.stack(tail)], axis=0)
    return factors_main


@jax.jit
def spots_from_factor_paths(factors, vols, log_fwd_drift):
    """Spot-price panel ``[n, S]`` from factor paths (deterministic transform)."""
    log_spots = (
        jnp.einsum("nf,nfs->ns", vols, factors, precision=jax.lax.Precision.HIGHEST)
        + log_fwd_drift[:, None]
    )
    return jnp.exp(log_spots)


def simulate_factor_paths(
    coeffs: SimCoefficients,
    num_sims: int,
    seed: Optional[int],
    antithetic: bool = False,
    dtype=jnp.float32,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Simulate Markov factor state paths ``[n, F, S]``."""
    if key is None:
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**63)
        key = jax.random.PRNGKey(int(seed))
    return _simulate_factor_kernel(
        key,
        jnp.asarray(coeffs.decay, dtype),
        jnp.asarray(coeffs.chol, dtype),
        num_sims=int(num_sims),
        antithetic=bool(antithetic),
    )


def simulate_spot_paths(
    coeffs: SimCoefficients,
    num_sims: int,
    seed: Optional[int],
    antithetic: bool = False,
    dtype=jnp.float32,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Simulate spot paths and Markov factor states.

    Equivalent of ``MultiFactorSpotPriceSimulator.Simulate(numSims)``; the
    threefry ``seed`` replaces the reference's ``MersenneTwisterGenerator``
    seed (``multi_factor.py:76-80``).

    Returns:
      spots ``[n, S]``, factors ``[n, F, S]`` on device.
    """
    factors = simulate_factor_paths(coeffs, num_sims, seed, antithetic, dtype, key)
    spots = spots_from_factor_paths(
        factors, jnp.asarray(coeffs.vols, dtype), jnp.asarray(coeffs.log_fwd_drift, dtype)
    )
    return spots, factors
