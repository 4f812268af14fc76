"""Inventory-grid interpolation kernels.

The engines hold value functions on per-period inventory grids and linearly
interpolate them at post-decision inventories.  The reference does this with a
per-query binary search (``StorageHelper.BisectInventorySpace``,
``StorageHelper.cs:280-314``) plus linear weights
(``LsmcStorageValuation.cs:722-741``).  The TPU design uses **uniform
(linspace) per-period grids**, so the bracketing index is O(1) arithmetic —
``(x - lo) / step`` — with no search, no data-dependent control flow, and
perfect vectorisation over sims × grid points × decisions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def uniform_grid(lo, hi, num_points: int) -> np.ndarray:
    """Host: linspace grid over one period's inventory space.

    Degenerate ranges (lo == hi) produce a constant grid, mirroring the
    reference's single-point grid for the first active period
    (``LsmcStorageValuation.cs:209-217``).
    """
    return np.linspace(float(lo), float(hi), num_points)


def uniform_grids(lo: np.ndarray, hi: np.ndarray, num_points: int) -> np.ndarray:
    """Host: ``[n, G]`` linspace grids for per-period inventory spaces."""
    frac = np.linspace(0.0, 1.0, num_points)
    return lo[:, None] + (hi - lo)[:, None] * frac[None, :]


def fractional_index(x, lo, hi, num_points: int):
    """Continuous index of ``x`` on the uniform grid ``linspace(lo, hi, G)``.

    Returns ``(j, w)`` with integer lower index ``j`` in ``[0, G-2]`` and
    weight ``w`` on the upper neighbour; constant grids return ``(0, 0)``.
    Inputs broadcast.
    """
    span = hi - lo
    step = span / (num_points - 1)
    t = jnp.where(span > 0.0, (x - lo) / jnp.where(span > 0.0, step, 1.0), 0.0)
    j = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, num_points - 2)
    w = jnp.clip(t - j, 0.0, 1.0)
    return j, w


def interp_columns(values, j, w):
    """Linear interpolation of ``values[..., G]`` at fractional indices.

    ``j``/``w`` must broadcast against ``values[..., 0]``'s shape with
    trailing query dims appended — both are gathered along the last axis.
    """
    v_lo = jnp.take_along_axis(values, j, axis=-1)
    v_hi = jnp.take_along_axis(values, j + 1, axis=-1)
    return v_lo + (v_hi - v_lo) * w
