"""Coordinate-grid construction for implicit neural representations.

TPU-first design: coordinates are *never* materialised as a full (D*H*W, 3)
grid on the host when avoidable.  Instead we expose arithmetic maps from a
flat voxel index to its coordinate value, so samplers and decoders can
regenerate coordinates on-device from integer indices (a few VPU flops)
instead of gathering a precomputed grid from HBM (bandwidth-bound).

Capability parity: reference `utils/dataset.py:11-62`
(`create_coords` / `create_flattened_coords`, modes 'n11', '0p1', "min,max").
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def parse_coords_mode(mode: str) -> Tuple[float, float]:
    """Parse a coords-mode string into (minimum, maximum).

    Accepts 'n11' (-1..1), '0p1' (0..1), or 'min,max' (e.g. '-1,1'),
    mirroring reference utils/dataset.py:12-20.
    """
    if mode == "n11":
        return -1.0, 1.0
    if mode == "0p1":
        return 0.0, 1.0
    lo, hi = mode.split(",")
    return float(lo), float(hi)


def axis_linspace(n: int, mode: str = "n11", dtype=jnp.float32) -> jnp.ndarray:
    """linspace(min, max, n) along one axis (torch.linspace semantics:
    endpoints inclusive; n == 1 yields [min])."""
    lo, hi = parse_coords_mode(mode)
    if n == 1:
        return jnp.asarray([lo], dtype=dtype)
    return jnp.linspace(lo, hi, n, dtype=dtype)


def index_to_coords(flat_idx: jnp.ndarray, shape: Sequence[int], mode: str = "n11",
                    dtype=jnp.float32) -> jnp.ndarray:
    """Map flat voxel indices -> coordinates, arithmetically (no grid gather).

    flat_idx: int array of any shape; returns coords with trailing axis
    len(shape).  Row-major (C) order matches the reference's
    rearrange('d h w c -> (d h w) c') flattening (utils/dataset.py:51,59).
    """
    lo, hi = parse_coords_mode(mode)
    ndim = len(shape)
    strides = []
    s = 1
    for n in reversed(shape):
        strides.append(s)
        s *= n
    strides = strides[::-1]  # row-major strides in voxels
    comps = []
    for axis in range(ndim):
        n = shape[axis]
        idx_axis = (flat_idx // strides[axis]) % n
        if n == 1:
            comps.append(jnp.full(idx_axis.shape, lo, dtype=dtype))
        else:
            step = (hi - lo) / (n - 1)
            comps.append(lo + idx_axis.astype(dtype) * jnp.asarray(step, dtype=dtype))
    return jnp.stack(comps, axis=-1)


def index_to_coords_dynamic(flat_idx: jnp.ndarray, shape_vec: jnp.ndarray,
                            mode: str = "n11", dtype=jnp.float32) -> jnp.ndarray:
    """index_to_coords with a *traced* per-block shape vector (ndim,).

    Used by the block-batched trainer where every vmapped block has its own
    spatial extent.  Row-major like index_to_coords; axes of size 1 map to
    the interval minimum.
    """
    lo, hi = parse_coords_mode(mode)
    ndim = shape_vec.shape[0]
    comps = []
    rem = flat_idx
    for axis in range(ndim - 1, -1, -1):
        n = shape_vec[axis]
        idx_axis = rem % n
        rem = rem // n
        step = jnp.where(n > 1, (hi - lo) / jnp.maximum(n - 1, 1), 0.0)
        comps.append(lo + idx_axis.astype(dtype) * step.astype(dtype))
    comps = comps[::-1]
    return jnp.stack(comps, axis=-1)


def row_major_strides(shape_vec: jnp.ndarray) -> jnp.ndarray:
    """Row-major voxel strides from a (possibly traced) shape vector:
    multiplies only — safe inside hot loops (TPUs have no integer-divide
    hardware; `//`/`%` by a traced value lowers to a slow expansion)."""
    rev = jnp.cumprod(shape_vec[::-1])
    return jnp.concatenate([rev[::-1][1:],
                            jnp.ones((1,), shape_vec.dtype)])


def axes_to_coords(axes_idx: jnp.ndarray, shape_vec: jnp.ndarray,
                   mode: str = "n11", dtype=jnp.float32) -> jnp.ndarray:
    """Per-axis integer indices (..., ndim) -> coordinates, with the same
    linspace semantics as index_to_coords_dynamic (axes of size 1 -> lo).
    Pure multiplies: the fast path for traced per-block shapes."""
    lo, hi = parse_coords_mode(mode)
    n = shape_vec.astype(dtype)
    step = jnp.where(shape_vec > 1,
                     (hi - lo) / jnp.maximum(n - 1.0, 1.0),
                     0.0).astype(dtype)
    return lo + axes_idx.astype(dtype) * step


def floordiv24(a: jnp.ndarray, b) -> jnp.ndarray:
    """a // b via float32 reciprocal multiply + correction.

    Exact for 0 <= a < 2**24 and b >= 1 (float32 holds such ints exactly;
    the two correction steps absorb reciprocal rounding).  Used to avoid
    TPU integer division by traced values in bounded-index paths (the
    80^3 cube guard bounds full-batch blocks well under 2**24)."""
    af = a.astype(jnp.float32)
    bf = jnp.asarray(b).astype(jnp.float32)
    q = jnp.floor(af * (1.0 / bf)).astype(a.dtype)
    r = a - q * b
    q = jnp.where(r < 0, q - 1, q)
    r = a - q * b
    q = jnp.where(r >= b, q + 1, q)
    return q


def flat_to_axes24(flat_idx: jnp.ndarray, shape_vec: jnp.ndarray
                   ) -> jnp.ndarray:
    """Flat row-major indices -> per-axis indices (..., ndim) using
    floordiv24 (exact for flat_idx < 2**24)."""
    ndim = shape_vec.shape[0]
    rem = flat_idx
    axes = []
    for axis in range(ndim - 1, -1, -1):
        n = shape_vec[axis]
        q = floordiv24(rem, n)
        axes.append(rem - q * n)
        rem = q
    return jnp.stack(axes[::-1], axis=-1)


def create_coords(shape: Sequence[int], mode: str = "n11", dtype=jnp.float32) -> jnp.ndarray:
    """Dense coordinate grid of shape (*shape, len(shape)).

    Equivalent to reference create_coords (utils/dataset.py:11-35) for 2-D
    and 3-D, generalised to any rank.
    """
    axes = [axis_linspace(n, mode, dtype) for n in shape]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, axis=-1)


def create_flattened_coords(shape: Sequence[int], mode: str = "n11",
                            dtype=jnp.float32) -> jnp.ndarray:
    """Flat (prod(shape), len(shape)) coordinate list (row-major).

    Equivalent to reference create_flattened_coords (utils/dataset.py:36-62).
    """
    return create_coords(shape, mode, dtype).reshape(-1, len(shape))


def create_coords_np(shape: Sequence[int], mode: str = "n11") -> np.ndarray:
    """NumPy twin of create_coords for host-side code paths."""
    lo, hi = parse_coords_mode(mode)
    axes = [np.linspace(lo, hi, n, dtype=np.float32) if n > 1
            else np.asarray([lo], dtype=np.float32) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack(grids, axis=-1)
