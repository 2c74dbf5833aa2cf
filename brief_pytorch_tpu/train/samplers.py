"""On-device training samplers.

TPU-first redesign of the reference samplers (main.py:38-163):
  * RandomPointSampler — per-step uniform-with-replacement voxel draws.
    Coordinates are regenerated *arithmetically* from the drawn flat indices
    (index -> (d,h,w) -> linspace value) instead of gathering a materialised
    (D*H*W, 3) grid from HBM: only the data/weight values are gathered, a
    3x cut in gather bandwidth (see SURVEY.md §7 "hard parts").
  * RandomCubeSampler — draws cube_count axis-aligned cubes from all
    stride-1 positions via vmapped dynamic_slice (no unfold materialisation:
    the reference's tensor.unfold view costs O(V * cube_volume) if copied).
  * Both are pure functions of a PRNG key, so the whole sample->forward->
    backward->update step fuses into one jitted program, and a leading
    block axis can be vmapped for the many-blocks-per-chip trainer.

Reference semantics preserved: sample counts, replacement draws, weight
tensors alongside values, channels-last layouts.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.core.coords import index_to_coords


@dataclass(frozen=True)
class RandomPointSampler:
    """Uniform random voxel batches (reference RandompointSampler,
    main.py:126-163).

    vector_len=1 (default) draws sample_size independent voxels — the
    reference's exact semantics.  vector_len=L>1 draws sample_size/L
    random CONTIGUOUS runs of L voxels instead (config
    Compress.sampler.vector_len).  When L divides the population the runs
    are L-ALIGNED: the fetch is a gather of sample_size/L ROW indices of
    a (pop/L, L*c) reshape, paying the gather's per-index cost L-times
    less often (the in-step A/B on-chip is in scripts/instep_gather_ab.py
    / RESULTS.md; the standalone-dispatch probe in gather_probe.py is
    dispatch-dominated and CANNOT rank these forms), and each voxel lies
    in exactly one row so the per-voxel marginal is EXACTLY uniform.
    When L does not divide the population, starts are drawn in
    [0, pop-L] and expanded to per-voxel indices for one flat gather
    (marginal uniform except within L-1 voxels of the flat ends).
    Samples within a run are spatially adjacent, i.e. step batches are
    correlated — an opt-in, documented divergence from the reference's
    iid draw.  The fleet path (block_trainer.run_block_segment) keeps
    the expanded form: its per-block strides are traced, so the aligned
    reshape is inexpressible there.

    Integer-dtype volumes: when data_flat is an integer array the gather
    moves the RAW stored voxels (2 bytes for uint16 instead of 4 for the
    normalized float32) and the affine normalization y = dequant_scale*x
    + dequant_offset is applied to the gathered batch — the iid gather is
    measured BYTE-bound on v5e (1.68 -> 1.01 ms/step for the narrow
    class, scripts/instep_gather_ab.py flat_u16), and the conversion is
    the same affine the host normalizer applies, so values agree with the
    pre-normalized gather to float32 rounding (~1 ulp).  train/fit.py
    enables this automatically for randompoint + integer volumes +
    affine-normalization configs.
    """
    spatial_shape: Tuple[int, ...]   # (d, h, w) or (h, w)
    coords_mode: str
    sample_size: int
    vector_len: int = 1
    dequant_scale: float = 1.0       # used only for integer data_flat
    dequant_offset: float = 0.0

    def _values(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Gathered raw batch -> normalized float32 training values."""
        if jnp.issubdtype(raw.dtype, jnp.integer):
            return (raw.astype(jnp.float32) * self.dequant_scale
                    + self.dequant_offset)
        return raw

    def _coords_dtype(self, data_flat: jnp.ndarray):
        return data_flat.dtype if jnp.issubdtype(data_flat.dtype,
                                                 jnp.floating) \
            else jnp.float32

    def sample(self, key, data_flat: jnp.ndarray, weight_flat):
        """data_flat/weight_flat: (pop, c).  Returns (coords, values, weights).

        weight_flat None means unit weights (all-ones volumes skip the
        second gather — the step is gather-bound at INR sizes)."""
        pop = data_flat.shape[0]
        L = int(self.vector_len)
        if L <= 1:
            idx = jax.random.randint(key, (self.sample_size,), 0, pop)
            vals = self._values(data_flat[idx])
            wts = weight_flat[idx] if weight_flat is not None \
                else jnp.ones_like(vals)
        elif pop % L == 0:
            # aligned rows: draw sample_size/L row indices of a
            # (pop/L, L*c) reshape — the gather pays its per-index cost
            # only n_runs times while moving the same bytes, and each
            # voxel lies in exactly one row so the per-voxel marginal is
            # EXACTLY uniform
            c = data_flat.shape[1]
            n_runs = -(-self.sample_size // L)
            r = jax.random.randint(key, (n_runs,), 0, pop // L)
            idx = ((r[:, None] * L + jnp.arange(L)[None, :])
                   .reshape(-1)[:self.sample_size])
            row_take = lambda a: (a.reshape(pop // L, L * c)[r]
                                  .reshape(-1, c)[:self.sample_size])
            vals = self._values(row_take(data_flat))
            wts = row_take(weight_flat) if weight_flat is not None \
                else jnp.ones_like(vals)
        else:
            # unaligned fallback: expanded contiguous runs, one flat gather
            n_runs = -(-self.sample_size // L)
            starts = jax.random.randint(key, (n_runs,), 0,
                                        max(1, pop - L + 1))
            idx = ((starts[:, None] + jnp.arange(L)[None, :])
                   .reshape(-1)[:self.sample_size])
            vals = self._values(data_flat[idx])
            wts = weight_flat[idx] if weight_flat is not None \
                else jnp.ones_like(vals)
        coords = index_to_coords(idx, self.spatial_shape, self.coords_mode,
                                 self._coords_dtype(data_flat))
        return coords, vals, wts


@dataclass(frozen=True)
class RandomCubeSampler:
    """Random overlapping-cube batches (reference RandomCubeSampler,
    main.py:38-125).  Cubes are drawn from every stride-1 position."""
    spatial_shape: Tuple[int, ...]
    coords_mode: str
    cube_count: int
    cube_len: Tuple[int, ...]

    def __post_init__(self):
        clipped = tuple(min(c, s) for c, s in zip(self.cube_len, self.spatial_shape))
        object.__setattr__(self, "cube_len", clipped)

    def sample(self, key, data: jnp.ndarray, weight: jnp.ndarray):
        """data/weight: (*spatial_shape, c).  Returns flattened
        (coords, values, weights) of cube_count * prod(cube_len) voxels."""
        ndim = len(self.spatial_shape)
        maxs = jnp.asarray([s - c + 1 for s, c in
                            zip(self.spatial_shape, self.cube_len)])
        corners = jax.random.randint(key, (self.cube_count, ndim),
                                     jnp.zeros((ndim,), jnp.int32), maxs)

        def one(corner):
            start = tuple(corner[i] for i in range(ndim)) + (0,)
            sizes = tuple(self.cube_len) + (data.shape[-1],)
            vals = jax.lax.dynamic_slice(data, start, sizes)
            wts = jax.lax.dynamic_slice(weight, start, sizes) \
                if weight is not None else jnp.ones_like(vals)
            # cube-local flat index -> global flat index -> coords
            local = jnp.arange(math.prod(self.cube_len))
            axes = []
            rem = local
            for L in reversed(self.cube_len):
                axes.append(rem % L)
                rem = rem // L
            axes = axes[::-1]
            flat_global = jnp.zeros_like(local)
            stride = 1
            strides = []
            for s in reversed(self.spatial_shape):
                strides.append(stride)
                stride *= s
            strides = strides[::-1]
            for i in range(ndim):
                flat_global = flat_global + (axes[i] + corner[i]) * strides[i]
            coords = index_to_coords(flat_global, self.spatial_shape,
                                     self.coords_mode, data.dtype)
            c = data.shape[-1]
            return coords, vals.reshape(-1, c), wts.reshape(-1, c)

        coords, vals, wts = jax.vmap(one)(corners)
        c = data.shape[-1]
        return (coords.reshape(-1, ndim), vals.reshape(-1, c), wts.reshape(-1, c))


def cube_size_guard(sampler_name: str, data_size: int, cube_voxels: int,
                    limit: int = 80 * 80 * 80) -> str:
    """Force randompoint when a cube exceeds the VMEM-friendly limit
    (reference main.py:332-334)."""
    if sampler_name == "randomcube" and min(data_size, cube_voxels) > limit:
        return "randompoint"
    return sampler_name
