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
    Compress.sampler.vector_len): run starts are drawn in [0, pop-L] and
    expanded to per-voxel indices, and the value fetch stays ONE flat
    gather of sample_size contiguous-in-runs indices.  On-chip probe with
    a fresh key per dispatch (scripts/gather_probe.py, 100k voxels of a
    256^3 volume): expanded-runs flat gather 2.80 ms vs iid flat 3.55 ms
    vs aligned-row reshape 3.25 ms vs vmapped dynamic_slice 4.47 ms — so
    the expanded form shipped here is the measured-fastest AND the only
    form expressible in the fleet path (traced per-block strides, see
    block_trainer.run_block_segment).  The per-voxel marginal is uniform
    except within L-1 voxels of the flat array's ends (starts are clamped
    to [0, pop-L]); samples within a run are spatially adjacent, i.e.
    step batches are correlated — an opt-in, documented divergence from
    the reference's iid draw.
    """
    spatial_shape: Tuple[int, ...]   # (d, h, w) or (h, w)
    coords_mode: str
    sample_size: int
    vector_len: int = 1

    def sample(self, key, data_flat: jnp.ndarray, weight_flat):
        """data_flat/weight_flat: (pop, c).  Returns (coords, values, weights).

        weight_flat None means unit weights (all-ones volumes skip the
        second gather — the step is gather-bound at INR sizes)."""
        pop = data_flat.shape[0]
        L = int(self.vector_len)
        if L <= 1:
            idx = jax.random.randint(key, (self.sample_size,), 0, pop)
            vals = data_flat[idx]
            wts = weight_flat[idx] if weight_flat is not None \
                else jnp.ones_like(vals)
        else:
            n_runs = -(-self.sample_size // L)
            starts = jax.random.randint(key, (n_runs,), 0,
                                        max(1, pop - L + 1))
            idx = ((starts[:, None] + jnp.arange(L)[None, :])
                   .reshape(-1)[:self.sample_size])
            vals = data_flat[idx]
            wts = weight_flat[idx] if weight_flat is not None \
                else jnp.ones_like(vals)
        coords = index_to_coords(idx, self.spatial_shape, self.coords_mode,
                                 data_flat.dtype)
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
