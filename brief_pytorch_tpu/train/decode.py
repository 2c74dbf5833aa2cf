"""Dense grid inference (decompression).

TPU-first redesign of reference reconstruct_flattened (utils/misc.py:59-92):
instead of a host loop gathering slices of a materialised coordinate grid,
the whole decode is ONE jitted program — a lax.scan over slabs whose
coordinates are regenerated on-device from iota (no HBM-resident grid, no
host round-trips per slab).  Slab size is padded to a lane-friendly multiple
of 128 so every matmul tiles cleanly onto the MXU.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brief_pytorch_tpu.core.coords import index_to_coords


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("apply_fn", "spatial_shape", "data_channel",
                                   "slab", "coords_mode", "compute_dtype"))
def _decode_scan(params, apply_fn, spatial_shape: Tuple[int, ...],
                 data_channel: int, slab: int, coords_mode: str,
                 compute_dtype):
    pop = int(np.prod(spatial_shape))
    n_slabs = math.ceil(pop / slab)

    def body(_, i):
        idx = i * slab + jnp.arange(slab)
        idx = jnp.minimum(idx, pop - 1)  # clamp tail padding
        coords = index_to_coords(idx, spatial_shape, coords_mode)
        vals = apply_fn(params, coords,
                        compute_dtype=compute_dtype)
        return None, vals

    _, out = jax.lax.scan(body, None, jnp.arange(n_slabs))
    return out.reshape(n_slabs * slab, data_channel)[:pop]


def reconstruct_flattened(apply_fn: Callable, params, data_shape: Sequence[int],
                          sample_size: int = 10000, coords_mode: str = "n11",
                          half: bool = False, model=None) -> np.ndarray:
    """Evaluate φ over the full voxel grid; returns (*spatial, c) float32.

    data_shape: (*spatial, data_channel) as stored in sideinfos.
    sample_size bounds per-slab memory like the reference's Decompress
    sample_size (opt yaml), but is rounded up to a multiple of 128.

    When `model` is given, the chain is supported, and we are on TPU, the
    decode runs through the feature-major fused grid kernel
    (ops/pallas_decode.py — measured 1723 Mvox/s at the 256^3 f=22
    contract vs 1550 XLA / 248 batch-major Pallas; half decode keeps the
    bf16 XLA chain for parity with the half training numerics).
    """
    *spatial, c = [int(s) for s in data_shape]
    if (model is not None and not half
            and _use_decode_kernel(model, spatial)):
        from brief_pytorch_tpu.ops import pallas_decode
        flat = pallas_decode.decode_volume(model, params, spatial,
                                           coords_mode)
        return np.asarray(flat, dtype=np.float32).reshape(*spatial, c)
    slab = max(128, _round_up(min(sample_size, int(np.prod(spatial))), 128))
    compute_dtype = jnp.bfloat16 if half else None
    flat = _decode_scan(params, apply_fn, tuple(spatial), c, slab,
                        coords_mode, compute_dtype)
    return np.asarray(flat, dtype=np.float32).reshape(*spatial, c)


def _use_decode_kernel(model, spatial) -> bool:
    """TPU + supported chain + >=2 spatial axes (see pallas_decode)."""
    try:
        from brief_pytorch_tpu.ops import pallas_decode
        return (jax.devices()[0].platform == "tpu"
                and pallas_decode.supports(model, spatial))
    except Exception:
        return False


def fused_apply_or(model, default_apply: Callable, use_pallas: bool = True
                   ) -> Callable:
    """Return the batch-major Pallas fused-chain apply for `model` when it
    is supported and requested, else `default_apply` (ops/pallas_siren.py).

    NO LONGER the decode default: dispatch-amortized measurement
    (scripts/decode_bench2.py, r5) showed the batch-major chain decodes
    6x SLOWER than plain XLA at the contract shape (248 vs 1550 Mvox/s —
    the (N, f) layout pads f=22 to 128 lanes).  Grid decodes now route
    through ops/pallas_decode via reconstruct_flattened(model=...); this
    helper remains for explicit batch-major use and its tests."""
    if not use_pallas:
        return default_apply
    try:
        from brief_pytorch_tpu.ops import pallas_siren
        # pltpu kernels lower only on TPU backends; a GPU backend would
        # pass an import check but crash at trace time
        if pallas_siren.supports(model) and \
                jax.devices()[0].platform == "tpu":
            return pallas_siren.make_fused_apply(model)
    except Exception:
        pass
    return default_apply
