"""Pallas TPU kernel: fused feature-major grid decode for activation chains.

Why: decompression evaluates the trained chain over EVERY voxel of the
volume (reference main.py:270-297 via utils/misc.py:59-92 — the second hot
path after training).  Round 5's on-chip measurements
(scripts/decode_bench2.py — repetitions INSIDE one dispatch; every earlier
decode number was ~24 ms/dispatch tunnel-latency-contaminated) found the
shipped decode genuinely pathological:

  * the batch-major fused forward (ops/pallas_siren.py, (N, f) tiles) runs
    the 256^3 f=22 contract decode at 248 Mvox/s vs plain XLA's
    1550 Mvox/s — 6x SLOWER: at f=22 the minor dimension pads to 128
    lanes, wasting 128/22 of every VPU sine tile — the pathology the train
    kernel (ops/pallas_train.py) documents and avoids with FEATURE-MAJOR
    (f, N) layout.

This kernel applies the train kernel's layout lesson to the forward-only
grid decode, and removes per-voxel flat-index arithmetic besides:

  * FEATURE-MAJOR layout: the voxel batch rides the 128-wide lane
    dimension, features ride sublanes — zero lane padding at any width;
  * DIVISION-FREE coordinates: the grid is (lead_axis, plane_tiles).
    Coordinates of the plane axes (all but the first) are precomputed by
    XLA as broadcasted linspaces — pure iota arithmetic, no flattening
    div/mod — into a small (C-1, plane) tensor streamed in per tile; the
    lead-axis coordinate is affine in `program_id(0)`.  No integer
    division executes anywhere, on either side.

HBM traffic per tile is the (C-1, tile) plane-coordinate block plus the
(Cout, tile) output block plus the resident O(f^2) weights.  The SIRENPos
encoder's param-free warp (sin(2*pi/T_i * x_i), reference
Networks.py:19-30) folds into the precompute (plane axes) and the kernel
(lead axis).  Supported chains match the train kernel: plain entries,
acts in {sine, relu, sigmoid, none}; float32 (optionally bf16 matmul
inputs via half).  Verified against the jnp chain in
tests/test_pallas_decode.py (interpret mode on CPU).

Measured (v5e, 256^3, f=22 SIREN, scripts/decode_bench2.py, 20 in-dispatch
reps): 1723 Mvox/s at tile=65536 vs XLA 1550 / batch-major Pallas 248;
tile sweep plateaus 32k-128k.  The kernel's own no-sine floor is
4510 Mvox/s — like the train step, the decode is fast_sin-bound, not
memory- or layout-bound, so this is within ~11% of the practical ceiling
unless the sine itself gets cheaper.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brief_pytorch_tpu.core.coords import axis_linspace, parse_coords_mode
from brief_pytorch_tpu.ops.pallas_siren import (LayerSpec, _HAS_PALLAS,
                                                _apply_act,
                                                chain_layer_specs)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# measured plateau (scripts/decode_bench2.py): 32k-128k voxel tiles are
# within 1% of each other at f=22; wider chains clamp below via the VMEM
# budget in fused_decode_grid.
DEFAULT_TILE = 65536
_VMEM_TILE_BUDGET = 8 << 20  # bytes for one (width, tile) f32 activation


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_decode_kernel(acts: LayerSpec, n_layers: int, lead_n: int,
                        lo: float, hi: float, compute_dtype, enc_period0):
    """Kernel refs: plane (C-1, tile), per layer wt (fout, fin), b (fout, 1);
    out (Cout, 1, tile).

    The lead-axis coordinate is lo + program_id(0) * step — affine in the
    grid position, no flat-index arithmetic.  enc_period0: None for plain
    chains, else the SIRENPos period of the lead axis (plane axes are
    warped in the XLA precompute).
    """
    step = 0.0 if lead_n == 1 else (hi - lo) / (lead_n - 1)

    def kernel(plane_ref, *refs):
        wt_refs = [refs[2 * l] for l in range(n_layers)]
        b_refs = [refs[2 * l + 1] for l in range(n_layers)]
        out_ref = refs[2 * n_layers]

        i = pl.program_id(0)
        tile = plane_ref.shape[1]
        z = jnp.float32(lo) + i.astype(jnp.float32) * jnp.float32(step)
        if enc_period0 is not None:
            from brief_pytorch_tpu.ops.fast_math import fast_sin
            z = fast_sin(jnp.float32(2.0 * math.pi / enc_period0) * z)
        lead_row = jnp.full((1, tile), z, jnp.float32)
        h = jnp.concatenate([lead_row, plane_ref[:]], axis=0)  # (C, tile)

        for l in range(n_layers):
            lhs = h.astype(compute_dtype) if compute_dtype else h
            zl = jax.lax.dot_general(
                wt_refs[l][:].astype(lhs.dtype), lhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_refs[l][:]
            act, w0 = acts[l]
            h = _apply_act(zl, act, w0)
        out_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("spatial", "mode", "plane_pad",
                                             "enc_periods"))
def _plane_coords(spatial: Tuple[int, ...], mode: str, plane_pad: int,
                  enc_periods) -> jnp.ndarray:
    """(C-1, plane_pad) coordinates of spatial[1:], flattened row-major.

    Built from broadcasted per-axis linspaces — iota arithmetic only, no
    flat-index division.  Padding lanes repeat the last voxel (their
    outputs are sliced away; edge values keep the chain's math finite).
    """
    rest = spatial[1:]
    plane = int(np.prod(rest))
    comps = []
    for axis, n in enumerate(rest):
        v = axis_linspace(n, mode)
        if enc_periods is not None:
            from brief_pytorch_tpu.ops.fast_math import fast_sin
            v = fast_sin((2.0 * math.pi / enc_periods[axis + 1]) * v)
        shape = [1] * len(rest)
        shape[axis] = n
        comps.append(jnp.broadcast_to(v.reshape(shape), rest).reshape(plane))
    out = jnp.stack(comps, axis=0)
    if plane_pad != plane:
        out = jnp.pad(out, ((0, 0), (0, plane_pad - plane)), mode="edge")
    return out


@functools.partial(
    jax.jit, static_argnames=("acts", "spatial", "mode", "tile",
                              "interpret", "half", "enc_periods"))
def _decode_grid_padded(wts, bs, acts: LayerSpec, spatial: Tuple[int, ...],
                        mode: str, tile: int, interpret: bool, half: bool,
                        enc_periods):
    lo, hi = parse_coords_mode(mode)
    n_layers = len(acts)
    lead_n = spatial[0]
    plane = int(np.prod(spatial[1:]))
    plane_pad = _round_up(plane, tile)
    grid = (lead_n, plane_pad // tile)
    cout = wts[-1].shape[0]
    compute_dtype = jnp.bfloat16 if half else None

    plane_t = _plane_coords(spatial, mode, plane_pad, enc_periods)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((plane_t.shape[0], tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)]
    flat = [plane_t]
    for l in range(n_layers):
        flat.extend([wts[l], bs[l]])
        in_specs.extend([full_spec(wts[l].shape), full_spec(bs[l].shape)])

    flops = sum(2 * tile * w.shape[0] * w.shape[1] for w in wts) \
        * grid[0] * grid[1]
    n_ptiles = plane_pad // tile
    out = pl.pallas_call(
        _make_decode_kernel(acts, n_layers, lead_n, lo, hi, compute_dtype,
                            None if enc_periods is None else enc_periods[0]),
        grid=grid,
        in_specs=in_specs,
        # the output is logically (cout, lead, plane_pad) but kept 2-D —
        # Mosaic requires the 2nd-minor block dim be 8-divisible or full —
        # so each (i, j) tile lands at flat block column i*n_ptiles + j
        out_specs=pl.BlockSpec((cout, tile),
                               lambda i, j: (0, i * n_ptiles + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, lead_n * plane_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(cout * lead_n * plane_pad
                            + lead_n * plane_pad * plane_t.shape[0]) * 4,
            transcendentals=grid[0] * grid[1] * tile * sum(
                w.shape[0] for w, a in zip(wts, acts) if a[0] == "sine")),
        interpret=interpret,
    )(*flat)
    return out.reshape(cout, lead_n, plane_pad)[:, :, :plane]


def fused_decode_grid(layers, spatial: Sequence[int], acts: LayerSpec,
                      mode: str = "n11", *, tile: int = DEFAULT_TILE,
                      interpret: bool = False, half: bool = False,
                      enc_periods=None) -> jnp.ndarray:
    """Evaluate an activation chain over the full voxel grid.

    layers: [{'w': (fin, fout), 'b': (fout,)}, ...] float32.
    Returns (prod(spatial), Cout) float32 — row-major voxel order, the
    same contract as decode._decode_scan.
    """
    spatial = tuple(int(s) for s in spatial)
    if len(spatial) < 2:
        raise ValueError("fused decode needs >= 2 spatial axes")
    plane = int(np.prod(spatial[1:]))
    maxw = max(max(l["w"].shape) for l in layers)
    tile = min(tile, max(128, _VMEM_TILE_BUDGET // (4 * maxw) // 128 * 128))
    tile = max(128, min(tile, _round_up(plane, 128)))
    wts = tuple(l["w"].T.astype(jnp.float32) for l in layers)
    bs = tuple(l["b"].astype(jnp.float32)[:, None] for l in layers)
    out = _decode_grid_padded(wts, bs, acts, spatial, mode, tile,
                              interpret, half,
                              None if enc_periods is None
                              else tuple(float(t) for t in enc_periods))
    cout = out.shape[0]
    pop = int(np.prod(spatial))
    return out.reshape(cout, pop).T


# all weights ride in VMEM as full blocks; chains whose summed weight
# bytes exceed this fall back to the XLA scan instead of failing Mosaic
# VMEM allocation at compile time (v5e VMEM is 128 MB; leave room for
# double-buffered activation tiles)
_VMEM_WEIGHT_BUDGET = 32 << 20


def supports(model, spatial=None) -> bool:
    """Whether the fused decode kernel can run this phi model (same chain
    constraints as the train kernel; SIRENPos folds into coord-gen;
    weights must fit the VMEM residency budget)."""
    if not _HAS_PALLAS:
        return False
    if spatial is not None and len(spatial) < 2:
        return False
    spec = getattr(model, "spec", None)
    if spec is None:
        return False
    try:
        chain_layer_specs(spec)
    except ValueError:
        return False
    w_bytes = sum(4 * e.fan_in * e.fan_out for e in spec.entries)
    return w_bytes <= _VMEM_WEIGHT_BUDGET


def decode_volume(model, params, spatial: Sequence[int], mode: str,
                  *, tile: int = DEFAULT_TILE, interpret: bool = False,
                  half: bool = False) -> jnp.ndarray:
    """(prod(spatial), Cout) decode of a supported phi model."""
    spec = model.spec
    acts = chain_layer_specs(spec)
    enc_periods = tuple(spec.encoder_cfg) if spec.encoder == "sirenpos" \
        else None
    return fused_decode_grid(params["layers"], spatial, acts, mode,
                             tile=tile, interpret=interpret, half=half,
                             enc_periods=enc_periods)
