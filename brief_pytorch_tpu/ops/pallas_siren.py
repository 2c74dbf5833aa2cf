"""Pallas TPU kernel: fused sine-MLP (SIREN-family) chain forward.

The INR hot path is a chain of small matmuls with sine activations over
huge coordinate batches (reference hot loops: training main.py:385-453,
grid decode utils/misc.py:59-92).  XLA already fuses the elementwise sine
into the matmul epilogue, but it materialises every layer's activations in
HBM between layers.  This kernel keeps the whole chain in VMEM: the full
weight stack is resident (a few MB for f<=512), the coordinate batch is
tiled over a 1-D grid, and each tile runs matmul->sine->...->matmul without
touching HBM — HBM traffic drops from O(N*f*L) to O(N*(C+O)) + weights.

Training integrates via jax.custom_vjp: forward runs the fused kernel; the
backward pass recomputes activations with the jnp chain under XLA autodiff
(rematerialisation trades FLOPs for the HBM the fused forward saved).

Constraints: plain chains only (no skip/encoder/res — those fall back to
the jnp path), float32, last-layer linear.  Verified against the jnp chain
in tests/test_pallas.py; runs in interpret mode on CPU for tests.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    pl = pltpu = None
    _HAS_PALLAS = False

# (act, w0) per layer; act in {'sine', 'relu', 'sigmoid', 'none'}
LayerSpec = Tuple[Tuple[str, float], ...]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def chain_layer_specs(spec) -> LayerSpec:
    """Extract the per-linear (act, w0) tuple from a models.phi ChainSpec;
    raises for structures the kernel does not support.

    'sirenpos' is allowed: its encoder is a param-free elementwise warp
    (sin(2*pi/T_i * x_i), reference Networks.py:19-30) applied to the
    coordinates BEFORE the kernel — the chain itself stays plain."""
    if spec.skip_entry != -1 or spec.encoder not in ("none", "sirenpos"):
        raise ValueError("fused kernel supports plain chains only")
    out = []
    for e in spec.entries:
        if e.kind != "plain":
            raise ValueError("res chains unsupported in fused kernel")
        out.append((e.act, float(e.w0)))
    return tuple(out)


def _apply_act(h, act: str, w0: float):
    if act == "sine":
        # fast path lowers through Mosaic too (see ops/fast_math.py)
        from brief_pytorch_tpu.ops.fast_math import fast_sin
        return fast_sin(w0 * h)
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "sigmoid":
        return jax.nn.sigmoid(h)
    if act == "none":
        return h
    raise ValueError(act)


def _make_kernel(acts: LayerSpec, n_layers: int):
    def kernel(coords_ref, *refs):
        # refs: w0, b0, w1, b1, ..., out_ref
        out_ref = refs[-1]
        h = coords_ref[:]
        for l in range(n_layers):
            w = refs[2 * l][:]
            b = refs[2 * l + 1][:]
            z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            act, w0 = acts[l]
            h = _apply_act(z, act, w0)
        out_ref[:] = h
    return kernel


@functools.partial(jax.jit, static_argnames=("acts", "tile", "interpret"))
def _fused_forward(coords, weights_and_biases, acts: LayerSpec,
                   tile: int, interpret: bool):
    """coords: (N, C) with N % tile == 0; weights (in,out) f32."""
    n, c = coords.shape
    n_layers = len(acts)
    out_dim = weights_and_biases[-2].shape[1]
    grid = (n // tile,)

    in_specs = [pl.BlockSpec((tile, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    flat = []
    for l in range(n_layers):
        w, b = weights_and_biases[2 * l], weights_and_biases[2 * l + 1]
        flat.extend([w, b])
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    flops = sum(2 * tile * w.shape[0] * w.shape[1]
                for w in weights_and_biases[::2]) * grid[0]
    return pl.pallas_call(
        _make_kernel(acts, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=coords.size * 4,
            transcendentals=grid[0] * tile * sum(
                w.shape[1] for w in weights_and_biases[::2])),
        interpret=interpret,
    )(coords, *flat)


def _jnp_chain(layers, coords, acts: LayerSpec):
    h = coords
    for l, (act, w0) in enumerate(acts):
        z = jnp.dot(h, layers[l]["w"], preferred_element_type=jnp.float32) \
            + layers[l]["b"]
        h = _apply_act(z, act, w0)
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_chain_apply(layers, coords, acts: LayerSpec, tile: int = 512,
                      interpret: bool = False):
    """Fused forward with autodiff backward (rematerialised jnp chain).

    layers: [{'w': (in,out), 'b': (out,)}, ...] float32;
    coords: (N, C) float32 — N is padded internally to a tile multiple.
    """
    return _padded_forward(layers, coords, acts, tile, interpret)


def _padded_forward(layers, coords, acts, tile, interpret):
    n = coords.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        coords = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    wb = []
    for l in layers:
        wb.extend([l["w"].astype(jnp.float32), l["b"].astype(jnp.float32)])
    # bias rows must be >= 1 lane-tile 2-D for VMEM: reshape (out,) -> (1,out)
    wb = [x if x.ndim == 2 else x[None, :] for x in wb]
    out = _fused_forward(coords, tuple(wb), acts, tile, interpret)
    return out[:n]


def _fwd(layers, coords, acts, tile, interpret):
    return _padded_forward(layers, coords, acts, tile, interpret), \
        (layers, coords)


def _bwd(acts, tile, interpret, res, g):
    layers, coords = res
    _, vjp = jax.vjp(lambda ls, cs: _jnp_chain(ls, cs, acts), layers, coords)
    return vjp(g)


fused_chain_apply.defvjp(_fwd, _bwd)


def supports(model) -> bool:
    """Whether the fused kernel can run this phi model."""
    if not _HAS_PALLAS:
        return False
    spec = getattr(model, "spec", None)
    if spec is None:
        return False
    try:
        chain_layer_specs(spec)
        return True
    except ValueError:
        return False


def make_fused_apply(model, interpret: bool = False, tile: int = 512):
    """An apply(params, coords, compute_dtype=None) drop-in using the fused
    kernel (compute_dtype ignored: kernel is f32-in/f32-acc)."""
    acts = chain_layer_specs(model.spec)
    pre = make_pre_encode(model.spec)

    def apply(params, coords, compute_dtype=None):
        return fused_chain_apply(params["layers"], pre(coords), acts, tile,
                                 interpret)
    return apply


def make_pre_encode(spec):
    """Coordinate pre-transform applied outside the kernel (identity for
    plain chains; the param-free SIRENPos warp otherwise)."""
    if spec.encoder == "sirenpos":
        import numpy as np
        T = tuple(spec.encoder_cfg)

        def pre(coords):
            from brief_pytorch_tpu.ops.fast_math import fast_sin
            t = jnp.asarray(T, coords.dtype)
            return fast_sin((2.0 * np.pi / t) * coords)
        return pre
    return lambda coords: coords
