"""Pallas TPU kernel: fully fused train-step gradients for sine-MLP chains.

Why: the INR fitting hot loop (reference main.py:385-453) is a chain of
*narrow* matmuls — features f ~ 8..300 — over huge coordinate batches.  In
batch-major (N, f) layout XLA pads the minor dim to 128 lanes, so every
activation tensor occupies 128/f times its logical size in HBM, and the
autodiff backward re-reads all of them: at f=22 the measured step is ~6x
slower than the same FLOPs at f=128.  This kernel removes the pathology:

  * FEATURE-MAJOR layout (f, N): batch rides the 128-wide lane dimension,
    features ride sublanes — zero lane padding regardless of f;
  * the entire forward, loss, and backward run in ONE kernel with all
    activations held in VMEM scratch — HBM traffic per step is just the
    (C+2*Cout, N) input batch plus the O(f^2) weight/grad tensors;
  * weight gradients are accumulated across the batch grid in the output
    block (TPU grids iterate sequentially), so dW = h^T g becomes a
    well-shaped (f, tile) x (tile, f) contraction over lanes.

Losses: datal2 / datasmoothl1 with per-voxel weights and the weight_thres
override, exactly matching train/loss.py (reference main.py:171-197).
Supports the plain chains of models/phi.py (acts in {sine, relu, sigmoid,
none}); res/skip/encoder variants fall back to the XLA path.

Returns (loss, grads) directly — it replaces jax.value_and_grad in
train/fit.run_segment.  Verified against the XLA path in
tests/test_pallas_train.py (interpret mode on CPU, tight tolerances).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.ops.pallas_siren import (LayerSpec, _HAS_PALLAS,
                                                chain_layer_specs)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _act_fwd_fm(z, act: str, w0: float):
    """(act(z), d act(z)/dz) in one pass.

    For sine this shares ONE Cody-Waite range reduction between sin and
    cos (fast_math.fast_sincos) — the step is transcendental-bound, and
    computing the backward's cos separately (r4's first kernel) paid the
    reduction twice per activation.  'none' returns d=None (identity)."""
    if act == "sine":
        from brief_pytorch_tpu.ops.fast_math import fast_sincos
        s, c = fast_sincos(w0 * z)
        return s, w0 * c
    if act == "relu":
        return jnp.maximum(z, 0.0), (z > 0.0).astype(z.dtype)
    if act == "sigmoid":
        s = jax.nn.sigmoid(z)
        return s, s * (1.0 - s)
    if act == "none":
        return z, None
    raise ValueError(act)


def _make_train_kernel(acts: LayerSpec, n_layers: int, n_true: int,
                       tile: int, loss_name: str, beta: float,
                       weight_thres, compute_dtype,
                       mask_layers=(), dyn_thres=False):
    """Kernel refs layout:
      coords (C, tile), values (Cout, tile), weights (Cout, tile),
      then per layer: wt (fout, fin), w (fin, fout), b (fout, 1),
      then per MASKED layer (mask_layers[l]): mask (fout, 1),
      then, iff dyn_thres, thres (1, 1) SMEM,
      outputs: loss (1,1) SMEM, per layer dwt (fout, fin), db (fout, 1),
      scratch: d_l (f_l, tile) for every layer with act != 'none', then
      per HIDDEN layer h_l (f_l, tile).  The forward computes each
      activation AND its derivative together (_act_fwd_fm: for sine, one
      shared range reduction yields both sin and cos) and stores the
      derivative; the backward is then TRANSCENDENTAL-FREE — it re-reads
      d_l and h_l.  The step is transcendental-bound (RESULTS.md
      attribution): the r3 kernel recomputed act(z) in backward (3 sine
      evals/activation, 0.93x XLA), the first r4 kernel stored h but
      still paid a full cos reduction in backward (2 evals, 1.21x); this
      form pays ~1.3 evals' worth once, in the forward.

    mask_layers: per-layer bool — that layer's post-activation units are
      multiplied by a 0/1 validity mask (the block fleet's width padding,
      parallel/block_trainer.stacked_apply): masking BOTH h and its stored
      derivative keeps valid math exact (adding 0.0 terms to a float sum)
      and provably zeroes every gradient into padded units — including the
      sigmoid(0)=0.5 case that bars an unmasked kernel from padded stacks.
    dyn_thres: take weight_thres as a TRACED (1,1) input instead of the
      static python float (the fleet's thres is per-block, -inf when
      disabled; block_trainer.run_block_segment).
    """
    n_base = 3 + 3 * n_layers
    n_masks = sum(bool(m) for m in mask_layers)
    n_in = n_base + n_masks + (1 if dyn_thres else 0)
    needs_d = [acts[l][0] != "none" for l in range(n_layers)]

    def kernel(*refs):
        coords_ref = refs[0]
        values_ref = refs[1]
        wt_in_refs = [refs[3 + 3 * l] for l in range(n_layers)]
        w_in_refs = [refs[3 + 3 * l + 1] for l in range(n_layers)]
        b_in_refs = [refs[3 + 3 * l + 2] for l in range(n_layers)]
        mask_refs = {}
        j = n_base
        for l in range(n_layers):
            if mask_layers and mask_layers[l]:
                mask_refs[l] = refs[j]
                j += 1
        thres_ref = refs[j] if dyn_thres else None
        loss_ref = refs[n_in]
        dwt_refs = [refs[n_in + 1 + 2 * l] for l in range(n_layers)]
        db_refs = [refs[n_in + 1 + 2 * l + 1] for l in range(n_layers)]
        scratch = list(refs[n_in + 1 + 2 * n_layers:])
        d_refs = {}                          # layer -> derivative scratch
        for l in range(n_layers):
            if needs_d[l]:
                d_refs[l] = scratch.pop(0)
        h_refs = scratch                     # hidden layers only (n-1)

        i = pl.program_id(0)

        # ---- forward: activations + derivatives in one pass ----
        h = coords_ref[:]
        for l in range(n_layers):
            lhs = h.astype(compute_dtype) if compute_dtype else h
            rhs = wt_in_refs[l][:]
            z = jax.lax.dot_general(
                rhs.astype(lhs.dtype), lhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_in_refs[l][:]
            act, w0 = acts[l]
            h, d = _act_fwd_fm(z, act, w0)
            if l in mask_refs:
                m = mask_refs[l][:]
                h = h * m
                if d is not None:
                    d = d * m   # stored masked: backward needs no re-mask
            if needs_d[l]:
                d_refs[l][:] = d
            if l < n_layers - 1:
                h_refs[l][:] = h
        pred = h  # (Cout, tile)

        # ---- loss + dL/dpred (sum form; caller divides by N*Cout) ----
        y = values_ref[:]
        w_vox = refs[2][:]
        # mask out batch-padding lanes (global index >= n_true)
        gidx = (i * tile
                + jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1))
        valid = (gidx < n_true).astype(pred.dtype)
        if dyn_thres:
            w_eff = jnp.where(pred <= thres_ref[0, 0], 1.0, w_vox)
        elif weight_thres:
            w_eff = jnp.where(pred <= weight_thres, 1.0, w_vox)
        else:
            w_eff = w_vox
        w_eff = w_eff * valid
        e = pred - y
        if loss_name == "datal2":
            l_elem = e * e
            g = 2.0 * w_eff * e
        elif loss_name == "datasmoothl1":
            d = jnp.abs(e)
            l_elem = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
            g = w_eff * jnp.where(d < beta, e / beta, jnp.sign(e))
        else:
            raise NotImplementedError(loss_name)
        loss_tile = jnp.sum(w_eff * l_elem)

        # g currently holds dL/dpred; chain through the LAST layer's
        # activation so dW_L/db_L are gradients w.r.t. z_L (output_act
        # chains end in sine/sigmoid, not just 'none')
        if needs_d[n_layers - 1]:
            g = g * d_refs[n_layers - 1][:]
        elif (n_layers - 1) in mask_refs:
            # masked identity layer: d is the mask itself
            g = g * mask_refs[n_layers - 1][:]

        @pl.when(i == 0)
        def _():
            loss_ref[0, 0] = 0.0
            for l in range(n_layers):
                dwt_refs[l][:] = jnp.zeros_like(dwt_refs[l])
                db_refs[l][:] = jnp.zeros_like(db_refs[l])

        loss_ref[0, 0] += loss_tile

        # ---- backward (reverse chain; transcendental-free — stored
        # activations AND stored derivatives are re-read) ----
        for l in range(n_layers - 1, -1, -1):
            if l == 0:
                h_prev = coords_ref[:]
            else:
                h_prev = h_refs[l - 1][:]
            # dWt_l = g (fout, tile) contracted with h_prev (fin, tile)
            gl = g.astype(compute_dtype) if compute_dtype else g
            hp = h_prev.astype(gl.dtype)
            dwt_refs[l][:] += jax.lax.dot_general(
                gl, hp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_refs[l][:] += jnp.sum(g, axis=1, keepdims=True)
            if l > 0:
                g = jax.lax.dot_general(
                    w_in_refs[l][:].astype(gl.dtype), gl,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if needs_d[l - 1]:
                    g = g * d_refs[l - 1][:]
                elif (l - 1) in mask_refs:
                    g = g * mask_refs[l - 1][:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("acts", "n_true", "tile", "loss_name", "beta",
                              "weight_thres", "interpret", "half",
                              "mask_layers"))
def _fused_grads_padded(coords_t, values_t, weights_t, wts, ws, bs,
                        masks_t, thres_t,
                        acts: LayerSpec, n_true: int, tile: int,
                        loss_name: str, beta: float, weight_thres,
                        interpret: bool, half: bool,
                        mask_layers: tuple):
    n_layers = len(acts)
    c_in, n_pad = coords_t.shape
    grid = (n_pad // tile,)
    compute_dtype = jnp.bfloat16 if half else None
    dyn_thres = thres_t is not None

    def batch_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [batch_spec(coords_t.shape[0]),
                batch_spec(values_t.shape[0]),
                batch_spec(weights_t.shape[0])]
    flat = [coords_t, values_t, weights_t]
    for l in range(n_layers):
        flat.extend([wts[l], ws[l], bs[l]])
        in_specs.extend([full_spec(wts[l].shape), full_spec(ws[l].shape),
                         full_spec(bs[l].shape)])
    for m in masks_t:
        flat.append(m)
        in_specs.append(full_spec(m.shape))
    if dyn_thres:
        flat.append(thres_t)
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))

    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    for l in range(n_layers):
        out_shape.append(jax.ShapeDtypeStruct(wts[l].shape, jnp.float32))
        out_specs.append(full_spec(wts[l].shape))
        out_shape.append(jax.ShapeDtypeStruct(bs[l].shape, jnp.float32))
        out_specs.append(full_spec(bs[l].shape))

    # stored activation derivatives (layers with act != 'none') and
    # post-activations (hidden layers) for the transcendental-free backward
    scratch = [pltpu.VMEM((wts[l].shape[0], tile), jnp.float32)
               for l in range(n_layers) if acts[l][0] != "none"]
    scratch += [pltpu.VMEM((wts[l].shape[0], tile), jnp.float32)
                for l in range(n_layers - 1)]

    param_count = sum(w.size + b.size for w, b in zip(ws, bs))
    flops = 3 * sum(2 * tile * w.shape[0] * w.shape[1] for w in ws) * grid[0]
    outs = pl.pallas_call(
        _make_train_kernel(acts, n_layers, n_true, tile, loss_name, beta,
                           weight_thres, compute_dtype,
                           mask_layers=mask_layers, dyn_thres=dyn_thres),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(coords_t.size + values_t.size + weights_t.size
                            + 3 * param_count) * 4,
            transcendentals=grid[0] * tile * sum(
                w.shape[1] for w, a in zip(ws, acts) if a[0] == "sine")),
        interpret=interpret,
    )(*flat)

    m = float(n_true * values_t.shape[0])
    loss = outs[0][0, 0] / m
    grads = []
    for l in range(n_layers):
        dwt, db = outs[1 + 2 * l], outs[2 + 2 * l]
        grads.append({"w": dwt.T / m, "b": db[:, 0] / m})
    return loss, grads


def fused_train_grads(layers, coords_t, values_t, weights_t, acts: LayerSpec,
                      *, loss_name: str, beta: float = 0.01,
                      weight_thres=None, tile: int = DEFAULT_TILE,
                      interpret: bool = False, half: bool = False,
                      unit_masks=None, dynamic_thres=None):
    """(loss, grads) for weighted-loss fitting of a plain activation chain.

    layers: [{'w': (fin, fout), 'b': (fout,)}, ...] float32
    coords_t: (C, N); values_t/weights_t: (Cout, N)  — feature-major.
    grads matches the pytree structure of `layers`.

    unit_masks: optional per-layer sequence of None or (fout,) 0/1 arrays —
      the block fleet's padded-width validity masks (block_trainer
      stacked_apply semantics: applied to the post-activation).  Valid-unit
      math stays exact and padded units provably get zero gradients.
    dynamic_thres: optional TRACED scalar weight_thres (per-fleet-block;
      -inf disables) — mutually exclusive with the static weight_thres.
    """
    if dynamic_thres is not None and weight_thres:
        raise ValueError("pass weight_thres statically OR dynamically")
    n = coords_t.shape[1]
    tile = min(tile, _round_up(n, 512))
    # keep (d + h) scratch within a conservative VMEM budget:
    # derivative tiles for act != 'none' layers + hidden activation tiles
    rows = sum(l["w"].shape[1] * ((a[0] != "none") + (i < len(layers) - 1))
               for i, (l, a) in enumerate(zip(layers, acts)))
    while tile > 512 and rows * tile * 4 > 8 * 1024 * 1024:
        tile //= 2
    n_pad = _round_up(n, tile)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        coords_t = jnp.pad(coords_t, pad)
        values_t = jnp.pad(values_t, pad)
        weights_t = jnp.pad(weights_t, pad)
    wts = tuple(l["w"].T.astype(jnp.float32) for l in layers)
    ws = tuple(l["w"].astype(jnp.float32) for l in layers)
    bs = tuple(l["b"].astype(jnp.float32)[:, None] for l in layers)
    wt_static = None if not weight_thres else float(weight_thres)
    if unit_masks is None:
        unit_masks = [None] * len(layers)
    mask_layers = tuple(m is not None for m in unit_masks)
    masks_t = tuple(jnp.asarray(m, jnp.float32)[:, None]
                    for m in unit_masks if m is not None)
    thres_t = None if dynamic_thres is None else \
        jnp.asarray(dynamic_thres, jnp.float32).reshape(1, 1)
    loss, grads = _fused_grads_padded(
        coords_t, values_t, weights_t, wts, ws, bs, masks_t, thres_t,
        acts, n, tile, loss_name, float(beta), wt_static, interpret, half,
        mask_layers)
    return loss, {"layers": grads}


def supports_training(model, loss_name: str) -> bool:
    """Whether the fused train-grad kernel can run this phi model + loss."""
    if not _HAS_PALLAS:
        return False
    if loss_name not in ("datal2", "datasmoothl1"):
        return False
    spec = getattr(model, "spec", None)
    if spec is None:
        return False
    try:
        chain_layer_specs(spec)
        return True
    except ValueError:
        return False
