"""Many-blocks-per-chip training: the TPU-native replacement for the
reference's one-process-per-block scheduler.

The reference trains each block of a divided volume in its own OS process,
greedily packed onto GPUs by nvidia-smi polling (main.py:547-580,
TasksManager.py:222-251).  On TPU we instead:

  1. stack B blocks' networks into leading-axis parameter arrays,
     padding heterogeneous widths (from alloc_param) up to the bucket
     maximum with *masked units* — padded units are zero-initialised and
     provably receive zero gradient (their activations are masked to zero,
     so every gradient path through them vanishes), keeping the active
     sub-network's math bit-identical to unpadded training;
  2. vmap the whole sample->forward->loss->backward->update step over the
     block axis — per-step compute becomes large batched matmuls that tile
     onto the MXU;
  3. shard the block axis across the device mesh (parallel/mesh.py): blocks
     are independent, so the partitioned program has NO collectives — ICI
     carries zero traffic and scaling is linear by construction;
  4. pad block voxel counts to a common Vmax and sample with per-block
     population bounds, so the volume heterogeneity from adaptive blocking
     never breaks SPMD.

Every registered φ family trains in a DivideTask (reference children just
call init_phi on any registry entry, main.py:277-280 / Networks.py:795-802):
  * all CHAIN families — plain SIREN variants, res-SIREN (HalfResidual,
    Networks.py:209-214), NeRF (skip concat + positional encoding,
    Networks.py:84-136), FFN (Fourier features, Networks.py:138-207),
    SIRENPos — stack into vmapped masked buckets;
  * MFN families (MFNFourier/MFNGabor, Networks.py:648-794) have a
    per-block parameter *structure* (multiplicative filters), so they train
    on the SOLO path: one jitted program per block (train/fit.run_segment),
    advanced in checkpoint lockstep with the stacked buckets.

Per-block semantics preserved from the reference children (temp_main.py):
per-block normalisation (own min/max), per-block byte budgets and the
degradation chain, per-block loss means, per-block Adamax + MultiStepLR,
and the per-child RandomCubeSampler (main.py:38-125) — cube draws are
bit-identical to this repo's RandomCubeSampler (same per-axis randint
corner draw, same voxel order) and distributionally equivalent to the
reference's flat randint over the unfolded cube population; they run as
flat-index gathers so they vmap over heterogeneous block shapes.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from brief_pytorch_tpu.core.coords import (axes_to_coords, flat_to_axes24,
                                           index_to_coords_dynamic,
                                           row_major_strides)
from brief_pytorch_tpu.models.phi import (ChainSpec, _ChainModel, _act,
                                          _encode)
from brief_pytorch_tpu.parallel.mesh import (all_addressable, block_sharding,
                                             block_submesh, host_to_global,
                                             make_mesh)
from brief_pytorch_tpu.train.loss import make_loss
from brief_pytorch_tpu.train.optim import make_optimizer
from brief_pytorch_tpu.train.samplers import (RandomCubeSampler,
                                              RandomPointSampler,
                                              cube_size_guard)


# --------------------------------------------------------------------------
# stacked masked chains
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class StackedChainSpec:
    """Common (padded) architecture of a bucket of chain networks.

    entries: per logical entry (kind, act, w0) — kind 'plain' consumes one
    linear from `dims`, kind 'res' (HalfResidual) consumes two.
    dims: padded (in, out) per LINEAR, in entry order.
    """
    entries: Tuple[Tuple[str, str, float], ...]
    dims: Tuple[Tuple[int, int], ...]
    skip_entry: int = -1
    encoder: str = "none"     # 'none' | 'sirenpos' | 'nerf' | 'ffn'
    encoder_cfg: Tuple = ()

    @property
    def n_entries(self) -> int:
        return len(self.entries)


def _linear_dims(spec: ChainSpec) -> List[Tuple[int, int]]:
    """(fan_in, fan_out) of every linear in chain order (res entries own
    two linears, reference Networks.py:209-214, 251-257)."""
    out = []
    for e in spec.entries:
        out.append((e.fan_in, e.fan_out))
        if e.kind == "res":
            out.append((e.fan_out, e.fan_out))
    return out


def _stack_signature(spec: ChainSpec) -> tuple:
    """Everything two chain specs must share to be stack-padded together
    (only widths may differ)."""
    return (tuple((e.kind, e.act, e.w0, e.w_init) for e in spec.entries),
            spec.skip_entry, spec.encoder, tuple(spec.encoder_cfg),
            # the encoder output width == first-entry fan_in must be equal
            # across the bucket or the skip concat / encoding misaligns
            # (it is config-level, but e.g. FFN embsize could differ)
            spec.entries[0].fan_in)


def build_stacked(models: Sequence[_ChainModel], key,
                  init_layers_list: Optional[Sequence] = None) -> Tuple[
        StackedChainSpec, List[Dict], List[jnp.ndarray], Dict]:
    """Stack B chain models (same family/topology, any widths) into padded
    leading-axis params + per-entry output masks.

    Per-block parameters are drawn with the block's own `model.init` (same
    init distributions as single-block training); init_layers_list entries
    ([{'w','b'},...] from io.modelsave.load_model, reference
    main.py:345-354) warm-start individual blocks.

    Returns (stacked_spec, params_layers, masks, enc) where
      params_layers[l] = {'w': (B, in_max, out_max), 'b': (B, out_max)}
      masks[e]         = (B, out_max_of_entry) float32 validity mask
      enc              = stacked frozen encoder params ({} unless 'ffn':
                         {'bvals': (B, embsize, c)}).
    """
    sig0 = _stack_signature(models[0].spec)
    for m in models[1:]:
        assert _stack_signature(m.spec) == sig0, \
            "bucket mixes incompatible chain topologies"
    lin_dims = [_linear_dims(m.spec) for m in models]
    nlin = len(lin_dims[0])
    B = len(models)
    dims = [(max(d[l][0] for d in lin_dims), max(d[l][1] for d in lin_dims))
            for l in range(nlin)]
    spec0 = models[0].spec
    sspec = StackedChainSpec(
        entries=tuple((e.kind, e.act, e.w0) for e in spec0.entries),
        dims=tuple(dims), skip_entry=spec0.skip_entry,
        encoder=spec0.encoder, encoder_cfg=tuple(spec0.encoder_cfg))

    per_block = []
    with _host_device():
        # per-block inits are hundreds of tiny array ops; on a remote TPU
        # each would be its own ~25 ms round-trip — run them on host CPU
        # (the stacks are device_put to the mesh afterwards anyway)
        for bi, m in enumerate(models):
            p = m.init(jax.random.fold_in(key, bi))
            warm = (init_layers_list[bi] if init_layers_list is not None
                    else None)
            if warm is not None:
                p = {**p,
                     "layers": [{k: jnp.asarray(v) for k, v in l.items()}
                                for l in warm]}
            per_block.append(p)

    params_layers = []
    for l in range(nlin):
        in_max, out_max = dims[l]
        w = np.zeros((B, in_max, out_max), np.float32)
        b = np.zeros((B, out_max), np.float32)
        for bi in range(B):
            fi, fo = lin_dims[bi][l]
            w[bi, :fi, :fo] = np.asarray(per_block[bi]["layers"][l]["w"])
            b[bi, :fo] = np.asarray(per_block[bi]["layers"][l]["b"])
        params_layers.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})

    masks = []
    li = 0
    for ei, e in enumerate(spec0.entries):
        last_lin = li + (1 if e.kind == "res" else 0)
        out_max = dims[last_lin][1]
        mk = np.zeros((B, out_max), np.float32)
        for bi, m in enumerate(models):
            mk[bi, :m.spec.entries[ei].fan_out] = 1.0
        masks.append(jnp.asarray(mk))
        li += 2 if e.kind == "res" else 1

    enc: Dict = {}
    if spec0.encoder == "ffn":
        enc = {"bvals": jnp.stack(
            [per_block[bi]["encoder"]["bvals"] for bi in range(B)])}
    return sspec, params_layers, masks, enc


def _host_device():
    """Context manager pinning small eager ops to the host CPU backend
    (no-op when only one backend exists)."""
    import contextlib
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        if cpu == jax.devices()[0]:
            return contextlib.nullcontext()
        return jax.default_device(cpu)
    except Exception:
        return contextlib.nullcontext()


def _mm(h, w, compute_dtype):
    if compute_dtype is not None:
        return jnp.dot(h.astype(compute_dtype), w.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    return jnp.dot(h, w, preferred_element_type=jnp.float32)


def stacked_apply(layers_b, masks_b, coords, spec: StackedChainSpec,
                  enc_b: Optional[Dict] = None, compute_dtype=None):
    """Forward for ONE block (call under vmap over the leading axis).

    layers_b[l]['w']: (in_max, out_max); masks_b[e]: (out_max,).
    Masking after each entry's activation zeroes padded units, which both
    keeps the active network exact (adding 0.0 terms to a float sum is
    exact) and kills every gradient path into padding.  The skip concat
    stays aligned because the encoder output width is topology-level
    (identical across the bucket) and valid hidden units are the leading
    columns of the padded block.
    """
    if spec.encoder == "ffn":
        enc_b = {"bvals": jax.lax.stop_gradient(enc_b["bvals"])}
    x = _encode(coords, spec, enc_b, compute_dtype)
    h = x
    li = 0
    n_ent = spec.n_entries
    for ei, (kind, act, w0) in enumerate(spec.entries):
        if ei == spec.skip_entry:
            h = jnp.concatenate([x, h], axis=-1)
        z = _mm(h, layers_b[li]["w"], compute_dtype) + layers_b[li]["b"]
        if kind == "plain":
            h = _act(act, w0, z)
            li += 1
        else:  # res: 0.5 * (sine(lin(sine(lin(h)))) + h)
            t = _act("sine", w0, z) * masks_b[ei]
            z2 = (_mm(t, layers_b[li + 1]["w"], compute_dtype)
                  + layers_b[li + 1]["b"])
            h = 0.5 * (_act("sine", w0, z2) + h)
            li += 2
        if ei < n_ent - 1:
            h = h * masks_b[ei]
    return h


def unstack_params(params_layers, models: Sequence[_ChainModel],
                   enc: Optional[Dict] = None):
    """Slice each block's true-width layers back out of the padded stack."""
    out = []
    for bi, m in enumerate(models):
        layers = []
        for l, (fi, fo) in enumerate(_linear_dims(m.spec)):
            layers.append({
                "w": np.asarray(params_layers[l]["w"][bi, :fi, :fo]),
                "b": np.asarray(params_layers[l]["b"][bi, :fo])})
        p = {"layers": layers}
        if enc and "bvals" in enc:
            p["encoder"] = {"bvals": np.asarray(enc["bvals"][bi])}
        out.append(p)
    return out


# --------------------------------------------------------------------------
# block batch container
# --------------------------------------------------------------------------
@dataclass
class BlockBatch:
    """B normalised blocks padded to a common flat voxel count."""
    data: jnp.ndarray          # (B, Vmax, c) float32 — or the raw integer
                               # dtype when dq_scale is set (see build)
    weight: jnp.ndarray        # (B, Vmax, c)
    valid: jnp.ndarray         # (B,) int32 true voxel counts
    shapes: jnp.ndarray        # (B, ndim) spatial extents
    vmax: int
    ndim: int
    dq_scale: object = None    # (B,) f32 per-block affine (integer stacks)
    dq_offset: object = None

    @staticmethod
    def build(blocks: List[Dict], pad_multiple: int = 1) -> "BlockBatch":
        """blocks: dicts with 'data_norm' (*spatial, c) float32 and
        'weight' of the same shape.

        When EVERY block also carries 'data_raw' (the preprocessed
        integer-dtype chunk) and 'dequant' (the per-block affine (A, B)
        with data_norm == raw*A + B, divide_runner.py), the stack is
        built in the RAW dtype — uint16 gathers move half the bytes of
        float32, which the randompoint step is measured to be bound by
        (scripts/instep_gather_ab.py) — and run_block_segment applies
        the affine to each gathered batch.

        Arrays stay HOST numpy: the trainer device_puts data onto the mesh
        itself, and the weight stack must never touch the device when the
        unit-weight fast path applies."""
        ndim = blocks[0]["data_norm"].ndim - 1
        c = blocks[0]["data_norm"].shape[-1]
        vmax = max(int(np.prod(b["data_norm"].shape[:-1])) for b in blocks)
        if pad_multiple > 1:
            vmax = ((vmax + pad_multiple - 1) // pad_multiple) * pad_multiple
        B = len(blocks)
        raw_ok = all(b.get("dequant") is not None
                     and b.get("data_raw") is not None for b in blocks)
        if raw_ok:
            raw_dtype = blocks[0]["data_raw"].dtype
            raw_ok = all(b["data_raw"].dtype == raw_dtype for b in blocks)
        dq_scale = dq_offset = None
        if raw_ok:
            data = np.zeros((B, vmax, c), raw_dtype)
            dq_scale = np.asarray([b["dequant"][0] for b in blocks],
                                  np.float32)
            dq_offset = np.asarray([b["dequant"][1] for b in blocks],
                                   np.float32)
        else:
            data = np.zeros((B, vmax, c), np.float32)
        weight = np.zeros((B, vmax, c), np.float32)
        valid = np.zeros((B,), np.int32)
        shapes = np.ones((B, ndim), np.int32)
        for i, b in enumerate(blocks):
            v = int(np.prod(b["data_norm"].shape[:-1]))
            data[i, :v] = (b["data_raw"] if raw_ok
                           else b["data_norm"]).reshape(v, c)
            weight[i, :v] = b["weight"].reshape(v, c)
            valid[i] = v
            shapes[i] = b["data_norm"].shape[:-1]
        return BlockBatch(data, weight, valid, shapes, vmax, ndim,
                          dq_scale, dq_offset)


# --------------------------------------------------------------------------
# fleet cube sampling (flat-index form of the reference RandomCubeSampler)
# --------------------------------------------------------------------------
def _cube_local_offsets(cube_len: Tuple[int, ...]) -> jnp.ndarray:
    """(prod(cube_len), ndim) local voxel offsets in row-major order — the
    exact voxel order of RandomCubeSampler's dynamic_slice + reshape."""
    grids = np.indices(cube_len)
    return jnp.asarray(grids.reshape(len(cube_len), -1).T, jnp.int32)


def cube_positions(key, shape_vec, cube_len: Tuple[int, ...],
                   cube_count: int) -> jnp.ndarray:
    """Per-axis voxel positions (cube_count, prod(cube_len), ndim) of
    cube_count random stride-1 cubes.

    shape_vec may be traced (per-vmapped-block shapes).  The corner draw is
    IDENTICAL to RandomCubeSampler.sample (same randint signature on the
    same key), so for a given key this selects exactly the same cubes in
    exactly the same order (reference main.py:38-125 semantics).  Only
    adds/multiplies follow the draw — no integer division by traced values
    (TPUs lower those to slow expansions).
    """
    ndim = len(cube_len)
    maxs = shape_vec - jnp.asarray(cube_len, shape_vec.dtype) + 1
    corners = jax.random.randint(key, (cube_count, ndim),
                                 jnp.zeros((ndim,), jnp.int32), maxs)
    offs = _cube_local_offsets(cube_len)                    # (cv, ndim)
    return corners[:, None, :] + offs[None, :, :]           # (cc, cv, ndim)


def cube_gather_indices(key, shape_vec, cube_len: Tuple[int, ...],
                        cube_count: int) -> jnp.ndarray:
    """Flat voxel indices of cube_count random stride-1 cubes (row-major
    flattening of cube_positions)."""
    pos = cube_positions(key, shape_vec, cube_len, cube_count)
    strides = row_major_strides(shape_vec)
    return jnp.sum(pos * strides[None, None, :], axis=-1).reshape(-1)


def vector_run_starts(key, shape_vec, L: int, n_runs: int) -> jnp.ndarray:
    """(n_runs, ndim) start positions for runs of L voxels contiguous along
    the LAST axis (fleet form of samplers.RandomPointSampler vector_len).

    Runs must not cross rows — the fleet's per-voxel index math is
    multiplies-only (see the NOTE in run_block_segment), and a row-crossing
    run would need a traced-divisor decomposition — so last-axis starts are
    clamped to [0, W-L].  shape_vec may be traced (per-vmapped-block)."""
    ndim = shape_vec.shape[0]
    u = jax.random.uniform(key, (n_runs, ndim))
    lim = shape_vec - jnp.asarray([0] * (ndim - 1) + [L - 1],
                                  shape_vec.dtype)
    return jnp.minimum((u * lim.astype(u.dtype)).astype(jnp.int32), lim - 1)


# --------------------------------------------------------------------------
# vmapped training
# --------------------------------------------------------------------------
def fleet_fused_supported(spec: StackedChainSpec, loss_name: str,
                          sampler_name: str, half: bool) -> bool:
    """Whether the fused Pallas train kernel (ops/pallas_train.py) can run
    a stacked bucket: plain f32 activation chains (no encoder/skip/res),
    the two kernel losses, and a sampler that yields all-valid batches
    (fullbatch needs the per-block valid-voxel mask the kernel's static
    n_true cannot express)."""
    from brief_pytorch_tpu.ops.pallas_siren import _HAS_PALLAS
    return (_HAS_PALLAS and not half
            and loss_name in ("datal2", "datasmoothl1")
            and sampler_name != "fullbatch"
            and spec.encoder == "none"
            and spec.skip_entry < 0
            and all(k == "plain" and a in ("sine", "relu", "sigmoid", "none")
                    for k, a, _ in spec.entries))


@partial(jax.jit,
         static_argnames=("spec", "tx", "loss_name", "beta", "use_thres",
                          "n_steps", "sample_size", "coords_mode", "half",
                          "sampler", "cube_count", "cube_len", "vector_len",
                          "fused"),
         donate_argnums=(0, 1))
def run_block_segment(params_layers, opt_state, masks, enc, data, weight,
                      valid, shapes, thres, key, *, spec: StackedChainSpec,
                      tx, loss_name: str, beta: float, use_thres: bool,
                      n_steps: int, sample_size: int, coords_mode: str,
                      half: bool, sampler: str = "randompoint",
                      cube_count: int = 1, cube_len: Tuple[int, ...] = (),
                      vector_len: int = 1, dq_scale=None, dq_offset=None,
                      fused=False):
    """n_steps of simultaneous training for all B blocks (one scan).

    Each step vmaps sample+forward+backward+update over the block axis;
    blocks are independent so the sharded program has no collectives.
    sampler: 'randompoint' | 'randomcube' (true sub-cube draws, reference
    main.py:38-125) | 'fullbatch' (exact when the clipped cube covers the
    whole block for every block in the bucket).
    fused: False (XLA autodiff over stacked_apply) | True (the fused
    Pallas train kernel vmapped over the block axis — pallas batching
    adds a grid dimension; padding-width masks ride into the kernel as
    unit_masks, per-block thres as its traced input) | "interpret" (the
    kernel in interpreter mode, for CPU tests).  Callers gate with
    fleet_fused_supported; the per-block draw is identical in both
    paths.
    thres: (B,) per-block normalized weight_thres — each block normalizes
    the config threshold with its OWN min/max (reference: each child runs
    main.py:380-383 on its own chunk), so it cannot be a shared scalar.
    data may be an INTEGER stack (the raw volume dtype): gathers then move
    half the bytes (measured byte-bound, scripts/instep_gather_ab.py) and
    the per-block affine normalization dq_scale/dq_offset ((B,) float32,
    from BlockBatch.build) is applied to the gathered batch — same math
    as the solo sampler's integer path (train/samplers.py).
    Returns (params_layers, opt_state, losses (n_steps, B)).
    """
    if fused:
        # spec/sampler/loss/half are all static jit args, so misuse fails at
        # trace time instead of training silently wrong: 'fullbatch' needs a
        # per-block valid mask the kernel cannot express, and a non-plain
        # chain would mis-zip layers against spec.entries inside
        # fused_train_grads (advisor r4).
        if not fleet_fused_supported(spec, loss_name, sampler, half):
            raise ValueError(
                "run_block_segment(fused=True) requires a "
                "fleet_fused_supported bucket (plain f32 chain, kernel "
                f"loss, sampler != 'fullbatch'); got sampler={sampler!r} "
                f"loss={loss_name!r} half={half} spec={spec.entries!r} "
                f"encoder={spec.encoder!r} skip={spec.skip_entry}")
    loss_fn = make_loss(loss_name, beta)
    compute_dtype = jnp.bfloat16 if half else None
    B = data.shape[0]
    integer_data = jnp.issubdtype(data.dtype, jnp.integer)
    if dq_scale is None:
        dq_scale = jnp.ones((B,), jnp.float32)
        dq_offset = jnp.zeros((B,), jnp.float32)

    # NOTE on index math: block shapes are traced (vmapped), and TPU has no
    # integer-divide hardware — `//`/`%` by a traced value lowers to a slow
    # expansion (measured 45 ms/step vs ~1 ms).  Every per-voxel path below
    # therefore works in per-axis indices with multiplies only.
    def draw(data_b, weight_b, valid_b, shape_b, dq_a, dq_b, key_b):
        """ONE block's per-step batch: (coords, vals, wts, sample_valid).
        Shared verbatim by the XLA and fused paths (vmapped over blocks)."""
        ndim = shapes.shape[1]
        # integer stacks: dequantize the gathered batch to normalized f32
        # (trace-time branch — dtype is static under jit)
        dq = (lambda v: v.astype(jnp.float32) * dq_a + dq_b) \
            if integer_data else (lambda v: v)
        if sampler == "fullbatch":
            idx = jnp.arange(data.shape[1])
            vals = dq(data_b)
            wts = weight_b if weight is not None else jnp.ones_like(vals)
            sample_valid = (idx < valid_b)[:, None].astype(jnp.float32)
            # exact: the cube guard bounds full-batch blocks <= 80^3 < 2^24
            axes = flat_to_axes24(idx, shape_b)
        elif sampler == "randomcube":
            pos = cube_positions(key_b, shape_b, cube_len, cube_count)
            strides = row_major_strides(shape_b)
            idx = jnp.sum(pos * strides, axis=-1).reshape(-1)
            vals = dq(data_b[idx])
            wts = weight_b[idx] if weight is not None \
                else jnp.ones_like(vals)
            sample_valid = None
            axes = pos.reshape(-1, ndim)
        elif vector_len > 1 and data.shape[1] % vector_len == 0 \
                and data.shape[1] <= (1 << 24):
            # vectorised randompoint, ALIGNED-ROWS form (the solo
            # sampler's fast path, train/samplers.py): draw
            # sample_size/L row indices of the (Vmax/L, L*c)-reshaped
            # stack — the gather pays its per-index cost L-times less
            # often (on-chip in-step A/B, scripts/instep_gather_ab.py:
            # the solo narrow step went 1.69 -> 0.25 ms/step, AT its
            # no-gather floor).  Rows are confined to the valid prefix
            # (r < valid//L — `//` by the CONSTANT L is a cheap
            # multiply-shift, unlike the traced-divisor case in the NOTE
            # above), so padding voxels are never sampled; when
            # valid % L != 0 the final partial row is never drawn (up to
            # L-1 voxels per block unsampled — documented divergence).
            # Runs may cross spatial rows (contiguous in flat order);
            # per-voxel axes come from flat_to_axes24, exact because
            # Vmax <= 2^24 is a branch precondition.
            L = vector_len
            c = data.shape[2]
            n_runs = -(-sample_size // L)
            n_rows = jnp.maximum(valid_b // L, 1)
            u = jax.random.uniform(key_b, (n_runs,))
            r = jnp.minimum((u * n_rows.astype(u.dtype)).astype(jnp.int32),
                            n_rows - 1)
            idx = ((r[:, None] * L + jnp.arange(L)[None, :])
                   .reshape(-1)[:sample_size])
            row_take = lambda arr: (arr.reshape(data.shape[1] // L, L * c)
                                    [r].reshape(-1, c)[:sample_size])
            vals = dq(row_take(data_b))
            wts = row_take(weight_b) if weight is not None \
                else jnp.ones_like(vals)
            sample_valid = None
            axes = flat_to_axes24(idx, shape_b)
        elif vector_len > 1:
            # vectorised randompoint, row-contained fallback (stacks too
            # big for exact flat->axes math): draw sample_size/L runs of
            # L voxels contiguous along the LAST axis (runs must not
            # cross rows — the per-axis index math below is
            # multiplies-only, and a row-crossing run would need a
            # traced-divisor decomposition).  The fetch is ONE flat
            # gather of expanded run indices.  Run starts are clamped to
            # [0, W-L] per row, so the marginal is uniform except within
            # L-1 voxels of row ends.
            L = vector_len
            n_runs = -(-sample_size // L)
            starts = vector_run_starts(key_b, shape_b, L, n_runs)
            offs = jnp.zeros((L, ndim), jnp.int32).at[:, ndim - 1].set(
                jnp.arange(L))
            axes = (starts[:, None, :] + offs[None, :, :]
                    ).reshape(-1, ndim)[:sample_size]
            strides = row_major_strides(shape_b)
            idx = jnp.sum(axes * strides, axis=-1)
            vals = dq(data_b[idx])
            wts = weight_b[idx] if weight is not None \
                else jnp.ones_like(vals)
            sample_valid = None
        else:
            # per-axis draws: floor(u * S) with u uniform on the 2^23-grid
            # {0, 2^-23, ..., 1 - 2^-23} (float32 mantissa granularity of
            # jax.random.uniform).  The product of independent per-axis
            # draws is the uniform flat draw over the block (the reference's
            # flat randint, main.py:126-163) up to a per-position relative
            # probability error <= S * 2^-23 per axis (< 2.5e-4 at S=2048;
            # bound tested exactly in test_block_trainer.py) — chosen over
            # randint because randint's modular reduction is an integer
            # `rem` by a TRACED bound, which TPUs lower to a slow expansion
            # (see the NOTE above).
            u = jax.random.uniform(key_b, (sample_size, ndim))
            axes = jnp.minimum((u * shape_b.astype(u.dtype)).astype(jnp.int32),
                               shape_b - 1)
            strides = row_major_strides(shape_b)
            idx = jnp.sum(axes * strides, axis=-1)
            vals = dq(data_b[idx])
            wts = weight_b[idx] if weight is not None \
                else jnp.ones_like(vals)
            sample_valid = None
        coords = axes_to_coords(axes, shape_b, coords_mode)
        return coords, vals, wts, sample_valid

    def block_loss(layers_b, masks_b, enc_b, data_b, weight_b, valid_b,
                   shape_b, thres_b, dq_a, dq_b, key_b):
        coords, vals, wts, sample_valid = draw(data_b, weight_b, valid_b,
                                               shape_b, dq_a, dq_b, key_b)
        pred = stacked_apply(layers_b, masks_b, coords, spec, enc_b,
                             compute_dtype)
        pred = pred.astype(vals.dtype)
        if sample_valid is None:
            # apply the weight_thres override here: thres_b is traced
            # (per-block), so the loss fn's python-level `if` can't see it
            if use_thres:
                wts = jnp.where(pred <= thres_b, 1.0, wts)
            return loss_fn(vals, pred, wts, None)
        # full-batch: mean over valid voxels only
        err = (pred - vals) ** 2 if loss_name == "datal2" else None
        if err is None:
            d = jnp.abs(pred - vals)
            err = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        w = wts
        if use_thres:
            w = jnp.where(pred <= thres_b, 1.0, w)
        err = err * w * sample_valid
        return err.sum() / jnp.maximum(valid_b.astype(jnp.float32), 1.0)

    if fused:
        from brief_pytorch_tpu.ops.pallas_train import fused_train_grads
        acts = tuple((a, float(w0)) for _, a, w0 in spec.entries)

        def fused_block(layers_b, masks_b, c_b, v_b, w_b, thres_b):
            # the last layer's output width is topology-level (equal
            # across the bucket) — stacked_apply masks only ei < n_ent-1
            um = list(masks_b[:-1]) + [None]
            return fused_train_grads(
                layers_b, c_b.T, v_b.T, w_b.T, acts,
                loss_name=loss_name, beta=beta, unit_masks=um,
                dynamic_thres=thres_b if use_thres else None,
                half=half, interpret=fused == "interpret")

    def step_fn(carry, key):
        params_layers, opt_state = carry
        keys = jax.random.split(key, B)

        if fused:
            coords, vals, wts, _ = jax.vmap(draw)(
                data, weight, valid, shapes, dq_scale, dq_offset, keys)
            losses, gradd = jax.vmap(fused_block)(
                params_layers, masks, coords, vals, wts, thres)
            grads = gradd["layers"]
        else:
            losses, grads = jax.vmap(
                jax.value_and_grad(block_loss), in_axes=(0,) * 11
            )(params_layers, masks, enc, data, weight, valid, shapes, thres,
              dq_scale, dq_offset, keys)
        updates, new_opt_state = jax.vmap(tx.update)(grads, opt_state,
                                                     params_layers)
        params_layers = optax.apply_updates(params_layers, updates)
        return (params_layers, new_opt_state), losses

    keys = jax.random.split(key, n_steps)
    (params_layers, opt_state), losses = jax.lax.scan(
        step_fn, (params_layers, opt_state), keys)
    return params_layers, opt_state, losses


@partial(jax.jit, static_argnames=("spec", "slab", "coords_mode", "half",
                                   "vmax"))
def decode_blocks(params_layers, masks, enc, shapes, *,
                  spec: StackedChainSpec, slab: int, coords_mode: str,
                  half: bool, vmax: int):
    """Vmapped padded grid decode: (B, Vmax, c) predictions."""
    compute_dtype = jnp.bfloat16 if half else None
    n_slabs = math.ceil(vmax / slab)

    def one_block(layers_b, masks_b, enc_b, shape_b):
        def body(_, i):
            idx = i * slab + jnp.arange(slab)
            # exactness precondition: flat_to_axes24's one-step corrections
            # are proven for indices < 2^24, and the scan's last slab feeds
            # indices up to n_slabs*slab - 1 (the overshoot rows past vmax
            # are sliced off below, but they still go through the math)
            if n_slabs * slab <= (1 << 24):
                # multiply-only index decomposition (see block_loss NOTE)
                coords = axes_to_coords(flat_to_axes24(idx, shape_b),
                                        shape_b, coords_mode)
            else:
                coords = index_to_coords_dynamic(idx, shape_b, coords_mode)
            return None, stacked_apply(layers_b, masks_b, coords, spec,
                                       enc_b, compute_dtype)
        _, out = jax.lax.scan(body, None, jnp.arange(n_slabs))
        return out.reshape(n_slabs * slab, -1)[:vmax]

    return jax.vmap(one_block)(params_layers, masks, enc, shapes)


# --------------------------------------------------------------------------
# bucket orchestration
# --------------------------------------------------------------------------
@dataclass
class _BucketState:
    """Live training state of one stacked bucket."""
    block_idxs: List[int]          # indices into the fleet's block list
    models: List
    spec: StackedChainSpec
    params: object                 # stacked layer pytree
    opt_state: object
    masks: object
    enc: object                    # stacked frozen encoder params ({} or bvals)
    batch: BlockBatch
    data: object
    weight: object
    valid: object
    shapes: object
    tx: object
    key: object
    thres: object                      # (B,) per-block normalized thresholds
    mesh: object = None                # this bucket's (sub-)mesh
    use_thres: bool = True
    sampler_name: str = "randompoint"  # effective: randompoint|randomcube|fullbatch
    cube_len: Tuple[int, ...] = ()     # clipped, static per bucket
    vector_len: int = 1                # clamped to the bucket min last axis
    dq_scale: object = None            # (B,) per-block dequant (integer stacks)
    dq_offset: object = None
    fused: object = False              # fused Pallas kernel (False|True|"interpret")


@dataclass
class _SoloState:
    """Per-block training state for blocks that cannot join a stacked
    bucket: φ families without chain structure (MFN multiplicative
    filters), and blocks whose per-chunk `exception` config overrides
    step-level hyperparameters (sampler/lr/optimizer/max_steps — reference
    main.py:568-569 merges ANY override into that child's config).  One
    jitted program per block — the TPU equivalent of one reference child
    process (main.py:277-280)."""
    block_idx: int
    model: object
    params: object
    opt_state: object
    tx: object
    key: object
    sampler: object
    dev_data: object
    dev_weight: object
    thres: float
    coords_per_step: int
    sampler_name: str = "randompoint"
    cc: object = None            # this block's effective Compress node
    total_steps: int = 0         # this block's own max_steps
    steps_done: int = 0
    last_losses: object = None   # device losses of the last dispatched piece


class BlockFleetTrainer:
    """Trains a fleet of per-block INRs as sharded, vmapped buckets.

    Buckets group blocks by (phi family, topology, effective sampler);
    widths inside a bucket are padded to the max.  Each bucket is one SPMD
    program with its block axis sharded over the mesh.  Non-stackable
    blocks (MFN) train on a sequential solo path.  Buckets and solo blocks
    advance in LOCKSTEP between checkpoints, so a checkpoint callback
    always sees the whole fleet at the same step — the reference's children
    all checkpoint at the same step numbers too (main.py:585-607).

    Bucket segments are dispatched asynchronously (no host sync between
    buckets), so the device queue pipelines K bucket programs back-to-back;
    the only sync per checkpoint interval is the final loss fetch.

    SMALL buckets (fewer blocks than mesh shards) are packed onto disjoint
    device sub-meshes (_plan_meshes) so they execute concurrently instead
    of serially-with-cloned-pad-slots, and solo blocks round-robin over
    local devices — the in-process analogue of the reference scheduler
    fitting several small tasks onto one GPU simultaneously
    (utils/TasksManager.py:222-251).
    """

    def __init__(self, mesh=None, seed: int = 42,
                 pack_small_buckets: bool = True):
        self.mesh = mesh if mesh is not None else make_mesh(
            n_block_shards=len(jax.devices()))
        self.seed = seed
        self.pack_small_buckets = pack_small_buckets
        self._states: List[_BucketState] = []
        self._solo: List[_SoloState] = []

    def _plan_meshes(self, bucket_lists: List[List[int]]) -> List:
        """Assign each bucket a mesh: FULL buckets (B >= mesh shards) get
        the whole mesh; SMALL buckets (B < shards) are first-fit-decreasing
        packed onto disjoint device sub-meshes of exactly B devices each, so
        several tiny buckets execute CONCURRENTLY (async dispatch onto
        disjoint device queues) with zero cloned pad slots, instead of
        serialising on the whole mesh at B/shards occupancy.  Buckets that
        overflow one 'wave' of devices wrap to offset 0 — device reuse
        serialises them naturally in dispatch order.

        Multi-process meshes keep whole-mesh placement: every process must
        participate in every program it owns devices in, and a sub-mesh
        excluding some process's devices would desynchronise the SPMD
        program sequence across hosts."""
        D = int(np.prod(self.mesh.devices.shape))
        whole = [(idxs, self.mesh) for idxs in bucket_lists]
        if (not self.pack_small_buckets or D == 1
                or jax.process_count() > 1):
            return whole
        small = [(i, len(idxs)) for i, idxs in enumerate(bucket_lists)
                 if len(idxs) < D]
        if len(small) < 2:
            return whole
        plans: List = list(whole)
        waves: List[int] = []      # per-wave next-free device offset
        for i, B in sorted(small, key=lambda t: -t[1]):
            start = None
            for w, off in enumerate(waves):
                if off + B <= D:
                    start, waves[w] = off, off + B
                    break
            if start is None:
                waves.append(B)
                start = 0
            plans[i] = (bucket_lists[i],
                        block_submesh(self.mesh, start, B))
        return plans

    def train(self, blocks: List[Dict], compress_cfg, max_steps: int,
              checkpoint_cb=None, checkpoints: Optional[List[int]] = None,
              progress_cb=None, state_path: Optional[str] = None,
              resume_path: Optional[str] = None) -> List[Dict]:
        """blocks: dicts with keys data_norm, weight, model (PhiModel),
        name, sideinfos.  Returns blocks with 'params' attached.

        compress_cfg: the Compress config node (sampler, loss, lr, ...).
        checkpoint_cb(step, blocks, per_block_params) fires at every entry
        of `checkpoints` with the FULL fleet (all buckets + solo blocks).

        state_path: write the FULL fleet training state (stacked params +
        optimizer states + PRNG keys + solo states, train/checkpoint.py)
        there at every checkpoint (process 0 only; atomic).  resume_path:
        restore such a state and continue — a resumed fleet is
        bit-identical to an uninterrupted one on the same checkpoint grid
        (beyond the reference, whose children restart from zero).
        """
        cc = compress_cfg
        # bucket by stackable signature
        buckets: Dict[tuple, List[int]] = {}
        solo_idxs: List[int] = []
        for i, blk in enumerate(blocks):
            m = blk["model"]
            # blocks with a per-chunk `exception` that overrides step-level
            # hyperparameters carry their OWN Compress node (solo_cfg) and
            # train solo with it (reference main.py:568-569)
            blk_cc = blk.get("solo_cfg") or cc
            # per-block effective sampler: the reference's 80^3 cube guard
            # runs in each child process on its own block (main.py:332-334);
            # here it decides the block's bucket so big blocks never take
            # the full-batch randomcube path (HBM blowup at Vmax ~ millions)
            block_voxels = int(np.prod(blk["data_norm"].shape[:-1]))
            clipped = tuple(min(int(c), s) for c, s in
                            zip(blk_cc.sampler.cube_len,
                                blk["data_norm"].shape[:-1]))
            eff_sampler = cube_size_guard(blk_cc.sampler.name, block_voxels,
                                          int(np.prod(clipped)))
            blk["sampler_name"] = eff_sampler
            if not isinstance(m, _ChainModel) or blk.get("solo_cfg"):
                solo_idxs.append(i)
                continue
            sig = (type(m).__name__, _stack_signature(m.spec), eff_sampler,
                   clipped if eff_sampler == "randomcube" else ())
            buckets.setdefault(sig, []).append(i)
        self._states = [self._prepare_bucket(blocks, idxs, cc, mesh=m)
                        for idxs, m in self._plan_meshes(
                            list(buckets.values()))]
        self._solo = [self._prepare_solo(blocks, i, cc, max_steps,
                                         solo_slot=k)
                      for k, i in enumerate(solo_idxs)]

        fingerprint = None
        if state_path or resume_path:
            fingerprint = self._fleet_fingerprint(blocks, cc, max_steps)
        start_step = 0
        if resume_path:
            from brief_pytorch_tpu.train.checkpoint import resolve_trainstate
            start_step = self._load_state(
                resolve_trainstate(resume_path, "trainstate_fleet.npz"),
                fingerprint)

        ckpts = checkpoints or [max_steps]
        step = start_step
        for ckpt in ckpts:
            if ckpt <= start_step:
                continue   # the pre-preemption run already produced these
            n = ckpt - step
            if n > 0:
                # dispatch every bucket's segments WITHOUT host syncs, then
                # fetch losses once — the device pipelines bucket programs
                pending = [(st, self._run_segment(st, cc, n))
                           for st in self._states]
                solo_pending = [(ss, self._run_solo_to(ss, ckpt, max_steps))
                                for ss in self._solo]
                if progress_cb is not None:
                    per_block = {}
                    for st, losses in pending:
                        # losses are sharded over 'blocks' (cross-process on
                        # a multi-host mesh): all-gather before fetching
                        last = np.asarray(all_addressable(
                            losses[-1], st.mesh))[:len(st.models)]
                        for bi, lv in zip(st.block_idxs, last):
                            per_block[bi] = lv
                    for ss, losses in solo_pending:
                        # a solo whose (scaled) schedule has not reached its
                        # first step yet reports NaN — skipping it would
                        # shrink the array and misalign every later block
                        # for positional consumers
                        per_block[ss.block_idx] = float(
                            np.asarray(losses[-1])) if losses is not None \
                            else float("nan")
                    progress_cb(ckpt, np.asarray(
                        [per_block[i] for i in sorted(per_block)]))
            step = ckpt
            if checkpoint_cb is not None:
                checkpoint_cb(step, blocks, self._fleet_params(blocks))
            # state AFTER the artifacts: a preemption mid-checkpoint
            # resumes from the previous one and regenerates them
            if state_path is not None:
                self._save_state(state_path, step, fingerprint)
        for blk, p in zip(blocks, self._fleet_params(blocks)):
            blk["params"] = p
        return blocks

    # -------------------------------------------------- resume machinery --
    def _fleet_fingerprint(self, blocks: List[Dict], cc, max_steps: int
                           ) -> Dict:
        """Config axes a stored fleet state is only meaningful under.
        max_steps is included (unlike the single trainer): solo blocks'
        proportional checkpoint targets (_run_solo_to) depend on it."""
        return {
            "kind": "fleet",
            "blocks": [str(b["name"]) for b in blocks],
            "models": [type(b["model"]).__name__ for b in blocks],
            "buckets": [[int(i) for i in st.block_idxs]
                        for st in self._states],
            "nshards": [int(st.mesh.shape["blocks"]) for st in self._states],
            "solo": [int(ss.block_idx) for ss in self._solo],
            "optimizer": str(cc.optimizer_name_phi), "lr": float(cc.lr_phi),
            "sampler": str(cc.sampler.name), "seed": int(self.seed),
            "max_steps": int(max_steps), "half": bool(cc.half),
            "loss": f"{cc.loss.name}/{float(cc.loss.get('beta', 0.01))}",
            "coords_mode": str(cc.coords_mode),
            # the integer-gather path's training values differ from the
            # pre-normalized f32 gather by ~1 ulp — not bit-mixable
            "dequant": [b.get("dequant") is not None for b in blocks],
            # the fused kernel's math ≠ XLA's bitwise (train/fit.py has the
            # same guard for the solo trainer)
            "fused": [bool(st.fused) for st in self._states],
        }

    def _save_state(self, path: str, step: int, fingerprint: Dict) -> None:
        """Write the whole fleet's training state (atomic, process 0 only).
        Sharded bucket stacks are all-gathered so the host copy is complete
        regardless of how many processes the mesh spans."""
        from brief_pytorch_tpu.train import checkpoint as ckpt_lib
        # NOTE: the all_addressable gathers below are COLLECTIVE programs —
        # every process must execute them in the same order; only the final
        # file write is process-0-gated.
        arrs: Dict[str, np.ndarray] = {
            "step": np.asarray(int(step)),
            "fingerprint": ckpt_lib.fingerprint_bytes(fingerprint),
        }
        for bi, st in enumerate(self._states):
            ckpt_lib.pack_tree(arrs, f"b{bi}p",
                               all_addressable(st.params, st.mesh))
            ckpt_lib.pack_tree(arrs, f"b{bi}o",
                               all_addressable(st.opt_state, st.mesh))
            arrs[f"b{bi}key"] = np.asarray(st.key)
        for si, ss in enumerate(self._solo):
            ckpt_lib.pack_tree(arrs, f"s{si}p", ss.params)
            ckpt_lib.pack_tree(arrs, f"s{si}o", ss.opt_state)
            arrs[f"s{si}key"] = np.asarray(ss.key)
            arrs[f"s{si}done"] = np.asarray(int(ss.steps_done))
        if jax.process_index() == 0:
            ckpt_lib.atomic_savez(path, arrs)

    def _load_state(self, path: str, fingerprint: Dict) -> int:
        """Restore a _save_state file into the freshly prepared fleet
        (every process loads the full host value and contributes its own
        addressable shards — the same shared-filesystem hand-off the
        placement uses).  Returns the stored step."""
        from brief_pytorch_tpu.train import checkpoint as ckpt_lib
        with np.load(path) as z:
            ckpt_lib.check_fingerprint(z, fingerprint, path)
            for bi, st in enumerate(self._states):
                bs = block_sharding(st.mesh)
                put = lambda tree: jax.tree_util.tree_map(
                    lambda x: host_to_global(x, bs), tree)
                st.params = put(ckpt_lib.unpack_tree(
                    z, f"b{bi}p", st.params, f"bucket{bi} params"))
                st.opt_state = put(ckpt_lib.unpack_tree(
                    z, f"b{bi}o", st.opt_state, f"bucket{bi} opt_state"))
                st.key = jnp.asarray(z[f"b{bi}key"])
            for si, ss in enumerate(self._solo):
                dev = next(iter(jax.tree_util.tree_leaves(
                    ss.params)[0].devices()))
                ss.params = jax.device_put(ckpt_lib.unpack_tree(
                    z, f"s{si}p", ss.params, f"solo{si} params"), dev)
                ss.opt_state = jax.device_put(ckpt_lib.unpack_tree(
                    z, f"s{si}o", ss.opt_state, f"solo{si} opt_state"), dev)
                ss.key = jnp.asarray(z[f"s{si}key"])
                ss.steps_done = int(z[f"s{si}done"])
                ss.last_losses = None
            return int(z["step"])

    def _prepare_bucket(self, blocks: List[Dict], idxs: List[int], cc,
                        mesh=None) -> _BucketState:
        mesh = mesh if mesh is not None else self.mesh
        sub = [blocks[i] for i in idxs]
        models = [b["model"] for b in sub]
        spec, params_layers, masks, enc = build_stacked(
            models, jax.random.PRNGKey(self.seed),
            [b.get("init_layers") for b in sub])

        # effective bucket sampler: the clipped cube is bucket-static; when
        # it covers EVERY block exactly, each cube is the whole block and
        # randomcube degenerates to the (cheaper, exact) full-batch path
        sampler_name = sub[0].get("sampler_name", cc.sampler.name)
        cube_len: Tuple[int, ...] = ()
        if sampler_name == "randomcube":
            cube_len = tuple(min(int(c), s) for c, s in
                             zip(cc.sampler.cube_len,
                                 sub[0]["data_norm"].shape[:-1]))
            if all(tuple(b["data_norm"].shape[:-1]) == cube_len
                   for b in sub):
                sampler_name = "fullbatch"
        # clamp runs to the bucket's shortest last axis (keeps both vec
        # gather forms valid); non-randompoint buckets pin 1 (vector_len
        # is a static jit arg — varying it would split their compile cache)
        vec = (min(int(cc.sampler.get("vector_len", 1) or 1),
                   min(int(b["data_norm"].shape[-2]) for b in sub))
               if sampler_name == "randompoint" else 1)

        # pad the stacked voxel axis to a multiple of vector_len so the
        # randompoint vec path can take the aligned-rows gather (its
        # Vmax % L == 0 precondition in run_block_segment)
        batch = BlockBatch.build(sub, pad_multiple=max(1, vec))
        # all-ones weights (the default) skip the weight stack entirely:
        # halves the fleet's HBM residency and the per-step gather traffic
        unit_weight = all(bool(np.all(b["weight"] == 1.0)) for b in sub)

        # pad the block axis to a multiple of the mesh's block shards
        # (an SPMD axis must divide evenly; padded entries clone block 0 and
        # are dropped by unstack/decode, which read only the first B rows).
        # Packed small buckets arrive with a B-device sub-mesh → no clones.
        nshards = int(mesh.shape["blocks"])
        B = len(sub)
        target = ((B + nshards - 1) // nshards) * nshards
        pad = lambda x: jnp.concatenate(
            [x, jnp.repeat(x[:1], target - B, axis=0)], axis=0)
        # batch arrays stay on host (numpy) until the device_put below
        pad_np = lambda x: np.concatenate(
            [x, np.repeat(x[:1], target - B, axis=0)], axis=0)
        if target > B:
            params_layers = jax.tree_util.tree_map(pad, params_layers)
            masks = [pad(m) for m in masks]
            enc = jax.tree_util.tree_map(pad, enc)
            pad_dq = lambda x: None if x is None else pad_np(x)
            batch = BlockBatch(pad_np(batch.data), pad_np(batch.weight),
                               pad_np(batch.valid), pad_np(batch.shapes),
                               batch.vmax, batch.ndim,
                               pad_dq(batch.dq_scale),
                               pad_dq(batch.dq_offset))

        # 0.0 is the "override disabled" sentinel (loss.py `if weight_thres:`,
        # reference main.py:380-383); encode it per block as -inf so
        # `pred <= thres` never fires for disabled blocks even when they
        # share a bucket with enabled ones
        thres_host = np.asarray([float(b.get("weight_thres_norm", 0.0))
                                 for b in sub], np.float32)
        thres_arr = jnp.asarray(np.where(thres_host == 0.0, -np.inf,
                                         thres_host).astype(np.float32))
        if target > B:
            thres_arr = pad(thres_arr)

        tx = make_optimizer(cc.optimizer_name_phi, float(cc.lr_phi),
                            cc.lr_scheduler_phi)
        opt_state = jax.vmap(tx.init)(params_layers)

        # fused Pallas train kernel for the bucket (same Compress.fused_train
        # flag and TPU gate as the solo trainer, train/fit.py; the vmapped
        # kernel was verified bit-identical to per-block kernel calls on
        # chip).  Restricted to single-block-shard meshes: a pallas_call has
        # no SPMD partitioning rule, so on a >1-shard block axis XLA would
        # all-gather the stacks instead of running per-shard — multi-chip
        # fleets keep the XLA path until a shard_map wrapper lands.
        fused = False
        if cc.get("fused_train", True) \
                and int(mesh.shape["blocks"]) == 1 \
                and jax.devices()[0].platform == "tpu" \
                and fleet_fused_supported(spec, cc.loss.name, sampler_name,
                                          bool(cc.half)):
            fused = True

        # host_to_global: single-process this is a plain device_put onto the
        # mesh; under jax.distributed every process holds the full host
        # value (shared-filesystem hand-off, like the reference's children,
        # main.py:547-575) and contributes only its addressable shards —
        # the fleet trains across process boundaries (VERDICT r2 item 1)
        bs = block_sharding(mesh)
        # leaves go to host_to_global as-is: single-process it device_puts
        # directly (host-CPU jax arrays from the pinned init — forcing
        # np.asarray here would add a device->host->device round trip,
        # minutes for a wide fleet over the slow tunnel); the multi-process
        # branch np.asarray's internally before slicing addressable shards
        put = lambda tree: jax.tree_util.tree_map(
            lambda x: host_to_global(x, bs), tree)
        return _BucketState(
            block_idxs=list(idxs), models=models, spec=spec,
            params=put(params_layers),
            opt_state=put(opt_state),
            masks=put(masks),
            enc=put(enc) if enc else {},
            batch=batch,
            data=put(batch.data),
            weight=None if unit_weight else put(batch.weight),
            valid=put(batch.valid),
            shapes=put(batch.shapes),
            dq_scale=None if batch.dq_scale is None else put(batch.dq_scale),
            dq_offset=None if batch.dq_offset is None
            else put(batch.dq_offset),
            tx=tx, key=jax.random.PRNGKey(self.seed + 1),
            thres=put(thres_arr), mesh=mesh,
            use_thres=bool(np.any(thres_host != 0.0)),
            sampler_name=sampler_name, cube_len=cube_len, vector_len=vec,
            fused=fused)

    def _prepare_solo(self, blocks: List[Dict], idx: int, cc,
                      fleet_max_steps: int, solo_slot: int = 0
                      ) -> _SoloState:
        blk = blocks[idx]
        scc = blk.get("solo_cfg") or cc
        model = blk["model"]
        with _host_device():
            params = model.init(
                jax.random.fold_in(jax.random.PRNGKey(self.seed), idx))
            warm = blk.get("init_layers")
            if warm is not None and isinstance(model, _ChainModel):
                # per-block warm start (reference main.py:345-354)
                params = {**params,
                          "layers": [{k: jnp.asarray(v)
                                      for k, v in l.items()} for l in warm]}
        # local_devices: on a multi-process mesh every process trains its
        # solo blocks redundantly on its own LOCAL devices (identical
        # deterministic math — same keys, same data), so the whole fleet's
        # params exist on every process without any cross-host traffic.
        # Solo blocks round-robin over local devices so several solo
        # programs execute concurrently (async dispatch, disjoint queues).
        local = jax.local_devices()
        dev = local[solo_slot % len(local)]
        params = jax.device_put(params, dev)
        spatial = tuple(int(s) for s in blk["data_norm"].shape[:-1])
        c = blk["data_norm"].shape[-1]
        mode = scc.coords_mode
        unit_weight = bool(np.all(blk["weight"] == 1.0))
        if blk["sampler_name"] == "randomcube":
            clipped = tuple(min(int(cl), s) for cl, s in
                            zip(scc.sampler.cube_len, spatial))
            sampler = RandomCubeSampler(spatial, mode,
                                        int(scc.sampler.cube_count), clipped)
            dev_data = jax.device_put(blk["data_norm"], dev)
            dev_weight = None if unit_weight \
                else jax.device_put(blk["weight"], dev)
            cps = sampler.cube_count * int(np.prod(clipped))
        else:
            # integer-gather fast path when divide_runner recorded the
            # block's raw chunk + affine (same as the solo NFGR trainer)
            dq = blk.get("dequant")
            raw = blk.get("data_raw") if dq is not None else None
            sampler = RandomPointSampler(
                spatial, mode, int(scc.sampler.sample_size),
                min(int(scc.sampler.get("vector_len", 1) or 1),
                    int(np.prod(spatial))),
                *(dq if raw is not None else (1.0, 0.0)))
            dev_data = jax.device_put(
                (raw if raw is not None
                 else blk["data_norm"]).reshape(-1, c), dev)
            dev_weight = None if unit_weight \
                else jax.device_put(blk["weight"].reshape(-1, c), dev)
            cps = sampler.sample_size
        tx = make_optimizer(scc.optimizer_name_phi, float(scc.lr_phi),
                            scc.lr_scheduler_phi)
        total = int(scc.get("max_steps", fleet_max_steps)) \
            if blk.get("solo_cfg") else fleet_max_steps
        return _SoloState(
            block_idx=idx, model=model, params=params,
            opt_state=tx.init(params), tx=tx,
            key=jax.random.fold_in(jax.random.PRNGKey(self.seed + 1), idx),
            sampler=sampler, dev_data=dev_data, dev_weight=dev_weight,
            thres=float(blk.get("weight_thres_norm", 0.0)),
            coords_per_step=cps, sampler_name=blk["sampler_name"],
            cc=scc, total_steps=total)

    def _run_segment(self, st: _BucketState, cc, n_steps: int):
        """Advance one bucket n_steps; returns the (DEVICE) per-step loss
        array of the final dispatched piece — callers np.asarray() it only
        after every bucket's segments are dispatched.

        Scans are dispatched in SEGMENT_CAP-sized pieces — a single
        multi-minute device dispatch risks runtime watchdogs (see
        train/fit.py), and the pieces share one compiled shape."""
        from brief_pytorch_tpu.train.fit import segment_cap
        B = int(st.data.shape[0])
        if st.sampler_name == "fullbatch":
            per_block = int(st.data.shape[1])
        elif st.sampler_name == "randomcube":
            per_block = int(cc.sampler.cube_count) * int(np.prod(st.cube_len))
        else:
            per_block = int(cc.sampler.sample_size)
        cap = segment_cap(B * per_block)
        remaining = n_steps
        losses = None
        while remaining > 0:
            seg_n = min(remaining, cap)
            st.key, seg = jax.random.split(st.key)
            st.params, st.opt_state, losses = run_block_segment(
                st.params, st.opt_state, st.masks, st.enc, st.data,
                st.weight, st.valid, st.shapes, st.thres, seg, spec=st.spec,
                tx=st.tx, loss_name=cc.loss.name,
                beta=float(cc.loss.get("beta", 0.01)),
                use_thres=st.use_thres,
                n_steps=seg_n, sample_size=int(cc.sampler.sample_size),
                coords_mode=cc.coords_mode, half=bool(cc.half),
                sampler=st.sampler_name,
                cube_count=int(cc.sampler.cube_count),
                cube_len=st.cube_len, vector_len=st.vector_len,
                dq_scale=st.dq_scale, dq_offset=st.dq_offset,
                fused=st.fused)
            remaining -= seg_n
        return losses

    def _run_solo_to(self, ss: _SoloState, fleet_step: int,
                     fleet_max_steps: int):
        """Advance one solo block to its PROPORTIONAL target step: a solo
        block whose exception sets its own max_steps finishes exactly at
        the fleet's final checkpoint (the reference children each run their
        own full loop, main.py:568-569; proportional scheduling keeps the
        shared checkpoints showing comparable progress)."""
        target = round(fleet_step * ss.total_steps / max(1, fleet_max_steps))
        return self._run_solo_segment(ss, ss.cc, target - ss.steps_done)

    def _run_solo_segment(self, ss: _SoloState, cc, n_steps: int):
        """Advance one solo block n_steps via the single-volume jitted
        segment (train/fit.run_segment) using ITS OWN effective config."""
        from brief_pytorch_tpu.train.fit import run_segment, segment_cap
        cap = segment_cap(ss.coords_per_step)
        remaining = max(0, n_steps)
        losses = ss.last_losses
        while remaining > 0:
            seg_n = min(remaining, cap)
            ss.key, seg = jax.random.split(ss.key)
            ss.params, ss.opt_state, losses = run_segment(
                ss.params, ss.opt_state, ss.dev_data, ss.dev_weight, seg,
                weight_thres=ss.thres, model=ss.model, sampler=ss.sampler,
                tx=ss.tx, loss_name=cc.loss.name,
                beta=float(cc.loss.get("beta", 0.01)),
                n_steps=seg_n, half=bool(cc.half))
            remaining -= seg_n
            ss.steps_done += seg_n
        ss.last_losses = losses
        return losses

    def fused_paths(self) -> List[bool]:
        """Per-bucket fused-kernel flags (True = the Pallas fused train
        kernel runs that bucket, False = XLA autodiff).  Public accessor so
        tooling (bench.py) never reaches into _states — and never reports
        one bucket's flag as the whole fleet's (advisor r4)."""
        return [bool(st.fused) for st in self._states]

    def fleet_stats(self) -> List[Dict]:
        """Per-bucket occupancy accounting: how much compute the padding
        (block-axis clones to fill SPMD shards + voxel padding to Vmax +
        width padding to the bucket max) wastes.  Used by the fleet-scale
        regression and RESULTS.md measurements."""
        out = []
        for st in self._states:
            B_real = len(st.models)
            B_padded = int(st.data.shape[0])
            true_vox = int(np.asarray(st.valid)[:B_real].sum())
            out.append({
                "blocks": B_real,
                "padded_blocks": B_padded,
                "vmax": st.batch.vmax,
                "sampler": st.sampler_name,
                "families": type(st.models[0]).__name__,
                # fraction of the (padded_blocks x vmax) voxel grid that is
                # real data — fullbatch compute scales with the grid
                "voxel_occupancy": true_vox / (B_padded * st.batch.vmax),
                # fraction of block slots that are real blocks — sampled
                # (randompoint/randomcube) compute scales with slots
                "slot_occupancy": B_real / B_padded,
                # devices this bucket's programs actually run on; packed
                # small buckets span disjoint sub-meshes and run
                # concurrently with each other
                "devices": int(np.prod(st.mesh.devices.shape)),
                "device_ids": [d.id for d in
                               st.mesh.devices.reshape(-1).tolist()],
            })
        return out

    def _fleet_params(self, blocks: List[Dict]) -> List[Dict]:
        """Per-block true-width params for the whole fleet, in block order.
        On a multi-process mesh the stacks are all-gathered first so every
        process can slice out every block (each process writes/consumes the
        full fleet, like every reference child sees the shared FS)."""
        out: List[Optional[Dict]] = [None] * len(blocks)
        for st in self._states:
            params_h = all_addressable(st.params, st.mesh)
            enc_h = all_addressable(st.enc, st.mesh) if st.enc else st.enc
            for bi, p in zip(st.block_idxs,
                             unstack_params(params_h, st.models, enc_h)):
                out[bi] = p
        for ss in self._solo:
            out[ss.block_idx] = jax.tree_util.tree_map(np.asarray, ss.params)
        return out

    def decode(self, blocks: List[Dict], cc, decompress_cfg
               ) -> List[np.ndarray]:
        """Decode every block (vmapped padded grid inference) and return
        per-block float32 arrays in their true shapes, in block order."""
        results: List[Optional[np.ndarray]] = [None] * len(blocks)
        pending = []
        for st in self._states:
            slab = max(128, min(1 << 15, st.batch.vmax))
            slab = ((slab + 127) // 128) * 128
            pending.append((st, decode_blocks(
                st.params, st.masks, st.enc, st.shapes, spec=st.spec,
                slab=slab, coords_mode=cc.coords_mode, half=bool(cc.half),
                vmax=st.batch.vmax)))
        # fetch only after every bucket's decode is dispatched (the device
        # queue pipelines the K programs); all-gather cross-process shards
        for st, out in pending:
            out = np.asarray(all_addressable(out, st.mesh), np.float32)
            for i, bi in enumerate(st.block_idxs):
                shape = blocks[bi]["data_norm"].shape
                v = int(np.prod(shape[:-1]))
                results[bi] = out[i, :v].reshape(shape)
        for ss in self._solo:
            from brief_pytorch_tpu.train.decode import reconstruct_flattened
            shape = blocks[ss.block_idx]["data_norm"].shape
            scc = ss.cc if ss.cc is not None else cc
            results[ss.block_idx] = reconstruct_flattened(
                ss.model.apply, ss.params, shape, 1 << 15, scc.coords_mode,
                bool(scc.half), model=ss.model)
        return results
