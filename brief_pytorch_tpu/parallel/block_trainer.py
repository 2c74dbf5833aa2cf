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

Per-block semantics preserved from the reference children (temp_main.py):
per-block normalisation (own min/max), per-block byte budgets and the
degradation chain, per-block loss means, per-block Adamax + MultiStepLR.
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

from brief_pytorch_tpu.core.coords import index_to_coords_dynamic
from brief_pytorch_tpu.models.phi import (ChainSpec, _ChainModel, _act,
                                          init_linear, init_phi)
from brief_pytorch_tpu.parallel.mesh import block_sharding, make_mesh, replicated
from brief_pytorch_tpu.train.loss import make_loss
from brief_pytorch_tpu.train.optim import make_optimizer
from brief_pytorch_tpu.train.samplers import cube_size_guard


# --------------------------------------------------------------------------
# stacked masked chains
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class StackedChainSpec:
    """Common (padded) architecture of a bucket of chain networks."""
    acts: Tuple[str, ...]          # per layer
    w0s: Tuple[float, ...]
    dims: Tuple[Tuple[int, int], ...]  # padded (in, out) per layer
    encoder: str = "none"              # 'none' | 'sirenpos' (param-free)
    encoder_cfg: Tuple = ()

    @property
    def n_layers(self) -> int:
        return len(self.dims)


def _layer_meta(spec: ChainSpec):
    """Flatten a ChainSpec into per-linear (in, out, act, w0, init) tuples.
    Only plain chains are supported for stacking (res/skip nets train
    per-block)."""
    assert spec.skip_entry == -1 and spec.encoder in ("none", "sirenpos")
    out = []
    for e in spec.entries:
        assert e.kind == "plain", "res chains are not stack-padded"
        out.append((e.fan_in, e.fan_out, e.act, e.w0, e.w_init))
    return out


def build_stacked(models: Sequence[_ChainModel], key,
                  init_layers_list: Optional[Sequence] = None) -> Tuple[
        StackedChainSpec, List[Dict], List[jnp.ndarray]]:
    """Stack B chain models (same family/layer count, any widths) into
    padded leading-axis params + per-layer output masks.

    init_layers_list: optional per-block warm-start layers ([{'w','b'},...]
    from io.modelsave.load_model, reference main.py:345-354); None entries
    get fresh init.

    Returns (stacked_spec, params_layers, masks) where
      params_layers[l] = {'w': (B, in_max, out_max), 'b': (B, out_max)}
      masks[l]         = (B, out_max) float32 validity mask.
    """
    metas = [_layer_meta(m.spec) for m in models]
    L = len(metas[0])
    assert all(len(m) == L for m in metas), "layer-count mismatch in bucket"
    B = len(models)
    dims = []
    for l in range(L):
        in_max = max(m[l][0] for m in metas)
        out_max = max(m[l][1] for m in metas)
        dims.append((in_max, out_max))
    acts = tuple(metas[0][l][2] for l in range(L))
    w0s = tuple(metas[0][l][3] for l in range(L))
    # param-free input encoder (SIRENPos): must be applied by stacked_apply
    # too, or fleet-trained weights would be re-decoded WITH the encoder by
    # NFGR.decompress while having been trained without it
    enc = models[0].spec.encoder
    enc_cfg = tuple(models[0].spec.encoder_cfg)
    assert all(m.spec.encoder == enc and
               tuple(m.spec.encoder_cfg) == enc_cfg for m in models), \
        "bucket mixes encoder configs"
    spec = StackedChainSpec(acts=acts, w0s=w0s, dims=tuple(dims),
                            encoder=enc, encoder_cfg=enc_cfg)

    keys = jax.random.split(key, B)
    params_layers = []
    masks = []
    for l in range(L):
        in_max, out_max = dims[l]
        w = np.zeros((B, in_max, out_max), np.float32)
        b = np.zeros((B, out_max), np.float32)
        m = np.zeros((B, out_max), np.float32)
        for bi, meta in enumerate(metas):
            fi, fo, _act_, _w0_, w_init = meta[l]
            warm = (init_layers_list[bi] if init_layers_list is not None
                    else None)
            if warm is not None:
                lp = warm[l]
            else:
                lk = jax.random.fold_in(keys[bi], l)
                lp = init_linear(lk, fi, fo, w_init)
            w[bi, :fi, :fo] = np.asarray(lp["w"])
            b[bi, :fo] = np.asarray(lp["b"])
            m[bi, :fo] = 1.0
        params_layers.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        masks.append(jnp.asarray(m))
    return spec, params_layers, masks


def stacked_apply(layers_b, masks_b, coords, spec: StackedChainSpec,
                  compute_dtype=None):
    """Forward for ONE block (call under vmap over the leading axis).

    layers_b[l]['w']: (in_max, out_max); masks_b[l]: (out_max,).
    Masking after each activation zeroes padded units, which both keeps the
    active network exact and kills every gradient path into padding.
    """
    if spec.encoder == "sirenpos":
        # per-axis sin(2*pi/T_i * x_i), reference Networks.py:19-30
        T = jnp.asarray(spec.encoder_cfg, coords.dtype)
        coords = jnp.sin((2.0 * jnp.pi / T) * coords)
    h = coords
    for l in range(spec.n_layers):
        w, b = layers_b[l]["w"], layers_b[l]["b"]
        if compute_dtype is not None:
            z = jnp.dot(h.astype(compute_dtype), w.astype(compute_dtype),
                        preferred_element_type=jnp.float32) + b
        else:
            z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = _act(spec.acts[l], spec.w0s[l], z)
        if l < spec.n_layers - 1:
            h = h * masks_b[l]
    return h


def unstack_params(params_layers, models: Sequence[_ChainModel]):
    """Slice each block's true-width layers back out of the padded stack."""
    out = []
    for bi, m in enumerate(models):
        meta = _layer_meta(m.spec)
        layers = []
        for l, (fi, fo, *_rest) in enumerate(meta):
            layers.append({
                "w": np.asarray(params_layers[l]["w"][bi, :fi, :fo]),
                "b": np.asarray(params_layers[l]["b"][bi, :fo])})
        out.append({"layers": layers})
    return out


# --------------------------------------------------------------------------
# block batch container
# --------------------------------------------------------------------------
@dataclass
class BlockBatch:
    """B normalised blocks padded to a common flat voxel count."""
    data: jnp.ndarray          # (B, Vmax, c)
    weight: jnp.ndarray        # (B, Vmax, c)
    valid: jnp.ndarray         # (B,) int32 true voxel counts
    shapes: jnp.ndarray        # (B, ndim) spatial extents
    vmax: int
    ndim: int

    @staticmethod
    def build(blocks: List[Dict], pad_multiple: int = 1) -> "BlockBatch":
        """blocks: dicts with 'data_norm' (*spatial, c) float32 and
        'weight' of the same shape."""
        ndim = blocks[0]["data_norm"].ndim - 1
        c = blocks[0]["data_norm"].shape[-1]
        vmax = max(int(np.prod(b["data_norm"].shape[:-1])) for b in blocks)
        if pad_multiple > 1:
            vmax = ((vmax + pad_multiple - 1) // pad_multiple) * pad_multiple
        B = len(blocks)
        data = np.zeros((B, vmax, c), np.float32)
        weight = np.zeros((B, vmax, c), np.float32)
        valid = np.zeros((B,), np.int32)
        shapes = np.ones((B, ndim), np.int32)
        for i, b in enumerate(blocks):
            v = int(np.prod(b["data_norm"].shape[:-1]))
            data[i, :v] = b["data_norm"].reshape(v, c)
            weight[i, :v] = b["weight"].reshape(v, c)
            valid[i] = v
            shapes[i] = b["data_norm"].shape[:-1]
        return BlockBatch(jnp.asarray(data), jnp.asarray(weight),
                          jnp.asarray(valid), jnp.asarray(shapes), vmax, ndim)


# --------------------------------------------------------------------------
# vmapped training
# --------------------------------------------------------------------------
@partial(jax.jit,
         static_argnames=("spec", "tx", "loss_name", "beta", "use_thres",
                          "n_steps", "sample_size", "coords_mode", "half",
                          "fullbatch"),
         donate_argnums=(0, 1))
def run_block_segment(params_layers, opt_state, masks, data, weight, valid,
                      shapes, thres, key, *, spec: StackedChainSpec, tx,
                      loss_name: str, beta: float, use_thres: bool,
                      n_steps: int, sample_size: int, coords_mode: str,
                      half: bool, fullbatch: bool):
    """n_steps of simultaneous training for all B blocks (one scan).

    Each step vmaps sample+forward+backward+update over the block axis;
    blocks are independent so the sharded program has no collectives.
    thres: (B,) per-block normalized weight_thres — each block normalizes
    the config threshold with its OWN min/max (reference: each child runs
    main.py:380-383 on its own chunk), so it cannot be a shared scalar.
    Returns (params_layers, opt_state, losses (n_steps, B)).
    """
    loss_fn = make_loss(loss_name, beta)
    compute_dtype = jnp.bfloat16 if half else None
    B = data.shape[0]

    def block_loss(layers_b, masks_b, data_b, weight_b, valid_b, shape_b,
                   thres_b, key_b):
        if fullbatch:
            idx = jnp.arange(data.shape[1])
            vals = data_b
            wts = weight_b
            sample_valid = (idx < valid_b)[:, None].astype(jnp.float32)
        else:
            idx = jax.random.randint(key_b, (sample_size,), 0,
                                     jnp.maximum(valid_b, 1))
            vals = data_b[idx]
            wts = weight_b[idx]
            sample_valid = None
        coords = index_to_coords_dynamic(idx, shape_b, coords_mode)
        pred = stacked_apply(layers_b, masks_b, coords, spec, compute_dtype)
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

    def step_fn(carry, key):
        params_layers, opt_state = carry
        keys = jax.random.split(key, B)

        losses, grads = jax.vmap(
            jax.value_and_grad(block_loss), in_axes=(0,) * 8
        )(params_layers, masks, data, weight, valid, shapes, thres, keys)
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
def decode_blocks(params_layers, masks, shapes, *, spec: StackedChainSpec,
                  slab: int, coords_mode: str, half: bool, vmax: int):
    """Vmapped padded grid decode: (B, Vmax, c) predictions."""
    compute_dtype = jnp.bfloat16 if half else None
    n_slabs = math.ceil(vmax / slab)

    def one_block(layers_b, masks_b, shape_b):
        def body(_, i):
            idx = i * slab + jnp.arange(slab)
            coords = index_to_coords_dynamic(idx, shape_b, coords_mode)
            return None, stacked_apply(layers_b, masks_b, coords, spec,
                                       compute_dtype)
        _, out = jax.lax.scan(body, None, jnp.arange(n_slabs))
        return out.reshape(n_slabs * slab, -1)[:vmax]

    return jax.vmap(one_block)(params_layers, masks, shapes)


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
    batch: BlockBatch
    data: object
    weight: object
    valid: object
    shapes: object
    tx: object
    key: object
    thres: object                      # (B,) per-block normalized thresholds
    use_thres: bool = True
    sampler_name: str = "randompoint"  # post cube_size_guard (per bucket)


class BlockFleetTrainer:
    """Trains a fleet of per-block INRs as sharded, vmapped buckets.

    Buckets group blocks by (phi family, layer count, act structure); widths
    inside a bucket are padded to the max.  Each bucket is one SPMD program
    with its block axis sharded over the mesh.  Buckets advance in LOCKSTEP
    between checkpoints, so a checkpoint callback always sees the whole
    fleet at the same step — the reference's children all checkpoint at the
    same step numbers too (main.py:585-607).
    """

    def __init__(self, mesh=None, seed: int = 42):
        self.mesh = mesh if mesh is not None else make_mesh(
            n_block_shards=len(jax.devices()))
        self.seed = seed
        self._states: List[_BucketState] = []

    def train(self, blocks: List[Dict], compress_cfg, max_steps: int,
              checkpoint_cb=None, checkpoints: Optional[List[int]] = None,
              progress_cb=None) -> List[Dict]:
        """blocks: dicts with keys data_norm, weight, model (PhiModel),
        name, sideinfos.  Returns blocks with 'params' attached.

        compress_cfg: the Compress config node (sampler, loss, lr, ...).
        checkpoint_cb(step, blocks, per_block_params) fires at every entry
        of `checkpoints` with the FULL fleet (all buckets).
        """
        cc = compress_cfg
        # bucket by stackable signature
        buckets: Dict[tuple, List[int]] = {}
        for i, blk in enumerate(blocks):
            m = blk["model"]
            meta = tuple((e.act, e.w0, e.kind) for e in m.spec.entries)
            # per-block effective sampler: the reference's 80^3 cube guard
            # runs in each child process on its own block (main.py:332-334);
            # here it decides the block's bucket so big blocks never take
            # the full-batch randomcube path (HBM blowup at Vmax ~ millions)
            block_voxels = int(np.prod(blk["data_norm"].shape[:-1]))
            cube_voxels = int(np.prod([min(int(c), s) for c, s in
                                       zip(cc.sampler.cube_len,
                                           blk["data_norm"].shape[:-1])]))
            eff_sampler = cube_size_guard(cc.sampler.name, block_voxels,
                                          cube_voxels)
            blk["sampler_name"] = eff_sampler
            sig = (type(m).__name__, len(m.spec.entries), meta, eff_sampler,
                   m.spec.encoder, tuple(m.spec.encoder_cfg))
            buckets.setdefault(sig, []).append(i)
        self._states = [self._prepare_bucket(blocks, idxs, cc)
                        for idxs in buckets.values()]

        ckpts = checkpoints or [max_steps]
        step = 0
        for ckpt in ckpts:
            n = ckpt - step
            if n > 0:
                last_losses = []
                for st in self._states:
                    last_losses.append(self._run_segment(st, cc, n))
                if progress_cb is not None:
                    progress_cb(ckpt, np.concatenate(last_losses))
            step = ckpt
            if checkpoint_cb is not None:
                checkpoint_cb(step, blocks, self._fleet_params(blocks))
        for blk, p in zip(blocks, self._fleet_params(blocks)):
            blk["params"] = p
        return blocks

    def _prepare_bucket(self, blocks: List[Dict], idxs: List[int], cc
                        ) -> _BucketState:
        sub = [blocks[i] for i in idxs]
        models = [b["model"] for b in sub]
        spec, params_layers, masks = build_stacked(
            models, jax.random.PRNGKey(self.seed),
            [b.get("init_layers") for b in sub])
        batch = BlockBatch.build(sub)

        # pad the block axis to a multiple of the mesh's block shards
        # (an SPMD axis must divide evenly; padded entries clone block 0 and
        # are dropped by unstack/decode, which read only the first B rows)
        nshards = int(self.mesh.shape["blocks"])
        B = len(sub)
        target = ((B + nshards - 1) // nshards) * nshards
        if target > B:
            pad = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[:1], target - B, axis=0)], axis=0)
            params_layers = jax.tree_util.tree_map(pad, params_layers)
            masks = [pad(m) for m in masks]
            batch = BlockBatch(pad(batch.data), pad(batch.weight),
                               pad(batch.valid), pad(batch.shapes),
                               batch.vmax, batch.ndim)

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

        bs = block_sharding(self.mesh)
        return _BucketState(
            block_idxs=list(idxs), models=models, spec=spec,
            params=jax.device_put(params_layers, bs),
            opt_state=jax.device_put(opt_state, bs),
            masks=jax.device_put(masks, bs),
            batch=batch,
            data=jax.device_put(batch.data, bs),
            weight=jax.device_put(batch.weight, bs),
            valid=jax.device_put(batch.valid, bs),
            shapes=jax.device_put(batch.shapes, bs),
            tx=tx, key=jax.random.PRNGKey(self.seed + 1),
            thres=jax.device_put(thres_arr, bs),
            use_thres=bool(np.any(thres_host != 0.0)),
            sampler_name=sub[0].get("sampler_name", cc.sampler.name))

    def _run_segment(self, st: _BucketState, cc, n_steps: int) -> np.ndarray:
        """Advance one bucket n_steps; returns last-step per-block losses.

        Scans are dispatched in SEGMENT_CAP-sized pieces — a single
        multi-minute device dispatch risks runtime watchdogs (see
        train/fit.py), and the pieces share one compiled shape."""
        from brief_pytorch_tpu.train.fit import segment_cap
        fullbatch = st.sampler_name == "randomcube"
        B = int(st.data.shape[0])
        per_block = (int(st.data.shape[1]) if fullbatch
                     else int(cc.sampler.sample_size))
        cap = segment_cap(B * per_block)
        remaining = n_steps
        losses = None
        while remaining > 0:
            seg_n = min(remaining, cap)
            st.key, seg = jax.random.split(st.key)
            st.params, st.opt_state, losses = run_block_segment(
                st.params, st.opt_state, st.masks, st.data, st.weight,
                st.valid, st.shapes, st.thres, seg, spec=st.spec, tx=st.tx,
                loss_name=cc.loss.name,
                beta=float(cc.loss.get("beta", 0.01)),
                use_thres=st.use_thres,
                n_steps=seg_n, sample_size=int(cc.sampler.sample_size),
                coords_mode=cc.coords_mode, half=bool(cc.half),
                fullbatch=fullbatch)
            remaining -= seg_n
        return np.asarray(losses[-1])[:len(st.models)]  # drop pad blocks

    def _fleet_params(self, blocks: List[Dict]) -> List[Dict]:
        """Per-block true-width params for the whole fleet, in block order."""
        out: List[Optional[Dict]] = [None] * len(blocks)
        for st in self._states:
            for bi, p in zip(st.block_idxs,
                             unstack_params(st.params, st.models)):
                out[bi] = p
        return out

    def decode(self, blocks: List[Dict], cc, decompress_cfg
               ) -> List[np.ndarray]:
        """Decode every block (vmapped padded grid inference) and return
        per-block float32 arrays in their true shapes, in block order."""
        results: List[Optional[np.ndarray]] = [None] * len(blocks)
        for st in self._states:
            slab = max(128, min(1 << 15, st.batch.vmax))
            slab = ((slab + 127) // 128) * 128
            out = decode_blocks(st.params, st.masks, st.shapes, spec=st.spec,
                                slab=slab, coords_mode=cc.coords_mode,
                                half=bool(cc.half), vmax=st.batch.vmax)
            out = np.asarray(out, np.float32)
            for i, bi in enumerate(st.block_idxs):
                shape = blocks[bi]["data_norm"].shape
                v = int(np.prod(shape[:-1]))
                results[bi] = out[i, :v].reshape(shape)
        return results
