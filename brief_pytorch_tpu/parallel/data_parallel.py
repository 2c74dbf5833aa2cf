"""Data-parallel single-INR training: coordinate batch sharded over chips.

The reference has no in-process multi-GPU path at all (SURVEY.md §2.3); its
only parallelism is one OS process per block.  For a single LARGE volume
(one network, billions of voxels) the TPU-native scaling axis is the
coordinate batch: the flattened volume is sharded over the mesh's 'data'
axis, every chip samples voxel batches from its own shard (equal-size
shards => statistically uniform global sampling), computes local gradients,
and gradients are averaged with one psum over ICI per step.  Parameters and
optimizer state stay replicated and bit-identical across chips (the psum'd
update is deterministic), so no parameter broadcast is ever needed.

Implemented with shard_map over a jax.sharding.Mesh so the collective is
explicit (jax.lax.pmean on the 'data' axis); the whole multi-step segment
is one lax.scan under jit, like train/fit.py's single-chip path.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from brief_pytorch_tpu.core.coords import index_to_coords
from brief_pytorch_tpu.train.loss import make_loss
from brief_pytorch_tpu.train.optim import make_optimizer


def _pad_to_multiple(arr: np.ndarray, m: int) -> np.ndarray:
    n = arr.shape[0]
    target = ((n + m - 1) // m) * m
    if target == n:
        return arr
    reps = np.repeat(arr[:1], target - n, axis=0)
    return np.concatenate([arr, reps], axis=0)


@partial(jax.jit,
         static_argnames=("mesh", "model", "spatial_shape", "coords_mode",
                          "tx", "loss_name", "beta", "weight_thres",
                          "n_steps", "local_batch", "half"))
def _dp_segment(params, opt_state, data_sharded, weight_sharded, key, *,
                mesh, model, spatial_shape, coords_mode, tx, loss_name,
                beta, weight_thres, n_steps, local_batch, half):
    loss_fn = make_loss(loss_name, beta)
    compute_dtype = jnp.bfloat16 if half else None
    ndata = mesh.shape["data"]
    pop = data_sharded.shape[0]
    local_pop = pop // ndata

    def shard_body(params, opt_state, local_data, local_weight, key):
        rank = jax.lax.axis_index("data")

        def step_fn(carry, k):
            params, opt_state = carry

            def loss_f(p):
                kk = jax.random.fold_in(k, rank)
                idx = jax.random.randint(kk, (local_batch,), 0, local_pop)
                vals = local_data[idx]
                # unit weights (the default) never ship a weight shard at
                # all — mirrors fit.py's fast path (a GB-scale all-ones
                # volume over the device link is pure waste)
                wts = (local_weight[idx] if local_weight is not None
                       else jnp.ones_like(vals))
                gidx = rank * local_pop + idx
                # padding rows (pop not divisible by the shard count) hold
                # copies of voxel 0 — map their global index back to 0 so
                # the coords match the values instead of falling outside
                # the volume
                true_pop = int(np.prod(spatial_shape))
                gidx = jnp.where(gidx < true_pop, gidx, 0)
                coords = index_to_coords(gidx, spatial_shape, coords_mode,
                                         vals.dtype)
                pred = model.apply(p, coords, compute_dtype=compute_dtype)
                return loss_fn(vals, pred.astype(vals.dtype), wts,
                               weight_thres)

            loss, grads = jax.value_and_grad(loss_f)(params)
            # ONE collective per step: average grads (and loss) over ICI
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (params, opt_state), losses = jax.lax.scan(
            step_fn, (params, opt_state), keys)
        return params, opt_state, losses

    return shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
    )(params, opt_state, data_sharded, weight_sharded, key)


def host_to_global(arr, sharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put.  Multi-process (jax.distributed):
    every process holds the full host value (each host reads the volume
    itself — the reference's shared-filesystem hand-off, main.py:547-575)
    and contributes its addressable shards.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


class DataParallelTrainer:
    """Train ONE phi network with the coordinate batch sharded over the
    mesh's 'data' axis.

    Config-reachable via `Compress.data_shards: N` (cli/main routes a
    SingleTask through this trainer when N > 1); the sampler must be
    (effectively) randompoint — the volume lives flattened and sharded.
    """

    def __init__(self, mesh, model, seed: int = 42):
        assert "data" in mesh.axis_names, mesh
        self.mesh = mesh
        self.model = model
        self.seed = seed
        self.ndata = int(mesh.shape["data"])

    def shard_volume(self, data_norm: np.ndarray, weight: np.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[int, ...]]:
        """Flatten (*spatial, c) -> (pop, c) padded to the shard count and
        placed with the leading axis split over 'data'.

        weight None (or all-ones) skips the weight shard entirely — no
        host->device transfer and no HBM residency for a unit volume."""
        spatial = tuple(int(s) for s in data_norm.shape[:-1])
        c = data_norm.shape[-1]
        flat = _pad_to_multiple(
            np.asarray(data_norm, np.float32).reshape(-1, c), self.ndata)
        sh = NamedSharding(self.mesh, P("data"))
        if weight is None or bool(np.all(np.asarray(weight) == 1.0)):
            return host_to_global(flat, sh), None, spatial
        wflat = _pad_to_multiple(
            np.asarray(weight, np.float32).reshape(-1, c), self.ndata)
        return (host_to_global(flat, sh), host_to_global(wflat, sh), spatial)

    # ---------------------------------------------------- segment API -----
    def prepare(self, data_norm: np.ndarray, weight: np.ndarray,
                compress_cfg, weight_thres_norm: float, params):
        """Shard the volume once and replicate params; returns
        (params, opt_state) ready for run_steps (used by NFGR.compress's
        checkpoint loop so the volume is not re-sharded per segment)."""
        cc = compress_cfg
        self._cc = cc
        self._data, self._weight, self._spatial = self.shard_volume(
            data_norm, weight)
        self._thres = float(weight_thres_norm)
        self._tx = make_optimizer(cc.optimizer_name_phi, float(cc.lr_phi),
                                  cc.lr_scheduler_phi)
        rep = NamedSharding(self.mesh, P())
        params = jax.tree_util.tree_map(
            lambda x: host_to_global(np.asarray(x), rep), params)
        opt_state = jax.jit(self._tx.init,
                            out_shardings=rep)(params)
        # ceil, not floor: equal per-shard batches cannot hit a non-divisible
        # global sample_size exactly, so round UP — the global batch is the
        # smallest multiple of ndata >= sample_size (floor silently dropped
        # up to ndata-1 coords per step, e.g. 100k over 3 shards -> 99,999)
        ss = int(cc.sampler.sample_size)
        self._local_batch = max(1, -(-ss // self.ndata))
        return params, opt_state

    @property
    def global_batch(self) -> int:
        """Coords per step across the mesh (>= cc.sampler.sample_size)."""
        return self._local_batch * self.ndata

    def run_steps(self, params, opt_state, n_steps: int, key):
        """One jitted multi-step segment (call repeatedly between
        checkpoints, threading params/opt_state/key)."""
        cc = self._cc
        return _dp_segment(
            params, opt_state, self._data, self._weight, key,
            mesh=self.mesh, model=self.model, spatial_shape=self._spatial,
            coords_mode=cc.coords_mode, tx=self._tx, loss_name=cc.loss.name,
            beta=float(cc.loss.get("beta", 0.01)), weight_thres=self._thres,
            n_steps=n_steps, local_batch=self._local_batch,
            half=bool(cc.half))

    def fit(self, params, data_norm: np.ndarray, weight: np.ndarray,
            compress_cfg, n_steps: int, opt_state=None,
            weight_thres_norm: float = None):
        """Run n_steps; returns (params, opt_state, per-step losses).

        weight_thres_norm: the weight_thres override threshold in the SAME
        (normalized) units as data_norm — the config's raw dtype-range value
        must be normalized by the caller exactly as fit.py does (reference
        main.py:380-383); comparing the raw value against normalized
        predictions would make the override always fire.  Defaults to
        cc.loss.weight_thres only when data was not normalized.
        """
        cc = compress_cfg
        if weight_thres_norm is None:
            raw = float(cc.loss.get("weight_thres", 0) or 0)
            if raw != 0:
                raise ValueError(
                    "cc.loss.weight_thres is in raw dtype units but "
                    "data_norm is normalized; normalize the threshold like "
                    "fit.py does and pass weight_thres_norm explicitly")
            weight_thres_norm = 0.0
        params, fresh_opt_state = self.prepare(data_norm, weight, cc,
                                               weight_thres_norm, params)
        if opt_state is None:
            opt_state = fresh_opt_state
        params, opt_state, losses = self.run_steps(
            params, opt_state, n_steps, jax.random.PRNGKey(self.seed))
        return params, opt_state, np.asarray(losses)
