"""NFLR compression frameworks: latent-modulated local INRs with optional
learned entropy coding.

Capability parity: reference utils/CompressFramework.py
  _BaseCompressFramerwork 20-145 (module-dict lifecycle, 5 serialization
  formats), _BaseNeuralFiledsLocalRep 146-265 (train/compress/decompress
  skeleton), _NFLR 266-292, NFLR_AutoDecoder 294-313, NFLR_AutoEncoder
  315-333, _NFLR_Coding 334-394 (UN + SGA rate-distortion), _NFLR_Coding_
  Hyper 441-532 (mean-scale hyperprior), the four Coding variants 396-588,
  ALLCF/init_compressframework 591-594, eval_performance 596-642;
  plus utils/misc.py loss_bpp_func 161-173, init_y/init_z 204-211,
  annealed_temperature 212-232.

TPU-first redesign: every training/compression step is ONE jitted program —
the auto-decoder's inner argmin over y runs as a lax.scan *inside* the
module step (the reference re-enters Python per inner step); SGA sampling
uses the JAX PRNG; entropy-model likelihoods evaluate on device.  Bitstream
I/O (rANS) and the overlap-weighted merge run on host.
"""
from __future__ import annotations

import math
import os
import pickle
import shutil
from functools import partial
from os.path import basename as opb
from os.path import join as opj
from os.path import splitext as ops
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from brief_pytorch_tpu.core.normalize import invnormalize_data, normalize_data
from brief_pytorch_tpu.io.archive import (extract_7z, read_7z,
                                          read_binary_yaml_zip, write_7z,
                                          write_binary_yaml_zip)
from brief_pytorch_tpu.io.image import get_folder_size
from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.nflr import entropy as em
from brief_pytorch_tpu.nflr.crop import (CropDataset, gen_data_path_list_list,
                                         gen_pathlist_fromimgdir,
                                         read_data_batch, reconstruct_cropped,
                                         save_data_batch)
from brief_pytorch_tpu.nflr.networks import (init_gmod, init_gy, init_hy,
                                             init_hz, siren_forward_syn)
from brief_pytorch_tpu.train.optim import make_optimizer


# --------------------------------------------------------------------------
# shared math (reference utils/misc.py)
# --------------------------------------------------------------------------
def loss_bpp_func(likelihoods: jnp.ndarray) -> jnp.ndarray:
    """Bits per pixel (reference utils/misc.py:161-173): the channel axis is
    *not* part of num_pixels."""
    if likelihoods.ndim == 5:
        n, c, d, h, w = likelihoods.shape
        num_pixels = d * h * w * n
    elif likelihoods.ndim == 4:
        n, c, h, w = likelihoods.shape
        num_pixels = h * w * n
    else:
        raise NotImplementedError(likelihoods.shape)
    return jnp.log(likelihoods).sum() / (-math.log(2) * num_pixels)


def init_y(key, batch_size: int, y_channel: int, pc_shape: tuple
           ) -> jnp.ndarray:
    """xavier_normal_(gain=10000) latent init (reference utils/misc.py:
    204-207; torch fan computation over (N, C, *pc))."""
    shape = (batch_size, y_channel) + tuple(pc_shape)
    receptive = int(np.prod(pc_shape))
    fan_in = y_channel * receptive
    fan_out = batch_size * receptive
    std = 10000.0 * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, jnp.float32)


init_z = init_y  # same initializer, z_channel instead (misc.py:208-211)


def annealed_temperature(t: int, r: float, ub: float, lb: float = 1e-8,
                         scheme: str = "exp", t0: int = 700) -> float:
    """SGA temperature schedule (reference utils/misc.py:212-232)."""
    if scheme == "exp":
        tau = math.exp(-r * t)
    elif scheme == "exp0":
        tau = ub * math.exp(-r * (t - t0))
    elif scheme == "linear":
        tau = -r * (t - t0) + ub
    else:
        raise NotImplementedError(scheme)
    return min(max(tau, lb), ub)


def sga_relax(key, y: jnp.ndarray, tau: float) -> jnp.ndarray:
    """Stochastic Gumbel Annealing quantisation relaxation
    (reference CompressFramework.py:341-351): Concrete/Gumbel-softmax sample
    over {floor(y), ceil(y)}."""
    eps = 1e-5
    y_floor = jnp.floor(y)
    y_ceil = jnp.ceil(y)
    bds = jnp.stack([y_floor, y_ceil], axis=-1)
    logits = jnp.stack(
        [-jnp.arctanh(jnp.clip(y - y_floor, -1 + eps, 1 - eps)) / tau,
         -jnp.arctanh(jnp.clip(y_ceil - y, -1 + eps, 1 - eps)) / tau],
        axis=-1)
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    sample = jax.nn.softmax((logits + g) / tau, axis=-1)
    return (bds * sample).sum(-1)


# --------------------------------------------------------------------------
# base framework
# --------------------------------------------------------------------------
class _BaseCompressFramework:
    """Module-dict lifecycle (reference CompressFramework.py:20-145).

    self.module maps name -> network object (init/apply pair);
    self.params maps name -> parameter pytree.  The torch eval/train/grad
    toggles are meaningless for pure-functional params and exist as no-ops
    for API compatibility.
    """

    def __init__(self, opt) -> None:
        self.opt = opt
        self.module: Dict[str, object] = {}
        self.params: Dict[str, object] = {}
        self.seed = int(opt.get("seed", 42))
        self._tx_cache: Dict[tuple, object] = {}

    def _opt_tx(self, name: str, lr: float):
        """Memoized optimizer transform.  Optax transforms hash by the
        identity of their update functions, and several of them are static
        jit args of the step helpers — constructing a fresh transform per
        training step forces a full recompile EVERY step (~20 s observed)."""
        key = (str(name), float(lr))
        if key not in self._tx_cache:
            self._tx_cache[key] = make_optimizer(str(name), float(lr))
        return self._tx_cache[key]

    # ------------------------------------------------------------- build --
    def init_module(self):
        raise NotImplementedError

    # -------------------------------------------------------- state dict --
    def _state_dict(self) -> Dict[str, object]:
        return jax.tree_util.tree_map(lambda x: np.asarray(x), self.params)

    def _load_state_dict(self, state: Dict[str, object]) -> None:
        self.params = jax.tree_util.tree_map(jnp.asarray, state)

    def save_module(self, save_path: str,
                    serializing_method: str = "torchsave") -> int:
        """5 formats (reference CompressFramework.py:56-95).  'torchsave*'
        keeps .pt interchange via torch tensors; 'numpysave*' writes one
        .npy per leaf; *_7z variants recompress with the archive codec."""
        state = self._state_dict()
        if serializing_method in ("torchsave", "torchsave_wo_new_zipfile"):
            self._torch_save(state, save_path,
                             new_zip=serializing_method == "torchsave")
        elif serializing_method in ("torchsave_7z",
                                    "torchsave_wo_new_zipfile_7z"):
            self._torch_save(state, save_path,
                             new_zip="wo" not in serializing_method)
            write_7z([save_path], save_path + "_7z", [opb(save_path)])
            os.remove(save_path)
            os.rename(save_path + "_7z", save_path)
        elif serializing_method == "numpysave":
            self._numpy_save(state, save_path)
        elif serializing_method == "numpysave_7z":
            self._numpy_save(state, save_path + "_tmp")
            write_7z([save_path + "_tmp"], save_path, "0")
            shutil.rmtree(save_path + "_tmp")
        else:
            raise NotImplementedError(serializing_method)
        return get_folder_size(save_path)

    def load_module(self, module_path: str,
                    serializing_method: str = "torchsave") -> None:
        """(reference CompressFramework.py:29-55)"""
        if serializing_method in ("torchsave", "torchsave_wo_new_zipfile"):
            state = self._torch_load(module_path)
        elif serializing_method in ("torchsave_7z",
                                    "torchsave_wo_new_zipfile_7z"):
            buf = next(iter(read_7z(module_path).values()))
            state = self._torch_load(buf)
        elif serializing_method == "numpysave":
            state = self._numpy_load(module_path)
        elif serializing_method == "numpysave_7z":
            tmp = opj(os.path.dirname(module_path) or ".", "temp_extracted")
            extract_7z(module_path, tmp)
            state = self._numpy_load(opj(tmp, "0"))
            shutil.rmtree(tmp)
        else:
            raise NotImplementedError(serializing_method)
        self._load_state_dict(state)

    @staticmethod
    def _torch_save(state, path, new_zip=True):
        import torch
        t_state = jax.tree_util.tree_map(
            lambda x: torch.from_numpy(np.array(x, copy=True)), state)
        torch.save(t_state, path, _use_new_zipfile_serialization=new_zip)

    @staticmethod
    def _torch_load(path_or_buf):
        import torch
        t_state = torch.load(path_or_buf, map_location="cpu",
                             weights_only=False)
        return jax.tree_util.tree_map(
            lambda t: t.numpy() if hasattr(t, "numpy") else t, t_state)

    def _numpy_save(self, state, save_path):
        os.makedirs(save_path)
        leaves, treedef = jax.tree_util.tree_flatten(state)
        with open(opj(save_path, "treedef.pkl"), "wb") as f:
            pickle.dump(treedef, f)
        for i, leaf in enumerate(leaves):
            np.save(opj(save_path, f"{i}.npy"), leaf)

    def _numpy_load(self, save_path):
        with open(opj(save_path, "treedef.pkl"), "rb") as f:
            treedef = pickle.load(f)
        leaves = [np.load(opj(save_path, f"{i}.npy"))
                  for i in range(treedef.num_leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # ----------------------------------------------------- torch-API compat
    def move_module_to(self, device: str):  # placement is XLA's job
        return

    def set_module_eval(self):
        return

    def set_module_train(self):
        return

    def set_module_no_grad(self):
        return

    def set_module_grad(self):
        return

    def module_parameters(self):
        """(reference CompressFramework.py:121-127)"""
        return self.params


# --------------------------------------------------------------------------
# NFLR base: modulated local INR
# --------------------------------------------------------------------------
class _BaseNFLR(_BaseCompressFramework):
    """(reference CompressFramework.py:146-265)"""

    # names of params trained by the module optimizer
    MODULE_KEYS: Tuple[str, ...] = ("phi", "gmod")

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self.y_channel = int(opt.Module.gmod.y_channel)
        self.data_channel = int(opt.Module.phi.data_channel)
        self.w0 = float(opt.Module.phi.get("w0", 30))
        self._key = jax.random.PRNGKey(self.seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------ modules --
    def _init_phi_gmod(self):
        phi_cfg = dict(self.opt.Module.phi)
        self.module["phi"] = init_phi(phi_cfg)
        self.params["phi"] = self.module["phi"].init(self._next_key())
        self.module["gmod"] = init_gmod(
            dim_hidden=int(self.opt.Module.phi.features),
            layers=int(self.opt.Module.phi.layers) - 1,
            **dict(self.opt.Module.gmod))
        self.params["gmod"] = self.module["gmod"].init(self._next_key())

    # ------------------------------------------------------------- synth --
    def sample_nf(self, coords: jnp.ndarray, mods) -> jnp.ndarray:
        """(reference CompressFramework.py:151-153)"""
        return siren_forward_syn(self.params["phi"]["layers"], coords, mods,
                                 w0=30.0, first_w0=self.w0)

    def _distortion(self, params: Dict, coords, y, data_gt) -> jnp.ndarray:
        """(reference CompressFramework.py:154-158)"""
        mods = self.module["gmod"].apply(params["gmod"], y)
        pred = siren_forward_syn(params["phi"]["layers"], coords, mods,
                                 w0=30.0, first_w0=self.w0)
        return jnp.mean((pred - data_gt) ** 2)

    # ------------------------------------------------------------ train ----
    def train(self, save_dir: str, Log=None) -> None:
        """Epoch loop over CropDataset (reference CompressFramework.py:
        160-221), each step one jitted program."""
        os.makedirs(opj(save_dir, "trained_module"), exist_ok=True)
        t = self.opt.Train
        train_paths = gen_pathlist_fromimgdir(t.train_data_dir)
        val_lists = gen_data_path_list_list(t.val_data_dir,
                                            int(t.get("val_data_quanity", 1)))
        dataset = CropDataset(int(t.batch_size), int(t.sample_size),
                              self.opt.Normalize, t.get("transform"),
                              self.opt.Module.crop, True, True,
                              data_path_list=train_paths, seed=self.seed)
        tx = make_optimizer(t.optimizer_name_module, float(t.lr_module))
        opt_state = tx.init(self._train_params())

        max_steps = int(t.max_steps)
        log_every = int(t.get("log_every_n_step", 100))
        val_every = int(t.get("val_every_n_step", max_steps))

        # --- true resume (train/checkpoint.py; beyond the reference) ---
        # NFLR training runs are the longest in this repo (tens of
        # thousands of steps over conv nets); Train.resume continues a
        # preempted run bit-identically: params, the module optimizer, the
        # quantile optimizers, and the threaded PRNG key round-trip, and
        # the seeded data pipeline is fast-forwarded (replayed without any
        # training math or key draws) to the stored step.
        from brief_pytorch_tpu.train import checkpoint as ckpt_lib
        state_path = opj(save_dir, "trainstate.npz")
        state_every = int(t.get("state_every_n_step", 0) or 0)
        fingerprint = {
            "kind": "nflr", "variant": type(self).__name__,
            "y_channel": int(self.y_channel),
            "phi": f"{self.opt.Module.phi.features}/"
                   f"{self.opt.Module.phi.layers}",
            "optimizer": str(t.optimizer_name_module),
            "lr": float(t.lr_module), "seed": int(self.seed),
            "batch": f"{t.batch_size}/{t.sample_size}",
            "Lambda": float(t.get("Lambda", 0) or 0),   # RD trade-off
        }
        aux_names = [n for n in ("_emy_opt", "_emz_opt") if hasattr(self, n)]

        def _save_state(steps: int) -> None:
            arrs = {"step": np.asarray(int(steps)),
                    "fingerprint": ckpt_lib.fingerprint_bytes(fingerprint),
                    "key": np.asarray(self._key)}
            ckpt_lib.pack_tree(arrs, "p", self.params)
            ckpt_lib.pack_tree(arrs, "o", opt_state)
            for n in aux_names:
                ckpt_lib.pack_tree(arrs, n, getattr(self, n))
            ckpt_lib.atomic_savez(state_path, arrs)

        start_step = 0
        resume = str(t.get("resume", "none") or "none")
        if resume != "none":
            path = ckpt_lib.resolve_trainstate(resume)
            with np.load(path) as z:
                ckpt_lib.check_fingerprint(z, fingerprint, path)
                self.params = ckpt_lib.unpack_tree(z, "p", self.params,
                                                   "params")
                opt_state = ckpt_lib.unpack_tree(z, "o", opt_state,
                                                 "opt_state")
                for n in aux_names:
                    setattr(self, n, ckpt_lib.unpack_tree(
                        z, n, getattr(self, n), n))
                self._key = jnp.asarray(z["key"])
                start_step = int(z["step"])
            if start_step >= max_steps:
                return

        steps = 0
        for epoch in range(int(1e8)):
            for (cropped, sampler, pc_shape, sideinfos) in dataset:
                for (coords, values) in sampler:
                    if steps < start_step:
                        # fast-forward: the restored key and optimizer
                        # states already account for these steps — replay
                        # the (seeded) data pipeline only
                        steps += 1
                        continue
                    loss, opt_state = self.training_step(
                        cropped, pc_shape, sideinfos, coords, values,
                        tx, opt_state)
                    steps += 1
                    if Log is not None and steps % log_every == 0:
                        Log.log_metrics({"loss/train": float(loss)}, steps)
                    if steps % val_every == 0 or steps == max_steps:
                        # evaluation compresses (SGA draws) with
                        # self._next_key() — snapshot/restore so the
                        # TRAINING key trajectory is independent of the
                        # val cadence (and of resume points: the state
                        # below must equal the key an uninterrupted run
                        # has at this step)
                        _train_key = self._key
                        self.save_module(
                            opj(save_dir, "trained_module",
                                f"epoch_{epoch}_step_{steps}.pt"))
                        perf = eval_performance(
                            val_lists, self,
                            opj(save_dir, "eval_results",
                                f"epoch_{epoch}_step_{steps}"), True)
                        if Log is not None:
                            Log.log_metrics(
                                {"performance/mse": float(perf["mse"].mean()),
                                 "performance/psnr": float(perf["psnr"].mean()),
                                 "performance/compress_ratio":
                                     float(perf["compress_ratio"].mean())},
                                steps)
                        self._key = _train_key
                    if (state_every and steps % state_every == 0) \
                            or steps == max_steps:
                        _save_state(steps)
                    if steps == max_steps:
                        return

    def _module_params(self) -> Dict:
        return {k: self.params[k] for k in self.MODULE_KEYS}

    def _train_params(self) -> Dict:
        """The exact parameter tree training_step optimizes — train() must
        init the optimizer over THIS tree (the hyper variants' training
        trees are supersets of their _module_params)."""
        return self._module_params()

    def _set_module_params(self, p: Dict) -> None:
        for k in self.MODULE_KEYS:
            self.params[k] = p[k]

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        raise NotImplementedError

    def training_segment(self, cropped, pc_shape, sideinfos, coords, values,
                         tx, opt_state, n_steps: int):
        """n_steps of training as one call -> (losses (n_steps,), opt_state).

        Default: a host loop over training_step (exact per-step key walk).
        The coding/hyper variants override this with a single scan-fused
        device program (_fused_training_segment) — the form long training
        runs and RD sweeps should use.
        """
        losses = []
        for _ in range(int(n_steps)):
            loss, opt_state = self.training_step(
                cropped, pc_shape, sideinfos, coords, values, tx, opt_state)
            losses.append(loss)
        return jnp.stack([jnp.asarray(l) for l in losses]), opt_state

    # ---------------------------------------------------------- compress ---
    def compress(self, data_path_list: List[str], save_path: str = None):
        """(reference CompressFramework.py:226-241)"""
        dataset = CropDataset(len(data_path_list),
                              int(self.opt.Compress.sample_size),
                              self.opt.Normalize, None, self.opt.Module.crop,
                              False, True, data_path_list=data_path_list,
                              seed=self.seed)
        cropped, sampler, pc_shape, sideinfos = next(iter(dataset))
        return self.compressing_data(cropped, sampler, pc_shape, sideinfos,
                                     save_path)

    def compressing_data(self, cropped, sampler, pc_shape, sideinfos,
                         save_path):
        raise NotImplementedError

    # -------------------------------------------------------- decompress ---
    def decompress(self, compressed_data_path: str = None,
                   compressed_data: Dict = None,
                   save_path_list: List[str] = None) -> np.ndarray:
        """(reference CompressFramework.py:246-261)"""
        y, sideinfos = self.decompressing_data(compressed_data_path,
                                               compressed_data)
        mods = self.module["gmod"].apply(self.params["gmod"], jnp.asarray(y))
        data = reconstruct_cropped(sideinfos["data_shape"],
                                   int(self.opt.Decompress.sample_size),
                                   mods, self.sample_nf,
                                   **dict(self.opt.Module.crop))
        data = invnormalize_data(data, sideinfos, **self.opt.Normalize)
        if save_path_list is not None:
            save_data_batch(data, save_path_list)
        return data

    def decompressing_data(self, compressed_data_path, compressed_data):
        raise NotImplementedError


# --------------------------------------------------------------------------
# distortion-only family
# --------------------------------------------------------------------------
class _NFLR(_BaseNFLR):
    """y optimised for distortion only; payload = raw float y
    (reference CompressFramework.py:266-292)."""

    def compressing_data(self, cropped, sampler, pc_shape, sideinfos,
                         save_path):
        y = self.init_compressing_y(cropped, sideinfos, pc_shape)
        tx_y = self._opt_tx(self.opt.Compress.optimizer_name_y,
                            self.opt.Compress.lr_y)
        opt_y = tx_y.init(y)
        steps = 0
        max_steps = int(self.opt.Compress.max_steps)
        step_fn = self._y_step_fn(tx_y)
        if len(sampler) == 1:
            # full-population batch: fuse the y-argmin into scan segments
            coords, values = next(iter(sampler))
            coords, values = jnp.asarray(coords), jnp.asarray(values)
            params = self._module_params()
            while steps < max_steps:
                seg = min(500, max_steps - steps)
                y, opt_y = self._y_argmin_segment(params, y, opt_y, coords,
                                                  values, tx_y=tx_y,
                                                  dist=self._distortion,
                                                  n_steps=seg)
                steps += seg
        else:
            done = False
            while not done:
                for (coords, values) in sampler:
                    y, opt_y, loss = step_fn(y, opt_y,
                                             self._module_params(),
                                             coords, values)
                    steps += 1
                    if steps == max_steps:
                        done = True
                        break
        compressed = {"sideinfos": sideinfos, "y": np.asarray(y)}
        if save_path is not None:
            with open(save_path, "wb") as f:
                pickle.dump(compressed, f)
        return compressed

    @staticmethod
    @partial(jax.jit, static_argnames=("tx_y", "dist", "n_steps"))
    def _y_argmin_segment(params, y, opt_y, coords, values, *, tx_y, dist,
                          n_steps):
        def step(carry, _):
            y, opt_y = carry
            loss, g = jax.value_and_grad(
                lambda yy: dist(params, coords, yy, values))(y)
            upd, opt_y = tx_y.update(g, opt_y, y)
            return (optax.apply_updates(y, upd), opt_y), loss

        (y, opt_y), _ = jax.lax.scan(step, (y, opt_y), None, length=n_steps)
        return y, opt_y

    @partial(jax.jit, static_argnums=(0, 1))
    def _y_step(self, tx_y, y, opt_y, module_params, coords, values):
        loss, g = jax.value_and_grad(
            lambda yy: self._distortion(module_params, coords, yy, values))(y)
        upd, opt_y = tx_y.update(g, opt_y, y)
        return optax.apply_updates(y, upd), opt_y, loss

    def _y_step_fn(self, tx_y):
        return lambda *a: self._y_step(tx_y, *a)

    def decompressing_data(self, compressed_data_path, compressed_data):
        if compressed_data_path is not None:
            with open(compressed_data_path, "rb") as f:
                compressed_data = pickle.load(f)
        return compressed_data["y"], compressed_data["sideinfos"]

    def init_compressing_y(self, cropped, sideinfos, pc_shape):
        raise NotImplementedError


class NFLR_AutoDecoder(_NFLR):
    """Per-batch y found by inner argmin (reference CompressFramework.py:
    294-313)."""

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()

    def init_compressing_y(self, cropped, sideinfos, pc_shape):
        return init_y(self._next_key(), sideinfos["data_shape"][0],
                      self.y_channel, pc_shape)

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        params = self._module_params()
        y0 = init_y(self._next_key(), sideinfos["data_shape"][0],
                    self.y_channel, pc_shape)
        loss, new_params, opt_state = _autodecoder_step(
            params, opt_state, y0, coords, values, tx=tx,
            dist=self._distortion,
            argmin_steps=int(self.opt.Train.argmin_steps),
            tx_y=self._opt_tx(self.opt.Train.optimizer_name_y,
                              self.opt.Train.lr_y))
        self._set_module_params(new_params)
        return loss, opt_state


class NFLR_AutoEncoder(_NFLR):
    """y produced by the conv encoder hy (reference CompressFramework.py:
    315-333)."""
    MODULE_KEYS = ("phi", "gmod", "hy")

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()
        self.module["hy"] = init_hy(
            ps_d=self.opt.Module.crop.ps_d, ps_h=self.opt.Module.crop.ps_h,
            ps_w=self.opt.Module.crop.ps_w, y_channel=self.y_channel,
            data_channel=self.data_channel, **dict(self.opt.Module.hy))
        self.params["hy"] = self.module["hy"].init(self._next_key())

    def init_compressing_y(self, cropped, sideinfos, pc_shape):
        return self.module["hy"].apply(self.params["hy"], cropped,
                                       int(self.opt.Compress.get("hy_bs", 0)))

    def _ae_loss(self, p, cropped, coords, values):
        y = self.module["hy"].apply(p["hy"], cropped)
        return self._distortion(p, coords, y, values)

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        params = self._module_params()
        loss, new_params, opt_state = _module_step(
            params, opt_state, (cropped, coords, values),
            loss_fn=self._ae_loss, tx=tx)
        self._set_module_params(new_params)
        return loss, opt_state


# jitted helpers shared by the variants -------------------------------------
@partial(jax.jit, static_argnames=("tx", "dist", "argmin_steps", "tx_y"))
def _autodecoder_step(params, opt_state, y0, coords, values, *, tx, dist,
                      argmin_steps, tx_y):
    """Inner y-argmin as a lax.scan, then one module step — the whole
    reference training_step (CompressFramework.py:301-309) as one program."""
    def y_step(carry, _):
        y, opt_y = carry
        g = jax.grad(lambda yy: dist(params, coords, yy, values))(y)
        upd, opt_y = tx_y.update(g, opt_y, y)
        return (optax.apply_updates(y, upd), opt_y), None

    (y, _), _ = jax.lax.scan(y_step, (y0, tx_y.init(y0)), None,
                             length=argmin_steps)
    loss, grads = jax.value_and_grad(
        lambda p: dist(p, coords, y, values))(params)
    upd, opt_state = tx.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, upd), opt_state


@partial(jax.jit, static_argnames=("loss_fn", "tx"))
def _module_step(params, opt_state, args, *, loss_fn, tx):
    """One jitted module-gradient step.  loss_fn must be a STABLE callable
    (a bound method — fresh closures would be new static cache keys and
    recompile every step, the ~20s-per-step bug class); traced data rides
    in the `args` tuple."""
    loss, grads = jax.value_and_grad(lambda p: loss_fn(p, *args))(params)
    upd, opt_state = tx.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, upd), opt_state


# --------------------------------------------------------------------------
# coding family (factorized entropy model on y)
# --------------------------------------------------------------------------
class _NFLR_Coding(_NFLR):
    """Rate-distortion training (uniform-noise) + SGA compression + rANS
    bitstreams (reference CompressFramework.py:334-394)."""

    def _loss_rd_un(self, params, key, coords, values, y, Lambda):
        """(reference CompressFramework.py:335-340)"""
        y_noisy, y_lik = em.factorized_forward(params["emy"], y, key,
                                               training=True)
        return (loss_bpp_func(y_lik)
                + Lambda * self._distortion(params, coords, y_noisy, values))

    def _loss_rd_sga(self, params, key, coords, values, y, Lambda, tau):
        """(reference CompressFramework.py:341-363)"""
        y_tilde = sga_relax(key, y, tau)
        flat, shape, _ = em._to_c1n(y_tilde)
        y_lik = em._from_c1n(
            em.factorized_likelihood(params["emy"], flat), shape)
        return (loss_bpp_func(y_lik)
                + Lambda * self._distortion(params, coords, y_tilde, values))

    def _init_emy(self):
        cfg = dict(self.opt.Module.emy)
        cfg.pop("name", None)
        self._emy_tx = make_optimizer(cfg.pop("optimizer_name_quantiles",
                                              "Adam"),
                                      float(cfg.pop("lr_quantiles", 1e-3)))
        self.params["emy"] = em.factorized_init(
            self._next_key(), self.y_channel,
            filters=tuple(cfg.get("filters", (3, 3, 3, 3))),
            init_scale=float(cfg.get("init_scale", 10)))
        self._emy_opt = self._emy_tx.init(self.params["emy"]["quantiles"])
        self.module["emy"] = "factorized"   # marker for save/load

    def update_quantiles_once(self):
        """(reference Networks.py:1070-1074)"""
        q, self._emy_opt, loss = _quantile_step(
            self.params["emy"], self._emy_opt, self._emy_tx)
        self.params["emy"] = {**self.params["emy"], "quantiles": q}
        # device scalar, NOT float(): a host sync here would serialize every
        # training step against the device (callers cast when they log)
        return loss

    def compressing_data(self, cropped, sampler, pc_shape, sideinfos,
                         save_path):
        c = self.opt.Compress
        y = self.init_compressing_y(cropped, sideinfos, pc_shape)
        tx_y = self._opt_tx(c.optimizer_name_y, c.lr_y)
        opt_y = tx_y.init(y)
        steps = 0
        max_steps = int(c.max_steps)
        Lambda = float(self.opt.Train.Lambda)

        def _tau(epoch):
            return annealed_temperature(
                epoch, r=float(c.annealing_rate),
                ub=float(c.init_temperature),
                scheme=c.annealing_scheme, t0=int(c.t0))

        if len(sampler) == 1:
            # full population in one batch: every step sees the same
            # (loss-order-invariant) batch and epoch == step, so the SGA
            # argmin fuses into scan segments (same per-step math at
            # device speed; segment-local key stream)
            coords, values = next(iter(sampler))
            coords, values = jnp.asarray(coords), jnp.asarray(values)
            while steps < max_steps:
                seg = min(500, max_steps - steps)
                taus = jnp.asarray([_tau(steps + i) for i in range(seg)],
                                   jnp.float32)
                y, opt_y, _ = _sga_y_segment(
                    self._coding_params(), y, opt_y, self._next_key(),
                    coords, values, Lambda, taus, tx_y=tx_y,
                    loss_fn=self._loss_rd_sga, n_steps=seg)
                steps += seg
        else:
            done = False
            for epoch in range(int(1e8)):
                for (coords, values) in sampler:
                    y, opt_y, loss = _sga_y_step(
                        self._coding_params(), y, opt_y, self._next_key(),
                        coords, values, Lambda, _tau(epoch), tx_y=tx_y,
                        loss_fn=self._loss_rd_sga)
                    steps += 1
                    if steps == max_steps:
                        done = True
                        break
                if done:
                    break
        tables = em.factorized_build_tables(self.params["emy"])
        y_np = np.asarray(y)
        y_strings = em.factorized_compress(self.params["emy"], tables, y_np)
        sideinfos["y_shape"] = [int(s) for s in y_np.shape[2:]]
        if save_path is not None:
            write_binary_yaml_zip({"y_strings": y_strings},
                                  dict(sideinfos), save_path)
        return {"y_strings": y_strings, "sideinfos": sideinfos}

    def _coding_params(self):
        return {**self._module_params(), "emy": self.params["emy"]}

    def decompressing_data(self, compressed_data_path, compressed_data):
        """(reference CompressFramework.py:385-394)"""
        if compressed_data_path is not None:
            blobs, sideinfos = read_binary_yaml_zip(["y_strings"],
                                                    compressed_data_path)
            compressed_data = {**blobs, "sideinfos": sideinfos}
        sideinfos = compressed_data["sideinfos"]
        tables = em.factorized_build_tables(self.params["emy"])
        y = em.factorized_decompress(self.params["emy"], tables,
                                     compressed_data["y_strings"],
                                     sideinfos["y_shape"])
        return y, sideinfos


@partial(jax.jit, static_argnames=("tx",))
def _quantile_step(emy_params, opt_state, tx):
    def loss_f(q):
        return em.quantile_loss({**emy_params, "quantiles": q})
    loss, g = jax.value_and_grad(loss_f)(emy_params["quantiles"])
    upd, opt_state = tx.update(g, opt_state, emy_params["quantiles"])
    return optax.apply_updates(emy_params["quantiles"], upd), opt_state, loss


@partial(jax.jit, static_argnames=("tx", "tx_y", "tx_z", "tx_q",
                                   "argmin_steps", "loss_un", "n_steps",
                                   "n", "y_channel", "z_channel",
                                   "pc_shape", "mode", "em_key"))
def _fused_training_segment(params, opt_state, q_opt, key, cropped, coords,
                            values, Lambda, *, tx, tx_y, tx_z, tx_q,
                            argmin_steps, loss_un, n_steps, n, y_channel,
                            z_channel, pc_shape, mode, em_key):
    """n_steps NFLR training steps fused into ONE lax.scan program.

    The per-step API (training_step) pays a host->device batch upload and
    a dispatch round-trip per step — over the dev tunnel that bounds
    training at a few steps/s regardless of chip speed.  This runs the
    SAME per-step math (the per-variant jitted step + the quantile
    auxiliary step, reference CompressFramework.py:301-309 + Networks.py:
    1070-1074) with everything device-resident, folding one segment key
    into per-step keys (a deterministic stream, though not the same
    stream as n calls to training_step, which draws from the framework's
    stateful key walk).  mode: coding_ad | coding_ae | hyper_ad |
    hyper_ae; em_key names the factorized model whose quantiles get the
    auxiliary update (emy / emz).
    """
    def qstep(p, qo):
        def loss_f(q):
            return em.quantile_loss({**p[em_key], "quantiles": q})
        g = jax.grad(loss_f)(p[em_key]["quantiles"])
        upd, qo = tx_q.update(g, qo, p[em_key]["quantiles"])
        q = optax.apply_updates(p[em_key]["quantiles"], upd)
        return {**p, em_key: {**p[em_key], "quantiles": q}}, qo

    def step(carry, k):
        p, o, qo = carry
        if mode == "coding_ad":
            k1, k2 = jax.random.split(k)
            y0 = init_y(k1, n, y_channel, pc_shape)
            loss, p, o = _coding_autodecoder_step(
                p, o, y0, k2, coords, values, Lambda, tx=tx, tx_y=tx_y,
                argmin_steps=argmin_steps, loss_un=loss_un)
        elif mode == "hyper_ad":
            k1, k2, k3 = jax.random.split(k, 3)
            y0 = init_y(k1, n, y_channel, pc_shape)
            z0 = init_z(k2, n, z_channel, pc_shape)
            loss, p, o = _hyper_autodecoder_step(
                p, o, y0, z0, k3, coords, values, Lambda, tx=tx, tx_y=tx_y,
                tx_z=tx_z, argmin_steps=argmin_steps, loss_un=loss_un)
        else:  # coding_ae / hyper_ae: plain module step on the AE loss
            loss, p, o = _module_step(
                p, o, (k, cropped, coords, values, Lambda),
                loss_fn=loss_un, tx=tx)
        p, qo = qstep(p, qo)
        return (p, o, qo), loss

    keys = jax.random.split(key, n_steps)
    (params, opt_state, q_opt), losses = jax.lax.scan(
        step, (params, opt_state, q_opt), keys)
    return losses, params, opt_state, q_opt


@partial(jax.jit, static_argnames=("tx_y", "loss_fn"))
def _sga_y_step(params, y, opt_y, key, coords, values, Lambda, tau, *,
                tx_y, loss_fn):
    loss, g = jax.value_and_grad(
        lambda yy: loss_fn(params, key, coords, values, yy, Lambda, tau))(y)
    upd, opt_y = tx_y.update(g, opt_y, y)
    return optax.apply_updates(y, upd), opt_y, loss


@partial(jax.jit, static_argnames=("tx_y", "loss_fn", "n_steps"))
def _sga_y_segment(params, y, opt_y, key, coords, values, Lambda, taus, *,
                   tx_y, loss_fn, n_steps):
    """n_steps of _sga_y_step as ONE scan (full-population batch case);
    taus carries the per-step annealed temperatures."""
    def step(carry, xs):
        y, opt_y = carry
        k, tau = xs
        loss, g = jax.value_and_grad(
            lambda yy: loss_fn(params, k, coords, values, yy, Lambda,
                               tau))(y)
        upd, opt_y = tx_y.update(g, opt_y, y)
        return (optax.apply_updates(y, upd), opt_y), loss

    keys = jax.random.split(key, n_steps)
    (y, opt_y), losses = jax.lax.scan(step, (y, opt_y), (keys, taus))
    return y, opt_y, losses


@partial(jax.jit, static_argnames=("tx_y", "tx_z", "loss_fn", "n_steps"))
def _sga_yz_segment(params, y, z, opt_y, opt_z, key, coords, values, Lambda,
                    taus, *, tx_y, tx_z, loss_fn, n_steps):
    """n_steps of _sga_yz_step as ONE scan (full-population batch case)."""
    def step(carry, xs):
        y, z, opt_y, opt_z = carry
        k, tau = xs
        loss, (gy, gz) = jax.value_and_grad(
            lambda yy, zz: loss_fn(params, k, coords, values, yy, zz,
                                   Lambda, tau), argnums=(0, 1))(y, z)
        upd_y, opt_y = tx_y.update(gy, opt_y, y)
        upd_z, opt_z = tx_z.update(gz, opt_z, z)
        return (optax.apply_updates(y, upd_y),
                optax.apply_updates(z, upd_z), opt_y, opt_z), loss

    keys = jax.random.split(key, n_steps)
    (y, z, opt_y, opt_z), losses = jax.lax.scan(
        step, (y, z, opt_y, opt_z), (keys, taus))
    return y, z, opt_y, opt_z, losses


@partial(jax.jit, static_argnames=("tx", "tx_y", "argmin_steps", "loss_un"))
def _coding_autodecoder_step(params, opt_state, y0, key, coords, values,
                             Lambda, *, tx, tx_y, argmin_steps, loss_un):
    def y_step(carry, k):
        y, opt_y = carry
        g = jax.grad(lambda yy: loss_un(params, k, coords, values, yy,
                                        Lambda))(y)
        upd, opt_y = tx_y.update(g, opt_y, y)
        return (optax.apply_updates(y, upd), opt_y), None

    keys = jax.random.split(key, argmin_steps + 1)
    (y, _), _ = jax.lax.scan(y_step, (y0, tx_y.init(y0)), keys[:-1])
    loss, grads = jax.value_and_grad(
        lambda p: loss_un(p, keys[-1], coords, values, y, Lambda))(params)
    upd, opt_state = tx.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, upd), opt_state


class NFLR_Coding_AutoDecoder(_NFLR_Coding):
    """(reference CompressFramework.py:396-417)"""
    MODULE_KEYS = ("phi", "gmod", "emy")

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()
        self._init_emy()

    def init_compressing_y(self, cropped, sideinfos, pc_shape):
        return init_y(self._next_key(), sideinfos["data_shape"][0],
                      self.y_channel, pc_shape)

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        params = self._coding_params()
        y0 = init_y(self._next_key(), sideinfos["data_shape"][0],
                    self.y_channel, pc_shape)
        loss, new_params, opt_state = _coding_autodecoder_step(
            params, opt_state, y0, self._next_key(), coords, values,
            float(self.opt.Train.Lambda), tx=tx,
            tx_y=self._opt_tx(self.opt.Train.optimizer_name_y,
                              self.opt.Train.lr_y),
            argmin_steps=int(self.opt.Train.argmin_steps),
            loss_un=self._loss_rd_un)
        self._set_module_params(new_params)
        self.params["emy"] = new_params["emy"]
        self.update_quantiles_once()
        return loss, opt_state

    def training_segment(self, cropped, pc_shape, sideinfos, coords, values,
                         tx, opt_state, n_steps: int):
        t = self.opt.Train
        losses, new_params, opt_state, self._emy_opt = \
            _fused_training_segment(
                self._coding_params(), opt_state, self._emy_opt,
                self._next_key(), jnp.asarray(cropped), coords, values,
                float(t.Lambda), tx=tx,
                tx_y=self._opt_tx(t.optimizer_name_y, t.lr_y), tx_z=None,
                tx_q=self._emy_tx, argmin_steps=int(t.argmin_steps),
                loss_un=self._loss_rd_un, n_steps=int(n_steps),
                n=int(sideinfos["data_shape"][0]),
                y_channel=self.y_channel, z_channel=0,
                pc_shape=tuple(int(x) for x in pc_shape),
                mode="coding_ad", em_key="emy")
        self._set_module_params(new_params)
        self.params["emy"] = new_params["emy"]
        return losses, opt_state


class NFLR_Coding_AutoEncoder(_NFLR_Coding):
    """(reference CompressFramework.py:419-439)"""
    MODULE_KEYS = ("phi", "gmod", "emy", "hy")

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()
        self._init_emy()
        self.module["hy"] = init_hy(
            ps_d=self.opt.Module.crop.ps_d, ps_h=self.opt.Module.crop.ps_h,
            ps_w=self.opt.Module.crop.ps_w, y_channel=self.y_channel,
            data_channel=self.data_channel, **dict(self.opt.Module.hy))
        self.params["hy"] = self.module["hy"].init(self._next_key())

    def init_compressing_y(self, cropped, sideinfos, pc_shape):
        return self.module["hy"].apply(self.params["hy"], cropped,
                                       int(self.opt.Compress.get("hy_bs", 0)))

    def _ae_rd_loss(self, p, key, cropped, coords, values, Lambda):
        y = self.module["hy"].apply(p["hy"], cropped)
        return self._loss_rd_un(p, key, coords, values, y, Lambda)

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        params = {k: self.params[k] for k in self.MODULE_KEYS}
        loss, new_params, opt_state = _module_step(
            params, opt_state,
            (self._next_key(), cropped, coords, values,
             float(self.opt.Train.Lambda)),
            loss_fn=self._ae_rd_loss, tx=tx)
        self._set_module_params(new_params)
        self.update_quantiles_once()
        return loss, opt_state

    def training_segment(self, cropped, pc_shape, sideinfos, coords, values,
                         tx, opt_state, n_steps: int):
        losses, new_params, opt_state, self._emy_opt = \
            _fused_training_segment(
                {k: self.params[k] for k in self.MODULE_KEYS}, opt_state,
                self._emy_opt, self._next_key(), jnp.asarray(cropped),
                coords, values, float(self.opt.Train.Lambda), tx=tx,
                tx_y=None, tx_z=None, tx_q=self._emy_tx, argmin_steps=0,
                loss_un=self._ae_rd_loss, n_steps=int(n_steps),
                n=int(sideinfos["data_shape"][0]),
                y_channel=self.y_channel, z_channel=0,
                pc_shape=tuple(int(x) for x in pc_shape),
                mode="coding_ae", em_key="emy")
        self._set_module_params(new_params)
        return losses, opt_state


# --------------------------------------------------------------------------
# hyperprior family
# --------------------------------------------------------------------------

def _exp_scales(log_scales):
    """exp with the log clipped to +-20 — 'make positive' like the reference
    (CompressFramework.py:447) but finite under the reference's own
    xavier-gain-10000 latent init (utils/misc.py:204-211), whose first
    hyper forward otherwise drives exp to inf and NaNs every gradient.
    In the trained regime the clip is a no-op: scales are floored at
    scale_bound (0.11) below and the scale table tops out near 256."""
    return jnp.exp(jnp.clip(log_scales, -20.0, 20.0))


class _NFLR_Coding_Hyper(_NFLR_Coding):
    """Mean-scale hyperprior on y (reference CompressFramework.py:441-532)."""

    def _init_hyper(self):
        self.z_channel = int(self.opt.Module.gy.z_channel)
        self.module["gy"] = init_gy(y_channel=self.y_channel,
                                    **dict(self.opt.Module.gy))
        self.params["gy"] = self.module["gy"].init(self._next_key())
        cfg = dict(self.opt.Module.emz)
        cfg.pop("name", None)
        self._emz_tx = make_optimizer(cfg.pop("optimizer_name_quantiles",
                                              "Adam"),
                                      float(cfg.pop("lr_quantiles", 1e-3)))
        self.params["emz"] = em.factorized_init(
            self._next_key(), self.z_channel,
            filters=tuple(cfg.get("filters", (3, 3, 3, 3))),
            init_scale=float(cfg.get("init_scale", 10)))
        self._emz_opt = self._emz_tx.init(self.params["emz"]["quantiles"])
        self.module["emz"] = "factorized"
        self.module["emyz"] = "gaussian"
        self._gauss_tables = None
        self.scale_bound = float(self.opt.Module.emyz.get("scale_bound", 0.11))

    def _loss_rd_hyper_un(self, params, key, coords, values, y, z, Lambda):
        """(reference CompressFramework.py:442-452)"""
        kz, ky = jax.random.split(key)
        z_noisy, z_lik = em.factorized_forward(params["emz"], z, kz,
                                               training=True)
        scales_hat, means_hat = self.module["gy"].apply(params["gy"], z_noisy)
        scales_hat = _exp_scales(scales_hat)
        noise = jax.random.uniform(ky, y.shape, y.dtype, -0.5, 0.5)
        y_noisy = y + noise
        y_lik = em.gaussian_likelihood(y_noisy, scales_hat, means_hat,
                                       self.scale_bound)
        return (loss_bpp_func(y_lik) + loss_bpp_func(z_lik)
                + Lambda * self._distortion(params, coords, y_noisy, values))

    def _loss_rd_hyper_sga(self, params, key, coords, values, y, z, Lambda,
                           tau):
        """(reference CompressFramework.py:453-489)"""
        kz, ky = jax.random.split(key)
        z_tilde = sga_relax(kz, z, tau)
        flat, shape, _ = em._to_c1n(z_tilde)
        z_lik = em._from_c1n(
            em.factorized_likelihood(params["emz"], flat), shape)
        scales_hat, means_hat = self.module["gy"].apply(params["gy"], z_tilde)
        scales_hat = _exp_scales(scales_hat)
        y_tilde = sga_relax(ky, y, tau)
        y_lik = em.gaussian_likelihood(y_tilde, scales_hat, means_hat,
                                       self.scale_bound)
        return (loss_bpp_func(y_lik) + loss_bpp_func(z_lik)
                + Lambda * self._distortion(params, coords, y_tilde, values))

    def _hyper_params(self):
        return {**self._module_params(), "emz": self.params["emz"],
                "gy": self.params["gy"]}

    def update_z_quantiles_once(self):
        q, self._emz_opt, loss = _quantile_step(
            self.params["emz"], self._emz_opt, self._emz_tx)
        self.params["emz"] = {**self.params["emz"], "quantiles": q}
        return float(loss)

    def compressing_data(self, cropped, sampler, pc_shape, sideinfos,
                         save_path):
        c = self.opt.Compress
        y, z = self.init_compressing_yz(cropped, sideinfos, pc_shape)
        tx_y = self._opt_tx(c.optimizer_name_y, c.lr_y)
        tx_z = self._opt_tx(c.optimizer_name_z, c.lr_z)
        opt_y, opt_z = tx_y.init(y), tx_z.init(z)
        steps = 0
        max_steps = int(c.max_steps)
        Lambda = float(self.opt.Train.Lambda)

        def _tau(epoch):
            return annealed_temperature(
                epoch, r=float(c.annealing_rate),
                ub=float(c.init_temperature),
                scheme=c.annealing_scheme, t0=int(c.t0))

        if len(sampler) == 1:
            # full-population batch: fuse the SGA argmin into scan
            # segments (see the coding variant's compressing_data)
            coords, values = next(iter(sampler))
            coords, values = jnp.asarray(coords), jnp.asarray(values)
            while steps < max_steps:
                seg = min(500, max_steps - steps)
                taus = jnp.asarray([_tau(steps + i) for i in range(seg)],
                                   jnp.float32)
                y, z, opt_y, opt_z, _ = _sga_yz_segment(
                    self._hyper_params(), y, z, opt_y, opt_z,
                    self._next_key(), coords, values, Lambda, taus,
                    tx_y=tx_y, tx_z=tx_z, loss_fn=self._loss_rd_hyper_sga,
                    n_steps=seg)
                steps += seg
            return self._encode_yz(y, z, sideinfos, save_path)
        for epoch in range(int(1e8)):
            for (coords, values) in sampler:
                y, z, opt_y, opt_z, loss = _sga_yz_step(
                    self._hyper_params(), y, z, opt_y, opt_z,
                    self._next_key(), coords, values, Lambda, _tau(epoch),
                    tx_y=tx_y, tx_z=tx_z, loss_fn=self._loss_rd_hyper_sga)
                steps += 1
                if steps == max_steps:
                    return self._encode_yz(y, z, sideinfos, save_path)

    def _encode_yz(self, y, z, sideinfos, save_path):
        """(reference CompressFramework.py:506-517)"""
        z_np, y_np = np.asarray(z), np.asarray(y)
        z_tables = em.factorized_build_tables(self.params["emz"])
        z_strings = em.factorized_compress(self.params["emz"], z_tables, z_np)
        z_rec = em.factorized_decompress(self.params["emz"], z_tables,
                                         z_strings, z_np.shape[2:])
        scales, means = self.module["gy"].apply(self.params["gy"],
                                                jnp.asarray(z_rec))
        scales = np.asarray(_exp_scales(scales))
        g_tables = self._gaussian_tables()
        indexes = em.build_indexes(scales, g_tables.scale_table)
        y_strings = em.gaussian_compress(g_tables, y_np, indexes,
                                         np.asarray(means))
        sideinfos["z_shape"] = [int(s) for s in z_np.shape[2:]]
        if save_path is not None:
            write_binary_yaml_zip(
                {"y_strings": y_strings, "z_strings": z_strings},
                dict(sideinfos), save_path)
        return {"y_strings": y_strings, "z_strings": z_strings,
                "sideinfos": sideinfos}

    def _gaussian_tables(self):
        if self._gauss_tables is None:
            self._gauss_tables = em.GaussianTables.build()
        return self._gauss_tables

    def decompressing_data(self, compressed_data_path, compressed_data):
        """(reference CompressFramework.py:518-532)"""
        if compressed_data_path is not None:
            blobs, sideinfos = read_binary_yaml_zip(
                ["y_strings", "z_strings"], compressed_data_path)
            compressed_data = {**blobs, "sideinfos": sideinfos}
        sideinfos = compressed_data["sideinfos"]
        z_tables = em.factorized_build_tables(self.params["emz"])
        z = em.factorized_decompress(self.params["emz"], z_tables,
                                     compressed_data["z_strings"],
                                     sideinfos["z_shape"])
        scales, means = self.module["gy"].apply(self.params["gy"],
                                                jnp.asarray(z))
        scales = np.asarray(_exp_scales(scales))
        g_tables = self._gaussian_tables()
        indexes = em.build_indexes(scales, g_tables.scale_table)
        y = em.gaussian_decompress(g_tables, compressed_data["y_strings"],
                                   indexes, np.asarray(means))
        return y, sideinfos

    def init_compressing_yz(self, cropped, sideinfos, pc_shape):
        raise NotImplementedError


@partial(jax.jit, static_argnames=("tx_y", "tx_z", "loss_fn"))
def _sga_yz_step(params, y, z, opt_y, opt_z, key, coords, values, Lambda,
                 tau, *, tx_y, tx_z, loss_fn):
    def loss_f(yy, zz):
        return loss_fn(params, key, coords, values, yy, zz, Lambda, tau)
    loss, (gy, gz) = jax.value_and_grad(loss_f, argnums=(0, 1))(y, z)
    upd_y, opt_y = tx_y.update(gy, opt_y, y)
    upd_z, opt_z = tx_z.update(gz, opt_z, z)
    return (optax.apply_updates(y, upd_y), optax.apply_updates(z, upd_z),
            opt_y, opt_z, loss)


@partial(jax.jit, static_argnames=("tx", "tx_y", "tx_z", "argmin_steps",
                                   "loss_un"))
def _hyper_autodecoder_step(params, opt_state, y0, z0, key, coords, values,
                            Lambda, *, tx, tx_y, tx_z, argmin_steps, loss_un):
    def yz_step(carry, k):
        y, z, opt_y, opt_z = carry
        gy, gz = jax.grad(lambda yy, zz: loss_un(params, k, coords, values,
                                                 yy, zz, Lambda),
                          argnums=(0, 1))(y, z)
        upd_y, opt_y = tx_y.update(gy, opt_y, y)
        upd_z, opt_z = tx_z.update(gz, opt_z, z)
        return (optax.apply_updates(y, upd_y), optax.apply_updates(z, upd_z),
                opt_y, opt_z), None

    keys = jax.random.split(key, argmin_steps + 1)
    (y, z, _, _), _ = jax.lax.scan(
        yz_step, (y0, z0, tx_y.init(y0), tx_z.init(z0)), keys[:-1])
    loss, grads = jax.value_and_grad(
        lambda p: loss_un(p, keys[-1], coords, values, y, z, Lambda))(params)
    upd, opt_state = tx.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, upd), opt_state


class NFLR_Coding_Hyper_AutoDecoder(_NFLR_Coding_Hyper):
    """(reference CompressFramework.py:533-560)"""
    MODULE_KEYS = ("phi", "gmod", "gy", "emz")

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()
        self._init_hyper()

    def init_compressing_yz(self, cropped, sideinfos, pc_shape):
        n = sideinfos["data_shape"][0]
        return (init_y(self._next_key(), n, self.y_channel, pc_shape),
                init_z(self._next_key(), n, self.z_channel, pc_shape))

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        params = self._hyper_params()
        n = sideinfos["data_shape"][0]
        y0 = init_y(self._next_key(), n, self.y_channel, pc_shape)
        z0 = init_z(self._next_key(), n, self.z_channel, pc_shape)
        t = self.opt.Train
        loss, new_params, opt_state = _hyper_autodecoder_step(
            params, opt_state, y0, z0, self._next_key(), coords, values,
            float(t.Lambda), tx=tx,
            tx_y=self._opt_tx(t.optimizer_name_y, t.lr_y),
            tx_z=self._opt_tx(t.optimizer_name_z, t.lr_z),
            argmin_steps=int(t.argmin_steps),
            loss_un=self._loss_rd_hyper_un)
        for k in self.MODULE_KEYS:
            self.params[k] = new_params[k]
        self.update_z_quantiles_once()
        return loss, opt_state

    def training_segment(self, cropped, pc_shape, sideinfos, coords, values,
                         tx, opt_state, n_steps: int):
        t = self.opt.Train
        losses, new_params, opt_state, self._emz_opt = \
            _fused_training_segment(
                self._hyper_params(), opt_state, self._emz_opt,
                self._next_key(), jnp.asarray(cropped), coords, values,
                float(t.Lambda), tx=tx,
                tx_y=self._opt_tx(t.optimizer_name_y, t.lr_y),
                tx_z=self._opt_tx(t.optimizer_name_z, t.lr_z),
                tx_q=self._emz_tx, argmin_steps=int(t.argmin_steps),
                loss_un=self._loss_rd_hyper_un, n_steps=int(n_steps),
                n=int(sideinfos["data_shape"][0]),
                y_channel=self.y_channel, z_channel=self.z_channel,
                pc_shape=tuple(int(x) for x in pc_shape),
                mode="hyper_ad", em_key="emz")
        for k in self.MODULE_KEYS:
            self.params[k] = new_params[k]
        return losses, opt_state

    def _module_params(self):
        return {k: self.params[k] for k in ("phi", "gmod")}

    def _train_params(self):
        return self._hyper_params()


class NFLR_Coding_Hyper_AutoEncoder(_NFLR_Coding_Hyper):
    """(reference CompressFramework.py:561-588)"""

    def __init__(self, opt) -> None:
        super().__init__(opt)
        self._init_phi_gmod()
        self._init_hyper()
        self.module["hy"] = init_hy(
            ps_d=self.opt.Module.crop.ps_d, ps_h=self.opt.Module.crop.ps_h,
            ps_w=self.opt.Module.crop.ps_w, y_channel=self.y_channel,
            data_channel=self.data_channel, **dict(self.opt.Module.hy))
        self.params["hy"] = self.module["hy"].init(self._next_key())
        self.module["hz"] = init_hz(y_channel=self.y_channel,
                                    z_channel=self.z_channel,
                                    layers=int(self.opt.Module.gy.layers),
                                    **dict(self.opt.Module.hz))
        self.params["hz"] = self.module["hz"].init(self._next_key())

    def init_compressing_yz(self, cropped, sideinfos, pc_shape):
        y = self.module["hy"].apply(self.params["hy"], cropped,
                                    int(self.opt.Compress.get("hy_bs", 0)))
        z = self.module["hz"].apply(self.params["hz"], y)
        return y, z

    TRAIN_KEYS = ("phi", "gmod", "gy", "emz", "hy", "hz")

    def _ae_hyper_loss(self, p, key, cropped, coords, values, Lambda):
        y = self.module["hy"].apply(p["hy"], cropped)
        z = self.module["hz"].apply(p["hz"], y)
        return self._loss_rd_hyper_un(p, key, coords, values, y, z, Lambda)

    def training_step(self, cropped, pc_shape, sideinfos, coords, values,
                      tx, opt_state):
        keys = self.TRAIN_KEYS
        params = {k: self.params[k] for k in keys}
        loss, new_params, opt_state = _module_step(
            params, opt_state,
            (self._next_key(), cropped, coords, values,
             float(self.opt.Train.Lambda)),
            loss_fn=self._ae_hyper_loss, tx=tx)
        for k in keys:
            self.params[k] = new_params[k]
        self.update_z_quantiles_once()
        return loss, opt_state

    def training_segment(self, cropped, pc_shape, sideinfos, coords, values,
                         tx, opt_state, n_steps: int):
        losses, new_params, opt_state, self._emz_opt = \
            _fused_training_segment(
                {k: self.params[k] for k in self.TRAIN_KEYS}, opt_state,
                self._emz_opt, self._next_key(), jnp.asarray(cropped),
                coords, values, float(self.opt.Train.Lambda), tx=tx,
                tx_y=None, tx_z=None, tx_q=self._emz_tx, argmin_steps=0,
                loss_un=self._ae_hyper_loss, n_steps=int(n_steps),
                n=int(sideinfos["data_shape"][0]),
                y_channel=self.y_channel, z_channel=self.z_channel,
                pc_shape=tuple(int(x) for x in pc_shape),
                mode="hyper_ae", em_key="emz")
        for k in self.TRAIN_KEYS:
            self.params[k] = new_params[k]
        return losses, opt_state

    def _module_params(self):
        return {k: self.params[k] for k in ("phi", "gmod")}

    def _train_params(self):
        return {k: self.params[k] for k in self.TRAIN_KEYS}


# --------------------------------------------------------------------------
# registry + batch evaluator
# --------------------------------------------------------------------------
ALLCF = {
    "NFLR_AutoDecoder": NFLR_AutoDecoder,
    "NFLR_AutoEncoder": NFLR_AutoEncoder,
    "NFLR_Coding_AutoDecoder": NFLR_Coding_AutoDecoder,
    "NFLR_Coding_AutoEncoder": NFLR_Coding_AutoEncoder,
    "NFLR_Coding_Hyper_AutoDecoder": NFLR_Coding_Hyper_AutoDecoder,
    "NFLR_Coding_Hyper_AutoEncoder": NFLR_Coding_Hyper_AutoEncoder,
}


def init_compressframework(opt):
    """(reference CompressFramework.py:591-594)"""
    return ALLCF[opt.Name](opt)


def eval_performance(data_path_list_list: List[List[str]], compressframework,
                     save_dir: str, keep_data: bool = True, max=None):
    """Batch compress/decompress evaluator -> DataFrame + performance.csv
    (reference CompressFramework.py:596-642)."""
    import pandas as pd
    from brief_pytorch_tpu.eval.metrics import cal_ssim
    os.makedirs(save_dir, exist_ok=True)
    metrics = ["data_path", "mse", "psnr", "ssim", "compressed_data_Mbytes",
               "orig_data_Mbytes", "compress_ratio"]
    rows = []
    for data_path_list in data_path_list_list:
        comp_path = opj(save_dir, opb(ops(data_path_list[0])[0])
                        + "_compressed")
        dec_paths = [opj(save_dir, opb(ops(p)[0]) + "_decompressed"
                         + ops(p)[-1]) for p in data_path_list]
        compressed = compressframework.compress(data_path_list, comp_path)
        decompressed = compressframework.decompress(
            compressed_data=compressed, save_path_list=dec_paths)
        orig = read_data_batch(data_path_list)
        rng = max
        if rng is None:
            # 4098 for "uint12" replicates the reference's constant
            # (utils/tool.py:12-13), quirky as it is
            rng = {"uint8": 255, "uint12": 4098,
                   "uint16": 65535}[orig.dtype.name]
        mse = float(np.mean((orig / rng - decompressed / rng) ** 2))
        psnr = float(-10 * np.log10(mse))
        ssim_vals = [cal_ssim(np.moveaxis(orig[i], 0, -1),
                              np.moveaxis(np.asarray(decompressed[i]), 0, -1),
                              rng) for i in range(orig.shape[0])]
        # PRODUCT of per-file megabytes replicates the reference exactly
        # (CompressFramework.py:633 uses reduce(mul, ...)); for batches of
        # more than one file this inflates/deflates the "orig size" — kept
        # for metric parity with reference-generated CSVs
        orig_mb = float(np.prod([os.path.getsize(p) / 2 ** 20
                                 for p in data_path_list]))
        if len(data_path_list) > 1:
            import logging
            logging.warning(
                "eval_performance: orig_data_Mbytes is the PRODUCT of %d "
                "per-file megabytes (reference parity, "
                "CompressFramework.py:633) — do not trust it or "
                "compress_ratio for multi-file batches",
                len(data_path_list))
        comp_mb = os.path.getsize(comp_path) / 2 ** 20
        rows.append([str(data_path_list), mse, psnr,
                     float(np.mean(ssim_vals)), comp_mb, orig_mb,
                     orig_mb / comp_mb])
        if not keep_data:
            os.remove(comp_path)
            for p in dec_paths:
                os.remove(p)
    df = pd.DataFrame(rows, columns=metrics)
    df.to_csv(opj(save_dir, "performance.csv"))
    return df
