"""NFGR: overfit one φ-network to one volume — the core compression path.

TPU-first redesign of the reference NFGR (main.py:164-454):
  * the ENTIRE sample->forward->loss->backward->update step is one jitted
    program; segments between checkpoints run as a single lax.scan on
    device (one host sync per segment, not per step);
  * params/optimizer state are donated across segments (no HBM churn);
  * `half` maps to bfloat16 compute with float32 params/accumulation
    (the TPU analogue of the reference's half-forward/float-step trick,
    main.py:388-398), keeping the 2-bytes-per-param size accounting;
  * decompression is a scanned on-device grid inference (train/decode.py).

Artifact layout on disk is byte-compatible with the reference:
  <logdir>/steps{N}/compressed/{module/, sideinfos.yaml}
  <logdir>/steps{N}/decompressed/<name>_decompressed.<ext>
  <logdir>/steps{N}/mip/...
  <logdir>/performance.csv
"""
from __future__ import annotations

import math
import os
import shutil
from functools import partial
from os.path import basename as opb
from os.path import join as opj
from os.path import splitext as ops
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.core.normalize import (get_type_max, invnormalize_data,
                                              normalize_data)
from brief_pytorch_tpu.eval.metrics import eval_performance, mip_ops
from brief_pytorch_tpu.io.image import (get_folder_size, read_img, save_img)
from brief_pytorch_tpu.io.modelsave import load_model, save_model
from brief_pytorch_tpu.models import sizing
from brief_pytorch_tpu.models.phi import get_param_count, init_phi
from brief_pytorch_tpu.post.preprocess import (parse_checkpoints, parse_weight,
                                               preprocess)
from brief_pytorch_tpu.train.decode import reconstruct_flattened
from brief_pytorch_tpu.train.loss import make_loss
from brief_pytorch_tpu.train.optim import make_optimizer
from brief_pytorch_tpu.train.samplers import (RandomCubeSampler,
                                              RandomPointSampler,
                                              cube_size_guard)


# --------------------------------------------------------------------------
# jitted training segment
# --------------------------------------------------------------------------
# Longest single on-device scan dispatched at once; checkpoint intervals are
# split into pieces of this size (see NFGR.compress).  The step cap alone
# does not bound dispatch TIME (a big fleet's steps are much slower), so
# the coordinate budget caps total work per dispatch — multi-minute single
# dispatches crash the remote runtime's watchdog.
SEGMENT_CAP = 2000
SEGMENT_COORD_BUDGET = 300_000_000


def segment_cap(coords_per_step: int) -> int:
    """Steps per dispatch bounded by both the step cap and the coordinate
    budget (>= 50 so tiny dispatches don't dominate with fixed overhead)."""
    by_work = max(50, SEGMENT_COORD_BUDGET // max(1, coords_per_step))
    return min(SEGMENT_CAP, by_work)

@partial(jax.jit,
         static_argnames=("model", "sampler", "tx", "loss_name", "beta",
                          "n_steps", "half", "weight_thres", "fused"),
         donate_argnums=(0, 1))
def run_segment(params, opt_state, data, weight, key, *,
                weight_thres: float, model, sampler, tx, loss_name: str,
                beta: float, n_steps: int, half: bool, fused=False):
    """Run n_steps of training as one on-device scan.

    fused: False (XLA autodiff), True (fully fused Pallas fwd+loss+bwd
    kernel, ops/pallas_train.py — opt-in via Compress.fused_train), or
    "interpret" (the kernel in interpreter mode, for CPU tests).
    Returns (params, opt_state, per-step losses).
    """
    loss_fn = make_loss(loss_name, beta)
    compute_dtype = jnp.bfloat16 if half else None
    if fused:
        from brief_pytorch_tpu.ops.pallas_siren import (chain_layer_specs,
                                                        make_pre_encode)
        from brief_pytorch_tpu.ops.pallas_train import fused_train_grads
        acts = chain_layer_specs(model.spec)
        pre_encode = make_pre_encode(model.spec)

    def step_fn(carry, key):
        params, opt_state = carry

        if fused:
            coords, vals, wts = sampler.sample(key, data, weight)
            coords = pre_encode(coords)
            loss, grads = fused_train_grads(
                params["layers"], coords.T, vals.T, wts.T, acts,
                loss_name=loss_name, beta=beta,
                weight_thres=weight_thres or None, half=half,
                interpret=fused == "interpret")
        else:
            def loss_f(p):
                coords, vals, wts = sampler.sample(key, data, weight)
                pred = model.apply(p, coords, compute_dtype=compute_dtype)
                return loss_fn(vals, pred.astype(vals.dtype), wts,
                               weight_thres)

            loss, grads = jax.value_and_grad(loss_f)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    keys = jax.random.split(key, n_steps)
    # unroll: merges loop iterations, shaving per-iteration overhead from
    # the serial chain (~4% at the bench config); math is unchanged
    (params, opt_state), losses = jax.lax.scan(step_fn, (params, opt_state),
                                               keys,
                                               unroll=min(4, max(1, n_steps)))
    return params, opt_state, losses


# --------------------------------------------------------------------------
# the framework
# --------------------------------------------------------------------------
class NFGR:
    """Neural-fields global representation compressor
    (capability parity with reference main.py:164-651)."""

    def __init__(self, opt, logger=None, seed: int = 42):
        """opt: the CompressFramework config node (reference schema)."""
        self.opt = opt
        self.half = bool(opt.Compress.half)
        self.logger = logger
        self.seed = int(seed)

    # ------------------------------------------------------------- sizing --
    def parse_param_size(self, data_path: Optional[str] = None) -> float:
        """Byte budget from given_size XOR filesize_ratio
        (reference main.py:199-207)."""
        given = self.opt.Compress.param.given_size
        ratio = self.opt.Compress.param.filesize_ratio
        if (given > 0 and ratio > 0) or (given == 0 and ratio == 0):
            raise ValueError("There can only be one arg to be used")
        if given > 0:
            return float(given)
        return os.path.getsize(data_path) / ratio

    def prepare_module(self, ideal_module_size: float):
        """Size + build the φ network (reference main.py:248-264)."""
        phi_cfg = self.opt.Module.phi
        features, actual_count, theory_size = sizing.estimate_module_size(
            ideal_module_size, phi_cfg, self.half)
        err = (theory_size - ideal_module_size) / ideal_module_size
        if abs(err) > 0.05:
            import logging
            logging.warning("Error_rate=%.3f>0.05! ideal=%s theory=%s",
                            err, ideal_module_size, theory_size)
        phi_cfg["features"] = features
        model = init_phi(dict(phi_cfg))
        params = model.init(jax.random.PRNGKey(self.seed))
        assert get_param_count(params) == actual_count, \
            "calc_phi_param_count mismatch with constructed pytree!"
        return model, params, features, theory_size

    # -------------------------------------------------------------- train --
    def compress(self, data_path: str, stepstore: bool = False,
                 opt_root=None) -> Dict:
        """Compress one volume/image; writes checkpoint artifacts under the
        logger dir.  Returns a summary dict of the last checkpoint."""
        log = self.logger
        data = read_img(data_path)

        # sampler size guard (reference main.py:325-334)
        cube_len = list(self.opt.Compress.sampler.cube_len)
        cube_voxels = int(np.prod([min(c, s) for c, s in
                                   zip(cube_len, data.shape[:-1])]))
        self.opt.Compress.sampler.name = cube_size_guard(
            self.opt.Compress.sampler.name, data.size, cube_voxels)

        # preprocess + per-voxel weights
        pre = self.opt.Compress.preprocess
        data_pre = preprocess(data.copy(), pre.denoise.level, pre.denoise.close,
                              pre.clip)
        if log is not None:
            save_img(opj(log.logdir, opb(ops(data_path)[0]) + "_preprocessed"
                         + ops(data_path)[-1]), data_pre)
        weight = parse_weight(data_pre, self.opt.Compress.loss.weight)

        # normalize
        data_norm, sideinfos = normalize_data(data_pre, **self.opt.Normalize)

        # module sizing (+ optional warm start, reference main.py:345-354)
        ideal = self.parse_param_size(data_path)
        model, params, features, theory_size = self.prepare_module(ideal)
        init_net = self.opt.Compress.param.get("init_net_path", "none")
        if init_net and init_net != "none":
            layers = load_model(init_net)
            params = {**params,
                      "layers": [{k: jnp.asarray(v) for k, v in l.items()}
                                 for l in layers]}

        sideinfos = {**sideinfos,
                     "data_shape": list(data_norm.shape),
                     "phi_features": features,
                     "phi_name": self.opt.Module.phi.name}

        # sampler.  All-ones weight volumes (the default) skip the weight
        # upload and the per-step weight gather entirely — the hot loop is
        # gather-bound at INR sizes (RESULTS.md roofline).  When the
        # data-parallel trainer will own the volume (data_shards > 1), do
        # NOT upload it here — DataParallelTrainer.prepare places the
        # sharded copy (a duplicate full-volume transfer would cost minutes
        # over a slow device link for GB volumes).
        data_shards = int(self.opt.Compress.get("data_shards", 1) or 1)
        unit_weight = bool(np.all(weight == 1.0))
        spatial = tuple(int(s) for s in data_norm.shape[:-1])
        mode = self.opt.Compress.coords_mode
        dev_data = dev_weight = None
        if self.opt.Compress.sampler.name == "randompoint":
            vector_len = int(
                self.opt.Compress.sampler.get("vector_len", 1) or 1)
            if data_shards > 1 and vector_len > 1:
                # the DP trainer draws its per-shard batches internally
                # (data_parallel._dp_segment) and would silently ignore it
                raise ValueError(
                    "Compress.sampler.vector_len is not supported with "
                    "Compress.data_shards > 1 (the data-parallel trainer "
                    "draws iid per-shard batches)")
            # OPT-IN integer-volume path (Compress.raw_gather): keep the
            # RAW (e.g. uint16) volume on device and fold the affine
            # normalization into a post-gather multiply.  This HALVES the
            # volume's HBM residency (capacity lever for GB volumes) but
            # does NOT speed the step: on-chip A/Bs at 262k and 16.7M
            # voxel populations both measure the iid gather per-INDEX
            # bound, u16 within ±8% of f32 (scripts/instep_gather_ab.py /
            # RESULTS.md "the gather is index-bound").  Values agree with
            # the host-normalized gather to f32 rounding (~1 ulp).  Only
            # affine normalize modes qualify; the DP trainer keeps its own
            # f32 shards.
            dequant = None
            if data_shards <= 1 and np.issubdtype(data_pre.dtype, np.integer) \
                    and bool(self.opt.Compress.get("raw_gather", False)):
                nm = str(self.opt.Normalize.name)
                if "minmaxany" in nm:
                    a, b = (float(x) for x in nm.split("_")[1:])
                    den = float(sideinfos["max"]) - float(sideinfos["min"])
                    A = (b - a) / den
                    dequant = (A, a - float(sideinfos["min"]) * A)
                elif nm == "none":
                    dequant = (1.0, 0.0)
            sampler = RandomPointSampler(
                spatial, mode, int(self.opt.Compress.sampler.sample_size),
                min(vector_len, int(np.prod(spatial))),
                *(dequant if dequant else (1.0, 0.0)))
            c = data_norm.shape[-1]
            if data_shards <= 1:
                dev_data = jnp.asarray(
                    data_pre.reshape(-1, c) if dequant
                    else data_norm.reshape(-1, c))
                dev_weight = None if unit_weight \
                    else jnp.asarray(weight.reshape(-1, c))
            coords_per_step = sampler.sample_size
        elif self.opt.Compress.sampler.name == "randomcube":
            clipped = tuple(min(int(c), s) for c, s in zip(cube_len, spatial))
            sampler = RandomCubeSampler(spatial, mode,
                                        int(self.opt.Compress.sampler.cube_count),
                                        clipped)
            if data_shards <= 1:
                dev_data = jnp.asarray(data_norm)
                dev_weight = None if unit_weight else jnp.asarray(weight)
            coords_per_step = sampler.cube_count * int(np.prod(clipped))
        else:
            raise NotImplementedError(self.opt.Compress.sampler.name)

        # normalized weight threshold (reference main.py:380-383)
        thres = self.opt.Compress.loss.weight_thres
        assert thres <= get_type_max(data_pre), \
            "The weight threshold should be less than the data maximum!"
        thres_norm, _ = normalize_data(np.array(thres, dtype=np.float32),
                                       **self.opt.Normalize,
                                       min=sideinfos["min"],
                                       max=sideinfos["max"])
        thres_norm = float(thres_norm)

        # optimizer + schedule (per-step, reference main.py:373-400), or the
        # coordinate-sharded data-parallel trainer (Compress.data_shards > 1:
        # one network, batch sharded over the mesh's 'data' axis, grads
        # pmean'd over ICI — parallel/data_parallel.py)
        dp = None
        if data_shards > 1:
            if self.opt.Compress.sampler.name != "randompoint":
                raise ValueError(
                    "Compress.data_shards requires the randompoint sampler "
                    "(the volume is flattened and sharded over 'data'); got "
                    f"{self.opt.Compress.sampler.name}")
            from brief_pytorch_tpu.parallel.data_parallel import \
                DataParallelTrainer
            from brief_pytorch_tpu.parallel.mesh import make_mesh
            if data_shards > len(jax.devices()):
                raise ValueError(
                    f"Compress.data_shards={data_shards} but only "
                    f"{len(jax.devices())} devices are visible")
            mesh = make_mesh(n_block_shards=1, n_data_shards=data_shards,
                             devices=jax.devices()[:data_shards])
            dp = DataParallelTrainer(mesh, model, seed=self.seed)
            params, opt_state = dp.prepare(data_norm, weight,
                                           self.opt.Compress, thres_norm,
                                           params)
        else:
            tx = make_optimizer(self.opt.Compress.optimizer_name_phi,
                                float(self.opt.Compress.lr_phi),
                                self.opt.Compress.lr_scheduler_phi)
            opt_state = tx.init(params)

        max_steps = int(self.opt.Compress.max_steps)
        checkpoints = parse_checkpoints(self.opt.Compress.checkpoints, max_steps)
        loss_log_freq = int(self.opt.Compress.loss_log_freq)
        loss_name = self.opt.Compress.loss.name
        beta = float(self.opt.Compress.loss.get("beta", 0.01))

        # fused Pallas train kernel (Compress.fused_train, default ON since
        # r4): requires a plain f32 chain and a TPU backend
        # (ops/pallas_train.py), else falls back to XLA autodiff.  Measured
        # 1.09-1.52x the XLA step across shape classes with identical
        # converged quality (RESULTS.md "Fused train kernel"); set
        # fused_train: false for bitwise TPU/CPU metric reproducibility.
        fused = False
        if self.opt.Compress.get("fused_train", True) and not self.half:
            from brief_pytorch_tpu.ops.pallas_train import supports_training
            if supports_training(model, loss_name) and \
                    jax.devices()[0].platform == "tpu":
                fused = True

        key = jax.random.PRNGKey(self.seed)

        # --- true resume (beyond the reference; train/checkpoint.py) ---
        # fingerprint: the config axes under which a stored state is
        # meaningful.  max_steps/checkpoints are deliberately absent —
        # resuming to train LONGER is a supported use (bit-equality with an
        # uninterrupted run additionally needs the same checkpoint grid,
        # since segment PRNG keys are split per checkpoint interval).
        fingerprint = {
            "kind": "single", "phi_name": str(self.opt.Module.phi.name),
            "phi_features": int(features), "sampler": repr(sampler),
            "optimizer": str(self.opt.Compress.optimizer_name_phi),
            "lr": float(self.opt.Compress.lr_phi),
            "loss": f"{loss_name}/{beta}/{thres_norm}",
            "half": self.half, "data_shards": data_shards, "seed": self.seed,
            "fused": bool(fused),   # the fused kernel's math ≠ XLA's bitwise
        }
        start_step = 0
        resume = str(self.opt.Compress.get("resume", "none") or "none")
        if resume != "none":
            from brief_pytorch_tpu.train.checkpoint import (
                load_trainstate, resolve_trainstate)
            params, opt_state, key, start_step = load_trainstate(
                resolve_trainstate(resume), params, opt_state, fingerprint)
            if dp is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(dp.mesh, P())
                params = jax.device_put(params, rep)
                opt_state = jax.device_put(opt_state, rep)

        step = start_step
        summary = {}
        orig_data = None
        last_loss = float("nan")   # checkpoints may start at 0 steps
        for ckpt in checkpoints:
            if ckpt <= start_step:
                continue   # the pre-preemption run already produced these
            n = ckpt - step
            if n > 0:
                # split into bounded scans: one checkpoint interval can be
                # tens of thousands of steps, and a single multi-minute
                # device dispatch risks runtime watchdogs (observed: remote
                # TPU worker restarts); fixed-size pieces also keep the
                # compile cache at two scan lengths.
                losses_parts = []
                remaining = n
                cap = segment_cap(coords_per_step)
                while remaining > 0:
                    seg = min(remaining, cap)
                    key, seg_key = jax.random.split(key)
                    if dp is not None:
                        params, opt_state, losses = dp.run_steps(
                            params, opt_state, seg, seg_key)
                    else:
                        params, opt_state, losses = run_segment(
                            params, opt_state, dev_data, dev_weight, seg_key,
                            weight_thres=thres_norm, model=model,
                            sampler=sampler, tx=tx, loss_name=loss_name,
                            beta=beta, n_steps=seg, half=self.half,
                            fused=fused)
                    losses_parts.append(np.asarray(losses))
                    remaining -= seg
                losses = np.concatenate(losses_parts)
                if log is not None:
                    for i in range(n):
                        gstep = step + i + 1
                        if gstep % loss_log_freq == 0:
                            log.log_metrics({"loss": float(losses[i])}, gstep)
                last_loss = float(losses[-1])
            step = ckpt

            # ---- checkpoint artifacts (reference main.py:404-453) ----
            if log is None:
                continue
            step_dir = opj(log.logdir, f"steps{step}")
            compressed_dir = opj(step_dir, "compressed")
            os.makedirs(compressed_dir, exist_ok=True)
            module_path = opj(compressed_dir, "module")
            sideinfos_path = opj(compressed_dir, "sideinfos.yaml")
            cfglib.save(sideinfos, sideinfos_path)
            self._save_module(model, params, module_path)
            actual_module_size = get_folder_size(module_path)
            side_bytes = os.path.getsize(sideinfos_path)
            orig_bytes = os.path.getsize(data_path)
            ratios = {
                "compress_ratio/theory": orig_bytes / (side_bytes + theory_size),
                "compress_ratio/actual": orig_bytes / (side_bytes + actual_module_size),
            }
            log.log_metrics(ratios, step)
            summary = {"steps": step, "loss": last_loss, **ratios}

            if self.opt.Compress.decompress:
                dec = self._decode(model, params, sideinfos)
                if self.opt.Decompress.keep_decompressed:
                    dd = opj(step_dir, "decompressed")
                    os.makedirs(dd, exist_ok=True)
                    save_img(opj(dd, opb(ops(data_path)[0]) + "_decompressed"
                                 + ops(data_path)[-1]), dec)
                if orig_data is None:
                    orig_data = read_img(data_path)
                if self.opt.Decompress.mip and orig_data.ndim == 4:
                    md = opj(step_dir, "mip")
                    os.makedirs(md, exist_ok=True)
                    stem = opb(ops(data_path)[0])
                    ext = ops(data_path)[-1]
                    mip_ops(orig_data, md, stem, ext)
                    mip_ops(dec, md, stem + "_decompressed", ext)
                    mip_ops(orig_data, md, stem, ".png")
                    mip_ops(dec, md, stem + "_decompressed", ".png")
                perf = eval_performance(step, orig_data, dec, log,
                                        self.opt.Decompress.mse,
                                        self.opt.Decompress.psnr,
                                        self.opt.Decompress.ssim)
                perf["loss"] = last_loss
                log.append_csv_row(opj(log.logdir, "performance.csv"), perf)
                summary.update(perf)

            # persist the FULL training state (atomic) after the artifacts:
            # a preemption mid-checkpoint resumes from the previous one and
            # regenerates, so half-written artifacts are never trusted
            if jax.process_index() == 0:
                from brief_pytorch_tpu.train.checkpoint import save_trainstate
                save_trainstate(opj(log.logdir, "trainstate.npz"),
                                params, opt_state, key, step, fingerprint)

            if stepstore and step < max_steps:
                shutil.rmtree(step_dir)
        if log is not None:
            log.close()
        self.model, self.params, self.sideinfos = model, params, sideinfos
        return summary

    # -------------------------------------------------------------- utils --
    @staticmethod
    def _save_module(model, params, module_path: str) -> None:
        from brief_pytorch_tpu.io.modelsave import save_phi_module
        save_phi_module(model, params, module_path)

    def _decode(self, model, params, sideinfos) -> np.ndarray:
        # Supported chains on TPU decode through the feature-major fused
        # grid kernel (reconstruct_flattened routes via model=); the rest
        # use the plain XLA scan.  The apply closure is memoized per
        # model: a fresh bound method per checkpoint would be a new
        # static jit arg and recompile the whole grid decode every time.
        if getattr(self, "_decode_apply_model", None) is not model:
            self._decode_apply = model.apply
            self._decode_apply_model = model
        dec = reconstruct_flattened(
            self._decode_apply, params, sideinfos["data_shape"],
            int(self.opt.Decompress.sample_size),
            self.opt.Compress.coords_mode, self.half, model=model)
        dec = invnormalize_data(dec, sideinfos, **self.opt.Normalize)
        post = self.opt.Decompress.postprocess
        dec = preprocess(dec, post.denoise.level, post.denoise.close, post.clip)
        return dec

    # --------------------------------------------------------- decompress --
    @staticmethod
    def decompress_divide(opt, orig_sideinfos_path: str,
                          module_save_dir: str,
                          sideinfos_save_dir: str) -> np.ndarray:
        """Standalone decode of a saved DivideTask archive
        (reference main.py:299-320): every chunk under
        <module_save_dir>/<chunk_name>/module is decoded with its own
        sideinfos and merged by the extents encoded in the chunk name
        'd_{z0}_{z1}-h_{y0}_{y1}-w_{x0}_{x1}' (reference main.py:477-480).

        opt: a CompressFramework config node or a SingleTask yaml path.
        """
        from brief_pytorch_tpu.partition.divide import (merge_divided_data,
                                                        parse_chunk_name)
        if isinstance(opt, str):   # parse the yaml once, not once per chunk
            opt = cfglib.load(opt).CompressFramework
        orig_sideinfos = cfglib.load(orig_sideinfos_path)
        data_shape = list(orig_sideinfos["data_shape"])
        chunk_list = []
        for chunk_name in sorted(os.listdir(module_save_dir)):
            # skip stray files (editor backups etc.): chunk entries are
            # directories named d_*-h_*-w_* / h_*-w_*
            if not os.path.isdir(opj(module_save_dir, chunk_name)):
                continue
            try:
                extents = parse_chunk_name(chunk_name)
            except (ValueError, IndexError):
                continue
            module_path = opj(module_save_dir, chunk_name, "module")
            sideinfos_path = opj(sideinfos_save_dir, chunk_name,
                                 "sideinfos.yaml")
            dec = NFGR.decompress(opt, module_path, sideinfos_path)
            chunk_list.append({"data": dec, "name": chunk_name, **extents})
        if not chunk_list:
            raise FileNotFoundError(
                f"no chunk directories found in {module_save_dir}")
        return merge_divided_data(chunk_list, data_shape)

    @staticmethod
    def decompress(opt, module_path: str, sideinfos_path: str) -> np.ndarray:
        """Standalone decode from saved artifacts (reference main.py:270-297).

        opt: a CompressFramework config node or a path to a SingleTask yaml.
        """
        if isinstance(opt, str):
            opt = cfglib.load(opt).CompressFramework
        sideinfos = cfglib.load(sideinfos_path)
        phi_cfg = dict(opt.Module.phi)
        phi_cfg["features"] = sideinfos["phi_features"]
        phi_cfg["name"] = sideinfos["phi_name"]
        model = init_phi(phi_cfg)
        params = model.init(jax.random.PRNGKey(0))
        if os.path.exists(opj(module_path, "params.npz")):
            # MFN families round-trip through the npz container
            # (save_phi_module; the raw per-layer binary format only
            # describes chains, reference utils/ModelSave.py:32-52)
            from brief_pytorch_tpu.io.modelsave import load_phi_module_npz
            params = jax.tree_util.tree_map(
                jnp.asarray, load_phi_module_npz(module_path, params))
        else:
            layers = load_model(module_path)
            params = {**params,
                      "layers": [{k: jnp.asarray(v) for k, v in l.items()}
                                 for l in layers]}
            enc_path = opj(module_path, "encoder.npz")
            if os.path.exists(enc_path):
                # frozen encoder params saved by save_phi_module (FFN bvals)
                with np.load(enc_path) as z:
                    params = {**params,
                              "encoder": {k: jnp.asarray(z[k])
                                          for k in z.files}}
        half = bool(opt.Compress.half)
        dec = reconstruct_flattened(model.apply, params,
                                    sideinfos["data_shape"],
                                    int(opt.Decompress.sample_size),
                                    opt.Compress.coords_mode, half,
                                    model=model)
        dec = invnormalize_data(dec, dict(sideinfos), **opt.Normalize)
        post = opt.Decompress.postprocess
        dec = preprocess(dec, post.denoise.level, post.denoise.close, post.clip)
        return dec
