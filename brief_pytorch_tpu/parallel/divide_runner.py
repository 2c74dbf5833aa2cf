"""DivideTask orchestration: partition a large volume into blocks, train one
INR per block — all blocks simultaneously on the TPU mesh — then merge.

TPU-first redesign of reference NFGR.compress_divide (main.py:509-651):
the reference writes every chunk to disk, spawns one `python temp_main.py`
process per chunk and polls nvidia-smi to pack them onto GPUs; inter-block
"communication" is the filesystem.  Here the whole fleet is ONE SPMD
program (parallel/block_trainer.py) — no subprocesses, no filesystem
round-trips during training — while every on-disk artifact keeps the
reference layout so the deblock tools and merged-module readers interop:

  <logdir>/steps{N}/compressed/sideinfos.yaml           (orig volume info)
  <logdir>/steps{N}/compressed/sideinfos/<chunk>/sideinfos.yaml
  <logdir>/steps{N}/compressed/module/<chunk>/module/{weight-*,bias-*}
  <logdir>/steps{N}/decompressed/... , mip/..., performance.csv
  <logdir>/divide.<ext>                                  (boundary viz)
"""
from __future__ import annotations

import os
from os.path import basename as opb
from os.path import join as opj
from os.path import splitext as ops
from typing import Dict, List

import numpy as np

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.core.normalize import invnormalize_data, normalize_data, get_type_max
from brief_pytorch_tpu.eval.metrics import eval_performance, mip_ops
from brief_pytorch_tpu.io.image import get_folder_size, read_img, save_img
from brief_pytorch_tpu.io.modelsave import save_phi_module
from brief_pytorch_tpu.models import sizing
from brief_pytorch_tpu.models.phi import get_param_count, init_phi
from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
from brief_pytorch_tpu.partition.divide import (alloc_param, cal_divide_num,
                                                divide_data,
                                                merge_divided_data,
                                                parse_chunk_name)
from brief_pytorch_tpu.post.preprocess import (parse_checkpoints, parse_weight,
                                               preprocess)


def divide(cf_opt, data: np.ndarray, data_path: str, param_size: float):
    """Dispatch on divide_type (reference NFGR.divide, main.py:484-507)."""
    shape = data.shape
    divide_type = cf_opt.Compress.divide.divide_type
    if "adaptive" in divide_type:
        Nb = int(divide_type.split("_")[-1])
        if Nb < 8:
            import logging
            logging.warning("The number of blocks is less than 8!")
            divide_type = f"adaptotal_-1_-1_-1_{Nb}"
            cf_opt.Compress.divide.divide_type = divide_type
        else:
            return _adaptive_chunks(data_path, param_size, divide_type, data)
    if "adaptotal" in divide_type:
        _, d_num, h_num, w_num, Nb = divide_type.split("_")
        d_num, h_num, w_num, Nb = int(d_num), int(h_num), int(w_num), int(Nb)
        if len(shape) == 3:
            if h_num == -1 or w_num == -1:
                d_num, h_num, w_num = cal_divide_num(1, shape[0], shape[1],
                                                     Nb, param_size)
        elif len(shape) == 4:
            if -1 in (d_num, h_num, w_num):
                d_num, h_num, w_num = cal_divide_num(shape[0], shape[1],
                                                     shape[2], Nb, param_size)
        return divide_data(data, f"total_{d_num}_{h_num}_{w_num}")
    if "every" in divide_type or "total" in divide_type:
        return divide_data(data, divide_type)
    raise NotImplementedError(divide_type)


def _adaptive_chunks(img_path: str, param_size: float, divide_type: str,
                     data: np.ndarray):
    """adaptive_maxl_minl_varthr_ethr_Nb (reference main.py:456-482)."""
    from brief_pytorch_tpu.partition.tree import adaptive_cal_tree
    _, maxl, minl, var_thr, e_thr, Nb = divide_type.split("_")
    tree, save_data, dimension = adaptive_cal_tree(
        img_path, param_size, var_thr=int(var_thr), e_thr=int(e_thr),
        maxl=int(maxl), minl=int(minl), Nb=int(Nb))
    chunks = []
    for p in tree.get_active():
        if dimension == 3:
            info = {"data": data[p.z:p.z + p.d, p.y:p.y + p.h, p.x:p.x + p.w],
                    "d": [p.z, p.z + p.d - 1], "h": [p.y, p.y + p.h - 1],
                    "w": [p.x, p.x + p.w - 1]}
            info["name"] = "d_{}_{}-h_{}_{}-w_{}_{}".format(
                *info["d"], *info["h"], *info["w"])
        else:
            info = {"data": data[p.y:p.y + p.h, p.x:p.x + p.w],
                    "h": [p.y, p.y + p.h - 1], "w": [p.x, p.x + p.w - 1]}
            info["name"] = "h_{}_{}-w_{}_{}".format(*info["h"], *info["w"])
        info["total_size"] = data.size
        info["size"] = info["data"].size
        chunks.append(info)
    return chunks, save_data


def compress_divide(opt, log, args=None) -> Dict:
    """Full DivideTask pipeline.  opt: SingleTask root config."""
    cf_opt = opt.CompressFramework
    data_path = opt.Dataset.data_path
    seed = int(opt.Reproduc.seed)
    data = read_img(data_path)
    phi = cf_opt.Module.phi
    assert data.ndim == phi.coords_channel + 1, \
        "data dimension inconsistent with network input"
    assert data.shape[-1] == phi.data_channel, \
        "data channels inconsistent with network output"
    orig_sideinfos = {"data_shape": list(data.shape)}

    pre = cf_opt.Compress.preprocess
    data_pre = preprocess(data.copy(), pre.denoise.level, pre.denoise.close,
                          pre.clip)
    pre_path = opj(log.logdir, opb(ops(data_path)[0]) + "_preprocessed"
                   + ops(data_path)[-1])
    save_img(pre_path, data_pre)

    # budget + partition + allocation
    given = cf_opt.Compress.param.given_size
    ratio = cf_opt.Compress.param.filesize_ratio
    param_size = float(given) if given > 0 else os.path.getsize(data_path) / ratio
    chunks, divide_img = divide(cf_opt, data_pre, pre_path, param_size)
    save_img(opj(log.logdir, "divide" + ops(pre_path)[-1]), divide_img)
    orig_sideinfos["chunks_numbers"] = len(chunks)
    chunks = alloc_param(chunks, param_size,
                         cf_opt.Compress.divide.param_alloc,
                         cf_opt.Compress.divide.param_size_thres)

    # per-chunk config exceptions (reference main.py:535-537, 568-569):
    # overrides merged into THAT chunk's effective config.  Preparation
    # overrides (param budget, loss weights, normalisation, phi family/
    # width, warm start) fold into the block dict; overrides of STEP-level
    # hyperparameters (sampler, max_steps, lr, optimizer, schedule, loss
    # name/beta, half, coords_mode) route the block to the fleet's solo
    # path, which trains it with its own jitted program and effective
    # config — exactly what a reference child process did.
    exception_opt = cf_opt.Compress.divide.exception
    if exception_opt == "none" or exception_opt is None:
        exception_opt = {}

    def _step_params(cc):
        """The step-level hyperparameters a stacked bucket shares."""
        return (cc.sampler.to_plain(), int(cc.max_steps), float(cc.lr_phi),
                str(cc.optimizer_name_phi), cc.lr_scheduler_phi.to_plain(),
                str(cc.loss.name), float(cc.loss.get("beta", 0.01)),
                bool(cc.half), str(cc.coords_mode))

    # per-block preparation (what each reference child process did on its own)
    blocks: List[Dict] = []
    for chunk in chunks:
        blk = dict(chunk)
        blk_opt = cf_opt
        if chunk["name"] in exception_opt:
            blk_opt = cfglib.merge(cf_opt,
                                   dict(exception_opt[chunk["name"]]))
            if _step_params(blk_opt.Compress) != _step_params(cf_opt.Compress):
                # this chunk trains solo with its own merged config
                # (reference main.py:568-569: the child gets the override)
                blk["solo_cfg"] = blk_opt.Compress
                import logging
                logging.info(
                    "exception for %s overrides step-level params; the "
                    "block trains on the solo path with its own config",
                    chunk["name"])
        chunk_pre = chunk["data"]
        blk["weight"] = parse_weight(chunk_pre, blk_opt.Compress.loss.weight)
        data_norm, side = normalize_data(chunk_pre, **blk_opt.Normalize)
        blk["data_norm"] = data_norm
        # OPT-IN integer-gather path (Compress.raw_gather): keep the raw
        # chunk + the affine reproducing data_norm so the fleet stacks
        # uint16 — HALF the data stack's HBM residency (a capacity lever
        # for GB volumes; NOT a speed win — the gather is measured
        # per-index-bound and the vmapped fleet step is ~16% slower on
        # u16 stacks, scripts/instep_gather_ab.py / RESULTS.md).  Only
        # affine normalize modes qualify.
        if np.issubdtype(chunk_pre.dtype, np.integer) \
                and bool(blk_opt.Compress.get("raw_gather", False)):
            nm = str(blk_opt.Normalize.name)
            if "minmaxany" in nm:
                a, b = (float(x) for x in nm.split("_")[1:])
                A = (b - a) / (float(side["max"]) - float(side["min"]))
                blk["dequant"] = (A, a - float(side["min"]) * A)
                blk["data_raw"] = chunk_pre
            elif nm == "none":
                blk["dequant"] = (1.0, 0.0)
                blk["data_raw"] = chunk_pre
        half = bool(blk_opt.Compress.half)
        given = blk_opt.Compress.param.given_size
        budget = float(given) if chunk["name"] in exception_opt and given > 0 \
            else chunk["param_size"]
        phi_cfg = dict(blk_opt.Module.phi)
        features, count, theory = sizing.estimate_module_size(
            budget, phi_cfg, half)
        phi_cfg["features"] = features
        blk["model"] = init_phi(phi_cfg)
        init_net = blk_opt.Compress.param.get("init_net_path", "none")
        if init_net and init_net != "none":  # per-block warm start
            from brief_pytorch_tpu.io.modelsave import load_model
            blk["init_layers"] = load_model(init_net)
        blk["theory_module_size"] = theory
        blk["sideinfos"] = {**side, "data_shape": list(data_norm.shape),
                            "phi_features": features,
                            "phi_name": phi_cfg["name"]}
        thres = blk_opt.Compress.loss.weight_thres
        tn, _ = normalize_data(np.array(thres, np.float32),
                               **blk_opt.Normalize,
                               min=side["min"], max=side["max"])
        blk["weight_thres_norm"] = float(tn)
        blocks.append(blk)

    max_steps = int(cf_opt.Compress.max_steps)
    checkpoints = parse_checkpoints(cf_opt.Compress.checkpoints, max_steps)
    orig_bytes = os.path.getsize(data_path)
    trainer = BlockFleetTrainer(seed=seed)
    summary: Dict = {}

    def on_checkpoint(step, blks, per_block_params):
        # multi-host runs: every process reaches this callback in lockstep
        # (trainer.decode below is a collective over the mesh), but only
        # process 0 touches the shared filesystem — the reference's
        # children each wrote their own chunk dirs; one writer is the
        # conflict-free equivalent for the SPMD fleet
        import jax as _jax
        is_main = _jax.process_index() == 0
        step_dir = opj(log.logdir, f"steps{step}")
        compressed = opj(step_dir, "compressed")
        module_dir = opj(compressed, "module")
        side_dir = opj(compressed, "sideinfos")
        if is_main:
            os.makedirs(compressed, exist_ok=True)
            cfglib.save(orig_sideinfos, opj(compressed, "sideinfos.yaml"))
            for blk, params in zip(blks, per_block_params):
                csd = opj(side_dir, blk["name"])
                os.makedirs(csd, exist_ok=True)
                cfglib.save(blk["sideinfos"], opj(csd, "sideinfos.yaml"))
                cmd = opj(module_dir, blk["name"], "module")
                os.makedirs(os.path.dirname(cmd), exist_ok=True)
                save_phi_module(blk["model"], params, cmd)
            actual = get_folder_size(compressed)
            theory = (get_folder_size(side_dir)
                      + sum(b["theory_module_size"] for b in blks))
            log.log_metrics({"compress_ratio/theory": orig_bytes / theory,
                             "compress_ratio/actual": orig_bytes / actual},
                            step)
            summary.update({"steps": step,
                            "compress_ratio/theory": orig_bytes / theory,
                            "compress_ratio/actual": orig_bytes / actual})

        if cf_opt.Compress.decompress:
            decoded = trainer.decode(blks, cf_opt.Compress, cf_opt.Decompress)
            if not is_main:
                return
            merged_chunks = []
            for blk, dec_norm in zip(blks, decoded):
                dec = invnormalize_data(dec_norm, blk["sideinfos"],
                                        **cf_opt.Normalize)
                post = cf_opt.Decompress.postprocess
                dec = preprocess(dec, post.denoise.level, post.denoise.close,
                                 post.clip)
                mc = {"data": dec, "h": blk["h"], "w": blk["w"]}
                if "d" in blk:
                    mc["d"] = blk["d"]
                merged_chunks.append(mc)
            merged = merge_divided_data(merged_chunks, data.shape)
            if cf_opt.Decompress.keep_decompressed:
                dd = opj(step_dir, "decompressed")
                os.makedirs(dd, exist_ok=True)
                save_img(opj(dd, opb(ops(data_path)[0]) + "_decompressed"
                             + ops(data_path)[-1]), merged)
            if cf_opt.Decompress.mip and data.ndim == 4:
                md = opj(step_dir, "mip")
                os.makedirs(md, exist_ok=True)
                stem, ext = opb(ops(data_path)[0]), ops(data_path)[-1]
                mip_ops(data, md, stem, ext)
                mip_ops(merged, md, stem + "_decompressed", ext)
            perf = eval_performance(step, data, merged, log,
                                    cf_opt.Decompress.mse,
                                    cf_opt.Decompress.psnr,
                                    cf_opt.Decompress.ssim)
            log.append_csv_row(opj(log.logdir, "performance.csv"), perf)
            summary.update(perf)

    # true resume (beyond the reference; train/checkpoint.py): the fleet
    # state lands next to the artifacts at every checkpoint, and
    # Compress.resume continues a preempted run bit-identically
    resume = str(cf_opt.Compress.get("resume", "none") or "none")
    trainer.train(blocks, cf_opt.Compress, max_steps,
                  checkpoint_cb=on_checkpoint, checkpoints=checkpoints,
                  state_path=opj(log.logdir, "trainstate_fleet.npz"),
                  resume_path=None if resume == "none" else resume)
    log.close()
    return summary
