"""End-to-end compression of the reference's other media types: 2-D images
(PNG) and MP4 video (reference utils/tool.py:73-92 dispatch; main.py treats
video as a (frames, h, w, c) volume)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # MP4/PNG end-to-end compress

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.io.image import read_img, save_img
from brief_pytorch_tpu.utils.logger import MyLogger


def _single_opt(data_path, outputs_dir, coords_channel, data_channel,
                max_steps, given_size, normalize="minmaxany_0_1",
                type_max=255):
    return cfglib.loads(f"""
Reproduc: {{seed: 42, benchmark: false, deterministic: true}}
Dataset: {{data_path: "{data_path}"}}
Log: {{outputs_dir: "{outputs_dir}", project_name: media, stdlog: false,
      tensorboard: false, time: false}}
CompressFramework:
  Name: NFGR
  Compress:
    divide: {{divide_type: none, param_alloc: by_size, param_size_thres: 26,
             exception: none}}
    half: false
    sampler: {{name: randompoint, cube_count: 1,
              cube_len: [10000000,10000000,10000000], sample_size: 4096,
              gpu_force: true}}
    coords_mode: "-1,1"
    preprocess:
      denoise: {{level: 0, close: [2,2,2]}}
      clip: [0, {type_max}]
    param: {{init_net_path: none, filesize_ratio: 0, given_size: {given_size}}}
    loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: {type_max}}}
    gpu: true
    max_steps: {max_steps}
    checkpoints: none
    loss_log_freq: 200
    lr_phi: 0.001
    optimizer_name_phi: Adamax
    lr_scheduler_phi: {{name: none}}
    decompress: true
  Decompress:
    sample_size: 8192
    gpu: true
    postprocess:
      denoise: {{level: 0, close: [2,2,2]}}
      clip: [0, {type_max}]
    keep_decompressed: true
    mip: false
    mse: true
    psnr: true
    ssim: false
  Module:
    phi: {{name: SIREN, coords_channel: {coords_channel},
          data_channel: {data_channel}, layers: 5, w0: 20,
          output_act: false, res: false}}
  Normalize: {{name: {normalize}}}
""")


def test_png_2d_compress_e2e(tmp_path):
    """A smooth 2-D pattern compresses to high PSNR through the full NFGR
    pipeline with coords_channel=2."""
    from brief_pytorch_tpu.train.fit import NFGR
    x = np.linspace(0, 2 * np.pi, 96)
    img = ((np.sin(x[:, None]) * np.cos(x[None, :]) * 0.5 + 0.5)
           * 255).astype(np.uint8)[..., None]
    p = str(tmp_path / "img.png")
    save_img(p, img)
    opt = _single_opt(p, str(tmp_path), coords_channel=2, data_channel=1,
                      max_steps=800, given_size=4000)
    log = MyLogger(**opt.Log.to_plain())
    cf = NFGR(opt.CompressFramework, logger=log, seed=42)
    res = cf.compress(p)
    assert res["psnr"] > 25, res
    dec_dir = os.path.join(log.logdir, "steps800", "decompressed")
    dec = read_img(os.path.join(dec_dir, "img_decompressed.png"))
    assert dec.shape == img.shape and dec.dtype == img.dtype


def test_mp4_video_compress_e2e(tmp_path):
    """MP4 video treated as a (frames, h, w, 3) volume with
    coords_channel=3, data_channel=3."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    # smooth, codec-friendly frames
    base = rng.integers(40, 200, (1, 6, 8, 3), dtype=np.uint8)
    frames = np.repeat(np.repeat(np.repeat(base, 4, axis=0), 8, axis=1),
                       8, axis=2)
    p = str(tmp_path / "v.mp4")
    save_img(p, frames)
    vol = read_img(p)
    if vol.size == 0:
        pytest.skip("cv2 mp4 codec unavailable")
    assert vol.ndim == 4 and vol.shape[-1] == 3
    from brief_pytorch_tpu.train.fit import NFGR
    opt = _single_opt(p, str(tmp_path), coords_channel=3, data_channel=3,
                      max_steps=500, given_size=6000)
    log = MyLogger(**opt.Log.to_plain())
    cf = NFGR(opt.CompressFramework, logger=log, seed=42)
    res = cf.compress(p)
    assert res["psnr"] > 20, res
    dec_dir = os.path.join(log.logdir, "steps500", "decompressed")
    assert os.path.exists(os.path.join(dec_dir, "v_decompressed.mp4"))


def test_png_2d_divide_e2e(tmp_path):
    """2-D DivideTask: quadrant partition (reference divide_type
    'total_X_nh_nw' — the first field is ignored for 2-D inputs,
    misc.py:369-377), a 4-block fleet with coords_channel=2, merge by the
    2-D chunk names 'h_{y0}_{y1}-w_{x0}_{x1}' (misc.py:392)."""
    from brief_pytorch_tpu.parallel.divide_runner import compress_divide

    x = np.linspace(0, 2 * np.pi, 96)
    img = ((np.sin(x[:, None]) * np.cos(x[None, :]) * 0.5 + 0.5)
           * 255).astype(np.uint8)[..., None]
    p = str(tmp_path / "img.png")
    save_img(p, img)
    opt = _single_opt(p, str(tmp_path), coords_channel=2, data_channel=1,
                      max_steps=800, given_size=8000)
    opt.CompressFramework.Compress.divide.divide_type = "total_1_2_2"
    opt.CompressFramework.Compress.preprocess.denoise.close = [2, 2]
    opt.CompressFramework.Decompress.postprocess.denoise.close = [2, 2]
    opt.CompressFramework.Compress.sampler.cube_len = [10000000, 10000000]
    log = MyLogger(**opt.Log.to_plain())
    res = compress_divide(opt, log)
    assert res["psnr"] > 30, res
    mods = sorted(os.listdir(os.path.join(log.logdir, "steps800",
                                          "compressed", "module")))
    assert mods == ["h_0_47-w_0_47", "h_0_47-w_48_95",
                    "h_48_95-w_0_47", "h_48_95-w_48_95"]
