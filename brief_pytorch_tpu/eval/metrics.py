"""Quality metrics: MSE, PSNR (dtype-max range), slice-averaged SSIM.

Capability parity: reference utils/misc.py:447-499 (cal_mse/cal_psnr/
cal_ssim/eval_performance) and the vendored pure-torch SSIM
(utils/ssim.py:9-120: 1-D gaussian window 11, sigma 1.5, K=(0.01,0.03),
separable filtering, per-channel mean).

TPU-first: SSIM runs as jnp separable convolutions under jit; 3-D volumes
are evaluated as 2-D SSIM per depth slice then averaged, matching the
reference exactly (utils/misc.py:458-475).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from brief_pytorch_tpu.core.normalize import get_type_max


def cal_mse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(((a - b) ** 2).mean())


def cal_psnr(origin: np.ndarray, decompressed: np.ndarray, data_range: float) -> float:
    """PSNR over the dtype dynamic range (reference utils/misc.py:451-456)."""
    a = np.asarray(origin, np.float32) / data_range
    b = np.asarray(decompressed, np.float32) / data_range
    mse = float(np.mean((a - b) ** 2))
    return float(-10.0 * np.log10(mse))


def _gauss_kernel1d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter_sep2d(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur over the last two axes of (n,c,h,w)."""
    k = win.shape[0]

    def conv_last(z):
        # z: (..., L); valid 1-D convolution (correlation) along L
        pads = [(0, 0)] * (z.ndim - 1) + [(0, 0)]
        out = jax.lax.conv_general_dilated(
            z.reshape((-1, 1, z.shape[-1])),
            win.reshape((1, 1, k)),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out.reshape(z.shape[:-1] + (z.shape[-1] - k + 1,))

    x = conv_last(x)                       # blur along w
    x = jnp.swapaxes(conv_last(jnp.swapaxes(x, -1, -2)), -1, -2)  # along h
    return x


def _ssim_map(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
              win_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM of (n, c, h, w) pairs.

    Float32-robust formulation: the textbook E[x^2] - mu^2 variance goes
    (slightly) negative in near-flat windows under float32, and when the
    other image is constant (sigma2 = 0) the contrast term C2/(s1+C2)
    blows past 1 (observed 1.16 on an early-training constant decode).
    Centering by the global mean before the variance convolutions is
    mathematically identical but numerically stable; variances are clamped
    at 0, which bounds the map at ~1.
    """
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    win = _gauss_kernel1d(win_size, 1.5)
    m = 0.5 * (x.mean() + y.mean())
    xc, yc = x - m, y - m
    mu1 = _filter_sep2d(x, win)
    mu2 = _filter_sep2d(y, win)
    mu1c, mu2c = mu1 - m, mu2 - m
    s1 = jnp.maximum(_filter_sep2d(xc * xc, win) - mu1c * mu1c, 0.0)
    s2 = jnp.maximum(_filter_sep2d(yc * yc, win) - mu2c * mu2c, 0.0)
    s12 = _filter_sep2d(xc * yc, win) - mu1c * mu2c
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    return ((2 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)) * cs


@partial(jax.jit, static_argnames=("win_size",))
def _ssim2d(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
            win_size: int = 11) -> jnp.ndarray:
    """SSIM of (n, c, h, w) pairs; returns scalar mean over batch+channels."""
    return _ssim_map(x, y, data_range, win_size).mean()


def cal_ssim(origin: np.ndarray, decompressed: np.ndarray, data_range: float,
             slice_batch: int = 64) -> float:
    """SSIM; 3-D (d,h,w,c) volumes -> mean of per-depth-slice 2-D SSIM
    (reference utils/misc.py:458-475).

    Inputs are pre-scaled by data_range (SSIM is scale-invariant when the
    range is scaled too): uint16 intensities squared overflow float32
    precision in the E[x^2]-E[x]^2 variance, which can push SSIM past 1.
    """
    a = np.asarray(origin, np.float32) / data_range
    b = np.asarray(decompressed, np.float32) / data_range
    data_range = 1.0
    if a.ndim == 3:  # (h, w, c) -> (1, c, h, w)
        x = jnp.asarray(a.transpose(2, 0, 1)[None])
        y = jnp.asarray(b.transpose(2, 0, 1)[None])
        return float(_ssim2d(x, y, float(data_range)))
    if a.ndim == 4:  # (d, h, w, c): slices as batch, mean of per-slice values
        total = 0.0
        d = a.shape[0]
        for s in range(0, d, slice_batch):
            xa = jnp.asarray(a[s:s + slice_batch].transpose(0, 3, 1, 2))
            yb = jnp.asarray(b[s:s + slice_batch].transpose(0, 3, 1, 2))
            n = xa.shape[0]
            total += float(_ssim2d_batch_sum(xa, yb, float(data_range)))
        return total / d
    raise NotImplementedError(a.shape)


@jax.jit
def _ssim2d_batch_sum(x, y, data_range):
    """Sum of per-image SSIM over the batch (per-slice means, then sum)."""
    return _ssim_map(x, y, data_range).mean(axis=(1, 2, 3)).sum()


def eval_performance(steps: int, data1: np.ndarray, data2: np.ndarray,
                     logger=None, mse: bool = True, psnr: bool = True,
                     ssim: bool = True) -> Dict[str, float]:
    """Compute and optionally log quality metrics
    (reference utils/misc.py:477-499)."""
    out: Dict[str, float] = {"steps": steps}
    max_range = get_type_max(data1)
    a = np.asarray(data1, np.float32)
    b = np.asarray(data2, np.float32)
    if mse:
        out["mse"] = cal_mse(a, b)
        if logger:
            logger.log_metrics({"mse": out["mse"]}, steps)
    if psnr:
        out["psnr"] = cal_psnr(a, b, max_range)
        if logger:
            logger.log_metrics({"psnr": out["psnr"]}, steps)
    if ssim:
        out["ssim"] = cal_ssim(a, b, max_range)
        if logger:
            logger.log_metrics({"ssim": out["ssim"]}, steps)
    return out


def mip_ops(data: np.ndarray, save_dir=None, data_name: str = "",
            suffix: str = ""):
    """Max-intensity projections along the 3 axes
    (reference utils/misc.py:233-242)."""
    assert data.ndim == 4
    mips = (data.max(0), data.max(1), data.max(2))
    if save_dir is not None:
        import os
        from brief_pytorch_tpu.io.image import save_img
        for name, mip in zip(("d", "h", "w"), mips):
            save_img(os.path.join(save_dir, f"{data_name}_mip_{name}{suffix}"), mip)
    return mips
