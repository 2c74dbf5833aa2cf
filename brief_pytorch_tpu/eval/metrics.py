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


def _conv_last(z: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Valid 1-D correlation along the last axis — the ONE place the SSIM
    filters build a conv.

    precision=HIGHEST is load-bearing: TPU convs default to bf16 multiplies,
    which perturbed SSIM by ~0.03 on uint16-range volumes (observed 0.9348
    vs the true 0.9601).  Axes smaller than the window pass through
    unfiltered (reference utils/ssim.py:44-51 skips those dims)."""
    k = win.shape[0]
    if z.shape[-1] < k:
        return z
    out = jax.lax.conv_general_dilated(
        z.reshape((-1, 1, z.shape[-1])),
        win.reshape((1, 1, k)),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(z.shape[:-1] + (z.shape[-1] - k + 1,))


def _filter_sep2d(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur over the last two axes of (n,c,h,w)."""
    x = _conv_last(x, win)                 # blur along w
    x = jnp.swapaxes(_conv_last(jnp.swapaxes(x, -1, -2), win), -1, -2)
    return x


def _filter_sep_nd(x: jnp.ndarray, win: jnp.ndarray, spatial_dims: int
                   ) -> jnp.ndarray:
    """Separable valid-mode gaussian blur over the last `spatial_dims` axes."""
    if spatial_dims == 2:
        return _filter_sep2d(x, win)
    assert spatial_dims == 3
    x = _filter_sep2d(x, win)                      # along w, h
    x = jnp.moveaxis(x, -3, -1)                    # (n, c, h, w, d)
    x = _conv_last(x, win)                         # along d
    return jnp.moveaxis(x, -1, -3)                 # back to (n, c, d, h, w)


def _ssim_cs_maps(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
                  win_size: int = 11, spatial_dims: int = 2):
    """Per-pixel (ssim_map, cs_map) of (n, c, *spatial) pairs.

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
    mu1 = _filter_sep_nd(x, win, spatial_dims)
    mu2 = _filter_sep_nd(y, win, spatial_dims)
    mu1c, mu2c = mu1 - m, mu2 - m
    s1 = jnp.maximum(_filter_sep_nd(xc * xc, win, spatial_dims) - mu1c * mu1c,
                     0.0)
    s2 = jnp.maximum(_filter_sep_nd(yc * yc, win, spatial_dims) - mu2c * mu2c,
                     0.0)
    s12 = _filter_sep_nd(xc * yc, win, spatial_dims) - mu1c * mu2c
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    return ((2 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)) * cs, cs


def _ssim_map(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
              win_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM of (n, c, h, w) pairs."""
    return _ssim_cs_maps(x, y, data_range, win_size)[0]


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


MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(x: jnp.ndarray, spatial_dims: int) -> jnp.ndarray:
    """2x downsample by mean pooling over the last `spatial_dims` axes,
    zero-padding odd extents on both sides with pads counted in the mean
    (reference utils/ssim.py:214-216: avg_pool(kernel_size=2,
    padding=[s % 2]) with torch's count_include_pad=True default)."""
    nd = x.ndim
    pads = [(0, 0)] * (nd - spatial_dims) + [
        (x.shape[d] % 2, x.shape[d] % 2)
        for d in range(nd - spatial_dims, nd)]
    x = jnp.pad(x, pads)
    window = (1,) * (nd - spatial_dims) + (2,) * spatial_dims
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window,
                                   "VALID")
    return summed / float(2 ** spatial_dims)


@partial(jax.jit, static_argnames=("win_size", "spatial_dims"))
def _ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
             win_size: int = 11, spatial_dims: int = 2) -> jnp.ndarray:
    """MS-SSIM of (n, c, *spatial) pairs (reference utils/ssim.py:153-225):
    5 levels, per-level relu'd cs means, relu'd last-level ssim mean,
    weighted geometric mean; returns the scalar batch+channel mean."""
    levels = len(MS_SSIM_WEIGHTS)
    reduce_axes = tuple(range(2, 2 + spatial_dims))
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_map, cs_map = _ssim_cs_maps(x, y, data_range, win_size,
                                         spatial_dims)
        ssim_pc = ssim_map.mean(axis=reduce_axes)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs_map.mean(axis=reduce_axes), 0.0))
            x = _avg_pool2(x, spatial_dims)
            y = _avg_pool2(y, spatial_dims)
    stack = jnp.stack(mcs + [jnp.maximum(ssim_pc, 0.0)], axis=0)
    w = jnp.asarray(MS_SSIM_WEIGHTS, stack.dtype).reshape(-1, 1, 1)
    return jnp.prod(stack ** w, axis=0).mean()


def cal_ms_ssim(origin: np.ndarray, decompressed: np.ndarray,
                data_range: float, win_size: int = 11) -> float:
    """MS-SSIM; (h,w,c) images use 2-D filtering/pooling, (d,h,w,c) volumes
    use volumetric 3-D filtering/pooling (the reference's 4-d/5-d branches,
    utils/ssim.py:181-185).  Requires min(h,w) > (win_size-1)*16 for the 4
    downsamplings (utils/ssim.py:195-197)."""
    a = np.asarray(origin, np.float32) / data_range
    b = np.asarray(decompressed, np.float32) / data_range
    if min(a.shape[-3:-1] if a.ndim == 4 else a.shape[:2]) <= \
            (win_size - 1) * 16:
        raise ValueError(
            f"Image side must exceed {(win_size - 1) * 16} for ms-ssim")
    if a.ndim == 3:    # (h, w, c) -> (1, c, h, w)
        x = jnp.asarray(a.transpose(2, 0, 1)[None])
        y = jnp.asarray(b.transpose(2, 0, 1)[None])
        return float(_ms_ssim(x, y, 1.0, win_size, 2))
    if a.ndim == 4:    # (d, h, w, c) -> (1, c, d, h, w)
        x = jnp.asarray(a.transpose(3, 0, 1, 2)[None])
        y = jnp.asarray(b.transpose(3, 0, 1, 2)[None])
        return float(_ms_ssim(x, y, 1.0, win_size, 3))
    raise NotImplementedError(a.shape)


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
