"""Quality metrics: PSNR/SSIM invariants on uint16 dynamic range.

Regression: float32 E[x^2]-E[x]^2 cancellation at 16-bit magnitudes pushed
SSIM above 1 before inputs were pre-scaled by the dynamic range."""
import numpy as np

from brief_pytorch_tpu.eval.metrics import cal_psnr, cal_ssim, eval_performance


def _vol(rng, shape=(8, 32, 32, 1)):
    return (rng.uniform(0, 1, shape) ** 2 * 65535).astype(np.uint16)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    a = _vol(rng)
    assert abs(cal_ssim(a, a, 65535) - 1.0) < 1e-5


def test_ssim_bounded_for_noisy_reconstruction():
    rng = np.random.default_rng(1)
    a = _vol(rng)
    noise = rng.normal(0, 800, a.shape)
    b = np.clip(a.astype(np.float64) + noise, 0, 65535).astype(np.uint16)
    s = cal_ssim(a, b, 65535)
    assert -1.0 <= s <= 1.0
    assert s < 1.0


def test_ssim_2d_path():
    rng = np.random.default_rng(2)
    a = _vol(rng, (64, 64, 1))
    b = np.clip(a.astype(np.int64) + 100, 0, 65535).astype(np.uint16)
    s = cal_ssim(a, b, 65535)
    assert -1.0 <= s <= 1.0


def test_psnr_known_value():
    a = np.zeros((4, 4, 4, 1), np.uint16)
    b = np.full_like(a, 655)  # mse = 655^2 on range 65535
    expect = -10 * np.log10((655 / 65535) ** 2)
    assert abs(cal_psnr(a, b, 65535) - expect) < 1e-4


def test_eval_performance_keys():
    rng = np.random.default_rng(3)
    a = _vol(rng, (4, 16, 16, 1))
    out = eval_performance(10, a, a, None, True, True, True)
    assert set(out) == {"steps", "mse", "psnr", "ssim"}
    assert out["mse"] == 0.0


def test_ssim_constant_reconstruction_bounded():
    """Regression: near-flat windows + a constant reconstruction drove the
    float32 variance negative -> contrast term C2/(s1+C2) > 1 -> SSIM 1.16."""
    from brief_pytorch_tpu.io.image import read_img
    import os
    fix = "/root/reference/dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"
    if os.path.exists(fix):
        a = read_img(fix)
    else:
        rng = np.random.default_rng(0)
        z = np.linspace(16633, 24070, 64, dtype=np.float32)
        a = (z[:, None, None, None] + rng.normal(0, 30, (64, 64, 64, 1))
             ).astype(np.uint16)
    b = np.full_like(a, 17165)
    s = cal_ssim(a, b, 65535)
    assert s <= 1.0 + 1e-3, s
