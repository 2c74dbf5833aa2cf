"""MS-SSIM (eval/metrics.cal_ms_ssim) vs properties and the reference's
vendored pure-torch implementation (utils/ssim.py:153-225), loaded from the
read-only reference mount purely as a numeric oracle."""
import importlib.util
import os
import warnings

import numpy as np
import pytest

from brief_pytorch_tpu.eval.metrics import cal_ms_ssim, cal_ssim

REF_SSIM = "/root/reference/utils/ssim.py"


def _rand_img(shape, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random(shape).astype(np.float32)
    # smooth it a bit so SSIM isn't saturated at noise
    from scipy.ndimage import uniform_filter
    return uniform_filter(base, size=5)


def test_identity_is_one():
    img = _rand_img((200, 200, 1))
    assert cal_ms_ssim(img, img, 1.0) == pytest.approx(1.0, abs=1e-5)


def test_monotone_degradation():
    img = _rand_img((200, 200, 1))
    rng = np.random.default_rng(1)
    small = img + 0.02 * rng.standard_normal(img.shape).astype(np.float32)
    big = img + 0.2 * rng.standard_normal(img.shape).astype(np.float32)
    v_small = cal_ms_ssim(img, small, 1.0)
    v_big = cal_ms_ssim(img, big, 1.0)
    assert 0.0 <= v_big < v_small < 1.0


def test_min_side_guard():
    img = _rand_img((128, 128, 1))
    with pytest.raises(ValueError):
        cal_ms_ssim(img, img, 1.0)


def test_volume_path_runs():
    vol = _rand_img((8, 180, 180, 1), seed=2)
    noisy = vol + 0.05 * np.random.default_rng(3).standard_normal(
        vol.shape).astype(np.float32)
    v = cal_ms_ssim(vol, noisy, 1.0)
    assert 0.0 < v < 1.0


@pytest.mark.skipif(not os.path.exists(REF_SSIM),
                    reason="reference mount unavailable")
def test_matches_reference_torch_oracle():
    import torch
    spec = importlib.util.spec_from_file_location("ref_ssim", REF_SSIM)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    img = _rand_img((200, 220, 1))
    noisy = img + 0.1 * np.random.default_rng(4).standard_normal(
        img.shape).astype(np.float32)
    ours = cal_ms_ssim(img, noisy, 1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = torch.from_numpy(img.transpose(2, 0, 1)[None])
        y = torch.from_numpy(noisy.transpose(2, 0, 1)[None])
        theirs = float(ref.ms_ssim(x, y, data_range=1.0))
    assert ours == pytest.approx(theirs, abs=2e-4)

    # plain SSIM parity on the same pair
    ours_s = cal_ssim(img, noisy, 1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs_s = float(ref.ssim(x, y, data_range=1.0))
    assert ours_s == pytest.approx(theirs_s, abs=2e-4)
