"""Partitioning oracle: divide_data / alloc_param / merge_divided_data /
cal_divide_num / cal_feature vs the reference implementations
(utils/misc.py:329-445, utils/adaptive_blocking.py:16-24,425-460), imported
from the read-only mount with its unavailable deps stubbed.  These
functions define the divide file contract (chunk extents, names, budgets),
so exact agreement matters."""
import os
import sys
import types

import numpy as np
import pytest

from brief_pytorch_tpu.partition.divide import (alloc_param, cal_divide_num,
                                                divide_data,
                                                merge_divided_data)
from brief_pytorch_tpu.partition.tree import cal_feature

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount unavailable")


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref():
    import torch  # noqa: F401 (reference misc imports it)
    _stub("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
          Model=object, quicksum=sum)
    _stub("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
          SevenZipFile=object)
    _stub("tifffile", imread=None, imwrite=None)
    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    _stub("omegaconf.listconfig", ListConfig=list)

    class _EM:  # compressai entropy-model stand-ins (unused here)
        pass
    _stub("compressai")
    _stub("compressai.entropy_models", EntropyBottleneck=_EM,
          GaussianConditional=_EM)
    sys.path.insert(0, REF)
    try:
        import utils.misc as ref_misc
        import utils.adaptive_blocking as ref_ab
    finally:
        sys.path.remove(REF)
    return ref_misc, ref_ab


def _vol(shape=(12, 20, 16, 1), seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 65535, shape).astype(np.uint16)


@pytest.mark.parametrize("divide_type", ["total_2_2_2", "total_3_2_1",
                                         "every_6_10_8", "every_5_7_16"])
def test_divide_data_matches_reference(ref, divide_type):
    ref_misc, _ = ref
    vol = _vol()
    ours, our_img = divide_data(vol.copy(), divide_type)
    theirs, their_img = ref_misc.divide_data(vol.copy(), divide_type)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert a["name"] == b["name"]
        assert a["d"] == list(b["d"]) and a["h"] == list(b["h"]) \
            and a["w"] == list(b["w"])
        np.testing.assert_array_equal(a["data"], b["data"])
        assert a["size"] == b["size"] and a["total_size"] == b["total_size"]
    np.testing.assert_array_equal(our_img, their_img)


def test_divide_data_2d_matches_reference(ref):
    ref_misc, _ = ref
    img = _vol((24, 18, 1), seed=1)
    # 2-D format carries a placeholder depth token: total_<nd>_<nh>_<nw>
    ours, _ = divide_data(img.copy(), "total_1_2_3")
    theirs, _ = ref_misc.divide_data(img.copy(), "total_1_2_3")
    for a, b in zip(ours, theirs):
        assert a["name"] == b["name"]
        np.testing.assert_array_equal(a["data"], b["data"])


@pytest.mark.parametrize("mode", ["equal", "by_size", "by_var", "by_d",
                                  "by_dv"])
def test_alloc_param_matches_reference(ref, mode):
    ref_misc, _ = ref
    vol = _vol((16, 16, 16, 1), seed=2)
    ours, _ = divide_data(vol.copy(), "total_2_2_2")
    theirs, _ = ref_misc.divide_data(vol.copy(), "total_2_2_2")
    ours = alloc_param(ours, 4096.0, mode, param_size_thres=10.0)
    theirs = ref_misc.alloc_param(theirs, 4096.0, mode,
                                  param_size_thres=10.0)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert a["name"] == b["name"]
        np.testing.assert_allclose(a["param_size"], b["param_size"],
                                   rtol=1e-6)


def test_alloc_param_threshold_drop_matches_reference(ref):
    """Blocks under param_size_thres are dropped and the budget re-allocated
    recursively (reference misc.py:404-428)."""
    ref_misc, _ = ref
    vol = _vol((16, 16, 16, 1), seed=3).astype(np.float32)
    # make one block nearly flat so by_var starves it below the threshold
    vol[:8, :8, :8] = 100.0
    ours, _ = divide_data(vol.copy(), "total_2_2_2")
    theirs, _ = ref_misc.divide_data(vol.copy(), "total_2_2_2")
    ours = alloc_param(ours, 2000.0, "by_var", param_size_thres=100.0)
    theirs = ref_misc.alloc_param(theirs, 2000.0, "by_var",
                                  param_size_thres=100.0)
    assert sorted(a["name"] for a in ours) == \
        sorted(b["name"] for b in theirs)
    ours = {a["name"]: a["param_size"] for a in ours}
    for b in theirs:
        np.testing.assert_allclose(ours[b["name"]], b["param_size"],
                                   rtol=1e-6)


def test_merge_matches_reference(ref):
    ref_misc, _ = ref
    vol = _vol((10, 12, 14, 1), seed=4)
    chunks, _ = divide_data(vol.copy(), "total_2_2_2")
    merged = merge_divided_data(
        [{"data": c["data"], "d": c["d"], "h": c["h"], "w": c["w"]}
         for c in chunks], list(vol.shape))
    theirs = ref_misc.merge_divided_data(
        [{"data": c["data"], "d": c["d"], "h": c["h"], "w": c["w"]}
         for c in chunks], list(vol.shape))
    np.testing.assert_array_equal(merged, theirs)
    np.testing.assert_array_equal(merged, vol)


@pytest.mark.parametrize("dhw,Nb", [((64, 512, 512), 4), ((64, 64, 64), 8),
                                    ((100, 300, 200), 6)])
def test_cal_divide_num_matches_reference(ref, dhw, Nb):
    _, ref_ab = ref
    d, h, w = dhw
    ours = cal_divide_num(d, h, w, Nb, param_size=1e5)
    theirs = ref_ab.cal_divide_num(d, h, w, Nb, param_size=1e5)
    assert tuple(ours) == tuple(theirs)


def test_cal_feature_matches_reference(ref):
    """Reference conventions: 3-dim input is a BGR (h,w,3) image (gray +
    2-axis FFT); 4-dim is a volume with a 3-axis FFT
    (adaptive_blocking.py:16-24)."""
    _, ref_ab = ref
    rng = np.random.default_rng(5)
    bgr = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    np.testing.assert_allclose(cal_feature(bgr), ref_ab.cal_feature(bgr),
                               rtol=1e-5)
    vol = rng.random((8, 16, 16, 1)).astype(np.float32)
    np.testing.assert_allclose(cal_feature(vol), ref_ab.cal_feature(vol),
                               rtol=1e-5)
