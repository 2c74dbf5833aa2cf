"""Core-layer oracles vs the reference: normalization round-trips,
coordinate grids, and the closed-form network-sizing solvers — the
functions PSNR parity and exact byte budgets depend on."""
import os
import sys
import types

import numpy as np
import pytest

import jax

from brief_pytorch_tpu.core.coords import create_flattened_coords
from brief_pytorch_tpu.core.normalize import invnormalize_data, normalize_data
from brief_pytorch_tpu.models import sizing
from brief_pytorch_tpu.models.phi import get_param_count, init_phi

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
def ref_mods():
    import torch  # noqa: F401
    _stub("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
          SevenZipFile=object)
    _stub("tifffile", imread=None, imwrite=None, imsave=None)
    _stub("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
          Model=object, quicksum=sum)
    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    _stub("omegaconf.listconfig", ListConfig=list)

    class _EM:
        pass
    _stub("compressai")
    _stub("compressai.entropy_models", EntropyBottleneck=_EM,
          GaussianConditional=_EM)
    sys.path.insert(0, REF)
    try:
        import utils.Networks as ref_net
        import utils.dataset as ref_ds
        import utils.io as ref_io
    finally:
        sys.path.remove(REF)
    return ref_io, ref_ds, ref_net


NORM_MODES = ["minmaxany_0_100", "minmaxany_0_1", "minmax01_0mean",
              "minmax01_0mean1std", "none"]


@pytest.mark.parametrize("name", NORM_MODES)
def test_normalize_matches_reference(ref_mods, name):
    ref_io, _, _ = ref_mods
    rng = np.random.default_rng(0)
    data = rng.integers(10, 60001, (6, 7, 8, 1)).astype(np.uint16)
    ours, side = normalize_data(data.copy(), name)
    theirs, ref_side = ref_io.normalize_data(data.copy(), name)
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-6)
    for k in ("dtype", "min", "max"):
        assert side[k] == ref_side[k], (k, side[k], ref_side[k])
    # inverse step compared on the SAME normalized tensor (feeding each its
    # own forward output would amplify forward float-ulp differences
    # through the final truncation into spurious off-by-ones)
    import torch
    inv_ours = invnormalize_data(ours.copy(), side, name)
    inv_ref = ref_io.invnormalize_data(torch.from_numpy(ours.copy()),
                                       ref_side, name)
    diff = inv_ours.astype(np.int64) - inv_ref.astype(np.int64)
    # |diff| <= 1: the reference computes the inverse in torch f32, ours in
    # numpy f32; values landing exactly on integer boundaries may truncate
    # apart by one — the same magnitude by which BOTH implementations'
    # round-trips deviate from the original data
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    rt = inv_ours.astype(np.int64) - data.astype(np.int64)
    assert np.abs(rt).max() <= 1, np.abs(rt).max()


@pytest.mark.parametrize("mode", ["-1,1", "0,1"])
def test_flattened_coords_match_reference(ref_mods, mode):
    _, ref_ds, _ = ref_mods
    for shape in ((5, 6, 7), (9, 11)):
        ours = np.asarray(create_flattened_coords(shape, mode))
        theirs = ref_ds.create_flattened_coords(shape, mode).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


# kwargs match the reference calc_* signatures (explicit, no defaults)
SIZING_CASES = [
    ("SIREN", dict(layers=5, coords_channel=3, data_channel=1, res=False)),
    ("SIREN", dict(layers=3, coords_channel=2, data_channel=2, res=False)),
    ("SIRENFT", dict(layers=5, coords_channel=3, data_channel=1, res=False,
                     ratio=4)),
    ("SIREN_RELU", dict(layers=4, coords_channel=3, data_channel=1,
                        res=False)),
    ("SIREN_SIGMOID", dict(layers=4, coords_channel=3, data_channel=1,
                           res=False)),
    ("SIREN_Pyramid", dict(layers=4, coords_channel=3, data_channel=1,
                           res=False, features_dis=10)),
    ("SIRENPS", dict(layers=5, coords_channel=3, data_channel=1, res=False,
                     ratio=0.8)),
    ("SIRENPos", dict(layers=4, coords_channel=2, data_channel=1, T=[2, 3])),
    ("NeRF", dict(layers=4, coords_channel=3, data_channel=1,
                  frequencies=10, skip=False)),
    ("FFN", dict(layers=5, coords_channel=3, data_channel=1, embsize=32,
                 skip=False)),
    ("MFNFourier", dict(layers=4, coords_channel=3, data_channel=1)),
    ("MFNGabor", dict(layers=4, coords_channel=3, data_channel=1)),
]


@pytest.mark.slow  # 30-70 s per case: full reference sizing sweep
@pytest.mark.parametrize("name,kw", SIZING_CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in
                              enumerate(SIZING_CASES)])
def test_sizing_solvers_match_reference(ref_mods, name, kw):
    """calc_features / calc_param_count agree with the reference registries
    (Networks.py:795-802) across a budget sweep, and the constructed pytree
    has exactly calc_param_count parameters."""
    _, _, ref_net = ref_mods
    ref_feat = ref_net.ALL_CALC_PHI_FEATURES[name]
    ref_count = ref_net.ALL_CALC_PHI_PARAM_COUNT[name]
    our_feat = sizing.ALL_CALC_PHI_FEATURES[name]
    our_count = sizing.ALL_CALC_PHI_PARAM_COUNT[name]
    for budget in (500, 2000, 20000, 333333):
        f_ref = ref_feat(param_count=budget, **kw)
        f_ours = our_feat(param_count=budget, **kw)
        assert f_ours == f_ref, (name, budget, f_ours, f_ref)
        if np.isscalar(f_ref):
            feats = int(f_ref)
        else:
            feats = [int(v) for v in f_ref]
        c_ref = ref_count(features=feats, **kw)
        c_ours = our_count(features=feats, **kw)
        assert c_ours == c_ref, (name, budget, c_ours, c_ref)
        # constructed pytree must match the closed form exactly
        model = init_phi({"name": name, "features": feats, "w0": 20, **kw})
        params = model.init(jax.random.PRNGKey(0))
        assert get_param_count(params) == c_ours, (name, budget)
