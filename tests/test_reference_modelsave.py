"""Interchange-format oracle: the raw per-layer weight binaries (the actual
compressed payload and the BRIEF_CUDA interchange format, reference
utils/ModelSave.py) written by our io/modelsave must be byte-identical to
the reference's, and each side's files must load with the other's reader."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax

from brief_pytorch_tpu.io.modelsave import load_model, save_model
from brief_pytorch_tpu.models.phi import init_phi

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount unavailable")


@pytest.fixture(scope="module")
def ref_modelsave():
    spec = importlib.util.spec_from_file_location(
        "ref_modelsave", os.path.join(REF, "utils", "ModelSave.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _dir_bytes(d):
    return {f: open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d))}


def test_raw_binary_byte_identical_and_cross_loads(ref_modelsave, tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_reference_numerics import _stub
    import types
    _stub("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
          Model=object, quicksum=sum)
    _stub("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
          SevenZipFile=object)
    _stub("tifffile", imread=None, imwrite=None, imsave=None)
    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    _stub("omegaconf.listconfig", ListConfig=list)

    class _EM:
        pass
    _stub("compressai")
    _stub("compressai.entropy_models", EntropyBottleneck=_EM,
          GaussianConditional=_EM)
    sys.path.insert(0, REF)
    try:
        import utils.Networks as refnet
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    cfg = dict(coords_channel=3, data_channel=1, features=20, layers=4,
               w0=20, res=False, output_act=False)
    ref_model = refnet.init_phi({"name": "SIREN", **cfg})

    ref_dir = str(tmp_path / "ref_module")
    ref_modelsave.save_model(ref_model, ref_dir)

    # same weights through OUR writer (ours stores (in,out); format is
    # the torch (out,in) row-major payload)
    layers = [{"w": lin.weight.detach().numpy().T.copy(),
               "b": lin.bias.detach().numpy().copy()}
              for lin in (m for m in ref_model.modules()
                          if isinstance(m, torch.nn.Linear))]
    our_dir = str(tmp_path / "our_module")
    save_model(layers, our_dir)

    ref_files = _dir_bytes(ref_dir)
    our_files = _dir_bytes(our_dir)
    assert set(ref_files) == set(our_files), (set(ref_files) ^ set(our_files))
    for name in ref_files:
        assert ref_files[name] == our_files[name], f"byte diff in {name}"

    # cross-load: our reader on the REFERENCE-written dir
    loaded = load_model(ref_dir)
    for got, want in zip(loaded, layers):
        np.testing.assert_array_equal(np.asarray(got["w"]), want["w"])
        np.testing.assert_array_equal(np.asarray(got["b"]), want["b"])

    # and a decode from the reference-written dir through our model
    ours = init_phi({"name": "SIREN", **cfg})
    params = {**ours.init(jax.random.PRNGKey(0)),
              "layers": [{k: np.asarray(v) for k, v in l.items()}
                         for l in loaded]}
    coords = np.random.default_rng(0).uniform(-1, 1, (64, 3)).astype(np.float32)
    with torch.no_grad():
        want_out = ref_model(torch.from_numpy(coords)).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(params, coords)),
                               want_out, atol=2e-5, rtol=1e-4)
