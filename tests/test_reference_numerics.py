"""Numerics oracle: forward outputs and per-parameter gradients of our φ
networks match the torch reference (utils/Networks.py) on identical weights
and coordinates — the BASELINE.md north-star "decoded volume and
per-parameter pixel gradients match reference (allclose)".

The reference package is imported from the read-only mount purely as a
numeric oracle (stubs satisfy its unavailable imports: gurobipy, py7zr,
omegaconf, tifffile, compressai).  Weights flow reference->ours (torch
Linear stores (out,in); ours stores (in,out)).
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.models.phi import init_phi

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
def ref_networks():
    torch = pytest.importorskip("torch")
    _stub("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
          Model=object, quicksum=sum)
    _stub("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
          SevenZipFile=object)
    _stub("tifffile", imread=None, imwrite=None)
    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    _stub("omegaconf.listconfig", ListConfig=list)

    class _EM(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
    _stub("compressai")
    _stub("compressai.entropy_models", EntropyBottleneck=_EM,
          GaussianConditional=_EM)
    sys.path.insert(0, REF)
    try:
        import utils.Networks as refnet
    finally:
        sys.path.remove(REF)
    return refnet


CASES = [
    ("SIREN", dict(coords_channel=3, data_channel=1, features=20, layers=5,
                   w0=20, res=False, output_act=False)),
    ("SIREN", dict(coords_channel=2, data_channel=2, features=16, layers=4,
                   w0=30, res=False, output_act=True)),
    ("SIRENFT", dict(coords_channel=3, data_channel=1, features=14, layers=5,
                     w0=20, ft=4)),
    ("SIREN_RELU", dict(coords_channel=3, data_channel=1, features=18,
                        layers=4)),
    ("SIREN_SIGMOID", dict(coords_channel=3, data_channel=1, features=18,
                           layers=4)),
    # features must exceed (layers-2)*features_dis: the reference shrinks
    # widths by 10 per hidden layer (Networks.py:385)
    ("SIREN_Pyramid", dict(coords_channel=3, data_channel=1, features=48,
                           layers=5, w0=20)),
    ("SIRENPS", dict(coords_channel=3, data_channel=1, features=24, layers=5,
                     w0=20, eta=0.8)),
    ("NeRF", dict(coords_channel=3, data_channel=1, features=20, layers=4)),
]


def _torch_linears(module):
    """All nn.Linear leaves of the reference net, in forward order."""
    import torch
    return [m for m in module.modules() if isinstance(m, torch.nn.Linear)]


def _load_ref_weights_into_ours(ref_module, our_params):
    linears = _torch_linears(ref_module)
    layers = our_params["layers"]
    assert len(linears) == len(layers), \
        f"layer-count mismatch: torch {len(linears)} vs ours {len(layers)}"
    new_layers = []
    for lin, l in zip(linears, layers):
        w = jnp.asarray(lin.weight.detach().numpy().T)   # (out,in)->(in,out)
        b = jnp.asarray(lin.bias.detach().numpy())
        assert w.shape == l["w"].shape, (w.shape, l["w"].shape)
        new_layers.append({"w": w, "b": b})
    return {**our_params, "layers": new_layers}


@pytest.mark.parametrize("name,cfg", CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_forward_and_grads_match_reference(ref_networks, name, cfg):
    import torch
    torch.manual_seed(0)
    ref = ref_networks.init_phi({"name": name, **cfg})
    ours = init_phi({"name": name, **cfg})
    params = _load_ref_weights_into_ours(ref, ours.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    n = 257
    coords = rng.uniform(-1, 1,
                         (n, cfg["coords_channel"])).astype(np.float32)
    target = rng.uniform(0, 1, (n, cfg["data_channel"])).astype(np.float32)
    weight = (1.0 + rng.uniform(0, 1, target.shape)).astype(np.float32)

    # ---- forward ----
    tc = torch.from_numpy(coords).requires_grad_(True)
    ref_out = ref(tc)
    our_out = ours.apply(params, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(our_out),
                               ref_out.detach().numpy(),
                               atol=2e-5, rtol=1e-4)

    # ---- per-parameter gradients of the weighted-MSE training loss ----
    loss_t = (((ref_out - torch.from_numpy(target)) ** 2)
              * torch.from_numpy(weight)).mean()
    loss_t.backward()
    ref_grads = [(lin.weight.grad.numpy().T, lin.bias.grad.numpy())
                 for lin in _torch_linears(ref)]

    def loss_f(p):
        pred = ours.apply(p, jnp.asarray(coords))
        return (((pred - target) ** 2) * weight).mean()

    our_loss, our_grads = jax.value_and_grad(loss_f)(params)
    np.testing.assert_allclose(float(our_loss), float(loss_t),
                               rtol=1e-5)
    for li, (l, (gw, gb)) in enumerate(zip(our_grads["layers"], ref_grads)):
        np.testing.assert_allclose(np.asarray(l["w"]), gw, atol=2e-5,
                                   rtol=1e-3, err_msg=f"{name} dW layer {li}")
        np.testing.assert_allclose(np.asarray(l["b"]), gb, atol=2e-5,
                                   rtol=1e-3, err_msg=f"{name} db layer {li}")


def test_ffn_matches_reference(ref_networks):
    """FFN: frozen Fourier bvals copied from the reference parameter, ReLU
    chain + linears mapped 1:1."""
    import torch
    torch.manual_seed(0)
    cfg = dict(coords_channel=3, data_channel=1, features=24, layers=4,
               embsize=16, scale=10)
    ref = ref_networks.init_phi({"name": "FFN", **cfg})
    ours = init_phi({"name": "FFN", **cfg})
    params = _load_ref_weights_into_ours(ref, ours.init(jax.random.PRNGKey(0)))
    params["encoder"] = {
        "bvals": jnp.asarray(ref.fourier_embedding.bvals.detach().numpy())
        if hasattr(ref, "fourier_embedding")
        else jnp.asarray([m for m in ref.modules()
                          if type(m).__name__ == "FourierFeatureEmbedding"
                          ][0].bvals.detach().numpy())}
    coords = np.random.default_rng(1).uniform(
        -1, 1, (101, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(coords)).numpy()
    our_out = np.asarray(ours.apply(params, jnp.asarray(coords)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-5, rtol=1e-4)


def test_sirenpos_matches_reference(ref_networks):
    import torch
    torch.manual_seed(0)
    cfg = dict(coords_channel=2, data_channel=1, features=20, layers=4,
               w0=30, T=[2, 3])
    ref = ref_networks.init_phi({"name": "SIRENPos", **cfg})
    ours = init_phi({"name": "SIRENPos", **cfg})
    params = _load_ref_weights_into_ours(ref, ours.init(jax.random.PRNGKey(0)))
    coords = np.random.default_rng(2).uniform(
        -1, 1, (77, 2)).astype(np.float32)
    with torch.no_grad():
        # the reference encoder mutates its input in place
        # (Networks.py:26-30) — give torch its own copy
        ref_out = ref(torch.from_numpy(coords.copy())).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(params,
                                                     jnp.asarray(coords))),
                               ref_out, atol=2e-5, rtol=1e-4)


def _load_mfn(ref, our_params, gabor: bool):
    filters = []
    for f in ref.filters:
        d = {"w": jnp.asarray(f.linear.weight.detach().numpy().T),
             "b": jnp.asarray(f.linear.bias.detach().numpy())}
        if gabor:
            d["mu"] = jnp.asarray(f.mu.detach().numpy())
            d["gamma"] = jnp.asarray(f.gamma.detach().numpy())
        filters.append(d)
    linear = [{"w": jnp.asarray(l.weight.detach().numpy().T),
               "b": jnp.asarray(l.bias.detach().numpy())}
              for l in ref.linear]
    output = {"w": jnp.asarray(ref.output_linear.weight.detach().numpy().T),
              "b": jnp.asarray(ref.output_linear.bias.detach().numpy())}
    return {"linear": linear, "output": output, "filters": filters}


@pytest.mark.parametrize("name", ["MFNFourier", "MFNGabor"])
def test_mfn_matches_reference(ref_networks, name):
    import torch
    torch.manual_seed(0)
    cfg = dict(coords_channel=3, data_channel=1, features=24, layers=4)
    ref = ref_networks.init_phi({"name": name, **cfg})
    ours = init_phi({"name": name, **cfg})
    params = _load_mfn(ref, ours.init(jax.random.PRNGKey(0)),
                       gabor=name == "MFNGabor")
    coords = np.random.default_rng(3).uniform(
        -1, 1, (88, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(coords)).numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(params,
                                                     jnp.asarray(coords))),
                               ref_out, atol=2e-5, rtol=1e-4)


def test_decoded_volume_matches_reference(ref_networks):
    """Full-grid decode (the decompression path) agrees voxel-for-voxel
    within float tolerance with the reference net on the same weights."""
    import torch
    from brief_pytorch_tpu.core.coords import create_flattened_coords
    from brief_pytorch_tpu.train.decode import reconstruct_flattened
    torch.manual_seed(1)
    cfg = dict(coords_channel=3, data_channel=1, features=20, layers=5,
               w0=20, res=False, output_act=False)
    ref = ref_networks.init_phi({"name": "SIREN", **cfg})
    ours = init_phi({"name": "SIREN", **cfg})
    params = _load_ref_weights_into_ours(ref, ours.init(jax.random.PRNGKey(0)))

    shape = (12, 13, 14)
    coords = np.asarray(create_flattened_coords(shape, "-1,1"))
    with torch.no_grad():
        ref_vol = ref(torch.from_numpy(coords)).numpy().reshape(*shape, 1)
    our_vol = reconstruct_flattened(ours.apply, params, (*shape, 1),
                                    sample_size=1000, coords_mode="-1,1")
    np.testing.assert_allclose(our_vol, ref_vol, atol=2e-5, rtol=1e-4)
