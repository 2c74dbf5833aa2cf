"""models/: sizing solvers + forward parity vs independently-built torch nets.

The parity tests construct small torch modules from the published
architecture spec, copy our JAX params in, and check forward agreement —
this validates weight layout, activation order/frequencies, encodings, and
the raw-binary interchange format end to end.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.models import phi as phis
from brief_pytorch_tpu.models import sizing

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


BASE = dict(coords_channel=3, data_channel=1, layers=5)


def _params_to_torch_linear(linear: nn.Linear, layer):
    linear.double()  # parity checks run in float64
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T.copy()))
        linear.bias.copy_(torch.from_numpy(np.asarray(layer["b"]).copy()))


class TestSizing:
    @pytest.mark.parametrize("name,extra", [
        ("SIREN", dict(res=False)),
        ("SIREN", dict(res=True)),
        ("SIRENFT", dict(res=False, ratio=2)),
        ("SIREN_Pyramid", dict(res=False, features_dis=4)),
        ("SIRENPS", dict(res=False, ratio=1.2)),
        ("SIREN_RELU", dict(res=False)),
        ("SIREN_SIGMOID", dict(res=False)),
        ("SIRENPos", dict(T=[2, 2, 2])),
        ("NeRF", dict(frequencies=10, skip=True)),
        ("NeRF", dict(frequencies=4, skip=False)),
        ("FFN", dict(embsize=64, skip=False, scale=10)),
        ("MFNFourier", dict()),
        ("MFNGabor", dict()),
    ])
    def test_param_count_matches_constructed_model(self, name, extra):
        """calc_param_count == actual number of parameters in the pytree."""
        cfg = {**BASE, **extra, "name": name, "features": 48, "w0": 20}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(0))
        actual = phis.get_param_count(params)
        calc = sizing.ALL_CALC_PHI_PARAM_COUNT[name](**{k: v for k, v in cfg.items()
                                                        if k != "name"})
        assert actual == calc, f"{name}: pytree {actual} != formula {calc}"

    @pytest.mark.parametrize("name,extra", [
        ("SIREN", dict(res=False)),
        ("SIRENFT", dict(res=False, ratio=2)),
        ("SIREN_Pyramid", dict(res=False, features_dis=4)),
        ("NeRF", dict(frequencies=10, skip=True)),
        ("FFN", dict(embsize=64, skip=False)),
        ("MFNFourier", dict()),
        ("MFNGabor", dict()),
    ])
    def test_features_inverts_param_count(self, name, extra):
        """calc_features(calc_param_count(f)) == f for integer-feature nets.

        The pyramid quadratic is approximate below ~2x features_dis*(layers-2)
        in the reference too (Networks.py:438-457), so start at 48 there.
        """
        calc_pc = sizing.ALL_CALC_PHI_PARAM_COUNT[name]
        calc_f = sizing.ALL_CALC_PHI_FEATURES[name]
        widths = (48, 128) if name == "SIREN_Pyramid" else (16, 48, 128)
        for f in widths:
            pc = calc_pc(features=f, **BASE, **extra)
            got = calc_f(param_count=pc, **BASE, **extra)
            assert int(round(got)) == f

    def test_sirenps_float_features_contract(self):
        """SIRENPS returns float features (reference Networks.py:516-552);
        the int()-floored construction lands within the reference's 5%
        error-rate budget (main.py:253-257)."""
        extra = dict(res=False, ratio=1.2)
        pc = sizing.sirenps_param_count(features=40, **BASE, **extra)
        feats = sizing.sirenps_features(param_count=pc, **BASE, **extra)
        assert isinstance(feats, float)
        got_pc = sizing.sirenps_param_count(features=feats, **BASE, **extra)
        assert abs(got_pc - pc) <= pc * 0.05

    def test_degradation_chain(self):
        """Tiny budgets fall back SIREN_Pyramid -> SIRENFT -> SIREN
        (reference main.py:221-234)."""
        # 100 params cannot host a pyramid with features_dis=10 -> SIRENFT
        cfg = {**BASE, "name": "SIREN_Pyramid", "features_dis": 10,
               "res": False, "ratio": 1, "w0": 20}
        f, count, theory = sizing.estimate_module_size(4 * 100.0, cfg, half=False)
        assert cfg["name"] == "SIRENFT"  # chain mutates cfg like the reference
        assert count > 0 and theory == count * 4
        # 10 params cannot even host SIRENFT (min 12 at ratio=1) -> SIREN
        cfg3 = {**BASE, "name": "SIREN_Pyramid", "features_dis": 10,
                "res": False, "ratio": 1, "w0": 20}
        sizing.estimate_module_size(4 * 10.0, cfg3, half=False)
        assert cfg3["name"] == "SIREN"
        # a large budget keeps the pyramid
        cfg2 = {**BASE, "name": "SIREN_Pyramid", "features_dis": 10,
                "res": False, "ratio": 1, "w0": 20}
        f2, count2, _ = sizing.estimate_module_size(4 * 50000.0, cfg2, half=False)
        assert cfg2["name"] == "SIREN_Pyramid"
        assert abs(count2 - 50000) / 50000 < 0.05

    def test_estimate_module_size_brain_default(self):
        """SingleTask default: 64^3 uint16 (524288+ B file) at ratio 80 with
        SIREN l=5 -> the sized net must hit the byte budget within 5%."""
        phi_cfg = {"name": "SIREN", **BASE, "w0": 20, "res": False,
                   "output_act": False}
        ideal = 524288 / 80
        f, count, theory = sizing.estimate_module_size(ideal, phi_cfg, half=False)
        assert abs(theory - ideal) / ideal < 0.05
        model = phis.init_phi({**phi_cfg, "features": f})
        params = model.init(jax.random.PRNGKey(0))
        assert phis.get_param_count(params) == count

    def test_half_accounting(self):
        phi_cfg = {"name": "SIREN", **BASE, "w0": 20, "res": False}
        f4, c4, t4 = sizing.estimate_module_size(8192.0, dict(phi_cfg), half=False)
        f2, c2, t2 = sizing.estimate_module_size(8192.0, dict(phi_cfg), half=True)
        assert t4 == c4 * 4 and t2 == c2 * 2


def _torch_sine_chain(dims, w0_list):
    layers = []
    for (fi, fo) in dims:
        layers.append(nn.Linear(fi, fo))
    return layers


class TestForwardParityTorch:
    """Copy JAX params into torch modules built from the published spec and
    compare forwards.  Runs in float64 on both sides: float32 sine chains
    amplify ulp noise ~w0 x per layer, which would mask layout bugs; in
    float64 the tolerance can be tight."""

    def _check(self, model, params, torch_forward, n=257, c=3, atol=1e-9):
        rng = np.random.default_rng(0)
        x64 = rng.uniform(-1, 1, (n, c))
        with jax.enable_x64():
            params64 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
            y_jax = np.asarray(model.apply(params64, jnp.asarray(x64)))
        with torch.no_grad():
            y_t = torch_forward(torch.from_numpy(x64).double()).numpy()
        np.testing.assert_allclose(y_jax, y_t, atol=atol, rtol=1e-9)

    def test_siren(self):
        cfg = {"name": "SIREN", **BASE, "features": 32, "w0": 20, "res": False}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(1))
        L = params["layers"]
        lins = [nn.Linear(3, 32), nn.Linear(32, 32), nn.Linear(32, 32),
                nn.Linear(32, 32), nn.Linear(32, 1)]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            h = torch.sin(20 * lins[0](x))
            for lin in lins[1:4]:
                h = torch.sin(30 * lin(h))
            return lins[4](h)
        self._check(model, params, fwd)

    def test_siren_output_act(self):
        cfg = {"name": "SIREN", **BASE, "features": 16, "w0": 30, "res": False,
               "output_act": True}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(2))
        L = params["layers"]
        lins = [nn.Linear(3, 16)] + [nn.Linear(16, 16)] * 0
        lins = [nn.Linear(3, 16), nn.Linear(16, 16), nn.Linear(16, 16),
                nn.Linear(16, 16), nn.Linear(16, 1)]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            h = torch.sin(30 * lins[0](x))
            for lin in lins[1:4]:
                h = torch.sin(30 * lin(h))
            return torch.sin(30 * lins[4](h))
        self._check(model, params, fwd)

    def test_siren_res(self):
        cfg = {"name": "SIREN", **BASE, "layers": 4, "features": 16, "w0": 20,
               "res": True}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(3))
        L = params["layers"]
        lins = [nn.Linear(3, 16), nn.Linear(16, 16), nn.Linear(16, 16),
                nn.Linear(16, 16), nn.Linear(16, 16), nn.Linear(16, 1)]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            h = torch.sin(20 * lins[0](x))
            for i in (1, 3):  # two HalfResidual blocks (layers=4 -> 2 blocks)
                t = torch.sin(30 * lins[i](h))
                t = torch.sin(30 * lins[i + 1](t))
                h = 0.5 * (t + h)
            return lins[5](h)
        self._check(model, params, fwd)

    def test_sirenft(self):
        cfg = {"name": "SIRENFT", **BASE, "features": 16, "w0": 25, "res": False,
               "ratio": 2}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(4))
        L = params["layers"]
        lins = [nn.Linear(3, 32), nn.Linear(32, 16), nn.Linear(16, 16),
                nn.Linear(16, 16), nn.Linear(16, 1)]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            h = torch.sin(25 * lins[0](x))
            h = torch.sin(25 * lins[1](h))  # first TWO layers use Sine(w0)
            for lin in lins[2:4]:
                h = torch.sin(30 * lin(h))
            return lins[4](h)
        self._check(model, params, fwd)

    def test_siren_pyramid(self):
        cfg = {"name": "SIREN_Pyramid", **BASE, "features": 32, "w0": 20,
               "res": False, "features_dis": 4}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(5))
        L = params["layers"]
        dims = [(3, 32), (32, 28), (28, 24), (24, 20), (20, 1)]
        lins = [nn.Linear(a, b) for a, b in dims]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            h = torch.sin(20 * lins[0](x))
            for lin in lins[1:4]:
                h = torch.sin(30 * lin(h))
            return lins[4](h)
        self._check(model, params, fwd)

    def test_nerf_skip(self):
        cfg = {"name": "NeRF", **BASE, "features": 24, "frequencies": 4,
               "skip": True}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(6))
        L = params["layers"]
        d = 3 + 2 * 3 * 4
        dims = [(d, 24), (24, 24), (d + 24, 24), (24, 24), (24, 1)]
        lins = [nn.Linear(a, b) for a, b in dims]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def posenc(x):
            parts = [x]
            for i in range(4):
                for j in range(3):
                    c = (2 ** i) * math.pi * x[:, j:j + 1]
                    parts += [torch.sin(c), torch.cos(c)]
            return torch.cat(parts, dim=-1)

        def fwd(x):
            e = posenc(x)
            h = torch.relu(lins[0](e))
            h = torch.relu(lins[1](h))
            h = torch.relu(lins[2](torch.cat([e, h], dim=-1)))
            h = torch.relu(lins[3](h))
            return lins[4](h)
        # sin/cos of large encoded args differ ~1e-4 between XLA and torch
        self._check(model, params, fwd)

    def test_ffn(self):
        cfg = {"name": "FFN", **BASE, "features": 24, "embsize": 16,
               "scale": 10, "skip": False}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(7))
        L = params["layers"]
        bvals = torch.from_numpy(np.asarray(params["encoder"]["bvals"]).copy()).double()
        dims = [(32, 24), (24, 24), (24, 24), (24, 24), (24, 1)]
        lins = [nn.Linear(a, b) for a, b in dims]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            p = (2 * math.pi * x) @ bvals.T
            h = torch.cat([torch.sin(p), torch.cos(p)], dim=-1)
            for lin in lins[:-1]:
                h = torch.relu(lin(h))
            return lins[-1](h)
        self._check(model, params, fwd)

    def test_ffn_bvals_match_reference_seed(self):
        """bvals must equal torch.manual_seed(0) normal draw * scale
        (reference Networks.py:141-148)."""
        cfg = {"name": "FFN", **BASE, "features": 8, "embsize": 8, "scale": 10}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(0))
        torch.manual_seed(0)
        ref = (torch.normal(0, 1, size=(8, 3)) * 10).numpy()
        got = np.asarray(params["encoder"]["bvals"])
        # same generator stream (manual_seed(0) == Generator().manual_seed(0))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_sirenpos(self):
        cfg = {"name": "SIRENPos", **BASE, "features": 16, "w0": 20,
               "T": [2, 3, 4]}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(8))
        L = params["layers"]
        lins = [nn.Linear(3, 16), nn.Linear(16, 16), nn.Linear(16, 16),
                nn.Linear(16, 16), nn.Linear(16, 1)]
        for lin, layer in zip(lins, L):
            _params_to_torch_linear(lin, layer)

        def fwd(x):
            T = torch.tensor([2.0, 3.0, 4.0]).double()
            e = torch.sin(2 * math.pi / T * x)
            h = torch.sin(20 * lins[0](e))
            for lin in lins[1:4]:
                h = torch.sin(30 * lin(h))
            return lins[4](h)
        self._check(model, params, fwd)

    def test_mfnfourier(self):
        cfg = {"name": "MFNFourier", **BASE, "features": 16,
               "input_scale": 64.0, "weight_scale": 1.0}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(9))

        def fwd(x):
            filts = []
            for f in params["filters"]:
                w = torch.from_numpy(np.asarray(f["w"]).copy()).double()
                b = torch.from_numpy(np.asarray(f["b"]).copy()).double()
                filts.append(torch.sin(x @ w + b))
            h = filts[0]
            for i in range(1, len(filts)):
                lin = params["linear"][i - 1]
                w = torch.from_numpy(np.asarray(lin["w"]).copy()).double()
                b = torch.from_numpy(np.asarray(lin["b"]).copy()).double()
                h = filts[i] * (h @ w + b)
            ow = torch.from_numpy(np.asarray(params["output"]["w"]).copy()).double()
            ob = torch.from_numpy(np.asarray(params["output"]["b"]).copy()).double()
            return h @ ow + ob
        self._check(model, params, fwd)

    def test_mfngabor_runs(self):
        cfg = {"name": "MFNGabor", **BASE, "features": 16}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(10))
        out = model.apply(params, jnp.zeros((11, 3)))
        assert out.shape == (11, 1) and np.isfinite(np.asarray(out)).all()


class TestInitDistributions:
    def test_siren_init_bounds(self):
        cfg = {"name": "SIREN", **BASE, "features": 128, "w0": 20, "res": False}
        params = phis.init_phi(cfg).init(jax.random.PRNGKey(0))
        L = params["layers"]
        # first layer: U(-1/3, 1/3)
        w0 = np.asarray(L[0]["w"])
        assert np.abs(w0).max() <= 1 / 3 + 1e-6
        assert np.abs(w0).max() > 1 / 3 * 0.9
        # hidden: U(+-sqrt(6/128)/30)
        bound = math.sqrt(6 / 128) / 30
        w1 = np.asarray(L[1]["w"])
        assert np.abs(w1).max() <= bound + 1e-9
        assert np.abs(w1).max() > bound * 0.95
        # bias: torch default U(+-1/sqrt(fan_in))
        b1 = np.asarray(L[1]["b"])
        assert np.abs(b1).max() <= 1 / math.sqrt(128) + 1e-9


class TestModelSaveInterchange:
    def test_raw_binary_roundtrip(self, tmp_path):
        from brief_pytorch_tpu.io.modelsave import load_model, save_model
        cfg = {"name": "SIREN", **BASE, "features": 20, "w0": 20, "res": False}
        model = phis.init_phi(cfg)
        params = model.init(jax.random.PRNGKey(0))
        mdir = str(tmp_path / "module")
        save_model([{k: np.asarray(v) for k, v in l.items()}
                    for l in params["layers"]], mdir)
        back = load_model(mdir)
        for a, b in zip(params["layers"], back):
            np.testing.assert_array_equal(np.asarray(a["w"]), b["w"])
            np.testing.assert_array_equal(np.asarray(a["b"]), b["b"])

    def test_file_naming_matches_reference_contract(self, tmp_path):
        """Files must be named weight-{l}-{out}-{in} / bias-{l}-{len} with
        float32 row-major (out,in) payload (reference ModelSave.py:42-48)."""
        import os
        import struct
        from brief_pytorch_tpu.io.modelsave import save_model
        w = np.arange(6, dtype=np.float32).reshape(2, 3)  # (in=2, out=3)
        b = np.array([7, 8, 9], np.float32)
        mdir = str(tmp_path / "m")
        save_model([{"w": w, "b": b}], mdir)
        names = sorted(os.listdir(mdir))
        assert names == ["bias-0-3", "weight-0-3-2"]
        raw = open(os.path.join(mdir, "weight-0-3-2"), "rb").read()
        vals = struct.unpack("<" + "f" * 6, raw)
        # torch layout: weight[out, in] row-major == transpose of ours
        np.testing.assert_array_equal(np.asarray(vals).reshape(3, 2), w.T)
