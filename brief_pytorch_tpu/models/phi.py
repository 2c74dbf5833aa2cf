"""The φ-network zoo: coordinate->value MLPs as functional init/apply pairs.

TPU-first design notes:
  * Parameters are pytrees of jnp arrays with weights stored **(in, out)**
    so the forward pass is `y = x @ W + b` — no transposes feeding the MXU,
    and a leading block axis can be vmapped for many-networks-per-chip
    training.
  * `apply` is pure and shape-polymorphic over leading batch axes; it works
    under jit/vmap/shard_map and accepts an optional compute dtype
    (bfloat16 compute with float32 accumulation via
    `preferred_element_type`).
  * Initialisation reproduces the reference's *distributions* (torch Linear
    default U(-1/sqrt(fan_in), 1/sqrt(fan_in)); SIREN first-layer
    U(-1/fan_in, 1/fan_in); SIREN hidden U(-sqrt(6/fan_in)/30,
    sqrt(6/fan_in)/30)) with the JAX PRNG.

Capability parity: reference utils/Networks.py
  SIREN 235-314, SIRENFT 316-369, SIREN_Pyramid 370-457, SIRENPS 458-552,
  SIREN_RELU 553-599, SIREN_SIGMOID 600-646, SIRENPos 32-62 (+PosEncodingSIREN
  19-30), NeRF 84-136 (+PosEncodingNeRF 64-83), FFN 156-207
  (+FourierFeatureEmbedding 138-155), MFNFourier 691-727 (+FourierLayer
  678-690), MFNGabor 750-794 (+GaborLayer 728-749), Sine 227-234,
  sine_init/first_layer_sine_init 215-226, HalfResidual 209-214,
  registries 795-802.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# initialisers
# --------------------------------------------------------------------------
def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, fan_in: int, fan_out: int, w_init: str, dtype=jnp.float32,
                w_scale: float = 1.0) -> Dict[str, jnp.ndarray]:
    """One linear layer, weight stored (in, out).

    w_init: 'default' (torch nn.Linear: U(+-1/sqrt(fan_in)) for W and b),
            'siren'  (U(+-sqrt(6/fan_in)/30), ref Networks.py:215-220),
            'siren_first' (U(+-1/fan_in), ref Networks.py:221-226).
    Bias always uses the torch default (sine_init touches weights only).
    """
    kw, kb = jax.random.split(key)
    if w_init == "default":
        w_bound = 1.0 / math.sqrt(fan_in)
    elif w_init == "siren":
        w_bound = math.sqrt(6.0 / fan_in) / 30.0
    elif w_init == "siren_first":
        w_bound = 1.0 / fan_in
    else:
        raise ValueError(w_init)
    w = _uniform(kw, (fan_in, fan_out), w_bound, dtype) * w_scale
    b = _uniform(kb, (fan_out,), 1.0 / math.sqrt(fan_in), dtype)
    return {"w": w, "b": b}


def _act(name: str, w0: float, z: jnp.ndarray) -> jnp.ndarray:
    if name == "sine":
        # fast_sin_cached: VPU-cheap sine (f32 error <= ~2e-6 in the SIREN
        # argument range; ops/fast_math.py) — the training step is ~87%
        # transcendental-bound without it — whose VJP re-reads a cos
        # residual saved by the forward (shared range reduction) instead
        # of differentiating the polynomial: measured 1.09x the XLA
        # contract step and a MORE accurate gradient (true cos to 2e-7 vs
        # ~3e-5 for the poly derivative).  Falls back to jnp.sin for
        # float64 (x64 parity oracle) and BRIEF_TPU_EXACT_SINE=1.
        from brief_pytorch_tpu.ops.fast_math import fast_sin_cached
        return fast_sin_cached(w0 * z)
    if name == "relu":
        return jax.nn.relu(z)
    if name == "sigmoid":
        return jax.nn.sigmoid(z)
    if name == "none":
        return z
    raise ValueError(name)


def _matmul(x, w, compute_dtype):
    if compute_dtype is not None:
        # low-precision inputs, float32 MXU accumulation
        return jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    # keep the promoted input dtype (float64 under x64 for parity tests)
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    return jnp.dot(x, w, preferred_element_type=out_dtype)


# --------------------------------------------------------------------------
# chain spec — shared machinery for every non-MFN network
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class Entry:
    """One logical block of the chain.

    kind 'plain': one linear + activation.
    kind 'res'  : HalfResidual(Linear,Sine,Linear,Sine) consuming two linears
                  (reference Networks.py:209-214, 251-257).
    """
    kind: str
    fan_in: int
    fan_out: int
    act: str
    w0: float
    w_init: str


@dataclass(frozen=True)
class ChainSpec:
    entries: Tuple[Entry, ...]
    skip_entry: int = -1          # entry index receiving concat([encoding, h])
    encoder: str = "none"         # 'none' | 'sirenpos' | 'nerf' | 'ffn'
    encoder_cfg: Tuple = ()

    @property
    def num_linears(self) -> int:
        return sum(2 if e.kind == "res" else 1 for e in self.entries)


def chain_init(key, spec: ChainSpec, dtype=jnp.float32) -> List[Dict]:
    layers = []
    keys = jax.random.split(key, spec.num_linears)
    ki = 0
    for e in spec.entries:
        n = 2 if e.kind == "res" else 1
        for _ in range(n):
            layers.append(init_linear(keys[ki], e.fan_in if _ == 0 else e.fan_out,
                                      e.fan_out, e.w_init, dtype))
            ki += 1
    return layers


def chain_apply(layers: Sequence[Dict], coords: jnp.ndarray, spec: ChainSpec,
                encoder_params: Optional[Dict] = None,
                compute_dtype=None) -> jnp.ndarray:
    x = _encode(coords, spec, encoder_params, compute_dtype)
    h = x
    li = 0
    for ei, e in enumerate(spec.entries):
        if ei == spec.skip_entry:
            h = jnp.concatenate([x, h], axis=-1)
        if e.kind == "plain":
            z = _matmul(h, layers[li]["w"], compute_dtype) + layers[li]["b"]
            h = _act(e.act, e.w0, z)
            li += 1
        else:  # res: 0.5 * (sine(lin(sine(lin(h)))) + h)
            z = _matmul(h, layers[li]["w"], compute_dtype) + layers[li]["b"]
            t = _act("sine", e.w0, z)
            z = _matmul(t, layers[li + 1]["w"], compute_dtype) + layers[li + 1]["b"]
            t = _act("sine", e.w0, z)
            h = 0.5 * (t + h)
            li += 2
    return h


def _encode(coords, spec: ChainSpec, encoder_params, compute_dtype):
    from brief_pytorch_tpu.ops.fast_math import (fast_sin, fast_sincos)
    if spec.encoder == "none":
        return coords
    if spec.encoder == "sirenpos":
        # per-axis sin(2*pi/T_i * x_i), reference Networks.py:19-30
        T = jnp.asarray(spec.encoder_cfg, coords.dtype)
        return fast_sin((2.0 * jnp.pi / T) * coords)
    if spec.encoder == "nerf":
        # [x, (sin(2^i pi x_j), cos(2^i pi x_j)) for i in freqs for j in chans]
        # — exact column order of reference Networks.py:72-83.
        (frequencies,) = spec.encoder_cfg
        parts = [coords]
        for i in range(frequencies):
            for j in range(coords.shape[-1]):
                c = (2.0 ** i) * jnp.pi * coords[..., j:j + 1]
                # sin and cos of the SAME argument: one shared reduction
                s, co = fast_sincos(c)
                parts.append(s)
                parts.append(co)
        return jnp.concatenate(parts, axis=-1)
    if spec.encoder == "ffn":
        # [sin(2 pi x B^T), cos(2 pi x B^T)], reference Networks.py:150-155.
        bvals = encoder_params["bvals"]  # (embsize, coords_channel)
        proj = _matmul(2.0 * jnp.pi * coords, bvals.T, compute_dtype)
        s, co = fast_sincos(proj)        # one shared reduction for both
        return jnp.concatenate([s, co], axis=-1)
    raise ValueError(spec.encoder)


# --------------------------------------------------------------------------
# network families
# --------------------------------------------------------------------------
class PhiModel:
    """A φ network: immutable architecture + functional init/apply."""

    name: str = "base"
    serializable_chain: bool = False  # raw per-layer binary format eligible

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = dict(cfg)

    def init(self, key) -> Dict:
        raise NotImplementedError

    def apply(self, params: Dict, coords: jnp.ndarray, compute_dtype=None
              ) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def param_count(params) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


class _ChainModel(PhiModel):
    """Common base for all chain (Sequential) networks."""
    serializable_chain = True

    def __init__(self, cfg):
        super().__init__(cfg)
        self.spec = self._build_spec(self.cfg)

    @staticmethod
    def _build_spec(cfg) -> ChainSpec:
        raise NotImplementedError

    def init(self, key):
        return {"layers": chain_init(key, self.spec)}

    def apply(self, params, coords, compute_dtype=None):
        return chain_apply(params["layers"], coords, self.spec,
                           params.get("encoder"), compute_dtype)


def _sine_chain(dims: List[Tuple[int, int]], first_w0: float, n_first: int = 1,
                res: bool = False, output_act: bool = False,
                first_init: str = "siren_first") -> Tuple[Entry, ...]:
    """Build entries for a SIREN-style chain.

    dims: (in, out) per linear, output layer last.  The first n_first layers
    use Sine(first_w0); hidden layers use Sine(30) (reference Sine() default,
    Networks.py:228); output layer has no act unless output_act (then
    Sine(30)).  sine_init applies to *all* linears then the first is
    re-initialised (reference Networks.py:264-266).
    """
    entries = []
    n = len(dims)
    for i, (fi, fo) in enumerate(dims):
        is_out = i == n - 1
        if is_out:
            act, w0 = ("sine", 30.0) if output_act else ("none", 1.0)
        elif i < n_first:
            act, w0 = "sine", float(first_w0)
        else:
            act, w0 = "sine", 30.0
        kind = "res" if (res and not is_out and i >= n_first) else "plain"
        w_init = first_init if i == 0 else "siren"
        entries.append(Entry(kind, fi, fo, act, w0, w_init))
    return tuple(entries)


class SIREN(_ChainModel):
    """Sinusoidal MLP (Sitzmann et al. 2020).  Reference Networks.py:235-314."""
    name = "SIREN"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        dims = [(c, f)] + [(f, f)] * (l - 2) + [(f, o)]
        return ChainSpec(_sine_chain(dims, cfg.get("w0", 30),
                                     res=cfg.get("res", False),
                                     output_act=cfg.get("output_act", False)))


class SIRENFT(_ChainModel):
    """SIREN with a wider first layer (ratio).  Reference Networks.py:316-369.
    First *two* layers use Sine(w0)."""
    name = "SIRENFT"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        ratio = cfg.get("ratio", 1)
        ff = int(cfg["features"] * ratio)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        dims = [(c, ff), (ff, f)] + [(f, f)] * (l - 3) + [(f, o)]
        return ChainSpec(_sine_chain(dims, cfg.get("w0", 30), n_first=2,
                                     res=cfg.get("res", False),
                                     output_act=cfg.get("output_act", False)))


class SIREN_Pyramid(_ChainModel):
    """SIREN with linearly shrinking widths.  Reference Networks.py:370-457."""
    name = "SIREN_Pyramid"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        d = cfg.get("features_dis", 10)
        dims = [(c, f)]
        for i in range(l - 2):
            dims.append((f - i * d, f - (i + 1) * d))
        dims.append((f - (l - 2) * d, o))
        return ChainSpec(_sine_chain(dims, cfg.get("w0", 30),
                                     res=cfg.get("res", False),
                                     output_act=cfg.get("output_act", False)))


class SIRENPS(_ChainModel):
    """SIREN with geometric widths (ratio^k).  Reference Networks.py:458-552."""
    name = "SIRENPS"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = cfg["features"]
        l = cfg.get("layers", 5)
        r = cfg.get("ratio", 1)
        dims = [(c, int(f * r ** (l - 2)))]
        for i in range(l - 2):
            dims.append((int(f * r ** (l - 2 - i)), int(f * r ** (l - 2 - i - 1))))
        dims.append((int(f), o))
        return ChainSpec(_sine_chain(dims, cfg.get("w0", 30),
                                     res=cfg.get("res", False),
                                     output_act=cfg.get("output_act", False)))


class SIREN_RELU(_ChainModel):
    """SIREN topology with ReLU acts, torch-default init.
    Reference Networks.py:553-599."""
    name = "SIREN_RELU"

    @staticmethod
    def _build_spec(cfg):
        return _plain_chain_spec(cfg, "relu")


class SIREN_SIGMOID(_ChainModel):
    """SIREN topology with Sigmoid acts.  Reference Networks.py:600-646."""
    name = "SIREN_SIGMOID"

    @staticmethod
    def _build_spec(cfg):
        return _plain_chain_spec(cfg, "sigmoid")


def _plain_chain_spec(cfg, act):
    c = cfg.get("coords_channel", 3)
    o = cfg.get("data_channel", 1)
    f = int(cfg["features"])
    l = cfg.get("layers", 5)
    out_act = act if cfg.get("output_act", False) else "none"
    dims = [(c, f)] + [(f, f)] * (l - 2) + [(f, o)]
    entries = []
    for i, (fi, fo) in enumerate(dims):
        a = out_act if i == len(dims) - 1 else act
        entries.append(Entry("plain", fi, fo, a, 1.0, "default"))
    return ChainSpec(tuple(entries))


class SIRENPos(_ChainModel):
    """SIREN with per-axis sin(2*pi/T) input warp.  Reference Networks.py:32-62."""
    name = "SIRENPos"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        T = tuple(cfg.get("T", [2, 2]))
        dims = [(c, f)] + [(f, f)] * (l - 2) + [(f, o)]
        return ChainSpec(_sine_chain(dims, cfg.get("w0", 30)),
                         encoder="sirenpos", encoder_cfg=T)


class NeRF(_ChainModel):
    """Positional-encoding ReLU MLP with skip (Mildenhall et al. 2020).
    Reference Networks.py:84-136."""
    name = "NeRF"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        freq = cfg.get("frequencies", 10)
        skip = cfg.get("skip", True)
        d = c + 2 * c * freq
        skip_entry = (l - 1) // 2 if skip else -1
        entries = [Entry("plain", d, f, "relu", 1.0, "default")]
        for i in range(l - 2):
            fi = d + f if skip_entry == i + 1 else f
            entries.append(Entry("plain", fi, f, "relu", 1.0, "default"))
        if skip_entry == l - 1:
            entries.append(Entry("plain", d + f, o, "sigmoid", 1.0, "default"))
        else:
            entries.append(Entry("plain", f, o, "none", 1.0, "default"))
        return ChainSpec(tuple(entries), skip_entry=skip_entry,
                         encoder="nerf", encoder_cfg=(freq,))


class FFN(_ChainModel):
    """Fourier-feature network (Tancik et al. 2020).
    Reference Networks.py:138-207.  bvals are frozen N(0,1)*scale drawn with
    torch seed 0 when torch is importable (bit-exact interchange with the
    reference, Networks.py:141-148), else with the JAX PRNG."""
    name = "FFN"

    @staticmethod
    def _build_spec(cfg):
        c = cfg.get("coords_channel", 3)
        o = cfg.get("data_channel", 1)
        f = int(cfg["features"])
        l = cfg.get("layers", 5)
        emb = cfg.get("embsize", 256)
        skip = cfg.get("skip", False)
        d = 2 * emb
        skip_entry = (l - 1) // 2 if skip else -1
        entries = [Entry("plain", d, f, "relu", 1.0, "default")]
        for i in range(l - 2):
            fi = d + f if skip_entry == i + 1 else f
            entries.append(Entry("plain", fi, f, "relu", 1.0, "default"))
        if skip_entry == l - 1:
            entries.append(Entry("plain", d + f, o, "sigmoid", 1.0, "default"))
        else:
            entries.append(Entry("plain", f, o, "none", 1.0, "default"))
        return ChainSpec(tuple(entries), skip_entry=skip_entry, encoder="ffn")

    def init(self, key):
        emb = self.cfg.get("embsize", 256)
        c = self.cfg.get("coords_channel", 3)
        scale = self.cfg.get("scale", 10)
        bvals = _ffn_bvals(emb, c, scale, key)
        return {"layers": chain_init(key, self.spec),
                "encoder": {"bvals": bvals}}

    def apply(self, params, coords, compute_dtype=None):
        enc = {"bvals": jax.lax.stop_gradient(params["encoder"]["bvals"])}
        return chain_apply(params["layers"], coords, self.spec, enc, compute_dtype)


def _ffn_bvals(embsize, coords_channel, scale, key):
    try:  # bit-exact with the reference's torch.manual_seed(0) draw
        import torch
        g = torch.Generator().manual_seed(0)
        b = torch.normal(0, 1, size=(embsize, coords_channel), generator=g) * scale
        return jnp.asarray(b.numpy())
    except Exception:
        return jax.random.normal(key, (embsize, coords_channel)) * scale


class _MFN(PhiModel):
    """Multiplicative filter network base (Fathony et al. 2021).
    Reference Networks.py:648-794."""
    serializable_chain = False

    def __init__(self, cfg):
        super().__init__(cfg)
        self.c = cfg.get("coords_channel", 3)
        self.o = cfg.get("data_channel", 1)
        self.f = int(cfg["features"])
        self.l = cfg.get("layers", 5)
        self.input_scale = cfg.get("input_scale", 256.0)
        self.weight_scale = cfg.get("weight_scale", 1.0)
        self.output_act = cfg.get("output_act", False)

    def _init_common(self, key):
        n_lin = self.l - 2
        keys = jax.random.split(key, n_lin + 1)
        linear = []
        ws = self.weight_scale
        for i in range(n_lin):
            kw, kb = jax.random.split(keys[i])
            bound = math.sqrt(ws / self.f)
            w = _uniform(kw, (self.f, self.f), bound)
            b = _uniform(kb, (self.f,), 1.0 / math.sqrt(self.f))
            linear.append({"w": w, "b": b})
        out = init_linear(keys[-1], self.f, self.o, "default")
        return linear, out

    def _apply_common(self, params, filters_out, compute_dtype=None):
        h = filters_out[0]
        for i in range(1, len(filters_out)):
            lin = params["linear"][i - 1]
            h = filters_out[i] * (_matmul(h, lin["w"], compute_dtype)
                                  + lin["b"])
        out = params["output"]
        y = _matmul(h, out["w"], compute_dtype) + out["b"]
        return jnp.sin(y) if self.output_act else y


class MFNFourier(_MFN):
    name = "MFNFourier"

    def init(self, key):
        k1, k2 = jax.random.split(key)
        linear, out = self._init_common(k1)
        fscale = self.input_scale / math.sqrt(self.l - 1)
        fkeys = jax.random.split(k2, self.l - 1)
        filters = []
        for fk in fkeys:
            kw, kb = jax.random.split(fk)
            # torch-default weight then *= fscale (ref Networks.py:682-687)
            w = _uniform(kw, (self.c, self.f), 1.0 / math.sqrt(self.c)) * fscale
            b = _uniform(kb, (self.f,), math.pi)
            filters.append({"w": w, "b": b})
        return {"linear": linear, "output": out, "filters": filters}

    def apply(self, params, coords, compute_dtype=None):
        # exact jnp.sin kept here (NOT fast_sin): MFN filter arguments scale
        # with input_scale (reference default 256), which can exceed the
        # fast path's validated |x| <~ 2e3 reduction range
        filt = [jnp.sin(_matmul(coords, f["w"], compute_dtype) + f["b"])
                for f in params["filters"]]
        return self._apply_common(params, filt, compute_dtype)


class MFNGabor(_MFN):
    name = "MFNGabor"

    def init(self, key):
        alpha = self.cfg.get("alpha", 6.0) / (self.l - 1)
        beta = self.cfg.get("beta", 1.0)
        fscale = self.input_scale / math.sqrt(self.l - 1)
        k1, k2 = jax.random.split(key)
        linear, out = self._init_common(k1)
        fkeys = jax.random.split(k2, self.l - 1)
        filters = []
        for fk in fkeys:
            kw, kb, km, kg = jax.random.split(fk, 4)
            gamma = jax.random.gamma(kg, alpha, (self.f,)) / beta
            w = (_uniform(kw, (self.c, self.f), 1.0 / math.sqrt(self.c))
                 * fscale * jnp.sqrt(gamma)[None, :])
            b = _uniform(kb, (self.f,), math.pi)
            mu = jax.random.uniform(km, (self.f, self.c), minval=-1.0, maxval=1.0)
            filters.append({"w": w, "b": b, "mu": mu, "gamma": gamma})
        return {"linear": linear, "output": out, "filters": filters}

    def apply(self, params, coords, compute_dtype=None):
        filt = []
        for f in params["filters"]:
            # D = ||x||^2 + ||mu||^2 - 2 x mu^T  (ref Networks.py:743-749)
            D = (jnp.sum(coords ** 2, -1, keepdims=True)
                 + jnp.sum(f["mu"] ** 2, -1)[None, :]
                 - 2.0 * _matmul(coords, f["mu"].T, compute_dtype))
            z = _matmul(coords, f["w"], compute_dtype) + f["b"]
            filt.append(jnp.sin(z) * jnp.exp(-0.5 * D * f["gamma"]))
        return self._apply_common(params, filt, compute_dtype)


# --------------------------------------------------------------------------
# registry (mirrors reference ALLPHI, Networks.py:795)
# --------------------------------------------------------------------------
ALLPHI = {
    "SIREN": SIREN,
    "SIRENFT": SIRENFT,
    "SIREN_Pyramid": SIREN_Pyramid,
    "SIRENPS": SIRENPS,
    "SIREN_RELU": SIREN_RELU,
    "SIREN_SIGMOID": SIREN_SIGMOID,
    "SIRENPos": SIRENPos,
    "NeRF": NeRF,
    "FFN": FFN,
    "MFNFourier": MFNFourier,
    "MFNGabor": MFNGabor,
}


def init_phi(cfg: Dict[str, Any]) -> PhiModel:
    """Factory mirroring reference init_phi (Networks.py:800-802)."""
    cfg = dict(cfg)
    name = cfg.pop("name")
    return ALLPHI[name]({**cfg, "name": name})


def get_param_count(params) -> int:
    return PhiModel.param_count(params)
