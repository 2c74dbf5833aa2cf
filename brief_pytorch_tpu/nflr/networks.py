"""NFLR network modules as functional init/apply pairs.

Capability parity: reference utils/Networks.py
  Modulator/CropModulator 929-981 (Mehta et al., "Modulated Periodic
  Activations for Generalizable Local Functional Representations"),
  Conv3dStridedownPooling 984-1013, CropConv3dStridedown 1014-1060
  (Balle'18 analysis transform), PlainConv3dChannelShrink (hz) 1097-1128,
  PlainConv3dMeanScale (gy) 1130-1162 (Minnen'18 mean-scale hyperprior),
  Projector 803-856, SIREN.forward_syn 272-290 (modulated synthesis),
  init registries init_gmod/init_hy/init_gy/init_hz 980,1059,1161,1126.

TPU-first: convolutions are lax.conv_general_dilated in NCDHW (maps to XLA
convs that tile onto the MXU); the modulated SIREN forward is a plain jnp
matmul chain usable under jit/vmap/shard_map.  Parameter initialisation
follows torch Conv/Linear defaults (kaiming-uniform a=sqrt(5) == U(+-1/
sqrt(fan_in))) so trained-module interchange stays plausible.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# cos-residual VJP variant: the backward of every modulated-SIREN sine is
# g*cos re-read from the forward (ops/fast_math.fast_sin_cached) — same
# primal polynomial as fast_sin, more accurate gradient, fewer bwd ops
from brief_pytorch_tpu.ops.fast_math import fast_sin_cached as fast_sin
import numpy as np

from brief_pytorch_tpu.models.phi import init_linear, _matmul


# --------------------------------------------------------------------------
# small building blocks
# --------------------------------------------------------------------------
def init_conv3d(key, c_in: int, c_out: int, ksize: Tuple[int, int, int]
                ) -> Dict[str, jnp.ndarray]:
    """torch nn.Conv3d default init: U(+-1/sqrt(fan_in)), fan_in=c_in*prod(k)."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * int(np.prod(ksize))
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (c_out, c_in) + tuple(ksize), jnp.float32,
                           -bound, bound)
    b = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv3d(x: jnp.ndarray, p: Dict, stride=(1, 1, 1), padding=(1, 1, 1)
           ) -> jnp.ndarray:
    """NCDHW conv with symmetric padding."""
    pad = [(int(q), int(q)) for q in padding]
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=tuple(stride), padding=pad,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + p["b"][None, :, None, None, None]


def adaptive_pool3d(x: jnp.ndarray, out_shape: Tuple[int, int, int],
                    mode: str) -> jnp.ndarray:
    """torch AdaptiveAvg/MaxPool3d semantics: window i covers
    [floor(i*in/out), ceil((i+1)*in/out))."""
    n, c, *spatial = x.shape
    for axis, out_n in enumerate(out_shape):
        in_n = x.shape[2 + axis]
        pieces = []
        for i in range(out_n):
            lo = (i * in_n) // out_n
            hi = -(-((i + 1) * in_n) // out_n)
            sl = [slice(None)] * x.ndim
            sl[2 + axis] = slice(lo, hi)
            seg = x[tuple(sl)]
            red = seg.mean(2 + axis, keepdims=True) if mode == "avg" \
                else seg.max(2 + axis, keepdims=True)
            pieces.append(red)
        x = jnp.concatenate(pieces, axis=2 + axis)
    return x


# --------------------------------------------------------------------------
# gmod: latent -> per-layer modulation vectors
# --------------------------------------------------------------------------
class Modulator:
    """ReLU MLP with skip-concat of y at every layer; one output per phi
    hidden layer (reference Networks.py:929-952)."""
    name = "Modulator"

    def __init__(self, y_channel: int, dim_hidden: int, layers: int, **_):
        self.y_channel = y_channel
        self.dim_hidden = dim_hidden
        self.layers = layers

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.layers)
        net = []
        for i in range(self.layers):
            fan_in = self.y_channel if i == 0 else self.dim_hidden + self.y_channel
            net.append(init_linear(keys[i], fan_in, self.dim_hidden, "default"))
        return {"net": net}

    def apply(self, params: Dict, y: jnp.ndarray, compute_dtype=None
              ) -> List[jnp.ndarray]:
        """y: (..., y_channel) -> list of (..., dim_hidden) modulations."""
        mod = y
        mods = []
        for lin in params["net"]:
            mod = jax.nn.relu(_matmul(mod, lin["w"], compute_dtype) + lin["b"])
            mods.append(mod)
            mod = jnp.concatenate([mod, y], axis=-1)
        return mods


class CropModulator(Modulator):
    """Modulator over (n, c, pc_d, pc_h, pc_w) latent grids
    (reference Networks.py:953-979): flattens patch axes, applies the MLP,
    returns mods shaped (n, dim_hidden, pc_d, pc_h, pc_w)."""
    name = "CropModulator"

    def apply(self, params: Dict, y: jnp.ndarray, compute_dtype=None
              ) -> List[jnp.ndarray]:
        n, c, *pc = y.shape
        flat = jnp.moveaxis(y, 1, -1).reshape(-1, c)     # (n*prod(pc), c)
        mods = super().apply(params, flat, compute_dtype)
        out = []
        for m in mods:
            m = m.reshape((n, *pc, self.dim_hidden))
            out.append(jnp.moveaxis(m, -1, 1))
        return out


ALLGMOD = {"Modulator": Modulator, "CropModulator": CropModulator}


def init_gmod(**kwargs):
    """(reference Networks.py:980-981)"""
    return ALLGMOD[kwargs.pop("name")](**kwargs)


# --------------------------------------------------------------------------
# modulated SIREN synthesis
# --------------------------------------------------------------------------
def siren_forward_syn(layers: Sequence[Dict], coords: jnp.ndarray,
                      mods: Sequence[jnp.ndarray], w0: float = 30.0,
                      first_w0: float = 30.0, compute_dtype=None
                      ) -> jnp.ndarray:
    """Modulated SIREN forward for patch grids.

    coords: (n, *pc, pop, c); mods[l]: (n, dim_hidden, *pc).
    Per layer: h = sin(w0 * linear(h)) * sigmoid(mod_l); output layer is
    unmodulated (reference SIREN.forward_syn, Networks.py:272-282).
    """
    h = coords
    for li, (lin, mod) in enumerate(zip(layers[:-1], mods)):
        z = _matmul(h, lin["w"], compute_dtype) + lin["b"]
        h = fast_sin((first_w0 if li == 0 else w0) * z)
        m = jnp.moveaxis(mod, 1, -1)           # (n, *pc, dim_hidden)
        h = h * jax.nn.sigmoid(m)[..., None, :]
        h = h.astype(coords.dtype)
    out = layers[-1]
    return _matmul(h, out["w"], compute_dtype) + out["b"]


def siren_forward_syn_wocrop(layers: Sequence[Dict], coords: jnp.ndarray,
                             mods: Sequence[jnp.ndarray], w0: float = 30.0,
                             first_w0: float = 30.0, compute_dtype=None
                             ) -> jnp.ndarray:
    """Un-cropped variant (reference Networks.py:283-290):
    coords (n, pop, c); mods[l]: (n, dim_hidden)."""
    h = coords
    for li, (lin, mod) in enumerate(zip(layers[:-1], mods)):
        z = _matmul(h, lin["w"], compute_dtype) + lin["b"]
        h = fast_sin((first_w0 if li == 0 else w0) * z)
        h = h * jax.nn.sigmoid(mod)[:, None, :]
    out = layers[-1]
    return _matmul(h, out["w"], compute_dtype) + out["b"]


# --------------------------------------------------------------------------
# hy: data patches -> latent y (analysis transforms)
# --------------------------------------------------------------------------
class CropConv3dStridedown:
    """Stride-2 conv stack collapsing each (ps_d, ps_h, ps_w) patch to one
    y vector (reference Networks.py:1014-1058, Balle'18)."""
    name = "CropConv3dStridedown"

    def __init__(self, ps_d: int, ps_h: int, ps_w: int, data_channel: int,
                 y_channel: int, **_):
        self.n_layers = int(math.log2(min(ps_d, ps_h, ps_w)))
        self.data_channel = data_channel
        self.y_channel = y_channel

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.n_layers + 1)
        convs = []
        for i in range(self.n_layers):
            cin = self.data_channel if i == 0 else self.y_channel
            convs.append(init_conv3d(keys[i], cin, self.y_channel, (3, 3, 3)))
        head = init_conv3d(keys[-1], self.y_channel, self.y_channel, (1, 1, 1))
        return {"convs": convs, "head": head}

    def apply(self, params: Dict, cropped: jnp.ndarray, bs: int = 0
              ) -> jnp.ndarray:
        """cropped: (n, pc_d, pc_h, pc_w, c, ps_d, ps_h, ps_w)
        -> y (n, y_channel, pc_d, pc_h, pc_w)."""
        n, pc_d, pc_h, pc_w, c, ps_d, ps_h, ps_w = cropped.shape
        x = cropped.reshape(-1, c, ps_d, ps_h, ps_w)
        for i, conv in enumerate(params["convs"]):
            x = conv3d(x, conv, stride=(2, 2, 2), padding=(1, 1, 1))
            if i < self.n_layers - 1:
                x = jax.nn.relu(x)
            else:
                x = x.max(axis=(2, 3, 4), keepdims=True)  # AdaptiveMaxPool(1)
                x = conv3d(x, params["head"], stride=(1, 1, 1),
                           padding=(0, 0, 0))
        y = x.reshape(n, pc_d, pc_h, pc_w, self.y_channel)
        return jnp.moveaxis(y, -1, 1)


class Conv3dStridedownPooling:
    """Whole-volume encoder: strided convs + adaptive avg/max pooling to a
    (4,10,10) grid + 1x1 conv + flatten (reference Networks.py:984-1013)."""
    name = "Conv3dStridedownPooling"
    POOL = (4, 10, 10)

    def __init__(self, data_channel: int, y_channel: int,
                 stridedown_layers: int, **_):
        self.data_channel = data_channel
        self.y_channel = y_channel
        self.n_layers = stridedown_layers
        self.dim_hidden = y_channel // int(np.prod(self.POOL))

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.n_layers + 1)
        convs = []
        for i in range(self.n_layers):
            cin = self.data_channel if i == 0 else \
                self.dim_hidden // 2 ** (self.n_layers - i)
            cout = self.dim_hidden // 2 ** (self.n_layers - i - 1)
            convs.append(init_conv3d(keys[i], cin, cout, (5, 5, 5)))
        tail = init_conv3d(keys[-1], self.dim_hidden * 2, self.dim_hidden,
                           (1, 1, 1))
        return {"convs": convs, "tail": tail}

    def apply(self, params: Dict, data: jnp.ndarray, bs: int = 0
              ) -> jnp.ndarray:
        """data: (n, c, d, h, w) -> y (n, y_channel)."""
        x = data
        for conv in params["convs"]:
            x = jax.nn.relu(conv3d(x, conv, stride=(2, 2, 2),
                                   padding=(2, 2, 2)))
        avg = adaptive_pool3d(x, self.POOL, "avg")
        mx = adaptive_pool3d(x, self.POOL, "max")
        y = conv3d(jnp.concatenate([avg, mx], axis=1), params["tail"],
                   stride=(1, 1, 1), padding=(0, 0, 0))
        return y.reshape(y.shape[0], -1)


ALLHY = {"CropConv3dStridedown": CropConv3dStridedown,
         "Conv3dStridedownPooling": Conv3dStridedownPooling}


def init_hy(**kwargs):
    """(reference Networks.py:1059-1060)"""
    name = kwargs.pop("name")
    if name == "Conv3dStridedownPooling":
        kwargs = {k: v for k, v in kwargs.items()
                  if k in ("data_channel", "y_channel", "stridedown_layers")}
    return ALLHY[name](**kwargs)


# --------------------------------------------------------------------------
# hz / gy: hyperprior transforms
# --------------------------------------------------------------------------
class PlainConv3dChannelShrink:
    """y -> z hyper-analysis: stride-1 3x3x3 convs + LeakyReLU
    (reference Networks.py:1097-1126, Minnen'18)."""
    name = "PlainConv3dChannelShrink"

    def __init__(self, y_channel: int, z_channel: int, layers: int, **_):
        self.y_channel, self.z_channel, self.layers = y_channel, z_channel, layers

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.layers)
        convs = []
        for i in range(self.layers):
            cin = self.y_channel if i == 0 else self.z_channel
            convs.append(init_conv3d(keys[i], cin, self.z_channel, (3, 3, 3)))
        return {"convs": convs}

    def apply(self, params: Dict, y: jnp.ndarray) -> jnp.ndarray:
        x = y
        for i, conv in enumerate(params["convs"]):
            x = conv3d(x, conv)
            if i < self.layers - 1:
                x = jax.nn.leaky_relu(x, 0.01)
        return x


class PlainConv3dMeanScale:
    """z -> (scales_hat, means_hat) hyper-synthesis
    (reference Networks.py:1130-1161)."""
    name = "PlainConv3dMeanScale"

    def __init__(self, y_channel: int, z_channel: int, layers: int, **_):
        self.y_channel, self.z_channel, self.layers = y_channel, z_channel, layers

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.layers)
        convs = []
        for i in range(self.layers):
            cin = self.z_channel if i == 0 else self.y_channel
            cout = self.y_channel * 2 if i == self.layers - 1 else self.y_channel
            convs.append(init_conv3d(keys[i], cin, cout, (3, 3, 3)))
        return {"convs": convs}

    def apply(self, params: Dict, z: jnp.ndarray):
        x = z
        for i, conv in enumerate(params["convs"]):
            x = conv3d(x, conv)
            if i < self.layers - 1:
                x = jax.nn.leaky_relu(x, 0.01)
        scales_hat, means_hat = jnp.split(x, 2, axis=1)
        return scales_hat, means_hat


ALLHZ = {"PlainConv3dChannelShrink": PlainConv3dChannelShrink}
ALLGY = {"PlainConv3dMeanScale": PlainConv3dMeanScale}


def init_hz(**kwargs):
    """(reference Networks.py:1126-1128)"""
    kwargs.pop("name")
    return PlainConv3dChannelShrink(**kwargs)


def init_gy(**kwargs):
    """(reference Networks.py:1161-1162)"""
    kwargs.pop("name")
    return PlainConv3dMeanScale(**kwargs)


# --------------------------------------------------------------------------
# Projector: conv3d head mapping phi features -> data channels
# --------------------------------------------------------------------------
class Projector:
    """1x1x1 conv head (reference Networks.py:803-856)."""
    name = "Projector"

    def __init__(self, features: int, data_channel: int, layers: int = 1, **_):
        self.features, self.data_channel, self.layers = (features,
                                                         data_channel, layers)

    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.layers)
        convs = []
        for i in range(self.layers):
            cin = self.features
            cout = self.data_channel if i == self.layers - 1 else self.features
            convs.append(init_conv3d(keys[i], cin, cout, (1, 1, 1)))
        return {"convs": convs}

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        for i, conv in enumerate(params["convs"]):
            x = conv3d(x, conv, padding=(0, 0, 0))
            if i < self.layers - 1:
                x = jax.nn.relu(x)
        return x
