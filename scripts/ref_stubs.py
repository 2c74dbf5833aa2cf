"""Functional import stubs that let the reference's ACTUAL main.py run.

The read-only reference mount (/root/reference) depends on packages not in
this image: omegaconf, tifffile, py7zr, compressai, gurobipy, pynvml,
prettytable.  test_reference_numerics.py stubs them at import level only;
the end-to-end head-to-head (scripts/ref_e2e.py, tests/test_ref_e2e_interop
.py) needs *working* omegaconf + tifffile because the reference uses them
on its hot path (main.py:666 OmegaConf.load, tool.py:76 tifffile.imread).

- omegaconf  -> backed by brief_pytorch_tpu.core.config (Config is a dict
  subclass with attribute access, so ``**opt.Log`` and isinstance checks in
  utils/misc.py:33-47 both work).
- tifffile   -> cv2 imreadmulti/imwritemulti (same codec path our
  io/image.py uses; verified lossless for uint8/uint16).
- py7zr, compressai, gurobipy, pynvml, prettytable -> import-level stubs
  (not touched by a SingleTask NFGR run: 7z only for the NFLR container,
  gurobipy only for adaptive blocking, pynvml only for GPU scheduling).

Usage (BEFORE importing anything from the reference):
    import ref_stubs; ref_stubs.install()
    sys.path.insert(0, "/root/reference")
"""
from __future__ import annotations

import sys
import types


def _mod(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    from brief_pytorch_tpu.core import config as _cfg

    if "omegaconf" not in sys.modules:
        Config = _cfg.Config

        class OmegaConf:
            @staticmethod
            def load(path):
                return _cfg.load(str(path))

            @staticmethod
            def save(cfg, path):
                _cfg.save(cfg, str(path))

            @staticmethod
            def merge(base, override):
                base = base if isinstance(base, Config) else Config(dict(base))
                return _cfg.merge(base, override)

            @staticmethod
            def create(data=None):
                return Config(dict(data) if data else {})

            @staticmethod
            def to_container(cfg, resolve=True):
                return cfg.to_plain() if isinstance(cfg, Config) else cfg

        om = _mod("omegaconf", OmegaConf=OmegaConf, DictConfig=Config,
                  ListConfig=list)
        om.listconfig = _mod("omegaconf.listconfig", ListConfig=list)
        om.dictconfig = _mod("omegaconf.dictconfig", DictConfig=Config)

    if "tifffile" not in sys.modules:
        import cv2
        import numpy as np

        def imread(path):
            ok, pages = cv2.imreadmulti(str(path), flags=cv2.IMREAD_UNCHANGED)
            if not ok:
                raise IOError(f"tifffile stub: cannot read {path}")
            arr = np.stack(pages)
            return arr[0] if arr.shape[0] == 1 and arr.ndim == 3 else arr

        def imsave(path, img):
            img = np.asarray(img)
            pages = [np.ascontiguousarray(p) for p in img] if img.ndim >= 3 \
                else [np.ascontiguousarray(img)]
            if not cv2.imwritemulti(str(path), pages):
                raise IOError(f"tifffile stub: cannot write {path}")

        _mod("tifffile", imread=imread, imsave=imsave, imwrite=imsave)

    if "py7zr" not in sys.modules:
        _mod("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
             SevenZipFile=object)
    if "compressai" not in sys.modules:
        import torch

        class _EM(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        _mod("compressai")
        _mod("compressai.entropy_models", EntropyBottleneck=_EM,
             GaussianConditional=_EM)
    if "gurobipy" not in sys.modules:
        _mod("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
             Model=object, quicksum=sum)
    if "pynvml" not in sys.modules:
        _mod("pynvml", nvmlInit=lambda: None,
             nvmlDeviceGetHandleByIndex=lambda i: None,
             nvmlDeviceGetMemoryInfo=lambda h: types.SimpleNamespace(
                 free=16 << 30))
    if "skimage" not in sys.modules:
        def _no_ssim(*a, **k):
            raise NotImplementedError(
                "skimage stub: structural_similarity unavailable in image")

        sk = _mod("skimage")
        sk.metrics = _mod("skimage.metrics", structural_similarity=_no_ssim)
    if "prettytable" not in sys.modules:
        class PrettyTable:
            def __init__(self, field_names=None, **kw):
                self.field_names = field_names or []
                self._rows = []

            def add_row(self, row):
                self._rows.append(row)

            def get_string(self):
                lines = [" | ".join(str(c) for c in self.field_names)]
                lines += [" | ".join(str(c) for c in r) for r in self._rows]
                return "\n".join(lines)

            __str__ = get_string

        _mod("prettytable", PrettyTable=PrettyTable)
