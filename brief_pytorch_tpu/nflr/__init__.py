"""NFLR: latent-modulated local INR compression with learned entropy coding
(capability parity with reference utils/CompressFramework.py:146-642).

Lazy exports keep light submodules (rans, entropy) importable without
pulling the full framework stack.
"""


def __getattr__(name):
    if name in ("ALLCF", "init_compressframework", "eval_performance"):
        from brief_pytorch_tpu.nflr import framework
        return getattr(framework, name)
    raise AttributeError(name)


__all__ = ["ALLCF", "init_compressframework", "eval_performance"]
