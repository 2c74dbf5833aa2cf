"""Measured CPU-vs-CPU anchor for bench.py's vs_baseline trend line
(VERDICT r3 item 3).

The reference repo publishes no throughput numbers and no CUDA GPU exists
here, so bench.py's anchor is an estimate.  This script measures the one
comparison that IS possible on this machine: the reference's actual torch
training loop (/root/reference/main.py:385-400 — zero_grad/forward/loss/
backward/step/scheduler per iteration) vs our jitted run_segment, both on
the SAME host CPU, same SingleTask contract config (SIREN f=22 L=5,
full-volume 64^3 randomcube batches, Adamax + MultiStepLR).

Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/measure_anchor.py
Writes anchor_crosscheck.json at the repo root; bench.py attaches it to
the contract JSON line as `anchor_crosscheck` (measured, not estimated).
"""
from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(HERE, "dataset", "brain", "64x64x64",
                       "brain-64_128-64_128-192_256.tif")
N_STEPS = 40          # timed steps (after 5 warmup)
FEATURES = 22         # contract sizing (bench.py)


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def measure_torch():
    import torch
    _stub("gurobipy", GRB=types.SimpleNamespace(BINARY="B", MAXIMIZE=-1),
          Model=object, quicksum=sum)
    _stub("py7zr", FILTER_BZIP2=1, FILTER_LZMA=2, FILTER_ZSTD=3,
          SevenZipFile=object)
    _stub("tifffile", imread=None, imwrite=None)
    # omegaconf stub must be a PACKAGE (main.py pulls omegaconf.dictconfig)
    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list,
          __path__=[])
    _stub("omegaconf.listconfig", ListConfig=list)
    _stub("omegaconf.dictconfig", DictConfig=dict)

    class _EM(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
    _stub("compressai")
    _stub("compressai.entropy_models", EntropyBottleneck=_EM,
          GaussianConditional=_EM)
    _stub("prettytable", PrettyTable=object)
    _stub("pynvml", nvmlInit=lambda: None)
    _stub("skimage", __path__=[])
    _stub("skimage.metrics", structural_similarity=None)
    _stub("matplotlib", __path__=[])
    _stub("matplotlib.pyplot")
    sys.path.insert(0, REF)
    try:
        import utils.Networks as refnet
        from main import RandomCubeSampler   # the reference sampler itself
    finally:
        sys.path.remove(REF)

    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    data = read_img(FIXTURE)
    data_norm, _ = normalize_data(data, "minmaxany_0_100")

    torch.manual_seed(42)
    net = refnet.SIREN(coords_channel=3, data_channel=1, features=FEATURES,
                       layers=5, w0=20, res=False, output_act=False)
    sampler = RandomCubeSampler(
        torch.from_numpy(data_norm), np.ones_like(data_norm), "-1,1",
        cube_count=1, cube_len=[64, 64, 64], sample_count=N_STEPS + 5,
        device="cpu", gpu_force=True)
    opt = torch.optim.Adamax(net.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[50000, 60000, 70000], gamma=0.2)

    def loss_func(y, yhat, w, thres):
        return torch.mean(w * (yhat - y) ** 2)

    it = iter(sampler)
    t0 = None
    for step in range(N_STEPS + 5):
        coords, vals, wts = next(it)
        if step == 5:
            t0 = time.perf_counter()
        opt.zero_grad()
        pred = net.forward(coords)
        loss = loss_func(vals, pred, wts, 0.0)
        loss.backward()
        opt.step()
        sched.step()
    dt = time.perf_counter() - t0
    coords_per_step = 64 ** 3
    return N_STEPS * coords_per_step / dt, float(loss.item())


def measure_jax():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomCubeSampler

    data = read_img(FIXTURE)
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    model = init_phi({"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                      "features": FEATURES, "layers": 5, "w0": 20,
                      "res": False, "output_act": False})
    params = model.init(jax.random.PRNGKey(42))
    tx = make_optimizer("Adamax", 1e-3, {"name": "MultiStepLR",
                                         "milestones": [50000, 60000, 70000],
                                         "gamma": 0.2})
    opt_state = tx.init(params)
    sampler = RandomCubeSampler((64, 64, 64), "-1,1", 1, (64, 64, 64))
    dev_data = jnp.asarray(data_norm)
    kwargs = dict(weight_thres=0.0, model=model, sampler=sampler, tx=tx,
                  loss_name="datal2", beta=0.01, half=False)
    # compile with the exact timed shape (5-step warmup segment re-jits at
    # a different n_steps, so warm both)
    p, o, _ = run_segment(params, opt_state, dev_data, None,
                          jax.random.PRNGKey(0), n_steps=N_STEPS, **kwargs)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    p, o, losses = run_segment(p, o, dev_data, None, jax.random.PRNGKey(1),
                               n_steps=N_STEPS, **kwargs)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    return N_STEPS * 64 ** 3 / dt, float(np.asarray(losses)[-1])


def main():
    jax_cps, jax_loss = measure_jax()
    torch_cps, torch_loss = measure_torch()
    rec = {
        "host": "cpu-vs-cpu (same machine)",
        "config": f"SIREN f={FEATURES} L=5, full-volume 64^3 randomcube, "
                  "Adamax+MultiStepLR (SingleTask contract)",
        "reference_torch_coords_per_sec": round(torch_cps, 1),
        "ours_jax_cpu_coords_per_sec": round(jax_cps, 1),
        "ratio_ours_over_reference": round(jax_cps / torch_cps, 3),
        "reference_loss_after": torch_loss,
        "ours_loss_after": jax_loss,
        "n_timed_steps": N_STEPS,
    }
    out = os.path.join(HERE, "anchor_crosscheck.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
