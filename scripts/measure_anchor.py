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
        cube_count=1, cube_len=[64, 64, 64], sample_count=2 * N_STEPS + 5,
        device="cpu", gpu_force=True)
    opt = torch.optim.Adamax(net.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[50000, 60000, 70000], gamma=0.2)

    def loss_func(y, yhat, w, thres):
        return torch.mean(w * (yhat - y) ** 2)

    # best-of-2 timed segments: this is a SINGLE-CORE host and background
    # activity (e.g. the session's TPU probes) can steal a rep
    it = iter(sampler)
    best = float("inf")
    for step in range(2 * N_STEPS + 5):
        coords, vals, wts = next(it)
        if step in (5, 5 + N_STEPS):
            t0 = time.perf_counter()
        opt.zero_grad()
        pred = net.forward(coords)
        loss = loss_func(vals, pred, wts, 0.0)
        loss.backward()
        opt.step()
        sched.step()
        if step in (4 + N_STEPS, 4 + 2 * N_STEPS):
            best = min(best, time.perf_counter() - t0)
    coords_per_step = 64 ** 3
    return N_STEPS * coords_per_step / best, float(loss.item())


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
    best = float("inf")
    for rep in (1, 2):          # best-of-2 (single-core host, see torch side)
        t0 = time.perf_counter()
        p, o, losses = run_segment(p, o, dev_data, None,
                                   jax.random.PRNGKey(rep),
                                   n_steps=N_STEPS, **kwargs)
        jax.block_until_ready(losses)
        best = min(best, time.perf_counter() - t0)
    return N_STEPS * 64 ** 3 / best, float(np.asarray(losses)[-1])


FLEET_BLOCKS = 8
FLEET_STEPS = 30
FLEET_SAMPLE = 32768


def _fleet_blocks_np():
    """The bench_fleet workload: 8 32^3 sub-blocks of the fixture with
    heterogeneous widths (bench.py bench_fleet)."""
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    data = read_img(FIXTURE)
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    out = []
    i = 0
    for z in range(2):
        for y in range(2):
            for x in range(2):
                out.append((data_norm[z * 32:(z + 1) * 32,
                                      y * 32:(y + 1) * 32,
                                      x * 32:(x + 1) * 32],
                            40 + 4 * (i % 3)))
                i += 1
    return out


def measure_torch_fleet():
    """The reference architecture for DivideTask: ONE child process per
    block (main.py:547-580), i.e. on a single device the blocks train
    sequentially.  Per-block steady state (2 warmup + FLEET_STEPS timed),
    summed — child startup/IO excluded, so this is generous to torch."""
    import torch
    sys.path.insert(0, REF)
    try:
        import utils.Networks as refnet
        from main import RandompointSampler
    finally:
        sys.path.remove(REF)
    total_dt = 0.0
    for blk, feats in _fleet_blocks_np():
        torch.manual_seed(0)
        net = refnet.SIREN(coords_channel=3, data_channel=1, features=feats,
                           layers=5, w0=20, res=False, output_act=False)
        sampler = RandompointSampler(
            torch.from_numpy(blk), np.ones_like(blk), "-1,1",
            sample_size=FLEET_SAMPLE, sample_count=2 * FLEET_STEPS + 2,
            device="cpu")
        opt = torch.optim.Adamax(net.parameters(), lr=1e-3)
        it = iter(sampler)
        best = float("inf")     # best-of-2 per block (single-core host)
        for step in range(2 * FLEET_STEPS + 2):
            coords, vals, wts = next(it)
            if step in (2, 2 + FLEET_STEPS):
                t0 = time.perf_counter()
            opt.zero_grad()
            pred = net.forward(coords)
            loss = torch.mean(wts * (pred - vals) ** 2)
            loss.backward()
            opt.step()
            if step in (1 + FLEET_STEPS, 1 + 2 * FLEET_STEPS):
                best = min(best, time.perf_counter() - t0)
        total_dt += best
    return FLEET_BLOCKS * FLEET_STEPS * FLEET_SAMPLE / total_dt


def measure_jax_fleet():
    """Our architecture for the same workload: all 8 blocks stacked into
    one vmapped program (parallel/block_trainer.py), single CPU device —
    the architectural win measured apart from any hardware story."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    blocks = []
    for i, (blk, feats) in enumerate(_fleet_blocks_np()):
        blocks.append({
            "name": f"b{i}", "data_norm": blk, "weight": np.ones_like(blk),
            "model": init_phi({"name": "SIREN", "coords_channel": 3,
                               "data_channel": 1, "features": feats,
                               "layers": 5, "w0": 20, "res": False}),
            "sideinfos": {}, "weight_thres_norm": 0.0})
    cc = cfglib.loads(f"""
sampler: {{name: randompoint, cube_count: 1, cube_len: [32,32,32],
          sample_size: {FLEET_SAMPLE}, gpu_force: true}}
loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: 0}}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {{name: none}}
""")
    trainer = BlockFleetTrainer(seed=0)
    trainer.train(blocks, cc, max_steps=1, checkpoints=[1])  # prepare+warm
    (st,) = trainer._states

    def run():
        losses = trainer._run_segment(st, cc, FLEET_STEPS)
        return np.asarray(losses)

    run()  # compile the timed n_steps
    best = float("inf")         # best-of-2 (single-core host)
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return FLEET_BLOCKS * FLEET_STEPS * FLEET_SAMPLE / best


DECODE_SPATIAL = (128, 128, 128)   # ~2.1M voxels: >1 s/side, stable timing
DECODE_SAMPLE = 10000   # the reference Decompress.sample_size default


def measure_torch_decode():
    """The reference's actual decompress loop (utils/misc.py:59-92 via
    NFGR.decompress main.py:270-297): whole-grid coords materialised, host
    loop of sample_size forward slices.  Timed best-of-2 on CPU."""
    import torch
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    import ref_stubs
    ref_stubs.install()
    sys.path.insert(0, REF)
    try:
        import utils.Networks as refnet
        from utils.misc import reconstruct_flattened as ref_reconstruct
    finally:
        sys.path.remove(REF)
    torch.manual_seed(42)
    net = refnet.SIREN(coords_channel=3, data_channel=1, features=FEATURES,
                       layers=5, w0=20, res=False, output_act=False)
    shape = (*DECODE_SPATIAL, 1)
    with torch.no_grad():
        ref_reconstruct(shape, DECODE_SAMPLE, net.forward, device="cpu")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = ref_reconstruct(shape, DECODE_SAMPLE, net.forward,
                                  device="cpu")
            best = min(best, time.perf_counter() - t0)
    return float(np.prod(DECODE_SPATIAL)) / best, float(out.float().mean())


def measure_jax_decode():
    """Our train/decode.reconstruct_flattened on the same CPU (the XLA
    scan path — the Pallas decode kernel is TPU-only), same grid and
    sample_size (ours rounds the slab up to a lane multiple: 10112)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.decode import reconstruct_flattened
    model = init_phi({"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                      "features": FEATURES, "layers": 5, "w0": 20,
                      "res": False, "output_act": False})
    params = model.init(jax.random.PRNGKey(42))
    shape = (*DECODE_SPATIAL, 1)
    reconstruct_flattened(model.apply, params, shape, DECODE_SAMPLE, "-1,1")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = reconstruct_flattened(model.apply, params, shape,
                                    DECODE_SAMPLE, "-1,1")
        best = min(best, time.perf_counter() - t0)
    return float(np.prod(DECODE_SPATIAL)) / best, float(out.mean())


def main():
    jax_cps, jax_loss = measure_jax()
    jax_fleet_cps = measure_jax_fleet()
    jax_dec_vps, _ = measure_jax_decode()
    torch_cps, torch_loss = measure_torch()
    torch_fleet_cps = measure_torch_fleet()
    torch_dec_vps, _ = measure_torch_decode()
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
        "fleet": {
            "config": f"{FLEET_BLOCKS} heterogeneous 32^3 blocks, "
                      f"randompoint {FLEET_SAMPLE}/step (bench_fleet "
                      "workload); reference = sequential per-block "
                      "children (main.py:547-580), ours = one vmapped "
                      "stacked program, both on one SINGLE-CORE CPU — "
                      "same core count either way, so the ratio measures "
                      "the stacking machinery's overhead (incl. masked "
                      "width padding 40/44->48), NOT the block-axis "
                      "device scaling the fleet exists for (that is "
                      "measured on hardware: RESULTS.md fleet numbers)",
            "reference_torch_coords_per_sec": round(torch_fleet_cps, 1),
            "ours_jax_cpu_coords_per_sec": round(jax_fleet_cps, 1),
            "ratio_ours_over_reference": round(
                jax_fleet_cps / torch_fleet_cps, 3),
            "n_timed_steps": FLEET_STEPS,
        },
        "decode": {
            "config": f"full-grid decompress, {'x'.join(map(str, DECODE_SPATIAL))}, "
                      f"SIREN f={FEATURES} L=5, sample_size {DECODE_SAMPLE} "
                      "(reference utils/misc.py:59-92 host slice loop vs "
                      "our jitted lax.scan, both CPU; the TPU decode "
                      "kernel's rate is RESULTS.md 'Decode path rebuilt')",
            "reference_torch_voxels_per_sec": round(torch_dec_vps, 1),
            "ours_jax_cpu_voxels_per_sec": round(jax_dec_vps, 1),
            "ratio_ours_over_reference": round(jax_dec_vps / torch_dec_vps,
                                               3),
        },
    }
    out = os.path.join(HERE, "anchor_crosscheck.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
