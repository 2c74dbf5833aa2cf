"""A/B: fast_sin vs fast_sin_cached (cos-residual custom_vjp) in the XLA
autodiff training paths.

The fused Pallas kernel (the r4 solo default on TPU) already stores its
activation derivatives; the XLA autodiff paths — the block FLEET trainer
(no fused path: stacked vmapped chains), CPU, NFLR — still differentiate
the fast_sin polynomial in the backward (~14 VPU ops re-run per
activation).  fast_math.fast_sin_cached computes (sin, cos) in the
forward through ONE shared range reduction and its VJP is just g*cos.

This script times the REAL scan-fused segments (never standalone
dispatches — CLAUDE.md measurement lessons) with fast_sin monkeypatched
to each variant:

  * solo run_segment, fused=False, contract config (f=22 full-volume)
  * solo run_segment, fused=False, narrow randompoint 100k
  * the 8-block fleet segment (bench.bench_fleet workload)

Run on the chip from the repo root:  python scripts/sincos_vjp_ab.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _patch(variant: str):
    """Point every `from fast_math import fast_sin` at the variant.

    Call sites import fast_sin INSIDE the function body (models/phi.py,
    nflr/networks.py at module level is rebound too), so rebinding the
    module attribute switches the implementation for new traces."""
    import jax
    from brief_pytorch_tpu.ops import fast_math
    from brief_pytorch_tpu.nflr import networks
    impl = fast_math.fast_sin_cached if variant == "cached" \
        else fast_math._FAST_SIN_IMPL
    fast_math.fast_sin = impl
    networks.fast_sin = impl
    # jit caches key on static args that can compare equal across variants
    # (fresh-but-equal models) — force retraces so the patch takes effect
    jax.clear_caches()


def time_solo(sampler_kind: str, variant: str, n_steps=2000):
    import jax
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import (RandomCubeSampler,
                                                  RandomPointSampler)
    _patch(variant)

    here = os.path.join(os.path.dirname(__file__), "..")
    data = read_img(os.path.join(
        here, "dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"))
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "layers": 5, "w0": 20,
                      "features": 22, "res": False, "output_act": False})
    params = model.init(jax.random.PRNGKey(42))
    tx = make_optimizer("Adamax", 1e-3, {"name": "MultiStepLR",
                                         "milestones": [50000], "gamma": 0.2})
    opt_state = tx.init(params)
    if sampler_kind == "cube":
        sampler = RandomCubeSampler((64, 64, 64), "-1,1", 1, (64, 64, 64))
        dev = jnp.asarray(data_norm)
        coords_per_step = 64 ** 3
    else:
        sampler = RandomPointSampler((64, 64, 64), "-1,1", 100_000, 1)
        dev = jnp.asarray(data_norm.reshape(-1, 1))
        coords_per_step = 100_000
    wt = jnp.ones_like(dev)
    kw = dict(weight_thres=100.0, model=model, sampler=sampler, tx=tx,
              loss_name="datal2", beta=0.01, half=False, fused=False)
    st = {"p": params, "o": opt_state}

    def run(seed):
        st["p"], st["o"], losses = run_segment(
            st["p"], st["o"], dev, wt, jax.random.PRNGKey(seed),
            n_steps=n_steps, **kw)
        return losses

    np.asarray(run(0))
    dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        out = run(1 + rep)
        np.asarray(out)
        dt = min(dt, time.perf_counter() - t0)
    return n_steps * coords_per_step / dt


def time_fleet(variant: str):
    _patch(variant)
    import bench
    import contextlib
    import io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.bench_fleet(metric="fleet_ab")
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["value"]


def main():
    for name, fn in [("contract_cube", lambda v: time_solo("cube", v)),
                     ("narrow_point", lambda v: time_solo("point", v)),
                     ("fleet", time_fleet)]:
        plain = fn("plain")
        cached = fn("cached")
        print(json.dumps({"config": name,
                          "plain_coords_per_sec": round(plain, 1),
                          "cached_coords_per_sec": round(cached, 1),
                          "speedup": round(cached / plain, 3)}), flush=True)


if __name__ == "__main__":
    main()
