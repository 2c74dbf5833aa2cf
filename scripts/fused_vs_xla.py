"""Measure run_segment throughput: XLA autodiff vs the fused Pallas
train kernel, at the bench config and the narrow/wide shape classes.

Run on TPU:  python scripts/fused_vs_xla.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(features, sampler_kind, n_steps=2000, sample_size=100_000):
    import jax
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import (RandomCubeSampler,
                                                  RandomPointSampler)
    from bench import FIXTURE

    data = read_img(FIXTURE)
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "layers": 5, "w0": 20,
                      "res": False, "features": features})
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})
    if sampler_kind == "randomcube":
        sampler = RandomCubeSampler((64, 64, 64), "-1,1", 1, (64, 64, 64))
        dev_data = jnp.asarray(data_norm)
        coords_per_step = 64 ** 3
    else:
        sampler = RandomPointSampler((64, 64, 64), "-1,1", sample_size)
        dev_data = jnp.asarray(data_norm.reshape(-1, 1))
        coords_per_step = sample_size
    dev_weight = jnp.ones_like(dev_data)

    out = {}
    for fused in (False, True):
        params = model.init(jax.random.PRNGKey(42))
        opt_state = tx.init(params)
        kwargs = dict(weight_thres=100.0, model=model, sampler=sampler,
                      tx=tx, loss_name="datal2", beta=0.01, half=False,
                      fused=fused)
        params, opt_state, losses = run_segment(
            params, opt_state, dev_data, dev_weight, jax.random.PRNGKey(0),
            n_steps=n_steps, **kwargs)
        np.asarray(losses)
        dt = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            params, opt_state, losses = run_segment(
                params, opt_state, dev_data, dev_weight,
                jax.random.PRNGKey(1 + rep), n_steps=n_steps, **kwargs)
            np.asarray(losses)
            dt = min(dt, time.perf_counter() - t0)
        out["fused" if fused else "xla"] = n_steps * coords_per_step / dt
        out[("fused" if fused else "xla") + "_final_loss"] = float(
            np.asarray(losses)[-1])
    return out


def main():
    for label, f, kind in [("bench_f83_cube", None, "randomcube"),
                           ("narrow_f22_point", 22, "randompoint"),
                           ("wide_f256_point", 256, "randompoint")]:
        if f is None:
            from brief_pytorch_tpu.models import sizing
            phi_cfg = {"name": "SIREN", "coords_channel": 3,
                       "data_channel": 1, "layers": 5, "w0": 20,
                       "res": False}
            f, _, _ = sizing.estimate_module_size(524804 / 80, phi_cfg, False)
        r = measure(f, kind)
        print(json.dumps({"config": label, "features": f,
                          "xla_coords_per_sec": round(r["xla"], 1),
                          "fused_coords_per_sec": round(r["fused"], 1),
                          "speedup": round(r["fused"] / r["xla"], 3),
                          "xla_final_loss": r["xla_final_loss"],
                          "fused_final_loss": r["fused_final_loss"]}),
              flush=True)


if __name__ == "__main__":
    main()
