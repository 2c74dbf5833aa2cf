"""Benchmark: coords/s/chip during INR fitting (the BASELINE.json metric).

Runs the jitted single-volume training step on the bundled 64^3 brain
fixture with the reference SingleTask default semantics (full-volume
randomcube batches: 262,144 coords/step) and reports sustained training
throughput on the available chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference trains ~85 steps/s on one A100 for this config
(100k coords/step batchwise ~ 8.5e6 coords/s); we report the ratio of our
coords/s to that figure.  (The reference repo publishes no numbers —
BASELINE.md; this figure is a measured-order-of-magnitude anchor for the
driver's trend line, not a vendor claim.)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_COORDS_PER_SEC = 8.5e6  # anchor (see module docstring)
_HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(_HERE, "dataset", "brain", "64x64x64",
                       "brain-64_128-64_128-192_256.tif")
if not os.path.exists(FIXTURE):
    FIXTURE = "/root/reference/dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"


def main():
    import jax
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.models import sizing
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomCubeSampler

    data = read_img(FIXTURE)
    data_norm, side = normalize_data(data, "minmaxany_0_100")

    phi_cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
               "layers": 5, "w0": 20, "res": False, "output_act": False}
    ideal = 524804 / 80  # file bytes / filesize_ratio (SingleTask default)
    feats, count, theory = sizing.estimate_module_size(ideal, phi_cfg, False)
    phi_cfg["features"] = feats
    model = init_phi(phi_cfg)
    params = model.init(jax.random.PRNGKey(42))
    tx = make_optimizer("Adamax", 1e-3, {"name": "MultiStepLR",
                                         "milestones": [50000, 60000, 70000],
                                         "gamma": 0.2})
    opt_state = tx.init(params)
    sampler = RandomCubeSampler((64, 64, 64), "-1,1", 1, (64, 64, 64))
    dev_data = jnp.asarray(data_norm)
    dev_weight = jnp.ones_like(dev_data)

    kwargs = dict(weight_thres=100.0, model=model, sampler=sampler, tx=tx,
                  loss_name="datal2", beta=0.01, half=False)

    # warmup/compile with the SAME n_steps as the timed run: run_segment is
    # jitted with static n_steps, so a different warmup length would leave
    # the timed call to pay the scan's compile time (which at these model
    # sizes dwarfs the actual training) — steady-state throughput is what
    # the metric is defined as.
    n_steps = 2000
    params, opt_state, losses = run_segment(params, opt_state, dev_data,
                                            dev_weight, jax.random.PRNGKey(0),
                                            n_steps=n_steps, **kwargs)
    np.asarray(losses)  # full sync

    dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        params, opt_state, losses = run_segment(params, opt_state, dev_data,
                                                dev_weight,
                                                jax.random.PRNGKey(1 + rep),
                                                n_steps=n_steps, **kwargs)
        np.asarray(losses)  # full sync
        dt = min(dt, time.perf_counter() - t0)

    coords_per_step = 64 * 64 * 64
    coords_per_sec = n_steps * coords_per_step / dt
    print(json.dumps({
        "metric": "train_coords_per_sec_per_chip",
        "value": round(float(coords_per_sec), 1),
        "unit": "coords/s/chip",
        "vs_baseline": round(float(coords_per_sec / REFERENCE_COORDS_PER_SEC), 3),
    }))


if __name__ == "__main__":
    main()
