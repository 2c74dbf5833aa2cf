"""Measured floor of the fused Pallas train kernel at the contract shape.

The r3 attribution established the XLA path's no-transcendental floor
(identity activations, everything else unchanged: 0.23 ms/step).  This
script measures the same ablation INSIDE the fused kernel: the real
sine chain vs an acts-all-'none' LayerSpec on identical shapes, weights,
and batches — isolating how much of the kernel step is still sine work
and how close the kernel sits to its own floor.

Run on the chip from the repo root:  python scripts/kernel_floor.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_STEPS = int(os.environ.get("FLOOR_STEPS", 2000))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.ops.pallas_siren import chain_layer_specs
    from brief_pytorch_tpu.ops.pallas_train import fused_train_grads
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomCubeSampler

    here = os.path.join(os.path.dirname(__file__), "..")
    data = read_img(os.path.join(
        here, "dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"))
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "layers": 5, "w0": 20,
                      "features": 22, "res": False, "output_act": False})
    params = model.init(jax.random.PRNGKey(42))
    acts_real = chain_layer_specs(model.spec)
    acts_none = tuple(("none", 1.0) for _ in acts_real)
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})
    sampler = RandomCubeSampler((64, 64, 64), "-1,1", 1, (64, 64, 64))
    dev = jnp.asarray(data_norm)
    n = 64 ** 3

    def make_seg(acts):
        @jax.jit
        def seg(params, opt_state, key):
            def step(carry, k):
                p, o = carry
                coords, vals, wts = sampler.sample(k, dev, None)
                loss, grads = fused_train_grads(
                    p["layers"], coords.T, vals.T, wts.T, acts,
                    loss_name="datal2", weight_thres=100.0)
                up, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, up)
                return (p, o), loss
            keys = jax.random.split(key, N_STEPS)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, losses
        return seg

    for name, acts in [("fused_sine", acts_real), ("fused_identity",
                                                   acts_none)]:
        seg = make_seg(acts)
        p, o = params, tx.init(params)
        p, o, out = seg(p, o, jax.random.PRNGKey(0))
        np.asarray(out)
        best = float("inf")
        for r in range(2):
            t0 = time.perf_counter()
            p, o, out = seg(p, o, jax.random.PRNGKey(1 + r))
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / N_STEPS * 1e3
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 4),
                          "coords_per_sec": round(n / (ms / 1e3))}),
              flush=True)


if __name__ == "__main__":
    main()
