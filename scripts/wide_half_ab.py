"""Wide-class (f=256) bf16 A/B: does `half` pay where the MXU is busy?

RESULTS r2 measured `Compress.half` a LOSS at the contract (f=22) —
the step is VPU-bound there and the casts add work.  The wide class is
different: 29-43% MFU, genuinely matmul-bound, and bf16 doubles the
MXU rate.  This times run_segment at f=256 randompoint 100k in four
forms: f32/bf16 x XLA/fused-kernel.

Run on the chip from the repo root:  python scripts/wide_half_ab.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_STEPS = int(os.environ.get("AB_STEPS", 1000))
SAMPLE = 100_000


def main():
    import jax
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomPointSampler

    here = os.path.join(os.path.dirname(__file__), "..")
    data = read_img(os.path.join(
        here, "dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"))
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    dev = jnp.asarray(data_norm.reshape(-1, 1))
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "layers": 5, "w0": 20,
                      "features": 256, "res": False, "output_act": False})
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})
    sampler = RandomPointSampler((64, 64, 64), "-1,1", SAMPLE, 1)

    for name, half, fused in [("xla_f32", False, False),
                              ("xla_bf16", True, False),
                              ("fused_f32", False, True),
                              ("fused_bf16", True, True)]:
        params = model.init(jax.random.PRNGKey(42))
        st = {"p": params, "o": tx.init(params)}

        def run(seed):
            st["p"], st["o"], losses = run_segment(
                st["p"], st["o"], dev, None, jax.random.PRNGKey(seed),
                weight_thres=100.0, model=model, sampler=sampler, tx=tx,
                loss_name="datal2", beta=0.01, n_steps=N_STEPS, half=half,
                fused=fused)
            return losses

        out = run(0)
        last0 = float(np.asarray(out)[-1])
        best = float("inf")
        for r in range(2):
            t0 = time.perf_counter()
            out = run(1 + r)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / N_STEPS * 1e3
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 4),
                          "coords_per_sec": round(SAMPLE / (ms / 1e3)),
                          "first_seg_final_loss": round(last0, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
