"""In-step gather A/B for the narrow randompoint class (VERDICT r3 #5).

The standalone-dispatch probe (gather_probe.py) is dispatch-dominated —
its per-call times (~3 ms) EXCEED the whole fused training step (1.66 ms)
— so it cannot rank gather formulations.  This script times the REAL
jitted scan-fused training segment (train/fit.run_segment) on the chip
with the narrow-class workload (SIREN f=22 L=5, randompoint 100k/step on
the 64^3 fixture) for each sampler form, plus attribution ablations:

  flat        vector_len=1 (reference iid semantics)
  vec32       vector_len=32 (aligned row gather when pop % 32 == 0)
  vec128      vector_len=128
  nogather    sampler replaced by a contiguous slice (keeps RNG + coords
              regen + train math; isolates the gather's in-step cost)

Run on TPU from the repo root:  python scripts/instep_gather_ab.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass
from typing import Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_STEPS = int(os.environ.get("AB_STEPS", 600))
SAMPLE = int(os.environ.get("AB_SAMPLE", 100_000))


def main():
    import jax
    import jax.numpy as jnp
    from brief_pytorch_tpu.core.coords import index_to_coords
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.io.image import read_img
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomPointSampler

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # AB_VOLUME: alternative volume path — e.g. the 16.7M-voxel demo
    # volume (dataset/example/hipct-0_64-0_512-0_512.tif), where random
    # gathers are true HBM row fetches rather than cache hits; the 64^3
    # fixture's 262k-voxel population fits on-chip memory and CANNOT
    # resolve whether the gather is byte-bound at production scale
    vol = os.environ.get("AB_VOLUME") or os.path.join(
        here, "dataset", "brain", "64x64x64",
        "brain-64_128-64_128-192_256.tif")
    data = read_img(vol)
    data_norm, _ = normalize_data(data, "minmaxany_0_100")
    SHAPE = tuple(int(s) for s in data.shape[:-1])
    dev_data = jnp.asarray(data_norm.reshape(-1, 1))
    dev_weight = jnp.ones_like(dev_data)

    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "features": 22, "layers": 5,
                      "w0": 20, "res": False, "output_act": False})
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})

    @dataclass(frozen=True)
    class NoGatherSampler:
        """Contiguous slice instead of the gather: everything else (RNG,
        coords regen, forward/backward/update) unchanged."""
        spatial_shape: Tuple[int, ...]
        coords_mode: str
        sample_size: int

        def sample(self, key, data_flat, weight_flat):
            pop = data_flat.shape[0]
            start = jax.random.randint(key, (), 0, pop - self.sample_size)
            idx = jnp.arange(self.sample_size)
            vals = jax.lax.dynamic_slice(
                data_flat, (start, 0), (self.sample_size, 1))
            wts = jnp.ones_like(vals)
            coords = index_to_coords(idx + start, self.spatial_shape,
                                     self.coords_mode, data_flat.dtype)
            return coords, vals, wts

    def bench(name, sampler, data=None, weight=None):
        """weight None = the production unit-weight fast path (train/fit.py
        passes dev_weight=None for all-ones volumes; ONE gather per step).
        Pass dev_weight to reproduce the legacy 2-gather form."""
        dat = dev_data if data is None else data
        params = model.init(jax.random.PRNGKey(42))
        opt_state = tx.init(params)
        kwargs = dict(weight_thres=100.0, model=model, sampler=sampler,
                      tx=tx, loss_name="datal2", beta=0.01, half=False)
        state = {"p": params, "o": opt_state}

        def run(seed):
            state["p"], state["o"], losses = run_segment(
                state["p"], state["o"], dat, weight,
                jax.random.PRNGKey(seed), n_steps=N_STEPS, **kwargs)
            return losses

        out = run(0)
        np.asarray(out)                       # sync (tunnel-safe)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            out = run(1 + r)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / N_STEPS * 1e3
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 4),
                          "coords_per_sec": round(SAMPLE / (ms / 1e3))}),
              flush=True)

    @dataclass(frozen=True)
    class NarrowGatherSampler:
        """iid flat gather from a NARROW-dtype volume (u16/bf16), converted
        to the normalized f32 batch AFTER the gather — measures whether the
        iid gather is byte-bound (halving bytes helps) or per-index-bound
        (it doesn't); VERDICT r3 #5's remaining lever."""
        spatial_shape: Tuple[int, ...]
        coords_mode: str
        sample_size: int
        scale: float
        offset: float

        def sample(self, key, data_flat, weight_flat):
            pop = data_flat.shape[0]
            idx = jax.random.randint(key, (self.sample_size,), 0, pop)
            raw = data_flat[idx]
            vals = raw.astype(jnp.float32) * self.scale + self.offset
            wts = jnp.ones_like(vals)
            coords = index_to_coords(idx, self.spatial_shape,
                                     self.coords_mode, jnp.float32)
            return coords, vals, wts

    lo, hi = float(data.min()), float(data.max())
    scale = 100.0 / (hi - lo)
    dev_u16 = jnp.asarray(data.reshape(-1, 1))          # uint16 as stored
    dev_bf16 = jnp.asarray(data_norm.reshape(-1, 1), jnp.bfloat16)

    bench("flat", RandomPointSampler(SHAPE, "-1,1", SAMPLE, 1))
    bench("flat_plus_weight_gather",
          RandomPointSampler(SHAPE, "-1,1", SAMPLE, 1),
          weight=dev_weight)
    bench("vec32", RandomPointSampler(SHAPE, "-1,1", SAMPLE, 32))
    bench("vec128", RandomPointSampler(SHAPE, "-1,1", SAMPLE, 128))
    bench("nogather", NoGatherSampler(SHAPE, "-1,1", SAMPLE))
    bench("flat_u16",
          RandomPointSampler(SHAPE, "-1,1", SAMPLE, 1,
                             scale, -lo * scale), data=dev_u16)
    bench("flat_bf16",
          NarrowGatherSampler(SHAPE, "-1,1", SAMPLE, 1.0, 0.0),
          data=dev_bf16)


if __name__ == "__main__":
    main()
