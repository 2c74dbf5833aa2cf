"""Decode throughput, measured correctly (round 5).

Every prior decode number (bench_decode's 182M voxels/s, the round-5
ablation's "XLA 470M / Pallas 187M") timed ONE dispatch of a 256^3 decode
— and a trivial XLA iota+sum dispatch costs ~24 ms over this session's
TPU tunnel, comparable to the decode compute itself.  Those numbers
measured the tunnel, not the chip (the CLAUDE.md microbench trap, decode
edition).

This script repeats the FULL-grid decode R times INSIDE one jitted
dispatch (lax.scan over reps; per-rep 1e-20 bias perturbation defeats
CSE), syncing on a scalar — the same methodology the train bench uses.
Variants:

  xla_slab64k / xla_slab256k : _decode_scan + plain model.apply
  pallas_bm_slab64k          : shipped batch-major fused chain
                               (ops/pallas_siren.py, (N, f) tiles)
  pallas_fm_tile<T>          : new feature-major grid-decode kernel
                               (ops/pallas_decode.py, (f, N) tiles,
                               division-free coordinates)

Usage: python scripts/decode_bench2.py [edge] [reps]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.train.decode import _decode_scan, fused_apply_or
from brief_pytorch_tpu.ops import pallas_decode, pallas_siren


def reps_runner(decode_sum, params, reps):
    """One dispatch: scan `reps` full decodes, each on perturbed params."""

    @jax.jit
    def run():
        def body(acc, i):
            eps = i.astype(jnp.float32) * 1e-20
            p = {"layers": [
                {"w": l["w"], "b": l["b"] + eps} for l in params["layers"]]}
            return acc + decode_sum(p), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return acc

    return run


def time_runner(run):
    np.asarray(run())  # compile + warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main():
    edge = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spatial = (edge, edge, edge)
    vox = float(np.prod(spatial))
    phi_cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
               "layers": 5, "w0": 20, "res": False, "output_act": False,
               "features": 22}
    model = init_phi(phi_cfg)
    params = model.init(jax.random.PRNGKey(42))
    acts = pallas_siren.chain_layer_specs(model.spec)
    fused_bm = fused_apply_or(model, model.apply)

    variants = {}

    def scan_sum(apply_fn, slab):
        def decode_sum(p):
            flat = _decode_scan(p, apply_fn, spatial, 1, slab, "-1,1", None)
            return jnp.sum(flat)
        return decode_sum

    variants["xla_slab64k"] = scan_sum(model.apply, 65536)
    variants["xla_slab256k"] = scan_sum(model.apply, 262144)
    variants["pallas_bm_slab64k"] = scan_sum(fused_bm, 65536)

    for tile in (2048, 8192, 32768):
        def fm_sum(p, tile=tile):
            out = pallas_decode.fused_decode_grid(
                p["layers"], spatial, acts, "n11", tile=tile)
            return jnp.sum(out)
        variants[f"pallas_fm_tile{tile}"] = fm_sum

    results = {}
    for name, decode_sum in variants.items():
        run = reps_runner(decode_sum, params, reps)
        try:
            dt = time_runner(run)
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = {"error": str(e)[:200]}
            print(name, results[name], flush=True)
            continue
        per = dt / reps
        results[name] = {"s_per_decode": round(per, 5),
                         "Mvox_per_s": round(vox / per / 1e6, 1)}
        print(name, results[name], flush=True)

    print(json.dumps({"spatial": spatial, "reps": reps, "results": results}))


if __name__ == "__main__":
    main()
