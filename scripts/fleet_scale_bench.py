"""Fleet-scale measurement (VERDICT r1 weak item 2): quantify what K
heterogeneous buckets cost vs one bucket, and what block-axis padding
wastes.

Buckets are independent XLA programs sharing the whole mesh, so they
serialize on-device by construction; segment dispatches are asynchronous
(no host sync between buckets), so the measurable overhead is dispatch +
compile-cache switching.  This script measures:

  T_fleet      — advancing a K-bucket fleet n_steps (one lockstep interval)
  sum(T_solo)  — each bucket advanced alone, summed
  overhead     — T_fleet / sum(T_solo) - 1  (bucket-serialization cost)

plus the fleet_stats() padding-occupancy table.

Run on TPU:  python scripts/fleet_scale_bench.py --blocks 96 --steps 500
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_fleet(n_blocks, seed=0, shape_scale=1):
    from brief_pytorch_tpu.models.phi import init_phi
    rng = np.random.default_rng(seed)
    blocks = []
    base = [(16, 16, 16), (8, 32, 16), (32, 8, 8), (16, 8, 32)]
    shapes = [tuple(s * shape_scale for s in t) for t in base]
    for i in range(n_blocks):
        fam = i % 3
        shp = shapes[i % len(shapes)]
        vol = rng.uniform(0, 100, shp + (1,)).astype(np.float32)
        if fam == 0:
            cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                   "layers": 4, "w0": 20, "res": False,
                   "features": 24 + (i % 7) * 4}
        elif fam == 1:
            cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                   "layers": 5, "w0": 20, "res": False,
                   "features": 24 + (i % 5) * 4}
        else:
            cfg = {"name": "SIRENPos", "coords_channel": 3,
                   "data_channel": 1, "layers": 4, "w0": 20,
                   "T": [2, 2, 2], "features": 24 + (i % 4) * 4}
        blocks.append({"name": f"blk{i}", "data_norm": vol,
                       "weight": np.ones_like(vol),
                       "model": init_phi(cfg), "sideinfos": {},
                       "weight_thres_norm": 0.0})
    return blocks


def time_train(blocks, cc, steps, mesh, seed=0):
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    trainer = BlockFleetTrainer(mesh=mesh, seed=seed)
    # warm/compile
    trainer.train(blocks, cc, max_steps=steps, checkpoints=[steps])
    t0 = time.perf_counter()
    trainer.train(blocks, cc, max_steps=steps, checkpoints=[steps],
                  progress_cb=lambda s, l: None)  # progress forces the sync
    dt = time.perf_counter() - t0
    return dt, trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=96)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--sample-size", type=int, default=4096)
    args = ap.parse_args()

    import jax
    from brief_pytorch_tpu.core import config as cfglib
    from brief_pytorch_tpu.parallel.mesh import make_mesh

    cc = cfglib.loads(f"""
sampler: {{name: randompoint, cube_count: 1, cube_len: [64,64,64],
          sample_size: {args.sample_size}, gpu_force: true}}
loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: 0}}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {{name: none}}
""")
    mesh = make_mesh(n_block_shards=len(jax.devices()))
    blocks = make_fleet(args.blocks)

    t_fleet, trainer = time_train(blocks, cc, args.steps, mesh)
    stats = trainer.fleet_stats()

    # per-bucket solo runs
    t_solo = []
    for st in trainer._states:
        sub = [blocks[i] for i in st.block_idxs]
        dt, _ = time_train(sub, cc, args.steps, mesh, seed=1)
        t_solo.append(dt)

    coords = args.steps * args.sample_size * args.blocks
    result = {
        "backend": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "blocks": args.blocks, "buckets": len(stats), "steps": args.steps,
        "t_fleet_s": round(t_fleet, 3),
        "t_solo_sum_s": round(sum(t_solo), 3),
        "bucket_serialization_overhead": round(t_fleet / sum(t_solo) - 1, 4),
        "fleet_coords_per_sec": round(coords / t_fleet, 1),
        "stats": stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
