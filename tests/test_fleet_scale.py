"""Fleet scale hardening (VERDICT r1 weak item 2): ~96 heterogeneous
blocks across multiple buckets on the 8-device CPU mesh — mixed families,
layer counts, widths, and shapes — must bucket correctly, train, decode,
and keep padding waste bounded."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fleet scaling runs

import jax

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
from brief_pytorch_tpu.parallel.mesh import make_mesh


def _cc():
    return cfglib.loads("""
sampler: {name: randompoint, cube_count: 1, cube_len: [64,64,64],
          sample_size: 128, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")


def _make_fleet(n_blocks=96, seed=0):
    """Heterogeneous fleet: 3 families x varying layer counts x varying
    widths x varying spatial shapes (the adaptive-blocking regime)."""
    rng = np.random.default_rng(seed)
    blocks = []
    shapes = [(6, 6, 6), (4, 8, 6), (8, 4, 4), (6, 4, 10)]
    for i in range(n_blocks):
        fam = i % 3
        shp = shapes[i % len(shapes)]
        vol = rng.uniform(0, 100, shp + (1,)).astype(np.float32)
        if fam == 0:
            cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                   "layers": 4, "w0": 20, "res": False,
                   "features": 8 + (i % 7) * 2}
        elif fam == 1:
            cfg = {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
                   "layers": 5, "w0": 20, "res": False,
                   "features": 8 + (i % 5) * 2}
        else:
            cfg = {"name": "SIRENPos", "coords_channel": 3,
                   "data_channel": 1, "layers": 4, "w0": 20,
                   "T": [2, 2, 2], "features": 8 + (i % 4) * 2}
        blocks.append({"name": f"blk{i}", "data_norm": vol,
                       "weight": np.ones_like(vol),
                       "model": init_phi(cfg), "sideinfos": {},
                       "weight_thres_norm": 0.0})
    return blocks


def test_96_block_heterogeneous_fleet():
    blocks = _make_fleet(96)
    mesh = make_mesh()
    trainer = BlockFleetTrainer(mesh=mesh, seed=0)
    seen = {}
    trainer.train(blocks, _cc(), max_steps=20, checkpoints=[20],
                  progress_cb=lambda s, l: seen.update({s: l.copy()}))
    stats = trainer.fleet_stats()
    assert len(stats) == 3, [s["blocks"] for s in stats]
    assert sum(s["blocks"] for s in stats) == 96
    assert len(seen[20]) == 96
    # block-axis padding waste stays small at this scale: every bucket has
    # exactly 32 blocks = 4 full rounds of the 8-shard mesh
    assert all(s["slot_occupancy"] == 1.0 for s in stats)
    decoded = trainer.decode(blocks, _cc(), None)
    assert all(d.shape == b["data_norm"].shape
               for d, b in zip(decoded, blocks))


def test_slot_occupancy_accounting():
    """Small buckets pack onto sub-meshes at full occupancy; with packing
    disabled, a bucket of 3 blocks on an 8-shard mesh pads 5 clone slots
    and the stats must expose that waste."""
    blocks = _make_fleet(9)   # 3 per family -> 3 buckets of 3
    mesh = make_mesh()
    trainer = BlockFleetTrainer(mesh=mesh, seed=0)
    trainer.train(blocks, _cc(), max_steps=2, checkpoints=[2])
    stats = trainer.fleet_stats()
    assert len(stats) == 3
    for s in stats:   # packed: 3-device sub-mesh, no clone slots
        assert s["blocks"] == 3 and s["padded_blocks"] == 3
        assert s["slot_occupancy"] == 1.0 and s["devices"] == 3
    blocks = _make_fleet(9)
    trainer = BlockFleetTrainer(mesh=mesh, seed=0, pack_small_buckets=False)
    trainer.train(blocks, _cc(), max_steps=2, checkpoints=[2])
    for s in trainer.fleet_stats():
        assert s["blocks"] == 3 and s["padded_blocks"] == 8
        assert abs(s["slot_occupancy"] - 3 / 8) < 1e-9
