"""parallel/: stacked masked-chain equivalence, vmapped block training, and
multi-device sharding on the virtual 8-CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.parallel.block_trainer import (BlockBatch,
                                                      BlockFleetTrainer,
                                                      build_stacked,
                                                      stacked_apply,
                                                      unstack_params)
from brief_pytorch_tpu.parallel.mesh import make_mesh

BASE = dict(coords_channel=3, data_channel=1, layers=4, w0=20, res=False)


def _models(widths):
    return [init_phi({"name": "SIREN", **BASE, "features": f}) for f in widths]


class TestStackedChain:
    def test_masked_apply_matches_unpadded(self):
        """A narrow net embedded in a padded stack must produce EXACTLY the
        same outputs as its standalone apply (padding is provably inert)."""
        models = _models([8, 16, 12])
        spec, layers, masks = build_stacked(models, jax.random.PRNGKey(0))
        per_block = unstack_params(layers, models)
        x = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (33, 3)).astype(np.float32))
        for bi, m in enumerate(models):
            ref = m.apply(per_block[bi], x)
            got = stacked_apply(
                [{k: v[bi] for k, v in l.items()} for l in layers],
                [mk[bi] for mk in masks], x, spec)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

    def test_sirenpos_encoder_applied_in_stack(self):
        """A SIRENPos block in the fleet must produce EXACTLY its standalone
        apply (the param-free input encoder is part of the stacked math —
        regression: it was once silently skipped, so fleet-trained weights
        decoded wrongly through NFGR.decompress)."""
        models = [init_phi({"name": "SIRENPos", "coords_channel": 2,
                            "data_channel": 1, "features": f, "layers": 4,
                            "w0": 20, "T": [2, 3]}) for f in (8, 12)]
        spec, layers, masks = build_stacked(models, jax.random.PRNGKey(3))
        assert spec.encoder == "sirenpos" and spec.encoder_cfg == (2, 3)
        per_block = unstack_params(layers, models)
        x = jnp.asarray(np.random.default_rng(3)
                        .uniform(-1, 1, (17, 2)).astype(np.float32))
        for bi, m in enumerate(models):
            ref = m.apply(per_block[bi], x)
            got = stacked_apply(
                [{k: v[bi] for k, v in l.items()} for l in layers],
                [mk[bi] for mk in masks], x, spec)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

    def test_padded_units_receive_zero_grad(self):
        models = _models([8, 16])
        spec, layers, masks = build_stacked(models, jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.default_rng(1)
                        .uniform(-1, 1, (16, 3)).astype(np.float32))
        y = jnp.ones((16, 1))

        def loss(layers_b, masks_b):
            pred = stacked_apply(layers_b, masks_b, x, spec)
            return ((pred - y) ** 2).mean()

        bi = 0  # the narrow block: half its stacked width is padding
        g = jax.grad(loss)([{k: v[bi] for k, v in l.items()} for l in layers],
                           [mk[bi] for mk in masks])
        for l, meta in enumerate(g):
            fo = models[bi].spec.entries[l].fan_out
            fi = models[bi].spec.entries[l].fan_in
            gw = np.asarray(meta["w"])
            gb = np.asarray(meta["b"])
            assert np.all(gw[fi:, :] == 0), f"layer {l}: grad in padded rows"
            assert np.all(gw[:, fo:] == 0), f"layer {l}: grad in padded cols"
            assert np.all(gb[fo:] == 0), f"layer {l}: grad in padded bias"
            # active region must receive signal
            assert np.abs(gw[:fi, :fo]).max() > 0


class TestFleetTraining:
    def _blocks(self, widths, shapes, seed=0):
        rng = np.random.default_rng(seed)
        blocks = []
        for f, shp in zip(widths, shapes):
            vol = rng.uniform(0, 100, shp + (1,)).astype(np.float32)
            blocks.append({
                "name": f"blk{f}",
                "data_norm": vol,
                "weight": np.ones_like(vol),
                "model": init_phi({"name": "SIREN", **BASE, "features": f}),
                "sideinfos": {},
                "weight_thres_norm": 100.0,
            })
        return blocks

    def _cc(self):
        return cfglib.loads("""
sampler: {name: randompoint, cube_count: 1, cube_len: [64,64,64],
          sample_size: 512, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")

    def test_fleet_reduces_loss_heterogeneous(self):
        blocks = self._blocks([8, 14, 20], [(8, 8, 8), (8, 6, 10), (4, 8, 8)])
        trainer = BlockFleetTrainer(seed=0)
        seen = {}

        def progress(step, losses):
            seen[step] = losses.copy()

        trainer.train(blocks, self._cc(), max_steps=200,
                      checkpoints=[20, 200], progress_cb=progress)
        assert all("params" in b for b in blocks)
        assert np.all(seen[200] < seen[20]), (seen[20], seen[200])

    def test_fleet_decode_shapes(self):
        blocks = self._blocks([8, 14], [(8, 8, 8), (4, 8, 8)])
        trainer = BlockFleetTrainer(seed=0)
        cc = self._cc()
        trainer.train(blocks, cc, max_steps=30, checkpoints=[30])
        decoded = trainer.decode(blocks, cc, None)
        assert decoded[0].shape == (8, 8, 8, 1)
        assert decoded[1].shape == (4, 8, 8, 1)

    def test_per_block_weight_thres(self):
        """Each block normalizes weight_thres with its OWN min/max
        (reference: each child runs main.py:380-383 on its own chunk); two
        blocks sharing a bucket must train with their own thresholds, not
        the first block's."""
        blocks = self._blocks([8, 8], [(6, 6, 6), (6, 6, 6)])
        # fresh SIREN predictions are near 0, so the override condition
        # pred <= thres differs only with thresholds straddling 0
        blocks[0]["weight_thres_norm"] = -1e6   # never overrides
        blocks[1]["weight_thres_norm"] = 1e6    # overrides everywhere
        # zero voxel weights: block 1's loss becomes fully weighted (1.0)
        # via its override; block 0's stays zero-weighted
        for b in blocks:
            b["weight"] = np.zeros_like(b["weight"])
        trainer = BlockFleetTrainer(seed=0)
        cc = self._cc()
        cc.loss.weight_thres = 1  # enables the override path
        seen = {}
        trainer.train(blocks, cc, max_steps=1, checkpoints=[1],
                      progress_cb=lambda s, l: seen.update({s: l.copy()}))
        assert len(trainer._states) == 1, "blocks must share one bucket"
        l0, l1 = seen[1]
        assert l1 > 100 * max(l0, 1e-9), (l0, l1)

    def test_cube_guard_buckets_big_blocks_to_randompoint(self):
        """randomcube on a block bigger than 80^3 must fall back to
        randompoint per block (the reference's child-process guard,
        main.py:332-334) — the full-batch path over Vmax-padded voxel
        arrays OOMs HBM at adaptive-blocking scales.  Small blocks keep
        randomcube, so a mixed fleet splits into two buckets."""
        cc = self._cc()
        cc.sampler.name = "randomcube"
        cc.sampler.cube_len = [10000000, 10000000, 10000000]
        big = (96, 96, 96)    # 884736 > 80^3
        small = (8, 8, 8)
        blocks = self._blocks([8, 8], [big, small])
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, cc, max_steps=2, checkpoints=[2])
        assert blocks[0]["sampler_name"] == "randompoint"
        assert blocks[1]["sampler_name"] == "randomcube"
        assert len(trainer._states) == 2
        by_mode = {st.sampler_name: st for st in trainer._states}
        assert set(by_mode) == {"randompoint", "randomcube"}

    def test_block_axis_shards_over_8_devices(self):
        """8 blocks on the 8-device CPU mesh: sharded batch axis, no error,
        and per-shard placement is actually distributed."""
        assert len(jax.devices()) == 8
        blocks = self._blocks([8] * 8, [(4, 4, 4)] * 8)
        mesh = make_mesh()
        trainer = BlockFleetTrainer(mesh=mesh, seed=0)
        trainer.train(blocks, self._cc(), max_steps=10, checkpoints=[10])
        (state,) = trainer._states
        sharding = state.params[0]["w"].sharding
        assert len(sharding.device_set) == 8


class TestBlockBatch:
    def test_padding_and_valid_counts(self):
        rng = np.random.default_rng(0)
        blocks = [{"data_norm": rng.uniform(size=(4, 4, 4, 1)).astype(np.float32),
                   "weight": np.ones((4, 4, 4, 1), np.float32)},
                  {"data_norm": rng.uniform(size=(2, 4, 8, 1)).astype(np.float32),
                   "weight": np.ones((2, 4, 8, 1), np.float32)}]
        bb = BlockBatch.build(blocks)
        assert bb.vmax == 64
        assert list(np.asarray(bb.valid)) == [64, 64]
        blocks[1]["data_norm"] = blocks[1]["data_norm"][:, :, :4]
        blocks[1]["weight"] = blocks[1]["weight"][:, :, :4]
        bb = BlockBatch.build(blocks)
        assert list(np.asarray(bb.valid)) == [64, 32]
        np.testing.assert_array_equal(np.asarray(bb.data[1, 32:]), 0)
