"""parallel/: stacked masked-chain equivalence, vmapped block training, and
multi-device sharding on the virtual 8-CPU mesh."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fleet training loops

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
    @staticmethod
    def _assert_stack_matches_standalone(models, x, key=0, atol=1e-6):
        """Every block embedded in a padded stack must produce EXACTLY the
        same outputs as its standalone apply (padding is provably inert)."""
        spec, layers, masks, enc = build_stacked(models,
                                                 jax.random.PRNGKey(key))
        per_block = unstack_params(layers, models, enc)
        for bi, m in enumerate(models):
            ref = m.apply(per_block[bi], x)
            got = stacked_apply(
                [{k: v[bi] for k, v in l.items()} for l in layers],
                [mk[bi] for mk in masks], x, spec,
                {k: v[bi] for k, v in enc.items()} if enc else None)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=atol)
        return spec

    def test_masked_apply_matches_unpadded(self):
        models = _models([8, 16, 12])
        x = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (33, 3)).astype(np.float32))
        self._assert_stack_matches_standalone(models, x)

    def test_res_chain_stacks_exactly(self):
        """res-SIREN (HalfResidual, reference Networks.py:209-214) blocks
        stack with two linears per hidden entry."""
        models = [init_phi({"name": "SIREN", **{**BASE, "res": True},
                            "features": f}) for f in (8, 14)]
        x = jnp.asarray(np.random.default_rng(5)
                        .uniform(-1, 1, (21, 3)).astype(np.float32))
        spec = self._assert_stack_matches_standalone(models, x, key=5)
        assert any(k == "res" for k, _a, _w in spec.entries)

    def test_nerf_skip_stacks_exactly(self):
        """NeRF (positional encoding + mid-chain skip concat, reference
        Networks.py:84-136) blocks of different widths stack exactly."""
        models = [init_phi({"name": "NeRF", "coords_channel": 3,
                            "data_channel": 1, "features": f, "layers": 5,
                            "frequencies": 4, "skip": True})
                  for f in (8, 14, 10)]
        x = jnp.asarray(np.random.default_rng(6)
                        .uniform(-1, 1, (19, 3)).astype(np.float32))
        spec = self._assert_stack_matches_standalone(models, x, key=6,
                                                     atol=2e-6)
        assert spec.skip_entry == 2 and spec.encoder == "nerf"

    def test_ffn_stacks_exactly(self):
        """FFN (frozen Fourier bvals, reference Networks.py:138-207): the
        per-block bvals ride the stack as frozen encoder params."""
        models = [init_phi({"name": "FFN", "coords_channel": 3,
                            "data_channel": 1, "features": f, "layers": 4,
                            "embsize": 16, "scale": 10})
                  for f in (8, 12)]
        x = jnp.asarray(np.random.default_rng(7)
                        .uniform(-1, 1, (23, 3)).astype(np.float32))
        spec = self._assert_stack_matches_standalone(models, x, key=7,
                                                     atol=2e-5)
        assert spec.encoder == "ffn"

    def test_sirenpos_encoder_applied_in_stack(self):
        """A SIRENPos block in the fleet must produce EXACTLY its standalone
        apply (the param-free input encoder is part of the stacked math —
        regression: it was once silently skipped, so fleet-trained weights
        decoded wrongly through NFGR.decompress)."""
        models = [init_phi({"name": "SIRENPos", "coords_channel": 2,
                            "data_channel": 1, "features": f, "layers": 4,
                            "w0": 20, "T": [2, 3]}) for f in (8, 12)]
        x = jnp.asarray(np.random.default_rng(3)
                        .uniform(-1, 1, (17, 2)).astype(np.float32))
        spec = self._assert_stack_matches_standalone(models, x, key=3)
        assert spec.encoder == "sirenpos" and spec.encoder_cfg == (2, 3)

    def test_padded_units_receive_zero_grad(self):
        models = _models([8, 16])
        spec, layers, masks, _enc = build_stacked(models,
                                                  jax.random.PRNGKey(1))
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
        # per-step losses on uniform-noise volumes are draw-noisy; the fleet
        # must improve on average across blocks
        assert seen[200].mean() < seen[20].mean(), (seen[20], seen[200])

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
        # the small block's whole-block cube degenerates to the exact
        # full-batch path; the big block is guarded to randompoint
        assert set(by_mode) == {"randompoint", "fullbatch"}

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


class TestFleetCubeSampling:
    def test_cube_gather_matches_reference_sampler(self):
        """cube_gather_indices must select EXACTLY the cubes (same corners,
        same voxel order) that RandomCubeSampler draws for the same key —
        the fleet's randomcube step is then gradient-identical to the
        single-block trainer's (reference main.py:38-125 semantics)."""
        from brief_pytorch_tpu.parallel.block_trainer import \
            cube_gather_indices
        from brief_pytorch_tpu.train.samplers import RandomCubeSampler
        rng = np.random.default_rng(0)
        shape = (7, 9, 11)
        data = rng.uniform(0, 1, shape + (1,)).astype(np.float32)
        weight = rng.uniform(0, 1, shape + (1,)).astype(np.float32)
        cube_len, cube_count = (3, 4, 2), 5
        sampler = RandomCubeSampler(shape, "-1,1", cube_count, cube_len)
        key = jax.random.PRNGKey(123)
        ref_coords, ref_vals, ref_wts = sampler.sample(
            key, jnp.asarray(data), jnp.asarray(weight))
        idx = cube_gather_indices(key, jnp.asarray(shape, jnp.int32),
                                  cube_len, cube_count)
        flat = data.reshape(-1, 1)
        wflat = weight.reshape(-1, 1)
        np.testing.assert_array_equal(flat[np.asarray(idx)],
                                      np.asarray(ref_vals))
        np.testing.assert_array_equal(wflat[np.asarray(idx)],
                                      np.asarray(ref_wts))
        from brief_pytorch_tpu.core.coords import index_to_coords_dynamic
        got_coords = index_to_coords_dynamic(idx, jnp.asarray(shape), "-1,1")
        np.testing.assert_allclose(np.asarray(got_coords),
                                   np.asarray(ref_coords), atol=1e-6)

    def test_fleet_subcube_sampling_trains(self):
        """cube_len < block with cube_count > 1: true sub-cube draws under
        vmap (NOT the full-batch degeneration) — blocks of different shapes
        but equal clipped cubes share a bucket."""
        cc = cfglib.loads("""
sampler: {name: randomcube, cube_count: 3, cube_len: [4,4,4],
          sample_size: 512, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")
        blocks = []
        for f, shp in [(8, (8, 8, 8)), (12, (6, 10, 8))]:
            g = np.meshgrid(*[np.linspace(0, 1, s) for s in shp],
                            indexing="ij")
            vol = (50 + 40 * np.sin(3 * g[0]) * np.cos(2 * g[1]) * g[2]
                   ).astype(np.float32)[..., None]
            blocks.append({"name": f"b{f}", "data_norm": vol,
                           "weight": np.ones_like(vol),
                           "model": init_phi({"name": "SIREN", **BASE,
                                              "features": f}),
                           "sideinfos": {}, "weight_thres_norm": 0.0})
        trainer = BlockFleetTrainer(seed=0)
        seen = {}
        trainer.train(blocks, cc, max_steps=400, checkpoints=[10, 400],
                      progress_cb=lambda s, l: seen.update({s: l.copy()}))
        assert len(trainer._states) == 1
        st = trainer._states[0]
        assert st.sampler_name == "randomcube" and st.cube_len == (4, 4, 4)
        # cube losses are per-draw noisy (the single-block trainer shows the
        # same trajectory); compare fleet means across a long interval
        assert seen[400].mean() < seen[10].mean(), (seen[10], seen[400])

    def test_whole_block_cube_degenerates_to_fullbatch(self):
        cc = cfglib.loads("""
sampler: {name: randomcube, cube_count: 1, cube_len: [1000,1000,1000],
          sample_size: 512, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")
        rng = np.random.default_rng(0)
        vol = rng.uniform(0, 100, (6, 6, 6, 1)).astype(np.float32)
        blocks = [{"name": "b", "data_norm": vol, "weight": np.ones_like(vol),
                   "model": init_phi({"name": "SIREN", **BASE, "features": 8}),
                   "sideinfos": {}, "weight_thres_norm": 0.0}]
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, cc, max_steps=2, checkpoints=[2])
        assert trainer._states[0].sampler_name == "fullbatch"


class TestFleetRandompointDistribution:
    """The fleet's randompoint path draws floor(u * S) per axis with u on
    jax.random.uniform's float32 grid, instead of the reference's flat
    randint (main.py:126-163) — randint's modular reduction by a traced
    bound lowers to a slow TPU expansion.  These tests bound the exact
    distributional difference (VERDICT r2 weak item 3)."""

    def test_uniform_values_lie_on_2p23_grid(self):
        """jax.random.uniform(float32) yields multiples of 2^-23 — the
        premise of the exact per-position count audit below."""
        u = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (100_000,)))
        scaled = u * (1 << 23)
        np.testing.assert_array_equal(scaled, np.round(scaled))
        assert u.min() >= 0.0 and u.max() < 1.0

    @pytest.mark.parametrize("S", [64, 80, 100, 613, 2048, 4095])
    def test_per_position_probability_error_bounded(self, S):
        """Audit the EXACT map floor(u*S) (in float32, with the S-1 clamp,
        exactly as block_trainer.block_loss computes it) over the full
        2^23-value uniform grid: every position must be reachable and the
        per-position probability must match the flat draw's 1/S within a
        relative error <= 2 * S * 2^-23 (~1e-3 at S=4095)."""
        k = np.arange(1 << 23, dtype=np.float64)
        u = (k * 2.0 ** -23).astype(np.float32)
        pos = np.minimum((u * np.float32(S)).astype(np.int32), S - 1)
        counts = np.bincount(pos, minlength=S)
        assert counts.min() > 0, "some voxel has zero probability"
        probs = counts / float(1 << 23)
        rel_err = np.abs(probs * S - 1.0)
        bound = 2.0 * S * 2.0 ** -23
        assert rel_err.max() <= bound, (rel_err.max(), bound)


class TestFleetVectorisedRandompoint:
    """Fleet form of Compress.sampler.vector_len (train/samplers.py): runs
    of L voxels contiguous along the last axis, gathered with batched
    dynamic_slice instead of serial single-voxel loads."""

    def _cc(self, vector_len):
        return cfglib.loads(f"""
sampler: {{name: randompoint, cube_count: 1, cube_len: [64,64,64],
          sample_size: 512, gpu_force: true, vector_len: {vector_len}}}
loss: {{name: datal2, beta: 0.01, weight: [none], weight_thres: 0}}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {{name: none}}
""")

    def _blocks(self, widths, shapes, seed=0):
        rng = np.random.default_rng(seed)
        return [{
            "name": f"blk{i}",
            "data_norm": rng.uniform(0, 100, s + (1,)).astype(np.float32),
            "weight": np.ones(s + (1,), np.float32),
            "model": init_phi({"name": "SIREN", **BASE, "features": f}),
            "sideinfos": {},
            "weight_thres_norm": 0.0,
        } for i, (f, s) in enumerate(zip(widths, shapes))]

    @pytest.mark.parametrize("shape,L", [((7, 9, 11), 4), ((5, 6), 6),
                                         ((3, 4, 8), 8)])
    def test_run_starts_within_bounds(self, shape, L):
        """Every run of L voxels from a drawn start must lie inside the
        block: interior axes in [0, S), last axis in [0, W-L] — so the
        flat dynamic_slice never reads another row or the padding."""
        from brief_pytorch_tpu.parallel.block_trainer import \
            vector_run_starts
        starts = np.asarray(vector_run_starts(
            jax.random.PRNGKey(0), jnp.asarray(shape, jnp.int32), L, 5000))
        assert starts.min() >= 0
        for ax, S in enumerate(shape[:-1]):
            assert starts[:, ax].max() < S
        assert starts[:, -1].max() <= shape[-1] - L
        # the clamped marginal still reaches every legal start
        assert len(np.unique(starts[:, -1])) == shape[-1] - L + 1

    def test_fleet_vector_len_trains(self):
        blocks = self._blocks([8, 14], [(6, 8, 8), (8, 6, 12)])
        trainer = BlockFleetTrainer(seed=0)
        seen = {}
        trainer.train(blocks, self._cc(4), max_steps=200,
                      checkpoints=[20, 200],
                      progress_cb=lambda s, l: seen.update({s: l.copy()}))
        (st,) = trainer._states
        assert st.vector_len == 4
        assert np.all(np.isfinite(seen[200]))
        assert seen[200].mean() < seen[20].mean(), (seen[20], seen[200])

    def test_vector_len_clamped_to_bucket_last_axis(self):
        """Requested L larger than a block's last axis clamps to the
        bucket's shortest last axis (runs must not cross rows)."""
        blocks = self._blocks([8, 8], [(6, 6, 10), (6, 6, 6)])
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, self._cc(32), max_steps=2, checkpoints=[2])
        (st,) = trainer._states
        assert st.vector_len == 6

    def test_cube_bucket_pins_vector_len_1(self):
        """vector_len is randompoint-only; cube/fullbatch buckets must pin
        1 (it is a static jit arg — varying it would split their cache)."""
        blocks = self._blocks([8], [(6, 6, 6)])
        cc = self._cc(16)
        cc.sampler.name = "randomcube"
        cc.sampler.cube_len = [4, 4, 4]
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, cc, max_steps=2, checkpoints=[2])
        (st,) = trainer._states
        assert st.sampler_name == "randomcube"
        assert st.vector_len == 1


class TestSoloFallback:
    """MFN families have no chain structure and train per block (the
    reference children run ANY registered φ, main.py:277-280)."""

    def _cc(self):
        return cfglib.loads("""
sampler: {name: randompoint, cube_count: 1, cube_len: [64,64,64],
          sample_size: 256, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: none}
""")

    def test_mixed_chain_and_mfn_fleet(self):
        rng = np.random.default_rng(0)
        blocks = []
        for name, cfg in [
                ("SIREN", {"name": "SIREN", **BASE, "features": 8}),
                ("MFNGabor", {"name": "MFNGabor", "coords_channel": 3,
                              "data_channel": 1, "features": 12,
                              "layers": 4}),
                ("MFNFourier", {"name": "MFNFourier", "coords_channel": 3,
                                "data_channel": 1, "features": 10,
                                "layers": 4})]:
            vol = rng.uniform(0, 1, (6, 6, 6, 1)).astype(np.float32)
            blocks.append({"name": name, "data_norm": vol,
                           "weight": np.ones_like(vol),
                           "model": init_phi(cfg), "sideinfos": {},
                           "weight_thres_norm": 0.0})
        trainer = BlockFleetTrainer(seed=0)
        seen = {}
        trainer.train(blocks, self._cc(), max_steps=120,
                      checkpoints=[10, 120],
                      progress_cb=lambda s, l: seen.update({s: l.copy()}))
        assert len(trainer._states) == 1 and len(trainer._solo) == 2
        assert all("params" in b for b in blocks)
        assert "filters" in blocks[1]["params"]      # real MFN tree
        # every block (stacked and solo) improves
        assert np.all(seen[120] < seen[10]), (seen[10], seen[120])
        decoded = trainer.decode(blocks, self._cc(), None)
        assert all(d.shape == (6, 6, 6, 1) for d in decoded)


class TestSoloProgressAlignment:
    def test_not_started_solo_reports_nan_not_shrunk(self):
        """A solo block whose scaled schedule has not reached its first
        step by an early checkpoint must report NaN at its own position —
        skipping it would shrink the loss array and shift every later
        block for positional consumers."""
        rng = np.random.default_rng(0)
        mk = lambda: rng.uniform(0, 1, (6, 6, 6, 1)).astype(np.float32)
        import copy
        cc = TestSoloFallback._cc(None)
        solo_cc = copy.deepcopy(cc)
        solo_cc.max_steps = 3     # scaled target at ckpt 10/200 -> 0 steps
        blocks = [
            {"name": "a", "data_norm": mk(), "weight": None, "sideinfos": {},
             "model": init_phi({"name": "SIREN", **BASE, "features": 8}),
             "weight_thres_norm": 0.0},
            {"name": "solo", "data_norm": mk(), "weight": None,
             "sideinfos": {}, "solo_cfg": solo_cc,
             "model": init_phi({"name": "SIREN", **BASE, "features": 8}),
             "weight_thres_norm": 0.0},
            {"name": "c", "data_norm": mk(), "weight": None, "sideinfos": {},
             "model": init_phi({"name": "SIREN", **BASE, "features": 10}),
             "weight_thres_norm": 0.0},
        ]
        for b in blocks:
            b["weight"] = np.ones_like(b["data_norm"])
        trainer = BlockFleetTrainer(seed=0)
        seen = {}
        trainer.train(blocks, cc, max_steps=200, checkpoints=[10, 200],
                      progress_cb=lambda s, l: seen.update({s: l.copy()}))
        assert len(trainer._solo) == 1
        assert seen[10].shape == (3,) and seen[200].shape == (3,)
        assert np.isnan(seen[10][1]), seen[10]        # not started yet
        assert np.isfinite(seen[10][[0, 2]]).all()    # fleet blocks aligned
        assert np.isfinite(seen[200]).all()           # solo ran by the end


class TestSubmeshPacking:
    """Small buckets (B < mesh shards) pack onto disjoint device sub-meshes
    and run concurrently; the math must stay bit-identical to whole-mesh
    (cloned-pad-slot) placement."""

    def _blocks(self, specs, seed=3):
        rng = np.random.default_rng(seed)
        out = []
        for i, (layers, f) in enumerate(specs):
            vol = rng.uniform(0, 100, (6, 6, 6, 1)).astype(np.float32)
            out.append({
                "name": f"b{i}", "data_norm": vol,
                "weight": np.ones_like(vol),
                "model": init_phi({"name": "SIREN", **{**BASE,
                                   "layers": layers}, "features": f}),
                "sideinfos": {}, "weight_thres_norm": 0.0})
        return out

    def _cc(self):
        return TestFleetTraining._cc(None)

    def test_small_buckets_get_disjoint_submeshes(self):
        assert len(jax.devices()) == 8
        # three buckets (distinct layer counts) of sizes 3 / 2 / 2 — all
        # smaller than the 8-shard mesh
        specs = ([(3, 8)] * 3) + ([(4, 8)] * 2) + ([(5, 8)] * 2)
        blocks = self._blocks(specs)
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, self._cc(), max_steps=4, checkpoints=[4])
        stats = trainer.fleet_stats()
        assert len(stats) == 3
        # no cloned pad slots, one device per block
        assert all(s["slot_occupancy"] == 1.0 for s in stats)
        assert sorted(s["devices"] for s in stats) == [2, 2, 3]
        used = [d for s in stats for d in s["device_ids"]]
        assert len(used) == len(set(used)) == 7, used

    def test_packed_training_bit_identical_to_whole_mesh(self):
        specs = ([(3, 8), (3, 12)] + [(4, 10)] * 3)
        cc = self._cc()
        losses = {}

        def run(pack):
            blocks = self._blocks(specs)
            tr = BlockFleetTrainer(seed=0, pack_small_buckets=pack)
            tr.train(blocks, cc, max_steps=25, checkpoints=[25],
                     progress_cb=lambda s, l: losses.setdefault(pack, l))
            return tr.decode(blocks, cc, None)

        packed, whole = run(True), run(False)
        np.testing.assert_array_equal(losses[True], losses[False])
        for a, b in zip(packed, whole):
            np.testing.assert_array_equal(a, b)

    def test_solo_blocks_round_robin_devices(self):
        rng = np.random.default_rng(0)
        blocks = []
        for i in range(3):
            vol = rng.uniform(0, 1, (5, 5, 5, 1)).astype(np.float32)
            blocks.append({"name": f"mfn{i}", "data_norm": vol,
                           "weight": np.ones_like(vol),
                           "model": init_phi(
                               {"name": "MFNFourier", "coords_channel": 3,
                                "data_channel": 1, "features": 8,
                                "layers": 3}),
                           "sideinfos": {}, "weight_thres_norm": 0.0})
        trainer = BlockFleetTrainer(seed=0)
        trainer.train(blocks, self._cc(), max_steps=3, checkpoints=[3])
        devs = [next(iter(ss.dev_data.devices())).id
                for ss in trainer._solo]
        assert len(set(devs)) == 3, devs


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


def test_integer_stack_matches_f32_stack():
    """u16 stacks + per-block dequant train to the same losses as the f32
    stacks (the gathered values agree to f32 rounding; the affine is the
    same one normalize_data applied on the host)."""
    from brief_pytorch_tpu.core.normalize import normalize_data
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.parallel.block_trainer import (build_stacked,
                                                           run_block_segment)
    from brief_pytorch_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(3)
    blocks_f32, blocks_u16 = [], []
    for shape in [(6, 6, 6), (4, 6, 8)]:
        raw = rng.integers(500, 60000, (*shape, 1), dtype=np.uint16)
        norm, side = normalize_data(raw, "minmaxany_0_100")
        A = 100.0 / (side["max"] - side["min"])
        w = np.ones((*shape, 1), np.float32)
        blocks_f32.append({"data_norm": norm, "weight": w})
        blocks_u16.append({"data_norm": norm, "weight": w,
                           "data_raw": raw,
                           "dequant": (A, -side["min"] * A)})

    models = [init_phi({"name": "SIREN", "coords_channel": 3,
                        "data_channel": 1, "layers": 3, "features": 12,
                        "w0": 20, "res": False}) for _ in range(2)]
    spec, layers0, masks, enc = build_stacked(models, jax.random.PRNGKey(5))
    tx = make_optimizer("Adamax", 1e-3, None)

    def run(blocks):
        bb = BlockBatch.build(blocks)
        assert (bb.dq_scale is not None) == (blocks is blocks_u16)
        # run_block_segment donates params/opt_state: give each run its
        # own buffers
        layers = jax.tree_util.tree_map(jnp.copy, layers0)
        opt_state = jax.vmap(tx.init)(layers)
        dq = (None if bb.dq_scale is None else jnp.asarray(bb.dq_scale),
              None if bb.dq_offset is None else jnp.asarray(bb.dq_offset))
        _, _, losses = run_block_segment(
            layers, opt_state, masks, enc, jnp.asarray(bb.data),
            jnp.asarray(bb.weight), jnp.asarray(bb.valid),
            jnp.asarray(bb.shapes), jnp.full((2,), -np.inf, jnp.float32),
            jax.random.PRNGKey(9), spec=spec, tx=tx, loss_name="datal2",
            beta=0.01, use_thres=False, n_steps=30, sample_size=128,
            coords_mode="-1,1", half=False, dq_scale=dq[0], dq_offset=dq[1])
        return np.asarray(losses)

    l_f32 = run(blocks_f32)
    l_u16 = run(blocks_u16)
    np.testing.assert_allclose(l_u16, l_f32, rtol=2e-4, atol=2e-4)
