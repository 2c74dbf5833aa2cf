"""Feature-major fused grid-decode kernel vs the jnp chain (interpret mode).

ops/pallas_decode.py evaluates a supported chain over the FULL voxel grid
with division-free coordinates (plane axes precomputed from per-axis
linspaces; lead axis affine in program_id).  These tests pin its voxel
ORDER and values against the reference-parity path: the jnp chain applied
to index_to_coords over every flat index (the _decode_scan contract).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.core.coords import index_to_coords
from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.ops import pallas_decode as pd
from brief_pytorch_tpu.ops import pallas_siren as ps

pytestmark = pytest.mark.skipif(not ps._HAS_PALLAS, reason="no pallas")


def _full_grid_ref(model, params, spatial, mode="n11"):
    pop = int(np.prod(spatial))
    coords = index_to_coords(jnp.arange(pop), spatial, mode)
    return np.asarray(model.apply(params, coords))


def _siren(features=16, layers=4, cin=3, cout=1):
    model = init_phi({"name": "SIREN", "coords_channel": cin,
                      "data_channel": cout, "features": features,
                      "layers": layers, "w0": 20})
    return model, model.init(jax.random.PRNGKey(0))


class TestFusedDecodeGrid:
    def test_matches_jnp_3d(self):
        model, params = _siren()
        spatial = (5, 6, 7)  # plane=42 pads to the 128 tile
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "n11",
                                   tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_matches_jnp_2d_multichannel(self):
        model, params = _siren(cin=2, cout=3)
        spatial = (4, 9)
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "n11",
                                   tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        assert out.shape == (36, 3)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_multi_tile_plane(self):
        """plane > tile exercises the flat output-block index map."""
        model, params = _siren(features=8, layers=3)
        spatial = (3, 2, 150)  # plane=300 -> 3 tiles of 128 (padded)
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "n11",
                                   tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_coords_mode_01(self):
        model, params = _siren(features=8, layers=3)
        spatial = (4, 5, 5)
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "0,1",
                                   tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial, mode="0,1")
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_sirenpos_periods(self):
        """The param-free SIRENPos warp folds into coord precompute (plane)
        and the kernel (lead axis)."""
        model = init_phi({"name": "SIRENPos", "coords_channel": 3,
                          "data_channel": 1, "features": 16, "layers": 4,
                          "w0": 20, "T": [2.0, 3.0, 2.0]})
        params = model.init(jax.random.PRNGKey(0))
        spatial = (5, 4, 6)
        out = pd.decode_volume(model, params, spatial, "n11",
                               tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_lead_axis_singleton(self):
        model, params = _siren(features=8, layers=3)
        spatial = (1, 6, 7)
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "n11",
                                   tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_supports_gating(self):
        model, _ = _siren()
        assert pd.supports(model, (4, 4, 4))
        assert not pd.supports(model, (64,))  # needs >= 2 spatial axes
        nerf = init_phi({"name": "NeRF", "coords_channel": 3,
                         "data_channel": 1, "features": 16, "layers": 4})
        assert not pd.supports(nerf, (4, 4, 4))  # skip chains unsupported
        # weights past the VMEM residency budget fall back to the XLA scan
        # instead of failing Mosaic VMEM allocation at compile time
        huge = init_phi({"name": "SIREN", "coords_channel": 3,
                         "data_channel": 1, "features": 2048, "layers": 5,
                         "w0": 20})
        assert not pd.supports(huge, (4, 4, 4))

    @pytest.mark.parametrize("family", ["SIREN", "SIRENFT", "SIREN_RELU",
                                        "SIREN_SIGMOID", "SIRENPos",
                                        "SIREN_Pyramid", "SIRENPS"])
    def test_supported_families_match(self, family):
        """Every plain-chain phi family the kernel claims to support
        decodes identically to the XLA grid reference (output_act on,
        exercising the trailing sigmoid)."""
        cfg = {"name": family, "coords_channel": 3, "data_channel": 1,
               "features": 12, "layers": 4, "w0": 20, "output_act": True}
        if family == "SIRENPos":
            cfg["T"] = [2.0, 3.0, 2.0]
        if family == "SIREN_Pyramid":
            # widths shrink by features_dis per layer; must stay positive
            cfg["features"] = 40
        model = init_phi(cfg)
        spatial = (4, 5, 6)
        # these families are all plain chains: losing kernel support for
        # any of them would be a product regression, not a skip
        assert pd.supports(model, spatial), f"{family} lost kernel support"
        params = model.init(jax.random.PRNGKey(1))
        out = pd.decode_volume(model, params, spatial, "n11",
                               tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_fuzz_config_shapes(self, seed):
        """Randomized supported configs x odd grids agree with the XLA
        chain (layers down to 2, multi-channel, 2-D/3-D, both coord
        modes) — the edge-combination net the fixed cases can't cast."""
        rng = np.random.default_rng(100 + seed)
        cin = int(rng.choice([2, 3]))
        cfg = {"name": "SIREN", "coords_channel": cin,
               "data_channel": int(rng.choice([1, 2, 3])),
               "features": int(rng.choice([6, 10, 17])),
               "layers": int(rng.choice([2, 3, 5])), "w0": 20,
               "output_act": bool(rng.choice([True, False]))}
        spatial = tuple(int(rng.integers(1, 8)) for _ in range(cin))
        if spatial[0] == 1 and len(spatial) < 2:
            spatial = (2,) + spatial
        mode = str(rng.choice(["n11", "0,1"]))
        model = init_phi(cfg)
        assert pd.supports(model, spatial)
        params = model.init(jax.random.PRNGKey(seed))
        out = pd.decode_volume(model, params, spatial, mode,
                               tile=128, interpret=True)
        ref = _full_grid_ref(model, params, spatial, mode=mode)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_wide_chain_tile_clamp(self):
        """Wide chains clamp the voxel tile by the VMEM budget
        (_VMEM_TILE_BUDGET / width) and still decode exactly."""
        model, params = _siren(features=256, layers=3)
        spatial = (2, 3, 50)
        acts = ps.chain_layer_specs(model.spec)
        out = pd.fused_decode_grid(params["layers"], spatial, acts, "n11",
                                   tile=1 << 20, interpret=True)
        ref = _full_grid_ref(model, params, spatial)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_reconstruct_flattened_model_kwarg_cpu(self):
        """On the CPU test platform the model= route falls back to the XLA
        scan and stays numerically identical to the apply_fn path."""
        from brief_pytorch_tpu.train.decode import reconstruct_flattened
        model, params = _siren(features=8, layers=3)
        shape = (4, 5, 5, 1)
        a = reconstruct_flattened(model.apply, params, shape, 128, "n11")
        b = reconstruct_flattened(model.apply, params, shape, 128, "n11",
                                  model=model)
        np.testing.assert_array_equal(a, b)
