"""Pallas fused SIREN-chain kernel vs the jnp chain (interpret mode on CPU).

The kernel (ops/pallas_siren.py) fuses the whole matmul+sine chain in VMEM;
on hardware it was verified against XLA at max|err| ~2e-4 (sin ulp); in
interpret mode it must match the jnp chain closely.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.ops import pallas_siren as ps


@pytest.fixture(scope="module")
def siren():
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "features": 32, "layers": 4,
                      "w0": 20})
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestFusedChain:
    def test_supports(self, siren):
        model, _ = siren
        assert ps.supports(model) == ps._HAS_PALLAS
        nerf = init_phi({"name": "NeRF", "coords_channel": 3,
                         "data_channel": 1, "features": 16, "layers": 4})
        assert not ps.supports(nerf)  # skip/encoder chains fall back

    @pytest.mark.skipif(not ps._HAS_PALLAS, reason="no pallas")
    def test_forward_matches_jnp(self, siren):
        model, params = siren
        coords = jax.random.uniform(jax.random.PRNGKey(1), (700, 3),
                                    minval=-1)
        acts = ps.chain_layer_specs(model.spec)
        ref = model.apply(params, coords)
        out = ps.fused_chain_apply(params["layers"], coords, acts,
                                   256, True)   # interpret mode
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    @pytest.mark.skipif(not ps._HAS_PALLAS, reason="no pallas")
    def test_padding_tail(self, siren):
        """N not a multiple of the tile pads internally and slices back."""
        model, params = siren
        acts = ps.chain_layer_specs(model.spec)
        coords = jax.random.uniform(jax.random.PRNGKey(2), (130, 3),
                                    minval=-1)
        out = ps.fused_chain_apply(params["layers"], coords, acts, 256, True)
        assert out.shape == (130, 1)

    @pytest.mark.skipif(not ps._HAS_PALLAS, reason="no pallas")
    def test_gradients_match(self, siren):
        model, params = siren
        acts = ps.chain_layer_specs(model.spec)
        coords = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                                    minval=-1)

        def loss_fused(p):
            return (ps.fused_chain_apply(p["layers"], coords, acts,
                                         256, True) ** 2).mean()

        def loss_jnp(p):
            return (model.apply(p, coords) ** 2).mean()

        g1 = jax.grad(loss_fused)(params)
        g2 = jax.grad(loss_jnp)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_fused_apply_or_fallback_on_cpu(self, siren):
        from brief_pytorch_tpu.train.decode import fused_apply_or
        model, _ = siren
        # on the CPU test platform the fallback must be returned
        sentinel = lambda *a, **k: None
        assert fused_apply_or(model, sentinel) is sentinel


def test_fused_apply_sirenpos_matches_model():
    """make_fused_apply handles SIRENPos via the outside-kernel warp."""
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.ops import pallas_siren as ps
    model = init_phi({"name": "SIRENPos", "coords_channel": 3,
                      "data_channel": 1, "features": 16, "layers": 4,
                      "w0": 20, "T": [2.0, 3.0, 2.0]})
    params = model.init(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (300, 3),
                                minval=-1.0, maxval=1.0)
    ref = model.apply(params, coords)
    fused = ps.make_fused_apply(model, interpret=True, tile=256)
    got = fused(params, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
