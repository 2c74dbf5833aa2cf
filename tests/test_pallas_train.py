"""Fused train-step gradient kernel (ops/pallas_train.py) vs XLA autodiff.

Runs in interpret mode on CPU; on hardware the same kernel was verified
against the XLA path at sin-ulp tolerances.  The comparison target is the
exact loss used by train/fit.run_segment (train/loss.py, reference
main.py:171-197), including the weight_thres override and per-voxel
weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.models.phi import init_phi
from brief_pytorch_tpu.ops import pallas_siren as ps
from brief_pytorch_tpu.ops import pallas_train as pt
from brief_pytorch_tpu.train.loss import make_loss

pytestmark = pytest.mark.skipif(not pt._HAS_PALLAS, reason="no pallas")


def _setup(name="SIREN", features=24, layers=4, n=700, c_out=1, seed=0,
           **extra):
    model = init_phi({"name": name, "coords_channel": 3,
                      "data_channel": c_out, "features": features,
                      "layers": layers, "w0": 20, **extra})
    params = model.init(jax.random.PRNGKey(seed))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    coords = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    values = jax.random.uniform(k2, (n, c_out))
    weights = 1.0 + jax.random.uniform(k3, (n, c_out))
    return model, params, coords, values, weights


def _xla_loss_and_grads(model, params, coords, values, weights, loss_name,
                        beta, thres):
    loss_fn = make_loss(loss_name, beta)

    def f(p):
        pred = model.apply(p, coords)
        return loss_fn(values, pred, weights, thres)

    loss, grads = jax.value_and_grad(f)(params)
    return loss, grads


@pytest.mark.parametrize("loss_name,thres", [
    ("datal2", None),
    ("datal2", 0.7),
    ("datasmoothl1", None),
    ("datasmoothl1", 0.7),
])
def test_fused_grads_match_xla(loss_name, thres):
    model, params, coords, values, weights = _setup()
    acts = ps.chain_layer_specs(model.spec)
    ref_loss, ref_grads = _xla_loss_and_grads(
        model, params, coords, values, weights, loss_name, 0.01, thres)
    loss, grads = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name=loss_name, beta=0.01, weight_thres=thres, tile=256,
        interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for l, (g, rg) in enumerate(zip(grads["layers"], ref_grads["layers"])):
        np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(rg["w"]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"dW layer {l}")
        np.testing.assert_allclose(np.asarray(g["b"]), np.asarray(rg["b"]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"db layer {l}")


def test_fused_grads_padding_tail():
    """N=300 with tile=256 pads the last tile; pads must not leak into the
    loss or gradients (weight_thres would give padding weight 1)."""
    model, params, coords, values, weights = _setup(n=300)
    acts = ps.chain_layer_specs(model.spec)
    ref_loss, ref_grads = _xla_loss_and_grads(
        model, params, coords, values, weights, "datal2", 0.01, 0.5)
    loss, grads = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datal2", weight_thres=0.5, tile=256, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for g, rg in zip(grads["layers"], ref_grads["layers"]):
        np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(rg["w"]),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("name,extra", [
    ("SIRENFT", {"ft": 4}),
    ("SIREN_RELU", {}),
    ("SIREN_SIGMOID", {}),
    # output_act: the chain ends in an activation, whose derivative must
    # chain into dW_L/db_L (regression: the kernel once skipped it)
    ("SIREN", {"output_act": True}),
    ("SIREN_SIGMOID", {"output_act": True}),
])
def test_fused_grads_other_chains(name, extra):
    model, params, coords, values, weights = _setup(name=name, **extra)
    if not pt.supports_training(model, "datal2"):
        pytest.skip(f"{name} not a plain chain")
    acts = ps.chain_layer_specs(model.spec)
    ref_loss, ref_grads = _xla_loss_and_grads(
        model, params, coords, values, weights, "datal2", 0.01, None)
    loss, grads = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datal2", tile=256, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for g, rg in zip(grads["layers"], ref_grads["layers"]):
        np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(rg["w"]),
                                   atol=1e-5, rtol=1e-4)


def test_supports_training():
    model, *_ = _setup()
    assert pt.supports_training(model, "datal2")
    assert not pt.supports_training(model, "nosuchloss")
    nerf = init_phi({"name": "NeRF", "coords_channel": 3,
                     "data_channel": 1, "features": 16, "layers": 4})
    assert not pt.supports_training(nerf, "datal2")


def test_run_segment_fused_matches_xla_path():
    """run_segment(fused="interpret") trains identically (same PRNG keys ->
    same batches) to the XLA path within float tolerance."""
    import numpy as np
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer
    from brief_pytorch_tpu.train.samplers import RandomPointSampler

    model, params, *_ = _setup(features=16, layers=4)
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})
    sampler = RandomPointSampler((8, 8, 8), "-1,1", 256)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((512, 1)).astype(np.float32))
    wt = jnp.ones_like(data)
    kw = dict(weight_thres=0.9, model=model, sampler=sampler, tx=tx,
              loss_name="datal2", beta=0.01, n_steps=5, half=False)

    p1, _, l1 = run_segment(jax.tree.map(jnp.copy, params), tx.init(params),
                            data, wt, jax.random.PRNGKey(7), fused=False,
                            **kw)
    p2, _, l2 = run_segment(jax.tree.map(jnp.copy, params), tx.init(params),
                            data, wt, jax.random.PRNGKey(7),
                            fused="interpret", **kw)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
    for a, b in zip(p1["layers"], p2["layers"]):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                   atol=1e-5)


def test_fused_grads_sirenpos_pre_encode_match_xla():
    """SIRENPos runs the fused kernel after its param-free coordinate warp
    (applied outside the kernel); gradients must match the XLA path."""
    model, params, coords, values, weights = _setup("SIRENPos",
                                                    T=[2.0, 3.0, 2.0])
    acts = ps.chain_layer_specs(model.spec)
    assert pt.supports_training(model, "datal2")
    ref_loss, ref_grads = _xla_loss_and_grads(
        model, params, coords, values, weights, "datal2", 0.01, None)
    pre = ps.make_pre_encode(model.spec)
    loss, grads = pt.fused_train_grads(
        params["layers"], pre(coords).T, values.T, weights.T, acts,
        loss_name="datal2", beta=0.01, tile=256, interpret=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for l, (g, rg) in enumerate(zip(grads["layers"], ref_grads["layers"])):
        np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(rg["w"]),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g["b"]), np.asarray(rg["b"]),
                                   atol=1e-5, rtol=1e-4)
