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


def test_fused_grads_unit_masks_exact_padding_invariance():
    """The fleet form (block_trainer padded widths): zero-extending a
    chain's widths and passing the validity masks as unit_masks must leave
    the loss EXACTLY unchanged and give padded units EXACTLY zero
    gradient — including through a sigmoid hidden layer (sigmoid(0)=0.5 is
    the case an unmasked kernel cannot pad).  Valid-unit gradients are
    checked to ~1 ulp: the added terms are exact 0.0s, but a
    differently-SHAPED dot may reduce in a different order on the
    interpret (XLA CPU) backend."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    C, N, F, FP = 3, 700, 10, 16
    acts = (("sine", 25.0), ("sigmoid", 1.0), ("none", 1.0))
    lay = [
        {"w": jax.random.normal(ks[0], (C, F)) * 0.3,
         "b": jax.random.normal(ks[3], (F,)) * 0.1},
        {"w": jax.random.normal(ks[1], (F, F)) * 0.3,
         "b": jax.random.normal(ks[4], (F,)) * 0.1},
        {"w": jax.random.normal(ks[2], (F, 1)) * 0.3, "b": jnp.zeros((1,))},
    ]

    def padw(w, fi, fo):
        return jnp.zeros((fi, fo), jnp.float32).at[
            :w.shape[0], :w.shape[1]].set(w)

    layp = [
        {"w": padw(lay[0]["w"], C, FP), "b": jnp.pad(lay[0]["b"], (0, FP - F))},
        {"w": padw(lay[1]["w"], FP, FP), "b": jnp.pad(lay[1]["b"], (0, FP - F))},
        {"w": padw(lay[2]["w"], FP, 1), "b": lay[2]["b"]},
    ]
    mask = jnp.concatenate([jnp.ones(F), jnp.zeros(FP - F)])
    coords = jax.random.uniform(ks[5], (C, N), minval=-1, maxval=1)
    values = jax.random.uniform(ks[6], (1, N))
    weights = 0.5 + jax.random.uniform(ks[7], (1, N))

    l0, g0 = pt.fused_train_grads(lay, coords, values, weights, acts,
                                  loss_name="datal2", tile=256,
                                  interpret=True)
    l1, g1 = pt.fused_train_grads(layp, coords, values, weights, acts,
                                  loss_name="datal2", tile=256,
                                  interpret=True,
                                  unit_masks=[mask, mask, None])
    assert float(l0) == float(l1)
    for li, (gu, gp) in enumerate(zip(g0["layers"], g1["layers"])):
        fi, fo = gu["w"].shape
        gpw = np.asarray(gp["w"])
        np.testing.assert_allclose(gpw[:fi, :fo], np.asarray(gu["w"]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"valid dW layer {li}")
        np.testing.assert_allclose(np.asarray(gp["b"])[:fo],
                                   np.asarray(gu["b"]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"valid db layer {li}")
        assert np.abs(gpw[fi:, :]).max(initial=0.0) == 0.0, li
        assert np.abs(gpw[:, fo:]).max(initial=0.0) == 0.0, li
        assert np.abs(np.asarray(gp["b"])[fo:]).max(initial=0.0) == 0.0, li


def test_fused_grads_dynamic_thres_matches_static():
    """The fleet's per-block traced weight_thres input must equal the
    static-float form exactly, and -inf (the fleet's 'disabled' encoding,
    block_trainer._prepare_bucket) must equal no-threshold exactly."""
    model, params, coords, values, weights = _setup()
    acts = ps.chain_layer_specs(model.spec)
    l_s, g_s = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datasmoothl1", weight_thres=0.4, tile=256, interpret=True)
    l_d, g_d = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datasmoothl1", dynamic_thres=jnp.float32(0.4), tile=256,
        interpret=True)
    assert float(l_s) == float(l_d)
    for gs, gd in zip(g_s["layers"], g_d["layers"]):
        np.testing.assert_array_equal(np.asarray(gs["w"]), np.asarray(gd["w"]))
    l_off, _ = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datasmoothl1", tile=256, interpret=True)
    l_inf, _ = pt.fused_train_grads(
        params["layers"], coords.T, values.T, weights.T, acts,
        loss_name="datasmoothl1", dynamic_thres=jnp.float32(-np.inf),
        tile=256, interpret=True)
    assert float(l_off) == float(l_inf)


def test_fleet_fused_segment_matches_xla_path():
    """run_block_segment(fused="interpret") — the vmapped fused kernel with
    width masks and per-block traced thres — trains a mixed-width SIREN
    bucket to the same losses/params as the XLA stacked_apply path (same
    keys -> same draws), and padded units stay exactly zero."""
    from brief_pytorch_tpu.parallel.block_trainer import (
        build_stacked, fleet_fused_supported, run_block_segment)
    from brief_pytorch_tpu.train.optim import make_optimizer

    feats = [8, 12, 10]
    models = [init_phi({"name": "SIREN", "coords_channel": 3,
                        "data_channel": 1, "features": f, "layers": 3,
                        "w0": 25, "res": False}) for f in feats]
    spec, params, masks, enc = build_stacked(models, jax.random.PRNGKey(7))
    assert fleet_fused_supported(spec, "datal2", "randompoint", False)
    assert not fleet_fused_supported(spec, "datal2", "fullbatch", False)

    rng = np.random.default_rng(0)
    B, V = len(feats), 6 * 6 * 6
    data = jnp.asarray(rng.uniform(0, 1, (B, V, 1)).astype(np.float32))
    valid = jnp.full((B,), V, jnp.int32)
    shapes = jnp.tile(jnp.asarray([[6, 6, 6]], jnp.int32), (B, 1))
    thres = jnp.asarray([0.4, -np.inf, 0.6], jnp.float32)
    tx = make_optimizer("Adamax", 1e-3, {"name": "none"})
    opt0 = jax.vmap(tx.init)(params)
    kw = dict(spec=spec, tx=tx, loss_name="datal2", beta=0.01,
              use_thres=True, n_steps=10, sample_size=256,
              coords_mode="-1,1", half=False, sampler="randompoint")
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    pa, _, la = run_block_segment(copy(params), copy(opt0), masks, enc,
                                  data, None, valid, shapes, thres,
                                  jax.random.PRNGKey(3), fused=False, **kw)
    pb, _, lb = run_block_segment(copy(params), copy(opt0), masks, enc,
                                  data, None, valid, shapes, thres,
                                  jax.random.PRNGKey(3), fused="interpret",
                                  **kw)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # block 0 (true width 8) padded to 12: its padding never moves
    w1 = np.asarray(pb[1]["w"])
    assert np.abs(w1[0, 8:, :]).max() == 0.0
    assert np.abs(w1[0, :, 8:]).max() == 0.0
