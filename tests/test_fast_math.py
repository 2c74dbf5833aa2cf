"""ops/fast_math: the fast float32 sine that de-bottlenecks the training
step (87% of the contract step was XLA's heavyweight sin/cos — measured,
scripts/attribute_contract.py / RESULTS.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.ops.fast_math import fast_cos, fast_sin


@pytest.mark.parametrize("lo,hi,bound", [
    (-40, 40, 5e-6),        # SIREN activation range (w0 * bounded preact)
    (-200, 200, 2e-5),      # FFN/NeRF encoder projections
    (-2000, 2000, 1e-4),    # validity edge of the Cody-Waite reduction
])
def test_fast_sin_accuracy(lo, hi, bound):
    x = np.random.default_rng(0).uniform(lo, hi, 1_000_000).astype(np.float32)
    got = np.asarray(fast_sin(jnp.asarray(x)), np.float64)
    want = np.sin(x.astype(np.float64))
    assert np.abs(got - want).max() <= bound


def test_fast_cos_accuracy():
    x = np.random.default_rng(1).uniform(-40, 40, 500_000).astype(np.float32)
    got = np.asarray(fast_cos(jnp.asarray(x)), np.float64)
    assert np.abs(got - np.cos(x.astype(np.float64))).max() <= 5e-6


def test_float64_falls_back_to_exact():
    with jax.enable_x64():
        x = jnp.linspace(-30.0, 30.0, 10001, dtype=jnp.float64)
        np.testing.assert_array_equal(np.asarray(fast_sin(x)),
                                      np.asarray(jnp.sin(x)))


def test_gradient_matches_cosine():
    """Reverse-mode through the polynomial is a ~1e-5-accurate cosine —
    the backward pass of every sine activation."""
    x = np.random.default_rng(2).uniform(-40, 40, 100_000).astype(np.float32)
    g = np.asarray(jax.vmap(jax.grad(fast_sin))(jnp.asarray(x)), np.float64)
    assert np.abs(g - np.cos(x.astype(np.float64))).max() <= 3e-5


def test_bfloat16_passthrough():
    x = jnp.asarray(np.linspace(-10, 10, 4096), jnp.bfloat16)
    got = fast_sin(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.sin(np.asarray(x, np.float32)), atol=0.02)
