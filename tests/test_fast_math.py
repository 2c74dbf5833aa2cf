"""ops/fast_math: the fast float32 sine that de-bottlenecks the training
step (87% of the contract step was XLA's heavyweight sin/cos — measured,
scripts/attribute_contract.py / RESULTS.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.ops.fast_math import fast_cos, fast_sin, fast_sincos


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


@pytest.mark.parametrize("lo,hi,bound", [
    (-40, 40, 5e-6),
    (-2000, 2000, 1e-4),
])
def test_fast_sincos_accuracy(lo, hi, bound):
    """One shared reduction yields both sin and cos (the train kernel's
    forward stores the derivative, making its backward transcendental-free)."""
    x = np.random.default_rng(3).uniform(lo, hi, 500_000).astype(np.float32)
    s, c = fast_sincos(jnp.asarray(x))
    xd = x.astype(np.float64)
    assert np.abs(np.asarray(s, np.float64) - np.sin(xd)).max() <= bound
    assert np.abs(np.asarray(c, np.float64) - np.cos(xd)).max() <= bound


def test_fast_sincos_matches_fast_sin():
    """The sin half is the SAME polynomial as fast_sin — bitwise equal."""
    x = jnp.asarray(np.random.default_rng(4).uniform(-200, 200, 100_000),
                    jnp.float32)
    s, _ = fast_sincos(x)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(fast_sin(x)))


def test_fast_sincos_float64_exact():
    with jax.enable_x64():
        x = jnp.linspace(-30.0, 30.0, 10001, dtype=jnp.float64)
        s, c = fast_sincos(x)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(jnp.sin(x)))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(jnp.cos(x)))


def test_fast_sin_cached_value_and_grad():
    """fast_sin_cached: identical primal (same polynomial), cos-residual
    VJP accurate to the fast_sincos cos bound."""
    from brief_pytorch_tpu.ops.fast_math import fast_sin_cached
    x = jnp.asarray(np.random.default_rng(5).uniform(-40, 40, 100_000),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(fast_sin_cached(x)),
                                  np.asarray(fast_sin(x)))
    g = np.asarray(jax.vmap(jax.grad(fast_sin_cached))(x), np.float64)
    xd = np.asarray(x, np.float64)
    assert np.abs(g - np.cos(xd)).max() <= 5e-6
