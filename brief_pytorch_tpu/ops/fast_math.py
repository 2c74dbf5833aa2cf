"""Fast float32 sine for the INR hot loop.

Why this exists: the contract training step (SIREN f=22, 262,144-coord
full-volume batches) measured 1.83 ms/step on a v5e, and a controlled
ablation (scripts/attribute_contract.py) showed 1.60 ms of it — 87% — is
the sine forward + cosine backward on the VPU.  XLA lowers f32 `sin` with
a Payne-Hanek-grade range reduction that stays correct out to huge
arguments; SIREN activations never leave |x| ≲ 10² (w0=30 times a
bounded pre-activation, reference Networks.py:219-257), so almost all of
that work is wasted.  This implementation:

  * Cody-Waite two-step reduction by 2π (6.28125 is exact in float32,
    the 1.94e-3 tail restores the rest), valid to ~1e-5 absolute for
    |x| ≤ ~2e3 — far beyond any SIREN activation;
  * fold to [-π/2, π/2] (sin(π−r) = sin r);
  * degree-9 odd minimax polynomial (max fit error 3.4e-9; end-to-end
    float32 error ≤ 2e-6 for |x| ≤ 40, ≤ 8e-6 for |x| ≤ 200 — measured,
    see scripts/attribute_contract.py provenance in RESULTS.md).

About 14 VPU ops instead of XLA's ~35, and reverse-mode autodiff flows
through the polynomial (≈8 more ops) instead of a full cosine —
measured ~5x step-time win on the contract bench.

The approximation error (≤1e-5) is three orders of magnitude below the
reference parity tolerance (tests/test_reference_numerics.py atol=2e-5)
and five below bf16 'half' mode's rounding.  float64 inputs (the x64
parity oracle) and explicitly exact callers use jnp.sin via exact=True /
the BRIEF_TPU_EXACT_SINE=1 env override.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_INV_2PI = 0.15915494309189535
_C1 = 6.28125                       # exact in float32
_C2 = 1.9353071795864769e-3        # 2*pi - _C1
_PI = 3.141592653589793
_HALF_PI = 1.5707963267948966
# odd minimax coefficients for sin on [-pi/2, pi/2] (Lawson-reweighted LSQ)
_S0 = 9.99999977e-01
_S1 = -1.66666476e-01
_S2 = 8.33290001e-03
_S3 = -1.98009088e-04
_S4 = 2.59051028e-06

_EXACT = os.environ.get("BRIEF_TPU_EXACT_SINE") == "1"


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) for float32/bfloat16 tensors with |x| ≲ 2e3.

    float64 inputs fall back to jnp.sin (the x64 parity-oracle path needs
    full precision), as does the BRIEF_TPU_EXACT_SINE=1 escape hatch.
    """
    if _EXACT or x.dtype == jnp.float64:
        return jnp.sin(x)
    orig = x.dtype
    if orig != jnp.float32:
        x = x.astype(jnp.float32)
    k = jnp.round(x * _INV_2PI)
    r = x - k * _C1
    r = r - k * _C2                        # r in [-pi, pi]
    r = jnp.where(r > _HALF_PI, _PI - r, r)
    r = jnp.where(r < -_HALF_PI, -_PI - r, r)
    r2 = r * r
    p = _S4
    p = p * r2 + _S3
    p = p * r2 + _S2
    p = p * r2 + _S1
    p = p * r2 + _S0
    out = r * p
    return out if orig == jnp.float32 else out.astype(orig)


def fast_cos(x: jnp.ndarray) -> jnp.ndarray:
    """cos(x) = sin(x + pi/2) through the same fast path."""
    if _EXACT or x.dtype == jnp.float64:
        return jnp.cos(x)
    return fast_sin(x + _HALF_PI)


# even minimax coefficients for cos on [-pi/2, pi/2] (Lawson-reweighted
# LSQ, degree 8; float32-Horner max error 2.0e-7 — measured at fit time)
_K0 = 9.99999953e-01
_K1 = -4.99999054e-01
_K2 = 4.16635848e-02
_K3 = -1.38537053e-03
_K4 = 2.31539532e-05


def fast_sincos(x: jnp.ndarray):
    """(sin(x), cos(x)) sharing ONE Cody-Waite reduction.

    The train-step kernel needs sin(w0*z) in the forward and cos(w0*z)
    for the backward's activation derivative; computing them separately
    pays the 2*pi reduction twice.  This fuses them: one reduction + the
    odd sin polynomial + an even cos polynomial on the same r^2 powers
    (the fold to [-pi/2, pi/2] flips the cos sign: cos(pi-r) = -cos r).
    Same validity domain as fast_sin (|x| <= ~2e3, float32/bf16); float64
    and BRIEF_TPU_EXACT_SINE=1 fall back to exact jnp.sin/cos.
    """
    if _EXACT or x.dtype == jnp.float64:
        return jnp.sin(x), jnp.cos(x)
    orig = x.dtype
    if orig != jnp.float32:
        x = x.astype(jnp.float32)
    k = jnp.round(x * _INV_2PI)
    r = x - k * _C1
    r = r - k * _C2                        # r in [-pi, pi]
    flip = jnp.abs(r) > _HALF_PI           # outer quadrants: cos < 0 side
    r = jnp.where(r > _HALF_PI, _PI - r, r)
    r = jnp.where(r < -_HALF_PI, -_PI - r, r)
    r2 = r * r
    p = _S4
    p = p * r2 + _S3
    p = p * r2 + _S2
    p = p * r2 + _S1
    p = p * r2 + _S0
    s = r * p
    q = _K4
    q = q * r2 + _K3
    q = q * r2 + _K2
    q = q * r2 + _K1
    q = q * r2 + _K0
    c = jnp.where(flip, -q, q)
    if orig != jnp.float32:
        s, c = s.astype(orig), c.astype(orig)
    return s, c


# bound once so A/B scripts can rebind the module-level `fast_sin` name
# without making _sin_cached recurse into itself
_FAST_SIN_IMPL = fast_sin


@jax.custom_vjp
def _sin_cached(x):
    return _FAST_SIN_IMPL(x)


def _sin_cached_fwd(x):
    s, c = fast_sincos(x)
    return s, c


def _sin_cached_bwd(c, g):
    return (g * c,)


_sin_cached.defvjp(_sin_cached_fwd, _sin_cached_bwd)


def fast_sin_cached(x: jnp.ndarray) -> jnp.ndarray:
    """fast_sin whose VJP re-reads a cos residual saved by the forward.

    Plain fast_sin's reverse mode differentiates the polynomial (~14 VPU
    ops re-run in the backward); this variant computes (sin, cos) in the
    forward via fast_sincos's shared reduction and the backward is just
    g * cos — no transcendental work at all.  Same residual footprint
    class as autodiff (one activation-sized tensor), fewer total ops.
    Intended for training hot paths (XLA autodiff of sine chains); the
    exact/float64 escape hatches match fast_sin."""
    if _EXACT or x.dtype == jnp.float64:
        return jnp.sin(x)
    return _sin_cached(x)
