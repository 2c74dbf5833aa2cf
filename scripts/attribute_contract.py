"""Attribute the contract bench's step time (VERDICT r3 item 1).

The contract hot loop (bench.py: SIREN f=22 L=5, full-volume 262,144-coord
batches, Adamax) measured 151M coords/s on a v5e = 9.9% of bench.py's HBM
roofline.  This script times controlled variants of the step ON THE CHIP to
split the 1.73 ms/step between:

  * activation LAYOUT: (N, f) keeps f=22 on the 128-lane minor dim, so every
    materialized activation/residual pads 22 -> 128 lanes (5.8x HBM bytes);
    the transposed (f, N) chain pads only 22 -> 24 sublanes (1.09x)
  * transcendentals: sine forward + cosine backward on the VPU
  * optimizer/scan overhead: Adamax update + loop structure
  * achievable HBM bandwidth: a pure streaming scan as the calibration bar

Run on TPU from the repo cwd (no PYTHONPATH override):
  python scripts/attribute_contract.py [--steps 300]
Prints one JSON line per variant.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N = 262144          # contract coords/step (64^3 full volume)
F = 22              # contract features
SHAPE = (64, 64, 64)
W0 = 20.0


def _coords_nf(dtype=jnp.float32):
    """(N, 3) grid coords in [-1, 1], built on device (like the sampler)."""
    idx = jnp.arange(N)
    d = idx // (64 * 64)
    h = (idx // 64) % 64
    w = idx % 64
    ax = [d, h, w]
    return jnp.stack([2.0 * a.astype(dtype) / (s - 1) - 1.0
                      for a, s in zip(ax, SHAPE)], axis=-1)


def make_params(key):
    dims = [(3, F)] + [(F, F)] * 3 + [(F, 1)]
    layers = []
    for i, (fi, fo) in enumerate(dims):
        k1, k2, key = jax.random.split(key, 3)
        bound = (1.0 / fi) if i == 0 else (np.sqrt(6.0 / fi) / W0)
        layers.append({
            "w": jax.random.uniform(k1, (fi, fo), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (fo,), jnp.float32, -bound, bound)})
    return layers


_PI = 3.141592653589793
# degree-7 odd minimax for sin on [-pi/2, pi/2] (max err ~6e-7, within the
# 2e-5 parity tolerance); one fewer madd pair than the shipped degree-9
_S7 = (9.99999664e-01, -1.66656598e-01, 8.30962843e-03, -1.84599000e-04)
# pi split exactly representable in f32 (Cody-Waite for the pi-period form)
_P1 = 3.140625
_P2 = 9.67653589793e-4


def _sin7(x):
    """Same reduction as fast_sin, degree-7 polynomial."""
    k = jnp.round(x * 0.15915494309189535)
    r = x - k * 6.28125 - k * 1.9353071795864769e-3
    r = jnp.where(r > _PI / 2, _PI - r, r)
    r = jnp.where(r < -_PI / 2, -_PI - r, r)
    r2 = r * r
    p = _S7[3]
    p = p * r2 + _S7[2]
    p = p * r2 + _S7[1]
    p = p * r2 + _S7[0]
    return r * p


def _sin_sign(x):
    """pi-period reduction with a (-1)^k sign instead of the two
    fold-selects: sin(x) = (-1)^k sin(x - k pi), r in [-pi/2, pi/2]."""
    k = jnp.round(x * (1.0 / _PI))
    r = x - k * _P1 - k * _P2
    # (-1)^k without integer ops: k is an exact small float
    sign = 1.0 - 2.0 * jnp.abs(k - 2.0 * jnp.round(k * 0.5))
    r2 = r * r
    p = _S7[3]
    p = p * r2 + _S7[2]
    p = p * r2 + _S7[1]
    p = p * r2 + _S7[0]
    return sign * r * p


def chain(params, x, *, layout: str, act: str):
    """x: (N,3) for layout 'nf', (3,N) for 'fn'."""
    from brief_pytorch_tpu.ops.fast_math import fast_sin
    h = x
    for i, l in enumerate(params):
        if layout == "nf":
            z = jnp.dot(h, l["w"], preferred_element_type=jnp.float32) + l["b"]
        else:
            z = (jnp.dot(l["w"].T, h, preferred_element_type=jnp.float32)
                 + l["b"][:, None])
        if i < len(params) - 1:
            if act == "sine":
                h = jnp.sin(W0 * z)
            elif act == "fast":
                h = fast_sin(W0 * z)
            elif act == "fast7":
                h = _sin7(W0 * z)
            elif act == "fastsign":
                h = _sin_sign(W0 * z)
            else:
                h = z * 1.0001
        else:
            h = z
    return h


def timed(fn, reps=2):
    out = fn(0)
    np.asarray(out)  # sync (block_until_ready is a no-op over the tunnel)
    dt = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(1 + r)
        np.asarray(out)
        dt = min(dt, time.perf_counter() - t0)
    return dt


def bench_variant(name, *, layout, act, mode, n_steps, data, extras=None,
                  flat_opt=False):
    params = make_params(jax.random.PRNGKey(0))
    tx = optax.adamax(1e-3)
    if flat_opt:
        # one fused elementwise update over a single raveled vector instead
        # of ~60 tiny per-tensor ops (bit-identical math)
        tx = optax.flatten(tx)
    opt_state = tx.init(params)
    vals = data.reshape(-1, 1) if layout == "nf" else data.reshape(1, -1)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1))
    def run(params, opt_state, key, *, n):
        def step(carry, k):
            params, opt_state = carry
            coords = _coords_nf()
            if layout == "fn":
                coords = coords.T

            def loss_f(p):
                pred = chain(p, coords, layout=layout, act=act)
                return jnp.mean((pred - vals) ** 2)

            if mode == "fwd":
                loss = loss_f(params)
                return (params, opt_state), loss
            loss, grads = jax.value_and_grad(loss_f)(params)
            if mode == "grad":
                # fold the grads into the loss so nothing is dead code
                gs = sum(jnp.sum(g["w"]) for g in grads) * 1e-20
                return (params, opt_state), loss + gs
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys, unroll=min(4, n))
        return params, opt_state, losses

    state = {"p": params, "o": opt_state}

    def go(seed):
        state["p"], state["o"], losses = run(state["p"], state["o"],
                                             jax.random.PRNGKey(seed),
                                             n=n_steps)
        return losses

    dt = timed(go)
    cps = n_steps * N / dt
    rec = {"variant": name, "layout": layout, "act": act, "mode": mode,
           "ms_per_step": round(dt / n_steps * 1e3, 4),
           "coords_per_sec": round(cps / 1e6, 1), **(extras or {})}
    print(json.dumps(rec), flush=True)
    return dt / n_steps


def bench_streaming(n_iters=200):
    """Achievable HBM bandwidth bar: scanned in-place-ish saxpy over an
    array the size of ONE lane-padded activation (262144 x 128 f32)."""
    x = jnp.zeros((N, 128), jnp.float32)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def run(x, *, n):
        def step(x, _):
            return x * 1.0000001 + 1e-9, ()
        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    state = {"x": x}

    def go(_):
        state["x"] = run(state["x"], n=n_iters)
        return state["x"][:1, :1]

    dt = timed(go)
    byts = 2 * N * 128 * 4  # read + write per iter
    bw = n_iters * byts / dt
    print(json.dumps({"variant": "streaming_saxpy",
                      "bytes_per_iter": byts,
                      "achieved_GBps": round(bw / 1e9, 1)}), flush=True)
    return bw


def bench_sine_rate(which="fast", n_iters=200, par_k=16):
    """Peak transcendental rate (compute-bound): par_k INDEPENDENT sine
    evaluations per element per scan iteration over a VMEM-resident 1 MB
    tile — independence gives the VPU full ILP (a dependent chain measures
    pipeline latency, ~4x below throughput — measured), and the tiny tile
    amortizes HBM to nothing.  This is the hardware ceiling bench.py's
    fraction_of_sol uses: a sine-MLP training step cannot beat the rate at
    which the VPU evaluates its (independent, batched) sines."""
    from brief_pytorch_tpu.ops.fast_math import fast_sin
    f = fast_sin if which == "fast" else jnp.sin
    x = jnp.linspace(-3.0, 3.0, 256 * 1024).reshape(256, 1024)
    scales = [1.0 + 0.37 * i for i in range(par_k)]   # no CSE between evals

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def run(x, *, n):
        def step(x, _):
            acc = x * 1e-6
            for s in scales:
                acc = acc + f(x * s)
            return acc, ()
        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    state = {"x": x}

    def go(_):
        state["x"] = run(state["x"], n=n_iters)
        return state["x"][:1, :1]

    dt = timed(go)
    rate = n_iters * par_k * x.size / dt
    print(json.dumps({"variant": f"sine_rate_{which}",
                      "evals_per_sec_G": round(rate / 1e9, 2)}), flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--quick", action="store_true",
                    help="only the fast-sine full step + rate calibrations")
    args = ap.parse_args()
    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)

    data = jnp.asarray(np.random.default_rng(0)
                       .uniform(0, 1, SHAPE).astype(np.float32))

    # informative only: microbenched per-eval rates are NOT a valid step
    # ceiling (dependent chains measure latency; even independent-eval
    # scans read ~2x below the effective in-step rate because backward
    # reuses forward residuals) — see RESULTS.md "Attribution"
    bench_sine_rate("fast")
    bench_sine_rate("xla")
    bench_variant("nf_full_fastsine", layout="nf", act="fast",
                  mode="full", n_steps=args.steps, data=data)
    bench_variant("nf_full_fastsine_flatopt", layout="nf", act="fast",
                  mode="full", n_steps=args.steps, data=data, flat_opt=True)
    bench_variant("nf_full_nosine", layout="nf", act="ident",
                  mode="full", n_steps=args.steps, data=data)
    bench_variant("nf_full_nosine_flatopt", layout="nf", act="ident",
                  mode="full", n_steps=args.steps, data=data, flat_opt=True)
    # r4: cheaper sine formulations (degree-7 poly; sign-based reduction)
    bench_variant("nf_full_sin7", layout="nf", act="fast7",
                  mode="full", n_steps=args.steps, data=data)
    bench_variant("nf_full_sinsign", layout="nf", act="fastsign",
                  mode="full", n_steps=args.steps, data=data)
    if args.quick:
        return
    bench_streaming()
    for layout in ("nf", "fn"):
        for mode in ("full", "grad", "fwd"):
            bench_variant(f"{layout}_{mode}_sine", layout=layout, act="sine",
                          mode=mode, n_steps=args.steps, data=data)
        if layout == "fn":
            bench_variant(f"{layout}_full_nosine", layout=layout, act="ident",
                          mode="full", n_steps=args.steps, data=data)


if __name__ == "__main__":
    main()
