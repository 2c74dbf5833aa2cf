"""Micro-probe: which contiguous-run gather formulation is fastest on-chip.

The round-3 vectorised sampler (train/samplers.py vector_len=L) was built
during a chip outage on the hypothesis that sample_size single-voxel
gathers bound the narrow randompoint class; bench --all on the real chip
measured the shipped vmapped-dynamic_slice form at ~4x SLOWER than the
plain flat gather.  This probe times the candidate formulations in
isolation (gather only, no training step) so the sampler can ship the
fastest one:

  a) flat      — data[idx] with sample_size iid indices (reference semantics)
  b) dynslice  — vmapped lax.dynamic_slice over unaligned run starts (shipped r3)
  c) aligned   — starts forced to multiples of L; gather of (L*c)-wide rows
                 from a (pop//L, L*c) reshape (one wide row load per run)
  d) take_rows — same aligned rows via jnp.take (sanity: identical lowering?)

Run on TPU from the repo root: python scripts/gather_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

POP = 256 ** 3          # contract-fixture scale population
C = 1
N = 100_000             # narrow-class sample_size
L = 32
REPS = 30


def timeit(fn, key):
    out = fn(key)
    jax.block_until_ready(out)
    np.asarray(out[:4])                     # force a (tiny) host sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(REPS):
            # fresh key per dispatch — training folds a new key each step,
            # so reusing one would flatter index-reuse-friendly formulations
            out = fn(jax.random.fold_in(key, i))
        np.asarray(out[:4])
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    key = jax.random.PRNGKey(0)
    data = jax.device_put(jnp.arange(POP * C, dtype=jnp.float32)
                          .reshape(POP, C))
    n_runs = N // L

    @jax.jit
    def flat(k):
        idx = jax.random.randint(k, (N,), 0, POP)
        return data[idx].reshape(-1)

    @jax.jit
    def dynslice(k):
        starts = jax.random.randint(k, (n_runs,), 0, POP - L + 1)
        return jax.vmap(lambda s: jax.lax.dynamic_slice(data, (s, 0), (L, C))
                        )(starts).reshape(-1)

    rows = data.reshape(POP // L, L * C)

    @jax.jit
    def aligned(k):
        r = jax.random.randint(k, (n_runs,), 0, POP // L)
        return rows[r].reshape(-1)

    @jax.jit
    def take_rows(k):
        r = jax.random.randint(k, (n_runs,), 0, POP // L)
        return jnp.take(rows, r, axis=0).reshape(-1)

    @jax.jit
    def expand(k):
        # unaligned runs expressed as a plain flat gather of expanded
        # contiguous indices — the only form available to the fleet path,
        # whose strides are traced (block_trainer.vector_run_starts)
        starts = jax.random.randint(k, (n_runs,), 0, POP - L + 1)
        idx = (starts[:, None] + jnp.arange(L)[None, :]).reshape(-1)
        return data[idx].reshape(-1)

    for name, fn in [("flat", flat), ("dynslice", dynslice),
                     ("aligned", aligned), ("take_rows", take_rows),
                     ("expand", expand)]:
        ms = timeit(fn, key) * 1e3
        print(f"{name:10s} {ms:8.3f} ms/step  "
              f"{N / (ms / 1e3) / 1e6:9.1f} Mvox/s")


if __name__ == "__main__":
    main()
