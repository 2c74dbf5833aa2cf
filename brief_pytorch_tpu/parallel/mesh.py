"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-level GPU scheduler
(utils/TasksManager.py): instead of one OS process per block placed on a GPU
by nvidia-smi polling, blocks become a *sharded array axis* on a
jax.sharding.Mesh — placement is the sharding, retries are superfluous
(SPMD steps are deterministic), and scaling across hosts is
jax.distributed + the same mesh.

Axes convention:
  'blocks' — independent INR blocks (embarrassingly parallel, no collectives)
  'data'   — coordinate-batch axis inside one block (psum grad reduction)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_block_shards: Optional[int] = None,
              n_data_shards: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('blocks', 'data') mesh over the available devices.

    Default: all devices on the block axis (blocks are independent, so ICI
    carries no traffic); reserve 'data' shards only for single-block
    coordinate parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_block_shards is None:
        n_block_shards = n // n_data_shards
    assert n_block_shards * n_data_shards == n, \
        f"{n_block_shards}x{n_data_shards} != {n} devices"
    arr = np.array(devices).reshape(n_block_shards, n_data_shards)
    return Mesh(arr, ("blocks", "data"))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Leading block axis sharded, everything else replicated per shard."""
    return NamedSharding(mesh, P("blocks"))


def block_submesh(mesh: Mesh, start: int, size: int) -> Mesh:
    """A ('blocks', 'data') mesh over `size` consecutive devices of `mesh`
    (blocks-major order).  Programs dispatched onto disjoint sub-meshes run
    CONCURRENTLY (each device executes its own queue), which is how several
    small block buckets share one chip-mesh instead of serialising — the
    TPU analogue of the reference scheduler packing several small-block
    processes onto one GPU at once (utils/TasksManager.py:222-251)."""
    devs = mesh.devices.reshape(-1)[start:start + size]
    return Mesh(np.array(devs).reshape(size, 1), ("blocks", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (batch, ...) array along the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def host_to_global(arr, sharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put.  Multi-process (jax.distributed):
    every process holds the full host value (each host reads the volume
    itself — the reference's shared-filesystem hand-off,
    /root/reference/main.py:547-575) and contributes its addressable
    shards from it."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


_REPLICATE_JIT: dict = {}


def all_addressable(tree, mesh: Mesh):
    """Make every leaf of a (possibly cross-process sharded) pytree fully
    addressable on every process by resharding to replicated — a
    jit-compiled identity whose out_sharding inserts the all-gather over
    ICI.  Single-process trees pass through untouched (their shards are
    already addressable; no copy).

    The jitted identity is memoized per sharding: a fresh closure per call
    would be a jit-cache miss and recompile the all-gather every
    checkpoint (the recompile class CLAUDE.md warns about)."""
    if jax.process_count() == 1:
        return tree
    rep = NamedSharding(mesh, P())
    fn = _REPLICATE_JIT.get(rep)
    if fn is None:
        fn = _REPLICATE_JIT.setdefault(
            rep, jax.jit(lambda t: t, out_shardings=rep))
    return fn(tree)


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed for multi-host meshes.

    With an EXPLICIT coordinator (CLI -coordinator, test workers) failures
    propagate — the user asked for a cluster, silently proceeding
    single-process would train a fraction of the fleet and hang the
    collectives.  Without one, auto-detection is best-effort and a no-op
    when the environment provides no cluster (single-host dev boxes,
    tests)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process environment


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
