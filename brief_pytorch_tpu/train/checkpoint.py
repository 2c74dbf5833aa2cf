"""Training-state checkpointing: true resume for preempted runs.

The reference's checkpoints are *outputs* (saved weights + metrics at
steps from parse_checkpoints, /root/reference/main.py:404-453); there is
no optimizer-state resume — a preempted 80k-step run restarts from zero
(warm start via init_net_path reloads weights only, main.py:345-354).
This module goes beyond that: at every checkpoint the trainers write the
FULL training state — params, optimizer state (Adamax moments and the
schedule's step count), the threaded PRNG key(s), and the step — so
`Compress.resume: <path>` continues a run exactly where it stopped.
Because segments are keyed by the threaded PRNG key and checkpoint
boundaries delimit segments, a resumed run is **bit-identical** to an
uninterrupted one with the same checkpoint grid (tests/test_resume.py
asserts exact equality, for both the single-volume trainer and the
block fleet).

Format: one .npz of the flattened pytree leaves plus a JSON fingerprint
of the config that produced it.  Leaves are restored against TEMPLATE
pytrees rebuilt by the same code path (model.init / tx.init), so no
treedef serialization is needed; shape or fingerprint mismatches fail
loudly instead of training from garbage.  Writes are atomic (tmp +
rename): a preemption mid-write leaves the previous state intact.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(arrs: Dict[str, np.ndarray], prefix: str, tree) -> None:
    """Flatten `tree`'s leaves into arrs as {prefix}{i} host arrays.
    Leaves must be host-fetchable (fully-addressable jax arrays or numpy);
    multi-process callers all-gather sharded trees first."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arrs[f"{prefix}{i}"] = np.asarray(leaf)


def unpack_tree(z, prefix: str, template, what: str = "tree"):
    """Rebuild a pytree structured like `template` from {prefix}{i} arrays,
    validating leaf shapes (a mismatch means the state was written under a
    different config — fail loudly, never train from garbage)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new = []
    for i, tmpl in enumerate(leaves):
        arr = z[f"{prefix}{i}"]
        tshape = tuple(np.shape(tmpl))
        if tuple(arr.shape) != tshape:
            raise ValueError(
                f"training state {what} leaf {prefix}{i} has shape "
                f"{arr.shape}, expected {tshape}")
        # dtype via the attribute — np.asarray(tmpl) on a device leaf
        # would force a device->host transfer just to read metadata
        dt = getattr(tmpl, "dtype", None)
        new.append(jnp.asarray(arr, dtype=dt if dt is not None
                               else np.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, new)


def fingerprint_bytes(fingerprint: Dict) -> np.ndarray:
    return np.frombuffer(
        json.dumps(fingerprint, sort_keys=True).encode(), np.uint8)


def check_fingerprint(z, fingerprint: Dict, path: str) -> None:
    stored = json.loads(bytes(z["fingerprint"].tobytes()).decode())
    if stored != fingerprint:
        raise ValueError(
            f"training state {path} was written under a different "
            f"config:\n  stored:  {stored}\n  current: {fingerprint}")


def atomic_savez(path: str, arrs: Dict[str, np.ndarray]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def resolve_trainstate(path: str, default_name: str = "trainstate.npz"
                       ) -> str:
    """Accept a state file or a run dir containing one."""
    if os.path.isdir(path):
        path = os.path.join(path, default_name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no training state at {path}")
    return path


def save_trainstate(path: str, params, opt_state, key, step: int,
                    fingerprint: Dict) -> None:
    """Atomically write a single-trainer state (NFGR.compress)."""
    arrs: Dict[str, np.ndarray] = {}
    pack_tree(arrs, "p", params)
    pack_tree(arrs, "o", opt_state)
    arrs["key"] = np.asarray(key)
    arrs["step"] = np.asarray(int(step))
    arrs["fingerprint"] = fingerprint_bytes(fingerprint)
    atomic_savez(path, arrs)


def load_trainstate(path: str, params_template, opt_state_template,
                    fingerprint: Dict) -> Tuple[object, object, object, int]:
    """Load (params, opt_state, key, step) against template pytrees.

    The templates come from re-running the exact init code path (same
    config), so only leaf VALUES are swapped in.  The stored fingerprint
    must match the caller's — resuming under a different model/optimizer
    config would silently corrupt training otherwise."""
    with np.load(path) as z:
        check_fingerprint(z, fingerprint, path)
        params = unpack_tree(z, "p", params_template, "params")
        opt_state = unpack_tree(z, "o", opt_state_template, "opt_state")
        key = jnp.asarray(z["key"])
        step = int(z["step"])
    return params, opt_state, key, step
