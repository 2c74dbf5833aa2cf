"""Raw per-layer binary weight interchange format.

This is the *compressed payload* format shared with the CUDA sibling of the
reference: a directory of files
    weight-{l}-{out}-{in}   packed little-endian float32, row-major (out, in)
    bias-{l}-{len}          packed little-endian float32
one pair per linear layer of the chain (reference utils/ModelSave.py:8-52).

Our weights live as (in, out) pytrees (MXU-friendly); we transpose on the
way out/in so files stay bit-compatible with the reference/CUDA tools.
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, List

import numpy as np


def save_model(layers: List[Dict[str, np.ndarray]], save_path: str) -> None:
    """Write chain layers [{'w': (in,out), 'b': (out,)}] to a module dir."""
    if os.path.exists(save_path):
        shutil.rmtree(save_path)
    os.makedirs(save_path)
    for l, layer in enumerate(layers):
        w = np.asarray(layer["w"], dtype=np.float32).T  # (out, in) on disk
        b = np.asarray(layer["b"], dtype=np.float32)
        with open(os.path.join(save_path, f"weight-{l}-{w.shape[0]}-{w.shape[1]}"),
                  "wb") as f:
            f.write(np.ascontiguousarray(w).tobytes())
        with open(os.path.join(save_path, f"bias-{l}-{b.shape[0]}"), "wb") as f:
            f.write(np.ascontiguousarray(b).tobytes())


def load_model(model_path: str) -> List[Dict[str, np.ndarray]]:
    """Read a module dir back into [{'w': (in,out), 'b': (out,)}]."""
    weights, biases = {}, {}
    for fname in os.listdir(model_path):
        path = os.path.join(model_path, fname)
        with open(path, "rb") as f:
            raw = f.read()
        if fname.startswith("weight"):
            _, l, s0, s1 = fname.split("-")
            l, s0, s1 = int(l), int(s0), int(s1)
            w = np.frombuffer(raw, dtype="<f4").reshape(s0, s1)
            weights[l] = np.ascontiguousarray(w.T)  # back to (in, out)
        elif fname.startswith("bias"):
            _, l, n = fname.split("-")
            biases[int(l)] = np.frombuffer(raw, dtype="<f4").copy()
    n_layers = max(weights) + 1
    return [{"w": weights[l], "b": biases[l]} for l in range(n_layers)]


def save_phi_module(model, params, module_path: str) -> None:
    """Serialize any φ family's parameters into a module dir.

    Chain families use the raw per-layer binary interchange format above;
    MFN families (no chain structure, reference Networks.py:648-794 — the
    reference's own save_model, utils/ModelSave.py:32-52, cannot serialize
    them either) use an npz container with leaves keyed `p{i}` in
    tree_flatten order, which load_phi_module_npz restores into a
    structurally identical pytree.
    """
    if model.serializable_chain:
        save_model([{k: np.asarray(v) for k, v in l.items()}
                    for l in params["layers"]], module_path)
        if "encoder" in params:
            # FFN's frozen Fourier bvals: decompress can regenerate them
            # bit-exactly only through the torch seed-0 path
            # (models/phi._ffn_bvals); persist them so archives decode
            # correctly in torch-less environments too.  load_model
            # ignores non weight-*/bias-* files, so the raw layout stays
            # reader-compatible.
            np.savez(os.path.join(module_path, "encoder.npz"),
                     **{k: np.asarray(v)
                        for k, v in params["encoder"].items()})
        return
    import jax
    if os.path.exists(module_path):
        shutil.rmtree(module_path)
    os.makedirs(module_path)
    flat, _ = jax.tree_util.tree_flatten(params)
    np.savez(os.path.join(module_path, "params.npz"),
             **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_phi_module_npz(module_path: str, like_params):
    """Load a params.npz module into the structure of `like_params`
    (a freshly initialised pytree of the same architecture)."""
    import jax
    with np.load(os.path.join(module_path, "params.npz")) as z:
        flat, treedef = jax.tree_util.tree_flatten(like_params)
        if len(z.files) != len(flat):
            raise ValueError(
                f"params.npz has {len(z.files)} leaves but the "
                f"architecture expects {len(flat)} — wrong phi config?")
        leaves = [np.asarray(z[f"p{i}"]) for i in range(len(flat))]
        for got, want in zip(leaves, flat):
            if got.shape != want.shape:
                raise ValueError(
                    f"params.npz leaf shape {got.shape} != expected "
                    f"{want.shape} — wrong phi config?")
        return jax.tree_util.tree_unflatten(treedef, leaves)


def copy_dir(old_dir: str, new_dir: str) -> None:
    """Flat file copy (reference utils/ModelSave.py:54-61)."""
    os.makedirs(new_dir, exist_ok=True)
    for fname in os.listdir(old_dir):
        shutil.copy(os.path.join(old_dir, fname), os.path.join(new_dir, fname))
