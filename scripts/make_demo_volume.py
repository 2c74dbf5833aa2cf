"""Deterministic synthetic demo volumes for the DivideTask demo configs.

The reference's demo volumes (hipct / neuron / vessel, reference
opt/DivideTask/*.yaml) are git-LFS blobs absent from the snapshot, so a
synthetic vessel-like volume stands in (RESULTS.md "Demo configs at
scale"): random bright tubes (random 3-D line segments swept with a
Gaussian radial profile) over a dim noisy background, uint16,
64x512x512 (40.7 MB) — enough structure for adaptive partition + INR
fitting to behave like the real biomedical demos.

Run from the repo root:  python scripts/make_demo_volume.py
Writes dataset/example/{hipct,vessel,neuron}-0_64-0_512-0_512.tif
(same seed -> byte-identical regeneration).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (64, 512, 512)
N_TUBES = 60


def make_volume(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    d, h, w = SHAPE
    vol = rng.normal(1500.0, 300.0, SHAPE).astype(np.float32)  # background

    for _ in range(N_TUBES):
        p0 = rng.uniform([0, 0, 0], [d, h, w]).astype(np.float32)
        p1 = p0 + rng.normal(0, [20, 160, 160]).astype(np.float32)
        radius = float(rng.uniform(1.5, 6.0))
        brightness = float(rng.uniform(15000, 55000))
        # evaluate only inside the tube's padded bounding box (the
        # Gaussian profile is ~0 beyond 4 radii) — full-volume evaluation
        # of 60 tubes is ~10^10 flops and needlessly slow
        pad = 4.0 * radius
        lo = np.maximum(np.floor(np.minimum(p0, p1) - pad), 0).astype(int)
        hi = np.minimum(np.ceil(np.maximum(p0, p1) + pad) + 1,
                        [d, h, w]).astype(int)
        if np.any(lo >= hi):
            continue
        zz = np.arange(lo[0], hi[0], dtype=np.float32)[:, None, None]
        yy = np.arange(lo[1], hi[1], dtype=np.float32)[None, :, None]
        xx = np.arange(lo[2], hi[2], dtype=np.float32)[None, None, :]
        v = p1 - p0
        vv = float(v @ v) + 1e-6
        pz, py, px = zz - p0[0], yy - p0[1], xx - p0[2]
        t = np.clip((pz * v[0] + py * v[1] + px * v[2]) / vv, 0.0, 1.0)
        dz = pz - t * v[0]
        dy = py - t * v[1]
        dx = px - t * v[2]
        dist2 = dz * dz + dy * dy + dx * dx
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] += \
            brightness * np.exp(-dist2 / (2.0 * radius * radius))

    return np.clip(vol, 0, 65535).astype(np.uint16)


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "dataset", "example")
    os.makedirs(outdir, exist_ok=True)
    from brief_pytorch_tpu.io.image import save_img
    # filenames must match the reference configs' data_path exactly
    # (opt/DivideTask/*.yaml — note "neurons", plural, neuron.yaml:6)
    for name, seed in (("hipct", 7), ("vessel", 11), ("neurons", 13)):
        path = os.path.join(outdir, f"{name}-0_64-0_512-0_512.tif")
        if os.path.exists(path):
            print("exists:", path)
            continue
        vol = make_volume(seed)[..., None]
        save_img(path, vol)
        print(f"wrote {path}  ({os.path.getsize(path) / 1e6:.1f} MB, "
              f"mean {vol.mean():.0f}, max {vol.max()})")


if __name__ == "__main__":
    main()
