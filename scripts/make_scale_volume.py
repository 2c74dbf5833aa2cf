"""Generate a 512^3 (134M voxel) brain-like uint16 volume.

The reference's headline use case is GB-scale biomedical volumes (HiP-CT
organs); its demo data are git-LFS blobs absent from this snapshot, so a
synthetic stand-in carries the scale runs: smooth anatomy-like intensity
blobs (separable box-filtered noise at two scales) inside an ellipsoidal
"skull" mask, plus fine texture — enough structure that 80x INR
compression is a real task rather than fitting noise.

Writes dataset/example/brain512-0_512-0_512-0_512.tif (~268 MB,
gitignored — regenerate with:  python scripts/make_scale_volume.py [N])
"""
import os
import sys

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def box3(v, r):
    """Separable box blur with radius r (cumsum form, O(N^3) per axis)."""
    for ax in range(3):
        c = np.cumsum(v, axis=ax, dtype=np.float32)
        lo = np.concatenate([np.zeros_like(np.take(c, range(r + 1),
                                                   axis=ax))[..., ],
                             np.take(c, range(v.shape[ax] - r - 1), axis=ax)],
                            axis=ax)
        hi = np.concatenate([np.take(c, range(r, v.shape[ax]), axis=ax),
                             np.repeat(np.take(c, [-1], axis=ax), r, axis=ax)],
                            axis=ax)
        v = (hi - lo) / (2 * r + 1)
    return v


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "dataset", "example",
                       f"brain{N}-0_{N}-0_{N}-0_{N}.tif")
    if os.path.exists(out):
        print("exists:", out)
        return
    rng = np.random.default_rng(21)
    coarse = box3(rng.normal(0, 1, (N, N, N)).astype(np.float32), N // 32)
    mid = box3(rng.normal(0, 1, (N, N, N)).astype(np.float32), N // 128)
    fine = rng.normal(0, 0.03, (N, N, N)).astype(np.float32)

    g = np.linspace(-1, 1, N, dtype=np.float32)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    mask = (zz / 0.9) ** 2 + (yy / 0.8) ** 2 + (xx / 0.85) ** 2 < 1.0

    v = 2.5 * coarse / (np.abs(coarse).max() + 1e-9) \
        + 1.0 * mid / (np.abs(mid).max() + 1e-9) + fine
    v = (v - v.min()) / (v.max() - v.min())
    v = np.where(mask, 0.15 + 0.8 * v, 0.02 * v)
    vol = np.clip(v * 65535, 0, 65535).astype(np.uint16)[..., None]

    sys.path.insert(0, here)
    from brief_pytorch_tpu.io.image import save_img
    save_img(out, vol)
    print(f"wrote {out}  ({os.path.getsize(out) / 1e6:.0f} MB, "
          f"mean {vol.mean():.0f}, max {vol.max()})")


if __name__ == "__main__":
    main()
