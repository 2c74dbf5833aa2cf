"""train/samplers.py: vectorised randompoint run draws (vector_len > 1).

The L=1 default is the reference's iid draw (covered by the oracle and
e2e tests); L>1 swaps the serial single-voxel gather for batched L-wide
slice fetches and must stay value-exact and marginally uniform away from
the flat-array ends.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brief_pytorch_tpu.core.coords import index_to_coords
from brief_pytorch_tpu.train.samplers import RandomPointSampler


def _data(pop=4096, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (pop, c)).astype(np.float32))


def test_vectorised_values_match_indices():
    """Values/weights must be the data at exactly the coord-derived
    indices, for run lengths that divide and don't divide sample_size."""
    data = _data()
    weight = _data(seed=1)
    for L in (8, 48, 128):
        s = RandomPointSampler((16, 16, 16), "-1,1", 1000, vector_len=L)
        coords, vals, wts = s.sample(jax.random.PRNGKey(3), data, weight)
        assert coords.shape == (1000, 3) and vals.shape == (1000, 1)
        # recover flat indices from coords ("-1,1" linspace is invertible
        # on the voxel grid)
        axes = np.round((np.asarray(coords) + 1) / 2 * 15).astype(np.int64)
        idx = axes[:, 0] * 256 + axes[:, 1] * 16 + axes[:, 2]
        np.testing.assert_array_equal(np.asarray(vals)[:, 0],
                                      np.asarray(data)[idx, 0])
        np.testing.assert_array_equal(np.asarray(wts)[:, 0],
                                      np.asarray(weight)[idx, 0])
        # runs are contiguous in flat order
        assert np.all(np.diff(idx.reshape(-1, L) if 1000 % L == 0 else
                              idx[: (1000 // L) * L].reshape(-1, L),
                              axis=1) == 1)


def test_vectorised_default_is_reference_draw():
    """vector_len=1 must keep the exact historical randint draw."""
    data = _data()
    a = RandomPointSampler((16, 16, 16), "-1,1", 500)
    b = RandomPointSampler((16, 16, 16), "-1,1", 500, vector_len=1)
    key = jax.random.PRNGKey(7)
    ca, va, _ = a.sample(key, data, None)
    cb, vb, _ = b.sample(key, data, None)
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_vectorised_marginal_coverage_bound():
    """Exact combinatorial marginal of the UNALIGNED fallback (pop % L
    != 0): voxel v is covered by the runs starting in
    [max(0, v-L+1), min(v, pop-L)] — uniform (L covers) for every
    interior voxel, depressed only within L-1 voxels of the two flat
    ends.  (The aligned branch taken when pop % L == 0 is exactly
    uniform: each voxel lies in exactly one row.)  No sampling noise:
    computed in closed form."""
    pop, L = 4096, 64
    v = np.arange(pop)
    covers = np.minimum(v, pop - L) - np.maximum(0, v - L + 1) + 1
    interior = covers[L - 1: pop - L + 1]
    assert np.all(interior == L)
    assert covers.min() == 1 and covers.max() == L
    # the depressed mass is tiny: < 2 * L^2 / (2 * L * pop) = L/pop
    deficit = (L - covers).sum() / (L * pop)
    assert deficit < L / pop < 0.016


def test_vectorised_training_reduces_loss():
    """run_segment with a vectorised sampler trains end-to-end."""
    from brief_pytorch_tpu.models.phi import init_phi
    from brief_pytorch_tpu.train.fit import run_segment
    from brief_pytorch_tpu.train.optim import make_optimizer

    g = np.linspace(-1, 1, 16)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    vol = (np.sin(3 * zz) + np.cos(2 * yy) * xx).astype(np.float32)[..., None]
    data = jnp.asarray(vol.reshape(-1, 1))
    model = init_phi({"name": "SIREN", "coords_channel": 3,
                      "data_channel": 1, "layers": 4, "features": 16,
                      "w0": 20, "res": False})
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer("Adamax", 1e-3, None)
    sampler = RandomPointSampler((16, 16, 16), "-1,1", 512, vector_len=32)
    params, _, losses = run_segment(
        params, tx.init(params), data, None, jax.random.PRNGKey(1),
        weight_thres=0.0, model=model, sampler=sampler, tx=tx,
        loss_name="datal2", beta=0.01, n_steps=150, half=False)
    losses = np.asarray(losses)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


_DEQUANT_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, sys.argv[1])
from brief_pytorch_tpu.core.normalize import normalize_data
from brief_pytorch_tpu.train.samplers import RandomPointSampler

rng = np.random.default_rng(0)
raw = rng.integers(100, 60000, (16, 16, 16, 1), dtype=np.uint16)
norm, side = normalize_data(raw, "minmaxany_0_100")
A = 100.0 / (side["max"] - side["min"])
B = -side["min"] * A
for vector_len in (1, 32):
    s_f32 = RandomPointSampler((16, 16, 16), "-1,1", 512, vector_len)
    s_u16 = RandomPointSampler((16, 16, 16), "-1,1", 512, vector_len, A, B)
    key = jax.random.PRNGKey(7)
    c_f, v_f, w_f = s_f32.sample(key, jnp.asarray(norm.reshape(-1, 1)), None)
    c_u, v_u, w_u = s_u16.sample(key, jnp.asarray(raw.reshape(-1, 1)), None)
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_u))
    assert v_u.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_u),
                               atol=2e-4, rtol=0)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_u))
print("DEQUANT GATHER OK")
"""


def test_integer_dequant_gather_matches_normalized(tmp_path):
    """Gathering the RAW uint16 volume + post-gather affine equals the
    float32 pre-normalized gather (same key -> same indices) to f32
    rounding — the Compress.raw_gather opt-in path.

    Runs in a SUBPROCESS: late in the full suite the XLA CPU compiler
    segfaults compiling even this test's trivial randint program (the
    known cumulative-programs crash documented in tests/test_resume.py
    and CLAUDE.md); any fresh process passes."""
    import os
    import subprocess
    import sys
    script = tmp_path / "worker_dequant.py"
    script.write_text(_DEQUANT_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, str(script), repo], capture_output=True, text=True,
        timeout=600, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    assert "DEQUANT GATHER OK" in p.stdout


_RAW_GATHER_WORKER = r"""
import os
import sys
import jax
jax.config.update("jax_platforms", "cpu")
repo, outdir = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
os.chdir(repo)
from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.train.fit import NFGR
from brief_pytorch_tpu.utils.logger import MyLogger

opt = cfglib.load("opt/SingleTask/default.yaml")
opt.CompressFramework.Compress.max_steps = 200
opt.CompressFramework.Compress.checkpoints = "none"
opt.CompressFramework.Compress.sampler.name = "randompoint"
opt.CompressFramework.Compress.sampler.sample_size = 4096
opt.CompressFramework.Compress.raw_gather = True
opt.CompressFramework.Decompress.mip = False
log = MyLogger(project_name="u16gather", outputs_dir=outdir,
               stdlog=False, tensorboard=False)
fw = NFGR(opt.CompressFramework, logger=log, seed=42)
res = fw.compress(str(opt.Dataset.data_path))
assert res["psnr"] > 24.0, res
print("RAW GATHER OK", res["psnr"])
"""


def test_fit_raw_gather_opt_in(tmp_path):
    """End-to-end: a randompoint run on the uint16 fixture with
    Compress.raw_gather (the HBM-halving opt-in) trains through the
    integer-gather path and reaches the same quality class as the f32
    path (the values differ only by f32 rounding).

    Subprocess-isolated for the same cumulative XLA-CPU compiler crash
    as test_integer_dequant_gather_matches_normalized above."""
    import os
    import subprocess
    import sys
    script = tmp_path / "worker_raw_gather.py"
    script.write_text(_RAW_GATHER_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, str(script), repo, str(tmp_path)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    assert "RAW GATHER OK" in p.stdout
