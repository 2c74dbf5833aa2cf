"""True checkpoint/resume (train/checkpoint.py): a resumed run is
BIT-IDENTICAL to an uninterrupted one on the same checkpoint grid, for the
single-volume trainer and the block fleet.  Beyond the reference, whose
checkpoints are outputs only — no optimizer-state resume (SURVEY.md §5,
reference main.py:404-453): params, Adamax moments, schedule counts, and
the threaded PRNG key all round-trip."""
import copy
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess-isolated resume runs

from brief_pytorch_tpu.core import config as cfglib

# Every test in this module runs subprocess-isolated: four via the
# _isolated decorator below, the CLI test via real CLI subprocesses, the
# NFLR test via its worker script.
# Rationale (documented in CLAUDE.md, reproduced r3/r4/r5): after the full
# suite's hundreds of accumulated compiled programs, the XLA CPU compiler
# segfaults compiling whatever this late-ordered module jits next — the
# victim test moves as the suite grows (r3: NFLR SGA; r5: the CLI resume
# run, then the fleet fingerprint run after more tests were added).  A
# fresh process always passes; the crash is an upstream compiler issue.
_INPROC = os.environ.get("BRIEF_RESUME_INPROC") == "1"


def _isolated(fn):
    """Run the wrapped test via `pytest <this file>::<name>` in a clean
    subprocess; inside that subprocess (env marker) run the real body."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _INPROC:
            return fn(*args, **kwargs)
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": repo + (os.pathsep + pp if pp else ""),
               "BRIEF_RESUME_INPROC": "1"}
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"{os.path.abspath(__file__)}::{fn.__name__}"],
            capture_output=True, text=True, timeout=1200, env=env, cwd=repo)
        assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    return wrapper


def _tree_equal(a, b):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture()
def fast_opt(brain64_path):
    path = "/root/reference/opt/SingleTask/default.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    opt = cfglib.load(path)
    c = opt.CompressFramework.Compress
    c.sampler.name = "randompoint"
    c.sampler.sample_size = 2048
    c.decompress = False
    opt.CompressFramework.Decompress.mip = False
    return opt


def _run_single(opt, brain64_path, outdir, max_steps, checkpoints,
                resume="none"):
    from brief_pytorch_tpu.train.fit import NFGR
    from brief_pytorch_tpu.utils.logger import MyLogger
    o = copy.deepcopy(opt)
    o.CompressFramework.Compress.max_steps = max_steps
    o.CompressFramework.Compress.checkpoints = checkpoints
    o.CompressFramework.Compress.resume = resume
    log = MyLogger(project_name="r", outputs_dir=str(outdir),
                   stdlog=False, tensorboard=False)
    cf = NFGR(o.CompressFramework, logger=log, seed=42)
    cf.compress(brain64_path)
    return cf, log.logdir


@_isolated
def test_single_resume_bit_identical(fast_opt, brain64_path, tmp_path):
    # A: train to 40 and stop — trainstate.npz lands in the run dir
    cf_a, logdir_a = _run_single(fast_opt, brain64_path, tmp_path / "a",
                                 40, "every_40")
    state = os.path.join(logdir_a, "trainstate.npz")
    assert os.path.isfile(state)
    # B: uninterrupted 80-step truth on the same checkpoint grid
    cf_b, _ = _run_single(fast_opt, brain64_path, tmp_path / "b",
                          80, "every_40")
    # C: resume A's state (run-dir form) and continue to 80
    cf_c, logdir_c = _run_single(fast_opt, brain64_path, tmp_path / "c",
                                 80, "every_40", resume=logdir_a)
    _tree_equal(cf_b.params, cf_c.params)
    # the resumed run refreshed its own state file at step 80
    assert os.path.isfile(os.path.join(logdir_c, "trainstate.npz"))
    # and the resumed run did NOT redo the step-40 artifacts
    assert not os.path.isdir(os.path.join(logdir_c, "steps40"))
    assert os.path.isdir(os.path.join(logdir_c, "steps80"))


@_isolated
def test_single_resume_fingerprint_mismatch(fast_opt, brain64_path,
                                            tmp_path):
    _, logdir_a = _run_single(fast_opt, brain64_path, tmp_path / "a",
                              40, "every_40")
    bad = copy.deepcopy(fast_opt)
    bad.CompressFramework.Compress.lr_phi = 5e-4   # different optimizer lr
    with pytest.raises(ValueError, match="different"):
        _run_single(bad, brain64_path, tmp_path / "c", 80, "every_40",
                    resume=logdir_a)


# ---------------------------------------------------------------- fleet --
_FLEET_CC = """
sampler: {name: randompoint, cube_count: 1, cube_len: [4,4,4],
          sample_size: 64, gpu_force: true}
loss: {name: datal2, beta: 0.01, weight: [none], weight_thres: 0}
half: false
coords_mode: "-1,1"
optimizer_name_phi: Adamax
lr_phi: 0.001
lr_scheduler_phi: {name: MultiStepLR, milestones: [6], gamma: 0.2}
"""


def _fleet_blocks():
    from brief_pytorch_tpu.models.phi import init_phi
    rng = np.random.default_rng(7)
    blocks = []
    cfgs = [
        {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
         "features": 8, "layers": 4, "w0": 20, "res": False},
        {"name": "SIREN", "coords_channel": 3, "data_channel": 1,
         "features": 12, "layers": 4, "w0": 20, "res": False},
        {"name": "NeRF", "coords_channel": 3, "data_channel": 1,
         "features": 8, "layers": 4, "frequencies": 3, "skip": True},
        # MFN: exercises the SOLO path's state round trip
        {"name": "MFNGabor", "coords_channel": 3, "data_channel": 1,
         "features": 8, "layers": 4},
    ]
    for i, cfg in enumerate(cfgs):
        vol = rng.uniform(0, 1, (5, 5, 5, 1)).astype(np.float32)
        blocks.append({"name": f"blk{i}", "data_norm": vol,
                       "weight": np.ones_like(vol),
                       "model": init_phi(cfg), "sideinfos": {},
                       "weight_thres_norm": 0.0})
    return blocks


def _run_fleet(tmp_path, tag, max_steps, checkpoints, state=True,
               resume=None, lr=None):
    import jax
    from brief_pytorch_tpu.parallel.block_trainer import BlockFleetTrainer
    from brief_pytorch_tpu.parallel.mesh import make_mesh
    cc = cfglib.loads(_FLEET_CC)
    if lr is not None:
        cc.lr_phi = lr
    mesh = make_mesh(n_block_shards=min(4, len(jax.devices())),
                     devices=jax.devices()[:min(4, len(jax.devices()))])
    trainer = BlockFleetTrainer(mesh=mesh, seed=0)
    blocks = _fleet_blocks()
    trainer.train(blocks, cc, max_steps=max_steps, checkpoints=checkpoints,
                  state_path=str(tmp_path / f"state_{tag}.npz")
                  if state else None,
                  resume_path=resume)
    return blocks, str(tmp_path / f"state_{tag}.npz")


@_isolated
def test_fleet_resume_bit_identical(tmp_path):
    # A: 4 of 8 steps, state saved at the checkpoint
    _, state_a = _run_fleet(tmp_path, "a", max_steps=8, checkpoints=[4])
    assert os.path.isfile(state_a)
    # B: uninterrupted truth
    blocks_b, _ = _run_fleet(tmp_path, "b", max_steps=8, checkpoints=[4, 8])
    # C: resume from A (bucket stacks + solo MFN + keys + steps_done)
    blocks_c, _ = _run_fleet(tmp_path, "c", max_steps=8, checkpoints=[4, 8],
                             resume=state_a)
    for bb, bc in zip(blocks_b, blocks_c):
        _tree_equal(bb["params"], bc["params"])


@_isolated
def test_fleet_resume_fingerprint_mismatch(tmp_path):
    _, state_a = _run_fleet(tmp_path, "a", max_steps=8, checkpoints=[4])
    with pytest.raises(ValueError, match="different"):
        _run_fleet(tmp_path, "c", max_steps=8, checkpoints=[4, 8],
                   resume=state_a, lr=5e-4)


def test_cli_resume_flag(fast_opt, brain64_path, tmp_path):
    """-resume on the CLI (cli/main.py) overrides Compress.resume: run A
    stops at 20, the same command + -resume continues to 40 and matches
    the uninterrupted 40-step truth exactly.

    Each CLI invocation runs as a real subprocess (`python -m
    brief_pytorch_tpu.cli.main`): beyond exercising the actual process
    boundary, this dodges the documented full-suite XLA-CPU compiler
    segfault — in-process, this test's late-ordered compile crashed the
    compiler once the suite's accumulated program count grew (r5: adding
    tests/test_pallas_decode.py tipped it), while any fresh process
    passes (same pathology as test_nflr_resume_bit_identical below)."""
    import subprocess
    import sys

    def write_yaml(outdir, max_steps):
        o = copy.deepcopy(fast_opt)
        o.CompressFramework.Compress.max_steps = max_steps
        o.CompressFramework.Compress.checkpoints = "every_20"
        o.Dataset.data_path = brain64_path
        o.Log.outputs_dir = str(outdir)
        o.Log.project_name = "clir"
        o.Log.tensorboard = False
        o.Log.stdlog = False
        o.Log.time = False
        p = tmp_path / f"{os.path.basename(outdir)}.yaml"
        from brief_pytorch_tpu.core import config as _cfg
        _cfg.save(o.to_plain() if hasattr(o, "to_plain") else o, str(p))
        return str(p)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + (os.pathsep + _pp if _pp else "")}

    def cli(*args):
        p = subprocess.run(
            [sys.executable, "-m", "brief_pytorch_tpu.cli.main", *args],
            capture_output=True, text=True, timeout=900, env=env)
        assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]

    cli("-p", write_yaml(tmp_path / "a", 20))
    cli("-p", write_yaml(tmp_path / "b", 40))
    cli("-p", write_yaml(tmp_path / "c", 40),
        "-resume", str(tmp_path / "a" / "clir"))
    from brief_pytorch_tpu.io.modelsave import load_model
    lb = load_model(os.path.join(tmp_path, "b", "clir", "steps40",
                                 "compressed", "module"))
    lc = load_model(os.path.join(tmp_path, "c", "clir", "steps40",
                                 "compressed", "module"))
    _tree_equal(lb, lc)


_NFLR_RESUME_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, sys.argv[1])         # tests/ (for test_nflr._nflr_opt)
tmp = sys.argv[2]

from test_nflr import _nflr_opt
from brief_pytorch_tpu.io.image import save_img
from brief_pytorch_tpu.nflr.framework import init_compressframework

rng = np.random.default_rng(0)
z, y, x = np.meshgrid(*[np.linspace(0, 1, 16)] * 3, indexing="ij")
vol = (20000 + 20000 * np.sin(4 * z) * np.cos(3 * y) * x
       + rng.normal(0, 200, (16, 16, 16)))
for d in ("train", "val"):
    os.makedirs(os.path.join(tmp, d), exist_ok=True)
    save_img(os.path.join(tmp, d, "vol.tif"),
             np.clip(vol, 0, 65535).astype(np.uint16)[..., None])


def run(tag, max_steps, state_every=0, resume="none"):
    opt = _nflr_opt("NFLR_Coding_Hyper_AutoDecoder")
    opt.Train.train_data_dir = os.path.join(tmp, "train")
    opt.Train.val_data_dir = os.path.join(tmp, "val")
    opt.Train.max_steps = max_steps
    opt.Train.state_every_n_step = state_every
    opt.Train.resume = resume
    fw = init_compressframework(opt)
    fw.train(os.path.join(tmp, tag))
    return fw


run("a", 4, state_every=4)
state = os.path.join(tmp, "a", "trainstate.npz")
assert os.path.isfile(state)
fb = run("b", 8)
fc = run("c", 8, resume=state)
la = jax.tree_util.tree_leaves(fb.params)
lc = jax.tree_util.tree_leaves(fc.params)
assert len(la) == len(lc)
for a_, c_ in zip(la, lc):
    assert np.array_equal(np.asarray(a_), np.asarray(c_))
print("NFLR RESUME OK")
'''


def test_nflr_resume_bit_identical(tmp_path):
    """NFLR family resume (nflr/framework._BaseNFLR.train): params, the
    module optimizer, BOTH quantile optimizers (emy/emz), and the threaded
    PRNG key round-trip; the seeded data pipeline is fast-forwarded — the
    resumed run matches the uninterrupted one exactly.

    Runs in a SUBPROCESS: inside the full-suite process (after the NFLR
    tests' hundreds of accumulated compiled programs) the XLA CPU compiler
    segfaults compiling this test's SGA program — reproducibly at the same
    spot, while the test passes in any fresh process.  Isolation converts
    an upstream-compiler crash into a deterministic pass."""
    import subprocess
    import sys
    script = tmp_path / "worker_nflr_resume.py"
    script.write_text(_NFLR_RESUME_WORKER)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = {**os.environ, "PYTHONPATH": os.path.dirname(tests_dir)}
    p = subprocess.run(
        [sys.executable, str(script), tests_dir, str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    assert "NFLR RESUME OK" in p.stdout
