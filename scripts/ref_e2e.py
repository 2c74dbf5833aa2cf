"""End-to-end head-to-head: the reference's ACTUAL main.py vs our CLI.

Runs /root/reference/main.py (torch, CPU, functional stubs from
ref_stubs.py) and `python -m brief_pytorch_tpu.cli.main` on the SAME
SingleTask config — the bundled 64^3 brain fixture, SIREN @80x, identical
steps/checkpoint schedule — on the SAME host, and compares:

  * per-checkpoint PSNR / SSIM (from each side's performance.csv — the
    reference writes it at main.py:444-450, ours in train/fit.py:424)
  * total wall-clock (process launch -> exit, i.e. including model build,
    checkpoint decompress+eval at every checkpoint, and artifact writes)

Artifacts land under outputs/ref_e2e/{ref,ours}/...; the final
steps{N}/compressed/ dirs are the inputs for the both-ways decompress
interop test (tests/test_ref_e2e_interop.py).  Summary JSON:
outputs/ref_e2e/head_to_head.json.

Run (CPU, works with the chip down):
    python scripts/ref_e2e.py --steps 2000 --every 500
Re-run one side:  --skip-ref / --skip-ours
"""
from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REF = "/root/reference"
FIXTURE = os.path.join(REPO, "dataset", "brain", "64x64x64",
                       "brain-64_128-64_128-192_256.tif")


def build_config(steps: int, every: int, outputs_dir: str, project: str):
    sys.path.insert(0, REPO)
    from brief_pytorch_tpu.core import config as cfg
    opt = cfg.load(os.path.join(REPO, "opt", "SingleTask", "default.yaml"))
    opt.Dataset.data_path = FIXTURE
    opt.Log.outputs_dir = outputs_dir
    opt.Log.project_name = project
    opt.Log.stdlog = False
    opt.Log.tensorboard = False
    opt.Log.time = False
    c = opt.CompressFramework.Compress
    c.max_steps = steps
    c.checkpoints = f"every_{every}"
    c.gpu = False
    opt.CompressFramework.Decompress.gpu = False
    opt.CompressFramework.Decompress.keep_decompressed = False
    # mip must stay ON: the reference binds orig_data only inside its mip
    # branch (main.py:433) and then uses it at main.py:440 — with mip off
    # the reference crashes (UnboundLocalError), so every real reference
    # run has mip enabled; both sides pay the same mip cost here.
    opt.CompressFramework.Decompress.mip = True
    return opt


def run_reference(cfg_path: str) -> float:
    wrapper = (
        "import sys, os, runpy\n"
        f"sys.path.insert(0, {HERE!r})\n"
        "import ref_stubs; ref_stubs.install()\n"
        f"sys.path.insert(0, {REF!r})\n"
        f"os.chdir({REF!r})\n"
        f"sys.argv = ['main.py', '-p', {cfg_path!r}]\n"
        f"runpy.run_path({os.path.join(REF, 'main.py')!r}, "
        "run_name='__main__')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["CUDA_VISIBLE_DEVICES"] = ""
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", wrapper], check=True, env=env,
                   cwd=REF)
    return time.perf_counter() - t0


def run_ours(cfg_path: str, platform: str) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if platform == "cpu":
        # the axon sitecustomize forces the TPU plugin regardless of
        # JAX_PLATFORMS — a CPU head-to-head must drop it from PYTHONPATH
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-m", "brief_pytorch_tpu.cli.main",
                    "-p", cfg_path], check=True, env=env, cwd=REPO)
    return time.perf_counter() - t0


def read_perf(outputs_dir: str, project: str):
    hits = glob.glob(os.path.join(outputs_dir, project + "*",
                                  "performance.csv"))
    if not hits:
        return []
    rows = []
    with open(sorted(hits)[-1]) as f:
        for row in csv.DictReader(f):
            rows.append({k: (float(v) if k != "steps" else int(float(v)))
                         for k, v in row.items() if v != ""})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--every", type=int, default=500)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="backend for OUR side (reference is always torch CPU)")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    base = os.path.join(REPO, "outputs", "ref_e2e")
    os.makedirs(base, exist_ok=True)
    from brief_pytorch_tpu.core import config as cfg

    results = {}
    for side, runner, sub in (("ref", run_reference, "ref"),
                              ("ours", lambda p: run_ours(p, args.platform),
                               "ours")):
        if (side == "ref" and args.skip_ref) or \
           (side == "ours" and args.skip_ours):
            continue
        outdir = os.path.join(base, sub)
        opt = build_config(args.steps, args.every, outdir, f"e2e_{side}")
        cfg_path = os.path.join(base, f"config_{side}.yaml")
        cfg.save(opt, cfg_path)
        print(f"[{side}] running {args.steps} steps ...", flush=True)
        wall = runner(cfg_path)
        results[side] = {"wall_s": wall}
        print(f"[{side}] wall {wall:.1f}s", flush=True)

    summary = {"steps": args.steps, "every": args.every,
               "platform_ours": args.platform}
    for side in ("ref", "ours"):
        outdir = os.path.join(base, side)
        perf = read_perf(outdir, f"e2e_{side}")
        summary[side] = {"checkpoints": perf}
        if side in results:
            summary[side]["wall_s"] = results[side]["wall_s"]

    # side-by-side table
    ref_rows = {r["steps"]: r for r in summary["ref"]["checkpoints"]}
    our_rows = {r["steps"]: r for r in summary["ours"]["checkpoints"]}
    print(f"{'steps':>6} {'ref_psnr':>9} {'our_psnr':>9} "
          f"{'ref_ssim':>9} {'our_ssim':>9}")
    for s in sorted(set(ref_rows) | set(our_rows)):
        r, o = ref_rows.get(s, {}), our_rows.get(s, {})
        print(f"{s:>6} {r.get('psnr', float('nan')):>9.3f} "
              f"{o.get('psnr', float('nan')):>9.3f} "
              f"{r.get('ssim', float('nan')):>9.4f} "
              f"{o.get('ssim', float('nan')):>9.4f}")
    if "wall_s" in summary.get("ref", {}) and \
       "wall_s" in summary.get("ours", {}):
        print(f"wall: ref {summary['ref']['wall_s']:.1f}s  "
              f"ours {summary['ours']['wall_s']:.1f}s  "
              f"speedup {summary['ref']['wall_s']/summary['ours']['wall_s']:.2f}x")

    with open(os.path.join(base, "head_to_head.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", os.path.join(base, "head_to_head.json"))


if __name__ == "__main__":
    main()
