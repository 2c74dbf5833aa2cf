"""Single-task / divide-task CLI, accepting the reference's opt/*.yaml schema.

Usage (mirrors reference main.py:680-706):
    python -m brief_pytorch_tpu.cli.main -p opt/SingleTask/default.yaml
Flags: -p yaml, -g device list (kept for compatibility; TPU devices are
managed by JAX), -substore/-stepstore, plus scheduler knobs for divide runs.
"""
from __future__ import annotations

import argparse
import os
import random
import shutil

import numpy as np

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.utils.logger import MyLogger


def reproduc(opt) -> None:
    """Seed host RNGs (reference main.py:653-661).  JAX PRNG keys are
    derived from the same seed inside the trainers."""
    random.seed(opt.seed)
    np.random.seed(opt.seed)


def run(opt_path: str, args=None) -> dict:
    opt = cfglib.load(opt_path)
    if getattr(args, "resume", None):
        opt.CompressFramework.Compress.resume = args.resume
    log = MyLogger(**opt.Log.to_plain())
    shutil.copy(opt_path, log.script_dir)
    reproduc(opt.Reproduc)
    seed = int(opt.Reproduc.seed)
    divide_type = opt.CompressFramework.Compress.divide.divide_type
    data_path = opt.Dataset.data_path

    import contextlib
    profile_ctx = contextlib.nullcontext()
    if getattr(args, "profile", False):
        from brief_pytorch_tpu.utils.profiling import trace
        profile_ctx = trace(os.path.join(log.logdir, "profile"))

    with profile_ctx:
        if divide_type == "none":
            from brief_pytorch_tpu.train.fit import NFGR
            cf = NFGR(opt.CompressFramework, logger=log, seed=seed)
            return cf.compress(data_path,
                               stepstore=getattr(args, "stepstore", False))
        from brief_pytorch_tpu.parallel.divide_runner import compress_divide
        return compress_divide(opt, log, args)


def main(argv=None):
    parser = argparse.ArgumentParser(description="single task for datacompress")
    parser.add_argument("-p", type=str,
                        default=os.path.join("opt", "SingleTask", "default.yaml"))
    parser.add_argument("-g", default="0",
                        help="device list (compat; JAX manages TPU devices)")
    parser.add_argument("-gc", type=int, default=8000)
    parser.add_argument("-cc", type=int, default=3000)
    parser.add_argument("-t", type=float, default=2)
    parser.add_argument("-m", type=int, default=33)
    # -dropslice is vestigial in the reference too (parsed at main.py:692,
    # assigned at :702, never read); -substore keeps the reference's child
    # scratch dirs (subexps/data_chunks/task_opts, main.py:644-647) which
    # the in-process fleet never creates — both accepted for CLI compat
    parser.add_argument("-dropslice", action="store_true")
    parser.add_argument("-debug", action="store_true")
    parser.add_argument("-substore", action="store_true")
    parser.add_argument("-stepstore", action="store_false",
                        help="keep non-final step dirs (single task; the "
                             "divide path keeps merged checkpoints like "
                             "the reference parent)")
    parser.add_argument("-profile", action="store_true",
                        help="write a jax.profiler trace under the run dir "
                             "(view with TensorBoard's profile plugin)")
    # multi-host launch: run the SAME command on every host with its own
    # -procid; the processes join one jax.distributed mesh and the block
    # fleet / data shards span all their devices (the reference spanned
    # machines via per-block subprocesses + a shared filesystem,
    # main.py:547-580; here the shared filesystem only carries process-0's
    # artifacts).  Omit all three on TPU pods launched by a cluster
    # runtime — jax auto-detects the cluster.
    parser.add_argument("-coordinator", type=str, default=None,
                        help="jax.distributed coordinator host:port "
                             "(process 0's address) for multi-host runs")
    parser.add_argument("-nprocs", type=int, default=None,
                        help="total number of processes in the multi-host "
                             "run (with -coordinator)")
    parser.add_argument("-procid", type=int, default=None,
                        help="this process's id in [0, nprocs) "
                             "(with -coordinator)")
    parser.add_argument("-resume", type=str, default=None,
                        help="continue a preempted run from its "
                             "trainstate (a run dir or the .npz itself); "
                             "overrides Compress.resume — see "
                             "train/checkpoint.py")
    args = parser.parse_args(argv)
    if args.coordinator is not None:
        from brief_pytorch_tpu.parallel.mesh import multihost_init
        multihost_init(coordinator=args.coordinator,
                       num_processes=args.nprocs, process_id=args.procid)
    return run(args.p, args)


if __name__ == "__main__":
    main()
