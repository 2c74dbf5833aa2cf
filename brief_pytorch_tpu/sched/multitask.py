"""MultiTask: combinatorial experiment-grid expansion + fleet execution.

Capability parity: reference MultiTask.py:27-93 — a `Dynamic:` config tree
with nested PRODUCT/CONCAT combinators expands into per-experiment dotlists
merged over `Static:`; each combo becomes a Task.  Here tasks run in-process
against the TPU by default (one process owns the chip) or as subprocesses
with `use_subprocess=True`.
"""
from __future__ import annotations

import os
from itertools import product
from os.path import join as opj
from typing import Dict, List, Tuple

from brief_pytorch_tpu.core import config as cfglib
from brief_pytorch_tpu.sched.tasks import Queue, Task


def dict2dotlist_list(optdict: Dict) -> List[List[str]]:
    """(reference MultiTask.py:27-37)"""
    if "PRODUCT" in optdict:
        return PRODUCT(optdict["PRODUCT"])
    if "CONCAT" in optdict:
        return CONCAT(optdict["CONCAT"])
    return [[f"{k}={v}" for k, v in optdict.items()]]


def PRODUCT(optlist) -> List[List[str]]:
    """Cartesian product of sub-expansions (reference MultiTask.py:39-50)."""
    expanded = [dict2dotlist_list(opt) for opt in optlist]
    out = []
    for combo in product(*expanded):
        dotlist: List[str] = []
        for dl in combo:
            dotlist.extend(dl)
        out.append(dotlist)
    return out


def CONCAT(optlist) -> List[List[str]]:
    """Concatenation of sub-expansions (reference MultiTask.py:52-56)."""
    out: List[List[str]] = []
    for opt in optlist:
        out.extend(dict2dotlist_list(opt))
    return out


def gen_task_list(yaml_path: str, main_script_path: str = "",
                  use_subprocess: bool = False) -> Tuple[List[Task], str]:
    """Expand a MultiTask yaml into Tasks (reference MultiTask.py:63-84).

    In-process tasks call cli.main.run on the generated per-experiment yaml;
    subprocess tasks shell out like the reference.
    """
    opt = cfglib.load(yaml_path)
    temp_dir = opj(os.path.dirname(yaml_path) or ".",
                   "temp_opt_" + str(opt.Static.Log.project_name))
    os.makedirs(temp_dir, exist_ok=True)
    static = cfglib.to_dotlist(opt.Static)
    dynamic_list = CONCAT(opt.Dynamic)
    tasks: List[Task] = []
    for idx, dynamic in enumerate(dynamic_list):
        task_opt = cfglib.from_dotlist(static + dynamic)
        source = task_opt.pop("Source", cfglib.Config({"gpucost": 0,
                                                       "cpucost": 0}))
        task_name = f"exp_{idx:03d}"
        yaml_out = opj(temp_dir, task_name + ".yaml")
        cfglib.save(task_opt, yaml_out)
        if use_subprocess:
            command = f"python {main_script_path} -p {yaml_out}"
        else:
            command = _make_runner(yaml_out)
        tasks.append(Task(command, task_name, source.get("gpucost", 0),
                          source.get("cpucost", 0)))
    return tasks, temp_dir


def _make_runner(yaml_path: str):
    def runner():
        from brief_pytorch_tpu.cli.main import run
        return run(yaml_path)
    return runner


def run_multitask(yaml_path: str, main_script_path: str = "",
                  use_subprocess: bool = False, time_interval: float = 0,
                  max_task: int = 1, debug: bool = False,
                  device_list=None) -> Queue:
    """device_list: explicit device slots for subprocess pinning (the
    reference passes its gpu_list into the Queue, MultiTask.py:86-90);
    None leaves commands untouched."""
    tasks, temp_dir = gen_task_list(yaml_path, main_script_path,
                                    use_subprocess)
    queue = Queue(tasks, device_list=device_list)
    queue.init_sharecost_dict()
    try:
        queue.start(time_interval=time_interval, max_task=max_task,
                    debug=debug)
    finally:
        import shutil
        shutil.rmtree(temp_dir, ignore_errors=True)
    return queue
