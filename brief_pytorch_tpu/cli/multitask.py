"""MultiTask CLI (reference MultiTask.py:94-125 flag surface)."""
from __future__ import annotations

import argparse

from brief_pytorch_tpu.sched.multitask import run_multitask


def main(argv=None):
    parser = argparse.ArgumentParser(description="Batch Compress")
    parser.add_argument("-stp", type=str, default="",
                        help="singletask script path (subprocess mode only)")
    parser.add_argument("-p", type=str, default="opt/MultiTask/default.yaml")
    parser.add_argument("-g", default="0",
                        help="device list (compat; JAX manages TPU devices)")
    parser.add_argument("-t", type=float, default=0)
    parser.add_argument("-m", type=int, default=1)
    parser.add_argument("-debug", action="store_true")
    parser.add_argument("-log", action="store_true")
    parser.add_argument("-onebyone", action="store_true")
    parser.add_argument("-subprocess", action="store_true",
                        help="run experiments as OS subprocesses")
    args = parser.parse_args(argv)
    max_task = 1 if args.onebyone else args.m
    # -onebyone also pins to the single listed device, like the reference
    # (MultiTask.py:114-118); subprocess mode pins via the Queue's slots
    devices = [d for d in str(args.g).split(",") if d != ""]
    if args.onebyone:
        devices = devices[:1]
    queue = run_multitask(args.p, args.stp, use_subprocess=args.subprocess,
                          time_interval=args.t, max_task=max_task,
                          debug=args.debug,
                          device_list=devices if args.subprocess else None)
    print(queue.status_table())
    return queue


if __name__ == "__main__":
    main()
