"""Optimisers and LR schedules on optax.

Capability parity: reference utils/misc.py:174-197 (configure_optimizer:
Adam/Adamax/SGD; configure_lr_scheduler: MultiStepLR/StepLR/CyclicLR/none).
Schedules step per iteration, like the reference calls scheduler.step()
every training step (main.py:400).
"""
from __future__ import annotations

import math
from typing import Callable, Dict

import optax


def make_schedule(base_lr: float, sched_cfg: Dict | None) -> Callable:
    if not sched_cfg or sched_cfg.get("name", "none") == "none":
        return lambda step: base_lr
    name = sched_cfg["name"]
    if name == "MultiStepLR":
        milestones = list(sched_cfg.get("milestones", []))
        gamma = float(sched_cfg.get("gamma", 0.1))
        return optax.piecewise_constant_schedule(
            base_lr, {int(m): gamma for m in milestones})
    if name == "StepLR":
        step_size = int(sched_cfg["step_size"])
        gamma = float(sched_cfg.get("gamma", 0.1))
        return lambda step: base_lr * gamma ** (step // step_size)
    if name == "CyclicLR":
        base = float(sched_cfg.get("base_lr", base_lr))
        max_lr = float(sched_cfg.get("max_lr", base_lr * 10))
        up = int(sched_cfg.get("step_size_up", 2000))
        down = int(sched_cfg.get("step_size_down", up))

        def cyclic(step):
            import jax.numpy as jnp
            cycle_len = up + down
            pos = step % cycle_len
            frac = jnp.where(pos < up, pos / up, 1.0 - (pos - up) / down)
            return base + (max_lr - base) * frac
        return cyclic
    raise NotImplementedError(name)


_OPT_CACHE: Dict = {}


def _canon(obj):
    """Hashable canonical form of a schedule config (dict/Config/None)."""
    if obj is None:
        return None
    if hasattr(obj, "to_plain"):
        obj = obj.to_plain()
    if isinstance(obj, dict):
        return tuple(sorted((k, _canon(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_canon(v) for v in obj)
    return obj


def make_optimizer(name: str, lr: float, sched_cfg: Dict | None = None
                   ) -> optax.GradientTransformation:
    """Memoized: two optax transforms built from equal configs never
    compare equal, and the trainers pass the transform as a STATIC jit
    argument — a fresh object per call would recompile every jitted
    segment (one full XLA compile per experiment/trainer instance)."""
    cache_key = (name, float(lr), _canon(sched_cfg))
    try:
        if cache_key in _OPT_CACHE:
            return _OPT_CACHE[cache_key]
        cacheable = True
    except TypeError:
        # _canon passes unknown leaf types (e.g. numpy arrays of milestones)
        # through unchanged; fall back to an unmemoized transform rather
        # than raising at the dict lookup (caller pays a recompile instead)
        cacheable = False
    schedule = make_schedule(lr, sched_cfg)
    if name == "Adam":
        tx = optax.adam(schedule)
    elif name == "Adamax":
        tx = optax.adamax(schedule)
    elif name == "SGD":
        tx = optax.sgd(schedule)
    else:
        raise NotImplementedError(name)
    if cacheable:
        _OPT_CACHE[cache_key] = tx
    return tx
