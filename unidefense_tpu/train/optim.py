"""Optimizer + LR schedule construction (optax).

Registry parity with optimizer/__init__.py:10-32 and scheduler/__init__.py:21-41
of the reference, re-expressed as optax transforms:

* weight-decay masking reproduces timm's param_groups_weight_decay — no decay
  for params with ndim <= 1 or name 'bias' (engine/forgery_engine.py:152-154);
* the schedule folds the engine's manual linear warmup
  (engine/forgery_engine.py:269-272) and the scheduler-steps-after-warmup rule
  (engine/abstract_engine.py:377-378) into a single optax schedule. The
  two-pass step performs TWO optimizer updates per train step, so the
  schedule maps optax's update count c to the train step s = c//2 + 1.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax


def _wd_mask(params) -> Any:
    """True where weight decay applies: ndim > 1 and not a bias
    (timm param_groups_weight_decay parity)."""
    import jax

    def keep(path, p):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return p.ndim > 1 and name != "bias"

    return jax.tree_util.tree_map_with_path(keep, params)


def build_lr_schedule(
    base_lr: float,
    warmup_step: int = 0,
    scheduler_cfg: Optional[dict] = None,
    updates_per_step: int = 2,
) -> Callable:
    """Schedule over optax update count. scheduler_cfg follows the reference
    YAML: {name: StepLR, step_size, gamma} etc.; None -> ConstantLR."""
    cfg = dict(scheduler_cfg or {})
    name = cfg.pop("name", "ConstantLR")

    def sched_steps(c):
        s = c // updates_per_step + 1  # 1-indexed train step
        k = jnp.maximum(0, s - 1 - warmup_step)  # completed scheduler steps
        return s, k

    if name == "ConstantLR":
        def decay(k):
            return jnp.ones_like(k, dtype=jnp.float32)
    elif name == "StepLR":
        step_size = int(cfg["step_size"])
        gamma = float(cfg.get("gamma", 0.1))
        def decay(k):
            return gamma ** (k // step_size).astype(jnp.float32)
    elif name == "MultiStepLR":
        milestones = sorted(int(m) for m in cfg["milestones"])
        gamma = float(cfg.get("gamma", 0.1))
        def decay(k):
            n = sum((k >= m).astype(jnp.int32) for m in milestones)
            return gamma ** n.astype(jnp.float32)
    elif name == "ExponentialLR":
        gamma = float(cfg["gamma"])
        def decay(k):
            return gamma ** k.astype(jnp.float32)
    elif name in ("CosineAnnealingLR", "TimmCosineLR"):
        t_max = int(cfg.get("T_max", cfg.get("t_initial", 1)))
        eta_min = float(cfg.get("eta_min", cfg.get("lr_min", 0.0)))
        def decay(k):
            cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.minimum(k, t_max) / t_max))
            return (eta_min + (base_lr - eta_min) * cos) / base_lr
    elif name == "CosineAnnealingWarmRestarts":
        t0 = int(cfg.get("T_0", 1))
        eta_min = float(cfg.get("eta_min", 0.0))
        def decay(k):
            kr = jnp.mod(k, t0)
            cos = 0.5 * (1 + jnp.cos(jnp.pi * kr / t0))
            return (eta_min + (base_lr - eta_min) * cos) / base_lr
    elif name == "TimmStepLR":
        step_size = int(cfg.get("decay_t", cfg.get("step_size", 1)))
        gamma = float(cfg.get("decay_rate", cfg.get("gamma", 0.1)))
        def decay(k):
            return gamma ** (k // step_size).astype(jnp.float32)
    else:
        raise KeyError(f"Scheduler '{name}' not supported")

    def schedule(count):
        count = jnp.asarray(count)
        s, k = sched_steps(count)
        lr = base_lr * decay(k)
        if warmup_step:
            warm = base_lr * s.astype(jnp.float32) / warmup_step
            lr = jnp.where(s <= warmup_step, warm, lr)
        return lr

    return schedule


def get_optimizer(
    name: str,
    schedule: Callable,
    weight_decay: float = 0.0,
    wd_mask: Any = None,
    betas=(0.9, 0.999),
    amsgrad: bool = False,
    momentum: float = 0.0,
    eps: float = 1e-8,
    **kwargs,
) -> optax.GradientTransformation:
    """Build the optax chain for a reference optimizer name
    (optimizer/__init__.py:10-32). Decoupled weight decay with the timm mask
    is applied for all names (the reference routes every optimizer through
    param_groups_weight_decay)."""
    name = name.lower()
    b1, b2 = betas
    if name in ("adamw", "adam"):
        core = optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps) if amsgrad else optax.scale_by_adam(
            b1=b1, b2=b2, eps=eps
        )
    elif name in ("sgd", "asgd"):
        # ASGD's averaging offers no benefit in this regime; mapped to SGD.
        core = optax.trace(decay=momentum) if momentum else optax.identity()
    elif name == "adamax":
        core = optax.scale_by_adamax(b1=b1, b2=b2, eps=eps)
    elif name == "adadelta":
        core = optax.scale_by_adadelta(eps=eps)
    elif name == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps)
    elif name == "rmsprop":
        core = optax.scale_by_rms(decay=kwargs.get("alpha", 0.99), eps=eps)
    else:
        raise KeyError(f"Optimizer '{name}' not implemented")

    parts = [core]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    parts.append(optax.scale_by_schedule(lambda c: -schedule(c)))
    return optax.chain(*parts)


def build_optimizer(config_cfg: dict, params) -> tuple[optax.GradientTransformation, Callable]:
    """Construct (tx, lr_schedule) from the reference `config:` YAML section
    (config_template/forgery/model_udeb4.yml:17-26)."""
    optim_cfg = dict(config_cfg.get("optimizer") or {"name": "sgd", "lr": 0.01})
    name = optim_cfg.pop("name")
    base_lr = float(optim_cfg.pop("lr"))
    wd = float(optim_cfg.pop("weight_decay", 0.0))
    warmup = int(config_cfg.get("warmup_step", 0) or 0)
    schedule = build_lr_schedule(base_lr, warmup, config_cfg.get("scheduler"))
    tx = get_optimizer(
        name,
        schedule,
        weight_decay=wd,
        wd_mask=_wd_mask(params),
        **optim_cfg,
    )
    return tx, schedule
