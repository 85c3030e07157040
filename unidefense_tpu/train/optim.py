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
from typing import Any, Callable, NamedTuple, Optional

import jax
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

    if name in ("ConstantLR", "ReduceLROnPlateau"):
        # ReduceLROnPlateau is metric-fed (scheduler/__init__.py:29): its
        # decay cannot be a function of the step count. The count-based part
        # of the schedule stays constant; the plateau factor is computed
        # host-side by `ReduceLROnPlateau.step(metric)` after each validation
        # and injected into the jitted step via TrainState.lr_scale. (In the
        # reference, configuring it actually crashes: engines call
        # scheduler.step() without a metric, abstract_engine.py:377-378.)
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


class AsgdState(NamedTuple):
    count: jnp.ndarray  # completed updates
    eta: jnp.ndarray  # per-update lr after lambd decay (torch state['eta'])
    mu: jnp.ndarray  # averaging coefficient (torch state['mu'])
    ax: Any  # Polyak-averaged parameters (torch state['ax'])


def scale_by_asgd(
    schedule: Callable,
    lambd: float = 1e-4,
    alpha: float = 0.75,
    t0: float = 1e6,
    weight_decay: float = 0.0,
    wd_mask: Any = None,
) -> optax.GradientTransformation:
    """torch.optim.ASGD as a complete optax transform (update math from
    torch's _single_tensor_asgd). Produces the FINAL parameter deltas — the
    learning rate (via `schedule`, positive) and its 1/(1+lambd*lr*t)^alpha
    decay are applied inside, so do NOT chain a scale_by_schedule after it.

    Per step t (1-indexed), with eta_t carried in state (init = lr):
      g'    = g + wd * p                      (coupled decay, torch-style)
      p_new = p * (1 - lambd*eta_t) - eta_t * g'
      ax    = p_new                  if mu == 1
              ax + mu*(p_new - ax)   otherwise
      eta   <- lr / (1 + lambd*lr*t)^alpha ;  mu <- 1/max(1, t - t0)

    The averaged params `ax` live in the state (retrievable via
    `averaged_params`); like torch, the optimized params themselves are the
    non-averaged ones."""

    def init_fn(params):
        return AsgdState(
            count=jnp.zeros((), jnp.int32),
            eta=jnp.asarray(schedule(0), jnp.float32),
            mu=jnp.ones((), jnp.float32),
            ax=jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), params),
        )

    def apply_wd(g, p, m):
        if weight_decay == 0.0:
            return g
        if m is False:
            return g
        return g + weight_decay * p

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scale_by_asgd requires params")
        step = state.count + 1
        mask = (
            wd_mask
            if wd_mask is not None
            else jax.tree.map(lambda _: True, params)
        )
        grads = jax.tree.map(apply_wd, updates, params, mask)
        eta = state.eta
        deltas = jax.tree.map(lambda g, p: -(lambd * eta) * p - eta * g, grads, params)
        mu = state.mu
        new_ax = jax.tree.map(
            lambda ax, p, d: jnp.where(mu == 1.0, p + d, ax + mu * (p + d - ax)),
            state.ax, params, deltas,
        )
        lr = jnp.asarray(schedule(step), jnp.float32)
        new_eta = lr / (1.0 + lambd * lr * step.astype(jnp.float32)) ** alpha
        new_mu = 1.0 / jnp.maximum(1.0, step.astype(jnp.float32) - t0)
        return deltas, AsgdState(count=step, eta=new_eta, mu=new_mu, ax=new_ax)

    return optax.GradientTransformation(init_fn, update_fn)


def averaged_params(opt_state) -> Optional[Any]:
    """Extract the ASGD Polyak average from an opt state, if present."""
    leaves = opt_state if isinstance(opt_state, (tuple, list)) else (opt_state,)
    for s in jax.tree.leaves(leaves, is_leaf=lambda x: isinstance(x, AsgdState)):
        if isinstance(s, AsgdState):
            return s.ax
    return None


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics, host-side.

    `step(metric)` returns the cumulative LR multiplier (1.0, then factor,
    factor^2, ... floored at min_lr/base_lr). The engine injects it into the
    jitted train step via TrainState.lr_scale after each validation — the
    metric-fed pathway torch feeds through scheduler.step(metric)."""

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0, eps: float = 1e-8):
        if factor >= 1.0:
            raise ValueError("Factor should be < 1.0.")
        self.base_lr = float(base_lr)
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.min_lr = float(min_lr)
        self.eps = float(eps)
        self.lr = self.base_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, a: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < self.best * (1.0 - self.threshold)
            return a < self.best - self.threshold
        if self.threshold_mode == "rel":
            return a > self.best * (1.0 + self.threshold)
        return a > self.best + self.threshold

    def step(self, metric: float) -> float:
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    @property
    def scale(self) -> float:
        return self.lr / self.base_lr


def build_plateau(config_cfg: dict, default_mode: str = "min") -> Optional[ReduceLROnPlateau]:
    """ReduceLROnPlateau instance when the scheduler YAML asks for it
    (scheduler/__init__.py:29), else None.

    default_mode: metric direction used when the YAML omits `mode` — the
    engines pass the direction of the metric they actually feed ('max' for
    FE/OCIM AUC composites, 'min' for UE ACER), since torch's 'min' default
    would silently treat every improvement as a plateau."""
    sched = dict(config_cfg.get("scheduler") or {})
    if sched.pop("name", None) != "ReduceLROnPlateau":
        return None
    base_lr = float((config_cfg.get("optimizer") or {}).get("lr", 1e-3))
    known = {"mode", "factor", "patience", "threshold", "threshold_mode",
             "cooldown", "min_lr", "eps"}
    kwargs = {k: v for k, v in sched.items() if k in known}
    kwargs.setdefault("mode", default_mode)
    return ReduceLROnPlateau(base_lr, **kwargs)


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
    (optimizer/__init__.py:10-32). Weight decay follows torch semantics:
    COUPLED (L2 added to the gradient before the core transform) for every
    optimizer except AdamW, which decouples (applies wd to the params after
    the core transform) — torch.optim.AdamW vs the weight_decay arg of
    Adam/SGD/Adamax/Adadelta/Adagrad/RMSprop. The timm no-decay mask
    (param_groups_weight_decay) applies in both cases."""
    name = name.lower()
    b1, b2 = betas
    if name == "asgd":
        # complete transform: lr schedule, lambd decay, coupled wd and the
        # Polyak average all live inside (torch.optim.ASGD parity; the
        # reference registry is optimizer/__init__.py:10-32)
        return scale_by_asgd(
            schedule,
            lambd=kwargs.get("lambd", 1e-4),
            alpha=kwargs.get("alpha", 0.75),
            t0=kwargs.get("t0", 1e6),
            weight_decay=weight_decay,
            wd_mask=wd_mask,
        )
    if name in ("adamw", "adam"):
        core = optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps) if amsgrad else optax.scale_by_adam(
            b1=b1, b2=b2, eps=eps
        )
    elif name == "sgd":
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

    parts = []
    if weight_decay and name != "adamw":
        # coupled L2: g' = g + wd*p feeds the core transform (torch's
        # weight_decay for adam/sgd/adamax/adadelta/adagrad/rmsprop)
        parts.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    parts.append(core)
    if weight_decay and name == "adamw":
        # decoupled: wd applied to params after the core (torch.optim.AdamW)
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
