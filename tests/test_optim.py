"""Optimizer / schedule semantics vs the reference's warmup + StepLR rules."""

import jax.numpy as jnp
import numpy as np

from unidefense_tpu.train.optim import build_lr_schedule, build_optimizer, get_optimizer


def test_constant_schedule():
    s = build_lr_schedule(1e-4, warmup_step=0, scheduler_cfg=None)
    assert np.isclose(float(s(0)), 1e-4)
    assert np.isclose(float(s(100000)), 1e-4)


def test_steplr_matches_reference_semantics():
    """StepLR(22500, 0.5): at train step s (1-indexed, warmup 0) the LR used
    is base * 0.5^((s-1) // 22500) since scheduler.step() runs at the END of
    each step (engine/abstract_engine.py:377-378). Two optax updates per
    step -> update count c maps to s = c//2 + 1."""
    base = 1e-4
    s = build_lr_schedule(base, warmup_step=0,
                          scheduler_cfg={"name": "StepLR", "step_size": 22500, "gamma": 0.5})
    # step 1 (updates 0,1)
    assert np.isclose(float(s(0)), base)
    assert np.isclose(float(s(1)), base)
    # step 22500 (updates 44998, 44999): (22500-1)//22500 = 0 -> no decay yet
    assert np.isclose(float(s(2 * 22499)), base)
    # step 22501: (22501-1)//22500 = 1 -> halved
    assert np.isclose(float(s(2 * 22500)), base * 0.5)
    # step 45001 -> quartered
    assert np.isclose(float(s(2 * 45000)), base * 0.25)


def test_warmup():
    """Linear warmup overrides LR for steps <= warmup
    (engine/forgery_engine.py:269-272); scheduler only counts steps beyond
    warmup (abstract_engine.py:377)."""
    base = 1e-3
    s = build_lr_schedule(base, warmup_step=10,
                          scheduler_cfg={"name": "StepLR", "step_size": 5, "gamma": 0.1})
    assert np.isclose(float(s(0)), base * 1 / 10)  # step 1
    assert np.isclose(float(s(2 * 4)), base * 5 / 10)  # step 5
    assert np.isclose(float(s(2 * 9)), base)  # step 10 (last warmup step)
    # step 11: 0 scheduler steps completed -> base
    assert np.isclose(float(s(2 * 10)), base)
    # step 16: k = 5 completed -> decayed once
    assert np.isclose(float(s(2 * 15)), base * 0.1)


def test_multistep_and_exponential():
    s = build_lr_schedule(1.0, 0, {"name": "MultiStepLR", "milestones": [3, 6], "gamma": 0.1})
    assert np.isclose(float(s(2 * 2)), 1.0)  # step 3, k=2 < 3
    assert np.isclose(float(s(2 * 3)), 0.1)  # step 4, k=3 >= 3
    assert np.isclose(float(s(2 * 6)), 0.01)  # step 7, k=6 >= 6
    e = build_lr_schedule(1.0, 0, {"name": "ExponentialLR", "gamma": 0.9})
    assert np.isclose(float(e(2 * 3)), 0.9**3)


def test_optimizer_registry_names():
    import optax

    sched = build_lr_schedule(1e-3, 0, None)
    for name in ["sgd", "adam", "adamw", "asgd", "adamax", "adadelta", "adagrad", "rmsprop"]:
        tx = get_optimizer(name, sched, weight_decay=1e-4, wd_mask=None)
        assert isinstance(tx, optax.GradientTransformation)


def test_wd_mask_skips_bias_and_1d():
    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
        "bn": {"scale": jnp.zeros(4)},
    }
    from unidefense_tpu.train.optim import _wd_mask

    mask = _wd_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["bn"]["scale"] is False


def test_amsgrad_update_differs_from_adam():
    import jax

    params = {"w": jnp.ones(4)}
    g1 = {"w": jnp.array([1.0, -1.0, 2.0, 0.5])}
    g2 = {"w": jnp.array([0.1, -0.1, 0.2, 0.05])}
    sched = build_lr_schedule(1e-2, 0, None)
    adam = get_optimizer("adamw", sched, amsgrad=False)
    ams = get_optimizer("adamw", sched, amsgrad=True)
    for tx in (adam, ams):
        st = tx.init(params)
        u1, st = tx.update(g1, st, params)
        u2, st = tx.update(g2, st, params)
    # second update with amsgrad uses max(v) -> smaller magnitude than adam
    st_a = adam.init(params)
    _, st_a = adam.update(g1, st_a, params)
    ua, _ = adam.update(g2, st_a, params)
    st_m = ams.init(params)
    _, st_m = ams.update(g1, st_m, params)
    um, _ = ams.update(g2, st_m, params)
    assert float(jnp.max(jnp.abs(um["w"]))) <= float(jnp.max(jnp.abs(ua["w"]))) + 1e-12
