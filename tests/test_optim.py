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


def test_asgd_matches_torch():
    """scale_by_asgd reproduces torch.optim.ASGD trajectories (param values
    after N steps) with weight decay on the masked (2-D) params only —
    optimizer/__init__.py registry parity, no silent SGD aliasing."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(3, 2)).astype(np.float32)
    b0 = rng.normal(size=(2,)).astype(np.float32)
    grads = [
        {"w": rng.normal(size=(3, 2)).astype(np.float32),
         "b": rng.normal(size=(2,)).astype(np.float32)}
        for _ in range(7)
    ]
    lr, wd = 0.05, 0.1

    # torch: timm-style param groups (wd for 2-D, none for bias)
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.ASGD(
        [{"params": [tw], "weight_decay": wd}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr,
    )
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g["w"])
        tb.grad = torch.tensor(g["b"])
        opt.step()

    # ours
    from unidefense_tpu.train.optim import scale_by_asgd

    import optax

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    mask = {"w": True, "b": False}
    tx = scale_by_asgd(lambda c: lr, weight_decay=wd, wd_mask=mask)
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update({k: jnp.asarray(v) for k, v in g.items()}, st, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), rtol=1e-5, atol=1e-6)
    # the Polyak average is maintained in state (mu==1 regime: ax == params)
    np.testing.assert_allclose(np.asarray(st.ax["w"]), np.asarray(params["w"]), rtol=1e-6)


def _torch_trajectory(opt_cls, w0, b0, grads, lr, wd, **okw):
    import torch

    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = opt_cls(
        [{"params": [tw], "weight_decay": wd}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr, **okw,
    )
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g["w"])
        tb.grad = torch.tensor(g["b"])
        opt.step()
    return tw.detach().numpy(), tb.detach().numpy()


def _ours_trajectory(name, w0, b0, grads, lr, wd, **okw):
    import optax

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = get_optimizer(name, lambda c: lr, weight_decay=wd,
                       wd_mask={"w": True, "b": False}, **okw)
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update({k: jnp.asarray(v) for k, v in g.items()}, st, params)
        params = optax.apply_updates(params, upd)
    return np.asarray(params["w"]), np.asarray(params["b"])


def _wd_grads(seed=1, n=6):
    rng = np.random.default_rng(seed)
    w0 = rng.normal(size=(3, 2)).astype(np.float32)
    b0 = rng.normal(size=(2,)).astype(np.float32)
    grads = [
        {"w": rng.normal(size=(3, 2)).astype(np.float32),
         "b": rng.normal(size=(2,)).astype(np.float32)}
        for _ in range(n)
    ]
    return w0, b0, grads


def test_adam_weight_decay_coupled_matches_torch():
    """torch's Adam couples weight_decay as L2 into the gradient (only AdamW
    decouples). Our chain places add_decayed_weights BEFORE scale_by_adam for
    name='adam' — pinned against a real torch.optim.Adam trajectory with the
    timm no-decay mask (wd on the 2-D param, none on the bias)."""
    import torch

    w0, b0, grads = _wd_grads(seed=2)
    lr, wd = 0.05, 0.1
    tw, tb = _torch_trajectory(torch.optim.Adam, w0, b0, grads, lr, wd)
    ow, ob = _ours_trajectory("adam", w0, b0, grads, lr, wd)
    np.testing.assert_allclose(ow, tw, rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(ob, tb, rtol=1e-5, atol=5e-6)


def test_adamw_weight_decay_decoupled_matches_torch():
    """AdamW stays decoupled (torch.optim.AdamW)."""
    import torch

    w0, b0, grads = _wd_grads(seed=3)
    lr, wd = 0.05, 0.1
    tw, tb = _torch_trajectory(torch.optim.AdamW, w0, b0, grads, lr, wd)
    ow, ob = _ours_trajectory("adamw", w0, b0, grads, lr, wd)
    np.testing.assert_allclose(ow, tw, rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(ob, tb, rtol=1e-5, atol=5e-6)


def test_sgd_momentum_weight_decay_coupled_matches_torch():
    """SGD+momentum couples wd into the gradient before the momentum buffer
    (torch _single_tensor_sgd order)."""
    import torch

    w0, b0, grads = _wd_grads(seed=4)
    lr, wd = 0.05, 0.1
    tw, tb = _torch_trajectory(torch.optim.SGD, w0, b0, grads, lr, wd,
                               momentum=0.9)
    ow, ob = _ours_trajectory("sgd", w0, b0, grads, lr, wd, momentum=0.9)
    np.testing.assert_allclose(ow, tw, rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(ob, tb, rtol=1e-5, atol=5e-6)


def test_asgd_eta_decay_changes_steps():
    """eta decays as lr/(1+lambd*lr*t)^alpha — with a large lambd the second
    step must be smaller than the first for the same gradient."""
    from unidefense_tpu.train.optim import scale_by_asgd

    params = {"w": jnp.zeros(3)}
    g = {"w": jnp.ones(3)}
    tx = scale_by_asgd(lambda c: 1.0, lambd=1.0, alpha=0.75, weight_decay=0.0)
    st = tx.init(params)
    u1, st = tx.update(g, st, params)
    u2, st = tx.update(g, st, params)
    assert float(jnp.abs(u2["w"][0])) < float(jnp.abs(u1["w"][0]))


def test_reduce_lr_on_plateau_matches_torch():
    import torch

    from unidefense_tpu.train.optim import ReduceLROnPlateau

    base = 0.1
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    ts = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, cooldown=1, min_lr=0.01
    )
    ours = ReduceLROnPlateau(base, mode="min", factor=0.5, patience=2, cooldown=1, min_lr=0.01)
    metrics = [1.0, 0.9, 0.95, 0.94, 0.93, 0.92, 0.91, 0.91, 0.91, 0.91, 0.905, 0.91, 0.91, 0.91]
    for m in metrics:
        ts.step(m)
        ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert np.isclose(ours.lr, torch_lr), (m, ours.lr, torch_lr)
    assert ours.lr < base  # at least one reduction happened in this sequence


def test_plateau_schedule_and_builder():
    from unidefense_tpu.train.optim import build_plateau

    s = build_lr_schedule(1e-3, 0, {"name": "ReduceLROnPlateau", "factor": 0.5})
    assert np.isclose(float(s(0)), 1e-3)
    assert np.isclose(float(s(10000)), 1e-3)  # count-based part is constant
    cfg = {"optimizer": {"name": "sgd", "lr": 1e-3},
           "scheduler": {"name": "ReduceLROnPlateau", "factor": 0.5, "patience": 0,
                         "mode": "min"}}
    pl = build_plateau(cfg)
    assert pl is not None
    assert pl.step(1.0) == 1.0
    assert pl.step(2.0) == 0.5  # worse metric, patience 0 -> immediate halving
    assert build_plateau({"optimizer": {"name": "sgd", "lr": 1e-3}}) is None


def test_lr_scale_injection_scales_updates():
    """TrainState.lr_scale multiplies optimizer updates: scale 0 freezes the
    params; scale 1 matches the unscaled trajectory."""
    import jax

    from tests.helpers import MiniUniDefense
    from unidefense_tpu.train.step import create_train_state, make_normal_train_step

    model = MiniUniDefense(depth=4)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 16, 16, 3), jnp.float32)
    cfg = {"optimizer": {"name": "sgd", "lr": 0.1}}
    tx, _ = build_optimizer(cfg, jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False))["params"])
    step = make_normal_train_step(model, tx, cfg, sum_real=2, sum_fake=2)
    batch = {"image": jax.random.normal(rng, x.shape), "label": jnp.array([0, 0, 1, 1])}

    s0 = create_train_state(model, tx, rng, x)
    frozen = s0.replace(lr_scale=jnp.float32(0.0))
    new_frozen, _, _ = jax.jit(step)(frozen, batch, rng)
    w_before = jax.tree.leaves(s0.params)[0]
    w_after = jax.tree.leaves(new_frozen.params)[0]
    np.testing.assert_allclose(np.asarray(w_before), np.asarray(w_after))

    s1 = create_train_state(model, tx, rng, x)
    plain, _, _ = jax.jit(step)(s1, batch, rng)
    s2 = create_train_state(model, tx, rng, x).replace(lr_scale=jnp.float32(1.0))
    scaled, _, _ = jax.jit(step)(s2, batch, rng)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(plain.params)[0]),
        np.asarray(jax.tree.leaves(scaled.params)[0]), rtol=1e-6,
    )
