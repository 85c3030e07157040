"""Data-parallel equivalence on the forced 8-device CPU mesh (SURVEY.md §4):
running the shard_map'd step with the SAME local batch replicated on every
device must reproduce the single-device step exactly — gradients pmean of
identical grads, BN stats pmean of identical stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import OPT_CFG, MiniUniDefense, tiny_batch
from unidefense_tpu.parallel.mesh import DATA_AXIS, create_mesh, shard_train_step, split_device_batch
from unidefense_tpu.train.optim import build_optimizer
from unidefense_tpu.train.step import create_train_state, make_train_step


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"


def test_shard_map_matches_single_device():
    n_dev = 8
    mesh = create_mesh(n_dev)
    rng = jax.random.PRNGKey(0)
    x, labels = tiny_batch()  # local batch: 2 real + 2 fake

    # single-device run
    model1 = MiniUniDefense()
    shapes = jax.eval_shape(
        lambda: model1.init({"params": rng, "dropout": rng}, x, train=False)
    )
    tx, _ = build_optimizer(OPT_CFG, shapes["params"])
    state1 = create_train_state(model1, tx, rng, x)
    step1 = jax.jit(make_train_step(model1, tx, OPT_CFG, num_steps=50, sum_real=2, sum_fake=2))
    new1, m1, _ = step1(state1, {"image": x, "label": labels}, rng)

    # 8-device run with the identical local batch on every device.
    # NOTE: the step folds axis_index into the rng for per-device dropout, so
    # exact equality requires deterministic dropout; MiniUniDefense uses
    # dropout only in attention at rate 0.2 — to keep the comparison exact we
    # replicate device 0's rng by folding 0 manually in the reference run.
    model8 = MiniUniDefense(axis_name=DATA_AXIS)
    state8 = create_train_state(model8, tx, rng, x)
    # same init (same rng/model structure) as single device
    chex_equal = jax.tree.map(lambda a, b: np.allclose(a, b), state1.params, state8.params)
    assert all(jax.tree.leaves(chex_equal))

    step8 = make_train_step(
        model8, tx, OPT_CFG, num_steps=50, sum_real=2, sum_fake=2, axis_name=DATA_AXIS
    )
    sharded = shard_train_step(step8, mesh)
    gx = jnp.concatenate([x] * n_dev, axis=0)
    gl = jnp.concatenate([labels] * n_dev, axis=0)
    with mesh:
        new8, m8, cls8 = sharded(state8, {"image": gx, "label": gl}, rng)

    # per-device rngs differ (fold_in axis_index) -> dropout/perturbation
    # noise differs across devices, so pmean'd grads are an average of
    # same-data different-noise grads. Metrics must be close but not equal;
    # params must move in the same direction.
    assert np.isfinite(float(m8["total_loss"]))
    assert cls8.shape[0] == n_dev * 4
    # loss magnitudes comparable
    assert abs(float(m8["cls_loss"]) - float(m1["cls_loss"])) < 1.0


def test_shard_map_exact_with_shared_rng():
    """With the axis_index fold removed (monkeypatch axis fold via identical
    rng), identical per-device batches give EXACTLY the single-device result."""
    n_dev = 8
    mesh = create_mesh(n_dev)
    rng = jax.random.PRNGKey(1)
    x, labels = tiny_batch(seed=3)

    # plain SGD: the parameter delta is exactly -lr * grad, so numerical
    # differences stay tiny (adam-style updates amplify near-zero-grad noise)
    sgd_cfg = dict(OPT_CFG)
    sgd_cfg["optimizer"] = {"name": "sgd", "lr": 0.01, "weight_decay": 0.0}

    model1 = MiniUniDefense()
    shapes = jax.eval_shape(
        lambda: model1.init({"params": rng, "dropout": rng}, x, train=False)
    )
    tx, _ = build_optimizer(sgd_cfg, shapes["params"])
    state1 = create_train_state(model1, tx, rng, x)
    step1 = jax.jit(make_train_step(model1, tx, sgd_cfg, num_steps=50, sum_real=2, sum_fake=2))
    new1, m1, _ = step1(state1, {"image": x, "label": labels}, rng)

    model8 = MiniUniDefense(axis_name=DATA_AXIS)
    state8 = create_train_state(model8, tx, rng, x)
    # fold_axis_rng=False: all devices share one noise stream, so identical
    # per-device batches must reproduce the single-device step exactly
    step8 = make_train_step(
        model8, tx, sgd_cfg, num_steps=50, sum_real=2, sum_fake=2,
        axis_name=DATA_AXIS, fold_axis_rng=False,
    )
    sharded = shard_train_step(step8, mesh)
    gx = jnp.concatenate([x] * n_dev, axis=0)
    gl = jnp.concatenate([labels] * n_dev, axis=0)
    with mesh:
        new8, m8, _ = sharded(state8, {"image": gx, "label": gl}, rng)

    # pass-1 metrics are pure functions of identical inputs -> near-exact.
    # pass-2 metrics run on params AFTER update #1, where pmean-of-identical
    # rounding (1e-8-ish) gets amplified by normalization-heavy losses
    # (factorization divides by tiny early-training stds) -> looser bound.
    pass2_keys = {"freq_mask_loss", "spat_mask_loss", "fac_loss"}
    for k in m1:
        rtol = 0.05 if k in pass2_keys else 2e-3
        np.testing.assert_allclose(float(m8[k]), float(m1[k]), rtol=rtol, atol=2e-4)
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new1.params, new8.params
    )
    assert max(jax.tree.leaves(d)) < 5e-4


def test_split_device_batch_layout():
    ir = np.arange(8).reshape(8, 1)  # 8 real
    fr = np.arange(100, 108).reshape(8, 1)  # 8 fake
    lr_ = np.zeros(8, np.int64)
    lf = np.ones(8, np.int64)
    imgs, lbls = split_device_batch(ir, lr_, fr, lf, num_devices=4)
    # per-device: 2 real then 2 fake
    assert imgs[:2].flatten().tolist() == [0, 1]
    assert imgs[2:4].flatten().tolist() == [100, 101]
    assert lbls[:4].tolist() == [0, 0, 1, 1]
    assert imgs[4:6].flatten().tolist() == [2, 3]


def test_gspmd_2d_matches_single_device():
    """GSPMD 2-D ('data','model') mode (round-3 add): the SAME global-batch
    step (axis_name=None) jitted under a 4x2 mesh with tensor-sharded large
    kernels must reproduce the single-device result — XLA inserts the
    collectives, the math is unchanged (reduction-order tolerance only)."""
    from unidefense_tpu.parallel.mesh import (
        MODEL_AXIS,
        create_mesh_2d,
        gspmd_train_step,
        state_shardings,
    )

    rng = jax.random.PRNGKey(0)
    x, labels = tiny_batch()  # 2 real + 2 fake
    gx = jnp.concatenate([x] * 4, axis=0)       # global batch 16 = 8r + 8f?
    gl = jnp.concatenate([labels] * 4, axis=0)
    # global real-first layout for the axis_name=None step: sort real rows
    # first (labels from tiny_batch are [0,0,1,1] per block)
    order = jnp.argsort(gl, stable=True)
    gx, gl = gx[order], gl[order]
    n_real = int(jnp.sum(gl == 0))

    model = MiniUniDefense()  # no axis_name: global-batch semantics
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, gx, train=False)
    )
    tx, _ = build_optimizer(OPT_CFG, shapes["params"])
    step_fn = make_train_step(
        model, tx, OPT_CFG, num_steps=50,
        sum_real=n_real, sum_fake=int(gl.shape[0]) - n_real,
    )

    # single-device reference
    state1 = create_train_state(model, tx, rng, gx)
    new1, m1, cls1 = jax.jit(step_fn)(state1, {"image": gx, "label": gl}, rng)

    # 4x2 GSPMD
    mesh = create_mesh_2d(8, model_parallel=2)
    assert mesh.shape[MODEL_AXIS] == 2
    state2 = create_train_state(model, tx, rng, gx)
    sharded = gspmd_train_step(step_fn, mesh, state2, min_size=1024)
    new2, m2, cls2 = sharded(state2, {"image": gx, "label": gl}, rng)

    assert np.isfinite(float(m2["total_loss"]))
    np.testing.assert_allclose(float(m2["total_loss"]), float(m1["total_loss"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cls2), np.asarray(cls1),
                               rtol=2e-2, atol=2e-2)
    # params after the two updates agree leaf-wise
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)
    # at least one parameter leaf is actually tensor-sharded over 'model'
    specs = jax.tree.leaves(
        jax.tree.map(lambda l: l.sharding.spec, new2.params,
                     is_leaf=lambda l: hasattr(l, "sharding"))
    )
    assert any(MODEL_AXIS in str(s) for s in specs), specs


def test_hybrid_mesh_single_slice_fallback():
    """create_hybrid_mesh degrades to the 2-D mesh on single-slice/CPU
    topologies (DCN placement only engages with real multi-slice TPUs)."""
    from unidefense_tpu.parallel.mesh import create_hybrid_mesh

    m = create_hybrid_mesh(2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    assert m.axis_names == ("data", "model")
