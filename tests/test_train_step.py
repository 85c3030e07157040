"""Two-pass train step semantics on CPU (mini model, fast compile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import OPT_CFG, MiniUniDefense, tiny_batch
from unidefense_tpu.train.optim import build_optimizer
from unidefense_tpu.train.step import create_train_state, make_eval_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    model = MiniUniDefense()
    rng = jax.random.PRNGKey(0)
    x, labels = tiny_batch()
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False)
    )
    tx, sched = build_optimizer(OPT_CFG, shapes["params"])
    state = create_train_state(model, tx, rng, x)
    return model, tx, sched, state, x, labels, rng


def test_losses_finite_and_decrease(setup):
    model, tx, _, state, x, labels, rng = setup
    step_fn = jax.jit(
        make_train_step(model, tx, OPT_CFG, num_steps=50, sum_real=2, sum_fake=2)
    )
    batch = {"image": x, "label": labels}
    first = None
    for i in range(12):
        state, metrics, cls_out = step_fn(state, batch, jax.random.fold_in(rng, i))
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
            for k, v in first.items():
                assert np.isfinite(v), f"{k} not finite"
    last = {k: float(v) for k, v in metrics.items()}
    assert last["total_loss"] < first["total_loss"]
    assert last["cls_loss"] < first["cls_loss"]
    assert cls_out.shape == (4, 2)


def test_kl_switch_at_ten_percent(setup):
    """Before 10% of num_steps the pass-2 mask loss is the sparsity mean;
    after, it is the KL vs pass-1 masks (abstract_engine.py:330-357)."""
    model, tx, _, state, x, labels, rng = setup
    batch = {"image": x, "label": labels}
    # num_steps=1: step 1 > 0.1 -> KL active immediately
    step_kl = jax.jit(make_train_step(model, tx, OPT_CFG, num_steps=1, sum_real=2, sum_fake=2))
    # num_steps huge: step 1 < 10% -> sparsity mean (equals pass-2 mask mean)
    step_sparse = jax.jit(
        make_train_step(model, tx, OPT_CFG, num_steps=10**6, sum_real=2, sum_fake=2)
    )
    _, m_kl, _ = step_kl(state, batch, rng)
    _, m_sp, _ = step_sparse(state, batch, rng)
    # sparsity mask loss is a sigmoid mean (~0.2-0.8); the KL of nearly
    # identical distributions is near zero -> they must differ
    assert float(m_sp["freq_mask_loss"]) > 0.05
    assert float(m_kl["freq_mask_loss"]) < float(m_sp["freq_mask_loss"])


def test_faithful_vs_fixed_accumulation(setup):
    """faithful=True applies g1+g2 at update 2 (the reference's no-zero-grad
    quirk); faithful=False applies g2 alone. Params must differ."""
    model, tx, _, state, x, labels, rng = setup
    batch = {"image": x, "label": labels}
    kw = dict(num_steps=50, sum_real=2, sum_fake=2)
    s_faith = jax.jit(make_train_step(model, tx, OPT_CFG, faithful_grad_accumulation=True, **kw))
    s_fixed = jax.jit(make_train_step(model, tx, OPT_CFG, faithful_grad_accumulation=False, **kw))
    st1, _, _ = s_faith(state, batch, rng)
    st2, _, _ = s_fixed(state, batch, rng)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), st1.params, st2.params)
    assert max(jax.tree.leaves(diffs)) > 0


def test_batch_stats_updated(setup):
    model, tx, _, state, x, labels, rng = setup
    step_fn = jax.jit(make_train_step(model, tx, OPT_CFG, num_steps=50, sum_real=2, sum_fake=2))
    new_state, _, _ = step_fn(state, {"image": x, "label": labels}, rng)
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.batch_stats, new_state.batch_stats
    )
    assert max(jax.tree.leaves(d)) > 0
    assert int(new_state.step) == int(state.step) + 1


def test_eval_step(setup):
    model, _, _, state, x, labels, rng = setup
    eval_fn = jax.jit(make_eval_step(model))
    probs, cls_out, rec = eval_fn(state.params, state.batch_stats, x)
    assert probs.shape == (4,)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
    # P(real) == softmax[:, 0]
    ref = jax.nn.softmax(cls_out, axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref), atol=1e-6)


def test_perturb_branches():
    from unidefense_tpu.train.perturb import perturb_input

    x, _ = tiny_batch()
    f = jax.jit(lambda k, x: perturb_input(k, x, 2, 2))
    outs = []
    for seed in range(6):
        out = f(jax.random.PRNGKey(seed), x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))
        outs.append(np.asarray(out))
    # different seeds must produce different perturbations
    assert any(not np.allclose(outs[0], o) for o in outs[1:])
