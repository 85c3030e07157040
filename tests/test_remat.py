"""Rematerialization must be semantics-preserving: identical outputs and
gradients, lower peak memory (checked structurally by the transform applying
cleanly on both backbones)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.models.resnet import ResNetStage, BasicBlock


def _stage(remat):
    return ResNetStage(block_cls=BasicBlock, planes=8, num_blocks=2, stride=1,
                       freq_norm="ortho", remat=remat)


def test_resnet_stage_remat_matches():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 8), jnp.float32)
    m0, m1 = _stage(False), _stage(True)
    v = m0.init({"params": rng, "dropout": rng}, x, True)

    def loss(m, params, bs):
        out, _ = m.apply({"params": params, "batch_stats": bs}, x, True,
                         mutable=["batch_stats"])
        return jnp.sum(out**2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p, v["batch_stats"]))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p, v["batch_stats"]))(v["params"])
    assert np.isclose(float(l0), float(l1))
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_efficientnet_remat_builds():
    from unidefense_tpu.models.efficientnet import EfficientNet

    m = EfficientNet(model_name="efficientnet-b0", include_top=False,
                     freq_norm=None, remat=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(m.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, x, train=False
    )

    def loss(p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                         train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(v["params"])
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(g)[0])))
