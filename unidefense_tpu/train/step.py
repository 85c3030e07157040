"""The UniDefense two-pass training step as one jittable function.

This reproduces engine/abstract_engine.py:207-381 (`train_unidefense_model`)
— the algorithm every reference engine calls — as a single pure function
`state, batch, rng -> state', metrics`:

  pass 1 (clean):    forward, CE + mask-sparsity + AW-triplet + real-only
                     pixel/rFFT reconstruction losses; optimizer update #1.
                     The pass-1 masks and bottleneck embedding are detached
                     as targets for pass 2.
  pass 2 (perturbed): forward on a style/pixel-perturbed input; after 10% of
                     total steps the mask losses switch to KL consistency
                     against the detached pass-1 masks; factorization loss
                     against the detached pass-1 embedding; optimizer
                     update #2 *in the same step*.

Faithfulness quirks, replicated by default and switchable via
`faithful_grad_accumulation`:
* the reference zeroes gradients once per step, so update #2 applies the
  SUM of pass-1 and pass-2 gradients (engine/forgery_engine.py:241 +
  abstract_engine.py:281,374);
* GradScaler(2**10) with autocast disabled (abstract_engine.py:132,208) is a
  mathematical no-op in fp32 — scale is multiplied in and divided back out —
  so no loss scaling is implemented here (bf16 compute keeps fp32 master
  params and fp32 gradient accumulation, which needs no scaler).

Data parallelism: pass `axis_name='data'` (and build the model with the same
axis_name) to run this step under shard_map over a 1-D mesh — gradients and
scalar metrics are `lax.pmean`-ed across devices, which together with the
axis-synced BatchNorm replaces DDP + SyncBatchNorm + reduce_tensor
(engine/forgery_engine.py:51,142, utils/misc.py:18-22).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unidefense_tpu.losses import (
    asymmetric_weighted_triplet,
    binary_cross_entropy_with_logits,
    cross_entropy,
    factorization,
    kl_div_log_target,
)
from unidefense_tpu.train.perturb import perturb_input


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # completed train steps (0 at init)
    params: Any
    batch_stats: Any
    opt_state: Any
    # metric-fed LR multiplier (ReduceLROnPlateau): None = 1.0. Set by the
    # engine after validation via state.replace(lr_scale=...); scales the
    # final optimizer updates exactly like torch scaling group['lr'].
    lr_scale: Any = None


def create_train_state(model, tx, rng, sample_x) -> TrainState:
    # init is jitted into one XLA program: eager init dispatches hundreds of
    # tiny ops, which is pathological over a remote-device link.
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = jax.jit(model.init, static_argnames=("train",))(rngs, sample_x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.jit(tx.init)(params),
    )


def _classification_loss(cls_out, labels):
    if cls_out.shape[-1] == 1:
        return binary_cross_entropy_with_logits(cls_out[:, 0], labels.astype(cls_out.dtype))
    return cross_entropy(cls_out, labels)


def _shared_losses(out, labels, sum_real, sum_fake):
    """Losses computed identically in both passes
    (abstract_engine.py:232-259 / :301-328)."""
    ld = out["loss_dict"]
    triplet = sum(
        asymmetric_weighted_triplet(f.astype(jnp.float32), labels, sum_real)
        for f in ld["triplet"]
    )
    spatial = ld["spatial"]
    freq = ld["freq"]
    losses = {
        "cls_loss": _classification_loss(out["cls_out"].astype(jnp.float32), labels),
        "triplet_loss": triplet,
        "real_rec_loss": jnp.mean(spatial[:sum_real]),
        "fake_rec_loss": jnp.mean(spatial[sum_real : sum_real + sum_fake]),
        "real_freq_loss": jnp.mean(freq[:sum_real]),
        "fake_freq_loss": jnp.mean(freq[sum_real : sum_real + sum_fake]),
    }
    return losses


def _flat_log_softmax(m):
    m = m.reshape(m.shape[0], -1).astype(jnp.float32)
    return jax.nn.log_softmax(m, axis=-1)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config_cfg: dict,
    num_steps: int,
    sum_real: int,
    sum_fake: int,
    faithful_grad_accumulation: bool = True,
    preserve_color: bool = True,
    freq_norm: str = "ortho",
    axis_name: Optional[str] = None,
    preprocess: Optional[Callable] = None,
    fold_axis_rng: bool = True,
) -> Callable:
    """Build the two-pass step. config_cfg supplies the lambda loss weights
    (config_template/forgery/model_udeb4.yml:12-16; default 1.0 like the
    reference's .get(key, 1.))."""
    lam_mask = float(config_cfg.get("lambda_mask", 1.0))
    lam_triplet = float(config_cfg.get("lambda_triplet", 1.0))
    lam_recons = float(config_cfg.get("lambda_recons", 1.0))
    lam_freq = float(config_cfg.get("lambda_freq", 1.0))
    lam_fac = float(config_cfg.get("lambda_fac", 1.0))
    kl_switch_step = num_steps * 0.1

    def apply_model(params, batch_stats, x, noise_x, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables,
            x,
            noise_x=noise_x,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return out, mutated["batch_stats"]

    def pass1_loss(params, batch_stats, x, labels, rng):
        out, new_stats = apply_model(params, batch_stats, x, None, rng)
        ld = out["loss_dict"]
        losses = _shared_losses(out, labels, sum_real, sum_fake)
        freq_mask_loss = jnp.mean(ld["freq_mask"].astype(jnp.float32))
        spat_mask_loss = jnp.mean(ld["spat_mask"].astype(jnp.float32))
        total = (
            losses["cls_loss"]
            + lam_mask * freq_mask_loss
            + lam_mask * spat_mask_loss
            + lam_triplet * losses["triplet_loss"]
            + lam_recons * losses["real_rec_loss"]
            + lam_freq * losses["real_freq_loss"]
        )
        gts = {
            "freq_mask": jax.lax.stop_gradient(ld["freq_mask"]),
            "spat_mask": jax.lax.stop_gradient(ld["spat_mask"]),
            "factorization": jax.lax.stop_gradient(ld["factorization"].astype(jnp.float32)),
        }
        aux = dict(losses)
        aux["total_loss"] = total
        return total, (new_stats, gts, aux, out["cls_out"])

    def pass2_loss(params, batch_stats, x, noise_x, labels, rng, gts, use_kl):
        out, new_stats = apply_model(params, batch_stats, x, noise_x, rng)
        ld = out["loss_dict"]
        losses = _shared_losses(out, labels, sum_real, sum_fake)

        # mask consistency: sparsity before 10% of steps, KL after
        # (abstract_engine.py:330-357)
        freq_kl = kl_div_log_target(
            _flat_log_softmax(ld["freq_mask"]), _flat_log_softmax(gts["freq_mask"])
        )
        spat_kl = kl_div_log_target(
            _flat_log_softmax(ld["spat_mask"]), _flat_log_softmax(gts["spat_mask"])
        )
        freq_sparse = jnp.mean(ld["freq_mask"].astype(jnp.float32))
        spat_sparse = jnp.mean(ld["spat_mask"].astype(jnp.float32))
        freq_mask_loss = jnp.where(use_kl, freq_kl, freq_sparse)
        spat_mask_loss = jnp.where(use_kl, spat_kl, spat_sparse)

        fac_loss = factorization(
            ld["factorization"].astype(jnp.float32), gts["factorization"]
        )

        total = (
            0.1 * losses["cls_loss"]
            + lam_mask * freq_mask_loss
            + lam_mask * spat_mask_loss
            + lam_triplet * losses["triplet_loss"]
            + lam_recons * 0.1 * losses["real_rec_loss"]
            + lam_freq * 0.1 * losses["real_freq_loss"]
            + lam_fac * fac_loss
        )
        aux = {
            "freq_mask_loss": freq_mask_loss,
            "spat_mask_loss": spat_mask_loss,
            "fac_loss": fac_loss,
        }
        return total, (new_stats, aux)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        x = batch["image"]
        labels = batch["label"]
        if axis_name is not None and fold_axis_rng:
            # per-device noise streams (dropout/perturbation), like per-rank
            # torch RNG under DDP; fold_axis_rng=False shares one stream
            # across devices (used by the exactness tests)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        k1, k2, kp, kpre = jax.random.split(rng, 4)
        if preprocess is not None:
            # fused device-side augmentation (normalize/flip) — the uint8
            # batch crosses the host->device boundary, not the float one
            x = preprocess(x, kpre)
        cur_step = state.step + 1  # 1-indexed like the reference loop

        # ---- pass 1 (clean) ----
        grad_fn1 = jax.value_and_grad(pass1_loss, has_aux=True)
        (_, (stats1, gts, aux1, cls_out)), g1 = grad_fn1(
            state.params, state.batch_stats, x, labels, k1
        )
        if axis_name is not None:
            g1 = jax.lax.pmean(g1, axis_name)
        updates1, opt_state1 = tx.update(g1, state.opt_state, state.params)
        if state.lr_scale is not None:
            updates1 = jax.tree.map(lambda u: u * state.lr_scale, updates1)
        params1 = optax.apply_updates(state.params, updates1)

        # ---- pass 2 (perturbed) ----
        # pure data augmentation: no parameters involved, so cut it out of
        # the AD graph entirely (the reference computes it under no_grad /
        # on parameter-free ops, model/unidefense.py:177-198)
        noise_x = jax.lax.stop_gradient(
            perturb_input(
                kp, x, sum_real, sum_fake, preserve_color=preserve_color,
                freq_norm=freq_norm,
            )
        )
        use_kl = cur_step > kl_switch_step
        grad_fn2 = jax.value_and_grad(pass2_loss, has_aux=True)
        (_, (stats2, aux2)), g2 = grad_fn2(
            params1, stats1, x, noise_x, labels, k2, gts, use_kl
        )
        if axis_name is not None:
            g2 = jax.lax.pmean(g2, axis_name)
        if faithful_grad_accumulation:
            g2 = jax.tree.map(jnp.add, g1, g2)
        updates2, opt_state2 = tx.update(g2, opt_state1, params1)
        if state.lr_scale is not None:
            updates2 = jax.tree.map(lambda u: u * state.lr_scale, updates2)
        params2 = optax.apply_updates(params1, updates2)

        new_state = TrainState(
            step=cur_step, params=params2, batch_stats=stats2, opt_state=opt_state2,
            lr_scale=state.lr_scale,
        )
        metrics = {**aux1, **aux2}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics, cls_out

    return train_step


def make_normal_train_step(
    model,
    tx: optax.GradientTransformation,
    config_cfg: dict,
    sum_real: int,
    sum_fake: int,
    axis_name: Optional[str] = None,
    preprocess: Optional[Callable] = None,
) -> Callable:
    """Single-pass training step (train_normal_model,
    engine/abstract_engine.py:131-205): one forward/backward/update with
    CE + triplet + real-only recon losses, plus the aux_cls_loss /
    aux_spatial / aux_freq hooks for models that emit them. Dead code in the
    reference's current engines but part of the API surface (SURVEY.md §2.2).
    """
    lam_triplet = float(config_cfg.get("lambda_triplet", 1.0))
    lam_recons = float(config_cfg.get("lambda_recons", 1.0))
    lam_freq = float(config_cfg.get("lambda_freq", 1.0))
    lam_aux_cls = float(config_cfg.get("lambda_aux_cls", 1.0))

    def loss_fn(params, batch_stats, x, labels, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, x, train=True, rngs={"dropout": rng}, mutable=["batch_stats"]
        )
        ld = out.get("loss_dict", {})
        losses = _shared_losses(out, labels, sum_real, sum_fake)
        total = (
            losses["cls_loss"]
            + lam_triplet * losses["triplet_loss"]
            + lam_recons * losses["real_rec_loss"]
            + lam_freq * losses["real_freq_loss"]
        )
        # aux hooks (abstract_engine.py:173-185); aux_spatial/aux_freq are
        # real-only by contract and enter at 0.1x weight
        if ld.get("aux_cls_loss") is not None:
            total = total + lam_aux_cls * ld["aux_cls_loss"]
        if ld.get("aux_spatial") is not None:
            total = total + 0.1 * lam_recons * jnp.mean(ld["aux_spatial"])
        if ld.get("aux_freq") is not None:
            total = total + 0.1 * lam_freq * jnp.mean(ld["aux_freq"])
        aux = dict(losses)
        aux["total_loss"] = total
        return total, (mutated["batch_stats"], aux, out["cls_out"])

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        x = batch["image"]
        labels = batch["label"]
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        k1, kpre = jax.random.split(rng)
        if preprocess is not None:
            x = preprocess(x, kpre)
        (_, (stats, aux, cls_out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, labels, k1
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if state.lr_scale is not None:
            updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=stats, opt_state=opt_state,
            lr_scale=state.lr_scale,
        )
        metrics = aux
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics, cls_out

    return train_step


def make_eval_step(model, preprocess: Optional[Callable] = None) -> Callable:
    """Inference step: P(real) = softmax(cls_out)[:, 0]
    (engine/forgery_engine.py:350). Returns (probs, cls_out, rec)."""

    def eval_step(params, batch_stats, x, rng=None):
        if preprocess is not None:
            x = preprocess(x, rng)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        probs = jax.nn.softmax(out["cls_out"].astype(jnp.float32), axis=-1)[:, 0]
        return probs, out["cls_out"], out["rec"]

    return eval_step
