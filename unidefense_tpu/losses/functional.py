"""Loss functions as pure JAX ops.

Registry parity with the reference loss package (loss/__init__.py:11-18):
mse, bce, factorization, cross_entropy, aw_triplet, kl_div(batchmean,
log_target). Everything is a stateless function so the whole two-pass
training objective jits into a single XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels (nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return jnp.mean(nll)


def binary_cross_entropy_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """nn.BCEWithLogitsLoss parity (mean reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return jnp.mean(-(targets * log_p + (1.0 - targets) * log_not_p))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def kl_div_log_target(log_pred: jnp.ndarray, log_target: jnp.ndarray) -> jnp.ndarray:
    """nn.KLDivLoss(reduction='batchmean', log_target=True) parity:
    sum(exp(log_t) * (log_t - log_p)) / batch_size."""
    t = jnp.exp(log_target)
    return jnp.sum(t * (log_target - log_pred)) / log_pred.shape[0]


def soft_margin(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """nn.SoftMarginLoss parity: mean(log(1 + exp(-y*x)))."""
    return jnp.mean(jax.nn.softplus(-y * x))


def _euclidean_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise euclidean distance (m, d) x (n, d) -> (m, n), clamped for
    numerical stability (loss/triplet_loss.py:16-30)."""
    xx = jnp.sum(x**2, axis=1, keepdims=True)
    yy = jnp.sum(y**2, axis=1, keepdims=True).T
    dist = xx + yy - 2.0 * (x @ y.T)
    return jnp.sqrt(jnp.clip(dist, min=_EPS))


def asymmetric_weighted_triplet(
    features: jnp.ndarray, labels: jnp.ndarray, n_real: int
) -> jnp.ndarray:
    """Asymmetrical Weighted Triplet loss (loss/triplet_loss.py:33-82).

    Anchors are the first `n_real` (real, label==0) rows; the batch contract —
    real samples precede fake samples — is enforced by the engines
    (engine/forgery_engine.py:261-264). `n_real` must be a static int so the
    positive/negative gathers have static shapes under jit.

    For each real anchor, positives are the other reals and negatives are all
    fakes; distances are softmax-weighted and fed to a soft-margin loss.
    """
    n = features.shape[0]
    dist = _euclidean_dist(features, features)  # (n, n)
    anchor_rows = dist[:n_real]  # (n_real, n)

    # Positives: other real columns (exclude self). Static masks; we rebuild
    # the (n_real, n_real-1) / (n_real, n-n_real) gathers with slicing since
    # real-first ordering makes them contiguous.
    pos_full = anchor_rows[:, :n_real]  # (n_real, n_real) includes self (d=0)
    # Drop the diagonal: shift each row left past its own index.
    idx = jnp.arange(n_real - 1)[None, :] + (jnp.arange(n_real)[:, None] <= jnp.arange(n_real - 1)[None, :])
    dist_ap = jnp.take_along_axis(pos_full, idx, axis=1)  # (n_real, n_real-1)
    dist_an = anchor_rows[:, n_real:]  # (n_real, n_fake)

    exp_ap = jnp.exp(dist_ap)
    exp_an = jnp.exp(-dist_an)
    wp = exp_ap / (jnp.sum(exp_ap, axis=1, keepdims=True) + _EPS)
    wn = exp_an / (jnp.sum(exp_an, axis=1, keepdims=True) + _EPS)

    final_wp = jnp.sum(wp * dist_ap, axis=1)
    final_wn = jnp.sum(wn * dist_an, axis=1)
    return soft_margin(final_wn - final_wp, jnp.ones_like(final_wn))


def factorization(
    emb_a: jnp.ndarray, emb_b: jnp.ndarray, off_diag_weight: float = 0.005, eps: float = 1e-6
) -> jnp.ndarray:
    """Barlow-Twins-style cross-correlation loss (loss/calib_loss.py:5-28):
    mean((diag(C)-1)^2) + w * mean(offdiag(C)^2) with C the normalized
    cross-correlation between the two embeddings.

    torch .std(0) is unbiased (ddof=1); match it.
    """
    a = (emb_a - emb_a.mean(axis=0)) / (emb_a.std(axis=0, ddof=1) + eps)
    b = (emb_b - emb_b.mean(axis=0)) / (emb_b.std(axis=0, ddof=1) + eps)
    c = (a.T @ b) / emb_a.shape[0]
    d = c.shape[0]
    diag = jnp.diagonal(c)
    on_diag = jnp.mean((diag - 1.0) ** 2)
    off_sum = jnp.sum(c**2) - jnp.sum(diag**2)
    off_diag = off_sum / (d * d - d)
    return on_diag + off_diag_weight * off_diag


LOSSES = {
    "mse": mse,
    "bce": binary_cross_entropy_with_logits,
    "factorization": factorization,
    "cross_entropy": cross_entropy,
    "aw_triplet": asymmetric_weighted_triplet,
    "kl_div": kl_div_log_target,
}


def get_loss(name: str = "cross_entropy"):
    """Registry lookup, same names as the reference (loss/__init__.py:6-18)."""
    if name not in LOSSES:
        raise KeyError(f"Loss '{name}' not found; available: {sorted(LOSSES)}")
    return LOSSES[name]
