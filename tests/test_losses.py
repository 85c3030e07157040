"""Loss parity tests vs torch reference implementations."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from unidefense_tpu.losses import (
    asymmetric_weighted_triplet,
    binary_cross_entropy_with_logits,
    cross_entropy,
    factorization,
    kl_div_log_target,
    mse,
    soft_margin,
)

RNG = np.random.default_rng(42)


def test_cross_entropy():
    logits = RNG.standard_normal((8, 2)).astype(np.float32)
    labels = RNG.integers(0, 2, 8)
    ref = nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - ref) < 1e-5


def test_bce():
    logits = RNG.standard_normal(8).astype(np.float32)
    tgt = RNG.integers(0, 2, 8).astype(np.float32)
    ref = nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(tgt)).item()
    ours = float(binary_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(tgt)))
    assert abs(ours - ref) < 1e-5


def test_mse():
    a = RNG.standard_normal(10).astype(np.float32)
    b = RNG.standard_normal(10).astype(np.float32)
    ref = nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    assert abs(float(mse(jnp.asarray(a), jnp.asarray(b))) - ref) < 1e-6


def test_kl_div_batchmean_log_target():
    lp = np.log(RNG.dirichlet(np.ones(6), size=4)).astype(np.float32)
    lt = np.log(RNG.dirichlet(np.ones(6), size=4)).astype(np.float32)
    ref = nn.KLDivLoss(reduction="batchmean", log_target=True)(
        torch.from_numpy(lp), torch.from_numpy(lt)
    ).item()
    ours = float(kl_div_log_target(jnp.asarray(lp), jnp.asarray(lt)))
    assert abs(ours - ref) < 1e-5


def test_soft_margin():
    x = RNG.standard_normal(6).astype(np.float32)
    y = np.ones(6, dtype=np.float32)
    ref = nn.SoftMarginLoss()(torch.from_numpy(x), torch.from_numpy(y)).item()
    assert abs(float(soft_margin(jnp.asarray(x), jnp.asarray(y))) - ref) < 1e-4


def _torch_aw_triplet(feat, labels):
    """Reference AW-triplet re-derived (loss/triplet_loss.py:33-82)."""
    eps = 1e-12
    x = torch.from_numpy(feat)
    labels_t = torch.from_numpy(labels)
    m = x.shape[0]
    xx = x.pow(2).sum(1, keepdim=True).expand(m, m)
    dist = xx + xx.t() - 2 * x @ x.t()
    dist = dist.clamp(min=eps).sqrt()
    N = m
    N_real = int((1 - labels_t).sum())
    not_eq = ~torch.eye(N, dtype=torch.bool)
    is_pos = labels_t.expand(N, N).eq(labels_t.expand(N, N).t()) & not_eq
    is_neg = labels_t.expand(N, N).ne(labels_t.expand(N, N).t())
    dist_ap = dist[:N_real][is_pos[:N_real]].reshape(N_real, -1)
    dist_an = dist[:N_real][is_neg[:N_real]].reshape(N_real, -1)
    exp_ap, exp_an = torch.exp(dist_ap), torch.exp(-dist_an)
    wp = exp_ap / (exp_ap.sum(1, keepdim=True) + eps)
    wn = exp_an / (exp_an.sum(1, keepdim=True) + eps)
    fwp = (wp * dist_ap).sum(1)
    fwn = (wn * dist_an).sum(1)
    return nn.SoftMarginLoss()(fwn - fwp, torch.ones_like(fwn)).item()


def test_aw_triplet_matches_reference():
    n_real, n_fake, d = 4, 6, 16
    feat = RNG.standard_normal((n_real + n_fake, d)).astype(np.float32)
    labels = np.array([0] * n_real + [1] * n_fake, dtype=np.int64)
    ref = _torch_aw_triplet(feat, labels)
    ours = float(
        asymmetric_weighted_triplet(jnp.asarray(feat), jnp.asarray(labels), n_real=n_real)
    )
    # f32 exp/sqrt differences between torch and XLA amplify slightly through
    # the softmax weighting; 2e-3 relative is well inside training noise
    assert abs(ours - ref) < 2e-3 * max(1.0, abs(ref))


def test_factorization_matches_reference():
    def torch_fac(a, b, w=0.005, eps=1e-6):
        a = torch.from_numpy(a)
        b = torch.from_numpy(b)
        an = (a - a.mean(0)) / (a.std(0) + eps)
        bn = (b - b.mean(0)) / (b.std(0) + eps)
        c = an.T @ bn / a.shape[0]
        on = torch.diagonal(c).add(-1).pow(2).mean()
        n = c.shape[0]
        off = c.flatten()[:-1].view(n - 1, n + 1)[:, 1:].flatten().pow(2).mean()
        return (on + w * off).item()

    a = RNG.standard_normal((8, 12)).astype(np.float32)
    b = RNG.standard_normal((8, 12)).astype(np.float32)
    ref = torch_fac(a, b)
    ours = float(factorization(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) < 1e-3  # f32 normalization-path differences
