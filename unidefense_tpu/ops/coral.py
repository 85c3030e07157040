"""CORAL per-sample color transfer.

JAX re-design of utils/operation.py:6-45: whiten the source's 3x3 channel
covariance and re-color with the target's. The matrices are 3x3, so the SVDs
are trivial; the op is vmapped over the batch so the whole perturbation branch
stays inside one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unidefense_tpu.ops.eig3 import sym_eig3x3


def _mat_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful 'matrix sqrt' (utils/operation.py:15-17).

    Faithfulness quirk: the reference unpacks torch.linalg.svd as (U, D, V)
    and computes U @ diag(sqrt(D)) @ V.t() — but linalg.svd's third output is
    Vh, so it actually evaluates U sqrt(D) Vh^T = U sqrt(D) U (for the
    symmetric PSD covariances fed to it, where Vh = U^T up to per-column
    signs that cancel). That is NOT the symmetric matrix square root; every
    reference training ran with this behaviour (coral is always on in pass 2
    via preserve_color=True), so we replicate it exactly.

    Implementation: analytic 3x3 symmetric eigendecomposition (ops/eig3.py,
    descending eigenvalues = SVD order) instead of jnp.linalg.svd — the
    iterative SVD lowering is the single most expensive op in the
    perturbation branch on TPU.

    Sign-convention note: U sqrt(D) U is NOT invariant to per-column
    eigenvector sign flips, so the reference's output is itself defined only
    relative to LAPACK's (unspecified) sign choices. We use a deterministic
    canonical convention (largest component positive); the transform is a
    statistically equivalent color perturbation either way.
    """
    d, u = sym_eig3x3(x)
    return (u * jnp.sqrt(jnp.maximum(d, 0.0))[..., None, :]) @ u


def _mat_inv_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """inverse of the quirky sqrt: (U sqrt(D) U)^-1 = U^T D^-1/2 U^T for
    orthogonal U — computed directly, no linear solve."""
    d, u = sym_eig3x3(x)
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    return (u.T * inv_sqrt_d[..., None, :]) @ u.T


def _flatten_mean_std(feat: jnp.ndarray):
    """HWC image -> (3, HW) flattened channels with mean/std per channel.

    torch .std() uses the unbiased (ddof=1) estimator; match it.
    """
    f = feat.reshape(-1, feat.shape[-1]).T  # (3, HW)
    mean = f.mean(axis=-1, keepdims=True)
    std = f.std(axis=-1, keepdims=True, ddof=1)
    return f, mean, std


def coral_single(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """CORAL transfer for one HWC image pair (utils/operation.py:20-45)."""
    dtype = source.dtype
    source = source.astype(jnp.float32)
    target = target.astype(jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)

    sf, sm, ss = _flatten_mean_std(source)
    s_norm = (sf - sm) / ss
    s_cov = s_norm @ s_norm.T + eye

    tf, tm, ts = _flatten_mean_std(target)
    t_norm = (tf - tm) / ts
    t_cov = t_norm @ t_norm.T + eye

    transfer = _mat_sqrt(t_cov) @ (_mat_inv_sqrt(s_cov) @ s_norm)
    out = transfer * ts + tm
    return out.T.reshape(source.shape).astype(dtype)


def coral(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Batched CORAL over NHWC stacks (vmap of :func:`coral_single`)."""
    return jax.vmap(coral_single)(source, target)
