"""Analytic symmetric 3x3 eigendecomposition (batched, pure elementwise ops).

jnp.linalg.svd/eigh lower to iterative algorithms that are slow (and flaky)
on the axon TPU backend; CORAL only ever factorises 3x3 symmetric
positive-definite channel covariances, which have a closed form: eigenvalues
via the trigonometric (Cardano) solution of the characteristic cubic,
eigenvectors via Cayley-Hamilton ((A-λ2 I)(A-λ3 I) has columns parallel to
v1). Everything is vectorised element-wise math — it fuses into the
surrounding jitted step with no custom calls.

Returns eigenvalues in DESCENDING order to match torch/jnp SVD ordering,
which the reference's quirky `_mat_sqrt` (see ops/coral.py) depends on.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def sym_eig3x3(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a: (..., 3, 3) symmetric -> (eigvals (..., 3) descending,
    eigvecs (..., 3, 3) with eigvecs[..., :, i] the i-th eigenvector)."""
    a = a.astype(jnp.float32)
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a_q = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    b = a_q / p[..., None, None]
    detb = jnp.linalg.det(b)  # 3x3 det: closed-form cofactor expansion in XLA
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    eigvals = jnp.stack([e1, e2, e3], axis=-1)  # descending

    eye = jnp.eye(3, dtype=a.dtype)

    def eigvec(lam_j, lam_k):
        # Cayley-Hamilton: (A - λj I)(A - λk I) columns ∝ remaining eigenvector
        m = (a - lam_j[..., None, None] * eye) @ (a - lam_k[..., None, None] * eye)
        norms = jnp.sum(m * m, axis=-2)  # column norms (..., 3)
        best = jnp.argmax(norms, axis=-1)
        col = jnp.take_along_axis(m, best[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
        return col / jnp.sqrt(jnp.maximum(jnp.sum(col * col, axis=-1, keepdims=True), _EPS))

    v1 = eigvec(e2, e3)
    v2 = eigvec(e1, e3)
    v3 = eigvec(e1, e2)
    eigvecs = jnp.stack([v1, v2, v3], axis=-1)  # columns

    # canonical signs: largest-|component| of each eigenvector positive.
    # (Downstream CORAL uses the sign-DEPENDENT quirky product U sqrt(D) U,
    # so a deterministic convention is required; see ops/coral.py.)
    comp = jnp.argmax(jnp.abs(eigvecs), axis=-2)
    lead = jnp.take_along_axis(eigvecs, comp[..., None, :], axis=-2)[..., 0, :]
    eigvecs = eigvecs * jnp.sign(jnp.where(lead == 0, 1.0, lead))[..., None, :]

    # degenerate fallback (p ≈ 0: A ≈ q I): identity basis
    degen = (p2 < 1e-10)[..., None, None]
    eigvecs = jnp.where(degen, eye, eigvecs)
    return eigvals, eigvecs
