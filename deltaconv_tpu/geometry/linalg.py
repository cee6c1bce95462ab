"""Batched small-matrix linear algebra, written the TPU way.

Everything here is closed-form or statically unrolled so that batched
3x3 eigendecompositions and 6x6 Cholesky solves compile to pure
elementwise VPU code (one fused XLA computation over the batch), instead
of the sequential per-matrix LAPACK-style loops a naive
``jnp.linalg.eigh`` / ``jnp.linalg.solve`` would cost on TPU.

Replaces the reference's ``torch.linalg.svd`` basis estimation
(/root/reference/deltaconv/geometry/grad_div_mls.py:29) and
``torch.linalg.inv`` of batched 6x6 WLS systems
(grad_div_mls.py:143) with numerically safer equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["eigh3x3", "chol_solve"]


def _eigvals3x3_sym(A):
    """Analytic eigenvalues of symmetric 3x3 matrices, ascending.

    Trigonometric method (Smith 1961). ``A``: [..., 3, 3]. Returns
    ``(w0, w1, w2)`` with ``w0 <= w1 <= w2``, each shaped ``[...]``.
    """
    dtype = A.dtype
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, jnp.asarray(0.0, dtype)))
    # Guard against p == 0 (scalar matrix): eigenvalues are all q.
    safe_p = jnp.where(p > 0, p, jnp.asarray(1.0, dtype))

    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    # det(B) / 2 where B = (A - q I) / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    w1 = 3.0 * q - w2 - w0
    return w0, w1, w2


def _eigvec_for(A, lam):
    """Eigenvector of symmetric 3x3 ``A`` for eigenvalue ``lam``.

    Uses the most numerically stable cross product of rows of
    ``A - lam I`` (the cross of two independent rows of a rank-2 matrix
    spans its null space). Falls back to a canonical axis when the
    eigenvalue is (near-)degenerate so no NaNs are produced; callers
    re-orthonormalize downstream.
    """
    dtype = A.dtype
    r0 = A[..., 0, :] - lam[..., None] * jnp.array([1.0, 0.0, 0.0], dtype)
    r1 = A[..., 1, :] - lam[..., None] * jnp.array([0.0, 1.0, 0.0], dtype)
    r2 = A[..., 2, :] - lam[..., None] * jnp.array([0.0, 0.0, 1.0], dtype)

    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)

    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)

    best01 = (n01 >= n02) & (n01 >= n12)
    best02 = (~best01) & (n02 >= n12)
    v = jnp.where(best01[..., None], c01, jnp.where(best02[..., None], c02, c12))
    vnorm2 = jnp.sum(v * v, axis=-1, keepdims=True)

    # Degenerate fallback: any unit vector is an eigenvector.
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), v.shape)
    tiny = jnp.asarray(1e-20, dtype)
    v = jnp.where(vnorm2 > tiny, v, fallback)
    vnorm2 = jnp.where(vnorm2 > tiny, vnorm2, jnp.ones_like(vnorm2))
    return v / jnp.sqrt(vnorm2)


def eigh3x3(A):
    """Closed-form symmetric 3x3 eigendecomposition, batched.

    Args:
      A: ``[..., 3, 3]`` symmetric matrices.

    Returns:
      ``(w, V)``: eigenvalues ``[..., 3]`` ascending and eigenvectors
      ``[..., 3, 3]`` with ``V[..., :, i]`` the unit eigenvector for
      ``w[..., i]``. Entirely elementwise -> fuses on the VPU.
    """
    w0, w1, w2 = _eigvals3x3_sym(A)
    v0 = _eigvec_for(A, w0)
    v2 = _eigvec_for(A, w2)
    # Middle eigenvector as the cross product: exactly orthogonal to both.
    v1 = jnp.cross(v2, v0)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = v1 / jnp.maximum(n1, jnp.asarray(1e-20, A.dtype))
    w = jnp.stack([w0, w1, w2], axis=-1)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def chol_solve(A, rhs):
    """Solve ``A x = rhs`` for SPD ``A`` via statically unrolled Cholesky.

    Args:
      A: ``[..., n, n]`` SPD matrices (n is a static Python int, e.g. 6).
      rhs: ``[..., n, m]`` right-hand sides.

    Returns:
      ``x``: ``[..., n, m]``.

    The factorization and triangular solves are unrolled over the static
    ``n`` so the whole solve is a fixed DAG of elementwise ops over the
    batch — the idiomatic TPU replacement for the reference's explicit
    ``torch.linalg.inv`` of batched 6x6 matrices
    (/root/reference/deltaconv/geometry/grad_div_mls.py:143).
    """
    n = A.shape[-1]
    tiny = jnp.asarray(1e-20, A.dtype)

    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = a[j][j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(jnp.maximum(s, tiny))
        inv_diag[j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = a[i][j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv_diag[j]

    # Forward substitution: L y = rhs
    y = [None] * n
    for i in range(n):
        t = rhs[..., i, :]
        for kk in range(i):
            t = t - L[i][kk][..., None] * y[kk]
        y[i] = t * inv_diag[i][..., None]

    # Back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for kk in range(i + 1, n):
            t = t - L[kk][i][..., None] * x[kk]
        x[i] = t * inv_diag[i][..., None]

    return jnp.stack(x, axis=-2)
