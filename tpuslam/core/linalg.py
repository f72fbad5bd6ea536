"""f32-robust dense linear solves for normal equations.

TPUs compute in f32 (f64 is unsupported on the MXU and demoted by default),
while the reference runs g2o in double (Thirdparty/g2o linear_solver_eigen.h
sparse Cholesky on double). Gauss-Newton normal matrices H = J^T W J from
reprojection Jacobians are often conditioned at 1e6-1e9 (fx^2-scaled pixel
terms vs unit rotation terms), which loses most of f32's 24-bit mantissa in
a raw solve and can diverge the tracker.

`spd_solve` restores g2o-grade behavior at f32 cost:
  * symmetric Jacobi (diagonal) preconditioning D^-1/2 H D^-1/2 — drops the
    condition number to the "physical" one (typically 1e2-1e4);
  * damping applied on the SCALED system => Marquardt's scale-invariant
    lambda * diag(H) damping;
  * Cholesky solve (H is SPD by construction);
  * one step of iterative refinement in the scaled space (recovers ~2x the
    effective mantissa of a plain solve);
  * non-finite guard: a failed factorization (or inf/nan inputs) returns
    dx = 0 instead of poisoning the optimization state. Callers that loop
    keep iterating from the previous iterate, which matches g2o's
    reject-step behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spd_solve(H, b, damping: float = 0.0, refine: bool = True):
    """Solve (H + damping*diag(H)) dx = b for SPD H of shape [..., n, n].

    `damping` is RELATIVE (Marquardt-style): it scales the diagonal, so it
    is invariant to the scaling of H. Returns dx with the same batch shape
    as b; non-finite results are replaced by zeros.
    """
    dtype = H.dtype
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    # non-positive / non-finite diagonals mark dead variables (masked-out or
    # broken): scale by 1 here, zero their dx below
    good = (d > 0) & jnp.isfinite(d)
    s = jnp.where(good, jax.lax.rsqrt(jnp.where(good, d, 1.0)), 1.0)
    Hs = H * s[..., :, None] * s[..., None, :]
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    # scaled diag == 1, so this is relative (Marquardt) damping; the base
    # term sits at ~sqrt(eps) of the dtype so it never dominates real damping
    base = 1e-7 if dtype in (jnp.float32, jnp.bfloat16) else 1e-13
    Hs = Hs + (damping + base) * eye
    bs = b * s
    L = jnp.linalg.cholesky(Hs)
    y = jax.scipy.linalg.cho_solve((L, True), bs)
    if refine:
        y = y + jax.scipy.linalg.cho_solve((L, True), bs - _matvec(Hs, y))
    dx = y * s * good.astype(dtype)
    ok = jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True)
    return jnp.where(ok, jnp.where(jnp.isfinite(dx), dx, 0.0), 0.0)


def _matvec(A, x):
    return jnp.einsum("...ij,...j->...i", A, x)


def masked_spd_solve(H, b, free, damping: float = 0.0):
    """spd_solve on the sub-system selected by boolean mask `free` [..., n]:
    fixed rows/cols are replaced by identity and dx there is 0."""
    dtype = H.dtype
    m2 = free[..., :, None] & free[..., None, :]
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    Hm = jnp.where(m2, H, 0.0) + jnp.where(free[..., :, None], 0.0, eye)
    bm = jnp.where(free, b, 0.0)
    return spd_solve(Hm, bm, damping=damping) * free.astype(dtype)
