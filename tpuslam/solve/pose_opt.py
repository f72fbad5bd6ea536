"""Motion-only pose optimization (the tracking-time solver).

Replaces Optimizer::PoseOptimization (ref: src/Optimizer.cc:854-1168):
4 rounds x 10 Levenberg-Marquardt iterations on one SE(3) pose, Huber
kernel with deltaMono=sqrt(5.991) / deltaStereo=sqrt(7.815), and outlier
re-classification between rounds (chi2 gate per level sigma2); outliers
are excluded from the next round but re-tested every round. After round 3
the Huber kernel is dropped (ref: Optimizer.cc:1083 'its[it]=10 ...
if(it==2) e->setRobustKernel(0)').

Like g2o's OptimizationAlgorithmLevenberg (the reference's actual solver),
each iteration is a DAMPED step with cost-based accept/reject and an
adaptive lambda — not plain Gauss-Newton. Beyond parity, the damping is
what keeps the solve stable at f32 (the TPU dtype): under low-parallax
geometry H is nearly rank-deficient along the rotation/translation
ambiguity, and an undamped f32 step wanders in that null space frame to
frame, which reads as scale drift on forward motion.

Everything is one jit'd lax loop: fixed 4x10 structure, masks instead of
edge removal. Each round's inner loop early-exits once an accepted step's
norm drops below tolerance (g2o likewise terminates when the update
stalls); on TPU this cuts the sequential dependency chain — the
frame-rate bottleneck — by ~2-3x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import spd_solve
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_cost, huber_weight
from .reproj import PINHOLE, project_residuals

ROUNDS = 4
ITERS = 10


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters", "cam"))
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
    damping: float = 1e-4,
    step_tol: float = 1e-16,
    cam=PINHOLE,
    is_right=None,
):
    """Returns (R, t, inlier_mask, chi2_per_obs).

    X [N,3], uvr [N,3], inv_sigma2 [N] (1/1.2^(2*octave)), is_stereo [N],
    valid [N] (existing match mask). `damping` is the INITIAL relative
    LM lambda (adapted by accept/reject within each round).
    """
    dtype = X.dtype
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO).astype(dtype)

    def normal_eqs(R, t, use, robust):
        r, J, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf, cam, is_right)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w = jnp.where(robust, huber_weight(chi2, chi2_th), 1.0)
        w = w * inv_sigma2 * use.astype(dtype)
        w = jnp.where(z > 0, w, 0.0)  # depth-positivity (ref: isDepthPositive)
        JW = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", JW, J)
        b = -jnp.einsum("nij,ni->j", JW, r)
        return H, b

    def cost_terms(R, t, use, robust):
        """Per-observation robustified cost [N] (0 where unused)."""
        r, _, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf, cam, is_right)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        c = huber_cost(chi2, chi2_th) if robust else chi2
        ok = use & (z > 0)
        return jnp.where(ok, c, 0.0)

    R, t = R0, t0
    use = valid
    for rnd in range(n_rounds):
        robust = rnd < n_rounds - 1  # last round: plain quadratic

        def cond(carry, tol=jnp.asarray(step_tol, dtype)):
            i, _, _, _, sq = carry
            return (i < n_iters) & (sq > tol)

        def body(carry, use=use, robust=robust):
            i, Rc, tc, lam, _ = carry
            H, b = normal_eqs(Rc, tc, use, robust)
            dx = spd_solve(H, b, damping=lam)
            dR, dt = lie.se3_exp(dx)
            Rn = dR @ Rc
            tn = dR @ tc + dt
            # f32-safe acceptance: sum the PER-OBS cost differences, not
            # the difference of two large sums — at f32 a genuine small
            # improvement vanishes below the total's resolution, every
            # step gets rejected and the solver freezes at the prior pose
            delta = jnp.sum(
                cost_terms(Rn, tn, use, robust)
                - cost_terms(Rc, tc, use, robust))
            accept = delta < 0
            Rc = jnp.where(accept, Rn, Rc)
            tc = jnp.where(accept, tn, tc)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-7, 1e2
            ).astype(dtype)
            # early-exit on the norm of an ACCEPTED step; rejected steps
            # keep iterating (lam grows until a step is accepted or the
            # round budget runs out)
            sq = jnp.where(accept, jnp.sum(dx * dx), jnp.asarray(jnp.inf, dtype))
            return i + 1, Rc, tc, lam, sq

        lam0 = jnp.asarray(damping, dtype)
        _, R, t, _, _ = jax.lax.while_loop(
            cond, body,
            (0, R, t, lam0, jnp.asarray(jnp.inf, dtype)),
        )
        # outlier re-classification on ALL valid obs (ref: Optimizer.cc:1100+)
        r, _, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf, cam, is_right)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        use = valid & (chi2 <= chi2_th) & (z > 0)
    r, _, _, z = project_residuals(R, t, X, uvr, is_stereo, fx, fy, cx, cy, bf, cam, is_right)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    inliers = valid & (chi2 <= chi2_th) & (z > 0)
    return R, t, inliers, chi2
