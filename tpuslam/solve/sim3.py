"""Sim(3)/SE(3) alignment: batched Horn closed form, RANSAC, GN refinement.

Replaces the reference Sim3Solver (src/Sim3Solver.cc:39 ctor, :152 iterate,
:316 ComputeSim3 — Horn 1987 quaternion method on 3-point samples, inliers
by two-way reprojection) and Optimizer::OptimizeSim3 (src/Optimizer.cc:3734
— GN on (s,R,t) with both-direction reprojection edges).

TPU-shaped: RANSAC hypotheses are a batch dimension (all minimal sets
solved in one eigh dispatch), inlier counting is one masked matmul-like
reduction; no sequential hypothesis loop.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.linalg import spd_solve

from ..core.lie import hat, so3_exp


def horn_sim3(X1, X2, fix_scale: bool = False):
    """Closed-form s,R,t with X2 ~ s R X1 + t. Batched over leading dims:
    X1, X2 [..., N, 3]. Horn's quaternion method (ref ComputeSim3 :316)."""
    c1 = X1.mean(-2, keepdims=True)
    c2 = X2.mean(-2, keepdims=True)
    d1 = X1 - c1
    d2 = X2 - c2
    M = jnp.einsum("...ni,...nj->...ij", d2, d1)  # maps 1 -> 2
    # batched Kabsch: R = U diag(1,1,det(U V^T)) V^T (equivalent optimum to
    # Horn's quaternion eigenproblem, one batched SVD dispatch on device)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    fix = jnp.concatenate(
        [jnp.ones(det.shape + (2,), X1.dtype), det[..., None]], -1)
    R = (U * fix[..., None, :]) @ Vt
    Rd1 = jnp.einsum("...ij,...nj->...ni", R, d1)
    if fix_scale:
        s = jnp.ones(X1.shape[:-2], X1.dtype)
    else:
        s = jnp.sum(d2 * Rd1, (-1, -2)) / jnp.maximum(
            jnp.sum(d1 * d1, (-1, -2)), 1e-12)
    t = c2[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c1[..., 0, :])
    return s, R, t


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale", "cam"))
def sim3_ransac(X1, X2, valid, uv1, uv2, inv_s2_1, inv_s2_2,
                fx, fy, cx, cy, key, n_hyp: int = 256,
                fix_scale: bool = False, th_chi2: float = 9.21,
                cam=None):
    """RANSAC Sim3 between matched 3D point sets, inliers by two-way
    reprojection (ref Sim3Solver::CheckInliers).

    X1/X2 [N,3] points in camera frames 1/2; valid [N]; uv1/uv2 [N,2]
    observed pixels; inv_s2_* [N] per-match information.
    Returns dict(s, R, t (2<-1), inliers [N] bool, n_inliers).
    """
    N = X1.shape[0]
    idx = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(valid.sum(), 1))
    order = jnp.argsort(~valid)  # valid first
    pick = order[idx]            # [H,3]
    s, R, t = horn_sim3(X1[pick], X2[pick], fix_scale=fix_scale)  # [H,...]

    def count(s, R, t):
        X1in2 = s[..., None, None] * jnp.einsum("hij,nj->hni", R, X1) + t[:, None, :]
        si = 1.0 / jnp.maximum(s, 1e-12)
        Rt = jnp.swapaxes(R, -1, -2)
        X2in1 = si[..., None, None] * jnp.einsum(
            "hij,hnj->hni", Rt, X2[None] - t[:, None, :])
        def proj(X):
            if cam is not None and cam.kind == "kb8":
                from ..cameras.kb8 import kb8_project
                return kb8_project((fx, fy, cx, cy) + tuple(cam.k), X)
            z = jnp.maximum(X[..., 2], 1e-6)
            return jnp.stack([fx * X[..., 0] / z + cx,
                              fy * X[..., 1] / z + cy], -1)
        e2 = jnp.sum((proj(X1in2) - uv2) ** 2, -1) * inv_s2_2
        e1 = jnp.sum((proj(X2in1) - uv1) ** 2, -1) * inv_s2_1
        inl = (e1 < th_chi2) & (e2 < th_chi2) & valid \
            & (X1in2[..., 2] > 0) & (X2in1[..., 2] > 0)
        return inl

    inl = count(s, R, t)  # [H,N]
    n_inl = inl.sum(-1)
    best = jnp.argmax(n_inl)
    sB, RB, tB, inlB = s[best], R[best], t[best], inl[best]
    nB = n_inl[best]

    # LO-RANSAC: iterated all-inlier Horn refit with inlier regrowth.
    # Minimal 3-point hypotheses are fit in 3D, where mono depth noise
    # lives, so raw hypotheses rarely reach consensus on noisy maps even
    # when the verification gate (reprojection) would accept the true
    # transform; refitting on the grown inlier set fixes that (the
    # reference's equivalent polish is OptimizeSim3 after iterate()).
    def refit_once(carry):
        sB, RB, tB, inlB, nB = carry
        m = inlB.astype(X1.dtype)
        c1 = (X1 * m[:, None]).sum(0) / jnp.maximum(m.sum(), 3.0)
        c2 = (X2 * m[:, None]).sum(0) / jnp.maximum(m.sum(), 3.0)
        # masked refit: outliers collapsed to the centroids (zero residual)
        Xe1 = jnp.where(m[:, None] > 0, X1, c1)
        Xe2 = jnp.where(m[:, None] > 0, X2, c2)
        sF, RF, tF = horn_sim3(Xe1[None], Xe2[None], fix_scale=fix_scale)
        sF, RF, tF = sF[0], RF[0], tF[0]
        inlF = count(sF[None], RF[None], tF[None])[0]
        better = inlF.sum() >= nB
        return (
            jnp.where(better, sF, sB),
            jnp.where(better, RF, RB),
            jnp.where(better, tF, tB),
            jnp.where(better, inlF, inlB),
            jnp.maximum(inlF.sum(), nB),
        )

    for _ in range(4):
        sB, RB, tB, inlB, nB = refit_once((sB, RB, tB, inlB, nB))
    return dict(s=sB, R=RB, t=tB, inliers=inlB, n_inliers=inlB.sum())


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale", "cam"))
def optimize_sim3(s0, R0, t0, X1, X2, valid, uv1, uv2, inv_s2_1, inv_s2_2,
                  fx, fy, cx, cy, n_iters: int = 10,
                  fix_scale: bool = False, th_chi2: float = 10.0,
                  cam=None):
    """GN refinement of Sim3 (2<-1) minimizing two-way reprojection error
    (ref: Optimizer::OptimizeSim3 src/Optimizer.cc:3734 — EdgeSim3ProjectXYZ
    + EdgeInverseSim3ProjectXYZ, Huber-free with chi2 gating per iter).

    Parameterization: right-increment (rho, phi, sigma):
    S' = S * exp(...); here we use s'=s e^sigma, R'=R Exp(phi),
    t'=t + R rho (s applied to X side).
    Returns (s, R, t, inliers, n_inliers).
    """
    dtype = X1.dtype

    def residuals(theta, s, R, t):
        ds = jnp.exp(theta[6]) if not fix_scale else 1.0
        s2 = s * ds
        R2 = R @ so3_exp(theta[3:6])
        t2 = t + R @ theta[0:3]
        X1in2 = s2 * (X1 @ R2.T) + t2
        X2in1 = (1.0 / s2) * ((X2 - t2) @ R2)
        def proj(X):
            if cam is not None and cam.kind == "kb8":
                from ..cameras.kb8 import kb8_project
                return kb8_project((fx, fy, cx, cy) + tuple(cam.k), X)
            z = jnp.maximum(X[..., 2], 1e-6)
            return jnp.stack([fx * X[..., 0] / z + cx,
                              fy * X[..., 1] / z + cy], -1)
        r2 = (proj(X1in2) - uv2) * jnp.sqrt(inv_s2_2)[:, None]
        r1 = (proj(X2in1) - uv1) * jnp.sqrt(inv_s2_1)[:, None]
        return jnp.concatenate([r1, r2], 0), (X1in2[:, 2] > 0) & (X2in1[:, 2] > 0)

    def body(carry, it):
        s, R, t, inl = carry
        z7 = jnp.zeros(7, dtype)
        r, posz = residuals(z7, s, R, t)
        chi = jnp.sum(r.reshape(2, -1, 2) ** 2, -1)  # [2,N]
        ok = (chi < th_chi2).all(0) & valid & posz
        # early iterations: Huber-weight everything (ref runs 5 its with
        # robust kernels before pruning, Optimizer.cc:3860-3905)
        gate = it >= n_iters // 2
        chi_max = jnp.maximum(chi.max(0), 1e-9)
        w_h = jnp.minimum(1.0, jnp.sqrt(th_chi2 / chi_max))
        w = jnp.where(gate, ok.astype(dtype), w_h * (valid & posz))
        w2 = jnp.concatenate([w, w])
        J = jax.jacfwd(lambda th: residuals(th, s, R, t)[0])(z7)  # [2N,2,7]
        Jf = J.reshape(-1, 7) * w2.repeat(2)[:, None]
        rf = r.reshape(-1)
        H = Jf.T @ (J.reshape(-1, 7))
        b = -Jf.T @ rf
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-8 * jnp.eye(7, dtype=dtype) \
            + 1e-6 * jnp.diag(jnp.diag(H))
        dth = spd_solve(H, b)
        s = s * (jnp.exp(dth[6]) if not fix_scale else 1.0)
        t = t + R @ dth[0:3]
        R = R @ so3_exp(dth[3:6])
        return (s, R, t, ok), None

    (s, R, t, inl), _ = jax.lax.scan(
        body, (s0, R0, t0, valid), jnp.arange(n_iters))
    # final inlier classification at the refined transform
    r, posz = residuals(jnp.zeros(7, dtype), s, R, t)
    chi = jnp.sum(r.reshape(2, -1, 2) ** 2, -1)
    inl = (chi < th_chi2).all(0) & valid & posz
    return s, R, t, inl, inl.sum()
