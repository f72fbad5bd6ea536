"""Tracking-time visual-inertial frame optimization with a marginalization
prior.

Replaces the reference's motion-prior tracking optimizations
(ref: Optimizer::PoseInertialOptimizationLastKeyFrame src/Optimizer.cc:7479,
PoseInertialOptimizationLastFrame :7874, the Schur marginalization
Marginalize :5187 and the resulting 15-dim prior ConstraintPoseImu /
EdgePriorPoseImu src/G2oTypes.h:703-783).

One jit'd solver covers both reference variants:

  - anchor = last KEYFRAME, `anchor_fixed=True`: the anchor's 15-dim block
    is frozen, exactly the LastKeyFrame variant (the ref fixes VP1/VV1/VG1/
    VA1).
  - anchor = last FRAME with a 15-dim prior (H, state) from the previous
    solve, `anchor_fixed=False`: the LastFrame variant; afterwards the
    anchor block is marginalized out of the final 30x30 Hessian, producing
    the next frame's ConstraintPoseImu.

State per vertex: 15 dims (dp, dphi, dv, dbg, dba) with body-frame
right-multiplicative increments (p' = p + Rwb dp, R' = Rwb Exp(dphi)) —
the same parameterization as solve/inertial_ba.py, so the inertial-edge
residual/Jacobian machinery is shared. Visual reprojection edges act only
on the current frame ("only-pose" edges, ref EdgeMonoOnlyPose
G2oTypes.h:387) with analytic Jacobians; body != camera extrinsics (Tbc)
are first-class: X_cam = Rcb @ X_body + tcb.

Round structure mirrors the reference: 4 rounds x 10 iterations with
per-round chi2 outlier re-classification at a LOOSENING schedule
(chi2Mono {12, 7.5, 5.991, 5.991}, chi2Stereo {15.6, 9.8, 7.815, 7.815} —
Optimizer.cc:7537-7540), robust Huber weights dropped on the last round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.lie import so3_exp, so3_log, hat
from ..core.linalg import spd_solve
from ..core.robust import huber_cost, huber_weight
from .inertial_ba import _edge_residual_of_eps
from .reproj import PINHOLE, cam_residual

CHI2_MONO_SCHED = (12.0, 7.5, 5.991, 5.991)
CHI2_STEREO_SCHED = (15.6, 9.8, 7.815, 7.815)


def _visual_parts(Rwb, p, X, uvr, inv_sigma2, stereo, use,
                  Rcb, tcb, fx, fy, cx, cy, bf, chi2_mono, chi2_stereo,
                  robust, cam=PINHOLE, is_right=None):
    """Only-pose reprojection residuals + Jacobians wrt the frame's
    (dp, dphi) body increments, through the camera<-body extrinsic.

    X_b = Rwb^T (X - p);  X_c = Rcb X_b + tcb
    dXc/ddp = -Rcb,  dXc/ddphi = Rcb hat(X_b).
    """
    dtype = X.dtype
    Xb = (X - p) @ Rwb                      # row-wise Rwb^T (X - p)
    Xc = Xb @ Rcb.T + tcb
    # camera-generic residual rows (ref: G2oTypes.cc EdgeMonoOnlyPose
    # projects through pCamera)
    r, Jproj, z = cam_residual(Xc, uvr, stereo, fx, fy, cx, cy, bf,
                               cam, is_right)
    nRcb = jnp.broadcast_to(-Rcb, Xb.shape + (3,))
    dXc = jnp.concatenate([nRcb, jnp.einsum("ij,njk->nik", Rcb, hat(Xb))], -1)
    J = Jproj @ dXc                                             # [N,3,6]
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    chi2_th = jnp.where(stereo, chi2_stereo, chi2_mono).astype(dtype)
    w_rob = huber_weight(chi2, chi2_th) if robust else jnp.ones_like(chi2)
    w = w_rob * inv_sigma2 * use.astype(dtype) * (z > 0).astype(dtype)
    return r, J, w, chi2, z


def _prior_residual_of_eps(eps, R, p, v, bg, ba, Rp, pp, vp, bgp, bap):
    """15-dim prior residual (ref EdgePriorPoseImu G2oTypes.h:748):
    anchor state vs. the stored linearization state of the constraint."""
    Rn = R @ so3_exp(eps[3:6])
    pn = p + R @ eps[0:3]
    er = so3_log(Rp.T @ Rn)
    ep = Rp.T @ (pn - pp)
    ev = v + eps[6:9] - vp
    ebg = bg + eps[9:12] - bgp
    eba = ba + eps[12:15] - bap
    return jnp.concatenate([ep, er, ev, ebg, eba])


_prior_jac = jax.jacfwd(_prior_residual_of_eps)
_edge_jac1 = jax.jacfwd(_edge_residual_of_eps, argnums=(0, 1))


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters", "cam"))
def pose_inertial_solve(
    # anchor body state (last KF or last frame)
    R1, p1, v1, bg1, ba1,
    # current-frame body state initialization
    R2, p2, v2, bg2, ba2,
    # visual observations of the current frame
    X, uvr, inv_sigma2, stereo, valid,
    # inertial edge anchor->frame (preintegration dict + 9x9 info)
    pre, info9, bg0, ba0, rw_info_g, rw_info_a,
    # 15-dim prior on the anchor (zeros H disables; KF variant)
    prior_H, prior_R, prior_p, prior_v, prior_bg, prior_ba,
    anchor_fixed,                       # traced bool: freeze anchor block
    # camera<-body extrinsic + intrinsics
    Rcb, tcb, fx, fy, cx, cy, bf,
    n_rounds: int = 4, n_iters: int = 10,
    cam=PINHOLE, is_right=None,
):
    """Returns (R2, p2, v2, bg2, ba2, inliers, H15, n_inliers).

    H15 is the current frame's marginal information (anchor block Schur-
    eliminated from the final 30x30 Hessian) — the next frame's
    ConstraintPoseImu. inliers is the final visual inlier mask.
    """
    dtype = X.dtype
    eyeD = jnp.eye(30, dtype=dtype)
    z15 = jnp.zeros(15, dtype)
    free1 = jnp.where(anchor_fixed, 0.0, 1.0).astype(dtype)
    freeF = jnp.concatenate([jnp.full(15, 1.0, dtype) * free1,
                             jnp.ones(15, dtype)])

    def build(state, use, chi2_mono, chi2_stereo, robust):
        R1_, p1_, v1_, bg1_, ba1_, R2_, p2_, v2_, bg2_, ba2_ = state
        H = jnp.zeros((30, 30), dtype)
        b = jnp.zeros(30, dtype)
        # visual (frame block = dims 15..21)
        r, J, w, _, _ = _visual_parts(
            R2_, p2_, X, uvr, inv_sigma2, stereo, use, Rcb, tcb,
            fx, fy, cx, cy, bf, chi2_mono, chi2_stereo, robust,
            cam, is_right)
        JW = J * w[:, None, None]
        H = H.at[15:21, 15:21].add(jnp.einsum("nij,nik->jk", JW, J))
        b = b.at[15:21].add(-jnp.einsum("nij,ni->j", JW, r))
        # inertial edge (bias of the edge = anchor's bias, ref EdgeInertial)
        args = (R1_, p1_, v1_, bg1_, ba1_, R2_, p2_, v2_, bg0, ba0, pre)
        ri = _edge_residual_of_eps(z15, z15, *args)
        J1, J2 = _edge_jac1(z15, z15, *args)
        J1W = J1.T @ info9
        J2W = J2.T @ info9
        H = H.at[:15, :15].add(J1W @ J1)
        H = H.at[:15, 15:].add(J1W @ J2)
        H = H.at[15:, :15].add(J2W @ J1)
        H = H.at[15:, 15:].add(J2W @ J2)
        b = b.at[:15].add(-J1W @ ri)
        b = b.at[15:].add(-J2W @ ri)
        # bias random-walk edges anchor->frame (ref EdgeGyroRW/EdgeAccRW)
        eye3 = jnp.eye(3, dtype=dtype)
        for s1, s2, diff, inf in (
            (slice(9, 12), slice(24, 27), bg2_ - bg1_, rw_info_g),
            (slice(12, 15), slice(27, 30), ba2_ - ba1_, rw_info_a),
        ):
            Iw = inf * eye3
            H = H.at[s1, s1].add(Iw)
            H = H.at[s2, s2].add(Iw)
            H = H.at[s1, s2].add(-Iw)
            H = H.at[s2, s1].add(-Iw)
            b = b.at[s1].add(inf * diff)
            b = b.at[s2].add(-inf * diff)
        # prior edge on the anchor
        rp = _prior_residual_of_eps(
            z15, R1_, p1_, v1_, bg1_, ba1_,
            prior_R, prior_p, prior_v, prior_bg, prior_ba)
        Jp = _prior_jac(
            z15, R1_, p1_, v1_, bg1_, ba1_,
            prior_R, prior_p, prior_v, prior_bg, prior_ba)
        JpW = Jp.T @ prior_H
        H = H.at[:15, :15].add(JpW @ Jp)
        b = b.at[:15].add(-JpW @ rp)
        return H, b

    def apply_dx(state, dx):
        R1_, p1_, v1_, bg1_, ba1_, R2_, p2_, v2_, bg2_, ba2_ = state
        d1, d2 = dx[:15], dx[15:]
        return (
            R1_ @ so3_exp(d1[3:6]), p1_ + R1_ @ d1[0:3], v1_ + d1[6:9],
            bg1_ + d1[9:12], ba1_ + d1[12:15],
            R2_ @ so3_exp(d2[3:6]), p2_ + R2_ @ d2[0:3], v2_ + d2[6:9],
            bg2_ + d2[9:12], ba2_ + d2[12:15],
        )

    def cost_terms(state, use, chi2_mono, chi2_stereo, robust):
        """PER-TERM cost vector (visual obs, inertial edge, RW edges,
        prior) — f32-safe LM acceptance differences per term before
        reducing (the round-3 visual-solver lesson: at f32 a genuine
        small improvement vanishes below the resolution of two large
        totals and every step rejects)."""
        R1_, p1_, v1_, bg1_, ba1_, R2_, p2_, v2_, bg2_, ba2_ = state
        _, _, _, chi2, z = _visual_parts(
            R2_, p2_, X, uvr, inv_sigma2, stereo, use, Rcb, tcb,
            fx, fy, cx, cy, bf, chi2_mono, chi2_stereo, robust,
            cam, is_right)
        chi2_th = jnp.where(stereo, chi2_stereo, chi2_mono).astype(dtype)
        c_v = jnp.where(use & (z > 0),
                        huber_cost(chi2, chi2_th) if robust else chi2, 0.0)
        ri = _edge_residual_of_eps(
            z15, z15, R1_, p1_, v1_, bg1_, ba1_, R2_, p2_, v2_,
            bg0, ba0, pre)
        c_i = ri @ info9 @ ri
        c_rwg = rw_info_g * jnp.sum((bg2_ - bg1_) ** 2)
        c_rwa = rw_info_a * jnp.sum((ba2_ - ba1_) ** 2)
        rp = _prior_residual_of_eps(
            z15, R1_, p1_, v1_, bg1_, ba1_,
            prior_R, prior_p, prior_v, prior_bg, prior_ba)
        c_pr = rp @ prior_H @ rp
        return jnp.concatenate([c_v, jnp.stack([c_i, c_rwg, c_rwa, c_pr])])

    state = (R1, p1, v1, bg1, ba1, R2, p2, v2, bg2, ba2)
    use = valid
    for rnd in range(n_rounds):
        cm = CHI2_MONO_SCHED[min(rnd, len(CHI2_MONO_SCHED) - 1)]
        cs = CHI2_STEREO_SCHED[min(rnd, len(CHI2_STEREO_SCHED) - 1)]
        robust = rnd < n_rounds - 1

        def body(i, carry, use=use, cm=cm, cs=cs, robust=robust):
            # Levenberg-Marquardt with accept/reject (the reference runs
            # plain GN here, Optimizer.cc:7545, but in double; at f32 an
            # undamped 30-dim step through the mixed-scale H oscillates —
            # relative Marquardt damping + per-term acceptance keep every
            # iterate no worse than its predecessor)
            st, lam = carry
            H, b = build(st, use, cm, cs, robust)
            Hm = H * (freeF[:, None] * freeF[None, :])
            Hm = Hm + jnp.diag(1.0 - freeF) + 1e-8 * eyeD
            dx = spd_solve(Hm, b * freeF, damping=lam) * freeF
            st2 = apply_dx(st, dx)
            delta = jnp.sum(cost_terms(st2, use, cm, cs, robust)
                            - cost_terms(st, use, cm, cs, robust))
            accept = delta < 0
            st = jax.tree.map(lambda a_, b_: jnp.where(accept, a_, b_),
                              st2, st)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-6, 1e2)
            return st, lam

        state, _ = jax.lax.fori_loop(
            0, n_iters, body, (state, jnp.asarray(1e-4, dtype)))
        # re-classify on ALL valid obs with this round's threshold
        _, _, _, chi2, z = _visual_parts(
            state[5], state[6], X, uvr, inv_sigma2, stereo, valid,
            Rcb, tcb, fx, fy, cx, cy, bf, cm, cs, False, cam, is_right)
        chi2_th = jnp.where(stereo, cs, cm).astype(dtype)
        use = valid & (chi2 <= chi2_th) & (z > 0)

    # final Hessian over inliers (non-robust) -> marginalize anchor.
    # f32-robust: the anchor block mixes visual-scale (fx^2) and
    # bias-prior-scale entries — Jacobi-scale before factorizing (ref
    # Marginalize Optimizer.cc:5187 runs in double and skips this).
    H, _ = build(state, use, CHI2_MONO_SCHED[-1], CHI2_STEREO_SCHED[-1],
                 False)
    H = H * (freeF[:, None] * freeF[None, :])   # fixed anchor decouples
    H11 = H[:15, :15]
    d11 = jnp.diagonal(H11)
    good = (d11 > 0) & jnp.isfinite(d11)
    s11 = jnp.where(good, jax.lax.rsqrt(jnp.where(good, d11, 1.0)), 1.0)
    A = H11 * s11[:, None] * s11[None, :] + 1e-6 * jnp.eye(15, dtype=dtype)
    B12 = s11[:, None] * H[:15, 15:]
    H15 = H[15:, 15:] - B12.T @ jnp.linalg.solve(A, B12)
    H15 = 0.5 * (H15 + H15.T)
    return (state[5], state[6], state[7], state[8], state[9],
            use, H15, jnp.sum(use))
