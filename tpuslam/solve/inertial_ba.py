"""Visual-inertial bundle adjustment.

Replaces the reference's inertial optimizations built on custom g2o types
(ref: Optimizer::FullInertialBA src/Optimizer.cc:420, LocalInertialBA
:4574; vertices/edges in src/G2oTypes.h: VertexPose/VertexVelocity/
VertexGyroBias/VertexAccBias, EdgeInertial:492, EdgeGyroRW:632,
EdgeAccRW:668, EdgePriorGyro/Acc:784-833).

State per keyframe: 15 dims — body pose (Rwb, p; right-multiplicative
body-frame increments like ImuCamPose::Update), velocity v, gyro bias bg,
acc bias ba. Landmarks are marginalized with the same pair-scatter Schur
machinery as visual BA; the reduced system is dense [15K x 15K] with
tridiagonal-block inertial coupling.

Reprojection Jacobians are analytic; inertial-edge Jacobians come from
jax.jacfwd on the residual's increment parameterization (exact, no hand
derivation to get wrong; the edge count is small so autodiff cost is
negligible next to the reprojection part).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.lie import so3_exp, hat
from ..core.linalg import spd_solve
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_weight, huber_cost
from ..imu.preintegration import inertial_residual
from .ba import _inv3x3, build_obs_pairs
from .reproj import PINHOLE, cam_residual


def _reproj_parts(Rwb, p, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                  fx, fy, cx, cy, bf, robust, Rcb=None, tcb=None,
                  cam=PINHOLE, is_right=None):
    """Residuals + Jacobians wrt body-frame increments (dp, dphi) and X.

    Xb = Rwb^T (X - p); Xc = Rcb Xb + tcb (camera<-body extrinsic; identity
    when Rcb/tcb are None). Updates: p'=p+Rwb dp, Rwb'=Rwb Exp(dphi)
    =>  dXc/ddp = -Rcb, dXc/ddphi = Rcb hat(Xb), dXc/dX = Rcb Rwb^T.
    """
    dtype = X.dtype
    Rk = Rwb[obs_kf]
    pk = p[obs_kf]
    Xo = X[obs_pt]
    Xb = jnp.einsum("oji,oj->oi", Rk, Xo - pk)  # Rwb^T (X - p)
    if Rcb is None:
        Xc = Xb
    else:
        Xc = Xb @ Rcb.T + tcb
    # camera-generic residual rows (ref: the reference projects every
    # VI visual edge through GeometricCamera — G2oTypes.cc EdgeMono)
    r, Jproj, z = cam_residual(Xc, uvr, stereo, fx, fy, cx, cy, bf,
                               cam, is_right)
    if Rcb is None:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Xb.shape + (3,))
        dXc_du = jnp.concatenate([-eye, hat(Xb)], -1)  # [O,3,6]
        Jl = Jproj @ jnp.swapaxes(Rk, -1, -2)          # wrt X
    else:
        nRcb = jnp.broadcast_to(-Rcb, Xb.shape + (3,))
        dXc_du = jnp.concatenate(
            [nRcb, jnp.einsum("ij,ojk->oik", Rcb, hat(Xb))], -1)
        Jl = Jproj @ jnp.einsum("ij,okj->oik", Rcb, Rk)  # Rcb @ Rk^T
    Jp = Jproj @ dXc_du                             # wrt (dp, dphi)
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    chi2_th = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(dtype)
    w_rob = huber_weight(chi2, chi2_th) if robust else jnp.ones_like(chi2)
    w = w_rob * inv_sigma2 * valid.astype(dtype) * (z > 0).astype(dtype)
    cost = jnp.where(valid & (z > 0),
                     huber_cost(chi2, chi2_th) if robust else chi2, 0.0)
    # PER-OBS cost terms; callers sum (f32-safe accept tests difference
    # per-term before reducing)
    return r, Jp, Jl, w, cost


def _edge_residual_of_eps(eps1, eps2, Rwb1, p1, v1, bg1, ba1, Rwb2, p2, v2,
                          bg0, ba0, pre):
    """Inertial residual as a function of the two 15-dim increments
    (dp, dphi, dv, dbg, dba) — autodiff target."""
    R1 = Rwb1 @ so3_exp(eps1[3:6])
    P1 = p1 + Rwb1 @ eps1[0:3]
    V1 = v1 + eps1[6:9]
    BG = bg1 + eps1[9:12]
    BA = ba1 + eps1[12:15]
    R2 = Rwb2 @ so3_exp(eps2[3:6])
    P2 = p2 + Rwb2 @ eps2[0:3]
    V2 = v2 + eps2[6:9]
    return inertial_residual(R1, P1, V1, R2, P2, V2, BG, BA, bg0, ba0, pre)


_edge_jac = jax.vmap(
    jax.jacfwd(_edge_residual_of_eps, argnums=(0, 1)),
    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
             {k: 0 for k in ["dR", "dV", "dP", "JRg", "JVg", "JVa", "JPg",
                             "JPa", "C", "dT"]}),
)
_edge_res = jax.vmap(
    _edge_residual_of_eps,
    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
             {k: 0 for k in ["dR", "dV", "dP", "JRg", "JVg", "JVa", "JPg",
                             "JPa", "C", "dT"]}),
)


def _inertial_parts(Rwb, p, v, bg, ba, edges_a, edges_b, pre_stack, bg0, ba0,
                    info9):
    """Residuals r [E,9], Jacobians J1, J2 [E,9,15] for the inertial chain.
    Bias of edge = bias of the FIRST keyframe (ref EdgeInertial uses VG1/VA1)."""
    z15 = jnp.zeros(15, Rwb.dtype)
    args = (
        Rwb[edges_a], p[edges_a], v[edges_a], bg[edges_a], ba[edges_a],
        Rwb[edges_b], p[edges_b], v[edges_b],
        bg0[edges_a], ba0[edges_a], pre_stack,
    )
    r = _edge_res(z15, z15, *args)
    J1, J2 = _edge_jac(z15, z15, *args)
    return r, J1, J2, info9


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "robust", "opt_bias", "opt_vel",
                     "prior_g", "prior_a", "cam", "lam_floor"),
)
def vi_ba_solve(
    Rwb, p, v, bg, ba, X,
    obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
    edges_a, edges_b, pre_stack, info9, bg0, ba0,
    fixed_pose, pair_a, pair_b,
    fx, fy, cx, cy, bf,
    rw_info_g, rw_info_a,        # [E] scalars (bias random-walk info)
    Rcb=None, tcb=None,          # camera<-body extrinsic (None = identity)
    prior_g: float = 0.0, prior_a: float = 0.0,
    n_iters: int = 10, robust: bool = True,
    opt_bias: bool = True, opt_vel: bool = True,
    cam=PINHOLE, is_right=None, lam_floor: float = 1e-7,
):
    """Damped GN loop for visual-inertial BA. Returns (Rwb,p,v,bg,ba,X,cost).

    fixed_pose [K] freezes the full 15-dim block of a KF.
    prior_g/prior_a: zero-mean bias priors (ref FullInertialBA priorG/priorA,
    Optimizer.cc:426 — used by the IMU-init schedule 1e2/1e10, 1/1e5, 0/0).
    """
    K = Rwb.shape[0]
    P = X.shape[0]
    D = 15
    dtype = X.dtype

    def build_and_step(state, lam):
        Rwb, p, v, bg, ba, X = state
        r, Jp6, Jl, w, cost_v = _reproj_parts(
            Rwb, p, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, True if robust else False, Rcb, tcb,
            cam, is_right,
        )
        # landmark blocks
        Jl_w = Jl * w[:, None, None]
        Hll = jnp.zeros((P, 3, 3), dtype).at[obs_pt].add(
            jnp.einsum("oij,oik->ojk", Jl_w, Jl))
        bl = jnp.zeros((P, 3), dtype).at[obs_pt].add(
            -jnp.einsum("oij,oi->oj", Jl_w, r))
        Jp_w = Jp6 * w[:, None, None]
        # pose blocks into 15-dim layout (first 6 dims)
        Hpp6 = jnp.zeros((K, 6, 6), dtype).at[obs_kf].add(
            jnp.einsum("oij,oik->ojk", Jp_w, Jp6))
        bp6 = jnp.zeros((K, 6), dtype).at[obs_kf].add(
            -jnp.einsum("oij,oi->oj", Jp_w, r))
        H = jnp.zeros((K, K, D, D), dtype)
        b = jnp.zeros((K, D), dtype)
        H = H.at[jnp.arange(K), jnp.arange(K), :6, :6].add(Hpp6)
        b = b.at[:, :6].add(bp6)
        # inertial edges
        ri, J1, J2, _ = _inertial_parts(
            Rwb, p, v, bg, ba, edges_a, edges_b, pre_stack, bg0, ba0, info9)
        J1W = jnp.einsum("eij,ejk->eik", jnp.swapaxes(J1, 1, 2), info9)  # [E,15,9]
        H = H.at[edges_a, edges_a].add(J1W @ J1)
        H = H.at[edges_a, edges_b].add(J1W @ J2)
        J2W = jnp.einsum("eij,ejk->eik", jnp.swapaxes(J2, 1, 2), info9)
        H = H.at[edges_b, edges_a].add(J2W @ J1)
        H = H.at[edges_b, edges_b].add(J2W @ J2)
        b = b.at[edges_a].add(-jnp.einsum("eij,ej->ei", J1W, ri))
        b = b.at[edges_b].add(-jnp.einsum("eij,ej->ei", J2W, ri))
        cost_i = jnp.sum(jnp.einsum("ei,eij,ej->e", ri, info9, ri))
        # bias random-walk edges: r = b_next - b_prev (ref EdgeGyroRW)
        dbg_e = bg[edges_b] - bg[edges_a]
        dba_e = ba[edges_b] - ba[edges_a]
        eye3 = jnp.eye(3, dtype=dtype)
        for seg, diff, info_rw in ((slice(9, 12), dbg_e, rw_info_g),
                                   (slice(12, 15), dba_e, rw_info_a)):
            Iw = info_rw[:, None, None] * eye3[None]
            H = H.at[edges_a, edges_a, seg, seg].add(Iw)
            H = H.at[edges_b, edges_b, seg, seg].add(Iw)
            H = H.at[edges_a, edges_b, seg, seg].add(-Iw)
            H = H.at[edges_b, edges_a, seg, seg].add(-Iw)
            b = b.at[edges_a, seg].add(info_rw[:, None] * diff)
            b = b.at[edges_b, seg].add(-info_rw[:, None] * diff)
        cost_rw = jnp.sum(rw_info_g[:, None] * dbg_e ** 2) + jnp.sum(
            rw_info_a[:, None] * dba_e ** 2)
        # zero-mean bias priors
        if prior_g > 0:
            H = H.at[jnp.arange(K), jnp.arange(K), 9:12, 9:12].add(
                prior_g * eye3[None])
            b = b.at[:, 9:12].add(-prior_g * bg)
        if prior_a > 0:
            H = H.at[jnp.arange(K), jnp.arange(K), 12:15, 12:15].add(
                prior_a * eye3[None])
            b = b.at[:, 12:15].add(-prior_a * ba)
        cost = jnp.sum(cost_v) + cost_i + cost_rw
        # landmark marginalization (Schur, pair scatter). SPLIT damping:
        # the landmark blocks keep a 1e-3 FLOOR (their low-parallax depth
        # directions are the flat subspace that wanders at f32 — the
        # visual ba.py lesson), while the 15-dim state system below uses
        # the raw lambda so the stiff inertial chain still converges at
        # LM rate (a global 1e-3 floor measured 60x slower convergence).
        eye3d = jnp.eye(3, dtype=dtype)
        lam_ll = jnp.maximum(lam, 1e-3)
        Hll_d = Hll + lam_ll * (eye3d * jnp.diagonal(Hll, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye3d
        Hll_inv = _inv3x3(Hll_d)
        Wo = jnp.einsum("oij,oik->ojk", Jp_w, Jl)  # [O,6,3]
        Ao = Wo @ Hll_inv[obs_pt]
        Mq = Ao[pair_a] @ jnp.swapaxes(Wo[pair_b], -1, -2)  # [Q,6,6]
        H = H.at[obs_kf[pair_a], obs_kf[pair_b], :6, :6].add(-Mq)
        b = b.at[:, :6].add(
            -jnp.zeros((K, 6), dtype).at[obs_kf].add(
                jnp.einsum("oij,oj->oi", Ao, bl[obs_pt])))
        # damping + flatten
        Hd = H.reshape(K, K, D, D)
        diag = jnp.diagonal(
            Hd[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1)
        eyeD = jnp.eye(D, dtype=dtype)
        Hd = Hd.at[jnp.arange(K), jnp.arange(K)].add(
            lam * eyeD * diag[:, None, :] + 1e-6 * eyeD)
        S = Hd.transpose(0, 2, 1, 3).reshape(K * D, K * D)
        brhs = b.reshape(K * D)
        # freeze masks: fixed_pose freezes only the 6 pose dims — velocity
        # and biases of fixed KFs stay free (ref FullInertialBA fixes
        # VertexPose only, Optimizer.cc:446-476)
        free = jnp.ones((K, D), bool)
        free = free.at[:, :6].set(~fixed_pose[:, None])
        if not opt_vel:
            free = free.at[:, 6:9].set(False)
        if not opt_bias:
            free = free.at[:, 9:15].set(False)
        freeF = free.reshape(K * D)
        S = jnp.where(freeF[:, None] & freeF[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(freeF, 0.0, 1.0))
        brhs = jnp.where(freeF, brhs, 0.0)
        dx = spd_solve(S, brhs).reshape(K, D)
        # landmark back-substitution
        WtDx = jnp.zeros((P, 3), dtype).at[obs_pt].add(
            jnp.einsum("oij,oi->oj", Wo, dx[obs_kf, :6]))
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - WtDx)
        # apply
        Rn = Rwb @ so3_exp(dx[:, 3:6])
        pn = p + jnp.einsum("kij,kj->ki", Rwb, dx[:, 0:3])
        vn = v + dx[:, 6:9]
        bgn = bg + dx[:, 9:12]
        ban = ba + dx[:, 12:15]
        return (Rn, pn, vn, bgn, ban, X + dx_pt), cost

    def cost_terms(state):
        """Per-term cost vector (obs, inertial edges, RW edges, priors):
        f32-safe acceptance differences per-term before reducing."""
        Rwb, p, v, bg, ba, X = state
        _, _, _, _, c_v = _reproj_parts(
            Rwb, p, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, True if robust else False, Rcb, tcb,
            cam, is_right)
        ri = _edge_res(
            jnp.zeros(15, dtype), jnp.zeros(15, dtype),
            Rwb[edges_a], p[edges_a], v[edges_a], bg[edges_a], ba[edges_a],
            Rwb[edges_b], p[edges_b], v[edges_b],
            bg0[edges_a], ba0[edges_a], pre_stack)
        c_i = jnp.einsum("ei,eij,ej->e", ri, info9, ri)
        dbg_e = bg[edges_b] - bg[edges_a]
        dba_e = ba[edges_b] - ba[edges_a]
        c_rw = jnp.sum(rw_info_g[:, None] * dbg_e ** 2, -1) + jnp.sum(
            rw_info_a[:, None] * dba_e ** 2, -1)
        c_pr = prior_g * jnp.sum(bg ** 2, -1) + prior_a * jnp.sum(ba ** 2, -1)
        return jnp.concatenate([c_v, c_i, c_rw, c_pr])

    def lm_step(carry, _):
        state, lam = carry
        new_state, _ = build_and_step(state, lam)
        delta = jnp.sum(cost_terms(new_state) - cost_terms(state))
        accept = delta < 0
        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_state, state)
        # FLOOR at 1e-3 (not 1e-9), same rationale as visual ba.py: with
        # multiplicative damping, lambda is the only thing pinning the
        # problem's FLAT directions (landmark depth at low parallax; the
        # weakly-excited bias/scale subspace of a gentle trajectory) to
        # their initialization — once it decays, noise-level gradients
        # push cost-neutral meter-scale steps along them. At f32 the
        # effect is live at every solve; the floor bounds flat-direction
        # wander while observable directions still converge.
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                       lam_floor, 1e6)
        return (state, lam), delta

    state0 = (Rwb, p, v, bg, ba, X)
    (state, _), _ = jax.lax.scan(
        lm_step, (state0, jnp.asarray(1e-4, dtype)), None,
        length=n_iters)
    cost = jnp.sum(cost_terms(state))
    return state + (cost,)
