"""Inertial-only initialization: gravity direction, scale, biases, velocities.

Replaces the reference's IMU-init optimizations (ref:
Optimizer::InertialOptimization src/Optimizer.cc:5303 — VertexGDir 2-DoF
gravity G2oTypes.h:271, VertexScale :293, shared VertexGyroBias/VertexAccBias,
per-KF VertexVelocity; poses FIXED; EdgeInertialGS :545 couples them) and the
gyro-bias bootstrap (Tracking::ComputeGyroBias src/Tracking.cc:724).

TPU-shaped: the whole problem is one dense GN over a (8 + 3K)-dim state
(phi_g[2], log_s, bg[3], ba? shared, v[K*3]) with jacfwd residual Jacobians —
E edges x 9 residuals, K <= ~30 keyframes, so a single small dense solve per
iteration; everything jit'd with static K/E.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.linalg import spd_solve

from ..core.lie import so3_exp, so3_log
from .preintegration import GRAVITY, corrected_delta


def gyro_bias_from_rotations(Rwb_pairs, pre_dR, pre_JRg):
    """Closed-ish form gyro bias: GN on r = Log((dR Exp(JRg bg))^T Rwb1^T Rwb2)
    (ref: Tracking::ComputeGyroBias Tracking.cc:724 solves the linearized
    normal equations once).

    Rwb_pairs: (Rwb1 [E,3,3], Rwb2 [E,3,3]); pre_dR/pre_JRg [E,3,3].
    Returns bg [3].
    """
    Rwb1, Rwb2 = Rwb_pairs

    def residuals(bg):
        def one(R1, R2, dR, JRg):
            return so3_log(
                jnp.swapaxes(dR @ so3_exp(JRg @ bg), -1, -2)
                @ jnp.swapaxes(R1, -1, -2) @ R2
            )
        return jax.vmap(one)(Rwb1, Rwb2, pre_dR, pre_JRg).reshape(-1)

    bg = jnp.zeros(3, Rwb1.dtype)
    for _ in range(3):
        J = jax.jacfwd(residuals)(bg)
        r = residuals(bg)
        H = J.T @ J + 1e-9 * jnp.eye(3, dtype=bg.dtype)
        bg = bg - spd_solve(H, J.T @ r)
    return bg


def _gs_residuals(theta, Rwb, p, edges_a, edges_b, pre_stack, mono_scale,
                  Rwg0=None):
    """Stacked 9-dim EdgeInertialGS residuals for all edges.

    theta = [phi_g(2), log_s(1), bg(3), ba(3), v(K*3)].
    Gravity Gw = Rwg * (0,0,-G) with Rwg = Exp([phi_x, phi_y, 0]) (2-DoF,
    ref VertexGDir G2oTypes.h:271).

    The velocities live in the VISUAL (up-to-scale) frame and the scale
    multiplies BOTH the position differences and the velocity terms —
    exactly EdgeInertialGS (ref G2oTypes.cc computeError:
    ev = R1^T (s (v2 - v1) - g dt) - dV,
    ep = R1^T (s (p2 - p1 - v1 dt) - g dt^2 / 2) - dP). This coupling is
    load-bearing: with METRIC velocities (no s on v), shrinking s lets
    free velocities absorb the position terms and the optimum genuinely
    slides to a degenerate s ~ 0 (measured on the engine's own init
    problems once the solver ran to convergence; round 4's 40-iteration
    cap had masked it). Callers get metric velocities as s * v.
    """
    K = Rwb.shape[0]
    dtype = Rwb.dtype
    phi = jnp.concatenate([theta[0:2], jnp.zeros(1, dtype)])
    Rwg = (jnp.eye(3, dtype=dtype) if Rwg0 is None else Rwg0) @ so3_exp(phi)
    s = jnp.exp(theta[2]) if mono_scale else jnp.asarray(1.0, dtype)
    bg = theta[3:6]
    ba = theta[6:9]
    v = theta[9:].reshape(K, 3)
    g = Rwg @ jnp.asarray(np.array([0.0, 0.0, -GRAVITY]), dtype)

    def edge(a, b):
        pre = jax.tree.map(lambda x: x[a], pre_stack)
        dT = pre["dT"]
        dR, dV, dP = corrected_delta(pre, bg, ba)
        R1, R2 = Rwb[a], Rwb[b]
        v1, v2 = v[a], v[b]
        er = so3_log(dR.T @ R1.T @ R2)
        ev = R1.T @ (s * (v2 - v1) - g * dT) - dV
        ep = R1.T @ (s * (p[b] - p[a] - v1 * dT)
                     - 0.5 * g * dT * dT) - dP
        return jnp.concatenate([er, ev, ep])

    return jax.vmap(edge)(edges_a, edges_b)


def linear_sgv_seed(Rwb, p, edges_a, edges_b, pre_list):
    """Closed-form (s, gravity, velocity) seed: substituting w = s*v makes
    the EdgeInertialGS ev/ep equations EXACTLY linear in (s, g, w) —
    ev: R1^T (w_b - w_a - g dT) = dV
    ep: R1^T (s*dp_vis - w_a dT - g dT^2/2) = dP
    — one least-squares solve with no basins (the VINS-Mono-style
    initialization; the nonlinear 2-DoF-gravity solve then refines from
    here). Without this seed the GN walk from s=1 measurably parks in a
    small-scale local basin when the true scale is far (s ~ 10+).

    Returns (s, g [3], w [K,3] = s*v in the visual world frame)."""
    K = len(Rwb)
    E = len(edges_a)
    n = 4 + 3 * K
    A = np.zeros((6 * E, n))
    rhs = np.zeros(6 * E)
    for e in range(E):
        a_, b_ = int(edges_a[e]), int(edges_b[e])
        pre = pre_list[e]
        dT = max(float(np.asarray(pre["dT"])), 1e-9)
        R1T = np.asarray(Rwb[a_], np.float64).T
        dV = np.asarray(pre["dV"], np.float64)
        dP = np.asarray(pre["dP"], np.float64)
        r0 = 6 * e
        # ev rows
        A[r0:r0 + 3, 1:4] = -R1T * dT
        A[r0:r0 + 3, 4 + 3 * b_: 7 + 3 * b_] = R1T
        A[r0:r0 + 3, 4 + 3 * a_: 7 + 3 * a_] = -R1T
        rhs[r0:r0 + 3] = dV
        # ep rows
        A[r0 + 3:r0 + 6, 0] = R1T @ (
            np.asarray(p[b_], np.float64) - np.asarray(p[a_], np.float64))
        A[r0 + 3:r0 + 6, 1:4] = -0.5 * R1T * dT * dT
        A[r0 + 3:r0 + 6, 4 + 3 * a_: 7 + 3 * a_] = -R1T * dT
        rhs[r0 + 3:r0 + 6] = dP
    x, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    return float(x[0]), x[1:4], x[4:].reshape(K, 3)


@functools.partial(jax.jit, static_argnames=("n_iters", "mono_scale",
                                             "fix_accel_bias"))
def inertial_init_solve(Rwb, p, v0, edges_a, edges_b, pre_stack, info9,
                        prior_g: float = 1e2, prior_a: float = 1e10,
                        n_iters: int = 20, mono_scale: bool = True,
                        fix_accel_bias: bool = False, Rwg0=None,
                        log_s0=0.0):
    """Estimate (Rwg, s, bg, ba, v) with KF poses fixed.

    prior_g/prior_a: zero-mean bias priors (the ref init schedule passes
    1e2/1e10 first, then 1e5 — LocalMapping.cc:1244,1270).
    Rwg0: gravity-direction SEED — the 2-DoF vertex updates multiply it
    (Rwg = Rwg0 Exp([px, py, 0]), ref VertexGDir G2oTypes.h:271). Pass
    the dirG estimate from accumulated preintegrated velocity deltas
    (ref LocalMapping.cc:1260-1270); from identity the solve must walk a
    possibly ~90deg rotation through a 2-DoF chart and can settle in the
    degenerate small-scale basin instead. v0 likewise seeds the
    velocities (in the VISUAL frame; the ref seeds position finite
    differences, LocalMapping.cc:1254).
    Returns dict(Rwg, scale, bg, ba, v [K,3] METRIC, cost).
    """
    K = Rwb.shape[0]
    dtype = Rwb.dtype
    if Rwg0 is None:
        Rwg0 = jnp.eye(3, dtype=dtype)
    theta = jnp.concatenate([
        jnp.zeros(2, dtype),
        jnp.asarray(log_s0, dtype).reshape(1),
        jnp.zeros(6, dtype), v0.reshape(-1)])

    def res(theta):
        return _gs_residuals(theta, Rwb, p, edges_a, edges_b, pre_stack,
                             mono_scale, Rwg0)

    def cost_terms(theta):
        r = res(theta)
        c = jnp.einsum("ei,eij,ej->e", r, info9, r)  # per-edge
        pr = jnp.stack([prior_g * jnp.sum(theta[3:6] ** 2),
                        prior_a * jnp.sum(theta[6:9] ** 2)])
        return jnp.concatenate([c, pr])

    def cost_of(theta):
        return jnp.sum(cost_terms(theta))

    def step(carry, _):
        theta, lam, cost = carry
        r = res(theta)                                     # [E,9]
        J = jax.jacfwd(res)(theta)                         # [E,9,D]
        JW = jnp.einsum("eij,eid->ejd", info9, J)          # info @ J
        H = jnp.einsum("eid,eif->df", J, JW)
        b = -jnp.einsum("eid,ei->d", JW, r)
        D = H.shape[0]
        prior_diag = jnp.concatenate([
            jnp.zeros(3, dtype),
            jnp.full(3, prior_g, dtype), jnp.full(3, prior_a, dtype),
            jnp.zeros(3 * K, dtype)])
        H = H + jnp.diag(prior_diag)
        b = b - prior_diag * theta
        if not mono_scale:
            H = H.at[2, :].set(0.0).at[:, 2].set(0.0).at[2, 2].set(1.0)
            b = b.at[2].set(0.0)
        if fix_accel_bias:
            mask = jnp.ones(D, dtype).at[6:9].set(0.0)
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            b = b * mask
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(D, dtype=dtype)
        dtheta = spd_solve(H, b)
        new = theta + dtheta
        # f32-safe acceptance: per-edge cost differences, then reduce
        delta = jnp.sum(cost_terms(new) - cost_terms(theta))
        accept = delta < 0
        theta = jnp.where(accept, new, theta)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        return (theta, lam, cost + jnp.where(accept, delta, 0.0)), None

    (theta, _, cost), _ = jax.lax.scan(
        step, (theta, jnp.asarray(1e-4, dtype), cost_of(theta)), None,
        length=n_iters)
    # scale observability: the marginal std of log_s from the final GN
    # Hessian (callers gate mono init on it — with weak accelerometer
    # excitation scale is unidentifiable and the estimate is arbitrary)
    Jf = jax.jacfwd(res)(theta)
    JWf = jnp.einsum("eij,eid->ejd", info9, Jf)
    Hf = jnp.einsum("eid,eif->df", Jf, JWf)
    Df = Hf.shape[0]
    prior_diag_f = jnp.concatenate([
        jnp.zeros(3, dtype),
        jnp.full(3, prior_g, dtype), jnp.full(3, prior_a, dtype),
        jnp.zeros(Df - 9, dtype)])
    Hf = Hf + jnp.diag(prior_diag_f)
    df = jnp.diagonal(Hf)
    goodf = (df > 0) & jnp.isfinite(df)
    sf_ = jnp.where(goodf, jax.lax.rsqrt(jnp.where(goodf, df, 1.0)), 1.0)
    Hn = Hf * sf_[:, None] * sf_[None, :] + 1e-9 * jnp.eye(Df, dtype=dtype)
    cov_n = jnp.linalg.inv(Hn)
    logs_var = cov_n[2, 2] * sf_[2] * sf_[2]
    phi = jnp.concatenate([theta[0:2], jnp.zeros(1, dtype)])
    s_fin = jnp.exp(theta[2]) if mono_scale else jnp.asarray(1.0, dtype)
    return dict(
        Rwg=Rwg0 @ so3_exp(phi),
        scale=s_fin,
        # the optimizer's velocities live in the visual frame (see
        # _gs_residuals); callers get METRIC velocities (ref applies the
        # same s in Map::ApplyScaledRotation(bScaledVel=true))
        bg=theta[3:6], ba=theta[6:9],
        v=s_fin * theta[9:].reshape(K, 3), cost=cost,
        logs_sigma=jnp.sqrt(jnp.maximum(logs_var, 0.0)),
    )
