"""Motion-only pose optimization as ONE fused Pallas TPU kernel.

Same semantics as pose_opt.pose_optimize (ref: src/Optimizer.cc:854-1168 —
4 rounds x <=10 Gauss-Newton iterations, Huber deltaMono/deltaStereo,
chi2 outlier re-classification between rounds, depth-positivity gating),
but the ENTIRE solve runs inside a single kernel launch: residuals,
analytic Jacobians, the 21-entry normal-equation reduction, an unrolled
6x6 Cholesky, and the SE(3) update all stay in VMEM/registers across the
~40-step sequential chain. The XLA version pays per-step dispatch latency
for ~10 tiny fused kernels per GN iteration (the tracking-time frame-rate
bottleneck: ~50us/iter); fusing the loop removes that entirely.

Observations are laid out as (rows, 128) f32 planes (lane-dim aligned);
the pose and the normal equations live as scalars (SREG-friendly).
Scalar parameters arrive via SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.robust import CHI2_MONO, CHI2_STEREO

LANES = 128


def _chol6_solve(H, b, damping):
    """Unrolled 6x6 Cholesky solve on scalar lists, Jacobi-preconditioned.

    H: 6x6 nested list of traced scalars (symmetric), b: list of 6.
    Returns list of 6 scalars dx. Matches core.linalg.spd_solve: symmetric
    diagonal scaling D^-1/2 H D^-1/2 (restores f32 accuracy on fx^2-scaled
    normal matrices) and RELATIVE (Marquardt) damping on the unit diagonal.
    """
    sc = [jax.lax.rsqrt(jnp.maximum(H[i][i], 1e-30)) for i in range(6)]
    H = [[H[i][j] * sc[i] * sc[j] for j in range(6)] for i in range(6)]
    b = [b[i] * sc[i] for i in range(6)]
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[i][j] + ((damping + 1e-7) if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return [x[i] * sc[i] for i in range(6)]  # un-scale back to dx


def _se3_exp_scalar(dx):
    """exp: se(3) (rho, phi) as 6 scalars -> (R 3x3 scalar list, t list).

    Matches core.lie.se3_exp (Rodrigues + left-Jacobian V for the
    translation part), small-angle series below 1e-8.
    """
    rho = dx[0:3]
    p0, p1, p2 = dx[3], dx[4], dx[5]
    t2 = p0 * p0 + p1 * p1 + p2 * p2
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    th = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)  # sin t / t
    bb = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / safe_t2)
    cc = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0, (th - jnp.sin(th)) / (safe_t2 * th)
    )
    # W = hat(phi); R = I + a W + bb W^2 ; V = I + bb W + cc W^2
    W = [[0.0, -p2, p1], [p2, 0.0, -p0], [-p1, p0, 0.0]]
    W2 = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            W2[i][j] = sum(W[i][k] * W[k][j] for k in range(3))
    R = [[None] * 3 for _ in range(3)]
    V = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            R[i][j] = eye + a * W[i][j] + bb * W2[i][j]
            V[i][j] = eye + bb * W[i][j] + cc * W2[i][j]
    t = [sum(V[i][k] * rho[k] for k in range(3)) for i in range(3)]
    return R, t


def _pose_kernel(
    params_ref,
    X_ref,
    uvr_ref,
    info_ref,
    smask_ref,
    valid_ref,
    pose_ref,
    chi2_ref,
    inlier_ref,
    *,
    n_rounds: int,
    n_iters: int,
):
    fx = params_ref[0]
    fy = params_ref[1]
    cx = params_ref[2]
    cy = params_ref[3]
    bf = params_ref[4]
    damping = params_ref[5]
    tol = params_ref[6]
    X0 = X_ref[0]
    X1 = X_ref[1]
    X2 = X_ref[2]
    mu = uvr_ref[0]
    mv = uvr_ref[1]
    mur = uvr_ref[2]
    info = info_ref[:]
    smask = smask_ref[:]
    valid = valid_ref[:]
    chi2_th = jnp.where(smask > 0.5, CHI2_STEREO, CHI2_MONO)

    def residuals(P):
        """P = 12 scalars (row-major R, then t). Returns per-obs planes."""
        x = P[0] * X0 + P[1] * X1 + P[2] * X2 + P[9]
        y = P[3] * X0 + P[4] * X1 + P[5] * X2 + P[10]
        z = P[6] * X0 + P[7] * X1 + P[8] * X2 + P[11]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        iz = 1.0 / zs
        iz2 = iz * iz
        u = fx * x * iz + cx
        v = fy * y * iz + cy
        ur = u - bf * iz
        ru = u - mu
        rv = v - mv
        rur = (ur - mur) * smask
        chi2 = (ru * ru + rv * rv + rur * rur) * info
        return x, y, z, iz, iz2, ru, rv, rur, chi2

    def cost_terms(P, use, robust):
        """Per-obs Huber-robustified cost plane at pose P (0 where unused)."""
        _, _, z, _, _, _, _, _, chi2 = residuals(P)
        if robust:
            e = jnp.sqrt(jnp.maximum(chi2, 0.0))
            d = jnp.sqrt(chi2_th)
            c = jnp.where(chi2 <= chi2_th, chi2, 2.0 * d * e - chi2_th)
        else:
            c = chi2
        return jnp.where((z > 0) & (use > 0.5), c, 0.0)

    def gn_step(P, lam, use, robust):
        x, y, z, iz, iz2, ru, rv, rur, chi2 = residuals(P)
        if robust:
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = jnp.minimum(1.0, jnp.sqrt(chi2_th) / e)
        else:
            w = jnp.ones_like(chi2)
        w = w * info * use
        w = jnp.where(z > 0, w, 0.0)
        # Jacobian rows wrt xi=(rho,phi), left-multiplicative update:
        # J = Jproj @ [I | -hat(Xc)]
        du = (fx * iz, jnp.zeros_like(iz), -fx * x * iz2)
        dv = (jnp.zeros_like(iz), fy * iz, -fy * y * iz2)
        dur = (du[0], du[1], du[2] + bf * iz2)

        def pose_row(d):
            return (
                d[0],
                d[1],
                d[2],
                d[1] * (-z) + d[2] * y,
                d[0] * z + d[2] * (-x),
                d[0] * (-y) + d[1] * x,
            )

        Ju = pose_row(du)
        Jv = pose_row(dv)
        Jur = pose_row(dur)
        H = [[None] * 6 for _ in range(6)]
        g = [None] * 6
        ws = w * smask  # third row only exists for stereo obs
        for a in range(6):
            for bcol in range(a + 1):
                H[a][bcol] = jnp.sum(
                    w * (Ju[a] * Ju[bcol] + Jv[a] * Jv[bcol])
                    + ws * (Jur[a] * Jur[bcol])
                )
                H[bcol][a] = H[a][bcol]
            g[a] = -jnp.sum(w * (ru * Ju[a] + rv * Jv[a]) + ws * (rur * Jur[a]))
        dx = _chol6_solve(H, g, lam)
        dR, dt = _se3_exp_scalar(dx)
        # P' = exp(dx) * P : R' = dR R, t' = dR t + dt
        Pn = []
        for i in range(3):
            for j in range(3):
                Pn.append(sum(dR[i][k] * P[3 * k + j] for k in range(3)))
        for i in range(3):
            Pn.append(sum(dR[i][k] * P[9 + k] for k in range(3)) + dt[i])
        sq = sum(d * d for d in dx)
        return tuple(Pn), sq

    P = tuple(params_ref[7 + i] for i in range(12))
    use = valid
    for rnd in range(n_rounds):
        robust = rnd < n_rounds - 1

        # Levenberg-Marquardt accept/reject loop (mirrors
        # pose_opt.pose_optimize; g2o's OptimizationAlgorithmLevenberg is
        # the reference's actual solver). Early-exit on an ACCEPTED step's
        # norm; rejected steps raise lambda and keep iterating.
        def cond(carry):
            i, _, _, sq = carry
            return jnp.logical_and(i < n_iters, sq > tol)

        def body(carry, use=use, robust=robust):
            i, P, lam, _ = carry
            Pn, sq_step = gn_step(P, lam, use, robust)
            # f32-safe acceptance: sum of PER-OBS cost differences (see
            # pose_opt.py — difference of two large sums loses genuine
            # small improvements below the total's f32 resolution)
            delta = jnp.sum(
                cost_terms(Pn, use, robust) - cost_terms(P, use, robust))
            accept = delta < 0
            P = tuple(jnp.where(accept, pn, p) for pn, p in zip(Pn, P))
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-7, 1e2)
            sq = jnp.where(accept, sq_step, jnp.float32(jnp.inf))
            return i + 1, P, lam, sq

        _, P, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), P, damping, jnp.float32(jnp.inf)),
        )
        # re-classify on ALL valid obs (ref: Optimizer.cc:1100+)
        _, _, z, _, _, _, _, _, chi2 = residuals(P)
        use = valid * jnp.where((chi2 <= chi2_th) & (z > 0), 1.0, 0.0)

    _, _, z, _, _, _, _, _, chi2 = residuals(P)
    chi2_ref[:] = chi2
    inlier_ref[:] = valid * jnp.where((chi2 <= chi2_th) & (z > 0), 1.0, 0.0)
    for i in range(12):
        pose_ref[i] = P[i]


@functools.partial(
    jax.jit, static_argnames=("n_rounds", "n_iters", "interpret")
)
def pose_optimize_fused(
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
    n_rounds: int = 4,
    n_iters: int = 10,
    damping: float = 1e-4,
    step_tol: float = 1e-16,
    interpret: bool = False,
):
    """Drop-in replacement for pose_opt.pose_optimize on TPU.

    Returns (R, t, inlier_mask, chi2_per_obs) exactly like pose_optimize.
    """
    N = X.shape[0]
    f32 = jnp.float32
    pad = (-N) % LANES
    rows = (N + pad) // LANES

    def plane(v, fill=0.0):
        v = jnp.pad(v.astype(f32), (0, pad), constant_values=fill)
        return v.reshape(rows, LANES)

    Xp = jnp.stack([plane(X[:, i], fill=1.0) for i in range(3)])
    Up = jnp.stack([plane(uvr[:, i]) for i in range(3)])
    info = plane(inv_sigma2)
    smask = plane(is_stereo.astype(f32))
    vmask = plane(valid.astype(f32))
    params = jnp.concatenate(
        [
            jnp.stack(
                [
                    jnp.asarray(fx, f32),
                    jnp.asarray(fy, f32),
                    jnp.asarray(cx, f32),
                    jnp.asarray(cy, f32),
                    jnp.asarray(bf, f32),
                    jnp.asarray(damping, f32),
                    jnp.asarray(step_tol, f32),
                ]
            ),
            R0.astype(f32).reshape(9),
            t0.astype(f32).reshape(3),
        ]
    )

    kern = functools.partial(_pose_kernel, n_rounds=n_rounds, n_iters=n_iters)
    pose, chi2, inl = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((19,), f32),
            jax.ShapeDtypeStruct((rows, LANES), f32),
            jax.ShapeDtypeStruct((rows, LANES), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(params, Xp, Up, info, smask, vmask)

    R = pose[:9].reshape(3, 3).astype(X.dtype)
    t = pose[9:12].astype(X.dtype)
    chi2 = chi2.reshape(-1)[:N].astype(X.dtype)
    inliers = inl.reshape(-1)[:N] > 0.5
    return R, t, inliers, chi2
