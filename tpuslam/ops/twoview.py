"""Two-view reconstruction for monocular initialization.

Replaces the reference's TwoViewReconstruction (src/TwoViewReconstruction.cc,
invoked via GeometricCamera::ReconstructWithTwoViews at Tracking.cc:1522):
parallel Homography and Fundamental RANSAC (200 hypotheses x 8-point DLT),
model selection by score ratio RH > 0.4, motion-hypothesis decomposition
(4 for F via E; 8 for H via Faugeras' SVD method), cheirality + parallax
checks, triangulation of the winning hypothesis.

TPU-shaped: the 200 RANSAC hypotheses are a batch dimension — all model
fits, scorings and decompositions run as one batched pipeline (batched SVD).
Points are NORMALIZED camera rays (z=1), i.e. the caller pre-undistorts and
unprojects pixels — this is what makes the same code serve pinhole and
fisheye (ref: KannalaBrandt8 reconstructs on unprojected rays,
KannalaBrandt8.cpp:206).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.linalg import spd_solve

N_HYP = 200  # ref: TwoViewReconstruction ctor mMaxIterations=200
SIGMA = 1.0


def _dlt_h(x1, x2, w=None):
    """Batched homography DLT. x1,x2 [B,n,2] (n>=4) -> H [B,3,3].
    Optional per-row weights w [B,n] (0 disables a correspondence)."""
    B, n, _ = x1.shape
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u)
    o = jnp.ones_like(u)
    r1 = jnp.stack([z, z, z, -u, -v, -o, vp * u, vp * v, vp], -1)
    r2 = jnp.stack([u, v, o, z, z, z, -up * u, -up * v, -up], -1)
    A = jnp.concatenate([r1, r2], axis=1)  # [B,2n,9]
    if w is not None:
        A = A * jnp.concatenate([w, w], axis=1)[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[..., -1, :].reshape(B, 3, 3)


def _dlt_f(x1, x2, w=None):
    """Batched 8-point fundamental. x1,x2 [B,n,2] -> F [B,3,3] (rank-2).
    Optional per-row weights w [B,n]."""
    B, n, _ = x1.shape
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    o = jnp.ones_like(u)
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v, o], -1)
    if w is not None:
        A = A * w[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., -1, :].reshape(B, 3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt2)


def _score_h(H, x1, x2, sigma2, valid):
    """Symmetric transfer error score (ref: CheckHomography). x [N,2]."""
    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[..., :1])], -1)
        p = ah @ jnp.swapaxes(H, -1, -2)
        w = jnp.where(jnp.abs(p[..., 2:3]) < 1e-9, 1e-9, p[..., 2:3])
        return jnp.sum((p[..., :2] / w - b) ** 2, -1)

    Hinv = jnp.linalg.inv(H)
    d12 = transfer(H, x1[None], x2[None]) / sigma2
    d21 = transfer(Hinv, x2[None], x1[None]) / sigma2
    th = 5.991
    good = (d12 < th) & (d21 < th) & valid[None]
    score = jnp.where(d12 < th, th - d12, 0.0) + jnp.where(d21 < th, th - d21, 0.0)
    return jnp.sum(score * valid[None], -1), good


def _score_f(F, x1, x2, sigma2, valid):
    """Epipolar distance score (ref: CheckFundamental)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], -1)
    l2 = x1h[None] @ jnp.swapaxes(F, -1, -2)  # lines in img2 [B,N,3]
    num2 = jnp.sum(l2 * x2h[None], -1) ** 2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    d2 = num2 / jnp.maximum(den2, 1e-12) / sigma2
    l1 = x2h[None] @ F
    num1 = jnp.sum(l1 * x1h[None], -1) ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    d1 = num1 / jnp.maximum(den1, 1e-12) / sigma2
    th, thscore = 3.841, 5.991
    good = (d1 < th) & (d2 < th) & valid[None]
    score = jnp.where(d1 < th, thscore - d1, 0.0) + jnp.where(d2 < th, thscore - d2, 0.0)
    return jnp.sum(score * valid[None], -1), good


def triangulate_batch(R1, t1, R2, t2, x1, x2, n_refine: int = 2):
    """Linear (DLT) triangulation of ray pairs + batched GN refinement.
    Poses map world->cam. x1,x2 [N,2] normalized coords. Returns X [N,3]
    world (ref: TwoViewReconstruction::Triangulate).

    The GN polish matters at f32 (the TPU dtype): near-parallel rays make
    the DLT 4x4 SVD ill-conditioned and its f32 depths can be off by whole
    multiples, which feeds runaway-scale points into the map. Two GN steps
    on the normalized reprojection residuals (3 params, 4 residuals,
    Jacobi-scaled 3x3 solves) restore f64-grade depths."""
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)  # [3,4]
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    rows = []
    for x, P in ((x1, P1), (x2, P2)):
        rows.append(x[..., 0:1] * P[2][None] - P[0][None])
        rows.append(x[..., 1:2] * P[2][None] - P[1][None])
    A = jnp.stack(rows, axis=-2)  # [N,4,4]
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[..., -1, :]
    w = jnp.where(jnp.abs(Xh[..., 3:]) < 1e-12, 1e-12, Xh[..., 3:])
    X = Xh[..., :3] / w

    def _res_jac(X):
        rs, Js = [], []
        for R, t, x in ((R1, t1, x1), (R2, t2, x2)):
            Xc = X @ R.T + t                      # broadcast if R is [3,3]
            z = jnp.where(jnp.abs(Xc[..., 2:]) < 1e-9, 1e-9, Xc[..., 2:])
            uv = Xc[..., :2] / z
            rs.append(uv - x)
            # d(uv)/dXc then chain through R
            iz = 1.0 / z[..., 0]
            Jc = jnp.stack([
                jnp.stack([iz, jnp.zeros_like(iz), -Xc[..., 0] * iz * iz], -1),
                jnp.stack([jnp.zeros_like(iz), iz, -Xc[..., 1] * iz * iz], -1),
            ], -2)                                # [N,2,3]
            Js.append(Jc @ R)
        return jnp.concatenate(rs, -1), jnp.concatenate(Js, -2)

    for _ in range(n_refine):
        r, J = _res_jac(X)                        # [N,4], [N,4,3]
        H = jnp.einsum("nij,nik->njk", J, J)
        b = -jnp.einsum("nij,ni->nj", J, r)
        dX = spd_solve(H, b, damping=1e-6)
        X = X + dX
    return X


def _check_rt(R, t, x1, x2, good, sigma2):
    """Cheirality check of one (R,t) hypothesis (ref: CheckRT).

    Returns (n_good, parallax_deg50, X [N,3], good_mask)."""
    N = x1.shape[0]
    eye = jnp.eye(3, dtype=x1.dtype)
    z3 = jnp.zeros(3, x1.dtype)
    X = triangulate_batch(eye, z3, R, t, x1, x2)
    finite = jnp.all(jnp.isfinite(X), -1)
    # parallax
    O2 = -R.T @ t
    n1 = X
    n2 = X - O2[None]
    cosp = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # reprojection errors (normalized plane, scaled by fx~1: use angular err)
    p1 = X[:, :2] / jnp.where(jnp.abs(z1[:, None]) < 1e-9, 1e-9, z1[:, None])
    p2 = Xc2[:, :2] / jnp.where(jnp.abs(z2[:, None]) < 1e-9, 1e-9, z2[:, None])
    e1 = jnp.sum((p1 - x1) ** 2, -1)
    e2 = jnp.sum((p2 - x2) ** 2, -1)
    th = 4.0 * sigma2
    ok = (
        good & finite
        & (z1 > 0) & (z2 > 0)
        & (cosp < 0.99998)  # parallax > ~0.36 deg
        & (e1 < th) & (e2 < th)
    )
    n_good = jnp.sum(ok)
    # 50th-best parallax like reference (uses acos of sorted cos)
    cos_ok = jnp.where(ok, cosp, 1.0)
    cs = jnp.sort(cos_ok)
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cs[idx], -1.0, 1.0)))
    return n_good, parallax, X, ok


def _decompose_e(E):
    """E -> 4 (R,t) hypotheses (ref: DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray(np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]]), E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    return [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]


def _decompose_h(H):
    """H -> 8 (R,t) hypotheses, Faugeras SVD method (ref: ReconstructH)."""
    U, S, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    H = H / d2
    d1, d3 = d1 / d2, d3 / d2
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - 1.0) * (1.0 - d3 * d3), 0.0))
    x1a = jnp.sqrt(jnp.maximum((d1 * d1 - 1.0) / (d1 * d1 - d3 * d3), 0.0))
    x3a = jnp.sqrt(jnp.maximum((1.0 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    hyps = []
    # d' > 0
    sin_t = aux1 / ((d1 + d3) * 1.0)
    cos_t = (d1 * d3 + 1.0) / (d1 + d3)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.asarray(np.eye(3), H.dtype)
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(cos_t)
            tp = jnp.stack([e1 * x1a, 0.0 * d1, -e3 * x3a]) * (d1 - d3)
            R = s * U @ Rp @ Vt
            t = U @ tp
            hyps.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    # d' < 0
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - 1.0) * (1.0 - d3 * d3), 0.0)) / (d1 - d3)
    cos_p = (d1 * d3 - 1.0) / (d1 - d3)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sin_p
            Rp = jnp.asarray(np.diag(np.array([1.0, -1.0, 1.0])), H.dtype)
            Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp).at[2, 0].set(sp).at[2, 2].set(-cos_p)
            tp = jnp.stack([e1 * x1a, 0.0 * d1, e3 * x3a]) * (d1 + d3)
            R = s * U @ Rp @ Vt
            t = U @ tp
            hyps.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    return hyps


@functools.partial(jax.jit, static_argnames=())
def reconstruct_two_views(x1, x2, valid, key):
    """Full mono-init reconstruction on normalized coords.

    x1, x2 [N,2] matched normalized (z=1) coords; valid [N] bool; key PRNG.
    Returns dict: success, R21, t21 (cam1->cam2), X [N,3] (in cam1 frame),
    good [N] triangulated-inlier mask, used_h (model choice).
    """
    N = x1.shape[0]
    dtype = x1.dtype
    sigma2 = jnp.asarray((SIGMA / 400.0) ** 2, dtype)  # px sigma on normalized plane

    # --- sample hypotheses from valid matches
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(N_HYP, 8), p=p)
    s1 = x1[idx]
    s2 = x2[idx]

    # --- fit + score both models, batched
    Hs = _dlt_h(s1, s2)
    Fs = _dlt_f(s1, s2)
    score_h, good_h = _score_h(Hs, x1, x2, sigma2, valid)
    score_f, good_f = _score_f(Fs, x1, x2, sigma2, valid)
    score_h = jnp.where(jnp.all(jnp.isfinite(Hs.reshape(N_HYP, -1)), -1), score_h, -1.0)
    score_f = jnp.where(jnp.all(jnp.isfinite(Fs.reshape(N_HYP, -1)), -1), score_f, -1.0)
    bi_h = jnp.argmax(score_h)
    bi_f = jnp.argmax(score_f)
    good_h_best = good_h[bi_h] & valid
    good_f_best = good_f[bi_f] & valid
    # least-squares refit on all inliers of the best minimal hypothesis
    # (two rounds of inlier refinement; recovers accuracy the 8-point
    # minimal sample cannot deliver under noise)
    H = Hs[bi_h]
    F = Fs[bi_f]
    for _ in range(2):
        H = _dlt_h(x1[None], x2[None], good_h_best[None].astype(dtype))[0]
        F = _dlt_f(x1[None], x2[None], good_f_best[None].astype(dtype))[0]
        sh, gh = _score_h(H[None], x1, x2, sigma2, valid)
        sf, gf = _score_f(F[None], x1, x2, sigma2, valid)
        good_h_best = gh[0]
        good_f_best = gf[0]
    SH, SF = sh[0], sf[0]
    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.40  # ref: Reconstruct 'if(RH>0.40)'

    # --- decompose both, evaluate all candidate (R,t) with cheirality
    E = F  # normalized coords => F is E
    cands = _decompose_e(E) + _decompose_h(H)  # 4 + 8
    which_good = [good_f_best] * 4 + [good_h_best] * 8
    ns, pars, Xs, oks = [], [], [], []
    for (R, t), g in zip(cands, which_good):
        n, par, X, ok = _check_rt(R, t, x1, x2, g, sigma2)
        ns.append(n); pars.append(par); Xs.append(X); oks.append(ok)
    ns = jnp.stack(ns)
    pars = jnp.stack(pars)
    Xs = jnp.stack(Xs)
    oks = jnp.stack(oks)
    # select among the active model's hypotheses only
    model_mask = jnp.concatenate(
        [jnp.where(use_h, 0.0, 1.0) * jnp.ones(4), jnp.where(use_h, 1.0, 0.0) * jnp.ones(8)]
    )
    ns_m = ns * model_mask.astype(ns.dtype)
    best = jnp.argmax(ns_m)
    n_best = ns_m[best]
    n_inliers = jnp.where(use_h, jnp.sum(good_h_best), jnp.sum(good_f_best))
    # acceptance (ref ReconstructF: nGood > 0.9*nInliers, clear winner, parallax)
    second = jnp.sort(ns_m)[-2]
    ok_clear = second.astype(dtype) < 0.75 * n_best.astype(dtype)
    success = (
        (n_best > 30)
        & (n_best.astype(dtype) > 0.75 * n_inliers.astype(dtype))
        & ok_clear
        & (pars[best] > 1.0)  # ref: minParallax=1.0 deg
        #   (TwoViewReconstruction.cc:114; a sub-degree-parallax init
        #   seeds the map with noise-dominated depths and poisons scale)
    )
    return dict(
        success=success,
        R21=jnp.stack([c[0] for c in cands])[best],
        t21=jnp.stack([c[1] for c in cands])[best],
        X=Xs[best],
        good=oks[best],
        used_h=use_h,
        n_good=n_best,
    )
