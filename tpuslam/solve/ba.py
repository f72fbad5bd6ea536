"""Bundle adjustment: batched Gauss-Newton/LM with blocked Schur complement.

This is the g2o replacement (ref: Thirdparty/g2o core/block_solver.h — the
BlockSolver_6_3 with Eigen sparse Cholesky used by
Optimizer::BundleAdjustment (src/Optimizer.cc:62), LocalBundleAdjustment
(:1699) and GlobalBundleAdjustemnt (:54)).

TPU-shaped design:
  * observations as flat arrays (kf idx, pt idx, measurement), residuals and
    Jacobians batched — no graph objects;
  * Hpp/Hll/W blocks by segment_sum over observations;
  * landmark marginalization = batched 3x3 inverses;
  * the pose-pose coupling  W Hll^-1 W^T  is assembled from OBSERVATION
    PAIRS sharing a landmark (host-precomputed index lists; padded/bucketed
    CSR — SURVEY.md §7 'hard parts'), scattered into a dense [6K,6K]
    reduced camera system solved with Cholesky;
  * LM damping with accept/reject, Huber IRLS weights;
  * fixed poses (local-BA frontier, gauge) via row/col masking.

All device math is dtype-generic (f32 on TPU, f64 under tests).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import spd_solve
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_weight, huber_cost
from .reproj import PINHOLE, project_residuals


def build_obs_pairs(obs_pt: np.ndarray, n_points: int):
    """Host-side: all ordered pairs of observation indices sharing a point.

    Returns (pair_a [Q], pair_b [Q]) int32. Q = sum_j deg_j^2. Vectorized
    per-degree-bucket (no Python loop over points).
    """
    obs_pt = np.asarray(obs_pt)
    order = np.argsort(obs_pt, kind="stable")
    sorted_pt = obs_pt[order]
    # group boundaries
    uniq, starts, counts = np.unique(sorted_pt, return_index=True, return_counts=True)
    pair_a = []
    pair_b = []
    for d in np.unique(counts):
        sel = counts == d
        s = starts[sel]  # [G] group starts of degree d
        block = order[(s[:, None] + np.arange(d)[None, :])]  # [G, d]
        a = np.repeat(block, d, axis=1)  # [G, d*d]
        b = np.tile(block, (1, d))
        pair_a.append(a.ravel())
        pair_b.append(b.ravel())
    if not pair_a:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    return (
        np.concatenate(pair_a).astype(np.int32),
        np.concatenate(pair_b).astype(np.int32),
    )


@dataclass
class BAData:
    """Device-side BA problem (all jnp arrays, static shapes)."""

    R: jnp.ndarray          # [K,3,3] Tcw rotations
    t: jnp.ndarray          # [K,3]
    X: jnp.ndarray          # [P,3]
    obs_kf: jnp.ndarray     # [O] int32
    obs_pt: jnp.ndarray     # [O] int32
    uvr: jnp.ndarray        # [O,3]
    inv_sigma2: jnp.ndarray # [O]
    stereo: jnp.ndarray     # [O] bool
    valid: jnp.ndarray      # [O] bool
    fixed: jnp.ndarray      # [K] bool
    pair_a: jnp.ndarray     # [Q] int32 obs indices
    pair_b: jnp.ndarray     # [Q] int32
    right: jnp.ndarray = None  # [O] bool — kb8 rig right-camera obs (None = all left)


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate)."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def _residuals_weights(d: BAData, fx, fy, cx, cy, bf, robust: bool, cam=PINHOLE):
    Rk = d.R[d.obs_kf]
    tk = d.t[d.obs_kf]
    Xo = d.X[d.obs_pt]
    r, Jp, Jl, z = project_residuals(Rk, tk, Xo, d.uvr, d.stereo, fx, fy, cx, cy, bf, cam, d.right)
    chi2 = jnp.sum(r * r, -1) * d.inv_sigma2
    chi2_th = jnp.where(d.stereo, CHI2_STEREO, CHI2_MONO).astype(r.dtype)
    w_rob = huber_weight(chi2, chi2_th) if robust else jnp.ones_like(chi2)
    w = w_rob * d.inv_sigma2 * d.valid.astype(r.dtype) * (z > 0).astype(r.dtype)
    cost = jnp.where(
        d.valid & (z > 0),
        huber_cost(chi2, chi2_th) if robust else chi2,
        0.0,
    )  # PER-OBS cost terms; callers sum (or difference-then-sum: f32-safe
    #    accept tests need the cancellation before the reduction)
    return r, Jp, Jl, w, cost, chi2, z


def _assemble_blocks(d: BAData, lam, fx, fy, cx, cy, bf, robust: bool,
                     cam=PINHOLE):
    """Shared normal-equation assembly: damped block diagonals + weighted
    coupling blocks (used by both the dense-pair Schur and the
    matrix-free CG step)."""
    K = d.R.shape[0]
    P = d.X.shape[0]
    dtype = d.X.dtype
    r, Jp, Jl, w, cost, _, _ = _residuals_weights(d, fx, fy, cx, cy, bf, robust, cam)

    Jp_w = Jp * w[:, None, None]
    # block accumulations
    Hpp = jnp.zeros((K, 6, 6), dtype).at[d.obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jp_w, Jp)
    )
    bp = jnp.zeros((K, 6), dtype).at[d.obs_kf].add(-jnp.einsum("oij,oi->oj", Jp_w, r))
    Jl_w = Jl * w[:, None, None]
    Hll = jnp.zeros((P, 3, 3), dtype).at[d.obs_pt].add(
        jnp.einsum("oij,oik->ojk", Jl_w, Jl)
    )
    bl = jnp.zeros((P, 3), dtype).at[d.obs_pt].add(-jnp.einsum("oij,oi->oj", Jl_w, r))
    Wo = jnp.einsum("oij,oik->ojk", Jp_w, Jl)  # [O,6,3]

    # LM damping (multiplicative on block diagonals, g2o-style)
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hpp_d = Hpp + lam * (eye6 * jnp.diagonal(Hpp, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye6
    Hll_d = Hll + lam * (eye3 * jnp.diagonal(Hll, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye3
    return Hpp_d, bp, _inv3x3(Hll_d), bl, Wo, cost


def _apply_step(d: BAData, dx_pose, Hll_inv, Wo, bl):
    """Back-substitute landmarks and apply the SE(3) pose increments."""
    P = d.X.shape[0]
    dtype = d.X.dtype
    WtDx = jnp.zeros((P, 3), dtype).at[d.obs_pt].add(
        jnp.einsum("oij,oi->oj", Wo, dx_pose[d.obs_kf])
    )
    dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - WtDx)
    dR, dt = lie.se3_exp(dx_pose)
    R_new = dR @ d.R
    t_new = jnp.einsum("kij,kj->ki", dR, d.t) + dt
    R_new = jnp.where(d.fixed[:, None, None], d.R, R_new)
    t_new = jnp.where(d.fixed[:, None], d.t, t_new)
    return R_new, t_new, d.X + dx_pt


def _gn_step_cg(d: BAData, lam, fx, fy, cx, cy, bf, robust: bool,
                cam=PINHOLE, cg_iters: int = 30):
    """Damped GN step with the MATRIX-FREE Schur solve (solve/schur_cg.py):
    no pair lists, O(O) work — the GBA-scale path (Q = sum deg^2 pair
    scatters explode at K in the hundreds / landmark degree 10-20)."""
    from .schur_cg import pcg_solve

    Hpp_d, bp, Hll_inv, bl, Wo, cost = _assemble_blocks(
        d, lam, fx, fy, cx, cy, bf, robust, cam)
    Ao = Wo @ Hll_inv[d.obs_pt]
    b_red = bp - jnp.zeros_like(bp).at[d.obs_kf].add(
        jnp.einsum("oij,oj->oi", Ao, bl[d.obs_pt]))
    free6 = jnp.repeat(~d.fixed, 6).reshape(-1, 6)
    dx_pose = pcg_solve(b_red, Hpp_d, Hll_inv, Wo, d.obs_kf, d.obs_pt,
                        free6, n_iters=cg_iters)
    R_new, t_new, X_new = _apply_step(d, dx_pose, Hll_inv, Wo, bl)
    return R_new, t_new, X_new, cost


def _gn_step(d: BAData, lam, fx, fy, cx, cy, bf, robust: bool, cam=PINHOLE):
    """One damped GN step (dense-pair reduced system + exact Cholesky).
    Returns (R_new, t_new, X_new, cost_terms_before)."""
    K = d.R.shape[0]
    dtype = d.X.dtype
    Hpp_d, bp, Hll_inv, bl, Wo, cost = _assemble_blocks(
        d, lam, fx, fy, cx, cy, bf, robust, cam)
    Ao = Wo @ Hll_inv[d.obs_pt]  # [O,6,3]

    # reduced camera system S = Hpp - sum_pairs A_{o1} W_{o2}^T
    S = jnp.zeros((K * K, 6, 6), dtype)
    Mq = Ao[d.pair_a] @ jnp.swapaxes(Wo[d.pair_b], -1, -2)  # [Q,6,6]
    blk = d.obs_kf[d.pair_a] * K + d.obs_kf[d.pair_b]
    S = S.at[blk].add(-Mq)
    S = S.at[jnp.arange(K) * K + jnp.arange(K)].add(Hpp_d)
    S = S.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(K * 6, K * 6)

    b_red = bp - jnp.zeros((K, 6), dtype).at[d.obs_kf].add(
        jnp.einsum("oij,oj->oi", Ao, bl[d.obs_pt])
    )
    b_red = b_red.reshape(K * 6)

    # fixed poses: identity rows/cols
    free = ~d.fixed
    free6 = jnp.repeat(free, 6)
    mask2d = free6[:, None] & free6[None, :]
    S = jnp.where(mask2d, S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    b_red = jnp.where(free6, b_red, 0.0)

    # f32-robust reduced-camera solve (Jacobi-scaled Cholesky + refinement;
    # LM damping is already in S via the multiplicative block damping above)
    dx_pose = spd_solve(S, b_red).reshape(K, 6)
    R_new, t_new, X_new = _apply_step(d, dx_pose, Hll_inv, Wo, bl)
    return R_new, t_new, X_new, cost


def _cost_terms(d: BAData, fx, fy, cx, cy, bf, robust: bool, cam=PINHOLE):
    """Per-observation cost terms [O]."""
    return _residuals_weights(d, fx, fy, cx, cy, bf, robust, cam)[4]


@functools.partial(jax.jit, static_argnames=("n_iters", "robust", "cam", "use_cg", "cg_iters"))
def ba_solve(
    R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid, fixed,
    pair_a, pair_b, fx, fy, cx, cy, bf,
    n_iters: int = 10, robust: bool = True, lam0: float = 1e-4,
    cam=PINHOLE, right=None, use_cg: bool = False, cg_iters: int = 30,
):
    """LM loop with g2o iteration semantics.

    In g2o (the reference's solver) one 'iteration' = one ACCEPTED step;
    rejected trials raise lambda and retry within the same iteration
    (OptimizationAlgorithmLevenberg maxTrials). So n_iters counts
    accepted steps here, with a 3x total-trial cap, plus a relative-gain
    stall exit. Under-converged local BA is not just slow — it leaves
    scale inconsistency between map regions that hardens into the
    trajectory. Returns (R, t, X, final_cost)."""
    dtype = X.dtype
    rel_tol = 1e-8
    max_trials = 3 * n_iters

    def cond(carry):
        _, _, _, _, cost, delta, n_acc, n_tot = carry
        stalled = (delta <= 0) & (-delta < rel_tol * jnp.maximum(cost, 1e-20))
        return (n_acc < n_iters) & (n_tot < max_trials) & ~stalled

    def body(carry):
        R, t, X, lam, cost, _, n_acc, n_tot = carry
        d = BAData(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                   fixed, pair_a, pair_b, right)
        if use_cg:
            R2, t2, X2, _ = _gn_step_cg(d, lam, fx, fy, cx, cy, bf, robust,
                                        cam, cg_iters)
        else:
            R2, t2, X2, _ = _gn_step(d, lam, fx, fy, cx, cy, bf, robust, cam)
        d2 = BAData(R2, t2, X2, obs_kf, obs_pt, uvr, inv_sigma2, stereo,
                    valid, fixed, pair_a, pair_b, right)
        # f32-safe acceptance: sum of PER-OBS cost differences — at f32 a
        # genuine small improvement vanishes below the resolution of the
        # two large totals, every step rejects and the solver stalls
        delta = jnp.sum(
            _cost_terms(d2, fx, fy, cx, cy, bf, robust, cam)
            - _cost_terms(d, fx, fy, cx, cy, bf, robust, cam))
        accept = delta < 0
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        X = jnp.where(accept, X2, X)
        cost = cost + jnp.where(accept, delta, 0.0)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        # FLOOR at 1e-3 (not 1e-9): with multiplicative damping, lambda is
        # the only thing pinning the problem's FLAT directions (depth of
        # low-parallax landmarks) to their initialization. Once lambda
        # decays to ~0, noise-level gradients push meter-scale steps along
        # those directions that are cost-neutral and get accepted —
        # measured: a 1 mm point perturbation moved the BA solution's
        # points by 0.94 m RMS. The floor bounds flat-direction movement
        # while observable directions (curvature >> 1e-3*diag) still
        # converge to machine precision. dist_ba.py applies the same floor.
        lam = jnp.clip(lam, 1e-3, 1e6)
        # a rejected trial reports delta=+inf: never mistaken for a stall
        delta = jnp.where(accept, delta, jnp.asarray(jnp.inf, dtype))
        return (R, t, X, lam, cost, delta,
                n_acc + accept.astype(jnp.int32), n_tot + 1)

    d0 = BAData(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                fixed, pair_a, pair_b, right)
    cost0 = jnp.sum(_cost_terms(d0, fx, fy, cx, cy, bf, robust, cam))
    R, t, X, _, cost, _, _, _ = jax.lax.while_loop(
        cond, body,
        (R, t, X, jnp.asarray(lam0, dtype), cost0,
         jnp.asarray(jnp.inf, dtype), 0, 0),
    )
    return R, t, X, cost


def ba_solve_np(
    R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid, fixed,
    fx, fy, cx, cy, bf, n_iters=10, robust=True, cam=PINHOLE, right=None,
):
    """Numpy-facing BA with shape bucketing (K, P, O, Q padded to buckets so
    the frame loop reuses compiled programs). Returns (R, t, X, chi2 [O],
    pos_depth [O]) with chi2 evaluated at the solution for outlier pruning.

    Padded poses are fixed; padded observations have valid=False (zero
    weight), so padding is numerically inert.
    """
    from ..utils.pad import bucket, pad_to

    K, P, O = len(R), len(X), len(obs_kf)
    # GBA-scale guard: the pair-scatter reduced system costs Q = sum deg^2
    # blocks; past ~300k blocks the matrix-free CG Schur (schur_cg.py) is
    # the faster AND smaller path, so switch automatically
    deg = np.bincount(np.asarray(obs_pt), minlength=P)
    use_cg = float((deg.astype(np.int64) ** 2).sum()) > 300_000
    if use_cg:
        pa = pb = np.zeros(1, np.int32)
    else:
        pa, pb = build_obs_pairs(np.asarray(obs_pt), P)
    Kb, Pb, Ob, Qb = bucket(K, 8), bucket(P, 256), bucket(O, 512), bucket(max(len(pa), 1), 1024)
    Rp = np.zeros((Kb, 3, 3))
    Rp[:] = np.eye(3)
    Rp[:K] = R   # (np.asarray of a jax array is read-only; build fresh)
    tp = pad_to(np.asarray(t, np.float64), Kb)
    Xp = pad_to(np.asarray(X, np.float64), Pb)
    okf = pad_to(np.asarray(obs_kf, np.int32), Ob, Kb - 1)
    opt = pad_to(np.asarray(obs_pt, np.int32), Ob, Pb - 1)
    uvrp = pad_to(np.asarray(uvr, np.float64), Ob)
    is2 = pad_to(np.asarray(inv_sigma2, np.float64), Ob)
    st = pad_to(np.asarray(stereo, bool), Ob, False)
    vl = pad_to(np.asarray(valid, bool), Ob, False)
    fx_p = pad_to(np.asarray(fixed, bool), Kb, True)
    pap = pad_to(pa.astype(np.int32), Qb, Ob - 1)
    pbp = pad_to(pb.astype(np.int32), Qb, Ob - 1)
    rt = None if right is None else jnp.asarray(
        pad_to(np.asarray(right, bool), Ob, False))
    Rf, tf, Xf, cost = ba_solve(
        jnp.asarray(Rp), jnp.asarray(tp), jnp.asarray(Xp), jnp.asarray(okf),
        jnp.asarray(opt), jnp.asarray(uvrp), jnp.asarray(is2), jnp.asarray(st),
        jnp.asarray(vl), jnp.asarray(fx_p), jnp.asarray(pap), jnp.asarray(pbp),
        fx, fy, cx, cy, bf, n_iters=n_iters, robust=robust, cam=cam, right=rt,
        use_cg=use_cg,
    )
    chi2, posz = _ba_chi2_jit(
        Rf, tf, Xf, jnp.asarray(okf), jnp.asarray(opt), jnp.asarray(uvrp),
        jnp.asarray(is2), jnp.asarray(st), fx, fy, cx, cy, bf, cam=cam,
        right=rt,
    )
    return (
        np.asarray(Rf)[:K], np.asarray(tf)[:K], np.asarray(Xf)[:P],
        np.asarray(chi2)[:O], np.asarray(posz)[:O],
    )


def ba_chi2(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, fx, fy, cx, cy, bf, cam=PINHOLE, right=None):
    """Per-observation chi2 + positive-depth flags (for outlier pruning
    between BA phases, ref Optimizer.cc:2064-2120)."""
    Rk = R[obs_kf]
    tk = t[obs_kf]
    r, _, _, z = project_residuals(Rk, tk, X[obs_pt], uvr, stereo, fx, fy, cx, cy, bf, cam, right)
    return jnp.sum(r * r, -1) * inv_sigma2, z > 0


_ba_chi2_jit = jax.jit(ba_chi2, static_argnames=("cam",))
