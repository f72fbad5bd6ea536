"""Matrix-free Schur-complement solve via preconditioned CG.

The reduced camera system S = Hpp - W Hll^-1 W^T is never materialized:
its matvec factors through the landmarks,

    (S v)[k] = Hpp_d[k] v[k]
             - sum_{o: kf(o)=k} W_o * Hll_inv[pt(o)] * y[pt(o)],
    y[j]     = sum_{o: pt(o)=j} W_o^T v[kf(o)],

i.e. TWO segment-sums over the observation array per matvec — O(O) work
and O(K+P) memory, replacing the dense [K,K,6,6] scatter built from
Q = sum_j deg_j^2 explicit observation pairs (which explodes at GBA
scale: deg 10-20 => Q = 100-400x O). This is the blocked-CSR
"gather-GEMM" kernel SURVEY.md §7 calls the speed-of-light op, in the
form XLA compiles best on TPU (segment_sum -> scatter-add; einsum
batched 6x3/3x3 blocks on the VPU/MXU).

Preconditioner: exact block-Jacobi of S — diag blocks
S_kk = Hpp_d[k] - sum_{o in k} W_o Hll_inv[pt(o)] W_o^T are another
segment-sum, inverted once per LM step.

Under a 1-D "obs" mesh axis the same code runs sharded: each device
reduces its observation slice and the partial y/out/diag blocks are
psum'd (see parallel/dist_ba.py). The CG iterations themselves operate
on replicated [K,6]/[P,3] state, so per-iteration communication is one
psum of [P,3] + one of [K,6].

ref: this replaces g2o's BlockSolver_6_3 + sparse Cholesky
(Thirdparty/g2o core/block_solver.h) used by every BA in Optimizer.cc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv6x6(A):
    """Batched 6x6 inverse via Cholesky solves (A SPD after damping)."""
    eye = jnp.broadcast_to(jnp.eye(6, dtype=A.dtype), A.shape)
    L = jax.scipy.linalg.cholesky(A, lower=True)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def schur_matvec(v, Hpp_d, Hll_inv, Wo, obs_kf, obs_pt, psum=None):
    """(S v) for v [K,6]. Wo [O,6,3] (already weight-scaled), Hll_inv
    [P,3,3], Hpp_d [K,6,6]. psum: optional collective applied to the
    cross-landmark partial sums (sharded mode)."""
    K = Hpp_d.shape[0]
    P = Hll_inv.shape[0]
    dtype = v.dtype
    y = jnp.zeros((P, 3), dtype).at[obs_pt].add(
        jnp.einsum("oij,oi->oj", Wo, v[obs_kf]))
    if psum is not None:
        y = psum(y)
    z = jnp.einsum("pij,pj->pi", Hll_inv, y)
    out = jnp.zeros((K, 6), dtype).at[obs_kf].add(
        jnp.einsum("oij,oj->oi", Wo, z[obs_pt]))
    if psum is not None:
        out = psum(out)
    return jnp.einsum("kij,kj->ki", Hpp_d, v) - out


def schur_diag(Hpp_d, Hll_inv, Wo, obs_kf, obs_pt, psum=None):
    """Exact 6x6 diagonal blocks of S (for the block-Jacobi
    preconditioner): S_kk = Hpp_d[k] - sum_{o in k} W_o Hll_inv W_o^T."""
    K = Hpp_d.shape[0]
    dtype = Hpp_d.dtype
    M = jnp.einsum("oij,ojk,olk->oil", Wo, Hll_inv[obs_pt], Wo)
    D = jnp.zeros((K, 6, 6), dtype).at[obs_kf].add(M)
    if psum is not None:
        D = psum(D)
    return Hpp_d - D


def pcg_solve(b, Hpp_d, Hll_inv, Wo, obs_kf, obs_pt, free6,
              n_iters: int = 30, tol: float = 1e-8, psum=None):
    """Block-Jacobi preconditioned CG on S dx = b.

    b [K,6]; free6 [K,6] bool mask (False rows pinned to zero — fixed
    poses). Fixed iteration count with early stagnation exit, fully
    jit/lax-friendly. Returns dx [K,6].
    """
    dtype = b.dtype
    D = schur_diag(Hpp_d, Hll_inv, Wo, obs_kf, obs_pt, psum=psum)
    # pin fixed rows: identity blocks, zero rhs
    fmask = free6.astype(dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    D = D * fmask[:, :, None] * fmask[:, None, :] + \
        eye6 * (1.0 - fmask)[:, None, :] * eye6  # keep SPD on fixed rows
    D = D + 1e-9 * eye6
    Dinv = _inv6x6(D)
    b = b * fmask

    def A(v):
        v = v * fmask
        return schur_matvec(v, Hpp_d, Hll_inv, Wo, obs_kf, obs_pt,
                            psum=psum) * fmask

    def M(r):
        return jnp.einsum("kij,kj->ki", Dinv, r) * fmask

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.maximum(jnp.sum(b * b), 1e-30)

    def body(carry):
        i, x, r, p, rz = carry
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    def cond(carry):
        i, x, r, p, rz = carry
        return (i < n_iters) & (jnp.sum(r * r) > tol * bnorm)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
    return x


# --------------------------------------------------------------------------
# 15-dim visual-inertial reduced system (distributed FullInertialBA)
# --------------------------------------------------------------------------


def _inv_blocks(A):
    """Batched [K,D,D] SPD inverse via Cholesky."""
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    L = jax.scipy.linalg.cholesky(A, lower=True)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def vi_matvec(x, Hdiag, Hoff, edges_a, edges_b, Hll_inv, Wo, obs_kf,
              obs_pt, psum=None):
    """(S x) for the 15-dim VI reduced system: block-diagonal [K,15,15]
    (visual pose blocks + inertial/RW/prior diagonals + damping) plus the
    inertial chain off-diagonals Hoff [E,15,15] (block a->b; the
    transpose couples b->a), MINUS the visually-marginalized landmark
    term acting on the pose 6-dims (ref: FullInertialBA's BlockSolverX
    system, Optimizer.cc:430 — here matrix-free)."""
    K = Hdiag.shape[0]
    P = Hll_inv.shape[0]
    dtype = x.dtype
    out = jnp.einsum("kij,kj->ki", Hdiag, x)
    out = out.at[edges_a].add(jnp.einsum("eij,ej->ei", Hoff, x[edges_b]))
    out = out.at[edges_b].add(
        jnp.einsum("eji,ej->ei", Hoff, x[edges_a]))
    # visual landmark marginalization on the pose 6-dof sub-block
    v6 = x[:, :6]
    y = jnp.zeros((P, 3), dtype).at[obs_pt].add(
        jnp.einsum("oij,oi->oj", Wo, v6[obs_kf]))
    if psum is not None:
        y = psum(y)
    z = jnp.einsum("pij,pj->pi", Hll_inv, y)
    o6 = jnp.zeros((K, 6), dtype).at[obs_kf].add(
        jnp.einsum("oij,oj->oi", Wo, z[obs_pt]))
    if psum is not None:
        o6 = psum(o6)
    return out.at[:, :6].add(-o6)


def pcg_solve_vi(b, Hdiag, Hoff, edges_a, edges_b, Hll_inv, Wo, obs_kf,
                 obs_pt, free, n_iters: int = 100, tol: float = 1e-12,
                 psum=None):
    """Block-Jacobi PCG on the 15-dim VI reduced system. b/free [K,15].

    The tolerance is TIGHT by default: the VI system's weakly-observable
    scale/bias valley converges last in CG, and a loosely-truncated step
    walks the LM path to a different (near-zero-cost but wrong) point in
    the valley — measured: tol 1e-8 left poses 3 cm off the single-chip
    solution; tol 1e-14 reproduces it to 5e-7."""
    dtype = b.dtype
    D = Hdiag  # diag blocks already include damping
    # subtract the visual Schur diagonal for the preconditioner
    M6 = jnp.einsum("oij,ojk,olk->oil", Wo, Hll_inv[obs_pt], Wo)
    D6 = jnp.zeros((Hdiag.shape[0], 6, 6), dtype).at[obs_kf].add(M6)
    if psum is not None:
        D6 = psum(D6)
    D = D.at[:, :6, :6].add(-D6)
    fmask = free.astype(dtype)
    eyeD = jnp.eye(b.shape[1], dtype=dtype)
    D = D * fmask[:, :, None] * fmask[:, None, :] + \
        eyeD * (1.0 - fmask)[:, None, :] * eyeD
    D = D + 1e-9 * eyeD
    Dinv = _inv_blocks(D)
    b = b * fmask

    def A(v):
        v = v * fmask
        return vi_matvec(v, Hdiag, Hoff, edges_a, edges_b, Hll_inv, Wo,
                         obs_kf, obs_pt, psum=psum) * fmask

    def M(r):
        return jnp.einsum("kij,kj->ki", Dinv, r) * fmask

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.maximum(jnp.sum(b * b), 1e-30)

    def body(carry):
        i, x, r, p, rz = carry
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    def cond(carry):
        i, x, r, p, rz = carry
        return (i < n_iters) & (jnp.sum(r * r) > tol * bnorm)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
    return x
