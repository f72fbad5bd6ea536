"""Batched PnP: camera pose from 3D-2D matches, RANSAC + GN polish.

Fills the role of the reference's relocalization solver
(src/MLPnPsolver.cpp:54 ctor, :99 iterate — ML-PnP on bearing vectors in
a RANSAC loop; min set 6, up to 300 iterations). TPU-native redesign: all
RANSAC hypotheses are solved in ONE batched dispatch — each minimal set
(6 points) through a DLT projection-matrix fit (batched SVD of the 12x12
normal matrix), orthogonalized onto SO(3), cheirality-checked, inliers
counted by masked reduction; the winner is polished by the existing
motion-only GN (solve/pose_opt.py). Bearing-vector formulation keeps it
camera-model agnostic (fisheye unprojects to rays first), like MLPnP.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def dlt_pose(X, xy):
    """DLT pose from n>=6 correspondences, batched over leading dim.

    X [...,n,3] world points, xy [...,n,2] NORMALIZED image coords
    (bearing z=1 plane). Returns (R [...,3,3], t [...,3]).
    """
    n = X.shape[-2]
    dtype = X.dtype
    zeros = jnp.zeros(X.shape[:-1], dtype)
    ones = jnp.ones(X.shape[:-1], dtype)
    u = xy[..., 0]
    v = xy[..., 1]
    # rows: [X 1 0 0 -u*X -u ; 0 0 X 1 -v*X -v] for P = [R|t] row-major 12
    def row(a, b, c):
        # a*[X,1] + b*[X,1] stacked layout helper
        return jnp.concatenate([
            a[..., None] * X, a[..., None] * ones[..., None],
            b[..., None] * X, b[..., None] * ones[..., None],
            c[..., None] * X, c[..., None] * ones[..., None],
        ], -1)
    r1 = row(ones, zeros, -u)
    r2 = row(zeros, ones, -v)
    A = jnp.concatenate([r1, r2], -2)  # [...,2n,12]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., 0]                   # smallest eigenvalue
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # scale + sign: det(M) > 0 and |M| ~ rotation
    det = jnp.linalg.det(M)
    sign = jnp.where(det < 0, -1.0, 1.0)
    P = P * sign[..., None, None]
    M = P[..., :3]
    U, S, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(S, -1)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    fix = jnp.concatenate(
        [jnp.ones(detR.shape + (2,), dtype), detR[..., None]], -1)
    R = (U * fix[..., None, :]) @ Vt
    t = P[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    return R, t


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(X, xy, inv_s2, valid, key, n_hyp: int = 256,
               th_chi2: float = 5.991, focal2: float = 1.0):
    """RANSAC DLT-PnP. X [N,3], xy [N,2] normalized coords, inv_s2 [N]
    per-match information (pixel units -> pass focal2=f^2 to convert the
    normalized-coordinate residual to pixels^2).

    Returns dict(R, t, inliers [N], n_inliers).
    """
    N = X.shape[0]
    nv = jnp.maximum(valid.sum(), 1)
    order = jnp.argsort(~valid)
    idx = jax.random.randint(key, (n_hyp, 6), 0, nv)
    pick = order[idx]
    R, t = dlt_pose(X[pick], xy[pick])   # [H,3,3],[H,3]

    Xc = jnp.einsum("hij,nj->hni", R, X) + t[:, None, :]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = Xc[..., :2] / zs[..., None]
    chi2 = jnp.sum((proj - xy) ** 2, -1) * inv_s2 * focal2
    inl = (chi2 < th_chi2) & (z > 0) & valid
    n_inl = inl.sum(-1)
    best = jnp.argmax(n_inl)
    return dict(R=R[best], t=t[best], inliers=inl[best],
                n_inliers=n_inl[best])
