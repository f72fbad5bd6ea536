"""Distributed bundle adjustment over a device mesh.

The genuinely new layer relative to the reference (which is single-process
with 4 threads — SURVEY.md §2.3): observations and landmark blocks are
sharded across devices on a 1-D mesh axis "obs"; each device reduces its
observation blocks into partial Hpp / Hll / W / Schur contributions; the
reduced camera system is summed with psum over ICI and solved replicated
(it is small: 6K x 6K); landmark back-substitution is again local + psum.

Design per BASELINE.json north star: "distributed BA via Schur-complement
reduction over psum/all-gather collectives".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import lie
from ..core.linalg import spd_solve
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_weight, huber_cost
from ..solve.reproj import PINHOLE, project_residuals
from ..solve.ba import _inv3x3, build_obs_pairs


def _local_blocks(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                  fx, fy, cx, cy, bf, robust, cam=PINHOLE, right=None):
    """Per-shard residual/Jacobian reduction (runs on each device's slice)."""
    K = R.shape[0]
    Pn = X.shape[0]
    dtype = X.dtype
    Rk = R[obs_kf]
    tk = t[obs_kf]
    r, Jp, Jl, z = project_residuals(Rk, tk, X[obs_pt], uvr, stereo,
                                     fx, fy, cx, cy, bf, cam, right)
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    chi2_th = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(dtype)
    w_rob = huber_weight(chi2, chi2_th) if robust else jnp.ones_like(chi2)
    w = w_rob * inv_sigma2 * valid.astype(dtype) * (z > 0).astype(dtype)
    cost = jnp.sum(jnp.where(valid & (z > 0),
                             huber_cost(chi2, chi2_th) if robust else chi2, 0.0))
    Jp_w = Jp * w[:, None, None]
    Jl_w = Jl * w[:, None, None]
    Hpp = jnp.zeros((K, 6, 6), dtype).at[obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jp_w, Jp))
    bp = jnp.zeros((K, 6), dtype).at[obs_kf].add(
        -jnp.einsum("oij,oi->oj", Jp_w, r))
    Hll = jnp.zeros((Pn, 3, 3), dtype).at[obs_pt].add(
        jnp.einsum("oij,oik->ojk", Jl_w, Jl))
    bl = jnp.zeros((Pn, 3), dtype).at[obs_pt].add(
        -jnp.einsum("oij,oi->oj", Jl_w, r))
    Wo = jnp.einsum("oij,oik->ojk", Jp_w, Jl)
    return Hpp, bp, Hll, bl, Wo, cost


def make_dist_ba_step(mesh: Mesh, fx, fy, cx, cy, bf, robust=True, cam=PINHOLE):
    """Builds a shard_map'd damped-GN BA step.

    Replicated: poses (R [K,3,3], t [K,3]), points X [P,3], fixed [K], lam.
    Sharded on "obs": obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
    pair_a, pair_b (pair indices are LOCAL to the shard's observation slice
    — the host builds pairs per shard, which is exact when each landmark's
    observations stay in one shard, i.e. landmark-aligned sharding).

    Returns step(R, t, X, lam, *obs) -> (R', t', X', cost).
    """

    def step_local(R, t, X, fixed, lam, obs_kf, obs_pt, uvr, inv_sigma2,
                   stereo, valid, pair_a, pair_b):
        K = R.shape[0]
        dtype = X.dtype
        Hpp, bp, Hll, bl, Wo, cost = _local_blocks(
            R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, robust, cam,
        )
        # global landmark blocks: a landmark's obs may span shards -> psum
        Hll = jax.lax.psum(Hll, "obs")
        bl = jax.lax.psum(bl, "obs")
        cost = jax.lax.psum(cost, "obs")
        Hpp = jax.lax.psum(Hpp, "obs")
        bp = jax.lax.psum(bp, "obs")
        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp_d = Hpp + lam * (eye6 * jnp.diagonal(Hpp, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye6
        Hll_d = Hll + lam * (eye3 * jnp.diagonal(Hll, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye3
        Hll_inv = _inv3x3(Hll_d)
        Ao = Wo @ Hll_inv[obs_pt]
        # local pair contributions to the reduced camera system, then psum
        S = jnp.zeros((K * K, 6, 6), dtype)
        Mq = Ao[pair_a] @ jnp.swapaxes(Wo[pair_b], -1, -2)
        blk = obs_kf[pair_a] * K + obs_kf[pair_b]
        S = S.at[blk].add(-Mq)
        S = jax.lax.psum(S, "obs")
        S = S.at[jnp.arange(K) * K + jnp.arange(K)].add(Hpp_d)
        S = S.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        b_red = bp - jax.lax.psum(
            jnp.zeros((K, 6), dtype).at[obs_kf].add(
                jnp.einsum("oij,oj->oi", Ao, bl[obs_pt])), "obs")
        b_red = b_red.reshape(K * 6)
        free6 = jnp.repeat(~fixed, 6)
        S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
        b_red = jnp.where(free6, b_red, 0.0)
        dx_pose = spd_solve(S, b_red).reshape(K, 6)  # replicated solve
        WtDx = jax.lax.psum(
            jnp.zeros((X.shape[0], 3), dtype).at[obs_pt].add(
                jnp.einsum("oij,oi->oj", Wo, dx_pose[obs_kf])), "obs")
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - WtDx)
        dR, dt = lie.se3_exp(dx_pose)
        R_new = jnp.where(fixed[:, None, None], R, dR @ R)
        t_new = jnp.where(fixed[:, None], t,
                          jnp.einsum("kij,kj->ki", dR, t) + dt)
        return R_new, t_new, X + dx_pt, cost

    spec_rep = P()
    spec_obs = P("obs")
    step = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                  spec_obs, spec_obs, spec_obs, spec_obs, spec_obs, spec_obs,
                  spec_obs, spec_obs),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep),
    )
    return step


def shard_observations(obs_pt, n_shards, pad_multiple=256):
    """Landmark-aligned observation sharding: observations of the same
    landmark go to the same shard (keeps pair lists shard-local and the
    Schur reduction exact). Returns (perm, shard_sizes, padded_len).

    Host-side partitioning — the covisibility-aware partition of
    SURVEY.md §7 step 12 starts here (round-robin over landmarks by
    descending degree = load balance)."""
    obs_pt = np.asarray(obs_pt)
    uniq, counts = np.unique(obs_pt, return_counts=True)
    order = np.argsort(-counts)
    load = np.zeros(n_shards, np.int64)
    cnt = dict(zip(uniq.tolist(), counts.tolist()))
    shard_of_pt = {}
    for j in uniq[order]:
        s = int(np.argmin(load))
        shard_of_pt[int(j)] = s
        load[s] += cnt[int(j)]
    shards = [[] for _ in range(n_shards)]
    for o, j in enumerate(obs_pt):
        shards[shard_of_pt[int(j)]].append(o)
    # strictly > max shard size so every shard keeps >=1 invalid slot for
    # pair-list padding to point at
    per = int(np.ceil((max(max(len(s) for s in shards), 1) + 1) / pad_multiple)) * pad_multiple
    return shards, per


def dist_ba_solve(mesh, R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo,
                  valid, fixed, fx, fy, cx, cy, bf, n_iters=10, robust=True):
    """Host-orchestrated LM loop over the sharded GN step. Inputs numpy."""
    n_shards = mesh.devices.size
    shards, per = shard_observations(obs_pt, n_shards)
    O_pad = per * n_shards
    K = len(R)

    def pack(arr, fill):
        out = np.full((n_shards, per) + np.asarray(arr).shape[1:], fill,
                      np.asarray(arr).dtype)
        for s, idx in enumerate(shards):
            out[s, : len(idx)] = np.asarray(arr)[idx]
        return out.reshape((O_pad,) + np.asarray(arr).shape[1:])

    okf = pack(np.asarray(obs_kf, np.int32), 0)
    opt = pack(np.asarray(obs_pt, np.int32), 0)
    uvr_p = pack(np.asarray(uvr), 0.0)
    is2 = pack(np.asarray(inv_sigma2), 0.0)
    st = pack(np.asarray(stereo, bool), False)
    vl = pack(np.asarray(valid, bool), False)
    # per-shard local pair lists (local obs indices within the shard slice)
    Q_per = 1
    pair_lists = []
    for s, idx in enumerate(shards):
        pa, pb = build_obs_pairs(np.asarray(obs_pt)[idx], len(X))
        pair_lists.append((pa, pb))
        Q_per = max(Q_per, len(pa))
    Q_per = int(np.ceil(Q_per / 256)) * 256
    pa_all = np.zeros((n_shards, Q_per), np.int32)
    pb_all = np.zeros((n_shards, Q_per), np.int32)
    for s, (pa, pb) in enumerate(pair_lists):
        # pad pairs with an index pointing at an invalid (zero-weight) slot
        pad_idx = len(shards[s])  # always < per by construction
        pa_all[s, : len(pa)] = pa
        pb_all[s, : len(pb)] = pb
        pa_all[s, len(pa):] = pad_idx
        pb_all[s, len(pb):] = pad_idx
    pa_all = pa_all.reshape(-1)
    pb_all = pb_all.reshape(-1)

    step = make_dist_ba_step(mesh, fx, fy, cx, cy, bf, robust)
    step = jax.jit(step)

    Rj = jnp.asarray(R)
    tj = jnp.asarray(t)
    Xj = jnp.asarray(X)
    fixedj = jnp.asarray(fixed)
    lam = 1e-4
    cost_prev = None
    for _ in range(n_iters):
        R2, t2, X2, cost = step(
            Rj, tj, Xj, fixedj, jnp.asarray(lam, Xj.dtype),
            jnp.asarray(okf), jnp.asarray(opt), jnp.asarray(uvr_p),
            jnp.asarray(is2), jnp.asarray(st), jnp.asarray(vl),
            jnp.asarray(pa_all), jnp.asarray(pb_all),
        )
        c = float(cost)
        if cost_prev is None or c < cost_prev:
            # cost returned is the cost BEFORE the step; evaluate accept by
            # next iteration's cost — simple monotone schedule here
            Rj, tj, Xj = R2, t2, X2
            lam = max(lam * 0.5, 1e-9)
            cost_prev = c
        else:
            lam = min(lam * 4.0, 1e6)
    return np.asarray(Rj), np.asarray(tj), np.asarray(Xj), cost_prev
