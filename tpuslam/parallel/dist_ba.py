"""Distributed bundle adjustment over a device mesh.

The genuinely new layer relative to the reference (which is single-process
with 4 threads — SURVEY.md §2.3): observations are sharded across devices
on a 1-D mesh axis "obs"; each device reduces its observation slice into
partial Hpp / Hll / W blocks; the reduced camera system is solved with a
MATRIX-FREE preconditioned CG (solve/schur_cg.py) whose per-iteration
communication is one psum of [P,3] + one of [K,6] — no dense [K,K,6,6]
system, no Q = sum deg^2 pair lists, no landmark-aligned sharding
requirement (cross-shard landmark sums ride the psum).

LM semantics: the sharded step evaluates the POST-step cost inside the
same program and accept/rejects the CURRENT trial (matching ba_solve /
g2o OptimizationAlgorithmLevenberg), returning both costs — round 2's
one-iteration-lagged acceptance is gone.

Design per BASELINE.json north star: "distributed BA via Schur-complement
reduction over psum/all-gather collectives".
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import lie
from ..core.robust import CHI2_MONO, CHI2_STEREO, huber_weight, huber_cost
from ..solve.reproj import PINHOLE, project_residuals
from ..solve.ba import _inv3x3
from ..solve.schur_cg import pcg_solve


def _local_blocks(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                  fx, fy, cx, cy, bf, robust, cam=PINHOLE, right=None):
    """Per-shard residual/Jacobian reduction (runs on each device's slice).

    Returns per-shard partial (Hpp, bp, Hll, bl) plus the LOCAL per-obs
    weighted Jacobian blocks Wo and per-obs cost terms."""
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
    cost_terms = jnp.where(valid & (z > 0),
                           huber_cost(chi2, chi2_th) if robust else chi2,
                           0.0)
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
    return Hpp, bp, Hll, bl, Wo, cost_terms


def _cost_local(R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                fx, fy, cx, cy, bf, robust, cam=PINHOLE, right=None):
    Rk = R[obs_kf]
    tk = t[obs_kf]
    r, _, _, z = project_residuals(Rk, tk, X[obs_pt], uvr, stereo,
                                   fx, fy, cx, cy, bf, cam, right)
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    chi2_th = jnp.where(stereo, CHI2_STEREO, CHI2_MONO).astype(r.dtype)
    c = huber_cost(chi2, chi2_th) if robust else chi2
    return jnp.where(valid & (z > 0), c, 0.0)


def make_dist_ba_step(mesh: Mesh, fx, fy, cx, cy, bf, robust=True,
                      cam=PINHOLE, cg_iters: int = 30):
    """Builds a shard_map'd damped-LM trial step with in-step acceptance.

    Replicated: poses (R [K,3,3], t [K,3]), points X [P,3], fixed [K], lam.
    Sharded on "obs": obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid.

    Returns step(R, t, X, fixed, lam, *obs) ->
        (R', t', X', cost_before, cost_after)
    where (R', t', X') is the TRIAL result and both costs are evaluated
    in the same program, so the host's accept/reject uses the current
    trial (g2o semantics, unlike the lagged round-2 schedule)."""

    def psum(x):
        return jax.lax.psum(x, "obs")

    def step_local(R, t, X, fixed, lam, obs_kf, obs_pt, uvr, inv_sigma2,
                   stereo, valid):
        dtype = X.dtype
        Hpp, bp, Hll, bl, Wo, cost_terms = _local_blocks(
            R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, robust, cam,
        )
        # reduce per-shard partial sums, then across shards
        cost0 = psum(jnp.sum(cost_terms))
        Hll = psum(Hll)
        bl = psum(bl)
        Hpp = psum(Hpp)
        bp = psum(bp)
        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp_d = Hpp + lam * (eye6 * jnp.diagonal(
            Hpp, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye6
        Hll_d = Hll + lam * (eye3 * jnp.diagonal(
            Hll, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye3
        Hll_inv = _inv3x3(Hll_d)
        # reduced rhs: b_red = bp - sum_o A_o bl[pt(o)]
        Ao = Wo @ Hll_inv[obs_pt]
        b_red = bp - psum(
            jnp.zeros_like(bp).at[obs_kf].add(
                jnp.einsum("oij,oj->oi", Ao, bl[obs_pt])))
        free6 = jnp.repeat(~fixed, 6).reshape(-1, 6)
        # matrix-free PCG on the reduced camera system; the matvec's
        # segment-sums run on the local slice and psum across shards
        dx_pose = pcg_solve(
            b_red, Hpp_d, Hll_inv, Wo, obs_kf, obs_pt, free6,
            n_iters=cg_iters, psum=psum)
        # landmark back-substitution
        WtDx = psum(
            jnp.zeros_like(bl).at[obs_pt].add(
                jnp.einsum("oij,oi->oj", Wo, dx_pose[obs_kf])))
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - WtDx)
        dR, dt = lie.se3_exp(dx_pose)
        R_new = jnp.where(fixed[:, None, None], R, dR @ R)
        t_new = jnp.where(fixed[:, None], t,
                          jnp.einsum("kij,kj->ki", dR, t) + dt)
        X_new = X + dx_pt
        # post-step cost in the SAME program -> in-step accept/reject
        cost1 = psum(jnp.sum(_cost_local(
            R_new, t_new, X_new, obs_kf, obs_pt, uvr, inv_sigma2, stereo,
            valid, fx, fy, cx, cy, bf, robust, cam)))
        return R_new, t_new, X_new, cost0, cost1

    spec_rep = P()
    spec_obs = P("obs")
    return shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                  spec_obs, spec_obs, spec_obs, spec_obs, spec_obs,
                  spec_obs),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep, spec_rep),
    )


def make_dist_viba_step(mesh: Mesh, fx, fy, cx, cy, bf, Rcb, tcb,
                        prior_g: float = 0.0, prior_a: float = 0.0,
                        robust=True, cam=PINHOLE, cg_iters: int = 30):
    """Distributed FullInertialBA trial step (ref: Optimizer.cc:420 —
    the solve the reference's GBA runs on inertial maps,
    LoopClosing.cc:2437-2440): 15-dim keyframe states (body pose,
    velocity, gyro/acc bias), landmarks marginalized matrix-free, the
    inertial chain + bias random-walk + prior edges REPLICATED (E = K-1
    is tiny next to O), visual observation blocks SHARDED over the "obs"
    mesh axis exactly like make_dist_ba_step. Per-CG-iteration
    communication: one psum[P,3] + one psum[K,15]-shaped partial.

    Replicated inputs: Rwb [K,3,3], p/v/bg/ba [K,3], X [P,3], fixed [K],
    lam, edges_a/b [E], pre_stack (dict of [E,...]), info9 [E,9,9],
    bg0/ba0 [K,3], rw_g/rw_a [E].
    Sharded: obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid.
    Returns (Rwb', p', v', bg', ba', X', cost_before, cost_after).
    """
    from ..core.lie import so3_exp
    from ..solve.inertial_ba import _inertial_parts, _reproj_parts, _edge_res
    from ..solve.schur_cg import pcg_solve_vi

    D = 15

    def psum(x):
        return jax.lax.psum(x, "obs")

    def inertial_system(Rwb, p, v, bg, ba, edges_a, edges_b, pre_stack,
                        info9, bg0, ba0, rw_g, rw_a, dtype):
        """Replicated: diag [K,15,15] + chain off-diag [E,15,15] + rhs +
        cost of the inertial/RW/prior terms."""
        K = Rwb.shape[0]
        ri, J1, J2, _ = _inertial_parts(
            Rwb, p, v, bg, ba, edges_a, edges_b, pre_stack, bg0, ba0, info9)
        J1W = jnp.einsum("eij,ejk->eik", jnp.swapaxes(J1, 1, 2), info9)
        J2W = jnp.einsum("eij,ejk->eik", jnp.swapaxes(J2, 1, 2), info9)
        Hdiag = jnp.zeros((K, D, D), dtype)
        Hdiag = Hdiag.at[edges_a].add(J1W @ J1)
        Hdiag = Hdiag.at[edges_b].add(J2W @ J2)
        Hoff = J1W @ J2  # block (a,b) per edge
        b15 = jnp.zeros((K, D), dtype)
        b15 = b15.at[edges_a].add(-jnp.einsum("eij,ej->ei", J1W, ri))
        b15 = b15.at[edges_b].add(-jnp.einsum("eij,ej->ei", J2W, ri))
        cost = jnp.sum(jnp.einsum("ei,eij,ej->e", ri, info9, ri))
        eye3 = jnp.eye(3, dtype=dtype)
        dbg_e = bg[edges_b] - bg[edges_a]
        dba_e = ba[edges_b] - ba[edges_a]
        for s0, diff, info_rw in ((9, dbg_e, rw_g), (12, dba_e, rw_a)):
            sl = slice(s0, s0 + 3)
            Iw = info_rw[:, None, None] * eye3[None]
            Hdiag = Hdiag.at[edges_a, sl, sl].add(Iw)
            Hdiag = Hdiag.at[edges_b, sl, sl].add(Iw)
            Hoff = Hoff.at[:, sl, sl].add(-Iw)
            b15 = b15.at[edges_a, sl].add(info_rw[:, None] * diff)
            b15 = b15.at[edges_b, sl].add(-info_rw[:, None] * diff)
        cost = cost + jnp.sum(rw_g[:, None] * dbg_e ** 2) + jnp.sum(
            rw_a[:, None] * dba_e ** 2)
        if prior_g > 0:
            Hdiag = Hdiag.at[:, 9:12, 9:12].add(prior_g * eye3[None])
            b15 = b15.at[:, 9:12].add(-prior_g * bg)
            cost = cost + prior_g * jnp.sum(bg ** 2)
        if prior_a > 0:
            Hdiag = Hdiag.at[:, 12:15, 12:15].add(prior_a * eye3[None])
            b15 = b15.at[:, 12:15].add(-prior_a * ba)
            cost = cost + prior_a * jnp.sum(ba ** 2)
        return Hdiag, Hoff, b15, cost

    def step_local(Rwb, p, v, bg, ba, X, fixed, lam,
                   edges_a, edges_b, pre_stack, info9, bg0, ba0, rw_g, rw_a,
                   obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid):
        dtype = X.dtype
        K = Rwb.shape[0]
        P = X.shape[0]
        # sharded visual blocks (body-frame Jacobians + Tbc extrinsic)
        r, Jp6, Jl, w, cost_v = _reproj_parts(
            Rwb, p, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, robust, Rcb, tcb, cam)
        Jl_w = Jl * w[:, None, None]
        Hll = psum(jnp.zeros((P, 3, 3), dtype).at[obs_pt].add(
            jnp.einsum("oij,oik->ojk", Jl_w, Jl)))
        bl = psum(jnp.zeros((P, 3), dtype).at[obs_pt].add(
            -jnp.einsum("oij,oi->oj", Jl_w, r)))
        Jp_w = Jp6 * w[:, None, None]
        Hpp6 = psum(jnp.zeros((K, 6, 6), dtype).at[obs_kf].add(
            jnp.einsum("oij,oik->ojk", Jp_w, Jp6)))
        bp6 = psum(jnp.zeros((K, 6), dtype).at[obs_kf].add(
            -jnp.einsum("oij,oi->oj", Jp_w, r)))
        cost0_v = psum(jnp.sum(cost_v))
        # replicated inertial terms
        Hdiag, Hoff, b15, cost0_i = inertial_system(
            Rwb, p, v, bg, ba, edges_a, edges_b, pre_stack, info9,
            bg0, ba0, rw_g, rw_a, dtype)
        Hdiag = Hdiag.at[:, :6, :6].add(Hpp6)
        b15 = b15.at[:, :6].add(bp6)
        cost0 = cost0_v + cost0_i
        # damping
        eyeD = jnp.eye(D, dtype=dtype)
        diag = jnp.diagonal(Hdiag, axis1=-2, axis2=-1)
        Hdiag_d = Hdiag + lam * (eyeD * diag[:, None, :]) + 1e-6 * eyeD
        eye3 = jnp.eye(3, dtype=dtype)
        # split damping (round-5 f32 work, same as solve/inertial_ba.py):
        # landmark blocks keep the 1e-3 flat-direction floor, the 15-dim
        # state system uses the raw lambda so the stiff inertial chain
        # converges at LM rate
        lam_ll = jnp.maximum(lam, 1e-3)
        Hll_d = Hll + lam_ll * (eye3 * jnp.diagonal(
            Hll, axis1=-2, axis2=-1)[..., None, :]) + 1e-9 * eye3
        Hll_inv = _inv3x3(Hll_d)
        Wo = jnp.einsum("oij,oik->ojk", Jp_w, Jl)
        # reduced rhs: subtract A_o bl on the pose dims
        Ao = Wo @ Hll_inv[obs_pt]
        b_red = b15.at[:, :6].add(-psum(
            jnp.zeros((K, 6), dtype).at[obs_kf].add(
                jnp.einsum("oij,oj->oi", Ao, bl[obs_pt]))))
        # fixed KFs freeze the pose dims only (ref FullInertialBA fixes
        # VertexPose, Optimizer.cc:446-476)
        free = jnp.ones((K, D), bool).at[:, :6].set(~fixed[:, None])
        dx = pcg_solve_vi(
            b_red, Hdiag_d, Hoff, edges_a, edges_b, Hll_inv, Wo,
            obs_kf, obs_pt, free, n_iters=cg_iters, psum=psum)
        WtDx = psum(jnp.zeros((P, 3), dtype).at[obs_pt].add(
            jnp.einsum("oij,oi->oj", Wo, dx[obs_kf, :6])))
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - WtDx)
        Rn = Rwb @ so3_exp(dx[:, 3:6])
        pn = p + jnp.einsum("kij,kj->ki", Rwb, dx[:, 0:3])
        vn = v + dx[:, 6:9]
        bgn = bg + dx[:, 9:12]
        ban = ba + dx[:, 12:15]
        Xn = X + dx_pt
        # post-step cost in the SAME program (in-step acceptance)
        _, _, _, _, cost_v1 = _reproj_parts(
            Rn, pn, Xn, obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
            fx, fy, cx, cy, bf, robust, Rcb, tcb, cam)
        ri1 = _edge_res(
            jnp.zeros(15, dtype), jnp.zeros(15, dtype),
            Rn[edges_a], pn[edges_a], vn[edges_a], bgn[edges_a],
            ban[edges_a], Rn[edges_b], pn[edges_b], vn[edges_b],
            bg0[edges_a], ba0[edges_a], pre_stack)
        # cost_v from _reproj_parts is the robust per-obs cost; recompute
        # the full post cost with the same term structure as cost0
        dbg1 = bgn[edges_b] - bgn[edges_a]
        dba1 = ban[edges_b] - ban[edges_a]
        cost1 = psum(jnp.sum(cost_v1)) + jnp.sum(
            jnp.einsum("ei,eij,ej->e", ri1, info9, ri1)) + jnp.sum(
            rw_g[:, None] * dbg1 ** 2) + jnp.sum(rw_a[:, None] * dba1 ** 2)
        if prior_g > 0:
            cost1 = cost1 + prior_g * jnp.sum(bgn ** 2)
        if prior_a > 0:
            cost1 = cost1 + prior_a * jnp.sum(ban ** 2)
        return Rn, pn, vn, bgn, ban, Xn, cost0, cost1

    spec_rep = P()
    spec_obs = P("obs")
    return shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec_rep,) * 16 + (spec_obs,) * 6,
        out_specs=(spec_rep,) * 8,
    )


def dist_viba_solve(mesh, Rwb, p, v, bg, ba, X,
                    obs_kf, obs_pt, uvr, inv_sigma2, stereo, valid,
                    edges_a, edges_b, pre_stack, info9, bg0, ba0,
                    rw_g, rw_a, fixed,
                    fx, fy, cx, cy, bf, Rcb, tcb,
                    prior_g=0.0, prior_a=0.0, n_iters=10, robust=True,
                    cam=PINHOLE, cg_iters: int = 150):
    """Host-orchestrated LM loop over the sharded VI trial step (the
    distributed FullInertialBA). Inputs numpy (pre_stack a dict of [E,..]
    arrays); returns (Rwb, p, v, bg, ba, X, cost). cg_iters is generous:
    each CG iteration costs one psum[P,3]+psum[K,15] (~KBs) against the
    O(O) local reduction, and the VI valley needs tight solves (see
    pcg_solve_vi)."""
    n_shards = mesh.devices.size
    shards, per = shard_observations(obs_pt, n_shards)
    okf = jnp.asarray(pack_sharded(np.asarray(obs_kf, np.int32), shards, per, 0))
    opt = jnp.asarray(pack_sharded(np.asarray(obs_pt, np.int32), shards, per, 0))
    uvr_p = jnp.asarray(pack_sharded(np.asarray(uvr), shards, per, 0.0))
    is2 = jnp.asarray(pack_sharded(np.asarray(inv_sigma2), shards, per, 0.0))
    st = jnp.asarray(pack_sharded(np.asarray(stereo, bool), shards, per, False))
    vl = jnp.asarray(pack_sharded(np.asarray(valid, bool), shards, per, False))

    step = jax.jit(make_dist_viba_step(
        mesh, fx, fy, cx, cy, bf, jnp.asarray(Rcb), jnp.asarray(tcb),
        prior_g=float(prior_g), prior_a=float(prior_a), robust=robust,
        cam=cam, cg_iters=cg_iters))
    state = [jnp.asarray(np.asarray(x)) for x in (Rwb, p, v, bg, ba, X)]
    rep = [jnp.asarray(np.asarray(x)) for x in
           (edges_a, edges_b)] + [
        jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), dict(pre_stack)),
        jnp.asarray(np.asarray(info9)), jnp.asarray(np.asarray(bg0)),
        jnp.asarray(np.asarray(ba0)), jnp.asarray(np.asarray(rw_g)),
        jnp.asarray(np.asarray(rw_a))]
    fixedj = jnp.asarray(np.asarray(fixed, bool))
    lam = 1e-4
    cost = None
    n_acc = 0
    n_tot = 0
    dtype = state[5].dtype
    while n_acc < n_iters and n_tot < 3 * n_iters:
        out = step(*state, fixedj, jnp.asarray(lam, dtype), *rep,
                   okf, opt, uvr_p, is2, st, vl)
        c0f, c1f = float(out[6]), float(out[7])
        cost = c0f if cost is None else cost
        n_tot += 1
        if c1f < c0f:
            state = list(out[:6])
            # VI floor is LOWER than the visual-only 1e-3: the inertial
            # chain + RW/prior edges pin the directions that visual BA
            # leaves flat, and recovery to mm-level needs the damping to
            # decay (matches vi_ba_solve's schedule). No early-stall
            # break: near the optimum the weakly-observable scale/bias
            # valley descends in tiny steps that still move the poses
            # (vi_ba_solve runs its full scan too).
            lam = max(lam * 0.5, 1e-9)
            cost = c1f
            n_acc += 1
        else:
            lam = min(lam * 4.0, 1e6)
    return tuple(np.asarray(x) for x in state) + (cost,)


def shard_observations(obs_pt, n_shards, pad_multiple=256):
    """Round-robin observation sharding with padding.

    The matrix-free Schur solve psums landmark partials, so observations
    of one landmark MAY span shards — no landmark alignment needed.
    Plain strided round-robin balances load exactly. Returns
    (shards: list[list[int]], per: padded per-shard length)."""
    O = len(np.asarray(obs_pt))
    shards = [list(range(s, O, n_shards)) for s in range(n_shards)]
    per = int(np.ceil(max(max(len(s) for s in shards), 1)
                      / pad_multiple)) * pad_multiple
    return shards, per


def pack_sharded(arr, shards, per, fill):
    """[O,...] -> [n_shards*per, ...] padded per-shard layout."""
    arr = np.asarray(arr)
    out = np.full((len(shards), per) + arr.shape[1:], fill, arr.dtype)
    for s, idx in enumerate(shards):
        out[s, : len(idx)] = arr[idx]
    return out.reshape((len(shards) * per,) + arr.shape[1:])


def dist_ba_solve(mesh, R, t, X, obs_kf, obs_pt, uvr, inv_sigma2, stereo,
                  valid, fixed, fx, fy, cx, cy, bf, n_iters=10, robust=True,
                  cam=PINHOLE, cg_iters: int = 30):
    """Host-orchestrated LM loop over the sharded trial step.

    Inputs numpy; returns (R, t, X, cost). One 'iteration' = one accepted
    step (g2o semantics) with a 3x trial cap, acceptance evaluated on the
    CURRENT trial's post-step cost."""
    n_shards = mesh.devices.size
    shards, per = shard_observations(obs_pt, n_shards)

    okf = jnp.asarray(pack_sharded(np.asarray(obs_kf, np.int32), shards, per, 0))
    opt = jnp.asarray(pack_sharded(np.asarray(obs_pt, np.int32), shards, per, 0))
    uvr_p = jnp.asarray(pack_sharded(np.asarray(uvr), shards, per, 0.0))
    is2 = jnp.asarray(pack_sharded(np.asarray(inv_sigma2), shards, per, 0.0))
    st = jnp.asarray(pack_sharded(np.asarray(stereo, bool), shards, per, False))
    vl = jnp.asarray(pack_sharded(np.asarray(valid, bool), shards, per, False))

    step = jax.jit(make_dist_ba_step(mesh, fx, fy, cx, cy, bf, robust,
                                     cam, cg_iters))
    Rj = jnp.asarray(R)
    tj = jnp.asarray(t)
    Xj = jnp.asarray(X)
    fixedj = jnp.asarray(fixed)
    lam = 1e-4
    cost = None
    n_acc = 0
    n_tot = 0
    while n_acc < n_iters and n_tot < 3 * n_iters:
        R2, t2, X2, c0, c1 = step(
            Rj, tj, Xj, fixedj, jnp.asarray(lam, Xj.dtype),
            okf, opt, uvr_p, is2, st, vl,
        )
        c0f, c1f = float(c0), float(c1)
        cost = c0f if cost is None else cost
        n_tot += 1
        if c1f < c0f:  # in-step acceptance on the CURRENT trial
            Rj, tj, Xj = R2, t2, X2
            # same flat-direction floor as ba.py's LM loop (lambda is the
            # only thing pinning low-parallax landmark depths)
            lam = max(lam * 0.5, 1e-3)
            cost = c1f
            n_acc += 1
            if (c0f - c1f) < 1e-8 * max(c0f, 1e-20):
                break
        else:
            lam = min(lam * 4.0, 1e6)
    return np.asarray(Rj), np.asarray(tj), np.asarray(Xj), cost
