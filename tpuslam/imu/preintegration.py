"""On-manifold IMU preintegration (Forster et al.) as a lax.scan.

Replaces the reference's IMU::Preintegrated (src/ImuTypes.cc:255
IntegrateNewMeasurement): delta rotation/velocity/position, first-order
bias Jacobians (JRg, JVg, JVa, JPg, JPa), 15x15 covariance propagation
(9 preintegration states + 6 bias random walk), bias-update correction
(GetDeltaRotation/Velocity/Position with first-order update,
ImuTypes.h:216-233), and IMU state prediction (Tracking::PredictStateIMU,
src/Tracking.cc:669).

Measurements are integrated with the same midpoint handling as the
reference driver (Tracking::PreintegrateIMU :552 splits boundary samples) —
the caller prepares per-step (w, a, dt); this module is the pure kernel.
Fixed-capacity: pad with dt=0 rows (identity updates).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core.lie import so3_exp, so3_log, so3_right_jacobian, hat

GRAVITY = 9.81  # ref: ImuTypes.h:40 GRAVITY_VALUE


@dataclass
class ImuCalib:
    """Noise densities (continuous) and extrinsics (ref: IMU::Calib)."""

    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    freq: float = 200.0
    Tbc: np.ndarray | None = None  # body<-camera 4x4 (None = identity)

    # --- camera<->body extrinsic pieces (X_b = Rbc X_c + tbc; the YAML/ref
    # `Tbc` is the camera-to-body transform, IMU::Calib ImuTypes.h:87)
    @property
    def Rbc(self) -> np.ndarray:
        return np.eye(3) if self.Tbc is None else np.asarray(
            self.Tbc[:3, :3], np.float64)

    @property
    def tbc(self) -> np.ndarray:
        return np.zeros(3) if self.Tbc is None else np.asarray(
            self.Tbc[:3, 3], np.float64)

    @property
    def Rcb(self) -> np.ndarray:
        """X_c = Rcb X_b + tcb."""
        return self.Rbc.T

    @property
    def tcb(self) -> np.ndarray:
        return -self.Rbc.T @ self.tbc

    def body_from_cam(self, Rcw, tcw):
        """Camera pose Tcw -> body state (Rwb, p_wb): Twb = Twc o Tcb
        (ref KeyFrame::GetImuRotation/GetImuPosition)."""
        Rwc = np.asarray(Rcw).T
        Ow = -Rwc @ np.asarray(tcw)
        return Rwc @ self.Rcb, Rwc @ self.tcb + Ow

    def cam_from_body(self, Rwb, p):
        """Body state -> camera pose Tcw: Twc = Twb o Tbc."""
        Rwc = np.asarray(Rwb) @ self.Rbc
        Ow = np.asarray(Rwb) @ self.tbc + np.asarray(p)
        return Rwc.T, -Rwc.T @ Ow

    def discrete_cov(self):
        f = self.freq
        ng2 = self.noise_gyro ** 2 * f
        na2 = self.noise_acc ** 2 * f
        wg2 = self.walk_gyro ** 2 * f
        wa2 = self.walk_acc ** 2 * f
        return ng2, na2, wg2, wa2


@jax.jit
def preintegrate(w, a, dt, bg, ba, ng2, na2, wg2, wa2):
    """Integrate gyro w [N,3], accel a [N,3], steps dt [N] (0 = padding)
    from biases bg, ba [3]. Noise params are DISCRETE variances.

    Returns dict: dR [3,3], dV [3], dP [3], JRg, JVg, JVa, JPg, JPa [3,3],
    C [15,15], dT (total time).
    """
    dtype = w.dtype
    eye = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, dT = carry
        wi, ai, dti = inp
        valid = dti > 0
        acc = ai - ba
        gyr = wi - bg
        # position/velocity use the PRE-update rotation (ref :255 order)
        dP_n = dP + dV * dti + 0.5 * (dR @ acc) * dti * dti
        dV_n = dV + (dR @ acc) * dti
        # covariance pieces before rotation update
        Wacc = hat(acc)
        dRi = so3_exp(gyr * dti)
        Jr = so3_right_jacobian(gyr * dti)
        # A (9x9), B (9x6) like ImuTypes.cc:269-290
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ Wacc * dti)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ Wacc * dti * dti)
        A = A.at[3:6, 3:6].set(eye)
        A = A.at[6:9, 3:6].set(eye * dti)
        A = A.at[6:9, 6:9].set(eye)
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * dti)
        B = B.at[3:6, 3:6].set(dR * dti)
        B = B.at[6:9, 3:6].set(0.5 * dR * dti * dti)
        Nga = jnp.diag(jnp.concatenate([jnp.full(3, ng2), jnp.full(3, na2)])).astype(dtype)
        C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        C_n = C.at[:9, :9].set(C9)
        C_n = C_n.at[9:12, 9:12].add(eye * wg2 * dti)
        C_n = C_n.at[12:15, 12:15].add(eye * wa2 * dti)
        # bias jacobians (ref :296-301; order matters: JP before JV, both
        # using pre-update JV/JR)
        JPa_n = JPa + JVa * dti - 0.5 * dR * dti * dti
        JPg_n = JPg + JVg * dti - 0.5 * dR @ Wacc @ JRg * dti * dti
        JVa_n = JVa - dR * dti
        JVg_n = JVg - dR @ Wacc @ JRg * dti
        JRg_n = dRi.T @ JRg - Jr * dti
        dR_n = dR @ dRi
        out = (
            jnp.where(valid, dR_n, dR),
            jnp.where(valid, dV_n, dV),
            jnp.where(valid, dP_n, dP),
            jnp.where(valid, JRg_n, JRg),
            jnp.where(valid, JVg_n, JVg),
            jnp.where(valid, JVa_n, JVa),
            jnp.where(valid, JPg_n, JPg),
            jnp.where(valid, JPa_n, JPa),
            jnp.where(valid, C_n, C),
            dT + jnp.where(valid, dti, 0.0),
        )
        return out, None

    zero3 = jnp.zeros((3, 3), dtype)
    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            zero3, zero3, zero3, zero3, zero3,
            jnp.zeros((15, 15), dtype), jnp.zeros((), dtype))
    (dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, dT), _ = jax.lax.scan(
        step, init, (w, a, dt)
    )
    return dict(dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg,
                JPa=JPa, C=C, dT=dT)


def corrected_delta(pre, dbg, dba):
    """First-order bias-corrected deltas (ref: GetDeltaRotation/Velocity/
    Position, ImuTypes.h:216-233)."""
    dR = pre["dR"] @ so3_exp(pre["JRg"] @ dbg)
    dV = pre["dV"] + pre["JVg"] @ dbg + pre["JVa"] @ dba
    dP = pre["dP"] + pre["JPg"] @ dbg + pre["JPa"] @ dba
    return dR, dV, dP


def predict_state(Rwb, p, v, pre, dbg=None, dba=None):
    """IMU-only state propagation over the preintegration interval
    (ref: Tracking::PredictStateIMU Tracking.cc:669). Gravity is
    (0,0,-G) in world."""
    dtype = pre["dV"].dtype
    g = jnp.asarray(np.array([0.0, 0.0, -GRAVITY]), dtype)
    dT = pre["dT"]
    if dbg is None:
        dR, dV, dP = pre["dR"], pre["dV"], pre["dP"]
    else:
        dR, dV, dP = corrected_delta(pre, dbg, dba)
    Rwb2 = Rwb @ dR
    v2 = v + g * dT + Rwb @ dV
    p2 = p + v * dT + 0.5 * g * dT * dT + Rwb @ dP
    return Rwb2, p2, v2


def inertial_residual(Rwb1, p1, v1, Rwb2, p2, v2, bg, ba, bg0, ba0, pre):
    """9-dim preintegration residual (ref: EdgeInertial G2oTypes.h:492).

    (bg0, ba0) are the biases the preintegration was run at; (bg, ba) the
    current estimates — first-order corrected.
    """
    dtype = pre["dV"].dtype
    g = jnp.asarray(np.array([0.0, 0.0, -GRAVITY]), dtype)
    dT = pre["dT"]
    dR, dV, dP = corrected_delta(pre, bg - bg0, ba - ba0)
    er = so3_log(dR.T @ Rwb1.T @ Rwb2)
    ev = Rwb1.T @ (v2 - v1 - g * dT) - dV
    ep = Rwb1.T @ (p2 - p1 - v1 * dT - 0.5 * g * dT * dT) - dP
    return jnp.concatenate([er, ev, ep])


def information_from_cov(C9, eps=None):
    """Information matrix of the 9-dim residual (ref: GetInformationMatrix
    — inverse of the preintegration covariance, symmetrized).

    f32-robust: the 9x9 covariance mixes rotation (~ng2*dT ~ 1e-7) and
    position (~na2*dT^3 ~ 1e-11) scales, conditioning the raw inverse at
    ~1e5-1e9 — a symmetric Jacobi scaling brings it to the physical
    correlation structure (cond ~ 1e1-1e2) before inverting, and the
    regularizer is RELATIVE to each diagonal (an absolute 1e-8 floor
    dominated short-window position covariances and silently deflated
    their information)."""
    dtype = C9.dtype
    if eps is None:
        eps = 1e-6 if dtype in (jnp.float32, jnp.bfloat16) else 1e-12
    Cs = 0.5 * (C9 + C9.T)
    d = jnp.diagonal(Cs)
    good = (d > 0) & jnp.isfinite(d)
    s = jnp.where(good, jax.lax.rsqrt(jnp.where(good, d, 1.0)), 1.0)
    Cn = Cs * s[:, None] * s[None, :] + eps * jnp.eye(9, dtype=dtype)
    In = jnp.linalg.inv(Cn)
    In = 0.5 * (In + In.T)
    return In * s[:, None] * s[None, :]


def merge_preintegrations(pre1, pre2):
    """Concatenate two preintegrations (ref: MergePrevious ImuTypes.cc:312).
    Assumes both were integrated at the same bias."""
    dR1, dV1, dP1 = pre1["dR"], pre1["dV"], pre1["dP"]
    dT1 = pre1["dT"]
    out = dict(
        dR=dR1 @ pre2["dR"],
        dV=dV1 + dR1 @ pre2["dV"],
        dP=dP1 + dV1 * pre2["dT"] + dR1 @ pre2["dP"],
        JRg=pre2["dR"].T @ pre1["JRg"] + pre2["JRg"],
        JVg=pre1["JVg"] + dR1 @ pre2["JVg"],  # approximate merge
        JVa=pre1["JVa"] + dR1 @ pre2["JVa"],
        JPg=pre1["JPg"] + pre1["JVg"] * pre2["dT"] + dR1 @ pre2["JPg"],
        JPa=pre1["JPa"] + pre1["JVa"] * pre2["dT"] + dR1 @ pre2["JPa"],
        C=pre1["C"] + pre2["C"],  # upper bound; exact prop needs re-run
        dT=dT1 + pre2["dT"],
    )
    return out
