"""Synthetic rendered sequences with exact ground truth.

Since no EuRoC/TUM data ships in this environment, the end-to-end gates run
on a ray-cast "textured room": the camera flies a smooth C^2 trajectory
inside a box whose five visible faces carry smooth procedural textures.
Rendering is exact perspective projection with bilinear texture sampling, so
the SLAM pipeline sees realistic parallax, occlusion boundaries at plane
seams, and trackable gradients — with analytically known poses, depths, and
IMU measurements (accelerometer/gyro from the trajectory's closed-form
derivatives).

Replaces the reference's dataset drivers for testing purposes
(ref: src/main.cpp:19-54 CSV loader, Examples/*_euroc.cc loaders).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import lie
import jax.numpy as jnp

GRAVITY = 9.81


def _smooth_texture(rng, n=512, octaves=5):
    """Multi-octave value noise + distinct landmark marks, in [0,255].

    Pure value noise is self-similar: every patch looks like every other
    patch, so BRIEF descriptors are weakly distinctive and the matchers'
    ratio tests (ref ORBmatcher mfNNratio) starve. Real indoor scenes —
    the reference's target domain — carry distinct structure (posters,
    outlets, furniture edges), so the synthetic world gets the same:
    high-contrast rectangles, discs and line segments scattered over the
    noise base, each with its own intensity. This makes descriptors
    locally unique without changing the renderer.
    """
    tex = np.zeros((n, n))
    for o in range(octaves):
        k = 8 << o
        coarse = rng.rand(k, k)
        # bilinear upsample to n x n
        yi = np.linspace(0, k - 1, n)
        xi = np.linspace(0, k - 1, n)
        y0 = np.clip(yi.astype(int), 0, k - 2)
        x0 = np.clip(xi.astype(int), 0, k - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        c = (
            coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
            + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
            + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx
        )
        tex += c / (1 << o)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    # distinct landmark marks: rectangles, discs, line segments
    yy, xx = np.mgrid[0:n, 0:n]
    for _ in range(40):
        shape = rng.randint(3)
        cy_, cx_ = rng.randint(0, n, 2)
        val = rng.uniform(0.0, 1.0)
        alpha = rng.uniform(0.55, 0.95)
        if shape == 0:  # axis-aligned rectangle (poster/panel)
            hh, ww_ = rng.randint(6, 40, 2)
            m = (np.abs(yy - cy_) < hh) & (np.abs(xx - cx_) < ww_)
        elif shape == 1:  # disc
            rad = rng.randint(4, 24)
            m = (yy - cy_) ** 2 + (xx - cx_) ** 2 < rad * rad
        else:  # thick line segment
            ang = rng.uniform(0, np.pi)
            length = rng.randint(20, 90)
            thick = rng.randint(2, 5)
            d_par = (xx - cx_) * np.cos(ang) + (yy - cy_) * np.sin(ang)
            d_perp = -(xx - cx_) * np.sin(ang) + (yy - cy_) * np.cos(ang)
            m = (np.abs(d_par) < length) & (np.abs(d_perp) < thick)
        tex = np.where(m, (1 - alpha) * tex + alpha * val, tex)
    return (tex * 255.0).astype(np.float32)


@dataclasses.dataclass
class Plane:
    origin: np.ndarray  # a point on the plane
    normal: np.ndarray  # unit, pointing into the room
    u_axis: np.ndarray  # texture axes
    v_axis: np.ndarray
    extent_u: float
    extent_v: float
    texture: np.ndarray


def make_room(rng, size=(10.0, 6.0, 4.0)):
    """Box interior [0,sx]x[0,sy]x[0,sz]; camera flies inside looking +x."""
    sx, sy, sz = size
    planes = []

    def plane(origin, normal, ua, va, eu, ev):
        planes.append(
            Plane(
                np.array(origin, np.float64),
                np.array(normal, np.float64),
                np.array(ua, np.float64),
                np.array(va, np.float64),
                eu,
                ev,
                _smooth_texture(rng),
            )
        )

    plane([sx, 0, 0], [-1, 0, 0], [0, 1, 0], [0, 0, 1], sy, sz)  # far wall
    plane([0, 0, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1], sx, sz)    # left wall
    plane([0, sy, 0], [0, -1, 0], [1, 0, 0], [0, 0, 1], sx, sz)  # right wall
    plane([0, 0, 0], [0, 0, 1], [1, 0, 0], [0, 1, 0], sx, sy)    # floor
    plane([0, 0, sz], [0, 0, -1], [1, 0, 0], [0, 1, 0], sx, sy)  # ceiling
    return planes


class Trajectory:
    """Smooth C^inf trajectory with closed-form derivatives.

    World frame: x forward, y left-ish, z up. Camera frame: z forward
    (optical axis), x right, y down — R_wc maps camera->world.
    """

    def __init__(self, kind="forward_arc", speed=0.5, room=(10.0, 6.0, 4.0)):
        self.kind = kind
        self.speed = speed
        self.room = room

    @property
    def _loop_params(self):
        sx, sy, sz = self.room
        r = 1.6
        w = self.speed / r
        return np.array([sx / 2, sy / 2]), r, w

    def pos(self, t):
        t = np.asarray(t, np.float64)
        sx, sy, sz = self.room
        if self.kind == "loop":
            c, r, w = self._loop_params
            x = c[0] + r * np.cos(w * t)
            y = c[1] + r * np.sin(w * t)
            z = sz / 2 + 0.1 * np.sin(0.3 * t)
            return np.stack([x, y, np.broadcast_to(z, np.shape(x))], -1)
        # vi_excite: ~0.7 m/s^2 peak accelerometer excitation, LATERAL.
        # Mono-VI scale observability needs accel * dT^2 well above the
        # visual pose noise over a KF interval — the old 0.35*sin(0.8t)
        # wobble peaked at 0.22 m/s^2, leaving scale SNR < 1 per edge on
        # short windows (round-5 init analysis; EuRoC MAV motion is
        # ~1 m/s^2). The wobble lives on Y (lateral), NOT the forward
        # axis: forward surge periodically cancels the net translation
        # and starves mono parallax (measured: x-axis wobble at matched
        # amplitude drove 7x scale inconsistency across map regions —
        # the same degeneracy the oblique-viewing note below describes).
        wob = 0.18 * np.sin(1.5 * t) if self.kind == "vi_excite" else 0.0
        x = 1.0 + self.speed * t
        y = sy / 2 + 0.6 * np.sin(0.4 * t) + wob
        z = sz / 2 + 0.3 * np.sin(0.3 * t + 1.0)
        return np.stack([x, y, z], -1)

    def vel(self, t):
        t = np.asarray(t, np.float64)
        z = np.zeros_like(t)
        if self.kind == "loop":
            c, r, w = self._loop_params
            return np.stack([
                -r * w * np.sin(w * t), r * w * np.cos(w * t),
                0.1 * 0.3 * np.cos(0.3 * t)], -1)
        dwob = 0.18 * 1.5 * np.cos(1.5 * t) if self.kind == "vi_excite" else z
        return np.stack(
            [self.speed + z,
             0.6 * 0.4 * np.cos(0.4 * t) + dwob,
             0.3 * 0.3 * np.cos(0.3 * t + 1.0)],
            -1,
        )

    def acc(self, t):
        t = np.asarray(t, np.float64)
        z = np.zeros_like(t)
        if self.kind == "loop":
            c, r, w = self._loop_params
            return np.stack([
                -r * w * w * np.cos(w * t), -r * w * w * np.sin(w * t),
                -0.1 * 0.09 * np.sin(0.3 * t)], -1)
        awob = -0.18 * 2.25 * np.sin(1.5 * t) if self.kind == "vi_excite" else z
        return np.stack(
            [z, -0.6 * 0.16 * np.sin(0.4 * t) + awob,
             -0.3 * 0.09 * np.sin(0.3 * t + 1.0)], -1
        )

    def yaw_pitch(self, t):
        t = np.asarray(t, np.float64)
        if self.kind == "loop":
            c, r, w = self._loop_params
            # look along the tangent of the circle
            return w * t + np.pi / 2, 0.03 * np.sin(0.2 * t)
        # constant oblique viewing direction (~26 deg off the direction of
        # travel) + wobble: pure forward-creep viewing gives near-zero
        # parallax on most of the image (depth errors 50-200% at half-pixel
        # noise), which no amount of solver quality can fix — mono SLAM is
        # then scale-unstable by geometry. The reference's benchmark
        # sequences (EuRoC machine hall) likewise carry rich view-oblique
        # motion.
        yaw = 0.45 + 0.08 * np.sin(0.25 * t)
        pitch = 0.05 * np.sin(0.2 * t + 0.5)
        return yaw, pitch

    def yaw_pitch_rates(self, t):
        t = np.asarray(t, np.float64)
        if self.kind == "loop":
            c, r, w = self._loop_params
            return w + np.zeros_like(t), 0.03 * 0.2 * np.cos(0.2 * t)
        dyaw = 0.08 * 0.25 * np.cos(0.25 * t)
        dpitch = 0.05 * 0.2 * np.cos(0.2 * t + 0.5)
        return dyaw, dpitch

    def R_wc(self, t):
        """camera->world. Base orientation: optical axis +x(world), camera
        x right = -y(world), camera y down = -z(world)."""
        yaw, pitch = self.yaw_pitch(t)
        base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
        # yaw about world z, pitch about world y
        cz, sz_ = np.cos(yaw), np.sin(yaw)
        cy, sy_ = np.cos(pitch), np.sin(pitch)
        Rz = np.array([[cz, -sz_, 0], [sz_, cz, 0], [0, 0, 1]])
        Ry = np.array([[cy, 0, sy_], [0, 1, 0], [-sy_, 0, cy]])
        return Rz @ Ry @ base

    def omega_world(self, t):
        dyaw, dpitch = self.yaw_pitch_rates(t)
        yaw, _ = self.yaw_pitch(t)
        # omega = dyaw * ez + dpitch * (Rz ey)
        ez = np.array([0.0, 0.0, 1.0])
        ey = np.array([0.0, 1.0, 0.0])
        cz, sz_ = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[cz, -sz_, 0], [sz_, cz, 0], [0, 0, 1]])
        return dyaw * ez + dpitch * (Rz @ ey)

    def pose_cw(self, t):
        """Tcw (world->camera) as (R, t)."""
        Rwc = self.R_wc(t)
        p = self.pos(t)
        Rcw = Rwc.T
        return Rcw, -Rcw @ p


def render(planes, Rcw, tcw, height, width, fx, fy, cx, cy, camera=None,
           return_depth=False):
    """Exact ray-cast of the textured room -> [H,W] f32 image.

    camera=None: perspective (pinhole) rays from fx/fy/cx/cy. Otherwise
    any CameraModel (e.g. KannalaBrandt8): rays from camera.unproject on
    the pixel grid — exact fisheye rendering.
    return_depth: also return the exact per-pixel camera-frame z (the
    ray parameter t equals z for z-normalized rays; 0 = no hit) — serves
    the RGB-D path like a depth sensor would (ref: rgbd_tum driver)."""
    ys, xs = np.mgrid[0:height, 0:width]
    if camera is not None:
        uv = np.stack([xs, ys], -1).astype(np.float64).reshape(-1, 2)
        rays_c = np.asarray(
            camera.unproject(jnp.asarray(uv))).reshape(height, width, 3)
    else:
        rays_c = np.stack(
            [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, np.float64)], -1
        )
    Rwc = Rcw.T
    origin = -Rwc @ tcw
    rays_w = rays_c @ Rwc.T  # [H,W,3]
    best_t = np.full((height, width), np.inf)
    img = np.zeros((height, width), np.float32)
    for pl in planes:
        denom = rays_w @ pl.normal
        num = (pl.origin - origin) @ pl.normal
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / denom
        t = np.nan_to_num(t, nan=-1.0, posinf=-1.0, neginf=-1.0)
        hit = (t > 0.05) & (t < best_t) & (np.abs(denom) > 1e-9)
        if not hit.any():
            continue
        P = origin[None, None] + rays_w * t[..., None]
        du = np.nan_to_num((P - pl.origin) @ pl.u_axis)
        dv = np.nan_to_num((P - pl.origin) @ pl.v_axis)
        inside = hit & (du >= 0) & (du <= pl.extent_u) & (dv >= 0) & (dv <= pl.extent_v)
        if not inside.any():
            continue
        n = pl.texture.shape[0]
        tu = np.clip(du / pl.extent_u * (n - 1), 0, n - 1.001)
        tv = np.clip(dv / pl.extent_v * (n - 1), 0, n - 1.001)
        u0 = tu.astype(int)
        v0 = tv.astype(int)
        fu = tu - u0
        fv = tv - v0
        tex = pl.texture
        val = (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, np.minimum(u0 + 1, n - 1)] * fu * (1 - fv)
            + tex[np.minimum(v0 + 1, n - 1), u0] * (1 - fu) * fv
            + tex[np.minimum(v0 + 1, n - 1), np.minimum(u0 + 1, n - 1)] * fu * fv
        )
        img = np.where(inside, val, img)
        best_t = np.where(inside, t, best_t)
    if return_depth:
        # rays are z-normalized (rays_c[...,2] == 1 for pinhole), so the
        # hit parameter IS the camera-frame depth; no-hit pixels -> 0
        z = best_t * rays_c[..., 2]
        z = np.where(np.isfinite(best_t), z, 0.0).astype(np.float32)
        return img, z
    return img


class SyntheticSequence:
    """Mono(+stereo) sequence generator with GT poses and IMU."""

    def __init__(
        self,
        seed=0,
        height=240,
        width=376,
        fx=200.0,
        fy=200.0,
        cx=None,
        cy=None,
        fps=10.0,
        n_frames=40,
        speed=0.5,
        baseline=0.1,
        imu_rate=200.0,
        kind="forward_arc",
        camera=None,
        camera2=None,
        Trl=None,
    ):
        """camera/camera2: optional CameraModel pair for non-pinhole
        (fisheye) rendering; Trl [4x4] right-from-left rig extrinsic
        (defaults to a pure x-baseline like the pinhole path)."""
        rng = np.random.RandomState(seed)
        self.planes = make_room(rng)
        self.traj = Trajectory(kind=kind, speed=speed)
        self.height, self.width = height, width
        self.camera = camera
        self.camera2 = camera2
        if camera is not None:
            fx, fy = camera.fx, camera.fy
            cx, cy = camera.cx, camera.cy
            self.height, self.width = camera.height, camera.width
        self.fx, self.fy = fx, fy
        self.cx = cx if cx is not None else width / 2.0
        self.cy = cy if cy is not None else height / 2.0
        self.fps = fps
        self.n_frames = n_frames
        self.baseline = baseline
        self.imu_rate = imu_rate
        if Trl is None:
            Trl = np.eye(4)
            Trl[:3, 3] = [-baseline, 0.0, 0.0]
        self.Trl = np.asarray(Trl, np.float64)
        # optional on-disk render cache (TPUSLAM_RENDER_CACHE=dir): the
        # renderer is the dominant cost of the e2e test tier and most
        # modules re-render identical sequences — frames are memoized by
        # a hash of every render-relevant parameter (VERDICT r4 weak #6)
        import hashlib
        import os as _os
        self._cache_dir = _os.environ.get("TPUSLAM_RENDER_CACHE")
        if self._cache_dir:
            cam_sig = ""
            for c in (camera, camera2):
                if c is not None:
                    cam_sig += type(c).__name__ + repr(
                        tuple(map(float, getattr(c, "full_params",
                                                 getattr(c, "params", ())))))
            key = repr((seed, kind, speed, float(fps), self.height,
                        self.width, float(self.fx), float(self.fy),
                        float(self.cx), float(self.cy), float(baseline),
                        cam_sig, self.Trl.tobytes()))
            self._cache_key = hashlib.sha1(key.encode()).hexdigest()[:16]
            _os.makedirs(self._cache_dir, exist_ok=True)

    def _cached(self, name, producer):
        """Atomic on-disk memoization (xdist-race-safe: write to a
        unique tmp file, rename into place)."""
        import os as _os
        import tempfile
        if not self._cache_dir:
            return producer()
        path = _os.path.join(self._cache_dir,
                             f"{self._cache_key}_{name}.npz")
        if _os.path.exists(path):
            try:
                with np.load(path) as z:
                    arrs = [z[k] for k in sorted(z.files)]
                return arrs[0] if len(arrs) == 1 else tuple(arrs)
            except Exception:
                pass  # corrupt/partial: fall through and rewrite
        out = producer()
        arrs = out if isinstance(out, tuple) else (out,)
        fd, tmp = tempfile.mkstemp(dir=self._cache_dir, suffix=".npz")
        _os.close(fd)
        np.savez(tmp, **{f"a{i}": a for i, a in enumerate(arrs)})
        _os.replace(tmp, path)
        return out

    def timestamps(self):
        return np.arange(self.n_frames) / self.fps

    def gt_pose_cw(self, t):
        return self.traj.pose_cw(t)

    def frame(self, i, right=False):
        def produce():
            t = i / self.fps
            Rcw, tcw = self.traj.pose_cw(t)
            cam = self.camera
            if right:
                # right camera: Tc2w = Trl * Tcw
                R_rl, t_rl = self.Trl[:3, :3], self.Trl[:3, 3]
                Rcw2 = R_rl @ Rcw
                tcw2 = R_rl @ tcw + t_rl
                cam = self.camera2 if self.camera2 is not None \
                    else self.camera
                return render(
                    self.planes, Rcw2, tcw2, self.height, self.width,
                    self.fx, self.fy, self.cx, self.cy, camera=cam,
                )
            return render(
                self.planes, Rcw, tcw, self.height, self.width,
                self.fx, self.fy, self.cx, self.cy, camera=cam,
            )

        return self._cached(f"f{i}_{int(right)}", produce)

    def frame_rgbd(self, i):
        """(image, depth) pair for the RGB-D path — depth is the exact
        per-pixel camera z (like a perfect depth sensor)."""
        def produce():
            t = i / self.fps
            Rcw, tcw = self.traj.pose_cw(t)
            return render(
                self.planes, Rcw, tcw, self.height, self.width,
                self.fx, self.fy, self.cx, self.cy, camera=self.camera,
                return_depth=True,
            )

        return self._cached(f"d{i}", produce)

    def imu_between(self, t0, t1):
        """Perfect IMU samples in (t0, t1]: (t, gyro_body [3], acc_body [3]).

        acc measures specific force: a_body = R_cw (a_world + g_up) where
        gravity vector is -9.81 z_world (so accelerometer at rest reads +g
        up). Body frame == camera frame (Tbc = I) for synthetic data.
        """
        dt = 1.0 / self.imu_rate
        ts = np.arange(np.floor(t0 / dt) * dt + dt, t1 + 1e-9, dt)
        out_t, out_w, out_a = [], [], []
        g_world = np.array([0.0, 0.0, -GRAVITY])
        for t in ts:
            Rcw, _ = self.traj.pose_cw(t)
            a_w = self.traj.acc(t)
            w_w = self.traj.omega_world(t)
            out_t.append(t)
            out_w.append(Rcw @ w_w)
            out_a.append(Rcw @ (a_w - g_world))
        return np.array(out_t), np.array(out_w), np.array(out_a)
