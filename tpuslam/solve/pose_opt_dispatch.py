"""Backend dispatch for the motion-only pose solver.

On TPU-class backends the fused Pallas kernel (pose_opt_pallas) is the
faster path: measured fetch-to-fetch on the full tracking-frontend chain
(round 3, TPU v5e, 256-frame pose-carry chain, value-fetch barrier) the
fused kernel runs the whole forward at 1.45 ms/frame vs 2.33 ms with the
XLA lax-loop solver — the XLA version pays per-GN-step scheduling across
the sequential 4x10 LM chain; the fused kernel keeps the whole solve in
one launch. Both implement the same LM accept/reject semantics (ref:
Optimizer::PoseOptimization src/Optimizer.cc:854-1168 on g2o's Levenberg
algorithm), so the choice is purely a performance one.
"""

from __future__ import annotations

import functools

import jax

from .pose_opt import pose_optimize


@functools.cache
def _tpu_backend() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def pose_optimize_best(*args, **kw):
    """pose_optimize, routed to the fused Pallas kernel on TPU backends.

    The Pallas kernel is f32-only (the TPU dtype) and PINHOLE-only;
    KB8/fisheye solves (a `cam` kwarg with kind != 'pinhole') always use
    the camera-generic XLA implementation. Other backends (CPU tests run
    f64 under jax_enable_x64) use the XLA implementation too.
    """
    cam = kw.get("cam")
    generic = cam is not None and getattr(cam, "kind", "pinhole") != "pinhole"
    if _tpu_backend() and not generic:
        from .pose_opt_pallas import pose_optimize_fused

        kw.pop("cam", None)
        kw.pop("is_right", None)
        return pose_optimize_fused(*args, **kw)
    return pose_optimize(*args, **kw)
