"""Benchmark: tracking-frontend throughput on real TPU hardware.

Measures the flagship per-frame pipeline (ORB pyramid extraction @ 1024
features on a 752x480 frame -> MXU Hamming matching vs the previous frame
-> motion-only pose Levenberg-Marquardt, 4x10 schedule) — the reference's
real-time envelope is 20 fps on EuRoC (BASELINE.md: Camera.fps 20,
'50 ms/frame tracking budget').

The frame chain runs ON DEVICE via lax.scan (frame i's pose initializes
frame i+1, so iterations serialize on-device exactly like the per-frame
tracker); one dispatch covers the whole chain so the number measures
device throughput, not host->device tunnel round-trips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

N_FRAMES = 32


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    forward, args = __import__("__graft_entry__").entry()
    img, prev_bits, prev_X, R0, t0_ = args
    # distinct inputs per frame (defeats any result caching in the runtime)
    imgs = jnp.stack([jnp.roll(img, 7 * (i % 8), axis=1) for i in range(N_FRAMES)])

    @jax.jit
    def chain(imgs, prev_bits, prev_X, R0, t0):
        def step(carry, im):
            R, t = carry
            R2, t2, inl = forward(im, prev_bits, prev_X, R, t)
            return (R2, t2), inl

        (_, _), inls = jax.lax.scan(step, (R0, t0), imgs)
        return jnp.sum(inls)

    out = chain(imgs, prev_bits, prev_X, R0, t0_)  # compile + warm
    float(out)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(imgs, prev_bits, prev_X, R0, t0_)
    acc = float(out)  # device->host fetch = completion barrier
    assert np.isfinite(acc)
    dt = (time.perf_counter() - t0) / (reps * N_FRAMES)
    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "tracking_frontend_fps_752x480_1024feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
