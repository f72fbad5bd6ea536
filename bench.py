"""Benchmark: tracking-frontend throughput on real TPU hardware.

Measures the flagship per-frame pipeline (ORB pyramid extraction @ 1024
features on a 752x480 frame -> MXU Hamming matching vs the previous frame
-> motion-only pose Levenberg-Marquardt, 4x10 schedule) — the reference's
real-time envelope is 20 fps on EuRoC (BASELINE.md: Camera.fps 20,
'50 ms/frame tracking budget').

Dispatch pattern matches deployment: the tracker launches ONE fused jit
per frame from the host, and frame i's pose feeds frame i+1 (the frames
serialize on device through the carry, so this measures the true
sequential per-frame latency, not batch throughput). Dispatch is async —
the host enqueues the whole chain and blocks once at the end, so the
tunnel round-trip latency is pipelined away exactly as in the real
tracking loop, which only fetches the pose when the host state machine
needs it. An alternative single-dispatch lax.scan chain was measured 6x
SLOWER (XLA's loop scheduling forces conservative buffer layouts across
the scan boundary), so per-frame dispatch is both the deployed and the
faster pattern.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

N_FRAMES = 64


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    forward, args = __import__("__graft_entry__").entry()
    img, prev_bits, prev_X, R0, t0_ = args
    # distinct inputs per frame (defeats any result caching in the runtime)
    imgs = [jnp.roll(img, 7 * (i % 8), axis=1) for i in range(N_FRAMES)]
    imgs = [jax.device_put(im) for im in imgs]

    fj = jax.jit(forward)

    def chain(R, t):
        acc = jnp.zeros((), jnp.int32)
        for i in range(N_FRAMES):
            R, t, inl = fj(imgs[i], prev_bits, prev_X, R, t)
            acc = acc + inl
        return acc

    out = chain(R0, t0_)  # compile + warm
    jax.block_until_ready(out)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(R0, t0_)
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
