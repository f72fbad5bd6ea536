"""Benchmark: tracking-frontend throughput on real TPU hardware.

Measures the flagship per-frame pipeline (ORB pyramid extraction @ 1024
features on a 752x480 frame -> MXU Hamming matching vs the previous frame
-> motion-only pose Gauss-Newton, 4x10 schedule) — the reference's
real-time envelope is 20 fps on EuRoC (BASELINE.md: Camera.fps 20,
'50 ms/frame tracking budget').

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    forward, args = __import__("__graft_entry__").entry()
    fn = jax.jit(forward)
    # distinct inputs per frame (defeats any result caching in the runtime)
    variants = [
        (jnp.roll(args[0], 7 * i, axis=1),) + args[1:] for i in range(8)
    ]
    # chain frames: frame i's pose initializes frame i+1, so iterations
    # serialize on-device; one final scalar fetch forces completion (the
    # axon tunnel defers execution past block_until_ready, so unchained
    # timing loops overlap and overcount).
    def run_chain(n):
        R0, t0_ = args[3], args[4]
        acc = None
        for i in range(n):
            img, prev_bits, prev_X = variants[i % 8][:3]
            R0, t0_, inl = fn(img, prev_bits, prev_X, R0, t0_)
            acc = inl if acc is None else acc + inl
        return float(acc)  # device->host fetch = completion barrier

    run_chain(2)  # compile + warm
    n = 32
    t0 = time.perf_counter()
    run_chain(n)
    dt = (time.perf_counter() - t0) / n
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
