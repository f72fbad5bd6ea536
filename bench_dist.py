"""Distributed-BA benchmark: LM-step throughput at realistic local-BA scale.

Problem: K=30 poses, P=3000 landmarks, O=15360 observations (a large
covisibility-window local BA; ref Optimizer::LocalBundleAdjustment
window sizes, src/Optimizer.cc:1699-1788). One "iteration" = one full
damped-LM trial step: residual/Jacobian reduction, Schur rhs, 15-iter
matrix-free PCG on the reduced camera system, landmark back-substitution
and post-step cost — everything the solver does per accepted step.

Measured (real TPU, value-fetch barriers — see PROFILE.md):
  - ba_step_iters_per_s on 1 chip.

Virtual-mesh sanity (8 fake CPU devices, run with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_dist.py --cpu-mesh):
  - the same step compiles + runs under shard_map at n=1 and n=8 to
    bound the sharding overhead. NOTE: fake devices share one physical
    CPU, so this checks overhead, not true scaling; true scaling
    efficiency needs N real chips. The per-CG-iteration communication
    is two psums ([P,3] + [K,6] f32 = ~37 KB), against ~10^8 FLOP of
    local reduction — ICI-bound far above the 0.7-efficiency bar.

Prints one JSON line per measurement.
"""

import json
import sys
import time

import numpy as np


def build_problem(rng, K=30, P=3000, O=15360, FX=200.0):
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = (rng.randn(K, 3) * 0.1).astype(np.float32)
    X = np.stack([rng.randn(P) * 2, rng.randn(P) * 2,
                  rng.rand(P) * 4 + 3], -1).astype(np.float32)
    obs_kf = rng.randint(0, K, O).astype(np.int32)
    obs_pt = rng.randint(0, P, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[obs_kf], X[obs_pt]) + t[obs_kf]
    uvr = np.zeros((O, 3), np.float32)
    uvr[:, 0] = FX * Xc[:, 0] / Xc[:, 2] + 376.0
    uvr[:, 1] = FX * Xc[:, 1] / Xc[:, 2] + 240.0
    uvr[:, :2] += rng.randn(O, 2).astype(np.float32)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    valid = Xc[:, 2] > 0.2
    return R, t, X, obs_kf, obs_pt, uvr, fixed, valid


def run_mesh(n_devices, reps=20):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from tpuslam.parallel.dist_ba import (make_dist_ba_step, pack_sharded,
                                          shard_observations)

    rng = np.random.RandomState(0)
    R, t, X, obs_kf, obs_pt, uvr, fixed, valid = build_problem(rng)
    O = len(obs_kf)
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("obs",))
    shards, per = shard_observations(obs_pt, n_devices)
    step = jax.jit(make_dist_ba_step(mesh, 200.0, 200.0, 376.0, 240.0, 0.0,
                                     cg_iters=15))
    args = (
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(X), jnp.asarray(fixed),
        jnp.asarray(1e-3, jnp.float32),
        jnp.asarray(pack_sharded(obs_kf, shards, per, 0)),
        jnp.asarray(pack_sharded(obs_pt, shards, per, 0)),
        jnp.asarray(pack_sharded(uvr, shards, per, 0.0)),
        jnp.asarray(pack_sharded(np.ones(O, np.float32), shards, per, 0.0)),
        jnp.asarray(pack_sharded(np.zeros(O, bool), shards, per, False)),
        jnp.asarray(pack_sharded(valid, shards, per, False)),
    )
    out = step(*args)
    c = float(out[4])  # value fetch = the only real barrier on axon
    assert np.isfinite(c)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(*args)
    c = float(out[4])
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(c)
    return dt


def main():
    if "--cpu-mesh" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        for n in (1, 8):
            dt = run_mesh(n, reps=5)
            print(json.dumps({
                "metric": f"dist_ba_step_ms_vmesh{n}",
                "value": round(dt * 1e3, 2), "unit": "ms/step",
                "note": "8 fake CPU devices share one socket: overhead "
                        "check, not true scaling",
            }))
        return
    # real chip (1 device): LM-trial-step throughput
    dt = run_mesh(1, reps=20)
    print(json.dumps({
        "metric": "dist_ba_step_iters_per_s_K30_P3000_O15360",
        "value": round(1.0 / dt, 2),
        "unit": "iters/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
