"""Fisheye (KB8) stereo depth: two-ray triangulation through the lapping
area recovers ground-truth depths on synthetic geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.cameras import KannalaBrandt8
from tpuslam.engine.frontend import Frontend
from tpuslam.map.store import FrameFeatures
from tpuslam.ops.orb import OrbConfig


@pytest.fixture
def kb8_pair():
    params = [190.0, 190.0, 256.0, 256.0, 0.003, 0.02, -0.02, 0.004]
    cam_l = KannalaBrandt8(params, 512, 512, lapping=(0, 511))
    cam_r = KannalaBrandt8(params, 512, 512, lapping=(0, 511))
    R_rl = np.eye(3)
    t_rl = np.array([-0.11, 0.0, 0.0])   # right camera 11cm to the right
    return cam_l, cam_r, R_rl, t_rl


def test_kb8_stereo_triangulation(kb8_pair, rng):
    cam_l, cam_r, R_rl, t_rl = kb8_pair
    N = 120
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                  rng.uniform(1.5, 8, N)], 1)
    uv_l = np.asarray(cam_l.project(jnp.asarray(X)))
    Xr = X @ R_rl.T + t_rl
    uv_r = np.asarray(cam_r.project(jnp.asarray(Xr)))
    in_l = (uv_l > 5).all(1) & (uv_l < 507).all(1)
    in_r = (uv_r > 5).all(1) & (uv_r < 507).all(1)
    keep = in_l & in_r
    X, uv_l, uv_r = X[keep], uv_l[keep], uv_r[keep]
    n = len(X)
    bits = (rng.rand(n, 256) > 0.5).astype(np.uint8)

    fe = Frontend(cam_l, OrbConfig(n_features=n))

    def fake_feats(uv, bits):
        rays = np.asarray(cam_l.unproject(jnp.asarray(uv)))
        return FrameFeatures(
            xy=uv.copy(), und_xy=uv.copy(),
            norm_xy=rays[:, :2] / rays[:, 2:3],
            octave=np.zeros(n, np.int32), angle=np.zeros(n),
            response=np.ones(n), bits=bits,
            packed=np.zeros((n, 8), np.uint32), valid=np.ones(n, bool),
        )

    # monkeypatch the extraction with synthetic features
    f_l = fake_feats(uv_l, bits)
    out_r = dict(xy=jnp.asarray(uv_r), valid=jnp.ones(n, bool),
                 bits=jnp.asarray(bits))
    fe.process = lambda img: f_l
    fe._extract_raw = lambda img: out_r
    f = fe.process_stereo_fisheye(None, None, cam_r, R_rl, t_rl)
    have = f.depth > 0
    assert have.sum() > 0.8 * n
    err = np.abs(f.depth[have] - X[have, 2]) / X[have, 2]
    assert np.median(err) < 0.01, np.median(err)
    assert (err < 0.05).mean() > 0.9
