"""SAD sub-pixel stereo refinement (ref: Frame::ComputeStereoMatches
sliding-window SAD + parabolic interpolation, src/Frame.cc:869-930)."""

import numpy as np
import jax.numpy as jnp

from tpuslam.ops.stereo import sad_refine, sad_refine_pyramid


def _shift_x(img, dx):
    """Subpixel shift along x by linear interpolation (right image =
    left shifted by -disparity)."""
    H, W = img.shape
    x = np.arange(W) + dx
    x0 = np.clip(np.floor(x).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    a = (x - x0).clip(0, 1)
    return img[:, x0] * (1 - a) + img[:, x1] * a


def test_sad_refine_recovers_subpixel_disparity(rng):
    """Band-limited image sampled analytically at grid and disparity-shifted
    positions: the SAD basin is smooth, so the parabola is unbiased."""
    H, W = 120, 200
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def render(xs):
        img = np.zeros_like(xs)
        st = np.random.RandomState(3)
        for _ in range(25):
            fx_, fy_ = st.uniform(0.05, 0.5, 2)
            ph = st.uniform(0, 2 * np.pi)
            a = st.uniform(5, 20)
            img += a * np.cos(fx_ * xs + fy_ * yy + ph)
        return img.astype(np.float32)

    disp_true = 7.38
    img_l = render(xx)
    img_r = render(xx + disp_true)  # I_r(x) = I_l(x + d)
    N = 40
    xy = np.stack([rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], 1)
    u_r0 = np.round(xy[:, 0] - disp_true)  # integer-rounded initial match
    ok = np.ones(N, bool)
    u_r, sad, good = sad_refine(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy),
        jnp.asarray(u_r0), jnp.asarray(ok))
    u_r = np.asarray(u_r)
    good = np.asarray(good)
    assert good.sum() > N * 0.8
    disp = xy[:, 0] - u_r
    err = np.abs(disp[good] - disp_true)
    # parabolic SAD gets well under half a pixel; integer matching can't
    assert np.median(err) < 0.25, np.median(err)
    int_err = np.abs((xy[:, 0] - u_r0)[good] - disp_true)
    assert np.median(err) < np.median(int_err)


def test_sad_refine_rejects_border_and_keeps_u_on_reject(rng):
    H, W = 60, 80
    img_l = rng.rand(H, W).astype(np.float32)
    img_r = rng.rand(H, W).astype(np.float32)  # uncorrelated: junk matches
    N = 10
    xy = np.stack([rng.uniform(10, W - 10, N), rng.uniform(10, H - 10, N)], 1)
    u_r0 = xy[:, 0] - 5.0
    ok = np.ones(N, bool)
    u_r, sad, good = sad_refine(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy),
        jnp.asarray(u_r0), jnp.asarray(ok))
    u_r = np.asarray(u_r)
    good = np.asarray(good)
    # rejected matches keep their original coordinate untouched
    np.testing.assert_allclose(u_r[~good], u_r0[~good], atol=1e-6)


def _render_bandlimited(xs, yy):
    img = np.zeros_like(xs)
    st = np.random.RandomState(3)
    for _ in range(25):
        fx_, fy_ = st.uniform(0.05, 0.4, 2)
        ph = st.uniform(0, 2 * np.pi)
        a = st.uniform(5, 20)
        img += a * np.cos(fx_ * xs + fy_ * yy + ph)
    return img.astype(np.float32)


def test_sad_refine_pyramid_matches_level0_at_octave0(rng):
    """Octave-0 features through the pyramid variant == the level-0-only
    kernel (same gathers, same parabola)."""
    H, W = 120, 200
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img_l = _render_bandlimited(xx, yy)
    img_r = _render_bandlimited(xx + 6.7, yy)
    N = 30
    xy = np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], 1)
    u_r0 = np.round(xy[:, 0] - 6.7)
    ok = np.ones(N, bool)
    a = sad_refine(jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy),
                   jnp.asarray(u_r0), jnp.asarray(ok))
    b = sad_refine_pyramid(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy),
        jnp.zeros(N, jnp.int32), jnp.asarray(u_r0), jnp.asarray(ok),
        n_levels=4, scale=1.2)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_sad_refine_pyramid_higher_octaves(rng):
    """Features flagged at octave 2 are refined from the level-2 images
    (ref: Frame.cc:874-889 scales coords by mvInvScaleFactors[octave] and
    SADs mvImagePyramid[octave]); the refined disparity must still beat
    the integer initialization at level-0 resolution."""
    H, W = 240, 320
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    disp_true = 9.31
    img_l = _render_bandlimited(xx, yy)
    img_r = _render_bandlimited(xx + disp_true, yy)
    N = 40
    xy = np.stack([rng.uniform(60, W - 60, N), rng.uniform(60, H - 60, N)], 1)
    octv = np.full(N, 2, np.int32)
    sf = 1.2 ** 2
    # integer initial match at the FEATURE's level, scaled back (what the
    # banded matcher hands over for a level-2 feature)
    u_r0 = np.round((xy[:, 0] - disp_true) / sf) * sf
    ok = np.ones(N, bool)
    u_r, sad, good = sad_refine_pyramid(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy),
        jnp.asarray(octv), jnp.asarray(u_r0), jnp.asarray(ok),
        n_levels=4, scale=1.2)
    u_r, good = np.asarray(u_r), np.asarray(good)
    assert good.sum() > N * 0.6
    err = np.abs((xy[:, 0] - u_r)[good] - disp_true)
    int_err = np.abs((xy[:, 0] - u_r0)[good] - disp_true)
    assert np.median(err) < np.median(int_err)
    assert np.median(err) < 0.6 * sf  # sub-(level-2)-pixel


def test_sad_refine_pyramid_border_reject(rng):
    H, W = 100, 120
    img = rng.rand(H, W).astype(np.float32)
    # feature whose level-1 window falls off the level-1 image edge
    xy = np.array([[W - 3.0, H / 2], [10.0, 4.0]])
    octv = np.array([1, 1], np.int32)
    u_r0 = xy[:, 0] - 4.0
    u_r, sad, good = sad_refine_pyramid(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xy),
        jnp.asarray(octv), jnp.asarray(u_r0), jnp.ones(2, bool),
        n_levels=4, scale=1.2)
    good = np.asarray(good)
    assert not good[0] and not good[1]
    np.testing.assert_allclose(np.asarray(u_r), u_r0, atol=1e-6)
