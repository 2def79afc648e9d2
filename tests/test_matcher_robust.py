import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.geometry.se3 import se3_exp
from sage_slam_tpu.tracker import matcher, robust


def test_cycle_consistent_matching_recovers_shift():
    """Frame 1 = frame 0 rolled by 3 pixels in x: matches must land at the
    shifted location and be cycle-consistent."""
    rng = np.random.default_rng(0)
    h, w, c = 16, 20, 8
    desc0 = rng.standard_normal((h, w, c)).astype(np.float32)
    desc1 = np.roll(desc0, shift=3, axis=1)  # x + 3
    kps = np.array([5 * w + 4, 7 * w + 10, 2 * w + 8], np.int32)

    m = matcher.cycle_consistent_matches(
        jnp.asarray(kps),
        jnp.asarray(desc0.reshape(-1, c)),
        jnp.asarray(desc1.reshape(-1, c)),
        w,
        cyc_consis_thresh=1.0,
    )
    assert np.all(np.array(m.valid) == 1)
    x0 = np.array(kps) % w
    x1 = np.array(m.loc1d_1) % w
    np.testing.assert_array_equal((x0 + 3) % w, x1)
    y0 = np.array(kps) // w
    y1 = np.array(m.loc1d_1) // w
    np.testing.assert_array_equal(y0, y1)


def test_select_keypoints_deterministic():
    valid = jnp.arange(100, dtype=jnp.int32) * 2
    k1 = matcher.select_keypoints(jax.random.key(42), valid, 10)
    k2 = matcher.select_keypoints(jax.random.key(42), valid, 10)
    np.testing.assert_array_equal(np.array(k1), np.array(k2))
    assert len(np.unique(np.array(k1))) == 10


def test_gnc_registration_with_outliers():
    rng = np.random.default_rng(1)
    m = 60
    src = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    pose = se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.1, -0.2, 0.15], jnp.float32))
    rot_true = np.array(pose.rot)
    t_true = np.array(pose.trans)
    dst = src @ rot_true.T + t_true
    # corrupt 20% with large outliers
    n_out = 12
    out_idx = rng.choice(m, n_out, replace=False)
    dst[out_idx] += rng.uniform(0.5, 2.0, (n_out, 3)).astype(np.float32)

    bounds = np.full(m, 0.01, np.float32)
    res = robust.gnc_tls_registration(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(bounds),
        jnp.ones(m),
    )
    np.testing.assert_allclose(np.array(res.rot), rot_true, atol=5e-3)
    np.testing.assert_allclose(np.array(res.trans), t_true, atol=5e-3)
    inl = np.array(res.inliers)
    assert inl[out_idx].sum() == 0  # all outliers rejected
    assert inl.sum() >= m - n_out - 2  # nearly all inliers kept


def test_gnc_registration_clean():
    rng = np.random.default_rng(2)
    m = 30
    src = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    dst = src.copy()
    res = robust.gnc_tls_registration(
        jnp.asarray(src), jnp.asarray(dst), jnp.full(m, 0.01), jnp.ones(m)
    )
    np.testing.assert_allclose(np.array(res.rot), np.eye(3), atol=1e-4)
    assert np.array(res.inliers).sum() == m
