import numpy as np

from sage_slam_tpu.eval import ate


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(0)
    gt = rng.uniform(-2, 2, (30, 3))
    # random sim3
    from sage_slam_tpu.geometry.se3 import se3_exp
    import jax.numpy as jnp

    p = se3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.2, -0.4, 0.3], jnp.float32))
    rot_true = np.array(p.rot, np.float64)
    t_true = np.array(p.trans, np.float64)
    s_true = 1.7
    est = (gt - t_true) @ rot_true / s_true  # inverse mapping

    s, rot, t = ate.umeyama_alignment(est, gt, with_scale=True)
    np.testing.assert_allclose(s, s_true, rtol=1e-5)
    np.testing.assert_allclose(rot, rot_true, atol=1e-5)
    assert ate.ate_rmse(est, gt, "sim3") < 1e-5
    # se3 alignment can't fix the scale
    assert ate.ate_rmse(est, gt, "se3") > 0.1


def test_ate_none():
    est = np.zeros((10, 3))
    gt = np.ones((10, 3))
    assert abs(ate.ate_rmse(est, gt, "none") - np.sqrt(3)) < 1e-9


def test_depth_rmse():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0.5, 2.0, (16, 20))
    est = gt * 2.0  # pure scale error
    mask = np.ones_like(gt)
    assert ate.depth_rmse(est, gt, mask, align_scale=True) < 1e-6
    assert ate.depth_rmse(est, gt, mask, align_scale=False) > 0.5


def test_associate():
    est = [(1.0, np.zeros(3)), (2.0, np.ones(3))]
    gt = [(1.005, np.zeros(3)), (2.5, np.ones(3))]
    e, g = ate.associate(est, gt, max_dt=0.02)
    assert len(e) == 1
