import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.geometry import se3


def rand_tau(key, scale=1.0):
    return jax.random.normal(key, (6,)) * scale


def np_se3_exp(tau):
    """Independent NumPy transcription of the reference exp
    (gtsam_traits.h:107-137) for cross-checking."""
    v, omega = np.asarray(tau[:3], np.float64), np.asarray(tau[3:], np.float64)
    theta = np.linalg.norm(omega)
    axis = omega / theta if theta > 0 else np.array([1.0, 0.0, 0.0])
    theta = max(theta, 1e-14)
    st, ct = np.sin(theta), np.cos(theta)
    k = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    k2 = k @ k
    rot = np.eye(3) + st * k + (1 - ct) * k2
    big_v = np.eye(3) + ((1 - ct) / theta) * k + ((theta - st) / theta) * k2
    return rot, big_v @ v


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exp_matches_reference_transcription(seed):
    tau = np.array(jax.random.normal(jax.random.key(seed), (6,)))
    p = se3.se3_exp(jnp.asarray(tau))
    rot_ref, t_ref = np_se3_exp(tau)
    np.testing.assert_allclose(np.array(p.rot), rot_ref, atol=1e-5)
    np.testing.assert_allclose(np.array(p.trans), t_ref, atol=1e-5)


def test_exp_zero_is_identity():
    p = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.array(p.rot), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.array(p.trans), np.zeros(3), atol=1e-6)


def test_rotation_orthonormal():
    for seed in range(5):
        tau = rand_tau(jax.random.key(seed), 2.0)
        p = se3.se3_exp(tau)
        r = np.array(p.rot)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r) - 1.0) < 1e-5


def test_compose_inverse():
    a = se3.se3_exp(rand_tau(jax.random.key(0)))
    b = se3.se3_exp(rand_tau(jax.random.key(1)))
    ab = se3.compose(a, b)
    ident = se3.compose(se3.inverse(ab), ab)
    np.testing.assert_allclose(np.array(ident.rot), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.array(ident.trans), np.zeros(3), atol=1e-5)


def test_retract_is_left_multiplicative():
    p = se3.se3_exp(rand_tau(jax.random.key(0)))
    delta = rand_tau(jax.random.key(1), 0.1)
    q = se3.retract(p, delta)
    q_ref = se3.compose(se3.se3_exp(delta), p)
    np.testing.assert_allclose(np.array(q.rot), np.array(q_ref.rot), atol=1e-6)
    np.testing.assert_allclose(
        np.array(q.trans), np.array(q_ref.trans), atol=1e-6
    )


def test_local_rotation_roundtrip():
    """local()'s rotation part must invert retract's rotation part."""
    a = se3.se3_exp(rand_tau(jax.random.key(2)))
    delta = rand_tau(jax.random.key(3), 0.3)
    b = se3.retract(a, delta)
    tau = se3.local(a, b)
    # rotation part agrees with the applied delta rotation
    np.testing.assert_allclose(
        np.array(tau[3:]), np.array(delta[3:]), atol=1e-4
    )
    # translation part is raw D.trans of D = b * a^-1 (reference semantics)
    d = se3.compose(b, se3.inverse(a))
    np.testing.assert_allclose(np.array(tau[:3]), np.array(d.trans), atol=1e-5)


def test_so3_log_roundtrip():
    for seed in range(8):
        omega = np.array(jax.random.normal(jax.random.key(seed), (3,))) * 1.5
        rot = se3.so3_exp(jnp.asarray(omega, jnp.float32))
        back = np.array(se3.so3_log(rot))
        if np.linalg.norm(omega) < np.pi - 1e-2:
            # principal branch: exact roundtrip below pi
            np.testing.assert_allclose(back, omega, atol=2e-4)
        # always: exp(log(R)) == R
        rot2 = np.array(se3.so3_exp(jnp.asarray(back, jnp.float32)))
        np.testing.assert_allclose(rot2, np.array(rot), atol=2e-4)


def test_pose_distance_ignores_roll():
    # pure roll (rotation about z of the relative frame) must not count
    a = se3.SE3.identity()
    roll = se3.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.7]))
    d = se3.pose_distance(a, roll, 1.0, 1.0)
    assert float(d) < 1e-5


def test_batched_exp():
    taus = jax.random.normal(jax.random.key(0), (17, 6))
    batched = se3.se3_exp(taus)
    for i in range(17):
        single = se3.se3_exp(taus[i])
        np.testing.assert_allclose(
            np.array(batched.rot[i]), np.array(single.rot), atol=1e-6
        )


def test_jit_and_grad():
    f = jax.jit(lambda tau: jnp.sum(se3.se3_exp(tau).trans))
    g = jax.grad(f)(jnp.array([0.1, 0.2, -0.1, 0.05, -0.2, 0.3]))
    assert np.all(np.isfinite(np.array(g)))
