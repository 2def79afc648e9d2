"""Mega (level-0 quad + level-1 3x3 patch) gather rows vs per-level gathers.

Dense coordinate sweep incl. exact integers / half pixels and
out-of-image coordinates — the mega path must be bit-identical to the
separate per-level quad gathers (interp.build_mega01 containment
argument)."""

import numpy as np
import jax.numpy as jnp

from sage_slam_tpu.geometry import interp


def test_mega01_bit_exact():
    rng = np.random.default_rng(0)
    k, h0, w0, c0, c1 = 2, 16, 20, 5, 4
    h1, w1 = h0 // 2, w0 // 2
    rows_l0 = jnp.asarray(
        rng.standard_normal((k, h0 * w0, c0)).astype(np.float32)
    )
    rows_l1 = jnp.asarray(
        rng.standard_normal((k, h1 * w1, c1)).astype(np.float32)
    )
    megaT = interp.build_mega01(rows_l0, rows_l1, w0, h0)
    r = (w0 + 1) * (h0 + 1)
    assert megaT.shape == (4 * c0 + 9 * c1 + 2, k * r)

    q0 = interp.pack_quads_level(rows_l0, w0)
    q1 = interp.pack_quads_level(rows_l1, w1)

    us = np.concatenate(
        [
            np.linspace(-3.0, w0 + 2.0, 2001),
            np.floor(np.linspace(-2, w0 + 1, 97)) + 0.5,
            np.floor(np.linspace(-2, w0 + 1, 97)) * 1.0,
        ]
    ).astype(np.float32)
    vs = np.concatenate(
        [
            np.linspace(-3.0, h0 + 2.0, 2001),
            np.floor(np.linspace(-2, h0 + 1, 97)) + 0.5,
            np.floor(np.linspace(-2, h0 + 1, 97)) * 1.0,
        ]
    ).astype(np.float32)
    rng.shuffle(vs)
    u = jnp.asarray(us)
    v = jnp.asarray(vs[: len(us)])

    for kk in range(k):
        ref0 = interp.bilinear_quad(q0[kk], u, v, w0, h0)
        u1, v1 = interp.level_coords(u, v, 0.5, 0.5)
        ref1 = interp.bilinear_quad(q1[kk], u1, v1, w1, h1)

        rowv, wts, _, _ = interp.mega_gather(
            megaT, u, v, w0, h0, offset=kk * r
        )
        got0 = interp.combine_quad_cm(rowv, wts, c0, c0)
        got1 = interp.mega_level1(rowv, u1, v1, w1, h1, c0, c1)

        np.testing.assert_array_equal(np.asarray(got0).T, np.asarray(ref0))
        np.testing.assert_array_equal(np.asarray(got1).T, np.asarray(ref1))


def test_mega_photometric_path_matches_plain(monkeypatch):
    """End-to-end: the USE_MEGA_TABLES sampling path must reproduce the
    default per-level gathers through the photometric factor."""
    import jax
    import sage_slam_tpu.ops.photometric as ph
    from tests.test_ba import build_problem, perturbed_vars
    from sage_slam_tpu.config import MapperConfig
    from sage_slam_tpu.solver import ba

    problem, pyr = build_problem()
    cfg = MapperConfig()
    variables = perturbed_vars(3, 4)

    p_plain = ba.prepare_problem(problem, pyr)
    h0, b0, e0 = jax.jit(lambda v: ba.linearize(v, p_plain, pyr, cfg))(
        variables
    )
    monkeypatch.setattr(ph, "USE_MEGA_TABLES", True)
    p_mega = ba.prepare_problem(problem, pyr)
    assert p_mega.window.mega_fg is not None
    h1, b1, e1 = jax.jit(lambda v: ba.linearize(v, p_mega, pyr, cfg))(
        variables
    )
    scale = float(jnp.max(jnp.abs(h0)))
    np.testing.assert_allclose(h1, h0, rtol=1e-5, atol=1e-6 * scale)
    np.testing.assert_allclose(b1, b0, rtol=1e-5, atol=1e-6 * scale)
    np.testing.assert_allclose(e1, e0, rtol=1e-6)
