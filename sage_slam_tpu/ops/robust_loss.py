"""Robust-loss helpers shared by the match-based factors.

Fair loss (the reference's active choice for match-geometry/reprojection,
match_geometry_factor_kernels.cpp "fair" kernels):
  rho(d)   = 2 (|d|/s + ... - log(1+|d|/s)),  s = sqrt(loss_param)
  sqrt_w(d)= sqrt(1 / (loss_param (1 + |d|/s)))
applied per residual component.
"""

from __future__ import annotations

import jax.numpy as jnp


def fair_error(diff, loss_param):
    """Elementwise fair cost, summed over the last axis."""
    s = jnp.sqrt(loss_param)
    n = jnp.abs(diff) / s
    return 2.0 * jnp.sum(n - jnp.log1p(n), axis=-1)


def fair_sqrt_weight(diff, loss_param):
    """Elementwise sqrt IRLS weight."""
    s = jnp.sqrt(loss_param)
    n = jnp.abs(diff) / s
    return jnp.sqrt(1.0 / (loss_param * (1.0 + n)))
