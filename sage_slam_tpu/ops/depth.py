"""Depth decoding — the central algebraic identity of the system.

``dpt = scale * (bias + dpt_jac_code @ code)`` — depth is *linear* in the
latent code, so the depth Jacobian w.r.t. the code is the fixed network
output ``dpt_jac_code`` (reference: mapping_utils.h:216-222, used at
mapper.cpp:1171 and in every factor kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_depth(
    bias_flat: jax.Array,  # [HW]
    jac_code_flat: jax.Array,  # [HW, CS]
    code: jax.Array,  # [CS]
    scale: jax.Array | float,  # scalar
) -> jax.Array:
    """Full-image depth decode (mapping_utils.h:216-222). Returns [HW]."""
    return scale * (bias_flat + jac_code_flat @ code)


def decode_depth_at(
    bias_flat: jax.Array,  # [HW]
    jac_code_flat: jax.Array,  # [HW, CS]
    loc1d: jax.Array,  # [N] int indices
    code: jax.Array,  # [CS]
    scale: jax.Array | float,
) -> jax.Array:
    """Depth decode at sampled pixel indices (the kernels' sampled_dpts_0,
    photometric_factor_kernels.cpp:1094-1095). Returns [N]."""
    bias = jnp.take(bias_flat, loc1d)
    jac = jnp.take(jac_code_flat, loc1d, axis=0)
    return scale * (bias + jac @ code)
