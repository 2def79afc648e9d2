"""Nearest-PSD projection of per-factor Hessian blocks.

The reference symmetrizes + SVD-projects + bumps eigenvalues on the CPU in
double precision (NearestPsd, mapping_utils.h:104-128, Higham 1988). On TPU
we use a single batched symmetric eigendecomposition and clamp negative
eigenvalues — for symmetric input (our AtA = J^T W J blocks, symmetric by
construction up to roundoff) this yields the same nearest-PSD matrix in the
Frobenius norm, without the data-dependent while-loop. Batched over the
leading axis; jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def nearest_psd(mat: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Project symmetric part of [..., D, D] onto the PSD cone."""
    sym = 0.5 * (mat + jnp.swapaxes(mat, -1, -2))
    w, v = jnp.linalg.eigh(sym)
    w = jnp.maximum(w, eps)
    return jnp.einsum("...ik,...k,...jk->...ij", v, w, v)
