"""PSD correction of per-factor Hessian blocks.

The reference symmetrizes + SVD-projects + bumps eigenvalues on the CPU in
double precision (NearestPsd, mapping_utils.h:104-128, Higham 1988) because
GTSAM's factor-level Cholesky elimination needs every HessianFactor PSD.

Our AtA blocks are Gram matrices (J^T W J with W >= 0), so they are PSD by
construction up to f32 roundoff (observed |lambda_min| ~ 1e-4 relative).
The exact projection (`nearest_psd`, batched eigh) costs ~16 ms per BA
linearization on a TPU v5e — 60% of the whole step — so the hot path uses
`psd_bump` instead: symmetrize + a diagonal bump sized by a shifted
power-iteration estimate of lambda_min. For PSD input the bump is ~0 (the
block passes through unchanged); for a slightly indefinite block it
restores PSD-ness to the accuracy of the estimate. Any residual negative
curvature is absorbed by the LM damping + accept/reject loop
(solver.graph.lm_loop rejects non-decreasing steps and NaN-guards the
Cholesky solve), so the cheap bump is safe where the reference needed an
exact projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_psd(mat: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Exact nearest-PSD projection of [..., D, D] (batched eigh clamp).

    Kept for tests and offline use; the BA hot path uses psd_bump."""
    sym = 0.5 * (mat + jnp.swapaxes(mat, -1, -2))
    w, v = jnp.linalg.eigh(sym)
    w = jnp.maximum(w, eps)
    return jnp.einsum("...ik,...k,...jk->...ij", v, w, v)


def psd_bump(mat: jnp.ndarray, rel: float = 2e-4) -> jnp.ndarray:
    """Symmetrize [..., D, D] and add a fixed relative diagonal bump.

    The bump is rel * c with c the Gerschgorin spectral-norm bound
    (max_i sum_j |a_ij|), which dominates the f32 Gram-roundoff
    |lambda_min| <~ 1e-4 * ||A|| observed on our factor blocks. Diagonal
    bumps modify only the GN step, never the gradient, so the optimizer's
    fixed points are unchanged (same argument as LM damping); the
    reference's NearestPsd also ends in an eigenvalue epsilon-bump loop
    (mapping_utils.h:104-128). A fixed relative bump (rather than a
    power-iteration lambda_min estimate) keeps the result bit-stable
    across batch layouts, which edge-sharded multi-device BA needs to
    match single-device BA exactly. Zero (padded) blocks pass through
    as zero.
    """
    sym = 0.5 * (mat + jnp.swapaxes(mat, -1, -2))
    return _bump(sym, rel)


def _bump(sym: jnp.ndarray, rel: float) -> jnp.ndarray:
    d = sym.shape[-1]
    c = jnp.max(jnp.sum(jnp.abs(sym), axis=-1), axis=-1)  # [...]
    return sym + (rel * c)[..., None, None] * jnp.eye(d, dtype=sym.dtype)


def psd_bump_symmetric(mat: jnp.ndarray, rel: float = 2e-4) -> jnp.ndarray:
    """:func:`psd_bump` for blocks that are ALREADY bit-symmetric.

    The channel-major factor kernels build AtA as Kx (g Kx)^T + Ky (g Ky)^T
    style Gram sums whose f32 results are exactly symmetric (each (i, j)
    and (j, i) entry sums the identical products in the identical order),
    so the symmetrizing transpose — a minor-dim relayout the TPU pays real
    time for — is skipped."""
    return _bump(mat, rel)
