"""Batched factor-graph Gauss-Newton/LM on device.

TPU-native replacement for the reference's GTSAM ISAM2 backend
(mapper.cpp:469-612): instead of an incremental Bayes tree with serial
per-factor linearization, every factor type is an *edge table* (padded
arrays with a validity mask), linearized by one vmapped tensor program,
scatter-added (SpMM-style) into a dense block Hessian over the keyframe
window, and solved with a damped Cholesky — all inside one jit.

Per-keyframe variable block (dim 23 = 6 + CS + 1):
  [0:6] pose tangent (left-multiplicative, [trans, rot]),
  [6:6+CS] depth code, [6+CS] scale.

Design notes:
* Dense solve: a K-keyframe window gives a (23K)^2 system; for K <= 256
  this is well inside a single chip's HBM and the Cholesky is MXU work.
  Multi-host partitioning shards the *edge* tables and psum's (H, b)
  (see parallel/).
* LM damping: multiplicative on the diagonal (H + lambda diag(H) +
  lambda_min I), accept/reject on total graph error. The reference uses
  ISAM2 Dogleg; we match fixed points (gradient of the same cost), not
  the solver trajectory (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3, retract
from .psd import nearest_psd, psd_bump, psd_bump_symmetric


class Variables(NamedTuple):
    """SoA keyframe state: pose [K], code [K, CS], scale [K]."""

    pose: SE3  # rot [K,3,3], trans [K,3]
    code: jax.Array  # [K, CS]
    scale: jax.Array  # [K]

    @property
    def num_kf(self) -> int:
        return self.scale.shape[0]

    @property
    def code_size(self) -> int:
        return self.code.shape[-1]

    @property
    def block_dim(self) -> int:
        return 7 + self.code_size

    def apply_delta(self, delta: jax.Array, update_mask: jax.Array) -> "Variables":
        """delta [K, 23]; update_mask [K] gates frozen keyframes, or
        [K, block_dim] gates individual components (the aux pose-only
        frame variable, gtsam_utils.h:10 AuxPoseKey: pose free, code and
        scale frozen)."""
        cs = self.code_size
        m = expand_mask(update_mask, self.block_dim)
        pose_delta = delta[:, :6] * m[:, :6]
        new_pose = retract(self.pose, pose_delta)
        new_code = self.code + delta[:, 6 : 6 + cs] * m[:, 6 : 6 + cs]
        new_scale = self.scale + delta[:, 6 + cs] * m[:, 6 + cs]
        return Variables(new_pose, new_code, new_scale)


def expand_mask(update_mask: jax.Array, block_dim: int) -> jax.Array:
    """Normalize a per-keyframe [K] or per-component [K, block_dim]
    update mask to [K, block_dim]."""
    if update_mask.ndim == 1:
        return jnp.broadcast_to(
            update_mask[:, None], (update_mask.shape[0], block_dim)
        )
    return update_mask


def slot_indices(kf_idx: jax.Array, block_dim: int, sel: jax.Array) -> jax.Array:
    """Global tangent indices for selected per-KF slots.

    kf_idx [...]: keyframe index; sel [S]: slot offsets within the block.
    Returns [..., S] int32 global indices.
    """
    return kf_idx[..., None] * block_dim + sel[None, :]


def scatter_hessian(
    h: jax.Array,  # [D, D] global Hessian (D = K * block_dim)
    b: jax.Array,  # [D]
    gidx: jax.Array,  # [E, S] global indices per edge
    ata: jax.Array,  # [E, S, S]
    atb: jax.Array,  # [E, S]
    valid: jax.Array,  # [E] 0/1
):
    """Accumulate per-edge Hessian blocks (the SpMM aggregation).

    Implemented as one-hot MXU matmuls instead of element scatter-adds:
    TPU scatters cost ~20 ns/element (E * S^2 elements per factor type
    dominated the assembly), while H += P^T (A P) with the one-hot
    selection P [E*S, D] is two tiny dense matmuls. f32 one-hot matmul
    accumulation is exact per element (each output entry sums the same
    products as the scatter, in column order)."""
    d = h.shape[-1]
    e, s = gidx.shape
    dt = h.dtype
    hp = jax.lax.Precision.HIGHEST
    # P[e, s, :] = one_hot(gidx[e, s], D), zeroed for invalid edges
    p = (
        gidx[..., None] == jnp.arange(d, dtype=gidx.dtype)
    ).astype(dt) * valid[:, None, None]
    pf = p.reshape(e * s, d)  # [ES, D]
    # B = A @ P (batched: scatter columns), then H += P^T @ B
    bmat = jax.lax.dot_general(
        ata, p, (((2,), (1,)), ((0,), (0,))), precision=hp
    )  # [E, S, D]
    h = h + jax.lax.dot_general(
        pf, bmat.reshape(e * s, d), (((0,), (0,)), ((), ())), precision=hp
    )
    b = b + jax.lax.dot_general(
        pf, atb.reshape(e * s), (((0,), (0,)), ((), ())), precision=hp
    )
    return h, b


def schur_solve(
    h: jax.Array,  # [D, D] damped+masked SPD system (identity frozen rows)
    b: jax.Array,  # [D]
    num_kf: int,
    block_dim: int,
) -> jax.Array:
    """Solve H delta = b by eliminating every keyframe's (code, scale)
    block first (SURVEY.md §7.1: "Schur complement over codes+scale").

    Partition per keyframe into pose dims p (6) and code+scale dims c
    (block_dim - 6 = CS + 1):

        [App Apc] [dp]   [bp]
        [Acp Acc] [dc] = [bc]

    dc is eliminated through a Cholesky of Acc and the reduced 6K-dim
    pose system S = App - Apc Acc^-1 Acp is solved densely. Acc is NOT
    assumed block-diagonal — geometric/match-geometry edges couple codes
    across keyframes (geometric_factor.h:70 keys c0 AND c1), so the
    elimination uses the full cross-coupled Acc and the result equals
    the dense solve exactly (up to f32 factorization roundoff; verified
    to ~1e-5 rel in tests/test_ba.py). The payoff is structural: the
    biggest Cholesky shrinks from (23K)^3 to (17K)^3 and the rest of
    the work is MXU-friendly triangular solves/matmuls, and the pose
    system S is exactly what a future pose-graph-only consumer needs.
    """
    d = h.shape[-1]
    k, bd = num_kf, block_dim
    pose_idx = jnp.asarray(
        (jnp.arange(k)[:, None] * bd + jnp.arange(6)).reshape(-1)
    )
    cs_idx = jnp.asarray(
        (jnp.arange(k)[:, None] * bd + jnp.arange(6, bd)).reshape(-1)
    )
    app = h[pose_idx][:, pose_idx]  # [6K, 6K]
    apc = h[pose_idx][:, cs_idx]  # [6K, (bd-6)K]
    acc = h[cs_idx][:, cs_idx]
    bp = b[pose_idx]
    bc = b[cs_idx]

    chol_cc = jax.scipy.linalg.cho_factor(acc)
    x = jax.scipy.linalg.cho_solve(chol_cc, apc.T)  # Acc^-1 Acp [17K, 6K]
    y = jax.scipy.linalg.cho_solve(chol_cc, bc)
    hp = jax.lax.Precision.HIGHEST
    s = app - jnp.matmul(apc, x, precision=hp)
    rhs = bp - jnp.matmul(apc, y[:, None], precision=hp)[:, 0]
    dp = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(s), rhs)
    dc = y - jnp.matmul(x, dp[:, None], precision=hp)[:, 0]
    delta = jnp.zeros((d,), h.dtype)
    return delta.at[pose_idx].set(dp).at[cs_idx].set(dc)


class LMState(NamedTuple):
    variables: Variables  # last ACCEPTED variables
    error: jax.Array  # total graph error at `variables`
    h: jax.Array  # [D, D] linearization at `variables`
    b: jax.Array  # [D]
    candidate: Variables  # tentative point awaiting evaluation
    damping: jax.Array
    iteration: jax.Array
    converged: jax.Array  # bool: conv_fn fired on an accepted step


def lm_loop(
    variables: Variables,
    linearize_fn,  # vars -> (H [D,D], b [D], error scalar)
    error_fn,  # vars -> error scalar (used ONCE, for the final candidate)
    update_mask: jax.Array,  # [K] per-keyframe or [K, bd] per-component
    max_iters: int,
    init_damp: float = 1e-4,
    min_damp: float = 1e-6,
    max_damp: float = 1e2,
    damp_dec: float = 10.0,
    damp_inc: float = 10.0,
    min_error_dec: float = 0.0,
    conv_fn=None,  # (delta [K, bd], grad [K, bd]) -> bool; on accepted step
    solver: str = "dense",  # "dense" | "schur" (schur_solve above)
):
    """Deferred-acceptance damped GN (Levenberg-Marquardt) in one
    lax.while_loop. Entirely on device; no host round-trips (the
    reference's per-iteration Eigen-solve hop, camera_tracker.cpp:1182,
    disappears).

    One iteration = linearize the CANDIDATE -> accept/reject against the
    last accepted error -> damped solve from the accepted linearization
    -> retract the next candidate. The linearization's error term IS the
    total error at the candidate (same per-factor formulas), so the
    in-loop accept test needs NO separate error-only evaluation — on the
    measured v5e profile that evaluation (two narrow per-point gathers +
    dense coarse levels, ~1.1 ms of a ~3.9 ms global-BA iteration,
    docs/PERFORMANCE.md) is the price this formulation deletes:
    ``max_iters`` step decisions cost max_iters linearizations plus ONE
    trailing ``error_fn`` pass (for the last candidate, which no later
    linearization evaluates), vs. linearize+error per step before. A
    rejected step re-solves the STORED (H, b) of the accepted point
    under higher damping without relinearizing — the classic LM retry,
    which the evaluate-then-accept formulation paid a full duplicate
    linearization for.

    ``conv_fn`` is the ISAM2 relinearization-threshold analog: when the
    accepted step's delta falls below the caller's thresholds the loop
    stops early (deepfactors.cpp:296-313 iterates update() only while
    something relinearizes).
    """
    k = variables.num_kf
    bd = variables.block_dim
    dim = k * bd
    dtype = variables.scale.dtype
    mask2d = expand_mask(update_mask, bd)  # [K, bd]

    def cond(state: LMState):
        return jnp.logical_and(
            jnp.logical_and(
                state.iteration < max_iters, state.damping <= max_damp
            ),
            jnp.logical_not(state.converged),
        )

    def body(state: LMState):
        h_c, b_c, err_c = linearize_fn(state.candidate)
        # first iteration always accepts: state.error starts at +inf
        accept = err_c < state.error - min_error_dec

        def sel(a, b_):
            return jnp.where(accept, a, b_)

        nvars = jax.tree.map(sel, state.candidate, state.variables)
        nerr = sel(err_c, state.error)
        h = sel(h_c, state.h)
        b = sel(b_c, state.b)
        ndamp = jnp.where(
            accept,
            jnp.maximum(state.damping / damp_dec, min_damp),
            state.damping * damp_inc,
        )

        diag = jnp.diagonal(h)
        h_damped = (
            h + jnp.diag(ndamp * diag) + min_damp * jnp.eye(dim, dtype=dtype)
        )
        # mask out frozen keyframes/components: identity rows/cols, zero rhs
        free = mask2d.reshape(-1)
        h_masked = (
            h_damped * free[:, None] * free[None, :]
            + jnp.diag(1.0 - free)
        )
        b_masked = b * free
        if solver == "schur":
            delta = schur_solve(h_masked, b_masked, k, bd)
        else:
            chol, low = jax.scipy.linalg.cho_factor(h_masked)
            delta = jax.scipy.linalg.cho_solve((chol, low), b_masked)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        candidate = nvars.apply_delta(delta.reshape(k, bd), update_mask)
        if conv_fn is not None:
            # gate on accept: a post-reject delta is small because the
            # damping is high, not because the graph converged
            conv = jnp.logical_and(
                accept,
                conv_fn(
                    delta.reshape(k, bd) * mask2d,
                    b_masked.reshape(k, bd),
                ),
            )
        else:
            conv = jnp.asarray(False)
        return LMState(
            nvars, nerr, h, b, candidate, ndamp, state.iteration + 1, conv
        )

    h0, b0 = empty_system(k, bd, dtype)
    init = LMState(
        variables,
        jnp.asarray(jnp.inf, dtype),
        h0,
        b0,
        variables,
        jnp.asarray(init_damp, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    # the loop's last candidate was retracted but never linearized —
    # evaluate it once so a call makes exactly `max_iters` step
    # decisions (and a max_iters=1 call actually moves)
    err_c = error_fn(final.candidate)
    accept = err_c < final.error - min_error_dec
    out_vars = jax.tree.map(
        lambda a, b_: jnp.where(accept, a, b_),
        final.candidate,
        final.variables,
    )
    out_err = jnp.where(accept, err_c, final.error)
    return out_vars, out_err, final.iteration, final.converged


def empty_system(num_kf: int, block_dim: int, dtype=jnp.float32):
    dim = num_kf * block_dim
    return jnp.zeros((dim, dim), dtype), jnp.zeros((dim,), dtype)


def psd_correct(ata: jax.Array) -> jax.Array:
    """Per-edge PSD correction before assembly (photometric_factor.cpp:147).

    Symmetrize + Gerschgorin-scaled diagonal bump (solver.psd.psd_bump) —
    ~100x cheaper than the exact eigh projection on TPU and equivalent for
    our Gram-built blocks, which are PSD up to f32 roundoff. The factor
    kernels already emit bit-symmetric blocks, but the symmetrizing
    transpose is kept: it is numerically a no-op AND measurably faster
    end-to-end (the relayout it forces makes the downstream scatter-add
    cheaper; 8.1k vs 7.7k factors/s with psd_bump_symmetric)."""
    return psd_bump(ata)
