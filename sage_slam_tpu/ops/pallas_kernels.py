"""Pallas TPU kernels for the factor-reduce hot path.

`photo_reduce_pallas` fuses the per-edge photometric J^T W J reduction —
per-point 2x2 gradient-Gram accumulation over pyramid levels, gating,
K-row weighting and the AtA/Atb contractions (the math of
ops/photometric.photo_reduce_xla, i.e. the reference CUDA kernel's
L*N*C x 29 row build + cuBLAS reduce, photometric_factor_kernels.cpp:
33-368, 1061-1164) — into ONE kernel over (edge, point-tile) grid cells:

* every input block lives in VMEM in channel-major layout (points on the
  128-lane axis, channels on sublanes),
* the channel sums are sublane reductions on the VPU,
* the AtA accumulation is two [32, TN] x [TN, 32] MXU matmuls per tile,
* per-edge outputs are accumulated in-place across the point-tile grid
  dimension (output block revisiting),

so none of the [L, 3C, N] intermediates round-trip HBM between the stages
the way the unfused XLA pipeline materializes them.

The XLA path (photo_reduce_xla) remains the reference implementation and
the fallback on backends without Mosaic; tests/test_pallas.py checks the
kernel against it (interpret mode on CPU). Select per run with
MapperConfig(photo_reduce="pallas"); measured within ~5% of the XLA
reduce on a v5e (the shared bottleneck is streaming the gathered
[E, L, 3C, N] samples from HBM, which both paths pay).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pad_dim(dim: int) -> int:
    """Hessian block dim padded so three extra rows/cols (Atb, err,
    n_inl) fit and the sublane count is a multiple of 8."""
    return -(-(dim + 3) // 8) * 8


def _kernel(
    fg_ref,  # [1, L, 3C, TN]
    f0_ref,  # [1, L, C, TN]
    gate_ref,  # [1, 1, TN]
    kx_ref,  # [1, PAD, TN] rows dim.. zero; row dim+1 repurposed as ones
    ky_ref,  # [1, PAD, TN] rows dim.. zero
    ata_ref,  # [1, PAD, PAD] out, accumulated over the tile grid dim:
    #   [:dim, :dim] = AtA, [:dim, dim] = Atb,
    #   [dim+1, dim+1] = err, [dim+1, dim+2] = n_inl
    *,
    weights,
    ratios,
    c: int,
    dim: int,
):
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _init():
        ata_ref[...] = jnp.zeros_like(ata_ref)

    gate = gate_ref[0, 0]  # [TN]
    gate2 = gate * gate

    gxx = gxy = gyy = hx = hy = esum = jnp.zeros_like(gate)
    # ratios has exactly one entry per pyramid level; weights may be a
    # longer config tuple (indexed per level, like the XLA path)
    for lvl in range(len(ratios)):
        fg = fg_ref[0, lvl]  # [3C, TN]
        f0 = f0_ref[0, lvl]  # [C, TN]
        f1 = fg[0:c]
        gx = fg[c : 2 * c]
        gy = fg[2 * c : 3 * c]
        d = f0 - f1
        wl = weights[lvl]
        rx, ry = ratios[lvl]
        gxx = gxx + (wl * rx * rx) * jnp.sum(gx * gx, axis=0)
        gxy = gxy + (wl * rx * ry) * jnp.sum(gx * gy, axis=0)
        gyy = gyy + (wl * ry * ry) * jnp.sum(gy * gy, axis=0)
        hx = hx + (wl * rx) * jnp.sum(gx * d, axis=0)
        hy = hy + (wl * ry) * jnp.sum(gy * d, axis=0)
        esum = esum + wl * jnp.sum(d * d, axis=0)
    gxx, gxy, gyy = gate2 * gxx, gate2 * gxy, gate2 * gyy
    hx, hy = gate2 * hx, gate2 * hy

    # Every reduction over points rides the SAME pair of MXU matmuls:
    # rhs padding rows carry [Atb | err | n_inl] columns against the
    # lhs's zero/ones padding rows, so no separate matvec or scalar
    # reduce is emitted (Mosaic has no reduce-with-accumulator).
    kx = kx_ref[0]  # [PAD, TN], row dim+1 = ones
    ky = ky_ref[0]  # [PAD, TN], rows dim.. = zero
    pad = kx.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (pad, 1), 0)
    kgx = gxx[None] * kx + gxy[None] * ky
    kgx = jnp.where(row == dim, hx[None], kgx)  # col dim <- Atb part
    # residual r = gate * d, so err/count weight is gate^2 (== gate for
    # a binary mask; diverges only under soft_inlier_gate) — mirrors
    # photo_reduce_xla exactly
    kgx = jnp.where(row == dim + 1, (gate2 * esum)[None], kgx)  # err
    kgx = jnp.where(row == dim + 2, gate2[None], kgx)  # n_inl
    kgy = gxy[None] * kx + gyy[None] * ky
    kgy = jnp.where(row == dim, hy[None], kgy)
    kgy = jnp.where(row >= dim + 1, jnp.zeros_like(kgy), kgy)
    dn = (((1,), (1,)), ((), ()))
    hp = jax.lax.Precision.HIGHEST
    ata_ref[0] += jax.lax.dot_general(
        kx, kgx, dn, preferred_element_type=jnp.float32, precision=hp
    ) + jax.lax.dot_general(
        ky, kgy, dn, preferred_element_type=jnp.float32, precision=hp
    )


@functools.partial(
    jax.jit, static_argnames=("weights", "ratios", "c", "interpret")
)
def photo_reduce_pallas(
    fgs: jax.Array,  # [E, L, 3C, N]
    f0_cm: jax.Array,  # [E, L, C, N]
    gate: jax.Array,  # [E, N]
    kx: jax.Array,  # [E, 29, N]
    ky: jax.Array,  # [E, 29, N]
    weights: tuple,
    ratios: tuple,
    c: int,
    interpret: bool | None = None,
):
    """Fused photometric reduce over all edges.

    Same function as vmapped photo_reduce_xla: returns UN-normalized
    (ata [E, 29, 29], atb [E, 29], err [E], n_inl [E])."""
    if interpret is None:
        # Mosaic only exists on TPU backends; interpret elsewhere (CI
        # runs the test suite on a forced-CPU host platform)
        interpret = jax.default_backend() not in ("tpu", "axon")
    e, l, c3, n = fgs.shape
    dim = kx.shape[1]
    padd = _pad_dim(dim)
    tn = 512 if n % 512 == 0 else n
    nt = n // tn
    kx_p = jnp.pad(kx, ((0, 0), (0, padd - dim), (0, 0)))
    # lhs padding row dim+1 = ones: the err / n_inl point-sums ride the
    # MXU matmul against it (see _kernel)
    kx_p = kx_p.at[:, dim + 1].set(1.0)
    ky_p = jnp.pad(ky, ((0, 0), (0, padd - dim), (0, 0)))

    grid = (e, nt)
    kern = functools.partial(
        _kernel, weights=weights, ratios=ratios, c=c, dim=dim
    )
    ata = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, l, c3, tn), lambda i, t: (i, 0, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l, c, tn), lambda i, t: (i, 0, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tn), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, padd, tn), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, padd, tn), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, padd, padd), lambda i, t: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((e, padd, padd), fgs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(fgs, f0_cm, gate[:, None], kx_p, ky_p)
    return (
        ata[:, :dim, :dim],
        ata[:, :dim, dim],
        ata[:, dim + 1, dim + 1],
        ata[:, dim + 1, dim + 2],
    )
