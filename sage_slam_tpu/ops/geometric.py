"""Geometric (depth-consistency) factor — Cauchy-robustified.

Reference: cuda/geometric_factor_kernels.cpp (biased variant, :474-718 —
the active path, geometric_factor.cpp:335-347) + host reduce.

Residual per sampled point of kf0 warped into kf1:
  r = within_mask * (d1_sampled - z1),
where z1 is the warped depth and d1_sampled is kf1's *scaled* decoded
depth bilinearly sampled at the warped pixel. Robustification stores
``sqrt_w * r`` and ``sqrt_w * J`` with
``sqrt_w = within * sqrt(1 / (r_raw^2 + loss_param))`` gated by z1 > eps;
the *error* is the true Cauchy cost ``log(1 + (within*r)^2 / loss_param)``.

Jacobian sign convention: rows store d(z1 - d1)/d(params) = -dr/dx (same
convention as the photometric factor), so the GN step is AtA^-1 Atb.

Hessian block layout (dim 14+2CS):
  [0:6] pose0, [6:12] pose1, [12:12+CS] code0, [12+CS:12+2CS] code1,
  [12+2CS] scale0, [13+2CS] scale1  (geometric_factor.h:70).

Memory layout: per-keyframe depth tables come from SHARED flat arrays
(GeoShared) indexed by per-edge base offsets (see ops/photometric.py).
Operates at full output resolution (single level).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import interp
from ..geometry.camera import PinholeCamera
from ..geometry.se3 import SE3
from . import residuals


class GeoShared(NamedTuple):
    """Shared flat depth tables: bias_flat [K*HW], jac_flat [K*HW, CS],
    mask_flat [HW].

    packed_full / packed_dpt are optional TRANSPOSED (channel-major)
    quad-packed gather tables over the CURRENT variables' decoded frame-1
    rows + the folded validity mask (build_frame1_tables); they hoist the
    per-edge full-frame depth decode + spatial grad + pack out of the
    per-edge path (edges sharing a target keyframe re-used to redo it per
    edge). They depend on (code, scale), so they are rebuilt once per
    linearization, not once per problem."""

    bias_flat: jax.Array
    jac_flat: jax.Array
    mask_flat: jax.Array
    packed_full: jax.Array | None = None  # [4*(3+CS+1), K*R], R = HW+w+1
    packed_dpt: jax.Array | None = None  # [4*2, K*R]


class GeoKf0(NamedTuple):
    loc1d: jax.Array  # [N] int32
    homo0: jax.Array  # [N, 3]
    base_hw: jax.Array  # scalar int32 kf0_index * HW
    # precomputed source decode at loc1d (static per keyframe, see
    # ops/photometric.PhotoKf0); gathered lazily when None
    bias_at: jax.Array | None = None  # [N]
    jac_at: jax.Array | None = None  # [N, CS]


class GeoKf1(NamedTuple):
    base_hw: jax.Array  # scalar int32 kf1_index * HW


def build_frame1_tables(
    bias: jax.Array,  # [K, HW]
    jac: jax.Array,  # [K, HW, CS]
    codes: jax.Array,  # [K, CS]
    scales: jax.Array,  # [K]
    cam: PinholeCamera,
    mask_flat: jax.Array | None = None,  # [HW] full-res validity mask
    which: str = "both",  # "both" | "full" | "dpt"
):
    """Quad-packed per-keyframe frame-1 tables for the CURRENT variables:
    (packed_full [4*(3+CS[+1]), K*R] holding [scaled depth | scaled grad
    (2) | raw code jacobian [| mask]], packed_dpt [4*(1[+1]), K*R] scaled
    depth [+ mask]), TRANSPOSED (channel-major). With mask_flat given,
    each corner carries the validity mask as its last column so the
    nearest mask lookup rides the quad gather
    (interp.quad_nearest_select_cm).

    ``which`` skips the unused table: the linearize path consumes only
    packed_full, the error-only path only packed_dpt — and these tables
    depend on (code, scale), i.e. they are rebuilt every LM iteration."""
    from .pyramid import spatial_grad

    k, hw = bias.shape
    h, w = cam.height, cam.width
    unscaled = bias + jnp.einsum("khc,kc->kh", jac, codes)  # [K, HW]
    dpt = scales[:, None] * unscaled  # [K, HW]
    mask_col = (
        None
        if mask_flat is None
        else jnp.broadcast_to(mask_flat[None, :, None], (k, hw, 1))
    )

    packed_full = packed_dpt = None
    if which in ("both", "full"):
        grad = spatial_grad(unscaled.reshape(k, h, w))  # [2, K, H, W]
        grad_rows = (
            scales[None, :, None] * grad.reshape(2, k, hw)
        ).transpose(1, 2, 0)  # [K, HW, 2]
        rows = jnp.concatenate([dpt[..., None], grad_rows, jac], axis=-1)
        if mask_col is not None:
            rows = jnp.concatenate([rows, mask_col], axis=-1)
        packed_full = interp.pack_quads_level(rows, w).reshape(
            k * (hw + w + 1), -1
        ).T
    if which in ("both", "dpt"):
        dpt_rows = dpt[..., None]
        if mask_col is not None:
            dpt_rows = jnp.concatenate([dpt_rows, mask_col], axis=-1)
        packed_dpt = interp.pack_quads_level(dpt_rows, w).reshape(
            k * (hw + w + 1), -1
        ).T
    return packed_full, packed_dpt


def _quad_base(kf1: GeoKf1, hw: int, w: int):
    """Frame-1 row offset in the quad tables from the pixel offset."""
    return (kf1.base_hw // hw) * (hw + w + 1)


def _decode_frame1(shared: GeoShared, kf1: GeoKf1, code1, scale1, hw, h, w):
    """Full-frame scaled depth + spatial grad of kf1
    (geometric_factor.cpp:317-320, 340-341). Fallback when the shared
    quad tables are absent (tests / standalone use)."""
    from .pyramid import spatial_grad

    bias1 = jax.lax.dynamic_slice(shared.bias_flat, (kf1.base_hw,), (hw,))
    jac1 = jax.lax.dynamic_slice(
        shared.jac_flat, (kf1.base_hw, 0), (hw, shared.jac_flat.shape[-1])
    )
    unscaled = (bias1 + jac1 @ code1).reshape(h, w)
    grad = spatial_grad(unscaled[None])[:, 0]  # [2, H, W]
    return scale1 * unscaled.reshape(-1), scale1 * grad.reshape(2, -1), jac1


def geometric_jac_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    code1: jax.Array,
    scale0: jax.Array,
    scale1: jax.Array,
    kf0: GeoKf0,
    kf1: GeoKf1,
    shared: GeoShared,
    cam: PinholeCamera,
    factor_weight: float,
    loss_param,
    eps: float,
):
    """Returns (AtA [D,D], Atb [D], error, n_inliers), D = 14+2CS.

    Channel-major formulation (see ops/photometric.photometric_jac_error):
    per-point quantities are [N]-lane vectors / [D, N] matrices, the
    Jacobian Gram is two MXU matmuls."""
    from .photometric import _warp_project_cm

    cs = shared.jac_flat.shape[-1]
    dtype = kf0.homo0.dtype
    h, w = cam.height, cam.width
    hw = h * w
    hp = jax.lax.Precision.HIGHEST

    depth0, jac_cm0, homo_cm, rh, x1, pos, u1, v1 = _warp_project_cm(
        p0, p1, code0, scale0, kf0, shared, cam, eps
    )

    # ONE quad-packed gather for [depth | grad | code-jacobian | mask]
    if shared.packed_full is not None:
        cw = shared.packed_full.shape[0] // 4
        has_mask = cw == 3 + cs + 1
        rowv, wts = interp.quad_gather_cols(
            shared.packed_full, u1, v1, w, h, _quad_base(kf1, hw, w)
        )
        v = interp.combine_quad_cm(rowv, wts, 3 + cs, cw)  # [3+CS, N]
        if has_mask:
            within = interp.quad_nearest_select_cm(
                rowv, u1, v1, w, h, 3 + cs, cw
            )
        else:
            within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    else:
        dpt_map_1, dpt_grad_1, jac1_full = _decode_frame1(
            shared, kf1, code1, scale1, hw, h, w
        )
        rows1 = jnp.concatenate(
            [dpt_map_1[:, None], dpt_grad_1.T, jac1_full], axis=-1
        )  # [HW, 3+CS]
        v = interp.bilinear_quad(
            interp.pack_quads_level(rows1, w), u1, v1, w, h
        ).T
        within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    d1 = v[0]  # [N]
    g1x, g1y = v[1], v[2]  # [N] each
    jac1_cm = v[3:]  # [CS, N] raw

    z1 = x1[2]
    raw = d1 - z1
    err_pt = pos * jnp.log1p((within * raw) ** 2 / loss_param)
    sqrt_w = pos * within * jax.lax.rsqrt(raw**2 + loss_param)

    # geometry jacobian rows [D, N] from [N]-lane scalars (kernel
    # :674-698); K-row algebra shared with the photometric factor
    inv_z = 1.0 / z1
    xz = x1[0] * inv_z
    yz = x1[1] * inv_z
    fxz = cam.fx * inv_z
    fyz = cam.fy * inv_z
    xw = depth0[None] * jnp.matmul(p0.rot, homo_cm, precision=hp) + (
        p0.trans[:, None]
    )  # [3, N]
    a = jnp.swapaxes(p1.rot, -1, -2)  # R1^T
    zr = jnp.zeros_like(xw[0])
    nh = (
        jnp.stack([zr, -xw[2], xw[1]]),  # -hat(Xw) columns
        jnp.stack([xw[2], zr, -xw[0]]),
        jnp.stack([-xw[1], xw[0], zr]),
    )
    # d(z1 - d1)/d pose0 col k = jac[2,k] - (g1x kx[k] + g1y ky[k])
    jp0 = []
    for kk in range(3):
        kx_k = fxz * (a[0, kk] - xz * a[2, kk])
        ky_k = fyz * (a[1, kk] - yz * a[2, kk])
        jp0.append(a[2, kk] - (g1x * kx_k + g1y * ky_k))
    for m in range(3):
        jr = jnp.matmul(a, nh[m], precision=hp)  # [3, N]
        kx_k = fxz * (jr[0] - xz * jr[2])
        ky_k = fyz * (jr[1] - yz * jr[2])
        jp0.append(jr[2] - (g1x * kx_k + g1y * ky_k))
    jpose0 = jnp.stack(jp0)  # [6, N]

    dx = cam.fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z * inv_z)
    dy = cam.fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z * inv_z)
    d1_jac_dpt0 = g1x * dx + g1y * dy  # [N]
    rh_z = rh[2]
    rows = jnp.concatenate(
        [
            jpose0,
            -jpose0,
            ((rh_z - d1_jac_dpt0) * scale0)[None] * jac_cm0,  # code0
            -scale1 * jac1_cm,  # code1 (kernel :698)
            ((rh_z - d1_jac_dpt0) * depth0 / scale0)[None],  # scale0
            (-d1 / scale1)[None],  # scale1 (kernel :689)
        ],
        axis=0,
    )  # [D, N]
    rows = rows * sqrt_w[None]
    diff = sqrt_w * raw

    n_inl = jnp.sum(pos * within)
    has = n_inl > 0
    inv = jnp.where(has, factor_weight / jnp.maximum(n_inl, 1.0), 0.0)
    ata = inv * jax.lax.dot_general(
        rows, rows, (((1,), (1,)), ((), ())), precision=hp
    )
    atb = inv * jax.lax.dot_general(
        rows, diff, (((1,), (0,)), ((), ())), precision=hp
    )
    error = jnp.where(has, inv * jnp.sum(err_pt), factor_weight * 10.0)
    return ata, atb, error, n_inl


def geometric_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    code1: jax.Array,
    scale0: jax.Array,
    scale1: jax.Array,
    kf0: GeoKf0,
    kf1: GeoKf1,
    shared: GeoShared,
    cam: PinholeCamera,
    factor_weight: float,
    loss_param,
    eps: float,
):
    """Error-only path (geometric_error_calculate, kernel :126-217)."""
    from .photometric import _warp_project_cm

    h, w = cam.height, cam.width
    hw = h * w
    depth0, _, _, _, x1, pos_, u1, v1 = _warp_project_cm(
        p0, p1, code0, scale0, kf0, shared, cam, eps
    )
    if shared.packed_dpt is not None:
        cw = shared.packed_dpt.shape[0] // 4
        rowv, wts = interp.quad_gather_cols(
            shared.packed_dpt, u1, v1, w, h, _quad_base(kf1, hw, w)
        )
        d1 = interp.combine_quad_cm(rowv, wts, 1, cw)[0]
        if cw == 2:
            within = interp.quad_nearest_select_cm(rowv, u1, v1, w, h, 1, cw)
        else:
            within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    else:
        bias1 = jax.lax.dynamic_slice(
            shared.bias_flat, (kf1.base_hw,), (hw,)
        )
        jac1 = jax.lax.dynamic_slice(
            shared.jac_flat, (kf1.base_hw, 0), (hw, shared.jac_flat.shape[-1])
        )
        dpt_map_1 = scale1 * (bias1 + jac1 @ code1)
        d1 = interp.bilinear_quad(
            interp.pack_quads_level(dpt_map_1[:, None], w), u1, v1, w, h
        )[:, 0]
        within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    pos = pos_.astype(d1.dtype)
    raw = d1 - x1[2]
    err_pt = pos * jnp.log1p((within * raw) ** 2 / loss_param)
    n_inl = jnp.sum(pos * within)
    has = n_inl > 0
    error = jnp.where(
        has,
        factor_weight * jnp.sum(err_pt) / jnp.maximum(n_inl, 1.0),
        factor_weight * 10.0,
    )
    return error, n_inl
