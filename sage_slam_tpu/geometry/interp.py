"""Bilinear / nearest gather primitives with the reference's border semantics.

All sampling in the factor kernels uses *zero padding per corner*: each of
the four bilinear corners contributes only if it lies strictly within the
image bounds (reference WITHIN_BOUNDS, cuda/photometric_factor_kernels.cpp:16,
corner accumulation :106-139). Mask lookups are *nearest* at full resolution
(:159-166).

Level coordinate convention: a full-resolution pixel coordinate ``p`` maps to
level ``l`` as ``(p + 0.5) * (size_l / size_0) - 0.5``
(photometric_factor_kernels.cpp:101-103,142-144).

These are the SDDMM-style gathers of the framework: on TPU they lower to
flat one-dimensional gathers from the concatenated pyramid layout
``[C, N0+N1+...]``, which XLA fuses with the surrounding elementwise math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pin(*coords):
    """Pin coordinate tensors to ONE materialization.

    XLA freely duplicates elementwise producer chains into every consumer
    fusion, and each fusion may compile the chain with different
    instruction selection (e.g. FMA contraction) — so the SAME traced
    value can materialize with different last-ulp rounding in different
    consumers. Samplers derive both gather indices and interpolation /
    select weights from floor(coord); if two consumers see different
    roundings at a knife-edge coordinate, the gathered pixels and their
    weights desynchronize (observed as O(1) sample errors in the fused
    tracker program). An optimization_barrier forces the coordinates to
    materialize once, restoring the index/weight consistency every
    sampler here relies on."""
    out = jax.lax.optimization_barrier(coords)
    return out if len(coords) > 1 else out[0]


def level_coords(x: jax.Array, y: jax.Array, ratio_x: float, ratio_y: float):
    """Map full-res pixel coords to a pyramid level (half-pixel convention)."""
    return (x + 0.5) * ratio_x - 0.5, (y + 0.5) * ratio_y - 0.5


def bilinear_flat(
    img_flat: jax.Array,  # [C, total] flattened image(s), row-major per level
    x: jax.Array,  # [N] pixel x (level coords)
    y: jax.Array,  # [N] pixel y (level coords)
    width: int,
    height: int,
    offset: int = 0,
) -> jax.Array:
    """Zero-padding bilinear gather from a flattened image.

    Returns [C, N]. Each corner contributes iff within bounds
    (photometric_factor_kernels.cpp:106-139).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx0 = x1 - x  # weight for x0 ("lower")
    wy0 = y1 - y
    wx1 = 1.0 - wx0
    wy1 = 1.0 - wy0

    xi0 = x0.astype(jnp.int32)
    yi0 = y0.astype(jnp.int32)
    xi1 = xi0 + 1
    yi1 = yi0 + 1

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        xi_c = jnp.clip(xi, 0, width - 1)
        yi_c = jnp.clip(yi, 0, height - 1)
        idx = offset + yi_c * width + xi_c
        vals = jnp.take(img_flat, idx, axis=-1)  # [C, N]
        return vals * (w * inb.astype(img_flat.dtype))

    out = (
        corner(xi0, yi0, wx0 * wy0)
        + corner(xi1, yi1, wx1 * wy1)
        + corner(xi0, yi1, wx0 * wy1)
        + corner(xi1, yi0, wx1 * wy0)
    )
    return out


def pack_quads_level(rows: jax.Array, width: int) -> jax.Array:
    """Pack ONE row-major level image [..., M, C] (M = width*height) into
    quad rows [..., M + width + 1, 4C] holding all four bilinear corners:

      out[q] = (rows[q-w-1], rows[q-w], rows[q-1], rows[q]),  w = width

    so the gather at ``q = (w+1) + y0*w + x0`` yields the corners
    (x0,y0), (x1,y0), (x0,y1), (x1,y1) in slots 0..3 — a 4-corner bilinear
    costs ONE dynamic gather. Out-of-image slots read zero padding or a
    neighboring row, but only for corners whose bounds weight is exactly
    zero (those slots are multiplied by a zero corner weight). Needs the
    level width, so multi-level pyramids pack per level segment.
    """
    m, c = rows.shape[-2:]
    z = jnp.zeros(rows.shape[:-2] + (width + 1, c), rows.dtype)
    ext = jnp.concatenate([z, rows, z], axis=-2)  # ext[j] = rows[j-w-1]
    n = m + width + 1
    return jnp.concatenate(
        [
            ext[..., 0:n, :],
            ext[..., 1 : n + 1, :],
            ext[..., width : n + width, :],
            ext[..., width + 1 : n + width + 1, :],
        ],
        axis=-1,
    )


def bilinear_quad(
    packed: jax.Array,  # [total_q, 4C] from pack_quads_level (concatenated)
    x: jax.Array,  # [N] pixel x (level coords)
    y: jax.Array,  # [N] pixel y (level coords)
    width: int,
    height: int,
    offset=0,  # scalar: start row of this level segment in `packed`
) -> jax.Array:
    """Zero-padding bilinear gather from a quad-packed level -> [N, C].

    Bit-equivalent semantics to :func:`bilinear_flat` (per-corner
    WITHIN_BOUNDS zero padding, photometric_factor_kernels.cpp:106-139),
    with ONE dynamic gather per point instead of four.
    """
    c = packed.shape[-1] // 4
    x, y = _pin(x, y)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx0 = x0 + 1.0 - x
    wy0 = y0 + 1.0 - y
    wx1 = 1.0 - wx0
    wy1 = 1.0 - wy0
    xi0 = x0.astype(jnp.int32)
    yi0 = y0.astype(jnp.int32)
    dt = packed.dtype
    bx0 = ((xi0 >= 0) & (xi0 < width)).astype(dt)
    bx1 = ((xi0 + 1 >= 0) & (xi0 + 1 < width)).astype(dt)
    by0 = ((yi0 >= 0) & (yi0 < height)).astype(dt)
    by1 = ((yi0 + 1 >= 0) & (yi0 + 1 < height)).astype(dt)
    # clip to [-1, dim-1] so q stays inside this level's segment; clipped
    # coordinates always carry zero bounds weight (computed pre-clip)
    xc = jnp.clip(xi0, -1, width - 1)
    yc = jnp.clip(yi0, -1, height - 1)
    q = offset + (width + 1) + yc * width + xc
    rowv = jnp.take(packed, q, axis=0)  # [N, 4C]
    w00 = (wx0 * wy0 * bx0 * by0)[:, None]
    w10 = (wx1 * wy0 * bx1 * by0)[:, None]
    w01 = (wx0 * wy1 * bx0 * by1)[:, None]
    w11 = (wx1 * wy1 * bx1 * by1)[:, None]
    return (
        rowv[:, :c] * w00
        + rowv[:, c : 2 * c] * w10
        + rowv[:, 2 * c : 3 * c] * w01
        + rowv[:, 3 * c :] * w11
    )


def quad_gather_cols(
    packedT: jax.Array,  # [4*cw, total_q] TRANSPOSED quad table
    x: jax.Array,
    y: jax.Array,
    width: int,
    height: int,
    offset=0,
):
    """One quad-column gather from a TRANSPOSED quad table ->
    (rowv [4*cw, N], (w00, w10, w01, w11) each [N]). The weights carry the
    per-corner WITHIN_BOUNDS zero padding
    (photometric_factor_kernels.cpp:106-139); combining
    ``sum_j rowv[j*cw : j*cw+c] * w_j`` equals :func:`bilinear_quad`.

    Channel-major layouts keep N on the TPU lane axis (full 128-lane
    vectors, sublane-axis channel reductions) — the layout used by the
    whole channel-major factor evaluation path."""
    x, y = _pin(x, y)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx0 = x0 + 1.0 - x
    wy0 = y0 + 1.0 - y
    wx1 = 1.0 - wx0
    wy1 = 1.0 - wy0
    xi0 = x0.astype(jnp.int32)
    yi0 = y0.astype(jnp.int32)
    dt = packedT.dtype
    bx0 = ((xi0 >= 0) & (xi0 < width)).astype(dt)
    bx1 = ((xi0 + 1 >= 0) & (xi0 + 1 < width)).astype(dt)
    by0 = ((yi0 >= 0) & (yi0 < height)).astype(dt)
    by1 = ((yi0 + 1 >= 0) & (yi0 + 1 < height)).astype(dt)
    xc = jnp.clip(xi0, -1, width - 1)
    yc = jnp.clip(yi0, -1, height - 1)
    q = offset + (width + 1) + yc * width + xc
    rowv = jnp.take(packedT, q, axis=1)  # [4*cw, N]
    w00 = wx0 * wy0 * bx0 * by0
    w10 = wx1 * wy0 * bx1 * by0
    w01 = wx0 * wy1 * bx0 * by1
    w11 = wx1 * wy1 * bx1 * by1
    return rowv, (w00, w10, w01, w11)


def combine_quad_cm(rowv: jax.Array, weights, c: int, cw: int | None = None):
    """Channel-major weighted corner combine -> [c, N]."""
    if cw is None:
        cw = c
    w00, w10, w01, w11 = weights
    return (
        rowv[0 * cw : 0 * cw + c] * w00[None]
        + rowv[1 * cw : 1 * cw + c] * w10[None]
        + rowv[2 * cw : 2 * cw + c] * w01[None]
        + rowv[3 * cw : 3 * cw + c] * w11[None]
    )


def quad_bilinear_select_cm(rowv: jax.Array, weights, col: int, cw: int):
    """Bilinear value from already-gathered quad columns -> [N]: the
    CONTINUOUS counterpart of :func:`quad_nearest_select_cm` for the
    folded validity-mask channel (row ``col`` of each corner block).

    A nearest-select mask gate is binary: one sample crossing the mask
    border flips its gate and jumps the mean-normalized factor error by
    ~err/n — with many samples straddling the border, LM wedges on
    these cliffs (it rejects every step whose alignment gain is smaller
    than the gate-flip jumps). The bilinear mask ramps 0->1 over one
    pixel, making the gated cost piecewise-smooth (the soft_inlier_gate
    config option)."""
    w00, w10, w01, w11 = weights
    return (
        rowv[0 * cw + col] * w00
        + rowv[1 * cw + col] * w10
        + rowv[2 * cw + col] * w01
        + rowv[3 * cw + col] * w11
    )


def quad_nearest_select_cm(
    rowv: jax.Array,  # [4*cw, N]
    x: jax.Array,
    y: jax.Array,
    width: int,
    height: int,
    col: int,
    cw: int,
) -> jax.Array:
    """Nearest-neighbor value from already-gathered quad columns -> [N].

    Reproduces :func:`nearest_flat` for a value stored per corner at row
    ``col`` (corner stride ``cw``): the rounded pixel is always one of the
    4 bilinear corners, so folding the value into the quad table removes a
    whole per-point gather (used for the validity mask,
    photometric_factor_kernels.cpp:159-166).

    Rounding: half-up (frac >= 0.5), matching the reference CUDA
    ``round()`` (half-away-from-zero for positive pixel coords);
    ``nearest_flat`` uses jnp.round (half-to-even) — they differ only at
    exact .5 fractions, a measure-zero set for warped coordinates."""
    # _pin the coordinates exactly like the quad gather that produced
    # rowv did — otherwise XLA fusion duplication can recompute floor()
    # from un-pinned values and, at knife-edge coordinates, select a
    # corner inconsistent with the gathered anchor.
    x, y = _pin(x, y)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    ex = (x - x0f) >= 0.5
    ey = (y - y0f) >= 0.5
    xr = x0f.astype(jnp.int32) + ex.astype(jnp.int32)
    yr = y0f.astype(jnp.int32) + ey.astype(jnp.int32)
    inb = (xr >= 0) & (xr < width) & (yr >= 0) & (yr < height)
    m00 = rowv[0 * cw + col]
    m10 = rowv[1 * cw + col]
    m01 = rowv[2 * cw + col]
    m11 = rowv[3 * cw + col]
    mx0 = jnp.where(ey, m01, m00)
    mx1 = jnp.where(ey, m11, m10)
    val = jnp.where(ex, mx1, mx0)
    return val * inb.astype(rowv.dtype)


def dense_bilinear_cm(
    rows_cm: jax.Array,  # [C, H*W] one level image, channel-major
    x: jax.Array,  # [N] level coords
    y: jax.Array,
    width: int,
    height: int,
) -> jax.Array:
    """Gather-free bilinear sampling of a SMALL level image -> [C, N].

    The bilinear weight of pixel p for point n is the separable hat
    ``relu(1-|x_n-px_p|) * relu(1-|y_n-py_p|)`` — exactly the 4-corner
    weights of :func:`bilinear_flat` with per-corner zero padding (out-of-
    image corners simply have no column). Contracting the hat weights
    against the image rows on the MXU (precision=HIGHEST for f32-exact
    accumulation) replaces a per-point gather; profitable when H*W is a
    few hundred pixels (pyramid levels 2-3), where the ~20 ns/row TPU
    gather cost dwarfs the dense FLOPs."""
    c = rows_cm.shape[0]
    dt = rows_cm.dtype
    px = jnp.arange(width, dtype=dt)
    py = jnp.arange(height, dtype=dt)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - px))  # [N, W]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - py))  # [N, H]
    b = jax.lax.dot_general(
        rows_cm.reshape(c * height, width),
        wx,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, height, -1)  # [C, H, N]
    return jnp.sum(b * jnp.swapaxes(wy, 0, 1)[None], axis=1)  # [C, N]


def build_mega01(
    rows_l0: jax.Array,  # [K, M0, C0] level-0 rows (may carry extra cols)
    rows_l1: jax.Array,  # [K, M1, C1] level-1 rows
    width0: int,
    height0: int,
):
    """Pack level-0 quad corners AND the level-1 3x3 patch into ONE
    gather row -> [4*C0 + 9*C1, K*R] (transposed), R = (w0+1)*(h0+1).

    Level 1 must be the exact half resolution of level 0. Row index
    q = (y0+1)*(w0+1) + (x0+1) for the level-0 corner anchor (x0, y0)
    with x0 in [-1, w0-1] / y0 in [-1, h0-1] — the clip range of
    :func:`mega_gather`. Unlike pack_quads_level this grid has NO flat
    wrap-around aliasing (boundary anchors get explicit zero-padded
    corners), which the level-1 patch needs: the patch covers level-1
    pixels (ky+dy, kx+dx), dy,dx in {-1,0,1} with ky = y0>>1,
    kx = x0>>1, and under the half-pixel level-coordinate convention
    this window always contains every level-1 bilinear tap with nonzero
    bounds weight of any point whose level-0 anchor clips to (x0, y0)
    (taps outside the image are killed by the bounds weights).

    Halves the per-point gather count of a two-level pyramid sweep; TPU
    gather cost is per-row with row width nearly free (measured ~40% for
    4x the bytes), so one 2.5 KB row beats two 0.8 KB rows.

    The final two row entries store the anchor (x0, y0) itself: the
    level-1 tap selection derives the patch anchor FROM THE GATHERED ROW
    (not from a recomputed floor), so it can never desynchronize from
    the data the gather fetched (see _pin for why recomputed floors are
    not trustworthy across fusions)."""
    k, m0, c0 = rows_l0.shape
    _, m1, c1 = rows_l1.shape
    h0, w0 = height0, width0
    h1, w1 = h0 // 2, w0 // 2
    if m0 != h0 * w0 or m1 != h1 * w1:
        raise ValueError("level shapes do not match an exact half pyramid")
    img0 = rows_l0.reshape(k, h0, w0, c0)
    p0 = jnp.pad(img0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = []
    for b, a in ((0, 0), (0, 1), (1, 0), (1, 1)):  # slots c00 c10 c01 c11
        parts.append(p0[:, b : b + h0 + 1, a : a + w0 + 1])
    img1 = rows_l1.reshape(k, h1, w1, c1)
    p1 = jnp.pad(img1, ((0, 0), (2, 2), (2, 2), (0, 0)))
    gy = (jnp.arange(h0 + 1) - 1) // 2  # ky per anchor grid row
    gx = (jnp.arange(w0 + 1) - 1) // 2
    for dy in (-1, 0, 1):
        rowsel = jnp.take(p1, gy + dy + 2, axis=1)  # [K, h0+1, w1+4, C1]
        for dx in (-1, 0, 1):
            parts.append(jnp.take(rowsel, gx + dx + 2, axis=2))
    ax = jnp.broadcast_to(
        (jnp.arange(w0 + 1, dtype=rows_l0.dtype) - 1)[None, None, :, None],
        (k, h0 + 1, w0 + 1, 1),
    )
    ay = jnp.broadcast_to(
        (jnp.arange(h0 + 1, dtype=rows_l0.dtype) - 1)[None, :, None, None],
        (k, h0 + 1, w0 + 1, 1),
    )
    parts.extend([ax, ay])
    mega = jnp.concatenate(parts, axis=-1)  # [K, h0+1, w0+1, 4C0+9C1+2]
    return mega.reshape(k * (h0 + 1) * (w0 + 1), -1).T


def mega_gather(
    megaT: jax.Array,  # [4*c0 + 9*c1, K*R] from build_mega01
    x: jax.Array,  # [N] LEVEL-0 coords
    y: jax.Array,
    width0: int,
    height0: int,
    offset=0,  # scalar frame row offset (multiple of R)
):
    """One column gather from the mega table ->
    (rowv [4*c0+9*c1, N], level-0 corner weights (w00, w10, w01, w11),
    xc, yc clipped anchors). Level-0 semantics identical to
    :func:`quad_gather_cols`."""
    x, y = _pin(x, y)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx0 = x0 + 1.0 - x
    wy0 = y0 + 1.0 - y
    wx1 = 1.0 - wx0
    wy1 = 1.0 - wy0
    xi0 = x0.astype(jnp.int32)
    yi0 = y0.astype(jnp.int32)
    dt = megaT.dtype
    bx0 = ((xi0 >= 0) & (xi0 < width0)).astype(dt)
    bx1 = ((xi0 + 1 >= 0) & (xi0 + 1 < width0)).astype(dt)
    by0 = ((yi0 >= 0) & (yi0 < height0)).astype(dt)
    by1 = ((yi0 + 1 >= 0) & (yi0 + 1 < height0)).astype(dt)
    xc = jnp.clip(xi0, -1, width0 - 1)
    yc = jnp.clip(yi0, -1, height0 - 1)
    q = offset + (yc + 1) * (width0 + 1) + (xc + 1)
    rowv = jnp.take(megaT, q, axis=1)
    w00 = wx0 * wy0 * bx0 * by0
    w10 = wx1 * wy0 * bx1 * by0
    w01 = wx0 * wy1 * bx0 * by1
    w11 = wx1 * wy1 * bx1 * by1
    return rowv, (w00, w10, w01, w11), xc, yc


def mega_level1(
    rowv: jax.Array,  # [4*c0 + 9*c1 + 2, N] from mega_gather
    x1: jax.Array,  # [N] LEVEL-1 coords (standard level_coords output)
    y1: jax.Array,
    width1: int,
    height1: int,
    c0: int,
    c1: int,
) -> jax.Array:
    """Exact level-1 bilinear from the gathered 3x3 patch -> [c1, N].

    Selects the 2x2 tap window out of the patch by comparing the
    level-1 floor against the patch anchor (x0>>1, y0>>1) READ FROM THE
    GATHERED ROW's anchor entries — consistent with the fetched patch by
    construction; bit-identical to a separate level-1 quad gather (same
    weights, same combine order)."""
    x1, y1 = _pin(x1, y1)
    x10 = jnp.floor(x1)
    y10 = jnp.floor(y1)
    wx0 = x10 + 1.0 - x1
    wy0 = y10 + 1.0 - y1
    wx1 = 1.0 - wx0
    wy1 = 1.0 - wy0
    xi1 = x10.astype(jnp.int32)
    yi1 = y10.astype(jnp.int32)
    dt = rowv.dtype
    bx0 = ((xi1 >= 0) & (xi1 < width1)).astype(dt)
    bx1 = ((xi1 + 1 >= 0) & (xi1 + 1 < width1)).astype(dt)
    by0 = ((yi1 >= 0) & (yi1 < height1)).astype(dt)
    by1 = ((yi1 + 1 >= 0) & (yi1 + 1 < height1)).astype(dt)
    base = 4 * c0
    anchor = base + 9 * c1
    kx = jnp.floor_divide(rowv[anchor].astype(jnp.int32), 2)
    ky = jnp.floor_divide(rowv[anchor + 1].astype(jnp.int32), 2)
    # patch coordinates of the two x / y taps. When the level-0 and
    # level-1 floors are computed consistently these always lie in
    # [0, 2] (the containment argument, build_mega01); compiler fusion
    # can in principle perturb the floors at knife-edge coordinates, so
    # each tap carries its own in-patch validity — a tap outside the
    # patch has true bilinear weight at the f32-roundoff level and is
    # zeroed rather than silently reading a wrong pixel.
    cxa = xi1 - kx + 1
    cya = yi1 - ky + 1
    vx0 = ((cxa >= 0) & (cxa <= 2)).astype(dt)
    vx1 = ((cxa + 1 >= 0) & (cxa + 1 <= 2)).astype(dt)
    vy0 = ((cya >= 0) & (cya <= 2)).astype(dt)
    vy1 = ((cya + 1 >= 0) & (cya + 1 <= 2)).astype(dt)
    w00 = wx0 * wy0 * bx0 * by0 * vx0 * vy0
    w10 = wx1 * wy0 * bx1 * by0 * vx1 * vy0
    w01 = wx0 * wy1 * bx0 * by1 * vx0 * vy1
    w11 = wx1 * wy1 * bx1 * by1 * vx1 * vy1

    # Fold the tap selection into per-cell weight masks: cell (r, c) of
    # the 3x3 patch accumulates the weights of the corners that land on
    # it. Building the 9 masks costs [N]-lane scalar ops only; the value
    # combine is then 9 [c1, N] multiply-adds (vs 4 for a plain quad) —
    # far cheaper than per-corner 9-way selects on [c1, N] slabs.
    rx0 = (cxa == jnp.arange(3)[:, None]).astype(dt)  # [3, N] tap-x0 row
    rx1 = (cxa + 1 == jnp.arange(3)[:, None]).astype(dt)
    ry0 = (cya == jnp.arange(3)[:, None]).astype(dt)
    ry1 = (cya + 1 == jnp.arange(3)[:, None]).astype(dt)
    out = jnp.zeros((c1, x1.shape[0]), dt)
    for r in range(3):
        for c in range(3):
            m = (
                w00 * (ry0[r] * rx0[c])
                + w10 * (ry0[r] * rx1[c])
                + w01 * (ry1[r] * rx0[c])
                + w11 * (ry1[r] * rx1[c])
            )
            out = out + rowv[
                base + (r * 3 + c) * c1 : base + (r * 3 + c + 1) * c1
            ] * m[None]
    return out


def nearest_flat(
    img_flat: jax.Array,  # [C, total] or [total]
    x: jax.Array,
    y: jax.Array,
    width: int,
    height: int,
    offset: int = 0,
) -> jax.Array:
    """Zero-padding nearest gather (rounding), used for validity masks
    (photometric_factor_kernels.cpp:159-166)."""
    x, y = _pin(x, y)
    xr = jnp.round(x).astype(jnp.int32)
    yr = jnp.round(y).astype(jnp.int32)
    inb = (xr >= 0) & (xr < width) & (yr >= 0) & (yr < height)
    xi = jnp.clip(xr, 0, width - 1)
    yi = jnp.clip(yr, 0, height - 1)
    idx = offset + yi * width + xi
    vals = jnp.take(img_flat, idx, axis=-1)
    return vals * inb.astype(img_flat.dtype)


def valid_locations(mask_flat: jax.Array, width: int, fx, fy, cx, cy):
    """Static-shape variant of GenerateValidLocations (mapping_utils.h:254-287).

    Unlike the reference (which compacts with nonzero()), we keep static
    shapes: returns per-pixel homogeneous coordinates [HW, 3] and the mask;
    callers select pixels with gathers using precomputed index sets.
    """
    n = mask_flat.shape[-1]
    loc1d = jnp.arange(n, dtype=jnp.float32)
    x2d = jnp.mod(loc1d, float(width))
    y2d = jnp.floor(loc1d / float(width))
    homo = jnp.stack(
        [(x2d - cx) / fx, (y2d - cy) / fy, jnp.ones_like(x2d)], axis=-1
    )
    return homo, mask_flat > 0.5


def locations_1d_to_2d(loc1d: jax.Array, width: int):
    """1D pixel index -> (x, y) float pixel coords (kernels' fmod/floor)."""
    loc = loc1d.astype(jnp.float32)
    return jnp.mod(loc, float(width)), jnp.floor(loc / float(width))


def locations_1d_to_homo(loc1d: jax.Array, cam) -> jax.Array:
    """1D pixel index -> homogeneous camera coords [N, 3]
    (mapping_utils.h:279-284)."""
    x2d, y2d = locations_1d_to_2d(loc1d, cam.width)
    return jnp.stack(
        [
            (x2d - cam.cx) / cam.fx,
            (y2d - cam.cy) / cam.fy,
            jnp.ones_like(x2d),
        ],
        axis=-1,
    )
