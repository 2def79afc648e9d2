"""Loopy NumPy transcriptions of the reference CUDA kernel *semantics*.

These are written directly from the behavioral description of
cuda/photometric_factor_kernels.cpp / geometric_factor_kernels.cpp and serve
as the trusted oracle for the vectorized JAX implementations (SURVEY.md §4b).
Slow by design — per-point Python loops, float64.
"""

import numpy as np


def within_bounds(x, y, w, h):
    return 0 <= x < w and 0 <= y < h


def bilinear(img, x, y):
    """img [H, W] or [C, H, W]; zero-padding per-corner."""
    single = img.ndim == 2
    if single:
        img = img[None]
    c, h, w = img.shape
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = x0 + 1, y0 + 1
    wx0, wy0 = x1 - x, y1 - y
    wx1, wy1 = 1 - wx0, 1 - wy0
    out = np.zeros(c)
    for xi, yi, wgt in [
        (x0, y0, wx0 * wy0),
        (x1, y1, wx1 * wy1),
        (x0, y1, wx0 * wy1),
        (x1, y0, wx1 * wy0),
    ]:
        if within_bounds(xi, yi, w, h):
            out += img[:, yi, xi] * wgt
    return out[0] if single else out


def nearest(img, x, y):
    h, w = img.shape
    xi, yi = int(round(x)), int(round(y))
    if within_bounds(xi, yi, w, h):
        return img[yi, xi]
    return 0.0


def level_coord(p, ratio):
    return (p + 0.5) * ratio - 0.5


def photometric_jac_error_ref(
    rot10,
    t10,
    rot0,
    t0,
    rot1,
    t1,
    bias_flat,
    jac_flat,
    code,
    mask1,  # [H, W] full res
    loc1d,
    homo0,  # [N, 3]
    feat0_levels,  # list of [C, H_l, W_l]
    feat1_levels,
    grad1_levels,  # list of [2, C, H_l, W_l]
    cams,  # list of (fx, fy, cx, cy, w, h)
    scale0,
    eps,
    weights,
):
    """Oracle for photometric_jac_error (kernel :33-368 + host :1061-1164)."""
    n = len(loc1d)
    num_levels = len(cams)
    cs = jac_flat.shape[1]
    fs = feat0_levels[0].shape[0]
    dim = 13 + cs
    fx0, fy0, cx0, cy0, w0, h0 = cams[0]

    rows_all = []  # (weight, row[dim])-style accumulation
    diff_all = []
    wgt_all = []
    err_levels = np.zeros(num_levels)
    n_inl = 0.0

    d0 = scale0 * (bias_flat[loc1d] + jac_flat[loc1d] @ code)

    ata = np.zeros((dim, dim))
    atb = np.zeros(dim)
    for lvl in range(num_levels):
        fx, fy, _, _, wl_, hl_ = cams[lvl]
        rxl, ryl = fx / fx0, fy / fy0
        for i in range(n):
            h = homo0[i]
            rh = rot10 @ h
            x1 = d0[i] * rh + t10
            pos = x1[2] > eps

            px0 = h[0] * fx0 + cx0
            py0 = h[1] * fy0 + cy0
            f0 = bilinear(
                feat0_levels[lvl], level_coord(px0, rxl), level_coord(py0, ryl)
            )

            u = x1[0] / x1[2] * fx0 + cx0
            v = x1[1] / x1[2] * fy0 + cy0
            f1 = bilinear(
                feat1_levels[lvl], level_coord(u, rxl), level_coord(v, ryl)
            )
            within = nearest(mask1, u, v)
            g1 = np.zeros((fs, 2))
            if pos:
                gb = bilinear(
                    grad1_levels[lvl].reshape(2 * fs, hl_, wl_),
                    level_coord(u, rxl),
                    level_coord(v, ryl),
                ).reshape(2, fs)
                g1 = within * gb.T  # [fs, 2]

            diff = within * (f0 - f1) if pos else np.zeros(fs)
            err = within * np.sum((f0 - f1) ** 2) if pos else 0.0
            err_levels[lvl] += err
            if lvl == 0:
                n_inl += within if pos else 0.0

            inv_z = 1.0 / x1[2]
            x_z, y_z = x1[0] * inv_z, x1[1] * inv_z
            pj = np.array(
                [
                    [fx * inv_z, 0, -fx * x_z * inv_z],
                    [0, fy * inv_z, -fy * y_z * inv_z],
                ]
            )
            xw = d0[i] * (rot0 @ h) + t0
            jac_p1 = np.zeros((3, 6))
            for r in range(3):
                jac_p1[r, 0] = -rot1[0, r]
                jac_p1[r, 1] = -rot1[1, r]
                jac_p1[r, 2] = -rot1[2, r]
                jac_p1[r, 3] = rot1[1, r] * xw[2] - rot1[2, r] * xw[1]
                jac_p1[r, 4] = -rot1[0, r] * xw[2] + rot1[2, r] * xw[0]
                jac_p1[r, 5] = rot1[0, r] * xw[1] - rot1[1, r] * xw[0]
            temp = np.array(
                [
                    [1, 0, 0, 0, xw[2], -xw[1]],
                    [0, 1, 0, -xw[2], 0, xw[0]],
                    [0, 0, 1, xw[1], -xw[0], 0],
                ]
            )
            jac_p0 = rot1.T @ temp
            j2d_p0 = pj @ jac_p0
            j2d_p1 = pj @ jac_p1

            j2d_dpt = np.array(
                [
                    fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z * inv_z),
                    fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z * inv_z),
                ]
            )
            j2d_code = np.outer(j2d_dpt, scale0 * jac_flat[loc1d[i]])
            j2d_scale = j2d_dpt * d0[i] / scale0

            rows = np.zeros((fs, dim))
            rows[:, 0:6] = g1 @ j2d_p0
            rows[:, 6:12] = g1 @ j2d_p1
            rows[:, 12 : 12 + cs] = g1 @ j2d_code
            rows[:, 12 + cs] = g1 @ j2d_scale

            ata += weights[lvl] * rows.T @ rows
            atb += weights[lvl] * rows.T @ diff

    if n_inl > 0:
        error = float(np.sum(np.asarray(weights) * err_levels) / n_inl)
        return ata / n_inl, atb / n_inl, error, n_inl
    return (
        np.zeros((dim, dim)),
        np.zeros(dim),
        float(np.sum(weights) * 10.0),
        0.0,
    )


def geometric_jac_error_ref(
    rot10,
    t10,
    rot0,
    t0,
    rot1,
    t1,
    bias0_flat,
    jac0_flat,
    code0,
    dpt_map_1,  # [H, W] pre-scaled: scale1 * (bias1 + J1 c1)
    dpt_grad_1,  # [2, H, W] pre-scaled spatial grad
    jac1_hwc,  # [H, W, CS] raw code jacobian of kf1
    mask1,  # [H, W]
    loc1d,
    homo0,
    scale0,
    scale1,
    cam,  # (fx, fy, cx, cy, w, h)
    eps,
    loss_param,
    weight,
):
    """Oracle for the biased geometric kernel
    (geometric_factor_kernels.cpp:474-718 + host reduce)."""
    fx, fy, cx, cy, w, h = cam
    n = len(loc1d)
    cs = jac0_flat.shape[1]
    dim = 14 + 2 * cs
    rows = np.zeros((n, dim))
    diffs = np.zeros(n)
    errs = np.zeros(n)
    valid = np.zeros(n)

    for i in range(n):
        li = loc1d[i]
        d0 = scale0 * (bias0_flat[li] + jac0_flat[li] @ code0)
        hm = homo0[i]
        rh = rot10 @ hm
        x1 = d0 * rh + t10
        pos = x1[2] > eps
        u = x1[0] / x1[2] * fx + cx
        v = x1[1] / x1[2] * fy + cy
        d1 = bilinear(dpt_map_1, u, v)
        g1 = bilinear(dpt_grad_1, u, v)  # [2]
        jac1 = bilinear(np.moveaxis(jac1_hwc, -1, 0), u, v)  # [CS]
        within = nearest(mask1, u, v)
        raw = d1 - x1[2]
        errs[i] = np.log1p((within * raw) ** 2 / loss_param) if pos else 0.0
        valid[i] = within if pos else 0.0
        sqrt_w = within * np.sqrt(1.0 / (raw**2 + loss_param)) if pos else 0.0

        inv_z = 1.0 / x1[2]
        x_z, y_z = x1[0] * inv_z, x1[1] * inv_z
        pj = np.array(
            [
                [fx * inv_z, 0, -fx * x_z * inv_z],
                [0, fy * inv_z, -fy * y_z * inv_z],
            ]
        )
        xw = d0 * (rot0 @ hm) + t0
        temp = np.array(
            [
                [1, 0, 0, 0, xw[2], -xw[1]],
                [0, 1, 0, -xw[2], 0, xw[0]],
                [0, 0, 1, xw[1], -xw[0], 0],
            ]
        )
        jac_p0 = rot1.T @ temp
        jac_p1 = -jac_p0
        j2d_p0 = pj @ jac_p0
        j2d_p1 = pj @ jac_p1
        jpose0 = jac_p0[2] - g1 @ j2d_p0
        jpose1 = jac_p1[2] - g1 @ j2d_p1
        j2d_dpt = np.array(
            [
                fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z * inv_z),
                fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z * inv_z),
            ]
        )
        d1_jac_d0 = g1 @ j2d_dpt
        jcode0 = (rh[2] - d1_jac_d0) * scale0 * jac0_flat[li]
        jcode1 = -scale1 * jac1
        jscale0 = (rh[2] - d1_jac_d0) * d0 / scale0
        jscale1 = -d1 / scale1

        row = np.concatenate(
            [jpose0, jpose1, jcode0, jcode1, [jscale0], [jscale1]]
        )
        rows[i] = sqrt_w * row
        diffs[i] = sqrt_w * raw

    n_inl = float(np.sum(valid))
    if n_inl > 0:
        ata = (weight / n_inl) * rows.T @ rows
        atb = (weight / n_inl) * rows.T @ diffs
        err = (weight / n_inl) * float(np.sum(errs))
        return ata, atb, err, n_inl
    return np.zeros((dim, dim)), np.zeros(dim), weight * 10.0, 0.0


def tracker_photo_jac_error_ref(
    rot,  # [3,3] relative rotation kf->frame
    t,  # [3]
    dpts0,  # [N] scaled source depths
    homo0,  # [N, 3]
    feats0_levels,  # [L, N, C] precomputed source features
    feat1_levels,  # list of [C, H_l, W_l]
    grad1_levels,  # list of [2, C, H_l, W_l]
    mask1,  # [H, W]
    cams,  # list of (fx, fy, cx, cy, w, h)
    eps,
    weights,
    scale0=None,  # -> 7-DoF with-scale variant
):
    """Oracle for the tracker photometric kernels
    (photometric_factor_kernels.cpp:524-873 + host reduce :1166-1325)."""
    n = len(homo0)
    L = len(cams)
    fs = feat1_levels[0].shape[0]
    dim = 6 if scale0 is None else 7
    fx0, fy0, cx0, cy0, w0, h0 = cams[0]
    ata = np.zeros((dim, dim))
    atb = np.zeros(dim)
    err_levels = np.zeros(L)
    n_inl = 0.0
    for lvl in range(L):
        fx, fy, _, _, wl_, hl_ = cams[lvl]
        rxl, ryl = fx / fx0, fy / fy0
        for i in range(n):
            rh = rot @ homo0[i]
            x1 = dpts0[i] * rh + t
            pos = x1[2] > eps
            u = x1[0] / x1[2] * fx0 + cx0
            v = x1[1] / x1[2] * fy0 + cy0
            within = nearest(mask1, u, v)
            f1 = bilinear(
                feat1_levels[lvl], level_coord(u, rxl), level_coord(v, ryl)
            )
            f0 = feats0_levels[lvl][i]
            diff = within * (f0 - f1) if pos else np.zeros(fs)
            err = within * np.sum((f0 - f1) ** 2) if pos else 0.0
            err_levels[lvl] += err
            if lvl == 0:
                n_inl += within if pos else 0.0
            g1 = np.zeros((fs, 2))
            if pos:
                gb = bilinear(
                    grad1_levels[lvl].reshape(2 * fs, hl_, wl_),
                    level_coord(u, rxl),
                    level_coord(v, ryl),
                ).reshape(2, fs)
                g1 = within * gb.T
            inv_z = 1.0 / x1[2]
            pj = np.array(
                [
                    [fx * inv_z, 0, -fx * x1[0] * inv_z**2],
                    [0, fy * inv_z, -fy * x1[1] * inv_z**2],
                ]
            )
            jac_rel = np.array(
                [
                    [1, 0, 0, 0, x1[2], -x1[1]],
                    [0, 1, 0, -x1[2], 0, x1[0]],
                    [0, 0, 1, x1[1], -x1[0], 0],
                ]
            )
            j2d = pj @ jac_rel  # [2, 6]
            if scale0 is not None:
                jdpt = np.array(
                    [
                        fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z**2),
                        fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z**2),
                    ]
                )
                jscale = jdpt * dpts0[i] / scale0
                k_rows = np.concatenate([j2d, jscale[:, None]], axis=1)
            else:
                k_rows = j2d
            rows = g1 @ k_rows  # [fs, dim]
            ata += weights[lvl] * rows.T @ rows
            atb += weights[lvl] * rows.T @ diff
    if n_inl > 0:
        return (
            ata / n_inl,
            atb / n_inl,
            float(np.sum(np.asarray(weights) * err_levels) / n_inl),
            n_inl,
        )
    return np.zeros((dim, dim)), np.zeros(dim), float(np.sum(weights) * 10), 0.0
