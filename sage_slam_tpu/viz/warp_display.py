"""Warp-overlay debug rendering (DisplaySE3Warp equivalent,
mapping_utils.h:750-794 + checkerboard blending).

Warps a keyframe's content into another frame with the current relative
pose and renders source / warped / target side by side — the reference's
primary visual debugging tool for alignment quality.
"""

from __future__ import annotations

import numpy as np


def se3_warp_image(
    img1_flat,  # [C, HW] target frame content
    depth0_flat,  # [HW] keyframe depth
    mask_flat,  # [HW]
    rot10,
    t10,
    cam,
    eps: float = 1e-6,
):
    """Backward-warp frame-1 content onto frame-0 pixels
    (SE3ImageWarping): returns ([C, H, W] warped, [H, W] validity)."""
    import jax.numpy as jnp

    from ..geometry import interp

    hw = depth0_flat.shape[0]
    loc = jnp.arange(hw, dtype=jnp.int32)
    homo = interp.locations_1d_to_homo(loc, cam)
    x1 = depth0_flat[:, None] * (homo @ jnp.asarray(rot10).T) + jnp.asarray(t10)
    pos = (x1[:, 2] > eps).astype(img1_flat.dtype)
    u = x1[:, 0] / jnp.maximum(x1[:, 2], eps) * cam.fx + cam.cx
    v = x1[:, 1] / jnp.maximum(x1[:, 2], eps) * cam.fy + cam.cy
    sampled = interp.bilinear_flat(img1_flat, u, v, cam.width, cam.height)
    valid = interp.nearest_flat(mask_flat, u, v, cam.width, cam.height) * pos
    c = img1_flat.shape[0]
    return (
        np.array(sampled * mask_flat[None] ).reshape(c, cam.height, cam.width),
        np.array(valid).reshape(cam.height, cam.width),
    )


def checkerboard(h: int, w: int, grid: int = 7) -> np.ndarray:
    """The reference's blending checkerboard (GenerateCheckerboard)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((ys * grid // h) + (xs * grid // w)) % 2).astype(np.float32)


def render_warp_png(system, kf_id: int, fr_data, rot10, t10, path: str):
    """Side-by-side: keyframe features | checkerboard warp blend | frame."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    cam = system.cam
    kf_feat = np.array(system.store.row("feat_pyr", kf_id))[
        :3, : cam.height * cam.width
    ].reshape(3, cam.height, cam.width)
    fr_feat = np.array(fr_data.feat_pyr)[:3, : cam.height * cam.width].reshape(
        3, cam.height, cam.width
    )
    depth0 = system.store.depth_map(kf_id)
    warped, valid = se3_warp_image(
        jnp.asarray(fr_feat.reshape(3, -1)),
        depth0,
        system.mapper.mask_flat,
        rot10,
        t10,
        cam,
    )
    cb = checkerboard(cam.height, cam.width)
    blend = np.where(cb[None] > 0.5, warped, kf_feat)

    def norm(x):
        lo, hi = x.min(), x.max()
        return (x - lo) / max(hi - lo, 1e-8)

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, title in zip(
        axes,
        [kf_feat, blend, fr_feat],
        ["keyframe", "checkerboard warp", "frame"],
    ):
        ax.imshow(norm(img).transpose(1, 2, 0))
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
