"""Keyframe store's incrementally-built sampling tables must equal the
batch tables prepare_problem builds over the whole window."""

import numpy as np
import jax
import jax.numpy as jnp

from sage_slam_tpu.config import SlamConfig
from sage_slam_tpu.frontend.slam import SlamSystem
from sage_slam_tpu.io import dataset
from sage_slam_tpu.models import depth_network, feature_network
from sage_slam_tpu.solver import ba


def _make_slam(num_frames=4):
    cfg = SlamConfig()
    src = dataset.SyntheticInterface(
        num_frames=num_frames,
        height=cfg.net_input_size[0],
        width=cfg.net_input_size[1],
        motion_scale=0.03,
    )
    key = jax.random.key(0)
    depth_cfg = depth_network.DepthNetConfig(
        basis_inner=((128, 128, cfg.code_size),)
    )
    feat_cfg = feature_network.FeatureNetConfig()
    dp = depth_network.init_params(key, depth_cfg)
    fp = feature_network.init_params(key, feat_cfg)
    cam_in = src.intrinsics()
    h_out, w_out = cfg.net_output_size
    out_cam = cam_in.resized(w_out, h_out)
    mask = jnp.asarray(np.ones((h_out, w_out), np.float32))
    slam = SlamSystem(cfg, out_cam, mask, dp, fp)
    return slam, src


def test_incremental_tables_match_batch_build():
    slam, src = _make_slam()
    frames = list(src.frames())
    slam.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for fr in frames[1:]:
        slam.process_frame(fr.timestamp, jnp.asarray(fr.image))
        slam.mapper.mapping_step()
    store = slam.store
    assert store.num_active >= 2
    assert store.packed_fg is not None

    # batch rebuild over the full window from the raw pyramids
    problem = slam.mapper.build_problem()
    stripped = problem._replace(
        window=problem.window._replace(
            packed_fg=None, packed_feat=None, bias_at=None, jac_at=None,
            dense_fg=(), dense_feat=(),
        )
    )
    batch = ba.prepare_problem(stripped, slam.mapper.cam_pyr).window
    inc = problem.window

    na = store.num_active
    tq = slam.mapper.cam_pyr.total_quad_rows
    np.testing.assert_array_equal(
        np.asarray(inc.packed_fg[:, : na * tq]),
        np.asarray(batch.packed_fg[:, : na * tq]),
    )
    np.testing.assert_array_equal(
        np.asarray(inc.packed_feat[:, : na * tq]),
        np.asarray(batch.packed_feat[:, : na * tq]),
    )
    np.testing.assert_array_equal(
        np.asarray(inc.bias_at[:na]), np.asarray(batch.bias_at[:na])
    )
    np.testing.assert_array_equal(
        np.asarray(inc.jac_at[:na]), np.asarray(batch.jac_at[:na])
    )
    for a, b in zip(inc.dense_fg, batch.dense_fg):
        np.testing.assert_array_equal(np.asarray(a[:na]), np.asarray(b[:na]))
    for a, b in zip(inc.dense_feat, batch.dense_feat):
        np.testing.assert_array_equal(np.asarray(a[:na]), np.asarray(b[:na]))
