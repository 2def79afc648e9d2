"""Training subsystem smoke tests: losses vs torch, one train step."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sage_slam_tpu.geometry.camera import CameraPyramid
from sage_slam_tpu.models import depth_network, feature_network
from sage_slam_tpu.training import dataset, diff_ba, discriminator, losses, train


def test_scale_invariant_depth_loss_matches_torch():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 2, (2, 8, 10)).astype(np.float32)
    pred = rng.uniform(0.5, 2, (2, 8, 10)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 10)) > 0.2).astype(np.float32)
    ours = float(
        losses.scale_invariant_depth_loss(
            jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)
        )
    )
    # torch transcription (DepthLoss.py:4-22)
    tg, tp, tm = (torch.from_numpy(x)[:, None] for x in (gt, pred, mask))
    ratio = torch.log(torch.clamp_min(tm * tp, 1e-3)) - torch.log(
        torch.clamp_min(tm * tg, 1e-3)
    )
    ws = tm.sum(dim=(1, 2, 3))
    l1 = (ratio**2).sum(dim=(1, 2, 3)) / ws
    s2 = ratio.sum(dim=(1, 2, 3))
    ref = float((l1 + s2 * s2 / (ws * ws)).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_basis_decorrelation_loss_range():
    rng = np.random.default_rng(1)
    # identical channels -> zncc = 1 everywhere -> loss 1
    b = np.tile(rng.standard_normal((1, 1, 8, 10)), (1, 4, 1, 1)).astype(np.float32)
    mask = np.ones((1, 1, 8, 10), np.float32)
    l_same = float(losses.basis_decorrelation_loss(jnp.asarray(b), jnp.asarray(mask)))
    assert abs(l_same - 1.0) < 1e-4
    # independent random channels -> much lower
    b2 = rng.standard_normal((1, 4, 32, 40)).astype(np.float32)
    l_ind = float(
        losses.basis_decorrelation_loss(
            jnp.asarray(b2), jnp.asarray(np.ones((1, 1, 32, 40), np.float32))
        )
    )
    assert l_ind < 0.5


def test_rr_loss_decreases_for_matching_descriptors():
    rng = np.random.default_rng(2)
    hw, c = 80, 8
    d0 = rng.standard_normal((hw, c)).astype(np.float32)
    kp = np.array([3, 10, 50])
    gt = np.array([3, 10, 50])
    # identical maps: correct location has max response
    l_good = float(
        losses.rr_loss(jnp.asarray(d0), jnp.asarray(d0), jnp.asarray(kp), jnp.asarray(gt), 10.0)
    )
    gt_bad = np.array([7, 20, 60])
    l_bad = float(
        losses.rr_loss(jnp.asarray(d0), jnp.asarray(d0), jnp.asarray(kp), jnp.asarray(gt_bad), 10.0)
    )
    assert l_good < l_bad


def test_diff_ba_is_differentiable():
    """Gradients of the BA result w.r.t. the learnable params flow."""
    from sage_slam_tpu.geometry.camera import PinholeCamera
    from sage_slam_tpu.geometry.interp import locations_1d_to_homo
    from sage_slam_tpu.ops import geometric, photometric
    from sage_slam_tpu.ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid

    rng = np.random.default_rng(3)
    h, w, cs, fs, L, n = 16, 20, 4, 4, 2, 48
    cam = PinholeCamera(fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    pyr = CameraPyramid.build(cam, L)
    feat = jnp.asarray(rng.standard_normal((fs, h, w)).astype(np.float32) * 0.3)
    mask = jnp.ones((h, w))
    masks = mask_pyramid(mask, L)
    fpyr, gpyr = gaussian_pyramid_with_grad(feat, masks, L)
    bias = jnp.asarray(rng.uniform(0.8, 1.5, h * w).astype(np.float32))
    jac = jnp.asarray((rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32))
    loc = jnp.asarray(rng.choice(h * w, n, replace=False).astype(np.int32))
    homo = locations_1d_to_homo(loc, cam)

    zero = jnp.asarray(0, jnp.int32)
    kf0 = photometric.PhotoKf0(
        loc, homo,
        photometric.sample_source_features(fpyr, loc, pyr),
        zero, zero,
    )
    fr1 = photometric.PhotoFr1(zero)
    photo_shared = photometric.PhotoShared(
        bias, jac, fpyr, gpyr, mask.reshape(-1)
    )
    g0 = geometric.GeoKf0(loc, homo, zero)
    g1 = geometric.GeoKf1(zero)
    geo_shared = geometric.GeoShared(bias, jac, mask.reshape(-1))
    from sage_slam_tpu.geometry.interp import locations_1d_to_2d

    kp = loc[:16]
    mx, my = locations_1d_to_2d(kp, cam.width)
    matches = diff_ba.MatchSet(
        homo0=locations_1d_to_homo(kp, cam),
        bias0=jnp.take(bias, kp),
        jac0=jnp.take(jac, kp, axis=0),
        match_homo1=locations_1d_to_homo(kp, cam),
        # slightly off-depth matches so the MG/reproj residuals (and the
        # grads of their weights) are nonzero
        match_depths=jnp.take(bias, kp) * 1.05,
        matched_2d=jnp.stack([mx + 0.5, my], axis=-1).astype(jnp.float32),
        valid=jnp.ones(16),
    )
    inputs = diff_ba.BAInputs(
        kf0=kf0, fr1=fr1, photo_shared=photo_shared,
        geo_kf0=g0, geo_kf1=g1, geo_shared=geo_shared,
        matches=matches,
        mean_sq_depth=jnp.mean(bias**2),
        init_scale=jnp.asarray(1.0),
    )
    init = diff_ba.BAState(
        tau10=jnp.zeros(6), scale0=jnp.asarray(1.0), code0=jnp.zeros(cs)
    )
    params = diff_ba.BAParams.init(L)

    def loss(p):
        # exercise ALL five terms + the reprojection term through the BA
        final, errs = diff_ba.ba_optimize(
            p, inputs, pyr, init, max_iters=2,
            use_match_geom=True, use_geom=True, use_reproj=True,
        )
        return jnp.sum(final.code0**2) + jnp.sum(final.tau10**2) + errs[-1]

    g = jax.grad(loss)(params)
    flat, _ = jax.tree.flatten(g)
    assert all(np.all(np.isfinite(np.array(x))) for x in flat)
    # the learnable photo power/weight and the match-geom/geometry
    # scalars all receive signal
    gd = g._asdict()
    for name in (
        "photo_weight", "photo_pow_factor", "match_geom_term_weight",
        "geometry_term_weight",
    ):
        assert float(jnp.abs(gd[name]).max()) > 0, name


def test_diff_ba_reduces_error_and_converges():
    """ba_optimize must reduce the objective on a perturbed init and the
    LM convergence flags must not corrupt the state."""
    from sage_slam_tpu.geometry.camera import PinholeCamera
    from sage_slam_tpu.geometry.interp import locations_1d_to_homo
    from sage_slam_tpu.ops import geometric, photometric
    from sage_slam_tpu.ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid

    rng = np.random.default_rng(5)
    h, w, cs, fs, L, n = 16, 20, 4, 4, 2, 64
    cam = PinholeCamera(fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    pyr = CameraPyramid.build(cam, L)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = jnp.asarray(
        np.stack([
            np.sin(0.4 * xx + c) * np.cos(0.3 * yy + c) for c in range(fs)
        ]).astype(np.float32)
    )
    mask = jnp.ones((h, w))
    masks = mask_pyramid(mask, L)
    fpyr, gpyr = gaussian_pyramid_with_grad(feat, masks, L)
    bias = jnp.asarray(np.full(h * w, 1.2, np.float32))
    jac = jnp.asarray((rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32))
    loc = jnp.asarray(rng.choice(h * w, n, replace=False).astype(np.int32))
    homo = locations_1d_to_homo(loc, cam)
    zero = jnp.asarray(0, jnp.int32)
    kf0 = photometric.PhotoKf0(
        loc, homo, photometric.sample_source_features(fpyr, loc, pyr),
        zero, zero,
    )
    inputs = diff_ba.BAInputs(
        kf0=kf0,
        fr1=photometric.PhotoFr1(zero),
        photo_shared=photometric.PhotoShared(
            bias, jac, fpyr, gpyr, mask.reshape(-1)
        ),
        geo_kf0=geometric.GeoKf0(loc, homo, zero),
        geo_kf1=geometric.GeoKf1(zero),
        geo_shared=geometric.GeoShared(bias, jac, mask.reshape(-1)),
        matches=None,
        mean_sq_depth=jnp.mean(bias**2),
        init_scale=jnp.asarray(1.0),
    )
    init = diff_ba.BAState(
        tau10=jnp.asarray([0.02, -0.01, 0.015, 0.005, -0.004, 0.006]),
        scale0=jnp.asarray(1.1),
        code0=jnp.zeros(cs),
    )
    params = diff_ba.BAParams.init(L)
    final, errs = diff_ba.ba_optimize(
        params, inputs, pyr, init, max_iters=8,
        use_match_geom=False, use_geom=True, use_reproj=False,
    )
    errs = np.array(errs)
    assert np.all(np.isfinite(errs))
    assert errs[-1] <= errs[0]
    assert float(jnp.linalg.norm(final.tau10)) < float(
        jnp.linalg.norm(init.tau10)
    )


def test_load_ba_model_from_reference_checkpoint():
    """pretrained/ba_model.pt maps into BAParams (round-2 verdict #6)."""
    import os

    path = "/root/reference/pretrained/ba_model.pt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference checkpoint not present")
    params = diff_ba.load_ba_model(path)
    base = diff_ba.BAParams.init()
    # the six trained scalars are finite and at least one differs from
    # the config default (it was trained for 356 epochs)
    for name in (
        "photo_pow_factor", "photo_weight", "match_geom_param_factor",
        "match_geom_term_weight", "geometry_cauchy_param_factor",
        "geometry_term_weight",
    ):
        assert np.isfinite(float(getattr(params, name))), name
    diffs = [
        abs(float(getattr(params, n)) - float(getattr(base, n)))
        for n in ("photo_pow_factor", "photo_weight")
    ]
    assert max(diffs) > 1e-6


def test_train_driver_with_eval_split(tmp_path):
    """train() runs both curriculum phases over a triplet list with a
    held-out eval split, logs scalars, and checkpoints
    (training.py:254-420, 937)."""
    import json
    import os

    h, w = 16, 20
    cs, fs = 4, 8
    ds = dataset.SyntheticTripletDataset(h, w, num_keypoints=16)
    depth_cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8), bottleneck=8, bias_inner=(8, 1),
        basis_inner=((8, cs),),
    )
    feat_cfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8), bottleneck=8, desc_inner=(8, fs),
        map_inner=(8, fs),
    )
    disc_cfg = discriminator.DiscConfig(
        img_height=h, img_width=w, num_blocks=2, filter_base=4
    )
    cfg = train.TrainConfig(
        pyramid_levels=2, ba_iters=2, num_photo_samples=32,
        separate_train_epoch=1, eval_fraction=0.34,
    )
    triplets = [ds.sample() for _ in range(3)]
    log = os.path.join(tmp_path, "scalars.jsonl")
    ckpt = os.path.join(tmp_path, "ckpt.npz")
    imgdir = os.path.join(tmp_path, "images")
    state, history = train.train(
        triplets, ds.cam, depth_cfg, feat_cfg, disc_cfg, cfg,
        num_epochs=2, checkpoint_path=ckpt, log_path=log,
        image_log_dir=imgdir,
    )
    # image logging (training.py:717-751 display role): depth panels
    # written for the first eval sample each epoch
    pngs = os.listdir(imgdir)
    assert any("pred_depth" in p for p in pngs)
    assert any("gt_depth" in p for p in pngs)
    assert any("depth_err" in p for p in pngs)
    assert state.epoch == 2
    # both phases ran: epoch 0 separate, epoch 1 joint
    assert [hh["joint"] for hh in history] == [False, True]
    # eval metrics logged per epoch and finite
    for hh in history:
        assert np.isfinite(hh["eval"]["loss"])
        assert "depth" in hh["eval"]
    assert "flow" in history[1]["eval"]  # joint phase adds the BA flow
    lines = [json.loads(l) for l in open(log)]
    assert any(r["tag"] == "eval" for r in lines)
    assert any(r["tag"] == "train" for r in lines)
    assert os.path.exists(ckpt)
    # resume restores the epoch counter
    state2, _ = train.train(
        triplets, ds.cam, depth_cfg, feat_cfg, disc_cfg, cfg,
        num_epochs=2, checkpoint_path=ckpt, resume=True,
    )
    assert state2.epoch == 2  # nothing left to do


def test_train_step_runs_both_phases():
    h, w = 16, 20
    cs, fs = 4, 8
    cam_pyr = CameraPyramid.build(
        dataset.SyntheticTripletDataset(h, w).cam, 2
    )
    depth_cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8), bottleneck=8, bias_inner=(8, 1),
        basis_inner=((8, cs),),
    )
    feat_cfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8), bottleneck=8, desc_inner=(8, fs),
        map_inner=(8, fs),
    )
    disc_cfg = discriminator.DiscConfig(
        img_height=h, img_width=w, num_blocks=2, filter_base=4
    )
    cfg = train.TrainConfig(pyramid_levels=2, ba_iters=2, num_photo_samples=32)
    state, tx, disc_tx = train.init_state(
        jax.random.key(0), depth_cfg, feat_cfg, disc_cfg, cfg
    )
    ds = dataset.SyntheticTripletDataset(h, w, num_keypoints=16)
    batch = train.triplet_to_batch(ds.sample(), ds.cam)

    for joint in (False, True):
        step = train.make_train_step(
            cam_pyr, depth_cfg, feat_cfg, disc_cfg, cfg, tx, disc_tx, joint
        )
        state2, loss, aux = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(loss)), (joint, aux)
        assert np.isfinite(float(aux["d_loss"]))
        # params actually changed
        delta = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["depth"], state2.params["depth"],
        )
        flat, _ = jax.tree.flatten(delta)
        assert max(flat) > 0
        state = state2

    # checkpoint roundtrip
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        train.save_checkpoint(path, state)
        restored = train.load_checkpoint(path, state)
        np.testing.assert_allclose(
            np.array(restored.params["log_sigma"]),
            np.array(state.params["log_sigma"]),
        )


def test_export_networks_roundtrip(tmp_path):
    """Training-checkpoint -> per-net runtime export -> reload parity
    (the reference's TorchScript export role, training.py:189-197):
    exported npz files load through load_torch_state_dict and reproduce
    the training-time network outputs exactly."""
    import os

    from sage_slam_tpu.models.partial_unet import load_torch_state_dict
    from sage_slam_tpu.training import export

    h, w = 16, 20
    cs, fs = 4, 8
    depth_cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8), bottleneck=8, bias_inner=(8, 1),
        basis_inner=((8, cs),),
    )
    feat_cfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8), bottleneck=8, desc_inner=(8, fs),
        map_inner=(8, fs),
    )
    disc_cfg = discriminator.DiscConfig(
        img_height=h, img_width=w, num_blocks=2, filter_base=4
    )
    cfg = train.TrainConfig(pyramid_levels=2)
    state, _, _ = train.init_state(
        jax.random.key(7), depth_cfg, feat_cfg, disc_cfg, cfg
    )
    paths = export.export_networks(state, os.path.join(tmp_path, "net"))
    assert set(paths) == {"depth", "feat", "disc", "ba"}

    # fresh params + exported npz == original outputs
    fresh = depth_network.init_params(jax.random.key(99), depth_cfg)
    loaded = load_torch_state_dict(fresh, dict(np.load(paths["depth"])))
    img = jnp.asarray(
        np.random.default_rng(0).random((3, 2 * h, 2 * w)), jnp.float32
    )
    mask = jnp.ones((1, 2 * h, 2 * w))
    b0, j0 = depth_network.apply(state.params["depth"], img, mask, depth_cfg)
    b1, j1 = depth_network.apply(loaded, img, mask, depth_cfg)
    np.testing.assert_array_equal(np.array(b0), np.array(b1))
    np.testing.assert_array_equal(np.array(j0), np.array(j1))

    # BA weights roundtrip
    ba2 = export.load_ba_params(paths["ba"], state.params["ba"])
    for name in state.params["ba"]._fields:
        np.testing.assert_array_equal(
            np.array(getattr(ba2, name)),
            np.array(getattr(state.params["ba"], name)),
        )


def test_bwd_clip_identity_forward_bounded_backward():
    """diff_ba._bwd_clip: identity forward; cotangent norm clipped on
    the backward pass (the joint-phase LM-unroll stabilizer)."""
    x = jnp.asarray([3.0, 4.0])

    # forward identity
    np.testing.assert_allclose(
        np.array(diff_ba._bwd_clip(x, 1.0)), np.array(x)
    )

    # backward: d/dx sum(100 * clip(x)) has norm <= max_norm
    g = jax.grad(lambda v: jnp.sum(100.0 * diff_ba._bwd_clip(v, 1.0)))(x)
    assert float(jnp.linalg.norm(g)) <= 1.0 + 1e-5
    # disabled (max_norm=0): gradient passes through untouched
    g0 = jax.grad(lambda v: jnp.sum(100.0 * diff_ba._bwd_clip(v, 0.0)))(x)
    np.testing.assert_allclose(np.array(g0), 100.0 * np.ones(2), rtol=1e-6)


def test_ba_optimize_bwd_clip_forward_unchanged():
    """bwd_clip must not change the BA FORWARD result (only grads)."""
    from sage_slam_tpu.geometry.camera import PinholeCamera
    from sage_slam_tpu.geometry.interp import locations_1d_to_homo
    from sage_slam_tpu.ops import geometric, photometric
    from sage_slam_tpu.ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid

    rng = np.random.default_rng(5)
    h, w, cs, fs, L, n = 16, 20, 4, 4, 2, 32
    cam = PinholeCamera(fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5,
                        cy=h / 2 - 0.5, width=w, height=h)
    pyr = CameraPyramid.build(cam, L)
    feat = jnp.asarray(rng.standard_normal((fs, h, w)).astype(np.float32) * 0.3)
    mask = jnp.ones((h, w))
    fpyr, gpyr = gaussian_pyramid_with_grad(feat, mask_pyramid(mask, L), L)
    bias = jnp.asarray(rng.uniform(0.8, 1.5, h * w).astype(np.float32))
    jac = jnp.asarray((rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32))
    loc = jnp.asarray(rng.choice(h * w, n, replace=False).astype(np.int32))
    zero = jnp.asarray(0, jnp.int32)
    kf0 = photometric.PhotoKf0(
        loc, locations_1d_to_homo(loc, cam),
        photometric.sample_source_features(fpyr, loc, pyr), zero, zero,
    )
    inputs = diff_ba.BAInputs(
        kf0=kf0, fr1=photometric.PhotoFr1(zero),
        photo_shared=photometric.PhotoShared(bias, jac, fpyr, gpyr,
                                             mask.reshape(-1)),
        geo_kf0=geometric.GeoKf0(loc, locations_1d_to_homo(loc, cam), zero),
        geo_kf1=geometric.GeoKf1(zero),
        geo_shared=geometric.GeoShared(bias, jac, mask.reshape(-1)),
        matches=None,
        mean_sq_depth=jnp.mean(bias**2),
        init_scale=jnp.asarray(1.0),
    )
    init = diff_ba.BAState(
        tau10=jnp.full(6, 0.01), scale0=jnp.asarray(1.0), code0=jnp.zeros(cs)
    )
    params = diff_ba.BAParams.init(L)
    a, ea = diff_ba.ba_optimize(params, inputs, pyr, init, max_iters=2,
                                use_match_geom=False, use_geom=True)
    b, eb = diff_ba.ba_optimize(params, inputs, pyr, init, max_iters=2,
                                use_match_geom=False, use_geom=True,
                                bwd_clip=0.5)
    np.testing.assert_allclose(np.array(a.tau10), np.array(b.tau10), atol=1e-7)
    np.testing.assert_allclose(np.array(ea), np.array(eb), atol=1e-6)
