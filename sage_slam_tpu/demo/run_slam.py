"""SLAM demo CLI — the df_demo equivalent (demo/main.cpp + live_demo.cpp).

Usage:
  python -m sage_slam_tpu.demo.run_slam --source_url synthetic:// \\
      --run_log_dir /tmp/slam_run [--config config.json] [--max_frames N]

Loads networks from npz checkpoints when provided, runs the threaded
driver over the dataset, writes the TUM trajectory + per-keyframe depth
maps + a headless visualization (SaveResults / SaveKeyframes,
deepfactors.cpp:1926-1985).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    # crash diagnostics with native backtraces (the reference
    # installs SIGSEGV/SIGABRT handlers, demo/main.cpp:34-124)
    import faulthandler

    faulthandler.enable()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_url", default="synthetic://")
    p.add_argument("--config", default=None, help="SlamConfig json")
    p.add_argument("--depth_checkpoint", default=None)
    p.add_argument("--feat_checkpoint", default=None)
    p.add_argument(
        "--net_config",
        default=None,
        help="netcfg.json sidecar from training.export.export_networks "
        "(network architectures; defaults to the reference sizes)",
    )
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--run_log_dir", default="/tmp/sage_slam_run")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--skip_frames", type=int, default=0)
    p.add_argument("--enable_timing", action="store_true")
    p.add_argument(
        "--v", type=int, default=0,
        help="verbosity (glog --v analog): >=1 enables sage_slam DEBUG "
        "logging of loop-closure gate decisions",
    )
    p.add_argument("--no_threads", action="store_true")
    p.add_argument("--save_keyframes", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import SlamConfig
    from ..frontend.driver import SlamDriver
    from ..frontend.slam import SlamSystem
    from ..io import dataset, tum_io
    from ..models import depth_network, feature_network
    from ..utils import timing

    os.makedirs(args.run_log_dir, exist_ok=True)
    timing.enable(args.enable_timing)
    if args.v >= 1:
        import logging

        lg = logging.getLogger("sage_slam")
        lg.setLevel(logging.DEBUG)
        if not lg.handlers:  # repeated main() calls must not duplicate
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
            lg.addHandler(h)

    cfg = (
        SlamConfig.from_json(args.config) if args.config else SlamConfig()
    )
    # snapshot the config like the reference's flags snapshot
    cfg.to_json(os.path.join(args.run_log_dir, "config.json"))

    if args.source_url.startswith("synthetic://"):
        data = dataset.SyntheticInterface(
            num_frames=args.max_frames or 20,
            height=cfg.net_input_size[0],
            width=cfg.net_input_size[1],
        )
    elif args.source_url.startswith("bowl3d://"):
        # query params map onto Bowl3DInterface kwargs (from_url);
        # defaults follow the CLI frame limit + net input size
        data = dataset.from_url(
            args.source_url,
            num_frames=args.max_frames or 20,
            height=cfg.net_input_size[0],
            width=cfg.net_input_size[1],
        )
    else:
        data = dataset.from_url(args.source_url)
    in_cam = data.intrinsics()
    h_out, w_out = cfg.net_output_size
    out_cam = in_cam.resized(w_out, h_out)

    depth_cfg = depth_network.DepthNetConfig(
        basis_inner=((128, 128, cfg.code_size),)
    )
    feat_cfg = feature_network.FeatureNetConfig()
    if args.net_config:
        from ..training.export import load_net_configs

        d_cfg, f_cfg = load_net_configs(args.net_config)
        depth_cfg = d_cfg or depth_cfg
        feat_cfg = f_cfg or feat_cfg
    key = jax.random.key(0)
    depth_params = depth_network.init_params(key, depth_cfg)
    feat_params = feature_network.init_params(key, feat_cfg)
    if args.depth_checkpoint:
        from ..models.partial_unet import load_torch_state_dict

        sd = dict(np.load(args.depth_checkpoint))
        depth_params = load_torch_state_dict(depth_params, sd)
    if args.feat_checkpoint:
        from ..models.partial_unet import load_torch_state_dict

        sd = dict(np.load(args.feat_checkpoint))
        feat_params = load_torch_state_dict(feat_params, sd)

    voc = None
    if args.vocab_path:
        if args.vocab_path.endswith(".npz"):
            from .voc_builder import load_npz_vocabulary

            voc = load_npz_vocabulary(args.vocab_path)
        else:
            from ..loop import vocabulary

            voc = vocabulary.load_dbow2_yaml(args.vocab_path)

    # resize mask to output resolution (nearest)
    mask_full = data.mask()
    ys = (np.arange(h_out) * mask_full.shape[0] / h_out).astype(int)
    xs = (np.arange(w_out) * mask_full.shape[1] / w_out).astype(int)
    mask_out = jnp.asarray(mask_full[np.ix_(ys, xs)])
    # input-res mask fed to the partial-conv networks (the reference's
    # fine_video_mask, training.py:485-521)
    h_in, w_in = cfg.net_input_size
    ys_in = (np.arange(h_in) * mask_full.shape[0] / h_in).astype(int)
    xs_in = (np.arange(w_in) * mask_full.shape[1] / w_in).astype(int)
    mask_in = jnp.asarray(mask_full[np.ix_(ys_in, xs_in)])

    system = SlamSystem(
        cfg, out_cam, mask_out, depth_params, feat_params, voc=voc,
        depth_cfg=depth_cfg, feat_cfg=feat_cfg, video_mask_in=mask_in,
    )
    driver = SlamDriver(system, use_native_threads=not args.no_threads)

    t0 = time.time()
    results = driver.run(data, max_frames=args.max_frames)
    dt = time.time() - t0
    n = len(results) + 1

    # trajectory.txt carries the FINALIZED frame poses (re-expressed
    # from the final BA'd keyframes — deepfactors.cpp:1591/:2005 role);
    # the raw as-tracked poses are kept alongside for drift diagnostics
    tum_io.write_tum(
        os.path.join(args.run_log_dir, "trajectory.txt"),
        system.finalized_trajectory(),
    )
    tum_io.write_tum(
        os.path.join(args.run_log_dir, "trajectory_tracked.txt"),
        system.trajectory,
    )
    tum_io.write_tum(
        os.path.join(args.run_log_dir, "keyframe_trajectory.txt"),
        system.keyframe_trajectory(),
    )
    if args.save_keyframes:
        for i in range(system.store.num_active):
            np.save(
                os.path.join(args.run_log_dir, f"kf_{i:04d}_depth.npy"),
                np.array(system.store.depth_map(i)).reshape(h_out, w_out),
            )
    # headless visualization (S13 equivalent)
    try:
        from ..viz.visualizer import render_map_png

        render_map_png(
            system, os.path.join(args.run_log_dir, "map.png")
        )
    except Exception as e:  # viz is best-effort
        print(f"visualization skipped: {e}")

    summary = dict(
        frames=n,
        keyframes=system.store.num_active,
        fps=round(n / dt, 3),
        wall_time_s=round(dt, 2),
        backend=jax.default_backend(),
        # RefineMapping LM iterations until relinearization convergence
        # (live_demo.cpp:252-257 loop count analog)
        refine_iterations=getattr(system, "refine_iterations", 0),
        global_loops=len(system.store.global_loop_links),
    )
    with open(os.path.join(args.run_log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if args.enable_timing:
        print(timing.report())
    return summary


if __name__ == "__main__":
    main()
