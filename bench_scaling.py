"""Multi-device scaling benchmark — factors/s vs mesh size.

Runs the edge-partitioned global BA (parallel/sharded_ba.py) on meshes of
1, 2, 4, 8 devices and reports throughput + scaling efficiency
(BASELINE.json: >=80% efficiency target 1 host -> 4 hosts). On a machine
with one real TPU chip, run with a forced CPU host platform to validate
the scaling *structure* (NOTE: virtual CPU devices share one physical
core pool, so throughput stays flat with mesh size there — only real
multi-chip hardware shows the speedup; expect near-flat factors/s and
1/n "efficiency" on the CPU mesh):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python bench_scaling.py

Prints one JSON line per mesh size.
"""

import json
import sys
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU host platform (this environment's site hook "
        "overrides the JAX_PLATFORMS env var, so the env-var recipe in "
        "the docstring does not work here; --cpu forces it in-process)",
    )
    ap_args = ap.parse_args()

    import jax

    if ap_args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    sys.path.insert(0, ".")
    from sage_slam_tpu.config import MapperConfig
    from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
    from sage_slam_tpu.geometry.interp import locations_1d_to_homo
    from sage_slam_tpu.geometry.se3 import SE3, se3_exp
    from sage_slam_tpu.ops.photometric import sample_source_features
    from sage_slam_tpu.ops.pyramid import (
        gaussian_pyramid_with_grad,
        mask_pyramid,
    )
    from sage_slam_tpu.parallel import sharded_ba
    from sage_slam_tpu.solver import ba
    from sage_slam_tpu.solver.graph import Variables

    n_dev_all = len(jax.devices())
    k, h, w, cs, fs, levels, n = 8, 64, 80, 16, 16, 4, 1024
    edges_per_type = 64

    rng = np.random.default_rng(0)
    cam = PinholeCamera(
        fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
        width=w, height=h,
    )
    pyr = CameraPyramid.build(cam, levels)
    feat = rng.standard_normal((fs, h, w)).astype(np.float32) * 0.3
    mask = np.ones((h, w), np.float32)
    masks = mask_pyramid(jnp.asarray(mask), levels)
    fpyr, gpyr = gaussian_pyramid_with_grad(jnp.asarray(feat), masks, levels)
    bias = np.full(h * w, 1.2, np.float32)
    jac = (rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32)
    loc1d = rng.choice(h * w, size=n, replace=False).astype(np.int32)
    homo = np.array(locations_1d_to_homo(jnp.asarray(loc1d), cam))
    srcf = sample_source_features(fpyr, jnp.asarray(loc1d), pyr)

    window = ba.WindowData(
        loc1d=jnp.tile(jnp.asarray(loc1d)[None], (k, 1)),
        homo=jnp.tile(jnp.asarray(homo, jnp.float32)[None], (k, 1, 1)),
        bias_flat=jnp.tile(jnp.asarray(bias)[None], (k, 1)),
        jac_flat=jnp.tile(jnp.asarray(jac)[None], (k, 1, 1)),
        feat_pyr=jnp.tile(fpyr[:, None], (1, k, 1)),
        grad_pyr=jnp.tile(gpyr[:, :, None], (1, 1, k, 1)),
        src_feats=jnp.tile(srcf[None], (k, 1, 1, 1)),
        avg_sq_bias=jnp.full((k,), float(np.mean(bias**2))),
        mask_flat=jnp.asarray(mask.reshape(-1)),
    )
    i0 = np.arange(edges_per_type) % k
    i1 = (i0 + 1 + (np.arange(edges_per_type) // k)) % k
    edges = ba.EdgeTable(
        jnp.asarray(i0, jnp.int32), jnp.asarray(i1, jnp.int32),
        jnp.ones(edges_per_type),
    )
    priors = ba.PriorTable(
        code_valid=jnp.ones(k),
        scale_valid=jnp.zeros(k).at[0].set(1.0),
        scale_init=jnp.ones(k),
        pose_valid=jnp.zeros(k).at[0].set(1.0),
        pose_target=SE3.identity((k,)),
    )
    problem = ba.BAProblem(window, edges, edges, priors)
    taus = (rng.standard_normal((k, 6)) * 0.01).astype(np.float32)
    variables = Variables(
        se3_exp(jnp.asarray(taus)), jnp.zeros((k, cs)), jnp.ones(k)
    )
    cfg = MapperConfig()
    update_mask = jnp.ones(k)
    total_factors = 2 * edges_per_type

    base_rate = None
    for n_dev in [1, 2, 4, 8]:
        if n_dev > n_dev_all:
            break
        mesh = Mesh(np.array(jax.devices()[:n_dev]), (sharded_ba.AXIS,))
        sharded = sharded_ba.shard_problem(problem, mesh)

        def step(v):
            return sharded_ba.sharded_run_ba(
                v, sharded, pyr, cfg, update_mask, mesh, max_iters=1
            )

        out = step(variables)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            out = step(variables)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        rate = total_factors / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        print(
            json.dumps(
                {
                    "metric": "factors_per_second_sharded_ba",
                    "devices": n_dev,
                    "value": round(rate, 2),
                    "unit": "factors/s",
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )


def growth_curve():
    """Per-step mapping cost vs keyframe count (round-2 verdict #3).

    The windowed mapping step linearizes only edges incident to the
    sliding window, so per-step wall time must stay near-flat as the
    graph grows from 8 to 128 keyframes with loop links — the role
    ISAM2's incremental Bayes tree plays in the reference. Prints one
    JSON line per size with windowed vs full-graph step time.
    """
    import time

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sage_slam_tpu.config import MapperConfig
    from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
    from sage_slam_tpu.geometry.interp import locations_1d_to_homo
    from sage_slam_tpu.geometry.se3 import SE3, se3_exp
    from sage_slam_tpu.ops.photometric import sample_source_features
    from sage_slam_tpu.ops.pyramid import (
        gaussian_pyramid_with_grad,
        mask_pyramid,
    )
    from sage_slam_tpu.solver import ba
    from sage_slam_tpu.solver.graph import Variables

    h, w, cs, fs, levels, n = 64, 80, 16, 16, 4, 1024
    window_size = 8
    rng = np.random.default_rng(0)
    cam = PinholeCamera(
        fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
        width=w, height=h,
    )
    pyr = CameraPyramid.build(cam, levels)
    feat = rng.standard_normal((fs, h, w)).astype(np.float32) * 0.3
    mask = np.ones((h, w), np.float32)
    masks = mask_pyramid(jnp.asarray(mask), levels)
    fpyr, gpyr = gaussian_pyramid_with_grad(jnp.asarray(feat), masks, levels)
    bias = np.full(h * w, 1.2, np.float32)
    jac = (rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32)
    loc1d = rng.choice(h * w, size=n, replace=False).astype(np.int32)
    homo = np.array(locations_1d_to_homo(jnp.asarray(loc1d), cam))
    srcf = sample_source_features(fpyr, jnp.asarray(loc1d), pyr)
    cfg = MapperConfig()

    results = []
    for k in [8, 16, 32, 64, 128]:
        window = ba.WindowData(
            loc1d=jnp.tile(jnp.asarray(loc1d)[None], (k, 1)),
            homo=jnp.tile(jnp.asarray(homo, jnp.float32)[None], (k, 1, 1)),
            bias_flat=jnp.tile(jnp.asarray(bias)[None], (k, 1)),
            jac_flat=jnp.tile(jnp.asarray(jac)[None], (k, 1, 1)),
            feat_pyr=jnp.tile(fpyr[:, None], (1, k, 1)),
            grad_pyr=jnp.tile(gpyr[:, :, None], (1, 1, k, 1)),
            src_feats=jnp.tile(srcf[None], (k, 1, 1, 1)),
            avg_sq_bias=jnp.full((k,), float(np.mean(bias**2))),
            mask_flat=jnp.asarray(mask.reshape(-1)),
        )
        # temporal chain both directions + a loop link every 8 keyframes
        pairs = []
        for a in range(k - 1):
            pairs += [(a, a + 1), (a + 1, a)]
        for a in range(0, k - 8, 8):
            pairs += [(a, k - 1), (k - 1, a)]
        lo = k - window_size
        win_pairs = [p for p in pairs if p[0] >= lo or p[1] >= lo]

        def table(ps):
            return ba.EdgeTable(
                jnp.asarray([p[0] for p in ps], jnp.int32),
                jnp.asarray([p[1] for p in ps], jnp.int32),
                jnp.ones(len(ps)),
            )

        priors = ba.PriorTable(
            code_valid=jnp.ones(k),
            scale_valid=jnp.zeros(k).at[0].set(1.0),
            scale_init=jnp.ones(k),
            pose_valid=jnp.zeros(k).at[0].set(1.0),
            pose_target=SE3.identity((k,)),
        )
        taus = (rng.standard_normal((k, 6)) * 0.01).astype(np.float32)
        variables = Variables(
            se3_exp(jnp.asarray(taus)), jnp.zeros((k, cs)), jnp.ones(k)
        )
        umask = jnp.zeros(k).at[lo:].set(1.0)

        row = {"metric": "mapping_step_ms", "keyframes": k}
        for name, ps in [("windowed", win_pairs), ("full", pairs)]:
            problem = ba.BAProblem(window, table(ps), table(ps), priors)
            step = jax.jit(
                lambda v, p=problem: ba.run_ba(
                    v, p, pyr, cfg, umask, max_iters=1
                )
            )
            out = step(variables)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(5):
                out = step(variables)
            jax.block_until_ready(out)
            row[name] = round((time.time() - t0) / 5 * 1000, 2)
            row[f"{name}_edges"] = 2 * len(ps)

        # compact windowed step (round-3 verdict #2 / Mapper.mapping_step
        # production path): solve + tables sized by the window-INCIDENT
        # keyframe set, not the whole map — near-flat cost vs k
        ids = sorted(
            set(range(lo, k))
            | {a for p in win_pairs for a in p}
        )
        kc = len(ids)
        kc_pad = kc  # exact size; production buckets geometrically
        id_map = {kf: c for c, kf in enumerate(ids)}
        cpairs = [(id_map[a], id_map[b]) for a, b in win_pairs]
        problem = ba.BAProblem(window, table(cpairs), table(cpairs), priors)
        problem = ba.prepare_problem(problem, pyr)
        ids_arr = jnp.asarray(np.asarray(ids, np.int32))
        pvalid = jnp.ones(kc_pad)
        umask_c = jnp.asarray(
            np.array([1.0 if kf >= lo else 0.0 for kf in ids], np.float32)
        )

        def cstep(v, p=problem, ids_=ids_arr, pv=pvalid, um=umask_c):
            compact = ba.compact_problem_keyframes(p, ids_, pv, pyr)
            v_c = jax.tree.map(lambda x: x[ids_], v)
            return ba.run_ba(v_c, compact, pyr, cfg, um, max_iters=1)

        cstep_j = jax.jit(cstep)
        out = cstep_j(variables)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(5):
            out = cstep_j(variables)
        jax.block_until_ready(out)
        row["compact"] = round((time.time() - t0) / 5 * 1000, 2)
        row["compact_keyframes"] = kc
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
    growth_curve()
