"""Keyframe-sharded mapping step — the HBM-scaling multi-chip design.

parallel/sharded_ba.py shards the EDGE tables but replicates the window
(keyframe) tables on every device; fine while the window fits HBM, but
per-device memory then does not scale down with the mesh (round-3
verdict #5). This module shards the KEYFRAME axis of the store's big
tables block-wise across the mesh and reassembles, per mapping step,
ONLY the window-incident rows (the compact id set of
solver/ba.compact_problem_keyframes) with one boundary exchange:

  each device contributes the incident rows it owns (zeros elsewhere)
  and a psum over ICI sums the contributions -> the replicated compact
  window. Communication per step is proportional to the INCIDENT set
  (window + its edge endpoints), never to the map size — the
  halo-exchange role ring-attention plays for sequence length
  (SURVEY.md §5.7, §2.4 row 4; BASELINE.json north star). The LM loop
  then runs edge-sharded exactly like sharded_ba (psum of (H, b)).

Per-device HBM for the store tables is K/n of the replicated design;
`store_bytes_per_device` quantifies it and tests/test_sharded_store.py
checks the actual addressable shard sizes on a CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import CameraPyramid
from ..solver import ba, graph
from ..solver.graph import Variables
from . import sharded_ba

AXIS = sharded_ba.AXIS

# WindowData fields and the axis their keyframe dimension lives on.
_KF_AXIS = {
    "loc1d": 0,
    "homo": 0,
    "bias_flat": 0,
    "jac_flat": 0,
    "feat_pyr": 1,
    "grad_pyr": 2,
    "src_feats": 0,
    "avg_sq_bias": 0,
    "bias_at": 0,
    "jac_at": 0,
}
# packed tables are [cw, K*Tq]: reshaped to [cw, K, Tq] for sharding.


def _pad_rows(x, axis, target):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad)


def shard_window(window: ba.WindowData, mesh: Mesh) -> ba.WindowData:
    """Block-shard every per-keyframe table over the mesh axis (the
    keyframe capacity is padded up to a multiple of the mesh size).
    packed_fg/packed_feat are reshaped to [cw, K, Tq] so their keyframe
    axis is shardable; dense tables shard on their leading axis."""
    n = mesh.shape[AXIS]
    k = window.bias_flat.shape[0]
    kp = -(-k // n) * n

    def spec(axis, ndim):
        parts = [None] * ndim
        parts[axis] = AXIS
        return NamedSharding(mesh, P(*parts))

    updates = {}
    for name, axis in _KF_AXIS.items():
        val = getattr(window, name)
        if val is None:
            continue
        val = _pad_rows(val, axis, kp)
        updates[name] = jax.device_put(val, spec(axis, val.ndim))
    for name in ("packed_fg", "packed_feat"):
        val = getattr(window, name)
        if val is None:
            continue
        cw = val.shape[0]
        val = val.reshape(cw, k, -1)
        val = _pad_rows(val, 1, kp)
        updates[name] = jax.device_put(val, spec(1, 3))
    updates["dense_fg"] = tuple(
        jax.device_put(_pad_rows(d, 0, kp), spec(0, d.ndim))
        for d in window.dense_fg
    )
    updates["dense_feat"] = tuple(
        jax.device_put(_pad_rows(d, 0, kp), spec(0, d.ndim))
        for d in window.dense_feat
    )
    updates["mask_flat"] = jax.device_put(
        window.mask_flat, NamedSharding(mesh, P())
    )
    updates["mega_fg"] = None
    updates["mega_feat"] = None
    return window._replace(**updates)


def store_bytes_per_device(window: ba.WindowData, n_devices: int) -> dict:
    """Replicated vs keyframe-sharded per-device bytes of the window
    tables (the store's HBM footprint)."""
    total = 0
    for name in list(_KF_AXIS) + ["packed_fg", "packed_feat"]:
        val = getattr(window, name)
        if val is not None:
            total += val.size * val.dtype.itemsize
    for d in tuple(window.dense_fg) + tuple(window.dense_feat):
        total += d.size * d.dtype.itemsize
    return {
        "replicated_bytes": total,
        "sharded_bytes_per_device": -(-total // n_devices),
    }


def _gather_rows(local, ids, axis, kloc, me, dtype):
    """Boundary exchange: reassemble rows ``ids`` of a block-sharded
    table — each device contributes its owned rows, psum sums them.
    Traffic per step ~ |ids| rows, independent of the map size."""
    base = me * kloc
    li = jnp.clip(ids - base, 0, kloc - 1)
    rows = jnp.take(local, li, axis=axis)
    own = ((ids >= base) & (ids < base + kloc)).astype(dtype)
    shape = [1] * rows.ndim
    shape[axis] = own.shape[0]
    rows = rows * own.reshape(shape)
    return jax.lax.psum(rows, AXIS)


def make_sharded_window_step(
    cam_pyr: CameraPyramid, cfg, mesh: Mesh, max_iters: int,
    use_conv: bool = False,
):
    """Jitted keyframe-sharded compact mapping step.

    (variables, sharded window, compact edge tables, priors[kc], ids,
    pad_valid, update_mask) -> (variables, err, iters, conv).

    Inside shard_map: gather the incident rows (one psum halo
    exchange), build the compact problem locally, run the edge-sharded
    LM (psum of (H, b) per iteration), scatter results back."""
    key = ("win", cam_pyr, cfg, mesh, max_iters, use_conv)
    hit = sharded_ba._STEP_CACHE.get(key)
    if hit is not None:
        return hit

    n = mesh.shape[AXIS]

    conv_fn = None
    if use_conv:

        def conv_fn(delta, grad):
            return jnp.logical_or(
                jnp.max(jnp.abs(grad)) < cfg.relin_grad_thresh,
                jnp.max(jnp.abs(delta)) < cfg.relin_param_inc_thresh,
            )

    def local_fn(v, window, pe, ge, re, priors, ids, pad_valid, umask):
        me = jax.lax.axis_index(AXIS)
        dtype = window.bias_flat.dtype

        # --- boundary exchange: incident rows only ---
        gathered = {}
        for name, axis in _KF_AXIS.items():
            val = getattr(window, name)
            if val is None:
                continue
            kloc = val.shape[axis]
            gathered[name] = _gather_rows(val, ids, axis, kloc, me, dtype)
        for name in ("packed_fg", "packed_feat"):
            val = getattr(window, name)
            if val is None:
                continue
            kloc = val.shape[1]
            g = _gather_rows(val, ids, 1, kloc, me, dtype)
            gathered[name] = g.reshape(g.shape[0], -1)
        gathered["dense_fg"] = tuple(
            _gather_rows(d, ids, 0, d.shape[0], me, dtype)
            for d in window.dense_fg
        )
        gathered["dense_feat"] = tuple(
            _gather_rows(d, ids, 0, d.shape[0], me, dtype)
            for d in window.dense_feat
        )
        compact_window = window._replace(
            **gathered, mega_fg=None, mega_feat=None
        )

        pr = ba.PriorTable(
            code_valid=priors.code_valid * pad_valid,
            scale_valid=priors.scale_valid * pad_valid,
            scale_init=priors.scale_init,
            pose_valid=priors.pose_valid * pad_valid,
            pose_target=priors.pose_target,
        )
        # priors counted once across the mesh
        gate = (me == 0).astype(dtype)
        pr = pr._replace(
            code_valid=pr.code_valid * gate,
            scale_valid=pr.scale_valid * gate,
            pose_valid=pr.pose_valid * gate,
        )
        v_c = jax.tree.map(lambda x: x[ids], v)
        problem = ba.BAProblem(compact_window, pe, ge, pr, re)

        def linearize_fn(vv):
            h, b, err = ba.linearize(vv, problem, cam_pyr, cfg)
            return (
                jax.lax.psum(h, AXIS),
                jax.lax.psum(b, AXIS),
                jax.lax.psum(err, AXIS),
            )

        def error_fn(vv):
            return jax.lax.psum(
                ba.total_error(vv, problem, cam_pyr, cfg), AXIS
            )

        solver = getattr(cfg, "solver", "dense")
        if solver == "auto":
            solver = (
                "schur"
                if v_c.num_kf >= getattr(cfg, "schur_min_keyframes", 48)
                else "dense"
            )
        vs, err, iters, conv = graph.lm_loop(
            v_c,
            linearize_fn,
            error_fn,
            umask,
            max_iters,
            init_damp=cfg.gn_init_damp,
            min_damp=cfg.gn_min_damp,
            max_damp=cfg.gn_max_damp,
            damp_dec=cfg.gn_damp_dec_factor,
            damp_inc=cfg.gn_damp_inc_factor,
            conv_fn=conv_fn,
            solver=solver,
        )
        v_full = jax.tree.map(
            lambda full_, part: full_.at[ids].set(part), v, vs
        )
        return v_full, err, iters, conv

    kf_specs = ba.WindowData(
        loc1d=P(AXIS),
        homo=P(AXIS),
        bias_flat=P(AXIS),
        jac_flat=P(AXIS),
        feat_pyr=P(None, AXIS),
        grad_pyr=P(None, None, AXIS),
        src_feats=P(AXIS),
        avg_sq_bias=P(AXIS),
        mask_flat=P(),
        packed_fg=P(None, AXIS),
        packed_feat=P(None, AXIS),
        bias_at=P(AXIS),
        jac_at=P(AXIS),
        dense_fg=P(AXIS),
        dense_feat=P(AXIS),
        mega_fg=P(),
        mega_feat=P(),
    )
    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                P(),  # variables
                kf_specs,  # window (keyframe-sharded)
                P(AXIS),  # photo edges
                P(AXIS),  # geo edges
                P(AXIS),  # reproj edges
                P(),  # priors (compact-sized)
                P(),  # ids
                P(),  # pad_valid
                P(),  # update mask
            ),
            out_specs=P(),
            check_vma=False,
        )
    )
    sharded_ba._STEP_CACHE[key] = fn
    return fn


def dryrun(n_devices: int) -> None:
    """Compile + run ONE keyframe-sharded compact mapping step on tiny
    shapes (driver multichip validation, alongside sharded_ba.dryrun)."""
    from ..config import MapperConfig
    from ..geometry.camera import CameraPyramid, PinholeCamera
    from ..geometry.interp import locations_1d_to_homo
    from ..geometry.se3 import SE3, se3_exp
    from ..ops.photometric import sample_source_features
    from ..ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), (AXIS,))

    k, h, w, cs, fs, levels, n = 8, 16, 16, 4, 4, 2, 32
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
    problem = ba.prepare_problem(
        ba.BAProblem(
            window,
            ba.EdgeTable(
                jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
                jnp.zeros(0),
            ),
            ba.EdgeTable(
                jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
                jnp.zeros(0),
            ),
            ba.PriorTable(
                code_valid=jnp.ones(k),
                scale_valid=jnp.zeros(k).at[0].set(1.0),
                scale_init=jnp.ones(k),
                pose_valid=jnp.zeros(k).at[0].set(1.0),
                pose_target=SE3.identity((k,)),
            ),
        ),
        pyr,
    )
    win_sh = shard_window(problem.window, mesh)

    # compact set: keyframes 2..5 with a chain of edges
    ids_list = [2, 3, 4, 5]
    id_map = {kf: c for c, kf in enumerate(ids_list)}
    pairs = [(2, 3), (3, 2), (3, 4), (4, 3), (4, 5), (5, 4)]
    edges = ba.EdgeTable(
        i0=jnp.asarray([id_map[a] for a, _ in pairs], jnp.int32),
        i1=jnp.asarray([id_map[b] for _, b in pairs], jnp.int32),
        valid=jnp.ones(len(pairs)),
    )
    sel = jnp.asarray(ids_list)
    pr = problem.priors
    priors_c = ba.PriorTable(
        code_valid=pr.code_valid[sel],
        scale_valid=pr.scale_valid[sel],
        scale_init=pr.scale_init[sel],
        pose_valid=pr.pose_valid[sel],
        pose_target=jax.tree.map(lambda x: x[sel], pr.pose_target),
    )
    taus = np.zeros((k, 6), np.float32)
    taus[1:] = rng.standard_normal((k - 1, 6)).astype(np.float32) * 0.01
    variables = Variables(
        se3_exp(jnp.asarray(taus)), jnp.zeros((k, cs)), jnp.ones(k)
    )
    v, err, iters, _ = sharded_window_run_ba(
        variables, win_sh, edges, edges, None, priors_c,
        jnp.asarray(ids_list, jnp.int32), jnp.ones(len(ids_list)),
        jnp.ones(len(ids_list)), pyr, MapperConfig(), mesh, max_iters=2,
    )
    jax.block_until_ready(v)
    assert jnp.isfinite(err), "sharded-store BA produced non-finite error"


def sharded_window_run_ba(
    variables: Variables,
    window_sharded: ba.WindowData,
    photo_edges: ba.EdgeTable,
    geo_edges: ba.EdgeTable,
    reproj_edges,
    priors_compact: ba.PriorTable,
    ids: jax.Array,
    pad_valid: jax.Array,
    update_mask: jax.Array,
    cam_pyr: CameraPyramid,
    cfg,
    mesh: Mesh,
    max_iters: int = 4,
    use_conv: bool = False,
):
    """Keyframe-sharded compact mapping step (see make_sharded_window_step).

    ``priors_compact`` / ``update_mask`` / ``pad_valid`` are sized to the
    compact id set; edge tables must be in compact indices and padded to
    a multiple of the mesh size (sharded_ba.pad_edges)."""
    fn = make_sharded_window_step(cam_pyr, cfg, mesh, max_iters, use_conv)
    n = mesh.shape[AXIS]
    sharded = NamedSharding(mesh, P(AXIS))
    pe = jax.tree.map(
        lambda a: jax.device_put(a, sharded),
        sharded_ba.pad_edges(photo_edges, n),
    )
    ge = jax.tree.map(
        lambda a: jax.device_put(a, sharded),
        sharded_ba.pad_edges(geo_edges, n),
    )
    if reproj_edges is None or reproj_edges.i0.shape[0] == 0:
        m = (
            reproj_edges.loc1d_0.shape[1]
            if reproj_edges is not None
            else 8
        )
        dtype = variables.scale.dtype
        reproj_edges = ba.ReprojEdgeTable(
            i0=jnp.zeros(n, jnp.int32),
            i1=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, dtype),
            loc1d_0=jnp.zeros((n, m), jnp.int32),
            homo_0=jnp.zeros((n, m, 3), dtype).at[..., 2].set(1.0),
            matched_2d_1=jnp.zeros((n, m, 2), dtype),
            match_valid=jnp.zeros((n, m), dtype),
            weight=jnp.zeros(n, dtype),
        )
    else:
        reproj_edges = sharded_ba.pad_reproj_edges(reproj_edges, n)
    re = jax.tree.map(
        lambda a: jax.device_put(a, sharded), reproj_edges
    )
    return fn(
        variables, window_sharded, pe, ge, re, priors_compact, ids,
        pad_valid, update_mask,
    )
