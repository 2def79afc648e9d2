"""Edge-partitioned global BA across a device mesh.

The reference is single-GPU (SURVEY.md §2.4); this module is the TPU-native
scaling design it lacks: the factor-graph *edge tables* are sharded across
the mesh axis ("e"), each device linearizes its local edges and
scatter-adds a partial (H, b); one psum over ICI reduces them to the
replicated global system, which every device solves identically (the
(23K)^2 dense solve is tiny next to edge linearization). Keyframe state is
replicated — boundary-variable exchange therefore costs nothing until the
window outgrows HBM, at which point the same structure extends to
all-gather of a sharded keyframe store.

The LM accept/reject loop runs *inside* shard_map, so the whole
multi-device optimization is one jitted program with XLA collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import CameraPyramid
from ..solver import ba, graph
from ..solver.graph import Variables

AXIS = "e"


def pad_edges(e: ba.EdgeTable, multiple: int) -> ba.EdgeTable:
    """Pad an edge table so its length divides the mesh axis size."""
    n = e.i0.shape[0]
    target = -(-n // multiple) * multiple
    pad = target - n
    if pad == 0:
        return e
    return ba.EdgeTable(
        i0=jnp.pad(e.i0, (0, pad)),
        i1=jnp.pad(e.i1, (0, pad)),
        valid=jnp.pad(e.valid, (0, pad)),
    )


def pad_reproj_edges(
    e: ba.ReprojEdgeTable, multiple: int
) -> ba.ReprojEdgeTable:
    """Pad a reprojection edge table (with its per-edge match arrays) so
    its length divides the mesh axis size. Padding rows have valid=0."""
    n = e.i0.shape[0]
    target = -(-n // multiple) * multiple
    pad = target - n
    if pad == 0:
        return e
    pad0 = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return jax.tree.map(pad0, e)


def shard_problem(
    problem: ba.BAProblem, mesh: Mesh, reproj_matches: int = 8
) -> ba.BAProblem:
    """Pad + place edge tables on the mesh; window/priors replicated.

    All three factor families — photometric, geometric AND reprojection —
    are edge-sharded so the multi-chip step optimizes the identical cost
    to the single-device mapping_step (global loop closures add
    reprojection edges via enqueue_link, mapper.py). A missing/empty
    reprojection table becomes an all-invalid table of one edge per
    device so the sharded program has a static shape."""
    n = mesh.shape[AXIS]
    sharded = NamedSharding(mesh, P(AXIS))
    replicated = NamedSharding(mesh, P())

    def place(x):
        return jax.tree.map(lambda a: jax.device_put(a, sharded), x)

    re = problem.reproj_edges
    if re is None or re.i0.shape[0] == 0:
        m = re.loc1d_0.shape[1] if re is not None else reproj_matches
        dtype = problem.window.bias_flat.dtype
        re = ba.ReprojEdgeTable(
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
        re = pad_reproj_edges(re, n)

    return ba.BAProblem(
        window=jax.tree.map(
            lambda x: jax.device_put(x, replicated), problem.window
        ),
        photo_edges=place(pad_edges(problem.photo_edges, n)),
        geo_edges=place(pad_edges(problem.geo_edges, n)),
        priors=jax.tree.map(
            lambda x: jax.device_put(x, replicated), problem.priors
        ),
        reproj_edges=place(re),
    )


# jitted sharded step per (cam_pyr, cfg, mesh, max_iters): without the
# cache every sharded_run_ba call builds a fresh shard_map closure and a
# fresh jit wrapper, retracing + recompiling per call (seconds each)
_STEP_CACHE: dict = {}


def make_sharded_step(
    cam_pyr: CameraPyramid, cfg, mesh: Mesh, max_iters: int,
    use_conv: bool = False,
):
    """Jitted (variables, window, photo_edges, geo_edges, priors,
    update_mask) -> (variables, error, iterations, converged) for the
    edge-sharded LM loop, cached so repeated calls reuse the compiled
    executable (jit then caches per argument shapes). ``use_conv``
    enables the same relinearization-threshold early exit as the
    single-device run_ba (RefineMapping parity)."""
    key = (cam_pyr, cfg, mesh, max_iters, use_conv)
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit

    conv_fn = None
    if use_conv:

        def conv_fn(delta, grad):
            return jnp.logical_or(
                jnp.max(jnp.abs(grad)) < cfg.relin_grad_thresh,
                jnp.max(jnp.abs(delta)) < cfg.relin_param_inc_thresh,
            )

    def local_fn(v, window, pe, ge, re, priors, umask):
        me = jax.lax.axis_index(AXIS)
        # priors must be counted once: gate them to device 0's partial
        gate = (me == 0).astype(v.scale.dtype)
        gated_priors = ba.PriorTable(
            code_valid=priors.code_valid * gate,
            scale_valid=priors.scale_valid * gate,
            scale_init=priors.scale_init,
            pose_valid=priors.pose_valid * gate,
            pose_target=priors.pose_target,
        )
        # build quad-packed gather tables once, outside the LM while_loop
        gated = ba.prepare_problem(
            ba.BAProblem(window, pe, ge, gated_priors, re), cam_pyr
        )

        def linearize_fn(vv):
            h, b, err = ba.linearize(vv, gated, cam_pyr, cfg)
            return (
                jax.lax.psum(h, AXIS),
                jax.lax.psum(b, AXIS),
                jax.lax.psum(err, AXIS),
            )

        def error_fn(vv):
            return jax.lax.psum(
                ba.total_error(vv, gated, cam_pyr, cfg), AXIS
            )

        return graph.lm_loop(
            v,
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
        )

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    _STEP_CACHE[key] = fn
    return fn


def sharded_run_ba(
    variables: Variables,
    problem: ba.BAProblem,
    cam_pyr: CameraPyramid,
    cfg,
    update_mask: jax.Array,
    mesh: Mesh,
    max_iters: int = 4,
    use_conv: bool = False,
):
    """Run the LM loop with edge-sharded linearization. Returns
    (variables, error, iterations, converged), replicated."""
    fn = make_sharded_step(cam_pyr, cfg, mesh, max_iters, use_conv)
    assert problem.reproj_edges is not None, (
        "sharded_run_ba requires shard_problem() first (it synthesizes an "
        "all-invalid reprojection table when the graph has none)"
    )
    return fn(
        variables,
        problem.window,
        problem.photo_edges,
        problem.geo_edges,
        problem.reproj_edges,
        problem.priors,
        update_mask,
    )


def dryrun(n_devices: int) -> None:
    """Compile + run ONE sharded multi-chip training/BA step on tiny shapes.

    Used by the driver's multichip validation (see __graft_entry__).
    """
    import numpy as np

    from ..config import MapperConfig
    from ..geometry.camera import CameraPyramid, PinholeCamera
    from ..geometry.interp import locations_1d_to_homo
    from ..geometry.se3 import SE3, se3_exp
    from ..ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), (AXIS,))

    k, h, w, cs, fs, levels, n = 4, 16, 16, 4, 4, 2, 32
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
    from ..ops.photometric import sample_source_features

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
    i0, i1 = [], []
    for a in range(k):
        for b_ in range(k):
            if a != b_:
                i0.append(a)
                i1.append(b_)
    edges = ba.EdgeTable(
        jnp.asarray(i0, jnp.int32), jnp.asarray(i1, jnp.int32),
        jnp.ones(len(i0)),
    )
    priors = ba.PriorTable(
        code_valid=jnp.ones(k),
        scale_valid=jnp.zeros(k).at[0].set(1.0),
        scale_init=jnp.ones(k),
        pose_valid=jnp.zeros(k).at[0].set(1.0),
        pose_target=SE3.identity((k,)),
    )
    # include real reprojection edges so the dryrun certifies the full
    # factor catalog multi-chip (global loop closures add these)
    m = 8
    from ..geometry.interp import locations_1d_to_2d

    rp_loc = jnp.asarray(loc1d[:m])
    rp_homo = jnp.asarray(homo[:m], jnp.float32)
    x1, y1 = locations_1d_to_2d(rp_loc, cam.width)
    reproj = ba.ReprojEdgeTable(
        i0=jnp.asarray([0, 1], jnp.int32),
        i1=jnp.asarray([1, 0], jnp.int32),
        valid=jnp.ones(2),
        loc1d_0=jnp.tile(rp_loc[None], (2, 1)),
        homo_0=jnp.tile(rp_homo[None], (2, 1, 1)),
        matched_2d_1=jnp.tile(
            jnp.stack([x1, y1], axis=-1).astype(jnp.float32)[None], (2, 1, 1)
        ),
        match_valid=jnp.ones((2, m)),
        weight=jnp.ones(2),
    )
    problem = ba.BAProblem(window, edges, edges, priors, reproj)
    problem = shard_problem(problem, mesh)

    taus = np.zeros((k, 6), np.float32)
    taus[1:] = rng.standard_normal((k - 1, 6)).astype(np.float32) * 0.01
    variables = Variables(
        se3_exp(jnp.asarray(taus)), jnp.zeros((k, cs)), jnp.ones(k)
    )
    cfg = MapperConfig()
    v, err, iters, _ = sharded_run_ba(
        variables, problem, pyr, cfg, jnp.ones(k), mesh, max_iters=2
    )
    jax.block_until_ready(v)
    assert jnp.isfinite(err), "sharded BA produced non-finite error"
