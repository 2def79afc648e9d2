"""SLAM state checkpoint / resume.

The reference persists results only (TUM trajectory + per-keyframe
tensors, deepfactors.cpp:1926-1985) with no mid-run restart. Here the
whole SLAM state — keyframe store arrays, variables, graph edges,
trajectory — serializes to one npz, so a run can be checkpointed and
resumed (useful for long sequences and for preemptible TPU pools).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import SE3
from ..solver.graph import Variables


def save_state(path: str, system) -> None:
    store = system.store
    n = store.num_active
    payload = {
        "num_active": n,
        "pose_rot": np.array(store.variables.pose.rot),
        "pose_trans": np.array(store.variables.pose.trans),
        "code": np.array(store.variables.code),
        "scale": np.array(store.variables.scale),
        "loc1d": np.array(store.loc1d),
        "homo": np.array(store.homo),
        "bias_flat": np.array(store.bias_flat),
        "jac_flat": np.array(store.jac_flat),
        "feat_pyr": np.array(store.feat_pyr),
        "grad_pyr": np.array(store.grad_pyr),
        "feat_desc": np.array(store.feat_desc),
        "avg_sq_bias": np.array(store.avg_sq_bias),
        "reinitialize_count": store.reinitialize_count,
        "aux": store.aux,
        "timestamps": np.array(store.timestamps, np.float64),
        "photo_edges": np.array(system.mapper.photo_edges, np.int64).reshape(
            -1, 2
        )
        if system.mapper.photo_edges
        else np.zeros((0, 2), np.int64),
        "geo_edges": np.array(system.mapper.geo_edges, np.int64).reshape(-1, 2)
        if system.mapper.geo_edges
        else np.zeros((0, 2), np.int64),
        "photo_edge_iters": np.array(
            system.mapper.photo_edge_iters, np.int64
        ),
        "geo_edge_iters": np.array(system.mapper.geo_edge_iters, np.int64),
        "links": json.dumps(
            {str(k): sorted(v) for k, v in store.links.items()}
        ),
        "global_loop_links": json.dumps(
            sorted(list(store.global_loop_links))
        ),
        "trajectory_ts": np.array(
            [t for t, _ in system.trajectory], np.float64
        ),
        "trajectory_rot": np.stack(
            [np.array(p.rot) for _, p in system.trajectory]
        )
        if system.trajectory
        else np.zeros((0, 3, 3)),
        "trajectory_trans": np.stack(
            [np.array(p.trans) for _, p in system.trajectory]
        )
        if system.trajectory
        else np.zeros((0, 3)),
        "curr_kf": system.curr_kf,
        "pose_ck_rot": np.array(system.pose_ck.rot),
        "pose_ck_trans": np.array(system.pose_ck.trans),
    }
    np.savez_compressed(path, **payload)


def load_state(path: str, system) -> None:
    """Restore into an already-constructed SlamSystem (same config)."""
    d = np.load(path, allow_pickle=False)
    store = system.store
    store.num_active = int(d["num_active"])
    store.variables = Variables(
        pose=SE3(jnp.asarray(d["pose_rot"]), jnp.asarray(d["pose_trans"])),
        code=jnp.asarray(d["code"]),
        scale=jnp.asarray(d["scale"]),
    )
    for name in (
        "loc1d", "homo", "bias_flat", "jac_flat", "feat_pyr", "grad_pyr",
        "feat_desc", "avg_sq_bias",
    ):
        setattr(store, name, jnp.asarray(d[name]))
    store.reinitialize_count = d["reinitialize_count"].copy()
    if "aux" in d:  # absent in pre-aux checkpoints
        store.aux = d["aux"].copy()
    store.timestamps = [float(x) for x in d["timestamps"]]
    store.links = {
        int(k): set(v)
        for k, v in json.loads(str(d["links"])).items()
    }
    store.global_loop_links = set(
        tuple(x) for x in json.loads(str(d["global_loop_links"]))
    )
    system.mapper.photo_edges = [tuple(e) for e in d["photo_edges"]]
    system.mapper.geo_edges = [tuple(e) for e in d["geo_edges"]]
    fi = system.cfg.mapper.factor_iters
    system.mapper.photo_edge_iters = (
        [int(x) for x in d["photo_edge_iters"]]
        if "photo_edge_iters" in d
        else [fi] * len(system.mapper.photo_edges)
    )
    system.mapper.geo_edge_iters = (
        [int(x) for x in d["geo_edge_iters"]]
        if "geo_edge_iters" in d
        else [fi] * len(system.mapper.geo_edges)
    )
    system.trajectory = [
        (float(ts), SE3(jnp.asarray(r), jnp.asarray(t)))
        for ts, r, t in zip(
            d["trajectory_ts"], d["trajectory_rot"], d["trajectory_trans"]
        )
    ]
    system._visited = list(range(store.num_active))
    system.curr_kf = int(d["curr_kf"])
    from ..geometry.se3 import SE3 as _SE3

    system.pose_ck = _SE3(
        jnp.asarray(d["pose_ck_rot"]), jnp.asarray(d["pose_ck_trans"])
    )
